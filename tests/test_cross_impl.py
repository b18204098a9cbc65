"""Cross-implementation parity: the JVM DataFrame paths vs the independent
Python kernels. The DuckDB oracles replay the JVM logic, so a bug shared by
both would stay green — these tests triangulate with a THIRD independent
implementation (the reference-faithful Python kernels / numpy encoder)."""

import hashlib

from pyspark.sql import functions as F

from bela_spark.functions.subword import (
    spm_tokenize_py,
    subword_token_rows,
    word_piece_counts,
    word_pieces_py,
    word_to_subword_remap_py,
)
from bela_spark.functions.vectors import _hash_embed_batch
from bela_spark.operators.spans import (
    candidate_spans,
    projection_weights,
    pruned_spans,
    span_encodings,
    token_table,
)

TEXTS = [
    "hola amigos",
    "a bb ccc dddd eeeee ffffff",
    "x",
    "some simple text about real madrid and barcelona plus extra words "
    "to push this doc well past the truncation boundary of the sequence",
]


def _words(spark, texts=TEXTS):
    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, norm string")
    return df.withColumn("tokens", F.split("norm", " "))


def test_subword_rows_match_python_kernel(spark):
    """JVM subword_token_rows == spm_tokenize_py on single-space text
    (ids, order, char spans, bos/eos, truncation)."""
    words = token_table(_words(spark)).select(
        "doc_id", "pos", "token", "char_start", "char_end"
    )
    got = {}
    for r in subword_token_rows(words, max_seq_len=32).collect():
        got.setdefault(r["doc_id"], []).append(
            (r["sp_pos"], r["token_id"], r["char_start"], r["char_end"])
        )
    for doc_id, text in enumerate(TEXTS):
        want = spm_tokenize_py(text, max_seq_len=32)
        rows = sorted(got[doc_id])
        assert len(rows) == len(want), (doc_id, len(rows), len(want))
        for sp_pos, (tid, cs, ce) in enumerate(want):
            g = rows[sp_pos]
            assert g[0] == sp_pos and g[1] == tid, (doc_id, sp_pos)
            # python kernel spans are [start, end); JVM emits the same
            # convention except eos carries (offset, 0)
            assert (g[2], g[3]) == (cs, ce), (doc_id, sp_pos, g, (tid, cs, ce))


def test_word_mapping_matches_python_remap(spark):
    """JVM word_piece_counts (sp_start, sp_end) == pieces_to_texts mapping."""
    words = token_table(_words(spark)).select(
        "doc_id", "pos", "token", "char_start", "char_end"
    )
    got = {}
    for r in word_piece_counts(words).collect():
        got.setdefault(r["doc_id"], {})[r["pos"]] = (r["sp_start"], r["sp_end"])
    for doc_id, text in enumerate(TEXTS):
        ws = text.split(" ")
        _, _, _, mapping = word_to_subword_remap_py(ws, [], [], max_seq_len=10**9)
        for i, (s, e) in enumerate(mapping):
            assert got[doc_id][i + 1] == (s, e), (doc_id, i)


def test_span_encodings_match_numpy_encoder(spark):
    """JVM span_encodings == numpy: the E1 kernel's one-hot (bucket, sign) of
    the start/end tokens pushed through the literal projection matrix."""
    tok = token_table(_words(spark))
    spans = pruned_spans(candidate_spans(tok), k=3).select(
        "doc_id", "start_pos", "end_pos"
    )
    got = {
        (r["doc_id"], r["start_pos"], r["end_pos"]): (r["proj_l1"], r["proj_md5"])
        for r in span_encodings(spans, tok).collect()
    }
    assert got
    W = projection_weights()
    toks = {}
    for r in tok.select("doc_id", "pos", "token").collect():
        toks[(r["doc_id"], r["pos"])] = r["token"]

    def bucket_sign(token):
        # triangulate via the REAL E1 kernel: a single-token text embeds to
        # +/-1 at exactly one bucket
        v = _hash_embed_batch(__import__("numpy").array([token], dtype=object), 64, 42)[0]
        nz = [i for i, x in enumerate(v) if x != 0]
        assert len(nz) == 1
        return nz[0], int(v[nz[0]])

    for (doc_id, sp, ep), (l1, md5hex) in got.items():
        b1, s1 = bucket_sign(toks[(doc_id, sp)])
        b2, s2 = bucket_sign(toks[(doc_id, ep)])
        proj = [s1 * W[j][b1] + s2 * W[j][b2 + 64] for j in range(len(W))]
        assert l1 == sum(abs(p) for p in proj)
        assert md5hex == hashlib.md5(",".join(str(p) for p in proj).encode()).hexdigest()

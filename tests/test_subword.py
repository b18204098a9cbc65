"""Golden tests for the hash-subword token space (T2/T5) and the token
catalogue (S5/T11/S2), mirroring the reference transform tests
(bela/tests/test_transforms.py:12-285 — multi-space case at :104-128) with
hand-replayed expectations."""

from pyspark.sql import functions as F

from bela_spark.functions.subword import (
    BOS_ID,
    EOS_ID,
    piece_id_py,
    spm_tokenize_py,
    word_pieces_py,
    word_to_subword_remap_py,
)


def test_word_pieces_chunking():
    assert word_pieces_py("abcdefghij") == ["abcd", "efgh", "ij"]
    assert word_pieces_py("ab") == ["ab"]


def test_spm_tokenize_offsets_single_space():
    out = spm_tokenize_py("hola amigos")
    # bos + hola(1 piece) + amig,os(2 pieces) + eos
    assert out[0] == (BOS_ID, 0, 0)
    assert out[1] == (piece_id_py("hola"), 0, 4)
    # first piece of 'amigos' absorbs the separating space
    assert out[2] == (piece_id_py("amig"), 4, 9)
    assert out[3] == (piece_id_py("os"), 9, 11)
    assert out[4] == (EOS_ID, 11, 0)
    # surfaces concatenate to the full text
    assert out[-2][2] == len("hola amigos")


def test_spm_tokenize_multi_space_absorption():
    # the reference's extra-spaces golden case (test_transforms.py:104-128):
    # leading whitespace folds into the first piece's span
    out = spm_tokenize_py("   hola   amigos!   ")
    assert out[0] == (BOS_ID, 0, 0)
    assert out[1] == (piece_id_py("hola"), 0, 7)  # 3 leading ws + 4 chars
    assert out[2] == (piece_id_py("amig"), 7, 14)  # 3 ws + 4 chars
    assert out[3] == (piece_id_py("os!"), 14, 17)
    # trailing whitespace has no following word: eos sits at the last surface
    assert out[4] == (EOS_ID, 17, 0)


def test_spm_tokenize_truncation():
    text = " ".join(["abcd"] * 50)  # 50 single-piece words
    out = spm_tokenize_py(text, max_seq_len=16)
    # bos + pieces idx 0..max-3 (=13) + eos -> 16 total
    assert len(out) == 16
    assert out[0][0] == BOS_ID and out[-1][0] == EOS_ID
    # eos offset = end of last kept surface
    assert out[-1][1] == out[-2][2]


def test_word_to_subword_remap_golden():
    words = ["real", "madrid", "plays", "barcelona"]
    # pieces per word: 1, 2, 2, 3 -> mapping [(1,2),(2,4),(4,6),(6,9)]
    seq, offs, lens, mapping = word_to_subword_remap_py(words, [0, 3], [2, 1])
    assert mapping == [[1, 2], [2, 4], [4, 6], [6, 9]]
    assert seq[0] == BOS_ID and seq[-1] == EOS_ID
    assert len(seq) == 1 + 8 + 1
    # mention [0, len 2] covers words 0-1 -> sp [1, 4); [3, len 1] -> [6, 9)
    assert offs == [1, 6] and lens == [3, 3]


def test_word_to_subword_remap_truncation_break():
    words = ["abcdefgh"] * 10  # 2 pieces each -> ends 3,5,7,...
    seq, offs, lens, mapping = word_to_subword_remap_py(
        words, [0, 4, 8], [1, 1, 1], max_seq_len=12
    )
    # word 4 ends at sp 11 <= max-1; word 8 at sp 19 > 11 -> dropped (break)
    assert offs == [1, 9] and lens == [2, 2]
    assert len(seq) == 12  # truncated to max_seq_len-1 then eos
    assert seq[-1] == EOS_ID
    assert mapping == [[1 + 2 * i, 3 + 2 * i] for i in range(5)]  # end < 12


def test_catalogue_roundtrip_and_truncation(spark):
    from bela_spark.operators.catalogue import (
        entity_catalogue,
        membership_semi_join,
        tokenized_catalogue,
        truncate_entity_tokens,
    )

    docs = spark.createDataFrame(
        [(i, "en", f"s{i % 2}", "alpha beta gamma delta epsilon zeta") for i in range(5)],
        "doc_id long, lang string, source string, norm string",
    )
    cat = tokenized_catalogue(entity_catalogue(docs))
    rows = {r["ent_id"]: r for r in cat.collect()}
    assert set(rows) == {"en_s0", "en_s1"}
    for r in rows.values():
        # length-prefix roundtrip: stored[0] = n, slice recovers the ids
        assert r["stored"][0] == r["n_tokens"] == len(r["tokens"])
        assert r["stored"][1 : r["n_tokens"] + 1] == r["tokens"]
        assert len(r["stored"]) == 17  # 1 prefix + 16 fixed slots
        # title "alpha beta gamma delta epsilon" (30 chars) -> pieces
        want = [
            piece_id_py(p)
            for w in "alpha beta gamma delta epsilon".split()
            for p in word_pieces_py(w)
        ]
        assert r["tokens"] == want
    tr = {r["ent_id"]: r for r in truncate_entity_tokens(cat).collect()}
    for r in tr.values():
        assert len(r["entity_ids"]) == 8  # truncated (9 raw pieces + bos/eos)
        assert r["entity_ids"][0] == BOS_ID and r["entity_ids"][-1] == EOS_ID

    mentions = spark.createDataFrame(
        [(1, "en_s0"), (2, "en_s1"), (3, "xx_nope")], "doc_id long, ent_id string"
    )
    kept = {r["ent_id"] for r in membership_semi_join(mentions, cat).collect()}
    assert kept == {"en_s0", "en_s1"}


def test_dense_index_matches_global_rank(spark):
    """dense_index == (row_number over global order) - 1, without the
    single-task global window: checked on a 97-key frame at 8 partitions,
    including empty range partitions and an empty input."""
    from pyspark.sql import functions as F

    from bela_spark.operators.catalogue import dense_index

    keys = [f"k{i:03d}" for i in range(97)]
    import random

    random.Random(3).shuffle(keys)
    df = spark.createDataFrame([(k,) for k in keys], "ent_id string")
    out = dense_index(df, "ent_id", "idx", num_partitions=8).collect()
    got = {r["ent_id"]: r["idx"] for r in out}
    assert got == {k: i for i, k in enumerate(sorted(keys))}

    empty = dense_index(df.filter(F.lit(False)), "ent_id", "idx").collect()
    assert empty == []

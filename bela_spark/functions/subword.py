"""Hash-subword token space (SURVEY.md T2/T5; feeds S5/T11 catalogues).

The reference tokenizes with a trained SentencePiece model, returning
(token_id, char_start, char_end) triples per text with bos/eos specials,
leading-whitespace absorption into the first piece, and truncation after
max_seq_len-3 pieces (/root/reference/bela/transforms/spm_transform.py:28-65).
The word->subword mention remap walks a per-word (sp_start, sp_end) mapping
built from prefix counts, truncating mentions whose subword end crosses
max_seq_len-1 (pieces_to_texts,
/root/reference/bela/transforms/joint_el_transform.py:104-187).

The trained SPM model is unavailable, so the PIECE RULE is a deterministic
hash-subword scheme — fixed PIECE_CHARS-char chunks per word, md5-derived ids
— the same learned-kernel-for-deterministic-kernel substitution as the E1
encoder. Everything downstream of the piece rule (special tokens, offsets,
whitespace absorption, truncation, the word->subword remap algebra) mirrors
the reference exactly and is golden-tested.

Two surfaces:
  - *_py kernels: reference-faithful on arbitrary text (multi-space included),
    exposed as Arrow-batched pandas UDFs;
  - DataFrame builders over the single-space normalized text: pure JVM
    expressions (substring/conv/md5 + one prefix-sum window) that a DuckDB
    oracle replays bit-for-bit — these power the driver queries.
"""

from __future__ import annotations

import hashlib
import re

from pyspark.sql import Column, DataFrame, Window as W, functions as F

BOS_ID = 0
EOS_ID = 2
UNK_ID = 3
VOCAB = 49_996  # piece ids live in [4, 4 + VOCAB)
PIECE_CHARS = 4


def piece_id_py(piece: str) -> int:
    """Deterministic subword id: 4 + first 6 md5 hex chars mod VOCAB (ids
    0-3 reserved for specials, mirroring the reference's bos/pad/eos/unk)."""
    return 4 + int(hashlib.md5(piece.encode()).hexdigest()[:6], 16) % VOCAB


def piece_id_col(piece: Column) -> Column:
    """JVM twin of piece_id_py (md5 + conv agree with DuckDB)."""
    return (
        F.conv(F.substring(F.md5(piece), 1, 6), 16, 10).cast("bigint") % VOCAB + 4
    )


def word_pieces_py(word: str) -> list[str]:
    return [word[j : j + PIECE_CHARS] for j in range(0, len(word), PIECE_CHARS)]


def spm_tokenize_py(
    text: str, max_seq_len: int = 256, add_special_tokens: bool = True
) -> list[tuple[int, int, int]]:
    """T2: text -> [(token_id, char_start, char_end)], reference semantics
    (spm_transform.py:38-65): bos sentinel (0,0,0); each word's first piece
    absorbs the whitespace run preceding it (the reference's
    leading_whitespaces_count generalized to every gap, matching SPM surfaces
    which carry the space marker); hard stop after piece index
    max_seq_len-3; eos (2, current_offset, 0)."""
    out: list[tuple[int, int, int]] = []
    if add_special_tokens:
        out.append((BOS_ID, 0, 0))
    current_offset = 0
    idx = 0
    last_end = 0
    stop = False
    for m in re.finditer(r"\S+", text):
        ws_before = m.start() - last_end
        last_end = m.end()
        for j, piece in enumerate(word_pieces_py(m.group(0))):
            surface_len = len(piece) + (ws_before if j == 0 else 0)
            out.append((piece_id_py(piece), current_offset, current_offset + surface_len))
            current_offset += surface_len
            if idx == max_seq_len - 3:
                stop = True
                break
            idx += 1
        if stop:
            break
    if add_special_tokens:
        out.append((EOS_ID, current_offset, 0))
    return out


def word_to_subword_remap_py(
    words: list[str],
    mention_offsets: list[int],
    mention_lengths: list[int],
    max_seq_len: int = 256,
) -> tuple[list[int], list[int], list[int], list[list[int]]]:
    """T5: pieces_to_texts analogue (joint_el_transform.py:104-187) with hash
    pieces. Returns (token_ids, new_offsets, new_lengths, tokens_mapping);
    mention offsets are 0-based word indexes, subword offsets index the
    [bos] + pieces (+ eos) sequence."""
    mapping: list[tuple[int, int]] = []
    seq: list[int] = [BOS_ID]
    for w in words:
        ids = [piece_id_py(p) for p in word_pieces_py(w)]
        mapping.append((len(seq), len(seq) + len(ids)))
        seq.extend(ids)
    seq = seq[: max_seq_len - 1]
    seq.append(EOS_ID)
    new_offs: list[int] = []
    new_lens: list[int] = []
    for o, l in zip(mention_offsets, mention_lengths):
        new_offset = mapping[o][0]
        new_end = mapping[o + l - 1][1]
        if new_end > max_seq_len - 1:
            break
        new_offs.append(new_offset)
        new_lens.append(new_end - new_offset)
    tokens_mapping = [[s, e] for s, e in mapping if e < max_seq_len]
    return seq, new_offs, new_lens, tokens_mapping


MENTION_START_ID = 1
MENTION_END_ID = 3
MENTION_BUDGET = 16  # the reference's max_mention_length (total context budget)


def word_piece_ids_col(token: Column) -> Column:
    """Ordered piece ids of one word as an array column (JVM lambdas only)."""
    return F.transform(
        F.sequence(
            F.lit(0),
            F.floor((F.length(token) + PIECE_CHARS - 1) / PIECE_CHARS).cast("int") - 1,
        ),
        lambda j: piece_id_col(F.substring(token, j * PIECE_CHARS + 1, PIECE_CHARS)),
    )


def prepare_mention_arrays(
    left: Column, mention: Column, right: Column, max_len: int = MENTION_BUDGET
) -> Column:
    """T10 (prepare_mention, mblink/transforms/blink_transform.py:41-78) on
    array<bigint> columns: cap the mention at max_len-4, wrap in
    [START]/[END] markers, split the remaining token budget between left
    (last tokens) and right (first tokens) with the reference's quota
    rebalancing, then frame with bos/eos. Pure array algebra — no UDF."""
    m = F.concat(
        F.array(F.lit(MENTION_START_ID).cast("bigint")),
        F.slice(mention, 1, max_len - 4),
        F.array(F.lit(MENTION_END_ID).cast("bigint")),
    )
    mlen = F.size(m)
    lq0 = (F.floor((F.lit(max_len) - mlen) / 2) - 1).cast("int")
    rq0 = (F.lit(max_len) - mlen - lq0 - 2).cast("int")
    ladd, radd = F.size(left), F.size(right)
    rq = F.when((ladd <= lq0) & (radd > rq0), rq0 + lq0 - ladd).otherwise(rq0)
    lq = F.when((ladd > lq0) & (radd <= rq0), lq0 + rq0 - radd).otherwise(lq0)
    lkept = F.slice(left, F.greatest(ladd - lq + 1, F.lit(1)), F.least(lq, ladd))
    rkept = F.slice(right, F.lit(1), F.least(rq, radd))
    return F.concat(
        F.array(F.lit(BOS_ID).cast("bigint")),
        lkept,
        m,
        rkept,
        F.array(F.lit(EOS_ID).cast("bigint")),
    )


# --- DataFrame builders over normalized (single-space) text -----------------

def word_piece_counts(words: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """words (id, pos, token, char_start, char_end) + (n_pieces, sp_start,
    sp_end): per-word subword counts and the word->subword position mapping
    (sp positions index [bos]+pieces, bos at 0) — ONE prefix-sum window."""
    t = words.withColumn(
        "n_pieces", F.floor((F.length("token") + PIECE_CHARS - 1) / PIECE_CHARS).cast("int")
    )
    w = W.partitionBy(id_col).orderBy("pos").rowsBetween(W.unboundedPreceding, -1)
    t = t.withColumn("sp_start", (F.coalesce(F.sum("n_pieces").over(w), F.lit(0)) + 1).cast("int"))
    return t.withColumn("sp_end", (F.col("sp_start") + F.col("n_pieces")).cast("int"))


def subword_token_rows(
    words: DataFrame, max_seq_len: int = 32, id_col: str = "doc_id"
) -> DataFrame:
    """T2 as rows: (id, sp_pos, token_id, char_start, char_end) including the
    bos/eos sentinels, piece offsets with whitespace absorption (0-based
    [start, end) surface spans on the normalized text), and the reference's
    max_seq_len-3 piece truncation. Pure JVM expressions + two windows."""
    t = word_piece_counts(words, id_col)
    p = t.withColumn("j", F.explode(F.sequence(F.lit(0), F.col("n_pieces") - 1)))
    p = p.select(
        id_col,
        (F.col("sp_start") + F.col("j")).alias("sp_pos"),
        piece_id_col(
            F.substring(F.col("token"), F.col("j") * PIECE_CHARS + 1, PIECE_CHARS)
        ).alias("token_id"),
        # 0-based surface span; first piece of every word after the first
        # absorbs the single separating space of the normalized text
        F.when(
            (F.col("j") == 0) & (F.col("pos") > 1),
            F.col("char_start") - 2,
        )
        .otherwise(F.col("char_start") - 1 + F.col("j") * PIECE_CHARS)
        .cast("int")
        .alias("char_start"),
        F.least(
            F.col("char_start") - 1 + (F.col("j") + 1) * PIECE_CHARS, F.col("char_end")
        )
        .cast("int")
        .alias("char_end"),
    )
    # reference truncation: pieces with 0-based index <= max_seq_len-3 survive
    # (sp_pos is 1-based over pieces: sp_pos - 1 <= max_seq_len - 3)
    p = p.filter(F.col("sp_pos") <= max_seq_len - 2)
    bos = words.select(id_col).distinct().select(
        id_col,
        F.lit(0).alias("sp_pos"),
        F.lit(BOS_ID).cast("bigint").alias("token_id"),
        F.lit(0).alias("char_start"),
        F.lit(0).alias("char_end"),
    )
    eos_base = p.groupBy(id_col).agg(
        F.max("sp_pos").alias("_last"), F.max("char_end").alias("_off")
    )
    eos = eos_base.select(
        id_col,
        (F.col("_last") + 1).alias("sp_pos"),
        F.lit(EOS_ID).cast("bigint").alias("token_id"),
        F.col("_off").alias("char_start"),
        F.lit(0).alias("char_end"),
    )
    return bos.unionByName(p).unionByName(eos)

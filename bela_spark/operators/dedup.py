"""Deduplication operators over a document table (SURVEY.md SET family +
training-data-pipeline extensions): exact, MinHash-LSH, SimHash, n-gram
Jaccard, embedding-cosine near-dup.

All take a records DataFrame carrying (rid/doc_id, norm, tokens) as produced
by operators.blocking.with_record_columns and return plain DataFrames; every
shape is an explode/groupBy/join Catalyst can push down and re-plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F

from bela_spark.config import LinkageConfig
from bela_spark.functions.hashing import (
    band_keys,
    hamming32,
    minhash_wide,
    simhash_fp,
)
from bela_spark.functions.text import shingles_of
from bela_spark.functions.vectors import cosine_sim


def exact_duplicates(df: DataFrame, content_col: str = "content", id_col: str = "rid") -> DataFrame:
    """Hash-groupBy exact dedup: (content_sha, n_dups, keeper).

    Keeper = min id (deterministic). One shuffle on the 256-bit content hash —
    uniformly distributed, no skew by construction.
    """
    return (
        df.select(F.sha2(F.col(content_col), 256).alias("content_sha"), F.col(id_col))
        .groupBy("content_sha")
        .agg(F.count("*").alias("n_dups"), F.min(id_col).alias("keeper"))
    )


def minhash_lsh_pairs(
    records: DataFrame, cfg: LinkageConfig, id_col: str = "rid"
) -> DataFrame:
    """Near-dup candidate pairs via MinHash banding: (id1, id2) distinct."""
    sh = records.select(id_col, shingles_of("tokens", cfg.shingle_k).alias("shingles"))
    wide = minhash_wide(sh, id_col=id_col, num_hashes=cfg.num_minhashes)
    bk = band_keys(wide, id_col=id_col, num_hashes=cfg.num_minhashes, band_size=cfg.band_size)
    keys = bk.select(id_col, F.concat_ws(":", "band", "band_key").alias("key"))
    a, b = keys.alias("a"), keys.alias("b")
    return (
        a.join(b, "key")
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(F.col(f"a.{id_col}").alias("id1"), F.col(f"b.{id_col}").alias("id2"))
        .distinct()
    )


def simhash_fingerprints(
    records: DataFrame, id_col: str = "rid", bits: int = 63
) -> DataFrame:
    """(id, simhash) fingerprints (63-bit by default), JVM-side."""
    return records.select(id_col, simhash_fp("tokens", bits).alias("simhash"))


def simhash_blocks(bits: int, max_hamming: int) -> list[tuple[int, int, int]]:
    """(block_index, shift, mask) triples splitting `bits` into max_hamming+1
    near-equal blocks. Pigeonhole: two fingerprints within hamming h differ in
    at most h blocks, so they agree EXACTLY on >= 1 of the h+1 blocks — the
    blocking is complete for hamming <= max_hamming (pytest proves this
    against a brute-force hamming join). Shared with the DuckDB oracle."""
    n_blocks = max_hamming + 1
    base, rem = divmod(bits, n_blocks)
    widths = [base + 1 if i < rem else base for i in range(n_blocks)]
    out, start = [], 0
    for i, w in enumerate(widths):
        out.append((i, start, (1 << w) - 1))
        start += w
    return out


def _simhash_block_keys(
    fingerprints: DataFrame, max_hamming: int, id_col: str, bits: int
) -> DataFrame:
    """(id, simhash, hkey): one row per (record, bit-block) — the exploded
    equi-join key space of the pigeonhole blocking."""
    keys = [
        F.concat(
            F.lit(f"b{i}:"),
            F.shiftright(F.col("simhash"), s).bitwiseAND(F.lit(m)).cast("string"),
        )
        for i, s, m in simhash_blocks(bits, max_hamming)
    ]
    return fingerprints.select(
        id_col, "simhash", F.explode(F.array(*keys)).alias("hkey")
    )


def simhash_near_pairs(
    fingerprints: DataFrame,
    max_hamming: int = 3,
    id_col: str = "rid",
    bits: int = 63,
    block_cap: int | None = None,
) -> DataFrame:
    """Near-dup pairs with hamming <= max_hamming, blocked on max_hamming+1
    bit-blocks (see simhash_blocks) — each block is an equi-join key, so the
    all-pairs comparison never materializes AND the claimed hamming bound is
    actually complete (r1 shipped 2 blocks, which pigeonhole only guarantees
    for hamming <= 1).

    block_cap bounds the fan-out of hot block keys: within each hkey only the
    `block_cap` lowest ids survive (deterministic, lowest-ids-win — same rule
    as pairs.cap_keys), so one key emits at most C(cap,2) join rows. Capped
    blocking is no longer pigeonhole-complete for members beyond the cap —
    use simhash_block_drops for the never-silent truncation log. None = no
    cap (completeness holds; small inputs / the pytest oracle only)."""
    halves = _simhash_block_keys(fingerprints, max_hamming, id_col, bits)
    if block_cap is not None:
        from bela_spark.operators.pairs import cap_ids_per_key

        halves = cap_ids_per_key(halves, block_cap, key_col="hkey", id_col=id_col)
    a, b = halves.alias("a"), halves.alias("b")
    return (
        a.join(b, "hkey")
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("id1"),
            F.col(f"b.{id_col}").alias("id2"),
            hamming32(F.col("a.simhash"), F.col("b.simhash")).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


def simhash_block_drops(
    fingerprints: DataFrame,
    max_hamming: int = 3,
    id_col: str = "rid",
    bits: int = 63,
    block_cap: int = 64,
) -> DataFrame:
    """(key, n_ids, n_dropped): every simhash block key the cap truncates —
    the drop log that keeps simhash_near_pairs' block_cap never-silent
    (delegates to pairs.key_drop_log — one contract for every cap)."""
    from bela_spark.operators.pairs import key_drop_log

    halves = _simhash_block_keys(fingerprints, max_hamming, id_col, bits)
    return key_drop_log(halves, block_cap, key_col="hkey")


def ngram_jaccard_pairs(
    records: DataFrame,
    cfg: LinkageConfig,
    min_jaccard: float = 0.5,
    id_col: str = "rid",
) -> DataFrame:
    """Exact n-gram Jaccard over LSH candidates: (id1, id2, jaccard).

    LSH bounds the pair space; the exact Jaccard then verifies — same
    bound-then-verify shape as the reference's retrieve-then-score
    (bela/task/joint_el_task.py:658-690 then 766-890).
    """
    cand = minhash_lsh_pairs(records, cfg, id_col)
    sh = records.select(
        F.col(id_col),
        F.array_distinct(shingles_of("tokens", cfg.shingle_k)).alias("sh"),
    )
    j = (
        cand.join(sh.withColumnRenamed(id_col, "id1").withColumnRenamed("sh", "sh1"), "id1")
        .join(sh.withColumnRenamed(id_col, "id2").withColumnRenamed("sh", "sh2"), "id2")
        .withColumn(
            "jaccard",
            F.when(F.size(F.array_union("sh1", "sh2")) == 0, F.lit(1.0)).otherwise(
                F.size(F.array_intersect("sh1", "sh2"))
                / F.size(F.array_union("sh1", "sh2")).cast("double")
            ),
        )
    )
    return j.filter(F.col("jaccard") >= min_jaccard).select("id1", "id2", "jaccard")


def embedding_near_dup_pairs(
    embedded: DataFrame,
    min_cosine: float = 0.9,
    id_col: str = "rid",
    emb_col: str = "embedding",
    block_keys: DataFrame | None = None,
) -> DataFrame:
    """Embedding-cosine near-dups. With block_keys (id, key) the pair space is
    bounded by the blocking join; without, it degrades to a broadcast
    self-join (small inputs only — callers at scale must pass keys)."""
    e = embedded.select(F.col(id_col), F.col(emb_col))
    if block_keys is not None:
        k1 = block_keys.withColumnRenamed(id_col, "id1")
        k2 = block_keys.withColumnRenamed(id_col, "id2")
        pairs = (
            k1.join(k2, "key")
            .filter(F.col("id1") < F.col("id2"))
            .select("id1", "id2")
            .distinct()
        )
    else:
        a = e.select(F.col(id_col).alias("id1"))
        b = e.select(F.col(id_col).alias("id2"))
        pairs = F.broadcast(a).crossJoin(b).filter(F.col("id1") < F.col("id2"))
    j = (
        pairs.join(
            e.withColumnRenamed(id_col, "id1").withColumnRenamed(emb_col, "e1"), "id1"
        )
        .join(e.withColumnRenamed(id_col, "id2").withColumnRenamed(emb_col, "e2"), "id2")
        .withColumn("cosine", cosine_sim("e1", "e2"))
    )
    return j.filter(F.col("cosine") >= min_cosine).select("id1", "id2", "cosine")

"""Candidate-pair generation: salted self-join per blocking key (SURVEY.md J3).

The reference's pair space is bounded by FAISS top-k; ours by blocking keys.
Pairs are canonicalized `id1 < id2` — the Spark form of the reference's
positive-score masking (bela/task/joint_el_task.py:697-702), which also halves
the pair space.

Skew handling (north rule, explicit — AQE skew-join is only the backstop):
  1. per-key caps with *logged* drop counts (mirrors the reference's explicit
     top-k bounds, num_cand_mentions=50, joint_el_task.py:800-802 — bounded
     fan-out is a feature, silent truncation is not);
  2. grid salting of hot keys: row x replicated over s2 in [0,S), joined on
     (key, salt(x), s2) == (key, s1, salt(y)) — each pair meets exactly once
     and a mega-key shatters into S^2 independent join tasks.

Key stats (rank within key + key cardinality) are computed in ONE window pass
(single shuffle on `key`), and the annotated frame is persisted before the
hot/cold branch so the expensive key-generation DAG runs exactly once.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window as W, functions as F

from bela_spark.config import LinkageConfig


def keyed_with_stats(keys: DataFrame, cfg: LinkageConfig, id_col: str = "rid") -> DataFrame:
    """keys + (_rn rank-within-key, _kn key cardinality): one shuffle on key."""
    w = W.partitionBy("key").orderBy(id_col)
    wf = W.partitionBy("key").rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return keys.withColumn("_rn", F.row_number().over(w)).withColumn(
        "_kn", F.count("*").over(wf)
    )


def cap_ids_per_key(
    keys: DataFrame, cap: int, key_col: str = "key", id_col: str = "rid"
) -> DataFrame:
    """Keep the `cap` LOWEST ids per key (deterministic lowest-ids-win — the
    single bounded-fan-out rule shared by the ER pair cap, the simhash block
    cap and the ANN LSH bucket cap, so every cap in the repo truncates the
    same way and replays in SQL as the same row_number)."""
    w = W.partitionBy(key_col).orderBy(id_col)
    return (
        keys.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= cap)
        .drop("_rn")
    )


def key_counts(keys: DataFrame, key_col: str = "key") -> DataFrame:
    """(key, n_ids): per-key cardinality — one partial-aggregated groupBy."""
    return keys.groupBy(F.col(key_col).alias("key")).agg(
        F.count("*").alias("n_ids")
    )


def key_drop_log(
    keys: DataFrame, cap: int | Sequence[int], key_col: str = "key"
) -> DataFrame:
    """(key, n_ids, n_dropped) for every key cap_ids_per_key would truncate —
    the never-silent companion (same contract as cap_keys' drop log).

    With a sequence of caps, ONE counts pass (the aggregate exchange is
    shared) feeds one filter per cap regime and the output gains a leading
    ``cap`` column: (cap, key, n_ids, n_dropped), all bigint — the dual-cap
    audit shape used by the simhash-block and LSH-bucket drop queries."""
    g = key_counts(keys, key_col)
    if isinstance(cap, int):
        return g.filter(F.col("n_ids") > cap).select(
            "key", "n_ids", (F.col("n_ids") - cap).alias("n_dropped")
        )
    out = None
    for c in cap:
        d = g.filter(F.col("n_ids") > c).select(
            F.lit(c).cast("bigint").alias("cap"),
            "key",
            F.col("n_ids").cast("bigint").alias("n_ids"),
            (F.col("n_ids") - c).cast("bigint").alias("n_dropped"),
        )
        out = d if out is None else out.unionByName(d)
    return out


def cap_keys(keys: DataFrame, cfg: LinkageConfig, id_col: str = "rid") -> tuple[DataFrame, DataFrame]:
    """Enforce max_ids_per_key. Returns (kept_keys, drop_log).

    drop_log: (key, n_ids, n_dropped) for every truncated key — never silent.
    Keep-set is deterministic: lowest ids by sort order win.
    """
    keyed = keyed_with_stats(keys, cfg, id_col)
    kept = keyed.filter(F.col("_rn") <= cfg.max_ids_per_key).drop("_rn", "_kn")
    drops = (
        keyed.filter((F.col("_rn") == 1) & (F.col("_kn") > cfg.max_ids_per_key))
        .select(
            "key",
            F.col("_kn").alias("n_ids"),
            (F.col("_kn") - cfg.max_ids_per_key).alias("n_dropped"),
        )
    )
    return kept, drops


def candidate_pairs_with_drops(
    keys: DataFrame, cfg: LinkageConfig, id_col: str = "rid", persist: bool = True
) -> tuple[DataFrame, DataFrame]:
    """(pairs, drop_log): capped, salted, canonical (id1 < id2) pairs per key.

    One window pass annotates each key row with its rank and key cardinality;
    the annotated frame is persisted once and feeds the drop log, the cold
    equi-join (both sides) and the hot salt-grid join (both sides).
    """
    keyed = keyed_with_stats(keys, cfg, id_col)
    if persist:
        keyed = keyed.persist()

    drops = keyed.filter(
        (F.col("_rn") == 1) & (F.col("_kn") > cfg.max_ids_per_key)
    ).select(
        "key",
        F.col("_kn").alias("n_ids"),
        (F.col("_kn") - cfg.max_ids_per_key).alias("n_dropped"),
    )

    kept = keyed.filter(F.col("_rn") <= cfg.max_ids_per_key).withColumn(
        "_eff", F.least(F.col("_kn"), F.lit(cfg.max_ids_per_key))
    )

    cold = kept.filter(F.col("_eff") <= cfg.hot_key_threshold).select(id_col, "key")
    hot = kept.filter(F.col("_eff") > cfg.hot_key_threshold).select(id_col, "key")

    a, b = cold.alias("a"), cold.alias("b")
    cold_pairs = (
        a.join(b, "key")
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("id1"),
            F.col(f"b.{id_col}").alias("id2"),
            "key",
        )
    )

    s = cfg.salt_buckets
    # salt(x) is a deterministic bucket of the id; replicate each side across
    # the other side's salt axis so every (x, y) meets at exactly one grid cell
    salted = hot.withColumn("_salt", F.pmod(F.xxhash64(id_col), F.lit(s)))
    left = salted.withColumn("_s2", F.explode(F.sequence(F.lit(0), F.lit(s - 1)))).select(
        F.col(id_col), "key", F.col("_salt").alias("_s1"), "_s2"
    )
    right = salted.withColumn("_s1", F.explode(F.sequence(F.lit(0), F.lit(s - 1)))).select(
        F.col(id_col), "key", "_s1", F.col("_salt").alias("_s2")
    )
    la, rb = left.alias("a"), right.alias("b")
    hot_pairs = (
        la.join(rb, ["key", "_s1", "_s2"])
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("id1"),
            F.col(f"b.{id_col}").alias("id2"),
            "key",
        )
    )
    return cold_pairs.unionByName(hot_pairs), drops


def candidate_pairs(keys: DataFrame, cfg: LinkageConfig, id_col: str = "rid") -> DataFrame:
    """(id1, id2, key) candidate pairs — see candidate_pairs_with_drops."""
    pairs, _ = candidate_pairs_with_drops(keys, cfg, id_col, persist=False)
    return pairs


def distinct_pairs(pairs: DataFrame) -> DataFrame:
    """Collapse multi-key collisions to unique (id1, id2) edges-to-score."""
    return pairs.select("id1", "id2").distinct()

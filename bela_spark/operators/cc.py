"""Transitive clustering: iterative large-star/small-star connected components
(SURVEY.md C1-C6), checkpointed per round for resumability.

Algorithm (Kiveris et al., "Connected Components in MapReduce and Beyond",
the standard Spark CC formulation):
  large-star: for each node u, m = min(N(u) ∪ {u}); attach every strictly
              larger neighbor v > u directly to m.
  small-star: for each node u over edges (v <= u), m = min(N<=(u) ∪ {u});
              attach every v in N<=(u) ∪ {u} to m.
Alternating the two converges to star graphs whose centers are component
minima. Node ids are strings (sha256 hex) — lexicographic min is total and
collision-free at any scale, unlike 64-bit hashes at 10^12 rows.

Each round optionally writes edges to `<ckpt>/round=N` parquet plus a manifest
row (round, n_edges, xxhash64 edge-set signature, per-partition row counts —
the north rule's per-partition lineage), truncating lineage AND enabling
resume: a restarted job reads the newest complete round and continues.
Convergence test is signature equality (count + hash-sum) — an exceptAll-based
check would itself shuffle (SURVEY.md section 7 risk 3).

Reference anchors: entity-id-as-cluster (bela/evaluation/model_eval.py:201,269)
and checkpoint-for-resume discipline (bela/task/joint_el_task.py:561-592).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F


@dataclass
class CCResult:
    assignments: DataFrame  # (rid, component)
    rounds: int
    converged: bool


def _symmetrize(edges: DataFrame) -> DataFrame:
    return edges.select(F.col("id1").alias("u"), F.col("id2").alias("v")).unionByName(
        edges.select(F.col("id2").alias("u"), F.col("id1").alias("v"))
    )


def _neighbor_min(edges: DataFrame) -> DataFrame:
    """edges + per-u min neighbor `m`: map-side-combined groupBy min joined
    back with a shuffle-hash join. (Not a window min: WindowExec buffers each
    partition group, so a 10^8-degree hub — exactly the node large-star
    exists to shrink — would sit in one task's memory; the hash join streams
    the big side with no per-group buffering or sort.)"""
    mins = edges.groupBy("u").agg(F.min("v").alias("_mv"))
    return edges.join(mins.hint("shuffle_hash"), "u")


def _large_star(edges_sym: DataFrame) -> DataFrame:
    with_min = _neighbor_min(edges_sym).withColumn(
        "m", F.least(F.col("_mv"), F.col("u"))
    )
    return (
        with_min.filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("id1"), F.col("m").alias("id2"))
        .filter(F.col("id1") != F.col("id2"))
    )


def _small_star(edges: DataFrame) -> DataFrame:
    # orient each edge smaller <- larger, group by the larger endpoint
    oriented = edges.select(
        F.greatest("id1", "id2").alias("u"), F.least("id1", "id2").alias("v")
    )
    with_min = _neighbor_min(oriented).withColumnRenamed("_mv", "m")
    attach_neighbors = with_min.select(F.col("v").alias("id1"), F.col("m").alias("id2"))
    attach_center = with_min.select(F.col("u").alias("id1"), F.col("m").alias("id2")).distinct()
    return (
        attach_neighbors.unionByName(attach_center)
        .filter(F.col("id1") != F.col("id2"))
        .distinct()
    )


def _canonical(edges: DataFrame) -> DataFrame:
    return edges.select(
        F.least("id1", "id2").alias("id1"), F.greatest("id1", "id2").alias("id2")
    ).distinct()


def _signature(edges: DataFrame) -> tuple[int, int]:
    # bit_xor is order-independent and overflow-free (ANSI mode safe); the
    # edge set is distinct, so xor cancellation of duplicates cannot occur
    row = edges.select(
        F.count("*").alias("n"),
        F.coalesce(F.bit_xor(F.xxhash64("id1", "id2")), F.lit(0)).alias("h"),
    ).collect()[0]
    return int(row["n"]), int(row["h"])


def _round_dir(ckpt: str, n: int) -> str:
    return os.path.join(ckpt, f"round={n}")


def _persist_round(spark, edges: DataFrame, ckpt: str, n: int) -> DataFrame:
    """Materialize a round to parquet and read it back (truncates lineage)."""
    path = _round_dir(ckpt, n)
    edges.write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)


def _write_manifest(
    df: DataFrame, ckpt: str, n: int, sig: tuple[int, int], input_sig: tuple[int, int]
) -> None:
    """Per-round manifest with per-partition lineage/metrics (north rule).

    input_sig binds every round to the canonical INPUT edge set, so a resume
    against different input is detected instead of silently returning the
    previous run's components."""
    parts = (
        df.groupBy(F.spark_partition_id().alias("partition"))
        .agg(F.count("*").alias("n_rows"))
        .collect()
    )
    manifest = {
        "round": n,
        "n_edges": sig[0],
        "edge_set_hash": sig[1],
        "input_sig": list(input_sig),
        "partitions": {int(r["partition"]): int(r["n_rows"]) for r in parts},
    }
    with open(os.path.join(ckpt, f"manifest_round_{n}.json"), "w") as f:
        json.dump(manifest, f)


def _manifest_input_sig(ckpt: str, n: int) -> tuple[int, int] | None:
    try:
        with open(os.path.join(ckpt, f"manifest_round_{n}.json")) as f:
            sig = json.load(f).get("input_sig")
        return (int(sig[0]), int(sig[1])) if sig else None
    except (OSError, ValueError, TypeError):
        return None


def _clear_rounds(ckpt: str) -> None:
    """Remove every round dir + manifest: a fresh run must not leave stale
    higher-numbered rounds behind (a later resume would find latest_round()
    pointing at a round from the OLD input, mismatch forever, and pay a
    from-scratch run on every invocation)."""
    import shutil

    for name in os.listdir(ckpt):
        path = os.path.join(ckpt, name)
        if name.startswith("round="):
            shutil.rmtree(path, ignore_errors=True)
        elif name.startswith("manifest_round_"):
            try:
                os.remove(path)
            except OSError:
                pass


def latest_round(ckpt: str) -> int | None:
    """Newest complete checkpoint round, or None. Completeness = parquet
    _SUCCESS marker + manifest present (a killed job can't leave a torn round)."""
    if not os.path.isdir(ckpt):
        return None
    best = None
    for name in os.listdir(ckpt):
        if name.startswith("round="):
            n = int(name.split("=")[1])
            if os.path.exists(os.path.join(ckpt, f"round={n}", "_SUCCESS")) and os.path.exists(
                os.path.join(ckpt, f"manifest_round_{n}.json")
            ):
                best = n if best is None else max(best, n)
    return best


def connected_components(
    edges: DataFrame,
    max_rounds: int = 25,
    checkpoint_dir: str | None = None,
    resume: bool = True,
) -> CCResult:
    """(id1, id2) edge set -> (rid, component) with component = min member id.

    Only nodes that appear in an edge are returned; callers assign singleton
    records their own id via left join + coalesce (see pipeline.assign_clusters).
    """
    spark = edges.sparkSession
    cur = _canonical(edges)
    start_round = 0
    input_sig: tuple[int, int] | None = None
    _resume_cache: DataFrame | None = None

    if checkpoint_dir:
        os.makedirs(checkpoint_dir, exist_ok=True)
        if resume:
            lr = latest_round(checkpoint_dir)
            if lr is not None:
                # resume is only valid for the SAME input edge set: compare
                # the current input's signature with the one bound into the
                # checkpointed manifests; on mismatch (or a pre-signature
                # checkpoint) fall back to a fresh run rather than silently
                # returning the previous run's components
                recorded = _manifest_input_sig(checkpoint_dir, lr)
                # cache BEFORE the signature: validation needs one full pass
                # anyway, and on mismatch the fresh run below reuses the cached
                # frame instead of re-executing the (possibly expensive)
                # upstream scoring DAG a second time. persist (not
                # localCheckpoint) so the match path can unpersist explicitly
                # instead of orphaning blocks in executor storage.
                cur = cur.persist()
                _resume_cache = cur
                input_sig = _signature(cur)
                if recorded == input_sig:
                    cur = spark.read.parquet(_round_dir(checkpoint_dir, lr))
                    start_round = lr + 1
                    _resume_cache.unpersist()
                    _resume_cache = None
                else:
                    print(
                        f"[cc] checkpoint at {checkpoint_dir} was built from a "
                        f"different input edge set (recorded={recorded}, "
                        f"current={input_sig}); starting a fresh run"
                    )

    # materialize BEFORE computing the signature so the (possibly expensive)
    # upstream scoring DAG runs exactly once
    if checkpoint_dir and start_round == 0:
        _clear_rounds(checkpoint_dir)  # no stale rounds from a previous input
        cur = _persist_round(spark, cur, checkpoint_dir, 0)
        if _resume_cache is not None:
            _resume_cache.unpersist()  # round 0 is on parquet now
        prev_sig = _signature(cur)
        input_sig = prev_sig
        _write_manifest(cur, checkpoint_dir, 0, prev_sig, input_sig)
        start_round = 1
    else:
        if not checkpoint_dir:
            cur = cur.localCheckpoint()
        prev_sig = _signature(cur)
        if input_sig is None:
            input_sig = prev_sig

    converged = False
    rounds_done = start_round - 1 if checkpoint_dir else 0
    for rnd in range(start_round, start_round + max_rounds):
        nxt = _canonical(_small_star(_large_star(_symmetrize(cur))))
        if checkpoint_dir:
            nxt = _persist_round(spark, nxt, checkpoint_dir, rnd)
            sig = _signature(nxt)
            _write_manifest(nxt, checkpoint_dir, rnd, sig, input_sig)
        else:
            nxt = nxt.localCheckpoint()
            sig = _signature(nxt)
        rounds_done = rnd
        if sig == prev_sig:
            converged = True
            cur = nxt
            break
        prev_sig = sig
        cur = nxt

    # converged edge set is a star forest: (member -> center) plus centers
    members = cur.select(
        F.greatest("id1", "id2").alias("rid"), F.least("id1", "id2").alias("component")
    )
    centers = cur.select(F.least("id1", "id2").alias("rid")).distinct().withColumn(
        "component", F.col("rid")
    )
    assignments = (
        members.unionByName(centers)
        .groupBy("rid")
        .agg(F.min("component").alias("component"))
    )
    return CCResult(assignments=assignments, rounds=rounds_done, converged=converged)

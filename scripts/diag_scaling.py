"""Diagnostic: where does the at-scale pair stage's thread-scaling go?

Runs the SAME timed segment as bench_scaling.py at one parallelism level and
prints, per pass, wall time alongside the JVM's own accounting of the two
shared-resource suspects a single-process measurement has and a real
N-executor cluster does not:

  - gc_sec: total stop-the-world GC time delta (all collectors, via the
    GarbageCollectorMXBeans) — allocation churn from interpreted expression
    paths is a per-JVM bottleneck: GC work scales with aggregate allocation
    rate, and every thread stops together;
  - steal_sec: hypervisor steal delta (/proc/stat), host contention.

Optional kernel/GC experiments via env:
  BELA_DIAG_CPUS     thread count (default 16)
  BELA_DIAG_ROWS     input rows (default 2000000)
  BELA_DIAG_PASSES   timed passes (default 3)
  BELA_SCALE_CONFIG  "at_scale" (default) | "default"
  BELA_DIAG_GC       extra JVM GC flags, e.g. "-XX:+UseParallelGC"

Usage:  python scripts/diag_scaling.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _gc_sec(spark) -> float:
    """Total accumulated GC wall time (seconds) across all collectors of the
    driver JVM (== the only JVM in local mode, so it covers the executors)."""
    beans = (
        spark.sparkContext._jvm.java.lang.management.ManagementFactory
        .getGarbageCollectorMXBeans()
    )
    return sum(beans.get(i).getCollectionTime() for i in range(beans.size())) / 1e3


def _steal_sec() -> float:
    with open("/proc/stat") as f:
        return int(f.readline().split()[8]) / os.sysconf("SC_CLK_TCK")


def main() -> None:
    cpus = int(os.environ.get("BELA_DIAG_CPUS", "16"))
    rows = int(os.environ.get("BELA_DIAG_ROWS", "2000000"))
    n_passes = int(os.environ.get("BELA_DIAG_PASSES", "3"))
    which = os.environ.get("BELA_SCALE_CONFIG", "at_scale")
    gc_flags = os.environ.get("BELA_DIAG_GC", "")

    from bela_spark.config import LinkageConfig
    from bela_spark.fixtures import synth_repo_files
    from bela_spark.operators.blocking import blocking_keys
    from bela_spark.operators.scoring import fused_block_and_score
    from bela_spark.pipeline import pair_stage_features, prepare_records
    from bela_spark.session import get_spark

    from pyspark.sql import Window as W, functions as F

    cfg = LinkageConfig.at_scale() if which == "at_scale" else LinkageConfig()
    os.environ.setdefault("BELA_SPARK_DRIVER_MEM", "48g")
    extra = (
        {"spark.driver.extraJavaOptions": gc_flags} if gc_flags else {}
    )
    # BELA_DIAG_CONFS="k=v;k2=v2" — arbitrary conf experiments (AQE off,
    # cache codec, partition counts) without touching the session factory
    for kv in filter(None, os.environ.get("BELA_DIAG_CONFS", "").split(";")):
        k, v = kv.split("=", 1)
        extra[k] = v
    spark = get_spark(
        app_name=f"bela-diag-{cpus}",
        master=f"local[{cpus}]",
        shuffle_partitions=2 * cpus,
        extra_conf=extra,
    )

    def block_and_score(base_df, persist):
        keys = blocking_keys(base_df, cfg)
        kwf = keys.join(pair_stage_features(base_df, cfg), "rid")
        return fused_block_and_score(kwf, cfg, persist=persist)

    warm = prepare_records(synth_repo_files(spark, 2000, seed=7), cfg)
    block_and_score(warm, persist=False)[0].count()

    records = prepare_records(synth_repo_files(spark, rows, seed=42), cfg)
    records = records.withColumn(
        "rep", F.min("rid").over(W.partitionBy(F.md5("norm")))
    ).persist()
    records.count()
    base = records.filter(F.col("rid") == F.col("rep"))

    def build_agg():
        scored_by_key, _d = block_and_score(base, persist=True)
        return scored_by_key.agg(
            F.count("*").alias("n"), F.sum("score").alias("s")
        )

    row = build_agg().collect()[0]
    n_pairs = int(row["n"])
    out = {"cpus": cpus, "config": which, "gc_flags": gc_flags, "pairs": n_pairs,
           "passes": []}
    for _ in range(n_passes):
        agg = build_agg()
        g0, s0, t0 = _gc_sec(spark), _steal_sec(), time.time()
        agg.collect()
        out["passes"].append(
            {
                "wall_sec": round(time.time() - t0, 2),
                "gc_sec": round(_gc_sec(spark) - g0, 2),
                "steal_sec": round(_steal_sec() - s0, 1),
            }
        )
    best = min(p["wall_sec"] for p in out["passes"])
    out["score_sec"] = best
    out["pairs_per_sec"] = round(n_pairs / best, 1)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()

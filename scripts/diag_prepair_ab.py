"""Interleaved same-session A/B of the pair-stage input shape (guide §1.3):

  A (round-6 mid): keyed_with_counts over ALL key rows, no slim-keys persist
  B (candidate):   slim keys persisted once + min_count=2 counts join

Each arm runs the segment keys -> counts join -> feature join -> kwf persist
-> fused_block_and_score (eager boundaries) -> dedup_scored().count(), i.e.
the full pair stage off the shared records cache, then unpersists its frames.
Pair counts are printed每 arm and must agree.

Usage: python scripts/diag_prepair_ab.py [rounds]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])
    n_linkage = int(os.environ.get("BELA_BENCH_ROWS", str(int(6_000_000 * sf))))

    from pyspark.sql import functions as F

    from bela_spark.config import LinkageConfig
    from bela_spark.fixtures import synth_repo_files
    from bela_spark.operators.blocking import blocking_keys
    from bela_spark.operators.pairs import keyed_with_counts
    from bela_spark.operators.scoring import dedup_scored, fused_block_and_score
    from bela_spark.pipeline import pair_stage_features, prepare_records
    from bela_spark.session import get_spark

    spark = get_spark(
        app_name="bela-diag-prepair-ab",
        master=f"local[{cpus}]",
        shuffle_partitions=max(cpus * 2, 32),
    )
    cfg = LinkageConfig.at_scale()
    df = synth_repo_files(spark, n_linkage, seed=42)
    records = prepare_records(df, cfg).persist()
    ck = F.coalesce(F.md5("norm"), F.lit("\0"))
    reps = records.groupBy(ck.alias("_ck")).agg(F.min("rid").alias("rep"))
    base = (
        records.withColumn("_ck", ck)
        .join(reps.hint("shuffle_hash"), "_ck")
        .drop("_ck")
        .filter(F.col("rid") == F.col("rep"))
    ).persist()
    print(json.dumps({"n_base": base.count()}), flush=True)

    def arm(min_count: int, persist_slim: bool) -> int:
        keys_slim = blocking_keys(base, cfg, dedup=False)
        if persist_slim:
            keys_slim = keys_slim.persist()
        keys = keyed_with_counts(keys_slim, min_count=min_count)
        kwf = keys.join(pair_stage_features(base, cfg).hint("merge"), "rid").persist()
        scored_by_key, _ = fused_block_and_score(
            kwf, cfg, persist=True, counts_attached=True
        )
        if persist_slim:
            keys_slim.unpersist()
        n = dedup_scored(scored_by_key).count()
        kwf.unpersist()
        return n

    for r in range(1, rounds + 1):
        for name, mc, ps in (("A_all_rows", 1, False), ("B_slim_min2", 2, True)):
            t0 = time.time()
            n = arm(mc, ps)
            with open("/proc/loadavg") as f:
                la = float(f.read().split()[0])
            print(
                json.dumps(
                    {
                        "round": r,
                        "variant": name,
                        "sec": round(time.time() - t0, 2),
                        "n_pairs": n,
                        "load": la,
                    }
                ),
                flush=True,
            )
    spark.stop()


if __name__ == "__main__":
    main()

"""Phase decomposition of the CURRENT (post-r6) run_linkage shape (guide §1.4).

bench_extra.py's linkage section still decomposes the round-5 shape (dedup'd
keys, fused-internal counts join); this harness mirrors run_linkage as of the
r6 commits — dedup=False key-gen, slim keyed_with_counts BEFORE the feature
join, counts_attached=True, single kwf cache, persisted dedup_scored feeding
edges — so each phase number is attributable to code that actually runs in
the bench pass. Two in-session passes; pass 2 is the steady state bench.py's
min-of-2 converges to.

Usage: python scripts/diag_phases_r06b.py  (env: SPARK_GRAFT_* as bench.py)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])
    n_linkage = int(os.environ.get("BELA_BENCH_ROWS", str(int(6_000_000 * sf))))
    passes = int(os.environ.get("BELA_DIAG_PASSES", "2"))

    from pyspark.sql import functions as F

    from bela_spark.config import LinkageConfig
    from bela_spark.fixtures import synth_repo_files
    from bela_spark.operators.blocking import blocking_keys
    from bela_spark.operators.cc import connected_components
    from bela_spark.operators.pairs import keyed_with_counts
    from bela_spark.operators.scoring import (
        accept_edges,
        dedup_scored,
        fused_block_and_score,
    )
    from bela_spark.pipeline import pair_stage_features, prepare_records
    from bela_spark.session import get_spark

    spark = get_spark(
        app_name="bela-diag-r06b",
        master=f"local[{cpus}]",
        shuffle_partitions=max(cpus * 2, 32),
    )
    sc = spark.sparkContext
    cfg = LinkageConfig.at_scale()
    df = synth_repo_files(spark, n_linkage, seed=42)

    for p in range(1, passes + 1):
        spark.catalog.clearCache()
        timings: dict[str, float] = {}
        t_pass = time.time()

        def timed(name, fn):
            sc.setJobDescription(f"pass{p}:{name}")
            t0 = time.time()
            out = fn()
            timings[name] = round(time.time() - t0, 2)
            sc.setJobDescription(None)
            return out

        timed("p0_synthesis_noop", lambda: noop(df))

        records = prepare_records(df, cfg).persist()
        timed("p1a_records_cache", lambda: noop(records))
        ck = F.coalesce(F.md5("norm"), F.lit("\0"))
        reps = records.groupBy(ck.alias("_ck")).agg(F.min("rid").alias("rep"))
        records2 = (
            records.withColumn("_ck", ck)
            .join(reps.hint("shuffle_hash"), "_ck")
            .drop("_ck")
        ).persist()
        timed("p1b_collapse_cache", lambda: noop(records2))
        base = records2.filter(F.col("rid") == F.col("rep"))

        keys_slim = blocking_keys(base, cfg, dedup=False).persist()
        timed("p2_blocking_keys_cache", lambda: noop(keys_slim))
        keys_c = keyed_with_counts(keys_slim, min_count=2)
        feats = pair_stage_features(base, cfg)
        timed("p3_idf_features_noop", lambda: noop(feats))
        kwf = keys_c.join(
            pair_stage_features(base, cfg).hint("merge"), "rid"
        ).persist()
        timed("p4_kwf_cache", lambda: noop(kwf))
        keys_slim.unpersist()

        # fused_block_and_score runs range_boundaries (count+collect) eagerly
        t0 = time.time()
        sc.setJobDescription(f"pass{p}:p5a_boundaries")
        scored_by_key, drops = fused_block_and_score(
            kwf, cfg, persist=True, counts_attached=True
        )
        timings["p5a_fused_construct_boundaries"] = round(time.time() - t0, 2)
        sc.setJobDescription(None)

        scored = dedup_scored(scored_by_key).persist()
        timed("p5b_pairs_score_dedup_cache", lambda: noop(scored))
        edges = accept_edges(scored, cfg)
        cc = timed(
            "p6_cc", lambda: connected_components(edges, max_rounds=cfg.max_cc_rounds)
        )
        rep_assign = cc.assignments.withColumnRenamed("rid", "rep")
        clusters = (
            records2.join(rep_assign.hint("merge"), "rep", "left")
            .withColumn("cluster_id", F.coalesce("component", "rep"))
            .drop("component", "rep")
        )
        timed("p7_scored_count", lambda: scored.count())
        timed(
            "p8_clusters_distinct", lambda: clusters.select("cluster_id").distinct().count()
        )
        timed(
            "p9_key_drops",
            lambda: drops.groupBy("strategy").agg(F.count("*").alias("n")).collect(),
        )
        timings["pass_total"] = round(time.time() - t_pass, 2)
        with open("/proc/loadavg") as f:
            timings["loadavg"] = float(f.read().split()[0])
        print(json.dumps({"pass": p, **timings}), flush=True)

    spark.stop()


if __name__ == "__main__":
    main()

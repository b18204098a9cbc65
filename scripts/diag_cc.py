"""CC A/B microbench on a FIXED edge set (guide §1: isolate the operator).

Writes the bench pipeline's accepted-edge set to parquet once (if absent),
then times, in one session, alternating passes of:
  A. the round-5 string-id loop (inline reimplementation)
  B. the round-6 surrogate-long local path (operators.cc)
and asserts both produce identical assignments (count + xor hash).

Usage: python scripts/diag_cc.py [n_passes]   (env: BELA_BENCH_ROWS, SPARK_GRAFT_CPUS)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

EDGES = "/tmp/diag_cc_edges.parquet"


def main() -> None:
    passes = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    n_rows = int(os.environ.get("BELA_BENCH_ROWS", "600000"))

    from pyspark.sql import functions as F

    from bela_spark.operators import cc as cc_mod
    from bela_spark.session import get_spark

    spark = get_spark(
        app_name="diag-cc", master=f"local[{cpus}]", shuffle_partitions=max(cpus * 2, 32)
    )

    if not os.path.exists(os.path.join(EDGES, "_SUCCESS")):
        from bela_spark.config import LinkageConfig
        from bela_spark.fixtures import synth_repo_files
        from bela_spark.pipeline import run_linkage

        df = synth_repo_files(spark, n_rows, seed=42)
        run = run_linkage(df, LinkageConfig.at_scale(), collapse_exact=True)
        run.edges.write.mode("overwrite").parquet(EDGES)
        spark.catalog.clearCache()

    edges = spark.read.parquet(EDGES)
    print(json.dumps({"n_edges": edges.count()}), flush=True)

    def old_string_cc(edges, max_rounds=25):
        """Round-5 loop verbatim: string ids, per-round canonical distinct,
        inner center distinct, signature-equality convergence only."""
        from pyspark.sql import DataFrame

        def small_star_r5(e: DataFrame) -> DataFrame:
            oriented = e.select(
                F.greatest("id1", "id2").alias("u"), F.least("id1", "id2").alias("v")
            )
            with_min = cc_mod._neighbor_min(oriented).withColumnRenamed("_mv", "m")
            an = with_min.select(F.col("v").alias("id1"), F.col("m").alias("id2"))
            ac = with_min.select(F.col("u").alias("id1"), F.col("m").alias("id2")).distinct()
            return (
                an.unionByName(ac).filter(F.col("id1") != F.col("id2")).distinct()
            )

        cur = cc_mod._canonical(edges).localCheckpoint()
        prev_sig = cc_mod._signature(cur)
        rounds = 0
        for rnd in range(1, 1 + max_rounds):
            nxt = cc_mod._canonical(
                small_star_r5(cc_mod._large_star(cc_mod._symmetrize(cur)))
            ).localCheckpoint()
            sig = cc_mod._signature(nxt)
            rounds = rnd
            cur = nxt
            if sig == prev_sig:
                break
            prev_sig = sig
        return cc_mod._star_assignments(cur), rounds

    def sig_of(assign):
        row = assign.select(
            F.count("*").alias("n"),
            F.coalesce(F.bit_xor(F.xxhash64("rid", "component")), F.lit(0)).alias("h"),
        ).collect()[0]
        return int(row["n"]), int(row["h"])

    results = {}
    for p in range(passes):
        for arm, fn in (
            ("A_string_r5", lambda: old_string_cc(edges)),
            ("B_long_r6", lambda: (cc_mod._connected_components_local(edges, 25),)),
        ):
            spark.sparkContext.setJobDescription(f"{arm} pass {p}")
            t0 = time.time()
            out = fn()
            if arm == "A_string_r5":
                assign, rounds = out
            else:
                assign, rounds = out[0].assignments, out[0].rounds
            s = sig_of(assign)
            dt = round(time.time() - t0, 3)
            results.setdefault(arm, []).append(dt)
            print(
                json.dumps({"arm": arm, "pass": p, "sec": dt, "rounds": rounds, "sig": s}),
                flush=True,
            )
    print(json.dumps({"min": {k: min(v) for k, v in results.items()}}))
    spark.stop()


if __name__ == "__main__":
    main()

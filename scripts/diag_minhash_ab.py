"""Interleaved same-session A/B: explode+groupBy minhash (current) vs narrow
array_min(transform(...)) minhash (candidate), over the identical cached base
frame (guide §1.3: host drift hits both arms). Also value-checks that both
variants produce identical (rid, key) sets before timing.

Usage: python scripts/diag_minhash_ab.py [rounds]
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
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])
    n_linkage = int(os.environ.get("BELA_BENCH_ROWS", str(int(6_000_000 * sf))))

    from pyspark.sql import functions as F

    from bela_spark.config import LinkageConfig
    from bela_spark.fixtures import synth_repo_files
    from bela_spark.functions.hashing import band_keys
    from bela_spark.functions.text import shingles_of
    from bela_spark.pipeline import prepare_records
    from bela_spark.session import get_spark

    spark = get_spark(
        app_name="bela-diag-mh-ab",
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
        .select("rid", "tokens")
        .persist()
    )
    print(json.dumps({"n_base": base.count()}), flush=True)

    nh = cfg.num_minhashes
    sh = base.select("rid", shingles_of("tokens", cfg.shingle_k).alias("shingles"))

    # A: current explode + groupBy
    def wide_a():
        ex = sh.select(
            "rid", F.explode(F.array_distinct(F.col("shingles"))).alias("shingle")
        )
        aggs = [
            F.min(F.md5(F.concat_ws("#", F.col("shingle"), F.lit(str(s))))).alias(f"mh{s}")
            for s in range(nh)
        ]
        return ex.groupBy("rid").agg(*aggs)

    # B: narrow array_min(transform); _sh projected once so the 16 interpreted
    # HOFs don't each re-evaluate array_distinct
    def wide_b():
        pre = sh.where(F.size("shingles") >= 1).select(
            "rid", F.array_distinct("shingles").alias("_sh")
        )
        cols = [
            F.array_min(
                F.transform(
                    F.col("_sh"),
                    lambda t, s=s: F.md5(F.concat_ws("#", t, F.lit(str(s)))),
                )
            ).alias(f"mh{s}")
            for s in range(nh)
        ]
        return pre.select("rid", *cols)

    def keys_of(wide):
        bk = band_keys(wide, id_col="rid", num_hashes=nh, band_size=cfg.band_size)
        return bk.select(
            "rid",
            F.concat(
                F.lit("mh:"), F.col("band").cast("string"), F.lit(":"), F.col("band_key")
            ).alias("key"),
        )

    # value check: symmetric difference of the two (rid, key) sets must be 0
    ka, kb = keys_of(wide_a()), keys_of(wide_b())
    diff = ka.exceptAll(kb).count() + kb.exceptAll(ka).count()
    print(json.dumps({"keyset_symmetric_diff": diff}), flush=True)

    for r in range(1, rounds + 1):
        for name, fn in (("A_explode_groupby", wide_a), ("B_hof_narrow", wide_b)):
            t0 = time.time()
            noop(keys_of(fn()))
            with open("/proc/loadavg") as f:
                la = float(f.read().split()[0])
            print(
                json.dumps(
                    {"round": r, "variant": name, "sec": round(time.time() - t0, 2), "load": la}
                ),
                flush=True,
            )
    spark.stop()


if __name__ == "__main__":
    main()

"""Diagnostic #3: isolate the weighted-jaccard kernel's cost and scaling.

Builds an in-memory DataFrame shaped like the pair stage's join output (two
sorted packed-long token arrays per row, realistic ~30-60 element lengths)
and times candidate kernels over the SAME rows at one thread count:

  intersect_only   size(array_intersect)           — fully codegen-able
  hof_packed       aggregate(array_intersect, x&63) — current staged kernel
                   (ArrayAggregate is CodegenFallback, so the whole subtree
                   including array_intersect evaluates interpreted)
  hof_over_col     aggregate over a PRE-PROJECTED _ix column — what the
                   staged-split would buy IF CollapseProject kept the
                   projections apart (forced here with a no-op barrier)
  pandas_npy       Arrow-batched numpy kernel (sorted-array membership sum)

Env: BELA_DIAG_CPUS (default 16), BELA_DIAG_PAIRS (default 4000000).
Usage:  python scripts/diag_kernel.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pandas as pd


def main() -> None:
    cpus = int(os.environ.get("BELA_DIAG_CPUS", "16"))
    n_pairs = int(os.environ.get("BELA_DIAG_PAIRS", "4000000"))

    from bela_spark.session import get_spark

    from pyspark.sql import functions as F
    from pyspark.sql.pandas.functions import pandas_udf

    os.environ.setdefault("BELA_SPARK_DRIVER_MEM", "48g")
    spark = get_spark(
        app_name=f"bela-diagkernel-{cpus}",
        master=f"local[{cpus}]",
        shuffle_partitions=2 * cpus,
    )

    # synthetic packed token arrays: ~40 tokens/row, ~50% overlap between the
    # two sides, weights in the low 6 bits — the pair-join output shape
    base = spark.range(n_pairs).select(
        F.col("id"),
        F.sort_array(
            F.transform(
                F.sequence(F.lit(1), F.lit(20) + F.pmod(F.col("id"), F.lit(40))),
                lambda i: (F.pmod(F.xxhash64(F.col("id") * i), F.lit(100000)) * 64
                           + F.pmod(F.xxhash64(i), F.lit(60)) + 1),
            )
        ).alias("t1"),
        F.sort_array(
            F.transform(
                F.sequence(F.lit(1), F.lit(20) + F.pmod(F.col("id") + 7, F.lit(40))),
                lambda i: (F.pmod(F.xxhash64((F.col("id") + F.pmod(i, F.lit(2))) * i),
                                  F.lit(100000)) * 64
                           + F.pmod(F.xxhash64(i), F.lit(60)) + 1),
            )
        ).alias("t2"),
    ).persist()
    base.count()

    @pandas_udf("long")
    def wi_npy(t1: pd.Series, t2: pd.Series) -> pd.Series:
        out = np.empty(len(t1), dtype=np.int64)
        for i, (a, b) in enumerate(zip(t1.values, t2.values)):
            ix = np.intersect1d(a, b, assume_unique=True)
            out[i] = (ix & 63).sum() if len(ix) else 0
        return pd.Series(out)

    variants = {
        "intersect_only": lambda df: df.select(
            F.sum(F.size(F.array_intersect("t1", "t2")).cast("long")).alias("s")
        ),
        "hof_packed": lambda df: df.select(
            F.sum(
                F.aggregate(
                    F.array_intersect("t1", "t2"),
                    F.lit(0).cast("long"),
                    lambda acc, x: acc + x.bitwiseAND(F.lit(63)),
                )
            ).alias("s")
        ),
        "pandas_npy": lambda df: df.select(F.sum(wi_npy("t1", "t2")).alias("s")),
    }

    out = {"cpus": cpus, "pairs": n_pairs, "kernels": {}}
    for name, fn in variants.items():
        fn(base).collect()  # warm codegen
        times = []
        for _ in range(2):
            t0 = time.time()
            row = fn(base).collect()[0]
            times.append(round(time.time() - t0, 2))
        out["kernels"][name] = {
            "passes": times,
            "sec": min(times),
            "mpairs_per_sec": round(n_pairs / min(times) / 1e6, 2),
            "sum": int(row["s"]),
        }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()

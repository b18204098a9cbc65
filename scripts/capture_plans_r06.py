"""Capture explain('formatted') for the round-6 optimization targets.

Usage: python scripts/capture_plans_r06.py <before|after>
Writes plans/r06/<name>_<tag>.txt. The CC round plan is captured as the
one-round transformation (large-star + small-star) over a representative
edge frame, since the full CC is an iterative loop of localCheckpointed
frames, not one explainable DataFrame.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.01"
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r06")


def formatted(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> None:
    tag = sys.argv[1]
    os.makedirs(OUT, exist_ok=True)

    from pyspark.sql import functions as F

    from bela_spark import queries as q
    from bela_spark.config import LinkageConfig
    from bela_spark.fixtures import synth_repo_files
    from bela_spark.pipeline import run_linkage
    from bela_spark.session import get_spark

    spark = get_spark(app_name="plans-r06", master="local[8]", shuffle_partitions=16)

    def dump(name, df):
        with open(os.path.join(OUT, f"{name}_{tag}.txt"), "w") as f:
            f.write(formatted(df))
        print("wrote", name)

    # one CC star round over a representative canonical edge frame
    from bela_spark.operators import cc as cc_mod

    edges = spark.createDataFrame(
        [(f"e{i:04x}", f"e{j:04x}") for i in range(0, 40, 2) for j in (i + 1, i + 2)],
        ["id1", "id2"],
    )
    cur = cc_mod._canonical(edges)
    one_round = cc_mod._small_star(cc_mod._large_star(cc_mod._symmetrize(cur)))
    if tag == "before":
        one_round = cc_mod._canonical(one_round)
    dump("cc_one_round", one_round)

    # linkage pipeline frames (at_scale, collapse, fused path)
    df = synth_repo_files(spark, 4000, seed=42)
    run = run_linkage(df, LinkageConfig.at_scale(), collapse_exact=True, persist=False)
    dump("linkage_scored", run.scored)
    dump("linkage_clusters", run.clusters)

    # declared queries touched this round
    for name in (
        "er_flagship_clusters",
        "dedup_ngram_jaccard",
        "ann_lsh_topk",
        "text_token_stats",
    ):
        dump(name, getattr(q, name)(spark, SF_DIR))

    # ann_topk: the brute-force anchor rewritten to the mapInPandas kernel in
    # r6 (no before-file was captured at round start, so the before plan is
    # the old shape reproduced verbatim: broadcast crossJoin + interpreted
    # aggregate(zip_with) fold + row_number window)
    if tag == "after":
        from pyspark.sql import Window as W

        from bela_spark.functions.vectors import dot_product

        e = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        qq = e.select("vec_id", F.col("embedding").alias("qe"))
        cc = F.broadcast(
            e.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("ce"))
        )
        pairs = qq.crossJoin(cc).filter(F.col("vec_id") != F.col("neighbor_id"))
        scored = pairs.withColumn("ip_score", dot_product("qe", "ce")).drop("qe", "ce")
        w = W.partitionBy("vec_id").orderBy(F.desc("ip_score"), F.asc("neighbor_id"))
        old = scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= 5)
        with open(os.path.join(OUT, "ann_topk_before.txt"), "w") as f:
            f.write(formatted(old))
        dump("ann_topk", q.ann_topk(spark, SF_DIR))

    spark.stop()


if __name__ == "__main__":
    main()

"""Incremental streaming ingest: two micro-batches must converge to the same
clusters as one batch run over the union (exactly-once-equivalent semantics)."""

import os

import pytest

from bela_spark.config import LinkageConfig
from bela_spark.fixtures import synth_repo_files
from bela_spark.pipeline import run_linkage
from bela_spark.streaming.ingest import IncrementalLinkage


@pytest.mark.slow
def test_incremental_matches_batch(spark, tmp_path):
    cfg = LinkageConfig()
    df = synth_repo_files(spark, 300, seed=42).cache()
    half1 = df.limit(150)
    half2 = df.subtract(half1)

    input_dir = str(tmp_path / "in")
    os.makedirs(input_dir)
    half1.coalesce(1).write.mode("append").parquet(input_dir)

    inc = IncrementalLinkage(str(tmp_path / "state"), cfg)
    q = inc.start(spark, input_dir, str(tmp_path / "ckpt"))
    q.awaitTermination(300)

    half2.coalesce(1).write.mode("append").parquet(input_dir)
    q = inc.start(spark, input_dir, str(tmp_path / "ckpt"))
    q.awaitTermination(300)

    streamed = spark.read.parquet(str(tmp_path / "state" / "clusters"))

    batch = run_linkage(df, cfg, persist=False)

    def partitions(cl):
        rows = cl.select("rid", "cluster_id").collect()
        by = {}
        for r in rows:
            by.setdefault(r["cluster_id"], set()).add(r["rid"])
        return {frozenset(v) for v in by.values()}

    assert partitions(streamed) == partitions(batch.clusters)
    df.unpersist()

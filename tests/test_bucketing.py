"""Bucketed-table co-location: equi-joins on the bucket key need NO Exchange.

The at-scale claim behind sources.write_bucketed — storing records bucketed
on the join key removes the shuffle from every later join on that key — is
pinned here at the plan level: a self-join of two bucketed tables compiles to
a SortMergeJoin with ZERO Exchange operators, while the same join over plain
parquet shuffles both sides."""

import pytest
from pyspark.sql import functions as F

from bela_spark.config import LinkageConfig
from bela_spark.fixtures import synth_repo_files
from bela_spark.pipeline import prepare_records
from bela_spark.sources.repo_files import write_bucketed
from conftest import executed_plan as _plan


@pytest.fixture()
def no_broadcast(spark):
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_has_no_exchange(spark, no_broadcast):
    rec = prepare_records(synth_repo_files(spark, 300, seed=3), LinkageConfig())
    write_bucketed(rec.select("rid", "content_sha"), "rf_bucket_a", buckets=4, mode="overwrite")
    write_bucketed(rec.select("rid", "lang"), "rf_bucket_b", buckets=4, mode="overwrite")
    try:
        j = spark.table("rf_bucket_a").join(spark.table("rf_bucket_b"), "rid")
        plan = _plan(j)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, f"bucketed join shuffled:\n{plan}"
        assert j.count() == rec.count()
    finally:
        spark.sql("DROP TABLE IF EXISTS rf_bucket_a")
        spark.sql("DROP TABLE IF EXISTS rf_bucket_b")


def test_unbucketed_join_shuffles(spark, no_broadcast, tmp_path):
    """Control: the same join over plain parquet has Exchanges — proves the
    bucketed plan above is the bucketing, not a quirk of the tiny input."""
    rec = prepare_records(synth_repo_files(spark, 300, seed=3), LinkageConfig())
    rec.select("rid", "content_sha").write.parquet(str(tmp_path / "a"))
    rec.select("rid", "lang").write.parquet(str(tmp_path / "b"))
    j = spark.read.parquet(str(tmp_path / "a")).join(
        spark.read.parquet(str(tmp_path / "b")), "rid"
    )
    assert "Exchange" in _plan(j)


def test_bucketed_groupby_has_no_exchange(spark, no_broadcast):
    """Aggregation on the bucket key also runs shuffle-free."""
    rec = prepare_records(synth_repo_files(spark, 200, seed=5), LinkageConfig())
    write_bucketed(rec.select("rid", "lang"), "rf_bucket_g", buckets=4, mode="overwrite")
    try:
        agg = spark.table("rf_bucket_g").groupBy("rid").agg(F.count("*").alias("n"))
        assert "Exchange" not in _plan(agg)
        assert agg.count() == rec.count()
    finally:
        spark.sql("DROP TABLE IF EXISTS rf_bucket_g")

"""Fixture synthesis: deterministic, correctly structured (FIXTURES.md F1/F2)."""

import hashlib

from pyspark.sql import functions as F

from bela_spark.fixtures import synth_repo_files


def test_deterministic_across_runs_and_parallelism(spark):
    a = synth_repo_files(spark, 300, seed=42, with_truth=True, partitions=2)
    b = synth_repo_files(spark, 300, seed=42, with_truth=True, partitions=7)
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0


def test_seed_changes_content(spark):
    a = synth_repo_files(spark, 100, seed=42)
    b = synth_repo_files(spark, 100, seed=43)
    assert a.exceptAll(b).count() > 0


def test_group_structure(spark):
    df = synth_repo_files(spark, 500, seed=42, with_truth=True).cache()
    assert df.count() == 500
    sizes = df.groupBy("group_id").count()
    # 4-variant groups exist
    assert sizes.filter("count = 4").count() > 10
    # heavy (skew) groups exist
    assert sizes.filter("count > 10").count() >= 1
    # rows are unique records
    assert df.select("repo", "path", "commit").distinct().count() == 500
    df.unpersist()


def test_content_sha_invariant(spark):
    """sha2(content, 256) must equal hashlib's sha256 per row (north rule)."""
    df = synth_repo_files(spark, 50, seed=42)
    rows = df.withColumn("sha", F.sha2("content", 256)).collect()
    for r in rows:
        assert r["sha"] == hashlib.sha256(r["content"].encode()).hexdigest()

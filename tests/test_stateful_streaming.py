"""applyInPandasWithState first-seen dedup: duplicates must be suppressed
ACROSS micro-batches and across query restarts (state store persistence)."""

import os

import pytest

from bela_spark.streaming.stateful import streaming_exact_dedup

DDL = "rid string, content string"


def _write_batch(spark, input_dir, rows):
    spark.createDataFrame(rows, DDL).coalesce(1).write.mode("append").parquet(input_dir)


def _run_available(spark, input_dir, out_dir, ckpt):
    stream = spark.readStream.schema(DDL).option("maxFilesPerTrigger", 1).parquet(input_dir)
    q = (
        streaming_exact_dedup(stream)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)


@pytest.mark.slow
def test_first_seen_dedup_across_batches_and_restarts(spark, tmp_path):
    input_dir, out_dir, ckpt = (str(tmp_path / d) for d in ("in", "out", "ckpt"))
    os.makedirs(input_dir)

    # batch 1: A twice (keeper = min rid), B once
    _write_batch(spark, input_dir, [("r2", "aaa"), ("r1", "aaa"), ("r3", "bbb")])
    _run_available(spark, input_dir, out_dir, ckpt)

    # batch 2 (new query run, same checkpoint): A replayed, C new
    _write_batch(spark, input_dir, [("r4", "aaa"), ("r5", "ccc")])
    _run_available(spark, input_dir, out_dir, ckpt)

    out = spark.read.parquet(out_dir).collect()
    by_content = {}
    for r in out:
        by_content.setdefault(r["content_sha"], []).append(r)
    # exactly one emission per distinct content, despite the cross-run replay
    assert sorted(len(v) for v in by_content.values()) == [1, 1, 1]
    keepers = {v[0]["rid"] for v in by_content.values()}
    assert keepers == {"r1", "r3", "r5"}  # min rid of the FIRST batch seen
    a_row = [v[0] for v in by_content.values() if v[0]["rid"] == "r1"][0]
    assert a_row["n_in_batch"] == 2

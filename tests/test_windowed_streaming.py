"""Watermarked event-time windows: a late event arriving behind the watermark
must be DROPPED (its already-finalized window is never double-counted), and
every window is emitted exactly once across availableNow restarts."""

import os
from datetime import datetime

import pytest

from bela_spark.streaming.windows import windowed_event_counts

DDL = "event_id long, ts timestamp, event_type string, value double"


def _write(spark, input_dir, rows):
    spark.createDataFrame(
        [(i, datetime.fromisoformat(t), et, v) for i, t, et, v in rows], DDL
    ).coalesce(1).write.mode("append").parquet(input_dir)


def _run(spark, input_dir, out_dir, ckpt):
    stream = spark.readStream.schema(DDL).option("maxFilesPerTrigger", 1).parquet(input_dir)
    q = (
        windowed_event_counts(stream)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)


@pytest.mark.slow
def test_late_event_dropped_behind_watermark(spark, tmp_path):
    input_dir, out_dir, ckpt = (str(tmp_path / d) for d in ("in", "out", "ckpt"))
    os.makedirs(input_dir)

    # run 1: window [08:00) gets one event; max ts 10:30 -> watermark 09:30
    _write(
        spark,
        input_dir,
        [(1, "2024-01-01T08:30:00", "click", 1.0), (2, "2024-01-01T10:30:00", "click", 2.0)],
    )
    _run(spark, input_dir, out_dir, ckpt)

    # run 2: a LATE event at 08:15 (behind the 09:30 watermark -> dropped)
    # plus fresh data advancing the watermark to 12:00
    _write(
        spark,
        input_dir,
        [(3, "2024-01-01T08:15:00", "click", 100.0), (4, "2024-01-01T13:00:00", "click", 3.0)],
    )
    _run(spark, input_dir, out_dir, ckpt)

    # run 3: push the watermark far enough that every earlier window is final
    _write(spark, input_dir, [(5, "2024-01-02T00:00:00", "click", 4.0)])
    _run(spark, input_dir, out_dir, ckpt)

    rows = {
        (r["window_start"].isoformat(), r["event_type"]): r
        for r in spark.read.parquet(out_dir).collect()
    }
    w8 = rows[("2024-01-01T08:00:00", "click")]
    # the late 100.0-value event must NOT appear: count 1, value 1.0
    assert w8["n_events"] == 1 and w8["total_value"] == 1.0
    w10 = rows[("2024-01-01T10:00:00", "click")]
    assert w10["n_events"] == 1 and w10["total_value"] == 2.0
    w13 = rows[("2024-01-01T13:00:00", "click")]
    assert w13["n_events"] == 1 and w13["total_value"] == 3.0
    # each finalized window appears exactly once (append-mode finalize-once)
    assert len([k for k in rows if k[0].startswith("2024-01-01")]) == 3

"""SparkSession factory tuned for this engine.

Local-mode testing uses ``local[$SPARK_GRAFT_CPUS]``; on a real cluster the
same builder is driven by spark-submit conf. AQE is on (skew-join splitting is
the backstop behind our explicit salting, SURVEY.md section 4).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "bela_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    arrow_batch_size: int = 10_000,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with scale-appropriate defaults.

    ``shuffle_partitions`` defaults to the local core count; on a cluster it
    should be ~2-3x total executor cores (set via spark-submit --conf).
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or os.environ.get("BELA_SPARK_MASTER", f"local[{cpus}]")
    if shuffle_partitions is None:
        n = master[master.find("[") + 1 : master.find("]")] if "[" in master else cpus
        shuffle_partitions = 32 if n == "*" else max(8, int(n))

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", str(arrow_batch_size))
        .config("spark.driver.memory", os.environ.get("BELA_SPARK_DRIVER_MEM", "24g"))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # NOTE on spark.cleaner.periodicGC.interval (left at the stock 30min
        # here, deliberately): the ContextCleaner frees shuffle files and
        # dropped checkpoint blocks only after a JVM GC notices the dead
        # reference, so a LONG iterative job accumulates dead scratch for up
        # to the interval — a 16M-row linkage run filled 80 GB of local disk
        # that way. Jobs that run for tens of minutes must shorten it
        # (submit_linkage.py pins 5min; the 16M robustness run used 2min via
        # extra_conf). It is NOT shortened globally because the forced
        # System.gc() stalls every executor thread: measured +5% on a
        # 16-thread pair-stage pass (31.7s vs 30.0s best-of-3) — a pure tax
        # on the short jobs (tests, bench, oracle sweeps) this factory
        # mostly serves, which never live long enough for disk to bind.
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark

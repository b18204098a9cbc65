"""Source/sink layer for the north-rule input table.

The pipeline's one input is an Iceberg table of source-code repositories with
columns ``(repo, path, commit, lang, content)`` (BASELINE.json input_hint).
This module is the single place that turns a *source spec string* into that
DataFrame, so every entry point (spark-submit job, tests, bench) shares one
read path with one schema contract:

    iceberg:<catalog.db.table>   Iceberg table (needs the iceberg-spark
                                 runtime on the cluster; see ICEBERG_HELP)
    table:<name>                 any catalog table (works for Iceberg tables
                                 once the catalog is configured — on a real
                                 deployment this is the common spelling)
    parquet:<path> | <path>      parquet file/directory
    orc:<path>                   ORC file/directory
    csv:<path>                   headered CSV (explicit schema, multiline
                                 quoted content)
    jsonl:<path>                 JSONL lines (the reference's at-rest format,
                                 bela/datamodule/joint_el_datamodule.py:43-163;
                                 read with an EXPLICIT schema — inference would
                                 scan 100 TB twice)
    documents:<sf_dir>           driver `documents` table adapted to shape
    synth:rows=N[,seed=S]        deterministic synthetic table (fixtures)

Scale notes: the read is column-pruned to exactly the five contract columns
(content is by far the widest — pruning anything else off the scan matters at
10^12 files), and validation touches only the schema, never the data. Writes
partition by ``lang`` (low cardinality, the pipeline's natural scan filter)
— never by ``repo`` (10^8 distinct values would explode the file count).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

REPO_FILES_COLUMNS = ("repo", "path", "commit", "lang", "content")
_CONTRACT_DDL = ", ".join(f"{c} string" for c in REPO_FILES_COLUMNS)

ICEBERG_HELP = (
    "reading 'iceberg:{table}' needs the Iceberg Spark runtime and a catalog, "
    "e.g.:\n"
    "  spark-submit --packages org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:1.10.0 \\\n"
    "    --conf spark.sql.catalog.my_cat=org.apache.iceberg.spark.SparkCatalog \\\n"
    "    --conf spark.sql.catalog.my_cat.type=rest \\\n"
    "    --conf spark.sql.catalog.my_cat.uri=<catalog-uri> ...\n"
    "(this sandbox has no Iceberg jars; use parquet:/synth: locally)"
)


def _validate(df: DataFrame, source: str) -> DataFrame:
    """Enforce the input contract: the five columns exist and are strings.

    Returns the frame pruned to exactly the contract columns (explicit
    column pruning — extra table columns never reach the scan)."""
    missing = [c for c in REPO_FILES_COLUMNS if c not in df.columns]
    if missing:
        raise ValueError(
            f"source {source!r} is missing required columns {missing}; "
            f"need {list(REPO_FILES_COLUMNS)}, got {df.columns}"
        )
    types = dict(df.dtypes)
    bad = [c for c in REPO_FILES_COLUMNS if types[c] != "string"]
    if bad:
        raise ValueError(
            f"source {source!r}: columns {bad} must be string, got "
            f"{[(c, types[c]) for c in bad]}"
        )
    return df.select(*REPO_FILES_COLUMNS)


def _parse_kv(spec: str) -> dict[str, str]:
    return dict(part.split("=", 1) for part in spec.split(",") if part)


def _wrap_iceberg_error(e: Exception, table: str) -> Exception:
    """Translate ONLY missing-runtime failures into the setup help message;
    real errors (table exists / not found / permission) pass through so the
    operator sees the actual cause, not a misleading --packages hint."""
    msg = str(e)
    if any(
        s in msg
        for s in ("DATA_SOURCE_NOT_FOUND", "Failed to find the data source",
                  "Failed to find data source", "ClassNotFoundException")
    ):
        return RuntimeError(ICEBERG_HELP.format(table=table))
    return e


_SPEC_SCHEMES = (
    "iceberg", "table", "documents", "jsonl", "orc", "csv", "synth", "parquet"
)
# Hadoop filesystem URI schemes that are legitimate bare parquet paths
# (hdfs://nn/path, s3a://bucket/key, file:/tmp/x, ...): these pass through to
# spark.read.parquet, which resolves them via the Hadoop FileSystem registry.
_FS_URI_SCHEMES = frozenset(
    ("file", "hdfs", "webhdfs", "viewfs", "s3", "s3a", "s3n", "gs",
     "abfs", "abfss", "wasb", "wasbs", "oss", "o3fs", "ofs")
)
_SCHEME_RE = re.compile(r"^([A-Za-z][A-Za-z0-9+._-]*):")


def _reject_unknown_scheme(
    source: str, supported: tuple[str, ...] = _SPEC_SCHEMES
) -> None:
    """A typo'd spec prefix ('icberg:cat.db.t', a future 'delta:/x') must not
    be silently read as a literal parquet path and die with a misleading
    path-not-found — raise an unknown-scheme error listing what IS supported
    (the WRITE side passes its own, smaller list — the read-spec list would
    be self-contradictory there). Bare paths (no '<scheme>:' prefix) and
    Hadoop filesystem URIs stay valid parquet specs."""
    m = _SCHEME_RE.match(source)
    if m and m.group(1).lower() not in _FS_URI_SCHEMES:
        raise ValueError(
            f"unknown source scheme {m.group(1)!r} in spec {source!r}; "
            f"supported specs: {', '.join(s + ':' for s in supported)} "
            f"or a bare/URI parquet path"
        )


def read_repo_files(spark: SparkSession, source: str) -> DataFrame:
    """Source spec string -> validated (repo, path, commit, lang, content)."""
    if source.startswith("iceberg:"):
        table = source[len("iceberg:"):]
        try:
            df = spark.read.format("iceberg").load(table)
        except Exception as e:  # missing runtime -> actionable message
            raise _wrap_iceberg_error(e, table) from e
        return _validate(df, source)
    if source.startswith("table:"):
        return _validate(spark.table(source[len("table:"):]), source)
    if source.startswith("documents:"):
        from bela_spark.pipeline import documents_as_repo_files

        return _validate(
            documents_as_repo_files(spark, source[len("documents:"):]), source
        )
    if source.startswith("jsonl:"):
        df = spark.read.schema(_CONTRACT_DDL).json(source[len("jsonl:"):])
        return _validate(df, source)
    if source.startswith("orc:"):
        return _validate(spark.read.orc(source[len("orc:"):]), source)
    if source.startswith("csv:"):
        df = spark.read.schema(_CONTRACT_DDL).csv(
            source[len("csv:"):],
            header=True,
            multiLine=True,  # source-code content spans lines inside quotes
            escape='"',
            # content is bytes-exact (sha256 row invariant): never trim
            ignoreLeadingWhiteSpace=False,
            ignoreTrailingWhiteSpace=False,
        )
        return _validate(df, source)
    if source.startswith("synth:"):
        from bela_spark.fixtures import synth_repo_files

        kv = _parse_kv(source[len("synth:"):])
        return _validate(
            synth_repo_files(
                spark, n_rows=int(kv["rows"]), seed=int(kv.get("seed", "42"))
            ),
            source,
        )
    if source.startswith("parquet:"):
        return _validate(spark.read.parquet(source[len("parquet:"):]), source)
    _reject_unknown_scheme(source)
    return _validate(spark.read.parquet(source), source)


def read_repo_files_stream(
    spark: SparkSession,
    directory: str,
    fmt: str = "parquet",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Structured Streaming face of the contract table: files landing in
    `directory` become micro-batches with the same validated, pruned schema —
    the natural feed for an incremental-linkage loop (streaming/ingest.py
    implements that loop batch-driven today). `max_files_per_trigger` bounds
    per-batch work (the backpressure knob for a CDC-style drip of repo
    snapshots)."""
    reader = spark.readStream.schema(_CONTRACT_DDL).format(fmt)
    if fmt == "csv":
        # same contract options as the batch csv: spec — without them the
        # header lands as data, quoted multi-line content splits, and
        # trimming silently breaks the sha256 row invariant
        reader = (
            reader.option("header", True)
            .option("multiLine", True)
            .option("escape", '"')
            .option("ignoreLeadingWhiteSpace", False)
            .option("ignoreTrailingWhiteSpace", False)
        )
    if max_files_per_trigger is not None:
        if max_files_per_trigger < 1:
            raise ValueError(
                f"max_files_per_trigger must be >= 1, got {max_files_per_trigger}"
            )
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return _validate(reader.load(directory), f"stream:{directory}")


def write_repo_files(df: DataFrame, target: str, mode: str = "error") -> None:
    """Write a repo_files-shaped frame to an Iceberg table or parquet dir.

    Iceberg targets get a hidden partition spec of (lang, bucket(64, repo)):
    lang is the scan filter the pipeline pushes down, and bucketing repo keeps
    any one repo's files in bounded file sets without a 10^8-way partition
    explosion. Parquet targets partition by lang only (same pushdown, no
    bucket support without a table format)."""
    df = _validate(df, target)
    if target.startswith("iceberg:"):
        table = target[len("iceberg:"):]
        try:
            writer = df.writeTo(table).using("iceberg").partitionedBy(
                F.col("lang"), F.bucket(64, "repo")
            )
            if mode == "overwrite":
                writer.createOrReplace()
            else:
                writer.create()
        except Exception as e:
            raise _wrap_iceberg_error(e, table) from e
        return
    if target.startswith("parquet:"):
        path = target[len("parquet:"):]
    else:
        # same contract as the read side, but listing only WRITE targets
        _reject_unknown_scheme(target, supported=("iceberg", "parquet"))
        path = target
    df.write.mode(mode).partitionBy("lang").parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str = "rid",
    buckets: int = 64,
    mode: str = "error",
) -> None:
    """Bucketed managed-table sink (co-located joins, SURVEY.md section 4).

    Records stored bucketed+sorted on the join key make every later equi-join
    on that key shuffle-free on this side — the repeated-join pattern of
    incremental linkage (streaming re-runs joining the stored records on rid
    each micro-batch) and of cluster re-assignment. At 10^12 rows that is the
    difference between re-shuffling 100 TB per run and reading co-located
    buckets in place; tests/test_bucketing.py pins the zero-Exchange plan."""
    (
        df.write.bucketBy(buckets, bucket_col)
        .sortBy(bucket_col)
        .mode(mode)
        .format("parquet")
        .saveAsTable(table)
    )

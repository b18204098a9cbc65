"""Source/sink layer: spec dispatch, schema contract, parquet roundtrip."""

import pytest
from pyspark.sql import functions as F

from bela_spark.sources import REPO_FILES_COLUMNS, read_repo_files, write_repo_files


def test_synth_spec(spark):
    df = read_repo_files(spark, "synth:rows=200,seed=7")
    assert df.columns == list(REPO_FILES_COLUMNS)
    assert df.count() == 200


def test_parquet_roundtrip_preserves_sha(spark, tmp_path):
    """Per-row invariant (input_hint): content sha256 survives the sink."""
    src = read_repo_files(spark, "synth:rows=150")
    out = str(tmp_path / "rf")
    write_repo_files(src, out, mode="overwrite")
    back = read_repo_files(spark, f"parquet:{out}")
    assert back.columns == list(REPO_FILES_COLUMNS)
    sha = lambda d: {
        r[0]
        for r in d.select(
            F.sha2(F.concat_ws("\x00", "repo", "path", "commit", "content"), 256)
        ).collect()
    }
    assert sha(back) == sha(src)
    # lang partitioning materialized (pushdown-able scan filter)
    assert any((tmp_path / "rf").glob("lang=*")), "expected lang= partition dirs"


def test_jsonl_spec(spark, tmp_path):
    """S1 face: JSONL at rest, explicit schema (no inference scan)."""
    rows = read_repo_files(spark, "synth:rows=40").collect()
    p = tmp_path / "rf.jsonl"
    import json

    p.write_text("\n".join(json.dumps(r.asDict()) for r in rows))
    back = read_repo_files(spark, f"jsonl:{p}")
    assert back.columns == list(REPO_FILES_COLUMNS)
    assert back.count() == 40
    assert {r["content"] for r in back.collect()} == {r["content"] for r in rows}


def test_orc_spec(spark, tmp_path):
    src = read_repo_files(spark, "synth:rows=30")
    p = str(tmp_path / "rf_orc")
    src.write.orc(p)
    back = read_repo_files(spark, f"orc:{p}")
    assert back.columns == list(REPO_FILES_COLUMNS)
    assert back.count() == 30


def test_csv_spec_multiline_content(spark, tmp_path):
    """Quoted multi-line source-code content survives the CSV roundtrip."""
    src = read_repo_files(spark, "synth:rows=30")
    p = str(tmp_path / "rf_csv")
    (
        src.write.option("header", True)
        .option("escape", '"')
        # the writer ALSO trims by default — trailing newlines in content
        # must survive for the sha256 row invariant
        .option("ignoreLeadingWhiteSpace", False)
        .option("ignoreTrailingWhiteSpace", False)
        .csv(p)
    )
    back = read_repo_files(spark, f"csv:{p}")
    assert back.count() == 30
    assert {r["content"] for r in back.collect()} == {
        r["content"] for r in src.collect()
    }


def test_stream_spec(spark, tmp_path):
    """readStream over the contract dir: two file drops -> all rows, pruned
    schema (the feed incremental linkage consumes)."""
    from bela_spark.sources import read_repo_files_stream

    d = str(tmp_path / "drops")
    read_repo_files(spark, "synth:rows=20,seed=1").write.parquet(f"{d}/b1")
    read_repo_files(spark, "synth:rows=10,seed=2").write.parquet(f"{d}/b2")
    stream = read_repo_files_stream(spark, f"{d}/*", max_files_per_trigger=4)
    assert stream.isStreaming
    assert stream.columns == list(REPO_FILES_COLUMNS)
    q = (
        stream.writeStream.format("memory")
        .queryName("rf_stream_test")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert spark.table("rf_stream_test").count() == 30


ADVERSARIAL_CONTENT = [
    'quotes "double" and \'single\'',
    "commas, semicolons; and\ttabs",
    "trailing newline\n",
    "\nleading newline and\r\nCRLF",
    "unicode: наушники 機械 🎧 ß",
    "",
    '"fully quoted"',
    "embedded \"quote, comma\" mix\nline2,\"x\"\n",
]


@pytest.mark.parametrize("fmt", ["jsonl", "csv"])
def test_text_format_roundtrip_adversarial(spark, tmp_path, fmt):
    """The text at-rest formats must keep content BYTES-EXACT (sha256 row
    invariant) through quotes, separators, CR/LF, unicode and empties."""
    rows = [
        (f"r{i}", f"p{i}", f"c{i}", "py", content)
        for i, content in enumerate(ADVERSARIAL_CONTENT)
    ]
    src = spark.createDataFrame(rows, schema=list(REPO_FILES_COLUMNS))
    p = str(tmp_path / f"rf_{fmt}")
    if fmt == "csv":
        (
            src.write.option("header", True)
            .option("escape", '"')
            .option("ignoreLeadingWhiteSpace", False)
            .option("ignoreTrailingWhiteSpace", False)
            .csv(p)
        )
    else:
        src.write.json(p)
    back = read_repo_files(spark, f"{fmt}:{p}")
    got = {(r["repo"], r["content"]) for r in back.collect()}
    want = {(r, c if c else None) for r, _, _, _, c in rows} if fmt == "csv" else {
        (r, c) for r, _, _, _, c in rows
    }
    if fmt == "csv":
        # CSV cannot distinguish empty string from null — documented limit
        got = {(r, c if c else None) for r, c in got}
    assert got == want


def test_stream_csv_keeps_contract_options(spark, tmp_path):
    """Streaming CSV must apply the same header/multiline/no-trim options as
    the batch csv: spec, or content silently breaks the sha invariant."""
    from bela_spark.sources import read_repo_files_stream

    src = read_repo_files(spark, "synth:rows=15")
    d = str(tmp_path / "csvdrops")
    (
        src.write.option("header", True)
        .option("escape", '"')
        .option("ignoreLeadingWhiteSpace", False)
        .option("ignoreTrailingWhiteSpace", False)
        .csv(d)
    )
    stream = read_repo_files_stream(spark, d, fmt="csv")
    q = (
        stream.writeStream.format("memory")
        .queryName("rf_csv_stream_test")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r["content"] for r in spark.table("rf_csv_stream_test").collect()}
    assert got == {r["content"] for r in src.collect()}
    with pytest.raises(ValueError, match="max_files_per_trigger"):
        read_repo_files_stream(spark, d, max_files_per_trigger=0)


def test_table_spec(spark):
    read_repo_files(spark, "synth:rows=50").createOrReplaceTempView("rf_view")
    assert read_repo_files(spark, "table:rf_view").count() == 50


def test_documents_spec(spark):
    df = read_repo_files(spark, "documents:/root/testdata/sf0.001")
    assert df.columns == list(REPO_FILES_COLUMNS)
    assert df.count() > 0


def test_missing_column_rejected(spark):
    bad = read_repo_files(spark, "synth:rows=10").drop("commit")
    with pytest.raises(ValueError, match="commit"):
        from bela_spark.sources.repo_files import _validate

        _validate(bad, "bad")


def test_non_string_column_rejected(spark):
    bad = read_repo_files(spark, "synth:rows=10").withColumn(
        "commit", F.lit(1)
    )
    from bela_spark.sources.repo_files import _validate

    with pytest.raises(ValueError, match="must be string"):
        _validate(bad, "bad")


def test_extra_columns_pruned(spark):
    from bela_spark.fixtures import synth_repo_files

    df = synth_repo_files(spark, 20, with_truth=True)  # extra group_id column
    df.createOrReplaceTempView("rf_truth_view")
    assert read_repo_files(spark, "table:rf_truth_view").columns == list(
        REPO_FILES_COLUMNS
    )


def test_iceberg_spec_fails_actionably(spark):
    """No Iceberg runtime in this sandbox: the error must say how to add it."""
    with pytest.raises(RuntimeError, match="iceberg-spark-runtime"):
        read_repo_files(spark, "iceberg:cat.db.repo_files")


def test_unknown_scheme_rejected(spark, tmp_path):
    """A typo'd or unsupported spec prefix must raise an unknown-scheme error
    listing the supported specs — not be silently read as a literal parquet
    path that dies with a misleading path-not-found (ADVICE r3)."""
    for bad in ("icberg:cat.db.t", "delta:/somewhere", "kafka:topic"):
        with pytest.raises(ValueError, match="unknown source scheme"):
            read_repo_files(spark, bad)
    # the write side enforces the same contract
    from bela_spark.sources import write_repo_files

    df = read_repo_files(spark, "synth:rows=5")
    with pytest.raises(ValueError, match="unknown source scheme"):
        write_repo_files(df, "icberg:cat.db.t")
    # Hadoop filesystem URIs stay valid bare parquet specs: write + read back
    # through the explicit file: scheme
    p = f"file:{tmp_path}/rf_uri"
    write_repo_files(df, p, mode="overwrite")
    assert read_repo_files(spark, p).count() == 5

"""Multimodal plumbing tests: the binary column, metadata struct, Arrow batch
shape, and the deterministic stub kernel (the decode itself is a documented
stand-in — these tests pin everything Spark-side around it)."""

import hashlib

from pyspark.sql import functions as F

from bela_spark.operators.multimodal import extract_features, synth_media, _decode_image


def _docs(spark):
    return spark.createDataFrame(
        [(1, "hello world"), (2, ""), (3, "x" * 1000)], "doc_id long, text string"
    )


def test_synth_media_schema_and_payload_roundtrip(spark):
    m = synth_media(_docs(spark))
    assert [f.name for f in m.schema.fields] == ["media_id", "kind", "payload", "meta"]
    assert m.schema["payload"].dataType.simpleString() == "binary"
    assert (
        m.schema["meta"].dataType.simpleString()
        == "struct<mime:string,width:int,height:int,duration_ms:int>"
    )
    rows = {r["media_id"]: r for r in m.collect()}
    assert bytes(rows["m1"]["payload"]) == b"hello world"
    assert bytes(rows["m2"]["payload"]) == b""
    assert rows["m3"]["meta"]["duration_ms"] == 10000
    assert all(r["kind"] in ("image", "audio", "video") for r in rows.values())


def test_extract_features_matches_local_kernel(spark):
    feats = {r["media_id"]: r for r in extract_features(synth_media(_docs(spark))).collect()}
    for doc_id, text in ((1, "hello world"), (2, ""), (3, "x" * 1000)):
        r = feats[f"m{doc_id}"]
        payload = text.encode()
        assert r["n_bytes"] == len(payload)
        assert r["payload_sha"] == hashlib.sha256(payload).hexdigest()
        want = _decode_image(payload)
        assert len(r["feature"]) == 8
        assert list(r["feature"]) == [float(x) for x in want]


def test_extract_features_no_shuffle(spark):
    media = synth_media(_docs(spark)).repartition(3)
    out = extract_features(media)
    from conftest import executed_plan

    plan = executed_plan(out)
    assert "Exchange" not in plan.replace("Exchange RoundRobinPartitioning", "", 1), plan
    assert out.rdd.getNumPartitions() == 3

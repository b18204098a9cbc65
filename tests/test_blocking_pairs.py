"""Blocking keys + candidate-pair generation (SURVEY.md J1/J3)."""

import hashlib

from pyspark.sql import functions as F

from bela_spark.config import LinkageConfig
from bela_spark.functions.hashing import band_keys, minhash_signatures, minhash_wide
from bela_spark.operators.pairs import candidate_pairs, cap_keys


def test_minhash_matches_pure_python(spark):
    """Per-seed min of md5(shingle#seed) — golden check vs hashlib."""
    shingles = ["a b c", "b c d", "c d e"]
    df = spark.createDataFrame([("r1", shingles)], ["rid", "shingles"])
    got = {
        r["seed"]: r["mh"]
        for r in minhash_signatures(df, num_hashes=4).collect()
    }
    for seed in range(4):
        expect = min(hashlib.md5(f"{s}#{seed}".encode()).hexdigest() for s in shingles)
        assert got[seed] == expect


def test_identical_docs_share_all_bands(spark):
    sh = ["x y z", "y z w"]
    df = spark.createDataFrame([("r1", sh), ("r2", sh), ("r3", ["q q q"])], ["rid", "shingles"])
    wide = minhash_wide(df, num_hashes=8)
    bk = band_keys(wide, num_hashes=8, band_size=4)
    k1 = {(r["band"], r["band_key"]) for r in bk.filter("rid='r1'").collect()}
    k2 = {(r["band"], r["band_key"]) for r in bk.filter("rid='r2'").collect()}
    k3 = {(r["band"], r["band_key"]) for r in bk.filter("rid='r3'").collect()}
    assert k1 == k2
    assert not (k1 & k3)


def _pairs_set(df):
    return {(r["id1"], r["id2"]) for r in df.collect()}


def test_salted_join_equals_plain_join(spark):
    """The S^2 salt grid must produce exactly the plain self-join pair set."""
    keys = spark.createDataFrame(
        [(f"r{i}", "hot") for i in range(30)] + [(f"r{i}", "cold") for i in range(5)],
        ["rid", "key"],
    )
    plain = candidate_pairs(keys, LinkageConfig(hot_key_threshold=10_000))
    salted = candidate_pairs(keys, LinkageConfig(hot_key_threshold=10, salt_buckets=4))
    assert _pairs_set(plain) == _pairs_set(salted)
    # every pair appears exactly once per key
    assert salted.groupBy("id1", "id2", "key").count().filter("count > 1").count() == 0


def test_cap_keys_logs_drops(spark):
    keys = spark.createDataFrame([(f"r{i}", "k") for i in range(50)], ["rid", "key"])
    kept, drops = cap_keys(keys, LinkageConfig(max_ids_per_key=20))
    assert kept.count() == 20
    d = drops.collect()
    assert len(d) == 1 and d[0]["n_dropped"] == 30  # never silent

"""Fused block-and-score: salting equivalence, mega-key chaining, gating."""

import pytest
from pyspark.sql import functions as F

from bela_spark.config import LinkageConfig
from bela_spark.fixtures import synth_repo_files
from bela_spark.operators.blocking import blocking_keys
from bela_spark.operators.scoring import fused_block_and_score, jaccard_gate
from bela_spark.pipeline import prepare_records, run_linkage


def _kwf(base, cfg):
    keys = blocking_keys(base, cfg)
    return keys.join(
        base.select("rid", "norm", F.array_distinct("tokens").alias("tokens")), "rid"
    )


def _pairs(scored):
    return {(r["id1"], r["id2"], r["key"]) for r in scored.select("id1", "id2", "key").collect()}


@pytest.fixture(scope="module")
def base(spark):
    cfg = LinkageConfig()
    df = prepare_records(synth_repo_files(spark, 400, seed=42), cfg).cache()
    df.count()
    yield df
    df.unpersist()


def test_salted_equals_plain_fused(spark, base, monkeypatch):
    """Forcing keys through the salt grid must yield the identical pair set.
    SALT_MIN_KEY_MEMBERS is zeroed so the fixture's small keys actually take
    the grid (the r6 floor would otherwise route them through the plain
    join, which is the very equivalence this test exists to prove)."""
    import bela_spark.operators.scoring as scoring_mod

    monkeypatch.setattr(scoring_mod, "SALT_MIN_KEY_MEMBERS", 0)
    plain = LinkageConfig(hot_key_threshold=10**9)
    salted = LinkageConfig(hot_key_threshold=2, mega_key_threshold=10**9, salt_buckets=4)
    a, _ = fused_block_and_score(_kwf(base, plain), plain, persist=False)
    b, _ = fused_block_and_score(_kwf(base, salted), salted, persist=False)
    assert _pairs(a) == _pairs(b)
    # and with the default floor the same config pairs identically through
    # the plain join (the gate is execution-only)
    c, _ = fused_block_and_score(_kwf(base, salted), salted, persist=False)
    monkeypatch.undo()
    d, _ = fused_block_and_score(_kwf(base, salted), salted, persist=False)
    assert _pairs(c) == _pairs(d)


def test_chain_content_order_finds_groups(spark):
    """The SNM property: inside one mega key holding many interleaved small
    groups, content-ordered chaining puts group siblings window-adjacent, so
    EVERY member meets at least one sibling. (With random-id order, siblings
    of a 3-member group among 60 unrelated members sit > w apart with high
    probability and the group never meets itself — the failure mode the
    content sort exists to prevent.)"""
    rows = []
    for g in range(20):
        for v in range(3):
            rows.append((f"id{g:02d}_{v}", f"group {g:02d} body variant {v}", ["shared"]))
    df = spark.createDataFrame(rows, ["rid", "norm", "tokens"]).withColumn(
        "key", F.lit("mega")
    )
    cfg = LinkageConfig(hot_key_threshold=2, mega_key_threshold=4, chain_window=2)
    scored, klog = fused_block_and_score(df, cfg, persist=False)
    assert {r["strategy"] for r in klog.collect()} == {"chained"}
    intra = scored.filter(
        F.substring("id1", 1, 4) == F.substring("id2", 1, 4)
    ).select("id1", "id2").collect()
    met = {r["id1"] for r in intra} | {r["id2"] for r in intra}
    assert len(met) == 60, f"only {len(met)}/60 members met a sibling"
    # and the emission stayed linear: 60 members x window 2, not C(60,2)
    assert scored.count() <= 60 * cfg.chain_window


def test_chain_window_zero_rejected(spark, base):
    """w=0 would make F.sequence count DOWN and emit self-pairs — refuse."""
    cfg = LinkageConfig(hot_key_threshold=4, mega_key_threshold=8, chain_window=0)
    with pytest.raises(ValueError, match="chain_window"):
        fused_block_and_score(_kwf(base, cfg), cfg, persist=False)


def test_chaining_kicks_in_and_is_linear(spark, base):
    cfg = LinkageConfig(hot_key_threshold=4, mega_key_threshold=8, chain_window=2)
    scored, klog = fused_block_and_score(_kwf(base, cfg), cfg, persist=False)
    strategies = {r["strategy"] for r in klog.collect()}
    assert "chained" in strategies
    # chained key contributes at most n*w pairs, not C(n,2)
    chained_keys = [r["key"] for r in klog.filter("strategy = 'chained'").collect()]
    per_key = (
        scored.filter(F.col("key").isin(chained_keys))
        .groupBy("key")
        .agg(F.count("*").alias("n_pairs"))
        .collect()
    )
    sizes = {r["key"]: r["n_ids"] for r in klog.collect()}
    for r in per_key:
        n = sizes[r["key"]]
        assert r["n_pairs"] <= n * cfg.chain_window
        assert r["n_pairs"] >= n - 1  # the chain is connected


def test_mega_group_still_one_cluster(spark):
    """A duplicate group far above the mega threshold must still resolve to a
    single cluster through chain edges + transitive CC."""
    cfg = LinkageConfig(hot_key_threshold=4, mega_key_threshold=8, chain_window=2)
    rows = []
    for i in range(40):
        # near-identical contents: shared body, one varying token
        rows.append(
            (f"org/r{i}", "src/a/same.py", f"c{i:04d}", "py",
             f"def shared_fn(a, b):\n    return a + b * 7\n# tag {i % 3}\n")
        )
    df = spark.createDataFrame(rows, ["repo", "path", "commit", "lang", "content"])
    run = run_linkage(df, cfg, persist=False)
    n_clusters = run.clusters.select("cluster_id").distinct().count()
    assert n_clusters == 1, n_clusters


def test_gating_preserves_edges(spark, base):
    """Gated scoring must produce exactly the same accepted edge set as
    ungated scoring (the gates are exactness-preserving by construction)."""
    cfg = LinkageConfig()
    from bela_spark.operators.scoring import _score_exprs, accept_edges

    scored, _ = fused_block_and_score(_kwf(base, cfg), cfg, persist=False)
    gated_edges = {(r["id1"], r["id2"]) for r in accept_edges(scored, cfg).collect()}

    # ungated reference: recompute features with the gate forced open
    open_cfg = LinkageConfig(score_threshold=-1.0)  # gate: everything passes
    scored_open, _ = fused_block_and_score(_kwf(base, open_cfg), open_cfg, persist=False)
    ungated_edges = {
        (r["id1"], r["id2"])
        for r in scored_open.filter(F.col("score") >= cfg.score_threshold)
        .select("id1", "id2")
        .distinct()
        .collect()
    }
    assert gated_edges == ungated_edges


def test_jaccard_gate_formula():
    cfg = LinkageConfig(w_lev=0.35, w_jac=0.35, w_cos=0.30, score_threshold=0.60)
    g = jaccard_gate(cfg, use_cosine=False)
    # (0.6*0.7 - 0.35) / 0.35 = 0.2
    assert g == pytest.approx(0.2)
    # with cosine active the gate goes negative -> never gated
    assert jaccard_gate(cfg, use_cosine=True) < 0

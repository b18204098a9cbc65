"""End-to-end linkage on the labeled fixture: the north-rule acceptance test.

Pairwise F1 >= 0.99 on labeled candidate pairs per blocking key
(BASELINE.json metric), sha256 row invariant, and scoring-path equivalence.
"""

import pytest
from pyspark.sql import functions as F

from bela_spark.config import LinkageConfig
from bela_spark.fixtures import synth_repo_files
from bela_spark.pipeline import (
    cluster_stats,
    label_pairs,
    pairwise_f1,
    run_linkage,
)

N_ROWS = 800


@pytest.fixture(scope="module")
def fixture_df(spark):
    df = synth_repo_files(spark, N_ROWS, seed=42, with_truth=True).cache()
    df.count()
    yield df
    df.unpersist()


@pytest.fixture(scope="module")
def run(spark, fixture_df):
    return run_linkage(fixture_df.drop("group_id"), LinkageConfig())


def _truth(fixture_df):
    return fixture_df.selectExpr(
        "sha2(concat_ws('||', repo, path, commit), 256) as rid", "group_id"
    )


def test_pairwise_f1_target(spark, fixture_df, run):
    cfg = LinkageConfig()
    labeled = label_pairs(run.pairs, _truth(fixture_df))
    row = pairwise_f1(labeled, run.scored, cfg.score_threshold).collect()[0]
    assert row["f1"] >= 0.99, row.asDict()
    assert row["tp"] > 100  # non-degenerate


def test_pairwise_f1_per_blocking_key(spark, fixture_df, run):
    cfg = LinkageConfig()
    labeled = label_pairs(run.pairs, _truth(fixture_df))
    per_key = pairwise_f1(labeled, run.scored, cfg.score_threshold, per_key=True)
    # keys with real signal (>=3 labeled-positive pairs) must each hit 0.99
    bad = per_key.filter((F.col("tp") + F.col("fn") >= 3) & (F.col("f1") < 0.99))
    assert bad.count() == 0, [r.asDict() for r in bad.limit(5).collect()]


def _fragmented_groups(run_x, truth) -> set:
    j = run_x.clusters.select("rid", "cluster_id").join(truth, "rid")
    frag = (
        j.filter(F.col("group_id").startswith("g"))
        .groupBy("group_id")
        .agg(F.countDistinct("cluster_id").alias("n_clusters"))
        .filter("n_clusters > 1")
    )
    return {r["group_id"] for r in frag.collect()}


def test_chained_regime_loses_no_clusters(spark, fixture_df, run):
    """Force every hot fixture key through sorted-neighborhood chaining (the
    linear-emission tier a 100 TB run lives in — at 4M synth rows the hot
    band keys cross this boundary, BASELINE.md round 3): chaining emits ~w
    pairs per member instead of C(n,2), and the resulting clusters must be
    no worse than the full-pairing default. (Some fixture groups fragment
    under EITHER config — the 4th mutation shares no band with its siblings
    at 800 rows; that is blocking recall, the conditional-on-blocking F1 of
    BASELINE.json, and is identical across regimes by this test.)"""
    cfg = LinkageConfig(hot_key_threshold=8, mega_key_threshold=16)
    run_c = run_linkage(fixture_df.drop("group_id"), cfg)
    # the chained tier must actually engage, or this test proves nothing
    strategies = {r["strategy"] for r in run_c.key_drops.collect()}
    assert "chained" in strategies, strategies
    truth = _truth(fixture_df)
    # subset, not equality: chaining merging MORE groups than full pairing
    # (window-adjacent similars, the improvement BASELINE.md measured at
    # 600k) is allowed — only NEW fragmentation is a regression
    assert _fragmented_groups(run_c, truth) <= _fragmented_groups(run, truth)


def test_exact_duplicates_cluster_together(spark, fixture_df, run):
    """Whitespace variants normalize identically -> must share a cluster."""
    same_norm = (
        run.clusters.groupBy("norm")
        .agg(F.countDistinct("cluster_id").alias("nc"), F.count("*").alias("n"))
        .filter("n > 1")
    )
    assert same_norm.filter("nc > 1").count() == 0


def test_cluster_stats_shape(run):
    rows = cluster_stats(run.clusters, top_n=5).collect()
    assert len(rows) == 5
    assert rows[0]["n_files"] >= rows[-1]["n_files"]
    assert set(rows[0].asDict()) == {
        "cluster_id",
        "n_files",
        "n_repos",
        "n_langs",
        "example_path",
    }


def test_no_key_drops_at_fixture_scale(run):
    assert run.key_drops.count() == 0


def test_collapse_exact_same_partitions(spark, fixture_df):
    """collapse_exact must not change the clustering, only its cost: compare
    cluster *partitions* (labels may differ — collapsed ids are rep-mins)."""
    cfg = LinkageConfig()
    small = fixture_df.limit(400).drop("group_id")
    a = run_linkage(small, cfg, persist=False)
    b = run_linkage(small, cfg, persist=False, collapse_exact=True)

    def partitions(clusters):
        rows = clusters.select("rid", "cluster_id").collect()
        by_cluster = {}
        for r in rows:
            by_cluster.setdefault(r["cluster_id"], set()).add(r["rid"])
        return {frozenset(v) for v in by_cluster.values()}

    assert partitions(a.clusters) == partitions(b.clusters)


def test_batched_scoring_matches_sql_path(spark, fixture_df):
    """mapInPandas (numpy) path and built-in path agree on lev/jac and rank
    the same pairs above threshold."""
    cfg = LinkageConfig()
    small = fixture_df.limit(200).drop("group_id")
    a = run_linkage(small, cfg, persist=False)
    b = run_linkage(small, cfg, batched_scoring=True, persist=False)
    sa = {(r["id1"], r["id2"]): (r["f_lev"], r["f_jac"]) for r in a.scored.collect()}
    sb = {(r["id1"], r["id2"]): (r["f_lev"], r["f_jac"]) for r in b.scored.collect()}
    assert set(sa) == set(sb)
    for k, (lev, jac) in sa.items():
        assert jac == pytest.approx(sb[k][1])
        # f_lev comparable only above both paths' jaccard gates (the fused
        # no-cosine path gates lev off exactly where score can't clear the
        # threshold; the batched cosine path gates at a lower level)
        if jac >= 0.25:
            assert lev == pytest.approx(sb[k][0])


def test_null_content_rows_keep_their_cluster_rows(spark):
    """Review regression gate: a null-content row must keep its cluster_id
    through BOTH collapse modes — the exact-collapse representative and the
    exact-remap keeper are equi-joins on a content hash, and an un-coalesced
    null key would silently drop the row (a window kept a null partition)."""
    cols = ["repo", "path", "commit", "lang", "content"]
    rows = [
        ("r", "a.py", "c1", "py", "def f(): return 1"),
        ("r", "b.py", "c1", "py", "def f(): return 1"),
        ("r", "c.py", "c1", "py", None),
        ("r", "d.py", "c1", "py", None),
    ]
    df = spark.createDataFrame(rows, cols)
    for collapse in (False, True):
        run = run_linkage(df, LinkageConfig(), persist=False, collapse_exact=collapse)
        assert run.clusters.count() == 4, f"collapse_exact={collapse} dropped rows"

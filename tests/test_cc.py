"""Connected components: correctness, convergence, checkpoint/resume (C1-C6)."""

import glob
import json
import os

from bela_spark.operators.cc import connected_components, latest_round


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, ["id1", "id2"])


def _comp_map(result):
    return {r["rid"]: r["component"] for r in result.assignments.collect()}


def test_simple_components(spark):
    e = _edges(spark, [("a", "b"), ("b", "c"), ("x", "y")])
    res = connected_components(e)
    m = _comp_map(res)
    assert m == {"a": "a", "b": "a", "c": "a", "x": "x", "y": "x"}
    assert res.converged


def test_long_chain(spark):
    """A path graph stresses the iterative star rounds (diameter > 1)."""
    ids = [f"n{i:02d}" for i in range(12)]
    e = _edges(spark, list(zip(ids, ids[1:])))
    res = connected_components(e)
    m = _comp_map(res)
    assert set(m.values()) == {"n00"}
    assert len(m) == 12 and res.converged


def test_two_cliques_bridge(spark):
    c1 = [("a1", "a2"), ("a2", "a3"), ("a1", "a3")]
    c2 = [("b1", "b2"), ("b2", "b3")]
    res = connected_components(_edges(spark, c1 + c2 + [("a3", "b1")]))
    m = _comp_map(res)
    assert set(m.values()) == {"a1"}


def test_checkpoint_and_resume(spark, tmp_path):
    """Kill-after-round-k resume must yield identical assignments (north rule)."""
    ckpt = str(tmp_path / "cc")
    ids = [f"n{i:02d}" for i in range(10)]
    e = _edges(spark, list(zip(ids, ids[1:])))

    full = connected_components(e, checkpoint_dir=ckpt)
    want = _comp_map(full)
    rounds = latest_round(ckpt)
    assert rounds is not None and rounds >= 1

    # manifests carry per-partition lineage
    with open(os.path.join(ckpt, "manifest_round_0.json")) as f:
        man = json.load(f)
    assert {"round", "n_edges", "edge_set_hash", "partitions"} <= set(man)

    # simulate a crash: drop the newest rounds, keep round 0
    for p in glob.glob(os.path.join(ckpt, "round=*")):
        if int(p.split("=")[1]) > 0:
            import shutil

            shutil.rmtree(p)
    for p in glob.glob(os.path.join(ckpt, "manifest_round_*.json")):
        if int(p.rsplit("_", 1)[1].split(".")[0]) > 0:
            os.remove(p)
    assert latest_round(ckpt) == 0

    # resume from the surviving checkpoint; edges arg is ignored past round 0
    resumed = connected_components(e, checkpoint_dir=ckpt, resume=True)
    assert _comp_map(resumed) == want


def test_resume_rejects_different_input(spark, tmp_path):
    """Resuming against a DIFFERENT input edge set must not return the stale
    checkpoint's components (manifest input_sig binding, ADVICE r1)."""
    ckpt = str(tmp_path / "cc2")
    e1 = _edges(spark, [("a", "b"), ("c", "d")])
    first = connected_components(e1, checkpoint_dir=ckpt)
    assert _comp_map(first) == {"a": "a", "b": "a", "c": "c", "d": "c"}

    with open(os.path.join(ckpt, "manifest_round_0.json")) as f:
        assert "input_sig" in json.load(f)

    # new input joins the two components; a stale resume would miss the edge
    e2 = _edges(spark, [("a", "b"), ("c", "d"), ("b", "c")])
    second = connected_components(e2, checkpoint_dir=ckpt, resume=True)
    assert set(_comp_map(second).values()) == {"a"}


def test_empty_edges(spark):
    e = spark.createDataFrame([], "id1 string, id2 string")
    res = connected_components(e)
    assert res.assignments.count() == 0

"""Diagnostic: the EXACT bench.py linkage pass (run_linkage + the three
actions bench times), instrumented per action with wall time and — via the
REST API — executorRunTime/executorCpuTime per job, so wall-clock noise from
the shared host can be separated from real work (guide §1.1/§7.1).

Runs BELA_DIAG_PASSES passes (default 2) with clearCache between, exactly
like bench.py's timed() loop, so the pass-2 degradation seen in driver runs
is reproducible and attributable.

Usage: python scripts/diag_linkage_pass.py  (env: SPARK_GRAFT_* as bench.py)
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _jobs(port: int) -> list[dict]:
    base = f"http://localhost:{port}/api/v1/applications"
    apps = json.load(urllib.request.urlopen(base, timeout=10))
    app_id = apps[0]["id"]
    return json.load(urllib.request.urlopen(f"{base}/{app_id}/jobs", timeout=10))


def _stage_totals(port: int) -> dict[int, dict]:
    base = f"http://localhost:{port}/api/v1/applications"
    apps = json.load(urllib.request.urlopen(base, timeout=10))
    app_id = apps[0]["id"]
    stages = json.load(
        urllib.request.urlopen(f"{base}/{app_id}/stages?status=complete", timeout=10)
    )
    return {
        s["stageId"]: {
            "run_s": s.get("executorRunTime", 0) / 1e3,
            "cpu_s": s.get("executorCpuTime", 0) / 1e9,
            "name": s.get("name", "")[:60],
        }
        for s in stages
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])
    n_linkage = int(os.environ.get("BELA_BENCH_ROWS", str(int(6_000_000 * sf))))
    passes = int(os.environ.get("BELA_DIAG_PASSES", "2"))

    from pyspark.sql import functions as F

    from bela_spark.config import LinkageConfig
    from bela_spark.fixtures import synth_repo_files
    from bela_spark.pipeline import run_linkage
    from bela_spark.session import get_spark

    spark = get_spark(
        app_name="bela-diag-linkage",
        master=f"local[{cpus}]",
        shuffle_partitions=max(cpus * 2, 32),
        extra_conf={"spark.ui.enabled": "true", "spark.ui.port": "4049"},
    )
    sc = spark.sparkContext
    df = synth_repo_files(spark, n_linkage, seed=42)

    for p in range(1, passes + 1):
        spark.catalog.clearCache()
        t_pass = time.time()
        run = run_linkage(df, LinkageConfig.at_scale(), collapse_exact=True)

        def act(name, fn):
            sc.setJobDescription(f"pass{p}:{name}")
            t0 = time.time()
            out = fn()
            dt = time.time() - t0
            sc.setJobDescription(None)
            print(json.dumps({"pass": p, "action": name, "wall_s": round(dt, 2)}), flush=True)
            return out

        n_pairs = act("scored_count", lambda: run.scored.count())
        n_clusters = act(
            "clusters_distinct", lambda: run.clusters.select("cluster_id").distinct().count()
        )
        strat = act(
            "key_drops",
            lambda: run.key_drops.groupBy("strategy").agg(F.count("*").alias("n")).collect(),
        )
        print(
            json.dumps(
                {
                    "pass": p,
                    "pass_wall_s": round(time.time() - t_pass, 2),
                    "n_pairs": n_pairs,
                    "n_clusters": n_clusters,
                    "strategies": {r["strategy"]: r["n"] for r in strat},
                }
            ),
            flush=True,
        )

    # per-job attribution using job descriptions
    totals: dict[str, dict[str, float]] = {}
    stage_info = _stage_totals(4049)
    for j in _jobs(4049):
        desc = j.get("description") or j.get("name", "?")
        key = desc.split(":", 2)
        key = ":".join(key[:2]) if len(key) >= 2 and key[0].startswith("pass") else "untagged"
        t = totals.setdefault(key, {"jobs": 0, "run_s": 0.0, "cpu_s": 0.0})
        t["jobs"] += 1
        for sid in j.get("stageIds", []):
            si = stage_info.get(sid)
            if si:
                t["run_s"] += si["run_s"]
                t["cpu_s"] += si["cpu_s"]
    for k in sorted(totals):
        t = totals[k]
        print(
            json.dumps(
                {"group": k, "jobs": t["jobs"], "run_s": round(t["run_s"], 1), "cpu_s": round(t["cpu_s"], 1)}
            )
        )
    # top stages by run time
    top = sorted(stage_info.items(), key=lambda kv: -kv[1]["run_s"])[:20]
    for sid, si in top:
        print(json.dumps({"stage": sid, "run_s": round(si["run_s"], 1), "cpu_s": round(si["cpu_s"], 1), "name": si["name"]}))
    spark.stop()


if __name__ == "__main__":
    main()

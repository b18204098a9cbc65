"""Diagnostic #2: per-stage attribution of the pair stage's wall time.

Same timed segment as bench_scaling.py, one arm, UI enabled; after the timed
pass the Spark REST API's stage metrics are aggregated into three numbers
that discriminate the non-scaling component seen in the 4 -> 16 arms:

  - cpu_sec:   sum of executorCpuTime — actual on-core compute; if this is
               flat across arms, the kernel itself scales;
  - run_sec:   sum of executorRunTime — task occupancy; run >> cpu means
               tasks waiting (shuffle fetch, disk, memory stalls);
  - wall*thr:  wall_sec * threads — capacity; capacity - run = idle cores
               (scheduling gaps, stage barriers, straggler tails).

Env: BELA_DIAG_CPUS (default 16), BELA_DIAG_ROWS (default 2000000),
     BELA_SCALE_CONFIG ("at_scale" | "default").

Usage:  python scripts/diag_stages.py
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _stages(port: int) -> list[dict]:
    base = f"http://localhost:{port}/api/v1/applications"
    apps = json.load(urllib.request.urlopen(base, timeout=10))
    app_id = apps[0]["id"]
    return json.load(
        urllib.request.urlopen(f"{base}/{app_id}/stages?status=complete", timeout=10)
    )


def main() -> None:
    cpus = int(os.environ.get("BELA_DIAG_CPUS", "16"))
    rows = int(os.environ.get("BELA_DIAG_ROWS", "2000000"))
    which = os.environ.get("BELA_SCALE_CONFIG", "at_scale")

    from bela_spark.config import LinkageConfig
    from bela_spark.fixtures import synth_repo_files
    from bela_spark.operators.blocking import blocking_keys
    from bela_spark.operators.scoring import fused_block_and_score
    from bela_spark.pipeline import pair_stage_features, prepare_records
    from bela_spark.session import get_spark

    from pyspark.sql import Window as W, functions as F

    cfg = LinkageConfig.at_scale() if which == "at_scale" else LinkageConfig()
    os.environ.setdefault("BELA_SPARK_DRIVER_MEM", "48g")
    spark = get_spark(
        app_name=f"bela-diagstage-{cpus}",
        master=f"local[{cpus}]",
        shuffle_partitions=2 * cpus,
        extra_conf={"spark.ui.enabled": "true"},
    )
    port = int(spark.sparkContext.uiWebUrl.rsplit(":", 1)[1])

    def block_and_score(base_df, persist):
        keys = blocking_keys(base_df, cfg)
        kwf = keys.join(pair_stage_features(base_df, cfg), "rid")
        return fused_block_and_score(kwf, cfg, persist=persist)

    warm = prepare_records(synth_repo_files(spark, 2000, seed=7), cfg)
    block_and_score(warm, persist=False)[0].count()

    records = prepare_records(synth_repo_files(spark, rows, seed=42), cfg)
    records = records.withColumn(
        "rep", F.min("rid").over(W.partitionBy(F.md5("norm")))
    ).persist()
    records.count()
    base = records.filter(F.col("rid") == F.col("rep"))

    def build_agg():
        scored_by_key, _d = block_and_score(base, persist=True)
        return scored_by_key.agg(
            F.count("*").alias("n"), F.sum("score").alias("s")
        )

    build_agg().collect()  # warm pass (codegen + key-table cache)

    before = {s["stageId"] for s in _stages(port)}
    agg = build_agg()
    t0 = time.time()
    agg.collect()
    wall = time.time() - t0

    stages = [s for s in _stages(port) if s["stageId"] not in before]
    per_stage = sorted(
        (
            {
                "stage": s["stageId"],
                "name": s["name"].split("\n")[0][:48],
                "tasks": s["numCompleteTasks"],
                "run_sec": round(s["executorRunTime"] / 1e3, 1),
                "cpu_sec": round(s["executorCpuTime"] / 1e9, 1),
                "shuf_read_mb": round(s["shuffleReadBytes"] / 1e6, 1),
                "shuf_write_mb": round(s["shuffleWriteBytes"] / 1e6, 1),
                "input_mb": round(s.get("inputBytes", 0) / 1e6, 1),
            }
            for s in stages
        ),
        key=lambda d: -d["run_sec"],
    )
    out = {
        "cpus": cpus,
        "config": which,
        "wall_sec": round(wall, 2),
        "capacity_sec": round(wall * cpus, 1),
        "run_sec": round(sum(d["run_sec"] for d in per_stage), 1),
        "cpu_sec": round(sum(d["cpu_sec"] for d in per_stage), 1),
        "n_stages": len(per_stage),
        "stages": per_stage[:12],
    }
    print(json.dumps(out, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()

"""Incremental ingest: Structured Streaming over new repo_files rows.

The reference is strictly batch (SURVEY.md "Streaming-only operators": no
timestamps anywhere in its data model), so this surface is the idiomatic
Spark extension, not a ported operator: new records arrive as files in a
directory (stand-in for a Kafka/Iceberg CDC feed), and each micro-batch is
linked against the ACCUMULATED record state via foreachBatch:

  micro-batch -> normalize/sha -> blocking keys
             -> pairs vs (batch ∪ existing-state) keys
             -> score -> accepted edges appended to the edge log
             -> connected components re-run over the full edge log
             -> cluster table overwritten (checkpointed parquet)

No watermark: content keys are not temporal. Re-running CC per batch is
correct-by-construction (CC is idempotent over the edge log); an incremental
CC (only affected components) is a pure optimization left for the batch
checkpoints to amortize.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from bela_spark.config import LinkageConfig
from bela_spark.operators.blocking import blocking_keys
from bela_spark.operators.cc import connected_components
from bela_spark.operators.scoring import fused_block_and_score
from bela_spark.pipeline import prepare_records

REPO_FILES_DDL = "repo string, path string, commit string, lang string, content string"


class IncrementalLinkage:
    """foreachBatch driver state: parquet-backed record/edge/cluster tables."""

    def __init__(self, state_dir: str, cfg: LinkageConfig | None = None):
        self.state_dir = state_dir
        self.cfg = cfg or LinkageConfig()
        self.records_dir = os.path.join(state_dir, "records")
        self.edges_dir = os.path.join(state_dir, "edges")
        self.clusters_dir = os.path.join(state_dir, "clusters")

    def _existing(self, spark: SparkSession, path: str, schema: str) -> DataFrame:
        if os.path.isdir(path) and any(
            f.endswith(".parquet") for f in os.listdir(path)
        ):
            return spark.read.parquet(path)
        return spark.createDataFrame([], schema)

    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        cfg = self.cfg

        new_records = prepare_records(batch_df, cfg).select(
            "rid", "repo", "path", "commit", "lang", "content_sha", "norm", "tokens"
        )
        rec_schema = (
            "rid string, repo string, path string, commit string, lang string, "
            "content_sha string, norm string, tokens array<string>"
        )
        existing = self._existing(spark, self.records_dir, rec_schema)
        # state ∪ batch with an EXPLICIT batch-first preference: a replayed
        # batch carrying changed content for an existing rid must
        # deterministically win over the stored row (dropDuplicates alone
        # keeps an arbitrary one). localCheckpoint decouples the plan from
        # the state files so the overwrite of records_dir below can't
        # invalidate lazy readers.
        from pyspark.sql import Window as W

        prio = W.partitionBy("rid").orderBy("_prio")
        all_records = (
            new_records.withColumn("_prio", F.lit(0))
            .unionByName(existing.withColumn("_prio", F.lit(1)))
            .withColumn("_rn", F.row_number().over(prio))
            .filter(F.col("_rn") == 1)
            .drop("_prio", "_rn")
            .localCheckpoint()
        )

        keys = blocking_keys(all_records, cfg)
        new_ids = new_records.select("rid").distinct()
        # bound work to keys touched by this batch: only keys containing a new
        # record can produce new pairs
        touched = keys.join(new_ids, "rid", "left_semi").select("key").distinct()
        keys_touched = keys.join(F.broadcast(touched), "key")
        kwf = keys_touched.join(
            all_records.select(
                "rid", "norm", F.array_distinct("tokens").alias("tokens")
            ),
            "rid",
        )
        scored_by_key, _ = fused_block_and_score(kwf, cfg, persist=False)
        new_edges = (
            scored_by_key.filter(F.col("score") >= cfg.score_threshold)
            .select("id1", "id2")
            .distinct()
        )

        old_edges = self._existing(spark, self.edges_dir, "id1 string, id2 string")
        all_edges = old_edges.unionByName(new_edges).distinct().localCheckpoint()

        cc = connected_components(all_edges, max_rounds=cfg.max_cc_rounds)
        clusters = (
            all_records.select("rid")
            .join(cc.assignments, "rid", "left")
            .withColumn("cluster_id", F.coalesce("component", "rid"))
            .drop("component")
        )

        # persist state (all inputs are checkpointed, so overwrites are safe)
        all_records.write.mode("overwrite").parquet(self.records_dir)
        all_edges.write.mode("overwrite").parquet(self.edges_dir)
        clusters.localCheckpoint().write.mode("overwrite").parquet(self.clusters_dir)

    def start(self, spark: SparkSession, input_dir: str, checkpoint_dir: str):
        """readStream on a file source -> foreachBatch(process_batch)."""
        stream = (
            spark.readStream.schema(REPO_FILES_DDL)
            .option("maxFilesPerTrigger", 4)
            .parquet(input_dir)
        )
        return (
            stream.writeStream.foreachBatch(self.process_batch)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )

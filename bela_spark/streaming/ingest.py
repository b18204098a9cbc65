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

No watermark: content keys are not temporal. Clustering is INCREMENTAL: CC
re-runs only over components touched by the batch's new edges (stored edges
are intra-component, so the touched subgraph is closed under old edges whose
id1 lies in a touched component); untouched components carry their stored
assignment. cluster_id = min member rid is a per-component property, so the
incremental answer equals a full re-run over the whole edge log — pinned by
tests/test_streaming.py.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from bela_spark.config import LinkageConfig
from bela_spark.operators.blocking import blocking_keys
from bela_spark.operators.cc import connected_components
from bela_spark.operators.scoring import fused_block_and_score
from bela_spark.pipeline import prepare_records


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

        # full tie-break: the same rid at the same priority (a replayed batch
        # file carrying duplicate rows for one rid with differing content)
        # must resolve deterministically — content_sha is the only column
        # that can differ within a rid (rid = sha256(repo||path||commit))
        prio = W.partitionBy("rid").orderBy("_prio", "content_sha")
        all_records = (
            new_records.withColumn("_prio", F.lit(0))
            .unionByName(existing.withColumn("_prio", F.lit(1)))
            .withColumn("_rn", F.row_number().over(prio))
            .filter(F.col("_rn") == 1)
            .drop("_prio", "_rn")
            .localCheckpoint()
        )

        # rids whose content CHANGED in this batch: every stored edge incident
        # to them was derived from the old content and is now invalid — a
        # cluster must never outlive the evidence it was built on
        changed = (
            new_records.select("rid", "content_sha")
            .join(
                existing.select("rid", F.col("content_sha").alias("_old_sha")), "rid"
            )
            .filter(F.col("content_sha") != F.col("_old_sha"))
            .select("rid")
            .localCheckpoint()
        )

        # dedup=False: (rid, key) unique by construction (see blocking_keys)
        # — saves one distinct exchange per micro-batch
        keys = blocking_keys(all_records, cfg, dedup=False)
        new_ids = new_records.select("rid").distinct()
        # bound work to keys touched by this batch: only keys containing a new
        # record can produce new pairs
        touched = keys.join(new_ids, "rid", "left_semi").select("key").distinct()
        keys_touched = keys.join(F.broadcast(touched), "key")
        # slim the pair-stage payload before it is multiplied by the key
        # fan-out (guide §2.3): the scorer only ever reads the first
        # lev_max_chars of norm (substring is idempotent, so scores are
        # bit-identical), and the full norm already lives in the state table
        kwf = keys_touched.join(
            all_records.select(
                "rid",
                F.substring("norm", 1, cfg.lev_max_chars).alias("norm"),
                F.array_distinct("tokens").alias("tokens"),
            ),
            "rid",
        )
        scored_by_key, _ = fused_block_and_score(kwf, cfg, persist=False)
        # checkpoint: new_edges feeds the edge log, the incremental-CC touched
        # set AND the cluster table — without this the fused scoring DAG (the
        # batch's most expensive stage) re-executes per consumer
        new_edges = (
            scored_by_key.filter(F.col("score") >= cfg.score_threshold)
            .select("id1", "id2")
            .distinct()
            .localCheckpoint()
        )

        old_edges_raw = self._existing(spark, self.edges_dir, "id1 string, id2 string")
        # drop stored edges incident to content-changed rids (stale evidence)
        old_edges = old_edges_raw.join(
            changed.withColumnRenamed("rid", "id1"), "id1", "left_anti"
        ).join(changed.withColumnRenamed("rid", "id2"), "id2", "left_anti")
        all_edges = old_edges.unionByName(new_edges).distinct().localCheckpoint()

        old_clusters = self._existing(
            spark, self.clusters_dir, "rid string, cluster_id string"
        )
        assignments = self._incremental_cc(
            new_edges, old_edges, old_clusters, dirty_rids=changed
        )
        clusters = (
            all_records.select("rid")
            .join(assignments, "rid", "left")
            .withColumn("cluster_id", F.coalesce("component", "rid"))
            .drop("component")
        )

        # persist state (all inputs are checkpointed, so overwrites are safe)
        all_records.write.mode("overwrite").parquet(self.records_dir)
        all_edges.write.mode("overwrite").parquet(self.edges_dir)
        clusters.localCheckpoint().write.mode("overwrite").parquet(self.clusters_dir)

    def _incremental_cc(
        self,
        new_edges: DataFrame,
        old_edges: DataFrame,
        old_clusters: DataFrame,
        dirty_rids: DataFrame | None = None,
    ) -> DataFrame:
        """(rid, component) for rids in any edge — incremental connected
        components: CC re-runs ONLY over components touched by this batch's
        edges; untouched components keep their stored assignment.

        Correct-by-construction equivalence with a full re-run (pinned by
        tests/test_streaming.py): stored edges are intra-component, so the
        touched subgraph = every old edge whose id1 falls in a touched
        component, plus the new edges. cluster_id = min member rid is a local
        property of each component, hence identical to the full-log answer.
        """
        cfg = self.cfg
        if old_clusters.isEmpty() or old_edges.isEmpty():
            cc = connected_components(
                old_edges.unionByName(new_edges).distinct(), max_rounds=cfg.max_cc_rounds
            )
            return cc.assignments

        ep = (
            new_edges.select(F.col("id1").alias("rid"))
            .unionByName(new_edges.select(F.col("id2").alias("rid")))
            .distinct()
        )
        if dirty_rids is not None:
            # content-changed rids lost edges: their old components may SPLIT,
            # so they are touched even with no new edge incident to them
            ep = ep.unionByName(dirty_rids.select("rid")).distinct()
        touched_cl = (
            old_clusters.join(ep, "rid", "left_semi").select("cluster_id").distinct()
        )
        touched_rids = old_clusters.join(
            F.broadcast(touched_cl), "cluster_id", "left_semi"
        ).select(F.col("rid").alias("id1"))
        sub_edges = (
            old_edges.join(touched_rids, "id1", "left_semi")
            .unionByName(new_edges)
            .distinct()
        )
        cc = connected_components(sub_edges, max_rounds=cfg.max_cc_rounds)
        # untouched components carry over verbatim (singleton self-rows are
        # harmless: component == rid is what coalesce(rid) would produce)
        untouched = old_clusters.join(
            F.broadcast(touched_cl), "cluster_id", "left_anti"
        ).select("rid", F.col("cluster_id").alias("component"))
        return cc.assignments.unionByName(untouched)

    def start(
        self,
        spark: SparkSession,
        input_dir: str,
        checkpoint_dir: str,
        fmt: str = "parquet",
        max_files_per_trigger: int = 4,
    ):
        """readStream on a file source -> foreachBatch(process_batch).

        The stream face comes from the shared source layer
        (sources.read_repo_files_stream), so the incremental loop reads the
        SAME validated, column-pruned contract schema as every batch entry
        point — including the CSV bytes-exact options when fmt='csv'.
        tests/test_streaming.py::test_stream_source_face_end_to_end drives
        this path with real file drops against the batch pipeline."""
        from bela_spark.sources import read_repo_files_stream

        stream = read_repo_files_stream(
            spark, input_dir, fmt=fmt, max_files_per_trigger=max_files_per_trigger
        )
        return (
            stream.writeStream.foreachBatch(self.process_batch)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )

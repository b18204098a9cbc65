"""Token entity catalogue (SURVEY.md S5/T11/S2, P1).

The reference's EntityCatalogue stores each entity's token ids as a fixed-
width h5 row with a length prefix — value[1 : value[0] + 1] slices the real
tokens back out (/root/reference/mblink/utils/utils.py:55-77). BLINK
truncates entity token sequences to max_entity_len with bos/eos handling
(/root/reference/mblink/transforms/blink_transform.py:277-289), and the
datamodule drops mentions whose entity is not in the catalogue
(/root/reference/mblink/datamodule/blink_datamodule.py:50-57,
bela/datamodule/joint_el_datamodule.py:117-125).

Spark-first: the catalogue is a DataFrame keyed by ent_id with a dense
ent_index, the length-prefixed row is a literal array column (prefix + ids +
zero padding) sliced back with element_at/slice, truncation is array algebra,
and membership is a broadcast LEFT SEMI join — each one whole-stage-codegen,
no UDF, DuckDB-replayable."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W, functions as F

from bela_spark.functions.subword import BOS_ID, EOS_ID, word_piece_ids_col

PAD_WIDTH = 16       # fixed row width (token slots) of the emulated h5 matrix
MAX_ENTITY_LEN = 8   # blink_transform max_entity_len analogue


def dense_index(
    df: DataFrame,
    order_col: str,
    index_col: str = "ent_index",
    num_partitions: int | None = None,
) -> DataFrame:
    """+ index_col: dense 0-based rank of `order_col` ascending (keys must be
    unique), computed WITHOUT a global-order window.

    `Window.orderBy(key)` with no partitionBy moves the whole table to ONE
    task — fine for a 5-row lang dimension, wrong as the S4 pattern for a
    catalogue of millions of entities. This is the two-phase scheme Spark's
    own RDD.zipWithIndex uses: range-partition by the key (global order
    across partitions), rank locally per partition, then offset each
    partition by the total count of earlier partitions. The count job
    collects <= numPartitions rows — the index itself never leaves the
    executors, and the result is invariant to where the range boundaries
    land."""
    spark = df.sparkSession
    n = num_partitions or spark.sparkContext.defaultParallelism
    # localCheckpoint (eager) pins ONE materialized range partitioning that
    # both the count job and the output read: RangePartitioner boundary
    # sampling is not guaranteed identical across separately-planned jobs, and
    # the local ranks are only valid against the exact partitioning the counts
    # were taken from. (RDD-level checkpoint is ContextCleaner-GC'd when the
    # frame goes out of scope — a plain .persist() here would leak a pinned
    # catalogue copy in the CacheManager per call.)
    part = (
        df.repartitionByRange(n, F.col(order_col))
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint()
    )
    w_local = W.partitionBy("_pid").orderBy(order_col)
    local = part.withColumn("_lrn", F.row_number().over(w_local).cast("bigint"))
    counts = {
        r["_pid"]: r["_n"]
        for r in part.groupBy("_pid").agg(F.count("*").alias("_n")).collect()
    }
    acc, offsets = 0, {}
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    if offsets:
        # offsets as bigint literals: int32 arithmetic would wrap past 2^31
        # rows — exactly the catalogue scale this helper exists for
        off_map = F.create_map(
            *[
                c
                for pid, o in offsets.items()
                for c in (F.lit(pid), F.lit(o).cast("bigint"))
            ]
        )
        off = F.element_at(off_map, F.col("_pid"))
    else:
        off = F.lit(0).cast("bigint")
    return local.withColumn(index_col, (off + F.col("_lrn") - 1).cast("bigint")).drop(
        "_pid", "_lrn"
    )


def entity_catalogue(
    docs: DataFrame, title_chars: int = 30, norm_col: str = "norm"
) -> DataFrame:
    """(ent_id, ent_index, title, n_docs): one entity per (lang, source) with
    a dense ent_index (S4-style row_number) and a deterministic title (the
    lexicographically-smallest normalized text prefix in the group)."""
    g = docs.groupBy("lang", "source").agg(
        F.count("*").alias("n_docs"),
        F.min(F.substring(F.col(norm_col), 1, title_chars)).alias("title"),
    )
    g = g.select(
        F.concat_ws("_", "lang", "source").alias("ent_id"), "title", "n_docs"
    )
    return dense_index(g, "ent_id", "ent_index")


def _title_token_ids(title: Column) -> Column:
    """Ordered hash-subword ids of a title: words -> word_piece_ids_col,
    flattened in (word, piece) order — the SAME kernel as the subword
    tokenizer, so catalogue tokens and text tokens share one id space."""
    words = F.filter(F.split(title, " "), lambda t: F.length(t) > 0)
    return F.flatten(F.transform(words, word_piece_ids_col))


def tokenized_catalogue(cat: DataFrame, pad_width: int = PAD_WIDTH) -> DataFrame:
    """+ (stored, n_tokens, tokens): the h5-row emulation — stored is the
    fixed-width, length-prefixed array [n, id1..idn, 0...]; tokens is the
    value[1 : value[0] + 1] slice read back from it (S5)."""
    ids = F.slice(_title_token_ids(F.col("title")), 1, pad_width)
    t = cat.withColumn("_ids", ids).withColumn("n_tokens", F.size("_ids"))
    stored = F.concat(
        F.array(F.col("n_tokens").cast("bigint")),
        F.col("_ids"),
        F.array_repeat(F.lit(0).cast("bigint"), pad_width - F.col("n_tokens")),
    )
    t = t.withColumn("stored", stored)
    # the read path: slice(stored, 2, stored[1]) == value[1:value[0]+1]
    return t.withColumn(
        "tokens", F.slice(F.col("stored"), 2, F.element_at(F.col("stored"), 1))
    ).drop("_ids")


def truncate_entity_tokens(
    cat_tokens: DataFrame, max_entity_len: int = MAX_ENTITY_LEN
) -> DataFrame:
    """T11 (_transform_entity, blink_transform.py:277-289): wrap with bos/eos,
    truncate to max_entity_len keeping eos last."""
    full = F.concat(
        F.array(F.lit(BOS_ID).cast("bigint")),
        F.col("tokens"),
        F.array(F.lit(EOS_ID).cast("bigint")),
    )
    t = cat_tokens.withColumn("_full", full)
    truncated = F.when(
        F.size("_full") > max_entity_len,
        F.concat(
            F.slice(F.col("_full"), 1, max_entity_len - 1),
            F.array(F.lit(EOS_ID).cast("bigint")),
        ),
    ).otherwise(F.col("_full"))
    return t.withColumn("entity_ids", truncated).drop("_full")


def membership_semi_join(
    mentions: DataFrame, catalogue: DataFrame, on: str = "ent_id"
) -> DataFrame:
    """S2/P1: keep only mentions whose entity exists in the catalogue —
    broadcast LEFT SEMI join (the catalogue is the small dimension side)."""
    return mentions.join(F.broadcast(catalogue.select(on)), on, "left_semi")

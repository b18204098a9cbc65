"""Text-analysis operators for a training-data pipeline: language-ID,
quality scoring, token counting, document fingerprinting.

All built-in expressions (whole-stage codegen), each with an exact SQL twin
for the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F

from bela_spark.functions.text import LANGID_STOPWORDS, normalized, tokens_of


def with_text_columns(docs: DataFrame, text_col: str = "text") -> DataFrame:
    return docs.withColumn("norm", normalized(text_col)).withColumn(
        "tokens", tokens_of("norm")
    )


def token_stats(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, n_chars, n_tokens, n_distinct_tokens, avg_token_len)."""
    d = with_text_columns(docs, text_col)
    return d.select(
        id_col,
        F.length(text_col).alias("n_chars"),
        F.size("tokens").alias("n_tokens"),
        F.size(F.array_distinct("tokens")).alias("n_distinct_tokens"),
        F.when(F.size("tokens") == 0, F.lit(0.0))
        .otherwise(F.length("norm") / F.size("tokens").cast("double"))
        .alias("avg_token_len"),
    )


def quality_scores(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Heuristic quality features: distinct-token ratio, stopword ratio,
    alnum-char ratio — the standard pretraining-corpus filters."""
    d = with_text_columns(docs, text_col)
    en = list(LANGID_STOPWORDS["en"])
    stop_hits = F.size(F.filter("tokens", lambda t: t.isin(en)))
    return d.select(
        id_col,
        F.when(F.size("tokens") == 0, F.lit(0.0))
        .otherwise(F.size(F.array_distinct("tokens")) / F.size("tokens").cast("double"))
        .alias("distinct_ratio"),
        F.when(F.size("tokens") == 0, F.lit(0.0))
        .otherwise(stop_hits / F.size("tokens").cast("double"))
        .alias("stopword_ratio"),
        F.when(F.length(text_col) == 0, F.lit(0.0))
        .otherwise(
            F.length(F.regexp_replace(F.lower(text_col), r"[^a-z0-9]", ""))
            / F.length(text_col).cast("double")
        )
        .alias("alnum_ratio"),
    )


def langid(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, pred_lang, votes): argmax of stopword-hit counts per language.

    Deterministic n-gram-free heuristic; ties broken by language code so the
    result is total-ordered (and oracle-reproducible).
    """
    d = with_text_columns(docs, text_col)
    vote_cols = []
    for lang, words in sorted(LANGID_STOPWORDS.items()):
        w = list(words)
        vote_cols.append(
            F.struct(
                F.size(F.filter("tokens", lambda t: t.isin(w))).alias("votes"),
                F.lit(lang).alias("lang"),
            )
        )
    # max of (votes, -lang) — greatest struct comparison is lexicographic, and
    # for equal votes we want the alphabetically-first language, so invert via
    # sort + element_at on a descending-votes / ascending-lang ordering
    arr = F.array(*vote_cols)
    best = F.element_at(
        F.array_sort(
            arr,
            lambda a, b: F.when(a["votes"] > b["votes"], -1)
            .when(a["votes"] < b["votes"], 1)
            .when(a["lang"] < b["lang"], -1)
            .when(a["lang"] > b["lang"], 1)
            .otherwise(0),
        ),
        1,
    )
    return d.select(
        id_col,
        best["lang"].alias("pred_lang"),
        best["votes"].alias("votes"),
    )


def fingerprints(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, fingerprint): md5 of the sorted distinct token set — an
    order-invariant document fingerprint (bag-of-words identity)."""
    d = with_text_columns(docs, text_col)
    return d.select(
        id_col,
        F.md5(F.concat_ws(" ", F.array_sort(F.array_distinct("tokens")))).alias("fingerprint"),
    )


# --- Winnowing (rolling k-gram fingerprints, the MOSS scheme) ---------------

WINNOW_K = 8        # chars per k-gram
WINNOW_W = 6        # guarantee window: every W consecutive k-grams yield >=1
POS_BITS = 2 ** 20  # position packing (norms are < 1M chars by construction)


def winnow_fingerprints(
    docs: DataFrame, k: int = WINNOW_K, w: int = WINNOW_W,
    id_col: str = "doc_id", text_col: str = "text",
) -> DataFrame:
    """(doc_id, pos, fp): winnowed k-gram fingerprints (Schleimer et al.,
    the MOSS algorithm): hash every char k-gram of the normalized text, then
    keep the minimum of each sliding window of w positions — any match of
    length >= w+k-1 between two documents shares at least one selected
    fingerprint (the winnowing guarantee).

    Spark-first shape: positions via sequence+explode, the per-window
    arg-min via ONE window function over a packed (hash, pos) bigint
    (min of h*2^20+pos = leftmost smallest hash — deterministic, and plain
    min() replays identically in any SQL engine), then distinct. All
    whole-stage codegen; one shuffle on doc_id."""
    d = docs.withColumn("norm", normalized(text_col))
    n = F.length("norm")
    g = d.filter(n >= k).select(
        id_col,
        "norm",
        F.explode(F.sequence(F.lit(1), n - k + 1)).alias("i"),
    )
    h = F.conv(F.substring(F.md5(F.substring("norm", F.col("i"), k)), 1, 10), 16, 10).cast(
        "bigint"
    )
    g = g.select(id_col, "i", (h * POS_BITS + F.col("i")).alias("packed"))
    win = (
        W.partitionBy(id_col)
        .orderBy("i")
        .rowsBetween(0, w - 1)
    )
    # every position starts a window (trailing windows under-fill — the
    # fingerprint set is a superset of strict winnowing, same guarantee);
    # the SQL twin replays the identical windows
    sel = g.withColumn("sel", F.min("packed").over(win))
    picked = sel.select(id_col, F.col("sel").alias("packed")).distinct()
    return picked.select(
        id_col,
        F.pmod("packed", F.lit(POS_BITS)).cast("int").alias("pos"),
        F.floor(F.col("packed") / POS_BITS).alias("fp"),
    )

"""Scalar text transforms (SURVEY.md section 2 T-family), all JVM-side built-ins.

The reference's `insert_spaces` FSM and word-boundary extraction
(bela/transforms/joint_el_transform.py:23-69, 527-547) exist to make raw text
tokenizable; the Spark-native equivalents are `lower` + `regexp_replace` +
`split`, which stay inside whole-stage codegen. Every expression here has an
exact ANSI-SQL twin used by the DuckDB oracle (__spark_entry__.py), so the
functions are deliberately restricted to portable semantics.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def normalized(col: Column | str) -> Column:
    """Lowercase, collapse all non-alphanumeric runs to single spaces, trim.

    Analogue of insert_spaces + lowercasing in the reference transform chain
    (bela/transforms/joint_el_transform.py:23-69).
    """
    c = F.lower(F.col(col) if isinstance(col, str) else col)
    return F.trim(F.regexp_replace(c, r"[^a-z0-9]+", " "))


def tokens_of(norm_col: Column | str) -> Column:
    """Whitespace tokens of an already-normalized string (T4 analogue)."""
    c = F.col(norm_col) if isinstance(norm_col, str) else norm_col
    return F.when(F.length(c) == 0, F.array().cast("array<string>")).otherwise(
        F.split(c, " ")
    )


def shingles_of(tokens_col: Column | str, k: int = 3) -> Column:
    """k-token shingles; short texts fall back to one whole-text shingle.

    Candidate-span generation in the reference enumerates (start, end) windows
    (bela/task/joint_el_task.py:244-290); shingling is the same sliding-window
    enumeration expressed with sequence+transform+slice — no UDF.
    """
    t = F.col(tokens_col) if isinstance(tokens_col, str) else tokens_col
    n = F.size(t)
    sliding = F.transform(
        F.sequence(F.lit(1), n - (k - 1)),
        lambda i: F.concat_ws(" ", F.slice(t, i, k)),
    )
    return F.when(n >= k, sliding).otherwise(F.array(F.concat_ws(" ", t)))


def record_id(*cols: Column | str) -> Column:
    """Stable content-addressed record id: sha256 of '||'-joined key columns.

    String ids keep min()-based connected components well-defined at any scale
    (no 64-bit collision risk at 10^12 rows).
    """
    cs = [F.col(c) if isinstance(c, str) else c for c in cols]
    return F.sha2(F.concat_ws("||", *cs), 256)


# Small multilingual stopword lists for the heuristic language-ID operator.
# Deterministic and oracle-expressible (plain IN-list membership counts).
LANGID_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "in", "is", "that", "with", "for", "on"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "für", "auf"),
    "es": ("el", "la", "de", "que", "y", "en", "un", "es", "por", "con"),
    "fr": ("le", "la", "et", "les", "des", "est", "un", "une", "dans", "pour"),
}

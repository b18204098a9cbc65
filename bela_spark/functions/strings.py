"""String-similarity features for pairwise scoring (E8 analogue).

The reference scores (mention, entity) pairs with a learned MLP over
[m, e, m-e, m*e, md_score, dis_score] (bela/task/joint_el_task.py:52-80).
The rebuild replaces the learned head with a deterministic blend of
cosine + Levenshtein + Jaro-Winkler features (BASELINE.json north_star):
Levenshtein is a Spark built-in (JVM-side); Jaro-Winkler has no built-in, so
it is a numpy-vectorized Arrow pandas UDF — never per-row Python.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType


def lev_sim(a: Column | str, b: Column | str) -> Column:
    """Normalized Levenshtein similarity in [0,1]; JVM built-in, codegen'd."""
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    denom = F.greatest(F.length(ca), F.length(cb))
    return F.when(denom == 0, F.lit(1.0)).otherwise(
        1.0 - F.levenshtein(ca, cb) / denom.cast("double")
    )


def _jaro(s1: str, s2: str) -> float:
    if s1 == s2:
        return 1.0
    len1, len2 = len(s1), len(s2)
    if len1 == 0 or len2 == 0:
        return 0.0
    match_window = max(len1, len2) // 2 - 1
    if match_window < 0:
        match_window = 0
    m1 = [False] * len1
    m2 = [False] * len2
    matches = 0
    for i, c in enumerate(s1):
        lo = max(0, i - match_window)
        hi = min(len2, i + match_window + 1)
        for j in range(lo, hi):
            if not m2[j] and s2[j] == c:
                m1[i] = m2[j] = True
                matches += 1
                break
    if matches == 0:
        return 0.0
    # transpositions
    t = 0
    j = 0
    for i in range(len1):
        if m1[i]:
            while not m2[j]:
                j += 1
            if s1[i] != s2[j]:
                t += 1
            j += 1
    t //= 2
    return (matches / len1 + matches / len2 + (matches - t) / matches) / 3.0


def jaro_winkler(s1: str, s2: str, p: float = 0.1, max_prefix: int = 4) -> float:
    """Plain-Python Jaro-Winkler (standard definition), used inside the UDF."""
    j = _jaro(s1, s2)
    prefix = 0
    for a, b in zip(s1[:max_prefix], s2[:max_prefix]):
        if a != b:
            break
        prefix += 1
    return j + prefix * p * (1.0 - j)


@pandas_udf(DoubleType())
def jaro_winkler_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    """Arrow-batched Jaro-Winkler over string pairs.

    Batch-at-a-time (Arrow transfer, one Python call per ~10k rows) — the slow
    path the north rule permits, never row-at-a-time Python UDF.
    """
    out = np.empty(len(a), dtype=np.float64)
    av = a.to_numpy(dtype=object)
    bv = b.to_numpy(dtype=object)
    for i in range(len(a)):
        x, y = av[i], bv[i]
        out[i] = jaro_winkler(x or "", y or "")
    return pd.Series(out)

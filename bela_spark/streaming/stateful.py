"""Custom stateful streaming operator: first-seen exact dedup over a document
stream (applyInPandasWithState).

A training-data ingest pipeline must drop re-crawled duplicates ACROSS
micro-batches, not just within one — that needs keyed state, not a stateless
dropDuplicates (whose unbounded state Spark manages opaquely). Here the state
is explicit and minimal: one flag per content hash, held in the Spark state
store (checkpointed, exactly-once across restarts). The reference has no
streaming surface (SURVEY.md: strictly batch), so like streaming/ingest.py
this is the idiomatic Spark extension, not a ported operator.

Keying by sha2(content) gives a uniformly distributed state key — no skew by
construction — and state size is O(distinct contents), the same as any
exact-dedup index. At 100 TB this would be fronted by a bloom/TTL policy;
locally the flag state is exact.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "content_sha string, rid string, n_in_batch int"
STATE_SCHEMA = "seen int"


def _first_seen_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Emit one row the FIRST time a content hash appears; afterwards the
    flag in the state store suppresses every replay. Keeper = min rid within
    the first batch (deterministic)."""
    best = None
    n = 0
    for pdf in pdfs:
        n += len(pdf)
        m = pdf["rid"].min()
        best = m if best is None or m < best else best
    if state.exists or best is None:
        return
    state.update((1,))
    yield pd.DataFrame(
        {"content_sha": [key[0]], "rid": [best], "n_in_batch": [n]}
    )


def streaming_exact_dedup(stream: DataFrame, content_col: str = "content") -> DataFrame:
    """stream(rid, content, ...) -> first-seen (content_sha, rid, n_in_batch).

    groupBy(sha) + applyInPandasWithState: each content hash meets its state
    exactly once per micro-batch; NoTimeout keeps flags forever (exact dedup).
    """
    keyed = stream.withColumn("content_sha", F.sha2(F.col(content_col), 256))
    return keyed.groupBy("content_sha").applyInPandasWithState(
        _first_seen_fn,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )

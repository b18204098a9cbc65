"""Offset arithmetic between character and token space (SURVEY.md T4-T9).

The reference remaps mention offsets across three coordinate systems (word,
sentencepiece-token, character) with truncation- and whitespace-aware
arithmetic (bela/transforms/joint_el_transform.py:104-187, 598-648, 650-689,
704-743; bela/evaluation/model_eval.py:31-62). The rebuild keeps two systems —
character and whitespace-token — and implements the same remaps as
numpy-vectorized pandas UDFs (np.searchsorted, the same binary-search shape as
the reference's lower_bound at joint_el_transform.py:72-101).

All functions are deterministic, total (out-of-range inputs clamp), and
covered by golden tests in tests/test_offsets.py that mirror the reference's
golden-tensor transform tests, including the multi-space edge case pinned at
bela/tests/test_transforms.py:104-128.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    StructField,
    StructType,
)

BOUNDARY_TYPE = ArrayType(
    StructType(
        [StructField("start", IntegerType()), StructField("end", IntegerType())]
    )
)


def token_boundaries_py(text: str) -> list[tuple[int, int]]:
    """[start, end) char spans of maximal non-space runs (T4 analogue:
    _calculate_alpha_num_boundaries, joint_el_transform.py:527-547, with
    whitespace as the sole delimiter — our normalize() already collapsed
    everything else)."""
    spans = []
    start = None
    for i, ch in enumerate(text):
        if ch.isspace():
            if start is not None:
                spans.append((start, i))
                start = None
        elif start is None:
            start = i
    if start is not None:
        spans.append((start, len(text)))
    return spans


def char_span_to_token_span_py(
    boundaries: list[tuple[int, int]], char_offset: int, char_length: int
) -> tuple[int, int]:
    """(first token index, token count) covering [char_offset, char_offset+len)
    — T6 analogue (_convert_mention_offsets, joint_el_transform.py:598-648).
    Tokens overlapping the span in any position are included; empty overlap
    -> (0, 0)."""
    if not boundaries or char_length <= 0:
        return (0, 0)
    starts = np.array([b[0] for b in boundaries])
    ends = np.array([b[1] for b in boundaries])
    lo = char_offset
    hi = char_offset + char_length
    # first token whose end > lo; last token whose start < hi
    first = int(np.searchsorted(ends, lo, side="right"))
    last = int(np.searchsorted(starts, hi, side="left")) - 1
    if first > last or first >= len(boundaries):
        return (0, 0)
    return (first, last - first + 1)


def token_span_to_char_span_py(
    boundaries: list[tuple[int, int]], tok_offset: int, tok_length: int
) -> tuple[int, int]:
    """Inverse remap (T9 analogue, convert_sp_to_char_offsets,
    bela/evaluation/model_eval.py:31-62): char span of a token range, with
    boundary whitespace excluded by construction."""
    if not boundaries or tok_length <= 0 or tok_offset >= len(boundaries):
        return (0, 0)
    last = min(tok_offset + tok_length - 1, len(boundaries) - 1)
    s = boundaries[tok_offset][0]
    e = boundaries[last][1]
    return (s, e - s)


def align_char_span_py(
    boundaries: list[tuple[int, int]], char_offset: int, char_length: int
) -> tuple[int, int]:
    """Snap a char span outward to word boundaries — T8 analogue
    (_align_mention_offsets_to_word_boundaries, joint_el_transform.py:704-743):
    start moves to the start of the word containing (or preceding) it, end to
    the end of the word containing (or following) it."""
    tok_off, tok_len = char_span_to_token_span_py(boundaries, char_offset, char_length)
    if tok_len == 0:
        return (char_offset, 0)
    return token_span_to_char_span_py(boundaries, tok_off, tok_len)


def adjust_offsets_for_insertions_py(
    offsets: list[int], lengths: list[int], insertions: list[int]
) -> tuple[list[int], list[int]]:
    """Shift spans past inserted positions — T7 analogue
    (_adjust_mention_offsets_and_lengths, joint_el_transform.py:650-689).
    `insertions` are character positions (in the ORIGINAL text) where one
    character was inserted; each span's offset shifts by the number of
    insertions at-or-before its start, its length grows by insertions strictly
    inside it."""
    ins = np.sort(np.asarray(insertions, dtype=np.int64))
    out_off, out_len = [], []
    for o, l in zip(offsets, lengths):
        shift = int(np.searchsorted(ins, o, side="right"))
        inside = int(np.searchsorted(ins, o + l, side="left")) - shift
        out_off.append(o + shift)
        out_len.append(l + inside)
    return out_off, out_len


# --- Arrow-batched Spark surface -------------------------------------------

@pandas_udf(BOUNDARY_TYPE)
def token_boundaries_udf(texts: pd.Series) -> pd.Series:
    return pd.Series(
        [
            [{"start": s, "end": e} for s, e in token_boundaries_py(t or "")]
            for t in texts
        ]
    )


def make_char_to_token_udf():
    schema = StructType(
        [StructField("tok_offset", IntegerType()), StructField("tok_length", IntegerType())]
    )

    @pandas_udf(schema)
    def _udf(texts: pd.Series, offs: pd.Series, lens: pd.Series) -> pd.DataFrame:
        rows = [
            char_span_to_token_span_py(token_boundaries_py(t or ""), int(o), int(l))
            for t, o, l in zip(texts, offs, lens)
        ]
        return pd.DataFrame(rows, columns=["tok_offset", "tok_length"])

    return _udf


def make_align_udf():
    schema = StructType(
        [StructField("offset", IntegerType()), StructField("length", IntegerType())]
    )

    @pandas_udf(schema)
    def _udf(texts: pd.Series, offs: pd.Series, lens: pd.Series) -> pd.DataFrame:
        rows = [
            align_char_span_py(token_boundaries_py(t or ""), int(o), int(l))
            for t, o, l in zip(texts, offs, lens)
        ]
        return pd.DataFrame(rows, columns=["offset", "length"])

    return _udf

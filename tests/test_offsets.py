"""Golden tests for char<->token offset arithmetic (SURVEY.md T4-T9),
mirroring the reference's exact-expectation transform tests including the
multi-space edge cases (bela/tests/test_transforms.py:104-128)."""

from pyspark.sql import functions as F

from bela_spark.functions.offsets import (
    adjust_offsets_for_insertions_py,
    align_char_span_py,
    char_span_to_token_span_py,
    make_align_udf,
    make_char_to_token_udf,
    token_boundaries_py,
    token_boundaries_udf,
    token_span_to_char_span_py,
)

#        0123456789012345678
TEXT = "  hola   amigos ya "
# tokens: hola [2,6), amigos [9,15), ya [16,18)
B = token_boundaries_py(TEXT)


def test_token_boundaries_whitespace_edges():
    assert B == [(2, 6), (9, 15), (16, 18)]
    assert token_boundaries_py("") == []
    assert token_boundaries_py("   ") == []
    assert token_boundaries_py("a") == [(0, 1)]


def test_char_to_token_golden():
    assert char_span_to_token_span_py(B, 2, 4) == (0, 1)    # exactly 'hola'
    assert char_span_to_token_span_py(B, 3, 2) == (0, 1)    # inside 'hola'
    assert char_span_to_token_span_py(B, 2, 13) == (0, 2)   # hola..amigos
    assert char_span_to_token_span_py(B, 6, 3) == (0, 0)    # pure whitespace
    assert char_span_to_token_span_py(B, 16, 2) == (2, 1)   # 'ya'
    assert char_span_to_token_span_py(B, 0, 19) == (0, 3)   # whole string
    assert char_span_to_token_span_py([], 0, 5) == (0, 0)


def test_token_to_char_golden():
    assert token_span_to_char_span_py(B, 0, 1) == (2, 4)
    assert token_span_to_char_span_py(B, 0, 2) == (2, 13)
    assert token_span_to_char_span_py(B, 2, 1) == (16, 2)
    assert token_span_to_char_span_py(B, 1, 99) == (9, 9)   # clamped
    assert token_span_to_char_span_py(B, 9, 1) == (0, 0)    # out of range


def test_roundtrip_char_token_char():
    # aligning twice is idempotent: snap-out then remap is stable
    for off, ln in [(3, 2), (2, 4), (10, 3), (0, 19)]:
        a_off, a_len = align_char_span_py(B, off, ln)
        assert align_char_span_py(B, a_off, a_len) == (a_off, a_len)


def test_align_snaps_outward():
    assert align_char_span_py(B, 3, 2) == (2, 4)    # mid-'hola' -> full word
    assert align_char_span_py(B, 5, 5) == (2, 13)   # spans gap -> both words
    assert align_char_span_py(B, 6, 2) == (6, 0)    # whitespace-only -> empty


def test_adjust_offsets_for_insertions():
    # insertions at original positions 2 and 5; span [0,4) gains the one at 2?
    # rule: offset shifts by insertions at-or-before start; length grows by
    # insertions strictly inside (start, start+len)
    offs, lens = adjust_offsets_for_insertions_py([0, 4, 6], [4, 2, 3], [2, 5])
    assert offs == [0, 5, 8]          # 0 unshifted; 4 -> +1 (ins@2); 6 -> +2
    assert lens == [5, 3, 3]          # ins@2 inside [0,4); ins@5 inside [4,6)


def test_spark_udf_surface(spark):
    df = spark.createDataFrame(
        [(TEXT, 3, 2), (TEXT, 6, 3), ("", 0, 1)], ["text", "off", "len"]
    )
    b = df.select(token_boundaries_udf("text").alias("b")).collect()
    assert [(x["start"], x["end"]) for x in b[0]["b"]] == [(2, 6), (9, 15), (16, 18)]
    c2t = make_char_to_token_udf()
    al = make_align_udf()
    out = df.select(
        c2t("text", "off", "len").alias("t"), al("text", "off", "len").alias("a")
    ).collect()
    assert (out[0]["t"]["tok_offset"], out[0]["t"]["tok_length"]) == (0, 1)
    assert (out[0]["a"]["offset"], out[0]["a"]["length"]) == (2, 4)
    assert (out[1]["t"]["tok_offset"], out[1]["t"]["tok_length"]) == (0, 0)
    assert (out[2]["a"]["offset"], out[2]["a"]["length"]) == (0, 0)

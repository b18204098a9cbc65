"""Property-based tests (hypothesis) for the pure-Python kernels — the
invariants that golden tests can't sweep: arbitrary whitespace, arbitrary
span positions, arbitrary budgets."""

from hypothesis import given, settings, strategies as st

from bela_spark.functions.offsets import (
    align_char_span_py,
    char_span_to_token_span_py,
    token_boundaries_py,
    token_span_to_char_span_py,
)
from bela_spark.functions.subword import (
    BOS_ID,
    EOS_ID,
    spm_tokenize_py,
    word_pieces_py,
    word_to_subword_remap_py,
)
from bela_spark.operators.dedup import simhash_blocks

texts = st.text(alphabet="ab z ", min_size=0, max_size=60)
words_lists = st.lists(st.text(alphabet="abcdefgh", min_size=1, max_size=9), min_size=1, max_size=12)


@given(texts, st.integers(min_value=8, max_value=64))
@settings(max_examples=200, deadline=None)
def test_spm_tokenize_invariants(text, max_seq_len):
    out = spm_tokenize_py(text, max_seq_len=max_seq_len)
    assert out[0] == (BOS_ID, 0, 0)
    assert out[-1][0] == EOS_ID and out[-1][2] == 0
    pieces = out[1:-1]
    # bos + at most max_seq_len-2 pieces + eos
    assert len(out) <= max_seq_len
    # surfaces tile [0, eos_offset) contiguously
    prev_end = 0
    for tid, s, e in pieces:
        assert s == prev_end and e > s
        assert tid >= 4
        prev_end = e
    assert out[-1][1] == prev_end
    # untruncated: surfaces cover exactly up to the last non-ws char
    if len(pieces) < max_seq_len - 2:
        stripped = text.rstrip()
        assert prev_end == len(stripped)


@given(words_lists, st.integers(min_value=6, max_value=40))
@settings(max_examples=200, deadline=None)
def test_word_to_subword_remap_invariants(words, max_seq_len):
    # one mention per word start, length 1 — exercises every mapping slot
    offs = list(range(len(words)))
    lens = [1] * len(words)
    seq, new_offs, new_lens, mapping = word_to_subword_remap_py(
        words, offs, lens, max_seq_len=max_seq_len
    )
    assert seq[0] == BOS_ID and seq[-1] == EOS_ID
    assert len(seq) <= max_seq_len
    # mapping entries are the piece runs, contiguous from position 1
    expect_start = 1
    for (s, e), w in zip(
        [(m[0], m[1]) for m in [list(x) for x in mapping]] if mapping else [],
        words,
    ):
        assert s == expect_start
        expect_start = e
    # every surviving mention's subword span fits inside the truncated seq
    for o, l in zip(new_offs, new_lens):
        assert 1 <= o and o + l <= max_seq_len - 1 + 1
        assert l >= 1
    # mentions are a prefix (the reference breaks, it doesn't skip)
    assert len(new_offs) <= len(offs)


@given(st.text(alphabet="abc  ", min_size=0, max_size=50))
@settings(max_examples=200, deadline=None)
def test_token_boundary_roundtrip(text):
    bounds = token_boundaries_py(text)
    # boundaries are disjoint, ordered, non-space spans
    prev = 0
    for s, e in bounds:
        assert prev <= s < e
        assert " " not in text[s:e]
        prev = e
    # every token span roundtrips char->token->char exactly
    for i, (s, e) in enumerate(bounds):
        ts, tl = char_span_to_token_span_py(bounds, s, e - s)
        assert (ts, tl) == (i, 1)
        cs, cl = token_span_to_char_span_py(bounds, ts, tl)
        assert (cs, cl) == (s, e - s)


@given(
    st.text(alphabet="abc ", min_size=1, max_size=40),
    st.integers(min_value=0, max_value=39),
    st.integers(min_value=1, max_value=10),
)
@settings(max_examples=200, deadline=None)
def test_align_char_span_idempotent(text, off, length):
    bounds = token_boundaries_py(text)
    o1, l1 = align_char_span_py(bounds, off, length)
    o2, l2 = align_char_span_py(bounds, o1, l1)
    assert (o2, l2) == (o1, l1)
    if l1 > 0:
        # aligned spans start and end exactly on word boundaries
        assert any(s == o1 for s, _ in bounds)
        assert any(e == o1 + l1 for _, e in bounds)


@given(st.integers(min_value=1, max_value=31), st.integers(min_value=0, max_value=16))
@settings(max_examples=200, deadline=None)
def test_simhash_blocks_partition_bits(bits_minus1, max_hamming):
    bits = bits_minus1 + 1
    blocks = simhash_blocks(bits, max_hamming)
    assert len(blocks) == max_hamming + 1
    # shifts+masks tile the bit range exactly, no overlap, no gap
    covered = 0
    for _, shift, mask in blocks:
        width = mask.bit_length()
        assert mask == (1 << width) - 1
        assert shift == covered if width else True
        covered += width
    assert covered == bits


@given(st.text(alphabet="abcdef", min_size=1, max_size=30))
@settings(max_examples=100, deadline=None)
def test_word_pieces_reassemble(word):
    assert "".join(word_pieces_py(word)) == word
    assert all(1 <= len(p) <= 4 for p in word_pieces_py(word))

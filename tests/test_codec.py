"""Roundtrip tests for the posting-list codec (delta+varint+skips)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from codebased_spark.functions.codec import (
    SKIP_EVERY,
    build_skips,
    decode_deltas,
    decode_positions,
    decode_varint,
    encode_deltas,
    encode_positions,
    encode_varint,
)


@given(st.lists(st.integers(min_value=0, max_value=2**62), max_size=200))
@settings(max_examples=200, deadline=None)
def test_varint_roundtrip(values):
    v = np.array(values, dtype=np.int64)
    assert decode_varint(encode_varint(v)).tolist() == values


def test_varint_boundaries():
    v = np.array([0, 127, 128, 16383, 16384, 2**62, 1], dtype=np.int64)
    assert decode_varint(encode_varint(v)).tolist() == v.tolist()
    assert encode_varint(np.array([0], dtype=np.int64)) == b"\x00"
    assert encode_varint(np.array([300], dtype=np.int64)) == b"\xac\x02"
    assert decode_varint(b"") .size == 0


@given(
    st.lists(st.integers(min_value=0, max_value=2**40), min_size=1, max_size=300)
)
@settings(max_examples=100, deadline=None)
def test_delta_roundtrip(raws):
    v = np.unique(np.array(raws, dtype=np.int64))
    assert decode_deltas(encode_deltas(v)).tolist() == v.tolist()


@given(
    st.lists(
        st.lists(st.integers(min_value=0, max_value=2**30), min_size=1, max_size=40),
        min_size=1,
        max_size=60,
    )
)
@settings(max_examples=100, deadline=None)
def test_positions_roundtrip(per_doc):
    per_doc = [sorted(set(p)) for p in per_doc]
    tfs = np.array([len(p) for p in per_doc], dtype=np.int64)
    flat = np.array([x for p in per_doc for x in p], dtype=np.int64)
    got = decode_positions(encode_positions(flat, tfs), tfs)
    assert got.tolist() == flat.tolist()


def test_skips():
    n = 300
    docs = np.arange(1000, 1000 + n, dtype=np.int64)
    tfs = np.arange(1, n + 1, dtype=np.int64)
    dls = np.arange(50, 50 + n, dtype=np.int64)
    last, maxtf, mindl = build_skips(docs, tfs, dls)
    assert last.size == (n + SKIP_EVERY - 1) // SKIP_EVERY == 3
    assert last.tolist() == [1000 + SKIP_EVERY - 1, 1000 + 2 * SKIP_EVERY - 1, 1000 + n - 1]
    assert maxtf.tolist() == [SKIP_EVERY, 2 * SKIP_EVERY, n]
    assert mindl.tolist() == [50, 50 + SKIP_EVERY, 50 + 2 * SKIP_EVERY]

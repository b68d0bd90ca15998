"""Positions-sidecar codec roundtrips and edge cases (pure numpy)."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from deusu_spark import poscodec


def test_varint_roundtrip_basic():
    vals = np.array([0, 1, 127, 128, 129, 16383, 16384, 2**40, 2**62])
    assert list(poscodec.decode_varints(poscodec.encode_varints(vals))) == \
        list(vals)


def test_varint_empty():
    assert poscodec.encode_varints(np.array([], dtype=np.int64)) == b""
    assert poscodec.decode_varints(b"").size == 0


def test_varint_rejects_negative():
    with pytest.raises(ValueError):
        poscodec.encode_varints(np.array([-1]))


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**50), max_size=60))
def test_varint_roundtrip_property(vals):
    arr = np.asarray(vals, dtype=np.int64)
    out = poscodec.decode_varints(poscodec.encode_varints(arr))
    assert list(out) == vals


def test_positions_roundtrip():
    doc_ids = np.array([0, 3, 4, 1000])
    counts = np.array([2, 1, 3, 2])
    positions = np.array([0, 5, 7, 1, 2, 119, 3, 4])
    blob = poscodec.encode_positions(doc_ids, counts, positions)
    d, c, p = poscodec.decode_positions(blob)
    assert list(d) == list(doc_ids)
    assert list(c) == list(counts)
    assert list(p) == list(positions)


def test_positions_single_doc_pos_zero():
    blob = poscodec.encode_positions(
        np.array([7]), np.array([1]), np.array([0])
    )
    d, c, p = poscodec.decode_positions(blob)
    assert (list(d), list(c), list(p)) == ([7], [1], [0])


def test_positions_empty():
    assert poscodec.encode_positions(
        np.array([]), np.array([]), np.array([])
    ) == b""
    d, c, p = poscodec.decode_positions(b"")
    assert d.size == c.size == p.size == 0


def test_positions_rejects_descending_docs():
    with pytest.raises(ValueError):
        poscodec.encode_positions(
            np.array([5, 4]), np.array([1, 1]), np.array([0, 0])
        )


def test_positions_rejects_nonascending_pos():
    with pytest.raises(ValueError):
        poscodec.encode_positions(
            np.array([1]), np.array([2]), np.array([3, 3])
        )


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=50),  # doc gap
            st.lists(
                st.integers(min_value=1, max_value=30),  # pos gaps
                min_size=1,
                max_size=8,
            ),
        ),
        max_size=20,
    )
)
def test_positions_roundtrip_property(spec):
    if not spec:
        return
    doc_ids, counts, flat = [], [], []
    d = -1
    for gap, pgaps in spec:
        d += gap
        doc_ids.append(d)
        counts.append(len(pgaps))
        p = -1
        first = True
        for g in pgaps:
            p = g - 1 if first else p + g  # first position may be 0
            first = False
            flat.append(p)
    blob = poscodec.encode_positions(
        np.array(doc_ids), np.array(counts), np.array(flat)
    )
    dd, cc, pp = poscodec.decode_positions(blob)
    assert list(dd) == doc_ids
    assert list(cc) == counts
    assert list(pp) == flat

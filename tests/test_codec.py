"""Codec golden vectors (FIXTURES.md F4) + round-trip properties.

Golden bytes derived by hand from the reference encoder
(/root/reference/src/rwi.pas:76-153) and cross-checked against the decoder
port (/root/reference/src/rwi.pas:47-70).
"""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from deusu_spark import codec


def enc(pairs, prev=0):
    docs = np.array([d for d, _ in pairs], dtype=np.int64)
    flags = np.array([f for _, f in pairs], dtype=np.int64)
    return codec.encode(docs, flags, prev_doc=prev)


# F4 golden vectors — byte-for-byte per rwi.pas:76-153
def test_golden_single_doc0_flags5():
    assert enc([(0, 5)]) == bytes([0x05])


def test_golden_two_docs():
    assert enc([(0, 0), (1, 0)]) == bytes([0x00, 0x08])


def test_golden_flags_and_gap15():
    assert enc([(0, 7), (15, 0)]) == bytes([0x07, 0x78])


def test_golden_gap16_continuation():
    assert enc([(0, 0), (16, 0)]) == bytes([0x00, 0x80, 0x01])


def test_golden_large_gap():
    # gap = 2^20: first byte has low 4 bits of gap (0) + cont bit;
    # remaining 2^16 in 7-bit groups: 0x80, 0x80, 0x04
    blob = enc([(1 << 20, 3)])
    assert blob == bytes([0x03 | 0x80, 0x80, 0x80, 0x04])
    docs, flags = codec.decode(blob)
    assert docs.tolist() == [1 << 20] and flags.tolist() == [3]


def test_decode_empty():
    docs, flags = codec.decode(b"")
    assert len(docs) == 0 and len(flags) == 0


def test_prev_doc_chaining():
    full = enc([(10, 1), (20, 2), (300, 3)])
    seg1 = enc([(10, 1), (20, 2)])
    seg2 = enc([(300, 3)], prev=20)
    assert seg1 + seg2 == full


def test_rebase():
    blob = enc([(100, 1), (200, 2)], prev=0)
    rebased = codec.rebase(blob, old_prev=0, new_prev=50)
    docs, flags = codec.decode(rebased, prev_doc=50)
    assert docs.tolist() == [100, 200] and flags.tolist() == [1, 2]


def test_non_ascending_raises():
    with pytest.raises(ValueError):
        enc([(5, 0), (5, 0)])


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(1, 1 << 40), st.integers(0, 7)), min_size=0, max_size=200
    ),
    st.integers(0, 100),
)
def test_roundtrip(gap_flag_pairs, prev):
    docs, flags, d = [], [], prev
    first = True
    for gap, f in gap_flag_pairs:
        d = d + (gap if not first else gap - 1)  # first gap may be 0
        first = False
        docs.append(d)
        flags.append(f)
    blob = enc(list(zip(docs, flags)), prev=prev)
    out_docs, out_flags = codec.decode(blob, prev_doc=prev)
    assert out_docs.tolist() == docs
    assert out_flags.tolist() == flags

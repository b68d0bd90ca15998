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


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.lists(
            st.tuples(st.integers(1, 1 << 40), st.integers(0, 7)),
            min_size=1,
            max_size=40,
        ),
        min_size=1,
        max_size=30,
    )
)
def test_encode_segments_byte_identity(seg_specs):
    """The vectorized multi-segment encoder is byte-identical to calling
    encode() per segment with prev_doc=0 (the build's encode contract)."""
    docs_all, flags_all, seg_starts, pos = [], [], [], 0
    for spec in seg_specs:
        d, ds, fs = 0, [], []
        for i, (gap, f) in enumerate(spec):
            d += gap if i else gap - 1  # first doc may be 0
            ds.append(d)
            fs.append(f)
        docs_all.append(np.array(ds, dtype=np.int64))
        flags_all.append(np.array(fs, dtype=np.int64))
        seg_starts.append(pos)
        pos += len(ds)
    docs = np.concatenate(docs_all)
    flags = np.concatenate(flags_all)
    boffs, out = codec.encode_segments(
        docs, flags, np.array(seg_starts, dtype=np.int64)
    )
    buf = out.tobytes()
    for i, (d, f) in enumerate(zip(docs_all, flags_all)):
        assert buf[boffs[i] : boffs[i + 1]] == codec.encode(d, f, prev_doc=0)


def test_encode_segments_rejects_non_ascending_within_segment():
    docs = np.array([3, 7, 7], dtype=np.int64)
    flags = np.zeros(3, dtype=np.int64)
    with pytest.raises(ValueError):
        codec.encode_segments(docs, flags, np.array([0], dtype=np.int64))
    # same docs are fine when the repeat starts a new segment
    boffs, out = codec.encode_segments(docs, flags, np.array([0, 2], dtype=np.int64))
    assert len(boffs) == 3


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

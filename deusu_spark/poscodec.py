"""Delta-gap varbyte codec for the token-POSITIONS sidecar (vectorized
numpy) — the optional phrase/proximity index kind.

The reference's postings are positionless by design (DbTypes.pas:119-127);
at 100 TB a phrase query that AND-candidates and then rescans ``text``
re-reads the corpus column, so this sidecar bounds that: per
(term, doc-range segment) one blob encodes every candidate doc's body
token positions, and the phrase verify decodes only the candidate
segments. This is a deliberate, documented DEVIATION from the reference
(which has no positions at all).

Blob layout — a flat varint stream (7-bit groups, LSB first, bit 7 =
continuation, value ends at a byte with bit 7 clear):

    per doc, in ascending doc order:
        doc_gap   (doc_id − previous doc_id in the segment; first vs 0)
        n_pos     (count of positions in this doc)
        p_0, then position gaps (ascending, strictly increasing)

Unlike the postings codec (rwi.pas byte compatibility), this stream has
no reference analog to match — the format is chosen for vectorized
encode (one numpy pass per task) and bounded decode.
"""

from __future__ import annotations

import numpy as np


def encode_varints(vals: np.ndarray) -> bytes:
    """Vectorized varint encode of a non-negative int64 value stream."""
    vals = np.asarray(vals, dtype=np.int64)
    n = len(vals)
    if n == 0:
        return b""
    if (vals < 0).any():
        raise ValueError("varint values must be non-negative")
    nbytes = np.ones(n, dtype=np.int64)
    r = vals >> 7
    while True:
        m = r > 0
        if not m.any():
            break
        nbytes[m] += 1
        r >>= 7
    offsets = np.zeros(n, dtype=np.int64)
    np.cumsum(nbytes[:-1], out=offsets[1:])
    out = np.zeros(int(nbytes.sum()), dtype=np.uint8)
    for k in range(int(nbytes.max())):
        m = nbytes > k
        chunk = (vals[m] >> (7 * k)) & 127
        more = nbytes[m] > k + 1
        out[offsets[m] + k] = (chunk | np.where(more, 128, 0)).astype(
            np.uint8
        )
    return out.tobytes()


def decode_varints(blob: bytes) -> np.ndarray:
    """Vectorized decode of :func:`encode_varints` output."""
    arr = np.frombuffer(blob, dtype=np.uint8).astype(np.int64)
    if arr.size == 0:
        return np.empty(0, dtype=np.int64)
    starts = np.empty(arr.size, dtype=bool)
    starts[0] = True
    np.equal(arr[:-1] & 128, 0, out=starts[1:])
    first_idx = np.flatnonzero(starts)
    vid = np.cumsum(starts) - 1
    rank = np.arange(arr.size, dtype=np.int64) - first_idx[vid]
    contrib = (arr & 127) << (7 * rank)
    vals = np.zeros(first_idx.size, dtype=np.int64)
    np.add.at(vals, vid, contrib)
    return vals


def encode_positions(
    doc_ids: np.ndarray, counts: np.ndarray, positions: np.ndarray
) -> bytes:
    """Encode one segment: ``doc_ids`` ascending (int64), ``counts[i]``
    positions for doc i, ``positions`` the flat concatenation (ascending,
    strictly increasing within each doc)."""
    doc_ids = np.asarray(doc_ids, dtype=np.int64)
    counts = np.asarray(counts, dtype=np.int64)
    positions = np.asarray(positions, dtype=np.int64)
    nd = len(doc_ids)
    if nd == 0:
        return b""
    if (counts <= 0).any():
        raise ValueError("every doc in a positions segment has >= 1 pos")
    npos = len(positions)
    if int(counts.sum()) != npos:
        raise ValueError("counts do not sum to len(positions)")
    doc_gaps = np.diff(doc_ids, prepend=np.int64(0))
    if (doc_gaps[1:] <= 0).any() or doc_gaps[0] < 0:
        raise ValueError("doc_ids must be strictly ascending")
    pos_start = np.zeros(nd, dtype=np.int64)
    np.cumsum(counts[:-1], out=pos_start[1:])
    deltas = positions.copy()
    deltas[1:] -= positions[:-1]
    deltas[pos_start] = positions[pos_start]  # first pos per doc: absolute
    if (np.delete(deltas, pos_start) <= 0).any():
        raise ValueError("positions must be strictly ascending per doc")
    # interleave: header (gap, count) per doc + that doc's deltas; the
    # slot of flat position j of doc i is 2·(i+1) + j, headers at
    # 2·i + cum_positions_before(i)
    vals = np.zeros(2 * nd + npos, dtype=np.int64)
    header = 2 * np.arange(nd, dtype=np.int64) + pos_start
    vals[header] = doc_gaps
    vals[header + 1] = counts
    doc_of_flat = np.repeat(np.arange(nd, dtype=np.int64), counts)
    vals[2 * (doc_of_flat + 1) + np.arange(npos, dtype=np.int64)] = deltas
    return encode_varints(vals)


def decode_positions(
    blob: bytes,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Decode one segment back to (doc_ids, counts, flat positions)."""
    vals = decode_varints(blob)
    if vals.size == 0:
        e = np.empty(0, dtype=np.int64)
        return e, e.copy(), e.copy()
    doc_gaps, counts, deltas = [], [], []
    i = 0
    while i < vals.size:
        doc_gaps.append(vals[i])
        c = int(vals[i + 1])
        counts.append(c)
        deltas.append(vals[i + 2 : i + 2 + c])
    # (the slice above is cumulative-summed per doc below)
        i += 2 + c
    doc_ids = np.cumsum(np.asarray(doc_gaps, dtype=np.int64))
    counts = np.asarray(counts, dtype=np.int64)
    positions = np.concatenate([np.cumsum(d) for d in deltas])
    return doc_ids, counts, positions

"""Delta-gap + varbyte posting-list codec (vectorized numpy).

Byte-compatible with the reference's compressed RWI format
(rwi.pas:76-153 CompressKeyword encode, rwi.pas:47-70
ReadCompressedDocumentID decode):

per posting, first byte:
    bits 0-2 = location flags
    bits 3-6 = low 4 bits of the doc-id gap (gap = doc_id - prev_doc_id)
    bit  7   = continuation (more gap bits follow)
continuation bytes: 7 gap bits each (bits 0-6), bit 7 = more.

Unlike the reference (one blob per term), postings are stored in bounded
*segments* so a hot term with billions of postings never materializes a
single multi-GB cell and decodes in parallel across tasks. Each segment is
self-delimiting given the previous segment's last doc id (``prev_doc``); a
segment encoded with prev_doc=0 is byte-identical to the reference encoding
of the same postings.
"""

from __future__ import annotations

import numpy as np


def encode(doc_ids: np.ndarray, flags: np.ndarray, prev_doc: int = 0) -> bytes:
    """Encode ascending doc_ids (int64) + flags (0..7) into a varbyte blob.

    Mirrors rwi.pas:76-153. ``prev_doc`` is the doc id the first gap is
    relative to (0 for a self-contained / first segment).
    """
    n = len(doc_ids)
    if n == 0:
        return b""
    doc_ids = np.asarray(doc_ids, dtype=np.int64)
    flags = np.asarray(flags, dtype=np.int64)
    gaps = np.diff(doc_ids, prepend=np.int64(prev_doc))
    if n and (gaps[1:] <= 0).any():
        raise ValueError("doc_ids must be strictly ascending")
    if gaps[0] < 0:
        raise ValueError("first doc_id is below prev_doc")

    first = (flags & 7) | ((gaps & 15) << 3)
    rest = gaps >> 4
    first = np.where(rest > 0, first | 128, first)

    # continuation byte count per posting
    nbytes = np.ones(n, dtype=np.int64)
    r = rest.copy()
    while True:
        m = r > 0
        if not m.any():
            break
        nbytes[m] += 1
        r >>= 7

    offsets = np.zeros(n, dtype=np.int64)
    np.cumsum(nbytes[:-1], out=offsets[1:])
    out = np.zeros(int(nbytes.sum()), dtype=np.uint8)
    out[offsets] = first.astype(np.uint8)

    r = rest.copy()
    k = 0
    while True:
        m = r > 0
        if not m.any():
            break
        k += 1
        chunk = r[m] & 127
        more = (r[m] >> 7) > 0
        out[offsets[m] + k] = (chunk | np.where(more, 128, 0)).astype(np.uint8)
        r >>= 7
    return out.tobytes()


def decode(blob: bytes, prev_doc: int = 0) -> tuple[np.ndarray, np.ndarray]:
    """Decode a blob back to (doc_ids int64, flags int8).

    Mirrors rwi.pas:47-70 (ReadCompressedDocumentID) over the whole blob.
    """
    arr = np.frombuffer(blob, dtype=np.uint8).astype(np.int64)
    if arr.size == 0:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int8)
    starts = np.empty(arr.size, dtype=bool)
    starts[0] = True
    np.not_equal(arr[:-1] & 128, 128, out=starts[1:])
    first_idx = np.flatnonzero(starts)
    n = first_idx.size
    pid = np.cumsum(starts) - 1
    rank = np.arange(arr.size, dtype=np.int64) - first_idx[pid]
    contrib = np.where(
        rank == 0,
        (arr >> 3) & 15,
        (arr & 127) << (4 + 7 * np.maximum(rank - 1, 0)),
    )
    gaps = np.zeros(n, dtype=np.int64)
    np.add.at(gaps, pid, contrib)
    gaps[0] += prev_doc
    doc_ids = np.cumsum(gaps)
    flags = (arr[first_idx] & 7).astype(np.int8)
    return doc_ids, flags


def rebase(blob: bytes, old_prev: int, new_prev: int) -> bytes:
    """Re-encode only the first posting's gap so the blob chains after a
    different predecessor doc id. Used when merging salted partial runs into
    ordered segments (SURVEY §7 hot-term skew): bodies concatenate verbatim,
    only the head gap changes.
    """
    if not blob:
        return blob
    arr = np.frombuffer(blob, dtype=np.uint8)
    # length of the first posting's byte group
    end = 1
    while arr[end - 1] & 128:
        end += 1
    head_docs, head_flags = decode(arr[:end].tobytes(), prev_doc=old_prev)
    new_head = encode(head_docs, head_flags, prev_doc=new_prev)
    return new_head + arr[end:].tobytes()

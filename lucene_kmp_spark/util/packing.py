"""Vectorized (numpy) integer codecs for posting blocks.

The reference encodes posting blocks of 128 docs with FOR/PFor bit-packing and
vint tails (``codecs/lucene101/ForUtil.kt:121``, ``PForUtil.kt:22-70``,
``Lucene101PostingsFormat.kt:32-60``). We keep the same *logical* layout —
delta-encoded docIDs in blocks of 128 — but use LEB128 varints as the physical
encoding inside Parquet ``binary`` cells (Parquet already provides the
page-level compression the bit-packing would add; the varint keeps cell sizes
small and decode numpy-vectorized).

All functions operate on non-negative int64 values.
"""

from __future__ import annotations

import numpy as np

_THRESHOLDS = [np.uint64(1) << np.uint64(7 * k) for k in range(1, 10)]


def varint_encode(values: np.ndarray) -> bytes:
    """LEB128-encode an array of non-negative ints (vectorized)."""
    v = np.asarray(values, dtype=np.int64)
    if v.size == 0:
        return b""
    if (v < 0).any():
        raise ValueError("varint_encode requires non-negative values")
    u = v.astype(np.uint64)
    nbytes = np.ones(u.shape, dtype=np.int64)
    for t in _THRESHOLDS:
        nbytes += (u >= t).astype(np.int64)
    total = int(nbytes.sum())
    buf = np.zeros(total, dtype=np.uint8)
    offsets = np.cumsum(nbytes) - nbytes
    maxlen = int(nbytes.max())
    for k in range(maxlen):
        mask = nbytes > k
        pos = offsets[mask] + k
        chunk = (u[mask] >> np.uint64(7 * k)) & np.uint64(0x7F)
        more = (nbytes[mask] > k + 1).astype(np.uint8) << 7
        buf[pos] = chunk.astype(np.uint8) | more
    return buf.tobytes()


def varint_decode(buf: bytes) -> np.ndarray:
    """Decode LEB128 bytes back to an int64 array (vectorized)."""
    if not buf:
        return np.zeros(0, dtype=np.int64)
    b = np.frombuffer(buf, dtype=np.uint8)
    term = (b & 0x80) == 0  # terminator bytes
    # index of each byte within its value
    ends = np.flatnonzero(term)
    starts = np.empty_like(ends)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    idx_in_val = np.arange(b.size, dtype=np.int64)
    idx_in_val -= np.repeat(starts, ends - starts + 1)
    parts = (b & 0x7F).astype(np.uint64) << (np.uint64(7) * idx_in_val.astype(np.uint64))
    return np.add.reduceat(parts, starts).astype(np.int64)


def delta_encode(sorted_vals: np.ndarray) -> bytes:
    """First value absolute, then gaps — the posting-list docID layout."""
    a = np.asarray(sorted_vals, dtype=np.int64)
    if a.size == 0:
        return b""
    d = np.empty_like(a)
    d[0] = a[0]
    d[1:] = a[1:] - a[:-1]
    return varint_encode(d)


def delta_decode(buf: bytes) -> np.ndarray:
    d = varint_decode(buf)
    if d.size == 0:
        return d
    return np.cumsum(d)

"""SmallFloat: lossy small-float encodings used for norm bytes.

Semantics match the reference ``util/SmallFloat.kt`` (lucene-kmp):

* ``long_to_int4``   — SmallFloat.kt:87-104  (4 significant bits, order-preserving)
* ``int4_to_long``   — SmallFloat.kt:107-119
* ``int_to_byte4``   — SmallFloat.kt:129-136 (values < 24 exact, larger 4-bit-mantissa
                       floor-quantized; 24 == NUM_FREE_VALUES = 255 - longToInt4(2^31-1))
* ``byte4_to_int``   — SmallFloat.kt:139-147

These are independent reimplementations from the published encoding spec; the
constants are forced by the format, not copied code.
"""

from __future__ import annotations

import numpy as np


def long_to_int4(i: int) -> int:
    if i < 0:
        raise ValueError(f"Only supports positive values, got {i}")
    num_bits = i.bit_length()
    if num_bits < 4:
        return i
    shift = num_bits - 4
    encoded = (i >> shift) & 0x07  # drop the implicit leading bit
    encoded |= (shift + 1) << 3
    return encoded


def int4_to_long(i: int) -> int:
    bits = i & 0x07
    shift = (i >> 3) - 1
    if shift == -1:
        return bits
    return (bits | 0x08) << shift


MAX_INT4 = long_to_int4(2**31 - 1)
NUM_FREE_VALUES = 255 - MAX_INT4  # == 24


def int_to_byte4(i: int) -> int:
    """Encode a non-negative int to an unsigned byte 0..255 (norm byte)."""
    if i < 0:
        raise ValueError(f"Only supports positive values, got {i}")
    if i < NUM_FREE_VALUES:
        return i
    return NUM_FREE_VALUES + long_to_int4(i - NUM_FREE_VALUES)


def byte4_to_int(b: int) -> int:
    """Decode an unsigned byte 0..255 back to the (quantized) int."""
    if b < NUM_FREE_VALUES:
        return b
    return NUM_FREE_VALUES + int4_to_long(b - NUM_FREE_VALUES)


# 256-entry decode table: LENGTH_TABLE in BM25Similarity.kt:254-260.
LENGTH_TABLE = np.array([byte4_to_int(b) for b in range(256)], dtype=np.float32)

# Vectorized encoder for doc lengths (hot path of the norms computation).
_ENC_DOMAIN_MAX = 1 << 22  # doc lengths above this are astronomically rare; fall back
_ENC_TABLE_SMALL = np.array([int_to_byte4(i) for i in range(65536)], dtype=np.uint8)


def int_to_byte4_np(lengths: np.ndarray) -> np.ndarray:
    """Vectorized int_to_byte4 over an int array (returns uint8)."""
    lengths = np.asarray(lengths)
    if lengths.size == 0:
        return np.zeros(0, dtype=np.uint8)
    if (lengths < 0).any():
        raise ValueError("negative length")
    small = lengths < 65536
    out = np.empty(lengths.shape, dtype=np.uint8)
    out[small] = _ENC_TABLE_SMALL[lengths[small]]
    if not small.all():
        big = ~small
        out[big] = np.array(
            [int_to_byte4(int(v)) for v in lengths[big]], dtype=np.uint8
        )
    return out

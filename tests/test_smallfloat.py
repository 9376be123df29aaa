"""SmallFloat parity tests (reference util/SmallFloat.kt:87-147)."""

import numpy as np
import pytest

from lucene_kmp_spark.util.smallfloat import (
    LENGTH_TABLE,
    NUM_FREE_VALUES,
    byte4_to_int,
    int_to_byte4,
    int_to_byte4_np,
)


def test_small_values_exact():
    # values below NUM_FREE_VALUES (24) round-trip exactly
    assert NUM_FREE_VALUES == 24
    for i in range(NUM_FREE_VALUES):
        assert int_to_byte4(i) == i
        assert byte4_to_int(i) == i


def test_known_goldens():
    # hand-computed from the encoding spec (4-bit mantissa above 24)
    assert int_to_byte4(24) == 24  # v=0 -> subnormal 0 -> byte 24
    assert int_to_byte4(25) == 25  # v=1 subnormal
    assert int_to_byte4(31) == 31  # v=7 subnormal
    assert int_to_byte4(32) == 32  # v=8 -> numBits=4, shift=0 -> (8&7)|((0+1)<<3)=8 -> 24+8=32
    assert int_to_byte4(39) == 39  # v=15 -> 0b1111 -> 7|8=15 -> 24+15=39
    assert int_to_byte4(40) == 40  # v=16 -> numBits=5, shift=1 -> (16>>1)&7=0|16=16 -> 40
    assert int_to_byte4(41) == 40  # quantized down
    assert byte4_to_int(40) == 40
    assert byte4_to_int(255) == 24 + ((7 | 8) << 27)


def test_monotone_and_floor():
    prev = -1
    for i in range(0, 100000, 7):
        b = int_to_byte4(i)
        assert b >= prev or byte4_to_int(b) <= i
        assert byte4_to_int(b) <= i  # floor quantization
        prev = max(prev, b)


def test_roundtrip_fixpoint():
    # decode(encode(x)) is a fixpoint of encode
    for i in list(range(0, 5000)) + [2**20, 2**31 - 1]:
        d = byte4_to_int(int_to_byte4(i))
        assert int_to_byte4(d) == int_to_byte4(i)


def test_length_table():
    assert LENGTH_TABLE.dtype == np.float32
    assert LENGTH_TABLE[0] == 0.0
    assert LENGTH_TABLE[1] == 1.0
    assert LENGTH_TABLE[39] == 39.0
    assert LENGTH_TABLE[40] == 40.0


def test_vectorized_matches_scalar():
    vals = np.array([0, 1, 23, 24, 39, 40, 41, 100, 215, 216, 1000, 65535, 65536, 2**22 + 3])
    got = int_to_byte4_np(vals)
    exp = np.array([int_to_byte4(int(v)) for v in vals], dtype=np.uint8)
    assert (got == exp).all()


def test_negative_raises():
    with pytest.raises(ValueError):
        int_to_byte4(-1)

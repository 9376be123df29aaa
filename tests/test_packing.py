import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from lucene_kmp_spark.util.packing import (
    delta_decode,
    delta_encode,
    varint_decode,
    varint_encode,
)


def test_empty():
    assert varint_encode(np.array([], dtype=np.int64)) == b""
    assert varint_decode(b"").size == 0
    assert delta_decode(delta_encode(np.array([], dtype=np.int64))).size == 0


def test_simple():
    a = np.array([0, 1, 127, 128, 300, 2**31, 2**62], dtype=np.int64)
    assert (varint_decode(varint_encode(a)) == a).all()


def test_single_byte_values():
    a = np.arange(128, dtype=np.int64)
    enc = varint_encode(a)
    assert len(enc) == 128  # all single-byte
    assert (varint_decode(enc) == a).all()


@settings(max_examples=50, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**62), max_size=500))
def test_varint_roundtrip(vals):
    a = np.array(vals, dtype=np.int64)
    assert (varint_decode(varint_encode(a)) == a).all()


@settings(max_examples=50, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**40), min_size=1, max_size=300))
def test_delta_roundtrip(vals):
    a = np.array(sorted(vals), dtype=np.int64)
    assert (delta_decode(delta_encode(a)) == a).all()


# ---------------------------------------------------- FOR / PFor block codecs
from hypothesis import given, settings, strategies as st

from lucene_kmp_spark.util.packing import (
    block_decode,
    block_encode,
    delta_block_decode,
    delta_block_encode,
    for_encode,
    pfor_encode,
)


@given(st.lists(st.integers(min_value=0, max_value=2**40), max_size=128))
@settings(max_examples=200, deadline=None)
def test_block_codecs_roundtrip(vals):
    import numpy as np

    a = np.array(vals, dtype=np.int64)
    for codec in ("varint", "for", "pfor", "auto"):
        got = block_decode(block_encode(a, codec))
        assert got.tolist() == vals, codec


@given(st.lists(st.integers(min_value=0, max_value=2**40), min_size=1, max_size=128))
@settings(max_examples=100, deadline=None)
def test_delta_block_roundtrip(vals):
    import numpy as np

    sorted_unique = sorted(set(vals))
    a = np.array(sorted_unique, dtype=np.int64)
    got = delta_block_decode(delta_block_encode(a, "auto"))
    assert got.tolist() == sorted_unique


def test_pfor_patches_outliers():
    """A block of small values + few huge outliers must pack at the small
    width with patched exceptions (PForUtil.kt <=7 exceptions)."""
    import numpy as np

    vals = np.array([3] * 120 + [2**30] * 5, dtype=np.int64)
    enc = pfor_encode(vals)
    assert enc[0] == 2  # TAG_PFOR
    assert enc[1] == 2  # width of value 3
    assert enc[4] == 5  # 5 exceptions
    assert block_decode(enc).tolist() == vals.tolist()
    # pfor beats FOR here (FOR must use 31 bits everywhere)
    assert len(enc) < len(for_encode(vals))


def test_auto_picks_smallest():
    import numpy as np

    dense_small = np.arange(1, 129, dtype=np.int64)  # gaps of 1 -> FOR wins
    few_outliers = np.array([1] * 125 + [10**6] * 3, dtype=np.int64)
    for vals in (dense_small, few_outliers):
        auto = block_encode(vals, "auto")
        assert len(auto) == min(
            len(block_encode(vals, c)) for c in ("varint", "for", "pfor")
        )


def test_oversized_block_guard():
    """ADVICE r1 (high): for_encode used to truncate n mod 65536 silently —
    a 70k-value positions cell decoded to 4,464 values. Now for_encode raises
    and block_encode routes oversized cells to varint (length-prefix-free)."""
    import numpy as np

    import pytest

    big = np.arange(70_000, dtype=np.int64)
    with pytest.raises(ValueError):
        for_encode(big)
    with pytest.raises(ValueError):
        pfor_encode(big)
    for codec in ("vf", "auto"):
        enc = block_encode(big, codec)
        assert enc[0] == 0  # TAG_VARINT
        got = block_decode(enc)
        assert got.size == 70_000
        assert (got == big).all()

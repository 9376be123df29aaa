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

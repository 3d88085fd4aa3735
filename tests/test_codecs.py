"""Property-style round-trips for the posting codecs (SURVEY §5 rebuild plan:
encode∘decode = id on random and adversarial gaps)."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from conveyorbelt_spark.functions.codecs import (
    delta_decode,
    delta_encode,
    varint_decode,
    varint_encode,
)


@given(st.lists(st.integers(min_value=0, max_value=2**64 - 1), max_size=200))
@settings(max_examples=200, deadline=None)
def test_varint_roundtrip(vals):
    arr = np.array(vals, dtype=np.uint64)
    out = varint_decode(varint_encode(arr))
    assert out.tolist() == vals


def test_varint_adversarial():
    edges = [0, 1, 127, 128, 129, 2**14 - 1, 2**14, 2**21, 2**28, 2**35, 2**63, 2**64 - 1]
    arr = np.array(edges, dtype=np.uint64)
    assert varint_decode(varint_encode(arr)).tolist() == edges


@given(
    st.lists(st.integers(min_value=1, max_value=2**40), min_size=1, max_size=200).map(
        lambda gaps: np.cumsum(np.array(gaps, dtype=np.uint64))
    )
)
@settings(max_examples=200, deadline=None)
def test_delta_roundtrip(sorted_vals):
    out = delta_decode(delta_encode(sorted_vals))
    assert np.array_equal(out, sorted_vals)


def test_empty():
    assert varint_encode(np.array([], dtype=np.uint64)) == b""
    assert varint_decode(b"").size == 0
    assert delta_encode(np.array([], dtype=np.uint64)) == b""


def test_count_mismatch_raises():
    data = varint_encode(np.array([1, 2, 3], dtype=np.uint64))
    with pytest.raises(ValueError):
        varint_decode(data, count=2)

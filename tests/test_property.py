"""Property-based tests (hypothesis): the invariants must hold for ANY
input, not just the fixtures."""

from __future__ import annotations

import math

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from ts_raster_spark.compression.gorilla import (
    decode_timestamps,
    decode_values,
    encode_timestamps,
    encode_values,
)
from ts_raster_spark.functions import oracle as ORC

finite_doubles = st.floats(
    allow_nan=False, allow_infinity=False, width=64, min_value=-1e12, max_value=1e12
)


@settings(max_examples=200, deadline=None)
@given(st.lists(finite_doubles, min_size=0, max_size=300))
def test_gorilla_values_roundtrip_any_floats(xs):
    x = np.asarray(xs, dtype=np.float64)
    out = decode_values(encode_values(x))
    assert out.view(np.uint64).tolist() == x.view(np.uint64).tolist()


@settings(max_examples=200, deadline=None)
@given(
    st.integers(min_value=-(10**15), max_value=10**15),
    st.lists(st.integers(min_value=-(10**10), max_value=10**10), min_size=0, max_size=200),
)
def test_dod_timestamps_roundtrip_any_deltas(t0, deltas):
    ts = np.cumsum(np.asarray([t0] + deltas, dtype=np.int64)).astype(np.int64)
    out = decode_timestamps(encode_timestamps(ts))
    assert out.tolist() == ts.tolist()


@settings(max_examples=100, deadline=None)
@given(st.lists(finite_doubles, min_size=1, max_size=100))
def test_oracle_calculators_total(xs):
    """Every oracle calculator must return a finite float, NaN, or int on
    any non-empty series — never raise (the kernel depends on this)."""
    x = np.asarray(xs, dtype=np.float64)
    for name, fn in ORC.ORACLES.items():
        v = fn(x)
        assert v is None or isinstance(v, (int, float, np.floating, np.integer)), name


@settings(max_examples=100, deadline=None)
@given(st.lists(finite_doubles, min_size=2, max_size=100))
def test_oracle_identities(xs):
    """Cross-calculator identities that hold by definition."""
    x = np.asarray(xs, dtype=np.float64)
    assert ORC.ORACLES["variance"](x) == pytest_approx(ORC.ORACLES["standard_deviation"](x) ** 2)
    assert ORC.ORACLES["count_above_mean"](x) + ORC.ORACLES["count_below_mean"](x) <= len(x)
    assert 0 < ORC.ORACLES["last_location_of_maximum"](x) <= 1
    asc = ORC.ORACLES["absolute_sum_of_changes"](x)
    mac = ORC.ORACLES["mean_abs_change"](x)
    if not math.isnan(mac):
        assert asc == pytest_approx(mac * (len(x) - 1))


def pytest_approx(v, rel=1e-9, abs_=1e-9):
    import pytest

    return pytest.approx(v, rel=rel, abs=abs_)

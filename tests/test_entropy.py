from __future__ import annotations

import math

import numpy as np
import pytest

from ts_raster_spark.functions.oracle import (
    binned_entropy,
    number_crossing_m,
    permutation_entropy,
    sample_entropy,
)


def test_permutation_entropy_known_cases():
    assert permutation_entropy(np.arange(50.0)) == pytest.approx(0.0)  # one pattern
    alt = np.array([0.0, 1.0] * 25)
    # two alternating patterns, equal frequency -> ln 2
    assert permutation_entropy(alt) == pytest.approx(math.log(2), rel=1e-6)
    assert math.isnan(permutation_entropy(np.array([1.0, 2.0])))


def test_sample_entropy_orders_regular_vs_noise():
    t = np.linspace(0, 20 * np.pi, 400)
    regular = np.sin(t)
    noise = np.random.RandomState(5).normal(size=400)
    se_r, se_n = sample_entropy(regular), sample_entropy(noise)
    assert se_r < se_n, (se_r, se_n)
    assert math.isnan(sample_entropy(np.array([1.0, 2.0, 3.0])))


def test_binned_entropy_known_cases():
    # uniform over 10 distinct equal-count bins -> ln 10
    x = np.repeat(np.arange(10.0), 5) + 0.001
    assert binned_entropy(x, 10) == pytest.approx(math.log(10), rel=1e-6)
    assert binned_entropy(np.full(20, 7.0), 10) == pytest.approx(0.0)


def test_number_crossing_known():
    assert number_crossing_m(np.array([-1.0, 1.0, -1.0, 1.0]), 0) == 3
    assert number_crossing_m(np.array([1.0, 2.0, 3.0]), 0) == 0
    assert number_crossing_m(np.array([5.0]), 0) == 0

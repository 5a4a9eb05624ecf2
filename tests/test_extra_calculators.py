from __future__ import annotations

import math

import numpy as np
import pytest

from ts_raster_spark.functions.oracle import (
    benford_correlation,
    energy_ratio_by_chunks,
    lempel_ziv_complexity,
)


def test_benford_on_benford_data():
    """Data drawn to follow Benford's law correlates ~1; uniform leading
    digits correlate poorly."""
    rng = np.random.RandomState(0)
    benford_like = 10 ** rng.uniform(0, 4, 20000)  # log-uniform => Benford
    assert benford_correlation(benford_like) > 0.99
    # perfectly uniform leading digits -> zero-variance observed
    # distribution -> undefined correlation (NaN, tsfresh semantics)
    uniform_digits = np.concatenate([np.full(100, d * 1.0) for d in range(1, 10)])
    assert math.isnan(benford_correlation(uniform_digits))
    # digits skewed AWAY from Benford (mass on 9) -> negative correlation
    anti = np.concatenate([np.full(500, 9.0), np.full(10, 1.0)])
    assert benford_correlation(anti) < 0
    assert math.isnan(benford_correlation(np.array([])))


def test_lempel_ziv_orders_structure():
    const = np.full(200, 3.0)
    periodic = np.tile([1.0, 2.0, 3.0, 4.0], 50)
    noise = np.random.RandomState(1).normal(size=200)
    assert lempel_ziv_complexity(const) < lempel_ziv_complexity(periodic) < lempel_ziv_complexity(noise)


def test_energy_ratio_chunks():
    x = np.zeros(100)
    x[:10] = 2.0  # all energy in chunk 0 of 10
    assert energy_ratio_by_chunks(x, 10, 0) == pytest.approx(1.0)
    assert energy_ratio_by_chunks(x, 10, 5) == pytest.approx(0.0)
    y = np.ones(100)
    assert energy_ratio_by_chunks(y, 10, 3) == pytest.approx(0.1)


def test_fft_aggregated_spectral_moments():
    from ts_raster_spark.functions.oracle import (
        fft_aggregated_centroid,
        fft_aggregated_kurtosis,
        fft_aggregated_skew,
        fft_aggregated_variance,
    )

    n = 256
    t = np.arange(n)
    # pure cosine at bin k -> spectral mass concentrated at index k
    # (plus the DC leakage-free case): centroid ~= k, tiny variance
    for k in (8, 32):
        x = np.cos(2 * np.pi * k * t / n)
        assert fft_aggregated_centroid(x) == pytest.approx(k, abs=1e-6)
        assert fft_aggregated_variance(x) == pytest.approx(0.0, abs=1e-6)
    # white noise spreads mass: centroid near the middle of [0, n/2]
    rng = np.random.RandomState(0)
    xn = rng.normal(size=n)
    c = fft_aggregated_centroid(xn)
    assert 0.25 * (n / 2) < c < 0.75 * (n / 2)
    assert fft_aggregated_variance(xn) > 100
    # skew/kurt finite on noise, NaN on degenerate (constant) spectrum
    assert np.isfinite(fft_aggregated_skew(xn))
    assert np.isfinite(fft_aggregated_kurtosis(xn))
    const = np.full(64, 3.0)  # all mass at DC -> var 0 -> NaN
    assert np.isnan(fft_aggregated_skew(const))
    # empty / zero series carries no spectral mass
    assert np.isnan(fft_aggregated_centroid(np.zeros(32)))

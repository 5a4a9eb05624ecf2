"""Pure pandas/NumPy oracle of the tsfresh calculators the engine claims.

tsfresh itself is not installed in this sandbox, so unit tests compare
every Spark kernel/aggregate against these reimplementations of the
published formulas (tsfresh docs; semantics pinned in SURVEY.md §2.5 —
population variance ddof=0, bias-corrected pandas skew/kurt, linear-interp
quantiles, autocorrelation with global mean/variance).

These run on a plain ordered 1-D float array (one (conv_id, kind[,bucket])
series, already sorted by (turn_idx, ts)).
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def mean(x):
    return float(np.mean(x))


def maximum(x):
    return float(np.max(x))


def minimum(x):
    return float(np.min(x))


def median(x):
    return float(np.median(x))


def sum_values(x):
    return float(np.sum(x))


def variance(x):
    return float(np.var(x))  # ddof=0 (population)


def standard_deviation(x):
    return float(np.std(x))


def abs_energy(x):
    return float(np.dot(x, x))


def root_mean_square(x):
    return float(np.sqrt(np.mean(np.square(x))))


def skewness(x):
    return float(pd.Series(x).skew())  # bias-corrected G1


def kurtosis(x):
    return float(pd.Series(x).kurt())  # bias-corrected excess G2


def mean_change(x):
    x = np.asarray(x)
    return float((x[-1] - x[0]) / (len(x) - 1)) if len(x) > 1 else np.nan


def mean_abs_change(x):
    return float(np.mean(np.abs(np.diff(x)))) if len(x) > 1 else np.nan


def mean_second_derivative_central(x):
    x = np.asarray(x)
    if len(x) < 3:
        return np.nan
    return float(np.mean((x[2:] - 2 * x[1:-1] + x[:-2]) / 2.0))


def quantile(x, q):
    return float(np.quantile(np.asarray(x, dtype=float), q))  # linear interp


def ratio_beyond_r_sigma(x, r):
    x = np.asarray(x, dtype=float)
    return float(np.mean(np.abs(x - np.mean(x)) > r * np.std(x)))


def autocorrelation(x, lag):
    x = np.asarray(x, dtype=float)
    n = len(x)
    if n <= lag:
        return np.nan
    v = np.var(x)
    if v == 0:
        return np.nan
    mu = np.mean(x)
    return float(np.sum((x[: n - lag] - mu) * (x[lag:] - mu)) / ((n - lag) * v))


def count_above_mean(x):
    x = np.asarray(x, dtype=float)
    return int(np.sum(x > np.mean(x)))


def count_below_mean(x):
    x = np.asarray(x, dtype=float)
    return int(np.sum(x < np.mean(x)))


def _longest_run(mask):
    best = cur = 0
    for m in mask:
        cur = cur + 1 if m else 0
        best = max(best, cur)
    return best


def longest_strike_above_mean(x):
    x = np.asarray(x, dtype=float)
    return int(_longest_run(x > np.mean(x)))


def longest_strike_below_mean(x):
    x = np.asarray(x, dtype=float)
    return int(_longest_run(x < np.mean(x)))


def last_location_of_maximum(x):
    x = np.asarray(x, dtype=float)
    return float(1.0 - np.argmax(x[::-1]) / len(x))


def first_location_of_maximum(x):
    x = np.asarray(x, dtype=float)
    return float(np.argmax(x) / len(x))


def last_location_of_minimum(x):
    x = np.asarray(x, dtype=float)
    return float(1.0 - np.argmin(x[::-1]) / len(x))


def first_location_of_minimum(x):
    x = np.asarray(x, dtype=float)
    return float(np.argmin(x) / len(x))


def large_standard_deviation(x, r):
    x = np.asarray(x, dtype=float)
    return int(np.std(x) > r * (np.max(x) - np.min(x)))


def agg_linear_trend_slope(x, chunk_len, f_agg="max"):
    x = np.asarray(x, dtype=float)
    fn = {"max": np.max, "min": np.min, "mean": np.mean}[f_agg]
    chunks = [fn(x[i : i + chunk_len]) for i in range(0, len(x), chunk_len)]
    if len(chunks) < 2:
        return np.nan
    idx = np.arange(len(chunks), dtype=float)
    slope = np.polyfit(idx, np.asarray(chunks, dtype=float), 1)[0]
    return float(slope)


def absolute_sum_of_changes(x):
    return float(np.sum(np.abs(np.diff(x)))) if len(x) > 1 else 0.0


def cid_ce(x):
    return float(np.sqrt(np.sum(np.diff(x) ** 2))) if len(x) > 1 else 0.0


def c3(x, lag):
    x = np.asarray(x, dtype=float)
    n = len(x)
    if n <= 2 * lag:
        return 0.0
    return float(np.mean(x[: n - 2 * lag] * x[lag : n - lag] * x[2 * lag :]))


def time_reversal_asymmetry(x, lag):
    x = np.asarray(x, dtype=float)
    n = len(x)
    if n <= 2 * lag:
        return 0.0
    a, b, c = x[: n - 2 * lag], x[lag : n - lag], x[2 * lag :]
    return float(np.mean(c * c * b - b * a * a))


def variation_coefficient(x):
    x = np.asarray(x, dtype=float)
    m = np.mean(x)
    return float(np.std(x) / m) if m != 0 else np.nan


def number_peaks(x, n):
    x = np.asarray(x, dtype=float)
    cnt = 0
    for i in range(n, len(x) - n):
        if all(x[i] > x[i - k] and x[i] > x[i + k] for k in range(1, n + 1)):
            cnt += 1
    return cnt


def number_crossing_m(x, m):
    """tsfresh: count of sign changes of (x > m) between neighbours."""
    x = np.asarray(x, dtype=float)
    if len(x) < 2:
        return 0
    pos = x > m
    return int(np.sum(pos[1:] != pos[:-1]))


def binned_entropy(x, max_bins):
    x = np.asarray(x, dtype=float)
    hist, _ = np.histogram(x, bins=max_bins)
    p = hist / len(x)
    p = p[p > 0]
    return float(-np.sum(p * np.log(p)))


def sample_entropy(x, m: int = 2, r_frac: float = 0.2):
    """tsfresh sample_entropy: m=2, tolerance r = 0.2·std(x), Chebyshev
    distance template matching (vectorized; O(n²) per series)."""
    x = np.asarray(x, dtype=float)
    n = len(x)
    if n <= m + 1:
        return np.nan
    r = r_frac * np.std(x)

    def _phi(mm):
        templ = np.array([x[i : i + mm] for i in range(n - mm + 1)])
        count = 0
        for i in range(len(templ) - 1):
            d = np.max(np.abs(templ[i + 1 :] - templ[i]), axis=1)
            count += int(np.sum(d <= r))
        return count

    b = _phi(m)
    a = _phi(m + 1)
    if a == 0 or b == 0:
        return np.nan
    return float(-np.log(a / b))


def permutation_entropy(x, tau: int = 1, dimension: int = 3):
    """tsfresh permutation_entropy(tau=1, dimension=3): Shannon entropy
    of ordinal patterns of embedded windows."""
    x = np.asarray(x, dtype=float)
    n = len(x) - (dimension - 1) * tau
    if n <= 0:
        return np.nan
    windows = np.array([x[i : i + (dimension - 1) * tau + 1 : tau] for i in range(n)])
    perms = np.argsort(np.argsort(windows, axis=1, kind="stable"), axis=1, kind="stable")
    _, counts = np.unique(perms, axis=0, return_counts=True)
    p = counts / n
    return float(-np.sum(p * np.log(p)))


def benford_correlation(x):
    """tsfresh benford_correlation: Pearson r between the observed
    leading-digit distribution and Benford's law. Mirrors tsfresh's
    full-length normalization ``(digits == d).mean()`` — zeros count in
    the denominator but fill no digit bucket. (Pearson r is invariant
    to positive scaling of the distribution, so this provably equals
    the nonzero-count normalization; kept literal for auditability.)"""
    x = np.asarray(x, dtype=float)
    x = x[~np.isnan(x)]
    if len(x) == 0:
        return np.nan
    with np.errstate(divide="ignore", invalid="ignore"):
        digits = np.array(
            [int(str(np.format_float_scientific(v))[0]) if v != 0 else 0 for v in np.abs(x)]
        )
    benford = np.log10(1 + 1 / np.arange(1, 10))
    counts = np.array([(digits == d).sum() for d in range(1, 10)], dtype=float)
    if counts.sum() == 0:
        return np.nan
    obs = counts / len(digits)
    if np.std(obs) == 0:
        return np.nan
    return float(np.corrcoef(benford, obs)[0, 1])


def lempel_ziv_complexity(x, bins: int = 10):
    """tsfresh lempel_ziv_complexity: discretize into equal-width bins,
    count LZ76 dictionary growth, normalize by series length."""
    x = np.asarray(x, dtype=float)
    n = len(x)
    if n == 0:
        return np.nan
    # tsfresh binning: searchsorted against the UPPER bin edges
    # (linspace edges minus the first), side='left' — values exactly on
    # an interior edge go to the upper bin
    edges = np.linspace(np.min(x), np.max(x), bins + 1)[1:]
    seq = np.searchsorted(edges, x, side="left")
    subs = set()
    i, k = 0, 1
    while i + k <= n:
        word = tuple(seq[i : i + k])
        if word in subs:
            k += 1
        else:
            subs.add(word)
            i += k
            k = 1
    return float(len(subs) / n)


def energy_ratio_by_chunks(x, num_segments: int = 10, segment_focus: int = 0):
    """tsfresh energy_ratio_by_chunks: energy of chunk `segment_focus`
    over total energy (chunks via np.array_split)."""
    x = np.asarray(x, dtype=float)
    full = np.sum(x * x)
    if full == 0 or len(x) == 0:
        return np.nan
    chunk = np.array_split(x, num_segments)[segment_focus]
    return float(np.sum(chunk * chunk) / full)


def _spectral_moments(x: np.ndarray) -> tuple[float, float, float, float] | None:
    """Moments of the |rfft| magnitude spectrum over the bin index
    (tsfresh ``fft_aggregated`` family): m_k = sum(y_i * i^k) / sum(y_i).
    None when the spectrum carries no mass."""
    y = np.abs(np.fft.rfft(np.asarray(x, dtype=np.float64)))
    s = y.sum()
    if not np.isfinite(s) or s <= 0:
        return None
    i = np.arange(len(y), dtype=np.float64)
    m1 = float((y * i).sum() / s)
    m2 = float((y * i**2).sum() / s)
    m3 = float((y * i**3).sum() / s)
    m4 = float((y * i**4).sum() / s)
    return m1, m2, m3, m4


def fft_aggregated_centroid(x: np.ndarray) -> float:
    m = _spectral_moments(x)
    return np.nan if m is None else m[0]


def fft_aggregated_variance(x: np.ndarray) -> float:
    m = _spectral_moments(x)
    return np.nan if m is None else m[1] - m[0] ** 2


def fft_aggregated_skew(x: np.ndarray) -> float:
    """Standardized 3rd central moment of the spectrum:
    (m3 - 3*m1*var - m1^3) / var^1.5; NaN on a (near-)degenerate
    spectrum."""
    m = _spectral_moments(x)
    if m is None:
        return np.nan
    var = m[1] - m[0] ** 2
    if var <= 1e-12:
        return np.nan
    return (m[2] - 3 * m[0] * var - m[0] ** 3) / var**1.5


def fft_aggregated_kurtosis(x: np.ndarray) -> float:
    """(m4 - 4*m1*m3 + 6*m2*m1^2 - 3*m1^4) / var^2 (non-excess)."""
    m = _spectral_moments(x)
    if m is None:
        return np.nan
    var = m[1] - m[0] ** 2
    if var <= 1e-12:
        return np.nan
    return (m[3] - 4 * m[0] * m[2] + 6 * m[1] * m[0] ** 2 - 3 * m[0] ** 4) / var**2


ORACLES = {
    "fft_aggregated_centroid": fft_aggregated_centroid,
    "fft_aggregated_variance": fft_aggregated_variance,
    "fft_aggregated_skew": fft_aggregated_skew,
    "fft_aggregated_kurtosis": fft_aggregated_kurtosis,
    "benford_correlation": benford_correlation,
    "lempel_ziv_complexity_b10": lambda x: lempel_ziv_complexity(x, 10),
    "energy_ratio_chunk0_of10": lambda x: energy_ratio_by_chunks(x, 10, 0),
    "number_crossing_0": lambda x: number_crossing_m(x, 0.0),
    "binned_entropy_10": lambda x: binned_entropy(x, 10),
    "sample_entropy": sample_entropy,
    "permutation_entropy": permutation_entropy,
    "absolute_sum_of_changes": absolute_sum_of_changes,
    "cid_ce": cid_ce,
    "c3_lag1": lambda x: c3(x, 1),
    "time_reversal_asymmetry_lag1": lambda x: time_reversal_asymmetry(x, 1),
    "variation_coefficient": variation_coefficient,
    "number_peaks_n1": lambda x: number_peaks(x, 1),
    "number_peaks_n3": lambda x: number_peaks(x, 3),
    "mean": mean,
    "maximum": maximum,
    "minimum": minimum,
    "median": median,
    "sum_values": sum_values,
    "variance": variance,
    "standard_deviation": standard_deviation,
    "abs_energy": abs_energy,
    "root_mean_square": root_mean_square,
    "skewness": skewness,
    "kurtosis": kurtosis,
    "mean_change": mean_change,
    "mean_abs_change": mean_abs_change,
    "mean_second_derivative_central": mean_second_derivative_central,
    "quantile_q05": lambda x: quantile(x, 0.05),
    "quantile_q15": lambda x: quantile(x, 0.15),
    "quantile_q85": lambda x: quantile(x, 0.85),
    "quantile_q95": lambda x: quantile(x, 0.95),
    "ratio_beyond_r_sigma_r2": lambda x: ratio_beyond_r_sigma(x, 2),
    "ratio_beyond_r_sigma_r3": lambda x: ratio_beyond_r_sigma(x, 3),
    "autocorrelation_lag1": lambda x: autocorrelation(x, 1),
    "count_above_mean": count_above_mean,
    "count_below_mean": count_below_mean,
    "longest_strike_above_mean": longest_strike_above_mean,
    "longest_strike_below_mean": longest_strike_below_mean,
    "last_location_of_maximum": last_location_of_maximum,
    "first_location_of_maximum": first_location_of_maximum,
    "last_location_of_minimum": last_location_of_minimum,
    "first_location_of_minimum": first_location_of_minimum,
    "large_standard_deviation_r25": lambda x: large_standard_deviation(x, 0.25),
    "agg_linear_trend_slope_max_chunk3": lambda x: agg_linear_trend_slope(x, 3, "max"),
    "turn_count": lambda x: len(x),
}

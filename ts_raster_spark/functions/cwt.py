"""Ricker-wavelet CWT peak counting in pure NumPy.

tsfresh's ``number_cwt_peaks(x, n)`` is
``len(scipy.signal.find_peaks_cwt(x, widths=arange(1, n+1), wavelet=ricker))``
(reference exercises n ∈ {6, 12}: ts-raster README.md:115 and
examples/calculateFeatures.ipynb group_2). scipy is not available in
this sandbox, so this module reimplements the published algorithm
(ricker convolution → per-row relative maxima → greedy ridge-line
tracking → SNR filtering; SciPy documentation describes the defaults:
``max_distances=widths/4``, ``gap_thresh=ceil(widths[0])``,
``min_length=ceil(n_widths/4)``, ``window_size=ceil(n/20)``,
``min_snr=1``, ``noise_perc=10``) from its specification — no code is
copied. Bit-parity with scipy is best-effort; the pytest contract is
behavioral (peaky signals count peaks, flat signals count none).
"""

from __future__ import annotations

import math

import numpy as np


def ricker(points: int, a: float) -> np.ndarray:
    """Mexican-hat wavelet, same parameterization as scipy.signal.ricker."""
    A = 2 / (np.sqrt(3 * a) * np.pi**0.25)
    vec = np.arange(0, points) - (points - 1.0) / 2
    xsq = vec**2
    mod = 1 - xsq / a**2
    gauss = np.exp(-xsq / (2 * a**2))
    return A * mod * gauss


def cwt_ricker(x: np.ndarray, widths: np.ndarray) -> np.ndarray:
    """CWT matrix (len(widths), len(x)) via same-mode convolution."""
    x = np.asarray(x, dtype=np.float64)
    out = np.empty((len(widths), len(x)))
    for i, w in enumerate(widths):
        points = min(10 * int(w), len(x))
        wav = ricker(points, w)
        out[i] = np.convolve(x, wav[::-1], mode="same")
    return out


def _relative_maxima(row: np.ndarray, order: int) -> np.ndarray:
    """Indices that are >= all neighbours within ``order`` (argrelmax
    with clipped boundaries)."""
    n = len(row)
    idx = []
    for i in range(n):
        lo, hi = max(0, i - order), min(n, i + order + 1)
        seg = row[lo:hi]
        m = seg.max()
        # plateau-tolerant: leftmost achiever of a non-flat window wins
        # (even-length ricker kernels split a spike response across two
        # equal samples; strict argrelmax would drop it entirely)
        if row[i] == m and seg.min() < m and lo + int(np.argmax(seg)) == i:
            idx.append(i)
    return np.asarray(idx, dtype=np.int64)


def _identify_ridge_lines(mat: np.ndarray, max_distances: np.ndarray, gap_thresh: float):
    """Greedy bottom-up ridge tracking: start at the largest width row,
    connect each row's relative maxima to active lines within
    max_distance, retire lines after gap_thresh missed rows."""
    n_rows, _ = mat.shape
    order = 1
    has_relmax = [_relative_maxima(mat[r], order) for r in range(n_rows)]
    if len(has_relmax[-1]) == 0:
        return []
    # line = [rows, cols, gap]
    lines = [[[n_rows - 1], [c], 0] for c in has_relmax[-1]]
    final = []
    for row in range(n_rows - 2, -1, -1):
        cols = list(has_relmax[row])
        # try to attach each column to the closest active line
        new_lines = []
        for line in lines:
            line[2] += 1
        claimed: set[int] = set()
        for col in cols:
            best = None
            best_dist = max_distances[row]
            for j, line in enumerate(lines):
                if j in claimed:
                    continue
                dist = abs(col - line[1][-1])
                if dist <= best_dist:
                    best_dist = dist
                    best = j
            if best is not None:
                claimed.add(best)
                lines[best][0].append(row)
                lines[best][1].append(col)
                lines[best][2] = 0
            else:
                new_lines.append([[row], [col], 0])
        keep = []
        for line in lines:
            if line[2] > gap_thresh:
                final.append(line)
            else:
                keep.append(line)
        lines = keep + new_lines
    final.extend(lines)
    return final


def _quantize(mat: np.ndarray) -> np.ndarray:
    """Snap CWT coefficients to 11 significant digits (matrix-global
    scale).  The downstream logic is DISCRETE (relative-maxima equality
    tests, ridge attachment, SNR thresholds): last-ulp summation noise —
    which varies across CPU SIMD dispatch, i.e. across hosts between
    driver rounds — was observed to flip peak counts on ~2% of sf0.1
    conversations.  Quantizing turns every near-tie into an exact tie
    resolved by the deterministic leftmost-argmax rule, making the count
    host-stable (the checked-in golden parquet depends on this)."""
    scale = float(np.max(np.abs(mat))) if mat.size else 0.0
    if scale == 0.0 or not np.isfinite(scale):
        return mat
    q = 10.0 ** (np.floor(np.log10(scale)) - 10)
    return np.round(mat / q) * q


def find_peaks_cwt(x: np.ndarray, widths: np.ndarray) -> np.ndarray:
    x = np.asarray(x, dtype=np.float64)
    widths = np.asarray(widths)
    if len(x) == 0:
        return np.asarray([], dtype=np.int64)
    mat = _quantize(cwt_ricker(x, widths))
    max_distances = widths / 4.0
    gap_thresh = math.ceil(widths[0])
    ridges = _identify_ridge_lines(mat, max_distances, gap_thresh)

    # filtering (scipy defaults)
    min_length = math.ceil(mat.shape[0] / 4)
    window_size = math.ceil(len(x) / 20)
    hf = max(window_size // 2, 1)
    min_snr, noise_perc = 1.0, 10
    row_one = np.abs(mat[0])
    peaks = []
    for rows, cols, _gap in ridges:
        if len(rows) < min_length:
            continue
        loc = cols[np.argmin(rows)] if isinstance(cols, np.ndarray) else cols[-1]
        lo, hi = max(loc - hf, 0), min(loc + hf + 1, len(x))
        noise = np.percentile(row_one[lo:hi], noise_perc)
        signal = abs(mat[rows[0], cols[0]])
        if noise == 0:
            if signal <= 0:
                continue
        elif signal / noise < min_snr:
            continue
        peaks.append(loc)

    peaks = np.unique(np.asarray(sorted(peaks), dtype=np.int64))
    if len(peaks) == 0:
        return peaks
    # Drop boundary artifacts: an edge index that isn't even a local max
    # of the raw signal is convolution edge-effect, not a peak.
    keep = []
    for p in peaks:
        if p == 0 and len(x) > 1 and x[0] < x[1]:
            continue
        if p == len(x) - 1 and len(x) > 1 and x[-1] < x[-2]:
            continue
        keep.append(p)
    # Merge ridge near-duplicates (adjacent sample indices).
    merged: list[int] = []
    for p in keep:
        if merged and p - merged[-1] <= 1:
            continue
        merged.append(int(p))
    return np.asarray(merged, dtype=np.int64)


def number_cwt_peaks(x: np.ndarray, n: int) -> int:
    """tsfresh number_cwt_peaks(param n): peak count over widths 1..n."""
    if len(x) < 3:
        return 0
    return int(len(find_peaks_cwt(np.asarray(x, dtype=np.float64), np.arange(1, n + 1))))

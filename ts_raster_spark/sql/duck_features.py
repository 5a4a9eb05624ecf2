"""DuckDB-dialect SQL builders mirroring the engine's feature aggregates.

Each builder returns a SELECT over the ``long_panel`` CTE
(ts_raster_spark/sql/oracle_prefix.py) that reproduces
:mod:`ts_raster_spark.functions.features` semantics exactly — including
the pandas zero-variance → 0.0 convention for skew/kurt and the tsfresh
autocorrelation estimator. Used only by ``__spark_entry__.oracle_sql``;
the engine itself never runs these.
"""

from __future__ import annotations

ROUND_N = 4  # double outputs rounded identically on both sides


def sql_r4(expr: str) -> str:
    """DuckDB twin of queries.r4: 4 decimals below 1e6, else 10
    significant digits via round(x/p)*p."""
    e = f"({expr})"
    p = f"power(10, floor(log10(abs({e}))) - 9)"
    # the +1e-9 nudge mirrors queries.r4 (see its docstring); the trailing
    # + 0.0 normalizes IEEE signed zero exactly like functions/norm.r4
    return (
        f"(CASE WHEN abs({e}) >= 1000000.0 "
        f"THEN round({e} / {p} + 1e-9) * {p} "
        f"ELSE round({e} + 1e-9, {ROUND_N}) END) + 0.0"
    )


def r(expr: str, name: str) -> str:
    return f"{sql_r4(expr)} AS {name}"


# Window-attached helper columns over the rollup keys (mu/sigma/extrema/rn/lags).
def stats_cte(keys: list[str], src: str = "long_panel") -> str:
    part = ", ".join(keys)
    return f"""
stats AS (
    SELECT *,
        CASE WHEN abs(value) = 0 THEN 0
             ELSE CAST(floor(abs(value) / power(10, floor(log10(abs(value))))) AS INTEGER)
        END AS bdigit,
        avg(value) OVER (PARTITION BY {part}) AS mu,
        stddev_pop(value) OVER (PARTITION BY {part}) AS sigma,
        max(value) OVER (PARTITION BY {part}) AS vmax,
        min(value) OVER (PARTITION BY {part}) AS vmin,
        count(value) OVER (PARTITION BY {part}) AS nrows,
        row_number() OVER (PARTITION BY {part} ORDER BY turn_idx, ts) AS rn,
        lag(value, 1) OVER (PARTITION BY {part} ORDER BY turn_idx, ts) AS lag1,
        lag(value, 2) OVER (PARTITION BY {part} ORDER BY turn_idx, ts) AS lag2,
        lag(value, 3) OVER (PARTITION BY {part} ORDER BY turn_idx, ts) AS lag3,
        max(value) OVER (PARTITION BY {part} ORDER BY turn_idx, ts ROWS BETWEEN 1 PRECEDING AND 1 PRECEDING) AS maxp1,
        max(value) OVER (PARTITION BY {part} ORDER BY turn_idx, ts ROWS BETWEEN 1 FOLLOWING AND 1 FOLLOWING) AS maxf1,
        max(value) OVER (PARTITION BY {part} ORDER BY turn_idx, ts ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING) AS maxp3,
        max(value) OVER (PARTITION BY {part} ORDER BY turn_idx, ts ROWS BETWEEN 1 FOLLOWING AND 3 FOLLOWING) AS maxf3
    FROM {src}
)
"""


def _benford_sql() -> str:
    """Closed-form Benford Pearson r over the per-digit counts c_d
    (digits 1..9 from the stats CTE's ``bdigit``). Pearson r is
    scale-invariant in q, so tsfresh's full-length normalization cancels
    (functions/features.benford_agg docstring) and the twin mirrors the
    same raw-count form:
    r = (Σ p_d c_d − p̄ Σc) / (σ_p · sqrt(Σ c_d² − (Σc)²/9))."""
    import math

    p = [math.log10(1 + 1 / d) for d in range(1, 10)]
    pbar = sum(p) / 9.0
    sp = math.sqrt(sum((v - pbar) ** 2 for v in p))
    counts = [f"sum(CASE WHEN bdigit = {d} THEN 1.0 ELSE 0.0 END)" for d in range(1, 10)]
    csum = "(" + " + ".join(counts) + ")"
    spq = "(" + " + ".join(f"{p[d - 1]!r} * {counts[d - 1]}" for d in range(1, 10)) + ")"
    sq2 = "(" + " + ".join(f"{c} * {c}" for c in counts) + ")"
    ssq = f"({sq2} - {csum} * {csum} / 9.0)"
    r = f"({spq} - {pbar!r} * {csum}) / ({sp!r} * sqrt({ssq}))"
    return f"CASE WHEN {csum} > 0 AND {ssq} > 1e-20 THEN {r} END"


def _energy_ratio_sql(s: int = 10, f: int = 0) -> str:
    """np.array_split chunk f of s over rn/nrows (stats CTE)."""
    lo = f"({f} * floor(nrows / {s}) + least({f}, nrows % {s}))"
    hi = f"({lo} + floor(nrows / {s}) + CASE WHEN {f} < nrows % {s} THEN 1 ELSE 0 END)"
    chunk = f"sum(CASE WHEN rn > {lo} AND rn <= {hi} THEN value * value END)"
    return (
        f"CASE WHEN sum(value * value) > 0 "
        f"THEN coalesce({chunk}, 0.0) / sum(value * value) END"
    )



CORE_EXPRS = {
    "turn_count": "count(value)",
    "mean": "avg(value)",
    "maximum": "max(value)",
    "minimum": "min(value)",
    "sum_values": "sum(value)",
    "median": "quantile_cont(value, 0.5)",
    "variance": "var_pop(value)",
    "standard_deviation": "stddev_pop(value)",
    "abs_energy": "sum(value * value)",
    "root_mean_square": "sqrt(avg(value * value))",
    "mean_change": (
        "CASE WHEN count(value) > 1 THEN "
        "(arg_max(value, turn_idx) - arg_min(value, turn_idx)) / (count(value) - 1) END"
    ),
    "count_above_mean": "sum(CASE WHEN value > mu THEN 1 ELSE 0 END)",
    "count_below_mean": "sum(CASE WHEN value < mu THEN 1 ELSE 0 END)",
    "quantile_q05": "quantile_cont(value, 0.05)",
    "quantile_q15": "quantile_cont(value, 0.15)",
    "quantile_q85": "quantile_cont(value, 0.85)",
    "quantile_q95": "quantile_cont(value, 0.95)",
    "skewness": (
        "CASE WHEN count(value) > 2 THEN "
        "CASE WHEN var_pop(value) = 0 THEN 0.0 ELSE skewness(value) END END"
    ),
    "kurtosis": (
        "CASE WHEN count(value) > 3 THEN "
        "CASE WHEN var_pop(value) = 0 THEN 0.0 ELSE kurtosis(value) END END"
    ),
    "ratio_beyond_r_sigma_r2": "avg(CASE WHEN abs(value - mu) > 2 * sigma THEN 1.0 ELSE 0.0 END)",
    "ratio_beyond_r_sigma_r3": "avg(CASE WHEN abs(value - mu) > 3 * sigma THEN 1.0 ELSE 0.0 END)",
    # quantized-difference boundary contract (see features.large_standard_deviation_aggs)
    "large_standard_deviation_r25": (
        "CAST((CASE WHEN greatest(stddev_pop(value), 0.25 * (max(value) - min(value))) > 0 "
        "THEN round((stddev_pop(value) - 0.25 * (max(value) - min(value)))"
        " / greatest(stddev_pop(value), 0.25 * (max(value) - min(value))), 9) > 0 "
        "ELSE FALSE END) AS INTEGER)"
    ),
    "mean_abs_change": "avg(abs(value - lag1))",
    "mean_second_derivative_central": "avg((value - 2 * lag1 + lag2) / 2.0)",
    "autocorrelation_lag1": (
        "CASE WHEN count(value) > 1 AND max(sigma) > 0 THEN "
        "sum(CASE WHEN lag1 IS NOT NULL THEN (value - mu) * (lag1 - mu) END) "
        "/ ((count(value) - 1) * max(sigma * sigma)) END"
    ),
    "absolute_sum_of_changes": "coalesce(sum(abs(value - lag1)), 0.0)",
    "cid_ce": "sqrt(coalesce(sum((value - lag1) * (value - lag1)), 0.0))",
    "c3_lag1": "coalesce(avg(CASE WHEN lag2 IS NOT NULL THEN value * lag1 * lag2 END), 0.0)",
    "time_reversal_asymmetry_lag1": (
        "coalesce(avg(CASE WHEN lag2 IS NOT NULL THEN value * value * lag1 - lag1 * lag2 * lag2 END), 0.0)"
    ),
    "variation_coefficient": "CASE WHEN avg(value) != 0 THEN stddev_pop(value) / avg(value) END",
    "number_crossing_0": (
        "coalesce(sum(CASE WHEN lag1 IS NOT NULL AND ((value > 0) != (lag1 > 0)) THEN 1 ELSE 0 END), 0)"
    ),
    "number_peaks_n1": (
        "sum(CASE WHEN rn > 1 AND rn <= nrows - 1 AND value > maxp1 AND value > maxf1 THEN 1 ELSE 0 END)"
    ),
    "number_peaks_n3": (
        "sum(CASE WHEN rn > 3 AND rn <= nrows - 3 AND value > maxp3 AND value > maxf3 THEN 1 ELSE 0 END)"
    ),
    "benford_correlation": _benford_sql(),
    "energy_ratio_chunk0_of10": _energy_ratio_sql(10, 0),
    "last_location_of_maximum": "CAST(max(CASE WHEN value = vmax THEN rn END) AS DOUBLE) / count(value)",
    "first_location_of_maximum": "CAST(min(CASE WHEN value = vmax THEN rn END) - 1 AS DOUBLE) / count(value)",
    "last_location_of_minimum": "CAST(max(CASE WHEN value = vmin THEN rn END) AS DOUBLE) / count(value)",
    "first_location_of_minimum": "CAST(min(CASE WHEN value = vmin THEN rn END) - 1 AS DOUBLE) / count(value)",
}

def autocorr_sql(lag: int) -> str:
    """tsfresh autocorrelation(lag) over the stats CTE (general-lag twin
    of functions.features.autocorrelation_agg)."""
    return (
        f"CASE WHEN count(value) > {lag} AND max(sigma) > 0 THEN "
        f"sum(CASE WHEN lag{lag} IS NOT NULL THEN (value - mu) * (lag{lag} - mu) END) "
        f"/ ((count(value) - {lag}) * max(sigma * sigma)) END"
    )


INT_FEATURES = {
    "turn_count", "count_above_mean", "count_below_mean",
    "large_standard_deviation_r25", "number_peaks_n1", "number_peaks_n3",
    "number_crossing_0",
}


def feature_select(features: list[str], keys: list[str], key_exprs: list[str] | None = None) -> str:
    """SELECT list: keys + rounded feature expressions, aliased to the
    exact column names the Spark side produces."""
    cols = list(key_exprs or keys)
    for f in features:
        e = CORE_EXPRS[f]
        # CAST to BIGINT: DuckDB's sum(CASE..) promotes to HUGEINT which
        # renders as float64 in pandas; Spark emits int64 for these.
        cols.append(f"CAST(({e}) AS BIGINT) AS {f}" if f in INT_FEATURES else r(e, f))
    return ",\n        ".join(cols)

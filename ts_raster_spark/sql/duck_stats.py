"""DuckDB twin of the checkRelevance FDR tail (tsraster/calculate.py:366-423).

The Spark side (operators/ml_prep.feature_relevance_fdr) computes
Pearson r per feature in one distributed agg, then Student-t two-sided
p-values + Benjamini-Hochberg driver-side via the Lentz continued
fraction (functions/stats.py). This module reproduces the p-value in
PURE SQL so the driver's value-hash gate can attest it: the regularized
incomplete beta I_x(a, 1/2) is evaluated with the classic power series

    I_x(a,b) = x^a (1-x)^b / (a·B(a,b)) · [1 + Σ_{k>=0} T_k],
    T_0 = x(a+b)/(a+1),  T_{k+1} = T_k · x(a+b+k+1)/(a+k+2)

as a recursive CTE (DuckDB has lgamma for B), flipped through the
symmetry I_x(a,b) = 1 - I_{1-x}(b,a) on the same threshold the Python
side uses so both series converge fast. Cross-checked to <4e-13
absolute against functions/stats.pearson_p_value over a grid incl.
r ∈ {0, ±1} edge cases (tests/test_stats_fdr.py).

Note x = df/(df + t²) reduces to 1 - r² algebraically; the SQL keeps
the df/(df+t²) form to mirror the Python float arithmetic exactly.
"""

from __future__ import annotations

from ts_raster_spark.sql.duck_features import sql_r4


def pearson_fdr_sql(
    xy_cte: str,
    feature_cols: list[str],
    target: str = "y",
    alpha: float = 0.05,
) -> str:
    """Full query text: per-feature Pearson r, exact two-sided p-value,
    and the BH step-up decision at ``alpha``. ``xy_cte`` must be a CTE
    prefix (starting ``WITH``) that defines table ``xy`` with the
    feature and target columns; the prefix's leading WITH is upgraded
    to WITH RECURSIVE for the series CTE.

    Output columns: feature, pearson_r, p_value, relevant (int) —
    BH ties broken by feature name, mirroring
    functions/stats.benjamini_hochberg.
    """
    feats = "\nUNION ALL\n    ".join(
        f"SELECT '{c}' AS feature, corr({c}, {target}) AS r, "
        f"CAST(count(*) AS DOUBLE) AS n FROM xy"
        for c in feature_cols
    )
    prefix = xy_cte.replace("WITH ", "WITH RECURSIVE ", 1)
    # feats/ab MATERIALIZED: DuckDB inlines CTEs by default, so without
    # the hint every recursive-series iteration would re-evaluate the
    # whole upstream turns derivation (~100x slowdown observed)
    return f"""{prefix},
feats AS MATERIALIZED (
    {feats}
),
params AS (
    SELECT feature, r, n - 2.0 AS df,
        greatest(least(r, 1.0 - 1e-15), -1.0 + 1e-15) AS rc
    FROM feats WHERE r IS NOT NULL AND n >= 3
),
px AS (
    SELECT feature, df, df / (df + rc * rc * df / (1.0 - rc * rc)) AS x FROM params
),
ab AS MATERIALIZED (
    SELECT feature,
        CASE WHEN flip THEN 0.5 ELSE df / 2 END AS a,
        CASE WHEN flip THEN df / 2 ELSE 0.5 END AS b,
        CASE WHEN flip THEN 1.0 - x ELSE x END AS xx,
        flip
    FROM (SELECT *, x >= (df / 2 + 1.0) / (df / 2 + 0.5 + 2.0) AS flip FROM px)
),
ser AS (
    SELECT feature, 0 AS k, xx * (a + b) / (a + 1.0) AS term,
           1.0 + xx * (a + b) / (a + 1.0) AS s
    FROM ab
    UNION ALL
    SELECT ser.feature, k + 1, term * xx * (a + b + k + 1.0) / (a + k + 2.0),
           s + term * xx * (a + b + k + 1.0) / (a + k + 2.0)
    FROM ser JOIN ab USING (feature)
    WHERE term > 1e-17 * s AND k < 10000
),
sfinal AS (SELECT feature, arg_max(s, k) AS s FROM ser GROUP BY feature),
pv AS (
    SELECT ab.feature,
        CASE
          WHEN xx <= 0.0 THEN (CASE WHEN flip THEN 1.0 ELSE 0.0 END)
          WHEN xx >= 1.0 THEN (CASE WHEN flip THEN 0.0 ELSE 1.0 END)
          WHEN flip THEN 1.0 - exp(a * ln(xx) + b * ln(1.0 - xx)
                                   + lgamma(a + b) - lgamma(a) - lgamma(b)) / a * s
          ELSE exp(a * ln(xx) + b * ln(1.0 - xx)
                   + lgamma(a + b) - lgamma(a) - lgamma(b)) / a * s
        END AS p_value
    FROM ab JOIN sfinal USING (feature)
),
allp AS (
    SELECT f.feature, f.r AS pearson_r, pv.p_value
    FROM feats f LEFT JOIN pv USING (feature)
),
ranked AS (
    SELECT feature, p_value,
        row_number() OVER (ORDER BY p_value, feature) AS i,
        count(*) OVER () AS m
    FROM allp WHERE p_value IS NOT NULL
),
cut AS (
    SELECT coalesce(max(CASE WHEN p_value <= {alpha!r} * i / m THEN i END), 0) AS kcut
    FROM ranked
)
SELECT a.feature,
    {sql_r4('a.pearson_r')} AS pearson_r,
    {sql_r4('a.p_value')} AS p_value,
    CASE WHEN rk.i IS NOT NULL AND rk.i <= c.kcut THEN 1 ELSE 0 END AS relevant
FROM allp a LEFT JOIN ranked rk USING (feature) CROSS JOIN cut c
"""

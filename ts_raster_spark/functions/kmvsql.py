"""Engine-neutral SQL builders for the KMV (k-minimum-values) distinct
sketch (Bar-Yossef et al. 2002; Beyer et al. SIGMOD 2007, public). The
SAME text executes in Spark (F.expr) and DuckDB (oracle), so every
estimate is bit-replayable cross-engine — the KMV queries get EXACT
twins, not claim-style oracles.

Scheme: h = md5(entity) hex string; the sketch is the k
lexicographically-smallest distinct h per group (lowercase-hex compare
orders identically in both engines). ``fraction(h)`` maps h into
(0, 1] via its first 12 hex nibbles — 48 bits, exact in double in any
engine (the +1 offset avoids a zero divisor; relative bias 16^-12,
far below the r4 normalization quantum).

Estimators (k'th-smallest-value form):
- distinct:     D = n            if n < k   (sketch IS the set)
                D = (k-1)/v_k    otherwise  (v_k = max fraction kept)
- intersection: over K = k smallest of A ∪ B (mergeable: k smallest
  of the sketch union), membership of x ∈ K in A is decidable from
  sketch(A) alone — x ∈ A implies x is among A's k smallest because
  every smaller element of A is also in the union. So
  |A ∩ B| ≈ (|{x ∈ K : x ∈ both sketches}| / |K|) · D(A ∪ B),
  exact when |K| < k.
"""

from __future__ import annotations

from ts_raster_spark.functions.hllsql import md5_expr  # shared spelling

__all__ = ["md5_expr", "fraction_expr", "distinct_est_expr", "scaled_est_expr"]

_DENOM = 16 ** 12


def fraction_expr(md5_col: str) -> str:
    """(0, 1] fraction from the first 12 hex nibbles of an md5 hex
    column (compute the md5 ONCE into a column/CTE first)."""
    terms = [
        f"(CAST(instr('0123456789abcdef', substr({md5_col}, {i + 1}, 1)) - 1 AS BIGINT)"
        f" * {16 ** (11 - i)})"
        for i in range(12)
    ]
    total = "(" + " + ".join(terms) + ")"
    return f"(CAST({total} + 1 AS DOUBLE) / {_DENOM})"


def distinct_est_expr(n_sql: str, vmax_sql: str, k: int) -> str:
    """KMV distinct estimate from (count kept, max fraction kept)."""
    return (
        f"(CASE WHEN {n_sql} < {k} THEN CAST({n_sql} AS DOUBLE) "
        f"ELSE {k - 1} / {vmax_sql} END)"
    )


def scaled_est_expr(n_hit_sql: str, n_kept_sql: str, union_est_sql: str) -> str:
    """Subset estimate over the union's K set: (hits/|K|) * D(union).
    Exact when |K| saturated below k (then union_est == |K| and the
    ratio is the true fraction)."""
    return (
        f"(CASE WHEN {n_kept_sql} = 0 THEN 0.0 "
        f"ELSE CAST({n_hit_sql} AS DOUBLE) / {n_kept_sql} * {union_est_sql} END)"
    )

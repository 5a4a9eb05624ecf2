"""Engine-neutral SQL expression builders for the HyperLogLog sketch
(Flajolet et al. 2007, public). The SAME text is executed by Spark
(via F.expr) and DuckDB (in the oracle), so the register computation is
in lockstep by construction — the only cross-engine freedom left is
floating-point summation order in the estimator, absorbed by the r4
normalization contract.

Scheme: h = first 8 hex chars of md5(entity) → 32-bit integer;
``bucket`` = low P bits (h mod 2^P), ``w`` = remaining W_BITS bits,
``rho(w)`` = leading zeros of the W_BITS-bit word + 1 (= W_BITS + 1 -
bitlength(w)). Register[bucket] = max rho. Registers merge across
tiers / partitions with MAX — the property that makes the sketch a
one-pass, 2^P-rows-per-group distinct counter at 100 TB.

Everything is integer CASE/compare arithmetic — no log2/bin() calls
whose edge behavior could differ between engines.
"""

from __future__ import annotations

P = 8
M = 1 << P  # 256 registers
W_BITS = 32 - P  # 24
ALPHA = 0.7213 / (1 + 1.079 / M)  # standard bias constant for m >= 128


def md5_expr(entity_sql: str) -> str:
    # STRING, not VARCHAR: Spark 4 requires a length on VARCHAR, and
    # DuckDB accepts STRING as a VARCHAR alias — the one spelling both
    # engines parse
    return f"md5(CAST({entity_sql} AS STRING))"


def hash32_expr(md5_col: str) -> str:
    """32-bit integer from the first 8 hex nibbles of an md5 hex column
    (compute the md5 ONCE into a column/CTE first — this expression
    reads it 8 times)."""
    terms = [
        # BIGINT per term: Spark runs ANSI mode and instr() is INT —
        # the high-nibble multiply overflows int32 otherwise
        f"(CAST(instr('0123456789abcdef', substr({md5_col}, {i + 1}, 1)) - 1 AS BIGINT)"
        f" * {16 ** (7 - i)})"
        for i in range(8)
    ]
    return "(" + " + ".join(terms) + ")"


def bucket_expr(h32_sql: str) -> str:
    return f"CAST({h32_sql} % {M} AS INTEGER)"


def w_expr(h32_sql: str) -> str:
    # exact high-bits extraction without engine-specific integer
    # division: (v - v mod m) / m is integral and < 2^24, exact in
    # double arithmetic in any engine
    return f"CAST(({h32_sql} - ({h32_sql} % {M})) / {M} AS BIGINT)"


def rho_expr(w_sql: str) -> str:
    """W_BITS + 1 - bitlength(w); w = 0 → W_BITS + 1."""
    branches = " ".join(
        f"WHEN {w_sql} >= {1 << (k - 1)} THEN {W_BITS + 1 - k}"
        for k in range(W_BITS, 0, -1)
    )
    return f"(CASE {branches} ELSE {W_BITS + 1} END)"


def estimate_expr(n_present_sql: str, sum_inv_sql: str) -> str:
    """HLL estimator over aggregated registers: raw harmonic-mean
    estimate with the standard small-range (linear counting) switch.
    Absent registers (M - n_present of them) contribute 2^0 = 1 to the
    denominator, so no dense register scaffold is materialized."""
    denom = f"(({M} - {n_present_sql}) + {sum_inv_sql})"
    # CAST .. AS DOUBLE: DuckDB types a bare float literal DECIMAL(18)
    # and overflows multiplying it by M^2; Spark parses the cast too
    e_raw = f"(CAST({ALPHA!r} AS DOUBLE) * {M * M} / {denom})"
    return (
        f"(CASE WHEN {n_present_sql} < {M} AND {e_raw} <= {2.5 * M} "
        f"THEN {M} * ln({M}.0 / ({M} - {n_present_sql})) "
        f"ELSE {e_raw} END)"
    )

"""The cross-engine normalization contract for driver-facing doubles.

Rounding alone cannot make two engines agree: aggregates of
few-decimal inputs land within 1 ulp of the 4th-decimal half-boundary,
and the engines' last bits differ. The contract is therefore
``round(x + 1e-9, 4)`` (nudge ≫ cross-engine error ~1e-12, ≪ quantum
1e-4) with a 10-significant-digit cap for |x| ≥ 1e6 where fixed
decimals cannot absorb the ulp. ``sql_r4`` in sql/duck_features.py and
the ``oracle_sql()`` post-pass apply the identical transform on the
DuckDB side.
"""

from __future__ import annotations

from pyspark.sql import functions as F

ROUND_N = 4
NUDGE = 1e-9


def r4(c: F.Column) -> F.Column:
    absx = F.abs(c)
    p = F.pow(F.lit(10.0), F.floor(F.log10(absx)) - 9)
    big = F.round(c / p + NUDGE) * p
    out = F.when(absx >= 1e6, big).otherwise(F.round(c + NUDGE, ROUND_N))
    # + 0.0 normalizes IEEE signed zero (-0.0 + 0.0 == +0.0): engines
    # disagree on the sign of a zero-rounding residual, not its value.
    return out + F.lit(0.0)

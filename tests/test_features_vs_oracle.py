"""Every native feature aggregate vs the pandas/NumPy tsfresh oracle.

Mirrors the reference's per-calculator expectations
(tsraster/tests/calculateFeatures.py:9-19 exercises the named set;
README.md:105-118 documents the semantics) but *asserted*, which the
reference never does (its only unittest body is ``pass``,
tests/tests.py:7-12).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest

from ts_raster_spark.functions import oracle as ORC
from ts_raster_spark.functions import features as FT
from ts_raster_spark.operators.longform import to_long_panel
from ts_raster_spark.operators.rollup import rollup_features

# Edge-case series from FIXTURES.md F1: single turn, constant channel,
# plus generic seeded series.
SERIES = {
    "single": [5.0],
    "pair": [1.0, 4.0],
    "constant": [3.0] * 8,
    "ramp": list(range(10)),
    "seeded": list(np.random.RandomState(42).normal(10, 4, 37)),
    "spiky": [0.0, 0.0, 9.0, 0.0, 0.0, -7.0, 0.0, 30.0, 0.0],
}


@pytest.fixture(scope="module")
def wide(spark):
    rows = []
    for name, xs in SERIES.items():
        for i, v in enumerate(xs):
            rows.append(
                (name, i, (pd.Timestamp("2024-01-01") + pd.Timedelta(seconds=30 * i)).to_pydatetime(), "chan", float(v))
            )
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, ts timestamp, kind string, value double")
    out = rollup_features(df, tier=None, include_strikes=True, include_trend=True, include_entropy=True)
    pdf = out.toPandas().set_index("conv_id")
    return pdf


@pytest.mark.parametrize("feature", sorted(ORC.ORACLES))
@pytest.mark.parametrize("series", sorted(SERIES))
def test_feature_matches_oracle(wide, feature, series):
    if feature not in wide.columns:
        pytest.skip(f"{feature} not produced by native rollup")
    got = wide.loc[series, feature]
    exp = ORC.ORACLES[feature](np.asarray(SERIES[series], dtype=float))
    if exp is None or (isinstance(exp, float) and math.isnan(exp)):
        assert got is None or (isinstance(got, float) and math.isnan(got)), (
            f"{feature}[{series}]: expected NaN/None, got {got}"
        )
        return
    assert got == pytest.approx(exp, rel=1e-9, abs=1e-9), f"{feature}[{series}]"


def test_long_panel_channels(spark, turns_small):
    long_df = to_long_panel(turns_small)
    kinds = {r[0] for r in long_df.select("kind").distinct().collect()}
    assert {"text_len", "latency_s", "is_tool", "role_user", "role_assistant"} <= kinds
    # latency channel has n-1 rows per conversation
    tc = turns_small.groupBy("conv_id").count().toPandas().set_index("conv_id")["count"]
    lc = (
        long_df.where("kind = 'latency_s'")
        .groupBy("conv_id")
        .count()
        .toPandas()
        .set_index("conv_id")["count"]
    )
    for cid, n in tc.items():
        got = int(lc.get(cid, 0))
        assert got == max(int(n) - 1, 0), cid


def test_ordering_invariant(spark, turns_small):
    """Per-turn text equality under stable (turn_idx, ts) ordering after
    a shuffle (the prep.py:136 stable-sort contract recast)."""
    shuffled = turns_small.repartition(13, "text")
    a = (
        turns_small.orderBy("conv_id", "turn_idx", "ts")
        .select("conv_id", "turn_idx", "text")
        .toPandas()
    )
    b = (
        shuffled.orderBy("conv_id", "turn_idx", "ts")
        .select("conv_id", "turn_idx", "text")
        .toPandas()
    )
    pd.testing.assert_frame_equal(a, b)

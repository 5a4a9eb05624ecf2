from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from ts_raster_spark.operators.cascade import cascade_up
from ts_raster_spark.operators.gapfill import SENTINEL, gapfill
from ts_raster_spark.operators.longform import to_long_panel
from ts_raster_spark.operators.mask import check_mask, mask_df, unmask_df
from ts_raster_spark.operators.rollup import rollup_simple


@pytest.fixture(scope="module")
def points(spark):
    rows = [
        # conv A: observed minutes 0, 3, 4 -> gaps at 1, 2
        ("A", "k", "2024-01-01 00:00:00", 10.0),
        ("A", "k", "2024-01-01 00:03:00", 40.0),
        ("A", "k", "2024-01-01 00:04:00", 20.0),
        # conv B: single point (degenerate grid)
        ("B", "k", "2024-01-01 09:30:00", 7.0),
    ]
    df = spark.createDataFrame(rows, "conv_id string, kind string, b string, value double")
    return df.select("conv_id", "kind", F.col("b").cast("timestamp").alias("bucket_start"), "value")


def _by_bucket(pdf, conv):
    sub = pdf[pdf.conv_id == conv].sort_values("bucket_start")
    return list(sub["value"])


def test_gapfill_locf(points):
    out = gapfill(points, "minute", "locf").toPandas()
    assert _by_bucket(out, "A") == [10.0, 10.0, 10.0, 40.0, 20.0]
    assert _by_bucket(out, "B") == [7.0]


def test_gapfill_linear(points):
    out = gapfill(points, "minute", "linear").toPandas()
    assert _by_bucket(out, "A") == [10.0, 20.0, 30.0, 40.0, 20.0]


def test_gapfill_sentinel(points):
    out = gapfill(points, "minute", "sentinel").toPandas()
    assert _by_bucket(out, "A") == [10.0, SENTINEL, SENTINEL, 40.0, 20.0]


def test_mask_unmask_roundtrip(spark, turns_small):
    ids = [r[0] for r in turns_small.select("conv_id").distinct().collect()]
    keep = {cid: int(i % 2 == 0) for i, cid in enumerate(sorted(ids))}
    mask = spark.createDataFrame(list(keep.items()), "conv_id string, keep int")
    masked = mask_df(turns_small, mask)
    got_ids = {r[0] for r in masked.select("conv_id").distinct().collect()}
    assert got_ids == {c for c, k in keep.items() if k == 1}
    check_mask(turns_small, mask)

    # unmask: re-expand per-conv counts onto the full domain with sentinel
    counts = masked.groupBy("conv_id").agg(F.count("*").cast("double").alias("n"))
    full = unmask_df(counts, turns_small, ["conv_id"], ["n"])
    pdf = full.toPandas().set_index("conv_id")["n"]
    assert set(pdf.index) == set(ids)
    for cid in ids:
        if keep[cid]:
            assert pdf[cid] > 0
        else:
            assert pdf[cid] == SENTINEL


def test_cascade_hour_equals_direct(spark, turns_small):
    """Tier algebra: hour tier from minute tier == hour tier from raw
    (SURVEY.md §5 item 7)."""
    long_df = to_long_panel(turns_small)
    minute = rollup_simple(long_df, "minute")
    via_cascade = cascade_up(minute, "hour").drop("mean", "variance")
    direct = rollup_simple(long_df, "hour").withColumnRenamed("sum_squares", "sum_squares")
    a = via_cascade.orderBy("conv_id", "kind", "bucket_start").toPandas()
    b = direct.orderBy("conv_id", "kind", "bucket_start").toPandas()
    b = b[a.columns]
    pd.testing.assert_frame_equal(a.reset_index(drop=True), b.reset_index(drop=True), rtol=1e-12)


def test_cascade_day_mean_variance(spark, turns_small):
    long_df = to_long_panel(turns_small).where("kind = 'text_len'")
    minute = rollup_simple(long_df, "minute")
    day = cascade_up(cascade_up(minute, "hour"), "day").toPandas()
    raw = long_df.withColumn("bucket_start", F.date_trunc("day", F.col("ts"))).toPandas()
    for _, row in day.iterrows():
        sub = raw[(raw.conv_id == row.conv_id) & (raw.bucket_start == row.bucket_start)]["value"]
        assert row["mean"] == pytest.approx(sub.mean(), rel=1e-9)
        assert row["variance"] == pytest.approx(np.var(sub), rel=1e-6, abs=1e-9)


def test_tier_algebra_classification_is_exhaustive():
    """Every column the flagship rollup can emit (39 aggregate features
    + strike/trend/entropy extras + the kernel CWT peaks) must be
    classified as either cascaded-exact (sufficient statistics) or
    recompute-from-finest — a new calculator cannot land unclassified."""
    from ts_raster_spark.functions.features import default_feature_aggs
    from ts_raster_spark.operators.cascade import (
        ALGEBRAIC_FROM_SUFFICIENT_STATS,
        RECOMPUTE_FROM_FINEST,
    )

    emitted = set(default_feature_aggs()) | {
        "longest_strike_above_mean", "longest_strike_below_mean",
        "agg_linear_trend_slope_max_chunk3", "binned_entropy_10",
        "number_cwt_peaks_n6", "number_cwt_peaks_n12",
    }
    classified = ALGEBRAIC_FROM_SUFFICIENT_STATS | RECOMPUTE_FROM_FINEST
    assert emitted <= classified, emitted - classified
    assert not (ALGEBRAIC_FROM_SUFFICIENT_STATS & RECOMPUTE_FROM_FINEST)


def test_algebraic_features_derive_exactly_from_cascade(spark, turns_small):
    """Proof-by-construction for the ALGEBRAIC set: hour-tier features
    derived from the minute-tier sufficient statistics equal the same
    features computed directly from raw."""
    import numpy as np

    from ts_raster_spark.operators.cascade import (
        ALGEBRAIC_FROM_SUFFICIENT_STATS,
        cascade_up,
        derive_algebraic_features,
    )
    from ts_raster_spark.operators.longform import to_long_panel
    from ts_raster_spark.operators.rollup import rollup_features, rollup_simple

    long_df = to_long_panel(turns_small).where(F.col("kind") == "text_len")
    keys = ["conv_id", "kind", "bucket_start"]
    cols = sorted(ALGEBRAIC_FROM_SUFFICIENT_STATS)

    derived = (
        derive_algebraic_features(cascade_up(rollup_simple(long_df, "minute"), "hour"))
        .toPandas().set_index(keys).sort_index()[cols]
    )
    direct = (
        rollup_features(long_df, tier="hour", feature_names=cols)
        .toPandas().set_index(keys).sort_index()[cols]
    )
    assert len(derived) == len(direct) > 0
    for c in cols:
        a = derived[c].to_numpy(dtype=float)
        b = direct[c].to_numpy(dtype=float)
        # variation_coefficient is NULL on zero mean in both paths
        mask = ~(np.isnan(a) & np.isnan(b))
        assert np.allclose(a[mask], b[mask], rtol=1e-9, atol=1e-9), c

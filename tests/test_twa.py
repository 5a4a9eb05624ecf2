from __future__ import annotations

import datetime as dt

import pytest

from ts_raster_spark.operators.asof import time_weighted_avg_hour


def test_twa_hand_computed(spark):
    # one conv, one hour bucket 10:00-11:00:
    #   v=10 holds 10:00->10:30 (first obs back-fills to bucket start)
    #   v=20 holds 10:30->11:00
    rows = [
        ("c", 0, dt.datetime(2024, 1, 1, 10, 10), "k", 10.0),
        ("c", 1, dt.datetime(2024, 1, 1, 10, 30), "k", 20.0),
    ]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, ts timestamp, kind string, value double")
    out = time_weighted_avg_hour(df).toPandas()
    assert len(out) == 1
    assert out.iloc[0]["twa"] == pytest.approx(15.0)
    assert out.iloc[0]["n_obs"] == 2


def test_twa_cross_bucket_single_obs(spark):
    # obs at 10:50 holds to 11:00 (bucket end); next obs in NEXT bucket
    rows = [
        ("c", 0, dt.datetime(2024, 1, 1, 10, 50), "k", 6.0),
        ("c", 1, dt.datetime(2024, 1, 1, 11, 20), "k", 12.0),
    ]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, ts timestamp, kind string, value double")
    out = time_weighted_avg_hour(df).toPandas().set_index("bucket_start")
    assert out.loc[dt.datetime(2024, 1, 1, 10), "twa"] == pytest.approx(6.0)
    assert out.loc[dt.datetime(2024, 1, 1, 11), "twa"] == pytest.approx(12.0)

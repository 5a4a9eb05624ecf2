"""Banded interval join: pair-set parity vs direct range join + plan shape."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from ts_raster_spark.operators.intervals import interval_join


@pytest.fixture(scope="module")
def data(spark):
    base = dt.datetime(2024, 6, 1)
    pts = [
        ("p%03d" % i, base + dt.timedelta(minutes=7 * i)) for i in range(200)
    ]
    points = spark.createDataFrame(pts, "pid string, ts timestamp")
    ivs = [
        # long, short, sub-bucket, bucket-straddling, empty, duplicate-cover
        ("long", base + dt.timedelta(hours=1), base + dt.timedelta(hours=9)),
        ("short", base + dt.timedelta(hours=2, minutes=10), base + dt.timedelta(hours=2, minutes=40)),
        ("straddle", base + dt.timedelta(hours=3, minutes=50), base + dt.timedelta(hours=4, minutes=10)),
        ("empty", base + dt.timedelta(hours=5), base + dt.timedelta(hours=5)),
        ("cover", base + dt.timedelta(hours=2), base + dt.timedelta(hours=3)),
    ]
    intervals = spark.createDataFrame(ivs, "iid string, start timestamp, end timestamp")
    return points, intervals


def _pairs(df):
    return {(r.pid, r.iid) for r in df.select("pid", "iid").collect()}


def test_matches_direct_range_join(data):
    points, intervals = data
    got = interval_join(points, intervals, bucket_seconds=3600)
    want = points.join(
        intervals,
        (points.ts >= intervals.start) & (points.ts < intervals.end),
    )
    assert _pairs(got) == _pairs(want)
    # overlapping intervals: a point inside both 'long' and 'cover'
    # appears once per interval, never duplicated within one
    pdf = got.groupBy("pid", "iid").count().where("count > 1")
    assert pdf.count() == 0


def test_bucket_width_invariance(data):
    points, intervals = data
    a = _pairs(interval_join(points, intervals, bucket_seconds=3600))
    b = _pairs(interval_join(points, intervals, bucket_seconds=900))
    c = _pairs(interval_join(points, intervals, bucket_seconds=86400))
    assert a == b == c


def test_left_join_keeps_unmatched(data):
    points, intervals = data
    out = interval_join(points, intervals, how="left")
    assert out.count() >= points.count()
    assert out.where(F.col("iid").isNull()).count() > 0


def test_no_nested_loop_in_plan(data):
    points, intervals = data
    plan = interval_join(points, intervals)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan

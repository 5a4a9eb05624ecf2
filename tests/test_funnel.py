"""Funnel semantics: first-occurrence, strict order, drop-off."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from ts_raster_spark.operators.funnel import funnel_summary, funnel_times


def _ts(m):
    return dt.datetime(2024, 1, 1, 0, m)


@pytest.fixture(scope="module")
def events(spark):
    rows = [
        # full conversion, in order
        ("full", "a", _ts(0)), ("full", "b", _ts(5)), ("full", "c", _ts(9)),
        # b before a: step2 must use the b AFTER a (minute 20, not 1)
        ("late_b", "b", _ts(1)), ("late_b", "a", _ts(2)), ("late_b", "b", _ts(20)),
        # stops at step 2
        ("partial", "a", _ts(0)), ("partial", "b", _ts(3)),
        # never starts (b,c only) — excluded entirely
        ("nostart", "b", _ts(0)), ("nostart", "c", _ts(1)),
        # same-timestamp: step2 at EXACTLY t1 is NOT strictly after
        ("tie", "a", _ts(7)), ("tie", "b", _ts(7)),
    ]
    return spark.createDataFrame(rows, "conv_id string, ev string, ts timestamp")


def _steps():
    return [("a", F.col("ev") == "a"), ("b", F.col("ev") == "b"),
            ("c", F.col("ev") == "c")]


def test_funnel_times_semantics(events):
    got = {r.conv_id: r for r in funnel_times(events, _steps()).collect()}
    assert set(got) == {"full", "late_b", "partial", "tie"}
    assert got["full"].t_2 == _ts(5) and got["full"].t_3 == _ts(9)
    assert got["late_b"].t_2 == _ts(20)  # not the b before a
    assert got["partial"].t_2 == _ts(3) and got["partial"].t_3 is None
    assert got["tie"].t_2 is None  # strict >


def test_funnel_summary_dropoff(events):
    times = funnel_times(events, _steps())
    s = {r.step: r for r in funnel_summary(times, ["a", "b", "c"]).collect()}
    assert s[1].n_converted == 4
    assert s[2].n_converted == 3
    assert s[3].n_converted == 1
    assert s[1].median_secs_from_start is None
    # medians of (5, 18, 3) minutes from start for step 2
    assert s[2].median_secs_from_start == pytest.approx(5 * 60, abs=1e-6)
    assert s[3].median_secs_from_start == pytest.approx(9 * 60, abs=1e-6)

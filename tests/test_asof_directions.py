"""Directional/tolerance semantics of the generalized as-of join."""

from __future__ import annotations

import datetime as dt

from ts_raster_spark.operators.asof import asof_join


def _mk(spark):
    t0 = dt.datetime(2024, 5, 1, 12, 0, 0)
    left = spark.createDataFrame(
        [("c", i, t0 + dt.timedelta(seconds=60 * i)) for i in range(5)],
        "conv_id string, turn_idx int, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            ("c", t0 + dt.timedelta(seconds=90), 1.0),   # 12:01:30
            ("c", t0 + dt.timedelta(seconds=230), 2.0),  # 12:03:50
        ],
        "conv_id string, rts timestamp, v double",
    )
    return left, right


def test_forward_picks_next_and_tolerance_nulls(spark):
    left, right = _mk(spark)
    out = {
        r["turn_idx"]: r["v"]
        for r in asof_join(
            left, right, "conv_id", "ts", "rts", ["v"], "forward", tolerance_s=100.0
        ).collect()
    }
    # turn 0 (12:00) -> next right 12:01:30, 90 s away -> 1.0
    # turn 1 (12:01) -> 12:01:30, 30 s -> 1.0
    # turn 2 (12:02) -> 12:03:50, 110 s away -> beyond tolerance -> None
    # turn 3 (12:03) -> 12:03:50, 50 s -> 2.0
    # turn 4 (12:04) -> nothing after -> None
    assert out == {0: 1.0, 1: 1.0, 2: None, 3: 2.0, 4: None}


def test_backward_with_tolerance(spark):
    left, right = _mk(spark)
    out = {
        r["turn_idx"]: r["v"]
        for r in asof_join(
            left, right, "conv_id", "ts", "rts", ["v"], "backward", tolerance_s=100.0
        ).collect()
    }
    # turn 0,1: nothing at-or-before; turn 2 (12:02) <- 12:01:30 (30 s) = 1.0
    # turn 3 (12:03) <- 12:01:30 is 90 s -> 1.0; turn 4 (12:04) <- 12:03:50 (10 s) = 2.0
    assert out == {0: None, 1: None, 2: 1.0, 3: 1.0, 4: 2.0}


def test_equal_timestamp_matches_both_directions(spark):
    t0 = dt.datetime(2024, 5, 1, 12, 0, 0)
    left = spark.createDataFrame([("c", 0, t0)], "conv_id string, turn_idx int, ts timestamp")
    right = spark.createDataFrame([("c", t0, 7.0)], "conv_id string, rts timestamp, v double")
    for direction in ("backward", "forward"):
        got = asof_join(left, right, "conv_id", "ts", "rts", ["v"], direction).collect()
        assert got[0]["v"] == 7.0, direction


def test_right_timestamp_ties_are_deterministic(spark):
    """Two right rows at the SAME ts: forward resolves to the smallest
    value tuple, backward to the largest (total window order)."""
    t0 = dt.datetime(2024, 5, 1, 12, 0, 0)
    left = spark.createDataFrame(
        [("c", 0, t0 - dt.timedelta(seconds=10)), ("c", 1, t0 + dt.timedelta(seconds=10))],
        "conv_id string, turn_idx int, ts timestamp",
    )
    right = spark.createDataFrame(
        [("c", t0, 5.0), ("c", t0, 3.0)], "conv_id string, rts timestamp, v double"
    ).repartition(4)  # scatter so layout could otherwise leak into the pick
    fwd = {r["turn_idx"]: r["v"] for r in asof_join(
        left, right, "conv_id", "ts", "rts", ["v"], "forward").collect()}
    bwd = {r["turn_idx"]: r["v"] for r in asof_join(
        left, right, "conv_id", "ts", "rts", ["v"], "backward").collect()}
    assert fwd[0] == 3.0  # first right row in total order
    assert bwd[1] == 5.0  # last right row in total order


def test_null_value_in_matched_row_attaches_as_null(spark):
    """Round-4 fix (r3 advisor): a NULL value column in the MATCHED
    right row must attach as NULL (merge_asof semantics), not be
    back-filled from a farther row by a per-column ignorenulls pick —
    and the tolerance gate must judge the same row the values came
    from."""
    t0 = dt.datetime(2024, 5, 1, 12, 0, 0)
    left = spark.createDataFrame(
        [("c", 0, t0 + dt.timedelta(seconds=100))],
        "conv_id string, turn_idx int, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            ("c", t0, 1.0, 10.0),                            # farther row, both cols set
            ("c", t0 + dt.timedelta(seconds=90), 2.0, None),  # nearest row, b is NULL
        ],
        "conv_id string, rts timestamp, a double, b double",
    )
    got = asof_join(left, right, "conv_id", "ts", "rts", ["a", "b"], "backward").collect()[0]
    assert got["a"] == 2.0
    assert got["b"] is None  # NOT 10.0 from the farther row
    # with a tolerance that admits the nearest row but not the farther
    # one, values still come from the nearest row only
    got_tol = asof_join(
        left, right, "conv_id", "ts", "rts", ["a", "b"], "backward", tolerance_s=30.0
    ).collect()[0]
    assert got_tol["a"] == 2.0 and got_tol["b"] is None

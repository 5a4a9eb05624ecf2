from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from ts_raster_spark.sources.turns import TURNS_SCHEMA
from ts_raster_spark.streaming.gapfill_stream import stream_locf_minute
from ts_raster_spark.streaming.rollup_stream import run_to_memory, stream_turns


def _t(minute, second=0):
    return dt.datetime(2024, 1, 1, 10, minute, second)


def test_stream_locf_fills_gaps(spark, tmp_path):
    rows = [
        ("c1", 0, "user", "aa", None, _t(0)),        # bucket 10:00, value 2
        ("c1", 1, "assistant", "bbbb", None, _t(3)), # 10:03 -> fills 10:01,10:02 with 2
        ("c1", 2, "user", "cccccc", None, _t(4)),    # adjacent bucket, no fill
    ]
    d = str(tmp_path / "in")
    spark.createDataFrame(rows, TURNS_SCHEMA).coalesce(1).write.parquet(d)
    out = stream_locf_minute(stream_turns(spark, d))
    run_to_memory(out, "locf_stream_t", output_mode="append")
    got = spark.table("locf_stream_t").orderBy("bucket_start").toPandas()

    assert list(got["bucket_start"]) == [_t(0), _t(1), _t(2), _t(3), _t(4)]
    assert list(got["value"]) == [2.0, 2.0, 2.0, 4.0, 6.0]
    assert list(got["filled"]) == [0, 1, 1, 0, 0]


def test_stream_locf_state_spans_microbatches(spark, tmp_path, turns_small):
    """State carries across micro-batches: with maxFilesPerTrigger=1 the
    emitted observed buckets must equal the batch minute rollup's last
    observation per bucket."""
    d = str(tmp_path / "in2")
    one_conv = turns_small.where(F.col("conv_id") == turns_small.first()["conv_id"])
    one_conv.repartition(3).write.parquet(d)
    out = stream_locf_minute(stream_turns(spark, d, max_files_per_trigger=1))
    run_to_memory(out, "locf_stream_t2", output_mode="append")
    got = spark.table("locf_stream_t2")

    observed = got.where("filled = 0").count()
    batch_buckets = (
        one_conv.select(F.date_trunc("minute", "ts").alias("b")).distinct().count()
    )
    # every observed bucket appears at least once (re-emissions update)
    assert observed >= batch_buckets
    assert got.where("filled = 1").count() >= 0
    # filled rows never precede an observation for the conversation
    first_obs = got.where("filled = 0").agg(F.min("bucket_start")).first()[0]
    first_fill = got.where("filled = 1").agg(F.min("bucket_start")).first()[0]
    if first_fill is not None:
        assert first_fill > first_obs


def test_stream_locf_out_of_order_event_time(spark, tmp_path):
    """A turn whose ts regresses must emit a correction row without
    rewinding locf state or duplicating already-emitted buckets."""
    rows = [
        ("c2", 0, "user", "aa", None, _t(0)),
        ("c2", 1, "assistant", "bbbb", None, _t(4)),   # fills 1,2,3
        ("c2", 2, "user", "cc", None, _t(2)),          # OUT OF ORDER
        ("c2", 3, "assistant", "dddddd", None, _t(5)),
    ]
    d = str(tmp_path / "in3")
    spark.createDataFrame(rows, TURNS_SCHEMA).coalesce(1).write.parquet(d)
    out = stream_locf_minute(stream_turns(spark, d))
    run_to_memory(out, "locf_stream_t3", output_mode="append")
    got = spark.table("locf_stream_t3").orderBy("bucket_start", "filled").toPandas()
    # bucket 10:02 appears twice: once filled (from the gap), once as the
    # late correction; no bucket is lost and 10:05 still observed
    b2 = got[got.bucket_start == _t(2)]
    assert set(b2["filled"]) == {0, 1}
    assert (got[got.bucket_start == _t(4)]["value"] == 4.0).all()
    assert (got[got.bucket_start == _t(5)]["value"] == 6.0).all()
    assert _t(3) in set(got["bucket_start"])

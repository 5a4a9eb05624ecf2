from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ts_raster_spark.streaming.rollup_stream import (
    run_to_memory,
    stateful_turn_counter,
    stream_rollup,
    stream_turns,
)


@pytest.fixture(scope="module")
def turns_dir(spark, turns_small, tmp_path_factory):
    """Finite file-source backlog: turns split over 3 files (micro-batch
    boundaries when maxFilesPerTrigger=1)."""
    d = str(tmp_path_factory.mktemp("stream_in"))
    turns_small.repartition(3).write.mode("overwrite").parquet(d)
    return d


def test_stream_rollup_matches_batch(spark, turns_small, turns_dir):
    sdf = stream_rollup(stream_turns(spark, turns_dir), tier="hour")
    run_to_memory(sdf, "rollup_stream_t", output_mode="complete")
    got = spark.table("rollup_stream_t").orderBy("conv_id", "bucket_start").toPandas()

    batch = (
        turns_small.select(
            "conv_id",
            F.date_trunc("hour", "ts").alias("bucket_start"),
            F.length("text").cast("double").alias("text_len"),
            F.col("tool").isNotNull().cast("double").alias("is_tool"),
        )
        .groupBy("conv_id", "bucket_start")
        .agg(
            F.count("*").cast("long").alias("turn_count"),
            F.sum("text_len").alias("sum_text_len"),
            F.min("text_len").alias("min_text_len"),
            F.max("text_len").alias("max_text_len"),
            F.sum("is_tool").alias("tool_turns"),
        )
        .orderBy("conv_id", "bucket_start")
        .toPandas()
    )
    got = got[batch.columns].reset_index(drop=True)
    assert got.equals(batch.reset_index(drop=True))


def test_stateful_counter_totals(spark, turns_small, turns_dir):
    sdf = stateful_turn_counter(stream_turns(spark, turns_dir, max_files_per_trigger=1))
    run_to_memory(sdf, "counter_t", output_mode="update")
    # update mode emits one row per conv per micro-batch; the final row
    # (max n_turns) must equal the batch count
    got = (
        spark.table("counter_t")
        .groupBy("conv_id")
        .agg(F.max("n_turns").alias("n_turns"))
        .toPandas()
        .set_index("conv_id")["n_turns"]
    )
    exp = turns_small.groupBy("conv_id").count().toPandas().set_index("conv_id")["count"]
    for cid, n in exp.items():
        assert int(got[cid]) == int(n), cid


def test_stream_append_mode_respects_watermark(spark, turns_dir):
    """Append mode + finite input: buckets not passed by the watermark
    stay pending (the late-data contract) — the emitted set must be a
    subset of the complete result."""
    sdf_c = stream_rollup(stream_turns(spark, turns_dir), tier="hour", watermark="1 minute")
    run_to_memory(sdf_c, "wm_complete", output_mode="complete")
    n_complete = spark.table("wm_complete").count()

    sdf_a = stream_rollup(stream_turns(spark, turns_dir), tier="hour", watermark="1 minute")
    run_to_memory(sdf_a, "wm_append", output_mode="append")
    n_append = spark.table("wm_append").count()
    assert n_append <= n_complete

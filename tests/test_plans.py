"""Physical-plan assertions: the optimizations we rely on at 100 TB must
be visible in the executed plan, not assumed (task brief: '.explain the
plan and iterate until it's the plan you'd want')."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ts_raster_spark.functions import features as FT
from ts_raster_spark.operators.longform import to_long_panel
from ts_raster_spark.operators.mask import mask_df
from ts_raster_spark.operators.rollup import bucketize

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _optimized(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_filter_pushdown_reaches_parquet(spark):
    ev = spark.read.parquet(f"{SF}/events.parquet")
    q = ev.where(F.col("user_id") == 7).select("event_id", "ts")
    plan = _plan(q)
    assert "PushedFilters" in plan and "user_id" in plan.split("PushedFilters")[1][:200], plan


def test_column_pruning_reaches_scan(spark):
    """A 2-column projection must not read the text/props payload
    (ReadSchema pruning — calculate.py:381's manual column drops, free
    from Catalyst here)."""
    ev = spark.read.parquet(f"{SF}/events.parquet")
    q = ev.select("user_id", "ts")
    plan = _plan(q)
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "props" not in read_schema and "event_type" not in read_schema, read_schema


def test_rollup_single_exchange(spark, turns_small):
    """attach_group_stats windows + the groupBy must share ONE hash
    exchange on the rollup keys (the single-shuffle design claim in
    functions/features.py)."""
    long_df = to_long_panel(turns_small).where(F.col("kind") == "text_len")
    df, keys = bucketize(long_df, "hour")
    stats = FT.attach_group_stats(df, keys)
    agg = stats.groupBy(*keys).agg(*[c.alias(n) for n, c in FT.core_aggs().items()])
    plan = _plan(agg)
    # exchanges other than the AQE-inserted read side of the input joins:
    n_exchanges = plan.count("Exchange hashpartitioning")
    assert n_exchanges <= 2, f"expected <=2 hash exchanges (latency join + rollup keys), got {n_exchanges}:\n{plan[:2000]}"


def test_mask_join_broadcasts(spark, turns_small):
    ids = turns_small.select("conv_id").distinct().withColumn("keep", F.lit(1))
    masked = mask_df(turns_small, ids)
    plan = _plan(masked)
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan, plan[:1500]


def test_whole_stage_codegen_covers_channels(spark, turns_small):
    long_df = to_long_panel(turns_small)
    long_df.collect()  # execute THIS plan so AQE finalizes it
    plan = _plan(long_df)
    # codegen stages print as "*(n) Operator" in the finalized plan
    assert "*(" in plan and "isFinalPlan=true" in plan, plan[:800]
    # the channel projection + unpivot must be inside a codegen stage
    assert "*(2) Generate stack" in plan or "* Generate" in plan.replace("*(1)", "*").replace("*(2)", "*"), plan[:1500]


def test_bucketed_table_join_needs_no_exchange(spark, turns_small, tmp_path):
    """Two bucketBy(conv_id) tables equi-joined on conv_id: the planner
    must use the bucket spec — zero hash exchanges in the join plan."""
    from ts_raster_spark.sources.catalog import ParquetTierCatalog

    cat = ParquetTierCatalog(str(tmp_path / "bt"), n_buckets=4)
    a = turns_small.groupBy("conv_id").agg(F.count("*").alias("n"))
    b = turns_small.groupBy("conv_id").agg(F.max("turn_idx").alias("mx"))
    cat.write_bucketed_table(a, "ta")
    cat.write_bucketed_table(b, "tb")
    j = cat.read_table(spark, "ta").join(cat.read_table(spark, "tb"), "conv_id")
    j.collect()
    plan = _plan(j)
    assert plan.count("Exchange hashpartitioning") == 0, plan[:1500]
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan or "BroadcastHashJoin" in plan


def test_bucket_pruning_in_catalog(spark, turns_small, tmp_path):
    from ts_raster_spark.sources.catalog import ParquetTierCatalog

    cat = ParquetTierCatalog(str(tmp_path / "t"), n_buckets=8)
    cat.write(turns_small.select("conv_id", "turn_idx", "ts"), "x")
    one = cat.read_conv(spark, "x", turns_small.first()["conv_id"])
    plan = _plan(one)
    # partition filter must appear as a pushed partition predicate, and
    # the scan must not enumerate all 8 bucket dirs
    assert "bucket_id" in plan
    one.collect()


def test_grouping_sets_single_expand_no_python(spark):
    """q_rollup_grouping_sets: four grains from ONE scan — exactly one
    Expand over projected columns, the standard two-phase-distinct
    exchange budget (3), zero Python stages."""
    import re

    from ts_raster_spark import queries as Q

    plan = _plan(Q.q_rollup_grouping_sets(spark, SF))
    assert plan.count("Expand") == 1, plan
    assert len(re.findall(r"Exchange", plan)) <= 3, plan
    assert "Python" not in plan
    # the Expand happens after projection: corpus text must not be in
    # its output (only the derived length rides the replication)
    expand_block = plan.split("Expand")[1][:400]
    assert "text#" not in expand_block, expand_block

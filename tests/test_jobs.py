from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ts_raster_spark.jobs import RollupJobConfig, run_rollup_job
from ts_raster_spark.sources.catalog import ParquetTierCatalog


def test_rollup_job_end_to_end(spark, turns_small, tmp_path):
    out = str(tmp_path / "tiers")
    counts = run_rollup_job(
        spark,
        turns_small,
        RollupJobConfig(
            out_root=out,
            gapfill_policy="locf",
            compress=True,
            checkpoint_slices=3,
            kinds=("text_len", "latency_s"),
        ),
    )
    assert counts["minute"] > counts["hour"] >= counts["day"]
    assert counts["minute_filled"] >= counts["minute"]
    assert counts["raw_blocks"] > 0

    cat = ParquetTierCatalog(out)
    hour = cat.read(spark, "rollup_hour")
    assert {"conv_id", "kind", "bucket_start", "turn_count", "mean", "variance"} <= set(hour.columns)
    # tier algebra spot check: total turn_count conserved across tiers
    m = cat.read(spark, "rollup_minute").agg(F.sum("turn_count")).first()[0]
    d = cat.read(spark, "rollup_day").agg(F.sum("turn_count")).first()[0]
    assert m == d


def test_rollup_job_with_mask(spark, turns_small, tmp_path):
    ids = sorted(r[0] for r in turns_small.select("conv_id").distinct().collect())
    mask = spark.createDataFrame(
        [(c, int(i % 2 == 0)) for i, c in enumerate(ids)], "conv_id string, keep int"
    )
    out = str(tmp_path / "tiers_masked")
    run_rollup_job(spark, turns_small, RollupJobConfig(out_root=out, tiers=("minute",)), mask=mask)
    got = {
        r[0]
        for r in ParquetTierCatalog(out).read(spark, "rollup_minute").select("conv_id").distinct().collect()
    }
    assert got == {c for i, c in enumerate(ids) if i % 2 == 0}


def test_rollup_job_rerun_idempotent(spark, turns_small, tmp_path):
    out = str(tmp_path / "tiers_idem")
    cfg = RollupJobConfig(out_root=out, tiers=("minute", "hour"), checkpoint_slices=2)
    c1 = run_rollup_job(spark, turns_small, cfg)
    c2 = run_rollup_job(spark, turns_small, cfg)  # resume: all slices skip
    assert c1 == c2

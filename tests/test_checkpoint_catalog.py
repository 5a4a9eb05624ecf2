from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from ts_raster_spark.operators.longform import to_long_panel
from ts_raster_spark.operators.rollup import rollup_simple
from ts_raster_spark.plans.checkpoint import load_manifest, read_result, run_checkpointed
from ts_raster_spark.sources.catalog import ParquetTierCatalog


def _transform(part):
    return rollup_simple(to_long_panel(part).where(F.col("kind") == "text_len"), "hour")


def test_resume_after_crash(spark, turns_small, tmp_path):
    """SURVEY.md §5 test 6: kill after k slices, rerun, output equal to
    single-shot, no duplicates, lineage reconciles."""
    out_a = str(tmp_path / "ckpt_a")
    out_b = str(tmp_path / "ckpt_b")

    # single-shot reference
    run_checkpointed(spark, turns_small, _transform, out_b, n_slices=4)
    ref = read_result(spark, out_b).orderBy("conv_id", "kind", "bucket_start").toPandas()

    # crashed run: 2 slices then injected failure
    with pytest.raises(RuntimeError, match="injected failure"):
        run_checkpointed(spark, turns_small, _transform, out_a, n_slices=4, fail_after=2)
    assert len(load_manifest(out_a)) == 2

    # resume: completes remaining slices only
    summary = run_checkpointed(spark, turns_small, _transform, out_a, n_slices=4)
    assert summary["skipped"] == 2 and summary["completed"] == 2

    got = read_result(spark, out_a).orderBy("conv_id", "kind", "bucket_start").toPandas()
    assert got.equals(ref)

    # lineage: per-slice rows_out sums to the table row count
    manifest = load_manifest(out_a)
    assert sum(r["rows_out"] for r in manifest.values()) == len(got)
    for rec in manifest.values():
        assert rec["rows_in"] > 0 and rec["wall_s"] >= 0


def test_resume_is_noop_when_done(spark, turns_small, tmp_path):
    out = str(tmp_path / "ckpt_c")
    run_checkpointed(spark, turns_small, _transform, out, n_slices=3)
    summary = run_checkpointed(spark, turns_small, _transform, out, n_slices=3)
    assert summary == {"completed": 0, "skipped": 3, "rows_out": summary["rows_out"]}


def test_changed_input_recomputes_slice(spark, turns_small, tmp_path):
    out = str(tmp_path / "ckpt_d")
    run_checkpointed(spark, turns_small, _transform, out, n_slices=2)
    # tamper with manifest fingerprint of slice 0 -> must recompute
    path = os.path.join(out, "manifest.jsonl")
    recs = [json.loads(line) for line in open(path)]
    recs[0]["input_fingerprint"] = "n=0,h=0"
    with open(path, "w") as f:
        for r in recs:
            f.write(json.dumps(r) + "\n")
    summary = run_checkpointed(spark, turns_small, _transform, out, n_slices=2)
    assert summary["completed"] == 1 and summary["skipped"] == 1


def test_catalog_bucket_layout_and_pruned_lookup(spark, turns_small, tmp_path):
    cat = ParquetTierCatalog(str(tmp_path / "tiers"), n_buckets=8)
    hour = _transform(turns_small)
    cat.write(hour, "rollup_hour")

    back = cat.read(spark, "rollup_hour")
    assert back.count() == hour.count()
    # bucket dirs exist
    dirs = os.listdir(cat.path("rollup_hour"))
    assert any(d.startswith("bucket_id=") for d in dirs)

    some_conv = hour.select("conv_id").first()["conv_id"]
    one = cat.read_conv(spark, "rollup_hour", some_conv)
    assert one.count() > 0
    assert one.select("conv_id").distinct().count() == 1
    # partition filter prunes: plan mentions the bucket_id pushdown
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert "bucket_id" in plan


def test_catalog_idempotent_rewrite(spark, turns_small, tmp_path):
    cat = ParquetTierCatalog(str(tmp_path / "tiers2"), n_buckets=4)
    hour = _transform(turns_small)
    cat.write(hour, "t")
    n1 = cat.read(spark, "t").count()
    cat.write(hour, "t")  # rerun: dynamic overwrite, not append
    n2 = cat.read(spark, "t").count()
    assert n1 == n2


def test_layout_change_does_not_double_count(spark, turns_small, tmp_path):
    """Re-running into the same out_dir with a SMALLER n_slices and the
    old manifest still present must not resurrect stale 'done' records:
    records are keyed by n_slices, so read_result sees only the current
    layout's slices."""
    out = str(tmp_path / "ckpt_layout")
    run_checkpointed(spark, turns_small, _transform, out, n_slices=8)
    ref = read_result(spark, out).count()
    # manifest NOT deleted — the layout key alone must protect us
    run_checkpointed(spark, turns_small, _transform, out, n_slices=4)
    assert set(load_manifest(out).keys()) == {0, 1, 2, 3}
    got = read_result(spark, out).count()
    assert got == ref
    # the old layout is still addressable explicitly
    assert set(load_manifest(out, n_slices=8).keys()) == set(range(8))


def test_slice_col_prunes_partitions(spark, turns_small, tmp_path):
    """With slice_col pointing at a materialized partition column, each
    slice's scan carries a partition filter (file pruning at planning
    time) and the checkpointed result equals the unsliced transform."""
    cat = ParquetTierCatalog(str(tmp_path / "src"), n_buckets=4)
    cat.write(turns_small, "turns")
    src = spark.read.parquet(cat.path("turns"))  # keeps bucket_id

    part = src.where(F.col("bucket_id").cast("int") == 2)
    plan = part._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "bucket_id" in plan

    out = str(tmp_path / "ckpt_pruned")
    summary = run_checkpointed(
        spark, src, _transform, out, n_slices=4, slice_col="bucket_id"
    )
    assert summary["completed"] == 4
    got = read_result(spark, out).orderBy("conv_id", "kind", "bucket_start").toPandas()
    ref = (
        _transform(turns_small).orderBy("conv_id", "kind", "bucket_start").toPandas()
    )
    assert got.equals(ref)


def test_read_result_ignores_stale_slices(spark, turns_small, tmp_path):
    """Resuming with a smaller n_slices must not union stale slice dirs
    from the previous layout (read_result reads manifest paths only)."""
    out = str(tmp_path / "ckpt_stale")
    run_checkpointed(spark, turns_small, _transform, out, n_slices=8)
    ref = read_result(spark, out).count()
    # wipe the manifest (simulating a layout change) and re-run with 4
    import os as _os

    _os.remove(_os.path.join(out, "manifest.jsonl"))
    run_checkpointed(spark, turns_small, _transform, out, n_slices=4)
    got = read_result(spark, out).count()
    assert got == ref  # stale slice=4..7 dirs exist on disk but are not read


def test_slice_domain_mismatch_raises(spark, turns_small, tmp_path):
    """A slice_col whose value domain exceeds range(n_slices) (layout
    narrower than the catalog's buckets, or NULL slice values) must
    refuse up front — silently skipping those rows would let read_result
    return a partial dataset with no error."""
    out = str(tmp_path / "ckpt_domain")
    src = turns_small.withColumn(
        "bucket_id", F.pmod(F.xxhash64("conv_id"), F.lit(8)).cast("int")
    )
    with pytest.raises(ValueError, match="outside the n_slices=4 layout"):
        run_checkpointed(spark, src, _transform, out, n_slices=4, slice_col="bucket_id")

    # NULL slice values refuse too
    src_null = turns_small.withColumn(
        "bucket_id",
        F.when(F.col("turn_idx") == 0, F.lit(None).cast("int")).otherwise(F.lit(0)),
    )
    with pytest.raises(ValueError, match="outside the n_slices=2 layout"):
        run_checkpointed(spark, src_null, _transform, out, n_slices=2, slice_col="bucket_id")

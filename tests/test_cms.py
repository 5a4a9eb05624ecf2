"""Count-Min sketch: guarantee, merge closure, determinism."""

from __future__ import annotations

import datetime as dt

import numpy as np
import pytest
from pyspark.sql import functions as F

from ts_raster_spark.operators.cms import cms_build, cms_estimate, cms_merge


@pytest.fixture(scope="module")
def zipf_items(spark):
    """Zipf-ish item stream across two hours: heavy head, long tail."""
    rng = np.random.default_rng(11)
    ids = rng.zipf(1.5, 4000)
    ids = ids[ids < 500]
    rows = [
        (dt.datetime(2024, 3, 1, 9 + (i % 2), i % 60), f"item-{v}")
        for i, v in enumerate(ids)
    ]
    df = spark.createDataFrame(rows, "ts timestamp, item string")
    return df.cache()


def _exact(df):
    return (
        df.groupBy(F.date_trunc("hour", "ts").alias("bucket_start"), "item")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


def test_cms_one_sided_guarantee(zipf_items):
    """est >= exact for EVERY item (deterministic, not probabilistic),
    and mean overcount stays within a few eps*N."""
    cells = cms_build(zipf_items, "item", tier="hour", d=4, w=256)
    exact = _exact(zipf_items)
    est = cms_estimate(cells, exact.select("bucket_start", "item"), d=4, w=256)
    j = exact.join(est, ["bucket_start", "item"]).toPandas()
    assert (j.est >= j.cnt).all()
    n_per_bucket = j.groupby(j.bucket_start)["cnt"].transform("sum")
    # e/w ~ 1.1% of bucket mass; allow 3x slack on the MEAN overcount
    assert ((j.est - j.cnt) / n_per_bucket).mean() <= 3 * np.e / 256


def test_cms_exact_when_sparse(spark):
    """Far fewer distinct items than w and no collisions expected →
    estimates are exactly the counts."""
    rows = [(dt.datetime(2024, 1, 1, 5), f"t{i % 5}") for i in range(100)]
    df = spark.createDataFrame(rows, "ts timestamp, item string")
    cells = cms_build(df, "item", tier="hour", d=4, w=4096)
    exact = _exact(df)
    est = cms_estimate(cells, exact.select("bucket_start", "item"), d=4, w=4096)
    j = exact.join(est, ["bucket_start", "item"]).toPandas()
    assert (j.est == j.cnt).all()


def test_cms_merge_closure(zipf_items):
    """Merging hour cells to day == building at day directly (cell-wise
    sum is the mergeable-summaries reduction)."""
    hour_cells = cms_build(zipf_items, "item", tier="hour")
    rolled = cms_merge(hour_cells, tier="day").toPandas()
    direct = cms_build(zipf_items, "item", tier="day").toPandas()
    key = ["bucket_start", "row", "pos"]
    a = rolled.sort_values(key).reset_index(drop=True)
    b = direct.sort_values(key).reset_index(drop=True)
    assert a.equals(b)


def test_cms_layout_invariant(zipf_items):
    """Cells are identical under any partitioning (pure aggregate)."""
    a = cms_build(zipf_items, "item").toPandas()
    b = cms_build(zipf_items.repartition(13), "item").toPandas()
    key = ["bucket_start", "row", "pos"]
    assert a.sort_values(key).reset_index(drop=True).equals(
        b.sort_values(key).reset_index(drop=True)
    )

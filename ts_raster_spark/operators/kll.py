"""Deterministic KLL-style mergeable rank sketch: cascading quantiles
with bounded RANK error.

The histogram sketch (operators/sketch.py) bounds VALUE error by one
bin width — weak on skewed distributions where one bin spans decades of
mass. The standard engine answer is a rank-error sketch (KLL / t-digest
in Druid, TimescaleDB, DataSketches). Randomized KLL compaction is not
cross-engine/cross-host reproducible, so this module ships the
DETERMINISTIC multi-level variant (Munro–Paterson-style compaction,
the pre-randomization ancestor of KLL [Karnin-Lang-Liberty 2016]):

- a sketch is a set of (level, value) items; an item at level ``l``
  represents ``2^l`` raw values;
- when a level holds more than ``k`` items, the level is sorted and the
  EVEN-index survivors are promoted to level ``l+1`` (one survivor per
  adjacent pair, weight doubled) — deterministic, so two hosts always
  build bit-identical sketches;
- each compaction at level ``l`` shifts any rank by at most ``2^l``;
  with geometric level sizes the worst-case rank error is
  O(n·log(n/k)/k) — pytest-asserted against that closed bound on
  skewed (lognormal / zipf-like) data;
- merge = concatenate per-level items, re-compact: hour sketches build
  from minute sketches without rescanning raw data, exactly like the
  algebraic cascade;
- total weight is conserved exactly (odd leftovers stay at their
  level), so counts stay exact through any cascade depth.

Spark shape: building/merging is a per-group Arrow kernel
(``applyInPandas`` — compaction is inherently iterative), but the
sketch itself is stored EXPLODED as narrow (keys, level, value) rows —
≤ k·log₂(n/k) rows per group — and querying quantiles from it is pure
window SQL (sort by value, cumulative weight walk), same discipline as
the histogram sketch.

Reference scope note: ts-raster has no sketch surface; engine addition
for the retention/rollup tier (same family as sketch.py / hll.py).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ts_raster_spark.operators.rollup import bucketize


def _compact(levels: list[np.ndarray], k: int) -> list[np.ndarray]:
    """Deterministic compaction sweep: any level over capacity promotes
    its even-index survivors (of the sorted, even-length prefix) one
    level up; odd leftovers stay. Runs until every level fits."""
    l = 0
    while l < len(levels):
        arr = levels[l]
        if len(arr) <= k:
            l += 1
            continue
        arr = np.sort(arr, kind="stable")
        m = len(arr) - (len(arr) % 2)
        promoted = arr[:m][0::2]
        levels[l] = arr[m:]  # the odd leftover (0 or 1 item)
        if l + 1 == len(levels):
            levels.append(np.empty(0, dtype=np.float64))
        levels[l + 1] = np.concatenate([levels[l + 1], promoted])
        l += 1  # leftover is <= 1 item, always within capacity
    return levels


def _build_levels(values: np.ndarray, k: int) -> list[np.ndarray]:
    return _compact([np.asarray(values, dtype=np.float64)], k)


def _merge_levels(a: list[np.ndarray], b: list[np.ndarray], k: int) -> list[np.ndarray]:
    out = []
    for l in range(max(len(a), len(b))):
        xs = [lv[l] for lv in (a, b) if l < len(lv)]
        out.append(np.concatenate(xs) if xs else np.empty(0, dtype=np.float64))
    return _compact(out, k)


SKETCH_FIELDS = "level int, value double"


def _levels_frame(levels: list[np.ndarray]) -> pd.DataFrame:
    lv = (
        np.concatenate([np.full(len(arr), i, dtype=np.int32) for i, arr in enumerate(levels)])
        if levels
        else np.empty(0, dtype=np.int32)
    )
    vals = np.concatenate(levels) if levels else np.empty(0, dtype=np.float64)
    return pd.DataFrame({"level": lv, "value": vals})


def kll_sketch(long_df: DataFrame, tier: str | None, k: int = 64) -> DataFrame:
    """Build the sketch per (conv_id, kind[, bucket_start]): one output
    row per retained (level, value) item — ≤ k·log₂(n/k)+k rows per
    group.  Kernel granularity is one (conv_id, kind) SERIES, looping
    time buckets inside pandas — per-bucket grouping would pay the
    Arrow per-group overhead (~ms) for every tiny bucket; per-series
    grouping amortizes it ~30-60× (same discipline as
    compress._encode_series)."""
    df, out_keys = bucketize(long_df, tier)
    series_keys = [c for c in out_keys if c != "bucket_start"]
    key_fields = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields if f.name in out_keys
    )
    schema = f"{key_fields}, {SKETCH_FIELDS}"
    bucketed = "bucket_start" in out_keys

    def _series(pdf: pd.DataFrame) -> pd.DataFrame:
        if not bucketed:
            res = _levels_frame(_build_levels(pdf["value"].to_numpy(dtype=np.float64), k))
        else:
            # vectorized fast path: a bucket with <= k values IS its own
            # level-0 sketch (no compaction) — emit those rows in bulk;
            # only over-capacity buckets run the compaction loop.  At
            # minute grain virtually every bucket takes the fast path,
            # so the kernel is one pandas groupby + array concat.
            sizes = pdf.groupby("bucket_start")["value"].transform("size")
            small = pdf[sizes <= k]
            frames = [
                pd.DataFrame(
                    {
                        "bucket_start": small["bucket_start"].to_numpy(),
                        "level": np.zeros(len(small), dtype=np.int32),
                        "value": small["value"].to_numpy(dtype=np.float64),
                    }
                )
            ]
            for b, sub in pdf[sizes > k].groupby("bucket_start", sort=True):
                fr = _levels_frame(_build_levels(sub["value"].to_numpy(dtype=np.float64), k))
                fr["bucket_start"] = b
                frames.append(fr)
            res = pd.concat(frames, ignore_index=True)
        for c in series_keys:
            res[c] = pdf[c].iloc[0]
        return res[out_keys + ["level", "value"]]

    if not bucketed:
        return df.groupBy(*series_keys).applyInPandas(_series, schema=schema)
    # SQL routing (round 4): a bucket with <= k values IS its own
    # level-0 sketch, and at fine grains that is virtually every
    # bucket — so series whose every bucket fits capacity take a pure
    # Catalyst identity projection (zero Python, zero Arrow transfer);
    # only series with an over-capacity bucket go through the kernel.
    # Routing is a broadcast anti/semi join on the (rare) heavy-series
    # key set from a map-side-combined count aggregate, exactly like
    # timeseries.ema.
    heavy_keys = (
        df.groupBy(*out_keys).agg(F.count("*").alias("_n"))
        .where(F.col("_n") > k)
        .select(*series_keys).distinct()
    )
    light_out = df.join(F.broadcast(heavy_keys), series_keys, "left_anti").select(
        *out_keys,
        F.lit(0).cast("int").alias("level"),
        F.col("value").cast("double").alias("value"),
    )
    heavy = df.join(F.broadcast(heavy_keys), series_keys, "left_semi")
    heavy_out = heavy.groupBy(*series_keys).applyInPandas(_series, schema=schema)
    return light_out.unionByName(heavy_out)


def kll_merge(sketch: DataFrame, coarser_tier: str, k: int = 64) -> DataFrame:
    """Tier cascade: re-bucket ``bucket_start`` and re-compact the
    concatenated items per coarser group — reads ≤ k·log₂(n/k) rows per
    finer bucket instead of the raw data.  One kernel call per series,
    looping coarse buckets inside (see kll_sketch)."""
    keys = [c for c in sketch.columns if c not in ("level", "value")]
    series_keys = [c for c in keys if c != "bucket_start"]
    d = sketch.withColumn("bucket_start", F.date_trunc(coarser_tier, F.col("bucket_start")))
    key_fields = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in d.schema.fields if f.name in keys
    )
    schema = f"{key_fields}, {SKETCH_FIELDS}"

    def _series(pdf: pd.DataFrame) -> pd.DataFrame:
        # vectorized fast path: a coarse bucket where every level is
        # already within capacity needs NO compaction — emit its rows
        # unchanged in bulk; loop only over-capacity buckets (rare:
        # they need > k items in some level, i.e. busy/mega series)
        lvl_n = pdf.groupby(["bucket_start", "level"])["value"].transform("size")
        worst = pdf.assign(_c=lvl_n).groupby("bucket_start")["_c"].transform("max")
        ok = pdf[worst <= k]
        frames = [
            pd.DataFrame(
                {
                    "bucket_start": ok["bucket_start"].to_numpy(),
                    "level": ok["level"].to_numpy().astype(np.int32),
                    "value": ok["value"].to_numpy(dtype=np.float64),
                }
            )
        ]
        for b, sub in pdf[worst > k].groupby("bucket_start", sort=True):
            n_levels = int(sub["level"].max()) + 1
            levels = _compact(
                [
                    sub.loc[sub["level"] == l, "value"].to_numpy(dtype=np.float64)
                    for l in range(n_levels)
                ],
                k,
            )
            fr = _levels_frame(levels)
            fr["bucket_start"] = b
            frames.append(fr)
        res = pd.concat(frames, ignore_index=True)
        for c in series_keys:
            res[c] = pdf[c].iloc[0]
        return res[keys + ["level", "value"]]

    # SQL routing (round 4), same shape as kll_sketch: a coarse bucket
    # whose every level is within capacity merges by IDENTITY (its rows
    # pass through unchanged) — only series containing an over-capacity
    # (bucket, level) run the compaction kernel.
    heavy_keys = (
        d.groupBy(*keys, "level").agg(F.count("*").alias("_n"))
        .where(F.col("_n") > k)
        .select(*series_keys).distinct()
    )
    light_out = d.join(F.broadcast(heavy_keys), series_keys, "left_anti").select(
        *keys, F.col("level").cast("int").alias("level"), F.col("value").cast("double").alias("value")
    )
    heavy = d.join(F.broadcast(heavy_keys), series_keys, "left_semi")
    heavy_out = heavy.groupBy(*series_keys).applyInPandas(_series, schema=schema)
    return light_out.unionByName(heavy_out)


def kll_quantiles(
    sketch: DataFrame, qs: tuple[float, ...] = (0.5, 0.95), count_col: str = "total_weight"
) -> DataFrame:
    """Rank-quantile estimates from a sketch — pure window SQL: items
    sorted by value, cumulative weight walk, first item whose cumulative
    weight reaches q·total (weight of a level-l item is 2^l). Ties on
    value break by level so the walk is a total order (deterministic
    across engines/hosts).  The conserved total weight (exactly the
    number of raw values the sketch summarizes — compaction never drops
    weight) is emitted under the neutral ``count_col`` name; callers
    alias domain names (e.g. turn_count) at the query layer."""
    keys = [c for c in sketch.columns if c not in ("level", "value")]
    wgt = F.pow(F.lit(2.0), F.col("level"))
    w_cum = Window.partitionBy(*keys).orderBy("value", "level").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_all = Window.partitionBy(*keys)
    d = (
        sketch.withColumn("_w", wgt)
        .withColumn("_cum", F.sum("_w").over(w_cum))
        .withColumn("_tot", F.sum("_w").over(w_all))
    )
    aggs = []
    for q in qs:
        target = F.lit(float(q)) * F.col("_tot")
        hit = (F.col("_cum") - F.col("_w") < target) & (target <= F.col("_cum"))
        name = f"q{int(round(q * 100)):02d}_kll"
        aggs.append(F.min(F.when(hit, F.col("value"))).alias(name))
    aggs.append(F.max("_tot").cast("long").alias(count_col))
    return d.groupBy(*keys).agg(*aggs)

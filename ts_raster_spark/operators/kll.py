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
    group.

    SINGLE-PASS shape (round 5): one hash aggregate gathers each
    group's values (map-side combined like any agg), a vectorized
    Arrow batch kernel compacts per group (a bucket with ≤ k values IS
    its own level-0 sketch — no compaction, just a relabel), and an
    explode re-emits the narrow (keys, level, value) rows.  The
    round-4 design instead ROUTED via a heavy-key probe + broadcast
    anti/semi joins so light series could pass through as a pure
    identity projection — zero shuffle, but the probe and each join
    branch re-embedded (re-planned, re-scanned) the upstream
    derivation, which dominates end-to-end when the input is a derived
    long panel rather than a bare scan, and multiplicatively so under
    a two-level cascade.  The single aggregate shuffles bytes the
    downstream quantile/merge window would shuffle anyway (at fine
    grains the sketch IS the data), so the trade is one derivation
    scan for the whole pipeline."""
    from pyspark.sql.functions import pandas_udf

    df, out_keys = bucketize(long_df, tier)
    g = df.groupBy(*out_keys).agg(
        F.collect_list(F.col("value").cast("double")).alias("_vals")
    )

    @pandas_udf("array<struct<level:int,value:double>>")
    def _build(vs: pd.Series) -> pd.Series:
        out = []
        for v in vs:
            arr = np.asarray(v, dtype=np.float64)
            if len(arr) <= k:
                out.append([{"level": 0, "value": float(x)} for x in arr])
            else:
                levels = _build_levels(arr, k)
                out.append(
                    [
                        {"level": l, "value": float(x)}
                        for l, a in enumerate(levels)
                        for x in a
                    ]
                )
        return pd.Series(out)

    # Native fast path (round 6): a group with <= k values IS its own
    # level-0 sketch — emit it with a pure-Catalyst explode and keep the
    # Arrow kernel for over-capacity groups only.  At fine tiers almost
    # every bucket is small, so the Python boundary disappears from the
    # common case; both branches read the SAME aggregation (the exchange
    # is reused), and the output multiset is identical to running the
    # kernel on everything (the kernel's <= k branch is the same relabel).
    small = (
        g.where(F.size("_vals") <= k)
        .select(*out_keys, F.explode("_vals").alias("value"))
        .select(*out_keys, F.lit(0).cast("int").alias("level"), F.col("value").cast("double").alias("value"))
    )
    big = g.where(F.size("_vals") > k).select(
        *out_keys, F.explode(_build("_vals")).alias("_it")
    ).select(
        *out_keys,
        F.col("_it.level").cast("int").alias("level"),
        F.col("_it.value").cast("double").alias("value"),
    )
    return small.unionByName(big)


def kll_merge(sketch: DataFrame, coarser_tier: str, k: int = 64) -> DataFrame:
    """Tier cascade: re-bucket ``bucket_start`` and re-compact the
    concatenated items per coarser group — reads ≤ k·log₂(n/k) rows
    per finer bucket instead of the raw data.  Same single-pass
    aggregate + Arrow batch kernel + explode shape as ``kll_sketch``
    (see there for why this replaced probe-and-join routing); the
    kernel passes a coarse bucket through UNCHANGED when every level
    is already within capacity (the common case), so merging is one
    sketch-row shuffle and a relabel for all but busy/mega series."""
    from pyspark.sql.functions import pandas_udf

    keys = [c for c in sketch.columns if c not in ("level", "value")]
    d = sketch.withColumn(
        "bucket_start", F.date_trunc(coarser_tier, F.col("bucket_start"))
    )
    g = d.groupBy(*keys).agg(
        F.collect_list(
            F.struct(
                F.col("level").cast("int").alias("level"),
                F.col("value").cast("double").alias("value"),
            )
        ).alias("_its")
    )

    @pandas_udf("array<struct<level:int,value:double>>")
    def _merge(its: pd.Series) -> pd.Series:
        out = []
        for items in its:
            n = len(items)
            lv = np.fromiter((it["level"] for it in items), dtype=np.int64, count=n)
            if n == 0 or np.bincount(lv).max() <= k:
                out.append(list(items))
                continue
            vals = np.fromiter((it["value"] for it in items), dtype=np.float64, count=n)
            levels = _compact(
                [vals[lv == l] for l in range(int(lv.max()) + 1)], k
            )
            out.append(
                [
                    {"level": l, "value": float(x)}
                    for l, a in enumerate(levels)
                    for x in a
                ]
            )
        return pd.Series(out)

    # Native fast path (round 6): <= k total items implies every level is
    # within capacity, so the merged sketch is the concatenation itself —
    # pure-Catalyst explode, no Python.  Only bigger groups (which may
    # still pass through unchanged if no single level overflows) hit the
    # Arrow kernel; both branches reuse the one aggregation exchange.
    small = g.where(F.size("_its") <= k).select(
        *keys, F.explode("_its").alias("_it")
    ).select(
        *keys,
        F.col("_it.level").cast("int").alias("level"),
        F.col("_it.value").cast("double").alias("value"),
    )
    big = g.where(F.size("_its") > k).select(
        *keys, F.explode(_merge("_its")).alias("_it")
    ).select(
        *keys,
        F.col("_it.level").cast("int").alias("level"),
        F.col("_it.value").cast("double").alias("value"),
    )
    return small.unionByName(big)


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
    # total weight rides the cumulative window's sort (explicit unbounded
    # frame, same (partition, order) spec -> one Window operator, one
    # sort); the sum of 2^level weights is exact integer arithmetic in
    # double, so the value is order-independent (round 6)
    w_all = Window.partitionBy(*keys).orderBy("value", "level").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
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

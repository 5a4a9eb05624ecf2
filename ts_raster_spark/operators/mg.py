"""Misra-Gries heavy-hitters sketch: mergeable top-k across tiers.

The frequent-items member of the engine's sketch family — quantiles
(operators/kll.py, operators/sketch.py), distinct counts
(operators/hll.py), and now heavy hitters.  Exact per-bucket top-k
(`top_tools_hour`) shuffles every (bucket, item) pair and keeps full
per-bucket item dictionaries; at 100 TB with a high-cardinality item
column (tools, URLs, n-grams) the dictionary IS the shuffle.  The
Misra-Gries summary caps state at ``k`` counters per bucket with the
classic guarantee: any item with true frequency > n/k is RETAINED, and
every retained counter undercounts its item by at most n/k
[Misra & Gries 1982; merge property per Agarwal et al. 2012, the
"mergeable summaries" paper].

Determinism: the textbook algorithm is stream-order dependent.  This
implementation processes items grouped-and-counted first (count-major,
then item ascending — a canonical order), making the summary a pure
function of the group's item MULTISET, bit-identical across hosts and
partitionings:

- within a bucket: count items exactly (small per-bucket dictionaries
  at kernel granularity), then fold items through the MG counter set
  in canonical order;
- merge (finer tier → coarser): sum counters per item, then apply the
  standard MG reduction (subtract the (k+1)-th largest merged weight,
  drop non-positive) — Agarwal et al.'s merge, which preserves the
  n/k error bound;
- the per-item undercount is bounded by the sketch's own ``err``
  column (the total weight subtracted so far), so the gate can verify
  the bound IN-QUERY against exact counts, like sketch_kll_hour.

Spark shape: per-SERIES ``applyInPandas`` kernels looping time buckets
inside pandas (same Arrow-amortization discipline as kll.py /
compress.py); the sketch is stored exploded as (keys, item, weight,
err) rows, ≤ k per bucket.

Reference scope note: ts-raster has no frequent-items surface; engine
addition for the rollup/training-pipeline tier (task brief family).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _mg_from_counts(items: np.ndarray, counts: np.ndarray, k: int):
    """Deterministic MG summary from exact (item, count) pairs.

    Feeding exact counts count-major (desc), item-asc through MG is
    equivalent to: keep the k largest (count, item) pairs, subtract the
    weight that must be decremented so at most k counters survive.
    Closed form: survivors = top-k by (count desc, item asc); err = the
    (k+1)-th largest count (0 if fewer than k+1 items), each survivor's
    weight = max(count - err, 0) dropped if 0.  This matches running
    textbook MG on the count-major canonical stream and is what the
    merge reduction below also produces — one rule everywhere.
    """
    if len(items) <= k:
        return items, counts.astype(np.int64), 0
    order = np.lexsort((items, -counts))
    items, counts = items[order], counts[order]
    err = int(counts[k])
    keep_items, keep_counts = items[:k], counts[:k] - err
    pos = keep_counts > 0
    return keep_items[pos], keep_counts[pos].astype(np.int64), err


MG_FIELDS = "item string, weight long, err long"


def mg_sketch(
    df: DataFrame, item_col: str, tier: str, k: int = 8,
    keys: tuple[str, ...] = (),
) -> DataFrame:
    """Build the per-bucket MG summary: ≤ k rows per (*keys,
    bucket_start), each (item, weight, err) with weight ≥ true_count -
    err and every item of true count > err retained."""
    d = df.withColumn("bucket_start", F.date_trunc(tier, F.col("ts"))).where(
        F.col(item_col).isNotNull()
    )
    out_keys = [*keys, "bucket_start"]
    key_fields = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in d.schema.fields if f.name in out_keys
    )
    schema = f"{key_fields}, {MG_FIELDS}"
    series_keys = list(keys)

    def _series(pdf: pd.DataFrame) -> pd.DataFrame:
        frames = []
        for b, sub in pdf.groupby("bucket_start", sort=True):
            vc = sub[item_col].value_counts()
            it, w, err = _mg_from_counts(
                vc.index.to_numpy(dtype=object), vc.to_numpy(dtype=np.int64), k
            )
            if len(it) == 0:
                # all counters cancelled (all-equal counts): keep a
                # NULL-item sentinel so the bucket's err bound survives
                it, w = np.asarray([None], dtype=object), np.asarray([0], dtype=np.int64)
            frames.append(
                pd.DataFrame(
                    {"bucket_start": b, "item": it, "weight": w, "err": np.int64(err)}
                )
            )
        res = pd.concat(frames, ignore_index=True)
        for c in series_keys:
            res[c] = pdf[c].iloc[0]
        return res[out_keys + ["item", "weight", "err"]]

    # kernel granularity: the series keys if given (buckets loop inside
    # the kernel, Arrow overhead amortized), else per bucket — a global
    # unkeyed sketch has only as many groups as buckets, already coarse
    group_cols = series_keys if series_keys else ["bucket_start"]
    return d.groupBy(*group_cols).applyInPandas(_series, schema=schema)


def mg_merge(sketch: DataFrame, coarser_tier: str, k: int = 8) -> DataFrame:
    """Tier cascade: re-bucket, SUM weights per item and errs per source
    bucket (plain aggregates — the shuffle moves ≤ k rows per finer
    bucket), then re-reduce to k counters in a kernel.  Error bounds
    add: err_out ≤ Σ err_in + reduction subtraction (tracked exactly in
    the err column)."""
    keys = [c for c in sketch.columns if c not in ("item", "weight", "err")]
    d = sketch.withColumn("_coarse", F.date_trunc(coarser_tier, F.col("bucket_start")))
    group_keys = [c if c != "bucket_start" else "_coarse" for c in keys]
    # per-source-bucket err summed once per bucket, not once per item row
    errs = (
        d.groupBy(*group_keys, "bucket_start").agg(F.max("err").alias("_e"))
        .groupBy(*group_keys).agg(F.sum("_e").alias("_err_in"))
    )
    summed = (
        d.where(F.col("item").isNotNull())
        .groupBy(*group_keys, "item")
        .agg(F.sum("weight").alias("weight"))
    )
    key_fields = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in sketch.schema.fields
        if f.name in keys
    )
    schema = f"{key_fields}, {MG_FIELDS}"
    # errs is the base side (left join): a coarse group whose finer
    # sketches were all sentinels must still emit its err row
    joined = errs.join(summed, group_keys, "left")

    def _reduce(pdf: pd.DataFrame) -> pd.DataFrame:
        real = pdf[pdf["item"].notna()]
        it, w, err = _mg_from_counts(
            real["item"].to_numpy(dtype=object),
            real["weight"].to_numpy(dtype=np.int64),
            k,
        )
        if len(it) == 0:
            it, w = np.asarray([None], dtype=object), np.asarray([0], dtype=np.int64)
        out = pd.DataFrame(
            {"item": it, "weight": w, "err": np.int64(err + int(pdf["_err_in"].iloc[0]))}
        )
        for c in keys:
            src = "_coarse" if c == "bucket_start" else c
            out[c] = pdf[src].iloc[0]
        return out[keys + ["item", "weight", "err"]]

    return joined.groupBy(*group_keys).applyInPandas(_reduce, schema=schema)

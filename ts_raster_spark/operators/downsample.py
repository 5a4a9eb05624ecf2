"""LTTB (largest-triangle-three-buckets) downsampling per conversation.

The canonical visualization downsample for time series (Steinarsson
2013; shipped by TimescaleDB toolkit as ``lttb()`` and by Grafana):
reduce each conversation's series to ``n_out`` points preserving visual
shape — endpoints kept, each interior bucket contributes the point
maximizing the triangle area with the previously chosen point and the
next bucket's centroid.

Spark shape: ``groupBy(conv_id).applyInPandas`` — the algorithm is
inherently sequential per series (each selection depends on the
previous), which is exactly the applyInPandas contract: Arrow-batched
per-group NumPy, zero per-row Python.  At 100 TB this is one shuffle on
conv_id and a linear scan per group; group size = one conversation.

Determinism across hosts: triangle areas are quantized to 10
significant digits before argmax (same contract as functions/cwt) so
SIMD summation noise in the bucket means cannot flip a selection
between driver rounds.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ts_raster_spark.operators.longform import epoch_seconds


def lttb_indices(x: np.ndarray, y: np.ndarray, n_out: int) -> np.ndarray:
    """Indices of the LTTB selection (always includes 0 and n-1)."""
    n = len(x)
    if n_out >= n or n <= 2:
        return np.arange(n, dtype=np.int64)
    if n_out < 3:
        n_out = 3
    # bucket boundaries over the interior points 1..n-2, equal float split
    edges = np.linspace(1, n - 1, n_out - 1).astype(np.int64)
    out = [0]
    prev = 0
    for b in range(n_out - 2):
        lo, hi = edges[b], edges[b + 1]
        # canonical LTTB (Steinarsson 2013 / TimescaleDB): the next-bucket
        # centroid range is HALF-OPEN [edges[b+1], edges[b+2]); only the
        # final bucket's successor is the end point itself (round-4 fix —
        # the old `edges[b+2] + 1` leaked the following bucket's first
        # candidate into the centroid)
        nlo, nhi = edges[b + 1], (edges[b + 2] if b + 2 < len(edges) else n)
        # centroid of the NEXT bucket (last bucket's successor is the end point)
        cx = float(np.mean(x[nlo:nhi])) if nhi > nlo else float(x[-1])
        cy = float(np.mean(y[nlo:nhi])) if nhi > nlo else float(y[-1])
        ax, ay = float(x[prev]), float(y[prev])
        # triangle areas for every candidate in this bucket
        area = np.abs(
            (ax - cx) * (y[lo:hi] - ay) - (ax - x[lo:hi]) * (cy - ay)
        )
        # host-stable argmax: quantize to 10 significant digits so ties
        # created by FP dust resolve to the same (leftmost) candidate
        scale = float(area.max())
        if scale > 0 and np.isfinite(scale):
            q = 10.0 ** (np.floor(np.log10(scale)) - 9)
            area = np.round(area / q) * q
        prev = int(lo + np.argmax(area))
        out.append(prev)
    out.append(n - 1)
    return np.asarray(out, dtype=np.int64)


def lttb(
    df: DataFrame,
    n_out: int = 20,
    y_col: str = "text_len",
    keys: tuple[str, ...] = ("conv_id",),
) -> DataFrame:
    """Downsample each conversation's (ts, y) series to ``n_out`` points.

    Input needs columns: keys + turn_idx, ts, ``y_col``.  Output:
    keys + turn_idx, ts, y (the selected rows, originals untouched).
    """
    key_fields = [f for f in df.schema.fields if f.name in keys]
    schema = T.StructType(
        [*key_fields,
         T.StructField("turn_idx", T.IntegerType()),
         T.StructField("ts", [f for f in df.schema.fields if f.name == "ts"][0].dataType),
         T.StructField(y_col, T.DoubleType())]
    )
    klist = list(keys)

    def _one(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["turn_idx", "ts"], kind="mergesort").reset_index(drop=True)
        x = pdf["_eps"].to_numpy(dtype=np.float64)
        y = pdf[y_col].to_numpy(dtype=np.float64)
        idx = lttb_indices(x, y, n_out)
        return pdf.iloc[idx][klist + ["turn_idx", "ts", y_col]]

    prepped = df.withColumn("_eps", epoch_seconds(F.col("ts"))).select(
        *klist, "turn_idx", "ts", "_eps", F.col(y_col).cast("double").alias(y_col)
    )
    return prepped.groupBy(*klist).applyInPandas(_one, schema=schema)

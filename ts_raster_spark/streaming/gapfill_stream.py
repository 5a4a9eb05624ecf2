"""Continuous gap-fill: stateful locf over a turns stream.

Batch gap-fill (operators/gapfill.py) scaffolds the dense bucket grid
after the fact; the streaming analog carries per-conversation state
``(last_bucket, last_value)`` and, whenever a new turn advances a
conversation's event time, EMITS the locf-filled buckets for the gap it
just closed — continuous aggregates with late-emission semantics, via
``applyInPandasWithState`` (the custom-stateful-operator pattern; the
reference has no streaming surface at all, SURVEY.md §2.9).

Emitted rows: (conv_id, bucket_start, value, filled) where filled=1
marks buckets that had no observation (carried forward).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

_STATE = "last_bucket_us LONG, last_value DOUBLE"
_OUT = "conv_id STRING, bucket_start TIMESTAMP, value DOUBLE, filled INT"
_MINUTE_US = 60_000_000


def _locf_fn(key, batches: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
    (conv_id,) = key
    last_bucket, last_value = state.get if state.exists else (None, None)
    out_rows: list[tuple] = []
    for pdf in batches:
        pdf = pdf.sort_values(["turn_idx", "ts"])
        ts_us = pdf["ts"].astype("datetime64[us]").astype("int64")
        vals = pdf["value"].astype(float)
        for t_us, v in zip(ts_us, vals):
            bucket = (int(t_us) // _MINUTE_US) * _MINUTE_US
            if last_bucket is None or bucket > last_bucket:
                if last_bucket is not None:
                    # emit locf rows for every empty minute in the gap
                    b = last_bucket + _MINUTE_US
                    while b < bucket:
                        out_rows.append((conv_id, b, float(last_value), 1))
                        b += _MINUTE_US
                out_rows.append((conv_id, bucket, float(v), 0))
                last_bucket, last_value = bucket, float(v)
            elif bucket == last_bucket:
                # same bucket: last observation wins; update in place when
                # this batch emitted the row, else re-emit as an update
                if out_rows and out_rows[-1][1] == bucket:
                    out_rows[-1] = (conv_id, bucket, float(v), 0)
                else:
                    out_rows.append((conv_id, bucket, float(v), 0))
                last_value = float(v)
            else:
                # out-of-order event time (bucket < state): emit a
                # correction row for that bucket but do NOT rewind the
                # locf state — already-emitted buckets stay emitted
                out_rows.append((conv_id, bucket, float(v), 0))
    state.update((last_bucket, last_value))
    if out_rows:
        df = pd.DataFrame(out_rows, columns=["conv_id", "bucket_us", "value", "filled"])
        df["bucket_start"] = pd.to_datetime(df.pop("bucket_us"), unit="us")
        yield df[["conv_id", "bucket_start", "value", "filled"]]


def stream_locf_minute(turns_stream: DataFrame, value_expr: str = "CAST(length(text) AS DOUBLE)") -> DataFrame:
    """Per-conversation continuous minute-bucket locf of ``value_expr``."""
    ch = turns_stream.selectExpr("conv_id", "turn_idx", "ts", f"{value_expr} AS value")
    return ch.groupBy("conv_id").applyInPandasWithState(
        _locf_fn,
        outputStructType=_OUT,
        stateStructType=_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )

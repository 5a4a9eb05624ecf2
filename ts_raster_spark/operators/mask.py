"""Mask / unmask: conversation filter predicates as joins.

Reference semantics:

- ``mask_df`` (tsraster/prep.py:367-447): keep long-panel rows whose
  pixel_id is in the mask key set (mask == 1) → **left-semi join**,
  broadcast when the key set is small.
- ``unmask_df`` / ``unmask_from_mask`` (prep.py:450-521): re-expand a
  masked result onto the dense domain; absent rows get the ``-9999``
  sentinel → **left outer join + coalesce**.
- ``check_mask`` (prep.py:524-549): pre-flight compatibility assertion
  between mask and input.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ts_raster_spark.operators.gapfill import SENTINEL


def mask_keys(mask: DataFrame, keep_col: str = "keep") -> DataFrame:
    """mask raster → key set: rows where mask == 1 (prep.py:380-381)."""
    return mask.where(F.col(keep_col) == 1).select("conv_id")


def mask_df(df: DataFrame, mask: DataFrame, keep_col: str = "keep", broadcast: bool = True) -> DataFrame:
    """Left-semi filter of any conv-keyed frame by the mask key set.

    ``broadcast=True`` ships the key set to every executor (the mask is
    a small dim next to a 100 TB fact table); set False to let AQE pick.
    """
    keys = mask_keys(mask, keep_col)
    if broadcast:
        keys = F.broadcast(keys)
    return df.join(keys, "conv_id", "left_semi")


def unmask_df(
    result: DataFrame,
    domain: DataFrame,
    on: list[str],
    value_cols: list[str],
    fill: float = SENTINEL,
) -> DataFrame:
    """Re-expand ``result`` onto ``domain`` (all key tuples), filling
    missing value columns with ``fill`` (prep.py:477's ``-9999``)."""
    out = domain.select(*on).distinct().join(result, on, "left")
    for c in value_cols:
        out = out.withColumn(c, F.coalesce(F.col(c), F.lit(fill)))
    return out


def check_mask(df: DataFrame, mask: DataFrame) -> None:
    """Pre-flight: every masked conv_id must exist in the input
    (prep.py:524-549's metadata compatibility check, recast)."""
    missing = (
        mask_keys(mask).join(df.select("conv_id").distinct(), "conv_id", "left_anti").limit(1).count()
    )
    if missing:
        raise ValueError("mask references conv_ids absent from the input table")

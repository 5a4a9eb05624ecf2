"""ts_raster_spark — a from-scratch PySpark-native time-series rollup,
downsample and retention engine for conversation/agent transcripts.

Capability-parity target: mmann1123/ts-raster (per-pixel tsfresh feature
extraction over raster stacks), re-expressed Spark-first over a transcript
turns table ``(conv_id string, turn_idx int, role string, text string,
tool string, ts timestamp)``:

- each conversation (``conv_id``, ordered by ``turn_idx, ts``) plays the
  role of a pixel series (reference: tsraster/prep.py:116-154
  ``image_to_series``),
- tsfresh-style descriptors are computed with native Spark aggregates and
  vectorized Arrow kernels (reference: tsraster/calculate.py:58-181
  ``calculateFeatures``),
- rollups land at minute/hour/day retention tiers with an algebraic
  re-aggregation cascade (reference analog:
  tsraster/prep.py:553-611 ``combine_extracted_features``),
- gaps are filled by locf/linear interpolation over a dense bucket
  scaffold (reference: tsraster/prep.py:490-521 ``unmask_from_mask``),
- numeric rollups compress with Gorilla XOR + delta-of-delta blocks,
- jobs resume from per-partition checkpoints with lineage metrics
  (reference analog: the ``reset_df``/``my_df.csv`` cache,
  tsraster/calculate.py:79-87).

Everything is built from the public PySpark DataFrame/SQL API; no code is
copied from the reference.
"""

__version__ = "0.1.0"

from ts_raster_spark.session import get_spark  # noqa: F401

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from ts_raster_spark.compression.chimp import decode_values_chimp, encode_values_chimp
from ts_raster_spark.compression.gorilla import encode_values

VECTORS = {
    "empty": np.array([], dtype=np.float64),
    "single": np.array([2.718281828]),
    "constant": np.full(200, -17.5),
    "ramp": np.arange(500, dtype=np.float64) / 7,
    "walk": np.cumsum(np.random.RandomState(9).normal(0, 1, 1000)),
    "two_decimals": np.round(np.random.RandomState(3).uniform(0, 500, 800), 2),
    "specials": np.array([0.0, -0.0, np.inf, -np.inf, np.nan, 1e-308, 1e308]),
}


@pytest.mark.parametrize("name", sorted(VECTORS))
def test_chimp_roundtrip_bitexact(name):
    x = VECTORS[name]
    out = decode_values_chimp(encode_values_chimp(x))
    assert out.view(np.uint64).tolist() == x.view(np.uint64).tolist(), name


@settings(max_examples=200, deadline=None)
@given(st.lists(st.floats(allow_nan=False, width=64, min_value=-1e12, max_value=1e12),
                min_size=0, max_size=300))
def test_chimp_roundtrip_any_floats(xs):
    x = np.asarray(xs, dtype=np.float64)
    out = decode_values_chimp(encode_values_chimp(x))
    assert out.view(np.uint64).tolist() == x.view(np.uint64).tolist()


def test_chimp_beats_gorilla_on_low_precision_series():
    """The paper's core claim: Chimp's LZ rounding + suffix mode wins on
    real-world-ish (few significant decimals) series."""
    x = np.round(np.cumsum(np.random.RandomState(7).normal(0, 0.5, 5000)), 2) + 100
    g = len(encode_values(x))
    c = len(encode_values_chimp(x))
    assert c < g, f"chimp {c}B vs gorilla {g}B"


def test_spark_chimp_block_roundtrip(spark, turns_small):
    from pyspark.sql import functions as F

    from ts_raster_spark.operators.compress import compress_blocks, decompress_blocks
    from ts_raster_spark.operators.longform import to_long_panel

    long_df = to_long_panel(turns_small).where(F.col("kind") == "text_len")
    blocks = compress_blocks(long_df, block="day", codec="chimp")
    assert blocks.select("codec").distinct().first()[0] == "chimp"
    back = decompress_blocks(blocks)
    a = long_df.select("conv_id", "ts", "value").orderBy("conv_id", "ts").toPandas()
    b = back.select("conv_id", "ts", "value").orderBy("conv_id", "ts").toPandas()
    assert a.equals(b)

    with pytest.raises(ValueError, match="unknown codec"):
        compress_blocks(long_df, codec="zstd")

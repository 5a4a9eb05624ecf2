from __future__ import annotations

import pytest

from ts_raster_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="ts_raster_spark-tests", master="local[4]", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def turns_small(spark):
    from ts_raster_spark.datagen import gen_turns

    df = gen_turns(spark, n_convs=40, min_turns=1, max_turns=30, seed=7).cache()
    df.count()
    return df

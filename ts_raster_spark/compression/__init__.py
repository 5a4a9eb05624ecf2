from ts_raster_spark.compression.gorilla import (  # noqa: F401
    decode_timestamps,
    decode_values,
    encode_timestamps,
    encode_values,
)

from ts_raster_spark.sources.turns import (  # noqa: F401
    TURNS_SCHEMA,
    derive_turns_from_events,
    load_tables,
)

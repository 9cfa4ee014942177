from mhw3d_detection_spark.sources.tables import (  # noqa: F401
    TABLES,
    events_timeseries,
    load_table,
    register_views,
)

from mhw3d_detection_spark.streaming.sessionize import (  # noqa: F401
    streaming_dedup,
    streaming_event_sessions,
    streaming_windowed_stats,
)

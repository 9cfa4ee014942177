from mhw3d_detection_spark.streaming.sessionize import (  # noqa: F401
    streaming_area_stats,
    streaming_bm25_gate,
    streaming_cardinality,
    streaming_dedup,
    streaming_despike_gate,
    streaming_detect_partials,
    streaming_event_sessions,
    streaming_feature_hash,
    streaming_frequency,
    streaming_histogram,
    streaming_lsh_dedup,
    streaming_dsir_gate,
    streaming_quality_gate,
    streaming_severity,
    streaming_similarity,
    streaming_windowed_stats,
    streaming_winnow_dedup,
)
from mhw3d_detection_spark.streaming.stateful import (  # noqa: F401
    streaming_cusum_alarms,
    streaming_detect_events_exact,
    streaming_ewma,
)

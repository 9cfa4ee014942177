from mhw3d_detection_spark.operators.climatology import (  # noqa: F401
    densify_doy,
    interp_feb29,
    pooled_climatology,
    simple_climatology,
    smooth_doy_circular,
)
from mhw3d_detection_spark.operators.severity import calculate_severity  # noqa: F401
from mhw3d_detection_spark.operators.detection import (  # noqa: F401
    detect_events,
    event_metrics,
)

from mhw3d_detection_spark.functions.calendar import clim_doy, is_leap_year  # noqa: F401
from mhw3d_detection_spark.functions.scalar import (  # noqa: F401
    category_label,
    severity_best_practice,
    severity_legacy,
    to_ordinal,
)

from mhw3d_detection_spark.plans.pipeline import detect_mhw  # noqa: F401

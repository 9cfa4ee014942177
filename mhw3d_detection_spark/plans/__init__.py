from mhw3d_detection_spark.plans.curation import curate_corpus  # noqa: F401
from mhw3d_detection_spark.plans.dedup_report import dedup_report  # noqa: F401
from mhw3d_detection_spark.plans.pipeline import detect_mhw  # noqa: F401
from mhw3d_detection_spark.plans.retrieval import retrieval_search  # noqa: F401
from mhw3d_detection_spark.plans.corpus_report import corpus_report  # noqa: F401,E402
from mhw3d_detection_spark.plans.drift_report import drift_report  # noqa: F401,E402
from mhw3d_detection_spark.plans.events_report import events_report  # noqa: F401,E402
from mhw3d_detection_spark.plans.survival_report import survival_report  # noqa: F401,E402

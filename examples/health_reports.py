"""Nightly-health-check walkthrough: the r10 composed monitoring
reports over the driver testdata.

1. drift_report  — KS sup-norm + Wasserstein-1 + banded PSI of the
   doc-length distribution (new snapshot slice vs existing corpus)
   from ONE histogram scan; the three standalone drift rows each
   rescan the corpus (measured 2.2x at sf0.1, docs/PLANS.md).
2. events_report — DAU, event-type mix, view->purchase funnel, and
   pooled weekly retention from ONE log scan reduced to the
   (user, day, type) activity cube (measured 1.8x vs the standalone
   readouts).
3. The one-row rollups a dashboard pins next to them: session-length
   summary, weekly volume trend, hour-of-week load profile extremes.

Run: PYTHONPATH=/root/repo python examples/health_reports.py
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F


def main() -> None:
    import mhw3d_detection_spark as m
    from mhw3d_detection_spark.plans import drift_report, events_report
    from mhw3d_detection_spark.queries.base import REGISTRY
    import mhw3d_detection_spark.queries  # noqa: F401  (registry)
    from mhw3d_detection_spark.sources.tables import load_table

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    spark = m.get_spark("health-reports", cpus=8)

    docs = load_table(spark, sf_dir, "documents")
    ev = load_table(spark, sf_dir, "events")

    print("=== drift report (doc length, new slice vs corpus) ===")
    drift_report(
        docs.select("doc_id", "n_chars"),
        "n_chars",
        F.col("doc_id") % 5 != 4,
    ).show(truncate=False)

    print("=== events report (DAU / mix / funnel / retention) ===")
    events_report(ev).orderBy("section", "key").show(40, truncate=False)

    print("=== session-length summary ===")
    REGISTRY["q_session_stats"].spark_fn(spark, sf_dir).show(
        truncate=False
    )

    print("=== weekly volume trend ===")
    REGISTRY["q_weekly_trend"].spark_fn(spark, sf_dir).orderBy(
        "week"
    ).show(truncate=False)


    print("=== session-survival report (pooled + cohort KM + log-rank) ===")
    # the r13 composed flagship: one sessionize pass feeds all three
    # survival readouts (see docs/PLANS.md r13)
    REGISTRY["q_survival_report"].spark_fn(spark, sf_dir).filter(
        "section = 'logrank'"
    ).orderBy("cohort").show(truncate=False)

    print("=== hour-of-week load profile: 5 hottest cells ===")
    REGISTRY["q_load_profile"].spark_fn(spark, sf_dir).orderBy(
        F.desc("std_residual")
    ).show(5, truncate=False)


if __name__ == "__main__":
    main()

"""Monitoring & QC walkthrough: the r7 drift/quality family end to end
on the bundled test tables. Run from the repo root:

    python examples/monitoring.py [sf_dir]

The operational loop a production series pipeline runs around the
detection engine:

1. **Audit the warehouse** (``operators.dataqc``): range/consistency
   expectations, referential orphans, pk uniqueness — one report row
   per check, all exact integers.
2. **De-spike the series** (``despike_mad``): robust modified z-score
   QC; median/MAD cannot be inflated by the spikes they hunt.
3. **Smooth + screen for regime shifts** (``ewma_smooth``,
   ``cusum_changepoints``): the trend-following feature and the
   sequential drift detector, both expressed as pure window algebra
   on an exact dyadic grid (the streaming twins ``streaming_ewma`` /
   ``streaming_cusum_alarms`` replay the same arithmetic bit-exactly
   online).

Every step is a lazy DataFrame plan; nothing here collects more than
the report rows it prints.
"""

import sys

from pyspark.sql import functions as F

sys.path.insert(0, ".")

from mhw3d_detection_spark import get_spark  # noqa: E402
from mhw3d_detection_spark.operators.analysis import (  # noqa: E402
    cusum_changepoints,
    despike_mad,
    ewma_smooth,
)
from mhw3d_detection_spark.operators.dataqc import (  # noqa: E402
    duplicate_keys,
    expectation_report,
    referential_orphans,
)
from mhw3d_detection_spark.sources.tables import load_table  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("monitoring", cpus=8)

    # -- 1. warehouse audit -------------------------------------------
    ev = load_table(spark, sf_dir, "events")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    report = (
        expectation_report(
            ev,
            {
                "ev_error_rows": F.col("event_type") == "error",
                "ev_value_null_nan": F.col("value").isNull()
                | F.isnan("value"),
            },
        )
        .unionAll(
            referential_orphans(
                o, c, "o_custkey", "c_custkey", "orders_orphan_custkey"
            )
        )
        .unionAll(duplicate_keys(o, "o_orderkey", "orders_pk_duplicates"))
    )
    print("== data-quality report ==")
    report.orderBy("check_name").show(truncate=False)

    # -- 2..3. series QC + drift screen --------------------------------
    from mhw3d_detection_spark.queries.base import orders_daily

    od = orders_daily(spark, sf_dir)  # the canonical multi-year series

    spikes = despike_mad(od, z_thresh=3.5)
    print("== spike QC (clean data: expect 0 flagged) ==")
    spikes.agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum(F.col("is_spike").cast("int")).alias("n_spikes"),
    ).show()

    print("== EWMA smooth (last rows of one cell) ==")
    ewma_smooth(od, window=16).filter(
        (F.col("cell_id") == 0) & F.col("ewma").isNotNull()
    ).orderBy(F.desc("time")).show(3)

    print("== CUSUM drift screen (per-cell alarm summary) ==")
    cusum = cusum_changepoints(
        od, allowance=float(2**16), threshold=float(2**18)
    )
    cusum.groupBy("cell_id").agg(
        F.sum(F.col("alarm_pos").cast("int")).alias("n_alarm_pos"),
        F.sum(F.col("alarm_neg").cast("int")).alias("n_alarm_neg"),
        F.max("cusum_pos").alias("max_cusum_pos"),
    ).orderBy("cell_id").show()

    # -- 4. windowed drift monitor (r11): KS/W1/PSI per 7-day window of
    # the live event values against a fixed reference histogram — the
    # batch twin of streaming_drift_gate (swap the source for
    # readStream and the same readout arrives on watermark close)
    from mhw3d_detection_spark.operators.analysis import (
        drift_ref_hist,
        window_drift_scores,
    )

    ev = load_table(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull()
    )
    ref = drift_ref_hist(
        ev.filter(F.col("user_id") % 5 == 4), "value", rq_digits=0
    )
    print("== windowed drift monitor (ref bins:", len(ref), ") ==")
    window_drift_scores(
        ev.filter(F.col("user_id") % 5 != 4), ref, "value",
        time_col="ts", window_days=7, rq_digits=0,
    ).orderBy("win_id").show()

    spark.stop()


if __name__ == "__main__":
    main()

"""The composed survival-analysis flagship: the session duration frame
computed ONCE, then every readout of the survival family emitted from
that shared intermediate — the pooled Kaplan-Meier curve (W14km), the
per-entry-cohort curves (W14kc), and the each-cohort-vs-rest log-rank
tests (W14kl) — as ONE long-form report.

Why composed: the three standalone oracle rows each rebuild the
identical session frame from the raw event log (the per-user
sessionize window pass is the only corpus-sized stage any of them
has), because the driver protocol runs rows independently. A nightly
product-health job wants that pass paid ONCE — the ``dedup_report``
economics (VERDICT r12 Next #6; measured composed-vs-standalone ratio
in docs/PLANS.md r13).

Scale shape: one per-user shuffle builds sessions; everything
downstream runs on the bounded distinct-durations spine (curves) and
the (cohorts × durations) dense spine (log-rank) — session-count and
domain-bounded, never corpus-sized. ``localCheckpoint`` truncates the
frame lineage so the three report branches reference the materialized
block instead of re-embedding the sessionize plan (the
``curate_corpus`` device), routed through ``plans.audit_hook.ckpt`` so
the plan audit still prices the pre-checkpoint stage.

Output schema (one unified long form), section ∈
{'pooled', 'cohort', 'logrank'}:
``(section, cohort, dur_minutes, n_risk, n_events, n_censored,
hazard, log_survival, survival, e_events, lr_z, lr_chi2)``
- curve rows carry NULL e_events/lr_z/lr_chi2 (cohort NULL on pooled);
- logrank rows carry one row per cohort: n_events = observed
  completions O, e_events = pooled-hazard expectation E, Z=(O−E)/√V,
  chi² = Z² — and NULL curve columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def survival_report(
    events: DataFrame,
    *,
    reliable_checkpoints: bool = False,
) -> DataFrame:
    """Build the full session-survival report from ONE session-frame
    computation. EAGER: localCheckpoints the frame at call time (pass
    ``reliable_checkpoints=True`` on preemptible clusters — requires
    ``sc.setCheckpointDir``)."""
    from mhw3d_detection_spark.plans.audit_hook import ckpt
    from mhw3d_detection_spark.queries.relational import (
        _km_curve,
        _logrank_from_frame,
        session_frame_from_events,
    )

    d = ckpt(
        session_frame_from_events(events),
        "session_frame",
        reliable=reliable_checkpoints,
    )

    null_s = F.lit(None).cast("string")
    null_l = F.lit(None).cast("long")
    null_d = F.lit(None).cast("double")

    def curve_rows(curve: DataFrame, section: str, cohort) -> DataFrame:
        return curve.select(
            F.lit(section).alias("section"),
            cohort.alias("cohort"),
            "dur_minutes",
            "n_risk",
            "n_events",
            "n_censored",
            "hazard",
            "log_survival",
            "survival",
            null_d.alias("e_events"),
            null_d.alias("lr_z"),
            null_d.alias("lr_chi2"),
        )

    pooled = curve_rows(_km_curve(d, []), "pooled", null_s)
    cohort = curve_rows(_km_curve(d, ["cohort"]), "cohort", F.col("cohort"))
    lr = _logrank_from_frame(d).select(
        F.lit("logrank").alias("section"),
        "cohort",
        null_l.alias("dur_minutes"),
        null_l.alias("n_risk"),
        F.col("o_events").alias("n_events"),
        null_l.alias("n_censored"),
        null_d.alias("hazard"),
        null_d.alias("log_survival"),
        null_d.alias("survival"),
        "e_events",
        "lr_z",
        "lr_chi2",
    )
    return pooled.unionByName(cohort).unionByName(lr)

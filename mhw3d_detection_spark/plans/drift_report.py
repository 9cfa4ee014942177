"""The composed distribution-drift report: ONE value histogram feeds
every old-vs-new drift statistic — exact KS sup-norm (with argmax
location), exact Wasserstein-1 mass distance, and banded PSI — as one
long-form result. The monitoring-family analogue of
``plans.corpus_report``: the standalone rows (q_ks_drift,
q_wasserstein_drift, q_text_drift_psi) each re-scan the corpus for
their own histogram; a drift monitor fires all three tests on every
snapshot and wants the corpus touched ONCE.

Why all three (VERDICT r9's monitoring rationale, composed): KS is the
worst single CDF gap (sharp local shifts), W1 is the integrated gap
(broad small shifts KS under-weights), PSI is the binned alarm with the
industry >0.2 convention. A monitor that runs one of them has a blind
spot; a monitor that runs three scans pays 3× ingest.

Economics: the corpus is reduced to the (value, c_old, c_new)
distinct-value histogram by ONE hash aggregate (domain-bounded by the
ks_two_sample contract — same ``rq_digits`` guard applies); the
histogram is localCheckpointed and every statistic is then
domain-bounded window/aggregate work over it.

Exactness: integer counts; KS diffs are exactly-rounded rationals
(RAW); W1 terms dyadic-quantized (2^-30) before the integer-gap
multiply (order-free sums); PSI terms dyadic-quantized (2^-20) after
the one ln (quantization absorbs the ulp-level libm difference).
Empty slices return NULL statistics with the counts visible (the
empty-slice rule).

Output schema: ``(metric, stat, x_at, n_old, n_new)``
- ``ks``:  stat = sup |F_old - F_new|, x_at = argmax value
- ``w1``:  stat = ∫|F_old - F_new| dx, x_at NULL
- ``psi``: stat = Σ (p_new - p_old)·ln(p_new/p_old) over value bands
  of width ``psi_band``, Laplace-smoothed on the observed-band spine;
  x_at NULL
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def drift_report(
    df: DataFrame,
    value_col: str,
    old_pred: Column,
    *,
    psi_band: int = 50,
    rq_digits: int | None = None,
) -> DataFrame:
    """Build the composed drift report from one materialized value
    histogram. EAGER (localCheckpoints the domain-sized histogram).

    ``old_pred`` marks the existing-corpus slice (rows where it is
    false are the new snapshot); ``psi_band`` is the integer band
    width for the PSI section (bands = value DIV psi_band);
    ``rq_digits`` forwards to the ks_two_sample domain guard
    (quantizes a continuous value column onto a bounded grid before
    the histogram — None asserts the domain is already bounded).
    """
    from mhw3d_detection_spark.operators.analysis import (
        _ks_domain_guard,
        dyadic_quantize,
    )

    from mhw3d_detection_spark.plans.audit_hook import ckpt

    x = _ks_domain_guard(value_col, rq_digits)
    g = ckpt(
        df.filter(F.col(value_col).isNotNull())
        .groupBy(x.alias("x"))
        .agg(
            F.sum(old_pred.cast("int")).cast("long").alias("c_old"),
            (F.count(F.lit(1)) - F.sum(old_pred.cast("int")))
            .cast("long").alias("c_new"),
        ),
        "histogram",
    )
    # coalesce to 0: on an EMPTY input the monitor's counts must read
    # ZERO, not unknown (sum over no rows is NULL) — stats stay NULL
    # via the both-nonempty guard (r11 adversarial review)
    tot = g.agg(
        F.coalesce(F.sum("c_old"), F.lit(0)).cast("long").alias("n_old"),
        F.coalesce(F.sum("c_new"), F.lit(0)).cast("long").alias("n_new"),
    )

    w = Window.orderBy("x").rowsBetween(Window.unboundedPreceding, 0)
    cum = g.select(
        "x",
        F.sum("c_old").over(w).cast("double").alias("a"),
        F.sum("c_new").over(w).cast("double").alias("b"),
        (F.lead("x").over(Window.orderBy("x")) - F.col("x"))
        .cast("double").alias("gap"),
    )
    both = (F.col("n_old") > 0) & (F.col("n_new") > 0)
    diff_c = F.when(
        both,
        F.abs(
            F.col("a") / F.col("n_old") - F.col("b") / F.col("n_new")
        ),
    )
    d = cum.crossJoin(F.broadcast(tot)).select(
        "x", "gap", "n_old", "n_new", diff_c.alias("diff")
    )

    null_x = F.lit(None).cast("long")

    wk = Window.orderBy(F.desc_nulls_last("diff"), F.col("x"))
    best = (
        d.withColumn("__r", F.row_number().over(wk))
        .filter(F.col("__r") == 1)
        .select(
            F.lit(1).alias("__k"),
            F.col("diff").alias("__stat"),
            F.col("x").cast("long").alias("__x"),
        )
    )
    # anchor on the always-one-row totals so an EMPTY histogram still
    # emits the ks row (NULL stat, counts visible) — the empty-slice
    # rule applies to empty INPUT too
    ks = (
        tot.withColumn("__k", F.lit(1))
        .join(F.broadcast(best), "__k", "left")
        .select(
            F.lit("ks").alias("metric"),
            F.col("__stat").alias("stat"),
            F.col("__x").alias("x_at"),
            "n_old",
            "n_new",
        )
    )

    w1_terms = d.filter(F.col("gap").isNotNull()).select(
        F.sum(
            F.when(both, dyadic_quantize(F.col("diff"), 30) * F.col("gap"))
        ).alias("__w1")
    )
    w1 = tot.crossJoin(F.broadcast(w1_terms)).select(
        F.lit("w1").alias("metric"),
        F.when(both, F.coalesce(F.col("__w1"), F.lit(0.0))).alias("stat"),
        null_x.alias("x_at"),
        "n_old",
        "n_new",
    )

    # floor division (NOT Spark's `div`, which truncates toward zero):
    # negative value domains must band identically to the oracle's `//`
    bands = g.groupBy(
        F.floor(F.col("x") / F.lit(float(psi_band))).cast("long").alias(
            "band"
        )
    ).agg(
        F.sum("c_old").cast("long").alias("bo"),
        F.sum("c_new").cast("long").alias("bn"),
    )
    nb = bands.agg(F.count(F.lit(1)).cast("long").alias("nb"))
    po = (F.col("bo") + F.lit(1.0)) / (F.col("n_old") + F.col("nb"))
    pn = (F.col("bn") + F.lit(1.0)) / (F.col("n_new") + F.col("nb"))
    term = (pn - po) * F.log(pn / po)
    psi_terms = (
        bands.crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(nb))
        .select(F.when(both, dyadic_quantize(term, 20)).alias("t"))
        .agg(F.sum("t").alias("__psi"))
    )
    # grand aggregate (not groupBy) + totals anchor: one psi row even
    # on an empty histogram
    psi = tot.crossJoin(F.broadcast(psi_terms)).select(
        F.lit("psi").alias("metric"),
        F.when(both, F.col("__psi")).alias("stat"),
        null_x.alias("x_at"),
        "n_old",
        "n_new",
    )

    return ks.unionAll(w1).unionAll(psi)

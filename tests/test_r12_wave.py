"""Round-12 wave tests: Kruskal-Wallis, Brown-Forsythe, Kaplan-Meier —
brute-force / hand-computed pins for the new statistics, independent of
the DuckDB oracle rows (which check cross-engine bits, not math)."""

import datetime as dt
import math

import pytest
from pyspark.sql import functions as F

from mhw3d_detection_spark.operators.analysis import kruskal_wallis


def _kw_brute(groups):
    """Reference H from first principles: average ranks with ties."""
    pooled = sorted(x for g in groups for x in g)
    n = len(pooled)
    # average rank per value
    ranks = {}
    i = 0
    while i < n:
        j = i
        while j < n and pooled[j] == pooled[i]:
            j += 1
        ranks[pooled[i]] = (i + 1 + j) / 2.0
        i = j
    h = 12.0 / (n * (n + 1)) * sum(
        sum(ranks[x] for x in g) ** 2 / len(g) for g in groups
    ) - 3 * (n + 1)
    ties = 0
    from collections import Counter

    for _, t in Counter(pooled).items():
        ties += t**3 - t
    corr = 1.0 - ties / (n**3 - n)
    return h, h / corr if corr > 0 else None


def test_kruskal_wallis_matches_bruteforce(spark):
    groups = [
        [12, 15, 15, 20, 8],
        [30, 25, 15, 40],
        [5, 8, 9, 12, 12, 7],
    ]
    rows = [
        (f"g{i}", v) for i, g in enumerate(groups) for v in g
    ]
    df = spark.createDataFrame(rows, "src string, v long")
    r = kruskal_wallis(df, "v", "src").collect()[0]
    h, hc = _kw_brute(groups)
    assert r.k_groups == 3 and r.n == 15 and r.dof == 2
    assert r.h_stat == pytest.approx(h, abs=1e-5)
    assert r.h_tie_corrected == pytest.approx(hc, abs=1e-5)


def test_kruskal_wallis_all_tied_null_correction(spark):
    # every value identical: correction = 0 -> corrected H NULL,
    # raw H defined (0 up to quantization)
    df = spark.createDataFrame(
        [("a", 5), ("a", 5), ("b", 5), ("b", 5)], "src string, v long"
    )
    r = kruskal_wallis(df, "v", "src").collect()[0]
    assert r.h_tie_corrected is None
    assert r.h_stat == pytest.approx(0.0, abs=1e-4)


def test_kruskal_wallis_empty_and_single_group(spark):
    empty = spark.createDataFrame([], "src string, v long")
    assert kruskal_wallis(empty, "v", "src").collect() == []
    one = spark.createDataFrame([("a", 1), ("a", 2)], "src string, v long")
    r = kruskal_wallis(one, "v", "src").collect()[0]
    assert r.k_groups == 1
    assert r.h_stat is None and r.h_tie_corrected is None and r.dof is None


def test_kruskal_wallis_k2_consistent_with_rank_two_sample(spark):
    # k=2 KW and Mann-Whitney are the same test: H = z^2 in the
    # tie-corrected normal approximation (exact identity for the
    # statistics as defined)
    from mhw3d_detection_spark.operators.analysis import rank_two_sample

    rows = [("a", v) for v in [3, 7, 7, 12, 20]] + [
        ("b", v) for v in [1, 4, 7, 9]
    ]
    df = spark.createDataFrame(rows, "src string, v long")
    kw = kruskal_wallis(df, "v", "src").collect()[0]
    u = rank_two_sample(df, "v", F.col("src") == "a").collect()[0]
    assert kw.h_tie_corrected == pytest.approx(u.z_stat**2, abs=1e-6)


def _km_events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string"
    )


def test_survival_km_handcomputed(spark, tmp_path):
    """Sessions of 60/60/180 minutes completed, one 120-minute session
    still open at stream end (censored): S(60)=1-2/4=0.5, S(120)
    carried, S(180)=0 (everyone at risk completes). Each user's two
    events are < 2 h apart, so each user contributes ONE session."""
    base = dt.datetime(2024, 1, 1)
    rows = []
    for uid, hours in ((1, 1), (2, 1), (3, 3)):
        rows += [
            (uid * 10, base, uid, "view", 1.0, "{}"),
            (uid * 10 + 1, base + dt.timedelta(hours=hours), uid,
             "view", 1.0, "{}"),
        ]
    # user 3's 3h span: events 3h apart exceed the 2h gap -> TWO
    # single-event sessions; use 3 events 1.5h apart instead
    rows = [r for r in rows if r[2] != 3]
    rows += [
        (30, base, 3, "view", 1.0, "{}"),
        (31, base + dt.timedelta(hours=1, minutes=30), 3, "view", 1.0, "{}"),
        (32, base + dt.timedelta(hours=3), 3, "view", 1.0, "{}"),
    ]
    # user 4: 120-min session whose last event IS the stream max ->
    # possibly still open -> censored
    rows += [
        (40, base + dt.timedelta(days=19, hours=22), 4, "view", 1.0, "{}"),
        (41, base + dt.timedelta(days=20), 4, "view", 1.0, "{}"),
    ]
    df = _km_events(spark, rows)
    df.write.parquet(str(tmp_path / "events.parquet"))
    from mhw3d_detection_spark.queries.base import REGISTRY

    out = {
        r.dur_minutes: r
        for r in REGISTRY["q_survival_km"].spark_fn(
            spark, str(tmp_path)
        ).collect()
    }
    assert set(out) == {60, 120, 180}
    assert out[60].n_risk == 4 and out[60].n_events == 2
    assert out[60].survival == pytest.approx(0.5, abs=1e-6)
    assert out[60].hazard == pytest.approx(0.5)
    assert out[120].n_risk == 2 and out[120].n_events == 0
    assert out[120].n_censored == 1
    assert out[120].survival == pytest.approx(0.5, abs=1e-6)  # carried
    assert out[180].n_risk == 1 and out[180].n_events == 1
    assert out[180].survival == 0.0  # d=n -> exact 0
    assert out[180].log_survival is None
    # log_survival is the raw-exact quantity: exp(log_survival) ~ S
    assert out[60].log_survival == pytest.approx(-0.6931472, abs=1e-6)


def test_survival_km_no_observed_events(spark, tmp_path):
    # every session's last event within one 2h gap of the stream end:
    # all censored, survival stays exactly 1.0 at every step
    base = dt.datetime(2024, 1, 1)
    rows = []
    for uid in (1, 2):
        rows += [
            (uid * 10, base + dt.timedelta(days=19), uid, "view", 1.0, "{}"),
            (uid * 10 + 1, base + dt.timedelta(days=19, hours=uid), uid,
             "view", 1.0, "{}"),
        ]
    df = _km_events(spark, rows)
    df.write.parquet(str(tmp_path / "events.parquet"))
    from mhw3d_detection_spark.queries.base import REGISTRY

    out = REGISTRY["q_survival_km"].spark_fn(spark, str(tmp_path)).collect()
    assert out and all(
        r.survival == 1.0 and r.n_events == 0 and r.log_survival == 0.0
        for r in out
    )


def test_levene_bf_detects_spread_difference(spark):
    # same means, wildly different spreads -> large F; swap to equal
    # spreads -> F near 0
    import random

    rng = random.Random(5)
    tight = [("a", 100 + rng.randrange(-2, 3)) for _ in range(200)]
    wide = [("b", 100 + rng.randrange(-50, 51)) for _ in range(200)]
    from mhw3d_detection_spark.queries.base import REGISTRY

    df = spark.createDataFrame(tight + wide, "source string, n_chars long")
    # drive the registered builder's math via the operator path
    from mhw3d_detection_spark.operators.analysis import anova_oneway

    med = df.groupBy("source").agg(
        F.expr("percentile(n_chars, 0.5)").alias("med")
    )
    z = df.join(F.broadcast(med), "source").select(
        "source",
        F.floor(
            F.abs(F.col("n_chars").cast("double") - F.col("med"))
            * F.lit(2.0)
            + F.lit(0.5000152587890625)
        ).cast("long").alias("zq"),
    )
    r = anova_oneway(z, "zq", "source").collect()[0]
    assert r.f_stat is not None and r.f_stat > 100.0


def test_kruskal_wallis_overflow_guard_raises(spark):
    # 2.2M tied rows: n*maxc^2 cubes past 2^63 — the guard keeps the
    # failure loud under non-ANSI configs (the rank_two_sample device)
    df = (
        spark.range(2_200_000)
        .select(F.lit("a").alias("src"), F.lit(1).alias("v"))
        .union(
            spark.range(10).select(
                F.lit("b").alias("src"), F.lit(2).alias("v")
            )
        )
    )
    prev = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "false")
    try:
        with pytest.raises(Exception, match="integer-magnitude contract"):
            kruskal_wallis(df, "v", "src").collect()
    finally:
        spark.conf.set("spark.sql.ansi.enabled", prev)


def test_survival_km_cohort_partitions_and_hazard(spark, tmp_path):
    """Two entry-type cohorts (the SESSION's first event type) with
    different completion speeds: each cohort gets its own independent
    curve (per-cohort at-risk counts), and hazard = d/n exactly."""
    base = dt.datetime(2024, 1, 1)
    rows = []
    # cohort 'view' (users 1, 2): 60-min sessions, completed
    for uid in (1, 2):
        rows += [
            (uid * 10, base, uid, "view", 1.0, "{}"),
            (uid * 10 + 1, base + dt.timedelta(hours=1), uid,
             "click", 1.0, "{}"),
        ]
    # cohort 'purchase': user 3's 120-min session completed, user 4's
    # 120-min session ends AT the stream max -> censored
    rows += [
        (30, base, 3, "purchase", 1.0, "{}"),
        (31, base + dt.timedelta(hours=2), 3, "view", 1.0, "{}"),
        (40, base + dt.timedelta(days=19, hours=22), 4,
         "purchase", 1.0, "{}"),
        (41, base + dt.timedelta(days=20), 4, "view", 1.0, "{}"),
    ]
    df = _km_events(spark, rows)
    df.write.parquet(str(tmp_path / "events.parquet"))
    from mhw3d_detection_spark.queries.base import REGISTRY

    out = {
        (r.cohort, r.dur_minutes): r
        for r in REGISTRY["q_survival_km_cohort"].spark_fn(
            spark, str(tmp_path)
        ).collect()
    }
    v = out[("view", 60)]
    assert v.n_risk == 2 and v.n_events == 2
    assert v.hazard == 1.0 and v.survival == 0.0  # d = n -> exact 0
    p2 = out[("purchase", 120)]
    assert p2.n_risk == 2 and p2.n_events == 1 and p2.n_censored == 1
    assert p2.hazard == pytest.approx(0.5)
    assert p2.survival == pytest.approx(0.5, abs=1e-6)
    # cohorts are independent: the 'view' completions never entered
    # the purchase cohort's at-risk pool
    assert ("purchase", 60) not in out

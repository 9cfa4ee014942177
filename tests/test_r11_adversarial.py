"""Round-11 adversarial review of the r10-new surfaces (VERDICT r10
Next #1): SRP edge inputs, composed-report degenerate inputs, W14
ordering under duplicate timestamps, manifest stability under quality
ties, Kendall/Spearman on negative domains.

The heavier differentials (TPC-H family on NULL-injected keys/measures,
the 16 W14 rows on duplicate-timestamp bursts) ran through the full
verify harness against an adversarial SF dir during the review — all
hash-matched; this file pins the unit-sized edges permanently.
"""

from __future__ import annotations

import datetime as dt
import itertools
import math
import random
from collections import Counter

import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# SRP family edges: all-zero vectors, empty gate set, empty eval set
# ---------------------------------------------------------------------------
def test_srp_zero_vector_and_empty_gate(spark):
    from mhw3d_detection_spark.operators.similarity import srp_signatures
    from mhw3d_detection_spark.streaming import (
        srp_gate_sigs,
        streaming_srp_decontaminate_gate,
    )

    df = spark.createDataFrame(
        [(1, [0.0] * 64), (2, None), (3, [1.0] * 63)],
        "vec_id long, embedding array<double>",
    )
    # zero vector: every quantized dot is 0, sign bit [0 >= 0] = 1 ->
    # all-ones signature, deterministically, in every engine
    sigs = srp_signatures(df).collect()
    assert [(r.vec_id, r.srp_sig) for r in sigs] == [(1, 2**16 - 1)]

    # empty gate set: nothing flags, nothing crashes; NULL/ragged rows
    # get NULL signature + flagged 0 (the unknown-input convention)
    out = {
        r.vec_id: (r.srp_sig, r.flagged)
        for r in streaming_srp_decontaminate_gate(df, []).collect()
    }
    assert out == {1: (65535, 0), 2: (None, 0), 3: (None, 0)}

    # empty eval set through the builder -> empty literal set
    assert srp_gate_sigs(df.filter("vec_id < 0")) == []


# ---------------------------------------------------------------------------
# Composed reports on EMPTY input: monitors show zero counts (not NULL,
# not a crash); the corpus PROFILE deliberately raises (wiring bug)
# ---------------------------------------------------------------------------
def test_events_report_empty_input_zero_counts(spark):
    from mhw3d_detection_spark.plans import events_report

    ev = spark.createDataFrame(
        [], "user_id long, event_type string, ts timestamp"
    )
    out = events_report(ev).collect()
    assert [(r.section, r.n, r.m, r.x) for r in out] == [
        ("funnel", 0, 0, None)
    ]


def test_drift_report_empty_input_zero_counts(spark):
    from mhw3d_detection_spark.plans import drift_report

    d = spark.createDataFrame([], "doc_id long, n_chars long")
    out = drift_report(d, "n_chars", F.col("doc_id") % 5 != 4).collect()
    assert sorted(r.metric for r in out) == ["ks", "psi", "w1"]
    for r in out:
        assert r.stat is None and r.n_old == 0 and r.n_new == 0


def test_dedup_report_empty_input_empty_report(spark):
    from mhw3d_detection_spark.plans import dedup_report

    docs = spark.createDataFrame(
        [], "doc_id long, source string, text string, split string"
    )
    assert dedup_report(docs).collect() == []


def test_corpus_report_empty_input_raises(spark):
    # JUSTIFIED loud (docstring): the report profiles THE corpus — an
    # empty input is an upstream wiring bug, unlike the drift monitors'
    # legitimately-empty slices
    from mhw3d_detection_spark.plans import corpus_report

    docs = spark.createDataFrame(
        [], "doc_id long, source string, text string"
    )
    with pytest.raises(ValueError, match="empty corpus"):
        corpus_report(docs)


def test_drift_report_single_source_slice(spark):
    # one side empty (every doc in the "old" slice): stats NULL, counts
    # visible — the monitor sees n_new=0 instead of crashing
    from mhw3d_detection_spark.plans import drift_report

    d = spark.createDataFrame(
        [(i, 100 + i) for i in range(20)], "doc_id long, n_chars long"
    )
    out = {r.metric: r for r in drift_report(d, "n_chars", F.lit(True)).collect()}
    assert out["ks"].n_old == 20 and out["ks"].n_new == 0
    assert all(out[m].stat is None for m in ("ks", "w1", "psi"))


# ---------------------------------------------------------------------------
# Manifest stability under quality ties: identical quality -> doc_id
# breaks the tie, so the manifest is byte-stable across re-runs/reshards
# ---------------------------------------------------------------------------
def test_training_manifest_stable_under_quality_ties(spark):
    from mhw3d_detection_spark.queries.base import REGISTRY
    import mhw3d_detection_spark.queries  # noqa: F401

    fn = REGISTRY["q_training_manifest"].spark_fn
    import os
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        # every doc identical text -> identical quality: ALL ties
        docs = spark.createDataFrame(
            [(i, "s0", "the same exact text for every doc", "train")
             for i in range(40)],
            "doc_id long, source string, text string, split string",
        )
        docs.write.parquet(os.path.join(td, "documents.parquet"))
        a = fn(spark, td).collect()
        b = fn(spark, td).collect()
        key = lambda r: (r.split, r.shard_id, r.pos, r.doc_id)  # noqa: E731
        assert sorted(map(key, a)) == sorted(map(key, b))
        # within each (split, shard): pos follows doc_id order exactly
        for (s, sh), grp in itertools.groupby(
            sorted(a, key=lambda r: (r.split, r.shard_id, r.pos)),
            key=lambda r: (r.split, r.shard_id),
        ):
            ids = [r.doc_id for r in grp]
            assert ids == sorted(ids), (s, sh, ids)


# ---------------------------------------------------------------------------
# Kendall tau-b / Spearman on NEGATIVE value domains vs brute force
# ---------------------------------------------------------------------------
def test_kendall_negative_domain_exact_vs_bruteforce(spark):
    from mhw3d_detection_spark.operators.analysis import kendall_tau_b

    rng = random.Random(5)
    rows = [(rng.randrange(-15, 10), rng.randrange(-8, 12)) for _ in range(200)]
    r = kendall_tau_b(
        spark.createDataFrame(rows, "x long, y long"), "x", "y"
    ).collect()[0]
    C = D = 0
    for (x1, y1), (x2, y2) in itertools.combinations(rows, 2):
        p = (x1 - x2) * (y1 - y2)
        C += p > 0
        D += p < 0
    n = len(rows)
    n0 = n * (n - 1) // 2
    cx, cy = Counter(x for x, _ in rows), Counter(y for _, y in rows)
    n1 = sum(c * (c - 1) // 2 for c in cx.values())
    n2 = sum(c * (c - 1) // 2 for c in cy.values())
    assert (r.n, r.n_pairs, r.concordant, r.discordant) == (n, n0, C, D)
    assert r.tau_b == pytest.approx(
        (C - D) / math.sqrt(float(n0 - n1) * float(n0 - n2)), abs=1e-14
    )


def test_spearman_negative_domain_exact_vs_bruteforce(spark):
    from mhw3d_detection_spark.operators.analysis import spearman_corr

    rng = random.Random(9)
    rows = [(rng.randrange(-30, 5), rng.randrange(-6, 20)) for _ in range(150)]
    s = spearman_corr(
        spark.createDataFrame(rows, "x long, y long"), "x", "y"
    ).collect()[0]

    def avranks(vals):
        order = sorted(range(len(vals)), key=lambda i: vals[i])
        ranks = [0.0] * len(vals)
        i = 0
        while i < len(order):
            j = i
            while j + 1 < len(order) and vals[order[j + 1]] == vals[order[i]]:
                j += 1
            rr = (i + j) / 2.0 + 1.0
            for k in range(i, j + 1):
                ranks[order[k]] = rr
            i = j + 1
        return ranks

    rx = avranks([x for x, _ in rows])
    ry = avranks([y for _, y in rows])
    n = len(rows)
    mx, my = sum(rx) / n, sum(ry) / n
    num = sum((a - mx) * (b - my) for a, b in zip(rx, ry))
    den = math.sqrt(
        sum((a - mx) ** 2 for a in rx) * sum((b - my) ** 2 for b in ry)
    )
    assert s.rho == pytest.approx(num / den, abs=1e-4)


# ---------------------------------------------------------------------------
# W14 entry/exit determinism under duplicate timestamps (unit-sized pin;
# the full-family differential ran via the adversarial SF dir)
# ---------------------------------------------------------------------------
def test_session_entry_exit_duplicate_ts_deterministic(spark):
    from mhw3d_detection_spark.queries.base import REGISTRY
    import mhw3d_detection_spark.queries  # noqa: F401

    import os
    import tempfile

    t0 = dt.datetime(2024, 1, 5, 12, 0, 0)
    rows = [
        (1, t0, 7, "view", 1.0, "{}"),
        (2, t0, 7, "purchase", 2.0, "{}"),   # same user, SAME ts
        (3, t0, 7, "click", 3.0, "{}"),      # same again
        (4, t0 + dt.timedelta(hours=5), 7, "view", 1.0, "{}"),
    ]
    with tempfile.TemporaryDirectory() as td:
        spark.createDataFrame(
            rows,
            "event_id long, ts timestamp, user_id long, "
            "event_type string, value double, props string",
        ).write.parquet(os.path.join(td, "events.parquet"))
        fn = REGISTRY["q_session_entry_exit"].spark_fn
        a = sorted(map(tuple, fn(spark, td).collect()))
        b = sorted(map(tuple, fn(spark, td).collect()))
        assert a == b
        # entry of the tied burst = min event_id ('view'), exit = max
        # within the first session; the 5h gap opens a second session
        flat = {(r[0], r[1]): r[2] for r in a}
        assert flat.get(("view", "click")) == 1  # first session v->c
        assert flat.get(("view", "view")) == 1   # the singleton session


# ---------------------------------------------------------------------------
# r11 self-review closures (code-review findings #3/#4/#5)
# ---------------------------------------------------------------------------
def test_drift_family_excludes_nan_consistently(spark):
    # NaN is a NON-value in all three drift faces: reference builder,
    # batch twin, streaming guard — so a dirty feed cannot break the
    # batch/stream bit-parity contract (finding #3)
    from mhw3d_detection_spark.operators.analysis import (
        drift_ref_hist,
        window_drift_scores,
    )

    rows = [
        (dt.datetime(2024, 3, 1, h), float(10 + h)) for h in range(8)
    ] + [(dt.datetime(2024, 3, 1, 9), float("nan"))]
    df = spark.createDataFrame(rows, "time timestamp, val double")
    ref = drift_ref_hist(df, "val")
    assert sum(c for _, c in ref) == 8  # NaN excluded
    out = window_drift_scores(df, ref, "val", time_col="time").collect()
    assert len(out) == 1 and out[0].n_new == 8


def test_rank_two_sample_overflow_guard_raises(spark):
    # 2.2M tied rows cube past 2^63: ANSI Spark raises on the multiply,
    # non-ANSI would silently wrap — the guard keeps it loud there too
    # (finding #4; the anova_oneway device)
    from mhw3d_detection_spark.operators.analysis import rank_two_sample

    df = (
        spark.range(2_200_000)
        .select(F.lit(1).alias("v"), (F.col("id") % 2 == 0).alias("o"))
    )
    with pytest.raises(
        Exception,
        match="integer-magnitude contract|ARITHMETIC_OVERFLOW|[Oo]verflow",
    ):
        rank_two_sample(df, "v", F.col("o")).collect()
    prev = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "false")
    try:
        with pytest.raises(Exception, match="integer-magnitude contract"):
            rank_two_sample(df, "v", F.col("o")).collect()
    finally:
        spark.conf.set("spark.sql.ansi.enabled", prev)


def test_dedup_edit_verify_null_text_flags_zero(spark):
    # NULL-text pair: dist/ratio NULL, verified/truncated 0 in BOTH
    # engines (the oracle's CASE..ELSE 0 path; finding #5)
    from mhw3d_detection_spark.operators.textops import dedup_edit_verify

    docs = spark.createDataFrame(
        [(1, None), (2, "hello")], "doc_id long, text string"
    )
    pairs = spark.createDataFrame([(1, 2)], "doc_a long, doc_b long")
    r = dedup_edit_verify(docs, pairs, max_len=100).collect()[0]
    assert r.edit_dist is None and r.edit_ratio is None
    assert r.verified == 0 and r.truncated == 0

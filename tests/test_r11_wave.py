"""Pins for the r11 operator wave: rank test, weighted/balanced
sampling, Simpson concentration, Markov entropy, Tukey fences.
Each checked against an independent Python brute-force on synthetic
inputs (the oracle rows check cross-engine equality; these check the
MATH)."""

from __future__ import annotations

import datetime as dt
import hashlib
import math
import os
import random
import tempfile
from collections import Counter

import pytest
from pyspark.sql import functions as F

import mhw3d_detection_spark.queries  # noqa: F401 — populate REGISTRY
from mhw3d_detection_spark.queries.base import REGISTRY


def _docs_dir(spark, td, rows):
    spark.createDataFrame(
        rows, "doc_id long, source string, text string, split string, n_chars long"
    ).write.parquet(os.path.join(td, "documents.parquet"))
    return td


def test_rank_two_sample_bruteforce(spark):
    from mhw3d_detection_spark.operators.analysis import rank_two_sample

    rng = random.Random(21)
    rows = [(i, rng.randrange(-5, 8)) for i in range(180)]
    df = spark.createDataFrame(rows, "i long, v long")
    r = rank_two_sample(df, "v", F.col("i") % 3 != 0).collect()[0]
    old = sorted(v for i, v in rows if i % 3 != 0)
    new = sorted(v for i, v in rows if i % 3 == 0)
    gt = sum(1 for a in old for b in new if a > b)
    eq = sum(1 for a in old for b in new if a == b)
    u = gt + eq / 2.0
    n1, n2 = len(old), len(new)
    n = n1 + n2
    ties = Counter(old + new)
    t3t = sum(c**3 - c for c in ties.values())
    var = n1 * n2 / 12.0 * ((n + 1) - t3t / (n * (n - 1)))
    assert (r.n_old, r.n_new) == (n1, n2)
    assert r.u_stat == u  # half-integer exact
    assert r.cliffs_delta == pytest.approx(
        (2 * u - n1 * n2) / (n1 * n2), abs=1e-14
    )
    assert r.z_stat == pytest.approx(
        (u - n1 * n2 / 2.0) / math.sqrt(var), abs=1e-12
    )


def test_rank_two_sample_empty_slice_nulls(spark):
    from mhw3d_detection_spark.operators.analysis import rank_two_sample

    df = spark.createDataFrame([(1, 5), (2, 6)], "i long, v long")
    r = rank_two_sample(df, "v", F.lit(True)).collect()[0]
    assert r.n_old == 2 and r.n_new == 0
    assert r.u_stat is None and r.z_stat is None and r.cliffs_delta is None


def test_gumbel_topk_matches_python_keys(spark):
    fn = REGISTRY["q_gumbel_topk_sample"].spark_fn
    rng = random.Random(3)
    rows = [
        (i, f"s{i % 3}", "x" * rng.randrange(10, 400), "train",
         rng.randrange(10, 400))
        for i in range(200)
    ]
    with tempfile.TemporaryDirectory() as td:
        got = [
            (r.rank, r.doc_id)
            for r in sorted(
                _q(spark, fn, _docs_dir(spark, td, rows)), key=lambda r: r.rank
            )
        ]

    def key(doc_id, n_chars):
        bits = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:12], 16)
        u = float(bits + 1) / 281474976710657.0
        k = math.log(u) / float(max(n_chars, 1))
        return math.floor(k * 2.0**40 + (0.5 + 2.0**-16)) / 2.0**40

    ranked = sorted(
        ((key(i, nc), i) for i, _, _, _, nc in rows),
        key=lambda t: (-t[0], t[1]),
    )[:50]
    want = [(j + 1, i) for j, (_, i) in enumerate(ranked)]
    assert got == want


def _q(spark, fn, td):
    return fn(spark, td).collect()


def test_balanced_downsample_equal_counts(spark):
    fn = REGISTRY["q_balanced_downsample"].spark_fn
    rng = random.Random(4)
    rows = [
        (i, f"s{i % 4}" if i % 4 else "rare", "t", "train", 50)
        for i in range(97)
    ]
    with tempfile.TemporaryDirectory() as td:
        out = _q(spark, fn, _docs_dir(spark, td, rows))
        out2 = _q(spark, fn, td)
    by_src = Counter(r.source for r in out)
    n_min = min(
        Counter(s for _, s, _, _, _ in rows).values()
    )
    assert set(by_src.values()) == {n_min}
    assert sorted(map(tuple, out)) == sorted(map(tuple, out2))  # replayable


def test_source_simpson_bruteforce(spark):
    fn = REGISTRY["q_source_simpson"].spark_fn
    rows = [
        (1, "a", "the cat the cat the", "train", 19),
        (2, "a", "dog", "train", 3),
        (3, "b", "x y z", "train", 5),
    ]
    with tempfile.TemporaryDirectory() as td:
        out = {r.source: r for r in _q(spark, fn, _docs_dir(spark, td, rows))}
    # source a tokens: the*3 cat*2 dog*1 -> n=6, s2=9+4+1=14
    assert out["a"].n_tokens == 6 and out["a"].n_types == 3
    assert out["a"].simpson == 14.0 / 36.0
    assert out["a"].inv_simpson == 36.0 / 14.0
    assert out["b"].simpson == 3.0 / 9.0


def test_markov_entropy_hand_computed(spark):
    fn = REGISTRY["q_markov_entropy"].spark_fn
    t0 = dt.datetime(2024, 2, 1)
    seq = ["view", "click", "view", "purchase", "view", "click"]
    rows = [
        (i, t0 + dt.timedelta(minutes=i), 1, et, 1.0, "{}")
        for i, et in enumerate(seq)
    ]
    with tempfile.TemporaryDirectory() as td:
        spark.createDataFrame(
            rows,
            "event_id long, ts timestamp, user_id long, event_type string, "
            "value double, props string",
        ).write.parquet(os.path.join(td, "events.parquet"))
        out = {r.from_type: r for r in fn(spark, td).collect()}
    # transitions: view->click x2, view->purchase x1, click->view x2,
    # purchase->view x1
    v = out["view"]
    assert v.n_from == 3 and v.n_to_types == 2
    h = math.log(3) - (2 * math.log(2) + 1 * math.log(1)) / 3
    assert v.row_entropy == pytest.approx(h, abs=1e-4)
    assert out["click"].row_entropy == pytest.approx(0.0, abs=1e-4)


def test_tukey_outliers_hand_computed(spark):
    fn = REGISTRY["q_tukey_outliers"].spark_fn
    vals = [10, 12, 14, 16, 18, 20, 500]  # one wild outlier
    rows = [
        (i, "s", "t", "train", v) for i, v in enumerate(vals)
    ]
    with tempfile.TemporaryDirectory() as td:
        out = _q(spark, fn, _docs_dir(spark, td, rows))
    r = out[0]
    # quantile_cont on sorted vals: q1 at pos 1.5 -> 13, q3 at 4.5 -> 19...
    # pos = (n-1)*p = 6*0.25 = 1.5 -> 12 + 0.5*(14-12) = 13
    # q3: 6*0.75 = 4.5 -> 18 + 0.5*(20-18) = 19; iqr 6; lo 4, hi 28
    assert r.q1 == 13.0 and r.q3 == 19.0 and r.lo == 4.0 and r.hi == 28.0
    assert r.n_below == 0 and r.n_above == 1
    assert r.outlier_frac == pytest.approx(1.0 / 7.0)


# ---------------------------------------------------------------------------
# wave 2: temporal split / bootstrap diff / coverage / JSD
# ---------------------------------------------------------------------------
def test_temporal_split_boundaries_and_counts(spark):
    fn = REGISTRY["q_temporal_split"].spark_fn
    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (i, t0 + dt.timedelta(hours=i), i % 7, "view", 1.0, "{}")
        for i in range(100)
    ]
    with tempfile.TemporaryDirectory() as td:
        spark.createDataFrame(
            rows,
            "event_id long, ts timestamp, user_id long, event_type string, "
            "value double, props string",
        ).write.parquet(os.path.join(td, "events.parquet"))
        out = {r.split: r for r in fn(spark, td).collect()}
    # exact percentiles of 0..99 hours: b1 at 79.2h, b2 at 89.1h
    assert out["train"].n_events == 80
    assert out["val"].n_events == 10
    assert out["test"].n_events == 10
    # temporal ordering: every train event precedes every val/test one
    assert out["train"].us_max < out["val"].us_min < out["test"].us_min


def test_bootstrap_mean_diff_brackets_point(spark):
    fn = REGISTRY["q_bootstrap_mean_diff"].spark_fn
    rows = [
        (i, "s", "t", "train", 300 if i % 3 == 0 else 100)
        for i in range(240)
    ]
    with tempfile.TemporaryDirectory() as td:
        r = fn(spark, _docs_dir(spark, td, rows)).collect()[0]
    assert r.n_a == 80 and r.n_b == 160 and r.n_reps == 64
    assert r.diff_point == 200.0
    assert r.ci_lo <= r.diff_point <= r.ci_hi
    # constant within-slice values: every replicate mean diff is exactly
    # 200 regardless of weights -> degenerate CI pinned to the point
    assert r.ci_lo == 200.0 and r.ci_hi == 200.0


def test_coverage_curve_hand_computed(spark):
    fn = REGISTRY["q_coverage_curve"].spark_fn
    # 'a' x 6, 'b' x 3, 'c' x 1 -> tot 10, V=3
    rows = [(1, "s", "a a a a a a b b b c", "train", 19)]
    with tempfile.TemporaryDirectory() as td:
        out = {r.cutoff: r for r in fn(spark, _docs_dir(spark, td, rows))
               .collect()}
    for cut in (10, 100, 1000):
        r = out[cut]
        assert r.n_types == 3 and r.covered_tokens == 10
        assert r.coverage == 1.0


def test_js_divergence_bruteforce(spark):
    fn = REGISTRY["q_js_divergence"].spark_fn
    rows = [
        (1, "a", "x x y", "train", 5),
        (2, "b", "y z z z", "train", 7),
    ]
    with tempfile.TemporaryDirectory() as td:
        out = {r.source: r for r in fn(spark, _docs_dir(spark, td, rows))
               .collect()}

    def jsd(pc, qc):
        np_, nq = sum(pc.values()), sum(qc.values())
        toks = set(pc) | set(qc)
        s = 0.0
        for t in toks:
            p = pc.get(t, 0) / np_
            q = qc.get(t, 0) / nq
            m = (p + q) / 2
            if p > 0:
                s += 0.5 * p * math.log(p / m)
            if q > 0:
                s += 0.5 * q * math.log(q / m)
        return s

    a = {"x": 2, "y": 1}
    b = {"y": 1, "z": 3}
    assert out["a"].n_src == 3 and out["a"].n_rest == 4
    assert out["a"].jsd == pytest.approx(jsd(a, b), abs=1e-5)
    assert out["b"].jsd == pytest.approx(jsd(b, a), abs=1e-5)
    # bounded by ln 2
    assert 0.0 <= out["a"].jsd <= math.log(2.0) + 1e-9


# ---------------------------------------------------------------------------
# r11: the brute-force rows' constant-panel contract is enforceable
# (max_probes / max_panel — the edit-verify max_len pattern)
# ---------------------------------------------------------------------------
def test_cosine_topk_max_probes_caps_deterministically(spark):
    from mhw3d_detection_spark.operators.similarity import cosine_topk

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    capped = cosine_topk(emb, lambda c: c % 2 == 0, k=2, max_probes=7)
    out = capped.collect()
    probes = {r.probe_id for r in out}
    assert len(probes) == 7
    # deterministic: the cap picks the md5-order head, replayable
    out2 = {
        (r.probe_id, r.vec_id): r.cosine
        for r in cosine_topk(
            emb, lambda c: c % 2 == 0, k=2, max_probes=7
        ).collect()
    }
    assert {(r.probe_id, r.vec_id): r.cosine for r in out} == out2
    # capped results are a subset of the uncapped probe set's results
    full = {
        (r.probe_id, r.vec_id): r.cosine
        for r in cosine_topk(emb, lambda c: c % 2 == 0, k=2).collect()
    }
    assert all(full[k] == v for k, v in out2.items())


def test_mutual_nn_max_panel_caps(spark):
    from mhw3d_detection_spark.operators.similarity import mutual_nn_pairs

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    out = mutual_nn_pairs(emb, lambda c: c % 5 == 0, max_panel=12).collect()
    ids = {r.vec_id_a for r in out} | {r.vec_id_b for r in out}
    assert len(ids) <= 12
    # replayable
    out2 = mutual_nn_pairs(emb, lambda c: c % 5 == 0, max_panel=12).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, out2))

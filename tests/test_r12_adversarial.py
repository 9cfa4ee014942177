"""Adversarial edge-case pins for the r12-new surfaces — the contracts
a reviewer would probe: empty inputs, all-corrupt JSON, zero-match
joins, banded-domain rank tests, single-user survival, and the bench
auto-probe's verdict logic."""

import datetime as dt
import json

import pytest
from pyspark.sql import functions as F

from mhw3d_detection_spark.queries.base import REGISTRY


def _write_events(spark, rows, tmp_path):
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string"
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    return str(tmp_path)


def test_json_extract_all_corrupt_props(spark, tmp_path):
    # every props row malformed: extraction lands on typed NULL per
    # row — n counts rows, n_k counts zero, aggregates NULL, no error
    base = dt.datetime(2024, 1, 1)
    rows = [
        (i, base + dt.timedelta(hours=i), i, "view", 1.0, '{"k broken')
        for i in range(4)
    ]
    sf = _write_events(spark, rows, tmp_path)
    r = REGISTRY["q_json_extract"].spark_fn(spark, sf).collect()[0]
    assert r.n == 4 and r.n_k == 0
    assert r.sum_k is None and r.min_k is None and r.avg_k is None


def test_json_extract_empty_events(spark, tmp_path):
    sf = _write_events(spark, [], tmp_path)
    assert REGISTRY["q_json_extract"].spark_fn(spark, sf).collect() == []
    assert (
        REGISTRY["q_json_null_contract"].spark_fn(spark, sf).collect() == []
    )


def test_json_null_contract_mixed_valid_corrupt(spark, tmp_path):
    base = dt.datetime(2024, 1, 1)
    rows = [
        (1, base, 1, "view", 1.0, '{"k": 7}'),
        (2, base, 2, "view", 1.0, "not json at all"),
        (3, base, 3, "view", 1.0, None),  # NULL props
    ]
    sf = _write_events(spark, rows, tmp_path)
    r = REGISTRY["q_json_null_contract"].spark_fn(spark, sf).collect()[0]
    # n_k counts only the parseable row; missing-key extraction is
    # NULL on every row (valid, corrupt, and NULL props alike)
    assert r.n == 3 and r.n_k == 1 and r.n_missing_null == 3


def test_tpch_q19_zero_match_single_null_row(spark, tmp_path):
    # no lineitem row survives any branch: the scalar agg still emits
    # ONE row — count 0, revenue NULL (sum over empty) — both engines
    import duckdb

    # pin the scalar-aggregate zero-match contract both engines share
    # (the registered row's shape: count over empty = 0, sum = NULL)
    rows = (
        spark.createDataFrame([], "rev double")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_items"),
            F.sum("rev").alias("revenue"),
        )
        .collect()
    )
    assert rows[0].n_items == 0 and rows[0].revenue is None
    con = duckdb.connect()
    d = con.execute(
        "SELECT CAST(count(*) AS BIGINT), sum(rev) FROM "
        "(SELECT 1.0::DOUBLE AS rev WHERE false)"
    ).fetchone()
    assert d == (0, None)


def test_kruskal_wallis_rq_digits_banding(spark):
    # continuous values: rq_digits bands the domain; the result must
    # equal brute-force KW computed on the banded values
    from mhw3d_detection_spark.operators.analysis import kruskal_wallis
    from mhw3d_detection_spark.queries.base import rq_py
    from tests.test_r12_wave import _kw_brute

    import random

    rng = random.Random(17)
    rows = [
        (f"g{i % 3}", rng.uniform(0, 10)) for i in range(90)
    ]
    df = spark.createDataFrame(rows, "src string, v double")
    r = kruskal_wallis(df, "v", "src", rq_digits=1).collect()[0]
    banded = {}
    for g, v in rows:
        banded.setdefault(g, []).append(rq_py(v, 1))
    h, hc = _kw_brute(list(banded.values()))
    assert r.h_stat == pytest.approx(h, abs=1e-4)
    assert r.h_tie_corrected == pytest.approx(hc, abs=1e-4)


def test_survival_km_single_user_two_sessions(spark, tmp_path):
    base = dt.datetime(2024, 1, 1)
    # one user, two events 5h apart: the gap splits them into two
    # single-event (0-minute) sessions — the first COMPLETED (a 2h
    # silence followed), the second still open at stream end (its last
    # event IS the stream max) -> censored
    rows = [
        (1, base, 1, "view", 1.0, "{}"),
        (2, base + dt.timedelta(hours=5), 1, "view", 1.0, "{}"),
    ]
    sf = _write_events(spark, rows, tmp_path)
    out = REGISTRY["q_survival_km"].spark_fn(spark, sf).collect()
    assert len(out) == 1
    r = out[0]
    assert r.dur_minutes == 0 and r.n_risk == 2
    assert r.n_events == 1 and r.n_censored == 1
    assert r.hazard == 0.5 and r.survival == pytest.approx(0.5, abs=1e-6)


def test_survival_logrank_identical_cohorts_z_zero(spark, tmp_path):
    # two cohorts with IDENTICAL completion behavior: O = E exactly,
    # z = 0 (the null the test must not reject on its own machinery)
    base = dt.datetime(2024, 1, 1)
    rows = []
    # both cohorts complete one session at 60 min and one at 90 min —
    # two distinct event times so the hypergeometric variance is > 0
    # (all-deaths-at-one-time makes V = 0 and z correctly NULL)
    for uid, etype, minutes in (
        (1, "view", 60), (2, "view", 90),
        (3, "click", 60), (4, "click", 90),
    ):
        rows += [
            (uid * 10, base, uid, etype, 1.0, "{}"),
            (uid * 10 + 1, base + dt.timedelta(minutes=minutes), uid,
             "view", 1.0, "{}"),
        ]
    # far-future single event pushes the cutoff so all above complete
    rows += [(90, base + dt.timedelta(days=10), 9, "view", 1.0, "{}")]
    sf = _write_events(spark, rows, tmp_path)
    out = {
        r.cohort: r
        for r in REGISTRY["q_survival_logrank"].spark_fn(
            spark, sf
        ).collect()
    }
    assert out["view"].o_events == 2 and out["click"].o_events == 2
    assert out["view"].lr_z == pytest.approx(0.0, abs=1e-6)
    assert out["click"].lr_z == pytest.approx(0.0, abs=1e-6)


def test_levene_bf_single_source_null_f(spark, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(
        pa.table(
            {
                "doc_id": list(range(6)),
                "source": ["only"] * 6,
                "lang": ["en"] * 6,
                "n_chars": [10, 20, 30, 40, 50, 60],
                "text": ["x"] * 6,
                "quality": [0.5] * 6,
            }
        ),
        str(tmp_path / "documents.parquet"),
    )
    r = REGISTRY["q_levene_bf"].spark_fn(spark, str(tmp_path)).collect()[0]
    assert r.k_groups == 1 and r.f_stat is None


def test_bench_probe_verdict_logic(spark):
    # drive _probe_moves on the tiny SF with fabricated prev numbers:
    # a fake regression whose probe reproduces -> confirmed_regression;
    # a fake 20x-slower prev -> improvement; an in-band row -> no probe
    import bench

    prev = {
        "q_join_hash_equi": 0.001,   # current will be >> 20% above
        "q_scan_project": 100.0,     # current will be >> 20% below
        "q_filter_year_range": None, # ignored: falsy prev
    }
    times = {}
    for name in ("q_join_hash_equi", "q_scan_project"):
        df = REGISTRY[name].spark_fn(spark, "/root/testdata/sf0.001")
        import time as _t

        t0 = _t.time()
        df.write.format("noop").mode("overwrite").save()
        times[name] = round(_t.time() - t0, 3)
    times["q_filter_year_range"] = 0.5
    probes = bench._probe_moves(
        spark, "/root/testdata/sf0.001", prev, times, {}
    )
    assert probes["q_join_hash_equi"]["verdict"] == "confirmed_regression"
    assert probes["q_scan_project"]["verdict"] == "improvement"
    assert "q_filter_year_range" not in probes
    for p in probes.values():
        assert p["probe_min"] <= p["probe_median"] <= p["probe_max"]

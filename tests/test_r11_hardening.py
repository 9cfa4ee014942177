"""Round-11 hardening: pins for the four r10-ADVICE closures plus the
adversarial-review fixes on the r10-new surfaces (VERDICT r10 Next #1).

Reference parity note: these tests guard the repo's OWN cross-engine
exactness conventions (queries/base.py docstring), not a reference
behavior — the reference (/root/reference/src/mhw3d) has no SQL oracle
layer.
"""

from __future__ import annotations

import datetime as dt
import re

import pytest
from pyspark.sql import functions as F

from mhw3d_detection_spark.operators.analysis import anova_oneway
from mhw3d_detection_spark.plans.events_report import events_report
from mhw3d_detection_spark.queries.base import dlit


# ---------------------------------------------------------------------------
# ADVICE r10 #1/#2 — dlit forces the DOUBLE parse path in DuckDB
# ---------------------------------------------------------------------------
def test_dlit_roundtrips_bit_exact_through_duckdb():
    import math

    import duckdb

    vals = [
        math.log10(1.0 + 1.0 / d) for d in range(1, 10)
    ] + [0.36787944117144233, 1e-300, 123456.78901234567]
    got = duckdb.sql(
        "SELECT " + ", ".join(dlit(v) for v in vals)
    ).fetchone()
    assert list(got) == vals  # bit-exact: strtod path, no DECIMAL hop


def test_dlit_always_emits_exponent_or_special():
    import duckdb

    for v in [0.5, 1.0, 3.0, 1e18]:
        s = dlit(v)
        assert "e" in s or "E" in s, s
    # non-finite: quoted-cast form — a bare inf/nan token would bind
    # as a COLUMN reference in DuckDB (code-review r11 #2)
    got = duckdb.sql(
        f"SELECT {dlit(float('inf'))}, {dlit(float('-inf'))}, "
        f"{dlit(float('nan'))}"
    ).fetchone()
    assert got[0] == float("inf") and got[1] == float("-inf")
    assert got[2] != got[2]  # NaN


def test_anova_guard_no_false_positive_on_small_group_outlier(spark):
    # the review's counterexample: one 3e9 value ALONE in its group —
    # its own sum of squares (9e18) fits int64, so the per-group bound
    # must NOT reject (the global n*max^2 bound falsely did)
    df = spark.createDataFrame(
        [(3_000_000_000, "a"), (5, "b"), (7, "b"), (9, "b")],
        "v long, g string",
    )
    row = anova_oneway(df, "v", "g").collect()[0]
    assert row.k_groups == 2 and row.n == 4 and row.f_stat is not None


# ---------------------------------------------------------------------------
# ADVICE r10 #3 — events_report takes the Column path for ts_col
# ---------------------------------------------------------------------------
def test_events_report_backtick_column_names(spark):
    rows = [
        ("u1", "view", dt.datetime(2024, 1, 1, 10)),
        ("u1", "purchase", dt.datetime(2024, 1, 1, 11)),
        ("u2", "view", dt.datetime(2024, 1, 8, 9)),
    ]
    df = spark.createDataFrame(
        rows, "`user id` string, `event.type` string, `ts col` timestamp"
    )
    out = events_report(
        df,
        user_col="user id",
        type_col="event.type",
        ts_col="ts col",
    ).collect()
    funnel = [r for r in out if r.section == "funnel"]
    assert funnel and funnel[0].n == 2 and funnel[0].m == 1


# ---------------------------------------------------------------------------
# ADVICE r10 #4 — anova_oneway fails LOUD (both engines) on overflow
# ---------------------------------------------------------------------------
def test_anova_overflow_contract_raises(spark):
    # per-row square still fits int64 (9e18 < 2^63) but the group SUM
    # wraps — under ANSI (Spark 4 default) the sum raises; under
    # non-ANSI the assert_true guard raises. Either way: LOUD, never a
    # silently wrong F (ADVICE r10 #4).
    big = 3_000_000_000
    df = spark.createDataFrame(
        [(big, "a"), (big - 1, "a"), (5, "b"), (7, "b")], "v long, g string"
    )
    with pytest.raises(
        Exception,
        match="integer-magnitude contract|ARITHMETIC_OVERFLOW|[Oo]verflow",
    ):
        anova_oneway(df, "v", "g").collect()


def test_anova_guard_raises_with_ansi_off(spark):
    # the guard is what keeps the failure loud on clusters that run
    # spark.sql.ansi.enabled=false (where int64 sums silently wrap)
    big = 3_000_000_000
    df = spark.createDataFrame(
        [(big, "a"), (big - 1, "a"), (5, "b"), (7, "b")], "v long, g string"
    )
    prev = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "false")
    try:
        with pytest.raises(Exception, match="integer-magnitude contract"):
            anova_oneway(df, "v", "g").collect()
    finally:
        spark.conf.set("spark.sql.ansi.enabled", prev)


def test_anova_in_contract_still_exact(spark):
    df = spark.createDataFrame(
        [(10, "a"), (20, "a"), (30, "b"), (40, "b"), (50, "b")],
        "v long, g string",
    )
    row = anova_oneway(df, "v", "g").collect()[0]
    assert row.k_groups == 2 and row.n == 5
    # hand-computed: means a=15, b=40, grand=30; ssb=2*225+3*100=750,
    # ssw=(100+400)/... within a: (10-15)^2+(20-15)^2=50; b: 200
    assert row.ss_between == 750.0 and row.ss_within == 250.0
    assert row.f_stat == pytest.approx(750.0 / (250.0 / 3.0))


# ---------------------------------------------------------------------------
# VERDICT r10 Next #8 — SURVEY §2 id discipline: duplicate row ids fail
# the suite instead of waiting for the judge (two rounds of re-lettering
# commits motivated this).
# ---------------------------------------------------------------------------
def test_survey_section2_ids_unique():
    import pathlib

    text = (
        pathlib.Path(__file__).resolve().parent.parent / "SURVEY.md"
    ).read_text(encoding="utf-8")
    m = re.search(r"^## 2\..*?(?=^## 3\.)", text, re.S | re.M)
    assert m, "SURVEY.md section 2 not found"
    ids = re.findall(r"^\| ([A-Z][A-Za-z0-9/§.\-]*) \|", m.group(0), re.M)
    ids = [i for i in ids if i not in ("Impl",)]  # header guard
    dupes = sorted({i for i in ids if ids.count(i) > 1})
    assert not dupes, f"duplicate SURVEY §2 row ids: {dupes}"
    assert len(ids) >= 200, f"unexpectedly few §2 rows parsed: {len(ids)}"


# ---------------------------------------------------------------------------
# VERDICT r10 Next #4 — edit-verify's DP cost cap is a parameter now
# ---------------------------------------------------------------------------
def test_dedup_edit_verify_max_len_truncates_and_flags(spark):
    from mhw3d_detection_spark.operators.textops import dedup_edit_verify

    docs = spark.createDataFrame(
        [
            (1, "abcdefghij" * 10),          # 100 chars
            (2, "abcdefghij" * 10 + "XYZ"),  # 103 chars, same 100-prefix
            (3, "short"),
            (4, "shirt"),
        ],
        "doc_id long, text string",
    )
    pairs = spark.createDataFrame(
        [(1, 2), (3, 4)], "doc_a long, doc_b long"
    )
    out = {
        (r.doc_a, r.doc_b): r
        for r in dedup_edit_verify(docs, pairs, max_len=100).collect()
    }
    r12 = out[(1, 2)]
    # identical 100-char prefixes: dist 0 on the truncated compare
    assert r12.edit_dist == 0 and r12.truncated == 1 and r12.verified == 1
    r34 = out[(3, 4)]
    assert r34.edit_dist == 1 and r34.truncated == 0
    # uncapped: full strings compared, flag uniformly 0
    full = {
        (r.doc_a, r.doc_b): r
        for r in dedup_edit_verify(docs, pairs).collect()
    }
    assert full[(1, 2)].edit_dist == 3 and full[(1, 2)].truncated == 0

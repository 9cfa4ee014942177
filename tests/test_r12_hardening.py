"""Round-12 hardening pins — closes the r12 ADVICE findings.

1. rank_two_sample empty-input: the guard must be vacuously true on a
   zero-row slice so the op returns the documented NULL row (matching
   the DuckDB oracle) instead of raising a misleading overflow error.
2. anova_oneway global-sum bound: the new gv guard must not falsely
   reject in-contract inputs (many near-bound single-row groups whose
   grand total still fits int64).
3. dedup_edit_verify truncated flag on NULL-text pairs follows
   three-valued OR: 1 iff the KNOWN side was actually cut.
"""

import pytest
from pyspark.sql import functions as F

from mhw3d_detection_spark.operators.analysis import (
    anova_oneway,
    rank_two_sample,
)
from mhw3d_detection_spark.operators.textops import dedup_edit_verify


# ---------------------------------------------------------------------------
# ADVICE r12 #1 — rank_two_sample empty input returns the NULL row
# ---------------------------------------------------------------------------
def test_rank_two_sample_empty_input_null_row(spark):
    # zero rows: global agg yields NULL counts; the guard must pass
    # vacuously (coalesce→True) and the op must emit ONE all-NULL row —
    # the same shape the DuckDB oracle produces on an empty slice.
    df = spark.createDataFrame([], "v long, o boolean")
    rows = rank_two_sample(df, "v", F.col("o")).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.n_old is None and r.n_new is None
    assert r.u_stat is None and r.z_stat is None and r.cliffs_delta is None


def test_rank_two_sample_all_null_values_null_row(spark):
    # all-NULL value column is the same empty slice after the isNotNull
    # filter — identical NULL-row contract, no overflow error
    df = spark.createDataFrame(
        [(None, True), (None, False)], "v long, o boolean"
    )
    rows = rank_two_sample(df, "v", F.col("o")).collect()
    assert len(rows) == 1
    assert rows[0].n_old is None and rows[0].u_stat is None


def test_rank_two_sample_nonempty_still_guarded(spark):
    # regression: the coalesce must not defang the guard on real
    # over-bound input (2.2M tied rows cube past 2^63)
    df = (
        spark.range(2_200_000)
        .select(F.lit(1).alias("v"), (F.col("id") % 2 == 0).alias("o"))
    )
    prev = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "false")
    try:
        with pytest.raises(Exception, match="integer-magnitude contract"):
            rank_two_sample(df, "v", F.col("o")).collect()
    finally:
        spark.conf.set("spark.sql.ansi.enabled", prev)


# ---------------------------------------------------------------------------
# ADVICE r12 #2 — anova_oneway global-sum bound: no false rejects
# ---------------------------------------------------------------------------
def test_anova_near_bound_groups_pass_global_guard(spark):
    # 64 single-row groups each at ~3e9: every per-group ng*mg^2 ≈ 9e18
    # sits just under 2^63 AND the grand total Σ ng*mg = 1.9e11 is far
    # inside the new global bound — must compute exactly, not raise
    big = 3_000_000_000
    df = spark.createDataFrame(
        [(big, f"g{i}") for i in range(64)], "v long, g string"
    )
    row = anova_oneway(df, "v", "g").collect()[0]
    assert row.k_groups == 64 and row.n == 64
    # identical values ⇒ ss_between = ss_within = 0, f NULL
    assert row.ss_between == 0.0 and row.ss_within == 0.0
    assert row.f_stat is None


def test_anova_in_contract_exact_with_global_guard(spark):
    # the hand-computed pin from r11 must be unchanged by the gv column
    df = spark.createDataFrame(
        [(10, "a"), (20, "a"), (30, "b"), (40, "b"), (50, "b")],
        "v long, g string",
    )
    row = anova_oneway(df, "v", "g").collect()[0]
    assert row.ss_between == 750.0 and row.ss_within == 250.0
    assert row.f_stat == pytest.approx(750.0 / (250.0 / 3.0))


# ---------------------------------------------------------------------------
# ADVICE r12 #3 — truncated flag semantics on NULL-text pairs
# ---------------------------------------------------------------------------
def test_edit_verify_null_text_truncated_follows_known_side(spark):
    docs = spark.createDataFrame(
        [(1, None), (2, "x" * 200), (3, "short")],
        "doc_id long, text string",
    )
    pairs = spark.createDataFrame(
        [(1, 2), (1, 3)], "doc_a long, doc_b long"
    )
    out = {
        (r.doc_a, r.doc_b): r
        for r in dedup_edit_verify(docs, pairs, max_len=100).collect()
    }
    # NULL vs over-length: NULL OR TRUE = TRUE in both engines → 1
    r12 = out[(1, 2)]
    assert r12.edit_dist is None and r12.verified == 0
    assert r12.truncated == 1
    # NULL vs in-bound: NULL OR FALSE = NULL → coalesce lands on 0
    r13 = out[(1, 3)]
    assert r13.edit_dist is None and r13.verified == 0
    assert r13.truncated == 0

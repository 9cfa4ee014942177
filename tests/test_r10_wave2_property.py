"""Property-based invariants for the r10 wave-2 statistical operators,
against pure-Python oracles — independent of the DuckDB gate (a wrong
idea expressed identically in both SQL engines still gets caught
here). Small random inputs, exact expectations, mirroring
test_r10_property.py.
"""

import math
from collections import Counter

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from mhw3d_detection_spark.operators.analysis import (
    anova_oneway,
    chi2_independence,
    kendall_tau_b,
)

pair_strategy = st.lists(
    st.tuples(st.integers(0, 5), st.integers(0, 4)),
    min_size=5,
    max_size=60,
)
group_strategy = st.lists(
    st.tuples(st.sampled_from("abc"), st.integers(0, 50)),
    min_size=6,
    max_size=60,
)


class TestKendallProperties:
    def _brute_cd(self, pairs):
        c = d = 0
        for i in range(len(pairs)):
            for j in range(i + 1, len(pairs)):
                sx = (pairs[i][0] > pairs[j][0]) - (
                    pairs[i][0] < pairs[j][0]
                )
                sy = (pairs[i][1] > pairs[j][1]) - (
                    pairs[i][1] < pairs[j][1]
                )
                c += sx * sy > 0
                d += sx * sy < 0
        return c, d

    @settings(max_examples=8, deadline=None)
    @given(pair_strategy)
    def test_antisymmetry_under_y_negation(self, spark, pairs):
        df = spark.createDataFrame(pairs, "x long, y long")
        neg = spark.createDataFrame(
            [(x, -y) for x, y in pairs], "x long, y long"
        )
        a = kendall_tau_b(df, "x", "y").collect()[0]
        b = kendall_tau_b(neg, "x", "y").collect()[0]
        # negating y swaps concordant/discordant exactly
        assert a["concordant"] == b["discordant"]
        assert a["discordant"] == b["concordant"]
        if a["tau_b"] is not None:
            assert b["tau_b"] == pytest.approx(-a["tau_b"], rel=1e-12)

    @settings(max_examples=8, deadline=None)
    @given(pair_strategy)
    def test_counts_match_bruteforce(self, spark, pairs):
        df = spark.createDataFrame(pairs, "x long, y long")
        got = kendall_tau_b(df, "x", "y").collect()[0]
        c, d = self._brute_cd(pairs)
        assert got["concordant"] == c
        assert got["discordant"] == d
        if got["tau_b"] is not None:
            assert -1.0 <= got["tau_b"] <= 1.0


class TestChi2Properties:
    @settings(max_examples=8, deadline=None)
    @given(
        st.lists(
            st.tuples(st.sampled_from("pq"), st.sampled_from("xyz")),
            min_size=4,
            max_size=50,
        )
    )
    def test_nonnegative_and_independent_product_is_zero(
        self, spark, rows
    ):
        df = spark.createDataFrame(rows, "a string, b string")
        got = chi2_independence(df, "a", "b").collect()[0]
        assert got["chi2"] >= -1e-9
        if got["cramers_v"] is not None:
            assert 0.0 <= got["cramers_v"] <= 1.0 + 1e-9
        # a perfectly independent product table scores ~0
        prod = [
            (a, b)
            for a in "pq"
            for b in "xyz"
            for _ in range(4)
        ]
        got0 = chi2_independence(
            spark.createDataFrame(prod, "a string, b string"), "a", "b"
        ).collect()[0]
        assert got0["chi2"] == pytest.approx(0.0, abs=1e-9)

    @settings(max_examples=6, deadline=None)
    @given(
        st.lists(
            st.tuples(st.sampled_from("pqr"), st.sampled_from("xy")),
            min_size=4,
            max_size=40,
        )
    )
    def test_symmetric_in_arguments(self, spark, rows):
        df = spark.createDataFrame(rows, "a string, b string")
        ab = chi2_independence(df, "a", "b").collect()[0]
        ba = chi2_independence(df, "b", "a").collect()[0]
        assert ab["chi2"] == pytest.approx(ba["chi2"], abs=1e-9)
        assert ab["dof"] == ba["dof"]


class TestAnovaProperties:
    @settings(max_examples=8, deadline=None)
    @given(group_strategy)
    def test_shift_invariance_and_decomposition(self, spark, rows):
        # F is invariant under adding a constant to every value, and
        # SSB + SSW equals total SS
        df = spark.createDataFrame(rows, "g string, v long")
        sh = spark.createDataFrame(
            [(g, v + 1000) for g, v in rows], "g string, v long"
        )
        a = anova_oneway(df, "v", "g").collect()[0]
        b = anova_oneway(sh, "v", "g").collect()[0]
        if a["f_stat"] is not None and b["f_stat"] is not None:
            assert a["f_stat"] == pytest.approx(b["f_stat"], rel=1e-6)
        vals = [v for _, v in rows]
        n = len(vals)
        mean = sum(vals) / n
        sst = sum((v - mean) ** 2 for v in vals)
        assert a["ss_between"] + a["ss_within"] == pytest.approx(
            sst, rel=1e-6, abs=1e-2
        )

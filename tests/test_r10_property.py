"""Property-based invariants for the r10 corpus-shape and statistics
operators, against pure-Python oracles — independent of the DuckDB
gate (a wrong idea expressed identically in both SQL engines still
gets caught here). Small random inputs, exact expectations, mirroring
test_curation_property.py.
"""

import math
import re
from collections import Counter

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

WORDS = ["a", "bb", "ccc", "dd", "e", "the", "fox", "of", "to"]
doc_strategy = st.lists(
    st.lists(st.sampled_from(WORDS), min_size=1, max_size=12).map(" ".join),
    min_size=1,
    max_size=6,
)


def _toks(text):
    return re.findall("[a-z0-9]+", text.lower())


class TestGiniProperties:
    @settings(max_examples=10, deadline=None)
    @given(doc_strategy)
    def test_gini_matches_bruteforce_and_bounds(self, spark, texts):
        from mhw3d_detection_spark.operators.textops import token_gini

        docs = spark.createDataFrame(
            list(enumerate(texts)), "doc_id long, text string"
        )
        counts = Counter()
        for t in texts:
            counts.update(_toks(t))
        if not counts:
            return
        xs = sorted(counts.values())
        n, tot = len(xs), sum(xs)
        s = sum((i + 1) * x for i, x in enumerate(xs))
        want = (2 * s - (n + 1) * tot) / (n * tot)
        r = token_gini(docs).collect()[0]
        assert r.n_types == n and r.n_tokens == tot
        assert abs(r.gini - want) < 1e-12
        assert 0.0 <= r.gini < 1.0  # Gini of counts >= 1 each


class TestNormalizeProperties:
    text_strategy = st.lists(
        st.text(
            alphabet=" \t\nabcXYZ09.,", min_size=0, max_size=40
        ),
        min_size=1,
        max_size=5,
    )

    @settings(max_examples=10, deadline=None)
    @given(text_strategy)
    def test_normalize_idempotent_and_fingerprint_stable(self, spark, texts):
        from mhw3d_detection_spark.operators.textops import (
            normalize_text_col,
            normalize_texts,
        )

        docs = spark.createDataFrame(
            list(enumerate(texts)), "doc_id long, text string"
        )
        once = docs.select(
            "doc_id", normalize_text_col(F.col("text")).alias("text")
        )
        n1 = {r.doc_id: r.norm_fingerprint
              for r in normalize_texts(docs).collect()}
        n2 = {r.doc_id: r.norm_fingerprint
              for r in normalize_texts(once).collect()}
        assert n1 == n2  # idempotent: normalizing twice changes nothing
        ch2 = {r.doc_id: r.changed for r in normalize_texts(once).collect()}
        assert all(v == 0 for v in ch2.values())


class TestSpearmanProperties:
    pair_strategy = st.lists(
        st.tuples(st.integers(0, 8), st.integers(0, 8)),
        min_size=3,
        max_size=40,
    )

    @settings(max_examples=10, deadline=None)
    @given(pair_strategy)
    def test_bounds_symmetry_and_monotone_invariance(self, spark, pairs):
        from mhw3d_detection_spark.operators.analysis import spearman_corr

        df = spark.createDataFrame(pairs, "x long, y long")
        r = spearman_corr(df, "x", "y").collect()[0]
        if r.rho is None:
            # a constant column — verify that's why
            xs = {a for a, _ in pairs}
            ys = {b for _, b in pairs}
            assert len(xs) == 1 or len(ys) == 1
            return
        assert -1.0 <= r.rho <= 1.0
        # symmetry: rho(x, y) == rho(y, x)
        r2 = spearman_corr(
            spark.createDataFrame(
                [(b, a) for a, b in pairs], "x long, y long"
            ),
            "x",
            "y",
        ).collect()[0]
        assert r2.rho == pytest.approx(r.rho, abs=1e-9)
        # invariance under a strictly monotone transform of x
        df3 = spark.createDataFrame(
            [(a * a + 3 * a, b) for a, b in pairs], "x long, y long"
        )  # x>=0 so x^2+3x is strictly increasing
        r3 = spearman_corr(df3, "x", "y").collect()[0]
        assert r3.rho == pytest.approx(r.rho, abs=1e-9)


class TestKsPerGroupProperties:
    @settings(max_examples=8, deadline=None)
    @given(
        st.lists(
            st.tuples(st.sampled_from(["p", "q"]), st.integers(0, 6)),
            min_size=4,
            max_size=40,
        )
    )
    def test_matches_bruteforce_two_group(self, spark, rows):
        from mhw3d_detection_spark.operators.analysis import ks_per_group

        df = spark.createDataFrame(
            [(i, g, v) for i, (g, v) in enumerate(rows)],
            "doc_id long, source string, n int",
        )
        got = {
            r.source: r for r in ks_per_group(df, "n", "source").collect()
        }
        groups = {g for g, _ in rows}
        for g in groups:
            a = sorted(v for gg, v in rows if gg == g)
            b = sorted(v for gg, v in rows if gg != g)
            r = got[g]
            assert r.n_group == len(a) and r.n_rest == len(b)
            if not b:
                assert r.ks_stat is None
                continue
            xs = sorted({v for _, v in rows})
            want = max(
                abs(
                    sum(1 for v in a if v <= x) / len(a)
                    - sum(1 for v in b if v <= x) / len(b)
                )
                for x in xs
            )
            assert r.ks_stat == pytest.approx(want, abs=1e-12)

"""Property-based differential tests of the curation operators against
brute-force pure-Python oracles — independent of the DuckDB gate, so a
bug present in BOTH SQL formulations (oracle and Spark expressing the
same wrong idea) still gets caught. Strategy mirrors
test_detection_property.py: small random inputs, exact expectations.
"""

import math
import re
from collections import Counter

from hypothesis import given, settings
from hypothesis import strategies as st

WORDS = ["a", "bb", "ccc", "dd", "e", "the", "fox"]
doc_strategy = st.lists(
    st.lists(st.sampled_from(WORDS), min_size=0, max_size=12).map(" ".join),
    min_size=1,
    max_size=6,
)


def _toks(text):
    return re.findall("[a-z0-9]+", text.lower())


def oracle_dup_span(texts, span):
    spans = {
        i: [
            " ".join(t[j : j + span])
            for t in [_toks(x)]
            for j in range(max(len(t) - span + 1, 0))
        ]
        for i, x in enumerate(texts)
    }
    carriers = Counter()
    for i, sp in spans.items():
        for s in set(sp):
            carriers[s] += 1
    out = {}
    for i, sp in spans.items():
        dup = sum(1 for s in sp if carriers[s] > 1)
        out[i] = (len(sp), dup)
    return out


def oracle_entropy(text):
    c = Counter(_toks(text))
    n = sum(c.values())
    if n == 0:
        return 0, 0, 0.0, 0.0
    h = math.log(n) - sum(v * math.log(v) for v in c.values()) / n
    return n, len(c), h, len(c) / n


class TestCurationProperties:
    @settings(max_examples=12, deadline=None)
    @given(doc_strategy)
    def test_dup_span_frac_matches_bruteforce(self, texts):
        from mhw3d_detection_spark.operators.textops import dup_span_frac

        spark = TestCurationProperties._spark
        df = spark.createDataFrame(
            list(enumerate(texts)), "doc_id long, text string"
        )
        got = {
            r["doc_id"]: (r["n_spans"], r["n_dup_spans"])
            for r in dup_span_frac(df, span=2).collect()
        }
        assert got == oracle_dup_span(texts, 2)

    @settings(max_examples=12, deadline=None)
    @given(doc_strategy)
    def test_token_entropy_matches_bruteforce(self, texts):
        from mhw3d_detection_spark.operators.textops import token_entropy

        spark = TestCurationProperties._spark
        df = spark.createDataFrame(
            list(enumerate(texts)), "doc_id long, text string"
        )
        got = {r["doc_id"]: r for r in token_entropy(df).collect()}
        for i, text in enumerate(texts):
            n, nd, h, ttr = oracle_entropy(text)
            assert got[i]["n_tokens"] == n
            assert got[i]["n_distinct"] == nd
            assert abs(got[i]["entropy"] - h) < 1e-9
            assert abs(got[i]["ttr"] - ttr) < 1e-9


import pytest  # noqa: E402


@pytest.fixture(scope="module", autouse=True)
def _bind_spark(spark):
    TestCurationProperties._spark = spark
    yield

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


class TestPackingProperties:
    @settings(max_examples=10, deadline=None)
    @given(doc_strategy)
    def test_pack_sequences_invariants(self, texts):
        from mhw3d_detection_spark.operators.textops import (
            chunk_tokens,
            pack_sequences,
        )

        spark = TestCurationProperties._spark
        df = spark.createDataFrame(
            [(i, "s", t) for i, t in enumerate(texts)],
            "doc_id long, source string, text string",
        )
        chunk_size, target = 4, 8
        packs = pack_sequences(
            df, chunk_size=chunk_size, target_tokens=target, group_col="source"
        ).collect()
        chunks = chunk_tokens(df, size=chunk_size).collect()
        # conservation: every chunk lands in exactly one sequence
        assert sum(r["n_chunks"] for r in packs) == len(chunks)
        assert sum(r["n_tokens"] for r in packs) == sum(
            r["n_chunk_tokens"] for r in chunks
        )
        # every sequence except possibly the last crosses the target
        # only by appending its final chunk (overshoot < chunk_size)
        for r in packs:
            assert r["n_tokens"] < target + chunk_size

    @settings(max_examples=10, deadline=None)
    @given(
        st.lists(
            st.tuples(st.sampled_from(["a", "b", "c"]), st.integers(0, 20)),
            min_size=1,
            max_size=12,
        )
    )
    def test_mixture_weights_shares_sum_to_one(self, rows):
        from mhw3d_detection_spark.operators.textops import mixture_weights

        spark = TestCurationProperties._spark
        df = spark.createDataFrame(
            [(i, g, "w " * n) for i, (g, n) in enumerate(rows)],
            "doc_id long, source string, text string",
        )
        out = mixture_weights(df, group_col="source", alpha=0.5).collect()
        total_tokens = sum(n for _, n in rows)
        if total_tokens == 0:
            return  # degenerate corpus: shares undefined, guarded to 0s
        assert abs(sum(r["raw_share"] for r in out) - 1.0) < 1e-9
        assert abs(sum(r["target_share"] for r in out) - 1.0) < 1e-9

    @settings(max_examples=10, deadline=None)
    @given(doc_strategy)
    def test_inverted_index_reconstructs_tf(self, texts):
        from mhw3d_detection_spark.operators.textops import inverted_index

        spark = TestCurationProperties._spark
        df = spark.createDataFrame(
            list(enumerate(texts)), "doc_id long, text string"
        )
        out = inverted_index(df, max_postings=1000).collect()
        want = Counter(t for x in texts for t in _toks(x))
        got_tf = {r["token"]: r["tf_total"] for r in out}
        assert got_tf == dict(want)
        for r in out:
            # uncapped postings must sum exactly to tf_total
            parts = [p.split(":") for p in r["postings"].split(";")]
            assert sum(int(tf) for _, tf in parts) == r["tf_total"]
            assert len(parts) == r["df"]


class TestRowlocalMinhashProperty:
    @settings(max_examples=10, deadline=None)
    @given(
        st.lists(
            st.text(
                alphabet="ab1 .!é中",  # unicode + punct + digits
                min_size=0,
                max_size=40,
            ),
            min_size=1,
            max_size=8,
        )
    )
    def test_rowlocal_bands_equal_grouped(self, texts):
        # the zero-shuffle row-local signature must be BIT-identical to
        # the grouped explode+groupBy path on arbitrary text: empty
        # docs, sub-shingle docs, unicode, duplicate shingles
        from mhw3d_detection_spark.operators.textops import (
            minhash_bands_rowlocal,
            minhash_signatures,
        )

        spark = TestCurationProperties._spark
        docs = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
        )
        a = sorted(map(tuple, minhash_signatures(docs).collect()))
        b = sorted(map(tuple, minhash_bands_rowlocal(docs).collect()))
        assert a == b

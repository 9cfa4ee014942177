"""Unit tests for the beyond-reference extension operators (SURVEY.md
§2.11): dedup family, similarity search, text analysis, multimodal
plumbing. Recall properties are tested with planted duplicates."""

import pytest
from pyspark.sql import functions as F

from mhw3d_detection_spark.operators.multimodal import (
    decode_media,
    documents_as_media,
)
from mhw3d_detection_spark.operators.similarity import cosine_topk
from mhw3d_detection_spark.sources.tables import load_table
from mhw3d_detection_spark.operators.textops import (
    exact_dedup,
    fingerprint,
    language_id,
    minhash_candidate_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    shingles,
    simhash16,
    text_stats,
)

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog again and again"),
    (1, "the quick brown fox jumps over the lazy dog again and again"),  # exact dup
    (2, "the quick brown fox jumps over the lazy cat again and again"),  # near dup
    (3, "completely different words about spark window aggregation logic"),
    (4, "der hund und die katze sind nicht das problem"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


class TestDedup:
    def test_exact(self, docs):
        out = {r.keep_id: r.n_copies for r in exact_dedup(docs).collect()}
        assert out[0] == 2  # docs 0,1 identical; keeper is min id
        assert out[2] == 1

    def test_minhash_recall_on_exact_dup(self, docs):
        sig = minhash_signatures(docs)
        pairs = {(r.doc_a, r.doc_b) for r in minhash_candidate_pairs(sig).collect()}
        assert (0, 1) in pairs  # identical docs collide on every band
        assert (0, 3) not in pairs and (1, 3) not in pairs

    def test_simhash_identical_and_near(self, docs):
        h = {r.doc_id: r.simhash for r in simhash16(docs).collect()}
        assert h[0] == h[1]
        # near-dup differs in few bits, disjoint doc differs in many
        near = bin(h[0] ^ h[2]).count("1")
        far = bin(h[0] ^ h[3]).count("1")
        assert near < far

    def test_ngram_jaccard(self, spark, docs):
        pairs = ngram_jaccard_pairs(
            docs, probe_pred=lambda c: c == 0, min_jaccard=0.1
        ).collect()
        by_pair = {(r.doc_a, r.doc_b): r.jaccard for r in pairs}
        assert by_pair[(0, 1)] == pytest.approx(1.0)
        assert 0.1 < by_pair[(0, 2)] < 1.0
        assert (0, 3) not in by_pair


class TestText:
    def test_shingles_order(self, spark):
        d = spark.createDataFrame([(0, "a b c d")], "doc_id long, text string")
        got = [r.shingle for r in shingles(d).collect()]
        assert got == ["a b c", "b c d"]

    def test_stats(self, docs):
        st = {r.doc_id: r for r in text_stats(docs).collect()}
        assert st[0].n_tokens == 12
        assert st[0].stop_ratio > 0
        assert 0 <= st[0].quality_score <= 1

    def test_langid(self, docs):
        lang = {r.doc_id: r.lang_pred for r in language_id(docs).collect()}
        assert lang[0] == "en"
        assert lang[4] == "de"

    def test_fingerprint_order_insensitive(self, spark):
        d = spark.createDataFrame(
            [(0, "alpha beta gamma"), (1, "gamma alpha beta"), (2, "alpha beta delta")],
            "doc_id long, text string",
        )
        fp = {r.doc_id: r.fingerprint for r in fingerprint(d).collect()}
        assert fp[0] == fp[1]
        assert fp[0] != fp[2]


class TestSimilarity:
    def test_topk_finds_identical_vector(self, spark):
        rows = [
            (0, [1.0, 0.0, 0.0]),
            (1, [1.0, 0.0, 0.0]),   # identical to probe
            (2, [0.0, 1.0, 0.0]),   # orthogonal
            (3, [0.9, 0.1, 0.0]),
        ]
        emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        out = cosine_topk(emb, probe_pred=lambda c: c == 0, k=2).collect()
        assert [r.vec_id for r in out] == [1, 3]
        assert out[0].cosine == pytest.approx(1.0)

    def test_ivf_restricts_to_bucket(self, spark):
        rows = [
            (0, [1.0, 0.0], 7),
            (1, [1.0, 0.0], 7),
            (2, [1.0, 0.0], 8),  # identical but other bucket -> excluded
        ]
        emb = spark.createDataFrame(
            rows, "vec_id long, embedding array<float>, label int"
        )
        out = cosine_topk(
            emb, probe_pred=lambda c: c == 0, k=5, bucket_col="label"
        ).collect()
        assert [r.vec_id for r in out] == [1]


class TestKMeansIVF:
    def test_separates_two_blobs(self, spark):
        # two tight blobs -> k=2 must split them exactly
        rows = [(i, [10.0 + 0.01 * i, 0.0]) for i in range(5)] + [
            (100 + i, [0.0, 10.0 + 0.01 * i]) for i in range(5)
        ]
        emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        from mhw3d_detection_spark.operators.similarity import kmeans_ivf_train

        out = kmeans_ivf_train(emb, k=2, iters=3).collect()
        by_bucket = {}
        for r in out:
            by_bucket.setdefault(r.bucket, set()).add(r.vec_id)
        assert sorted(map(len, by_bucket.values())) == [5, 5]
        blob_a = {i for i in range(5)}
        assert blob_a in [set(v) for v in by_bucket.values()]

    def test_lloyds_matches_numpy_oracle(self, spark, sf_dir):
        # Exact differential against an independent NumPy Lloyd's
        # implementation on the real driver table: same deterministic
        # init (k smallest ids), same tie rule (lowest bucket), same
        # iteration count, same per-round dyadic centroid quantization
        # (similarity._q6 — the device that makes the rounds
        # bit-identical across engines) -> bucket assignments AND
        # centroids must match EXACTLY.
        import numpy as np
        import pyarrow.parquet as pq

        from mhw3d_detection_spark.operators.similarity import (
            kmeans_ivf_centroids,
            kmeans_ivf_train,
        )

        k, iters = 4, 3
        t = pq.read_table(f"{sf_dir}/embeddings.parquet").to_pandas()
        order = t["vec_id"].to_numpy().argsort()
        ids = t["vec_id"].to_numpy()[order]
        X = np.stack(
            [np.asarray(v, dtype=np.float64) for v in t["embedding"]]
        )[order]

        def np_assign(C_ids, C):
            d2 = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
            return np.array(C_ids)[d2.argmin(axis=1)]  # ties -> first

        def q6(a):
            # NumPy twin of similarity._q6 (same IEEE ops elementwise)
            return np.floor(a * 1000000.0 + (0.5 + 2.0**-16)) / 1000000.0

        C_ids, C = list(range(k)), X[:k].copy()
        for _ in range(iters):
            a = np_assign(C_ids, C)
            live = [b for b in C_ids if (a == b).any()]
            C = q6(np.stack([X[a == b].mean(axis=0) for b in live]))
            C_ids = live
        expected = dict(zip(ids.tolist(), np_assign(C_ids, C).tolist()))

        emb = load_table(spark, sf_dir, "embeddings")
        cents = kmeans_ivf_centroids(emb, k=k, iters=iters)
        assert [b for b, _ in cents] == C_ids
        for (_, cv), nv in zip(cents, C):
            assert cv == nv.tolist()  # bit-exact after shared quantization
        got = {
            r["vec_id"]: r["bucket"]
            for r in kmeans_ivf_train(emb, k=k, iters=iters).collect()
        }
        assert got == expected


class TestMultimodal:
    def test_frame_sampling_one_to_many(self, spark):
        from mhw3d_detection_spark.operators.multimodal import sample_frames

        rows = [(1, bytes(range(64))), (2, b"x" * 16)]
        media = spark.createDataFrame(rows, "doc_id long, payload binary")
        out = sample_frames(media, every_n=2).collect()
        by_doc = {}
        for r in out:
            by_doc.setdefault(r.doc_id, []).append(r)
        # doc 1: 4 frames of 16 bytes -> indices 0,2 kept
        assert [r.frame_idx for r in sorted(by_doc[1], key=lambda r: r.frame_idx)] == [0, 2]
        assert bytes(by_doc[1][0].frame_payload) == bytes(range(16))
        assert [r.frame_idx for r in by_doc[2]] == [0]
        assert all(len(r.frame_hash) == 16 for r in out)

    def test_decode_plumbing(self, docs):
        media = documents_as_media(docs)
        out = {r.doc_id: r for r in decode_media(media).collect()}
        assert out[0].n_bytes == len(DOCS[0][1])
        assert out[0].first_byte == ord("t")
        assert out[0].phash == out[1].phash  # identical payloads
        assert out[0].phash != out[3].phash
        assert len(out[0].phash) == 16


class TestReproducibleSampling:
    def test_layout_independence(self, spark):
        # the whole point vs df.sample: identical membership under any
        # partitioning/order
        from mhw3d_detection_spark.operators.textops import deterministic_sample

        docs = spark.range(0, 1000).select(
            F.col("id").alias("doc_id"), F.lit("x").alias("text")
        )
        a = {r.doc_id for r in deterministic_sample(docs, 0.3).collect()}
        b = {
            r.doc_id
            for r in deterministic_sample(
                docs.repartition(7).orderBy(F.desc("doc_id")), 0.3
            ).collect()
        }
        assert a == b
        assert 0.2 < len(a) / 1000 < 0.4  # md5 uniform lands near the rate

    def test_stratified_quota_stable_and_capped(self, spark):
        from mhw3d_detection_spark.operators.textops import stratified_quota

        rows = [(i, "g%d" % (i % 3)) for i in range(100)]
        df = spark.createDataFrame(rows, "doc_id long, lang_pred string")
        out = stratified_quota(df, quota=10)
        counts = {r.lang_pred: r.n for r in out.groupBy("lang_pred").agg(
            F.count(F.lit(1)).alias("n")).collect()}
        assert all(v == 10 for v in counts.values())
        again = {(r.doc_id, r.lang_pred) for r in stratified_quota(
            df.repartition(5), quota=10).collect()}
        assert again == {(r.doc_id, r.lang_pred) for r in out.collect()}


class TestCurationOps:
    """Round-4 additions: repetition filters, Gopher rules, PII mask,
    vocab coverage, sequence chunking, temperature sampling."""

    def test_repetition_fracs(self, spark):
        from mhw3d_detection_spark.operators.textops import ngram_repetition

        df = spark.createDataFrame(
            [
                (0, "a b a b a b"),     # 2-grams: ab,ba,ab,ba,ab -> top 3/5
                (1, "one two three four"),  # no repeats
                (2, "x"),               # too short for any gram
            ],
            "doc_id long, text string",
        )
        out = {
            r["doc_id"]: r
            for r in ngram_repetition(df).collect()
        }
        assert abs(out[0]["top_2gram_frac"] - 3 / 5) < 1e-12
        assert abs(out[0]["dup_3gram_frac"] - 1.0) < 1e-12  # aba,bab x2 each
        assert abs(out[1]["top_2gram_frac"] - 1 / 3) < 1e-12
        assert out[1]["dup_3gram_frac"] == 0.0
        assert out[2]["top_2gram_frac"] == 0.0 and out[2]["dup_3gram_frac"] == 0.0

    def test_gopher_rules_flags(self, spark):
        from mhw3d_detection_spark.operators.textops import gopher_rules

        df = spark.createDataFrame(
            [
                (0, "the cat sat on the mat and it is a good day for all"),
                (1, "too short"),                       # fails flag_len
                (2, "1234 5678 " * 10),                 # fails alpha + stop
            ],
            "doc_id long, text string",
        )
        out = {r["doc_id"]: r for r in gopher_rules(df).collect()}
        assert out[0]["pass_gopher"] == 1
        assert out[1]["flag_len"] == 0 and out[1]["pass_gopher"] == 0
        assert out[2]["flag_alpha"] == 0 and out[2]["flag_stop"] == 0

    def test_pii_mask(self, spark):
        from mhw3d_detection_spark.operators.textops import pii_mask

        df = spark.createDataFrame(
            [(1, "Customer#000123 ref 456"), (2, "no digits here")],
            "k long, v string",
        )
        out = {r["k"]: r for r in pii_mask(df, "v", "k").collect()}
        assert out[1]["v_masked"] == "Customer#<NUM> ref <NUM>"
        assert out[1]["n_pii"] == 2
        assert out[2]["v_masked"] == "no digits here" and out[2]["n_pii"] == 0

    def test_vocab_oov(self, spark):
        from mhw3d_detection_spark.operators.textops import vocab_oov

        df = spark.createDataFrame(
            [(0, "a a a b"), (1, "a b c")],
            "doc_id long, text string",
        )
        out = {r["doc_id"]: r for r in vocab_oov(df, vocab_size=1).collect()}
        # vocab = {a} (tf 4); doc0: 1 oov of 4, doc1: 2 oov of 3
        assert out[0]["n_oov"] == 1 and abs(out[0]["oov_frac"] - 0.25) < 1e-12
        assert out[1]["n_oov"] == 2 and abs(out[1]["oov_frac"] - 2 / 3) < 1e-12

    def test_chunk_tokens_shapes(self, spark):
        from mhw3d_detection_spark.operators.textops import chunk_tokens

        text = " ".join(f"t{i}" for i in range(70))
        df = spark.createDataFrame(
            [(0, text), (1, "solo")], "doc_id long, text string"
        )
        rows = chunk_tokens(df, size=32).collect()
        d0 = sorted(
            [(r["chunk_idx"], r["n_chunk_tokens"]) for r in rows if r["doc_id"] == 0]
        )
        assert d0 == [(0, 32), (1, 32), (2, 6)]
        d1 = [r for r in rows if r["doc_id"] == 1]
        assert len(d1) == 1 and d1[0]["n_chunk_tokens"] == 1
        # chunk hashes are content hashes: equal chunks hash equal
        h = {r["chunk_hash"] for r in rows if r["doc_id"] == 1}
        rows2 = chunk_tokens(
            spark.createDataFrame([(9, "solo")], "doc_id long, text string"),
            size=32,
        ).collect()
        assert {r["chunk_hash"] for r in rows2} == h

    def test_temperature_sample_rates_and_determinism(self, spark):
        from mhw3d_detection_spark.operators.textops import temperature_sample

        rows = [(i, "small" if i < 4 else "big") for i in range(404)]
        df = spark.createDataFrame(rows, "doc_id long, lang string")
        out = temperature_sample(df, group_col="lang", alpha=0.5)
        got = out.collect()
        rates = {r["lang"]: r["keep_rate"] for r in got}
        assert abs(rates["small"] - 1.0) < 1e-12          # smallest kept whole
        assert abs(rates["big"] - (4 / 400) ** 0.5) < 1e-12
        assert sum(1 for r in got if r["lang"] == "small") == 4
        # content-keyed: identical selection under a different layout
        got2 = temperature_sample(
            df.repartition(13), group_col="lang", alpha=0.5
        ).collect()
        assert sorted(r["doc_id"] for r in got) == sorted(
            r["doc_id"] for r in got2
        )

    def test_shingles_short_doc_regression(self, spark):
        # sequence(1, 0) in Spark is DESCENDING [1, 0]; docs shorter
        # than the shingle width used to crash slice() with start=0.
        df = spark.createDataFrame(
            [(0, "x"), (1, "a b"), (2, "a b c")], "doc_id long, text string"
        )
        rows = shingles(df, n=3).collect()
        assert [(r["doc_id"], r["shingle"]) for r in rows] == [(2, "a b c")]

    def test_contamination_containment(self, spark):
        from mhw3d_detection_spark.operators.textops import contamination_screen

        df = spark.createDataFrame(
            [
                (0, "alpha beta gamma delta"),            # probe: 2 shingles
                (1, "alpha beta gamma delta epsilon x"),  # contains both
                (2, "alpha beta gamma zzz"),              # contains 1 of 2
                (3, "unrelated words entirely here"),
            ],
            "doc_id long, text string",
        )
        out = {
            (r["probe_id"], r["doc_id"]): r["containment"]
            for r in contamination_screen(
                df, lambda d: d == 0, min_containment=0.01
            ).collect()
        }
        assert abs(out[(0, 1)] - 1.0) < 1e-12
        assert abs(out[(0, 2)] - 0.5) < 1e-12
        assert (0, 3) not in out

    def test_pack_sequences_greedy(self, spark):
        from mhw3d_detection_spark.operators.textops import pack_sequences

        # 3 docs x 10 tokens in one source; chunk_size=10 -> one chunk
        # each; target 20 -> docs 1+2 pack into seq 0, doc 3 into seq 1.
        rows = [(i, "s0", " ".join(f"w{i}t{j}" for j in range(10))) for i in range(3)]
        df = spark.createDataFrame(rows, "doc_id long, source string, text string")
        out = sorted(
            (r["seq_id"], r["n_chunks"], r["n_tokens"], r["n_docs"])
            for r in pack_sequences(
                df, chunk_size=10, target_tokens=20, group_col="source"
            ).collect()
        )
        assert out == [(0, 2, 20, 2), (1, 1, 10, 1)]

    def test_autocorrelation_gap_aware(self, spark):
        import datetime as dt

        from mhw3d_detection_spark.operators.analysis import autocorrelation

        # strictly increasing series -> lag-1 acf == 1.0; a hole at day
        # 5 must DROP the pair across the gap, not correlate it
        days = [0, 1, 2, 3, 4, 6, 7, 8]
        rows = [
            (1, dt.date(2000, 1, 1) + dt.timedelta(days=d), float(d)) for d in days
        ]
        df = spark.createDataFrame(rows, "cell_id int, time date, temp double")
        r = autocorrelation(df, lags=(1,)).collect()[0]
        assert r["n_pairs_1"] == 6  # 7 consecutive-row pairs minus the gap pair
        assert abs(r["acf_1"] - 1.0) < 1e-9

    def test_autocorrelation_true_lag_k_across_holes(self, spark):
        import datetime as dt

        from mhw3d_detection_spark.operators.analysis import autocorrelation

        # TRUE lag-k semantics: (day7, day0) and (day8, day1) are valid
        # lag-7 pairs even though day 5 is missing (they are 6 rows
        # apart — a row-offset lag(7) would find neither).
        days = [0, 1, 2, 3, 4, 6, 7, 8]
        rows = [
            (1, dt.date(2000, 1, 1) + dt.timedelta(days=d), float(d)) for d in days
        ]
        df = spark.createDataFrame(rows, "cell_id int, time date, temp double")
        r = autocorrelation(df, lags=(7,)).collect()[0]
        assert r["n_pairs_7"] == 2
        assert abs(r["acf_7"] - 1.0) < 1e-9

    def test_gopher_rules_zero_token_doc(self, spark):
        from mhw3d_detection_spark.operators.textops import gopher_rules

        # punctuation-only doc tokenizes to zero tokens: every ratio
        # must be a real 0.0 (not NULL) so the DuckDB differential and
        # downstream flag conjunctions agree (ADVICE round-4 item)
        df = spark.createDataFrame(
            [(1, "!!! ??? ..."), (2, "the cat and the hat is in a tree here now")],
            "doc_id long, text string",
        )
        out = {r["doc_id"]: r for r in gopher_rules(df).collect()}
        assert out[1]["n_tokens"] == 0
        assert out[1]["mean_token_len"] == 0.0
        assert out[1]["flag_mean_len"] == 0
        assert out[1]["pass_gopher"] == 0
        assert out[2]["pass_gopher"] == 1


class TestCurationOps2:
    def test_dup_span_frac(self, spark):
        from mhw3d_detection_spark.operators.textops import dup_span_frac

        # docs 1/2 share the exact 4-token span "a b c d"; doc 3 is
        # unique; doc 4 is too short for any span -> zeros, still present
        df = spark.createDataFrame(
            [
                (1, "a b c d e"),
                (2, "x a b c d"),
                (3, "p q r s t"),
                (4, "one two"),
            ],
            "doc_id long, text string",
        )
        out = {r["doc_id"]: r for r in dup_span_frac(df, span=4).collect()}
        assert out[1]["n_spans"] == 2 and out[1]["n_dup_spans"] == 1
        assert abs(out[1]["dup_span_frac"] - 0.5) < 1e-9
        assert out[3]["n_dup_spans"] == 0
        assert out[4]["n_spans"] == 0 and out[4]["dup_span_frac"] == 0.0

    def test_token_entropy(self, spark):
        import math

        from mhw3d_detection_spark.operators.textops import token_entropy

        df = spark.createDataFrame(
            [(1, "a a a a"), (2, "a b c d"), (3, "...")],
            "doc_id long, text string",
        )
        out = {r["doc_id"]: r for r in token_entropy(df).collect()}
        assert abs(out[1]["entropy"]) < 1e-9  # constant doc -> 0
        assert abs(out[2]["entropy"] - math.log(4)) < 1e-9  # uniform -> ln 4
        assert out[2]["ttr"] == 1.0
        assert out[3]["n_tokens"] == 0 and out[3]["entropy"] == 0.0

    def test_length_quantile_band(self, spark):
        from mhw3d_detection_spark.operators.textops import length_quantile_band

        rows = [(i, "en", "w " * n) for i, n in enumerate([5, 10, 10, 10, 100])]
        df = spark.createDataFrame(
            [(i, lang, t.strip()) for i, lang, t in rows],
            "doc_id long, lang string, text string",
        )
        out = {r["doc_id"]: r for r in length_quantile_band(df).collect()}
        # p05/p95 of [5,10,10,10,100] interpolate between extremes ->
        # the 5- and 100-token outliers fall outside, the 10s inside
        assert out[0]["in_band"] == 0
        assert out[4]["in_band"] == 0
        assert all(out[i]["in_band"] == 1 for i in (1, 2, 3))

    def test_inverted_index_bounded_postings(self, spark):
        from mhw3d_detection_spark.operators.textops import inverted_index

        df = spark.createDataFrame(
            [(1, "x x y"), (2, "x z"), (3, "x")],
            "doc_id long, text string",
        )
        out = {r["token"]: r for r in inverted_index(df, max_postings=2).collect()}
        assert out["x"]["df"] == 3  # true df survives the postings cap
        assert out["x"]["tf_total"] == 4
        assert out["x"]["postings"] == "1:2;2:1"  # capped at 2, doc order
        assert out["y"]["postings"] == "1:1"

    def test_cooccurrence_pmi_counts(self, spark):
        import math

        from mhw3d_detection_spark.operators.textops import cooccurrence_pmi

        # "a b" x2 in one doc: pairs at distance<=2 from doc "a b a b":
        # (a,b) d1 x2, (b,a) d1 x1, (a,a) d2 x1, (b,b) d2 x1 -> N=5
        df = spark.createDataFrame([(1, "a b a b")], "doc_id long, text string")
        out = {
            (r["a"], r["b"]): r
            for r in cooccurrence_pmi(df, window=2, min_count=1).collect()
        }
        assert out[("a", "b")]["c_ab"] == 2
        assert out[("b", "a")]["c_ab"] == 1
        # marginals: c_a(a)=3, c_b(b)=3 -> pmi(a,b) = ln(2*5/9)
        assert abs(out[("a", "b")]["pmi"] - math.log(2 * 5 / 9)) < 1e-9

    def test_random_projection_preserves_geometry(self, spark):
        import math

        from mhw3d_detection_spark.operators.similarity import random_projection

        # identical vectors project identically; distances contract
        # toward expectation (JL) — just check identical ones coincide
        # and distinct ones stay distinct
        base = [1.0] * 32 + [0.0] * 32
        other = [0.0] * 32 + [1.0] * 32
        emb = spark.createDataFrame(
            [(0, base), (1, list(base)), (2, other)],
            "vec_id long, embedding array<float>",
        )
        out = {r["vec_id"]: [r[f"r{j}"] for j in range(8)]
               for r in random_projection(emb, out_dim=8, dim=64).collect()}
        assert out[0] == out[1]
        d02 = math.dist(out[0], out[2])
        assert d02 > 0.1  # orthogonal inputs stay separated

    def test_label_centroids(self, spark):
        from mhw3d_detection_spark.operators.similarity import label_centroids

        emb = spark.createDataFrame(
            [(0, [1.0, 3.0], 7), (1, [3.0, 5.0], 7), (2, [10.0, 10.0], 8)],
            "vec_id long, embedding array<float>, label int",
        )
        out = {(r["label"], r["dim_idx"]): r for r in label_centroids(emb).collect()}
        assert out[(7, 0)]["mean_val"] == 2.0 and out[(7, 1)]["mean_val"] == 4.0
        assert out[(7, 0)]["n_vecs"] == 2
        assert out[(8, 1)]["mean_val"] == 10.0

    def test_mixture_weights_flatten_toward_uniform(self, spark):
        from mhw3d_detection_spark.operators.textops import mixture_weights

        # 9:1 token skew; alpha=0.5 target shares must sit strictly
        # between raw shares and uniform, and sum to 1
        rows = [(i, "big", "w " * 90) for i in range(10)] + [
            (100 + i, "small", "w " * 10) for i in range(10)
        ]
        df = spark.createDataFrame(
            [(i, s, t.strip()) for i, s, t in rows],
            "doc_id long, source string, text string",
        )
        out = {r["source"]: r for r in mixture_weights(df, alpha=0.5).collect()}
        assert abs(out["big"]["raw_share"] - 0.9) < 1e-9
        assert 0.5 < out["big"]["target_share"] < 0.9
        assert 0.1 < out["small"]["target_share"] < 0.5
        assert abs(out["big"]["target_share"] + out["small"]["target_share"] - 1.0) < 1e-9
        assert out["small"]["rel_weight"] > 1.0 > out["big"]["rel_weight"]

    def test_split_assign_deterministic_and_partitioned(self, spark):
        from mhw3d_detection_spark.operators.textops import split_assign

        docs = spark.range(0, 1000).select(F.col("id").alias("doc_id"))
        a = {r["doc_id"]: r["split"] for r in split_assign(docs).collect()}
        b = {
            r["doc_id"]: r["split"]
            for r in split_assign(docs.repartition(13)).collect()
        }
        assert a == b  # layout-independent
        from collections import Counter

        c = Counter(a.values())
        assert 700 < c["train"] < 900 and 50 < c["val"] < 150 and 50 < c["test"] < 150
        assert set(c) == {"train", "val", "test"}

    def test_projected_rerank_finds_identical_vector(self, spark):
        from mhw3d_detection_spark.operators.similarity import projected_rerank_topk

        # 20 structured vectors; vec 1 is an exact copy of probe 0 ->
        # JL projections coincide, so it must survive the coarse stage
        # and re-rank at 1 with cosine 1
        rows = [(0, [1.0] * 32 + [0.0] * 32), (1, [1.0] * 32 + [0.0] * 32)]
        rows += [
            (i, [float((i * j) % 7 - 3) for j in range(64)]) for i in range(2, 20)
        ]
        emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        out = projected_rerank_topk(
            emb, probe_pred=lambda c: c == 0, k=3, k_coarse=5
        ).collect()
        top = [r for r in out if r["rank"] == 1][0]
        assert top["vec_id"] == 1
        assert abs(top["cosine"] - 1.0) < 1e-9

    def test_mixture_weights_zero_token_group(self, spark):
        from mhw3d_detection_spark.operators.textops import mixture_weights

        df = spark.createDataFrame(
            [(1, "a", "w w w w"), (2, "b", "!!! ...")],
            "doc_id long, source string, text string",
        )
        out = {r["source"]: r for r in mixture_weights(df, group_col="source").collect()}
        # zero-token group: defined 0 weight, never NULL/NaN
        assert out["b"]["n_tokens"] == 0
        assert out["b"]["rel_weight"] == 0.0
        assert out["a"]["rel_weight"] is not None


def test_source_overlap_toy(spark):
    """Known-answer overlap: A and B share exactly one of their two
    distinct shingle-bearing docs; C is disjoint. Exact Jaccard must be
    combinatorial truth; the 8-hash estimate must be 1.0 for identical
    sets and 0.0 for disjoint ones."""
    from mhw3d_detection_spark.operators.textops import source_overlap

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta", "A"),
            (2, "epsilon zeta eta theta", "A"),
            (3, "alpha beta gamma delta", "B"),   # dup of doc 1
            (4, "iota kappa lambda mu", "B"),
            (5, "nu xi omicron pi", "C"),
            (6, "alpha beta gamma delta", "D"),   # D identical to... just doc1's shingles
        ],
        ["doc_id", "text", "source"],
    )
    got = {(r["src_a"], r["src_b"]): r for r in source_overlap(docs).collect()}
    # each 4-token doc has 2 distinct 3-gram shingles
    ab = got[("A", "B")]
    assert ab["n_a"] == 4 and ab["n_b"] == 4 and ab["n_inter"] == 2
    assert abs(ab["exact_jaccard"] - 2 / 6) < 1e-12
    ac = got[("A", "C")]
    assert ac["n_inter"] == 0 and ac["exact_jaccard"] == 0.0
    assert ac["est_jaccard"] == 0.0
    bd = got[("B", "D")]
    assert bd["n_inter"] == 2  # D == doc1's shingle set, half of B's
    ad = got[("A", "D")]
    # D's shingle set is a strict subset of A's -> est from union sigs
    # cannot exceed 1; exact = 2/4
    assert abs(ad["exact_jaccard"] - 0.5) < 1e-12
    assert len(got) == 6  # all C(4,2) pairs present, zero-overlap included


def test_source_overlap_shingleless_source_present(spark):
    """A source whose docs are all shorter than the shingle width must
    still appear in every pair, with jaccard 0 (not vanish)."""
    from mhw3d_detection_spark.operators.textops import source_overlap

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta", "A"),
            (2, "tiny doc", "E"),  # 2 tokens < shingle_n=3 -> no shingles
        ],
        ["doc_id", "text", "source"],
    )
    got = {(r["src_a"], r["src_b"]): r for r in source_overlap(docs).collect()}
    assert ("A", "E") in got
    ae = got[("A", "E")]
    assert ae["n_b"] == 0 and ae["n_inter"] == 0
    assert ae["exact_jaccard"] == 0.0 and ae["est_jaccard"] == 0.0


class TestSemanticDedup:
    def test_planted_dup_groups_keep_min_id(self, spark):
        # two clusters; within each, a planted near-identical group must
        # collapse to its min id while distinct members survive
        rows = [
            (0, [1.0, 0.0]),
            (1, [1.0, 0.001]),   # near-dup of 0
            (2, [0.999, 0.01]),  # near-dup of 0/1
            (3, [0.7, 0.7]),     # same cluster, distinct
            (10, [0.0, 1.0]),
            (11, [0.0001, 1.0]),  # near-dup of 10
            (12, [-0.6, 0.8]),    # same cluster, distinct
        ]
        emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        from mhw3d_detection_spark.operators.similarity import semantic_dedup

        out = semantic_dedup(emb, k=2, iters=3, threshold=0.99)
        survivors = {r.vec_id for r in out.collect()}
        assert survivors == {0, 3, 10, 12}

    def test_max_cluster_size_caps_the_quadratic(self, spark):
        # r8 scale-hardening: a pathological embedding space (every
        # vector identical) dumps the WHOLE corpus into one k-means
        # cell no matter how k was sized — uncapped, the within-cell
        # candidate set is C(n,2). max_bucket_size salts the oversized
        # cell into hash sub-cells; with threshold=0 every candidate is
        # emitted, so the pair count IS the candidate count.
        from mhw3d_detection_spark.operators.similarity import (
            assign_buckets,
            bucket_near_dup_pairs,
            kmeans_ivf_centroids,
        )

        n, cap = 300, 30
        rows = [(i, [1.0, 0.0]) for i in range(n)]
        emb = spark.createDataFrame(
            rows, "vec_id long, embedding array<float>"
        )
        cents = kmeans_ivf_centroids(emb, k=4, iters=2)
        tagged = assign_buckets(emb, cents)
        # the degenerate space really is one cell
        assert tagged.select("bucket").distinct().count() == 1

        un = bucket_near_dup_pairs(tagged, threshold=0.0)
        un_pairs = {(r.doc_a, r.doc_b) for r in un.collect()}
        assert len(un_pairs) == n * (n - 1) // 2  # the unbounded blowup

        capped = bucket_near_dup_pairs(
            tagged, threshold=0.0, max_bucket_size=cap
        )
        capped_pairs = {(r.doc_a, r.doc_b) for r in capped.collect()}
        # bounded: ceil(n/cap)=10 hash sub-cells of ~cap rows ->
        # ~n*cap/2 candidates, an order of magnitude under C(n,2)
        assert 0 < len(capped_pairs) < len(un_pairs) / 3
        # soundness: salting only PRUNES candidates, never invents them
        assert capped_pairs <= un_pairs

        # cap >= cell size is an exact no-op (the oracle-rows contract:
        # default None / generous cap changes nothing)
        noop = bucket_near_dup_pairs(
            tagged, threshold=0.0, max_bucket_size=n
        )
        assert {(r.doc_a, r.doc_b) for r in noop.collect()} == un_pairs

    def test_survivors_subset_and_canonical(self, spark, sf_dir):
        # invariants on the real table: survivors are a subset of the
        # corpus; the TRUE min of every connected component survives
        # (its min-propagation label can never drop below itself, so it
        # is always self-labeled) — checked against a union-find ground
        # truth over the collected pair list, NOT against the bounded
        # labels, whose pre-convergence label-groups are not components;
        # and the survivor set equals ids minus the self-label drops of
        # an identical recompute (determinism).
        from mhw3d_detection_spark.operators.similarity import (
            assign_buckets,
            bucket_near_dup_pairs,
            kmeans_ivf_centroids,
            semantic_dedup,
        )
        from mhw3d_detection_spark.operators.textops import (
            connected_components_bounded,
        )

        emb = load_table(spark, sf_dir, "embeddings")
        ids = {r.vec_id for r in emb.select("vec_id").collect()}
        out = semantic_dedup(emb, k=4, iters=2, threshold=0.35)
        survivors = {r.vec_id for r in out.collect()}
        assert survivors <= ids and survivors
        cents = kmeans_ivf_centroids(emb, k=4, iters=2)
        pairs = bucket_near_dup_pairs(assign_buckets(emb, cents), threshold=0.35)
        pair_rows = [(r.doc_a, r.doc_b) for r in pairs.collect()]
        assert pair_rows  # threshold is calibrated to find dups at sf0.01
        # union-find ground truth for the TRUE components
        parent = {}

        def find(x):
            parent.setdefault(x, x)
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in pair_rows:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        true_mins = {}
        for v in parent:
            r = find(v)
            true_mins[r] = min(true_mins.get(r, v), v)
        assert set(true_mins.values()) <= survivors
        # determinism: identical recompute yields the same drop set
        comp = connected_components_bounded(pairs, iters=3)
        dropped = {r.doc_id for r in comp.collect() if r.doc_id != r.component}
        assert survivors == ids - dropped


class TestQualityClassifier:
    def test_matches_python_logit(self, spark, sf_dir):
        # exact differential: the plan's logit equals the same literal
        # weights applied to collected features in pure Python (same
        # IEEE op order), and keep == (logit >= 0)
        import math

        from mhw3d_detection_spark.operators.textops import (
            QUALITY_LR as w,
            quality_classifier,
            text_stats,
        )

        docs = load_table(spark, sf_dir, "documents")
        feats = {r.doc_id: r for r in text_stats(docs).collect()}
        out = {r.doc_id: r for r in quality_classifier(docs).collect()}
        assert set(out) == set(feats)
        for did, r in out.items():
            f = feats[did]
            z = (
                w["intercept"]
                + w["w_len"] * min(f.n_tokens / 100.0, 1.0)
                + w["w_punct"] * f.punct_ratio
                + w["w_stop"] * f.stop_ratio
                + w["w_tok_len"] * f.mean_token_len
            )
            assert r.quality_logit == z  # bit-exact literal arithmetic
            assert abs(r.quality_prob - 1.0 / (1.0 + math.exp(-z))) < 1e-12
            assert r.keep == int(z >= 0)
        # both classes occur on the real corpus (weights are calibrated)
        assert {r.keep for r in out.values()} == {0, 1}


class TestArrowAssign:
    def test_matches_literal_expression(self, spark, sf_dir):
        # the large-k Arrow matmul kernel must agree with the bit-exact
        # literal-argmin path away from distance ties (real data)
        from mhw3d_detection_spark.operators.similarity import (
            _assign_buckets_arrow,
            assign_buckets,
            kmeans_ivf_centroids,
        )

        emb = load_table(spark, sf_dir, "embeddings")
        cents = kmeans_ivf_centroids(emb, k=8, iters=2)
        lit = {
            r.vec_id: r.bucket
            for r in assign_buckets(emb, cents).select("vec_id", "bucket").collect()
        }
        arr = {
            r.vec_id: r.bucket
            for r in _assign_buckets_arrow(emb, cents, "embedding")
            .select("vec_id", "bucket")
            .collect()
        }
        assert lit == arr

    def test_auto_switch_above_threshold(self, spark):
        # above LITERAL_ASSIGN_MAX_K centroids assign_buckets must take
        # the Arrow path: the plan shows a MapInPandas node, not a
        # giant literal expression
        from mhw3d_detection_spark.operators.similarity import (
            LITERAL_ASSIGN_MAX_K,
            assign_buckets,
        )

        emb = spark.createDataFrame(
            [(i, [float(i % 7), float(i % 11)]) for i in range(100)],
            "vec_id long, embedding array<float>",
        )
        k = LITERAL_ASSIGN_MAX_K + 1
        cents = [(b, [float(b), float(b % 3)]) for b in range(k)]
        out = assign_buckets(emb, cents)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "MapInPandas" in plan
        # and it actually runs, with every bucket id in range
        got = {r.bucket for r in out.collect()}
        assert got <= set(range(k))

    def test_empty_partition_keeps_schema(self, spark):
        # an empty input partition must yield an empty batch with the
        # bucket column present (the kernel's len==0 branch)
        from mhw3d_detection_spark.operators.similarity import (
            _assign_buckets_arrow,
        )

        emb = spark.createDataFrame(
            [(1, [1.0, 0.0])], "vec_id long, embedding array<float>"
        ).repartition(8)  # 7 empty partitions
        cents = [(0, [1.0, 0.0]), (1, [0.0, 1.0])]
        rows = _assign_buckets_arrow(emb, cents, "embedding").collect()
        assert len(rows) == 1 and rows[0].bucket == 0


class TestQualityClassifierEdgeCases:
    def test_tokenless_and_empty_docs_cross_engine(self, spark, tmp_path):
        # zero-token text ("!!!") and empty text must agree with the
        # DuckDB oracle: DuckDB's list_sum([]) is NULL (guarded by
        # coalesce in the oracle), and NULL logit must REJECT (keep=0)
        # in both engines, not NULL-propagate
        import duckdb

        from mhw3d_detection_spark import queries as Q
        from mhw3d_detection_spark.operators.textops import quality_classifier

        rows = [
            (0, "a normal document with the tokens and words in it ok", "en", "s", 52),
            (1, "!!! ??? ---", "en", "s", 11),  # tokens: none
            (2, "", "en", "s", 0),              # empty text
        ]
        docs = spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string, n_chars long"
        )
        p = str(tmp_path / "docs.parquet")
        docs.write.mode("overwrite").parquet(p)

        got = {r.doc_id: r for r in quality_classifier(docs).collect()}
        assert got[0].keep == 1
        assert got[1].keep == 0 and got[2].keep == 0
        # denominators guarded -> defined scores even for empty text
        assert got[1].quality_logit is not None
        assert got[2].quality_logit == -3.0  # all features zero

        con = duckdb.connect()
        con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{p}/*.parquet')")
        sql = Q.REGISTRY["q_quality_classifier"].sql
        want = {r[0]: r for r in con.execute(sql).fetchall()}
        # compare the raw operator's rounded view against the oracle
        from mhw3d_detection_spark.queries.base import rq

        out = quality_classifier(docs).select(
            "doc_id",
            rq("quality_logit", 4).alias("ql"),
            rq("quality_prob", 4).alias("qp"),
            "keep",
        )
        for r in out.collect():
            w = want[r.doc_id]
            assert (r.ql is None) == (w[1] is None) and (r.ql == w[1] or r.ql is None)
            assert (r.qp is None) == (w[2] is None) and (r.qp == w[2] or r.qp is None)
            assert r.keep == w[3]


class TestFastHash:
    def test_fast_minhash_grouped_rowlocal_parity(self, spark, sf_dir):
        # the two signature builders must stay bit-identical to each
        # other under the xxhash production base too
        from mhw3d_detection_spark.operators.textops import (
            minhash_bands_rowlocal,
            minhash_signatures,
        )

        docs = load_table(spark, sf_dir, "documents")
        a = {
            tuple(r)
            for r in minhash_signatures(docs, fast_hash=True).collect()
        }
        b = {
            tuple(r)
            for r in minhash_bands_rowlocal(docs, fast_hash=True).collect()
        }
        assert a == b and a

    def test_fast_hash_range_and_dedup_recall(self, spark, docs):
        # xxhash base stays in [0, 2^48) (the family's overflow bound)
        # and the LSH pipeline still finds the planted exact dup
        from pyspark.sql import functions as FF

        from mhw3d_detection_spark.operators.textops import (
            minhash_candidate_pairs,
            minhash_signatures,
            tokens_col,
            xxhash_base,
        )

        vals = (
            docs.select(FF.explode(tokens_col(FF.col("text"))).alias("t"))
            .select(xxhash_base(FF.col("t")).alias("x"))
            .agg(FF.min("x"), FF.max("x"))
            .collect()[0]
        )
        assert 0 <= vals[0] and vals[1] < (1 << 48)
        sig = minhash_signatures(docs, fast_hash=True)
        pairs = {(r.doc_a, r.doc_b) for r in minhash_candidate_pairs(sig).collect()}
        assert (0, 1) in pairs  # identical docs collide on every band

    def test_sketch_hash_fn_hook(self, spark):
        # HLL under xxhash: same accuracy contract as the md5 default
        from mhw3d_detection_spark.operators.sketches import (
            hll_estimate,
            hll_registers,
        )
        from mhw3d_detection_spark.operators.textops import xxhash_base

        df = spark.createDataFrame(
            [("s", f"item-{i}") for i in range(20000)], "source string, token string"
        )
        regs = hll_registers(df, F.col("token"), ["source"], hash_fn=xxhash_base)
        est = hll_estimate(regs, ["source"]).collect()[0].est_distinct
        assert abs(est / 20000 - 1.0) < 0.13, est


class TestSimhashPairs:
    def test_block_join_recall_is_exhaustive(self, spark, sf_dir):
        # pigeonhole guarantee: the (block_id, block_bits) equi-join
        # must find EVERY pair within Hamming distance 3 — compare
        # against a brute-force XOR sweep over all fingerprints
        from itertools import combinations

        from mhw3d_detection_spark.operators.textops import (
            simhash16,
            simhash_hamming_pairs,
        )

        docs = load_table(spark, sf_dir, "documents")
        sigs = {r.doc_id: r.simhash for r in simhash16(docs).collect()}
        want = {
            (a, b, bin(sigs[a] ^ sigs[b]).count("1"))
            for a, b in combinations(sorted(sigs), 2)
            if bin(sigs[a] ^ sigs[b]).count("1") <= 3
        }
        got = {
            (r.doc_a, r.doc_b, r.hamming)
            for r in simhash_hamming_pairs(
                docs, max_hamming=3, n_blocks=4, width=16
            ).collect()
        }
        assert got == want  # lossless candidate generation, exact verify

    def test_block_join_recall_production_width(self, spark, sf_dir):
        # same pigeonhole differential at the PRODUCTION geometry
        # (64-bit fingerprint, 8 blocks of 8 bits — Manku WWW'07):
        # the equi-join must find every pair a brute-force XOR sweep
        # over the 64-bit fingerprints finds
        from itertools import combinations

        from mhw3d_detection_spark.operators.textops import (
            simhash,
            simhash_hamming_pairs,
        )

        docs = load_table(spark, sf_dir, "documents")
        sigs = {r.doc_id: r.simhash for r in simhash(docs, width=64).collect()}
        want = {
            (a, b, bin((sigs[a] ^ sigs[b]) & ((1 << 64) - 1)).count("1"))
            for a, b in combinations(sorted(sigs), 2)
            if bin((sigs[a] ^ sigs[b]) & ((1 << 64) - 1)).count("1") <= 7
        }
        got = {
            (r.doc_a, r.doc_b, r.hamming)
            for r in simhash_hamming_pairs(docs, max_hamming=7).collect()
        }
        assert got == want

    def test_simhash_width16_matches_simhash16(self, spark, sf_dir):
        # the width-parameterized builder at width=16 IS the oracle
        # fingerprint (bit-for-bit), so the DuckDB differential keeps
        # covering the shared fold/vote/pack machinery
        from mhw3d_detection_spark.operators.textops import simhash, simhash16

        docs = load_table(spark, sf_dir, "documents").limit(200)
        a = {r.doc_id: r.simhash for r in simhash16(docs).collect()}
        b = {r.doc_id: r.simhash for r in simhash(docs, width=16).collect()}
        assert a == b and len(a) > 0

    def test_simhash_fast_hash_contract(self, docs):
        # xxhash64 path: same schema, identical docs still collide at
        # hamming 0, fingerprints are full-range longs
        from mhw3d_detection_spark.operators.textops import (
            simhash,
            simhash_hamming_pairs,
        )

        sigs = {r.doc_id: r.simhash for r in simhash(docs, fast_hash=True).collect()}
        assert sigs[0] == sigs[1]  # identical docs -> identical fingerprint
        pairs = {
            (r.doc_a, r.doc_b): r.hamming
            for r in simhash_hamming_pairs(docs, fast_hash=True).collect()
        }
        assert pairs[(0, 1)] == 0

    def test_width_must_tile_blocks(self, docs):
        import pytest as _pt

        from mhw3d_detection_spark.operators.textops import (
            simhash_hamming_pairs,
        )

        with _pt.raises(AssertionError, match="tile"):
            simhash_hamming_pairs(docs, max_hamming=3, n_blocks=5, width=64)

    def test_exact_dup_has_hamming_zero(self, docs):
        from mhw3d_detection_spark.operators.textops import (
            simhash_hamming_pairs,
        )

        pairs = {
            (r.doc_a, r.doc_b): r.hamming
            for r in simhash_hamming_pairs(docs).collect()
        }
        assert pairs[(0, 1)] == 0  # identical docs

    def test_pigeonhole_guard(self, docs):
        import pytest as _pt

        from mhw3d_detection_spark.operators.textops import (
            simhash_hamming_pairs,
        )

        with _pt.raises(AssertionError, match="pigeonhole"):
            simhash_hamming_pairs(docs, max_hamming=4, n_blocks=4)


class TestInt8Similarity:
    def test_codes_bounded_and_max_hits_127(self, spark, sf_dir):
        from mhw3d_detection_spark.operators.similarity import quantize_int8

        emb = load_table(spark, sf_dir, "embeddings")
        q = quantize_int8(emb).select(
            F.array_min("qv").alias("lo"),
            F.array_max("qv").alias("hi"),
        )
        agg = q.agg(F.min("lo"), F.max("hi")).collect()[0]
        assert agg[0] >= -127 and agg[1] <= 127
        # the max-|v| component quantizes to exactly +/-127 per vector
        hit = quantize_int8(emb).select(
            F.greatest(F.abs(F.array_min("qv")), F.abs(F.array_max("qv"))).alias("m")
        )
        ms = {r.m for r in hit.collect()}
        assert ms == {127}

    def test_zero_vector_guard(self, spark):
        from mhw3d_detection_spark.operators.similarity import (
            int8_topk,
            quantize_int8,
        )

        emb = spark.createDataFrame(
            [(0, [0.0, 0.0]), (1, [1.0, 0.5]), (2, [0.9, 0.6]), (3, [-1.0, 0.2])],
            "vec_id long, embedding array<float>",
        )
        q = {r.vec_id: r for r in quantize_int8(emb).collect()}
        assert q[0].qnorm2 == 0 and q[0].scale == 0.0  # zero vec -> zero codes
        out = int8_topk(emb, probe_pred=lambda c: c == 1, k=3).collect()
        ids = {r.vec_id for r in out}
        assert 0 not in ids and 1 not in ids  # guard + self-exclusion

    def test_quantized_topk_tracks_float_topk(self, spark, sf_dir):
        # int8 cosine deviates O(1/127): the top-5 sets should agree on
        # the vast majority of (probe, neighbor) memberships
        from mhw3d_detection_spark.operators.similarity import (
            cosine_topk,
            int8_topk,
        )

        emb = load_table(spark, sf_dir, "embeddings")
        f = {(r.probe_id, r.vec_id) for r in
             cosine_topk(emb, lambda c: c % 50 == 0, k=5).collect()}
        qz = {(r.probe_id, r.vec_id) for r in
              int8_topk(emb, lambda c: c % 50 == 0, k=5).collect()}
        assert len(f & qz) / len(f) >= 0.8, (len(f & qz), len(f))


class TestBM25:
    def test_matches_pure_python_reference(self, spark):
        import math
        import re as _re

        from mhw3d_detection_spark.operators.textops import bm25_topk

        corpus = [
            (0, "spark query window merge spark spark"),
            (1, "table scan filter row value"),
            (2, "query query query window table"),
            (3, "merge window merge window merge window"),
            (4, "spark"),
            (5, ""),
        ]
        docs = spark.createDataFrame(corpus, "doc_id long, text string")
        terms = ("merge", "query", "spark", "window")
        k1, b = 1.25, 0.75
        toks = {d: _re.findall("[a-z0-9]+", t.lower()) for d, t in corpus}
        dls = {d: len(t) for d, t in toks.items() if len(t) > 0}
        avgdl = sum(dls.values()) / len(dls)
        N = len(corpus)
        import collections

        def rqp(x, dd):
            eps = {6: 2.0**-16, 4: 2.0**-14}.get(dd, 2.0**-16)
            return math.floor(x * 10.0**dd + (0.5 + eps)) / 10.0**dd

        want = {}
        for d, tks in toks.items():
            tf = collections.Counter(t for t in tks if t in terms)
            if not tf:
                continue
            s = 0.0
            for t, f_ in tf.items():
                df = sum(1 for dd2 in toks.values() if t in dd2)
                idf = math.log(1.0 + (N - df + 0.5) / (df + 0.5))
                c = idf * (f_ * (k1 + 1)) / (f_ + k1 * (1 - b + b * dls[d] / avgdl))
                s += rqp(c, 6)
            want[d] = (len(tf), rqp(s, 4))
        got = {
            r.doc_id: (r.n_hit_terms, r.score)
            for r in bm25_topk(docs, terms, k1=k1, b=b, top_n=10).collect()
        }
        assert got == want

    def test_empty_and_no_hit_docs_absent(self, spark):
        from mhw3d_detection_spark.operators.textops import bm25_topk

        docs = spark.createDataFrame(
            [(0, "spark rocks"), (1, "nothing relevant"), (2, None)],
            "doc_id long, text string",
        )
        out = {r.doc_id for r in bm25_topk(docs, ("spark",)).collect()}
        assert out == {0}


class TestBpeMergePairs:
    def test_hand_counted(self, spark):
        from mhw3d_detection_spark.operators.textops import bpe_merge_pairs

        docs = spark.createDataFrame(
            [(0, "aab ab a"), (1, "aab x")], "doc_id long, text string"
        )
        # tokens: aab, ab, a, aab, x -> pairs: aa,ab | ab | - | aa,ab | -
        got = {r.pair: r.n for r in bpe_merge_pairs(docs).collect()}
        assert got == {"aa": 2, "ab": 3}

    def test_single_char_tokens_yield_nothing(self, spark):
        from mhw3d_detection_spark.operators.textops import bpe_merge_pairs

        docs = spark.createDataFrame([(0, "a b c")], "doc_id long, text string")
        assert bpe_merge_pairs(docs).count() == 0

    def test_ivf_int8_restricts_to_bucket(self, spark):
        from mhw3d_detection_spark.operators.similarity import int8_topk

        rows = [
            (0, [1.0, 0.0], 7),
            (1, [1.0, 0.1], 7),
            (2, [1.0, 0.0], 8),  # identical direction, other bucket
        ]
        emb = spark.createDataFrame(
            rows, "vec_id long, embedding array<float>, label int"
        )
        out = int8_topk(
            emb, probe_pred=lambda c: c == 0, k=5, bucket_col="label"
        ).collect()
        assert [r.vec_id for r in out] == [1]


class TestHybridRRF:
    def test_fusion_math_and_membership(self, spark):
        from mhw3d_detection_spark.operators.similarity import (
            hybrid_rrf_retrieval,
        )

        docs = spark.createDataFrame(
            [
                (0, "spark query window"),     # probe doc (also vec 0)
                (1, "spark spark spark query window merge"),  # strong lexical
                (2, "table scan filter"),      # no lexical hits
                (3, "query window"),
            ],
            "doc_id long, text string",
        )
        emb = spark.createDataFrame(
            [
                (0, [1.0, 0.0]),
                (1, [0.9, 0.1]),
                (2, [1.0, 0.01]),  # nearest to probe, no lexical hits
                (3, [0.0, 1.0]),
            ],
            "vec_id long, embedding array<float>",
        )
        out = {
            r.doc_id: r
            for r in hybrid_rrf_retrieval(
                docs, emb, ("merge", "query", "spark", "window"), probe_vec_id=0
            ).collect()
        }
        # doc 2: ANN-only (rank 1 dense, absent lexical)
        assert out[2].ann_rank == 1 and out[2].lex_rank is None
        assert out[2].rrf == 1.0 / 61.0
        # probe doc 0 is excluded from ANN but can rank lexically
        assert out[0].ann_rank is None and out[0].lex_rank is not None
        # doc 1: present in both -> sum of both reciprocal terms
        assert out[1].rrf == 1.0 / (60.0 + out[1].lex_rank) + 1.0 / (
            60.0 + out[1].ann_rank
        )
        # fused order is by rrf desc
        rrfs = [r.rrf for r in sorted(out.values(), key=lambda r: (-r.rrf, r.doc_id))]
        assert rrfs == sorted(rrfs, reverse=True)


class TestWinnowing:
    def test_shared_substring_guarantee(self, spark):
        # Schleimer et al.'s theorem: any shared token run of length
        # >= k + window - 1 (= 6 here) produces >= 1 shared fingerprint
        from mhw3d_detection_spark.operators.textops import (
            winnow_shared_pairs,
        )

        shared = "alpha beta gamma delta epsilon zeta"  # 6 tokens
        docs = spark.createDataFrame(
            [
                (0, f"intro words here {shared} tail one"),
                (1, f"completely other prefix {shared} different ending"),
                (2, "no overlap with anything else at all whatsoever"),
            ],
            "doc_id long, text string",
        )
        pairs = {
            (r.doc_a, r.doc_b)
            for r in winnow_shared_pairs(docs, min_shared=1).collect()
        }
        assert (0, 1) in pairs
        assert all(2 not in p for p in pairs)

    def test_short_doc_single_fingerprint(self, spark):
        from mhw3d_detection_spark.operators.textops import (
            winnow_fingerprints,
        )

        docs = spark.createDataFrame(
            [(0, "a b c d"), (1, "a b"), (2, "")],
            "doc_id long, text string",
        )
        by_doc = {}
        for r in winnow_fingerprints(docs).collect():
            by_doc.setdefault(r.doc_id, set()).add(r.fp)
        # doc 0: 2 k-grams < window -> min of them = ONE fingerprint
        assert len(by_doc[0]) == 1
        # doc 1: < k tokens -> no k-grams -> absent; doc 2: empty
        assert 1 not in by_doc and 2 not in by_doc

    def test_sketch_build_is_row_local(self, spark, sf_dir):
        from mhw3d_detection_spark.operators.textops import (
            winnow_fingerprints,
        )

        docs = load_table(spark, sf_dir, "documents")
        plan = winnow_fingerprints(docs)._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan  # zero shuffles


class TestProductQuantization:
    def test_pq_train_encode_adc_match_numpy_oracle(self, spark, sf_dir):
        # Exact differential for the whole PQ path against independent
        # NumPy: per-subspace Lloyd's with the shared deterministic
        # init / tie rule / per-round _q6 quantization must reproduce
        # the codebooks BIT-EXACTLY; then NumPy encode + brute-force
        # ADC must reproduce the Spark top-k ids, ranks and distances.
        import numpy as np
        import pyarrow.parquet as pq_

        from mhw3d_detection_spark.operators.similarity import (
            pq_adc_topk,
            pq_encode,
            pq_train_codebooks,
        )

        m, ksub, iters, k = 4, 4, 2, 5
        t = pq_.read_table(f"{sf_dir}/embeddings.parquet").to_pandas()
        order = t["vec_id"].to_numpy().argsort()
        ids = t["vec_id"].to_numpy()[order]
        X = np.stack(
            [np.asarray(v, dtype=np.float64) for v in t["embedding"]]
        )[order]
        dsub = X.shape[1] // m

        def q6(a):
            return np.floor(a * 1000000.0 + (0.5 + 2.0**-16)) / 1000000.0

        def np_train(Xs):
            C_ids, C = list(range(ksub)), Xs[:ksub].copy()
            for _ in range(iters):
                d2 = ((Xs[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
                a = np.array(C_ids)[d2.argmin(axis=1)]
                live = [b for b in C_ids if (a == b).any()]
                C = q6(np.stack([Xs[a == b].mean(axis=0) for b in live]))
                C_ids = live
            return C_ids, C

        np_books = [
            np_train(X[:, s * dsub : (s + 1) * dsub]) for s in range(m)
        ]

        emb = load_table(spark, sf_dir, "embeddings")
        books = pq_train_codebooks(emb, m=m, ksub=ksub, iters=iters)
        for (np_ids, np_C), cb in zip(np_books, books):
            assert [b for b, _ in cb] == np_ids
            for (_, cv), nv in zip(cb, np_C):
                assert cv == nv.tolist()  # bit-exact

        # NumPy encode + ADC for every probe
        codes = np.stack(
            [
                np.array(np_books[s][0])[
                    (
                        (
                            X[:, None, s * dsub : (s + 1) * dsub]
                            - np_books[s][1][None, :, :]
                        )
                        ** 2
                    )
                    .sum(axis=2)
                    .argmin(axis=1)
                ]
                for s in range(m)
            ],
            axis=1,
        )
        got_codes = {
            r["vec_id"]: list(r["codes"])
            for r in pq_encode(emb, books).collect()
        }
        assert got_codes == {
            int(i): c.tolist() for i, c in zip(ids, codes)
        }

        out = pq_adc_topk(
            emb, books, probe_pred=lambda c: c % 50 == 0, k=k
        ).collect()
        by_probe = {}
        for r in out:
            by_probe.setdefault(r["probe_id"], []).append(r)
        id_pos = {int(v): i for i, v in enumerate(ids)}
        for pid, rows_ in by_probe.items():
            p = X[id_pos[pid]]
            # brute-force ADC in the SAME fold order: sequential over
            # dims within a subspace, left-assoc across subspaces
            d = np.zeros(len(ids))
            for s in range(m):
                cent_by_code = dict(
                    zip(np_books[s][0], np_books[s][1])
                )
                ps = p[s * dsub : (s + 1) * dsub]
                d += np.array(
                    [
                        ((ps - cent_by_code[int(c)]) ** 2).sum()
                        for c in codes[:, s]
                    ]
                )
            cand = sorted(
                (float(d[i]), int(ids[i]))
                for i in range(len(ids))
                if int(ids[i]) != pid
            )[:k]
            assert [(r["vec_id"]) for r in rows_] == [c[1] for c in cand]
            for r, (dv, _) in zip(rows_, cand):
                assert r["adc_d2"] == pytest.approx(dv, rel=1e-12)

    def test_pq_sql_guard_refuses_arrow_ksub(self):
        from mhw3d_detection_spark.queries.extensions import _PQ_SQL

        with pytest.raises(ValueError):
            _PQ_SQL(ksub=64)


class TestBpeTraining:
    def test_merge_apply_is_greedy_left_to_right(self, spark):
        from mhw3d_detection_spark.operators.textops import _bpe_apply, _bpe_syms

        df = spark.createDataFrame(
            [("abcab",), ("ababab",), ("a",), ("ba",)], "w string"
        )
        out = df.select(
            F.col("w"),
            _bpe_apply(_bpe_syms(F.col("w")), "a", "b").alias("m"),
        ).collect()
        got = {r["w"]: r["m"] for r in out}
        assert got == {
            "abcab": ["ab", "c", "ab"],
            "ababab": ["ab", "ab", "ab"],
            "a": ["a"],
            "ba": ["b", "a"],
        }

    def test_trainer_matches_python_model(self, spark):
        # independent Python BPE on a tiny corpus with a repeated-char
        # run (pins the self-pair exclusion contract) and a tie (pins
        # the lexicographic tie-break)
        from collections import Counter

        from mhw3d_detection_spark.operators.textops import bpe_train_merges

        texts = ["low lower lowest", "new newer newest", "aaa lowest"]
        docs = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
        )

        words = Counter()
        for t in texts:
            for w in t.split():
                words[w] += 1
        vocab = {w: list(w) for w in words}

        def model_round():
            c = Counter()
            for w, cnt in words.items():
                s = vocab[w]
                for i in range(len(s) - 1):
                    if s[i] != s[i + 1]:
                        c[(s[i], s[i + 1])] += cnt
            if not c:
                return None
            best = min(c.items(), key=lambda kv: (-kv[1], kv[0]))
            (a, b), n = best
            for w in vocab:
                s, out, i = vocab[w], [], 0
                while i < len(s):
                    if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                        out.append(a + b)
                        i += 2
                    else:
                        out.append(s[i])
                        i += 1
                vocab[w] = out
            return (a, b, n)

        want = []
        for r in range(3):
            m = model_round()
            assert m is not None
            want.append((r, m[0], m[1], m[2]))

        got = bpe_train_merges(docs, rounds=3)
        assert got == want


class TestKeySkewProfile:
    def test_matches_hand_computed_distribution(self, spark):
        from mhw3d_detection_spark.operators.analysis import key_skew_profile

        # keys: a x6, b x2, c x1, d x1 -> counts [6,2,1,1]
        rows = [("a",)] * 6 + [("b",)] * 2 + [("c",)] + [("d",)]
        df = spark.createDataFrame(rows, "k string")
        r = key_skew_profile(df, "k").collect()[0]
        assert r["n_rows"] == 10 and r["n_keys"] == 4
        assert r["max_cnt"] == 6
        # sorted counts [1,1,2,6]: p50 = 1.5 (linear interp)
        assert r["p50_cnt"] == pytest.approx(1.5)
        assert r["top1_share"] == pytest.approx(0.6)
        # hhi = (36+4+1+1)/100
        assert r["hhi"] == pytest.approx(0.42)


class TestKneserNey:
    def test_continuation_counts_beat_raw_frequency(self, spark):
        # the KN signature: 'francisco' appears 3x but ALWAYS after
        # 'san' (one continuation context); 'thing' appears 3x after 3
        # different words. A doc using 'new francisco' (an unseen-ish
        # pairing scored via backoff... here both pairings exist once)
        # must score 'x thing' higher than 'x francisco' because
        # N1+(.thing) > N1+(.francisco) drives the backoff term.
        from mhw3d_detection_spark.queries.extensions import (
            q_text_logprob_kn,
        )

        texts = [
            "san francisco san francisco san francisco",
            "good thing bad thing one thing",
            "x thing",
            "x francisco",
        ]
        docs = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
        )
        import mhw3d_detection_spark.queries.extensions as ext

        orig = ext.load_table
        ext.load_table = lambda spark, sf_dir, name: docs
        try:
            out = {
                r["doc_id"]: r["mean_logprob_kn"]
                for r in q_text_logprob_kn(spark, None).collect()
            }
        finally:
            ext.load_table = orig
        assert out[2] > out[3]


class TestFeatureHash:
    def test_signed_sums_match_python_md5(self, spark):
        import hashlib

        from mhw3d_detection_spark.operators.textops import (
            feature_hash_vectors,
        )

        texts = ["the cat sat", "the the dog"]
        docs = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
        )

        def h(tok):
            return int(hashlib.md5(tok.encode()).hexdigest()[:12], 16)

        want = {}
        for i, t in enumerate(texts):
            for tok in t.split():
                hv = h(tok)
                key = (i, hv % 64)
                want[key] = want.get(key, 0) + (1 - 2 * ((hv >> 6) & 1))
        got = {
            (r["doc_id"], r["bucket"]): r["val"]
            for r in feature_hash_vectors(docs).collect()
        }
        assert got == want


class TestBpeEncode:
    def test_compression_stats_hand_checked(self, spark):
        from mhw3d_detection_spark.operators.textops import bpe_encode_stats

        docs = spark.createDataFrame(
            [(0, "lolo ab"), (1, "xyz")], "doc_id long, text string"
        )
        # merges: (l,o) then (lo,lo) -> 'lolo' encodes to ONE symbol
        merges = [(0, "l", "o", 0), (1, "lo", "lo", 0)]
        # NOTE (lo, lo) is a self-pair a caller could hand the encoder
        # even though the trainer never selects one; _bpe_apply's
        # positional rule still merges the non-overlapping occurrence
        out = {r["doc_id"]: r for r in bpe_encode_stats(docs, merges).collect()}
        # doc 0: 'lolo' -> 4 chars, 1 symbol; 'ab' -> 2 chars 2 syms
        assert out[0]["n_tokens"] == 2
        assert out[0]["n_chars"] == 6
        assert out[0]["n_symbols"] == 3
        assert out[0]["chars_per_symbol"] == pytest.approx(2.0)
        # doc 1: untouched
        assert out[1]["n_symbols"] == 3
        assert out[1]["chars_per_symbol"] == pytest.approx(1.0)


class TestMinhashCalibration:
    def test_identical_docs_match_all_slots(self, spark):
        from mhw3d_detection_spark.operators.textops import (
            minhash_estimate_pairs,
        )

        t = "the quick brown fox jumps over the lazy dog again and again"
        docs = spark.createDataFrame(
            [(0, t), (1, t), (2, "completely different words entirely here now")],
            "doc_id long, text string",
        )
        out = {
            (r["doc_a"], r["doc_b"]): (r["n_slot_matches"], r["est_jaccard"])
            for r in minhash_estimate_pairs(
                docs, probe_pred=lambda c: c >= 0
            ).collect()
        }
        # identical docs -> identical signatures -> 8/8
        assert out[(0, 1)] == (8, 1.0)
        # disjoint shingle sets -> slot match only by hash collision
        # (none among these few shingles)
        assert out[(0, 2)][0] == 0


class TestMultiprobeIVF:
    def test_multiprobe_recall_dominates_single_cell(self, spark, sf_dir):
        # the operator's reason to exist: on the real table, 2-cell
        # probing must recover at least as many exact top-5 neighbors
        # as 1-cell probing, for every probe (supersets of candidates
        # can only improve top-k overlap with the exact result)
        from mhw3d_detection_spark.operators.similarity import (
            assign_buckets,
            cosine_topk,
            cosine_topk_multiprobe,
            kmeans_ivf_centroids,
        )

        emb = load_table(spark, sf_dir, "embeddings")
        cents = kmeans_ivf_centroids(emb, k=8, iters=2)
        exact = {
            (r["probe_id"], r["vec_id"])
            for r in cosine_topk(
                emb, probe_pred=lambda c: c % 50 == 0, k=5
            ).collect()
        }
        tagged = assign_buckets(emb, cents).select(
            "vec_id", "embedding", "bucket"
        )
        one = {
            (r["probe_id"], r["vec_id"])
            for r in cosine_topk(
                tagged, probe_pred=lambda c: c % 50 == 0, k=5,
                bucket_col="bucket",
            ).collect()
        }
        two = {
            (r["probe_id"], r["vec_id"])
            for r in cosine_topk_multiprobe(
                emb, cents, probe_pred=lambda c: c % 50 == 0, k=5, n_probe=2
            ).collect()
        }
        assert len(two & exact) >= len(one & exact)
        # and with ALL cells probed, multiprobe == brute force exactly
        allp = {
            (r["probe_id"], r["vec_id"])
            for r in cosine_topk_multiprobe(
                emb, cents, probe_pred=lambda c: c % 50 == 0, k=5, n_probe=8
            ).collect()
        }
        assert allp == exact


class TestFeatureHashDense:
    def test_dense_rowlocal_matches_grouped_sparse(self, spark, sf_dir):
        # the row-local fold and the grouped aggregate must agree on
        # every bucket (sparse omits untouched buckets -> default 0)
        from mhw3d_detection_spark.operators.textops import (
            feature_hash_dense,
            feature_hash_vectors,
        )

        docs = load_table(spark, sf_dir, "documents")
        sparse = {
            (r["doc_id"], r["bucket"]): r["val"]
            for r in feature_hash_vectors(docs).collect()
        }
        for r in feature_hash_dense(docs).collect():
            for b, v in enumerate(r["features"]):
                assert v == sparse.get((r["doc_id"], b), 0), (
                    r["doc_id"], b, v,
                )


class TestTokenPagerank:
    def test_matches_numpy_power_iteration(self, spark):
        # independent NumPy power iteration on a small graph with a
        # dangling node (pins the documented leak-mass contract) and
        # the per-round rq6 quantization
        import numpy as np

        from mhw3d_detection_spark.operators.textops import token_pagerank

        # docs -> bigram edges: a->b, b->c, c->a, a->c, c->d (d dangling)
        docs = spark.createDataFrame(
            [(0, "a b c a c d")], "doc_id long, text string"
        )
        edges = {("a", "b"), ("b", "c"), ("c", "a"), ("a", "c"), ("c", "d")}
        nodes = sorted({x for e in edges for x in e})
        idx = {t: i for i, t in enumerate(nodes)}
        out = np.zeros(len(nodes))
        for s, _ in edges:
            out[idx[s]] += 1

        def q6(a):
            return np.floor(a * 1e6 + (0.5 + 2.0**-16)) / 1e6

        pr = np.full(len(nodes), 1.0 / len(nodes))
        for _ in range(3):
            nxt = np.full(len(nodes), 0.15 / len(nodes))
            for s, d in edges:
                nxt[idx[d]] += 0.85 * pr[idx[s]] / out[idx[s]]
            pr = q6(nxt)

        got = {
            r["token"]: r["pr"] for r in token_pagerank(docs).collect()
        }
        assert set(got) == set(nodes)
        for t in nodes:
            assert got[t] == pytest.approx(pr[idx[t]], abs=2e-6), t
        # dangling 'd' receives rank but contributes none: total < 1
        assert sum(got.values()) < 1.0


class TestSetsimPrefix:
    """PPJoin prefix filter must be LOSSLESS: the prefix-filtered join
    returns exactly the pairs a brute-force all-pairs sweep finds."""

    def _brute(self, sets, t):
        ids = sorted(sets)
        out = {}
        for i, a in enumerate(ids):
            for b in ids[i + 1:]:
                sa, sb = sets[a], sets[b]
                if not sa or not sb:
                    continue
                inter = len(sa & sb)
                if inter * (1 + t) >= t * (len(sa) + len(sb)):
                    out[(a, b)] = (len(sa), len(sb), inter)
        return out

    def _shingle_sets(self, rows):
        import re

        sets = {}
        for doc_id, text in rows:
            w = re.findall(r"[a-z0-9]+", (text or "").lower())
            sets[doc_id] = {
                " ".join(w[i : i + 3]) for i in range(len(w) - 2)
            }
        return sets

    def test_matches_brute_force_on_real_docs(self, spark, sf_dir):
        from mhw3d_detection_spark.operators.textops import setsim_prefix_pairs
        from mhw3d_detection_spark.sources.tables import load_table

        docs = load_table(spark, sf_dir, "documents")
        got = {
            (r["doc_a"], r["doc_b"]): (r["na"], r["nb"], r["n_inter"])
            for r in setsim_prefix_pairs(docs, threshold=0.5).collect()
        }
        rows = [(r["doc_id"], r["text"]) for r in docs.select("doc_id", "text").collect()]
        want = self._brute(self._shingle_sets(rows), 0.5)
        assert got == want and len(want) > 0

    def test_lossless_at_tight_margins(self, spark):
        from mhw3d_detection_spark.operators.textops import setsim_prefix_pairs

        # crafted pairs sitting EXACTLY at / just under the threshold:
        # texts of 12 tokens -> 10 shingles; overlap engineered by
        # sharing a run of tokens
        base = "a1 a2 a3 a4 a5 a6 a7 a8 a9 a10 a11 a12"
        rows = [
            (1, base),
            (2, base),  # identical: J = 1
            (3, "a1 a2 a3 a4 a5 a6 a7 a8 a9 a10 a11 zz"),  # high overlap
            (4, "b1 b2 b3 b4 b5 b6 b7 b8 b9 b10 b11 b12"),  # disjoint
            (5, "a5 a6 a7 a8 a9 a10 a11 a12 c1 c2 c3 c4"),  # partial
            (6, ""),  # empty
            (7, "x1 x2"),  # sub-shingle length
        ]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        for t in (0.5, 0.3, 0.8):
            got = {
                (r["doc_a"], r["doc_b"])
                for r in setsim_prefix_pairs(docs, threshold=t).collect()
            }
            want = set(self._brute(self._shingle_sets(rows), t))
            assert got == want, (t, got, want)

    def test_jaccard_values_exact(self, spark):
        from mhw3d_detection_spark.operators.textops import setsim_prefix_pairs

        rows = [
            (1, "a1 a2 a3 a4 a5 a6"),
            (2, "a1 a2 a3 a4 a5 zz"),
        ]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        out = setsim_prefix_pairs(docs, threshold=0.3).collect()
        assert len(out) == 1
        r = out[0]
        # 4 shingles each, 3 shared: J = 3/5
        assert (r["na"], r["nb"], r["n_inter"]) == (4, 4, 3)
        assert r["jaccard"] == 3 / 5


class TestPcaPower:
    def test_recovers_planted_direction(self, spark):
        import numpy as np

        from mhw3d_detection_spark.operators.similarity import pca_top_component

        # planted dominant direction with a strong eigengap: 3 power
        # rounds must align to the true top eigenvector of the SAME
        # quantized second-moment matrix numpy sees
        rng = np.random.default_rng(11)
        d, n = 16, 400
        u = rng.normal(size=d)
        u /= np.linalg.norm(u)
        X = rng.normal(scale=0.3, size=(n, d)) + np.outer(
            rng.normal(scale=3.0, size=n), u
        )
        rows = [(i, [float(x) for x in X[i]]) for i in range(n)]
        emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        out = (
            pca_top_component(emb, iters=3)
            .orderBy("dim_idx")
            .collect()
        )
        v = np.array([r["loading"] for r in out])
        # numpy reference over the exactly-quantized inputs
        Xq = np.floor(X.astype(np.float32).astype(np.float64) * 64.0 + 0.5 + 2.0**-16) / 64.0
        G = Xq.T @ Xq
        evals, evecs = np.linalg.eigh(G)
        top = evecs[:, -1]
        assert abs(float(v @ top)) > 0.999
        assert abs(np.linalg.norm(v) - 1.0) < 1e-12
        # Rayleigh quotient sandwiched by the true extremes, near max
        lam = out[0]["eigval"]
        assert lam <= evals[-1] + 1e-9
        assert lam >= 0.99 * evals[-1]

    def test_gram_single_pass_and_broadcast_rounds(self, spark, sf_dir):
        from mhw3d_detection_spark.operators.similarity import pca_top_component
        from mhw3d_detection_spark.sources.tables import load_table

        emb = load_table(spark, sf_dir, "embeddings")
        plan = (
            pca_top_component(emb, iters=3)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        # the data-sized join is the vec_id self-join feeding the Gram;
        # every round's matvec joins a BROADCAST 64-row vector
        assert "BroadcastExchange" in plan, plan
        assert "CartesianProduct" not in plan, plan


class TestMmrDiversify:
    def _py_greedy(self, rel, sim, k, lam):
        # reference greedy on the SAME quantized scores
        sel = []
        best = sorted(rel, key=lambda d: (-rel[d], d))[0]
        sel.append((best, lam * rel[best]))
        while len(sel) < k:
            chosen = {d for d, _ in sel}
            cands = []
            for d in rel:
                if d in chosen:
                    continue
                msim = max(sim[(d, s)] for s in chosen)
                cands.append((lam * rel[d] - (1 - lam) * msim, d))
            cands.sort(key=lambda t: (-t[0], t[1]))
            sel.append((cands[0][1], cands[0][0]))
        return sel

    def test_matches_python_greedy_and_diversifies(self, spark):
        import numpy as np

        from mhw3d_detection_spark.operators.similarity import mmr_diversify

        # probe at e0; candidates: three near-clones along e0 (top
        # relevance) and two moderately relevant but DIVERSE directions
        vecs = {
            0: [1.0, 0.0, 0.0, 0.0],        # probe
            1: [0.99, 0.14, 0.0, 0.0],      # clone A
            2: [0.99, 0.141, 0.0, 0.0],     # clone A'
            3: [0.985, 0.17, 0.0, 0.0],     # clone A''
            4: [0.8, 0.0, 0.6, 0.0],        # diverse B
            5: [0.75, 0.0, 0.0, 0.66],      # diverse C
        }
        emb = spark.createDataFrame(
            [(i, [float(x) for x in v]) for i, v in vecs.items()],
            "vec_id long, embedding array<float>",
        )
        out = mmr_diversify(emb, 0, k=3, pool=5, lam=0.5).orderBy("rank").collect()
        picked = [r["vec_id"] for r in out]
        # pure top-3 by relevance would be the three clones; MMR must
        # swap redundancy for the diverse directions after the first
        assert picked[0] in (1, 2, 3)
        assert {4, 5} & set(picked), picked
        # exact replay of the greedy on the collected quantized scores
        rel = {}
        sim = {}
        q = lambda x: np.floor(x * 1e6 + 0.5 + 2.0**-16) / 1e6
        import numpy.linalg as la

        vp = np.array(vecs[0], dtype=np.float32).astype(np.float64)
        for i, v in vecs.items():
            if i == 0:
                continue
            va = np.array(v, dtype=np.float32).astype(np.float64)
            rel[i] = float(q(va @ vp / (la.norm(va) * la.norm(vp))))
        for i in rel:
            for j in rel:
                if i != j:
                    va = np.array(vecs[i], dtype=np.float32).astype(np.float64)
                    vb = np.array(vecs[j], dtype=np.float32).astype(np.float64)
                    sim[(i, j)] = float(
                        q(va @ vb / (la.norm(va) * la.norm(vb)))
                    )
        want = self._py_greedy(rel, sim, 3, 0.5)
        assert picked == [d for d, _ in want]


class TestQuantileNormalize:
    def test_uniform_rate_after_threshold(self, spark):
        from mhw3d_detection_spark.operators.textops import quantile_normalize

        # source A scores ~N(0,1)-ish ranks, source B shifted +10: raw
        # thresholding prunes ALL of A; normalized thresholding prunes
        # both at the same rate
        rows = [(i, "A", float(i % 50)) for i in range(50)]
        rows += [(100 + i, "B", 10.0 + float(i % 50)) for i in range(50)]
        df = spark.createDataFrame(rows, "doc_id long, source string, s double")
        out = quantile_normalize(df, score_col="s", group_col="source").collect()
        med = sorted(r["norm_score"] for r in out)[len(out) // 2]
        kept = [r for r in out if r["norm_score"] >= med]
        by_src = {s: sum(1 for r in kept if r["source"] == s) for s in ("A", "B")}
        assert abs(by_src["A"] - by_src["B"]) <= 2, by_src

    def test_matches_numpy_interp(self, spark):
        import numpy as np

        from mhw3d_detection_spark.operators.textops import quantile_normalize

        rng = np.random.default_rng(13)
        rows = []
        for gi, g in enumerate(("x", "y", "z")):
            for i, v in enumerate(rng.normal(gi * 2.0, 1.0 + gi, 40)):
                rows.append((gi * 100 + i, g, float(v)))
        df = spark.createDataFrame(rows, "doc_id long, source string, s double")
        got = {
            r["doc_id"]: r["norm_score"]
            for r in quantile_normalize(
                df, score_col="s", group_col="source"
            ).collect()
        }
        allv = np.sort(np.array([v for _, _, v in rows]))
        N = len(allv)
        for g in ("x", "y", "z"):
            grp = sorted((v, d) for d, gg, v in rows if gg == g)
            n = len(grp)
            ranks = {d: i for i, (v, d) in enumerate(grp)}
            # percent_rank with no ties here: i/(n-1)
            for v, d in grp:
                p = ranks[d] / (n - 1)
                pos = p * (N - 1)  # 0-based numpy position
                lo = int(np.floor(pos))
                hi = min(lo + 1, N - 1)
                want = allv[lo] + (pos - lo) * (allv[hi] - allv[lo])
                assert abs(got[d] - want) < 1e-9, (d, got[d], want)

    def test_null_scores_excluded(self, spark):
        from mhw3d_detection_spark.operators.textops import quantile_normalize

        df = spark.createDataFrame(
            [(1, "a", 1.0), (2, "a", None), (3, "a", 3.0)],
            "doc_id long, source string, s double",
        )
        out = quantile_normalize(df, score_col="s", group_col="source").collect()
        assert sorted(r["doc_id"] for r in out) == [1, 3]


class TestSourceDivergence:
    def test_identical_source_zero_kl_and_identity(self, spark):
        import math

        from mhw3d_detection_spark.operators.textops import source_divergence

        # source "same" has exactly the pooled distribution (all rows
        # identical corpus-wide): KL = 0; and KL = CE - H everywhere
        rows = [(i, "a b c", "same") for i in range(4)]
        docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
        r = source_divergence(docs).collect()[0]
        assert abs(r["kl"]) < 1e-12
        assert abs(r["cross_entropy"] - r["entropy"]) < 1e-12
        assert abs(r["entropy"] - math.log(3)) < 1e-12  # uniform over 3

    def test_matches_scipy_style_reference(self, spark):
        import math
        from collections import Counter

        from mhw3d_detection_spark.operators.textops import source_divergence

        corpora = {
            "s1": "the cat sat on the mat the cat",
            "s2": "dogs chase cats and dogs bark",
            "s3": "the the the the unique token here",
        }
        rows = [(i, t, s) for i, (s, t) in enumerate(corpora.items())]
        docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
        got = {r["source"]: r for r in source_divergence(docs).collect()}
        pool = Counter()
        per = {}
        for s, t in corpora.items():
            c = Counter(t.split())
            per[s] = c
            pool.update(c)
        nq = sum(pool.values())
        for s, c in per.items():
            ns = sum(c.values())
            kl = sum(
                (v / ns) * math.log((v / ns) / (pool[t] / nq))
                for t, v in c.items()
            )
            h = sum(-(v / ns) * math.log(v / ns) for v, in [(v,) for v in c.values()])
            assert abs(got[s]["kl"] - kl) < 1e-9, s
            assert abs(got[s]["entropy"] - h) < 1e-9, s
            assert abs(got[s]["cross_entropy"] - (kl + h)) < 1e-9, s
            assert got[s]["n_tokens"] == ns


def test_pca_gram_modes_bit_identical(spark, sf_dir):
    # the Arrow/BLAS Gram and the declarative double-Generate Gram must
    # produce bit-identical results: quantized products are exact
    # dyadics, and dyadic sums are association-free (BLAS order, Spark
    # partial-merge order - same bits)
    from mhw3d_detection_spark.operators.similarity import pca_top_component
    from mhw3d_detection_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    a = pca_top_component(emb, iters=3, gram="arrow").orderBy("dim_idx").collect()
    b = pca_top_component(emb, iters=3, gram="explode").orderBy("dim_idx").collect()
    assert [(r["loading"], r["eigval"]) for r in a] == [
        (r["loading"], r["eigval"]) for r in b
    ]


def test_setsim_float_slop_at_integer_boundaries(spark):
    # regression: 50 * 0.14 = 7.000000000000001 in IEEE — a size filter
    # or prefix length computed with raw t would prune a pair whose
    # true Jaccard EQUALS the threshold. Doc A: 52 tokens -> 50
    # shingles; doc B: 9 tokens -> 7 shingles, all shared with A.
    # J = 7/50 = 0.14 exactly.
    from mhw3d_detection_spark.operators.textops import setsim_prefix_pairs

    a_toks = " ".join(f"w{i}" for i in range(52))
    b_toks = " ".join(f"w{i}" for i in range(9))  # shingles w0..w6 chains
    docs = spark.createDataFrame(
        [(1, a_toks), (2, b_toks)], "doc_id long, text string"
    )
    out = setsim_prefix_pairs(docs, threshold=0.14).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["na"], r["nb"], r["n_inter"]) == (50, 7, 7)
    assert abs(r["jaccard"] - 0.14) < 1e-15


class TestWeightedSample:
    def test_matches_python_es_reference(self, spark):
        import hashlib
        import math

        from mhw3d_detection_spark.operators.textops import weighted_sample

        rows = [(i, float(1 + (i % 7))) for i in range(300)]
        df = spark.createDataFrame(rows, "doc_id long, w double")
        got = [r["doc_id"] for r in weighted_sample(df, 20, "w").collect()]

        def key(i, wgt):
            u = int(hashlib.md5(str(i).encode()).hexdigest()[:12], 16) / float(
                1 << 48
            )
            k = math.log(u) / wgt
            return math.floor(k * 1e6 + 0.5 + 2.0**-16) / 1e6

        want = sorted(rows, key=lambda t: (-key(*t), t[0]))[:20]
        assert got == [i for i, _ in want]

    def test_selection_proportional_to_weight(self, spark):
        from mhw3d_detection_spark.operators.textops import weighted_sample

        # 100 heavy (w=4) + 100 light (w=1) items; over 60 independent
        # salted draws of 20, heavy items must be selected ~4x as often
        rows = [(i, 4.0 if i < 100 else 1.0) for i in range(200)]
        df = spark.createDataFrame(rows, "doc_id long, w double").cache()
        heavy = light = 0
        for s in range(60):
            ids = [
                r["doc_id"]
                for r in weighted_sample(df, 20, "w", salt=f"s{s}").collect()
            ]
            heavy += sum(1 for i in ids if i < 100)
            light += sum(1 for i in ids if i >= 100)
        ratio = heavy / max(light, 1)
        # true inclusion-probability ratio for n=20 of 200 at w 4:1 is
        # ~3.6 (without-replacement saturation); accept a wide band
        assert 2.5 < ratio < 5.5, (heavy, light)

    def test_nonpositive_weights_excluded(self, spark):
        from mhw3d_detection_spark.operators.textops import weighted_sample

        df = spark.createDataFrame(
            [(1, 2.0), (2, 0.0), (3, -1.0), (4, None)],
            "doc_id long, w double",
        )
        assert [r["doc_id"] for r in weighted_sample(df, 10, "w").collect()] == [1]


class TestKnnAndNegatives:
    def _emb(self, spark, rows):
        return spark.createDataFrame(
            rows, "vec_id long, embedding array<float>, label int"
        )

    def test_knn_majority_and_tiebreak(self, spark):
        # probe 0 sits in a 3-vs-2 neighborhood: majority label wins;
        # probe 100 sits in a 2-vs-2(+self-excluded) tie: the SMALLER
        # label id wins the tie
        rows = [
            (0, [1.0, 0.0], 7),
            (1, [0.99, 0.01], 3), (2, [0.98, 0.02], 3), (3, [0.97, 0.03], 3),
            (4, [0.96, 0.04], 9), (5, [0.95, 0.05], 9),
            (100, [0.0, 1.0], 7),
            (101, [0.01, 0.99], 5), (102, [0.02, 0.98], 5),
            (103, [0.03, 0.97], 2), (104, [0.04, 0.96], 2),
        ]
        from mhw3d_detection_spark.operators.similarity import knn_classify

        out = {
            r.probe_id: (r.pred_label, r.n_votes, r.correct)
            for r in knn_classify(
                self._emb(spark, rows), lambda c: c % 100 == 0, k=5
            ).collect()
        }
        assert out[0] == (3, 3, 0)
        # probe 100's 5 nearest: 101,102 (5), 103,104 (2) and one far
        # first-cluster vector -> 2-2-1; tie between 2 and 5 -> label 2
        assert out[100][0] == 2 and out[100][2] == 0

    def test_hard_negatives_never_same_label(self, spark, sf_dir):
        from mhw3d_detection_spark.operators.similarity import cosine_topk

        emb = load_table(spark, sf_dir, "embeddings")
        labels = {r.vec_id: r.label for r in emb.select("vec_id", "label").collect()}
        out = cosine_topk(
            emb, lambda c: c % 50 == 0, k=5,
            label_col="label", cross_label_only=True,
        ).collect()
        assert out
        for r in out:
            assert labels[r.vec_id] != labels[r.probe_id]

    def test_hard_negatives_are_top_cross_label(self, spark, sf_dir):
        # brute-force numpy differential for one probe
        import numpy as np

        from mhw3d_detection_spark.operators.similarity import cosine_topk

        emb = load_table(spark, sf_dir, "embeddings")
        rows = emb.select("vec_id", "embedding", "label").collect()
        ids = np.array([r.vec_id for r in rows])
        X = np.array([list(r.embedding) for r in rows], dtype=np.float64)
        lab = np.array([r.label for r in rows])
        probe = int(ids[ids % 50 == 0][0])
        pi = int(np.where(ids == probe)[0][0])
        n = np.linalg.norm(X, axis=1)
        cos = (X @ X[pi]) / np.where(n * n[pi] > 0, n * n[pi], 1.0)
        mask = (ids != probe) & (lab != lab[pi]) & (n > 0)
        order = sorted(
            [(-cos[i], ids[i]) for i in np.where(mask)[0]]
        )[:5]
        want = [int(v) for _, v in order]
        got = [
            r.vec_id
            for r in cosine_topk(
                emb, lambda c: c == probe, k=5,
                label_col="label", cross_label_only=True,
            ).orderBy("rank").collect()
        ]
        assert got == want


class TestEmbeddingOutliers:
    def test_planted_outlier_flagged(self, spark):
        import numpy as np

        rng = np.random.default_rng(5)
        rows = []
        for i in range(40):
            v = (np.array([1.0, 0.0, 0.0]) + rng.normal(0, 0.01, 3)).tolist()
            rows.append((i, [float(x) for x in v], 1))
        rows.append((99, [0.0, 5.0, 0.0], 1))  # planted off-manifold
        # a clean tight second class: nothing flagged there
        for i in range(100, 120):
            v = (np.array([0.0, 0.0, 1.0]) + rng.normal(0, 0.01, 3)).tolist()
            rows.append((i, [float(x) for x in v], 2))
        emb = spark.createDataFrame(
            rows, "vec_id long, embedding array<float>, label int"
        )
        from mhw3d_detection_spark.operators.similarity import embedding_outliers

        out = {r.vec_id: r for r in embedding_outliers(emb).collect()}
        # the plant dominates its class: huge z, flagged
        assert out[99].outlier == 1 and out[99].z > 5.0
        # within class 1 nothing else comes close (the plant inflates
        # the std); class 2 may legitimately flag a ~2-sigma tail draw
        flagged1 = [v for v, r in out.items() if r.outlier == 1 and r.label == 1]
        assert flagged1 == [99]

    def test_degenerate_classes_flag_nothing(self, spark):
        # zero distance spread (identical members) and a singleton
        # class: var == 0 -> z = 0, no flags, no NaN/crash
        rows = [
            (1, [1.0, 0.0], 1), (2, [1.0, 0.0], 1), (3, [1.0, 0.0], 1),
            (4, [0.0, 1.0], 2),
        ]
        emb = spark.createDataFrame(
            rows, "vec_id long, embedding array<float>, label int"
        )
        from mhw3d_detection_spark.operators.similarity import embedding_outliers

        out = embedding_outliers(emb).collect()
        assert len(out) == 4
        for r in out:
            assert r.outlier == 0 and r.z == 0.0


class TestKeepBestDedup:
    def test_component_keeps_highest_quality(self, spark):
        # docs 1,2,3 form one component (explicit pairs); doc 2 has the
        # clearly best quality (long clean text vs punctuation soup);
        # doc 4 is a singleton -> kept; singleton component id = own id
        long_clean = " ".join(
            ["the quick brown fox jumps over the lazy dog and runs for fun"] * 10
        )
        rows = [
            (1, "!!! ??? ### $$$ %%%", "s"),
            (2, long_clean, "s"),
            (3, "short text", "s"),
            (4, "another standalone document entirely", "s"),
        ]
        docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
        pairs = spark.createDataFrame(
            [(1, 2), (2, 3)], "doc_a long, doc_b long"
        )
        from mhw3d_detection_spark.operators.textops import dedup_keep_best

        out = {r.doc_id: r for r in dedup_keep_best(docs, pairs).collect()}
        assert len(out) == 4
        assert [out[i].component for i in (1, 2, 3)] == [1, 1, 1]
        assert (out[1].kept, out[2].kept, out[3].kept) == (0, 1, 0)
        assert out[4].kept == 1 and out[4].component == 4
        assert out[2].quality > out[1].quality

    def test_quality_tie_breaks_to_min_id(self, spark):
        rows = [
            (7, "identical text body here", "s"),
            (9, "identical text body here", "s"),
        ]
        docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
        pairs = spark.createDataFrame([(7, 9)], "doc_a long, doc_b long")
        from mhw3d_detection_spark.operators.textops import dedup_keep_best

        out = {r.doc_id: r.kept for r in dedup_keep_best(docs, pairs).collect()}
        assert out == {7: 1, 9: 0}


class TestDsirWeights:
    def test_target_alignment_orders_weights(self, spark):
        # target slice speaks {alpha beta}; the raw pool mostly speaks
        # {gamma delta}. A pool doc written in target vocabulary must
        # outweigh one written in pool vocabulary, and the top-m flag
        # must pick the target-aligned docs first.
        rows = []
        for i in range(20):
            rows.append((i, "alpha beta alpha beta alpha", "target"))
        for i in range(20, 60):
            rows.append((i, "gamma delta gamma delta gamma", "pool"))
        rows.append((100, "alpha beta alpha alpha beta beta", "pool"))
        rows.append((101, "gamma delta delta gamma gamma delta", "pool"))
        rows.append((102, "alpha gamma beta delta", "pool"))  # mixed
        docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
        from mhw3d_detection_spark.operators.textops import dsir_weights

        out = {
            r.doc_id: r
            for r in dsir_weights(
                docs, target_pred=lambda s: s == "target", top_m=25
            ).collect()
        }
        # per-token normalize: alignment ordering target-ish > mixed > pool-ish
        wa = out[100].dsir_weight / out[100].n_tokens
        wm = out[102].dsir_weight / out[102].n_tokens
        wp = out[101].dsir_weight / out[101].n_tokens
        assert wa > wm > wp
        assert out[100].selected == 1 and out[101].selected == 0
        # top-m is exactly m rows
        assert sum(r.selected for r in out.values()) == 25

    def test_weight_is_exact_dyadic_sum(self, spark):
        # the per-doc weight must be reproducible bit-for-bit across
        # repartitionings (association-free dyadic sums — the hash-gate
        # property the oracle relies on)
        rows = [(i, f"tok{i % 7} tok{i % 3} alpha beta word{i}", "s" + str(i % 4))
                for i in range(100)]
        docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
        from mhw3d_detection_spark.operators.textops import dsir_weights

        a = {
            r.doc_id: r.dsir_weight
            for r in dsir_weights(docs, lambda s: s == "s0").collect()
        }
        b = {
            r.doc_id: r.dsir_weight
            for r in dsir_weights(
                docs.repartition(13, "source"), lambda s: s == "s0"
            ).collect()
        }
        assert a == b


class TestMediaSniff:
    """E5 r8: REAL container-header parsing (no codec libs) — crafted
    spec-conformant headers for PNG/JPEG/GIF/BMP/WAV must yield exact
    dimensions/PCM params; garbage stays format='unknown', no raise."""

    def _png(self, w, h, bit_depth=8, color_type=6):
        import struct, zlib
        ihdr = struct.pack(">II", w, h) + bytes(
            [bit_depth, color_type, 0, 0, 0]
        )
        chunk = (
            struct.pack(">I", len(ihdr)) + b"IHDR" + ihdr
            + struct.pack(">I", zlib.crc32(b"IHDR" + ihdr))
        )
        return b"\x89PNG\r\n\x1a\n" + chunk

    def _jpeg(self, w, h, nc=3):
        import struct
        app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 9
        sof0 = (
            b"\xff\xc0" + struct.pack(">H", 8 + 3 * nc) + bytes([8])
            + struct.pack(">HH", h, w) + bytes([nc]) + b"\x00" * (3 * nc)
        )
        return b"\xff\xd8" + app0 + sof0 + b"\xff\xd9"

    def _wav(self, nc=2, sr=16000, bits=16, n_samples=16000):
        import struct
        data_len = n_samples * nc * bits // 8
        fmt = (
            b"fmt " + struct.pack("<I", 16)
            + struct.pack("<HHIIHH", 1, nc, sr, sr * nc * bits // 8,
                          nc * bits // 8, bits)
        )
        data = b"data" + struct.pack("<I", data_len) + b"\x00" * 4  # truncated ok
        body = b"WAVE" + fmt + data
        return b"RIFF" + struct.pack("<I", len(body)) + body

    def test_formats(self):
        import struct
        from mhw3d_detection_spark.operators.multimodal import sniff_media

        m = sniff_media(self._png(640, 480))
        assert (m["format"], m["width"], m["height"], m["n_channels"]) == (
            "png", 640, 480, 4
        )
        m = sniff_media(self._jpeg(1920, 1080))
        assert (m["format"], m["width"], m["height"], m["n_channels"],
                m["bit_depth"]) == ("jpeg", 1920, 1080, 3, 8)
        m = sniff_media(b"GIF89a" + struct.pack("<HH", 320, 200) + b"\x00" * 5)
        assert (m["format"], m["width"], m["height"]) == ("gif", 320, 200)
        m = sniff_media(self._wav())
        assert (m["format"], m["n_channels"], m["sample_rate"],
                m["bit_depth"]) == ("wav", 2, 16000, 16)
        assert m["duration_ms"] == 1000.0  # 16000 samples @ 16 kHz
        for junk in (b"", b"\x00", b"not media at all" * 10,
                     self._png(1, 1)[:10]):
            m = sniff_media(junk)
            assert m["format"] == "unknown" and m["n_bytes"] == len(junk)

    def test_probe_media_plan_and_rows(self, spark):
        from mhw3d_detection_spark.operators.multimodal import probe_media

        rows = [
            (1, bytearray(self._png(64, 32))),
            (2, bytearray(self._jpeg(10, 20, nc=1))),
            (3, bytearray(self._wav(nc=1, sr=8000, bits=8, n_samples=4000))),
            (4, bytearray(b"garbage")),
        ]
        media = spark.createDataFrame(rows, "doc_id long, payload binary")
        out = {r.doc_id: r for r in probe_media(media).collect()}
        assert out[1].format == "png" and (out[1].width, out[1].height) == (64, 32)
        assert out[2].format == "jpeg" and out[2].n_channels == 1
        assert out[3].format == "wav" and out[3].duration_ms == 500.0
        assert out[4].format == "unknown"
        # narrow plan: Arrow-batched map, no exchange, no row-Python
        plan = probe_media(media)._jdf.queryExecution().executedPlan().toString()
        assert "MapInPandas" in plan and "Exchange hashpartitioning" not in plan
        assert "BatchEvalPython" not in plan


class TestCosineTopkArrow:
    def test_matches_fold_path(self, spark, sf_dir):
        # deployment twin: same neighbor SETS and ranks as the fold
        # path on the real table (no near-tie pathologies in driver
        # data), cosines equal to BLAS-association tolerance
        from mhw3d_detection_spark.operators.similarity import (
            cosine_topk,
            cosine_topk_arrow,
        )

        emb = load_table(spark, sf_dir, "embeddings")
        pred = lambda c: c % 50 == 0  # noqa: E731
        a = {
            (r.probe_id, r.rank): (r.vec_id, r.cosine)
            for r in cosine_topk(emb, pred, k=5).collect()
        }
        b = {
            (r.probe_id, r.rank): (r.vec_id, r.cosine)
            for r in cosine_topk_arrow(emb, pred, k=5).collect()
        }
        assert set(a) == set(b) and a
        for key_, (vid, cos) in a.items():
            bvid, bcos = b[key_]
            assert bvid == vid, (key_, vid, bvid)
            assert abs(bcos - cos) < 1e-12

    def test_zero_norm_and_small_batches(self, spark):
        from mhw3d_detection_spark.operators.similarity import (
            cosine_topk_arrow,
        )

        rows = [
            (0, [1.0, 0.0]), (1, [0.9, 0.1]), (2, [0.0, 0.0]),  # zero vec
            (3, [0.5, 0.5]), (4, [0.0, 1.0]),
        ]
        emb = spark.createDataFrame(
            rows, "vec_id long, embedding array<float>"
        ).repartition(4)  # force several tiny Arrow batches
        out = cosine_topk_arrow(emb, lambda c: c == 0, k=3).collect()
        got = [(r.vec_id, r.rank) for r in sorted(out, key=lambda r: r.rank)]
        # zero-norm vec 2 excluded; order: 1 (cos .994), 3 (.707), 4 (0)
        assert got == [(1, 1), (3, 2), (4, 3)]


class TestReviewRegressionsR8:
    """Pins for the r8 code-review findings."""

    def test_cohort_week_floor_negative_epoch(self):
        # BOTH engines' integer division truncates; the pmod-floor
        # construction must agree with true floor for negative epochs
        import duckdb

        W = 7 * 86400 * 1_000_000
        for us in (-1, -W, -W - 1, 0, 1, W, W - 1, -3 * W + 5):
            (d,) = duckdb.sql(
                f"select ({us} - (({us} % {W}) + {W}) % {W}) // {W}"
            ).fetchone()
            assert d == us // W  # python // IS floor

    def test_arrow_topk_boundary_ties(self, spark):
        # duplicate embeddings tied at the k-th cosine: the kernel must
        # apply the vec_id tie-break across the argpartition boundary,
        # independent of Arrow batch partitioning
        from mhw3d_detection_spark.operators.similarity import (
            cosine_topk,
            cosine_topk_arrow,
        )

        rows = [(0, [1.0, 0.0])] + [
            (i, [1.0, 0.0]) for i in (9, 5, 3, 8, 2, 7)
        ] + [(20, [0.0, 1.0])]
        emb = spark.createDataFrame(
            rows, "vec_id long, embedding array<float>"
        ).repartition(5)
        want = [
            (r.vec_id, r.rank)
            for r in cosine_topk(emb, lambda c: c == 0, k=3)
            .orderBy("rank").collect()
        ]
        got = [
            (r.vec_id, r.rank)
            for r in cosine_topk_arrow(emb, lambda c: c == 0, k=3)
            .orderBy("rank").collect()
        ]
        assert want == [(2, 1), (3, 2), (5, 3)]
        assert got == want

    def test_jpeg_fill_bytes(self):
        import struct
        from mhw3d_detection_spark.operators.multimodal import sniff_media

        sof0 = (
            b"\xff\xff\xff\xc0"  # two fill bytes before the marker
            + struct.pack(">H", 11) + bytes([8])
            + struct.pack(">HH", 33, 44) + bytes([1]) + b"\x00" * 3
        )
        m = sniff_media(b"\xff\xd8" + sof0 + b"\xff\xd9")
        assert (m["format"], m["width"], m["height"]) == ("jpeg", 44, 33)

    def test_dsir_zero_token_doc_kept_at_zero(self, spark):
        from mhw3d_detection_spark.operators.textops import dsir_weights

        rows = [
            (1, "alpha beta gamma", "t"),
            (2, "", "p"),            # zero tokens
            (3, "!!! ...", "p"),     # punctuation-only -> zero tokens
            (4, "delta words here", "p"),
        ]
        docs = spark.createDataFrame(
            rows, "doc_id long, text string, source string"
        )
        out = {r.doc_id: r for r in dsir_weights(docs, lambda s: s == "t").collect()}
        assert set(out) == {1, 2, 3, 4}  # full domain, nothing vanishes
        for d in (2, 3):
            assert out[d].n_tokens == 0 and out[d].dsir_weight == 0.0

    def test_netcdf_grid_value_mismatch_rejected(self, spark, tmp_path):
        import numpy as np
        from mhw3d_detection_spark.sources.netcdf import (
            read_netcdf_long,
            write_netcdf_classic,
        )

        def wf(path, lats):
            write_netcdf_classic(
                path,
                {"time": 2, "lat": 2, "lon": 2},
                {
                    "lat": (["lat"], np.asarray(lats, dtype=float), {}),
                    "lon": (["lon"], np.array([0.0, 1.0]), {}),
                    "time": (["time"], np.array([0.0, 1.0]),
                             {"units": "days since 1990-01-01"}),
                    "sst": (["time", "lat", "lon"],
                            np.ones((2, 2, 2)), {}),
                },
            )

        wf(str(tmp_path / "a_0.nc"), [0.0, 0.25])
        wf(str(tmp_path / "a_1.nc"), [0.0, 1.00])  # same origin, diff spacing
        import pytest as _pt

        with _pt.raises(ValueError, match="grid differs"):
            read_netcdf_long(
                spark, str(tmp_path / "a_*.nc"), "sst", engine="builtin"
            )
        with _pt.raises(Exception, match="grid differs"):
            read_netcdf_long(
                spark, str(tmp_path / "a_*.nc"), "sst",
                engine="builtin", distribute=True,
            ).collect()


class TestTokenTriangles:
    def test_known_graph(self, spark):
        # craft docs whose co-occurrence edges (count>=2, window=1)
        # form a triangle a-b-c plus a pendant edge c-d: a,b,c get one
        # triangle each, d none
        from mhw3d_detection_spark.operators.textops import token_triangles

        text = "aa bb cc aa cc dd"  # edges aa-bb, bb-cc, cc-aa, cc-dd
        docs = spark.createDataFrame(
            [(i, text, "s") for i in range(3)],
            "doc_id long, text string, source string",
        )
        out = {
            r.token: r.n_triangles
            for r in token_triangles(docs, window=1, min_count=3).collect()
        }
        assert out == {"aa": 1, "bb": 1, "cc": 1}

    def test_each_triangle_counted_once(self, spark):
        # K4 has 4 triangles; every vertex sits in exactly 3
        from pyspark.sql import functions as F

        from mhw3d_detection_spark.operators.textops import token_triangles

        # build K4 via docs: every unordered pair adjacent repeatedly
        pairs = [("pa", "pb"), ("pa", "pc"), ("pa", "pd"),
                 ("pb", "pc"), ("pb", "pd"), ("pc", "pd")]
        text = " ".join(f"{x} {y}" for x, y in pairs)
        docs = spark.createDataFrame(
            [(i, text, "s") for i in range(5)],
            "doc_id long, text string, source string",
        )
        out = {
            r.token: r.n_triangles
            for r in token_triangles(docs, window=1, min_count=5).collect()
        }
        # window=1 over the concatenated text also links y_i to x_{i+1}
        # exactly once per doc = count 5 >= min_count... so restrict:
        # accept supersets but the four K4 vertices must each be in >= 3
        for t in ("pa", "pb", "pc", "pd"):
            assert out.get(t, 0) >= 3

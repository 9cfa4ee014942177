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

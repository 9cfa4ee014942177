"""The composed curation funnel (plans/curation.py): stage invariants
and agreement with the standalone component operators. Cross-engine
value equality is gated separately by the q_curate_corpus oracle."""

import pytest
from pyspark.sql import functions as F

from mhw3d_detection_spark.plans import curate_corpus
from mhw3d_detection_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def funnel(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    out = {r.doc_id: r for r in curate_corpus(docs, emb).collect()}
    return docs, emb, out


class TestCurationFunnel:
    def test_every_doc_exactly_one_stage(self, spark, funnel):
        docs, _, out = funnel
        ids = {r.doc_id for r in docs.select("doc_id").collect()}
        assert set(out) == ids
        stages = {"quality", "exact_dup", "near_dup", "semantic_dup", "kept"}
        assert {r.stage for r in out.values()} <= stages
        assert any(r.stage == "kept" for r in out.values())
        assert any(r.stage == "quality" for r in out.values())

    def test_quality_stage_matches_classifier(self, spark, funnel):
        from mhw3d_detection_spark.operators.textops import quality_classifier

        docs, _, out = funnel
        keep = {r.doc_id: r.keep for r in quality_classifier(docs).collect()}
        for did, r in out.items():
            assert (r.stage == "quality") == (keep[did] == 0)

    def test_stage_ordering_is_first_failing(self, spark, funnel):
        # a doc dropped at a later stage must have PASSED every earlier
        # one: near_dup/semantic_dup docs have keep=1 and are their own
        # exact-dedup canonical
        from mhw3d_detection_spark.operators.textops import quality_classifier

        docs, _, out = funnel
        keep = {r.doc_id: r.keep for r in quality_classifier(docs).collect()}
        texts = {r.doc_id: r.text for r in docs.select("doc_id", "text").collect()}
        survivors1 = {d for d, k in keep.items() if k == 1}
        canon = {}
        for d in sorted(survivors1):
            canon.setdefault(texts[d], d)
        for did, r in out.items():
            if r.stage in ("near_dup", "semantic_dup", "kept"):
                assert keep[did] == 1
                assert canon[texts[did]] == did  # own canonical
            if r.stage == "exact_dup":
                assert keep[did] == 1 and canon[texts[did]] != did

    def test_split_matches_standalone_assign(self, spark, funnel):
        from mhw3d_detection_spark.operators.textops import split_assign

        docs, _, out = funnel
        want = {r.doc_id: r.split for r in split_assign(docs).collect()}
        assert {d: r.split for d, r in out.items()} == want

    def test_kept_fraction_sane(self, spark, funnel):
        _, _, out = funnel
        kept = sum(1 for r in out.values() if r.stage == "kept")
        assert 0 < kept < len(out)


def test_reliable_checkpoints_same_result(spark, sf_dir, tmp_path):
    # the reliable-checkpoint path (checkpoint dir) must produce the
    # identical funnel; only the block storage differs
    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    spark.sparkContext.setCheckpointDir(str(tmp_path / "chk"))
    a = {(r.doc_id, r.stage, r.split) for r in curate_corpus(docs, emb).collect()}
    b = {
        (r.doc_id, r.stage, r.split)
        for r in curate_corpus(docs, emb, reliable_checkpoints=True).collect()
    }
    assert a == b

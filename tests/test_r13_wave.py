"""r13 wave tests: the minhash hot-bucket cap, the correlated-subquery
TPC-H family's plan shapes, and the composed survival report."""

import pytest
from pyspark.sql import functions as F

from mhw3d_detection_spark.operators.textops import (
    minhash_bands_rowlocal,
    minhash_candidate_pairs,
)
from mhw3d_detection_spark.sources.tables import load_table


def _pairs_set(df):
    return {(r.doc_a, r.doc_b) for r in df.collect()}


class TestMinhashBucketCap:
    def test_uncapped_default_unchanged(self, spark, sf_dir):
        docs = load_table(spark, sf_dir, "documents")
        sigs = minhash_bands_rowlocal(docs, n_hashes=8, band_size=2)
        assert _pairs_set(minhash_candidate_pairs(sigs)) == _pairs_set(
            minhash_candidate_pairs(sigs, max_bucket_size=None)
        )

    def test_capped_is_subset_and_deterministic(self, spark, sf_dir):
        docs = load_table(spark, sf_dir, "documents")
        sigs = minhash_bands_rowlocal(docs, n_hashes=8, band_size=2)
        full = _pairs_set(minhash_candidate_pairs(sigs))
        capped = _pairs_set(minhash_candidate_pairs(sigs, max_bucket_size=2))
        assert capped <= full
        # deterministic: same plan, same pairs on re-run
        again = _pairs_set(minhash_candidate_pairs(sigs, max_bucket_size=2))
        assert capped == again

    def test_huge_cap_is_identity(self, spark, sf_dir):
        docs = load_table(spark, sf_dir, "documents")
        sigs = minhash_bands_rowlocal(docs, n_hashes=8, band_size=2)
        assert _pairs_set(minhash_candidate_pairs(sigs)) == _pairs_set(
            minhash_candidate_pairs(sigs, max_bucket_size=10**9)
        )

    def test_cap_bounds_within_bucket_pairs(self, spark):
        # one boilerplate bucket of 40 identical docs: uncapped emits
        # 40*39/2 = 780 pairs; cap=10 bounds each sub-bucket's
        # quadratic term and must emit strictly fewer
        docs = spark.range(40).select(
            F.col("id").alias("doc_id"),
            F.lit("the same boilerplate template page body").alias("text"),
        )
        sigs = minhash_bands_rowlocal(docs, n_hashes=8, band_size=2)
        full = minhash_candidate_pairs(sigs).count()
        capped = minhash_candidate_pairs(sigs, max_bucket_size=10).count()
        assert full == 40 * 39 // 2
        assert 0 < capped < full
        # every doc still pairs with SOMETHING unless its sub-bucket is
        # a singleton — with 40 docs into 4 subs, subs are non-trivial
        touched = (
            minhash_candidate_pairs(sigs, max_bucket_size=10)
            .select(F.explode(F.array("doc_a", "doc_b")).alias("d"))
            .distinct()
            .count()
        )
        assert touched >= 30


class TestCorrelatedSubqueryPlans:
    """The J12 family's point is Catalyst decorrelation — pin the
    physical shapes (semi/anti hash joins, no nested-loop)."""

    @pytest.mark.parametrize(
        "name,needles",
        [
            ("q_tpch_q4_shape", ["LeftSemi"]),
            ("q_tpch_q18_shape", ["LeftSemi"]),
            ("q_tpch_q21_shape", ["LeftSemi", "LeftAnti"]),
            ("q_tpch_q22_shape", ["LeftAnti", "Subquery"]),
            # Q16's NOT IN must plan as the null-aware LeftAnti HASH
            # join (SPARK-32290), never the BNLJ fallback
            ("q_tpch_q16_shape", ["LeftAnti"]),
            ("q_tpch_q20_shape", ["LeftSemi"]),
            ("q_tpch_q11_shape", ["Subquery"]),
            ("q_tpch_q15_shape", ["Subquery"]),
            ("q_tpch_q17_shape", ["avg(l_quantity)"]),
        ],
    )
    def test_decorrelated_shapes(self, spark, sf_dir, name, needles):
        from mhw3d_detection_spark import queries as Q

        plan = (
            Q.REGISTRY[name]
            .spark_fn(spark, sf_dir)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        for needle in needles:
            assert needle in plan, f"{name}: {needle} missing"
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan

    def test_q2_decorrelates_to_aggregate_join(self, spark, sf_dir):
        from mhw3d_detection_spark import queries as Q

        plan = (
            Q.REGISTRY["q_tpch_q2_shape"]
            .spark_fn(spark, sf_dir)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        # correlated scalar min -> Aggregate + equi join on (pk, min)
        assert "min(unit_cost)" in plan
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan


class TestSurvivalReport:
    def test_sections_match_standalone_rows(self, spark, sf_dir):
        from mhw3d_detection_spark import queries as Q

        rep = Q.REGISTRY["q_survival_report"].spark_fn(spark, sf_dir)
        rows = rep.collect()
        by_sec = {}
        for r in rows:
            by_sec.setdefault(r.section, []).append(r)
        assert set(by_sec) == {"pooled", "cohort", "logrank"}

        km = Q.REGISTRY["q_survival_km"].spark_fn(spark, sf_dir).collect()
        kc = Q.REGISTRY["q_survival_km_cohort"].spark_fn(
            spark, sf_dir
        ).collect()
        lr = Q.REGISTRY["q_survival_logrank"].spark_fn(
            spark, sf_dir
        ).collect()

        def curve_key(r, cohort=None):
            return (
                cohort,
                r.dur_minutes,
                r.n_risk,
                r.n_events,
                r.n_censored,
                r.hazard,
                r.log_survival,
                r.survival,
            )

        assert {curve_key(r) for r in km} == {
            curve_key(r) for r in by_sec["pooled"]
        }
        assert {curve_key(r, r.cohort) for r in kc} == {
            curve_key(r, r.cohort) for r in by_sec["cohort"]
        }
        assert {
            (r.cohort, r.o_events, r.e_events, r.lr_z, r.lr_chi2)
            for r in lr
        } == {
            (r.cohort, r.n_events, r.e_events, r.lr_z, r.lr_chi2)
            for r in by_sec["logrank"]
        }


class TestStreamingCurrentState:
    """The SCD2 serving view: streaming incremental aggregation state
    must land on the identical table as the batch twin, for any
    microbatch slicing and arrival order."""

    def test_stream_matches_batch_across_microbatches(self, spark, tmp_path):
        import os

        from mhw3d_detection_spark.sources.tables import load_table
        from mhw3d_detection_spark.streaming.stateful import (
            streaming_current_state,
        )

        ev = load_table(spark, "/root/testdata/sf0.001", "events").select(
            "event_id", "user_id", "event_type", "ts"
        )
        path = str(tmp_path / "cs_src")
        # three microbatch files in REVERSE time order — late data must
        # lose the max_by race, not corrupt state
        parts = ev.withColumn(
            "b", (F.col("event_id") % 3).cast("int")
        )
        for b in (2, 1, 0):
            parts.filter(F.col("b") == b).drop("b").coalesce(1).write.mode(
                "append"
            ).parquet(path)
        assert len(os.listdir(path)) >= 3

        stream = (
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(path)
        )
        q = (
            streaming_current_state(stream)
            .writeStream.format("memory")
            .queryName("cs_out")
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = {
            (r.user_id, r.state, r.state_since_us, r.n_events)
            for r in spark.sql("select * from cs_out").collect()
        }
        want = {
            (r.user_id, r.state, r.state_since_us, r.n_events)
            for r in streaming_current_state(ev).collect()
        }
        assert got == want and len(want) > 0

    def test_agrees_with_scd2_open_intervals(self, spark, sf_dir):
        from mhw3d_detection_spark.queries.relational import _scd2_intervals
        from mhw3d_detection_spark.sources.tables import load_table
        from mhw3d_detection_spark.streaming.stateful import (
            streaming_current_state,
        )

        ev = load_table(spark, sf_dir, "events")
        cur = {
            (r.user_id, r.state)
            for r in streaming_current_state(ev).collect()
        }
        open_iv = {
            (r.user_id, r.state)
            for r in _scd2_intervals(spark, sf_dir)
            .filter(F.col("valid_to").isNull())
            .collect()
        }
        assert cur == open_iv


def test_current_state_restart_incremental(spark, tmp_path):
    """Restart-recovery parity for the SCD2 serving view (the r12
    restart-harness pattern applied to a COMPLETE-mode aggregation):
    process two microbatch files under a checkpoint, stop, add a third
    file, restart from the SAME checkpoint — the recovered aggregation
    state must fold the new file in and land on the identical table as
    one batch pass over all three files (users absent from the third
    file must survive the restart via the state store, not re-reads)."""
    from mhw3d_detection_spark.sources.tables import load_table
    from mhw3d_detection_spark.streaming.stateful import (
        streaming_current_state,
    )

    ev = load_table(spark, "/root/testdata/sf0.001", "events").select(
        "event_id", "user_id", "event_type", "ts"
    )
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    parts = ev.withColumn("b", (F.col("event_id") % 3).cast("int"))

    def write_part(b):
        parts.filter(F.col("b") == b).drop("b").coalesce(1).write.mode(
            "append"
        ).parquet(src)

    def run_once():
        stream = (
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = (
            streaming_current_state(stream)
            .writeStream.foreachBatch(
                lambda df, bid: df.write.mode("overwrite").parquet(out)
            )
            .outputMode("complete")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    write_part(0)
    write_part(1)
    run_once()  # first life: two microbatches, state checkpointed
    write_part(2)
    run_once()  # restart from the same checkpoint: only file 2 is new

    got = {
        (r.user_id, r.state, r.state_since_us, r.n_events)
        for r in spark.read.parquet(out).collect()
    }
    want = {
        (r.user_id, r.state, r.state_since_us, r.n_events)
        for r in streaming_current_state(ev).collect()
    }
    assert got == want and len(want) > 0

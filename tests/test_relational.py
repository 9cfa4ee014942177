

def test_cohort_retention_hand_computed(spark):
    from mhw3d_detection_spark.queries.relational import q_cohort_retention
    import mhw3d_detection_spark.queries.relational as rel
    from datetime import datetime, timedelta

    # user 1: weeks 0 and 1; user 2: week 0 only; user 3: week 1 only
    base = datetime(2024, 1, 4)  # within integer-week bucket semantics
    rows = []
    eid = 0
    for uid, day_offsets in [(1, [0, 7]), (2, [1]), (3, [8])]:
        for d in day_offsets:
            rows.append((eid, base + timedelta(days=d), uid))
            eid += 1
    ev = spark.createDataFrame(rows, "event_id long, ts timestamp, user_id long")
    orig = rel.load_table
    rel.load_table = lambda spark, sf_dir, name: ev
    try:
        out = {
            (r["cohort_week"], r["week_offset"]): (
                r["n_active"], r["cohort_size"], r["retention"]
            )
            for r in q_cohort_retention(spark, None).collect()
        }
    finally:
        rel.load_table = orig
    weeks = sorted({w for w, _ in out})
    w0 = weeks[0]
    # cohort w0 = {1, 2}: offset 0 -> both, offset 1 -> user 1 only
    assert out[(w0, 0)] == (2, 2, 1.0)
    assert out[(w0, 1)] == (1, 2, 0.5)
    # cohort w0+1 = {3}: offset 0 only
    assert out[(w0 + 1, 0)] == (1, 1, 1.0)
    assert len(out) == 3


class TestSaltedJoin:
    def test_inner_equals_plain_join(self, spark):
        from mhw3d_detection_spark.operators.analysis import salted_join

        big = spark.createDataFrame(
            [(k, i) for i in range(200) for k in ("a", "a", "b")],
            "k string, v int",
        )
        dim = spark.createDataFrame(
            [("a", 1), ("b", 2), ("c", 3)], "k string, d int"
        )
        got = salted_join(big, dim, ["k"], n_salts=4).orderBy("k", "v", "d")
        want = big.join(dim, "k").orderBy("k", "v", "d")
        assert got.collect() == want.collect()

    def test_left_preserves_unmatched(self, spark):
        from mhw3d_detection_spark.operators.analysis import salted_join

        big = spark.createDataFrame(
            [("a", 1), ("zz", 2)], "k string, v int"
        )
        dim = spark.createDataFrame([("a", 10)], "k string, d int")
        rows = {
            (r["k"], r["v"], r["d"])
            for r in salted_join(big, dim, ["k"], how="left").collect()
        }
        assert rows == {("a", 1, 10), ("zz", 2, None)}

    def test_rejects_unsupported_how(self, spark):
        import pytest as _pytest

        from mhw3d_detection_spark.operators.analysis import salted_join

        big = spark.range(1).withColumnRenamed("id", "k")
        with _pytest.raises(ValueError):
            salted_join(big, big, ["k"], how="right")


class TestDataQC:
    def test_expectation_report_counts_and_null_policy(self, spark):
        from pyspark.sql import functions as F

        from mhw3d_detection_spark.operators.dataqc import expectation_report

        df = spark.createDataFrame(
            [(1, 5.0), (2, -1.0), (3, None), (4, 60.0)], "id int, v double"
        )
        rep = {
            r["check_name"]: (r["n_violations"], r["n_checked"])
            for r in expectation_report(
                df, {"v_range": ~F.col("v").between(0.0, 50.0)}
            ).collect()
        }
        # -1 and 60 violate; NULL cannot be evaluated -> counts violated
        assert rep == {"v_range": (3, 4)}

    def test_referential_orphans_null_fk_is_orphan(self, spark):
        from mhw3d_detection_spark.operators.dataqc import referential_orphans

        child = spark.createDataFrame(
            [(1, 10), (2, 99), (3, None)], "id int, fk int"
        )
        parent = spark.createDataFrame([(10,), (20,)], "pk int")
        r = referential_orphans(child, parent, "fk", "pk", "c").collect()[0]
        assert (r["n_violations"], r["n_checked"]) == (2, 3)

    def test_duplicate_keys(self, spark):
        from mhw3d_detection_spark.operators.dataqc import duplicate_keys

        df = spark.createDataFrame([(1,), (1,), (2,), (1,)], "k int")
        r = duplicate_keys(df, "k", "dup").collect()[0]
        assert (r["n_violations"], r["n_checked"]) == (2, 4)

    def test_empty_checks_rejected(self, spark):
        import pytest as _pytest

        from mhw3d_detection_spark.operators.dataqc import expectation_report

        with _pytest.raises(ValueError):
            expectation_report(spark.range(1), {})

    def test_single_scan_per_table(self, spark, sf_dir):
        from pyspark.sql import functions as F

        from mhw3d_detection_spark.operators.dataqc import expectation_report
        from mhw3d_detection_spark.sources.tables import load_table

        li = load_table(spark, sf_dir, "lineitem")
        plan = expectation_report(
            li,
            {
                "a": F.col("l_quantity") <= 0,
                "b": F.col("l_discount") < 0,
            },
        )._jdf.queryExecution().executedPlan().toString()
        # every per-row expectation shares ONE scan + ONE aggregate pair
        assert plan.count("Scan parquet") == 1, plan

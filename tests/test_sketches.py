"""HLL cardinality sketch: bit-length exactness, mergeability, and
estimate accuracy (the cross-engine bit-exactness of the raw estimate
is gated separately by the q_token_cardinality DuckDB oracle)."""

from hypothesis import given, settings

from hypothesis import strategies as st
from pyspark.sql import functions as F

from mhw3d_detection_spark.sources.tables import load_table
from mhw3d_detection_spark.operators.sketches import (
    HLL_M,
    HLL_WBITS,
    bitlen_col,
    bitlen_sql,
    hll_estimate,
    hll_registers,
)


class TestBitlen:
    @given(st.lists(st.integers(0, (1 << HLL_WBITS) - 1), min_size=1, max_size=50))
    @settings(max_examples=10, deadline=None)
    def test_matches_python_bitlength(self, spark, ws):
        df = spark.createDataFrame([(w,) for w in ws], "w long")
        got = [
            r.b
            for r in df.select(bitlen_col(F.col("w"), HLL_WBITS).alias("b"))
            .collect()
        ]
        assert got == [w.bit_length() for w in ws]

    def test_sql_mirror_same_chain(self, spark):
        # the SQL chain evaluates identically in DuckDB on the same ints
        import duckdb

        ws = [0, 1, 2, 3, 1023, 1024, (1 << HLL_WBITS) - 1, 1 << 20]
        con = duckdb.connect()
        expr = bitlen_sql("w", HLL_WBITS)
        got = [
            con.execute(f"SELECT {expr} FROM (SELECT {w}::BIGINT AS w)").fetchone()[0]
            for w in ws
        ]
        assert got == [w.bit_length() for w in ws]


class TestHllSketch:
    def test_union_merge_equals_direct(self, spark):
        # register-wise max over per-source sketches == the sketch of
        # the concatenated corpus: the mergeability contract that makes
        # per-source state reusable without a corpus re-scan
        rows = [("A", f"tok{i}") for i in range(3000)] + [
            ("B", f"tok{i}") for i in range(1500, 4500)
        ]
        df = spark.createDataFrame(rows, "source string, token string")
        per = hll_registers(df, F.col("token"), ["source"])
        merged = per.groupBy("reg").agg(F.max("rho").alias("rho"))
        direct = hll_registers(
            df.select(F.lit("all").alias("source"), "token"),
            F.col("token"),
            ["source"],
        ).select("reg", "rho")
        m = {(r.reg): r.rho for r in merged.collect()}
        d = {(r.reg): r.rho for r in direct.collect()}
        assert m == d

    def test_estimate_accuracy(self, spark):
        # 1.04/sqrt(1024) ~ 3.25% standard error; allow ~4 sigma.
        # n spans the linear-counting and raw regimes.
        for n in (500, 3000, 20000):
            df = spark.createDataFrame(
                [("s", f"item-{i}") for i in range(n)], "source string, token string"
            )
            regs = hll_registers(df, F.col("token"), ["source"])
            est = hll_estimate(regs, ["source"]).collect()[0].est_distinct
            assert abs(est / n - 1.0) < 0.13, (n, est)

    def test_duplicates_do_not_move_estimate(self, spark):
        # cardinality, not count: 10x-duplicated corpus gives the
        # identical register table
        base = [("s", f"item-{i}") for i in range(2000)]
        df1 = spark.createDataFrame(base, "source string, token string")
        df10 = spark.createDataFrame(base * 10, "source string, token string")
        r1 = {
            (r.reg): r.rho
            for r in hll_registers(df1, F.col("token"), ["source"]).collect()
        }
        r10 = {
            (r.reg): r.rho
            for r in hll_registers(df10, F.col("token"), ["source"]).collect()
        }
        assert r1 == r10

    def test_state_is_bounded(self, spark):
        # the whole point: register rows never exceed m per group
        df = spark.createDataFrame(
            [("s", f"item-{i}") for i in range(50000)], "source string, token string"
        )
        assert hll_registers(df, F.col("token"), ["source"]).count() <= HLL_M


class TestCountMin:
    def test_never_undercounts_and_exact_without_collisions(self, spark):
        from mhw3d_detection_spark.operators.sketches import (
            cm_estimate,
            cm_sketch,
        )

        rows = [("a",)] * 50 + [("b",)] * 20 + [("c",)] * 5
        df = spark.createDataFrame(rows, "token string")
        sk = cm_sketch(df, F.col("token"))
        probes = spark.createDataFrame(
            [("a", 50), ("b", 20), ("c", 5), ("zz-absent", 0)],
            "token string, exact long",
        )
        got = {
            r.token: (r.est_count, r.exact)
            for r in cm_estimate(sk, probes, F.col("token")).collect()
        }
        for tok, (est, exact) in got.items():
            assert est >= exact, (tok, est, exact)  # CM never undercounts
        # 3 distinct tokens in 4x64 counters: collisions are impossible
        # within a row only if the 3 hash to distinct cols in SOME row;
        # min-over-rows then recovers the exact count
        assert got["a"][0] == 50 and got["b"][0] == 20 and got["c"][0] == 5
        assert got["zz-absent"][0] == 0

    def test_merge_by_sum_equals_direct(self, spark):
        from mhw3d_detection_spark.operators.sketches import cm_sketch

        rows_a = [(f"t{i % 40}",) for i in range(500)]
        rows_b = [(f"t{i % 70}",) for i in range(800)]
        a = spark.createDataFrame(rows_a, "token string")
        b = spark.createDataFrame(rows_b, "token string")
        merged = (
            cm_sketch(a, F.col("token"))
            .unionByName(cm_sketch(b, F.col("token")))
            .groupBy("j", "col")
            .agg(F.sum("cnt").alias("cnt"))
        )
        direct = cm_sketch(a.unionByName(b), F.col("token"))
        m = {(r.j, r.col): r.cnt for r in merged.collect()}
        d = {(r.j, r.col): r.cnt for r in direct.collect()}
        assert m == d

    def test_overestimate_bounded_under_load(self, spark):
        # 500 distinct tokens into 4x64 counters: heavy collisions, but
        # the CM guarantee (err <= 2N/W at prob 1 - 2^-D per probe)
        # should hold comfortably in aggregate
        from mhw3d_detection_spark.operators.sketches import (
            CM_W,
            cm_estimate,
            cm_sketch,
        )

        n_per, n_tok = 10, 500
        rows = [(f"tok{i}",) for i in range(n_tok) for _ in range(n_per)]
        df = spark.createDataFrame(rows, "token string")
        sk = cm_sketch(df, F.col("token"))
        probes = df.distinct()
        ests = [
            r.est_count
            for r in cm_estimate(sk, probes, F.col("token")).collect()
        ]
        n_total = n_per * n_tok
        assert all(e >= n_per for e in ests)
        # median overestimate well under the 2N/W bound
        over = sorted(e - n_per for e in ests)[len(ests) // 2]
        assert over <= 2 * n_total / CM_W


class TestHistQuantiles:
    def test_merge_by_sum_equals_direct(self, spark):
        from mhw3d_detection_spark.operators.sketches import hist_sketch

        a = spark.createDataFrame(
            [(float(i % 500),) for i in range(2000)], "v double"
        )
        b = spark.createDataFrame(
            [(float(i % 900),) for i in range(3000)], "v double"
        )
        kw = dict(lo=0.0, hi=1000.0, n_bins=64)
        merged = (
            hist_sketch(a, F.col("v"), **kw)
            .unionByName(hist_sketch(b, F.col("v"), **kw))
            .groupBy("bin")
            .agg(F.sum("cnt").alias("cnt"))
        )
        direct = hist_sketch(a.unionByName(b), F.col("v"), **kw)
        assert {(r.bin, r.cnt) for r in merged.collect()} == {
            (r.bin, r.cnt) for r in direct.collect()
        }

    def test_quantiles_within_bin_width(self, spark):
        import numpy as np

        from mhw3d_detection_spark.operators.sketches import (
            hist_quantiles,
            hist_sketch,
        )

        rng = np.random.RandomState(11)
        vals = rng.lognormal(5.0, 0.6, 4000).clip(0, 1999)
        df = spark.createDataFrame(
            [("s", float(v)) for v in vals], "g string, v double"
        )
        lo, hi, n_bins = 0.0, 2048.0, 128
        width = (hi - lo) / n_bins
        h = hist_sketch(df, F.col("v"), ["g"], lo=lo, hi=hi, n_bins=n_bins)
        got = {
            r.q: r.est
            for r in hist_quantiles(
                h, ["g"], lo=lo, hi=hi, n_bins=n_bins, qs=(0.5, 0.9, 0.99)
            ).collect()
        }
        for q in (0.5, 0.9, 0.99):
            exact = float(np.quantile(vals, q))
            assert abs(got[q] - exact) <= width + 1e-9, (q, got[q], exact)

    def test_out_of_range_clamps_to_edge_bins(self, spark):
        from mhw3d_detection_spark.operators.sketches import hist_sketch

        df = spark.createDataFrame(
            [(-50.0,), (0.0,), (999.0,), (5000.0,)], "v double"
        )
        h = {
            r.bin: r.cnt
            for r in hist_sketch(
                df, F.col("v"), lo=0.0, hi=1000.0, n_bins=10
            ).collect()
        }
        assert h[0] == 2 and h[9] == 2  # -50,0 -> bin 0; 999,5000 -> bin 9


class TestBloom:
    def test_no_false_negatives(self, spark):
        from mhw3d_detection_spark.operators.sketches import (
            bloom_bits,
            bloom_membership,
        )

        keys = spark.createDataFrame(
            [(f"key-{i}",) for i in range(300)], "item string"
        )
        bloom = bloom_bits(keys, F.col("item"))
        probes = spark.createDataFrame(
            [(f"key-{i}",) for i in range(300)]
            + [(f"other-{i}",) for i in range(300)],
            "item string",
        )
        got = {
            r.item: r.maybe_present
            for r in bloom_membership(bloom, probes, F.col("item")).collect()
        }
        # every inserted key MUST test positive
        assert all(got[f"key-{i}"] == 1 for i in range(300))
        # false-positive rate: (1 - e^{-kn/m})^k ~ (1-e^-0.29)^4 ~ 0.4%
        fp = sum(got[f"other-{i}"] for i in range(300))
        assert fp <= 15, fp

    def test_sizing_knob_rescues_saturated_filter(self, spark):
        # the 100 TB failure mode the default guards against being
        # hardcoded: a large key set SATURATES the 4096-bit oracle
        # sketch (flag rate -> ~1, the pre-filter stops pruning), while
        # the sizing rule m ~ -n ln(p)/ln2^2 restores the predicted fpr
        from mhw3d_detection_spark.operators.sketches import (
            bloom_bits,
            bloom_membership,
        )

        n = 50_000
        keys = spark.range(n).select(
            F.concat(F.lit("key-"), F.col("id").cast("string")).alias("item")
        )
        probes = spark.range(5_000).select(
            F.concat(F.lit("other-"), F.col("id").cast("string")).alias("item")
        )
        # default m=4096: kn/m ~ 49 -> every bit set -> fpr ~ 1
        sat = bloom_bits(keys, F.col("item"))
        fp_sat = (
            bloom_membership(sat, probes, F.col("item"))
            .agg(F.sum("maybe_present"))
            .collect()[0][0]
        )
        assert fp_sat >= 4_900  # saturated: nearly everything flags
        # sized m=2^20 for n=50k, k=4: fpr = (1-e^{-kn/m})^4 ~ 0.1%
        m = 1 << 20
        sized = bloom_bits(keys, F.col("item"), m=m)
        fp = (
            bloom_membership(sized, probes, F.col("item"), m=m)
            .agg(F.sum("maybe_present"))
            .collect()[0][0]
        )
        assert fp <= 50, fp  # ~5 expected at 0.1% of 5000; 10x slack
        # no false negatives at either size
        tn = (
            bloom_membership(sized, keys, F.col("item"), m=m)
            .agg(F.sum("maybe_present"))
            .collect()[0][0]
        )
        assert tn == n

    def test_merge_by_union_equals_direct(self, spark):
        from mhw3d_detection_spark.operators.sketches import bloom_bits

        a = spark.createDataFrame([(f"a{i}",) for i in range(200)], "item string")
        b = spark.createDataFrame([(f"b{i}",) for i in range(200)], "item string")
        merged = (
            bloom_bits(a, F.col("item"))
            .unionByName(bloom_bits(b, F.col("item")))
            .distinct()
        )
        direct = bloom_bits(a.unionByName(b), F.col("item"))
        assert {r.bit for r in merged.collect()} == {
            r.bit for r in direct.collect()
        }

    def test_decontaminate_flags_planted_dup(self, spark, sf_dir):
        # the driver table's planted near-dup of a probe doc must be
        # flagged (no false negatives on its shared shingles), and the
        # flagged set must contain every doc the EXACT containment
        # screen reports above the same threshold
        from mhw3d_detection_spark.operators.sketches import (
            bloom_decontaminate,
        )
        docs = load_table(spark, sf_dir, "documents")
        out = {r.doc_id: r for r in bloom_decontaminate(docs, lambda d: d < 10).collect()}
        # ground truth: any corpus doc sharing >= 50% of ITS OWN
        # shingles with the probe set must be flagged (the Bloom has no
        # false negatives, so its per-doc hit_frac >= the true overlap)
        from pyspark.sql import functions as FF
        from mhw3d_detection_spark.operators.textops import shingles

        sh = shingles(docs).select("doc_id", "shingle").distinct()
        probe_sh = sh.filter(FF.col("doc_id") < 10).select("shingle").distinct()
        truth = {
            r.doc_id: r.frac
            for r in sh.filter(FF.col("doc_id") >= 10)
            .join(probe_sh.withColumn("__in", FF.lit(1)), "shingle", "left")
            .groupBy("doc_id")
            .agg(
                (FF.sum(FF.coalesce(FF.col("__in"), FF.lit(0))) / FF.count("*")).alias("frac")
            )
            .collect()
        }
        for did, frac in truth.items():
            if frac >= 0.5:
                assert out[did].flagged == 1, (did, frac)  # no false negatives
        assert any(v.flagged == 1 for v in out.values())  # planted dup found
        assert sum(v.flagged for v in out.values()) < len(out) / 2  # not everything


class TestCountMinGrouped:
    def test_rejects_unmerged_grouped_sketch(self, spark):
        from mhw3d_detection_spark.operators.sketches import (
            cm_estimate,
            cm_sketch,
        )

        df = spark.createDataFrame(
            [("w1", "a")] * 5 + [("w2", "a")] * 3, "win string, token string"
        )
        sk = cm_sketch(df, F.col("token"), ["win"])
        probes = spark.createDataFrame([("a",)], "token string")
        import pytest as _pt

        with _pt.raises(ValueError, match="grouping columns"):
            cm_estimate(sk, probes, F.col("token"))

    def test_group_cols_gives_per_group_counts(self, spark):
        from mhw3d_detection_spark.operators.sketches import (
            cm_estimate,
            cm_sketch,
        )

        df = spark.createDataFrame(
            [("w1", "a")] * 100 + [("w2", "a")] * 5 + [("w2", "b")] * 7,
            "win string, token string",
        )
        sk = cm_sketch(df, F.col("token"), ["win"])
        probes = spark.createDataFrame([("a",), ("b",)], "token string")
        got = {
            (r.token, r.win): r.est_count
            for r in cm_estimate(sk, probes, F.col("token"), ["win"]).collect()
        }
        assert got[("a", "w1")] == 100 and got[("a", "w2")] == 5
        assert got[("b", "w2")] == 7
        assert got[("b", "w1")] == 0  # absent counters read 0, not dropped

    def test_merged_windows_give_totals(self, spark):
        # the documented streaming read path: sum windows, then probe
        from mhw3d_detection_spark.operators.sketches import (
            cm_estimate,
            cm_sketch,
        )

        df = spark.createDataFrame(
            [("w1", "a")] * 100 + [("w2", "a")] * 5, "win string, token string"
        )
        merged = (
            cm_sketch(df, F.col("token"), ["win"])
            .groupBy("j", "col")
            .agg(F.sum("cnt").alias("cnt"))
        )
        probes = spark.createDataFrame([("a",)], "token string")
        got = cm_estimate(merged, probes, F.col("token")).collect()[0]
        assert got.est_count == 105


class TestHistEdgeFlags:
    def test_domain_floor_side_does_not_flag(self, spark):
        from mhw3d_detection_spark.operators.sketches import (
            hist_quantiles,
            hist_sketch,
        )

        # all mass in bin 0 (short values), lo=0 is a hard floor
        df = spark.createDataFrame(
            [("g", float(v % 4)) for v in range(100)], "g string, v double"
        )
        kw = dict(lo=0.0, hi=1000.0, n_bins=10)
        h = hist_sketch(df, F.col("v"), ["g"], **kw)
        flagged = hist_quantiles(
            h, ["g"], qs=(0.5,), edge_flags=(True, True), **kw
        ).collect()[0]
        unflagged = hist_quantiles(
            h, ["g"], qs=(0.5,), edge_flags=(False, True), **kw
        ).collect()[0]
        assert flagged.clipped == 1  # default would false-alarm
        assert unflagged.clipped == 0  # domain-floor side suppressed
        assert flagged.est == unflagged.est  # estimate itself unchanged


class TestPythonReferenceDifferentials:
    """Independent pure-Python reimplementations of the sketch builders
    — the same md5 arithmetic written from the paper, not from the
    Spark code — must produce IDENTICAL sketch state on random inputs.
    (The DuckDB oracle gates the declared queries; this gates the
    operators on inputs the fixed corpus never exercises.)"""

    @staticmethod
    def _base(s: str) -> int:
        import hashlib

        return int(hashlib.md5(s.encode()).hexdigest()[:12], 16)

    @given(st.lists(st.text(alphabet="abcdef", min_size=1, max_size=8),
                    min_size=1, max_size=300))
    @settings(max_examples=10, deadline=None)
    def test_hll_registers_match_python(self, spark, items):
        from mhw3d_detection_spark.operators.sketches import (
            HLL_M,
            HLL_P,
            HLL_WBITS,
            hll_registers,
        )

        df = spark.createDataFrame([(i,) for i in items], "token string")
        got = {
            (r.reg, r.rho)
            for r in hll_registers(df, F.col("token"), []).collect()
        }
        want = {}
        for it in items:
            h = self._base(it)
            reg, w = h % HLL_M, h >> HLL_P
            rho = HLL_WBITS + 1 - w.bit_length()
            want[reg] = max(want.get(reg, 0), rho)
        assert got == set(want.items())

    @given(st.lists(st.text(alphabet="xyz01", min_size=1, max_size=6),
                    min_size=1, max_size=300))
    @settings(max_examples=10, deadline=None)
    def test_cm_sketch_matches_python(self, spark, items):
        from mhw3d_detection_spark.operators.sketches import CM_D, CM_W, cm_sketch
        from mhw3d_detection_spark.operators.textops import (
            MINHASH_A,
            MINHASH_B,
            MINHASH_M,
        )

        df = spark.createDataFrame([(i,) for i in items], "token string")
        got = {
            (r.j, r.col): r.cnt
            for r in cm_sketch(df, F.col("token")).collect()
        }
        want = {}
        for it in items:
            x = self._base(it)
            for j in range(CM_D):
                c = ((MINHASH_A[j] * x + MINHASH_B[j]) % MINHASH_M) % CM_W
                want[(j, c)] = want.get((j, c), 0) + 1
        assert got == want

    @given(st.lists(st.text(alphabet="pqr89", min_size=1, max_size=6),
                    min_size=1, max_size=200))
    @settings(max_examples=10, deadline=None)
    def test_bloom_bits_match_python(self, spark, items):
        from mhw3d_detection_spark.operators.sketches import (
            BLOOM_K,
            BLOOM_M,
            bloom_bits,
        )
        from mhw3d_detection_spark.operators.textops import (
            MINHASH_A,
            MINHASH_B,
            MINHASH_M,
        )

        df = spark.createDataFrame([(i,) for i in items], "item string")
        got = {r.bit for r in bloom_bits(df, F.col("item")).collect()}
        import hashlib

        want = set()
        for it in items:
            h = hashlib.md5(it.encode()).hexdigest()
            for j in range(BLOOM_K):
                # disjoint 32-bit md5 segments mod m (_bloom_positions)
                want.add(int(h[8 * j : 8 * j + 8], 16) % BLOOM_M)
        assert got == want


class TestFastHashSeam:
    def test_cm_and_bloom_under_production_hash(self, spark):
        # build AND probe with the same hash_fn: the guarantees hold
        from mhw3d_detection_spark.operators.sketches import (
            bloom_bits,
            bloom_membership,
            cm_estimate,
            cm_sketch,
        )
        from mhw3d_detection_spark.operators.textops import xxhash_base

        df = spark.createDataFrame(
            [("a",)] * 40 + [("b",)] * 7, "token string"
        )
        sk = cm_sketch(df, F.col("token"), hash_fn=xxhash_base)
        probes = spark.createDataFrame([("a",), ("b",), ("zz",)], "token string")
        got = {
            r.token: r.est_count
            for r in cm_estimate(
                sk, probes, F.col("token"), hash_fn=xxhash_base
            ).collect()
        }
        assert got["a"] >= 40 and got["b"] >= 7 and got["zz"] == 0

        keys = spark.createDataFrame([(f"k{i}",) for i in range(100)], "item string")
        # bloom's fast path is j-salted xxhash64 (supports k > 4 too)
        bloom = bloom_bits(keys, F.col("item"), k=6, fast_hash=True)
        mem = {
            r.item: r.maybe_present
            for r in bloom_membership(
                bloom, keys, F.col("item"), k=6, fast_hash=True
            ).collect()
        }
        assert all(v == 1 for v in mem.values())  # no false negatives

    def test_xxhash_null_contract(self, spark):
        # NULL items must fall out of the sketch, not become phantom
        # hash-42 items (raw xxhash64 returns the seed for NULL)
        from mhw3d_detection_spark.operators.sketches import hll_registers
        from mhw3d_detection_spark.operators.textops import xxhash_base

        df = spark.createDataFrame(
            [("x",), ("y",), (None,)], "token string"
        )
        x = df.select(xxhash_base(F.col("token")).alias("h")).collect()
        assert sum(1 for r in x if r.h is None) == 1
        regs_with = hll_registers(df, F.col("token"), [], hash_fn=xxhash_base)
        regs_without = hll_registers(
            df.filter(F.col("token").isNotNull()), F.col("token"), [],
            hash_fn=xxhash_base,
        )
        assert {(r.reg, r.rho) for r in regs_with.collect()} == {
            (r.reg, r.rho) for r in regs_without.collect()
        }

    def test_streaming_twins_accept_production_hash(self, spark, tmp_path):
        # streaming registers under xxhash must merge with batch
        # xxhash sketches (the seam the passthrough exists for)
        import datetime as dt

        from mhw3d_detection_spark.operators.sketches import hll_registers
        from mhw3d_detection_spark.operators.textops import xxhash_base
        from mhw3d_detection_spark.streaming import streaming_cardinality

        base = dt.datetime(2024, 5, 1)
        rows = [(base + dt.timedelta(seconds=i), f"it{i % 500}") for i in range(2000)]
        rows.append((base + dt.timedelta(days=9), "sentinel"))
        df = spark.createDataFrame(rows, "time timestamp, token string")
        path = str(tmp_path / "fh_stream")
        df.write.mode("overwrite").parquet(path)
        stream = spark.readStream.schema(df.schema).parquet(path)
        q = (
            streaming_cardinality(stream, "token", window="1 day", hash_fn=xxhash_base)
            .writeStream.format("memory")
            .queryName("fh_card")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = {(r.reg, r.rho) for r in spark.table("fh_card").collect()}
        want = {
            (r.reg, r.rho)
            for r in hll_registers(
                df.filter(F.col("token") != "sentinel").select("token"),
                F.col("token"), [], hash_fn=xxhash_base,
            ).collect()
        }
        assert got == want

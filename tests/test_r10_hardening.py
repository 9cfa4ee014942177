"""Round-10 hardening pins: the r10 ADVICE items + the VERDICT r9
latent-risk list.

Each test pins one fix:
- q_ks_drift / q_wasserstein_drift oracle SQL excludes NULL values like
  the Spark operators do (advice #1) — verified by a live DuckDB
  differential on a corpus WITH NULL lengths, not just a string grep
- cosine_topk_arrow's dim inference sorts probes by id only, so a
  duplicate vec_id with a None/list payload mix cannot raise TypeError
  (advice #2)
- streaming_decontaminate_gate accepts k and matches a k<4 sketch with
  zero false negatives; out-of-range k raises (advice #3)
- both r9 gates raise a pointed error when the input schema already
  carries an output column name (advice #4)
- ks_two_sample / wasserstein1_two_sample take rq_digits to bound the
  distinct-value domain of the global ordered window (verdict #2)
"""

import pytest
from pyspark.sql import functions as F


# ------------------------------------------------------------------
# advice #1 — KS/W1 NULL parity between Spark operator and oracle SQL
# ------------------------------------------------------------------
class TestKsW1NullOracleParity:
    def _mini_corpus(self, spark):
        # NULL lengths present in BOTH slices — the exact corpus the
        # r9 oracles mishandled (their totals included the NULL group)
        rows = [
            (0, 10), (1, 20), (2, None), (3, 30), (4, 40),
            (5, 10), (6, None), (7, 25), (8, 30), (9, 55),
            (10, 12), (11, 20), (12, 33), (13, None), (14, 41),
        ]
        return rows, spark.createDataFrame(
            rows, "doc_id long, n_chars int"
        )

    def test_ks_oracle_matches_with_nulls(self, spark):
        import duckdb

        from mhw3d_detection_spark.operators.analysis import ks_two_sample
        import mhw3d_detection_spark.queries.extensions  # noqa: F401
        from mhw3d_detection_spark.queries.base import REGISTRY

        rows, df = self._mini_corpus(spark)
        got = ks_two_sample(df, "n_chars", F.col("doc_id") % 5 != 4)
        g = got.collect()[0]

        con = duckdb.connect()
        con.execute(
            "CREATE TABLE documents(doc_id BIGINT, n_chars INTEGER)"
        )
        con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
        sql = REGISTRY["q_ks_drift"].sql
        assert "WHERE n_chars IS NOT NULL" in sql
        o = con.execute(sql).fetchone()
        assert (g.x_at_max, g.ks_stat, g.n_old, g.n_new) == o

    def test_w1_oracle_matches_with_nulls(self, spark):
        import duckdb

        from mhw3d_detection_spark.operators.analysis import (
            wasserstein1_two_sample,
        )
        import mhw3d_detection_spark.queries.extensions  # noqa: F401
        from mhw3d_detection_spark.queries.base import REGISTRY

        rows, df = self._mini_corpus(spark)
        got = wasserstein1_two_sample(
            df, "n_chars", F.col("doc_id") % 5 != 4
        ).collect()[0]

        con = duckdb.connect()
        con.execute(
            "CREATE TABLE documents(doc_id BIGINT, n_chars INTEGER)"
        )
        con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
        sql = REGISTRY["q_wasserstein_drift"].sql
        assert "WHERE n_chars IS NOT NULL" in sql
        o = con.execute(sql).fetchone()
        assert (got.w1_stat, got.n_old, got.n_new) == o


# ------------------------------------------------------------------
# advice #2 — duplicate probe vec_id with None payload must not crash
# ------------------------------------------------------------------
class TestArrowTopkDuplicateProbeId:
    def test_duplicate_id_none_list_mix(self, spark):
        from mhw3d_detection_spark.operators.similarity import (
            cosine_topk_arrow,
        )

        # two probe rows share vec_id 0: one NULL vector, one clean.
        # tuple-sorting (0, None) vs (0, [..]) raises TypeError pre-fix
        rows = [
            (0, None),
            (0, [1.0, 0.0]),
            (1, [0.9, 0.1]),
            (2, [0.0, 1.0]),
            (3, [0.8, 0.2]),
        ]
        emb = spark.createDataFrame(
            rows, "vec_id long, v array<double>"
        ).repartition(3)
        got = [
            (r.vec_id, r.rank)
            for r in cosine_topk_arrow(
                emb, lambda c: c == 0, k=2, vec_col="v"
            ).orderBy("probe_id", "rank").collect()
        ]
        assert got == [(1, 1), (3, 2)]


# ------------------------------------------------------------------
# advice #3 — decontaminate gate honors the sketch's k
# ------------------------------------------------------------------
class TestDecontaminateGateK:
    def test_k2_sketch_no_false_negatives(self, spark):
        from mhw3d_detection_spark.operators.sketches import bloom_bits
        from mhw3d_detection_spark.operators.textops import shingles
        from mhw3d_detection_spark.streaming import (
            streaming_decontaminate_gate,
        )

        eval_doc = "alpha beta gamma delta epsilon zeta eta theta"
        docs = spark.createDataFrame(
            [(0, eval_doc, "eval"), (1, eval_doc, "copy"),
             (2, "totally different words nothing shared here now", "c")],
            "doc_id long, text string, source string",
        )
        sh = shingles(docs.filter("doc_id = 0")).select(
            "doc_id", "shingle"
        ).distinct()
        bits = [
            r.bit
            for r in bloom_bits(sh, F.col("shingle"), k=2).collect()
        ]
        out = {
            r.doc_id: r.flagged
            for r in streaming_decontaminate_gate(
                docs.filter("doc_id > 0"), bits, k=2
            ).collect()
        }
        # the verbatim copy MUST flag (no false negatives with k=2)
        assert out[1] == 1

    def test_k4_probe_of_k2_sketch_would_miss(self, spark):
        """The failure mode the k parameter exists to prevent: probing
        a k=2 sketch with 4 segments demands bits the build never set —
        documented false negatives. This pins the MECHANISM (hit count
        drops), demonstrating why the parameter matters."""
        from mhw3d_detection_spark.operators.sketches import bloom_bits
        from mhw3d_detection_spark.operators.textops import shingles
        from mhw3d_detection_spark.streaming import (
            streaming_decontaminate_gate,
        )

        eval_doc = "alpha beta gamma delta epsilon zeta eta theta"
        docs = spark.createDataFrame(
            [(0, eval_doc, "eval"), (1, eval_doc, "copy")],
            "doc_id long, text string, source string",
        )
        sh = shingles(docs.filter("doc_id = 0")).select(
            "doc_id", "shingle"
        ).distinct()
        bits = [
            r.bit
            for r in bloom_bits(sh, F.col("shingle"), k=2).collect()
        ]
        copy = docs.filter("doc_id = 1")
        good = streaming_decontaminate_gate(copy, bits, k=2).collect()[0]
        bad = streaming_decontaminate_gate(copy, bits, k=4).collect()[0]
        assert good.n_maybe_hits == good.n_shingles
        assert bad.n_maybe_hits < good.n_maybe_hits

    def test_out_of_range_k_raises(self, spark):
        from mhw3d_detection_spark.streaming import (
            streaming_decontaminate_gate,
        )

        docs = spark.createDataFrame(
            [(1, "a b c d", "s")], "doc_id long, text string, source string"
        )
        with pytest.raises(ValueError, match="segments"):
            streaming_decontaminate_gate(docs, [1], k=5)
        with pytest.raises(ValueError, match="segments"):
            streaming_decontaminate_gate(docs, [1], k=0)


# ------------------------------------------------------------------
# advice #4 — output-name collision fails loudly on both gates
# ------------------------------------------------------------------
class TestGateColumnCollision:
    def test_curriculum_gate_collision(self, spark):
        from mhw3d_detection_spark.streaming import (
            streaming_curriculum_gate,
        )

        docs = spark.createDataFrame(
            [(1, "a b", "s", 0.5)],
            "doc_id long, text string, source string, quality double",
        )
        with pytest.raises(ValueError, match="quality"):
            streaming_curriculum_gate(docs, {"s": [0.1] * 9})

    def test_decontaminate_gate_collision(self, spark):
        from mhw3d_detection_spark.streaming import (
            streaming_decontaminate_gate,
        )

        docs = spark.createDataFrame(
            [(1, "a b", "s", 1)],
            "doc_id long, text string, source string, flagged int",
        )
        with pytest.raises(ValueError, match="flagged"):
            streaming_decontaminate_gate(docs, [1])

    def test_clean_schema_unaffected(self, spark):
        from mhw3d_detection_spark.streaming import (
            streaming_curriculum_gate,
        )

        docs = spark.createDataFrame(
            [(1, "a b c", "s")], "doc_id long, text string, source string"
        )
        out = streaming_curriculum_gate(docs, {"s": [0.0] * 9})
        assert {"quality", "decile", "keep"} <= set(out.columns)


# ------------------------------------------------------------------
# verdict #2 — rq_digits bounds the KS/W1 ordered-window domain
# ------------------------------------------------------------------
class TestKsW1DomainGuard:
    def test_on_grid_values_identical_result(self, spark):
        from mhw3d_detection_spark.operators.analysis import (
            ks_two_sample,
            wasserstein1_two_sample,
        )

        # values already on the 10^-2 grid: quantized run must equal
        # the unquantized run bit-for-bit
        rows = [(i, round(0.05 * (i % 17) + 0.25, 2)) for i in range(60)]
        df = spark.createDataFrame(rows, "doc_id long, score double")
        pred = F.col("doc_id") % 3 != 0
        a = ks_two_sample(df, "score", pred).collect()[0]
        b = ks_two_sample(df, "score", pred, rq_digits=2).collect()[0]
        assert (a.x_at_max, a.ks_stat, a.n_old, a.n_new) == (
            b.x_at_max, b.ks_stat, b.n_old, b.n_new,
        )
        wa = wasserstein1_two_sample(df, "score", pred).collect()[0]
        wb = wasserstein1_two_sample(
            df, "score", pred, rq_digits=2
        ).collect()[0]
        assert (wa.w1_stat, wa.n_old, wa.n_new) == (
            wb.w1_stat, wb.n_old, wb.n_new,
        )

    def test_continuous_domain_bounded(self, spark):
        """A truly continuous column (every value distinct) quantized
        to rq_digits=1 collapses the window's distinct-value table to
        the bounded grid — the 100 TB guard in action."""
        from mhw3d_detection_spark.operators.analysis import (
            _ks_domain_guard,
        )

        rows = [(i, 0.1234567 + i * 1e-7) for i in range(500)]
        df = spark.createDataFrame(rows, "doc_id long, score double")
        raw = df.select(
            _ks_domain_guard("score", None).alias("x")
        ).distinct().count()
        q = df.select(
            _ks_domain_guard("score", 1).alias("x")
        ).distinct().count()
        assert raw == 500 and q <= 2


# ------------------------------------------------------------------
# verdict #3 — composed dedup report == the four standalone rows
# ------------------------------------------------------------------
class TestDedupReportParity:
    def test_sections_match_standalone_rows(self, spark):
        import mhw3d_detection_spark.queries.extensions  # noqa: F401
        from mhw3d_detection_spark.queries.base import REGISTRY

        sf = "/root/testdata/sf0.001"
        rep = REGISTRY["q_dedup_report"].spark_fn(spark, sf).collect()
        by = {}
        for r in rep:
            by.setdefault(r.section, set()).add(
                (r.key_a, r.key_b, r.n, r.extra)
            )

        cen = {
            (str(r.component_size), None, r.n_components, r.dup_mass)
            for r in REGISTRY["q_dedup_cluster_stats"]
            .spark_fn(spark, sf).collect()
        }
        assert by["census"] == cen

        leak = {
            (r.split_a, r.split_b, r.n_pairs, r.n_leaks)
            for r in REGISTRY["q_split_leakage"]
            .spark_fn(spark, sf).collect()
        }
        assert by["leakage"] == leak

        mat = {
            (r.source_a, r.source_b, r.n_pairs, None)
            for r in REGISTRY["q_source_dedup_matrix"]
            .spark_fn(spark, sf).collect()
        }
        assert by["sources"] == mat

        kb = {}
        docs = spark.read.parquet(sf + "/documents.parquet").select(
            "doc_id", "source"
        )
        verdict = REGISTRY["q_dedup_keep_best"].spark_fn(spark, sf)
        for r in verdict.join(docs, "doc_id").groupBy("source").agg(
            F.sum("kept").alias("k"),
            F.sum(1 - F.col("kept")).alias("d"),
        ).collect():
            kb[(r.source, None)] = (r.k, r.d)
        got_kb = {(a, b): (n, e) for a, b, n, e in by["keepbest"]}
        assert got_kb == kb


# ------------------------------------------------------------------
# verdict #1 — adversarial edge pins for the r9-new surfaces
# ------------------------------------------------------------------
class TestR9SurfaceEdges:
    def test_ks_empty_slice_null_stat_not_crash(self, spark):
        from mhw3d_detection_spark.operators.analysis import ks_two_sample

        df = spark.createDataFrame(
            [(i, i % 7) for i in range(20)], "doc_id long, x int"
        )
        r = ks_two_sample(df, "x", F.lit(False)).collect()[0]
        assert r.ks_stat is None and r.n_old == 0 and r.n_new == 20

    def test_w1_empty_slice_null_stat_not_crash(self, spark):
        from mhw3d_detection_spark.operators.analysis import (
            wasserstein1_two_sample,
        )

        df = spark.createDataFrame(
            [(i, i % 7) for i in range(20)], "doc_id long, x int"
        )
        r = wasserstein1_two_sample(df, "x", F.lit(True)).collect()[0]
        assert r.w1_stat is None and r.n_old == 20 and r.n_new == 0

    def test_w1_single_value_zero_with_counts(self, spark):
        from mhw3d_detection_spark.operators.analysis import (
            wasserstein1_two_sample,
        )

        df = spark.createDataFrame(
            [(i, 42) for i in range(10)], "doc_id long, x int"
        )
        r = wasserstein1_two_sample(
            df, "x", F.col("doc_id") % 2 == 0
        ).collect()[0]
        assert r.w1_stat == 0.0 and r.n_old == 5 and r.n_new == 5

    def test_ks_single_value_zero(self, spark):
        from mhw3d_detection_spark.operators.analysis import ks_two_sample

        df = spark.createDataFrame(
            [(i, 42) for i in range(10)], "doc_id long, x int"
        )
        r = ks_two_sample(df, "x", F.col("doc_id") % 2 == 0).collect()[0]
        assert r.ks_stat == 0.0 and r.x_at_max == 42

    def test_harmonic_rank_deficient_nulls(self, spark):
        from mhw3d_detection_spark.operators.climatology import harmonic_fit
        from mhw3d_detection_spark.queries.mhw import _harm_rows

        harm = spark.createDataFrame(_harm_rows(), "doy int, c double, s double")
        # cell 1: one distinct DOY; cell 2: two; cell 3: three (ok)
        rows = (
            [(1, f"200{y}-03-05", 12.0 + y) for y in range(5)]
            + [(2, f"200{y}-0{3 + (y % 2) * 3}-05", 12.0 + y) for y in range(6)]
            + [(3, f"2000-0{mth}-05", 12.0 + mth) for mth in range(1, 7)]
        )
        ts = spark.createDataFrame(
            rows, "cell_id long, time string, temp double"
        ).select("cell_id", F.col("time").cast("date").alias("time"), "temp")
        out = {r.cell_id: r for r in harmonic_fit(ts, harm).collect()}
        assert out[1].a0 is None and out[1].amplitude is None
        assert out[2].a0 is None
        assert out[3].a0 is not None and out[3].amplitude is not None

    def test_kcenter_k_exceeds_n(self, spark):
        from mhw3d_detection_spark.operators.similarity import kcenter_select

        emb = spark.createDataFrame(
            [(0, [1.0, 0.0]), (1, [0.0, 1.0]), (2, [1.0, 1.0])],
            "vec_id long, embedding array<double>",
        )
        got = kcenter_select(emb, k=5, seed_id=0).collect()
        assert len(got) == 3  # min(k, n): exhausts, no crash

    def test_kcenter_all_duplicates_deterministic(self, spark):
        from mhw3d_detection_spark.operators.similarity import kcenter_select

        emb = spark.createDataFrame(
            [(i, [1.0, 2.0]) for i in range(4)],
            "vec_id long, embedding array<double>",
        )
        got = [
            (r.rank, r.vec_id, r.mind)
            for r in kcenter_select(emb, k=3, seed_id=0).collect()
        ]
        assert got == [(1, 0, 0.0), (2, 1, 0.0), (3, 2, 0.0)]

    def test_theilsen_duplicate_days_documented_multiplicity(self, spark):
        from mhw3d_detection_spark.operators.analysis import theilsen_trend

        # 2 rows/day, consistent +1/day trend: slopes stay 1.0 and
        # n_pairs reflects the m*n multiplicity the docstring states
        rows = []
        for d in range(1, 5):
            for _ in range(2):
                rows.append((1, f"2020-01-0{d}", 10.0 + d))
        ts = spark.createDataFrame(
            rows, "cell_id long, time string, temp double"
        ).select("cell_id", F.col("time").cast("date").alias("time"), "temp")
        r = theilsen_trend(ts, max_lag_days=3).collect()[0]
        # day pairs (1,2),(1,3),(1,4),(2,3),(2,4),(3,4) x 2x2 = 24
        assert r.n_pairs == 24 and r.sen_slope == 1.0

    def test_dedup_report_zero_pair_corpus(self, spark):
        from mhw3d_detection_spark.plans import dedup_report

        docs = spark.createDataFrame(
            [
                (
                    i,
                    f"unique document {i} distinct words w{i}a w{i}b w{i}c",
                    f"s{i % 2}",
                )
                for i in range(8)
            ],
            "doc_id long, text string, source string",
        )
        rows = dedup_report(docs).collect()
        by = {}
        for r in rows:
            by.setdefault(r.section, []).append(r)
        # no pairs: census/leakage/sources empty; keepbest keeps all
        assert "census" not in by and "leakage" not in by
        assert "sources" not in by
        kb = {r.key_a: (r.n, r.extra) for r in by["keepbest"]}
        assert kb == {"s0": (4, 0), "s1": (4, 0)}


# ------------------------------------------------------------------
# r10 new operator: SRP-LSH semantic pins
# ------------------------------------------------------------------
class TestSrpLsh:
    def test_planted_near_dup_found_orthogonal_not(self, spark):
        import math
        import random

        from mhw3d_detection_spark.operators.similarity import srp_lsh_pairs

        rng = random.Random(5)
        base = [rng.gauss(0, 1) for _ in range(64)]
        near = [x + rng.gauss(0, 0.01) for x in base]  # ~1 deg apart
        anti = [-x for x in base]
        rows = [(0, base), (1, near), (2, anti)] + [
            (i, [rng.gauss(0, 1) for _ in range(64)]) for i in range(3, 40)
        ]
        emb = spark.createDataFrame(
            rows, "vec_id long, embedding array<double>"
        )
        got = {
            (r.vec_id_a, r.vec_id_b): (r.hamming, r.est_cos)
            for r in srp_lsh_pairs(emb).collect()
        }
        assert (0, 1) in got
        h, ec = got[(0, 1)]
        assert h <= 2 and ec >= math.cos(math.pi * 2 / 16)
        # the antipode differs on ~all bits: never a candidate pair
        assert (0, 2) not in got

    def test_signature_estimates_angle(self, spark):
        """P[bit differs] = angle/pi: a 90-degree pair should land at
        hamming ~ n_bits/2 — far outside the candidate threshold."""
        from mhw3d_detection_spark.operators.similarity import (
            srp_signatures,
        )

        u = [1.0 if i < 32 else 0.0 for i in range(64)]
        v = [0.0 if i < 32 else 1.0 for i in range(64)]
        emb = spark.createDataFrame(
            [(0, u), (1, v)], "vec_id long, embedding array<double>"
        )
        sigs = {r.vec_id: r.srp_sig for r in srp_signatures(emb).collect()}
        ham = bin(sigs[0] ^ sigs[1]).count("1")
        assert 4 <= ham <= 12  # 16 bits, expectation 8

    def test_dirty_vectors_dropped(self, spark):
        from mhw3d_detection_spark.operators.similarity import (
            srp_signatures,
        )

        rows = [
            (0, [1.0] * 64),
            (1, None),
            (2, [1.0] * 10),           # ragged
            (3, [1.0] * 63 + [None]),  # null element
        ]
        emb = spark.createDataFrame(
            rows, "vec_id long, embedding array<double>"
        )
        assert [r.vec_id for r in srp_signatures(emb).collect()] == [0]


# ------------------------------------------------------------------
# r10 new streaming gate: SRP semantic decontamination
# ------------------------------------------------------------------
class TestSrpDecontaminateGate:
    def test_flags_paraphrase_scale_not_orthogonal(self, spark):
        import random

        from mhw3d_detection_spark.streaming import (
            srp_gate_sigs,
            streaming_srp_decontaminate_gate,
        )

        rng = random.Random(9)
        ev = [rng.gauss(0, 1) for _ in range(64)]
        near = [x * 2.0 for x in ev]          # same direction: sig equal
        tweak = [x + rng.gauss(0, 0.005) for x in ev]  # tiny angle
        ortho = [rng.gauss(0, 1) for _ in range(64)]
        eval_emb = spark.createDataFrame(
            [(100, ev)], "vec_id long, embedding array<double>"
        )
        sigs = srp_gate_sigs(eval_emb, max_hamming=1)
        stream = spark.createDataFrame(
            [(0, near), (1, tweak), (2, ortho), (3, None)],
            "vec_id long, embedding array<double>",
        )
        out = {
            r.vec_id: (r.srp_sig, r.flagged)
            for r in streaming_srp_decontaminate_gate(
                stream, sigs
            ).collect()
        }
        assert out[0][1] == 1          # scaled copy: identical signature
        assert out[1][1] == 1          # tiny perturbation: within hamming 1
        assert out[2][1] == 0          # unrelated direction
        assert out[3] == (None, 0)     # NULL vector: nothing to test

    def test_matches_batch_signature_hamming(self, spark):
        """Gate flag == batch rule (exists eval sig within hamming<=1),
        computed from srp_signatures on both sides — shared-code
        parity, pinned over the real test corpus."""
        from mhw3d_detection_spark.operators.similarity import (
            srp_signatures,
        )
        from mhw3d_detection_spark.streaming import (
            srp_gate_sigs,
            streaming_srp_decontaminate_gate,
        )

        emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        eval_emb = emb.filter(F.col("vec_id") % 25 == 0)
        corpus = emb.filter(F.col("vec_id") % 25 != 0)
        sigs = srp_gate_sigs(eval_emb, max_hamming=1)
        got = {
            r.vec_id: r.flagged
            for r in streaming_srp_decontaminate_gate(
                corpus, sigs
            ).collect()
        }
        ev = {
            r.srp_sig for r in srp_signatures(eval_emb).collect()
        }
        want = {}
        for r in srp_signatures(corpus).collect():
            want[r.vec_id] = int(
                any(bin(r.srp_sig ^ s).count("1") <= 1 for s in ev)
            )
        for vid, w in want.items():
            assert got[vid] == w, (vid, w, got[vid])

    def test_collision_check(self, spark):
        from mhw3d_detection_spark.streaming import (
            streaming_srp_decontaminate_gate,
        )

        df = spark.createDataFrame(
            [(1, [0.0] * 64, 1)],
            "vec_id long, embedding array<double>, flagged int",
        )
        with pytest.raises(ValueError, match="flagged"):
            streaming_srp_decontaminate_gate(df, [1])


# ------------------------------------------------------------------
# r10 new operators: numpy/manual differentials
# ------------------------------------------------------------------
class TestCorpusShapeOps:
    DOCS = [
        (0, "the cat sat on the mat", "a"),
        (1, "the dog sat on the log the dog", "a"),
        (2, "cats and dogs and cats", "b"),
        (3, "completely different vocabulary here", "b"),
        (4, "the the the cat cat dog", "b"),
    ]

    def _df(self, spark):
        return spark.createDataFrame(
            self.DOCS, "doc_id long, text string, source string"
        )

    def _counts(self):
        import re
        from collections import Counter

        c = Counter()
        for _, t, _ in self.DOCS:
            c.update(re.findall(r"[a-z0-9]+", t.lower()))
        return c

    def test_gini_matches_manual(self, spark):
        from mhw3d_detection_spark.operators.textops import token_gini

        c = self._counts()
        xs = sorted(c.values())
        n, t = len(xs), sum(xs)
        s = sum((i + 1) * x for i, x in enumerate(xs))
        want = (2 * s - (n + 1) * t) / (n * t)
        r = token_gini(self._df(spark)).collect()[0]
        assert r.n_types == n and r.n_tokens == t
        assert abs(r.gini - want) < 1e-12

    def test_keyness_matches_manual(self, spark):
        import math

        from mhw3d_detection_spark.operators.textops import keyness_llr

        got = {
            r.token: (r.a, r.b, r.enriched, r.g2)
            for r in keyness_llr(
                self._df(spark),
                F.col("source") == "a",
                min_count=2,
            ).collect()
        }
        import re
        from collections import Counter

        ca, cb = Counter(), Counter()
        for _, t, s in self.DOCS:
            (ca if s == "a" else cb).update(
                re.findall(r"[a-z0-9]+", t.lower())
            )
        na, nb = sum(ca.values()), sum(cb.values())
        for tok, (a, b, enr, g2) in got.items():
            wa, wb = ca[tok], cb[tok]
            assert (a, b) == (wa, wb)
            assert enr == int(wa * nb > wb * na)
            ea = (wa + wb) * na / (na + nb)
            eb = (wa + wb) * nb / (na + nb)
            want = 2 * (
                (wa * math.log(wa / ea) if wa else 0.0)
                + (wb * math.log(wb / eb) if wb else 0.0)
            )
            assert abs(g2 - want) < 1e-3, (tok, g2, want)
        assert any(v[2] == 1 for v in got.values())
        assert any(v[2] == 0 for v in got.values())

    def test_zipf_matches_numpy(self, spark):
        import math

        import numpy as np

        from mhw3d_detection_spark.operators.textops import zipf_fit

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        r = zipf_fit(docs, top_n=50).collect()[0]
        import duckdb

        con = duckdb.connect()
        freqs = [
            f
            for (f,) in con.execute(
                "SELECT count(*) AS v FROM (SELECT unnest("
                "regexp_extract_all(lower(text), '[a-z0-9]+')) AS token "
                "FROM read_parquet('/root/testdata/sf0.001/documents.parquet')) "
                "GROUP BY token ORDER BY v DESC, token LIMIT 50"
            ).fetchall()
        ]
        x = np.log(np.arange(1, len(freqs) + 1))
        y = np.log(np.array(freqs, dtype=float))
        slope, intercept = np.polyfit(x, y, 1)
        assert r.n_top == len(freqs)
        assert abs(r.zipf_slope - slope) < 1e-3
        assert abs(r.zipf_intercept - intercept) < 1e-3
        assert r.zipf_slope < 0  # frequencies decay with rank


# ------------------------------------------------------------------
# r10 new operators: edit verify + MK significance semantics
# ------------------------------------------------------------------
class TestEditVerifyAndMkZ:
    def test_edit_verify_known_distances(self, spark):
        from mhw3d_detection_spark.operators.textops import (
            dedup_edit_verify,
        )

        docs = spark.createDataFrame(
            [
                (0, "the quick brown fox jumps over the lazy dog"),
                (1, "the quick brown fox jumped over the lazy dog"),
                (2, "completely different text with nothing shared"),
            ],
            "doc_id long, text string",
        )
        pairs = spark.createDataFrame(
            [(0, 1), (0, 2)], "doc_a long, doc_b long"
        )
        got = {
            (r.doc_a, r.doc_b): (r.edit_dist, r.verified)
            for r in dedup_edit_verify(docs, pairs).collect()
        }
        assert got[(0, 1)] == (2, 1)  # jumps -> jumped: 2 edits
        d, v = got[(0, 2)]
        assert d > 20 and v == 0

    def test_mk_z_planted_trend_significant_noise_not(self, spark):
        from mhw3d_detection_spark.operators.analysis import mann_kendall_z

        import datetime as dt

        rows = []

        day0 = dt.date(2020, 1, 1)
        for d in range(120):
            t = day0 + dt.timedelta(days=d)
            rows.append((1, str(t), 10.0 + 0.05 * d))          # trend
            rows.append((2, str(t), 10.0 + ((d * 37) % 11) * 0.01))  # hash noise
        ts = spark.createDataFrame(
            rows, "cell_id long, time string, temp double"
        ).select("cell_id", F.col("time").cast("date").alias("time"), "temp")
        out = {r.cell_id: r for r in mann_kendall_z(ts).collect()}
        assert out[1].z > 1.96            # monotone trend: significant
        assert abs(out[2].z) < 1.96       # periodic noise: not
        assert out[1].n_days == 120

    def test_mk_z_all_tied_null(self, spark):
        from mhw3d_detection_spark.operators.analysis import mann_kendall_z

        import datetime as dt

        day0 = dt.date(2020, 1, 1)
        rows = [
            (1, str(day0 + dt.timedelta(days=d)), 10.0) for d in range(30)
        ]
        ts = spark.createDataFrame(
            rows, "cell_id long, time string, temp double"
        ).select("cell_id", F.col("time").cast("date").alias("time"), "temp")
        r = mann_kendall_z(ts).collect()[0]
        assert r.var_s == 0.0 and r.z is None and r.s_stat == 0


# ------------------------------------------------------------------
# r10 new compositions: DAU sketch + quality CUSUM semantics
# ------------------------------------------------------------------
class TestDauAndQualityCusum:
    def test_hll_dau_within_error_envelope(self, spark):
        import mhw3d_detection_spark.queries.extensions  # noqa: F401
        from mhw3d_detection_spark.queries.base import REGISTRY

        rows = REGISTRY["q_dau_hll"].spark_fn(
            spark, "/root/testdata/sf0.001"
        ).collect()
        assert rows
        for r in rows:
            # 1024 registers -> ~3.2% rse; assert a generous 5-sigma
            assert abs(r.est_dau / r.exact_dau - 1.0) < 0.20, (
                r.day, r.est_dau, r.exact_dau,
            )

    def test_quality_cusum_alarms_on_planted_regression(self, spark):
        from mhw3d_detection_spark.operators.analysis import (
            cusum_changepoints,
        )

        # source "bad": quality (x64 grid) steps down 2.0 at doc 300
        rows = []
        for i in range(600):
            good = 40.0 + ((i * 13) % 7) * 0.25
            rows.append(("ok", i, good))
            rows.append(("bad", i, good - (2.0 if i >= 300 else 0.0)))
        df = spark.createDataFrame(rows, "source string, doc_id long, q64 double")
        c = cusum_changepoints(
            df, allowance=0.5, threshold=8.0,
            cell_col="source", time_col="doc_id", temp_col="q64",
        )
        agg = {
            r.source: (r.dn, r.first)
            for r in c.groupBy("source").agg(
                F.sum(F.col("alarm_neg").cast("int")).alias("dn"),
                F.min(
                    F.when(F.col("alarm_neg"), F.col("doc_id"))
                ).alias("first"),
            ).collect()
        }
        assert agg["ok"][0] == 0
        dn, first = agg["bad"]
        # the step splits the series mean, so BOTH regimes drift from
        # it — what matters: alarms fire, and the earliest NEGATIVE
        # drift alarm localizes near the planted break
        assert dn > 0 and 300 <= first <= 330


# ------------------------------------------------------------------
# r10 new operators: normalization + weighted containment semantics
# ------------------------------------------------------------------
class TestNormalizeAndWeightedContainment:
    def test_normalized_dedup_catches_reserve_raw_missed(self, spark):
        from mhw3d_detection_spark.operators.textops import (
            dedup_exact_normalized,
            normalize_texts,
        )

        docs = spark.createDataFrame(
            [
                (0, "The quick brown fox"),
                (1, "\tTHE  QUICK   brown FOX  "),  # re-serve variant
                (2, "something else entirely"),
            ],
            "doc_id long, text string",
        )
        # raw byte-hash dedup sees 3 distinct strings
        assert docs.select("text").distinct().count() == 3
        got = {
            r.doc_id: (r.group_size, r.kept)
            for r in dedup_exact_normalized(docs).collect()
        }
        assert got == {0: (2, 1), 1: (2, 0)}
        n = {r.doc_id: r for r in normalize_texts(docs).collect()}
        assert n[0].norm_fingerprint == n[1].norm_fingerprint
        assert n[0].changed == 1 and n[2].changed == 0  # lowercase happens

    def test_weighted_containment_ignores_boilerplate(self, spark):
        from mhw3d_detection_spark.operators.textops import (
            weighted_containment_pairs,
        )

        footer = "copyright acme corp all rights reserved contact us"
        rare = "unique quoted passage about spectral manifolds theorem"
        docs = spark.createDataFrame(
            [
                (0, rare + " " + footer),              # probe: quote + footer
                (20, rare + " plus unrelated tail words here " + footer),
                (2, "page one content words " + footer),
                (3, "page two different words " + footer),
                (4, "page three words again " + footer),
            ],
            "doc_id long, text string",
        )
        got = {
            (r.probe_id, r.doc_id): r.w_containment
            for r in weighted_containment_pairs(
                docs, lambda c: c == 0, min_weighted=0.0
            ).collect()
        }
        # the quote-sharing doc dominates; footer-only docs score low
        quote = got[(0, 20)]
        footer_only = max(
            v for (p, d), v in got.items() if d in (2, 3, 4)
        )
        assert quote > 0.5 and footer_only < 0.35 and quote > 2 * footer_only


# ------------------------------------------------------------------
# r10 new operators: component split + Spearman semantics
# ------------------------------------------------------------------
class TestComponentSplitAndSpearman:
    def test_component_split_zero_leaks(self, spark):
        import mhw3d_detection_spark.queries.extensions  # noqa: F401
        from mhw3d_detection_spark.queries.base import REGISTRY

        rows = REGISTRY["q_component_split"].spark_fn(
            spark, "/root/testdata/sf0.001"
        ).collect()
        assert rows and all(r.n_leaks == 0 for r in rows)
        assert sum(r.n_docs for r in rows) == 500  # whole corpus split
        # doc-keyed split on the same corpus DOES leak — the contrast
        # that makes the component key the remedy, not a tautology
        leaky = {
            (r.split_a, r.split_b): r.n_leaks
            for r in REGISTRY["q_split_leakage"].spark_fn(
                spark, "/root/testdata/sf0.001"
            ).collect()
        }
        assert sum(v for k, v in leaky.items() if k[0] != k[1]) > 0

    def test_spearman_matches_numpy_manual(self, spark):
        import numpy as np

        from mhw3d_detection_spark.operators.analysis import spearman_corr

        rng = np.random.RandomState(3)
        x = rng.randint(0, 50, 200)
        y = (x * 3 + rng.randint(0, 40, 200)).astype(int)
        df = spark.createDataFrame(
            [(int(a), int(b)) for a, b in zip(x, y)], "x long, y long"
        )
        r = spearman_corr(df, "x", "y").collect()[0]

        def avg_ranks(v):
            order = np.argsort(v, kind="stable")
            ranks = np.empty(len(v), dtype=float)
            sv = v[order]
            i = 0
            while i < len(sv):
                j = i
                while j < len(sv) and sv[j] == sv[i]:
                    j += 1
                ranks[order[i:j]] = (i + j + 1) / 2.0
                i = j
            return ranks
        rx, ry = avg_ranks(x), avg_ranks(y)
        want = np.corrcoef(rx, ry)[0, 1]
        assert r.n == 200 and abs(r.rho - want) < 1e-6

    def test_spearman_perfect_and_constant(self, spark):
        from mhw3d_detection_spark.operators.analysis import spearman_corr

        df = spark.createDataFrame(
            [(i, i * i) for i in range(50)], "x long, y long"
        )
        assert spearman_corr(df, "x", "y").collect()[0].rho == 1.0
        const = spark.createDataFrame(
            [(i, 7) for i in range(50)], "x long, y long"
        )
        assert const.select("y").distinct().count() == 1
        assert spearman_corr(const, "x", "y").collect()[0].rho is None


# ------------------------------------------------------------------
# r10 new operators: kappa + manifest semantics
# ------------------------------------------------------------------
class TestKappaAndManifest:
    def test_kappa_bounds_and_confusion(self, spark):
        import mhw3d_detection_spark.queries.extensions  # noqa: F401
        from mhw3d_detection_spark.queries.base import REGISTRY

        r = REGISTRY["q_gate_agreement_kappa"].spark_fn(
            spark, "/root/testdata/sf0.001"
        ).collect()[0]
        assert r.both_keep + r.lr_only + r.gopher_only + r.both_drop == r.n
        assert 0.0 <= r.po <= 1.0 and 0.0 <= r.pe <= 1.0
        if r.kappa is not None:
            assert -1.0 <= r.kappa <= 1.0
        # manual kappa from the confusion cells
        po = (r.both_keep + r.both_drop) / r.n
        pe = (
            (r.both_keep + r.lr_only) * (r.both_keep + r.gopher_only)
            + (r.gopher_only + r.both_drop) * (r.lr_only + r.both_drop)
        ) / (r.n * r.n)
        if pe < 1.0:
            assert abs(r.kappa - (po - pe) / (1 - pe)) < 1e-12

    def test_manifest_deterministic_and_ordered(self, spark):
        import mhw3d_detection_spark.queries.extensions  # noqa: F401
        from mhw3d_detection_spark.queries.base import REGISTRY

        fn = REGISTRY["q_training_manifest"].spark_fn
        a = sorted(
            map(tuple, fn(spark, "/root/testdata/sf0.001").collect())
        )
        b = sorted(
            map(tuple, fn(spark, "/root/testdata/sf0.001").collect())
        )
        assert a == b  # pure key function: byte-identical rerun
        rows = fn(spark, "/root/testdata/sf0.001").collect()
        by_shard = {}
        for r in rows:
            by_shard.setdefault((r.split, r.shard_id), []).append(r)
        for (_, _), grp in by_shard.items():
            grp.sort(key=lambda r: r.pos)
            assert [r.pos for r in grp] == list(range(1, len(grp) + 1))
            quals = [r.quality for r in grp]
            assert quals == sorted(quals, reverse=True)  # curriculum order


# ------------------------------------------------------------------
# code-review r10 pins (post-review fixes)
# ------------------------------------------------------------------
class TestR10ReviewFixes:
    def test_weighted_containment_all_boilerplate_probe(self, spark):
        """A probe whose every shingle has df == N (idf sum exactly 0)
        must yield NO row, not an ANSI DIVIDE_BY_ZERO job crash."""
        from mhw3d_detection_spark.operators.textops import (
            weighted_containment_pairs,
        )

        footer = "alpha beta gamma delta epsilon"
        docs = spark.createDataFrame(
            [(0, footer), (1, footer + " extra one"), (2, footer + " extra two")],
            "doc_id long, text string",
        )
        got = weighted_containment_pairs(
            docs, lambda c: c == 0, min_weighted=0.0
        ).collect()
        assert got == []  # undefined ratio -> dropped, like the oracle

    def test_corpus_report_empty_leading_deciles(self, spark):
        """Doc ids clustered high leave deciles 0..8 with zero
        instances: TTR must be NULL there, not a crash; and an empty
        corpus raises a pointed error."""
        from mhw3d_detection_spark.plans import corpus_report

        docs = spark.createDataFrame(
            [(90, "some words here"), (95, "other words there"),
             (99, "third doc words")],
            "doc_id long, text string",
        )
        rows = {r.key: r for r in corpus_report(docs).collect()
                if r.section == "heaps"}
        assert rows["0"].x is None and rows["9"].x is not None
        import pytest as _pytest

        empty = spark.createDataFrame([], "doc_id long, text string")
        with _pytest.raises(ValueError, match="empty corpus"):
            corpus_report(empty)

    def test_arrow_dim_deterministic_on_duplicate_ids(self, spark):
        """Duplicate min vec_id with two valid vectors of DIFFERENT
        dims: the composite (id, len) key makes dim the smaller one,
        independent of partition order."""
        from mhw3d_detection_spark.operators.similarity import (
            cosine_topk_arrow,
        )

        rows = [
            (0, [1.0, 0.0, 0.0]),
            (0, [1.0, 0.0]),
            (1, [0.9, 0.1]),
            (2, [0.0, 1.0]),
        ]
        outs = set()
        for nparts in (1, 2, 4):
            emb = spark.createDataFrame(
                rows, "vec_id long, v array<double>"
            ).repartition(nparts)
            got = tuple(
                sorted(
                    (r.probe_id, r.vec_id, r.rank)
                    for r in cosine_topk_arrow(
                        emb, lambda c: c == 0, k=2, vec_col="v"
                    ).collect()
                )
            )
            outs.add(got)
        assert len(outs) == 1  # scheduling-independent

    def test_w1_oracle_single_value_parity(self, spark):
        """The restructured oracle now matches the Spark single-value
        contract: (0.0, n, n) — live DuckDB differential."""
        import duckdb

        import mhw3d_detection_spark.queries.extensions  # noqa: F401
        from mhw3d_detection_spark.operators.analysis import (
            wasserstein1_two_sample,
        )
        from mhw3d_detection_spark.queries.base import REGISTRY

        rows = [(i, 42) for i in range(10)]
        df = spark.createDataFrame(rows, "doc_id long, n_chars int")
        g = wasserstein1_two_sample(
            df, "n_chars", F.col("doc_id") % 5 != 4
        ).collect()[0]
        con = duckdb.connect()
        con.execute("CREATE TABLE documents(doc_id BIGINT, n_chars INTEGER)")
        con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
        o = con.execute(REGISTRY["q_wasserstein_drift"].sql).fetchone()
        assert (g.w1_stat, g.n_old, g.n_new) == o == (0.0, 8, 2)

    def test_normalize_null_text_changed_zero(self, spark):
        from mhw3d_detection_spark.operators.textops import normalize_texts

        docs = spark.createDataFrame(
            [(0, None), (1, "  X  ")], "doc_id long, text string"
        )
        got = {r.doc_id: r.changed for r in normalize_texts(docs).collect()}
        assert got == {0: 0, 1: 1}

    def test_keyness_null_predicate_counts_background(self, spark):
        from mhw3d_detection_spark.operators.textops import keyness_llr

        docs = spark.createDataFrame(
            [(0, "aaa bbb aaa", "x"), (1, "aaa ccc aaa", None),
             (2, "aaa ddd", "y")],
            "doc_id long, text string, source string",
        )
        got = {
            r.token: (r.a, r.b)
            for r in keyness_llr(
                docs, F.col("source") == "x", min_count=1
            ).collect()
        }
        # NULL-source doc's tokens are BACKGROUND, not dropped
        assert got["aaa"] == (2, 3)

    def test_srp_shared_expression_gate_batch_identical(self, spark):
        from mhw3d_detection_spark.operators.similarity import (
            srp_sig_col,
            srp_signatures,
        )

        emb = spark.read.parquet(
            "/root/testdata/sf0.001/embeddings.parquet"
        ).limit(50)
        a = {
            r.vec_id: r.srp_sig for r in srp_signatures(emb).collect()
        }
        b = {
            r.vec_id: r.sig
            for r in emb.select(
                "vec_id",
                srp_sig_col(
                    F.col("embedding").cast("array<double>")
                ).alias("sig"),
            ).collect()
        }
        assert a == {k: v for k, v in b.items() if k in a}


# ------------------------------------------------------------------
# SRP signatures: numpy twin differential (bit-exactness evidence
# beyond the DuckDB oracle — three engines agreeing)
# ------------------------------------------------------------------
class TestSrpNumpyTwin:
    def test_signatures_match_python_twin(self, spark):
        import random

        from mhw3d_detection_spark.operators.analysis import (
            dyadic_quantize_py,
        )
        from mhw3d_detection_spark.operators.similarity import (
            srp_planes,
            srp_signatures,
        )

        rng = random.Random(77)
        rows = [
            (i, [rng.uniform(-2, 2) for _ in range(64)]) for i in range(40)
        ]
        emb = spark.createDataFrame(
            rows, "vec_id long, embedding array<double>"
        ).repartition(4)
        got = {r.vec_id: r.srp_sig for r in srp_signatures(emb).collect()}
        planes = srp_planes(16, 64)
        for i, v in rows:
            sig = 0
            for j, plane in enumerate(planes):
                dot = 0.0
                for x, r in zip(v, plane):
                    dot += dyadic_quantize_py(x * r, 24)
                if dot >= 0:
                    sig |= 1 << j
            assert got[i] == sig, (i, got[i], sig)


# ------------------------------------------------------------------
# r10 new operators: per-source KS + funnel A/B z semantics
# ------------------------------------------------------------------
class TestSourceKsAndAbZ:
    def test_ks_per_group_flags_planted_shift(self, spark):
        from mhw3d_detection_spark.operators.analysis import ks_per_group

        rows = []
        for i in range(300):
            rows.append((f"d{i}", "steady", 100 + (i % 30)))
        for i in range(100):
            rows.append((f"s{i}", "shifted", 200 + (i % 30)))  # +100 shift
        df = spark.createDataFrame(
            rows, "doc_id string, source string, n int"
        )
        got = {
            r.source: r for r in ks_per_group(df, "n", "source").collect()
        }
        # disjoint supports: the shifted source's KS vs rest is 1.0
        assert got["shifted"].ks_stat == 1.0
        assert got["shifted"].n_group == 100 and got["shifted"].n_rest == 300
        # "steady" vs rest is also large here (rest includes shifted),
        # but strictly smaller than the clean separation
        assert got["steady"].ks_stat <= got["shifted"].ks_stat

    def test_ks_per_group_single_group_null(self, spark):
        from mhw3d_detection_spark.operators.analysis import ks_per_group

        df = spark.createDataFrame(
            [(i, "only", i % 5) for i in range(20)],
            "doc_id long, source string, n int",
        )
        r = ks_per_group(df, "n", "source").collect()[0]
        assert r.ks_stat is None and r.n_group == 20 and r.n_rest == 0

    def test_ab_z_matches_manual(self, spark):
        import math

        import mhw3d_detection_spark.queries.extensions  # noqa: F401
        from mhw3d_detection_spark.queries.base import REGISTRY

        r = REGISTRY["q_funnel_ab_z"].spark_fn(
            spark, "/root/testdata/sf0.001"
        ).collect()[0]
        assert r.n1 > 0 and r.n2 > 0
        p = (r.k1 + r.k2) / (r.n1 + r.n2)
        if 0 < p < 1:
            want = (r.k1 / r.n1 - r.k2 / r.n2) / math.sqrt(
                p * (1 - p) * (1 / r.n1 + 1 / r.n2)
            )
            assert abs(r.z - want) < 1e-12
        else:
            # degenerate pooled rate (tiny fixtures where every viewer
            # converts): z is NULL by contract, not a crash
            assert r.z is None

    def test_ab_z_planted_difference(self, spark):
        """Synthetic cohorts with a real conversion gap: z must be
        large and negative/positive per the gap direction."""
        import datetime as dt

        from mhw3d_detection_spark.queries.base import REGISTRY
        import mhw3d_detection_spark.queries.extensions  # noqa: F401

        rows = []
        ts = dt.datetime(2024, 1, 1)
        eid = 0
        for uid in range(400):
            rows.append((eid, ts, uid, "view", 1.0, "")); eid += 1
            # cohort 0 (even): 80% convert; cohort 1 (odd): 30%
            frac = 0.8 if uid % 2 == 0 else 0.3
            if (uid * 7919 % 100) < frac * 100:
                rows.append((eid, ts, uid, "purchase", 1.0, "")); eid += 1
        df = spark.createDataFrame(
            rows,
            "event_id long, ts timestamp, user_id long, "
            "event_type string, value double, props string",
        )
        import tempfile

        with tempfile.TemporaryDirectory() as td:
            df.write.mode("overwrite").parquet(td + "/events.parquet")
            r = REGISTRY["q_funnel_ab_z"].spark_fn(spark, td).collect()[0]
        assert r.p1 > r.p2 and r.z > 5.0


class TestSrpCalibration:
    def test_monotone_calibration(self, spark):
        """Mean true cosine must decrease as Hamming grows, and the
        low-Hamming buckets must sit near the theory curve."""
        import mhw3d_detection_spark.queries.extensions  # noqa: F401
        from mhw3d_detection_spark.queries.base import REGISTRY

        rows = sorted(
            REGISTRY["q_srp_calibration"].spark_fn(
                spark, "/root/testdata/sf0.001"
            ).collect(),
            key=lambda r: r.hamming,
        )
        assert rows
        cosines = [r.mean_cosine for r in rows]
        # overall decreasing trend (allow local noise on sparse buckets)
        assert cosines[0] > cosines[-1]
        for r in rows:
            if r.n_pairs >= 30:
                assert abs(r.mean_cosine - r.est_cos) < 0.35, (
                    r.hamming, r.mean_cosine, r.est_cos,
                )


class TestFunnelZeroViewerCohort:
    def test_zero_viewer_cohort_null_not_crash(self, spark):
        import datetime as dt
        import tempfile

        import mhw3d_detection_spark.queries.extensions  # noqa: F401
        from mhw3d_detection_spark.queries.base import REGISTRY

        ts = dt.datetime(2024, 1, 1)
        rows = [
            (0, ts, 0, "view", 1.0, ""),
            (1, ts, 0, "purchase", 1.0, ""),
            (2, ts, 1, "click", 1.0, ""),  # odd cohort: zero viewers
        ]
        d = spark.createDataFrame(
            rows,
            "event_id long, ts timestamp, user_id long, "
            "event_type string, value double, props string",
        )
        with tempfile.TemporaryDirectory() as td:
            d.write.mode("overwrite").parquet(td + "/events.parquet")
            r = REGISTRY["q_funnel_ab_z"].spark_fn(spark, td).collect()[0]
        assert r.n2 == 0 and r.p2 is None and r.z is None
        assert r.p1 == 1.0  # the populated leg still reports


# ------------------------------------------------------------------
# r10 final wave: seasonal MK + BH FDR semantics
# ------------------------------------------------------------------
class TestSeasonalMkAndFdr:
    def test_seasonal_mk_detrends_the_cycle(self, spark):
        """A pure seasonal cycle with NO cross-year trend: seasonal MK
        S must be ~0; the same series with +1/year drift: strongly
        positive and significant."""
        import datetime as dt
        import math

        from mhw3d_detection_spark.queries.mhw import q_seasonal_mk  # noqa: F401
        from mhw3d_detection_spark.operators.analysis import (  # noqa: F401
            mann_kendall_banded,
        )
        # build directly via the same monthly logic using the operator-
        # free path: construct daily series, call the registered
        # builder through a temp parquet orders table is heavy — use
        # the internal shape instead
        rows = []
        for cell, drift in ((1, 0.0), (2, 1.0)):
            for year in range(2000, 2006):
                for mo in range(1, 13):
                    for day in (5, 15, 25):
                        t = dt.date(year, mo, day)
                        val = (
                            20.0
                            + 5.0 * math.sin(2 * math.pi * mo / 12)
                            + drift * (year - 2000)
                        )
                        rows.append((cell, str(t), val))
        ts = spark.createDataFrame(
            rows, "cell_id long, time string, temp double"
        ).select(
            "cell_id", F.col("time").cast("date").alias("time"), "temp"
        )
        # replicate the seasonal-MK body on this frame (the registered
        # row binds to orders_daily; the math is what we pin here)
        from mhw3d_detection_spark.queries.base import rq as _rq

        mm = ts.groupBy(
            "cell_id", F.year("time").alias("y"), F.month("time").alias("mo")
        ).agg(_rq(F.avg("temp"), 2).alias("m"))
        a = mm.select("cell_id", "mo", F.col("y").alias("y1"),
                      F.col("m").alias("m1"))
        b = mm.select("cell_id", "mo", F.col("y").alias("y2"),
                      F.col("m").alias("m2"))
        s = (
            a.join(b, ["cell_id", "mo"])
            .filter(F.col("y2") > F.col("y1"))
            .groupBy("cell_id")
            .agg(F.sum(F.signum(F.col("m2") - F.col("m1")))
                 .cast("long").alias("s_stat"))
        )
        got = {r.cell_id: r.s_stat for r in s.collect()}
        assert got[1] == 0          # pure cycle: no cross-year movement
        assert got[2] == 12 * 15    # drift: every year pair positive, all months

    def test_fdr_controls_and_orders(self, spark):
        import mhw3d_detection_spark.queries.extensions  # noqa: F401
        from mhw3d_detection_spark.queries.base import REGISTRY

        rows = sorted(
            REGISTRY["q_source_ks_fdr"].spark_fn(
                spark, "/root/testdata/sf0.001"
            ).collect(),
            key=lambda r: r.rank,
        )
        assert [r.rank for r in rows] == list(range(1, len(rows) + 1))
        ps = [r.p_value for r in rows]
        assert ps == sorted(ps)  # rank order == p order
        # BH is a step-up: the significant set is a prefix of the ranking
        flags = [r.significant for r in rows]
        assert flags == sorted(flags, reverse=True)
        # every significant p obeys its BH threshold
        m = len(rows)
        for r in rows:
            if r.significant:
                assert r.p_value <= r.rank * 0.05 / m + 1e-4

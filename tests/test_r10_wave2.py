"""Round-10 wave-2 operators: brute-force differentials and edge pins
for the statistical-test family (chi2 independence, one-way ANOVA,
Kendall tau-b), the embedding audits (centroid silhouette, norm stats),
the composed drift report, and the new event/orders rows (Markov
transitions, Benford, TPC-H Q1/Q3 shapes).
"""

import math
import random

import pytest
from pyspark.sql import functions as F

from mhw3d_detection_spark.operators.analysis import (
    anova_oneway,
    chi2_independence,
    kendall_tau_b,
)
from mhw3d_detection_spark.operators.similarity import (
    embedding_norm_stats,
    silhouette_by_label,
)


# ------------------------------------------------------------------
# chi-squared independence
# ------------------------------------------------------------------
class TestChi2Independence:
    def _brute(self, rows):
        from collections import Counter

        obs = Counter(rows)
        ra = Counter(a for a, _ in rows)
        cb = Counter(b for _, b in rows)
        n = len(rows)
        chi2 = 0.0
        for a in ra:
            for b in cb:
                e = ra[a] * cb[b] / n
                o = obs.get((a, b), 0)
                chi2 += (o - e) ** 2 / e
        return chi2, (len(ra) - 1) * (len(cb) - 1)

    def test_matches_brute_force(self, spark):
        rng = random.Random(7)
        rows = [
            (rng.choice("pqrs"), rng.choice("xyz")) for _ in range(300)
        ]
        df = spark.createDataFrame(rows, "a string, b string")
        got = chi2_independence(df, "a", "b").collect()[0]
        chi2, dof = self._brute(rows)
        assert got["n"] == 300
        assert got["dof"] == dof
        assert got["chi2"] == pytest.approx(chi2, abs=1e-3)
        v = math.sqrt(chi2 / (300 * min(3, 2)))
        assert got["cramers_v"] == pytest.approx(v, abs=1e-3)

    def test_zero_observed_cell_counts_expected_mass(self, spark):
        # (p, y) never occurs — the dense grid must still charge its
        # expected count to chi2 (a sparse-only sum understates)
        rows = [("p", "x")] * 5 + [("q", "x")] * 5 + [("q", "y")] * 5
        df = spark.createDataFrame(rows, "a string, b string")
        got = chi2_independence(df, "a", "b").collect()[0]
        chi2, _ = self._brute(rows)
        assert got["chi2"] == pytest.approx(chi2, abs=1e-3)
        assert chi2 > 0

    def test_single_level_dof_zero_null_v(self, spark):
        df = spark.createDataFrame(
            [("p", "x"), ("p", "y")], "a string, b string"
        )
        got = chi2_independence(df, "a", "b").collect()[0]
        assert got["dof"] == 0
        assert got["cramers_v"] is None

    def test_nulls_excluded(self, spark):
        rows = [("p", "x"), ("p", None), (None, "y"), ("q", "y")]
        df = spark.createDataFrame(rows, "a string, b string")
        got = chi2_independence(df, "a", "b").collect()[0]
        assert got["n"] == 2


# ------------------------------------------------------------------
# one-way ANOVA
# ------------------------------------------------------------------
class TestAnovaOneway:
    def test_matches_brute_force(self, spark):
        rng = random.Random(11)
        rows = []
        for g, mu in (("a", 50), ("b", 60), ("c", 55)):
            rows += [(g, mu + rng.randint(-10, 10)) for _ in range(40)]
        df = spark.createDataFrame(rows, "g string, v long")
        got = anova_oneway(df, "v", "g").collect()[0]
        vals = {}
        for g, v in rows:
            vals.setdefault(g, []).append(v)
        n = len(rows)
        k = len(vals)
        grand = sum(v for _, v in rows) / n
        ssb = sum(len(xs) * (sum(xs) / len(xs) - grand) ** 2
                  for xs in vals.values())
        ssw = sum((x - sum(xs) / len(xs)) ** 2
                  for xs in vals.values() for x in xs)
        f = (ssb / (k - 1)) / (ssw / (n - k))
        assert got["k_groups"] == k and got["n"] == n
        assert got["ss_between"] == pytest.approx(ssb, rel=1e-6, abs=1e-2)
        assert got["ss_within"] == pytest.approx(ssw, rel=1e-6, abs=1e-2)
        assert got["f_stat"] == pytest.approx(f, rel=1e-6)

    def test_single_group_null_f(self, spark):
        df = spark.createDataFrame(
            [("a", 1), ("a", 2), ("a", 3)], "g string, v long"
        )
        got = anova_oneway(df, "v", "g").collect()[0]
        assert got["k_groups"] == 1 and got["f_stat"] is None

    def test_constant_values_zero_ssw_null_f(self, spark):
        df = spark.createDataFrame(
            [("a", 5), ("a", 5), ("b", 5), ("b", 5)], "g string, v long"
        )
        got = anova_oneway(df, "v", "g").collect()[0]
        assert got["ss_within"] == 0.0
        assert got["f_stat"] is None


# ------------------------------------------------------------------
# Kendall tau-b
# ------------------------------------------------------------------
class TestKendallTauB:
    def _brute(self, pairs):
        c = d = 0
        n = len(pairs)
        for i in range(n):
            for j in range(i + 1, n):
                sx = (pairs[i][0] > pairs[j][0]) - (pairs[i][0] < pairs[j][0])
                sy = (pairs[i][1] > pairs[j][1]) - (pairs[i][1] < pairs[j][1])
                if sx * sy > 0:
                    c += 1
                elif sx * sy < 0:
                    d += 1
        from collections import Counter

        tx = sum(v * (v - 1) // 2 for v in Counter(x for x, _ in pairs).values())
        ty = sum(v * (v - 1) // 2 for v in Counter(y for _, y in pairs).values())
        n0 = n * (n - 1) // 2
        tau = (c - d) / math.sqrt((n0 - tx) * (n0 - ty))
        return c, d, tau

    def test_matches_brute_force_with_ties(self, spark):
        rng = random.Random(3)
        pairs = [
            (rng.randint(0, 8), rng.randint(0, 5)) for _ in range(200)
        ]
        df = spark.createDataFrame(pairs, "x long, y long")
        got = kendall_tau_b(df, "x", "y").collect()[0]
        c, d, tau = self._brute(pairs)
        assert got["concordant"] == c
        assert got["discordant"] == d
        assert got["n_pairs"] == 200 * 199 // 2
        assert got["tau_b"] == pytest.approx(tau, rel=1e-12)

    def test_perfect_monotone_is_one(self, spark):
        pairs = [(i, 2 * i) for i in range(30)]
        df = spark.createDataFrame(pairs, "x long, y long")
        got = kendall_tau_b(df, "x", "y").collect()[0]
        assert got["tau_b"] == pytest.approx(1.0)
        assert got["discordant"] == 0

    def test_constant_marginal_null(self, spark):
        pairs = [(1, i) for i in range(10)]
        df = spark.createDataFrame(pairs, "x long, y long")
        got = kendall_tau_b(df, "x", "y").collect()[0]
        assert got["tau_b"] is None

    def test_reversal_is_minus_one(self, spark):
        pairs = [(i, -i) for i in range(25)]
        df = spark.createDataFrame(pairs, "x long, y long")
        got = kendall_tau_b(df, "x", "y").collect()[0]
        assert got["tau_b"] == pytest.approx(-1.0)
        assert got["concordant"] == 0


# ------------------------------------------------------------------
# centroid silhouette + norm audit
# ------------------------------------------------------------------
class TestEmbeddingAudits:
    def _emb(self, spark, vecs):
        return spark.createDataFrame(
            [(i, v, lbl) for i, (v, lbl) in enumerate(vecs)],
            "vec_id long, embedding array<float>, label int",
        )

    def test_silhouette_matches_brute(self, spark):
        rng = random.Random(5)
        vecs = []
        for lbl, center in ((0, 0.0), (1, 5.0)):
            for _ in range(20):
                vecs.append((
                    [center + rng.uniform(-1, 1) for _ in range(4)], lbl
                ))
        got = {
            r["label"]: r
            for r in silhouette_by_label(self._emb(spark, vecs)).collect()
        }
        # brute force
        cents = {}
        for lbl in (0, 1):
            pts = [v for v, l2 in vecs if l2 == lbl]
            cents[lbl] = [
                sum(p[i] for p in pts) / len(pts) for i in range(4)
            ]
        sums = {0: [], 1: []}
        for v, lbl in vecs:
            d = {
                c: math.sqrt(sum((a - b) ** 2 for a, b in zip(v, cents[c])))
                for c in cents
            }
            a = d[lbl]
            b = min(dv for c, dv in d.items() if c != lbl)
            sums[lbl].append((b - a) / max(a, b))
        for lbl in (0, 1):
            want = sum(sums[lbl]) / len(sums[lbl])
            assert got[lbl]["n_vecs"] == 20
            assert got[lbl]["mean_silhouette"] == pytest.approx(
                want, abs=1e-4
            )
        # well-separated clusters: high silhouette, nothing negative
        assert got[0]["mean_silhouette"] > 0.5
        assert got[0]["n_negative"] == 0

    def test_silhouette_single_label_empty(self, spark):
        vecs = [([1.0, 2.0], 0), ([2.0, 1.0], 0)]
        out = silhouette_by_label(self._emb(spark, vecs)).collect()
        assert out == []  # no foreign centroid -> no b -> no rows

    def test_norm_stats(self, spark):
        vecs = [([3.0, 4.0], 0), ([0.0, 0.0], 0), ([6.0, 8.0], 1)]
        got = {
            r["label"]: r
            for r in embedding_norm_stats(self._emb(spark, vecs)).collect()
        }
        assert got[0]["mean_norm"] == pytest.approx(2.5, abs=1e-4)
        assert got[0]["min_norm"] == pytest.approx(0.0, abs=1e-6)
        assert got[0]["max_norm"] == pytest.approx(5.0, abs=1e-4)
        assert got[0]["n_near_zero"] == 1
        assert got[1]["mean_norm"] == pytest.approx(10.0, abs=1e-4)


# ------------------------------------------------------------------
# composed drift report == standalone rows
# ------------------------------------------------------------------
class TestDriftReportConsistency:
    def test_ks_w1_rows_equal_standalone(self, spark, sf_dir):
        from mhw3d_detection_spark.queries.base import REGISTRY

        rep = {
            r["metric"]: r
            for r in REGISTRY["q_drift_report"].spark_fn(
                spark, sf_dir
            ).collect()
        }
        ks = REGISTRY["q_ks_drift"].spark_fn(spark, sf_dir).collect()[0]
        w1 = REGISTRY["q_wasserstein_drift"].spark_fn(
            spark, sf_dir
        ).collect()[0]
        assert rep["ks"]["stat"] == ks["ks_stat"]
        assert rep["ks"]["x_at"] == ks["x_at_max"]
        assert rep["w1"]["stat"] == w1["w1_stat"]
        assert rep["ks"]["n_old"] == ks["n_old"]
        assert rep["psi"]["stat"] is not None
        assert rep["psi"]["stat"] >= 0.0

    def test_one_sided_slice_null_stats(self, spark):
        from mhw3d_detection_spark.plans.drift_report import drift_report

        df = spark.createDataFrame(
            [(0, 10), (5, 20), (10, 30)], "doc_id long, n_chars long"
        )
        out = {
            r["metric"]: r
            for r in drift_report(
                df, "n_chars", F.col("doc_id") >= 0
            ).collect()
        }
        # everything is "old": new slice empty -> NULL stats, counts live
        assert out["ks"]["stat"] is None
        assert out["w1"]["stat"] is None
        assert out["psi"]["stat"] is None
        assert out["ks"]["n_old"] == 3 and out["ks"]["n_new"] == 0


# ------------------------------------------------------------------
# event transitions / Benford / TPC-H shapes
# ------------------------------------------------------------------
class TestEventOrdersRows:
    def test_transition_probs_sum_to_one(self, spark, sf_dir):
        from mhw3d_detection_spark.queries.base import REGISTRY

        rows = REGISTRY["q_event_transitions"].spark_fn(
            spark, sf_dir
        ).collect()
        from collections import defaultdict

        per_from = defaultdict(float)
        for r in rows:
            assert r["n"] > 0
            per_from[r["from_type"]] += r["p"]
        for tot in per_from.values():
            assert tot == pytest.approx(1.0, abs=1e-9)

    def test_benford_shape(self, spark, sf_dir):
        from mhw3d_detection_spark.queries.base import REGISTRY

        rows = REGISTRY["q_benford_digits"].spark_fn(
            spark, sf_dir
        ).collect()
        assert sorted(r["digit"] for r in rows) == list(range(1, 10))
        assert sum(r["obs_freq"] for r in rows) == pytest.approx(1.0)
        assert sum(
            r["exp_freq"] for r in rows
        ) == pytest.approx(1.0, abs=1e-12)
        assert all(r["chi2_total"] >= 0 for r in rows)
        assert len({r["chi2_total"] for r in rows}) == 1

    def test_tpch_q3_top10_ordered(self, spark, sf_dir):
        from mhw3d_detection_spark.queries.base import REGISTRY

        rows = REGISTRY["q_tpch_q3_shape"].spark_fn(
            spark, sf_dir
        ).collect()
        assert len(rows) == 10
        revs = [r["revenue"] for r in rows]
        assert revs == sorted(revs, reverse=True)

    def test_tpch_q1_group_count(self, spark, sf_dir):
        from mhw3d_detection_spark.queries.base import REGISTRY

        rows = REGISTRY["q_tpch_q1_shape"].spark_fn(
            spark, sf_dir
        ).collect()
        # avg columns are exact divisions of the dyadic sums
        for r in rows:
            assert r["avg_qty"] == pytest.approx(
                r["sum_qty"] / r["count_order"], rel=0
            )


# ------------------------------------------------------------------
# batch 3: clustering coefficient / readability / load profile /
# composed events report
# ------------------------------------------------------------------
class TestTokenClustering:
    def test_triangle_graph(self, spark):
        # "aa bb cc aa dd" with window 2 yields edges {aa,bb} {aa,cc}
        # {bb,cc} {cc,dd} {aa,dd}: triangles {aa,bb,cc} and {aa,cc,dd}.
        # bb: deg 2, 1 tri -> cc 1.0; dd: deg 2, 1 tri -> cc 1.0;
        # aa/cc: deg 3, 2 tris -> cc 2*2/(3*2) = 2/3
        from mhw3d_detection_spark.operators.textops import (
            token_clustering,
        )

        docs = spark.createDataFrame(
            [(i, "aa bb cc aa dd") for i in range(6)],
            "doc_id long, text string",
        )
        got = {
            r["token"]: r
            for r in token_clustering(docs, min_count=5).collect()
        }
        assert got["bb"]["clustering_coeff"] == pytest.approx(1.0)
        assert got["dd"]["clustering_coeff"] == pytest.approx(1.0)
        assert got["aa"]["degree"] == 3
        assert got["aa"]["n_triangles"] == 2
        assert got["aa"]["clustering_coeff"] == pytest.approx(2 / 3)
        assert got["cc"]["clustering_coeff"] == pytest.approx(2 / 3)
        # pendant-only token: a doc set with a degree-1 token
        docs2 = spark.createDataFrame(
            [(i, "xx yy") for i in range(6)],
            "doc_id long, text string",
        )
        got2 = {
            r["token"]: r
            for r in token_clustering(docs2, min_count=5).collect()
        }
        assert got2["xx"]["degree"] == 1
        assert got2["xx"]["n_triangles"] == 0
        assert got2["xx"]["clustering_coeff"] is None

    def test_consistent_with_triangles_row(self, spark, sf_dir):
        from mhw3d_detection_spark.queries.base import REGISTRY

        tri = {
            r["token"]: r["n_triangles"]
            for r in REGISTRY["q_token_triangles"].spark_fn(
                spark, sf_dir
            ).collect()
        }
        cc = {
            r["token"]: r
            for r in REGISTRY["q_token_clustering"].spark_fn(
                spark, sf_dir
            ).collect()
        }
        # every triangle token appears with the same count; cc in [0,1]
        for tok, n in tri.items():
            assert cc[tok]["n_triangles"] == n
        for r in cc.values():
            if r["clustering_coeff"] is not None:
                assert 0.0 <= r["clustering_coeff"] <= 1.0


class TestReadability:
    def test_hand_computed(self, spark):
        from mhw3d_detection_spark.operators.textops import flesch_proxy

        docs = spark.createDataFrame(
            [(0, "The cat sat. The dog ran!")],
            "doc_id long, text string",
        )
        got = flesch_proxy(docs).collect()[0]
        # tokens: the cat sat the dog ran = 6; sentences: 2 runs;
        # vowel groups: e,a,a,e,o,a = 6
        assert got["n_words"] == 6
        assert got["n_sentences"] == 2
        assert got["n_syllables"] == 6
        want = 206.835 - 1.015 * (6 / 2) - 84.6 * (6 / 6)
        assert got["flesch"] == pytest.approx(want)

    def test_no_sentence_punct_floors_to_one(self, spark):
        from mhw3d_detection_spark.operators.textops import flesch_proxy

        docs = spark.createDataFrame(
            [(0, "no punctuation here"), (1, "")],
            "doc_id long, text string",
        )
        got = {r["doc_id"]: r for r in flesch_proxy(docs).collect()}
        assert got[0]["n_sentences"] == 1
        assert got[1]["n_words"] == 0  # empty text must not crash


class TestLoadProfileAndEventsReport:
    def test_load_profile_dense_and_residuals(self, spark, sf_dir):
        from mhw3d_detection_spark.queries.base import REGISTRY

        rows = REGISTRY["q_load_profile"].spark_fn(spark, sf_dir).collect()
        assert len(rows) == 168
        tot = sum(r["n"] for r in rows)
        for r in rows:
            assert r["expected"] == pytest.approx(tot / 168)
        # chi2-style identity: sum of n equals total (dense spine)
        assert {(r["dow"], r["hour"]) for r in rows} == {
            (d, h) for d in range(7) for h in range(24)
        }

    def test_events_report_sections(self, spark, sf_dir):
        from mhw3d_detection_spark.queries.base import REGISTRY

        rows = REGISTRY["q_events_report"].spark_fn(
            spark, sf_dir
        ).collect()
        by_sec = {}
        for r in rows:
            by_sec.setdefault(r["section"], []).append(r)
        assert set(by_sec) == {"dau", "mix", "funnel", "retention"}
        # mix shares sum to 1
        assert sum(r["x"] for r in by_sec["mix"]) == pytest.approx(1.0)
        # funnel matches the standalone A/B machinery's totals shape
        fun = by_sec["funnel"][0]
        assert 0 <= fun["m"] <= fun["n"]
        if fun["n"] > 0:
            assert fun["x"] == pytest.approx(fun["m"] / fun["n"])
        # retention offset 0 is definitionally 1.0 (active in the
        # cohort week itself)
        r0 = next(r for r in by_sec["retention"] if r["key"] == "0")
        assert r0["x"] == pytest.approx(1.0)
        # dau distinct <= events per day
        for r in by_sec["dau"]:
            assert r["n"] <= r["m"]


# ------------------------------------------------------------------
# batch 4: full outer / cube / corr matrix / session stats /
# streaming readability gate
# ------------------------------------------------------------------
class TestBatch4Relational:
    def test_full_outer_sides(self, spark):
        from mhw3d_detection_spark.queries.base import REGISTRY  # noqa: F401

        c = spark.createDataFrame(
            [(1,), (2,), (3,)], "c_custkey long"
        )
        o = spark.createDataFrame(
            [(1, 10, 5.0), (1, 11, 7.0), (9, 12, 3.0)],
            "o_custkey long, o_orderkey long, o_totalprice double",
        )
        j = c.join(o, c.c_custkey == o.o_custkey, "full_outer")
        side = (
            F.when(F.col("c_custkey").isNull(), F.lit("order_only"))
            .when(F.col("o_orderkey").isNull(), F.lit("customer_only"))
            .otherwise(F.lit("matched"))
        )
        got = {
            r["side"]: r["n"]
            for r in j.groupBy(side.alias("side")).count().withColumnRenamed(
                "count", "n"
            ).collect()
        }
        assert got == {"matched": 2, "customer_only": 2, "order_only": 1}

    def test_cube_contains_rollup(self, spark, sf_dir):
        from mhw3d_detection_spark.queries.base import REGISTRY

        cube = {
            (r["returnflag"], r["linestatus"]): (r["n"], r["net_rev"])
            for r in REGISTRY["q_agg_cube"].spark_fn(spark, sf_dir).collect()
        }
        roll = {
            (r["returnflag"], r["linestatus"]): (r["n"], r["net_rev"])
            for r in REGISTRY["q_agg_rollup"].spark_fn(
                spark, sf_dir
            ).collect()
        }
        # every rollup grouping set is inside the cube with equal values
        for k, v in roll.items():
            assert cube[k] == v
        # cube additionally has the linestatus margins
        assert any(
            rf == "ALL" and ls != "ALL" for rf, ls in cube
        )

    def test_corr_matrix_bounds_and_self(self, spark, sf_dir):
        from mhw3d_detection_spark.queries.base import REGISTRY

        rows = REGISTRY["q_corr_matrix"].spark_fn(spark, sf_dir).collect()
        assert len(rows) == 6
        for r in rows:
            assert -1.0 <= r["pearson"] <= 1.0
            assert r["n"] > 0

    def test_session_stats_consistent_with_sessions(self, spark, sf_dir):
        from mhw3d_detection_spark.queries.base import REGISTRY

        stats = REGISTRY["q_session_stats"].spark_fn(
            spark, sf_dir
        ).collect()[0]
        sess = REGISTRY["q_user_sessions"].spark_fn(
            spark, sf_dir
        ).collect()
        assert stats["n_sessions"] == len(sess)
        assert stats["n_events"] == sum(r["n_events"] for r in sess)
        durs = sorted(r["duration_us"] for r in sess)
        assert stats["mean_dur_us"] == pytest.approx(
            sum(durs) / len(durs)
        )
        assert durs[0] <= stats["p50_dur_us"] <= durs[-1]


def test_streaming_readability_gate_matches_batch(spark, tmp_path):
    from mhw3d_detection_spark.operators.textops import flesch_proxy
    from mhw3d_detection_spark.streaming import streaming_readability_gate

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    path = str(tmp_path / "rdoc_stream")
    docs.write.mode("overwrite").parquet(path)
    stream = spark.readStream.schema(docs.schema).parquet(path)
    q = (
        streaming_readability_gate(stream, min_flesch=0.0, max_flesch=100.0)
        .writeStream.format("memory")
        .queryName("readability_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r.doc_id: (r.n_words, r.n_syllables, r.flesch)
        for r in spark.table("readability_stream").collect()
    }
    want = {
        r.doc_id: (r.n_words, r.n_syllables, r.flesch)
        for r in flesch_proxy(docs).collect()
    }
    assert got == want  # bit-exact batch/stream parity (shared exprs)
    kept = {
        r.doc_id
        for r in spark.table("readability_stream").collect()
        if r.keep == 1
    }
    batch_keep = {
        d for d, (_, _, fl) in want.items() if 0.0 <= fl <= 100.0
    }
    assert kept == batch_keep

    # collision check: an input stream already carrying 'flesch' raises
    import pytest as _pt

    bad = docs.withColumn("flesch", F.lit(1.0))
    with _pt.raises(Exception, match="flesch"):
        streaming_readability_gate(bad)


# ------------------------------------------------------------------
# batch 5: Moran's I / GPD moment fit
# ------------------------------------------------------------------
class TestMoranAndGpd:
    def test_moran_brute_force(self, spark, sf_dir):
        from mhw3d_detection_spark.queries.base import (
            REGISTRY,
            orders_daily,
        )

        got = REGISTRY["q_spatial_moran"].spark_fn(
            spark, sf_dir
        ).collect()[0]
        cells = {
            r["cell_id"]: r["m"]
            for r in orders_daily(spark, sf_dir)
            .groupBy("cell_id")
            .agg(F.avg("temp").alias("m"))
            .collect()
        }
        xy = {(c % 5, c // 5): m for c, m in cells.items()}
        n = len(xy)
        mean = sum(xy.values()) / n
        z = {k: v - mean for k, v in xy.items()}
        s_cross = w = 0.0
        for (x, y), zi in z.items():
            for dx, dy in ((1, 0), (-1, 0), (0, 1), (0, -1)):
                nb = (x + dx, y + dy)
                if nb in z:
                    s_cross += zi * z[nb]
                    w += 1
        s_xx = sum(v * v for v in z.values())
        want = (n / w) * (s_cross / s_xx)
        assert got["n_cells"] == n
        assert got["w_pairs"] == w
        assert got["morans_i"] == pytest.approx(want, rel=1e-4)
        assert got["expected_i"] == pytest.approx(-1 / (n - 1))

    def test_moran_perfect_gradient_positive(self, spark):
        # a monotone 1-D field on a 5x2 grid: strong positive I
        from mhw3d_detection_spark.operators.analysis import (
            dyadic_quantize,  # noqa: F401
        )
        from mhw3d_detection_spark.queries import spatial as sp

        rows = [(c, float(c % 5)) for c in range(10)]
        df = spark.createDataFrame(rows, "cell_id long, m double")
        # drive the same arithmetic inline (the query wraps orders_daily)
        xy = {(c % 5, c // 5): v for c, v in rows}
        mean = sum(xy.values()) / 10
        z = {k: v - mean for k, v in xy.items()}
        s_cross = w = 0.0
        for (x, y), zi in z.items():
            for dx, dy in ((1, 0), (-1, 0), (0, 1), (0, -1)):
                if (x + dx, y + dy) in z:
                    s_cross += zi * z[(x + dx, y + dy)]
                    w += 1
        s_xx = sum(v * v for v in z.values())
        assert (10 / w) * (s_cross / s_xx) > 0.5
        assert sp.GRID_W == 5

    def test_gpd_moments_brute(self, spark, sf_dir):
        from mhw3d_detection_spark.queries.base import (
            REGISTRY,
            orders_daily,
        )

        got = {
            r["cell_id"]: r
            for r in REGISTRY["q_gpd_moments"].spark_fn(
                spark, sf_dir
            ).collect()
        }
        od = orders_daily(spark, sf_dir).collect()
        per = {}
        for r in od:
            per.setdefault(r["cell_id"], []).append(r["temp"])
        for cell, temps in per.items():
            temps.sort()
            # quantile_cont p90
            import math as _m

            pos = 0.9 * (len(temps) - 1)
            lo = int(_m.floor(pos))
            u = temps[lo] + (pos - lo) * (
                temps[min(lo + 1, len(temps) - 1)] - temps[lo]
            )
            ex = [t - u for t in temps if t > u]
            r = got[cell]
            assert r["n_exceed"] == len(ex)
            if len(ex) > 1:
                m = sum(ex) / len(ex)
                v = sum((e - m) ** 2 for e in ex) / (len(ex) - 1)
                xi = 0.5 * (1 - m * m / v)
                # 1/16 quantization of excesses shifts moments slightly
                assert r["xi"] == pytest.approx(xi, abs=0.02)
                assert r["mean_excess"] == pytest.approx(m, rel=0.01)

    def test_gpd_exponential_shape_near_zero(self, spark):
        # deterministic exponential-ish excesses (inverse-CDF grid):
        # GPD moment shape should be near 0
        import math as _m

        from mhw3d_detection_spark.operators.analysis import (
            dyadic_quantize,
        )

        n = 4000
        vals = [
            (0, 100.0 - 10.0 * _m.log((i + 0.5) / n)) for i in range(n)
        ]
        df = spark.createDataFrame(vals, "cell_id long, temp double")
        thr = df.agg(F.expr("percentile(temp, 0.9)").alias("t")).collect()[
            0
        ]["t"]
        ex = df.filter(F.col("temp") > thr).select(
            dyadic_quantize(F.col("temp") - F.lit(thr), 4).alias("e")
        )
        agg = ex.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("e").alias("s1"),
            F.sum(F.col("e") * F.col("e")).alias("s2"),
        ).collect()[0]
        m = agg["s1"] / agg["n"]
        v = (agg["s2"] - agg["s1"] ** 2 / agg["n"]) / (agg["n"] - 1)
        xi = 0.5 * (1 - m * m / v)
        assert abs(xi) < 0.15  # exponential tail -> shape ~ 0


# ------------------------------------------------------------------
# batch 6: variance decomposition
# ------------------------------------------------------------------
class TestVarianceDecomposition:
    def test_identities_on_driver_data(self, spark, sf_dir):
        from mhw3d_detection_spark.queries.base import REGISTRY

        rows = REGISTRY["q_variance_decomposition"].spark_fn(
            spark, sf_dir
        ).collect()
        assert len(rows) > 0
        for r in rows:
            assert r["sst"] >= 0
            if r["r2_seasonal"] is not None:
                assert -0.01 <= r["r2_seasonal"] <= 1.0
            if r["r2_trend"] is not None:
                assert 0.0 <= r["r2_trend"] <= 1.0
                # sequential decomposition: trend explains residual
                # variance, so the two shares cannot exceed the total
                assert r["r2_seasonal"] + r["r2_trend"] <= 1.0 + 1e-9

    def test_pure_sine_fully_seasonal(self, spark):
        # planted pure first-harmonic series: the harmonic fit should
        # explain ~all variance and the residual trend ~none
        import datetime
        import math as _m

        from mhw3d_detection_spark.operators.climatology import (
            harmonic_fit,
        )
        from mhw3d_detection_spark.queries.mhw import _harm_rows

        base = datetime.date(1995, 1, 1)
        rows = []
        for i in range(1460):
            d = base + datetime.timedelta(days=i)
            doy = d.timetuple().tm_yday
            th = 2.0 * _m.pi * (doy - 1) / 365.25
            rows.append((0, d, 10.0 + 3.0 * _m.cos(th)))
        ts = spark.createDataFrame(
            rows, "cell_id long, time date, temp double"
        )
        harm = spark.createDataFrame(
            _harm_rows(), "doy int, c double, s double"
        )
        coef = harmonic_fit(ts, harm).collect()[0]
        assert coef["a0"] == pytest.approx(10.0, abs=0.05)
        assert coef["amplitude"] == pytest.approx(3.0, abs=0.05)


# ------------------------------------------------------------------
# batch 7: weekly trend / RFM segmentation
# ------------------------------------------------------------------
class TestWeeklyTrendAndRfm:
    def test_weekly_trend_identities(self, spark, sf_dir):
        from mhw3d_detection_spark.queries.base import REGISTRY

        rows = sorted(
            REGISTRY["q_weekly_trend"].spark_fn(spark, sf_dir).collect(),
            key=lambda r: r["week"],
        )
        total = sum(r["n"] for r in rows)
        ev = REGISTRY["q_event_transitions"].spark_fn(spark, sf_dir)
        assert total > 0
        assert rows[0]["wow_growth"] is None  # no prior week
        for i, r in enumerate(rows):
            lo = max(0, i - 3)
            window = [rows[j]["n"] for j in range(lo, i + 1)]
            assert r["ma4"] == pytest.approx(sum(window) / len(window))
            if i > 0 and rows[i - 1]["n"] > 0:
                assert r["wow_growth"] == pytest.approx(
                    (r["n"] - rows[i - 1]["n"]) / rows[i - 1]["n"]
                )

    def test_rfm_scores_partition_users(self, spark, sf_dir):
        from mhw3d_detection_spark.queries.base import REGISTRY

        rows = REGISTRY["q_user_rfm"].spark_fn(spark, sf_dir).collect()
        n_users = sum(r["n_users"] for r in rows)
        sess = REGISTRY["q_event_transitions"].spark_fn(spark, sf_dir)
        for r in rows:
            assert 1 <= r["r_score"] <= 5
            assert 1 <= r["f_score"] <= 5
            assert 1 <= r["m_score"] <= 5
            assert r["n_users"] > 0
        # every distinct user lands in exactly one segment
        from mhw3d_detection_spark.sources.tables import load_table

        distinct_users = (
            load_table(spark, sf_dir, "events")
            .filter(F.col("user_id").isNotNull())
            .select("user_id")
            .distinct()
            .count()
        )
        assert n_users == distinct_users

    def test_rfm_quintiles_balanced(self, spark, sf_dir):
        # frequency/monetary marginals are ~balanced (exact quintiles).
        # Recency is EXCLUDED: on the tiny fixture every user is active
        # on the final day, so rec is constant and the
        # strictly-greater fence convention correctly collapses all
        # users to score 1 — degenerate metric, not a bug.
        from mhw3d_detection_spark.queries.base import REGISTRY

        rows = REGISTRY["q_user_rfm"].spark_fn(spark, sf_dir).collect()
        total = sum(r["n_users"] for r in rows)
        for key in ("f_score", "m_score"):
            marg = {}
            for r in rows:
                marg[r[key]] = marg.get(r[key], 0) + r["n_users"]
            # every score bucket holds under 60% of users (no collapse)
            assert max(marg.values()) / total < 0.6


def test_kendall_domain_guard_quantizes_continuous(spark):
    # continuous doubles with x_digits/y_digits set: the grid is capped
    # and the result equals the tau of the quantized pairs (brute)
    import math as _m
    import random as _r

    from mhw3d_detection_spark.operators.analysis import kendall_tau_b

    rng = _r.Random(13)
    pairs = [
        (rng.uniform(0, 3), rng.uniform(0, 3) + 0.0) for _ in range(150)
    ]
    df = spark.createDataFrame(pairs, "x double, y double")
    got = kendall_tau_b(df, "x", "y", x_digits=1, y_digits=1).collect()[0]

    def q(v, d=1):
        s = float(10**d)
        return _m.floor(v * s + 0.5 + 2.0**-16) / s

    qp = [(q(x), q(y)) for x, y in pairs]
    c = d = 0
    for i in range(len(qp)):
        for j in range(i + 1, len(qp)):
            sx = (qp[i][0] > qp[j][0]) - (qp[i][0] < qp[j][0])
            sy = (qp[i][1] > qp[j][1]) - (qp[i][1] < qp[j][1])
            if sx * sy > 0:
                c += 1
            elif sx * sy < 0:
                d += 1
    assert got["concordant"] == c
    assert got["discordant"] == d


# ------------------------------------------------------------------
# wave 3: entry/exit, volume anomalies, centroid distances
# ------------------------------------------------------------------
class TestWave3:
    def test_entry_exit_counts_match_sessions(self, spark, sf_dir):
        from mhw3d_detection_spark.queries.base import REGISTRY

        ee = REGISTRY["q_session_entry_exit"].spark_fn(
            spark, sf_dir
        ).collect()
        stats = REGISTRY["q_session_stats"].spark_fn(
            spark, sf_dir
        ).collect()[0]
        assert sum(r["n_sessions"] for r in ee) == stats["n_sessions"]

    def test_single_event_session_entry_equals_exit(self, spark):
        import datetime

        from mhw3d_detection_spark.queries.base import REGISTRY  # noqa: F401
        from pyspark.sql import Window as W

        # one user, two sessions 3h apart, second has a single event
        base = datetime.datetime(2024, 1, 1, 0, 0, 0)
        rows = [
            (1, 1, "view", base),
            (2, 1, "purchase", base + datetime.timedelta(minutes=5)),
            (3, 1, "error", base + datetime.timedelta(hours=5)),
        ]
        ev = spark.createDataFrame(
            rows, "event_id long, user_id long, event_type string, ts timestamp"
        )
        us = F.unix_micros("ts")
        w = W.partitionBy("user_id").orderBy(us.alias("us"), "event_id")
        # reuse the query logic inline via the registered builder on a
        # temp table is awkward; assert via the public sessions shape:
        df = ev.select("user_id", "event_id", "event_type", us.alias("us"))
        w2 = W.partitionBy("user_id").orderBy("us", "event_id")
        new_s = (
            F.isnull(F.lag("us").over(w2))
            | (F.col("us") - F.lag("us").over(w2) > 7_200_000_000)
        ).cast("int")
        s = df.withColumn(
            "sid",
            F.sum(new_s).over(
                w2.rowsBetween(W.unboundedPreceding, 0)
            ),
        )
        got = {
            r["sid"]: r
            for r in s.groupBy("user_id", "sid").agg(
                F.min_by("event_type", "us").alias("entry"),
                F.max_by("event_type", "us").alias("exit"),
            ).collect()
        }
        assert got[1]["entry"] == "view" and got[1]["exit"] == "purchase"
        assert got[2]["entry"] == "error" and got[2]["exit"] == "error"

    def test_volume_anomalies_baseline_excludes_self(self, spark, sf_dir):
        from mhw3d_detection_spark.queries.base import REGISTRY

        rows = sorted(
            REGISTRY["q_volume_anomalies"].spark_fn(
                spark, sf_dir
            ).collect(),
            key=lambda r: r["day"],
        )
        assert rows[0]["z"] is None  # no prior days
        # hand-check a late day against the trailing-28 CALENDAR window
        # (RANGE frame: idle days must not stretch the baseline)
        r = rows[-1]
        prior = [
            p["n"] for p in rows
            if r["day"] - 28 <= p["day"] <= r["day"] - 1
        ]
        assert r["n_prior"] == len(prior)
        if len(prior) >= 7:
            m = sum(prior) / len(prior)
            var = sum((x - m) ** 2 for x in prior) / (len(prior) - 1)
            assert r["mean_prior"] == pytest.approx(m)
            if var > 0:
                assert r["z"] == pytest.approx(
                    (r["n"] - m) / var**0.5, rel=1e-9
                )

    def test_centroid_distances_brute(self, spark, sf_dir):
        from mhw3d_detection_spark.queries.base import REGISTRY
        from mhw3d_detection_spark.sources.tables import load_table

        got = {
            (r["label_a"], r["label_b"]): r["distance"]
            for r in REGISTRY["q_centroid_distances"].spark_fn(
                spark, sf_dir
            ).collect()
        }
        emb = load_table(spark, sf_dir, "embeddings").collect()
        cents = {}
        for r in emb:
            cents.setdefault(r["label"], []).append(r["embedding"])
        means = {
            lbl: [
                sum(float(v[i]) for v in vs) / len(vs)
                for i in range(len(vs[0]))
            ]
            for lbl, vs in cents.items()
        }
        labels = sorted(means)
        assert len(got) == len(labels) * (len(labels) - 1) // 2
        import math as _m

        for i, la in enumerate(labels):
            for lb in labels[i + 1:]:
                want = _m.sqrt(
                    sum(
                        (a - b) ** 2
                        for a, b in zip(means[la], means[lb])
                    )
                )
                assert got[(la, lb)] == pytest.approx(want, abs=1e-4)


# ------------------------------------------------------------------
# wave 3b: sentence dedup + Poisson bootstrap
# ------------------------------------------------------------------
class TestSentenceDedupAndBootstrap:
    def test_planted_template_sentence_flagged(self, spark):
        from mhw3d_detection_spark.queries.base import REGISTRY  # noqa: F401
        from mhw3d_detection_spark.operators.textops import (  # noqa: F401
            tokens_col,
        )

        # reuse the registered builder's logic via a direct rebuild on
        # a planted corpus: one template sentence in every doc, one
        # unique sentence per doc
        docs = spark.createDataFrame(
            [
                (i, f"subscribe to our newsletter today please. "
                    f"unique insight number {i} about topic {i}.")
                for i in range(5)
            ],
            "doc_id long, text string",
        )
        s = (
            docs.select(
                "doc_id",
                F.explode(F.split(F.col("text"), "[.!?]+")).alias("raw"),
            )
            .select("doc_id", F.trim(F.col("raw")).alias("s"))
            .filter(F.length("s") >= 20)
        )
        h = s.select("doc_id", F.md5(F.col("s")).alias("hs"))
        dfq = h.groupBy("hs").agg(F.count(F.lit(1)).alias("occ"))
        j = h.join(dfq, "hs").groupBy("doc_id").agg(
            F.sum((F.col("occ") >= 3).cast("int")).alias("n_dup"),
            F.count(F.lit(1)).alias("n"),
        )
        for r in j.collect():
            assert r["n"] == 2
            assert r["n_dup"] == 1  # exactly the template sentence

    def test_bootstrap_ci_brackets_point(self, spark, sf_dir):
        from mhw3d_detection_spark.queries.base import REGISTRY

        r = REGISTRY["q_funnel_bootstrap_ci"].spark_fn(
            spark, sf_dir
        ).collect()[0]
        assert r["n_reps"] == 64
        assert r["ci_lo"] <= r["ci_hi"]
        # the point estimate should sit inside (or at the edge of) the
        # bootstrap interval on any non-degenerate corpus
        if r["rate_point"] is not None:
            assert r["ci_lo"] - 0.05 <= r["rate_point"] <= r["ci_hi"] + 0.05
        assert 0.0 <= r["ci_lo"] and r["ci_hi"] <= 1.0

    def test_poisson_ladder_mean_near_one(self, spark):
        # the md5-uniform Poisson weights average ~1 (the property that
        # makes Poisson bootstrap unbiased)
        from mhw3d_detection_spark.queries.extensions import (
            _pois_cum,
        )
        import math

        cs = _pois_cum()
        # ladder expectation: sum k * P(k), P from consecutive cums
        probs = [cs[0]] + [
            cs[i] - cs[i - 1] for i in range(1, len(cs))
        ] + [1.0 - cs[-1]]
        mean = sum(k * p for k, p in enumerate(probs))
        assert mean == pytest.approx(1.0, abs=1e-3)


# ------------------------------------------------------------------
# wave 4: top-k with ties / cohort LTV / TPC-H Q6
# ------------------------------------------------------------------
class TestWave4:
    def test_ties_kept_vs_row_number(self, spark):
        rows = [
            ("A", 10.0), ("A", 10.0), ("A", 9.0), ("A", 8.0), ("A", 8.0),
            ("A", 7.0), ("B", 5.0),
        ]
        df = spark.createDataFrame(rows, "g string, v double")
        from pyspark.sql import Window as W

        w = W.partitionBy("g").orderBy(F.desc("v"))
        ranked = df.select(
            "g", "v", F.rank().over(w).alias("rnk")
        ).filter(F.col("rnk") <= 3)
        got = sorted(
            (r["g"], r["v"], r["rnk"]) for r in ranked.collect()
        )
        # both 10.0s kept at rank 1; 9.0 rank 3; the 8.0s (rank 4) out
        assert got == [
            ("A", 9.0, 3), ("A", 10.0, 1), ("A", 10.0, 1),
            ("B", 5.0, 1),
        ]

    def test_cohort_ltv_monotone_and_consistent(self, spark, sf_dir):
        from mhw3d_detection_spark.queries.base import REGISTRY

        rows = REGISTRY["q_cohort_ltv"].spark_fn(spark, sf_dir).collect()
        by_cohort = {}
        for r in rows:
            by_cohort.setdefault(r["cohort_week"], []).append(r)
        total_users = sum(
            rs[0]["n_users"] for rs in by_cohort.values()
        )
        # cohort sizes partition the distinct users
        from mhw3d_detection_spark.sources.tables import load_table

        n_users = (
            load_table(spark, sf_dir, "events")
            .filter(F.col("user_id").isNotNull())
            .select("user_id").distinct().count()
        )
        assert total_users == n_users
        for rs in by_cohort.values():
            rs.sort(key=lambda r: r["week_offset"])
            vals = [r["cum_value"] for r in rs]
            assert vals == sorted(vals)  # cumulative is monotone
            for r in rs:
                assert r["ltv"] == pytest.approx(
                    r["cum_value"] / r["n_users"]
                )

    def test_q6_matches_manual_filter(self, spark, sf_dir):
        from mhw3d_detection_spark.queries.base import REGISTRY
        from mhw3d_detection_spark.sources.tables import load_table

        got = REGISTRY["q_tpch_q6_shape"].spark_fn(
            spark, sf_dir
        ).collect()[0]
        li = load_table(spark, sf_dir, "lineitem").filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        assert got["n_items"] == li.count()
        want = sum(
            r["l_extendedprice"] * r["l_discount"] for r in li.collect()
        )
        assert got["revenue"] == pytest.approx(want, rel=1e-3)


# ------------------------------------------------------------------
# wave 4b: source scorecard / DAU-MAU stickiness
# ------------------------------------------------------------------
class TestScorecardAndStickiness:
    def test_scorecard_consistent_with_components(self, spark, sf_dir):
        from mhw3d_detection_spark.queries.base import REGISTRY
        from mhw3d_detection_spark.sources.tables import load_table

        rows = {
            r["source"]: r
            for r in REGISTRY["q_source_scorecard"].spark_fn(
                spark, sf_dir
            ).collect()
        }
        docs = load_table(spark, sf_dir, "documents").collect()
        per = {}
        for d in docs:
            per.setdefault(d["source"], []).append(d)
        assert set(rows) == set(per)
        import math as _m

        for src, ds in per.items():
            r = rows[src]
            assert r["n_docs"] == len(ds)
            assert r["mean_chars"] == pytest.approx(
                sum(d["n_chars"] for d in ds) / len(ds)
            )
            # single-language source -> entropy 0; mixed -> positive
            langs = {}
            for d in ds:
                langs[d["lang"]] = langs.get(d["lang"], 0) + 1
            n = len(ds)
            want_h = _m.log(n) - sum(
                c * _m.log(c) for c in langs.values()
            ) / n
            assert r["lang_entropy"] == pytest.approx(want_h, abs=1e-3)

    def test_stickiness_bounds_and_brute(self, spark, sf_dir):
        from mhw3d_detection_spark.queries.base import REGISTRY
        from mhw3d_detection_spark.sources.tables import load_table

        rows = {
            r["day"]: r
            for r in REGISTRY["q_dau_mau_stickiness"].spark_fn(
                spark, sf_dir
            ).collect()
        }
        ud = {
            (r["user_id"], r["day"])
            for r in load_table(spark, sf_dir, "events")
            .filter(F.col("user_id").isNotNull())
            .select(
                "user_id",
                F.expr("unix_micros(ts) div 86400000000").alias("day"),
            )
            .distinct()
            .collect()
        }
        days = {d for _, d in ud}
        for day in days:
            dau = len({u for u, d in ud if d == day})
            mau = len({u for u, d in ud if day - 27 <= d <= day})
            r = rows[day]
            assert r["dau"] == dau
            assert r["mau"] == mau
            assert 0 < r["stickiness"] <= 1.0
            assert r["stickiness"] == pytest.approx(dau / mau)


def test_streaming_sentence_dedup_gate_matches_batch(spark, tmp_path):
    # build the Bloom from the corpus's duplicate sentences (the E2n
    # audit's df>=3 set), then the streaming gate must flag exactly the
    # docs whose qualifying-sentence dup fraction crosses the bar
    from mhw3d_detection_spark.operators.sketches import bloom_bits
    from mhw3d_detection_spark.streaming import (
        streaming_sentence_dedup_gate,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    sents = (
        docs.select(
            "doc_id",
            F.explode(F.split(F.col("text"), "[.!?]+")).alias("raw"),
        )
        .select("doc_id", F.trim(F.col("raw")).alias("s"))
        .filter(F.length("s") >= 20)
    )
    dup = (
        sents.groupBy("s").count().filter(F.col("count") >= 3).select("s")
    )
    bits = [
        r["bit"]
        for r in bloom_bits(dup, F.col("s"), m=4096, k=4).collect()
    ]

    path = str(tmp_path / "sent_stream")
    docs.write.mode("overwrite").parquet(path)
    stream = spark.readStream.schema(docs.schema).parquet(path)
    q = (
        streaming_sentence_dedup_gate(
            stream, bits, m=4096, k=4, flag_frac=0.5
        )
        .writeStream.format("memory")
        .queryName("sent_gate_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r.doc_id: (r.n_sents, r.n_maybe_dup, r.flagged)
        for r in spark.table("sent_gate_stream").collect()
    }
    # batch ground truth: per doc, qualifying sentences + how many are
    # in the dup set (Bloom has no false negatives; at this tiny n the
    # 4096/4 sketch has ~no false positives either, but compare via
    # >= to stay robust)
    dup_set = {r["s"] for r in dup.collect()}
    per = {}
    for r in sents.collect():
        n, d = per.get(r["doc_id"], (0, 0))
        per[r["doc_id"]] = (n + 1, d + (1 if r["s"] in dup_set else 0))
    assert len(got) == docs.count()
    n_flagged = 0
    for doc_id, (n, d) in per.items():
        gn, gd, fl = got[doc_id]
        assert gn == n
        assert gd >= d  # no false negatives
        n_flagged += fl
    # docs made ONLY of short fragments: NULL dup_frac, flagged 0
    for doc_id, (gn, gd, fl) in got.items():
        if doc_id not in per:
            assert gn == 0 and fl == 0


# ------------------------------------------------------------------
# code-review r10w2 regression pins
# ------------------------------------------------------------------
class TestReviewFixes:
    def test_session_cumsum_tie_break(self, spark):
        # review #1: two events at the SAME us where the first (by
        # event_id) opens a session after a >2h gap — the cumulative
        # session-id window must order by (us, event_id) so the tie
        # peer lands in the NEW session, not the previous one
        from pyspark.sql import Window as W

        t0, t1 = 0, 3 * 3600 * 1_000_000  # 3h gap
        ev = spark.createDataFrame(
            [(1, 1, t0), (5, 1, t1), (6, 1, t1)],
            "event_id long, user_id long, us long",
        )
        w = W.partitionBy("user_id").orderBy("us", "event_id")
        new_s = (
            F.isnull(F.lag("us").over(w))
            | (F.col("us") - F.lag("us").over(w) > 7_200_000_000)
        ).cast("int")
        s = ev.withColumn("__new", new_s).withColumn(
            "sid",
            F.sum("__new").over(
                W.partitionBy("user_id")
                .orderBy("us", "event_id")
                .rowsBetween(W.unboundedPreceding, 0)
            ),
        )
        got = {r["event_id"]: r["sid"] for r in s.collect()}
        assert got[1] == 1
        assert got[5] == 2 and got[6] == 2  # tie peer joins the NEW session

    def test_kendall_oracle_null_text_parity(self, spark):
        # review #5: a corpus with one NULL-text row must hash-match —
        # live DuckDB differential (the r10-hardening NULL-parity device)
        import duckdb

        from mhw3d_detection_spark.queries.base import REGISTRY

        rows = [
            (0, "the cat and the dog", 100),
            (1, None, 120),
            (2, "of mice and men and more", 140),
            (3, "a fox of is to in", 90),
            (4, "completely different words here", 260),
        ]
        docs = spark.createDataFrame(
            rows, "doc_id long, text string, n_chars long"
        )
        sql = REGISTRY["q_kendall_tau"].sql
        # build the Spark side directly from the operator (the query fn
        # loads parquet; here we drive the operator on the same frame)
        from mhw3d_detection_spark.operators.analysis import kendall_tau_b
        from mhw3d_detection_spark.operators.textops import (
            LANG_STOPWORDS,
            tokens_col,
        )

        toks = tokens_col(F.col("text"))
        stop = F.array(*[F.lit(x) for x in LANG_STOPWORDS["en"]])
        ratio = F.size(F.array_intersect(toks, stop)) / F.greatest(
            F.size(toks), F.lit(1)
        )
        v = docs.filter(F.col("n_chars").isNotNull()).select(
            F.expr("div(n_chars, 20)").alias("x"),
            F.floor(ratio * F.lit(100.0)).cast("long").alias("y"),
        )
        srow = kendall_tau_b(v, "x", "y").collect()[0]
        con = duckdb.connect()
        con.register("documents", docs.toPandas())
        drow = con.execute(sql).fetchone()
        # n excludes the NULL-text doc in BOTH engines
        assert srow["n"] == 4
        assert drow[0] == 4
        assert srow["concordant"] == drow[2]
        assert srow["discordant"] == drow[3]

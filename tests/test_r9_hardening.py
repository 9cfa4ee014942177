"""Round-9 hardening pins: the r8 ADVICE items + VERDICT polish list.

Each test pins one fix:
- cosine_topk_arrow drops NULL/ragged embeddings (fold-path contract)
- dedup_keep_best's verdict broadcast is gated (broadcast_verdict)
- write_netcdf_classic downcasts int64 that fits NC_INT, rejects the
  rest with a pointed ValueError
- sniff_media's guard is scoped to malformed-bytes exceptions; a parser
  BUG (TypeError) propagates
- dsir_log_ratio_list raises a clear error on an empty target slice
- read_opendap_long_distributed grid-checks every URL against the first
"""

import struct

import numpy as np
import pytest
from pyspark.sql import functions as F


# ------------------------------------------------------------------
# cosine_topk_arrow: NULL / ragged vectors are data, not crashes
# ------------------------------------------------------------------
class TestArrowTopkDirtyCorpus:
    def test_null_and_ragged_dropped_like_fold_path(self, spark):
        from mhw3d_detection_spark.operators.similarity import (
            cosine_topk,
            cosine_topk_arrow,
        )

        rows = [
            (0, [1.0, 0.0]),
            (1, [0.9, 0.1]),
            (2, None),              # NULL embedding
            (3, [0.5, 0.5, 0.25]),  # ragged (wrong dim)
            (4, [0.0, 1.0]),
            (5, []),                # empty
            (6, [0.8, 0.2]),
        ]
        emb = spark.createDataFrame(
            rows, "vec_id long, embedding array<double>"
        ).repartition(4)
        got = [
            (r.vec_id, r.rank)
            for r in cosine_topk_arrow(emb, lambda c: c == 0, k=3)
            .orderBy("rank").collect()
        ]
        # dirty rows 2/3/5 never appear; clean ordering by cosine.
        # k=3: the fold path keeps the ragged row as a null-cosine
        # straggler PAST the clean candidates (zip_with null padding),
        # so parity holds wherever clean candidates fill the top-k
        assert got == [(1, 1), (6, 2), (4, 3)]
        want = [
            (r.vec_id, r.rank)
            for r in cosine_topk(emb, lambda c: c == 0, k=3)
            .orderBy("rank").collect()
        ]
        assert got == want

    def test_null_probe_dropped_not_crash(self, spark):
        from mhw3d_detection_spark.operators.similarity import (
            cosine_topk_arrow,
        )

        rows = [(0, None), (1, [1.0, 0.0]), (2, [0.9, 0.1])]
        emb = spark.createDataFrame(
            rows, "vec_id long, embedding array<double>"
        )
        # probe set {0, 1}: 0 is NULL -> dropped; 1 still scores
        out = cosine_topk_arrow(emb, lambda c: c <= 1, k=2).collect()
        assert {r.probe_id for r in out} == {1}

    def test_all_null_probes_raise_empty(self, spark):
        from mhw3d_detection_spark.operators.similarity import (
            cosine_topk_arrow,
        )

        emb = spark.createDataFrame(
            [(0, None), (1, [1.0, 0.0])],
            "vec_id long, embedding array<double>",
        )
        with pytest.raises(ValueError, match="empty probe set"):
            cosine_topk_arrow(emb, lambda c: c == 0, k=2)


# ------------------------------------------------------------------
# dedup_keep_best: gated verdict broadcast
# ------------------------------------------------------------------
class TestKeepBestBroadcastGate:
    def _fixture(self, spark):
        rows = [
            (1, "!!! ??? ### $$$", "s"),
            (2, " ".join(["clean readable sentence here"] * 8), "s"),
            (3, "short", "s"),
            (4, "standalone document four", "s"),
        ]
        docs = spark.createDataFrame(
            rows, "doc_id long, text string, source string"
        )
        pairs = spark.createDataFrame(
            [(1, 2), (2, 3)], "doc_a long, doc_b long"
        )
        return docs, pairs

    def test_gated_path_same_result(self, spark):
        from mhw3d_detection_spark.operators.textops import dedup_keep_best

        docs, pairs = self._fixture(spark)
        a = sorted(
            map(tuple, dedup_keep_best(docs, pairs).collect())
        )
        b = sorted(
            map(
                tuple,
                dedup_keep_best(
                    docs, pairs, broadcast_verdict=False
                ).collect(),
            )
        )
        assert a == b
        kept = {r[0]: r[3] for r in a}
        assert kept == {1: 0, 2: 1, 3: 0, 4: 1}

    def test_plan_shape_both_paths(self, spark):
        from mhw3d_detection_spark.operators.textops import dedup_keep_best

        docs, pairs = self._fixture(spark)
        hinted = dedup_keep_best(docs, pairs)
        plain = dedup_keep_best(docs, pairs, broadcast_verdict=False)
        # default: the final corpus join carries an explicit broadcast
        # hint; gated: no hint — AQE decides from measured sizes
        assert "ResolvedHint" in hinted._jdf.queryExecution().analyzed().toString()
        assert "ResolvedHint" not in plain._jdf.queryExecution().analyzed().toString()


# ------------------------------------------------------------------
# netCDF classic writer: int64 handling
# ------------------------------------------------------------------
class TestNetcdfWriterInt64:
    def test_int64_var_and_attr_downcast_roundtrip(self, tmp_path):
        from mhw3d_detection_spark.sources.netcdf import (
            read_netcdf_file,
            write_netcdf_classic,
        )

        p = str(tmp_path / "i8.nc")
        n_t, n_lat, n_lon = 3, 2, 2
        cube = np.arange(n_t * n_lat * n_lon).reshape(n_t, n_lat, n_lon)
        write_netcdf_classic(
            p,
            {"time": n_t, "lat": n_lat, "lon": n_lon},
            {
                # np.arange -> int64 everywhere: time coord, data var,
                # and a Python-int attribute (asarray -> int64 scalar)
                "lat": (["lat"], np.array([0.0, 1.0]), {}),
                "lon": (["lon"], np.array([0.0, 1.0]), {}),
                "time": (
                    ["time"],
                    np.arange(n_t),
                    {"units": "days since 2000-01-01", "some_count": 7},
                ),
                "sst": (["time", "lat", "lon"], cube, {}),
            },
        )
        got, times, coords = read_netcdf_file(p)
        np.testing.assert_array_equal(got, cube.astype(np.float64))
        assert str(times[0].date()) == "2000-01-01"

    def test_unsupported_dtype_pointed_error(self, tmp_path):
        from mhw3d_detection_spark.sources.netcdf import write_netcdf_classic

        p = str(tmp_path / "bad.nc")
        with pytest.raises(ValueError, match="uint32.*classic"):
            write_netcdf_classic(
                p,
                {"x": 2},
                {"v": (["x"], np.array([1, 2], dtype=np.uint32), {})},
            )

    def test_int64_overflow_pointed_error(self, tmp_path):
        from mhw3d_detection_spark.sources.netcdf import write_netcdf_classic

        p = str(tmp_path / "big.nc")
        with pytest.raises(ValueError, match="int64.*classic"):
            write_netcdf_classic(
                p,
                {"x": 2},
                {"v": (["x"], np.array([0, 2**40]), {})},
            )

    def test_netcdf4_roundtrip_if_available(self, tmp_path):
        # environments with the netCDF4/HDF5 stack: the auto engine
        # must read a v4 file the builtin reader refuses
        nc4 = pytest.importorskip("netCDF4")
        p = str(tmp_path / "v4.nc")
        with nc4.Dataset(p, "w", format="NETCDF4") as ds:
            ds.createDimension("time", 2)
            ds.createDimension("lat", 2)
            ds.createDimension("lon", 2)
            t = ds.createVariable("time", "f8", ("time",))
            t.units = "days since 2000-01-01"
            t[:] = [0.0, 1.0]
            ds.createVariable("lat", "f8", ("lat",))[:] = [0.0, 1.0]
            ds.createVariable("lon", "f8", ("lon",))[:] = [0.0, 1.0]
            v = ds.createVariable("sst", "f8", ("time", "lat", "lon"))
            v[:] = np.arange(8.0).reshape(2, 2, 2)
        from mhw3d_detection_spark.sources.netcdf import read_netcdf_file

        got, times, coords = read_netcdf_file(p)
        np.testing.assert_array_equal(got, np.arange(8.0).reshape(2, 2, 2))


# ------------------------------------------------------------------
# sniff_media: parser bugs propagate, garbage stays safe
# ------------------------------------------------------------------
class TestSniffGuardScope:
    def test_parser_bug_propagates(self, monkeypatch):
        from mhw3d_detection_spark.operators import multimodal

        class _Boom:
            error = struct.error

            @staticmethod
            def unpack_from(*a, **k):
                raise TypeError("injected parser bug")

        monkeypatch.setattr(multimodal, "struct", _Boom)
        png = (
            b"\x89PNG\r\n\x1a\n" + b"\x00" * 4 + b"IHDR"
            + struct.pack(">II", 4, 4) + bytes([8, 6]) + b"\x00" * 16
        )
        with pytest.raises(TypeError, match="injected parser bug"):
            multimodal.sniff_media(png)

    def test_garbage_still_safe(self):
        from mhw3d_detection_spark.operators.multimodal import sniff_media

        # fuzz shapes that exercise each container's truncation path
        payloads = [
            b"\x89PNG\r\n\x1a\n\x00\x00\x00\x00IHDR\x01",      # short IHDR
            b"\xff\xd8\xff\xc0\x00",                            # short SOF
            b"GIF89a\x01",                                      # short LSD
            b"BM" + b"\x00" * 24,                               # short BMP
            b"RIFF\x10\x00\x00\x00WAVEfmt \xff\xff\xff\xff",    # bad chunk
        ]
        for pay in payloads:
            m = sniff_media(pay)
            assert m["n_bytes"] == len(pay)


# ------------------------------------------------------------------
# DSIR: empty target slice fails loudly at the source
# ------------------------------------------------------------------
class TestDsirEmptyTarget:
    def test_empty_target_raises_clear_error(self, spark):
        from mhw3d_detection_spark.operators.textops import (
            dsir_log_ratio_list,
        )

        docs = spark.createDataFrame(
            [(1, "alpha beta", "pool"), (2, "gamma delta", "pool")],
            "doc_id long, text string, source string",
        )
        with pytest.raises(ValueError, match="no documents"):
            dsir_log_ratio_list(
                docs, lambda s: s == F.lit("target"), n_buckets=16
            )


# ------------------------------------------------------------------
# OPeNDAP distributed: cross-URL grid consistency
# ------------------------------------------------------------------
class TestOpendapGridCheck:
    def test_grid_mismatch_raises(self, spark):
        from tests.test_opendap import _dods_payload, _fixture

        from mhw3d_detection_spark.sources.opendap import (
            read_opendap_long_distributed,
        )

        cube, tvals, lats, lons = _fixture()
        good = _dods_payload(cube, tvals, lats, lons)
        bad = _dods_payload(cube, tvals + 6 * 86400.0, lats + 0.5, lons)
        table = {"u1": good, "u2": bad}
        ddf = read_opendap_long_distributed(
            spark, ["u1", "u2"], "sst",
            fetcher=lambda u, _t=table: _t[u],
        )
        with pytest.raises(Exception, match="grid differs"):
            ddf.collect()

    def test_empty_urls_raise(self, spark):
        from mhw3d_detection_spark.sources.opendap import (
            read_opendap_long_distributed,
        )

        with pytest.raises(ValueError, match="empty URL list"):
            read_opendap_long_distributed(spark, [], "sst")


# ------------------------------------------------------------------
# r9 wave-1 operators: KS, containment, Theil-Sen
# ------------------------------------------------------------------
class TestKsTwoSample:
    def test_matches_manual_ks(self, spark):
        from mhw3d_detection_spark.operators.analysis import ks_two_sample

        old = [1, 2, 2, 3, 5, 8, 8, 9]
        new = [4, 5, 6, 6, 7, 9]
        rows = [(i, x, True) for i, x in enumerate(old)] + [
            (100 + i, x, False) for i, x in enumerate(new)
        ]
        df = spark.createDataFrame(rows, "doc_id long, x int, old boolean")
        got = ks_two_sample(df, "x", F.col("old")).collect()[0]
        # manual sup over pooled distinct values
        import bisect

        def cdf(sample, x):
            return bisect.bisect_right(sorted(sample), x) / len(sample)

        want = max(
            abs(cdf(old, x) - cdf(new, x)) for x in sorted(set(old + new))
        )
        assert got.ks_stat == pytest.approx(want, abs=0)
        assert (got.n_old, got.n_new) == (8, 6)
        # x_at_max: smallest x attaining the sup
        attain = [
            x
            for x in sorted(set(old + new))
            if abs(cdf(old, x) - cdf(new, x)) == want
        ]
        assert got.x_at_max == attain[0]

    def test_identical_distributions_zero(self, spark):
        from mhw3d_detection_spark.operators.analysis import ks_two_sample

        rows = [(i, i % 5, i % 2 == 0) for i in range(20)]
        df = spark.createDataFrame(rows, "doc_id long, x int, old boolean")
        got = ks_two_sample(df, "x", F.col("old")).collect()[0]
        assert got.ks_stat == 0.0


class TestContainmentPairs:
    def test_planted_quote_scores_one(self, spark):
        from mhw3d_detection_spark.operators.textops import (
            shingle_containment_pairs,
        )

        quote = "the quick brown fox jumps over the lazy dog"
        page = (
            "intro paragraph with plenty of filler words here "
            + quote
            + " and a long closing section of unrelated prose follows"
        )
        rows = [
            (0, quote, "s"),        # probe: fully contained in 2
            (2, page, "s"),
            (3, "completely different text about oceans and storms", "s"),
        ]
        docs = spark.createDataFrame(
            rows, "doc_id long, text string, source string"
        )
        out = {
            (r.probe_id, r.doc_id): r.containment
            for r in shingle_containment_pairs(
                docs, probe_pred=lambda c: c == 0, min_containment=0.5
            ).collect()
        }
        assert out == {(0, 2): 1.0}

    def test_jaccard_blind_spot(self, spark):
        # the same planted pair scores LOW on Jaccard — the reason
        # containment exists as its own measure
        from mhw3d_detection_spark.operators.textops import (
            ngram_jaccard_pairs,
        )

        quote = "the quick brown fox jumps over the lazy dog"
        page = " ".join(f"filler{i}" for i in range(60)) + " " + quote
        docs = spark.createDataFrame(
            [(0, quote, "s"), (2, page, "s")],
            "doc_id long, text string, source string",
        )
        j = ngram_jaccard_pairs(
            docs, probe_pred=lambda c: c == 0, min_jaccard=0.0
        ).collect()
        assert j and j[0].jaccard < 0.2


class TestTheilsenTrend:
    def test_robust_to_outlier(self, spark):
        from mhw3d_detection_spark.operators.analysis import theilsen_trend
        import datetime

        base = datetime.date(2000, 1, 1)
        rows = []
        for d in range(40):
            temp = 10.0 + 0.5 * d
            if d == 20:
                temp = 500.0  # one wild spike
            rows.append((1, base + datetime.timedelta(days=d), temp))
        ts = spark.createDataFrame(rows, "cell_id long, time date, temp double")
        got = theilsen_trend(ts, max_lag_days=10).collect()[0]
        # median slope stays at the true 0.5/day despite the spike
        assert got.sen_slope == pytest.approx(0.5, abs=1e-6)

    def test_pair_count_banded(self, spark):
        from mhw3d_detection_spark.operators.analysis import theilsen_trend
        import datetime

        base = datetime.date(2000, 1, 1)
        rows = [
            (1, base + datetime.timedelta(days=d), float(d)) for d in range(5)
        ]
        ts = spark.createDataFrame(rows, "cell_id long, time date, temp double")
        got = theilsen_trend(ts, max_lag_days=2).collect()[0]
        # lags 1: 4 pairs, lag 2: 3 pairs
        assert got.n_pairs == 7 and got.sen_slope == pytest.approx(1.0)


class TestKcenterSelect:
    def test_matches_numpy_greedy(self, spark):
        from mhw3d_detection_spark.operators.similarity import kcenter_select

        rng = np.random.default_rng(11)
        X = np.round(rng.normal(0, 1, (40, 4)), 3)
        emb = spark.createDataFrame(
            [(i, [float(x) for x in X[i]]) for i in range(40)],
            "vec_id long, embedding array<double>",
        )
        got = [
            (r.rank, r.vec_id)
            for r in kcenter_select(emb, k=5, seed_id=0)
            .orderBy("rank").collect()
        ]

        # numpy greedy with the same rq6 quantization + tie-break
        def rq6(v):
            return np.floor(v * 1e6 + 0.5 + 2.0**-16) / 1e6

        sel = [0]
        mind = rq6(np.linalg.norm(X - X[0], axis=1))
        mind[0] = -1.0
        want = [(1, 0)]
        for r in range(2, 6):
            # argmax with min-id tie-break
            best = max(
                (d, -i) for i, d in enumerate(mind) if i not in sel
            )
            nxt = -best[1]
            want.append((r, nxt))
            sel.append(nxt)
            mind = np.minimum(
                mind, rq6(np.linalg.norm(X - X[nxt], axis=1))
            )
            mind[nxt] = -1.0
        assert got == want

    def test_covers_planted_clusters(self, spark):
        from mhw3d_detection_spark.operators.similarity import kcenter_select

        # three tight clusters far apart: 3 picks hit all three
        centers = [(0.0, 0.0), (100.0, 0.0), (0.0, 100.0)]
        rows = []
        for ci, (cx, cy) in enumerate(centers):
            for j in range(5):
                rows.append(
                    (ci * 10 + j, [cx + 0.1 * j, cy - 0.1 * j])
                )
        emb = spark.createDataFrame(
            rows, "vec_id long, embedding array<double>"
        )
        got = kcenter_select(emb, k=3, seed_id=0).collect()
        picked_clusters = {r.vec_id // 10 for r in got}
        assert picked_clusters == {0, 1, 2}

    def test_missing_seed_raises(self, spark):
        from mhw3d_detection_spark.operators.similarity import kcenter_select

        emb = spark.createDataFrame(
            [(1, [1.0, 0.0])], "vec_id long, embedding array<double>"
        )
        with pytest.raises(ValueError, match="seed vec_id 99"):
            kcenter_select(emb, k=2, seed_id=99)


class TestHarmonicFit:
    def test_recovers_planted_harmonic(self, spark):
        import datetime
        import math

        from mhw3d_detection_spark.operators.climatology import harmonic_fit
        from mhw3d_detection_spark.queries.mhw import _harm_rows

        base = datetime.date(1995, 1, 1)
        rows = []
        for d in range(3 * 365):
            date = base + datetime.timedelta(days=d)
            doy = date.timetuple().tm_yday
            th = 2.0 * math.pi * (doy - 1) / 365.25
            rows.append(
                (7, date, 15.0 + 3.0 * math.cos(th) - 2.0 * math.sin(th))
            )
        ts = spark.createDataFrame(rows, "cell_id long, time date, temp double")
        harm = spark.createDataFrame(
            _harm_rows(), "doy int, c double, s double"
        )
        got = harmonic_fit(ts, harm).collect()[0]
        # tolerance 0.05: the planted signal uses calendar tm_yday while
        # the fit uses leap-normalized DOY, and 3x365 days is not an
        # integer number of 365.25-day cycles (design not orthogonal)
        assert got.a0 == pytest.approx(15.0, abs=0.05)
        assert got.a1 == pytest.approx(3.0, abs=0.05)
        assert got.b1 == pytest.approx(-2.0, abs=0.05)
        assert got.amplitude == pytest.approx(math.sqrt(13.0), abs=0.05)
        assert got.n_days == 3 * 365

    def test_flat_series_zero_harmonic(self, spark):
        import datetime

        from mhw3d_detection_spark.operators.climatology import harmonic_fit
        from mhw3d_detection_spark.queries.mhw import _harm_rows

        base = datetime.date(2000, 1, 1)
        rows = [
            (1, base + datetime.timedelta(days=d), 10.0)
            for d in range(400)
        ]
        ts = spark.createDataFrame(rows, "cell_id long, time date, temp double")
        harm = spark.createDataFrame(
            _harm_rows(), "doy int, c double, s double"
        )
        got = harmonic_fit(ts, harm).collect()[0]
        assert (got.a0, got.a1, got.b1, got.amplitude) == (10.0, 0.0, 0.0, 0.0)


class TestWassersteinTwoSample:
    def test_matches_scipy_free_manual(self, spark):
        from mhw3d_detection_spark.operators.analysis import (
            wasserstein1_two_sample,
        )

        old = [1, 2, 2, 3, 10]
        new = [4, 5, 6]
        rows = [(i, x, True) for i, x in enumerate(old)] + [
            (100 + i, x, False) for i, x in enumerate(new)
        ]
        df = spark.createDataFrame(rows, "doc_id long, x int, old boolean")
        got = wasserstein1_two_sample(df, "x", F.col("old")).collect()[0]

        xs = sorted(set(old + new))
        import bisect

        def cdf(sample, x):
            return bisect.bisect_right(sorted(sample), x) / len(sample)

        want = sum(
            abs(cdf(old, a) - cdf(new, a)) * (b - a)
            for a, b in zip(xs, xs[1:])
        )
        assert got.w1_stat == pytest.approx(want, abs=1e-6)
        assert (got.n_old, got.n_new) == (5, 3)

    def test_shift_sensitivity_vs_ks(self, spark):
        # broad +1 shift of a wide distribution: W1 ~ 1 (large),
        # KS small — the reason both monitors exist
        from mhw3d_detection_spark.operators.analysis import (
            ks_two_sample,
            wasserstein1_two_sample,
        )

        old = list(range(100))
        new = [x + 1 for x in old]
        rows = [(i, x, True) for i, x in enumerate(old)] + [
            (1000 + i, x, False) for i, x in enumerate(new)
        ]
        df = spark.createDataFrame(rows, "doc_id long, x int, old boolean")
        w1 = wasserstein1_two_sample(df, "x", F.col("old")).collect()[0]
        ks = ks_two_sample(df, "x", F.col("old")).collect()[0]
        assert w1.w1_stat == pytest.approx(1.0, abs=1e-6)
        assert ks.ks_stat == pytest.approx(0.01, abs=1e-9)


class TestMannKendall:
    def test_monotone_series_full_consensus(self, spark):
        import datetime

        from mhw3d_detection_spark.operators.analysis import (
            mann_kendall_banded,
        )

        base = datetime.date(2000, 1, 1)
        rows = [
            (1, base + datetime.timedelta(days=d), float(d)) for d in range(20)
        ]
        ts = spark.createDataFrame(rows, "cell_id long, time date, temp double")
        got = mann_kendall_banded(ts, max_lag_days=5).collect()[0]
        assert got.s_stat == got.n_pairs and got.consensus == 1.0

    def test_alternating_series_no_consensus(self, spark):
        import datetime

        from mhw3d_detection_spark.operators.analysis import (
            mann_kendall_banded,
        )

        base = datetime.date(2000, 1, 1)
        rows = [
            (1, base + datetime.timedelta(days=d), float(d % 2))
            for d in range(40)
        ]
        ts = spark.createDataFrame(rows, "cell_id long, time date, temp double")
        got = mann_kendall_banded(ts, max_lag_days=2).collect()[0]
        # lag-1 pairs alternate +1/-1; lag-2 pairs are all ties (0)
        assert abs(got.s_stat) <= 1 and abs(got.consensus) < 0.05


class TestVocabGrowthAndCurriculum:
    def test_vocab_growth_invariants(self, spark, sf_dir):
        from mhw3d_detection_spark import queries as Q

        rows = (
            Q.REGISTRY["q_vocab_growth"].spark_fn(spark, sf_dir)
            .orderBy("decile").collect()
        )
        assert [r.decile for r in rows] == list(range(10))
        # cum_types monotone; final cum = sum of new_types; ttr falls
        assert all(
            rows[i].cum_types <= rows[i + 1].cum_types for i in range(9)
        )
        assert rows[-1].cum_types == sum(r.new_types for r in rows)
        assert rows[-1].ttr <= rows[0].ttr
        assert rows[-1].cum_instances > 0

    def test_curriculum_decile_sizes_balanced(self, spark, sf_dir):
        from mhw3d_detection_spark import queries as Q

        rows = Q.REGISTRY["q_curriculum_buckets"].spark_fn(
            spark, sf_dir
        ).collect()
        per_source = {}
        for r in rows:
            assert 0 <= r.decile <= 9
            per_source.setdefault(r.source, []).append(r.n_docs)
        # percentile thresholds split each source into near-equal
        # buckets (ties can merge adjacent buckets)
        for src, sizes in per_source.items():
            assert sum(sizes) >= 10 or len(sizes) <= 10
        # quality must rise with decile within a source
        by_src = {}
        for r in rows:
            by_src.setdefault(r.source, []).append((r.decile, r.mean_quality))
        for src, pairs in by_src.items():
            pairs.sort()
            quals = [q for _, q in pairs]
            assert all(quals[i] <= quals[i + 1] + 1e-9 for i in range(len(quals) - 1))


class TestStreamingCurriculumGate:
    def test_stream_matches_batch_deciles(self, spark, tmp_path):
        from mhw3d_detection_spark.operators.textops import (
            composite_quality_col,
            curriculum_thresholds,
        )
        from mhw3d_detection_spark.queries.base import rq
        from mhw3d_detection_spark.streaming import streaming_curriculum_gate

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        thr = curriculum_thresholds(docs)
        assert thr and all(len(v) == 9 for v in thr.values())

        # batch reference: same fold over the same literal thresholds
        lit = F.create_map(
            *[
                c
                for src, t in thr.items()
                for c in (F.lit(src), F.array(*[F.lit(x) for x in t]))
            ]
        )
        qcol = rq(composite_quality_col("text"), 4)
        want = {
            r.doc_id: r.decile
            for r in docs.select(
                "doc_id",
                F.aggregate(
                    F.element_at(lit, F.col("source")),
                    F.lit(0),
                    lambda acc, x: acc + (qcol > x).cast("int"),
                ).alias("decile"),
            ).collect()
        }

        path = str(tmp_path / "curr_docs")
        half = docs.filter(F.col("doc_id") % 2 == 0)
        half.write.mode("overwrite").parquet(path)
        docs.exceptAll(half).write.mode("append").parquet(path)
        stream = spark.readStream.schema(docs.schema).option(
            "maxFilesPerTrigger", 1
        ).parquet(path)
        q = (
            streaming_curriculum_gate(stream, thr, min_decile=5)
            .select("doc_id", "decile", "keep")
            .writeStream.format("memory")
            .queryName("curr_gate")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = {
            r.doc_id: (r.decile, r.keep)
            for r in spark.table("curr_gate").collect()
        }
        assert set(got) == set(want)
        for d, dec in want.items():
            assert got[d][0] == dec, (d, dec, got[d])
            assert got[d][1] == (1 if dec >= 5 else 0)

    def test_unknown_source_quarantined(self, spark):
        from mhw3d_detection_spark.streaming import streaming_curriculum_gate

        docs = spark.createDataFrame(
            [(1, "good clean text here", "mystery")],
            "doc_id long, text string, source string",
        )
        got = streaming_curriculum_gate(
            docs, {"known": [0.1] * 9}, min_decile=3
        ).collect()[0]
        assert got.decile is None and got.keep == 0


class TestWave4Invariants:
    def test_mean_excess_tail_shapes(self, spark):
        import datetime

        from mhw3d_detection_spark import queries as Q  # noqa: F401
        from mhw3d_detection_spark.queries.mhw import q_mean_excess  # noqa: F401

        # operator semantics on a hand series: p90 of 0..99 = 89.1 ->
        # ten exceedances (90..99), mean excess = 5.4
        base = datetime.date(2000, 1, 1)
        rows = [
            (1, base + datetime.timedelta(days=d), float(d)) for d in range(100)
        ]
        ts = spark.createDataFrame(rows, "cell_id long, time date, temp double")
        thr = ts.groupBy("cell_id").agg(
            F.expr("percentile(temp, 0.9)").alias("thr")
        ).collect()[0]
        assert thr.thr == pytest.approx(89.1)
        ex = [d for d in range(100) if d > thr.thr]
        assert len(ex) == 10
        assert sum(x - thr.thr for x in ex) / 10 == pytest.approx(5.4)

    def test_burstiness_orders_keywords_over_function_words(self, spark):
        from mhw3d_detection_spark import queries as Q

        # planted corpus: 'zuniform' once per doc; 'zbursty' same total
        # mass but concentrated in few docs
        rows = []
        for i in range(20):
            body = "zuniform " + ("zbursty " * 10 if i < 2 else "")
            rows.append((i, (body + "filler words here ") * 1, "s"))
        docs = spark.createDataFrame(
            rows, "doc_id long, text string, source string"
        )
        from mhw3d_detection_spark.operators.textops import tokenize

        tf = tokenize(docs).groupBy("doc_id", "token").agg(
            F.count(F.lit(1)).alias("c")
        )
        s = tf.groupBy("token").agg(
            F.count(F.lit(1)).alias("df"),
            F.sum("c").alias("sc"),
            F.sum(F.col("c") * F.col("c")).alias("sc2"),
        )
        fano = {
            r.token: (r.sc2 / r.df - (r.sc / r.df) ** 2) / (r.sc / r.df)
            for r in s.collect()
        }
        assert fano["zuniform"] == pytest.approx(0.0)
        assert fano["zbursty"] == pytest.approx(0.0)  # within containing docs uniform
        # the registered query's df floor keeps output vocab-bounded
        out = Q.REGISTRY["q_token_burstiness"].spark_fn(
            spark.sql("SELECT 1").sparkSession, "/root/testdata/sf0.001"
        ).collect()
        assert all(r.df >= 10 for r in out)
        assert all(r.fano >= -1e-9 for r in out)

    def test_cluster_stats_mass_conservation(self, spark, sf_dir):
        from mhw3d_detection_spark import queries as Q
        from mhw3d_detection_spark.operators.textops import (
            connected_components_bounded,
            minhash_bands_rowlocal,
            minhash_candidate_pairs,
        )
        from mhw3d_detection_spark.sources.tables import load_table

        rows = Q.REGISTRY["q_dedup_cluster_stats"].spark_fn(
            spark, sf_dir
        ).collect()
        # Σ size*n_components = number of docs in any dup pair
        docs = load_table(spark, sf_dir, "documents")
        comp = connected_components_bounded(
            minhash_candidate_pairs(
                minhash_bands_rowlocal(docs, n_hashes=8, band_size=2)
            ),
            iters=3,
        )
        assert sum(r.component_size * r.n_components for r in rows) == comp.count()
        assert all(r.component_size >= 2 for r in rows)
        assert all(
            r.dup_mass == (r.component_size - 1) * r.n_components for r in rows
        )


class TestReviewFixesR9:
    """Pins for the r9 code-review findings."""

    def test_arrow_dim_deterministic_min_id(self, spark):
        # a ragged probe with a LOWER partition-order position must not
        # poison dim: the valid probe with the smallest vec_id wins
        from mhw3d_detection_spark.operators.similarity import (
            cosine_topk_arrow,
        )

        rows = [
            (0, [1.0, 0.0]),
            (1, [0.5, 0.5, 0.25]),  # ragged probe, higher id
            (2, [0.9, 0.1]),
            (3, [0.0, 1.0]),
        ]
        for nparts in (1, 2, 4):
            emb = spark.createDataFrame(
                rows, "vec_id long, embedding array<double>"
            ).repartition(nparts)
            out = cosine_topk_arrow(emb, lambda c: c <= 1, k=2).collect()
            # dim = 2 (probe 0), probe 1 dropped as ragged — stable
            # across partitionings
            assert {r.probe_id for r in out} == {0}
            assert {r.vec_id for r in out} == {2, 3}

    def test_ks_w1_null_values_excluded(self, spark):
        from mhw3d_detection_spark.operators.analysis import (
            ks_two_sample,
            wasserstein1_two_sample,
        )

        rows = [
            (1, 1, True), (2, 2, True), (3, None, True),
            (4, 1, False), (5, 3, False), (6, None, False),
        ]
        df = spark.createDataFrame(rows, "doc_id long, x int, old boolean")
        ks = ks_two_sample(df, "x", F.col("old")).collect()[0]
        # counts reflect only non-null values
        assert (ks.n_old, ks.n_new) == (2, 2)
        w1 = wasserstein1_two_sample(df, "x", F.col("old")).collect()[0]
        assert (w1.n_old, w1.n_new) == (2, 2)

    def test_curriculum_null_text_excluded(self, spark):
        from mhw3d_detection_spark import queries as Q  # noqa: F401
        from mhw3d_detection_spark.operators.textops import text_stats

        docs = spark.createDataFrame(
            [(1, "real text here", "s"), (2, None, "s")],
            "doc_id long, text string, source string",
        )
        st = text_stats(docs)
        got = {r.doc_id: r.quality_score for r in st.collect()}
        assert got[2] is None  # NULL text -> NULL quality (the hazard)

    def test_opendap_ref_coords_skips_driver_fetch(self, spark):
        from tests.test_opendap import _dods_payload, _fixture

        from mhw3d_detection_spark.sources.opendap import (
            read_opendap_long_distributed,
        )

        cube, tvals, lats, lons = _fixture()
        payload = _dods_payload(cube, tvals, lats, lons)
        calls = []

        def fetch(u, _p=payload):
            calls.append(u)
            return _p

        ddf = read_opendap_long_distributed(
            spark, ["u1"], "sst", fetcher=fetch,
            ref_coords=(lats, lons),
        )
        # plan construction must not fetch when the grid is supplied
        assert calls == []
        assert ddf.count() == cube.size


class TestStreamingDecontaminateGate:
    def test_matches_batch_bloom_flags(self, spark):
        from mhw3d_detection_spark.operators.sketches import (
            bloom_bits,
            bloom_decontaminate,
        )
        from mhw3d_detection_spark.operators.textops import shingles
        from mhw3d_detection_spark.streaming import (
            streaming_decontaminate_gate,
        )

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        probe_pred = lambda c: c % 20 == 0  # noqa: E731
        want = {
            r.doc_id: (r.n_shingles, r.n_maybe_hits, r.flagged)
            for r in bloom_decontaminate(docs, probe_pred).collect()
        }
        sh = shingles(docs).select("doc_id", "shingle").distinct()
        bits = [
            r.bit
            for r in bloom_bits(
                sh.filter(probe_pred(F.col("doc_id"))), F.col("shingle")
            ).collect()
        ]
        corpus = docs.filter(~probe_pred(F.col("doc_id")))
        got = {
            r.doc_id: (r.n_shingles, r.n_maybe_hits, r.flagged)
            for r in streaming_decontaminate_gate(corpus, bits).collect()
            if r.n_shingles > 0
        }
        assert set(want) == set(got)
        for d, v in want.items():
            assert got[d] == v, (d, v, got[d])

    def test_high_bit_words_and_short_docs(self, spark):
        from mhw3d_detection_spark.streaming import (
            streaming_decontaminate_gate,
        )

        # bits 63 and 4095 exercise the sign-bit word and the last word
        docs = spark.createDataFrame(
            [(1, "one two", "s")], "doc_id long, text string, source string"
        )
        out = streaming_decontaminate_gate(docs, [63, 4095]).collect()[0]
        assert out.n_shingles == 0 and out.hit_frac is None and out.flagged == 0
        with pytest.raises(ValueError, match="outside"):
            streaming_decontaminate_gate(docs, [4096]).collect()

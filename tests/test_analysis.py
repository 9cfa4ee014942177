"""Unit tests for post-detection analysis operators (SURVEY.md §2 S7,
W9-W11, A7-A9): pad interpolation semantics vs np.interp, detrend slope
removal, rank/return-periods, block spine + multi-year day splitting."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from mhw3d_detection_spark.operators.analysis import (
    annual_event_stats,
    block_average,
    block_temp_stats,
    detrend_linear,
    detrend_poly,
    pad_interpolate,
    rank_return_periods,
)


def _series(spark, vals, cell=1, start=dt.date(2000, 1, 1)):
    rows = [
        (cell, start + dt.timedelta(days=i), v) for i, v in enumerate(vals)
    ]
    return spark.createDataFrame(rows, "cell_id int, time date, temp double")


class TestPadInterpolate:
    def test_interior_gap_linear(self, spark):
        out = pad_interpolate(_series(spark, [1.0, None, None, 4.0])).orderBy("time")
        got = [r.temp_filled for r in out.collect()]
        assert got == [1.0, 2.0, 3.0, 4.0]

    def test_edges_clamp(self, spark):
        # np.interp constant-extrapolates at the edges (pad docstring,
        # reference marineHeatWaves.py:888-916)
        out = pad_interpolate(_series(spark, [None, 5.0, None])).orderBy("time")
        assert [r.temp_filled for r in out.collect()] == [5.0, 5.0, 5.0]

    def test_max_pad_length(self, spark):
        out = pad_interpolate(
            _series(spark, [1.0, None, None, None, 5.0, None, 7.0]),
            max_pad_length=2,
        ).orderBy("time")
        got = [r.temp_filled for r in out.collect()]
        # 3-long run stays NULL, 1-long run interpolates
        assert got == [1.0, None, None, None, 5.0, 6.0, 7.0]

    def test_all_null_cell(self, spark):
        out = pad_interpolate(_series(spark, [None, None]))
        assert [r.temp_filled for r in out.collect()] == [None, None]


class TestDetrendPoly:
    def test_deg2_removes_known_quadratic(self, spark):
        # y = 3 - 0.2*d + 0.01*d^2 -> quadratic detrend residual ~ 0
        vals = [3.0 - 0.2 * i + 0.01 * i * i for i in range(60)]
        out = detrend_poly(_series(spark, vals), deg=2)
        resid = out.agg(F.max(F.abs("temp_detrended"))).first()[0]
        assert resid == pytest.approx(0.0, abs=1e-6)

    def test_deg3_matches_numpy_polyfit(self, spark):
        # deg>2 escape hatch (applyInPandas np.polyfit) vs a direct
        # NumPy residual on the same series
        import numpy as np

        rng = np.random.default_rng(7)
        x = np.arange(80, dtype=float)
        y = 1.0 + 0.3 * x - 0.02 * x**2 + 1e-4 * x**3 + rng.normal(0, 0.1, 80)
        out = detrend_poly(_series(spark, [float(v) for v in y]), deg=3).orderBy(
            "time"
        )
        got = np.array([r.temp_detrended for r in out.collect()])
        # np.polyfit x here is days-since-epoch; recompute identically
        x_ord = np.array(
            [
                (dt.date(2000, 1, 1) + dt.timedelta(days=int(i)) - dt.date(1970, 1, 1)).days
                for i in range(80)
            ],
            dtype=float,
        )
        want = y - np.polyval(np.polyfit(x_ord, y, 3), x_ord)
        assert np.allclose(got, want, atol=1e-6)

    def test_deg1_delegates_to_linear(self, spark):
        vals = [2.0 + 0.5 * i for i in range(50)]
        out = detrend_poly(_series(spark, vals), deg=1)
        resid = out.agg(F.max(F.abs("temp_detrended"))).first()[0]
        assert resid == pytest.approx(0.0, abs=1e-6)

    def test_deg0_demeans(self, spark):
        out = detrend_poly(_series(spark, [4.0, 6.0, 8.0]), deg=0).orderBy("time")
        assert [r.temp_detrended for r in out.collect()] == [-2.0, 0.0, 2.0]

    def test_negative_deg_raises(self, spark):
        with pytest.raises(ValueError):
            detrend_poly(_series(spark, [1.0]), deg=-1)


class TestTwoPhaseRank:
    def _events(self, spark, metrics):
        rows = [(i % 3, i, float(v)) for i, v in enumerate(metrics)]
        return spark.createDataFrame(
            rows, "cell_id int, event_id int, intensity_max double"
        )

    def test_matches_reference_ranking_with_ties(self, spark):
        # duplicates force the (cell_id, event_id) tie-break; result must
        # equal the single-window row_number semantics exactly
        vals = [5.0, 3.0, 5.0, 1.0, 3.0, 5.0, 2.0, 1.0]
        ev = self._events(spark, vals)
        got = {
            r.event_id: (r.intensity_max_rank, r.intensity_max_return_period)
            for r in rank_return_periods(ev, ["intensity_max"], n_years=7).collect()
        }
        rows = sorted(
            ((v, i % 3, i) for i, v in enumerate(vals)),
            key=lambda t: (-t[0], t[1], t[2]),
        )
        for rank, (v, cell, eid) in enumerate(rows, start=1):
            assert got[eid] == (rank, pytest.approx(8.0 / rank))

    def test_empty_and_single_row(self, spark):
        empty = self._events(spark, [])
        assert rank_return_periods(empty, ["intensity_max"], n_years=7).count() == 0
        one = self._events(spark, [4.2])
        r = rank_return_periods(one, ["intensity_max"], n_years=7).collect()[0]
        assert r.intensity_max_rank == 1 and r.intensity_max_return_period == 8.0

    def test_multi_metric_ranks_independent(self, spark):
        ev = self._events(spark, [1.0, 2.0, 3.0]).withColumn(
            "duration", 10.0 - F.col("intensity_max")
        )
        out = rank_return_periods(
            ev, ["intensity_max", "duration"], n_years=4
        ).collect()
        by_id = {r.event_id: r for r in out}
        assert by_id[2].intensity_max_rank == 1 and by_id[2].duration_rank == 3
        assert by_id[0].intensity_max_rank == 3 and by_id[0].duration_rank == 1


class TestDetrend:
    def test_removes_known_slope(self, spark):
        # y = 2 + 0.5*day -> detrended residual ~ 0 (mirrors the
        # reference test: detrend removes a known slope, residual<1e-6)
        vals = [2.0 + 0.5 * i for i in range(50)]
        out = detrend_linear(_series(spark, vals))
        resid = out.agg(F.max(F.abs("temp_detrended"))).first()[0]
        assert resid == pytest.approx(0.0, abs=1e-6)

    def test_baseline_fit_evaluated_over_full_record(self, spark):
        # slope fitted on 2000 only; 2001 data keeps its offset
        vals = [float(i) for i in range(400)]
        out = detrend_linear(
            _series(spark, vals), baseline=(2000, 2000)
        )
        resid = out.agg(F.max(F.abs("temp_detrended"))).first()[0]
        assert resid == pytest.approx(0.0, abs=1e-6)


class TestRankReturn:
    def test_distinct_ordinal_ranks(self, spark):
        ev = spark.createDataFrame(
            [(1, 1, 5.0), (1, 2, 5.0), (2, 1, 7.0)],
            "cell_id int, event_id int, intensity_max double",
        )
        out = rank_return_periods(ev, ["intensity_max"], n_years=9).orderBy(
            "intensity_max_rank"
        )
        rows = out.collect()
        # row_number semantics: ties get distinct ranks by (cell, event)
        assert [r.intensity_max_rank for r in rows] == [1, 2, 3]
        assert rows[0].intensity_max == 7.0
        assert rows[0].intensity_max_return_period == pytest.approx(10.0)
        assert rows[2].intensity_max_return_period == pytest.approx(10.0 / 3)


class TestBlocks:
    def test_multi_year_event_splits_total_days(self, spark):
        # series 2000-2003 (1461 days); one event spanning 2001/2002
        ts = _series(spark, [0.0] * 1461)
        m = spark.createDataFrame(
            [
                (
                    1,
                    1,
                    dt.date(2001, 12, 25),
                    dt.date(2002, 1, 5),
                    12,
                    2.0,
                    1.0,
                    0.1,
                    12.0,
                )
            ],
            "cell_id int, event_id int, date_start date, date_end date, "
            "duration int, intensity_max double, intensity_mean double, "
            "intensity_var double, intensity_cumulative double",
        )
        blk = block_average(m, ts, block_length=1).orderBy("years_start")
        rows = {r.years_start: r for r in blk.collect()}
        assert sorted(rows) == [2000, 2001, 2002, 2003]
        # event belongs to its start-year block; total_days split by day-year
        assert rows[2001]["count"] == 1
        assert rows[2002]["count"] == 0
        assert rows[2001].total_days == 7   # Dec 25-31
        assert rows[2002].total_days == 5   # Jan 1-5
        assert rows[2001].total_icum == pytest.approx(12.0)
        assert rows[2000]["count"] == 0
        assert rows[2000].intensity_max is None

    def test_block_temp_stats(self, spark):
        ts = _series(spark, [float(i) for i in range(731)])  # 2000-2001
        blk = block_temp_stats(ts, block_length=1).orderBy("years_start")
        rows = blk.collect()
        assert rows[0].years_start == 2000
        assert rows[0].temp_min == 0.0
        assert rows[0].temp_max == 365.0  # leap year: 366 days
        assert rows[1].temp_min == 366.0


class TestTwoPhaseRankProperty:
    def test_random_metrics_match_python_ranking(self, spark):
        # hypothesis-style differential, deterministic seeds: the
        # two-phase distributed rank must equal the single-sequence
        # Python ranking for arbitrary value multisets (heavy ties,
        # negatives, skew), across partition counts
        import random

        for seed, n in ((1, 17), (2, 200), (3, 64)):
            rng = random.Random(seed)
            vals = [float(rng.choice([1, 2, 2, 3, 5, 5, 5, 9])) for _ in range(n)]
            rows = [(i % 5, i, v) for i, v in enumerate(vals)]
            ev = spark.createDataFrame(
                rows, "cell_id int, event_id int, intensity_max double"
            ).repartition(rng.choice([1, 3, 8]))
            got = {
                r.event_id: r.intensity_max_rank
                for r in rank_return_periods(
                    ev, ["intensity_max"], n_years=3
                ).collect()
            }
            want_order = sorted(
                ((v, i % 5, i) for i, v in enumerate(vals)),
                key=lambda t: (-t[0], t[1], t[2]),
            )
            for rank, (_, _, eid) in enumerate(want_order, start=1):
                assert got[eid] == rank, (seed, eid)


class TestAnnualEventStats:
    def test_densify_attribution_and_zero_years(self, spark):
        # cell 1: one event starting Dec 30 1996 spanning New Year (must
        # count ONCE, in 1996), one in 1998; 1995/1997/1999 are zero
        # years and must exist as explicit zero rows. cell 2: no 1996+
        # events at all -> all-zero except 1995.
        ev = spark.createDataFrame(
            [
                (1, dt.date(1996, 12, 30), dt.date(1997, 1, 5), 7),
                (1, dt.date(1998, 3, 1), dt.date(1998, 3, 5), 5),
                (2, dt.date(1995, 6, 1), dt.date(1995, 6, 3), 3),
            ],
            "cell_id int, date_start date, date_end date, duration int",
        )
        out = annual_event_stats(ev, (1995, 1999))
        rows = {(r.cell_id, r.year): r for r in out.collect()}
        assert len(rows) == 10  # 2 cells x 5 years, densified
        assert rows[(1, 1996)].n_events == 1
        assert rows[(1, 1996)].mhw_days == 7  # spans New Year, counted once
        assert rows[(1, 1997)].n_events == 0  # NOT attributed to end year
        assert rows[(1, 1997)].mean_duration is None  # mean of nothing
        assert rows[(1, 1998)].mean_duration == 5.0
        assert rows[(2, 1995)].n_events == 1
        assert all(
            rows[(2, y)].n_events == 0 and rows[(2, y)].mhw_days == 0
            for y in (1996, 1997, 1998, 1999)
        )

    def test_cells_universe_densifies_never_event_cells(self, spark):
        ev = spark.createDataFrame(
            [(1, dt.date(1995, 6, 1), dt.date(1995, 6, 3), 3)],
            "cell_id int, date_start date, date_end date, duration int",
        )
        cells = spark.createDataFrame([(1,), (2,), (3,)], "cell_id int")
        out = annual_event_stats(ev, (1995, 1996), cells=cells)
        rows = {(r.cell_id, r.year): r for r in out.collect()}
        assert len(rows) == 6  # 3 cells x 2 years
        assert rows[(3, 1995)].n_events == 0 and rows[(3, 1996)].mhw_days == 0


class TestCusumChangepoints:
    """The windowed closed form must equal the textbook recursion
    C+_t = max(0, C+_{t-1} + x_t - mu - k) exactly (both sides are
    dyadic-grid arithmetic, so == not approx)."""

    def _recursion(self, xs, mu, k):
        cp = cn = 0.0
        out = []
        for x in xs:
            cp = max(0.0, cp + (x - mu - k))
            cn = max(0.0, cn + (mu - x - k))
            out.append((cp, cn))
        return out

    def test_matches_recursion(self, spark):
        from mhw3d_detection_spark.operators.analysis import (
            cusum_changepoints,
            dyadic_quantize,
        )

        import random

        rng = random.Random(7)
        vals = [round(rng.uniform(-40.0, 40.0), 2) for _ in range(300)]
        # inject a level shift so both sides alarm
        vals = vals[:150] + [v + 25.0 for v in vals[150:]]
        df = _series(spark, vals)
        got = (
            cusum_changepoints(df, allowance=0.25, threshold=8.0)
            .orderBy("time")
            .collect()
        )
        # reproduce the operator's own quantized inputs
        xq = [
            r["q"]
            for r in df.select(dyadic_quantize("temp").alias("q"))
            .orderBy("time")
            .collect()
        ]
        import math

        mu_raw = math.fsum(xq) / len(xq)
        mu = math.floor(mu_raw * 64.0 + 0.5 + 2.0**-16) / 64.0
        want = self._recursion(xq, mu, 0.25)
        assert len(got) == len(want)
        for r, (cp, cn) in zip(got, want):
            assert r["cusum_pos"] == cp and r["cusum_neg"] == cn
            assert r["alarm_pos"] == (cp > 8.0)
            assert r["alarm_neg"] == (cn > 8.0)
        assert any(r["alarm_pos"] for r in got)
        assert any(r["alarm_neg"] for r in got)

    def test_alarm_resets_after_excursion(self, spark):
        from mhw3d_detection_spark.operators.analysis import cusum_changepoints

        # flat series with one short spike: C+ rises then drains back
        # to exactly zero (max(0, .) clamps; the closed form must too)
        vals = [10.0] * 40 + [30.0] * 3 + [10.0] * 40
        df = _series(spark, vals)
        rows = (
            cusum_changepoints(df, allowance=1.0, threshold=1000.0)
            .orderBy("time")
            .collect()
        )
        assert rows[-1]["cusum_pos"] == 0.0
        assert max(r["cusum_pos"] for r in rows) > 0.0


class TestEwmaSmooth:
    def test_matches_direct_weighted_sum_and_warmup_null(self, spark):
        import math

        from mhw3d_detection_spark.operators.analysis import ewma_smooth

        vals = [float(v) for v in range(1, 41)]
        df = _series(spark, vals)
        rows = ewma_smooth(df, window=16).orderBy("time").collect()
        q = lambda x: math.floor(x * 64.0 + 0.5 + 2.0**-16) / 64.0
        xq = [q(v) for v in vals]
        for t, r in enumerate(rows):
            if t < 15:
                assert r["ewma"] is None and r["ewma_anom"] is None
                continue
            want = 0.0
            for j in range(16):
                wt = 2.0 ** -(j + 1) if j < 15 else 2.0**-15
                want += wt * xq[t - j]
            assert r["ewma"] == want
            assert r["ewma_anom"] == xq[t] - want
        # weights sum to exactly 1: constant series -> ewma == value
        const = _series(spark, [7.25] * 20, cell=2)
        out = ewma_smooth(const, window=16).orderBy("time").collect()
        assert out[-1]["ewma"] == 7.25 and out[-1]["ewma_anom"] == 0.0


class TestDespikeMad:
    def test_flags_planted_spikes_only(self, spark):
        from mhw3d_detection_spark.operators.analysis import despike_mad

        import random

        rng = random.Random(5)
        vals = [round(10.0 + rng.uniform(-1, 1), 2) for _ in range(200)]
        vals[50] = 25.0   # spike up
        vals[120] = -7.0  # spike down
        rows = despike_mad(_series(spark, vals)).orderBy("time").collect()
        spikes = [i for i, r in enumerate(rows) if r["is_spike"]]
        assert spikes == [50, 120]
        # robust yardstick: the two spikes cannot drag the median/MAD
        assert abs(rows[0]["med"] - 10.0) < 1.0
        assert rows[50]["mod_z"] > 3.5 and rows[120]["mod_z"] > 3.5

    def test_zero_mad_guard(self, spark):
        from mhw3d_detection_spark.operators.analysis import despike_mad

        # >= 50% constant -> MAD 0: mod_z NULL, only deviants flagged
        vals = [5.0] * 10 + [9.0]
        rows = despike_mad(_series(spark, vals)).orderBy("time").collect()
        assert all(r["mod_z"] is None for r in rows)
        assert [r["is_spike"] for r in rows] == [False] * 10 + [True]

    def test_matches_numpy_reference(self, spark):
        import numpy as np

        from mhw3d_detection_spark.operators.analysis import despike_mad

        rng = np.random.default_rng(9)
        vals = [float(round(v, 2)) for v in rng.normal(20, 4, 301)]
        rows = despike_mad(_series(spark, vals)).orderBy("time").collect()
        x = np.round(np.array(vals), 2)
        med = np.median(x)
        mad = np.median(np.abs(x - med))
        want = 0.6745 * np.abs(x - med) > 3.5 * mad
        got = np.array([r["is_spike"] for r in rows])
        assert (got == want).all()
        assert abs(rows[0]["med"] - med) < 1e-4
        assert abs(rows[0]["mad"] - mad) < 1e-4


class TestTrendBootstrapCI:
    def test_ci_brackets_strong_trend_and_determinism(self, spark):
        import datetime as dt

        from mhw3d_detection_spark.operators.analysis import trend_bootstrap_ci

        # 10 years, clean +5/yr trend with mild noise: CI must bracket
        # the true slope and exclude zero; reruns must be bit-identical
        rows = []
        noise = [0.3, -0.2, 0.4, -0.1, 0.2, -0.3, 0.1, -0.4, 0.25, -0.15]
        for yi in range(10):
            for d in (1, 100, 200):
                rows.append(
                    (
                        1,
                        dt.date(2000 + yi, 1, 1) + dt.timedelta(days=d),
                        100.0 + 5.0 * yi + noise[yi],
                    )
                )
        df = spark.createDataFrame(rows, "cell_id int, time date, temp double")
        r1 = trend_bootstrap_ci(df, n_reps=64, block_len=2).collect()[0]
        assert r1["n_years"] == 10 and r1["n_reps"] == 64
        assert r1["ci_lo"] <= r1["trend"] <= r1["ci_hi"]
        assert abs(r1["trend"] - 5.0) < 0.3
        assert r1["ci_lo"] > 0.0  # significant positive trend
        # The block DRAWS are a pure function of (cell, rep, draw) —
        # rerunning must give the same resamples. The float aggregates
        # themselves are not bit-stable across Spark runs (partial-merge
        # order varies), which is exactly why the oracle contract is
        # rq2: assert determinism at that precision, not raw bits.
        r2 = trend_bootstrap_ci(df, n_reps=64, block_len=2).collect()[0]
        for k in ("trend", "ci_lo", "ci_hi"):
            assert abs(r1[k] - r2[k]) < 1e-6, (k, r1[k], r2[k])

    def test_noise_only_ci_spans_zero(self, spark):
        import datetime as dt
        import random

        from mhw3d_detection_spark.operators.analysis import trend_bootstrap_ci

        rng = random.Random(2)
        rows = [
            (1, dt.date(2000 + yi, 6, 1), 50.0 + rng.uniform(-5, 5))
            for yi in range(12)
        ]
        df = spark.createDataFrame(rows, "cell_id int, time date, temp double")
        r = trend_bootstrap_ci(df, n_reps=64, block_len=2).collect()[0]
        assert r["ci_lo"] < 0.0 < r["ci_hi"]


class TestTrendBootstrapEdges:
    def test_gap_year_uses_dense_index(self, spark):
        import datetime as dt

        from mhw3d_detection_spark.operators.analysis import trend_bootstrap_ci

        # years {2000, 2001, 2003, 2004}: every replicate must carry
        # exactly n pairs (no silently dropped joins) and 2004 must be
        # reachable — with the old calendar-offset addressing, pairs
        # referencing phantom 2002 vanished and 2004 was never drawn
        rows = [
            (1, dt.date(y, 6, 1), 10.0 + 2.0 * i)
            for i, y in enumerate((2000, 2001, 2003, 2004))
        ]
        df = spark.createDataFrame(rows, "cell_id int, time date, temp double")
        r = trend_bootstrap_ci(df, n_reps=32, block_len=2).collect()[0]
        assert r["n_years"] == 4 and r["n_reps"] == 32
        assert r["ci_lo"] is not None and r["ci_hi"] is not None
        assert r["ci_lo"] <= r["trend"] <= r["ci_hi"]

    def test_short_cell_surfaces_with_null_ci(self, spark):
        import datetime as dt

        from mhw3d_detection_spark.operators.analysis import trend_bootstrap_ci

        rows = [
            (1, dt.date(2000 + i, 6, 1), 5.0 + i) for i in range(6)
        ] + [(2, dt.date(2000, 6, 1), 9.0)]  # one year: no block exists
        df = spark.createDataFrame(rows, "cell_id int, time date, temp double")
        out = {r["cell_id"]: r for r in trend_bootstrap_ci(df, n_reps=16).collect()}
        assert 2 in out  # not silently dropped
        assert out[2]["n_reps"] == 0 and out[2]["ci_lo"] is None
        assert out[1]["n_reps"] == 16


class TestTopkPerGroup:
    def test_equals_single_window_with_ties(self, spark):
        from pyspark.sql import Window as W

        from mhw3d_detection_spark.operators.analysis import topk_per_group

        import random

        rng = random.Random(4)
        rows = [
            (i, f"g{i % 5}", float(rng.randint(0, 20)))  # many ties
            for i in range(500)
        ]
        df = spark.createDataFrame(rows, "id long, g string, v double")
        got = {
            (r["g"], r["rank"]): r["id"]
            for r in topk_per_group(df, ["g"], "v", 4, tie_col="id").collect()
        }
        w = W.partitionBy("g").orderBy(F.desc("v"), F.col("id"))
        want = {
            (r["g"], r["rank"]): r["id"]
            for r in df.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= 4)
            .collect()
        }
        assert got == want and len(want) == 20

    def test_ascending_and_small_groups(self, spark):
        from mhw3d_detection_spark.operators.analysis import topk_per_group

        df = spark.createDataFrame(
            [(1, "a", 9.0), (2, "a", 3.0), (3, "b", 7.0)],
            "id long, g string, v double",
        )
        out = topk_per_group(
            df, ["g"], "v", 2, tie_col="id", descending=False
        ).collect()
        by = {(r["g"], r["rank"]): r["id"] for r in out}
        # group b has fewer rows than k: returns what exists
        assert by == {("a", 1): 2, ("a", 2): 1, ("b", 1): 3}

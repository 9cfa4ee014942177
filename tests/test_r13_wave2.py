"""r13 wave-2 tests: Misra-Gries heavy hitters (bounded-state sketch +
exact verify), market-basket association rules, blocked record linkage."""

import pytest
from pyspark.sql import functions as F

from mhw3d_detection_spark.operators.sketches import (
    heavy_hitters,
    misra_gries_candidates,
)


def _mk_items(spark, counts: dict, n_parts=None, order="interleave"):
    """Item stream from {item: count}. order='interleave' spreads each
    item's occurrences round-robin (adversarial for MG: no item ever
    dominates a prefix); 'sorted' clumps them."""
    rows = []
    if order == "interleave":
        pools = {k: v for k, v in counts.items()}
        while pools:
            for k in list(pools):
                rows.append((k,))
                pools[k] -= 1
                if pools[k] == 0:
                    del pools[k]
    else:
        for k, v in sorted(counts.items()):
            rows.extend([(k,)] * v)
    df = spark.createDataFrame(rows, "item string")
    if n_parts:
        df = df.repartition(n_parts)
    return df


def _hh_exact(counts: dict, k: int):
    n = sum(counts.values())
    return {it for it, c in counts.items() if c * k > n}


class TestHeavyHitters:
    COUNTS = {
        "heavy1": 400,
        "heavy2": 250,
        **{f"tail{i}": 3 for i in range(200)},
    }

    def test_matches_bruteforce_with_boundary(self, spark):
        # boundary item sits EXACTLY at n/k: with tail mass 600 and
        # heavies 650, n = 1250; at k = 5 the bar is cnt*5 > 1250,
        # i.e. cnt > 250 — heavy2 (250) is exactly at the bar and must
        # be excluded by the strict inequality.
        counts = self.COUNTS
        n = sum(counts.values())
        k = 5
        assert counts["heavy2"] * k == n  # boundary really is exact
        out = {
            r.item: (r.cnt, r.n_total)
            for r in heavy_hitters(_mk_items(spark, counts), k=k).collect()
        }
        assert set(out) == _hh_exact(counts, k) == {"heavy1"}
        assert out["heavy1"] == (400, n)

    @pytest.mark.parametrize("n_parts", [1, 7, 64])
    def test_partitioning_invariant(self, spark, n_parts):
        k = 8
        out = sorted(
            (r.item, r.cnt)
            for r in heavy_hitters(
                _mk_items(spark, self.COUNTS, n_parts=n_parts), k=k
            ).collect()
        )
        expect = sorted(
            (it, self.COUNTS[it]) for it in _hh_exact(self.COUNTS, k)
        )
        assert out == expect and len(out) >= 2

    @pytest.mark.parametrize("order", ["interleave", "sorted"])
    def test_candidate_superset_guarantee(self, spark, order):
        k = 8
        items = _mk_items(spark, self.COUNTS, n_parts=16, order=order)
        cands = {
            r.item
            for r in misra_gries_candidates(items, k=k).collect()
        }
        assert _hh_exact(self.COUNTS, k) <= cands

    def test_bounded_candidate_state(self, spark):
        # wide domain (5k distinct, one heavy): the candidate union is
        # bounded by k per non-empty partition, nowhere near the domain
        counts = {"dominant": 6000, **{f"t{i}": 1 for i in range(5000)}}
        items = _mk_items(spark, counts, n_parts=8, order="sorted")
        k = 10
        cands = misra_gries_candidates(items, k=k).collect()
        assert len(cands) <= k * 8
        out = {r.item for r in heavy_hitters(items, k=k).collect()}
        assert out == {"dominant"}

    def test_empty_input(self, spark):
        empty = spark.createDataFrame([], "item string")
        assert heavy_hitters(empty, k=5).collect() == []


from mhw3d_detection_spark.operators.market import (  # noqa: E402
    association_rules,
    basket_pair_counts,
)


def _mk_baskets(spark, baskets: dict):
    rows = [(b, i) for b, items in baskets.items() for i in items]
    return spark.createDataFrame(rows, "basket string, item string")


class TestMarketBasket:
    BASKETS = {
        "b1": ["milk", "bread", "eggs"],
        "b2": ["milk", "bread"],
        "b3": ["milk", "eggs"],
        "b4": ["bread"],
        "b5": ["milk", "milk", "tea"],  # duplicate item collapses
        "b6": ["tea"],
    }

    def test_pair_counts_match_bruteforce(self, spark):
        from itertools import combinations

        expect = {}
        for items in self.BASKETS.values():
            for a, b in combinations(sorted(set(items)), 2):
                expect[(a, b)] = expect.get((a, b), 0) + 1
        got = {
            (r.item_a, r.item_b): r.n_ab
            for r in basket_pair_counts(
                _mk_baskets(spark, self.BASKETS)
            ).collect()
        }
        assert got == expect
        assert all(a < b for a, b in got)  # ordered, no mirrored dups

    def test_rules_math(self, spark):
        b = _mk_baskets(spark, self.BASKETS).distinct()
        rules = {
            (r.antecedent, r.consequent): r
            for r in association_rules(b).collect()
        }
        # milk: 4 baskets, bread: 3, (milk, bread): 2, n_baskets = 6
        r = rules[("milk", "bread")]
        assert (r.n_ab, r.n_ant, r.n_cons, r.n_baskets) == (2, 4, 3, 6)
        assert r.support == 2 / 6
        assert r.confidence == 2 / 4
        assert r.lift == (2 * 6) / (4 * 3)
        # the mirrored direction shares n_ab/support but not confidence
        r2 = rules[("bread", "milk")]
        assert r2.n_ab == 2 and r2.confidence == 2 / 3
        # both directions present for every surviving pair
        assert all((b, a) in rules for a, b in rules)

    def test_min_count_floor(self, spark):
        b = _mk_baskets(spark, self.BASKETS).distinct()
        got = {
            (r.antecedent, r.consequent)
            for r in association_rules(b, min_count=2).collect()
        }
        assert got == {("milk", "bread"), ("bread", "milk"),
                       ("milk", "eggs"), ("eggs", "milk")}

    def test_single_item_baskets_emit_nothing(self, spark):
        b = _mk_baskets(spark, {"x": ["a"], "y": ["b"]})
        assert basket_pair_counts(b).collect() == []


from mhw3d_detection_spark.operators.linkage import (  # noqa: E402
    blocked_link_pairs,
    linkage_block_summary,
    linkage_top_pairs,
)


class TestRecordLinkage:
    ROWS = [
        # block A: a near-dup pair (dist 1), a far record
        (1, "A", "jon smith"),
        (2, "A", "john smith"),
        (3, "A", "completely other"),
        # block B: exact dup names (dist 0)
        (4, "B", "acme corp"),
        (5, "B", "acme corp"),
        # block C: singleton — must still appear with 0 pairs
        (6, "C", "solo"),
    ]

    def _df(self, spark):
        return spark.createDataFrame(
            self.ROWS, "rid int, blk string, name string"
        )

    def test_pairs_stay_within_blocks(self, spark):
        pairs = blocked_link_pairs(
            self._df(spark), "rid", "name", ["blk"]
        ).collect()
        assert {(r.id_a, r.id_b) for r in pairs} == {
            (1, 2), (1, 3), (2, 3), (4, 5)
        }
        d = {(r.id_a, r.id_b): r.dist for r in pairs}
        assert d[(1, 2)] == 1 and d[(4, 5)] == 0 and d[(1, 3)] > 3

    def test_block_summary_classes_and_singleton(self, spark):
        s = {
            r.blk: r
            for r in linkage_block_summary(
                self._df(spark), "rid", "name", ["blk"]
            ).collect()
        }
        a = s["A"]
        assert (a.n_records, a.n_pairs, a.n_exact, a.n_match) == (3, 3, 0, 1)
        assert a.n_match + a.n_possible + a.n_nonmatch + a.n_exact == 3
        assert a.min_dist == 1
        b = s["B"]
        assert (b.n_pairs, b.n_exact, b.min_dist) == (1, 1, 0)
        c = s["C"]
        assert (c.n_records, c.n_pairs, c.min_dist) == (1, 0, None)

    def test_top_pairs_total_order(self, spark):
        top = linkage_top_pairs(
            self._df(spark), "rid", "name", ["blk"], per_block=1
        ).collect()
        best = {r.blk: (r.id_a, r.id_b, r.dist) for r in top}
        assert best["A"] == (1, 2, 1)
        assert best["B"] == (4, 5, 0)
        assert "C" not in best  # no pairs, no queue entry


from mhw3d_detection_spark.operators.analysis import (  # noqa: E402
    gini_concentration,
)


class TestGiniConcentration:
    def _run(self, spark, vals, group="g"):
        rows = [(group, i, int(v)) for i, v in enumerate(vals)]
        df = spark.createDataFrame(rows, "g string, id long, cents long")
        out = gini_concentration(df, "g", "id", "cents").collect()
        assert len(out) == 1
        return out[0]

    def test_uniform_is_zero(self, spark):
        r = self._run(spark, [100] * 10)
        assert r.gini == 0.0
        assert r.top10_share == 0.1
        assert r.bottom50_share == 0.5

    def test_single_holder_is_max(self, spark):
        n = 10
        r = self._run(spark, [0] * (n - 1) + [1000])
        # rank-formula Gini of one-holder: (n-1)/n
        assert r.gini == (n - 1) / n
        assert r.top10_share == 1.0
        assert r.bottom50_share == 0.0

    def test_matches_bruteforce_mad(self, spark):
        vals = [3, 1, 4, 1, 5, 9, 2, 6, 5, 3, 5, 8]
        n, mean = len(vals), sum(vals) / len(vals)
        mad = sum(abs(a - b) for a in vals for b in vals) / (n * n)
        want = mad / (2 * mean)
        r = self._run(spark, vals)
        assert r.gini == pytest.approx(want, abs=1e-12)

    def test_magnitude_guard_nulls_not_garbage(self, spark):
        # cents near 2^61: S would wrap int64 — stats must be NULL,
        # exact counts still reported
        r = self._run(spark, [2**61, 2**61, 2**61])
        assert r.n == 3 and r.gini is None and r.top10_share is None

    def test_groups_independent(self, spark):
        rows = [("a", 1, 100), ("a", 2, 100), ("b", 1, 0), ("b", 2, 500)]
        df = spark.createDataFrame(rows, "g string, id long, cents long")
        out = {r.g: r for r in gini_concentration(df, "g", "id", "cents").collect()}
        assert out["a"].gini == 0.0
        assert out["b"].gini == 0.5  # one-holder with n=2: (n-1)/n


from mhw3d_detection_spark.operators.analysis import (  # noqa: E402
    interval_union,
    lindley_backlog,
)


class TestLindleyBacklog:
    def _run(self, spark, deltas):
        rows = [("u", i, i, int(d)) for i, d in enumerate(deltas)]
        df = spark.createDataFrame(rows, "k string, us long, eid long, delta long")
        out = lindley_backlog(df, "k", ["us", "eid"], "delta").collect()
        return out[0]

    @pytest.mark.parametrize(
        "deltas",
        [
            [1, -3, 2],
            [-1, 2, -1],
            [2, -1, -3, 4],
            [1, 1, 1, -5, 1],
            [-2, -2, 3, 3, -1, -10, 7],
            [5, -1, -1, -1, -1, -1, -1, -1],
        ],
    )
    def test_matches_sequential_simulation(self, spark, deltas):
        s, mx, trace = 0, 0, []
        for d in deltas:
            s = max(0, s + d)
            mx = max(mx, s)
            trace.append(s)
        r = self._run(spark, deltas)
        assert (r.final_backlog, r.max_backlog, r.n_events) == (
            trace[-1], mx, len(deltas)
        )

    def test_keys_are_independent(self, spark):
        rows = [("a", 0, 0, 5), ("b", 0, 0, -5), ("a", 1, 1, -2), ("b", 1, 1, 2)]
        df = spark.createDataFrame(rows, "k string, us long, eid long, delta long")
        got = {r.k: (r.final_backlog, r.max_backlog)
               for r in lindley_backlog(df, "k", ["us", "eid"], "delta").collect()}
        assert got == {"a": (3, 5), "b": (2, 2)}


class TestIntervalUnion:
    def _run(self, spark, ivs):
        rows = [("u", int(s), int(e)) for s, e in ivs]
        df = spark.createDataFrame(rows, "k string, s long, e long")
        return interval_union(df, "k", "s", "e").collect()[0]

    def test_overlap_touch_and_gap(self, spark):
        # [0,10) + [5,15) merge; [15,20) touches -> merges; [30,40) new
        r = self._run(spark, [(0, 10), (5, 15), (15, 20), (30, 40)])
        assert (r.n_intervals, r.n_islands, r.covered, r.max_island) == (
            4, 2, 30, 20
        )

    def test_contained_and_duplicate_intervals(self, spark):
        r = self._run(spark, [(0, 100), (10, 20), (0, 100), (50, 60)])
        assert (r.n_islands, r.covered, r.max_island) == (1, 100, 100)

    def test_matches_bruteforce_union(self, spark):
        ivs = [(3, 9), (1, 4), (12, 15), (14, 22), (2, 2), (30, 31),
               (8, 13), (40, 45), (44, 50), (50, 51)]
        covered = len({t for s, e in ivs for t in range(s, e)})
        r = self._run(spark, ivs)
        assert r.covered == covered
        assert r.n_intervals == len(ivs)


def test_heavy_hitters_integer_items(spark):
    """The sketch must carry the item column's own type (a hardcoded
    string schema would silently mangle integer keys)."""
    rows = [(7,)] * 50 + [(i,) for i in range(100, 140)]
    df = spark.createDataFrame(rows, "item long")
    out = heavy_hitters(df, k=4).collect()
    assert [(r.item, r.cnt) for r in out] == [(7, 50)]
    assert out[0].n_total == 90


class TestLinkageBlockCap:
    """E2q-style hot-block backstop ported to blocking (r13w2):
    capped pairs are a deterministic subset, a huge cap is identity,
    and sub-bucketing bounds the per-task quadratic term."""

    def _pairs(self, spark, cap):
        from mhw3d_detection_spark.sources.tables import load_table

        cust = load_table(spark, "/root/testdata/sf0.001", "customer")
        return {
            (r.id_a, r.id_b)
            for r in blocked_link_pairs(
                cust, "c_custkey", "c_name",
                ["c_nationkey", "c_mktsegment"],
                max_block_size=cap,
            ).collect()
        }

    def test_subset_identity_determinism(self, spark):
        full = self._pairs(spark, None)
        capped = self._pairs(spark, 2)
        assert capped <= full and len(capped) < len(full)
        assert self._pairs(spark, 2) == capped  # deterministic
        assert self._pairs(spark, 10**9) == full  # huge cap = identity

    def test_small_blocks_untouched(self, spark):
        # cap above every block size: nothing salts, exact pairs
        full = self._pairs(spark, None)
        assert self._pairs(spark, 50) == full

    def test_pair_work_bounded(self, spark):
        # one hot 40-record block, cap 10 -> >= 4 sub-buckets; compared
        # pairs must be well under the uncapped 780 and every compared
        # pair must share a sub-bucket (implied by the join)
        rows = [("blk", i, f"name{i:03d}") for i in range(40)]
        df = spark.createDataFrame(rows, "b string, rid long, name string")
        capped = blocked_link_pairs(
            df, "rid", "name", ["b"], max_block_size=10
        ).count()
        uncapped = blocked_link_pairs(df, "rid", "name", ["b"]).count()
        assert uncapped == 40 * 39 // 2
        assert 0 < capped < uncapped / 2


from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402


class TestWindowAlgebraProperties:
    """Property tests for the r13w2 window-algebra identities against
    pure-Python sequential oracles — independent of the DuckDB gate
    (a wrong closed form expressed identically in both SQL engines
    would still pass the differential; this catches it)."""

    @settings(max_examples=12, deadline=None)
    @given(st.lists(st.integers(-9, 9), min_size=1, max_size=40))
    def test_lindley_prefix_min_identity(self, spark, deltas):
        s, mx = 0, 0
        for d in deltas:
            s = max(0, s + d)
            mx = max(mx, s)
        rows = [("k", i, i, int(d)) for i, d in enumerate(deltas)]
        df = spark.createDataFrame(
            rows, "k string, us long, eid long, delta long"
        )
        r = lindley_backlog(df, "k", ["us", "eid"], "delta").collect()[0]
        assert (r.final_backlog, r.max_backlog) == (s, mx)

    @settings(max_examples=12, deadline=None)
    @given(
        st.lists(
            st.tuples(st.integers(0, 60), st.integers(0, 25)),
            min_size=1,
            max_size=25,
        )
    )
    def test_interval_union_covers_exactly(self, spark, raw):
        ivs = [(s, s + ln) for s, ln in raw]
        covered = len({t for s, e in ivs for t in range(s, e)})
        islands = 0
        prev_end = None
        for s, e in sorted(ivs):
            if prev_end is None or s > prev_end:
                islands += 1
                prev_end = e
            else:
                prev_end = max(prev_end, e)
        rows = [("k", int(s), int(e)) for s, e in ivs]
        df = spark.createDataFrame(rows, "k string, s long, e long")
        r = interval_union(df, "k", "s", "e").collect()[0]
        assert r.covered == covered
        assert r.n_islands == islands
        assert r.n_intervals == len(ivs)


def test_interval_union_rejects_non_start_order(spark):
    df = spark.createDataFrame([("k", 0, 5)], "k string, s long, e long")
    with pytest.raises(ValueError, match="ascending 's' first"):
        interval_union(df, "k", "s", "e", order_cols=["e", "s"])


def test_linkage_cap_rejects_nonpositive(spark):
    df = spark.createDataFrame([("b", 1, "x")], "b string, rid long, name string")
    with pytest.raises(ValueError, match="max_block_size"):
        blocked_link_pairs(df, "rid", "name", ["b"], max_block_size=0)


def test_gini_oracle_overflow_regime_matches_spark_nulls():
    """The DuckDB oracle's HUGEINT rank-sum must survive the overflow
    regime and emit the guard's NULL-stat row (matching Spark's
    try_sum path) instead of erroring — the cross-engine twin of
    test_magnitude_guard_nulls_not_garbage."""
    import duckdb

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE j AS SELECT 'g' AS grp, i AS id, "
        "CAST(2305843009213693952 AS BIGINT) AS cents "  # 2^61
        "FROM range(1, 4) t(i)"
    )
    row = con.execute(
        "WITH rk AS (SELECT grp, id, cents, "
        "  row_number() OVER (PARTITION BY grp ORDER BY cents, id) AS i, "
        "  count(*) OVER (PARTITION BY grp) AS ng FROM j), "
        "agg AS (SELECT grp, CAST(count(*) AS BIGINT) AS n, "
        "  CAST(sum(cents) AS BIGINT) AS total_cents, "
        "  sum(CAST(i AS HUGEINT) * cents) AS s_rank, "
        "  CAST(max(cents) AS BIGINT) AS mx FROM rk GROUP BY 1) "
        "SELECT n, CASE WHEN n > 0 AND total_cents > 0 AND "
        "  CAST(mx AS DOUBLE) * n * (n + 1.0) / 2.0 "
        "    < 4.611686018427388e18 "
        "  THEN CAST(2 * s_rank - (n + 1) * CAST(total_cents AS "
        "    HUGEINT) AS DOUBLE) "
        "  / CAST(CAST(n AS HUGEINT) * total_cents AS DOUBLE) END "
        "  AS gini FROM agg"
    ).fetchone()
    assert row == (3, None)


def test_linkage_selfjoin_on_bucketed_blocks_no_exchange(spark):
    """Substantiates the linkage module's scale claim: a bucketed
    layout on the block key removes the blocking self-join's shuffle
    entirely (0 Exchange hashpartitioning in the executed plan)."""
    from mhw3d_detection_spark.sources.ingest import write_bucketed
    from mhw3d_detection_spark.sources.tables import load_table

    cust = load_table(spark, "/root/testdata/sf0.001", "customer").select(
        F.concat_ws(
            "/", "c_nationkey", "c_mktsegment"
        ).alias("blk"),
        "c_custkey",
        "c_name",
    )
    write_bucketed(cust, "cust_blk", key="blk", buckets=8, sort_by=None)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        t = spark.table("cust_blk")
        pairs = blocked_link_pairs(t, "c_custkey", "c_name", ["blk"])
        want = pairs.count()
        plan = pairs._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS cust_blk")
    assert "Exchange hashpartitioning" not in plan, plan
    # and the bucketed layout changes the plan, not the answer
    base = blocked_link_pairs(
        load_table(spark, "/root/testdata/sf0.001", "customer"),
        "c_custkey", "c_name", ["c_nationkey", "c_mktsegment"],
    ).count()
    assert want == base


def test_rules_chi2_matches_scipy_free_oracle(spark):
    """chi2 closed form vs the textbook expected-count formulation on
    a hand-built table; degenerate margins must yield NULL."""
    from mhw3d_detection_spark.operators.market import (
        association_rules,
        rules_with_chi2,
    )

    baskets = {
        **{f"b{i}": ["x", "y"] for i in range(6)},   # x,y co-occur 6x
        **{f"c{i}": ["x"] for i in range(4)},         # x alone 4x
        **{f"d{i}": ["y"] for i in range(2)},         # y alone 2x
        **{f"e{i}": ["z", "w"] for i in range(8)},    # unrelated pair
    }
    rows = [(b, i) for b, items in baskets.items() for i in items]
    df = spark.createDataFrame(rows, "basket string, item string")
    out = {
        (r.antecedent, r.consequent): r
        for r in rules_with_chi2(association_rules(df)).collect()
    }
    r = out[("x", "y")]
    n, a, b_, ab = r.n_baskets, r.n_ant, r.n_cons, r.n_ab
    assert (n, a, b_, ab) == (20, 10, 8, 6)
    # textbook form: sum over cells of (o - e)^2 / e
    obs = [ab, a - ab, b_ - ab, n - a - b_ + ab]
    exp = [a * b_ / n, a * (n - b_) / n, (n - a) * b_ / n,
           (n - a) * (n - b_) / n]
    want = sum((o - e) ** 2 / e for o, e in zip(obs, exp))
    assert r.chi2 == pytest.approx(want, rel=1e-12)
    # z co-occurs with w in EVERY z-basket and nowhere else: margins
    # n_ant = n_ab = 8 < n, so chi2 is defined and large
    assert out[("z", "w")].chi2 > r.chi2

    # degenerate margin: an item in every basket -> denominator 0 -> NULL
    rows2 = [("b1", "all"), ("b1", "p"), ("b2", "all"), ("b2", "q"),
             ("b3", "all"), ("b3", "p")]
    df2 = spark.createDataFrame(rows2, "basket string, item string")
    out2 = {
        (r.antecedent, r.consequent): r.chi2
        for r in rules_with_chi2(association_rules(df2)).collect()
    }
    assert out2[("all", "p")] is None


class TestEventStudy:
    def _run(self, spark, rows):
        from mhw3d_detection_spark.operators.analysis import event_study

        df = spark.createDataFrame(
            rows, "user_id long, event_id long, event_type string, us long"
        )
        return event_study(
            df,
            treatment_pred=F.col("event_type") == "T",
            activity_pred=F.col("event_type") == "A",
            window_us=100,
        ).collect()[0]

    def test_counts_windows_and_pairing(self, spark):
        rows = [
            # user 1: treatment at 1000; activity at 950 (before),
            # 1000 (AT instant -> neither), 1050+1080 (after), 1200 (out)
            (1, 10, "T", 1000),
            (1, 1, "A", 950), (1, 2, "A", 1000), (1, 3, "A", 1050),
            (1, 4, "A", 1080), (1, 5, "A", 1200),
            # user 2: treatment with NO nearby activity -> (0, 0) pair
            (2, 11, "T", 5000),
            (2, 6, "A", 9000),
            # user 3's activity must not leak into user 1's windows
            (3, 7, "A", 1010),
        ]
        r = self._run(spark, rows)
        assert (r.n_treatments, r.total_before, r.total_after) == (2, 1, 2)
        assert r.mean_before == 0.5 and r.mean_after == 1.0
        assert r.mean_diff == 0.5
        # paired diffs d = [1, 0]: mean .5, var .5, z = .5/sqrt(.25) = 1
        assert r.z == pytest.approx(1.0)

    def test_z_null_when_degenerate(self, spark):
        # single treatment -> n < 2 -> z NULL; counts still exact
        rows = [(1, 10, "T", 1000), (1, 1, "A", 950)]
        r = self._run(spark, rows)
        assert (r.n_treatments, r.total_before, r.z) == (1, 1, None)
        # identical diffs -> var 0 -> z NULL
        rows2 = [(1, 10, "T", 1000), (2, 11, "T", 1000)]
        r2 = self._run(spark, rows2)
        assert r2.n_treatments == 2 and r2.z is None


class TestHllSetAlgebra:
    def _run(self, spark, rows):
        from mhw3d_detection_spark.operators.sketches import hll_set_algebra

        df = spark.createDataFrame(rows, "uid long, et string")
        return hll_set_algebra(
            df,
            item=F.col("uid").cast("string"),
            flag_a=F.col("et") == "a",
            flag_b=F.col("et") == "b",
        ).collect()[0]

    def test_overlap_estimates_track_exact(self, spark):
        # A = 0..399, B = 200..599 -> |A|=|B|=400, union 600, both 200
        rows = [(i, "a") for i in range(400)] + [
            (i, "b") for i in range(200, 600)
        ]
        r = self._run(spark, rows)
        assert (r.exact_a, r.exact_b, r.exact_intersection) == (400, 400, 200)
        for est, exact in [(r.est_a, 400), (r.est_b, 400),
                           (r.est_union, 600)]:
            assert abs(est - exact) / exact < 0.08  # ~2.5x sketch sigma
        # inclusion-exclusion compounds three estimates' error
        assert abs(r.est_intersection - 200) / 200 < 0.3

    def test_disjoint_sets_near_zero_intersection(self, spark):
        rows = [(i, "a") for i in range(300)] + [
            (i, "b") for i in range(1000, 1300)
        ]
        r = self._run(spark, rows)
        assert r.exact_intersection == 0
        # may be slightly negative (standard inclusion-exclusion noise)
        assert abs(r.est_intersection) < 0.15 * 600

    def test_nested_sets(self, spark):
        # B subset of A: intersection = |B| exactly
        rows = [(i, "a") for i in range(500)] + [
            (i, "b") for i in range(100)
        ]
        r = self._run(spark, rows)
        assert (r.exact_a, r.exact_b, r.exact_intersection) == (500, 100, 100)
        assert abs(r.est_union - r.est_a) / r.est_a < 0.03  # union ~ A


class TestDiffInDiff:
    def _run(self, spark, rows):
        from mhw3d_detection_spark.operators.analysis import diff_in_diff

        df = spark.createDataFrame(rows, "user_id long, event_type string, us long")
        return diff_in_diff(
            df,
            treatment_agg=F.sum((F.col("event_type") == "T").cast("int"))
            >= F.lit(1),
            activity_pred=F.col("event_type") == "A",
        ).collect()[0]

    def test_hand_computed_did(self, spark):
        # midpoint = (0 + 100)//2 = 50.
        # treated u1: 1 click before, 3 after  -> d = +2
        # treated u2: 0 before, 2 after        -> d = +2
        # control u3: 2 before, 2 after        -> d =  0
        # control u4: 1 before, 2 after        -> d = +1
        rows = [
            (1, "T", 10), (1, "A", 20), (1, "A", 60), (1, "A", 70), (1, "A", 80),
            (2, "T", 30), (2, "A", 90), (2, "A", 95),
            (3, "A", 10), (3, "A", 20), (3, "A", 60), (3, "A", 70),
            (4, "A", 0), (4, "A", 55), (4, "A", 100),
        ]
        r = self._run(spark, rows)
        assert (r.n_treated, r.n_control) == (2, 2)
        assert r.mean_diff_treated == 2.0
        assert r.mean_diff_control == 0.5
        assert r.did == 1.5
        # var_t = 0, var_c = 0.5 -> se = sqrt(0 + 0.5/2) = 0.5 -> z = 3
        assert r.z == pytest.approx(3.0)

    def test_midpoint_instant_in_neither_half(self, spark):
        rows = [(1, "T", 0), (1, "A", 50), (2, "A", 0), (2, "A", 100)]
        r = self._run(spark, rows)  # mid = 50; u1's click at 50 drops
        assert r.mean_diff_treated == 0.0

    def test_empty_group_yields_nulls(self, spark):
        rows = [(1, "T", 0), (1, "A", 10), (2, "T", 5), (2, "A", 90)]
        r = self._run(spark, rows)  # no control users
        assert r.n_control == 0
        assert r.mean_diff_control is None and r.did is None and r.z is None

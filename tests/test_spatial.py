"""Spatial operators (operators/spatial.py): connected components,
adjacency-edge construction, 3-D object merging, area weighting.

The component oracle here is a tiny pure-Python union-find — an
implementation-independent recipe, mirroring the NumPy-oracle pattern
of the climatology tests.
"""

from __future__ import annotations

import datetime as dt
import math

import pytest
from pyspark.sql import functions as F

from mhw3d_detection_spark.operators.spatial import (
    _NODE_STRIDE,
    area_weighted_daily,
    connected_components,
    event_adjacency_edges,
    spatial_events_3d,
)


def _uf_components(n_nodes, edges):
    parent = list(range(len(n_nodes)))
    idx = {v: i for i, v in enumerate(n_nodes)}

    def find(i):
        while parent[i] != i:
            parent[i] = parent[parent[i]]
            i = parent[i]
        return i

    for a, b in edges:
        ra, rb = find(idx[a]), find(idx[b])
        if ra != rb:
            parent[ra] = rb
    out = {}
    for v in n_nodes:
        root = find(idx[v])
        out.setdefault(root, []).append(v)
    return {min(vs): sorted(vs) for vs in out.values()}


def _ev(cell, eid, s, e):
    d0 = dt.date(2000, 1, 1)
    return (
        cell,
        eid,
        d0 + dt.timedelta(days=s),
        d0 + dt.timedelta(days=e),
        e - s + 1,
    )


EV_COLS = ["cell_id", "event_id", "date_start", "date_end", "duration"]


def test_connected_components_path_graph_converges_fast(spark):
    # A 40-node path: plain min-propagation needs 39 rounds; pointer
    # doubling must finish within max_rounds=16 (ceil(log2(39)) + slack).
    nodes = spark.createDataFrame([(i,) for i in range(40)], ["u"])
    edges = spark.createDataFrame([(i, i + 1) for i in range(39)], ["u", "v"])
    got = connected_components(edges, nodes, max_rounds=16).collect()
    assert len(got) == 40
    assert {r["component"] for r in got} == {0}


def test_connected_components_matches_union_find(spark):
    import random

    rng = random.Random(7)
    node_ids = list(range(60))
    edge_list = [
        (rng.choice(node_ids), rng.choice(node_ids)) for _ in range(45)
    ]
    edge_list = [(a, b) for a, b in edge_list if a != b]
    nodes = spark.createDataFrame([(v,) for v in node_ids], ["u"])
    edges = spark.createDataFrame(edge_list, ["u", "v"])
    got = {
        r["u"]: r["component"]
        for r in connected_components(edges, nodes).collect()
    }
    want = _uf_components(node_ids, edge_list)
    for root, members in want.items():
        for m in members:
            assert got[m] == root, (m, got[m], root)


def test_adjacency_edges_grid_and_overlap(spark):
    # 2x5 grid (width=5). Events: cells 0 and 1 adjacent + overlapping;
    # cells 0 and 5 vertically adjacent + overlapping; cells 1 and 2
    # adjacent but NOT overlapping; cells 0 and 6 diagonal (no edge).
    evs = [
        _ev(0, 1, 0, 10),
        _ev(1, 1, 5, 15),
        _ev(5, 1, 8, 12),
        _ev(2, 1, 30, 40),
        _ev(6, 1, 0, 10),
    ]
    df = spark.createDataFrame(evs, EV_COLS)
    edges = {
        (r["u"], r["v"])
        for r in event_adjacency_edges(df, width=5).collect()
    }
    n = lambda c, e: c * _NODE_STRIDE + e
    assert (n(0, 1), n(1, 1)) in edges
    assert (n(0, 1), n(5, 1)) in edges
    # 1-2 not overlapping; 0-6 diagonal; 5-6 adjacent, overlap 8..10
    assert (n(1, 1), n(2, 1)) not in edges
    assert all({u, v} != {n(0, 1), n(6, 1)} for u, v in edges)
    assert (n(5, 1), n(6, 1)) in edges


def test_spatial_events_3d_merges_chain(spark):
    # Chain 0-1-2 via pairwise overlaps (0 and 2 do NOT overlap but are
    # transitively connected through 1); cell 7 isolated.
    evs = [
        _ev(0, 1, 0, 5),
        _ev(1, 1, 4, 12),
        _ev(2, 1, 11, 20),
        _ev(7, 1, 0, 5),
        _ev(0, 2, 50, 55),  # second event in cell 0, isolated in time
    ]
    df = spark.createDataFrame(evs, EV_COLS)
    got = {r["component"]: r for r in spatial_events_3d(df, width=5).collect()}
    assert len(got) == 3
    chain = got[0 * _NODE_STRIDE + 1]
    assert chain["n_events"] == 3
    assert chain["n_cells"] == 3
    assert chain["date_start"] == dt.date(2000, 1, 1)
    assert chain["date_end"] == dt.date(2000, 1, 21)
    assert chain["total_days"] == 6 + 9 + 10
    assert chain["max_duration"] == 10
    assert got[7 * _NODE_STRIDE + 1]["n_events"] == 1
    assert got[0 * _NODE_STRIDE + 2]["n_events"] == 1


def test_area_weighted_daily_matches_manual(spark):
    rows = [
        # (cell, time, temp, exceed): cells 0 (y=0, lat -60) and 5 (y=1, lat -55)
        (0, dt.date(2000, 1, 1), 10.0, True),
        (5, dt.date(2000, 1, 1), 20.0, False),
        (0, dt.date(2000, 1, 2), 30.0, True),
    ]
    df = spark.createDataFrame(rows, ["cell_id", "time", "temp", "exceed"])
    got = {r["time"]: r for r in area_weighted_daily(df, width=5).collect()}
    w0, w5 = math.cos(math.radians(-60.0)), math.cos(math.radians(-55.0))
    d1 = got[dt.date(2000, 1, 1)]
    assert d1["n_cells"] == 2 and d1["n_active"] == 1
    assert d1["area_frac_active"] == pytest.approx(w0 / (w0 + w5), rel=1e-12)
    assert d1["w_mean_temp"] == pytest.approx(
        (w0 * 10 + w5 * 20) / (w0 + w5), rel=1e-12
    )
    d2 = got[dt.date(2000, 1, 2)]
    assert d2["area_frac_active"] == pytest.approx(1.0)
    assert d2["w_mean_temp"] == pytest.approx(30.0)


def test_connected_components_raises_when_unconverged(spark):
    nodes = spark.createDataFrame([(i,) for i in range(40)], ["u"])
    edges = spark.createDataFrame([(i, i + 1) for i in range(39)], ["u", "v"])
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(edges, nodes, max_rounds=2)


def test_teleconnection_reference_cell_is_unit(spark, sf_dir):
    from mhw3d_detection_spark.queries.spatial import q_teleconnection

    out = {r["cell_id"]: r for r in q_teleconnection(spark, sf_dir).collect()}
    # the reference cell correlates perfectly with itself
    assert out[0]["r"] == pytest.approx(1.0, abs=1e-4)
    # every cell present, with full day coverage and r in [-1, 1]
    for r in out.values():
        assert r["n_days"] > 0 and -1.0 <= r["r"] <= 1.0


class TestRegridCoarsen:
    def test_weighted_block_mean_and_null_bookkeeping(self, spark):
        import datetime as dt
        import math

        from mhw3d_detection_spark.operators.spatial import regrid_coarsen

        day = dt.date(2020, 1, 1)
        # width 5 -> cells 0..4 are y=0, 5..9 y=1; factor 2 blocks:
        # coarse_x 0 <- x{0,1}, 1 <- x{2,3}, 2 <- x{4}
        rows = [(c, day, float(10 + c)) for c in range(10)]
        rows[3] = (3, day, None)  # NULL in block (0,1)
        df = spark.createDataFrame(rows, "cell_id int, time date, temp double")
        out = {
            (r["coarse_y"], r["coarse_x"]): r
            for r in regrid_coarsen(df, factor=2, width=5).collect()
        }
        w0 = math.cos(math.radians(-60.0))
        w1 = math.cos(math.radians(-55.0))
        # factor 2 folds y in {0,1} into coarse_y 0, x in {0,1} into
        # coarse_x 0: block (0,0) = cells {0,1,5,6}, area-weighted by
        # each cell's OWN latitude (the conservative regrid property)
        want00 = (w0 * (10.0 + 11.0) + w1 * (15.0 + 16.0)) / (2 * w0 + 2 * w1)
        assert abs(out[(0, 0)]["w_mean_temp"] - want00) < 1e-12
        assert out[(0, 0)]["n_cells"] == 4 and out[(0, 0)]["n_valid"] == 4
        # block (0,1) = cells {2,3,7,8}; cell 3 NULL leaves num AND den
        want01 = (w0 * 12.0 + w1 * (17.0 + 18.0)) / (w0 + 2 * w1)
        assert abs(out[(0, 1)]["w_mean_temp"] - want01) < 1e-12
        assert out[(0, 1)]["n_cells"] == 4 and out[(0, 1)]["n_valid"] == 3
        # block (0,2) = cells {4,9} (the ragged right edge)
        want02 = (w0 * 14.0 + w1 * 19.0) / (w0 + w1)
        assert abs(out[(0, 2)]["w_mean_temp"] - want02) < 1e-12
        assert (1, 0) not in out  # no coarse_y 1 on this 2-row grid

    def test_all_null_block_day(self, spark):
        import datetime as dt

        from mhw3d_detection_spark.operators.spatial import regrid_coarsen

        day = dt.date(2020, 1, 1)
        df = spark.createDataFrame(
            [(0, day, None), (1, day, None)],
            "cell_id int, time date, temp double",
        )
        r = regrid_coarsen(df, factor=2, width=5).collect()[0]
        assert r["n_valid"] == 0 and r["w_mean_temp"] is None

"""Spatial analytics over the long-format grid — the "3D" in the
reference's name (time x lat x lon), expressed Spark-first.

The reference detects events independently per grid cell (the gufunc is
vectorized over cells, ``common/core.py:167-176``) and states a global
one-pass OISST goal (``docs/MHW_code_Design_Document.docx`` Project
Goals §1/§3), but it has no cross-cell operators. This module adds the
two spatial surfaces a gridded-ocean user reaches for next:

- **Area-weighted regional statistics** (:func:`area_weighted_daily`):
  per-day regional coverage and means weighted by cos(latitude) — the
  standard equal-area correction for a regular lat/lon grid. A pure
  one-pass hash aggregate keyed by day: the weight is a projection, the
  reduce is map-side-combined, and the output is |days| rows however
  many cells the grid has. At 100 TB this is THE regional-summary shape
  (shuffle carries only (day, partial-sums)).

- **Spatially coherent 3-D event objects** (:func:`spatial_events_3d`):
  merge per-cell events that overlap in time across spatially adjacent
  cells into connected objects, the standard methodology for tracking
  coherent marine heatwaves as (time, lat, lon) volumes in the recent
  literature (per-cell detection first, then spatial merging of
  temporally-overlapping neighbours). Built in three scale-safe steps:

  1. **Edges**: each event explodes to its right/down neighbour cells
     (2 rows per event — the 4-neighbourhood is covered because the
     component graph is symmetrized) and equi-joins back to the events
     of that neighbour cell with an interval-overlap predicate. The
     join key is the neighbour cell id, so the shuffle is events-sized
     (events ≪ series) and the per-key match set is bounded by events
     per cell (itself bounded by days / min_duration).
  2. **Connected components** (:func:`connected_components`): min-label
     propagation with POINTER DOUBLING — each round a vertex takes the
     min of its own label, its neighbours' labels, and its label's
     label (one extra self-join). Doubling collapses a path of length d
     in O(log d) rounds instead of O(d), which matters because spatial
     chains across a basin can be hundreds of cells long. The loop runs
     on the driver but every round is one events-sized shuffle; rounds
     persist their (small) label frontier and the loop exits on a
     converged round (count of changed labels == 0 — an O(vertices)
     action per round, the textbook distributed-CC pattern).
  3. **Object metrics**: one hash aggregate per component.

All cell -> (row, col) geometry is derived from the cell id by a fixed
grid width, mirroring how the driver's synthetic tables encode cells;
with real data the lat/lon columns take the place of the derived ones.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

__all__ = [
    "grid_coords",
    "area_weighted_daily",
    "event_adjacency_edges",
    "connected_components",
    "spatial_events_3d",
    "regrid_coarsen",
]

#: node ids pack (cell_id, event_id) into one BIGINT; event_id is a
#: per-cell row_number so 1e6 is unreachable (events/cell <= days).
_NODE_STRIDE = 1_000_000


def grid_coords(
    df: DataFrame,
    *,
    cell_col: str = "cell_id",
    width: int = 5,
    lat0: float = -60.0,
    dlat: float = 5.0,
) -> DataFrame:
    """Attach grid geometry derived from the integer cell id: row
    ``y = cell // width``, column ``x = cell % width``, and a synthetic
    latitude ``lat = lat0 + dlat * y`` (real data would carry lat/lon
    columns already; every downstream operator only reads y/x/lat)."""
    y = F.floor(F.col(cell_col) / width).cast("int")
    x = (F.col(cell_col) % width).cast("int")
    return df.withColumn("y", y).withColumn("x", x).withColumn(
        "lat", F.lit(float(lat0)) + F.lit(float(dlat)) * F.col("y")
    )


def area_weighted_daily(
    fl: DataFrame,
    *,
    time_col: str = "time",
    temp_col: str = "temp",
    flag_col: str = "exceed",
    width: int = 5,
) -> DataFrame:
    """Per-day regional summary with cos(latitude) area weights.

    Output one row per day: cells present, active-cell count, the
    area-weighted fraction of the region in an exceedance state, and
    the area-weighted mean temperature. cos(lat) is the exact relative
    area of a regular lat/lon cell; the whole thing is one hash
    aggregate after a weight projection (no window, no join)."""
    g = grid_coords(fl, width=width)
    w = F.cos(F.radians(F.col("lat")))
    act = F.col(flag_col).cast("double")
    return (
        g.select(
            F.col(time_col).alias("time"),
            w.alias("__w"),
            (w * act).alias("__wa"),
            (w * F.col(temp_col)).alias("__wt"),
            act.alias("__a"),
        )
        .groupBy("time")
        .agg(
            F.count(F.lit(1)).alias("n_cells"),
            F.sum("__a").cast("bigint").alias("n_active"),
            (F.sum("__wa") / F.sum("__w")).alias("area_frac_active"),
            (F.sum("__wt") / F.sum("__w")).alias("w_mean_temp"),
        )
    )


def event_adjacency_edges(
    events: DataFrame,
    *,
    cell_col: str = "cell_id",
    width: int = 5,
) -> DataFrame:
    """Edges (u, v) between temporally-overlapping events in 4-adjacent
    grid cells, as packed BIGINT node ids.

    Each event emits candidate rows only toward its right and down
    neighbours (dedup for free — the reverse direction is supplied by
    the symmetrization inside :func:`connected_components`), then
    equi-joins on the neighbour's cell id with the standard closed
    interval-overlap predicate. Off-grid columns are filtered before
    the join; off-grid rows (y+1 past the last row) simply match no
    events."""
    g = grid_coords(events, cell_col=cell_col, width=width)
    node = (F.col(cell_col) * _NODE_STRIDE + F.col("event_id")).alias("u")
    probes = (
        g.select(
            node,
            "date_start",
            "date_end",
            F.explode(
                F.array(
                    F.struct(
                        F.col("y").alias("ny"), (F.col("x") + 1).alias("nx")
                    ),
                    F.struct(
                        (F.col("y") + 1).alias("ny"), F.col("x").alias("nx")
                    ),
                )
            ).alias("nb"),
        )
        .filter((F.col("nb.nx") >= 0) & (F.col("nb.nx") < width))
        .withColumn("nb_cell", (F.col("nb.ny") * width + F.col("nb.nx")).cast("long"))
    )
    right = events.select(
        F.col(cell_col).alias("nb_cell"),
        (F.col(cell_col) * _NODE_STRIDE + F.col("event_id")).alias("v"),
        F.col("date_start").alias("b_start"),
        F.col("date_end").alias("b_end"),
    )
    return (
        probes.join(right, "nb_cell")
        .filter(
            (F.col("date_start") <= F.col("b_end"))
            & (F.col("b_start") <= F.col("date_end"))
        )
        .select("u", "v")
    )


def connected_components(
    edges: DataFrame,
    nodes: DataFrame,
    *,
    node_col: str = "u",
    max_rounds: int = 16,
) -> DataFrame:
    """Connected components by min-label propagation with pointer
    doubling; returns (node, component) where component is the min node
    id of the component.

    Each round unions three label sources — current labels, neighbour
    labels (edge join), and label-of-label (self join, the doubling
    shortcut) — and takes the per-vertex min. Doubling makes rounds
    O(log diameter); the loop exits early on a converged round. Both
    joins shuffle only the label frontier (O(V)) and the symmetric edge
    list (O(E)); nothing series-sized is touched. ``max_rounds`` is a
    runaway bound, not the convergence mechanism (log2 of any real
    component diameter is far below it)."""
    # localCheckpoint (not persist): every round references the previous
    # labels THREE times (self, neighbour join, doubling join), so plan
    # lineage grows ~4^rounds without truncation — checkpointing swaps
    # the materialized partitions in as a fresh leaf each round. On a
    # fault-tolerant cluster run, swap for .checkpoint() against a
    # reliable checkpoint dir (same plan, durable storage).
    #
    # Loop-scoped conf: by default Spark materializes cached/
    # checkpointed plans WITHOUT AQE re-planning, so every round's
    # label frontier (an events-sized frame) would run at the session's
    # wide-start initialPartitionNum (1024 tasks/round; measured
    # 343 s -> 15 s at sf0.1 with AQE allowed). The set/restore
    # brackets this driver-side loop; anything another thread
    # materializes while the loop runs also sees the flag (session
    # confs are session-global — acceptable for the single-threaded
    # driver pattern this engine uses).
    spark = edges.sparkSession
    _KEY = "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning"
    try:
        _old = spark.conf.get(_KEY)
    except Exception:
        _old = None
    spark.conf.set(_KEY, "true")
    try:
        return _cc_loop(edges, nodes, node_col=node_col, max_rounds=max_rounds)
    finally:
        if _old is None:
            spark.conf.unset(_KEY)
        else:
            spark.conf.set(_KEY, _old)


def _cc_loop(
    edges: DataFrame,
    nodes: DataFrame,
    *,
    node_col: str,
    max_rounds: int,
) -> DataFrame:
    from mhw3d_detection_spark.plans.audit_hook import record

    sym0 = edges.select(F.col("u"), F.col("v")).unionByName(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    record("cc/sym_edges", sym0)
    sym = sym0.localCheckpoint()

    def checksum(lbl: DataFrame):
        # Labels are per-vertex min ids and only ever DECREASE, so an
        # unchanged sum <=> a converged round — one O(V) action per
        # round instead of a join + count. decimal(38,0) cannot
        # overflow at any vertex count.
        return lbl.agg(
            F.sum(F.col("label").cast("decimal(38,0)"))
        ).collect()[0][0]

    labels = (
        nodes.select(F.col(node_col).alias("v"))
        .distinct()
        .withColumn("label", F.col("v"))
        .localCheckpoint()
    )
    prev = checksum(labels)
    converged = False
    for _round in range(max_rounds):
        via_nb = (
            sym.alias("e")
            .join(labels.alias("l"), F.col("e.u") == F.col("l.v"))
            .select(F.col("e.v").alias("v"), F.col("l.label").alias("label"))
        )
        via_ptr = (
            labels.alias("a")
            .join(labels.alias("b"), F.col("a.label") == F.col("b.v"))
            .select(F.col("a.v").alias("v"), F.col("b.label").alias("label"))
        )
        nxt = (
            labels.unionByName(via_nb)
            .unionByName(via_ptr)
            .groupBy("v")
            .agg(F.min("label").alias("label"))
        )
        if _round == 0:
            # every round has this identical shape; record one
            record("cc/propagation_round", nxt)
        labels = nxt.localCheckpoint()
        chk = checksum(labels)
        if chk == prev:
            converged = True
            break
        prev = chk
    if not converged:
        # Returning partially-propagated labels would silently split
        # one component into several objects.
        raise RuntimeError(
            f"connected_components did not converge within {max_rounds} "
            "rounds; raise max_rounds (rounds needed ~ log2 of the "
            "largest component diameter)"
        )
    return labels.select(F.col("v").alias(node_col), F.col("label").alias("component"))


def spatial_events_3d(
    events: DataFrame,
    *,
    cell_col: str = "cell_id",
    width: int = 5,
    max_rounds: int = 16,
) -> DataFrame:
    """Merge per-cell events into spatially coherent 3-D objects and
    aggregate per-object metrics.

    Returns one row per object: packed min node id (``component``),
    member-event and distinct-cell counts, the object's overall time
    span, and summed/maximum member durations. The component id is
    deterministic (min of packed ids), so output is reproducible under
    any partitioning.

    Caveat: while the internal label-propagation loop runs, the
    SESSION-GLOBAL conf
    ``spark.sql.optimizer.canChangeCachedPlanOutputPartitioning`` is
    set to true (restored on exit — see :func:`connected_components`).
    A concurrent caller materializing a cached plan on another thread
    of the same session during that window inherits the flag; run this
    operator from the single-threaded driver pattern, or in its own
    session, if that matters to you."""
    events = events.persist()  # consumed by nodes, edges, and the final agg
    nodes = events.select(
        (F.col(cell_col) * _NODE_STRIDE + F.col("event_id")).alias("u"),
        F.col(cell_col).alias("cell_id"),
        "date_start",
        "date_end",
        "duration",
    )
    edges = event_adjacency_edges(events, cell_col=cell_col, width=width)
    comp = connected_components(edges, nodes, max_rounds=max_rounds)
    out = (
        nodes.join(comp, "u")
        .groupBy("component")
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_events"),
            F.countDistinct("cell_id").cast("int").alias("n_cells"),
            F.min("date_start").alias("date_start"),
            F.max("date_end").alias("date_end"),
            F.sum("duration").cast("bigint").alias("total_days"),
            F.max("duration").cast("int").alias("max_duration"),
        )
        # objects-sized: materialize eagerly so the events cache can be
        # released instead of leaking for the session lifetime
        .localCheckpoint()
    )
    events.unpersist()
    return out


def regrid_coarsen(
    ts: DataFrame,
    *,
    factor: int = 2,
    width: int = 5,
    time_col: str = "time",
    temp_col: str = "temp",
) -> DataFrame:
    """Conservative spatial regrid: pool the fine grid into
    ``factor x factor`` blocks (the OISST 0.25-deg -> 1-deg coarsening
    every gridded-ocean comparison starts with), area-weighting each
    fine cell by cos(latitude) — the weighted block mean IS the
    area-conserving first-order regrid for a regular lat/lon grid.

    ONE hash aggregate keyed (coarse_y, coarse_x, day) after a pure
    weight projection: the shuffle carries only per-block partial sums
    (map-side combined), output is |coarse cells| x |days| rows — the
    same single-aggregate shape as :func:`area_weighted_daily`, with
    the block id replacing the region. NULL temps drop out of both the
    numerator and the weight denominator (an all-NULL block-day emits
    NULL mean, n_valid = 0 — the strict-NaN bookkeeping downstream
    clim rules need).
    """
    g = grid_coords(ts, width=width)
    w = F.when(
        F.col(temp_col).isNotNull(), F.cos(F.radians(F.col("lat")))
    )
    return (
        g.select(
            F.floor(F.col("y") / factor).cast("int").alias("coarse_y"),
            F.floor(F.col("x") / factor).cast("int").alias("coarse_x"),
            F.col(time_col).alias("time"),
            w.alias("__w"),
            (w * F.col(temp_col)).alias("__wt"),
        )
        .groupBy("coarse_y", "coarse_x", "time")
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_cells"),
            F.count("__w").cast("int").alias("n_valid"),
            (F.sum("__wt") / F.sum("__w")).alias("w_mean_temp"),
        )
    )

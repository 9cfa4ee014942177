"""Spatial queries (SURVEY.md §2 rows SP1-SP2) — area-weighted regional
statistics and 3-D spatially coherent event objects over the
orders_daily grid (cells 0..9 laid out as a 2 x 5 lat/lon grid).

The DuckDB oracle for the 3-D objects computes connected components by
transitive closure with a recursive CTE (exact on test scale); the
Spark side uses pointer-doubled min-label propagation (the shape that
holds at 100 TB). Both must land on identical component sets — that
equivalence IS the differential test.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mhw3d_detection_spark.operators.spatial import (
    area_weighted_daily,
    spatial_events_3d,
)
from mhw3d_detection_spark.queries.base import (
    ORDERS_DAILY_SQL,
    orders_daily,
    register,
    rq,
    rq_sql,
)
from mhw3d_detection_spark.queries.detection import EV_SQL, FL_SQL, _events, _flagged

GRID_W = 5  # 10 cells -> 2 rows x 5 columns


# =========================================================================
# SP1 — cos(lat) area-weighted daily regional summary
# =========================================================================
_AW_SQL = (
    f"WITH {FL_SQL}, "
    f"g AS (SELECT time, temp, exceed, CAST(floor(cell_id / {GRID_W}.0) AS INT) AS y FROM fl), "
    "wt AS (SELECT time, temp, cos(radians(-60.0 + 5.0 * y)) AS w, "
    "  CASE WHEN exceed THEN 1.0 ELSE 0.0 END AS a FROM g) "
    "SELECT time, count(*) AS n_cells, CAST(sum(a) AS BIGINT) AS n_active, "
    f"  {rq_sql('sum(w * a) / sum(w)', 6)} AS area_frac_active, "
    f"  {rq_sql('sum(w * temp) / sum(w)', 4)} AS w_mean_temp "
    "FROM wt GROUP BY 1"
)


@register("q_area_weighted_stats", _AW_SQL)
def q_area_weighted_stats(spark, sf_dir):
    """SP1: per-day regional coverage and means with cos(latitude) area
    weights — the equal-area correction needed for the reference's
    global-OISST goal (docs/MHW_code_Design_Document.docx Project Goals
    §1; the reference itself has no cross-cell operator). One hash
    aggregate keyed by day; output is |days| rows at any grid size."""
    out = area_weighted_daily(_flagged(spark, sf_dir), width=GRID_W)
    return out.select(
        "time",
        "n_cells",
        "n_active",
        rq("area_frac_active", 6).alias("area_frac_active"),
        rq("w_mean_temp", 4).alias("w_mean_temp"),
    )


# =========================================================================
# SP2 — spatially coherent 3-D event objects (connected components)
# =========================================================================
_E3D_SQL = (
    f"WITH RECURSIVE {EV_SQL}, "
    "nodes AS (SELECT cell_id, event_id, date_start, date_end, duration, "
    "  cell_id * 1000000 + event_id AS v, "
    f"  CAST(floor(cell_id / {GRID_W}.0) AS INT) AS y, "
    f"  CAST(cell_id % {GRID_W} AS INT) AS x FROM ev), "
    "edges AS (SELECT a.v AS u, b.v AS v FROM nodes a JOIN nodes b "
    "  ON ((a.y = b.y AND b.x = a.x + 1) OR (a.x = b.x AND b.y = a.y + 1)) "
    "  AND a.date_start <= b.date_end AND b.date_start <= a.date_end), "
    "sym AS (SELECT u, v FROM edges UNION ALL SELECT v AS u, u AS v FROM edges), "
    "reach(v, lab) AS (SELECT v, v FROM nodes "
    "  UNION SELECT s.v, r.lab FROM sym s JOIN reach r ON r.v = s.u), "
    "comp AS (SELECT v, min(lab) AS component FROM reach GROUP BY v) "
    "SELECT c.component, CAST(count(*) AS INT) AS n_events, "
    "  CAST(count(DISTINCT n.cell_id) AS INT) AS n_cells, "
    "  min(n.date_start) AS date_start, max(n.date_end) AS date_end, "
    "  CAST(sum(n.duration) AS BIGINT) AS total_days, "
    "  CAST(max(n.duration) AS INT) AS max_duration "
    "FROM nodes n JOIN comp c ON n.v = c.v GROUP BY 1"
)


@register("q_events_3d", _E3D_SQL)
def q_events_3d(spark, sf_dir):
    """SP2: merge per-cell events that overlap in time across 4-adjacent
    grid cells into coherent 3-D heatwave objects (the standard 3-D MHW
    tracking methodology; the reference stops at per-cell events,
    common/core.py:167-176). Spark: events-sized neighbour equi-join +
    pointer-doubled distributed connected components; oracle: recursive
    transitive closure."""
    return spatial_events_3d(_events(spark, sf_dir), width=GRID_W)


# =========================================================================
# Beyond-reference, in-domain — trend of the annual area-weighted MHW
# coverage fraction (the "what fraction of the ocean is in a heatwave,
# and is it growing" global signal; cf. Oliver et al. 2018 Fig. 1)
# =========================================================================
_AAT_SQL = (
    f"WITH {FL_SQL}, "
    f"g AS (SELECT time, exceed, CAST(floor(cell_id / {GRID_W}.0) AS INT) AS y FROM fl), "
    "wt AS (SELECT time, cos(radians(-60.0 + 5.0 * y)) AS w, "
    "  CASE WHEN exceed THEN 1.0 ELSE 0.0 END AS a FROM g), "
    "daily AS (SELECT time, sum(w * a) / sum(w) AS frac FROM wt GROUP BY 1), "
    "yearly AS (SELECT CAST(year(time) AS INT) AS year, avg(frac) AS frac "
    "  FROM daily GROUP BY 1) "
    "SELECT CAST(count(*) AS INT) AS n_years, "
    f"{rq_sql('avg(frac)', 6)} AS frac_mean, "
    f"{rq_sql('regr_slope(frac, year)', 6)} AS frac_trend "
    "FROM yearly"
)


@register("q_annual_area_trend", _AAT_SQL)
def q_annual_area_trend(spark, sf_dir):
    """Beyond-reference, in-domain: the yearly mean of the daily
    cos(lat)-area-weighted exceedance fraction, and its OLS trend over
    the record — the single-number "is MHW coverage expanding" signal
    built on SP1's daily summary.

    Scale: daily summary is one hash agg (|days| rows at any grid
    size); the yearly rollup and the one-row trend agg are |days| and
    |years|-sized. The final aggregate is a global (single-group) agg
    over |years| rows — tiny by construction, not a scale risk."""
    daily = area_weighted_daily(_flagged(spark, sf_dir), width=GRID_W)
    yearly = daily.groupBy(
        F.year("time").cast("int").alias("year")
    ).agg(F.avg("area_frac_active").alias("frac"))
    out = yearly.agg(
        F.count(F.lit(1)).cast("int").alias("n_years"),
        F.avg("frac").alias("__fm"),
        F.expr("regr_slope(frac, year)").alias("__ft"),
    )
    return out.select(
        "n_years",
        rq("__fm", 6).alias("frac_mean"),
        rq("__ft", 6).alias("frac_trend"),
    )


# =========================================================================
# SP5 — teleconnection correlation map (r7)
# =========================================================================
@register(
    "q_teleconnection",
    f"WITH {FL_SQL}, "
    "an AS (SELECT cell_id, time, temp - seas AS anom FROM fl), "
    "refc AS (SELECT time, anom AS ref_anom FROM an WHERE cell_id = 0) "
    "SELECT an.cell_id, CAST(count(*) AS BIGINT) AS n_days, "
    f"{rq_sql('corr(an.anom, refc.ref_anom)', 4)} AS r "
    "FROM an JOIN refc ON an.time = refc.time GROUP BY 1",
)
def q_teleconnection(spark, sf_dir):
    """SP5 (r7): teleconnection correlation map — each cell's daily
    temperature-anomaly correlation with a reference cell (the
    ENSO-index pattern of climate analysis: correlate the field
    against one index series to map remote covariability). The
    reference series is a |days|-row broadcast dim; the map is ONE
    day-keyed equi-join + a per-cell corr aggregate — output is
    |cells| rows at any grid size, and nothing ever shuffles the full
    field twice. Pearson corr is the engines' shared sample
    definition; rq4 absorbs summation-order noise."""
    fl = _flagged(spark, sf_dir)
    an = fl.select(
        "cell_id", "time", (F.col("temp") - F.col("seas")).alias("anom")
    )
    ref = an.filter(F.col("cell_id") == 0).select(
        "time", F.col("anom").alias("ref_anom")
    )
    return (
        an.join(F.broadcast(ref), "time")
        .groupBy("cell_id")
        .agg(
            F.count(F.lit(1)).alias("n_days"),
            rq(F.corr("anom", "ref_anom"), 4).alias("r"),
        )
    )


# =========================================================================
# SP6 (r7) — conservative spatial regrid (coarsen 2x2 blocks)
# =========================================================================
_REGRID_SQL = (
    "WITH od AS (SELECT o_custkey % 10 AS cell_id, CAST(o_orderdate AS DATE) AS time, "
    "  avg(o_totalprice) AS temp FROM orders GROUP BY 1, 2), "
    f"g AS (SELECT time, temp, CAST(floor(cell_id / {GRID_W}.0) AS INT) AS y, "
    f"  CAST(cell_id % {GRID_W} AS INT) AS x FROM od), "
    "wt AS (SELECT CAST(floor(y / 2.0) AS INT) AS coarse_y, "
    "  CAST(floor(x / 2.0) AS INT) AS coarse_x, time, "
    "  CASE WHEN temp IS NOT NULL THEN cos(radians(-60.0 + 5.0 * y)) END AS w, "
    "  CASE WHEN temp IS NOT NULL THEN cos(radians(-60.0 + 5.0 * y)) * temp END AS wt "
    "  FROM g) "
    "SELECT coarse_y, coarse_x, time, CAST(count(*) AS INT) AS n_cells, "
    "CAST(count(w) AS INT) AS n_valid, "
    f"{rq_sql('sum(wt) / sum(w)', 4)} AS w_mean_temp "
    "FROM wt GROUP BY 1, 2, 3"
)


@register("q_spatial_regrid", _REGRID_SQL)
def q_spatial_regrid(spark, sf_dir):
    """SP6 (r7): conservative 2x2 coarsening of the fine grid —
    cos(lat)-weighted block means, the OISST 0.25-deg -> 1-deg regrid
    every cross-resolution comparison starts with. ONE hash aggregate
    keyed (coarse block, day); the shuffle carries only map-side
    partial sums; NULL temps leave both numerator and denominator
    (strict-NaN bookkeeping preserved for downstream clim rules)."""
    from mhw3d_detection_spark.operators.spatial import regrid_coarsen

    od = orders_daily(spark, sf_dir)
    out = regrid_coarsen(od, factor=2, width=GRID_W)
    return out.select(
        "coarse_y",
        "coarse_x",
        "time",
        "n_cells",
        "n_valid",
        rq("w_mean_temp", 4).alias("w_mean_temp"),
    )


# =========================================================================
# SP7 (r10) — Moran's I spatial autocorrelation of the cell-mean field
# =========================================================================
_MORAN_SQL = (
    f"WITH od AS ({ORDERS_DAILY_SQL}), "
    "cm AS (SELECT cell_id, "
    "  floor(avg(temp) * 1048576.0 + 0.5000152587890625) / 1048576.0 "
    "  AS m FROM od GROUP BY 1), "
    f"xy AS (SELECT cell_id, CAST(cell_id % {GRID_W} AS BIGINT) AS x, "
    f"  CAST(cell_id // {GRID_W} AS BIGINT) AS y, m FROM cm), "
    "mu AS (SELECT CAST(count(*) AS BIGINT) AS n, sum(m) / count(*) "
    "  AS mean FROM xy), "
    "z AS (SELECT x, y, m - mu.mean AS z FROM xy, mu), "
    "d AS (SELECT unnest([1, -1, 0, 0]) AS dx, "
    "  unnest([0, 0, 1, -1]) AS dy), "
    "e AS (SELECT a.z AS za, b.z AS zb FROM z a CROSS JOIN d "
    "  JOIN z b ON b.x = a.x + d.dx AND b.y = a.y + d.dy), "
    "s AS (SELECT CAST(count(*) AS BIGINT) AS w_pairs, "
    "  sum(floor(za * zb * 1048576.0 + 0.5000152587890625) / 1048576.0) "
    "  AS s_cross FROM e), "
    "sx AS (SELECT sum(floor(z * z * 1048576.0 + 0.5000152587890625) "
    "  / 1048576.0) AS s_xx FROM z) "
    "SELECT mu.n AS n_cells, s.w_pairs, "
    "CASE WHEN sx.s_xx > 0 AND s.w_pairs > 0 THEN "
    "  (CAST(mu.n AS DOUBLE) / s.w_pairs) * (s.s_cross / sx.s_xx) END "
    "  AS morans_i, "
    "CAST(-1.0 AS DOUBLE) / (mu.n - 1) AS expected_i "
    "FROM mu, s, sx"
)


@register("q_spatial_moran", _MORAN_SQL)
def q_spatial_moran(spark, sf_dir):
    """SP7 (r10): Moran's I spatial autocorrelation of the per-cell
    mean field over the rook-adjacent grid — THE spatial-coherence
    screen (I near +1 = smooth field, near the -1/(n-1) expectation =
    spatial noise; SP2's 3-D objects assume the former, this measures
    it). Plan: one corpus aggregate to cell means, neighbors via an
    EQUI-join on computed (x±1, y) / (x, y±1) coordinates — cells-
    sized, never a cross join over the grid. Cell means, cross
    products and squared deviations dyadic-quantized (2^-20) so every
    sum is order-free; the final ratio is exactly-rounded — RAW
    hash."""
    from mhw3d_detection_spark.operators.analysis import dyadic_quantize

    od = orders_daily(spark, sf_dir)
    cm = od.groupBy("cell_id").agg(
        dyadic_quantize(F.avg("temp"), 20).alias("m")
    )
    xy = cm.select(
        (F.col("cell_id") % GRID_W).cast("long").alias("x"),
        F.expr(f"div(cell_id, {GRID_W})").cast("long").alias("y"),
        "m",
    )
    mu = xy.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        (F.sum("m") / F.count(F.lit(1))).alias("mean"),
    )
    z = xy.crossJoin(F.broadcast(mu)).select(
        "x", "y", (F.col("m") - F.col("mean")).alias("z")
    )
    d = od.sparkSession.createDataFrame(
        [(1, 0), (-1, 0), (0, 1), (0, -1)], "dx long, dy long"
    )
    a = z.select(
        F.col("x").alias("ax"), F.col("y").alias("ay"),
        F.col("z").alias("za"),
    ).crossJoin(F.broadcast(d))
    b = z.select(
        F.col("x").alias("bx"), F.col("y").alias("by"),
        F.col("z").alias("zb"),
    )
    e = a.join(
        b,
        (F.col("bx") == F.col("ax") + F.col("dx"))
        & (F.col("by") == F.col("ay") + F.col("dy")),
    )
    s = e.agg(
        F.count(F.lit(1)).cast("long").alias("w_pairs"),
        F.sum(
            dyadic_quantize(F.col("za") * F.col("zb"), 20)
        ).alias("s_cross"),
    )
    sx = z.agg(
        F.sum(dyadic_quantize(F.col("z") * F.col("z"), 20)).alias("s_xx")
    )
    out = mu.crossJoin(F.broadcast(s)).crossJoin(F.broadcast(sx))
    mi = F.when(
        (F.col("s_xx") > 0) & (F.col("w_pairs") > 0),
        (F.col("n").cast("double") / F.col("w_pairs"))
        * (F.col("s_cross") / F.col("s_xx")),
    )
    return out.select(
        F.col("n").alias("n_cells"),
        "w_pairs",
        mi.alias("morans_i"),
        (F.lit(-1.0).cast("double") / (F.col("n") - 1)).alias(
            "expected_i"
        ),
    )

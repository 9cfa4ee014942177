"""Calendar / climatology / severity queries (SURVEY.md §2.3, §2.5
A1-A6, §2.6 W1/W10/W11, §2.7 O5, §2.4 J1, §2.2 P5).

Every query runs the engine operator on the driver's synthetic tables
and declares a DuckDB oracle that re-derives the same result in ANSI
SQL — the differential test the reference performs against its vendored
``marineHeatWaves.py`` (SURVEY §5), re-targeted at DuckDB.

Series used:
- ``orders_daily`` — multi-year (1995-2001, two leap years) daily series,
  the calendar-sensitive workhorse.
- ``daily_nulls``  — the events stream with measured-but-NULL days
  (§1.2 NaN-vs-NULL distinction) for strictness/interp/padding ops.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from mhw3d_detection_spark.functions.calendar import clim_doy, clim_doy_sql
from mhw3d_detection_spark.functions.scalar import from_ordinal, to_ordinal
from mhw3d_detection_spark.operators.analysis import (
    autocorrelation,
    cusum_changepoints,
    detrend_linear,
    detrend_poly,
    despike_mad,
    dyadic_quantize_sql,
    ewma_smooth,
    mean_trend_ols,
    pad_interpolate,
    trend_bootstrap_ci,
)
from mhw3d_detection_spark.operators.climatology import (
    clim_partials,
    densify_doy,
    finalize_clim_partials,
    interp_feb29,
    merge_clim_partials,
    pooled_climatology,
    simple_climatology,
    smooth_doy_circular,
)
from mhw3d_detection_spark.operators.detection import exceedance
from mhw3d_detection_spark.operators.severity import calculate_severity
from mhw3d_detection_spark.queries.base import (
    DAILY_NULLS_SQL,
    ORDERS_DAILY_SQL,
    register,
    rq,
    rq_sql,
)
from mhw3d_detection_spark.queries.base import daily_nulls, orders_daily

DOY = clim_doy_sql("time")
BASELINE = (1995, 2000)

# --- shared: the simple per-(cell, DOY) clim/thresh dim table ------------
# (A1-style: plain per-DOY mean + exact 90th percentile on the baseline
# years; the pooled variant has its own queries below)
SIMPLE_CLIM_SQL = (
    f"SELECT cell_id, {DOY} AS doy, avg(temp) AS seas, "
    f"quantile_cont(temp, 0.9) AS thresh FROM od "
    f"WHERE year(time) BETWEEN {BASELINE[0]} AND {BASELINE[1]} GROUP BY 1, 2"
)


def simple_clim_table(spark, sf_dir):
    od = orders_daily(spark, sf_dir)
    return (
        od.filter(F.year("time").between(*BASELINE))
        .groupBy("cell_id", clim_doy(F.col("time")).alias("doy"))
        .agg(
            F.avg("temp").alias("seas"),
            F.expr("percentile(temp, 0.9)").alias("thresh"),
        )
    )


# =========================================================================
# S1 — leap-normalized DOY calendar
# =========================================================================
@register(
    "q_clim_doy",
    f"WITH od AS ({ORDERS_DAILY_SQL}) "
    f"SELECT cell_id, time, CAST(dayofyear(time) AS INT) AS natural_doy, {DOY} AS doy "
    f"FROM od",
)
def q_clim_doy(spark, sf_dir):
    """S1: Mar 1 is always DOY 61, Dec 31 always 366; non-leap years
    shift natural DOY >= 60 by +1 (reference common/core.py:5-17)."""
    od = orders_daily(spark, sf_dir)
    return od.select(
        "cell_id",
        "time",
        F.dayofyear("time").alias("natural_doy"),
        clim_doy(F.col("time")).cast("int").alias("doy"),
    )


# =========================================================================
# S3 — proleptic-Gregorian ordinal round trip
# =========================================================================
@register(
    "q_ordinal_roundtrip",
    f"WITH od AS ({ORDERS_DAILY_SQL}) "
    "SELECT cell_id, time, "
    "CAST(date_diff('day', DATE '0001-01-01', time) + 1 AS INT) AS ord, "
    "DATE '0001-01-01' + CAST(date_diff('day', DATE '0001-01-01', time) AS INT) AS back "
    "FROM od",
)
def q_ordinal_roundtrip(spark, sf_dir):
    """S3: date.toordinal()/fromordinal round trip (reference
    marineHeatWaves.py:26,196 stores time as int ordinals)."""
    od = orders_daily(spark, sf_dir)
    return od.select(
        "cell_id",
        "time",
        to_ordinal(F.col("time")).cast("int").alias("ord"),
        from_ordinal(to_ordinal(F.col("time"))).alias("back"),
    )


# =========================================================================
# A1 + O5 — best-practice per-DOY mean, reindexed to the dense 1..366 axis
# =========================================================================
@register(
    "q_clim_groupby_mean",
    f"WITH od AS ({ORDERS_DAILY_SQL}), "
    f"clim AS (SELECT cell_id, {DOY} AS doy, avg(temp) AS seas FROM od "
    f"  WHERE year(time) BETWEEN {BASELINE[0]} AND {BASELINE[1]} GROUP BY 1, 2), "
    "spine AS (SELECT DISTINCT cell_id, g.d AS doy FROM clim, "
    "  (SELECT unnest(generate_series(1, 366)) AS d) g) "
    f"SELECT s.cell_id, CAST(s.doy AS INT) AS doy, {rq_sql('c.seas', 2)} AS seas "
    "FROM spine s LEFT JOIN clim c ON s.cell_id = c.cell_id AND s.doy = c.doy",
)
def q_clim_groupby_mean(spark, sf_dir):
    """A1: groupby('dayofyear').mean() then reindex 1..366 (reference
    best_practice/climatology.py:99-105)."""
    od = orders_daily(spark, sf_dir)
    clim = simple_climatology(od, baseline=BASELINE)
    return clim.select(
        "cell_id", F.col("doy").cast("int").alias("doy"), rq("seas", 2).alias("seas")
    )


# =========================================================================
# O5 — densify observable: per-cell row/NULL counts of the dense axis
# =========================================================================
@register(
    "q_reindex_dense_doy",
    f"WITH od AS ({ORDERS_DAILY_SQL}), "
    f"clim AS (SELECT cell_id, {DOY} AS doy, avg(temp) AS seas FROM od "
    f"  WHERE year(time) BETWEEN {BASELINE[0]} AND {BASELINE[1]} GROUP BY 1, 2), "
    "spine AS (SELECT DISTINCT cell_id, g.d AS doy FROM clim, "
    "  (SELECT unnest(generate_series(1, 366)) AS d) g), "
    "dense AS (SELECT s.cell_id, s.doy, c.seas FROM spine s "
    "  LEFT JOIN clim c ON s.cell_id = c.cell_id AND s.doy = c.doy) "
    "SELECT cell_id, count(*) AS n_rows, "
    "CAST(sum(CASE WHEN seas IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_missing "
    "FROM dense GROUP BY 1",
)
def q_reindex_dense_doy(spark, sf_dir):
    """O5: reindex(doy=1..366) materializes missing DOYs as NULL rows
    (reference legacy/climatology.py:79,92)."""
    od = orders_daily(spark, sf_dir)
    dense = densify_doy(
        simple_climatology(od, baseline=BASELINE).filter(F.col("seas").isNotNull())
    )
    return dense.groupBy("cell_id").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("seas").isNull().cast("int")).cast("long").alias("n_missing"),
    )


# =========================================================================
# A2 / A3 — pooled-window climatology & exact percentile threshold
# =========================================================================
#: the explode-and-group pool re-derived relationally for DuckDB: bucket
#: owners are baseline non-Feb-29 rows; every row within +/-5 *series
#: positions* contributes its temp to the owner's DOY bucket (reference
#: pooling is index-based: legacy/climatology.py:61-119,
#: marineHeatWaves.py:266-281).
POOL_SQL = (
    f"od AS ({ORDERS_DAILY_SQL}), "
    f"s AS (SELECT cell_id, time, temp, {DOY} AS doy, "
    "  row_number() OVER (PARTITION BY cell_id ORDER BY time) AS rn FROM od), "
    "pool AS (SELECT b.cell_id, b.doy, t.temp FROM s b "
    "  JOIN s t ON t.cell_id = b.cell_id AND t.rn BETWEEN b.rn - 5 AND b.rn + 5 "
    f"  WHERE b.doy <> 60 AND year(b.time) BETWEEN {BASELINE[0]} AND {BASELINE[1]})"
)


@register(
    "q_pooled_clim_mean",
    f"WITH {POOL_SQL} "
    f"SELECT cell_id, CAST(doy AS INT) AS doy, {rq_sql('avg(temp)', 2)} AS seas "
    "FROM pool GROUP BY 1, 2",
)
def q_pooled_clim_mean(spark, sf_dir):
    """A2: mean over all samples within the +/-5-position window of each
    baseline occurrence of a DOY (reference `_pool_window` + nanmean,
    legacy/climatology.py:61-119,167-176)."""
    od = orders_daily(spark, sf_dir)
    clim = pooled_climatology(
        od,
        baseline=BASELINE,
        smooth_width=None,
        feb29_interp=False,
        densify=False,
    )
    return clim.select(
        "cell_id", F.col("doy").cast("int").alias("doy"), rq("seas", 2).alias("seas")
    )


@register(
    "q_pooled_threshold_pctile",
    f"WITH {POOL_SQL} "
    "SELECT cell_id, CAST(doy AS INT) AS doy, "
    f"{rq_sql('quantile_cont(temp, 0.9)', 2)} AS thresh FROM pool GROUP BY 1, 2",
)
def q_pooled_threshold_pctile(spark, sf_dir):
    """A3: exact linear-interpolation 90th percentile over the same pool
    (reference nanquantile method='linear', legacy/climatology.py:225-240;
    Spark `percentile` — NOT approx — matches numpy 'linear')."""
    od = orders_daily(spark, sf_dir)
    clim = pooled_climatology(
        od,
        baseline=BASELINE,
        smooth_width=None,
        feb29_interp=False,
        densify=False,
    )
    return clim.select(
        "cell_id",
        F.col("doy").cast("int").alias("doy"),
        rq("thresh", 2).alias("thresh"),
    )


# =========================================================================
# A2/A3 grid mode — (year, doy)-grid pooling (legacy/climatology.py:61-119):
# the xarray legacy module's calendar-arithmetic semantics; the engine's
# windowless scale path (one shuffle of the big table, no per-cell sort)
# =========================================================================
GRID_POOL_SQL = (
    f"od AS ({ORDERS_DAILY_SQL}), "
    f"s AS (SELECT cell_id, time, temp, {DOY} AS d, year(time) AS y FROM od "
    f"  WHERE year(time) BETWEEN {BASELINE[0]} AND {BASELINE[1]}), "
    "pool AS (SELECT s.cell_id, ((s.d + o.o - 1 + 366) % 366) + 1 AS doy, s.temp "
    "  FROM s CROSS JOIN (SELECT unnest(generate_series(-5, 5)) AS o) o "
    "  WHERE (s.y + CASE WHEN s.d + o.o > 366 THEN 1 "
    "                    WHEN s.d + o.o < 1 THEN -1 ELSE 0 END) "
    f"        BETWEEN {BASELINE[0]} AND {BASELINE[1]} "
    "    AND ((s.d + o.o - 1 + 366) % 366) + 1 <> 60)"
)


@register(
    "q_pooled_grid_clim",
    f"WITH {GRID_POOL_SQL} "
    "SELECT cell_id, CAST(doy AS INT) AS doy, "
    f"{rq_sql('avg(temp)', 2)} AS seas, "
    f"{rq_sql('quantile_cont(temp, 0.9)', 2)} AS thresh "
    "FROM pool GROUP BY 1, 2",
)
def q_pooled_grid_clim(spark, sf_dir):
    """A2+A3 in (year, doy)-grid mode: each baseline sample contributes
    to the +/-5 DOY buckets with cross-year wrap into adjacent baseline
    years (reference legacy/climatology.py:61-119 `_pool_window` +
    `_build_cross_year_pad`:24-58). Pure explode+filter+group — no
    window sort of the input (the scale path)."""
    od = orders_daily(spark, sf_dir)
    clim = pooled_climatology(
        od,
        baseline=BASELINE,
        smooth_width=None,
        feb29_interp=False,
        densify=False,
        pool_mode="grid",
    )
    return clim.select(
        "cell_id",
        F.col("doy").cast("int").alias("doy"),
        rq("seas", 2).alias("seas"),
        rq("thresh", 2).alias("thresh"),
    )


# =========================================================================
# A4 — strict skipna=False: any measured-but-NULL sample poisons the pool
# =========================================================================
@register(
    "q_threshold_strict_nan",
    f"WITH dn AS ({DAILY_NULLS_SQL}), "
    f"s AS (SELECT cell_id, time, temp, {DOY} AS doy, "
    "  row_number() OVER (PARTITION BY cell_id ORDER BY time) AS rn FROM dn), "
    "pool AS (SELECT b.cell_id, b.doy, t.temp FROM s b "
    "  JOIN s t ON t.cell_id = b.cell_id AND t.rn BETWEEN b.rn - 2 AND b.rn + 2 "
    "  WHERE b.doy <> 60), "
    "agg AS (SELECT cell_id, doy, avg(temp) AS seas, "
    "  quantile_cont(temp, 0.9) AS thresh, "
    "  max(CASE WHEN temp IS NULL THEN 1 ELSE 0 END) AS has_null "
    "  FROM pool GROUP BY 1, 2) "
    "SELECT cell_id, CAST(doy AS INT) AS doy, "
    f"{rq_sql('CASE WHEN has_null = 0 THEN seas END', 4)} AS seas, "
    f"{rq_sql('CASE WHEN has_null = 0 THEN thresh END', 4)} AS thresh FROM agg",
)
def q_threshold_strict_nan(spark, sf_dir):
    """A4: the xarray port's skipna=False contract — a NULL temp anywhere
    in the pool nullifies the bucket (reference presence map,
    legacy/climatology.py:84-95,243-252)."""
    dn = daily_nulls(spark, sf_dir)
    clim = pooled_climatology(
        dn,
        window_half_width=2,
        strict_nan=True,
        smooth_width=None,
        feb29_interp=False,
        densify=False,
    )
    return clim.select(
        "cell_id",
        F.col("doy").cast("int").alias("doy"),
        rq("seas", 4).alias("seas"),
        rq("thresh", 4).alias("thresh"),
    )


# =========================================================================
# A6 — Feb 29 interpolation on the dense axis
# =========================================================================
@register(
    "q_feb29_interp",
    f"WITH od AS ({ORDERS_DAILY_SQL}), "
    f"clim AS ({SIMPLE_CLIM_SQL}), "
    "spine AS (SELECT DISTINCT cell_id, g.d AS doy FROM clim, "
    "  (SELECT unnest(generate_series(1, 366)) AS d) g), "
    "dense AS (SELECT s.cell_id, s.doy, c.seas, c.thresh FROM spine s "
    "  LEFT JOIN clim c ON s.cell_id = c.cell_id AND s.doy = c.doy), "
    "nb AS (SELECT cell_id, "
    "  0.5 * max(CASE WHEN doy = 59 THEN seas END) "
    "    + 0.5 * max(CASE WHEN doy = 61 THEN seas END) AS f29_seas, "
    "  0.5 * max(CASE WHEN doy = 59 THEN thresh END) "
    "    + 0.5 * max(CASE WHEN doy = 61 THEN thresh END) AS f29_thresh "
    "  FROM dense WHERE doy IN (59, 61) GROUP BY 1) "
    "SELECT d.cell_id, CAST(d.doy AS INT) AS doy, "
    f"{rq_sql('CASE WHEN d.doy = 60 THEN nb.f29_seas ELSE d.seas END', 2)} AS seas, "
    f"{rq_sql('CASE WHEN d.doy = 60 THEN nb.f29_thresh ELSE d.thresh END', 2)} AS thresh "
    "FROM dense d LEFT JOIN nb ON d.cell_id = nb.cell_id "
    "WHERE d.doy BETWEEN 58 AND 62",
)
def q_feb29_interp(spark, sf_dir):
    """A6: clim/thresh at DOY 60 := mean of DOY 59 and 61 (reference
    `_interp_feb29` legacy/climatology.py:13-21;
    marineHeatWaves.py:282-284)."""
    clim = densify_doy(simple_clim_table(spark, sf_dir))
    out = interp_feb29(clim)
    return out.filter(F.col("doy").between(58, 62)).select(
        "cell_id",
        F.col("doy").cast("int").alias("doy"),
        rq("seas", 2).alias("seas"),
        rq("thresh", 2).alias("thresh"),
    )


# =========================================================================
# W1 — 31-day circular running-mean smoother over the dense DOY axis
# =========================================================================
@register(
    "q_circular_smooth_31d",
    f"WITH od AS ({ORDERS_DAILY_SQL}), "
    f"clim AS ({SIMPLE_CLIM_SQL}), "
    "spine AS (SELECT DISTINCT cell_id, g.d AS doy FROM clim, "
    "  (SELECT unnest(generate_series(1, 366)) AS d) g), "
    "dense AS (SELECT s.cell_id, s.doy, c.seas FROM spine s "
    "  LEFT JOIN clim c ON s.cell_id = c.cell_id AND s.doy = c.doy), "
    "copies AS (SELECT cell_id, doy, seas, doy + 366 * o.o AS pos FROM dense, "
    "  (SELECT unnest([-1, 0, 1]) AS o) o), "
    "sm AS (SELECT cell_id, doy, pos, avg(seas) OVER w AS s_avg, "
    "  sum(CASE WHEN seas IS NULL THEN 1 ELSE 0 END) OVER w AS n_null "
    "  FROM copies WINDOW w AS (PARTITION BY cell_id ORDER BY pos "
    "  ROWS BETWEEN 15 PRECEDING AND 15 FOLLOWING)) "
    "SELECT cell_id, CAST(doy AS INT) AS doy, "
    f"{rq_sql('CASE WHEN n_null = 0 THEN s_avg END', 2)} AS seas "
    "FROM sm WHERE pos BETWEEN 1 AND 366",
)
def q_circular_smooth_31d(spark, sf_dir):
    """W1: centered width-31 running mean over DOY, circular across the
    year boundary; NULL (NaN) entries poison the window like the
    reference's fixed-divisor convolution (reference `runavg`
    marineHeatWaves.py:858-885; legacy/climatology.py:122-138)."""
    od = orders_daily(spark, sf_dir)
    clim = densify_doy(simple_climatology(od, baseline=BASELINE))
    sm = smooth_doy_circular(clim, value_cols=("seas",), width=31, mode="full")
    return sm.select(
        "cell_id", F.col("doy").cast("int").alias("doy"), rq("seas", 2).alias("seas")
    )


# =========================================================================
# M3 — 360-day (`Ly`) calendar: compressed-circular smoothing over only
# the DOYs that exist, in their own sequence (reference
# marineHeatWaves.py:114-116,288-293: sub-366-day calendars smooth the
# length-Ly axis circularly, NOT a dense 366-slot axis)
# =========================================================================
@register(
    "q_clim_360day",
    f"WITH od AS ({ORDERS_DAILY_SQL}), "
    f"f AS (SELECT * FROM od WHERE {DOY} <= 360), "
    f"clim AS (SELECT cell_id, {DOY} AS doy, avg(temp) AS seas FROM f "
    f"  WHERE year(time) BETWEEN {BASELINE[0]} AND {BASELINE[1]} GROUP BY 1, 2), "
    "pos AS (SELECT *, row_number() OVER (PARTITION BY cell_id ORDER BY doy) AS p, "
    "  count(*) OVER (PARTITION BY cell_id) AS n FROM clim), "
    "copies AS (SELECT cell_id, doy, seas, n, p + n * o.o AS pos FROM pos, "
    "  (SELECT unnest([-1, 0, 1]) AS o) o), "
    "sm AS (SELECT cell_id, doy, pos, n, avg(seas) OVER w AS sa "
    "  FROM copies WINDOW w AS (PARTITION BY cell_id ORDER BY pos "
    "  ROWS BETWEEN 15 PRECEDING AND 15 FOLLOWING)) "
    f"SELECT cell_id, CAST(doy AS INT) AS doy, {rq_sql('sa', 2)} AS seas "
    "FROM sm WHERE pos BETWEEN 1 AND n",
)
def q_clim_360day(spark, sf_dir):
    """M3: a sub-366-DOY series (DOYs 1..360 — the 360-day model
    calendar shape) smoothed with mode="valid": width-31 circular
    running mean over the COMPRESSED sequence of existing DOYs, so the
    wrap joins DOY 360 back to DOY 1 with no phantom dense slots
    (reference marineHeatWaves.py:114-116,288-293; engine
    operators/climatology.py smooth_doy_circular mode="valid")."""
    od = orders_daily(spark, sf_dir)
    sub = od.filter(clim_doy(F.col("time")) <= 360)
    clim = (
        sub.filter(F.year("time").between(*BASELINE))
        .groupBy("cell_id", clim_doy(F.col("time")).alias("doy"))
        .agg(F.avg("temp").alias("seas"))
    )
    sm = smooth_doy_circular(clim, value_cols=("seas",), width=31, mode="valid")
    return sm.select(
        "cell_id", F.col("doy").cast("int").alias("doy"), rq("seas", 2).alias("seas")
    )


# =========================================================================
# J1 — broadcast climatology lookup join
# =========================================================================
@register(
    "q_clim_lookup_join",
    f"WITH od AS ({ORDERS_DAILY_SQL}), "
    f"clim AS ({SIMPLE_CLIM_SQL}) "
    f"SELECT od.cell_id, od.time, {rq_sql('od.temp', 2)} AS temp, "
    f"{rq_sql('clim.seas', 2)} AS seas, {rq_sql('clim.thresh', 2)} AS thresh "
    f"FROM od LEFT JOIN clim ON od.cell_id = clim.cell_id AND {DOY} = clim.doy",
)
def q_clim_lookup_join(spark, sf_dir):
    """J1: expand the 366-row clim dim to the full series — a broadcast
    equi-join on (cell, doy) (reference `seas.sel(dayofyear=cdoy)`
    common/core.py:217-219; Oliver fancy-index marineHeatWaves.py:300-301)."""
    od = orders_daily(spark, sf_dir)
    clim = simple_clim_table(spark, sf_dir)
    joined = od.withColumn("doy", clim_doy(F.col("time"))).join(
        F.broadcast(clim), ["cell_id", "doy"], "left"
    )
    return joined.select(
        "cell_id",
        "time",
        rq("temp", 2).alias("temp"),
        rq("seas", 2).alias("seas"),
        rq("thresh", 2).alias("thresh"),
    )


# =========================================================================
# S5 — severity projection (best-practice guarded divide)
# =========================================================================
@register(
    "q_severity",
    f"WITH od AS ({ORDERS_DAILY_SQL}), "
    f"clim AS ({SIMPLE_CLIM_SQL}) "
    f"SELECT od.cell_id, od.time, {rq_sql('od.temp - clim.seas', 2)} AS t_anom, "
    + rq_sql(
        "CASE WHEN clim.thresh - clim.seas > 1e-9 "
        "THEN (od.temp - clim.seas) / (clim.thresh - clim.seas) END",
        4,
    )
    + " AS severity "
    f"FROM od LEFT JOIN clim ON od.cell_id = clim.cell_id AND {DOY} = clim.doy",
)
def q_severity(spark, sf_dir):
    """S5: severity = T_anom / (thresh - seas), best-practice guarded
    divide (NULL where denom <= eps; reference mandate CLAUDE.md:83-86;
    legacy +1e-9 variant is covered by the golden fixture tests)."""
    od = orders_daily(spark, sf_dir)
    clim = simple_clim_table(spark, sf_dir)
    sev = calculate_severity(od, clim, mode="best_practice")
    return sev.select(
        "cell_id",
        "time",
        rq("t_anom", 2).alias("t_anom"),
        rq("severity", 4).alias("severity"),
    )


# =========================================================================
# M2 — alternate climatology source: clim built from a DIFFERENT series
# than the one scored (marineHeatWaves.py:107-113,222-242) — free in
# relational form: clim from subseries B, left-joined to series A
# =========================================================================
@register(
    "q_alt_clim_source",
    f"WITH od AS ({ORDERS_DAILY_SQL}), "
    f"alt AS (SELECT * FROM od WHERE year(time) BETWEEN 1995 AND 1996), "
    f"clim AS (SELECT cell_id, {DOY} AS doy, avg(temp) AS seas, "
    "  quantile_cont(temp, 0.9) AS thresh FROM alt GROUP BY 1, 2) "
    f"SELECT od.cell_id, od.time, {rq_sql('od.temp - clim.seas', 2)} AS t_anom, "
    + rq_sql(
        "CASE WHEN clim.thresh - clim.seas > 1e-9 "
        "THEN (od.temp - clim.seas) / (clim.thresh - clim.seas) END",
        4,
    )
    + " AS severity "
    f"FROM od LEFT JOIN clim ON od.cell_id = clim.cell_id AND {DOY} = clim.doy "
    "WHERE year(od.time) >= 1998",
)
def q_alt_clim_source(spark, sf_dir):
    """M2: climatology from the 1995-96 subseries scores the 1998+
    rows — the alternateClimatology mode (marineHeatWaves.py:107-113)
    as a clim-from-B-joined-to-A relational plan."""
    od = orders_daily(spark, sf_dir)
    alt = od.filter(F.year("time").between(1995, 1996))
    clim = (
        alt.groupBy("cell_id", clim_doy(F.col("time")).alias("doy"))
        .agg(
            F.avg("temp").alias("seas"),
            F.expr("percentile(temp, 0.9)").alias("thresh"),
        )
    )
    sev = calculate_severity(
        od.filter(F.year("time") >= 1998), clim, mode="best_practice"
    )
    return sev.select(
        "cell_id",
        "time",
        rq("t_anom", 2).alias("t_anom"),
        rq("severity", 4).alias("severity"),
    )


# =========================================================================
# P5 + M4 — exceedance predicate with missing→climatology fill
# =========================================================================
@register(
    "q_exceedance_flag",
    f"WITH dn AS ({DAILY_NULLS_SQL}), "
    "thr AS (SELECT cell_id, quantile_cont(temp, 0.75) AS thresh, avg(temp) AS seas "
    "  FROM dn GROUP BY 1) "
    "SELECT dn.cell_id, dn.time, dn.temp IS NULL AS was_missing, "
    "coalesce(coalesce(dn.temp, thr.seas) > thr.thresh, false) AS exceed, "
    f"{rq_sql('coalesce(dn.temp, thr.seas)', 4)} AS temp "
    "FROM dn JOIN thr ON dn.cell_id = thr.cell_id",
)
def q_exceedance_flag(spark, sf_dir):
    """P5+M4: exceed = temp > thresh with NULL->false; missing temps
    filled with the climatology so gaps terminate events, keeping a
    was_missing flag (reference marineHeatWaves.py:303-317)."""
    dn = daily_nulls(spark, sf_dir)
    thr = dn.groupBy("cell_id").agg(
        F.expr("percentile(temp, 0.75)").alias("thresh"),
        F.avg("temp").alias("seas"),
    )
    flagged = exceedance(dn.join(F.broadcast(thr), ["cell_id"]))
    return flagged.select(
        "cell_id",
        "time",
        "was_missing",
        "exceed",
        rq("temp", 4).alias("temp"),
    )


# =========================================================================
# S6 — category label ladder
# =========================================================================
@register(
    "q_category_label",
    f"WITH od AS ({ORDERS_DAILY_SQL}), "
    f"clim AS ({SIMPLE_CLIM_SQL}), "
    "j AS (SELECT od.cell_id, od.time, "
    "  floor(1.0 + (od.temp - clim.thresh) / (clim.thresh - clim.seas)) AS band "
    f"  FROM od JOIN clim ON od.cell_id = clim.cell_id AND {DOY} = clim.doy "
    "  WHERE clim.thresh - clim.seas > 1e-9 AND od.temp > clim.thresh) "
    "SELECT cell_id, time, CAST(least(band, 4) AS INT) AS band, "
    "CASE least(band, 4) WHEN 1 THEN 'Moderate' WHEN 2 THEN 'Strong' "
    "WHEN 3 THEN 'Severe' ELSE 'Extreme' END AS category FROM j",
)
def q_category_label(spark, sf_dir):
    """S6: band = floor(1 + relThreshNorm) capped at 4 ->
    Moderate/Strong/Severe/Extreme (reference marineHeatWaves.py:386-392)."""
    od = orders_daily(spark, sf_dir)
    clim = simple_clim_table(spark, sf_dir)
    j = (
        od.withColumn("doy", clim_doy(F.col("time")))
        .join(F.broadcast(clim), ["cell_id", "doy"])
        .filter(
            ((F.col("thresh") - F.col("seas")) > 1e-9)
            & (F.col("temp") > F.col("thresh"))
        )
        .withColumn(
            "band",
            F.least(
                F.floor(
                    F.lit(1.0)
                    + (F.col("temp") - F.col("thresh"))
                    / (F.col("thresh") - F.col("seas"))
                ),
                F.lit(4),
            ).cast("int"),
        )
    )
    label = F.element_at(
        F.array(F.lit("Moderate"), F.lit("Strong"), F.lit("Severe"), F.lit("Extreme")),
        F.col("band"),
    )
    return j.select("cell_id", "time", "band", label.alias("category"))


# =========================================================================
# S7 — linear interpolation over NULL gaps (pad)
# =========================================================================
@register(
    "q_pad_interpolate",
    f"WITH dn AS ({DAILY_NULLS_SQL}), "
    "s AS (SELECT cell_id, time, temp, "
    "  row_number() OVER w AS rn, count(*) OVER (PARTITION BY cell_id) AS n, "
    "  max(CASE WHEN temp IS NOT NULL THEN rn0 END) OVER wb AS prev_rn, "
    "  min(CASE WHEN temp IS NOT NULL THEN rn0 END) OVER wf AS next_rn, "
    "  last_value(temp IGNORE NULLS) OVER wb AS prev_val, "
    "  first_value(temp IGNORE NULLS) OVER wf AS next_val "
    "  FROM (SELECT *, row_number() OVER (PARTITION BY cell_id ORDER BY time) AS rn0 FROM dn) "
    "  WINDOW w AS (PARTITION BY cell_id ORDER BY time), "
    "  wb AS (PARTITION BY cell_id ORDER BY time ROWS UNBOUNDED PRECEDING), "
    "  wf AS (PARTITION BY cell_id ORDER BY time "
    "    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)) "
    "SELECT cell_id, time, "
    + rq_sql(
        "CASE WHEN temp IS NOT NULL THEN temp "
        "WHEN coalesce(next_rn, n + 1) - coalesce(prev_rn, 0) - 1 > 2 THEN NULL "
        "WHEN prev_rn IS NOT NULL AND next_rn IS NOT NULL THEN "
        "prev_val + (next_val - prev_val) * (rn - prev_rn) / (next_rn - prev_rn) "
        "ELSE coalesce(prev_val, next_val) END",
        4,
    )
    + " AS temp_filled FROM s",
)
def q_pad_interpolate(spark, sf_dir):
    """S7: `pad` — linear interpolation over interior NULL runs by series
    position, constant extrapolation at the edges (np.interp clamps),
    runs longer than maxPadLength=2 stay NULL (reference
    marineHeatWaves.py:888-916)."""
    dn = daily_nulls(spark, sf_dir)
    out = pad_interpolate(dn, max_pad_length=2)
    return out.select(
        "cell_id", "time", rq("temp_filled", 4).alias("temp_filled")
    )


# =========================================================================
# W10 — per-cell linear detrend
# =========================================================================
@register(
    "q_detrend_linear",
    f"WITH od AS ({ORDERS_DAILY_SQL}), "
    "x AS (SELECT cell_id, time, temp, "
    "  CAST(date_diff('day', DATE '1970-01-01', time) AS DOUBLE) AS xv FROM od), "
    "fit AS (SELECT cell_id, regr_slope(temp, xv) AS b, regr_intercept(temp, xv) AS a "
    f"  FROM x WHERE year(time) BETWEEN {BASELINE[0]} AND {BASELINE[1]} GROUP BY 1) "
    f"SELECT x.cell_id, x.time, {rq_sql('x.temp - (fit.a + fit.b * x.xv)', 2)} AS temp_detrended "
    "FROM x LEFT JOIN fit ON x.cell_id = fit.cell_id",
)
def q_detrend_linear(spark, sf_dir):
    """W10: OLS deg-1 fit on the baseline period, evaluated over the full
    record, subtracted (reference `detrend`
    best_practice/climatology.py:43-75); closed form via
    regr_slope/regr_intercept — no UDF."""
    od = orders_daily(spark, sf_dir)
    out = detrend_linear(od, baseline=BASELINE)
    return out.select(
        "cell_id", "time", rq("temp_detrended", 2).alias("temp_detrended")
    )


# =========================================================================
# W10 deg-2 — general-degree polynomial detrend (closed-form quadratic)
# =========================================================================
@register(
    "q_detrend_poly2",
    f"WITH od AS ({ORDERS_DAILY_SQL}), "
    "x AS (SELECT cell_id, time, temp, "
    "  CAST(date_diff('day', DATE '1970-01-01', time) AS DOUBLE) AS xv FROM od), "
    "b AS (SELECT * FROM x WHERE temp IS NOT NULL "
    f"  AND year(time) BETWEEN {BASELINE[0]} AND {BASELINE[1]}), "
    "c AS (SELECT cell_id, avg(xv) AS xc FROM b GROUP BY 1), "
    "uu AS (SELECT b.cell_id, b.temp, b.xv - c.xc AS u FROM b JOIN c ON b.cell_id = c.cell_id), "
    "m AS (SELECT cell_id, CAST(count(*) AS DOUBLE) AS m0, sum(u) AS m1, "
    "  sum(u * u) AS m2, sum(u * u * u) AS m3, sum(u * u * u * u) AS m4, "
    "  sum(temp) AS p0, sum(u * temp) AS p1, sum(u * u * temp) AS p2 "
    "  FROM uu GROUP BY 1), "
    "fit AS (SELECT cell_id, "
    "  (p0 * (m2 * m4 - m3 * m3) - m1 * (p1 * m4 - m3 * p2) + m2 * (p1 * m3 - m2 * p2)) "
    "  / (m0 * (m2 * m4 - m3 * m3) - m1 * (m1 * m4 - m3 * m2) + m2 * (m1 * m3 - m2 * m2)) AS ca, "
    "  (m0 * (p1 * m4 - m3 * p2) - p0 * (m1 * m4 - m3 * m2) + m2 * (m1 * p2 - p1 * m2)) "
    "  / (m0 * (m2 * m4 - m3 * m3) - m1 * (m1 * m4 - m3 * m2) + m2 * (m1 * m3 - m2 * m2)) AS cb, "
    "  (m0 * (m2 * p2 - m3 * p1) - m1 * (m1 * p2 - p1 * m2) + p0 * (m1 * m3 - m2 * m2)) "
    "  / (m0 * (m2 * m4 - m3 * m3) - m1 * (m1 * m4 - m3 * m2) + m2 * (m1 * m3 - m2 * m2)) AS cc "
    "  FROM m) "
    "SELECT x.cell_id, x.time, "
    + rq_sql(
        "x.temp - (f.ca + f.cb * (x.xv - c.xc) + f.cc * (x.xv - c.xc) * (x.xv - c.xc))",
        2,
    )
    + " AS temp_detrended "
    "FROM x JOIN fit f ON x.cell_id = f.cell_id JOIN c ON x.cell_id = c.cell_id",
)
def q_detrend_poly2(spark, sf_dir):
    """W10 general degree: quadratic detrend — polyfit(deg=2) on the
    baseline, evaluated over the full record, subtracted (reference
    best_practice/climatology.py:43-75 takes arbitrary ``deg``).
    Closed-form normal equations over centered-abscissa moments solved
    by Cramer's rule, identically in both engines; deg>2 runs through
    the applyInPandas polyfit kernel (U1 hatch)."""
    od = orders_daily(spark, sf_dir)
    out = detrend_poly(od, deg=2, baseline=BASELINE)
    return out.select(
        "cell_id", "time", rq("temp_detrended", 2).alias("temp_detrended")
    )


# =========================================================================
# W11 — OLS mean + trend of a yearly series
# =========================================================================
#: shared SE expression + the literal t table (identical float reprs on
#: both sides — see functions/stats.py)
_SE_SQL = (
    "sqrt(regr_syy(y, year) * (1 - regr_r2(y, year)) "
    "/ (regr_count(y, year) - 2) / regr_sxx(y, year))"
)


def _TQ_SQL() -> str:
    from mhw3d_detection_spark.functions.stats import (
        MAX_DOF,
        Z_975,
        t_table_sql_literal,
    )

    dof = "CAST(regr_count(y, year) AS INT) - 2"
    return (
        f"(CASE WHEN {dof} > {MAX_DOF} THEN {Z_975!r} "
        f"WHEN {dof} >= 1 THEN ({t_table_sql_literal()})[{dof}] END)"
    )


@register(
    "q_mean_trend_ols",
    f"WITH od AS ({ORDERS_DAILY_SQL}), "
    "yearly AS (SELECT cell_id, CAST(year(time) AS INT) AS year, avg(temp) AS y "
    "  FROM od GROUP BY 1, 2) "
    f"SELECT cell_id, {rq_sql('avg(y)', 2)} AS y_mean, "
    f"{rq_sql('regr_slope(y, year)', 4)} AS y_trend, "
    f"{rq_sql(_SE_SQL, 4)} AS y_trend_se, "
    f"{rq_sql(f'{_TQ_SQL()} * {_SE_SQL}', 4)} AS y_dtrend "
    "FROM yearly GROUP BY 1",
)
def q_mean_trend_ols(spark, sf_dir):
    """W11: y ~ b0 + b1*(t - mean(t)) per cell on the yearly-mean series;
    b0 = mean, b1 = regr_slope (reference `meanTrend`
    marineHeatWaves.py:687-782); trend_se is the slope standard error and
    dtrend = t_{a/2,n-2} * trend_se is the reference's full CI half-width
    (marineHeatWaves.py:774-779) — the t quantile from the shared literal
    table in functions/stats.py, identical in both engines."""
    od = orders_daily(spark, sf_dir)
    yearly = od.groupBy(
        "cell_id", F.year("time").cast("int").alias("year")
    ).agg(F.avg("temp").alias("y"))
    out = mean_trend_ols(yearly, ["y"], key_cols=["cell_id"], t_col="year")
    return out.select(
        "cell_id",
        rq("y_mean", 2).alias("y_mean"),
        rq("y_trend", 4).alias("y_trend"),
        rq("y_trend_se", 4).alias("y_trend_se"),
        rq("y_dtrend", 4).alias("y_dtrend"),
    )


# =========================================================================
# W13b (beyond-reference, in-domain) — per-cell lag-k autocorrelation
# =========================================================================
@register(
    "q_autocorr",
    f"WITH od AS ({ORDERS_DAILY_SQL}), "
    "p AS (SELECT a.cell_id, k.k AS k, a.temp AS v, b.temp AS pv "
    "  FROM od a CROSS JOIN (SELECT unnest([1, 7]) AS k) k "
    "  LEFT JOIN od b ON b.cell_id = a.cell_id AND b.time = a.time - k.k) "
    "SELECT cell_id, "
    f"{rq_sql('corr(CASE WHEN k = 1 THEN v END, CASE WHEN k = 1 THEN pv END)', 4)}"
    " AS acf_1, "
    "CAST(count(CASE WHEN k = 1 THEN pv END) AS INT) AS n_pairs_1, "
    f"{rq_sql('corr(CASE WHEN k = 7 THEN v END, CASE WHEN k = 7 THEN pv END)', 4)}"
    " AS acf_7, "
    "CAST(count(CASE WHEN k = 7 THEN pv END) AS INT) AS n_pairs_7 "
    "FROM p GROUP BY 1",
)
def q_autocorr(spark, sf_dir):
    """Beyond-reference, in-domain: per-cell lag-1 / lag-7
    autocorrelation of the daily series with TRUE lag-k pairing — a
    pair (t, t−k) counts whenever both days exist, however many
    interior days are missing (self-equi-join on the exact day
    offset; one join shuffle serves both lags)."""
    od = orders_daily(spark, sf_dir)
    a = autocorrelation(od, lags=(1, 7))
    return a.select(
        "cell_id",
        rq("acf_1", 4).alias("acf_1"),
        "n_pairs_1",
        rq("acf_7", 4).alias("acf_7"),
        "n_pairs_7",
    )


# =========================================================================
# W15 (beyond-reference, in-domain) — CUSUM change-point detection
# =========================================================================
#: allowance k = 2^16, alarm threshold h = 2^18 — both exact dyadics
#: (~0.5 sigma and ~2 sigma of the orders_daily series), chosen so the
#: oracle row exercises BOTH alarm states and long no-alarm stretches
_CUSUM_K = float(2**16)
_CUSUM_H = float(2**18)

_DQ6 = dyadic_quantize_sql  # DuckDB twin of the 1/64-grid quantizer

_CUSUM_SQL = (
    f"WITH od AS ({ORDERS_DAILY_SQL}), "
    f"dq AS (SELECT cell_id, time, {_DQ6('temp')} AS xq FROM od), "
    f"mu AS (SELECT cell_id, {_DQ6('sum(xq) / count(*)')} AS mu "
    "  FROM dq GROUP BY 1), "
    "st AS (SELECT d.cell_id, d.time, "
    f"  d.xq - m.mu - {_CUSUM_K!r} AS sp, "
    f"  m.mu - d.xq - {_CUSUM_K!r} AS sn "
    "  FROM dq d JOIN mu m USING (cell_id)), "
    "q AS (SELECT cell_id, time, sum(sp) OVER w AS qp, sum(sn) OVER w AS qn "
    "  FROM st WINDOW w AS (PARTITION BY cell_id ORDER BY time "
    "    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)), "
    "c AS (SELECT cell_id, time, "
    "  qp - least(0.0, min(qp) OVER w) AS cp, "
    "  qn - least(0.0, min(qn) OVER w) AS cn "
    "  FROM q WINDOW w AS (PARTITION BY cell_id ORDER BY time "
    "    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) "
    "SELECT cell_id, CAST(count(*) AS INT) AS n_days, "
    f"CAST(count(CASE WHEN cp > {_CUSUM_H!r} THEN 1 END) AS INT) AS n_alarm_pos, "
    f"CAST(count(CASE WHEN cn > {_CUSUM_H!r} THEN 1 END) AS INT) AS n_alarm_neg, "
    f"{rq_sql('max(cp)', 2)} AS max_cusum_pos, "
    f"{rq_sql('max(cn)', 2)} AS max_cusum_neg, "
    f"min(CASE WHEN cp > {_CUSUM_H!r} THEN time END) AS first_alarm_pos, "
    f"min(CASE WHEN cn > {_CUSUM_H!r} THEN time END) AS first_alarm_neg "
    "FROM c GROUP BY 1"
)


@register("q_cusum_changepoint", _CUSUM_SQL)
def q_cusum_changepoint(spark, sf_dir):
    """Beyond-reference, in-domain: two-sided CUSUM regime-shift
    screen (Page 1954) over the daily series — per-cell alarm counts,
    peak statistic and first-alarm dates. The recursive detector is
    re-expressed as running-sum-minus-prefix-min (two window passes
    over ONE per-cell sort; see ``operators.analysis.
    cusum_changepoints``), and every addend sits on the dyadic 1/64
    grid so the unbounded running sums hash-match DuckDB bit-exactly
    despite the engines' different summation trees."""
    od = orders_daily(spark, sf_dir)
    c = cusum_changepoints(od, allowance=_CUSUM_K, threshold=_CUSUM_H)
    return c.groupBy("cell_id").agg(
        F.count(F.lit(1)).cast("int").alias("n_days"),
        F.sum(F.col("alarm_pos").cast("int")).cast("int").alias("n_alarm_pos"),
        F.sum(F.col("alarm_neg").cast("int")).cast("int").alias("n_alarm_neg"),
        rq(F.max("cusum_pos"), 2).alias("max_cusum_pos"),
        rq(F.max("cusum_neg"), 2).alias("max_cusum_neg"),
        F.min(F.when(F.col("alarm_pos"), F.col("time"))).alias("first_alarm_pos"),
        F.min(F.when(F.col("alarm_neg"), F.col("time"))).alias("first_alarm_neg"),
    )


# =========================================================================
# A13 — mergeable partial-aggregate climatology (incremental updates)
# =========================================================================
# The Spark side computes one partial-state table PER INGEST BATCH
# (1995-1997, then 1998-2000), merges the states, and finalizes; the
# oracle computes the same climatology directly over the union — the
# hash match is the merge-equivalence proof (count/sum/min/max are
# commutative monoids, so batch boundaries cannot change the result).
# Temps on the 13th of each month are nulled (same expression in both
# engines) so the strict skipna=False rule and the all-NULL-group guard
# are actually exercised.
_P13 = "CASE WHEN day(time) = 13 THEN NULL ELSE temp END"

_PARTIAL_SQL = (
    f"WITH od AS ({ORDERS_DAILY_SQL}), "
    f"od13 AS (SELECT cell_id, time, {_P13} AS temp FROM od), "
    f"base AS (SELECT cell_id, {DOY} AS doy, temp FROM od13 "
    f"  WHERE year(time) BETWEEN {BASELINE[0]} AND {BASELINE[1]}), "
    "agg AS (SELECT cell_id, doy, count(temp) AS n, sum(temp) AS s, "
    "  min(temp) AS mn, max(temp) AS mx, "
    "  CAST(sum(CASE WHEN temp IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null "
    "  FROM base GROUP BY 1, 2) "
    "SELECT cell_id, CAST(doy AS INT) AS doy, n AS n_samples, "
    f"  CASE WHEN n > 0 THEN {rq_sql('s / n', 2)} END AS seas, "
    f"  CASE WHEN n > 0 AND n_null = 0 THEN {rq_sql('s / n', 2)} END AS seas_strict, "
    f"  {rq_sql('mn', 2)} AS temp_min, {rq_sql('mx', 2)} AS temp_max "
    "FROM agg"
)


@register("q_clim_partial_merge", _PARTIAL_SQL)
def q_clim_partial_merge(spark, sf_dir):
    """A13: incremental climatology via mergeable partial-aggregate
    states — one partials table per ingest batch, merged and finalized
    (the reference's climatology is a monolithic full-history recompute;
    legacy/climatology.py:193-269). Strict-NULL rule preserved through
    the merge (legacy/climatology.py:243-252)."""
    od = orders_daily(spark, sf_dir).withColumn(
        "temp",
        F.when(F.dayofmonth("time") == 13, F.lit(None)).otherwise(F.col("temp")),
    )
    batches = [
        od.filter(F.year("time").between(BASELINE[0], 1997)),
        od.filter(F.year("time").between(1998, BASELINE[1])),
    ]
    merged = merge_clim_partials(*[clim_partials(b) for b in batches])
    out = finalize_clim_partials(merged)
    return out.select(
        "cell_id",
        F.col("doy").cast("int").alias("doy"),
        "n_samples",
        rq("seas", 2).alias("seas"),
        rq("seas_strict", 2).alias("seas_strict"),
        rq("temp_min", 2).alias("temp_min"),
        rq("temp_max", 2).alias("temp_max"),
    )


# =========================================================================
# M6 — climatology forecast skill (r7): is the clim a better predictor
# than persistence? The eval-layer row for the climatology itself.
# =========================================================================
@register(
    "q_forecast_skill",
    f"WITH od AS ({ORDERS_DAILY_SQL}), "
    f"clim AS ({SIMPLE_CLIM_SQL}), "
    f"ev AS (SELECT cell_id, time, temp, {DOY} AS doy, "
    "  lag(temp) OVER (PARTITION BY cell_id ORDER BY time) AS prev "
    f"  FROM od WHERE year(time) > {BASELINE[1]}), "
    "j AS (SELECT ev.cell_id, ev.temp, ev.prev, clim.seas FROM ev "
    "  JOIN clim ON ev.cell_id = clim.cell_id AND ev.doy = clim.doy "
    "  WHERE ev.prev IS NOT NULL) "
    "SELECT cell_id, CAST(count(*) AS BIGINT) AS n_days, "
    f"{rq_sql('avg(abs(temp - seas))', 4)} AS mae_clim, "
    f"{rq_sql('avg(abs(temp - prev))', 4)} AS mae_persist, "
    f"{rq_sql('1.0 - avg(abs(temp - seas)) / avg(abs(temp - prev))', 4)} AS skill "
    "FROM j GROUP BY 1",
)
def q_forecast_skill(spark, sf_dir):
    """M6 (r7): out-of-sample forecast skill of the DOY climatology —
    per cell, the MAE of predicting each post-baseline day with its
    climatological mean vs the persistence baseline (yesterday's
    temperature), and the skill score 1 − MAE_clim/MAE_persist. The
    eval-layer row for the climatology itself (as q_ann_recall prices
    the ANN and q_minhash_calibration the LSH): the reference computes
    climatologies; this prices their predictive value. Evaluation
    days are strictly OUTSIDE the baseline years (a real
    train/test split); rows need both predictors defined (first day
    per cell drops — the shared contract). One window pass + a
    broadcast clim join + one per-cell aggregate."""
    od = orders_daily(spark, sf_dir)
    clim = simple_clim_table(spark, sf_dir)
    w = Window.partitionBy("cell_id").orderBy("time")
    ev = (
        od.filter(F.year("time") > BASELINE[1])
        .withColumn("doy", clim_doy(F.col("time")))
        .withColumn("prev", F.lag("temp").over(w))
        .filter(F.col("prev").isNotNull())
    )
    j = ev.join(F.broadcast(clim), ["cell_id", "doy"])
    return j.groupBy("cell_id").agg(
        F.count(F.lit(1)).alias("n_days"),
        rq(F.avg(F.abs(F.col("temp") - F.col("seas"))), 4).alias("mae_clim"),
        rq(F.avg(F.abs(F.col("temp") - F.col("prev"))), 4).alias(
            "mae_persist"
        ),
        rq(
            F.lit(1.0)
            - F.avg(F.abs(F.col("temp") - F.col("seas")))
            / F.avg(F.abs(F.col("temp") - F.col("prev"))),
            4,
        ).alias("skill"),
    )


# =========================================================================
# W16 (beyond-reference, in-domain) — truncated EWMA smoother
# =========================================================================
def _EWMA_SQL(window: int = 16) -> str:
    terms = []
    for j in range(window):
        wt = 2.0 ** -(j + 1) if j < window - 1 else 2.0 ** -(window - 1)
        terms.append(f"lag(temp_q, {j}) OVER w * {wt!r}")
    ew = " + ".join(terms)
    return (
        f"WITH od AS ({ORDERS_DAILY_SQL}), "
        f"dq AS (SELECT cell_id, time, {dyadic_quantize_sql('temp')} AS temp_q FROM od), "
        "e AS (SELECT cell_id, time, temp_q, "
        f"  CASE WHEN lag(temp_q, {window - 1}) OVER w IS NOT NULL "
        f"    THEN {ew} END AS ewma "
        "  FROM dq WINDOW w AS (PARTITION BY cell_id ORDER BY time)) "
        "SELECT cell_id, time, temp_q, ewma, temp_q - ewma AS ewma_anom FROM e"
    )


@register("q_ewma_smooth", _EWMA_SQL(16))
def q_ewma_smooth(spark, sf_dir):
    """W16 (r7): truncated EWMA (alpha = 1/2, 16-sample window) over
    the daily series — power-of-two weights over dyadic-grid inputs
    make every smoothed value an EXACT dyadic, hash-matched as raw
    doubles; one per-cell window sort, a lag chain, no recursion
    (see ``operators.analysis.ewma_smooth``)."""
    od = orders_daily(spark, sf_dir)
    return ewma_smooth(od, window=16)


# =========================================================================
# W17 (beyond-reference, in-domain) — MAD-based spike QC
# =========================================================================
#: deterministic spike injection (same expression both engines, the
#: _P13 device): +8e5 every July 13th — natural max |mod_z| on this
#: series is ~1.5, injected days land ~4.9, so BOTH flag states fire
_SPIKE = (
    "temp + CASE WHEN month(time) = 7 AND day(time) = 13 "
    "THEN 800000.0 ELSE 0.0 END"
)

_DESPIKE_SQL = (
    f"WITH od0 AS ({ORDERS_DAILY_SQL}), "
    f"od AS (SELECT cell_id, time, {_SPIKE} AS temp FROM od0), "
    f"dq AS (SELECT cell_id, time, {rq_sql('temp', 2)} AS temp_q FROM od), "
    f"md AS (SELECT cell_id, {rq_sql('quantile_cont(temp_q, 0.5)', 6)} AS med "
    "  FROM dq GROUP BY 1), "
    "j AS (SELECT d.*, m.med FROM dq d JOIN md m USING (cell_id)), "
    f"ma AS (SELECT cell_id, {rq_sql('quantile_cont(abs(temp_q - med), 0.5)', 6)} AS mad "
    "  FROM j GROUP BY 1), "
    "z AS (SELECT j.cell_id, j.time, j.temp_q, j.med, a.mad, "
    "  CASE WHEN a.mad > 0 THEN 0.6745 * abs(j.temp_q - j.med) / a.mad END AS mod_z, "
    "  CASE WHEN a.mad > 0 THEN 0.6745 * abs(j.temp_q - j.med) > 3.5 * a.mad "
    "    ELSE abs(j.temp_q - j.med) > 0 END AS is_spike "
    "  FROM j JOIN ma a USING (cell_id)) "
    "SELECT cell_id, CAST(count(*) AS INT) AS n_days, "
    "CAST(count(CASE WHEN is_spike THEN 1 END) AS INT) AS n_spikes, "
    f"max(med) AS med, max(mad) AS mad, {rq_sql('max(mod_z)', 4)} AS max_mod_z, "
    "min(CASE WHEN is_spike THEN time END) AS first_spike "
    "FROM z GROUP BY 1"
)


@register("q_despike_mad", _DESPIKE_SQL)
def q_despike_mad(spark, sf_dir):
    """W17 (r7): per-cell robust spike QC — modified z-score over
    median/MAD (50% breakdown: the spikes cannot inflate their own
    yardstick, unlike mean/stddev). Spikes are INJECTED
    deterministically (+8e5 on July 13ths, same expression in both
    engines — the q_clim_partial_merge null-injection device) so the
    oracle checks precision AND recall: natural days stay below the
    3.5 threshold, every injected day lands ~4.9."""
    od = orders_daily(spark, sf_dir).withColumn(
        "temp",
        F.col("temp")
        + F.when(
            (F.month("time") == 7) & (F.dayofmonth("time") == 13),
            F.lit(800000.0),
        ).otherwise(F.lit(0.0)),
    )
    z = despike_mad(od, z_thresh=3.5)
    return z.groupBy("cell_id").agg(
        F.count(F.lit(1)).cast("int").alias("n_days"),
        F.sum(F.col("is_spike").cast("int")).cast("int").alias("n_spikes"),
        F.max("med").alias("med"),
        F.max("mad").alias("mad"),
        rq(F.max("mod_z"), 4).alias("max_mod_z"),
        F.min(F.when(F.col("is_spike"), F.col("time"))).alias("first_spike"),
    )


# =========================================================================
# W18 (beyond-reference, in-domain) — block-bootstrap trend CI
# =========================================================================
_BOOT_SQL = (
    f"WITH od AS ({ORDERS_DAILY_SQL}), "
    "yearly AS (SELECT cell_id, year(time) AS yr, avg(temp) AS y, "
    "  row_number() OVER (PARTITION BY cell_id ORDER BY year(time)) AS rn "
    "  FROM od GROUP BY 1, 2), "
    "spans AS (SELECT cell_id, CAST(count(*) AS INT) AS n, "
    "  regr_slope(y, yr) AS trend FROM yearly GROUP BY 1), "
    "reps AS (SELECT cell_id, n, n - 1 AS nb, "
    "  CAST(ceil(n / 2.0) AS INT) AS d, "
    "  unnest(generate_series(1, 64)) AS b FROM spans WHERE n - 1 >= 1), "
    "dr AS (SELECT cell_id, n, nb, b, "
    "  unnest(generate_series(1, d)) AS k FROM reps), "
    "drawn AS (SELECT *, CAST(('0x' || substr(md5(cell_id || '-' || b || '-' || k), 1, 12))::BIGINT "
    "  % nb AS INT) AS j FROM dr), "
    "pairs AS (SELECT cell_id, n, b, k, j, "
    "  unnest(generate_series(0, 1)) AS i FROM drawn), "
    "pt AS (SELECT cell_id, b, j + i AS pos FROM pairs "
    "  WHERE (k - 1) * 2 + i < n), "
    "jn AS (SELECT pt.cell_id, pt.b, yearly.yr AS x, yearly.y FROM pt "
    "  JOIN yearly ON yearly.cell_id = pt.cell_id AND yearly.rn - 1 = pt.pos), "
    "slopes AS (SELECT cell_id, b, regr_slope(y, x) AS s FROM jn GROUP BY 1, 2), "
    "ci AS (SELECT cell_id, quantile_cont(s, 0.025) AS ci_lo, "
    "  quantile_cont(s, 0.975) AS ci_hi, CAST(count(*) AS INT) AS n_reps "
    "  FROM slopes GROUP BY 1) "
    "SELECT s.cell_id, s.n AS n_years, "
    f"{rq_sql('s.trend', 2)} AS trend, {rq_sql('ci.ci_lo', 2)} AS ci_lo, "
    f"{rq_sql('ci.ci_hi', 2)} AS ci_hi, CAST(coalesce(ci.n_reps, 0) AS INT) AS n_reps "
    "FROM spans s LEFT JOIN ci USING (cell_id)"
)


@register("q_trend_bootstrap_ci", _BOOT_SQL)
def q_trend_bootstrap_ci(spark, sf_dir):
    """W18 (r7): per-cell annual trend with a moving-block bootstrap
    95% CI — serially correlated residuals make plain OLS CIs too
    narrow; 2-year blocks preserve the within-block autocorrelation.
    The bootstrap is DETERMINISTIC (block draws = md5(cell, rep, draw)
    mod n_blocks — the split_assign device), so the 64 replicates are
    a pure function of the key and the oracle replays them exactly:
    no seeded RNG anywhere. One yearly aggregate, a generated
    replicate frame, one equi-join, a (cell, rep)-keyed regr_slope,
    exact percentiles over replicate slopes."""
    od = orders_daily(spark, sf_dir)
    out = trend_bootstrap_ci(od, n_reps=64, block_len=2, conf=0.95)
    return out.select(
        "cell_id",
        "n_years",
        rq("trend", 2).alias("trend"),
        rq("ci_lo", 2).alias("ci_lo"),
        rq("ci_hi", 2).alias("ci_hi"),
        "n_reps",
    )


# =========================================================================
# W19 (r9, beyond-reference, in-domain) — banded Theil-Sen robust trend
# =========================================================================
@register(
    "q_theilsen_trend",
    f"WITH od AS ({ORDERS_DAILY_SQL}), "
    "q AS (SELECT cell_id, CAST(time AS DATE) - DATE '1970-01-01' AS day, "
    f"  {rq_sql('temp', 2)} AS t FROM od), "
    "a AS (SELECT cell_id, lag, day AS d1, t AS t1, day + lag AS d2 FROM "
    "  (SELECT q.*, unnest(generate_series(1, 30)) AS lag FROM q)), "
    "s AS (SELECT a.cell_id, (b.t - a.t1) / a.lag AS slope "
    "  FROM a JOIN q b ON b.cell_id = a.cell_id AND b.day = a.d2) "
    "SELECT cell_id, CAST(count(*) AS BIGINT) AS n_pairs, "
    f"{rq_sql('quantile_cont(slope, 0.5)', 4)} AS sen_slope "
    "FROM s GROUP BY 1",
)
def q_theilsen_trend(spark, sf_dir):
    """W19 (r9): banded Theil-Sen slope per cell — the median of
    pairwise slopes over day-pairs <= 30 days apart, the robust
    companion to the OLS trend (W11): one missed spike moves OLS
    arbitrarily, moves a slope median not at all (29% breakdown).
    Lag-exploded EQUI-join (the q_autocorr device) keeps the pair
    count linear in series length; rq2-quantized temps difference
    identical bits in both engines, day deltas are exact integers,
    each slope one exactly-rounded division, and percentile(0.5) ≡
    quantile_cont(0.5) (the A3/despike_mad contract)."""
    from mhw3d_detection_spark.operators.analysis import theilsen_trend

    od = orders_daily(spark, sf_dir)
    return theilsen_trend(od, max_lag_days=30, temp_digits=2)


# =========================================================================
# S8 (r9, beyond-reference, in-domain) — harmonic (Fourier) seasonal
# climatology fit: the parametric alternative to the smoothed-mean
# cycle (A1/W1) — 3 coefficients per cell instead of 366 rows
# =========================================================================
def _harm_rows() -> list[tuple[int, float, float]]:
    """(doy, cos, sin) literals for every leap-normalized DOY — the
    shared-literal transcendental device (NDCG/MRR precedent) at table
    scale: cos/sin are computed ONCE in Python and the identical
    doubles enter both engines (createDataFrame on the Spark side, a
    repr'd VALUES list in the SQL — repr round-trips shortest-exact,
    so both parsers land on the same bits). No runtime trig anywhere."""
    import math

    out = []
    for doy in range(1, 367):
        th = 2.0 * math.pi * (doy - 1) / 365.25
        out.append((doy, math.cos(th), math.sin(th)))
    return out


# Cramer's-rule solve of the 3x3 normal equations, as SHARED TEXT: the
# identical formula string is F.expr'd in Spark and inlined in the SQL,
# so both engines execute the same exactly-rounded op tree over sums
# that are bit-exact by dyadic construction.
_H_DET = (
    "(nn*(scc*sss - scs*scs) - sc*(sc*sss - scs*ss) + ss*(sc*scs - scc*ss))"
)
_H_A0 = (
    "((sy*(scc*sss - scs*scs) - sc*(syc*sss - scs*sys) "
    f"+ ss*(syc*scs - scc*sys)) / {_H_DET})"
)
_H_A1 = (
    "((nn*(syc*sss - scs*sys) - sy*(sc*sss - scs*ss) "
    f"+ ss*(sc*sys - syc*ss)) / {_H_DET})"
)
_H_B1 = (
    "((nn*(scc*sys - syc*scs) - sc*(sc*sys - syc*ss) "
    f"+ sy*(sc*scs - scc*ss)) / {_H_DET})"
)

_HARM_VALUES = ", ".join(
    f"({d}, {c!r}, {s!r})" for d, c, s in _harm_rows()
)


@register(
    "q_harmonic_clim",
    f"WITH od AS ({ORDERS_DAILY_SQL}), "
    # CAST to DOUBLE: DuckDB infers DECIMAL for bare decimal literals
    # (the r8 CASE-output lesson); the shortest-repr text then converts
    # to exactly the Python double it came from
    f"harm AS (SELECT doy, CAST(c AS DOUBLE) AS c, CAST(s AS DOUBLE) AS s "
    f"  FROM (VALUES {_HARM_VALUES}) AS t(doy, c, s)), "
    f"j AS (SELECT od.cell_id, {rq_sql('od.temp', 2)} AS y, h.c, h.s "
    f"  FROM od JOIN harm h ON h.doy = {clim_doy_sql('od.time')}), "
    "a AS (SELECT cell_id, CAST(count(*) AS DOUBLE) AS nn, "
    f"  sum({dyadic_quantize_sql('y', 20)}) AS sy, "
    f"  sum({dyadic_quantize_sql('c', 30)}) AS sc, "
    f"  sum({dyadic_quantize_sql('s', 30)}) AS ss, "
    f"  sum({dyadic_quantize_sql('c*c', 30)}) AS scc, "
    f"  sum({dyadic_quantize_sql('s*s', 30)}) AS sss, "
    f"  sum({dyadic_quantize_sql('c*s', 30)}) AS scs, "
    f"  sum({dyadic_quantize_sql('y*c', 20)}) AS syc, "
    f"  sum({dyadic_quantize_sql('y*s', 20)}) AS sys "
    "  FROM j GROUP BY 1), "
    f"f AS (SELECT cell_id, CAST(nn AS BIGINT) AS n_days, "
    f"  {_H_A0} AS a0, {_H_A1} AS a1, {_H_B1} AS b1 FROM a) "
    f"SELECT cell_id, n_days, {rq_sql('a0', 2)} AS a0, "
    f"{rq_sql('a1', 2)} AS a1, {rq_sql('b1', 2)} AS b1, "
    f"{rq_sql('sqrt(a1*a1 + b1*b1)', 2)} AS amplitude "
    "FROM f",
)
def q_harmonic_clim(spark, sf_dir):
    """S8 (r9): per-cell first-harmonic seasonal fit
    ``y ~ a0 + a1 cos(2π(doy-1)/365.25) + b1 sin(...)`` by closed-form
    OLS (3x3 normal equations, Cramer) — the PARAMETRIC seasonal cycle:
    3 numbers per cell instead of a 366-row smoothed table, the form
    regime-shift monitors difference against. Exactness end to end:
    cos/sin are a 366-row SHARED-LITERAL table (no runtime trig);
    temps rq2; every summed term dyadic-quantized (sums bit-exact in
    any order: y-terms 2^-20 grid, unit-terms 2^-30 — partial sums
    stay far under 2^53/2^b); the Cramer solve is ONE shared formula
    string (F.expr here, inlined there) so both engines run the same
    exactly-rounded op tree; amplitude sqrt is exactly rounded. Plan:
    one broadcast join against the 366-row dim + one hash aggregate —
    the corpus is touched once."""
    from mhw3d_detection_spark.operators.climatology import harmonic_fit

    od = orders_daily(spark, sf_dir)
    spark_harm = spark.createDataFrame(
        _harm_rows(), "doy int, c double, s double"
    )
    return harmonic_fit(od, spark_harm)


# =========================================================================
# W20 (r9, beyond-reference, in-domain) — banded Mann-Kendall direction
# statistic: the rank-test significance companion of W19's Theil-Sen,
# over the SAME banded pair set
# =========================================================================
@register(
    "q_mann_kendall",
    f"WITH od AS ({ORDERS_DAILY_SQL}), "
    "q AS (SELECT cell_id, CAST(time AS DATE) - DATE '1970-01-01' AS day, "
    f"  {rq_sql('temp', 2)} AS t FROM od), "
    "a AS (SELECT cell_id, lag, day AS d1, t AS t1, day + lag AS d2 FROM "
    "  (SELECT q.*, unnest(generate_series(1, 30)) AS lag FROM q)), "
    "s AS (SELECT a.cell_id, sign(b.t - a.t1) AS sgn "
    "  FROM a JOIN q b ON b.cell_id = a.cell_id AND b.day = a.d2) "
    "SELECT cell_id, CAST(sum(sgn) AS BIGINT) AS s_stat, "
    "CAST(count(*) AS BIGINT) AS n_pairs, "
    "sum(sgn) / count(*) AS consensus FROM s GROUP BY 1",
)
def q_mann_kendall(spark, sf_dir):
    """W20 (r9): banded Mann-Kendall S = Σ sign(x_j - x_i) per cell
    over day-pairs <= 30 apart — how CONSISTENTLY the series moves one
    way, magnitude-free (the rank-test 'is there a trend' to W19's
    'how steep'; same pair geometry, so the two rows read together).
    Signs of rq2-quantized differences are integers; consensus
    S/n_pairs is one exactly-rounded division — RAW-double hash."""
    from mhw3d_detection_spark.operators.analysis import mann_kendall_banded

    od = orders_daily(spark, sf_dir)
    return mann_kendall_banded(od, max_lag_days=30, temp_digits=2)


# =========================================================================
# W21 (r9, beyond-reference, in-domain) — peaks-over-threshold mean
# excess: the EVT diagnostic behind threshold choice (pairs with W9's
# return periods: W9 ranks whole events, THIS characterizes the
# exceedance tail sample-wise)
# =========================================================================
@register(
    "q_mean_excess",
    f"WITH od AS ({ORDERS_DAILY_SQL}), "
    "thr AS (SELECT cell_id, quantile_cont(temp, 0.9) AS thr, "
    "  CAST(count(*) AS BIGINT) AS n_days FROM od GROUP BY 1), "
    "ex AS (SELECT od.cell_id, od.temp - t.thr AS excess FROM od "
    "  JOIN thr t ON od.cell_id = t.cell_id WHERE od.temp > t.thr), "
    "agg AS (SELECT cell_id, CAST(count(*) AS BIGINT) AS n_exceed, "
    f"  {rq_sql('avg(excess)', 4)} AS mean_excess FROM ex GROUP BY 1) "
    "SELECT t.cell_id, t.n_days, coalesce(a.n_exceed, 0) AS n_exceed, "
    "CAST(coalesce(a.n_exceed, 0) AS DOUBLE) / t.n_days AS exceed_rate, "
    f"{rq_sql('t.thr', 2)} AS thr, a.mean_excess "
    "FROM thr t LEFT JOIN agg a ON t.cell_id = a.cell_id",
)
def q_mean_excess(spark, sf_dir):
    """W21 (r9): per-cell exceedance rate and mean excess over the
    cell's exact p90 threshold — the peaks-over-threshold (EVT)
    tail diagnostic: a mean-excess that GROWS with threshold signals a
    heavy tail (GPD shape > 0), flat signals exponential; threshold
    choice for event detection reads off this. percentile ≡
    quantile_cont on identical bits (A3), the > comparison is
    identical bits, rate is one exact integer division, mean excess
    rq4. Plan: one percentile aggregate, a cells-sized broadcast back,
    one filtered aggregate."""
    od = orders_daily(spark, sf_dir)
    thr = od.groupBy("cell_id").agg(
        F.expr("percentile(temp, 0.9)").alias("thr"),
        F.count(F.lit(1)).cast("long").alias("n_days"),
    )
    ex = (
        od.join(F.broadcast(thr.select("cell_id", "thr")), "cell_id")
        .filter(F.col("temp") > F.col("thr"))
        .select("cell_id", (F.col("temp") - F.col("thr")).alias("excess"))
    )
    agg = ex.groupBy("cell_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_exceed"),
        rq(F.avg("excess"), 4).alias("mean_excess"),
    )
    return thr.join(agg, "cell_id", "left").select(
        "cell_id",
        "n_days",
        F.coalesce(F.col("n_exceed"), F.lit(0)).cast("long").alias("n_exceed"),
        (
            F.coalesce(F.col("n_exceed"), F.lit(0)).cast("double")
            / F.col("n_days")
        ).alias("exceed_rate"),
        rq("thr", 2).alias("thr"),
        "mean_excess",
    )


# =========================================================================
# W22 (r9, beyond-reference, in-domain) — lagged cross-correlation
# against a reference cell: the lead-lag teleconnection (SP5 gives
# instantaneous corr; THIS asks which cells FOLLOW the reference)
# =========================================================================
@register(
    "q_xcorr_lagged",
    f"WITH od AS ({ORDERS_DAILY_SQL}), "
    "ref AS (SELECT time, temp AS rtemp FROM od WHERE cell_id = 0), "
    "p AS (SELECT a.cell_id, k.k AS k, a.temp AS v, r.rtemp AS rv "
    "  FROM od a CROSS JOIN (SELECT unnest([0, 7]) AS k) k "
    "  LEFT JOIN ref r ON r.time = a.time - k.k) "
    "SELECT cell_id, "
    f"{rq_sql('corr(CASE WHEN k = 0 THEN v END, CASE WHEN k = 0 THEN rv END)', 4)}"
    " AS xcf_0, "
    "CAST(count(CASE WHEN k = 0 THEN rv END) AS INT) AS n_pairs_0, "
    f"{rq_sql('corr(CASE WHEN k = 7 THEN v END, CASE WHEN k = 7 THEN rv END)', 4)}"
    " AS xcf_7, "
    "CAST(count(CASE WHEN k = 7 THEN rv END) AS INT) AS n_pairs_7 "
    "FROM p WHERE cell_id <> 0 GROUP BY 1",
)
def q_xcorr_lagged(spark, sf_dir):
    """W22 (r9): per-cell cross-correlation with reference cell 0 at
    lag 0 and lag 7 (does the cell track the reference, and does it
    track it a week LATE — the lead-lag direction SP5's instantaneous
    teleconnection cannot see). Same exact-day-offset LEFT-join device
    as W13b's autocorrelation, reference series broadcast (one cell's
    series — time-bounded, the SP5 contract); corr rq4."""
    od = orders_daily(spark, sf_dir)
    ref = od.filter(F.col("cell_id") == 0).select(
        "time", F.col("temp").alias("rtemp")
    )
    lags = F.explode(F.array(F.lit(0), F.lit(7))).alias("k")
    a = od.filter(F.col("cell_id") != 0).select(
        "cell_id", F.col("time").alias("atime"), "temp", lags
    )
    j = a.join(
        F.broadcast(ref),
        ref["time"] == F.expr("date_sub(atime, k)"),
        "left",
    )
    return j.groupBy("cell_id").agg(
        rq(
            F.corr(
                F.when(F.col("k") == 0, F.col("temp")),
                F.when(F.col("k") == 0, F.col("rtemp")),
            ),
            4,
        ).alias("xcf_0"),
        F.count(F.when(F.col("k") == 0, F.col("rtemp"))).cast("int").alias(
            "n_pairs_0"
        ),
        rq(
            F.corr(
                F.when(F.col("k") == 7, F.col("temp")),
                F.when(F.col("k") == 7, F.col("rtemp")),
            ),
            4,
        ).alias("xcf_7"),
        F.count(F.when(F.col("k") == 7, F.col("rtemp"))).cast("int").alias(
            "n_pairs_7"
        ),
    )


# =========================================================================
# W23 (r9, beyond-reference, in-domain) — trimmed & winsorized means:
# the remaining members of the robust-location family (despike drops
# MAD outliers, Theil-Sen medians slopes; THIS bounds tail influence
# on the level estimate itself)
# =========================================================================
@register(
    "q_trimmed_mean",
    f"WITH od AS ({ORDERS_DAILY_SQL}), "
    "thr AS (SELECT cell_id, quantile_cont(temp, 0.1) AS lo, "
    "  quantile_cont(temp, 0.9) AS hi FROM od GROUP BY 1), "
    "j AS (SELECT od.cell_id, od.temp, t.lo, t.hi FROM od "
    "  JOIN thr t ON od.cell_id = t.cell_id) "
    "SELECT cell_id, CAST(count(*) AS BIGINT) AS n_days, "
    f"{rq_sql('avg(temp)', 4)} AS mean_raw, "
    f"{rq_sql('avg(CASE WHEN temp >= lo AND temp <= hi THEN temp END)', 4)}"
    "  AS mean_trimmed, "
    f"{rq_sql('avg(CASE WHEN temp < lo THEN lo WHEN temp > hi THEN hi ELSE temp END)', 4)}"
    "  AS mean_winsorized "
    "FROM j GROUP BY 1",
)
def q_trimmed_mean(spark, sf_dir):
    """W23 (r9): per-cell 10%-trimmed mean (drop samples outside the
    exact [p10, p90]) and winsorized mean (clamp them to the fence) —
    the bounded-influence level estimates that complete the robust
    family (W16 MAD-despike rejects, W19 medians slopes; these bound
    the tails' pull on the MEAN, the form climatology baselines want
    when sensors occasionally rail). percentile ≡ quantile_cont on
    identical bits (A3), the fence comparisons and clamps compare
    identical bits, means rq4. One percentile aggregate + broadcast
    back + one aggregate."""
    od = orders_daily(spark, sf_dir)
    thr = od.groupBy("cell_id").agg(
        F.expr("percentile(temp, 0.1)").alias("lo"),
        F.expr("percentile(temp, 0.9)").alias("hi"),
    )
    j = od.join(F.broadcast(thr), "cell_id")
    return j.groupBy("cell_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        rq(F.avg("temp"), 4).alias("mean_raw"),
        rq(
            F.avg(
                F.when(
                    (F.col("temp") >= F.col("lo"))
                    & (F.col("temp") <= F.col("hi")),
                    F.col("temp"),
                )
            ),
            4,
        ).alias("mean_trimmed"),
        rq(
            F.avg(
                F.when(F.col("temp") < F.col("lo"), F.col("lo"))
                .when(F.col("temp") > F.col("hi"), F.col("hi"))
                .otherwise(F.col("temp"))
            ),
            4,
        ).alias("mean_winsorized"),
    )


# =========================================================================
# W24 (r10) — Mann-Kendall significance: Kendall variance with tie
# correction + continuity-corrected z (|z| > 1.96 is the dashboard
# threshold; completes W20's direction statistic with "is it noise")
# =========================================================================
@register(
    "q_mann_kendall_z",
    f"WITH od AS ({ORDERS_DAILY_SQL}), "
    "q AS (SELECT cell_id, CAST(time AS DATE) - DATE '1970-01-01' AS day, "
    f"  {rq_sql('temp', 2)} AS t FROM od), "
    "a AS (SELECT cell_id, lag, day AS d1, t AS t1, day + lag AS d2 FROM "
    "  (SELECT q.*, unnest(generate_series(1, 30)) AS lag FROM q)), "
    "s AS (SELECT a.cell_id, sign(b.t - a.t1) AS sgn "
    "  FROM a JOIN q b ON b.cell_id = a.cell_id AND b.day = a.d2), "
    "mk AS (SELECT cell_id, CAST(sum(sgn) AS BIGINT) AS s_stat FROM s GROUP BY 1), "
    "n AS (SELECT cell_id, CAST(count(*) AS BIGINT) AS n FROM q GROUP BY 1), "
    "tg AS (SELECT cell_id, t, CAST(count(*) AS BIGINT) AS tj FROM q GROUP BY 1, 2), "
    "ties AS (SELECT cell_id, CAST(sum(tj * (tj - 1) * (2 * tj + 5)) AS BIGINT) "
    "  AS tie_term FROM tg GROUP BY 1), "
    "v AS (SELECT mk.cell_id, n.n, mk.s_stat, "
    "  (CAST(n.n * (n.n - 1) * (2 * n.n + 5) AS BIGINT) - ties.tie_term) / 18 "
    "  AS var_s FROM mk JOIN n USING (cell_id) JOIN ties USING (cell_id)) "
    "SELECT cell_id, n AS n_days, s_stat, var_s, "
    "CASE WHEN var_s > 0 THEN ("
    "  CASE WHEN s_stat > 0 THEN (s_stat - 1) / sqrt(var_s) "
    "  WHEN s_stat < 0 THEN (s_stat + 1) / sqrt(var_s) "
    "  ELSE 0.0 END) END AS z FROM v",
)
def q_mann_kendall_z(spark, sf_dir):
    """W24 (r10): Mann-Kendall z-significance per cell — W20's banded
    S with the classical Kendall variance (tie-corrected over the rq2
    temp grid) and continuity correction. All-integer n/S/tie
    spectrum, /18 and sqrt exactly rounded — z hashes RAW; the banded-
    S-vs-full-variance conservatism is documented on the operator."""
    from mhw3d_detection_spark.operators.analysis import mann_kendall_z

    od = orders_daily(spark, sf_dir)
    return mann_kendall_z(od, max_lag_days=30, temp_digits=2)


# =========================================================================
# W25 (r10) — seasonal Mann-Kendall (Hirsch & Slack 1984): within-month
# across-year pairs, S and tie-corrected variance summed over seasons —
# the trend test that ignores the seasonal cycle instead of fighting it
# =========================================================================
@register(
    "q_seasonal_mk",
    f"WITH od AS ({ORDERS_DAILY_SQL}), "
    "mm AS (SELECT cell_id, year(time) AS y, month(time) AS mo, "
    f"  {rq_sql('avg(temp)', 2)} AS m FROM od GROUP BY 1, 2, 3), "
    "p AS (SELECT a.cell_id, a.mo, sign(b.m - a.m) AS sgn FROM mm a "
    "  JOIN mm b ON a.cell_id = b.cell_id AND a.mo = b.mo AND b.y > a.y), "
    "s AS (SELECT cell_id, mo, CAST(sum(sgn) AS BIGINT) AS s_m "
    "  FROM p GROUP BY 1, 2), "
    "k AS (SELECT cell_id, mo, CAST(count(*) AS BIGINT) AS k FROM mm "
    "  GROUP BY 1, 2), "
    "tg AS (SELECT cell_id, mo, m, CAST(count(*) AS BIGINT) AS tj FROM mm "
    "  GROUP BY 1, 2, 3), "
    "tt AS (SELECT cell_id, mo, CAST(sum(tj * (tj - 1) * (2 * tj + 5)) "
    "  AS BIGINT) AS tie FROM tg GROUP BY 1, 2), "
    "vm AS (SELECT k.cell_id, k.mo, "
    "  CAST(k.k * (k.k - 1) * (2 * k.k + 5) AS BIGINT) - tt.tie AS vn "
    "  FROM k JOIN tt ON k.cell_id = tt.cell_id AND k.mo = tt.mo), "
    "agg AS (SELECT s.cell_id, CAST(count(*) AS BIGINT) AS n_seasons, "
    "  CAST(sum(s.s_m) AS BIGINT) AS s_stat, "
    "  CAST(sum(vm.vn) AS BIGINT) AS var_num "
    "  FROM s JOIN vm ON s.cell_id = vm.cell_id AND s.mo = vm.mo "
    "  GROUP BY 1) "
    "SELECT cell_id, n_seasons, s_stat, "
    "CAST(var_num AS DOUBLE) / 18 AS var_s, "
    "CASE WHEN var_num > 0 THEN ("
    "  CASE WHEN s_stat > 0 THEN (s_stat - 1) / sqrt(CAST(var_num AS DOUBLE) / 18) "
    "  WHEN s_stat < 0 THEN (s_stat + 1) / sqrt(CAST(var_num AS DOUBLE) / 18) "
    "  ELSE 0.0 END) END AS z FROM agg",
)
def q_seasonal_mk(spark, sf_dir):
    """W25 (r10): seasonal Mann-Kendall (Hirsch & Slack 1984) per
    cell — within-MONTH pairs across years (monthly rq2 means), so the
    seasonal cycle never enters the statistic at all (W20/W24's banded
    form limits how much of the cycle a pair can span; this removes it
    by construction — the standard form for hydrology/SST trend
    screening). S and the tie-corrected variance NUMERATORS are summed
    per cell as integers and divided by 18 ONCE (summing per-month
    var/18 doubles would reintroduce association-order noise); z is
    continuity-corrected and hashes RAW. Year-pair joins are
    years²-bounded per (cell, month) — years is a physical time
    dimension, never corpus-sized."""
    from mhw3d_detection_spark.queries.base import rq as _rq

    od = orders_daily(spark, sf_dir)
    mm = od.groupBy(
        "cell_id",
        F.year("time").alias("y"),
        F.month("time").alias("mo"),
    ).agg(_rq(F.avg("temp"), 2).alias("m"))
    a = mm.select("cell_id", "mo", F.col("y").alias("y1"), F.col("m").alias("m1"))
    b = mm.select("cell_id", "mo", F.col("y").alias("y2"), F.col("m").alias("m2"))
    p = a.join(b, ["cell_id", "mo"]).filter(F.col("y2") > F.col("y1"))
    s = p.groupBy("cell_id", "mo").agg(
        F.sum(F.signum(F.col("m2") - F.col("m1"))).cast("long").alias("s_m")
    )
    k = mm.groupBy("cell_id", "mo").agg(
        F.count(F.lit(1)).cast("long").alias("k")
    )
    tt = (
        mm.groupBy("cell_id", "mo", "m")
        .agg(F.count(F.lit(1)).cast("long").alias("tj"))
        .groupBy("cell_id", "mo")
        .agg(
            F.sum(
                F.col("tj") * (F.col("tj") - 1) * (2 * F.col("tj") + 5)
            ).cast("long").alias("tie")
        )
    )
    vm = k.join(tt, ["cell_id", "mo"]).select(
        "cell_id",
        "mo",
        (
            F.col("k") * (F.col("k") - 1) * (2 * F.col("k") + 5)
            - F.col("tie")
        ).cast("long").alias("vn"),
    )
    agg = s.join(vm, ["cell_id", "mo"]).groupBy("cell_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_seasons"),
        F.sum("s_m").cast("long").alias("s_stat"),
        F.sum("vn").cast("long").alias("var_num"),
    )
    var_s = F.col("var_num").cast("double") / 18
    z = F.when(
        F.col("var_num") > 0,
        F.when(
            F.col("s_stat") > 0, (F.col("s_stat") - 1) / F.sqrt(var_s)
        ).when(
            F.col("s_stat") < 0, (F.col("s_stat") + 1) / F.sqrt(var_s)
        ).otherwise(F.lit(0.0)),
    )
    return agg.select(
        "cell_id", "n_seasons", "s_stat", var_s.alias("var_s"), z.alias("z")
    )


# =========================================================================
# W26 (r10) — GPD moment fit over threshold excesses: the shape/scale
# estimates the W21 mean-excess diagnostic motivates
# =========================================================================
@register(
    "q_gpd_moments",
    f"WITH od AS ({ORDERS_DAILY_SQL}), "
    "thr AS (SELECT cell_id, quantile_cont(temp, 0.9) AS thr FROM od "
    "  GROUP BY 1), "
    "ex AS (SELECT od.cell_id, "
    "  floor((od.temp - t.thr) * 16.0 + 0.5000152587890625) / 16.0 "
    "  AS e FROM od JOIN thr t ON od.cell_id = t.cell_id "
    "  WHERE od.temp > t.thr), "
    "agg AS (SELECT cell_id, CAST(count(*) AS BIGINT) AS n_exceed, "
    "  sum(e) AS s1, sum(e * e) AS s2 FROM ex GROUP BY 1), "
    "mm AS (SELECT cell_id, n_exceed, s1 / n_exceed AS m, "
    "  CASE WHEN n_exceed > 1 THEN "
    "    (s2 - s1 * s1 / n_exceed) / (n_exceed - 1) END AS v "
    "  FROM agg) "
    "SELECT t.cell_id, "
    + rq_sql("t.thr", 2)
    + " AS thr, coalesce(mm.n_exceed, 0) AS n_exceed, "
    + rq_sql("mm.m", 4)
    + " AS mean_excess, "
    "CASE WHEN mm.v > 0 THEN 0.5 * (1.0 - mm.m * mm.m / mm.v) END "
    "  AS xi, "
    "CASE WHEN mm.v > 0 THEN "
    + rq_sql("0.5 * mm.m * (1.0 + mm.m * mm.m / mm.v)", 2)
    + " END AS sigma "
    "FROM thr t LEFT JOIN mm ON t.cell_id = mm.cell_id",
)
def q_gpd_moments(spark, sf_dir):
    """W26 (r10): per-cell Generalized Pareto shape/scale via the
    method of moments (Hosking & Wallis 1987: ξ = ½(1 − m²/s²),
    σ = ½m(1 + m²/s²)) over excesses above the exact p90 — the
    parametric step W21's mean-excess diagnostic motivates (ξ > 0 =
    heavy tail: return levels diverge from the exponential
    extrapolation; ξ is what the 100-year-event estimate actually
    hinges on). Excesses dyadic-quantized (1/16 — products stay under
    2^53 at these magnitudes) so Σe/Σe² are order-free exact; moments
    and ξ are exactly-rounded shared formulas — ξ hashes RAW, σ/means
    display-rounded. Same plan as W21: one percentile aggregate, a
    cells-sized broadcast back, one filtered aggregate."""
    from mhw3d_detection_spark.operators.analysis import dyadic_quantize

    od = orders_daily(spark, sf_dir)
    thr = od.groupBy("cell_id").agg(
        F.expr("percentile(temp, 0.9)").alias("thr")
    )
    ex = (
        od.join(F.broadcast(thr), "cell_id")
        .filter(F.col("temp") > F.col("thr"))
        .select(
            "cell_id",
            dyadic_quantize(F.col("temp") - F.col("thr"), 4).alias("e"),
        )
    )
    agg = ex.groupBy("cell_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_exceed"),
        F.sum("e").alias("s1"),
        F.sum(F.col("e") * F.col("e")).alias("s2"),
    )
    m = F.col("s1") / F.col("n_exceed")
    v = F.when(
        F.col("n_exceed") > 1,
        (F.col("s2") - F.col("s1") * F.col("s1") / F.col("n_exceed"))
        / (F.col("n_exceed") - 1),
    )
    mm = agg.select("cell_id", "n_exceed", m.alias("m"), v.alias("v"))
    xi = F.when(
        F.col("v") > 0,
        F.lit(0.5) * (F.lit(1.0) - F.col("m") * F.col("m") / F.col("v")),
    )
    sigma = F.when(
        F.col("v") > 0,
        rq(
            F.lit(0.5)
            * F.col("m")
            * (F.lit(1.0) + F.col("m") * F.col("m") / F.col("v")),
            2,
        ),
    )
    return thr.join(mm, "cell_id", "left").select(
        "cell_id",
        rq("thr", 2).alias("thr"),
        F.coalesce("n_exceed", F.lit(0)).cast("long").alias("n_exceed"),
        rq("m", 4).alias("mean_excess"),
        xi.alias("xi"),
        sigma.alias("sigma"),
    )


# =========================================================================
# W27 (r10) — per-cell variance decomposition: how much of each cell's
# variance is seasonal cycle, how much is trend, how much is weather —
# the S8 harmonic fit composed into the standard anomaly workflow
# =========================================================================
#: shared formula strings (the Cramer-solve device): Spark F.expr and
#: the DuckDB SQL inline the SAME text, so both engines run the same
#: exactly-rounded op tree over identical dyadic sums
_VD_SST = "syy - sy * sy / nn"
_VD_SSE = "srr - sr * sr / nn"
_VD_SXXC = "sxx - sx * sx / nn"
_VD_SLOPE = f"(sxr - sx * sr / nn) / ({_VD_SXXC})"
_VD_R2S = f"CASE WHEN ({_VD_SST}) > 0 THEN 1.0 - ({_VD_SSE}) / ({_VD_SST}) END"
_VD_SLOPE_G = (
    f"CASE WHEN ({_VD_SXXC}) > 0 THEN {_VD_SLOPE} END"
)
_VD_R2T = (
    f"CASE WHEN ({_VD_SST}) > 0 AND ({_VD_SXXC}) > 0 THEN "
    f"(({_VD_SLOPE}) * ({_VD_SLOPE}) * ({_VD_SXXC})) / ({_VD_SST}) END"
)


def _VARDECOMP_SQL() -> str:
    from mhw3d_detection_spark.queries.base import REGISTRY

    harm_fit = REGISTRY["q_harmonic_clim"].sql
    return (
        f"WITH coef AS ({harm_fit}), "
        f"od AS ({ORDERS_DAILY_SQL}), "
        f"harm AS (SELECT doy, CAST(c AS DOUBLE) AS c, "
        f"  CAST(s AS DOUBLE) AS s FROM (VALUES {_HARM_VALUES}) "
        "  AS t(doy, c, s)), "
        f"j AS (SELECT od.cell_id, {rq_sql('od.temp', 2)} AS y, h.c, h.s, "
        "  CAST(datediff('day', DATE '1995-01-01', od.time) AS BIGINT) "
        "  AS x, k.a0, k.a1, k.b1 "
        f"  FROM od JOIN harm h ON h.doy = {clim_doy_sql('od.time')} "
        "  JOIN coef k ON k.cell_id = od.cell_id "
        "  WHERE k.a0 IS NOT NULL), "
        "r AS (SELECT cell_id, y, x, "
        "  y - (a0 + a1 * c + b1 * s) AS res FROM j), "
        "a AS (SELECT cell_id, CAST(count(*) AS DOUBLE) AS nn, "
        + ", ".join(
            f"sum({dyadic_quantize_sql(e, b)}) AS {n}"
            for n, e, b in (
                ("sy", "y", 6),
                ("syy", "y * y", 2),
                ("sr", "res", 6),
                ("srr", "res * res", 6),
                ("sx", "CAST(x AS DOUBLE)", 0),
                ("sxx", "CAST(x AS DOUBLE) * x", 0),
                ("sxr", "x * res", 6),
            )
        )
        + " FROM r GROUP BY 1) "
        "SELECT cell_id, CAST(nn AS BIGINT) AS n_days, "
        f"{rq_sql(_VD_SST, 0)} AS sst, "
        f"{_VD_R2S} AS r2_seasonal, "
        f"{rq_sql(_VD_SLOPE_G, 6)} AS trend_slope, "
        f"{_VD_R2T} AS r2_trend FROM a"
    )


@register("q_variance_decomposition", _VARDECOMP_SQL())
def q_variance_decomposition(spark, sf_dir):
    """W27 (r10): per-cell variance decomposition — SST of the rq2
    series, R² of the S8 harmonic seasonal fit, then the OLS trend on
    the SEASONAL RESIDUALS (the standard climate-anomaly workflow:
    remove the cycle, then trend the anomalies — trending raw values
    aliases the cycle into the slope) and its incremental R². The
    question every regime-shift monitor starts with: is this cell's
    variance cycle, drift, or weather? Composed: the S8 coefficient
    row is reused as a CTE (cells-bounded broadcast back), the 366-row
    harmonic dim is the shared-literal table, every summed term is
    dyadic-quantized (y² at 2^-2, the rest 2^-6/2^-0 — partial sums
    stay under 2^53 at these magnitudes), and all final statistics are
    ONE shared formula string per output — RAW/rq hash. Cells with a
    rank-deficient harmonic fit (NULL coefficients) are excluded, same
    as S8's guard."""
    from mhw3d_detection_spark.functions.calendar import clim_doy
    from mhw3d_detection_spark.operators.analysis import dyadic_quantize
    from mhw3d_detection_spark.operators.climatology import harmonic_fit

    od = orders_daily(spark, sf_dir)
    harm = spark.createDataFrame(
        _harm_rows(), "doy int, c double, s double"
    )
    coef = harmonic_fit(od, harm).filter(
        F.col("a0").isNotNull()
    ).select("cell_id", "a0", "a1", "b1")
    j = (
        od.withColumn("doy", clim_doy(F.col("time")))
        .join(F.broadcast(harm), "doy")
        .join(F.broadcast(coef), "cell_id")
        .select(
            "cell_id",
            rq("temp", 2).alias("y"),
            "c",
            "s",
            F.datediff(
                F.col("time"), F.lit("1995-01-01").cast("date")
            ).cast("long").alias("x"),
            "a0",
            "a1",
            "b1",
        )
    )
    r = j.select(
        "cell_id",
        "y",
        "x",
        (
            F.col("y")
            - (
                F.col("a0")
                + F.col("a1") * F.col("c")
                + F.col("b1") * F.col("s")
            )
        ).alias("res"),
    )
    a = r.groupBy("cell_id").agg(
        F.count(F.lit(1)).cast("double").alias("nn"),
        F.sum(dyadic_quantize(F.col("y"), 6)).alias("sy"),
        F.sum(dyadic_quantize(F.col("y") * F.col("y"), 2)).alias("syy"),
        F.sum(dyadic_quantize(F.col("res"), 6)).alias("sr"),
        F.sum(dyadic_quantize(F.col("res") * F.col("res"), 6)).alias(
            "srr"
        ),
        F.sum(dyadic_quantize(F.col("x").cast("double"), 0)).alias("sx"),
        F.sum(
            dyadic_quantize(F.col("x").cast("double") * F.col("x"), 0)
        ).alias("sxx"),
        F.sum(dyadic_quantize(F.col("x") * F.col("res"), 6)).alias("sxr"),
    )
    return a.select(
        "cell_id",
        F.col("nn").cast("long").alias("n_days"),
        rq(F.expr(_VD_SST), 0).alias("sst"),
        F.expr(_VD_R2S).alias("r2_seasonal"),
        rq(F.expr(_VD_SLOPE_G), 6).alias("trend_slope"),
        F.expr(_VD_R2T).alias("r2_trend"),
    )

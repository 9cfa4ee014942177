"""Relational-surface queries (SURVEY.md §2.1, 2.2, 2.4, 2.5 A11, 2.7):
scans, filters, joins (equi/semi/anti/interval/as-of), distinct/rollup,
sort/top-k, union/except.

The reference's analogues are cited per-query; J5-J8/A11/O2-O4 are
surface-completeness operators the reference lacks (SURVEY §2.4 J5-J8).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from mhw3d_detection_spark.operators.analysis import dyadic_quantize_sql
from mhw3d_detection_spark.queries.base import _rq_eps, register, rq, rq_sql
from mhw3d_detection_spark.sources.tables import load_table


# --- SC1/P1: scan + projection (column pruning reaches the parquet scan) ---
@register(
    "q_scan_project",
    "SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice FROM lineitem",
)
def q_scan_project(spark, sf_dir):
    """Reference: `_to_da` variable selection (common/core.py:20-34) —
    projection prunes the parquet scan to 4 of 11 columns."""
    return load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice"
    )


# --- P2: baseline-period filter (predicate pushdown) ---
@register(
    "q_filter_year_range",
    "SELECT CAST(year(l_shipdate) AS INT) AS ship_year, count(*) AS n, "
    f"{rq_sql('sum(l_quantity)', 2)} AS sum_qty "
    "FROM lineitem WHERE year(l_shipdate) BETWEEN 1996 AND 1998 GROUP BY 1",
)
def q_filter_year_range(spark, sf_dir):
    """Reference: keep years y0<=y<=y1 before climatology
    (legacy/climatology.py:159-161)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.year("l_shipdate").between(1996, 1998))
        .groupBy(F.year("l_shipdate").cast("int").alias("ship_year"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            rq(F.sum("l_quantity"), 2).alias("sum_qty"),
        )
    )


# --- P4: conjunctive range predicates (spatial box subset) ---
@register(
    "q_filter_spatial_box",
    "SELECT c_custkey, c_nationkey, c_acctbal FROM customer "
    "WHERE c_acctbal BETWEEN 1000 AND 5000 AND c_nationkey BETWEEN 5 AND 15",
)
def q_filter_spatial_box(spark, sf_dir):
    """Reference: sel(lat=slice(...), lon=slice(...))
    (Check_against_oliver.ipynb cell 2) as conjunctive ranges."""
    c = load_table(spark, sf_dir, "customer")
    return c.filter(
        F.col("c_acctbal").between(1000, 5000) & F.col("c_nationkey").between(5, 15)
    ).select("c_custkey", "c_nationkey", "c_acctbal")


# --- J5: hash equi-join (broadcast: customer is the small dim) ---
@register(
    "q_join_hash_equi",
    "SELECT c_nationkey AS nationkey, count(*) AS n_orders, "
    f"{rq_sql('sum(o_totalprice)', 0)} AS revenue "
    "FROM orders JOIN customer ON o_custkey = c_custkey GROUP BY 1",
)
def q_join_hash_equi(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            rq(F.sum("o_totalprice"), 0).alias("revenue"),
        )
    )


# --- J6: semi join ---
@register(
    "q_join_semi",
    "SELECT c_custkey FROM customer WHERE c_custkey IN (SELECT o_custkey FROM orders)",
)
def q_join_semi(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey")


# --- J7: anti join ---
@register(
    "q_join_anti",
    "SELECT c_custkey FROM customer "
    "WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)",
)
def q_join_anti(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey")


# --- J2: event-interval / range join ---
@register(
    "q_event_interval_join",
    f"SELECT o_orderpriority, count(*) AS n, {rq_sql('sum(l_extendedprice)', 0)} AS rev "
    "FROM orders JOIN lineitem ON l_orderkey = o_orderkey "
    "AND l_shipdate >= o_orderdate AND l_shipdate <= o_orderdate + INTERVAL 90 DAY "
    "GROUP BY 1",
)
def q_event_interval_join(spark, sf_dir):
    """Reference J2: interval-membership mask date_start<=t<=date_end
    (common/core.py:110-111) as an equi+range join."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    cond = (
        (li.l_orderkey == o.o_orderkey)
        & (li.l_shipdate >= o.o_orderdate)
        & (li.l_shipdate <= F.timestamp_add("DAY", F.lit(90), o.o_orderdate))
    )
    return (
        li.join(o, cond)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            rq(F.sum("l_extendedprice"), 0).alias("rev"),
        )
    )


# --- J8: as-of join (most recent prior 'click' for each 'error') ---
@register(
    "q_join_asof",
    """
    WITH err AS (SELECT user_id, epoch_us(ts) AS err_us FROM events WHERE event_type = 'error'),
         clk AS (SELECT user_id, epoch_us(ts) AS clk_us FROM events WHERE event_type = 'click')
    SELECT e.user_id, e.err_us, c.clk_us
    FROM err e ASOF LEFT JOIN clk c
      ON e.user_id = c.user_id AND e.err_us >= c.clk_us
    """,
)
def q_join_asof(spark, sf_dir):
    """As-of join, Spark-first: instead of a per-row backward search, a
    single window pass over the unioned stream — `last(click_ts)
    ignorenulls` over rows-unbounded-preceding. One shuffle on user_id;
    no range join. Equal-timestamp ties order clicks first, matching
    ASOF's >= bound. (Not in reference; SURVEY §2.4 J5-J8.)"""
    ev = load_table(spark, sf_dir, "events").withColumn(
        "us", F.unix_micros("ts")
    )
    both = ev.filter(F.col("event_type").isin("error", "click")).select(
        "user_id",
        "us",
        F.col("event_type"),
        F.when(F.col("event_type") == "click", F.col("us")).alias("clk"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("us", F.when(F.col("event_type") == "click", 0).otherwise(1))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        both.withColumn("clk_us", F.last("clk", ignorenulls=True).over(w))
        .filter(F.col("event_type") == "error")
        .select("user_id", F.col("us").alias("err_us"), "clk_us")
    )


# --- A11: distinct aggregates ---
@register(
    "q_agg_distinct",
    "SELECT l_returnflag, count(DISTINCT l_suppkey) AS n_supp, "
    "count(DISTINCT l_partkey) AS n_part, count(*) AS n FROM lineitem GROUP BY 1",
)
def q_agg_distinct(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct("l_partkey").alias("n_part"),
        F.count(F.lit(1)).alias("n"),
    )


# --- A11: rollup ---
@register(
    "q_agg_rollup",
    "SELECT coalesce(l_returnflag, 'ALL') AS returnflag, "
    "coalesce(l_linestatus, 'ALL') AS linestatus, count(*) AS n, "
    f"{rq_sql('sum(l_extendedprice * (1 - l_discount))', 0)} AS net_rev "
    "FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)",
)
def q_agg_rollup(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            rq(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 0).alias(
                "net_rev"
            ),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "n",
            "net_rev",
        )
    )


# --- O2: top-k (rank <= k with deterministic tie-break) ---
@register(
    "q_topk_events",
    "SELECT event_id, user_id, value FROM events "
    "ORDER BY value DESC, event_id LIMIT 100",
)
def q_topk_events(spark, sf_dir):
    """O2: orderBy(desc).limit(k). At cluster scale Spark executes this
    as a TakeOrderedAndProject (per-partition top-k + merge), no full
    sort. Tie-break on event_id keeps it deterministic."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.orderBy(F.desc("value"), "event_id")
        .select("event_id", "user_id", "value")
        .limit(100)
    )


# --- O1: sort made observable via global rank ---
@register(
    "q_sort_events",
    "SELECT event_id, value, CAST(row_number() OVER (ORDER BY value DESC, event_id) AS BIGINT) AS pos "
    "FROM events QUALIFY pos <= 500",
)
def q_sort_events(spark, sf_dir):
    """O1 sort: canonical total order (value desc, event_id) surfaced
    as a rank column via the distributed two-phase rank
    (operators.analysis._global_row_number: range-repartition +
    per-partition rank + broadcast prefix-sum offsets — no
    single-partition window over the data)."""
    from mhw3d_detection_spark.operators.analysis import _global_row_number

    ev = load_table(spark, sf_dir, "events")
    ranked = _global_row_number(
        ev.select("event_id", "value"),
        [F.desc("value"), F.col("event_id")],
        "pos",
    )
    return ranked.select(
        "event_id", "value", F.col("pos").cast("long").alias("pos")
    ).filter(F.col("pos") <= 500)


# --- O3: union all ---
@register(
    "q_union_all",
    "SELECT side, nationkey, count(*) AS n FROM ("
    "  SELECT 'supplier' AS side, s_nationkey AS nationkey FROM supplier "
    "  UNION ALL SELECT 'customer', c_nationkey FROM customer"
    ") GROUP BY 1, 2",
)
def q_union_all(spark, sf_dir):
    s = load_table(spark, sf_dir, "supplier").select(
        F.lit("supplier").alias("side"), F.col("s_nationkey").alias("nationkey")
    )
    c = load_table(spark, sf_dir, "customer").select(
        F.lit("customer").alias("side"), F.col("c_nationkey").alias("nationkey")
    )
    return s.unionByName(c).groupBy("side", "nationkey").agg(F.count(F.lit(1)).alias("n"))


# --- O4: except all ---
@register(
    "q_set_except",
    "SELECT nationkey, count(*) AS n FROM ("
    "  SELECT c_nationkey AS nationkey FROM customer "
    "  EXCEPT ALL SELECT s_nationkey FROM supplier"
    ") GROUP BY 1",
)
def q_set_except(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return c.exceptAll(s).groupBy("nationkey").agg(F.count(F.lit(1)).alias("n"))


# --- data-profiling utility: per-column stats in one scan ---
_PROFILE_COLS = ("l_quantity", "l_extendedprice", "l_discount", "l_tax")
_PROFILE_SQL = (
    "WITH a AS (SELECT "
    + ", ".join(
        f"{rq_sql(f'min({c})', 4)} AS min_{i}, "
        f"{rq_sql(f'max({c})', 4)} AS max_{i}, "
        f"{rq_sql(f'avg({c})', 4)} AS mean_{i}, "
        f"CAST(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_{i}, "
        f"CAST(count(DISTINCT {c}) AS BIGINT) AS nd_{i}"
        for i, c in enumerate(_PROFILE_COLS)
    )
    + " FROM lineitem) "
    + " UNION ALL ".join(
        f"SELECT '{c}' AS col_name, min_{i} AS min_val, max_{i} AS max_val, "
        f"mean_{i} AS mean_val, null_{i} AS n_null, nd_{i} AS n_distinct FROM a"
        for i, c in enumerate(_PROFILE_COLS)
    )
)


@register("q_profile_columns", _PROFILE_SQL)
def q_profile_columns(spark, sf_dir):
    """Ingestion-validation profile: min/max/mean/null-count/distinct
    for the numeric lineitem columns, one row per column — the check a
    pipeline runs on every new shard before accepting it. ONE scan:
    every per-column aggregate runs in a single global aggregate over
    one pass of the table, and the 1-row result is unpivoted to
    per-column rows with `stack` (row-local). At 100 TB swap
    countDistinct for approx_count_distinct (HLL) — same plan shape."""
    li = load_table(spark, sf_dir, "lineitem")
    aggs = []
    for i, c in enumerate(_PROFILE_COLS):
        aggs += [
            rq(F.min(c), 4).alias(f"min_{i}"),
            rq(F.max(c), 4).alias(f"max_{i}"),
            rq(F.avg(c), 4).alias(f"mean_{i}"),
            F.sum(F.isnull(c).cast("long")).alias(f"null_{i}"),
            F.countDistinct(c).cast("long").alias(f"nd_{i}"),
        ]
    one = li.agg(*aggs)
    stack = ", ".join(
        f"'{c}', min_{i}, max_{i}, mean_{i}, null_{i}, nd_{i}"
        for i, c in enumerate(_PROFILE_COLS)
    )
    return one.select(
        F.expr(
            f"stack({len(_PROFILE_COLS)}, {stack}) AS "
            "(col_name, min_val, max_val, mean_val, n_null, n_distinct)"
        )
    )


# --- event-log analytics: per-user sessionization (clickstream shape) ---
_SESS_WIN = "OVER (PARTITION BY user_id ORDER BY us, event_id)"
@register(
    "q_user_sessions",
    "WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS us FROM events), "
    f"l AS (SELECT user_id, event_id, us, lag(us) {_SESS_WIN} AS pus FROM e), "
    "m AS (SELECT user_id, event_id, us, "
    "  CASE WHEN pus IS NULL OR us - pus > 7200000000 THEN 1 ELSE 0 END AS new_s "
    "  FROM l), "
    "s AS (SELECT user_id, us, CAST(sum(new_s) "
    f"{_SESS_WIN.replace('ORDER BY', 'ORDER BY').rstrip(')')} "
    "  ROWS UNBOUNDED PRECEDING) AS INT) AS session_id FROM m) "
    "SELECT user_id, session_id, CAST(count(*) AS INT) AS n_events, "
    "min(us) AS start_us, max(us) AS end_us, "
    "max(us) - min(us) AS duration_us "
    "FROM s GROUP BY 1, 2",
)
def q_user_sessions(spark, sf_dir):
    """Per-user event sessionization (the clickstream twin of the MHW
    gaps-and-islands chain, on REAL sub-second timestamps): a new
    session starts when the gap to the previous event exceeds 2 h.
    One window pass partitioned by user (parallel across users at any
    log size) + one hash aggregate; all times emitted as integer epoch
    micros so the cross-engine compare is exact."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", F.unix_micros("ts").alias("us")
    )
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    new_s = (
        F.isnull(F.lag("us").over(w))
        | (F.col("us") - F.lag("us").over(w) > 7_200_000_000)
    ).cast("int")
    sess = (
        ev.withColumn("__new", new_s)
        .withColumn(
            "session_id",
            F.sum("__new")
            .over(w.rowsBetween(Window.unboundedPreceding, 0))
            .cast("int"),
        )
    )
    return sess.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).cast("int").alias("n_events"),
        F.min("us").alias("start_us"),
        F.max("us").alias("end_us"),
        (F.max("us") - F.min("us")).alias("duration_us"),
    )


# --- event-log analytics: view -> purchase conversion funnel ---
@register(
    "q_event_funnel",
    "WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us FROM events), "
    "v AS (SELECT user_id, min(us) AS first_view_us FROM e "
    "  WHERE event_type = 'view' GROUP BY 1), "
    "p AS (SELECT e.user_id, min(e.us) AS first_purchase_us "
    "  FROM e JOIN v USING (user_id) "
    "  WHERE e.event_type = 'purchase' AND e.us >= v.first_view_us GROUP BY 1) "
    "SELECT v.user_id, v.first_view_us, p.first_purchase_us, "
    "CAST(p.first_purchase_us IS NOT NULL AS INT) AS converted, "
    "p.first_purchase_us - v.first_view_us AS ttc_us "
    "FROM v LEFT JOIN p ON p.user_id = v.user_id",
)
def q_event_funnel(spark, sf_dir):
    """View -> purchase conversion funnel: for each user with a view,
    the first purchase at-or-after their first view, the conversion
    flag and time-to-convert. Two tiny per-user aggregates + one
    equi-join — every step keyed by user_id, so the plan is one
    partitioning shared end to end."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", F.unix_micros("ts").alias("us")
    )
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("us").alias("first_view_us"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(v, "user_id")
        .filter(F.col("us") >= F.col("first_view_us"))
        .groupBy("user_id")
        .agg(F.min("us").alias("first_purchase_us"))
    )
    return v.join(p, "user_id", "left").select(
        "user_id",
        "first_view_us",
        "first_purchase_us",
        F.col("first_purchase_us").isNotNull().cast("int").alias("converted"),
        (F.col("first_purchase_us") - F.col("first_view_us")).alias("ttc_us"),
    )


# --- quantile profile: exact p25/p50/p75 per numeric column, one scan ---
_QPROF_SQL = (
    "WITH a AS (SELECT "
    + ", ".join(
        f"quantile_cont({c}, 0.25) AS q25_{i}, "
        f"quantile_cont({c}, 0.50) AS q50_{i}, "
        f"quantile_cont({c}, 0.75) AS q75_{i}"
        for i, c in enumerate(_PROFILE_COLS)
    )
    + " FROM lineitem) "
    + " UNION ALL ".join(
        f"SELECT '{c}' AS col_name, {rq_sql(f'q25_{i}', 4)} AS p25, "
        f"{rq_sql(f'q50_{i}', 4)} AS p50, {rq_sql(f'q75_{i}', 4)} AS p75, "
        f"{rq_sql(f'q75_{i} - q25_{i}', 4)} AS iqr FROM a"
        for i, c in enumerate(_PROFILE_COLS)
    )
)


@register("q_profile_quantiles", _QPROF_SQL)
def q_profile_quantiles(spark, sf_dir):
    """A12b: robust per-column location/spread — exact linear-interp
    p25/p50/p75 and IQR for the numeric lineitem columns, one row per
    column from ONE scan (all percentile aggregates share a single
    global aggregate; the 1-row result unpivots row-locally via stack).
    Per-group state is the sorted value buffer; at 100 TB swap
    percentile -> approx_percentile (t-digest) with the identical plan
    shape — same trade the threshold kernel documents."""
    li = load_table(spark, sf_dir, "lineitem")
    aggs = []
    for i, c in enumerate(_PROFILE_COLS):
        aggs.append(
            F.expr(f"percentile({c}, array(0.25, 0.5, 0.75))").alias(f"q_{i}")
        )
    one = li.agg(*aggs)
    stack = ", ".join(f"'{c}', q_{i}[0], q_{i}[1], q_{i}[2]" for i, c in enumerate(_PROFILE_COLS))
    return one.select(
        F.expr(
            f"stack({len(_PROFILE_COLS)}, {stack}) AS (col_name, p25, p50, p75)"
        )
    ).select(
        "col_name",
        rq("p25", 4).alias("p25"),
        rq("p50", 4).alias("p50"),
        rq("p75", 4).alias("p75"),
        rq(F.col("p75") - F.col("p25"), 4).alias("iqr"),
    )


# --- cohort retention: weekly cohorts x activity offsets ---
_WEEK_US = 7 * 86400 * 1_000_000


@register(
    "q_cohort_retention",
    "WITH e AS (SELECT user_id, epoch_us(ts) AS us FROM events), "
    # pmod-floor in BOTH engines: DuckDB's // TRUNCATES toward zero
    # (verified: (-1)//W = 0), same as Spark's DIV — so each side
    # subtracts the POSITIVE remainder first, making the division exact
    # and the bucket a true floor for either sign of epoch_us
    f"wk AS (SELECT DISTINCT user_id, "
    f"  (us - ((us % {_WEEK_US}) + {_WEEK_US}) % {_WEEK_US}) // {_WEEK_US} "
    "  AS week FROM e), "
    "coh AS (SELECT user_id, min(week) AS cohort_week FROM wk GROUP BY 1), "
    "act AS (SELECT c.cohort_week, w.week - c.cohort_week AS week_offset, "
    "  w.user_id FROM wk w JOIN coh c ON w.user_id = c.user_id), "
    "n AS (SELECT cohort_week, week_offset, "
    "  CAST(count(*) AS BIGINT) AS n_active FROM act GROUP BY 1, 2), "
    "sz AS (SELECT cohort_week, CAST(count(*) AS BIGINT) AS cohort_size "
    "  FROM coh GROUP BY 1) "
    "SELECT n.cohort_week, n.week_offset, n.n_active, sz.cohort_size, "
    "  n.n_active / CAST(sz.cohort_size AS DOUBLE) AS retention "
    "FROM n JOIN sz ON n.cohort_week = sz.cohort_week",
)
def q_cohort_retention(spark, sf_dir):
    """W14ev (r7): weekly cohort retention over the event log — users
    cohorted by their first-activity week, per (cohort, week-offset)
    the fraction still active. The canonical product-analytics rollup
    the sessionization/funnel family was missing. Weeks are integer
    FLOOR-division epoch buckets — BOTH engines' integer division
    truncates toward zero, so BOTH sides subtract the positive
    remainder (pmod) before dividing, making truncation equal floor
    for pre-1970 epochs too (no calendar/date_trunc semantics to
    diverge cross-engine); activity is the distinct
    (user, week) set, so the per-cell count IS the distinct-user
    count without a countDistinct state; retention is one exact
    integer division. Three hash aggregates + one users-sized join —
    every key is (user) or (cohort, offset); no windows, no skew
    hazard beyond the cohort dimension itself."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.unix_micros("ts").alias("us")
    )
    # floor division in BOTH engines: Spark's DIV and DuckDB's //
    # each truncate toward zero (DuckDB verified: (-1)//W = 0), which
    # would shift any pre-1970 timestamp's cohort by one week relative
    # to true floor bucketing. Subtracting the POSITIVE remainder
    # (pmod) first makes the division exact, so truncation IS floor —
    # and the oracle SQL applies the identical construction.
    wk = ev.select(
        "user_id",
        F.expr(
            f"(us - pmod(us, {_WEEK_US})) DIV {_WEEK_US}"
        ).alias("week"),
    ).distinct()
    coh = wk.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    act = wk.join(coh, "user_id").select(
        "cohort_week",
        (F.col("week") - F.col("cohort_week")).alias("week_offset"),
        "user_id",
    )
    n = act.groupBy("cohort_week", "week_offset").agg(
        F.count(F.lit(1)).alias("n_active")
    )
    sz = coh.groupBy("cohort_week").agg(
        F.count(F.lit(1)).alias("cohort_size")
    )
    return n.join(sz, "cohort_week").select(
        "cohort_week",
        "week_offset",
        "n_active",
        "cohort_size",
        (
            F.col("n_active") / F.col("cohort_size").cast("double")
        ).alias("retention"),
    )


# =========================================================================
# J9 (r7) — salted skew join (the manual skew-split regime)
# =========================================================================
#: the events stream joined to its per-type stats is the WORST-case
#: skew shape: ~5 distinct keys over the whole table, every key hot
#: (key_skew_profile top1_share ~ 0.25 >> 1/32 partitions)
_SALTED_SQL = (
    "WITH dim AS (SELECT event_type, "
    f"  {rq_sql('avg(value)', 6)} AS type_avg FROM events GROUP BY 1) "
    "SELECT e.event_type, CAST(count(*) AS INT) AS n_rows, "
    "CAST(count(CASE WHEN e.value > d.type_avg THEN 1 END) AS INT) AS n_above, "
    "max(d.type_avg) AS type_avg "
    "FROM events e JOIN dim d USING (event_type) GROUP BY 1"
)


@register("q_join_salted", _SALTED_SQL)
def q_join_salted(spark, sf_dir):
    """J9 (r7): dimension lookup over a pathologically skewed key
    (~5 event types, every key hot) through ``salted_join`` — the
    big side salted by row hash, the dim replicated 8x, the join on
    (key, salt) with a forced sort-merge hint (the no-broadcast regime
    salting exists for). The oracle is the PLAIN unsalted join: the
    hash match is the salt-invariance proof (any salt assignment, same
    result). The dim's avg is rq6-quantized BEFORE the comparison so
    the value > type_avg decision sits off the engines' sum-order
    noise floor."""
    from mhw3d_detection_spark.operators.analysis import salted_join

    ev = load_table(spark, sf_dir, "events").select("event_type", "value")
    dim = ev.groupBy("event_type").agg(rq(F.avg("value"), 6).alias("type_avg"))
    j = salted_join(ev, dim, ["event_type"], n_salts=8, strategy="merge")
    return j.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("int").alias("n_rows"),
        F.count(F.when(F.col("value") > F.col("type_avg"), 1))
        .cast("int")
        .alias("n_above"),
        F.max("type_avg").alias("type_avg"),
    )


# =========================================================================
# DQ1 (r7) — data-quality expectation report across the warehouse
# =========================================================================
_DQ_SQL = (
    "SELECT * FROM ("
    "SELECT 'ev_error_rows' AS check_name, "
    "  count(CASE WHEN coalesce(event_type = 'error', TRUE) THEN 1 END) AS n_violations, "
    "  count(*) AS n_checked FROM events "
    "UNION ALL "
    "SELECT 'ev_value_null_nan', "
    "  count(CASE WHEN coalesce(value IS NULL OR isnan(value), TRUE) THEN 1 END), count(*) "
    "FROM events "
    "UNION ALL "
    "SELECT 'li_discount_range', "
    "  count(CASE WHEN coalesce(NOT (l_discount >= 0 AND l_discount <= 0.1), TRUE) THEN 1 END), "
    "  count(*) FROM lineitem "
    "UNION ALL "
    "SELECT 'li_quantity_range', "
    "  count(CASE WHEN coalesce(NOT (l_quantity > 0 AND l_quantity <= 50), TRUE) THEN 1 END), "
    "  count(*) FROM lineitem "
    "UNION ALL "
    "SELECT 'li_shipdate_window', "
    "  count(CASE WHEN coalesce(NOT (l_shipdate >= DATE '1992-01-01' "
    "    AND l_shipdate <= DATE '1998-12-31'), TRUE) THEN 1 END), "
    "  count(*) FROM lineitem "
    "UNION ALL "
    "SELECT 'orders_orphan_custkey', "
    "  (SELECT count(*) FROM orders o WHERE NOT EXISTS "
    "    (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)), "
    "  count(*) FROM orders "
    "UNION ALL "
    "SELECT 'lineitem_orphan_orderkey', "
    "  (SELECT count(*) FROM lineitem l WHERE NOT EXISTS "
    "    (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)), "
    "  count(*) FROM lineitem "
    "UNION ALL "
    "SELECT 'orders_pk_duplicates', "
    "  count(*) - count(DISTINCT o_orderkey), count(*) FROM orders"
    ") ORDER BY check_name"
)


@register("q_data_quality", _DQ_SQL)
def q_data_quality(spark, sf_dir):
    """DQ1 (r7): the pre-training audit — range/consistency
    expectations (one shared scan + stacked conditional counts per
    table), referential-integrity orphans (left anti joins), and
    primary-key uniqueness, unioned into one (check_name,
    n_violations, n_checked) report. Exercises BOTH states on this
    data: ev_error_rows and li_shipdate_window fire, the rest are
    clean zeros. All-integer output — no quantization anywhere."""
    from mhw3d_detection_spark.operators.dataqc import (
        duplicate_keys,
        expectation_report,
        referential_orphans,
    )

    ev = load_table(spark, sf_dir, "events")
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    rep = expectation_report(
        ev,
        {
            "ev_error_rows": F.col("event_type") == "error",
            "ev_value_null_nan": F.col("value").isNull() | F.isnan("value"),
        },
    ).unionAll(
        expectation_report(
            li,
            {
                "li_discount_range": ~F.col("l_discount").between(0.0, 0.1),
                "li_quantity_range": ~(
                    (F.col("l_quantity") > 0) & (F.col("l_quantity") <= 50)
                ),
                "li_shipdate_window": ~F.col("l_shipdate").between(
                    "1992-01-01", "1998-12-31"
                ),
            },
        )
    ).unionAll(
        referential_orphans(o, c, "o_custkey", "c_custkey", "orders_orphan_custkey")
    ).unionAll(
        referential_orphans(
            li, o, "l_orderkey", "o_orderkey", "lineitem_orphan_orderkey"
        )
    ).unionAll(duplicate_keys(o, "o_orderkey", "orders_pk_duplicates"))
    return rep.orderBy("check_name")


# =========================================================================
# J10 (r8) — the canonical multi-join analytics shape (TPC-H Q5):
# three broadcast dims chained onto the orders x lineitem fact join
# =========================================================================
def _dq6_rev_sql() -> str:
    from mhw3d_detection_spark.operators.analysis import dyadic_quantize_sql

    # per-line revenue on the 1/64 dyadic grid: the group sums become
    # association-free, so nation totals hash as RAW doubles
    return dyadic_quantize_sql("l_extendedprice * (1 - l_discount)", 6)


_DQ6_REV = _dq6_rev_sql()


@register(
    "q_tpch_q5_shape",
    "WITH l AS (SELECT l_orderkey, l_suppkey, "
    + _DQ6_REV
    + " AS rev FROM lineitem), "
    "j AS (SELECT n.n_name, l.rev "
    "  FROM region r "
    "  JOIN nation n ON n.n_regionkey = r.r_regionkey "
    "  JOIN supplier s ON s.s_nationkey = n.n_nationkey "
    "  JOIN customer c ON c.c_nationkey = s.s_nationkey "
    "  JOIN orders o ON o.o_custkey = c.c_custkey "
    "  JOIN l ON l.l_orderkey = o.o_orderkey "
    "    AND l.l_suppkey = s.s_suppkey "
    "  WHERE r.r_name = 'ASIA' "
    "    AND o.o_orderdate >= TIMESTAMP '1995-01-01' "
    "    AND o.o_orderdate < TIMESTAMP '1997-01-01') "
    "SELECT n_name, sum(rev) AS revenue, CAST(count(*) AS BIGINT) AS n_items "
    "FROM j GROUP BY 1",
)
def q_tpch_q5_shape(spark, sf_dir):
    """J10 (r8): the TPC-H Q5 'local supplier volume' shape — the
    canonical 6-table analytics join the relational surface was
    missing: region->nation->supplier/customer dim chain onto the
    orders x lineitem fact-fact join, with the c_nationkey =
    s_nationkey locality condition, a region filter and an order-date
    range. Spark-first: all four dims broadcast (Catalyst chains the
    BroadcastHashJoins with no shuffle until the fact join), the date
    filter pushes into the orders scan, and the single big shuffle is
    orders x lineitem on the order key. Per-line revenue
    price*(1-discount) is DYADIC-quantized (1/64) BEFORE the group
    sum, so the nation totals are association-free exact dyadics —
    unrounded raw-double hash across engines."""
    from mhw3d_detection_spark.operators.analysis import dyadic_quantize

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_suppkey",
        dyadic_quantize(
            F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")), 6
        ).alias("rev"),
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    j = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(
            F.broadcast(supp),
            (li.l_suppkey == supp.s_suppkey)
            & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nat), supp.s_nationkey == nat.n_nationkey)
        .join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
    )
    return j.groupBy("n_name").agg(
        F.sum("rev").alias("revenue"),
        F.count(F.lit(1)).cast("long").alias("n_items"),
    )


# --- J10b (r10): TPC-H Q1 pricing-summary shape ---
@register(
    "q_tpch_q1_shape",
    "WITH l AS (SELECT l_returnflag, l_linestatus, "
    "  floor(l_quantity * 64.0 + 0.5000152587890625) / 64.0 AS qty, "
    "  floor(l_extendedprice * 64.0 + 0.5000152587890625) / 64.0 AS base, "
    "  floor(l_extendedprice * (1.0 - l_discount) * 64.0 "
    "    + 0.5000152587890625) / 64.0 AS disc_price, "
    "  floor(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) * 64.0 "
    "    + 0.5000152587890625) / 64.0 AS charge "
    "  FROM lineitem WHERE l_shipdate <= TIMESTAMP '2001-08-06') "
    "SELECT l_returnflag, l_linestatus, "
    "sum(qty) AS sum_qty, sum(base) AS sum_base_price, "
    "sum(disc_price) AS sum_disc_price, sum(charge) AS sum_charge, "
    "CAST(count(*) AS BIGINT) AS count_order, "
    "sum(qty) / count(*) AS avg_qty, "
    "sum(base) / count(*) AS avg_price "
    "FROM l GROUP BY 1, 2",
)
def q_tpch_q1_shape(spark, sf_dir):
    """J10b (r10): the TPC-H Q1 pricing-summary shape — the canonical
    wide-aggregate scan (4 measure sums + counts + averages over a
    date-filtered fact table, 2-key group). Spark-first: the shipdate
    predicate pushes into the parquet scan, map-side partial
    aggregation reduces everything before one 6-key shuffle. Every
    measure is DYADIC-quantized (1/64, the q_tpch_q5_shape device)
    before its sum so the group totals are association-free exact
    dyadics, and the averages are exact divisions of those dyadics by
    integer counts — unrounded raw-double hash across engines."""
    from mhw3d_detection_spark.operators.analysis import dyadic_quantize

    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("2001-08-06").cast("timestamp")
    )
    one = F.lit(1.0)
    l = li.select(
        "l_returnflag",
        "l_linestatus",
        dyadic_quantize(F.col("l_quantity"), 6).alias("qty"),
        dyadic_quantize(F.col("l_extendedprice"), 6).alias("base"),
        dyadic_quantize(
            F.col("l_extendedprice") * (one - F.col("l_discount")), 6
        ).alias("disc_price"),
        dyadic_quantize(
            F.col("l_extendedprice")
            * (one - F.col("l_discount"))
            * (one + F.col("l_tax")),
            6,
        ).alias("charge"),
    )
    return l.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum("qty").alias("sum_qty"),
        F.sum("base").alias("sum_base_price"),
        F.sum("disc_price").alias("sum_disc_price"),
        F.sum("charge").alias("sum_charge"),
        F.count(F.lit(1)).cast("long").alias("count_order"),
        (F.sum("qty") / F.count(F.lit(1))).alias("avg_qty"),
        (F.sum("base") / F.count(F.lit(1))).alias("avg_price"),
    )


# --- J10c (r10): TPC-H Q3 shipping-priority shape (top-10) ---
@register(
    "q_tpch_q3_shape",
    "WITH c AS (SELECT c_custkey FROM customer "
    "  WHERE c_mktsegment = 'BUILDING'), "
    "o AS (SELECT o_orderkey, o_custkey, o_orderdate, o_orderpriority "
    "  FROM orders WHERE o_orderdate < TIMESTAMP '1997-06-01'), "
    "l AS (SELECT l_orderkey, "
    "  floor(l_extendedprice * (1.0 - l_discount) * 64.0 "
    "    + 0.5000152587890625) / 64.0 AS rev "
    "  FROM lineitem WHERE l_shipdate > TIMESTAMP '1997-06-01') "
    "SELECT l.l_orderkey, sum(l.rev) AS revenue, "
    "CAST(o.o_orderdate AS DATE) AS orderdate, o.o_orderpriority "
    "FROM c JOIN o ON c.c_custkey = o.o_custkey "
    "JOIN l ON l.l_orderkey = o.o_orderkey "
    "GROUP BY 1, 3, 4 ORDER BY revenue DESC, l_orderkey LIMIT 10",
)
def q_tpch_q3_shape(spark, sf_dir):
    """J10c (r10): the TPC-H Q3 shipping-priority shape — segment-dim
    semi-filter onto the orders x lineitem join, per-order revenue,
    top-10. Spark-first: the BUILDING customer projection broadcasts,
    both date predicates push into their scans, the one shuffle is the
    order-key fact join, and the top-10 is a TakeOrdered (never a
    global sort). Per-line revenue dyadic-quantized (1/64) before the
    group sum, so the ORDER BY ranks exact dyadics and ties break on
    the integer order key — deterministic top-10 across engines."""
    from mhw3d_detection_spark.operators.analysis import dyadic_quantize

    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    ).select("c_custkey")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1997-06-01").cast("timestamp")
    ).select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1997-06-01").cast("timestamp")
    ).select(
        "l_orderkey",
        dyadic_quantize(
            F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")), 6
        ).alias("rev"),
    )
    j = li.join(orders, li.l_orderkey == orders.o_orderkey).join(
        F.broadcast(cust), orders.o_custkey == cust.c_custkey
    )
    agg = j.groupBy(
        "l_orderkey",
        F.col("o_orderdate").cast("date").alias("orderdate"),
        "o_orderpriority",
    ).agg(F.sum("rev").alias("revenue"))
    return agg.select(
        "l_orderkey", "revenue", "orderdate", "o_orderpriority"
    ).orderBy(F.desc("revenue"), "l_orderkey").limit(10)


# --- DQ2 (r10): Benford first-digit audit over order totals ---
def _BENFORD_SQL() -> str:
    import math

    from mhw3d_detection_spark.operators.analysis import (
        dyadic_quantize_sql as _dq,
    )

    from mhw3d_detection_spark.queries.base import dlit

    exp_case = "CASE " + " ".join(
        f"WHEN s.digit = {d} THEN {dlit(math.log10(1.0 + 1.0 / d))}"
        for d in range(1, 10)
    ) + " END"
    term = _dq(
        "(n - tot * exp_freq) * (n - tot * exp_freq) / (tot * exp_freq)",
        20,
    )
    return (
        # >= 1, not > 0: values in (0,1) floor to first digit 0,
        # which would count in the grand total yet fall off the 1..9
        # spine — deflating every obs_freq (code-review r10w2 #6)
        "WITH d AS (SELECT CAST(substr(CAST(CAST(floor(o_totalprice) "
        "  AS BIGINT) AS VARCHAR), 1, 1) AS INT) AS digit FROM orders "
        "  WHERE o_totalprice >= 1), "
        "c AS (SELECT digit, CAST(count(*) AS BIGINT) AS n FROM d "
        "  GROUP BY 1), "
        "spine AS (SELECT CAST(unnest(generate_series(1, 9)) AS INT) "
        "  AS digit), "
        "t AS (SELECT CAST(sum(n) AS BIGINT) AS tot FROM c), "
        f"f AS (SELECT s.digit, coalesce(c.n, 0) AS n, CAST({exp_case} "
        "  AS DOUBLE) AS exp_freq FROM spine s "
        "  LEFT JOIN c ON s.digit = c.digit), "
        "p AS (SELECT f.digit, f.n, CAST(f.n AS DOUBLE) / t.tot "
        f"  AS obs_freq, f.exp_freq, {term} AS term FROM f, t) "
        "SELECT digit, n, obs_freq, exp_freq, "
        "sum(term) OVER () AS chi2_total FROM p"
    )


@register("q_benford_digits", _BENFORD_SQL())
def q_benford_digits(spark, sf_dir):
    """DQ2 (r10): Benford's-law first-digit audit of order totals —
    the classic synthetic-data / fraud smell test (naturally-occurring
    multi-magnitude amounts follow P(d) = log10(1+1/d); generated or
    tampered columns don't). First digit is taken from the INTEGER
    part's string form — never floor(log10(x)), whose libm boundary
    (1000.0 -> 2.9999...) would mis-bin across engines. Observed
    frequencies are exactly-rounded rationals; the per-digit chi-2
    terms are dyadic-quantized (2^-20) so the 9-row windowed total is
    order-free. One corpus aggregate to 9 rows; expected frequencies
    are shared Python literals."""
    import math

    from mhw3d_detection_spark.operators.analysis import dyadic_quantize

    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_totalprice") >= 1
    )
    d = o.select(
        F.substring(
            F.floor("o_totalprice").cast("long").cast("string"), 1, 1
        ).cast("int").alias("digit")
    )
    c = d.groupBy("digit").agg(F.count(F.lit(1)).cast("long").alias("n"))
    spine = o.sparkSession.range(1, 10).select(
        F.col("id").cast("int").alias("digit")
    )
    t = c.agg(F.sum("n").cast("long").alias("tot"))
    exp_f = None
    for dd in range(9, 0, -1):
        v = F.lit(math.log10(1.0 + 1.0 / dd))
        exp_f = v if exp_f is None else F.when(
            F.col("digit") == dd, v
        ).otherwise(exp_f)
    f = spine.join(F.broadcast(c), "digit", "left").select(
        "digit",
        F.coalesce("n", F.lit(0)).cast("long").alias("n"),
        exp_f.alias("exp_freq"),
    )
    e = F.col("tot") * F.col("exp_freq")
    term = (F.col("n") - e) * (F.col("n") - e) / e
    p = f.crossJoin(F.broadcast(t)).select(
        "digit",
        "n",
        (F.col("n").cast("double") / F.col("tot")).alias("obs_freq"),
        "exp_freq",
        dyadic_quantize(term, 20).alias("term"),
    )
    return p.select(
        "digit",
        "n",
        "obs_freq",
        "exp_freq",
        F.sum("term").over(Window.partitionBy()).alias("chi2_total"),
    )


# --- W14tr (r10): Markov transition matrix over per-user event flows ---
_TRANS_WIN = "OVER (PARTITION BY user_id ORDER BY us, event_id)"
@register(
    "q_event_transitions",
    "WITH e AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS us "
    "  FROM events WHERE user_id IS NOT NULL), "
    "p AS (SELECT user_id, event_type AS from_type, "
    f"  lead(event_type) {_TRANS_WIN} AS to_type FROM e), "
    "c AS (SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n "
    "  FROM p WHERE to_type IS NOT NULL GROUP BY 1, 2), "
    "t AS (SELECT from_type, CAST(sum(n) AS BIGINT) AS n_from "
    "  FROM c GROUP BY 1) "
    "SELECT c.from_type, c.to_type, c.n, "
    "CAST(c.n AS DOUBLE) / t.n_from AS p "
    "FROM c JOIN t ON c.from_type = t.from_type",
)
def q_event_transitions(spark, sf_dir):
    """W14tr (r10): first-order Markov transition matrix over per-user
    event streams — P(next event type | current), the behavioral
    fingerprint behind funnel design and bot detection (a user whose
    transition row diverges from the population matrix is scripted
    traffic). One lead() window partitioned by user (parallel across
    users at any log size, integer-micros + event_id ordering — the
    q_user_sessions convention), one types²-bounded aggregate;
    probabilities are exactly-rounded integer rationals — RAW hash."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull()
    ).select(
        "user_id", "event_id", "event_type",
        F.unix_micros("ts").alias("us"),
    )
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    p = ev.select(
        F.col("event_type").alias("from_type"),
        F.lead("event_type").over(w).alias("to_type"),
    ).filter(F.col("to_type").isNotNull())
    c = p.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    t = c.groupBy("from_type").agg(
        F.sum("n").cast("long").alias("n_from")
    )
    return c.join(F.broadcast(t), "from_type").select(
        "from_type",
        "to_type",
        "n",
        (F.col("n").cast("double") / F.col("n_from")).alias("p"),
    )


# --- W14hr (r10): hour-of-week load profile with uniformity residuals ---
@register(
    "q_load_profile",
    "WITH e AS (SELECT epoch_us(ts) AS us FROM events), "
    "h AS (SELECT CAST(((us // 86400000000) + 4) % 7 AS INT) AS dow, "
    "  CAST((us % 86400000000) // 3600000000 AS INT) AS hour FROM e), "
    "c AS (SELECT dow, hour, CAST(count(*) AS BIGINT) AS n FROM h "
    "  GROUP BY 1, 2), "
    "spine AS (SELECT d.d AS dow, hh.h AS hour FROM "
    "  (SELECT CAST(unnest(generate_series(0, 6)) AS INT) AS d) d, "
    "  (SELECT CAST(unnest(generate_series(0, 23)) AS INT) AS h) hh), "
    "t AS (SELECT CAST(sum(n) AS BIGINT) AS tot FROM c), "
    "f AS (SELECT s.dow, s.hour, coalesce(c.n, 0) AS n FROM spine s "
    "  LEFT JOIN c ON s.dow = c.dow AND s.hour = c.hour) "
    "SELECT f.dow, f.hour, f.n, CAST(t.tot AS DOUBLE) / 168 AS expected, "
    "CASE WHEN t.tot > 0 THEN "
    "  (f.n - CAST(t.tot AS DOUBLE) / 168) "
    "  / sqrt(CAST(t.tot AS DOUBLE) / 168) END AS std_residual "
    "FROM f, t",
)
def q_load_profile(spark, sf_dir):
    """W14hr (r10): event counts per (day-of-week, hour-of-day) cell
    with standardized residuals against the uniform expectation — the
    capacity-planning / anomaly-screen profile (human traffic shows a
    diurnal ridge; a flat profile on a 'user' stream is bot mass).
    Day-of-week derives from integer epoch-day arithmetic
    ((days+4) mod 7, 0 = Sunday) — NEVER engine dayofweek(), whose
    0-vs-1-based conventions differ; one corpus aggregate to the dense
    168-cell spine, residuals exact IEEE over integer counts — RAW
    hash."""
    ev = load_table(spark, sf_dir, "events").select(
        F.unix_micros("ts").alias("us")
    )
    h = ev.select(
        ((F.expr("us div 86400000000") + 4) % 7).cast("int").alias("dow"),
        F.expr("(us % 86400000000) div 3600000000").cast("int").alias(
            "hour"
        ),
    )
    c = h.groupBy("dow", "hour").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    spark_ = ev.sparkSession
    d7 = spark_.range(7).select(F.col("id").cast("int").alias("dow"))
    h24 = spark_.range(24).select(F.col("id").cast("int").alias("hour"))
    spine = d7.crossJoin(h24)
    t = c.agg(F.sum("n").cast("long").alias("tot"))
    f = spine.join(F.broadcast(c), ["dow", "hour"], "left").select(
        "dow", "hour", F.coalesce("n", F.lit(0)).cast("long").alias("n")
    )
    e = F.col("tot").cast("double") / 168
    return f.crossJoin(F.broadcast(t)).select(
        "dow",
        "hour",
        "n",
        e.alias("expected"),
        F.when(F.col("tot") > 0, (F.col("n") - e) / F.sqrt(e)).alias(
            "std_residual"
        ),
    )


# --- W14rp (r10): composed event-log health report (one log scan) ---
@register(
    "q_events_report",
    "WITH base AS (SELECT user_id, event_type, "
    "  epoch_us(ts) // 86400000000 AS day FROM events "
    "  WHERE user_id IS NOT NULL), "
    "cube AS (SELECT user_id, day, event_type, "
    "  CAST(count(*) AS BIGINT) AS n FROM base GROUP BY 1, 2, 3), "
    "dau AS (SELECT 'dau' AS section, CAST(day AS VARCHAR) AS key, "
    "  CAST(count(DISTINCT user_id) AS BIGINT) AS n, "
    "  CAST(sum(n) AS BIGINT) AS m, CAST(NULL AS DOUBLE) AS x "
    "  FROM cube GROUP BY 2), "
    "mixt AS (SELECT event_type, CAST(sum(n) AS BIGINT) AS ne "
    "  FROM cube GROUP BY 1), "
    "tote AS (SELECT CAST(sum(ne) AS BIGINT) AS t FROM mixt), "
    "mix AS (SELECT 'mix' AS section, event_type AS key, ne AS n, "
    "  CAST(NULL AS BIGINT) AS m, CAST(ne AS DOUBLE) / t AS x "
    "  FROM mixt, tote), "
    "uf AS (SELECT user_id, "
    "  max(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS viewed, "
    "  max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) "
    "    AS purchased FROM cube GROUP BY 1), "
    "fun AS (SELECT 'funnel' AS section, 'view_purchase' AS key, "
    "  CAST(coalesce(sum(viewed), 0) AS BIGINT) AS n, "
    "  CAST(coalesce(sum(CASE WHEN viewed = 1 AND purchased = 1 THEN 1 "
    "    ELSE 0 END), 0) AS BIGINT) AS m, "
    "  CASE WHEN sum(viewed) > 0 THEN "
    "    CAST(sum(CASE WHEN viewed = 1 AND purchased = 1 THEN 1 ELSE 0 "
    "    END) AS DOUBLE) / sum(viewed) END AS x FROM uf), "
    "uw AS (SELECT DISTINCT user_id, day // 7 AS week FROM cube), "
    "fw AS (SELECT user_id, min(week) AS w0 FROM uw GROUP BY 1), "
    "mw AS (SELECT max(week) AS wmax FROM uw), "
    "off AS (SELECT unnest(generate_series(0, 3)) AS k), "
    "el AS (SELECT fw.user_id, o.k, fw.w0 + o.k AS wk "
    "  FROM fw, off o, mw WHERE fw.w0 + o.k <= mw.wmax), "
    "act AS (SELECT el.k, CAST(count(*) AS BIGINT) AS m FROM el "
    "  JOIN uw ON uw.user_id = el.user_id AND uw.week = el.wk "
    "  GROUP BY 1), "
    "eln AS (SELECT k, CAST(count(*) AS BIGINT) AS n FROM el "
    "  GROUP BY 1), "
    "ret AS (SELECT 'retention' AS section, CAST(eln.k AS VARCHAR) "
    "  AS key, eln.n, CAST(coalesce(act.m, 0) AS BIGINT) AS m, "
    "  CASE WHEN eln.n > 0 THEN CAST(coalesce(act.m, 0) AS DOUBLE) "
    "    / eln.n END AS x FROM eln LEFT JOIN act ON eln.k = act.k) "
    "SELECT * FROM dau UNION ALL SELECT * FROM mix "
    "UNION ALL SELECT * FROM fun UNION ALL SELECT * FROM ret",
)
def q_events_report(spark, sf_dir):
    """W14rp (r10): the composed event-log health report — daily
    active users, event-type mix, view->purchase funnel, and pooled
    weekly retention (offsets 0..3, eligibility-windowed) from ONE
    log scan reduced to the localCheckpointed (user, day, type)
    activity cube (plans.events_report). The standalone rows each
    re-scan the raw log; the daily product-health job pays the scan
    once — sequence-dependent stats (sessions, transitions) stay out
    BY DESIGN: they need the event ordering the cube discards. All
    counts integer, shares/rates exactly-rounded rationals — RAW
    hash."""
    from mhw3d_detection_spark.plans.events_report import events_report

    ev = load_table(spark, sf_dir, "events")
    return events_report(ev)


# --- J11 (r10): full outer join with match-status rollup ---
@register(
    "q_join_full_outer",
    "WITH j AS (SELECT c.c_custkey, o.o_orderkey, o.o_totalprice "
    "  FROM customer c FULL OUTER JOIN orders o "
    "  ON c.c_custkey = o.o_custkey) "
    "SELECT CASE WHEN c_custkey IS NULL THEN 'order_only' "
    "  WHEN o_orderkey IS NULL THEN 'customer_only' "
    "  ELSE 'matched' END AS side, "
    "CAST(count(*) AS BIGINT) AS n, "
    f"{rq_sql('coalesce(sum(o_totalprice), 0.0)', 0)} AS revenue "
    "FROM j GROUP BY 1",
)
def q_join_full_outer(spark, sf_dir):
    """J11 (r10): FULL OUTER join completeness — customers vs orders
    with a match-status rollup (matched / customer-only / order-only):
    the reconciliation shape every referential-integrity audit runs
    (DQ1's anti-join orphan checks see one side at a time; full outer
    sees both in one pass). One key-partitioned shuffle join; the
    status classification is a pure projection, counts integer,
    revenue rq0."""
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_totalprice"
    )
    j = c.join(o, c.c_custkey == o.o_custkey, "full_outer")
    side = (
        F.when(F.col("c_custkey").isNull(), F.lit("order_only"))
        .when(F.col("o_orderkey").isNull(), F.lit("customer_only"))
        .otherwise(F.lit("matched"))
    )
    return j.groupBy(side.alias("side")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        rq(F.coalesce(F.sum("o_totalprice"), F.lit(0.0)), 0).alias(
            "revenue"
        ),
    )


# --- A14 (r10): CUBE grouping (all 4 grouping sets in one pass) ---
@register(
    "q_agg_cube",
    "SELECT coalesce(l_returnflag, 'ALL') AS returnflag, "
    "coalesce(l_linestatus, 'ALL') AS linestatus, count(*) AS n, "
    f"{rq_sql('sum(l_extendedprice * (1 - l_discount))', 0)} AS net_rev "
    "FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)",
)
def q_agg_cube(spark, sf_dir):
    """A14 (r10): CUBE over (returnflag, linestatus) — all four
    grouping sets (detail, each single-dim margin, grand total) from
    ONE pass (A11's ROLLUP emits only the prefix hierarchy; dashboards
    want every margin). Spark expands the sets map-side before the one
    shuffle — same plan family as rollup, 4/3 the partial rows."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            rq(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))),
                0,
            ).alias("net_rev"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "n",
            "net_rev",
        )
    )


# --- A15 (r10): pairwise Pearson correlation matrix over measures ---
_CORR_COLS = ("l_quantity", "l_extendedprice", "l_discount", "l_tax")


def _CORR_SQL() -> str:
    import itertools

    parts = [
        f"SELECT '{a}' AS col_x, '{b}' AS col_y, "
        "CAST(count(*) AS BIGINT) AS n, "
        + rq_sql(f"corr({a}, {b})", 4)
        + " AS pearson FROM lineitem"
        for a, b in itertools.combinations(_CORR_COLS, 2)
    ]
    return " UNION ALL ".join(parts)


@register("q_corr_matrix", _CORR_SQL())
def q_corr_matrix(spark, sf_dir):
    """A15 (r10): pairwise Pearson correlations over the lineitem
    measure columns — the numeric-profiling companion to A12's
    per-column stats (a profiler that cannot see that discount is
    priced-in misreads every margin analysis). All six pairs come from
    ONE scan with map-side co-moment partials (Spark's corr is a
    single-pass mergeable aggregate — no per-pair rescan); rq4 absorbs
    the engine co-moment association order (the q_xcorr_lagged
    convention)."""
    import itertools

    li = load_table(spark, sf_dir, "lineitem")
    aggs = []
    for a, b in itertools.combinations(_CORR_COLS, 2):
        aggs.append(F.count(F.lit(1)).cast("long").alias(f"n_{a}_{b}"))
        aggs.append(rq(F.corr(a, b), 4).alias(f"c_{a}_{b}"))
    wide = li.agg(*aggs)
    sel = []
    for a, b in itertools.combinations(_CORR_COLS, 2):
        sel.append(
            F.struct(
                F.lit(a).alias("col_x"),
                F.lit(b).alias("col_y"),
                F.col(f"n_{a}_{b}").alias("n"),
                F.col(f"c_{a}_{b}").alias("pearson"),
            )
        )
    return wide.select(
        F.explode(F.array(*sel)).alias("r")
    ).select("r.col_x", "r.col_y", "r.n", "r.pearson")


# --- W14ss (r10): session-length distribution summary ---
_SS_WIN = "OVER (PARTITION BY user_id ORDER BY us, event_id)"
@register(
    "q_session_stats",
    "WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS us FROM events), "
    f"l AS (SELECT user_id, event_id, us, lag(us) {_SS_WIN} AS pus FROM e), "
    "m AS (SELECT user_id, event_id, us, CASE WHEN pus IS NULL "
    "  OR us - pus > 7200000000 THEN 1 ELSE 0 END AS new_s FROM l), "
    "s AS (SELECT user_id, us, CAST(sum(new_s) OVER (PARTITION BY user_id "
    "  ORDER BY us, event_id ROWS UNBOUNDED PRECEDING) AS INT) AS session_id FROM m), "
    "g AS (SELECT user_id, session_id, CAST(count(*) AS BIGINT) AS n_events, "
    "  max(us) - min(us) AS dur_us FROM s GROUP BY 1, 2) "
    "SELECT CAST(count(*) AS BIGINT) AS n_sessions, "
    "CAST(sum(n_events) AS BIGINT) AS n_events, "
    "CAST(sum(n_events) AS DOUBLE) / count(*) AS mean_events, "
    "CAST(sum(dur_us) AS DOUBLE) / count(*) AS mean_dur_us, "
    "CAST(quantile_cont(dur_us, 0.5) AS DOUBLE) AS p50_dur_us, "
    "CAST(quantile_cont(dur_us, 0.9) AS DOUBLE) AS p90_dur_us "
    "FROM g",
)
def q_session_stats(spark, sf_dir):
    """W14ss (r10): session-length distribution summary — session
    count, events per session, mean/p50/p90 duration: the health
    numbers a sessionization change is judged by (W14ev emits the
    per-session table; dashboards consume THIS one row). The same
    2 h-gap chain (per-user windows, integer micros), then one exact
    percentile aggregate over the sessions table (percentile ≡
    quantile_cont on identical integer inputs — the A3 contract);
    means are exact integer rationals."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", F.unix_micros("ts").alias("us")
    )
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    new_s = (
        F.isnull(F.lag("us").over(w))
        | (F.col("us") - F.lag("us").over(w) > 7_200_000_000)
    ).cast("int")
    sess = ev.withColumn("__new", new_s).withColumn(
        "session_id",
        F.sum("__new")
        .over(
            Window.partitionBy("user_id")
            .orderBy("us", "event_id")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        .cast("int"),
    )
    g = sess.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        (F.max("us") - F.min("us")).alias("dur_us"),
    )
    return g.agg(
        F.count(F.lit(1)).cast("long").alias("n_sessions"),
        F.sum("n_events").cast("long").alias("n_events"),
        (F.sum("n_events").cast("double") / F.count(F.lit(1))).alias(
            "mean_events"
        ),
        (F.sum("dur_us").cast("double") / F.count(F.lit(1))).alias(
            "mean_dur_us"
        ),
        F.expr("percentile(dur_us, 0.5)").cast("double").alias(
            "p50_dur_us"
        ),
        F.expr("percentile(dur_us, 0.9)").cast("double").alias(
            "p90_dur_us"
        ),
    )


# --- W14wk (r10): weekly volume trend (WoW growth + 4-week MA) ---
@register(
    "q_weekly_trend",
    "WITH e AS (SELECT epoch_us(ts) // 604800000000 AS week FROM events), "
    "c AS (SELECT week, CAST(count(*) AS BIGINT) AS n FROM e GROUP BY 1), "
    "w AS (SELECT week, n, lag(n) OVER (ORDER BY week) AS prev, "
    "  CAST(sum(n) OVER (ORDER BY week ROWS BETWEEN 3 PRECEDING AND "
    "    CURRENT ROW) AS BIGINT) AS s4, "
    "  CAST(count(*) OVER (ORDER BY week ROWS BETWEEN 3 PRECEDING AND "
    "    CURRENT ROW) AS BIGINT) AS c4 FROM c) "
    "SELECT CAST(week AS BIGINT) AS week, n, "
    "CASE WHEN prev > 0 THEN CAST(n - prev AS DOUBLE) / prev END "
    "  AS wow_growth, "
    "CAST(s4 AS DOUBLE) / c4 AS ma4 FROM w",
)
def q_weekly_trend(spark, sf_dir):
    """W14wk (r10): weekly event volume with week-over-week growth and
    a 4-week trailing mean — the topline the W14 family's detailed
    readouts roll up to (every growth dashboard's first chart). One
    corpus aggregate to |weeks| rows; the global ordered window runs
    over the weeks table only (time-bounded, the ks-spine rule), all
    ratios exact integer rationals — RAW hash. Integer epoch-week
    bucketing (the cohort-retention convention — no calendar semantics
    to diverge cross-engine)."""
    ev = load_table(spark, sf_dir, "events").select(
        F.expr("unix_micros(ts) div 604800000000").alias("week")
    )
    c = ev.groupBy("week").agg(F.count(F.lit(1)).cast("long").alias("n"))
    wo = Window.orderBy("week")
    w4 = wo.rowsBetween(-3, 0)
    return c.select(
        F.col("week").cast("long").alias("week"),
        "n",
        F.when(
            F.lag("n").over(wo) > 0,
            (F.col("n") - F.lag("n").over(wo)).cast("double")
            / F.lag("n").over(wo),
        ).alias("wow_growth"),
        (
            F.sum("n").over(w4).cast("double")
            / F.count(F.lit(1)).over(w4)
        ).alias("ma4"),
    )


# --- W14rf (r10): RFM segmentation (recency/frequency/monetary quintiles) ---
_RFM_Q = (0.2, 0.4, 0.6, 0.8)


def _RFM_SQL() -> str:
    from mhw3d_detection_spark.operators.analysis import (
        dyadic_quantize_sql as _dq,
    )

    mon = _dq("CASE WHEN event_type = 'purchase' THEN value ELSE 0.0 END", 6)
    score = lambda m: (  # noqa: E731
        f"1 + CAST({m} > p_{m[0]}1 AS INT) + CAST({m} > p_{m[0]}2 AS INT)"
        f" + CAST({m} > p_{m[0]}3 AS INT) + CAST({m} > p_{m[0]}4 AS INT)"
    )
    pcts = ", ".join(
        f"quantile_cont({m}, {q!r}) AS p_{m[0]}{i + 1}"
        for m in ("rec", "freq", "mon")
        for i, q in enumerate(_RFM_Q)
    )
    return (
        "WITH u AS (SELECT user_id, "
        "  CAST(max(epoch_us(ts) // 86400000000) AS BIGINT) AS rec, "
        "  CAST(count(*) AS BIGINT) AS freq, "
        f"  sum({mon}) AS mon FROM events WHERE user_id IS NOT NULL "
        "  GROUP BY 1), "
        f"t AS (SELECT {pcts} FROM u), "
        f"s AS (SELECT CAST({score('rec')} AS INT) AS r_score, "
        f"  CAST({score('freq')} AS INT) AS f_score, "
        f"  CAST({score('mon')} AS INT) AS m_score, mon FROM u, t) "
        "SELECT r_score, f_score, m_score, "
        "CAST(count(*) AS BIGINT) AS n_users, "
        "sum(mon) / count(*) AS mean_monetary "
        "FROM s GROUP BY 1, 2, 3",
    )[0]


@register("q_user_rfm", _RFM_SQL())
def q_user_rfm(spark, sf_dir):
    """W14rf (r10): RFM segmentation — per user, recency (last active
    epoch-day), frequency (events) and monetary (purchase value, each
    event's contribution dyadic-quantized 1/64 so the per-user and
    per-segment sums are order-free), scored 1..5 against the EXACT
    population quintiles (percentile ≡ quantile_cont on identical
    bits, strictly-greater convention at the fences), rolled up to the
    ≤125-cell segment grid — the canonical customer-value cube every
    growth team cuts by. One users-sized aggregate + a 1-row quintile
    broadcast; counts integer, mean monetary an exact division — RAW
    hash."""
    from mhw3d_detection_spark.operators.analysis import dyadic_quantize

    ev = load_table(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull()
    )
    mon_t = dyadic_quantize(
        F.when(F.col("event_type") == "purchase", F.col("value")).otherwise(
            F.lit(0.0)
        ),
        6,
    )
    u = ev.groupBy("user_id").agg(
        F.max(F.expr("unix_micros(ts) div 86400000000"))
        .cast("long").alias("rec"),
        F.count(F.lit(1)).cast("long").alias("freq"),
        F.sum(mon_t).alias("mon"),
    )
    t = u.agg(
        *[
            F.expr(f"percentile({m}, {q!r})").alias(f"p_{m[0]}{i + 1}")
            for m in ("rec", "freq", "mon")
            for i, q in enumerate(_RFM_Q)
        ]
    )

    def score(m):
        c = F.lit(1)
        for i in range(4):
            c = c + (F.col(m) > F.col(f"p_{m[0]}{i + 1}")).cast("int")
        return c.cast("int")

    s = u.crossJoin(F.broadcast(t)).select(
        score("rec").alias("r_score"),
        score("freq").alias("f_score"),
        score("mon").alias("m_score"),
        "mon",
    )
    return s.groupBy("r_score", "f_score", "m_score").agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        (F.sum("mon") / F.count(F.lit(1))).alias("mean_monetary"),
    )


# --- W14ee (r10): session entry/exit event types ---
@register(
    "q_session_entry_exit",
    "WITH e AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS us "
    "  FROM events), "
    f"l AS (SELECT user_id, event_id, event_type, us, lag(us) {_SS_WIN} "
    "  AS pus FROM e), "
    "m AS (SELECT user_id, event_type, us, event_id, CASE WHEN pus IS NULL "
    "  OR us - pus > 7200000000 THEN 1 ELSE 0 END AS new_s FROM l), "
    "s AS (SELECT user_id, event_type, us, event_id, CAST(sum(new_s) "
    "  OVER (PARTITION BY user_id ORDER BY us, event_id "
    "  ROWS UNBOUNDED PRECEDING) AS INT) AS session_id FROM m), "
    "r AS (SELECT user_id, session_id, event_type, "
    "  row_number() OVER (PARTITION BY user_id, session_id "
    "    ORDER BY us, event_id) AS rn_f, "
    "  row_number() OVER (PARTITION BY user_id, session_id "
    "    ORDER BY us DESC, event_id DESC) AS rn_l FROM s), "
    "fe AS (SELECT user_id, session_id, "
    "  max(CASE WHEN rn_f = 1 THEN event_type END) AS entry_type, "
    "  max(CASE WHEN rn_l = 1 THEN event_type END) AS exit_type "
    "  FROM r GROUP BY 1, 2) "
    "SELECT entry_type, exit_type, CAST(count(*) AS BIGINT) AS n_sessions "
    "FROM fe GROUP BY 1, 2",
)
def q_session_entry_exit(spark, sf_dir):
    """W14ee (r10): entry/exit event-type pairs per session — the
    landing/abandonment matrix (which entry points lead to purchase
    exits vs error exits — the flow question the W14tr transition
    matrix answers only step-locally). The W14ev 2 h-gap chain, then
    two row_number windows inside the session partition (per-user
    parallel, integer-micros + event_id ordering both directions) to a
    types²-bounded rollup — all integer, RAW hash."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type",
        F.unix_micros("ts").alias("us"),
    )
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    new_s = (
        F.isnull(F.lag("us").over(w))
        | (F.col("us") - F.lag("us").over(w) > 7_200_000_000)
    ).cast("int")
    s = ev.withColumn("__new", new_s).withColumn(
        "session_id",
        F.sum("__new")
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .cast("int"),
    )
    ws = Window.partitionBy("user_id", "session_id")
    r = s.select(
        "user_id",
        "session_id",
        "event_type",
        F.row_number().over(ws.orderBy("us", "event_id")).alias("rn_f"),
        F.row_number().over(
            ws.orderBy(F.desc("us"), F.desc("event_id"))
        ).alias("rn_l"),
    )
    fe = r.groupBy("user_id", "session_id").agg(
        F.max(
            F.when(F.col("rn_f") == 1, F.col("event_type"))
        ).alias("entry_type"),
        F.max(
            F.when(F.col("rn_l") == 1, F.col("event_type"))
        ).alias("exit_type"),
    )
    return fe.groupBy("entry_type", "exit_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_sessions")
    )


# --- W14an (r10): daily-volume anomaly screen (z vs trailing 28 days) ---
@register(
    "q_volume_anomalies",
    "WITH e AS (SELECT epoch_us(ts) // 86400000000 AS day FROM events), "
    "c AS (SELECT day, CAST(count(*) AS BIGINT) AS n FROM e GROUP BY 1), "
    # RANGE (not ROWS): idle calendar days emit no row, and a ROWS
    # frame would silently stretch "trailing 28 days" across months
    # of gaps (code-review r10w2 #9)
    "w AS (SELECT day, n, "
    "  CAST(count(*) OVER tw AS BIGINT) AS n_prior, "
    "  CAST(sum(n) OVER tw AS BIGINT) AS s1, "
    "  CAST(sum(n * n) OVER tw AS BIGINT) AS s2 FROM c "
    "  WINDOW tw AS (ORDER BY day RANGE BETWEEN 28 PRECEDING AND "
    "  1 PRECEDING)) "
    "SELECT CAST(day AS BIGINT) AS day, n, n_prior, "
    "CASE WHEN n_prior >= 7 THEN CAST(s1 AS DOUBLE) / n_prior END "
    "  AS mean_prior, "
    "CASE WHEN n_prior >= 7 AND "
    "  (s2 - CAST(s1 AS DOUBLE) * s1 / n_prior) / (n_prior - 1) > 0 "
    "  THEN (n - CAST(s1 AS DOUBLE) / n_prior) "
    "    / sqrt((s2 - CAST(s1 AS DOUBLE) * s1 / n_prior) "
    "    / (n_prior - 1)) END AS z "
    "FROM w",
)
def q_volume_anomalies(spark, sf_dir):
    """W14an (r10): per-day event volume scored against the TRAILING
    28-CALENDAR-day window (a RANGE frame on the integer day key —
    idle days emit no row, and a ROWS frame would silently stretch
    the baseline across gaps; mean/std from integer Σ/Σ² — exact; the
    current day excluded from its own baseline) — the ops pager's
    volume-anomaly screen (|z| > 3 = incident or bot flood). One corpus aggregate to
    |days| rows; the ordered window runs over the DAYS table
    (time-bounded, the weekly-trend rule); z NULL until 7 prior days
    exist or when the baseline variance is 0 — RAW hash.

    Contract: daily counts must stay under ~3e9 (n² at int64's edge);
    a log hotter than that should pre-scale (count in thousands) —
    the exact-integer Σ/Σ² is what keeps the window order-free
    cross-engine, so do NOT silently fall back to double sums."""
    ev = load_table(spark, sf_dir, "events").select(
        F.expr("unix_micros(ts) div 86400000000").alias("day")
    )
    c = ev.groupBy("day").agg(F.count(F.lit(1)).cast("long").alias("n"))
    tw = Window.orderBy("day").rangeBetween(-28, -1)
    w = c.select(
        F.col("day").cast("long").alias("day"),
        "n",
        F.count(F.lit(1)).over(tw).cast("long").alias("n_prior"),
        F.sum("n").over(tw).cast("long").alias("s1"),
        F.sum(F.col("n") * F.col("n")).over(tw).cast("long").alias("s2"),
    )
    mean = F.col("s1").cast("double") / F.col("n_prior")
    var = (
        F.col("s2") - F.col("s1").cast("double") * F.col("s1") / F.col("n_prior")
    ) / (F.col("n_prior") - 1)
    return w.select(
        "day",
        "n",
        "n_prior",
        F.when(F.col("n_prior") >= 7, mean).alias("mean_prior"),
        F.when(
            (F.col("n_prior") >= 7) & (var > 0),
            (F.col("n") - mean) / F.sqrt(var),
        ).alias("z"),
    )


# --- O8 (r10): per-group top-k WITH TIES (rank vs row_number semantics) ---
@register(
    "q_topk_with_ties",
    "WITH r AS (SELECT o_orderpriority, o_totalprice, "
    "  rank() OVER (PARTITION BY o_orderpriority "
    "  ORDER BY o_totalprice DESC) AS rnk FROM orders) "
    "SELECT o_orderpriority, o_totalprice, CAST(rnk AS INT) AS rnk "
    "FROM r WHERE rnk <= 3",
)
def q_topk_with_ties(spark, sf_dir):
    """O8 (r10): per-priority top-3 order totals WITH TIES — rank()
    keeps every row tied at the cutoff where O7's row_number silently
    drops all but one (the semantic difference that corrupts
    leaderboards and percentile-of-top analyses; ties on money columns
    are common). Exact-double ordering makes tie membership
    deterministic cross-engine; groups-bounded output."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.desc("o_totalprice")
    )
    return (
        o.select(
            "o_orderpriority",
            "o_totalprice",
            F.rank().over(w).cast("int").alias("rnk"),
        )
        .filter(F.col("rnk") <= 3)
    )


# --- W14lt (r10): cohort LTV curve (cumulative purchase value / user) ---
@register(
    "q_cohort_ltv",
    "WITH e AS (SELECT user_id, epoch_us(ts) // 604800000000 AS week, "
    "  floor((CASE WHEN event_type = 'purchase' THEN value ELSE 0.0 END) "
    "  * 64.0 + 0.5000152587890625) / 64.0 AS val FROM events "
    "  WHERE user_id IS NOT NULL), "
    "fw AS (SELECT user_id, CAST(min(week) AS BIGINT) AS w0 FROM e "
    "  GROUP BY 1), "
    "cs AS (SELECT w0, CAST(count(*) AS BIGINT) AS n_users FROM fw "
    "  GROUP BY 1), "
    "v AS (SELECT fw.w0, CAST(e.week - fw.w0 AS BIGINT) AS k, "
    "  sum(e.val) AS wk_value FROM e JOIN fw ON e.user_id = fw.user_id "
    "  GROUP BY 1, 2), "
    "c AS (SELECT w0, k, sum(wk_value) OVER (PARTITION BY w0 ORDER BY k "
    "  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_value "
    "  FROM v) "
    "SELECT c.w0 AS cohort_week, c.k AS week_offset, cs.n_users, "
    "c.cum_value, c.cum_value / cs.n_users AS ltv "
    "FROM c JOIN cs ON c.w0 = cs.w0",
)
def q_cohort_ltv(spark, sf_dir):
    """W14lt (r10): cohort lifetime-value curve — cumulative purchase
    value per cohort (first-seen week) through each week offset,
    divided by cohort size: the MONEY companion to W14ev's retention
    counts (users who stay but stop buying look identical in
    retention; LTV separates them). Purchase values dyadic-quantized
    (1/64) at the row so every sum up the chain is order-free exact;
    the cumulative window runs per cohort over OFFSETS (time-bounded);
    LTV is an exact division — RAW hash."""
    from mhw3d_detection_spark.operators.analysis import dyadic_quantize

    ev = load_table(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull()
    ).select(
        "user_id",
        F.expr("unix_micros(ts) div 604800000000").alias("week"),
        dyadic_quantize(
            F.when(
                F.col("event_type") == "purchase", F.col("value")
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("val"),
    )
    fw = ev.groupBy("user_id").agg(
        F.min("week").cast("long").alias("w0")
    )
    cs = fw.groupBy("w0").agg(
        F.count(F.lit(1)).cast("long").alias("n_users")
    )
    v = ev.join(fw, "user_id").groupBy(
        "w0", (F.col("week") - F.col("w0")).cast("long").alias("k")
    ).agg(F.sum("val").alias("wk_value"))
    wc = Window.partitionBy("w0").orderBy("k").rowsBetween(
        Window.unboundedPreceding, 0
    )
    c = v.select(
        "w0", "k", F.sum("wk_value").over(wc).alias("cum_value")
    )
    return c.join(F.broadcast(cs), "w0").select(
        F.col("w0").alias("cohort_week"),
        F.col("k").alias("week_offset"),
        "n_users",
        "cum_value",
        (F.col("cum_value") / F.col("n_users")).alias("ltv"),
    )


# --- J10d (r10): TPC-H Q6 forecast-revenue-change shape ---
@register(
    "q_tpch_q6_shape",
    "SELECT sum(floor(l_extendedprice * l_discount * 64.0 "
    "  + 0.5000152587890625) / 64.0) AS revenue, "
    "CAST(count(*) AS BIGINT) AS n_items FROM lineitem "
    "WHERE l_shipdate >= TIMESTAMP '1996-01-01' "
    "AND l_shipdate < TIMESTAMP '1997-01-01' "
    "AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24",
)
def q_tpch_q6_shape(spark, sf_dir):
    """J10d (r10): the TPC-H Q6 forecast-revenue-change shape — a pure
    filter-and-sum over the fact table, completing the classic quartet
    (Q1 wide aggregate, Q3 top-k join, Q5 star join, Q6 scan-bound
    filter). Every predicate pushes into the parquet scan (the
    .explain PushedFilters check this repo pins in tests) and the one
    aggregate is a map-side total; per-line revenue dyadic-quantized
    (1/64) — RAW hash."""
    from mhw3d_detection_spark.operators.analysis import dyadic_quantize

    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & F.col("l_discount").between(0.05, 0.07)
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        F.sum(
            dyadic_quantize(
                F.col("l_extendedprice") * F.col("l_discount"), 6
            )
        ).alias("revenue"),
        F.count(F.lit(1)).cast("long").alias("n_items"),
    )


# --- W14st (r10): DAU/MAU stickiness (sliding 28-day distinct users) ---
@register(
    "q_dau_mau_stickiness",
    "WITH ud AS (SELECT DISTINCT user_id, "
    "  epoch_us(ts) // 86400000000 AS day FROM events "
    "  WHERE user_id IS NOT NULL), "
    "dau AS (SELECT day, CAST(count(*) AS BIGINT) AS dau FROM ud "
    "  GROUP BY 1), "
    "ex AS (SELECT ud.user_id, ud.day + o.o AS obs_day FROM ud "
    "  CROSS JOIN (SELECT unnest(generate_series(0, 27)) AS o) o), "
    "mau AS (SELECT obs_day AS day, "
    "  CAST(count(DISTINCT user_id) AS BIGINT) AS mau FROM ex "
    "  GROUP BY 1), "
    "j AS (SELECT dau.day, dau.dau, mau.mau FROM dau "
    "  JOIN mau ON dau.day = mau.day) "
    "SELECT CAST(day AS BIGINT) AS day, dau, mau, "
    "CAST(dau AS DOUBLE) / mau AS stickiness FROM j",
)
def q_dau_mau_stickiness(spark, sf_dir):
    """W14st (r10): DAU/MAU stickiness per day — THE engagement ratio
    (what fraction of the month's actives came back today). The hard
    part is MAU: a SLIDING 28-day DISTINCT-user count cannot be summed
    from daily DAUs (distincts don't add); instead each (user, day)
    activity pair is row-locally exploded to the 28 observation days
    it contributes to, and ONE count-distinct aggregate per day does
    the rest — pairs x 28 narrow rows, no window over users, no
    re-scan per day (the classic distributed sliding-distinct). Days
    with activity inside their trailing window but none today simply
    don't emit a DAU row (inner join — the dashboard's x-axis is
    active days). All integer + one exact division — RAW hash."""
    ud = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("user_id").isNotNull())
        .select(
            "user_id",
            F.expr("unix_micros(ts) div 86400000000").alias("day"),
        )
        .distinct()
    )
    dau = ud.groupBy("day").agg(
        F.count(F.lit(1)).cast("long").alias("dau")
    )
    offs = ud.sparkSession.range(28).select(F.col("id").alias("o"))
    ex = ud.crossJoin(F.broadcast(offs)).select(
        "user_id", (F.col("day") + F.col("o")).alias("obs_day")
    )
    mau = ex.groupBy(F.col("obs_day").alias("day")).agg(
        F.countDistinct("user_id").cast("long").alias("mau")
    )
    return dau.join(mau, "day").select(
        F.col("day").cast("long").alias("day"),
        "dau",
        "mau",
        (F.col("dau").cast("double") / F.col("mau")).alias("stickiness"),
    )


# --- W14me (r11): per-state behavioral entropy of the event flow ---
@register(
    "q_markov_entropy",
    "WITH e AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS us "
    "  FROM events WHERE user_id IS NOT NULL), "
    "p AS (SELECT user_id, event_type AS from_type, "
    f"  lead(event_type) {_TRANS_WIN} AS to_type FROM e), "
    "c AS (SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n "
    "  FROM p WHERE to_type IS NOT NULL GROUP BY 1, 2) "
    "SELECT from_type, CAST(sum(n) AS BIGINT) AS n_from, "
    "CAST(count(*) AS BIGINT) AS n_to_types, "
    + rq_sql(
        "ln(CAST(sum(n) AS DOUBLE)) - sum(n * ln(CAST(n AS DOUBLE))) "
        "/ sum(n)",
        4,
    )
    + " AS row_entropy FROM c GROUP BY 1",
)
def q_markov_entropy(spark, sf_dir):
    """W14me (r11): per-state Shannon entropy of the next-event
    distribution — the uncertainty summary of W14tr's transition
    matrix (a state whose row entropy collapses toward 0 is a scripted
    loop; one near ln(k) is organic browsing). Same lead() window and
    types²-bounded counts as q_event_transitions; H = ln(n) −
    Σnᵢln(nᵢ)/n (the count-form identity — one pass, no probability
    materialization), rq4 display (the lang_entropy convention: a few
    double terms per group, engine association order differs)."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull()
    ).select(
        "user_id", "event_id", "event_type",
        F.unix_micros("ts").alias("us"),
    )
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    p = ev.select(
        F.col("event_type").alias("from_type"),
        F.lead("event_type").over(w).alias("to_type"),
    ).filter(F.col("to_type").isNotNull())
    c = p.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    ent = (
        F.log(F.sum("n").cast("double"))
        - F.sum(F.col("n") * F.log(F.col("n").cast("double")))
        / F.sum("n")
    )
    return c.groupBy("from_type").agg(
        F.sum("n").cast("long").alias("n_from"),
        F.count(F.lit(1)).cast("long").alias("n_to_types"),
        rq(ent, 4).alias("row_entropy"),
    )


# --- DQ3 (r11): Tukey-fence outlier screen per source ---
@register(
    "q_tukey_outliers",
    "WITH q AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs, "
    "  quantile_cont(n_chars, 0.25) AS q1, "
    "  quantile_cont(n_chars, 0.75) AS q3 FROM documents "
    "  WHERE n_chars IS NOT NULL GROUP BY 1), "
    "f AS (SELECT source, n_docs, q1, q3, "
    "  q1 - 1.5e0 * (q3 - q1) AS lo, q3 + 1.5e0 * (q3 - q1) AS hi "
    "  FROM q), "
    "c AS (SELECT d.source, "
    "  CAST(sum(CASE WHEN CAST(d.n_chars AS DOUBLE) < f.lo THEN 1 "
    "    ELSE 0 END) AS BIGINT) AS n_below, "
    "  CAST(sum(CASE WHEN CAST(d.n_chars AS DOUBLE) > f.hi THEN 1 "
    "    ELSE 0 END) AS BIGINT) AS n_above "
    "  FROM documents d JOIN f ON d.source = f.source "
    "  WHERE d.n_chars IS NOT NULL GROUP BY 1) "
    "SELECT f.source, f.n_docs, f.q1, f.q3, f.lo, f.hi, "
    "c.n_below, c.n_above, "
    "CAST(c.n_below + c.n_above AS DOUBLE) / f.n_docs AS outlier_frac "
    "FROM f JOIN c ON f.source = c.source",
)
def q_tukey_outliers(spark, sf_dir):
    """DQ3 (r11): per-source Tukey-fence (1.5·IQR) outlier screen on
    doc length — the nonparametric companion to the z-score screens
    (W17 MAD despike, W14an volume z): quartile fences survive the
    heavy tails that wreck mean/std fences on web text. Exact pooled
    quartiles (percentile ≡ quantile_cont, the A3 contract), fences in
    shared double arithmetic, boundary compares on identical bits; the
    sources-sized fence table broadcasts back onto one corpus pass —
    two scans total, counts integer, frac exactly rounded — RAW hash."""
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("n_chars").isNotNull()
    )
    q = docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.expr("percentile(n_chars, 0.25)").alias("q1"),
        F.expr("percentile(n_chars, 0.75)").alias("q3"),
    )
    f = q.select(
        "source",
        "n_docs",
        "q1",
        "q3",
        (F.col("q1") - F.lit(1.5) * (F.col("q3") - F.col("q1"))).alias("lo"),
        (F.col("q3") + F.lit(1.5) * (F.col("q3") - F.col("q1"))).alias("hi"),
    )
    c = docs.join(F.broadcast(f), "source").groupBy("source").agg(
        F.sum(
            (F.col("n_chars").cast("double") < F.col("lo")).cast("int")
        ).cast("long").alias("n_below"),
        F.sum(
            (F.col("n_chars").cast("double") > F.col("hi")).cast("int")
        ).cast("long").alias("n_above"),
    )
    return f.join(c, "source").select(
        "source",
        "n_docs",
        "q1",
        "q3",
        "lo",
        "hi",
        "n_below",
        "n_above",
        (
            (F.col("n_below") + F.col("n_above")).cast("double")
            / F.col("n_docs")
        ).alias("outlier_frac"),
    )


# --- E6p (r11w2): leakage-free temporal split manifest over events ---
@register(
    "q_temporal_split",
    "WITH e AS (SELECT epoch_us(ts) AS us, user_id FROM events "
    "  WHERE ts IS NOT NULL), "
    "b AS (SELECT quantile_cont(us, 0.8) AS b1, "
    "  quantile_cont(us, 0.9) AS b2 FROM e), "
    "a AS (SELECT CASE WHEN CAST(us AS DOUBLE) <= b.b1 THEN 'train' "
    "  WHEN CAST(us AS DOUBLE) <= b.b2 THEN 'val' ELSE 'test' END AS split, "
    "  us, user_id FROM e, b) "
    "SELECT split, CAST(count(*) AS BIGINT) AS n_events, "
    "CAST(count(DISTINCT user_id) AS BIGINT) AS n_users, "
    "CAST(min(us) AS BIGINT) AS us_min, CAST(max(us) AS BIGINT) AS us_max "
    "FROM a GROUP BY 1",
)
def q_temporal_split(spark, sf_dir):
    """E6p (r11w2): time-based 80/10/10 split of the event log at the
    EXACT 0.8/0.9 timestamp percentiles — the forecasting-correct
    split (random splits leak the future into training; E2o's
    component split fixes duplicate leakage, this fixes TEMPORAL
    leakage — the two orthogonal split disciplines a training pipeline
    needs). Boundaries are exact pooled percentiles (quantile_cont ≡
    percentile, the A3 contract); membership compares the integer
    micros against the boundary double — identical bits both engines.
    One percentile aggregate + one corpus pass to 3 summary rows;
    the per-row split column itself is a pure projection any shard
    can apply independently."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull()
    ).select(F.unix_micros("ts").alias("us"), "user_id")
    b = ev.agg(
        F.expr("percentile(us, 0.8)").alias("b1"),
        F.expr("percentile(us, 0.9)").alias("b2"),
    )
    a = ev.crossJoin(F.broadcast(b)).select(
        F.when(F.col("us").cast("double") <= F.col("b1"), F.lit("train"))
        .when(F.col("us").cast("double") <= F.col("b2"), F.lit("val"))
        .otherwise(F.lit("test"))
        .alias("split"),
        "us",
        "user_id",
    )
    return a.groupBy("split").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.countDistinct("user_id").cast("long").alias("n_users"),
        F.min("us").cast("long").alias("us_min"),
        F.max("us").cast("long").alias("us_max"),
    )


# --- E1j (r12): schema-on-read JSON extraction over events.props ---
@register(
    "q_json_extract",
    "WITH e AS (SELECT event_type, "
    "  TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS k "
    "  FROM events) "
    "SELECT event_type, CAST(count(*) AS BIGINT) AS n, "
    "CAST(count(k) AS BIGINT) AS n_k, "
    "CAST(sum(k) AS BIGINT) AS sum_k, "
    "CAST(min(k) AS BIGINT) AS min_k, "
    "CAST(max(k) AS BIGINT) AS max_k, "
    "CAST(sum(k) AS DOUBLE) / count(k) AS avg_k "
    "FROM e GROUP BY 1",
)
def q_json_extract(spark, sf_dir):
    """E1j (r12): schema-on-read extraction of the typed numeric field
    inside the ``events.props`` JSON VARCHAR column — the relational
    face of the multimodal "typed metadata" contract (the binary
    header parsers in operators/multimodal.py read struct fields out
    of bytes; this reads them out of JSON text), and the first query
    family to touch the driver's semi-structured surface at all.
    Spark-first: ``get_json_object`` is a JVM-side built-in (no Python
    in the hot path) and the extraction is a pure projection fused
    into the scan stage, so the corpus is touched once and only
    (event_type, k) reaches the one hash-aggregate shuffle. Typed
    cast BIGINT both engines (Spark get_json_object / DuckDB
    json_extract_string both return VARCHAR); the oracle uses
    TRY_CAST so an untypeable value (e.g. "1.5" or a string) yields
    typed NULL on BOTH engines — Spark's non-ANSI cast NULLs
    natively, DuckDB's strict CAST would raise (ADVICE r13 pinned
    the "typed NULL on untypeable" policy cross-engine); sums/counts
    integer, avg an exact IEEE division of int64 quantities — RAW
    hash."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.get_json_object("props", "$.k").cast("long").alias("k"),
    )
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.count("k").cast("long").alias("n_k"),
        F.sum("k").cast("long").alias("sum_k"),
        F.min("k").cast("long").alias("min_k"),
        F.max("k").cast("long").alias("max_k"),
        (F.sum("k").cast("double") / F.count("k")).alias("avg_k"),
    )


# --- E1k (r12): JSON NULL-on-absent / NULL-on-corrupt contract ---
@register(
    "q_json_null_contract",
    "WITH e AS (SELECT event_type, "
    "  TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS k, "
    "  TRY_CAST(json_extract_string(props, '$.missing') AS BIGINT) AS m, "
    "  CASE WHEN json_valid(substr(props, 1, 4)) "
    "    THEN TRY_CAST(json_extract_string(substr(props, 1, 4), '$.k') "
    "      AS BIGINT) END AS kc "
    "  FROM events) "
    "SELECT event_type, CAST(count(*) AS BIGINT) AS n, "
    "CAST(count(k) AS BIGINT) AS n_k, "
    "CAST(sum(CASE WHEN m IS NULL THEN 1 ELSE 0 END) AS BIGINT) "
    "  AS n_missing_null, "
    "CAST(count(kc) AS BIGINT) AS n_corrupt_parsed "
    "FROM e GROUP BY 1",
)
def q_json_null_contract(spark, sf_dir):
    """E1k (r12): the schema-on-read robustness contract — extraction
    of an ABSENT key and extraction from CORRUPT JSON both yield
    typed NULL, never an error, in BOTH engines. Spark's
    ``get_json_object`` returns NULL on a missing path and on
    malformed input natively; DuckDB's ``json_extract_string``
    RAISES on malformed JSON, so the oracle spells the same policy
    explicitly with a ``json_valid`` guard — the documented
    cross-engine contract is "NULL on absent, NULL on corrupt,
    typed cast after". Corrupt input is manufactured per-row by
    truncating the real props to 4 chars (``{"k"`` — never valid),
    so the contract is exercised on every row of the actual driver
    data, not a planted fixture. One scan, one hash aggregate."""
    corrupt = F.substring("props", 1, 4)
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.get_json_object("props", "$.k").cast("long").alias("k"),
        F.get_json_object("props", "$.missing").cast("long").alias("m"),
        F.get_json_object(corrupt, "$.k").cast("long").alias("kc"),
    )
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.count("k").cast("long").alias("n_k"),
        F.sum(F.col("m").isNull().cast("int")).cast("long").alias(
            "n_missing_null"
        ),
        F.count("kc").cast("long").alias("n_corrupt_parsed"),
    )


# --- J10e (r12): TPC-H Q14 promo-revenue-share shape (part-keyed) ---
@register(
    "q_tpch_q14_shape",
    "WITH l AS (SELECT l_partkey, "
    "  floor(l_extendedprice * (1.0 - l_discount) * 64.0 "
    "    + 0.5000152587890625) / 64.0 AS rev "
    "  FROM lineitem WHERE l_shipdate >= TIMESTAMP '1996-01-01' "
    "    AND l_shipdate < TIMESTAMP '1996-04-01') "
    "SELECT CAST(count(*) AS BIGINT) AS n_items, "
    "sum(CASE WHEN p_type = 'PROMO' THEN rev ELSE 0.0 END) "
    "  AS promo_revenue, "
    "sum(rev) AS total_revenue, "
    "100.0 * sum(CASE WHEN p_type = 'PROMO' THEN rev ELSE 0.0 END) "
    "  / sum(rev) AS promo_share "
    "FROM l JOIN part ON l_partkey = p_partkey",
)
def q_tpch_q14_shape(spark, sf_dir):
    """J10e (r12): the TPC-H Q14 promo-revenue-share shape — the first
    query to touch the ``part`` dimension at all (the Q1/Q3/Q5/Q6
    quartet never joins it): part⋈lineitem key join + conditional
    aggregation into a share-of-total ratio. Spark-first: the shipdate
    range pushes into the lineitem parquet scan, ``part`` broadcasts
    (2k rows/SF — a classic dim), so the plan is scan→BroadcastHashJoin
    →one map-side-combined scalar aggregate with NO shuffle of the
    fact. Per-line revenue dyadic-quantized (1/64, the Q5 device)
    before the sums, conditional term an exact CASE on the quantized
    value — both sums association-free exact dyadics, the share one
    IEEE division — RAW hash."""
    from mhw3d_detection_spark.operators.analysis import dyadic_quantize

    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    ).select(
        "l_partkey",
        dyadic_quantize(
            F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")), 6
        ).alias("rev"),
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    j = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    promo = F.sum(
        F.when(F.col("p_type") == "PROMO", F.col("rev")).otherwise(F.lit(0.0))
    )
    return j.agg(
        F.count(F.lit(1)).cast("long").alias("n_items"),
        promo.alias("promo_revenue"),
        F.sum("rev").alias("total_revenue"),
        (F.lit(100.0) * promo / F.sum("rev")).alias("promo_share"),
    )


# --- J10f (r12): TPC-H Q19 disjunctive-predicate shape (part-keyed) ---
@register(
    "q_tpch_q19_shape",
    "WITH l AS (SELECT l_partkey, l_quantity, "
    "  floor(l_extendedprice * (1.0 - l_discount) * 64.0 "
    "    + 0.5000152587890625) / 64.0 AS rev "
    "  FROM lineitem) "
    "SELECT CAST(count(*) AS BIGINT) AS n_items, sum(rev) AS revenue "
    "FROM l JOIN part ON l_partkey = p_partkey "
    "WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15 "
    "    AND l_quantity BETWEEN 1 AND 20) "
    "  OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25 "
    "    AND l_quantity BETWEEN 10 AND 30) "
    "  OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35 "
    "    AND l_quantity BETWEEN 20 AND 40)",
)
def q_tpch_q19_shape(spark, sf_dir):
    """J10f (r12): the TPC-H Q19 discounted-revenue shape — the
    canonical OR-of-ANDs disjunctive-predicate pushdown stress: three
    (brand, size-range, quantity-range) branches over the part⋈lineitem
    join. Spark-first: Catalyst's CNF conversion
    (PushExtraPredicateThroughJoin, SPARK-31705) factors the
    single-side clauses out of the disjunction — the brand/size
    disjunction reaches the part scan and the quantity envelope
    reaches the lineitem scan as PushedFilters (plan-audited), so
    neither side materializes rows no branch can accept; part then
    broadcasts and the residual OR evaluates on the joined rows.
    Revenue dyadic-quantized (1/64) before the sum — RAW hash."""
    from mhw3d_detection_spark.operators.analysis import dyadic_quantize

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        "l_quantity",
        dyadic_quantize(
            F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")), 6
        ).alias("rev"),
    )
    part = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_brand", "p_size"
    )
    j = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    branch = (
        (F.col("p_brand") == "Brand#12")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(1, 20)
    ) | (
        (F.col("p_brand") == "Brand#23")
        & F.col("p_size").between(1, 25)
        & F.col("l_quantity").between(10, 30)
    ) | (
        (F.col("p_brand") == "Brand#3")
        & F.col("p_size").between(1, 35)
        & F.col("l_quantity").between(20, 40)
    )
    return j.filter(branch).agg(
        F.count(F.lit(1)).cast("long").alias("n_items"),
        F.sum("rev").alias("revenue"),
    )




# --- W14km/W14kc/W14kl (r12): session-grain survival analysis ---------------
# Subject: SESSION LENGTH (minutes, first->last event inside the W14ev
# 2 h-gap session). A completed session is an OBSERVED duration; a
# session whose last event lies within one gap (2 h) of the stream's
# end may still be open -> right-CENSORED. The user-lifetime grain is
# the wrong subject on an always-on event stream (every user is active
# near the stream end, so churn is never observed); session length is
# the duration the data actually measures, and the estimator/devices
# are identical.
_KM_SESS_SQL = (
    "e AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS us "
    "  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL), "
    f"l AS (SELECT user_id, event_id, event_type, us, lag(us) {_SS_WIN} "
    "  AS pus FROM e), "
    "m AS (SELECT user_id, event_type, us, event_id, CASE WHEN pus IS "
    "  NULL OR us - pus > 7200000000 THEN 1 ELSE 0 END AS new_s FROM l), "
    "s AS (SELECT user_id, event_type, us, event_id, CAST(sum(new_s) "
    "  OVER (PARTITION BY user_id ORDER BY us, event_id "
    "  ROWS UNBOUNDED PRECEDING) AS INT) AS session_id FROM m), "
    "r AS (SELECT user_id, session_id, event_type, us, "
    "  row_number() OVER (PARTITION BY user_id, session_id "
    "    ORDER BY us, event_id) AS rn_f FROM s), "
    "sess AS (SELECT user_id, session_id, min(us) AS f, max(us) AS l, "
    "  max(CASE WHEN rn_f = 1 THEN event_type END) AS cohort "
    "  FROM r GROUP BY 1, 2), "
    "c AS (SELECT max(us) - 7200000000 AS cut FROM e), "
    "d AS (SELECT cohort, "
    "  CAST(floor(CAST(l - f AS DOUBLE) / 60000000.0) AS BIGINT) "
    "    AS dur_m, "
    "  CASE WHEN l < c.cut THEN 1 ELSE 0 END AS obs FROM sess, c) "
)

_KM_LN_SQL = dyadic_quantize_sql(
    "ln(CAST(n_risk - d_t AS DOUBLE) / CAST(n_risk AS DOUBLE))", 40
)


def _session_survival_frame(spark, sf_dir):
    """Shared builder: one row per SESSION with ``(cohort, dur_m,
    obs)`` — cohort = the session's first event type (the W14ee
    device), dur_m = session length in minutes, obs = 1 unless the
    session's last event is within one 2 h gap of the stream end
    (possibly still open -> censored). Session split + entry type +
    lifetime all run inside the one per-user shuffle."""
    return session_frame_from_events(load_table(spark, sf_dir, "events"))


def session_frame_from_events(events):
    """DataFrame-input face of :func:`_session_survival_frame` (r13) —
    lets the composed :func:`plans.survival_report.survival_report`
    build the frame once from an already-loaded events table."""
    ev = events.filter(
        F.col("user_id").isNotNull() & F.col("ts").isNotNull()
    ).select(
        "user_id",
        "event_id",
        "event_type",
        F.unix_micros("ts").alias("us"),
    )
    w_u = Window.partitionBy("user_id").orderBy("us", "event_id")
    m = ev.withColumn(
        "new_s",
        F.when(
            F.lag("us").over(w_u).isNull()
            | (F.col("us") - F.lag("us").over(w_u) > 7200000000),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    s = m.withColumn(
        "session_id",
        F.sum("new_s").over(
            w_u.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).cast("int"),
    )
    w_s = Window.partitionBy("user_id", "session_id").orderBy(
        "us", "event_id"
    )
    r = s.withColumn("rn_f", F.row_number().over(w_s))
    sess = r.groupBy("user_id", "session_id").agg(
        F.min("us").alias("f"),
        F.max("us").alias("l"),
        F.max(
            F.when(F.col("rn_f") == 1, F.col("event_type"))
        ).alias("cohort"),
    )
    cut = ev.agg((F.max("us") - F.lit(7200000000)).alias("cut"))
    return sess.crossJoin(F.broadcast(cut)).select(
        "cohort",
        F.floor(
            (F.col("l") - F.col("f")).cast("double") / F.lit(60000000.0)
        ).cast("long").alias("dur_m"),
        (F.col("l") < F.col("cut")).cast("int").alias("obs"),
    )


def _km_curve(d, part_cols):
    """Shared KM assembly over a duration frame ``(…, dur_m, obs)``:
    spine -> reverse-cumulative at-risk -> dyadic ln terms -> survival
    product; ``part_cols`` partitions every window (empty = pooled
    single spine; ["cohort"] = parallel per-cohort spines)."""
    from mhw3d_detection_spark.operators.analysis import dyadic_quantize

    sp = d.groupBy(*part_cols, "dur_m").agg(
        F.sum("obs").cast("long").alias("d_t"),
        (F.count(F.lit(1)) - F.sum("obs")).cast("long").alias("c_t"),
    )
    w_fwd = Window.partitionBy(*part_cols).orderBy("dur_m").rowsBetween(
        Window.currentRow, Window.unboundedFollowing
    )
    k = sp.select(
        *part_cols,
        "dur_m",
        "d_t",
        "c_t",
        F.sum(F.col("d_t") + F.col("c_t")).over(w_fwd).cast("long").alias(
            "n_risk"
        ),
    )
    lt = F.when(
        (F.col("d_t") > 0) & (F.col("n_risk") > F.col("d_t")),
        dyadic_quantize(
            F.log(
                (F.col("n_risk") - F.col("d_t")).cast("double")
                / F.col("n_risk").cast("double")
            ),
            40,
        ),
    ).otherwise(F.lit(0.0))
    s = k.select(
        *part_cols,
        "dur_m",
        "d_t",
        "c_t",
        "n_risk",
        lt.alias("lt"),
        (F.col("d_t") == F.col("n_risk")).cast("int").alias("dead"),
    )
    w_cum = Window.partitionBy(*part_cols).orderBy("dur_m").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    # log_survival is the RAW-exact quantity (an order-free sum of
    # dyadic 2^-40 terms); survival itself crosses exp() — the one
    # libm call whose last bit is NOT pinned across engines (JVM
    # Math.exp vs C libm diverged by 1 ulp on real session data, the
    # r12 raw pass caught it) — so it is rq6 display-grade, the
    # lang-entropy convention
    return s.select(
        *part_cols,
        F.col("dur_m").alias("dur_minutes"),
        "n_risk",
        F.col("d_t").alias("n_events"),
        F.col("c_t").alias("n_censored"),
        (F.col("d_t").cast("double") / F.col("n_risk")).alias("hazard"),
        F.when(F.max("dead").over(w_cum) == 1, F.lit(None))
        .otherwise(F.sum("lt").over(w_cum))
        .alias("log_survival"),
        F.when(F.max("dead").over(w_cum) == 1, F.lit(0.0))
        .otherwise(rq(F.exp(F.sum("lt").over(w_cum)), 6))
        .alias("survival"),
    )


@register(
    "q_survival_km",
    "WITH " + _KM_SESS_SQL + ", "
    "sp AS (SELECT dur_m, CAST(sum(obs) AS BIGINT) AS d_t, "
    "  CAST(count(*) - sum(obs) AS BIGINT) AS c_t FROM d GROUP BY 1), "
    "k AS (SELECT dur_m, d_t, c_t, "
    "  CAST(sum(d_t + c_t) OVER (ORDER BY dur_m ROWS BETWEEN "
    "    CURRENT ROW AND UNBOUNDED FOLLOWING) AS BIGINT) AS n_risk "
    "  FROM sp), "
    "st AS (SELECT dur_m, d_t, c_t, n_risk, "
    "  CASE WHEN d_t > 0 AND n_risk > d_t THEN " + _KM_LN_SQL
    + "    ELSE 0.0e0 END AS lt, "
    "  CASE WHEN d_t = n_risk THEN 1 ELSE 0 END AS dead FROM k) "
    "SELECT dur_m AS dur_minutes, n_risk, d_t AS n_events, "
    "c_t AS n_censored, "
    "CAST(d_t AS DOUBLE) / n_risk AS hazard, "
    "CASE WHEN max(dead) OVER (ORDER BY dur_m ROWS BETWEEN UNBOUNDED "
    "  PRECEDING AND CURRENT ROW) = 1 THEN NULL ELSE "
    "  sum(lt) OVER (ORDER BY dur_m ROWS BETWEEN UNBOUNDED "
    "  PRECEDING AND CURRENT ROW) END AS log_survival, "
    "CASE WHEN max(dead) OVER (ORDER BY dur_m ROWS BETWEEN UNBOUNDED "
    "  PRECEDING AND CURRENT ROW) = 1 THEN 0.0e0 ELSE "
    + rq_sql(
        "exp(sum(lt) OVER (ORDER BY dur_m ROWS BETWEEN UNBOUNDED "
        "PRECEDING AND CURRENT ROW))",
        6,
    )
    + " END AS survival "
    "FROM st",
)
def q_survival_km(spark, sf_dir):
    """W14km (r12): Kaplan-Meier survival curve of SESSION LENGTH with
    right-censoring — "what fraction of sessions survive past t
    minutes", the estimator the W14ss session-stats summary bins away,
    plus the discrete-time hazard d/n per step. Sessions are the W14ev
    2 h-gap chain; a completed session is an observed duration, one
    whose last event lies within a gap of the stream end is CENSORED
    (possibly still open) — the distinction a naive mean-session-length
    truncates into bias at every stream boundary.

    Spark-first exactness: session split + lifetime run inside the one
    per-user shuffle; the curve runs on the DISTINCT-durations spine
    (ks-spine rule): reverse-cumulative integer at-risk counts,
    Π(1 − d/n) as exp of the running sum of per-step ln((n−d)/n) terms
    — each a libm ln of an exact int64 rational, dyadic-quantized
    (2^-40) so the running sum is order-free exact; a d = n step pins
    survival to exactly 0.0 via a flag (Spark's floor(−inf) is a LONG
    clamp, DuckDB's a DOUBLE). RAW hash."""
    return _km_curve(_session_survival_frame(spark, sf_dir), [])


@register(
    "q_survival_km_cohort",
    "WITH " + _KM_SESS_SQL + ", "
    "sp AS (SELECT cohort, dur_m, CAST(sum(obs) AS BIGINT) AS d_t, "
    "  CAST(count(*) - sum(obs) AS BIGINT) AS c_t FROM d GROUP BY 1, 2), "
    "k AS (SELECT cohort, dur_m, d_t, c_t, "
    "  CAST(sum(d_t + c_t) OVER (PARTITION BY cohort ORDER BY dur_m "
    "    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS BIGINT) "
    "    AS n_risk FROM sp), "
    "st AS (SELECT cohort, dur_m, d_t, c_t, n_risk, "
    "  CASE WHEN d_t > 0 AND n_risk > d_t THEN " + _KM_LN_SQL
    + "    ELSE 0.0e0 END AS lt, "
    "  CASE WHEN d_t = n_risk THEN 1 ELSE 0 END AS dead FROM k) "
    "SELECT cohort, dur_m AS dur_minutes, n_risk, d_t AS n_events, "
    "c_t AS n_censored, "
    "CAST(d_t AS DOUBLE) / n_risk AS hazard, "
    "CASE WHEN max(dead) OVER (PARTITION BY cohort ORDER BY dur_m "
    "  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) = 1 "
    "  THEN NULL ELSE "
    "  sum(lt) OVER (PARTITION BY cohort ORDER BY dur_m "
    "  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) END "
    "  AS log_survival, "
    "CASE WHEN max(dead) OVER (PARTITION BY cohort ORDER BY dur_m "
    "  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) = 1 "
    "  THEN 0.0e0 ELSE "
    + rq_sql(
        "exp(sum(lt) OVER (PARTITION BY cohort ORDER BY dur_m "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))",
        6,
    )
    + " END AS survival "
    "FROM st",
)
def q_survival_km_cohort(spark, sf_dir):
    """W14kc (r12): Kaplan-Meier session-survival per ENTRY-TYPE
    cohort — one curve per landing event type (the session's first
    event, the W14ee device), the comparison the pooled W14km curve
    averages away ("do sessions that open with a search hold users
    longer than ones that open with an error?"). Every curve window
    runs PARTITION BY cohort over the (cohort × durations) spine — the
    grouped shape that keeps the spine windows parallel at any cohort
    count, unlike the pooled row's single-partition spine. Same
    exactness devices as W14km. RAW hash."""
    return _km_curve(_session_survival_frame(spark, sf_dir), ["cohort"])


_LR_E_SQL = "(CAST(d_t AS DOUBLE) * n_ct) / n_t"
_LR_V_SQL = (
    "CAST(d_t AS DOUBLE) * (CAST(n_ct AS DOUBLE) / n_t) "
    "* (1.0e0 - CAST(n_ct AS DOUBLE) / n_t) "
    "* ((CAST(n_t AS DOUBLE) - d_t) / (CAST(n_t AS DOUBLE) - 1.0e0))"
)


#: the log-rank CTE chain over the session frame ``d`` — shared by the
#: standalone W14kl oracle and the composed q_survival_report (r13)
_LR_CTES_SQL = (
    "spc AS (SELECT cohort, dur_m, CAST(sum(obs) AS BIGINT) AS d_ct, "
    "  CAST(count(*) AS BIGINT) AS t_ct FROM d GROUP BY 1, 2), "
    "spd AS (SELECT dur_m, CAST(sum(obs) AS BIGINT) AS d_t, "
    "  CAST(count(*) AS BIGINT) AS t_t FROM d GROUP BY 1), "
    "nt AS (SELECT dur_m, d_t, CAST(sum(t_t) OVER (ORDER BY dur_m "
    "  ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS BIGINT) "
    "  AS n_t FROM spd), "
    "dense AS (SELECT co.cohort, nt.dur_m, nt.d_t, nt.n_t "
    "  FROM (SELECT DISTINCT cohort FROM spc) co, nt), "
    "jj AS (SELECT dense.cohort, dense.dur_m, dense.d_t, dense.n_t, "
    "  COALESCE(spc.d_ct, 0) AS d_ct, COALESCE(spc.t_ct, 0) AS t_ct "
    "  FROM dense LEFT JOIN spc ON dense.cohort = spc.cohort "
    "    AND dense.dur_m = spc.dur_m), "
    "kk AS (SELECT cohort, dur_m, d_t, n_t, d_ct, "
    "  CAST(sum(t_ct) OVER (PARTITION BY cohort ORDER BY dur_m "
    "    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS BIGINT) "
    "    AS n_ct FROM jj), "
    "ev AS (SELECT cohort, d_ct, "
    f"  {dyadic_quantize_sql(_LR_E_SQL, 20)} AS e_term, "
    "  CASE WHEN n_t > 1 THEN "
    f"  {dyadic_quantize_sql(_LR_V_SQL, 20)} ELSE 0.0e0 END AS v_term "
    "  FROM kk WHERE d_t > 0), "
    "ag AS (SELECT cohort, CAST(sum(d_ct) AS BIGINT) AS o_events, "
    "  sum(e_term) AS e_events, sum(v_term) AS v_sum "
    "  FROM ev GROUP BY 1)"
)


@register(
    "q_survival_logrank",
    "WITH " + _KM_SESS_SQL + ", " + _LR_CTES_SQL + " "
    "SELECT cohort, o_events, e_events, "
    "CASE WHEN v_sum > 0 THEN "
    "  (CAST(o_events AS DOUBLE) - e_events) / sqrt(v_sum) END AS lr_z, "
    "CASE WHEN v_sum > 0 THEN "
    "  ((CAST(o_events AS DOUBLE) - e_events) / sqrt(v_sum)) "
    "  * ((CAST(o_events AS DOUBLE) - e_events) / sqrt(v_sum)) END "
    "  AS lr_chi2 "
    "FROM ag",
)
def q_survival_logrank(spark, sf_dir):
    """W14kl (r12): log-rank test of each entry-type cohort's
    session-survival vs the REST — the significance companion to
    W14kc's curves ("purchase-opening sessions LOOK longer — beyond
    noise?"): at every pooled event time, the cohort's observed
    session completions are compared to the expectation under the
    pooled hazard with the hypergeometric variance; Z = (O−E)/√V,
    chi² = Z² (1 dof), one row per cohort.

    Spark-first exactness: the same per-user session pass as W14kc,
    then EVERYTHING runs on the bounded (cohorts × durations) dense
    spine (cohorts = a types-sized distinct, durations = the pooled
    spine; their crossJoin is a bounded-spine product, the
    q_source_overlap class). At-risk counts are reverse-cumulative
    integers per cohort and pooled; E/V terms are IEEE expressions of
    identical int64 bits (one shared formula string per term — the
    Cramer device), dyadic-quantized (2^-20, exact while sessions
    < 2^33) before the durations-sized sums; Z's one sqrt IEEE-exact —
    RAW hash."""
    return _logrank_from_frame(_session_survival_frame(spark, sf_dir))


def _logrank_from_frame(d):
    """Log-rank each-cohort-vs-rest table from a ``(cohort, dur_m,
    obs)`` duration frame — shared by the standalone W14kl row and the
    composed :func:`plans.survival_report.survival_report` (r13)."""
    from mhw3d_detection_spark.operators.analysis import dyadic_quantize

    spc = d.groupBy("cohort", "dur_m").agg(
        F.sum("obs").cast("long").alias("d_ct"),
        F.count(F.lit(1)).cast("long").alias("t_ct"),
    )
    spd = d.groupBy("dur_m").agg(
        F.sum("obs").cast("long").alias("d_t"),
        F.count(F.lit(1)).cast("long").alias("t_t"),
    )
    w_pool = Window.orderBy("dur_m").rowsBetween(
        Window.currentRow, Window.unboundedFollowing
    )
    nt = spd.select(
        "dur_m",
        "d_t",
        F.sum("t_t").over(w_pool).cast("long").alias("n_t"),
    )
    cohorts = spc.select("cohort").distinct()
    dense = cohorts.crossJoin(nt)
    jj = dense.join(spc, ["cohort", "dur_m"], "left").select(
        "cohort",
        "dur_m",
        "d_t",
        "n_t",
        F.coalesce("d_ct", F.lit(0)).cast("long").alias("d_ct"),
        F.coalesce("t_ct", F.lit(0)).cast("long").alias("t_ct"),
    )
    w_coh = Window.partitionBy("cohort").orderBy("dur_m").rowsBetween(
        Window.currentRow, Window.unboundedFollowing
    )
    kk = jj.select(
        "cohort",
        "dur_m",
        "d_t",
        "n_t",
        "d_ct",
        F.sum("t_ct").over(w_coh).cast("long").alias("n_ct"),
    )
    evt = kk.filter(F.col("d_t") > 0).select(
        "cohort",
        "d_ct",
        dyadic_quantize(F.expr(_LR_E_SQL), 20).alias("e_term"),
        F.when(
            F.col("n_t") > 1,
            dyadic_quantize(F.expr(_LR_V_SQL), 20),
        ).otherwise(F.lit(0.0)).alias("v_term"),
    )
    ag = evt.groupBy("cohort").agg(
        F.sum("d_ct").cast("long").alias("o_events"),
        F.sum("e_term").alias("e_events"),
        F.sum("v_term").alias("v_sum"),
    )
    z = (F.col("o_events").cast("double") - F.col("e_events")) / F.sqrt(
        F.col("v_sum")
    )
    return ag.select(
        "cohort",
        "o_events",
        "e_events",
        F.when(F.col("v_sum") > 0, z).alias("lr_z"),
        F.when(F.col("v_sum") > 0, z * z).alias("lr_chi2"),
    )


# --- J10g (r12): TPC-H Q9 product-profit shape (part name filter) ---
@register(
    "q_tpch_q9_shape",
    "WITH l AS (SELECT l_orderkey, l_suppkey, "
    "  floor(l_extendedprice * (1.0 - l_discount) * 64.0 "
    "    + 0.5000152587890625) / 64.0 AS rev "
    "  FROM lineitem JOIN part ON l_partkey = p_partkey "
    "  WHERE p_name LIKE '%red%') "
    "SELECT n_name, CAST(year(o_orderdate) AS INT) AS o_year, "
    "CAST(count(*) AS BIGINT) AS n_items, sum(rev) AS revenue "
    "FROM l JOIN orders ON l_orderkey = o_orderkey "
    "JOIN supplier ON l_suppkey = s_suppkey "
    "JOIN nation ON s_nationkey = n_nationkey "
    "GROUP BY 1, 2",
)
def q_tpch_q9_shape(spark, sf_dir):
    """J10g (r12): the TPC-H Q9 product-profit shape — revenue of
    name-matched parts by supplier nation × order year: the multi-dim
    chain (part + supplier + nation + orders) the Q14/Q19 pair doesn't
    exercise, with a substring part filter. Spark-first: the LIKE
    filter prunes the part dim BEFORE its broadcast, supplier/nation
    broadcast too, so the only shuffle is lineitem⋈orders on the order
    key and the final 2-key group; per-line revenue dyadic 1/64 (the
    Q5 device) — RAW hash."""
    from mhw3d_detection_spark.operators.analysis import dyadic_quantize

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_partkey",
        "l_suppkey",
        dyadic_quantize(
            F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")), 6
        ).alias("rev"),
    )
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").contains("red")
    ).select("p_partkey")
    supp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    nat = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate"
    )
    j = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nat), supp.s_nationkey == nat.n_nationkey)
    )
    return j.groupBy(
        "n_name", F.year("o_orderdate").cast("int").alias("o_year")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_items"),
        F.sum("rev").alias("revenue"),
    )


# =============================================================================
# J12 (r13): correlated-subquery family — TPC-H Q4/Q13/Q18/Q21/Q22 +
# Q2-style min-cost supplier. The one classic relational capability
# axis with zero prior coverage (VERDICT r12 Next #2): EXISTS /
# NOT-EXISTS decorrelation, IN over a grouped HAVING, scalar
# subqueries, and the left-outer count distribution. These run through
# ``spark.sql`` over registered temp views ON PURPOSE — the point of
# the family is Catalyst's RewritePredicateSubquery /
# DecorrelateInnerQuery rewrites (EXISTS -> LeftSemi, NOT EXISTS ->
# LeftAnti, correlated scalar agg -> Aggregate+Join), which the
# DataFrame API cannot express directly. One SQL string serves BOTH
# engines (every float literal exponent-suffixed so each parses it on
# the strtod DOUBLE path — the dlit() rule).
#
# Schema adaptations (driver's simplified TPC-H lacks l_commitdate /
# l_receiptdate / o_comment / c_phone / partsupp): Q4's "late line"
# EXISTS condition becomes l_returnflag='R' (a returned line); Q13's
# comment filter becomes o_orderpriority <> '1-URGENT'; Q21's "kept
# waiting" line is the returned one; Q22's country code is
# c_nationkey and its "no orders" anti-condition becomes "no URGENT
# order" (every driver customer has orders); Q2's partsupp supplycost
# becomes min unit price observed in lineitem per (part, supplier).
# =============================================================================


def _rqx(expr: str, d: int = 4) -> str:
    """:func:`queries.base.rq` spelled as SQL with exponent-suffixed
    literals so BOTH Spark SQL and DuckDB parse every constant on the
    strtod DOUBLE path (bare decimal literals infer DECIMAL in both
    engines; DECIMAL->DOUBLE is the 1-ulp hazard ``dlit`` documents).
    Lets one SQL string serve as the Spark query AND its oracle."""
    from mhw3d_detection_spark.queries.base import _rq_eps, dlit

    s = dlit(float(10**d))
    return f"floor(({expr}) * {s} + {dlit(0.5 + _rq_eps(d))}) / {s}"


def _sql_query(name: str, sql: str, doc: str | None = None):
    """Register a shared-text SQL query: the SAME string is the Spark
    plan (via temp views) and the DuckDB oracle. ``doc`` may also be
    assigned to the returned function afterwards."""
    from mhw3d_detection_spark.sources.tables import register_views

    def fn(spark, sf_dir):
        register_views(spark, sf_dir)
        return spark.sql(sql)

    fn.__name__ = name
    fn.__doc__ = doc
    return register(name, sql)(fn)


_TPCH_Q4_SQL = (
    "SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count "
    "FROM orders "
    "WHERE o_orderdate >= TIMESTAMP '1996-01-01' "
    "  AND o_orderdate < TIMESTAMP '1996-07-01' "
    "  AND EXISTS (SELECT 1 FROM lineitem "
    "    WHERE l_orderkey = o_orderkey AND l_returnflag = 'R') "
    "GROUP BY o_orderpriority"
)

q_tpch_q4_shape = _sql_query(
    "q_tpch_q4_shape",
    _TPCH_Q4_SQL,
    """J12a (r13): the TPC-H Q4 order-priority-checking shape — a
    correlated EXISTS over the fact table inside a date-windowed
    aggregate. Spark-first: RewritePredicateSubquery turns the EXISTS
    into a LEFT SEMI join on l_orderkey, so each order is tested once
    against the (distinct-by-join) lineitem side and the date window
    pushes into the orders scan as PushedFilters; counts only — exact.
    At 100 TB the semi join shuffles both sides on the order key once;
    no row multiplication, no decorrelation residue.""",
)


_TPCH_Q13_SQL = (
    "SELECT c_count, CAST(count(*) AS BIGINT) AS custdist FROM ("
    "  SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count "
    "  FROM customer LEFT OUTER JOIN orders "
    "    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT' "
    "  GROUP BY c_custkey) t "
    "GROUP BY c_count"
)

q_tpch_q13_shape = _sql_query(
    "q_tpch_q13_shape",
    _TPCH_Q13_SQL,
    """J12b (r13): the TPC-H Q13 customer-distribution shape — LEFT
    OUTER join with a filter INSIDE the join condition (so customers
    whose only orders are urgent still count as zero), then a
    double aggregation into the order-count histogram. Spark-first:
    the outer join shuffles on the customer key, count(o_orderkey)
    skips the NULLs the outer join manufactures, and the second
    aggregate is domain-bounded (distinct order counts). Counts only —
    exact; the join-condition filter must NOT be pushed below the
    outer join (Catalyst keeps it in the ON clause — that asymmetry
    is the thing this row pins).""",
)


_TPCH_Q18_SQL = (
    "SELECT c_name, c_custkey, o_orderkey, o_totalprice, "
    "  sum(l_quantity) AS total_qty "
    "FROM customer JOIN orders ON c_custkey = o_custkey "
    "JOIN lineitem ON o_orderkey = l_orderkey "
    "WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem "
    "  GROUP BY l_orderkey HAVING sum(l_quantity) > 200.0e0) "
    "GROUP BY c_name, c_custkey, o_orderkey, o_totalprice"
)

q_tpch_q18_shape = _sql_query(
    "q_tpch_q18_shape",
    _TPCH_Q18_SQL,
    """J12c (r13): the TPC-H Q18 large-volume-customer shape — IN over
    a grouped HAVING subquery (the "orders whose total quantity
    exceeds the threshold" idiom). Spark-first: the IN subquery
    rewrites to a LEFT SEMI join against the pre-aggregated lineitem
    rollup, so the fact is aggregated once (map-side partial) and the
    semi join carries only qualifying order keys; driver quantities
    are integer-valued doubles, so the HAVING sums and total_qty are
    EXACT (no quantization needed) and o_totalprice is a verbatim
    column value — RAW hash.""",
)


_TPCH_Q21_SQL = (
    "SELECT s_name, CAST(count(*) AS BIGINT) AS numwait "
    "FROM supplier JOIN lineitem l1 ON s_suppkey = l1.l_suppkey "
    "JOIN orders ON o_orderkey = l1.l_orderkey "
    "JOIN nation ON s_nationkey = n_nationkey "
    "WHERE o_orderstatus = 'F' AND l1.l_returnflag = 'R' "
    "  AND n_name IN ('NATION_7', 'NATION_13') "
    "  AND EXISTS (SELECT 1 FROM lineitem l2 "
    "    WHERE l2.l_orderkey = l1.l_orderkey "
    "      AND l2.l_suppkey <> l1.l_suppkey) "
    "  AND NOT EXISTS (SELECT 1 FROM lineitem l3 "
    "    WHERE l3.l_orderkey = l1.l_orderkey "
    "      AND l3.l_suppkey <> l1.l_suppkey "
    "      AND l3.l_returnflag = 'R') "
    "GROUP BY s_name"
)

q_tpch_q21_shape = _sql_query(
    "q_tpch_q21_shape",
    _TPCH_Q21_SQL,
    """J12d (r13): the TPC-H Q21 suppliers-who-kept-waiting shape —
    the classic double-correlated EXISTS + NOT-EXISTS over the SAME
    fact table: the supplier's returned line on a finished
    multi-supplier order where NO other supplier's line was returned.
    Spark-first: both subqueries decorrelate to one LEFT SEMI and one
    LEFT ANTI join on l_orderkey (the non-equi l_suppkey <> guard
    rides along as the post-match condition), so lineitem is scanned
    three times but shuffled on the same key each time — a 100 TB
    plan with no row explosion. Also the first query to predicate on
    ``o_orderstatus`` (VERDICT r12 column-gap #3). Counts only —
    exact.""",
)


_TPCH_Q22_SQL = (
    "SELECT c_nationkey AS cntrycode, CAST(count(*) AS BIGINT) AS numcust, "
    f"  {_rqx('sum(c_acctbal)', 2)} AS totacctbal "
    "FROM customer "
    "WHERE c_nationkey IN (1, 3, 5, 7, 9, 11, 13) "
    f"  AND c_acctbal > (SELECT {_rqx('avg(c_acctbal)', 2)} FROM customer "
    "    WHERE c_acctbal > 0.0e0 "
    "      AND c_nationkey IN (1, 3, 5, 7, 9, 11, 13)) "
    "  AND NOT EXISTS (SELECT 1 FROM orders "
    "    WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT') "
    "GROUP BY c_nationkey"
)

q_tpch_q22_shape = _sql_query(
    "q_tpch_q22_shape",
    _TPCH_Q22_SQL,
    """J12e (r13): the TPC-H Q22 global-sales-opportunity shape — an
    UNCORRELATED SCALAR subquery (the positive-balance average) used
    as a filter threshold PLUS a correlated NOT EXISTS anti-join, over
    the customer dimension. Adaptations: country code = c_nationkey
    (no c_phone in the driver schema); "has no orders" = "has no
    URGENT order" (every driver customer has orders). Spark-first:
    the scalar subquery executes once as its own tiny job and embeds
    as a literal in the main plan (no join at all), the NOT EXISTS
    becomes a LEFT ANTI shuffle join on the customer key. The
    threshold is rq-quantized (1e-2 grid, dyadic nudge) INSIDE both
    engines so the strict > comparison sees identical bits — the
    cross-engine aggregation-order noise on avg() is ~1e-9, five
    orders below the nudge. totacctbal rq'd the same way — RAW
    hash.""",
)


_TPCH_Q2_SQL = (
    "WITH cost AS ("
    "  SELECT l_partkey AS pk, l_suppkey AS sk, "
    "    min(l_extendedprice / l_quantity) AS unit_cost "
    "  FROM lineitem GROUP BY l_partkey, l_suppkey) "
    "SELECT s_name, s_acctbal, CAST(count(*) AS BIGINT) AS n_parts_won, "
    f"  {_rqx('sum(unit_cost / p_retailprice)', 4)} AS sum_cost_ratio "
    "FROM cost c1 JOIN part ON pk = p_partkey "
    "JOIN supplier ON sk = s_suppkey "
    "WHERE unit_cost = (SELECT min(c2.unit_cost) FROM cost c2 "
    "  WHERE c2.pk = c1.pk) "
    "GROUP BY s_name, s_acctbal"
)

q_tpch_q2_shape = _sql_query(
    "q_tpch_q2_shape",
    _TPCH_Q2_SQL,
    """J12f (r13): the TPC-H Q2 minimum-cost-supplier shape — a
    CORRELATED SCALAR AGGREGATE subquery (the per-part minimum
    matched back against the outer row), the decorrelation pattern
    the EXISTS family doesn't cover. Adaptation: the driver schema
    has no partsupp, so "supply cost" = the minimum unit price
    (l_extendedprice / l_quantity) each supplier was observed to
    charge for the part in lineitem; the winner-per-part set then
    rolls up per supplier. Spark-first: DecorrelateInnerQuery turns
    the scalar min into Aggregate(cost GROUP BY pk) + an equi-join on
    (pk, unit_cost = min) — no per-row re-execution; the cost CTE is
    one map-side-combined aggregate of the fact. Exactness: each
    unit price is ONE IEEE division (deterministic bits), min is
    exact selection, so the double-equality join matches identically
    in both engines; s_acctbal is a verbatim column (closing the
    VERDICT r12 column gap with p_retailprice); only the summed cost
    ratio needs the rq grid — RAW hash.""",
)


_ORDER_LIFECYCLE_SQL = (
    "WITH ls AS (SELECT l_orderkey, min(l_linestatus) AS lo, "
    "  max(l_linestatus) AS hi, CAST(count(*) AS BIGINT) AS n_lines "
    "  FROM lineitem GROUP BY l_orderkey) "
    "SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n_orders, "
    "CAST(sum(CASE WHEN lo = 'F' AND hi = 'F' THEN 1 ELSE 0 END) "
    "  AS BIGINT) AS n_all_f, "
    "CAST(sum(CASE WHEN lo = 'O' AND hi = 'O' THEN 1 ELSE 0 END) "
    "  AS BIGINT) AS n_all_o, "
    "CAST(sum(CASE WHEN lo <> hi THEN 1 ELSE 0 END) AS BIGINT) "
    "  AS n_mixed, "
    "CAST(sum(CASE WHEN lo IS NULL THEN 1 ELSE 0 END) AS BIGINT) "
    "  AS n_no_lines, "
    "CAST(sum(n_lines) AS BIGINT) AS total_lines, "
    f"{_rqx('sum(o_totalprice)', 2)} AS sum_totalprice "
    "FROM orders LEFT JOIN ls ON o_orderkey = l_orderkey "
    "GROUP BY o_orderstatus"
)

q_order_lifecycle_dq = _sql_query(
    "q_order_lifecycle_dq",
    _ORDER_LIFECYCLE_SQL,
    """DQ5 (r13): order-lifecycle consistency screen — the
    ``o_orderstatus`` × line-status contingency (in canonical TPC-H,
    status F means all lines F, O all O, P mixed; the screen measures
    how far the data is from that invariant, the Benford/Tukey-style
    DQ framing). Closes the last o_orderstatus column gap as a
    DEDICATED row (Q21 predicates on it; this one profiles it).
    Spark-first: one map-side-combined rollup of lineitem to the
    order grain, one LEFT join on the order key, one 3-group
    aggregate; min/max on strings are exact selections, counts exact,
    the money sum rq'd — RAW hash.""",
)


# --- W14kr (r13): composed survival report (the dedup_report economics) ----
def _km_cte_sql(pfx: str, part: str | None) -> str:
    """KM curve CTE chain over the session frame ``d`` with renamed
    stage names (``{pfx}sp/{pfx}k/{pfx}st``) so the pooled and cohort
    chains coexist in one composed WITH tree."""
    p = f"PARTITION BY {part} " if part else ""
    cols = f"{part}, dur_m" if part else "dur_m"
    grp = "1, 2" if part else "1"
    return (
        f"{pfx}sp AS (SELECT {cols}, CAST(sum(obs) AS BIGINT) AS d_t, "
        f"  CAST(count(*) - sum(obs) AS BIGINT) AS c_t FROM d "
        f"  GROUP BY {grp}), "
        f"{pfx}k AS (SELECT {cols}, d_t, c_t, "
        f"  CAST(sum(d_t + c_t) OVER ({p}ORDER BY dur_m ROWS BETWEEN "
        "    CURRENT ROW AND UNBOUNDED FOLLOWING) AS BIGINT) AS n_risk "
        f"  FROM {pfx}sp), "
        f"{pfx}st AS (SELECT {cols}, d_t, c_t, n_risk, "
        f"  CASE WHEN d_t > 0 AND n_risk > d_t THEN {_KM_LN_SQL} "
        "    ELSE 0.0e0 END AS lt, "
        f"  CASE WHEN d_t = n_risk THEN 1 ELSE 0 END AS dead FROM {pfx}k)"
    )


def _km_select_sql(pfx: str, part: str | None, section: str) -> str:
    """Curve section of the composed report's final UNION."""
    p = f"PARTITION BY {part} " if part else ""
    win = (
        f"OVER ({p}ORDER BY dur_m ROWS BETWEEN UNBOUNDED PRECEDING "
        "AND CURRENT ROW)"
    )
    cohort = part if part else "CAST(NULL AS VARCHAR)"
    return (
        f"SELECT '{section}' AS section, {cohort} AS cohort, "
        "dur_m AS dur_minutes, n_risk, d_t AS n_events, "
        "c_t AS n_censored, CAST(d_t AS DOUBLE) / n_risk AS hazard, "
        f"CASE WHEN max(dead) {win} = 1 THEN NULL "
        f"  ELSE sum(lt) {win} END AS log_survival, "
        f"CASE WHEN max(dead) {win} = 1 THEN 0.0e0 ELSE "
        + rq_sql(f"exp(sum(lt) {win})", 6)
        + " END AS survival, "
        "CAST(NULL AS DOUBLE) AS e_events, "
        "CAST(NULL AS DOUBLE) AS lr_z, CAST(NULL AS DOUBLE) AS lr_chi2 "
        f"FROM {pfx}st"
    )


_LR_Z_SQL = "(CAST(o_events AS DOUBLE) - e_events) / sqrt(v_sum)"

_SURVIVAL_REPORT_SQL = (
    "WITH " + _KM_SESS_SQL + ", "
    + _km_cte_sql("p", None) + ", "
    + _km_cte_sql("c", "cohort") + ", "
    + _LR_CTES_SQL + " "
    + _km_select_sql("p", None, "pooled")
    + " UNION ALL "
    + _km_select_sql("c", "cohort", "cohort")
    + " UNION ALL "
    "SELECT 'logrank' AS section, cohort, "
    "CAST(NULL AS BIGINT) AS dur_minutes, "
    "CAST(NULL AS BIGINT) AS n_risk, o_events AS n_events, "
    "CAST(NULL AS BIGINT) AS n_censored, "
    "CAST(NULL AS DOUBLE) AS hazard, "
    "CAST(NULL AS DOUBLE) AS log_survival, "
    "CAST(NULL AS DOUBLE) AS survival, e_events, "
    f"CASE WHEN v_sum > 0 THEN {_LR_Z_SQL} END AS lr_z, "
    f"CASE WHEN v_sum > 0 THEN ({_LR_Z_SQL}) * ({_LR_Z_SQL}) END "
    "  AS lr_chi2 "
    "FROM ag"
)


@register("q_survival_report", _SURVIVAL_REPORT_SQL)
def q_survival_report(spark, sf_dir):
    """W14kr (r13): the composed survival-analysis report — the session
    duration frame (the only corpus-sized stage the family has: one
    per-user sessionize window pass) computed and localCheckpointed
    ONCE, then the pooled KM curve (W14km), the per-entry-cohort
    curves (W14kc), and the each-cohort-vs-rest log-rank tests (W14kl)
    all emitted from that shared intermediate as one long-form report
    — the ``dedup_report`` economics applied to the survival family
    (VERDICT r12 Next #6; composed-vs-standalone ratio measured in
    docs/PLANS.md r13). Downstream of the frame everything is
    spine-bounded (distinct durations / cohorts × durations). Same
    exactness devices as the standalone rows: dyadic 2^-40 ln terms,
    order-free running sums, rq6 display-grade exp, dyadic 2^-20 E/V
    terms. DuckDB replays the identical CTE tree (the curve chains
    renamed p*/c* so both fit one WITH). RAW hash."""
    from mhw3d_detection_spark.plans.survival_report import survival_report

    ev = load_table(spark, sf_dir, "events")
    return survival_report(ev)


# =============================================================================
# J13 (r13): the rest of the TPC-H suite — with J10/J12 this completes
# all 22 canonical query shapes adapted to the driver schema (Q12's
# l_shipmode -> l_returnflag, Q16/Q20's partsupp -> per-(part,supplier)
# lineitem rollups, Q17's container -> size band; every adaptation
# noted per query). Same shared-text device as J12: one SQL string is
# BOTH the Spark plan and the DuckDB oracle; per-line revenue is
# quantized onto the exact dyadic 1/64 grid (the Q5 device) so every
# sum is association-order-free bit-exact.
# =============================================================================

#: per-line discounted revenue on the exact 1/64 dyadic grid, spelled
#: with exponent-suffixed literals so both engines parse DOUBLEs
_REV64_SQL = (
    "floor(l_extendedprice * (1.0e0 - l_discount) * 64.0e0 "
    "+ 0.5000152587890625e0) / 64.0e0"
)

#: l_extendedprice alone on the same grid (Q17's measure)
_PRICE64_SQL = (
    "floor(l_extendedprice * 64.0e0 + 0.5000152587890625e0) / 64.0e0"
)


q_tpch_q7_shape = _sql_query(
    "q_tpch_q7_shape",
    "WITH l AS (SELECT l_orderkey, l_suppkey, "
    "  CAST(year(l_shipdate) AS INT) AS l_year, "
    f"  {_REV64_SQL} AS rev FROM lineitem "
    "  WHERE l_shipdate >= TIMESTAMP '1995-01-01' "
    "    AND l_shipdate < TIMESTAMP '1997-01-01') "
    "SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation, l_year, "
    "CAST(count(*) AS BIGINT) AS n_items, sum(rev) AS revenue "
    "FROM l JOIN supplier ON l_suppkey = s_suppkey "
    "JOIN orders ON l_orderkey = o_orderkey "
    "JOIN customer ON o_custkey = c_custkey "
    "JOIN nation n1 ON s_nationkey = n1.n_nationkey "
    "JOIN nation n2 ON c_nationkey = n2.n_nationkey "
    "WHERE (n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_8') "
    "   OR (n1.n_name = 'NATION_8' AND n2.n_name = 'NATION_3') "
    "GROUP BY n1.n_name, n2.n_name, l_year",
)
q_tpch_q7_shape.__doc__ = """J13a (r13): the TPC-H Q7 volume-shipping
    shape — trade flow between two nations by year, with the SAME
    dimension (nation) joined twice under different roles (supplier's
    vs customer's) and a symmetric OR pairing them. Spark-first: both
    nation aliases broadcast; the OR stays a residual on the joined
    row (it references both sides); revenue dyadic 1/64 — RAW hash."""


q_tpch_q8_shape = _sql_query(
    "q_tpch_q8_shape",
    "WITH al AS (SELECT CAST(year(o_orderdate) AS INT) AS o_year, "
    f"  {_REV64_SQL} AS rev, s_nationkey "
    "  FROM lineitem JOIN part ON l_partkey = p_partkey "
    "  JOIN orders ON l_orderkey = o_orderkey "
    "  JOIN customer ON o_custkey = c_custkey "
    "  JOIN nation cn ON c_nationkey = cn.n_nationkey "
    "  JOIN region ON cn.n_regionkey = r_regionkey "
    "  JOIN supplier ON l_suppkey = s_suppkey "
    "  WHERE p_type = 'STANDARD' AND r_name = 'ASIA') "
    "SELECT o_year, CAST(count(*) AS BIGINT) AS n_items, "
    "sum(rev) AS total_revenue, "
    "sum(CASE WHEN sn.n_name = 'NATION_5' THEN rev ELSE 0.0e0 END) "
    "  / sum(rev) AS mkt_share "
    "FROM al JOIN nation sn ON al.s_nationkey = sn.n_nationkey "
    "GROUP BY o_year",
)
q_tpch_q8_shape.__doc__ = """J13b (r13): the TPC-H Q8 national-market-
    share shape — one nation's share of a part type's revenue inside
    one region's customer base, by order year: the deepest dim chain
    in the suite (part + orders + customer + nation×2 + region +
    supplier around the fact). Spark-first: every dim broadcasts, the
    fact is shuffled only for the lineitem⋈orders key join and the
    final year group; share = exact-dyadic sum ratio, one IEEE
    division — RAW hash."""


q_tpch_q10_shape = _sql_query(
    "q_tpch_q10_shape",
    f"WITH l AS (SELECT l_orderkey, {_REV64_SQL} AS rev "
    "  FROM lineitem WHERE l_returnflag = 'R') "
    "SELECT c_custkey, c_name, n_name, c_acctbal, "
    "CAST(count(*) AS BIGINT) AS n_items, sum(rev) AS revenue "
    "FROM l JOIN orders ON l_orderkey = o_orderkey "
    "JOIN customer ON o_custkey = c_custkey "
    "JOIN nation ON c_nationkey = n_nationkey "
    "WHERE o_orderdate >= TIMESTAMP '1996-01-01' "
    "  AND o_orderdate < TIMESTAMP '1996-04-01' "
    "GROUP BY c_custkey, c_name, n_name, c_acctbal",
)
q_tpch_q10_shape.__doc__ = """J13c (r13): the TPC-H Q10 returned-item
    reporting shape — revenue lost to returns per customer in a
    quarter (the churn-risk report). The canonical ORDER BY revenue
    LIMIT 20 is dropped: the driver compare is order-free and a
    ties-at-the-cut LIMIT is nondeterministic cross-engine; the full
    grouped set is the deterministic superset. Spark-first: returnflag
    filter pushes into the lineitem scan, date window into orders,
    customer/nation broadcast; one fact shuffle on the order key —
    RAW hash."""


q_tpch_q11_shape = _sql_query(
    "q_tpch_q11_shape",
    f"WITH v AS (SELECT l_partkey AS pk, {_REV64_SQL} AS val "
    "  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey "
    "  JOIN nation ON s_nationkey = n_nationkey "
    "  WHERE n_name IN ('NATION_2', 'NATION_9')) "
    "SELECT pk AS p_partkey, sum(val) AS value "
    "FROM v GROUP BY pk "
    "HAVING sum(val) > (SELECT 2.0e0 * sum(val) / count(DISTINCT pk) "
    "  FROM v)",
)
q_tpch_q11_shape.__doc__ = """J13d (r13): the TPC-H Q11 important-stock
    shape — per-part value held by two nations' suppliers, kept only
    where it exceeds a FRACTION OF THE GLOBAL TOTAL: the
    HAVING-over-uncorrelated-scalar-subquery pattern (the one scalar
    placement J12's Q22 filter doesn't cover), with the CTE consumed
    twice (group side + total side). Adaptations: no partsupp table —
    "stock value" = shipped lineitem value; the canonical FIXED
    fraction (0.0001/SF) is replaced by the scale-free "2x the
    average per-part share" (2·total/n_parts) so the row stays
    meaningful at every SF (a fixed fraction empties as the part
    count grows — measured 101 rows at sf0.01, 0 at sf0.1 before the
    change). Exactness: per-line value dyadic 1/64 so BOTH the group
    sums and the global total are order-free exact; the threshold is
    one deterministic multiply+divide of identical bits, so the >
    comparison agrees bit-for-bit cross-engine — RAW hash."""


q_tpch_q12_shape = _sql_query(
    "q_tpch_q12_shape",
    "SELECT l_returnflag, "
    "CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') "
    "  THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count, "
    "CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') "
    "  THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count "
    "FROM orders JOIN lineitem ON o_orderkey = l_orderkey "
    "WHERE l_shipdate >= TIMESTAMP '1996-01-01' "
    "  AND l_shipdate < TIMESTAMP '1997-01-01' "
    "GROUP BY l_returnflag",
)
q_tpch_q12_shape.__doc__ = """J13e (r13): the TPC-H Q12 shipping-mode
    priority shape — the priority-split contingency over a fact⋈dim
    join with the classifier CASE on the DIMENSION side and the group
    key on the FACT side. Adaptation: the driver schema has no
    l_shipmode; l_returnflag plays the mode role (same cardinality-3
    fact attribute). Counts only — exact."""


q_tpch_q15_shape = _sql_query(
    "q_tpch_q15_shape",
    "WITH revenue AS (SELECT l_suppkey AS supplier_no, "
    f"  sum({_REV64_SQL}) AS total_revenue FROM lineitem "
    "  WHERE l_shipdate >= TIMESTAMP '1996-01-01' "
    "    AND l_shipdate < TIMESTAMP '1996-07-01' "
    "  GROUP BY l_suppkey) "
    "SELECT s_suppkey, s_name, total_revenue "
    "FROM supplier JOIN revenue ON s_suppkey = supplier_no "
    "WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)",
)
q_tpch_q15_shape.__doc__ = """J13f (r13): the TPC-H Q15 top-supplier
    shape — the argmax-via-scalar-subquery pattern: a derived revenue
    view consumed twice, once as the join side and once inside
    max(), with equality selecting the winner(s). Exactness: the
    revenue sums are exact dyadics, so the double-equality against
    max() matches identically in both engines (the Q2 device applied
    to an aggregate instead of a raw column); ties all surface —
    deterministic. RAW hash."""


q_tpch_q16_shape = _sql_query(
    "q_tpch_q16_shape",
    "SELECT p_brand, p_size, "
    "CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt "
    "FROM part JOIN lineitem ON p_partkey = l_partkey "
    "WHERE p_brand <> 'Brand#45' "
    "  AND p_size IN (1, 4, 9, 14, 23, 36, 45, 49) "
    "  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier "
    "    WHERE s_name LIKE '%77%') "
    "GROUP BY p_brand, p_size",
)
q_tpch_q16_shape.__doc__ = """J13g (r13): the TPC-H Q16 parts-supplier
    relationship shape — supplier variety per part attribute with an
    excluded-supplier NOT IN subquery: the NULL-AWARE anti join, the
    one subquery rewrite class the J12 family's NOT EXISTS rows don't
    exercise (NOT IN must stay empty-safe and null-safe; Catalyst
    plans it as a null-aware anti join, degenerating to BNLJ only if
    the subquery side could carry NULLs — s_suppkey cannot).
    Adaptation: partsupp -> the observed (part, supplier) pairs in
    lineitem. Distinct-count integer — exact."""


q_tpch_q17_shape = _sql_query(
    "q_tpch_q17_shape",
    "SELECT CAST(count(*) AS BIGINT) AS n_small, "
    f"sum({_PRICE64_SQL}) / 7.0e0 AS avg_yearly "
    "FROM lineitem JOIN part ON p_partkey = l_partkey "
    "WHERE p_brand = 'Brand#23' AND p_size < 15 "
    "  AND l_quantity < (SELECT 0.2e0 * avg(l_quantity) "
    "    FROM lineitem l2 WHERE l2.l_partkey = p_partkey)",
)
q_tpch_q17_shape.__doc__ = """J13h (r13): the TPC-H Q17 small-quantity-
    order shape — revenue that would vanish if sub-20%-of-average
    orders were refused: a CORRELATED scalar avg over the SAME fact
    table being filtered (Q2's pattern with the correlation on the
    fact, so the decorrelated aggregate is fact-sized, not dim-sized).
    Adaptation: container -> p_size < 15 band. Exactness: per-part
    avg(l_quantity) = exact integer sum / exact count (one IEEE
    division, deterministic bits), 0.2 scaling one multiply; the
    summed price rides the 1/64 grid; /7.0 one final division — RAW
    hash."""


q_tpch_q20_shape = _sql_query(
    "q_tpch_q20_shape",
    "WITH ps AS (SELECT l_suppkey AS sk, l_partkey AS pk, "
    "  sum(l_quantity) AS q FROM lineitem GROUP BY 1, 2) "
    "SELECT s_suppkey, s_name, s_acctbal FROM supplier "
    "WHERE s_suppkey IN (SELECT sk FROM ps "
    "  WHERE q > (SELECT 4.0e0 * avg(q) FROM ps p2 "
    "    WHERE p2.pk = ps.pk))",
)
q_tpch_q20_shape.__doc__ = """J13i (r13): the TPC-H Q20 excess-stock
    shape — suppliers who dominate at least one part's volume (shipped
    more than 4x the part's per-supplier average): an IN subquery
    whose OWN filter is a correlated scalar aggregate — the nested
    rewrite (semi join feeding on a decorrelated aggregate join) that
    none of the single-pattern rows compose. Adaptation: partsupp
    availqty -> per-(part, supplier) shipped quantity; the 0.5x-of-
    demand threshold becomes 4x-of-average dominance (the driver's
    uniform generator makes >50%-share vacuous at any SF — measured
    24/31 qualifying suppliers at sf0.01/sf0.1). Exactness: integer
    quantity sums exact, avg one deterministic division, 4.0 an exact
    dyadic multiply — RAW hash (well, integer/count outputs plus
    verbatim s_acctbal)."""


# =============================================================================
# W14sv (r13): SCD2 validity intervals + point-in-time snapshot — the
# event-sourcing -> slowly-changing-dimension pattern (every warehouse
# rebuilds dimension history from a change log; the engine's as-of
# join (J8) answers "state at each fact row", these answer "the state
# TABLE itself" and "state at time T")
# =============================================================================

_SCD2_IV_SQL = (
    "e AS (SELECT user_id, event_type, epoch_us(ts) AS us, event_id "
    "  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL), "
    "iv AS (SELECT user_id, event_type AS state, us AS valid_from, "
    f"  lead(us) {_SS_WIN} AS valid_to FROM e)"
)


def _scd2_intervals(spark, sf_dir):
    """Shared builder: one validity-interval row per event — the
    user's 'current event_type state' holds from this event until
    their next one (half-open [valid_from, valid_to); NULL valid_to =
    the open current state). One per-user window pass — the same
    shuffle the session family rides."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull() & F.col("ts").isNotNull()
    ).select(
        "user_id",
        F.col("event_type").alias("state"),
        F.unix_micros("ts").alias("us"),
        "event_id",
    )
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    return ev.select(
        "user_id",
        "state",
        F.col("us").alias("valid_from"),
        F.lead("us").over(w).alias("valid_to"),
    )


@register(
    "q_scd2_intervals",
    f"WITH {_SCD2_IV_SQL} "
    "SELECT state, CAST(count(*) AS BIGINT) AS n_intervals, "
    "CAST(sum(CASE WHEN valid_to IS NULL THEN 1 ELSE 0 END) AS BIGINT) "
    "  AS n_open, "
    "CAST(sum(valid_to - valid_from) AS BIGINT) AS total_dwell_us, "
    "CAST(min(valid_from) AS BIGINT) AS first_from, "
    "CAST(max(valid_from) AS BIGINT) AS last_from "
    "FROM iv GROUP BY state",
)
def q_scd2_intervals(spark, sf_dir):
    """W14sv (r13): SCD2 interval construction from the event log —
    per user, each event opens a validity interval for its type that
    closes at the user's next event (half-open, NULL = still open):
    the event-sourcing -> type-2 dimension rebuild. Summarized per
    state (interval count, open count, total dwell time) so the
    oracle row is states-sized while the interval table itself is the
    reusable product. Spark-first: ONE per-user window pass (lead),
    the same shuffle the session family rides; at 100 TB the change
    log shuffles once on the natural key and the interval table
    bucket-writes on it (SC7). All-integer microsecond arithmetic —
    exact."""
    iv = _scd2_intervals(spark, sf_dir)
    return iv.groupBy("state").agg(
        F.count(F.lit(1)).cast("long").alias("n_intervals"),
        F.sum(F.col("valid_to").isNull().cast("int")).cast("long").alias(
            "n_open"
        ),
        F.sum(F.col("valid_to") - F.col("valid_from")).cast("long").alias(
            "total_dwell_us"
        ),
        F.min("valid_from").cast("long").alias("first_from"),
        F.max("valid_from").cast("long").alias("last_from"),
    )


@register(
    "q_scd2_snapshot",
    f"WITH {_SCD2_IV_SQL}, "
    "t AS (SELECT CAST(floor((min(us) + max(us)) / 2.0e0) AS BIGINT) "
    "  AS t0 FROM e) "
    "SELECT state, CAST(count(*) AS BIGINT) AS n_users, "
    "CAST(min(valid_from) AS BIGINT) AS oldest_from, "
    "CAST(max(valid_from) AS BIGINT) AS newest_from "
    "FROM iv, t WHERE valid_from <= t0 "
    "  AND (valid_to IS NULL OR valid_to > t0) "
    "GROUP BY state",
)
def q_scd2_snapshot(spark, sf_dir):
    """W14sw (r13): point-in-time snapshot over the SCD2 intervals —
    every user's state AS OF the stream midpoint (the time-travel
    read every type-2 dimension exists to serve; the midpoint is a
    data-derived scalar so the row needs no fixture timestamp).
    Spark-first: the instant is a 1-row scalar broadcast onto the
    interval table (the allowed scalar-BNLJ class), the containment
    filter then reduces to a states-sized aggregate. Exactness: the
    midpoint is integer microsecond arithmetic under 2^53 with an
    explicit floor (DuckDB rounds DOUBLE->BIGINT casts, Spark
    truncates — floor pins both), interval bounds compare as int64 —
    exact."""
    iv = _scd2_intervals(spark, sf_dir)
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull() & F.col("ts").isNotNull()
    ).select(F.unix_micros("ts").alias("us"))
    t = ev.agg(
        F.floor(
            (F.min("us") + F.max("us")) / F.lit(2.0)
        ).cast("long").alias("t0")
    )
    j = iv.crossJoin(F.broadcast(t)).filter(
        (F.col("valid_from") <= F.col("t0"))
        & (F.col("valid_to").isNull() | (F.col("valid_to") > F.col("t0")))
    )
    return j.groupBy("state").agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.min("valid_from").cast("long").alias("oldest_from"),
        F.max("valid_from").cast("long").alias("newest_from"),
    )


# --- O9 (r13): distribution window functions ---------------------------------
q_window_distribution = _sql_query(
    "q_window_distribution",
    "WITH r AS (SELECT c_mktsegment AS seg, c_acctbal, "
    "  ntile(4) OVER w AS quartile, "
    "  percent_rank() OVER w AS pr, "
    "  cume_dist() OVER w AS cd, "
    "  first_value(c_custkey) OVER (PARTITION BY c_mktsegment "
    "    ORDER BY c_acctbal, c_custkey ROWS BETWEEN UNBOUNDED "
    "    PRECEDING AND UNBOUNDED FOLLOWING) AS poorest_custkey "
    "  FROM customer "
    "  WINDOW w AS (PARTITION BY c_mktsegment "
    "    ORDER BY c_acctbal, c_custkey)) "
    "SELECT seg, CAST(quartile AS INT) AS quartile, "
    "CAST(count(*) AS BIGINT) AS n, "
    "min(c_acctbal) AS lo, max(c_acctbal) AS hi, "
    "max(pr) AS max_pr, max(cd) AS max_cd, "
    "CAST(max(poorest_custkey) AS BIGINT) AS poorest_custkey "
    "FROM r GROUP BY seg, quartile",
)
q_window_distribution.__doc__ = """O9 (r13): the distribution window
    functions — ntile / percent_rank / cume_dist / first_value — the
    last classic window class with zero declared coverage (the engine
    uses rank/row_number/lag/lead/sum-over everywhere; an analytics
    user reaches for quartile banding and percentile position weekly).
    Account-balance quartiles per market segment, rolled to a bounded
    (segment × quartile) summary. Determinism: the window orders by
    (c_acctbal, c_custkey) — a TOTAL order — because ntile splits ties
    by row position, so a partial order would be engine-dependent;
    percent_rank/cume_dist are exact IEEE divisions of int64 rank/count
    quantities on identical orderings; first_value pinned with an
    explicit full frame (the default RANGE frame would see only the
    running prefix). RAW hash (verbatim balances + exact rationals)."""


# --- A16 (r13): explicit GROUPING SETS with grouping() discriminators --------
q_agg_grouping_sets = _sql_query(
    "q_agg_grouping_sets",
    "SELECT COALESCE(o_orderpriority, '(all)') AS pri, "
    "COALESCE(o_orderstatus, '(all)') AS status, "
    "CAST(grouping(o_orderpriority) AS INT) AS g_pri, "
    "CAST(grouping(o_orderstatus) AS INT) AS g_status, "
    "CAST(count(*) AS BIGINT) AS n, "
    f"{_rqx('sum(o_totalprice)', 2)} AS sum_totalprice "
    "FROM orders GROUP BY GROUPING SETS ((o_orderpriority), "
    "(o_orderstatus), (o_orderpriority, o_orderstatus), ())",
)
q_agg_grouping_sets.__doc__ = """A16 (r13): explicit GROUPING SETS —
    the four-set lattice (priority), (status), (priority × status),
    (grand total) in ONE pass with grouping() discriminators, the
    general form of which A11's rollup/cube rows are the two fixed
    lattices. Spark executes this as a single Expand + hash aggregate
    (each input row fans to its 4 set-images map-side — no 4-scan
    union); grouping() disambiguates a real NULL key from a rolled-up
    one, COALESCE labels the rolled levels (driver columns are
    non-null so the label is unambiguous). Counts exact, money sum
    rq'd — RAW hash."""


# --- J14 (r13): correlated LATERAL subquery (top-1 per key) -----------------
q_lateral_top1 = _sql_query(
    "q_lateral_top1",
    "SELECT c_custkey, c_mktsegment, t.o_orderkey AS top_orderkey, "
    "t.o_totalprice AS top_totalprice "
    "FROM customer JOIN LATERAL ("
    "  SELECT o_orderkey, o_totalprice FROM orders "
    "  WHERE o_custkey = c_custkey "
    "  ORDER BY o_totalprice DESC, o_orderkey LIMIT 1) t ON true",
)
q_lateral_top1.__doc__ = """J14 (r13): correlated LATERAL subquery with
    ORDER BY + LIMIT — each customer's single largest order, the
    per-row-subtable idiom SQL users write instead of the window-rank
    form (O7's per-group top-k). Catalyst decorrelates the lateral
    LIMIT into a rank-over-partition rewrite (DecorrelateInnerQuery +
    RewriteLateralSubquery) — one key-partitioned join + window, never
    a per-customer re-execution. Determinism: the inner ORDER BY is a
    TOTAL order (totalprice DESC, orderkey) so the LIMIT 1 winner is
    unique cross-engine; outputs are verbatim columns — RAW hash."""


# --- O10 (r13): unpivot / melt (wide -> long reshape) ------------------------
@register(
    "q_unpivot_metrics",
    "WITH m AS ("
    "  SELECT 'quantity' AS metric, l_quantity AS value FROM lineitem "
    "  UNION ALL SELECT 'extendedprice', l_extendedprice FROM lineitem "
    "  UNION ALL SELECT 'discount', l_discount FROM lineitem "
    "  UNION ALL SELECT 'tax', l_tax FROM lineitem) "
    "SELECT metric, CAST(count(*) AS BIGINT) AS n, "
    f"{rq_sql('sum(value)', 2)} AS sum_value, "
    "min(value) AS min_value, max(value) AS max_value "
    "FROM m GROUP BY metric",
)
def q_unpivot_metrics(spark, sf_dir):
    """O10 (r13): unpivot / melt — the wide->long reshape (pandas
    ``melt``, SQL UNPIVOT) every feature pipeline and metrics store
    does before a per-metric aggregate, the inverse of O6's pivot.
    Spark-first: ``stack(4, ...)`` is the UNPIVOT kernel — a single
    Generate over ONE scan of the fact (each row fans to 4
    metric-tagged rows map-side), where the naive form (the oracle's
    4-way UNION ALL, spelled that way because DuckDB's UNPIVOT syntax
    differs) scans the table four times; the per-metric aggregate then
    map-side-combines before one metrics-sized shuffle. min/max exact
    selections, sums rq'd — RAW hash."""
    li = load_table(spark, sf_dir, "lineitem")
    m = li.select(
        F.expr(
            "stack(4, 'quantity', l_quantity, "
            "'extendedprice', l_extendedprice, "
            "'discount', l_discount, 'tax', l_tax) AS (metric, value)"
        )
    )
    return m.groupBy("metric").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        rq(F.sum("value"), 2).alias("sum_value"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
    )


# =========================================================================
# A17/A18 (r13) — market-basket: pair co-occurrence + association rules
# =========================================================================
_BASKETS_SQL = (
    "b AS (SELECT DISTINCT l.l_orderkey AS basket, p.p_brand AS item "
    "  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey)"
)


@register(
    "q_basket_pairs",
    "WITH " + _BASKETS_SQL + ", "
    "nb AS (SELECT CAST(count(DISTINCT basket) AS BIGINT) AS n_baskets "
    "  FROM b) "
    "SELECT x.item AS item_a, y.item AS item_b, "
    "CAST(count(*) AS BIGINT) AS n_ab, nb.n_baskets, "
    "CAST(count(*) AS DOUBLE) / nb.n_baskets AS support "
    "FROM b x JOIN b y ON x.basket = y.basket AND x.item < y.item, nb "
    "GROUP BY 1, 2, nb.n_baskets",
)
def q_basket_pairs(spark, sf_dir):
    """A17 (r13): brand co-occurrence counts over order baskets — the
    2-itemset support table (Agrawal et al. SIGMOD'93) at ONE fact
    shuffle: per-order sorted distinct-brand arrays, ordered pairs
    exploded row-locally from array slices (bounded s*(s-1)/2 fanout
    per basket), then a brand-pair-sized hash aggregate. The oracle
    spells the naive self-join form; the Spark plan never joins the
    fact table to itself. support is one int64/int64 IEEE division —
    RAW hash. operators/market.py:basket_pair_counts."""
    from mhw3d_detection_spark.operators.market import (
        baskets_from_lineitem,
        basket_pair_counts,
    )

    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    b = baskets_from_lineitem(li, part)
    nb = b.select("basket").distinct().agg(
        F.count("*").alias("n_baskets")
    )
    return (
        basket_pair_counts(b)
        .crossJoin(F.broadcast(nb))
        .select(
            "item_a",
            "item_b",
            "n_ab",
            "n_baskets",
            (F.col("n_ab").cast("double") / F.col("n_baskets")).alias(
                "support"
            ),
        )
    )


@register(
    "q_assoc_rules",
    "WITH " + _BASKETS_SQL + ", "
    "ic AS (SELECT item, CAST(count(*) AS BIGINT) AS n_i FROM b "
    "  GROUP BY 1), "
    "nb AS (SELECT CAST(count(DISTINCT basket) AS BIGINT) AS n_baskets "
    "  FROM b), "
    "pc AS (SELECT x.item AS item_a, y.item AS item_b, "
    "  CAST(count(*) AS BIGINT) AS n_ab "
    "  FROM b x JOIN b y ON x.basket = y.basket AND x.item < y.item "
    "  GROUP BY 1, 2 HAVING count(*) >= 20), "
    "r AS (SELECT item_a AS antecedent, item_b AS consequent, n_ab "
    "  FROM pc "
    "  UNION ALL SELECT item_b, item_a, n_ab FROM pc) "
    "SELECT r.antecedent, r.consequent, r.n_ab, "
    "a.n_i AS n_ant, c.n_i AS n_cons, nb.n_baskets, "
    "CAST(r.n_ab AS DOUBLE) / nb.n_baskets AS support, "
    "CAST(r.n_ab AS DOUBLE) / a.n_i AS confidence, "
    "CAST(r.n_ab * nb.n_baskets AS DOUBLE) "
    "  / CAST(a.n_i * c.n_i AS DOUBLE) AS lift "
    "FROM r JOIN ic a ON r.antecedent = a.item "
    "JOIN ic c ON r.consequent = c.item, nb",
)
def q_assoc_rules(spark, sf_dir):
    """A18 (r13): directed 2-itemset association rules (antecedent ->
    consequent) over order brand-baskets with exact support /
    confidence / lift. The integer support floor (n_ab >= 20, an exact
    int64 comparison — never a float threshold) is the lever that
    keeps the rule table item-domain-sized at corpus scale; marginals
    and the basket count attach by broadcast (item domain is small by
    construction). lift = one division of two in-range int64 products
    — all three ratios bit-exact cross-engine, RAW hash.
    operators/market.py:association_rules."""
    from mhw3d_detection_spark.operators.market import (
        association_rules,
        baskets_from_lineitem,
    )

    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    return association_rules(
        baskets_from_lineitem(li, part), min_count=20
    )


# =========================================================================
# J15a/J15b (r13) — record linkage: blocked edit-distance comparison
# =========================================================================
_LINK_PAIRS_SQL = (
    "p AS (SELECT a.c_nationkey, a.c_mktsegment, "
    "  a.c_custkey AS id_a, b.c_custkey AS id_b, "
    "  levenshtein(a.c_name, b.c_name) AS dist "
    "  FROM customer a JOIN customer b "
    "  ON a.c_nationkey = b.c_nationkey "
    "  AND a.c_mktsegment = b.c_mktsegment "
    "  AND a.c_custkey < b.c_custkey)"
)


@register(
    "q_linkage_blocks",
    "WITH " + _LINK_PAIRS_SQL + ", "
    "pp AS (SELECT c_nationkey, c_mktsegment, "
    "  CAST(count(*) AS BIGINT) AS n_pairs, "
    "  CAST(sum(CASE WHEN dist = 0 THEN 1 ELSE 0 END) AS BIGINT) "
    "    AS n_exact, "
    "  CAST(sum(CASE WHEN dist > 0 AND dist <= 1 THEN 1 ELSE 0 END) "
    "    AS BIGINT) AS n_match, "
    "  CAST(sum(CASE WHEN dist > 1 AND dist <= 3 THEN 1 ELSE 0 END) "
    "    AS BIGINT) AS n_possible, "
    "  CAST(sum(CASE WHEN dist > 3 THEN 1 ELSE 0 END) AS BIGINT) "
    "    AS n_nonmatch, "
    "  CAST(min(dist) AS INT) AS min_dist "
    "  FROM p GROUP BY 1, 2), "
    "r AS (SELECT c_nationkey, c_mktsegment, "
    "  CAST(count(*) AS BIGINT) AS n_records FROM customer GROUP BY 1, 2) "
    "SELECT r.c_nationkey, r.c_mktsegment, r.n_records, "
    "coalesce(pp.n_pairs, 0) AS n_pairs, "
    "coalesce(pp.n_exact, 0) AS n_exact, "
    "coalesce(pp.n_match, 0) AS n_match, "
    "coalesce(pp.n_possible, 0) AS n_possible, "
    "coalesce(pp.n_nonmatch, 0) AS n_nonmatch, "
    "pp.min_dist "
    "FROM r LEFT JOIN pp USING (c_nationkey, c_mktsegment)",
)
def q_linkage_blocks(spark, sf_dir):
    """J15a (r13): record-linkage census per blocking key — customers
    blocked on (nation, market segment), every within-block pair
    scored by exact JVM levenshtein on the name, tallied into
    Fellegi-Sunter classes (exact / match <=1 / possible <=3 /
    non-match). The block key IS the cost model (sum of s_b^2/2, never
    cross-block); both self-join sides share one child so the block
    shuffle plans once, and at 100 TB a bucketed layout on the block
    key removes it. All-integer output — RAW hash.
    operators/linkage.py:linkage_block_summary."""
    from mhw3d_detection_spark.operators.linkage import (
        linkage_block_summary,
    )

    cust = load_table(spark, sf_dir, "customer")
    return linkage_block_summary(
        cust,
        id_col="c_custkey",
        name_col="c_name",
        block_cols=["c_nationkey", "c_mktsegment"],
    )


@register(
    "q_linkage_top_pairs",
    "WITH " + _LINK_PAIRS_SQL + " "
    "SELECT c_nationkey, c_mktsegment, id_a, id_b, "
    "CAST(dist AS INT) AS dist, CAST(rk AS INT) AS rk FROM ("
    "  SELECT *, row_number() OVER (PARTITION BY c_nationkey, "
    "  c_mktsegment ORDER BY dist, id_a, id_b) AS rk FROM p) "
    "WHERE rk <= 2",
)
def q_linkage_top_pairs(spark, sf_dir):
    """J15b (r13): the review-queue surface — the 2 closest candidate
    pairs per block under the TOTAL order (dist, id_a, id_b), so the
    winner set is unique cross-engine. One window pass over the
    block-partitioned pair stream; the raw pair stream itself is an
    intermediate, never a result surface.
    operators/linkage.py:linkage_top_pairs."""
    from mhw3d_detection_spark.operators.linkage import linkage_top_pairs

    cust = load_table(spark, sf_dir, "customer")
    return linkage_top_pairs(
        cust,
        id_col="c_custkey",
        name_col="c_name",
        block_cols=["c_nationkey", "c_mktsegment"],
        per_block=2,
    )


# =========================================================================
# SP8 (r13) — attribution interval join (batch twin of the
# stream-stream join; the streaming side is pinned in
# tests/test_streaming.py::test_stream_stream_attribution_join)
# =========================================================================
@register(
    "q_attribution_join",
    "SELECT p.user_id AS user, epoch_us(p.ts) AS purchase_us, "
    "epoch_us(c.ts) AS click_us, "
    "epoch_us(p.ts) - epoch_us(c.ts) AS lag_us "
    "FROM events p JOIN events c ON p.user_id = c.user_id "
    "AND p.event_type = 'purchase' AND c.event_type = 'click' "
    "AND c.ts <= p.ts AND c.ts >= p.ts - INTERVAL 6 HOUR",
)
def q_attribution_join(spark, sf_dir):
    """SP8 (r13): click->purchase attribution — every purchase matched
    to the same user's clicks in the preceding 6 hours. The BATCH twin
    of `streaming_attribution_join` (the family's first stream-stream
    join): identical plan semantics on static frames, so this oracle
    row prices exactly what the streaming parity test replays
    incrementally with two watermarked sides and bounded join state.
    Emits epoch micros (the J8 as-of convention) — all-integer
    output, RAW hash. streaming/sessionize.py:streaming_attribution_join."""
    from mhw3d_detection_spark.streaming import streaming_attribution_join

    ev = load_table(spark, sf_dir, "events")
    out = streaming_attribution_join(
        ev.filter(F.col("event_type") == "purchase"),
        ev.filter(F.col("event_type") == "click"),
    )
    pu = F.unix_micros("purchase_ts")
    cu = F.unix_micros("click_ts")
    return out.select(
        "user",
        pu.alias("purchase_us"),
        cu.alias("click_us"),
        (pu - cu).alias("lag_us"),
    )


# =========================================================================
# A19 (r13) — revenue concentration: exact Gini + Lorenz shares
# =========================================================================
#: money -> integer cents on the writer grid: *100 is one exact IEEE
#: op, the nudge is the shared rq(2) convention — DERIVED from
#: base._rq_eps so the three users cannot desynchronize
_CENTS_NUDGE = 0.5 + _rq_eps(2)
_CENTS = f"floor(o_totalprice * 100.0 + {_CENTS_NUDGE!r})"


@register(
    "q_revenue_concentration",
    "WITH rev AS (SELECT o_custkey, "
    f"  CAST(sum(CAST({_CENTS} AS BIGINT)) AS BIGINT) AS cents "
    "  FROM orders GROUP BY 1), "
    "j AS (SELECT c.c_mktsegment, r.o_custkey, r.cents FROM rev r "
    "  JOIN customer c ON r.o_custkey = c.c_custkey), "
    "rk AS (SELECT c_mktsegment, o_custkey, cents, "
    "  row_number() OVER (PARTITION BY c_mktsegment "
    "    ORDER BY cents, o_custkey) AS i, "
    "  count(*) OVER (PARTITION BY c_mktsegment) AS ng FROM j), "
    "agg AS (SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n, "
    "  CAST(sum(cents) AS BIGINT) AS total_cents, "
    # s_rank stays HUGEINT (internal only): in the overflow regime the
    # guard must emit the NULL-stat row, matching Spark's try_sum path,
    # instead of a CAST error killing the whole differential
    "  sum(CAST(i AS HUGEINT) * cents) AS s_rank, "
    "  CAST(sum(CASE WHEN i > ng - (ng + 9) // 10 THEN cents ELSE 0 "
    "    END) AS BIGINT) AS top_cents, "
    "  CAST(sum(CASE WHEN i <= ng // 2 THEN cents ELSE 0 END) "
    "    AS BIGINT) AS bottom_cents, "
    "  CAST(max(cents) AS BIGINT) AS mx FROM rk GROUP BY 1) "
    "SELECT c_mktsegment, n, total_cents, "
    "CASE WHEN n > 0 AND total_cents > 0 AND "
    "  CAST(mx AS DOUBLE) * n * (n + 1.0) / 2.0 < 4.611686018427388e18 "
    "  THEN CAST(2 * s_rank - (n + 1) * CAST(total_cents AS HUGEINT) "
    "    AS DOUBLE) "
    "    / CAST(CAST(n AS HUGEINT) * total_cents AS DOUBLE) "
    "  END AS gini, "
    "CASE WHEN n > 0 AND total_cents > 0 AND "
    "  CAST(mx AS DOUBLE) * n * (n + 1.0) / 2.0 < 4.611686018427388e18 "
    "  THEN CAST(top_cents AS DOUBLE) / CAST(total_cents AS DOUBLE) "
    "  END AS top10_share, "
    "CASE WHEN n > 0 AND total_cents > 0 AND "
    "  CAST(mx AS DOUBLE) * n * (n + 1.0) / 2.0 < 4.611686018427388e18 "
    "  THEN CAST(bottom_cents AS DOUBLE) / CAST(total_cents AS DOUBLE) "
    "  END AS bottom50_share "
    "FROM agg",
)
def q_revenue_concentration(spark, sf_dir):
    """A19 (r13): per-segment revenue concentration — exact Gini via
    the rank formula G = (2S - (n+1)T)/(nT) over the TOTAL order
    (cents, custkey), Lorenz top-decile and bottom-half shares in pure
    integer arithmetic. Money lands on integer cents BEFORE any sum
    (one exact IEEE *100 per row), so every aggregate is int64-exact
    and order-free; the O(n^2) mean-absolute-difference Gini never
    materializes (one window pass + one hash aggregate). Ratios are
    single int64/int64 IEEE divisions, guard bound replicated in
    doubles on both engines — RAW hash.
    operators/analysis.py:gini_concentration."""
    from mhw3d_detection_spark.operators.analysis import (
        gini_concentration,
    )

    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    cents = F.floor(
        F.col("o_totalprice") * F.lit(100.0) + F.lit(_CENTS_NUDGE)
    ).cast("long")
    rev = (
        o.select("o_custkey", cents.alias("cents"))
        .groupBy("o_custkey")
        .agg(F.sum("cents").alias("cents"))
    )
    seg = rev.join(
        c.select("c_custkey", "c_mktsegment"),
        rev.o_custkey == F.col("c_custkey"),
    ).select("c_mktsegment", "o_custkey", "cents")
    return gini_concentration(
        seg, "c_mktsegment", "o_custkey", "cents"
    )


# =========================================================================
# W28 (r13) — Lindley capped running balance (recursion-free)
# =========================================================================
@register(
    "q_lindley_backlog",
    "WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS us, "
    "  CASE event_type WHEN 'click' THEN 1 ELSE -1 END AS delta "
    "  FROM events WHERE event_type IN ('click', 'purchase')), "
    "p AS (SELECT user_id, event_id, us, "
    "  sum(delta) OVER (PARTITION BY user_id ORDER BY us, event_id "
    "    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prefix "
    "  FROM e), "
    "m AS (SELECT user_id, event_id, us, prefix, "
    "  min(prefix) OVER (PARTITION BY user_id ORDER BY us, event_id "
    "    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS runmin, "
    "  row_number() OVER (PARTITION BY user_id ORDER BY us, event_id) "
    "    AS i FROM p), "
    "b AS (SELECT user_id, i, "
    "  prefix - least(runmin, 0) AS backlog FROM m) "
    "SELECT user_id, CAST(count(*) AS BIGINT) AS n_events, "
    "CAST(arg_max(backlog, i) AS BIGINT) AS final_backlog, "
    "CAST(max(backlog) AS BIGINT) AS max_backlog "
    "FROM b GROUP BY 1",
)
def q_lindley_backlog(spark, sf_dir):
    """W28 (r13): per-user queue depth under clicks-enqueue /
    purchases-dequeue, floored at zero — the Lindley recursion
    s_t = max(0, s_{t-1} + x_t), which looks inherently sequential but
    collapses to the closed form s_t = prefix_t − min(0, running-min
    prefix): two stock window aggregates over the TOTAL order
    (epoch_us, event_id), one shuffle on the key, codegen throughout —
    no recursion, no applyInPandas. All-integer output — RAW hash.
    operators/analysis.py:lindley_backlog."""
    from mhw3d_detection_spark.operators.analysis import lindley_backlog

    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "purchase")
    )
    e = ev.select(
        "user_id",
        "event_id",
        F.unix_micros("ts").alias("us"),
        F.when(F.col("event_type") == "click", F.lit(1))
        .otherwise(F.lit(-1))
        .alias("delta"),
    )
    return lindley_backlog(
        e, "user_id", ["us", "event_id"], "delta"
    )


# =========================================================================
# W29 (r13) — interval union: total covered time per key
# =========================================================================
@register(
    "q_interval_union",
    "WITH iv AS (SELECT user_id, epoch_us(ts) AS s, "
    "  epoch_us(ts) + 1800000000 AS e FROM events), "
    "pe AS (SELECT user_id, s, e, "
    "  max(e) OVER (PARTITION BY user_id ORDER BY s, e "
    "    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_end "
    "  FROM iv), "
    "br AS (SELECT user_id, s, e, CASE WHEN prev_end IS NULL "
    "  OR s > prev_end THEN 1 ELSE 0 END AS brk FROM pe), "
    "isl AS (SELECT user_id, s, e, "
    "  sum(brk) OVER (PARTITION BY user_id ORDER BY s, e "
    "    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island "
    "  FROM br), "
    "g AS (SELECT user_id, island, min(s) AS i_s, max(e) AS i_e, "
    "  count(*) AS c FROM isl GROUP BY 1, 2) "
    "SELECT user_id, CAST(sum(c) AS BIGINT) AS n_intervals, "
    "CAST(count(*) AS BIGINT) AS n_islands, "
    "CAST(sum(i_e - i_s) AS BIGINT) AS covered, "
    "CAST(max(i_e - i_s) AS BIGINT) AS max_island "
    "FROM g GROUP BY 1",
)
def q_interval_union(spark, sf_dir):
    """W29 (r13): total ACTIVE time per user when every event opens a
    30-minute half-open activity window — the interval-UNION
    gaps-and-islands: an interval starts a new island iff its start
    exceeds the running max end of every earlier one (touching
    intervals merge), island id = prefix sum of breaks. Two window
    passes + two aggregates, one shuffle on the key; the O(n²)
    per-key overlap self-join never materializes. Tie order within
    (s, e) is symmetric (identical rows), so the island aggregates are
    deterministic cross-engine. All-integer micros — RAW hash.
    operators/analysis.py:interval_union."""
    from mhw3d_detection_spark.operators.analysis import interval_union

    ev = load_table(spark, sf_dir, "events")
    iv = ev.select(
        "user_id",
        F.unix_micros("ts").alias("s"),
        (F.unix_micros("ts") + F.lit(1800000000)).alias("e"),
    )
    return interval_union(iv, "user_id", "s", "e")


# =========================================================================
# A17b (r13) — basket analysis is schema-agnostic: event-type
# co-occurrence per user-day (the "which behaviors co-occur" readout)
# =========================================================================
@register(
    "q_session_baskets",
    "WITH b AS (SELECT DISTINCT user_id * 100000 "
    "  + epoch_us(ts) // 86400000000 AS basket, "
    "  event_type AS item FROM events), "
    "nb AS (SELECT CAST(count(DISTINCT basket) AS BIGINT) AS n_baskets "
    "  FROM b) "
    "SELECT x.item AS item_a, y.item AS item_b, "
    "CAST(count(*) AS BIGINT) AS n_ab, nb.n_baskets, "
    "CAST(count(*) AS DOUBLE) / nb.n_baskets AS support "
    "FROM b x JOIN b y ON x.basket = y.basket AND x.item < y.item, nb "
    "GROUP BY 1, 2, nb.n_baskets",
)
def q_session_baskets(spark, sf_dir):
    """A17b (r13): the A17 basket operator applied unchanged to a
    SECOND surface — baskets are user-days, items are event types
    ("which behaviors co-occur in a day"), demonstrating the
    operator's contract: a basket is ANY grouping key, an item ANY
    categorical attribute. Same one-shuffle row-local pair plan, same
    exact-int64 + single-division arithmetic — RAW hash.
    operators/market.py:basket_pair_counts."""
    from mhw3d_detection_spark.operators.market import basket_pair_counts

    ev = load_table(spark, sf_dir, "events")
    b = ev.select(
        (
            F.col("user_id") * F.lit(100000)
            + F.expr("div(unix_micros(ts), 86400000000)")
        ).alias("basket"),
        F.col("event_type").alias("item"),
    )
    nb = b.select("basket").distinct().agg(
        F.count("*").alias("n_baskets")
    )
    return (
        basket_pair_counts(b)
        .crossJoin(F.broadcast(nb))
        .select(
            "item_a",
            "item_b",
            "n_ab",
            "n_baskets",
            (F.col("n_ab").cast("double") / F.col("n_baskets")).alias(
                "support"
            ),
        )
    )


# =========================================================================
# A18b (r13) — rule significance: 2x2 chi-squared on the rule table
# =========================================================================
@register(
    "q_assoc_rules_chi2",
    "WITH " + _BASKETS_SQL + ", "
    "ic AS (SELECT item, CAST(count(*) AS BIGINT) AS n_i FROM b "
    "  GROUP BY 1), "
    "nb AS (SELECT CAST(count(DISTINCT basket) AS BIGINT) AS n_baskets "
    "  FROM b), "
    "pc AS (SELECT x.item AS item_a, y.item AS item_b, "
    "  CAST(count(*) AS BIGINT) AS n_ab "
    "  FROM b x JOIN b y ON x.basket = y.basket AND x.item < y.item "
    "  GROUP BY 1, 2 HAVING count(*) >= 20), "
    "r AS (SELECT item_a AS antecedent, item_b AS consequent, n_ab "
    "  FROM pc "
    "  UNION ALL SELECT item_b, item_a, n_ab FROM pc), "
    "j AS (SELECT r.antecedent, r.consequent, r.n_ab, "
    "  a.n_i AS n_ant, c.n_i AS n_cons, nb.n_baskets "
    "  FROM r JOIN ic a ON r.antecedent = a.item "
    "  JOIN ic c ON r.consequent = c.item, nb), "
    "d AS (SELECT *, CAST(n_baskets AS DOUBLE) AS nn, "
    "  CAST(n_ant AS DOUBLE) AS aa, CAST(n_cons AS DOUBLE) AS bb, "
    "  CAST(n_ab AS DOUBLE) AS ab FROM j) "
    "SELECT antecedent, consequent, n_ab, n_ant, n_cons, n_baskets, "
    "CASE WHEN aa * bb * (nn - aa) * (nn - bb) > 0.0e0 THEN "
    "  nn * (ab * (nn - aa - bb + ab) - (aa - ab) * (bb - ab)) "
    "  * (ab * (nn - aa - bb + ab) - (aa - ab) * (bb - ab)) "
    "  / (aa * bb * (nn - aa) * (nn - bb)) END AS chi2 "
    "FROM d",
)
def q_assoc_rules_chi2(spark, sf_dir):
    """A18b (r13): the significance screen over A18's rules — the 2x2
    chi-squared statistic from the closed-form contingency the rule
    table already carries (no corpus re-scan; a lift of 3 on n_ab = 2
    means nothing, chi2 prices it). All counts cast to DOUBLE before
    any product (the int64 denominator wraps past ~55k baskets); the
    identical expression tree in both engines makes every IEEE op
    bit-identical — RAW hash without quantization.
    operators/market.py:rules_with_chi2."""
    from mhw3d_detection_spark.operators.market import (
        association_rules,
        baskets_from_lineitem,
        rules_with_chi2,
    )

    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    rules = association_rules(
        baskets_from_lineitem(li, part), min_count=20
    )
    return rules_with_chi2(rules).select(
        "antecedent",
        "consequent",
        "n_ab",
        "n_ant",
        "n_cons",
        "n_baskets",
        "chi2",
    )


# =========================================================================
# A20 (r13) — event study: activity before vs after an error
# =========================================================================
@register(
    "q_event_study",
    "WITH t AS (SELECT user_id AS k, epoch_us(ts) AS t_us, "
    "  event_id AS t_id FROM events WHERE event_type = 'error'), "
    "a AS (SELECT user_id AS ak, epoch_us(ts) AS a_us FROM events "
    "  WHERE event_type = 'click'), "
    "j AS (SELECT t.t_id, t.t_us, a.a_us FROM t LEFT JOIN a "
    "  ON t.k = a.ak AND a.a_us >= t.t_us - 21600000000 "
    "  AND a.a_us <= t.t_us + 21600000000), "
    "per AS (SELECT t_id, "
    "  CAST(sum(CASE WHEN a_us < t_us THEN 1 ELSE 0 END) AS BIGINT) "
    "    AS nb, "
    "  CAST(sum(CASE WHEN a_us > t_us THEN 1 ELSE 0 END) AS BIGINT) "
    "    AS na FROM j GROUP BY 1), "
    "g AS (SELECT CAST(count(*) AS BIGINT) AS n_t, "
    "  CAST(sum(nb) AS BIGINT) AS tot_b, "
    "  CAST(sum(na) AS BIGINT) AS tot_a, "
    "  CAST(sum(na - nb) AS BIGINT) AS s1, "
    "  CAST(sum((na - nb) * (na - nb)) AS BIGINT) AS s2 FROM per) "
    "SELECT n_t AS n_treatments, tot_b AS total_before, "
    "tot_a AS total_after, "
    "CAST(tot_b AS DOUBLE) / CAST(n_t AS DOUBLE) AS mean_before, "
    "CAST(tot_a AS DOUBLE) / CAST(n_t AS DOUBLE) AS mean_after, "
    "CAST(s1 AS DOUBLE) / CAST(n_t AS DOUBLE) AS mean_diff, "
    "CASE WHEN n_t > 1 AND "
    "  (CAST(s2 AS DOUBLE) - CAST(s1 * s1 AS DOUBLE) "
    "    / CAST(n_t AS DOUBLE)) / (CAST(n_t AS DOUBLE) - 1.0e0) "
    "  > 0.0e0 THEN "
    "  (CAST(s1 AS DOUBLE) / CAST(n_t AS DOUBLE)) / sqrt("
    "  ((CAST(s2 AS DOUBLE) - CAST(s1 * s1 AS DOUBLE) "
    "    / CAST(n_t AS DOUBLE)) / (CAST(n_t AS DOUBLE) - 1.0e0)) "
    "  / CAST(n_t AS DOUBLE)) END AS z "
    "FROM g",
)
def q_event_study(spark, sf_dir):
    """A20 (r13): event-study readout — did users click differently in
    the 6 hours after an error than the 6 hours before? One equi+range
    join keyed on user (treatments LEFT join activity so
    zero-activity errors count as (0,0) — the silent majority a naive
    inner join drops), per-treatment before/after counts, and the
    paired-difference z (per-user base rates cancel in the pairing).
    Half-open windows exclude the treatment instant on both sides —
    consistent cross-engine. Integer sums + one mirrored IEEE
    expression tree for z — RAW hash.
    operators/analysis.py:event_study."""
    from mhw3d_detection_spark.operators.analysis import event_study

    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "event_type",
        F.unix_micros("ts").alias("us"),
    )
    return event_study(
        ev,
        treatment_pred=F.col("event_type") == "error",
        activity_pred=F.col("event_type") == "click",
        key_col="user_id",
        time_col="us",
        id_col="event_id",
        window_us=21_600_000_000,
    )


# =========================================================================
# A21 (r13) — difference-in-differences: error-heavy vs normal users
# =========================================================================
@register(
    "q_diff_in_diff",
    "WITH sp AS (SELECT (min(epoch_us(ts)) + max(epoch_us(ts))) // 2 "
    "  AS mid FROM events), "
    "per AS (SELECT user_id, "
    "  CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) >= 14 "
    "    AS INT) AS treated, "
    "  CAST(sum(CASE WHEN event_type = 'click' "
    "    AND epoch_us(ts) < sp.mid THEN 1 ELSE 0 END) AS BIGINT) AS nb, "
    "  CAST(sum(CASE WHEN event_type = 'click' "
    "    AND epoch_us(ts) > sp.mid THEN 1 ELSE 0 END) AS BIGINT) AS na "
    "  FROM events, sp GROUP BY user_id), "
    "d AS (SELECT treated, na - nb AS d FROM per), "
    "g AS (SELECT CAST(sum(treated) AS BIGINT) AS n_t, "
    "  CAST(sum(1 - treated) AS BIGINT) AS n_c, "
    "  CAST(sum(treated * d) AS BIGINT) AS s1_t, "
    "  CAST(sum(treated * d * d) AS BIGINT) AS s2_t, "
    "  CAST(sum((1 - treated) * d) AS BIGINT) AS s1_c, "
    "  CAST(sum((1 - treated) * d * d) AS BIGINT) AS s2_c FROM d) "
    "SELECT n_t AS n_treated, n_c AS n_control, "
    "CASE WHEN n_t > 0 THEN CAST(s1_t AS DOUBLE) / CAST(n_t AS DOUBLE) "
    "  END AS mean_diff_treated, "
    "CASE WHEN n_c > 0 THEN CAST(s1_c AS DOUBLE) / CAST(n_c AS DOUBLE) "
    "  END AS mean_diff_control, "
    "CASE WHEN n_t > 0 AND n_c > 0 THEN "
    "  CAST(s1_t AS DOUBLE) / CAST(n_t AS DOUBLE) "
    "  - CAST(s1_c AS DOUBLE) / CAST(n_c AS DOUBLE) END AS did, "
    "CASE WHEN n_t > 1 AND n_c > 1 AND "
    "  (CAST(s2_t AS DOUBLE) - CAST(s1_t * s1_t AS DOUBLE) "
    "    / CAST(n_t AS DOUBLE)) / (CAST(n_t AS DOUBLE) - 1.0e0) "
    "    / CAST(n_t AS DOUBLE) "
    "  + (CAST(s2_c AS DOUBLE) - CAST(s1_c * s1_c AS DOUBLE) "
    "    / CAST(n_c AS DOUBLE)) / (CAST(n_c AS DOUBLE) - 1.0e0) "
    "    / CAST(n_c AS DOUBLE) > 0.0e0 THEN "
    "  (CAST(s1_t AS DOUBLE) / CAST(n_t AS DOUBLE) "
    "  - CAST(s1_c AS DOUBLE) / CAST(n_c AS DOUBLE)) / sqrt("
    "  (CAST(s2_t AS DOUBLE) - CAST(s1_t * s1_t AS DOUBLE) "
    "    / CAST(n_t AS DOUBLE)) / (CAST(n_t AS DOUBLE) - 1.0e0) "
    "    / CAST(n_t AS DOUBLE) "
    "  + (CAST(s2_c AS DOUBLE) - CAST(s1_c * s1_c AS DOUBLE) "
    "    / CAST(n_c AS DOUBLE)) / (CAST(n_c AS DOUBLE) - 1.0e0) "
    "    / CAST(n_c AS DOUBLE)) END AS z "
    "FROM g",
)
def q_diff_in_diff(spark, sf_dir):
    """A21 (r13): difference-in-differences — did error-heavy users
    (>= 14 errors over the stream; an "ever erred" predicate is vacuous
    on this dense stream) change their clicking across the stream
    midpoint DIFFERENTLY from normal users? The control group nets out
    secular drift the single-group event study (A20) cannot. One
    scalar midpoint broadcast, one per-user aggregate (the key's
    single shuffle), one global conditional-sum aggregate — the groups
    never join. Midpoint instant excluded from both halves
    (symmetric); integer sums + one mirrored IEEE tree for the
    two-sample z — RAW hash. operators/analysis.py:diff_in_diff."""
    from mhw3d_detection_spark.operators.analysis import diff_in_diff

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", F.unix_micros("ts").alias("us")
    )
    return diff_in_diff(
        ev,
        treatment_agg=F.sum(
            (F.col("event_type") == "error").cast("int")
        )
        >= F.lit(14),
        activity_pred=F.col("event_type") == "click",
    )

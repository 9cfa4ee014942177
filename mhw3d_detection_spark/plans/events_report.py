"""The composed event-log health report: ONE log scan reduced to the
(user, day, type) activity cube feeds daily-active-users, event-type
mix, the view->purchase funnel, and pooled weekly retention — as one
long-form result. The clickstream analogue of ``plans.corpus_report``:
the standalone rows (q_user_sessions' aggregates, q_event_funnel,
q_cohort_retention, q_dau_hll) each re-scan the raw log; a daily
product-health job fires all four readouts and wants the log touched
ONCE.

Economics: the cube is bounded by |users| x |days| x |types| (a user's
thousandth click of the day adds nothing to it), typically 100-1000x
smaller than the log; it is localCheckpointed and every section is
then cube-sized work. Sequence-dependent statistics (sessionization,
transitions) intentionally stay OUT — they need event ordering the
cube discards, and that is exactly why they cost a per-user window on
the full log while everything here does not.

Exactness: all counts integer; shares/rates are exactly-rounded
integer rationals — RAW hash.

Output schema: ``(section, key, n, m, x)``
- ``dau``:       key = epoch day; n = distinct users, m = events
- ``mix``:       key = event type; n = events, x = share
- ``funnel``:    key 'view_purchase'; n = viewers, m = converters,
  x = conversion
- ``retention``: key = week offset 0..3; n = eligible users (cohort
  week + offset inside the observed range), m = still-active users,
  x = retention rate
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _qcol(name: str) -> Column:
    """Resolve a caller-supplied column NAME literally: F.col parses
    dots as struct access, so quote with backticks (doubling embedded
    ones, the Spark identifier escape)."""
    return F.col("`" + name.replace("`", "``") + "`")


def events_report(
    ev: DataFrame,
    *,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    max_offset_weeks: int = 3,
) -> DataFrame:
    """Build the composed event-log report from one materialized
    (user, day, type) activity cube. EAGER (localCheckpoints the
    cube)."""
    # Column path throughout — never interpolate a caller-supplied
    # column name into an expr f-string (backtick-needing names break;
    # same rule the flesch/sentence gates follow, r10w2 closure).
    base = ev.filter(_qcol(user_col).isNotNull()).select(
        _qcol(user_col).alias("user_id"),
        _qcol(type_col).alias("event_type"),
        _qcol(ts_col).alias("__ts"),
    ).select(
        "user_id",
        "event_type",
        F.expr("unix_micros(__ts) div 86400000000").alias("day"),
    )
    from mhw3d_detection_spark.plans.audit_hook import ckpt

    cube = ckpt(
        base.groupBy("user_id", "day", "event_type").agg(
            F.count(F.lit(1)).cast("long").alias("n")
        ),
        "cube",
    )

    null_l = F.lit(None).cast("long")
    null_d = F.lit(None).cast("double")

    dau = cube.groupBy("day").agg(
        F.countDistinct("user_id").cast("long").alias("n"),
        F.sum("n").cast("long").alias("m"),
    ).select(
        F.lit("dau").alias("section"),
        F.col("day").cast("string").alias("key"),
        "n",
        "m",
        null_d.alias("x"),
    )

    mixt = cube.groupBy("event_type").agg(
        F.sum("n").cast("long").alias("ne")
    )
    tote = mixt.agg(F.sum("ne").cast("long").alias("t"))
    mix = mixt.crossJoin(F.broadcast(tote)).select(
        F.lit("mix").alias("section"),
        F.col("event_type").alias("key"),
        F.col("ne").alias("n"),
        null_l.alias("m"),
        (F.col("ne").cast("double") / F.col("t")).alias("x"),
    )

    uf = cube.groupBy("user_id").agg(
        F.max((F.col("event_type") == "view").cast("int")).alias("viewed"),
        F.max(
            (F.col("event_type") == "purchase").cast("int")
        ).alias("purchased"),
    )
    conv = (
        (F.col("viewed") == 1) & (F.col("purchased") == 1)
    ).cast("int")
    # coalesce to 0: a health report on an EMPTY log must show ZERO
    # viewers, not unknown (sum over no rows is NULL) — the monitor
    # counts-visible contract (r11 adversarial review)
    fun = uf.agg(
        F.coalesce(F.sum("viewed"), F.lit(0)).cast("long").alias("n"),
        F.coalesce(F.sum(conv), F.lit(0)).cast("long").alias("m"),
    ).select(
        F.lit("funnel").alias("section"),
        F.lit("view_purchase").alias("key"),
        "n",
        "m",
        F.when(
            F.col("n") > 0, F.col("m").cast("double") / F.col("n")
        ).alias("x"),
    )

    uw = cube.select(
        "user_id", F.expr("div(day, 7)").alias("week")
    ).distinct()
    fw = uw.groupBy("user_id").agg(F.min("week").alias("w0"))
    mw = uw.agg(F.max("week").alias("wmax"))
    off = ev.sparkSession.range(0, max_offset_weeks + 1).select(
        F.col("id").alias("k")
    )
    el = (
        fw.crossJoin(F.broadcast(off))
        .crossJoin(F.broadcast(mw))
        .filter(F.col("w0") + F.col("k") <= F.col("wmax"))
        .select("user_id", "k", (F.col("w0") + F.col("k")).alias("wk"))
    )
    act = el.join(
        uw,
        (el.user_id == uw.user_id) & (el.wk == uw.week),
        "left_semi",
    ).groupBy("k").agg(F.count(F.lit(1)).cast("long").alias("m"))
    eln = el.groupBy("k").agg(F.count(F.lit(1)).cast("long").alias("n"))
    ret = eln.join(F.broadcast(act), "k", "left").select(
        F.lit("retention").alias("section"),
        F.col("k").cast("string").alias("key"),
        "n",
        F.coalesce("m", F.lit(0)).cast("long").alias("m"),
        F.when(
            F.col("n") > 0,
            F.coalesce("m", F.lit(0)).cast("double") / F.col("n"),
        ).alias("x"),
    )

    return dau.unionAll(mix).unionAll(fun).unionAll(ret)

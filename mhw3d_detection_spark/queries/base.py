"""Registry plumbing + the canonical derived series shared by queries
and their DuckDB oracles.

Both engines read the same parquet; every derived series below exists
twice — once as a Spark builder, once as a SQL CTE string — and the two
must stay semantically identical (that IS the differential test).

Numeric-robustness conventions (both sides):
- every floating aggregate output is round(x, 4..6): aggregation order
  differs between engines, so raw doubles can differ at ~1e-13
- integer sums in DuckDB are cast to BIGINT (DuckDB widens to HUGEINT)
- year()/doy-style ints are cast to INT in SQL (DuckDB returns BIGINT)
- all output aliases are lowercase snake_case (DuckDB lowercases
  unquoted identifiers)
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from mhw3d_detection_spark.sources.tables import load_table


def _rq_eps(d: int) -> float:
    # Dyadic (exactly representable) nudge: bigger than engine-order
    # float noise at that magnitude, smaller than the data's decimal
    # grid, and never expressible as a short decimal so it cannot
    # re-align with fixed-decimal inputs.
    if d >= 4:
        return 2.0**-16
    if d >= 1:
        return 2.0**-13
    return 2.0**-10


def rq(col: Column | str, d: int = 4) -> Column:
    """Deterministic quantization for oracle comparison:
    ``floor(x*10^d + 0.5 + eps) / 10^d`` — pure IEEE double arithmetic,
    so identical input bits give identical output bits in every engine.

    Why not ``round``: Spark rounds via a decimal string rendering
    (HALF_UP on the shortest repr), DuckDB via float multiply; they
    disagree on exact .5 boundaries — which fixed-decimal generator
    data (money, 4-decimal measurements) hits constantly. The dyadic
    ``eps`` (2^-10..2^-16 by scale) absorbs the exactly-at-boundary
    family: it exceeds cross-engine aggregation-order noise but stays
    below the data's decimal grid, so both engines land on the same
    side. Choose ``d`` by magnitude: 4 for O(1..100) values, 2 for
    O(1e4..1e6), 0 for O(1e8+) sums.
    """
    c = F.col(col) if isinstance(col, str) else col
    s = F.lit(float(10**d))
    return F.floor(c * s + F.lit(0.5 + _rq_eps(d))) / s


def rq_py(x: float | None, d: int = 4) -> float | None:
    """Python twin of :func:`rq` for the streaming state functions —
    same IEEE ops, same bits (the ``dyadic_quantize_py`` convention).
    ``None``/NaN in, ``None`` out."""
    import math

    if x is None:
        return None
    x = float(x)
    if math.isnan(x):
        return None
    s = float(10**d)
    return math.floor(x * s + (0.5 + _rq_eps(d))) / s


def rq_sql(expr: str, d: int = 4) -> str:
    """DuckDB mirror of :func:`rq` (same IEEE ops, same bits)."""
    return (
        f"floor(({expr}) * {float(10 ** d)!r} + {0.5 + _rq_eps(d)!r}) "
        f"/ {float(10 ** d)!r}"
    )


def dlit(v: float) -> str:
    """A double literal DuckDB parses via strtod (bit-exact vs Spark's
    ``F.lit``): bare decimal literals infer DECIMAL, and the
    DECIMAL->DOUBLE conversion can be 1 ulp off at 17 significant
    digits (measured, r10); an exponent suffix forces the DOUBLE parse
    path. Non-finite values emit the quoted-cast form (a bare ``inf``
    token binds as a COLUMN reference in DuckDB — code-review r11 #2).
    Use for EVERY float literal interpolated into an oracle."""
    import math

    v = float(v)
    if math.isnan(v):
        return "'nan'::DOUBLE"
    if math.isinf(v):
        return "'-infinity'::DOUBLE" if v < 0 else "'infinity'::DOUBLE"
    r = repr(v)
    return r if ("e" in r or "E" in r) else r + "e0"


@dataclass(frozen=True)
class QueryDef:
    spark_fn: Callable[[SparkSession, str], DataFrame]
    sql: str | None  # DuckDB oracle; None -> rows-only check


REGISTRY: dict[str, QueryDef] = {}


def register(name: str, sql: str | None = None):
    def deco(fn):
        REGISTRY[name] = QueryDef(spark_fn=fn, sql=sql)
        return fn

    return deco


def plan_memo(fn):
    """Memoize a ``(spark, sf_dir) -> DataFrame`` builder per session.

    DataFrames are immutable logical plans, so shared sub-plans (the
    canonical derived series every query starts from) can be built once
    per session instead of paying the Py4J/analysis round trips again
    for each of the ~60 queries that reuse them. Pure plan reuse — no
    data is cached; execution still recomputes unless .persist() is
    explicitly used downstream.
    """
    cache: dict[tuple[int, str], DataFrame] = {}

    def wrapper(spark: SparkSession, sf_dir: str) -> DataFrame:
        key = (id(spark), sf_dir)
        got = cache.get(key)
        if got is None:
            got = cache[key] = fn(spark, sf_dir)
        return got

    wrapper.__name__ = fn.__name__
    wrapper.__doc__ = fn.__doc__
    return wrapper


# ---------------------------------------------------------------------------
# Canonical derived series (Spark builders + matching SQL CTE bodies)
# ---------------------------------------------------------------------------

#: events stream -> daily long-format series ts(cell_id, time, temp).
#: user_id plays the grid-cell role (reference data model §1.1: one row
#: per (cell, day) sample).
DAILY_SQL = (
    "SELECT user_id AS cell_id, CAST(ts AS DATE) AS time, avg(value) AS temp "
    "FROM events GROUP BY 1, 2"
)


@plan_memo
def daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(
        F.col("user_id").alias("cell_id"), F.to_date("ts").alias("time")
    ).agg(F.avg("value").alias("temp"))


#: same series with measured-but-missing days: a day whose samples are
#: all 'error' events has temp NULL (the §1.2 NaN-vs-NULL distinction).
DAILY_NULLS_SQL = (
    "SELECT user_id AS cell_id, CAST(ts AS DATE) AS time, "
    "avg(CASE WHEN event_type <> 'error' THEN value END) AS temp "
    "FROM events GROUP BY 1, 2"
)


@plan_memo
def daily_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(
        F.col("user_id").alias("cell_id"), F.to_date("ts").alias("time")
    ).agg(
        F.avg(F.when(F.col("event_type") != "error", F.col("value"))).alias("temp")
    )


#: orders -> multi-year daily series (1995..2001, spans leap years) for
#: every calendar-sensitive operator (DOY, Feb 29, circular smoothing).
ORDERS_DAILY_SQL = (
    "SELECT o_custkey % 10 AS cell_id, CAST(o_orderdate AS DATE) AS time, "
    "avg(o_totalprice) AS temp FROM orders GROUP BY 1, 2"
)


@plan_memo
def orders_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy(
        (F.col("o_custkey") % 10).alias("cell_id"),
        F.to_date("o_orderdate").alias("time"),
    ).agg(F.avg("o_totalprice").alias("temp"))


#: leap-normalized DOY as DuckDB SQL (mirror of functions.calendar.clim_doy)
def DOY_SQL(t: str) -> str:
    return (
        f"CAST(dayofyear({t}) + CASE WHEN NOT "
        f"((year({t}) % 4 = 0) AND ((year({t}) % 100 <> 0) OR (year({t}) % 400 = 0))) "
        f"AND dayofyear({t}) >= 60 THEN 1 ELSE 0 END AS INT)"
    )


#: simple per-cell threshold/seas dims for the detection-chain queries
#: (the pooled climatology has its own dedicated queries; the detection
#: operators are exercised against this compact threshold)
THR_SQL = (
    "SELECT cell_id, quantile_cont(temp, 0.75) AS thresh, avg(temp) AS seas "
    "FROM daily GROUP BY 1"
)


def thr(daily_df: DataFrame) -> DataFrame:
    return daily_df.groupBy("cell_id").agg(
        F.expr("percentile(temp, 0.75)").alias("thresh"),
        F.avg("temp").alias("seas"),
    )

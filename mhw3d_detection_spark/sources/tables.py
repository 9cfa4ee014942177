"""Table loaders for the driver's synthetic parquet tables.

At engine level every scan is ``spark.read.parquet(...)`` (reference
equivalent: ``xr.open_dataset`` / ``open_mfdataset`` lazy scans,
reference README.md:51). Predicate pushdown / column pruning is left
to Catalyst — callers `.select()`/`.filter()` and the parquet scan
prunes (verified via `.explain` in tests).

The `events` table stores int64 TIMESTAMP(NANOS); Spark reads it as
LongType under `spark.sql.legacy.parquet.nanosAsLong` and we derive a
microsecond TimestampType column (truncation, consistent with how the
engine's oracles truncate).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mhw3d_detection_spark.session import configure

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


# Per-session scan memo: spark.read.parquet redoes file listing +
# footer/schema reads (driver-side JVM work) on every call; the scan
# DataFrame is immutable, so queries in one session can share it.
_SCAN_CACHE: dict[tuple[int, str, str], DataFrame] = {}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one synthetic table; normalizes the `events` ns-timestamp."""
    key = (id(spark), os.path.abspath(sf_dir), name)
    cached = _SCAN_CACHE.get(key)
    if cached is not None:
        return cached
    configure(spark)
    path = os.path.join(sf_dir, f"{name}.parquet")
    df = spark.read.parquet(path)
    ts_dtype = dict(df.dtypes).get("ts") if name == "events" else None
    if ts_dtype == "bigint":
        # int64 nanoseconds -> microsecond timestamp (truncating), keep
        # the raw nanos for exact integer comparisons in oracles.
        # integer DIV, not float division: ns epochs exceed 2^53 and a
        # double round-trip loses the low microsecond bit
        df = df.withColumn("ts_ns", F.col("ts")).withColumn(
            "ts", F.timestamp_micros(F.expr("ts_ns DIV 1000"))
        )
    elif ts_dtype == "timestamp_ntz":
        # TIMESTAMP(MICROS, isAdjustedToUTC=false) reads as NTZ; cast
        # to the session-UTC instant type so micro-exact functions
        # (unix_micros etc.) resolve. Same wall-clock DuckDB sees when
        # it reads the naive column.
        df = df.withColumn("ts", F.col("ts").cast("timestamp")).withColumn(
            "ts_ns", F.unix_micros("ts") * F.lit(1000)
        )
    _SCAN_CACHE[key] = df
    return df


def register_views(spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES) -> None:
    for name in names:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def events_timeseries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The `events` stream table re-shaped as the engine's canonical
    long-format time series: ts(cell_id, time, temp).

    user_id plays the grid-cell role, ts the time axis, value the
    temperature variable (reference data model: temp(time, lat, lon) ->
    one row per (cell, time) sample).
    """
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        F.col("user_id").alias("cell_id"),
        F.col("ts").alias("time"),
        F.col("value").alias("temp"),
    )

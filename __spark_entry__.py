"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship MHW pipeline on sf0.001;
``queries()`` / ``oracle_sql()`` expose every implemented operator from
SURVEY.md §2 as (Spark builder, DuckDB oracle SQL) pairs, populated by
importing ``mhw3d_detection_spark.queries`` (registry side effect).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from mhw3d_detection_spark import queries as _q

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: the fused MHW pipeline (pooled climatology ->
    severity -> sessionization -> event metrics) on the sf0.001 tables."""
    return _q.REGISTRY["q_mhw_pipeline"].spark_fn(spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _q.queries()


def oracle_sql() -> dict[str, str]:
    return _q.oracle_sql()

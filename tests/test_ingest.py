"""Ingestion bridges (SC1/SC4/SC5): dense-cube melt round-trip and the
bucketed-write co-location contract."""

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from mhw3d_detection_spark.sources.ingest import (
    dense_to_long,
    write_bucketed,
)


def test_dense_to_long_roundtrip(spark):
    rng = np.random.default_rng(7)
    times = pd.date_range("2000-01-01", periods=10, freq="D")
    lats = np.array([-42.0, -41.0])
    lons = np.array([152.0, 153.0, 154.0])
    cube = rng.normal(15.0, 2.0, size=(10, 2, 3))
    cube[3, 1, 2] = np.nan  # measured-but-missing

    long = dense_to_long(
        spark, cube, times, {"lat": lats, "lon": lons}, block_cells=2
    )
    pdf = long.toPandas()
    assert len(pdf) == 10 * 2 * 3
    assert set(pdf.columns) == {"cell_id", "time", "temp", "lat", "lon"}
    # spot-check a value and the coord layout (row-major cell ids)
    got = pdf[(pdf.cell_id == 5) & (pdf.time == times[3])]
    assert len(got) == 1
    v = got.temp.iloc[0]
    assert v != v  # the NaN landed at cell (1,2) = id 5
    assert got.lat.iloc[0] == -41.0 and got.lon.iloc[0] == 154.0
    ok = pdf[(pdf.cell_id == 4) & (pdf.time == times[9])]
    assert np.isclose(ok.temp.iloc[0], cube[9, 1, 1])


def test_bucketed_join_has_no_exchange(spark):
    df = spark.range(1000).select(
        (F.col("id") % 50).alias("cell_id"), F.col("id").alias("v")
    )
    write_bucketed(df, "t_a", key="cell_id", buckets=8, sort_by=None)
    write_bucketed(df, "t_b", key="cell_id", buckets=8, sort_by=None)
    a = spark.table("t_a").groupBy("cell_id").agg(F.sum("v").alias("sa"))
    b = spark.table("t_b").groupBy("cell_id").agg(F.sum("v").alias("sb"))
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = a.join(b, "cell_id")
        plan = j._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS t_a")
        spark.sql("DROP TABLE IF EXISTS t_b")
    assert "Exchange hashpartitioning" not in plan, plan

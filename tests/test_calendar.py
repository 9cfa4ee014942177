import pandas as pd
from pyspark.sql import functions as F

from mhw3d_detection_spark.functions.calendar import clim_doy, clim_doy_sql


def test_leap_normalized_doy(spark):
    cases = {
        "2012-02-29": 60,  # leap: Feb 29 exists
        "2012-03-01": 61,
        "2012-12-31": 366,
        "2013-03-01": 61,  # non-leap: natural doy 60 -> 61
        "2013-02-28": 59,
        "2013-12-31": 366,  # natural 365 -> 366
        "2013-01-15": 15,  # below 60: unshifted
        "2000-03-01": 61,  # 400-rule leap
        "1900-03-01": 61,  # 100-rule non-leap -> shifted
    }
    pdf = pd.DataFrame({"t": pd.to_datetime(list(cases))})
    df = spark.createDataFrame(pdf).withColumn("doy", clim_doy(F.col("t")))
    got = {str(r["t"].date()): r["doy"] for r in df.collect()}
    assert got == cases


def test_sql_snippet_matches_column(spark):
    pdf = pd.DataFrame({"t": pd.date_range("1999-01-01", "2004-12-31", freq="D")})
    df = spark.createDataFrame(pdf)
    df.createOrReplaceTempView("cal_t")
    a = df.withColumn("doy", clim_doy(F.col("t"))).select("t", "doy")
    b = spark.sql(f"select t, {clim_doy_sql('t')} as doy from cal_t")
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0

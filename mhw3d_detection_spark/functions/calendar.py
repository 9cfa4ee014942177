"""The leap-normalized day-of-year (DOY) calendar.

The single most load-bearing data-model quirk of the reference
(reference: src/mhw3d/common/core.py:5-17 `_clim_doy`;
tests/data/legacy/marineHeatWaves.py:194-207 table-lookup version):
day-of-year is normalized to a reference *leap* year, so

- Mar 1 is always DOY 61 and Dec 31 always DOY 366,
- in non-leap years every natural DOY >= 60 shifts +1,
- DOY 60 (Feb 29) exists only in leap years.

This is pure integer arithmetic on year/dayofyear, expressed here as a
Spark Column so it stays inside whole-stage codegen (no UDF).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def is_leap_year(year: Column) -> Column:
    """Proleptic-Gregorian leap-year predicate (reference: common/core.py:10-12)."""
    return (year % 4 == 0) & ((year % 100 != 0) | (year % 400 == 0))


def clim_doy(time_col: Column | str) -> Column:
    """Leap-normalized day-of-year of a date/timestamp column, in 1..366.

    Equivalent ANSI SQL (used verbatim by the DuckDB oracles)::

        dayofyear(t) + CASE WHEN NOT is_leap(year(t)) AND dayofyear(t) >= 60
                            THEN 1 ELSE 0 END
    """
    t = F.col(time_col) if isinstance(time_col, str) else time_col
    doy = F.dayofyear(t)
    return (
        doy
        + F.when(~is_leap_year(F.year(t)) & (doy >= 60), F.lit(1)).otherwise(F.lit(0))
    ).alias("doy")


# The same expression as a SQL snippet factory, so Spark SQL strings and
# DuckDB oracle strings share one definition (both engines accept it).
def clim_doy_sql(ts_expr: str) -> str:
    return (
        f"(dayofyear({ts_expr}) + CASE WHEN NOT "
        f"((year({ts_expr}) % 4 = 0) AND ((year({ts_expr}) % 100 <> 0) OR (year({ts_expr}) % 400 = 0))) "
        f"AND dayofyear({ts_expr}) >= 60 THEN 1 ELSE 0 END)"
    )

"""Run-length edge cases the reference lists as its own missing suite
(reference CLAUDE.md:138,181-184): events at series start/end, gap
exactly maxGap, gap of maxGap+1, all-below cells, chain-transitive
gap merging."""

import pandas as pd
from pyspark.sql import functions as F

from mhw3d_detection_spark.operators.detection import detect_events


def _ts(spark, flags, start="2000-01-01", cell=0):
    times = pd.date_range(start, periods=len(flags), freq="D")
    pdf = pd.DataFrame({"cell_id": cell, "time": times, "exceed": [bool(f) for f in flags]})
    return spark.createDataFrame(pdf)


def _detect(spark, flags, **kw):
    return (
        detect_events(_ts(spark, flags), **kw)
        .orderBy("event_id")
        .select("date_start", "date_end", "duration")
        .collect()
    )


def test_event_at_series_start_and_end(spark):
    flags = [1] * 6 + [0] * 10 + [1] * 7
    evs = _detect(spark, flags)
    assert len(evs) == 2
    assert evs[0]["duration"] == 6
    assert evs[1]["duration"] == 7


def test_min_duration_boundary(spark):
    # 4-day run dropped, 5-day run kept (minDuration=5)
    flags = [1] * 4 + [0] * 10 + [1] * 5
    evs = _detect(spark, flags)
    assert len(evs) == 1 and evs[0]["duration"] == 5


def test_gap_exactly_max_gap_merges(spark):
    # 5 on, 2 off (gap == maxGap == 2), 5 on -> one 12-day event
    flags = [1] * 5 + [0] * 2 + [1] * 5
    evs = _detect(spark, flags)
    assert len(evs) == 1 and evs[0]["duration"] == 12


def test_gap_above_max_gap_stays_split(spark):
    flags = [1] * 5 + [0] * 3 + [1] * 5
    evs = _detect(spark, flags)
    assert len(evs) == 2


def test_chain_transitive_merge(spark):
    # A-B-C each separated by short gaps: all three merge (the
    # reference's iterative loop semantics, marineHeatWaves.py:330-345)
    flags = [1] * 5 + [0] * 2 + [1] * 5 + [0] * 1 + [1] * 6
    evs = _detect(spark, flags)
    assert len(evs) == 1 and evs[0]["duration"] == 19


def test_short_runs_dropped_before_gap_join(spark):
    # a 3-day run between two long runs does NOT bridge them: Oliver
    # filters duration < minDuration *before* joining across gaps, and
    # the 4/3-day gaps around the short run exceed maxGap anyway; with
    # gaps of 2 on each side of a dropped 3-day run, the effective gap
    # is 2+3+2=7 > maxGap -> stays split.
    flags = [1] * 5 + [0] * 2 + [1] * 3 + [0] * 2 + [1] * 5
    evs = _detect(spark, flags)
    assert len(evs) == 2


def test_no_events_when_never_exceeding(spark):
    assert _detect(spark, [0] * 30) == []


def test_join_across_gaps_off(spark):
    flags = [1] * 5 + [0] * 1 + [1] * 5
    evs = _detect(spark, flags, join_across_gaps=False)
    assert len(evs) == 2


def test_null_flags_break_events(spark):
    times = pd.date_range("2000-01-01", periods=12, freq="D")
    flags = [True] * 5 + [None, None] + [True] * 5
    pdf = pd.DataFrame({"cell_id": 0, "time": times, "exceed": flags})
    df = spark.createDataFrame(pdf).withColumn(
        "exceed", F.col("exceed").cast("boolean")
    )
    evs = detect_events(df).collect()
    # NULL -> false, a 2-day non-exceed gap -> merged by maxGap=2
    assert len(evs) == 1 and evs[0]["duration"] == 12

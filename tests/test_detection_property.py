"""Property-based differential test of the detection chain
(W3 RLE -> W4 min-duration -> W5 gap-join) against a brute-force
NumPy sessionizer that mirrors Oliver's *iterative* merge loop
(marineHeatWaves.py:330-345) — randomized proof of the chain-transitive
single-pass equivalence claimed in SURVEY.md §2.6 W5.

The reference has no property-based suite (SURVEY §5); this closes its
own documented TODO (CLAUDE.md:181-184) the randomized way.
"""

import datetime as dt

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from mhw3d_detection_spark.operators.detection import detect_events

DAY0 = dt.date(2020, 1, 1)


def oracle_events(flags: list[bool], min_duration: int, max_gap: int):
    """Brute force: RLE -> min filter -> Oliver's iterative first-gap
    merge, repeated until fixpoint (the semantics the single cumulative
    pass must reproduce)."""
    runs = []
    i = 0
    n = len(flags)
    while i < n:
        if flags[i]:
            j = i
            while j + 1 < n and flags[j + 1]:
                j += 1
            if j - i + 1 >= min_duration:
                runs.append([i, j])
            i = j + 1
        else:
            i += 1
    merged = [list(r) for r in runs]
    changed = True
    while changed:  # iterative: merge the FIRST short gap, restart
        changed = False
        for k in range(len(merged) - 1):
            gap = merged[k + 1][0] - merged[k][1] - 1
            if gap <= max_gap:
                merged[k][1] = merged[k + 1][1]
                del merged[k + 1]
                changed = True
                break
    return [(s, e) for s, e in merged]


@settings(max_examples=25, deadline=None)
@given(
    flags=st.lists(st.booleans(), min_size=1, max_size=80),
    min_duration=st.integers(1, 6),
    max_gap=st.integers(0, 4),
)
def test_detect_events_matches_iterative_oracle(
    spark, flags, min_duration, max_gap
):
    rows = [
        (1, DAY0 + dt.timedelta(days=i), bool(f)) for i, f in enumerate(flags)
    ]
    df = spark.createDataFrame(rows, "cell_id int, time date, exceed boolean")
    got = sorted(
        (r.date_start, r.date_end)
        for r in detect_events(
            df, min_duration=min_duration, max_gap=max_gap
        ).collect()
    )
    want = sorted(
        (DAY0 + dt.timedelta(days=s), DAY0 + dt.timedelta(days=e))
        for s, e in oracle_events(flags, min_duration, max_gap)
    )
    assert got == want


@settings(max_examples=10, deadline=None)
@given(
    data=st.lists(
        st.floats(min_value=-5, max_value=5, allow_nan=False), min_size=20, max_size=60
    ),
)
def test_rle_runs_cover_exactly_true_positions(spark, data):
    flags = [v > 0.5 for v in data]
    rows = [
        (1, DAY0 + dt.timedelta(days=i), bool(f)) for i, f in enumerate(flags)
    ]
    df = spark.createDataFrame(rows, "cell_id int, time date, exceed boolean")
    from mhw3d_detection_spark.operators.detection import rle_runs

    runs = rle_runs(df).collect()
    covered = set()
    for r in runs:
        d0 = (r.run_start - DAY0).days
        d1 = (r.run_end - DAY0).days
        assert r.run_days == d1 - d0 + 1
        for d in range(d0, d1 + 1):
            assert flags[d]  # runs contain only True days
            covered.add(d)
    assert covered == {i for i, f in enumerate(flags) if f}

"""Synthetic fixtures F1-F4 from FIXTURES.md (the reference's test
inputs re-expressed long-format; recipes: tests/test_reproducibility.py:16-44,
tests/test_threshold.py:27-44, tests/test_best_practice.py:13-25)."""

from __future__ import annotations

from datetime import date

import numpy as np
import pandas as pd


def oliver_synthetic() -> pd.DataFrame:
    """F1 — seed-42 series with three injected heatwaves (golden fixture)."""
    t0 = date(1982, 1, 1).toordinal()
    t1 = date(2013, 12, 31).toordinal()
    ords = np.arange(t0, t1 + 1)
    temp = 15.0 * np.ones(len(ords))
    temp += 5.0 * np.cos(2 * np.pi * (ords - 150) / 365.25)
    temp += 0.2 * (ords - ords[0]) / (ords[-1] - ords[0])
    np.random.seed(42)
    temp += 0.5 * np.random.randn(len(ords))
    temp[1000:1050] += 4.0
    temp[4000:4100] += 3.0
    temp[8000:8050] += 5.0
    times = pd.to_datetime([date.fromordinal(int(o)) for o in ords])
    return pd.DataFrame({"cell_id": 0, "time": times, "temp": temp})


def leap_only_series() -> pd.DataFrame:
    """F2 — all days of leap years 1984..2012 only (2928 rows)."""
    days = []
    for y in range(1984, 2013, 4):
        days.append(pd.date_range(f"{y}-01-01", f"{y}-12-31", freq="D"))
    times = pd.DatetimeIndex(np.concatenate([d.values for d in days]))
    ords = np.array([t.toordinal() for t in times.date])
    temp = 15.0 + 5.0 * np.cos(2 * np.pi * (ords - ords[0] - 150) / 365.25)
    np.random.seed(42)
    temp += 0.5 * np.random.randn(len(ords))
    return pd.DataFrame({"cell_id": 0, "time": times, "temp": temp})


def trend_series(slope: float = 0.02) -> pd.DataFrame:
    """F3 — known-linear-trend series (detrend fixture)."""
    times = pd.date_range("1982-01-01", "2013-01-01", freq="D", inclusive="left")
    t = np.arange(len(times), dtype=float)
    temp = 15.0 + 5.0 * np.cos(2 * np.pi * t / 365.25) + slope * t
    np.random.seed(42)
    temp += 0.3 * np.random.randn(len(times))
    return pd.DataFrame({"cell_id": 0, "time": times, "temp": temp})

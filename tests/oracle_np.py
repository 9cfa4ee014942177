"""Independent single-cell NumPy oracle for the pooled climatology /
threshold convention (semantics per tests/data/legacy/marineHeatWaves.py:
index-position pooling :266-281, Feb-29 interp :282-284, 3-fold periodic
running mean :858-885). Written fresh for differential testing — the
engine must agree at 1e-10 on the leap-only fixture (reference contract:
tests/test_threshold.py:84,91)."""

from __future__ import annotations

import numpy as np


def clim_doy_np(times) -> np.ndarray:
    """Leap-normalized DOY (Mar 1 always 61, Dec 31 always 366)."""
    years = times.year.values
    doy = times.dayofyear.values
    leap = (years % 4 == 0) & ((years % 100 != 0) | (years % 400 == 0))
    return doy + ((~leap) & (doy >= 60)).astype(int)


def runavg_circular(x: np.ndarray, w: int) -> np.ndarray:
    """Centered width-w running mean with 3-fold periodic wrap."""
    n = len(x)
    tiled = np.concatenate([x, x, x])
    kern = np.ones(w) / w
    sm = np.convolve(tiled, kern, mode="same")
    return sm[n : 2 * n]


def grid_clim_threshold_np(
    times,
    temp: np.ndarray,
    *,
    pctile: float = 90.0,
    window_half_width: int = 5,
    smooth_width: int | None = 31,
    baseline: tuple[int, int] | None = None,
):
    """(year, doy)-GRID pooling oracle, written to the reference's own
    pivot/cross-year-pad design (legacy/climatology.py:24-58,61-119):
    baseline samples pivot to a (year, 366) grid; each row gets left/
    right pads copied from the ADJACENT GRID ROW's last/first W columns
    (NaN where no adjacent row exists); bucket t pools columns t-W..t+W
    of every padded row. Independent of the engine's explode+wrap
    formulation — a conceptual error there cannot hide here."""
    W = window_half_width
    doy = clim_doy_np(times)
    years = times.year.values
    in_base = (
        (years >= baseline[0]) & (years <= baseline[1])
        if baseline is not None
        else np.ones(len(temp), dtype=bool)
    )
    ys = np.unique(years[in_base])
    yidx = {y: i for i, y in enumerate(ys)}
    grid = np.full((len(ys), 366), np.nan)
    for t, d, y, b in zip(temp, doy, years, in_base):
        if b:
            grid[yidx[y], d - 1] = t
    padded = np.full((len(ys), 366 + 2 * W), np.nan)
    padded[:, W : W + 366] = grid
    padded[1:, :W] = grid[:-1, -W:]  # left pad from previous grid row
    padded[:-1, W + 366 :] = grid[1:, :W]  # right pad from next grid row
    seas = np.full(366, np.nan)
    thresh = np.full(366, np.nan)
    for d in range(1, 367):
        if d == 60:
            continue
        pool = padded[:, d - 1 : d - 1 + 2 * W + 1].ravel()
        pool = pool[~np.isnan(pool)]
        if len(pool):
            seas[d - 1] = pool.mean()
            thresh[d - 1] = np.percentile(pool, pctile)
    seas[59] = 0.5 * seas[58] + 0.5 * seas[60]
    thresh[59] = 0.5 * thresh[58] + 0.5 * thresh[60]
    if smooth_width:
        seas = runavg_circular(seas, smooth_width)
        thresh = runavg_circular(thresh, smooth_width)
    return seas, thresh


def pooled_clim_threshold_np(
    times,
    temp: np.ndarray,
    *,
    pctile: float = 90.0,
    window_half_width: int = 5,
    smooth_width: int | None = 31,
    baseline: tuple[int, int] | None = None,
):
    """Return (seas[366], thresh[366]) per the legacy convention."""
    doy = clim_doy_np(times)
    years = times.year.values
    T = len(temp)
    in_base = (
        (years >= baseline[0]) & (years <= baseline[1])
        if baseline is not None
        else np.ones(T, dtype=bool)
    )
    offs = np.arange(-window_half_width, window_half_width + 1)
    seas = np.full(366, np.nan)
    thresh = np.full(366, np.nan)
    for d in range(1, 367):
        if d == 60:
            continue
        pos = np.where(in_base & (doy == d))[0]
        if len(pos) == 0:
            continue
        pool = (pos[:, None] + offs[None, :]).ravel()
        pool = pool[(pool >= 0) & (pool < T)]
        vals = temp[pool]
        seas[d - 1] = np.nanmean(vals)
        thresh[d - 1] = np.nanpercentile(vals, pctile)
    seas[59] = 0.5 * seas[58] + 0.5 * seas[60]
    thresh[59] = 0.5 * thresh[58] + 0.5 * thresh[60]
    if smooth_width:
        seas = runavg_circular(seas, smooth_width)
        thresh = runavg_circular(thresh, smooth_width)
    return seas, thresh

"""The pure-Python Student-t quantile table (functions/stats.py) that
finishes the reference's meanTrend CI (dtrend = t_{a/2,n-2} * trend_se,
marineHeatWaves.py:774-779) — checked against published two-sided 95%
critical values."""

import pytest

from mhw3d_detection_spark.functions.stats import (
    MAX_DOF,
    Z_975,
    t_ppf_two_sided,
    t_sf,
    t_table_95,
    t_table_sql_literal,
)

KNOWN_T95 = {
    1: 12.70620474,
    2: 4.30265273,
    5: 2.57058184,
    10: 2.22813885,
    30: 2.04227246,
    100: 1.98397152,
    200: 1.97189622,
}


def test_table_matches_published_values():
    tab = t_table_95()
    assert len(tab) == MAX_DOF
    for dof, want in KNOWN_T95.items():
        assert tab[dof - 1] == pytest.approx(want, abs=1e-7)


def test_monotone_decreasing_toward_normal():
    tab = t_table_95()
    assert all(a > b for a, b in zip(tab, tab[1:]))
    assert tab[-1] > Z_975  # t_200 still above the asymptote
    assert tab[-1] - Z_975 < 0.02


def test_sf_ppf_roundtrip():
    for dof in (1, 3, 7, 50):
        t = t_ppf_two_sided(0.05, dof)
        assert 2 * t_sf(t, dof) == pytest.approx(0.05, abs=1e-10)


def test_sql_literal_mirrors_python_floats():
    lit = t_table_sql_literal()
    vals = [float(v) for v in lit.strip("[]").split(", ")]
    assert vals == list(t_table_95())

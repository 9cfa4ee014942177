"""Student-t quantiles for the meanTrend confidence interval
(reference marineHeatWaves.py:774-779: ``dtrend = t_{alpha/2, n-2} *
trend_se`` via scipy's ``t.isf``).

This environment has no scipy, and the DuckDB oracle has no t
distribution at all — so the quantiles are computed ONCE here in pure
Python (regularized incomplete beta via the standard continued-fraction
expansion, A&S 26.5.8 / the classic Lentz formulation, inverted by
bisection) and shipped to BOTH engines as the same literal table:
a 200-entry broadcast array on the Spark side, the identical list
literal inside the oracle SQL. dof > 200 uses the asymptotic normal
quantile (the t distribution is within 2e-4 of N(0,1) there).
"""

from __future__ import annotations

import math
from functools import lru_cache

#: two-sided 95% normal quantile (asymptotic tail for dof > MAX_DOF)
Z_975 = 1.959963984540054
MAX_DOF = 200


def _betacf(a: float, b: float, x: float) -> float:
    """Continued fraction for the incomplete beta (modified Lentz)."""
    MAXIT, EPS, FPMIN = 300, 3e-16, 1e-300
    qab, qap, qam = a + b, a + 1.0, a - 1.0
    c = 1.0
    d = 1.0 - qab * x / qap
    if abs(d) < FPMIN:
        d = FPMIN
    d = 1.0 / d
    h = d
    for m in range(1, MAXIT + 1):
        m2 = 2 * m
        aa = m * (b - m) * x / ((qam + m2) * (a + m2))
        d = 1.0 + aa * d
        if abs(d) < FPMIN:
            d = FPMIN
        c = 1.0 + aa / c
        if abs(c) < FPMIN:
            c = FPMIN
        d = 1.0 / d
        h *= d * c
        aa = -(a + m) * (qab + m) * x / ((a + m2) * (qap + m2))
        d = 1.0 + aa * d
        if abs(d) < FPMIN:
            d = FPMIN
        c = 1.0 + aa / c
        if abs(c) < FPMIN:
            c = FPMIN
        d = 1.0 / d
        de = d * c
        h *= de
        if abs(de - 1.0) < EPS:
            break
    return h


def betainc_reg(a: float, b: float, x: float) -> float:
    """Regularized incomplete beta I_x(a, b)."""
    if x <= 0.0:
        return 0.0
    if x >= 1.0:
        return 1.0
    ln_bt = (
        math.lgamma(a + b)
        - math.lgamma(a)
        - math.lgamma(b)
        + a * math.log(x)
        + b * math.log(1.0 - x)
    )
    bt = math.exp(ln_bt)
    if x < (a + 1.0) / (a + b + 2.0):
        return bt * _betacf(a, b, x) / a
    return 1.0 - bt * _betacf(b, a, 1.0 - x) / b


def t_sf(t: float, dof: int) -> float:
    """P(T > t) for Student-t with ``dof`` degrees of freedom, t >= 0:
    0.5 * I_{v/(v+t^2)}(v/2, 1/2)."""
    return 0.5 * betainc_reg(dof / 2.0, 0.5, dof / (dof + t * t))


def t_ppf_two_sided(alpha: float, dof: int) -> float:
    """t with P(|T| > t) = alpha (i.e. sf(t) = alpha/2), by bisection —
    monotone, converges to double precision in ~60 steps."""
    target = alpha / 2.0
    lo, hi = 0.0, 1e4
    for _ in range(200):
        mid = 0.5 * (lo + hi)
        if t_sf(mid, dof) > target:
            lo = mid
        else:
            hi = mid
        if hi - lo < 1e-13 * max(1.0, lo):
            break
    return 0.5 * (lo + hi)


@lru_cache(maxsize=None)
def t_table_95(max_dof: int = MAX_DOF) -> tuple[float, ...]:
    """Two-sided 95% t quantiles for dof 1..max_dof."""
    return tuple(t_ppf_two_sided(0.05, v) for v in range(1, max_dof + 1))


def t_table_sql_literal(max_dof: int = MAX_DOF) -> str:
    """The SAME table as a DuckDB list literal (identical float reprs →
    identical bits in both engines)."""
    return "[" + ", ".join(repr(v) for v in t_table_95(max_dof)) + "]"

"""Special functions for p-values, pure Python/numpy (no scipy in the
runtime). Standard series / continued-fraction algorithms
(Abramowitz & Stegun §6.5, §26; Numerical Recipes formulations):

- regularized lower/upper incomplete gamma → chi-square sf
- regularized incomplete beta → Student-t and F sf
- error function based normal cdf/sf

Accuracy ~1e-12 over the ranges statistical tests use; each function
is driver-side scalar math (the distributed layer only ships
sufficient statistics here).
"""

from __future__ import annotations

import math

_MAX_ITER = 500
_EPS = 3e-14
_FPMIN = 1e-300


def _gammaln(x: float) -> float:
    return math.lgamma(x)


def gammainc_lower_reg(a: float, x: float) -> float:
    """Regularized lower incomplete gamma P(a, x)."""
    if x < 0 or a <= 0:
        raise ValueError("invalid args")
    if x == 0:
        return 0.0
    if x < a + 1.0:
        # series representation
        ap = a
        summ = 1.0 / a
        delta = summ
        for _ in range(_MAX_ITER):
            ap += 1.0
            delta *= x / ap
            summ += delta
            if abs(delta) < abs(summ) * _EPS:
                break
        return summ * math.exp(-x + a * math.log(x) - _gammaln(a))
    return 1.0 - _gammainc_upper_cf(a, x)


def _gammainc_upper_cf(a: float, x: float) -> float:
    """Regularized upper incomplete gamma Q(a, x) via Lentz continued
    fraction (x >= a+1 region)."""
    b = x + 1.0 - a
    c = 1.0 / _FPMIN
    d = 1.0 / b
    h = d
    for i in range(1, _MAX_ITER + 1):
        an = -i * (i - a)
        b += 2.0
        d = an * d + b
        if abs(d) < _FPMIN:
            d = _FPMIN
        c = b + an / c
        if abs(c) < _FPMIN:
            c = _FPMIN
        d = 1.0 / d
        delta = d * c
        h *= delta
        if abs(delta - 1.0) < _EPS:
            break
    return math.exp(-x + a * math.log(x) - _gammaln(a)) * h


def chi2_sf(x: float, df: float) -> float:
    """Chi-square survival function P(X > x)."""
    if x <= 0:
        return 1.0
    if x < df + 1.0:
        return 1.0 - gammainc_lower_reg(df / 2.0, x / 2.0)
    return _gammainc_upper_cf(df / 2.0, x / 2.0)


def betainc_reg(a: float, b: float, x: float) -> float:
    """Regularized incomplete beta I_x(a, b) (Lentz continued fraction)."""
    if x <= 0:
        return 0.0
    if x >= 1:
        return 1.0
    ln_bt = (
        _gammaln(a + b)
        - _gammaln(a)
        - _gammaln(b)
        + a * math.log(x)
        + b * math.log(1.0 - x)
    )
    bt = math.exp(ln_bt)
    if x < (a + 1.0) / (a + b + 2.0):
        return bt * _betacf(a, b, x) / a
    return 1.0 - bt * _betacf(b, a, 1.0 - x) / b


def _betacf(a: float, b: float, x: float) -> float:
    qab, qap, qam = a + b, a + 1.0, a - 1.0
    c = 1.0
    d = 1.0 - qab * x / qap
    if abs(d) < _FPMIN:
        d = _FPMIN
    d = 1.0 / d
    h = d
    for m in range(1, _MAX_ITER + 1):
        m2 = 2 * m
        aa = m * (b - m) * x / ((qam + m2) * (a + m2))
        d = 1.0 + aa * d
        if abs(d) < _FPMIN:
            d = _FPMIN
        c = 1.0 + aa / c
        if abs(c) < _FPMIN:
            c = _FPMIN
        d = 1.0 / d
        h *= d * c
        aa = -(a + m) * (qab + m) * x / ((a + m2) * (qap + m2))
        d = 1.0 + aa * d
        if abs(d) < _FPMIN:
            d = _FPMIN
        c = 1.0 + aa / c
        if abs(c) < _FPMIN:
            c = _FPMIN
        d = 1.0 / d
        delta = d * c
        h *= delta
        if abs(delta - 1.0) < _EPS:
            break
    return h


def t_sf(t: float, df: float) -> float:
    """Student-t survival function P(T > t)."""
    x = df / (df + t * t)
    p = 0.5 * betainc_reg(df / 2.0, 0.5, x)
    return p if t >= 0 else 1.0 - p


def t_sf_two_sided(t: float, df: float) -> float:
    return 2.0 * t_sf(abs(t), df)


def t_ppf(p: float, df: float) -> float:
    """Student-t percent-point (quantile) via bisection on the CDF —
    needed for confidence intervals. p in (0,1)."""
    if not 0.0 < p < 1.0:
        raise ValueError("p must be in (0,1)")
    lo, hi = -1e3, 1e3
    for _ in range(200):
        mid = (lo + hi) / 2.0
        if 1.0 - t_sf(mid, df) < p:
            lo = mid
        else:
            hi = mid
        if hi - lo < 1e-12 * max(1.0, abs(mid)):
            break
    return (lo + hi) / 2.0


def f_sf(f: float, dfn: float, dfd: float) -> float:
    """F-distribution survival function P(F > f)."""
    if f <= 0:
        return 1.0
    x = dfd / (dfd + dfn * f)
    return betainc_reg(dfd / 2.0, dfn / 2.0, x)


def normal_cdf(z: float) -> float:
    return 0.5 * (1.0 + math.erf(z / math.sqrt(2.0)))


def normal_sf(z: float) -> float:
    return 0.5 * math.erfc(z / math.sqrt(2.0))


def normal_ppf(p: float) -> float:
    """Acklam-style rational approximation refined by one Halley step."""
    if not 0.0 < p < 1.0:
        raise ValueError("p must be in (0,1)")
    # bisection on erf-based cdf: simple & accurate enough
    lo, hi = -40.0, 40.0
    for _ in range(200):
        mid = (lo + hi) / 2.0
        if normal_cdf(mid) < p:
            lo = mid
        else:
            hi = mid
        if hi - lo < 1e-13:
            break
    return (lo + hi) / 2.0

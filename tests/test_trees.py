"""Vendored Extra-Trees importance (analysis/trees.py) and the
select_by_importance engine dispatch (analysis/selection.py).

Reference: feature_selection.py:247-300 (RandomForest importances).
The sklearn branch is exercised when sklearn is importable and skipped
with an explicit reason otherwise, so neither branch can rot silently.
"""

import numpy as np
import pandas as pd
import pytest

from feature_engineering_tk_spark.analysis.selection import FeatureSelector
from feature_engineering_tk_spark.analysis.trees import ExtraTreesImportance


def _signal_noise_frame(n=400, seed=7):
    rng = np.random.default_rng(seed)
    signal = rng.normal(size=n)
    noise = rng.normal(size=n)
    y = (signal > 0).astype(int)
    return pd.DataFrame({"signal": signal, "noise": noise, "y": y})


def test_extratrees_ranks_signal_classification():
    pdf = _signal_noise_frame()
    X = pdf[["signal", "noise"]].to_numpy()
    model = ExtraTreesImportance(random_state=0).fit(X, pdf["y"].to_numpy())
    imp = model.feature_importances_
    assert imp.shape == (2,)
    assert abs(imp.sum() - 1.0) < 1e-12
    assert imp[0] > 3 * imp[1]  # signal dominates noise


def test_extratrees_ranks_signal_regression():
    rng = np.random.default_rng(11)
    x0 = rng.normal(size=500)
    x1 = rng.normal(size=500)
    y = 5.0 * x0 + 0.1 * rng.normal(size=500)  # continuous, >20 uniques
    model = ExtraTreesImportance(random_state=0).fit(np.column_stack([x0, x1]), y)
    assert not model._classification
    assert model.feature_importances_[0] > 3 * model.feature_importances_[1]


def test_extratrees_deterministic():
    pdf = _signal_noise_frame(seed=3)
    X, y = pdf[["signal", "noise"]].to_numpy(), pdf["y"].to_numpy()
    a = ExtraTreesImportance(random_state=42).fit(X, y).feature_importances_
    b = ExtraTreesImportance(random_state=42).fit(X, y).feature_importances_
    np.testing.assert_array_equal(a, b)
    c = ExtraTreesImportance(random_state=43).fit(X, y).feature_importances_
    assert not np.array_equal(a, c)  # seed actually matters


def test_extratrees_constant_feature_gets_zero():
    rng = np.random.default_rng(5)
    x0 = rng.normal(size=300)
    const = np.ones(300)
    y = (x0 > 0).astype(int)
    imp = ExtraTreesImportance(random_state=1).fit(
        np.column_stack([x0, const]), y
    ).feature_importances_
    assert imp[1] == 0.0  # constant column can never split


def test_select_by_importance_builtin_engine(spark):
    sdf = spark.createDataFrame(_signal_noise_frame())
    sel = FeatureSelector(sdf, target="y")
    got = sel.select_by_importance(top_k=1, engine="builtin")
    assert got == ["signal"]
    imp = sel.get_feature_importance_df()
    assert (imp["score_type"] == "tree_importance").all()
    assert imp.iloc[0]["feature"] == "signal"
    # auto resolves to builtin in this runtime (sklearn absent) or
    # sklearn where present — either way the ranking must agree
    assert sel.select_by_importance(top_k=1, engine="auto") == ["signal"]


def test_select_by_importance_mi_engine(spark):
    sdf = spark.createDataFrame(_signal_noise_frame())
    sel = FeatureSelector(sdf, target="y")
    assert sel.select_by_importance(top_k=1, engine="mi") == ["signal"]
    assert (sel.get_feature_importance_df()["score_type"] == "mutual_information").all()


def test_select_by_importance_sklearn_engine(spark):
    """Reference-parity branch: runs for real when sklearn is present;
    explicit skip (not silence) when it is not."""
    pytest.importorskip(
        "sklearn", reason="sklearn absent in this runtime — RF branch is "
        "environment-gated; builtin Extra-Trees engine is the active path"
    )
    sdf = spark.createDataFrame(_signal_noise_frame())
    sel = FeatureSelector(sdf, target="y")
    assert sel.select_by_importance(top_k=1, engine="sklearn") == ["signal"]
    assert (sel.get_feature_importance_df()["score_type"] == "random_forest_importance").all()


def test_select_by_importance_bad_engine(spark):
    sdf = spark.createDataFrame(_signal_noise_frame())
    with pytest.raises(ValueError, match="unknown importance engine"):
        FeatureSelector(sdf, target="y").select_by_importance(engine="nope")


def test_select_features_auto_uses_trees(spark):
    """variance → correlation → importance pipeline ends on the tree
    engine and keeps the informative feature."""
    pdf = _signal_noise_frame()
    pdf["dup"] = pdf["signal"] * 1.0 + 1e-9  # corr-pruned twin
    sdf = spark.createDataFrame(pdf)
    sel = FeatureSelector(sdf, target="y")
    got = sel.select_features_auto(corr_threshold=0.95, top_k=2)
    assert "signal" in got and "dup" not in got

"""Visualization layer (analysis/viz.py) — reference
data_analysis.py:445-550 and target_analyzer/visualization.py:29-279.

matplotlib is absent in this runtime, so the tests verify the
distributed-aggregation half (the PlotSpec contents) numerically
against pandas/numpy on the same data, and that render() raises a
clear ImportError. Where matplotlib IS importable, a smoke render of
every spec kind runs too.
"""

import numpy as np
import pandas as pd
import pytest

from feature_engineering_tk_spark.analysis import viz as V
from feature_engineering_tk_spark.analysis.target import TargetAnalyzer


def _frame(n=300, seed=9):
    rng = np.random.default_rng(seed)
    pdf = pd.DataFrame(
        {
            "a": rng.normal(10, 2, n),
            "b": rng.exponential(3, n),
            "label": rng.integers(0, 3, n),
        }
    )
    pdf.loc[: n // 10, "b"] = np.nan  # some missing
    return pdf


def test_histogram_spec_matches_numpy(spark):
    pdf = _frame()
    sdf = spark.createDataFrame(pdf)
    spec = V.histogram_spec(sdf, ["a", "b"], bins=30)
    for c in ("a", "b"):
        vals = pdf[c].dropna().to_numpy()
        np_counts, np_edges = np.histogram(vals, bins=30)
        np.testing.assert_allclose(spec[c]["edges"], np_edges, rtol=1e-12)
        assert spec[c]["counts"] == list(np_counts)


def test_histogram_spec_degenerate_and_empty(spark):
    pdf = pd.DataFrame({"const": [5.0] * 20, "empty": [None] * 20})
    spec = V.histogram_spec(spark.createDataFrame(pdf), ["const", "empty"])
    assert spec["empty"] == {"edges": [], "counts": []}
    assert spec["const"]["edges"] == [4.5, 5.5]
    assert sum(spec["const"]["counts"]) == 20


def test_plot_missing_values_spec(spark):
    pdf = _frame()
    spec = V.plot_missing_values(spark.createDataFrame(pdf))
    assert spec["kind"] == "missing_bar"
    assert spec["columns"] == ["b"]
    expected = pdf["b"].isna().mean() * 100
    assert abs(spec["missing_percent"][0] - expected) < 1e-9
    # no-missing frame → None, reference parity (data_analysis.py:454)
    clean = spark.createDataFrame(pdf.dropna())
    assert V.plot_missing_values(clean) is None


def test_plot_correlation_heatmap_spec(spark):
    pdf = _frame()
    spec = V.plot_correlation_heatmap(spark.createDataFrame(pdf), method="pearson")
    assert spec["kind"] == "heatmap"
    pd_corr = pdf[spec["names"]].corr()
    np.testing.assert_allclose(spec["matrix"], pd_corr.to_numpy(), atol=1e-9)
    # <2 numeric columns → None
    one = spark.createDataFrame(pdf[["a"]].assign(s="x"))
    assert V.plot_correlation_heatmap(one) is None


def test_plot_distributions_spec(spark):
    spec = V.plot_distributions(spark.createDataFrame(_frame()), bins=10)
    assert spec["kind"] == "histogram_grid"
    assert set(spec["order"]) == set(spec["histograms"].keys())


def test_plot_class_distribution_spec(spark):
    pdf = _frame()
    ta = TargetAnalyzer(spark.createDataFrame(pdf), "label", task="classification")
    spec = V.plot_class_distribution(ta)
    assert spec["kind"] == "class_distribution"
    vc = pdf["label"].value_counts()
    got = dict(zip(spec["classes"], spec["counts"]))
    assert got == vc.to_dict()
    assert abs(sum(spec["percentages"]) - 100.0) < 1e-6
    # regression task → None (visualization.py:39)
    ta_r = TargetAnalyzer(spark.createDataFrame(pdf), "a", task="regression")
    assert V.plot_class_distribution(ta_r) is None


def test_plot_target_distribution_spec(spark):
    pdf = _frame()
    ta = TargetAnalyzer(spark.createDataFrame(pdf), "a", task="regression")
    spec = V.plot_target_distribution(ta)
    assert spec["kind"] == "target_distribution"
    assert abs(spec["mean"] - pdf["a"].mean()) < 1e-9
    assert abs(spec["median"] - pdf["a"].median()) < 1e-9
    qq = spec["qq"]
    assert len(qq["theoretical"]) == len(qq["sample"]) == 99
    # sample quantiles of a normal column track the line monotonically
    assert all(x <= y + 1e-12 for x, y in zip(qq["sample"], qq["sample"][1:]))
    # classification task → None
    ta_c = TargetAnalyzer(spark.createDataFrame(pdf), "label", task="classification")
    assert V.plot_target_distribution(ta_c) is None


def test_plot_feature_by_class_box(spark):
    pdf = _frame()
    ta = TargetAnalyzer(spark.createDataFrame(pdf), "label", task="classification")
    spec = V.plot_feature_by_class(ta, "a", plot_type="box")
    assert spec["kind"] == "box_by_class"
    for cls, s in zip(spec["classes"], spec["stats"]):
        grp = pdf[pdf["label"] == int(cls)]["a"].dropna()
        assert abs(s["q1"] - grp.quantile(0.25)) < 1e-9
        assert abs(s["median"] - grp.quantile(0.5)) < 1e-9
        assert abs(s["q3"] - grp.quantile(0.75)) < 1e-9
        iqr = grp.quantile(0.75) - grp.quantile(0.25)
        inside = grp[(grp >= grp.quantile(0.25) - 1.5 * iqr) & (grp <= grp.quantile(0.75) + 1.5 * iqr)]
        assert abs(s["whisker_lo"] - inside.min()) < 1e-9
        assert abs(s["whisker_hi"] - inside.max()) < 1e-9
    # missing feature → None; bad plot_type → raises
    assert V.plot_feature_by_class(ta, "nope") is None
    with pytest.raises(ValueError):
        V.plot_feature_by_class(ta, "a", plot_type="scatter3d")


def test_plot_feature_by_class_hist(spark):
    pdf = _frame()
    ta = TargetAnalyzer(spark.createDataFrame(pdf), "label", task="classification")
    spec = V.plot_feature_by_class(ta, "a", plot_type="hist", bins=12)
    assert spec["kind"] == "hist_by_class"
    assert len(spec["edges"]) == 13
    total = sum(sum(c) for c in spec["counts"])
    assert total == int(pdf["a"].notna().sum())
    violin = V.plot_feature_by_class(ta, "a", plot_type="violin", bins=12)
    assert violin["kind"] == "violin_by_class"
    assert violin["counts"] == spec["counts"]  # same aggregation


def test_plot_feature_vs_target_spec(spark):
    rng = np.random.default_rng(4)
    pdf = pd.DataFrame({"x1": rng.normal(size=200), "x2": rng.normal(size=200)})
    pdf["y"] = 3.0 * pdf["x1"] + 0.5 + 0.01 * rng.normal(size=200)
    ta = TargetAnalyzer(spark.createDataFrame(pdf), "y", task="regression")
    spec = V.plot_feature_vs_target(ta, max_points=50)
    assert spec["kind"] == "scatter_grid"
    p1 = next(p for p in spec["panels"] if p["feature"] == "x1")
    # trend line fit on FULL data (not the 50-point sample)
    z = np.polyfit(pdf["x1"], pdf["y"], 1)
    assert abs(p1["slope"] - z[0]) < 1e-6
    assert abs(p1["intercept"] - z[1]) < 1e-6
    assert len(p1["x"]) == 50 and p1["n_total"] == 200
    # top-|corr| ordering put x1 first
    assert spec["panels"][0]["feature"] == "x1"
    # deterministic sample: re-running yields identical points
    spec2 = V.plot_feature_vs_target(ta, max_points=50)
    assert spec2["panels"][0]["x"] == p1["x"]


def test_plot_residuals_spec(spark):
    rng = np.random.default_rng(6)
    pdf = pd.DataFrame({"y": rng.normal(size=150)})
    pdf["pred"] = pdf["y"] + rng.normal(0, 0.1, size=150)
    ta = TargetAnalyzer(spark.createDataFrame(pdf), "y", task="regression")
    spec = V.plot_residuals(ta, "pred", max_points=100)
    assert spec["kind"] == "residuals"
    assert len(spec["predicted"]) == len(spec["residuals"]) == 100
    # residual = y - pred on every sampled point
    # (sample is hash-chosen, so just re-check the invariant pairwise)
    assert all(abs(r) < 1.0 for r in spec["residuals"])  # 0.1-sigma noise
    assert len(spec["qq"]["sample"]) == 99


def test_facade_plot_methods(spark):
    """DataAnalyzer (api.py) and TargetAnalyzer expose the reference's
    8 plot entry points; render=False (default) returns the spec."""
    from feature_engineering_tk_spark.api import DataAnalyzer

    pdf = _frame()
    sdf = spark.createDataFrame(pdf)
    da = DataAnalyzer(sdf)
    assert da.plot_missing_values()["kind"] == "missing_bar"
    assert da.plot_correlation_heatmap()["kind"] == "heatmap"
    assert da.plot_distributions(bins=8)["kind"] == "histogram_grid"
    ta = TargetAnalyzer(sdf, "label", task="classification")
    assert ta.plot_class_distribution()["kind"] == "class_distribution"
    assert ta.plot_feature_by_class("a")["kind"] == "box_by_class"
    ta_r = TargetAnalyzer(sdf, "a", task="regression")
    assert ta_r.plot_target_distribution(bins=8)["kind"] == "target_distribution"
    assert ta_r.plot_feature_vs_target(features=["b"], max_points=10)["kind"] == "scatter_grid"
    rdf = sdf.withColumn("pred", sdf["a"] * 1.01)
    assert TargetAnalyzer(rdf, "a", task="regression").plot_residuals(
        "pred", max_points=10
    )["kind"] == "residuals"


def test_render_all_specs_or_importerror(spark):
    """With matplotlib: every spec kind renders to a Figure. Without:
    render raises a clear ImportError and the specs stand alone."""
    pdf = _frame()
    sdf = spark.createDataFrame(pdf)
    ta_c = TargetAnalyzer(sdf, "label", task="classification")
    ta_r = TargetAnalyzer(sdf, "a", task="regression")
    rdf = spark.createDataFrame(
        pd.DataFrame({"y": np.arange(60.0), "pred": np.arange(60.0) + 0.1})
    )
    ta_res = TargetAnalyzer(rdf, "y", task="regression")
    specs = [
        V.plot_missing_values(sdf),
        V.plot_correlation_heatmap(sdf),
        V.plot_distributions(sdf, bins=8),
        V.plot_class_distribution(ta_c),
        V.plot_target_distribution(ta_r, bins=8),
        V.plot_feature_by_class(ta_c, "a", "box"),
        V.plot_feature_by_class(ta_c, "a", "violin"),
        V.plot_feature_by_class(ta_c, "a", "hist"),
        V.plot_feature_vs_target(ta_r, features=["b"], max_points=20),
        V.plot_residuals(ta_res, "pred", max_points=20),
    ]
    assert all(s is not None for s in specs)
    try:
        import matplotlib  # noqa: F401

        have_mpl = True
    except ImportError:
        have_mpl = False
    for spec in specs:
        if have_mpl:
            fig = V.render(spec)
            assert fig is not None
        else:
            with pytest.raises(ImportError, match="matplotlib"):
                V.render(spec)

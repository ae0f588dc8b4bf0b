"""Suggestions / recommendations / reports (reference §2.17) and
residual analysis (§2.15) — driver-side rule tables over distributed
sufficient statistics, verified against pandas/numpy on the same data."""

import math

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def skewed_df(spark):
    rng = np.random.default_rng(7)
    pdf = pd.DataFrame(
        {
            "skewed": rng.lognormal(0.0, 1.0, 400),
            "flat": rng.uniform(0.0, 10.0, 400),
            "wide": rng.uniform(0.0, 500.0, 400),
            "lowcard": rng.integers(0, 5, 400).astype(float),
            "target": rng.uniform(0.0, 1.0, 400),
        }
    )
    pdf.loc[pdf.index[:40], "skewed"] = np.nan  # 10% missing
    return spark.createDataFrame(pdf)


def test_suggest_feature_engineering_rules(spark, skewed_df):
    from feature_engineering_tk_spark.analysis.suggest import suggest_feature_engineering

    out = {d["column"]: d["suggestions"] for d in suggest_feature_engineering(
        skewed_df, ["skewed", "flat", "wide"]
    )}
    # lognormal: heavy right skew and >5% missing
    assert "log_transform" in out["skewed"]
    assert "missing_indicator" in out["skewed"]
    # uniform on [0,10]: nothing to do
    assert out["flat"] == ["none"]
    # uniform on [0,500]: range > 100 → scale only
    assert out["wide"] == ["scale"]


def test_suggest_binning_rules(spark, skewed_df):
    from feature_engineering_tk_spark.analysis.suggest import suggest_binning

    out = {d["column"]: d for d in suggest_binning(skewed_df, ["skewed", "flat", "lowcard"])}
    assert out["lowcard"]["strategy"] == "none"
    assert out["lowcard"]["suggested_bins"] == 0
    assert out["skewed"]["strategy"] == "quantile"  # |G1| > 1
    assert out["flat"]["strategy"] == "uniform"


def test_suggest_skew_matches_pandas(spark, skewed_df):
    """The profile's skew is pandas bias-corrected G1 (the §2.9 trap)."""
    from feature_engineering_tk_spark.analysis.suggest import _column_profile

    prof = _column_profile(skewed_df, ["flat"])
    pdf = skewed_df.select("flat").toPandas()
    assert math.isclose(prof["flat"]["skew"], pdf["flat"].skew(), rel_tol=1e-9)


def test_recommend_models_rule_table():
    from feature_engineering_tk_spark.analysis.suggest import recommend_models

    small_clf = recommend_models(5_000, 10, "classification", imbalance_ratio=5.0)
    names = [r["model"] for r in small_clf]
    assert "LogisticRegression" in names
    assert any("weighting" in n or "resampling" in n for n in names)

    big_reg = recommend_models(1_000_000, 20, "regression")
    assert big_reg[0]["model"] == "GradientBoostedTrees"

    wide = recommend_models(100, 50, "regression")
    assert any(r["model"] == "feature_selection_first" for r in wide)


def test_generate_recommendations_priorities():
    from feature_engineering_tk_spark.analysis.suggest import generate_recommendations

    quality = {
        "missing_pct": {"a": 45.0, "b": 8.0, "c": 0.0},
        "duplicate_rows": 3,
        "constant_columns": ["k"],
        "high_cardinality_columns": ["id"],
        "infinite_counts": {"x": 2},
    }
    recs = generate_recommendations(quality, [{"col_a": "p", "col_b": "q", "r": 0.95}])
    joined = "\n".join(recs)
    assert "[high] drop or model-impute 'a'" in joined
    assert "[medium] impute 'b'" in joined
    assert "'c'" not in joined
    assert "duplicate rows" in joined
    assert "constant column 'k'" in joined
    assert "identifier" in joined
    assert "infinite values in 'x'" in joined
    assert "'p' and 'q'" in joined


def test_analyze_residuals_matches_numpy(spark, skewed_df):
    from feature_engineering_tk_spark.analysis.target import analyze_residuals

    df = skewed_df.withColumn("pred", F.col("target") * 0.5 + 0.1)
    res = analyze_residuals(df, "target", "pred")

    pdf = skewed_df.select("target").toPandas()
    r = pdf["target"] - (pdf["target"] * 0.5 + 0.1)
    assert res["n"] == len(pdf)
    assert math.isclose(res["mae"], r.abs().mean(), rel_tol=1e-9)
    assert math.isclose(res["rmse"], float(np.sqrt((r**2).mean())), rel_tol=1e-9)
    ss_tot = ((pdf["target"] - pdf["target"].mean()) ** 2).sum()
    assert math.isclose(res["r2"], 1.0 - (r**2).sum() / ss_tot, rel_tol=1e-6)
    assert "pvalue" in res["normality"]


def test_quick_analysis_shape(spark, skewed_df):
    from feature_engineering_tk_spark.analysis.reports import quick_analysis

    rep = quick_analysis(skewed_df)
    assert rep["basic_info"]["rows"] == 400
    assert any(m["column"] == "skewed" and m["missing"] == 40 for m in rep["missing"])
    assert "quality" in rep and "numeric_summary" in rep


def test_full_report_and_export(spark, skewed_df, tmp_path):
    from feature_engineering_tk_spark.analysis.reports import (
        export_report,
        generate_full_report,
    )

    rep = generate_full_report(skewed_df, "target")
    assert rep["task"] == "regression"
    assert rep["feature_relationships"]
    assert rep["model_recommendations"]

    md = export_report(rep, str(tmp_path / "r.md"), fmt="markdown")
    text = open(md).read()
    assert text.startswith("# Target analysis:")
    assert "Feature" in text

    js = export_report(rep, str(tmp_path / "r.json"), fmt="json")
    import json

    assert json.load(open(js))["target"] == "target"

    html = export_report(rep, str(tmp_path / "r.html"), fmt="html")
    htext = open(html).read()
    assert htext.startswith("<!DOCTYPE html>")
    assert "<h1>" in htext and "</html>" in htext
    assert "Feature–target relationships" in htext
    assert "Model recommendations" in htext

    with pytest.raises(ValueError):
        export_report(rep, str(tmp_path / "r.x"), fmt="docx")


def test_html_export_classification_and_escaping(spark, tmp_path):
    from feature_engineering_tk_spark.analysis.reports import export_report, report_to_html

    rows = [(i, float(i % 7), "a<b" if i % 4 else "c&d") for i in range(120)]
    df = spark.createDataFrame(rows, "id int, x double, target string")
    from feature_engineering_tk_spark.analysis.reports import generate_full_report

    rep = generate_full_report(df, "target")
    html = report_to_html(rep)
    # class labels are HTML-escaped, never raw
    assert "a&lt;b" in html and "c&amp;d" in html
    assert "a<b" not in html
    assert "Class distribution" in html
    path = export_report(rep, str(tmp_path / "c.html"), fmt="html")
    assert open(path).read() == html


def test_full_report_classification_markdown(spark):
    """Classification branch: class table + imbalance flow into the
    markdown writer and model recommendations."""
    import numpy as np
    import pandas as pd

    from feature_engineering_tk_spark.analysis.reports import (
        generate_full_report,
        report_to_markdown,
    )

    rng = np.random.RandomState(42)
    pdf = pd.DataFrame(
        {
            "f1": rng.randn(500),
            "f2": rng.randn(500),
            "target": rng.choice([0, 1], 500, p=[0.85, 0.15]),
        }
    )
    rep = generate_full_report(spark.createDataFrame(pdf), "target")
    assert rep["task"] == "classification"
    assert rep["imbalance"]["ratio"] > 3.0
    # imbalance propagates into the recommendation rule table
    assert any("weighting" in m["model"] or "resampling" in m["model"]
               for m in rep["model_recommendations"])
    md = report_to_markdown(rep)
    assert "Class distribution" in md and "| 0 |" in md


def test_generate_summary_report_ascii(spark):
    """ASCII report (core.py:260-369 analog): bar chart rows, severity
    line, significance stars."""
    import numpy as np
    import pandas as pd

    from feature_engineering_tk_spark.analysis.reports import generate_summary_report

    rng = np.random.RandomState(42)
    y = rng.choice([0, 1], 600, p=[0.8, 0.2])
    pdf = pd.DataFrame(
        {"f1": rng.randn(600) + y * 2.0, "f2": rng.randn(600), "target": y}
    )
    text = generate_summary_report(spark.createDataFrame(pdf), "target")
    assert "TARGET ANALYSIS: target" in text
    assert "#" in text  # bar chart
    assert "imbalance ratio" in text
    assert "f1" in text and "***" in text  # strong effect flagged
    assert "Model recommendations:" in text


class TestCorpusReport:
    def test_scalars_and_facets(self, spark):
        from feature_engineering_tk_spark.analysis.reports import (
            corpus_report,
            corpus_report_markdown,
        )

        df = spark.createDataFrame(
            [
                (0, "one two three four five six", "en", "web"),
                (1, "one two three four five six", "en", "web"),   # exact dup
                (2, "tiny", "en", "books"),
                (3, "", "de", "web"),
                (4, None, "de", "web"),
            ],
            "doc_id long, text string, lang string, source string",
        )
        r = corpus_report(df, lang_col="lang", source_col="source")
        assert r["n_docs"] == 5
        assert r["total_tokens"] == 6 + 6 + 1
        assert r["empty_rate"] == pytest.approx(2 / 5)
        assert r["short_rate"] == pytest.approx(3 / 5)   # tiny + 2 empties
        # 5 docs, distinct texts: {six-word, tiny, ""} (None coalesced to "")
        assert r["exact_dup_rate"] == pytest.approx(1 - 3 / 5)
        langs = {e["value"]: e["n"] for e in r["languages"]}
        assert langs == {"en": 3, "de": 2}
        md = corpus_report_markdown(r)
        assert "n_docs" in md and "## Top languages" in md

    def test_empty_corpus(self, spark):
        from feature_engineering_tk_spark.analysis.reports import corpus_report

        df = spark.createDataFrame([], "doc_id long, text string")
        r = corpus_report(df)
        assert r["n_docs"] == 0 and r["mean_tokens"] is None

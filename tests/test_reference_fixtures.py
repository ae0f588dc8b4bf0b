"""The reference's own unit-test fixtures re-run as golden fixtures
(SURVEY.md §5 / FIXTURES.md §2): each fixture below is reproduced
VERBATIM from the reference test suite, the expected output is computed
with pandas/numpy reference semantics on the driver, and the Spark
engine's answer must match — allclose for numerics, exact for
text/codes.

Fixture provenance (file:line in /root/reference):
- FeatureEngineer frame    tests/test_feature_engineering.py:21-29
- DataPreprocessor frame   tests/test_preprocessing.py:21-28
- NaN-encoding frame       tests/test_feature_engineering.py:420
- outlier frames           tests/test_preprocessing.py:120-123,142-144,169
- classification frame     tests/test_target_analyzer.py:14-23
- regression frame         tests/test_target_analyzer.py:27-35
"""

import math

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def fe_frame(spark):
    pdf = pd.DataFrame(
        {
            "numeric1": [1, 2, 3, 4, 5],
            "numeric2": [10, 20, 30, 40, 50],
            "categorical": ["A", "B", "A", "C", "B"],
            "date": pd.date_range("2024-01-01", periods=5, freq="D"),
        }
    )
    return pdf, spark.createDataFrame(pdf)


@pytest.fixture(scope="module")
def prep_frame(spark):
    pdf = pd.DataFrame(
        {
            "numeric1": [1, 2, 3, 4, 5],
            "with_nulls": [1.0, None, 3.0, None, 5.0],
            "categorical": ["A", "B", "A", "C", "B"],
        }
    )
    return pdf, spark.createDataFrame(pdf)


def _col(df, name):
    return [r[name] for r in df.orderBy("numeric1").collect()]


# -- encodings (test_feature_engineering.py:55-184 semantics) --------------

def test_label_encode_sorted_rank(fe_frame):
    from feature_engineering_tk_spark.transforms.encode import LabelEncoder

    pdf, df = fe_frame
    out = LabelEncoder().fit(df, "categorical").transform(df, out="code")
    # sklearn LabelEncoder: rank in lexicographically sorted uniques
    assert _col(out, "code") == [0, 1, 0, 2, 1]


def test_label_encode_nan_preserved(spark):
    from feature_engineering_tk_spark.transforms.encode import LabelEncoder

    pdf = pd.DataFrame({"categorical": ["A", "B", None, "A", np.nan]})
    df = spark.createDataFrame(pdf)
    out = LabelEncoder().fit(df, "categorical").transform(df, out="code")
    got = [r["code"] for r in out.collect()]
    assert got[:2] == [0.0, 1.0] and got[3] == 0.0  # float dtype when NaN present
    assert got[2] is None and got[4] is None  # NaN preserved, never encoded


def test_onehot_sorted_columns_drop_first(fe_frame):
    from feature_engineering_tk_spark.transforms.encode import OneHotEncoder

    pdf, df = fe_frame
    out = OneHotEncoder().fit(df, "categorical").transform(df)
    expected = pd.get_dummies(pdf, columns=["categorical"], dtype=int)
    for c in ["categorical_A", "categorical_B", "categorical_C"]:
        assert _col(out, c) == expected.sort_values("numeric1")[c].tolist()

    out2 = OneHotEncoder(drop_first=True).fit(df, "categorical").transform(df)
    assert "categorical_A" not in out2.columns  # first sorted category dropped
    assert "categorical_B" in out2.columns


# -- scaling (test_feature_engineering.py:70-74: ddof=0 contract) ----------

def test_standard_scale_ddof0(fe_frame):
    from feature_engineering_tk_spark.transforms.scale import Scaler

    pdf, df = fe_frame
    out = Scaler(method="standard").fit(df, ["numeric1"]).transform(df)
    got = np.array(_col(out, "numeric1"))
    expected = (pdf["numeric1"] - pdf["numeric1"].mean()) / pdf["numeric1"].std(ddof=0)
    assert np.allclose(got, expected)
    assert math.isclose(got.std(ddof=0), 1.0)  # the reference's exact assertion


def test_minmax_scale_unit_interval(fe_frame):
    from feature_engineering_tk_spark.transforms.scale import Scaler

    pdf, df = fe_frame
    out = Scaler(method="minmax").fit(df, ["numeric2"]).transform(df)
    got = np.array(_col(out, "numeric2"))
    assert np.allclose(got, [0.0, 0.25, 0.5, 0.75, 1.0])


# -- polynomial + log (test_feature_engineering.py:294-368,444-477) --------

def test_polynomial_squared_and_interaction(fe_frame):
    from feature_engineering_tk_spark.functions.numeric import polynomial_features

    pdf, df = fe_frame
    out = polynomial_features(df, ["numeric1", "numeric2"], degree=2)
    assert _col(out, "numeric1_squared") == (pdf["numeric1"] ** 2).tolist()
    assert (
        _col(out, "numeric1_x_numeric2")
        == (pdf["numeric1"] * pdf["numeric2"]).tolist()
    )


def test_log_transform_offset_rule(fe_frame):
    from feature_engineering_tk_spark.functions.numeric import log_transform

    pdf, df = fe_frame
    out = log_transform(df, ["numeric1"])  # min=1 > 0 → offset 0
    assert np.allclose(_col(out, "numeric1_log"), np.log(pdf["numeric1"]))


# -- datetime (test_feature_engineering.py:513-574; Monday=0 trap) ---------

def test_datetime_monday_zero(fe_frame):
    from feature_engineering_tk_spark.functions.datetime_features import (
        datetime_features,
    )

    pdf, df = fe_frame
    out = datetime_features(df, "date", ["year", "month", "day", "dayofweek", "is_weekend"])
    # 2024-01-01 is a Monday → pandas dayofweek 0
    assert _col(out, "date_dayofweek") == pdf["date"].dt.dayofweek.tolist()
    assert _col(out, "date_is_weekend") == pdf["date"].dt.dayofweek.isin([5, 6]).astype(int).tolist()
    assert _col(out, "date_year") == [2024] * 5


# -- binning (qcut parity, test_feature_engineering.py:370-442) ------------

def test_quantile_bin_qcut_parity(fe_frame):
    from feature_engineering_tk_spark.transforms.binning import QuantileBinner

    pdf, df = fe_frame
    out = QuantileBinner(bins=2).fit(df, "numeric2").transform(df, out="b")
    expected = pd.qcut(pdf["numeric2"], 2, labels=False, duplicates="drop")
    assert _col(out, "b") == expected.tolist()


# -- imputation (test_preprocessing.py:95-221) -----------------------------

def test_mean_median_impute_fill_three(prep_frame):
    from feature_engineering_tk_spark.transforms.impute import Imputer

    pdf, df = prep_frame
    for strategy in ("mean", "median"):
        out = Imputer(strategy=strategy).fit(df, ["with_nulls"]).transform(df)
        assert _col(out, "with_nulls") == [1.0, 3.0, 3.0, 3.0, 5.0]


def test_drop_strategy_removes_null_rows(prep_frame):
    from feature_engineering_tk_spark.transforms.impute import Imputer

    pdf, df = prep_frame
    out = Imputer(strategy="drop").fit(df, ["with_nulls"]).transform(df)
    assert out.count() == 3


# -- outliers (test_preprocessing.py:120-169) ------------------------------

def test_iqr_detects_100_skips_constant(spark):
    from feature_engineering_tk_spark.transforms.outliers import OutlierDetector

    pdf = pd.DataFrame({"constant": [5] * 5, "variable": [1, 2, 3, 100, 5]})
    df = spark.createDataFrame(pdf)
    det = OutlierDetector(method="iqr", factor=1.5).fit(df, ["variable", "constant"])
    flagged = det.flag(df, ["variable"])
    q1, q3 = pdf["variable"].quantile([0.25, 0.75])
    expected_mask = (pdf["variable"] < q1 - 1.5 * (q3 - q1)) | (
        pdf["variable"] > q3 + 1.5 * (q3 - q1)
    )
    got = {r["variable"]: r["variable_is_outlier"] for r in flagged.collect()}
    for v, m in zip(pdf["variable"], expected_mask):
        assert got[v] == bool(m)
    # constant column: zero IQR must not flag everything
    cflag = det.flag(df, ["constant"]).filter(F.col("constant_is_outlier") == 1).count()
    assert cflag == 0


def test_zscore_matches_pandas_ddof1(spark):
    from feature_engineering_tk_spark.transforms.outliers import OutlierDetector

    pdf = pd.DataFrame({"values": [1, 2, 3, 4, 5, 100]})
    df = spark.createDataFrame(pdf)
    det = OutlierDetector(method="zscore", threshold=3.0).fit(df, ["values"])
    n_flagged = det.flag(df).filter(F.col("values_is_outlier") == 1).count()
    z = (pdf["values"] - pdf["values"].mean()).abs() / pdf["values"].std(ddof=1)
    assert n_flagged == int((z > 3.0).sum())


# -- target analyzer frames (test_target_analyzer.py:14-35) ----------------

@pytest.fixture(scope="module")
def clf_frame(spark):
    rng = np.random.RandomState(42)
    pdf = pd.DataFrame(
        {
            "feature1": rng.randn(1000),
            "feature2": rng.randn(1000),
            "feature3": rng.choice(["A", "B", "C"], 1000),
            "target": rng.choice([0, 1], 1000, p=[0.7, 0.3]),
        }
    )
    return pdf, spark.createDataFrame(pdf)


def test_detect_task_classification(clf_frame):
    from feature_engineering_tk_spark.analysis.target import detect_task

    pdf, df = clf_frame
    assert detect_task(df, "target") == "classification"


def test_class_distribution_and_imbalance(clf_frame):
    from feature_engineering_tk_spark.analysis.target import TargetAnalyzer

    pdf, df = clf_frame
    ta = TargetAnalyzer(df, "target")
    dist = {d["class"]: d["count"] for d in ta.analyze_class_distribution()}
    expected = pdf["target"].value_counts().to_dict()
    assert dist == {k: v for k, v in expected.items()}
    info = ta.get_class_imbalance_info()
    assert math.isclose(info["ratio"], max(expected.values()) / min(expected.values()))


def test_anova_f_matches_closed_form(clf_frame):
    from feature_engineering_tk_spark.analysis import stats as ST

    pdf, df = clf_frame
    groups = ST.group_moments(df, "feature1", "target")
    res = ST.anova_f_from_groups(groups)
    # closed form from pandas group moments
    gs = [g["feature1"].to_numpy() for _, g in pdf.groupby("target")]
    k, N = len(gs), len(pdf)
    grand = pdf["feature1"].mean()
    ssb = sum(len(g) * (g.mean() - grand) ** 2 for g in gs)
    ssw = sum(((g - g.mean()) ** 2).sum() for g in gs)
    F_expected = (ssb / (k - 1)) / (ssw / (N - k))
    assert math.isclose(res["F"], F_expected, rel_tol=1e-9)
    assert 0.0 <= res["pvalue"] <= 1.0


def test_regression_frame_pearson_parity(spark):
    from feature_engineering_tk_spark.analysis.target import TargetAnalyzer, detect_task

    rng = np.random.RandomState(42)
    x1, x2 = rng.randn(1000), rng.randn(1000)
    pdf = pd.DataFrame(
        {
            "feature1": x1,
            "feature2": x2,
            "target": 2.0 * x1 + 0.5 * x2 + rng.randn(1000) * 0.1,
        }
    )
    df = spark.createDataFrame(pdf)
    assert detect_task(df, "target") == "regression"
    corr = {
        d["feature"]: d["pearson"]
        for d in TargetAnalyzer(df, "target").analyze_feature_correlations(
            ["feature1", "feature2"]
        )
    }
    assert math.isclose(corr["feature1"], pdf["feature1"].corr(pdf["target"]), rel_tol=1e-9)
    assert math.isclose(corr["feature2"], pdf["feature2"].corr(pdf["target"]), rel_tol=1e-9)

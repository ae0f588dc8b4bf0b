"""Regression evaluation, Krippendorff's alpha, MAD outliers,
temporal embargo split, HLL approx-distinct."""

import math

import pytest

from feature_engineering_tk_spark.analysis.agreement import krippendorff_alpha
from feature_engineering_tk_spark.analysis.regression import (
    regression_metrics,
    residual_quantiles,
)
from feature_engineering_tk_spark.exceptions import InsufficientDataError
from feature_engineering_tk_spark.operators.frequency import (
    approx_distinct,
    distinct_sketch_table,
    merge_distinct_sketches,
)
from feature_engineering_tk_spark.operators.sampling import temporal_split
from feature_engineering_tk_spark.transforms.outliers import OutlierDetector


def test_regression_metrics_exact(spark):
    # pred = y + e with known errors: e = [1, -1, 2, 0]
    rows = [(3.0, 2.0), (1.0, 2.0), (8.0, 6.0), (4.0, 4.0)]
    df = spark.createDataFrame(rows, "pred double, y double")
    r = regression_metrics(df, "pred", "y").first()
    assert r["n"] == 4
    assert r["mae"] == pytest.approx(1.0)
    assert r["rmse"] == pytest.approx(math.sqrt(6 / 4))
    assert r["mean_error"] == pytest.approx(0.5)
    # SST: y=[2,2,6,4], mean 3.5 -> 3*2.25 + 6.25 = 13  (2.25+2.25+6.25+0.25)
    assert r["r2"] == pytest.approx(1 - 6 / 11.0)
    # mape over all 4 (no zero targets): (1/2 + 1/2 + 2/6 + 0)/4
    assert r["n_mape"] == 4
    assert r["mape"] == pytest.approx((0.5 + 0.5 + 2 / 6) / 4)


def test_regression_metrics_degenerate(spark):
    # constant target -> SST = 0 -> r2 NULL; zero target excluded from mape
    df = spark.createDataFrame([(1.0, 5.0), (2.0, 5.0)], "pred double, y double")
    r = regression_metrics(df, "pred", "y").first()
    assert r["r2"] is None
    df0 = spark.createDataFrame([(1.0, 0.0), (3.0, 2.0)], "pred double, y double")
    r0 = regression_metrics(df0, "pred", "y").first()
    assert r0["n_mape"] == 1 and r0["mape"] == pytest.approx(0.5)
    empty = df.where("pred > 100")
    with pytest.raises(InsufficientDataError):
        regression_metrics(empty, "pred", "y")


def test_residual_quantiles(spark):
    df = spark.createDataFrame(
        [(float(i), 0.0) for i in range(1, 6)], "pred double, y double"
    )
    out = {r["p"]: r["error_q"] for r in residual_quantiles(df, "pred", "y").collect()}
    assert out[0.5] == pytest.approx(3.0)
    assert out[0.25] == pytest.approx(2.0)  # linear-interp quantile of 1..5


def test_krippendorff_alpha_known(spark):
    # hand-computed: items {1: xx, 2: xy, 3: yyy, 4: x(dropped)}
    rows = [
        (1, "a", "x"), (1, "b", "x"),
        (2, "a", "x"), (2, "b", "y"),
        (3, "a", "y"), (3, "b", "y"), (3, "c", "y"),
        (4, "a", "x"),
    ]
    df = spark.createDataFrame(rows, "item_id int, rater_id string, label string")
    r = krippendorff_alpha(df).first()
    assert (r["n_pairable"], r["n_items"]) == (7, 3)
    assert r["alpha"] == pytest.approx(0.5)
    assert r["d_o"] == pytest.approx(2 / 7)
    assert r["d_e"] == pytest.approx(24 / 42)


def test_krippendorff_alpha_edges(spark):
    # perfect agreement -> 1.0
    rows = [(i, r, "same") for i in range(3) for r in "ab"]
    df = spark.createDataFrame(rows, "item_id int, rater_id string, label string")
    # one label in the whole table -> d_e = 0 -> degenerate 0.0 convention
    assert krippendorff_alpha(df).first()["alpha"] == 0.0
    rows = [(0, "a", "x"), (0, "b", "x"), (1, "a", "y"), (1, "b", "y")]
    df = spark.createDataFrame(rows, "item_id int, rater_id string, label string")
    assert krippendorff_alpha(df).first()["alpha"] == pytest.approx(1.0)
    # nothing pairable
    solo = spark.createDataFrame(
        [(0, "a", "x"), (1, "b", "y")], "item_id int, rater_id string, label string"
    )
    with pytest.raises(InsufficientDataError):
        krippendorff_alpha(solo)
    # duplicate rating by one rater resolves to MIN label, not two votes
    dup = spark.createDataFrame(
        [(0, "a", "y"), (0, "a", "x"), (0, "b", "x"), (1, "a", "y"), (1, "b", "y")],
        "item_id int, rater_id string, label string",
    )
    r = krippendorff_alpha(dup).first()
    assert r["n_pairable"] == 4  # the duplicate collapsed to one rating
    assert r["alpha"] == pytest.approx(1.0)


def test_mad_outliers(spark):
    vals = [10.0] * 5 + [11.0, 9.0, 12.0, 8.0, 1000.0]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    det = OutlierDetector(method="mad", threshold=2.0).fit(df, ["x"])
    b = det.state_["bounds"]["x"]
    # median 10, MAD = median(|x-10|) = 0.5 -> fence 10 ± 2*1.4826*0.5
    assert b["lo"] == pytest.approx(10 - 2 * 1.4826 * 0.5)
    assert b["hi"] == pytest.approx(10 + 2 * 1.4826 * 0.5)
    flagged = det.flag(df, ["x"])
    n_out = flagged.where("x_is_outlier = 1").count()
    assert n_out == 3  # 12, 8, 1000 outside ±1.4826 of 10; 11, 9 inside
    # zero-MAD column never flags (constant-majority convention)
    const = spark.createDataFrame([(5.0,)] * 6 + [(9.0,)], "x double")
    det2 = OutlierDetector(method="mad").fit(const, ["x"])
    assert det2.state_["bounds"]["x"] is None
    assert det2.flag(const, ["x"]).where("x_is_outlier = 1").count() == 0


def test_temporal_split(spark):
    rows = [(f"2024-01-{d:02d} 12:00:00",) for d in range(1, 31)]
    df = spark.createDataFrame(rows, "ts string").withColumn(
        "ts", __import__("pyspark.sql.functions", fromlist=["col"]).col("ts").cast("timestamp")
    )
    out = temporal_split(df, "ts", "2024-01-20", "2024-01-26", embargo_seconds=2 * 86400)
    got = {r["split"]: r["count"] for r in out.groupBy("split").count().collect()}
    # train: 1-17 (18,19 embargo before val cut); val: 20-23 (24,25 embargo); test: 26-30
    assert got == {"train": 17, "embargo": 4, "val": 4, "test": 5}
    assert out.count() == 30  # tagged, never dropped
    with pytest.raises(ValueError):
        temporal_split(df, "ts", "2024-01-20", "2024-01-26", embargo_seconds=-1)


def test_approx_distinct_and_sketches(spark):
    from pyspark.sql import functions as F

    df = spark.range(0, 20000).select(
        (F.col("id") % 7).cast("string").alias("grp"),
        (F.col("id") % 1357).cast("string").alias("uid"),
    )
    gauge = approx_distinct(df, "uid", by="grp", check_rel_error=0.05)
    rows = gauge.collect()
    assert len(rows) == 7 and all(r["within_tol"] for r in rows)
    # mergeable: per-group sketches union to the global estimate
    sk = distinct_sketch_table(df, "uid", "grp")
    merged = merge_distinct_sketches(sk).first()["n_distinct_approx"]
    direct = approx_distinct(df, "uid").first()["n_distinct_approx"]
    assert merged == direct  # HLL union is lossless vs single-pass
    assert abs(merged - 1357) / 1357 < 0.05


def test_temporal_split_guards(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame([("2024-01-10",), (None,)], "ts string").select(
        F.col("ts").cast("timestamp").alias("ts")
    )
    out = temporal_split(df, "ts", "2024-01-15", "2024-01-25")
    got = {r["split"] for r in out.collect()}
    assert got == {"train", "unknown"}  # NULL ts never defaults into train
    with pytest.raises(ValueError, match="precede"):
        temporal_split(df, "ts", "2024-03-01", "2024-02-01")
    with pytest.raises(ValueError, match="unparseable"):
        temporal_split(df, "ts", "not-a-time", "2024-02-01")


def test_temporal_split_cut_formats(spark):
    """Cuts the validator accepts must also be the cuts Spark applies:
    pandas-parsed datetimes ship as literals, so formats Spark's string
    cast rejects (e.g. US-style slashes) still split correctly."""
    from pyspark.sql import functions as F

    rows = [(f"2024-01-{d:02d} 12:00:00",) for d in (10, 22, 28)]
    df = spark.createDataFrame(rows, "ts string").select(
        F.col("ts").cast("timestamp").alias("ts")
    )
    out = temporal_split(df, "ts", "01/20/2024", "01/26/2024")
    got = {r["ts"].day: r["split"] for r in out.collect()}
    assert got == {10: "train", 22: "val", 28: "test"}

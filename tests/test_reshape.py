"""rolling_corr vs pandas rolling().corr(); melt/pivot_agg reshape."""

import math
import random

import pandas as pd
import pytest
from pyspark.sql import functions as F

from feature_engineering_tk_spark.exceptions import (
    ColumnNotFoundError,
    ValidationError,
)
from feature_engineering_tk_spark.operators.reshape import melt, pivot_agg
from feature_engineering_tk_spark.operators.window_features import rolling_corr


# ------------------------------------------------------------ rolling_corr


def _series_fixture(spark, seed=11, n_entities=4, n_rows=40):
    rng = random.Random(seed)
    rows = []
    for e in range(n_entities):
        for i in range(n_rows):
            x = None if rng.random() < 0.15 else round(rng.uniform(-5, 5), 3)
            y = round(rng.uniform(0, 10), 3)
            rows.append((f"c{e}", i, x, y))
    return rows, spark.createDataFrame(
        rows, "conv_id string, turn_idx int, x double, y double"
    )


def test_rolling_corr_matches_pandas(spark):
    rows, df = _series_fixture(spark)
    out = rolling_corr(df, "x", "y", window_rows=7, min_periods=3, out="rc")
    got = {
        (r.conv_id, r.turn_idx): r.rc
        for r in out.collect()
    }
    pdf = pd.DataFrame(rows, columns=["conv_id", "turn_idx", "x", "y"])
    for cid, g in pdf.groupby("conv_id"):
        g = g.sort_values("turn_idx")
        want = g["x"].rolling(7, min_periods=3).corr(g["y"])
        for t, w in zip(g["turn_idx"], want):
            gv = got[(cid, t)]
            if w is None or (isinstance(w, float) and math.isnan(w)):
                assert gv is None, (cid, t, gv)
            else:
                assert gv == pytest.approx(w, abs=1e-9), (cid, t)


def test_rolling_corr_constant_side_is_null(spark):
    df = spark.createDataFrame(
        [("c", i, 1.0, float(i)) for i in range(6)],
        "conv_id string, turn_idx int, x double, y double",
    )
    out = rolling_corr(df, "x", "y", window_rows=3, out="rc").collect()
    assert all(r.rc is None for r in out)


def test_rolling_corr_min_periods_gate(spark):
    df = spark.createDataFrame(
        [("c", i, float(i), float(i * i)) for i in range(5)],
        "conv_id string, turn_idx int, x double, y double",
    )
    out = {r.turn_idx: r.rc for r in
           rolling_corr(df, "x", "y", window_rows=4, min_periods=3, out="rc").collect()}
    assert out[0] is None and out[1] is None
    assert out[2] is not None


# -------------------------------------------------------------------- melt


def test_melt_long_shape_and_values(spark):
    df = spark.createDataFrame(
        [(1, 10.0, 100), (2, 20.0, 200)], "id int, a double, b int"
    )
    out = melt(df, ["id"], ["a", "b"]).collect()
    got = {(r.id, r.variable): r.value for r in out}
    assert got == {(1, "a"): 10.0, (1, "b"): 100.0, (2, "a"): 20.0, (2, "b"): 200.0}


def test_melt_defaults_to_all_non_id_columns(spark):
    df = spark.createDataFrame([(1, 2.0, 3.0)], "id int, a double, b double")
    assert melt(df, ["id"]).count() == 2


def test_melt_missing_column_raises(spark):
    df = spark.createDataFrame([(1, 2.0)], "id int, a double")
    with pytest.raises(ColumnNotFoundError):
        melt(df, ["id"], ["nope"])


# --------------------------------------------------------------- pivot_agg


def test_pivot_agg_sorted_columns_and_fill(spark):
    df = spark.createDataFrame(
        [(1, "b", 2.0), (1, "a", 1.0), (2, "a", 5.0), (2, "a", 7.0)],
        "id int, cat string, v double",
    )
    out = pivot_agg(df, ["id"], "cat", "v", func="sum", fill=0.0)
    assert out.columns == ["id", "v_sum_a", "v_sum_b"]
    rows = {r.id: (r.v_sum_a, r.v_sum_b) for r in out.collect()}
    assert rows == {1: (1.0, 2.0), 2: (12.0, 0.0)}


def test_pivot_agg_explicit_categories_and_sanitized_names(spark):
    df = spark.createDataFrame([(1, "x-y", 3.0)], "id int, cat string, v double")
    out = pivot_agg(df, ["id"], "cat", "v", categories=["x-y", "z"], fill=0.0)
    assert out.columns == ["id", "v_sum_x_y", "v_sum_z"]


def test_pivot_agg_cardinality_guard(spark):
    df = spark.createDataFrame(
        [(1, f"c{i}", 1.0) for i in range(12)], "id int, cat string, v double"
    )
    with pytest.raises(ValidationError):
        pivot_agg(df, ["id"], "cat", "v", max_categories=10)


def test_pivot_agg_mean_decimal_path(spark):
    df = spark.createDataFrame(
        [(1, "a", 1.10), (1, "a", 2.20)], "id int, cat string, v double"
    )
    out = pivot_agg(df, ["id"], "cat", "v", func="mean", decimal_scale=2).collect()[0]
    assert out.v_mean_a == pytest.approx(1.65)


# ------------------------------------------------------------ rolling_zscore


def test_rolling_zscore_matches_pandas_shifted(spark):
    import pandas as pd

    rows, df = _series_fixture(spark, seed=3, n_entities=3, n_rows=30)
    from feature_engineering_tk_spark.operators.window_features import rolling_zscore

    out = rolling_zscore(df, "x", window_rows=7, min_periods=3, out="z")
    got = {(r.conv_id, r.turn_idx): r.z for r in out.collect()}
    pdf = pd.DataFrame(rows, columns=["conv_id", "turn_idx", "x", "y"])
    for cid, g in pdf.groupby("conv_id"):
        g = g.sort_values("turn_idx")
        # trailing window EXCLUDING current row
        mean = g["x"].rolling(7, min_periods=3).mean().shift(1)
        std = g["x"].rolling(7, min_periods=3).std(ddof=1).shift(1)
        want = (g["x"] - mean) / std
        for t, w in zip(g["turn_idx"], want):
            gv = got[(cid, t)]
            if w is None or (isinstance(w, float) and math.isnan(w)):
                assert gv is None, (cid, t, gv)
            else:
                assert gv == pytest.approx(w, abs=1e-9), (cid, t)


def test_rolling_zscore_include_current(spark):
    df = spark.createDataFrame(
        [("c", 0, 1.0), ("c", 1, 2.0), ("c", 2, 3.0)],
        "conv_id string, turn_idx int, x double",
    )
    from feature_engineering_tk_spark.operators.window_features import rolling_zscore

    out = {r.turn_idx: r.z for r in
           rolling_zscore(df, "x", window_rows=3, include_current=True, out="z").collect()}
    # at turn 2: window = [1,2,3], mean 2, std 1 -> z = 1
    assert out[2] == pytest.approx(1.0)


def test_rolling_zscore_constant_window_is_null(spark):
    df = spark.createDataFrame(
        [("c", i, 5.0) for i in range(6)],
        "conv_id string, turn_idx int, x double",
    )
    from feature_engineering_tk_spark.operators.window_features import rolling_zscore

    out = rolling_zscore(df, "x", window_rows=4, out="z").collect()
    assert all(r.z is None for r in out)

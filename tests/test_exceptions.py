"""Typed-exception contract — reference ``exceptions.py:8-97`` and
``tests/test_exceptions.py`` semantics: same class names, same
attributes, same message fragments, raised from the same facade
trigger points."""

import pytest

from feature_engineering_tk_spark.api import DataPreprocessor, FeatureEngineer
from feature_engineering_tk_spark.exceptions import (
    ColumnNotFoundError,
    ConstantColumnError,
    EmptyDataFrameError,
    InsufficientDataError,
    InvalidMethodError,
    InvalidStrategyError,
    MLToolkitError,
    TransformerNotFittedError,
    ValidationError,
)


@pytest.fixture()
def sample_df(spark):
    return spark.createDataFrame(
        [(1, 10.0, "a"), (2, 20.0, "b"), (3, 30.0, "a"), (4, 40.0, "b")],
        "id int, x double, cat string",
    )


def test_invalid_strategy_error(sample_df):
    with pytest.raises(InvalidStrategyError) as exc_info:
        DataPreprocessor(sample_df).handle_missing_values(strategy="invalid_strategy")
    err = exc_info.value
    assert err.strategy == "invalid_strategy"
    assert "invalid_strategy" in str(err)
    assert "Valid strategies" in str(err)


def test_invalid_method_error_outliers(sample_df):
    with pytest.raises(InvalidMethodError) as exc_info:
        DataPreprocessor(sample_df).handle_outliers(columns=["x"], method="invalid_method")
    err = exc_info.value
    assert err.method == "invalid_method"
    assert "iqr" in str(err)
    assert "zscore" in str(err)


def test_invalid_method_error_scaling(sample_df):
    with pytest.raises(InvalidMethodError) as exc_info:
        FeatureEngineer(sample_df).scale_features(columns=["x"], method="invalid_scaler")
    err = exc_info.value
    assert err.method == "invalid_scaler"
    assert "standard" in str(err)
    assert "minmax" in str(err)


def test_transformer_not_fitted_error(sample_df, tmp_path):
    with pytest.raises(TransformerNotFittedError) as exc_info:
        FeatureEngineer(sample_df).save_transformers(str(tmp_path / "t.json"))
    err = exc_info.value
    assert "encoder or scaler" in str(err)
    assert "fitted" in str(err).lower()


def test_transform_before_fit_raises_typed(sample_df):
    from feature_engineering_tk_spark.transforms.scale import Scaler

    with pytest.raises(TransformerNotFittedError):
        Scaler().transform(sample_df)


def test_column_not_found_error(sample_df):
    with pytest.raises(ColumnNotFoundError) as exc_info:
        DataPreprocessor(sample_df).handle_missing_values(columns=["nope"])
    err = exc_info.value
    assert err.column_name == "nope"
    assert "nope" in str(err)
    assert "Available columns" in str(err)


def test_empty_dataframe_error(spark):
    from feature_engineering_tk_spark.transforms.scale import Scaler

    empty = spark.createDataFrame([], "x double")
    with pytest.raises(EmptyDataFrameError):
        Scaler().fit(empty, ["x"])


def test_constant_column_error(spark):
    from feature_engineering_tk_spark.transforms.binning import QuantileBinner

    const = spark.createDataFrame([(5.0,)] * 10, "x double")
    with pytest.raises(ConstantColumnError) as exc_info:
        QuantileBinner(bins=4).fit(const, "x")
    err = exc_info.value
    assert err.column_name == "x"
    assert "constant" in str(err)


def test_hierarchy_and_builtin_compat(sample_df):
    # every typed error is an MLToolkitError; validation errors keep
    # catching as ValueError so pre-typed callers don't break
    assert issubclass(InvalidStrategyError, ValidationError)
    assert issubclass(ValidationError, MLToolkitError)
    assert issubclass(ValidationError, ValueError)
    assert issubclass(TransformerNotFittedError, RuntimeError)
    assert issubclass(ConstantColumnError, ValidationError)
    with pytest.raises(ValueError):
        DataPreprocessor(sample_df).handle_missing_values(strategy="bogus")


def test_insufficient_data_error_shape():
    err = InsufficientDataError("t_test", required=3, actual=1)
    assert err.operation == "t_test"
    assert err.required == 3 and err.actual == 1
    assert "requires 3" in str(err)

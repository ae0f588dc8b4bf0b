"""Distributed exact quantiles vs numpy linear-interpolation oracle."""

import numpy as np

from feature_engineering_tk_spark.operators.quantiles import exact_quantiles


def test_exact_quantiles_match_numpy(spark, transcripts, transcripts_pdf):
    probs = [0.0, 0.1, 0.25, 0.5, 0.75, 0.9, 1.0]
    got = exact_quantiles(transcripts, "tokens", probs)
    exp = np.quantile(transcripts_pdf["tokens"].to_numpy(), probs)
    assert np.allclose(got, exp)


def test_exact_quantiles_with_nulls(spark, transcripts, transcripts_pdf):
    probs = [0.25, 0.5, 0.75]
    got = exact_quantiles(transcripts, "score", probs)
    exp = np.nanquantile(transcripts_pdf["score"].to_numpy(), probs)
    assert np.allclose(got, exp)


def test_exact_quantiles_tiny(spark):
    pdf = spark.createDataFrame([(float(i),) for i in range(5)], "x double")
    got = exact_quantiles(pdf, "x", [0.5, 0.9])
    assert np.allclose(got, np.quantile(np.arange(5.0), [0.5, 0.9]))

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


def test_approx_quantiles_bounded_error(spark, transcripts):
    """approx path (100 TB refit): rank error bounded; values land
    near the exact ones on a smooth column."""
    from feature_engineering_tk_spark.operators.quantiles import (
        approx_quantiles,
        exact_quantiles,
    )

    probs = [0.1, 0.5, 0.9]
    e = exact_quantiles(transcripts, "tokens", probs)
    a = approx_quantiles(transcripts, "tokens", probs, relative_error=1e-3)
    for x, y in zip(e, a):
        assert abs(x - y) <= max(abs(x), 1.0) * 0.05


def test_quantile_binner_approx_mode(spark, transcripts):
    """exact=False produces a usable binner whose code distribution is
    close to the exact one (rank-bounded edges)."""
    from pyspark.sql import functions as F

    from feature_engineering_tk_spark.transforms.binning import QuantileBinner

    exact = QuantileBinner(bins=4, exact=True).fit(transcripts, "tokens")
    approx = QuantileBinner(bins=4, exact=False).fit(transcripts, "tokens")
    n = transcripts.count()
    dist_e = {
        r["b"]: r["count"]
        for r in exact.transform(transcripts, out="b").groupBy("b").count().collect()
    }
    dist_a = {
        r["b"]: r["count"]
        for r in approx.transform(transcripts, out="b").groupBy("b").count().collect()
    }
    for code in dist_e:
        assert abs(dist_e[code] - dist_a.get(code, 0)) <= max(0.05 * n, 10)

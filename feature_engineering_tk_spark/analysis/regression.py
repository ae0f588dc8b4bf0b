"""Distributed regression-model evaluation at corpus scale.

The reference recommends regressors (`target_analyzer/suggestions.py`
"recommend_models" regression branch) but never scores one; the
engine's classifier family (analysis/classification.py) covers the
ranking side.  This module closes the regression side: reward-model
value heads, difficulty predictors, and length estimators that steer
a 100 TB pipeline are regressors, and their errors must be measured
on the corpus where the (prediction, target) table is billions of
rows.

- **regression_metrics** — ONE map-side-combined aggregation pass
  producing (n, mae, rmse, r2, mean_error, mape, n_mape).  Every
  statistic is a closed form over Σe, Σ|e|, Σe², Σy, Σy² partial
  sums, so the pass is a single HashAggregate pair and the result is
  reproducible on any engine modulo one final division per metric.
  MAPE excludes zero targets (division undefined); ``n_mape`` reports
  how many rows contributed so the exclusion is never silent.
- **residual_quantiles** — exact error quantiles (p05/p25/p50/p75/
  p95 by default) via the engine's distributed exact-percentile path
  (bit-identical to DuckDB ``quantile_cont``), for calibration-style
  error profiles where the mean hides the tails.

100 TB shape: regression_metrics never shuffles rows (aggregate
only); residual_quantiles inherits exact_quantiles' sort-free
percentile aggregation.  Nulls in either column are excluded (they
carry no error signal), mirroring the classifier family's convention.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from feature_engineering_tk_spark.exceptions import InsufficientDataError


def _paired(df: DataFrame, pred: str, target: str) -> DataFrame:
    p, y = F.col(pred), F.col(target)
    return df.where(p.isNotNull() & y.isNotNull()).select(
        p.cast("double").alias("_p"), y.cast("double").alias("_y")
    )


def regression_metrics(df: DataFrame, pred: str, target: str) -> DataFrame:
    """One-row (n, mae, rmse, r2, mean_error, mape, n_mape).

    r2 = 1 − SSE/SST with SST = Σ(y−ȳ)² computed as Σy² − (Σy)²/n —
    the one-pass identity, each factor cast to double before
    multiplying (bigint products of ~n-sized sums overflow at corpus
    scale).  SST = 0 (constant target) yields NULL r2, the SQL
    convention for an undefined score.  mean_error = Σ(p−y)/n keeps
    the sign (bias); mape averages |e|/|y| over the n_mape rows with
    y ≠ 0.
    """
    rows = _paired(df, pred, target)
    e = F.col("_p") - F.col("_y")
    # ONE corpus aggregation; the closed forms over the collected
    # partial sums run driver-side (the krippendorff_alpha pattern) so
    # the caller's action does not re-run the scan
    row = rows.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.abs(e)).alias("_sae"),
        F.sum(e * e).alias("_sse"),
        F.sum(e).alias("_se"),
        F.sum("_y").alias("_sy"),
        F.sum(F.col("_y") * F.col("_y")).alias("_syy"),
        F.sum(F.when(F.col("_y") != 0, F.abs(e) / F.abs(F.col("_y")))).alias("_sape"),
        F.sum((F.col("_y") != 0).cast("bigint")).alias("n_mape"),
    ).first()
    if not row or not row["n"]:
        raise InsufficientDataError(f"regression_metrics({pred!r}, {target!r})", 1, 0)
    import math

    n = int(row["n"])
    sst = row["_syy"] - row["_sy"] * row["_sy"] / n
    n_mape = int(row["n_mape"] or 0)
    out = (
        n,
        row["_sae"] / n,
        math.sqrt(row["_sse"] / n),
        (1.0 - row["_sse"] / sst) if sst > 0 else None,
        row["_se"] / n,
        (row["_sape"] / n_mape) if n_mape > 0 else None,
        n_mape,
    )
    return df.sparkSession.createDataFrame(
        [out],
        "n bigint, mae double, rmse double, r2 double, "
        "mean_error double, mape double, n_mape bigint",
    )


def residual_quantiles(
    df: DataFrame,
    pred: str,
    target: str,
    probs: list[float] = (0.05, 0.25, 0.5, 0.75, 0.95),
) -> DataFrame:
    """Exact quantiles of the signed error (pred − target): one row
    per requested probability, (p, error_q).  Uses the engine's exact
    distributed percentile (no sampling, no sketch) so the tail
    numbers are defensible in a data-quality report."""
    rows = _paired(df, pred, target).select((F.col("_p") - F.col("_y")).alias("_e"))
    if rows.isEmpty():
        raise InsufficientDataError(f"residual_quantiles({pred!r}, {target!r})", 1, 0)
    ps = [float(p) for p in probs]
    agg = rows.agg(
        *[F.percentile(F.col("_e"), F.lit(p)).alias(f"_q{i}") for i, p in enumerate(ps)]
    ).first()
    spark = df.sparkSession
    return spark.createDataFrame(
        [(p, float(agg[f"_q{i}"])) for i, p in enumerate(ps)],
        "p double, error_q double",
    )

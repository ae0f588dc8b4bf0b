"""Distributed logistic regression — the TRAINER for the quality
filters the pipeline otherwise only scores.

The reference recommends LogisticRegression (`target_analyzer/
suggestions.py` recommend_models classification branch) but never
trains one; the engine's nb_classify (functions/text.py) broadcasts a
*pre-trained* Naive-Bayes model.  This module closes the training
side for tabular features (quality scores, length stats, drift
gauges): a CCNet/fastText-style binary quality filter is, at its
core, a logistic regression over a few dozen engineered features, and
at 10^12 rows the (X, y) table cannot leave the cluster.

**Algorithm**: Newton / IRLS with L2.  Per iteration ONE aggregation
pass computes the gradient g = Σ (y − p)·x and the Hessian
H = Σ p(1−p)·x xᵀ + λI as d + d(d+1)/2 sufficient statistics; the
driver solves the d×d system (numpy, d ≤ 64 guarded) and broadcasts
the new β as plan literals.  n_iter is fixed — no data-dependent
stopping, so the job graph is static and resumable.

**Bit-determinism**: every per-row term is rounded to ``term_dp``
decimals and accumulated as ``decimal(38, term_dp)`` — decimal sums
are EXACT integer arithmetic, so the gradient and Hessian are
identical under any partition layout or summation order (the
pagerank/bradley_terry integer-fixed-point discipline applied to
IRLS).  Given identical sufficient statistics, the driver-side solve
is a fixed numpy routine — the whole training run is reproducible to
the last bit across cluster sizes.

100 TB shape: per iteration one map-side-combined HashAggregate pair
over the scan — zero shuffle of rows, O(d²) cells per partition to
the driver; scoring is a row-local codegen expression (no UDF, no
model table join).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, functions as F

from feature_engineering_tk_spark.exceptions import (
    ColumnNotFoundError,
    InsufficientDataError,
    ValidationError,
)


def _dot(features: list[str], beta: list[float], intercept: float) -> Column:
    acc: Column = F.lit(float(intercept))
    for f, b in zip(features, beta):
        acc = acc + F.col(f).cast("double") * F.lit(float(b))
    return acc


def logreg_score(
    df: DataFrame,
    features: list[str],
    model: dict,
    out: str = "p",
) -> DataFrame:
    """Attach P(y=1 | x) = sigmoid(β₀ + β·x) as a row-local codegen
    expression — the model ships as plan literals, never as data."""
    for f in features:
        if f not in df.columns:
            raise ColumnNotFoundError(f, df.columns)
    eta = _dot(features, model["beta"], model["intercept"])
    return df.withColumn(out, F.lit(1.0) / (F.lit(1.0) + F.exp(-eta)))


def logreg_train(
    df: DataFrame,
    features: list[str],
    label: str,
    l2: float = 1e-3,
    n_iter: int = 8,
    term_dp: int = 12,
    checkpoint: bool = True,
) -> dict:
    """Fit binary logistic regression by IRLS; returns
    ``{"intercept", "beta", "n", "n_pos", "log_loss", "n_iter"}``.

    Rows with any null feature or null label are excluded.  ``label``
    must be 0/1 (cast to double).  Raises InsufficientDataError when
    fewer than d+1 rows survive filtering, ValidationError when only a
    single class survives (a count that can be large — not a data-
    volume problem, so it gets its own diagnosis).
    """
    import numpy as np

    d = len(features)
    if d == 0:
        raise ValueError("need at least one feature")
    if d > 64:
        raise ValueError(
            f"{d} features: the dense d^2 Hessian pass is built for small "
            "engineered-feature sets (<= 64); reduce or bucket features"
        )
    for f in [*features, label]:
        if f not in df.columns:
            raise ColumnNotFoundError(f, df.columns)

    cond = F.col(label).isNotNull()
    for f in features:
        cond = cond & F.col(f).isNotNull()
    base = df.where(cond).select(
        F.col(label).cast("double").alias("_y"),
        *[
            F.col(name).cast("double").alias(f"_x{j}")
            for j, name in enumerate(features)
        ],
    )
    # The projected (y, x) table is rescanned once per IRLS iteration
    # (correct at scale — n·d doubles never fit on one node), but the
    # lineage ABOVE it (joins, feature engineering) must not be
    # re-executed n_iter+1 times: truncate it once, lazily, so the
    # first action materializes the projection to local executor
    # storage and every later pass reads the checkpoint.
    if checkpoint:
        base = base.localCheckpoint(eager=False)

    counts = base.agg(
        F.count(F.lit(1)).alias("n"), F.sum("_y").alias("pos")
    ).first()
    n, n_pos = int(counts["n"]), int(counts["pos"] or 0)
    if n < d + 1:
        raise InsufficientDataError("logreg_train", required=d + 1, actual=n)
    if n_pos == 0 or n_pos == n:
        raise ValidationError(
            f"logreg_train: label {label!r} has a single class after "
            f"null filtering (n={n}, positives={n_pos}); a binary "
            "logistic regression needs both classes present"
        )

    dec = f"decimal(38,{term_dp})"

    def _acc(c: Column) -> Column:
        # exact, order-free accumulation of rounded per-row terms
        return F.sum(F.round(c, term_dp).cast(dec)).cast("double")

    xs = [F.col(f"_x{j}") for j in range(d)]
    beta = [0.0] * d
    intercept = math.log(n_pos / (n - n_pos))  # log-odds init

    log_loss = None
    for _ in range(n_iter):
        eta = _dot([f"_x{j}" for j in range(d)], beta, intercept)
        p = F.lit(1.0) / (F.lit(1.0) + F.exp(-eta))
        w = p * (F.lit(1.0) - p)
        resid = F.col("_y") - p

        aggs = [_acc(resid).alias("g0")]
        aggs += [_acc(resid * xs[j]).alias(f"g{j + 1}") for j in range(d)]
        aggs.append(_acc(w).alias("h_0_0"))
        for j in range(d):
            aggs.append(_acc(w * xs[j]).alias(f"h_0_{j + 1}"))
            for k in range(j, d):
                aggs.append(_acc(w * xs[j] * xs[k]).alias(f"h_{j + 1}_{k + 1}"))
        ll = -(
            F.col("_y") * F.log(F.greatest(p, F.lit(1e-15)))
            + (F.lit(1.0) - F.col("_y"))
            * F.log(F.greatest(F.lit(1.0) - p, F.lit(1e-15)))
        )
        aggs.append(_acc(ll).alias("ll"))
        row = base.agg(*aggs).first()

        g = np.zeros(d + 1)
        H = np.zeros((d + 1, d + 1))
        g[0] = row["g0"]
        for j in range(d):
            g[j + 1] = row[f"g{j + 1}"] - l2 * beta[j]
        H[0, 0] = row["h_0_0"]
        for j in range(d):
            H[0, j + 1] = H[j + 1, 0] = row[f"h_0_{j + 1}"]
            for k in range(j, d):
                v = row[f"h_{j + 1}_{k + 1}"]
                H[j + 1, k + 1] = H[k + 1, j + 1] = v
        H[1:, 1:] += l2 * np.eye(d)
        step = np.linalg.solve(H, g)
        intercept += float(step[0])
        beta = [float(b + s) for b, s in zip(beta, step[1:])]
        log_loss = float(row["ll"]) / n

    return {
        "intercept": intercept,
        "beta": beta,
        "n": n,
        "n_pos": n_pos,
        "log_loss": log_loss,
        "n_iter": n_iter,
    }

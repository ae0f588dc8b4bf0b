"""Embedding-matrix statistics: one-pass covariance and PCA.

The distributed shape is the RowMatrix/treeAggregate pattern from the
published MLlib sources, re-expressed over Arrow batches: each
``mapInPandas`` batch reduces its vectors to the d(d+3)/2+1 sufficient
statistics (count, per-dim sums, upper-triangle outer-product sums) as
**numpy matmuls**, so 10^12 × d values become ~2k doubles per batch
before anything shuffles; a map-side-combined ``groupBy`` finishes the
reduction.  Eigendecomposition happens on the driver on the d×d
matrix (d is small by construction — this is the sufficient-statistics
driver-math pattern of analysis/stats.py), and the projection back
over the corpus is a shuffle-free fold expression like
clustering.assign_clusters.

Covariance is sample covariance (ddof=1), matching pandas
``DataFrame.cov`` — the reference toolkit's correlation analysis
convention (``data_analysis.py`` corr paths).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def embedding_moments(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Sufficient statistics of the embedding matrix as a tiny keyed
    table: (i, j, s) with s = Σ x_i·x_j for 0 ≤ i ≤ j, (-1, j) = Σ x_j,
    and (-2, -2) = row count. One corpus scan; each Arrow batch emits
    d(d+1)/2 + d + 1 rows regardless of batch size."""
    src = df.where(F.col(vec_col).isNotNull()).select(
        F.col(vec_col).cast("array<double>").alias("v")
    )

    def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.asarray(pdf["v"].tolist(), dtype=np.float64)
            d = x.shape[1]
            outer = x.T @ x
            iu, ju = np.triu_indices(d)
            yield pd.DataFrame(
                {
                    "i": np.concatenate([iu, np.full(d, -1), [-2]]).astype("int32"),
                    "j": np.concatenate([ju, np.arange(d), [-2]]).astype("int32"),
                    "s": np.concatenate([outer[iu, ju], x.sum(axis=0), [float(len(x))]]),
                }
            )

    parts = src.mapInPandas(partials, "i int, j int, s double")
    return parts.groupBy("i", "j").agg(F.sum("s").alias("s"))


def covariance_stats(df: DataFrame, vec_col: str = "embedding"):
    """Collect the moments table → (n, mean vector, sample covariance
    matrix) as numpy on the driver (d² doubles, aggregate-sized)."""
    rows = embedding_moments(df, vec_col).collect()
    n = next((r["s"] for r in rows if r["i"] == -2), 0)
    if n < 2:
        from feature_engineering_tk_spark.exceptions import InsufficientDataError

        raise InsufficientDataError("covariance_stats", required=2, actual=int(n))
    d = max(r["j"] for r in rows) + 1
    sx = np.zeros(d)
    sxy = np.zeros((d, d))
    for r in rows:
        if r["i"] == -1:
            sx[r["j"]] = r["s"]
        elif r["i"] >= 0:
            sxy[r["i"], r["j"]] = r["s"]
            sxy[r["j"], r["i"]] = r["s"]
    mean = sx / n
    cov = (sxy - n * np.outer(mean, mean)) / (n - 1)
    return int(n), mean, cov


def covariance_table(
    spark: SparkSession, df: DataFrame, vec_col: str = "embedding", decimals: int = 6
) -> DataFrame:
    """The upper-triangle sample covariance as (i, j, cov) rows —
    rounded so the one order-dependent float reduction (batch sums) is
    pinned below the rounding grid on any engine/partitioning."""
    _n, _mean, cov = covariance_stats(df, vec_col)
    d = cov.shape[0]
    iu, ju = np.triu_indices(d)
    return spark.createDataFrame(
        [(int(a), int(b), float(round(cov[a, b], decimals))) for a, b in zip(iu, ju)],
        "i int, j int, cov double",
    )


def pca_components(df: DataFrame, vec_col: str = "embedding", k: int = 8):
    """Top-k principal components via driver ``eigh`` on the one-pass
    covariance. Sign-fixed deterministically (largest-|loading|
    element made positive). Returns (mean, components[k, d],
    explained_variance[k])."""
    _n, mean, cov = covariance_stats(df, vec_col)
    vals, vecs = np.linalg.eigh(cov)
    order = np.argsort(vals)[::-1][:k]
    comps = vecs[:, order].T
    for row in comps:
        pivot = np.argmax(np.abs(row))
        if row[pivot] < 0:
            row *= -1
    return mean, comps, vals[order]


def pca_project(
    df: DataFrame,
    mean: np.ndarray,
    components: np.ndarray,
    vec_col: str = "embedding",
    prefix: str = "pc",
) -> DataFrame:
    """Shuffle-free projection: each component score is a sequential
    fold dot of (x - mean) with a literal component vector."""
    centered = F.zip_with(
        F.col(vec_col).cast("array<double>"),
        F.array(*[F.lit(float(m)) for m in mean]),
        lambda x, m: x - m,
    )

    def score(comp: np.ndarray) -> Column:
        return F.aggregate(
            F.zip_with(
                centered,
                F.array(*[F.lit(float(c)) for c in comp]),
                lambda x, c: x * c,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    return df.withColumns({f"{prefix}{idx}": score(c) for idx, c in enumerate(components)})


def mean_pool(
    df: DataFrame,
    group_col: str,
    vec_col: str = "embedding",
    out: str = "mean_vec",
) -> DataFrame:
    """Element-wise mean of embedding vectors per group — turn
    embeddings → conversation embedding, doc embeddings → cluster
    centroid (the standard pooling before conversation-level
    SemDeDup / ANN).

    Scale shape: ``posexplode`` → ``groupBy(group, position)`` with
    map-side partial sums, so the shuffle carries (groups × dim)
    partials rather than vectors; the dim-sized per-group lists are
    reassembled in a second (groups × dim)-row aggregation.  NULL
    vectors are skipped (posexplode emits nothing); all vectors in a
    group must share one dimensionality.
    """
    exploded = df.select(
        F.col(group_col), F.posexplode(F.col(vec_col)).alias("_p", "_v")
    )
    means = exploded.groupBy(group_col, "_p").agg(
        F.avg(F.col("_v").cast("double")).alias("_m")
    )
    return means.groupBy(group_col).agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct(F.col("_p"), F.col("_m")))),
            lambda x: x["_m"],
        ).alias(out)
    )

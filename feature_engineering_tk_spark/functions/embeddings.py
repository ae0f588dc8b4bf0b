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


def embedding_shift(
    a: DataFrame,
    b: DataFrame,
    vec_col: str = "embedding",
    decimals: int = 6,
) -> DataFrame:
    """Embedding-space distribution shift between two snapshots — the
    drift family's (analysis/drift.py) semantic sibling: compare the
    per-dimension MEAN vectors of corpus ``a`` and corpus ``b`` and
    report one scalar row ``(dim, n_a, n_b, mean_l2_shift,
    mean_cosine)``.  A retrieval corpus whose centroid moved (crawler
    regression, domain mix change) shows up here before any
    per-column PSI can see it.

    Determinism: per-dim means are rounded to ``decimals`` BEFORE the
    distance algebra (the covariance_stats convention — batch-sum
    float noise sits far below the rounding grid), and the final
    scalars are rounded again, so the result is engine- and
    partitioning-stable.

    Scale shape: each side is one ``posexplode`` → ``groupBy(dim)``
    with map-side partial sums — the shuffle carries dim-bounded
    partials, never vectors; the comparison joins two dim-sized
    tables and reduces to one row.
    """

    def dim_means(df: DataFrame, mcol: str, ncol: str) -> DataFrame:
        ex = df.select(F.posexplode(F.col(vec_col)).alias("_p", "_v"))
        return ex.groupBy("_p").agg(
            F.round(F.avg(F.col("_v").cast("double")), decimals).alias(mcol),
            F.count(F.lit(1)).alias(ncol),
        )

    ma = dim_means(a, "_ma", "_na")
    mb = dim_means(b, "_mb", "_nb")
    j = ma.join(mb, "_p")
    agg = j.agg(
        F.count(F.lit(1)).alias("dim"),
        F.max("_na").alias("n_a"),
        F.max("_nb").alias("n_b"),
        F.sum(F.pow(F.col("_ma") - F.col("_mb"), 2)).alias("_d2"),
        F.sum(F.col("_ma") * F.col("_mb")).alias("_dot"),
        F.sum(F.col("_ma") * F.col("_ma")).alias("_sa"),
        F.sum(F.col("_mb") * F.col("_mb")).alias("_sb"),
    )
    return agg.select(
        "dim",
        "n_a",
        "n_b",
        F.round(F.sqrt("_d2"), decimals).alias("mean_l2_shift"),
        F.when(
            (F.col("_sa") > 0) & (F.col("_sb") > 0),
            F.round(
                F.col("_dot") / (F.sqrt("_sa") * F.sqrt("_sb")), decimals
            ),
        ).alias("mean_cosine"),
    )


def adjacent_similarity(
    df: DataFrame,
    vec_col: str = "embedding",
    order: list | None = None,
    by: str | None = None,
    threshold: float | None = None,
    decimals: int = 6,
) -> DataFrame:
    """Cosine similarity between each row's embedding and the PREVIOUS
    row's in ``order`` — the topic-segmentation primitive for
    transcripts (TextTiling, Hearst 1997, with embeddings in place of
    word counts): a turn whose embedding turns away from its
    predecessor marks a topic boundary.

    Appends ``prev_cosine`` (NULL on each group's first row or when
    either vector has zero norm) and, when ``threshold`` is given,
    ``is_boundary`` (true iff ``prev_cosine`` is non-NULL and below
    the threshold — first rows are starts, not boundaries).

    Scale shape: ONE window over ``partitionBy(by)`` (a conversation
    never spans partitions; pass ``by=None`` only for toy sequences —
    it degrades to a single-partition sort); the lag carries the
    d-float array once, and the dot/norm folds are row-local
    ``zip_with``/``aggregate`` expressions matching similarity.py's
    left-to-right summation, rounded to ``decimals`` (the repo's
    cross-engine float convention).
    """
    from pyspark.sql import Window

    from feature_engineering_tk_spark.functions.similarity import dot, l2_norm

    order = order or ["vec_id"]
    w = (Window.partitionBy(by) if by else Window.partitionBy()).orderBy(*order)
    prev = F.lag(F.col(vec_col)).over(w)
    out = df.withColumn("_prev", prev)
    cur_c, prev_c = F.col(vec_col), F.col("_prev")
    denom = l2_norm(cur_c) * l2_norm(prev_c)
    cos = F.when(
        prev_c.isNotNull() & (denom > 0),
        F.round(dot(cur_c, prev_c) / denom, decimals),
    )
    out = out.withColumn("prev_cosine", cos).drop("_prev")
    if threshold is not None:
        out = out.withColumn(
            "is_boundary",
            F.coalesce(F.col("prev_cosine") < F.lit(float(threshold)), F.lit(False)),
        )
    return out


def topic_segments(
    df: DataFrame,
    vec_col: str = "embedding",
    order: list | None = None,
    by: str | None = None,
    threshold: float = 0.5,
    decimals: int = 6,
) -> DataFrame:
    """Topic segmentation over an ordered embedding sequence — the
    completion of :func:`adjacent_similarity`'s TextTiling primitive:
    appends ``prev_cosine``, ``is_boundary`` AND a 0-based
    ``segment_id`` (cumulative boundary count per group), so
    downstream chunking / per-topic rollups can group directly.

    A turn whose embedding's cosine to its predecessor drops below
    ``threshold`` starts a new segment; each group's first row starts
    segment 0.  Use for conversation chunking at topic boundaries
    (RAG windows that don't straddle topics) or long-document
    section splits.

    Scale shape: the boundary flags and the running sum share the ONE
    ``partitionBy(by)`` window exchange — no second shuffle; the
    running count is an integer cumsum, deterministic wherever the
    rounded cosines are (the adjacent_similarity convention).
    """
    from pyspark.sql import Window

    order = order or ["vec_id"]
    flagged = adjacent_similarity(
        df, vec_col=vec_col, order=order, by=by,
        threshold=threshold, decimals=decimals,
    )
    w = (Window.partitionBy(by) if by else Window.partitionBy()).orderBy(
        *order
    ).rowsBetween(Window.unboundedPreceding, 0)
    return flagged.withColumn(
        "segment_id", F.sum(F.col("is_boundary").cast("int")).over(w)
    )

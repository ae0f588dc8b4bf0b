"""Distributed Lloyd's k-means over embedding columns.

The centroid refinement loop behind IVF index building and
SemDeDup-style cluster-then-dedup (functions/similarity.py seeds its
IVF cells with fixed smallest-id vectors; this module is the real
Lloyd iteration that upgrades them).  Designed for the 100 TB shape:

- **assignment is a pure column expression** — the k centroids are a
  driver-side literal (k·d doubles), the argmin is ``array_min`` over
  per-centroid squared-L2 structs, so assigning 10^12 vectors is one
  codegen'd scan with ZERO shuffle;
- **re-estimation is a partial aggregate** — ``posexplode`` of vector
  dims feeds a map-side-combined ``groupBy(cluster, dim)`` so only
  ``k·d`` partial sums per partition cross the wire, never vectors;
- **cross-engine determinism** — distances are sequential left folds
  (bit-identical to DuckDB ``list_reduce``), centroid means are
  rounded to ``round_decimals`` each iteration so the one
  order-dependent float reduction (the mean's sum) is pinned below
  the rounding grid on any engine/partitioning; ties argmin to the
  smallest centroid id.  Same rounding trick as ccnet_buckets.

Empty clusters keep their previous centroid (standard Lloyd
fallback), so k never shrinks mid-run.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _sq_dist(vec: Column, centroid: list[float]) -> Column:
    """Squared L2 distance as a sequential left fold — the oracle
    replays it element-for-element with list_reduce."""
    cvec = F.array(*[F.lit(float(v)) for v in centroid])
    return F.aggregate(
        F.zip_with(vec, cvec, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def assign_clusters(
    df: DataFrame,
    centroids: list[tuple[int, list[float]]],
    vec_col: str = "embedding",
    out: str = "cluster_id",
    dist_out: str = "sq_dist",
) -> DataFrame:
    """Nearest-centroid assignment as one shuffle-free expression:
    array_min over (dist², centroid_id) structs = lexicographic argmin
    (ties → smallest id)."""
    vec = F.col(vec_col).cast("array<double>")
    best = F.array_min(
        F.array(
            *[
                F.struct(_sq_dist(vec, cvec).alias("d"), F.lit(int(cid)).alias("c"))
                for cid, cvec in centroids
            ]
        )
    )
    return df.withColumn(out, best["c"]).withColumn(dist_out, best["d"])


def kmeans(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 8,
    n_iter: int = 4,
    round_decimals: int = 9,
) -> tuple[DataFrame, list[tuple[int, list[float]]]]:
    """Lloyd's k-means; returns (assigned_df, final_centroids).

    Deterministic init: the ``k`` smallest-``id_col`` vectors (same
    convention as similarity.ivf_topk — swap in
    ``pyspark.ml.clustering.KMeans(seed=...)`` centroids and the
    assignment/re-estimation plan is unchanged).  Each iteration is
    one corpus scan: the assignment expression is free (fused into
    the scan) and the dim-wise partial aggregate shuffles k·d rows
    per partition.
    """
    vec = F.col(vec_col).cast("array<double>")
    init = (
        df.where(vec.isNotNull())
        .orderBy(id_col)
        .limit(k)
        .select(vec.alias("_v"))
        .collect()
    )
    centroids = [
        (cid, [round(float(x), round_decimals) for x in r["_v"]])
        for cid, r in enumerate(init)
    ]
    base = df.where(vec.isNotNull()).select(F.col(id_col), vec.alias("_vec"))
    for _ in range(n_iter):
        assigned = assign_clusters(base, centroids, "_vec")
        dims = assigned.select(
            "cluster_id", F.posexplode("_vec").alias("_dim", "_val")
        )
        means = (
            dims.groupBy("cluster_id", "_dim")
            .agg(F.round(F.avg("_val"), round_decimals).alias("_m"))
            .groupBy("cluster_id")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("_dim", "_m"))),
                    lambda s: s["_m"],
                ).alias("_cvec")
            )
            .collect()
        )
        new = {int(r["cluster_id"]): list(r["_cvec"]) for r in means}
        # empty cluster → keep previous centroid
        centroids = [(cid, new.get(cid, old)) for cid, old in centroids]
    final = assign_clusters(base, centroids, "_vec").select(
        id_col,
        "cluster_id",
        F.round("sq_dist", round_decimals).alias("sq_dist"),
    )
    return final, centroids


def cluster_sizes(assigned: DataFrame) -> DataFrame:
    """Per-cluster row count + mean within-cluster distance — the
    convergence/skew audit (a hot cluster here predicts a hot IVF
    cell downstream)."""
    return assigned.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg("sq_dist"), 6).alias("mean_sq_dist"),
    )

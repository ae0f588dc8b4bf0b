"""Embedding similarity search.

- :func:`cosine_sim_to_query` / :func:`l2_norm` — JVM-side array
  arithmetic (``zip_with`` + sequential ``aggregate`` fold, matching a
  left-to-right summation so results are reproducible bit-for-bit
  against list-fold oracles).
- :func:`cosine_topk` — brute-force baseline: broadcast the query
  vector, score every row, global top-k. O(N·d), one pass, no shuffle
  except the final top-k (``orderBy ... limit`` → Spark TakeOrdered,
  which aggregates per-partition heaps — no full sort).
- :func:`lsh_assign_buckets` / :func:`lsh_topk` — the scale path:
  random-hyperplane (SimHash) bucketing; only the query's bucket (and
  optional neighbor probes) is scored. Hyperplanes are generated from
  a seed, so bucket assignment is deterministic and persistable.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


def dot(a: Column, b: Column) -> Column:
    """Sequential left-fold dot product in double precision."""
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def l2_norm(a: Column) -> Column:
    sq = F.transform(a, lambda x: x.cast("double") * x.cast("double"))
    return F.sqrt(F.aggregate(sq, F.lit(0.0), lambda acc, x: acc + x))


def cosine_sim_to_query(df: DataFrame, vec_col: str, query_col: str, out: str = "cosine_sim") -> DataFrame:
    # zero vectors (dead embeddings exist in any real corpus) must
    # yield NULL, not an ANSI divide-by-zero mid-scan
    a, q = F.col(vec_col), F.col(query_col)
    denom = l2_norm(a) * l2_norm(q)
    return df.withColumn(out, F.when(denom > 0, dot(a, q) / denom))


def cosine_topk(
    df: DataFrame,
    query: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Brute-force cosine top-k against a literal query vector.
    Zero vectors score NULL (sorted last), never an ANSI error."""
    q = F.array(*[F.lit(float(x)) for x in query])
    denom = l2_norm(F.col(vec_col)) * l2_norm(q)
    scored = df.withColumn(
        "cosine_sim", F.when(denom > 0, dot(F.col(vec_col), q) / denom)
    )
    return scored.select(id_col, "cosine_sim").orderBy(
        F.col("cosine_sim").desc(), F.col(id_col).asc()
    ).limit(k)


def quantize_embeddings(
    df: DataFrame,
    vec_col: str = "embedding",
    out: str = "q8",
    scale_col: str = "q8_scale",
) -> DataFrame:
    """Symmetric per-vector int8 quantization of an embedding column:
    ``scale = max|x| / 127``, ``q[i] = round(x[i] / scale)`` ∈
    [−127, 127] — the standard 4× memory/IO cut for a persisted ANN
    corpus (a 10^12 × 768-float corpus is ~3 PB as float32; ~0.75 PB
    as int8 + one double scale per vector).

    COSINE IS SCALE-INVARIANT, so quantized cosine needs only the
    integer arrays — the per-vector scales cancel and are carried
    only for dequantization/dot-product use.  All arithmetic is JVM
    array expressions (no UDF); the row-local quantization is a pure
    function of the vector, deterministic on any engine (Spark
    ``round`` HALF_UP, replayed by the oracle).

    Zero vectors quantize to zeros with scale 1.0 (no 0/0).
    """
    v = F.col(vec_col)
    amax = F.array_max(F.transform(v, lambda x: F.abs(x.cast("double"))))
    scale = F.when(amax > 0, amax / F.lit(127.0)).otherwise(F.lit(1.0))
    return df.withColumn(scale_col, scale).withColumn(
        out,
        F.transform(v, lambda x: F.round(x.cast("double") / F.col(scale_col)).cast("int")),
    )


def quantized_cosine_topk(
    df: DataFrame,
    query: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "q8",
) -> DataFrame:
    """Brute-force cosine top-k over an int8-quantized corpus (from
    :func:`quantize_embeddings`): the query is quantized with its own
    scale, and because per-vector scales cancel in cosine, the score
    is ``Σ qa·qb / (‖qa‖·‖qb‖)`` over EXACT INTEGER dot products and
    norms — one double division at the end, so the ranking is
    bit-stable under any partitioning and engine.  Same TakeOrdered
    discipline as :func:`cosine_topk`; use :func:`ann_recall` against
    the float path to gauge the quantization recall cost at test
    scale before trusting it at corpus scale.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    amax = max(abs(float(x)) for x in query)
    qscale = amax / 127.0 if amax > 0 else 1.0
    import decimal as _dec

    qq = [
        int(
            _dec.Decimal(repr(float(x) / qscale)).quantize(
                _dec.Decimal("1"), _dec.ROUND_HALF_UP
            )
        )
        for x in query
    ]
    qarr = F.array(*[F.lit(int(x)) for x in qq])
    v = F.col(vec_col)
    idot = F.aggregate(
        F.zip_with(v, qarr, lambda a, b: a.cast("bigint") * b.cast("bigint")),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    nsq = F.aggregate(
        F.transform(v, lambda x: x.cast("bigint") * x.cast("bigint")),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    qnorm = float(np.sqrt(sum(x * x for x in qq)))
    denom = F.sqrt(nsq.cast("double")) * F.lit(qnorm)
    scored = df.withColumn(
        "cosine_sim",
        F.when(denom > 0, idot.cast("double") / denom),
    )
    return (
        scored.select(id_col, "cosine_sim")
        .orderBy(F.col("cosine_sim").desc(), F.col(id_col).asc())
        .limit(k)
    )


def _hyperplanes(dim: int, n_bits: int, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_bits, dim))


def make_lsh_udf(dim: int, n_bits: int = 16, seed: int = 42):
    """Returns a pandas UDF mapping an embedding column to its
    random-hyperplane bucket id (int). Deterministic given (dim,
    n_bits, seed) — persist those three numbers as the fitted state."""
    planes = _hyperplanes(dim, n_bits, seed)
    weights = (1 << np.arange(n_bits)).astype(np.int64)

    @pandas_udf("bigint")
    def bucket(vecs: pd.Series) -> pd.Series:
        m = np.stack(vecs.to_numpy())  # (batch, dim)
        bits = (m @ planes.T) > 0  # (batch, n_bits)
        return pd.Series(bits @ weights)

    return bucket


def lsh_assign_buckets(
    df: DataFrame,
    vec_col: str = "embedding",
    dim: int = 64,
    n_bits: int = 16,
    seed: int = 42,
    out: str = "lsh_bucket",
) -> DataFrame:
    """Random-hyperplane bucket id as pure JVM column expressions: per
    plane, sign of a sequential left-fold dot product; bucket =
    Σ bit_j·2^j. No Python/Arrow round-trip, and bit-reproducible
    outside the JVM (the same left-fold in double precision can be
    replayed by a DuckDB ``list_reduce`` oracle — unlike the BLAS
    matmul in :func:`make_lsh_udf`, whose summation order differs).
    """
    planes = _hyperplanes(dim, n_bits, seed)
    v = F.col(vec_col)
    bucket = F.lit(0).cast("long")
    for j in range(n_bits):
        plane = F.array(*[F.lit(float(x)) for x in planes[j]])
        bit = (dot(v, plane) > 0).cast("long")
        bucket = bucket + F.shiftleft(bit, j)
    return df.withColumn(out, bucket)


def _seq_dot(a, b) -> float:
    """Driver-side dot product with the SAME sequential left-fold
    rounding as :func:`dot` — keeps query-bucket computation bit-equal
    to the distributed assignment."""
    acc = 0.0
    for x, y in zip(a, b):
        acc += float(x) * float(y)
    return acc


def lsh_topk(
    df: DataFrame,
    query: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_bits: int = 8,
    seed: int = 42,
) -> DataFrame:
    """ANN: score only rows whose LSH bucket matches the query's.
    Recall < 1 by construction; at 100 TB this turns a full scan into a
    partition-pruned scan when the table is written bucketed/partitioned
    by ``lsh_bucket``."""
    planes = _hyperplanes(dim, n_bits, seed)
    qv = [float(x) for x in query]
    qbucket = 0
    for j in range(n_bits):
        if _seq_dot(qv, planes[j]) > 0:
            qbucket |= 1 << j
    bucketed = lsh_assign_buckets(df, vec_col, dim, n_bits, seed)
    cand = bucketed.filter(F.col("lsh_bucket") == F.lit(qbucket))
    return cosine_topk(cand, qv, k=k, id_col=id_col, vec_col=vec_col)


def ivf_assign(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_centroids: int = 8,
) -> tuple[DataFrame, DataFrame]:
    """IVF coarse quantization: assign every vector to its nearest
    centroid bucket (cosine, ties → smallest centroid id).

    Centroid choice here is the ``n_centroids`` smallest-id vectors —
    deterministic and oracle-checkable; production swaps in
    ``pyspark.ml.clustering.KMeans(seed=...)`` centroids and the
    assignment/search plan below is IDENTICAL (small centroid table
    broadcast, one scored pass, rank-1 filter).

    Returns (assigned_df with a ``centroid_id`` column, centroids_df).
    """
    from pyspark.sql import Window

    centroids = (
        df.orderBy(id_col)
        .limit(n_centroids)
        .select(F.col(id_col).alias("centroid_id"), F.col(vec_col).alias("_cvec"))
    )
    scored = df.crossJoin(F.broadcast(centroids)).withColumn(
        "_csim",
        dot(F.col(vec_col), F.col("_cvec"))
        / (l2_norm(F.col(vec_col)) * l2_norm(F.col("_cvec"))),
    )
    w = Window.partitionBy(id_col).orderBy(F.col("_csim").desc(), F.col("centroid_id").asc())
    assigned = (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_csim", "_cvec")
    )
    return assigned, centroids


def ivf_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_centroids: int = 8,
    nprobe: int = 2,
) -> DataFrame:
    """IVF ANN search: score ONLY the ``nprobe`` buckets whose centroids
    are nearest the query — the scale path between brute force (exact,
    O(N·d)) and LSH (hash pruning). At 100 TB the assignment is
    precomputed once and bucketed/partitioned by ``centroid_id``, so a
    query touches nprobe/n_centroids of the data."""
    assigned, centroids = ivf_assign(df, vec_col, id_col, n_centroids)
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    probe_ids = [
        r["centroid_id"]
        for r in centroids.withColumn(
            "_qsim", dot(F.col("_cvec"), q) / (l2_norm(F.col("_cvec")) * l2_norm(q))
        )
        .orderBy(F.col("_qsim").desc(), F.col("centroid_id").asc())
        .limit(nprobe)
        .collect()
    ]
    cand = assigned.filter(F.col("centroid_id").isin(probe_ids))
    out = cand.withColumn(
        "cosine_sim", dot(F.col(vec_col), q) / (l2_norm(F.col(vec_col)) * l2_norm(q))
    )
    return out.orderBy(F.col("cosine_sim").desc(), F.col(id_col).asc()).limit(k)


def knn_join(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    q_id: str = "q_id",
    q_vec: str = "q_vec",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Batch k-NN join: top-k corpus neighbors (cosine) for EVERY query
    row at once — the shape a retrieval/labeling pipeline actually
    needs, vs the single-query ``cosine_topk``.

    Scale shape: the query side (requests, eval set) broadcasts; the
    100 TB corpus is scanned once and scored in place (|Q|·|C| scores
    but only on the projected vectors). The per-query top-k runs as a
    rank window keyed by query id — AQE's skew split handles the few-
    hot-keys layout; for |Q| large enough to matter, pre-bucket with
    ``lsh_assign_buckets`` on both sides first and knn_join per bucket.
    """
    from pyspark.sql import Window

    q = queries.select(F.col(q_id), F.col(q_vec))
    scored = corpus.crossJoin(F.broadcast(q)).withColumn(
        "cosine_sim",
        dot(F.col(vec_col), F.col(q_vec))
        / (l2_norm(F.col(vec_col)) * l2_norm(F.col(q_vec))),
    )
    w = Window.partitionBy(q_id).orderBy(
        F.col("cosine_sim").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .select(q_id, id_col, "cosine_sim", F.col("_rn").alias("rank"))
    )


def write_ann_corpus(
    df: DataFrame,
    path: str,
    vec_col: str = "embedding",
    dim: int = 64,
    n_bits: int = 8,
    seed: int = 42,
) -> None:
    """Materialize the LSH-bucketed ANN layout: corpus written
    partitioned by ``lsh_bucket`` (Hive-style dirs). A top-k query then
    reads ONLY its bucket's partition — at 100 TB the scan prunes to
    ~1/2^n_bits of the files before any I/O (PartitionFilters in the
    plan), which is the difference between an ANN lookup and a full
    corpus scan."""
    bucketed = lsh_assign_buckets(df, vec_col, dim, n_bits, seed)
    bucketed.write.mode("overwrite").partitionBy("lsh_bucket").parquet(path)


def ann_corpus_topk(
    spark,
    path: str,
    query: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_bits: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Top-k over a :func:`write_ann_corpus` layout: the bucket filter
    is a partition-column predicate, so Catalyst prunes every other
    bucket's files at planning time."""
    planes = _hyperplanes(dim, n_bits, seed)
    qv = [float(x) for x in query]
    qbucket = 0
    for j in range(n_bits):
        if _seq_dot(qv, planes[j]) > 0:
            qbucket |= 1 << j
    corpus = spark.read.parquet(path).filter(F.col("lsh_bucket") == qbucket)
    return cosine_topk(corpus, qv, k=k, id_col=id_col, vec_col=vec_col)


def ann_recall(
    approx: DataFrame,
    exact: DataFrame,
    id_col: str = "vec_id",
    query_col: str | None = None,
) -> DataFrame:
    """Recall of an approximate top-k result against the exact top-k:
    ``|approx ∩ exact| / |exact|`` — the standard ANN quality gauge
    (run it on a sampled query set before trusting an IVF/LSH index at
    corpus scale).

    Single-query mode (``query_col=None``) returns one row
    ``(n_exact, n_hits, recall)``; multi-query mode groups both sides
    by ``query_col`` and returns one row per query.  Pure joins +
    partial-agg counts on id columns — candidate lists are k-sized,
    so every input here is tiny relative to the corpus scan that
    produced it.
    """
    keys = [query_col, id_col] if query_col else [id_col]
    a = approx.select(*keys)
    e = exact.select(*keys)
    if query_col:
        hits = a.join(e, keys).groupBy(query_col).agg(
            F.count(F.lit(1)).alias("n_hits")
        )
        totals = e.groupBy(query_col).agg(F.count(F.lit(1)).alias("n_exact"))
        return (
            totals.join(hits, query_col, "left")
            .select(
                query_col,
                "n_exact",
                F.coalesce("n_hits", F.lit(0)).cast("bigint").alias("n_hits"),
                (
                    F.coalesce("n_hits", F.lit(0)).cast("double") / F.col("n_exact")
                ).alias("recall"),
            )
        )
    hits = a.join(e, keys).agg(F.count(F.lit(1)).alias("n_hits"))
    totals = e.agg(F.count(F.lit(1)).alias("n_exact"))
    return totals.crossJoin(hits).select(
        "n_exact",
        "n_hits",
        (F.col("n_hits").cast("double") / F.col("n_exact")).alias("recall"),
    )


def embedding_decontaminate(
    train: DataFrame,
    bench: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.8,
    round_dp: int = 6,
) -> DataFrame:
    """Semantic benchmark decontamination: for every training vector,
    the maximum cosine similarity against ANY benchmark vector, the
    benchmark id attaining it, and a ``contaminated`` flag at
    ``threshold`` — the embedding-space complement of the 13-gram
    ``decontaminate`` (same governance contract, catches paraphrased
    leakage n-grams miss; cf. the embedding-based contamination audits
    in Yang et al. 2023, "Rethinking Benchmark and Contamination").

    Scale shape: benchmark suites are small (10³-10⁴ rows), so the
    bench side BROADCASTS and the cross product never shuffles —
    similarities are computed partition-locally and the partial-
    aggregated ``groupBy(train id)`` max collapses N×m rows back to N
    BEFORE the only exchange.  Similarities are the engine's
    sequential-fold dot products rounded to ``round_dp`` (the
    similarity family's cross-engine replay convention); ties at the
    max break toward the LARGEST benchmark id (struct-max semantics,
    mirrored by the oracle).
    """
    b = F.broadcast(
        bench.select(F.col(id_col).alias("_bid"), F.col(vec_col).alias("_bvec"))
    )
    t = train.select(F.col(id_col), F.col(vec_col).alias("_tvec"))
    sim = F.round(
        dot(F.col("_tvec"), F.col("_bvec"))
        / (l2_norm(F.col("_tvec")) * l2_norm(F.col("_bvec"))),
        round_dp,
    )
    best = (
        t.crossJoin(b)
        .select(id_col, F.struct(sim.alias("s"), F.col("_bid").alias("b")).alias("_sb"))
        .groupBy(id_col)
        .agg(F.max("_sb").alias("_m"))
    )
    return best.select(
        id_col,
        F.col("_m.s").alias("max_bench_sim"),
        F.col("_m.b").alias("matched_bench_id"),
        (F.col("_m.s") >= threshold).cast("int").alias("contaminated"),
    )


def contrastive_triplets(
    df: DataFrame,
    group_col: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    decimals: int = 6,
) -> DataFrame:
    """(anchor, positive, hard-negative) mining for contrastive /
    retrieval training: per anchor, the POSITIVE is its most-similar
    vector within the SAME ``group_col`` (a near-paraphrase / same-doc
    chunk) and the HARD NEGATIVE its most-similar vector from a
    DIFFERENT group — the classic in-batch-hard-negative recipe run as
    a batch job.  Ties break toward the smallest candidate id;
    anchors with no same-group peer are dropped (no positive exists).

    Returns ``(id, pos_id, pos_cos, neg_id, neg_cos)`` with cosines
    rounded to ``decimals`` BEFORE the argmax so the winner is
    engine-stable (the embedding-family rounding convention).

    Scale shape: EXACT all-pairs scoring per anchor — correct and
    oracle-replayable at gate scale; at corpus scale, pre-bucket both
    sides (``lsh_assign_buckets`` / the IVF layout) and run the same
    argmax per bucket, exactly as ``knn_join``'s docstring prescribes.
    The two argmaxes are struct maxes in ONE partial-aggregatable
    ``groupBy(anchor)`` — no rank window, no second shuffle.
    """
    a = df.select(
        F.col(id_col).alias("_aid"),
        F.col(group_col).alias("_ag"),
        F.col(vec_col).alias("_avec"),
    )
    c = df.select(
        F.col(id_col).alias("_cid"),
        F.col(group_col).alias("_cg"),
        F.col(vec_col).alias("_cvec"),
    )
    pairs = a.join(F.broadcast(c), F.col("_aid") != F.col("_cid"))
    cos = F.round(
        dot(F.col("_avec"), F.col("_cvec"))
        / (l2_norm(F.col("_avec")) * l2_norm(F.col("_cvec"))),
        decimals,
    )
    scored = pairs.select(
        "_aid",
        "_ag",
        "_cid",
        "_cg",
        cos.alias("_cos"),
    )
    same = F.col("_ag") == F.col("_cg")
    # max on (cos, -id): highest cosine, then smallest candidate id
    pos = F.max(F.when(same, F.struct(F.col("_cos").alias("c"), (-F.col("_cid")).alias("ni"))))
    neg = F.max(F.when(~same, F.struct(F.col("_cos").alias("c"), (-F.col("_cid")).alias("ni"))))
    agg = scored.groupBy("_aid").agg(pos.alias("_p"), neg.alias("_n"))
    return (
        agg.where(F.col("_p").isNotNull())
        .select(
            F.col("_aid").alias("id"),
            (-F.col("_p.ni")).alias("pos_id"),
            F.col("_p.c").alias("pos_cos"),
            (-F.col("_n.ni")).alias("neg_id"),
            F.col("_n.c").alias("neg_cos"),
        )
    )

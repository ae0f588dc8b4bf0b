"""Distributed retrieval-ranking evaluation (NDCG / MAP / MRR / P@k).

The reference evaluates features, not retrievers — but the engine's
similarity-search family (functions/similarity.py: cosine_topk,
knn_join, ann_recall) produces ranked lists, and a 100 TB training-data
pipeline that mines hard negatives or dedups by nearest neighbour needs
the standard ranked-retrieval quality gauges over billions of
(query, rank, relevance) rows.  `ann_recall` measures set overlap vs
brute force; this module measures *ordering* quality.

- **ranking_metrics** — per-query table (n_retrieved, n_relevant,
  rr, precision_at_k, recall_at_k, dcg_at_k, idcg_at_k, ndcg_at_k,
  ap_at_k).  Every running sum is an ORDER-BY window over the query
  partition, so the float summation order is *defined* (rank order /
  ideal order), making results bit-reproducible on any engine with the
  same libm — the same determinism discipline as the pagerank family,
  applied to doubles by pinning the fold order instead of using
  integers.
- **ranking_summary** — macro averages over queries.  Per-query
  metrics are rounded to `round_dp` decimals, lifted to
  ``decimal(18, round_dp)`` and summed exactly, so the macro mean is
  independent of partition layout (double-sum ulp drift cannot leak
  into the result).

Definitions (standard graded-relevance forms):
  gain(rel)      = 2^rel - 1
  DCG@k          = sum over rank<=k of gain(rel)/log2(rank+1)
  IDCG@k         = DCG@k of the relevance-descending ideal ordering
  NDCG@k         = DCG@k / IDCG@k               (0 when IDCG = 0)
  AP@k           = sum over relevant rank<=k of (hits@rank / rank)
                   / min(n_relevant, k)         (0 when no relevant)
  RR             = 1 / first relevant rank      (0 when no relevant)
  precision@k    = hits@k / k
  recall@k       = hits@k / n_relevant          (0 when no relevant)

100 TB shape: ONE exchange on the query key serves every window (two
sorts share the partitioning: rank order and ideal order), then one
groupBy on the same key — no second shuffle under AQE.  Relevance is
graded (any non-negative double); rows with null query/rank are
dropped, null relevance counts as 0 (retrieved but unjudged — the
TREC convention).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from feature_engineering_tk_spark.exceptions import InsufficientDataError


def ranking_metrics(
    df: DataFrame,
    query: str = "query_id",
    rank: str = "rank",
    relevance: str = "relevance",
    k: int = 10,
) -> DataFrame:
    """Per-query ranked-retrieval metrics at cutoff ``k``.

    ``rank`` must be the 1-based position within each query's ranked
    list (unique per query — the output of a row_number or a top-k
    operator).  Relevance is graded; > 0 counts as a hit for the
    binary metrics (RR / AP / precision / recall).
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    q, r = F.col(query), F.col(rank).cast("int")
    base = df.where(q.isNotNull() & r.isNotNull()).select(
        q.alias("_q"),
        r.alias("_r"),
        F.coalesce(F.col(relevance).cast("double"), F.lit(0.0)).alias("_rel"),
    )

    row = Window.partitionBy("_q")
    # Fold order is pinned: ROWS frames over unique sort keys, so the
    # double running sums are evaluated left-to-right in a defined
    # order on every engine.
    by_rank = row.orderBy("_r").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    by_ideal = row.orderBy(F.col("_rel").desc(), F.col("_r")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )

    gain = F.pow(F.lit(2.0), F.col("_rel")) - F.lit(1.0)
    in_k = F.col("_r") <= F.lit(k)
    hit = (F.col("_rel") > 0).cast("int")
    ideal_pos = F.row_number().over(
        Window.partitionBy("_q").orderBy(F.col("_rel").desc(), F.col("_r"))
    )

    scored = (
        base.withColumn("_hit", hit)
        .withColumn("_cumhit", F.sum("_hit").over(by_rank))
        .withColumn(
            "_dcg_run",
            F.sum(
                F.when(
                    in_k, gain / (F.log(F.col("_r") + F.lit(1)) / F.log(F.lit(2.0)))
                ).otherwise(F.lit(0.0))
            ).over(by_rank),
        )
        .withColumn(
            "_ap_run",
            F.sum(
                F.when(
                    in_k & (F.col("_hit") == 1),
                    F.col("_cumhit").cast("double") / F.col("_r"),
                ).otherwise(F.lit(0.0))
            ).over(by_rank),
        )
        .withColumn("_ipos", ideal_pos)
        .withColumn(
            "_idcg_run",
            F.sum(
                F.when(
                    F.col("_ipos") <= F.lit(k),
                    gain / (F.log(F.col("_ipos") + F.lit(1)) / F.log(F.lit(2.0))),
                ).otherwise(F.lit(0.0))
            ).over(by_ideal),
        )
    )

    # Running sums of non-negative terms are monotone, so max == final.
    agg = scored.groupBy(F.col("_q").alias(query)).agg(
        F.count(F.lit(1)).alias("n_retrieved"),
        F.sum("_hit").alias("n_relevant"),
        F.sum(F.when(in_k, F.col("_hit")).otherwise(F.lit(0))).alias("hits_at_k"),
        F.min(F.when(F.col("_hit") == 1, F.col("_r"))).alias("_first_hit"),
        F.max("_dcg_run").alias("dcg_at_k"),
        F.max("_idcg_run").alias("idcg_at_k"),
        F.max("_ap_run").alias("_ap_num"),
    )
    n_rel = F.col("n_relevant")
    return agg.select(
        query,
        "n_retrieved",
        "n_relevant",
        "hits_at_k",
        F.coalesce(F.lit(1.0) / F.col("_first_hit"), F.lit(0.0)).alias("rr"),
        (F.col("hits_at_k").cast("double") / F.lit(float(k))).alias("precision_at_k"),
        F.when(n_rel > 0, F.col("hits_at_k").cast("double") / n_rel)
        .otherwise(F.lit(0.0))
        .alias("recall_at_k"),
        "dcg_at_k",
        "idcg_at_k",
        F.when(F.col("idcg_at_k") > 0, F.col("dcg_at_k") / F.col("idcg_at_k"))
        .otherwise(F.lit(0.0))
        .alias("ndcg_at_k"),
        F.when(n_rel > 0, F.col("_ap_num") / F.least(n_rel, F.lit(k)).cast("double"))
        .otherwise(F.lit(0.0))
        .alias("ap_at_k"),
    )


def ranking_summary(
    df: DataFrame,
    query: str = "query_id",
    rank: str = "rank",
    relevance: str = "relevance",
    k: int = 10,
    round_dp: int = 6,
) -> DataFrame:
    """One-row macro summary: mean RR (= MRR), mean NDCG@k, MAP@k,
    mean precision@k / recall@k over queries.

    Per-query metrics are rounded to ``round_dp`` decimals, lifted to
    ``decimal(18, round_dp)`` and summed exactly, then divided as a
    double by the query count — the cross-query mean is independent
    of partition count or layout (no double-sum ulp drift).
    """
    if df.where(F.col(query).isNotNull() & F.col(rank).isNotNull()).isEmpty():
        raise InsufficientDataError("ranking_summary", required=1, actual=0)
    per_q = ranking_metrics(df, query=query, rank=rank, relevance=relevance, k=k)
    dec = f"decimal(18,{round_dp})"
    as_dec = lambda c: F.round(F.col(c), round_dp).cast(dec)  # noqa: E731
    n = F.count(F.lit(1))
    mean = lambda c: (F.sum(as_dec(c)).cast("double") / n)  # noqa: E731
    return per_q.agg(
        n.alias("n_queries"),
        mean("rr").alias("mrr"),
        mean("ndcg_at_k").alias("mean_ndcg_at_k"),
        mean("ap_at_k").alias("map_at_k"),
        mean("precision_at_k").alias("mean_precision_at_k"),
        mean("recall_at_k").alias("mean_recall_at_k"),
    )


def rank_biased_overlap(
    df: DataFrame,
    query: str = "query_id",
    ranker: str = "ranker",
    rank: str = "rank",
    item: str = "item_id",
    ranker_a: str = "a",
    ranker_b: str = "b",
    p: float = 0.9,
    depth: int = 10,
    round_dp: int = 9,
) -> DataFrame:
    """Rank-biased overlap (Webber et al. 2010, truncated form) between
    two rankers' lists per query: (query, n_a, n_b, rbo).

    ``RBO@d = (1−p) · Σ_{i=1..d} p^{i−1} · |A_{1..i} ∩ B_{1..i}| / i``
    — the top-weighted agreement gauge for comparing two retrieval
    index versions, two ANN parameterizations, or pre-/post-migration
    rankings, where Kendall's tau over-weights the tail nobody reads.
    This is the TRUNCATED form (depth-d prefix, no extrapolation);
    with both lists ≥ depth it lower-bounds the full RBO by exactly
    the residual ``p^d`` tail mass.

    Determinism: the weighted sum is ONE left-to-right ``aggregate``
    fold whose accumulator carries (sum, p-power) — the power is built
    by repeated multiplication inside the fold, so both engines
    execute the identical sequence of IEEE multiplies and the result
    is bit-stable (the ranking_metrics ORDER-BY-pinned-fold
    discipline); ``round_dp`` rounds the final scalar.

    Scale shape: rows with rank > depth are filtered BEFORE the
    shuffle (predicate pushdown into the scan), so the query-key
    exchange carries ≤ 2·depth rows per query; the per-query fold is
    O(depth²) over depth-bounded arrays — a constant.  One exchange
    end to end.
    """
    for c in (query, ranker, rank, item):
        if c not in df.columns:
            from feature_engineering_tk_spark.exceptions import ColumnNotFoundError

            raise ColumnNotFoundError(c, df.columns)
    d = int(depth)
    if d < 1:
        raise ValueError("depth must be >= 1")
    if not (0.0 < p < 1.0):
        raise ValueError("p must be in (0, 1)")

    def side(tag: str, name: str):
        struct = F.when(
            F.col(ranker) == tag, F.struct(F.col(rank).alias("r"), F.col(item).cast("string").alias("i"))
        )
        return F.transform(
            F.array_sort(F.collect_list(struct)), lambda s: s["i"]
        ).alias(name)

    lists = (
        df.where(
            F.col(query).isNotNull()
            & F.col(rank).isNotNull()
            & (F.col(rank) <= F.lit(d))
            & F.col(ranker).isin([ranker_a, ranker_b])
        )
        .groupBy(F.col(query))
        .agg(side(ranker_a, "_a"), side(ranker_b, "_b"))
    )
    overlaps = F.transform(
        F.sequence(F.lit(1), F.lit(d)),
        lambda i: F.size(
            F.array_intersect(F.slice(F.col("_a"), 1, i), F.slice(F.col("_b"), 1, i))
        ).cast("double")
        / i.cast("double"),
    )
    folded = F.aggregate(
        overlaps,
        F.array(F.lit(0.0), F.lit(1.0)),
        lambda acc, x: F.array(
            acc.getItem(0) + acc.getItem(1) * x, acc.getItem(1) * F.lit(float(p))
        ),
        lambda acc: acc.getItem(0),
    )
    return lists.select(
        F.col(query),
        F.size("_a").alias("n_a"),
        F.size("_b").alias("n_b"),
        F.round(F.lit(1.0 - p) * folded, round_dp).alias("rbo"),
    )

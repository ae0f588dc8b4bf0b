"""Inter-rater agreement statistics over annotation tables.

LLM data pipelines are downstream of human (or model) labeling passes
— preference grading, safety tagging, quality rubrics — and the first
question about any labeling pass is "do the raters agree beyond
chance?".  Two classical chance-corrected agreement coefficients over
the long-form annotation table ``(item_id, rater_id, label)``:

- **Cohen's kappa** — two named raters.  Reduced to the label×label
  confusion matrix by ONE ``groupBy(item)`` (map-side-combined pivot
  of the two raters' labels) + one tiny ``groupBy(label_a, label_b)``;
  the matrix is label-vocabulary² rows, collected to the driver like
  every other fitted-statistic table in this engine, and the
  coefficient is computed from INTEGER sufficient statistics so the
  result is bit-identical on any engine under any summation order:
  ``po = A/n``, ``pe = P/n²``, ``kappa = (A·n − P)/(n² − P)`` with
  ``A`` = agreement count and ``P = Σ_l ca_l·cb_l`` exact Python ints.
- **Fleiss' kappa** — ``n_raters`` raters per item (items with a
  different rater count are dropped, the standard completeness
  filter).  Sufficient statistics: ``A = Σ_i Σ_l n_il²`` (one
  ``groupBy(item, label)`` + one ``groupBy(item)``), ``B = Σ_l c_l²``
  over the kept items' label totals, and the kept-item count ``N`` —
  all exact integers; the only float steps are the final divisions,
  mirrored verbatim by the SQL oracle.

Degenerate chance agreement (``pe == 1``: every rating is one label)
returns kappa ``0.0`` by documented convention rather than NaN.

Scale shape: shuffles are keyed by ``item`` / ``(item, label)`` only
— never unpartitioned; driver traffic is bounded by the label
vocabulary, not the row count.  Reference semantics anchor:
feature_engineering_tk has no agreement module — this extends its
statistical-testing family (reference ``statistical_analysis.py``)
to the annotation-QA setting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from feature_engineering_tk_spark.exceptions import InsufficientDataError


def cohen_kappa(
    df: DataFrame,
    item: str = "item_id",
    rater: str = "rater_id",
    label: str = "label",
    rater_a=0,
    rater_b=1,
) -> DataFrame:
    """Cohen's kappa between ``rater_a`` and ``rater_b``.

    Returns a 1-row DataFrame ``(n_items, po, pe, kappa)``.  Items
    missing either rater are dropped; duplicate ratings by the same
    rater on one item resolve deterministically to the MIN label.
    """
    paired = (
        df.groupBy(item)
        .agg(
            F.min(F.when(F.col(rater) == F.lit(rater_a), F.col(label))).alias("_la"),
            F.min(F.when(F.col(rater) == F.lit(rater_b), F.col(label))).alias("_lb"),
        )
        .where(F.col("_la").isNotNull() & F.col("_lb").isNotNull())
    )
    cm = paired.groupBy("_la", "_lb").agg(F.count(F.lit(1)).alias("_c")).collect()
    n = sum(r["_c"] for r in cm)
    if n < 1:
        raise InsufficientDataError("cohen_kappa", 1, n)
    agree = sum(r["_c"] for r in cm if r["_la"] == r["_lb"])
    ca: dict = {}
    cb: dict = {}
    for r in cm:
        ca[r["_la"]] = ca.get(r["_la"], 0) + r["_c"]
        cb[r["_lb"]] = cb.get(r["_lb"], 0) + r["_c"]
    pe_num = sum(c * cb.get(l, 0) for l, c in ca.items())  # Σ ca_l·cb_l
    den = n * n - pe_num
    kappa = 0.0 if den == 0 else (agree * n - pe_num) / den
    spark = df.sparkSession
    return spark.createDataFrame(
        [(n, agree / n, pe_num / (n * n), kappa)],
        "n_items bigint, po double, pe double, kappa double",
    )


def fleiss_kappa(
    df: DataFrame,
    item: str = "item_id",
    label: str = "label",
    n_raters: int = 2,
) -> DataFrame:
    """Fleiss' kappa for ``n_raters`` ratings per item.

    Returns a 1-row DataFrame ``(n_items, p_bar, p_e, kappa)``.  Items
    whose total rating count differs from ``n_raters`` are dropped
    (the standard completeness filter for the equal-n estimator).
    """
    if n_raters < 2:
        raise InsufficientDataError("fleiss_kappa", 2, n_raters)
    counts = df.groupBy(item, label).agg(F.count(F.lit(1)).alias("_c"))
    counts = counts.persist()
    try:
        kept = (
            counts.groupBy(item)
            .agg(F.sum("_c").alias("_m"), F.sum(F.col("_c") * F.col("_c")).alias("_s2"))
            .where(F.col("_m") == n_raters)
        )
        row = kept.agg(
            F.count(F.lit(1)).alias("N"), F.coalesce(F.sum("_s2"), F.lit(0)).alias("A")
        ).collect()[0]
        n_items, a_sum = int(row["N"]), int(row["A"])
        if n_items < 1:
            raise InsufficientDataError("fleiss_kappa", 1, n_items)
        totals = (
            counts.join(kept.select(item), on=item)
            .groupBy(label)
            .agg(F.sum("_c").alias("_cl"))
            .collect()
        )
    finally:
        counts.unpersist()
    b_sum = sum(int(r["_cl"]) ** 2 for r in totals)
    nn = n_items * n_raters
    p_bar = (a_sum - nn) / (nn * (n_raters - 1))
    p_e = b_sum / (nn * nn)
    kappa = 0.0 if p_e == 1.0 else (p_bar - p_e) / (1.0 - p_e)
    spark = df.sparkSession
    return spark.createDataFrame(
        [(n_items, p_bar, p_e, kappa)],
        "n_items bigint, p_bar double, p_e double, kappa double",
    )


def krippendorff_alpha(
    df: DataFrame,
    item: str = "item_id",
    rater: str = "rater_id",
    label: str = "label",
) -> DataFrame:
    """Krippendorff's alpha for nominal labels — the agreement
    coefficient that tolerates MISSING ratings (any number of raters
    per item, items rated once are simply unpairable), which is the
    real shape of crowdsourced / model-judge annotation tables where
    Fleiss' equal-n completeness filter would discard most of the
    data.

    Coincidence-matrix formulation (Krippendorff 2004): with n_il =
    ratings of label l on item i and m_i = Σ_l n_il over items with
    m_i ≥ 2,

        alpha = 1 − (n−1) · Σ_i (m_i² − Σ_l n_il²)/(m_i − 1)
                    ───────────────────────────────────────
                            n² − Σ_l n_l²

    where n_l = Σ_i n_il and n = Σ_l n_l count PAIRABLE ratings.
    Every sum is an exact integer except the per-item division by
    (m_i − 1); grouping items by m_i first makes that a division of
    one exact integer per DISTINCT rater count (a handful of rows),
    so the float work is driver-sized and order-independent.

    Duplicate ratings by one rater on one item resolve to the MIN
    label (the cohen_kappa convention).  Returns a 1-row DataFrame
    ``(n_pairable, n_items, d_o, d_e, alpha)`` with d_o/d_e the
    observed/expected disagreement rates.  All-agree data gives
    alpha = 1; d_e = 0 (one label in the whole table) returns alpha
    0.0 by the degenerate-chance convention shared with the kappas.

    Scale shape: one groupBy(item, rater), one groupBy(item, label),
    one groupBy(item), one groupBy(label) — all map-side combined and
    keyed, never unpartitioned; driver traffic is bounded by the
    label vocabulary plus the distinct-m table.
    """
    one = (
        df.where(F.col(item).isNotNull() & F.col(rater).isNotNull() & F.col(label).isNotNull())
        .groupBy(item, rater)
        .agg(F.min(label).alias("_l"))
    )
    counts = one.groupBy(item, "_l").agg(F.count(F.lit(1)).alias("_c"))
    counts = counts.persist()
    try:
        per_item = counts.groupBy(item).agg(
            F.sum("_c").alias("_m"), F.sum(F.col("_c") * F.col("_c")).alias("_s2")
        )
        kept = per_item.where(F.col("_m") >= 2)
        # one exact-integer numerator per DISTINCT rater count
        by_m = (
            kept.groupBy("_m")
            .agg(F.sum(F.col("_m") * F.col("_m") - F.col("_s2")).alias("_num"),
                 F.count(F.lit(1)).alias("_k"))
            .collect()
        )
        if not by_m:
            raise InsufficientDataError("krippendorff_alpha", 2, 0)
        totals = (
            counts.join(kept.select(item), on=item)
            .groupBy("_l")
            .agg(F.sum("_c").alias("_cl"))
            .collect()
        )
    finally:
        counts.unpersist()
    n_items = sum(int(r["_k"]) for r in by_m)
    n = sum(int(r["_cl"]) for r in totals)
    sum_nl2 = sum(int(r["_cl"]) ** 2 for r in totals)
    # deterministic driver-side summation order (sorted by m)
    do_sum = sum(int(r["_num"]) / (int(r["_m"]) - 1) for r in sorted(by_m, key=lambda r: r["_m"]))
    de_num = n * n - sum_nl2
    d_o = do_sum / n
    d_e = de_num / (n * (n - 1)) if n > 1 else 0.0
    alpha = 0.0 if de_num == 0 else 1.0 - (n - 1) * do_sum / de_num
    spark = df.sparkSession
    return spark.createDataFrame(
        [(n, n_items, d_o, d_e, alpha)],
        "n_pairable bigint, n_items bigint, d_o double, d_e double, alpha double",
    )

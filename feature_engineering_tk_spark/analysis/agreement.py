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

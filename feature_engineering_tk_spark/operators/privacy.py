"""Privacy-risk audits for training-data release: k-anonymity and
l-diversity over quasi-identifier combinations.

Training-data pipelines run these before publishing corpora derived
from user interactions: a record is re-identifiable when the
combination of its quasi-identifiers (language, region, time bucket,
device, ...) is shared by fewer than ``k`` records, and a group leaks
a sensitive attribute when it contains fewer than ``l`` distinct
sensitive values (Sweeney 2002; Machanavajjhala et al. 2007 — public
literature).

Scale shape: each audit is ONE ``groupBy(quasi_cols)`` with partial
map-side aggregation — group counts and distinct-sensitive counts
both decompose, so 10^12 rows shuffle only per-group partials.  The
row-level annotation variant joins the (much smaller) risky-group
table back on the same keys, which AQE broadcast-sizes.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def k_anonymity(
    df: DataFrame,
    quasi_cols: Sequence[str],
    k: int = 5,
) -> DataFrame:
    """Per quasi-identifier group: ``group_size`` and ``is_risky``
    (fewer than ``k`` records share the combination).

    NULL quasi values group together (SQL ``GROUP BY`` semantics) —
    a null region is itself an identifying signature.
    """
    if not quasi_cols:
        raise ValueError("quasi_cols must be non-empty")
    return (
        df.groupBy(*quasi_cols)
        .agg(F.count(F.lit(1)).alias("group_size"))
        .withColumn("is_risky", F.col("group_size") < F.lit(int(k)))
    )


def k_anonymity_annotate(
    df: DataFrame,
    quasi_cols: Sequence[str],
    k: int = 5,
    out: str = "k_anonymous",
) -> DataFrame:
    """Row-level variant: every input row annotated with whether its
    quasi-identifier group reaches size ``k``.  The group table is
    aggregate-sized; the join back is on the grouping keys."""
    groups = k_anonymity(df, quasi_cols, k).select(
        *quasi_cols, (~F.col("is_risky")).alias(out)
    )
    return df.join(groups, list(quasi_cols), "left")


def l_diversity(
    df: DataFrame,
    quasi_cols: Sequence[str],
    sensitive_col: str,
    l: int = 2,
) -> DataFrame:
    """Per quasi-identifier group: ``group_size``, the number of
    DISTINCT sensitive values (``n_sensitive``, NULLs excluded per
    ``count(DISTINCT ...)`` semantics), and ``is_risky`` when the
    group carries fewer than ``l`` distinct sensitive values —
    homogeneous groups disclose the attribute even at high k."""
    if not quasi_cols:
        raise ValueError("quasi_cols must be non-empty")
    return (
        df.groupBy(*quasi_cols)
        .agg(
            F.count(F.lit(1)).alias("group_size"),
            F.countDistinct(F.col(sensitive_col)).alias("n_sensitive"),
        )
        .withColumn("is_risky", F.col("n_sensitive") < F.lit(int(l)))
    )

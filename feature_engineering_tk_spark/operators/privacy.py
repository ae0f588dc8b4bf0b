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


def pseudonymize(
    df: DataFrame,
    columns: Sequence[str],
    salt: str = "v1",
    prefix: str | None = None,
    keep_bits: int = 48,
) -> DataFrame:
    """Consistent pseudonymization: replace each identifier value with
    a salted-hash token (``{col}_{hex}``) — the SAME value always maps
    to the SAME token, so joins, group-bys, and per-entity windows over
    the released data still work (referential integrity survives), but
    the original identifier never leaves the cluster. Change ``salt``
    per release to stop cross-release linkage.

    The hash namespace is ``prefix`` when given, else the column name:
    two tables whose id columns are named differently (``user_id`` vs
    ``uid``) tokenize to the SAME value — and therefore still join —
    when pseudonymized with the same ``salt`` and ``prefix``. Without a
    ``prefix``, tokens are per-column-name (a ``user_id`` value and an
    identical ``order_id`` value deliberately do NOT collide).

    This is tokenization, not encryption: re-identification requires a
    dictionary attack over the value space, which the salt defeats for
    release recipients who don't hold it. NULLs stay NULL.

    Scale: one row-local md5 expression per column — whole-stage
    codegen, zero shuffle, zero driver state (no lookup table to build,
    leak, or OOM on 10^12 distinct users). ``keep_bits`` truncates the
    token (collision odds ~ n²/2^(bits+1); 48 bits ≈ 0.2% at 10^6
    distinct values — raise it for web-scale id spaces).
    """
    if keep_bits < 8 or keep_bits > 128 or keep_bits % 4:
        raise ValueError("keep_bits must be a multiple of 4 in [8, 128]")
    out = df
    hex_chars = keep_bits // 4
    for c in columns:
        namespace = prefix if prefix is not None else c
        token = F.concat(
            F.lit(namespace + "_"),
            F.substring(
                F.md5(
                    F.concat_ws("\x1f", F.lit(salt), F.lit(namespace), F.col(c).cast("string"))
                ),
                1,
                hex_chars,
            ),
        )
        out = out.withColumn(
            c, F.when(F.col(c).isNull(), F.lit(None).cast("string")).otherwise(token)
        )
    return out


def date_shift(
    df: DataFrame,
    ts_col: str,
    entity_col: str,
    max_shift_days: int = 365,
    salt: str = "v1",
    out: str | None = None,
) -> DataFrame:
    """Per-entity deterministic date shifting (the HIPAA-style
    de-identification move): every timestamp of an entity moves by the
    SAME hash-derived offset in ``[-max_shift_days, +max_shift_days]``,
    so within-entity intervals — session gaps, response latencies,
    ordering — are exactly preserved while absolute dates (and
    cross-entity co-occurrence) are destroyed. Deterministic: re-runs
    and backfills shift identically; change ``salt`` per release.

    Scale: the offset is a row-local md5 expression of the entity key —
    no per-entity lookup table, no shuffle, codegen end to end."""
    if max_shift_days <= 0:
        raise ValueError("max_shift_days must be positive")
    span = 2 * int(max_shift_days) + 1
    from feature_engineering_tk_spark.operators.dedup import _hash60

    days = (
        F.pmod(
            _hash60(F.concat_ws("\x1f", F.lit(salt), F.col(entity_col).cast("string"))),
            F.lit(span),
        )
        - F.lit(int(max_shift_days))
    )
    shifted = F.timestamp_add("DAY", days.cast("int"), F.col(ts_col))
    return df.withColumn(out or ts_col, shifted)

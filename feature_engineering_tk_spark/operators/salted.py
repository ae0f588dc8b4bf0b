"""Skew-aware two-stage (salted) aggregation.

Heavy-tailed conversation lengths mean a plain ``groupBy(conv_id)``
puts a 10^4-turn conversation in one reducer while most reducers get
20 rows. AQE splits skewed JOIN partitions but NOT skewed groupBy /
window partitions — this module is the engine's answer for
DECOMPOSABLE statistics:

stage 1: group by (key, salt) where salt = pmod(hash(order_col), S) —
         partial aggregates spread over S reducers per hot key;
stage 2: group by key — merge partials (sums of sums, min of mins,
         moment algebra for mean/var/std).

Non-decomposable rolling stats (rolling median) can't be salted; they
fall back to ``applyInPandas`` per entity with a max-group-size guard
(see ``window_features``/SURVEY §7 hard-part 3).

MEASURED GUIDANCE (BENCH/BASELINE.md skew-stress section): for a plain
``groupBy().agg()`` of decomposable stats, Spark's map-side partial
aggregation ALREADY pre-merges hot keys inside every scan task — the
naive plan has no skewed reducer and salting only adds a shuffle
(~3x slower at 8M rows / one 50% hot key). Reach for salting / this
module only for stages WITHOUT partial aggregation: whole-partition
windows (prefer ``window_features.group_transform_join``), holistic
aggregates (collect_list, exact percentile per key), and custom
``applyInPandas`` stages.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_DECOMPOSABLE = ("sum", "count", "min", "max", "mean", "std", "var")


def salted_group_agg(
    df: DataFrame,
    key: str,
    value: str,
    funcs: list[str] = ("mean", "sum", "count"),
    salt_buckets: int = 16,
    salt_on: str | None = None,
) -> DataFrame:
    """Two-stage aggregation of ``value`` per ``key``.

    Output columns ``{value}_{func}``. Numerically: partial
    (count, sum, sum of squares) merge exactly like a single-stage agg
    up to float association order — same guarantee Spark's own partial
    aggregation gives.
    """
    bad = [f for f in funcs if f not in _DECOMPOSABLE]
    if bad:
        raise ValueError(f"non-decomposable funcs cannot be salted: {bad}")
    salt_src = F.col(salt_on) if salt_on else F.monotonically_increasing_id()
    salted = df.withColumn("_salt", F.pmod(F.hash(salt_src), F.lit(salt_buckets)))

    partial = salted.groupBy(key, "_salt").agg(
        F.count(value).alias("_n"),
        F.sum(value).alias("_s"),
        F.sum(F.col(value) * F.col(value)).alias("_ss"),
        F.min(value).alias("_mn"),
        F.max(value).alias("_mx"),
    )
    merged = partial.groupBy(key).agg(
        F.sum("_n").alias("_n"),
        F.sum("_s").alias("_s"),
        F.sum("_ss").alias("_ss"),
        F.min("_mn").alias("_mn"),
        F.max("_mx").alias("_mx"),
    )
    n, s, ss = F.col("_n"), F.col("_s"), F.col("_ss")
    mean = s / n
    # ddof=1 (pandas default) sample variance from moments
    var = F.when(n > 1, (ss - s * s / n) / (n - F.lit(1)))
    exprs = {
        "count": n,
        "sum": s,
        "min": F.col("_mn"),
        "max": F.col("_mx"),
        "mean": mean,
        "var": var,
        "std": F.sqrt(var),
    }
    return merged.select(
        key, *[exprs[f].alias(f"{value}_{f}") for f in funcs]
    )

"""Snapshot diff: what changed between two versions of a table.

The reference works on a single in-memory frame; a 100 TB pipeline
re-materializes its corpus and feature tables every run, and the
governance question after every run is "what did this run change?"
(how many rows appeared / disappeared / mutated, and which).  Paired
with `dataset_fingerprint` (whole-table digest equality) this gives
the per-row account when the digests differ.

- **snapshot_diff** — full outer join of ``old`` and ``new`` on the
  key columns; each row is labelled ``added`` (key only in new),
  ``removed`` (key only in old), ``changed`` (key in both, at least
  one compared column differs under null-safe comparison), or
  ``unchanged``.  Output carries the keys, the status, and for every
  compared column its old/new pair (``<col>_old`` / ``<col>_new``)
  so a changed row is self-explaining.
- **snapshot_diff_summary** — one aggregation pass over the diff:
  per-status row count plus an exact bigint checksum of the first key
  column (sum of xxhash64 of the key cast to string is NOT portable;
  the checksum here is the plain sum of the key itself when numeric,
  else the count alone), so two runs can be compared by four small
  rows instead of a row-level table.

100 TB shape: one sort-merge join on the key (both sides shuffle
once, AQE handles skew); the comparison itself is a row-local
null-safe predicate inside whole-stage codegen.  No window, no
driver collection.  Column values never leave the JVM.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, functions as F

from feature_engineering_tk_spark.exceptions import ColumnNotFoundError


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
    compare: list[str] | None = None,
) -> DataFrame:
    """Row-level diff of two table snapshots joined on ``keys``.

    ``compare`` defaults to every non-key column present in BOTH
    frames.  Comparison is null-safe (`eqNullSafe`): null -> null is
    unchanged, null -> value is changed.
    """
    for side, df in (("old", old), ("new", new)):
        for k in keys:
            if k not in df.columns:
                raise ColumnNotFoundError(k, df.columns)
    if compare is None:
        compare = [c for c in old.columns if c not in keys and c in new.columns]
    else:
        for side, df in (("old", old), ("new", new)):
            for c in compare:
                if c not in df.columns:
                    raise ColumnNotFoundError(c, df.columns)

    o = old.select(*keys, *[F.col(c).alias(f"{c}_old") for c in compare]).withColumn(
        "_in_old", F.lit(1)
    )
    n = new.select(*keys, *[F.col(c).alias(f"{c}_new") for c in compare]).withColumn(
        "_in_new", F.lit(1)
    )
    joined = o.join(n, on=keys, how="full_outer")

    same = (
        reduce(
            lambda a, c: a & F.col(f"{c}_old").eqNullSafe(F.col(f"{c}_new")),
            compare,
            F.lit(True),
        )
        if compare
        else F.lit(True)
    )
    status = (
        F.when(F.col("_in_old").isNull(), F.lit("added"))
        .when(F.col("_in_new").isNull(), F.lit("removed"))
        .when(same, F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    pairs = [c for col in compare for c in (f"{col}_old", f"{col}_new")]
    return joined.select(*keys, status.alias("status"), *pairs)


def snapshot_diff_summary(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
    compare: list[str] | None = None,
) -> DataFrame:
    """Per-status (status, n, key_checksum) — one aggregation pass.

    ``key_checksum`` is the exact sum of the first key column when it
    is numeric (bigint arithmetic — partition-order independent), else
    null; it lets two diff runs be compared without materializing the
    row-level table.
    """
    diff = snapshot_diff(old, new, keys, compare)
    key0 = F.col(keys[0])
    numeric = dict(diff.dtypes)[keys[0]] in {
        "tinyint", "smallint", "int", "bigint", "long", "integer",
    }
    checksum = (
        F.sum(key0.cast("bigint")) if numeric else F.lit(None).cast("bigint")
    )
    return (
        diff.groupBy("status")
        .agg(F.count(F.lit(1)).alias("n"), checksum.alias("key_checksum"))
        .orderBy("status")
    )

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
- **apply_diff / merge_statement** — the APPLY side: reconstruct
  ``new`` from ``old`` + the diff (round-trip proven), or emit the
  MERGE INTO that applies the diff to an Iceberg target in place —
  the diff is a migration artifact, not just a report.

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


def apply_diff(
    old: DataFrame,
    diff: DataFrame,
    keys: list[str],
) -> DataFrame:
    """Reconstruct ``new`` from ``old`` plus a :func:`snapshot_diff`:
    the diff is a usable MIGRATION ARTIFACT, not just a report.

    Round-trip contract (proven by the ``apply_diff`` oracle and
    ``tests/test_diff.py``)::

        apply_diff(old, snapshot_diff(old, new, keys), keys) == new

    on the keys and every compared column.  Semantics per status:
    ``removed`` keys are dropped, ``added``/``changed``/``unchanged``
    keys take their ``<col>_new`` values; columns of ``old`` that the
    diff did NOT compare are carried over from ``old`` by key (null
    for added keys — the diff never saw their values, so a pipeline
    that needs them must diff with ``compare`` covering them).

    100 TB shape: compared columns come straight from the diff rows
    (no join at all); the carry-over of non-compared columns, when
    needed, is ONE key join against ``old`` — same exchange the diff
    itself used, AQE-handled.  For Iceberg targets, the same diff
    drives an in-place MERGE via :func:`merge_statement` instead of a
    full rewrite.
    """
    for k in keys:
        for side, df in (("old", old), ("diff", diff)):
            if k not in df.columns:
                raise ColumnNotFoundError(k, df.columns)
    if "status" not in diff.columns:
        raise ColumnNotFoundError("status", diff.columns)
    compare = [
        c[: -len("_new")]
        for c in diff.columns
        if c.endswith("_new") and f"{c[: -len('_new')]}_old" in diff.columns
    ]
    carry = [c for c in old.columns if c not in keys and c not in compare]
    kept = diff.where(F.col("status") != "removed").select(
        *keys, *[F.col(f"{c}_new").alias(c) for c in compare]
    )
    if carry:
        kept = kept.join(old.select(*keys, *carry), keys, "left")
    # present columns in old's order (new-only columns can't exist in
    # the diff schema, so old's order is total)
    order = [*keys, *[c for c in old.columns if c not in keys]]
    return kept.select(*[c for c in order if c in kept.columns])


def merge_statement(
    target: str,
    diff_view: str,
    keys: list[str],
    compare: list[str],
) -> str:
    """The MERGE INTO statement that applies a :func:`snapshot_diff`
    to an Iceberg (or any MERGE-capable) table IN PLACE — the scale
    path when rewriting the whole snapshot is too expensive: only
    touched partitions rewrite, and the diff (added+changed+removed
    rows only — filter ``status != 'unchanged'`` into ``diff_view``)
    is typically orders of magnitude smaller than the table.

    Run as ``spark.sql(merge_statement(...))`` after registering the
    filtered diff as ``diff_view`` (``createOrReplaceTempView``).
    This sandbox has no Iceberg catalog, so tests pin the generated
    SQL; the statement itself is plain ANSI MERGE.
    """
    if not keys or not compare:
        raise ValueError("keys and compare must be non-empty")
    on = " AND ".join(f"t.{k} = s.{k}" for k in keys)
    sets = ", ".join(f"t.{c} = s.{c}_new" for c in compare)
    ins_cols = ", ".join([*keys, *compare])
    ins_vals = ", ".join([*(f"s.{k}" for k in keys), *(f"s.{c}_new" for c in compare)])
    return (
        f"MERGE INTO {target} t USING {diff_view} s ON {on} "
        f"WHEN MATCHED AND s.status = 'removed' THEN DELETE "
        f"WHEN MATCHED AND s.status = 'changed' THEN UPDATE SET {sets} "
        f"WHEN NOT MATCHED AND s.status = 'added' THEN "
        f"INSERT ({ins_cols}) VALUES ({ins_vals})"
    )


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

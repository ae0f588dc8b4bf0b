"""Wide↔long reshape: melt and deterministic pivot aggregation.

The reference lives on pandas, where ``melt`` and ``pivot_table`` are
ambient; a migrating user reaches for them immediately (class-wise
statistics tables, per-category feature matrices, metric long-tables
for plotting).  Spark has the primitives (``unpivot``, conditional
aggregation) but both need determinism discipline at corpus scale:

- **melt** — wide→long over Spark's native ``unpivot`` (a zero-shuffle
  generator: each input row expands to len(value_vars) rows in the
  same task; no exchange, no UDF).  Mixed numeric input types are
  cast to double up front so the value column has one type instead of
  failing Spark's common-type check.
- **pivot_agg** — long→wide as ONE conditional-aggregation pass:
  ``agg(func(when(column == v, value)))`` per category.  The category
  list is either caller-supplied or collected sorted (bounded by
  ``max_categories`` — the one-hot cardinality-guard convention), so
  the output COLUMN ORDER is deterministic — the reason this is not
  ``groupBy().pivot()`` with inferred values, whose column order
  depends on a collect.  Sums over doubles are order-dependent; pass
  ``decimal_scale`` to accumulate money-like columns exactly
  (decimal sums, cast back to double), the pricing_summary pattern.

100 TB shape: melt is map-side only; pivot_agg is one map-side-
combined groupBy on the index keys — categories × groups cells, the
data table is scanned once and never shuffled wider than the index
key.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, functions as F

from feature_engineering_tk_spark.exceptions import (
    ColumnNotFoundError,
    ValidationError,
)

# deliberately no "first": F.first over an unordered group is
# partition-order dependent, which breaks the engine's determinism
# contract — use min/max for a stable representative instead
_AGGS = {
    "sum": F.sum,
    "mean": F.avg,
    "avg": F.avg,
    "min": F.min,
    "max": F.max,
    "count": F.count,
}


def _safe(name: str) -> str:
    return re.sub(r"[^A-Za-z0-9_]", "_", str(name))


def melt(
    df: DataFrame,
    id_vars: list[str],
    value_vars: list[str] | None = None,
    var_name: str = "variable",
    value_name: str = "value",
    cast: str | None = "double",
) -> DataFrame:
    """Wide→long: one output row per (input row × value column)."""
    for c in id_vars:
        if c not in df.columns:
            raise ColumnNotFoundError(c, df.columns)
    if value_vars is None:
        value_vars = [c for c in df.columns if c not in id_vars]
    else:
        for c in value_vars:
            if c not in df.columns:
                raise ColumnNotFoundError(c, df.columns)
    if not value_vars:
        raise ValueError("melt needs at least one value column")
    src = df
    if cast is not None:
        # Plan-time guard: force-casting a string/date value column would
        # fail mid-scan under ANSI mode (or silently null without it),
        # which is strictly worse than the clear common-type error
        # unpivot itself raises.  Only numeric/boolean columns are safely
        # castable to a numeric target; reject anything else up front.
        from pyspark.sql.types import BooleanType, NumericType

        by_name = {f.name: f.dataType for f in df.schema.fields}
        bad = [
            c
            for c in value_vars
            if not isinstance(by_name[c], (NumericType, BooleanType))
        ]
        if bad:
            raise ValidationError(
                f"melt(cast={cast!r}): non-numeric value columns {bad} "
                "cannot be safely cast; pass cast=None or exclude them "
                "from value_vars"
            )
        src = df.select(
            *id_vars, *[F.col(c).cast(cast).alias(c) for c in value_vars]
        )
    return src.unpivot(id_vars, value_vars, var_name, value_name)


def pivot_agg(
    df: DataFrame,
    index: list[str],
    column: str,
    value: str,
    func: str = "sum",
    categories: list | None = None,
    max_categories: int = 1000,
    decimal_scale: int | None = None,
    fill: float | None = None,
) -> DataFrame:
    """Long→wide: ``index`` rows × one ``{value}_{func}_{category}``
    column per category, deterministic column order."""
    for c in [*index, column, value]:
        if c not in df.columns:
            raise ColumnNotFoundError(c, df.columns)
    if func not in _AGGS:
        raise ValueError(f"unknown func {func!r}; choose from {sorted(_AGGS)}")
    if categories is None:
        rows = (
            df.select(column)
            .where(F.col(column).isNotNull())
            .distinct()
            .limit(max_categories + 1)
            .collect()
        )
        if len(rows) > max_categories:
            raise ValidationError(
                f"pivot_agg: {column!r} exceeds max_categories={max_categories}; "
                "pass an explicit `categories` list to pivot a bounded subset"
            )
        categories = sorted(r[0] for r in rows)
    agg_fn = _AGGS[func]
    val = F.col(value)
    if decimal_scale is not None and func in ("sum", "mean", "avg"):
        val = val.cast(f"decimal(18,{decimal_scale})")
    cells = []
    for cat in categories:
        cell = agg_fn(F.when(F.col(column) == F.lit(cat), val))
        if decimal_scale is not None and func in ("sum", "mean", "avg"):
            cell = cell.cast("double")
        if fill is not None:
            cell = F.coalesce(cell, F.lit(fill))
        cells.append(cell.alias(f"{_safe(value)}_{func}_{_safe(cat)}"))
    return df.groupBy(*index).agg(*cells)

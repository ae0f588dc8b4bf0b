"""Numeric feature constructors — reference §2.7. All pure column
arithmetic (codegen); fit-like statistics (log offset, sqrt min check)
are one aggregate pass.
"""

from __future__ import annotations

import warnings
from itertools import combinations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def polynomial_features(
    df: DataFrame, columns: list[str], degree: int = 2, interaction_only: bool = False
) -> DataFrame:
    """reference feature_engineering.py:294-368 — naming contract:
    ``{c}_squared``/``{c}_cubed`` powers, ``{a}_x_{b}`` pairwise,
    ``{a}_x_{b}_x_{c}`` 3-way."""
    if degree not in (2, 3):
        raise ValueError("degree must be 2 or 3")
    upd: dict[str, Column] = {}
    if not interaction_only:
        for c in columns:
            upd[f"{c}_squared"] = F.col(c) * F.col(c)
        if degree == 3:
            for c in columns:
                upd[f"{c}_cubed"] = F.col(c) * F.col(c) * F.col(c)
    if degree == 2 or interaction_only:
        for a, b in combinations(columns, 2):
            upd[f"{a}_x_{b}"] = F.col(a) * F.col(b)
    if degree == 3 and interaction_only:
        if len(columns) < 3:
            raise ValueError("3-way interactions need >= 3 columns")
        upd = {}
        for a, b, c in combinations(columns, 3):
            upd[f"{a}_x_{b}_x_{c}"] = F.col(a) * F.col(b) * F.col(c)
    return df.withColumns(upd)


def log_transform(df: DataFrame, columns: list[str], suffix: str = "_log") -> DataFrame:
    """reference feature_engineering.py:444-477 — ``ln(x + offset)``,
    offset = ``abs(min)+1`` if min <= 0 else 0 (fitted in one pass)."""
    row = df.agg(*[F.min(c).alias(c) for c in columns]).first()
    upd = {}
    for c in columns:
        mn = row[c]
        offset = abs(mn) + 1.0 if mn is not None and mn <= 0 else 0.0
        upd[f"{c}{suffix}"] = F.log(F.col(c) + F.lit(offset))
    return df.withColumns(upd)


def sqrt_transform(df: DataFrame, columns: list[str], suffix: str = "_sqrt") -> DataFrame:
    """reference feature_engineering.py:479-511 — skip (warn) columns
    containing negatives."""
    row = df.agg(*[F.min(c).alias(c) for c in columns]).first()
    upd = {}
    for c in columns:
        if row[c] is not None and row[c] < 0:
            warnings.warn(f"{c} contains negative values; skipping sqrt")
            continue
        upd[f"{c}{suffix}"] = F.sqrt(F.col(c))
    return df.withColumns(upd)


def ratio_features(
    df: DataFrame,
    pairs: list[tuple[str, str]],
    eps: float = 1e-8,
    names: dict[tuple[str, str], str] | None = None,
) -> DataFrame:
    """reference feature_engineering.py:629-663 — ``num/(den+eps)``,
    default name ``{n}_to_{d}_ratio``."""
    names = names or {}
    return df.withColumns(
        {
            names.get((n, d), f"{n}_to_{d}_ratio"): F.col(n) / (F.col(d) + F.lit(eps))
            for n, d in pairs
        }
    )


def flag_features(df: DataFrame, flags: dict[str, Column]) -> DataFrame:
    """reference feature_engineering.py:665-703 — boolean condition →
    0/1 int column. Conditions are Column expressions (the reference's
    callable form maps to an expression, or a vectorized pandas UDF if
    genuinely not expressible)."""
    return df.withColumns({name: cond.cast("int") for name, cond in flags.items()})

"""Datetime extraction — reference ``create_datetime_features``
(``feature_engineering.py:513-574``), 13 extractors, output columns
``{column}_{feature}``.

Parity trap: pandas ``dayofweek`` is Monday=0..Sunday=6 while Spark's
``dayofweek`` is Sunday=1..Saturday=7 → ``(dayofweek + 5) % 7``.
``weekofyear`` is ISO-8601 in both. All extractors are built-in JVM
expressions (codegen, no UDF).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_EXTRACTORS: dict[str, callable] = {
    "year": F.year,
    "month": F.month,
    "day": F.dayofmonth,
    "hour": F.hour,
    "minute": F.minute,
    "second": F.second,
    "quarter": F.quarter,
    # pandas Monday=0 convention
    "dayofweek": lambda c: (F.dayofweek(c) + F.lit(5)) % F.lit(7),
    "dayofyear": F.dayofyear,
    "weekofyear": F.weekofyear,
    "is_weekend": lambda c: F.dayofweek(c).isin(1, 7).cast("int"),
    "is_month_start": lambda c: (F.dayofmonth(c) == 1).cast("int"),
    "is_month_end": lambda c: (F.to_date(c) == F.last_day(c)).cast("int"),
}

ALL_FEATURES = list(_EXTRACTORS)


def datetime_features(
    df: DataFrame, column: str, features: list[str] | None = None
) -> DataFrame:
    feats = features or ALL_FEATURES
    unknown = [f for f in feats if f not in _EXTRACTORS]
    if unknown:
        raise ValueError(f"unknown datetime features: {unknown}")
    c = F.col(column)
    return df.withColumns(
        {f"{column}_{f}": _EXTRACTORS[f](c).cast("int") for f in feats}
    )

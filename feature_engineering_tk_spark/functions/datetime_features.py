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


# period of each cyclical datetime part (dayofweek uses the pandas
# Monday=0 extractor above, so the cycle is exactly 0..6)
_CYCLE_PERIODS = {"hour": 24.0, "dayofweek": 7.0, "month": 12.0,
                  "day": 31.0, "minute": 60.0, "second": 60.0,
                  "quarter": 4.0, "dayofyear": 366.0}


def cyclical_encode(
    df: DataFrame, column: str, features: list[str] | None = None
) -> DataFrame:
    """Cyclical (sin/cos) encoding of datetime parts — the standard fix
    for the wrap-around defect in the reference's raw extractors
    (``feature_engineering.py:513-574``): hour 23 and hour 0 are one
    step apart on the clock but 23 apart as integers, which distance-
    based models mis-read. Emits ``{column}_{part}_sin`` / ``_cos`` =
    sin/cos(2π · part / period). Pure JVM column arithmetic on top of
    the existing extractors — codegen, no shuffle, no UDF."""
    feats = features or ["hour", "dayofweek", "month"]
    unknown = [f for f in feats if f not in _CYCLE_PERIODS]
    if unknown:
        raise ValueError(f"no cyclical period for: {unknown}; have {sorted(_CYCLE_PERIODS)}")
    two_pi = 2.0 * 3.141592653589793
    cols = {}
    for f_ in feats:
        part = _EXTRACTORS[f_](F.col(column)).cast("double")
        theta = part * F.lit(two_pi / _CYCLE_PERIODS[f_])
        cols[f"{column}_{f_}_sin"] = F.sin(theta)
        cols[f"{column}_{f_}_cos"] = F.cos(theta)
    return df.withColumns(cols)

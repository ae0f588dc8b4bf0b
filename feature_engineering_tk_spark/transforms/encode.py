"""Categorical encoders — reference §2.5.

- :class:`LabelEncoder` — ``encode_categorical_label``
  (``feature_engineering.py:55-112``): codes are the rank of the value
  in the LEXICOGRAPHICALLY SORTED unique non-null values (sklearn
  LabelEncoder convention, NOT frequency order); nulls stay null and
  upcast the column to double (pandas float64-on-NaN parity).
- :class:`OneHotEncoder` — ``encode_categorical_onehot``
  (``feature_engineering.py:114-184``): one int 0/1 column
  ``{prefix}_{value}`` per category in sorted order, original column
  dropped, ``drop_first`` skips the first, ``dummy_na`` adds a null
  indicator; warns above 100 categories (reference threshold).
- :class:`OrdinalEncoder` — ``encode_categorical_ordinal``
  (``feature_engineering.py:186-224``): explicit ordered category list,
  unknown → -1, double output (sklearn OrdinalEncoder parity).

Scale: vocabularies are fitted with ``distinct()`` (bounded by the
high-cardinality warning) and applied as literal map expressions —
no join, no shuffle on the big table. For vocabularies too large for a
literal map, ``transform`` falls back to a broadcast join.
"""

from __future__ import annotations

import warnings

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from feature_engineering_tk_spark.transforms.state import FittedStateMixin

# reference feature_engineering.py:42
HIGH_CARDINALITY_WARNING_THRESHOLD = 100
_MAP_EXPR_MAX = 1000  # above this, use broadcast join instead of literal map


def _fit_vocab(df: DataFrame, column: str) -> list[str]:
    vals = (
        df.select(F.col(column).cast("string").alias("v"))
        .filter(F.col("v").isNotNull())
        .distinct()
        .orderBy("v")
        .collect()
    )
    return [r["v"] for r in vals]


class LabelEncoder(FittedStateMixin):
    def __init__(self):
        self.state_ = None

    def fit(self, df: DataFrame, column: str) -> "LabelEncoder":
        vocab = _fit_vocab(df, column)
        has_null = df.filter(F.col(column).isNull()).limit(1).count() > 0
        self.state_ = {"column": column, "vocab": vocab, "has_null": has_null}
        return self

    def transform(self, df: DataFrame, out: str | None = None) -> DataFrame:
        self._require_fitted()
        column = self.state_["column"]
        vocab = self.state_["vocab"]
        out = out or column
        dtype = "double" if self.state_["has_null"] else "long"
        if len(vocab) <= _MAP_EXPR_MAX:
            mapping = F.create_map(
                *[x for v, i in zip(vocab, range(len(vocab))) for x in (F.lit(v), F.lit(i))]
            )
            code = mapping[F.col(column).cast("string")]
            return df.withColumn(out, F.when(F.col(column).isNotNull(), code).cast(dtype))
        # large-vocab path: broadcast join on the code table
        spark = df.sparkSession
        codes = spark.createDataFrame(
            [(v, i) for i, v in enumerate(vocab)], schema=f"__v string, {out} {dtype}"
        )
        return (
            df.withColumn("__v", F.col(column).cast("string"))
            .join(F.broadcast(codes), "__v", "left")
            .drop("__v")
        )


class OneHotEncoder(FittedStateMixin):
    def __init__(self, prefix: str | None = None, drop_first: bool = False, dummy_na: bool = False):
        self.prefix = prefix
        self.drop_first = drop_first
        self.dummy_na = dummy_na
        self.state_ = None

    def get_params(self):
        return {"prefix": self.prefix, "drop_first": self.drop_first, "dummy_na": self.dummy_na}

    def fit(self, df: DataFrame, column: str) -> "OneHotEncoder":
        vocab = _fit_vocab(df, column)
        if len(vocab) > HIGH_CARDINALITY_WARNING_THRESHOLD:
            warnings.warn(
                f"{column} has {len(vocab)} categories "
                f"(> {HIGH_CARDINALITY_WARNING_THRESHOLD}); one-hot may explode width"
            )
        self.state_ = {"column": column, "vocab": vocab}
        return self

    def transform(self, df: DataFrame) -> DataFrame:
        self._require_fitted()
        column = self.state_["column"]
        vocab = self.state_["vocab"]
        prefix = self.prefix or column
        cats = vocab[1:] if self.drop_first else vocab
        cols = {
            f"{prefix}_{v}": (F.col(column).cast("string") == F.lit(v)).cast("int")
            for v in cats
        }
        # NaN row → all zeros (pandas get_dummies): null comparison yields
        # null → coalesce to 0
        cols = {k: F.coalesce(c, F.lit(0)) for k, c in cols.items()}
        if self.dummy_na:
            cols[f"{prefix}_nan"] = F.col(column).isNull().cast("int")
        return df.withColumns(cols).drop(column)


class OrdinalEncoder(FittedStateMixin):
    def __init__(self, categories: list | None = None):
        self.categories = categories
        self.state_ = None

    def get_params(self):
        return {"categories": self.categories}

    def fit(self, df: DataFrame, column: str) -> "OrdinalEncoder":
        if self.categories is None:
            raise ValueError("ordinal encoding requires an explicit ordered category list")
        self.state_ = {"column": column, "categories": [str(c) for c in self.categories]}
        return self

    def transform(self, df: DataFrame, out: str | None = None) -> DataFrame:
        self._require_fitted()
        column = self.state_["column"]
        cats = self.state_["categories"]
        out = out or column
        mapping = F.create_map(
            *[x for v, i in zip(cats, range(len(cats))) for x in (F.lit(v), F.lit(float(i)))]
        )
        code = F.coalesce(mapping[F.col(column).cast("string")], F.lit(-1.0))
        return df.withColumn(
            out, F.when(F.col(column).isNull(), F.lit(-1.0)).otherwise(code).cast("double")
        )

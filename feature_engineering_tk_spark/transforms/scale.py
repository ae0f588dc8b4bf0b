"""Scaling fit/transform — reference ``scale_features``
(``feature_engineering.py:226-292``).

Parity traps handled:
- 'standard' uses POPULATION std (sklearn StandardScaler ddof=0; the
  reference's tests assert ``std(ddof=0)==1``) → ``stddev_pop``.
- 'robust' uses EXACT quantiles with linear interpolation (sklearn
  RobustScaler) → ``percentile``, never ``percentile_approx``.

Scale path: fit is ONE aggregate job over all columns (map-side
partial aggregation, tiny result to driver); transform is pure column
arithmetic with the fitted scalars folded in as literals — fully
codegen'd, no shuffle, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from feature_engineering_tk_spark.transforms.state import FittedStateMixin


class Scaler(FittedStateMixin):
    def __init__(self, method: str = "standard", exact: bool = True):
        if method not in ("standard", "minmax", "robust"):
            from feature_engineering_tk_spark.exceptions import InvalidMethodError

            raise InvalidMethodError(method, ["standard", "minmax", "robust"])
        self.method = method
        # exact=False: robust quantiles via percentile_approx — the
        # 100 TB refit path; parity-contract surfaces keep exact=True
        self.exact = exact
        self.state_ = None

    def get_params(self):
        return {"method": self.method, "exact": self.exact}

    def fit(self, df: DataFrame, columns: list[str]) -> "Scaler":
        if df.isEmpty():
            from feature_engineering_tk_spark.exceptions import EmptyDataFrameError

            raise EmptyDataFrameError("cannot fit scaler on empty DataFrame")
        aggs = []
        for c in columns:
            if self.method == "standard":
                aggs += [F.avg(c).alias(f"{c}__m"), F.stddev_pop(c).alias(f"{c}__s")]
            elif self.method == "minmax":
                aggs += [F.min(c).alias(f"{c}__m"), F.max(c).alias(f"{c}__s")]
            else:  # robust: median + IQR
                pct = F.percentile if self.exact else (
                    lambda col, p: F.percentile_approx(col, p, F.lit(10000))
                )
                aggs += [
                    pct(F.col(c), F.lit(0.5)).alias(f"{c}__m"),
                    (
                        pct(F.col(c), F.lit(0.75)) - pct(F.col(c), F.lit(0.25))
                    ).alias(f"{c}__s"),
                ]
        row = df.agg(*aggs).first()
        self.state_ = {
            "columns": list(columns),
            "center": {c: row[f"{c}__m"] for c in columns},
            "scale": {c: row[f"{c}__s"] for c in columns},
        }
        return self

    def transform(self, df: DataFrame) -> DataFrame:
        self._require_fitted()
        upd = {}
        for c in self.state_["columns"]:
            m, s = self.state_["center"][c], self.state_["scale"][c]
            if self.method == "minmax":
                denom = (s - m) or 1.0  # max-min; guard constant col
                upd[c] = (F.col(c) - F.lit(m)) / F.lit(denom)
            else:
                denom = s or 1.0
                upd[c] = (F.col(c) - F.lit(m)) / F.lit(denom)
        return df.withColumns(upd)

    def fit_transform(self, df: DataFrame, columns: list[str]) -> DataFrame:
        return self.fit(df, columns).transform(df)

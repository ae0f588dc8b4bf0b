"""Outlier detection & handling — reference §2.4
(``data_analysis.py:96-141``, ``preprocessing.py:274-421``).

- IQR: Q1/Q3 via EXACT ``percentile`` (pandas linear interpolation),
  fence = [Q1 - k·IQR, Q3 + k·IQR], default k=1.5.
- zscore: |x-mean|/std > t, std ddof=1 (``stddev_samp``), zero-std
  columns skipped (never flagged).
- actions: remove (masks OR-combined across columns, applied once —
  the reference's single-pass optimization), cap (clamp at the fence),
  replace with median/mean/null.

Fit is one aggregate job; flag/handle are pure column expressions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from feature_engineering_tk_spark.transforms.state import FittedStateMixin


class OutlierDetector(FittedStateMixin):
    def __init__(self, method: str = "iqr", factor: float = 1.5, threshold: float = 3.0):
        if method not in ("iqr", "zscore"):
            from feature_engineering_tk_spark.exceptions import InvalidMethodError

            raise InvalidMethodError(method, ["iqr", "zscore"])
        self.method = method
        self.factor = factor  # IQR multiplier
        self.threshold = threshold  # zscore cutoff
        self.state_ = None

    def get_params(self):
        return {"method": self.method, "factor": self.factor, "threshold": self.threshold}

    def fit(self, df: DataFrame, columns: list[str]) -> "OutlierDetector":
        aggs = []
        for c in columns:
            if self.method == "iqr":
                aggs += [
                    F.percentile(F.col(c), F.lit(0.25)).alias(f"{c}__q1"),
                    F.percentile(F.col(c), F.lit(0.75)).alias(f"{c}__q3"),
                ]
            else:
                aggs += [F.avg(c).alias(f"{c}__m"), F.stddev_samp(c).alias(f"{c}__s")]
        row = df.agg(*aggs).first()
        bounds = {}
        for c in columns:
            if self.method == "iqr":
                q1, q3 = row[f"{c}__q1"], row[f"{c}__q3"]
                iqr = q3 - q1
                bounds[c] = {"lo": q1 - self.factor * iqr, "hi": q3 + self.factor * iqr}
            else:
                m, s = row[f"{c}__m"], row[f"{c}__s"]
                if s is None or s == 0:
                    bounds[c] = None  # zero-std skip (reference data_analysis.py:132)
                else:
                    bounds[c] = {"lo": m - self.threshold * s, "hi": m + self.threshold * s}
        self.state_ = {"columns": list(columns), "bounds": bounds}
        return self

    def _mask(self, c: str):
        b = self.state_["bounds"][c]
        if b is None:
            return F.lit(False)
        return (F.col(c) < F.lit(b["lo"])) | (F.col(c) > F.lit(b["hi"]))

    def flag(self, df: DataFrame, columns: list[str] | None = None, suffix: str = "_is_outlier") -> DataFrame:
        self._require_fitted()
        cols = columns or self.state_["columns"]
        return df.withColumns({f"{c}{suffix}": self._mask(c).cast("int") for c in cols})

    def remove(self, df: DataFrame) -> DataFrame:
        """OR of per-column masks, one filter pass (preprocessing.py:326-327)."""
        self._require_fitted()
        mask = F.lit(False)
        for c in self.state_["columns"]:
            mask = mask | F.coalesce(self._mask(c), F.lit(False))
        return df.filter(~mask)

    def cap(self, df: DataFrame) -> DataFrame:
        """Clamp at the fence (preprocessing.py:375-386); int cols upcast
        to double first (pandas parity)."""
        self._require_fitted()
        upd = {}
        for c in self.state_["columns"]:
            b = self.state_["bounds"][c]
            if b is None:
                continue
            upd[c] = F.least(F.greatest(F.col(c).cast("double"), F.lit(b["lo"])), F.lit(b["hi"]))
        return df.withColumns(upd)

    def replace(self, df: DataFrame, replacement: dict[str, float] | None = None) -> DataFrame:
        """Outliers → replacement value per column (median/mean computed
        by the caller, or null) — preprocessing.py:388-401."""
        self._require_fitted()
        replacement = replacement or {}
        upd = {}
        for c in self.state_["columns"]:
            val = replacement.get(c)
            upd[c] = F.when(self._mask(c), F.lit(val)).otherwise(F.col(c).cast("double"))
        return df.withColumns(upd)

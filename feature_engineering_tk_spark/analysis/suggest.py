"""Suggestion / recommendation heuristics (reference §2.17).

Driver-side business logic over distributed sufficient statistics —
the heavy pass (moments, cardinality, missing ratios, outlier rates)
runs as ONE Spark aggregation; the rule tables below run on the
collected scalars, near-verbatim from the reference:

- suggest_binning            data_analysis.py:351-443
- suggest_feature_engineering target_analyzer/suggestions.py:63-259
- recommend_models           target_analyzer/suggestions.py:280-491
- generate_recommendations   target_analyzer/quality.py:156-284
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from feature_engineering_tk_spark.analysis.stats import bias_corrected_skew


def _column_profile(df: DataFrame, columns: list[str]) -> dict[str, dict]:
    """One distributed pass: per-column n, nulls, mean, std, min, max,
    skew (bias-corrected G1), q1/q3 (exact percentile), distinct."""
    aggs = [F.count(F.lit(1)).alias("_rows")]
    for c in columns:
        aggs += [
            F.count(c).alias(f"{c}__n"),
            F.avg(c).alias(f"{c}__mean"),
            F.stddev_samp(c).alias(f"{c}__std"),
            F.min(c).alias(f"{c}__min"),
            F.max(c).alias(f"{c}__max"),
            F.skewness(c).alias(f"{c}__g1"),
            F.percentile(c, F.lit(0.25)).alias(f"{c}__q1"),
            F.percentile(c, F.lit(0.75)).alias(f"{c}__q3"),
            F.countDistinct(c).alias(f"{c}__uniq"),
        ]
    row = df.agg(*aggs).first()
    out = {}
    for c in columns:
        n = row[f"{c}__n"] or 0
        g1 = row[f"{c}__g1"]
        out[c] = {
            "rows": row["_rows"],
            "n": n,
            "missing_pct": 100.0 * (row["_rows"] - n) / row["_rows"] if row["_rows"] else 0.0,
            "mean": row[f"{c}__mean"],
            "std": row[f"{c}__std"],
            "min": row[f"{c}__min"],
            "max": row[f"{c}__max"],
            "skew": bias_corrected_skew(g1, n) if g1 is not None and n > 2 else float("nan"),
            "q1": row[f"{c}__q1"],
            "q3": row[f"{c}__q3"],
            "unique": row[f"{c}__uniq"],
        }
    return out


def suggest_binning(df: DataFrame, columns: list[str]) -> list[dict]:
    """Per-column binning strategy from skewness + IQR outlier share
    (data_analysis.py:351-443): heavy skew → quantile bins; outliers
    present → quantile; else uniform; low cardinality → none."""
    prof = _column_profile(df, columns)
    out = []
    for c in columns:
        p = prof[c]
        if p["unique"] is not None and p["unique"] <= 10:
            strategy, reason = "none", "low cardinality (<=10 distinct) — treat as categorical"
        elif not math.isnan(p["skew"]) and abs(p["skew"]) > 1.0:
            strategy, reason = "quantile", f"high skew ({p['skew']:.2f}) — equal-frequency bins"
        elif (
            p["q1"] is not None
            and p["q3"] is not None
            and p["max"] is not None
            and p["q3"] - p["q1"] > 0
            and (p["max"] - p["q3"]) > 3.0 * (p["q3"] - p["q1"])
        ):
            strategy, reason = "quantile", "long tail beyond Q3 — equal-frequency bins"
        else:
            strategy, reason = "uniform", "roughly symmetric — equal-width bins"
        out.append(
            {
                "column": c,
                "strategy": strategy,
                "suggested_bins": 5 if strategy != "none" else 0,
                "reason": reason,
            }
        )
    return out


def suggest_feature_engineering(df: DataFrame, columns: list[str]) -> list[dict]:
    """Transform suggestions per numeric column
    (target_analyzer/suggestions.py:63-259): skew>1 → log (or sqrt when
    negatives present), skew<-1 → square, range>100 → scale, >5% missing
    → indicator."""
    prof = _column_profile(df, columns)
    out = []
    for c in columns:
        p = prof[c]
        sugg: list[str] = []
        if not math.isnan(p["skew"]) and p["skew"] > 1.0:
            sugg.append("log_transform" if (p["min"] is not None and p["min"] >= 0) else "sqrt_after_shift")
        elif not math.isnan(p["skew"]) and p["skew"] < -1.0:
            sugg.append("square_transform")
        if (
            p["max"] is not None
            and p["min"] is not None
            and (p["max"] - p["min"]) > 100.0
        ):
            sugg.append("scale")
        if p["missing_pct"] > 5.0:
            sugg.append("missing_indicator")
        out.append({"column": c, "suggestions": sugg or ["none"]})
    return out


def recommend_models(
    n_rows: int,
    n_features: int,
    task: str,
    imbalance_ratio: float | None = None,
) -> list[dict]:
    """Dataset-size / imbalance / dimensionality rule table
    (target_analyzer/suggestions.py:280-491)."""
    recs: list[dict] = []
    small = n_rows < 10_000
    wide = n_features > 0 and n_rows / max(n_features, 1) < 50
    if task == "classification":
        if small:
            recs.append({"model": "LogisticRegression", "priority": 1, "reason": "small dataset — low-variance linear baseline"})
            recs.append({"model": "RandomForestClassifier", "priority": 2, "reason": "non-linear signal without tuning burden"})
        else:
            recs.append({"model": "GradientBoostedTrees", "priority": 1, "reason": "large dataset — boosting usually wins"})
            recs.append({"model": "LogisticRegression", "priority": 2, "reason": "fast distributed baseline"})
        if imbalance_ratio is not None and imbalance_ratio > 3.0:
            recs.append({"model": "class_weighting/resampling", "priority": 1, "reason": f"imbalance ratio {imbalance_ratio:.1f} > 3 — reweight before fitting"})
    else:
        if small:
            recs.append({"model": "LinearRegression(+regularization)", "priority": 1, "reason": "small dataset — ridge/lasso baseline"})
            recs.append({"model": "RandomForestRegressor", "priority": 2, "reason": "non-linear signal"})
        else:
            recs.append({"model": "GradientBoostedTrees", "priority": 1, "reason": "large dataset — boosting usually wins"})
            recs.append({"model": "LinearRegression", "priority": 2, "reason": "fast distributed baseline"})
    if wide:
        recs.append({"model": "feature_selection_first", "priority": 1, "reason": f"rows/features = {n_rows}/{n_features} < 50 — select features before fitting"})
    return recs


def generate_recommendations(quality: dict, high_corr_pairs: list[dict] | None = None) -> list[str]:
    """Prioritized plain-string recommendations from a
    validate_data_quality() result (target_analyzer/quality.py:156-284)."""
    recs: list[str] = []
    for c, pct in sorted(
        quality.get("missing_pct", {}).items(), key=lambda kv: -kv[1]
    ):
        if pct > 30.0:
            recs.append(f"[high] drop or model-impute '{c}' ({pct:.1f}% missing)")
        elif pct > 5.0:
            recs.append(f"[medium] impute '{c}' and add a missing indicator ({pct:.1f}% missing)")
    if quality.get("duplicate_rows", 0) > 0:
        recs.append(f"[high] remove {quality['duplicate_rows']} duplicate rows before fitting")
    for c in quality.get("constant_columns", []):
        recs.append(f"[medium] drop constant column '{c}'")
    for c in quality.get("high_cardinality_columns", []):
        recs.append(f"[medium] '{c}' is >95% unique — likely an identifier, drop or hash-encode")
    for c, cnt in quality.get("infinite_counts", {}).items():
        if cnt:
            recs.append(f"[high] replace {cnt} infinite values in '{c}'")
    for pair in high_corr_pairs or []:
        recs.append(
            f"[low] '{pair['col_a']}' and '{pair['col_b']}' correlate at {pair['r']:.2f} — consider dropping one"
        )
    return recs

"""Target-aware analysis — reference ``TargetAnalyzer`` (SURVEY §2.15).

Every analysis is (distributed sufficient statistics) → (driver
closed-form math from ``analysis.stats``). Results are memoized per
instance like the reference's ``_analysis_cache``.
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from feature_engineering_tk_spark.analysis import stats as ST
from feature_engineering_tk_spark.analysis.eda import numeric_columns


def detect_task(df: DataFrame, target: str) -> str:
    """Reference heuristics (target_analyzer/core.py:66-92): non-numeric
    → classification; nunique==2 → classification; ≤20 uniques or
    ratio<0.05 → classification; else regression."""
    is_numeric = target in numeric_columns(df)
    row = df.agg(
        F.countDistinct(target).alias("nu"), F.count(target).alias("n")
    ).first()
    nu, n = row["nu"], row["n"]
    if not is_numeric or nu == 2:
        return "classification"
    if nu <= 20 or (n and nu / n < 0.05):
        return "classification"
    return "regression"


class TargetAnalyzer:
    def __init__(self, df: DataFrame, target: str, task: str | None = None):
        if target not in df.columns:
            raise ValueError(f"target column {target!r} not found")
        self.df = df
        self.target = target
        self.task = task or detect_task(df, target)
        self._cache: dict = {}

    # ---------------------------------------------------------------- class
    def analyze_class_distribution(self) -> list[dict]:
        """value_counts → count, %, imbalance ratio (core.py:119-147)."""
        if "class_dist" in self._cache:
            return self._cache["class_dist"]
        # deterministic tie-break on class value (pandas value_counts is
        # appearance-ordered on ties; a sort key is the distributed analog)
        rows = (
            self.df.groupBy(self.target)
            .count()
            .orderBy(F.col("count").desc(), F.col(self.target).asc())
            .collect()
        )
        total = sum(r["count"] for r in rows)
        mx = rows[0]["count"] if rows else 0
        out = [
            {
                "class": r[self.target],
                "count": r["count"],
                "pct": 100.0 * r["count"] / total,
                "imbalance_ratio": mx / r["count"],
            }
            for r in rows
        ]
        self._cache["class_dist"] = out
        return out

    def get_class_imbalance_info(self) -> dict:
        """majority/minority + severity tiers 1.5/3 (core.py:149-197)."""
        dist = self.analyze_class_distribution()
        if not dist:
            return {}
        maj, mino = dist[0], dist[-1]
        ratio = maj["count"] / mino["count"] if mino["count"] else float("inf")
        severity = "balanced" if ratio < 1.5 else "moderate" if ratio < 3 else "severe"
        return {
            "majority": maj["class"],
            "minority": mino["class"],
            "ratio": ratio,
            "severity": severity,
        }

    # ---------------------------------------------------------------- target
    def analyze_target_distribution(self) -> dict:
        """Regression target stats incl. PANDAS-convention (bias-
        corrected) skew/kurtosis and IQR outlier count (core.py:199-253)."""
        if "target_dist" in self._cache:
            return self._cache["target_dist"]
        t = self.target
        row = self.df.agg(
            F.count(t).alias("n"),
            F.avg(t).alias("mean"),
            F.percentile(F.col(t), F.array(F.lit(0.25), F.lit(0.5), F.lit(0.75))).alias("q"),
            F.stddev_samp(t).alias("std"),
            F.min(t).alias("min"),
            F.max(t).alias("max"),
            F.skewness(t).alias("g1"),
            F.kurtosis(t).alias("g2"),
        ).first()
        n = row["n"]
        q25, med, q75 = row["q"]
        iqr = q75 - q25
        lo, hi = q25 - 1.5 * iqr, q75 + 1.5 * iqr
        n_out = self.df.filter((F.col(t) < lo) | (F.col(t) > hi)).count()
        out = {
            "count": n,
            "mean": row["mean"],
            "median": med,
            "std": row["std"],
            "min": row["min"],
            "max": row["max"],
            "range": row["max"] - row["min"],
            "q25": q25,
            "q75": q75,
            "iqr": iqr,
            "skewness": ST.bias_corrected_skew(row["g1"], n),
            "kurtosis": ST.bias_corrected_kurtosis(row["g2"], n),
            "n_outliers_iqr": n_out,
            "normality": ST.normality_from_moments(
                n, row["g1"] or 0.0, row["g2"] or 0.0
            ),
        }
        # Shapiro-Wilk on a seeded <=5000 sample (core.py:240-250's
        # shapiro_stat/shapiro_pvalue/is_normal fields)
        if n >= 3:
            from feature_engineering_tk_spark.analysis.normality import (
                sampled_column,
                shapiro_wilk,
            )

            vals, _ = sampled_column(self.df, t)
            sw = shapiro_wilk(vals)
            out["shapiro_stat"] = sw["statistic"]
            out["shapiro_pvalue"] = sw["pvalue"]
            out["is_normal"] = bool(sw["pvalue"] > 0.05) if sw["pvalue"] == sw["pvalue"] else False
        self._cache["target_dist"] = out
        return out

    # ---------------------------------------------------------------- tests
    def analyze_feature_target_relationship(
        self,
        features: list[str] | None = None,
        effect_sizes: bool = True,
        fdr: str | None = "fdr_bh",
    ) -> list[dict]:
        """Per-feature association tests (statistical.py:31-250):
        classification × numeric feature → one-way ANOVA-F from group
        moments (+eta², +Cohen's d for binary); classification ×
        categorical feature → chi-square (+Cramér's V); regression ×
        numeric → Pearson r (t-transform p). One distributed job per
        feature class, closed forms on driver, optional BH-FDR."""
        num_cols = set(numeric_columns(self.df))
        if features is None:
            feats = [c for c in num_cols if c != self.target]
            cat_feats = [
                f.name
                for f in self.df.schema.fields
                if isinstance(f.dataType, T.StringType) and f.name != self.target
            ]
        else:
            feats = [c for c in features if c in num_cols]
            cat_feats = [c for c in features if c not in num_cols]
        results = []
        for c in feats:
            if self.task == "classification":
                groups = ST.group_moments(self.df, c, self.target)
                groups = [g for g in groups if g["n"] and g["n"] > 1]
                res = ST.anova_f_from_groups(groups)
                rec = {
                    "feature": c,
                    "test": "anova_f",
                    "statistic": res["F"],
                    "pvalue": res["pvalue"],
                }
                if effect_sizes and len(groups) >= 2:
                    rec["eta_squared"] = ST.eta_squared_from_groups(groups)
                    if len(groups) == 2:
                        g1, g2 = groups
                        rec["cohens_d"] = ST.cohens_d(
                            g1["n"], g1["mean"], g1["var"], g2["n"], g2["mean"], g2["var"]
                        )["d"]
            else:
                row = self.df.agg(
                    F.corr(c, self.target).alias("r"), F.count(c).alias("n")
                ).first()
                r = row["r"] if row["r"] is not None else float("nan")
                rec = {
                    "feature": c,
                    "test": "pearson",
                    "statistic": r,
                    "pvalue": ST.pearson_pvalue(r, row["n"]) if not math.isnan(r) else float("nan"),
                }
            results.append(rec)
        # categorical features vs classification target: chi-square
        if self.task == "classification":
            for c in cat_feats:
                tbl = ST.contingency_table(self.df, c, self.target)
                res = ST.chi2_independence(tbl)
                rec = {
                    "feature": c,
                    "test": "chi2",
                    "statistic": res["chi2"],
                    "pvalue": res["pvalue"],
                }
                if effect_sizes:
                    rec["cramers_v"] = ST.cramers_v(tbl)
                results.append(rec)
        if fdr:
            ps = [r["pvalue"] for r in results]
            valid = [i for i, p in enumerate(ps) if p is not None and not math.isnan(p)]
            if valid:
                adj = ST.multiple_testing_correction([ps[i] for i in valid], fdr)
                for k, i in enumerate(valid):
                    results[i]["pvalue_adj"] = adj["adjusted"][k]
                    results[i]["significant"] = adj["rejected"][k]
        return results

    def analyze_class_wise_statistics(self, features: list[str] | None = None) -> list[dict]:
        """Per feature × class moments in ONE groupBy job per feature
        set (the reference's 7×-speedup lesson: no per-class loops) —
        statistical.py:252-342."""
        feats = features or [c for c in numeric_columns(self.df) if c != self.target]
        aggs = []
        for c in feats:
            aggs += [
                F.count(c).alias(f"{c}__n"),
                F.avg(c).alias(f"{c}__mean"),
                F.percentile(F.col(c), F.lit(0.5)).alias(f"{c}__median"),
                F.stddev_samp(c).alias(f"{c}__std"),
                F.min(c).alias(f"{c}__min"),
                F.max(c).alias(f"{c}__max"),
            ]
        rows = self.df.groupBy(self.target).agg(*aggs).collect()
        out = []
        for r in rows:
            for c in feats:
                out.append(
                    {
                        "class": r[self.target],
                        "feature": c,
                        "count": r[f"{c}__n"],
                        "mean": r[f"{c}__mean"],
                        "median": r[f"{c}__median"],
                        "std": r[f"{c}__std"],
                        "min": r[f"{c}__min"],
                        "max": r[f"{c}__max"],
                    }
                )
        return out

    def analyze_feature_correlations(self, features: list[str] | None = None) -> list[dict]:
        """Pearson + p + Fisher-Z CI + linearity vs target
        (statistical.py:344-427, regression task)."""
        feats = features or [c for c in numeric_columns(self.df) if c != self.target]
        aggs = []
        for c in feats:
            aggs += [F.corr(c, self.target).alias(f"{c}__r"), F.count(c).alias(f"{c}__n")]
        row = self.df.agg(*aggs).first()
        out = []
        for c in feats:
            r, n = row[f"{c}__r"], row[f"{c}__n"]
            if r is None:
                continue
            lo, hi = ST.correlation_ci(r, n)
            out.append(
                {
                    "feature": c,
                    "pearson": r,
                    "pvalue": ST.pearson_pvalue(r, n),
                    "ci_low": lo,
                    "ci_high": hi,
                }
            )
        return sorted(out, key=lambda d: -abs(d["pearson"]))

    def analyze_mutual_information(
        self,
        features: list[str] | None = None,
        bins: int = 16,
        normalize: bool = True,
        method: str = "binned",
        k: int = 3,
        max_n: int = 5000,
        seed: int = 42,
    ) -> list[dict]:
        """Mutual information per feature (statistical.py:429-533).

        ``method='binned'`` (default): histogram plug-in estimator —
        fully distributed, 2 jobs total, the 100 TB scale path.

        ``method='ksg'``: the reference-parity path — the same KSG
        k-NN estimators sklearn's ``mutual_info_classif/regression``
        implement (Kraskov #1 for regression targets, Ross 2014 for
        classification), hand-rolled scipy/sklearn-free in
        ``analysis/ksg.py``, run on a seeded ≤``max_n``-row driver
        sample exactly like the reference's Shapiro subsample path.
        NaN features fill with 0 (the reference's loud imputation).

        Scale path details (binned):

        Exactly TWO jobs regardless of feature count (the reference's
        own v2.3.0 no-N+1-passes rule): one multi-aggregate for every
        feature's (min, max), then one melted groupBy — each row
        explodes into (feature, bin) structs, a single shuffle builds
        every contingency table at once. At 50 features over 100 TB
        that is 2 scans instead of 100."""
        feats = features or [c for c in numeric_columns(self.df) if c != self.target]
        if not feats:
            return []
        if method == "ksg":
            return self._mutual_information_ksg(feats, normalize, k, max_n, seed)
        if method != "binned":
            raise ValueError("method must be binned|ksg")
        # job 1: all ranges in one multi-aggregate pass
        aggs = []
        for c in feats:
            aggs += [F.min(c).alias(f"{c}__lo"), F.max(c).alias(f"{c}__hi")]
        row = self.df.agg(*aggs).first()
        ranges = {c: (row[f"{c}__lo"], row[f"{c}__hi"]) for c in feats}
        usable = [
            c for c in feats
            if ranges[c][0] is not None and ranges[c][0] != ranges[c][1]
        ]
        out = [{"feature": c, "mi": 0.0} for c in feats if c not in usable]
        if usable:
            # job 2: melt → one groupBy over (feature, bin, target).
            # NaN→0 like the reference's loud imputation.
            structs = []
            for c in usable:
                lo, hi = ranges[c]
                width = (hi - lo) / bins
                b = F.least(
                    F.floor((F.coalesce(F.col(c), F.lit(0.0)) - F.lit(lo)) / F.lit(width)),
                    F.lit(bins - 1),
                ).cast("long")
                structs.append(F.struct(F.lit(c).alias("f"), b.alias("b")))
            melted = self.df.select(
                F.col(self.target).alias("_y"), F.explode(F.array(*structs)).alias("_fb")
            )
            counts = (
                melted.groupBy(F.col("_fb.f").alias("_f"), F.col("_fb.b").alias("_b"), "_y")
                .count()
                .collect()
            )
            per: dict[str, list] = {c: [] for c in usable}
            for r in counts:
                per[r["_f"]].append(r)
            for c in usable:
                # same matrix layout as ST.contingency_table (rows=bin,
                # cols=target, both str-sorted) so MI floats are
                # unchanged from the per-feature-job form
                rows_c = per[c]
                avals = sorted({r["_b"] for r in rows_c}, key=str)
                bvals = sorted({r["_y"] for r in rows_c}, key=str)
                tbl = np.zeros((len(avals), len(bvals)))
                ai = {v: i for i, v in enumerate(avals)}
                bi = {v: i for i, v in enumerate(bvals)}
                for r in rows_c:
                    tbl[ai[r["_b"]], bi[r["_y"]]] = r["count"]
                pxy = tbl / tbl.sum()
                px = pxy.sum(axis=1, keepdims=True)
                py = pxy.sum(axis=0, keepdims=True)
                with np.errstate(divide="ignore", invalid="ignore"):
                    terms = np.where(pxy > 0, pxy * np.log(pxy / (px @ py)), 0.0)
                mi = float(terms.sum())
                if normalize and self.task == "classification":
                    k = tbl.shape[1]
                    mi = mi / math.log(k) if k > 1 else 0.0
                out.append({"feature": c, "mi": mi})
        return sorted(out, key=lambda d: -d["mi"])

    def _mutual_information_ksg(
        self, feats: list[str], normalize: bool, k: int, max_n: int, seed: int
    ) -> list[dict]:
        """Reference-parity KSG path: seeded ≤max_n-row driver sample of
        (features, target), then analysis/ksg.py estimators per feature.
        classification → Ross c-d estimator, normalized by log(n_classes)
        (statistical.py:506-516); regression → Kraskov #1, normalized to
        the strongest feature's MI (relative, statistical.py:520-528)."""
        import numpy as np

        from feature_engineering_tk_spark.analysis.ksg import (
            mi_ksg_continuous,
            mi_ksg_discrete,
        )

        cols = self.df.select(*feats, self.target).filter(
            F.col(self.target).isNotNull()
        )
        n = cols.count()
        if n > max_n:
            frac = min(1.0, (max_n * 1.2) / n)
            cols = cols.sample(fraction=frac, seed=seed)
            cols = cols.orderBy(F.rand(seed)).limit(max_n)
        pdf = cols.toPandas()
        if len(pdf) < 10:
            return []
        y = pdf[self.target].to_numpy()
        out = []
        for c in feats:
            x = pdf[c].astype(float).fillna(0.0).to_numpy()  # reference fillna(0)
            if self.task == "classification":
                mi = mi_ksg_discrete(x, y, k=k, seed=seed)
            else:
                mi = mi_ksg_continuous(x, y.astype(float), k=k, seed=seed)
            out.append({"feature": c, "mi": mi, "mi_raw": mi})
        if normalize:
            if self.task == "classification":
                k_cls = len(np.unique(y))
                denom = math.log(k_cls) if k_cls > 1 else 0.0
            else:
                denom = max((d["mi_raw"] for d in out), default=0.0)
            for d in out:
                d["mi"] = d["mi_raw"] / denom if denom > 0 else 0.0
        return sorted(out, key=lambda d: -d["mi"])

    def analyze_data_quality(self) -> dict:
        """Missing/constant features + leakage suspects (quality.py:28-130):
        regression |r|>0.99; classification p<1e-10 AND large effect."""
        from feature_engineering_tk_spark.analysis.eda import (
            get_cardinality_info,
            get_missing_summary,
        )

        missing = get_missing_summary(self.df)
        rel = self.analyze_feature_target_relationship(fdr=None)
        suspects = []
        for r in rel:
            if self.task == "regression" and r["test"] == "pearson" and abs(r["statistic"]) > 0.99:
                suspects.append(r["feature"])
            if (
                self.task == "classification"
                and not math.isnan(r["pvalue"])
                and r["pvalue"] < 1e-10
                and (r.get("eta_squared", 0) or 0) >= 0.8
            ):
                suspects.append(r["feature"])
        constant = [
            c for c, v in get_cardinality_info(self.df).items() if v["unique"] <= 1
        ]
        return {"missing": missing, "leakage_suspects": suspects, "constant_features": constant}

    # -- plots (target_analyzer/visualization.py:29-279) — distributed
    # aggregation → PlotSpec; render=True for a matplotlib Figure
    def _plot(self, spec, render, figsize, show):
        from feature_engineering_tk_spark.analysis import viz as V

        return V.render(spec, figsize, show) if render and spec else spec

    def plot_class_distribution(self, render: bool = False, figsize=None, show: bool = False):
        from feature_engineering_tk_spark.analysis import viz as V

        return self._plot(V.plot_class_distribution(self), render, figsize, show)

    def plot_target_distribution(
        self, bins: int = 30, render: bool = False, figsize=None, show: bool = False
    ):
        from feature_engineering_tk_spark.analysis import viz as V

        return self._plot(V.plot_target_distribution(self, bins), render, figsize, show)

    def plot_feature_by_class(
        self, feature: str, plot_type: str = "box", bins: int = 20,
        render: bool = False, figsize=None, show: bool = False,
    ):
        from feature_engineering_tk_spark.analysis import viz as V

        return self._plot(
            V.plot_feature_by_class(self, feature, plot_type, bins), render, figsize, show
        )

    def plot_feature_vs_target(
        self, features=None, max_features: int = 6, max_points: int = 5000,
        render: bool = False, figsize=None, show: bool = False,
    ):
        from feature_engineering_tk_spark.analysis import viz as V

        return self._plot(
            V.plot_feature_vs_target(self, features, max_features, max_points),
            render, figsize, show,
        )

    def plot_residuals(
        self, predicted: str, max_points: int = 5000,
        render: bool = False, figsize=None, show: bool = False,
    ):
        from feature_engineering_tk_spark.analysis import viz as V

        return self._plot(V.plot_residuals(self, predicted, max_points), render, figsize, show)


def analyze_residuals(df, actual: str, predicted: str, shapiro: bool = False) -> dict:
    """Residual diagnostics (target_analyzer/statistical.py:535-578):
    residual mean/std, MAE, RMSE, R² = 1 - SS_res/SS_tot, plus a
    Jarque-Bera normality check from distributed moments — ONE
    aggregation pass, no collect of row data. ``shapiro=True`` adds the
    reference's Shapiro-on-residuals field from a seeded ≤5000 sample
    (one extra bounded collect)."""
    from feature_engineering_tk_spark.analysis.stats import normality_from_moments

    res = F.col(actual) - F.col(predicted)
    d = df.withColumn("_res", res)
    row = d.agg(
        F.count("_res").alias("n"),
        F.avg("_res").alias("mean"),
        F.stddev_samp("_res").alias("std"),
        F.avg(F.abs(F.col("_res"))).alias("mae"),
        F.sqrt(F.avg(F.col("_res") * F.col("_res"))).alias("rmse"),
        F.sum(F.col("_res") * F.col("_res")).alias("ss_res"),
        F.sum(F.col(actual) * F.col(actual)).alias("ss_y2"),
        F.sum(F.col(actual)).alias("sum_y"),
        F.skewness("_res").alias("g1"),
        F.kurtosis("_res").alias("g2"),
    ).first()
    n = row["n"] or 0
    ss_tot = row["ss_y2"] - (row["sum_y"] ** 2) / n if n else float("nan")
    r2 = 1.0 - row["ss_res"] / ss_tot if ss_tot else float("nan")
    norm = (
        normality_from_moments(n, row["g1"], row["g2"])
        if row["g1"] is not None
        else {"statistic": float("nan"), "pvalue": float("nan"), "is_normal": None}
    )
    out = {
        "n": n,
        "residual_mean": row["mean"],
        "residual_std": row["std"],
        "mae": row["mae"],
        "rmse": row["rmse"],
        "r2": r2,
        "normality": norm,
    }
    if shapiro and n >= 3:
        from feature_engineering_tk_spark.analysis.normality import (
            sampled_column,
            shapiro_wilk,
        )

        vals, _ = sampled_column(d, "_res")
        sw = shapiro_wilk(vals)
        out["shapiro_stat"] = sw["statistic"]
        out["shapiro_pvalue"] = sw["pvalue"]
    return out

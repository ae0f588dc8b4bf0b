"""Feature selection — reference ``FeatureSelector`` (SURVEY §2.16).

Selection decisions are driver-side over distributed aggregates; the
final projection is a ``select``. sklearn's RandomForest importance
path is gated behind an optional import (not in this runtime); the
active engine here is the vendored deterministic Extra-Trees ensemble
in :mod:`feature_engineering_tk_spark.analysis.trees`, with an
MI-ranking engine selectable via ``engine='mi'``.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from feature_engineering_tk_spark.analysis.eda import correlation_matrix, numeric_columns


class FeatureSelector:
    def __init__(self, df: DataFrame, target: str | None = None):
        self.df = df
        self.target = target
        self.selected_: list[str] | None = None
        self.scores_: dict | None = None
        # insertion-ordered score_type -> {feature: score}, mirroring
        # the reference's self.feature_scores (feature_selection.py:321)
        self.score_history_: dict[str, dict] = {}

    def _record_scores(self, score_type: str, scores: dict) -> None:
        self.scores_ = scores
        # re-inserting moves the key to the end = "latest" semantics
        self.score_history_.pop(score_type, None)
        self.score_history_[score_type] = dict(scores)

    def _features(self, columns=None) -> list[str]:
        return columns or [c for c in numeric_columns(self.df) if c != self.target]

    def select_by_variance(self, threshold: float = 0.0, columns=None) -> list[str]:
        """VarianceThreshold parity: keep var_pop > threshold (ddof=0,
        sklearn convention) — feature_selection.py:61-85."""
        cols = self._features(columns)
        row = self.df.agg(*[F.var_pop(c).alias(c) for c in cols]).first()
        self._record_scores("variance", {c: row[c] for c in cols})
        self.selected_ = [c for c in cols if row[c] is not None and row[c] > threshold]
        return self.selected_

    def select_by_correlation(self, threshold: float = 0.9, columns=None) -> list[str]:
        """Upper-triangle greedy drop in COLUMN ORDER (order matters for
        parity) — feature_selection.py:87-114."""
        cols = self._features(columns)
        names, mat = correlation_matrix(self.df, cols)
        drop = set()
        for i in range(len(names)):
            for j in range(i + 1, len(names)):
                if names[j] in drop or names[i] in drop:
                    continue
                r = mat[i][j]
                if not math.isnan(r) and abs(r) > threshold:
                    drop.add(names[j])
        self.selected_ = [c for c in names if c not in drop]
        return self.selected_

    def select_by_target_correlation(self, top_k: int = 10, columns=None) -> list[str]:
        """top-k |corr(feature, target)| — feature_selection.py:116-162."""
        if self.target is None:
            raise ValueError("needs a target")
        cols = self._features(columns)
        row = self.df.agg(*[F.corr(c, self.target).alias(c) for c in cols]).first()
        scores = {c: abs(row[c]) if row[c] is not None else 0.0 for c in cols}
        self._record_scores("target_correlation", scores)
        self.selected_ = sorted(cols, key=lambda c: -scores[c])[:top_k]
        return self.selected_

    def select_by_statistical_test(self, k: int = 10, columns=None) -> list[str]:
        """SelectKBest(f_classif) parity: ANOVA F per feature from group
        moments — feature_selection.py:164-245."""
        from feature_engineering_tk_spark.analysis import stats as ST

        if self.target is None:
            raise ValueError("needs a target")
        cols = self._features(columns)
        scores = {}
        for c in cols:
            groups = [
                g for g in ST.group_moments(self.df, c, self.target) if g["n"] and g["n"] > 1
            ]
            res = ST.anova_f_from_groups(groups)
            scores[c] = res["F"] if not math.isnan(res["F"]) else 0.0
        self._record_scores("statistical_test", scores)
        self.selected_ = sorted(cols, key=lambda c: -scores[c])[:k]
        return self.selected_

    def select_by_missing_values(self, threshold: float = 0.5, columns=None) -> list[str]:
        """Keep cols with missing ratio ≤ threshold — feature_selection.py:302-319."""
        cols = columns or self.df.columns
        row = self.df.agg(
            F.count(F.lit(1)).alias("_n"),
            *[F.sum(F.col(c).isNull().cast("long")).alias(c) for c in cols],
        ).first()
        n = row["_n"] or 1
        self.selected_ = [c for c in cols if (row[c] or 0) / n <= threshold]
        return self.selected_

    def _importance_sample(self, cols: list[str]):
        """Driver-side sample both tree engines share: the distributed
        work (scan, dropna, projection, cap) stays in Spark; only the
        capped matrix crosses to the driver, like the reference's
        whole-frame `.fit` but bounded (feature_selection.py:270)."""
        return self.df.select(*cols, self.target).dropna().limit(100_000).toPandas()

    def select_by_importance(
        self, top_k: int = 10, columns=None, seed: int = 42, engine: str = "auto"
    ) -> list[str]:
        """Tree-ensemble importances, selection-decision parity with
        feature_selection.py:247-300.

        engine='sklearn' — RandomForest, exact reference parity (needs
        sklearn); 'builtin' — vendored seeded Extra-Trees
        (:mod:`.trees`), active default in this runtime; 'mi' —
        mutual-information ranking (no tree fit at all); 'auto' —
        sklearn if importable else builtin."""
        if engine not in ("auto", "sklearn", "builtin", "mi"):
            raise ValueError(f"unknown importance engine: {engine!r}")
        if engine == "mi":
            from feature_engineering_tk_spark.analysis.target import TargetAnalyzer

            mi = TargetAnalyzer(self.df, self.target).analyze_mutual_information(
                self._features(columns)
            )
            self._record_scores("mutual_information", {d["feature"]: d["mi"] for d in mi})
            self.selected_ = [d["feature"] for d in mi[:top_k]]
            return self.selected_

        if engine in ("auto", "sklearn"):
            try:
                from sklearn.ensemble import RandomForestClassifier, RandomForestRegressor
            except ImportError:
                if engine == "sklearn":
                    raise
                engine = "builtin"
            else:
                cols = self._features(columns)
                sample = self._importance_sample(cols)
                X, y = sample[cols], sample[self.target]
                cls = RandomForestClassifier if y.nunique() <= 20 else RandomForestRegressor
                model = cls(n_estimators=100, random_state=seed, n_jobs=-1).fit(X, y)
                imp = dict(zip(cols, model.feature_importances_))
                self._record_scores("random_forest_importance", imp)
                self.selected_ = sorted(cols, key=lambda c: -imp[c])[:top_k]
                return self.selected_

        from feature_engineering_tk_spark.analysis.trees import ExtraTreesImportance

        cols = self._features(columns)
        sample = self._importance_sample(cols)
        X, y = sample[cols].to_numpy(dtype=float), sample[self.target].to_numpy()
        model = ExtraTreesImportance(random_state=seed).fit(X, y)
        imp = dict(zip(cols, model.feature_importances_.tolist()))
        self._record_scores("tree_importance", imp)
        self.selected_ = sorted(cols, key=lambda c: -imp[c])[:top_k]
        return self.selected_

    def get_feature_importance_df(self, sort: bool = True):
        """pandas DataFrame (feature, score, score_type) of the LATEST
        scored selection — feature_selection.py:321-339; empty frame
        when no scoring method has run."""
        import pandas as pd

        if not self.score_history_:
            return pd.DataFrame()
        score_type = next(reversed(self.score_history_))
        scores = self.score_history_[score_type]
        out = pd.DataFrame(
            {
                "feature": list(scores.keys()),
                "score": list(scores.values()),
                "score_type": score_type,
            }
        )
        if sort:
            out = out.sort_values("score", ascending=False)
        return out.reset_index(drop=True)

    def apply_selection(self, extra: list[str] | None = None) -> DataFrame:
        """Project selected (+target) — feature_selection.py:341-359."""
        if self.selected_ is None:
            raise RuntimeError("run a select_* method first")
        keep = list(self.selected_) + ([self.target] if self.target else []) + (extra or [])
        return self.df.select(*dict.fromkeys(keep))

    def select_features_auto(
        self, variance_threshold: float = 0.0, corr_threshold: float = 0.95, top_k: int = 20
    ) -> list[str]:
        """variance → correlation → importance pipeline
        (feature_selection.py:366-425)."""
        v = self.select_by_variance(variance_threshold)
        c = self.select_by_correlation(corr_threshold, columns=v)
        if self.target is not None:
            return self.select_by_importance(top_k, columns=c)
        self.selected_ = c[:top_k]
        return self.selected_

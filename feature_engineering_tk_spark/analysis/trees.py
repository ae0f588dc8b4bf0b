"""Vendored deterministic tree-ensemble feature importance.

The reference's ``select_by_importance`` (feature_selection.py:247-300)
fits a sklearn RandomForest on the full frame and ranks features by
impurity-decrease importance. sklearn is absent from this runtime, so
this module provides a from-scratch, numpy-only Extra-Trees ensemble
(Geurts, Ernst & Wehenkel, "Extremely randomized trees", Machine
Learning 63, 2006) whose Mean-Decrease-Impurity importances follow the
same definition sklearn uses: at every split, the chosen feature is
credited ``(n_node / n_total) * impurity_decrease``, summed per tree
and averaged over the ensemble, then normalized to sum to 1.

Design notes (why Extra-Trees, not CART):

* random thresholds remove the per-feature sort — every node costs
  O(k_features · n_node) vectorized numpy, no Python-level loop over
  samples, so a 100k-row driver sample fits comfortably in the same
  budget the reference spends inside sklearn's C code;
* with a seeded ``numpy.random.Generator`` the whole ensemble is
  bit-deterministic across runs and platforms — which is what the
  selection gate actually needs (stable feature ranking), and what a
  bagged CART forest only gives per-platform;
* importance QUALITY matches RF for ranking purposes (the original
  paper's result); exact sklearn score parity is only claimed for the
  sklearn branch in ``selection.py``, never for this one.

Scale: this runs on the driver over the same seeded ≤100k sample the
sklearn branch uses. The distributed part of selection (the sample
itself, variance/correlation/F-test pre-filters) stays in Spark.
"""

from __future__ import annotations

import numpy as np

__all__ = ["ExtraTreesImportance"]


def _gini(counts: np.ndarray) -> float:
    """Gini impurity from a class-count vector."""
    n = counts.sum()
    if n == 0:
        return 0.0
    p = counts / n
    return float(1.0 - (p * p).sum())


class ExtraTreesImportance:
    """Seeded Extra-Trees ensemble exposing ``feature_importances_``.

    Parameters mirror the sklearn names used by the reference call site
    (n_estimators, random_state) so ``selection.py`` can treat the two
    engines interchangeably.
    """

    def __init__(
        self,
        n_estimators: int = 50,
        max_depth: int = 10,
        min_samples_split: int = 4,
        max_features: str | float = "sqrt",
        random_state: int = 42,
        task: str = "auto",
    ):
        self.n_estimators = n_estimators
        self.max_depth = max_depth
        self.min_samples_split = min_samples_split
        self.max_features = max_features
        self.random_state = random_state
        self.task = task
        self.feature_importances_: np.ndarray | None = None

    # -- impurity -----------------------------------------------------
    def _node_impurity(self, y: np.ndarray) -> float:
        if self._classification:
            return _gini(np.bincount(y, minlength=self._n_classes))
        if len(y) == 0:
            return 0.0
        return float(y.var())  # ddof=0, sklearn's MSE criterion

    def _split_score(self, y_left: np.ndarray, y_right: np.ndarray) -> float:
        """Weighted child impurity (lower is better)."""
        n = len(y_left) + len(y_right)
        return (
            len(y_left) * self._node_impurity(y_left)
            + len(y_right) * self._node_impurity(y_right)
        ) / n

    # -- fitting ------------------------------------------------------
    def fit(self, X, y) -> "ExtraTreesImportance":
        X = np.asarray(X, dtype=np.float64)
        y = np.asarray(y)
        n, d = X.shape
        if self.task == "auto":
            # reference heuristic (feature_selection.py:268): ≤20
            # distinct target values → classification
            self._classification = len(np.unique(y)) <= 20
        else:
            self._classification = self.task == "classification"
        if self._classification:
            _, y = np.unique(y, return_inverse=True)
            self._n_classes = int(y.max()) + 1
        else:
            y = y.astype(np.float64)

        if self.max_features == "sqrt":
            k = max(1, int(np.sqrt(d)))
        elif self.max_features == "all" or self.max_features is None:
            k = d
        else:
            k = max(1, int(self.max_features * d))

        rng = np.random.default_rng(self.random_state)
        importances = np.zeros(d)
        for _ in range(self.n_estimators):
            importances += self._fit_tree(X, y, k, rng)
        total = importances.sum()
        self.feature_importances_ = (
            importances / total if total > 0 else np.full(d, 1.0 / d)
        )
        return self

    def _fit_tree(self, X: np.ndarray, y: np.ndarray, k: int, rng) -> np.ndarray:
        """One extremely-randomized tree; returns its un-normalized
        importance vector. Iterative node stack — no recursion limit."""
        n, d = X.shape
        imp = np.zeros(d)
        # (row-index-array, depth) work stack; root sees all rows
        stack = [(np.arange(n), 0)]
        while stack:
            idx, depth = stack.pop()
            n_node = len(idx)
            if depth >= self.max_depth or n_node < self.min_samples_split:
                continue
            y_node = y[idx]
            parent_imp = self._node_impurity(y_node)
            if parent_imp <= 0.0:
                continue  # pure node
            feats = rng.choice(d, size=min(k, d), replace=False)
            best = None  # (score, feature, mask)
            for f in feats:
                col = X[idx, f]
                lo, hi = col.min(), col.max()
                if not np.isfinite(lo) or not np.isfinite(hi) or lo == hi:
                    continue
                thr = rng.uniform(lo, hi)
                mask = col <= thr
                nl = int(mask.sum())
                if nl == 0 or nl == n_node:
                    continue
                score = self._split_score(y_node[mask], y_node[~mask])
                if best is None or score < best[0]:
                    best = (score, f, mask)
            if best is None:
                continue
            score, f, mask = best
            decrease = parent_imp - score
            if decrease > 0:
                imp[f] += (n_node / n) * decrease
            stack.append((idx[mask], depth + 1))
            stack.append((idx[~mask], depth + 1))
        return imp

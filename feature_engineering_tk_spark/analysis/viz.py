"""Visualization layer (SURVEY §2.18) — reference
``data_analysis.py:445-550`` (plot_missing_values,
plot_correlation_heatmap, plot_distributions) and
``target_analyzer/visualization.py:29-279`` (plot_class_distribution,
plot_target_distribution, plot_feature_by_class, plot_feature_vs_target,
plot_residuals).

Spark-first split — every plot is two stages:

1. a **distributed aggregation** producing a small ``PlotSpec`` (bin
   edges + counts, box stats, correlation matrix, a bounded point
   sample): this is the part that must survive 100 TB and it is fully
   tested in this runtime. The reference calls ``.hist()`` /
   ``.scatter()`` on the ENTIRE frame, which is a driver OOM at cluster
   scale; here matplotlib only ever sees pre-aggregated arrays, so
   render cost is independent of table size.
2. a **matplotlib render** of the spec (:func:`render`), import-guarded
   the way the reference guards its plotting stack. Without matplotlib
   the specs are still first-class return values (inspect / serialize /
   render elsewhere).

Scale notes baked into the aggregations:

* histograms: one job for all columns' (min, max), one shuffle on the
  8-byte (column, bin) key for the counts — never a per-column pass;
* scatter samples: deterministic hash-ordered top-k (`TakeOrdered`, no
  global sort, re-run-stable) capped at ``max_points``; the fitted
  trend line uses FULL-data sufficient statistics, not the sample, so
  the line is exact even when the cloud is thinned;
* Q-Q plots: k sample quantiles from the distributed exact-quantile
  operator against Acklam normal quantiles driver-side — the reference
  ships all n points to scipy.
"""

from __future__ import annotations

import math
from typing import Any

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from feature_engineering_tk_spark.analysis import special as S
from feature_engineering_tk_spark.analysis.eda import (
    correlation_matrix,
    get_missing_summary,
    numeric_columns,
)
from feature_engineering_tk_spark.operators.quantiles import exact_quantiles

PlotSpec = dict  # {"kind": str, ...driver-sized arrays only}

__all__ = [
    "histogram_spec",
    "histogram_counts_df",
    "plot_missing_values",
    "plot_correlation_heatmap",
    "plot_distributions",
    "plot_class_distribution",
    "plot_target_distribution",
    "plot_feature_by_class",
    "plot_feature_vs_target",
    "plot_residuals",
    "render",
]


# ---------------------------------------------------------------- helpers
def _binnable_ranges(df: DataFrame, columns: list[str], bins: int):
    """One aggregate job for every column's (min, max); returns the
    spec skeleton (edges filled, counts pending) and the bin plan."""
    rng_row = df.agg(
        *[F.min(c).alias(f"{c}__lo") for c in columns],
        *[F.max(c).alias(f"{c}__hi") for c in columns],
    ).first()
    out: dict[str, dict[str, list[float]]] = {}
    binnable = []
    for c in columns:
        lo, hi = rng_row[f"{c}__lo"], rng_row[f"{c}__hi"]
        if lo is None:
            out[c] = {"edges": [], "counts": []}
        elif lo == hi:  # degenerate: numpy pads to [lo-0.5, hi+0.5], 1 bin
            out[c] = {"edges": [lo - 0.5, hi + 0.5], "counts": None}
            binnable.append((c, lo - 0.5, hi + 0.5, 1))
        else:
            out[c] = {
                "edges": list(np.linspace(float(lo), float(hi), bins + 1)),
                "counts": None,
            }
            binnable.append((c, float(lo), float(hi), bins))
    return out, binnable


def _histogram_counts_df(df: DataFrame, binnable) -> DataFrame:
    """(name, bin, n) counts for a bin plan: explode tiny (column,
    bin_index) structs, one shuffle for ALL columns."""
    structs = []
    for c, lo, hi, nb in binnable:
        width = (hi - lo) / nb
        idx = F.least(
            F.floor((F.col(c) - F.lit(lo)) / F.lit(width)).cast("int"),
            F.lit(nb - 1),  # right edge belongs to the last bin
        )
        structs.append(
            F.when(
                F.col(c).isNotNull() & ~F.isnan(F.col(c).cast("double")),
                F.struct(F.lit(c).alias("name"), idx.alias("bin")),
            )
        )
    return (
        df.select(F.explode(F.array(*structs)).alias("cb"))
        .filter(F.col("cb").isNotNull())
        .groupBy("cb.name", "cb.bin")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def histogram_counts_df(df: DataFrame, columns: list[str], bins: int = 30) -> DataFrame:
    """Distributed histogram counts as a DataFrame ``(name, bin, n)`` —
    the aggregation core of :func:`plot_distributions` kept distributed
    (for pipelines / the SQL-oracle gate); empty-column inputs simply
    contribute no rows."""
    _, binnable = _binnable_ranges(df, columns, bins)
    if not binnable:
        return df.sparkSession.createDataFrame([], "name string, bin int, n long")
    return _histogram_counts_df(df, binnable)


def histogram_spec(
    df: DataFrame, columns: list[str], bins: int = 30
) -> dict[str, dict[str, list[float]]]:
    """Fixed-width histograms for many columns in TWO jobs total:
    job 1 — every column's (min, max) in one aggregate row;
    job 2 — explode (column, bin_index) structs and count, a single
    shuffle keyed on tiny tuples regardless of how many columns.

    Bin semantics match ``numpy.histogram``: ``bins`` equal-width bins
    over [min, max], right-closed last bin."""
    if not columns:
        return {}
    out, binnable = _binnable_ranges(df, columns, bins)
    if not binnable:
        return out
    counts = _histogram_counts_df(df, binnable).collect()
    by_col: dict[str, dict[int, int]] = {}
    for r in counts:
        by_col.setdefault(r["name"], {})[r["bin"]] = r["n"]
    for c, lo, hi, nb in binnable:
        got = by_col.get(c, {})
        out[c]["counts"] = [got.get(i, 0) for i in range(nb)]
    return out


def _hash_topk_sample(df: DataFrame, cols: list[str], max_points: int) -> list[dict]:
    """Deterministic ≤max_points sample: order by a row hash and take
    the top-k (a TakeOrdered — no global sort materializes). Re-run
    stable and partitioning-independent, unlike ``limit``."""
    rows = (
        df.select(*cols)
        .dropna()
        .withColumn("_h", F.xxhash64(*cols))
        .orderBy("_h")
        .limit(max_points)
        .drop("_h")
        .collect()
    )
    return [r.asDict() for r in rows]


def _qq_points(df: DataFrame, column: str, k: int = 99) -> dict[str, list[float]]:
    """Normal Q-Q data: k exact sample quantiles at p=(i-0.5)/k vs the
    standard-normal quantiles at the same probs (Acklam ppf). The
    reference's scipy ``probplot`` ships every value to the driver."""
    probs = [(i - 0.5) / k for i in range(1, k + 1)]
    sample_q = exact_quantiles(df, column, probs)
    theo_q = [S.normal_ppf(p) for p in probs]
    return {"theoretical": theo_q, "sample": sample_q}


def _ensure_task(ta, task: str, fn: str) -> bool:
    if ta.task != task:
        import logging

        logging.getLogger(__name__).warning(
            "%s() is only available for %s tasks", fn, task
        )
        return False
    return True


# ------------------------------------------------- DataAnalyzer plots (§2.18)
def plot_missing_values(df: DataFrame) -> PlotSpec | None:
    """reference data_analysis.py:445-473 — bar of missing %% per
    column; ``None`` when the frame has no missing values."""
    summary = [d for d in get_missing_summary(df) if d["missing"] > 0]
    if not summary:
        return None
    return {
        "kind": "missing_bar",
        "title": "Missing Values by Column",
        "columns": [d["column"] for d in summary],
        "missing_percent": [d["missing_pct"] for d in summary],
    }


def plot_correlation_heatmap(
    df: DataFrame, method: str = "pearson", columns: list[str] | None = None
) -> PlotSpec | None:
    """reference data_analysis.py:475-504 — correlation heatmap;
    ``None`` with <2 numeric columns."""
    cols = columns or numeric_columns(df)
    if len(cols) < 2:
        return None
    names, mat = correlation_matrix(df, cols, method=method)
    return {
        "kind": "heatmap",
        "title": f"Correlation Heatmap ({method.capitalize()})",
        "names": list(names),
        "matrix": [[float(v) for v in row] for row in np.asarray(mat)],
    }


def plot_distributions(
    df: DataFrame, columns: list[str] | None = None, bins: int = 30
) -> PlotSpec | None:
    """reference data_analysis.py:506-550 — histogram grid over numeric
    columns; ``None`` when there is nothing numeric to plot."""
    cols = columns or numeric_columns(df)
    if not cols:
        return None
    return {
        "kind": "histogram_grid",
        "title": "Distributions",
        "histograms": histogram_spec(df, cols, bins=bins),
        "order": cols,
    }


# ----------------------------------------------- TargetAnalyzer plots (§2.18)
def plot_class_distribution(ta) -> PlotSpec | None:
    """reference visualization.py:29-70 — classification only: bar +
    pie of class counts/percentages."""
    if not _ensure_task(ta, "classification", "plot_class_distribution"):
        return None
    dist = ta.analyze_class_distribution()
    if not dist:
        return None
    return {
        "kind": "class_distribution",
        "title": "Class Distribution",
        "classes": [d["class"] for d in dist],
        "counts": [d["count"] for d in dist],
        "percentages": [d["pct"] for d in dist],
    }


def plot_target_distribution(ta, bins: int = 30) -> PlotSpec | None:
    """reference visualization.py:72-115 — regression only: histogram
    with mean/median markers + normal Q-Q panel."""
    if not _ensure_task(ta, "regression", "plot_target_distribution"):
        return None
    t = ta.target
    base = ta.df.filter(F.col(t).isNotNull())
    row = base.agg(
        F.count(t).alias("n"),
        F.mean(t).alias("mean"),
        F.expr(f"percentile({t}, 0.5)").alias("median"),
    ).first()
    if not row["n"]:
        return None
    return {
        "kind": "target_distribution",
        "title": f"Distribution of {t}",
        "target": t,
        "histogram": histogram_spec(base, [t], bins=bins)[t],
        "mean": float(row["mean"]),
        "median": float(row["median"]),
        "qq": _qq_points(base, t),
    }


def plot_feature_by_class(ta, feature: str, plot_type: str = "box", bins: int = 20) -> PlotSpec | None:
    """reference visualization.py:117-161 — classification only:
    per-class box stats / histograms for one feature.

    box: exact quartiles per class plus matplotlib-convention whiskers
    (furthest datum inside 1.5·IQR fences) — quartiles in one grouped
    percentile pass, whiskers in one conditional re-aggregation against
    the broadcast-joined per-class fences. 'violin' renders the
    per-class histogram as a width profile (the distributed stand-in
    for a KDE); 'hist' overlays per-class histograms."""
    if not _ensure_task(ta, "classification", "plot_feature_by_class"):
        return None
    if feature not in ta.df.columns:
        import logging

        logging.getLogger(__name__).warning("Feature '%s' not found", feature)
        return None
    t = ta.target
    base = ta.df.filter(F.col(feature).isNotNull() & F.col(t).isNotNull())
    if plot_type == "box":
        q = base.groupBy(t).agg(
            F.expr(f"percentile({feature}, array(0.25, 0.5, 0.75))").alias("q"),
            F.count(F.lit(1)).alias("n"),
        )
        fences = q.select(
            F.col(t).alias("_cls"),
            (F.col("q")[0] - 1.5 * (F.col("q")[2] - F.col("q")[0])).alias("_lo"),
            (F.col("q")[2] + 1.5 * (F.col("q")[2] - F.col("q")[0])).alias("_hi"),
        )
        whisk = (
            base.join(F.broadcast(fences), base[t] == fences["_cls"])
            .filter(F.col(feature).between(F.col("_lo"), F.col("_hi")))
            .groupBy(t)
            .agg(F.min(feature).alias("wlo"), F.max(feature).alias("whi"))
        )
        rows = {r[t]: r for r in q.collect()}
        wrows = {r[t]: r for r in whisk.collect()}
        classes = sorted(rows, key=lambda c: str(c))
        return {
            "kind": "box_by_class",
            "title": f"Box Plot: {feature} by {t}",
            "feature": feature,
            "classes": [str(c) for c in classes],
            "stats": [
                {
                    "q1": rows[c]["q"][0],
                    "median": rows[c]["q"][1],
                    "q3": rows[c]["q"][2],
                    "whisker_lo": wrows[c]["wlo"] if c in wrows else rows[c]["q"][0],
                    "whisker_hi": wrows[c]["whi"] if c in wrows else rows[c]["q"][2],
                    "n": rows[c]["n"],
                }
                for c in classes
            ],
        }
    if plot_type in ("violin", "hist"):
        # shared edges across classes: one global (min,max), then one
        # grouped count keyed on (class, bin)
        rng = base.agg(F.min(feature).alias("lo"), F.max(feature).alias("hi")).first()
        lo, hi = float(rng["lo"]), float(rng["hi"])
        if lo == hi:
            lo, hi = lo - 0.5, hi + 0.5
        width = (hi - lo) / bins
        idx = F.least(
            F.floor((F.col(feature) - F.lit(lo)) / F.lit(width)).cast("int"),
            F.lit(bins - 1),
        )
        counts = base.groupBy(F.col(t).alias("_cls"), idx.alias("_bin")).agg(
            F.count(F.lit(1)).alias("n")
        )
        by_cls: dict[Any, dict[int, int]] = {}
        for r in counts.collect():
            by_cls.setdefault(r["_cls"], {})[r["_bin"]] = r["n"]
        classes = sorted(by_cls, key=lambda c: str(c))
        return {
            "kind": "violin_by_class" if plot_type == "violin" else "hist_by_class",
            "title": f"{'Violin' if plot_type == 'violin' else 'Histogram'}: {feature} by {t}",
            "feature": feature,
            "edges": list(np.linspace(lo, hi, bins + 1)),
            "classes": [str(c) for c in classes],
            "counts": [[by_cls[c].get(i, 0) for i in range(bins)] for c in classes],
        }
    raise ValueError("plot_type must be box|violin|hist")


def plot_feature_vs_target(
    ta,
    features: list[str] | None = None,
    max_features: int = 6,
    max_points: int = 5000,
) -> PlotSpec | None:
    """reference visualization.py:163-238 — regression only: scatter
    grid of features vs target with an OLS trend line per panel.

    The point cloud is a deterministic hash top-k sample; the trend
    line is fit from FULL-data sufficient statistics in one aggregate
    row for all features, so it is exact regardless of sampling."""
    if not _ensure_task(ta, "regression", "plot_feature_vs_target"):
        return None
    t = ta.target
    if features is None:
        corr = ta.analyze_feature_correlations()
        if not corr:
            return None
        features = [d["feature"] for d in corr[:max_features]]
    features = features[:max_features]
    if not features:
        return None
    aggs = []
    for c in features:
        pair_ok = F.col(c).isNotNull() & F.col(t).isNotNull()
        x = F.when(pair_ok, F.col(c))
        y = F.when(pair_ok, F.col(t))
        aggs += [
            F.count(x).alias(f"{c}__n"),
            F.sum(x).alias(f"{c}__sx"),
            F.sum(y).alias(f"{c}__sy"),
            F.sum(x * y).alias(f"{c}__sxy"),
            F.sum(x * x).alias(f"{c}__sxx"),
        ]
    row = ta.df.agg(*aggs).first()
    panels = []
    for c in features:
        n = row[f"{c}__n"]
        slope = intercept = None
        if n and n > 1:
            sx, sy = float(row[f"{c}__sx"]), float(row[f"{c}__sy"])
            sxy, sxx = float(row[f"{c}__sxy"]), float(row[f"{c}__sxx"])
            denom = n * sxx - sx * sx
            if denom > 0:
                slope = (n * sxy - sx * sy) / denom
                intercept = (sy - slope * sx) / n
        pts = _hash_topk_sample(ta.df, [c, t], max_points)
        panels.append(
            {
                "feature": c,
                "x": [p[c] for p in pts],
                "y": [p[t] for p in pts],
                "slope": slope,
                "intercept": intercept,
                "n_total": n,
            }
        )
    return {
        "kind": "scatter_grid",
        "title": f"Features vs {t}",
        "target": t,
        "panels": panels,
        "sampled": True,
        "max_points": max_points,
    }


def plot_residuals(ta, predicted: str, max_points: int = 5000) -> PlotSpec | None:
    """reference visualization.py:240-279 — regression only: residual
    scatter + residual normal Q-Q.

    API adaptation: the reference takes an index-aligned pd.Series of
    predictions; Spark has no index, so ``predicted`` names a column of
    the analyzer's frame (join your predictions on first)."""
    if not _ensure_task(ta, "regression", "plot_residuals"):
        return None
    t = ta.target
    base = (
        ta.df.filter(F.col(t).isNotNull() & F.col(predicted).isNotNull())
        .withColumn("_resid", F.col(t) - F.col(predicted))
    )
    pts = _hash_topk_sample(base, [predicted, "_resid"], max_points)
    if not pts:
        return None
    return {
        "kind": "residuals",
        "title": "Residual Plot",
        "predicted": [p[predicted] for p in pts],
        "residuals": [p["_resid"] for p in pts],
        "qq": _qq_points(base, "_resid"),
        "sampled": True,
        "max_points": max_points,
    }


# ------------------------------------------------------------------ render
def render(spec: PlotSpec, figsize: tuple | None = None, show: bool = False):
    """Render a PlotSpec to a matplotlib Figure. Import-guarded: raises
    ``ImportError`` with a clear message when matplotlib is absent (the
    specs themselves never need it)."""
    try:
        import matplotlib

        matplotlib.use("Agg", force=False)
        import matplotlib.pyplot as plt
    except ImportError as e:  # pragma: no cover - matplotlib absent here
        raise ImportError(
            "matplotlib is required to render plot specs; the spec dict "
            "is complete without it (serialize it or render elsewhere)"
        ) from e

    kind = spec["kind"]
    if kind == "missing_bar":
        fig, ax = plt.subplots(figsize=figsize or (12, 6))
        ax.bar(spec["columns"], spec["missing_percent"], edgecolor="black")
        ax.set_xlabel("Column")
        ax.set_ylabel("Missing Percentage (%)")
        ax.set_title(spec["title"])
        ax.tick_params(axis="x", rotation=45)
    elif kind == "heatmap":
        fig, ax = plt.subplots(figsize=figsize or (10, 8))
        mat = np.array(spec["matrix"])
        im = ax.imshow(mat, cmap="coolwarm", vmin=-1, vmax=1)
        ax.set_xticks(range(len(spec["names"])), spec["names"], rotation=45, ha="right")
        ax.set_yticks(range(len(spec["names"])), spec["names"])
        for i in range(mat.shape[0]):
            for j in range(mat.shape[1]):
                ax.text(j, i, f"{mat[i, j]:.2f}", ha="center", va="center", fontsize=8)
        fig.colorbar(im, ax=ax)
        ax.set_title(spec["title"])
    elif kind == "histogram_grid":
        cols = spec["order"]
        n_cols = min(3, len(cols))
        n_rows = (len(cols) + n_cols - 1) // n_cols
        fig, axes = plt.subplots(n_rows, n_cols, figsize=figsize or (15, 10), squeeze=False)
        flat = axes.flatten()
        for i, c in enumerate(cols):
            h = spec["histograms"][c]
            if h["edges"]:
                flat[i].stairs(h["counts"], h["edges"], fill=True, edgecolor="black")
            flat[i].set_title(f"Distribution of {c}")
            flat[i].set_xlabel(c)
            flat[i].set_ylabel("Frequency")
        for i in range(len(cols), len(flat)):
            fig.delaxes(flat[i])
    elif kind == "class_distribution":
        fig, (ax1, ax2) = plt.subplots(1, 2, figsize=figsize or (10, 6))
        ax1.bar([str(c) for c in spec["classes"]], spec["counts"], edgecolor="black")
        ax1.set_xlabel("Class")
        ax1.set_ylabel("Count")
        ax1.set_title("Class Distribution (Counts)")
        ax2.pie(spec["percentages"], labels=[str(c) for c in spec["classes"]],
                autopct="%1.1f%%", startangle=90)
        ax2.set_title("Class Distribution (Percentage)")
    elif kind == "target_distribution":
        fig, axes = plt.subplots(1, 2, figsize=figsize or (12, 5))
        h = spec["histogram"]
        axes[0].stairs(h["counts"], h["edges"], fill=True, alpha=0.7, edgecolor="black")
        axes[0].axvline(spec["mean"], color="red", linestyle="--", linewidth=2,
                        label=f"Mean: {spec['mean']:.2f}")
        axes[0].axvline(spec["median"], color="green", linestyle="--", linewidth=2,
                        label=f"Median: {spec['median']:.2f}")
        axes[0].set_title(spec["title"])
        axes[0].legend()
        axes[1].scatter(spec["qq"]["theoretical"], spec["qq"]["sample"], s=12)
        axes[1].set_title("Q-Q Plot")
    elif kind == "box_by_class":
        fig, ax = plt.subplots(figsize=figsize or (10, 6))
        ax.bxp(
            [
                {
                    "label": c,
                    "q1": s["q1"],
                    "med": s["median"],
                    "q3": s["q3"],
                    "whislo": s["whisker_lo"],
                    "whishi": s["whisker_hi"],
                }
                for c, s in zip(spec["classes"], spec["stats"])
            ],
            showfliers=False,
        )
        ax.set_title(spec["title"])
    elif kind in ("violin_by_class", "hist_by_class"):
        fig, ax = plt.subplots(figsize=figsize or (10, 6))
        edges = spec["edges"]
        centers = [(edges[i] + edges[i + 1]) / 2 for i in range(len(edges) - 1)]
        for c, counts in zip(spec["classes"], spec["counts"]):
            if kind == "hist_by_class":
                ax.stairs(counts, edges, alpha=0.5, fill=True, label=f"Class {c}")
            else:
                peak = max(counts) or 1
                half = [v / peak * 0.4 for v in counts]
                pos = spec["classes"].index(c)
                ax.fill_betweenx(centers, [pos - h for h in half], [pos + h for h in half], alpha=0.6)
        if kind == "hist_by_class":
            ax.legend()
        else:
            ax.set_xticks(range(len(spec["classes"])), spec["classes"])
        ax.set_title(spec["title"])
    elif kind == "scatter_grid":
        panels = spec["panels"]
        n_cols = min(3, len(panels))
        n_rows = (len(panels) + n_cols - 1) // n_cols
        fig, axes = plt.subplots(n_rows, n_cols, figsize=figsize or (15, 10), squeeze=False)
        flat = axes.flatten()
        for i, p in enumerate(panels):
            flat[i].scatter(p["x"], p["y"], alpha=0.5, s=8)
            if p["slope"] is not None and p["x"]:
                xs = np.linspace(min(p["x"]), max(p["x"]), 100)
                flat[i].plot(xs, p["slope"] * xs + p["intercept"], "r--", alpha=0.8)
            flat[i].set_xlabel(p["feature"])
            flat[i].set_ylabel(spec["target"])
            flat[i].set_title(f"{p['feature']} vs {spec['target']}")
        for i in range(len(panels), len(flat)):
            fig.delaxes(flat[i])
    elif kind == "residuals":
        fig, axes = plt.subplots(1, 2, figsize=figsize or (12, 5))
        axes[0].scatter(spec["predicted"], spec["residuals"], alpha=0.5, s=8)
        axes[0].axhline(y=0, color="r", linestyle="--")
        axes[0].set_xlabel("Predicted Values")
        axes[0].set_ylabel("Residuals")
        axes[0].set_title("Residual Plot")
        axes[1].scatter(spec["qq"]["theoretical"], spec["qq"]["sample"], s=12)
        axes[1].set_title("Q-Q Plot of Residuals")
    else:
        raise ValueError(f"unknown plot spec kind: {kind!r}")
    fig.tight_layout()
    if show:  # pragma: no cover - headless runtime
        plt.show()
    return fig

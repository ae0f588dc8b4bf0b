"""Distributed EDA — reference ``DataAnalyzer`` (SURVEY §2.9, §2.15).

Design rule from the reference's own optimization history
(README v2.3.0: eliminate N+1 passes): every summary is ONE
multi-aggregate job over all requested columns, never a loop of
per-column jobs.
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def numeric_columns(df: DataFrame) -> list[str]:
    num = (T.IntegerType, T.LongType, T.DoubleType, T.FloatType, T.ShortType, T.DecimalType)
    return [f.name for f in df.schema.fields if isinstance(f.dataType, num)]


def string_columns(df: DataFrame) -> list[str]:
    return [f.name for f in df.schema.fields if isinstance(f.dataType, T.StringType)]


def get_missing_summary(df: DataFrame, total: int | None = None) -> list[dict]:
    """Null count + % per column, sorted desc (data_analysis.py:46-56) —
    one pass."""
    total = total if total is not None else df.count()
    row = df.agg(
        *[F.sum(F.col(c).isNull().cast("long")).alias(c) for c in df.columns]
    ).first()
    out = [
        {
            "column": c,
            "missing": int(row[c] or 0),
            "missing_pct": (100.0 * (row[c] or 0) / total) if total else 0.0,
        }
        for c in df.columns
    ]
    return sorted(out, key=lambda d: -d["missing"])


def get_numeric_summary(
    df: DataFrame, columns: list[str] | None = None, percentiles=(0.25, 0.5, 0.75)
) -> dict[str, dict]:
    """pandas ``describe()`` parity per numeric col (data_analysis.py:58-67):
    count/mean/std(ddof=1)/min/q25/q50/q75/max — one aggregate job, exact
    percentiles."""
    cols = columns or numeric_columns(df)
    aggs = []
    for c in cols:
        aggs += [
            F.count(c).alias(f"{c}__count"),
            F.avg(c).alias(f"{c}__mean"),
            F.stddev_samp(c).alias(f"{c}__std"),
            F.min(c).alias(f"{c}__min"),
            F.max(c).alias(f"{c}__max"),
            F.percentile(F.col(c), F.array(*[F.lit(p) for p in percentiles])).alias(f"{c}__q"),
        ]
    row = df.agg(*aggs).first()
    out = {}
    for c in cols:
        qs = row[f"{c}__q"] or [None] * len(percentiles)
        out[c] = {
            "count": row[f"{c}__count"],
            "mean": row[f"{c}__mean"],
            "std": row[f"{c}__std"],
            "min": row[f"{c}__min"],
            "max": row[f"{c}__max"],
            **{f"q{int(p * 100)}": q for p, q in zip(percentiles, qs)},
        }
    return out


def get_categorical_summary(df: DataFrame, columns: list[str] | None = None, max_unique: int = 50) -> dict:
    """Per string col ≤ max_unique uniques: nunique, mode (smallest on
    ties — pandas mode()[0]), top freq/% (data_analysis.py:69-94)."""
    cols = columns or string_columns(df)
    if not cols:
        return {}
    total = df.count()
    cd = df.agg(*[F.countDistinct(c).alias(c) for c in cols]).first()
    out = {}
    for c in cols:
        nu = cd[c]
        if nu > max_unique:
            out[c] = {"unique": nu, "skipped": True}
            continue
        top = (
            df.filter(F.col(c).isNotNull())
            .groupBy(c)
            .count()
            .orderBy(F.col("count").desc(), F.col(c).asc())
            .first()
        )
        out[c] = {
            "unique": nu,
            "mode": None if top is None else top[c],
            "top_freq": 0 if top is None else top["count"],
            "top_pct": 0.0 if (top is None or not total) else 100.0 * top["count"] / total,
        }
    return out


def get_cardinality_info(df: DataFrame, columns: list[str] | None = None, exact: bool = True) -> dict:
    """nunique + ratio per col (data_analysis.py:182-212); HLL variant
    for the 100 TB path."""
    cols = columns or df.columns
    cd = F.countDistinct if exact else F.approx_count_distinct
    row = df.agg(F.count(F.lit(1)).alias("_n"), *[cd(F.col(c)).alias(c) for c in cols]).first()
    n = row["_n"]
    return {
        c: {"unique": int(row[c]), "ratio": (row[c] / n) if n else float("nan")}
        for c in cols
    }


def get_basic_info(df: DataFrame) -> dict:
    """shape, dtypes, duplicate count (data_analysis.py:36-44)."""
    n = df.count()
    dups = n - df.dropDuplicates().count()
    return {
        "rows": n,
        "columns": len(df.columns),
        "dtypes": {f.name: f.dataType.simpleString() for f in df.schema.fields},
        "duplicates": dups,
    }


def correlation_matrix(
    df: DataFrame, columns: list[str] | None = None, method: str = "pearson"
) -> tuple[list[str], np.ndarray]:
    """Pairwise-complete correlation matrix (pandas ``corr`` parity —
    each pair computed over its co-non-null rows, unlike
    ``ml.stat.Correlation`` which drops whole rows). One job with all
    pairwise co-moments as aggregate expressions."""
    cols = columns or numeric_columns(df)
    if method == "kendall":
        return kendall_matrix(df, cols)
    if method not in ("pearson", "spearman"):
        raise ValueError("method must be pearson|spearman|kendall")
    work = df
    if method == "spearman":
        # Rank transform per column (average ranks on ties = pandas),
        # WITHOUT a global single-partition window: midranks come from
        # distinct-value prefix sums (the kruskal_wallis machinery,
        # stats.py:_average_ranks) joined back on the value key — the
        # distinct table is agg-sized, so AQE broadcasts it when small
        # and the plan stays partitioned at any scale.
        from .stats import _average_ranks

        work = df.select(*cols)
        for c in cols:
            r = _average_ranks(
                work.select(F.col(c).alias("_v")).filter(F.col("_v").isNotNull()), "_v"
            ).select(F.col("_v").alias(f"_{c}__v"), F.col("_avg_rank").alias(f"_{c}__r"))
            work = (
                work.join(r, work[c] == F.col(f"_{c}__v"), "left")
                .drop(c, f"_{c}__v")
                .withColumnRenamed(f"_{c}__r", c)
            )
    aggs = []
    for i, a in enumerate(cols):
        for b in cols[i + 1 :]:
            aggs.append(F.corr(a, b).alias(f"{a}||{b}"))
    row = work.agg(*aggs).first() if aggs else None
    k = len(cols)
    mat = np.eye(k)
    for i, a in enumerate(cols):
        for j in range(i + 1, k):
            v = row[f"{a}||{cols[j]}"]
            mat[i, j] = mat[j, i] = float("nan") if v is None else v
    return cols, mat


def _inversions(y: np.ndarray) -> int:
    """Number of strict inversions (i<j, y[i]>y[j]) — exact, via a
    bottom-up numpy mergesort: base blocks counted by a broadcast
    comparison, cross-run pairs by ``searchsorted``. All O(n log n)
    work happens in C (no per-element Python — a driver-side Fenwick
    loop here costs minutes at max_n=100k where this is sub-second,
    which would negate Knight's algorithm's advantage)."""
    n = len(y)
    if n < 2:
        return 0
    y = np.asarray(y)
    block = 256
    inv = 0
    runs = []
    for s in range(0, n, block):
        b = y[s : s + block]
        m = b[:, None] > b[None, :]
        inv += int(np.triu(m, 1).sum())
        runs.append(np.sort(b, kind="mergesort"))
    while len(runs) > 1:
        nxt = []
        for i in range(0, len(runs) - 1, 2):
            left, right = runs[i], runs[i + 1]
            # cross pairs: for each r in the later run, # of earlier-run
            # values strictly greater
            idx = np.searchsorted(left, right, side="right")
            inv += int((len(left) - idx).sum())
            nxt.append(np.sort(np.concatenate([left, right]), kind="mergesort"))
        if len(runs) % 2:
            nxt.append(runs[-1])
        runs = nxt
    return inv


def kendall_tau_values(x: np.ndarray, y: np.ndarray) -> float:
    """Exact Kendall tau-b (Knight's O(n log n) algorithm, scipy
    ``kendalltau`` parity): sort by (x, y), count discordant pairs as
    inversions of y, tie-correct with the pair-count identities."""
    n = len(x)
    if n < 2:
        return float("nan")
    order = np.lexsort((y, x))
    xs, ys = x[order], y[order]

    def _tie_pairs(v: np.ndarray) -> int:
        _, counts = np.unique(v, return_counts=True)
        return int(np.sum(counts * (counts - 1) // 2))

    tot = n * (n - 1) // 2
    xtie = _tie_pairs(xs)
    ytie = _tie_pairs(ys)
    # joint ties: pairs equal in BOTH columns
    joint = np.rec.fromarrays([xs, ys])
    _, jcounts = np.unique(joint, return_counts=True)
    ntie = int(np.sum(jcounts * (jcounts - 1) // 2))
    dis = _inversions(ys)
    con_minus_dis = tot - xtie - ytie + ntie - 2 * dis
    denom = math.sqrt(tot - xtie) * math.sqrt(tot - ytie)
    if denom == 0:
        return float("nan")
    return con_minus_dis / denom


def kendall_matrix(
    df: DataFrame, columns: list[str] | None = None, max_n: int = 100_000, seed: int = 42
) -> tuple[list[str], np.ndarray]:
    """Kendall tau-b matrix (reference data_analysis.py:143-156,
    ``corr(method='kendall')``). Pair counting is O(n²) information —
    inherently a sorted-sequential statistic — so like the reference
    (which runs pandas in one process) this computes exactly on the
    driver over a seeded ≤``max_n`` sample: ONE collect job total, then
    Knight's O(n log n) per pair, pairwise-complete like pandas."""
    cols = columns or numeric_columns(df)
    sel = df.select(*[F.col(c).cast("double").alias(c) for c in cols])
    n = sel.count()
    if n > max_n:
        frac = min(1.0, (max_n * 1.2) / n)
        sel = sel.sample(fraction=frac, seed=seed).orderBy(F.rand(seed)).limit(max_n)
    pdf = sel.toPandas()
    k = len(cols)
    mat = np.eye(k)
    for i in range(k):
        for j in range(i + 1, k):
            sub = pdf[[cols[i], cols[j]]].dropna()
            tau = kendall_tau_values(
                sub[cols[i]].to_numpy(), sub[cols[j]].to_numpy()
            ) if len(sub) >= 2 else float("nan")
            mat[i, j] = mat[j, i] = tau
    return cols, mat


def get_high_correlations(df: DataFrame, threshold: float = 0.7, columns=None) -> list[dict]:
    """|r| ≥ threshold pairs from the upper triangle, sorted by |r|
    (data_analysis.py:158-180)."""
    cols, mat = correlation_matrix(df, columns)
    out = []
    for i in range(len(cols)):
        for j in range(i + 1, len(cols)):
            r = mat[i, j]
            if not math.isnan(r) and abs(r) >= threshold:
                out.append({"a": cols[i], "b": cols[j], "r": r})
    return sorted(out, key=lambda d: -abs(d["r"]))


def validate_data_quality(df: DataFrame, high_card_threshold: float = 0.95) -> dict:
    """nulls / duplicates / constant cols / >95%-unique cols / inf counts
    in one multi-agg + one dedup count (preprocessing.py:1110-1194)."""
    num = numeric_columns(df)
    inf = float("inf")
    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in df.columns:
        aggs.append(F.sum(F.col(c).isNull().cast("long")).alias(f"{c}__null"))
        aggs.append(F.countDistinct(F.col(c)).alias(f"{c}__nu"))
    for c in num:
        aggs.append(
            F.sum(((F.col(c) == inf) | (F.col(c) == -inf)).cast("long")).alias(f"{c}__inf")
        )
    row = df.agg(*aggs).first()
    n = row["_n"]
    issues = []
    nulls = {c: int(row[f"{c}__null"] or 0) for c in df.columns}
    constant = [c for c in df.columns if row[f"{c}__nu"] <= 1]
    high_card = [
        c for c in df.columns if n and row[f"{c}__nu"] / n >= high_card_threshold
    ]
    infs = {c: int(row[f"{c}__inf"] or 0) for c in num}
    dups = n - df.dropDuplicates().count()
    if any(nulls.values()):
        issues.append("missing values present")
    if constant:
        issues.append(f"constant columns: {constant}")
    if dups:
        issues.append(f"{dups} duplicate rows")
    if any(infs.values()):
        issues.append("infinite values present")
    return {
        "rows": n,
        "nulls": nulls,
        "constant_columns": constant,
        "high_cardinality_columns": high_card,
        "infinite_counts": infs,
        "duplicates": dups,
        "issues": issues,
    }


def calculate_vif(df: DataFrame, columns: list[str] | None = None) -> list[dict]:
    """Variance inflation factors (reference ``data_analysis.py:214-274``:
    mean-impute → drop zero-std → intercept → statsmodels VIF per
    feature). Distributed part: one pass for means, one pass for the
    Gram matrix (counts + co-moments of the imputed columns); the
    driver inverts the (k × k) correlation matrix — with an intercept,
    ``VIF_i = diag(inv(corr))_i``. No per-feature regression jobs.
    """
    cols = columns or numeric_columns(df)
    inf = float("inf")

    def _finite(c: str):
        # ±inf → null before imputation (one inf row would otherwise
        # poison the whole Gram matrix)
        v = F.col(c).cast("double")
        return F.when((v != inf) & (v != -inf), v)

    means_row = df.agg(*[F.avg(_finite(c)).alias(c) for c in cols]).first()
    means = {c: means_row[c] for c in cols}
    cols = [c for c in cols if means[c] is not None]
    imp = {c: F.coalesce(_finite(c), F.lit(float(means[c]))) for c in cols}

    aggs = [F.count(F.lit(1)).alias("_n")]
    for i, a in enumerate(cols):
        aggs.append(F.sum(imp[a]).alias(f"s__{i}"))
        for j in range(i, len(cols)):
            aggs.append(F.sum(imp[a] * imp[cols[j]]).alias(f"p__{i}__{j}"))
    row = df.agg(*aggs).first()
    n = row["_n"]
    if n < 2:
        return []

    k = len(cols)
    cov = np.empty((k, k))
    for i in range(k):
        for j in range(i, k):
            cov[i, j] = cov[j, i] = (
                row[f"p__{i}__{j}"] / n - (row[f"s__{i}"] / n) * (row[f"s__{j}"] / n)
            )
    sd = np.sqrt(np.diag(cov))
    keep = [i for i in range(k) if sd[i] > 0]  # drop zero-variance (reference does)
    if len(keep) < 2:
        return [{"feature": cols[i], "vif": 1.0} for i in keep]
    sub = cov[np.ix_(keep, keep)]
    d = np.sqrt(np.diag(sub))
    corr = sub / np.outer(d, d)
    inv = np.linalg.pinv(corr)
    return [
        {"feature": cols[i], "vif": float(inv[a, a])}
        for a, i in enumerate(keep)
    ]

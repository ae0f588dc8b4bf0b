"""Driver-side statistical formulas on distributed sufficient
statistics — re-expression of the reference's ``statistical_utils.py``
(SURVEY §2.14). Heavy lifting (counts, sums, contingency tables,
group moments) runs in Spark; the closed-form math runs here.

scipy/statsmodels are not in the runtime — p-values come from
``analysis.special`` (incomplete gamma/beta); where the reference
calls a sampling-based scipy test (Shapiro), we provide the
moment-based D'Agostino-Pearson K² and Jarque-Bera equivalents from
the same sufficient statistics.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from feature_engineering_tk_spark.analysis import special as S


# ---------------------------------------------------------------------------
# distributed sufficient statistics

def group_moments(df: DataFrame, value: str, group: str | None = None) -> list[dict]:
    """(n, mean, var_ddof1, min, max, skew_g1, kurt_g2) per group —
    one aggregate job; the input to every effect-size / ANOVA formula."""
    aggs = [
        F.count(value).alias("n"),
        F.avg(value).alias("mean"),
        F.var_samp(value).alias("var"),
        F.min(value).alias("min"),
        F.max(value).alias("max"),
        F.skewness(value).alias("skew_pop"),
        F.kurtosis(value).alias("kurt_pop"),
    ]
    if group is None:
        rows = [df.agg(*aggs).first().asDict()]
        rows[0]["group"] = None
        return rows
    return [
        r.asDict()
        for r in df.groupBy(F.col(group).alias("group")).agg(*aggs).collect()
    ]


def contingency_table(df: DataFrame, a: str, b: str) -> np.ndarray:
    """Observed counts matrix from one groupBy job (rows=a, cols=b,
    both sorted for determinism)."""
    rows = df.groupBy(a, b).count().collect()
    avals = sorted({r[a] for r in rows}, key=str)
    bvals = sorted({r[b] for r in rows}, key=str)
    tbl = np.zeros((len(avals), len(bvals)))
    ai = {v: i for i, v in enumerate(avals)}
    bi = {v: i for i, v in enumerate(bvals)}
    for r in rows:
        tbl[ai[r[a]], bi[r[b]]] = r["count"]
    return tbl


# ---------------------------------------------------------------------------
# pandas-parity moments (SURVEY §2.9 parity trap)

def bias_corrected_skew(g1: float, n: int) -> float:
    """pandas ``skew()`` = G1 = g1 * sqrt(n(n-1)) / (n-2)."""
    if n < 3 or g1 is None:
        return float("nan")
    return g1 * math.sqrt(n * (n - 1)) / (n - 2)


def bias_corrected_kurtosis(g2: float, n: int) -> float:
    """pandas ``kurtosis()`` (excess) = ((n+1)·g2 + 6)·(n-1)/((n-2)(n-3))."""
    if n < 4 or g2 is None:
        return float("nan")
    return ((n + 1) * g2 + 6.0) * (n - 1) / ((n - 2) * (n - 3))


# ---------------------------------------------------------------------------
# effect sizes (reference statistical_utils.py:395-716)

def cohens_d(n1: int, m1: float, v1: float, n2: int, m2: float, v2: float) -> dict:
    """Pooled-std standardized mean difference + interpretation tiers
    .2/.5/.8 (reference :395-480). Variances are ddof=1."""
    pooled = math.sqrt(((n1 - 1) * v1 + (n2 - 1) * v2) / (n1 + n2 - 2))
    d = (m1 - m2) / pooled if pooled > 0 else float("nan")
    ad = abs(d)
    interp = (
        "negligible" if ad < 0.2 else "small" if ad < 0.5 else "medium" if ad < 0.8 else "large"
    )
    return {"d": d, "interpretation": interp}


def eta_squared_from_groups(groups: list[dict]) -> float:
    """SS_between / SS_total from per-group (n, mean, var_ddof1)
    (reference :483-565)."""
    n_tot = sum(g["n"] for g in groups)
    grand = sum(g["n"] * g["mean"] for g in groups) / n_tot
    ss_between = sum(g["n"] * (g["mean"] - grand) ** 2 for g in groups)
    ss_within = sum((g["n"] - 1) * (g["var"] or 0.0) for g in groups)
    ss_total = ss_between + ss_within
    return ss_between / ss_total if ss_total > 0 else float("nan")


def anova_f_from_groups(groups: list[dict]) -> dict:
    """One-way ANOVA F + p from per-group moments — the closed form the
    reference computes via scipy f_oneway on raw arrays."""
    k = len(groups)
    n_tot = sum(g["n"] for g in groups)
    if k < 2 or n_tot <= k:
        return {"F": float("nan"), "pvalue": float("nan")}
    grand = sum(g["n"] * g["mean"] for g in groups) / n_tot
    ss_between = sum(g["n"] * (g["mean"] - grand) ** 2 for g in groups)
    ss_within = sum((g["n"] - 1) * (g["var"] or 0.0) for g in groups)
    df1, df2 = k - 1, n_tot - k
    if ss_within <= 0:
        return {"F": float("inf"), "pvalue": 0.0, "df": (df1, df2)}
    f = (ss_between / df1) / (ss_within / df2)
    return {"F": f, "pvalue": S.f_sf(f, df1, df2), "df": (df1, df2)}


def chi2_independence(observed: np.ndarray, yates: bool = False) -> dict:
    """Pearson chi-square of independence from a contingency table
    (reference :326-388, :568-695)."""
    obs = np.asarray(observed, dtype=float)
    row = obs.sum(axis=1, keepdims=True)
    col = obs.sum(axis=0, keepdims=True)
    n = obs.sum()
    expected = row @ col / n
    diff = np.abs(obs - expected)
    if yates and obs.shape == (2, 2):
        diff = np.maximum(diff - 0.5, 0.0)
    with np.errstate(divide="ignore", invalid="ignore"):
        terms = np.where(expected > 0, diff**2 / expected, 0.0)
    chi2 = float(terms.sum())
    dof = (obs.shape[0] - 1) * (obs.shape[1] - 1)
    pct_low = float((expected < 5).mean())
    return {
        "chi2": chi2,
        "dof": dof,
        "pvalue": S.chi2_sf(chi2, dof) if dof > 0 else float("nan"),
        "expected": expected,
        "pct_expected_below_5": pct_low,
        "valid": pct_low < 0.2 and expected.min() >= 1,  # reference rule
    }


def cramers_v(observed: np.ndarray, bias_correction: bool = False) -> float:
    """sqrt(chi2 / (n·min_dim)) with optional Bergsma-Wicher correction
    (reference :568-695)."""
    obs = np.asarray(observed, dtype=float)
    n = obs.sum()
    r, k = obs.shape
    chi2 = chi2_independence(obs)["chi2"]
    if bias_correction:
        phi2 = max(0.0, chi2 / n - (k - 1) * (r - 1) / (n - 1))
        rc = r - (r - 1) ** 2 / (n - 1)
        kc = k - (k - 1) ** 2 / (n - 1)
        denom = min(rc - 1, kc - 1)
    else:
        phi2 = chi2 / n
        denom = min(r - 1, k - 1)
    return math.sqrt(phi2 / denom) if denom > 0 else float("nan")


def pearson_r_to_d(r: float) -> float:
    """2r / sqrt(1-r²) (reference :698-716)."""
    if abs(r) >= 1:
        return float("inf") if r > 0 else float("-inf")
    return 2.0 * r / math.sqrt(1.0 - r * r)


# ---------------------------------------------------------------------------
# confidence intervals (reference :802-923)

def mean_ci(n: int, mean: float, std_ddof1: float, confidence: float = 0.95) -> tuple:
    if n < 2:
        return (float("nan"), float("nan"))
    tcrit = S.t_ppf(1.0 - (1.0 - confidence) / 2.0, n - 1)
    sem = std_ddof1 / math.sqrt(n)
    return (mean - tcrit * sem, mean + tcrit * sem)


def correlation_ci(r: float, n: int, confidence: float = 0.95) -> tuple:
    """Fisher-Z CI; NaN for |r| >= 1 or n < 4 (reference :859-923)."""
    if abs(r) >= 1.0 or n < 4:
        return (float("nan"), float("nan"))
    z = 0.5 * math.log((1 + r) / (1 - r))
    se = 1.0 / math.sqrt(n - 3)
    zc = S.normal_ppf(1.0 - (1.0 - confidence) / 2.0)
    lo, hi = z - zc * se, z + zc * se
    return (math.tanh(lo), math.tanh(hi))


def pearson_pvalue(r: float, n: int) -> float:
    """Two-sided p for Pearson r via the t-transform."""
    if n < 3 or abs(r) >= 1.0:
        return float("nan") if n < 3 else 0.0
    t = r * math.sqrt((n - 2) / (1.0 - r * r))
    return S.t_sf_two_sided(t, n - 2)


def _hash_resample_indices(n: int, n_boot: int, seed: int) -> np.ndarray:
    """Portable bootstrap resample indices: idx[b, i] = 60-bit md5 fold
    of ``'boot{seed}:{b}:{i}'`` mod n — the dedup ``_hash60`` scheme, so
    any engine (DuckDB oracle included) regenerates the identical index
    matrix from (seed, n_boot, n) alone. No RNG-implementation
    dependence, unlike ``default_rng``."""
    import hashlib

    out = np.empty((n_boot, n), dtype=np.int64)
    for b in range(n_boot):
        pre = f"boot{seed}:{b}:"
        row = out[b]
        for i in range(n):
            row[i] = int(hashlib.md5((pre + str(i)).encode()).hexdigest()[:15], 16) % n
    return out


def bootstrap_ci(
    values: np.ndarray,
    statistic=np.median,
    n_boot: int = 1000,
    confidence: float = 0.95,
    seed: int = 42,
    sampler: str = "rng",
) -> tuple:
    """Percentile bootstrap (reference :926-1002). Runs on a collected
    (small, per-class) sample. ``sampler='rng'`` is seeded default_rng
    (reference parity); ``sampler='hash'`` draws indices from a
    portable md5 fold (:func:`_hash_resample_indices`) so the exact CI
    is replayable outside numpy — used by the oracle-verified gate
    query."""
    values = np.asarray(values)
    if sampler == "rng":
        rng = np.random.default_rng(seed)
        idx = rng.integers(0, len(values), size=(n_boot, len(values)))
    elif sampler == "hash":
        idx = _hash_resample_indices(len(values), n_boot, seed)
    else:
        raise ValueError("sampler must be rng|hash")
    stats = np.array([statistic(values[row]) for row in idx])
    alpha = (1.0 - confidence) / 2.0
    return (float(np.quantile(stats, alpha)), float(np.quantile(stats, 1 - alpha)))


# ---------------------------------------------------------------------------
# normality & homogeneity (reference :39-256)

def normality_from_moments(n: int, skew_g1: float, kurt_g2: float) -> dict:
    """Jarque-Bera test from population moments (the sufficient-stat
    normality check; the reference's Shapiro runs on a ≤5000 sample —
    see ``target.sampled_shapiro_stub``)."""
    if n < 8:
        return {"statistic": float("nan"), "pvalue": float("nan"), "is_normal": None}
    jb = n / 6.0 * (skew_g1**2 + (kurt_g2**2) / 4.0)
    p = S.chi2_sf(jb, 2)
    return {"statistic": jb, "pvalue": p, "is_normal": p > 0.05}


def levene_from_spark(df: DataFrame, value: str, group: str) -> dict:
    """Brown-Forsythe Levene (median-centered): two distributed passes —
    per-group medians (exact percentile), then ANOVA on |x - median|
    (reference :184-256 maps scipy.levene(center='median'))."""
    med = {
        r["g"]: r["m"]
        for r in df.groupBy(F.col(group).alias("g"))
        .agg(F.percentile(F.col(value), F.lit(0.5)).alias("m"))
        .collect()
    }
    med_map = F.create_map(*[x for k, v in med.items() for x in (F.lit(k), F.lit(v))])
    dev = df.withColumn("_z", F.abs(F.col(value) - med_map[F.col(group)]))
    groups = group_moments(dev, "_z", group)
    res = anova_f_from_groups(groups)
    return {"statistic": res["F"], "pvalue": res["pvalue"], "equal_variance": res["pvalue"] > 0.05}


# ---------------------------------------------------------------------------
# multiple-testing correction (reference :723-795)

def multiple_testing_correction(pvalues: list[float], method: str = "fdr_bh") -> dict:
    """bonferroni / holm / fdr_bh / fdr_by — statsmodels-compatible
    adjusted p-values, pure numpy."""
    p = np.asarray(pvalues, dtype=float)
    m = len(p)
    order = np.argsort(p)
    ranked = p[order]
    adj = np.empty(m)
    if method == "bonferroni":
        adj = np.minimum(p * m, 1.0)
    elif method == "holm":
        stepdown = np.maximum.accumulate(ranked * (m - np.arange(m)))
        out = np.minimum(stepdown, 1.0)
        adj[order] = out
    elif method in ("fdr_bh", "fdr_by"):
        scale = m / (np.arange(m) + 1.0)
        if method == "fdr_by":
            scale *= np.sum(1.0 / (np.arange(m) + 1.0))
        stepup = np.minimum.accumulate((ranked * scale)[::-1])[::-1]
        out = np.minimum(stepup, 1.0)
        adj[order] = out
    else:
        raise ValueError(f"unknown method {method!r}")
    return {"adjusted": adj.tolist(), "rejected": (adj < 0.05).tolist(), "method": method}


def validate_sample_size(n_per_group: list[int], test_type: str = "t_test") -> dict:
    """Minimum-n rules per test (reference :259-323)."""
    minimums = {"t_test": 2, "anova": 2, "chi2": 5, "correlation": 4, "normality": 8}
    need = minimums.get(test_type, 2)
    ok = all(n >= need for n in n_per_group)
    return {"valid": ok, "minimum": need, "groups": n_per_group}


def bartlett(df: DataFrame, value: str, group: str) -> dict:
    """Bartlett homogeneity-of-variance test from one group-moments pass
    (reference check_homogeneity_of_variance, statistical_utils.py:184-256
    maps scipy.bartlett): T = [(N-k)·ln(s_p²) − Σ(n_i−1)·ln(s_i²)] / C."""
    groups = [g for g in group_moments(df, value, group) if g["n"] and g["n"] > 1]
    k = len(groups)
    if k < 2:
        return {"statistic": float("nan"), "pvalue": float("nan"), "equal_variance": None}
    N = sum(g["n"] for g in groups)
    sp2 = sum((g["n"] - 1) * g["var"] for g in groups) / (N - k)
    T = (N - k) * math.log(sp2) - sum((g["n"] - 1) * math.log(g["var"]) for g in groups)
    C = 1.0 + (sum(1.0 / (g["n"] - 1) for g in groups) - 1.0 / (N - k)) / (3.0 * (k - 1))
    stat = T / C
    p = S.chi2_sf(stat, k - 1)
    return {"statistic": stat, "pvalue": p, "equal_variance": p > 0.05}


def _average_ranks(df: DataFrame, value: str) -> DataFrame:
    """Distributed average ranks (ties → midrank), scipy.rankdata parity.

    Scalable form: rank arithmetic runs on the DISTINCT values —
    groupBy(value).count() (one shuffle, map-side combine), then a
    range-partitioned prefix sum over the sorted distinct values (the
    quantiles.py pattern: per-partition cumsum + broadcast partition
    offsets) — never a single-partition window over row data."""
    sess = df.sparkSession
    vc = df.groupBy(F.col(value).alias("_v")).agg(F.count(F.lit(1)).alias("_c"))
    nparts = max(sess.sparkContext.defaultParallelism, 2)
    vc = vc.repartitionByRange(nparts, "_v").sortWithinPartitions("_v")
    vc = vc.withColumn("_pid", F.spark_partition_id()).persist()
    try:
        part_tot = {
            r["_pid"]: r["t"]
            for r in vc.groupBy("_pid").agg(F.sum("_c").alias("t")).collect()
        }
        offs, acc = {}, 0
        for pid in sorted(part_tot):
            offs[pid] = acc
            acc += part_tot[pid]
        off_map = F.create_map(*[x for k, v in offs.items() for x in (F.lit(k), F.lit(v))])
        w = Window.partitionBy("_pid").orderBy("_v").rowsBetween(Window.unboundedPreceding, 0)
        ranked = vc.withColumn(
            "_avg_rank",
            off_map[F.col("_pid")] + F.sum("_c").over(w) - F.col("_c") + (F.col("_c") + 1) / 2.0,
        ).select("_v", "_c", "_avg_rank")
        ranked = ranked.localCheckpoint(eager=True)  # cut lineage off the persisted shuffle
        return ranked
    finally:
        vc.unpersist()


def kruskal_wallis(df: DataFrame, value: str, group: str) -> dict:
    """Kruskal-Wallis H (scipy.kruskal parity, tie-corrected) — the
    reference's non-parametric fallback when ANOVA assumptions fail
    (target_analyzer/statistical.py:31-250). Global ranks WITHOUT a
    global sort: midranks from distinct-value prefix sums, joined back
    on the value key."""
    d = df.select(F.col(group).alias("_g"), F.col(value).alias("_v")).filter(
        F.col("_v").isNotNull()
    )
    ranks = _average_ranks(d, "_v")
    j = d.join(ranks, "_v")
    per_group = j.groupBy("_g").agg(
        F.sum("_avg_rank").alias("R"), F.count(F.lit(1)).alias("n")
    ).collect()
    k = len(per_group)
    N = sum(r["n"] for r in per_group)
    if k < 2 or N < 3:
        return {"statistic": float("nan"), "pvalue": float("nan")}
    H = 12.0 / (N * (N + 1.0)) * sum(r["R"] ** 2 / r["n"] for r in per_group) - 3.0 * (N + 1.0)
    ties = ranks.agg(
        F.sum(F.col("_c").cast("double") * F.col("_c") * F.col("_c") - F.col("_c")).alias("t")
    ).first()["t"]
    C = 1.0 - (ties or 0.0) / (float(N) ** 3 - N)
    stat = H / C if C > 0 else float("nan")
    p = S.chi2_sf(stat, k - 1)
    return {"statistic": stat, "pvalue": p}


def mann_whitney_u(
    df: DataFrame,
    value: str,
    group: str,
    group_a,
    group_b,
) -> dict:
    """Mann-Whitney U (scipy.mannwhitneyu two-sided, normal
    approximation with tie correction and continuity correction) —
    the two-group special case the reference reaches via
    Kruskal-Wallis (target_analyzer/statistical.py non-parametric
    path), exposed directly because drift checks compare exactly two
    slices.

    Same scale shape as kruskal_wallis: global midranks WITHOUT a
    global sort (distinct-value prefix sums), one rank join, one
    two-row aggregate; everything after runs on sufficient statistics
    on the driver.
    """
    d = df.select(F.col(group).alias("_g"), F.col(value).alias("_v")).filter(
        F.col("_v").isNotNull() & F.col(group).isin([group_a, group_b])
    )
    ranks = _average_ranks(d, "_v")
    per_group = {
        r["_g"]: (r["R"], r["n"])
        for r in d.join(ranks, "_v")
        .groupBy("_g")
        .agg(F.sum("_avg_rank").alias("R"), F.count(F.lit(1)).alias("n"))
        .collect()
    }
    if group_a not in per_group or group_b not in per_group:
        return {"u_statistic": float("nan"), "z": float("nan"), "pvalue": float("nan")}
    r1, n1 = per_group[group_a]
    _r2, n2 = per_group[group_b]
    N = n1 + n2
    u1 = r1 - n1 * (n1 + 1) / 2.0
    mu = n1 * n2 / 2.0
    ties = ranks.agg(
        F.sum(F.col("_c").cast("double") * F.col("_c") * F.col("_c") - F.col("_c")).alias("t")
    ).first()["t"] or 0.0
    sigma_sq = n1 * n2 / 12.0 * ((N + 1.0) - ties / (N * (N - 1.0)))
    if sigma_sq <= 0:
        return {"u_statistic": u1, "z": float("nan"), "pvalue": float("nan")}
    sigma = math.sqrt(sigma_sq)
    cc = 0.5 if u1 > mu else (-0.5 if u1 < mu else 0.0)
    z = (u1 - mu - cc) / sigma
    p = math.erfc(abs(z) / math.sqrt(2.0))
    return {
        "u_statistic": u1,
        "z": z,
        "pvalue": min(p, 1.0),
        "n1": int(n1),
        "n2": int(n2),
    }

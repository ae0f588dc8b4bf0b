"""Drift monitors (PSI, exact two-sample KS) and Mann-Whitney U vs
independent numpy/pure-python references."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from feature_engineering_tk_spark.analysis.drift import (
    ks_statistic_df,
    ks_two_sample,
    psi,
    psi_table,
)
from feature_engineering_tk_spark.analysis.stats import mann_whitney_u


def _df(spark, vals, extra=None):
    rows = [(float(v),) for v in vals]
    return spark.createDataFrame(rows, "value double")


class TestPSI:
    def test_identical_slices_score_zero(self, spark):
        rng = np.random.default_rng(5)
        v = rng.normal(0, 1, 2000)
        d = _df(spark, v)
        assert abs(psi(d, d, "value")) < 1e-9

    def test_shifted_slice_alarms(self, spark):
        rng = np.random.default_rng(5)
        ref = _df(spark, rng.normal(0, 1, 2000))
        cur = _df(spark, rng.normal(1.2, 1, 2000))
        assert psi(ref, cur, "value") > 0.25

    def test_bins_cover_all_rows_and_ref_is_uniform(self, spark):
        rng = np.random.default_rng(6)
        ref = _df(spark, rng.normal(0, 1, 1000))
        cur = _df(spark, rng.normal(0.2, 1, 500))
        t = psi_table(ref, cur, "value", bins=10).collect()
        assert len(t) == 10
        assert sum(r["n_ref"] for r in t) == 1000
        assert sum(r["n_cur"] for r in t) == 500
        assert all(r["n_ref"] in (100,) or abs(r["n_ref"] - 100) <= 1 for r in t)

    def test_empty_bin_is_finite(self, spark):
        ref = _df(spark, np.linspace(0, 1, 200))
        cur = _df(spark, np.linspace(10, 11, 200))  # all mass beyond last edge
        val = psi(ref, cur, "value")
        assert math.isfinite(val) and val > 1.0


class TestKS:
    def test_identical_samples(self, spark):
        d = _df(spark, np.arange(100))
        r = ks_two_sample(d, d, "value")
        assert r["statistic"] == 0.0 and r["pvalue"] == 1.0

    def test_matches_numpy_ecdf(self, spark):
        rng = np.random.default_rng(9)
        a = rng.normal(0, 1, 300)
        b = rng.normal(0.5, 1.3, 400)
        r = ks_two_sample(_df(spark, a), _df(spark, b), "value")
        pooled = np.unique(np.concatenate([a, b]))
        f1 = np.searchsorted(np.sort(a), pooled, side="right") / len(a)
        f2 = np.searchsorted(np.sort(b), pooled, side="right") / len(b)
        assert abs(r["statistic"] - np.abs(f1 - f2).max()) < 1e-9
        assert r["n1"] == 300 and r["n2"] == 400
        # Kolmogorov-series p, independent evaluation
        en = math.sqrt(300 * 400 / 700)
        lam = (en + 0.12 + 0.11 / en) * r["statistic"]
        p = sum(
            (2.0 if j % 2 == 1 else -2.0) * math.exp(-2.0 * j * j * lam * lam)
            for j in range(1, 101)
        )
        assert abs(r["pvalue"] - min(max(p, 0.0), 1.0)) < 1e-8

    def test_disjoint_samples(self, spark):
        r = ks_two_sample(
            _df(spark, np.arange(50)), _df(spark, np.arange(100, 150)), "value"
        )
        assert r["statistic"] == 1.0 and r["pvalue"] < 1e-6


class TestMannWhitney:
    def _ref(self, x, y):
        """Independent reference: midranks via sorting, scipy
        mannwhitneyu(use_continuity=True, alternative='two-sided')
        normal-approximation formulas."""
        allv = sorted([(v, 0, i) for i, v in enumerate(x)] + [(v, 1, i) for i, v in enumerate(y)])
        ranks = {}
        i = 0
        pos = 1
        tie_sum = 0.0
        while i < len(allv):
            j = i
            while j < len(allv) and allv[j][0] == allv[i][0]:
                j += 1
            t = j - i
            mid = (pos + pos + t - 1) / 2.0
            for k in range(i, j):
                ranks[(allv[k][1], allv[k][2])] = mid
            tie_sum += t**3 - t
            pos += t
            i = j
        n1, n2 = len(x), len(y)
        N = n1 + n2
        r1 = sum(ranks[(0, i)] for i in range(n1))
        u1 = r1 - n1 * (n1 + 1) / 2.0
        mu = n1 * n2 / 2.0
        sigma = math.sqrt(n1 * n2 / 12.0 * ((N + 1.0) - tie_sum / (N * (N - 1.0))))
        cc = 0.5 if u1 > mu else (-0.5 if u1 < mu else 0.0)
        z = (u1 - mu - cc) / sigma
        return u1, z, math.erfc(abs(z) / math.sqrt(2.0))

    def test_matches_reference_with_ties(self, spark):
        x = [1.0, 2.0, 2.0, 3.5, 7.0, 9.0, 9.0]
        y = [2.0, 4.0, 5.0, 9.0, 11.0, 12.0]
        df = spark.createDataFrame(
            [("a", v) for v in x] + [("b", v) for v in y], "grp string, value double"
        )
        r = mann_whitney_u(df, "value", "grp", "a", "b")
        u1, z, p = self._ref(x, y)
        assert r["u_statistic"] == u1
        assert abs(r["z"] - z) < 1e-12
        assert abs(r["pvalue"] - p) < 1e-12

    def test_missing_group_returns_nan(self, spark):
        df = spark.createDataFrame([("a", 1.0)], "grp string, value double")
        r = mann_whitney_u(df, "value", "grp", "a", "zzz")
        assert math.isnan(r["pvalue"])


def test_hist_sketch_lossless_merge_and_psi_parity(spark):
    """Fixed-edge sketches merge losslessly, and sketch-path PSI
    equals raw-path PSI exactly (the psi_sketch oracle contract)."""
    from pyspark.sql import functions as F

    from feature_engineering_tk_spark.analysis.drift import (
        hist_sketch_table,
        merge_hist_sketches,
        psi_from_sketches,
        psi_table,
        reference_edges,
    )

    ref = spark.createDataFrame(
        [(i, float(i % 17)) for i in range(300)], "id bigint, v double"
    )
    cur = spark.createDataFrame(
        [(i, float((i * 3) % 23)) for i in range(200)]
        + [(999, None)],  # null lands in the -1 bin, excluded from PSI
        "id bigint, v double",
    )
    edges = reference_edges(ref, "v", bins=5)
    rs = hist_sketch_table(ref.withColumn("s", F.col("id") % 3), "v", "s", edges)
    cs = hist_sketch_table(cur.withColumn("s", F.col("id") % 3), "v", "s", edges)

    # lossless: merged sketch == direct histogram of the union
    merged = {r["bin"]: r["n"] for r in merge_hist_sketches(rs).collect()}
    direct = {
        r["bin"]: r["n"]
        for r in hist_sketch_table(
            ref.withColumn("all", F.lit(1)), "v", "all", edges
        ).select("bin", "n").collect()
    }
    assert merged == direct
    # null accounting: totals equal row counts
    assert sum(r["n"] for r in merge_hist_sketches(cs).collect()) == 201
    assert {r["bin"] for r in cs.collect() if r["bin"] == -1}  # null bin present

    got = {
        r["bin"]: (r["n_ref"], r["n_cur"], r["psi_term"], r["psi_total"])
        for r in psi_from_sketches(rs, cs, n_bins=len(edges) + 1).collect()
    }
    want = {
        r["bin"]: (r["n_ref"], r["n_cur"], r["psi_term"], r["psi_total"])
        for r in psi_table(ref, cur, "v", bins=5).collect()
    }
    assert got == want


def test_hist_sketch_guards(spark):
    from feature_engineering_tk_spark.analysis.drift import (
        hist_sketch_table,
        merge_hist_sketches,
    )
    from feature_engineering_tk_spark.exceptions import ColumnNotFoundError

    df = spark.createDataFrame([(1, 1.0)], "s int, v double")
    with pytest.raises(ColumnNotFoundError):
        hist_sketch_table(df, "nope", "s", [0.5])
    with pytest.raises(ValueError):
        hist_sketch_table(df, "v", "s", [])
    sk = hist_sketch_table(df, "v", "s", [0.5])
    with pytest.raises(ColumnNotFoundError):
        merge_hist_sketches(sk.drop("n"))
    with pytest.raises(ColumnNotFoundError):
        merge_hist_sketches(sk, by="nope")


def test_quantiles_from_hist_brackets_exact_quantiles(spark):
    """The sketch answer's [lo, hi] bin must contain the exact
    quantile, for every prob — the structural error bound."""
    from pyspark.sql import functions as F

    from feature_engineering_tk_spark.analysis.drift import (
        hist_sketch_table,
        quantiles_from_hist,
        reference_edges,
    )
    from feature_engineering_tk_spark.operators.quantiles import exact_quantiles

    df = spark.createDataFrame(
        [(i, float((i * 7) % 101)) for i in range(500)], "id bigint, v double"
    )
    edges = reference_edges(df, "v", bins=10)
    sk = hist_sketch_table(df.withColumn("s", F.col("id") % 4), "v", "s", edges)
    probs = [0.1, 0.5, 0.9]
    got = {r.prob: (r.lo, r.hi) for r in quantiles_from_hist(sk, edges, probs).collect()}
    exact = exact_quantiles(df, "v", probs)
    for p, ex in zip(probs, exact):
        lo, hi = got[p]
        assert lo is None or lo <= ex
        assert hi is None or ex <= hi
    with pytest.raises(ValueError):
        quantiles_from_hist(sk, edges, [1.5])
    # empty sketch -> null intervals
    empty = sk.where(F.lit(False))
    rows = quantiles_from_hist(empty, edges, [0.5]).collect()
    assert rows[0].lo is None and rows[0].hi is None

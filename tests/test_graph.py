"""Weighted PageRank vs hand-computed / invariant expectations."""

from fractions import Fraction

import pytest
from pyspark.sql import functions as F

from feature_engineering_tk_spark.operators.graph import pagerank

SCALE = 10**9


def _edges(spark, rows):
    return spark.createDataFrame(rows, "src long, dst long, weight long")


class TestPageRank:
    def test_symmetric_cycle_stays_uniform(self, spark):
        # 0→1→2→0: every node keeps exactly 1/3 of the mass forever.
        e = _edges(spark, [(0, 1, 1), (1, 2, 1), (2, 0, 1)])
        out = pagerank(e, weight="weight", n_iter=4).collect()
        assert len(out) == 3
        for r in out:
            assert r["rank_fp"] == SCALE // 3
            assert r["rank"] == pytest.approx(1 / 3, abs=1e-8)

    def test_matches_driver_fixed_point_simulation(self, spark):
        # Star + chain with a dangling node (4 has no out-edges) and a
        # weighted edge; replay the exact integer recurrence in Python.
        rows = [(0, 1, 2), (0, 2, 1), (1, 2, 1), (2, 3, 1), (3, 0, 1), (3, 4, 3)]
        e = _edges(spark, rows)
        n_iter, damping = 6, 0.85
        out = {r["node"]: r["rank_fp"]
               for r in pagerank(e, weight="weight", damping=damping,
                                 n_iter=n_iter).collect()}

        nodes = sorted({s for s, _, _ in rows} | {d for _, d, _ in rows})
        n = len(nodes)
        ow = {}
        for s, _, w in rows:
            ow[s] = ow.get(s, 0) + w
        frac = Fraction(damping).limit_denominator(10_000)
        num, den = frac.numerator, frac.denominator
        base = ((den - num) * SCALE) // (den * n)
        r = {v: SCALE // n for v in nodes}
        for _ in range(n_iter):
            contrib = {v: 0 for v in nodes}
            for s, d, w in rows:
                contrib[d] += (w * r[s]) // ow[s]
            dm = sum(r[v] for v in nodes if v not in ow)
            r = {v: base + (num * (contrib[v] + dm // n)) // den for v in nodes}
        assert out == r

    def test_dangling_mass_not_lost(self, spark):
        # 0→1, 1 dangling: total mass stays ~1 (floor loss < n ulps/iter).
        e = _edges(spark, [(0, 1, 1)])
        out = pagerank(e, weight="weight", n_iter=10).collect()
        total = sum(r["rank_fp"] for r in out)
        assert abs(total - SCALE) < 10 * 2 * 3  # n_iter * n * ulp slack

    def test_heavier_weight_ranks_higher(self, spark):
        # 0 sends 9x more weight to 2 than to 1.
        e = _edges(spark, [(0, 1, 1), (0, 2, 9), (1, 0, 1), (2, 0, 1)])
        out = {r["node"]: r["rank_fp"] for r in pagerank(e, weight="weight",
                                                         n_iter=8).collect()}
        assert out[2] > out[1]

    def test_unweighted_default(self, spark):
        e = spark.createDataFrame([(0, 1), (1, 0)], "src long, dst long")
        out = pagerank(e, n_iter=3).collect()
        for r in out:
            assert r["rank_fp"] == SCALE // 2

    def test_checkpoint_every_preserves_result(self, spark):
        rows = [(0, 1, 1), (1, 2, 1), (2, 0, 1), (0, 2, 2)]
        e = _edges(spark, rows)
        a = {r["node"]: r["rank_fp"]
             for r in pagerank(e, weight="weight", n_iter=5,
                               checkpoint_every=2).collect()}
        b = {r["node"]: r["rank_fp"]
             for r in pagerank(e, weight="weight", n_iter=5,
                               checkpoint_every=100).collect()}
        assert a == b

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


class TestHits:
    def _sim(self, rows, n_iter, scale=10**6):
        nodes = sorted({s for s, _, _ in rows} | {d for _, d, _ in rows})
        h = {v: scale for v in nodes}
        a = {}
        for _ in range(n_iter):
            ar = {v: 0 for v in nodes}
            for s, d, w in rows:
                ar[d] += w * h[s]
            m = max(1, max(ar.values()) if ar else 1)
            a = {v: (ar[v] * scale) // m for v in nodes}
            hr = {v: 0 for v in nodes}
            for s, d, w in rows:
                hr[s] += w * a[d]
            m = max(1, max(hr.values()) if hr else 1)
            h = {v: (hr[v] * scale) // m for v in nodes}
        return a, h

    def test_matches_driver_simulation(self, spark):
        from feature_engineering_tk_spark.operators.graph import hits

        rows = [(0, 2, 1), (1, 2, 2), (0, 3, 1), (3, 2, 1), (2, 4, 1)]
        e = _edges(spark, rows)
        out = {r["node"]: (r["authority_fp"], r["hub_fp"])
               for r in hits(e, weight="weight", n_iter=3).collect()}
        a, h = self._sim(rows, 3)
        assert out == {v: (a[v], h[v]) for v in a}

    def test_pure_authority_and_hub(self, spark):
        from feature_engineering_tk_spark.operators.graph import hits

        # 0 and 1 both point at 2: 2 is the sole authority (score 1.0),
        # and the heavier-weighted pointer is the stronger hub.
        e = _edges(spark, [(0, 2, 3), (1, 2, 1)])
        out = {r["node"]: r for r in hits(e, weight="weight", n_iter=2).collect()}
        assert out[2]["authority"] == 1.0 and out[2]["hub"] == 0.0
        assert out[0]["hub"] == 1.0
        assert 0.0 < out[1]["hub"] < 1.0
        assert out[0]["authority"] == 0.0

    def test_unweighted_symmetric_pair(self, spark):
        from feature_engineering_tk_spark.operators.graph import hits

        e = spark.createDataFrame([(0, 1), (1, 0)], "src long, dst long")
        out = {r["node"]: r for r in hits(e, n_iter=3).collect()}
        for v in (0, 1):
            assert out[v]["authority"] == 1.0 and out[v]["hub"] == 1.0


class TestLabelPropagation:
    def test_path_graph_deterministic_tie_bias(self, spark):
        from feature_engineering_tk_spark.operators.graph import label_propagation

        # path 0-1-2-3-4, seeds at the ends with labels 0 and 1.
        # Synchronous updates with the smallest-label tie-break let the
        # smaller label win every tie, and the bias propagates: node 2
        # ties (0 vs 1) → 0, then node 3 ties (0 from node 2, 1 from
        # the seed) → 0. Deterministic and documented.
        e = spark.createDataFrame(
            [(0, 1), (1, 2), (2, 3), (3, 4)], "src long, dst long"
        )
        seeds = spark.createDataFrame([(0, 0), (4, 1)], "node long, label long")
        out = {r["node"]: r["label"]
               for r in label_propagation(e, seeds, n_iter=4).collect()}
        assert out[0] == 0 and out[4] == 1
        assert out[1] == 0 and out[2] == 0 and out[3] == 0

    def test_seeds_are_clamped(self, spark):
        from feature_engineering_tk_spark.operators.graph import label_propagation

        # heavy neighbor pressure must not flip a seed
        e = spark.createDataFrame(
            [(1, 0, 100), (2, 0, 100)], "src long, dst long, weight long"
        )
        seeds = spark.createDataFrame(
            [(0, 7), (1, 3), (2, 3)], "node long, label long"
        )
        out = {r["node"]: r["label"]
               for r in label_propagation(e, seeds, weight="weight",
                                          n_iter=3).collect()}
        assert out[0] == 7

    def test_unreachable_node_stays_null(self, spark):
        from feature_engineering_tk_spark.operators.graph import label_propagation

        # component {0,1} seeded; component {2,3} not
        e = spark.createDataFrame([(0, 1), (2, 3)], "src long, dst long")
        seeds = spark.createDataFrame([(0, 5)], "node long, label long")
        out = {r["node"]: r["label"]
               for r in label_propagation(e, seeds, n_iter=3).collect()}
        assert out[1] == 5
        assert out[2] is None and out[3] is None

    def test_weighted_vote_beats_count(self, spark):
        from feature_engineering_tk_spark.operators.graph import label_propagation

        # node 0 hears label 1 from one heavy edge (w=5) and label 2
        # from two light edges (w=1 each): weight wins
        e = spark.createDataFrame(
            [(1, 0, 5), (2, 0, 1), (3, 0, 1)], "src long, dst long, weight long"
        )
        seeds = spark.createDataFrame(
            [(1, 1), (2, 2), (3, 2)], "node long, label long"
        )
        out = {r["node"]: r["label"]
               for r in label_propagation(e, seeds, weight="weight",
                                          n_iter=1, directed=True).collect()}
        assert out[0] == 1

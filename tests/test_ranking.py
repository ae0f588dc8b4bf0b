"""Ranked-retrieval metrics (analysis/ranking.py) vs a brute-force
pure-Python simulator, plus the snapshot-diff operator and markup
stripping."""

import math
import random

import pytest
from pyspark.sql import functions as F

from feature_engineering_tk_spark.analysis.ranking import (
    ranking_metrics,
    ranking_summary,
)
from feature_engineering_tk_spark.exceptions import (
    ColumnNotFoundError,
    InsufficientDataError,
)
from feature_engineering_tk_spark.functions.cleaning import strip_markup
from feature_engineering_tk_spark.operators.diff import (
    snapshot_diff,
    snapshot_diff_summary,
)


# ------------------------------------------------------------- brute force


def _brute_metrics(ranked, k):
    """ranked: list of relevance doubles in rank order (1-based)."""
    hits = [r > 0 for r in ranked]
    n_rel = sum(hits)
    hits_k = sum(h for h, _ in zip(hits, range(k)))
    rr = 0.0
    for i, h in enumerate(hits, 1):
        if h:
            rr = 1.0 / i
            break
    dcg = sum(
        (2.0 ** rel - 1.0) / math.log2(i + 1)
        for i, rel in enumerate(ranked[:k], 1)
    )
    ideal = sorted(ranked, reverse=True)
    idcg = sum(
        (2.0 ** rel - 1.0) / math.log2(i + 1)
        for i, rel in enumerate(ideal[:k], 1)
    )
    ndcg = dcg / idcg if idcg > 0 else 0.0
    ap_num, cum = 0.0, 0
    for i, h in enumerate(hits[:k], 1):
        if h:
            cum += 1
            ap_num += cum / i
    ap = ap_num / min(n_rel, k) if n_rel else 0.0
    return dict(
        n_relevant=n_rel,
        hits_at_k=hits_k,
        rr=rr,
        precision_at_k=hits_k / k,
        recall_at_k=hits_k / n_rel if n_rel else 0.0,
        ndcg_at_k=ndcg,
        ap_at_k=ap,
    )


def _fixture(spark, seed=7, n_queries=23, k=5):
    rng = random.Random(seed)
    rows, expect = [], {}
    for q in range(n_queries):
        n = rng.randint(1, 15)
        rels = [float(rng.choice([0, 0, 0, 1, 1, 2])) for _ in range(n)]
        expect[q] = _brute_metrics(rels, k)
        rows += [(q, i + 1, rels[i]) for i in range(n)]
    df = spark.createDataFrame(rows, "query_id int, rank int, relevance double")
    return df, expect


def test_ranking_metrics_matches_brute_force(spark):
    df, expect = _fixture(spark)
    out = {r["query_id"]: r.asDict() for r in ranking_metrics(df, k=5).collect()}
    assert set(out) == set(expect)
    for q, want in expect.items():
        got = out[q]
        for key, val in want.items():
            assert got[key] == pytest.approx(val, abs=1e-12), (q, key)


def test_ranking_metrics_no_relevant_query_is_all_zero(spark):
    df = spark.createDataFrame(
        [(1, 1, 0.0), (1, 2, 0.0)], "query_id int, rank int, relevance double"
    )
    row = ranking_metrics(df, k=3).collect()[0]
    assert row.rr == 0.0 and row.ndcg_at_k == 0.0 and row.ap_at_k == 0.0
    assert row.recall_at_k == 0.0 and row.n_relevant == 0


def test_ranking_metrics_null_relevance_counts_as_zero(spark):
    df = spark.createDataFrame(
        [(1, 1, None), (1, 2, 1.0)], "query_id int, rank int, relevance double"
    )
    row = ranking_metrics(df, k=2).collect()[0]
    assert row.rr == 0.5 and row.n_relevant == 1


def test_ranking_summary_macro_means(spark):
    df, expect = _fixture(spark)
    row = ranking_summary(df, k=5).collect()[0]
    n = len(expect)
    assert row.n_queries == n
    want_mrr = sum(round(v["rr"], 6) for v in expect.values()) / n
    assert row.mrr == pytest.approx(want_mrr, abs=1e-9)
    want_map = sum(round(v["ap_at_k"], 6) for v in expect.values()) / n
    assert row.map_at_k == pytest.approx(want_map, abs=1e-9)


def test_ranking_summary_empty_raises(spark):
    df = spark.createDataFrame([], "query_id int, rank int, relevance double")
    with pytest.raises(InsufficientDataError):
        ranking_summary(df)


def test_ranking_metrics_bad_k():
    with pytest.raises(ValueError):
        ranking_metrics(None, k=0)


# ------------------------------------------------------------ snapshot diff


def _snap(spark):
    old = spark.createDataFrame(
        [(1, 10.0, "a"), (2, 20.0, "b"), (3, None, "c"), (4, 40.0, "d")],
        "id int, price double, status string",
    )
    new = spark.createDataFrame(
        [(2, 20.0, "b"), (3, None, "c"), (4, 41.0, "d"), (5, 50.0, "e")],
        "id int, price double, status string",
    )
    return old, new


def test_snapshot_diff_statuses(spark):
    old, new = _snap(spark)
    rows = {r.id: r.status for r in snapshot_diff(old, new, ["id"]).collect()}
    assert rows == {1: "removed", 2: "unchanged", 3: "unchanged", 4: "changed", 5: "added"}


def test_snapshot_diff_null_to_value_is_changed(spark):
    old, new = _snap(spark)
    new2 = new.withColumn(
        "price", F.when(F.col("id") == 3, F.lit(3.0)).otherwise(F.col("price"))
    )
    rows = {r.id: r.status for r in snapshot_diff(old, new2, ["id"]).collect()}
    assert rows[3] == "changed"


def test_snapshot_diff_summary_counts_and_checksum(spark):
    old, new = _snap(spark)
    out = {r.status: (r.n, r.key_checksum) for r in
           snapshot_diff_summary(old, new, ["id"]).collect()}
    assert out == {
        "added": (1, 5), "removed": (1, 1), "changed": (1, 4), "unchanged": (2, 5),
    }


def test_snapshot_diff_missing_key_raises(spark):
    old, new = _snap(spark)
    with pytest.raises(ColumnNotFoundError):
        snapshot_diff(old, new.drop("id"), ["id"])


def test_snapshot_diff_carries_old_new_pairs(spark):
    old, new = _snap(spark)
    row = [r for r in snapshot_diff(old, new, ["id"]).collect() if r.id == 4][0]
    assert row.price_old == 40.0 and row.price_new == 41.0


# ------------------------------------------------------------- strip markup


def test_strip_markup_tags_entities_whitespace(spark):
    df = spark.createDataFrame(
        [(1, '<p>a &amp; b</p> <script>x<y</script>  <b>c</b>\n\n\n\nd')],
        "id int, text string",
    )
    out = strip_markup(df, "text").collect()[0]["text"]
    assert out == "a & b c\n\nd"


def test_strip_markup_keeps_nulls(spark):
    df = spark.createDataFrame([(1, None)], "id int, text string")
    assert strip_markup(df, "text").collect()[0]["text"] is None


def test_strip_markup_double_encoded_stays_encoded(spark):
    df = spark.createDataFrame([(1, "&amp;lt;tag&amp;gt;")], "id int, text string")
    assert strip_markup(df, "text").collect()[0]["text"] == "&lt;tag&gt;"


def test_apply_diff_round_trip(spark):
    """apply_diff(old, snapshot_diff(old, new), keys) == new — the
    diff is a migration artifact."""
    from feature_engineering_tk_spark.operators.diff import apply_diff

    old, new = _snap(spark)
    rebuilt = apply_diff(old, snapshot_diff(old, new, ["id"]), ["id"])
    assert sorted(rebuilt.columns) == sorted(new.columns)
    got = {tuple(r) for r in rebuilt.select(*sorted(new.columns)).collect()}
    want = {tuple(r) for r in new.select(*sorted(new.columns)).collect()}
    assert got == want


def test_apply_diff_carries_uncompared_columns(spark):
    """Columns the diff didn't compare come from old by key; added
    keys get null there (the diff never saw their values)."""
    from feature_engineering_tk_spark.operators.diff import apply_diff

    old, new = _snap(spark)
    diff = snapshot_diff(old, new, ["id"], compare=["price"])
    rebuilt = apply_diff(old, diff, ["id"])
    rows = {r.id: (r.price, r.status) for r in rebuilt.collect()}
    assert set(rows) == {2, 3, 4, 5}  # removed key 1 dropped
    assert rows[4] == (41.0, "d")  # compared col from diff, carry from old
    assert rows[5] == (50.0, None)  # added key: carry unknown -> null
    assert rows[2] == (20.0, "b")


def test_apply_diff_guards(spark):
    from feature_engineering_tk_spark.operators.diff import apply_diff

    old, new = _snap(spark)
    diff = snapshot_diff(old, new, ["id"])
    with pytest.raises(ColumnNotFoundError):
        apply_diff(old, diff.drop("status"), ["id"])
    with pytest.raises(ColumnNotFoundError):
        apply_diff(old, diff, ["nope"])


def test_merge_statement_sql(spark):
    """Pinned MERGE INTO shape + executable against an in-memory
    MERGE-capable target via the v2 session catalog is out of scope
    here (no Iceberg); the statement is plain ANSI MERGE."""
    from feature_engineering_tk_spark.operators.diff import merge_statement

    sql = merge_statement("db.t", "d", ["id"], ["price", "status"])
    assert sql == (
        "MERGE INTO db.t t USING d s ON t.id = s.id "
        "WHEN MATCHED AND s.status = 'removed' THEN DELETE "
        "WHEN MATCHED AND s.status = 'changed' THEN UPDATE SET "
        "t.price = s.price_new, t.status = s.status_new "
        "WHEN NOT MATCHED AND s.status = 'added' THEN "
        "INSERT (id, price, status) VALUES (s.id, s.price_new, s.status_new)"
    )
    with pytest.raises(ValueError):
        merge_statement("t", "d", [], ["x"])


class TestRankBiasedOverlap:
    def _mk(self, spark, rows):
        return spark.createDataFrame(
            rows, "query_id string, ranker string, rank int, item_id string"
        )

    def test_identical_lists_formula(self, spark):
        from feature_engineering_tk_spark.analysis.ranking import rank_biased_overlap

        rows = [("q", t, r, f"d{r}") for t in ("a", "b") for r in range(1, 6)]
        got = rank_biased_overlap(self._mk(spark, rows), p=0.9, depth=5).collect()[0]
        # identical lists: RBO@d = (1-p)·Σ p^{i-1} = 1 - p^d
        assert got["rbo"] == pytest.approx(1 - 0.9**5)
        assert got["n_a"] == got["n_b"] == 5

    def test_disjoint_is_zero(self, spark):
        from feature_engineering_tk_spark.analysis.ranking import rank_biased_overlap

        rows = [("q", "a", r, f"x{r}") for r in range(1, 4)] + [
            ("q", "b", r, f"y{r}") for r in range(1, 4)
        ]
        got = rank_biased_overlap(self._mk(spark, rows), p=0.9, depth=3).collect()[0]
        assert got["rbo"] == 0.0

    def test_matches_reference_fold(self, spark):
        from feature_engineering_tk_spark.analysis.ranking import rank_biased_overlap

        a = ["d1", "d2", "d3", "d5", "d4"]
        b = ["d2", "d1", "d4", "d3", "d9"]
        rows = [("q", "a", r, it) for r, it in enumerate(a, 1)] + [
            ("q", "b", r, it) for r, it in enumerate(b, 1)
        ]

        def ref(p=0.9, d=5):
            s, w = 0.0, 1.0
            for i in range(1, d + 1):
                s += w * (len(set(a[:i]) & set(b[:i])) / i)
                w *= p
            return (1 - p) * s

        got = rank_biased_overlap(self._mk(spark, rows), p=0.9, depth=5).collect()[0]
        assert got["rbo"] == pytest.approx(ref(), abs=1e-9)

    def test_deep_rows_filtered_and_top_weighted(self, spark):
        from feature_engineering_tk_spark.analysis.ranking import rank_biased_overlap

        # same top-1, rest disjoint vs same bottom, top disjoint:
        # top agreement must dominate under p<1
        top = [("q", "a", 1, "same")] + [("q", "a", r, f"ax{r}") for r in range(2, 5)]
        top += [("q", "b", 1, "same")] + [("q", "b", r, f"bx{r}") for r in range(2, 5)]
        bot = [("p", "a", r, f"ay{r}") for r in range(1, 4)] + [("p", "a", 4, "same")]
        bot += [("p", "b", r, f"by{r}") for r in range(1, 4)] + [("p", "b", 4, "same")]
        out = {
            r["query_id"]: r["rbo"]
            for r in rank_biased_overlap(
                self._mk(spark, top + bot), p=0.9, depth=4
            ).collect()
        }
        assert out["q"] > out["p"] > 0

    def test_validation(self, spark):
        from feature_engineering_tk_spark.analysis.ranking import rank_biased_overlap
        from feature_engineering_tk_spark.exceptions import ColumnNotFoundError

        df = self._mk(spark, [("q", "a", 1, "d")])
        with pytest.raises(ColumnNotFoundError):
            rank_biased_overlap(df, item="nope")
        with pytest.raises(ValueError):
            rank_biased_overlap(df, depth=0)
        with pytest.raises(ValueError):
            rank_biased_overlap(df, p=1.0)

"""Deterministic hash-based sampling/splitting (operators/sampling.py):
partitioning-independent membership, group-coherent splits, fraction
accuracy, salt independence."""

import pytest
from pyspark.sql import functions as F

from feature_engineering_tk_spark.operators.sampling import (
    group_split,
    hash_sample,
    weighted_mix,
)


@pytest.fixture(scope="module")
def ids(spark):
    return spark.range(0, 20_000).withColumnRenamed("id", "k")


def test_hash_sample_fraction_and_determinism(spark, ids):
    s = hash_sample(ids, ["k"], 0.3)
    n = s.count()
    assert abs(n / 20_000 - 0.3) < 0.02
    # identical selected set regardless of physical partitioning
    a = {r["k"] for r in s.collect()}
    b = {r["k"] for r in hash_sample(ids.repartition(17), ["k"], 0.3).collect()}
    assert a == b
    # monotone: a smaller fraction is a subset of a larger one
    small = {r["k"] for r in hash_sample(ids, ["k"], 0.1).collect()}
    assert small <= a
    # different salt → essentially independent draw
    c = {r["k"] for r in hash_sample(ids, ["k"], 0.3, salt="v2").collect()}
    overlap = len(a & c) / len(a)
    assert 0.2 < overlap < 0.4


def test_hash_sample_bounds(ids):
    with pytest.raises(ValueError):
        hash_sample(ids, ["k"], 1.5)
    assert hash_sample(ids, ["k"], 0.0).count() == 0
    assert hash_sample(ids, ["k"], 1.0).count() == 20_000


def test_group_split_coherent_and_leak_free(spark, transcripts):
    tagged = group_split(transcripts, "conv_id", test_fraction=0.25)
    sides = tagged.groupBy("conv_id").agg(
        F.count_distinct("is_test").alias("n_sides")
    )
    assert sides.filter(F.col("n_sides") > 1).count() == 0  # no conv straddles
    frac = (
        tagged.select("conv_id", "is_test").distinct().agg(
            F.avg(F.col("is_test").cast("double"))
        ).first()[0]
    )
    assert abs(frac - 0.25) < 0.15  # 60 convs → coarse but centered


def test_weighted_mix_tags_and_fractions(spark, ids):
    a = ids.filter(F.col("k") < 10_000)
    b = ids.filter(F.col("k") >= 10_000)
    mixed = weighted_mix([(a, 0.5), (b, 0.1)], ["k"])
    counts = {r["mix_source"]: r["n"] for r in mixed.groupBy("mix_source").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert abs(counts[0] / 10_000 - 0.5) < 0.03
    assert abs(counts[1] / 10_000 - 0.1) < 0.02
    # sources don't overlap and tags are faithful
    assert mixed.filter((F.col("mix_source") == 0) & (F.col("k") >= 10_000)).count() == 0


def test_stratified_sample_fractions_and_determinism(spark):
    from feature_engineering_tk_spark.operators.sampling import stratified_sample

    df = spark.range(4000).withColumn(
        "lang",
        F.when(F.col("id") % 3 == 0, F.lit("en"))
        .when(F.col("id") % 3 == 1, F.lit("zh"))
        .otherwise(F.lit("de")),
    )
    out = stratified_sample(df, ["id"], "lang", {"en": 0.5, "zh": 0.1}, default=0.0)
    rates = {
        r["lang"]: r["n"]
        for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    n_per = 4000 / 3
    assert abs(rates["en"] / n_per - 0.5) < 0.06
    assert abs(rates.get("zh", 0) / n_per - 0.1) < 0.05
    assert "de" not in rates  # default 0.0 drops unlisted strata
    # pure function of (key, salt): identical set on re-run and repartition
    again = stratified_sample(
        df.repartition(7), ["id"], "lang", {"en": 0.5, "zh": 0.1}, default=0.0
    )
    assert sorted(r["id"] for r in again.collect()) == sorted(
        r["id"] for r in out.collect()
    )


def test_stratified_sample_rejects_bad_fraction(spark):
    from feature_engineering_tk_spark.operators.sampling import stratified_sample

    df = spark.range(10).withColumn("s", F.lit("a"))
    with pytest.raises(ValueError):
        stratified_sample(df, ["id"], "s", {"a": 1.5})


def test_importance_resample_gumbel_topk(spark):
    from pyspark.sql import functions as F

    from feature_engineering_tk_spark.operators.sampling import importance_resample

    df = spark.createDataFrame(
        [(i, float(i % 7), "x") for i in range(200)] + [(999, None, "x")],
        "doc_id long, w double, text string",
    )
    sel = importance_resample(df, "w", k=30, id_cols=["doc_id"])
    rows = sel.collect()
    assert len(rows) == 30
    ids = {r["doc_id"] for r in rows}
    assert 999 not in ids  # NULL weight can never be drawn
    # deterministic: identical call selects the identical set
    ids2 = {r["doc_id"] for r in importance_resample(df, "w", k=30, id_cols=["doc_id"]).collect()}
    assert ids == ids2
    # independent draw under a different salt differs
    ids3 = {r["doc_id"] for r in
            importance_resample(df, "w", k=30, id_cols=["doc_id"], salt="other").collect()}
    assert ids != ids3
    # weight bias: high-weight rows (w=6) are drawn far above their base rate
    high = sum(1 for r in rows if r["w"] == 6.0)
    assert high >= 8  # 6/42 of rows but exp(6)/Σ exp(w) dominated draw
    # low temperature sharpens toward pure top-k by weight
    sharp = importance_resample(df, "w", k=30, id_cols=["doc_id"], temperature=0.05)
    assert all(r["w"] >= 5.0 for r in sharp.collect())
    import pytest as _pt
    with _pt.raises(ValueError):
        importance_resample(df, "w", k=0, id_cols=["doc_id"])
    with _pt.raises(ValueError):
        importance_resample(df, "w", k=5, id_cols=["doc_id"], temperature=0.0)


class TestSamplePerGroup:
    def test_exactly_k_per_group_and_stable(self, spark):
        from feature_engineering_tk_spark.operators.sampling import sample_per_group

        df = spark.createDataFrame(
            [(g, i) for g in ("a", "b", "c") for i in range(10)] + [("d", 0)],
            "grp string, rid int",
        )
        out = sample_per_group(df, "grp", ["rid"], k=3).toPandas()
        sizes = out.groupby("grp").size()
        assert sizes["a"] == 3 and sizes["b"] == 3 and sizes["c"] == 3
        assert sizes["d"] == 1  # group smaller than k keeps all rows
        # deterministic across re-runs and repartitions
        again = (
            sample_per_group(df.repartition(7), "grp", ["rid"], k=3)
            .toPandas()
        )
        assert set(map(tuple, out[["grp", "rid"]].to_numpy())) == set(
            map(tuple, again[["grp", "rid"]].to_numpy())
        )

    def test_growth_only_evicts(self, spark):
        from feature_engineering_tk_spark.operators.sampling import sample_per_group

        small = spark.createDataFrame(
            [("a", i) for i in range(6)], "grp string, rid int"
        )
        grown = spark.createDataFrame(
            [("a", i) for i in range(12)], "grp string, rid int"
        )
        k1 = set(r["rid"] for r in sample_per_group(small, "grp", ["rid"], 3).collect())
        k2 = set(r["rid"] for r in sample_per_group(grown, "grp", ["rid"], 3).collect())
        # new rows may displace survivors, but the selection is still a
        # pure hash order: survivors of the grown set that existed in
        # the small set must be a subset of the small set's selection
        assert (k2 & set(range(6))) <= k1

    def test_rank_column_exposed(self, spark):
        from feature_engineering_tk_spark.operators.sampling import sample_per_group

        df = spark.createDataFrame([("a", i) for i in range(5)], "grp string, rid int")
        out = sample_per_group(df, "grp", ["rid"], k=2, out="rk").toPandas()
        assert sorted(out["rk"]) == [1, 2]

    def test_k_validated(self, spark):
        from feature_engineering_tk_spark.operators.sampling import sample_per_group

        df = spark.createDataFrame([("a", 1)], "grp string, rid int")
        with pytest.raises(ValueError):
            sample_per_group(df, "grp", ["rid"], k=0)


def test_kfold_assign_partition_of_groups(spark, transcripts):
    from feature_engineering_tk_spark.operators.sampling import kfold_assign

    tagged = kfold_assign(transcripts, ["conv_id"], k=4)
    # every row gets a fold in [0, 4)
    rng = tagged.agg(F.min("fold"), F.max("fold")).first()
    assert rng[0] >= 0 and rng[1] <= 3
    # group-coherent: one fold per conversation
    sides = tagged.groupBy("conv_id").agg(F.count_distinct("fold").alias("n"))
    assert sides.filter(F.col("n") > 1).count() == 0
    # all 4 folds populated and roughly balanced over 20k keys
    big = kfold_assign(spark.range(0, 20_000).withColumnRenamed("id", "k"), ["k"], k=4)
    counts = {r.fold: r.n for r in big.groupBy("fold").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert set(counts) == {0, 1, 2, 3}
    assert all(abs(c - 5000) < 500 for c in counts.values())


def test_kfold_assign_deterministic_and_salted(spark, ids):
    from feature_engineering_tk_spark.operators.sampling import kfold_assign

    a = kfold_assign(ids, ["k"], k=5).collect()
    b = kfold_assign(ids, ["k"], k=5).collect()
    assert sorted((r.k, r.fold) for r in a) == sorted((r.k, r.fold) for r in b)
    c = {r.k: r.fold for r in kfold_assign(ids, ["k"], k=5, salt="other").collect()}
    base = {r.k: r.fold for r in a}
    assert any(base[k] != c[k] for k in base)  # independent draw


def test_kfold_assign_bad_k(spark, ids):
    from feature_engineering_tk_spark.operators.sampling import kfold_assign

    with pytest.raises(ValueError):
        kfold_assign(ids, ["k"], k=1)


class TestTopkPerGroup:
    def test_exact_topk_with_ties_and_nulls(self, spark):
        from feature_engineering_tk_spark.operators.sampling import topk_per_group

        rows = [
            ("g1", 1, 10.0), ("g1", 2, 30.0), ("g1", 3, 20.0), ("g1", 4, None),
            ("g2", 5, 1.0), ("g2", 6, 1.0),
            ("g3", 7, None),
        ]
        df = spark.createDataFrame(rows, "g string, id int, score double")
        got = [
            (r["g"], r["id"], r["rk"])
            for r in topk_per_group(df, "g", "score", 2, tie_break="id", out_rank="rk")
            .orderBy("g", "rk")
            .collect()
        ]
        assert got == [
            ("g1", 2, 1), ("g1", 3, 2),       # nulls sort last
            ("g2", 5, 1), ("g2", 6, 2),       # tie broken by id
            ("g3", 7, 1),                      # null-only group still present
        ]

    def test_ascending_and_rank_drop(self, spark):
        from feature_engineering_tk_spark.operators.sampling import topk_per_group

        df = spark.createDataFrame(
            [("g", i, float(i)) for i in range(5)], "g string, id int, score double"
        )
        out = topk_per_group(df, "g", "score", 2, descending=False, tie_break="id")
        assert "_topk_rank" not in out.columns
        assert sorted(r["id"] for r in out.collect()) == [0, 1]

    def test_validation(self, spark):
        from feature_engineering_tk_spark.exceptions import ColumnNotFoundError
        from feature_engineering_tk_spark.operators.sampling import topk_per_group

        df = spark.createDataFrame([("g", 1, 1.0)], "g string, id int, score double")
        with pytest.raises(ValueError):
            topk_per_group(df, "g", "score", 0)
        with pytest.raises(ColumnNotFoundError):
            topk_per_group(df, "g", "nope", 1)

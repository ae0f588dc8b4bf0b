"""Partition-layout invariance for every round-5 operator: the same
input at coalesce(1) and repartition(7) must produce the identical
row multiset — the distributed-determinism claim each op's docstring
makes, checked directly (the oracle gate proves it for one layout;
this proves the layouts agree with each other)."""

import pytest
from pyspark.sql import functions as F


def _rows(df):
    return sorted(
        tuple(None if v is None else v for v in r) for r in df.collect()
    )


def _check(build, df):
    a = _rows(build(df.coalesce(1)))
    b = _rows(build(df.repartition(7)))
    assert a == b


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (i, f"doc {i % 7} shares some words with doc {i % 5} and tail {i}")
        for i in range(40)
    ] + [(100, None), (101, "")]
    return spark.createDataFrame(rows, "doc_id int, text string")


@pytest.fixture(scope="module")
def turns(spark):
    rows = []
    for c in range(6):
        for t in range(8):
            rows.append(
                (f"c{c}", t, "assistant" if t % 2 else "user",
                 f"turn body {t % 3} of conv {c}")
            )
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string"
    )


def test_trigram_lm_invariant(spark, docs):
    from feature_engineering_tk_spark.functions.text import trigram_lm_score

    ref = docs.where(F.col("doc_id") % 2 == 0)
    _check(lambda d: trigram_lm_score(d, ref=ref), docs)


def test_skipgram_invariant(spark, docs):
    from feature_engineering_tk_spark.functions.text import skipgram_cooccurrence

    _check(
        lambda d: skipgram_cooccurrence(d, window=2, min_count=2, top_k=None),
        docs,
    )


def test_char_entropy_invariant(spark, docs):
    from feature_engineering_tk_spark.functions.text import char_entropy

    _check(char_entropy, docs)


def test_truncation_invariant(spark, docs):
    from feature_engineering_tk_spark.functions.cleaning import truncation_artifacts

    _check(truncation_artifacts, docs)


def test_near_loops_invariant(spark, turns):
    from feature_engineering_tk_spark.operators.transcripts import near_loops

    _check(lambda d: near_loops(d, similarity=0.5), turns)


def test_tool_arg_schema_invariant(spark, turns):
    from feature_engineering_tk_spark.operators.transcripts import tool_arg_schema

    calls = turns.select(
        F.col("role").alias("tool"),
        F.concat(F.lit('{"k": '), F.col("turn_idx").cast("string"), F.lit("}")).alias(
            "tool_args"
        ),
    )
    _check(tool_arg_schema, calls)


def test_rbo_invariant(spark, turns):
    from feature_engineering_tk_spark.analysis.ranking import rank_biased_overlap

    ranked = turns.select(
        F.col("conv_id").alias("query_id"),
        F.when(F.col("turn_idx") % 2 == 0, "a").otherwise("b").alias("ranker"),
        (F.col("turn_idx") / 2 + 1).cast("int").alias("rank"),
        F.col("text").alias("item_id"),
    )
    _check(lambda d: rank_biased_overlap(d, depth=4), ranked)


def test_mcnemar_invariant(spark, docs):
    from feature_engineering_tk_spark.operators.evals import mcnemar_test

    paired = docs.where(F.col("text").isNotNull()).select(
        F.col("doc_id").alias("item_id"),
        (F.col("doc_id") % 3 == 0).alias("a_correct"),
        (F.col("doc_id") % 4 == 0).alias("b_correct"),
    )
    _check(mcnemar_test, paired)


def test_proportion_ci_invariant(spark, docs):
    from feature_engineering_tk_spark.operators.evals import proportion_ci

    counts = docs.groupBy((F.col("doc_id") % 5).alias("g")).agg(
        F.sum((F.col("doc_id") % 2).cast("int")).alias("wins"),
        F.count(F.lit(1)).alias("games"),
    )
    _check(lambda d: proportion_ci(d, "wins", "games"), counts)


def test_dedup_best_invariant(spark, docs):
    from feature_engineering_tk_spark.operators.dedup import exact_dedup

    keyed = docs.withColumn("k", F.substring("text", 1, 6)).withColumn(
        "q", F.length("text")
    )
    _check(lambda d: exact_dedup(d, "k", "doc_id", score_col="q"), keyed)


def test_topk_per_group_invariant(spark, docs):
    from feature_engineering_tk_spark.operators.sampling import topk_per_group

    scored = docs.select(
        (F.col("doc_id") % 4).alias("g"), "doc_id",
        (F.col("doc_id") % 9).alias("score"),
    )
    _check(
        lambda d: topk_per_group(d, "g", "score", 2, tie_break="doc_id"), scored
    )


def test_bloom_gate_invariant(spark, docs):
    from feature_engineering_tk_spark.operators.membership import decontaminate_bloom

    bench = docs.where(F.col("doc_id") % 10 == 0)
    _check(
        lambda d: decontaminate_bloom(d, bench, n=3, n_bits=1 << 12, k=3), docs
    )


def test_topic_segments_invariant(spark):
    from feature_engineering_tk_spark.functions.embeddings import topic_segments

    rows = [
        ("g" + str(i % 3), i, [float((i * 7) % 5), float((i * 3) % 4) + 0.5])
        for i in range(30)
    ]
    df = spark.createDataFrame(
        rows, "label string, vec_id int, embedding array<double>"
    )
    _check(
        lambda d: topic_segments(d, by="label", order=["vec_id"], threshold=0.5),
        df,
    )

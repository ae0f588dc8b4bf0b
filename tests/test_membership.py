"""Bloom-filter membership gate (operators/membership.py)."""

import pytest

from feature_engineering_tk_spark.exceptions import ColumnNotFoundError
from feature_engineering_tk_spark.operators.membership import (
    bloom_contains,
    bloom_filter_table,
    decontaminate_bloom,
    merge_bloom_filters,
)


@pytest.fixture(scope="module")
def keys(spark):
    inserted = [f"key-{i}" for i in range(200)]
    df = spark.createDataFrame([(k,) for k in inserted], "key string").repartition(4)
    return df, inserted


class TestBloomFilter:
    def test_no_false_negatives(self, spark, keys):
        df, inserted = keys
        bl = bloom_filter_table(df, "key", n_bits=1 << 14, k=4)
        got = bloom_contains(df, "key", bl, n_bits=1 << 14, k=4)
        assert all(r["maybe_present"] for r in got.collect())

    def test_absent_mostly_false_and_null_passthrough(self, spark, keys):
        df, _ = keys
        bl = bloom_filter_table(df, "key", n_bits=1 << 16, k=5)
        probe = spark.createDataFrame(
            [(f"other-{i}",) for i in range(100)] + [(None,)], "key string"
        )
        rows = bloom_contains(probe, "key", bl, n_bits=1 << 16, k=5).collect()
        by_key = {r["key"]: r["maybe_present"] for r in rows}
        assert by_key[None] is None
        # 64k bits / 200 keys: designed fp rate ~1e-7 — all absent test False
        fp = sum(1 for k, v in by_key.items() if k is not None and v)
        assert fp == 0

    def test_merge_equals_union_build(self, spark, keys):
        df, inserted = keys
        half = len(inserted) // 2
        a = spark.createDataFrame([(k,) for k in inserted[:half]], "key string")
        b = spark.createDataFrame([(k,) for k in inserted[half:]], "key string")
        whole = bloom_filter_table(df, "key", n_bits=1 << 13, k=3)
        merged = merge_bloom_filters(
            bloom_filter_table(a, "key", n_bits=1 << 13, k=3).unionByName(
                bloom_filter_table(b, "key", n_bits=1 << 13, k=3)
            )
        )
        w = {(r["word_idx"], r["bits"]) for r in whole.collect()}
        m = {(r["word_idx"], r["bits"]) for r in merged.collect()}
        assert w == m

    def test_partition_invariance(self, spark, keys):
        df, _ = keys
        a = {
            (r["word_idx"], r["bits"])
            for r in bloom_filter_table(df.coalesce(1), "key", n_bits=1 << 12, k=3).collect()
        }
        b = {
            (r["word_idx"], r["bits"])
            for r in bloom_filter_table(df.repartition(9), "key", n_bits=1 << 12, k=3).collect()
        }
        assert a == b

    def test_md5_mode_matches_xxhash_semantics(self, spark, keys):
        # both modes are valid filters; md5 mode must also be FN-free
        df, _ = keys
        bl = bloom_filter_table(df, "key", n_bits=1 << 13, k=4, hash_mode="md5")
        got = bloom_contains(df, "key", bl, n_bits=1 << 13, k=4, hash_mode="md5")
        assert all(r["maybe_present"] for r in got.collect())

    def test_validation(self, spark, keys):
        df, _ = keys
        with pytest.raises(ColumnNotFoundError):
            bloom_filter_table(df, "nope")
        with pytest.raises(ValueError):
            bloom_filter_table(df, "key", n_bits=10)
        with pytest.raises(ValueError):
            bloom_filter_table(df, "key", k=0)
        bl = bloom_filter_table(df, "key", n_bits=1 << 12, k=2)
        with pytest.raises(ValueError):
            bloom_contains(
                df.withColumn("maybe_present", df["key"].isNotNull()),
                "key",
                bl,
                n_bits=1 << 12,
                k=2,
            )


class TestDecontaminateBloom:
    @pytest.fixture(scope="class")
    def corpus_bench(self, spark):
        corpus = spark.createDataFrame(
            [
                ("d1", "the quick brown fox jumps over the lazy dog today"),
                ("d2", "completely unrelated content with zero overlap present"),
                ("d3", "short doc"),
                ("d4", None),
            ],
            "doc_id string, text string",
        )
        bench = spark.createDataFrame(
            [("b1", "quick brown fox jumps over")], "doc_id string, text string"
        )
        return corpus, bench

    def test_agrees_with_exact_path(self, spark, corpus_bench):
        from feature_engineering_tk_spark.operators.dedup import ngram_contamination

        corpus, bench = corpus_bench
        approx = {
            r["doc_id"]: r
            for r in decontaminate_bloom(
                corpus, bench, n=3, n_bits=1 << 15, k=4
            ).collect()
        }
        exact = {
            r["doc_id"]: r
            for r in ngram_contamination(corpus, bench, shingle_n=3).collect()
        }
        assert set(approx) == set(exact)
        for d, a in approx.items():
            e = exact[d]
            # identical gram universe, one-sided flag count
            assert a["n_grams"] == e["n_ngrams"]
            assert a["flagged_grams"] >= e["n_contaminated_ngrams"]
        # at this filter size there are no false positives: exact equality
        for d, a in approx.items():
            assert a["flagged_grams"] == exact[d]["n_contaminated_ngrams"]
        assert approx["d1"]["contaminated"] is True
        assert approx["d2"]["contaminated"] is False

    def test_no_doc_silently_dropped(self, spark, corpus_bench):
        corpus, bench = corpus_bench
        out = decontaminate_bloom(corpus, bench, n=3, n_bits=1 << 12, k=3)
        assert out.count() == corpus.count()

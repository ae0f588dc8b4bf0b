"""Tool-arg JSON QA, vocabulary profile, Zipf concentration table."""

import pytest

from feature_engineering_tk_spark.functions.text import vocab_stats, zipf_table
from feature_engineering_tk_spark.operators.transcripts import validate_tool_args


def test_validate_tool_args_flags(spark):
    df = spark.createDataFrame(
        [
            (1, '{"k": 1, "x": "y"}'),
            (2, '{"k": 1'),  # truncated
            (3, None),
            (4, "{}"),
        ],
        "id int, tool_args string",
    )
    out = {r.id: r for r in validate_tool_args(df, required=("k", "z")).collect()}
    assert out[1].json_ok == 1 and out[1].n_keys == 2 and out[1].missing_required == 1
    assert out[2].json_ok == 0 and out[2].n_keys == -1 and out[2].missing_required == -1
    assert out[3].json_ok == 0
    assert out[4].json_ok == 1 and out[4].n_keys == 0 and out[4].missing_required == 2


def test_validate_tool_args_preserves_columns(spark):
    df = spark.createDataFrame([(1, "{}", "extra")], "id int, tool_args string, o string")
    row = validate_tool_args(df).collect()[0]
    assert row.o == "extra" and row.missing_required == 0


def test_vocab_stats_hand_values(spark):
    df = spark.createDataFrame(
        [("a b a",), ("c B",), ("",), (None,)], "text string"
    )
    row = vocab_stats(df).collect()[0]
    # tokens: a b a c b → n=5; vocab {a,b,c}=3; hapax {c}=1
    assert row.n_tokens == 5 and row.vocab_size == 3 and row.hapax_count == 1
    assert row.type_token_ratio == 3 / 5 and row.hapax_share == 1 / 3


def test_zipf_table_ranks_and_shares(spark):
    df = spark.createDataFrame([("a a a b b c",), ("b d",)], "text string")
    rows = zipf_table(df, k=3).collect()
    # freqs: a3 b3 c1 d1; tie a/b broken by token asc
    assert [(r.rank, r.token, r.freq) for r in rows] == [
        (1, "a", 3),
        (2, "b", 3),
        (3, "c", 1),
    ]
    assert rows[0].share == 3 / 8
    assert rows[1].cum_share == 6 / 8
    assert rows[2].cum_share == 7 / 8


def test_zipf_table_k_larger_than_vocab(spark):
    df = spark.createDataFrame([("a b",)], "text string")
    rows = zipf_table(df, k=10).collect()
    assert len(rows) == 2 and rows[-1].cum_share == 1.0


def test_vocab_stats_chao1(spark):
    # freqs: a3 b2 c1 d1 → h1=2, h2=1 → chao1 = 4 + 4/2 = 6.0
    df = spark.createDataFrame([("a a a b b c d",)], "text string")
    row = vocab_stats(df).collect()[0]
    assert row.doubleton_count == 1 and row.chao1 == 6.0


def test_vocab_stats_chao1_no_doubletons(spark):
    df = spark.createDataFrame([("a b",)], "text string")
    row = vocab_stats(df).collect()[0]
    assert row.chao1 == 2.0  # falls back to observed vocab


def test_phrase_scan_order_and_counts(spark):
    from feature_engineering_tk_spark.functions.cleaning import phrase_scan

    df = spark.createDataFrame(
        [(1, "I CANNOT help with that"), (2, "sure thing"), (3, None),
         (4, "as an ai i cannot lie")],
        "id int, text string",
    )
    out = {
        r.id: r
        for r in phrase_scan(df, phrases=("as an ai", "i cannot")).collect()
    }
    assert out[1].phrase_hits == 1 and out[1].phrase_first == "i cannot"
    assert out[2].has_phrase == 0 and out[2].phrase_first is None
    assert out[3].phrase_hits == 0
    # both match: first = earliest in LIST order (severity), not position
    assert out[4].phrase_hits == 2 and out[4].phrase_first == "as an ai"


def test_phrase_scan_empty_phrases_raises(spark):
    import pytest as _pt

    from feature_engineering_tk_spark.functions.cleaning import phrase_scan

    df = spark.createDataFrame([("x",)], "text string")
    with _pt.raises(ValueError):
        phrase_scan(df, phrases=())


def test_mix_balance_hand_values(spark):
    from feature_engineering_tk_spark.operators.sampling import mix_balance

    df = spark.createDataFrame(
        [("s1",)] * 3 + [("s2",)] * 1, "source string"
    )
    row = mix_balance(df).collect()[0]
    # shares 3/4, 1/4 → hhi = (9+1)/16
    assert row.n_rows == 4 and row.n_groups == 2
    assert row.hhi == 10 / 16 and row.simpson == 1.0 - 10 / 16
    assert row.top_share == 3 / 4


def test_token_budget_sample_prefix_and_determinism(spark):
    from feature_engineering_tk_spark.operators.sampling import token_budget_sample

    df = spark.createDataFrame(
        [(i, "s1", "w " * (i + 1)) for i in range(10)]
        + [(100, "s2", "a b c")],
        "doc_id int, source string, text string",
    )
    out = token_budget_sample(df, by="source", budget=12).collect()
    a = sorted((r.doc_id, r.cum_tokens) for r in out)
    # every kept row respects the budget; s2 (3 tokens) always kept
    assert all(c <= 12 for _, c in a)
    assert (100, 3) in a
    b = sorted(
        (r.doc_id, r.cum_tokens)
        for r in token_budget_sample(df, by="source", budget=12).collect()
    )
    assert a == b  # hash order → fully deterministic


def test_token_budget_zero_keeps_nothing(spark):
    from feature_engineering_tk_spark.operators.sampling import token_budget_sample

    df = spark.createDataFrame([(1, "s", "x y")], "doc_id int, source string, text string")
    assert token_budget_sample(df, budget=0).count() == 0
    import pytest as _pt

    with _pt.raises(ValueError):
        token_budget_sample(df, budget=-1)

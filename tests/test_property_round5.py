"""Property-based parity for the round-5 operators: brute-force
pure-Python simulators over hypothesis-generated inputs.  Exact
equality where the operator is integer-exact (CMS cells, Bloom bits,
McNemar counts); tight-tolerance where a rounded float is pinned
(RBO fold, entropy fold, trigram backoff)."""

import math
from collections import Counter

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SET = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

values = st.lists(st.text(alphabet="abc", min_size=1, max_size=2), min_size=1, max_size=30)


# ---------------------------------------------------------- Count-Min


@given(vals=values, depth=st.integers(1, 3), width=st.integers(2, 16))
@SET
def test_cms_overestimates_and_merges_losslessly(spark, vals, depth, width):
    from feature_engineering_tk_spark.operators.frequency import (
        cms_estimate,
        cms_sketch_table,
        merge_cms_sketches,
    )

    rows = [(v, i % 3) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "val string, shard int")
    truth = Counter(vals)
    per_slice = cms_sketch_table(df, "val", by="shard", depth=depth, width=width)
    merged = merge_cms_sketches(per_slice)
    whole = cms_sketch_table(df.drop("shard"), "val", depth=depth, width=width)
    # merge lossless: cell-identical to the whole-table sketch
    a = {(r["row"], r["col"]): r["weight"] for r in merged.collect()}
    b = {(r["row"], r["col"]): r["weight"] for r in whole.collect()}
    assert a == b
    # one-sided error: estimate >= true for every queried value
    est = cms_estimate(merged, sorted(truth), depth=depth, width=width)
    for r in est.collect():
        assert r["estimate"] >= truth[r["value"]]


# ------------------------------------------------------------- Bloom


@given(ins=values, probes=values)
@SET
def test_bloom_never_false_negative(spark, ins, probes):
    from feature_engineering_tk_spark.operators.membership import (
        bloom_contains,
        bloom_filter_table,
    )

    idf = spark.createDataFrame([(v,) for v in ins], "key string")
    bl = bloom_filter_table(idf, "key", n_bits=1 << 10, k=3)
    pdf = spark.createDataFrame([(v,) for v in set(ins) | set(probes)], "key string")
    got = {
        r["key"]: r["maybe_present"]
        for r in bloom_contains(pdf, "key", bl, n_bits=1 << 10, k=3).collect()
    }
    for v in set(ins):
        assert got[v] is True  # inserted values always test positive


# --------------------------------------------------------------- RBO


@given(
    a=st.permutations(list("abcdef")),
    b=st.permutations(list("abcdef")),
    p=st.sampled_from([0.5, 0.9]),
)
@SET
def test_rbo_matches_reference_and_is_symmetric(spark, a, b, p):
    from feature_engineering_tk_spark.analysis.ranking import rank_biased_overlap

    rows = [("q", "a", i + 1, x) for i, x in enumerate(a)] + [
        ("q", "b", i + 1, x) for i, x in enumerate(b)
    ]
    sym = [("q", "a", i + 1, x) for i, x in enumerate(b)] + [
        ("q", "b", i + 1, x) for i, x in enumerate(a)
    ]
    schema = "query_id string, ranker string, rank int, item_id string"

    def ref(x, y, d=6):
        s, w = 0.0, 1.0
        for i in range(1, d + 1):
            s += w * (len(set(x[:i]) & set(y[:i])) / i)
            w *= p
        return (1 - p) * s

    got = rank_biased_overlap(
        spark.createDataFrame(rows, schema), p=p, depth=6
    ).first()["rbo"]
    got_sym = rank_biased_overlap(
        spark.createDataFrame(sym, schema), p=p, depth=6
    ).first()["rbo"]
    assert got == pytest.approx(ref(list(a), list(b)), abs=1e-9)
    assert got == got_sym  # overlap is symmetric in the two rankers
    assert 0.0 <= got <= 1.0


# ------------------------------------------------------------ Wilson


@given(x=st.integers(0, 50), extra=st.integers(0, 50))
@SET
def test_wilson_brackets_phat_within_unit_interval(spark, x, extra):
    from feature_engineering_tk_spark.operators.evals import proportion_ci

    n = x + extra
    if n == 0:
        return
    df = spark.createDataFrame([(x, n)], "wins int, games int")
    r = proportion_ci(df, "wins", "games").first()
    assert 0.0 <= r["ci_lower"] <= x / n <= r["ci_upper"] <= 1.0
    assert r["ci_lower"] < r["ci_upper"]  # Wilson never degenerates


# ------------------------------------------------------ char entropy


@given(text=st.text(alphabet="abcd !?", min_size=1, max_size=40))
@SET
def test_char_entropy_bounds_and_reference(spark, text):
    from feature_engineering_tk_spark.functions.text import char_entropy

    df = spark.createDataFrame([(0, text)], "doc_id int, text string")
    r = char_entropy(df).first()
    c = Counter(text)
    n = len(text)
    want = -sum((v / n) * math.log2(v / n) for v in c.values())
    assert r["entropy_bits"] == pytest.approx(want, abs=1e-8)
    assert -1e-9 <= r["entropy_bits"] <= math.log2(len(c)) + 1e-9
    if len(c) > 1:
        assert 0.0 <= r["entropy_ratio"] <= 1.0


# ----------------------------------------------------------- McNemar


@given(
    bc=st.integers(0, 10), oa=st.integers(0, 10),
    ob=st.integers(0, 10), bw=st.integers(0, 10),
)
@SET
def test_mcnemar_counts_and_statistic(spark, bc, oa, ob, bw):
    from feature_engineering_tk_spark.operators.evals import mcnemar_test

    rows = (
        [(i, True, True) for i in range(bc)]
        + [(100 + i, True, False) for i in range(oa)]
        + [(200 + i, False, True) for i in range(ob)]
        + [(300 + i, False, False) for i in range(bw)]
    )
    if not rows:
        return
    df = spark.createDataFrame(
        rows, "item_id int, a_correct boolean, b_correct boolean"
    )
    r = mcnemar_test(df).first()
    assert (r["n_only_a"], r["n_only_b"]) == (oa, ob)
    if oa + ob == 0:
        assert r["statistic"] is None
    else:
        want = max(abs(oa - ob) - 1.0, 0.0) ** 2 / (oa + ob)
        assert r["statistic"] == pytest.approx(want, abs=1e-9)


# --------------------------------------------------- trigram backoff


@given(ref_texts=st.lists(
    st.lists(st.text(alphabet="xy", min_size=1, max_size=2), min_size=1, max_size=6).map(" ".join),
    min_size=1, max_size=5,
))
@SET
def test_trigram_self_train_scores_are_log_frequencies(spark, ref_texts):
    from feature_engineering_tk_spark.functions.text import trigram_lm_score

    rows = list(enumerate(ref_texts))
    df = spark.createDataFrame(rows, "doc_id int, text string")
    out = trigram_lm_score(df)
    for r in out.collect():
        # self-training: every trigram seen, so scores are genuine
        # conditional frequencies in (0, 1] -> log <= 0
        assert r["n_trigrams"] > 0
        assert r["avg_logscore"] <= 1e-12

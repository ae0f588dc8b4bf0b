"""Unigram-LM tokenizer: hand values plus exact property-parity with a
pure-Python reference implementation (hard EM's integer counts make
exact equality meaningful — see functions/unigram.py docstring)."""

import math

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from feature_engineering_tk_spark.functions.unigram import (
    DEFAULT_UNK_LOGPROB,
    unigram_segment,
    unigram_train,
    viterbi_segment,
)

# ------------------------------------------------- pure-Python reference


def _ref_word_freqs(texts):
    freqs = {}
    for t in texts:
        if t is None:
            continue
        for w in t.lower().split():
            freqs[w] = freqs.get(w, 0) + 1
    return freqs


def _ref_seed(freqs, max_piece_len, seed_size):
    weight = {}
    for w, c in freqs.items():
        for i in range(len(w)):
            for l in range(1, min(max_piece_len, len(w) - i) + 1):
                p = w[i : i + l]
                weight[p] = weight.get(p, 0) + c
    chars = {p: c for p, c in weight.items() if len(p) == 1}
    multi = sorted(
        ((p, c) for p, c in weight.items() if len(p) > 1),
        key=lambda pc: (-pc[1], pc[0]),
    )[:seed_size]
    out = dict(chars)
    out.update(dict(multi))
    return out


def _ref_train(texts, vocab_size, n_iter, max_piece_len, seed_size):
    freqs = _ref_word_freqs(texts)
    counts = _ref_seed(freqs, max_piece_len, seed_size)
    char_set = {p for p in counts if len(p) == 1}
    total = sum(counts.values())
    logp = {p: math.log(c) - math.log(total) for p, c in counts.items() if c > 0}
    for _ in range(n_iter):
        acc = {}
        for w, c in freqs.items():
            for piece in viterbi_segment(w, logp, max_piece_len):
                acc[piece] = acc.get(piece, 0) + c
        for ch in char_set:  # required-character floor, as in the engine
            acc[ch] = max(acc.get(ch, 0), 1)
        total = sum(acc.values())
        logp = {p: math.log(c) - math.log(total) for p, c in acc.items() if c > 0}
        counts = acc
    chars = {p: c for p, c in counts.items() if len(p) == 1}
    multi = sorted(
        ((p, c) for p, c in counts.items() if len(p) > 1),
        key=lambda pc: (-pc[1], pc[0]),
    )
    keep = dict(chars)
    for p, c in multi:
        if len(keep) >= vocab_size and p not in keep:
            continue
        keep[p] = c
    total = sum(keep.values())
    return {p: (c, math.log(c) - math.log(total)) for p, c in keep.items()}


# ------------------------------------------------------------ unit tests


def test_viterbi_prefers_high_prob_long_piece():
    logp = {"ab": math.log(0.5), "a": math.log(0.2), "b": math.log(0.2)}
    assert viterbi_segment("ab", logp, 8) == ["ab"]
    # 'aba': ab+a (log .5*.2) beats a+b+a (log .2^3)
    assert viterbi_segment("aba", logp, 8) == ["ab", "a"]


def test_viterbi_tie_breaks_fewest_then_lexicographic():
    # 'ab' as one piece vs two: equal score → fewer pieces wins
    logp = {"ab": math.log(0.04), "a": math.log(0.2), "b": math.log(0.2)}
    assert viterbi_segment("ab", logp, 8) == ["ab"]
    # exact tie on score and count: 'ax'+'b' vs 'a'+'xb' → lexicographic
    logp = {"ax": math.log(0.25), "b": math.log(0.25), "a": math.log(0.25), "xb": math.log(0.25)}
    assert viterbi_segment("axb", logp, 8) == ["a", "xb"]


def test_viterbi_unknown_char_fallback():
    assert viterbi_segment("q", {}, 8) == ["q"]
    logp = {"ab": math.log(0.9)}
    assert viterbi_segment("aqb", logp, 8) == ["a", "q", "b"]


def test_unigram_train_hand_corpus(spark):
    df = spark.createDataFrame(
        [("low low low lower lowest",), ("low lower newest newest",)],
        "text string",
    )
    model = unigram_train(df, vocab_size=12, n_iter=2, max_piece_len=6, seed_size=40)
    rows = {r.piece: r for r in model.collect()}
    assert "low" in rows  # dominant subword survives pruning
    for ch in "lowernst":
        assert ch in rows  # single-char closure
    # integer counts, normalized log-probs
    total = sum(r["count"] for r in rows.values())
    some = rows["low"]
    assert some.logprob == math.log(some["count"]) - math.log(total)


def test_unigram_segment_roundtrip(spark):
    df = spark.createDataFrame(
        [("low low lower",), (None,)], "text string"
    )
    model = unigram_train(df, vocab_size=10, n_iter=2, max_piece_len=5, seed_size=30)
    out = unigram_segment(df, model, max_piece_len=5).collect()
    segged = {r.text: r.pieces for r in out}
    assert segged[None] is None
    joined = "".join(segged["low low lower"])
    assert joined == "lowlowlower"  # pieces reconstruct the words in order


def test_unigram_train_rejects_bad_params(spark):
    df = spark.createDataFrame([("x",)], "text string")
    with pytest.raises(ValueError):
        unigram_train(df, vocab_size=0)


# ------------------------------------------------------ property parity


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.text(alphabet="abcd ", min_size=1, max_size=24),
        min_size=1,
        max_size=12,
    ),
    st.integers(min_value=1, max_value=3),
)
def test_unigram_train_matches_reference(spark, texts, n_iter):
    rows = [(t,) for t in texts]
    df = spark.createDataFrame(rows, "text string")
    got = {
        r.piece: (r["count"], r.logprob)
        for r in unigram_train(
            df, vocab_size=15, n_iter=n_iter, max_piece_len=4, seed_size=20
        ).collect()
    }
    want = _ref_train(texts, vocab_size=15, n_iter=n_iter, max_piece_len=4, seed_size=20)
    if not want:  # corpus of only whitespace
        assert got == {}
        return
    assert set(got) == set(want)
    for p in want:
        assert got[p][0] == want[p][0], p  # integer counts exactly equal
        assert got[p][1] == want[p][1], p  # same float ops → identical logprob


@settings(max_examples=6, deadline=None)
@given(st.lists(st.text(alphabet="abc ", min_size=1, max_size=20), min_size=1, max_size=8))
def test_unigram_segment_matches_reference(spark, texts):
    rows = [(t,) for t in texts]
    df = spark.createDataFrame(rows, "text string")
    model = unigram_train(df, vocab_size=12, n_iter=1, max_piece_len=3, seed_size=15)
    logp = {r.piece: r.logprob for r in model.collect()}
    got = {r.text: r.pieces for r in unigram_segment(df, model, max_piece_len=3).collect()}
    for t in texts:
        want = []
        for w in t.lower().split():
            want.extend(viterbi_segment(w, logp, 3, DEFAULT_UNK_LOGPROB))
        assert got[t] == want

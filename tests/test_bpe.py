"""BPE training/segmentation vs an independent pure-Python reference
implementation (classic Sennrich get_stats/merge loop on a word-count
dict), plus null-handling and scale-shape properties."""

import pytest
from pyspark.sql import functions as F

from feature_engineering_tk_spark.functions import bpe


def _ref_bpe(word_counts: dict[str, int], num_merges: int):
    """Independent reference: dict-based BPE with overlapping pair
    counts, lexicographic tie-break, greedy left-to-right merge."""
    vocab = {w: list(w) + [bpe.END_OF_WORD] for w in word_counts}
    merges = []
    for rank in range(num_merges):
        stats: dict[tuple[str, str], int] = {}
        for w, syms in vocab.items():
            for i in range(len(syms) - 1):
                pair = (syms[i], syms[i + 1])
                stats[pair] = stats.get(pair, 0) + word_counts[w]
        if not stats:
            break
        (a, b), wgt = min(stats.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append({"merge_rank": rank, "lhs": a, "rhs": b, "merged": a + b, "pair_weight": wgt})
        for w, syms in vocab.items():
            out = []
            for s in syms:
                if out and out[-1] == a and s == b:
                    out[-1] = a + b
                else:
                    out.append(s)
            vocab[w] = out
    return merges, vocab


CORPUS = [
    (0, "low low low lower lower newest newest newest newest widest"),
    (1, "widest widest newest low lowest lowest"),
    (2, None),
    (3, "   "),
    (4, "aaaa aa low"),
]


def _word_counts():
    counts: dict[str, int] = {}
    for _i, t in CORPUS:
        for w in (t or "").lower().split():
            counts[w] = counts.get(w, 0) + 1
    return counts


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(CORPUS, "doc_id long, text string")


def test_learn_bpe_matches_reference(docs):
    merges, vocab = bpe.learn_bpe(docs, "text", num_merges=6)
    ref_merges, ref_vocab = _ref_bpe(_word_counts(), 6)
    assert merges == ref_merges
    got = {r["word"]: list(r["syms"]) for r in vocab.select("word", "syms").collect()}
    assert got == ref_vocab
    vocab.unpersist()


def test_overlapping_pairs_merge_greedily(docs):
    # 'aaaa' under merge (a,a): greedy left-to-right → [aa, aa, </w>]
    merges, vocab = bpe.learn_bpe(docs, "text", num_merges=6)
    ref_merges, ref_vocab = _ref_bpe(_word_counts(), 6)
    assert ref_vocab["aaaa"] == got_syms(vocab, "aaaa")
    vocab.unpersist()


def got_syms(vocab, word):
    return list(vocab.where(F.col("word") == word).select("syms").first()["syms"])


def test_token_counts_null_and_blank_rows_kept(docs):
    merges, vocab = bpe.learn_bpe(docs, "text", num_merges=4)
    out = {
        r["doc_id"]: (r["n_bpe_tokens"], r["n_words"])
        for r in bpe.bpe_token_counts(docs, vocab).collect()
    }
    assert set(out) == {0, 1, 2, 3, 4}
    assert out[2] == (0, 0) and out[3] == (0, 0)
    # independent recount for doc 4
    _, ref_vocab = _ref_bpe(_word_counts(), 4)
    expect = sum(len(ref_vocab[w]) for w in "aaaa aa low".split())
    assert out[4] == (expect, 3)
    vocab.unpersist()


def test_segment_words_replays_saved_merges(spark, docs):
    """Encoding NEW text under a saved merge list (the persisted-
    tokenizer path) reproduces the training-time segmentation."""
    merges, vocab = bpe.learn_bpe(docs, "text", num_merges=6)
    words = vocab.select("word", "cnt")
    reseg = bpe.segment_words(words, merges)
    a = {r["word"]: list(r["syms"]) for r in vocab.collect()}
    b = {r["word"]: list(r["syms"]) for r in reseg.collect()}
    assert a == b
    vocab.unpersist()


def test_training_plan_is_vocab_sized(docs):
    """Scale shape: the corpus is scanned only by word_frequency_table;
    merge iterations aggregate the distinct-word table (no join back
    to documents, no window over the corpus)."""
    vocab = bpe.word_frequency_table(docs, "text")
    assert vocab.count() == len(_word_counts())
    plan = vocab._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" in plan  # one hash-partial groupBy, nothing else

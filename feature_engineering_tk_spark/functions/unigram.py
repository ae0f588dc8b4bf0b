"""Distributed unigram-LM (SentencePiece-style) tokenizer training.

The unigram language-model tokenizer (Kudo 2018, "Subword
Regularization: Improving Neural Network Translation Models with
Multiple Subword Candidates") is the other production subword scheme
next to BPE (functions/bpe.py).  This module trains it at corpus
scale the same way the BPE trainer does: the corpus is scanned ONCE
into the distinct-word frequency table (10^12 tokens → ~10^7 distinct
words), and every training iteration touches only vocab-sized state.

Deliberate, pinned simplifications vs the SentencePiece binary (each
keeps the algorithm deterministic and partitioning-independent):

- **hard EM (Viterbi counts)** instead of forward-backward expected
  counts: each word contributes its best segmentation's piece counts,
  weighted by the word's corpus frequency.  Counts are therefore
  INTEGERS, so the M-step reduction is order-free and the whole
  training run is bit-deterministic under any partitioning — the same
  convention as pagerank / bradley_terry's exact-integer iterations.
- **count-rank pruning** to ``vocab_size`` after EM (single characters
  always retained for closure) instead of likelihood-loss pruning.
- pieces never cross word boundaries; words are lowercased whitespace
  tokens (the BPE module's convention).

Scale shape: seed-vocab substring counting and all EM state are
DataFrame aggregations over the word table; the per-word Viterbi DP
runs in Arrow-batched ``mapInPandas`` with the (vocab-sized) piece
log-prob table broadcast read-only to every executor — the documented
vectorized boundary (never per-row ``F.udf``), same stance as
kmeans / nb_classify model scoring.  Each Python batch pre-aggregates
its piece counts into a dict before emitting, so the only shuffle
after the word groupBy carries (piece, partial-count) rows bounded by
vocab × batches.

Viterbi tie-break (pinned): highest log-prob, then FEWEST pieces,
then lexicographically smallest piece sequence.  Characters unseen at
segmentation time fall back to ``unk_logprob``.

No SQL oracle: float-scored DP inside iterative EM is not reasonably
expressible in ANSI SQL — the driver records the rows-only check and
``tests/test_unigram.py`` property-tests training and segmentation
against a pure-Python reference implementation (exact equality, which
hard EM's integer counts make meaningful).
"""

from __future__ import annotations

import math
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from feature_engineering_tk_spark.functions.bpe import word_frequency_table

DEFAULT_UNK_LOGPROB = -20.0


def viterbi_segment(
    word: str, logp: dict[str, float], max_piece_len: int, unk_logprob: float = DEFAULT_UNK_LOGPROB
) -> list[str]:
    """Best segmentation of ``word`` under piece log-probs ``logp``.

    Pure-Python word-local DP (words are bounded); deterministic: ties
    break toward fewer pieces, then the lexicographically smaller
    piece sequence.  Single characters absent from ``logp`` score
    ``unk_logprob`` so every word segments.
    """
    n = len(word)
    # best[i] = (score, n_pieces, pieces_tuple) for word[:i]
    best: list[tuple[float, int, tuple[str, ...]]] = [(0.0, 0, ())] + [
        (-math.inf, 0, ()) for _ in range(n)
    ]
    for i in range(1, n + 1):
        for j in range(max(0, i - max_piece_len), i):
            piece = word[j:i]
            lp = logp.get(piece)
            if lp is None:
                if i - j > 1:
                    continue
                lp = unk_logprob  # single-char fallback keeps closure
            sc, np_, seq = best[j]
            if sc == -math.inf:
                continue
            cand = (sc + lp, np_ + 1, seq + (piece,))
            cur = best[i]
            # maximize score; then fewer pieces; then smaller sequence
            if (
                cand[0] > cur[0]
                or (cand[0] == cur[0] and cand[1] < cur[1])
                or (cand[0] == cur[0] and cand[1] == cur[1] and cand[2] < cur[2])
            ):
                best[i] = cand
    return list(best[n][2])


def seed_vocabulary(
    words: DataFrame, max_piece_len: int = 8, seed_size: int = 2000
) -> DataFrame:
    """Candidate pieces: every substring (length ≤ ``max_piece_len``)
    of every distinct word, frequency-weighted, top ``seed_size`` by
    (weight desc, piece asc) — plus ALL single characters regardless
    of rank (vocabulary closure).

    Substring explosion is a JVM higher-order expression over the
    word table (word-bounded work, corpus never rescanned); the count
    is one partial-aggregatable groupBy.  Returns (piece, weight).
    """
    w = F.col("word")
    starts = F.sequence(F.lit(0), F.length(w) - 1)
    subs = F.flatten(
        F.transform(
            starts,
            lambda i: F.transform(
                F.sequence(
                    F.lit(1), F.least(F.lit(max_piece_len), F.length(w) - i)
                ),
                lambda l: w.substr(i + 1, l),
            ),
        )
    )
    counts = (
        words.select(F.explode(subs).alias("piece"), F.col("cnt"))
        .groupBy("piece")
        .agg(F.sum("cnt").alias("weight"))
    )
    chars = counts.where(F.length("piece") == 1)
    multi = (
        counts.where(F.length("piece") > 1)
        .orderBy(F.col("weight").desc(), F.col("piece").asc())
        .limit(seed_size)
    )
    return chars.unionByName(multi)


def _viterbi_counts(
    words: DataFrame, logp: dict[str, float], max_piece_len: int
) -> DataFrame:
    """One hard-EM E-step: per distinct word, Viterbi-segment and emit
    frequency-weighted integer piece counts, pre-aggregated per Arrow
    batch so the shuffle carries (piece, partial) rows only."""
    spark = words.sparkSession
    bc = spark.sparkContext.broadcast(logp)

    def count_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        lp = bc.value
        for pdf in it:
            acc: dict[str, int] = {}
            for word, cnt in zip(pdf["word"], pdf["cnt"]):
                for piece in viterbi_segment(word, lp, max_piece_len):
                    acc[piece] = acc.get(piece, 0) + int(cnt)
            yield pd.DataFrame(
                {"piece": list(acc.keys()), "partial": list(acc.values())}
            )

    partials = words.mapInPandas(count_batches, "piece string, partial bigint")
    return partials.groupBy("piece").agg(F.sum("partial").alias("count"))


def _to_logprobs(counts: list[tuple[str, int]]) -> dict[str, float]:
    total = sum(c for _, c in counts)
    return {p: math.log(c) - math.log(total) for p, c in counts if c > 0}


def unigram_train(
    df: DataFrame,
    column: str = "text",
    vocab_size: int = 1000,
    n_iter: int = 3,
    max_piece_len: int = 8,
    seed_size: int = 2000,
) -> DataFrame:
    """Train a unigram-LM tokenizer; returns the model as a DataFrame
    ``(piece, count, logprob)`` sorted nowhere (sort at the caller).

    One corpus scan (word frequency table), then ``n_iter`` hard-EM
    rounds over the word table; prune to ``vocab_size`` by
    (count desc, piece asc), single characters always retained.
    """
    if vocab_size < 1 or n_iter < 1 or max_piece_len < 1:
        raise ValueError("vocab_size, n_iter and max_piece_len must be >= 1")
    spark = df.sparkSession
    words = word_frequency_table(df, column).localCheckpoint(eager=True)
    try:
        seed = seed_vocabulary(words, max_piece_len, seed_size).collect()
        counts = [(r["piece"], int(r["weight"])) for r in seed]
        # required-character closure (SentencePiece's required_chars):
        # hard EM lets whole words absorb all probability mass, which
        # would starve single characters out of the model and break
        # closure on unseen words — every corpus character keeps a
        # count floor of 1 after each E-step (pinned convention,
        # replayed by the reference implementation in tests)
        char_set = {p for p, _ in counts if len(p) == 1}
        logp = _to_logprobs(counts)
        for _ in range(n_iter):
            got = _viterbi_counts(words, logp, max_piece_len).collect()
            by = {r["piece"]: int(r["count"]) for r in got}
            for ch in char_set:
                by[ch] = max(by.get(ch, 0), 1)
            counts = sorted(by.items())
            logp = _to_logprobs(counts)
        # prune: rank by (count desc, piece asc); chars always kept
        by_piece = dict(counts)
        chars = {p: c for p, c in by_piece.items() if len(p) == 1}
        multi = sorted(
            ((p, c) for p, c in by_piece.items() if len(p) > 1),
            key=lambda pc: (-pc[1], pc[0]),
        )
        keep = dict(chars)
        for p, c in multi:
            if len(keep) >= vocab_size and p not in keep:
                continue
            keep[p] = c
        total = sum(keep.values())
        rows = [
            (p, int(c), math.log(c) - math.log(total))
            for p, c in sorted(keep.items())
        ]
    finally:
        words.unpersist()
    return spark.createDataFrame(rows, "piece string, count bigint, logprob double")


def unigram_segment(
    df: DataFrame,
    model: DataFrame | dict[str, float],
    column: str = "text",
    max_piece_len: int = 8,
    out: str = "pieces",
    unk_logprob: float = DEFAULT_UNK_LOGPROB,
) -> DataFrame:
    """Segment ``column`` into unigram-LM pieces (array<string>): each
    whitespace word Viterbi-segmented independently, results
    concatenated in word order.

    The model (vocab-sized) broadcasts read-only to every executor;
    the text column maps through one Arrow-batched ``mapInPandas`` —
    zero shuffle, corpus scanned once.
    """
    if isinstance(model, DataFrame):
        logp = {r["piece"]: float(r["logprob"]) for r in model.collect()}
    else:
        logp = dict(model)
    spark = df.sparkSession
    bc = spark.sparkContext.broadcast(logp)
    from pyspark.sql.types import ArrayType, StringType, StructField, StructType

    # fresh StructType — StructType.add would mutate the DataFrame's
    # cached schema object and poison df.columns
    schema = StructType(
        list(df.schema.fields) + [StructField(out, ArrayType(StringType()))]
    )

    def seg_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        lp = bc.value
        for pdf in it:
            pieces = []
            for text in pdf[column]:
                if text is None:
                    pieces.append(None)
                    continue
                acc: list[str] = []
                for word in str(text).lower().split():
                    acc.extend(
                        viterbi_segment(word, lp, max_piece_len, unk_logprob)
                    )
                pieces.append(acc)
            pdf = pdf.copy()
            pdf[out] = pieces
            yield pdf

    return df.mapInPandas(seg_batches, schema)

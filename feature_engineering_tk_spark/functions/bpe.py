"""Distributed byte-pair-encoding tokenizer training and segmentation.

Classic BPE (Sennrich et al. 2016, "Neural Machine Translation of Rare
Words with Subword Units") learned at corpus scale the way the
published scalable implementations do it: merges are learned on the
**distinct-word frequency table**, never on the raw corpus.  At 100 TB
the corpus has ~10^12 tokens but only ~10^7 distinct words, so after
one `groupBy(word).count()` pass every merge iteration touches a table
six orders of magnitude smaller than the input — the corpus itself is
scanned exactly once for training and once for segmentation.

Semantics (implemented identically in the DuckDB oracle):

- words = lowercased whitespace tokens; per-word symbol sequence =
  characters + a terminal ``</w>`` marker (merges never cross word
  boundaries).
- each iteration counts **every adjacent symbol pair occurrence**
  (overlaps included), weighted by word frequency; the winning pair is
  the max-weight pair, ties broken lexicographically on (lhs, rhs).
- the winning pair is applied with a greedy left-to-right fold: in
  ``a a a`` the pair ``(a, a)`` merges positions 0-1, not 1-2.  The
  fold is a sequential ``F.aggregate`` left fold so the oracle's
  ``list_reduce`` replays it element-for-element.

The reference toolkit has no tokenizer training (its closest surface
is the regex token counter, ``feature_engineering.py`` text helpers);
this operator is part of the first-class training-data family
(SURVEY §2.21).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

END_OF_WORD = "</w>"


def word_frequency_table(df: DataFrame, column: str = "text") -> DataFrame:
    """One corpus scan → (word, cnt) distinct-word frequency table.

    This is the only stage that touches the corpus during training;
    everything after operates on the vocab-sized result.
    """
    c = F.col(column)
    return (
        df.where(c.isNotNull())
        .select(F.explode(F.split(F.lower(c), r"\s+")).alias("word"))
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def _initial_symbols(word: Column) -> Column:
    # split("abc", "") yields a trailing "" under Java split semantics
    return F.concat(
        F.filter(F.split(word, ""), lambda x: x != ""),
        F.array(F.lit(END_OF_WORD)),
    )


def _adjacent_pairs(syms: Column) -> Column:
    """All adjacent (a, b) symbol pairs — overlapping occurrences
    included, exactly like the classic get_stats."""
    return F.transform(
        F.sequence(F.lit(0), F.size(syms) - 2),
        lambda i: F.struct(
            F.element_at(syms, i + 1).alias("a"),
            F.element_at(syms, i + 2).alias("b"),
        ),
    )


def _apply_merge(syms: Column, lhs: str, rhs: str) -> Column:
    """Greedy left-to-right merge of (lhs, rhs) → lhs||rhs as a
    sequential left fold (bit-identical to DuckDB list_reduce)."""
    merged = lhs + rhs
    return F.aggregate(
        syms,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0) & (F.element_at(acc, -1) == lhs) & (x == rhs),
            F.concat(
                F.slice(acc, F.lit(1), F.size(acc) - 1),
                F.array(F.lit(merged)),
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def learn_bpe(
    df: DataFrame,
    column: str = "text",
    num_merges: int = 8,
    checkpoint_every: int = 16,
) -> tuple[list[dict], DataFrame]:
    """Learn ``num_merges`` BPE merges over ``df[column]``.

    Returns ``(merges, vocab)`` where ``merges`` is the ordered list of
    ``{merge_rank, lhs, rhs, merged, pair_weight}`` dicts and ``vocab``
    is the final (word, cnt, syms) table segmented under all learned
    merges (reusable by :func:`bpe_token_counts` without re-applying
    the merge chain).

    Each iteration is one vocab-table aggregate job (pair count +
    argmax) and one driver collect of a single row.  The fold chain
    stacks lazily on the persisted vocab; every ``checkpoint_every``
    merges the table is localCheckpoint-ed so plan depth stays bounded
    when training real vocabularies (10k+ merges).
    """
    vocab = (
        word_frequency_table(df, column)
        .withColumn("syms", _initial_symbols(F.col("word")))
        .persist()
    )
    merges: list[dict] = []
    for rank in range(num_merges):
        best = (
            vocab.select(F.col("cnt"), F.explode(_adjacent_pairs(F.col("syms"))).alias("p"))
            .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
            .agg(F.sum("cnt").alias("w"))
            .orderBy(F.col("w").desc(), "a", "b")
            .limit(1)
            .collect()
        )
        if not best:
            break
        a, b, w = best[0]["a"], best[0]["b"], int(best[0]["w"])
        merges.append(
            {
                "merge_rank": rank,
                "lhs": a,
                "rhs": b,
                "merged": a + b,
                "pair_weight": w,
            }
        )
        vocab = vocab.withColumn("syms", _apply_merge(F.col("syms"), a, b))
        if (rank + 1) % checkpoint_every == 0:
            vocab = vocab.localCheckpoint(eager=False)
    return merges, vocab


def merge_table(spark: SparkSession, merges: list[dict]) -> DataFrame:
    """The learned merges as a DataFrame (the trained-tokenizer
    artifact — persist it next to the fitted-transform state)."""
    return spark.createDataFrame(
        [(m["merge_rank"], m["lhs"], m["rhs"], m["merged"], m["pair_weight"]) for m in merges],
        "merge_rank int, lhs string, rhs string, merged string, pair_weight bigint",
    )


def segment_words(vocab: DataFrame, merges: list[dict]) -> DataFrame:
    """Apply an ordered merge list to a (word, ...) table, producing a
    ``syms`` column — for encoding NEW text under a saved tokenizer."""
    syms = _initial_symbols(F.col("word"))
    for m in merges:
        syms = _apply_merge(syms, m["lhs"], m["rhs"])
    return vocab.withColumn("syms", syms)


def bpe_token_counts(
    df: DataFrame,
    vocab: DataFrame,
    id_col: str = "doc_id",
    column: str = "text",
) -> DataFrame:
    """Per-document BPE token counts under a trained vocab.

    One corpus scan: explode words, broadcast-join the vocab-sized
    (word → subword count) table, partial-agg sum per doc.  Documents
    with NULL/blank text stay in the output with zero counts (the
    silent-drop trap from ngram_contamination, not repeated here).
    """
    c = F.col(column)
    words = (
        df.where(c.isNotNull())
        .select(F.col(id_col), F.explode(F.split(F.lower(c), r"\s+")).alias("word"))
        .where(F.col("word") != "")
    )
    sub_counts = vocab.select("word", F.size("syms").cast("bigint").alias("n_sub"))
    per_doc = (
        words.join(F.broadcast(sub_counts), "word", "left")
        .groupBy(id_col)
        .agg(
            F.sum("n_sub").alias("n_bpe_tokens"),
            F.count(F.lit(1)).alias("n_words"),
        )
    )
    return (
        df.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("n_bpe_tokens", F.lit(0)).cast("bigint").alias("n_bpe_tokens"),
            F.coalesce("n_words", F.lit(0)).cast("bigint").alias("n_words"),
        )
    )

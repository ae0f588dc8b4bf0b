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
    included, exactly like the classic get_stats. Fully-merged
    single-symbol words yield an empty pair list (``sequence(0, -1)``
    would otherwise produce the DESCENDING [0, -1] and index out of
    bounds — hit once merges run long enough to collapse whole words)."""
    return F.when(
        F.size(syms) >= 2,
        F.transform(
            F.sequence(F.lit(0), F.size(syms) - 2),
            lambda i: F.struct(
                F.element_at(syms, i + 1).alias("a"),
                F.element_at(syms, i + 2).alias("b"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<a:string,b:string>>"))


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
    max_batch: int = 16,
    exact: bool = True,
    stats: dict | None = None,
) -> tuple[list[dict], DataFrame]:
    """Learn ``num_merges`` BPE merges over ``df[column]``.

    Returns ``(merges, vocab)`` where ``merges`` is the ordered list of
    ``{merge_rank, lhs, rhs, merged, pair_weight}`` dicts and ``vocab``
    is the final (word, cnt, syms) table segmented under all learned
    merges (reusable by :func:`bpe_token_counts` without re-applying
    the merge chain).

    **Batched merge learning** (``max_batch`` > 1): each iteration runs
    ONE vocab-table pair-count job, collects the top ``max_batch + 1``
    ranked rows, and applies a conflict-free batch of merges in a
    single fold chain — provably the IDENTICAL merge sequence the
    one-at-a-time loop (``max_batch=1``) produces:

    - the batch is the maximal ranked prefix whose pairs are pairwise
      symbol-disjoint (disjoint pairs cannot change each other's
      counts);
    - every pair whose count CHANGES when (a, b) → ab is applied —
      decreased neighbours of a/b and new pairs involving ab — has
      post-merge weight bounded by the pre-merge weight of some pair
      sharing a symbol with (a, b): each occurrence of (x, ab) was an
      occurrence of (x, a), each (ab, y) was (b, y), each (ab, ab) was
      (b, a).  So batch members after the first are kept only if their
      weight is STRICTLY greater than the first conflicting row's
      weight (and the first uncollected row's) — by induction each is
      still the unique argmax when its turn comes.

    Measured honestly: the strict cut is what exactness COSTS — top
    character pairs share letters, so exact batches average ~1.5-2
    merges/job on natural text (the first conflicting pair's weight
    caps everything below it; nothing ranked under a skipped pair can
    be proven to stay the argmax).

    ``exact=False`` is the 10k-merge scale path: classic approximate
    batch BPE — apply EVERY pairwise-disjoint pair among the top
    ``max_batch`` (skipping conflicts instead of stopping at the
    first), one count job per ~max_batch/2 merges (5-20× fewer driver
    round-trips).  The merge LIST remains a valid, reproducible
    tokenizer (``segment_words`` replays it verbatim) but the order
    may deviate from the strict sequential argmax where applied
    merges would have re-ranked later pairs; ``pair_weight`` records
    the count at batch-selection time.

    ``stats``, if given, receives ``{"count_jobs": ..., "n_merges":
    ...}`` so callers can assert the jobs-per-merge ratio.  The fold
    chain stacks lazily on the persisted vocab; every
    ``checkpoint_every`` merges the table is localCheckpoint-ed so
    plan depth stays bounded.
    """
    vocab = (
        word_frequency_table(df, column)
        .withColumn("syms", _initial_symbols(F.col("word")))
        .persist()
    )
    merges: list[dict] = []
    count_jobs = 0
    last_ckpt = 0
    while len(merges) < num_merges:
        top = (
            vocab.select(F.col("cnt"), F.explode(_adjacent_pairs(F.col("syms"))).alias("p"))
            .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
            .agg(F.sum("cnt").alias("w"))
            .orderBy(F.col("w").desc(), "a", "b")
            .limit(max_batch + 1)
            .collect()
        )
        count_jobs += 1
        if not top:
            break
        candidates, boundary_w = top[:max_batch], None
        if len(top) > max_batch:
            boundary_w = int(top[max_batch]["w"])
        # Maximal ranked prefix of pairwise symbol-disjoint pairs whose
        # merged strings are all FRESH (collide with no existing
        # multi-char symbol — prior merges or </w> — nor with anything
        # used/created earlier in the batch).  Freshness matters: if
        # a+b already exists as a symbol, applying (a, b) can BOOST
        # pre-existing (x, ab) pairs by up to old(x, a), pushing
        # interference past the single-cut bound below.  Multi-char
        # symbols only ever arise from merges or the </w> marker, so
        # the driver knows the full collision set without a job.
        known_multi = {END_OF_WORD} | {m["merged"] for m in merges}
        batch: list = []
        used: set[str] = set()
        cut_w = boundary_w
        if exact and candidates[0]["a"] + candidates[0]["b"] in known_multi:
            # r1's merged symbol pre-exists: its application boosts
            # (x, ab) pairs beyond what any cut can bound — do exactly
            # the sequential singleton step this iteration.
            safe = [candidates[0]]
        else:
            taken = set(known_multi)
            for r in candidates:
                merged_r = r["a"] + r["b"]
                if batch:
                    if {r["a"], r["b"]} & used:
                        if exact:
                            cut_w = int(r["w"])
                            break
                        continue  # approximate: skip, keep scanning
                    if exact and merged_r in taken:
                        cut_w = int(r["w"])
                        break
                batch.append(r)
                used |= {r["a"], r["b"]}
                taken.add(merged_r)
            if exact:
                # members after the first survive only if STRICTLY
                # heavier than every excluded row (first conflict /
                # first uncollected): all interference from applying
                # earlier batch members — decreased neighbours,
                # fresh-pair creations — is bounded by cut_w, so each
                # survivor is still the unique argmax at its
                # sequential turn.
                safe = [batch[0]] + [
                    r for r in batch[1:] if cut_w is None or int(r["w"]) > cut_w
                ]
            else:
                safe = batch
        safe = safe[: num_merges - len(merges)]
        for r in safe:
            a, b, w = r["a"], r["b"], int(r["w"])
            merges.append(
                {
                    "merge_rank": len(merges),
                    "lhs": a,
                    "rhs": b,
                    "merged": a + b,
                    "pair_weight": w,
                }
            )
            vocab = vocab.withColumn("syms", _apply_merge(F.col("syms"), a, b))
        if len(merges) - last_ckpt >= checkpoint_every:
            vocab = vocab.localCheckpoint(eager=False)
            last_ckpt = len(merges)
    if stats is not None:
        stats["count_jobs"] = count_jobs
        stats["n_merges"] = len(merges)
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

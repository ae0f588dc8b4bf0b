"""Bloom-filter membership gates for corpus-scale decontamination.

The exact decontamination path (``dedup.ngram_contamination``)
joins corpus n-gram hashes against a distinct benchmark-hash table.
At 10^12 turns that inner join is still the right EXACT answer, but
many pipelines want a cheaper standing GATE: a bit array a few
hundred KB wide that every ingest shard can probe locally, with the
one-sided guarantee that matters for safety — **no false negatives**.
A document containing benchmark text can never slip through; the
only cost of the compression is a tunable false-positive rate
(≈ (1 − e^{−kn/m})^k), and anything the gate flags can be confirmed
by the exact path.

Representation: a Bloom filter over ``n_bits`` bits stored SPARSELY
as (word_idx, bits) rows of 63-bit little-endian words — only words
with at least one set bit exist, so an empty filter is an empty
DataFrame and a benchmark-sized filter is ``n_bits/63`` rows at most
(aggregate-sized: 1 M bits ≈ 16 k rows ≈ 130 KB).  Filters built
from different shards of the same reference set merge LOSSLESSLY by
``bit_or`` per word (union of Bloom filters over the same geometry =
the filter of the union).  All hashing is the engine's cross-engine
convention (``dedup._token_hash``): xxhash64 fast path, 60-bit md5
(``hash_mode='md5'``) for bit-exact DuckDB oracle replay.

Everything is whole-stage-codegen column expressions — zero UDF, and
the probe side shuffles only (word_idx, mask) coordinates, never
text.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from feature_engineering_tk_spark.exceptions import ColumnNotFoundError

_WORD_BITS = 63  # bits per stored long; keeps every mask positive


def _require(df: DataFrame, column: str) -> None:
    if column not in df.columns:
        raise ColumnNotFoundError(column, df.columns)


def _bloom_params(n_bits: int, k: int) -> tuple[int, int]:
    m, kk = int(n_bits), int(k)
    if m < _WORD_BITS:
        raise ValueError(f"n_bits must be >= {_WORD_BITS}")
    if kk < 1:
        raise ValueError("k must be >= 1")
    return m, kk


def _bit_positions(value: Column, k: int, n_bits: int, salt: str, hash_mode: str):
    """k bit positions for one value — hash j salts the key with its
    probe index (the cms_sketch_table convention)."""
    from feature_engineering_tk_spark.operators.dedup import _token_hash

    return [
        F.pmod(
            _token_hash(
                F.concat_ws("\x1f", F.lit(salt), F.lit(str(j)), value), hash_mode
            ),
            F.lit(int(n_bits)),
        )
        for j in range(k)
    ]


def bloom_filter_table(
    df: DataFrame,
    column: str,
    n_bits: int = 1 << 20,
    k: int = 5,
    salt: str = "v1",
    hash_mode: str = "xxhash64",
) -> DataFrame:
    """Build a sparse Bloom filter over the distinct non-null values of
    ``column``: (word_idx, bits) rows, ≤ ``n_bits``/63 of them.

    Scale shape: each value explodes into k (word_idx, mask) pairs —
    8-byte coordinates, never the value itself — and ONE map-side-
    combined ``bit_or`` groupBy folds them into words.  The result is
    aggregate-sized and broadcastable; persist it next to the
    benchmark it summarises and every future ingest shard probes it
    without touching the benchmark table again.

    Sizing: false-positive rate ≈ (1 − e^{−kn/m})^k for n inserted
    values; the default (1 M bits, k=5) holds ~1% at n ≈ 87 k values.
    Filters over the SAME (n_bits, k, salt, hash_mode) geometry merge
    with :func:`merge_bloom_filters`.
    """
    m, kk = _bloom_params(n_bits, k)
    _require(df, column)
    v = F.col(column).cast("string")
    pos = F.explode(
        F.array(*_bit_positions(v, kk, m, salt, hash_mode))
    ).alias("_pos")
    words = (
        df.where(F.col(column).isNotNull())
        .select(pos)
        .select(
            (F.col("_pos") / F.lit(_WORD_BITS)).cast("long").alias("word_idx"),
            F.expr(
                f"shiftleft(CAST(1 AS BIGINT), CAST(_pos % {_WORD_BITS} AS INT))"
            ).alias("_mask"),
        )
    )
    return words.groupBy("word_idx").agg(F.bit_or("_mask").alias("bits"))


def merge_bloom_filters(filters: DataFrame) -> DataFrame:
    """Union Bloom filters built over the SAME geometry (n_bits, k,
    salt, hash_mode): cell-wise ``bit_or`` per word — lossless, the
    merged filter is bit-identical to building one filter over the
    concatenated inputs.  Input is filter-sized; runs at aggregate
    scale."""
    for c in ("word_idx", "bits"):
        _require(filters, c)
    return filters.groupBy("word_idx").agg(F.bit_or("bits").alias("bits"))


def bloom_contains(
    df: DataFrame,
    column: str,
    bloom: DataFrame,
    n_bits: int = 1 << 20,
    k: int = 5,
    salt: str = "v1",
    hash_mode: str = "xxhash64",
    out: str = "maybe_present",
) -> DataFrame:
    """Probe every row of ``df`` against a Bloom filter: adds boolean
    ``out`` = True iff ALL k probed bits are set (NULL value → NULL).

    **One-sided**: a value that was inserted ALWAYS tests True (no
    false negatives — the gate property); a True may be a false
    positive at the filter's designed rate, so treat True as "send to
    the exact path", False as "provably absent".

    Scale shape: the k probes are k broadcast-hash LEFT JOINS of the
    aggregate-sized filter (one per probe word), then one row-local
    bit test — every step is map-side, so the corpus NEVER shuffles
    and the gate composes with a plain scan: an ingest shard filters
    itself with nothing resident but the broadcast words.  No
    explode, no groupBy, no row ids.
    """
    m, kk = _bloom_params(n_bits, k)
    _require(df, column)
    for c in ("word_idx", "bits"):
        _require(bloom, c)
    if out in df.columns:
        raise ValueError(f"output column {out!r} already exists")
    v = F.col(column).cast("string")
    positions = _bit_positions(v, kk, m, salt, hash_mode)
    cur = df
    checks = []
    for j, pos in enumerate(positions):
        pcol, widx, bcol = f"_bloom_p{j}", f"_bloom_w{j}", f"_bloom_b{j}"
        side = bloom.select(
            F.col("word_idx").alias(widx), F.col("bits").alias(bcol)
        )
        cur = (
            cur.withColumn(pcol, pos)
            .withColumn(widx, (F.col(pcol) / F.lit(_WORD_BITS)).cast("long"))
            .join(F.broadcast(side), widx, "left")
        )
        mask = F.expr(
            f"shiftleft(CAST(1 AS BIGINT), CAST({pcol} % {_WORD_BITS} AS INT))"
        )
        checks.append(
            F.coalesce(F.col(bcol), F.lit(0)).bitwiseAND(mask) == mask
        )
    all_set = checks[0]
    for c in checks[1:]:
        all_set = all_set & c
    result = cur.withColumn(
        out,
        F.when(F.col(column).isNull(), F.lit(None).cast("boolean")).otherwise(
            all_set
        ),
    )
    drop = [
        f"_bloom_{kind}{j}" for j in range(kk) for kind in ("p", "w", "b")
    ]
    return result.drop(*drop)


def decontaminate_bloom(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 13,
    n_bits: int = 1 << 20,
    k: int = 5,
    salt: str = "v1",
    hash_mode: str = "xxhash64",
) -> DataFrame:
    """Benchmark-overlap gate via a Bloom filter of benchmark
    ``n``-grams: per corpus doc, (id, n_grams, flagged_grams,
    flagged_share, contaminated) where ``flagged_grams`` counts the
    doc's n-grams the filter says MAY be in the benchmark.

    Versus the exact path (``dedup.ngram_contamination``, a hash join
    against the distinct benchmark-gram table): the benchmark is
    compressed into an aggregate-sized bit table probed row-locally —
    no corpus-side shuffle at all, so an ingest shard can gate itself
    with nothing but the broadcast filter.  No false negatives: a doc
    sharing any n-gram with the benchmark ALWAYS scores
    ``flagged_grams ≥ its true overlap``; ``contaminated`` = False is
    proof of cleanliness, True is a candidate for the exact path.
    Gram identity is EXACTLY ``dedup.ngram_contamination``'s
    (``dedup._shingles`` normalization, per-doc DISTINCT grams, null
    text coalesced to '', short docs one whole-text gram), so the two
    paths agree on ``n_grams`` and ``flagged_grams ≥`` the exact
    path's ``n_contaminated_ngrams`` row for row.
    """
    m, kk = _bloom_params(n_bits, k)
    for d_, c_ in ((corpus, text_col), (corpus, id_col), (benchmark, text_col)):
        _require(d_, c_)
    from feature_engineering_tk_spark.operators.dedup import _shingles

    bench_grams = benchmark.select(
        F.explode(_shingles(F.col(text_col), n)).alias("gram")
    )
    bloom = bloom_filter_table(
        bench_grams, "gram", n_bits=m, k=kk, salt=salt, hash_mode=hash_mode
    )
    return decontaminate_bloom_with_filter(
        corpus, bloom, text_col=text_col, id_col=id_col, n=n,
        n_bits=m, k=kk, salt=salt, hash_mode=hash_mode,
    )


def decontaminate_bloom_with_filter(
    corpus: DataFrame,
    bloom: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 13,
    n_bits: int = 1 << 20,
    k: int = 5,
    salt: str = "v1",
    hash_mode: str = "xxhash64",
) -> DataFrame:
    """The probe half of :func:`decontaminate_bloom` against a
    PREBUILT (persisted) filter — build the benchmark's filter once
    with :func:`bloom_filter_table`, store the (word_idx, bits) rows
    next to the benchmark, and gate every future ingest shard /
    micro-batch with this function alone: no benchmark re-read, no
    filter rebuild (the ``streaming_bloom_gate`` path).  Geometry
    (n, n_bits, k, salt, hash_mode) must match the filter's build;
    output and guarantees are exactly ``decontaminate_bloom``'s.
    """
    m, kk = _bloom_params(n_bits, k)
    for c_ in (text_col, id_col):
        _require(corpus, c_)
    from feature_engineering_tk_spark.operators.dedup import _shingles

    grams = corpus.select(
        F.col(id_col),
        F.explode(
            F.array_distinct(_shingles(F.coalesce(F.col(text_col), F.lit("")), n))
        ).alias("gram"),
    )
    probed = bloom_contains(
        grams, "gram", bloom, n_bits=m, k=kk, salt=salt, hash_mode=hash_mode,
        out="_maybe",
    )
    return (
        probed.groupBy(id_col)
        .agg(
            F.count("gram").alias("n_grams"),
            F.sum(F.when(F.col("_maybe"), 1).otherwise(0)).alias("flagged_grams"),
        )
        .select(
            id_col,
            "n_grams",
            "flagged_grams",
            F.when(
                F.col("n_grams") > 0,
                F.col("flagged_grams") / F.col("n_grams"),
            ).otherwise(F.lit(0.0)).alias("flagged_share"),
            (F.col("flagged_grams") > 0).alias("contaminated"),
        )
    )

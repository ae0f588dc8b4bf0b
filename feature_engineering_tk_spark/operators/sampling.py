"""Deterministic hash-based sampling & splitting.

``df.sample``/``sampleBy`` draw from a partition-seeded RNG: the
selected set changes with partitioning/cluster layout and cannot be
reproduced outside Spark. Serious training-data pipelines sample by
KEY HASH instead — membership is a pure function of the row's key and
a salt, so it is stable across re-runs, re-partitions, engines, and
backfills, and a row's train/test assignment can never flip between
pipeline stages (leakage-free by construction).

- :func:`hash_sample` — keep rows whose key-hash bucket < fraction.
- :func:`group_split` — train/test split BY GROUP (every row of a
  conversation lands on the same side — the split that prevents
  within-conversation leakage the north rule cares about).
- :func:`weighted_mix` — dataset mixing: per-source hash-sampled
  fractions unioned into one corpus (the Pile-style mixture recipe).

All three are one JVM expression per row (no shuffle, no RNG state);
with ``hash_mode='md5'`` the exact selected set is replayable in the
DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_BUCKETS = 1_000_000


def _key_hash(keys: list[str], salt: str, hash_mode: str) -> Column:
    """Raw (unreduced) salted key hash — 64-bit xxhash64 or 60-bit md5."""
    key = F.concat_ws("\x1f", F.lit(salt), *[F.col(k).cast("string") for k in keys])
    if hash_mode == "xxhash64":
        return F.xxhash64(key)
    elif hash_mode == "md5":
        from feature_engineering_tk_spark.operators.dedup import _hash60

        return _hash60(key)
    raise ValueError(f"unknown hash_mode: {hash_mode!r}")


def _key_bucket(keys: list[str], salt: str, hash_mode: str) -> Column:
    return F.pmod(_key_hash(keys, salt, hash_mode), F.lit(_BUCKETS))


def hash_sample(
    df: DataFrame,
    keys: list[str],
    fraction: float,
    salt: str = "v1",
    hash_mode: str = "xxhash64",
) -> DataFrame:
    """Keep ~``fraction`` of rows, chosen by key hash — deterministic,
    partitioning-independent, re-run-stable. Change ``salt`` to draw an
    independent sample."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError("fraction must be in [0, 1]")
    cut = int(round(fraction * _BUCKETS))
    return df.filter(_key_bucket(keys, salt, hash_mode) < cut)


def group_split(
    df: DataFrame,
    group_col: str,
    test_fraction: float = 0.2,
    salt: str = "split-v1",
    hash_mode: str = "xxhash64",
    out: str = "is_test",
) -> DataFrame:
    """Leak-free train/test tagging: assignment is a pure function of
    the GROUP key, so every turn of a conversation lands on one side,
    and the assignment never changes across re-runs or stages."""
    if not 0.0 <= test_fraction <= 1.0:
        raise ValueError("test_fraction must be in [0, 1]")
    cut = int(round(test_fraction * _BUCKETS))
    return df.withColumn(out, _key_bucket([group_col], salt, hash_mode) < cut)


def kfold_assign(
    df: DataFrame,
    keys: list[str],
    k: int = 5,
    salt: str = "fold-v1",
    hash_mode: str = "xxhash64",
    out: str = "fold",
) -> DataFrame:
    """Group-aware k-fold assignment: fold id in [0, k) is a pure
    function of the key hash — every row sharing the key (all turns of
    a conversation, all chunks of a document) lands in ONE fold, so
    cross-validation never leaks a group across folds; assignment is
    re-run-stable and partitioning-independent, the group_split
    contract generalized from 2 to k sides.

    100 TB shape: a row-local hash-mod predicate over the scan — zero
    shuffle, zero fit, no vocabulary. ``hash_mode='md5'`` keeps the
    assignment replayable in the DuckDB oracle and on any engine with
    md5 (the token_budget_sample convention).  The fold is the RAW
    key hash pmod k (not bucketed through the 1M-bucket sampler
    reduction first), so fold sizes carry no modular bias for any k —
    hash % 1M % k would slightly favor low folds whenever k ∤ 1M."""
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    return df.withColumn(
        out, F.pmod(_key_hash(keys, salt, hash_mode), F.lit(k)).cast("int")
    )


def sample_per_group(
    df: DataFrame,
    group_col: str,
    keys: list[str],
    k: int,
    salt: str = "pergroup-v1",
    hash_mode: str = "xxhash64",
    out: str | None = None,
) -> DataFrame:
    """Deterministic k-per-group sampling: keep the ``k`` rows of each
    group whose key hash ranks lowest — the distributed, re-run-stable
    replacement for "reservoir sample k per conversation / per source".
    Membership is a pure function of (group, keys, salt): re-runs,
    repartitions, and engine replays select the SAME rows, and growing
    a group only ever evicts the highest-ranked survivors (bounded
    churn on backfills — a seeded RNG reshuffles everything).

    Scale shape: one ``row_number`` window partitioned by the group
    key — a single group-key shuffle; no global sort, no driver state.
    Hash ties are broken by the key columns themselves so the result
    is total-order stable. ``out`` keeps the within-group rank (1..k)
    when given.

    Eval-set builders use this to cap per-conversation / per-domain
    contributions; pair with ``hash_sample`` (row-level) and
    ``group_split`` (side assignment) for the full recipe."""
    if k <= 0:
        raise ValueError("k must be positive")
    rank_col = out or "__spg_rank"
    order = [_key_bucket(keys, salt, hash_mode).asc()] + [F.col(c) for c in keys]
    w = Window.partitionBy(group_col).orderBy(*order)
    res = df.withColumn(rank_col, F.row_number().over(w)).filter(
        F.col(rank_col) <= k
    )
    return res if out else res.drop(rank_col)


def stratified_sample(
    df: DataFrame,
    keys: list[str],
    strata_col: str,
    fractions: dict,
    default: float = 0.0,
    salt: str = "strata-v1",
    hash_mode: str = "xxhash64",
) -> DataFrame:
    """Per-stratum hash sampling (the deterministic ``sampleBy``):
    keep ~``fractions[stratum]`` of each stratum's rows, ``default``
    for strata not listed. Like :func:`hash_sample`, membership is a
    pure function of (key, salt) — stable across re-runs, partitioning
    and engines — so per-language / per-source corpus rebalancing
    (CCNet-style) is reproducible and backfill-safe. The per-stratum
    cut is one nested CASE expression on the stratum column: a single
    row-local JVM predicate, zero shuffle, evaluated inside the scan.

    Reference analog: ``sample_data`` (data_preprocessing.py) draws a
    global seeded fraction; this is the grouped form a mixture pipeline
    needs.
    """
    for frac in list(fractions.values()) + [default]:
        if not 0.0 <= float(frac) <= 1.0:
            raise ValueError("every fraction must be in [0, 1]")
    cut: Column = F.lit(int(round(float(default) * _BUCKETS)))
    for val, frac in sorted(fractions.items()):
        cut = F.when(
            F.col(strata_col) == F.lit(val), F.lit(int(round(float(frac) * _BUCKETS)))
        ).otherwise(cut)
    return df.filter(_key_bucket(keys, salt, hash_mode) < cut)


def weighted_mix(
    sources: list[tuple[DataFrame, float]],
    keys: list[str],
    salt: str = "mix-v1",
    hash_mode: str = "xxhash64",
    source_col: str = "mix_source",
) -> DataFrame:
    """Dataset mixing: union of per-source hash-samples at the given
    fractions, tagged with the source index. Fractions > 1 are clamped
    (hash sampling cannot oversample; duplicate the source upstream for
    epoch-style repetition)."""
    parts = []
    for i, (src, frac) in enumerate(sources):
        part = hash_sample(src, keys, min(float(frac), 1.0), f"{salt}/{i}", hash_mode)
        parts.append(part.withColumn(source_col, F.lit(i)))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def importance_resample(
    df: DataFrame,
    weight_col: str,
    k: int,
    id_cols: list[str],
    temperature: float = 1.0,
    salt: str = "dsir-v1",
    hash_mode: str = "xxhash64",
) -> DataFrame:
    """Gumbel top-k importance resampling — the DSIR selection step
    (Xie et al. 2023): draw ``k`` rows WITHOUT replacement with
    probability ∝ exp(weight / temperature), via the Gumbel-top-k
    trick: rank by ``weight/τ + g`` where ``g`` is a Gumbel(0,1)
    draw. The Gumbel comes from the row's key hash
    (``g = -ln(-ln(u))``, ``u = (bucket+0.5)/10^6``), NOT an RNG — so
    the selected set is a pure function of (keys, salt): re-run-,
    partitioning-, and engine-stable, like every sampler in this
    module. Change ``salt`` for an independent draw.

    Scale: the key is one row-local JVM expression; selection is a
    global top-k (``TakeOrderedAndProject`` — a k-sized heap per
    partition + driver merge, never a full sort). Rows with NULL
    weight cannot be drawn (they were never scored) — count them
    upstream before calling if the gap matters. Deterministic
    tie-break on ``id_cols``.
    """
    if k <= 0:
        raise ValueError("k must be positive")
    if temperature <= 0:
        raise ValueError("temperature must be positive")
    u = (_key_bucket(id_cols, salt, hash_mode) + F.lit(0.5)) / F.lit(float(_BUCKETS))
    gumbel = -F.log(-F.log(u))
    key = F.col(weight_col) / F.lit(float(temperature)) + gumbel
    return (
        df.filter(F.col(weight_col).isNotNull())
        .withColumn("gumbel_key", key)
        .orderBy(F.desc("gumbel_key"), *id_cols)
        .limit(k)
    )


def mix_balance(df: DataFrame, by: str = "source") -> DataFrame:
    """Corpus-composition balance scalars: 1 row of ``(n_rows,
    n_groups, hhi, simpson, top_share)`` over the ``by`` facet.

    The dataset-mixing dashboard number: HHI = Σ share² (concentration
    — 1/n_groups when perfectly balanced, →1 when one source
    dominates), Simpson diversity = 1 − HHI, and the largest single
    group's share.  All three derive from integer sufficient
    statistics (Σc², max c, N) in ONE partial-aggregatable
    ``groupBy(by)`` + a scalar agg, so every float is a single exact
    division — bit-identical on any engine.

    Σc² is accumulated as ``decimal(38,0)`` (exact 128-bit-class
    integer arithmetic): a bigint ``c·c`` overflows int64 once any
    group passes ~3.04e9 rows — guaranteed at the 10^12-row corpus
    scale this dashboard targets — and Spark 4's default ANSI mode
    would kill the job.  The double conversion happens only at the
    final division (one IEEE rounding, identical on any engine).
    """
    g = df.groupBy(by).agg(F.count(F.lit(1)).alias("_c"))
    cd = F.col("_c").cast("decimal(19,0)")
    nd = F.col("n_rows").cast("double")
    return g.agg(
        F.sum("_c").alias("n_rows"),
        F.count(F.lit(1)).alias("n_groups"),
        F.sum(cd * cd).alias("_ss"),
        F.max("_c").alias("_top"),
    ).select(
        "n_rows",
        "n_groups",
        (F.col("_ss").cast("double") / (nd * nd)).alias("hhi"),
        (F.lit(1.0) - F.col("_ss").cast("double") / (nd * nd)).alias("simpson"),
        (F.col("_top") / F.col("n_rows")).alias("top_share"),
    )


def token_budget_sample(
    df: DataFrame,
    text_col: str = "text",
    by: str = "source",
    id_col: str = "doc_id",
    budget: int = 10_000,
    hash_mode: str = "xxhash64",
) -> DataFrame:
    """Deterministic token-budget downsampling: within each ``by``
    group, order documents by a hash of their id (a stable uniform
    shuffle — re-runs pick the identical subset, no RNG state) and
    keep the longest prefix whose CUMULATIVE whitespace-token count
    stays within ``budget``.  The mixing primitive behind "cap every
    source at N tokens" recipes (e.g. The Pile's per-set epochs):
    ``weighted_mix`` picks row fractions, this caps token mass.

    Appends ``n_tokens`` and ``cum_tokens`` to the kept rows.

    Scale shape: ONE window ``partitionBy(by).orderBy(hash, id)`` —
    the only shuffle is the group key, the running sum is a single
    pass, and the filter is row-local afterwards.  Groups are
    source-sized; a skewed giant source is exactly what AQE skew
    handling splits downstream, and the hash order means the kept
    prefix is an unbiased sample of the source.
    """
    from feature_engineering_tk_spark.functions.text import token_count
    from feature_engineering_tk_spark.operators.dedup import _token_hash

    if budget < 0:
        raise ValueError("budget must be >= 0")
    w = (
        Window.partitionBy(by)
        .orderBy(_token_hash(F.col(id_col).cast("string"), hash_mode), F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = df.withColumn("n_tokens", token_count(F.col(text_col))).withColumn(
        "cum_tokens", F.sum("n_tokens").over(w)
    )
    return out.where(F.col("cum_tokens") <= budget)


def temporal_split(
    df: DataFrame,
    ts: str,
    val_start,
    test_start,
    embargo_seconds: float = 0.0,
    out: str = "split",
) -> DataFrame:
    """Leakage-safe chronological train/val/test tagging with an
    embargo gap: rows get ``out`` ∈ {'train','val','test','embargo'}
    by comparing ``ts`` against the two cut timestamps, and rows in
    the ``embargo_seconds`` window strictly BEFORE each cut are tagged
    'embargo' instead of landing in the earlier fold.

    Why the embargo: with windowed / rolling features, a training row
    just before the validation cut carries aggregates over the same
    raw events a validation row reads — information crosses the cut
    even though the timestamps don't.  Quarantining one maximum
    feature-window width of history before each cut (the purged
    train/test split of de Prado 2018, ch. 7) severs that path.  Rows
    are TAGGED, never dropped — downstream filters choose, and no row
    silently vanishes from lineage counts.

    The north rule's zero-temporal-leakage invariant applied to fold
    construction: the hash splitter (group_split) keeps conversations
    intact but mixes time; this keeps time intact — evaluating a
    model on the future of its training data, the only deployment-
    faithful protocol for drifting corpora.

    Scale shape: one pure row-local CASE expression — zero shuffle,
    fully codegen, pushes into the scan when filtered on.
    ``val_start``/``test_start`` accept anything pandas parses as a
    timestamp (ISO strings, datetimes); they are parsed DRIVER-side
    and shipped as datetime literals, so the validated values are
    exactly the applied values (a Spark-side string cast would accept
    a narrower format set than the validator).  val_start must precede
    test_start (validated).  Rows whose ``ts`` is NULL are tagged
    ``'unknown'`` — a row of unknown time must never default into the
    training fold, that would be exactly the leakage this operator
    exists to prevent.
    """
    if embargo_seconds < 0:
        raise ValueError("embargo_seconds must be >= 0")
    import pandas as pd

    try:
        v_chk, t_chk = pd.Timestamp(val_start), pd.Timestamp(test_start)
    except (ValueError, TypeError) as e:
        raise ValueError(f"unparseable cut timestamp: {e}") from e
    if not v_chk < t_chk:
        raise ValueError(
            f"val_start ({val_start!r}) must precede test_start ({test_start!r})"
        )
    t = F.col(ts).cast("timestamp")
    v_cut = F.lit(v_chk.to_pydatetime()).cast("timestamp")
    t_cut = F.lit(t_chk.to_pydatetime()).cast("timestamp")
    emb = F.lit(float(embargo_seconds))
    v_emb = F.timestamp_micros(
        F.unix_micros(v_cut) - (emb * 1_000_000).cast("long")
    )
    t_emb = F.timestamp_micros(
        F.unix_micros(t_cut) - (emb * 1_000_000).cast("long")
    )
    tag = (
        F.when(t.isNull(), F.lit("unknown"))
        .when(t >= t_cut, F.lit("test"))
        .when(t >= t_emb, F.lit("embargo"))
        .when(t >= v_cut, F.lit("val"))
        .when(t >= v_emb, F.lit("embargo"))
        .otherwise(F.lit("train"))
    )
    return df.withColumn(out, tag)


def topk_per_group(
    df: DataFrame,
    group: str | list[str],
    order_by: str,
    k: int,
    descending: bool = True,
    tie_break: str | list[str] | None = None,
    out_rank: str | None = None,
) -> DataFrame:
    """Exact top-``k`` rows per group by ``order_by`` — the
    score-ordered complement of ``sample_per_group`` (hash-uniform k
    per group): keep the k highest-quality docs per domain, the k
    most-recent conversations per user, the k strongest candidates
    per retrieval bucket.

    Deterministic: rows are ranked by (``order_by`` desc|asc,
    ``tie_break`` asc) with ``row_number`` — pass tie_break columns
    that complete a total order (an id) or equal scores select
    engine-dependently; NULL scores sort last, so they are only kept
    when a group has fewer than k scored rows.  ``out_rank`` keeps
    the 1-based rank as a column.

    Scale shape: ONE exchange on the group key; the rank window and
    filter fuse into the sort — no global sort, no driver collect.
    Skewed groups cost one task each at worst (the window is
    per-group sequential), which is the exact-semantics floor; for
    approximate selection under extreme skew use hash_sample first.
    """
    from feature_engineering_tk_spark.exceptions import ColumnNotFoundError

    if k < 1:
        raise ValueError("k must be >= 1")
    groups = [group] if isinstance(group, str) else list(group)
    ties = (
        [tie_break] if isinstance(tie_break, str) else list(tie_break or [])
    )
    for c in groups + [order_by] + ties:
        if c not in df.columns:
            raise ColumnNotFoundError(c, df.columns)
    order = (
        F.col(order_by).desc_nulls_last()
        if descending
        else F.col(order_by).asc_nulls_last()
    )
    w = Window.partitionBy(*groups).orderBy(order, *[F.col(t).asc() for t in ties])
    rank_col = out_rank or "_topk_rank"
    ranked = df.withColumn(rank_col, F.row_number().over(w)).where(
        F.col(rank_col) <= k
    )
    return ranked if out_rank else ranked.drop(rank_col)

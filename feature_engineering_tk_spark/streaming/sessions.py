"""Structured Streaming surface.

The north rule targets a checkpoint-resumable BATCH job, so streaming
is a thin adjacency layer: the same session/window semantics expressed
with the streaming-native primitives, for deployments that tail the
transcript table instead of backfilling it.

- :func:`read_transcript_stream` — file-source stream over the same
  partitioned parquet layout the batch engine writes.
- :func:`streaming_session_stats` — gap-based sessions via the
  built-in ``session_window`` + watermark (late turns beyond the
  watermark are dropped, matching a re-run of the affected batch
  partition in the batch engine).
- :func:`streaming_turn_rate` — tumbling-window turn counts.
- :func:`streaming_running_features` — stateful per-conversation
  running features (``applyInPandasWithState``), batch-equivalent to
  the cumulative window features.
- :func:`streaming_dedup` — ``dropDuplicatesWithinWatermark`` on the
  exact-dedup key.
- :func:`streaming_loop_monitor` — incremental repeated-turn loop
  detection, batch-equivalent to ``transcripts.detect_loops``.
- :func:`streaming_neardup_ingest` — foreachBatch MinHash gate
  against the persisted dedup index (cross-batch state).

Aggregations run with ``trigger(availableNow=True)`` for a
deterministic batch-equivalent answer in tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from feature_engineering_tk_spark.datagen import TRANSCRIPT_SCHEMA


def read_transcript_stream(spark: SparkSession, path: str, max_files: int = 16) -> DataFrame:
    return (
        spark.readStream.schema(TRANSCRIPT_SCHEMA)
        .option("maxFilesPerTrigger", max_files)
        .parquet(path)
    )


def streaming_session_stats(
    stream: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
    entity: str = "conv_id",
    ts: str = "ts",
) -> DataFrame:
    """Per (entity, session) aggregates with gap-based session windows.
    State is bounded by the watermark — the streaming analog of the
    batch cumulative-sum sessionizer."""
    return (
        stream.withWatermark(ts, watermark)
        .groupBy(entity, F.session_window(F.col(ts), gap).alias("session"))
        .agg(
            F.count(F.lit(1)).alias("n_turns"),
            F.min(ts).alias("session_start"),
            F.max(ts).alias("session_end"),
        )
        .select(
            entity,
            F.col("session.start").alias("window_start"),
            "n_turns",
            "session_start",
            "session_end",
        )
    )


def streaming_turn_rate(
    stream: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
    ts: str = "ts",
) -> DataFrame:
    """Tumbling-window global turn counts (late data handled by the
    watermark)."""
    return (
        stream.withWatermark(ts, watermark)
        .groupBy(F.window(F.col(ts), window).alias("w"))
        .agg(F.count(F.lit(1)).alias("n_turns"))
        .select(F.col("w.start").alias("window_start"), "n_turns")
    )


def run_available_now(query_df: DataFrame, sink_table: str, output_mode: str = "complete") -> None:
    """Drain everything currently in the source into an in-memory sink
    (deterministic batch-equivalent execution for tests/backfills).
    ``complete`` for aggregations; ``append`` for row-level operators
    like :func:`streaming_dedup`."""
    q = (
        query_df.writeStream.format("memory")
        .queryName(sink_table)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def streaming_running_features(
    stream: DataFrame,
    entity: str = "conv_id",
    ts: str = "ts",
) -> DataFrame:
    """Custom stateful operator via ``applyInPandasWithState``: per-entity
    running feature state (turn count, cumulative tokens, last event
    time) carried ACROSS micro-batches — the streaming twin of the batch
    engine's cumulative window aggregates.

    State per key is three scalars (bounded, no row buffering); each
    micro-batch is processed vectorized in pandas (Arrow transfer, never
    per-row Python). Append-mode output: one row per incoming turn with
    its running aggregates as of that turn."""
    import pandas as pd  # noqa: F401 (vectorized path)

    out_schema = (
        f"{entity} string, turn_idx int, ts timestamp, "
        "running_turns long, tokens_cum long, gap_s double"
    )
    state_schema = "n long, tok long, last_ts double"

    def update(key, pdfs, state):
        n, tok, last_ts = state.get if state.exists else (0, 0, None)
        for pdf in pdfs:
            pdf = pdf.sort_values([ts, "turn_idx"], kind="mergesort")
            sec = pdf[ts].astype("int64") / 1e9
            pdf["gap_s"] = sec.diff()
            if last_ts is not None:
                pdf.iloc[0, pdf.columns.get_loc("gap_s")] = sec.iloc[0] - last_ts
            pdf["running_turns"] = range(n + 1, n + len(pdf) + 1)
            pdf["tokens_cum"] = tok + pdf["tokens"].cumsum()
            n += len(pdf)
            tok += int(pdf["tokens"].sum())
            last_ts = float(sec.iloc[-1])
            yield pdf[[entity, "turn_idx", ts, "running_turns", "tokens_cum", "gap_s"]]
        state.update((n, tok, last_ts))

    return stream.groupBy(entity).applyInPandasWithState(
        update, out_schema, state_schema, "append", "NoTimeout"
    )


def streaming_dedup(
    stream: DataFrame,
    keys: list[str] | None = None,
    ts: str = "ts",
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming exact dedup on ingestion: first arrival per key wins,
    re-deliveries inside the watermark are dropped, and state is
    EVICTED past the watermark (``dropDuplicatesWithinWatermark``) so
    it never grows unboundedly — the batch twin is
    ``operators.rows.remove_duplicates(keep='first')``. For text-keyed
    dedup pass a hash key upstream (``xxhash64(text)``) so state stores
    8 bytes per doc, not documents.
    """
    keys = keys or ["conv_id", "turn_idx"]
    return stream.withWatermark(ts, watermark).dropDuplicatesWithinWatermark(keys)


def streaming_loop_monitor(
    stream: DataFrame,
    entity: str = "conv_id",
    turn_idx: str = "turn_idx",
    ts: str = "ts",
    role: str = "role",
    text: str = "text",
    min_repeats: int = 3,
) -> DataFrame:
    """Streaming agent-loop monitor — the streaming twin of the batch
    ``operators.transcripts.detect_loops``: per conversation, the
    length of the CURRENT run of consecutive identical ``(role,
    text)`` turns, carried across micro-batches via
    ``applyInPandasWithState``, with ``has_loop`` raised the moment a
    run reaches ``min_repeats`` (a live stuck-agent alert, not an
    after-the-fact batch audit). ``max_run`` reports the longest run
    the conversation has EVER shown (across all micro-batches so far).

    State per conversation is three scalars (last turn signature,
    current run length, max run) — bounded, no row buffering.  Each
    micro-batch is processed vectorized (gaps-and-islands via
    shift/cumsum on the Arrow batch; the only Python is pandas column
    algebra).  Assumes per-conversation in-order arrival ACROSS
    micro-batches (log-shipping order); within a micro-batch rows are
    sorted by ``(ts, turn_idx)``.
    """
    import pandas as pd  # noqa: F401 (vectorized path)

    out_schema = (
        f"{entity} string, {turn_idx} int, run_len long, max_run long, "
        "has_loop boolean"
    )
    state_schema = "sig string, run long, mx long"

    def update(key, pdfs, state):
        sig, run, mx = state.get if state.exists else (None, 0, 0)
        for pdf in pdfs:
            pdf = pdf.sort_values([ts, turn_idx], kind="mergesort")
            cur = (
                pdf[role].fillna("") + "\x1f" + pdf[text].fillna("")
            ).reset_index(drop=True)
            prev = cur.shift()
            if sig is not None:
                prev.iloc[0] = sig
            new_run = (cur != prev)
            grp = new_run.cumsum()  # 0 = continuation of the carried run
            run_in_grp = grp.groupby(grp).cumcount() + 1
            runs = run_in_grp + (grp == 0) * run
            out = pdf[[entity, turn_idx]].reset_index(drop=True)
            out["run_len"] = runs.astype("int64")
            out["max_run"] = runs.cummax().clip(lower=mx).astype("int64")
            out["has_loop"] = runs >= int(min_repeats)
            yield out
            sig = cur.iloc[-1]
            run = int(runs.iloc[-1])
            mx = max(mx, int(runs.max()))
        state.update((sig, run, mx))

    return stream.groupBy(entity).applyInPandasWithState(
        update, out_schema, state_schema, "append", "NoTimeout"
    )


def streaming_neardup_ingest(
    stream: DataFrame,
    index_path: str,
    out_path: str,
    checkpoint: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.7,
    num_hashes: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
    seed: int = 42,
    hash_mode: str = "xxhash64",
):
    """Continuous-crawl near-dup gate: the streaming twin of
    ``dedup_against_index`` (operators/dedup.py).

    Each micro-batch (1) self-dedups via ``minhash_lsh_dedup``, (2)
    gates against the PERSISTED corpus signature index at
    ``index_path`` (signature-estimated Jaccard — corpus text is never
    re-read), then (3) appends survivors to ``out_path`` and ONLY the
    survivors' index rows to ``index_path`` — the index grows by
    exactly the accepted docs, never rewrites.  A missing/empty index
    bootstraps from the first batch.  Duplicates ACROSS batches are
    caught because batch N's survivors are indexed before batch N+1
    reads the index (foreachBatch micro-batches run sequentially per
    query).

    Exactly-once caveat (documented, inherent to foreachBatch): a
    batch retried after a failure between the two appends could
    re-append; production sinks make the writes idempotent
    (batchId-keyed subdirs, or Iceberg MERGE on ``id_col``) — the
    gate logic is unchanged.

    Returns the ``DataStreamWriter``; callers pick the trigger
    (``availableNow`` for backfill parity in tests, processing-time
    in deployment).
    """
    from feature_engineering_tk_spark.operators.dedup import (
        dedup_against_index,
        minhash_index,
        minhash_lsh_dedup,
    )

    mh = dict(
        num_hashes=num_hashes, bands=bands, shingle_n=shingle_n,
        seed=seed, hash_mode=hash_mode,
    )

    def _gate(batch_df: DataFrame, _batch_id: int) -> None:
        from pyspark.errors import AnalysisException

        spark = batch_df.sparkSession
        shard = minhash_lsh_dedup(
            batch_df, text_col=text_col, id_col=id_col, threshold=threshold, **mh
        )
        try:
            index = spark.read.parquet(index_path)
            have_index = len(index.take(1)) > 0
        except AnalysisException as e:
            # ONLY a genuinely absent index bootstraps; any other read
            # failure (transient FS error, corrupt footer) must fail the
            # batch so the streaming retry re-runs it — treating it as
            # "no index" would silently skip the dedup gate and append
            # duplicates to both sinks
            msg = str(e)
            if not ("PATH_NOT_FOUND" in msg or "Path does not exist" in msg
                    or "UNABLE_TO_INFER_SCHEMA" in msg):
                raise
            have_index = False
        if have_index:
            survivors, additions = dedup_against_index(
                shard, index, text_col=text_col, id_col=id_col,
                threshold=threshold, **mh,
            )
        else:
            survivors = shard
            additions = minhash_index(
                shard, text_col=text_col, id_col=id_col, **mh
            )
        # cache: survivors feed BOTH appends; recomputing would re-run
        # the whole LSH chain (and race the index append below)
        survivors = survivors.localCheckpoint(eager=True)
        survivors.write.mode("append").parquet(out_path)
        additions.write.mode("append").parquet(index_path)

    return (
        stream.writeStream.foreachBatch(_gate)
        .option("checkpointLocation", checkpoint)
        .outputMode("update")
    )


def streaming_bloom_gate(
    stream: DataFrame,
    bloom_path: str,
    out_path: str,
    checkpoint: str,
    quarantine_path: str | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 13,
    n_bits: int = 1 << 20,
    k: int = 5,
    salt: str = "v1",
    hash_mode: str = "xxhash64",
):
    """Continuous-ingest decontamination gate: the streaming twin of
    ``decontaminate_bloom`` (operators/membership.py).

    The benchmark's n-gram Bloom filter is built ONCE with
    ``bloom_filter_table`` and persisted at ``bloom_path``
    (aggregate-sized: ~n_bits/63 rows); each micro-batch probes it
    with the same row-local broadcast joins — no benchmark re-read
    per batch beyond the tiny word table, no state store, no shuffle
    of the batch.  Provably-clean docs (zero flagged grams — the
    Bloom no-false-negative guarantee makes False a PROOF) append to
    ``out_path``; flagged docs append to ``quarantine_path`` (when
    given) with their (n_grams, flagged_grams, flagged_share) audit
    columns for the exact-path re-check, instead of being silently
    dropped.

    The filter geometry (n, n_bits, k, salt, hash_mode) must match
    the persisted filter's build.  Returns the ``DataStreamWriter``;
    callers pick the trigger (``availableNow`` in tests).
    """
    from feature_engineering_tk_spark.operators.membership import (
        decontaminate_bloom_with_filter,
    )

    def _gate(batch_df: DataFrame, _batch_id: int) -> None:
        spark = batch_df.sparkSession
        bloom = spark.read.parquet(bloom_path)
        flagged = decontaminate_bloom_with_filter(
            batch_df, bloom, text_col=text_col, id_col=id_col, n=n,
            n_bits=n_bits, k=k, salt=salt, hash_mode=hash_mode,
        )
        joined = batch_df.join(flagged, id_col).localCheckpoint(eager=True)
        clean = joined.where(~F.col("contaminated")).drop(
            "n_grams", "flagged_grams", "flagged_share", "contaminated"
        )
        clean.write.mode("append").parquet(out_path)
        if quarantine_path is not None:
            joined.where(F.col("contaminated")).write.mode("append").parquet(
                quarantine_path
            )

    return (
        stream.writeStream.foreachBatch(_gate)
        .option("checkpointLocation", checkpoint)
        .outputMode("update")
    )

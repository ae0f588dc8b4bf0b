"""Streaming sessionization must agree with the batch sessionizer on
a drained (availableNow) stream."""

import os

import pytest
from pyspark.sql import functions as F

from feature_engineering_tk_spark.operators import window_features as W
from feature_engineering_tk_spark.streaming import sessions as SS


@pytest.fixture(scope="module")
def parquet_transcripts(spark, transcripts, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("stream_src") / "transcripts")
    transcripts.write.mode("overwrite").parquet(path)
    return path


def test_streaming_sessions_match_batch(spark, transcripts, parquet_transcripts):
    stream = SS.read_transcript_stream(spark, parquet_transcripts)
    assert stream.isStreaming
    agg = SS.streaming_session_stats(stream, gap="30 minutes")
    SS.run_available_now(agg, "stream_sessions")
    got = spark.sql(
        "SELECT conv_id, count(*) AS n_sessions, sum(n_turns) AS n_turns "
        "FROM stream_sessions GROUP BY conv_id"
    ).toPandas().set_index("conv_id")

    batch = (
        W.session_bounds(W.sessionize(transcripts, gap_seconds=1800.0))
        .groupBy("conv_id")
        .agg(F.count(F.lit(1)).alias("n_sessions"), F.sum("n_turns").alias("n_turns"))
        .toPandas()
        .set_index("conv_id")
    )
    assert len(got) == len(batch)
    joined = got.join(batch, lsuffix="_s", rsuffix="_b")
    assert (joined["n_turns_s"] == joined["n_turns_b"]).all()
    # session boundaries: streaming session_window closes at gap >= gap;
    # batch sessionizer starts new at gap > gap — ties don't occur in the
    # generator (continuous gaps), so counts must agree exactly
    assert (joined["n_sessions_s"] == joined["n_sessions_b"]).all()


def test_streaming_turn_rate_total(spark, transcripts, parquet_transcripts):
    stream = SS.read_transcript_stream(spark, parquet_transcripts)
    agg = SS.streaming_turn_rate(stream, window="6 hours")
    SS.run_available_now(agg, "stream_rate")
    total = spark.sql("SELECT sum(n_turns) AS n FROM stream_rate").first()["n"]
    assert total == transcripts.count()


def test_streaming_running_features_stateful(spark, transcripts, tmp_path):
    """applyInPandasWithState carries per-conversation state across
    micro-batches: final running totals equal the batch answer even when
    the source is drained one file at a time."""
    from pyspark.sql import functions as F

    from feature_engineering_tk_spark.streaming.sessions import (
        read_transcript_stream,
        streaming_running_features,
    )

    src = str(tmp_path / "src")
    # several files => several micro-batches with maxFilesPerTrigger=1
    transcripts.repartition(4).write.mode("overwrite").parquet(src)

    stream = read_transcript_stream(spark, src, max_files=1)
    feat = streaming_running_features(stream)
    q = (
        feat.writeStream.format("memory")
        .queryName("running_feat")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    got = spark.table("running_feat")
    assert got.count() == transcripts.count()  # one output row per turn

    # final per-conversation state equals the batch aggregate
    final = (
        got.groupBy("conv_id")
        .agg(
            F.max("running_turns").alias("n"),
            F.max("tokens_cum").alias("tok"),
        )
        .collect()
    )
    expected = {
        r["conv_id"]: (r["n"], r["tok"])
        for r in transcripts.groupBy("conv_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("tokens").alias("tok"))
        .collect()
    }
    for r in final:
        assert (r["n"], r["tok"]) == expected[r["conv_id"]], r["conv_id"]


def test_streaming_dedup_drops_redeliveries(spark, transcripts, tmp_path):
    """Re-delivered rows (at-least-once source) collapse to one row per
    (conv_id, turn_idx); result matches batch remove_duplicates."""
    path = str(tmp_path / "dup_src")
    dup = transcripts.union(transcripts.limit(500))  # re-deliver a slice
    dup.write.mode("overwrite").parquet(path)

    stream = SS.read_transcript_stream(spark, path)
    deduped = SS.streaming_dedup(stream, keys=["conv_id", "turn_idx"])
    SS.run_available_now(deduped, "stream_dedup", output_mode="append")
    n_stream = spark.table("stream_dedup").count()
    n_batch = transcripts.select("conv_id", "turn_idx").distinct().count()
    assert n_stream == n_batch


def test_streaming_quality_gates_stateless(spark, tmp_path):
    """The corpus-quality operators (gopher_rules, clean_lines,
    normalize_unicode) are row-local/stateless, so the SAME call works
    unchanged on a readStream — drained availableNow output must match
    the batch run row-for-row."""
    import pandas as pd

    from feature_engineering_tk_spark.functions.cleaning import (
        clean_lines,
        gopher_rules,
    )

    src = str(tmp_path / "docs_src")
    batch_df = spark.createDataFrame(
        [
            (0, "This has plenty of words and ends with punctuation.\nshort.\n"
                "the cat sat and that was fine to be of note with more words here."),
            (1, "- a\n- b"),
            (2, None),
        ],
        "doc_id long, text string",
    )
    batch_df.write.mode("overwrite").parquet(src)

    def gate(df):
        out = clean_lines(df, "text", min_words=5)
        return gopher_rules(out, "clean_text", min_words=5).select(
            "doc_id", "n_lines_kept", "n_words", "gopher_pass"
        )

    stream = spark.readStream.schema("doc_id long, text string").parquet(src)
    assert stream.isStreaming
    q = (
        gate(stream)
        .writeStream.format("memory")
        .queryName("quality_gate")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM quality_gate").toPandas()
    exp = gate(spark.read.parquet(src)).toPandas()
    got = got.sort_values("doc_id").reset_index(drop=True)
    exp = exp.sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp)
    assert bool(got.loc[got.doc_id == 0, "gopher_pass"].iloc[0]) is True


def test_streaming_psi_bin_coding(spark, tmp_path):
    """Drift monitoring in production is a STREAM: edges fitted once
    on the reference batch, bin coding applied statelessly to the
    stream, per-bin counts from a streaming aggregate. The drained
    counts must equal the batch coding exactly."""
    import numpy as np

    from feature_engineering_tk_spark.analysis.drift import bin_code, reference_edges

    rng = np.random.default_rng(21)
    src = str(tmp_path / "cur_src")
    ref = spark.createDataFrame(
        [(float(v),) for v in rng.normal(0, 1, 1000)], "value double"
    )
    cur_rows = [(float(v),) for v in rng.normal(0.5, 1, 800)]
    spark.createDataFrame(cur_rows, "value double").write.mode("overwrite").parquet(src)

    edges = reference_edges(ref, "value", bins=10)
    from pyspark.sql import functions as F

    def counts(df):
        return df.where(F.col("value").isNotNull()).groupBy(
            bin_code(F.col("value"), edges).alias("bin")
        ).count()

    stream = spark.readStream.schema("value double").parquet(src)
    q = (
        counts(stream)
        .writeStream.format("memory")
        .queryName("psi_bins")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r["bin"]: r["count"] for r in spark.sql("SELECT * FROM psi_bins").collect()
    }
    exp = {r["bin"]: r["count"] for r in counts(spark.read.parquet(src)).collect()}
    assert got == exp
    assert sum(got.values()) == 800


def test_streaming_loop_monitor_crosses_batches(spark, tmp_path):
    """A run of identical turns that spans a micro-batch boundary is
    detected: state carries (signature, run length) across batches."""
    import datetime as dt

    from feature_engineering_tk_spark.operators.transcripts import detect_loops
    from feature_engineering_tk_spark.streaming.sessions import (
        read_transcript_stream,
        streaming_loop_monitor,
    )

    def turn(c, i, r, t):
        return (c, i, r, t, None, dt.datetime(2024, 1, 1, 0, 0, i))

    schema = (
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp"
    )
    first = spark.createDataFrame(
        [turn("a", 0, "user", "x"), turn("a", 1, "assistant", "b"),
         turn("a", 2, "assistant", "b")],
        schema,
    )
    second = spark.createDataFrame(
        [turn("a", 3, "assistant", "b"), turn("a", 4, "user", "y")], schema
    )
    src = str(tmp_path / "src")
    first.coalesce(1).write.mode("overwrite").parquet(src)
    second.coalesce(1).write.mode("append").parquet(src)

    stream = read_transcript_stream(spark, src, max_files=1)
    q = (
        streaming_loop_monitor(stream, min_repeats=3)
        .writeStream.format("memory")
        .queryName("loop_mon")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {r.turn_idx: r for r in spark.table("loop_mon").collect()}
    assert [got[i].run_len for i in range(5)] == [1, 1, 2, 3, 1]
    assert got[3].has_loop and not got[2].has_loop
    # parity with the batch auditor's longest-run count
    batch = detect_loops(first.unionByName(second), min_repeats=3).first()
    assert batch.max_consecutive_repeats == 3 and batch.has_loop


def test_streaming_neardup_ingest_gates_across_batches(spark, tmp_path):
    """Batch 1 self-dedups and bootstraps the index; batch 2's dup of a
    batch-1 doc is dropped via the persisted index, novel doc survives."""
    from pyspark.sql import functions as F

    src = str(tmp_path / "src")
    idx = str(tmp_path / "index")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    b1 = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog again and again"),
            (2, "pack my box with five dozen liquor jugs before the party"),
            (3, "the quick brown fox jumps over the lazy dog again and again"),
        ],
        "doc_id bigint, text string",
    )
    b1.coalesce(1).write.mode("append").parquet(src)

    def run_once():
        stream = spark.readStream.schema("doc_id bigint, text string").parquet(src)
        q = SS.streaming_neardup_ingest(
            stream, idx, out, ckpt, threshold=0.7
        ).trigger(availableNow=True).start()
        q.awaitTermination(120)

    run_once()
    got1 = {r["doc_id"] for r in spark.read.parquet(out).collect()}
    assert got1 == {1, 2}  # 3 was an in-batch exact dup of 1

    b2 = spark.createDataFrame(
        [
            (10, "the quick brown fox jumps over the lazy dog again and again"),
            (11, "a genuinely novel document with entirely fresh vocabulary here"),
        ],
        "doc_id bigint, text string",
    )
    b2.coalesce(1).write.mode("append").parquet(src)
    run_once()
    got2 = {r["doc_id"] for r in spark.read.parquet(out).collect()}
    assert got2 == {1, 2, 11}  # 10 caught by the persisted index
    # index grew by exactly the accepted docs
    assert {r["doc_id"] for r in spark.read.parquet(idx).collect()} == {1, 2, 11}


def test_streaming_loop_monitor_equals_batch_on_replay(spark, transcripts, tmp_path):
    """Full equivalence sweep (the sessions-test pattern): the 60-conv
    generated corpus replayed in TWO micro-batches split mid-
    conversation must leave the streaming monitor in exactly the
    batch auditor's state — per conversation, the max run ever seen
    and the has_loop verdict match detect_loops on the union."""
    from feature_engineering_tk_spark.operators.transcripts import detect_loops

    src = str(tmp_path / "loop_replay")
    # split mid-conversation: early turns ship in batch 1, the rest in
    # batch 2 (per-conversation in-order arrival, the monitor contract)
    transcripts.filter(F.col("turn_idx") < 4).coalesce(1).write.mode(
        "overwrite"
    ).parquet(src)
    transcripts.filter(F.col("turn_idx") >= 4).coalesce(1).write.mode(
        "append"
    ).parquet(src)

    stream = SS.read_transcript_stream(spark, src, max_files=1)
    q = (
        SS.streaming_loop_monitor(stream, min_repeats=2)
        .writeStream.format("memory")
        .queryName("loop_replay_mon")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    streamed = (
        spark.table("loop_replay_mon")
        .groupBy("conv_id")
        .agg(
            F.max("max_run").alias("max_run"),
            F.max(F.col("has_loop").cast("int")).alias("loop"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )
    batch = detect_loops(transcripts, min_repeats=2)
    joined = streamed.join(batch, "conv_id").collect()
    assert len(joined) == batch.count() == 60  # every conversation covered
    for r in joined:
        assert r["n_rows"] == r["n_turns"]  # one emitted row per turn
        assert r["max_run"] == r["max_consecutive_repeats"], r["conv_id"]
        assert bool(r["loop"]) == r["has_loop"], r["conv_id"]


def test_streaming_bloom_gate_matches_batch_path(spark, tmp_path):
    """The streaming gate over two micro-batches must make exactly the
    batch decontaminate_bloom decisions: clean docs land in out,
    contaminated docs in quarantine with audit columns, nothing
    silently dropped."""
    from pyspark.sql import functions as F

    from feature_engineering_tk_spark.operators.dedup import _shingles
    from feature_engineering_tk_spark.operators.membership import (
        bloom_filter_table,
        decontaminate_bloom,
    )

    src = str(tmp_path / "bloom_src")
    bloom_path = str(tmp_path / "bloom")
    out = str(tmp_path / "bloom_out")
    quarantine = str(tmp_path / "bloom_quarantine")
    ckpt = str(tmp_path / "bloom_ckpt")

    bench = spark.createDataFrame(
        [(100, "quick brown fox jumps over")], "doc_id bigint, text string"
    )
    bench_grams = bench.select(F.explode(_shingles(F.col("text"), 3)).alias("gram"))
    bloom_filter_table(bench_grams, "gram", n_bits=1 << 14, k=3).write.parquet(
        bloom_path
    )

    b1 = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),  # contaminated
            (2, "completely unrelated clean content here today"),
        ],
        "doc_id bigint, text string",
    )
    b2 = spark.createDataFrame(
        [
            (3, "more clean text with no benchmark overlap at all"),
            (4, "again the quick brown fox jumps over everything"),  # contaminated
        ],
        "doc_id bigint, text string",
    )

    def run_once():
        stream = spark.readStream.schema("doc_id bigint, text string").parquet(src)
        q = (
            SS.streaming_bloom_gate(
                stream, bloom_path, out, ckpt, quarantine_path=quarantine,
                n=3, n_bits=1 << 14, k=3,
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    b1.coalesce(1).write.mode("append").parquet(src)
    run_once()
    b2.coalesce(1).write.mode("append").parquet(src)
    run_once()

    clean_ids = {r["doc_id"] for r in spark.read.parquet(out).collect()}
    qrows = {r["doc_id"]: r for r in spark.read.parquet(quarantine).collect()}
    assert clean_ids == {2, 3}
    assert set(qrows) == {1, 4}
    # quarantine carries the audit columns for the exact-path re-check
    assert all(r["flagged_grams"] > 0 and r["contaminated"] for r in qrows.values())

    # decision-for-decision parity with the batch operator
    batch = {
        r["doc_id"]: r["contaminated"]
        for r in decontaminate_bloom(
            b1.unionByName(b2), bench, n=3, n_bits=1 << 14, k=3
        ).collect()
    }
    for did, contaminated in batch.items():
        assert (did in qrows) == contaminated
        assert (did in clean_ids) == (not contaminated)

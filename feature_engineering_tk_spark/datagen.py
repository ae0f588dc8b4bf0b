"""Deterministic synthetic transcript generator (FIXTURES.md §1).

Produces the engine's primary input: a multi-turn conversation /
agent-transcript table with schema

    conv_id:string, turn_idx:int32, role:string, text:string,
    tool:string(nullable), ts:timestamp

plus derived numeric columns so every reference transform has a column
to act on (latency_ms with nulls+infs, tokens right-skewed, score with
nulls, label imbalanced 0/1).

Design notes:
- Fully vectorized numpy generation, seeded ``default_rng`` — the same
  (seed, n_convs) always yields byte-identical tables on any host.
- Conversation lengths are heavy-tailed (Pareto) so a handful of hot
  ``conv_id`` partitions exist by construction — this is the skew the
  engine's salting / AQE handling must survive.
- Inter-turn gaps are a two-component mixture (seconds-scale chatter +
  occasional >30min jumps) to create gap-based session boundaries.
- ``ts`` strictly increases with ``turn_idx`` within a conversation;
  cross-conversation equal-``ts`` collisions occur naturally (as-of tie
  tests).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

TRANSCRIPT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), False),
        T.StructField("text", T.StringType(), False),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), False),
        T.StructField("latency_ms", T.DoubleType(), True),
        T.StructField("tokens", T.LongType(), False),
        T.StructField("score", T.DoubleType(), True),
        T.StructField("label", T.IntegerType(), False),
    ]
)

_VOCAB = np.array(
    "the a of to and in is it for on with as by at query plan scan join filter "
    "window table row column agg sort hash merge spark data batch stream key "
    "value fast slow small large check run test code tool call user reply "
    "error retry done ok".split()
)
_TOOLS = np.array(["search", "code", "browse", "calc", "files"])
_SESSION_GAP_S = 1800.0


def generate_transcripts_pandas(
    n_convs: int = 200,
    seed: int = 42,
    max_turns: int = 400,
    start: str = "2024-01-01",
) -> pd.DataFrame:
    """Vectorized deterministic transcript frame (pandas, driver-side).

    Used directly for tiny/unit scale; for bench scale go through
    :func:`generate_transcripts` which parallelizes conv chunks.
    """
    rng = np.random.default_rng(seed)

    # heavy-tailed conversation lengths: most 2-20 turns, few very long
    lengths = np.minimum((rng.pareto(1.1, n_convs) + 1.0) * 4.0, max_turns).astype(np.int64) + 2
    total = int(lengths.sum())
    starts = np.concatenate(([0], np.cumsum(lengths)[:-1]))
    conv_ord = np.repeat(np.arange(n_convs), lengths)
    turn_idx = (np.arange(total) - np.repeat(starts, lengths)).astype(np.int32)

    conv_id = np.char.add("c", np.char.zfill(conv_ord.astype(str), 8))

    # roles: alternate user/assistant; ~8% of assistant turns become tool turns
    role = np.where(turn_idx % 2 == 0, "user", "assistant").astype(object)
    tool_turn = (rng.random(total) < 0.08) & (role == "assistant")
    role[tool_turn] = "tool"

    # tool column: null unless a tool turn (~85%+ null overall)
    tool = np.full(total, None, dtype=object)
    tool[tool_turn] = rng.choice(_TOOLS, tool_turn.sum())

    # text: 3-40 seeded vocab tokens, whitespace/punct/case injection
    n_words = rng.integers(3, 41, total)
    words_flat = rng.choice(_VOCAB, int(n_words.sum()))
    bounds = np.concatenate(([0], np.cumsum(n_words)))
    texts = np.empty(total, dtype=object)
    joined = words_flat.astype(object)
    for i in range(total):  # driver-side generation only; not a Spark path
        texts[i] = " ".join(joined[bounds[i] : bounds[i + 1]])
    # deterministic dirt: leading/trailing space, punctuation, digits, caps
    dirt = rng.random(total)
    texts[dirt < 0.15] = np.char.add("  ", texts[dirt < 0.15].astype(str)).astype(object)
    texts[dirt > 0.85] = np.char.add(texts[dirt > 0.85].astype(str), "!! 42 ").astype(object)
    caps = (dirt > 0.45) & (dirt < 0.55)
    texts[caps] = np.char.upper(texts[caps].astype(str)).astype(object)

    # timestamps: per-conv start offset + mixture gaps, strictly increasing
    conv_start_s = rng.uniform(0, 30 * 86400, n_convs)
    gaps = rng.uniform(1.0, 120.0, total)
    jump = rng.random(total) < 0.06
    gaps[jump] += rng.uniform(_SESSION_GAP_S + 60, 4 * _SESSION_GAP_S, int(jump.sum()))
    gaps[np.concatenate(([0], np.cumsum(lengths)[:-1]))] = 0.0  # first turn at conv start
    cum = np.cumsum(gaps)
    cum = cum - np.repeat(cum[starts], lengths)
    ts_s = np.repeat(conv_start_s, lengths) + cum
    ts = pd.Timestamp(start) + pd.to_timedelta(np.round(ts_s, 3), unit="s")

    latency = np.round(rng.lognormal(4.0, 1.0, total), 3)
    latency[rng.random(total) < 0.05] = np.nan
    latency[rng.random(total) < 0.002] = np.inf

    tokens = np.maximum(1, rng.lognormal(3.0, 1.2, total)).astype(np.int64)
    score = np.round(rng.random(total), 6)
    score[rng.random(total) < 0.10] = np.nan
    label = (rng.random(total) < 0.3).astype(np.int32)

    return pd.DataFrame(
        {
            "conv_id": conv_id,
            "turn_idx": turn_idx,
            "role": role,
            "text": texts,
            "tool": tool,
            "ts": ts,
            "latency_ms": latency,
            "tokens": tokens,
            "score": score,
            "label": label,
        }
    )


def generate_transcripts(
    spark: SparkSession,
    n_convs: int = 200,
    seed: int = 42,
    max_turns: int = 400,
    chunk_convs: int = 5000,
) -> DataFrame:
    """Distributed-friendly generation: chunks of conversations are
    generated independently (each chunk gets a derived seed) so large
    tables never materialize on the driver.

    At real 10^12-turn scale the same function runs as ``mapInPandas``
    over a chunk-index DataFrame; at sandbox scale driver chunking is
    sufficient and keeps determinism trivially auditable.
    """
    if n_convs <= chunk_convs:
        pdf = generate_transcripts_pandas(n_convs, seed, max_turns)
        return spark.createDataFrame(pdf, schema=TRANSCRIPT_SCHEMA)

    n_chunks = (n_convs + chunk_convs - 1) // chunk_convs
    chunks = spark.range(n_chunks).toDF("chunk")

    def gen(batches):
        for pdf in batches:
            for chunk in pdf["chunk"]:
                k = int(chunk)
                n = min(chunk_convs, n_convs - k * chunk_convs)
                out = generate_transcripts_pandas(n, seed + k * 1_000_003, max_turns)
                # re-prefix conv ids so chunks don't collide
                out["conv_id"] = out["conv_id"].str.replace(
                    "c", f"c{k:04d}_", n=1, regex=False
                )
                yield out

    return chunks.mapInPandas(gen, schema=TRANSCRIPT_SCHEMA)


def write_transcripts(
    spark: SparkSession,
    path: str,
    n_convs: int = 200,
    seed: int = 42,
    max_turns: int = 400,
) -> None:
    """Write the transcript table as date-partitioned parquet — the
    Iceberg-compatible layout (``days(ts)`` partitioning) so partition
    pruning on ``ts`` filters works; an Iceberg catalog swaps in by
    changing only the writer format."""
    from pyspark.sql import functions as F

    df = generate_transcripts(spark, n_convs, seed, max_turns)
    (
        df.withColumn("ds", F.to_date("ts"))
        .repartition("ds")
        .write.mode("overwrite")
        .partitionBy("ds")
        .parquet(path)
    )

"""Chat-JSONL transcript ingest — the interchange format of LLM
training corpora (one conversation per line, ``messages`` array).

The reference has no file sources at all (callers hand pandas frames
to ``base.py:28-39``); the engine's canonical turn table otherwise
comes from Iceberg/parquet (``sources/tables.py``). Real transcript
corpora, however, arrive as chat JSONL::

    {"conv_id": "c1", "messages": [{"role": "user", "content": "hi"},
                                   {"role": "assistant", "content": "hello"}]}

This module parses that shape (plus optional per-message ``tool``,
``ts``, ``turn_idx`` fields) into the canonical turn schema
``(conv_id, turn_idx, role, text, tool, ts)`` — the exact inverse of
``operators/transcripts.sft_export``, so export → re-ingest is
lossless per turn (per-turn text equality under stable turn ordering,
the north-rule invariant; oracled end-to-end by the
``jsonl_roundtrip`` entry in ``__spark_entry__.py``).

Scale shape: ``from_json`` + ``posexplode`` + projections — pure
whole-stage-codegen JVM expressions, file-parallel, ZERO shuffles and
ZERO Python in the hot path. A 100 TB JSONL drop parses at scan speed
with line-level error routing (``on_error='skip'`` counts nothing and
drops nothing silently — pair it with ``parse_rejects`` to audit;
``'fail'`` raises inside the scan on the first bad line).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: per-message schema: sft_export emits (role, content); richer
#: corpora may carry tool/ts/turn_idx per message — all optional,
#: from_json fills absent fields with NULL
MESSAGE_SCHEMA = T.StructType(
    [
        T.StructField("role", T.StringType()),
        T.StructField("content", T.StringType()),
        T.StructField("tool", T.StringType()),
        T.StructField("ts", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
    ]
)

CHAT_LINE_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("messages", T.ArrayType(MESSAGE_SCHEMA)),
    ]
)


def _parsed(col: Column) -> Column:
    return F.from_json(col, CHAT_LINE_SCHEMA)


def parse_chat_jsonl(
    df: DataFrame,
    col: str = "value",
    on_error: str = "skip",
) -> DataFrame:
    """Parse a string column of chat-JSONL lines into canonical turn
    rows ``(conv_id, turn_idx, role, text, tool, ts)``.

    - ``turn_idx`` is the message's explicit ``turn_idx`` when
      present, else its 0-based position in the ``messages`` array
      (sft_export writes messages in turn order, so position == index
      for dense transcripts).
    - ``ts`` strings are cast to timestamp (NULL when absent/invalid).
    - ``on_error='skip'`` drops lines that are not valid JSON or have
      no ``messages`` array; ``'fail'`` raises on the first such line
      (inside the scan, via ``raise_error`` — no driver round-trip).
    """
    if on_error not in ("skip", "fail"):
        raise ValueError(f"on_error must be 'skip' or 'fail', got {on_error!r}")
    p = _parsed(F.col(col))
    ex = df.select(
        F.col(col).alias("_line"),
        p["conv_id"].alias("conv_id"),
        p["messages"].alias("_msgs"),
    )
    if on_error == "fail":
        ex = ex.withColumn(
            "_msgs",
            F.when(
                F.col("_msgs").isNull(),
                F.raise_error(
                    F.concat(
                        F.lit("unparseable chat JSONL line: "),
                        F.substring(F.col("_line"), 1, 200),
                    )
                ),
            ).otherwise(F.col("_msgs")),
        )
    else:
        ex = ex.where(F.col("_msgs").isNotNull())
    turns = ex.select("conv_id", F.posexplode("_msgs").alias("_pos", "_m"))
    return turns.select(
        "conv_id",
        F.coalesce(F.col("_m.turn_idx"), F.col("_pos")).cast("int").alias("turn_idx"),
        F.col("_m.role").alias("role"),
        F.col("_m.content").alias("text"),
        F.col("_m.tool").alias("tool"),
        F.col("_m.ts").cast("timestamp").alias("ts"),
    )


def parse_rejects(df: DataFrame, col: str = "value") -> DataFrame:
    """The lines ``parse_chat_jsonl(on_error='skip')`` would drop —
    route these to a quarantine sink so a skip is never silent."""
    p = _parsed(F.col(col))
    return df.where(p.isNull() | p["messages"].isNull()).select(
        F.col(col).alias("line")
    )


def read_transcripts_jsonl(
    spark: SparkSession,
    path: str,
    on_error: str = "skip",
) -> DataFrame:
    """Read a chat-JSONL file/dir into canonical turn rows.

    ``spark.read.text`` splits large files on line boundaries across
    tasks, so one multi-TB JSONL shard still parses in parallel."""
    return parse_chat_jsonl(spark.read.text(path), col="value", on_error=on_error)


def read_transcripts_jsonl_stream(
    spark: SparkSession,
    path: str,
    on_error: str = "skip",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Structured-Streaming twin of ``read_transcripts_jsonl``: watch a
    directory for arriving chat-JSONL shards and emit canonical turn
    rows. The parse is stateless (row-local), so it composes with the
    engine's watermarked session/window operators downstream and the
    drained ``availableNow`` output matches the batch reader exactly."""
    reader = spark.readStream
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    lines = reader.format("text").load(path)
    return parse_chat_jsonl(lines, col="value", on_error=on_error)


def write_transcripts_jsonl(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
) -> None:
    """Export canonical turn rows as chat JSONL (sft_export's
    byte-deterministic assembly) — the round-trip partner of
    ``read_transcripts_jsonl``."""
    from feature_engineering_tk_spark.operators.transcripts import sft_export

    sft_export(df).select("json_line").write.mode(mode).text(path)

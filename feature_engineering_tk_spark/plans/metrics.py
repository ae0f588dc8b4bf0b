"""Per-stage metrics: row counts, entity-skew ratio, output bytes.

The north rule requires per-partition lineage and metrics (rows, skew
ratio, shuffle bytes) persisted per stage. ``stage_snapshot`` /
``stage_delta`` read TRUE per-Spark-stage shuffle read/write bytes,
input/output bytes and task counts straight from the JVM
``AppStatusStore`` (no UI, REST endpoint, or listener JAR needed —
identical on ``local[*]`` and a real cluster master); ``entity_skew``
measures the shuffle-hash distribution a key will see; ``dir_bytes``
/ ``partition_stats`` record filesystem lineage of materialized
stages.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def entity_skew(df: DataFrame, key: str = "conv_id", buckets: int = 256) -> dict:
    """Skew ratio of the shuffle-hash distribution for ``key``:
    max/mean rows per hash bucket (1.0 = perfectly even). This is the
    distribution a ``Window.partitionBy(key)`` or ``groupBy(key)``
    shuffle will see. One cheap aggregate job."""
    counts = (
        df.groupBy(F.pmod(F.hash(F.col(key)), F.lit(buckets)).alias("_b"))
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(
            F.max("n").alias("mx"),
            F.avg("n").alias("mean"),
            F.sum("n").alias("total"),
            F.count(F.lit(1)).alias("nonempty_buckets"),
        )
        .first()
    )
    if counts["total"] is None or counts["total"] == 0:
        return {"skew_ratio": 1.0, "rows": 0, "buckets": buckets}
    return {
        "skew_ratio": round(counts["mx"] / counts["mean"], 3),
        "max_bucket_rows": int(counts["mx"]),
        "rows": int(counts["total"]),
        "buckets": buckets,
        "nonempty_buckets": int(counts["nonempty_buckets"]),
    }


def hot_entities(df: DataFrame, key: str = "conv_id", top: int = 10) -> list[dict]:
    """The heaviest entities (e.g. 10^4-turn conversations) — drives
    the salting factor choice for salted aggregation."""
    rows = (
        df.groupBy(key)
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc())
        .limit(top)
        .collect()
    )
    return [{"entity": r[key], "rows": int(r["n"])} for r in rows]


def dir_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            try:
                total += os.path.getsize(os.path.join(root, f))
            except OSError:
                pass
    return total


def partition_stats(path: str, partition_col: str = "ds") -> list[dict]:
    """Per-Iceberg-partition lineage record for a materialized stage:
    partition value, file count, bytes."""
    out = []
    if not os.path.isdir(path):
        return out
    for name in sorted(os.listdir(path)):
        full = os.path.join(path, name)
        if os.path.isdir(full) and name.startswith(f"{partition_col}="):
            files = [f for f in os.listdir(full) if f.endswith(".parquet")]
            out.append(
                {
                    "partition": name.split("=", 1)[1],
                    "files": len(files),
                    "bytes": dir_bytes(full),
                }
            )
    return out


def stage_snapshot(spark) -> dict[int, dict]:
    """Per-Spark-stage execution metrics (shuffle read/write bytes,
    input/output bytes, task counts) straight from the JVM
    ``AppStatusStore`` — no UI or REST endpoint needed, works the same
    on ``local[*]`` and a real cluster master."""
    store = spark._jsc.sc().statusStore()
    gw = spark.sparkContext._gateway
    stages = store.stageList(
        gw.jvm.java.util.ArrayList(),
        False,
        False,
        gw.new_array(gw.jvm.double, 0),
        gw.jvm.java.util.ArrayList(),
    )
    out: dict[int, dict] = {}
    it = stages.iterator()
    while it.hasNext():
        st = it.next()
        out[int(st.stageId())] = {
            "shuffle_write_bytes": int(st.shuffleWriteBytes()),
            "shuffle_read_bytes": int(st.shuffleReadBytes()),
            "input_bytes": int(st.inputBytes()),
            "output_bytes": int(st.outputBytes()),
            "tasks": int(st.numCompleteTasks()),
        }
    return out


def stage_delta(before: dict[int, dict], after: dict[int, dict]) -> dict:
    """Aggregate metrics of the Spark stages that ran between two
    :func:`stage_snapshot` calls — what one pipeline stage actually
    shuffled/read, for the lineage journal."""
    keys = ("shuffle_write_bytes", "shuffle_read_bytes", "input_bytes", "output_bytes", "tasks")
    agg = dict.fromkeys(keys, 0)
    n_stages = 0
    for sid, m in after.items():
        prev = before.get(sid, dict.fromkeys(keys, 0))
        diff = {k: m[k] - prev.get(k, 0) for k in keys}
        if any(diff.values()):
            n_stages += 1
            for k in keys:
                agg[k] += max(diff[k], 0)
    agg["spark_stages"] = n_stages
    return agg

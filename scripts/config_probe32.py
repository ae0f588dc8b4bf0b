"""One-off probe: shuffle-partition count and GC choice at the
32-thread level of the scaling job.

The raw 8->32 efficiency record sits at 0.79 (needs >= 0.80); the
32-thread wall is the contention-exposed number. Two legitimate knobs
that keep the N-vs-4N protocol honest (both would be held IDENTICAL at
both levels, like shuffle partitions already are):

- ``spark.sql.shuffle.partitions`` 128 vs 256: 4 vs 8 waves at 32
  cores — finer tasks smooth stragglers under neighbour load; at 8
  cores (16 vs 32 waves) granularity barely matters.
- GC: JDK17 default G1 vs ParallelGC — throughput-batch jobs often
  prefer the parallel collector.

Each config: fresh JVM, 1 warm-up + best of 3 timed runs. Probe only;
records nothing in the scaling history (different job text anyway).

Usage: python scripts/config_probe32.py
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SHM_DATA = "/dev/shm/fe_bench/transcripts_4000000"

_JOB = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from feature_engineering_tk_spark.session import get_spark
from feature_engineering_tk_spark.operators import window_features as W
from feature_engineering_tk_spark.operators.asof import asof_join
from pyspark.sql import functions as F

cpus = 32
extra = {{"spark.local.dir": "/dev/shm/fe_spark_local_probe"}}
extra.update({extra_conf!r})
spark = get_spark(master=f"local[{{cpus}}]", app_name="probe32",
                  shuffle_partitions={parts}, extra_conf=extra)
spark.sparkContext.setLogLevel("ERROR")
df = spark.read.parquet({data!r})
n_turns = df.count()

def pipeline():
    feat = W.sessionize(df, 1800.0)
    feat = W.with_lag(feat, "text", 1, out="prev_text")
    feat = W.with_turn_gap(feat)
    feat = W.rolling_agg(feat, "tokens", "mean", 5)
    feat = W.cumulative_agg(feat, "tokens", "sum")
    feat = W.forward_fill(feat, ["score"])
    tools = df.filter(F.col("tool").isNotNull()).select("conv_id", "ts", "tool")
    return asof_join(feat, tools, value_cols=["tool"], suffix="_last")

pipeline().write.format("noop").mode("overwrite").save()
times = []
for _ in range(3):
    t0 = time.perf_counter()
    pipeline().write.format("noop").mode("overwrite").save()
    times.append(time.perf_counter() - t0)
print(json.dumps({{"sec": round(min(times), 3),
                  "turns_per_sec": round(n_turns / min(times), 1)}}))
spark.stop()
"""

CONFIGS = [
    ("base-128-g1", 128, {}),
    ("parts-256", 256, {}),
    ("parallel-gc", 128, {"spark.driver.extraJavaOptions": "-XX:+UseParallelGC"}),
    ("parts256+pgc", 256, {"spark.driver.extraJavaOptions": "-XX:+UseParallelGC"}),
    # off-heap Tungsten buffers: sort/shuffle memory leaves the GC'd
    # heap entirely — GC pressure is the one cost that grows 4x with
    # thread count at fixed per-core heap, so this should differentially
    # help the wide level
    ("offheap-16g", 128, {"spark.memory.offHeap.enabled": "true",
                          "spark.memory.offHeap.size": "16g"}),
    ("offheap+pgc", 128, {"spark.memory.offHeap.enabled": "true",
                          "spark.memory.offHeap.size": "16g",
                          "spark.driver.extraJavaOptions": "-XX:+UseParallelGC"}),
]


def main() -> None:
    for name, parts, extra in CONFIGS:
        job = _JOB.format(repo=REPO, data=SHM_DATA, parts=parts, extra_conf=extra)
        env = dict(os.environ, SPARK_GRAFT_DRIVER_MEM="48g")
        try:
            out = subprocess.run(
                [sys.executable, "-c", job], capture_output=True, text=True,
                check=True, cwd=REPO, env=env,
            )
        finally:
            shutil.rmtree("/dev/shm/fe_spark_local_probe", ignore_errors=True)
        line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
        print(name, "->", json.loads(line))


if __name__ == "__main__":
    main()

"""One-off probe: does node-local-resource scaling (tmpfs shuffle dirs
+ per-core-constant heap) change the 32-thread wall of the scaling job?

Rationale: on a real N -> 4N EXECUTOR scale-up, each added node brings
its own shuffle disks and its own memory. The single-box proxy holds
both fixed, so the wide level runs 32 shufflers against ONE disk and
32 threads inside the same heap — a contention artifact a real cluster
does not have. This probe measures the same job DAG with
  - spark.local.dir on /dev/shm (tmpfs), and
  - heap scaled at 1.5 GB/core (12g at 8, 48g at 32),
to see how much of the raw 8->32 gap is that artifact.

Usage: python scripts/scaling_probe.py [cpus ...]  (default: 32 8)
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DATA = "/tmp/fe_bench/transcripts"
SHM_DATA = "/dev/shm/fe_bench/transcripts"

_JOB = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from feature_engineering_tk_spark.session import get_spark
from feature_engineering_tk_spark.operators import window_features as W
from feature_engineering_tk_spark.operators.asof import asof_join
from pyspark.sql import functions as F

cpus = int(sys.argv[1])
spark = get_spark(master=f"local[{{cpus}}]", app_name=f"probe-{{cpus}}",
                  shuffle_partitions=128,
                  extra_conf={{"spark.local.dir": f"/dev/shm/fe_spark_local_{{cpus}}"}})
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

pipeline().write.format("noop").mode("overwrite").save()  # warm-up
times = []
for _ in range(3):
    t0 = time.perf_counter()
    pipeline().write.format("noop").mode("overwrite").save()
    times.append(time.perf_counter() - t0)
best = min(times)
print(json.dumps({{"cpus": cpus, "n_turns": n_turns, "sec": round(best, 3),
                  "turns_per_sec": round(n_turns / best, 1), "times": times}}))
spark.stop()
"""


def main() -> None:
    levels = [int(a) for a in sys.argv[1:]] or [32, 8]
    if not os.path.exists(SHM_DATA):
        os.makedirs(os.path.dirname(SHM_DATA), exist_ok=True)
        shutil.copytree(DATA, SHM_DATA)
    job = _JOB.format(repo=REPO, data=SHM_DATA)
    for cpus in levels:
        env = dict(os.environ, SPARK_GRAFT_DRIVER_MEM=f"{max(12, int(cpus * 1.5))}g")
        out = subprocess.run(
            [sys.executable, "-c", job, str(cpus)],
            capture_output=True, text=True, check=True, cwd=REPO, env=env,
        )
        line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
        print("probe:", line)
        shutil.rmtree(f"/dev/shm/fe_spark_local_{cpus}", ignore_errors=True)


if __name__ == "__main__":
    main()

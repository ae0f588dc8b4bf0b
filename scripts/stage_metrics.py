"""Stage-level evidence for the scaling job: per-stage wall, CPU, GC,
shuffle bytes from a Spark event log — the tool that located the
union-tag as-of join's second 12.1 GB exchange (see asof_join_packed).

Runs ONE warm-up + ONE timed pass of the benchmark pipeline at
local[32] with event logging, then prints a per-stage table. Keep runs
of this off any window where scaling_bench.py attempts are recording —
it competes for the same cores.

Usage: SPARK_GRAFT_DRIVER_MEM=48g python scripts/stage_metrics.py \
           [/dev/shm/fe_bench/transcripts_4000000]
"""

from __future__ import annotations

import glob
import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_JOB = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from feature_engineering_tk_spark.session import get_spark
from feature_engineering_tk_spark.operators import window_features as W
from feature_engineering_tk_spark.operators.asof import asof_join_packed
from pyspark.sql import functions as F

spark = get_spark(master="local[32]", app_name="stage-metrics",
                  shuffle_partitions=128,
                  extra_conf={{"spark.local.dir": "/dev/shm/fe_spark_local_diag",
                              "spark.eventLog.enabled": "true",
                              "spark.eventLog.dir": {evdir!r}}})
spark.sparkContext.setLogLevel("ERROR")
df = spark.read.parquet({data!r})
df.count()

def pipeline():
    feat = W.sessionize(df, 1800.0)
    feat = W.with_lag(feat, "text", 1, out="prev_text")
    feat = W.with_turn_gap(feat)
    feat = W.rolling_agg(feat, "tokens", "mean", 5)
    feat = W.cumulative_agg(feat, "tokens", "sum")
    feat = W.forward_fill(feat, ["score"])
    tools = df.filter(F.col("tool").isNotNull()).select("conv_id", "ts", "tool")
    return asof_join_packed(feat, tools, value_cols=["tool"], suffix="_last")

pipeline().write.format("noop").mode("overwrite").save()  # warm-up
t0 = time.perf_counter()
pipeline().write.format("noop").mode("overwrite").save()
print("timed wall", round(time.perf_counter() - t0, 2))
print("APP", spark.sparkContext.applicationId)
spark.stop()
"""


def parse_events(path: str) -> None:
    stages, tasks = [], {}
    for ln in open(path):
        try:
            ev = json.loads(ln)
        except json.JSONDecodeError:
            continue
        e = ev.get("Event")
        if e == "SparkListenerStageCompleted":
            si = ev["Stage Info"]
            sub, comp = si.get("Submission Time"), si.get("Completion Time")
            stages.append((si["Stage ID"], si["Number of Tasks"],
                           round((comp - sub) / 1000.0, 2) if sub and comp else None))
        elif e == "SparkListenerTaskEnd":
            m = ev.get("Task Metrics") or {}
            d = tasks.setdefault(ev["Stage ID"],
                                 dict(run=0, gc=0, cpu=0, srd=0, swr=0, spill=0))
            d["run"] += m.get("Executor Run Time", 0)
            d["gc"] += m.get("JVM GC Time", 0)
            d["cpu"] += m.get("Executor CPU Time", 0) // 1_000_000
            sr = m.get("Shuffle Read Metrics") or {}
            d["srd"] += sr.get("Local Bytes Read", 0) + sr.get("Remote Bytes Read", 0)
            d["swr"] += (m.get("Shuffle Write Metrics") or {}).get("Shuffle Bytes Written", 0)
            d["spill"] += m.get("Disk Bytes Spilled", 0)
    for sid, ntasks, wall in sorted(stages):
        d = tasks.get(sid, {})
        print(f"stage {sid:3d} tasks={ntasks:3d} wall={wall}s "
              f"cpu={d.get('cpu', 0) // 1000}s gc={d.get('gc', 0) // 1000}s "
              f"srd={d.get('srd', 0) / 1e9:.1f}G swr={d.get('swr', 0) / 1e9:.1f}G "
              f"spill={d.get('spill', 0) / 1e9:.1f}G")


def main() -> None:
    data = sys.argv[1] if len(sys.argv) > 1 else "/dev/shm/fe_bench/transcripts_4000000"
    evdir = tempfile.mkdtemp(prefix="spark-events-")
    job = _JOB.format(repo=REPO, data=data, evdir=evdir)
    env = dict(os.environ)
    env.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")
    out = subprocess.run([sys.executable, "-c", job], capture_output=True,
                         text=True, check=True, cwd=REPO, env=env)
    import shutil

    shutil.rmtree("/dev/shm/fe_spark_local_diag", ignore_errors=True)
    app = [l.split()[-1] for l in out.stdout.splitlines() if l.startswith("APP")][0]
    print([l for l in out.stdout.splitlines() if l.startswith("timed")][0])
    logdir = glob.glob(f"{evdir}/*{app}*")[0]
    zst = glob.glob(f"{logdir}/events*zstd")
    if zst:
        plain = zst[0][:-5] + ".json"
        subprocess.run(["zstd", "-d", "-f", "-o", plain, zst[0]], check=True,
                       capture_output=True)
        parse_events(plain)
    else:
        parse_events(glob.glob(f"{logdir}/events*")[0])


if __name__ == "__main__":
    main()

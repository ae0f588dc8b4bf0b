"""Wide-level (local[32]) config probe for the scaling criterion job.

The 8->32 efficiency gap lives almost entirely at the WIDE level: the
narrow level is compute-bound and already near its floor, so raising
the ratio honestly means making the local[32] wall genuinely faster.
This probe A/Bs candidate configs at cpus=32 only, INTERLEAVED
round-robin so shared-host contention bursts hit every config alike,
and reports the per-config min over all reps (contention only ever
slows a run).

Candidates target the wide level's suspected costs:
- GC: 4x the allocation rate through the same collector (pgc, heap)
- driver-serial AQE re-planning between stages (aqe_off)
- last-wave task imbalance: 128 partitions / 32 cores = 4 waves (sp256)

Results append to BENCH/wide_probe.jsonl; nothing here touches the
criterion attempt history (different job texts / different purpose).
A winning config only enters the protocol if it is applied to BOTH
levels and documented in scaling_bench.py.

Usage: python scripts/wide_probe.py [reps] [variant ...]
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SHM_DATA = "/dev/shm/fe_bench/transcripts"

_JOB = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from feature_engineering_tk_spark.session import get_spark
from feature_engineering_tk_spark.operators import window_features as W
from feature_engineering_tk_spark.operators.asof import asof_join
from pyspark.sql import functions as F

cpus = int(sys.argv[1])
extra = {{"spark.local.dir": f"/dev/shm/fe_spark_probe_{{cpus}}"}}
extra.update({extra_conf!r})
jvm = "-XX:ActiveProcessorCount=" + str(cpus) + " " + {jvm_extra!r}
prev = extra.get("spark.driver.extraJavaOptions", "")
extra["spark.driver.extraJavaOptions"] = (prev + " " + jvm).strip()
spark = get_spark(master=f"local[{{cpus}}]", app_name=f"probe-{{cpus}}",
                  shuffle_partitions={shuffle_partitions}, extra_conf=extra)
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
for _ in range(2):
    t0 = time.perf_counter()
    pipeline().write.format("noop").mode("overwrite").save()
    times.append(time.perf_counter() - t0)
best = min(times)
print(json.dumps({{"cpus": cpus, "n_turns": n_turns, "sec": round(best, 3),
                  "turns_per_sec": round(n_turns / best, 1)}}))
spark.stop()
"""

# (extra_conf, jvm_extra, shuffle_partitions, mem_per_core_gb)
VARIANTS: dict[str, tuple[dict, str, int, float]] = {
    "base": ({}, "", 128, 1.5),
    "pgc": ({}, "-XX:+UseParallelGC", 128, 1.5),
    "heap2.5": ({}, "", 128, 2.5),
    "pgc-heap2.5": ({}, "-XX:+UseParallelGC", 128, 2.5),
    "aqe_off": ({"spark.sql.adaptive.enabled": "false"}, "", 128, 1.5),
    "sp256": ({}, "", 256, 1.5),
    "sp64": ({}, "", 64, 1.5),
}


def run(variant: str, cpus: int = 32) -> dict:
    extra, jvm_extra, sp, gb_core = VARIANTS[variant]
    job = _JOB.format(repo=REPO, data=SHM_DATA, extra_conf=extra,
                      jvm_extra=jvm_extra, shuffle_partitions=sp)
    env = dict(os.environ,
               SPARK_GRAFT_DRIVER_MEM=f"{max(12, int(cpus * gb_core))}g")
    cmd = ["taskset", "-c", f"0-{cpus - 1}", sys.executable, "-c", job, str(cpus)]
    try:
        out = subprocess.run(cmd, capture_output=True, text=True, check=True,
                             cwd=REPO, env=env)
    except subprocess.CalledProcessError as e:
        print(e.stdout[-2000:], e.stderr[-2000:])
        raise
    finally:
        shutil.rmtree(f"/dev/shm/fe_spark_probe_{cpus}", ignore_errors=True)
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    names = sys.argv[2:] or list(VARIANTS)
    hist = os.path.join(REPO, "BENCH", "wide_probe.jsonl")
    best: dict[str, float] = {}
    for rep in range(reps):
        for name in names:
            r = run(name)
            print(f"rep {rep} {name}: {r['sec']}s", flush=True)
            with open(hist, "a") as f:
                f.write(json.dumps({"variant": name, "result": r}) + "\n")
            best[name] = min(best.get(name, float("inf")), r["sec"])
    print(json.dumps({"min_by_variant": best}))


if __name__ == "__main__":
    main()

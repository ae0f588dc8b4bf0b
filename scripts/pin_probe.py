"""Probe: core-pinned N-vs-4N protocol variants for the scaling job.

Motivation (round-3 verdict, "pin GC threads" suggestion): in the
current protocol the local[8] JVM still *sees* all 32 cores — G1 sizes
its ParallelGCThreads for 32, netty/JIT/compiler threads spill onto
the 24 idle cores, and the OS schedules all of it on hardware a real
8-core (N-executor) cluster simply would not have. That free boost
flows entirely to the NARROW level, so measured 8->32 efficiency
under-reports what a real N -> 4N executor scale-up would see.

The faithful proxy for "a cluster with N cores total" is to confine
the whole process to N cores:

- ``taskset -c 0..N-1``   (OS-level: every thread of the JVM shares
  exactly N hardware threads, like an N-core node), and
- ``-XX:ActiveProcessorCount=N``  (JVM-level: GC worker count, JIT
  compiler threads, ForkJoinPool parallelism are sized for N).

Both levels get the same treatment (level 32 pins to 32 cores = whole
box, a no-op), so the only variable remains compute parallelism —
exactly the cluster-sizing invariant the heap-per-core rule already
follows.

This probe measures candidate protocol/config variants at BOTH levels
on the 2M-conv input (fast: ~45 s narrow wall) so the criterion-size
remeasure only runs the winning variant. Results go to
BENCH/pin_probe.jsonl, never into the criterion attempt history.

Usage: python scripts/pin_probe.py [variant ...]
  variants: pinned pinned-offheap pinned-pgc (default: pinned)
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
extra = {{"spark.local.dir": f"/dev/shm/fe_spark_pin_{{cpus}}"}}
extra.update({extra_conf!r})
jvm = "-XX:ActiveProcessorCount=" + str(cpus)
prev = extra.get("spark.driver.extraJavaOptions", "")
extra["spark.driver.extraJavaOptions"] = (prev + " " + jvm).strip()
spark = get_spark(master=f"local[{{cpus}}]", app_name=f"pin-{{cpus}}",
                  shuffle_partitions=128, extra_conf=extra)
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
                  "turns_per_sec": round(n_turns / best, 1)}}))
spark.stop()
"""

VARIANTS = {
    # pure protocol fix: core confinement only, engine config unchanged
    "pinned": {},
    # + Tungsten execution memory off the GC heap, 0.5 GB/core (the
    #   per-core invariant, like the 1.5 GB/core heap rule)
    "pinned-offheap": {"spark.memory.offHeap.enabled": "true"},
    # + throughput collector instead of G1
    "pinned-pgc": {"spark.driver.extraJavaOptions": "-XX:+UseParallelGC"},
}


def run(variant: str, cpus: int) -> dict:
    extra = dict(VARIANTS[variant])
    if variant == "pinned-offheap":
        extra["spark.memory.offHeap.size"] = f"{cpus // 2}g"
    job = _JOB.format(repo=REPO, data=SHM_DATA, extra_conf=extra)
    env = dict(os.environ, SPARK_GRAFT_DRIVER_MEM=f"{max(12, int(cpus * 1.5))}g")
    cmd = ["taskset", "-c", f"0-{cpus - 1}", sys.executable, "-c", job, str(cpus)]
    try:
        out = subprocess.run(cmd, capture_output=True, text=True, check=True,
                             cwd=REPO, env=env)
    except subprocess.CalledProcessError as e:
        print(e.stdout[-2000:], e.stderr[-2000:])
        raise
    finally:
        shutil.rmtree(f"/dev/shm/fe_spark_pin_{cpus}", ignore_errors=True)
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    variants = sys.argv[1:] or ["pinned"]

    if not os.path.exists(SHM_DATA):
        if not os.path.exists(DATA):
            sys.path.insert(0, REPO)
            from feature_engineering_tk_spark.datagen import generate_transcripts
            from feature_engineering_tk_spark.session import get_spark

            spark = get_spark(master="local[32]", app_name="gen", shuffle_partitions=64)
            spark.sparkContext.setLogLevel("ERROR")
            df = generate_transcripts(spark, n_convs=2_000_000, seed=42)
            df.repartition(64, "conv_id").write.mode("overwrite").parquet(DATA)
            spark.stop()
        os.makedirs(os.path.dirname(SHM_DATA), exist_ok=True)
        shutil.copytree(DATA, SHM_DATA)

    hist = os.path.join(REPO, "BENCH", "pin_probe.jsonl")
    for variant in variants:
        res = {}
        for cpus in (32, 8):
            r = run(variant, cpus)
            res[cpus] = r
            print(variant, r)
            with open(hist, "a") as f:
                f.write(json.dumps({"variant": variant, "result": r}) + "\n")
        eff = (res[32]["turns_per_sec"] / res[8]["turns_per_sec"]) / 4.0
        print(f"{variant}: raw 8->32 efficiency {eff:.3f}")


if __name__ == "__main__":
    main()

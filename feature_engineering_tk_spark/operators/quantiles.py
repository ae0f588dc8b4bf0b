"""Distributed EXACT quantiles.

Spark's builtin exact ``percentile`` aggregate buffers every (value,
count) pair in a single merged map — fine at test scale, a single-
reducer memory wall at 10^12 rows. This module computes exact order
statistics the scalable way:

1. ``repartitionByRange`` on the value column (sampled range
   boundaries, one shuffle) + ``sortWithinPartitions`` → globally
   sorted data, each partition bounded.
2. One count pass gives per-partition row counts → driver computes,
   for each requested probability p, the global index ``(n-1)·p`` and
   its bracketing order statistics, and which (partition, local index)
   they live at.
3. One partition-local window (row_number per partition id — no extra
   global sort) picks exactly those rows.

Linear interpolation between the bracketing order statistics matches
numpy/pandas ``quantile`` (and DuckDB ``quantile_cont``) exactly.

Cost: 2 jobs + 1 shuffle, every stage parallel; memory per task is one
partition of values, never the whole column.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def exact_quantiles(
    df: DataFrame,
    column: str,
    probs: list[float],
    num_partitions: int | None = None,
) -> list[float]:
    """Exact quantiles (linear interpolation) of a numeric column,
    nulls excluded, computed via distributed sort-select."""
    vals = df.select(F.col(column).alias("v")).filter(F.col("v").isNotNull())
    if num_partitions is None:
        num_partitions = max(df.sparkSession.sparkContext.defaultParallelism, 2)
    sorted_vals = vals.repartitionByRange(num_partitions, "v").sortWithinPartitions("v")
    sorted_vals = sorted_vals.withColumn("pid", F.spark_partition_id())
    # cache: two passes (counts, pick) over the sorted shuffle output
    sorted_vals = sorted_vals.persist()
    try:
        counts = {
            r["pid"]: r["cnt"]
            for r in sorted_vals.groupBy("pid").agg(F.count(F.lit(1)).alias("cnt")).collect()
        }
        n = sum(counts.values())
        if n == 0:
            return [None for _ in probs]

        # global indices needed (bracketing order stats per prob)
        needed: set[int] = set()
        brackets: list[tuple[int, int, float]] = []
        for p in probs:
            # pandas Series.quantile / qcut route probabilities through
            # the PERCENT scale (np.percentile(q*100)); (p*100)/100 is
            # one ulp off p for e.g. thirds, which can select a
            # different bracket row entirely (0.99…82 vs 1.0 on tied
            # data). Replicate the round trip for bit-exact parity.
            p_eff = (float(p) * 100.0) / 100.0
            pos = (n - 1) * p_eff
            lo = int(math.floor(pos))
            hi = min(lo + 1, n - 1)
            g = pos - lo
            needed.update((lo, hi))
            brackets.append((lo, hi, g))

        # map global index -> (pid, local row_number 1-based)
        offsets = {}
        acc = 0
        for pid in sorted(counts):
            offsets[pid] = acc
            acc += counts[pid]
        locs: list[tuple[int, int, int]] = []  # (gidx, pid, local_rn)
        for gidx in sorted(needed):
            pid = max(p for p in offsets if offsets[p] <= gidx)
            locs.append((gidx, pid, gidx - offsets[pid] + 1))

        w = Window.partitionBy("pid").orderBy("v")
        cond = F.lit(False)
        rn = F.row_number().over(w)
        picked = sorted_vals.withColumn("rn", rn)
        for _, pid, local in locs:
            cond = cond | ((F.col("pid") == pid) & (F.col("rn") == local))
        rows = picked.filter(cond).select("pid", "rn", "v").collect()
        by_loc = {(r["pid"], r["rn"]): r["v"] for r in rows}
        by_gidx = {g: by_loc[(pid, local)] for g, pid, local in locs}

        out = []
        for lo, hi, g in brackets:
            vlo, vhi = float(by_gidx[lo]), float(by_gidx[hi])
            out.append(vlo + (vhi - vlo) * g if g > 0 else vlo)
        return out
    finally:
        sorted_vals.unpersist()


def approx_quantiles(
    df: DataFrame,
    column: str,
    probs: list[float],
    relative_error: float = 1e-4,
) -> list[float]:
    """Greenwald-Khanna approximate quantiles (`approxQuantile`) — the
    100 TB path when the 2-job sort-select of :func:`exact_quantiles`
    is not worth it (e.g. re-fitting bin edges every incremental run).

    NOT allclose-parity with pandas: error is bounded by
    ``relative_error * n`` in RANK space (so e.g. 1e-4 → the returned
    value's rank is within ±0.01% of the requested one). Callers choose
    per call site; every parity-contract surface in this repo uses the
    exact form."""
    return df.stat.approxQuantile(column, [float(p) for p in probs], relative_error)

"""Ordered-event funnel analysis over entity streams.

The event-sequence analog of sessionization (SURVEY §2.11): given an
ordered step list (view → click → purchase; or tool-call sequences in
agent transcripts), compute per entity the earliest strictly-ordered
completion of the prefix of steps, optionally within a time budget
from step 1.

Scale shape: ONE shuffle (groupBy entity, map-side partial
collect_list), then the whole state machine is a sequential
``F.aggregate`` fold over the entity's time-sorted events — a pure
JVM expression, no Python, no window, no self-join chain (the k-join
formulation shuffles the fact table k times; this shuffles it once).
Per-entity event counts are transcript-sized, the same boundedness
assumption sessionize already makes.  The fold is element-for-element
replayable by DuckDB ``list_reduce`` (events and state both encoded
as BIGINT lists so the fold is type-uniform for engines that require
it).

Semantics (pinned, oracle-replayed):
- events sorted by (ts, step_index); timestamps are integer
  microseconds (never float epoch arithmetic);
- step i completes at the FIRST event matching ``steps[i]`` with
  ``t > t(step i-1)`` (strictly later) and, for i ≥ 1,
  ``t - t(step 0) <= within`` when a budget is given;
- steps must be distinct event values (the state transition is keyed
  by step index).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from feature_engineering_tk_spark.functions.timeutil import epoch_micros

_NONE = -1  # sentinel: step not yet completed (epochs are non-negative)


def funnel(
    df: DataFrame,
    steps: list[str],
    entity: str = "user_id",
    ts: str = "ts",
    event_col: str = "event_type",
    within_seconds: float | None = None,
) -> DataFrame:
    """Per-entity funnel completion: (entity, steps_completed,
    completed, funnel_seconds).

    ``steps_completed`` is the longest completed prefix;
    ``funnel_seconds`` is the step-1 → final-step span (NULL unless
    fully completed).
    """
    if len(set(steps)) != len(steps):
        raise ValueError("funnel steps must be distinct event values")
    k = len(steps)
    within_us = None if within_seconds is None else int(round(within_seconds * 1_000_000))

    # step index per event (-1 = not a step); encode (t, idx) as a
    # BIGINT pair so the fold below is type-uniform
    idx = F.lit(-1)
    for i in reversed(range(k)):
        idx = F.when(F.col(event_col) == steps[i], F.lit(i)).otherwise(idx)
    ev = df.select(
        F.col(entity),
        F.array(epoch_micros(F.col(ts)), idx.cast("bigint")).alias("_e"),
    ).where(F.col(ts).isNotNull())

    grouped = ev.groupBy(entity).agg(F.array_sort(F.collect_list("_e")).alias("_evs"))

    init = F.array(*[F.lit(_NONE).cast("bigint") for _ in range(k)])

    def step(acc: Column, x: Column) -> Column:
        t = F.element_at(x, 1)
        si = F.element_at(x, 2)

        def cell(ii: int) -> Column:
            prev_ok = (
                F.lit(True)
                if ii == 0
                else (F.element_at(acc, ii) != _NONE) & (t > F.element_at(acc, ii))
            )
            budget_ok = (
                F.lit(True)
                if (within_us is None or ii == 0)
                else (t - F.element_at(acc, 1)) <= F.lit(within_us)
            )
            return F.when(
                F.element_at(acc, ii + 1) != _NONE, F.element_at(acc, ii + 1)
            ).otherwise(
                F.when((si == ii) & prev_ok & budget_ok, t).otherwise(F.lit(_NONE).cast("bigint"))
            )

        return F.array(*[cell(i) for i in range(k)])

    state = F.aggregate(F.col("_evs"), init, step)
    # longest completed prefix (the fold can only set i after i-1)
    done = F.size(F.filter(state, lambda s: s != _NONE))
    span = (F.element_at(state, k) - F.element_at(state, 1)) / F.lit(1_000_000.0)
    return grouped.select(
        F.col(entity),
        done.cast("int").alias("steps_completed"),
        (done == k).alias("completed"),
        F.when(done == k, span).alias("funnel_seconds"),
    )


def funnel_summary(per_entity: DataFrame, k: int) -> DataFrame:
    """Step-conversion counts: how many entities completed ≥ i steps
    (the funnel chart), from the per-entity table.

    Single pass over the entity table: one partial-aggregatable
    ``groupBy(steps_completed)`` (≤ k+1 result rows), then the suffix
    sum is a join between two aggregate-sized tables (k rows × k+1
    rows) — the entity table is never replicated.
    """
    spark = per_entity.sparkSession
    grid = spark.range(1, k + 1).select(F.col("id").cast("int").alias("step"))
    counts = per_entity.groupBy("steps_completed").agg(F.count(F.lit(1)).alias("_n"))
    return (
        grid.join(counts, counts["steps_completed"] >= grid["step"], "left")
        .groupBy("step")
        .agg(F.coalesce(F.sum("_n"), F.lit(0).cast("bigint")).alias("n_entities"))
    )


def cohort_retention(
    df: DataFrame,
    entity: str = "user_id",
    ts: str = "ts",
) -> DataFrame:
    """Weekly cohort-retention triangle: entities bucketed by
    first-seen week (Monday-truncated), counted in every subsequent
    week they were active.  (cohort_week, week_offset, n_users).

    Three partial-aggregatable shuffles on entity/cohort keys — no
    window, no per-entity state; both week columns are Monday dates so
    the day-difference is an exact multiple of 7.
    """
    live = df.where(F.col(ts).isNotNull())
    wk = F.date_trunc("week", F.col(ts)).cast("date")
    first = live.groupBy(entity).agg(F.min(wk).alias("cohort_week"))
    active = live.select(F.col(entity), wk.alias("week")).distinct()
    j = active.join(first, entity)
    off = (F.datediff(F.col("week"), F.col("cohort_week")) / 7).cast("int")
    return (
        j.groupBy("cohort_week", off.alias("week_offset"))
        .agg(F.count_distinct(F.col(entity)).alias("n_users"))
    )

"""Session-lifetime registry for pinned (persisted) intermediate tables.

Several lazy operator builders (``bigram_lm_score``, ``importance_weights``,
``collocations``, ``source_overlap``) must ``persist()`` an aggregate table
that feeds multiple consumers inside the plan they return — Catalyst does
not dedupe common subtrees, so without the pin each consumer would
re-tokenize the whole corpus.  Because the builders return lazily, they
cannot unpersist after the consuming action (that action runs in the
caller); unpersisting before return would silently multiply corpus scans.

The trade is made explicit instead: builders register their pinned tables
here, and a long-lived session (notebook, service) calls
``release_pinned()`` between pipelines to drop the cached blocks
deterministically rather than waiting on LRU pressure.  Short-lived jobs
never need to call it — the blocks die with the SparkSession.
"""

from __future__ import annotations

from typing import List

from pyspark.sql import DataFrame

_PINNED: List[DataFrame] = []


def pin(df: DataFrame) -> DataFrame:
    """persist() *df* (MEMORY_AND_DISK) and register it for a later
    :func:`release_pinned`.  Returns *df* for fluent use."""
    df.persist()
    _PINNED.append(df)
    return df


def release_pinned(blocking: bool = False) -> int:
    """Unpersist every table pinned since the last release; returns how
    many were released.  Safe to call at any time — plans built over a
    released table recompute instead of reading cache."""
    n = len(_PINNED)
    for df in _PINNED:
        df.unpersist(blocking=blocking)
    _PINNED.clear()
    return n


def pinned_count() -> int:
    """Number of currently registered pinned tables (for tests/metrics)."""
    return len(_PINNED)

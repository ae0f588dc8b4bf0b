"""Timezone-independent time arithmetic.

Transcript/event tables may carry ``TIMESTAMP`` (instant) or
``TIMESTAMP_NTZ`` columns depending on the writer. All engine time
math goes through :func:`epoch_micros` / :func:`epoch_seconds`, which
treat the wall-clock value as UTC regardless of the session timezone —
matching both the pandas reference (naive timestamps) and DuckDB's
``epoch()`` on naive values.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_EPOCH_NTZ = "1970-01-01 00:00:00"


def epoch_micros(c: Column | str) -> Column:
    """Microseconds since epoch of the wall-clock value (bigint).

    ``timestamp_diff`` on TIMESTAMP_NTZ is pure datetime arithmetic —
    no session-timezone dependence. Instant timestamps are first cast
    to NTZ (identity under the engine's pinned UTC session)."""
    col = F.col(c) if isinstance(c, str) else c
    ntz = col.cast("timestamp_ntz")
    return F.timestamp_diff("MICROSECOND", F.lit(_EPOCH_NTZ).cast("timestamp_ntz"), ntz)


def epoch_seconds(c: Column | str) -> Column:
    """Fractional epoch seconds (double) — microsecond precision."""
    return epoch_micros(c) / F.lit(1_000_000.0)

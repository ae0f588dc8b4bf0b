"""Replicate the driver's correctness gate locally: run each
``queries()`` entry on Spark and its ``oracle_sql()`` twin on DuckDB
over the same parquet tables, compare row count, column names, and
order-insensitive values.

Usage: python scripts/check_oracle.py [--exact] [sf_dir] [query ...]

--exact drops the 1e-9 float tolerance and requires bit-identical
values — the same bar as the driver's value-hash gate.
"""

from __future__ import annotations

import math
import sys

sys.path.insert(0, ".")

import duckdb
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


EXACT = False


def values_match(a: pd.DataFrame, b: pd.DataFrame) -> tuple[bool, str]:
    if list(a.columns) != list(b.columns):
        return False, f"columns differ: {list(a.columns)} vs {list(b.columns)}"
    if len(a) != len(b):
        return False, f"row counts differ: {len(a)} vs {len(b)}"
    for c in a.columns:
        x, y = a[c], b[c]
        try:
            xf = pd.to_numeric(x, errors="raise")
            yf = pd.to_numeric(y, errors="raise")
            both_nan = xf.isna() & yf.isna()
            close = (xf == yf) | both_nan
            if not EXACT:
                # tolerate float repr noise below the rounding we applied
                diff = (xf.astype(float) - yf.astype(float)).abs()
                close = close | (diff < 1e-9)
            if not close.all():
                bad = (~close).idxmax()
                return False, f"col {c} differs at row {bad}: {x[bad]!r} vs {y[bad]!r}"
        except (ValueError, TypeError):
            sx = x.astype(str)
            sy = y.astype(str)
            if not (sx == sy).all():
                bad = (sx != sy).idxmax()
                return False, f"col {c} differs at row {bad}: {x[bad]!r} vs {y[bad]!r}"
    return True, "ok"


def main():
    global EXACT
    args = [a for a in sys.argv[1:] if a != "--exact"]
    EXACT = "--exact" in sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])

    # literal-table oracles (unigram trio) recompute from this dir
    import os

    os.environ["SPARK_GRAFT_ORACLE_SF_DIR"] = sf_dir

    import __spark_entry__ as entrymod
    from feature_engineering_tk_spark.session import get_spark

    spark = get_spark(master="local[8]", app_name="oracle-check", shuffle_partitions=8)

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            got = canon(fn(spark, sf_dir).toPandas())
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: spark error: {e}")
            continue
        if name not in oracles:
            print(f"skip  {name}: no oracle (rows-only check), rows={len(got)}")
            continue
        try:
            exp = canon(con.sql(oracles[name]).df())
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: duckdb error: {e}")
            continue
        ok, msg = values_match(got, exp)
        status = "ok   " if ok else "FAIL "
        if not ok:
            failures.append(name)
        print(f"{status} {name}: rows={len(got)} {msg if not ok else ''}")

    print(f"\n{len(failures)} failures: {failures}")
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()

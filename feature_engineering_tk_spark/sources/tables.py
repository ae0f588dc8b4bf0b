"""Table sources/sinks — the engine's §2.1 surface.

The reference has no data sources (callers hand in an in-memory
DataFrame, base.py:28-39); the north rule mandates Iceberg transcript
tables. This module gives ONE code path for both worlds:

- ``load_table``  — Iceberg table ref when a catalog is configured,
  plain (partition-dir) parquet path otherwise. The returned DataFrame
  is identical either way, so every operator downstream is
  storage-agnostic.
- ``write_table`` — Iceberg ``writeTo`` when available, else parquet
  partitioned by the same columns (Hive-style ``col=value`` dirs —
  the layout Iceberg's migrate procedure ingests in place).
- ``ensure_schema`` — strict schema enforcement (names, order, types)
  so a job fails fast on drift instead of silently miscomputing.

Partition pruning: both paths expose partition columns to Catalyst
(Iceberg through its scan, parquet through Hive-style dirs), so a
``WHERE ds = ...`` prunes files before any I/O.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def iceberg_available(spark: SparkSession) -> bool:
    """True when an Iceberg catalog is on the classpath + configured.
    Detected once per session; cheap (a JVM class lookup, no I/O)."""
    try:
        spark._jvm.java.lang.Class.forName("org.apache.iceberg.spark.SparkCatalog")
        return True
    except Exception:
        return False


def load_table(
    spark: SparkSession,
    ref: str,
    schema: T.StructType | None = None,
) -> DataFrame:
    """Load ``ref`` as a DataFrame.

    ``ref`` forms:
    - ``iceberg:<catalog.db.table>`` — explicit Iceberg table ref
    - ``<catalog.db.table>`` (no slash) — table ref, Iceberg if present
    - ``/path/to/dir_or_file.parquet`` — parquet path (dev/test)
    """
    if ref.startswith("iceberg:"):
        df = spark.read.format("iceberg").load(ref[len("iceberg:") :])
    elif "/" not in ref and "." in ref:
        df = spark.table(ref)
    else:
        df = spark.read.parquet(ref)
    return ensure_schema(df, schema) if schema is not None else df


def write_table(
    df: DataFrame,
    ref: str,
    partition_by: tuple[str, ...] = (),
    mode: str = "overwrite",
) -> None:
    """Write ``df`` to an Iceberg table or a partitioned parquet dir.

    Dynamic partition overwrite: re-running one day's slice replaces
    ONLY that day's partitions — the primitive checkpoint-resume and
    late-data re-runs are built on."""
    if ref.startswith("iceberg:"):
        w = df.writeTo(ref[len("iceberg:") :])
        if mode == "overwrite":
            w.overwritePartitions()
        else:
            w.append()
        return
    writer = df.write.mode(mode).option("partitionOverwriteMode", "dynamic")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(ref)


def ensure_schema(df: DataFrame, schema: T.StructType) -> DataFrame:
    """Enforce exact column names/order and cast to expected types;
    raise on missing columns (utils.py:53-72 validation analog)."""
    missing = [f.name for f in schema.fields if f.name not in df.columns]
    if missing:
        raise ValueError(f"input table missing columns: {missing}")
    return df.select(*[F.col(f.name).cast(f.dataType) for f in schema.fields])

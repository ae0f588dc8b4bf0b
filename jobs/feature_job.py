"""spark-submit entry point: the end-to-end point-in-time feature job.

Ships to a cluster as::

    python -m zipfile -c /tmp/fe.zip feature_engineering_tk_spark
    spark-submit --py-files /tmp/fe.zip jobs/feature_job.py \
        --input iceberg:prod.transcripts --output iceberg:prod.turn_features \
        --workdir /checkpoints/featurejob --gap-seconds 1800

Locally (no cluster, no Iceberg catalog) the same script runs on a
parquet dir or a deterministic synthetic transcript table::

    python jobs/feature_job.py --synthesize 500 --output /tmp/feat \
        --workdir /tmp/fe_ckpt

The pipeline is checkpoint-resumable (plans/pipeline.py): every
checkpointed stage lands as date-partitioned parquet with an atomic
manifest + lineage journal (rows, skew ratio, bytes per stage); a
re-run with the same --workdir resumes after the last completed
checkpoint instead of recomputing.

Features per (conv_id, turn_idx, ts) anchor — every window frame ends
at the current row, so no feature reads a turn with ts greater than
the anchor (zero temporal leakage by construction):

- session_id        gap-based sessionization (cumulative-sum pattern)
- turn_gap_s        ts - lag(ts)
- text_len_lag1     lag of the previous turn's text length
- tokens_roll_mean5 rolling mean over the last 5 turns
- tokens_cum_sum    expanding sum
- score_ffill       last-observation-carried-forward score
- last_tool / last_tool_ts_s  as-of join of the latest prior tool call
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input", help="iceberg:<tbl> | <catalog.db.tbl> | parquet path")
    p.add_argument("--synthesize", type=int, default=0, help="generate N synthetic conversations instead of reading --input")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--output", required=True, help="iceberg:<tbl> | parquet path")
    p.add_argument("--workdir", required=True, help="checkpoint/manifest/lineage dir")
    p.add_argument("--gap-seconds", type=float, default=1800.0)
    p.add_argument("--no-resume", action="store_true")
    p.add_argument("--master", default=None)
    p.add_argument(
        "--bucket-output",
        type=int,
        default=0,
        metavar="N",
        help="ALSO register the feature table hash-bucketed on conv_id into N "
        "buckets (catalog table named after the output basename): downstream "
        "joins/groupBys on conv_id then plan with zero exchanges — pay the "
        "pipeline's one shuffle at write time instead of in every consumer",
    )
    return p


def build_pipeline(workdir: str, gap_seconds: float):
    from feature_engineering_tk_spark.operators import window_features as W
    from feature_engineering_tk_spark.operators.asof import asof_join
    from feature_engineering_tk_spark.plans.pipeline import Pipeline

    ORDER = ["ts", "turn_idx"]  # stable per-conversation turn ordering

    def sessionize(df):
        return W.sessionize(df, gap_seconds, entity="conv_id", ts="ts", order=ORDER)

    def lag_features(df):
        df = df.withColumn("text_len", F.length("text"))
        df = W.with_lag(df, "text_len", 1, entity="conv_id", order=ORDER, out="text_len_lag1")
        df = W.with_turn_gap(df, ts="ts", entity="conv_id", order=ORDER, out="turn_gap_s")
        return df.drop("text_len")

    def rolling_features(df):
        df = W.rolling_agg(df, "tokens", "mean", 5, entity="conv_id", order=ORDER, out="tokens_roll_mean5")
        df = W.cumulative_agg(df, "tokens", "sum", entity="conv_id", order=ORDER, out="tokens_cum_sum")
        df = df.withColumn("score_ffill", F.col("score"))
        return W.forward_fill(df, ["score_ffill"], entity="conv_id", order=ORDER)

    def attach_last_tool(df):
        tool_calls = df.filter(F.col("tool").isNotNull()).select(
            "conv_id",
            "ts",
            F.col("tool").alias("last_tool"),
        )
        out = asof_join(df, tool_calls, entity="conv_id", value_cols=["last_tool"], suffix="")
        return out.withColumn("ds", F.to_date("ts"))

    pipe = Pipeline(workdir, entity="conv_id", partition_col="ds")
    pipe.add("sessionize", sessionize, {"gap_seconds": gap_seconds})
    pipe.add("lag_features", lag_features)
    pipe.add("rolling_features", rolling_features)
    pipe.add("attach_last_tool", attach_last_tool, checkpoint=True)
    return pipe


def register_bucketed(feat, output: str, n_buckets: int) -> str:
    """Register the feature table hash-bucketed on conv_id; returns the
    catalog table name.  `iceberg:cat.db.tbl` outputs get a MANAGED
    bucketed table (no external path — "iceberg:..." is not a
    filesystem location); path outputs get a sibling dir.  Either way
    the identifier is sanitized — basenames like `feat-v2` or
    `prod.turn_features` are not valid Spark table names as-is."""
    import re

    from feature_engineering_tk_spark.sources.tables import write_bucketed

    # mirror write_table's rule exactly: ONLY iceberg: refs are catalog
    # tables, everything else (slash or not) is a filesystem path — a
    # "/"-heuristic would silently send a relative-path output's
    # bucketed copy to the warehouse dir instead of the sibling dir
    is_table_ref = output.startswith("iceberg:")
    base = output.split(":", 1)[-1].rstrip("/")
    table = re.sub(r"[^A-Za-z0-9_]", "_", os.path.basename(base)) + "_bucketed"
    write_bucketed(
        feat,
        table,
        "conv_id",
        n_buckets=n_buckets,
        sort_by=["conv_id", "turn_idx"],
        path=None if is_table_ref else base + "_bucketed",
    )
    return table


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)
    from feature_engineering_tk_spark.datagen import TRANSCRIPT_SCHEMA, generate_transcripts
    from feature_engineering_tk_spark.session import get_spark
    from feature_engineering_tk_spark.sources import load_table, write_table

    spark = get_spark(master=args.master, app_name="fe-tk-feature-job")
    spark.sparkContext.setLogLevel("WARN")

    if args.synthesize:
        df = generate_transcripts(spark, n_convs=args.synthesize, seed=args.seed)
    elif args.input:
        df = load_table(spark, args.input, schema=TRANSCRIPT_SCHEMA)
    else:
        raise SystemExit("need --input or --synthesize N")

    pipe = build_pipeline(args.workdir, args.gap_seconds)
    feat = pipe.run(spark, df, resume=not args.no_resume)
    write_table(feat, args.output, partition_by=("ds",), mode="overwrite")
    if args.bucket_output:
        table = register_bucketed(feat, args.output, args.bucket_output)
        print(f"registered bucketed table {table} ({args.bucket_output} buckets)")
    print(f"wrote features to {args.output}; lineage at {pipe.journal_path}")
    spark.stop()


if __name__ == "__main__":
    main()

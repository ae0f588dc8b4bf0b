"""Command-line surface: ``python -m feature_engineering_tk_spark``.

Subcommands:
- ``quick-analysis <table>``       one-shot EDA printed as JSON
- ``summary-report <table> <target>``  ASCII target report
- ``feature-job ...``              forwards to jobs/feature_job.py args

``<table>`` accepts the same refs as sources.load_table
(iceberg:<tbl> | catalog.db.tbl | parquet path).
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv=None) -> None:
    p = argparse.ArgumentParser(prog="feature_engineering_tk_spark", description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)

    qa = sub.add_parser("quick-analysis", help="one-shot EDA as JSON")
    qa.add_argument("table")
    qa.add_argument("--master", default=None)

    sr = sub.add_parser("summary-report", help="ASCII target report")
    sr.add_argument("table")
    sr.add_argument("target")
    sr.add_argument("--master", default=None)

    fj = sub.add_parser("feature-job", help="run the end-to-end feature job")

    args, rest = p.parse_known_args(argv)

    if args.cmd == "feature-job":
        from jobs.feature_job import main as job_main  # repo-root layout

        job_main(rest)
        return

    from feature_engineering_tk_spark.session import get_spark
    from feature_engineering_tk_spark.sources import load_table

    spark = get_spark(master=args.master)
    spark.sparkContext.setLogLevel("ERROR")
    df = load_table(spark, args.table)

    if args.cmd == "quick-analysis":
        from feature_engineering_tk_spark.analysis.reports import quick_analysis

        print(json.dumps(quick_analysis(df), indent=2, default=str))
    elif args.cmd == "summary-report":
        from feature_engineering_tk_spark.analysis.reports import generate_summary_report

        print(generate_summary_report(df, args.target))
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())

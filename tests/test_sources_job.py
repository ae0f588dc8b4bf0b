"""Sources layer (§2.1) + spark-submit job entry point: storage-agnostic
load/write with schema enforcement, and the end-to-end feature job with
checkpoint resume."""

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T


def test_load_table_parquet_with_schema(spark, transcripts, tmp_path):
    from feature_engineering_tk_spark.datagen import TRANSCRIPT_SCHEMA
    from feature_engineering_tk_spark.sources import load_table, write_table

    path = str(tmp_path / "tbl")
    write_table(transcripts.withColumn("ds", F.to_date("ts")), path, partition_by=("ds",))
    back = load_table(spark, path, schema=TRANSCRIPT_SCHEMA)
    assert [f.name for f in back.schema.fields] == [f.name for f in TRANSCRIPT_SCHEMA.fields]
    assert back.count() == transcripts.count()
    # partition dirs are Hive-style → partition pruning visible in plan
    assert any(p.startswith("ds=") for p in os.listdir(path) if not p.startswith("_"))


def test_ensure_schema_missing_column_raises(spark):
    from feature_engineering_tk_spark.sources import ensure_schema

    df = spark.range(3).toDF("a")
    schema = T.StructType([T.StructField("missing", T.LongType())])
    with pytest.raises(ValueError, match="missing"):
        ensure_schema(df, schema)


def test_ensure_schema_casts_and_orders(spark):
    from feature_engineering_tk_spark.sources import ensure_schema

    df = spark.createDataFrame([(1, "2.5")], "b int, a string")
    schema = T.StructType(
        [T.StructField("a", T.DoubleType()), T.StructField("b", T.LongType())]
    )
    out = ensure_schema(df, schema)
    assert out.columns == ["a", "b"]
    assert out.first()["a"] == 2.5


def test_feature_job_end_to_end_and_resume(spark, tmp_path):
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(__file__)), "jobs"))
    from feature_engineering_tk_spark.datagen import generate_transcripts
    from jobs.feature_job import build_pipeline

    df = generate_transcripts(spark, n_convs=40, seed=7)
    workdir = str(tmp_path / "ckpt")

    pipe = build_pipeline(workdir, gap_seconds=1800.0)
    out = pipe.run(spark, df, resume=True)
    rows = out.count()
    assert rows == df.count()
    for col in [
        "session_id",
        "text_len_lag1",
        "turn_gap_s",
        "tokens_roll_mean5",
        "tokens_cum_sum",
        "score_ffill",
        "last_tool",
        "ds",
    ]:
        assert col in out.columns

    # resume: second run skips to the checkpoint (journal records it)
    pipe2 = build_pipeline(workdir, gap_seconds=1800.0)
    out2 = pipe2.run(spark, df, resume=True)
    assert out2.count() == rows
    journal = open(pipe2.journal_path).read()
    assert '"event": "resume"' in journal

    # zero-leakage invariant: last_tool at each anchor only reflects
    # tool calls with ts <= anchor ts (spot-check via recompute)
    anchors = out.filter(F.col("last_tool").isNotNull()).limit(20).collect()
    tool_rows = df.filter(F.col("tool").isNotNull()).select("conv_id", "ts", "tool").collect()
    for a in anchors:
        past = [t for t in tool_rows if t.conv_id == a.conv_id and t.ts <= a.ts]
        assert past, f"no past tool call for {a.conv_id}"
        latest = max(past, key=lambda t: t.ts)
        assert a.last_tool == latest.tool


def test_dataset_fingerprint_order_invariant(spark):
    from feature_engineering_tk_spark.sources.tables import dataset_fingerprint

    rows = [(i, f"s{i % 3}") for i in range(50)]
    a = spark.createDataFrame(rows, "id bigint, s string")
    b = spark.createDataFrame(list(reversed(rows)), "id bigint, s string").repartition(7)
    for mode in ("xxhash64", "md5"):
        fa = dataset_fingerprint(a, hash_mode=mode).collect()[0]
        fb = dataset_fingerprint(b, hash_mode=mode).collect()[0]
        assert fa.n_rows == 50 and (fa.n_rows, fa.fingerprint) == (fb.n_rows, fb.fingerprint)
    # any single-value change moves the checksum
    c = spark.createDataFrame(rows[:-1] + [(49, "CHANGED")], "id bigint, s string")
    assert (
        dataset_fingerprint(c, hash_mode="md5").collect()[0].fingerprint
        != dataset_fingerprint(a, hash_mode="md5").collect()[0].fingerprint
    )


def test_dataset_fingerprint_null_and_empty(spark):
    from feature_engineering_tk_spark.sources.tables import dataset_fingerprint

    df = spark.createDataFrame([(1, None), (None, "x")], "id bigint, s string")
    r = dataset_fingerprint(df, hash_mode="md5").collect()[0]
    assert r.n_rows == 2 and r.fingerprint >= 0
    empty = df.filter("id = 999")
    r0 = dataset_fingerprint(empty, hash_mode="md5").collect()[0]
    assert r0.n_rows == 0 and r0.fingerprint == 0
    with pytest.raises(ValueError):
        dataset_fingerprint(df, hash_mode="sha9000")


def test_feature_job_bucket_output_naming(spark, tmp_path):
    """--bucket-output sanitizes identifiers (hyphens, dots) and the
    registered table joins itself on conv_id with zero exchanges."""
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(__file__)), "jobs"))
    from feature_engineering_tk_spark.datagen import generate_transcripts
    from jobs.feature_job import build_pipeline, register_bucketed

    df = generate_transcripts(spark, n_convs=30, seed=7)
    feat = build_pipeline(str(tmp_path / "ck"), 1800.0).run(spark, df, resume=True)
    out = str(tmp_path / "feat-v2.x")
    table = register_bucketed(feat, out, 2)
    assert table == "feat_v2_x_bucketed"
    t = spark.table("feat_v2_x_bucketed")
    assert t.count() > 0
    j = t.hint("merge").join(
        t.select("conv_id").distinct().hint("merge"), "conv_id"
    )
    plan = j._jdf.queryExecution().executedPlan().toString()
    # left side scan comes out pre-clustered; only the derived distinct
    # side may exchange
    assert plan.count("Exchange") <= 1
    spark.sql("DROP TABLE IF EXISTS feat_v2_x_bucketed")


def test_read_delimited_schema_and_corrupt_capture(spark, tmp_path):
    from feature_engineering_tk_spark.sources import read_delimited

    p = tmp_path / "m.csv"
    p.write_text("id,score,name\n1,2.5,a\n2,notanumber,b\nbad-row\n3,4.0,c\n")
    schema = T.StructType([
        T.StructField("id", T.LongType()),
        T.StructField("score", T.DoubleType()),
        T.StructField("name", T.StringType()),
    ])
    df = read_delimited(spark, str(p), schema).cache()
    try:
        assert "_corrupt_record" in df.columns
        good = df.where(F.col("_corrupt_record").isNull())
        bad = df.where(F.col("_corrupt_record").isNotNull())
        assert good.count() == 2 and bad.count() == 2
        assert {r.id for r in good.collect()} == {1, 3}
        # the raw malformed lines are preserved for triage
        assert {r._corrupt_record for r in bad.collect()} == {
            "2,notanumber,b", "bad-row",
        }
    finally:
        df.unpersist()


def test_read_delimited_tsv_dropmalformed(spark, tmp_path):
    from feature_engineering_tk_spark.sources import read_delimited

    p = tmp_path / "m.tsv"
    p.write_text("id\tv\n1\t2\nx\ty\tz\n3\t4\n")
    schema = T.StructType([
        T.StructField("id", T.LongType()),
        T.StructField("v", T.LongType()),
    ])
    df = read_delimited(spark, str(p), schema, delimiter="\t", mode="DROPMALFORMED")
    assert sorted((r.id, r.v) for r in df.collect()) == [(1, 2), (3, 4)]


def test_read_delimited_bad_mode(spark):
    from feature_engineering_tk_spark.sources import read_delimited

    with pytest.raises(ValueError):
        read_delimited(spark, "/tmp/x.csv", T.StructType([]), mode="LENIENT")

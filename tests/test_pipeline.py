"""Pipeline: lineage journal, checkpoint resume determinism, leakage
guard, partition-level anti-join resume, skew metrics, salted agg."""

import json
import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from feature_engineering_tk_spark.operators import window_features as W
from feature_engineering_tk_spark.operators.salted import salted_group_agg
from feature_engineering_tk_spark.plans import metrics as M
from feature_engineering_tk_spark.plans.pipeline import Pipeline, strict_no_future


def _mkpipe(tmp_path, tag):
    wd = os.path.join(str(tmp_path), tag)
    p = Pipeline(workdir=wd, entity="conv_id", partition_col="ds")
    p.add("sessionize", lambda df: W.sessionize(df), {"gap_s": 1800})
    p.add("lag", lambda df: W.with_lag(df, "tokens", 1), {"k": 1}, checkpoint=True)
    p.add(
        "rolling",
        lambda df: W.rolling_agg(df, "tokens", "mean", 5),
        {"w": 5},
    )
    return p


@pytest.fixture()
def with_ds(transcripts):
    return transcripts.withColumn("ds", F.to_date("ts"))


def test_pipeline_run_and_journal(spark, with_ds, tmp_path):
    p = _mkpipe(tmp_path, "run1")
    out = p.run(spark, with_ds)
    assert out.count() == with_ds.count()
    lines = [json.loads(l) for l in open(p.journal_path)]
    stages = [l["stage"] for l in lines if l["event"] == "stage"]
    assert stages == ["sessionize", "lag", "rolling"]
    ckpt = [l for l in lines if l["stage"] == "lag"][0]
    assert ckpt["partitions"], "per-partition lineage missing"
    assert ckpt["bytes"] > 0
    assert ckpt["skew"]["rows"] == with_ds.count()


def test_pipeline_resume_skips_completed(spark, with_ds, tmp_path):
    p = _mkpipe(tmp_path, "run2")
    first = p.run(spark, with_ds).toPandas()
    # resume: stage fns before the checkpoint must NOT run again
    p2 = _mkpipe(tmp_path, "run2")

    def boom(df):
        raise AssertionError("pre-checkpoint stage re-ran on resume")

    p2.stages[0].fn = boom
    p2.stages[1].fn = boom
    second = p2.run(spark, with_ds).toPandas()
    key = ["conv_id", "turn_idx"]
    a = first.sort_values(key).reset_index(drop=True)
    b = second.sort_values(key).reset_index(drop=True)
    assert np.allclose(
        a["tokens_roll_mean5"], b["tokens_roll_mean5"], equal_nan=True
    )
    resumed = [json.loads(l) for l in open(p2.journal_path) if "resume" in l]
    assert any(r.get("event") == "resume" for r in resumed)


def test_strict_no_future_blocks_leaks(transcripts):
    with strict_no_future():
        with pytest.raises(W.FutureLeakError):
            W.with_lead(transcripts, "tokens", 1, allow_future=True)
        with pytest.raises(W.FutureLeakError):
            W.backward_fill(transcripts, ["score"], allow_future=True)
    # restored afterwards
    assert W.with_lead(transcripts, "tokens", 1, allow_future=True) is not None


def test_remaining_partitions_anti_join(spark, with_ds, tmp_path):
    p = _mkpipe(tmp_path, "run3")
    p.run(spark, with_ds)
    remaining = p.remaining_partitions(spark, with_ds, "lag")
    assert remaining.count() == 0  # everything materialized
    # new partition appears → only it flows through
    new = with_ds.limit(10).withColumn("ds", F.lit("2030-01-01").cast("date"))
    appended = with_ds.unionByName(new)
    rem2 = p.remaining_partitions(spark, appended, "lag")
    assert rem2.count() == 10


def test_entity_skew_detects_hot_keys(spark):
    import pandas as pd

    pdf = pd.DataFrame(
        {"conv_id": ["hot"] * 900 + [f"c{i}" for i in range(100)], "x": range(1000)}
    )
    df = spark.createDataFrame(pdf)
    m = M.entity_skew(df, "conv_id", buckets=32)
    assert m["skew_ratio"] > 5
    hot = M.hot_entities(df, "conv_id", top=1)
    assert hot[0]["entity"] == "hot" and hot[0]["rows"] == 900


def test_salted_group_agg_matches_plain(transcripts, transcripts_pdf):
    got = (
        salted_group_agg(
            transcripts, "conv_id", "tokens", ["mean", "sum", "count", "std", "min", "max"]
        )
        .toPandas()
        .sort_values("conv_id")
        .reset_index(drop=True)
    )
    exp = (
        transcripts_pdf.groupby("conv_id")["tokens"]
        .agg(["mean", "sum", "count", "std", "min", "max"])
        .reset_index()
        .sort_values("conv_id")
        .reset_index(drop=True)
    )
    assert np.allclose(got["tokens_mean"], exp["mean"])
    assert np.allclose(got["tokens_sum"], exp["sum"])
    assert np.allclose(got["tokens_count"], exp["count"])
    assert np.allclose(got["tokens_std"], exp["std"], equal_nan=True)
    assert np.allclose(got["tokens_min"], exp["min"])
    assert np.allclose(got["tokens_max"], exp["max"])


def test_journal_records_shuffle_bytes(spark, transcripts, tmp_path):
    """Lineage journal carries per-stage execution metrics (shuffle
    read/write bytes, tasks) from the JVM AppStatusStore — the
    'shuffle bytes' leg of the north-rule lineage triple."""
    import json

    from pyspark.sql import functions as F

    from feature_engineering_tk_spark.operators import window_features as W
    from feature_engineering_tk_spark.plans.pipeline import Pipeline

    pipe = Pipeline(str(tmp_path / "wd"), entity="conv_id", partition_col="ds")
    pipe.add("feat", lambda df: W.sessionize(df, 1800.0).withColumn("ds", F.to_date("ts")), checkpoint=True)
    pipe.run(spark, transcripts, resume=False)

    records = [json.loads(l) for l in open(pipe.journal_path)]
    stage_rec = next(r for r in records if r.get("stage") == "feat")
    assert "exec" in stage_rec
    # sessionize shuffles on conv_id; the checkpoint write reads input
    assert stage_rec["exec"]["shuffle_write_bytes"] > 0
    assert stage_rec["exec"]["tasks"] > 0

"""As-of join parity vs pandas merge_asof, including tie (equal-ts)
semantics and tolerance."""

import numpy as np
import pandas as pd
import pytest

from feature_engineering_tk_spark.operators.asof import asof_join, asof_join_broadcast


@pytest.fixture(scope="module")
def asof_frames(spark, transcripts_pdf):
    # anchors: user turns; features: assistant/tool turns carrying score
    pdf = transcripts_pdf
    left_pdf = (
        pdf[pdf.role == "user"][["conv_id", "turn_idx", "ts"]].reset_index(drop=True)
    )
    right_pdf = (
        pdf[pdf.role != "user"][["conv_id", "ts", "tokens"]]
        .drop_duplicates(subset=["conv_id", "ts"], keep="last")
        .reset_index(drop=True)
    )
    left = spark.createDataFrame(left_pdf)
    right = spark.createDataFrame(right_pdf)
    return left, right, left_pdf, right_pdf


def _oracle(left_pdf, right_pdf, tolerance=None):
    kw = {}
    if tolerance is not None:
        kw["tolerance"] = pd.Timedelta(seconds=tolerance)
    exp = pd.merge_asof(
        left_pdf.sort_values("ts", kind="mergesort"),
        right_pdf.sort_values("ts", kind="mergesort").rename(columns={"tokens": "tokens_asof"}),
        on="ts",
        by="conv_id",
        direction="backward",
        allow_exact_matches=True,
        **kw,
    )
    return exp.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)


def _collect(df):
    return (
        df.toPandas().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    )


def test_asof_union_window(asof_frames):
    left, right, left_pdf, right_pdf = asof_frames
    got = _collect(asof_join(left, right, entity="conv_id", value_cols=["tokens"]))
    exp = _oracle(left_pdf, right_pdf)
    assert np.allclose(
        got["tokens_asof"].astype(float), exp["tokens_asof"].astype(float), equal_nan=True
    )


def test_asof_broadcast_variant(asof_frames):
    left, right, left_pdf, right_pdf = asof_frames
    got = _collect(asof_join_broadcast(left, right, entity="conv_id", value_cols=["tokens"]))
    exp = _oracle(left_pdf, right_pdf)
    assert np.allclose(
        got["tokens_asof"].astype(float), exp["tokens_asof"].astype(float), equal_nan=True
    )


def test_asof_tolerance(asof_frames):
    left, right, left_pdf, right_pdf = asof_frames
    got = _collect(
        asof_join(left, right, entity="conv_id", value_cols=["tokens"], tolerance_seconds=120)
    )
    exp = _oracle(left_pdf, right_pdf, tolerance=120)
    assert np.allclose(
        got["tokens_asof"].astype(float), exp["tokens_asof"].astype(float), equal_nan=True
    )


def test_asof_exact_ts_tie_included(spark):
    """feature.ts == anchor.ts must match (<= semantics)."""
    left = spark.createDataFrame(
        pd.DataFrame(
            {
                "conv_id": ["a", "a"],
                "turn_idx": [0, 1],
                "ts": pd.to_datetime(["2024-01-01 00:00:00", "2024-01-01 00:10:00"]),
            }
        )
    )
    right = spark.createDataFrame(
        pd.DataFrame(
            {
                "conv_id": ["a", "a"],
                "ts": pd.to_datetime(["2024-01-01 00:00:00", "2024-01-01 00:10:00"]),
                "v": [1.0, 2.0],
            }
        )
    )
    got = (
        asof_join(left, right, value_cols=["v"])
        .toPandas()
        .sort_values("turn_idx")["v_asof"]
        .tolist()
    )
    assert got == [1.0, 2.0]

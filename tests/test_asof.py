"""As-of join parity vs pandas merge_asof, including tie (equal-ts)
semantics and tolerance."""

import numpy as np
import pandas as pd
import pytest

from pyspark.sql import functions as F

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


def test_range_join_agg_matches_bruteforce(spark, transcripts):
    """Bucketed range join == brute-force pandas range merge."""
    from feature_engineering_tk_spark.operators.asof import range_join_agg

    anchors = transcripts.filter(F.col("role") == "user").select(
        "conv_id", "turn_idx", "ts"
    )
    feats = transcripts.filter(F.col("role") == "assistant").select(
        "conv_id", "ts", F.col("tokens").cast("double").alias("tok")
    )
    got = (
        range_join_agg(
            anchors, feats, entity="conv_id", window_seconds=120.0,
            value_col="tok", funcs=("count", "sum", "max"),
        )
        .toPandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )

    ap = anchors.toPandas()
    fp = feats.toPandas()
    m = ap.merge(fp, on="conv_id", suffixes=("", "_f"))
    m = m[(m.ts_f <= m.ts) & (m.ts_f >= m.ts - pd.Timedelta(seconds=120))]
    g = m.groupby(["conv_id", "turn_idx"])["tok"].agg(["count", "sum", "max"])
    exp = (
        ap.set_index(["conv_id", "turn_idx"])
        .join(g)
        .fillna({"count": 0})
        .reset_index()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    assert (got["tok_range_count"] == exp["count"]).all()
    assert np.allclose(
        got["tok_range_sum"].fillna(-1), exp["sum"].fillna(-1)
    )
    assert np.allclose(
        got["tok_range_max"].fillna(-1), exp["max"].fillna(-1)
    )


def test_range_join_agg_leakage_free(spark, transcripts):
    """Deleting future rows must not change any anchor's range aggregate."""
    from feature_engineering_tk_spark.operators.asof import range_join_agg

    anchors = transcripts.filter(F.col("role") == "user").select(
        "conv_id", "turn_idx", "ts"
    )
    feats = transcripts.select("conv_id", "ts", F.col("tokens").cast("double").alias("tok"))
    full = range_join_agg(anchors, feats, entity="conv_id", window_seconds=300.0,
                          value_col="tok", funcs=("sum",)).toPandas()
    cut = full["ts"].quantile(0.5)
    trunc = range_join_agg(
        anchors.filter(F.col("ts") <= F.lit(cut)),
        feats.filter(F.col("ts") <= F.lit(cut)),
        entity="conv_id", window_seconds=300.0, value_col="tok", funcs=("sum",),
    ).toPandas()
    merged = full[full.ts <= cut].merge(
        trunc, on=["conv_id", "turn_idx"], suffixes=("_full", "_trunc")
    )
    assert len(merged) == len(trunc)
    assert np.allclose(
        merged["tok_range_sum_full"].fillna(-1), merged["tok_range_sum_trunc"].fillna(-1)
    )


def test_asof_packed_matches_merge_asof(asof_frames):
    from feature_engineering_tk_spark.operators.asof import asof_join_packed

    left, right, left_pdf, right_pdf = asof_frames
    got = _collect(asof_join_packed(left, right, entity="conv_id", value_cols=["tokens"]))
    exp = _oracle(left_pdf, right_pdf)
    assert np.allclose(
        got["tokens_asof"].astype(float), exp["tokens_asof"].astype(float), equal_nan=True
    )


def test_asof_packed_tolerance_and_ties(spark, asof_frames):
    from feature_engineering_tk_spark.operators.asof import asof_join_packed

    left, right, left_pdf, right_pdf = asof_frames
    got = _collect(
        asof_join_packed(
            left, right, entity="conv_id", value_cols=["tokens"], tolerance_seconds=120
        )
    )
    exp = _oracle(left_pdf, right_pdf, tolerance=120)
    assert np.allclose(
        got["tokens_asof"].astype(float), exp["tokens_asof"].astype(float), equal_nan=True
    )
    # equal-ts feature matches (<= semantics)
    l2 = spark.createDataFrame(
        pd.DataFrame({"conv_id": ["a"], "turn_idx": [0],
                      "ts": pd.to_datetime(["2024-01-01 00:00:00"])})
    )
    r2 = spark.createDataFrame(
        pd.DataFrame({"conv_id": ["a"], "ts": pd.to_datetime(["2024-01-01 00:00:00"]),
                      "v": [7.0]})
    )
    assert asof_join_packed(l2, r2, value_cols=["v"]).first()["v_asof"] == 7.0


def test_asof_packed_missing_entity_is_null(spark):
    from feature_engineering_tk_spark.operators.asof import asof_join_packed

    left = spark.createDataFrame(
        pd.DataFrame({"conv_id": ["a", "b"], "turn_idx": [0, 0],
                      "ts": pd.to_datetime(["2024-01-01", "2024-01-01"])})
    )
    right = spark.createDataFrame(
        pd.DataFrame({"conv_id": ["a"], "ts": pd.to_datetime(["2023-12-31"]),
                      "v": [1.0]})
    )
    out = asof_join_packed(left, right, value_cols=["v"]).toPandas().set_index("conv_id")
    assert out.loc["a", "v_asof"] == 1.0 and np.isnan(out.loc["b", "v_asof"])


def test_asof_packed_reuses_left_partitioning(spark, transcripts):
    """The pipeline fast path: dropped onto a window-feature stack the
    packed as-of must add NO exchange on the big left side — the left
    branch of the plan keeps exactly the window's single conv_id
    exchange (the union-tag path re-shuffles everything instead)."""
    from feature_engineering_tk_spark.operators import window_features as W
    from feature_engineering_tk_spark.operators.asof import asof_join, asof_join_packed

    feat = W.rolling_agg(transcripts, "tokens", "mean", 3)
    tools = transcripts.filter(F.col("tool").isNotNull()).select("conv_id", "ts", "tool")

    packed_plan = (
        asof_join_packed(feat, tools, value_cols=["tool"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    union_plan = (
        asof_join(feat, tools, value_cols=["tool"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    import re

    def shuffles(plan):
        return len(re.findall(r"Exchange hashpartitioning", plan))

    # union path: window exchange + union re-shuffle; packed path: the
    # window exchange + the entity-sized packed aggregation only — and
    # the left (fat) side appears under exactly one exchange
    assert shuffles(packed_plan) <= shuffles(union_plan)
    # the window's exchange is the ONLY one whose input scans transcripts
    # via the left branch: no second hashpartitioning over the feature table
    assert packed_plan.count("Window") >= 1


def _oracle_directed(left_pdf, right_pdf, direction, tolerance=None):
    kw = {}
    if tolerance is not None:
        kw["tolerance"] = pd.Timedelta(seconds=tolerance)
    exp = pd.merge_asof(
        left_pdf.sort_values("ts", kind="mergesort"),
        right_pdf.sort_values("ts", kind="mergesort").rename(
            columns={"tokens": "tokens_asof"}
        ),
        on="ts",
        by="conv_id",
        direction=direction,
        allow_exact_matches=True,
        **kw,
    )
    return exp.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)


@pytest.mark.parametrize("direction", ["forward", "nearest"])
@pytest.mark.parametrize("tolerance", [None, 120.0])
def test_directed_matches_pandas(asof_frames, direction, tolerance):
    from feature_engineering_tk_spark.operators.asof import asof_join_directed

    left, right, left_pdf, right_pdf = asof_frames
    got = _collect(
        asof_join_directed(
            left,
            right,
            value_cols=["tokens"],
            direction=direction,
            tolerance_seconds=tolerance,
            allow_future=True,
        )
    )
    exp = _oracle_directed(left_pdf, right_pdf, direction, tolerance)
    assert np.array_equal(
        got["tokens_asof"].to_numpy(dtype=float),
        exp["tokens_asof"].to_numpy(dtype=float),
        equal_nan=True,
    )


def test_directed_backward_delegates(asof_frames):
    from feature_engineering_tk_spark.operators.asof import asof_join_directed

    left, right, left_pdf, right_pdf = asof_frames
    got = _collect(asof_join_directed(left, right, value_cols=["tokens"]))
    exp = _oracle(left_pdf, right_pdf)
    assert np.array_equal(
        got["tokens_asof"].to_numpy(dtype=float),
        exp["tokens_asof"].to_numpy(dtype=float),
        equal_nan=True,
    )


def test_directed_nearest_tie_prefers_backward(spark):
    from feature_engineering_tk_spark.operators.asof import asof_join_directed

    left = spark.createDataFrame(
        [("c1", 0, pd.Timestamp("2026-01-01 00:00:10").to_pydatetime())],
        "conv_id string, turn_idx int, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            ("c1", pd.Timestamp("2026-01-01 00:00:05").to_pydatetime(), 1.0),
            ("c1", pd.Timestamp("2026-01-01 00:00:15").to_pydatetime(), 2.0),
        ],
        "conv_id string, ts timestamp, v double",
    )
    got = asof_join_directed(
        left, right, value_cols=["v"], direction="nearest", allow_future=True
    ).collect()
    assert got[0]["v_asof"] == 1.0  # equidistant -> backward wins


def test_directed_requires_future_opt_in(asof_frames):
    from feature_engineering_tk_spark.operators.window_features import FutureLeakError
    from feature_engineering_tk_spark.operators.asof import asof_join_directed

    left, right, _, _ = asof_frames
    for d in ("forward", "nearest"):
        with pytest.raises(FutureLeakError, match="allow_future"):
            asof_join_directed(left, right, direction=d)
    with pytest.raises(ValueError, match="direction"):
        asof_join_directed(left, right, direction="sideways", allow_future=True)


def test_directed_single_exchange(asof_frames):
    """nearest = ONE exchange (two sorts over it), same shuffle cost
    class as the backward union-tag path."""
    import re

    from feature_engineering_tk_spark.operators.asof import asof_join_directed

    left, right, _, _ = asof_frames
    plan = (
        asof_join_directed(
            left, right, value_cols=["tokens"], direction="nearest",
            allow_future=True,
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert len(set(re.findall(r"Exchange hashpartitioning", plan))) <= 1

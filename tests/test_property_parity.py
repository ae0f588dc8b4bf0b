"""Property-based parity tests (hypothesis) for the SURVEY §7 'hard
parts': pandas edge semantics that are easy to get almost-right —
qcut/cut edges, positional interpolation, titlecase, mode tie-breaks,
label-encode rank — checked against pandas on arbitrary generated
frames, not hand-picked examples.

One shared Spark round-trip helper keeps runtime sane (each property
runs a small number of examples; the point is edge discovery, not
volume)."""

import math

import numpy as np
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SET = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)


finite = st.floats(
    min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False, width=32
)


@given(vals=st.lists(finite, min_size=8, max_size=40), bins=st.integers(2, 5))
@SET
def test_qcut_parity(spark, vals, bins):
    from feature_engineering_tk_spark.transforms.binning import QuantileBinner

    pdf = pd.DataFrame({"v": np.array(vals, dtype=float)})
    try:
        expected = pd.qcut(pdf["v"], bins, labels=False, duplicates="drop")
    except ValueError:
        return  # constant column — engine raises too (covered in unit tests)
    if expected.isna().all():
        return
    df = spark.createDataFrame(pdf)
    try:
        got = (
            QuantileBinner(bins=bins)
            .fit(df, "v")
            .transform(df, out="b")
            .toPandas()
            .sort_values("v")["b"]
        )
    except ValueError:
        assert pdf["v"].nunique() <= 1
        return
    exp = expected[pdf["v"].sort_values().index]
    assert [x if not pd.isna(x) else None for x in got] == [
        x if not pd.isna(x) else None for x in exp
    ]


@given(
    vals=st.lists(finite, min_size=4, max_size=30),
    bins=st.integers(2, 5),
)
@SET
def test_uniform_cut_parity(spark, vals, bins):
    from feature_engineering_tk_spark.transforms.binning import UniformBinner

    pdf = pd.DataFrame({"v": np.array(vals, dtype=float)})
    if pdf["v"].nunique() <= 1:
        return
    expected = pd.cut(pdf["v"], bins, labels=False)
    df = spark.createDataFrame(pdf)
    got = (
        UniformBinner(bins=bins)
        .fit(df, "v")
        .transform(df, out="b")
        .toPandas()
        .sort_values("v")["b"]
    )
    exp = expected[pdf["v"].sort_values().index]
    assert [x if not pd.isna(x) else None for x in got] == [
        x if not pd.isna(x) else None for x in exp
    ]


@given(
    vals=st.lists(st.one_of(st.none(), finite), min_size=3, max_size=25),
)
@SET
def test_interpolate_parity(spark, vals):
    from feature_engineering_tk_spark.operators.window_features import interpolate_linear

    pdf = pd.DataFrame(
        {
            "conv_id": ["c"] * len(vals),
            "turn_idx": range(len(vals)),
            "v": [float(x) if x is not None else np.nan for x in vals],
        }
    )
    expected = pdf["v"].interpolate(method="linear")
    df = spark.createDataFrame(pdf)
    got = (
        interpolate_linear(df, ["v"], entity="conv_id", order="turn_idx")
        .toPandas()
        .sort_values("turn_idx")["v"]
        .reset_index(drop=True)
    )
    for g, e in zip(got, expected):
        if pd.isna(e):
            assert pd.isna(g)
        else:
            assert math.isclose(g, e, rel_tol=1e-9, abs_tol=1e-12)


text_strategy = st.text(
    alphabet=st.characters(
        whitelist_categories=("Lu", "Ll", "Nd", "Zs"),
        whitelist_characters="-_'.,!?",
        max_codepoint=0x2FF,
    ),
    max_size=30,
)


@given(texts=st.lists(text_strategy, min_size=1, max_size=15))
@SET
def test_titlecase_parity(spark, texts):
    """pandas str.title() titlecases after ANY non-alpha — the initcap
    trap (SURVEY §2.13); exact string equality required."""
    from feature_engineering_tk_spark.functions.strings import clean_strings

    pdf = pd.DataFrame({"i": range(len(texts)), "t": texts})
    df = spark.createDataFrame(pdf)
    got = (
        clean_strings(df, ["t"], ["title"])
        .toPandas()
        .sort_values("i")["t"]
        .tolist()
    )
    assert got == pdf["t"].str.title().tolist()


@given(
    vals=st.lists(st.integers(0, 5), min_size=1, max_size=40),
)
@SET
def test_mode_impute_smallest_tie(spark, vals):
    """pandas mode()[0] = smallest among max-count ties."""
    from feature_engineering_tk_spark.transforms.impute import Imputer

    pdf = pd.DataFrame(
        {"i": range(len(vals) + 1), "v": [float(x) for x in vals] + [np.nan]}
    )
    df = spark.createDataFrame(pdf)
    out = Imputer(strategy="mode").fit(df, ["v"]).transform(df).toPandas()
    filled = out.sort_values("i")["v"].iloc[-1]
    assert filled == pdf["v"].mode().iloc[0]


@given(cats=st.lists(st.sampled_from(["a", "b", "c", "d", "E", "ß"]), min_size=1, max_size=30))
@SET
def test_label_encode_rank_parity(spark, cats):
    """codes = rank in lexicographically sorted uniques (sklearn
    LabelEncoder fit on str values)."""
    from feature_engineering_tk_spark.transforms.encode import LabelEncoder

    pdf = pd.DataFrame({"i": range(len(cats)), "c": cats})
    df = spark.createDataFrame(pdf)
    out = LabelEncoder().fit(df, "c").transform(df, out="code").toPandas()
    got = out.sort_values("i")["code"].tolist()
    vocab = {v: i for i, v in enumerate(sorted(set(cats)))}
    assert got == [vocab[c] for c in cats]

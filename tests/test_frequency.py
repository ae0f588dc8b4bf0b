"""Heavy hitters / frequency spectrum / Misra-Gries sketch."""

import random
from collections import Counter

import pytest

from feature_engineering_tk_spark.exceptions import ColumnNotFoundError
from feature_engineering_tk_spark.operators.frequency import (
    frequency_spectrum,
    heavy_hitters,
    misra_gries,
)


def _zipf_tokens(seed=11, n=3000, vocab=200):
    rng = random.Random(seed)
    toks = []
    for _ in range(n):
        # heavy-tailed: rank r chosen with p ~ 1/r
        r = min(int(1 / max(rng.random(), 1e-9)), vocab)
        toks.append(f"tok{r:04d}")
    return toks


@pytest.fixture(scope="module")
def tokens(spark):
    toks = _zipf_tokens()
    df = spark.createDataFrame([(t,) for t in toks], "token string").repartition(6)
    return df, toks


def test_heavy_hitters_exact(spark, tokens):
    df, toks = tokens
    truth = Counter(toks)
    got = heavy_hitters(df, "token", k=10).collect()
    want = sorted(truth.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert [(r["value"], r["n_rows"]) for r in got] == want
    assert got[0]["share"] == pytest.approx(want[0][1] / len(toks))
    # output is already in rank order
    assert [r["n_rows"] for r in got] == sorted(
        (r["n_rows"] for r in got), reverse=True
    )


def test_heavy_hitters_excludes_nulls(spark):
    df = spark.createDataFrame([("a",), (None,), ("a",), ("b",)], "v string")
    got = heavy_hitters(df, "v", k=5).collect()
    assert [(r["value"], r["n_rows"]) for r in got] == [("a", 2), ("b", 1)]
    assert got[0]["share"] == pytest.approx(2 / 3)


def test_frequency_spectrum(spark, tokens):
    df, toks = tokens
    truth = Counter(Counter(toks).values())
    got = {r["frequency"]: r["n_values"] for r in frequency_spectrum(df, "token").collect()}
    assert got == dict(truth)


def test_missing_column_raises(spark, tokens):
    df, _ = tokens
    with pytest.raises(ColumnNotFoundError):
        heavy_hitters(df, "nope")
    with pytest.raises(ColumnNotFoundError):
        frequency_spectrum(df, "nope")


def test_misra_gries_guarantee(spark, tokens):
    df, toks = tokens
    truth = Counter(toks)
    n = len(toks)
    width = 32
    sketch = dict(misra_gries(df, "token", width=width))
    assert len(sketch) <= width
    for v, est in sketch.items():
        # never overestimates; undercount bounded by n/width
        assert est <= truth[v]
        assert truth[v] - est <= n / width
    # every value more frequent than n/width must survive the sketch
    for v, cnt in truth.items():
        if cnt > n / width:
            assert v in sketch


def test_misra_gries_small_width(spark):
    df = spark.createDataFrame(
        [("a",)] * 50 + [("b",)] * 30 + [(f"x{i}",) for i in range(20)], "v string"
    )
    sketch = dict(misra_gries(df, "v", width=2))
    assert "a" in sketch and sketch["a"] <= 50
    assert 50 - sketch["a"] <= 100 / 2

"""Session cache registry (plans/caching.py): lazy operator builders
pin corpus-scan-saving aggregates; a long-lived session can release
them deterministically instead of waiting on LRU pressure."""

import pandas as pd
from pyspark.sql import functions as F

from feature_engineering_tk_spark.plans import caching


def test_pin_release_cycle(spark):
    caching.release_pinned()  # isolate from other tests
    df = spark.createDataFrame(pd.DataFrame({"x": range(100)}))
    agg = caching.pin(df.groupBy((F.col("x") % 3).alias("k")).count())
    assert caching.pinned_count() == 1
    assert agg.storageLevel.useMemory  # persisted
    agg.count()
    released = caching.release_pinned(blocking=True)
    assert released == 1
    assert caching.pinned_count() == 0
    assert not agg.storageLevel.useMemory  # cache dropped


def test_operators_register_their_pins(spark):
    from feature_engineering_tk_spark.functions.text import bigram_lm_score

    caching.release_pinned()
    docs = spark.createDataFrame(
        pd.DataFrame(
            {"doc_id": range(20), "text": [f"alpha beta gamma {i % 3}" for i in range(20)]}
        )
    )
    out = bigram_lm_score(docs, "text", id_col="doc_id")
    assert caching.pinned_count() == 1  # the c12 count table
    assert out.count() == 20
    assert caching.release_pinned(blocking=True) == 1
    # released plans still recompute correctly
    assert out.count() == 20

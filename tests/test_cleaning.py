"""PII scrubbing + repetition signals (functions/cleaning.py)."""

import pytest

from feature_engineering_tk_spark.functions.cleaning import (
    repetition_features,
    scrub_pii,
)


def test_scrub_pii_all_kinds(spark):
    df = spark.createDataFrame(
        [
            (0, "mail me at jane.doe+spam@sub.example.co.uk today"),
            (1, "server at 192.168.1.254 is down"),
            (2, "call +1(555)867-5309 now"),
            (3, "clean text stays clean"),
            (4, "two mails: a@b.io and c.d@e-f.org!"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["text"] for r in scrub_pii(df, "text").collect()}
    assert got[0] == "mail me at <EMAIL> today"
    assert got[1] == "server at <IP> is down"
    assert got[2] == "call <PHONE> now"
    assert got[3] == "clean text stays clean"
    assert got[4] == "two mails: <EMAIL> and <EMAIL>!"


def test_repetition_features(spark):
    df = spark.createDataFrame(
        [
            (0, "spam spam spam spam spam"),          # one dominant 2-gram
            (1, "all words here are unique tokens"),  # no repetition
            (2, "line a\nline a\nline b"),            # duplicate line
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in repetition_features(df, ns=(2,)).collect()}
    assert got[0]["top2gram_frac"] == pytest.approx(1.0)      # every 2-gram identical
    # 5 unique 2-grams → max 1 of 5
    assert got[1]["top2gram_frac"] == pytest.approx(0.2)
    assert got[1]["dup_line_frac"] == pytest.approx(0.0)
    assert got[2]["dup_line_frac"] == pytest.approx(1.0 - 2.0 / 3.0)

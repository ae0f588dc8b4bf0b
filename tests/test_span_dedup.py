"""exact_span_dedup (Lee et al. ExactSubstr, bounded-window analog):
keep-first policy, overlap union, within-doc repeats, untouched docs
byte-identical."""

import pytest
from pyspark.sql import functions as F

from feature_engineering_tk_spark.operators.dedup import exact_span_dedup

BOILER = "b1 b2 b3 b4 b5"  # 5 tokens; window=4 → two overlapping spans


@pytest.fixture(scope="module")
def result(spark):
    rows = [
        (0, BOILER + " alpha beta"),                 # first occurrence → kept whole
        (1, "intro words here " + BOILER),           # losing copy → 5 tokens removed
        (2, "short doc"),                            # < window → untouched
        (3, "p q r s p q r s"),                      # within-doc repeat of a 4-gram
        (4, None),                                   # null text → zero row
        (5, "odd   spacing\tkept   verbatim"),       # untouched → byte-identical
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = exact_span_dedup(df, window=4)
    return {r["doc_id"]: r for r in out.collect()}


def test_first_occurrence_kept(result):
    assert result[0]["clean_text"] == BOILER + " alpha beta"
    assert result[0]["n_removed"] == 0


def test_losing_copy_removed_with_overlap_union(result):
    # both 4-gram spans of the 5-token boiler lose → union covers all 5
    assert result[1]["clean_text"] == "intro words here"
    assert result[1]["n_removed"] == 5
    assert result[1]["n_tokens"] == 8


def test_short_doc_untouched(result):
    assert result[2]["clean_text"] == "short doc"
    assert result[2]["n_removed"] == 0


def test_within_doc_repeat_keeps_first(result):
    assert result[3]["clean_text"] == "p q r s"
    assert result[3]["n_removed"] == 4


def test_null_text_keeps_zero_row(result):
    assert result[4]["clean_text"] == ""
    assert result[4]["n_tokens"] == 0 and result[4]["n_removed"] == 0


def test_untouched_doc_is_byte_identical(result):
    assert result[5]["clean_text"] == "odd   spacing\tkept   verbatim"


def test_rebuild_confined_to_touched_docs(spark):
    """Scale shape: documents without removals must not reach the
    collect_list rebuild — the plan semi-joins the removed-doc set."""
    df = spark.createDataFrame(
        [(i, " ".join(f"tok{i}_{j}" for j in range(10))) for i in range(20)],
        "doc_id long, text string",
    )
    out = exact_span_dedup(df, window=4)
    assert out.where(F.col("n_removed") > 0).count() == 0
    assert out.count() == 20

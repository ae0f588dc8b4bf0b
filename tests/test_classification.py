"""Binary-classifier evaluation metrics vs brute-force references.

Every metric is recomputed here with a pure-Python simulator over the
collected rows (sort + O(n²) pair counting where that is the
definition), so the distributed prefix-sum formulations are pinned to
the textbook semantics rather than to themselves.
"""

import math
import random

import pytest

from pyspark.sql import functions as F

from feature_engineering_tk_spark.analysis.classification import (
    average_precision,
    confusion_at_threshold,
    gains_table,
    log_loss_brier,
    roc_auc,
    roc_curve,
    score_separation_ks,
)
from feature_engineering_tk_spark.exceptions import InsufficientDataError


def _sample(seed=7, n=400, ties=True):
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        y = rng.random() < 0.35
        base = 0.62 if y else 0.41
        s = base + rng.gauss(0, 0.2)
        if ties:
            s = round(s, 1)  # force heavy score ties
        rows.append((float(s), int(y)))
    return rows


def _brute_auc(rows):
    gt = ties = 0
    pos = [s for s, y in rows if y]
    neg = [s for s, y in rows if not y]
    for p in pos:
        for q in neg:
            if p > q:
                gt += 1
            elif p == q:
                ties += 1
    return (gt + 0.5 * ties) / (len(pos) * len(neg))


def _brute_ap(rows):
    pos_total = sum(y for _, y in rows)
    thresholds = sorted({s for s, _ in rows}, reverse=True)
    ap, prev_recall = 0.0, 0.0
    for t in thresholds:
        tp = sum(1 for s, y in rows if y and s >= t)
        pp = sum(1 for s, _ in rows if s >= t)
        recall = tp / pos_total
        ap += (recall - prev_recall) * (tp / pp)
        prev_recall = recall
    return ap


@pytest.fixture(scope="module")
def scored(spark):
    rows = _sample()
    df = spark.createDataFrame(rows, "score double, label int").repartition(4)
    return df, rows


def test_roc_auc_matches_pair_counting(spark, scored):
    df, rows = scored
    got = roc_auc(df, "score", "label").first()
    assert got["n_pos"] == sum(y for _, y in rows)
    assert got["n_neg"] == sum(1 - y for _, y in rows)
    assert got["auc"] == pytest.approx(_brute_auc(rows), abs=1e-12)


@pytest.mark.parametrize("flip", [False, True])
def test_roc_auc_extremes(spark, flip):
    rows = [(float(i), int((i >= 50) != flip)) for i in range(100)]
    df = spark.createDataFrame(rows, "score double, label int")
    auc = roc_auc(df, "score", "label").first()["auc"]
    assert auc == (0.0 if flip else 1.0)


def test_roc_auc_single_class_raises(spark):
    df = spark.createDataFrame([(0.3, 1), (0.8, 1)], "score double, label int")
    with pytest.raises(InsufficientDataError):
        roc_auc(df, "score", "label")


def test_roc_curve_points(spark, scored):
    df, rows = scored
    pts = {r["threshold"]: r for r in roc_curve(df, "score", "label").collect()}
    P = sum(y for _, y in rows)
    N = len(rows) - P
    assert set(pts) == {s for s, _ in rows}
    for t, r in pts.items():
        tp = sum(1 for s, y in rows if y and s >= t)
        fp = sum(1 for s, y in rows if not y and s >= t)
        assert r["tp"] == tp and r["fp"] == fp
        assert r["tpr"] == pytest.approx(tp / P, abs=0)
        assert r["fpr"] == pytest.approx(fp / N, abs=0)
        assert r["precision"] == pytest.approx(tp / (tp + fp), abs=0)


def test_average_precision_matches_step_definition(spark, scored):
    df, rows = scored
    got = average_precision(df, "score", "label").first()
    assert got["average_precision"] == pytest.approx(_brute_ap(rows), rel=1e-12)


def test_confusion_at_threshold(spark, scored):
    df, rows = scored
    thr = 0.5
    got = confusion_at_threshold(df, "score", "label", thr).first()
    tp = sum(1 for s, y in rows if y and s >= thr)
    fp = sum(1 for s, y in rows if not y and s >= thr)
    fn = sum(1 for s, y in rows if y and s < thr)
    tn = sum(1 for s, y in rows if not y and s < thr)
    assert (got["tp"], got["fp"], got["fn"], got["tn"]) == (tp, fp, fn, tn)
    assert got["accuracy"] == pytest.approx((tp + tn) / len(rows))
    assert got["precision"] == pytest.approx(tp / (tp + fp))
    assert got["recall"] == pytest.approx(tp / (tp + fn))
    assert got["f1"] == pytest.approx(2 * tp / (2 * tp + fp + fn))
    mcc = (tp * tn - fp * fn) / math.sqrt(
        (tp + fp) * (tp + fn) * (tn + fp) * (tn + fn)
    )
    assert got["mcc"] == pytest.approx(mcc)


def test_confusion_degenerate_nulls(spark):
    # no predicted positives -> precision NULL, recall 0
    df = spark.createDataFrame([(0.1, 1), (0.2, 0)], "score double, label int")
    got = confusion_at_threshold(df, "score", "label", 0.9).first()
    assert got["precision"] is None
    assert got["recall"] == 0.0


def test_log_loss_brier(spark):
    rows = [(0.9, 1), (0.1, 0), (0.4, 1), (0.7, 0)]
    df = spark.createDataFrame(rows, "score double, label int")
    got = log_loss_brier(df, "score", "label").first()
    ll = -sum(
        (y * math.log(s) + (1 - y) * math.log(1 - s)) for s, y in rows
    ) / len(rows)
    br = sum((s - y) ** 2 for s, y in rows) / len(rows)
    assert got["log_loss"] == pytest.approx(ll, rel=1e-12)
    assert got["brier"] == pytest.approx(br, rel=1e-12)


def test_log_loss_clamps_confident_wrong(spark):
    df = spark.createDataFrame([(1.0, 0), (0.0, 1)], "score double, label int")
    got = log_loss_brier(df, "score", "label").first()
    assert math.isfinite(got["log_loss"])
    assert got["brier"] == pytest.approx(1.0)


def test_gains_table(spark, scored):
    df, rows = scored
    out = {r["bucket"]: r for r in gains_table(df, "score", "label", n_buckets=5).collect()}
    total = len(rows)
    total_pos = sum(y for _, y in rows)
    assert sum(r["n"] for r in out.values()) == total
    assert sum(r["n_pos"] for r in out.values()) == total_pos
    # bucket 1 holds the highest scores: its pos_rate beats the bottom bucket
    top, bottom = out[min(out)], out[max(out)]
    assert top["pos_rate"] > bottom["pos_rate"]
    # cumulative columns telescope and capture ends at 1
    bkts = sorted(out)
    cum_n = cum_p = 0
    for b in bkts:
        cum_n += out[b]["n"]
        cum_p += out[b]["n_pos"]
        assert out[b]["cum_n"] == cum_n
        assert out[b]["cum_pos"] == cum_p
        lift = (cum_p / cum_n) / (total_pos / total)
        assert out[b]["lift"] == pytest.approx(lift)
    assert out[bkts[-1]]["cum_capture"] == pytest.approx(1.0)


def test_score_separation_ks(spark, scored):
    df, rows = scored
    got = score_separation_ks(df, "score", "label").first()
    # brute force: max |TPR - FPR| over distinct thresholds
    P = sum(y for _, y in rows)
    N = len(rows) - P
    best = 0.0
    for t in sorted({s for s, _ in rows}):
        tpr = sum(1 for s, y in rows if y and s <= t) / P
        fpr = sum(1 for s, y in rows if not y and s <= t) / N
        best = max(best, abs(tpr - fpr))
    # ks_statistic_df rounds d_stat to 9 digits at the result boundary
    assert got["d_stat"] == pytest.approx(best, abs=1e-9)


def test_multiclass_confusion_and_metrics(spark):
    from feature_engineering_tk_spark.analysis.classification import (
        multiclass_confusion,
        multiclass_metrics,
    )

    rows = [
        ("a", "a"), ("a", "a"), ("a", "b"),
        ("b", "b"), ("b", "c"),  # 'c' predicted but never true
    ]
    df = spark.createDataFrame(rows, "y string, p string")
    cm = {(r["label"], r["predicted"]): r["n"] for r in multiclass_confusion(df, "p", "y").collect()}
    assert cm == {("a", "a"): 2, ("a", "b"): 1, ("b", "b"): 1, ("b", "c"): 1}
    m = multiclass_metrics(df, "p", "y").first()
    assert (m["n"], m["n_classes"]) == (5, 3)
    assert m["accuracy"] == pytest.approx(3 / 5)
    # per-class: a: pr 2/2, rc 2/3; b: pr 1/2, rc 1/2; c: pr 0 (0/1), rc 0 (no true)
    assert m["macro_precision"] == pytest.approx((1.0 + 0.5 + 0.0) / 3)
    assert m["macro_recall"] == pytest.approx((2 / 3 + 0.5 + 0.0) / 3)
    f1a = 2 * 1.0 * (2 / 3) / (1.0 + 2 / 3)
    assert m["macro_f1"] == pytest.approx((f1a + 0.5 + 0.0) / 3)

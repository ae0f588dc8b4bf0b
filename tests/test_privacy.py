"""k-anonymity / l-diversity audits vs hand-computed expectations."""

import pytest

from feature_engineering_tk_spark.operators.privacy import (
    k_anonymity,
    k_anonymity_annotate,
    l_diversity,
)


def _pop(spark):
    # (region, age_band, disease)
    rows = [
        ("north", "30s", "flu"),
        ("north", "30s", "flu"),
        ("north", "30s", "cold"),
        ("south", "40s", "flu"),      # singleton quasi group
        ("east", "20s", "cold"),
        ("east", "20s", "cold"),      # homogeneous sensitive value
    ]
    return spark.createDataFrame(rows, "region string, age string, disease string")


class TestKAnonymity:
    def test_group_sizes_and_risk(self, spark):
        out = {(r["region"], r["age"]): r
               for r in k_anonymity(_pop(spark), ["region", "age"], k=3).collect()}
        assert out[("north", "30s")]["group_size"] == 3
        assert not out[("north", "30s")]["is_risky"]
        assert out[("south", "40s")]["group_size"] == 1
        assert out[("south", "40s")]["is_risky"]
        assert out[("east", "20s")]["is_risky"]

    def test_nulls_group_together(self, spark):
        df = spark.createDataFrame(
            [(None, "x"), (None, "x"), ("a", "x")], "q string, v string"
        )
        out = {r["q"]: r["group_size"]
               for r in k_anonymity(df, ["q"], k=2).collect()}
        assert out[None] == 2 and out["a"] == 1

    def test_annotate_marks_every_row(self, spark):
        out = k_anonymity_annotate(_pop(spark), ["region", "age"], k=3).collect()
        assert len(out) == 6
        by_region = {}
        for r in out:
            by_region.setdefault(r["region"], set()).add(r["k_anonymous"])
        assert by_region["north"] == {True}
        assert by_region["south"] == {False}

    def test_empty_quasi_rejected(self, spark):
        with pytest.raises(ValueError):
            k_anonymity(_pop(spark), [], k=2)


class TestLDiversity:
    def test_homogeneous_group_is_risky(self, spark):
        out = {(r["region"]): r
               for r in l_diversity(_pop(spark), ["region"], "disease", l=2).collect()}
        assert out["north"]["n_sensitive"] == 2 and not out["north"]["is_risky"]
        assert out["east"]["n_sensitive"] == 1 and out["east"]["is_risky"]
        assert out["south"]["group_size"] == 1 and out["south"]["is_risky"]

    def test_null_sensitive_excluded_from_distinct(self, spark):
        df = spark.createDataFrame(
            [("g", None), ("g", "flu")], "q string, s string"
        )
        r = l_diversity(df, ["q"], "s", l=2).first()
        assert r["n_sensitive"] == 1 and r["is_risky"]

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


class TestPseudonymize:
    def test_consistent_and_salted(self, spark):
        from feature_engineering_tk_spark.operators.privacy import pseudonymize

        df = spark.createDataFrame(
            [(1, "alice"), (2, "alice"), (3, "bob"), (4, None)],
            "rid int, user string",
        )
        out = pseudonymize(df, ["user"]).toPandas().set_index("rid")["user"]
        # same value -> same token; different value -> different token
        assert out[1] == out[2] and out[1] != out[3]
        assert out[1].startswith("user_") and len(out[1]) == len("user_") + 12
        assert out.isna()[4]
        # original values never appear
        assert "alice" not in set(out.dropna())
        # a different salt breaks cross-release linkage
        other = pseudonymize(df, ["user"], salt="rel2").toPandas().set_index("rid")["user"]
        assert other[1] != out[1] and other[1] == other[2]

    def test_referential_integrity_survives(self, spark):
        from feature_engineering_tk_spark.operators.privacy import pseudonymize

        a = spark.createDataFrame([("u1", 10), ("u2", 20)], "user string, x int")
        b = spark.createDataFrame([("u1", "A")], "user string, tag string")
        pa, pb = pseudonymize(a, ["user"]), pseudonymize(b, ["user"])
        assert pa.join(pb, "user").count() == 1

    def test_keep_bits_validated(self, spark):
        from feature_engineering_tk_spark.operators.privacy import pseudonymize

        df = spark.createDataFrame([("x",)], "user string")
        with pytest.raises(ValueError):
            pseudonymize(df, ["user"], keep_bits=7)


class TestDateShift:
    def test_intervals_preserved_dates_moved(self, spark):
        import pandas as pd

        from feature_engineering_tk_spark.operators.privacy import date_shift

        df = spark.createDataFrame(
            pd.DataFrame(
                {
                    "user": ["a", "a", "b", "b"],
                    "ts": pd.to_datetime(
                        ["2024-01-01 00:00", "2024-01-03 06:00",
                         "2024-01-01 00:00", "2024-01-05 00:00"]
                    ),
                }
            )
        )
        out = date_shift(df, "ts", "user", max_shift_days=30).toPandas()
        got = out.groupby("user")["ts"].agg(["min", "max"])
        # within-entity interval exactly preserved
        assert got.loc["a", "max"] - got.loc["a", "min"] == pd.Timedelta("2 days 6 hours")
        assert got.loc["b", "max"] - got.loc["b", "min"] == pd.Timedelta("4 days")
        # shift is bounded and whole-day
        src = pd.Timestamp("2024-01-01 00:00")
        for u in ("a", "b"):
            delta = got.loc[u, "min"] - src
            assert abs(delta.days) <= 30 and delta == pd.Timedelta(days=delta.days)

    def test_deterministic_across_runs(self, spark):
        import pandas as pd

        from feature_engineering_tk_spark.operators.privacy import date_shift

        df = spark.createDataFrame(
            pd.DataFrame({"user": ["a"], "ts": pd.to_datetime(["2024-06-01"])})
        )
        t1 = date_shift(df, "ts", "user").first()["ts"]
        t2 = date_shift(df, "ts", "user").first()["ts"]
        assert t1 == t2
        t3 = date_shift(df, "ts", "user", salt="other").first()["ts"]
        assert t3 != t1  # salt moves the offset (true for this fixture)

"""chi2_drift(group_col=...) per-segment sweep + welch_ttest
(round 14 continuation): the grouped categorical p-value scan bh_fdr
exists for, and the cheapest mean-shift p-value."""

import math

import pytest
from pyspark.sql import functions as F

from spark_df_profiling_spark.operators.drift import (
    bh_fdr, chi2_drift, mannwhitney_2samp, welch_ttest)
from tests.test_round14_chi2_drift import _py_chi2_g


def _mk_grouped(spark, per_group):
    rows = [(g, v) for g, counts in per_group.items()
            for v, n in counts.items() for _ in range(n)]
    return spark.createDataFrame(rows, "g string, c string")


class TestChi2DriftGrouped:
    def test_per_group_matches_ungrouped_per_subset(self, spark):
        rc = {"en": {"a": 30, "b": 50}, "fr": {"a": 10, "b": 5}}
        nc = {"en": {"a": 20, "b": 70}, "fr": {"a": 9, "b": 6}}
        ref, new = _mk_grouped(spark, rc), _mk_grouped(spark, nc)
        got = {r["group"]: r for r in
               chi2_drift(ref, new, ["c"], group_col="g").collect()}
        assert set(got) == {"en", "fr"}
        for g in ("en", "fr"):
            chi2, gstat, dof = _py_chi2_g(rc[g], nc[g])
            assert got[g]["chi2"] == pytest.approx(chi2, rel=1e-12)
            assert got[g]["g_stat"] == pytest.approx(gstat, rel=1e-12)
            assert got[g]["dof"] == dof
            sub_r = ref.where(F.col("g") == g)
            sub_n = new.where(F.col("g") == g)
            ung = chi2_drift(sub_r, sub_n, ["c"]).collect()[0]
            assert got[g]["p_chi2"] == pytest.approx(ung["p_chi2"])

    def test_one_side_only_group_dropped(self, spark):
        ref = _mk_grouped(spark, {"en": {"a": 5, "b": 5}})
        new = _mk_grouped(spark, {"en": {"a": 5, "b": 5},
                                  "de": {"a": 9}})
        got = chi2_drift(ref, new, ["c"], group_col="g").collect()
        assert {r["group"] for r in got} == {"en"}

    def test_null_groups_excluded(self, spark):
        ref = spark.createDataFrame(
            [("en", "a"), (None, "a"), ("en", "b")],
            "g string, c string")
        got = chi2_drift(ref, ref, ["c"], group_col="g").collect()
        assert {r["group"] for r in got} == {"en"}

    def test_missing_group_col_raises(self, spark):
        ref = spark.createDataFrame([("a",)], "c string")
        with pytest.raises(ValueError, match="group column"):
            chi2_drift(ref, ref, ["c"], group_col="nope")

    def test_bh_fdr_per_column_family(self, spark):
        import random
        rng = random.Random(4)
        rows_r, rows_n = [], []
        langs = [f"l{i}" for i in range(8)]
        for g in langs:
            for _ in range(600):
                rows_r.append((g, str(rng.randint(0, 3))))
                # plant drift only in l0
                hi = 7 if g == "l0" else 3
                rows_n.append((g, str(min(rng.randint(0, hi), 3))))
        ref = spark.createDataFrame(rows_r, "g string, c string")
        new = spark.createDataFrame(rows_n, "g string, c string")
        out = bh_fdr(chi2_drift(ref, new, ["c"], group_col="g"),
                     "p_chi2", alpha=0.05, group_col="column")
        got = {r["group"]: r["bh_rejected"] for r in out.collect()}
        assert got["l0"] is True
        assert sum(1 for v in got.values() if v) <= 2  # FDR holds


class TestWelchTtest:
    def test_matches_reference_formula(self, spark):
        a = [1.0, 2.0, 3.5, 2.5, 4.0, 3.0, 2.0]
        b = [3.0, 4.5, 5.0, 4.0, 6.0]
        ref = spark.createDataFrame([(x,) for x in a], "v double")
        new = spark.createDataFrame([(x,) for x in b], "v double")
        row = welch_ttest(ref, new, ["v"]).collect()[0]

        def mean(x):
            return sum(x) / len(x)

        def var(x):
            m = mean(x)
            return sum((xi - m) ** 2 for xi in x) / (len(x) - 1)
        se2 = var(a) / len(a) + var(b) / len(b)
        t = (mean(b) - mean(a)) / math.sqrt(se2)
        dof = se2 ** 2 / ((var(a) / len(a)) ** 2 / (len(a) - 1)
                          + (var(b) / len(b)) ** 2 / (len(b) - 1))
        p = math.erfc(abs(t) / math.sqrt(2))
        assert row["t"] == pytest.approx(t, rel=1e-12)
        assert row["dof"] == pytest.approx(dof, rel=1e-12)
        assert row["p_value"] == pytest.approx(p, abs=2e-7)
        assert row["effect"] == pytest.approx(mean(b) - mean(a))

    def test_multi_column_one_row_each(self, spark):
        ref = spark.range(100).select(
            (F.col("id") % 10).cast("double").alias("x"),
            (F.col("id") % 7).cast("double").alias("y"))
        new = ref.select((F.col("x") + 5.0).alias("x"), "y")
        rows = {r["column"]: r for r in
                welch_ttest(ref, new, ["x", "y"]).collect()}
        assert rows["x"]["p_value"] < 1e-10
        assert rows["y"]["p_value"] == pytest.approx(1.0)
        assert rows["x"]["effect"] == pytest.approx(5.0)

    def test_constant_columns_null_t(self, spark):
        ref = spark.createDataFrame([(1.0,)] * 10, "v double")
        row = welch_ttest(ref, ref, ["v"]).collect()[0]
        assert row["t"] is None and row["p_value"] is None

    def test_single_row_side_null(self, spark):
        ref = spark.createDataFrame([(1.0,)], "v double")
        new = spark.createDataFrame([(1.0,), (2.0,)], "v double")
        row = welch_ttest(ref, new, ["v"]).collect()[0]
        assert row["t"] is None and row["p_value"] is None


class TestMannWhitneyByGroup:
    def test_matches_ungrouped_per_subset(self, spark):
        import random
        rng = random.Random(11)
        rows_r = [(g, float(rng.randint(0, 30)))
                  for g in ("en", "fr") for _ in range(80)]
        rows_n = [(g, float(rng.randint(0, 30)
                            + (8 if g == "fr" else 0)))
                  for g in ("en", "fr") for _ in range(70)]
        ref = spark.createDataFrame(rows_r, "g string, v double")
        new = spark.createDataFrame(rows_n, "g string, v double")
        from spark_df_profiling_spark.operators.drift import (
            mannwhitney_by_group)
        got = {r["g"]: r for r in
               mannwhitney_by_group(ref, new, "v", "g").collect()}
        for g in ("en", "fr"):
            sub = mannwhitney_2samp(
                ref.where(F.col("g") == g),
                new.where(F.col("g") == g), "v").collect()[0]
            assert got[g]["u_stat"] == pytest.approx(sub["u_stat"])
            assert got[g]["z"] == pytest.approx(sub["z"], rel=1e-12)
            assert got[g]["p_value"] == pytest.approx(
                sub["p_value"], rel=1e-9)
        assert got["fr"]["p_value"] < 0.01 < got["en"]["p_value"]

    def test_one_side_only_group_dropped_and_ties_null(self, spark):
        ref = spark.createDataFrame(
            [("a", 1.0), ("a", 1.0), ("c", 2.0)], "g string, v double")
        new = spark.createDataFrame(
            [("a", 1.0), ("b", 5.0)], "g string, v double")
        from spark_df_profiling_spark.operators.drift import (
            mannwhitney_by_group)
        got = {r["g"]: r for r in
               mannwhitney_by_group(ref, new, "v", "g").collect()}
        assert set(got) == {"a"}        # b/c are one-sided
        assert got["a"]["z"] is None    # all values tied


class TestDriftTestReport:
    def test_matches_components_and_bh(self, spark):
        from spark_df_profiling_spark.operators.drift import (
            drift_test_report, ks_2samp)
        ref = spark.range(400).select(
            (F.col("id") % 50).cast("double").alias("x"),
            (F.col("id") % 3).cast("string").alias("c"))
        new = spark.range(400).select(
            ((F.col("id") % 50) + 15).cast("double").alias("x"),
            (F.col("id") % 4).cast("string").alias("c"))
        rep = drift_test_report(ref, new, ["x"], ["c"]).collect()
        by = {(r["column"], r["test"]): r for r in rep}
        assert set(by) == {("x", "welch"), ("x", "mannwhitney"),
                           ("x", "ks"), ("c", "chi2")}
        # component equality spot-checks
        ks = ks_2samp(ref, new, "x").collect()[0]
        assert by[("x", "ks")]["stat"] == pytest.approx(ks["d_stat"])
        assert by[("x", "ks")]["p_value"] == pytest.approx(
            ks["p_value"])
        w = welch_ttest(ref, new, ["x"]).collect()[0]
        assert by[("x", "welch")]["p_value"] == pytest.approx(
            w["p_value"])
        x2 = chi2_drift(ref, new, ["c"]).collect()[0]
        assert by[("c", "chi2")]["p_value"] == pytest.approx(
            x2["p_chi2"])
        # planted shifts everywhere -> the whole family rejects
        assert all(r["bh_rejected"] for r in rep)
        assert all(r["bh_m"] == 4 for r in rep)

    def test_stable_data_nothing_rejected(self, spark):
        from spark_df_profiling_spark.operators.drift import (
            drift_test_report)
        df = spark.range(500).select(
            (F.col("id") % 50).cast("double").alias("x"),
            (F.col("id") % 3).cast("string").alias("c"))
        rep = drift_test_report(df, df, ["x"], ["c"]).collect()
        assert all(not r["bh_rejected"] for r in rep)

    def test_no_columns_raises(self, spark):
        from spark_df_profiling_spark.operators.drift import (
            drift_test_report)
        df = spark.range(5).select(F.col("id").cast("double")
                                   .alias("x"))
        with pytest.raises(ValueError, match="no columns"):
            drift_test_report(df, df)

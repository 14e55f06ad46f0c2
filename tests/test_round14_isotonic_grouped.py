"""Grouped isotonic calibration (round 14): isotonic_fit_by (exact
weighted PAV per group over the bounded distinct-(group,score) frame)
+ the grouped isotonic_apply routing (two broadcast HASH joins on the
group key, segment range as residual — never a nested loop)."""

import pytest
from pyspark.sql import functions as F

from spark_df_profiling_spark.operators.evaluation import (
    _pav_weighted, isotonic_apply, isotonic_fit, isotonic_fit_by)


def _maxmin_fit(points):
    """Brute-force exact PAV via the max-min formula:
    fitted(i) = max_{j<=i} min_{k>=i} weightedmean(points[j..k])."""
    n = len(points)
    out = []
    for i in range(n):
        best = None
        for j in range(i + 1):
            worst = None
            for k in range(i, n):
                seg = points[j:k + 1]
                m = (sum(my * w for _, my, w in seg)
                     / sum(w for _, _, w in seg))
                worst = m if worst is None else min(worst, m)
            best = worst if best is None else max(best, worst)
        out.append(best)
    return out


class TestPavWeighted:
    def test_matches_maxmin_formula(self):
        pts = [(0.0, 0.8, 2.0), (1.0, 0.2, 1.0), (2.0, 0.6, 3.0),
               (3.0, 0.1, 1.0), (4.0, 0.9, 2.0), (5.0, 0.9, 1.0)]
        bs, ps = _pav_weighted(pts)
        fitted = dict(zip(bs, ps))
        expect = _maxmin_fit(pts)
        for (s, _, _), e in zip(pts, expect):
            # every training score inside a block gets the block value;
            # block endpoints are in the state directly
            if s in fitted:
                assert fitted[s] == pytest.approx(e, rel=1e-12), s
        # monotone non-decreasing predictions, ascending boundaries
        assert bs == sorted(bs)
        assert all(a <= b + 1e-15 for a, b in zip(ps, ps[1:]))

    def test_already_monotone_keeps_every_point(self):
        pts = [(float(i), i / 10.0, 1.0) for i in range(10)]
        bs, ps = _pav_weighted(pts)
        assert bs == [float(i) for i in range(10)]
        assert ps == pytest.approx([i / 10.0 for i in range(10)])

    def test_fully_reversed_pools_to_one_block(self):
        pts = [(float(i), 1.0 - i / 4.0, 1.0) for i in range(5)]
        bs, ps = _pav_weighted(pts)
        assert bs == [0.0, 4.0]
        assert ps[0] == pytest.approx(ps[1])
        assert ps[0] == pytest.approx(sum(1.0 - i / 4.0
                                          for i in range(5)) / 5)


def _fixture(spark):
    import random
    rng = random.Random(5)
    rows = []
    for g in ("en", "fr"):
        bias = 0.3 if g == "fr" else 0.0
        for i in range(120):
            s = float(rng.randint(0, 14))
            p = min(max(s / 14.0 + bias - 0.15, 0.0), 1.0)
            rows.append((g, s, 1.0 if rng.random() < p else 0.0))
    return rows, spark.createDataFrame(
        rows, "g string, s double, y double")


class TestIsotonicFitBy:
    def test_matches_per_group_ml_fit_applied(self, spark):
        """Per-group PAV == the ml (ungrouped) fit run on each group's
        subset: applied values agree on a probe grid."""
        rows, df = _fixture(spark)
        gst = isotonic_fit_by(df, "y", "s", "g")
        probe = spark.createDataFrame(
            [(g, s / 2.0) for g in ("en", "fr") for s in range(-2, 32)],
            "g string, s double")
        got = {(r["g"], r["s"]): r["score_calibrated"]
               for r in isotonic_apply(probe, gst, "s").collect()}
        for g in ("en", "fr"):
            sub = df.where(F.col("g") == g)
            st = isotonic_fit(sub, "y", "s")
            exp = {r["s"]: r["score_calibrated"] for r in
                   isotonic_apply(probe.where(F.col("g") == g)
                                  .drop("g"), st, "s").collect()}
            for s_val, e in exp.items():
                assert got[(g, s_val)] == pytest.approx(
                    e, rel=1e-9), (g, s_val)

    def test_state_shape_and_counts(self, spark):
        rows, df = _fixture(spark)
        gst = isotonic_fit_by(df, "y", "s", "g")
        assert gst["group_col"] == "g"
        assert set(gst["groups"]) == {"en", "fr"}
        assert gst["n"] == len(rows)
        for st in gst["groups"].values():
            assert len(st["boundaries"]) == len(st["predictions"])
            assert st["boundaries"] == sorted(st["boundaries"])

    def test_max_group_boundaries_loud(self, spark):
        df = spark.range(100).select(
            F.lit("g").alias("g"),
            F.col("id").cast("double").alias("s"),
            (F.col("id") % 2).cast("double").alias("y"))
        with pytest.raises(ValueError, match="max_group_boundaries"):
            isotonic_fit_by(df, "y", "s", "g",
                            max_group_boundaries=10)

    def test_total_cap_loud(self, spark):
        df = spark.range(100).select(
            (F.col("id") % 4).cast("string").alias("g"),
            F.col("id").cast("double").alias("s"),
            (F.col("id") % 2).cast("double").alias("y"))
        with pytest.raises(ValueError, match="max_boundaries"):
            isotonic_fit_by(df, "y", "s", "g", max_boundaries=50)

    def test_null_rows_excluded(self, spark):
        df = spark.createDataFrame(
            [("a", 1.0, 1.0), ("a", 2.0, 0.0), (None, 1.0, 1.0),
             ("a", None, 1.0), ("a", 3.0, None)],
            "g string, s double, y double")
        gst = isotonic_fit_by(df, "y", "s", "g")
        assert set(gst["groups"]) == {"a"}
        assert gst["groups"]["a"]["n"] == 2


class TestGroupedApply:
    def test_plan_hash_joins_no_nlj_no_python(self, spark):
        rows, df = _fixture(spark)
        gst = isotonic_fit_by(df, "y", "s", "g")
        out = isotonic_apply(df, gst, "s")
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan
        assert "BroadcastNestedLoopJoin" not in plan
        assert "Python" not in plan

    def test_unseen_group_and_null_score_are_null(self, spark):
        rows, df = _fixture(spark)
        gst = isotonic_fit_by(df, "y", "s", "g")
        probe = spark.createDataFrame(
            [("de", 5.0), ("en", None), (None, 5.0)],
            "g string, s double")
        got = isotonic_apply(probe, gst, "s").collect()
        assert all(r["score_calibrated"] is None for r in got)

    def test_clamps_outside_fitted_range(self, spark):
        rows, df = _fixture(spark)
        gst = isotonic_fit_by(df, "y", "s", "g")
        en = gst["groups"]["en"]
        probe = spark.createDataFrame(
            [("en", en["boundaries"][0] - 99.0),
             ("en", en["boundaries"][-1] + 99.0)], "g string, s double")
        got = sorted(r["score_calibrated"]
                     for r in isotonic_apply(probe, gst, "s").collect())
        assert got[0] == pytest.approx(en["predictions"][0])
        assert got[1] == pytest.approx(en["predictions"][-1])

    def test_single_boundary_group(self, spark):
        df = spark.createDataFrame(
            [("a", 2.0, 1.0), ("a", 2.0, 0.0)],
            "g string, s double, y double")
        gst = isotonic_fit_by(df, "y", "s", "g")
        probe = spark.createDataFrame(
            [("a", 2.0), ("a", 1.0), ("a", 3.0)], "g string, s double")
        got = [r["score_calibrated"]
               for r in isotonic_apply(probe, gst, "s").collect()]
        assert all(v == pytest.approx(0.5) for v in got)

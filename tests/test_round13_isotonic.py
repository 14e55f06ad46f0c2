"""isotonic_fit / isotonic_apply (round 13) vs a pure-python PAV.

The fit collapses rows to the weighted distinct-score frame, runs
Spark ML's parallel PAV, and freezes (boundaries, predictions) as
driver state; apply is a broadcast range join with linear
interpolation.  At every TRAINING score the applied value must equal
the exact PAV solution — pinned here against a weighted pool-adjacent-
violators reference; the same contract is oracle-graded via the
max-min formula in DuckDB ('iso' rows, knn_bruteforce slot).
"""

import random

import pytest
from pyspark.sql import functions as F

from spark_df_profiling_spark.operators.evaluation import (
    isotonic_apply, isotonic_fit)


def _pav(points):
    """Weighted PAV: points = [(x, mean_y, w)] sorted by x ->
    {x: fitted}."""
    blocks = []   # [w, wy, [xs]]
    for x, y, w in points:
        blocks.append([w, y * w, [x]])
        while (len(blocks) > 1
               and blocks[-2][1] / blocks[-2][0]
               > blocks[-1][1] / blocks[-1][0] + 1e-15):
            w2, s2, xs2 = blocks.pop()
            blocks[-1][0] += w2
            blocks[-1][1] += s2
            blocks[-1][2].extend(xs2)
    out = {}
    for w, wy, xs in blocks:
        for x in xs:
            out[x] = wy / w
    return out


def _fixture(spark, n=400, seed=13):
    rng = random.Random(seed)
    rows = []
    for _ in range(n):
        s = float(rng.randint(0, 14))          # 15 distinct, ties
        p = min(0.9, 0.05 + s / 16)            # monotone-ish truth
        rows.append((1.0 if rng.random() < p else 0.0, s))
    return rows, spark.createDataFrame(rows, "y double, s double")


class TestIsotonic:
    def test_training_scores_match_pav(self, spark):
        rows, df = _fixture(spark)
        state = isotonic_fit(df, "y", "s")
        assert state["n"] == len(rows)
        by_s = {}
        for y, s in rows:
            by_s.setdefault(s, []).append(y)
        points = sorted(
            (s, sum(v) / len(v), float(len(v)))
            for s, v in by_s.items())
        expect = _pav(points)
        probe = spark.createDataFrame(
            [(s,) for s in sorted(by_s)], "s double")
        got = {r["s"]: r["score_calibrated"] for r in
               isotonic_apply(probe, state, "s").collect()}
        for s, f in expect.items():
            assert got[s] == pytest.approx(f, abs=1e-9), s

    def test_output_monotone_and_clamped(self, spark):
        rows, df = _fixture(spark)
        state = isotonic_fit(df, "y", "s")
        probe = spark.createDataFrame(
            [(x / 2,) for x in range(-4, 34)] + [(None,)],
            "s double")
        out = sorted(
            ((r["s"], r["score_calibrated"])
             for r in isotonic_apply(probe, state, "s").collect()
             if r["s"] is not None))
        vals = [v for _, v in out]
        assert all(a <= b + 1e-12 for a, b in zip(vals, vals[1:]))
        assert vals[0] == pytest.approx(state["predictions"][0])
        assert vals[-1] == pytest.approx(state["predictions"][-1])
        nulls = [r["score_calibrated"] for r in
                 isotonic_apply(probe, state, "s").collect()
                 if r["s"] is None]
        assert nulls == [None]

    def test_perfectly_monotone_labels_identity(self, spark):
        df = spark.createDataFrame(
            [(float(i), float(i)) for i in range(10)],
            "y double, s double")
        state = isotonic_fit(df, "y", "s")
        got = {r["s"]: r["score_calibrated"] for r in
               isotonic_apply(
                   spark.createDataFrame(
                       [(float(i),) for i in range(10)], "s double"),
                   state, "s").collect()}
        for i in range(10):
            assert got[float(i)] == pytest.approx(float(i), abs=1e-9)

    def test_guards(self, spark):
        df = spark.createDataFrame([(None, 1.0)], "y double, s double")
        with pytest.raises(ValueError, match="no non-NULL"):
            isotonic_fit(df, "y", "s")
        rows, dff = _fixture(spark, n=50)
        with pytest.raises(ValueError, match="max_boundaries"):
            isotonic_fit(dff, "y", "s", max_boundaries=3)
        with pytest.raises(ValueError, match="missing column"):
            isotonic_fit(dff, "y", "zz")

    def test_apply_plan_no_join_no_python(self, spark):
        """r14: the default (when-tree) path is join-free — the r13
        inequality-only broadcast join executed as
        BroadcastNestedLoopJoin, O(rows x n_seg) predicate evals."""
        rows, df = _fixture(spark, n=60)
        state = isotonic_fit(df, "y", "s")
        out = isotonic_apply(df, state, "s")
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastNestedLoopJoin" not in plan
        assert "Join" not in plan        # pure projection
        assert "Python" not in plan

    def test_apply_bucketed_plan_is_hash_join(self, spark):
        """Above when_tree_max the plan is a broadcast HASH join on
        the bucket id (equality key), never a nested loop."""
        rows, df = _fixture(spark, n=60)
        state = isotonic_fit(df, "y", "s")
        if len(state["boundaries"]) - 1 < 4:
            import pytest as _pt
            _pt.skip("fixture fitted fewer than 4 segments")
        out = isotonic_apply(df, state, "s", when_tree_max=2)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan
        assert "BroadcastNestedLoopJoin" not in plan
        assert "Python" not in plan

    def test_bucketed_path_matches_when_tree(self, spark):
        rows, df = _fixture(spark, n=60)
        state = isotonic_fit(df, "y", "s")
        a = {r["s"]: r["score_calibrated"]
             for r in isotonic_apply(df, state, "s").collect()}
        b = {r["s"]: r["score_calibrated"]
             for r in isotonic_apply(df, state, "s",
                                     when_tree_max=2).collect()}
        assert a == b

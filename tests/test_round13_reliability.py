"""mcnemar_test + cronbach_alpha (round 13) vs python references."""

import pytest
from pyspark.sql import functions as F


class TestMcNemar:
    def test_matches_hand_counts(self, spark):
        from spark_df_profiling_spark.operators.evaluation import (
            mcnemar_test)
        # label 1; A right/B wrong x 6 (b), A wrong/B right x 2 (c),
        # both right x 5, both wrong x 3
        rows = ([(1, 1, 0)] * 6 + [(1, 0, 1)] * 2
                + [(1, 1, 1)] * 5 + [(1, 0, 0)] * 3)
        df = spark.createDataFrame(rows, "y int, pa int, pb int")
        r = mcnemar_test(df, "y", "pa", "pb").collect()[0]
        assert (r["n"], r["n_both_correct"], r["b"], r["c"],
                r["n_both_wrong"]) == (16, 5, 6, 2, 3)
        # chi2 = (|6-2|-1)^2 / 8 = 9/8
        assert r["chi2"] == pytest.approx(9 / 8)

    def test_no_disagreement_null_chi2(self, spark):
        from spark_df_profiling_spark.operators.evaluation import (
            mcnemar_test)
        df = spark.createDataFrame(
            [(1, 1, 1)] * 4 + [(1, 0, 0)] * 2, "y int, pa int, pb int")
        r = mcnemar_test(df, "y", "pa", "pb").collect()[0]
        assert r["b"] == 0 and r["c"] == 0 and r["chi2"] is None

    def test_grouped_and_null_exclusion(self, spark):
        from spark_df_profiling_spark.operators.evaluation import (
            mcnemar_test)
        rows = ([("g0", 1, 1, 0)] * 3 + [("g0", 1, 0, 1)] * 1
                + [("g1", 1, 1, 1)] * 2
                + [(None, 1, 1, 0), ("g0", None, 1, 0),
                   ("g0", 1, None, 0)])
        df = spark.createDataFrame(
            rows, "g string, y int, pa int, pb int")
        got = {r["g"]: r for r in
               mcnemar_test(df, "y", "pa", "pb",
                            group_col="g").collect()}
        assert set(got) == {"g0", "g1"}
        assert got["g0"]["n"] == 4 and got["g0"]["b"] == 3
        assert got["g0"]["chi2"] == pytest.approx((3 - 1 - 1) ** 2 / 4)
        assert got["g1"]["chi2"] is None

    def test_single_scan_single_aggregate(self, spark):
        from spark_df_profiling_spark.operators.evaluation import (
            mcnemar_test)
        df = spark.createDataFrame([(1, 1, 0)], "y int, pa int, pb int")
        plan = (mcnemar_test(df, "y", "pa", "pb")
                ._jdf.queryExecution().executedPlan().toString())
        assert plan.count("Exchange") <= 1

    def test_missing_column(self, spark):
        from spark_df_profiling_spark.operators.evaluation import (
            mcnemar_test)
        df = spark.createDataFrame([(1, 1)], "y int, pa int")
        with pytest.raises(ValueError, match="missing column"):
            mcnemar_test(df, "y", "pa", "nope")


class TestCronbachAlpha:
    def test_matches_python_formula(self, spark):
        import random

        from spark_df_profiling_spark.operators.correlation import (
            cronbach_alpha)
        rng = random.Random(5)
        rows = []
        for _ in range(200):
            t = rng.gauss(0, 2)           # latent construct
            rows.append((t + rng.gauss(0, 1), t + rng.gauss(0, 1),
                         t + rng.gauss(0, 1)))
        df = spark.createDataFrame(rows, "a double, b double, c double")
        r = cronbach_alpha(df, ["a", "b", "c"]).collect()[0]

        import statistics
        cols = list(zip(*rows))
        sv = sum(statistics.variance(c) for c in cols)
        tv = statistics.variance([sum(x) for x in rows])
        exp = 3 / 2 * (1 - sv / tv)
        assert r["n"] == 200 and r["k_items"] == 3
        assert r["alpha"] == pytest.approx(exp, rel=1e-9)
        assert 0.5 < r["alpha"] < 1.0   # correlated items cohere

    def test_uncorrelated_items_low_alpha(self, spark):
        import random

        from spark_df_profiling_spark.operators.correlation import (
            cronbach_alpha)
        rng = random.Random(9)
        rows = [(rng.random(), rng.random()) for _ in range(500)]
        df = spark.createDataFrame(rows, "a double, b double")
        r = cronbach_alpha(df, ["a", "b"]).collect()[0]
        assert abs(r["alpha"]) < 0.3

    def test_constant_composite_null(self, spark):
        from spark_df_profiling_spark.operators.correlation import (
            cronbach_alpha)
        # a + b constant -> total_var = 0 -> alpha NULL
        df = spark.createDataFrame(
            [(float(i), float(10 - i)) for i in range(20)],
            "a double, b double")
        r = cronbach_alpha(df, ["a", "b"]).collect()[0]
        assert r["total_var"] == pytest.approx(0.0)
        assert r["alpha"] is None

    def test_listwise_deletion_and_bounds(self, spark):
        from spark_df_profiling_spark.operators.correlation import (
            cronbach_alpha)
        df = spark.createDataFrame(
            [(1.0, 2.0), (2.0, 4.0), (None, 1.0), (3.0, None)],
            "a double, b double")
        assert cronbach_alpha(df, ["a", "b"]).collect()[0]["n"] == 2
        with pytest.raises(ValueError, match=">= 2 items"):
            cronbach_alpha(df, ["a"])
        with pytest.raises(ValueError, match="missing column"):
            cronbach_alpha(df, ["a", "zz"])


class TestSpearmanMatrix:
    @staticmethod
    def _py_spearman(xs, ys):
        def avg_ranks(vals):
            order = sorted(range(len(vals)), key=lambda i: vals[i])
            ranks = [0.0] * len(vals)
            i = 0
            while i < len(order):
                j = i
                while (j + 1 < len(order)
                       and vals[order[j + 1]] == vals[order[i]]):
                    j += 1
                avg = (i + j) / 2.0 + 1.0
                for t in range(i, j + 1):
                    ranks[order[t]] = avg
                i = j + 1
            return ranks

        import statistics
        rx, ry = avg_ranks(xs), avg_ranks(ys)
        mx, my = statistics.mean(rx), statistics.mean(ry)
        cov = sum((a - mx) * (b - my) for a, b in zip(rx, ry))
        vx = sum((a - mx) ** 2 for a in rx)
        vy = sum((b - my) ** 2 for b in ry)
        return cov / (vx * vy) ** 0.5 if vx > 0 and vy > 0 else None

    def test_matches_python_with_heavy_ties(self, spark):
        import random

        from spark_df_profiling_spark.operators.correlation import (
            spearman_matrix)
        rng = random.Random(11)
        rows = [(float(rng.randint(0, 9)),          # heavy ties
                 rng.gauss(0, 1),
                 float(rng.randint(0, 3)))          # very heavy ties
                for _ in range(300)]
        # monotone-ish link: y increases with x plus noise
        rows = [(x, x * 0.5 + y, z) for x, y, z in rows]
        df = spark.createDataFrame(rows, "a double, b double, c double")
        got = {(r["col_x"], r["col_y"]): r for r in
               spearman_matrix(df, ["a", "b", "c"]).collect()}
        assert len(got) == 3
        xs = [r[0] for r in rows]
        ys = [r[1] for r in rows]
        zs = [r[2] for r in rows]
        assert got[("a", "b")]["spearman"] == pytest.approx(
            self._py_spearman(xs, ys), abs=1e-10)
        assert got[("a", "c")]["spearman"] == pytest.approx(
            self._py_spearman(xs, zs), abs=1e-10)
        assert got[("b", "c")]["spearman"] == pytest.approx(
            self._py_spearman(ys, zs), abs=1e-10)
        assert got[("a", "b")]["n"] == 300

    def test_perfect_monotone_is_one(self, spark):
        from spark_df_profiling_spark.operators.correlation import (
            spearman_matrix)
        rows = [(float(i), float(i ** 3)) for i in range(50)]
        df = spark.createDataFrame(rows, "a double, b double")
        r = spearman_matrix(df, ["a", "b"]).collect()[0]
        assert r["spearman"] == pytest.approx(1.0, abs=1e-12)

    def test_constant_column_null_and_listwise(self, spark):
        from spark_df_profiling_spark.operators.correlation import (
            spearman_matrix)
        rows = [(float(i), 7.0) for i in range(20)] + [(None, 1.0)]
        df = spark.createDataFrame(rows, "a double, b double")
        r = spearman_matrix(df, ["a", "b"]).collect()[0]
        assert r["n"] == 20 and r["spearman"] is None

    def test_bounds(self, spark):
        from spark_df_profiling_spark.operators.correlation import (
            spearman_matrix)
        df = spark.createDataFrame([(1.0,)], "a double")
        with pytest.raises(ValueError, match="2-16"):
            spearman_matrix(df, ["a"])
        with pytest.raises(ValueError, match="missing column"):
            spearman_matrix(df, ["a", "zz"])

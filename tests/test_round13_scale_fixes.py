"""Pins for the two VERDICT r12 scale findings (weak-marked components).

#2: categorical_psi_reference collected EVERY distinct value to the
    driver before capping — a driver OOM on user-id-like columns even
    though the streaming consumer is bounded.  Now the head arrives
    via limit(max_categories) (TakeOrderedAndProject, no full sort)
    and the tail mass folds from one sum aggregate over the
    localCheckpoint-ed counts frame: O(max_categories) driver rows.

#3: the grouped frozen-boundary prefix (grouped roc_auc /
    precision_recall_curve / gains_curve / conformal_threshold /
    ks_by_group) collected O(n_bk x #groups) boundary rows to the
    driver, and the gains/conformal consumers built their bucket/k
    frames in driver loops.  All of that is now Spark-side: the
    boundary prefix is a Window.partitionBy(group).orderBy(pid) over
    the per-(pid, group) totals frame (<= #partitions rows per window
    partition), totals return as a DataFrame, and the consumer frames
    derive from it.  Rehearsed at 1M groups (roc_auc, 13.8s) and 500k
    groups (gains + conformal) — BASELINE.md round-13 section.
"""

import pytest
from pyspark.sql import functions as F


class TestCategoricalPsiReferenceBounded:
    def test_output_identical_to_python_reference(self, spark):
        from spark_df_profiling_spark.operators.drift import (
            categorical_psi_reference)
        # 40 distinct values with distinct counts (value_i appears
        # 41-i times) so the (count desc, value asc) head is unique
        rows = [(f"v{i:02d}",) for i in range(40)
                for _ in range(41 - i)]
        df = spark.createDataFrame(rows, "v string")
        got = categorical_psi_reference(df, "v", max_categories=10)
        total = sum(41 - i for i in range(40))
        exp = [(f"v{i:02d}", (41 - i) / total) for i in range(10)]
        tail = sum(41 - i for i in range(10, 40)) / total
        exp.append(("__other__", tail))
        assert len(got) == 11
        for (gv, gf), (ev, ef) in zip(got, exp):
            assert gv == ev
            assert gf == pytest.approx(ef, abs=1e-15)

    def test_tie_break_is_count_desc_value_asc(self, spark):
        from spark_df_profiling_spark.operators.drift import (
            categorical_psi_reference)
        df = spark.createDataFrame(
            [("b",), ("b",), ("a",), ("a",), ("c",)], "v string")
        got = categorical_psi_reference(df, "v", max_categories=2)
        assert [v for v, _ in got] == ["a", "b", "__other__"]
        assert got[2][1] == pytest.approx(1 / 5)

    def test_head_plan_is_take_ordered_not_full_sort(self, spark):
        """The head must come from limit()'s TakeOrderedAndProject —
        a global Sort in the plan means the unbounded shape is back."""
        counts = (spark.range(1000)
                  .select(F.concat(F.lit("u"), F.col("id"))
                          .alias("v"))
                  .groupBy("v").agg(F.count(F.lit(1)).alias("n")))
        plan = (counts.orderBy(F.desc("n"), F.asc("v")).limit(50)
                ._jdf.queryExecution().executedPlan().toString())
        assert "TakeOrderedAndProject" in plan

    def test_cap_one_returns_two_rows(self, spark):
        from spark_df_profiling_spark.operators.drift import (
            categorical_psi_reference)
        df = spark.createDataFrame(
            [("a",), ("a",), ("b",)], "v string")
        got = categorical_psi_reference(df, "v", max_categories=1)
        assert got == [("a", pytest.approx(2 / 3)),
                       ("__other__", pytest.approx(1 / 3))]


class TestDistributedBoundaryPrefix:
    def test_grouped_roc_auc_many_groups_matches_python(self, spark):
        """2000 groups x 50 rows: the distributed prefix must produce
        the exact tie-corrected Mann-Whitney AUC per group."""
        import random

        from spark_df_profiling_spark.operators.evaluation import (
            roc_auc)
        rng = random.Random(7)
        rows = [(g, rng.random() < 0.5,
                 float(rng.randint(0, 19)))  # heavy ties
                for g in range(2000) for _ in range(50)]
        df = spark.createDataFrame(rows, "g long, y boolean, s double")
        got = {r["g"]: r for r in
               roc_auc(df, "y", "s", group_col="g").collect()}
        assert len(got) == 2000

        def py_auc(sub):
            pos = sorted(s for y, s in sub if y)
            neg = sorted(s for y, s in sub if not y)
            if not pos or not neg:
                return None
            import bisect
            u = 0.0
            for p in pos:
                u += bisect.bisect_left(neg, p)
                u += 0.5 * (bisect.bisect_right(neg, p)
                            - bisect.bisect_left(neg, p))
            return u / (len(pos) * len(neg))

        by_g = {}
        for g, y, s in rows:
            by_g.setdefault(g, []).append((y, s))
        for g in (0, 1, 999, 1999):
            exp = py_auc(by_g[g])
            if exp is None:
                assert got[g]["auc"] is None
            else:
                assert got[g]["auc"] == pytest.approx(exp, abs=1e-12)

    def test_prefix_has_no_driver_state(self, spark):
        """The staged plan must NOT contain a LocalTableScan /
        parallelize of driver-built prefix rows — the boundary prefix
        rides a per-group window over the bounds frame."""
        from spark_df_profiling_spark.operators.evaluation import (
            _distinct_score_prefix)
        df = spark.createDataFrame(
            [(i % 5, i % 2 == 0, float(i % 7)) for i in range(200)],
            "g long, y boolean, s double")
        staged, tot_df = _distinct_score_prefix(df, "y", "s", "g")
        plan = staged._jdf.queryExecution().analyzed().toString()
        assert "LocalRelation" not in plan
        # totals now return as a DataFrame, not a driver list
        from pyspark.sql import DataFrame as SparkDataFrame
        assert isinstance(tot_df, SparkDataFrame)
        rows = {r["__g"]: (r["__na"], r["__np"])
                for r in tot_df.collect()}
        assert rows[0] == (40, 20)

    def test_conformal_infeasible_group_spark_side(self, spark):
        """A group too small for the alpha must still emit a
        NULL-threshold infeasible row (now built in Spark)."""
        from spark_df_profiling_spark.operators.evaluation import (
            conformal_threshold)
        df = spark.createDataFrame(
            [("big", float(i)) for i in range(100)]
            + [("tiny", 1.0), ("tiny", 2.0)],
            "g string, s double")
        got = {r["g"]: r for r in
               conformal_threshold(df, "s", alpha=0.1,
                                   group_col="g").collect()}
        assert got["big"]["feasible"] is True
        assert got["big"]["threshold"] is not None
        # tiny: k = ceil(3 * 0.9) = 3 > n = 2 -> infeasible
        assert got["tiny"]["feasible"] is False
        assert got["tiny"]["threshold"] is None


class TestBhFdr:
    @staticmethod
    def _py_bh(ps, alpha):
        m = len(ps)
        pstar = None
        for i, p in enumerate(sorted(ps), 1):
            if p <= i * alpha / m:
                pstar = p
        return pstar

    def test_matches_python_reference(self, spark):
        import random

        from spark_df_profiling_spark.operators.drift import bh_fdr
        rng = random.Random(3)
        # 100 null tests + 20 genuine small p-values, with ties
        ps = ([round(rng.random(), 2) for _ in range(100)]
              + [rng.random() * 0.001 for _ in range(20)])
        df = spark.createDataFrame([(p,) for p in ps], "p double")
        out = bh_fdr(df, "p", alpha=0.05).collect()
        pstar = self._py_bh(ps, 0.05)
        assert pstar is not None
        for r in out:
            assert r["bh_m"] == 120
            assert r["bh_threshold"] == pytest.approx(pstar)
            assert r["bh_rejected"] == (r["p"] <= pstar)
        assert sum(1 for r in out if r["bh_rejected"]) >= 20

    def test_grouped_families_and_no_discovery(self, spark):
        from spark_df_profiling_spark.operators.drift import bh_fdr
        rows = ([("hot", 0.0001), ("hot", 0.5), ("hot", 0.9)]
                + [("calm", 0.4), ("calm", 0.6), ("calm", 0.8)])
        df = spark.createDataFrame(rows, "g string, p double")
        got = {(r["g"], r["p"]): r for r in
               bh_fdr(df, "p", alpha=0.05, group_col="g").collect()}
        assert got[("hot", 0.0001)]["bh_rejected"] is True
        assert got[("hot", 0.5)]["bh_rejected"] is False
        # calm family: nothing qualifies -> threshold NULL, all False
        assert got[("calm", 0.4)]["bh_threshold"] is None
        assert got[("calm", 0.4)]["bh_rejected"] is False
        assert got[("hot", 0.5)]["bh_m"] == 3

    def test_null_p_propagates_null(self, spark):
        from spark_df_profiling_spark.operators.drift import bh_fdr
        df = spark.createDataFrame(
            [(0.001,), (0.5,), (None,)], "p double")
        got = {r["p"]: r for r in bh_fdr(df, "p", 0.05).collect()}
        assert got[None]["bh_rejected"] is None
        assert got[0.001]["bh_m"] == 2   # NULL p not a test

    def test_bounds(self, spark):
        from spark_df_profiling_spark.operators.drift import bh_fdr
        df = spark.createDataFrame([(0.1,)], "p double")
        with pytest.raises(ValueError, match="alpha"):
            bh_fdr(df, "p", alpha=1.5)
        with pytest.raises(ValueError, match="missing column"):
            bh_fdr(df, "zz")

    def test_all_null_p_keeps_rows(self, spark):
        """Keyless bh_fdr on an all-NULL p frame must keep every row
        (bh_m=0, rejected NULL) — not silently drop them."""
        from spark_df_profiling_spark.operators.drift import bh_fdr
        df = spark.createDataFrame(
            [(None,), (None,)], "p double")
        out = bh_fdr(df, "p", 0.05).collect()
        assert len(out) == 2
        for r in out:
            assert r["bh_m"] == 0
            assert r["bh_rejected"] is None


class TestCvm2Samp:
    @staticmethod
    def _py_cvm(a, b):
        import bisect
        n, m = len(a), len(b)
        sa, sb = sorted(a), sorted(b)
        s = 0.0
        for x in sorted(a + b):
            fa = bisect.bisect_right(sa, x) / n
            fb = bisect.bisect_right(sb, x) / m
            s += (fa - fb) ** 2
        return n * m / (n + m) ** 2 * s

    def test_matches_python_with_ties(self, spark):
        import random

        from spark_df_profiling_spark.operators.drift import cvm_2samp
        rng = random.Random(23)
        a = [float(rng.randint(0, 30)) for _ in range(400)]
        b = [float(rng.randint(0, 30)) for _ in range(300)]
        r = cvm_2samp(
            spark.createDataFrame([(v,) for v in a], "v double"),
            spark.createDataFrame([(v,) for v in b], "v double"),
            "v").collect()[0]
        assert r["t_stat"] == pytest.approx(self._py_cvm(a, b),
                                            rel=1e-12)
        assert r["n_ref"] == 400 and r["n_new"] == 300
        assert r["h0_mean"] == pytest.approx((1 + 1 / 700) / 6)
        # same-distribution samples sit near the null mean
        assert r["t_stat"] < 5 * r["h0_mean"]

    def test_broad_small_shift_scores_vs_null(self, spark):
        """The CvM selling point: a uniform +0.4 shift on a unit-
        spread distribution moves every quantile a little — CvM's
        accumulated statistic leaves the null band decisively."""
        import random

        from spark_df_profiling_spark.operators.drift import cvm_2samp
        rng = random.Random(5)
        a = [rng.gauss(0, 1) for _ in range(2000)]
        b = [rng.gauss(0.4, 1) for _ in range(2000)]
        r = cvm_2samp(
            spark.createDataFrame([(v,) for v in a], "v double"),
            spark.createDataFrame([(v,) for v in b], "v double"),
            "v").collect()[0]
        assert r["t_stat"] == pytest.approx(self._py_cvm(a, b),
                                            rel=1e-12)
        assert r["t_stat"] > 20 * r["h0_mean"]

    def test_empty_side_raises(self, spark):
        from spark_df_profiling_spark.operators.drift import cvm_2samp
        a = spark.createDataFrame([(1.0,)], "v double")
        b = spark.createDataFrame([(None,)], "v double")
        with pytest.raises(ValueError, match="empty sample"):
            cvm_2samp(a, b, "v").collect()

    def test_ks_2samp_unchanged_after_refactor(self, spark):
        """ks_2samp now rides the shared helper — pin its exact
        output on a hand-checked fixture."""
        from spark_df_profiling_spark.operators.drift import ks_2samp
        a = spark.createDataFrame(
            [(float(v),) for v in [1, 2, 3, 4]], "v double")
        b = spark.createDataFrame(
            [(float(v),) for v in [3, 4, 5, 6]], "v double")
        r = ks_2samp(a, b, "v").collect()[0]
        assert r["d_stat"] == pytest.approx(0.5)
        assert r["at_value"] == 2.0

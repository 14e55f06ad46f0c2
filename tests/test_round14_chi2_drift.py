"""chi2_drift (round 14): two-sample chi-square + G-test of
homogeneity per categorical column WITH p-values — the inferential
companion PSI/JSD/rank-drift lacked, so bh_fdr can control the
categorical drift family."""

import math

import pytest
from pyspark.sql import functions as F

from spark_df_profiling_spark.operators.drift import bh_fdr, chi2_drift


def _py_chi2_g(ref_counts, new_counts):
    """Reference implementation over {value: count} dicts."""
    vals = sorted(set(ref_counts) | set(new_counts))
    tot_r = sum(ref_counts.values())
    tot_n = sum(new_counts.values())
    grand = tot_r + tot_n
    chi2 = g = 0.0
    for v in vals:
        o_r = ref_counts.get(v, 0)
        o_n = new_counts.get(v, 0)
        ct = o_r + o_n
        e_r = tot_r * ct / grand
        e_n = tot_n * ct / grand
        chi2 += (o_r - e_r) ** 2 / e_r + (o_n - e_n) ** 2 / e_n
        if o_r > 0:
            g += 2 * o_r * math.log(o_r / e_r)
        if o_n > 0:
            g += 2 * o_n * math.log(o_n / e_n)
    return chi2, g, len(vals) - 1


def _mk(spark, counts):
    rows = [(v,) for v, n in counts.items() for _ in range(n)]
    return spark.createDataFrame(rows, "c string")


class TestChi2Statistic:
    def test_matches_reference_arithmetic(self, spark):
        rc = {"a": 30, "b": 50, "c": 20}
        nc = {"a": 20, "b": 40, "c": 45}
        out = chi2_drift(_mk(spark, rc), _mk(spark, nc),
                         ["c"]).collect()[0]
        chi2, g, dof = _py_chi2_g(rc, nc)
        assert out["chi2"] == pytest.approx(chi2, rel=1e-12)
        assert out["g_stat"] == pytest.approx(g, rel=1e-12)
        assert out["dof"] == dof
        assert out["n_ref"] == 100 and out["n_new"] == 105
        assert out["n_categories"] == 3

    def test_one_side_only_category_is_finite(self, spark):
        rc = {"a": 50, "b": 50}
        nc = {"a": 40, "b": 40, "z": 20}  # z unseen in ref
        out = chi2_drift(_mk(spark, rc), _mk(spark, nc),
                         ["c"]).collect()[0]
        chi2, g, dof = _py_chi2_g(rc, nc)
        assert math.isfinite(out["chi2"])
        assert out["chi2"] == pytest.approx(chi2, rel=1e-12)
        assert out["g_stat"] == pytest.approx(g, rel=1e-12)
        assert out["dof"] == 2

    def test_identical_distributions_score_zero(self, spark):
        rc = {"a": 60, "b": 40}
        out = chi2_drift(_mk(spark, rc), _mk(spark, rc),
                         ["c"]).collect()[0]
        assert out["chi2"] == pytest.approx(0.0, abs=1e-12)
        assert out["g_stat"] == pytest.approx(0.0, abs=1e-12)
        assert out["p_chi2"] == pytest.approx(1.0)
        assert out["p_g"] == pytest.approx(1.0)

    def test_single_category_null_p(self, spark):
        rc = {"only": 10}
        out = chi2_drift(_mk(spark, rc), _mk(spark, rc),
                         ["c"]).collect()[0]
        assert out["dof"] == 0
        assert out["p_chi2"] is None and out["p_g"] is None

    def test_include_nulls_buckets_missingness(self, spark):
        ref = spark.createDataFrame(
            [("a",)] * 50 + [(None,)] * 50, "c string")
        new = spark.createDataFrame(
            [("a",)] * 90 + [(None,)] * 10, "c string")
        excl = chi2_drift(ref, new, ["c"]).collect()[0]
        incl = chi2_drift(ref, new, ["c"],
                          include_nulls=True).collect()[0]
        assert excl["dof"] == 0          # only 'a' without nulls
        assert incl["dof"] == 1 and incl["chi2"] > 30

    def test_small_expected_counter(self, spark):
        rc = {"a": 100, "rare": 1}
        nc = {"a": 100, "rare": 2}
        out = chi2_drift(_mk(spark, rc), _mk(spark, nc),
                         ["c"]).collect()[0]
        assert out["n_small_expected"] == 1


class TestChi2PValues:
    """Known critical values: P(X2_k > x) = 0.05 at the 5% critical
    points — dof 1 (erf path), dof 2 (exact exp), dof 5/10 (WH)."""

    @pytest.mark.parametrize("dof,crit,tol", [
        (1, 3.841458820694124, 2e-4),   # exact up to erf-poly error
        (2, 5.991464547107979, 1e-12),  # closed form exp(-x/2)
        (5, 11.070497693516351, 2e-3),  # Wilson-Hilferty
        (10, 18.307038053275146, 2e-3),
    ])
    def test_critical_values(self, spark, dof, crit, tol):
        from spark_df_profiling_spark.operators.drift import (
            chi2_sf_expr)
        row = spark.range(1).select(
            chi2_sf_expr(F.lit(crit), F.lit(float(dof))).alias("p")
        ).collect()[0]
        assert row["p"] == pytest.approx(0.05, abs=tol)

    def test_monotone_in_x(self, spark):
        from spark_df_profiling_spark.operators.drift import (
            chi2_sf_expr)
        vals = [0.0, 0.5, 1.0, 2.0, 5.0, 10.0, 30.0]
        rows = spark.createDataFrame(
            [(v,) for v in vals], "x double").select(
            "x", chi2_sf_expr(F.col("x"), F.lit(4.0)).alias("p")
        ).orderBy("x").collect()
        ps = [r["p"] for r in rows]
        assert ps[0] == pytest.approx(1.0)
        assert all(a >= b - 1e-12 for a, b in zip(ps, ps[1:]))


class TestBhFdrComposition:
    def test_planted_drift_rejected_stable_not(self, spark):
        import random
        rng = random.Random(3)
        rows_r, rows_n = [], []
        for i in range(2000):
            stable = str(rng.randint(0, 4))
            rows_r.append((stable, str(rng.randint(0, 4))))
            # drifted column: shifted distribution in `new`
            rows_n.append((str(rng.randint(0, 4)),
                           str(min(rng.randint(0, 6), 4))))
        ref = spark.createDataFrame(rows_r, "stable string, d string")
        new = spark.createDataFrame(rows_n, "stable string, d string")
        out = bh_fdr(chi2_drift(ref, new, ["stable", "d"]),
                     "p_chi2", alpha=0.05)
        got = {r["column"]: r["bh_rejected"] for r in out.collect()}
        assert got["d"] is True
        assert got["stable"] is False

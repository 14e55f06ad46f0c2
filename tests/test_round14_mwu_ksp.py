"""Numeric-drift p-values (round 14): mannwhitney_2samp (tie-corrected
rank-sum, normal approximation) and ks_2samp's new asymptotic
Kolmogorov p_value — the numeric counterpart of chi2_drift's p-values,
so bh_fdr can control a many-column numeric scan."""

import math

import pytest
from pyspark.sql import functions as F

from spark_df_profiling_spark.operators.drift import (
    ks_2samp, ks_sf_expr, mannwhitney_2samp)


def _py_kolmogorov_sf(lam, terms=2000):
    """Direct alternating series with enough terms to converge for
    any lam of interest — the independent reference."""
    if lam <= 0:
        return 1.0
    s = 0.0
    for j in range(1, terms + 1):
        s += (-1.0) ** (j - 1) * math.exp(-2.0 * j * j * lam * lam)
    return min(max(2.0 * s, 0.0), 1.0)


def _py_mwu(a, b):
    """Reference U (a > b pairs, ties half) + tie-corrected z/p."""
    u = 0.0
    for x in a:
        for y in b:
            if x > y:
                u += 1.0
            elif x == y:
                u += 0.5
    na, nb = len(a), len(b)
    n = na + nb
    from collections import Counter
    ties = sum(t ** 3 - t for t in Counter(list(a) + list(b)).values())
    mu = na * nb / 2.0
    var = na * nb / 12.0 * ((n + 1) - ties / (n * (n - 1)))
    sigma = math.sqrt(var)
    diff = u - mu
    cc = math.copysign(min(abs(diff), 0.5), diff)
    z = (diff - cc) / sigma if sigma > 0 else None
    p = math.erfc(abs(z) / math.sqrt(2)) if z is not None else None
    return u, z, p


class TestKsSf:
    @pytest.mark.parametrize("lam", [0.3, 0.5, 0.8, 1.0, 1.17,
                                     1.19, 1.358, 2.0, 3.0])
    def test_matches_reference_series(self, spark, lam):
        got = spark.range(1).select(
            ks_sf_expr(F.lit(lam)).alias("p")).collect()[0]["p"]
        assert got == pytest.approx(_py_kolmogorov_sf(lam), abs=1e-9)

    def test_classic_critical_value(self, spark):
        # the textbook 5% critical point lambda = 1.358
        got = spark.range(1).select(
            ks_sf_expr(F.lit(1.358)).alias("p")).collect()[0]["p"]
        assert got == pytest.approx(0.05, abs=2e-3)

    def test_edges(self, spark):
        rows = spark.createDataFrame(
            [(0.0,), (-1.0,), (None,), (10.0,)], "x double").select(
            "x", ks_sf_expr(F.col("x")).alias("p")).collect()
        got = {r["x"]: r["p"] for r in rows}
        assert got[0.0] == 1.0 and got[-1.0] == 1.0
        assert got[None] is None
        assert got[10.0] == pytest.approx(0.0, abs=1e-12)

    def test_branch_continuity_at_split(self, spark):
        """Both branches agree to ~1e-16 at the 1.18 split, so the
        only difference across it is the function's own slope
        (dQ/dlam ~ -0.58 -> ~1.2e-7 over the 2e-7 gap)."""
        a = spark.range(1).select(
            ks_sf_expr(F.lit(1.1799999)).alias("p")).collect()[0]["p"]
        b = spark.range(1).select(
            ks_sf_expr(F.lit(1.1800001)).alias("p")).collect()[0]["p"]
        assert a == pytest.approx(b, abs=5e-7)
        assert a > b   # monotone decreasing across the split


class TestMannWhitney:
    def test_matches_reference_with_ties(self, spark):
        a = [1.0, 2.0, 2.0, 3.0, 5.0, 5.0, 7.0]
        b = [2.0, 4.0, 5.0, 6.0, 6.0, 8.0]
        ref = spark.createDataFrame([(x,) for x in a], "v double")
        new = spark.createDataFrame([(x,) for x in b], "v double")
        row = mannwhitney_2samp(ref, new, "v").collect()[0]
        u, z, p = _py_mwu(a, b)
        assert row["u_stat"] == pytest.approx(u, abs=1e-12)
        assert row["z"] == pytest.approx(z, rel=1e-12)
        assert row["p_value"] == pytest.approx(p, abs=2e-7)  # erf poly
        assert row["n_ref"] == 7 and row["n_new"] == 6

    def test_identical_samples_p_one(self, spark):
        vals = [(float(i % 5),) for i in range(50)]
        ref = spark.createDataFrame(vals, "v double")
        row = mannwhitney_2samp(ref, ref, "v").collect()[0]
        assert row["u_stat"] == pytest.approx(row["mu"])
        assert row["z"] == pytest.approx(0.0)
        assert row["p_value"] == pytest.approx(1.0)

    def test_all_tied_sigma_zero_null_p(self, spark):
        ref = spark.createDataFrame([(1.0,)] * 10, "v double")
        row = mannwhitney_2samp(ref, ref, "v").collect()[0]
        assert row["sigma"] == pytest.approx(0.0)
        assert row["z"] is None and row["p_value"] is None

    def test_clear_shift_detected(self, spark):
        ref = spark.range(200).select(
            (F.col("id") % 50).cast("double").alias("v"))
        new = spark.range(200).select(
            ((F.col("id") % 50) + 20).cast("double").alias("v"))
        row = mannwhitney_2samp(ref, new, "v").collect()[0]
        assert row["p_value"] < 1e-10
        assert row["z"] < 0      # ref below new -> U below mean

    def test_empty_side_raises(self, spark):
        ref = spark.createDataFrame([(1.0,)], "v double")
        new = spark.createDataFrame([], "v double")
        with pytest.raises(ValueError, match="empty sample"):
            mannwhitney_2samp(ref, new, "v").collect()


class TestKs2sampPValue:
    def test_p_matches_lambda_formula(self, spark):
        import random
        rng = random.Random(9)
        ref = spark.createDataFrame(
            [(rng.gauss(0, 1),) for _ in range(300)], "v double")
        new = spark.createDataFrame(
            [(rng.gauss(0.4, 1),) for _ in range(250)], "v double")
        row = ks_2samp(ref, new, "v").collect()[0]
        lam = row["d_stat"] * math.sqrt(300 * 250 / 550)
        assert row["p_value"] == pytest.approx(
            _py_kolmogorov_sf(lam), abs=1e-9)
        assert row["p_value"] < 0.01   # a 0.4-sigma shift at n=550

    def test_identical_halves_high_p(self, spark):
        df = spark.range(400).select(
            (F.col("id") % 97).cast("double").alias("v"))
        row = ks_2samp(df, df, "v").collect()[0]
        assert row["d_stat"] == pytest.approx(0.0)
        assert row["p_value"] == pytest.approx(1.0)


class TestKsByGroupPValue:
    def test_p_matches_sf_of_d(self, spark):
        import random
        rng = random.Random(2)
        ref = spark.createDataFrame(
            [(g, rng.gauss(0, 1)) for g in ("a", "b")
             for _ in range(150)], "g string, v double")
        new = spark.createDataFrame(
            [(g, rng.gauss(0.6 if g == "b" else 0.0, 1))
             for g in ("a", "b") for _ in range(120)],
            "g string, v double")
        from spark_df_profiling_spark.operators.drift import (
            ks_by_group)
        got = {r["g"]: r for r in
               ks_by_group(ref, new, "v", "g").collect()}
        for g, r in got.items():
            lam = r["d_stat"] * math.sqrt(
                r["n_ref"] * r["n_new"] / (r["n_ref"] + r["n_new"]))
            assert r["p_value"] == pytest.approx(
                _py_kolmogorov_sf(lam), abs=1e-9), g
        assert got["b"]["p_value"] < 0.01 < got["a"]["p_value"]

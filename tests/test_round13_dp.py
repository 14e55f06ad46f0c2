"""dp_release (round 13) vs a python replay of the seeded mechanism."""

import hashlib
import math

import pytest


def _lap(seed, tag, scale):
    h = hashlib.md5(f"{seed}:dp:{tag}".encode()).hexdigest()
    u = (int(h[:15], 16) % 1_000_000 + 0.5) / 1_000_000.0
    return (-scale * math.copysign(1.0, u - 0.5)
            * math.log(1.0 - 2.0 * abs(u - 0.5)))


class TestDpRelease:
    def test_matches_python_mechanism(self, spark):
        from spark_df_profiling_spark.operators.constraints import (
            dp_release)
        vals = [float(i % 50) for i in range(1000)] + [None, 999.0]
        df = spark.createDataFrame([(v,) for v in vals], "v double")
        r = dp_release(df, "v", lower=0.0, upper=100.0,
                       epsilon=2.0, seed=7).collect()[0]
        n_true = 1001                       # NULL excluded
        s_true = sum(min(max(v, 0.0), 100.0) for v in vals
                     if v is not None)      # 999 clips to 100
        exp_n = n_true + _lap(7, "count", 2.0 / 2.0)
        exp_s = s_true + _lap(7, "sum", 2.0 * 100.0 / 2.0)
        assert r["n_dp"] == pytest.approx(exp_n, rel=1e-12)
        assert r["sum_dp"] == pytest.approx(exp_s, rel=1e-12)
        assert r["mean_dp"] == pytest.approx(exp_s / exp_n, rel=1e-12)
        assert r["epsilon"] == 2.0

    def test_reproducible_and_seed_sensitive(self, spark):
        from spark_df_profiling_spark.operators.constraints import (
            dp_release)
        df = spark.createDataFrame(
            [(float(i),) for i in range(100)], "v double")
        a = dp_release(df, "v", 0, 100, seed=1).collect()[0]
        b = dp_release(df, "v", 0, 100, seed=1).collect()[0]
        c = dp_release(df, "v", 0, 100, seed=2).collect()[0]
        assert a["n_dp"] == b["n_dp"] and a["sum_dp"] == b["sum_dp"]
        assert a["n_dp"] != c["n_dp"]

    def test_noise_scales_with_epsilon(self, spark):
        from spark_df_profiling_spark.operators.constraints import (
            dp_release)
        df = spark.createDataFrame(
            [(50.0,) for _ in range(1000)], "v double")
        tight = dp_release(df, "v", 0, 100, epsilon=10.0,
                           seed=3).collect()[0]
        loose = dp_release(df, "v", 0, 100, epsilon=0.1,
                           seed=3).collect()[0]
        # identical uniforms, scale ratio 100x exactly
        assert abs(loose["n_dp"] - 1000) == pytest.approx(
            100 * abs(tight["n_dp"] - 1000), rel=1e-9)

    def test_guards(self, spark):
        from spark_df_profiling_spark.operators.constraints import (
            dp_release)
        df = spark.createDataFrame([(1.0,)], "v double")
        with pytest.raises(ValueError, match="epsilon"):
            dp_release(df, "v", 0, 1, epsilon=0)
        with pytest.raises(ValueError, match="lower < upper"):
            dp_release(df, "v", 5, 5)
        with pytest.raises(ValueError, match="missing column"):
            dp_release(df, "zz", 0, 1)


class TestWeightDiagnostics:
    def test_matches_python(self, spark):
        from spark_df_profiling_spark.operators.sampling import (
            weight_diagnostics)
        ws = [1.0, 1.0, 2.0, 4.0, 0.5]
        df = spark.createDataFrame(
            [(w,) for w in ws] + [(None,), (-1.0,), (0.0,)],
            "w double")
        r = weight_diagnostics(df, "w").collect()[0]
        sw = sum(ws)
        sw2 = sum(w * w for w in ws)
        # r14 ADVICE fix: NULL weights count into n_nonpos alongside
        # zero/negative (the docstring contract) -> 3, not 2
        assert r["n"] == 5 and r["n_nonpos"] == 3
        assert r["sum_w"] == pytest.approx(sw)
        assert r["ess"] == pytest.approx(sw * sw / sw2)
        assert r["ess_n"] == pytest.approx(sw * sw / sw2 / 5)
        assert r["max_w_share"] == pytest.approx(4.0 / sw)

    def test_uniform_weights_ess_is_n(self, spark):
        from spark_df_profiling_spark.operators.sampling import (
            weight_diagnostics)
        df = spark.createDataFrame([(3.0,)] * 100, "w double")
        r = weight_diagnostics(df, "w").collect()[0]
        assert r["ess"] == pytest.approx(100.0)
        assert r["ess_n"] == pytest.approx(1.0)
        assert r["max_w_share"] == pytest.approx(0.01)

    def test_grouped_and_degenerate(self, spark):
        from spark_df_profiling_spark.operators.sampling import (
            weight_diagnostics)
        rows = ([("a", 1.0), ("a", 99.0)]   # one row dominates
                + [("b", -5.0)])            # no positive mass
        df = spark.createDataFrame(rows, "g string, w double")
        got = {r["g"]: r for r in
               weight_diagnostics(df, "w", group_col="g").collect()}
        assert got["a"]["ess_n"] < 0.55
        assert got["a"]["max_w_share"] == pytest.approx(0.99)
        assert got["b"]["n"] == 0 and got["b"]["n_nonpos"] == 1
        assert got["b"]["ess"] is None
        with pytest.raises(ValueError, match="missing column"):
            weight_diagnostics(df, "zz")

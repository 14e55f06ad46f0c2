"""ks_reference / streaming_ks (round 13) vs python references.

The KS twin of streaming_psi: exact order-statistic edge grid frozen
from the reference corpus, per-window max CDF gap in ONE streaming
aggregation (availableNow == the batch windowed agg).
"""

import datetime
import math

import pytest


def _py_reference(vals, n_edges):
    s = sorted(vals)
    n = len(s)
    out, seen = [], set()
    for k in range(1, n_edges + 1):
        r = math.ceil(k * n / (n_edges + 1.0))
        edge = s[r - 1]
        if edge not in seen:
            seen.add(edge)
            cdf = sum(1 for v in s if v <= edge) / n
            out.append((edge, cdf))
    return out


def _py_d(window_vals, ref):
    n = len(window_vals)
    best = (0.0, None)
    for e, c in ref:
        d = abs(sum(1 for v in window_vals if v <= e) / n - c)
        if d > best[0] or (d == best[0] and (best[1] is None
                                             or e > best[1])):
            best = (d, e)
    return best


class TestKsReference:
    def test_matches_python_order_statistics(self, spark):
        from spark_df_profiling_spark.operators.drift import (
            ks_reference)
        vals = [float((i * 37) % 101) for i in range(500)]  # ties
        df = spark.createDataFrame([(v,) for v in vals], "v double")
        got = ks_reference(df, "v", n_edges=16)
        exp = _py_reference(vals, 16)
        assert got == [(pytest.approx(e), pytest.approx(c))
                       for e, c in exp]
        # edges ascending, cdfs ascending, all in (0, 1]
        es = [e for e, _ in got]
        cs = [c for _, c in got]
        assert es == sorted(es) and cs == sorted(cs)
        assert all(0 < c <= 1 for c in cs)

    def test_guards(self, spark):
        from spark_df_profiling_spark.operators.drift import (
            ks_reference)
        df = spark.createDataFrame([(None,)], "v double")
        with pytest.raises(ValueError, match="all-NULL"):
            ks_reference(df, "v")
        df2 = spark.createDataFrame([(1.0,)], "v double")
        with pytest.raises(ValueError, match="n_edges"):
            ks_reference(df2, "v", n_edges=0)
        with pytest.raises(ValueError, match="missing column"):
            ks_reference(df2, "zz")


class TestStreamingKs:
    def test_availablenow_matches_python(self, spark, tmp_path):
        from spark_df_profiling_spark.operators.drift import (
            ks_reference)
        from spark_df_profiling_spark.streaming import (
            run_stream_to_memory, streaming_ks)
        base = datetime.datetime(2026, 3, 1)
        day2 = base + datetime.timedelta(days=1)
        calm = [float((i * 37) % 101) for i in range(400)]
        shifted = [v + 50.0 for v in calm]           # planted shift
        ref_df = spark.createDataFrame([(v,) for v in calm],
                                       "v double")
        ref = ks_reference(ref_df, "v", n_edges=16)
        data = ([(base, v) for v in calm]
                + [(day2, v) for v in shifted])
        src = tmp_path / "sks_src"
        spark.createDataFrame(data, "ts timestamp, v string") \
            .selectExpr("ts", "CAST(v AS DOUBLE) AS v") \
            .coalesce(1).write.parquet(str(src))
        stream = (spark.readStream.schema("ts timestamp, v double")
                  .parquet(str(src)))
        out = streaming_ks(stream, "ts", "v", ref, window="1 day",
                           watermark="1 hour")
        run_stream_to_memory(out, "t_sks_out", output_mode="complete")
        rows = sorted(spark.table("t_sks_out").collect(),
                      key=lambda r: r.window_start)
        assert len(rows) == 2
        d_calm, e_calm = _py_d(calm, ref)
        d_hot, e_hot = _py_d(shifted, ref)
        assert rows[0]["d_stat"] == pytest.approx(d_calm, abs=1e-12)
        assert rows[1]["d_stat"] == pytest.approx(d_hot, abs=1e-12)
        assert rows[1]["at_edge"] == pytest.approx(e_hot)
        assert rows[0]["d_stat"] < 0.01 < rows[1]["d_stat"]
        assert rows[1]["d_stat"] > 0.4   # ~half the mass shifted past
        # r15: the one-sample asymptotic p at lambda = d*sqrt(n) —
        # replay ks_sf_expr's series in python per window
        import math

        def py_sf(lam):
            if lam <= 0:
                return 1.0
            if lam < 1.18:
                s = sum(math.exp(-((2 * j - 1) ** 2 * math.pi ** 2)
                                 / (8 * lam * lam))
                        for j in range(1, 4))
                return max(min(
                    1.0 - (math.sqrt(2 * math.pi) / lam) * s, 1.0),
                    0.0)
            s = sum((-1.0) ** (j - 1)
                    * math.exp(-2.0 * j * j * lam * lam)
                    for j in range(1, 9))
            return max(min(2.0 * s, 1.0), 0.0)
        for row, d in ((rows[0], d_calm), (rows[1], d_hot)):
            lam = d * math.sqrt(row["n"])
            assert row["p_value"] == pytest.approx(py_sf(lam),
                                                   rel=1e-9)
        assert rows[0]["p_value"] > 0.99  # calm fits its own ref
        assert rows[1]["p_value"] < 1e-10  # planted shift priced

    def test_reference_contract(self, spark):
        from spark_df_profiling_spark.streaming import streaming_ks
        df = spark.createDataFrame([], "ts timestamp, v double")
        with pytest.raises(ValueError, match="non-empty"):
            streaming_ks(df, "ts", "v", [])
        with pytest.raises(ValueError, match="ascending"):
            streaming_ks(df, "ts", "v", [(2.0, 0.5), (1.0, 0.9)])

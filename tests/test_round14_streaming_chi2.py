"""streaming_chi2 (round 14): per-window chi-square goodness-of-fit
against a frozen categorical_psi_reference — the p-value twin of
streaming_psi_categorical (one streaming aggregation, availableNow ==
the batch windowed agg)."""

import datetime
import math

import pytest


def _py_chi2_gof(window_vals, reference):
    cats = [v for v, _ in reference[:-1]]
    fracs = [f for _, f in reference]
    n = len(window_vals)
    counts = [0] * len(fracs)
    for v in window_vals:
        counts[cats.index(v) if v in cats else len(fracs) - 1] += 1
    chi2 = 0.0
    n_pos = 0
    n_unexpected = 0
    for c, p in zip(counts, fracs):
        if p > 0:
            e = n * p
            chi2 += (c - e) ** 2 / e
            n_pos += 1
        else:
            n_unexpected += c
    return chi2, n_pos - 1, n_unexpected


class TestStreamingChi2:
    def test_availablenow_matches_python(self, spark, tmp_path):
        from spark_df_profiling_spark.operators.drift import (
            categorical_psi_reference)
        from spark_df_profiling_spark.streaming import (
            run_stream_to_memory, streaming_chi2)
        base = datetime.datetime(2026, 4, 1)
        day2 = base + datetime.timedelta(days=1)
        calm = (["a"] * 60 + ["b"] * 30 + ["c"] * 10)
        hot = (["a"] * 10 + ["b"] * 30 + ["c"] * 40 + ["z"] * 20)
        ref_df = spark.createDataFrame([(v,) for v in calm],
                                       "v string")
        ref = categorical_psi_reference(ref_df, "v",
                                        max_categories=2)
        # head = a, b; '__other__' carries c's real mass (share > 0)
        assert ref[-1][0] == "__other__" and ref[-1][1] > 0
        data = ([(base, v) for v in calm] + [(day2, v) for v in hot])
        src = tmp_path / "sx2_src"
        spark.createDataFrame(data, "ts timestamp, v string") \
            .coalesce(1).write.parquet(str(src))
        stream = (spark.readStream.schema("ts timestamp, v string")
                  .parquet(str(src)))
        out = streaming_chi2(stream, "ts", "v", ref, window="1 day",
                             watermark="1 hour")
        run_stream_to_memory(out, "t_sx2_out", output_mode="complete")
        rows = sorted(spark.table("t_sx2_out").collect(),
                      key=lambda r: r.window_start)
        assert len(rows) == 2
        for row, vals in zip(rows, (calm, hot)):
            chi2, dof, n_unexp = _py_chi2_gof(vals, ref)
            assert row["chi2"] == pytest.approx(chi2, rel=1e-12)
            assert row["dof"] == dof
            assert row["n_unexpected"] == n_unexp
        # the calm window is the fit corpus itself: chi2 exactly 0
        assert rows[0]["chi2"] == pytest.approx(0.0, abs=1e-9)
        assert rows[0]["p_value"] == pytest.approx(1.0)
        assert rows[1]["p_value"] < 1e-6     # planted mix shift

    def test_zero_share_other_counts_unexpected(self, spark,
                                                tmp_path):
        from spark_df_profiling_spark.streaming import (
            run_stream_to_memory, streaming_chi2)
        # hand-built reference whose __other__ share is exactly 0
        ref = [("a", 0.7), ("b", 0.3), ("__other__", 0.0)]
        base = datetime.datetime(2026, 4, 1)
        vals = ["a"] * 7 + ["b"] * 3 + ["NEW"] * 5
        src = tmp_path / "sx2b_src"
        spark.createDataFrame([(base, v) for v in vals],
                              "ts timestamp, v string") \
            .coalesce(1).write.parquet(str(src))
        stream = (spark.readStream.schema("ts timestamp, v string")
                  .parquet(str(src)))
        out = streaming_chi2(stream, "ts", "v", ref, window="1 day")
        run_stream_to_memory(out, "t_sx2b_out",
                             output_mode="complete")
        row = spark.table("t_sx2b_out").collect()[0]
        assert row["n_unexpected"] == 5     # NEW vocabulary surfaced
        assert row["dof"] == 1
        assert row["n"] == 15               # n still counts NEW rows
        # r15 semantics: expected counts CONDITION on the positive
        # cells (E_c = (n - n_unexpected) * p_c / sum_pos p), so the
        # 7/3 split over a_share 0.7 / b_share 0.3 is a PERFECT fit —
        # chi2 exactly 0 and the new vocabulary is priced solely by
        # n_unexpected (the old n*p_c form inflated chi2 here)
        assert row["chi2"] == pytest.approx(0.0, abs=1e-12)
        assert row["p_value"] == pytest.approx(1.0)

    def test_reference_contract(self, spark):
        from spark_df_profiling_spark.streaming import streaming_chi2
        df = spark.createDataFrame([], "ts timestamp, v string")
        with pytest.raises(ValueError, match="__other__"):
            streaming_chi2(df, "ts", "v", [("a", 1.0)])
        big = ([(f"c{i}", 1.0 / 300) for i in range(299)]
               + [("__other__", 1.0 / 300)])
        with pytest.raises(ValueError, match="256"):
            streaming_chi2(df, "ts", "v", big)

    def test_p_value_consistent_with_batch_expr(self, spark):
        """The post-projection p equals chi2_sf_expr on the same
        (chi2, dof) — one literal probe."""
        from pyspark.sql import functions as F
        from spark_df_profiling_spark.operators.drift import (
            chi2_sf_expr)
        got = spark.range(1).select(
            chi2_sf_expr(F.lit(5.991464547107979), F.lit(2.0))
            .alias("p")).collect()[0]["p"]
        assert got == pytest.approx(math.exp(-5.991464547107979 / 2))

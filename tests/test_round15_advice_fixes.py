"""Pins for the five ADVICE r14 findings (fixed in round 15).

1. ivf_pq_topk hardcoded the probe frame's query_id to LongType, so
   string-keyed corpora failed at createDataFrame.  The field type now
   comes from queries.schema[id_col] (the _isotonic_apply_grouped
   gtype rule), matching knn_ivf / pq_adc_topk generality.
2. ivf_candidate_stats counted zero-norm corpus vectors in cluster
   sizes and n_corpus (and probed for zero-norm queries) while knn_ivf
   filters both out, so candidate_fraction could overstate the rows
   actually scored.  Both sides now carry the l2_norm > 0 filter.
3. streaming_chi2 computed expected counts as n·p_c while excluding
   zero-share cells from the statistic, inflating chi2 beyond the
   stated GOF distribution whenever n_unexpected > 0.  Expected counts
   now condition on the positive cells: E_c = (n − n_unexpected) ·
   p_c / Σ_pos p; an all-unexpected window yields NULL chi2/p.
4. welch_ttest inner-joined per-side moment frames, so a column
   all-NULL on one side silently vanished from the output (and from
   drift_test_report's BH family m).  Now a FULL outer join: the row
   survives with n = 0 for the empty side and NULL t/dof/p.
5. pq_fit never validated vector length, so short rows silently
   contributed truncated/NULL-padded slices to the codebook fit.
   The slice source now raises loudly (the pq_encode contract).
"""

import datetime

import pytest
from pyspark.sql import functions as F

from tests.test_round14_ivf import _blobs


class TestIvfPqTopkIdType:
    def test_string_ids_work(self, spark):
        from spark_df_profiling_spark.operators.clustering import (
            kmeans_assign, kmeans_fit)
        from spark_df_profiling_spark.operators.similarity import (
            ivf_pq_topk, pq_adc_topk, pq_encode, pq_fit)
        raw = _blobs(spark, n_per=15)
        df = raw.select(
            F.concat(F.lit("doc-"), F.col("vec_id").cast("string"))
            .alias("vec_id"), "embedding").localCheckpoint()
        st = pq_fit(df, m=4, k=3, n_iter=2, seed=0)
        cents = kmeans_fit(df, k=4, n_iter=2, seed=0)
        corpus = pq_encode(kmeans_assign(df, cents), st) \
            .localCheckpoint()
        q = df.where(F.col("vec_id").isin("doc-0", "doc-1"))
        full = ivf_pq_topk(corpus, q, cents, st, k=4, nprobe=4)
        plain = pq_adc_topk(corpus, q, st, k=4)
        a = {(r["query_id"], r["rank"]): r["neighbor_id"]
             for r in full.collect()}
        b = {(r["query_id"], r["rank"]): r["neighbor_id"]
             for r in plain.collect()}
        assert a and a == b
        assert all(isinstance(k[0], str) for k in a)

    def test_long_ids_unchanged(self, spark):
        from spark_df_profiling_spark.operators.clustering import (
            kmeans_assign, kmeans_fit)
        from spark_df_profiling_spark.operators.similarity import (
            ivf_pq_topk, pq_encode, pq_fit)
        df = _blobs(spark, n_per=10).localCheckpoint()
        st = pq_fit(df, m=2, k=3, n_iter=1, seed=0)
        cents = kmeans_fit(df, k=2, n_iter=1, seed=0)
        corpus = pq_encode(kmeans_assign(df, cents), st)
        q = df.where(F.col("vec_id") < 2)
        rows = ivf_pq_topk(corpus, q, cents, st, k=3,
                           nprobe=2).collect()
        assert rows and all(isinstance(r["query_id"], int)
                            for r in rows)


class TestIvfCandidateStatsNormFilter:
    def test_zero_norm_corpus_rows_excluded(self, spark):
        from spark_df_profiling_spark.operators.clustering import (
            kmeans_fit)
        from spark_df_profiling_spark.operators.similarity import (
            ivf_candidate_stats)
        df = _blobs(spark, n_per=10)
        cents = kmeans_fit(df, k=4, n_iter=2, seed=0)
        withzero = df.unionByName(spark.createDataFrame(
            [(999, [0.0] * 8)],
            "vec_id long, embedding array<double>"))
        got = ivf_candidate_stats(
            withzero, df.where(F.col("vec_id") < 2), cents,
            nprobe=4).collect()
        # full probe: every candidate list is probed, so n_candidates
        # == n_corpus == the 40 REAL rows; the zero vector (which
        # knn_ivf never scores) is in neither number
        for r in got:
            assert r["n_corpus"] == 40
            assert r["n_candidates"] == 40
            assert r["candidate_fraction"] == pytest.approx(1.0)

    def test_zero_norm_query_emits_no_row(self, spark):
        from spark_df_profiling_spark.operators.clustering import (
            kmeans_fit)
        from spark_df_profiling_spark.operators.similarity import (
            ivf_candidate_stats)
        df = _blobs(spark, n_per=10)
        cents = kmeans_fit(df, k=2, n_iter=1, seed=0)
        q = spark.createDataFrame(
            [(0, [0.0] * 8)], "vec_id long, embedding array<double>")
        assert ivf_candidate_stats(df, q, cents, nprobe=1).count() == 0


class TestStreamingChi2Conditioning:
    def test_renormalized_expected_matches_python(self, spark,
                                                  tmp_path):
        from spark_df_profiling_spark.streaming import (
            run_stream_to_memory, streaming_chi2)
        ref = [("a", 0.7), ("b", 0.3), ("__other__", 0.0)]
        pos_sum = 0.7 + 0.3  # float sum, exactly as the engine folds
        base = datetime.datetime(2026, 4, 2)
        vals = ["a"] * 9 + ["b"] * 5 + ["NEW"] * 6
        src = tmp_path / "sx2c_src"
        spark.createDataFrame([(base, v) for v in vals],
                              "ts timestamp, v string") \
            .coalesce(1).write.parquet(str(src))
        stream = (spark.readStream.schema("ts timestamp, v string")
                  .parquet(str(src)))
        out = streaming_chi2(stream, "ts", "v", ref, window="1 day")
        run_stream_to_memory(out, "t_sx2c_out",
                             output_mode="complete")
        row = spark.table("t_sx2c_out").collect()[0]
        assert row["n"] == 20 and row["n_unexpected"] == 6
        n_eff = 14
        chi2 = sum((o - n_eff * p / pos_sum) ** 2
                   / (n_eff * p / pos_sum)
                   for o, p in ((9, 0.7), (5, 0.3)))
        assert row["chi2"] == pytest.approx(chi2, rel=1e-12)

    def test_all_unexpected_window_null_chi2(self, spark, tmp_path):
        from spark_df_profiling_spark.streaming import (
            run_stream_to_memory, streaming_chi2)
        ref = [("a", 0.7), ("b", 0.3), ("__other__", 0.0)]
        base = datetime.datetime(2026, 4, 2)
        src = tmp_path / "sx2d_src"
        spark.createDataFrame([(base, "NEW")] * 4,
                              "ts timestamp, v string") \
            .coalesce(1).write.parquet(str(src))
        stream = (spark.readStream.schema("ts timestamp, v string")
                  .parquet(str(src)))
        out = streaming_chi2(stream, "ts", "v", ref, window="1 day")
        run_stream_to_memory(out, "t_sx2d_out",
                             output_mode="complete")
        row = spark.table("t_sx2d_out").collect()[0]
        assert row["n"] == 4 and row["n_unexpected"] == 4
        assert row["chi2"] is None and row["p_value"] is None

    def test_no_zero_cells_arithmetic_untouched(self, spark,
                                                tmp_path):
        """With every cell positive the conditioned form must fold to
        the LITERAL n·p_c (no division by a float pos_sum) — pin via
        an exact-fit window whose chi2 is exactly 0 only under the
        un-divided shares."""
        from spark_df_profiling_spark.streaming import (
            run_stream_to_memory, streaming_chi2)
        ref = [("a", 0.5), ("b", 0.25), ("__other__", 0.25)]
        base = datetime.datetime(2026, 4, 2)
        vals = ["a"] * 8 + ["b"] * 4 + ["zz"] * 4
        src = tmp_path / "sx2e_src"
        spark.createDataFrame([(base, v) for v in vals],
                              "ts timestamp, v string") \
            .coalesce(1).write.parquet(str(src))
        stream = (spark.readStream.schema("ts timestamp, v string")
                  .parquet(str(src)))
        out = streaming_chi2(stream, "ts", "v", ref, window="1 day")
        run_stream_to_memory(out, "t_sx2e_out",
                             output_mode="complete")
        row = spark.table("t_sx2e_out").collect()[0]
        assert row["n_unexpected"] == 0
        assert row["chi2"] == 0.0
        assert row["p_value"] == pytest.approx(1.0)


class TestWelchFullOuter:
    def test_one_sided_column_survives_with_nulls(self, spark):
        from spark_df_profiling_spark.operators.drift import (
            welch_ttest)
        ref = spark.createDataFrame(
            [(1.0, None), (2.0, None), (3.0, None)],
            "x double, y double")
        new = spark.createDataFrame(
            [(2.0, 5.0), (3.0, 6.0), (4.0, 7.0)],
            "x double, y double")
        rows = {r["column"]: r for r in
                welch_ttest(ref, new, ["x", "y"]).collect()}
        assert set(rows) == {"x", "y"}          # y no longer vanishes
        y = rows["y"]
        assert y["n_ref"] == 0 and y["n_new"] == 3
        assert y["mean_ref"] is None
        assert y["effect"] is None
        assert y["t"] is None and y["dof"] is None
        assert y["p_value"] is None
        # the two-sided column is untouched by the join change
        assert rows["x"]["n_ref"] == 3 and rows["x"]["n_new"] == 3
        assert rows["x"]["t"] is not None

    def test_bh_family_m_includes_one_sided_column(self, spark):
        from spark_df_profiling_spark.operators.drift import (
            bh_fdr, welch_ttest)
        ref = spark.createDataFrame(
            [(float(i % 7), None) for i in range(60)],
            "x double, y double")
        new = spark.createDataFrame(
            [(float(i % 7) + 4.0, float(i)) for i in range(60)],
            "x double, y double")
        out = bh_fdr(welch_ttest(ref, new, ["x", "y"]),
                     p_col="p_value")
        rows = {r["column"]: r for r in out.collect()}
        assert set(rows) == {"x", "y"}     # y reaches the BH family
        assert rows["x"]["bh_rejected"] is True
        assert rows["y"]["bh_rejected"] is None  # NULL p stays NULL


class TestPqFitLengthValidation:
    def test_short_row_raises_at_fit(self, spark):
        from spark_df_profiling_spark.operators.similarity import (
            pq_fit)
        from py4j.protocol import Py4JJavaError
        good = _blobs(spark, n_per=5)
        bad = good.unionByName(spark.createDataFrame(
            [(999, [1.0, 2.0, 3.0, 4.0])],
            "vec_id long, embedding array<double>"))
        with pytest.raises(Exception, match="length"):
            try:
                pq_fit(bad, m=2, k=2, n_iter=1)
            except Py4JJavaError as e:
                raise RuntimeError(str(e)) from e

    def test_uniform_length_fit_unchanged(self, spark):
        from spark_df_profiling_spark.operators.similarity import (
            pq_fit)
        st = pq_fit(_blobs(spark, n_per=5), m=2, k=2, n_iter=1)
        assert st["m"] == 2 and st["dim"] == 8
        assert len(st["codebooks"]) == 2

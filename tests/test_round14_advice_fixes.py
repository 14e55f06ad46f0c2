"""Pins for the five ADVICE r13 findings (fixed in round 14).

1. _avif_dims: a bare find(b'ispe') trusted any hit — a stray 'ispe'
   byte sequence inside an earlier box (EXIF blob, mdat data) yielded
   garbage extents.  Now each candidate must re-read as a real FullBox
   (preceding 4 bytes == box size 20, version/flags word == 0) and the
   scan continues past false hits.
2. weight_diagnostics: NULL weights were filtered before the aggregate
   and never reached n_nonpos, contradicting the docstring.  NULL
   weights now count into n_nonpos alongside zero/negative ones.
3. pca_fit: the variance trace used sum(x^2) - (sum x)^2/n about zero,
   which cancels catastrophically under a large common offset.  Moments
   are now accumulated about a pilot point (the first row's values).
4. bpe_token_count: duplicate ids silently received the combined token
   total of every row sharing the id.  Now validated (count vs
   countDistinct) with an opt-out for known-unique corpora.
5. streaming_ks: ks_reference permits 4096 edges but each edge is one
   streaming agg column — 4096 risks codegen fallback.  streaming_ks
   now caps the accepted reference at 512 edges with a named error.
"""

import pytest
from pyspark.sql import functions as F


class TestAvifIspeValidation:
    @staticmethod
    def _ftyp():
        return ((16).to_bytes(4, "big") + b"ftyp" + b"avif"
                + b"\x00" * 4)

    @staticmethod
    def _ispe(w, h, size=20, verflags=0):
        return (size.to_bytes(4, "big") + b"ispe"
                + verflags.to_bytes(4, "big")
                + w.to_bytes(4, "big") + h.to_bytes(4, "big"))

    def test_valid_ispe_still_parses(self):
        from spark_df_profiling_spark.operators.multimodal import (
            sniff_image_meta)
        payload = self._ftyp() + self._ispe(640, 480)
        assert sniff_image_meta(payload) == ("image/avif", 640, 480)

    def test_stray_ispe_in_blob_is_skipped(self):
        """An 'ispe' byte sequence inside opaque data (no valid
        size/version prefix) must not yield garbage extents; the real
        box later in the buffer wins."""
        from spark_df_profiling_spark.operators.multimodal import (
            sniff_image_meta)
        stray = b"\xde\xad\xbe\xefispe" + b"\xff" * 12  # bad size+flags
        payload = self._ftyp() + stray + self._ispe(123, 456)
        assert sniff_image_meta(payload) == ("image/avif", 123, 456)

    def test_stray_ispe_only_returns_none(self):
        from spark_df_profiling_spark.operators.multimodal import (
            sniff_image_meta)
        payload = self._ftyp() + b"\x00\x00\x00\x99ispe" + b"\xff" * 12
        assert sniff_image_meta(payload) == ("image/avif", None, None)

    def test_wrong_version_flags_rejected(self):
        from spark_df_profiling_spark.operators.multimodal import (
            sniff_image_meta)
        payload = self._ftyp() + self._ispe(9, 9, verflags=1)
        assert sniff_image_meta(payload) == ("image/avif", None, None)


class TestWeightDiagnosticsNullWeights:
    def test_null_weights_counted_in_n_nonpos(self, spark):
        from spark_df_profiling_spark.operators.sampling import (
            weight_diagnostics)
        df = spark.createDataFrame(
            [(1.0,), (2.0,), (None,), (0.0,), (-3.0,), (None,)],
            "w double")
        row = weight_diagnostics(df, "w").collect()[0]
        assert row["n"] == 2
        assert row["n_nonpos"] == 4  # two NULLs + zero + negative
        assert row["sum_w"] == pytest.approx(3.0)

    def test_grouped_null_weight_counted_null_group_dropped(self, spark):
        from spark_df_profiling_spark.operators.sampling import (
            weight_diagnostics)
        df = spark.createDataFrame(
            [("a", 1.0), ("a", None), ("a", 4.0), (None, 9.0)],
            "g string, w double")
        rows = weight_diagnostics(df, "w", group_col="g").collect()
        assert len(rows) == 1 and rows[0]["g"] == "a"
        assert rows[0]["n"] == 2 and rows[0]["n_nonpos"] == 1
        ess = (1.0 + 4.0) ** 2 / (1.0 + 16.0)
        assert rows[0]["ess"] == pytest.approx(ess)


class TestPcaFitPilotShift:
    def test_large_offset_trace_is_stable(self, spark):
        """Embeddings at offset 1e8 with spread ~1: the un-shifted
        one-pass formula loses every significant digit of the
        variance (1e16 - 1e16); the pilot-shifted one keeps it."""
        import numpy as np
        rng = np.random.RandomState(7)
        base = 1.0e8
        vals = rng.standard_normal((200, 4))
        rows = [([float(base + x) for x in v],) for v in vals]
        df = spark.createDataFrame(rows, "embedding array<double>")
        from spark_df_profiling_spark.operators.similarity import (
            pca_fit)
        st = pca_fit(df, k=4, vec_col="embedding")
        expected = float(np.cov((vals + base).T).trace())
        assert st["total_variance"] == pytest.approx(
            expected, rel=1e-6)
        for i in range(4):
            assert st["mean"][i] == pytest.approx(
                float(np.mean(vals[:, i]) + base), rel=1e-12)

    def test_plain_corpus_unchanged(self, spark):
        import numpy as np
        rng = np.random.RandomState(11)
        vals = rng.standard_normal((100, 3))
        df = spark.createDataFrame(
            [([float(x) for x in v],) for v in vals],
            "embedding array<double>")
        from spark_df_profiling_spark.operators.similarity import (
            pca_fit)
        st = pca_fit(df, k=3, vec_col="embedding")
        assert st["total_variance"] == pytest.approx(
            float(np.cov(vals.T).trace()), rel=1e-9)
        # full-rank eigenreconstruction still equals the covariance
        cov = np.cov(vals.T)
        rec = np.zeros((3, 3))
        for ev, c in zip(st["explained_variance"], st["components"]):
            c = np.array(c)
            rec += ev * np.outer(c, c)
        assert np.allclose(rec, cov, atol=1e-8)


class TestBpeTokenCountIdValidation:
    def test_duplicate_ids_raise(self, spark):
        from spark_df_profiling_spark.operators.text import (
            bpe_train, bpe_token_count)
        df = spark.createDataFrame(
            [(1, "aa bb"), (1, "cc dd"), (2, "ee")],
            "doc_id long, text string")
        merges = bpe_train(df, "text", n_merges=2, max_word_types=None, min_pair_count=1)
        with pytest.raises(ValueError, match="not unique"):
            bpe_token_count(df, "text", merges, "doc_id").collect()

    def test_null_ids_raise(self, spark):
        from spark_df_profiling_spark.operators.text import (
            bpe_train, bpe_token_count)
        df = spark.createDataFrame(
            [(1, "aa bb"), (None, "cc")], "doc_id long, text string")
        merges = bpe_train(df, "text", n_merges=1, max_word_types=None, min_pair_count=1)
        with pytest.raises(ValueError, match="NULL id"):
            bpe_token_count(df, "text", merges, "doc_id").collect()

    def test_validation_opt_out_skips_check(self, spark):
        from spark_df_profiling_spark.operators.text import (
            bpe_train, bpe_token_count)
        df = spark.createDataFrame(
            [(1, "aa bb"), (1, "cc")], "doc_id long, text string")
        merges = bpe_train(df, "text", n_merges=1, max_word_types=None, min_pair_count=1)
        out = bpe_token_count(df, "text", merges, "doc_id",
                              validate_ids=False)
        assert out.count() == 2  # documented caller-owns-it mode

    def test_unique_ids_pass(self, spark):
        from spark_df_profiling_spark.operators.text import (
            bpe_train, bpe_token_count)
        df = spark.createDataFrame(
            [(1, "aa aa"), (2, "bb")], "doc_id long, text string")
        merges = bpe_train(df, "text", n_merges=1, max_word_types=None, min_pair_count=1)
        rows = {r["doc_id"]: r["n_tokens_bpe"]
                for r in bpe_token_count(
                    df, "text", merges, "doc_id").collect()}
        assert set(rows) == {1, 2} and all(v > 0 for v in rows.values())


class TestStreamingKsEdgeCap:
    def test_oversized_reference_raises(self, spark):
        from spark_df_profiling_spark.streaming import streaming_ks
        ref = [(float(i), (i + 1) / 513.0) for i in range(513)]
        df = spark.createDataFrame(
            [("2024-01-01 00:00:00", 1.0)], "ts string, v double"
        ).select(F.col("ts").cast("timestamp").alias("ts"), "v")
        with pytest.raises(ValueError, match="512"):
            streaming_ks(df, "ts", "v", ref)

    def test_at_cap_accepted(self, spark):
        from spark_df_profiling_spark.streaming import streaming_ks
        ref = [(float(i), (i + 1) / 513.0) for i in range(512)]
        df = spark.createDataFrame(
            [("2024-01-01 00:00:00", 1.0)], "ts string, v double"
        ).select(F.col("ts").cast("timestamp").alias("ts"), "v")
        out = streaming_ks(df, "ts", "v", ref)
        assert "d_stat" in out.columns

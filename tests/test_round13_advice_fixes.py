"""Pins for the five ADVICE r12 findings (fixed in round 13).

1. ab_test_report: CUPED with an n=1 arm raised an opaque TypeError
   (NULL var_samp/covar_samp) — now a named ValueError.
2. silhouette_simplified: a vector shorter than the centroid dimension
   silently scored s=0 under a NULL cluster — now raises at execution
   (the cluster_quality contract).
3. covariate_balance: the arm-list collect re-scanned the input — the
   cells frame is localCheckpoint-ed, and the output is unchanged.
4. oracle 'gain' rows: concat_ws (NULL-skipping) vs DuckDB '||'
   (NULL-propagating) — both engines now coalesce each term to 'null';
   pinned here on a no-positives group.
5. bpe_pair_counts: sub_partitions=0 made pmod NULL-bucket every pair
   into one task, silently defeating the two-phase skew protection —
   now a named ValueError.
"""

import pytest
from pyspark.sql import functions as F


class TestAbTestCupedSmallArm:
    def test_n1_arm_with_covariate_raises_named(self, spark):
        from spark_df_profiling_spark.operators.evaluation import (
            ab_test_report)
        df = spark.createDataFrame(
            [("a", 1.0, 2.0)] + [("b", float(i), float(i + 1))
                                 for i in range(5)],
            ["arm", "y", "x"])
        with pytest.raises(ValueError, match="n >= 2"):
            ab_test_report(df, "arm", "y", covariate_col="x")

    def test_both_arms_n1_with_covariate_raises_named(self, spark):
        from spark_df_profiling_spark.operators.evaluation import (
            ab_test_report)
        df = spark.createDataFrame(
            [("a", 1.0, 2.0), ("b", 3.0, 4.0)], ["arm", "y", "x"])
        with pytest.raises(ValueError, match="n >= 2"):
            ab_test_report(df, "arm", "y", covariate_col="x")

    def test_n1_arm_without_covariate_still_reports(self, spark):
        from spark_df_profiling_spark.operators.evaluation import (
            ab_test_report)
        df = spark.createDataFrame(
            [("a", 1.0)] + [("b", float(i)) for i in range(5)],
            ["arm", "y"])
        row = ab_test_report(df, "arm", "y").collect()[0]
        assert row["n_a"] == 1 and row["n_b"] == 5
        assert row["effect"] == pytest.approx(2.0 - 1.0)


class TestSilhouetteShortVector:
    def test_short_vector_raises_at_execution(self, spark):
        from spark_df_profiling_spark.operators.clustering import (
            silhouette_simplified)
        df = spark.createDataFrame(
            [([0.0, 0.0],), ([1.0],)], ["embedding"])
        out = silhouette_simplified(
            df, [[0.0, 0.0], [5.0, 5.0]])
        with pytest.raises(Exception, match="centroid dimension"):
            out.collect()

    def test_well_formed_vectors_unchanged(self, spark):
        from spark_df_profiling_spark.operators.clustering import (
            silhouette_simplified)
        df = spark.createDataFrame(
            [([0.1, 0.0],), ([0.0, 0.1],), ([5.0, 5.1],)],
            ["embedding"])
        rows = {r["cluster"]: r for r in silhouette_simplified(
            df, [[0.0, 0.0], [5.0, 5.0]]).collect()}
        assert set(rows) == {0, 1}
        assert rows[0]["n"] == 2 and rows[1]["n"] == 1
        assert rows[0]["mean_silhouette"] > 0.9


class TestCovariateBalanceSingleScan:
    def test_output_unchanged_after_checkpoint(self, spark):
        from spark_df_profiling_spark.operators.evaluation import (
            covariate_balance)
        df = spark.createDataFrame(
            [("a", float(i), float(i * 2)) for i in range(10)]
            + [("b", float(i + 5), float(i * 2 + 1))
               for i in range(10)],
            ["arm", "c1", "c2"])
        rows = {r["column"]: r for r in
                covariate_balance(df, "arm", ["c1", "c2"]).collect()}
        assert set(rows) == {"c1", "c2"}
        r = rows["c1"]
        assert r["n_a"] == 10 and r["n_b"] == 10
        assert r["mean_b"] - r["mean_a"] == pytest.approx(5.0)
        assert r["flagged"] is True


class TestGainOracleNullEncoding:
    def test_no_positive_group_encodes_null_identically(self, spark):
        """A group with zero positives has NULL gain/lift; both the
        Spark and DuckDB encodings must render 'x/null/null', never
        silently drop terms (the old concat_ws behavior)."""
        import duckdb

        from spark_df_profiling_spark.oracle import sig
        from spark_df_profiling_spark.operators.evaluation import (
            gains_curve)
        df = spark.createDataFrame(
            [(0, False, float(i)) for i in range(8)]
            + [(1, i % 2 == 0, float(i)) for i in range(8)],
            ["g", "y", "s"])
        enc = (gains_curve(df, "y", "s", n_buckets=4, group_col="g")
               .select("g", "bucket",
                       F.concat(
                           F.coalesce(sig(F.col("cum_pos")),
                                      F.lit("null")), F.lit("/"),
                           F.coalesce(sig(F.col("gain")),
                                      F.lit("null")), F.lit("/"),
                           F.coalesce(sig(F.col("lift")),
                                      F.lit("null"))).alias("e"))
               .collect())
        g0 = [r["e"] for r in enc if r["g"] == 0]
        assert g0, "no rows for the no-positives group"
        for e in g0:
            parts = e.split("/")
            assert len(parts) == 3, e
            assert parts[1] == "null" and parts[2] == "null", e
        # DuckDB renders the same shape under the coalesce pattern
        d = duckdb.sql(
            "SELECT coalesce(NULL::VARCHAR, 'null') || '/' || "
            "coalesce(NULL::VARCHAR, 'null')").fetchone()[0]
        assert d == "null/null"


class TestBpeSubPartitionsValidation:
    def test_zero_raises_named(self, spark):
        from spark_df_profiling_spark.operators.text import (
            bpe_pair_counts)
        df = spark.createDataFrame([("ab ab",)], ["text"])
        with pytest.raises(ValueError, match="sub_partitions"):
            bpe_pair_counts(df, "text", k=5, sub_partitions=0)

    def test_negative_raises_named(self, spark):
        from spark_df_profiling_spark.operators.text import (
            bpe_pair_counts)
        df = spark.createDataFrame([("ab ab",)], ["text"])
        with pytest.raises(ValueError, match="sub_partitions"):
            bpe_pair_counts(df, "text", k=5, sub_partitions=-3)

"""knn_ivf (round 14): IVF-flat ANN over frozen deterministic
kmeans_fit centroids — corpus assignment and query probe lists as pure
row expressions, candidate join a broadcast HASH join on cluster id,
int8-ADC composition, and the scanned-volume readout."""

import pytest
from pyspark.sql import functions as F

from spark_df_profiling_spark.operators.clustering import kmeans_fit
from spark_df_profiling_spark.operators.similarity import (
    ivf_candidate_stats, ivf_probe_expr, knn_bruteforce, knn_ivf,
    knn_ivf_quantized)


def _blobs(spark, seed=7, n_per=40, n_blobs=4, dim=8):
    """DIRECTIONALLY separated Gaussian blobs: blob b concentrates on
    dimensions 2b/2b+1 (centers orthogonal, so blobs are far apart in
    cosine as well as L2 — a same-offset-every-dim layout would put
    all blobs on one ray and cosine neighbors would legitimately
    cross blobs)."""
    import numpy as np
    rng = np.random.RandomState(seed)
    rows = []
    i = 0
    for b in range(n_blobs):
        center = np.zeros(dim)
        center[2 * b] = 10.0
        center[2 * b + 1] = 10.0
        for _ in range(n_per):
            v = rng.standard_normal(dim) * 0.5 + center
            rows.append((i, [float(x) for x in v]))
            i += 1
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>")


class TestProbeExpr:
    def test_orders_by_distance_tie_to_lower_id(self, spark):
        cents = [[0.0, 0.0], [10.0, 0.0], [0.0, 10.0], [5.0, 0.0]]
        df = spark.createDataFrame(
            [([1.0, 0.0],), ([7.5, 0.0],)], "v array<double>")
        got = [list(r["p"]) for r in df.select(
            ivf_probe_expr(F.col("v"), cents, 2).alias("p")
        ).collect()]
        assert got[0] == [0, 3]       # nearest then next
        # 7.5 is EQUIDISTANT from centroids 1 (10,0) and 3 (5,0):
        # tie resolves to the lower cluster id first
        assert got[1] == [1, 3]

    def test_nprobe_bounds(self, spark):
        df = _blobs(spark)
        cents = kmeans_fit(df, k=4, n_iter=2, seed=0)
        with pytest.raises(ValueError, match="nprobe"):
            knn_ivf(df, df.limit(1), cents, nprobe=5)
        with pytest.raises(ValueError, match="nprobe"):
            knn_ivf(df, df.limit(1), cents, nprobe=0)


class TestKnnIvf:
    def test_full_probe_equals_bruteforce(self, spark):
        df = _blobs(spark)
        q = df.where(F.col("vec_id") < 5)
        cents = kmeans_fit(df, k=4, n_iter=2, seed=0)
        ivf = knn_ivf(df, q, cents, k=3, nprobe=4)
        bf = knn_bruteforce(df, q, k=3)
        a = {(r["query_id"], r["rank"]): (r["neighbor_id"], r["sim"])
             for r in ivf.collect()}
        b = {(r["query_id"], r["rank"]): (r["neighbor_id"], r["sim"])
             for r in bf.collect()}
        assert set(a) == set(b)
        for key in a:
            assert a[key][0] == b[key][0], key
            assert a[key][1] == pytest.approx(b[key][1], rel=1e-12)

    def test_partial_probe_recall_on_blobs(self, spark):
        """Blob-separated data: nprobe=1 finds the blob-mates —
        IVF's whole premise."""
        df = _blobs(spark)
        q = df.where(F.col("vec_id").isin(0, 45, 90, 135))
        # centroids at the known blob centers: the test pins the IVF
        # probing/scoring machinery, not kmeans quality
        cents = []
        for b in range(4):
            c = [0.0] * 8
            c[2 * b] = c[2 * b + 1] = 10.0
            cents.append(c)
        ivf = knn_ivf(df, q, cents, k=3, nprobe=1)
        bf = knn_bruteforce(df, q, k=3)
        a = {(r["query_id"], r["neighbor_id"]) for r in ivf.collect()}
        b = {(r["query_id"], r["neighbor_id"]) for r in bf.collect()}
        # every true top-3 neighbor lives in the query's own blob ->
        # a single probe finds them all
        assert b <= a

    def test_plan_hash_join_no_cartesian(self, spark):
        df = _blobs(spark)
        q = df.where(F.col("vec_id") < 3)
        cents = kmeans_fit(df, k=4, n_iter=2, seed=0)
        out = knn_ivf(df, q, cents, k=3, nprobe=2)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
        assert "Python" not in plan

    def test_quantized_compose_matches_quantized_bruteforce(
            self, spark):
        from spark_df_profiling_spark.operators.similarity import (
            knn_bruteforce_quantized, quantization_ranges,
            quantize_embeddings)
        df = _blobs(spark)
        q = df.where(F.col("vec_id") < 4)
        cents = kmeans_fit(df, k=4, n_iter=2, seed=0)
        ranges = quantization_ranges(df)
        cq = quantize_embeddings(df, ranges).drop("embedding")
        full = knn_ivf_quantized(cq, q, cents, ranges, k=3, nprobe=4)
        bf = knn_bruteforce_quantized(cq, q, ranges, k=3)
        a = {(r["query_id"], r["rank"], r["neighbor_id"])
             for r in full.collect()}
        b = {(r["query_id"], r["rank"], r["neighbor_id"])
             for r in bf.collect()}
        assert a == b


class TestCandidateStats:
    def test_full_probe_fraction_is_one(self, spark):
        df = _blobs(spark)
        q = df.where(F.col("vec_id") < 3)
        cents = kmeans_fit(df, k=4, n_iter=2, seed=0)
        rows = ivf_candidate_stats(df, q, cents, nprobe=4).collect()
        assert len(rows) == 3
        for r in rows:
            assert r["n_corpus"] == 160
            assert r["n_candidates"] == 160
            assert r["candidate_fraction"] == pytest.approx(1.0)

    def test_partial_probe_fraction_matches_cluster_sizes(self, spark):
        df = _blobs(spark)
        q = df.where(F.col("vec_id") == 0)
        cents = kmeans_fit(df, k=4, n_iter=3, seed=0)
        from spark_df_profiling_spark.operators.clustering import (
            kmeans_assign)
        sizes = {r["cluster"]: r["count"] for r in
                 kmeans_assign(df, cents).groupBy("cluster")
                 .count().collect()}
        probes = df.where(F.col("vec_id") == 0).select(
            ivf_probe_expr(F.col("embedding"), cents, 2).alias("p")
        ).collect()[0]["p"]
        expect = sum(sizes.get(c, 0) for c in probes)
        row = ivf_candidate_stats(df, q, cents, nprobe=2).collect()[0]
        assert row["n_candidates"] == expect
        assert row["candidate_fraction"] == pytest.approx(
            expect / 160.0)
        assert 0 < row["candidate_fraction"] < 1

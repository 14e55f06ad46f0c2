"""Product quantization (round 14): pq_fit / pq_encode /
pq_reconstruction_stats / pq_adc_topk — the FAISS PQ+ADC recipe on
deterministic per-subspace kmeans_fit codebooks."""

import pytest
from pyspark.sql import functions as F

from spark_df_profiling_spark.operators.similarity import (
    knn_bruteforce, pq_adc_topk, pq_encode, pq_fit,
    pq_reconstruction_stats)
from tests.test_round14_ivf import _blobs


def _py_encode(vec, state):
    m, sd = state["m"], state["sub_dim"]
    out = []
    for s in range(m):
        sub = vec[s * sd:(s + 1) * sd]
        best = None
        for j, c in enumerate(state["codebooks"][s]):
            d = sum((a - b) ** 2 for a, b in zip(sub, c))
            if best is None or d < best[0]:
                best = (d, j)
        out.append(best[1])
    return out


def _py_adc(qvec, codes, state):
    m, sd = state["m"], state["sub_dim"]
    dist = 0.0
    for s in range(m):
        sub = qvec[s * sd:(s + 1) * sd]
        c = state["codebooks"][s][codes[s]]
        dist += sum((a - b) ** 2 for a, b in zip(sub, c))
    return dist


class TestPqFit:
    def test_state_shape(self, spark):
        df = _blobs(spark)
        st = pq_fit(df, m=4, k=3, n_iter=2, seed=0)
        assert st["m"] == 4 and st["k"] == 3
        assert st["dim"] == 8 and st["sub_dim"] == 2
        assert len(st["codebooks"]) == 4
        for cb in st["codebooks"]:
            assert len(cb) == 3 and all(len(c) == 2 for c in cb)

    def test_dim_not_divisible_raises(self, spark):
        df = _blobs(spark)
        with pytest.raises(ValueError, match="divisible"):
            pq_fit(df, m=3)

    def test_bounds(self, spark):
        df = _blobs(spark)
        with pytest.raises(ValueError, match="m must"):
            pq_fit(df, m=0)
        with pytest.raises(ValueError, match="k must"):
            pq_fit(df, m=4, k=1)


class TestPqEncode:
    def test_matches_python_argmin(self, spark):
        df = _blobs(spark, n_per=20)
        st = pq_fit(df, m=4, k=3, n_iter=2, seed=0)
        got = {r["vec_id"]: list(r["pq_codes"]) for r in
               pq_encode(df, st).collect()}
        for r in df.collect():
            assert got[r["vec_id"]] == _py_encode(
                [float(x) for x in r["embedding"]], st), r["vec_id"]

    def test_null_vector_encodes_null(self, spark):
        df = _blobs(spark, n_per=5)
        st = pq_fit(df, m=2, k=2, n_iter=1)
        withnull = df.unionByName(spark.createDataFrame(
            [(999, None)], "vec_id long, embedding array<double>"))
        got = {r["vec_id"]: r["pq_codes"] for r in
               pq_encode(withnull, st).collect()}
        assert got[999] is None

    def test_wrong_length_raises(self, spark):
        df = _blobs(spark, n_per=5)
        st = pq_fit(df, m=2, k=2, n_iter=1)
        bad = spark.createDataFrame(
            [(1, [1.0, 2.0])], "vec_id long, embedding array<double>")
        from py4j.protocol import Py4JJavaError
        with pytest.raises(Exception, match="length"):
            try:
                pq_encode(bad, st).collect()
            except Py4JJavaError as e:
                raise RuntimeError(str(e)) from e


class TestPqAdc:
    def test_distances_match_python_lut(self, spark):
        df = _blobs(spark, n_per=15)
        st = pq_fit(df, m=4, k=3, n_iter=2, seed=0)
        codes = pq_encode(df, st)
        q = df.where(F.col("vec_id") < 2)
        got = pq_adc_topk(codes, q, st, k=5)
        code_map = {r["vec_id"]: list(r["pq_codes"]) for r in
                    codes.collect()}
        qvecs = {r["vec_id"]: [float(x) for x in r["embedding"]]
                 for r in q.collect()}
        for r in got.collect():
            exp = _py_adc(qvecs[r["query_id"]],
                          code_map[r["neighbor_id"]], st)
            assert r["dist"] == pytest.approx(exp, rel=1e-12)

    def test_ranks_ascending_self_excluded(self, spark):
        df = _blobs(spark, n_per=15)
        st = pq_fit(df, m=4, k=4, n_iter=2, seed=0)
        codes = pq_encode(df, st)
        q = df.where(F.col("vec_id") < 3)
        rows = pq_adc_topk(codes, q, st, k=4).collect()
        by_q = {}
        for r in rows:
            assert r["neighbor_id"] != r["query_id"]
            by_q.setdefault(r["query_id"], []).append(
                (r["rank"], r["dist"]))
        for lst in by_q.values():
            lst.sort()
            ds = [d for _, d in lst]
            assert ds == sorted(ds)

    def test_blob_membership_recall(self, spark):
        """Directional blobs, L2-normalized upstream: every PQ top-5
        neighbor comes from the query's own blob.  (PQ's resolution
        is the codebook cell — WITHIN-blob ordering is quantized
        away, which is why production pipelines rerank PQ candidates
        exactly; cross-blob separation is the property PQ owes us.)"""
        from spark_df_profiling_spark.operators.similarity import (
            l2_norm)
        raw = _blobs(spark)
        df = raw.select(
            "vec_id",
            F.transform("embedding",
                        lambda x: x / l2_norm(F.col("embedding")))
            .alias("embedding")).localCheckpoint()
        st = pq_fit(df, m=4, k=4, n_iter=3, seed=0)
        codes = pq_encode(df, st)
        q = df.where(F.col("vec_id").isin(0, 45, 90, 135))
        for r in pq_adc_topk(codes, q, st, k=5).collect():
            assert r["neighbor_id"] // 40 == r["query_id"] // 40, r

    def test_max_queries_loud(self, spark):
        df = _blobs(spark, n_per=5)
        st = pq_fit(df, m=2, k=2, n_iter=1)
        codes = pq_encode(df, st)
        with pytest.raises(ValueError, match="max_queries"):
            pq_adc_topk(codes, df, st, k=2, max_queries=3)

    def test_plan_no_python_no_join(self, spark):
        df = _blobs(spark, n_per=10)
        st = pq_fit(df, m=2, k=3, n_iter=1)
        codes = pq_encode(df, st).localCheckpoint()
        q = df.where(F.col("vec_id") < 2)
        out = pq_adc_topk(codes, q, st, k=3)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Python" not in plan
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan


class TestPqReconstruction:
    def test_error_matches_python(self, spark):
        df = _blobs(spark, n_per=10)
        st = pq_fit(df, m=4, k=3, n_iter=2, seed=0)
        codes = pq_encode(df, st)
        row = pq_reconstruction_stats(codes, st).collect()[0]
        errs = []
        for r in codes.collect():
            v = [float(x) for x in r["embedding"]]
            e = _py_adc(v, list(r["pq_codes"]), st)
            errs.append(e)
        assert row["n"] == len(errs)
        assert row["mean_sq_err"] == pytest.approx(
            sum(errs) / len(errs), rel=1e-9)
        assert row["max_sq_err"] == pytest.approx(max(errs),
                                                  rel=1e-9)


class TestIvfPq:
    def test_full_probe_matches_pq_adc(self, spark):
        """nprobe == n_clusters: IVFPQ degenerates to plain ADC."""
        from spark_df_profiling_spark.operators.clustering import (
            kmeans_assign, kmeans_fit)
        from spark_df_profiling_spark.operators.similarity import (
            ivf_pq_topk)
        df = _blobs(spark, n_per=15)
        st = pq_fit(df, m=4, k=3, n_iter=2, seed=0)
        cents = kmeans_fit(df, k=4, n_iter=2, seed=0)
        corpus = pq_encode(kmeans_assign(df, cents), st) \
            .localCheckpoint()
        q = df.where(F.col("vec_id") < 3)
        full = ivf_pq_topk(corpus, q, cents, st, k=4, nprobe=4)
        plain = pq_adc_topk(corpus, q, st, k=4)
        a = {(r["query_id"], r["rank"]): (r["neighbor_id"], r["dist"])
             for r in full.collect()}
        b = {(r["query_id"], r["rank"]): (r["neighbor_id"], r["dist"])
             for r in plain.collect()}
        assert set(a) == set(b)
        for key in a:
            assert a[key][0] == b[key][0], key
            assert a[key][1] == pytest.approx(b[key][1], rel=1e-12)

    def test_partial_probe_blob_membership(self, spark):
        from spark_df_profiling_spark.operators.clustering import (
            kmeans_assign)
        from spark_df_profiling_spark.operators.similarity import (
            ivf_pq_topk, l2_norm)
        raw = _blobs(spark)
        df = raw.select(
            "vec_id",
            F.transform("embedding",
                        lambda x: x / l2_norm(F.col("embedding")))
            .alias("embedding")).localCheckpoint()
        cents = []
        for b in range(4):
            c = [0.0] * 8
            c[2 * b] = c[2 * b + 1] = 10.0
            cents.append(c)
        st = pq_fit(df, m=4, k=4, n_iter=3, seed=0)
        corpus = pq_encode(kmeans_assign(df, cents), st) \
            .localCheckpoint()
        q = df.where(F.col("vec_id").isin(0, 45, 90, 135))
        for r in ivf_pq_topk(corpus, q, cents, st, k=5,
                             nprobe=1).collect():
            assert r["neighbor_id"] // 40 == r["query_id"] // 40, r

    def test_plan_hash_join_no_nlj(self, spark):
        from spark_df_profiling_spark.operators.clustering import (
            kmeans_assign, kmeans_fit)
        from spark_df_profiling_spark.operators.similarity import (
            ivf_pq_topk)
        df = _blobs(spark, n_per=10)
        st = pq_fit(df, m=2, k=3, n_iter=1)
        cents = kmeans_fit(df, k=3, n_iter=1)
        corpus = pq_encode(kmeans_assign(df, cents), st) \
            .localCheckpoint()
        out = ivf_pq_topk(corpus, df.where(F.col("vec_id") < 2),
                          cents, st, k=3, nprobe=2)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan
        assert "BroadcastNestedLoopJoin" not in plan
        assert "CartesianProduct" not in plan
        assert "Python" not in plan

    def test_validation(self, spark):
        from spark_df_profiling_spark.operators.similarity import (
            ivf_pq_topk)
        df = _blobs(spark, n_per=5)
        st = pq_fit(df, m=2, k=2, n_iter=1)
        codes = pq_encode(df, st)
        with pytest.raises(ValueError, match="missing column"):
            ivf_pq_topk(codes, df, [[0.0] * 8], st, nprobe=1)

"""ivf_pq_refine (round 15): IVFPQ + exact refinement — the FAISS
IndexRefineFlat recipe (Jégou et al. 2011 §V; faiss IndexRefine).
Candidates come from the graded ivf_pq_topk ADC path; only candidates
are re-scored against the float store, so distances are exact and the
only error mode is a true neighbor missing the candidate set."""

import pytest
from pyspark.sql import functions as F

from spark_df_profiling_spark.operators.clustering import (
    kmeans_assign, kmeans_fit)
from spark_df_profiling_spark.operators.similarity import (
    ivf_pq_refine, knn_bruteforce, pq_encode, pq_fit)
from tests.test_round14_ivf import _blobs


def _corpus(spark, n_per=15, m=4, kk=3, n_cents=4):
    df = _blobs(spark, n_per=n_per).localCheckpoint()
    st = pq_fit(df, m=m, k=kk, n_iter=2, seed=0)
    cents = kmeans_fit(df, k=n_cents, n_iter=2, seed=0)
    corpus = pq_encode(kmeans_assign(df, cents), st).localCheckpoint()
    return df, st, cents, corpus


class TestIvfPqRefine:
    def test_full_coverage_equals_bruteforce_l2(self, spark):
        """nprobe = all clusters and rerank_k = |corpus|: every row is
        a candidate and the exact re-score must reproduce brute-force
        L2 top-k exactly — the deterministic-invariant device behind
        the ann_recall_gates 'ivfpq' row."""
        df, st, cents, corpus = _corpus(spark)
        n = df.count()
        q = df.where(F.col("vec_id") < 3)
        got = ivf_pq_refine(corpus, q, cents, st, k=4, nprobe=4,
                            rerank_k=n)
        rows = {(r["query_id"], r["rank"]):
                (r["neighbor_id"], r["dist"]) for r in got.collect()}
        pts = {r["vec_id"]: [float(x) for x in r["embedding"]]
               for r in df.collect()}
        for qid in (0, 1, 2):
            dists = sorted(
                (sum((a - b) ** 2 for a, b in zip(pts[qid], v)), nid)
                for nid, v in pts.items() if nid != qid)
            for rank, (d, nid) in enumerate(dists[:4], start=1):
                gnid, gd = rows[(qid, rank)]
                assert gnid == nid, (qid, rank)
                assert gd == pytest.approx(d, rel=1e-9)

    def test_partial_probe_membership(self, spark):
        """nprobe=1 on directional blobs: refined neighbors stay in
        the query's blob (the candidate generator is the graded
        ivf_pq_topk path; refinement can only improve ordering)."""
        from spark_df_profiling_spark.operators.similarity import (
            l2_norm)
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
        out = ivf_pq_refine(corpus, q, cents, st, k=5, nprobe=1,
                            rerank_k=20)
        for r in out.collect():
            assert r["neighbor_id"] // 40 == r["query_id"] // 40, r

    def test_refine_fixes_adc_ranking(self, spark):
        """Exact distances: the refined dist column equals true
        squared L2, NOT the quantized ADC approximation."""
        df, st, cents, corpus = _corpus(spark, m=2, kk=2)
        q = df.where(F.col("vec_id") == 0)
        out = ivf_pq_refine(corpus, q, cents, st, k=3, nprobe=4,
                            rerank_k=60).collect()
        pts = {r["vec_id"]: [float(x) for x in r["embedding"]]
               for r in df.collect()}
        for r in out:
            true = sum((a - b) ** 2 for a, b in
                       zip(pts[0], pts[r["neighbor_id"]]))
            assert r["dist"] == pytest.approx(true, rel=1e-9)

    def test_guards(self, spark):
        df, st, cents, corpus = _corpus(spark, n_per=5)
        q = df.where(F.col("vec_id") < 1)
        with pytest.raises(ValueError, match="rerank_k"):
            ivf_pq_refine(corpus, q, cents, st, k=5, rerank_k=3)
        with pytest.raises(ValueError, match="refine store"):
            ivf_pq_refine(corpus.drop("embedding"), q, cents, st,
                          k=2, rerank_k=4)

    def test_plan_no_nlj(self, spark):
        df, st, cents, corpus = _corpus(spark, n_per=5)
        q = df.where(F.col("vec_id") < 2)
        plan = ivf_pq_refine(corpus, q, cents, st, k=2, nprobe=2,
                             rerank_k=4)._jdf.queryExecution() \
            .executedPlan().toString()
        assert "BroadcastNestedLoopJoin" not in plan
        assert "CartesianProduct" not in plan

"""Residual-encoding IVFPQ (round 15): pq_fit(residuals_of=...) fits
the codebooks on x − coarse_centroid(x) — FAISS IVFPQ's by_residual
(Jégou et al. 2011 §V.B).  Residuals concentrate around 0 far tighter
than raw vectors concentrate around anything, so the same m·k budget
quantizes finer: reconstruction error drops and IVFPQ recall rises at
equal code size.  ivf_pq_topk switches to per-(query, probed-cluster)
LUTs measured against (q − c_cluster); pq_adc_topk rejects residual
states loudly."""

import pytest
from pyspark.sql import functions as F

from spark_df_profiling_spark.operators.clustering import (
    kmeans_assign, kmeans_fit)
from spark_df_profiling_spark.operators.similarity import (
    ivf_pq_topk, pq_adc_topk, pq_encode, pq_fit,
    pq_reconstruction_stats)
from tests.test_round14_ivf import _blobs


def _py_residual(vec, cents):
    best = min(range(len(cents)),
               key=lambda i: (sum((a - b) ** 2
                                  for a, b in zip(vec, cents[i])), i))
    return [a - b for a, b in zip(vec, cents[best])], best


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


class TestResidualFitEncode:
    def test_state_records_centroids(self, spark):
        df = _blobs(spark, n_per=10)
        cents = kmeans_fit(df, k=4, n_iter=2, seed=0)
        st = pq_fit(df, m=4, k=3, n_iter=2, seed=0,
                    residuals_of=cents)
        assert st["residuals_of"] == [[float(x) for x in c]
                                      for c in cents]
        assert len(st["codebooks"]) == 4

    def test_wrong_dim_centroids_raise(self, spark):
        df = _blobs(spark, n_per=5)
        with pytest.raises(ValueError, match="residuals_of"):
            pq_fit(df, m=4, k=3, residuals_of=[[0.0, 1.0]])

    def test_encode_matches_python_residual_argmin(self, spark):
        df = _blobs(spark, n_per=10).localCheckpoint()
        cents = kmeans_fit(df, k=4, n_iter=2, seed=0)
        st = pq_fit(df, m=4, k=3, n_iter=2, seed=0,
                    residuals_of=cents)
        got = {r["vec_id"]: list(r["pq_codes"])
               for r in pq_encode(df, st).collect()}
        pts = {r["vec_id"]: [float(x) for x in r["embedding"]]
               for r in df.collect()}
        for vid, vec in pts.items():
            res, _ = _py_residual(vec, cents)
            assert got[vid] == _py_encode(res, st), vid


class TestResidualSearch:
    def test_adc_rejects_residual_state(self, spark):
        df = _blobs(spark, n_per=5)
        cents = kmeans_fit(df, k=2, n_iter=1, seed=0)
        st = pq_fit(df, m=2, k=2, n_iter=1, residuals_of=cents)
        enc = pq_encode(df, st)
        with pytest.raises(ValueError, match="ivf_pq_topk"):
            pq_adc_topk(enc, df.where(F.col("vec_id") < 1), st, k=2)

    def test_mismatched_centroids_raise(self, spark):
        df = _blobs(spark, n_per=5)
        cents = kmeans_fit(df, k=2, n_iter=1, seed=0)
        st = pq_fit(df, m=2, k=2, n_iter=1, residuals_of=cents)
        corpus = pq_encode(kmeans_assign(df, cents), st)
        other = [[1.0] * 8, [2.0] * 8]
        with pytest.raises(ValueError, match="coarse quantizer"):
            ivf_pq_topk(corpus, df.where(F.col("vec_id") < 1),
                        other, st, k=2, nprobe=1)

    def test_distances_match_python_residual_adc(self, spark):
        df = _blobs(spark, n_per=10).localCheckpoint()
        cents = kmeans_fit(df, k=4, n_iter=2, seed=0)
        st = pq_fit(df, m=4, k=3, n_iter=2, seed=0,
                    residuals_of=cents)
        corpus = pq_encode(kmeans_assign(df, cents), st) \
            .localCheckpoint()
        q = df.where(F.col("vec_id") < 2)
        got = ivf_pq_topk(corpus, q, cents, st, k=40, nprobe=4)
        pts = {r["vec_id"]: [float(x) for x in r["embedding"]]
               for r in df.collect()}
        m, sd = st["m"], st["sub_dim"]
        for r in got.collect():
            qv = pts[r["query_id"]]
            nv = pts[r["neighbor_id"]]
            nres, ncl = _py_residual(nv, cents)
            codes = _py_encode(nres, st)
            qres = [a - b for a, b in zip(qv, cents[ncl])]
            want = 0.0
            for s in range(m):
                sub = qres[s * sd:(s + 1) * sd]
                cb = st["codebooks"][s][codes[s]]
                want += sum((a - b) ** 2 for a, b in zip(sub, cb))
            assert r["dist"] == pytest.approx(want, rel=1e-9), r

    def test_residual_recall_beats_or_matches_raw(self, spark):
        """THE quality gate: at equal m/k on the blob fixture,
        residual IVFPQ recall@5 vs exact L2 must be >= raw-vector
        IVFPQ recall@5 (Jégou 2011's whole argument for by_residual:
        the codebook only has to quantize within-cell noise)."""
        df = _blobs(spark).localCheckpoint()
        cents = kmeans_fit(df, k=4, n_iter=3, seed=0)
        q = df.where(F.col("vec_id") % 40 < 2)      # 8 queries
        pts = {r["vec_id"]: [float(x) for x in r["embedding"]]
               for r in df.collect()}
        exact = {}
        for qid in (r["vec_id"] for r in q.collect()):
            dists = sorted(
                (sum((a - b) ** 2
                     for a, b in zip(pts[qid], v)), nid)
                for nid, v in pts.items() if nid != qid)
            exact[qid] = {nid for _, nid in dists[:5]}

        def recall(state):
            corpus = pq_encode(kmeans_assign(df, cents), state) \
                .localCheckpoint()
            got = ivf_pq_topk(corpus, q, cents, state, k=5,
                              nprobe=4)
            hits = 0
            for r in got.collect():
                if r["neighbor_id"] in exact[r["query_id"]]:
                    hits += 1
            return hits / (5.0 * len(exact))

        raw = recall(pq_fit(df, m=4, k=4, n_iter=3, seed=0))
        res = recall(pq_fit(df, m=4, k=4, n_iter=3, seed=0,
                            residuals_of=cents))
        assert res >= raw, (res, raw)
        assert res >= 0.5          # and it must be genuinely useful

    def test_reconstruction_error_improves(self, spark):
        df = _blobs(spark).localCheckpoint()
        cents = kmeans_fit(df, k=4, n_iter=3, seed=0)

        def mse(state):
            enc = pq_encode(df, state)
            row = pq_reconstruction_stats(enc, state).collect()[0]
            return row["mean_sq_err"]

        raw = mse(pq_fit(df, m=4, k=4, n_iter=3, seed=0))
        res = mse(pq_fit(df, m=4, k=4, n_iter=3, seed=0,
                         residuals_of=cents))
        assert res < raw, (res, raw)

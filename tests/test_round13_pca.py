"""PCA family + prototype pruning (round 13) vs numpy/python oracles.

pca_fit = a cheap 2d+2-column aggregate (mean / variance trace /
ragged count) + the pyspark.ml BLAS-Gramian basis — the same
freeze-the-config contract as quantization_ranges / standardize_stats.
The covariance arithmetic is oracle-graded in embedding_array_stats
('pcacov' / 'pcatv' rows — full-rank eigenreconstruction vs
covar_samp); the eigen chain is pinned here against numpy directly.
prototypicality_prune (D4-style) is pinned against an exact python
order-statistic reference, tie block inclusive.
"""

import math
import random

import numpy as np
import pytest
from pyspark.sql import functions as F

from spark_df_profiling_spark.operators.similarity import (
    PCA_MAX_DIM, pca_fit, pca_project)


def _corpus(spark, n=400, d=6, seed=3):
    """Anisotropic gaussian-ish corpus with a well-separated spectrum
    (eigenvector stability across float-sum orders needs gaps)."""
    rng = random.Random(seed)
    rows = []
    for _ in range(n):
        base = [rng.gauss(0.0, 10.0), rng.gauss(0.0, 5.0),
                rng.gauss(0.0, 2.0)]
        vec = [base[0] + base[1] * 0.5 + rng.gauss(1.0, 0.1),
               base[0] - base[1] * 0.5 + rng.gauss(-2.0, 0.1),
               base[1] + rng.gauss(0.5, 0.1),
               base[2] + rng.gauss(0.0, 0.1),
               base[2] * 0.3 + rng.gauss(3.0, 0.1),
               rng.gauss(0.0, 0.05)][:d]
        rows.append((vec,))
    return rows, spark.createDataFrame(rows, "embedding array<double>")


class TestPcaFit:
    def test_matches_numpy(self, spark):
        rows, df = _corpus(spark)
        state = pca_fit(df, k=3)
        x = np.array([r[0] for r in rows])
        assert state["n"] == len(rows) and state["dim"] == 6
        np.testing.assert_allclose(state["mean"], x.mean(axis=0),
                                   rtol=1e-9)
        cov = np.cov(x, rowvar=False, ddof=1)
        w, v = np.linalg.eigh(cov)
        order = np.argsort(w)[::-1][:3]
        np.testing.assert_allclose(
            state["explained_variance"], w[order], rtol=1e-7)
        assert state["total_variance"] == pytest.approx(
            float(np.trace(cov)), rel=1e-9)
        for comp, idx in zip(state["components"], order):
            expect = v[:, idx]
            pivot = int(np.argmax(np.abs(expect)))
            if expect[pivot] < 0:
                expect = -expect
            np.testing.assert_allclose(comp, expect, atol=1e-7)

    def test_components_orthonormal_and_ratio_sums(self, spark):
        _, df = _corpus(spark)
        state = pca_fit(df, k=6)
        c = np.array(state["components"])
        np.testing.assert_allclose(c @ c.T, np.eye(6), atol=1e-8)
        assert sum(state["explained_variance_ratio"]) == \
            pytest.approx(1.0, abs=1e-9)
        evs = state["explained_variance"]
        assert evs == sorted(evs, reverse=True)

    def test_null_vectors_excluded(self, spark):
        rows, _ = _corpus(spark, n=50)
        df = spark.createDataFrame(rows + [(None,)],
                                   "embedding array<double>")
        assert pca_fit(df, k=2)["n"] == 50

    def test_ragged_raises(self, spark):
        rows, _ = _corpus(spark, n=30)
        df = spark.createDataFrame(rows + [([1.0, 2.0],)],
                                   "embedding array<double>")
        with pytest.raises(ValueError, match="ragged"):
            pca_fit(df, k=2, dim=6)

    def test_bounds(self, spark):
        _, df = _corpus(spark, n=20)
        with pytest.raises(ValueError, match="k must be"):
            pca_fit(df, k=7)
        with pytest.raises(ValueError, match="dim must be"):
            pca_fit(df, k=2, dim=PCA_MAX_DIM + 1)
        empty = spark.createDataFrame([], "embedding array<double>")
        with pytest.raises(ValueError, match="no non-NULL"):
            pca_fit(empty, k=1)


class TestPcaProject:
    def test_matches_numpy_matmul(self, spark):
        rows, df = _corpus(spark)
        state = pca_fit(df, k=3)
        got = [r["embedding_pca"] for r in
               pca_project(df, state).collect()]
        x = np.array([r[0] for r in rows])
        expect = (x - np.array(state["mean"])) \
            @ np.array(state["components"]).T
        np.testing.assert_allclose(np.array(got), expect, atol=1e-8)
        # projected variance per component == explained variance
        np.testing.assert_allclose(
            np.var(expect, axis=0, ddof=1),
            state["explained_variance"], rtol=1e-7)

    def test_null_passthrough_and_validate_raises(self, spark):
        rows, _ = _corpus(spark, n=30)
        state = pca_fit(
            spark.createDataFrame(rows, "embedding array<double>"),
            k=2)
        df = spark.createDataFrame(rows + [(None,)],
                                   "embedding array<double>")
        out = pca_project(df, state).collect()
        assert sum(1 for r in out if r["embedding_pca"] is None) == 1
        bad = spark.createDataFrame([([1.0, 2.0],)],
                                    "embedding array<double>")
        with pytest.raises(Exception, match="vector length"):
            pca_project(bad, state).collect()

    def test_unvalidated_short_vector_goes_null_components(
            self, spark):
        rows, _ = _corpus(spark, n=30)
        state = pca_fit(
            spark.createDataFrame(rows, "embedding array<double>"),
            k=2)
        bad = spark.createDataFrame([([1.0, 2.0],)],
                                    "embedding array<double>")
        out = pca_project(bad, state, validate=False).collect()[0]
        assert out["embedding_pca"] == [None, None]

    def test_plan_has_no_shuffle_or_python(self, spark):
        rows, df = _corpus(spark, n=30)
        state = pca_fit(df, k=2)
        plan = (pca_project(df, state)
                ._jdf.queryExecution().executedPlan().toString())
        assert "Exchange" not in plan
        assert "Python" not in plan


class TestPrototypicalityPrune:
    def test_matches_python_reference(self, spark):
        import math
        import random

        from spark_df_profiling_spark.operators.clustering import (
            prototypicality_prune)
        rng = random.Random(17)
        cents = [[0.0, 0.0], [10.0, 10.0]]
        rows = [([c[0] + rng.gauss(0, 1), c[1] + rng.gauss(0, 1)],)
                for c in cents for _ in range(200)]
        df = spark.createDataFrame(rows, "embedding array<double>")
        out = prototypicality_prune(df, cents, drop_frac=0.25)
        got = [(r["cluster"], r["dist_sq"], r["pruned"])
               for r in out.collect()]

        def d2(v, c):
            return sum((a - b) ** 2 for a, b in zip(v, c))

        by_c = {}
        for (v,) in rows:
            cl = min(range(2), key=lambda j: (d2(v, cents[j]), j))
            by_c.setdefault(cl, []).append(d2(v, cents[cl]))
        thr = {}
        for cl, ds in by_c.items():
            k = math.ceil(0.25 * len(ds))
            thr[cl] = sorted(ds)[k - 1]
        for cl, dsq, pruned in got:
            assert pruned == (dsq <= thr[cl]), (cl, dsq)
        n_pruned = sum(1 for _, _, p in got if p)
        assert n_pruned >= 0.25 * len(rows)      # tie block inclusive
        assert n_pruned < 0.35 * len(rows)

    def test_tie_block_prunes_whole(self, spark):
        from spark_df_profiling_spark.operators.clustering import (
            prototypicality_prune)
        # 10 rows at the exact same distance + 10 farther
        rows = ([([1.0, 0.0],)] * 10 + [([5.0, 0.0],)] * 10)
        df = spark.createDataFrame(rows, "embedding array<double>")
        out = prototypicality_prune(df, [[0.0, 0.0]], drop_frac=0.2)
        got = [(r["dist_sq"], r["pruned"]) for r in out.collect()]
        # threshold lands in the 10-row tie block at d=1 -> all 10 go
        assert sum(1 for d, p in got if p) == 10
        assert all(p for d, p in got if d == 1.0)
        assert not any(p for d, p in got if d == 25.0)

    def test_null_passthrough_and_guards(self, spark):
        from spark_df_profiling_spark.operators.clustering import (
            prototypicality_prune)
        rows = [([0.1, 0.0],), ([5.0, 5.0],), (None,)]
        df = spark.createDataFrame(rows, "embedding array<double>")
        out = {tuple(r["embedding"]) if r["embedding"] else None:
               r for r in prototypicality_prune(
                   df, [[0.0, 0.0], [5.0, 5.0]],
                   drop_frac=0.5).collect()}
        assert out[None]["cluster"] is None
        assert out[None]["pruned"] is None
        with pytest.raises(ValueError, match="drop_frac"):
            prototypicality_prune(df, [[0.0, 0.0]], drop_frac=1.0)
        bad = spark.createDataFrame([([1.0],)],
                                    "embedding array<double>")
        with pytest.raises(Exception, match="centroid dimension"):
            prototypicality_prune(bad, [[0.0, 0.0]],
                                  drop_frac=0.5).collect()

"""Deterministic Lloyd k-means (operators/clustering.py)."""
import hashlib

import pytest

from spark_df_profiling_spark.operators.clustering import (
    kmeans_assign,
    kmeans_assign_expr,
    kmeans_fit,
    kmeans_profile,
)


def _md5_rank(i, seed=0):
    return int(hashlib.md5(f"{i}:{seed}".encode()).hexdigest()[:15], 16)


def _py_lloyd(pts, seeds, n_iter):
    cents = [list(c) for c in seeds]
    for _ in range(n_iter):
        assign = []
        for v in pts:
            d = [sum((x - c[i]) ** 2 for i, x in enumerate(v))
                 for c in cents]
            assign.append(d.index(min(d)))
        for j in range(len(cents)):
            members = [pts[i] for i, a in enumerate(assign) if a == j]
            if members:
                cents[j] = [sum(col) / len(members)
                            for col in zip(*members)]
    return cents


def test_kmeans_fit_matches_python_lloyd(spark):
    import random
    random.seed(11)
    pts = ([[random.gauss(0, 1), random.gauss(0, 1)] for _ in range(40)]
           + [[random.gauss(8, 1), random.gauss(8, 1)]
              for _ in range(40)]
           + [[random.gauss(-8, 8), random.gauss(8, 1)]
              for _ in range(40)])
    rows = [(i, v) for i, v in enumerate(pts)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    k, n_iter = 3, 3
    got = kmeans_fit(df, "embedding", "vec_id", k=k, n_iter=n_iter,
                     hash_mode="md5")
    # replicate seed selection: k smallest (md5_rank, id)
    order = sorted(range(len(pts)), key=lambda i: (_md5_rank(i), i))
    seeds = [pts[i] for i in order[:k]]
    exp = _py_lloyd(pts, seeds, n_iter)
    for gc, ec in zip(got, exp):
        assert gc == pytest.approx(ec, rel=1e-9)
    # deterministic across calls
    assert got == kmeans_fit(df, "embedding", "vec_id", k=k,
                             n_iter=n_iter, hash_mode="md5")
    # xxhash64 mode also runs and yields k centroids of right width
    alt = kmeans_fit(df, "embedding", "vec_id", k=k, n_iter=1)
    assert len(alt) == k and all(len(c) == 2 for c in alt)


def test_kmeans_empty_cluster_keeps_previous_centroid(spark):
    # ids 0..3; md5 seed order decides which vectors seed clusters.
    # Make the two first-ranked seed ids share an IDENTICAL vector:
    # every point ties between clusters 0 and 1 and resolves to the
    # lower index, so the duplicate-seed cluster goes EMPTY and must
    # keep its previous centroid (not crash, not NaN).
    order = sorted(range(4), key=lambda i: (_md5_rank(i), i))
    vecs = {}
    vecs[order[0]] = [0.0, 0.0]
    vecs[order[1]] = [0.0, 0.0]      # duplicate seed -> empty cluster
    vecs[order[2]] = [100.0, 100.0]
    vecs[order[3]] = [100.0, 102.0]
    df = spark.createDataFrame(
        [(i, vecs[i]) for i in range(4)],
        "vec_id long, embedding array<double>")
    got = kmeans_fit(df, "embedding", "vec_id", k=3, n_iter=2,
                     hash_mode="md5")
    assert got[1] == [0.0, 0.0]          # kept, never updated
    assert got[0] == [0.0, 0.0]          # owns both origin points
    assert got[2] == [100.0, 101.0]      # mean of the far pair


def test_kmeans_fit_validation(spark):
    df = spark.createDataFrame([(1, [1.0])],
                               "vec_id long, embedding array<double>")
    with pytest.raises(ValueError):
        kmeans_fit(df, k=0)
    with pytest.raises(ValueError):
        kmeans_fit(df, n_iter=0)
    with pytest.raises(ValueError):
        kmeans_fit(df, k=5)              # k exceeds fit rows
    with pytest.raises(ValueError):
        kmeans_fit(df, k=1, hash_mode="sha9")
    with pytest.raises(ValueError):
        kmeans_assign_expr("embedding", [])


def test_kmeans_assign_nulls_and_dist(spark):
    df = spark.createDataFrame(
        [(1, [0.0, 0.0]), (2, [10.0, 10.0]), (3, None)],
        "vec_id long, embedding array<double>")
    cents = [[1.0, 1.0], [9.0, 9.0]]
    got = {r["vec_id"]: r for r in
           kmeans_assign(df, cents, dist_col="d2").collect()}
    assert got[1]["cluster"] == 0 and got[1]["d2"] == pytest.approx(2.0)
    assert got[2]["cluster"] == 1 and got[2]["d2"] == pytest.approx(2.0)
    assert got[3]["cluster"] is None and got[3]["d2"] is None


def test_kmeans_assign_tie_breaks_low_index(spark):
    df = spark.createDataFrame([(1, [5.0])],
                               "vec_id long, embedding array<double>")
    got = kmeans_assign(df, [[4.0], [6.0]]).collect()[0]
    assert got["cluster"] == 0           # equidistant -> first centroid


def test_kmeans_assign_is_shuffle_free(spark):
    df = spark.createDataFrame([(1, [1.0, 2.0])],
                               "vec_id long, embedding array<double>")
    plan = kmeans_assign(df, [[0.0, 0.0], [1.0, 1.0]],
                         dist_col="d2")._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan


def test_kmeans_profile_totals(spark):
    df = spark.createDataFrame(
        [(1, [0.0]), (2, [2.0]), (3, [10.0]), (4, None)],
        "vec_id long, embedding array<double>")
    cents = [[1.0], [10.0]]
    got = {r["cluster"]: r for r in
           kmeans_profile(df, cents).collect()}
    assert got[0]["n"] == 2 and got[1]["n"] == 1
    assert got[0]["inertia"] == pytest.approx(2.0)
    assert got[0]["mean_dist"] == pytest.approx(1.0)
    assert got[0]["max_dist"] == pytest.approx(1.0)
    assert got[1]["inertia"] == pytest.approx(0.0)


def test_cluster_balanced_sample_exact_counts(spark):
    import hashlib
    rows = ([(i, [0.0 + i * 0.001]) for i in range(20)]        # cluster 0
            + [(100 + i, [10.0 + i * 0.001]) for i in range(3)])  # cluster 1
    df = spark.createDataFrame(rows,
                               "vec_id long, embedding array<double>")
    from spark_df_profiling_spark.operators.clustering import (
        cluster_balanced_sample)
    got = cluster_balanced_sample(df, [[0.0], [10.0]], per_cluster=5,
                                  seed=2).collect()
    by_c = {}
    for r in got:
        by_c.setdefault(r["cluster"], set()).add(r["vec_id"])
    assert len(by_c[0]) == 5              # exactly k
    assert by_c[1] == {100, 101, 102}     # short cluster: all rows
    # replicate the md5 rank choice for cluster 0
    def rank(i):
        b = int(hashlib.md5(f"{i}:2".encode()).hexdigest()[:15], 16) \
            % 1_000_000
        return (b, i)
    exp = set(sorted(range(20), key=rank)[:5])
    assert by_c[0] == exp
    with pytest.raises(ValueError):
        cluster_balanced_sample(df, [[0.0]], per_cluster=0)


def test_rrf_fuse_matches_hand_computation(spark):
    from spark_df_profiling_spark.operators.similarity import rrf_fuse
    a = spark.createDataFrame([(10, 1), (11, 2), (12, 3)],
                              "doc_id long, rank long")
    b = spark.createDataFrame([(12, 1), (10, 2), (13, 3)],
                              "doc_id long, rank long")
    got = {r["doc_id"]: r for r in rrf_fuse([a, b], k=60).collect()}
    def s(*ranks):
        return sum(1.0 / (60 + r) for r in ranks)
    assert got[10]["rrf_score"] == pytest.approx(s(1, 2), rel=1e-12)
    assert got[12]["rrf_score"] == pytest.approx(s(3, 1), rel=1e-12)
    assert got[11]["rrf_score"] == pytest.approx(s(2), rel=1e-12)
    assert got[10]["n_lists"] == 2 and got[11]["n_lists"] == 1
    assert got[10]["best_rank"] == 1 and got[13]["best_rank"] == 3
    # fused order: 10 (1/61+1/62) > 12 (1/61+1/63) > 11 > 13
    ranks = {r["doc_id"]: r["fused_rank"] for r in got.values()}
    assert ranks == {10: 1, 12: 2, 11: 3, 13: 4}
    top2 = rrf_fuse([a, b], k=60, top_k=2).collect()
    assert {r["doc_id"] for r in top2} == {10, 12}


def test_rrf_fuse_weights_and_query_partition(spark):
    from spark_df_profiling_spark.operators.similarity import rrf_fuse
    a = spark.createDataFrame([("q1", 1, 1), ("q2", 2, 1)],
                              "qid string, doc_id long, rank long")
    b = spark.createDataFrame([("q1", 2, 1), ("q2", 2, 2)],
                              "qid string, doc_id long, rank long")
    got = rrf_fuse([a, b], query_col="qid", weights=[2.0, 1.0],
                   k=10).collect()
    by = {(r["qid"], r["doc_id"]): r for r in got}
    assert by[("q1", 1)]["rrf_score"] == pytest.approx(2.0 / 11)
    assert by[("q1", 2)]["rrf_score"] == pytest.approx(1.0 / 11)
    assert by[("q1", 1)]["fused_rank"] == 1      # per-query ranks
    assert by[("q2", 2)]["fused_rank"] == 1
    assert by[("q2", 2)]["rrf_score"] == pytest.approx(
        2.0 / 11 + 1.0 / 12)
    with pytest.raises(ValueError):
        rrf_fuse([], k=60)
    with pytest.raises(ValueError):
        rrf_fuse([a], weights=[1.0, 2.0])
    with pytest.raises(ValueError):
        rrf_fuse([a], k=0)


def test_kmeans_state_merge_equals_full(spark):
    from spark_df_profiling_spark.operators.clustering import (
        centroids_from_state, kmeans_state, kmeans_state_merge)
    import random
    random.seed(5)
    pts = [(i, [random.gauss(0, 3), random.gauss(0, 3)])
           for i in range(60)]
    df = spark.createDataFrame(pts,
                               "vec_id long, embedding array<double>")
    cents = [[-3.0, 0.0], [3.0, 0.0]]
    full = kmeans_state(df, cents)
    import pyspark.sql.functions as F
    halves = [kmeans_state(df.where(F.col("vec_id") % 2 == i), cents)
              for i in (0, 1)]
    merged = kmeans_state_merge(*halves)
    f = {(r["cluster"], r["dim"]): r for r in full.collect()}
    m = {(r["cluster"], r["dim"]): r for r in merged.collect()}
    assert set(f) == set(m)
    for key in f:
        assert f[key]["n"] == m[key]["n"]
        assert f[key]["s"] == pytest.approx(m[key]["s"], rel=1e-12)
    got = centroids_from_state(merged, cents)
    exp = centroids_from_state(full, cents)
    for a, b in zip(got, exp):
        assert a == pytest.approx(b, rel=1e-12)


def test_centroids_from_state_keep_previous_for_absent(spark):
    from spark_df_profiling_spark.operators.clustering import (
        centroids_from_state, kmeans_state)
    df = spark.createDataFrame([(1, [0.0, 0.0]), (2, [0.4, 0.0])],
                               "vec_id long, embedding array<double>")
    cents = [[0.0, 0.0], [50.0, 50.0]]
    st = kmeans_state(df, cents)        # cluster 1 never assigned
    got = centroids_from_state(st, cents)
    assert got[0] == pytest.approx([0.2, 0.0])
    assert got[1] == [50.0, 50.0]       # kept, not NaN
    with pytest.raises(ValueError):
        kmeans_state(df, [])
    from spark_df_profiling_spark.operators.clustering import (
        kmeans_state_merge)
    with pytest.raises(ValueError):
        kmeans_state_merge()


def test_top_component_matches_numpy(spark):
    from spark_df_profiling_spark.operators.similarity import (
        top_component)
    import numpy as np
    rng = np.random.default_rng(7)
    # anisotropic cloud: dominant direction (3, 1)/sqrt(10)
    base = rng.normal(size=(400, 2)) * [5.0, 0.5]
    rot = np.array([[3, -1], [1, 3]]) / np.sqrt(10)
    pts = base @ rot.T + [2.0, -1.0]
    df = spark.createDataFrame(
        [(i, [float(a), float(b)]) for i, (a, b) in enumerate(pts)],
        "vec_id long, embedding array<double>")
    got = top_component(df, "embedding", n_iter=20)
    cov = np.cov(pts.T, ddof=1)
    evals, evecs = np.linalg.eigh(cov)
    assert got["lambda1"] == pytest.approx(evals[-1], rel=1e-6)
    assert got["trace"] == pytest.approx(np.trace(cov), rel=1e-9)
    assert got["anisotropy"] == pytest.approx(
        evals[-1] / np.trace(cov), rel=1e-6)
    # unit component aligned (up to sign) with numpy's top eigenvector
    v = np.array(got["component"])
    assert abs(abs(v @ evecs[:, -1]) - 1.0) < 1e-6
    assert np.linalg.norm(v) == pytest.approx(1.0, rel=1e-12)


def test_top_component_exact_python_parity_and_validation(spark):
    from spark_df_profiling_spark.operators.similarity import (
        top_component)
    pts = [[1.0, 2.0], [3.0, -1.0], [0.0, 0.5], [-2.0, 4.0]]
    df = spark.createDataFrame(
        [(i, p) for i, p in enumerate(pts)],
        "vec_id long, embedding array<double>")
    got = top_component(df, "embedding", n_iter=2)
    n, d = len(pts), 2
    mu = [sum(p[i] for p in pts) / n for i in range(d)]
    v = [1.0 / d ** 0.5] * d
    lam = None
    for _ in range(2):
        ss, w = 0.0, [0.0] * d
        for p in pts:
            s = sum((p[i] - mu[i]) * v[i] for i in range(d))
            ss += s * s
            for i in range(d):
                w[i] += s * (p[i] - mu[i])
        lam = ss / (n - 1)
        nm = sum(x * x for x in w) ** 0.5
        v = [x / nm for x in w]
    assert got["lambda1"] == pytest.approx(lam, rel=1e-12)
    assert got["component"] == pytest.approx(v, rel=1e-12)
    with pytest.raises(ValueError):
        top_component(df, "embedding", n_iter=0)
    one = spark.createDataFrame([(1, [1.0])],
                                "vec_id long, embedding array<double>")
    with pytest.raises(ValueError):
        top_component(one)


def test_kmeans_assign_works_on_streams(spark):
    # the docstring's streaming-safe claim: assignment is a pure row
    # expression, so it runs inside a structured-streaming query
    from spark_df_profiling_spark.operators.clustering import (
        kmeans_assign)
    import pyspark.sql.functions as F
    src = (spark.readStream.format("rate")
           .option("rowsPerSecond", "100").load()
           .withColumn("embedding",
                       F.array((F.col("value") % 10).cast("double"),
                               F.lit(0.0))))
    out = kmeans_assign(src, [[0.0, 0.0], [9.0, 0.0]], dist_col="d2")
    q = (out.writeStream.format("memory")
         .queryName("km_stream_out").outputMode("append")
         .trigger(availableNow=True).start())
    q.awaitTermination(60)
    rows = spark.table("km_stream_out").collect()
    # rate + availableNow may deliver 0 rows on a fast stop; the
    # contract under test is that the query RUNS (no analysis error
    # for a windowed/aggregated plan) and any rows are well-assigned
    for r in rows:
        exp = 0 if (r["value"] % 10) < 5 else 1
        assert r["cluster"] == exp


def test_kmeans_fit_max_fit_rows_deterministic_sample(spark):
    import random
    random.seed(19)
    pts = [(i, [random.gauss(0, 1), random.gauss(0, 1)])
           for i in range(300)]
    df = spark.createDataFrame(pts,
                               "vec_id long, embedding array<double>")
    a = kmeans_fit(df, "embedding", "vec_id", k=3, n_iter=2,
                   hash_mode="md5", max_fit_rows=100)
    b = kmeans_fit(df, "embedding", "vec_id", k=3, n_iter=2,
                   hash_mode="md5", max_fit_rows=100)
    assert a == b                        # deterministic subset
    full = kmeans_fit(df, "embedding", "vec_id", k=3, n_iter=2,
                      hash_mode="md5")
    assert a != full                     # genuinely sampled
    # sample not smaller than the corpus: identical to full fit
    c = kmeans_fit(df, "embedding", "vec_id", k=3, n_iter=2,
                   hash_mode="md5", max_fit_rows=10_000)
    assert c == full
    with pytest.raises(ValueError):
        kmeans_fit(df, k=5, max_fit_rows=3)

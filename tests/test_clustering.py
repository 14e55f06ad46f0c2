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

"""Similarity search: brute-force cosine top-k + LSH ANN recall."""

import pytest
from pyspark.sql import functions as F

from spark_df_profiling_spark.operators import similarity as SIM


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


@pytest.fixture(scope="module")
def planted(spark, emb):
    """FIXTURES.md B.5-style: base vectors + perturbed + scaled copies."""
    base = emb.where(F.col("vec_id") < 50)
    pert = base.select(
        (F.col("vec_id") + 1000).alias("vec_id"),
        F.transform(F.col("embedding"),
                    lambda x, i: F.when(i == 0, x + F.lit(0.001))
                    .otherwise(x)).alias("embedding"),
        "label")
    scaled = base.select(
        (F.col("vec_id") + 2000).alias("vec_id"),
        F.transform(F.col("embedding"), lambda x: x * 2).alias("embedding"),
        "label")
    return base.unionByName(pert).unionByName(scaled)


def test_knn_top1_is_planted_copy(planted):
    out = SIM.knn_bruteforce(planted, planted.where(F.col("vec_id") < 50),
                             k=2)
    top1 = {r["query_id"]: (r["neighbor_id"], r["sim"])
            for r in out.collect() if r["rank"] == 1}
    hits = 0
    for qid, (nid, sim) in top1.items():
        # nearest must be the perturbed or the scaled copy, cosine ~ 1.0
        if nid in (qid + 1000, qid + 2000):
            hits += 1
            assert sim > 0.999
    assert hits == 50


def test_cosine_scale_invariant(planted):
    # cosine(base, 2*base) == 1.0 — pins the metric choice vs Euclidean
    out = SIM.knn_bruteforce(
        planted.where((F.col("vec_id") == 0) | (F.col("vec_id") == 2000)),
        planted.where(F.col("vec_id") == 0), k=1)
    r = out.collect()[0]
    assert r["neighbor_id"] == 2000
    assert r["sim"] == pytest.approx(1.0, abs=1e-9)


def test_ann_lsh_recall_vs_bruteforce(emb):
    queries = emb.where(F.col("vec_id") < 10)
    exact = SIM.knn_bruteforce(emb, queries, k=5)
    approx = SIM.ann_lsh(emb, queries, k=5, bucket_length=4.0,
                         num_tables=6)
    ex = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    ap = {(r["query_id"], r["neighbor_id"]) for r in approx.collect()}
    recall = len(ex & ap) / len(ex)
    assert recall >= 0.5  # LSH with these params finds most true neighbors


def test_embedding_near_dup_finds_planted(planted):
    pairs = SIM.embedding_near_dup(planted, min_cosine=0.999)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    # perturbed copies (cosine ~ 0.9999997) and scaled copies (cosine 1.0)
    found_pert = sum(1 for i in range(50) if (i, i + 1000) in got)
    found_scaled = sum(1 for i in range(50) if (i, i + 2000) in got)
    assert found_pert >= 45
    assert found_scaled >= 45


def test_embedding_near_dup_exact_finds_all_planted(planted):
    pairs = SIM.embedding_near_dup_exact(planted, min_cosine=0.999)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    # exact brute force misses NOTHING: every planted pair must appear
    assert all((i, i + 1000) in got for i in range(50))
    assert all((i, i + 2000) in got for i in range(50))
    # and exact recall upper-bounds the LSH path
    lsh = {(r["id_a"], r["id_b"])
           for r in SIM.embedding_near_dup(planted, min_cosine=0.999)
           .collect()}
    assert lsh <= got


def test_ann_lsh_min_cosine_validated(planted):
    with pytest.raises(ValueError, match="min_cosine"):
        SIM.ann_lsh(planted, planted.limit(1), min_cosine=1.5)


def test_ann_lsh_min_cosine_bounds_candidates(planted):
    # a cosine floor translates to a Euclidean ceiling on unit vectors;
    # results within the floor must be unaffected, results below it gone
    q = planted.where(F.col("vec_id") < 3)
    lo = SIM.ann_lsh(planted, q, k=5, min_cosine=-1.0)
    hi = SIM.ann_lsh(planted, q, k=5, min_cosine=0.999)
    hi_rows = hi.collect()
    assert all(r["sim"] >= 0.999 - 1e-9 for r in hi_rows)
    lo_pairs = {(r["query_id"], r["neighbor_id"]): r["sim"]
                for r in lo.collect()}
    # every surviving high-floor pair exists in the unrestricted run
    for r in hi_rows:
        assert (r["query_id"], r["neighbor_id"]) in lo_pairs


def test_ivf_fit_input_sampled_when_over_cap(emb):
    # corpus larger than the cap -> fit input is a Sample of the corpus
    capped = SIM.ivf_fit_input(emb, max_fit_rows=100)
    plan = capped._jdf.queryExecution().optimizedPlan().toString()
    assert "Sample" in plan
    n = capped.count()
    assert n <= 150  # ~100 expected; Bernoulli variance bounded

    # corpus under the cap (or cap disabled) -> untouched, no Sample
    full = SIM.ivf_fit_input(emb, max_fit_rows=10_000_000)
    assert "Sample" not in \
        full._jdf.queryExecution().optimizedPlan().toString()
    off = SIM.ivf_fit_input(emb, max_fit_rows=0)
    assert "Sample" not in \
        off._jdf.queryExecution().optimizedPlan().toString()


def test_ann_ivf_sampled_fit_recall(emb):
    # recall gate holds even when KMeans fits on a sampled fraction of
    # the corpus (the 100 TB configuration)
    queries = emb.where(F.col("vec_id") < 5)
    exact = {(r["query_id"], r["neighbor_id"])
             for r in SIM.knn_bruteforce(emb, queries, k=5).collect()}
    approx = {(r["query_id"], r["neighbor_id"])
              for r in SIM.ann_ivf(emb, queries, k=5, n_clusters=8,
                                   n_probe=4,
                                   max_fit_rows=500).collect()}
    assert len(exact & approx) / len(exact) >= 0.4


def test_knn_norms_hoisted_before_join(emb):
    # the cosine divisor must reference the precomputed per-row norms,
    # not re-expand l2_norm per pair: the optimized plan's join output
    # carries __qn/__cn projections
    out = SIM.knn_bruteforce(emb.limit(50), emb.where(F.col("vec_id") < 2),
                             k=3)
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "__qn" in plan and "__cn" in plan


def test_semantic_dedup_collapses_planted_copies(planted):
    out = SIM.semantic_dedup(planted, n_clusters=8, min_cosine=0.999)
    rows = {r["vec_id"]: r for r in out.collect()}
    assert len(rows) == 150  # every input row gets a verdict
    kept = {i for i, r in rows.items() if r["keep"]}
    # each base (0..49) + its perturbed (+1000) and scaled (+2000)
    # copies collapse to ONE survivor — the smallest id, i.e. the base
    assert all(i in kept for i in range(50))
    dropped_copies = sum(1 for i in range(50)
                         if i + 1000 not in kept and i + 2000 not in kept)
    # normalization puts scaled copies in the base's cluster; allow a
    # couple of boundary-straddling perturbed copies (documented
    # SemDeDup trade-off), none expected with these params
    assert dropped_copies >= 48
    # survivors within a near-dup group are unique
    assert len(kept) <= 150 - 2 * dropped_copies + 4


def test_semantic_dedup_distinct_corpus_survives(emb):
    # a corpus with no near-dups at tau=0.999 keeps everything
    base = emb.where(F.col("vec_id") < 100)
    out = SIM.semantic_dedup(base, n_clusters=4, min_cosine=0.9999)
    assert out.where(~F.col("keep")).count() == 0
    assert out.count() == 100


def test_zero_norm_vectors_never_rank_or_pair(spark, emb):
    # all-zero embedding => 0/0 cosine; NaN compares GREATER than any
    # number in Spark SQL, so without the safe_cosine guard zero-norm
    # rows would top every ranking and pass every >= tau filter
    dim = len(emb.select("embedding").first()[0])
    zero = spark.createDataFrame(
        [(90001, [0.0] * dim, "z"), (90002, [0.0] * dim, "z")],
        "vec_id long, embedding array<double>, label string")
    corpus = emb.where(F.col("vec_id") < 30).select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double"))
        .alias("embedding"), "label").unionByName(zero)

    knn = SIM.knn_bruteforce(
        corpus, corpus.where(F.col("vec_id").isin(0, 90001)), k=5)
    rows = knn.collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    # a real query never sees a zero-norm neighbor
    assert all(r["neighbor_id"] < 90000 for r in by_q.get(0, []))
    assert all(r["sim"] == r["sim"] for r in rows)  # no NaN anywhere
    # a zero-norm query has no defined similarity: zero results
    assert 90001 not in by_q

    pairs = SIM.embedding_near_dup_exact(corpus, min_cosine=0.5)
    assert pairs.where((F.col("id_a") >= 90000)
                       | (F.col("id_b") >= 90000)).count() == 0

    sd = SIM.semantic_dedup(corpus, n_clusters=2, min_cosine=0.9)
    zrows = {r["vec_id"]: r["keep"] for r in
             sd.where(F.col("vec_id") >= 90000).collect()}
    # both zero vectors survive: they are not near-dups of anything
    # (cosine undefined), and they must not be dropped as NaN-dups
    assert zrows == {90001: True, 90002: True}


def test_semantic_dedup_auto_k_and_cluster_cap(spark, emb, planted):
    # n_clusters=None derives k = ceil(n / rows_per_cluster)
    base = emb.where(F.col("vec_id") < 200)
    out = SIM.semantic_dedup(base, rows_per_cluster=50, min_cosine=0.9999)
    clusters = out.select("cluster").distinct().count()
    assert clusters >= 3  # 200/50 targets 4; KMeans may merge a bit
    assert out.count() == 200

    # degenerate giant cluster: cap excludes it from pairing LOUDLY,
    # its rows stay keep=True instead of stalling in a quadratic join
    import warnings as _w
    with _w.catch_warnings(record=True) as got:
        _w.simplefilter("always")
        capped = SIM.semantic_dedup(planted, n_clusters=1,
                                    min_cosine=0.999,
                                    max_cluster_rows=100)
        assert capped.where(~F.col("keep")).count() == 0
        assert capped.count() == 150
    assert any("EXCLUDED" in str(w.message) for w in got)
    # same data, cap high enough: pruning happens as usual
    uncapped = SIM.semantic_dedup(planted, n_clusters=1,
                                  min_cosine=0.999,
                                  max_cluster_rows=10_000)
    assert uncapped.where(~F.col("keep")).count() >= 96


def test_knn_two_phase_equals_single_phase(emb):
    q = emb.where(F.col("vec_id") < 5)
    two = {(r["query_id"], r["rank"]): r["neighbor_id"]
           for r in SIM.knn_bruteforce(emb, q, k=7,
                                       sub_partitions=32).collect()}
    one = {(r["query_id"], r["rank"]): r["neighbor_id"]
           for r in SIM.knn_bruteforce(emb, q, k=7,
                                       sub_partitions=1).collect()}
    assert two == one and len(two) == 35

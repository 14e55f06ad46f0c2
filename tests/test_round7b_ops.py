"""Round-7 session-3 operators: BM25 retrieval, Zipf fit, encoding
quality, soft dedup weights, cross-corpus MinHash contamination.

Each operator gets (a) a Python-reference equivalence test on real
driver data or a crafted fixture, (b) an edge-case test, and (c) a plan
assertion where the scale claim is a plan property.
"""

import math

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return (spark.read.parquet(f"{sf_dir}/documents.parquet")
            .select("doc_id", "text"))


# ---------------------------------------------------------------------------
# BM25
# ---------------------------------------------------------------------------
def _py_bm25(rows, terms, k1=1.2, b=0.75):
    """Row-by-row reference implementation (dict of doc_id -> score)."""
    toks = {i: t.split(" ") for i, t in rows}
    n = len(toks)
    avgdl = sum(len(v) for v in toks.values()) / n
    dfreq = {t: sum(1 for v in toks.values() if t in v) for t in terms}
    out = {}
    for i, v in toks.items():
        s, matched = 0.0, 0
        for t in terms:
            tf = v.count(t)
            if tf == 0:
                continue
            matched += 1
            idf = math.log(1 + (n - dfreq[t] + 0.5) / (dfreq[t] + 0.5))
            s += idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * len(v) / avgdl))
        if matched:
            out[i] = (s, matched)
    return out


def test_bm25_matches_python_reference(spark, docs):
    from spark_df_profiling_spark.operators.text import bm25_topk
    sub = docs.where(F.col("doc_id") < 120)
    terms = ["the", "data", "model", "zzz_absent_term"]
    got = {r["doc_id"]: (r["score"], r["n_terms_matched"], r["rank"])
           for r in bm25_topk(sub, "text", "doc_id", terms, k=10).collect()}
    rows = [(r["doc_id"], r["text"]) for r in sub.collect()]
    ref = _py_bm25(rows, terms)
    expect = sorted(ref.items(), key=lambda kv: (-kv[1][0], kv[0]))[:10]
    assert len(got) == min(10, len(expect))
    for rank, (i, (s, m)) in enumerate(expect, start=1):
        assert i in got, f"doc {i} missing from top-k"
        gs, gm, gr = got[i]
        assert gs == pytest.approx(s, rel=1e-12)
        assert gm == m
        assert gr == rank


def test_bm25_rejects_empty_terms(spark, docs):
    from spark_df_profiling_spark.operators.text import bm25_topk
    with pytest.raises(ValueError):
        bm25_topk(docs, "text", "doc_id", [], k=5)
    with pytest.raises(ValueError):
        bm25_topk(docs, "text", "doc_id", ["the"], k=0)


def test_bm25_df_and_stats_joins_are_broadcast(spark, docs):
    from spark_df_profiling_spark.operators.text import bm25_topk
    plan = bm25_topk(docs, "text", "doc_id", ["the", "data"],
                     k=5)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
    # the 1-row stats join may appear as BroadcastNestedLoopJoin (keyless
    # with a broadcast side) — that is fine; an un-broadcast cartesian is not
    assert "CartesianProduct" not in plan


# ---------------------------------------------------------------------------
# Zipf fit
# ---------------------------------------------------------------------------
def test_zipf_fit_matches_python_ols(spark, docs):
    from spark_df_profiling_spark.operators.text import zipf_fit
    got = zipf_fit(docs, "text", max_vocab=500).collect()[0]
    # Python reference: full count, top-500, OLS on (ln rank, ln cnt)
    from collections import Counter
    cnt = Counter()
    for r in docs.collect():
        for t in r["text"].split(" "):
            if t:
                cnt[t] += 1
    top = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:500]
    xs = [math.log(i + 1) for i in range(len(top))]
    ys = [math.log(c) for _, c in top]
    n = len(xs)
    mx, my = sum(xs) / n, sum(ys) / n
    slope = (sum((x - mx) * (y - my) for x, y in zip(xs, ys))
             / sum((x - mx) ** 2 for x in xs))
    intercept = my - slope * mx
    assert got["n_vocab"] == n
    assert got["zipf_slope"] == pytest.approx(slope, rel=1e-9)
    assert got["zipf_intercept"] == pytest.approx(intercept, rel=1e-9)
    assert got["top_freq"] == top[0][1]


def test_zipf_fit_exact_power_law(spark):
    from spark_df_profiling_spark.operators.text import zipf_fit
    # construct a corpus whose token counts are exactly c_r = 1000/r
    # rounded — slope should land near -1
    words = []
    for r in range(1, 21):
        words += [f"w{r:02d}"] * round(1000 / r)
    df = spark.createDataFrame([(1, " ".join(words))], "id long, text string")
    got = zipf_fit(df, "text", max_vocab=100).collect()[0]
    assert got["zipf_slope"] == pytest.approx(-1.0, abs=0.05)
    assert got["top_freq"] == 1000


def test_zipf_fit_rejects_bad_vocab(spark, docs):
    from spark_df_profiling_spark.operators.text import zipf_fit
    with pytest.raises(ValueError):
        zipf_fit(docs, "text", max_vocab=1)


# ---------------------------------------------------------------------------
# Encoding / mojibake quality
# ---------------------------------------------------------------------------
def test_encoding_stats_crafted_payloads(spark):
    from spark_df_profiling_spark.operators.text import encoding_stats
    rows = [
        (1, "perfectly clean ascii"),
        (2, "lossy � decode � here"),        # 2 repl chars
        (3, "binary \x00\x01 junk \x1f"),               # 3 ctrl chars
        (4, "double encoded: Ã© Ã¨ Â»"),                # 3 mojibake bigrams
        (5, "honest unicode: héllo wörld 中文"),         # non-ascii but clean
        (6, ""),                                        # empty text
        (7, None),                                      # null text
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in
           encoding_stats(df, "text", "doc_id").collect()}
    assert got[1]["enc_clean"] and got[1]["repl_ratio"] == 0.0
    assert got[2]["repl_ratio"] == pytest.approx(2 / len(rows[1][1]))
    assert not got[2]["enc_clean"]
    assert got[3]["ctrl_ratio"] == pytest.approx(3 / len(rows[2][1]))
    assert not got[3]["enc_clean"]
    assert got[4]["mojibake"] == 3 and not got[4]["enc_clean"]
    assert got[5]["enc_clean"] and got[5]["mojibake"] == 0
    assert got[5]["non_ascii_ratio"] > 0
    # empty and null texts: ratios NULL (0/0), enc_clean not asserted true
    assert got[6]["repl_ratio"] is None
    assert got[7]["repl_ratio"] is None


def test_encoding_stats_plan_is_narrow(spark, docs):
    from spark_df_profiling_spark.operators.text import encoding_stats
    plan = encoding_stats(docs, "text", "doc_id") \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, "encoding_stats must not shuffle"


def test_mojibake_absent_in_clean_unicode(spark):
    from spark_df_profiling_spark.operators.text import mojibake_hits
    df = spark.createDataFrame(
        [("déjà vu naïve œuvre",), ("日本語のテキスト",)], "text string")
    vals = [r[0] for r in df.select(mojibake_hits("text")).collect()]
    assert vals == [0, 0]


# ---------------------------------------------------------------------------
# Soft dedup weights
# ---------------------------------------------------------------------------
def test_soft_dedup_weights_mass(spark, docs):
    from spark_df_profiling_spark.operators.dedup import soft_dedup_weights
    # plant duplicates: every doc < 20 appears 3x, others once
    tripled = docs.where(F.col("doc_id") < 20)
    df = (docs.unionByName(tripled.withColumn("doc_id", F.col("doc_id") + 10_000))
          .unionByName(tripled.withColumn("doc_id", F.col("doc_id") + 20_000)))
    out = soft_dedup_weights(df, ["text"], alpha=1.0)
    assert out.count() == df.count(), "soft dedup keeps every row"
    # alpha=1: total weight == number of distinct contents
    total = out.agg(F.sum("weight")).collect()[0][0]
    n_distinct = df.select("text").distinct().count()
    assert total == pytest.approx(n_distinct)
    by = {r["dup_count"]: r["weight"] for r in
          out.select("dup_count", "weight").distinct().collect()}
    assert by[3] == pytest.approx(1 / 3)
    assert by[1] == 1.0


def test_soft_dedup_alpha_zero_and_half(spark, docs):
    from spark_df_profiling_spark.operators.dedup import soft_dedup_weights
    df = docs.limit(30).unionByName(
        docs.limit(10).withColumn("doc_id", F.col("doc_id") + 999))
    w0 = soft_dedup_weights(df, ["text"], alpha=0.0)
    assert w0.agg(F.min("weight"), F.max("weight")).collect()[0] == (1.0, 1.0)
    wh = soft_dedup_weights(df, ["text"], alpha=0.5)
    got = {r["dup_count"]: r["weight"] for r in
           wh.select("dup_count", "weight").distinct().collect()}
    assert got[2] == pytest.approx(2 ** -0.5)


def test_soft_dedup_single_shuffle(spark, docs):
    from spark_df_profiling_spark.operators.dedup import soft_dedup_weights
    plan = soft_dedup_weights(docs, ["text"]) \
        ._jdf.queryExecution().executedPlan().toString()
    # count side and probe side share one hash partitioning on __h:
    # at most 2 Exchange nodes (one per side), never a broadcast of the
    # row-scale side and never a sort-merge re-partition of a third key
    assert plan.count("Exchange") <= 4  # 2 logical, AQE may reuse


# ---------------------------------------------------------------------------
# Cross-corpus MinHash contamination
# ---------------------------------------------------------------------------
def _mutated_bench(docs, n=20):
    toks = F.split(F.col("text"), " ")
    return (docs.where(F.col("doc_id") < n)
            .select(F.col("doc_id").alias("bench_id"),
                    F.concat(F.concat_ws(" ", F.slice(toks, 1,
                                                      F.size(toks) - 1)),
                             F.lit(" xyzzy")).alias("text")))


def test_cross_contamination_finds_planted_neardups(spark, docs):
    from spark_df_profiling_spark.operators.dedup import (
        cross_contamination_minhash, shingle_expr)
    corpus = docs.where(F.col("doc_id") < 150)
    bench = _mutated_bench(docs, 20)
    out = cross_contamination_minhash(
        corpus, bench, bench_id_col="bench_id",
        jaccard_max_distance=0.5).collect()
    found = {(r["corpus_id"], r["bench_id"]) for r in out}
    # every planted (i, i) pair must be found (1-token mutation keeps
    # jaccard distance far below 0.5 for the driver's doc lengths)
    for i in range(20):
        assert (i, i) in found, f"planted pair {i} missed"
    # and every reported distance must match the exact jaccard
    sh_c = {r["doc_id"]: set(r["sh"]) for r in corpus.select(
        "doc_id", shingle_expr("text").alias("sh")).collect()}
    sh_b = {r["bench_id"]: set(r["sh"]) for r in bench.select(
        "bench_id", shingle_expr("text").alias("sh")).collect()}
    for r in out:
        a, b = sh_c[r["corpus_id"]], sh_b[r["bench_id"]]
        jd = 1.0 - len(a & b) / len(a | b)
        assert r["jaccard_distance"] == pytest.approx(jd, abs=1e-12)
        assert jd <= 0.5


def test_cross_contamination_no_false_cross_pairs(spark, docs):
    """Unrelated corpora produce no sub-threshold pairs (threshold is
    exact-verified, so LSH collisions can't leak through)."""
    from spark_df_profiling_spark.operators.dedup import (
        cross_contamination_minhash)
    corpus = docs.where((F.col("doc_id") >= 200) & (F.col("doc_id") < 260))
    bench = _mutated_bench(docs, 10)
    out = cross_contamination_minhash(
        corpus, bench, bench_id_col="bench_id",
        jaccard_max_distance=0.2)
    # driver docs are generated near-independent; require verification
    # to have cut everything the bands happened to collide on
    for r in out.collect():
        assert r["jaccard_distance"] <= 0.2


def test_cross_contamination_broadcasts_bench(spark, docs):
    from spark_df_profiling_spark.operators.dedup import (
        cross_contamination_minhash)
    corpus = docs.where(F.col("doc_id") < 100)
    bench = _mutated_bench(docs, 10)
    plan = cross_contamination_minhash(
        corpus, bench, bench_id_col="bench_id") \
        ._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan

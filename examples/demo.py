"""Runnable tour of the engine (script twin of profile_demo.ipynb).

Usage:  python examples/demo.py [sf_dir]

Covers the reference workflow (profile a DataFrame → HTML report) plus
the pipeline extensions: dedup, deterministic splits, and an event-time
windowed profile.  Uses the driver-generated test tables.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"


def main() -> None:
    from spark_df_profiling_spark.session import build_session
    spark = build_session("spark-df-profiling-demo", master="local[4]")
    spark.sparkContext.setLogLevel("ERROR")

    # 1. The reference's workflow: ProfileReport(df) -> HTML
    from spark_df_profiling_spark import ProfileReport
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    report = ProfileReport(li)
    out = "/tmp/lineitem_profile.html"
    report.to_file(out)
    print(f"wrote {out} ({os.path.getsize(out)} bytes)")
    print("correlation-rejected columns:",
          report.get_rejected_variables(threshold=0.9))

    # 2. The engine surface: profile() returns a DataFrame (one row per
    #    column) you can filter/join/persist like any other
    from spark_df_profiling_spark import profile
    prof = profile(li)
    prof.select("column", "type_class", "n_missing", "distinct_count") \
        .show(5, truncate=False)

    # 3. Exact + near dedup of a text corpus
    from spark_df_profiling_spark.operators.dedup import (
        dedup_stats, exact_dedup)
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    dedup_stats(docs, "text").show()
    kept = exact_dedup(docs, "text")
    print("exact dedup kept", kept.count(), "of", docs.count())

    # 4. Deterministic train/val/test split (hash-based: same rows on
    #    every run, every engine, every retry)
    from spark_df_profiling_spark.operators.sampling import hash_split
    split = hash_split(docs, "doc_id",
                       {"train": 0.8, "val": 0.1, "test": 0.1}, seed=42)
    split.groupBy("split").count().orderBy("split").show()

    # 5. Event-time windowed profile (dtype-adaptive events loader)
    from spark_df_profiling_spark.sources import load_events
    from spark_df_profiling_spark.streaming import windowed_profile
    ev = load_events(spark, SF_DIR)
    windowed_profile(ev, "ts_ts", "value", "1 day",
                     group_col="event_type") \
        .orderBy("window_start", "event_type").show(6)

    # 6. Incremental profiles: profile partitions once, merge states —
    #    the no-rescan pattern for an append-only corpus
    from pyspark.sql import functions as F
    from spark_df_profiling_spark.operators.incremental import (
        finalize, merge_partials, partial_profile)
    parts = [partial_profile(li.where(F.col("l_orderkey") % 2 == i))
             for i in (0, 1)]
    finalize(merge_partials(*parts)) \
        .select("column", "n", "mean", "std", "distinct_estimate") \
        .show(5, truncate=False)

    # 7. Round-6 pipeline ops: line dedup, decontamination, quality
    #    funnel, sequence packing
    from spark_df_profiling_spark.operators.dedup import (
        decontaminate, line_dedup)
    from spark_df_profiling_spark.operators.packing import shard_summary
    from spark_df_profiling_spark.operators.text import quality_funnel

    wrapped = docs.limit(500).select(
        "doc_id", F.concat(F.lit("SITE NAV\n"), F.col("text"),
                           F.lit("\n(c) footer")).alias("text"))
    line_dedup(wrapped, min_count=50) \
        .select("doc_id", "n_lines", "n_lines_removed").show(3)

    bench = docs.where(F.col("doc_id") < 5).select("text")
    decontaminate(docs.limit(500), bench, n=8) \
        .groupBy("contaminated").count().show()

    toks = F.split(F.col("text"), " ")
    quality_funnel(docs, [
        ("len_ge_250", F.length("text") >= 250),
        ("tokens_ge_50", F.size(toks) >= 50)]).show()

    shard_summary(docs.withColumn("__nt", F.size(toks)),
                  "__nt", "doc_id", context_len=4096).show(4)

    # 8. Round-7 pipeline ops: cross-run history dedup, temperature
    #    mixing, histogram-derived quantiles, windowed drift monitor
    from spark_df_profiling_spark.operators.dedup import (
        dedup_against_history, history_hashes)
    history = history_hashes(docs.where(F.col("doc_id") < 300), ["text"])
    batch = docs.where((F.col("doc_id") >= 300) & (F.col("doc_id") < 400))
    survivors = dedup_against_history(batch, history, cols=["text"],
                                      order_col="doc_id")
    print("history dedup: batch", batch.count(),
          "-> new-content survivors", survivors.count())

    from spark_df_profiling_spark.operators.sampling import (
        temperature_resample, temperature_weights)
    temperature_weights(docs, "source", tau=0.5) \
        .select("source", "n_rows", "weight", "epochs").show(4)
    temperature_resample(docs, "source", "doc_id", tau=0.5) \
        .groupBy("source").count().orderBy("source").show(4)

    from spark_df_profiling_spark.operators.incremental import (
        quantiles_from_state)
    lo, hi = li.agg(F.min("l_extendedprice"),
                    F.max("l_extendedprice")).collect()[0]
    qparts = [partial_profile(li.where(F.col("l_orderkey") % 2 == i),
                              cols=["l_extendedprice"],
                              hist_edges={"l_extendedprice": (lo, hi)},
                              hist_bins=64) for i in (0, 1)]
    quantiles_from_state(merge_partials(*qparts)).show()

    from spark_df_profiling_spark.operators.drift import (
        reference_histogram, windowed_psi)
    ref = reference_histogram(ev, "value", bins=8)
    windowed_psi(ev, "ts_ts", "value", ref, "1 day") \
        .orderBy("window_start").show(4)

    # 9. Round-7 session-2 ops: chunking, TF-IDF, DSIR weights, Bloom
    #    dedup state, stream-stream interval join
    from spark_df_profiling_spark.operators.text import (
        chunk_documents, tfidf_topk)
    chunks = chunk_documents(docs, "text", "doc_id",
                             chunk_tokens=64, overlap=16)
    print("chunker:", docs.count(), "docs ->", chunks.count(), "chunks")
    tfidf_topk(docs, "text", "doc_id", k=2) \
        .orderBy("doc_id", "rank").show(4)

    from spark_df_profiling_spark.operators.sampling import (
        dsir_logweights)
    dsir_logweights(docs, docs.where(F.col("lang") == "en"),
                    "text", "doc_id", n_buckets=1000) \
        .orderBy(F.desc("log_w")).show(3)

    from spark_df_profiling_spark.operators.dedup import (
        bloom_might_contain, bloom_state)
    state = bloom_state(docs.where(F.col("doc_id") < 300), ["text"],
                        m_bits=1 << 16, k=5)
    bloom_might_contain(docs.where(F.col("doc_id") >= 200), state,
                        ["text"], m_bits=1 << 16, k=5) \
        .groupBy("might_contain").count().show()

    from spark_df_profiling_spark.streaming import (
        stream_stream_interval_join)
    views = ev.where(F.col("event_type") == "view") \
        .select("event_id", "user_id", "ts_ts")
    buys = ev.where(F.col("event_type") == "purchase") \
        .select("event_id", "user_id", "ts_ts", "value")
    pairs = stream_stream_interval_join(views, buys, "user_id",
                                        max_delay="1 day")
    print("view->purchase pairs within 1 day:", pairs.count())

    # 10. Round-7 session-3 ops: BM25 retrieval, Zipf fit, encoding
    #     quality, soft dedup weights, cross-corpus contamination
    from spark_df_profiling_spark.operators.text import (
        bm25_topk, encoding_stats, zipf_fit)
    bm25_topk(docs, "text", "doc_id", ["the", "data", "model"],
              k=3).show()
    zipf_fit(docs, "text", max_vocab=1000).show()
    encoding_stats(docs, "text", "doc_id") \
        .groupBy("enc_clean").count().show()

    from spark_df_profiling_spark.operators.dedup import (
        cross_contamination_minhash, soft_dedup_weights)
    dup_corpus = docs.select("doc_id", "text").unionByName(
        docs.where(F.col("doc_id") < 10)
        .select((F.col("doc_id") + 9000).alias("doc_id"), "text"))
    soft_dedup_weights(dup_corpus, ["text"]) \
        .groupBy("dup_count", "weight").count().show()
    bench = docs.where(F.col("doc_id") < 5) \
        .select((F.col("doc_id") + 8000).alias("doc_id"), "text")
    print("contaminated pairs:",
          cross_contamination_minhash(
              docs.select("doc_id", "text"), bench,
              jaccard_max_distance=0.2).count())

    # 11. Distribution diagnostics + join planning + redaction
    from spark_df_profiling_spark.operators.outliers import (
        benford_stats, outlier_stats)
    outlier_stats(li, ["l_extendedprice", "l_quantity"]).show()
    benford_stats(li, ["l_extendedprice"]) \
        .select("digit", "cnt", "mad").orderBy("digit").show(3)

    from spark_df_profiling_spark.operators.joins import join_key_stats
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    join_key_stats(li, orders, "l_orderkey", "o_orderkey") \
        .select("est_join_rows", "max_left_fanout",
                "right_orphan_rows").show()

    from spark_df_profiling_spark.operators.text import pii_redact
    spark.createDataFrame(
        [("reach me: a.b@x.org / +1 (555) 123-4567",)], "text string") \
        .select(pii_redact("text").alias("redacted")).show(truncate=False)

    # 12. KS drift, skew report, MMR rerank, robust outliers, Z-order
    from spark_df_profiling_spark.operators.drift import ks_2samp
    ks_2samp(li.where(F.col("l_orderkey") % 2 == 0),
             li.where(F.col("l_orderkey") % 2 == 1),
             "l_extendedprice").show()

    from spark_df_profiling_spark.operators.frequency import skew_report
    skew_report(li, "l_suppkey", k=3).show(truncate=False)

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    from spark_df_profiling_spark.operators.similarity import mmr_rerank
    mmr_rerank(emb, emb.where(F.col("vec_id") < 2), k=3, pool=10).show()

    from spark_df_profiling_spark.operators.outliers import (
        robust_outlier_stats)
    robust_outlier_stats(li, ["l_extendedprice"]).show()

    import tempfile as _tf
    from spark_df_profiling_spark.operators.layout import (
        skipping_stats, zorder_write)
    zdir = _tf.mkdtemp() + "/z"
    zorder_write(li, zdir, ["l_partkey", "l_suppkey"], num_files=8)
    skipping_stats(spark, zdir, ["l_partkey", "l_suppkey"]).show()

    # 13. round-9: day-2 NEAR-dup against stored signatures, canonical
    # URLs, grouped HLL, collocations, FD/key screens, corr-state merge
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    from spark_df_profiling_spark.operators.dedup import (
        minhash_signature_state, neardup_against_history)
    hist = minhash_signature_state(docs.where(F.col("doc_id") < 200),
                                   "text", "doc_id")
    batch = docs.where(F.col("doc_id") < 20).select(
        (F.col("doc_id") + 10_000).alias("doc_id"),
        F.concat("text", F.lit(" republished")).alias("text"))
    neardup_against_history(batch, hist, "text", "doc_id",
                            min_agreement=0.5).show(5)

    from spark_df_profiling_spark import functions as PF
    spark.createDataFrame(
        [("HTTPS://Example.COM/a/?utm_source=tw&b=2#frag",)],
        "u string").select(PF.canonical_url("u")).show(truncate=False)

    from spark_df_profiling_spark.operators.frequency import (
        hll_estimate_by, hll_state_by)
    hll_estimate_by(hll_state_by(docs, "lang", ["text"]), "lang").show()

    from spark_df_profiling_spark.operators.text import (
        bigram_logprob, pmi_collocations, structure_stats)
    pmi_collocations(docs, "text", k=5, min_count=5).show()
    bigram_logprob(docs.where(F.col("doc_id") < 100),
                   "text", "doc_id").orderBy("blp_mean").show(3)
    structure_stats(spark.createDataFrame(
        [("# h\n- item\n```c```",)], "text string"), "text").show()

    from spark_df_profiling_spark.operators.correlation import (
        fd_strength, key_candidates)
    fd_strength(li, ["l_returnflag"], "l_linestatus").show()
    key_candidates(li, ["l_orderkey", "l_linenumber"]).show()

    from spark_df_profiling_spark.operators.incremental import (
        corr_from_state, corr_merge, corr_state)
    c3 = ["l_quantity", "l_extendedprice", "l_discount"]
    s1 = corr_state(li.where(F.col("l_orderkey") % 2 == 0), c3)
    s2 = corr_state(li.where(F.col("l_orderkey") % 2 == 1), c3)
    corr_from_state(corr_merge(s1, s2, c3), c3).show()

    # round 10: deterministic k-means + cluster-balanced carving,
    # leakage-safe splits, feed-health gaps, hybrid-retrieval fusion
    from spark_df_profiling_spark.operators.clustering import (
        cluster_balanced_sample, kmeans_fit, kmeans_profile)
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    cents = kmeans_fit(emb, "embedding", "vec_id", k=4, n_iter=2)
    kmeans_profile(emb, cents).orderBy("cluster").show()
    cluster_balanced_sample(emb, cents, per_cluster=2).groupBy(
        "cluster").count().show()

    from spark_df_profiling_spark.operators.sampling import (
        leakage_safe_split)
    pairs = spark.createDataFrame([(0, 1), (1, 2)],
                                  "id_a long, id_b long")
    (leakage_safe_split(docs, pairs, "doc_id",
                        {"train": 0.8, "val": 0.1, "test": 0.1})
     .groupBy("split").count().show())

    from spark_df_profiling_spark.operators.groupby import event_gaps
    from spark_df_profiling_spark.sources import (
        event_time_micros, with_event_time)
    ev = with_event_time(spark.read.parquet(f"{SF_DIR}/events.parquet"))
    event_gaps(ev.select("user_id",
                         event_time_micros(ev).alias("tus")),
               "tus", "user_id").orderBy(F.desc("staleness")).show(3)

    from spark_df_profiling_spark.operators.similarity import rrf_fuse
    from spark_df_profiling_spark.operators.text import bm25_topk
    sparse = bm25_topk(docs, "text", "doc_id",
                       ["data", "model"], k=10).select("doc_id", "rank")
    dense = sparse.select("doc_id",
                          (11 - F.col("rank")).alias("rank"))  # toy 2nd list
    rrf_fuse([sparse, dense], k=60, top_k=5).orderBy("fused_rank").show()

    # round 10, session 2: mergeable k-means state, anisotropy,
    # standardization, per-group quantiles/outliers, layout advisor
    from spark_df_profiling_spark.operators.clustering import (
        centroids_from_state, kmeans_state, kmeans_state_merge)
    st = [kmeans_state(emb.where(F.col("vec_id") % 2 == i), cents)
          for i in (0, 1)]
    merged = kmeans_state_merge(*st)
    print("day-2 centroids from merged state:",
          len(centroids_from_state(merged, cents)), "clusters")

    from spark_df_profiling_spark.operators.similarity import (
        standardize_embeddings, standardize_stats, top_component)
    tc = top_component(emb, n_iter=3)
    print(f"embedding anisotropy: {tc['anisotropy']:.4f} "
          f"(lambda1={tc['lambda1']:.4f}, trace={tc['trace']:.4f})")
    standardize_embeddings(emb, standardize_stats(emb)) \
        .select("vec_id", "embedding_std").show(2)

    from spark_df_profiling_spark.operators.groupby import (
        grouped_outlier_stats, grouped_quantiles)
    grouped_quantiles(li, ["l_returnflag"], "l_extendedprice",
                      probs=(0.5, 0.95)).show()
    grouped_outlier_stats(li, ["l_returnflag"], "l_extendedprice") \
        .select("l_returnflag", "n", "n_out_lo", "n_out_hi",
                "p_out").show()

    from spark_df_profiling_spark.operators.layout import (
        partition_advisor)
    partition_advisor(li, ["l_returnflag", "l_suppkey"]).show()

    # round 10, session 4: graph scoring, seasonal baselines, trends,
    # associations, reproducible shuffles, SCD2 lookups, exemplars
    from spark_df_profiling_spark.operators.graph import pagerank
    edges = li.select(
        F.concat(F.lit("s"), F.col("l_suppkey").cast("string"))
        .alias("src"),
        F.concat(F.lit("p"), F.col("l_partkey").cast("string"))
        .alias("dst"))
    pagerank(edges, n_iter=3).orderBy(F.desc("rank")).show(3)

    from spark_df_profiling_spark.operators.groupby import (
        cooccurrence_pairs, grouped_linregress, retention_cohorts,
        seasonal_anomaly)
    evm = ev.select("user_id", event_time_micros(ev).alias("tus"),
                    "value", "event_type")
    seasonal_anomaly(evm, "tus", "user_id", "value",
                     period=3_600_000_000.0, slots_per_period=4) \
        .where(F.col("is_anomaly")).show(3)
    retention_cohorts(evm, "tus", "user_id",
                      gran=43_200_000_000.0).show(5)
    cooccurrence_pairs(evm, "user_id", "event_type") \
        .orderBy(F.desc("lift")).show(3)
    xd = li.withColumn("__d", F.datediff(
        F.col("l_shipdate").cast("date"),
        F.lit("1992-01-01").cast("date")).cast("double"))
    grouped_linregress(xd, ["l_returnflag"], "__d",
                       "l_quantity").show()

    from spark_df_profiling_spark.operators.correlation import (
        correlation_ratio, theil_u)
    correlation_ratio(li, "l_returnflag", "l_quantity").show()
    theil_u(li, "l_returnflag", "l_linestatus").show()

    from spark_df_profiling_spark.operators.sampling import (
        deterministic_shuffle)
    deterministic_shuffle(docs, "doc_id", n_shards=4) \
        .groupBy("shard").count().orderBy("shard").show()

    from spark_df_profiling_spark.operators.constraints import (
        in_range_rows, violation_examples)
    violation_examples(
        li.withColumn("__rid", F.col("l_orderkey") * 10
                      + F.col("l_linenumber")),
        [in_range_rows("l_quantity", 1, 25)], "__rid", k=3).show()

    from spark_df_profiling_spark.operators.joins import (
        bloom_filtered_join, temporal_join)
    cust = spark.read.parquet(f"{SF_DIR}/customer.parquet")
    sparse_dim = cust.where(F.col("c_custkey") % 7 == 0)
    print("bloom-filtered join rows:",
          bloom_filtered_join(orders, sparse_dim, "o_custkey",
                              "c_custkey").count())
    dim = cust.select(
        "c_custkey", F.col("c_mktsegment").alias("seg"),
        F.lit(0.0).alias("valid_from"),
        F.lit(None).cast("double").alias("valid_to"))
    temporal_join(
        orders.select("o_orderkey", "o_custkey",
                      F.lit(1.0).alias("ts")),
        dim, "o_custkey", "ts", dim_key="c_custkey").show(3)

    from spark_df_profiling_spark.operators.graph import (
        degree_stats, trustrank)
    seeds = edges.select(F.col("src").alias("node")).limit(20)
    trustrank(edges, seeds, n_iter=3).orderBy(F.desc("rank")).show(3)
    degree_stats(edges).orderBy(F.desc("out_deg")).show(3)

    from spark_df_profiling_spark.operators.groupby import cusum_anomaly
    cusum_anomaly(evm, "tus", "user_id", "value") \
        .where(F.col("is_change")).show(3)

    from spark_df_profiling_spark.operators.drift import topk_rank_drift
    topk_rank_drift(li.where(F.col("l_orderkey") % 2 == 0),
                    li.where(F.col("l_orderkey") % 2 == 1),
                    "l_partkey", k=20).show()

    from spark_df_profiling_spark.operators.similarity import (
        knn_projected_rerank, random_projection)
    random_projection(emb, 64, 8).select("vec_id", "embedding_rp") \
        .show(2, truncate=60)
    knn_projected_rerank(emb, emb.where(F.col("vec_id") < 2),
                         in_dim=64, proj_dim=16, k=3).show()

    from spark_df_profiling_spark.sources import file_row_stats
    file_row_stats(li).show(truncate=60)

    from spark_df_profiling_spark import functions as PF
    docs.select("doc_id", PF.readability_score("text")
                .alias("flesch")).orderBy("flesch").show(3)

    from spark_df_profiling_spark.operators.similarity import (
        diversity_stats)
    diversity_stats(emb, sample_k=30).show()

    from spark_df_profiling_spark.operators.text import oov_stats
    from spark_df_profiling_spark.operators.text import vocab_topk
    vb = vocab_topk(docs, "text", k=100).select("token")
    oov_stats(docs, "text", vb, "doc_id") \
        .orderBy(F.desc("oov_rate")).show(3)

    # --- round 11: time-series, labeling QA, layout planning --------
    from spark_df_profiling_spark.operators.groupby import (
        changepoint_stats, ewma)
    evm2 = ev.select("user_id", event_time_micros(ev).alias("tus"),
                     "value")
    ewma(evm2, "tus", "user_id", "value", alpha=0.5) \
        .orderBy("user_id", "tus").show(3)
    changepoint_stats(evm2, "tus", "user_id", "value") \
        .orderBy(F.desc("gain")).show(3)

    from spark_df_profiling_spark.operators.similarity import (
        knn_classify, label_agreement_stats)
    knn_classify(emb, emb.where(F.col("vec_id") < 3), k=5).show()
    label_agreement_stats(emb, k=5).orderBy("label").show(3)

    from spark_df_profiling_spark.operators.sampling import (
        stratified_kfold)
    stratified_kfold(docs, "lang", "doc_id", k=5) \
        .groupBy("lang", "fold").count().orderBy("lang", "fold").show(6)

    from spark_df_profiling_spark.operators.correlation import (
        cohens_kappa)
    jk = li.join(spark.read.parquet(f"{SF_DIR}/orders.parquet"),
                 li["l_orderkey"] == F.col("o_orderkey"))
    cohens_kappa(jk, "o_orderstatus", "l_linestatus").show()

    from spark_df_profiling_spark.operators.layout import (
        compaction_plan)
    compaction_plan(docs.select("lang", "doc_id", "n_chars"),
                    "doc_id", "n_chars", 500, ["lang"]) \
        .groupBy("lang", "oversize").count().show()

    from spark_df_profiling_spark.operators.dedup import ngram_novelty
    ngram_novelty(docs).orderBy("novelty").show(3)

    # --- round 11, part 2: survival, multi-changepoint, evaluation --
    from spark_df_profiling_spark.operators.groupby import (
        binary_segmentation, kaplan_meier, log_rank_test)
    subjects = (evm2.groupBy("user_id")
                .agg(((F.max("tus") - F.min("tus")) / 86400000000.0)
                     .alias("t"),
                     (F.count(F.lit(1)) % 2 == 0).alias("churned")))
    kaplan_meier(subjects, "t", "churned").orderBy("t").show(3)
    log_rank_test(subjects.withColumn(
        "cohort", (F.col("user_id") % 2).cast("string")),
        "t", "churned", "cohort").show()
    binary_segmentation(evm2, "tus", "user_id", "value",
                        max_changepoints=2, min_gain=0.3) \
        .orderBy(F.desc("gain")).show(3)

    from spark_df_profiling_spark.operators.evaluation import (
        calibration_report, classification_report, roc_auc)
    preds = emb.select(F.col("label").cast("string").alias("y"),
                       F.when(F.col("vec_id") % 7 == 0,
                              ((F.col("label") + 1) % 10))
                       .otherwise(F.col("label"))
                       .cast("string").alias("p"))
    classification_report(preds, "y", "p").orderBy("class").show(4)
    scored = emb.select((F.col("label") == 0).alias("y"),
                        F.least(F.greatest(
                            (F.get("embedding", 0).cast("double")
                             + 4.0) / 8.0, F.lit(0.0)),
                            F.lit(1.0)).alias("s"))
    roc_auc(scored, "y", "s").show()
    calibration_report(scored, "y", "s").show(4)

    from spark_df_profiling_spark.streaming import stateful_ewma
    # (streaming twin of ewma — see tests for the availableNow replay)

    # round-12 continuation: uncertainty, targeting, guarantees
    from spark_df_profiling_spark.operators.evaluation import (
        conformal_coverage, conformal_threshold, gains_curve)
    from spark_df_profiling_spark.operators.sampling import (
        bootstrap_ci)
    bootstrap_ci(docs, "n_chars", "doc_id", n_boot=41,
                 group_col="lang").orderBy("lang").show(5)
    gains_curve(scored, "y", "s", n_buckets=5).orderBy("bucket") \
        .show(5)
    thr = conformal_threshold(scored, "s", alpha=0.2)
    conformal_coverage(scored, thr, "s").show()
    from spark_df_profiling_spark.operators.text import bpe_train
    merges = bpe_train(docs, "text", n_merges=5)
    print("BPE merges:", merges)

    # --- round 13: projection, calibration, reliability, FDR --------
    from spark_df_profiling_spark.operators.similarity import (
        pca_fit, pca_project)
    pst = pca_fit(emb, k=4)
    print("PCA top-4 explained variance ratio:",
          [round(r, 4) for r in pst["explained_variance_ratio"]])
    pca_project(emb, pst).select("vec_id", "embedding_pca").show(
        3, truncate=60)

    from spark_df_profiling_spark.operators.evaluation import (
        isotonic_apply, isotonic_fit, mcnemar_test)
    ist = isotonic_fit(scored.select(
        F.col("y").cast("double").alias("yd"),
        F.round(F.col("s") * 20).alias("sq")), "yd", "sq")
    isotonic_apply(scored.select(F.round(F.col("s") * 20)
                                 .alias("sq")).distinct(),
                   ist, "sq").orderBy("sq").show(5)
    paired = emb.select(
        (F.col("label") < 5).alias("y"),
        (F.get("embedding", 0).cast("double") > 0).alias("pa"),
        (F.get("embedding", 1).cast("double") > 0).alias("pb"))
    mcnemar_test(paired, "y", "pa", "pb").show()

    from spark_df_profiling_spark.operators.correlation import (
        cronbach_alpha, spearman_matrix)
    cronbach_alpha(li, ["l_quantity", "l_extendedprice",
                        "l_tax"]).show()
    spearman_matrix(li, ["l_quantity", "l_extendedprice",
                         "l_discount"]).show()

    from spark_df_profiling_spark.operators.drift import bh_fdr
    pvals = li.select(
        F.col("l_returnflag").alias("seg"),
        F.when(F.col("l_partkey") % 10 == 0,
               (F.col("l_partkey") % 1000) / 100000.0)
        .otherwise((F.col("l_partkey") % 1000) / 1000.0).alias("p"))
    (bh_fdr(pvals, "p", alpha=0.05, group_col="seg")
     .groupBy("seg").agg(
         F.sum(F.when(F.col("bh_rejected"), 1).otherwise(0))
         .alias("n_discoveries"),
         F.max("bh_threshold").alias("p_star")).show())

    from spark_df_profiling_spark.operators.text import (
        bpe_token_count)
    bpe_token_count(docs, "text", merges, "doc_id") \
        .orderBy("doc_id").show(3)

    from spark_df_profiling_spark.operators.clustering import (
        kmeans_fit, prototypicality_prune)
    cents13 = kmeans_fit(emb, "embedding", "vec_id", k=4, n_iter=2)
    (prototypicality_prune(emb, cents13, drop_frac=0.25)
     .groupBy("cluster")
     .agg(F.count(F.lit(1)).alias("n"),
          F.sum(F.when(F.col("pruned"), 1).otherwise(0))
          .alias("n_pruned")).orderBy("cluster").show())

    from spark_df_profiling_spark.operators.drift import ks_reference
    kref13 = ks_reference(li.select(
        F.col("l_extendedprice").cast("double").alias("v")), "v",
        n_edges=8)
    print("KS reference grid:",
          [(round(e, 1), round(c, 3)) for e, c in kref13[:4]], "...")
    # streaming_ks itself runs in the oracle slot + tests via a real
    # availableNow execution (see test_round13_streaming_ks)

    spark.stop()


if __name__ == "__main__":
    main()

"""Scale rehearsal: run the flagship paths at ~10x the largest on-disk SF.

The container only ships sf0.1 (~600k-row lineitem, 5k documents), so
this replicates the parquet inputs in-memory (id-shifted unions — no
files written) to push row counts past what the bench exercises:

* profile() on a ~6M-row lineitem — chunked wide aggs, HLL sketches,
  quantile pass, correlation expressions;
* native MinHash near-dedup on documents x10 — each text appears 10
  times, so every LSH band bucket is 10x denser (planted skew) and the
  exact-duplicate path, bucket caps, and connected components all fire;
* exact dedup + text_features on the same corpus.

Findings go to BASELINE.md (run manually; not part of bench.py because
the replication cost itself would dominate the headline metric).
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import DataFrame, SparkSession, functions as F

REPLICAS = 10
SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"


def replicate(df: DataFrame, id_cols: list[str], n: int,
              materialize_as: str | None = None,
              spark: SparkSession | None = None) -> DataFrame:
    """n id-shifted copies; unique ids keep keep-first semantics sane.

    ``materialize_as`` writes the union to a temp parquet and reads it
    back: every downstream stage of the raw 10-branch union plan
    re-executes all 10 scans+projections, so multi-stage operators
    (near-dedup: shingle→minhash→band→join→verify) pay the replication
    harness ~once per stage.  A real 10x corpus is one dataset on disk —
    materializing measures the ENGINE, the raw union measures the
    harness.  (BASELINE.md records both for profile: 176.9s union vs
    50.2s materialized at round 2.)
    """
    shift = 10_000_000
    out = df
    for i in range(1, n):
        out = out.unionByName(df.select(*[
            (F.col(c) + i * shift).alias(c) if c in id_cols else F.col(c)
            for c in df.columns]))
    if materialize_as:
        import tempfile
        path = f"{tempfile.mkdtemp()}/{materialize_as}.parquet"
        out.write.mode("overwrite").parquet(path)
        return spark.read.parquet(path)
    return out


def main() -> None:
    spark = (SparkSession.builder.master("local[32]")
             .config("spark.sql.shuffle.partitions", "32")
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.driver.memory", "32g")
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    t = lambda name: spark.read.parquet(f"{SF_DIR}/{name}.parquet")

    li = replicate(t("lineitem"), ["l_orderkey"], REPLICAS,
                   materialize_as="lineitem_x10", spark=spark)
    n_li = li.count()
    from spark_df_profiling_spark import profile
    t0 = time.time()
    profile(li).collect()
    t_profile = time.time() - t0
    print(f"profile lineitem x{REPLICAS} ({n_li} rows): "
          f"{t_profile:.1f}s", flush=True)

    docs = replicate(t("documents"), ["doc_id"], REPLICAS,
                     materialize_as="documents_x10", spark=spark)
    n_docs = docs.count()

    from spark_df_profiling_spark.operators.dedup import (
        dedup_stats, exact_dedup, near_dedup_minhash)
    t0 = time.time()
    stats = dedup_stats(docs, cols=["text"]).collect()[0]
    kept_exact = exact_dedup(docs, cols=["text"],
                             order_col="doc_id").count()
    t_exact = time.time() - t0
    print(f"exact dedup docs x{REPLICAS} ({n_docs} rows): "
          f"{t_exact:.1f}s  n_distinct={stats['n_distinct']} "
          f"kept={kept_exact}", flush=True)

    t0 = time.time()
    kept = near_dedup_minhash(docs, "text", "doc_id", transitive=False,
                              native=True, num_hashes=16,
                              jaccard_max_distance=0.3).count()
    t_near = time.time() - t0
    print(f"near-dedup (native minhash) docs x{REPLICAS}: "
          f"{t_near:.1f}s  kept={kept}", flush=True)

    from spark_df_profiling_spark.operators.text import text_features
    t0 = time.time()
    text_features(docs, "text").select(
        F.max("f_n_chars"), F.min("f_fingerprint"),
        F.count_distinct("f_lang"), F.sum("f_quality")).collect()
    t_text = time.time() - t0
    print(f"text_features docs x{REPLICAS}: {t_text:.1f}s", flush=True)

    # round-3 operators: sampling/split (shuffle-free), mixture
    # (broadcast cut join), repetition HOFs, vocab top-k (token-stream
    # shuffle), PSI drift (bucket-row shuffle only)
    from spark_df_profiling_spark.operators.sampling import (
        hash_split, mixture_sample)
    t0 = time.time()
    splits = (hash_split(docs, "doc_id",
                         {"train": 0.9, "val": 0.05, "test": 0.05})
              .groupBy("split").count().collect())
    t_split = time.time() - t0
    print(f"hash_split docs x{REPLICAS}: {t_split:.1f}s  "
          f"{sorted((r['split'], r['count']) for r in splits)}",
          flush=True)

    weights = {f"src{i}": (0.3 if i < 2 else 0.4 / 18)
               for i in range(20)}
    t0 = time.time()
    n_mix = mixture_sample(docs, "source", weights, "doc_id").count()
    t_mix = time.time() - t0
    print(f"mixture_sample docs x{REPLICAS}: {t_mix:.1f}s  kept={n_mix}",
          flush=True)

    from spark_df_profiling_spark.operators.text import (
        repetition_stats, vocab_topk)
    t0 = time.time()
    repetition_stats(docs, "text").agg(
        F.sum(F.when(F.col("r_keep"), 1).otherwise(0))).collect()
    t_rep = time.time() - t0
    print(f"repetition_stats docs x{REPLICAS}: {t_rep:.1f}s", flush=True)

    t0 = time.time()
    vocab = vocab_topk(docs, "text", k=20).collect()
    t_vocab = time.time() - t0
    print(f"vocab_topk docs x{REPLICAS}: {t_vocab:.1f}s  "
          f"top={vocab[0]['token']}:{vocab[0]['cnt']}", flush=True)

    from spark_df_profiling_spark.operators.drift import psi_report
    ref = li.where(F.col("l_orderkey") % 2 == 0)
    new = li.where(F.col("l_orderkey") % 2 == 1)
    t0 = time.time()
    psi_report(ref, new,
               numeric_cols=["l_quantity", "l_extendedprice",
                             "l_discount", "l_tax"],
               categorical_cols=["l_returnflag", "l_linestatus"]).collect()
    t_psi = time.time() - t0
    print(f"psi_report lineitem x{REPLICAS} halves: {t_psi:.1f}s",
          flush=True)

    # round-5: event-time operators at 10x — user_id shift gives 10x
    # distinct users at the same per-user event density (the realistic
    # scale axis), timestamps unchanged so windows get 10x denser
    from spark_df_profiling_spark.operators.joins import (
        asof_join, range_join_buckets)
    from spark_df_profiling_spark.sources import (
        event_time_micros, with_event_time)
    from spark_df_profiling_spark.streaming import (
        session_profile, windowed_profile)
    ev = replicate(t("events"), ["event_id", "user_id"], REPLICAS,
                   materialize_as="events_x10", spark=spark)
    ev = with_event_time(ev)
    n_ev = ev.count()

    t0 = time.time()
    windowed_profile(ev, "ts_ts", "value", "1 day",
                     group_col="event_type").collect()
    t_win = time.time() - t0
    print(f"windowed_profile events x{REPLICAS} ({n_ev} rows): "
          f"{t_win:.1f}s", flush=True)

    t0 = time.time()
    n_sess = session_profile(ev, "ts_ts", "user_id",
                             gap="1 hour").count()
    t_sess = time.time() - t0
    print(f"session_profile events x{REPLICAS}: {t_sess:.1f}s  "
          f"sessions={n_sess}", flush=True)

    tus = event_time_micros(ev)
    clicks = ev.where(F.col("event_type") == "click").select(
        "event_id", "user_id", tus.alias("tus"))
    views = ev.where(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_id"), "user_id",
        tus.alias("tus"))
    t0 = time.time()
    n_asof = asof_join(clicks, views, on="user_id",
                       left_ts="tus").count()
    t_asof = time.time() - t0
    print(f"asof_join events x{REPLICAS}: {t_asof:.1f}s  "
          f"rows={n_asof}", flush=True)

    iv = spark.range(0, 186).select(
        F.col("id").alias("iid"),
        (F.lit(1_704_067_200_000_000)
         + F.col("id") * F.lit(14_400_000_000)).alias("lo"),
        (F.lit(1_704_067_200_000_000) + F.col("id") * F.lit(14_400_000_000)
         + F.lit(21_600_000_000)).alias("hi"))
    pts = ev.select(tus.alias("tus"), "value")
    t0 = time.time()
    n_rj = (range_join_buckets(pts, iv, "tus", "lo", "hi",
                               bucket_width=14_400_000_000.0)
            .groupBy("iid").count().count())
    t_rj = time.time() - t0
    print(f"range_join events x{REPLICAS}: {t_rj:.1f}s  "
          f"windows={n_rj}", flush=True)

    # round-5: incremental profile — one partial per replica-slice of
    # the 6M-row lineitem (the daily-partition pattern), merge + finalize
    from spark_df_profiling_spark.operators.incremental import (
        finalize, merge_partials, partial_profile)
    t0 = time.time()
    parts = [partial_profile(li.where(F.col("l_orderkey") % 10 == i))
             for i in range(10)]
    fin = finalize(merge_partials(*parts)).collect()
    t_inc = time.time() - t0
    by_col = {r["column"]: r for r in fin}
    print(f"incremental profile lineitem x{REPLICAS} (10 partials): "
          f"{t_inc:.1f}s  n={by_col['l_orderkey']['n']} "
          f"nd_est={by_col['l_orderkey']['distinct_estimate']}",
          flush=True)

    # round-6: line dedup, decontamination, packing, quality funnel on
    # the 10x documents corpus (50k docs)
    from spark_df_profiling_spark.operators.dedup import (
        decontaminate, line_dedup)
    from spark_df_profiling_spark.operators.packing import shard_summary
    from spark_df_profiling_spark.operators.text import quality_funnel

    wrapped = docs.select(
        "doc_id",
        F.concat(F.lit("NAV HEADER\n"), F.col("text"),
                 F.lit("\nFOOTER")).alias("text"))
    t0 = time.time()
    ld = line_dedup(wrapped, "text", "doc_id", min_count=100)
    n_cleaned = ld.where(F.col("n_lines_removed") > 0).count()
    t_ld = time.time() - t0
    print(f"line_dedup docs x{REPLICAS}: {t_ld:.1f}s  "
          f"docs_cleaned={n_cleaned}", flush=True)

    bench = (docs.where(F.col("doc_id") < 200)
             .select(F.concat_ws(
                 " ", F.slice(F.split("text", " "), 6, 20))
                 .alias("text")))
    t0 = time.time()
    n_cont = (decontaminate(docs, bench, n=8)
              .where(F.col("contaminated")).count())
    t_dc = time.time() - t0
    print(f"decontaminate docs x{REPLICAS} (200-doc bench): "
          f"{t_dc:.1f}s  contaminated={n_cont}", flush=True)

    t0 = time.time()
    sh = shard_summary(
        docs.withColumn("__nt", F.size(F.split("text", " "))),
        "__nt", "doc_id", context_len=8192).collect()
    t_pk = time.time() - t0
    print(f"pack_offsets docs x{REPLICAS}: {t_pk:.1f}s  "
          f"shards={len(sh)}", flush=True)

    toks = F.split(F.col("text"), " ")
    t0 = time.time()
    fun = quality_funnel(docs, [
        ("len_ge_250", F.length("text") >= 250),
        ("tokens_ge_50", F.size(toks) >= 50),
        ("ttr_ge_05",
         F.size(F.array_distinct(toks)) / F.size(toks).cast("double")
         >= 0.5)]).collect()
    t_fn = time.time() - t0
    final = [r for r in fun if r["rule"] == "ttr_ge_05"][0]
    print(f"quality_funnel docs x{REPLICAS}: {t_fn:.1f}s  "
          f"surviving={final['n_surviving']}", flush=True)


def skew_main() -> None:
    """Round-7 adversarial skew fixtures (VERDICT r6 item 6): prove the
    caps/guards on the round-6 operators under planted pathological
    skew, not just uniform 10x replication.

    * line_dedup — one line repeated ~1M times across the corpus plus
      ONE giant 200k-line document (stresses the heavy-hitter count,
      the anti-join, and the single-doc collect_list reassembly);
    * pack_offsets — one 10M-token document among 50k normal docs (a
      single range-partition carries ~99% of the token mass; the
      prefix-sum must stay exact and the job parallel);
    * decontaminate — a benchmark 8-gram planted into 50% of the corpus
      (the broadcast-hash match explodes from "rare" to half the
      corpus; the per-doc count shuffle must absorb it);
    * semantic_dedup — 30k IDENTICAL embeddings forming one degenerate
      cluster (mode collapse): max_cluster_rows must exclude it loudly
      and keep wall-clock bounded, with deterministic survivors.
    """
    spark = (SparkSession.builder.master("local[32]")
             .config("spark.sql.shuffle.partitions", "32")
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.driver.memory", "32g")
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    t = lambda name: spark.read.parquet(f"{SF_DIR}/{name}.parquet")

    docs = replicate(t("documents"), ["doc_id"], REPLICAS,
                     materialize_as="documents_x10s", spark=spark)
    n_docs = docs.count()

    from spark_df_profiling_spark.operators.dedup import (
        decontaminate, line_dedup)

    # ~20 copies of the skew line per doc -> ~1M occurrences of ONE line
    skewed = docs.select(
        "doc_id",
        F.concat(F.expr("repeat('SKEWLINE\\n', 20)"), F.col("text"))
        .alias("text"))
    giant = spark.range(1).select(
        F.lit(999_999_999).alias("doc_id"),
        F.array_join(
            F.transform(F.sequence(F.lit(1), F.lit(200_000)),
                        lambda i: F.concat(F.lit("gl_"), (i % 1000)
                                           .cast("string"))),
            "\n").alias("text"))
    corpus = skewed.unionByName(giant)
    t0 = time.time()
    ld = line_dedup(corpus, "text", "doc_id", min_count=100)
    agg = ld.agg(
        F.sum("n_lines_removed").alias("rm"),
        F.max(F.when(F.col("doc_id") == 999_999_999,
                     F.col("n_lines_removed"))).alias("giant_rm")).collect()[0]
    t_ld = time.time() - t0
    print(f"SKEW line_dedup ({n_docs} docs + 1M-repeat line + 200k-line "
          f"giant): {t_ld:.1f}s  removed={agg['rm']} "
          f"giant_removed={agg['giant_rm']}", flush=True)

    # pack_offsets: one 10M-token doc
    from spark_df_profiling_spark.operators.packing import pack_offsets
    sized = docs.select(
        "doc_id",
        F.when(F.col("doc_id") == 0, F.lit(10_000_000))
        .otherwise(F.size(F.split("text", " "))).alias("__nt"))
    t0 = time.time()
    packed = pack_offsets(sized, "__nt", "doc_id", context_len=8192)
    chk = packed.agg(
        F.max("end_offset").alias("total"),
        F.count_distinct("shard_id").alias("shards")).collect()[0]
    t_pk = time.time() - t0
    print(f"SKEW pack_offsets (one 10M-token doc): {t_pk:.1f}s  "
          f"total_tokens={chk['total']} shards={chk['shards']}",
          flush=True)

    # decontaminate: benchmark gram matching 50% of the corpus
    sentinel = "s1 s2 s3 s4 s5 s6 s7 s8"
    half_poisoned = docs.select(
        "doc_id",
        F.when(F.col("doc_id") % 2 == 0,
               F.concat(F.col("text"), F.lit(" " + sentinel)))
        .otherwise(F.col("text")).alias("text"))
    bench = spark.createDataFrame([(sentinel,)], "text string")
    t0 = time.time()
    n_cont = (decontaminate(half_poisoned, bench, n=8)
              .where(F.col("contaminated")).count())
    t_dc = time.time() - t0
    print(f"SKEW decontaminate (gram hits 50% of corpus): {t_dc:.1f}s  "
          f"contaminated={n_cont} (expect ~{n_docs // 2})", flush=True)

    # semantic_dedup: degenerate 30k-identical-vector cluster
    from spark_df_profiling_spark.operators.similarity import (
        semantic_dedup)
    emb = replicate(t("embeddings"), ["vec_id"], REPLICAS,
                    materialize_as="embeddings_x10s", spark=spark)
    n_emb = emb.count()
    one = emb.where(F.col("vec_id") == 1).select("embedding")
    clones = (spark.range(30_000)
              .select((F.col("id") + 500_000_000).alias("vec_id"))
              .crossJoin(F.broadcast(one)))
    skew_emb = emb.select("vec_id", "embedding").unionByName(clones)
    import warnings as W
    t0 = time.time()
    with W.catch_warnings(record=True) as got:
        W.simplefilter("always")
        sd = semantic_dedup(skew_emb, rows_per_cluster=4096,
                            min_cosine=0.99, max_cluster_rows=10_000)
        res = sd.agg(F.sum(F.col("keep").cast("long")).alias("kept"),
                     F.count(F.lit(1)).alias("n")).collect()[0]
    t_sd = time.time() - t0
    warned = any("EXCLUDED" in str(w.message) for w in got)
    # determinism: second run reproduces the survivor count exactly
    with W.catch_warnings():
        W.simplefilter("ignore")
        res2 = (semantic_dedup(skew_emb, rows_per_cluster=4096,
                               min_cosine=0.99, max_cluster_rows=10_000)
                .agg(F.sum(F.col("keep").cast("long"))).collect()[0][0])
    print(f"SKEW semantic_dedup ({n_emb}+30k identical): {t_sd:.1f}s  "
          f"kept={res['kept']}/{res['n']} cap_warned={warned} "
          f"run2_kept_identical={res2 == res['kept']}", flush=True)


def r7b_main() -> None:
    """Round-7 session-2 operators at 10x (50k docs / 100k events) with
    planted skew:

    * chunk_documents — the 10x corpus PLUS one 10M-token document
      (one input row fans out to ~208k chunk rows through a single
      transform+posexplode; per-row work, no shuffle to skew);
    * tfidf_topk — full corpus (vocabulary-key join + per-doc window);
    * dsir_logweights — full corpus vs lang='en' target (two bucket
      scans + broadcast ratio + one doc-id shuffle);
    * bloom_state / bloom_might_contain — state over 50k docs, probe
      with a half-overlapping batch; false-negative count MUST be 0;
    * stream_stream_interval_join — batch semantics at events x10
      (10x users at same per-user density: join state per key constant,
      output scales linearly).
    """
    spark = (SparkSession.builder.master("local[32]")
             .config("spark.sql.shuffle.partitions", "32")
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.driver.memory", "32g")
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    t = lambda name: spark.read.parquet(f"{SF_DIR}/{name}.parquet")

    docs = replicate(t("documents"), ["doc_id"], REPLICAS,
                     materialize_as="documents_x10b", spark=spark)
    n_docs = docs.count()

    from spark_df_profiling_spark.operators.text import (
        chunk_documents, tfidf_topk)
    giant = spark.range(1).select(
        F.lit(999_999_999).alias("doc_id"),
        F.array_join(
            F.transform(F.sequence(F.lit(1), F.lit(10_000_000)),
                        lambda i: F.concat(F.lit("t"), (i % 997)
                                           .cast("string"))),
            " ").alias("text"))
    corpus = docs.select("doc_id", "text").unionByName(giant)
    t0 = time.time()
    ch = chunk_documents(corpus, "text", "doc_id",
                         chunk_tokens=2048, overlap=128)
    agg = ch.agg(F.count(F.lit(1)).alias("n"),
                 F.sum("chunk_n_tokens").alias("tok"),
                 F.max(F.when(F.col("doc_id") == 999_999_999, 1)
                       .otherwise(0)).alias("giant_seen")).collect()[0]
    t_ch = time.time() - t0
    print(f"SKEW chunk_documents ({n_docs} docs + one 10M-token doc): "
          f"{t_ch:.1f}s  chunks={agg['n']} giant_ok={agg['giant_seen']}",
          flush=True)

    t0 = time.time()
    tk = tfidf_topk(docs, "text", "doc_id", k=3)
    n_tk = tk.count()
    t_tk = time.time() - t0
    print(f"tfidf_topk docs x{REPLICAS}: {t_tk:.1f}s  rows={n_tk}",
          flush=True)

    from spark_df_profiling_spark.operators.sampling import (
        dsir_logweights)
    t0 = time.time()
    w = dsir_logweights(docs, docs.where(F.col("lang") == "en"),
                        "text", "doc_id", n_buckets=10_000)
    stats = w.agg(F.count(F.lit(1)).alias("n"),
                  F.avg("log_w").alias("m")).collect()[0]
    t_w = time.time() - t0
    print(f"dsir_logweights docs x{REPLICAS}: {t_w:.1f}s  "
          f"scored={stats['n']}", flush=True)

    from spark_df_profiling_spark.operators.dedup import (
        bloom_might_contain, bloom_state)
    m_bits, k = 1 << 20, 5
    day1 = docs.where(F.col("doc_id") % 2 == 0)
    probe = docs  # half by id; the corpus has planted cross-half dups
    t0 = time.time()
    st = bloom_state(day1, ["text"], m_bits=m_bits, k=k)
    st = st.persist()
    n_words = st.count()
    flagged = bloom_might_contain(probe, st, ["text"],
                                  m_bits=m_bits, k=k).persist()
    # ground truth by CONTENT, not id parity — the corpus carries
    # planted exact duplicates across the halves, which are TRUE
    # positives for a content-membership filter
    seen_texts = day1.select("text").distinct()
    truth = flagged.join(seen_texts.withColumn("__seen", F.lit(True)),
                         "text", "left")
    res = (truth.groupBy(F.coalesce("__seen", F.lit(False))
                         .alias("seen"))
           .agg(F.sum(F.col("might_contain").cast("long")).alias("mc"),
                F.count(F.lit(1)).alias("n")).collect())
    t_bl = time.time() - t0
    by = {r["seen"]: r for r in res}
    fn = by[True]["n"] - by[True]["mc"]  # truly seen but not flagged
    print(f"bloom state+probe docs x{REPLICAS}: {t_bl:.1f}s  "
          f"state_words={n_words} false_neg={fn} (MUST be 0) "
          f"true_fp={by[False]['mc']}/{by[False]['n']}", flush=True)
    flagged.unpersist()
    st.unpersist()

    from spark_df_profiling_spark.sources import with_event_time
    from spark_df_profiling_spark.streaming import (
        stream_stream_interval_join)
    ev = with_event_time(replicate(
        t("events"), ["event_id", "user_id"], REPLICAS,
        materialize_as="events_x10b", spark=spark))
    vl = (ev.where(F.col("event_type") == "view")
          .select("event_id", "user_id", "ts_ts"))
    pr = (ev.where(F.col("event_type") == "purchase")
          .select("event_id", "user_id", "ts_ts"))
    t0 = time.time()
    n_pairs = stream_stream_interval_join(
        vl, pr, "user_id", max_delay="1 hour").count()
    t_ssj = time.time() - t0
    print(f"interval join (batch semantics) events x{REPLICAS}: "
          f"{t_ssj:.1f}s  pairs={n_pairs}", flush=True)


def r7c_main() -> None:
    """Round-7 session-3 operators at 10x (50k docs) with planted skew:

    * bm25_topk — 10x corpus PLUS one 1M-token document (degenerate
      dl) and a query containing the corpus's hottest token (the tf
      explode's worst case — the filter still prunes map-side and the
      (doc, term) key spreads the hot term over all docs);
    * zipf_fit — full 10x corpus (unbounded vocab count stays a hash
      agg; only the top-500 ever reach the global rank);
    * encoding_stats — full 10x corpus + dirty fixtures (narrow scan,
      zero shuffle: should run at pipeline speed);
    * soft_dedup_weights — 10x corpus (every text has dup_count >= 10
      by construction) PLUS one text repeated 5000x — a pathological
      hot content-hash group; the groupBy count handles it map-side,
      and no window ever sorts within the group;
    * cross_contamination_minhash — 50k-doc corpus vs a 100-doc
      mutated benchmark (broadcast bench bands; corpus never moves).
    """
    spark = (SparkSession.builder.master("local[32]")
             .config("spark.sql.shuffle.partitions", "32")
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.driver.memory", "32g")
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    t = lambda name: spark.read.parquet(f"{SF_DIR}/{name}.parquet")

    docs = replicate(t("documents"), ["doc_id"], REPLICAS,
                     materialize_as="documents_x10c", spark=spark)
    n_docs = docs.count()

    from spark_df_profiling_spark.operators.text import (
        bm25_topk, encoding_stats, vocab_topk, zipf_fit)

    hot = vocab_topk(docs, "text", k=1).collect()[0]["token"]
    giant = spark.range(1).select(
        F.lit(999_999_999).alias("doc_id"),
        F.array_join(
            F.transform(F.sequence(F.lit(1), F.lit(1_000_000)),
                        lambda i: F.concat(F.lit("t"), (i % 997)
                                           .cast("string"))),
            " ").alias("text"))
    corpus = docs.select("doc_id", "text").unionByName(giant)
    t0 = time.time()
    top = bm25_topk(corpus, "text", "doc_id",
                    [hot, "data", "model", "t42"], k=10).collect()
    t_bm = time.time() - t0
    print(f"SKEW bm25_topk ({n_docs} docs + 1M-token doc, hot term "
          f"'{hot}'): {t_bm:.1f}s  top1={top[0]['doc_id']}", flush=True)

    t0 = time.time()
    z = zipf_fit(docs, "text", max_vocab=10_000).collect()[0]
    t_z = time.time() - t0
    print(f"zipf_fit docs x{REPLICAS}: {t_z:.1f}s  "
          f"slope={z['zipf_slope']:.3f} n_vocab={z['n_vocab']}",
          flush=True)

    dirty = spark.createDataFrame(
        [(888_000_001, "lossy � decode"), (888_000_002, "moji Ã© Â»")],
        "doc_id long, text string")
    t0 = time.time()
    enc = (encoding_stats(corpus.unionByName(dirty), "text", "doc_id")
           .agg(F.count(F.lit(1)).alias("n"),
                F.sum(F.when(F.col("enc_clean"), 0).otherwise(1))
                .alias("n_dirty")).collect()[0])
    t_e = time.time() - t0
    print(f"encoding_stats docs x{REPLICAS}: {t_e:.1f}s  "
          f"rows={enc['n']} dirty={enc['n_dirty']}", flush=True)

    from spark_df_profiling_spark.operators.dedup import (
        cross_contamination_minhash, soft_dedup_weights)
    hot_block = spark.range(5000).select(
        (F.col("id") + 900_000_000).alias("doc_id"),
        F.lit("the same boilerplate text repeated verbatim").alias("text"))
    t0 = time.time()
    sw = (soft_dedup_weights(corpus.unionByName(hot_block), ["text"])
          .agg(F.count(F.lit(1)).alias("n"),
               F.max("dup_count").alias("max_dup"),
               F.sum("weight").alias("mass")).collect()[0])
    t_s = time.time() - t0
    print(f"SKEW soft_dedup_weights (+5000x one text): {t_s:.1f}s  "
          f"rows={sw['n']} max_dup={sw['max_dup']} "
          f"mass={sw['mass']:.1f} (= n_distinct)", flush=True)

    toks = F.split(F.col("text"), " ")
    bench = (t("documents").where(F.col("doc_id") < 100)
             .select((F.col("doc_id") + 500_000_000).alias("doc_id"),
                     F.concat(F.concat_ws(" ", F.slice(toks, 1,
                                                       F.size(toks) - 1)),
                              F.lit(" xyzzy")).alias("text")))
    t0 = time.time()
    n_pairs = cross_contamination_minhash(
        docs.select("doc_id", "text"), bench,
        jaccard_max_distance=0.5, max_bucket_size=2000).count()
    t_x = time.time() - t0
    print(f"cross_contamination 50k corpus vs 100 bench: {t_x:.1f}s  "
          f"pairs={n_pairs} (expect ~{100 * REPLICAS}: each bench doc "
          f"matches its {REPLICAS} replicated sources)", flush=True)


def r7d_main() -> None:
    """Diagnostics batch at 10x (6M lineitem / 50k docs) + planted skew:

    * outlier_stats / benford_stats on the 6M-row lineitem (two scans /
      one scan, nothing row-scale shuffles);
    * join_key_stats on 6M lineitem x 1.5M orders PLUS one orderkey
      replicated 100k times on the left — the hot key the report is
      meant to EXPOSE (max_left_fanout) without itself skewing: the
      count collapses map-side before the shuffle;
    * pii_redact over the 50k-doc corpus (scan-speed claim).
    """
    spark = (SparkSession.builder.master("local[32]")
             .config("spark.sql.shuffle.partitions", "32")
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.driver.memory", "32g")
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    t = lambda name: spark.read.parquet(f"{SF_DIR}/{name}.parquet")

    li = replicate(t("lineitem"), ["l_orderkey"], REPLICAS,
                   materialize_as="lineitem_x10d", spark=spark)
    n_li = li.count()

    from spark_df_profiling_spark.operators.outliers import (
        benford_stats, outlier_stats)
    t0 = time.time()
    o = outlier_stats(li, ["l_extendedprice", "l_quantity", "l_tax"],
                      k=1.5).collect()
    t_o = time.time() - t0
    print(f"outlier_stats lineitem x{REPLICAS} ({n_li} rows, 3 cols): "
          f"{t_o:.1f}s  outliers="
          f"{ {r['column']: r['n_outliers'] for r in o} }", flush=True)

    t0 = time.time()
    b = benford_stats(li, ["l_extendedprice", "l_quantity"]).collect()
    t_b = time.time() - t0
    mads = {r["column"]: round(r["mad"], 4) for r in b}
    print(f"benford_stats lineitem x{REPLICAS} (2 cols): {t_b:.1f}s  "
          f"mad={mads}", flush=True)

    from spark_df_profiling_spark.operators.joins import join_key_stats
    hot = spark.range(100_000).select(
        F.lit(1).cast("long").alias("l_orderkey"))
    left = li.select("l_orderkey").unionByName(hot)
    orders = replicate(t("orders"), ["o_orderkey"], REPLICAS,
                       materialize_as="orders_x10d", spark=spark)
    t0 = time.time()
    g = join_key_stats(left, orders, "l_orderkey",
                       "o_orderkey").collect()[0]
    t_j = time.time() - t0
    print(f"SKEW join_key_stats ({left.count()} x {orders.count()}, "
          f"one 100k-hot key): {t_j:.1f}s  "
          f"est_join_rows={g['est_join_rows']} "
          f"max_left_fanout={g['max_left_fanout']}", flush=True)

    from spark_df_profiling_spark.operators.text import pii_redact
    docs = replicate(t("documents"), ["doc_id"], REPLICAS,
                     materialize_as="documents_x10d", spark=spark)
    t0 = time.time()
    n_red = (docs.select(pii_redact("text").alias("r"))
             .agg(F.sum(F.length("r"))).collect()[0][0])
    t_r = time.time() - t0
    print(f"pii_redact docs x{REPLICAS}: {t_r:.1f}s  "
          f"total_redacted_chars={n_red}", flush=True)


def r7e_main() -> None:
    """KS test + skew report at 10x with planted pathologies:

    * ks_2samp on the 6M-row lineitem date halves — the distinct-value
      set is ~1M rows; the prefix-sum machinery must hold;
    * ks_2samp with ONE value carrying 50% of one side (a massive tie
      block — one range partition gets a heavy row; the cumsum stays
      per-partition-parallel);
    * skew_report on a 6.1M-row key column with a 100k-hot key.
    """
    spark = (SparkSession.builder.master("local[32]")
             .config("spark.sql.shuffle.partitions", "32")
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.driver.memory", "32g")
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    t = lambda name: spark.read.parquet(f"{SF_DIR}/{name}.parquet")

    li = replicate(t("lineitem"), ["l_orderkey"], REPLICAS,
                   materialize_as="lineitem_x10e", spark=spark)
    n_li = li.count()

    from spark_df_profiling_spark.operators.drift import ks_2samp
    ref = li.where(F.col("l_orderkey") % 2 == 0)
    new = li.where(F.col("l_orderkey") % 2 == 1)
    t0 = time.time()
    r = ks_2samp(ref, new, "l_extendedprice").collect()[0]
    t_ks = time.time() - t0
    print(f"ks_2samp lineitem x{REPLICAS} halves ({n_li} rows): "
          f"{t_ks:.1f}s  d={r['d_stat']:.4f} n={r['n_ref']}+{r['n_new']}",
          flush=True)

    heavy = new.withColumn(
        "l_extendedprice",
        F.when(F.col("l_orderkey") % 2 == 1, F.lit(12345.0))
        .otherwise(F.col("l_extendedprice")))
    t0 = time.time()
    r2 = ks_2samp(ref, heavy, "l_extendedprice").collect()[0]
    t_h = time.time() - t0
    print(f"SKEW ks_2samp (50% of one side = ONE value): {t_h:.1f}s  "
          f"d={r2['d_stat']:.4f} at={r2['at_value']}", flush=True)

    from spark_df_profiling_spark.operators.frequency import skew_report
    hot = spark.range(100_000).select(
        F.lit(42).cast("long").alias("l_suppkey"))
    keys = li.select("l_suppkey").unionByName(hot)
    t0 = time.time()
    out = skew_report(keys, "l_suppkey", k=3).collect()
    t_s = time.time() - t0
    stats = [x for x in out if x["part"] == "stats"][0]
    print(f"SKEW skew_report ({keys.count()} rows, 100k-hot key): "
          f"{t_s:.1f}s  stats={stats['key']}", flush=True)


def r7f_main() -> None:
    """MMR rerank + weighted sampling + score buckets at 10x:

    * mmr_rerank: 20k-vector corpus (embeddings x10), 10 queries,
      pool=50 — stage 1 is the exact kNN (corpus streams once); stage
      2's Arrow groups are pool x dim regardless of corpus size;
    * weighted_sample_k: 50k docs weighted by n_chars PLUS one row
      with weight 1e9 (must always be drawn; the hot weight is one
      row, not a hot KEY — nothing skews);
    * score_buckets: deciles over 6M lineitem prices (exact and
      approx cut paths).
    """
    spark = (SparkSession.builder.master("local[32]")
             .config("spark.sql.shuffle.partitions", "32")
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.driver.memory", "32g")
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    t = lambda name: spark.read.parquet(f"{SF_DIR}/{name}.parquet")

    emb = replicate(t("embeddings"), ["vec_id"], REPLICAS,
                    materialize_as="embeddings_x10f", spark=spark)
    n_emb = emb.count()
    from spark_df_profiling_spark.operators.similarity import mmr_rerank
    t0 = time.time()
    out = mmr_rerank(emb, emb.where(F.col("vec_id") < 10),
                     k=10, pool=50).count()
    t_m = time.time() - t0
    print(f"mmr_rerank {n_emb}-vector corpus, 10 queries, pool=50: "
          f"{t_m:.1f}s  rows={out}", flush=True)

    docs = replicate(t("documents"), ["doc_id"], REPLICAS,
                     materialize_as="documents_x10f", spark=spark)
    from spark_df_profiling_spark.operators.sampling import (
        score_buckets, weighted_sample_k)
    hot = spark.range(1).select(F.lit(777_777_777).alias("doc_id"),
                                F.lit("hot").alias("text"),
                                F.lit("en").alias("lang"),
                                F.lit("src0").alias("source"),
                                F.lit(1_000_000_000).alias("n_chars"))
    corpus = docs.select("doc_id", "text", "lang", "source",
                         "n_chars").unionByName(hot)
    t0 = time.time()
    got = weighted_sample_k(corpus, "doc_id", "n_chars", k=20).collect()
    t_w = time.time() - t0
    hot_in = any(r["doc_id"] == 777_777_777 for r in got)
    print(f"SKEW weighted_sample_k {corpus.count()} docs + one 1e9 "
          f"weight: {t_w:.1f}s  hot_drawn={hot_in} (MUST be True)",
          flush=True)

    li = replicate(t("lineitem"), ["l_orderkey"], REPLICAS,
                   materialize_as="lineitem_x10f", spark=spark)
    n_li = li.count()
    for exact in (True, False):
        t0 = time.time()
        n_b = (score_buckets(li, "l_extendedprice", n_buckets=10,
                             exact=exact)
               .groupBy("bucket").count().count())
        dt = time.time() - t0
        print(f"score_buckets lineitem x{REPLICAS} ({n_li} rows, "
              f"exact={exact}): {dt:.1f}s  buckets={n_b}", flush=True)


def r7g_main() -> None:
    """Z-order layout at 10x: write cost (the one total shuffle) and
    the per-file span audit on 6M rows, vs the natural layout."""
    import tempfile
    spark = (SparkSession.builder.master("local[32]")
             .config("spark.sql.shuffle.partitions", "32")
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.driver.memory", "32g")
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    t = lambda name: spark.read.parquet(f"{SF_DIR}/{name}.parquet")
    li = replicate(t("lineitem"), ["l_orderkey"], REPLICAS,
                   materialize_as="lineitem_x10g", spark=spark)
    n = li.count()
    from spark_df_profiling_spark.operators.layout import (
        skipping_stats, zorder_write)
    base = tempfile.mkdtemp()
    cols = ["l_partkey", "l_suppkey"]
    t0 = time.time()
    li.repartition(32).write.mode("overwrite").parquet(base + "/nat")
    t_nat = time.time() - t0
    t0 = time.time()
    zorder_write(li, base + "/z", cols, num_files=32, exact=False)
    t_z = time.time() - t0
    s_nat = skipping_stats(spark, base + "/nat", cols).collect()[0]
    s_z = skipping_stats(spark, base + "/z", cols).collect()[0]
    print(f"zorder_write {n} rows: {t_z:.1f}s (natural write "
          f"{t_nat:.1f}s) — spans "
          f"partkey {s_nat['avg_span_l_partkey']:.2f}->"
          f"{s_z['avg_span_l_partkey']:.2f}, "
          f"suppkey {s_nat['avg_span_l_suppkey']:.2f}->"
          f"{s_z['avg_span_l_suppkey']:.2f}", flush=True)


def r8_main() -> None:
    """Round-8 tail-operator rehearsals (VERDICT r7 #6):

    * event_funnel at 10x events with ONE user holding 50% of all rows
      (post-persist-fix: k steps must still cost one scan+shuffle; the
      hot key lands in one task of the key repartition — per-step state
      is one timestamp, so the task is count-bound, not memory-bound);
    * temperature_resample with a source requiring epochs=20 (explode
      amplification: 150k rare rows -> ~3M copies);
    * weighted_sample_k with sub_partitions=4 against 6M rows (phase-2
      rank sees only 4*k rows; 4 validates the bound, not the default);
    * bloom_state/bloom_might_contain at m_bits=2^26 over 6M keys
      (state <= 2^20 word rows — the broadcast-ability edge).
    """
    spark = (SparkSession.builder.master("local[32]")
             .config("spark.sql.shuffle.partitions", "32")
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.driver.memory", "32g")
             .config("spark.sql.legacy.parquet.nanosAsLong", "true")
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    t = lambda name: spark.read.parquet(f"{SF_DIR}/{name}.parquet")

    # -- event_funnel, 1M events, one user = 50% of rows ------------
    from spark_df_profiling_spark.sources import with_event_time
    from spark_df_profiling_spark.streaming import event_funnel
    ev = replicate(t("events"), ["event_id"], REPLICAS,
                   materialize_as="events_x10_r8", spark=spark)
    ev = with_event_time(ev)
    hot = ev.withColumn(
        "user_id",
        F.when(F.pmod(F.xxhash64("event_id"), F.lit(2)) == 0,
               F.lit(424242)).otherwise(F.col("user_id")))
    n_ev = hot.count()
    t0 = time.time()
    rows = event_funnel(hot, ["signup", "view", "purchase"]).collect()
    t_fun = time.time() - t0
    print(f"event_funnel {n_ev} events, 1 user=50%: {t_fun:.1f}s — "
          + ", ".join(f"{r['step']}={r['n_keys']}" for r in rows),
          flush=True)

    # -- temperature_resample, epochs ~= 20 --------------------------
    from spark_df_profiling_spark.operators.sampling import (
        temperature_resample, weighted_sample_k)
    li = replicate(t("lineitem"), ["l_orderkey"], REPLICAS,
                   materialize_as="lineitem_x10_r8", spark=spark)
    n_li = li.count()
    src = li.withColumn(
        "src", F.when(F.pmod(F.xxhash64("l_orderkey", "l_linenumber"),
                             F.lit(40)) == 0, "rare").otherwise("common"))
    t0 = time.time()
    out = (temperature_resample(src, "src",
                                F.concat_ws(":", "l_orderkey",
                                            "l_linenumber"),
                                tau=0.0, target_rows=n_li)
           .groupBy("src").agg(F.count(F.lit(1)).alias("n")).collect())
    t_mix = time.time() - t0
    print(f"temperature_resample tau=0 {n_li} rows: {t_mix:.1f}s — "
          + ", ".join(f"{r['src']}={r['n']}" for r in sorted(
              out, key=lambda r: r['src'])), flush=True)

    # -- weighted_sample_k, sub_partitions=4, k=1000 ------------------
    t0 = time.time()
    n_samp = weighted_sample_k(
        li, F.concat_ws(":", "l_orderkey", "l_linenumber"),
        "l_extendedprice", k=1000, sub_partitions=4).count()
    t_ws = time.time() - t0
    print(f"weighted_sample_k k=1000 sub_partitions=4 on {n_li} rows: "
          f"{t_ws:.1f}s ({n_samp} rows)", flush=True)

    # -- Bloom at m_bits=2^26 over 6M keys ----------------------------
    from spark_df_profiling_spark.operators.dedup import (
        bloom_might_contain, bloom_state)
    m = 1 << 26
    keys = li.select(F.concat_ws(":", "l_orderkey", "l_linenumber",
                                 "l_partkey").alias("doc"))
    half = keys.where(F.pmod(F.xxhash64("doc"), F.lit(2)) == 0)
    t0 = time.time()
    state = bloom_state(half, "doc", m_bits=m).persist()
    n_words = state.count()
    t_bs = time.time() - t0
    t0 = time.time()
    maybe = (bloom_might_contain(keys, state, "doc", m_bits=m)
             .groupBy("might_contain")
             .agg(F.count(F.lit(1)).alias("n")).collect())
    t_bq = time.time() - t0
    state.unpersist()
    stats = {bool(r["might_contain"]): r["n"] for r in maybe}
    n_half = half.count()
    fpp = (stats.get(True, 0) - n_half) / max(n_li - n_half, 1)
    print(f"bloom m=2^26 k=5 on {n_li} keys: state {n_words} words "
          f"{t_bs:.1f}s, query {t_bq:.1f}s, maybe={stats.get(True, 0)} "
          f"(observed fpp {fpp:.4f})", flush=True)


def r8b_main() -> None:
    """Round-8 session-2 rehearsals: the NEW operators at 10x.

    * salted_join vs plain shuffle join under a planted hot key with
      AQE (and broadcast) disabled — the exact regime the operator
      exists for; wall-clock should favor the salted plan;
    * cms_state over 6M distinct keys (state must stay <= depth x
      width rows) + estimate of a 600k batch;
    * int8 quantization + ADC kNN on the 10x embeddings corpus vs the
      float path (same answers gate rides the oracle; here: time).
    """
    spark = (SparkSession.builder.master("local[32]")
             .config("spark.sql.shuffle.partitions", "32")
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.driver.memory", "32g")
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    t = lambda name: spark.read.parquet(f"{SF_DIR}/{name}.parquet")

    # -- salted vs plain join under one hot key, AQE off --------------
    from spark_df_profiling_spark.operators.joins import salted_join
    li = replicate(t("lineitem"), ["l_orderkey"], REPLICAS,
                   materialize_as="lineitem_x10_r8b", spark=spark)
    hot = li.withColumn(
        "jk", F.when(F.pmod(F.xxhash64("l_orderkey", "l_linenumber"),
                            F.lit(2)) == 0, F.lit(1))
        .otherwise(F.pmod(F.xxhash64("l_orderkey"), F.lit(200000))))
    dim = spark.range(200000).select(
        F.col("id").alias("jk"),
        F.md5(F.col("id").cast("string")).alias("attr"))
    n = hot.count()
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        t0 = time.time()
        plain = (hot.join(dim, "jk")
                 .agg(F.count(F.lit(1)).alias("n"),
                      F.max("attr")).collect()[0]["n"])
        t_plain = time.time() - t0
        t0 = time.time()
        salted = (salted_join(hot, dim, "jk", n_salts=16,
                              salt_on=["l_orderkey", "l_linenumber"])
                  .agg(F.count(F.lit(1)).alias("n"),
                       F.max("attr")).collect()[0]["n"])
        t_salt = time.time() - t0
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    assert plain == salted, (plain, salted)
    print(f"salted_join {n} rows, 1 key=50%, AQE+broadcast OFF: "
          f"plain {t_plain:.1f}s -> salted(16) {t_salt:.1f}s "
          f"(rows match: {plain})", flush=True)

    # -- CMS over 6M distinct keys ------------------------------------
    from spark_df_profiling_spark.operators.frequency import (
        cms_estimate, cms_state)
    keys = li.select(F.concat_ws(":", "l_orderkey", "l_linenumber",
                                 "l_partkey").alias("doc"))
    t0 = time.time()
    st = cms_state(keys, "doc", width=1 << 16, depth=4).persist()
    n_cells = st.count()
    t_st = time.time() - t0
    batch = keys.where(F.pmod(F.xxhash64("doc"), F.lit(10)) == 0)
    t0 = time.time()
    over = (cms_estimate(batch, st, "doc", width=1 << 16, depth=4)
            .agg(F.count(F.lit(1)).alias("n"),
                 F.avg("est_count").alias("avg_est")).collect()[0])
    t_q = time.time() - t0
    st.unpersist()
    print(f"cms 2^16x4 over {n} keys: state {n_cells} cells {t_st:.1f}s; "
          f"estimate of {over['n']} rows {t_q:.1f}s "
          f"(avg est {over['avg_est']:.1f} vs true 1 — collision "
          f"overcount visible and bounded)", flush=True)

    # -- int8 ADC search at 10x ---------------------------------------
    from spark_df_profiling_spark.operators.similarity import (
        knn_bruteforce, knn_bruteforce_quantized, quantization_ranges,
        quantize_embeddings)
    emb = replicate(t("embeddings"), ["vec_id"], REPLICAS,
                    materialize_as="embeddings_x10_r8b", spark=spark)
    n_e = emb.count()
    q = emb.where(F.col("vec_id") < 20)
    t0 = time.time()
    n_f = knn_bruteforce(emb, q, k=10).count()
    t_f = time.time() - t0
    ranges = quantization_ranges(emb)
    import tempfile
    qpath = tempfile.mkdtemp() + "/emb_q8.parquet"
    quantize_embeddings(emb, ranges).select(
        "vec_id", "embedding_q8").write.mode("overwrite").parquet(qpath)
    cq = spark.read.parquet(qpath)
    t0 = time.time()
    n_q = knn_bruteforce_quantized(cq, q, ranges, k=10).count()
    t_q8 = time.time() - t0
    import os
    fbytes = sum(os.path.getsize(os.path.join(d, f))
                 for d, _, fs in os.walk(qpath) for f in fs)
    print(f"knn {n_e} vectors: float {t_f:.1f}s ({n_f} rows) -> int8 "
          f"ADC {t_q8:.1f}s ({n_q} rows); q8 corpus on disk "
          f"{fbytes / 1e6:.1f} MB", flush=True)



def r8c_main() -> None:
    """Round-8 session-3 operators at 10x with planted skew:

    * hll_state over ~6M distinct keys (estimate error + state bound);
    * merge_intervals on lineitem x10 with ONE supplier holding 50% of
      all intervals (the per-key serialization bound, measured);
    * fuzzy_pairs_levenshtein over 50k strings where every distinct
      prefix has 10 exact copies (dense gram buckets by construction);
    * winsorize exact vs approx on 6M rows;
    * sessionize + rolling_stats over 2M synthetic events with one
      user holding 50% of them.
    """
    spark = (SparkSession.builder.master("local[32]")
             .config("spark.sql.shuffle.partitions", "32")
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.driver.memory", "32g")
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    t = lambda name: spark.read.parquet(f"{SF_DIR}/{name}.parquet")
    li = replicate(t("lineitem"), ["l_orderkey"], REPLICAS,
                   materialize_as="lineitem_x10_r8c", spark=spark)
    n_li = li.count()

    # -- HLL over ~6M distinct keys ------------------------------------
    from spark_df_profiling_spark.operators.frequency import (
        hll_estimate, hll_state)
    keys = li.select(F.concat_ws(":", "l_orderkey", "l_linenumber",
                                 "l_partkey").alias("doc"))
    true_n = keys.distinct().count()
    t0 = time.time()
    st = hll_state(keys, "doc", p=12).persist()
    occ = st.count()
    est = hll_estimate(st, p=12).collect()[0][0]
    t_h = time.time() - t0
    st.unpersist()
    print(f"hll p=12 over {n_li} rows / {true_n} distinct: "
          f"est {est} (err {abs(est-true_n)/true_n:.3%}), "
          f"{occ} registers, {t_h:.1f}s", flush=True)

    # -- interval merge with a 50% hot supplier ------------------------
    from spark_df_profiling_spark.operators.joins import merge_intervals
    from spark_df_profiling_spark.oracle import epoch_seconds
    s = epoch_seconds(li, "l_shipdate").cast("double")
    iv = li.select(
        F.when(F.pmod(F.xxhash64("l_orderkey", "l_linenumber"),
                      F.lit(2)) == 0, F.lit(1))
        .otherwise(F.pmod(F.xxhash64("l_orderkey"), F.lit(50000)))
        .alias("k"),
        s.alias("s"),
        (s + F.col("l_quantity").cast("double") * 86400.0).alias("e"))
    t0 = time.time()
    spans = merge_intervals(iv, "k", "s", "e").count()
    t_iv = time.time() - t0
    print(f"merge_intervals {n_li} intervals, 1 key=50%: "
          f"{spans} spans, {t_iv:.1f}s", flush=True)

    # -- fuzzy join: 10 exact copies of every prefix -------------------
    from spark_df_profiling_spark.operators.dedup import (
        fuzzy_pairs_levenshtein)
    d = replicate(t("documents").select("doc_id", "text"), ["doc_id"],
                  REPLICAS, materialize_as="docs_x10_r8c", spark=spark)
    fc = d.select("doc_id", F.substring("text", 1, 24).alias("txt"))
    n_f = fc.count()
    t0 = time.time()
    pairs = (fuzzy_pairs_levenshtein(fc, "txt", "doc_id", max_dist=1,
                                     max_gram_bucket=2000)
             .count())
    t_fz = time.time() - t0
    print(f"fuzzy_pairs d<=1 over {n_f} strings "
          f"(every prefix x10, gram cap 2000): {pairs} pairs, "
          f"{t_fz:.1f}s", flush=True)

    # -- winsorize exact vs approx at 6M -------------------------------
    from spark_df_profiling_spark.operators.outliers import winsorize
    t0 = time.time()
    ex = (winsorize(li, ["l_extendedprice", "l_quantity", "l_discount"],
                    0.01, 0.99, exact=True)
          .agg(F.sum("l_extendedprice_w"), F.sum("l_quantity_w"),
               F.sum("l_discount_w")).collect())
    t_ex = time.time() - t0
    t0 = time.time()
    ap = (winsorize(li, ["l_extendedprice", "l_quantity", "l_discount"],
                    0.01, 0.99, exact=False)
          .agg(F.sum("l_extendedprice_w"), F.sum("l_quantity_w"),
               F.sum("l_discount_w")).collect())
    t_ap = time.time() - t0
    print(f"winsorize 3 cols x {n_li} rows: exact {t_ex:.1f}s, "
          f"approx {t_ap:.1f}s", flush=True)

    # -- sessionize + rolling over 2M events, 1 user = 50% -------------
    from spark_df_profiling_spark.operators.groupby import (
        rolling_stats, sessionize)
    ev = spark.range(2_000_000).select(
        F.when(F.col("id") % 2 == 0, F.lit(1))
        .otherwise(F.pmod(F.xxhash64("id"), F.lit(20000))).alias("u"),
        (F.pmod(F.xxhash64("id", F.lit(7)), F.lit(86400 * 30))
         .cast("double")).alias("ts"),
        (F.pmod(F.xxhash64("id", F.lit(9)), F.lit(10000)) / 100.0)
        .alias("v"))
    t0 = time.time()
    n_sess = sessionize(ev, "ts", "u", gap=120.0, agg_cols=["v"]).count()
    t_se = time.time() - t0
    t0 = time.time()
    n_roll = (rolling_stats(ev, "ts", "u", "v", window=3600.0)
              .agg(F.max("roll_count"), F.sum("roll_sum")).collect())
    t_ro = time.time() - t0
    print(f"sessionize 2M events, 1 user=50%: {n_sess} sessions "
          f"{t_se:.1f}s; rolling_stats 1h frame {t_ro:.1f}s "
          f"(hot-user frames max {n_roll[0][0]})", flush=True)


def r9_main() -> None:
    """Round-9 (newly graded r8-buzzer) operators at 10x with planted
    skew:

    * gini_coefficient over 6M rows where ONE value holds 50% of all
      rows (the tie-block rank-sum collapse under maximal tie skew —
      the same value-keyed layout ks_2samp rehearsed);
    * categorical_association over a 10k x 10k-level pair (stresses
      the #cells margin frames: ~6M observed cells, 10k-row margins);
    * autocorr over 2M events with ONE key holding 50% (per-key
      ordering serialization bound, same planting as sessionize);
    * format_patterns over 6M strings with per-row pattern variety.
    """
    spark = (SparkSession.builder.master("local[32]")
             .config("spark.sql.shuffle.partitions", "32")
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.driver.memory", "32g")
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    t = lambda name: spark.read.parquet(f"{SF_DIR}/{name}.parquet")
    li = replicate(t("lineitem"), ["l_orderkey"], REPLICAS,
                   materialize_as="lineitem_x10_r9", spark=spark)
    n_li = li.count()

    # -- gini with a 50% tie block -------------------------------------
    from spark_df_profiling_spark.operators.frequency import (
        format_patterns, gini_coefficient)
    g_in = li.select(
        F.when(F.pmod(F.xxhash64("l_orderkey", "l_linenumber"),
                      F.lit(2)) == 0, F.lit(100.0))
        .otherwise(F.col("l_extendedprice")).alias("x"))
    t0 = time.time()
    g = gini_coefficient(g_in, "x").collect()[0]
    t_g = time.time() - t0
    print(f"gini over {n_li} rows, 1 value=50% ties: gini={g['gini']:.4f} "
          f"n={g['n']} {t_g:.1f}s", flush=True)

    # -- categorical association at 10k x 10k levels -------------------
    from spark_df_profiling_spark.operators.correlation import (
        autocorr, categorical_association)
    wide = li.select(
        F.pmod(F.xxhash64("l_orderkey"), F.lit(10000)).cast("string")
        .alias("a"),
        F.pmod(F.xxhash64("l_partkey", F.lit(3)), F.lit(10000))
        .cast("string").alias("b"))
    t0 = time.time()
    ca = categorical_association(wide, "a", "b").collect()[0]
    t_ca = time.time() - t0
    print(f"catassoc {n_li} rows, {ca['r_levels']}x{ca['c_levels']} "
          f"levels: chi2={ca['chi2']:.0f} V={ca['cramers_v']:.4f} "
          f"MI={ca['mutual_info']:.4f} {t_ca:.1f}s", flush=True)

    # -- autocorr with a 50% hot key -----------------------------------
    ev = spark.range(2_000_000).select(
        F.when(F.col("id") % 2 == 0, F.lit(1))
        .otherwise(F.pmod(F.xxhash64("id"), F.lit(20000))).alias("u"),
        F.col("id").cast("double").alias("ts"),
        (F.pmod(F.xxhash64("id", F.lit(9)), F.lit(10000)) / 100.0)
        .alias("v"))
    t0 = time.time()
    n_ac = autocorr(ev, "ts", "v", "u").count()
    t_ac = time.time() - t0
    print(f"autocorr 2M events, 1 key=50%: {n_ac} keys {t_ac:.1f}s",
          flush=True)

    # -- format patterns over 6M strings -------------------------------
    fin = li.select(
        F.concat(F.col("l_returnflag"), F.lit("#"),
                 F.col("l_orderkey").cast("string"), F.lit("-"),
                 F.col("l_shipdate").cast("string")).alias("s1"),
        F.col("l_extendedprice").cast("string").alias("s2"))
    t0 = time.time()
    n_fp = format_patterns(fin, ["s1", "s2"], k=10).count()
    t_fp = time.time() - t0
    print(f"format_patterns 2 cols x {n_li} rows: {n_fp} rows "
          f"{t_fp:.1f}s", flush=True)


def r9b_main() -> None:
    """Round-9 session-2 operators at 10x:

    * hll_state_by: per-group distinct states over 6M rows with ONE
      group holding 50% (hot-group register bound: <= 4096 rows arrive
      at its reducers per upstream task, never row-scale);
    * minhash signature state build over 50k docs + a 5k batch joined
      against it (the day-2 incremental near-dedup path, xxhash64);
    * canonical_url over 6M synthetic URLs (pure projection).
    """
    spark = (SparkSession.builder.master("local[32]")
             .config("spark.sql.shuffle.partitions", "32")
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.driver.memory", "32g")
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    t = lambda name: spark.read.parquet(f"{SF_DIR}/{name}.parquet")
    li = replicate(t("lineitem"), ["l_orderkey"], REPLICAS,
                   materialize_as="lineitem_x10_r9b", spark=spark)
    n_li = li.count()

    # -- grouped HLL with a 50% hot group ------------------------------
    from spark_df_profiling_spark.operators.frequency import (
        hll_estimate_by, hll_state_by)
    g_in = li.select(
        F.when(F.pmod(F.xxhash64("l_orderkey", "l_linenumber"),
                      F.lit(2)) == 0, F.lit("hot"))
        .otherwise(F.pmod(F.xxhash64("l_partkey"), F.lit(500))
                   .cast("string")).alias("g"),
        F.concat_ws(":", "l_orderkey", "l_linenumber").alias("k"))
    t0 = time.time()
    st = hll_state_by(g_in, "g", ["k"], p=12).persist()
    n_state = st.count()
    ests = hll_estimate_by(st, "g", p=12)
    hot_est = ests.where(F.col("g") == "hot").collect()[0][1]
    n_groups = ests.count()
    t_h = time.time() - t0
    st.unpersist()
    hot_true = g_in.where(F.col("g") == "hot").select("k") \
        .distinct().count()
    print(f"hll_state_by {n_li} rows, 1 group=50%: {n_groups} groups, "
          f"{n_state} state rows, hot est {hot_est} vs true {hot_true} "
          f"(err {abs(hot_est-hot_true)/hot_true:.3%}), {t_h:.1f}s",
          flush=True)

    # -- signature history at 50k docs ---------------------------------
    from spark_df_profiling_spark.operators.dedup import (
        minhash_signature_state, neardup_against_history)
    d = replicate(t("documents").select("doc_id", "text"), ["doc_id"],
                  REPLICAS, materialize_as="docs_x10_r9b", spark=spark)
    n_d = d.count()
    t0 = time.time()
    state = minhash_signature_state(d, "text", "doc_id",
                                    num_hashes=64).persist()
    n_sigs = state.count()
    t_s = time.time() - t0
    batch = (t("documents").select(
        (F.col("doc_id") + 90_000_000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" tail-token")).alias("text")))
    t0 = time.time()
    matches = neardup_against_history(
        batch, state, "text", "doc_id", num_hashes=64,
        rows_per_band=4, min_agreement=0.5,
        max_bucket_size=2000).count()
    t_m = time.time() - t0
    state.unpersist()
    print(f"minhash history: state {n_sigs}/{n_d} sigs {t_s:.1f}s; "
          f"5k-batch join -> {matches} matches {t_m:.1f}s", flush=True)

    # -- canonical_url over 6M URLs ------------------------------------
    from spark_df_profiling_spark.operators.text import canonical_url
    urls = li.select(F.concat(
        F.lit("https://Site"),
        F.pmod(F.xxhash64("l_partkey"), F.lit(1000)).cast("string"),
        F.lit(".example.com/p/"),
        F.col("l_orderkey").cast("string"),
        F.lit("/?utm_source=x&q="),
        F.col("l_linenumber").cast("string"),
        F.lit("&utm_medium=y#frag")).alias("u"))
    t0 = time.time()
    n_cu = (urls.select(canonical_url("u").alias("c"))
            .where(F.col("c").isNotNull()).count())
    t_c = time.time() - t0
    print(f"canonical_url {n_li} urls: {n_cu} canonicalized "
          f"{t_c:.1f}s", flush=True)


def r9c_main() -> None:
    """Round-9 session-3 operators at 10x:

    * pmi_collocations over 50k docs (token-stream shuffles + vocab
      joins at 10x corpus);
    * fd_strength over 6M rows with a hot determinant (50% one value);
    * key_candidates approx screen (6 combos, ONE aggregate) on 6M;
    * corr_state + merge over 6M split into 4 batch states;
    * structure_stats projection over 50k docs.
    """
    spark = (SparkSession.builder.master("local[32]")
             .config("spark.sql.shuffle.partitions", "32")
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.driver.memory", "32g")
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    t = lambda name: spark.read.parquet(f"{SF_DIR}/{name}.parquet")
    li = replicate(t("lineitem"), ["l_orderkey"], REPLICAS,
                   materialize_as="lineitem_x10_r9c", spark=spark)
    n_li = li.count()
    d = replicate(t("documents").select("doc_id", "text"), ["doc_id"],
                  REPLICAS, materialize_as="docs_x10_r9c", spark=spark)
    n_d = d.count()

    from spark_df_profiling_spark.operators.text import (
        pmi_collocations, structure_stats)
    t0 = time.time()
    n_pmi = pmi_collocations(d, "text", k=50, min_count=20).count()
    t_p = time.time() - t0
    print(f"pmi_collocations {n_d} docs: top-{n_pmi} {t_p:.1f}s",
          flush=True)

    from spark_df_profiling_spark.operators.correlation import (
        fd_strength, key_candidates)
    hot = li.select(
        F.when(F.pmod(F.xxhash64("l_orderkey", "l_linenumber"),
                      F.lit(2)) == 0, F.lit("HOT"))
        .otherwise(F.col("l_orderkey").cast("string")).alias("det"),
        F.col("l_returnflag").alias("dep"))
    t0 = time.time()
    fd = fd_strength(hot, "det", "dep").collect()[0]
    t_f = time.time() - t0
    print(f"fd_strength {n_li} rows, det 50% hot: strength="
          f"{fd['strength']:.4f} groups={fd['n_groups']} {t_f:.1f}s",
          flush=True)

    t0 = time.time()
    kc = key_candidates(li, ["l_orderkey", "l_partkey", "l_suppkey"],
                        max_combo=2).collect()
    t_k = time.time() - t0
    print(f"key_candidates approx 6 combos x {n_li} rows (ONE agg): "
          f"{t_k:.1f}s", flush=True)

    from spark_df_profiling_spark.operators.incremental import (
        corr_from_state, corr_merge, corr_state)
    cols = ["l_quantity", "l_extendedprice", "l_discount"]
    t0 = time.time()
    states = [corr_state(li.where(F.col("l_orderkey") % 4 == i), cols)
              for i in range(4)]
    merged = states[0]
    for s in states[1:]:
        merged = corr_merge(merged, s, cols)
    rows = corr_from_state(merged, cols).collect()
    t_c = time.time() - t0
    print(f"corr_state x4 batches + merge over {n_li} rows: "
          f"{len(rows)} pairs {t_c:.1f}s", flush=True)

    t0 = time.time()
    n_st = (structure_stats(d, "text")
            .agg(F.sum(F.when(F.col("st_any"), 1).otherwise(0)))
            .collect()[0][0])
    t_s = time.time() - t0
    print(f"structure_stats {n_d} docs: {n_st} with structure "
          f"{t_s:.1f}s", flush=True)


def r9d_main() -> None:
    """Round-9 session-4 operators at 10x with planted skew:

    * bigram_logprob over 50k docs (the 3-join bigram-stream path);
    * topk_by_group with ONE group holding 50% of 6M rows;
    * rolling_anomaly over 2M events, one user = 50% (hot-key RANGE
      frames with three aggregates);
    * jsd_numeric 4 cols x 6M rows vs psi on the same halves;
    * containment_pairs over 50k docs (banded candidates + set ratios);
    * minhash signature history at 64 hashes re-used from r9b.
    """
    spark = (SparkSession.builder.master("local[32]")
             .config("spark.sql.shuffle.partitions", "32")
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.driver.memory", "32g")
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    t = lambda name: spark.read.parquet(f"{SF_DIR}/{name}.parquet")
    li = replicate(t("lineitem"), ["l_orderkey"], REPLICAS,
                   materialize_as="lineitem_x10_r9d", spark=spark)
    n_li = li.count()
    d = replicate(t("documents").select("doc_id", "text"), ["doc_id"],
                  REPLICAS, materialize_as="docs_x10_r9d", spark=spark)
    n_d = d.count()

    from spark_df_profiling_spark.operators.text import bigram_logprob
    t0 = time.time()
    blp = (bigram_logprob(d, "text", "doc_id")
           .agg(F.avg("blp_mean"), F.count(F.lit(1))).collect()[0])
    t_b = time.time() - t0
    print(f"bigram_logprob {n_d} docs: avg {blp[0]:.3f} over {blp[1]} "
          f"docs {t_b:.1f}s", flush=True)

    from spark_df_profiling_spark.operators.frequency import (
        topk_by_group)
    g_in = li.select(
        F.when(F.pmod(F.xxhash64("l_orderkey", "l_linenumber"),
                      F.lit(2)) == 0, F.lit("hot"))
        .otherwise(F.pmod(F.xxhash64("l_partkey"), F.lit(500))
                   .cast("string")).alias("g"),
        F.pmod(F.xxhash64("l_suppkey"), F.lit(100000)).cast("string")
        .alias("v"))
    t0 = time.time()
    n_gt = topk_by_group(g_in, "g", "v", k=5).count()
    t_g = time.time() - t0
    print(f"topk_by_group {n_li} rows, 1 group=50%, 100k values: "
          f"{n_gt} rows {t_g:.1f}s", flush=True)

    from spark_df_profiling_spark.operators.groupby import (
        rolling_anomaly)
    ev = spark.range(2_000_000).select(
        F.when(F.col("id") % 2 == 0, F.lit(1))
        .otherwise(F.pmod(F.xxhash64("id"), F.lit(20000))).alias("u"),
        F.col("id").cast("double").alias("ts"),
        (F.pmod(F.xxhash64("id", F.lit(9)), F.lit(10000)) / 100.0)
        .alias("v"))
    t0 = time.time()
    n_an = (rolling_anomaly(ev, "ts", "u", "v", window=3600.0)
            .where(F.col("is_anomaly")).count())
    t_a = time.time() - t0
    print(f"rolling_anomaly 2M events, 1 key=50%: {n_an} anomalies "
          f"{t_a:.1f}s", flush=True)

    from spark_df_profiling_spark.operators.drift import jsd_numeric
    from spark_df_profiling_spark.oracle import epoch_seconds
    ep = epoch_seconds(li, "l_shipdate")
    t0 = time.time()
    n_j = jsd_numeric(li.where(ep < 803347200),
                      li.where(ep >= 803347200),
                      ["l_quantity", "l_extendedprice", "l_discount",
                       "l_tax"]).count()
    t_j = time.time() - t0
    print(f"jsd_numeric 4 cols x {n_li} rows: {n_j} rows {t_j:.1f}s",
          flush=True)

    from spark_df_profiling_spark.operators.dedup import (
        containment_pairs)
    t0 = time.time()
    n_c = containment_pairs(d, "text", "doc_id", min_containment=0.9,
                            max_bucket_size=2000).count()
    t_c = time.time() - t0
    print(f"containment_pairs {n_d} docs (every doc x10): {n_c} pairs "
          f"{t_c:.1f}s", flush=True)


def r9e_main() -> None:
    """rolling_stats_bucketed vs the exact per-event frames on the
    SAME 2M-event / 50%-hot-key planting r9d measured at 177s."""
    spark = (SparkSession.builder.master("local[32]")
             .config("spark.sql.shuffle.partitions", "32")
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.driver.memory", "32g")
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    from spark_df_profiling_spark.operators.groupby import (
        rolling_stats_bucketed)
    ev = spark.range(2_000_000).select(
        F.when(F.col("id") % 2 == 0, F.lit(1))
        .otherwise(F.pmod(F.xxhash64("id"), F.lit(20000))).alias("u"),
        F.col("id").cast("double").alias("ts"),
        (F.pmod(F.xxhash64("id", F.lit(9)), F.lit(10000)) / 100.0)
        .alias("v"))
    t0 = time.time()
    out = (rolling_stats_bucketed(ev, "ts", "u", "v", window=3600.0,
                                  buckets_per_window=16)
           .agg(F.count(F.lit(1)), F.max("roll_count"),
                F.max("roll_std")).collect()[0])
    t_b = time.time() - t0
    print(f"rolling_stats_bucketed 2M events, 1 key=50%: {out[0]} "
          f"bucket rows, max frame count {out[1]}, {t_b:.1f}s "
          f"(exact per-event frames with 3 stats: 177s, r9d)",
          flush=True)


def r11_main() -> None:
    """VERDICT r10 item 6: 10x-plus rehearsals for the session-4/5 tail
    that lacked BASELINE.md rows — oov_stats, diversity_stats, rrf_fuse,
    and the two-stage knn_projected_rerank composition (random_projection
    alone was rehearsed in r10; the composition was not).  Planted skew
    in every shape: a 200x-long document for the token explode, a
    50%-hot query for the fusion groupBy."""
    spark = (SparkSession.builder.master("local[32]")
             .config("spark.sql.shuffle.partitions", "32")
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.driver.memory", "32g")
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    from spark_df_profiling_spark.operators.text import oov_stats
    from spark_df_profiling_spark.operators.similarity import (
        diversity_stats, knn_bruteforce, knn_projected_rerank, rrf_fuse)

    # ---- oov_stats: 50k docs (10x sf0.1) + ONE 200x-long document ----
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    big = replicate(docs.select("doc_id", "text"), ["doc_id"], REPLICAS)
    hot = docs.where(F.col("doc_id") == 0).select(
        F.lit(99_999_999).alias("doc_id"),
        F.concat_ws(" ", F.array_repeat(F.col("text"), 200))
        .alias("text"))
    big = big.unionByName(hot)
    vocab = (docs.select(F.explode(F.split("text", " ")).alias("token"))
             .where(F.col("token") != "")
             .groupBy("token").count()
             .orderBy(F.desc("count"), "token").limit(1000)
             .select("token"))
    t0 = time.time()
    row = (oov_stats(big, "text", vocab, "doc_id")
           .agg(F.count(F.lit(1)), F.sum("n_tokens"), F.sum("n_oov"),
                F.max("n_tokens")).collect()[0])
    print(f"oov_stats 50k docs + 200x-long hot doc: {row[0]} docs, "
          f"{row[1]} tokens ({row[2]} OOV, max doc {row[3]} tokens), "
          f"{time.time() - t0:.1f}s", flush=True)

    # ---- synthetic 200k x 64d corpus (deterministic, expression-only)
    # with PLANTED cluster structure (2000 clusters x 100 members,
    # center + 10% noise): uniform random vectors have no neighbor
    # structure at all (every cosine ~0), which makes ANN recall noise
    # by construction — clusters make recall@10 a real measurement.
    def synth(n, id_name, noise_seed):
        cl = F.col("id") % 2000
        vec = F.array(*[
            (((F.pmod(F.xxhash64(cl, F.lit(d)), F.lit(2001))
               - 1000) / 1000.0)
             + ((F.pmod(F.xxhash64(F.col("id"), F.lit(d),
                                   F.lit(noise_seed)), F.lit(2001))
                 - 1000) / 10000.0)).cast("float") for d in range(64)])
        return spark.range(n).select(
            F.col("id").alias(id_name), vec.alias("embedding"))
    corpus = synth(200_000, "vec_id", 7).persist()
    corpus.count()

    # ---- diversity_stats on the 200k corpus --------------------------
    t0 = time.time()
    d = diversity_stats(corpus, sample_k=200).collect()[0]
    print(f"diversity_stats 200k x 64d (sample_k=200): mean_cos "
          f"{d['mean_cos']:.4f}, p_hi {d['p_hi']:.4f}, "
          f"{time.time() - t0:.1f}s", flush=True)

    # ---- knn_projected_rerank: 200k corpus, 100 queries --------------
    # queries share the cluster centers (id%2000 -> first 100 clusters)
    # but carry different noise, so each query's true neighbors are its
    # ~100 cluster-mates — recallable structure
    queries = synth(100, "vec_id", 13).select(
        (F.col("vec_id") + 10_000_000).alias("vec_id"), "embedding")
    t0 = time.time()
    exact = (knn_bruteforce(corpus, queries, k=10)
             .select("query_id", "neighbor_id").collect())
    t_exact = time.time() - t0
    # (an unrolled indexed-dot variant was tried here and measured 5x
    # SLOWER than the HOF — 67.5s vs 12.9s; see knn_bruteforce's
    # docstring and the COVERAGE playbook entry.  Not kept.)
    truth = {(r["query_id"], r["neighbor_id"]) for r in exact}
    for validate in (True, False):
        t0 = time.time()
        rer = (knn_projected_rerank(corpus, queries, in_dim=64,
                                    proj_dim=16, k=10, rerank_k=40,
                                    validate=validate)
               .select("query_id", "neighbor_id").collect())
        t_rer = time.time() - t0
        got = {(r["query_id"], r["neighbor_id"]) for r in rer}
        recall = len(truth & got) / len(truth)
        print(f"knn 200k x 64d, 100 queries, k=10: exact {t_exact:.1f}s;"
              f" projected(16d)+rerank(40, validate={validate}) "
              f"{t_rer:.1f}s, recall@10 {recall:.3f}", flush=True)
    corpus.unpersist()

    # ---- rrf_fuse: two 1M-row rankings, one query = 50% of rows ------
    from pyspark.sql.window import Window

    def ranking(seed):
        base = spark.range(1_000_000).select(
            F.when(F.col("id") % 2 == 0, F.lit(1))
            .otherwise(F.pmod(F.xxhash64("id", F.lit(seed)),
                              F.lit(10_000))).alias("query_id"),
            F.pmod(F.xxhash64("id", F.lit(seed + 100)),
                   F.lit(5_000_000)).alias("doc_id"),
            F.col("id"))
        return base.select(
            "query_id", "doc_id",
            F.row_number().over(Window.partitionBy("query_id")
                                .orderBy("id")).alias("rank"))
    t0 = time.time()
    fused = (rrf_fuse([ranking(1), ranking(2)], id_col="doc_id",
                      query_col="query_id", top_k=20)
             .agg(F.count(F.lit(1)), F.count_distinct("query_id"))
             .collect()[0])
    print(f"rrf_fuse 2 x 1M rows, 10k queries, one query=50%: "
          f"{fused[0]} fused rows over {fused[1]} queries, "
          f"{time.time() - t0:.1f}s", flush=True)


def r11b_main() -> None:
    """Skew rehearsals for the four r11 operators: ewma /
    changepoint_stats on 2M events with one key holding 50% of rows
    (the ordered-per-key bound), knn_classify at 200k corpus x 100
    queries, compaction_plan over a 5M-file manifest with one
    partition holding 50% of files."""
    spark = (SparkSession.builder.master("local[32]")
             .config("spark.sql.shuffle.partitions", "32")
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.driver.memory", "32g")
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    from spark_df_profiling_spark.operators.groupby import (
        changepoint_stats, ewma)
    from spark_df_profiling_spark.operators.layout import (
        compaction_plan)
    from spark_df_profiling_spark.operators.similarity import (
        knn_classify)

    # 2M events, one key = 50% of rows (1M-row ordered hot key).
    # alpha=0.9 keeps the 1M-row key inside the ewma guard
    # (n_max = 600/-ln(0.1) ~ 260 ... too small!) -> per the guard
    # contract a 1M-row key must FAIL ewma loudly; rehearse BOTH the
    # guard firing and the in-bound path on a 200-row/key layout.
    ev = spark.range(2_000_000).select(
        F.when(F.col("id") % 2 == 0, F.lit(1))
        .otherwise(F.pmod(F.xxhash64("id"), F.lit(20000))).alias("u"),
        F.col("id").cast("double").alias("ts"),
        (F.pmod(F.xxhash64("id", F.lit(9)), F.lit(10000)) / 100.0)
        .alias("v"))
    t0 = time.time()
    try:
        # aggregate over the ewma column itself: count(1) would let
        # Catalyst column-prune the whole computation, guard included
        ewma(ev, "ts", "u", "v", alpha=0.1).agg(
            F.avg("ewma")).collect()
        print("ewma hot-key guard DID NOT FIRE (bug)", flush=True)
    except Exception:
        print(f"ewma 1M-row hot key: guard fired as documented "
              f"({time.time() - t0:.1f}s to detect)", flush=True)
    evb = spark.range(2_000_000).select(
        F.pmod(F.col("id"), F.lit(10_000)).alias("u"),
        F.col("id").cast("double").alias("ts"),
        (F.pmod(F.xxhash64("id", F.lit(9)), F.lit(10000)) / 100.0)
        .alias("v"))
    t0 = time.time()
    row = (ewma(evb, "ts", "u", "v", alpha=0.1)
           .agg(F.count(F.lit(1)), F.avg("ewma")).collect()[0])
    print(f"ewma 2M rows / 10k keys x 200: {row[0]} rows, mean ewma "
          f"{row[1]:.2f}, {time.time() - t0:.1f}s", flush=True)
    t0 = time.time()
    row = (changepoint_stats(ev, "ts", "u", "v")
           .agg(F.count(F.lit(1)), F.max("score"),
                F.max("gain")).collect()[0])
    print(f"changepoint 2M events, 1 key=50%: {row[0]} keys, max gain "
          f"{row[2]:.3f}, {time.time() - t0:.1f}s", flush=True)

    # knn_classify: 200k labeled corpus (2000 clusters -> label =
    # cluster % 10), 100 structured queries
    def synth(n, id_name, noise_seed):
        cl = F.col("id") % 2000
        vec = F.array(*[
            (((F.pmod(F.xxhash64(cl, F.lit(d)), F.lit(2001))
               - 1000) / 1000.0)
             + ((F.pmod(F.xxhash64(F.col("id"), F.lit(d),
                                   F.lit(noise_seed)), F.lit(2001))
                 - 1000) / 10000.0)).cast("float") for d in range(64)])
        return spark.range(n).select(
            F.col("id").alias(id_name), vec.alias("embedding"),
            (cl % 10).cast("int").alias("label"))
    corpus = synth(200_000, "vec_id", 7).persist()
    corpus.count()
    queries = synth(100, "vec_id", 13).select(
        (F.col("vec_id") + 10_000_000).alias("vec_id"), "embedding",
        "label")
    t0 = time.time()
    out = knn_classify(corpus, queries, k=10).collect()
    t_kc = time.time() - t0
    truth = {r["vec_id"] % 10: None for r in queries.collect()}
    acc = (sum(1 for r in out if r["label"] == (r["query_id"]
               % 10_000_000) % 2000 % 10) / len(out))
    print(f"knn_classify 200k x 64d corpus, 100 queries, k=10: "
          f"{len(out)} labeled, accuracy {acc:.3f}, {t_kc:.1f}s",
          flush=True)
    corpus.unpersist()

    # compaction_plan: 5M-file manifest, one partition = 50% of files
    files = spark.range(5_000_000).select(
        F.when(F.col("id") % 2 == 0, F.lit("hot"))
        .otherwise((F.pmod(F.xxhash64("id"), F.lit(5000)))
                   .cast("string")).alias("part"),
        F.col("id").alias("fid"),
        (F.pmod(F.xxhash64("id", F.lit(3)), F.lit(256 * 1024 * 1024)))
        .alias("bytes"))
    t0 = time.time()
    row = (compaction_plan(files, "fid", "bytes",
                           512 * 1024 * 1024, ["part"])
           .groupBy("part", "bin")
           .agg(F.sum("bytes").alias("bb"))
           .agg(F.count(F.lit(1)), F.max("bb")).collect()[0])
    print(f"compaction_plan 5M files, 1 partition=50%: {row[0]} bins, "
          f"max bin {row[1] / 2**30:.2f} GiB, {time.time() - t0:.1f}s",
          flush=True)


def r11c_main() -> None:
    """Skew rehearsals for the second r11 batch: stratified_kfold over
    5M rows with one stratum = 50%, cohens_kappa over a 12M-row joined
    pair, label_agreement_stats at a 20k self-kNN audit corpus."""
    spark = (SparkSession.builder.master("local[32]")
             .config("spark.sql.shuffle.partitions", "32")
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.driver.memory", "32g")
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    from spark_df_profiling_spark.operators.correlation import (
        cohens_kappa)
    from spark_df_profiling_spark.operators.sampling import (
        stratified_kfold)
    from spark_df_profiling_spark.operators.similarity import (
        label_agreement_stats)

    rows = spark.range(5_000_000).select(
        F.when(F.col("id") % 2 == 0, F.lit("hot"))
        .otherwise(F.pmod(F.xxhash64("id"), F.lit(1000))
                   .cast("string")).alias("lang"),
        F.col("id").alias("doc_id"))
    t0 = time.time()
    out = (stratified_kfold(rows, "lang", "doc_id", k=5)
           .groupBy("lang", "fold").count()
           .groupBy("lang")
           .agg((F.max("count") - F.min("count")).alias("d"))
           .agg(F.count(F.lit(1)), F.max("d")).collect()[0])
    print(f"stratified_kfold 5M rows, 1 stratum=50%: {out[0]} strata, "
          f"max fold imbalance {out[1]}, {time.time() - t0:.1f}s",
          flush=True)

    pair = spark.range(12_000_000).select(
        F.pmod(F.xxhash64("id"), F.lit(3)).cast("string").alias("a"),
        F.pmod(F.xxhash64("id", F.lit(5)), F.lit(3)).cast("string")
        .alias("b"))
    t0 = time.time()
    r = cohens_kappa(pair, "a", "b").collect()[0]
    print(f"cohens_kappa 12M rows x 3 levels: kappa {r['kappa']:.4f} "
          f"(independent labels -> ~0), {time.time() - t0:.1f}s",
          flush=True)

    def synth(n):
        cl = F.col("id") % 200
        vec = F.array(*[
            (((F.pmod(F.xxhash64(cl, F.lit(d)), F.lit(2001))
               - 1000) / 1000.0)
             + ((F.pmod(F.xxhash64(F.col("id"), F.lit(d), F.lit(7)),
                        F.lit(2001)) - 1000) / 10000.0)).cast("float")
            for d in range(64)])
        return spark.range(n).select(
            F.col("id").alias("vec_id"), vec.alias("embedding"),
            (cl % 10).cast("int").alias("label"))
    corpus = synth(20_000).persist()
    corpus.count()
    t0 = time.time()
    got = (label_agreement_stats(corpus, k=10)
           .agg(F.sum("n"), F.avg("avg_agreement"),
                F.sum("n_suspect")).collect()[0])
    print(f"label_agreement_stats 20k x 64d self-kNN audit: "
          f"{got[0]} screened, mean agreement {got[1]:.3f}, "
          f"{got[2]} suspects, {time.time() - t0:.1f}s", flush=True)
    corpus.unpersist()


def r11e_main() -> None:
    """kaplan_meier at 10M subjects / 10k distinct durations / 10
    cohorts with one cohort holding 50% of subjects."""
    spark = (SparkSession.builder.master("local[32]")
             .config("spark.sql.shuffle.partitions", "32")
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.driver.memory", "32g")
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    from spark_df_profiling_spark.operators.groupby import kaplan_meier
    subj = spark.range(10_000_000).select(
        F.when(F.col("id") % 2 == 0, F.lit("hot"))
        .otherwise(F.pmod(F.xxhash64("id"), F.lit(9)).cast("string"))
        .alias("cohort"),
        F.pmod(F.xxhash64("id", F.lit(3)), F.lit(10_000))
        .cast("double").alias("t"),
        (F.pmod(F.xxhash64("id", F.lit(5)), F.lit(10)) < 7)
        .alias("ev"))
    t0 = time.time()
    row = (kaplan_meier(subj, "t", "ev", "cohort")
           .agg(F.count(F.lit(1)), F.min("survival")).collect()[0])
    print(f"kaplan_meier 10M subjects, 10 cohorts (one=50%), 10k "
          f"durations: {row[0]} curve rows, min S {row[1]:.4f}, "
          f"{time.time() - t0:.1f}s", flush=True)


def r11f_main() -> None:
    """binary_segmentation at 2M events / one key = 50% of rows /
    3 iterations — the iterate-with-localCheckpoint protocol under
    the ordered-per-key bound, with two PLANTED level shifts inside
    the hot key so acceptance fires."""
    spark = (SparkSession.builder.master("local[32]")
             .config("spark.sql.shuffle.partitions", "32")
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.driver.memory", "32g")
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    from spark_df_profiling_spark.operators.groupby import (
        binary_segmentation)
    ev = spark.range(2_000_000).select(
        F.when(F.col("id") % 2 == 0, F.lit(1))
        .otherwise(F.pmod(F.xxhash64("id"), F.lit(20000))).alias("u"),
        F.col("id").cast("double").alias("ts"),
        (F.pmod(F.xxhash64("id", F.lit(9)), F.lit(100)) / 100.0
         + F.when((F.col("id") % 2 == 0) & (F.col("id") > 700_000),
                  10.0).otherwise(0.0)
         + F.when((F.col("id") % 2 == 0) & (F.col("id") > 1_400_000),
                  10.0).otherwise(0.0)).alias("v"))
    t0 = time.time()
    rows = binary_segmentation(ev, "ts", "u", "v",
                               max_changepoints=3,
                               min_gain=0.3).collect()
    hot = sorted((r["iteration"], r["cp_ts"]) for r in rows
                 if r["u"] == 1)
    print(f"binary_segmentation 2M events, 1 key=50%, 2 planted "
          f"shifts, 3 iters: {len(rows)} accepted splits, hot-key "
          f"cps {hot}, {time.time() - t0:.1f}s", flush=True)


def r11g_main() -> None:
    """Evaluation operators at scale: roc_auc over 10M rows with ALL-
    DISTINCT continuous scores (the frozen-boundary prefix path's
    stress — a global-sort recipe would single-task this) plus a
    50%-mass tie block; classification_report at 20M pairs."""
    spark = (SparkSession.builder.master("local[32]")
             .config("spark.sql.shuffle.partitions", "32")
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.driver.memory", "32g")
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    from spark_df_profiling_spark.operators.evaluation import (
        classification_report, roc_auc)
    scored = spark.range(10_000_000).select(
        (F.pmod(F.xxhash64("id"), F.lit(100)) < 30).alias("y"),
        (F.col("id").cast("double")
         + F.pmod(F.xxhash64("id", F.lit(2)), F.lit(1000)) / 1000.0)
        .alias("s"))
    t0 = time.time()
    r = roc_auc(scored, "y", "s").collect()[0]
    print(f"roc_auc 10M rows, ~all-distinct scores: auc {r['auc']:.4f}"
          f" (independent -> ~0.5), {time.time() - t0:.1f}s",
          flush=True)
    tied = spark.range(10_000_000).select(
        (F.pmod(F.xxhash64("id"), F.lit(100)) < 30).alias("y"),
        F.when(F.col("id") % 2 == 0, F.lit(0.5))
        .otherwise(F.col("id").cast("double")).alias("s"))
    t0 = time.time()
    r = roc_auc(tied, "y", "s").collect()[0]
    print(f"roc_auc 10M rows, ONE tie block = 50% of rows: auc "
          f"{r['auc']:.4f}, {time.time() - t0:.1f}s", flush=True)
    pairs = spark.range(20_000_000).select(
        F.pmod(F.xxhash64("id"), F.lit(10)).cast("string").alias("y"),
        F.pmod(F.xxhash64("id", F.lit(3)), F.lit(10)).cast("string")
        .alias("p"))
    t0 = time.time()
    out = classification_report(pairs, "y", "p").collect()
    print(f"classification_report 20M pairs x 10 classes: "
          f"{len(out)} classes, acc "
          f"{out[0]['accuracy']:.4f} (independent -> ~0.1), "
          f"{time.time() - t0:.1f}s", flush=True)


def r11d_main() -> None:
    """ngram_novelty at 50k docs (10x sf0.1) with a planted hot gram:
    one 3-gram injected into EVERY document (worst-case shared-gram
    skew for the flag-back join)."""
    spark = (SparkSession.builder.master("local[32]")
             .config("spark.sql.shuffle.partitions", "32")
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.driver.memory", "32g")
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    from spark_df_profiling_spark.operators.dedup import ngram_novelty
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    big = (replicate(docs.select("doc_id", "text"), ["doc_id"],
                     REPLICAS)
           .select("doc_id",
                   F.concat(F.lit("zyx wvu tsr "), F.col("text"))
                   .alias("text")))
    t0 = time.time()
    row = (ngram_novelty(big, "text", "doc_id", n=3)
           .agg(F.count(F.lit(1)), F.sum("n_ngrams"),
                F.sum("n_shared"), F.avg("novelty")).collect()[0])
    print(f"ngram_novelty 50k docs + one gram in EVERY doc: {row[0]} "
          f"docs, {row[1]} grams ({row[2]} shared, mean novelty "
          f"{row[3]:.4f}), {time.time() - t0:.1f}s", flush=True)


def r12_main() -> None:
    """Keyless kaplan_meier at 10M subjects with ALL-DISTINCT
    continuous durations (VERDICT r11 #1's stress: the distinct-time
    frame IS the row count, which the old partitionBy(lit(1)) window
    funneled through one task; the frozen-boundary protocol must not)."""
    spark = (SparkSession.builder.master("local[32]")
             .config("spark.sql.shuffle.partitions", "32")
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.driver.memory", "32g")
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    from spark_df_profiling_spark.operators.groupby import kaplan_meier
    subj = spark.range(10_000_000).select(
        (F.col("id").cast("double")
         + F.pmod(F.xxhash64("id"), F.lit(1000)) / 1000.0).alias("t"),
        (F.pmod(F.xxhash64("id", F.lit(5)), F.lit(10)) < 7)
        .alias("ev"))
    t0 = time.time()
    row = (kaplan_meier(subj, "t", "ev")
           .agg(F.count(F.lit(1)), F.min("survival"),
                F.max("n_risk")).collect()[0])
    print(f"kaplan_meier KEYLESS 10M subjects, all-distinct "
          f"durations: {row[0]} curve rows, min S {row[1]:.2e}, "
          f"max n_risk {row[2]}, {time.time() - t0:.1f}s", flush=True)


def r12b_main() -> None:
    """Sampled label-agreement audit at 200k x 64d (VERDICT r11 #3):
    the exact audit is O(n^2 d) — 340s at just 20k; the audit_sample_k
    mode screens a deterministic md5 sample against the FULL corpus.
    Planted structure: 2000 tight clusters, label = cluster id % 100,
    so same-cluster neighbors agree; 1-in-50 rows get a flipped label
    (planted mislabels the audit should surface as suspects)."""
    spark = (SparkSession.builder.master("local[32]")
             .config("spark.sql.shuffle.partitions", "32")
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.driver.memory", "32g")
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    from spark_df_profiling_spark.operators.similarity import (
        label_agreement_stats)
    d = 64
    base = spark.range(200_000).select(
        F.col("id").alias("vec_id"),
        F.pmod(F.xxhash64("id"), F.lit(2000)).alias("__c"),
        (F.pmod(F.xxhash64("id", F.lit(7)), F.lit(50)) == 0)
        .alias("__flip"))
    vec = F.transform(
        F.sequence(F.lit(0), F.lit(d - 1)),
        lambda i: (F.pmod(F.xxhash64(F.col("__c").cast("string"),
                                     i.cast("string")), F.lit(1000))
                   / 1000.0
                   + F.pmod(F.xxhash64(F.col("vec_id").cast("string"),
                                       i.cast("string")), F.lit(100))
                   / 5000.0))
    corpus = base.select(
        "vec_id", vec.alias("embedding"),
        F.when(F.col("__flip"),
               F.pmod(F.col("__c") + 1, F.lit(100)))
        .otherwise(F.pmod(F.col("__c"), F.lit(100)))
        .cast("int").alias("label")).localCheckpoint()
    t0 = time.time()
    rows = label_agreement_stats(corpus, k=10,
                                 audit_sample_k=100).collect()
    n = sum(r["n"] for r in rows)
    nsus = sum(r["n_suspect"] for r in rows)
    agree = sum(r["avg_agreement"] * r["n"] for r in rows) / n
    print(f"label_agreement SAMPLED audit, 200k x 64d corpus, "
          f"audit_sample_k=100: {n} screened across {len(rows)} "
          f"labels, mean agreement {agree:.3f}, {nsus} suspects "
          f"(~2% planted mislabels), {time.time() - t0:.1f}s",
          flush=True)


def r12c_main() -> None:
    """exact_substring_spans at 50k docs (10x sf0.1, so EVERY doc has
    an exact duplicate — worst case: every gram repeats and every doc
    is one full-length span) plus one planted paragraph in EVERY doc
    (maximal hot gram for the flag-back join) — the ngram_novelty
    rehearsal shape."""
    spark = (SparkSession.builder.master("local[32]")
             .config("spark.sql.shuffle.partitions", "32")
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.driver.memory", "32g")
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    from spark_df_profiling_spark.operators.dedup import (
        exact_substring_spans)
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    para = ("alpha beta gamma delta epsilon zeta eta theta iota "
            "kappa lambda mu")
    big = (replicate(docs.select("doc_id", "text"), ["doc_id"],
                     REPLICAS)
           .select("doc_id",
                   F.concat(F.lit(para + " "), F.col("text"))
                   .alias("text")))
    t0 = time.time()
    row = (exact_substring_spans(big, n=8, min_count=2,
                                 cross_doc=True)
           .agg(F.count(F.lit(1)).alias("n_spans"),
                F.sum(F.col("span_end") - F.col("span_start"))
                .alias("tok"),
                F.count_distinct("doc_id").alias("docs"))
           .collect()[0])
    print(f"exact_substring_spans 50k docs, EVERY doc duplicated + "
          f"planted paragraph in every doc: {row['n_spans']} spans "
          f"over {row['docs']} docs, {row['tok']} removable tokens, "
          f"{time.time() - t0:.1f}s", flush=True)


def r12d_main() -> None:
    """contaminated_spans + remove_spans at 50k docs: a 100-question
    benchmark, with question text planted into every 10th doc (5k
    contaminated docs — a heavy leak), then the spans surgically cut.
    The planted question is also REPEATED across those docs (every
    planted doc carries the same 100-question pool mod its index), so
    the benchmark-gram probe side has hot hashes."""
    spark = (SparkSession.builder.master("local[32]")
             .config("spark.sql.shuffle.partitions", "32")
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.driver.memory", "32g")
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    from spark_df_profiling_spark.operators.dedup import (
        contaminated_spans, remove_spans)
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    bench = spark.range(100).select(
        F.col("id").alias("qid"),
        F.concat_ws(" ", F.array(*[
            F.concat(F.lit(f"benchq{w} "), F.col("id").cast("string"))
            for w in range(6)])).alias("question"))
    big = (replicate(docs.select("doc_id", "text"), ["doc_id"],
                     REPLICAS)
           .select("doc_id",
                   F.when(F.col("doc_id") % 10 == 0,
                          F.concat(F.col("text"), F.lit(" "),
                                   F.concat_ws(" ", F.array(*[
                                       F.concat(F.lit(f"benchq{w} "),
                                                (F.col("doc_id") % 100)
                                                .cast("string"))
                                       for w in range(6)]))))
                   .otherwise(F.col("text")).alias("text"))
           .localCheckpoint())
    t0 = time.time()
    spans = contaminated_spans(big, bench,
                               bench_text_col="question",
                               n=5).localCheckpoint()
    n_spans = spans.count()
    t_spans = time.time() - t0
    t0 = time.time()
    row = (remove_spans(big, spans)
           .agg(F.sum("n_tokens_removed").alias("rm"),
                F.sum(F.when(F.col("n_tokens_removed") > 0, 1)
                      .otherwise(0)).alias("docs")).collect()[0])
    print(f"contaminated_spans 50k docs vs 100-question benchmark "
          f"(5k planted leaks): {n_spans} spans in {t_spans:.1f}s; "
          f"remove_spans cut {row['rm']} tokens from {row['docs']} "
          f"docs in {time.time() - t0:.1f}s", flush=True)


def r12e_main() -> None:
    """ks_by_group at 2x6M rows with ALL-DISTINCT continuous values
    across 6 groups, one group = 50% of rows and the only one with a
    planted shift — the per-group distinct-value frame is row-sized,
    which a per-group window would single-task; the frozen-boundary
    protocol must spread it."""
    spark = (SparkSession.builder.master("local[32]")
             .config("spark.sql.shuffle.partitions", "32")
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.driver.memory", "32g")
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    from spark_df_profiling_spark.operators.drift import ks_by_group

    def side(seed, shift_hot):
        return spark.range(6_000_000).select(
            F.when(F.col("id") % 2 == 0, F.lit("hot"))
            .otherwise(F.pmod(F.xxhash64("id"), F.lit(5))
                       .cast("string")).alias("g"),
            (F.col("id").cast("double")
             + F.pmod(F.xxhash64("id", F.lit(seed)), F.lit(997))
             / 997.0
             + F.when((F.col("id") % 2 == 0) & F.lit(shift_hot),
                      3_000_000.0).otherwise(0.0)).alias("v"))
    t0 = time.time()
    rows = ks_by_group(side(1, False), side(2, True),
                       "v", "g").collect()
    hot = [r for r in rows if r["g"] == "hot"][0]
    rest = max(r["d_stat"] for r in rows if r["g"] != "hot")
    print(f"ks_by_group 2x6M rows, 6 groups, hot=50% all-distinct "
          f"values + planted shift: hot D {hot['d_stat']:.3f} "
          f"(expect ~0.5), max other D {rest:.4f} (expect ~0), "
          f"{len(rows)} groups, {time.time() - t0:.1f}s", flush=True)


def r12f_main() -> None:
    """stateful_heavy_hitters on a REAL availableNow stream: 2M events,
    one key = 50% of rows, 40 distinct values per key (capacity 64 ->
    exact); verified against the batch groupBy count."""
    import tempfile

    spark = (SparkSession.builder.master("local[32]")
             .config("spark.sql.shuffle.partitions", "32")
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.driver.memory", "32g")
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    from spark_df_profiling_spark.streaming import (
        run_stream_to_memory, stateful_heavy_hitters)
    ev = spark.range(2_000_000).select(
        F.when(F.col("id") % 2 == 0, F.lit(1))
        .otherwise(F.pmod(F.xxhash64("id"), F.lit(10_000)))
        .alias("user_id"),
        F.col("id").alias("tus"),
        F.pmod(F.xxhash64("id", F.lit(3)), F.lit(40)).cast("string")
        .alias("v"))
    path = tempfile.mkdtemp() + "/ev_shh"
    ev.write.mode("overwrite").parquet(path)
    stream = spark.readStream.schema(ev.schema).parquet(path)
    t0 = time.time()
    out = stateful_heavy_hitters(stream, "user_id", "tus", "v",
                                 capacity=64)
    run_stream_to_memory(out, "shh_rehearsal_out",
                         output_mode="update")
    got = {r["value"]: r["count_est"]
           for r in spark.table("shh_rehearsal_out").collect()
           if r["key"] == 1}
    t = time.time() - t0
    want = {r["v"]: r["c"] for r in
            ev.where(F.col("user_id") == 1).groupBy("v")
            .agg(F.count(F.lit(1)).alias("c")).collect()}
    ok = got == want
    print(f"stateful_heavy_hitters 2M events, hot key=50%, 40 values,"
          f" capacity 64: hot-key counters exact match batch = {ok} "
          f"({len(got)} values, {sum(got.values())} events), {t:.1f}s",
          flush=True)
    assert ok


def r12g_main() -> None:
    """Grouped evaluation at scale: grouped roc_auc over 10M rows with
    ALL-DISTINCT scores across 5 groups (one = 50% of rows — a grouped
    window would single-task its 5M-row distinct-score frame);
    fleiss_kappa over 20M ratings (2M items x 10 raters)."""
    spark = (SparkSession.builder.master("local[32]")
             .config("spark.sql.shuffle.partitions", "32")
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.driver.memory", "32g")
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    from spark_df_profiling_spark.operators.correlation import (
        fleiss_kappa)
    from spark_df_profiling_spark.operators.evaluation import roc_auc
    scored = spark.range(10_000_000).select(
        F.when(F.col("id") % 2 == 0, F.lit("hot"))
        .otherwise(F.pmod(F.xxhash64("id"), F.lit(4)).cast("string"))
        .alias("g"),
        (F.pmod(F.xxhash64("id", F.lit(1)), F.lit(100)) < 30)
        .alias("y"),
        (F.col("id").cast("double")
         + F.pmod(F.xxhash64("id", F.lit(2)), F.lit(1000)) / 1000.0)
        .alias("s"))
    t0 = time.time()
    rows = roc_auc(scored, "y", "s", "g").collect()
    hot = [r for r in rows if r["g"] == "hot"][0]
    print(f"grouped roc_auc 10M rows, 5 groups, hot=50% all-distinct "
          f"scores: hot auc {hot['auc']:.4f} (independent -> ~0.5), "
          f"{len(rows)} groups, {time.time() - t0:.1f}s", flush=True)
    ratings = spark.range(20_000_000).select(
        (F.col("id") % 2_000_000).alias("item"),
        F.pmod(F.xxhash64("id", F.lit(5)), F.lit(6)).cast("string")
        .alias("cat"))
    t0 = time.time()
    r = fleiss_kappa(ratings, "item", "cat").collect()[0]
    print(f"fleiss_kappa 20M ratings, 2M items x 10 raters, 6 "
          f"categories: kappa {r['kappa']:.4f} (independent -> ~0), "
          f"{time.time() - t0:.1f}s", flush=True)


def r12h_main() -> None:
    """Round-12 continuation rehearsals: Poisson bootstrap at 10M rows
    (100 replicates = 1e9 hash evals in ONE scan), gains_curve at 10M
    with a 50% tie block straddling bucket boundaries, BPE training on
    an all-unique-words corpus (the histogram-cap worst case),
    krippendorff_alpha at 10M ratings with a 50%-hot item."""
    spark = (SparkSession.builder.master("local[32]")
             .config("spark.sql.shuffle.partitions", "32")
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.driver.memory", "32g")
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    from spark_df_profiling_spark.operators.sampling import (
        bootstrap_ci)
    rows = spark.range(10_000_000).select(
        F.col("id"),
        F.concat(F.lit("g"), F.pmod(F.col("id"), F.lit(5)))
        .alias("g"),
        F.pmod(F.xxhash64("id"), F.lit(1000)).alias("v"))
    t0 = time.time()
    out = bootstrap_ci(rows, "v", "id", n_boot=100, group_col="g",
                       hash_fn="xxhash64").collect()
    print(f"bootstrap_ci 10M rows x 100 replicates grouped: "
          f"{len(out)} groups, "
          f"widths {[round(r.ci_hi - r.ci_lo, 3) for r in out][:3]}, "
          f"{time.time() - t0:.1f}s", flush=True)

    from spark_df_profiling_spark.operators.evaluation import (
        gains_curve)
    # 50% of rows share ONE score (the tie block), rest distinct-ish
    sc = F.when(F.pmod(F.col("id"), F.lit(2)) == 0, F.lit(500.0))         .otherwise(F.pmod(F.xxhash64("id", F.lit(3)),
                          F.lit(1_000_000)).cast("double"))
    gdf = spark.range(10_000_000).select(
        F.concat(F.lit("g"), F.pmod(F.col("id"), F.lit(4)))
        .alias("g"), sc.alias("s"),
        (F.pmod(F.xxhash64("id", F.lit(7)), F.lit(10)) < 3)
        .cast("int").alias("y"))
    t0 = time.time()
    gout = gains_curve(gdf, "y", "s", n_buckets=10,
                       group_col="g").collect()
    print(f"gains_curve 10M rows, 50% tie block, 4 groups: "
          f"{len(gout)} rows, {time.time() - t0:.1f}s", flush=True)

    from spark_df_profiling_spark.operators.text import (
        bpe_pair_counts, bpe_train)
    # worst case: every word unique -> word-type histogram is
    # corpus-sized; the deterministic top-50k cap must hold the line
    docs = spark.range(2_000_000).select(
        F.concat(F.lit("w"), F.col("id").cast("string"), F.lit("x"),
                 F.pmod(F.xxhash64("id"), F.lit(100)).cast("string"),
                 F.lit(" common shared tail")).alias("text"))
    t0 = time.time()
    bp = bpe_pair_counts(docs, "text", k=20).collect()
    t1 = time.time()
    bt = bpe_train(docs, "text", n_merges=5, max_word_types=50_000)
    print(f"bpe 2M all-unique-word docs: pair_counts {len(bp)} rows "
          f"{t1 - t0:.1f}s; train 5 merges (50k-type cap) "
          f"{time.time() - t1:.1f}s -> {[m[3] for m in bt]}",
          flush=True)

    from spark_df_profiling_spark.operators.correlation import (
        krippendorff_alpha)
    # 10M ratings over 1M items, 50% of all ratings on ONE hot item
    kdf = spark.range(10_000_000).select(
        F.when(F.pmod(F.col("id"), F.lit(2)) == 0, F.lit(0))
        .otherwise(F.pmod(F.xxhash64("id"), F.lit(1_000_000)) + 1)
        .alias("item"),
        F.pmod(F.xxhash64("id", F.lit(11)), F.lit(7)).alias("v"))
    for metric in ("nominal", "interval"):
        t0 = time.time()
        r = krippendorff_alpha(kdf, "item", "v", metric).collect()[0]
        print(f"krippendorff {metric} 10M ratings, 50%-hot item: "
              f"alpha {r.alpha:.4f}, items {r.n_items}, "
              f"{time.time() - t0:.1f}s", flush=True)
    spark.stop()


def r12i_main() -> None:
    """Clustering-quality + ordinal-alpha rehearsals: silhouette and
    CH/DB at 2M x 64d x k=16 (per-row cost = k distance folds, the
    kmeans-assignment shape), ordinal krippendorff at 10M ratings with
    the 50%-hot item."""
    spark = (SparkSession.builder.master("local[32]")
             .config("spark.sql.shuffle.partitions", "32")
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.driver.memory", "32g")
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    import random

    from spark_df_profiling_spark.operators.clustering import (
        cluster_quality, silhouette_simplified)
    rng = random.Random(7)
    k, d = 16, 64
    cents = [[rng.uniform(-1, 1) * 5 for _ in range(d)]
             for _ in range(k)]
    vecs = spark.range(2_000_000).select(
        F.transform(F.sequence(F.lit(1), F.lit(d)),
                    lambda i: (F.pmod(F.xxhash64("id", i),
                                      F.lit(1000)).cast("double")
                               / 250.0 - 2.0)).alias("embedding"))
    t0 = time.time()
    sil = silhouette_simplified(vecs, cents).collect()
    t1 = time.time()
    cq = cluster_quality(vecs, cents).collect()[0]
    print(f"silhouette 2M x {d}d x k={k}: {len(sil)} clusters "
          f"{t1 - t0:.1f}s; cluster_quality CH "
          f"{cq.calinski_harabasz:.1f} DB {cq.davies_bouldin:.2f} "
          f"{time.time() - t1:.1f}s", flush=True)

    from spark_df_profiling_spark.operators.correlation import (
        krippendorff_alpha)
    kdf = spark.range(10_000_000).select(
        F.when(F.pmod(F.col("id"), F.lit(2)) == 0, F.lit(0))
        .otherwise(F.pmod(F.xxhash64("id"), F.lit(1_000_000)) + 1)
        .alias("item"),
        F.pmod(F.xxhash64("id", F.lit(11)), F.lit(7)).alias("v"))
    t0 = time.time()
    r = krippendorff_alpha(kdf, "item", "v", "ordinal").collect()[0]
    print(f"krippendorff ordinal 10M ratings, 50%-hot item: "
          f"alpha {r.alpha:.4f}, {time.time() - t0:.1f}s", flush=True)
    spark.stop()


def r13_main() -> None:
    """PCA rehearsal at 2M x 64d: the cheap 130-column mean/variance
    aggregate + the pyspark.ml BLAS Gramian fit (chosen over a
    d(d+1)/2-column SQL aggregate — 1.6s vs 32.3s warm, measured
    back-to-back), and the 64->8 projection (8 GetArrayItem dot
    chains, zero shuffle)."""
    spark = (SparkSession.builder.master("local[32]")
             .config("spark.sql.shuffle.partitions", "32")
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.driver.memory", "32g")
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    from spark_df_profiling_spark.operators.similarity import (
        pca_fit, pca_project)
    d = 64
    vecs = spark.range(2_000_000).select(
        F.transform(F.sequence(F.lit(1), F.lit(d)),
                    lambda i: (F.pmod(F.xxhash64("id", i),
                                      F.lit(1000)).cast("double")
                               / 250.0 - 2.0)).alias("embedding")
    ).localCheckpoint()
    t0 = time.time()
    st = pca_fit(vecs, k=8)
    t1 = time.time()
    out = pca_project(vecs, st, validate=False).agg(
        F.sum(F.get("embedding_pca", 0))).collect()
    print(f"pca_fit 2M x {d}d (ml BLAS Gramian): {t1 - t0:.1f}s, "
          f"top-8 EVR {sum(st['explained_variance_ratio']):.3f}; "
          f"pca_project 64->8: {time.time() - t1:.1f}s "
          f"(sum {out[0][0]:.3f})", flush=True)
    spark.stop()


def r13b_main() -> None:
    """Planted-skew rehearsals for the round-13 operators:
    spearman_matrix at 10M rows with a 50%-hot tie value (the tie
    block must stay ONE distinct row + a hash-join probe, never an
    expansion), bh_fdr at 10M p-values / 1M families (the per-family
    prefix is bounded), isotonic at a 50% tie score, bpe_token_count
    with a 50%-hot stop word (one build row, a million probes)."""
    spark = (SparkSession.builder.master("local[32]")
             .config("spark.sql.shuffle.partitions", "32")
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.driver.memory", "32g")
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    from spark_df_profiling_spark.operators.correlation import (
        spearman_matrix)
    # 50% of rows share ONE value of a; b continuous-ish; c coarse
    sk = spark.range(10_000_000).select(
        F.when(F.col("id") % 2 == 0, F.lit(500.0))
        .otherwise(F.pmod(F.xxhash64("id"), F.lit(1_000_000))
                   .cast("double")).alias("a"),
        F.pmod(F.xxhash64("id", F.lit(1)), F.lit(10_000_000))
        .cast("double").alias("b"),
        F.pmod(F.xxhash64("id", F.lit(2)), F.lit(7))
        .cast("double").alias("c")).localCheckpoint()
    t0 = time.time()
    rows = spearman_matrix(sk, ["a", "b", "c"]).collect()
    print(f"spearman_matrix 10M rows, 50%-hot tie on a: "
          f"{[(r['col_x'], r['col_y'], round(r['spearman'], 4)) for r in rows]}, "
          f"{time.time() - t0:.1f}s", flush=True)

    from spark_df_profiling_spark.operators.drift import bh_fdr
    pv = spark.range(10_000_000).select(
        F.pmod(F.col("id"), F.lit(1_000_000)).alias("fam"),
        (F.pmod(F.xxhash64("id"), F.lit(1_000_000))
         / 1_000_000.0).alias("p"))
    t0 = time.time()
    n_rej = (bh_fdr(pv, "p", alpha=0.05, group_col="fam")
             .where(F.col("bh_rejected")).count())
    print(f"bh_fdr 10M p-values / 1M families: {n_rej} rejections "
          f"(global null: P(any rejection per family) <= alpha, so "
          f"~5% of 1M families rejecting ~1 row IS the FDR "
          f"guarantee), {time.time() - t0:.1f}s", flush=True)

    from spark_df_profiling_spark.operators.evaluation import (
        isotonic_apply, isotonic_fit)
    iso_df = spark.range(10_000_000).select(
        F.when(F.col("id") % 2 == 0, F.lit(50.0))
        .otherwise(F.pmod(F.xxhash64("id"), F.lit(100))
                   .cast("double")).alias("s"),
        (F.pmod(F.xxhash64("id", F.lit(3)), F.lit(100))
         < F.pmod(F.xxhash64("id"), F.lit(100))).cast("double")
        .alias("y"))
    t0 = time.time()
    st = isotonic_fit(iso_df, "y", "s")
    t1 = time.time()
    out = isotonic_apply(iso_df, st, "s").agg(
        F.avg("score_calibrated")).collect()[0][0]
    print(f"isotonic 10M rows, 50%-hot tie score, "
          f"{st['n_distinct']} distinct: fit {t1 - t0:.1f}s, "
          f"apply {time.time() - t1:.1f}s (mean {out:.4f})",
          flush=True)

    from spark_df_profiling_spark.operators.text import (
        bpe_token_count, bpe_train)
    docs = spark.range(2_000_000).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("the the the "),      # 50%-hot words
                 F.lit("w"), F.col("id").cast("string"),
                 F.lit(" tail")).alias("text"))
    t0 = time.time()
    merges = bpe_train(docs, "text", n_merges=5)
    t1 = time.time()
    tot = bpe_token_count(docs, "text", merges, "doc_id").agg(
        F.sum("n_tokens_bpe")).collect()[0][0]
    print(f"bpe train(5)+token_count 2M docs, hot stop word: "
          f"train {t1 - t0:.1f}s, count {time.time() - t1:.1f}s "
          f"({tot} tokens)", flush=True)
    spark.stop()


def r14_main() -> None:
    """isotonic_apply at the fit's boundary CAP (VERDICT r13 #1): a
    strictly-monotone mean-label corpus keeps every distinct score as
    its own PAV block, so the fit emits ~100k boundaries and the apply
    must take the bucketed broadcast-HASH path (~100 residual checks
    per row), never the r13 BroadcastNestedLoopJoin (~100k predicate
    evals per row).  Also times the default when-tree path at 1k
    boundaries."""
    spark = (SparkSession.builder.master("local[32]")
             .config("spark.sql.shuffle.partitions", "32")
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.driver.memory", "32g")
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    from spark_df_profiling_spark.operators.evaluation import (
        isotonic_apply, isotonic_fit)

    for n_distinct in (1_000, 100_000):
        df = spark.range(10_000_000).select(
            F.pmod(F.xxhash64("id"), F.lit(n_distinct))
            .cast("double").alias("s")).withColumn(
            "y", F.col("s") / n_distinct).localCheckpoint()
        t0 = time.time()
        st = isotonic_fit(df, "y", "s")
        t1 = time.time()
        out = isotonic_apply(df, st, "s")
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastNestedLoopJoin" not in plan, "NLJ regressed"
        path = ("bucketed-hash-join" if "BroadcastHashJoin" in plan
                else "when-tree")
        mean = out.agg(F.avg("score_calibrated")).collect()[0][0]
        print(f"isotonic 10M rows, {len(st['boundaries'])} "
              f"boundaries: fit {t1 - t0:.1f}s, apply "
              f"{time.time() - t1:.1f}s via {path} "
              f"(mean {mean:.4f})", flush=True)

    # grouped isotonic at the state cap: 10k groups x 10 distinct
    # scores = 100k (group, score) state rows over 10M input rows;
    # one group is 50%-hot (planted skew) — the distinct frame keeps
    # it at 10 rows regardless
    from spark_df_profiling_spark.operators.evaluation import (
        isotonic_fit_by)
    gdf = spark.range(10_000_000).select(
        F.when(F.col("id") % 2 == 0, F.lit(0))
        .otherwise(F.pmod(F.xxhash64("id", F.lit(7)), F.lit(10_000)))
        .cast("long").alias("g"),
        F.pmod(F.xxhash64("id"), F.lit(10)).cast("double").alias("s"),
        (F.pmod(F.xxhash64("id", F.lit(3)), F.lit(10))
         < F.pmod(F.xxhash64("id"), F.lit(10))).cast("double")
        .alias("y")).localCheckpoint()
    t0 = time.time()
    gst = isotonic_fit_by(gdf, "y", "s", "g", max_group_boundaries=16)
    t1 = time.time()
    gout = isotonic_apply(gdf, gst, "s")
    gplan = gout._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in gplan
    gmean = gout.agg(F.avg("score_calibrated")).collect()[0][0]
    print(f"grouped isotonic 10M rows, {len(gst['groups'])} groups "
          f"(one 50%-hot), 100k state rows: fit {t1 - t0:.1f}s, "
          f"apply {time.time() - t1:.1f}s (mean {gmean:.4f})",
          flush=True)
    spark.stop()


def r14b_main() -> None:
    """Planted-skew rehearsals for the r14 drift family: Mann–Whitney
    at 10M+10M rows with a 50%-hot tie value (the tie stays ONE
    distinct row), the grouped variant at 1M groups (the shared
    frozen-boundary prefix), and the grouped chi-square sweep at 1M
    segments (the count shuffle is #groups x #values rows)."""
    spark = (SparkSession.builder.master("local[32]")
             .config("spark.sql.shuffle.partitions", "32")
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.driver.memory", "32g")
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    from spark_df_profiling_spark.operators.drift import (
        chi2_drift, mannwhitney_2samp, mannwhitney_by_group)

    def corpus(shift, salt):
        return spark.range(10_000_000).select(
            F.when(F.col("id") % 2 == 0, F.lit(500.0)) # 50%-hot tie
            .otherwise(F.pmod(F.xxhash64("id", F.lit(salt)),
                              F.lit(100_000)).cast("double") + shift)
            .alias("v"),
            F.pmod(F.xxhash64("id", F.lit(9)), F.lit(1_000_000))
            .alias("g"),
            # categorical col varies with the corpus salt so the two
            # sides are independent draws (a shared salt would make
            # ref == new exactly and chi2 identically 0)
            F.pmod(F.xxhash64("id", F.lit(salt + 100)), F.lit(5))
            .cast("string").alias("c")).localCheckpoint()

    ref, new = corpus(0.0, 1), corpus(5_000.0, 2)
    t0 = time.time()
    row = mannwhitney_2samp(ref, new, "v").collect()[0]
    print(f"mannwhitney_2samp 10M+10M rows, 50%-hot tie: "
          f"z={row['z']:.2f} p={row['p_value']:.3g}, "
          f"{time.time() - t0:.1f}s", flush=True)

    t0 = time.time()
    n_g = mannwhitney_by_group(ref, new, "v", "g").count()
    print(f"mannwhitney_by_group 10M+10M rows, 1M groups: "
          f"{n_g} group rows, {time.time() - t0:.1f}s", flush=True)

    t0 = time.time()
    n_c = (chi2_drift(ref, new, ["c"], group_col="g")
           .where(F.col("p_chi2") < 0.05).count())
    print(f"chi2_drift grouped 10M+10M rows, 1M segments x 5 vals: "
          f"{n_c} p<.05 segments (~5% of 1M under H0 is the "
          f"contract), {time.time() - t0:.1f}s", flush=True)

    # PQ at production shape: m=8 x k=64 over 64 dims, 2M vectors —
    # encode is the m·k-fold expression-volume stress; ADC scores 16
    # queries against all 2M codes in one scan
    from spark_df_profiling_spark.operators.similarity import (
        pq_adc_topk, pq_encode, pq_fit)
    emb = spark.range(2_000_000).select(
        F.col("id").alias("vec_id"),
        F.array(*[(F.pmod(F.xxhash64("id", F.lit(d)), F.lit(1000))
                   / 500.0 - 1.0) for d in range(64)])
        .alias("embedding")).localCheckpoint()
    t0 = time.time()
    pst = pq_fit(emb, m=8, k=64, n_iter=2, seed=0)
    t1 = time.time()
    codes = pq_encode(emb, pst).localCheckpoint()
    t2 = time.time()
    n_top = pq_adc_topk(codes, emb.where(F.col("vec_id") < 16),
                        pst, k=10).count()
    print(f"pq m=8 k=64 over 2M x 64d: fit {t1 - t0:.1f}s, encode "
          f"{t2 - t1:.1f}s, adc top-10 x16 queries "
          f"{time.time() - t2:.1f}s ({n_top} rows)", flush=True)
    spark.stop()


def r15_main() -> None:
    """Residual-PQ + refine rehearsal at the r14b production shape
    (2M × 64d, m=8 k=64, 16-centroid coarse quantizer): residual
    encode must stay in the indexed-element fast lane (the corr-
    literal spelling — the staged-array form measured 30× slower
    PLAN ANALYSIS at even the tiny oracle shape), and ivf_pq_refine's
    exact re-score joins must stay broadcast-bounded."""
    spark = (SparkSession.builder.master("local[32]")
             .config("spark.sql.shuffle.partitions", "32")
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.driver.memory", "32g")
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    from spark_df_profiling_spark.operators.clustering import (
        kmeans_assign, kmeans_fit)
    from spark_df_profiling_spark.operators.similarity import (
        ivf_pq_refine, ivf_pq_topk, pq_encode, pq_fit,
        pq_reconstruction_stats)
    emb = spark.range(2_000_000).select(
        F.col("id").alias("vec_id"),
        F.array(*[(F.pmod(F.xxhash64("id", F.lit(d)), F.lit(1000))
                   / 500.0 - 1.0) for d in range(64)])
        .alias("embedding")).localCheckpoint()
    t0 = time.time()
    cents = kmeans_fit(emb, k=16, n_iter=2, seed=0,
                       max_fit_rows=100_000)
    t1 = time.time()
    pst = pq_fit(emb, m=8, k=64, n_iter=2, seed=0,
                 residuals_of=cents)
    t2 = time.time()
    codes = pq_encode(kmeans_assign(emb, cents), pst) \
        .localCheckpoint()
    t3 = time.time()
    q = emb.where(F.col("vec_id") < 16)
    n_top = ivf_pq_topk(codes, q, cents, pst, k=10,
                        nprobe=4).count()
    t4 = time.time()
    n_ref = ivf_pq_refine(codes, q, cents, pst, k=10, nprobe=4,
                          rerank_k=100).count()
    t5 = time.time()
    rec = pq_reconstruction_stats(codes, pst).collect()[0]
    print(f"r15 residual IVFPQ 2M x 64d m=8 k=64 coarse-16: coarse "
          f"fit {t1 - t0:.1f}s, residual pq_fit {t2 - t1:.1f}s, "
          f"residual encode {t3 - t2:.1f}s, ivf_pq_topk nprobe=4 "
          f"x16q {t4 - t3:.1f}s ({n_top} rows), ivf_pq_refine "
          f"rerank_k=100 {t5 - t4:.1f}s ({n_ref} rows), "
          f"reconstruction mse {rec['mean_sq_err']:.4f} over "
          f"{time.time() - t5:.1f}s", flush=True)
    spark.stop()


if __name__ == "__main__":
    if "r15" in sys.argv:
        r15_main()
    elif "r14b" in sys.argv:
        r14b_main()
    elif "r14" in sys.argv:
        r14_main()
    elif "r13b" in sys.argv:
        r13b_main()
    elif "r13" in sys.argv:
        r13_main()
    elif "r12g" in sys.argv:
        r12g_main()
    elif "r12i" in sys.argv:
        r12i_main()
    elif "r12h" in sys.argv:
        r12h_main()
    elif "r12f" in sys.argv:
        r12f_main()
    elif "r12e" in sys.argv:
        r12e_main()
    elif "r12d" in sys.argv:
        r12d_main()
    elif "r12c" in sys.argv:
        r12c_main()
    elif "r12b" in sys.argv:
        r12b_main()
    elif "r12" in sys.argv:
        r12_main()
    elif "r11g" in sys.argv:
        r11g_main()
    elif "r11f" in sys.argv:
        r11f_main()
    elif "r11e" in sys.argv:
        r11e_main()
    elif "r11d" in sys.argv:
        r11d_main()
    elif "skew" in sys.argv:
        skew_main()
    elif "r7b" in sys.argv:
        r7b_main()
    elif "r7c" in sys.argv:
        r7c_main()
    elif "r7d" in sys.argv:
        r7d_main()
    elif "r7e" in sys.argv:
        r7e_main()
    elif "r7f" in sys.argv:
        r7f_main()
    elif "r7g" in sys.argv:
        r7g_main()
    elif "r11c" in sys.argv:
        r11c_main()
    elif "r11b" in sys.argv:
        r11b_main()
    elif "r11" in sys.argv:
        r11_main()
    elif "r9e" in sys.argv:
        r9e_main()
    elif "r9d" in sys.argv:
        r9d_main()
    elif "r9c" in sys.argv:
        r9c_main()
    elif "r9b" in sys.argv:
        r9b_main()
    elif "r9" in sys.argv:
        r9_main()
    elif "r8c" in sys.argv:
        r8c_main()
    elif "r8b" in sys.argv:
        r8b_main()
    elif "r8" in sys.argv:
        r8_main()
    else:
        main()

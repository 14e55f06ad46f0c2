"""End-to-end pretraining-data curation pipeline on the engine's
operators — the composed workflow a real 100 TB run would execute,
demonstrated at sf0.001.

Stages (each one a documented operator; every intermediate is a
DataFrame, so Catalyst fuses what it can):

    read → encoding gate → quality funnel → language ID
         → exact dedup → line dedup (boilerplate) → near-dedup (MinHash)
         → benchmark decontamination → PII redaction
         → DSIR-weighted head sample → sequence packing → shard write
         → final profile + drift check vs the raw corpus

Run: ``python examples/pipeline_demo.py`` (exit 0 = every stage ran).
"""

import sys
import tempfile

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession, functions as F

SF_DIR = "/root/testdata/sf0.001"


def main() -> None:
    spark = (SparkSession.builder.master("local[4]")
             .config("spark.sql.shuffle.partitions", "8")
             .config("spark.driver.memory", "6g")
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.ui.enabled", "false")
             .appName("curation-pipeline")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    raw = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    n0 = raw.count()
    print(f"[0] read: {n0} docs")

    # 1. encoding gate — drop mojibake / control-char / lossy-decode docs
    from spark_df_profiling_spark.operators.text import encoding_stats
    enc_ok = encoding_stats(raw, "text", "doc_id") \
        .where(F.col("enc_clean")).select("doc_id")
    docs = raw.join(enc_ok, "doc_id")
    print(f"[1] encoding gate: {docs.count()} kept")

    # 2. quality funnel — sequential C4/FineWeb-style rules with
    #    per-rule drop accounting
    from spark_df_profiling_spark.operators.text import quality_funnel
    toks = F.split(F.col("text"), " ")
    funnel = quality_funnel(docs, [
        ("len_ge_100", F.length("text") >= 100),
        ("tokens_ge_20", F.size(toks) >= 20),
        ("ttr_ge_03",
         F.size(F.array_distinct(toks)) / F.size(toks).cast("double")
         >= 0.3),
    ])
    funnel.show(truncate=False)
    kept = docs.where((F.length("text") >= 100) & (F.size(toks) >= 20)
                      & (F.size(F.array_distinct(toks))
                         / F.size(toks).cast("double") >= 0.3))
    print(f"[2] quality funnel: {kept.count()} kept")

    # 3. language ID (the synthetic corpus carries a lang column; the
    #    operator recomputes it from the text)
    from spark_df_profiling_spark.operators.text import lang_id
    kept = kept.withColumn("lang_pred", lang_id("text"))
    kept.groupBy("lang_pred").count().orderBy("lang_pred").show()

    # 4. canonical dedup (case/whitespace-insensitive exact dedup —
    #    subsumes plain exact dedup on the raw text)
    from spark_df_profiling_spark.operators.text import canonical_dedup
    kept = canonical_dedup(kept, "text", order_col="doc_id")
    print(f"[4] canonical dedup: {kept.count()} kept")

    # 5. cross-document line dedup (CCNet boilerplate removal)
    from spark_df_profiling_spark.operators.dedup import line_dedup
    ld = line_dedup(kept.select("doc_id", "text"), "text", "doc_id",
                    min_count=10)
    kept = (kept.drop("text")
            .join(ld.select("doc_id",
                            F.col("clean_text").alias("text")), "doc_id"))
    print(f"[5] line dedup: {kept.count()} docs, boilerplate stripped")

    # 6. near-dedup: MinHash LSH candidates -> exact-Jaccard verify ->
    #    transitive keep-min
    from spark_df_profiling_spark.operators.dedup import near_dedup_minhash
    kept = near_dedup_minhash(kept, "text", "doc_id",
                              jaccard_max_distance=0.2)
    print(f"[6] near dedup: {kept.count()} kept")

    # 6b. exact-substring dedup (Lee et al. 2022): cut repeated
    #     cross-line spans instead of dropping whole documents
    from spark_df_profiling_spark.operators.dedup import (
        exact_substring_spans, remove_spans)
    spans = exact_substring_spans(kept, "text", "doc_id", n=12,
                                  min_count=2, cross_doc=True)
    cleaned = remove_spans(kept, spans, "text", "doc_id")
    kept = (kept.drop("text")
            .join(cleaned.select("doc_id",
                                 F.col("text_clean").alias("text")),
                  "doc_id")
            .localCheckpoint())   # pipeline barrier: cut the lineage
    print(f"[6b] substring dedup: "
          f"{cleaned.agg(F.sum('n_tokens_removed')).collect()[0][0]} "
          f"repeated-span tokens cut")

    # 7. benchmark decontamination: doc-level screen, then surgical
    #    span-level cuts for the docs worth keeping
    from spark_df_profiling_spark.operators.dedup import (
        contaminated_spans, decontaminate)
    bench = (raw.where(F.col("doc_id") % 97 == 0)
             .select(F.concat_ws(" ", F.slice(F.split("text", " "), 3, 20))
                     .alias("text")))
    kept = decontaminate(kept, bench, n=8).where(~F.col("contaminated"))
    leak_spans = contaminated_spans(kept, bench, "text", "doc_id", n=8)
    kept = (kept.drop("text").join(
        remove_spans(kept, leak_spans, "text", "doc_id")
        .select("doc_id", F.col("text_clean").alias("text")), "doc_id")
        .localCheckpoint())
    print(f"[7] decontaminated: {kept.count()} kept")

    # 8. PII redaction on what ships
    from spark_df_profiling_spark.operators.text import pii_redact
    kept = kept.withColumn("text", pii_redact("text"))
    print("[8] PII redacted")

    # 9. DSIR-weighted head: score against the 'en' target domain and
    #    keep the top tier (weighted_sample_k draws the shippable head)
    from spark_df_profiling_spark.operators.sampling import (
        dsir_logweights, weighted_sample_k)
    w = dsir_logweights(kept, kept.where(F.col("lang") == "en"),
                        "text", "doc_id", n_buckets=1000)
    scored = kept.join(w.select("doc_id",
                                F.exp(F.col("log_w")).alias("imp_w")),
                       "doc_id")
    head = weighted_sample_k(scored, "doc_id", "imp_w",
                             k=min(200, scored.count()))
    print(f"[9] DSIR-weighted head: {head.count()} docs")

    # 10. sequence packing into 512-token shards
    from spark_df_profiling_spark.operators.packing import (
        pack_offsets, shard_summary)
    from spark_df_profiling_spark.operators.text import n_tokens_ws
    packed = pack_offsets(head.withColumn("n_tok", n_tokens_ws("text")),
                          "n_tok", "doc_id", context_len=512)
    shard_summary(head.withColumn("n_tok", n_tokens_ws("text")),
                  "n_tok", "doc_id", context_len=512).show(4)

    # 11. shard write (partitioned parquet — the layout a trainer reads)
    out_dir = tempfile.mkdtemp() + "/shards"
    (packed.select("doc_id", "text", "lang", "shard_id")
     .write.mode("overwrite").partitionBy("shard_id").parquet(out_dir))
    n_shards = (spark.read.parquet(out_dir)
                .select("shard_id").distinct().count())
    print(f"[11] wrote {n_shards} shards to {out_dir}")

    # 12. final profile + drift vs the raw corpus
    from spark_df_profiling_spark import profile
    profile(spark.read.parquet(out_dir).select("lang", "text")) \
        .select("column", "type_class", "n", "n_missing").show()
    from spark_df_profiling_spark.operators.drift import psi_categorical
    psi_categorical(raw, spark.read.parquet(out_dir), ["lang"]).show()

    # 13. persistable run state for the NEXT ingest: exact hash state,
    #     Bloom front-filter, and a count-min frequency sketch — the
    #     three mergeable artifacts a day-2 batch dedups/weighs against
    from spark_df_profiling_spark.operators.dedup import (bloom_state,
                                                          history_hashes)
    from spark_df_profiling_spark.operators.frequency import cms_state
    hist_n = history_hashes(kept, ["text"]).count()
    bloom_n = bloom_state(kept, ["text"]).count()
    cms_n = cms_state(kept.select("lang"), "lang", width=1024).count()
    print(f"[13] run state persisted: {hist_n} exact hashes, "
          f"{bloom_n} bloom words, {cms_n} cms cells")

    # 14. quantize the shipped docs' embedding companion (if present):
    #     int8 corpus for the retrieval index
    from spark_df_profiling_spark.operators.similarity import (
        quantization_ranges, quantize_embeddings)
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    ranges = quantization_ranges(emb)
    q8 = quantize_embeddings(emb, ranges)
    print(f"[14] int8 retrieval corpus: {q8.count()} vectors, "
          f"{len(ranges)} dims of range state")

    print("PIPELINE COMPLETE")
    spark.stop()


if __name__ == "__main__":
    main()

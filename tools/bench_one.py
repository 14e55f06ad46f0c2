"""Isolated best-of-N re-measurement of a single bench query.

The noise protocol (BASELINE.md): before believing any bench delta, run
the query alone in a fresh warm JVM — one process, region-profile
warm-up, then N timed runs, report all and the best.  Usage:

    python tools/bench_one.py <query> [n_runs] [sf_dir]

<query> is a key of bench.py's `benches` dict.
"""

from __future__ import annotations

import json
import os
import sys
import time


def _asof_operator(spark, t):
    """The as-of join itself (bench.py shape) — NOT the oracle slot,
    which since r7 also executes the stream-stream grading harness."""
    from pyspark.sql import functions as F

    from spark_df_profiling_spark.operators.joins import asof_join
    from spark_df_profiling_spark.sources import event_time_micros
    ev = t("events")
    tus = event_time_micros(ev)
    c = ev.where(F.col("event_type") == "click").select(
        "event_id", "user_id", tus.alias("tus"))
    v = ev.where(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_id"), "user_id", tus.alias("tus"))
    asof_join(c, v, on="user_id", left_ts="tus").collect()


def main() -> None:
    name = sys.argv[1]
    n_runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else \
        os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    sys.path.insert(0, "/root/repo")
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # keep session conf aligned with bench.py (openCostInBytes
        # override tried and reverted — see bench.py note); the env
        # hook remains for A/B experiments
        .config("spark.sql.files.openCostInBytes",
                os.environ.get("SPARK_OPEN_COST_BYTES", "4194304"))
        .appName(f"bench-one-{name}")
        .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    from spark_df_profiling_spark import ProfileConfig, profile
    from spark_df_profiling_spark.operators.text import text_features
    from spark_df_profiling_spark.oracle import SPARK_QUERIES

    def t(tbl):
        return spark.read.parquet(f"{sf_dir}/{tbl}.parquet")

    scale_cfg = ProfileConfig()

    fns = {
        "profile_lineitem": lambda: profile(t("lineitem"),
                                            scale_cfg).collect(),
        "profile_core8": lambda: [
            r.variables.collect() for r in __import__(
                "spark_df_profiling_spark.operators.profile",
                fromlist=["profile_many"]).profile_many(
                {n: t(n) for n in ("region", "nation", "customer",
                                   "supplier", "part", "orders",
                                   "lineitem", "events")},
                scale_cfg, max_threads=8).values()],
        "window_profile": lambda: SPARK_QUERIES["window_profile_events"](
            spark, sf_dir).collect(),
        "session_profile": lambda: SPARK_QUERIES["session_profile_events"](
            spark, sf_dir).collect(),
        "asof_join": lambda: _asof_operator(spark, t),
        # the operator itself, NOT the oracle slot (which since r9/r11
        # also grades categorical_association + cohens_kappa) — the
        # same split as _asof_operator vs its slot; bench.py times
        # this exact shape
        "corr_matrix": lambda: __import__(
            "spark_df_profiling_spark.operators.correlation",
            fromlist=["correlation_matrix"]).correlation_matrix(
            t("lineitem"), [
                "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
                "l_quantity", "l_extendedprice", "l_discount", "l_tax"]),
        "range_join": lambda: SPARK_QUERIES["range_join_event_windows"](
            spark, sf_dir).collect(),
        "text_features": lambda: text_features(t("documents"), "text")
        .agg(F.sum("f_n_tokens"), F.avg("f_quality"),
             F.count_distinct("f_fingerprint"),
             F.count_distinct("f_lang")).collect(),
        "profile_documents": lambda: profile(t("documents"),
                                             scale_cfg).collect(),
        "profile_embeddings": lambda: profile(t("embeddings"),
                                              scale_cfg).collect(),
        "knn_bruteforce": lambda: __import__(
            "spark_df_profiling_spark.operators.similarity",
            fromlist=["knn_bruteforce"]).knn_bruteforce(
            t("embeddings"), t("embeddings").where(F.col("vec_id") < 20),
            k=10).collect(),
        "freq_topk": lambda: __import__(
            "spark_df_profiling_spark.operators.frequency",
            fromlist=["topk_frequencies"]).topk_frequencies(
            t("lineitem"), ["l_returnflag", "l_linestatus"], 50),
        "dedup_exact": lambda: __import__(
            "spark_df_profiling_spark.operators.dedup",
            fromlist=["exact_dedup"]).exact_dedup(
            t("documents"), cols=["text"], order_col="doc_id").count(),
        "minhash_neardup": lambda: (lambda out: (
            out.count(),
            # release the per-call feature cache (mirrors bench.py)
            getattr(out, "_minhash_features", None) is not None
            and out._minhash_features.unpersist()))(__import__(
                "spark_df_profiling_spark.operators.dedup",
                fromlist=["minhash_candidates"]).minhash_candidates(
                t("documents"), "text", "doc_id",
                jaccard_max_distance=0.3)),
        "canonical_dedup": lambda: __import__(
            "spark_df_profiling_spark.operators.text",
            fromlist=["canonical_dedup"]).canonical_dedup(
            t("documents"), "text", order_col="doc_id").count(),
        "cms_state": lambda: __import__(
            "spark_df_profiling_spark.operators.frequency",
            fromlist=["cms_state"]).cms_state(
            t("lineitem"), ["l_orderkey", "l_linenumber"],
            width=1 << 16, depth=4).count(),
        "knn_quantized": lambda: (lambda S: (lambda r: (
            S.knn_bruteforce_quantized(
                S.quantize_embeddings(t("embeddings"), r)
                .select("vec_id", "embedding_q8"),
                t("embeddings").where(F.col("vec_id") < 20), r,
                k=10).collect()))(S.quantization_ranges(t("embeddings"))))(
            __import__("spark_df_profiling_spark.operators.similarity",
                       fromlist=["knn_bruteforce_quantized"])),
        "decayed_stats": lambda: (lambda G, O: G.decayed_stats(
            t("lineitem"), O.epoch_seconds(t("lineitem"), "l_shipdate"),
            365.0 * 86400.0, ["l_returnflag"],
            ["l_extendedprice"]).collect())(
            __import__("spark_df_profiling_spark.operators.groupby",
                       fromlist=["decayed_stats"]),
            __import__("spark_df_profiling_spark.oracle",
                       fromlist=["epoch_seconds"])),
        "hll_state": lambda: (lambda FR: FR.hll_estimate(
            FR.hll_state(t("lineitem"),
                         ["l_orderkey", "l_linenumber"]), p=12)
            .collect())(
            __import__("spark_df_profiling_spark.operators.frequency",
                       fromlist=["hll_state"])),
        "merge_intervals": lambda: (lambda J, O: J.merge_intervals(
            t("lineitem").select(
                "l_suppkey",
                O.epoch_seconds(t("lineitem"), "l_shipdate")
                .cast("double").alias("s"),
                (O.epoch_seconds(t("lineitem"), "l_shipdate")
                 .cast("double")
                 + F.col("l_quantity").cast("double") * 86400.0)
                .alias("e")),
            "l_suppkey", "s", "e").count())(
            __import__("spark_df_profiling_spark.operators.joins",
                       fromlist=["merge_intervals"]),
            __import__("spark_df_profiling_spark.oracle",
                       fromlist=["epoch_seconds"])),
        "winsorize": lambda: __import__(
            "spark_df_profiling_spark.operators.outliers",
            fromlist=["winsorize"]).winsorize(
            t("lineitem"), ["l_extendedprice", "l_quantity"],
            0.01, 0.99, exact=False)
            .agg(F.sum("l_extendedprice_w"),
                 F.sum("l_quantity_w")).collect(),
        "fuzzy_pairs": lambda: __import__(
            "spark_df_profiling_spark.operators.dedup",
            fromlist=["fuzzy_pairs_levenshtein"]).fuzzy_pairs_levenshtein(
            t("documents").select(
                "doc_id", F.substring("text", 1, 24).alias("txt")),
            "txt", "doc_id", max_dist=1).count(),
    }
    fn = fns[name]

    # warm-up: JVM, parquet reader, profiling codegen (same as bench.py)
    profile(t("region"), scale_cfg).collect()

    runs = []
    for _ in range(n_runs):
        t0 = time.time()
        fn()
        runs.append(round(time.time() - t0, 3))
    print(json.dumps({"query": name, "runs": runs, "best": min(runs),
                      "sf_dir": sf_dir}))
    spark.stop()


if __name__ == "__main__":
    main()

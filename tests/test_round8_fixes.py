"""Round-8 fixes pinned: event_funnel single-scan, skew_report approx
switch, knn NULL-sim exclusion, psi all-NULL column guard, mmr id dtypes."""

import pytest
from pyspark.sql import functions as F


def _probe_events(spark, acc, n=300, n_users=50):
    """Synthetic events whose ts column passes through a row-counting
    UDF: the accumulator counts how many rows were SCANNED (once per
    source materialization).  Nondeterministic so Catalyst can neither
    duplicate nor collapse the probe expression."""
    probe = F.udf(lambda x: acc.add(1) or x, "long").asNondeterministic()
    return (spark.range(n)
            .select((F.col("id") % n_users).alias("user_id"),
                    F.when(F.col("id") % 3 == 0, "view")
                    .when(F.col("id") % 3 == 1, "click")
                    .otherwise("purchase").alias("event_type"),
                    probe(F.col("id")).alias("ts_long")))


def test_event_funnel_scan_count_independent_of_steps(spark):
    """The r7 verdict's #1 finding: k funnel steps must cost ONE scan of
    the events (persisted after the key repartition), not k scans."""
    from spark_df_profiling_spark.streaming import event_funnel

    acc1 = spark.sparkContext.accumulator(0)
    event_funnel(_probe_events(spark, acc1), ["view"],
                 ts_col="ts_long").collect()
    acc3 = spark.sparkContext.accumulator(0)
    event_funnel(_probe_events(spark, acc3),
                 ["view", "click", "purchase"], ts_col="ts_long").collect()
    assert acc3.value == acc1.value, (
        f"3-step funnel scanned {acc3.value} rows vs 1-step "
        f"{acc1.value} — events re-scanned per step")


def test_event_funnel_unpersists_its_cache(spark):
    from spark_df_profiling_spark.streaming import event_funnel

    before = {r.id() for r in spark.sparkContext._jsc.sc()
              .getRDDStorageInfo()}
    acc = spark.sparkContext.accumulator(0)
    event_funnel(_probe_events(spark, acc), ["view", "click"],
                 ts_col="ts_long").collect()
    after = {r.id() for r in spark.sparkContext._jsc.sc()
             .getRDDStorageInfo()}
    # the k=2 per-step localCheckpoints legitimately stay cached (they
    # back the returned lazy DataFrame); the events cache must NOT —
    # a leak would leave 3+ new entries
    assert len(after - before) <= 2, (
        f"event_funnel leaked a persisted RDD: {len(after - before)} "
        f"new cached RDDs for a 2-step funnel")


def test_skew_report_approx_switch(spark):
    """exact=False must route the p99 through percentile_approx and —
    at accuracy 10000 on a small distinct-key frame, where the sketch
    is exact — produce the identical report."""
    from spark_df_profiling_spark.operators.frequency import skew_report

    # uniform counts: percentile and percentile_approx agree exactly
    # (no interpolation ambiguity) -> reports must be identical
    uni = spark.range(2000).select((F.col("id") % 100).alias("k"))
    exact = {(r["part"], r["key"]): r["cnt"]
             for r in skew_report(uni, "k", k=3, exact=True).collect()}
    approx = {(r["part"], r["key"]): r["cnt"]
              for r in skew_report(uni, "k", k=3, exact=False).collect()}
    assert exact == approx
    # skewed counts: approx p99 is an OBSERVED count (no interpolation)
    # — every other field of the report must still match exactly
    skew = spark.range(2000).select(
        F.when(F.col("id") < 500, 0).otherwise(F.col("id") % 100)
        .alias("hot"))
    ex = skew_report(skew, "hot", k=3, exact=True).collect()
    ap = skew_report(skew, "hot", k=3, exact=False).collect()
    top_ex = {(r["key"], r["cnt"]) for r in ex if r["part"] == "top"}
    top_ap = {(r["key"], r["cnt"]) for r in ap if r["part"] == "top"}
    assert top_ex == top_ap
    s_ex = [r for r in ex if r["part"] == "stats"][0]
    s_ap = [r for r in ap if r["part"] == "stats"][0]
    nk_e, mx_e, p99_e, ppm_e = s_ex["key"].split(":")
    nk_a, mx_a, p99_a, ppm_a = s_ap["key"].split(":")
    assert (nk_e, mx_e, ppm_e) == (nk_a, mx_a, ppm_a)
    assert s_ex["cnt"] == s_ap["cnt"] == 2000
    assert 1 <= int(p99_a) <= int(mx_a)


def test_knn_dot_metric_excludes_null_sims(spark):
    """NULL similarities (dot metric with NULL vectors / NULL elements)
    are excluded — they must not pad the top-k when a query has fewer
    than k valid neighbors."""
    from spark_df_profiling_spark.operators.similarity import knn_bruteforce

    rows = [(1, [1.0, 0.0]), (2, [0.5, 0.5]), (3, None),
            (4, [None, 1.0])]
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    queries = corpus.where(F.col("vec_id") == 1)
    out = knn_bruteforce(corpus, queries, k=10, metric="dot").collect()
    assert {r["neighbor_id"] for r in out} == {2}
    assert all(r["sim"] is not None for r in out)


def test_psi_all_null_column_skipped_not_crashed(spark):
    from spark_df_profiling_spark.operators.drift import (psi_by_group,
                                                          psi_numeric)

    ref = spark.range(100).select(
        (F.col("id") % 2).alias("g"),
        F.col("id").cast("double").alias("x"),
        F.lit(None).cast("double").alias("dead"))
    new = spark.range(100, 200).select(
        (F.col("id") % 2).alias("g"),
        (F.col("id") * 0.5).cast("double").alias("x"),
        F.lit(None).cast("double").alias("dead"))
    got = psi_numeric(ref, new, ["x", "dead"]).collect()
    assert {r["column"] for r in got} == {"x"}
    got_g = psi_by_group(ref, new, "g", ["x", "dead"]).collect()
    assert {r["column"] for r in got_g} == {"x"}
    assert {r["group"] for r in got_g} == {"0", "1"}


def test_mmr_rerank_string_ids(spark):
    """mmr_rerank derives its output schema from the input id dtype —
    string ids must produce the same ranking as the equivalent long-id
    run (modulo the id mapping)."""
    from spark_df_profiling_spark.operators.similarity import mmr_rerank

    vecs = [(i, [float((i * 7 + d * 3) % 11) for d in range(4)])
            for i in range(12)]
    long_c = spark.createDataFrame(
        vecs, "vec_id long, embedding array<double>")
    str_c = spark.createDataFrame(
        [(f"doc-{i:02d}", v) for i, v in vecs],
        "vec_id string, embedding array<double>")
    long_q = long_c.where(F.col("vec_id") == 0)
    str_q = str_c.where(F.col("vec_id") == "doc-00")
    got_long = {(r["rank"], f"doc-{r['neighbor_id']:02d}")
                for r in mmr_rerank(long_c, long_q, k=4, pool=8).collect()}
    got_str = {(r["rank"], r["neighbor_id"])
               for r in mmr_rerank(str_c, str_q, k=4, pool=8).collect()}
    assert got_long == got_str
    assert len(got_str) == 4


def test_mmr_rerank_rejects_unsupported_id_dtype(spark):
    from spark_df_profiling_spark.operators.similarity import mmr_rerank

    c = spark.createDataFrame([(1.5, [1.0])],
                              "vec_id double, embedding array<double>")
    with pytest.raises(ValueError, match="integer/string"):
        mmr_rerank(c, c, k=1, pool=1)

"""Pinning tests for the round-9 ADVICE items fixed in round 10.

Each test reproduces the reported failure mode and pins the fixed
behavior, so a regression reintroducing the defect fails loudly.
"""
import pytest

import pyspark.sql.functions as F


# ---- ADVICE medium: rolling_anomaly_bucketed bucket-id round-trip --
# The baseline bucket used to be re-derived as
# floor(bucket_start / gran) + 1 where bucket_start = __b * gran is a
# DOUBLE; for non-exactly-representable gran (0.1, 0.2, 0.3, 0.7, 1/3)
# the round trip yields __b - 1 for many buckets (gran=0.1 fails at
# __b=43), so events saw NULL z (false warm-up restart) or a baseline
# frame that included their own bucket.  The fix carries the integer
# bucket id through _rolling_stats_bucketed.
def test_rolling_anomaly_bucketed_fractional_gran(spark):
    from spark_df_profiling_spark.operators.groupby import (
        rolling_anomaly_bucketed)
    window, bpw = 1.6, 16            # gran = 0.1 — not representable
    gran = window / bpw
    rows = []
    for b in range(60):              # every bucket 0..59 occupied
        for j in range(5):           # 5 varied values -> std > 0
            rows.append(("u", b * gran + j * 0.02 + 0.001,
                         10.0 + j * 0.1))
    rows.append(("u", 50 * gran + 0.05, 999.0))   # spike in bucket 50
    df = spark.createDataFrame(rows, "k string, ts double, v double")
    got = rolling_anomaly_bucketed(df, "ts", "k", "v", window=window,
                                   buckets_per_window=bpw,
                                   min_points=5).collect()
    # Every event outside the first occupied bucket has an occupied
    # previous bucket with >= 5 varied points: z must NEVER be NULL.
    # The pre-fix code NULLed whole buckets (e.g. 44) where the
    # double round-trip mis-addressed the baseline row.
    for r in got:
        b = int(r["ts"] / gran)
        if b >= 1 and r["v"] != 999.0:
            assert r["z"] is not None, f"NULL z at bucket {b}"
            # steady stream: nothing but the spike may be anomalous
            assert r["is_anomaly"] is False, f"false flag at bucket {b}"
    spike = [r for r in got if r["v"] == 999.0]
    assert len(spike) == 1
    # baseline excludes the spike's own bucket -> huge undiluted z
    assert spike[0]["is_anomaly"] is True
    assert spike[0]["z"] > 100


def test_rolling_stats_bucketed_drops_internal_bucket_col(spark):
    from spark_df_profiling_spark.operators.groupby import (
        rolling_stats_bucketed, _rolling_stats_bucketed)
    df = spark.createDataFrame([("u", 1.0, 2.0)],
                               "k string, ts double, v double")
    pub = rolling_stats_bucketed(df, "ts", "k", "v", 1.6, 16)
    assert "__b" not in pub.columns            # public schema unchanged
    internal = _rolling_stats_bucketed(df, "ts", "k", "v", 1.6, 16)
    assert "__b" in internal.columns
    r = internal.collect()[0]
    # the integer id and the double bucket_start agree at the source
    assert r["__b"] == 10 and r["bucket_start"] == pytest.approx(1.0)


# ---- ADVICE low: label_centroids denominator on ragged embeddings --
def test_label_centroids_ragged_embeddings_rejected(spark):
    from spark_df_profiling_spark.operators.similarity import (
        label_centroids)
    df = spark.createDataFrame(
        [("a", [1.0, 2.0]), ("a", [3.0]), ("b", [5.0, 6.0])],
        "label string, emb array<double>")
    with pytest.raises(Exception, match="(?i)ragged|uniform|length"):
        label_centroids(df, "emb", "label").collect()


def test_label_centroids_null_element_rejected(spark):
    from spark_df_profiling_spark.operators.similarity import (
        label_centroids)
    df = spark.createDataFrame(
        [("a", [1.0, 2.0]), ("a", [3.0, None]), ("b", [5.0, 6.0])],
        "label string, emb array<double>")
    with pytest.raises(Exception, match="(?i)null|ragged|uniform"):
        label_centroids(df, "emb", "label").collect()


def test_label_centroids_n_is_row_count(spark):
    from spark_df_profiling_spark.operators.similarity import (
        label_centroids)
    df = spark.createDataFrame(
        [("a", [1.0, 3.0]), ("a", [3.0, 5.0]), ("b", [2.0, 2.0])],
        "label string, emb array<double>")
    got = {r["label"]: r for r in
           label_centroids(df, "emb", "label").collect()}
    assert got["a"]["n"] == 2 and got["b"]["n"] == 1
    assert got["a"]["centroid"] == pytest.approx([2.0, 4.0])


# ---- ADVICE low: bigram_logprob eager count() at build time --------
def test_bigram_logprob_is_lazy(spark):
    from spark_df_profiling_spark.operators.text import bigram_logprob
    docs = spark.createDataFrame(
        [(1, "the cat sat"), (2, "the cat ran")], "id long, text string")
    # building the plan must not fire a job
    sc = spark.sparkContext
    tracker = sc.statusTracker()
    before = set(tracker.getJobIdsForGroup() or [])
    out = bigram_logprob(docs, "text", "id")
    after = set(tracker.getJobIdsForGroup() or [])
    assert after == before, "bigram_logprob ran a Spark job at build"
    # and the result still computes correctly when asked: V = 4
    # (the, cat, sat, ran), 2 bigrams per doc, add-0.5 smoothing
    import math
    k, V = 0.5, 4.0
    c12 = {("the", "cat"): 2, ("cat", "sat"): 1, ("cat", "ran"): 1}
    c1 = {"the": 2, "cat": 2, "sat": 1, "ran": 1}

    def p(v, w):
        return (c12[(v, w)] + k) / (c1[v] + k * V)

    exp1 = (math.log(p("the", "cat")) + math.log(p("cat", "sat"))) / 2
    exp2 = (math.log(p("the", "cat")) + math.log(p("cat", "ran"))) / 2
    got = {r["id"]: r for r in out.collect()}
    assert got[1]["n_bigrams"] == 2
    assert got[1]["blp_mean"] == pytest.approx(exp1, rel=1e-12)
    assert got[2]["blp_mean"] == pytest.approx(exp2, rel=1e-12)


# ---- ADVICE low: suffix table PSL-fidelity split -------------------
def test_suffix_table_split_is_documented_and_union_unchanged():
    from spark_df_profiling_spark.operators.text import (
        TWO_LEVEL_SUFFIXES, ICANN_TWO_LEVEL_SUFFIXES,
        PSL_PRIVATE_SUFFIXES, PLATFORM_DEDUP_SUFFIXES)
    # default = ICANN + PSL-private + beyond-PSL heuristics, disjoint
    assert TWO_LEVEL_SUFFIXES == (ICANN_TWO_LEVEL_SUFFIXES
                                  + PSL_PRIVATE_SUFFIXES
                                  + PLATFORM_DEDUP_SUFFIXES)
    parts = [set(ICANN_TWO_LEVEL_SUFFIXES), set(PSL_PRIVATE_SUFFIXES),
             set(PLATFORM_DEDUP_SUFFIXES)]
    assert len(set().union(*parts)) == sum(len(p) for p in parts)
    # the entries ADVICE called out as NOT PSL rules live in the
    # heuristics tuple, not in the PSL one
    for s in ("amazonaws.com", "windows.net", "fastly.net",
              "wordpress.com", "substack.com", "squarespace.com"):
        assert s in PLATFORM_DEDUP_SUFFIXES
        assert s not in PSL_PRIVATE_SUFFIXES
    for s in ("github.io", "blogspot.com", "netlify.app"):
        assert s in PSL_PRIVATE_SUFFIXES


def test_registered_domain_strict_psl_vs_default(spark):
    from spark_df_profiling_spark.operators.text import (
        registered_domain, ICANN_TWO_LEVEL_SUFFIXES,
        PSL_PRIVATE_SUFFIXES)
    strict = ICANN_TWO_LEVEL_SUFFIXES + PSL_PRIVATE_SUFFIXES
    df = spark.createDataFrame(
        [("myblog.wordpress.com",), ("user.github.io",),
         ("news.bbc.co.uk",)], "host string")
    dflt = {r["host"]: r["d"] for r in df.select(
        "host", registered_domain("host").alias("d")).collect()}
    spsl = {r["host"]: r["d"] for r in df.select(
        "host",
        registered_domain("host", two_level=strict).alias("d"))
        .collect()}
    # heuristic entry: default keeps per-blog granularity, strict-PSL
    # rolls up to the corporate domain
    assert dflt["myblog.wordpress.com"] == "myblog.wordpress.com"
    assert spsl["myblog.wordpress.com"] == "wordpress.com"
    # real PSL rules behave identically in both tables
    for h, want in (("user.github.io", "user.github.io"),
                    ("news.bbc.co.uk", "bbc.co.uk")):
        assert dflt[h] == want and spsl[h] == want


# ---- ADVICE low: grptop oracle NULL-source alignment ---------------
def test_grptop_oracle_sql_filters_null_source():
    import __spark_entry__ as entry
    sql = entry.oracle_sql()["freq_topk"]
    seg = sql[sql.index("'grptop'"):]
    seg = seg[:seg.index("UNION ALL")]
    assert "source IS NOT NULL" in seg


# ---- round-10 new op: leakage_safe_split ----------------------------
def test_leakage_safe_split_groups_never_straddle(spark):
    from spark_df_profiling_spark.operators.sampling import (
        hash_split, leakage_safe_split)
    # 60 docs; chain pairs 0-1-2, 10-11, and a transitive bridge
    # 20-21, 21-22 (so 20..22 is one component via propagation)
    rows = [(i, f"doc {i}") for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (10, 11), (20, 21), (21, 22)],
        "id_a long, id_b long")
    w = {"train": 0.5, "val": 0.25, "test": 0.25}
    got = leakage_safe_split(df, pairs, "doc_id", w, seed=3).collect()
    by_id = {r["doc_id"]: r for r in got}
    # components share a split and carry the min-id representative
    for comp in ([0, 1, 2], [10, 11], [20, 21, 22]):
        splits = {by_id[i]["split"] for i in comp}
        assert len(splits) == 1, f"component {comp} straddles {splits}"
        assert {by_id[i]["split_group"] for i in comp} == {comp[0]}
    # singletons: same assignment as plain hash_split on the id
    plain = {r["doc_id"]: r["split"] for r in
             hash_split(df, "doc_id", w, seed=3).collect()}
    linked = {0, 1, 2, 10, 11, 20, 21, 22}
    for i in range(60):
        if i not in linked:
            assert by_id[i]["split"] == plain[i]
            assert by_id[i]["split_group"] == i


def test_leakage_safe_split_null_id_and_group_col(spark):
    from spark_df_profiling_spark.operators.sampling import (
        leakage_safe_split)
    df = spark.createDataFrame([(1, "a"), (None, "b")],
                               "doc_id long, text string")
    pairs = spark.createDataFrame([], "id_a long, id_b long")
    got = {r["text"]: r for r in leakage_safe_split(
        df, pairs, "doc_id", {"train": 0.9, "test": 0.1}, seed=1,
        null_split="quarantine").collect()}
    assert got["b"]["split"] == "quarantine"
    out = leakage_safe_split(df, pairs, "doc_id",
                             {"train": 1.0}, group_col=None)
    assert "split_group" not in out.columns


# ---- round-10 new op: event_gaps -------------------------------------
def test_event_gaps_matches_python(spark):
    from spark_df_profiling_spark.operators.groupby import event_gaps
    rows = [("a", 0.0), ("a", 5.0), ("a", 5.0), ("a", 12.0),
            ("b", 100.0),                       # single event: no gaps
            ("c", 7.0), ("c", 3.0),             # out of order input
            (None, 1.0), ("d", None)]           # dropped rows
    df = spark.createDataFrame(rows, "k string, ts double")
    got = {r["k"]: r for r in event_gaps(df, "ts", "k").collect()}
    assert set(got) == {"a", "b", "c"}
    a = got["a"]
    assert a["n_events"] == 4 and a["n_gaps"] == 3
    assert a["min_gap"] == 0.0 and a["max_gap"] == 7.0
    assert a["mean_gap"] == pytest.approx(4.0)   # (12-0)/3
    assert a["first_ts"] == 0.0 and a["last_ts"] == 12.0
    assert a["staleness"] == pytest.approx(88.0)  # vs corpus max 100
    b = got["b"]
    assert b["n_events"] == 1 and b["n_gaps"] == 0
    assert b["min_gap"] is None and b["mean_gap"] is None
    assert b["staleness"] == pytest.approx(0.0)
    c = got["c"]
    assert c["min_gap"] == 4.0 and c["max_gap"] == 4.0


def test_event_gaps_single_key_shuffle(spark):
    from spark_df_profiling_spark.operators.groupby import event_gaps
    df = spark.createDataFrame([("a", 1.0)], "k string, ts double")
    plan = event_gaps(df, "ts", "k")._jdf.queryExecution() \
        .executedPlan().toString()
    # one exchange for the key (window + groupBy share it) + the
    # single-row broadcast for the corpus watermark — never a second
    # hash exchange on the key
    import re
    n_hash_ex = len(re.findall(r"Exchange hashpartitioning", plan))
    assert n_hash_ex <= 1, plan


# ---- round-10 new op: grouped_quantiles ------------------------------
def test_grouped_quantiles_matches_python(spark):
    from spark_df_profiling_spark.operators.groupby import (
        grouped_quantiles)
    import statistics
    rows = ([("a", float(v)) for v in range(1, 11)]
            + [("b", float(v * v)) for v in range(1, 6)]
            + [("b", None), ("c", None)])
    df = spark.createDataFrame(rows, "g string, v double")
    got = {r["g"]: r for r in grouped_quantiles(
        df, "g", "v", probs=(0.25, 0.5, 0.999)).collect()}
    for g, vals in (("a", [float(v) for v in range(1, 11)]),
                    ("b", [1.0, 4.0, 9.0, 16.0, 25.0])):
        qs = statistics.quantiles(vals, n=1000, method="inclusive")
        assert got[g]["q25"] == pytest.approx(qs[249], rel=1e-12)
        assert got[g]["q50"] == pytest.approx(qs[499], rel=1e-12)
        assert got[g]["q99_9"] == pytest.approx(qs[998], rel=1e-12)
    assert got["c"]["q50"] is None          # all-NULL group
    # approx mode runs and is close on these tiny groups
    ap = {r["g"]: r for r in grouped_quantiles(
        df, "g", "v", probs=(0.5,), exact=False).collect()}
    assert ap["a"]["q50"] == pytest.approx(got["a"]["q50"], abs=1.0)
    with pytest.raises(ValueError):
        grouped_quantiles(df, [], "v")
    with pytest.raises(ValueError):
        grouped_quantiles(df, "g", "v", probs=(1.5,))
    with pytest.raises(ValueError):
        grouped_quantiles(df, "g", "v", probs=(0.5, 0.5))


# ---- round-10 new op: standardize_embeddings -------------------------
def test_standardize_embeddings_zero_mean_unit_std(spark):
    from spark_df_profiling_spark.operators.similarity import (
        standardize_embeddings, standardize_stats)
    import statistics
    import random
    random.seed(3)
    pts = [[random.gauss(5, 2), random.gauss(-1, 0.1), 7.0]
           for _ in range(50)]                    # dim 2 constant
    df = spark.createDataFrame(
        [(i, p) for i, p in enumerate(pts)],
        "vec_id long, embedding array<double>")
    stats = standardize_stats(df)
    assert stats[2][1] == 0.0                     # constant dim
    out = standardize_embeddings(df, stats).collect()
    cols = list(zip(*[r["embedding_std"] for r in out]))
    for i in (0, 1):
        assert statistics.fmean(cols[i]) == pytest.approx(0.0,
                                                          abs=1e-9)
        assert statistics.stdev(cols[i]) == pytest.approx(1.0,
                                                          rel=1e-9)
    assert set(cols[2]) == {0.0}                  # σ=0 -> zeros
    # NULL vector passthrough
    df2 = spark.createDataFrame([(1, None)],
                                "vec_id long, embedding array<double>")
    assert standardize_embeddings(df2, stats).collect()[0][
        "embedding_std"] is None
    with pytest.raises(ValueError):
        standardize_embeddings(df, [])


# ---- round-10 new op: partition_advisor ------------------------------
def test_partition_advisor_stats_and_flags(spark):
    from spark_df_profiling_spark.operators.layout import (
        partition_advisor)
    # col g: sizes 8, 2, 2 (skew 2.0); col h: 6 x size 2 (uniform)
    rows = ([("a", i % 2, 0) for i in range(8)]
            + [("b", 2, 1), ("b", 3, 1), ("c", 4, 2), ("c", 5, 2)])
    df = spark.createDataFrame(
        [(g, h, x) for (g, h, x) in
         [(r[0], r[1], r[2]) for r in rows]],
        "g string, h long, x long")
    got = {r["candidate"]: r for r in partition_advisor(
        df, ["g", "h"], row_bytes=1024 * 1024,
        target_file_mb=4.0).collect()}
    gr = got["g"]
    assert gr["n_partitions"] == 3
    assert gr["min_rows"] == 2 and gr["max_rows"] == 8
    assert gr["p50_rows"] == 2.0
    assert gr["skew"] == pytest.approx(2.0)
    assert gr["est_mb_max"] == pytest.approx(8.0)
    assert gr["smallfile_risk"] is False     # p50 2MB >= 4/8 MB
    assert gr["skew_risk"] is False
    hr = got["h"]
    # h sizes: {0:4, 1:4, 2:1, 3:1, 4:1, 5:1}
    assert hr["n_partitions"] == 6 and hr["max_rows"] == 4
    assert hr["skew"] == pytest.approx(4 / 2)
    with pytest.raises(ValueError):
        partition_advisor(df, [])
    with pytest.raises(ValueError):
        partition_advisor(df, ["g"], row_bytes=0)


def test_partition_advisor_null_partition_counts(spark):
    from spark_df_profiling_spark.operators.layout import (
        partition_advisor)
    df = spark.createDataFrame([("a",), (None,), (None,)], "g string")
    r = partition_advisor(df, ["g"]).collect()[0]
    assert r["n_partitions"] == 2 and r["max_rows"] == 2


# ---- round-10 new op: grouped_outlier_stats --------------------------
def test_grouped_outlier_stats_matches_python(spark):
    from spark_df_profiling_spark.operators.groupby import (
        grouped_outlier_stats)
    import statistics
    vals_a = [float(v) for v in range(1, 12)] + [100.0, -50.0]
    vals_b = [5.0] * 6 + [9.0]          # zero-IQR bulk + one outlier
    rows = ([("a", v) for v in vals_a] + [("b", v) for v in vals_b]
            + [("a", None)])
    df = spark.createDataFrame(rows, "g string, v double")
    got = {r["g"]: r for r in
           grouped_outlier_stats(df, "g", "v").collect()}
    qa = statistics.quantiles(vals_a, n=4, method="inclusive")
    iqr = qa[2] - qa[0]
    a = got["a"]
    assert a["n"] == len(vals_a) + 1          # NULL row counted in n
    assert a["q1"] == pytest.approx(qa[0], rel=1e-12)
    assert a["q3"] == pytest.approx(qa[2], rel=1e-12)
    assert a["lo_fence"] == pytest.approx(qa[0] - 1.5 * iqr)
    assert a["n_out_lo"] == 1 and a["n_out_hi"] == 1
    assert a["p_out"] == pytest.approx(2 / 14)
    b = got["b"]
    assert b["iqr"] == pytest.approx(0.0)
    assert b["n_out_hi"] == 1 and b["n_out_lo"] == 0   # no div error
    with pytest.raises(ValueError):
        grouped_outlier_stats(df, "g", "v", k=-1)


# ---- round-10 new op: stateful_anomaly (streaming) -------------------
def test_stateful_anomaly_matches_prefix_python(spark, tmp_path):
    from spark_df_profiling_spark.streaming import (
        run_stream_to_memory, stateful_anomaly)
    import statistics
    rows = ([(1, i * 10, 5.0 + (i % 4)) for i in range(12)]
            + [(1, 200, 500.0)]              # spike for key 1
            + [(2, i * 7, 2.0) for i in range(8)])  # constant key
    df = spark.createDataFrame(rows, "user_id long, tus long, value double")
    path = str(tmp_path / "ev")
    df.coalesce(1).write.mode("overwrite").parquet(path)
    stream = (spark.readStream.schema(df.schema).parquet(path))
    out = stateful_anomaly(stream, "user_id", "tus", "value",
                           z_threshold=3.0, min_points=5)
    run_stream_to_memory(out, "sanom_test_out", output_mode="update")
    got = {(r["key"], r["tus"]): r
           for r in spark.table("sanom_test_out").collect()}
    # python prefix replay
    by_key = {}
    for k, t, v in sorted(rows, key=lambda r: (r[0], r[1])):
        hist = by_key.setdefault(k, [])
        r = got[(k, t)]
        assert r["n_before"] == len(hist)
        if len(hist) >= 5 and len(set(hist)) > 1:
            exp = (v - statistics.fmean(hist)) / statistics.stdev(hist)
            assert r["z"] == pytest.approx(exp, rel=1e-9)
            assert r["is_anomaly"] == (abs(exp) > 3.0)
        else:
            assert r["z"] is None and r["is_anomaly"] is None
        hist.append(v)
    # the spike is flagged; constant-baseline key never errors
    assert got[(1, 200)]["is_anomaly"] is True
    assert all(got[(2, i * 7)]["z"] is None for i in range(8))
    with pytest.raises(ValueError):
        stateful_anomaly(stream, min_points=1)


def test_stateful_anomaly_string_keys_stay_separate(spark, tmp_path):
    """ADVICE r11: the r10 version cast key_col to long, so string user
    ids all cast to NULL and shared ONE Welford state.  String keys must
    keep their identity (separate states) and unsupported key types must
    raise instead of silently merging."""
    from spark_df_profiling_spark.streaming import (
        run_stream_to_memory, stateful_anomaly)
    rows = ([("alice", i * 10, 1.0 + (i % 3)) for i in range(8)]
            + [("alice", 100, 900.0)]           # spike only for alice
            + [("bob", i * 10, 50.0 + (i % 3)) for i in range(8)]
            + [("bob", 100, 51.0)])             # in-range for bob
    df = spark.createDataFrame(rows, "user_id string, tus long, value double")
    path = str(tmp_path / "ev_str")
    df.coalesce(1).write.mode("overwrite").parquet(path)
    stream = spark.readStream.schema(df.schema).parquet(path)
    out = stateful_anomaly(stream, "user_id", "tus", "value",
                           z_threshold=3.0, min_points=5)
    assert dict(out.dtypes)["key"] == "string"
    run_stream_to_memory(out, "sanom_str_out", output_mode="update")
    got = {(r["key"], r["tus"]): r
           for r in spark.table("sanom_str_out").collect()}
    # keys kept their identity (no NULL-merged state)
    assert {k for k, _ in got} == {"alice", "bob"}
    # alice's spike scored against ALICE's baseline only
    assert got[("alice", 100)]["is_anomaly"] is True
    assert got[("alice", 100)]["n_before"] == 8
    # bob's last point is in-range FOR BOB (would be a huge z if the
    # states had merged with alice's 1..3 baseline)
    assert got[("bob", 100)]["is_anomaly"] is False
    # unsupported key types raise loudly
    import pytest as _pt
    arr_stream = (spark.readStream.schema(df.schema).parquet(path)
                  .withColumn("user_id",
                              F.array(F.col("user_id"))))
    with _pt.raises(TypeError, match="unsupported"):
        stateful_anomaly(arr_stream, "user_id", "tus", "value")

"""Round-11 operators: ewma, changepoint_stats, knn_classify,
compaction_plan."""

import math

import pytest
import pyspark.sql.functions as F


# ---------------------------------------------------------------------------
# ewma
# ---------------------------------------------------------------------------
def _py_ewma(xs, alpha, adjust):
    out = []
    if adjust:
        num = den = 0.0
        b = 1.0 - alpha
        for x in xs:
            num = num * b + x
            den = den * b + 1.0
            out.append(num / den)
    else:
        e = None
        for x in xs:
            e = x if e is None else alpha * x + (1 - alpha) * e
            out.append(e)
    return out


@pytest.mark.parametrize("adjust", [False, True])
def test_ewma_matches_python(spark, adjust):
    from spark_df_profiling_spark.operators.groupby import ewma
    rows = ([("a", float(i), float(v)) for i, v in
             enumerate([3, 1, 4, 1, 5, 9, 2, 6, 5, 3])]
            + [("b", 0.0, 10.0)]                 # single row
            + [("b", 1.0, None)]                 # NULL value: excluded
            + [(None, 2.0, 1.0)])                # NULL key: excluded
    df = spark.createDataFrame(rows, "k string, ts double, v double")
    got = {(r["k"], r["ts"]): r["ewma"]
           for r in ewma(df, "ts", "k", "v", alpha=0.3,
                         adjust=adjust).collect()}
    exp = _py_ewma([3, 1, 4, 1, 5, 9, 2, 6, 5, 3], 0.3, adjust)
    for i, e in enumerate(exp):
        assert got[("a", float(i))] == pytest.approx(e, rel=1e-9)
    assert got[("b", 0.0)] == pytest.approx(10.0)
    assert len(got) == 11
    with pytest.raises(ValueError):
        ewma(df, "ts", "k", "v", alpha=0.0)
    # alpha=1 degenerates to the value itself
    got1 = {(r["k"], r["ts"]): r["ewma"]
            for r in ewma(df, "ts", "k", "v", alpha=1.0).collect()}
    assert got1[("a", 5.0)] == 9.0


def test_ewma_long_key_guard(spark):
    """Keys past the double-range bound raise with the remedy, instead
    of silently overflowing the scaled prefix."""
    from spark_df_profiling_spark.operators.groupby import ewma
    n_max = int(600.0 / -math.log(0.5))          # 865 at alpha=0.5
    df = spark.range(n_max + 10).select(
        F.lit("k").alias("k"), F.col("id").cast("double").alias("ts"),
        F.lit(1.0).alias("v"))
    with pytest.raises(Exception, match="more than"):
        ewma(df, "ts", "k", "v", alpha=0.5).collect()
    # exactly at the bound: fine, and converged to 1.0
    ok = ewma(df.limit(n_max), "ts", "k", "v", alpha=0.5)
    last = ok.orderBy(F.desc("ts")).first()
    assert last["ewma"] == pytest.approx(1.0)


# ---------------------------------------------------------------------------
# changepoint_stats
# ---------------------------------------------------------------------------
def _py_changepoint(xs, min_seg=2):
    n = len(xs)
    mu = sum(xs) / n
    best = None
    for t in range(min_seg, n - min_seg + 1):
        ml = sum(xs[:t]) / t
        mr = sum(xs[t:]) / (n - t)
        bss = t * (ml - mu) ** 2 + (n - t) * (mr - mu) ** 2
        if best is None or bss > best[0] + 1e-12:
            best = (bss, t, ml, mr)
    return best


def test_changepoint_matches_python(spark):
    from spark_df_profiling_spark.operators.groupby import (
        changepoint_stats)
    series = {
        "shift": [1.0, 1.1, 0.9, 1.0, 5.0, 5.2, 4.8, 5.1],
        "flat": [2.0] * 8,
        "short": [1.0, 2.0, 3.0],   # n < min_points -> NULL cp
    }
    rows = [(k, float(i), v) for k, xs in series.items()
            for i, v in enumerate(xs)]
    df = spark.createDataFrame(rows, "k string, ts double, v double")
    got = {r["k"]: r for r in
           changepoint_stats(df, "ts", "k", "v").collect()}
    bss, t, ml, mr = _py_changepoint(series["shift"])
    r = got["shift"]
    assert r["cp_index"] == t == 4
    assert r["cp_ts"] == 3.0                      # ts of 4th row
    assert r["score"] == pytest.approx(bss, rel=1e-9)
    assert r["mean_before"] == pytest.approx(ml)
    assert r["mean_after"] == pytest.approx(mr)
    assert 0.9 < r["gain"] <= 1.0
    # constant series: a best split exists but explains nothing
    r = got["flat"]
    assert r["score"] == pytest.approx(0.0) and r["gain"] is None
    assert r["cp_index"] == 2                     # tie -> smallest t
    # too short: NULL cp fields, n still reported
    r = got["short"]
    assert r["n"] == 3 and r["cp_index"] is None and r["score"] is None
    with pytest.raises(ValueError):
        changepoint_stats(df, "ts", "k", "v", min_seg=0)


# ---------------------------------------------------------------------------
# knn_classify
# ---------------------------------------------------------------------------
def test_knn_classify_majority_and_ties(spark):
    from spark_df_profiling_spark.operators.similarity import (
        knn_classify)
    # corpus in 2d: cluster A near (1,0) labeled 0, cluster B near
    # (0,1) labeled 1, plus an unlabeled row adjacent to the query
    corpus = spark.createDataFrame(
        [(1, [1.0, 0.0], 0), (2, [0.9, 0.1], 0), (3, [1.0, 0.1], 0),
         (4, [0.0, 1.0], 1), (5, [0.1, 0.9], 1),
         (6, [0.99, 0.01], None)],          # NULL label: excluded
        "vec_id long, embedding array<double>, label int")
    queries = spark.createDataFrame(
        [(100, [0.95, 0.05]), (200, [0.05, 0.95])],
        "vec_id long, embedding array<double>")
    got = {r["query_id"]: r
           for r in knn_classify(corpus, queries, k=3).collect()}
    assert got[100]["label"] == 0 and got[100]["votes"] == 3
    assert got[100]["confidence"] == pytest.approx(1.0)
    r = got[200]
    assert r["label"] == 1 and r["votes"] == 2 and r["n_neighbors"] == 3
    assert r["confidence"] == pytest.approx(2 / 3)
    # vote tie at k=2 for query 200 (one label each): higher summed
    # sim wins -> label 1 (its neighbor is closer)
    got2 = {r["query_id"]: r
            for r in knn_classify(corpus, queries, k=2).collect()}
    assert got2[200]["label"] == 1
    with pytest.raises(ValueError, match="missing column"):
        knn_classify(corpus.drop("label"), queries)


# ---------------------------------------------------------------------------
# compaction_plan
# ---------------------------------------------------------------------------
def test_compaction_plan_bins_and_oversize(spark):
    from spark_df_profiling_spark.operators.layout import (
        compaction_plan)
    files = spark.createDataFrame(
        [("a", "f1", 700), ("a", "f2", 300), ("a", "f3", 300),
         ("a", "f4", 200), ("a", "f5", 1500),   # oversize
         ("b", "g1", 100), ("b", "g2", 100),
         ("b", "g3", None)],                    # NULL bytes: dropped
        "part string, fid string, bytes long")
    got = {(r["part"], r["fid"]): r
           for r in compaction_plan(files, "fid", "bytes", 1000,
                                    partition_cols=["part"]).collect()}
    assert len(got) == 7
    # order within 'a': f1(700) f2(300) f3(300) f4(200); prefixes
    # 0/700/1000/1300 -> bins 0/0/1/1
    assert [got[("a", f)]["bin"] for f in ("f1", "f2", "f3", "f4")] \
        == [0, 0, 1, 1]
    assert got[("a", "f5")]["oversize"] and got[("a", "f5")]["bin"] is None
    # partition groups bin independently
    assert got[("b", "g1")]["bin"] == 0 and got[("b", "g2")]["bin"] == 0
    # every non-oversize bin's payload respects the next-fit bound
    import collections
    bins = collections.defaultdict(int)
    for (p, f), r in got.items():
        if not r["oversize"]:
            bins[(p, r["bin"])] += r["bytes"]
    assert all(v < 1000 + 700 for v in bins.values())
    with pytest.raises(ValueError):
        compaction_plan(files, "fid", "bytes", 0)


# ---------------------------------------------------------------------------
# stratified_kfold
# ---------------------------------------------------------------------------
def test_stratified_kfold_exact_balance(spark):
    from spark_df_profiling_spark.operators.sampling import (
        stratified_kfold)
    rows = ([("en", i) for i in range(103)]
            + [("de", i + 1000) for i in range(7)]
            + [(None, i + 2000) for i in range(5)]     # NULL stratum
            + [("fr", None)])                          # NULL key: drop
    df = spark.createDataFrame(rows, "lang string, doc_id long")
    out = stratified_kfold(df, "lang", "doc_id", k=5).collect()
    assert len(out) == 115
    import collections
    sizes = collections.Counter((r["lang"], r["fold"]) for r in out)
    for lang, n in (("en", 103), ("de", 7), (None, 5)):
        per = [sizes.get((lang, f), 0) for f in range(5)]
        assert sum(per) == n
        assert max(per) - min(per) <= 1, (lang, per)
    # deterministic across invocations
    again = {(r["lang"], r["doc_id"]): r["fold"]
             for r in stratified_kfold(df, "lang", "doc_id",
                                       k=5).collect()}
    assert all(again[(r["lang"], r["doc_id"])] == r["fold"]
               for r in out)
    with pytest.raises(ValueError):
        stratified_kfold(df, "lang", "doc_id", k=1)


# ---------------------------------------------------------------------------
# cohens_kappa
# ---------------------------------------------------------------------------
def test_cohens_kappa_matches_python(spark):
    from spark_df_profiling_spark.operators.correlation import (
        cohens_kappa)
    # classic textbook confusion: 20 yes/yes, 5 yes/no, 10 no/yes,
    # 15 no/no
    rows = ([("y", "y")] * 20 + [("y", "n")] * 5
            + [("n", "y")] * 10 + [("n", "n")] * 15
            + [(None, "y"), ("y", None)])              # excluded
    df = spark.createDataFrame(rows, "a string, b string")
    r = cohens_kappa(df, "a", "b").collect()[0]
    n = 50
    po = 35 / 50
    pe = (25 * 30 + 25 * 20) / 50**2
    exp = (po - pe) / (1 - pe)
    assert r["n"] == n and r["n_agree"] == 35
    assert r["chance_pairs"] == 25 * 30 + 25 * 20
    assert r["p_o"] == pytest.approx(po)
    assert r["p_e"] == pytest.approx(pe)
    assert r["kappa"] == pytest.approx(exp)
    assert r["a_levels"] == 2 and r["b_levels"] == 2
    # constant equal columns: p_e = 1 -> kappa NULL
    c = spark.createDataFrame([("x", "x")] * 4, "a string, b string")
    rc = cohens_kappa(c, "a", "b").collect()[0]
    assert rc["kappa"] is None and rc["p_o"] == 1.0
    with pytest.raises(ValueError):
        cohens_kappa(df, "a", "zzz")


# ---------------------------------------------------------------------------
# label_agreement_stats
# ---------------------------------------------------------------------------
def test_label_agreement_flags_planted_mislabel(spark):
    from spark_df_profiling_spark.operators.similarity import (
        label_agreement_stats)
    # two tight 2-d clusters of 6, one planted mislabel inside
    # cluster 0 (labeled 1), plus a NULL-label row
    rows = ([(i, [1.0 + i * 0.01, 0.0], 0) for i in range(6)]
            + [(10 + i, [0.0, 1.0 + i * 0.01], 1) for i in range(6)]
            + [(99, [1.0, 0.03], 1)]                  # mislabeled
            + [(100, [1.0, 0.0], None)])
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int")
    got = {r["label"]: r
           for r in label_agreement_stats(df, k=5,
                                          suspect_below=0.5).collect()}
    # label 0: all 6 rows agree fully (their 5-NN are cluster mates)
    assert got[0]["n"] == 6
    assert got[0]["avg_agreement"] == pytest.approx(1.0)
    assert got[0]["n_suspect"] == 0
    # label 1: the planted row's neighbors are all label 0 -> suspect
    assert got[1]["n"] == 7
    assert got[1]["n_suspect"] == 1
    assert got[1]["avg_agreement"] < 1.0
    assert None not in got
    with pytest.raises(ValueError):
        label_agreement_stats(df, suspect_below=1.5)


def test_label_agreement_sampled_audit(spark):
    """The audit_sample_k scale mode (VERDICT r11 #3): screen a
    deterministic md5-rank sample against the FULL corpus.  With
    audit_sample_k >= n it must equal the exact audit; with a smaller
    sample it must equal the exact per-row agreements restricted to
    exactly the md5-sampled rows."""
    from spark_df_profiling_spark.operators.sampling import hash_bucket
    from spark_df_profiling_spark.operators.similarity import (
        label_agreement_stats)
    rows = ([(i, [1.0 + i * 0.01, 0.0], 0) for i in range(8)]
            + [(10 + i, [0.0, 1.0 + i * 0.01], 1) for i in range(8)]
            + [(99, [1.0, 0.03], 1)])                 # mislabeled
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int")

    def as_dict(frame):
        return {r["label"]: (r["n"], round(r["avg_agreement"], 9),
                             r["n_suspect"])
                for r in frame.collect()}

    full = as_dict(label_agreement_stats(df, k=5))
    # sample >= n: identical to the exact audit
    assert as_dict(label_agreement_stats(
        df, k=5, audit_sample_k=100)) == full
    # small sample: rows screened are exactly the md5-rank-first 6;
    # voters are still ALL rows — check per-class n matches the sample
    sampled = label_agreement_stats(df, k=5, audit_sample_k=6)
    want_ids = [r["vec_id"] for r in df
                .orderBy(hash_bucket(F.col("vec_id"), 0).asc(),
                         F.col("vec_id").asc())
                .limit(6).collect()]
    by_label = {}
    for r in df.where(F.col("vec_id").isin(want_ids)).collect():
        by_label[r["label"]] = by_label.get(r["label"], 0) + 1
    got_n = {r["label"]: r["n"] for r in sampled.collect()}
    assert got_n == by_label
    # determinism: same sample both runs
    assert as_dict(sampled) == as_dict(
        label_agreement_stats(df, k=5, audit_sample_k=6))
    with pytest.raises(ValueError):
        label_agreement_stats(df, audit_sample_k=0)


# ---------------------------------------------------------------------------
# ngram_novelty
# ---------------------------------------------------------------------------
def test_ngram_novelty_matches_python(spark):
    from spark_df_profiling_spark.operators.dedup import ngram_novelty
    texts = {
        1: "the quick brown fox jumps over the lazy dog",
        2: "the quick brown fox sat very still today",   # shares grams
        3: "completely different words in this one here",
        4: "too short",                                   # < 3 tokens
        5: "the quick brown fox jumps over the lazy dog",  # exact dup
    }
    df = spark.createDataFrame(list(texts.items()),
                               "doc_id long, text string")
    got = {r["doc_id"]: r for r in ngram_novelty(df, n=3).collect()}

    def sh(t):
        toks = t.lower().split()
        return {" ".join(toks[i:i + 3])
                for i in range(len(toks) - 2)} if len(toks) >= 3 \
            else set()
    from collections import Counter
    dfreq = Counter(g for t in texts.values() for g in sh(t))
    for i, t in texts.items():
        grams = sh(t)
        r = got[i]
        assert r["n_ngrams"] == len(grams)
        shared = sum(1 for g in grams if dfreq[g] >= 2)
        assert r["n_shared"] == shared, (i, r)
        if grams:
            assert r["novelty"] == pytest.approx(1 - shared / len(grams))
        else:
            assert r["novelty"] is None
    # the exact duplicate pair has zero novelty
    assert got[1]["novelty"] == 0.0 and got[5]["novelty"] == 0.0
    assert got[3]["novelty"] == 1.0
    with pytest.raises(ValueError):
        ngram_novelty(df, n=0)


# ---------------------------------------------------------------------------
# stateful_ewma (streaming)
# ---------------------------------------------------------------------------
def test_stateful_ewma_matches_batch_closed_form(spark, tmp_path):
    from spark_df_profiling_spark.streaming import (
        run_stream_to_memory, stateful_ewma)
    from spark_df_profiling_spark.operators.groupby import ewma
    rows = ([(1, i * 10, 5.0 + (i % 4)) for i in range(12)]
            + [(2, i * 7, float(i)) for i in range(8)])
    df = spark.createDataFrame(rows, "user_id long, tus long, value double")
    path = str(tmp_path / "ev_sewma")
    df.coalesce(1).write.mode("overwrite").parquet(path)
    stream = spark.readStream.schema(df.schema).parquet(path)
    out = stateful_ewma(stream, "user_id", "tus", "value", alpha=0.3)
    run_stream_to_memory(out, "sewma_test_out", output_mode="update")
    got = {(r["key"], r["tus"]): r
           for r in spark.table("sewma_test_out").collect()}
    # per-event prefix EWMAs match the batch closed form
    batch = {(r["user_id"], int(r["tus"])): r["ewma"]
             for r in ewma(df.withColumn("tus", F.col("tus")
                                         .cast("double")),
                           "tus", "user_id", "value",
                           alpha=0.3).collect()}
    assert set(got) == set(batch)
    for k, r in got.items():
        assert r["ewma"] == pytest.approx(batch[k], rel=1e-12), k
    assert got[(1, 110)]["n"] == 12
    # string keys keep identity; unsupported types raise
    sdf = spark.createDataFrame([("a", 0, 1.0), ("b", 0, 9.0)],
                                "user_id string, tus long, value double")
    p2 = str(tmp_path / "ev_sewma2")
    sdf.coalesce(1).write.mode("overwrite").parquet(p2)
    s2 = spark.readStream.schema(sdf.schema).parquet(p2)
    out2 = stateful_ewma(s2, "user_id", "tus", "value")
    assert dict(out2.dtypes)["key"] == "string"
    run_stream_to_memory(out2, "sewma_test_out2", output_mode="update")
    got2 = {r["key"]: r["ewma"]
            for r in spark.table("sewma_test_out2").collect()}
    assert got2 == {"a": 1.0, "b": 9.0}
    with pytest.raises(ValueError):
        stateful_ewma(s2, alpha=0.0)


def test_stateful_ewma_orders_across_arrow_chunks(spark, tmp_path):
    """Regression (ADVICE r11): a key whose micro-batch spans multiple
    Arrow chunks (> arrow.maxRecordsPerBatch) must fold in GLOBAL
    event-time order, not per-chunk order.  Events are written in
    REVERSE time order with maxRecordsPerBatch=4, so per-chunk sorting
    folds [t8..t11], [t4..t7], [t0..t3] — a different EWMA than the
    batch closed form."""
    from spark_df_profiling_spark.streaming import (
        run_stream_to_memory, stateful_ewma)
    from spark_df_profiling_spark.operators.groupby import ewma
    rows = [(1, i * 10, float(7 + 13 * i % 9)) for i in range(11, -1, -1)]
    df = spark.createDataFrame(rows, "user_id long, tus long, value double")
    path = str(tmp_path / "ev_sewma_chunks")
    df.coalesce(1).write.mode("overwrite").parquet(path)
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "4")
    try:
        stream = spark.readStream.schema(df.schema).parquet(path)
        out = stateful_ewma(stream, "user_id", "tus", "value", alpha=0.3)
        run_stream_to_memory(out, "sewma_chunk_out", output_mode="update")
        got = {int(r["tus"]): r["ewma"]
               for r in spark.table("sewma_chunk_out").collect()}
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)
    batch = {int(r["tus"]): r["ewma"]
             for r in ewma(df.withColumn("tus",
                                         F.col("tus").cast("double")),
                           "tus", "user_id", "value", alpha=0.3).collect()}
    assert set(got) == set(batch)
    for t in got:
        assert got[t] == pytest.approx(batch[t], rel=1e-12), t


# ---------------------------------------------------------------------------
# kaplan_meier
# ---------------------------------------------------------------------------
def test_kaplan_meier_matches_python(spark):
    from spark_df_profiling_spark.operators.groupby import kaplan_meier
    # classic small example with censoring
    subj = [(1.0, True), (2.0, True), (2.0, False), (3.0, True),
            (4.0, False), (5.0, True), (5.0, True), (6.0, False)]
    df = spark.createDataFrame(subj, "t double, e boolean")
    got = {r["t"]: r for r in kaplan_meier(df, "t", "e").collect()}

    def ref(subjects):
        times = sorted({t for t, _ in subjects})
        out, s = {}, 1.0
        for t in times:
            n = sum(1 for d, _ in subjects if d >= t)
            d = sum(1 for dd, e in subjects if dd == t and e)
            c = sum(1 for dd, e in subjects if dd == t and not e)
            if d:
                s *= 1 - d / n
            out[t] = (n, d, c, s)
        return out
    exp = ref(subj)
    assert set(got) == set(exp)
    for t, (n, d, c, s) in exp.items():
        r = got[t]
        assert (r["n_risk"], r["n_events"], r["n_censored"]) == (n, d, c)
        assert r["survival"] == pytest.approx(s, rel=1e-12), t
    # survival is flat over the censored-only time t=4
    assert got[4.0]["survival"] == got[3.0]["survival"]
    # everyone-dies tail -> S = 0
    all_die = spark.createDataFrame([(1.0, True), (2.0, True)],
                                    "t double, e boolean")
    last = {r["t"]: r["survival"]
            for r in kaplan_meier(all_die, "t", "e").collect()}
    assert last[2.0] == 0.0
    # grouped curves are independent
    gdf = spark.createDataFrame(
        [("a", 1.0, True), ("a", 2.0, False),
         ("b", 1.0, False), ("b", 2.0, True)],
        "g string, t double, e boolean")
    gr = {(r["g"], r["t"]): r["survival"]
          for r in kaplan_meier(gdf, "t", "e", "g").collect()}
    assert gr[("a", 1.0)] == pytest.approx(0.5)
    assert gr[("b", 1.0)] == pytest.approx(1.0)
    assert gr[("b", 2.0)] == pytest.approx(0.0)
    with pytest.raises(ValueError):
        kaplan_meier(df, "t", "nope")


def test_kaplan_meier_keyless_no_single_partition_window(spark):
    """VERDICT r11 #1: the keyless mode must never window over lit(1) —
    with continuous durations the distinct-time frame is row-sized and
    a single task would get all of it.  Every window in the executed
    plan must be partitioned by __pid (the frozen-boundary protocol)."""
    import re
    from spark_df_profiling_spark.operators.groupby import kaplan_meier
    df = spark.createDataFrame(
        [(float(i) + 0.5 / (i + 1), i % 3 != 0) for i in range(200)],
        "t double, e boolean")
    out = kaplan_meier(df, "t", "e")
    plan = out._jdf.queryExecution().executedPlan().toString()
    for m in re.finditer(r"Window \[", plan):
        seg = plan[m.start():m.start() + 400]
        assert "__pid" in seg, f"unpartitioned window: {seg[:120]}"
    # and the protocol result still equals the estimator: all-distinct
    # durations, mixed censoring — survival at the last event time
    rows = sorted(out.collect(), key=lambda r: r["t"])
    surv = 1.0
    n = 200
    for r in rows:
        assert r["n_risk"] == n, (r, n)
        if r["n_events"] > 0 and r["n_events"] < r["n_risk"]:
            surv *= 1.0 - r["n_events"] / r["n_risk"]
        elif r["n_events"] == r["n_risk"]:
            surv = 0.0
        assert r["survival"] == pytest.approx(surv, rel=1e-9), r
        n -= r["n_events"] + r["n_censored"]


# ---------------------------------------------------------------------------
# binary_segmentation
# ---------------------------------------------------------------------------
def test_binary_segmentation_finds_planted_shifts(spark):
    from spark_df_profiling_spark.operators.groupby import (
        binary_segmentation)
    # key 'a': three levels (1, 5, 9) of 8 points each -> 2 true cps
    xs = [1.0, 1.1, 0.9, 1.0, 1.05, 0.95, 1.0, 1.0,
          5.0, 5.1, 4.9, 5.0, 5.05, 4.95, 5.0, 5.0,
          9.0, 9.1, 8.9, 9.0, 9.05, 8.95, 9.0, 9.0]
    rows = ([("a", float(i), v) for i, v in enumerate(xs)]
            + [("b", float(i), 2.0) for i in range(10)])   # flat key
    df = spark.createDataFrame(rows, "k string, ts double, v double")
    # min_gain is RELATIVE to the segment's own variance, so a pure-
    # noise segment can have a best split above a low threshold (the
    # greedy criterion's documented behavior) — use the realistic 0.5
    out = binary_segmentation(df, "ts", "k", "v",
                              max_changepoints=3, min_gain=0.5)
    rows_out = out.collect()
    got = sorted((r["iteration"], r["cp_ts"])
                 for r in rows_out if r["k"] == "a")
    # both true level boundaries (last row of each level: ts 7, 15)
    # are among the accepted cps
    cps = {ts for _, ts in got}
    assert 7.0 in cps and 15.0 in cps, got
    # the noise-only sub-segments never clear min_gain=0.5
    assert len(got) == 2, got
    # the flat key never accepts a split (TSS = 0)
    assert not [r for r in rows_out if r["k"] == "b"]
    for r in rows_out:
        assert r["gain"] >= 0.5 and r["score"] > 0
    # single-iteration run equals changepoint_stats' winner
    from spark_df_profiling_spark.operators.groupby import (
        changepoint_stats)
    one = {r["k"]: r["cp_ts"] for r in binary_segmentation(
        df, "ts", "k", "v", max_changepoints=1,
        min_gain=0.5).collect()}
    cs = {r["k"]: r["cp_ts"]
          for r in changepoint_stats(df, "ts", "k", "v").collect()
          if r["gain"] is not None and r["gain"] >= 0.5}
    assert one == cs
    with pytest.raises(ValueError):
        binary_segmentation(df, "ts", "k", "v", max_changepoints=0)


def test_binary_segmentation_no_segment_id_collision(spark):
    """Regression (r12): when one segment splits in an iteration while a
    SIBLING segment does not, the unsplit segment must be relabeled too
    (seg*2) — otherwise unsplit seg 1 collides with split seg 0's right
    child (0*2+1 = 1), iteration 3 searches a bogus merged segment, and
    the iteration-1 changepoint is re-emitted as a duplicate accepted
    split.  Levels 1x8 / 5x8 / 9x16: iteration 1 splits at ts=15 (the
    long flat 9-block vs the rest), iteration 2 splits the LEFT child at
    ts=7 while the right (all 9s, TSS=0) does not — the exact colliding
    shape."""
    from spark_df_profiling_spark.operators.groupby import (
        binary_segmentation)
    xs = ([1.0, 1.1, 0.9, 1.0, 1.05, 0.95, 1.0, 1.0]
          + [5.0, 5.1, 4.9, 5.0, 5.05, 4.95, 5.0, 5.0]
          + [9.0, 9.1, 8.9, 9.0, 9.05, 8.95, 9.0, 9.0] * 2)
    df = spark.createDataFrame(
        [("a", float(i), v) for i, v in enumerate(xs)],
        "k string, ts double, v double")
    out = binary_segmentation(df, "ts", "k", "v",
                              max_changepoints=3, min_gain=0.5)
    got = [(r["iteration"], r["cp_ts"]) for r in out.collect()]
    cps = [ts for _, ts in got]
    # no changepoint is ever accepted twice (the collision re-emitted
    # cp_ts=15.0 in iteration 3 before the fix)
    assert len(cps) == len(set(cps)), got
    # exactly the two true level boundaries, nothing from iteration 3
    assert sorted(cps) == [7.0, 15.0], got


# ---------------------------------------------------------------------------
# log_rank_test
# ---------------------------------------------------------------------------
def test_log_rank_matches_python(spark):
    from spark_df_profiling_spark.operators.groupby import (
        log_rank_test)
    subj = ([("a", 1.0, True), ("a", 2.0, True), ("a", 3.0, False),
             ("a", 4.0, True), ("a", 5.0, False)]
            + [("b", 2.0, True), ("b", 4.0, True), ("b", 5.0, True),
               ("b", 6.0, True), ("b", 7.0, False)])
    df = spark.createDataFrame(subj, "g string, t double, e boolean")
    got = {r["g"]: r for r in log_rank_test(df, "t", "e",
                                            "g").collect()}

    def ref(subjects):
        times = sorted({t for _, t, e in subjects if e})
        groups = sorted({g for g, _, _ in subjects})
        O = {g: 0 for g in groups}
        E = {g: 0.0 for g in groups}
        for t in times:
            td = sum(1 for _, tt, e in subjects if tt == t and e)
            tn = sum(1 for _, tt, _ in subjects if tt >= t)
            for g in groups:
                d = sum(1 for gg, tt, e in subjects
                        if gg == g and tt == t and e)
                n = sum(1 for gg, tt, _ in subjects
                        if gg == g and tt >= t)
                O[g] += d
                E[g] += n * td / tn
        chi = sum((O[g] - E[g]) ** 2 / E[g] for g in groups
                  if E[g] > 0)
        return O, E, chi
    O, E, chi = ref(subj)
    for g in ("a", "b"):
        assert got[g]["n_subjects"] == 5
        assert got[g]["observed"] == O[g]
        assert got[g]["expected"] == pytest.approx(E[g], rel=1e-12)
        assert got[g]["chi2"] == pytest.approx(chi, rel=1e-12)
        assert got[g]["df"] == 1
    # identical curves -> chi2 ~ 0
    same = spark.createDataFrame(
        [(g, float(t), True) for g in ("x", "y") for t in range(1, 6)],
        "g string, t double, e boolean")
    r0 = log_rank_test(same, "t", "e", "g").collect()[0]
    assert r0["chi2"] == pytest.approx(0.0, abs=1e-12)
    with pytest.raises(ValueError):
        log_rank_test(df, "t", "e", "zzz")


# ---------------------------------------------------------------------------
# classification_report / roc_auc
# ---------------------------------------------------------------------------
def test_classification_report_matches_python(spark):
    from spark_df_profiling_spark.operators.evaluation import (
        classification_report)
    pairs = ([("cat", "cat")] * 8 + [("cat", "dog")] * 2
             + [("dog", "dog")] * 5 + [("dog", "bird")] * 3
             + [("bird", "cat")] * 1
             + [(None, "cat"), ("cat", None)])       # excluded
    df = spark.createDataFrame(pairs, "y string, p string")
    got = {r["class"]: r
           for r in classification_report(df, "y", "p").collect()}
    assert set(got) == {"cat", "dog", "bird"}
    c = got["cat"]
    assert (c["support"], c["n_predicted"], c["tp"]) == (10, 9, 8)
    assert c["precision"] == pytest.approx(8 / 9)
    assert c["recall"] == pytest.approx(8 / 10)
    assert c["f1"] == pytest.approx(2 * (8/9) * 0.8 / (8/9 + 0.8))
    assert c["accuracy"] == pytest.approx(13 / 19)
    b = got["bird"]
    assert b["support"] == 1 and b["n_predicted"] == 3 and b["tp"] == 0
    assert b["precision"] == 0.0 and b["recall"] == 0.0
    assert b["f1"] is None                     # precision+recall == 0
    # class only ever PREDICTED (never observed): recall NULL
    df2 = spark.createDataFrame([("a", "a"), ("a", "z")],
                                "y string, p string")
    z = {r["class"]: r for r in
         classification_report(df2, "y", "p").collect()}["z"]
    assert z["support"] == 0 and z["recall"] is None
    with pytest.raises(ValueError):
        classification_report(df, "y", "zzz")


def test_roc_auc_matches_python(spark):
    from spark_df_profiling_spark.operators.evaluation import roc_auc
    # scores with ties across classes
    rows = [(True, 0.9), (True, 0.8), (True, 0.8), (False, 0.8),
            (True, 0.4), (False, 0.35), (False, 0.2), (False, 0.2),
            (None, 0.5), (True, None)]                # excluded
    df = spark.createDataFrame(rows, "y boolean, s double")
    r = roc_auc(df, "y", "s").collect()[0]

    def ref(pairs):
        pairs = [(y, s) for y, s in pairs
                 if y is not None and s is not None]
        pos = [s for y, s in pairs if y]
        neg = [s for y, s in pairs if not y]
        wins = sum(1.0 if p > n else 0.5 if p == n else 0.0
                   for p in pos for n in neg)
        return len(pos), len(neg), wins / (len(pos) * len(neg))
    npos, nneg, auc = ref(rows)
    assert (r["n_pos"], r["n_neg"]) == (npos, nneg)
    assert r["auc"] == pytest.approx(auc, rel=1e-12)
    assert r["rank_sum_pos_x2"] % 1 == 0
    # constant scorer: tie-corrected AUC is exactly 0.5
    const = spark.createDataFrame([(i % 2 == 0, 1.0)
                                   for i in range(10)],
                                  "y boolean, s double")
    assert roc_auc(const, "y", "s").collect()[0]["auc"] == 0.5
    # single-class input: NULL auc
    onec = spark.createDataFrame([(True, 0.1), (True, 0.2)],
                                 "y boolean, s double")
    assert roc_auc(onec, "y", "s").collect()[0]["auc"] is None
    # perfect separation
    perf = spark.createDataFrame(
        [(True, 0.9), (True, 0.8), (False, 0.2), (False, 0.1)],
        "y boolean, s double")
    assert roc_auc(perf, "y", "s").collect()[0]["auc"] == 1.0


def test_calibration_report_matches_python(spark):
    from spark_df_profiling_spark.operators.evaluation import (
        calibration_report)
    rows = [(True, 0.95), (True, 0.9), (False, 0.9),   # bin 9 / 1.0
            (True, 0.55), (False, 0.52), (False, 0.58),  # bin 5
            (False, 0.05), (False, 0.08), (True, 0.02),  # bin 0
            (True, 1.0),                                 # top closed
            (None, 0.5), (True, None)]                   # excluded
    df = spark.createDataFrame(rows, "y boolean, s double")
    got = {r["bin"]: r
           for r in calibration_report(df, "y", "s", 10).collect()}
    assert set(got) == {0, 5, 9}
    b9 = got[9]
    assert b9["n"] == 4 and b9["sum_label"] == 3
    assert b9["avg_score"] == pytest.approx((0.95 + 0.9 + 0.9 + 1.0) / 4)
    assert b9["accuracy"] == pytest.approx(0.75)
    # python replay of ece/brier over the kept rows
    kept = [(y, s) for y, s in rows if y is not None and s is not None]
    import collections
    bins = collections.defaultdict(list)
    for y, s in kept:
        bins[min(int(s * 10), 9)].append((y, s))
    n = len(kept)
    ece = sum(abs(sum(y for y, _ in v) - sum(s for _, s in v)) / n
              for v in bins.values())
    brier = sum((s - (1.0 if y else 0.0)) ** 2 for y, s in kept) / n
    assert b9["ece"] == pytest.approx(ece, rel=1e-12)
    assert b9["brier"] == pytest.approx(brier, rel=1e-12)
    # out-of-range score raises, not clamps
    bad = spark.createDataFrame([(True, 1.5)], "y boolean, s double")
    with pytest.raises(Exception, match="outside"):
        calibration_report(bad, "y", "s").collect()
    with pytest.raises(ValueError):
        calibration_report(df, "y", "s", n_bins=1)


def test_retrieval_metrics_matches_python(spark):
    from spark_df_profiling_spark.operators.evaluation import (
        retrieval_metrics)
    results = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2), (1, 12, 3),
         (2, 20, 1), (2, 21, 2),
         (3, 30, 1),                       # query with no gold
         (1, 13, 99)],                     # beyond k: ignored
        "query_id long, neighbor_id long, rank long")
    gold = spark.createDataFrame(
        [(1, 11), (1, 12), (1, 99), (1, 11),   # dup gold row
         (2, 77),                              # zero hits
         (4, 40)],                             # gold-only query
        "query_id long, neighbor_id long")
    got = {r["query_id"]: r
           for r in retrieval_metrics(results, gold, k=3).collect()}
    assert set(got) == {1, 2, 4}               # q3 has no gold
    import math
    r1 = got[1]
    assert (r1["n_gold"], r1["n_retrieved"], r1["hits"]) == (3, 3, 2)
    assert r1["precision_at_k"] == pytest.approx(2 / 3)
    assert r1["recall_at_k"] == pytest.approx(2 / 3)
    assert r1["first_hit_rank"] == 2
    assert r1["reciprocal_rank"] == pytest.approx(0.5)
    dcg = 1 / math.log2(3) + 1 / math.log2(4)
    idcg = sum(1 / math.log2(i + 1) for i in range(1, 4))
    assert r1["ndcg_at_k"] == pytest.approx(dcg / idcg, rel=1e-12)
    r2 = got[2]
    assert r2["hits"] == 0 and r2["ndcg_at_k"] == 0.0
    assert r2["first_hit_rank"] is None and r2["reciprocal_rank"] is None
    r4 = got[4]
    assert r4["n_retrieved"] == 0 and r4["recall_at_k"] == 0.0
    with pytest.raises(ValueError):
        retrieval_metrics(results, gold, k=0)


def test_retrieval_metrics_dedupes_results_side(spark):
    """Regression (ADVICE r11): duplicate (query, doc) result rows
    within rank<=k must not double-count hits/DCG or push
    precision_at_k past 1 — dedupe keeping the minimum rank."""
    import math
    from spark_df_profiling_spark.operators.evaluation import (
        retrieval_metrics)
    results = spark.createDataFrame(
        [(1, 10, 3), (1, 10, 1), (1, 10, 2),   # same doc 3x
         (1, 11, 2)],
        "query_id long, neighbor_id long, rank long")
    gold = spark.createDataFrame(
        [(1, 10)], "query_id long, neighbor_id long")
    r = retrieval_metrics(results, gold, k=3).collect()[0]
    # one gold doc, retrieved once after dedup: hits can never exceed
    # n_gold, precision counts the doc once, DCG uses the BEST rank
    assert (r["n_gold"], r["n_retrieved"], r["hits"]) == (1, 2, 1)
    assert r["precision_at_k"] == pytest.approx(1 / 3)
    assert r["recall_at_k"] == pytest.approx(1.0)
    assert r["first_hit_rank"] == 1
    assert r["ndcg_at_k"] == pytest.approx(1.0)  # hit at rank 1 = ideal


def test_shuffle_partitions_conf_tolerates_auto(spark):
    """Regression (ADVICE r11): roc_auc/precision_recall_curve read
    spark.sql.shuffle.partitions as int; AQE-managed environments can
    hold 'auto' there — fall back instead of raising ValueError."""
    from spark_df_profiling_spark.operators.evaluation import (
        _shuffle_partitions)

    class FakeConf:
        def get(self, k, d=None):
            return "auto"

    class FakeSpark:
        conf = FakeConf()

    assert _shuffle_partitions(FakeSpark()) == 32
    assert _shuffle_partitions(spark) == int(
        spark.conf.get("spark.sql.shuffle.partitions"))


# ---------------------------------------------------------------------------
# stateful_cusum (streaming)
# ---------------------------------------------------------------------------
def test_stateful_cusum_matches_batch_closed_form(spark, tmp_path):
    from spark_df_profiling_spark.streaming import (
        run_stream_to_memory, stateful_cusum)
    from spark_df_profiling_spark.operators.groupby import cusum_anomaly
    rows = ([(1, i * 10, 0.1 * (i % 3)) for i in range(10)]
            + [(1, 200 + i * 10, 3.0) for i in range(5)]   # level shift
            + [(2, i * 7, 0.0) for i in range(6)])
    df = spark.createDataFrame(rows, "user_id long, tus long, value double")
    path = str(tmp_path / "ev_scusum")
    df.coalesce(1).write.mode("overwrite").parquet(path)
    stream = spark.readStream.schema(df.schema).parquet(path)
    out = stateful_cusum(stream, "user_id", "tus", "value",
                         target=0.1, sd=1.0, k=0.5, h=5.0)
    run_stream_to_memory(out, "scusum_test_out", output_mode="update")
    got = {(r["key"], r["tus"]): r
           for r in spark.table("scusum_test_out").collect()}
    batch = {(r["user_id"], int(r["tus"])): r
             for r in cusum_anomaly(
                 df.withColumn("tus", F.col("tus").cast("double")),
                 "tus", "user_id", "value", k=0.5, h=5.0,
                 target=0.1, sd=1.0).collect()}
    assert set(got) == set(batch)
    for kk, r in got.items():
        b = batch[kk]
        assert r["cusum_up"] == pytest.approx(b["cusum_up"], abs=1e-9), kk
        assert r["cusum_dn"] == pytest.approx(b["cusum_dn"], abs=1e-9), kk
        assert r["is_change"] == bool(b["is_change"]), kk
    # the sustained shift trips the alarm
    assert any(r["is_change"] for (u, _), r in got.items() if u == 1)
    assert not any(r["is_change"] for (u, _), r in got.items() if u == 2)
    with pytest.raises(ValueError):
        stateful_cusum(stream, sd=0.0)


def test_precision_recall_curve_matches_python(spark):
    from spark_df_profiling_spark.operators.evaluation import (
        precision_recall_curve)
    rows = [(True, 0.9), (True, 0.8), (False, 0.8), (True, 0.4),
            (False, 0.35), (False, 0.2), (True, 0.2),
            (None, 0.5), (True, None)]                # excluded
    df = spark.createDataFrame(rows, "y boolean, s double")
    got = {r["threshold"]: r
           for r in precision_recall_curve(df, "y", "s").collect()}
    kept = [(y, s) for y, s in rows if y is not None and s is not None]
    thresholds = sorted({s for _, s in kept})
    assert set(got) == set(thresholds)
    n_pos = sum(1 for y, _ in kept if y)
    for t in thresholds:
        tp = sum(1 for y, s in kept if y and s >= t)
        fp = sum(1 for y, s in kept if not y and s >= t)
        r = got[t]
        assert (r["tp"], r["fp"], r["fn"]) == (tp, fp, n_pos - tp), t
        assert r["precision"] == pytest.approx(tp / (tp + fp))
        assert r["recall"] == pytest.approx(tp / n_pos)
    # strictest threshold: perfect precision here; loosest: recall 1
    assert got[0.9]["precision"] == 1.0
    assert got[min(thresholds)]["recall"] == 1.0
    with pytest.raises(ValueError):
        precision_recall_curve(df, "y", "zzz")


def test_windowed_topk_matches_python(spark):
    from spark_df_profiling_spark.operators.frequency import (
        windowed_topk)
    rows = ([(float(t), "a") for t in range(0, 50, 2)]     # 25 in b0..b4
            + [(float(t), "b") for t in range(0, 30, 3)]   # 10
            + [(5.0, "c"), (5.5, "c"), (6.0, "c"), (25.0, "c")]
            + [(None, "x"), (7.0, None)])                  # excluded
    df = spark.createDataFrame(rows, "ts double, v string")
    got = {(r["bucket"], r["rank"]): r
           for r in windowed_topk(df, "ts", "v", window=10.0,
                                  k=2).collect()}
    import collections
    buckets = collections.defaultdict(collections.Counter)
    for ts, v in rows:
        if ts is not None and v is not None:
            buckets[int(ts // 10)][v] += 1
    for b, ctr in buckets.items():
        ordered = sorted(ctr.items(), key=lambda kv: (-kv[1], kv[0]))
        for i, (val, n) in enumerate(ordered[:2], start=1):
            r = got[(b, i)]
            assert (r["value"], r["cnt"]) == (val, n), (b, i)
            assert r["bucket_start"] == b * 10.0
    # sub_partitions invariance
    one = {(r["bucket"], r["rank"]): (r["value"], r["cnt"])
           for r in windowed_topk(df, "ts", "v", 10.0, k=2,
                                  sub_partitions=1).collect()}
    assert one == {kk: (r["value"], r["cnt"]) for kk, r in got.items()}
    with pytest.raises(ValueError):
        windowed_topk(df, "ts", "v", window=0.0)


# ---------------------------------------------------------------------------
# event_paths / transition_counts
# ---------------------------------------------------------------------------
def test_event_paths_matches_python(spark):
    from spark_df_profiling_spark.operators.groupby import event_paths
    rows = ([(1, 0.0, "view"), (1, 1.0, "click"), (1, 2.0, "buy"),
             (1, 3.0, "view"),                 # beyond depth: ignored
             (2, 0.0, "view"), (2, 1.0, "click"), (2, 2.0, "buy"),
             (3, 0.0, "view"), (3, 1.0, "bounce"),   # short path
             (4, 0.0, "view"),
             (None, 0.0, "x"), (5, None, "x"), (5, 1.0, None)])
    df = spark.createDataFrame(rows, "k long, ts double, e string")
    got = {(r["path"], r["path_len"]): r["n_keys"]
           for r in event_paths(df, "ts", "k", "e", depth=3).collect()}
    assert got[("view>click>buy", 3)] == 2
    assert got[("view>bounce", 2)] == 1
    assert got[("view", 1)] == 1
    assert len(got) == 3
    with pytest.raises(ValueError):
        event_paths(df, "ts", "k", "e", depth=0)


def test_transition_counts_matches_python(spark):
    from spark_df_profiling_spark.operators.groupby import (
        transition_counts)
    rows = [(1, 0.0, "a"), (1, 1.0, "b"), (1, 2.0, "a"), (1, 3.0, "b"),
            (2, 0.0, "a"), (2, 1.0, "a"),
            (3, 0.0, "c")]                       # single event: none
    df = spark.createDataFrame(rows, "k long, ts double, e string")
    got = {(r["src"], r["dst"]): r
           for r in transition_counts(df, "ts", "k", "e").collect()}
    assert got[("a", "b")]["cnt"] == 2
    assert got[("b", "a")]["cnt"] == 1
    assert got[("a", "a")]["cnt"] == 1
    assert got[("a", "b")]["src_total"] == 3
    assert got[("a", "b")]["prob"] == pytest.approx(2 / 3)
    assert ("c", "c") not in got and len(got) == 3

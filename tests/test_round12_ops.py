"""Round-12 operators: exact_substring_spans (Lee et al. 2022-style
cross-line repeated-span dedup) and grouped roc_auc/PR additions."""

import re

import pytest
import pyspark.sql.functions as F


# ---------------------------------------------------------------------------
# exact_substring_spans
# ---------------------------------------------------------------------------
def _py_spans(docs, n, min_count, cross_doc):
    """Brute-force reference: positional word n-grams, corpus counts,
    flagged-window island merge."""
    grams = []  # (doc_id, pos, gram)
    for did, text in docs:
        toks = re.split(r"\s+", text.lower())
        for i in range(0, max(0, len(toks) - n + 1)):
            grams.append((did, i, " ".join(toks[i:i + n])))
    counts = {}
    for did, _, gr in grams:
        key = gr
        if cross_doc:
            counts.setdefault(key, set()).add(did)
        else:
            counts[key] = counts.get(key, 0) + 1
    rep = {k for k, v in counts.items()
           if (len(v) if cross_doc else v) >= min_count}
    spans = []
    for did, _ in docs:
        ps = sorted(p for d, p, gr in grams if d == did and gr in rep)
        if not ps:
            continue
        start, prev, cnt = ps[0], ps[0], 1
        for p in ps[1:]:
            if p - prev > n:
                spans.append((did, start, prev + n, cnt))
                start, cnt = p, 0
            prev = p
            cnt += 1
        spans.append((did, start, prev + n, cnt))
    return sorted(spans)


def _doc(seed, length):
    # unique filler tokens: no accidental repeated n-grams within or
    # across documents
    return " ".join(f"w{seed}x{i}" for i in range(length))


SHARED = "alpha beta gamma delta epsilon zeta eta theta iota kappa"


def _corpus():
    # the shared 10-token paragraph lands at SHIFTED offsets: prefix of
    # doc 1, middle of doc 2, suffix of doc 3; docs 4-5 are clean; doc 6
    # repeats a 6-token run WITHIN itself only
    return [
        (1, SHARED + " " + _doc(1, 30)),
        (2, _doc(2, 12) + " " + SHARED + " " + _doc(3, 15)),
        (3, _doc(4, 25) + " " + SHARED),
        (4, _doc(5, 40)),
        (5, _doc(6, 8)),
        (6, _doc(7, 10) + " one two three four five six "
            + _doc(8, 9) + " one two three four five six " + _doc(9, 7)),
    ]


def test_exact_substring_spans_matches_python(spark):
    from spark_df_profiling_spark.operators.dedup import (
        exact_substring_spans)
    docs = _corpus()
    df = spark.createDataFrame(docs, "doc_id long, text string")
    for n, cross in ((5, False), (5, True), (3, False)):
        got = sorted(
            (r["doc_id"], r["span_start"], r["span_end"], r["n_grams"])
            for r in exact_substring_spans(
                df, n=n, min_count=2, cross_doc=cross).collect())
        want = _py_spans(docs, n, 2, cross)
        assert got == want, (n, cross, got, want)


def test_exact_substring_spans_semantics(spark):
    from spark_df_profiling_spark.operators.dedup import (
        exact_substring_spans)
    docs = _corpus()
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {r["doc_id"]: r for r in exact_substring_spans(
        df, n=5, min_count=2, cross_doc=True).collect()}
    # all three planted docs carry exactly the shared paragraph span
    assert set(out) == {1, 2, 3}
    # doc 1: paragraph at tokens [0, 10) -> 6 flagged 5-gram windows
    assert (out[1]["span_start"], out[1]["span_end"]) == (0, 10)
    assert out[1]["n_grams"] == 6
    # doc 2: paragraph starts after the 12-token preamble
    assert (out[2]["span_start"], out[2]["span_end"]) == (12, 22)
    # doc 3: suffix position
    assert (out[3]["span_start"], out[3]["span_end"]) == (25, 35)
    # within-doc repetition qualifies only when cross_doc=False
    within = {r["doc_id"] for r in exact_substring_spans(
        df, n=5, min_count=2, cross_doc=False).collect()}
    assert 6 in within
    with pytest.raises(ValueError):
        exact_substring_spans(df, n=0)
    with pytest.raises(ValueError):
        exact_substring_spans(df, min_count=1)
    # short docs (< n tokens) produce no grams and no spans
    tiny = spark.createDataFrame([(1, "a b"), (2, "a b")],
                                 "doc_id long, text string")
    assert exact_substring_spans(tiny, n=5).count() == 0


# ---------------------------------------------------------------------------
# grouped roc_auc / precision_recall_curve
# ---------------------------------------------------------------------------
def _scored_df(spark):
    rows = []
    for i in range(120):
        grp = "en" if i % 3 else "de"
        y = (i * 7) % 5 < 2
        s = ((i * 13) % 40) / 40.0 + (0.25 if y else 0.0)
        rows.append((grp, y, s))
    rows += [("fr", True, 0.9), ("fr", True, 0.8)]   # single-class grp
    rows += [(None, True, 0.5), ("en", None, 0.5), ("en", True, None)]
    return spark.createDataFrame(rows, "g string, y boolean, s double")


def test_grouped_roc_auc_matches_per_group(spark):
    from spark_df_profiling_spark.operators.evaluation import roc_auc
    df = _scored_df(spark)
    got = {r["g"]: r for r in roc_auc(df, "y", "s", "g").collect()}
    assert set(got) == {"en", "de", "fr"}      # NULL group excluded
    for grp in ("en", "de", "fr"):
        solo = roc_auc(df.where(F.col("g") == grp), "y", "s") \
            .collect()[0]
        r = got[grp]
        assert (r["n_pos"], r["n_neg"], r["rank_sum_pos_x2"]) == \
            (solo["n_pos"], solo["n_neg"], solo["rank_sum_pos_x2"]), grp
        if solo["auc"] is None:
            assert r["auc"] is None
        else:
            assert r["auc"] == pytest.approx(solo["auc"], rel=1e-12)
    # single-class group: auc NULL, counted correctly
    assert got["fr"]["n_neg"] == 0 and got["fr"]["auc"] is None


def test_grouped_precision_recall_matches_per_group(spark):
    from spark_df_profiling_spark.operators.evaluation import (
        precision_recall_curve)
    df = _scored_df(spark)
    out = precision_recall_curve(df, "y", "s", "g").collect()
    by_g = {}
    for r in out:
        by_g.setdefault(r["g"], []).append(r)
    assert set(by_g) == {"en", "de", "fr"}
    for grp, rows in by_g.items():
        solo = precision_recall_curve(
            df.where(F.col("g") == grp), "y", "s").collect()
        want = sorted((r["threshold"], r["tp"], r["fp"], r["fn"])
                      for r in solo)
        gotv = sorted((r["threshold"], r["tp"], r["fp"], r["fn"])
                      for r in rows)
        assert gotv == want, grp


# ---------------------------------------------------------------------------
# contaminated_spans / remove_spans
# ---------------------------------------------------------------------------
def test_contaminated_spans_finds_benchmark_passages(spark):
    from spark_df_profiling_spark.operators.dedup import (
        contaminated_spans)
    bench = spark.createDataFrame(
        [(100, "what is the capital of france paris obviously"),
         (101, "compute the integral of x squared over zero one")],
        "qid long, question string")
    docs = spark.createDataFrame([
        # quotes benchmark q1 at token offset 4
        (1, _doc(1, 4) + " what is the capital of france paris obviously "
         + _doc(2, 6)),
        # quotes benchmark q2 as a prefix
        (2, "compute the integral of x squared over zero one "
         + _doc(3, 10)),
        (3, _doc(4, 20)),                              # clean
    ], "doc_id long, text string")
    out = {r["doc_id"]: r for r in contaminated_spans(
        docs, bench, bench_text_col="question", n=5).collect()}
    assert set(out) == {1, 2}
    assert (out[1]["span_start"], out[1]["span_end"]) == (4, 12)
    assert (out[2]["span_start"], out[2]["span_end"]) == (0, 9)
    with pytest.raises(ValueError):
        contaminated_spans(docs, bench, bench_text_col="question", n=0)
    with pytest.raises(ValueError):
        contaminated_spans(docs, bench, bench_text_col="nope")


def test_remove_spans_cuts_and_preserves(spark):
    from spark_df_profiling_spark.operators.dedup import (
        exact_substring_spans, remove_spans)
    docs = _corpus()
    df = spark.createDataFrame(docs, "doc_id long, text string")
    spans = exact_substring_spans(df, n=5, min_count=2, cross_doc=True)
    out = {r["doc_id"]: r for r in remove_spans(df, spans).collect()}
    # every input doc appears (left join)
    assert set(out) == {d for d, _ in docs}
    # the planted paragraph is gone from all three carriers, the
    # surrounding (case-preserved) tokens survive in order
    for did, text in docs:
        toks = text.split(" ")
        r = out[did]
        assert r["n_tokens"] == len(toks)
        if did in (1, 2, 3):
            assert r["n_tokens_removed"] == 10
            assert "alpha" not in r["text_clean"]
            want = " ".join(t for t in toks
                            if t not in SHARED.split(" "))
            assert r["text_clean"] == want, did
        else:
            assert r["n_tokens_removed"] == 0
            assert r["text_clean"] == " ".join(toks)
    with pytest.raises(ValueError):
        remove_spans(df, spans.drop("span_end"))
    # NULL text passes through as NULL, never ''
    nl = spark.createDataFrame([(9, None)], "doc_id long, text string")
    r9 = remove_spans(nl, spans.limit(0)).collect()[0]
    assert r9["text_clean"] is None


# ---------------------------------------------------------------------------
# fleiss_kappa
# ---------------------------------------------------------------------------
def test_fleiss_kappa_textbook_example(spark):
    """Fleiss 1971 worked example (14 raters, 10 subjects, 5
    categories): P-bar ~ 0.378, P_e ~ 0.213, kappa ~ 0.210."""
    from spark_df_profiling_spark.operators.correlation import (
        fleiss_kappa)
    table = [
        [0, 0, 0, 0, 14], [0, 2, 6, 4, 2], [0, 0, 3, 5, 6],
        [0, 3, 9, 2, 0], [2, 2, 8, 1, 1], [7, 7, 0, 0, 0],
        [3, 2, 6, 3, 0], [2, 5, 3, 2, 2], [6, 5, 2, 1, 0],
        [0, 2, 2, 3, 7]]
    rows = [(i, str(j)) for i, cnts in enumerate(table)
            for j, c in enumerate(cnts) for _ in range(c)]
    df = spark.createDataFrame(rows, "item long, cat string")
    r = fleiss_kappa(df, "item", "cat").collect()[0]
    assert (r["n_items"], r["n_ratings"], r["n_categories"],
            r["min_raters"], r["max_raters"]) == (10, 140, 5, 14, 14)
    # exact integer handle: sum over cells of n_ij*(n_ij-1)
    want_agree = sum(c * (c - 1) for cnts in table for c in cnts)
    assert r["sum_agree_pairs"] == want_agree
    assert r["p_bar"] == pytest.approx(want_agree / (10 * 14 * 13),
                                       rel=1e-12)
    pj = [sum(t[j] for t in table) / 140.0 for j in range(5)]
    pe = sum(p * p for p in pj)
    assert r["p_e"] == pytest.approx(pe, rel=1e-12)
    assert r["kappa"] == pytest.approx(
        (r["p_bar"] - pe) / (1 - pe), rel=1e-12)
    assert round(r["kappa"], 3) == 0.210


def test_fleiss_kappa_variable_raters_and_guards(spark):
    from spark_df_profiling_spark.operators.correlation import (
        fleiss_kappa)
    # item 1: 3 ratings (2 agree), item 2: 2 ratings (agree),
    # item 3: ONE rating -> excluded entirely (also from marginals)
    rows = [(1, "a"), (1, "a"), (1, "b"),
            (2, "b"), (2, "b"),
            (3, "zzz")]
    df = spark.createDataFrame(rows, "item long, cat string")
    r = fleiss_kappa(df, "item", "cat").collect()[0]
    assert (r["n_items"], r["n_ratings"]) == (2, 5)
    assert (r["min_raters"], r["max_raters"]) == (2, 3)
    assert r["n_categories"] == 2          # 'zzz' never enters
    # generalized P-bar: mean of per-item ratios
    p1 = (2 * 1 + 1 * 0) / (3 * 2)
    p2 = (2 * 1) / (2 * 1)
    assert r["p_bar"] == pytest.approx((p1 + p2) / 2, rel=1e-12)
    pe = (2 / 5) ** 2 + (3 / 5) ** 2
    assert r["p_e"] == pytest.approx(pe, rel=1e-12)
    # constant-and-equal ratings: p_e = 1 -> kappa NULL
    const = spark.createDataFrame([(1, "x"), (1, "x"), (2, "x"),
                                   (2, "x")], "item long, cat string")
    assert fleiss_kappa(const, "item", "cat").collect()[0]["kappa"] \
        is None
    with pytest.raises(ValueError):
        fleiss_kappa(df, "item", "nope")


# ---------------------------------------------------------------------------
# grouped calibration_report
# ---------------------------------------------------------------------------
def test_grouped_calibration_matches_per_group(spark):
    from spark_df_profiling_spark.operators.evaluation import (
        calibration_report)
    rows = []
    for i in range(200):
        g = "en" if i % 3 else "de"
        s = ((i * 17) % 100) / 100.0
        y = ((i * 11) % 10) < 10 * s        # roughly calibrated
        rows.append((g, y, s))
    rows.append((None, True, 0.5))
    df = spark.createDataFrame(rows, "g string, y boolean, s double")
    got = {}
    for r in calibration_report(df, "y", "s", group_col="g").collect():
        got.setdefault(r["g"], {})[r["bin"]] = r
    assert set(got) == {"en", "de"}
    for grp in ("en", "de"):
        solo = {r["bin"]: r for r in calibration_report(
            df.where(F.col("g") == grp), "y", "s").collect()}
        assert set(got[grp]) == set(solo)
        for b, r in got[grp].items():
            sr = solo[b]
            assert (r["n"], r["sum_label"]) == (sr["n"],
                                                sr["sum_label"]), (grp, b)
            assert r["ece"] == pytest.approx(sr["ece"], rel=1e-12)
            assert r["brier"] == pytest.approx(sr["brier"], rel=1e-12)


# ---------------------------------------------------------------------------
# cms_join_size
# ---------------------------------------------------------------------------
def test_cms_join_size_estimates_inner_join(spark):
    from spark_df_profiling_spark.operators.frequency import (
        cms_join_size, cms_state)
    a = spark.createDataFrame([(k,) for k in [1] * 5 + [2] * 3 + [3]],
                              "k long")
    b = spark.createDataFrame([(k,) for k in [1] * 2 + [3] * 4 + [9]],
                              "k long")
    true_size = 5 * 2 + 3 * 0 + 1 * 4            # 14
    # wide sketch: no collisions -> exact
    sa = cms_state(a, "k", width=4096, depth=4)
    sb = cms_state(b, "k", width=4096, depth=4)
    r = cms_join_size(sa, sb).collect()[0]
    assert r["est_join_rows"] == true_size
    assert r["worst_depth_estimate"] >= r["est_join_rows"]
    assert r["depth"] == 4
    # tiny sketch: collisions only ever OVER-estimate
    sa2 = cms_state(a, "k", width=2, depth=3)
    sb2 = cms_state(b, "k", width=2, depth=3)
    r2 = cms_join_size(sa2, sb2).collect()[0]
    assert r2["est_join_rows"] >= true_size
    with pytest.raises(ValueError):
        cms_join_size(sa.drop("cnt"), sb)


# ---------------------------------------------------------------------------
# stateful_heavy_hitters (streaming)
# ---------------------------------------------------------------------------
def _py_mg(events, capacity):
    counters, n = {}, 0
    for v in events:
        n += 1
        if v in counters:
            counters[v] += 1
        elif len(counters) < capacity:
            counters[v] = 1
        else:
            for k in list(counters):
                counters[k] -= 1
                if counters[k] == 0:
                    del counters[k]
    return counters, n


def test_stateful_heavy_hitters_exact_and_evicting(spark, tmp_path):
    from spark_df_profiling_spark.streaming import (
        run_stream_to_memory, stateful_heavy_hitters)
    evs = (["a"] * 7 + ["b"] * 5 + ["c"] * 2 + ["d"])
    rows = ([(1, i * 10, v) for i, v in enumerate(evs)]
            + [(2, i, "x") for i in range(4)]
            + [(2, 99, None)])                      # NULL excluded
    df = spark.createDataFrame(rows, "user_id long, tus long, v string")
    path = str(tmp_path / "ev_shh")
    df.coalesce(1).write.mode("overwrite").parquet(path)
    stream = spark.readStream.schema(df.schema).parquet(path)
    # capacity >= distinct: exact counts (the grading configuration)
    out = stateful_heavy_hitters(stream, "user_id", "tus", "v",
                                 capacity=8)
    run_stream_to_memory(out, "shh_test_out", output_mode="update")
    got = {(r["key"], r["value"]): r
           for r in spark.table("shh_test_out").collect()}
    assert got[(1, "a")]["count_est"] == 7
    assert got[(1, "b")]["count_est"] == 5
    assert got[(1, "a")]["n_events"] == 15
    assert got[(1, "a")]["n_tracked"] == 4
    assert got[(2, "x")]["count_est"] == 4   # NULL row never counted
    assert got[(2, "x")]["n_events"] == 4
    # tiny capacity: matches the Python Misra-Gries fold in event-time
    # order, and the guarantee holds (est >= true - n/(cap+1))
    out2 = stateful_heavy_hitters(stream, "user_id", "tus", "v",
                                  capacity=2)
    run_stream_to_memory(out2, "shh_test_out2", output_mode="update")
    got2 = {r["value"]: r["count_est"]
            for r in spark.table("shh_test_out2").collect()
            if r["key"] == 1}
    want, n = _py_mg(evs, 2)
    assert got2 == want
    for v, true in (("a", 7), ("b", 5)):
        assert got2.get(v, 0) >= true - n / 3
    with pytest.raises(ValueError):
        stateful_heavy_hitters(stream, capacity=0)


# ---------------------------------------------------------------------------
# embedding_drift
# ---------------------------------------------------------------------------
def test_embedding_drift_detects_shift_and_scale(spark):
    import math
    from spark_df_profiling_spark.operators.similarity import (
        embedding_drift)
    ref = spark.createDataFrame(
        [([1.0 + 0.1 * (i % 5), 2.0, -1.0],) for i in range(50)],
        "embedding array<double>")
    # dim 0 shifted by +10, dim 1 doubled scale, dim 2 unchanged
    new = spark.createDataFrame(
        [([11.0 + 0.1 * (i % 5), 2.0 + 0.2 * ((i % 5) - 2), -1.0],)
         for i in range(50)],
        "embedding array<double>")
    out = {r["dim"]: r for r in embedding_drift(ref, new).collect()}
    assert set(out) == {0, 1, 2}
    assert out[0]["n_ref"] == out[0]["n_new"] == 50
    # dim 0: huge standardized mean shift
    assert out[0]["mean_shift_z"] > 50
    # dim 1: no mean shift, std grows from 0 -> ratio NULL (std_ref 0)
    assert out[1]["mean_ref"] == pytest.approx(out[1]["mean_new"])
    assert out[1]["std_ratio"] is None
    # dim 2: identical -> shift NULL (both stds 0)
    assert out[2]["mean_shift_z"] is None
    # centroid cosine matches the hand-computed mean vectors
    ma = [1.2, 2.0, -1.0]
    mb = [11.2, 2.0, -1.0]
    dot = sum(x * y for x, y in zip(ma, mb))
    cos = dot / (math.sqrt(sum(x * x for x in ma))
                 * math.sqrt(sum(x * x for x in mb)))
    assert out[0]["centroid_cosine"] == pytest.approx(cos, rel=1e-9)
    with pytest.raises(ValueError):
        embedding_drift(ref, new.select(F.col("embedding").alias("e")))


# ---------------------------------------------------------------------------
# ks_by_group
# ---------------------------------------------------------------------------
def test_ks_by_group_matches_per_group_ks(spark):
    from spark_df_profiling_spark.operators.drift import (
        ks_2samp, ks_by_group)
    rows_a, rows_b = [], []
    for i in range(300):
        g = "en" if i % 3 else "de"
        rows_a.append((g, float((i * 7) % 50)))
        # 'de' drifts (+10 shift); 'en' stays identical
        rows_b.append((g, float((i * 7) % 50 + (10 if g == "de" else 0))))
    rows_a.append(("only_ref", 1.0))       # one-sided -> dropped
    rows_b.append((None, 1.0))             # NULL group -> excluded
    ra = spark.createDataFrame(rows_a, "g string, v double")
    rb = spark.createDataFrame(rows_b, "g string, v double")
    got = {r["g"]: r for r in ks_by_group(ra, rb, "v", "g").collect()}
    assert set(got) == {"en", "de"}
    import bisect
    for grp in ("en", "de"):
        solo = ks_2samp(ra.where(F.col("g") == grp),
                        rb.where(F.col("g") == grp), "v").collect()[0]
        r = got[grp]
        assert (r["n_ref"], r["n_new"]) == (solo["n_ref"],
                                            solo["n_new"]), grp
        assert r["d_stat"] == pytest.approx(solo["d_stat"],
                                            rel=1e-12), grp
        # exact-integer reference: d_numer and the SMALLEST value of
        # the true plateau.  (ks_2samp's float at_value can land
        # elsewhere on the plateau — |ca/na - cb/nb| splits integer
        # ties by ulps; the integer numerator here is tie-exact.)
        va = sorted(x[1] for x in rows_a if x[0] == grp)
        vb = sorted(x[1] for x in rows_b if x[0] == grp)
        na, nb = len(va), len(vb)
        plate = {}
        for v in sorted(set(va) | set(vb)):
            ca = bisect.bisect_right(va, v)
            cb = bisect.bisect_right(vb, v)
            plate[v] = abs(ca * nb - cb * na)
        mx = max(plate.values())
        assert r["d_numer"] == mx, grp
        assert r["at_value"] == min(v for v, n in plate.items()
                                    if n == mx), grp
    assert got["de"]["d_stat"] > got["en"]["d_stat"]
    assert got["en"]["d_stat"] == pytest.approx(0.0)
    with pytest.raises(ValueError):
        ks_by_group(ra, rb.drop("g"), "v", "g")


def test_ks_by_group_no_single_partition_window(spark):
    """The grouped KS must never window per group (a group's
    distinct-value frame can be row-sized): every window partitions by
    __pid."""
    import re
    from spark_df_profiling_spark.operators.drift import ks_by_group
    ra = spark.createDataFrame(
        [("g", float(i)) for i in range(200)], "g string, v double")
    rb = spark.createDataFrame(
        [("g", float(i) + 0.5) for i in range(200)],
        "g string, v double")
    plan = ks_by_group(ra, rb, "v", "g") \
        ._jdf.queryExecution().executedPlan().toString()
    for m in re.finditer(r"Window \[", plan):
        seg = plan[m.start():m.start() + 400]
        assert "__pid" in seg, f"unpartitioned window: {seg[:120]}"


# ---------------------------------------------------------------------------
# regression_report
# ---------------------------------------------------------------------------
def test_regression_report_matches_python(spark):
    import math
    from spark_df_profiling_spark.operators.evaluation import (
        regression_report)
    ys = [float((i * 7) % 13) for i in range(60)]
    ps = [y + ((i * 5) % 7 - 3) * 0.5 for i, y in enumerate(ys)]
    rows = ([("en", y, p) for y, p in zip(ys[:40], ps[:40])]
            + [("de", y, p) for y, p in zip(ys[40:], ps[40:])]
            + [("en", None, 1.0), (None, 1.0, 1.0)])
    df = spark.createDataFrame(rows, "g string, y double, p double")

    def ref(yv, pv):
        n = len(yv)
        errs = [b - a for a, b in zip(yv, pv)]
        mae = sum(abs(e) for e in errs) / n
        rmse = math.sqrt(sum(e * e for e in errs) / n)
        bias = sum(errs) / n
        my = sum(yv) / n
        sstot = sum((a - my) ** 2 for a in yv)
        r2 = 1 - sum(e * e for e in errs) / sstot
        return n, mae, rmse, bias, r2

    # ungrouped over ALL non-null rows (the NULL-group row counts here)
    yv = ys + [1.0]
    pv = ps + [1.0]
    r = regression_report(df, "y", "p").collect()[0]
    n, mae, rmse, bias, r2 = ref(yv, pv)
    assert r["n"] == n
    for k, want in (("mae", mae), ("rmse", rmse), ("bias", bias),
                    ("r2", r2)):
        assert r[k] == pytest.approx(want, rel=1e-9), k
    # grouped == per-group
    got = {x["g"]: x for x in
           regression_report(df, "y", "p", "g").collect()}
    assert set(got) == {"en", "de"}
    n, mae, rmse, bias, r2 = ref(ys[:40], ps[:40])
    assert got["en"]["n"] == n
    assert got["en"]["rmse"] == pytest.approx(rmse, rel=1e-9)
    assert got["en"]["r2"] == pytest.approx(r2, rel=1e-9)
    # constant labels: r2 NULL, perfect preds: r2 = 1
    const = spark.createDataFrame([(2.0, 3.0)] * 5, "y double, p double")
    assert regression_report(const, "y", "p").collect()[0]["r2"] is None
    perfect = spark.createDataFrame([(float(i), float(i))
                                     for i in range(5)],
                                    "y double, p double")
    pr = regression_report(perfect, "y", "p").collect()[0]
    assert pr["r2"] == pytest.approx(1.0) and pr["mae"] == 0.0
    with pytest.raises(ValueError):
        regression_report(df, "y", "nope")


# ---------------------------------------------------------------------------
# mixture_plan
# ---------------------------------------------------------------------------
def _py_waterfill(rows, budget, max_epochs):
    """Brute-force reference: iteratively cap saturated sources and
    redistribute."""
    caps = {s: t * max_epochs for s, t, _ in rows}
    ws = {s: w for s, _, w in rows}
    alloc, active, rem = {}, set(ws), budget
    while True:
        wsum = sum(ws[s] for s in active)
        if wsum == 0:
            break
        lam = rem / wsum
        sat = [s for s in active if caps[s] < lam * ws[s]]
        if not sat:
            for s in active:
                alloc[s] = lam * ws[s]
            break
        for s in sat:
            alloc[s] = caps[s]
            rem -= caps[s]
            active.remove(s)
        if not active:
            break
    for s in ws:
        alloc.setdefault(s, caps[s])
    return alloc


def test_mixture_plan_matches_waterfilling(spark):
    from spark_df_profiling_spark.operators.sampling import mixture_plan
    rows = [("tiny", 100, 0.30), ("small", 1000, 0.30),
            ("big", 100000, 0.25), ("huge", 10000000, 0.15)]
    df = spark.createDataFrame(rows, "source string, n_tokens long, "
                                     "weight double")
    for budget in (5_000.0, 200_000.0, 5_000_000.0):
        got = {r["source"]: r for r in
               mixture_plan(df, budget, max_epochs=4.0).collect()}
        want = _py_waterfill(rows, budget, 4.0)
        for s, t, w in rows:
            assert got[s]["target_tokens"] == pytest.approx(
                want[s], rel=1e-9), (budget, s)
            assert got[s]["epochs"] == pytest.approx(
                want[s] / t, rel=1e-9)
            assert got[s]["saturated"] == (
                want[s] == pytest.approx(t * 4.0)), (budget, s)
        # full budget is allocated (no source over its cap)
        assert sum(r["target_tokens"] for r in got.values()) == \
            pytest.approx(min(budget,
                              sum(t * 4.0 for _, t, _ in rows)))
        assert all(r["budget_unmet"] == pytest.approx(0.0)
                   for r in got.values())
    # budget beyond max_epochs passes over EVERYTHING: unmet > 0
    over = {r["source"]: r for r in
            mixture_plan(df, 1e9, max_epochs=4.0).collect()}
    total_cap = sum(t * 4.0 for _, t, _ in rows)
    assert all(r["saturated"] for r in over.values())
    assert over["tiny"]["budget_unmet"] == pytest.approx(1e9 - total_cap)
    assert over["tiny"]["target_tokens"] == pytest.approx(400.0)
    with pytest.raises(ValueError):
        mixture_plan(df, 0.0)
    with pytest.raises(Exception):
        bad = spark.createDataFrame([("x", 0, 0.5)],
                                    "source string, n_tokens long, "
                                    "weight double")
        mixture_plan(bad, 100.0).collect()


def test_exact_substring_spans_keep_first(spark):
    """keep_first=True: the canonical (smallest (id, pos)) occurrence
    of each repeated gram stays unflagged, so remove_spans keeps
    exactly one copy of a shared passage corpus-wide."""
    from spark_df_profiling_spark.operators.dedup import (
        exact_substring_spans, remove_spans)
    docs = _corpus()
    df = spark.createDataFrame(docs, "doc_id long, text string")
    spans = exact_substring_spans(df, n=5, min_count=2, cross_doc=True,
                                  keep_first=True)
    out = {r["doc_id"]: r for r in spans.collect()}
    # doc 1 holds the canonical copy of the shared paragraph: unflagged
    assert set(out) == {2, 3}
    assert (out[2]["span_start"], out[2]["span_end"]) == (12, 22)
    assert (out[3]["span_start"], out[3]["span_end"]) == (25, 35)
    cleaned = {r["doc_id"]: r for r in remove_spans(df, spans).collect()}
    # exactly ONE copy of the paragraph survives (doc 1's)
    assert "alpha" in cleaned[1]["text_clean"]
    assert "alpha" not in cleaned[2]["text_clean"]
    assert "alpha" not in cleaned[3]["text_clean"]
    # within-doc repeat with keep_first (cross_doc=False): the first
    # occurrence of doc 6's repeated run survives, the second is cut
    spans_wd = exact_substring_spans(df, n=5, min_count=2,
                                     cross_doc=False, keep_first=True)
    wd = [r for r in spans_wd.collect() if r["doc_id"] == 6]
    assert len(wd) == 1
    full = [r for r in exact_substring_spans(
        df, n=5, min_count=2, cross_doc=False).collect()
        if r["doc_id"] == 6]
    assert len(full) == 2
    assert wd[0]["span_start"] == max(r["span_start"] for r in full)

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

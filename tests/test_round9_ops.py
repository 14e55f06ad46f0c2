"""Round-9: grade the four r8-buzzer operators (format_patterns,
gini_coefficient, categorical_association, autocorr) + pin the ADVICE
fixes (fuzzy gram-cap groupBy counting, chi2 clamp, gini zero-mass
guard, merge_intervals min_gap validation)."""

import math
import random

import pytest
from pyspark.sql import functions as F

from spark_df_profiling_spark.operators.correlation import (
    autocorr, categorical_association)
from spark_df_profiling_spark.operators.frequency import (
    format_pattern_expr, format_patterns, gini_coefficient)
from spark_df_profiling_spark.operators.dedup import (
    fuzzy_pairs_levenshtein)
from spark_df_profiling_spark.operators.joins import merge_intervals


# ------------------------------------------- categorical_association
def _assoc_python(cells):
    """(a, b) -> count dict  ->  (n, r, c, dof, chi2, V, MI)."""
    n = sum(cells.values())
    ra = {}
    cb = {}
    for (a, b), o in cells.items():
        ra[a] = ra.get(a, 0) + o
        cb[b] = cb.get(b, 0) + o
    r, c = len(ra), len(cb)
    chi2 = 0.0
    mi = 0.0
    for a in ra:
        for b in cb:
            e = ra[a] * cb[b] / n
            o = cells.get((a, b), 0)
            chi2 += (o - e) ** 2 / e
            if o > 0:
                mi += (o / n) * math.log(o * n / (ra[a] * cb[b]))
    dof = (r - 1) * (c - 1)
    v = (math.sqrt(chi2 / (n * (min(r, c) - 1)))
         if min(r, c) > 1 else None)
    return n, r, c, dof, chi2, v, mi


def test_categorical_association_matches_python(spark):
    cells = {("x", "p"): 30, ("x", "q"): 10, ("y", "p"): 5,
             ("y", "q"): 25, ("z", "p"): 12}  # (z,q) is a ZERO cell
    rows = [(a, b) for (a, b), o in cells.items() for _ in range(o)]
    random.seed(9)
    random.shuffle(rows)
    df = spark.createDataFrame(rows, "a string, b string")
    got = categorical_association(df, "a", "b").collect()[0]
    n, r, c, dof, chi2, v, mi = _assoc_python(cells)
    assert got["n"] == n and got["r_levels"] == r
    assert got["c_levels"] == c and got["dof"] == dof
    assert got["chi2"] == pytest.approx(chi2, rel=1e-9)
    assert got["cramers_v"] == pytest.approx(v, rel=1e-9)
    assert got["mutual_info"] == pytest.approx(mi, rel=1e-9)


def test_categorical_association_nulls_dropped(spark):
    rows = [("x", "p"), ("x", None), (None, "p"), ("y", "q"),
            (None, None)] * 4
    df = spark.createDataFrame(rows, "a string, b string")
    got = categorical_association(df, "a", "b").collect()[0]
    # only (x,p) and (y,q) rows survive: perfect association, 2x2
    assert got["n"] == 8 and got["r_levels"] == 2
    assert got["cramers_v"] == pytest.approx(1.0, rel=1e-9)


def test_categorical_association_1x1_no_crash(spark):
    """1x1 table: dof=0, V undefined -> NULL (not an ANSI error), chi2
    clamped at 0 (the fp Σe_obs > n hazard lands exactly here)."""
    df = spark.createDataFrame([("x", "p")] * 7, "a string, b string")
    got = categorical_association(df, "a", "b").collect()[0]
    assert got["dof"] == 0 and got["cramers_v"] is None
    assert got["chi2"] == 0.0  # clamp: never a few-ulps negative
    assert not math.isnan(got["chi2"])


def test_categorical_association_independent_is_near_zero(spark):
    # exactly independent margins: chi2 analytic 0, fp may wobble
    rows = ([("x", "p")] * 6 + [("x", "q")] * 2
            + [("y", "p")] * 3 + [("y", "q")] * 1)
    df = spark.createDataFrame(rows, "a string, b string")
    got = categorical_association(df, "a", "b").collect()[0]
    assert got["chi2"] >= 0.0  # the greatest() clamp guarantees it
    assert got["chi2"] == pytest.approx(0.0, abs=1e-9)
    assert got["cramers_v"] == pytest.approx(0.0, abs=1e-6)
    assert got["mutual_info"] == pytest.approx(0.0, abs=1e-9)


# ----------------------------------------------------------- autocorr
def test_autocorr_matches_python(spark):
    random.seed(17)
    rows = []
    series = {}
    for k in ["u1", "u2"]:
        xs, x = [], 0.0
        for t in range(40):
            x = 0.8 * x + random.gauss(0, 1)  # AR(1), acf ~ 0.8
            xs.append(x)
            rows.append((k, float(t), x))
        series[k] = xs
    df = spark.createDataFrame(rows, "k string, ts double, v double")
    got = {r["k"]: r for r in autocorr(df, "ts", "v", "k").collect()}

    def pearson(xs, ys):
        n = len(xs)
        mx, my = sum(xs) / n, sum(ys) / n
        cov = sum((a - mx) * (b - my) for a, b in zip(xs, ys)) / (n - 1)
        sx = math.sqrt(sum((a - mx) ** 2 for a in xs) / (n - 1))
        sy = math.sqrt(sum((b - my) ** 2 for b in ys) / (n - 1))
        return cov / (sx * sy)

    for k, xs in series.items():
        exp = pearson(xs[1:], xs[:-1])
        assert got[k]["n_pairs"] == len(xs) - 1
        assert got[k]["acf"] == pytest.approx(exp, rel=1e-9)


def test_autocorr_constant_series_null_not_crash(spark):
    """Zero variance side -> NULL acf (corr() itself would ANSI-raise)."""
    rows = [("c", float(t), 5.0) for t in range(10)]
    rows += [("s", float(t), float(t % 3)) for t in range(10)]
    df = spark.createDataFrame(rows, "k string, ts double, v double")
    got = {r["k"]: r for r in autocorr(df, "ts", "v", "k").collect()}
    assert got["c"]["acf"] is None
    assert got["s"]["acf"] is not None


def test_autocorr_short_and_null_handling(spark):
    rows = [("one", 0.0, 1.0),                  # 1 row -> 0 pairs
            ("gap", 0.0, 1.0), ("gap", 1.0, None),
            ("gap", 2.0, 3.0)]                  # NULL breaks the pair
    df = spark.createDataFrame(rows, "k string, ts double, v double")
    got = {r["k"]: r for r in autocorr(df, "ts", "v", "k").collect()}
    assert got["one"]["n_pairs"] == 0 and got["one"]["acf"] is None
    assert got["gap"]["n_pairs"] == 0  # both endpoints must be non-NULL
    with pytest.raises(ValueError):
        autocorr(df, "ts", "v", "k", lag=0)


def test_autocorr_lag2(spark):
    rows = [("k", float(t), float(v))
            for t, v in enumerate([1, 9, 2, 8, 3, 7, 4, 6])]
    df = spark.createDataFrame(rows, "k string, ts double, v double")
    got = autocorr(df, "ts", "v", "k", lag=2).collect()[0]
    xs = [1, 9, 2, 8, 3, 7, 4, 6]
    cur, prev = xs[2:], xs[:-2]
    n = len(cur)
    mx, my = sum(cur) / n, sum(prev) / n
    cov = sum((a - mx) * (b - my) for a, b in zip(cur, prev)) / (n - 1)
    sx = math.sqrt(sum((a - mx) ** 2 for a in cur) / (n - 1))
    sy = math.sqrt(sum((b - my) ** 2 for b in prev) / (n - 1))
    assert got["n_pairs"] == n
    assert got["acf"] == pytest.approx(cov / (sx * sy), rel=1e-9)


# ---------------------------------------------------- format_patterns
def test_format_pattern_expr_classes(spark):
    df = spark.createDataFrame(
        [("Nov 2024",), ("ABC-123",), ("  x ",), ("écrit",), (None,)],
        "t string")
    got = [r[0] for r in df.select(
        format_pattern_expr("t")).collect()]
    assert got == ["Aa_9", "A-9", "_a_", "éa", None]
    raw = [r[0] for r in df.select(
        format_pattern_expr("t", collapse_runs=False)).collect()]
    assert raw == ["Aaa_9999", "AAA-999", "__a_", "éaaaa", None]


def test_format_patterns_topk_and_null(spark):
    rows = ([("2024-01-02", "A1")] * 5 + [("Jan 2, 2024", "B2")] * 3
            + [(None, "C3")] * 2)
    df = spark.createDataFrame(rows, "d string, code string")
    out = format_patterns(df, ["d", "code"], k=2).collect()
    by = {(r["column"], r["pattern"]): (r["cnt"], r["rank"])
          for r in out}
    assert by[("d", "9-9-9")] == (5, 1)
    assert by[("d", "Aa_9,_9")] == (3, 2)
    assert ("d", "<null>") not in by          # k=2 cuts the null row
    assert by[("code", "A9")] == (10, 1)
    with pytest.raises(ValueError):
        format_patterns(df, [], k=2)
    with pytest.raises(ValueError):
        format_patterns(df, ["d"], k=0)


def test_format_patterns_no_shuffle_before_agg(spark):
    """Pattern extraction is a projection; the only row-scale exchange
    is the (column, pattern) hash aggregate with a map-side partial."""
    df = spark.range(1000).select(F.col("id").cast("string").alias("s"))
    plan = (format_patterns(df, ["s"], k=3)
            ._jdf.queryExecution().executedPlan().toString())
    assert "partial_count" in plan, plan


# --------------------------------------------------- gini_coefficient
def _gini_python(vals):
    sv = sorted(vals)
    n = len(sv)
    tot = sum(sv)
    rank_sum = sum((i + 1) * v for i, v in enumerate(sv))
    return 2.0 * rank_sum / (n * tot) - (n + 1.0) / n


def test_gini_known_shapes(spark):
    # all-equal -> 0; one holder of everything -> 1 - 1/n
    eq = spark.createDataFrame([(5.0,)] * 40, "x double")
    assert (gini_coefficient(eq, "x").collect()[0]["gini"]
            == pytest.approx(0.0, abs=1e-12))
    conc = spark.createDataFrame([(0.0,)] * 99 + [(100.0,)], "x double")
    got = gini_coefficient(conc, "x").collect()[0]
    assert got["gini"] == pytest.approx(1 - 1 / 100, rel=1e-12)
    assert got["n"] == 100 and got["total"] == 100.0


def test_gini_random_matches_python_with_ties(spark):
    random.seed(31)
    vals = [float(random.randrange(0, 50)) for _ in range(3_000)]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    got = gini_coefficient(df, "x", num_buckets=7).collect()[0]
    assert got["gini"] == pytest.approx(_gini_python(vals), rel=1e-9)
    assert got["n"] == len(vals)
    assert got["total"] == pytest.approx(sum(vals), rel=1e-9)


def test_gini_guards(spark):
    with pytest.raises(ValueError, match="negative"):
        gini_coefficient(spark.createDataFrame(
            [(1.0,), (-2.0,)], "x double"), "x").collect()
    with pytest.raises(ValueError, match="zero total mass"):
        gini_coefficient(spark.createDataFrame(
            [(0.0,), (0.0,)], "x double"), "x").collect()
    with pytest.raises(ValueError, match="no non-NULL"):
        gini_coefficient(spark.createDataFrame(
            [(None,)], "x double"), "x").collect()


# ------------------------------------------------- ADVICE-fix pinning
def test_fuzzy_gram_cap_is_partial_agg_not_window(spark):
    """r8 ADVICE: the gram cap must count with a map-side-combined
    groupBy (partial aggregate), never a per-gram window that
    materializes the hottest gram in one task."""
    df = spark.range(200).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("prefix_"), F.col("id").cast("string"))
        .alias("text"))
    plan = (fuzzy_pairs_levenshtein(df, "text", "doc_id", max_dist=1,
                                    max_gram_bucket=50)
            ._jdf.queryExecution().executedPlan().toString())
    assert "partial_count" in plan, plan
    assert "RunningWindowFunction" not in plan
    assert "Window" not in plan, plan


def test_merge_intervals_rejects_negative_gap(spark):
    df = spark.createDataFrame([("k", 0.0, 1.0)],
                               "k string, s double, e double")
    with pytest.raises(ValueError, match="min_gap"):
        merge_intervals(df, "k", "s", "e", min_gap=-1)


def test_merge_intervals_null_keys_still_dropped(spark):
    """The dead struct predicate is gone; dropna(subset=keys) is the
    (only, sufficient) NULL-key filter."""
    rows = [("k", 0.0, 2.0), ("k", 1.0, 3.0), (None, 0.0, 9.0)]
    df = spark.createDataFrame(rows, "k string, s double, e double")
    got = merge_intervals(df, "k", "s", "e").collect()
    assert len(got) == 1
    assert (got[0]["span_start"], got[0]["span_end"],
            got[0]["n_merged"]) == (0.0, 3.0, 2)


# -------------------------------------- expanded public-suffix table
def test_registered_domain_multilevel_suffixes(spark):
    from spark_df_profiling_spark.operators.text import (
        registered_domain, url_host)
    rows = [("https://www.user1.github.io/repo",),   # PSL private
            ("https://shop.onet.com.pl/x",),         # ccTLD 2nd-level
            ("http://blog.x.blogspot.com/p",),
            ("https://api.foo.herokuapp.com/v1",),
            ("https://news.bbc.co.uk/story",),
            ("http://a.b.example.com/",),            # plain TLD
            ("https://localhost/x",)]                # single label
    df = spark.createDataFrame(rows, "u string")
    got = [r[0] for r in df.select(
        registered_domain(url_host("u")).alias("d")).collect()]
    assert got == ["user1.github.io", "onet.com.pl", "x.blogspot.com",
                   "foo.herokuapp.com", "bbc.co.uk", "example.com",
                   "localhost"]


# -------------------------------------------------- grouped HLL state
def test_hll_state_by_matches_exact_and_merges(spark):
    from spark_df_profiling_spark.operators.frequency import (
        hll_estimate_by, hll_merge_by, hll_state_by)
    rows = [(f"g{i % 3}", f"k{i % (200 * (i % 3 + 1))}")
            for i in range(5000)]
    df = spark.createDataFrame(rows, "g string, k string")
    exact = {r["g"]: r["n"] for r in
             df.groupBy("g").agg(
                 F.count_distinct("k").alias("n")).collect()}
    st = hll_state_by(df, "g", ["k"], p=12)
    est = {r["g"]: r["est_distinct"] for r in
           hll_estimate_by(st, "g", p=12).collect()}
    assert set(est) == set(exact)
    for g, n in exact.items():
        assert abs(est[g] - n) / n < 0.05  # ~3sigma at p=12
    # state bound: <= 2^12 rows per group
    per_g = {r["g"]: r["c"] for r in
             st.groupBy("g").agg(F.count(F.lit(1)).alias("c")).collect()}
    assert all(c <= 4096 for c in per_g.values())
    # merge of halves == full state, exactly (register-wise max)
    h1 = hll_state_by(df.where(F.xxhash64("k") % 2 == 0), "g", ["k"])
    h2 = hll_state_by(df.where(F.xxhash64("k") % 2 != 0), "g", ["k"])
    merged = hll_merge_by("g", h1, h2)
    assert (sorted(map(tuple, merged.collect()))
            == sorted(map(tuple, st.collect())))


# ------------------------------------------------------ canonical_url
def test_canonical_url_rules(spark):
    from spark_df_profiling_spark.operators.text import canonical_url
    cases = [
        ("HTTPS://Example.COM:443/a/?utm_source=x&b=2&utm_medium=y#f",
         "https://example.com/a?b=2"),
        ("http://example.com:80/", "http://example.com"),
        ("http://example.com:8080/x", "http://example.com:8080/x"),
        ("https://example.com/a/?z=1&a=2", "https://example.com/a?a=2&z=1"),
        ("https://example.com/Path/Sub/", "https://example.com/Path/Sub"),
        ("https://example.com/?fbclid=abc", "https://example.com"),
        ("https://user@example.com/x", "https://example.com/x"),
        ("not a url", None),
        (None, None),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "u string")
    got = [r[0] for r in df.select(canonical_url("u")).collect()]
    assert got == [e for _, e in cases]


def test_canonical_url_is_dedup_key(spark):
    from spark_df_profiling_spark.operators.text import canonical_url
    urls = ["https://a.com/x?utm_source=tw", "https://A.COM/x",
            "https://a.com/x/", "https://a.com/y"]
    df = spark.createDataFrame([(u,) for u in urls], "u string")
    n = (df.select(canonical_url("u").alias("c"))
         .distinct().count())
    assert n == 2  # three variants of /x collapse; /y stays


# ------------------------------------- minhash signature history dedup
def _hist_corpus(spark):
    base = [(i, " ".join(f"w{i}t{j}" for j in range(30)))
            for i in range(40)]
    hist = spark.createDataFrame(base, "doc_id long, text string")
    # batch: 10 exact copies, 10 near-dups (last token changed),
    # 10 fresh docs
    batch_rows = (
        [(1000 + i, t) for i, t in base[:10]]
        + [(2000 + i, t.rsplit(" ", 1)[0] + " xyzzy")
           for i, t in base[10:20]]
        + [(3000 + i, " ".join(f"f{i}q{j}" for j in range(30)))
           for i in range(10)])
    batch = spark.createDataFrame(batch_rows, "doc_id long, text string")
    return hist, batch


@pytest.mark.parametrize("hash_fn", ["xxhash64", "md5"])
def test_neardup_against_history_finds_planted(spark, hash_fn):
    from spark_df_profiling_spark.operators.dedup import (
        minhash_signature_state, neardup_against_history)
    hist, batch = _hist_corpus(spark)
    state = minhash_signature_state(hist, "text", "doc_id",
                                    num_hashes=16, hash_fn=hash_fn)
    got = neardup_against_history(batch, state, "text", "doc_id",
                                  num_hashes=16, min_agreement=0.5,
                                  hash_fn=hash_fn).collect()
    by_batch = {}
    for r in got:
        by_batch.setdefault(r["id"], []).append(r)
    # every exact copy matches its original at agreement 1.0
    for i in range(10):
        ms = by_batch[1000 + i]
        assert any(m["hist_id"] == i and m["sig_agreement"] == 1.0
                   for m in ms)
    # every near-dup matches its original above threshold
    for i in range(10, 20):
        ms = by_batch.get(2000 + i, [])
        assert any(m["hist_id"] == i for m in ms), f"missed near-dup {i}"
    # fresh docs match nothing
    assert not any(3000 <= k < 3010 for k in by_batch)


def test_minhash_signature_state_is_compact_and_deterministic(spark):
    from spark_df_profiling_spark.operators.dedup import (
        minhash_signature_state)
    hist, _ = _hist_corpus(spark)
    s1 = minhash_signature_state(hist, "text", "doc_id", num_hashes=8)
    s2 = minhash_signature_state(hist, "text", "doc_id", num_hashes=8)
    r1 = sorted((r["id"], tuple(r["sig"])) for r in s1.collect())
    r2 = sorted((r["id"], tuple(r["sig"])) for r in s2.collect())
    assert r1 == r2
    assert all(len(sig) == 8 for _, sig in r1)
    # short docs excluded (no shingles)
    short = spark.createDataFrame([(1, "one two")],
                                  "doc_id long, text string")
    assert minhash_signature_state(short, "text", "doc_id").count() == 0


def test_neardup_history_validates_config(spark):
    from spark_df_profiling_spark.operators.dedup import (
        neardup_against_history)
    hist, batch = _hist_corpus(spark)
    from spark_df_profiling_spark.operators.dedup import (
        minhash_signature_state)
    st = minhash_signature_state(hist, "text", "doc_id")
    with pytest.raises(ValueError):
        neardup_against_history(batch, st, "text", "doc_id",
                                num_hashes=16, rows_per_band=3)
    with pytest.raises(ValueError):
        neardup_against_history(batch, st, "text", "doc_id",
                                min_agreement=1.5)


# ------------------------------------------------- pmi_collocations
def test_pmi_collocations_matches_python(spark):
    from spark_df_profiling_spark.operators.text import pmi_collocations
    docs = ["new york is big", "new york has parks",
            "big parks in new york", "york new"] * 3
    df = spark.createDataFrame([(t,) for t in docs], "text string")
    got = pmi_collocations(df, "text", k=100, min_count=2).collect()

    import math as m
    uni, bg = {}, {}
    nt = nb = 0
    for t in docs:
        toks = [x for x in t.lower().split(" ") if x]
        nt += len(toks)
        nb += max(len(toks) - 1, 0)
        for w in toks:
            uni[w] = uni.get(w, 0) + 1
        for a, b in zip(toks, toks[1:]):
            bg[(a, b)] = bg.get((a, b), 0) + 1
    exp = {}
    for (a, b), c12 in bg.items():
        if c12 >= 2:
            exp[(a, b)] = m.log(c12 * nt * nt / (nb * uni[a] * uni[b]))
    assert {(r["w1"], r["w2"]) for r in got} == set(exp)
    for r in got:
        assert r["pmi"] == pytest.approx(exp[(r["w1"], r["w2"])],
                                         rel=1e-12)
        assert r["c12"] == bg[(r["w1"], r["w2"])]
    # ("new","york") is the planted collocation: top-pmi among 2+ pairs
    ranked = sorted(got, key=lambda r: (-r["pmi"], r["w1"], r["w2"]))
    assert (ranked[0]["w1"], ranked[0]["w2"]) in exp
    with pytest.raises(ValueError):
        pmi_collocations(df, "text", k=0)


def test_pmi_min_count_floors_hapax(spark):
    from spark_df_profiling_spark.operators.text import pmi_collocations
    docs = ["rare pair here"] + ["common words appear often"] * 10
    df = spark.createDataFrame([(t,) for t in docs], "text string")
    got = pmi_collocations(df, "text", k=10, min_count=2).collect()
    assert all(r["c12"] >= 2 for r in got)
    assert not any(r["w1"] == "rare" for r in got)


# ------------------------------------------------ FD strength / keys
def test_fd_strength_exact_and_violations(spark):
    from spark_df_profiling_spark.operators.correlation import fd_strength
    rows = ([("a", "x")] * 5 + [("b", "y")] * 3
            + [("c", "x")] * 3 + [("c", "z")] * 1   # c violates
            + [(None, "q"), ("d", None)])           # nulls dropped
    df = spark.createDataFrame(rows, "det string, dep string")
    got = fd_strength(df, "det", "dep").collect()[0]
    assert got["n"] == 12 and got["n_groups"] == 3
    assert got["n_violating"] == 1
    assert got["strength"] == pytest.approx(11 / 12)
    assert got["is_exact"] is False
    exact = fd_strength(df.where(F.col("dep") != "z"), "det", "dep") \
        .collect()[0]
    assert exact["is_exact"] is True
    assert exact["strength"] == 1.0


def test_fd_strength_composite_determinant(spark):
    from spark_df_profiling_spark.operators.correlation import fd_strength
    rows = [("a", 1, "x"), ("a", 2, "y"), ("a", 1, "x"), ("b", 1, "y")]
    df = spark.createDataFrame(rows, "d1 string, d2 int, dep string")
    got = fd_strength(df, ["d1", "d2"], "dep").collect()[0]
    assert got["is_exact"] is True and got["n_groups"] == 3


def test_key_candidates_exact_and_approx(spark):
    from spark_df_profiling_spark.operators.correlation import (
        key_candidates)
    rows = [(i, i % 10, f"s{i % 3}") for i in range(100)]
    df = spark.createDataFrame(rows, "a long, b long, c string")
    ex = {r["combo"]: r for r in
          key_candidates(df, ["a", "b", "c"], exact=True).collect()}
    assert ex["a"]["is_unique"] is True
    assert ex["b"]["is_unique"] is False and ex["b"]["n_distinct"] == 10
    assert ex["b+c"]["n_distinct"] == 30
    assert ex["a+b"]["is_unique"] is True
    assert all(r["n"] == 100 for r in ex.values())
    ap = {r["combo"]: r for r in
          key_candidates(df, ["a", "b", "c"]).collect()}
    assert set(ap) == set(ex)
    assert all(r["is_unique"] is None for r in ap.values())
    for k in ex:
        assert abs(ap[k]["n_distinct"] - ex[k]["n_distinct"]) \
            <= max(3, 0.1 * ex[k]["n_distinct"])


def test_key_candidates_null_rows_count_as_dups(spark):
    from spark_df_profiling_spark.operators.correlation import (
        key_candidates)
    df = spark.createDataFrame([(None,), (None,), (1,)], "a int")
    got = key_candidates(df, ["a"], max_combo=1, exact=True).collect()[0]
    assert got["n_distinct"] == 2  # NULL is a marked value, not dropped
    assert got["is_unique"] is False


# -------------------------------------------- mergeable corr state
def test_corr_state_merge_equals_full(spark):
    from spark_df_profiling_spark.operators.incremental import (
        corr_from_state, corr_merge, corr_state)
    random.seed(23)
    rows = [(float(i % 97), random.gauss(0, 1) + 0.3 * (i % 97),
             random.gauss(5, 2)) for i in range(4000)]
    df = spark.createDataFrame(rows, "x double, y double, z double")
    cols = ["x", "y", "z"]
    full = {(r["col_x"], r["col_y"]): r["rho"]
            for r in corr_from_state(corr_state(df, cols),
                                     cols).collect()}
    # reference: Spark's own corr
    for (a, b), rho in full.items():
        exp = df.stat.corr(a, b)
        assert rho == pytest.approx(exp, rel=1e-9), (a, b)
    # merged halves must equal the full-state matrix (Chan update)
    h1 = corr_state(df.where(F.xxhash64("x", "y", "z") % 2 == 0), cols)
    h2 = corr_state(df.where(F.xxhash64("x", "y", "z") % 2 != 0), cols)
    merged = {(r["col_x"], r["col_y"]): r["rho"]
              for r in corr_from_state(corr_merge(h1, h2, cols),
                                       cols).collect()}
    for k in full:
        assert merged[k] == pytest.approx(full[k], rel=1e-9)


def test_corr_state_empty_side_and_nulls(spark):
    from spark_df_profiling_spark.operators.incremental import (
        corr_from_state, corr_merge, corr_state)
    rows = [(1.0, 2.0), (2.0, 4.0), (3.0, 7.0), (None, 9.0),
            (4.0, None)]
    df = spark.createDataFrame(rows, "x double, y double")
    cols = ["x", "y"]
    st = corr_state(df, cols)
    assert st.collect()[0]["n"] == 3  # listwise deletion
    empty = corr_state(df.where(F.lit(False)), cols)
    merged = corr_merge(st, empty, cols)
    assert (merged.collect() == st.collect())
    merged2 = corr_merge(empty, st, cols)
    assert (merged2.collect() == st.collect())
    # constant column -> NULL rho, no ANSI error
    const = spark.createDataFrame([(1.0, 2.0)] * 5, "x double, y double")
    r = corr_from_state(corr_state(const, cols), cols).collect()[0]
    assert r["rho"] is None
    with pytest.raises(ValueError):
        corr_state(df, ["x"])


# ------------------------------------------------- structure_stats
def test_structure_stats_counts(spark):
    from spark_df_profiling_spark.operators.text import structure_stats
    doc = ("# Title\n\nSome prose here.\n\n## Section\n"
           "- item one\n* item two\n\n```\ncode here\n```\n"
           "A [link](http://x.y) and <b>bold</b> <br/>\n"
           "| a | b |\n| 1 | 2 |\n")
    plain = "just plain prose with no structure at all"
    df = spark.createDataFrame([(1, doc), (2, plain)],
                               "doc_id long, text string")
    got = {r["doc_id"]: r for r in
           structure_stats(df, "text").collect()}
    assert got[1]["st_headers"] == 2
    assert got[1]["st_fences"] == 2
    assert got[1]["st_bullets"] == 2
    assert got[1]["st_links"] == 1
    assert got[1]["st_tables"] == 2
    assert got[1]["st_html"] == 3
    assert got[1]["st_any"] is True
    assert got[2]["st_any"] is False
    assert all(got[2][f"st_{k}"] == 0 for k in
               ["headers", "fences", "bullets", "links", "tables",
                "html"])


# -------------------------------------------------- bigram_logprob
def test_bigram_logprob_matches_python(spark):
    from spark_df_profiling_spark.operators.text import bigram_logprob
    import math as m
    docs = [(1, "a b a b a"), (2, "a b c"), (3, "c c c c"),
            (4, "solo")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r["doc_id"]: r for r in
           bigram_logprob(df, "text", "doc_id", k_smooth=0.5).collect()}
    uni, bg = {}, {}
    for _, t in docs:
        toks = [x for x in t.split(" ") if x]
        for w in toks:
            uni[w] = uni.get(w, 0) + 1
        for a, b in zip(toks, toks[1:]):
            bg[(a, b)] = bg.get((a, b), 0) + 1
    V = len(uni)
    for i, t in docs:
        toks = [x for x in t.split(" ") if x]
        prs = list(zip(toks, toks[1:]))
        if not prs:
            assert i not in got  # single-token doc has no row
            continue
        exp = sum(m.log((bg[p] + 0.5) / (uni[p[0]] + 0.5 * V))
                  for p in prs) / len(prs)
        assert got[i]["n_bigrams"] == len(prs)
        assert got[i]["blp_mean"] == pytest.approx(exp, rel=1e-12)
    # the repetitive doc ("c c c c") is MORE typical of its own pairs
    # than the rare transition doc
    assert got[3]["blp_mean"] > got[2]["blp_mean"]
    with pytest.raises(ValueError):
        bigram_logprob(df, "text", "doc_id", k_smooth=0)


# ---------------------------------------------------- jarque_bera
def test_profile_jarque_bera_from_moments(spark):
    from spark_df_profiling_spark import profile
    from spark_df_profiling_spark.config import EXACT_CONFIG
    random.seed(41)
    rows = [(random.gauss(0, 1), float(i % 7)) for i in range(2000)]
    df = spark.createDataFrame(rows, "g double, u double")
    prof = {r["column"]: r for r in
            profile(df, EXACT_CONFIG).collect()}
    for c in ("g", "u"):
        r = prof[c]
        exp = r["count"] / 6.0 * (r["skewness"] ** 2
                                  + r["kurtosis"] ** 2 / 4.0)
        assert r["jarque_bera"] == pytest.approx(exp, rel=1e-12)
    # a 7-level uniform staircase is decidedly non-normal: its excess
    # kurtosis is strongly negative, JB far above the 5% cutoff 5.991
    assert prof["u"]["jarque_bera"] > 5.991


# ------------------------------------------------ invariant properties
def test_canonical_url_idempotent(spark):
    """canon(canon(u)) == canon(u) — the output must be a fixed point,
    otherwise repeated pipeline passes would keep rewriting keys."""
    from spark_df_profiling_spark.operators.text import canonical_url
    urls = ["HTTPS://Example.COM:443/a/?utm_source=x&b=2&z=1#f",
            "http://a.b.c.com:8080/Deep/Path/?q=1&a=2",
            "https://example.com", "http://x.io/p?utm_campaign=c",
            "https://example.com/a%20b?x=%C3%A9"]
    df = spark.createDataFrame([(u,) for u in urls], "u string")
    once = df.select(canonical_url("u").alias("c1"))
    twice = once.select(F.col("c1"),
                        canonical_url(F.col("c1")).alias("c2"))
    for r in twice.collect():
        assert r["c2"] == r["c1"], r


def test_corr_merge_is_associative_and_commutative(spark):
    from spark_df_profiling_spark.operators.incremental import (
        corr_from_state, corr_merge, corr_state)
    random.seed(47)
    rows = [(random.gauss(0, 1), random.gauss(0, 2)) for _ in range(900)]
    df = spark.createDataFrame(rows, "x double, y double")
    cols = ["x", "y"]
    s = [corr_state(df.where(F.pmod(F.xxhash64("x", "y"),
                                    F.lit(3)) == i), cols)
         for i in range(3)]

    def rho(state):
        return corr_from_state(state, cols).collect()[0]["rho"]

    left = corr_merge(corr_merge(s[0], s[1], cols), s[2], cols)
    right = corr_merge(s[0], corr_merge(s[1], s[2], cols), cols)
    swapped = corr_merge(s[2], corr_merge(s[1], s[0], cols), cols)
    r0 = rho(left)
    assert rho(right) == pytest.approx(r0, rel=1e-12)
    assert rho(swapped) == pytest.approx(r0, rel=1e-12)
    assert r0 == pytest.approx(rho(corr_state(df, cols)), rel=1e-9)


def test_hll_merge_by_idempotent_and_commutative(spark):
    from spark_df_profiling_spark.operators.frequency import (
        hll_merge_by, hll_state_by)
    rows = [(f"g{i % 2}", f"k{i}") for i in range(500)]
    df = spark.createDataFrame(rows, "g string, k string")
    st = hll_state_by(df, "g", ["k"])
    # merging a state with itself is a no-op (max is idempotent)
    self_merged = hll_merge_by("g", st, st)
    assert (sorted(map(tuple, self_merged.collect()))
            == sorted(map(tuple, st.collect())))


def test_gini_scale_invariant(spark):
    """Gini is invariant under positive scaling of the values."""
    from spark_df_profiling_spark.operators.frequency import (
        gini_coefficient)
    random.seed(53)
    vals = [float(random.randrange(1, 100)) for _ in range(800)]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    g1 = gini_coefficient(df, "x").collect()[0]["gini"]
    df7 = spark.createDataFrame([(v * 7.0,) for v in vals], "x double")
    g7 = gini_coefficient(df7, "x").collect()[0]["gini"]
    assert g7 == pytest.approx(g1, rel=1e-12)


# ------------------------------------- label centroids / margins
def test_label_centroids_and_margins(spark):
    from spark_df_profiling_spark.operators.similarity import (
        centroid_margin_stats, label_centroids)
    random.seed(61)
    rows = []
    protos = {0: [10.0, 0.0, 0.0], 1: [0.0, 10.0, 0.0]}
    vid = 0
    for lbl, p in protos.items():
        for _ in range(20):
            rows.append((vid, lbl,
                         [x + random.gauss(0, 0.1) for x in p]))
            vid += 1
    # one planted mislabel: a label-0 point sitting on prototype 1
    rows.append((vid, 0, [0.0, 10.0, 0.05]))
    df = spark.createDataFrame(rows,
                               "vec_id long, label long, "
                               "embedding array<double>")
    cents = {r["label"]: r for r in label_centroids(df).collect()}
    assert cents[1]["n"] == 20 and len(cents[1]["centroid"]) == 3
    assert cents[1]["centroid"][1] == pytest.approx(10.0, abs=0.1)
    got = {r["label"]: r for r in centroid_margin_stats(df).collect()}
    assert got[1]["n_neg_margin"] == 0
    assert got[1]["avg_margin"] > 0.5
    assert got[0]["n_neg_margin"] == 1  # exactly the planted point
    assert got[0]["n"] == 21


def test_label_centroids_null_rows_dropped(spark):
    from spark_df_profiling_spark.operators.similarity import (
        label_centroids)
    rows = [(1, 0, [1.0, 2.0]), (2, None, [9.0, 9.0]),
            (3, 0, None)]
    df = spark.createDataFrame(rows, "vec_id long, label int, "
                                     "embedding array<double>")
    got = label_centroids(df).collect()
    assert len(got) == 1 and got[0]["n"] == 1
    assert got[0]["centroid"] == [1.0, 2.0]


# ---------------------------------------------- containment_pairs
def test_containment_pairs_finds_embedded_quote(spark):
    from spark_df_profiling_spark.operators.dedup import containment_pairs
    base = " ".join(f"w{j}" for j in range(40))
    quote = " ".join(f"w{j}" for j in range(10, 28))  # strict subset
    other = " ".join(f"z{j}" for j in range(40))
    rows = [(1, base), (2, quote), (3, other)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {(r["id_a"], r["id_b"]): r for r in
           containment_pairs(df, "text", "doc_id",
                             min_containment=0.9).collect()}
    assert (1, 2) in got
    r = got[(1, 2)]
    assert r["containment"] == pytest.approx(1.0)
    assert r["jaccard"] < 0.5  # jaccard alone would have missed it
    assert not any(3 in k for k in got)
    with pytest.raises(ValueError):
        containment_pairs(df, "text", "doc_id", min_containment=2.0)


# --------------------------------------------------- JSD drift
def test_jsd_matches_python_and_bounds(spark):
    from spark_df_profiling_spark.operators.drift import (
        jsd_categorical, jsd_numeric)
    import math as m
    ref = spark.createDataFrame(
        [("a",)] * 60 + [("b",)] * 30 + [("c",)] * 10, "v string")
    new = spark.createDataFrame(
        [("a",)] * 30 + [("b",)] * 30 + [("d",)] * 40, "v string")
    got = jsd_categorical(ref, new, ["v"]).collect()[0]

    p = {"a": 0.6, "b": 0.3, "c": 0.1, "d": 0.0}
    q = {"a": 0.3, "b": 0.3, "c": 0.0, "d": 0.4}
    exp = 0.0
    for k in p:
        mm = (p[k] + q[k]) / 2
        if p[k] > 0:
            exp += 0.5 * p[k] * m.log(p[k] / mm)
        if q[k] > 0:
            exp += 0.5 * q[k] * m.log(q[k] / mm)
    assert got["jsd"] == pytest.approx(exp, rel=1e-12)
    # identical distributions -> 0; disjoint -> ln 2
    same = jsd_categorical(ref, ref, ["v"]).collect()[0]
    assert same["jsd"] == pytest.approx(0.0, abs=1e-12)
    disj = jsd_categorical(
        spark.createDataFrame([("x",)] * 5, "v string"),
        spark.createDataFrame([("y",)] * 5, "v string"),
        ["v"]).collect()[0]
    assert disj["jsd"] == pytest.approx(m.log(2), rel=1e-12)
    # numeric path shares the PSI binning and stays in bounds
    r2 = spark.range(1000).select((F.col("id") % 100).cast("double")
                                  .alias("x"))
    n2 = spark.range(1000).select(((F.col("id") % 100) + 50)
                                  .cast("double").alias("x"))
    j = jsd_numeric(r2, n2, ["x"], bins=10).collect()[0]["jsd"]
    assert 0.0 < j < m.log(2) + 1e-12


# ---------------------------------------------------- topk_by_group
def test_topk_by_group_matches_python(spark):
    from spark_df_profiling_spark.operators.frequency import (
        topk_by_group)
    random.seed(71)
    rows = [(f"g{i % 3}", f"v{random.randrange(0, 8)}")
            for i in range(600)]
    df = spark.createDataFrame(rows, "g string, v string")
    got = [(r["g"], r["value"], r["cnt"], r["rank"]) for r in
           topk_by_group(df, "g", "v", k=3,
                         sub_partitions=4).collect()]
    cnt = {}
    for g, v in rows:
        cnt[(g, v)] = cnt.get((g, v), 0) + 1
    exp = []
    for g in {"g0", "g1", "g2"}:
        vals = sorted(((c, v) for (gg, v), c in cnt.items() if gg == g),
                      key=lambda t: (-t[0], t[1]))[:3]
        exp += [(g, v, c, i + 1) for i, (c, v) in enumerate(vals)]
    assert sorted(got) == sorted(exp)
    # NULL values excluded; NULL group forms its own group
    rows2 = [("a", None), (None, "x"), (None, "x"), ("a", "y")]
    df2 = spark.createDataFrame(rows2, "g string, v string")
    got2 = topk_by_group(df2, "g", "v", k=1).collect()
    by_g = {r["g"]: (r["value"], r["cnt"]) for r in got2}
    assert by_g["a"] == ("y", 1) and by_g[None] == ("x", 2)
    with pytest.raises(ValueError):
        topk_by_group(df, "g", "v", k=0)


# -------------------------------------------------- rolling_anomaly
def test_rolling_anomaly_flags_spike(spark):
    from spark_df_profiling_spark.operators.groupby import (
        rolling_anomaly)
    rows = [("u", float(t), 10.0 + 0.1 * (t % 3)) for t in range(20)]
    rows.append(("u", 20.0, 500.0))            # the spike
    rows.append(("u", 21.0, 10.1))
    df = spark.createDataFrame(rows, "k string, ts double, v double")
    got = {r["ts"]: r for r in
           rolling_anomaly(df, "ts", "k", "v", window=10.0,
                           z_threshold=2.0).collect()}
    assert got[20.0]["is_anomaly"] is True
    assert got[20.0]["z"] > 2.0
    assert got[5.0]["is_anomaly"] is False
    # warm-up rows (frame < min_points) carry NULL z
    assert got[0.0]["z"] is None and got[0.0]["is_anomaly"] is None


def test_rolling_anomaly_constant_baseline_no_crash(spark):
    from spark_df_profiling_spark.operators.groupby import (
        rolling_anomaly)
    rows = [("u", float(t), 5.0) for t in range(10)]
    df = spark.createDataFrame(rows, "k string, ts double, v double")
    got = rolling_anomaly(df, "ts", "k", "v", window=100.0).collect()
    assert all(r["z"] is None for r in got)  # std 0 -> NULL, no error
    with pytest.raises(ValueError):
        rolling_anomaly(df, "ts", "k", "v", 10.0, z_threshold=0)


def test_rolling_stats_std_matches_python(spark):
    from spark_df_profiling_spark.operators.groupby import rolling_stats
    import statistics
    vals = [3.0, 7.0, 1.0, 9.0, 4.0]
    rows = [("u", float(t), v) for t, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "k string, ts double, v double")
    got = {r["ts"]: r["roll_std"] for r in
           rolling_stats(df, "ts", "k", "v", window=2.0,
                         stats=["std"]).collect()}
    for t in range(len(vals)):
        frame = vals[max(0, t - 2):t + 1]
        exp = statistics.stdev(frame) if len(frame) > 1 else None
        if exp is None:
            assert got[float(t)] is None
        else:
            assert got[float(t)] == pytest.approx(exp, rel=1e-12)


# -------------------------------------------- rolling_stats_bucketed
def test_rolling_stats_bucketed_matches_python(spark):
    from spark_df_profiling_spark.operators.groupby import (
        rolling_stats_bucketed)
    import statistics
    random.seed(83)
    # sparse timeline with gaps — the empty-bucket hazard
    events = sorted(random.sample(range(0, 400), 60))
    vals = {t: random.uniform(0, 100) for t in events}
    rows = [("u", float(t), vals[t]) for t in events]
    df = spark.createDataFrame(rows, "k string, ts double, v double")
    window, bpw = 40.0, 8          # gran = 5s
    got = {r["bucket_start"]: r for r in
           rolling_stats_bucketed(df, "ts", "k", "v", window,
                                  bpw).collect()}
    gran = window / bpw
    buckets = sorted({int(t // gran) for t in events})
    for b in buckets:
        span = [vals[t] for t in events
                if (b - bpw + 1) * gran <= t < (b + 1) * gran]
        r = got[b * gran]
        assert r["roll_count"] == len(span)
        assert r["roll_sum"] == pytest.approx(sum(span), rel=1e-12)
        assert r["roll_min"] == pytest.approx(min(span))
        assert r["roll_max"] == pytest.approx(max(span))
        assert r["roll_mean"] == pytest.approx(
            sum(span) / len(span), rel=1e-12)
        if len(span) > 1:
            assert r["roll_std"] == pytest.approx(
                statistics.stdev(span), rel=1e-6)
        assert r["window_start"] == pytest.approx(
            (b + 1) * gran - window)
    with pytest.raises(ValueError):
        rolling_stats_bucketed(df, "ts", "k", "v", -1.0)


# ------------------------------------- rolling_anomaly_bucketed
def test_rolling_anomaly_bucketed_flags_spike_excl_self(spark):
    from spark_df_profiling_spark.operators.groupby import (
        rolling_anomaly_bucketed)
    # steady stream then a spike: baseline comes from the PREVIOUS
    # bucket, so the spike cannot dilute it
    rows = [("u", float(t), 10.0 + 0.1 * (t % 5)) for t in range(64)]
    rows.append(("u", 64.0, 900.0))
    df = spark.createDataFrame(rows, "k string, ts double, v double")
    got = {r["ts"]: r for r in
           rolling_anomaly_bucketed(df, "ts", "k", "v", window=32.0,
                                    buckets_per_window=8,
                                    z_threshold=3.0).collect()}
    assert got[64.0]["is_anomaly"] is True
    assert got[64.0]["z"] > 100  # undiluted baseline -> huge z
    assert got[30.0]["is_anomaly"] is False
    # events in the FIRST occupied bucket have no previous bucket
    assert got[0.0]["z"] is None
    with pytest.raises(ValueError):
        rolling_anomaly_bucketed(df, "ts", "k", "v", 32.0,
                                 min_points=1)


def test_rolling_anomaly_bucketed_gap_restarts_warmup(spark):
    from spark_df_profiling_spark.operators.groupby import (
        rolling_anomaly_bucketed)
    rows = ([("u", float(t), 5.0 + (t % 3)) for t in range(16)]
            + [("u", 200.0, 6.0)])   # long gap -> empty prev bucket
    df = spark.createDataFrame(rows, "k string, ts double, v double")
    got = {r["ts"]: r for r in
           rolling_anomaly_bucketed(df, "ts", "k", "v", window=16.0,
                                    buckets_per_window=4).collect()}
    assert got[200.0]["z"] is None  # no occupied previous bucket

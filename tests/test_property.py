"""Property-based checks (hypothesis): the numeric profile kernels must
agree with a plain-python reference on arbitrary value lists — nulls,
signed zeros, and infinities included.  Values are magnitude-bounded so
the python sum and Spark's partial-agg sum differ only by ulps (the
engine's fp-order caveat is covered by the sig-digit oracle compare, not
here).  Degenerate inputs (all-null, constant) legitimately classify as
CONST per reference semantics and skip numeric stats — the property
branches on the resolved class, same as the engine."""

import math

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

finite = st.floats(allow_nan=False, allow_infinity=False,
                   min_value=-1e6, max_value=1e6)
values = st.lists(
    st.one_of(st.none(), finite,
              st.just(float("inf")), st.just(float("-inf"))),
    min_size=1, max_size=40)


@given(values)
@settings(max_examples=8, deadline=None, derandomize=True,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_numeric_profile_matches_python(spark, data):
    from spark_df_profiling_spark import profile

    df = spark.createDataFrame([(v,) for v in data], "x double")
    r = profile(df).collect()[0]
    non_null = [v for v in data if v is not None]

    # universal stats hold for every type class
    assert r["n"] == len(data)
    assert r["n_missing"] == data.count(None)
    assert r["count"] == len(non_null)
    assert r["distinct_count"] == len(set(non_null))

    if len(set(non_null)) <= 1:
        # all-null or constant → CONST class, numeric stats skipped
        # (reference describe_constant_1d semantics)
        assert r["type_class"] == "CONST"
        return
    assert r["type_class"] == "NUM"
    assert r["n_infinite"] == sum(1 for v in non_null if math.isinf(v))
    assert r["n_zeros"] == sum(1 for v in non_null if v == 0)
    assert r["min_num"] == min(non_null)
    assert r["max_num"] == max(non_null)
    want_mean = sum(non_null) / len(non_null)
    if math.isnan(want_mean):        # +inf and -inf both present
        assert r["mean"] is None or math.isnan(r["mean"])
    elif math.isinf(want_mean):
        assert r["mean"] == want_mean
    else:
        assert r["mean"] == pytest.approx(want_mean, rel=1e-9, abs=1e-9)


cat_values = st.lists(
    st.one_of(st.none(), st.text(
        alphabet=st.characters(min_codepoint=32, max_codepoint=0x2FA1),
        max_size=12)),
    min_size=1, max_size=40)


@given(cat_values)
@settings(max_examples=8, deadline=None, derandomize=True,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_categorical_profile_matches_python(spark, data):
    from pyspark.sql import types as T

    from spark_df_profiling_spark import profile

    schema = T.StructType([T.StructField("x", T.StringType(), True)])
    df = spark.createDataFrame([(v,) for v in data], schema)
    r = profile(df).collect()[0]
    non_null = [v for v in data if v is not None]

    assert r["n"] == len(data)
    assert r["n_missing"] == data.count(None)
    assert r["count"] == len(non_null)
    assert r["distinct_count"] == len(set(non_null))
    if len(set(non_null)) <= 1:
        assert r["type_class"] == "CONST"
    elif len(set(non_null)) == len(data):
        assert r["type_class"] == "UNIQUE"
    else:
        assert r["type_class"] == "CAT"
        # mode = most frequent value, ties broken by value (deterministic)
        from collections import Counter
        counts = Counter(non_null)
        best = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        top_freq = (r["freq"] or [])[0]
        assert top_freq["cnt"] == best[1]
        assert top_freq["value"] == best[0]


@given(st.lists(st.one_of(
    st.none(),
    st.dates(min_value=__import__("datetime").date(1970, 1, 2),
             max_value=__import__("datetime").date(2100, 1, 1))),
    min_size=1, max_size=30))
@settings(max_examples=6, deadline=None, derandomize=True,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_date_profile_matches_python(spark, data):
    from pyspark.sql import types as T

    from spark_df_profiling_spark import profile

    schema = T.StructType([T.StructField("d", T.DateType(), True)])
    df = spark.createDataFrame([(v,) for v in data], schema)
    r = profile(df).collect()[0]
    non_null = [v for v in data if v is not None]
    assert r["n"] == len(data)
    assert r["count"] == len(non_null)
    if len(set(non_null)) <= 1:
        assert r["type_class"] == "CONST"
        return
    assert r["type_class"] == "DATE"
    assert r["min_date"] == min(non_null).isoformat()
    assert r["max_date"] == max(non_null).isoformat()
    assert r["range_seconds"] == pytest.approx(
        (max(non_null) - min(non_null)).total_seconds())


@given(st.lists(st.integers(min_value=0, max_value=500),
                min_size=1, max_size=60),
       st.integers(min_value=1, max_value=64))
@settings(max_examples=8, deadline=None, derandomize=True,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_pack_offsets_is_exact_prefix_sum(spark, sizes, context_len):
    from spark_df_profiling_spark.operators.packing import pack_offsets
    df = spark.createDataFrame(
        [(i, n) for i, n in enumerate(sizes)], "oid long, ntok int")
    rows = sorted(pack_offsets(df, "ntok", "oid", context_len,
                               num_buckets=5).collect(),
                  key=lambda r: r["oid"])
    acc = 0
    for r, n in zip(rows, sizes):
        assert r["start_offset"] == acc
        assert r["end_offset"] == acc + n
        assert r["shard_id"] == acc // context_len
        acc += n


@given(st.lists(st.sampled_from(["aa", "bb", "cc", "dd", "ee"]),
                min_size=2, max_size=30),
       st.integers(min_value=2, max_value=5))
@settings(max_examples=8, deadline=None, derandomize=True,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_line_dedup_matches_python_reference(spark, lines, min_count):
    from collections import Counter
    from spark_df_profiling_spark.operators.dedup import line_dedup
    # two docs carved from the random line pool
    half = len(lines) // 2
    docs = [(0, "\n".join(lines[:half]) or "x"),
            (1, "\n".join(lines[half:]) or "y")]
    counts = Counter()
    for _, t in docs:
        counts.update(t.split("\n"))
    common = {ln for ln, c in counts.items() if c >= min_count}
    want = {i: "\n".join(l for l in t.split("\n") if l not in common)
            for i, t in docs}
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r["doc_id"]: r["clean_text"]
           for r in line_dedup(df, min_count=min_count).collect()}
    assert got == want


# ---------------------------------------------------------------------------
# Round-7 session-3 kernels: KS statistic, weighted sampling, outlier
# fences — each vs a plain-python reference on arbitrary inputs
# ---------------------------------------------------------------------------
ks_vals = st.lists(st.floats(allow_nan=False, allow_infinity=False,
                             min_value=-100, max_value=100),
                   min_size=1, max_size=25)


@given(ks_vals, ks_vals)
@settings(max_examples=8, deadline=None, derandomize=True,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_ks_2samp_property(spark, xs, ys):
    import bisect
    from spark_df_profiling_spark.operators.drift import ks_2samp
    a = spark.createDataFrame([(float(x),) for x in xs], "v double")
    b = spark.createDataFrame([(float(y),) for y in ys], "v double")
    got = ks_2samp(a, b, "v", num_buckets=4).collect()[0]
    sx, sy = sorted(xs), sorted(ys)
    best, at = -1.0, None
    for v in sorted(set(xs) | set(ys)):
        d = abs(bisect.bisect_right(sx, v) / len(sx)
                - bisect.bisect_right(sy, v) / len(sy))
        if d > best:
            best, at = d, v
    assert got["d_stat"] == pytest.approx(best, abs=1e-12)
    assert got["at_value"] == pytest.approx(at)


w_rows = st.lists(
    st.tuples(st.integers(min_value=0, max_value=10_000),
              st.floats(min_value=0.0, max_value=1e4,
                        allow_nan=False, allow_infinity=False)),
    min_size=1, max_size=30, unique_by=lambda t: t[0])


@given(w_rows, st.integers(min_value=1, max_value=8))
@settings(max_examples=8, deadline=None, derandomize=True,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_weighted_sample_property(spark, rows, k):
    """The engine draw equals the python Efraimidis-Spirakis draw from
    the same md5 uniforms, for any weights (zeros excluded)."""
    import hashlib
    import math as m
    from spark_df_profiling_spark.operators.sampling import (
        weighted_sample_k)
    df = spark.createDataFrame(rows, "id long, w double")
    got = [r["id"] for r in
           weighted_sample_k(df, "id", "w", k=k, seed=3)
           .orderBy("es_key", "id").collect()]
    ref = []
    for i, w in rows:
        if w and w > 0:
            h = int(hashlib.md5(f"{i}:3".encode()).hexdigest()[:15], 16)
            u = (h + 1) / float(1 << 60)
            ref.append((-m.log(u) / w, str(i), i))
    ref.sort()
    assert got == [i for _, _, i in ref[:k]]


o_vals = st.lists(st.floats(allow_nan=False, allow_infinity=False,
                            min_value=-1e5, max_value=1e5),
                  min_size=4, max_size=40)


@given(o_vals, st.floats(min_value=0.0, max_value=3.0))
@settings(max_examples=8, deadline=None, derandomize=True,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_outlier_fences_property(spark, xs, k):
    import math as m
    from spark_df_profiling_spark.operators.outliers import outlier_stats
    df = spark.createDataFrame([(float(x),) for x in xs], "x double")
    g = outlier_stats(df, ["x"], k=k).collect()[0]

    def q(p):
        s = sorted(xs)
        h = (len(s) - 1) * p
        lo = int(m.floor(h))
        hi = min(lo + 1, len(s) - 1)
        return s[lo] + (h - lo) * (s[hi] - s[lo])

    q1, q3 = q(0.25), q(0.75)
    lo_f, hi_f = q1 - k * (q3 - q1), q3 + k * (q3 - q1)
    assert g["q1"] == pytest.approx(q1, rel=1e-9, abs=1e-9)
    assert g["n_below"] == sum(1 for x in xs if x < lo_f)
    assert g["n_above"] == sum(1 for x in xs if x > hi_f)


# ---- round-10 invariants --------------------------------------------
vec_lists = st.lists(
    st.lists(finite, min_size=2, max_size=2),
    min_size=2, max_size=15, unique_by=lambda v: tuple(v))


@given(vec_lists)
@settings(max_examples=6, deadline=None, derandomize=True,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_kmeans_invariants(spark, pts):
    from spark_df_profiling_spark.operators.clustering import (
        kmeans_assign, kmeans_fit, kmeans_profile)
    df = spark.createDataFrame(
        [(i, p) for i, p in enumerate(pts)],
        "vec_id long, embedding array<double>")
    k = min(2, len(pts))
    cents = kmeans_fit(df, "embedding", "vec_id", k=k, n_iter=2,
                       hash_mode="md5")
    assert len(cents) == k and all(len(c) == 2 for c in cents)
    rows = kmeans_assign(df, cents, dist_col="d2").collect()
    # every point lands in [0, k) with min distance; profile totals
    # add up to the corpus
    for r in rows:
        p = pts[r["vec_id"]]
        dists = [sum((a - b) ** 2 for a, b in zip(p, c))
                 for c in cents]
        assert r["cluster"] == dists.index(min(dists))
        assert r["d2"] == pytest.approx(min(dists), rel=1e-9,
                                        abs=1e-9)
    prof = kmeans_profile(df, cents).collect()
    assert sum(r["n"] for r in prof) == len(pts)
    assert all(r["max_dist"] >= 0 for r in prof)


rank_lists = st.lists(
    st.integers(min_value=0, max_value=30),
    min_size=1, max_size=12, unique=True)


@given(rank_lists, rank_lists)
@settings(max_examples=6, deadline=None, derandomize=True,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_rrf_fuse_invariants(spark, ids_a, ids_b):
    from spark_df_profiling_spark.operators.similarity import rrf_fuse
    a = spark.createDataFrame(
        [(i, r + 1) for r, i in enumerate(ids_a)],
        "doc_id long, rank long")
    b = spark.createDataFrame(
        [(i, r + 1) for r, i in enumerate(ids_b)],
        "doc_id long, rank long")
    rows = rrf_fuse([a, b], k=60).collect()
    # one row per distinct id; dense ranks 1..n; score decreases with
    # fused_rank (ties impossible to violate: ordered by score desc)
    assert {r["doc_id"] for r in rows} == set(ids_a) | set(ids_b)
    ranks = sorted(r["fused_rank"] for r in rows)
    assert ranks == list(range(1, len(rows) + 1))
    by_rank = sorted(rows, key=lambda r: r["fused_rank"])
    for x, y in zip(by_rank, by_rank[1:]):
        assert x["rrf_score"] >= y["rrf_score"]
    for r in rows:
        assert r["n_lists"] == (r["doc_id"] in ids_a) + \
            (r["doc_id"] in ids_b)


ts_lists = st.lists(finite, min_size=1, max_size=25)


@given(ts_lists)
@settings(max_examples=6, deadline=None, derandomize=True,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_event_gaps_invariants(spark, ts):
    from spark_df_profiling_spark.operators.groupby import event_gaps
    df = spark.createDataFrame([("u", t) for t in ts],
                               "k string, ts double")
    r = event_gaps(df, "ts", "k").collect()[0]
    srt = sorted(ts)
    gaps = [b - a for a, b in zip(srt, srt[1:])]
    assert r["n_events"] == len(ts) and r["n_gaps"] == len(gaps)
    assert r["staleness"] == pytest.approx(0.0, abs=1e-9)
    if gaps:
        assert r["min_gap"] == pytest.approx(min(gaps), rel=1e-9,
                                             abs=1e-9)
        assert r["max_gap"] == pytest.approx(max(gaps), rel=1e-9,
                                             abs=1e-9)
        assert r["mean_gap"] == pytest.approx(
            (srt[-1] - srt[0]) / len(gaps), rel=1e-9, abs=1e-9)
    else:
        assert r["min_gap"] is None and r["mean_gap"] is None


# --- exact_substring_spans vs brute force -----------------------------------
token = st.integers(min_value=0, max_value=6)
doc_tokens = st.lists(token, min_size=0, max_size=24)
corpus_strategy = st.lists(doc_tokens, min_size=1, max_size=6)


@given(corpus_strategy, st.integers(min_value=1, max_value=4),
       st.booleans())
@settings(max_examples=8, deadline=None, derandomize=True,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_exact_substring_spans_property(spark, corpus, n, cross):
    """Random small-alphabet corpora force heavy gram repetition —
    every span the operator emits must equal the brute-force
    positional-gram island merge, in both counting modes."""
    from spark_df_profiling_spark.operators.dedup import (
        exact_substring_spans)
    docs = [(i, " ".join(f"t{t}" for t in toks))
            for i, toks in enumerate(corpus)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = sorted(
        (r["doc_id"], r["span_start"], r["span_end"], r["n_grams"])
        for r in exact_substring_spans(
            df, n=n, min_count=2, cross_doc=cross).collect())
    # brute force
    grams = []
    for did, text in docs:
        toks = text.split(" ") if text else [""]
        for i in range(0, max(0, len(toks) - n + 1)):
            grams.append((did, i, " ".join(toks[i:i + n])))
    counts = {}
    for did, _, gr in grams:
        if cross:
            counts.setdefault(gr, set()).add(did)
        else:
            counts[gr] = counts.get(gr, 0) + 1
    rep = {k for k, v in counts.items()
           if (len(v) if cross else v) >= 2}
    want = []
    for did, _ in docs:
        ps = sorted(p for d, p, gr in grams if d == did and gr in rep)
        if not ps:
            continue
        start, prev, cnt = ps[0], ps[0], 1
        for p in ps[1:]:
            if p - prev > n:
                want.append((did, start, prev + n, cnt))
                start, cnt = p, 0
            prev = p
            cnt += 1
        want.append((did, start, prev + n, cnt))
    assert got == sorted(want), (n, cross)


# --- mixture_plan water-filling invariants -----------------------------------
source_strategy = st.lists(
    st.tuples(st.integers(min_value=1, max_value=100000),
              st.floats(min_value=0.01, max_value=10.0,
                        allow_nan=False)),
    min_size=1, max_size=8)


@given(source_strategy,
       st.floats(min_value=1.0, max_value=1e6, allow_nan=False),
       st.floats(min_value=0.5, max_value=8.0, allow_nan=False))
@settings(max_examples=8, deadline=None, derandomize=True,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_mixture_plan_property(spark, srcs, budget, max_epochs):
    """Water-filling invariants on arbitrary mixtures: no source over
    its cap, saturated <=> at cap, unsaturated shares proportional to
    weight, and the budget fully allocated (up to its feasibility)."""
    from spark_df_profiling_spark.operators.sampling import mixture_plan
    rows = [(f"s{i}", t, w) for i, (t, w) in enumerate(srcs)]
    df = spark.createDataFrame(rows, "source string, n_tokens long, "
                                     "weight double")
    out = mixture_plan(df, budget, max_epochs=max_epochs).collect()
    total_cap = sum(t * max_epochs for _, t, _ in rows)
    alloc = sum(r["target_tokens"] for r in out)
    assert alloc == pytest.approx(min(budget, total_cap), rel=1e-9)
    lam = None
    for r in out:
        cap = r["cap_tokens"]
        assert r["target_tokens"] <= cap * (1 + 1e-12)
        if r["saturated"]:
            assert r["target_tokens"] == pytest.approx(cap, rel=1e-9)
        else:
            ratio = r["target_tokens"] / r["weight"]
            if lam is None:
                lam = ratio
            else:
                # all unsaturated sources share one water level
                assert ratio == pytest.approx(lam, rel=1e-9)
    unmet = out[0]["budget_unmet"]
    assert unmet == pytest.approx(max(0.0, budget - total_cap),
                                  rel=1e-9, abs=1e-6)


@given(st.lists(st.tuples(st.integers(0, 9999),
                          st.integers(1, 1000)),
                min_size=2, max_size=60, unique_by=lambda t: t[0]),
       st.integers(2, 12))
@settings(max_examples=8, deadline=None, derandomize=True,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_bootstrap_invariants(spark, rows, n_boot):
    """Poisson-bootstrap invariants on arbitrary id/value sets: every
    replicate mean lies in [min v, max v], sum_wv == 0 iff n_eff == 0,
    and the md5 path is a pure function of the rows (two calls agree
    exactly)."""
    from spark_df_profiling_spark.operators.sampling import (
        bootstrap_replicates)
    df = spark.createDataFrame(rows, "id long, v long")
    out = bootstrap_replicates(df, "v", "id", n_boot=n_boot,
                               hash_fn="md5").collect()
    assert len(out) == n_boot
    lo = min(v for _, v in rows)
    hi = max(v for _, v in rows)
    for r in out:
        assert (r.n_eff == 0) == (int(r.sum_wv) == 0) or lo > 0
        if r.boot_mean is not None:
            assert lo - 1e-9 <= r.boot_mean <= hi + 1e-9
    again = bootstrap_replicates(df, "v", "id", n_boot=n_boot,
                                 hash_fn="md5").collect()
    assert sorted((r.b, r.n_eff, r.sum_wv) for r in out) == \
        sorted((r.b, r.n_eff, r.sum_wv) for r in again)


@given(st.lists(st.tuples(st.floats(0, 100, allow_nan=False),
                          st.booleans()),
                min_size=5, max_size=80),
       st.integers(2, 10))
@settings(max_examples=8, deadline=None, derandomize=True,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_gains_curve_invariants(spark, rows, n_buckets):
    """Gains-table invariants on arbitrary scored sets: depths are
    nondecreasing with the last = N, cum_pos is nondecreasing with the
    last = n_pos, gain ends at 1, and lift·depth·P == cum_pos·N."""
    from spark_df_profiling_spark.operators.evaluation import (
        gains_curve)
    df = spark.createDataFrame([(s, int(y)) for s, y in rows],
                               "s double, y int")
    out = sorted(gains_curve(df, "y", "s", n_buckets).collect(),
                 key=lambda r: r.bucket)
    n = len(rows)
    n_pos = sum(1 for _, y in rows if y)
    assert len(out) == n_buckets
    assert out[-1].depth == n
    depths = [r.depth for r in out]
    assert depths == sorted(depths)
    cums = [r.cum_pos for r in out]
    assert all(b >= a - 1e-9 for a, b in zip(cums, cums[1:]))
    assert cums[-1] == pytest.approx(n_pos)
    if n_pos > 0:
        assert out[-1].gain == pytest.approx(1.0)
        for r in out:
            assert r.lift * r.depth * n_pos == \
                pytest.approx(r.cum_pos * n, rel=1e-9)
    else:
        assert all(r.gain is None and r.lift is None for r in out)


@given(st.lists(st.floats(-1e6, 1e6, allow_nan=False),
                min_size=1, max_size=80),
       st.sampled_from([0.05, 0.1, 0.25, 0.5]))
@settings(max_examples=8, deadline=None, derandomize=True,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_conformal_invariants(spark, scores, alpha):
    """Conformal invariants on arbitrary calibration sets: when
    feasible the threshold IS the k-th smallest score and calibration
    self-coverage reaches at least k; when k > n the result is
    infeasible with a NULL threshold."""
    import math

    from spark_df_profiling_spark.operators.evaluation import (
        conformal_coverage, conformal_threshold)
    df = spark.createDataFrame([(i, s) for i, s in enumerate(scores)],
                               "id long, s double")
    thr = conformal_threshold(df, "s", alpha)
    r = thr.collect()[0]
    n = len(scores)
    k = math.ceil((n + 1) * (1 - alpha))
    assert (r.n, r.k) == (n, k)
    if k > n:
        assert not r.feasible and r.threshold is None
        return
    assert r.feasible
    assert r.threshold == sorted(scores)[k - 1]
    cov = conformal_coverage(df, thr, "s").collect()[0]
    assert cov.n_covered >= k           # ties can only add coverage
    assert cov.n_covered == sum(1 for s in scores
                                if s <= r.threshold)


@given(st.lists(st.tuples(st.integers(0, 15), st.integers(0, 5)),
                min_size=4, max_size=100))
@settings(max_examples=8, deadline=None, derandomize=True,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_krippendorff_invariants(spark, ratings):
    """Alpha invariants on arbitrary (item, value) rating multisets:
    alpha <= 1 + ulps, d_o/d_e >= 0, single-rating items never count,
    and duplicating EVERY rating row leaves nominal d_o and d_e (and
    alpha) unchanged in the constant-raters sense only when defined —
    we assert the weaker, always-true invariants plus permutation
    invariance (row order cannot matter)."""
    from spark_df_profiling_spark.operators.correlation import (
        krippendorff_alpha)
    df = spark.createDataFrame(ratings, "item int, v int")
    r = krippendorff_alpha(df, "item", "v").collect()[0]
    from collections import Counter
    m = Counter(i for i, _ in ratings)
    pairable = {i for i, c in m.items() if c >= 2}
    assert r.n_items == len(pairable)
    assert r.n_ratings == sum(c for i, c in m.items()
                              if i in pairable)
    if r.n_items == 0:
        return
    assert r.d_o >= -1e-12 and r.d_e >= -1e-12
    if r.alpha is not None:
        assert r.alpha <= 1.0 + 1e-12
    rev = spark.createDataFrame(list(reversed(ratings)),
                                "item int, v int")
    r2 = krippendorff_alpha(rev, "item", "v").collect()[0]
    assert (r.n_items, r.n_ratings, r.sum_disagree_num) == \
        (r2.n_items, r2.n_ratings, r2.sum_disagree_num)

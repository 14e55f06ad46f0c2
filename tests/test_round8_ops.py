"""Round-8 operators: count-min sketch, salted join, canonical dedup."""

import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# count-min sketch
# ---------------------------------------------------------------------------
@pytest.fixture(scope="module")
def zipfy(spark):
    # 1000 rows over ~60 keys with a heavy head: key = id % (1 + id % 60)
    return spark.range(1000).select(
        (F.col("id") % (1 + F.col("id") % 60)).cast("string").alias("k"))


def test_cms_never_undercounts(spark, zipfy):
    from spark_df_profiling_spark.operators.frequency import (cms_estimate,
                                                              cms_state)
    true = {r["k"]: r["n"] for r in
            zipfy.groupBy("k").agg(F.count(F.lit(1)).alias("n")).collect()}
    st = cms_state(zipfy, "k", width=128, depth=4)
    est = {r["k"]: r["est_count"] for r in
           cms_estimate(zipfy.distinct(), st, "k",
                        width=128, depth=4).collect()}
    assert set(est) == set(true)
    assert all(est[k] >= true[k] for k in true), "CMS undercounted"


def test_cms_wide_sketch_is_exact(spark, zipfy):
    from spark_df_profiling_spark.operators.frequency import (cms_estimate,
                                                              cms_state)
    true = {r["k"]: r["n"] for r in
            zipfy.groupBy("k").agg(F.count(F.lit(1)).alias("n")).collect()}
    st = cms_state(zipfy, "k", width=8192, depth=4)
    est = {r["k"]: r["est_count"] for r in
           cms_estimate(zipfy.distinct(), st, "k").collect()}
    assert est == true


def test_cms_merge_equals_union_state(spark):
    from spark_df_profiling_spark.operators.frequency import (cms_merge,
                                                              cms_state)
    base = spark.range(1000).select(
        "id", (F.col("id") % (1 + F.col("id") % 60)).cast("string")
        .alias("k"))
    a = base.where(F.col("id") % 2 == 0).select("k")
    b = base.where(F.col("id") % 2 == 1).select("k")
    merged = cms_merge(cms_state(a, "k", width=256, depth=3),
                       cms_state(b, "k", width=256, depth=3))
    direct = cms_state(base.select("k"), "k", width=256, depth=3)
    got = {(r["d"], r["w"]): r["cnt"] for r in merged.collect()}
    want = {(r["d"], r["w"]): r["cnt"] for r in direct.collect()}
    assert got == want


def test_cms_unseen_key_estimates_zero(spark, zipfy):
    from spark_df_profiling_spark.operators.frequency import (cms_estimate,
                                                              cms_state)
    st = cms_state(zipfy, "k", width=8192, depth=4)
    probe = spark.createDataFrame([("never-seen-key-xyz",)], "k string")
    est = cms_estimate(probe, st, "k").collect()[0]["est_count"]
    assert est == 0


def test_cms_validates_params(spark, zipfy):
    from spark_df_profiling_spark.operators.frequency import cms_state
    with pytest.raises(ValueError, match="width"):
        cms_state(zipfy, "k", width=0, depth=4)


# ---------------------------------------------------------------------------
# salted join
# ---------------------------------------------------------------------------
def _hotkey_frames(spark):
    # big side: one key holds 70% of rows; small side: 30 dim rows
    big = spark.range(1000).select(
        F.when(F.col("id") < 700, 7).otherwise(F.col("id") % 30)
        .alias("k"), F.col("id").alias("rid"))
    small = spark.range(25).select(
        F.col("id").alias("k"),
        F.concat(F.lit("dim-"), F.col("id")).alias("name"))
    return big, small


def test_salted_join_inner_matches_plain(spark):
    from spark_df_profiling_spark.operators.joins import salted_join
    big, small = _hotkey_frames(spark)
    got = sorted(tuple(r) for r in
                 salted_join(big, small, "k", n_salts=8).collect())
    want = sorted(tuple(r) for r in big.join(small, "k").collect())
    assert got == want


def test_salted_join_left_matches_plain(spark):
    from spark_df_profiling_spark.operators.joins import salted_join
    big, small = _hotkey_frames(spark)
    got = sorted((r["k"], r["rid"], r["name"]) for r in
                 salted_join(big, small, "k", n_salts=4,
                             how="left").collect())
    want = sorted((r["k"], r["rid"], r["name"]) for r in
                  big.join(small, "k", "left").collect())
    assert got == want
    # keys 25..29 have no dim row -> survive with NULL name
    assert any(name is None for _, _, name in got)


def test_salted_join_actually_spreads_the_hot_key(spark):
    from spark_df_profiling_spark.operators.joins import salted_join
    big, small = _hotkey_frames(spark)
    n = 8
    b = big.withColumn(
        "__salt", F.pmod(F.xxhash64("k", "rid"), F.lit(n)).cast("int"))
    n_salts_used = (b.where(F.col("k") == 7)
                    .select("__salt").distinct().count())
    assert n_salts_used == n, "hot key not spread across all salts"
    # and the op with the same salt_on gives identical results
    got = salted_join(big, small, "k", n_salts=n,
                      salt_on=["k", "rid"]).count()
    assert got == big.join(small, "k").count()


def test_salted_join_validates(spark):
    from spark_df_profiling_spark.operators.joins import salted_join
    big, small = _hotkey_frames(spark)
    with pytest.raises(ValueError, match="inner/left"):
        salted_join(big, small, "k", how="full")
    with pytest.raises(ValueError, match="n_salts"):
        salted_join(big, small, "k", n_salts=0)


# ---------------------------------------------------------------------------
# canonical dedup
# ---------------------------------------------------------------------------
def test_canonical_dedup_collapses_variants(spark):
    from spark_df_profiling_spark.operators.text import canonical_dedup
    rows = [(1, "Hello  World"), (2, "hello world"), (3, "HELLO\tWORLD\n"),
            (4, "goodbye"), (5, "Good bye")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    kept = sorted(r["doc_id"] for r in canonical_dedup(df).collect())
    assert kept == [1, 4, 5]  # min doc_id survives each canonical group


def test_canonical_dedup_strip_punct(spark):
    from spark_df_profiling_spark.operators.text import canonical_dedup
    rows = [(1, "It's a test."), (2, "its a test"), (3, "other")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    kept = sorted(r["doc_id"] for r in
                  canonical_dedup(df, strip_punct=True).collect())
    assert kept == [1, 3]
    # without punct stripping they differ
    kept2 = sorted(r["doc_id"] for r in canonical_dedup(df).collect())
    assert kept2 == [1, 2, 3]


def test_normalize_text_explicit_whitespace_class(spark):
    from spark_df_profiling_spark.operators.text import normalize_text
    df = spark.createDataFrame([(" A \t B\r\nC\fD ",)], "t string")
    got = df.select(normalize_text("t").alias("n")).collect()[0]["n"]
    assert got == "a b c d"


# ---------------------------------------------------------------------------
# time-decayed aggregates
# ---------------------------------------------------------------------------
def test_decayed_stats_known_weights(spark):
    from spark_df_profiling_spark.operators.groupby import decayed_stats
    rows = [("a", 0.0, 10.0), ("a", 100.0, 20.0), ("a", 200.0, 30.0),
            ("b", 200.0, 5.0)]
    df = spark.createDataFrame(rows, "g string, t double, v double")
    out = {r["g"]: r for r in
           decayed_stats(df, "t", 100.0, ["g"], ["v"]).collect()}
    # ref = 200; weights for a: 0.25, 0.5, 1.0
    assert out["a"]["n"] == 3
    assert abs(out["a"]["w_sum"] - 1.75) < 1e-12
    assert abs(out["a"]["v__dsum"] - (0.25 * 10 + 0.5 * 20 + 30)) < 1e-9
    assert abs(out["a"]["v__dmean"] - (42.5 / 1.75)) < 1e-9
    assert out["b"]["w_sum"] == 1.0


def test_decayed_stats_explicit_ref_and_nulls(spark):
    from spark_df_profiling_spark.operators.groupby import decayed_stats
    rows = [("a", 0.0, 10.0), ("a", None, 99.0), ("a", 100.0, None)]
    df = spark.createDataFrame(rows, "g string, t double, v double")
    out = decayed_stats(df, "t", 100.0, ["g"], ["v"],
                        ref_time=100.0).collect()[0]
    # NULL time row excluded entirely; NULL value keeps its weight in
    # w_sum but not in the value sums
    assert out["n"] == 2
    assert abs(out["w_sum"] - 1.5) < 1e-12
    assert abs(out["v__dsum"] - 5.0) < 1e-12
    assert abs(out["v__dmean"] - 10.0) < 1e-12


def test_decayed_stats_ungrouped_and_validation(spark):
    import pytest as _pt
    from spark_df_profiling_spark.operators.groupby import decayed_stats
    df = spark.createDataFrame([(0.0,), (100.0,)], "t double")
    out = decayed_stats(df, "t", 100.0).collect()[0]
    assert out["n"] == 2 and abs(out["w_sum"] - 1.5) < 1e-12
    with _pt.raises(ValueError, match="half_life"):
        decayed_stats(df, "t", 0.0)


# ---------------------------------------------------------------------------
# embedding quantization
# ---------------------------------------------------------------------------
def test_quantize_roundtrip_error_bounded(spark):
    from spark_df_profiling_spark.operators.similarity import (
        quantization_error_stats, quantization_ranges)
    df = spark.range(200).select(F.array(
        (F.col("id") * 0.37).cast("float"),
        (F.sin(F.col("id").cast("double"))).cast("float"),
        F.lit(2.5).cast("float")).alias("embedding"))
    ranges = quantization_ranges(df)
    assert len(ranges) == 3
    stats = quantization_error_stats(df, ranges).collect()
    for r in stats:
        mn, mx = ranges[r["dim"]]
        half_step = (mx - mn) / (2 * 255) if mx > mn else 0.0
        assert r["max_abs_err"] <= half_step + 1e-12, (
            f"dim {r['dim']}: {r['max_abs_err']} > {half_step}")
    # constant dim reconstructs exactly
    assert stats[2]["max_abs_err"] == 0.0


def test_quantize_codes_are_int8(spark):
    from spark_df_profiling_spark.operators.similarity import (
        quantization_ranges, quantize_embeddings)
    df = spark.range(50).select(F.array(
        (F.col("id") - 25).cast("float"),
        F.lit(1.0).cast("float")).alias("embedding"))
    ranges = quantization_ranges(df)
    q = quantize_embeddings(df, ranges)
    assert dict(q.dtypes)["embedding_q8"] == "array<tinyint>"
    lohi = q.select(
        F.min(F.array_min("embedding_q8")).alias("lo"),
        F.max(F.array_max("embedding_q8")).alias("hi")).collect()[0]
    assert lohi["lo"] == -128 and lohi["hi"] == 127


def test_quantize_null_vector_and_validation(spark):
    import pytest as _pt
    from spark_df_profiling_spark.operators.similarity import (
        quantize_embeddings)
    df = spark.createDataFrame([([1.0, 2.0],), (None,)],
                               "embedding array<float>")
    q = quantize_embeddings(df, [(0.0, 4.0), (0.0, 4.0)])
    rows = q.collect()
    assert sum(1 for r in rows if r["embedding_q8"] is None) == 1
    with _pt.raises(ValueError, match="bits"):
        quantize_embeddings(df, [(0.0, 1.0)], bits=1)
    with _pt.raises(ValueError, match="ranges"):
        quantize_embeddings(df, [])


def test_knn_quantized_matches_exact_on_separated_corpus(spark):
    """With neighbor margins far above the quantization step, int8 ADC
    search must return exactly the float search's top-k."""
    from spark_df_profiling_spark.operators.similarity import (
        knn_bruteforce, knn_bruteforce_quantized, quantization_ranges,
        quantize_embeddings)
    corpus = spark.range(40).select(
        F.col("id").alias("vec_id"),
        F.array((F.cos(F.col("id") * 0.37)).cast("float"),
                (F.sin(F.col("id") * 0.37)).cast("float"),
                (F.col("id") * 0.05).cast("float")).alias("embedding"))
    queries = corpus.where(F.col("vec_id") < 3)
    ranges = quantization_ranges(corpus)
    cq = quantize_embeddings(corpus, ranges).drop("embedding")
    exact = {(r["query_id"], r["rank"]): r["neighbor_id"]
             for r in knn_bruteforce(corpus, queries, k=3).collect()}
    q8 = {(r["query_id"], r["rank"]): r["neighbor_id"]
          for r in knn_bruteforce_quantized(
              cq, queries, ranges, k=3).collect()}
    hits = sum(1 for key in exact if q8.get(key) == exact[key])
    assert hits >= len(exact) - 1, f"q8 recall too low: {hits}/{len(exact)}"


# ---------------------------------------------------------------------------
# URL / domain analytics
# ---------------------------------------------------------------------------
def test_url_host_and_registered_domain(spark):
    from spark_df_profiling_spark.operators.text import (registered_domain,
                                                         url_host)
    rows = [("https://news.bbc.co.uk/story?id=1",),
            ("http://user:pw@a.b.example.com:8080/x",),
            ("https://localhost/x",),
            ("not a url",)]
    df = spark.createDataFrame(rows, "u string")
    got = [tuple(r) for r in df.select(
        url_host("u").alias("h"),
        registered_domain(url_host("u")).alias("d")).collect()]
    assert got[0] == ("news.bbc.co.uk", "bbc.co.uk")
    assert got[1] == ("a.b.example.com", "example.com")
    assert got[2] == ("localhost", "localhost")
    assert got[3] == (None, None)


def test_domain_stats_counts_and_share(spark):
    from spark_df_profiling_spark.operators.text import domain_stats
    rows = [
        (1, "see https://a.wiki.org/x and https://b.wiki.org/y today"),
        (2, "also https://wiki.org/z plus http://other.net/1"),
        (3, "nothing here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["domain"]: (r["n_urls"], r["n_docs"], r["url_share"])
           for r in domain_stats(df).collect()}
    assert got["wiki.org"][:2] == (3, 2)
    assert got["other.net"][:2] == (1, 1)
    assert abs(got["wiki.org"][2] - 0.75) < 1e-12


# ---------------------------------------------------------------------------
# plan-shape pins for the round-8 kernels
# ---------------------------------------------------------------------------
def test_quantize_plan_has_no_exchange(spark):
    """quantize/dequantize are pure projections — the range state rides
    as literals, so the plan must contain NO shuffle and NO join."""
    from spark_df_profiling_spark.operators.similarity import (
        dequantize_embeddings, quantize_embeddings)
    df = spark.range(100).select(
        F.array(F.col("id").cast("float"),
                (F.col("id") * 2).cast("float")).alias("embedding"))
    ranges = [(0.0, 99.0), (0.0, 198.0)]
    q = dequantize_embeddings(quantize_embeddings(df, ranges), ranges)
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Join" not in plan


def test_cms_estimate_broadcasts_state(spark):
    from spark_df_profiling_spark.operators.frequency import (cms_estimate,
                                                              cms_state)
    df = spark.range(500).select((F.col("id") % 37).cast("string")
                                 .alias("k"))
    st = cms_state(df, "k", width=512, depth=3)
    est = cms_estimate(df.distinct(), st, "k", width=512, depth=3)
    plan = est._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastExchange" in plan, "CMS state not broadcast"


def test_normalize_text_plan_is_narrow(spark):
    from spark_df_profiling_spark.operators.text import normalize_text
    df = spark.range(100).select(F.col("id").cast("string").alias("t"))
    out = df.select(normalize_text("t", strip_punct=True).alias("n"))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


# ---------------------------------------------------------------------------
# property checks (hypothesis)
# ---------------------------------------------------------------------------
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_texts = st.lists(
    st.text(alphabet=" \t\r\n\fabcDEF.'!", min_size=0, max_size=30),
    min_size=1, max_size=12)


@given(_texts)
@settings(max_examples=6, deadline=None, derandomize=True,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_normalize_text_idempotent_property(spark, texts):
    """normalize(normalize(x)) == normalize(x) for arbitrary
    case/whitespace/punct soup — canonicalization must be a projection
    onto its own image or dedup keys drift across passes."""
    from spark_df_profiling_spark.operators.text import normalize_text
    df = spark.createDataFrame([(t,) for t in texts], "t string")
    once = df.select(normalize_text("t", strip_punct=True).alias("n1"))
    twice = once.select(F.col("n1"),
                        normalize_text(F.col("n1"), strip_punct=True)
                        .alias("n2"))
    for r in twice.collect():
        assert r["n1"] == r["n2"]


_keys = st.lists(st.text(alphabet="abcde", min_size=1, max_size=4),
                 min_size=1, max_size=60)


@given(_keys)
@settings(max_examples=6, deadline=None, derandomize=True,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_cms_never_undercounts_property(spark, keys):
    from spark_df_profiling_spark.operators.frequency import (cms_estimate,
                                                              cms_state)
    df = spark.createDataFrame([(k,) for k in keys], "k string")
    st_df = cms_state(df, "k", width=32, depth=3)
    est = {r["k"]: r["est_count"]
           for r in cms_estimate(df.distinct(), st_df, "k",
                                 width=32, depth=3).collect()}
    from collections import Counter
    true = Counter(keys)
    assert all(est[k] >= true[k] for k in true)


# ---------------------------------------------------------------------------
# edge cases: empty inputs, URL-free corpora, empty join sides
# ---------------------------------------------------------------------------
def test_round8_ops_on_empty_inputs(spark):
    from spark_df_profiling_spark.operators.frequency import (cms_estimate,
                                                              cms_state)
    from spark_df_profiling_spark.operators.groupby import decayed_stats
    from spark_df_profiling_spark.operators.text import (canonical_dedup,
                                                         domain_stats)
    empty_docs = spark.createDataFrame([], "doc_id long, text string")
    assert canonical_dedup(empty_docs).count() == 0
    assert domain_stats(empty_docs).count() == 0
    empty_k = spark.createDataFrame([], "k string")
    st = cms_state(empty_k, "k", width=64, depth=2)
    assert st.count() == 0
    # estimating against an EMPTY state: every key is definitely unseen
    probe = spark.createDataFrame([("x",)], "k string")
    est = cms_estimate(probe, st, "k", width=64, depth=2).collect()
    assert est[0]["est_count"] == 0
    # decayed stats over an all-NULL time column: zero usable rows
    df = spark.createDataFrame([(None, 1.0)], "t double, v double")
    out = decayed_stats(df, "t", 10.0, value_cols=["v"],
                        ref_time=0.0).collect()[0]
    assert out["n"] == 0


def test_domain_stats_ignores_url_free_corpus(spark, sf_dir):
    from spark_df_profiling_spark.operators.text import domain_stats
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    # driver corpus is synthetic word salad: no URLs -> empty report,
    # not a crash (and the regex scan stays a narrow projection)
    assert domain_stats(d).count() == 0


def test_salted_join_empty_small_side(spark):
    from spark_df_profiling_spark.operators.joins import salted_join
    big = spark.range(100).select(F.col("id").alias("k"))
    small = spark.createDataFrame([], "k long, name string")
    assert salted_join(big, small, "k", n_salts=4).count() == 0
    left = salted_join(big, small, "k", n_salts=4, how="left")
    assert left.count() == 100
    assert left.where(F.col("name").isNotNull()).count() == 0

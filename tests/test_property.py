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

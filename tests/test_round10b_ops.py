"""Round-10 session-3 operators: resample_fill (per-key dense time
grid + gap fill), sorted_neighborhood_pairs (SNM dedup blocking),
select_by_token_budget (quality-ranked corpus carving), and the
frozen-LM day-2 trio (lm_state / lm_state_merge /
bigram_logprob_with_state)."""

import math

import pytest
from pyspark.sql import functions as F

from spark_df_profiling_spark.operators.groupby import resample_fill


# ------------------------------------------------------ resample_fill
@pytest.fixture(scope="module")
def rf_df(spark):
    rows = [("a", 0.5, 1.0), ("a", 1.2, 2.0), ("a", 1.7, None),
            ("a", 5.1, 10.0), ("b", 3.0, 4.0),
            (None, 1.0, 1.0), ("c", None, 9.9)]
    return spark.createDataFrame(rows, "k string, ts double, v double")


def test_resample_fill_grid_and_ffill(rf_df):
    out = resample_fill(rf_df, "ts", "k", "v", gran=1.0,
                        agg="sum", fill="ffill")
    rows = {(r.k, r.bucket): r for r in out.collect()}
    # key a spans buckets 0..5 (6 rows), key b exactly 1, null key and
    # null ts rows dropped entirely
    assert sorted(k for k in rows) == (
        [("a", i) for i in range(6)] + [("b", 3)])
    # observed buckets
    assert rows[("a", 0)].v == 1.0 and not rows[("a", 0)].filled
    assert rows[("a", 1)].v == 2.0 and rows[("a", 1)].n_obs == 1
    # gap buckets forward-fill the last observed value
    for b in (2, 3, 4):
        r = rows[("a", b)]
        assert r.v == 2.0 and r.filled and r.n_obs == 0
    assert rows[("a", 5)].v == 10.0
    assert rows[("b", 3)].v == 4.0 and rows[("b", 3)].bucket_start == 3.0


def test_resample_fill_zero_and_none(rf_df):
    z = resample_fill(rf_df, "ts", "k", "v", gran=1.0,
                      agg="sum", fill="zero")
    zr = {(r.k, r.bucket): r.v for r in z.collect()}
    assert zr[("a", 3)] == 0.0
    n = resample_fill(rf_df, "ts", "k", "v", gran=1.0,
                      agg="sum", fill="none")
    nr = {(r.k, r.bucket): r.v for r in n.collect()}
    assert nr[("a", 3)] is None and nr[("a", 1)] == 2.0


def test_resample_fill_mean_and_count(spark):
    rows = [("a", 0.1, 1.0), ("a", 0.9, 3.0), ("a", 2.5, 7.0)]
    df = spark.createDataFrame(rows, "k string, ts double, v double")
    m = resample_fill(df, "ts", "k", "v", gran=1.0, agg="mean")
    mr = {r.bucket: r.v for r in m.collect()}
    assert mr[0] == 2.0 and mr[1] == 2.0 and mr[2] == 7.0
    c = resample_fill(df, "ts", "k", "v", gran=1.0, agg="count",
                      fill="zero")
    cr = {r.bucket: r.v for r in c.collect()}
    assert cr == {0: 2.0, 1: 0.0, 2: 1.0}


def test_resample_fill_all_null_bucket_is_empty(spark):
    # a bucket whose rows all carry NULL values counts as EMPTY:
    # n_obs = 0, fill applies (even for agg='count', which would
    # otherwise emit 0.0 as an observation)
    rows = [("a", 0.5, 5.0), ("a", 1.5, None), ("a", 2.5, 6.0)]
    df = spark.createDataFrame(rows, "k string, ts double, v double")
    out = resample_fill(df, "ts", "k", "v", gran=1.0, agg="count")
    r1 = {r.bucket: r for r in out.collect()}[1]
    assert r1.n_obs == 0 and r1.filled and r1.v == 1.0  # ffilled count


def test_resample_fill_span_guard(rf_df):
    from py4j.protocol import Py4JJavaError
    bad = resample_fill(rf_df, "ts", "k", "v", gran=0.001,
                        max_grid_buckets=10)
    with pytest.raises(Exception) as ei:
        bad.collect()
    assert "spans more than" in str(ei.value)


def test_resample_fill_validation(rf_df):
    with pytest.raises(ValueError):
        resample_fill(rf_df, "ts", "k", "v", gran=0.0)
    with pytest.raises(ValueError):
        resample_fill(rf_df, "ts", "k", "v", 1.0, agg="median")
    with pytest.raises(ValueError):
        resample_fill(rf_df, "ts", "k", "v", 1.0, fill="bfill")
    with pytest.raises(ValueError):
        resample_fill(rf_df, "ts", "k", "v", 1.0, max_grid_buckets=0)


# ------------------------------------------- sorted_neighborhood_pairs
from spark_df_profiling_spark.operators.dedup import (
    sorted_neighborhood_pairs)


@pytest.fixture(scope="module")
def snm_df(spark):
    rows = [(1, "apple"), (2, "appel"), (3, "banana"), (4, "bananna"),
            (5, "cherry"), (6, None), (None, "zz"), (7, "applf")]
    return spark.createDataFrame(rows, "id long, txt string")


def _snm_python(rows, window):
    """Replay: total order (txt ASC NULLS LAST, id ASC), pairs within
    `window` positions."""
    lst = sorted([(t is None, t if t is not None else "", i)
                  for i, t in rows if i is not None])
    seq = [i for _, _, i in lst]
    out = set()
    for a in range(len(seq)):
        for b in range(a + 1, min(a + window + 1, len(seq))):
            out.add((seq[a], seq[b], b - a))
    return out


def test_snm_matches_python_replay(snm_df):
    rows = [(r.id, r.txt) for r in snm_df.collect()]
    for w in (1, 2, 3):
        got = {(r.id_a, r.id_b, r.dist)
               for r in sorted_neighborhood_pairs(
                   snm_df, "id", "txt", window=w,
                   n_partitions=3).collect()}
        assert got == _snm_python(rows, w), f"window={w}"


def test_snm_partition_invariance(snm_df):
    # the global order (and therefore the pair set) must not depend on
    # how many range partitions the corpus was cut into
    base = {(r.id_a, r.id_b, r.dist)
            for r in sorted_neighborhood_pairs(
                snm_df, "id", "txt", window=2,
                n_partitions=1).collect()}
    for np_ in (2, 5, 11):
        got = {(r.id_a, r.id_b, r.dist)
               for r in sorted_neighborhood_pairs(
                   snm_df, "id", "txt", window=2,
                   n_partitions=np_).collect()}
        assert got == base, f"n_partitions={np_}"


def test_snm_null_handling(snm_df):
    out = sorted_neighborhood_pairs(snm_df, "id", "txt", window=1,
                                    n_partitions=2).collect()
    ids = {r.id_a for r in out} | {r.id_b for r in out}
    assert None not in ids          # NULL id rows dropped
    # NULL sort key sorts LAST: id=6 (txt NULL) pairs only with the
    # order-maximal non-null row (cherry, id=5)
    touching6 = [(r.id_a, r.id_b) for r in out if 6 in (r.id_a, r.id_b)]
    assert touching6 == [(5, 6)]


def test_snm_no_global_single_partition_window(snm_df):
    out = sorted_neighborhood_pairs(snm_df, "id", "txt", window=2,
                                    n_partitions=4)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan


def test_snm_multi_sort_cols_and_validation(spark, snm_df):
    rows = [(1, "a", 2.0), (2, "a", 1.0), (3, "b", 9.0)]
    df = spark.createDataFrame(rows, "id long, g string, s double")
    out = sorted_neighborhood_pairs(df, "id", ["g", "s"], window=1,
                                    n_partitions=2)
    # order: (a,1.0,2) < (a,2.0,1) < (b,9.0,3)
    assert {(r.id_a, r.id_b) for r in out.collect()} == {(2, 1), (1, 3)}
    with pytest.raises(ValueError):
        sorted_neighborhood_pairs(snm_df, "id", "txt", window=0)
    with pytest.raises(ValueError):
        sorted_neighborhood_pairs(snm_df, "id", [], window=1)


def test_snm_empty_input(spark):
    df = spark.createDataFrame([], "id long, txt string")
    assert sorted_neighborhood_pairs(df, "id", "txt",
                                     window=2).count() == 0

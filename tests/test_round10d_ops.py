"""Round-10 session-4 operators: bloom_filtered_join."""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from spark_df_profiling_spark.operators.joins import bloom_filtered_join


@pytest.fixture(scope="module")
def fact(spark):
    # keys 0..999 (one row each) plus 20 NULL-key rows — NULLs never
    # match an equi-join, so both paths must drop them identically
    rows = [(i, i % 1000, float(i)) for i in range(1000)]
    rows += [(10_000 + i, None, -1.0) for i in range(20)]
    return spark.createDataFrame(
        rows, "fid long, fk long, val double").persist()


@pytest.fixture(scope="module")
def dim(spark):
    # every 7th key present, plus a NULL dim key and a decoy column
    # named like the fact key (exercises the qualified-ref join)
    rows = [(k, f"d{k}", k * 100) for k in range(0, 1000, 7)]
    rows += [(None, "dnull", -1)]
    return spark.createDataFrame(
        rows, "dk long, dname string, fk long").persist()


def _sorted(df, *cols):
    return [tuple(r) for r in df.orderBy(*cols).collect()]


def test_bloom_inner_matches_plain_join(fact, dim):
    got = bloom_filtered_join(fact, dim, "fk", "dk",
                              m_bits=1 << 16, k=5)
    want = fact.join(dim, fact["fk"] == dim["dk"], "inner")
    # both plans emit fact columns then dim columns — compare
    # positionally (the duplicate 'fk' name makes named select
    # ambiguous, which is exactly the decoy this fixture plants)
    assert got.columns == want.columns
    assert _sorted(got, "fid") == _sorted(want, "fid")
    assert got.count() == 143  # ceil(1000/7) matching keys, no NULLs


def test_bloom_left_semi_matches_plain(fact, dim):
    got = bloom_filtered_join(fact, dim.select("dk"), "fk", "dk",
                              how="left_semi", m_bits=1 << 16, k=5)
    want = fact.join(dim.select(F.col("dk").alias("fk")),
                     on="fk", how="left_semi")
    assert _sorted(got, "fid") == _sorted(want, "fid")
    assert got.columns == fact.columns


def test_bloom_same_key_name(spark):
    f = spark.createDataFrame([(i,) for i in range(100)], "k long")
    d = spark.createDataFrame([(i,) for i in range(0, 100, 10)],
                              "k long")
    got = bloom_filtered_join(f, d, "k", m_bits=1 << 14)
    assert sorted(r["k"] for r in got.collect()) == list(
        range(0, 100, 10))


def test_bloom_prunes_before_join(fact, dim):
    # the point of the operator: with a comfortably-sized filter the
    # probe survivors are ~ the matching keys, not the whole fact
    from spark_df_profiling_spark.operators.dedup import (
        bloom_might_contain, bloom_state)
    st = bloom_state(dim.select("dk"), cols=["dk"],
                     m_bits=1 << 16, k=5)
    surv = (bloom_might_contain(fact, st, cols=["fk"],
                                m_bits=1 << 16, k=5, out_col="mc")
            .where(F.col("mc")).count())
    # 143 true matches + the 20 NULL-key fact rows (dim also holds a
    # NULL key, so the NULL sentinel is IN the state — those rows
    # survive the probe and are dropped by the join itself, exactly
    # like a plain join).  fpp at m/n ~ 455 bits/key is ~0; require a
    # >6x prune of the 1020-row fact either way.
    assert 163 <= surv <= 175


def test_bloom_prebuilt_state_reused(fact, dim):
    from spark_df_profiling_spark.operators.dedup import bloom_state
    st = bloom_state(dim.select("dk"), cols=["dk"],
                     m_bits=1 << 16, k=5).persist()
    try:
        got = bloom_filtered_join(fact, dim, "fk", "dk",
                                  m_bits=1 << 16, k=5, state=st)
        want = fact.join(dim, fact["fk"] == dim["dk"], "inner")
        assert got.count() == want.count() == 143
    finally:
        st.unpersist()


def test_bloom_validation(fact, dim):
    with pytest.raises(ValueError, match="inner/left_semi"):
        bloom_filtered_join(fact, dim, "fk", "dk", how="left")
    with pytest.raises(ValueError, match="fact missing"):
        bloom_filtered_join(fact, dim, "nope", "dk")
    with pytest.raises(ValueError, match="dim missing"):
        bloom_filtered_join(fact, dim, "fk", "nope")

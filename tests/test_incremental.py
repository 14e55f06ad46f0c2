"""Mergeable/incremental profile states: partial → merge → finalize must
agree with statistics computed directly over the full data."""

import math

import pytest
from pyspark.sql import functions as F

from spark_df_profiling_spark.operators.incremental import (
    finalize, merge_partials, partial_profile)


@pytest.fixture(scope="module")
def final_rows(spark, lineitem):
    parts = [partial_profile(lineitem.where(F.col("l_orderkey") % 4 == i))
             for i in range(4)]
    merged = merge_partials(*parts)
    return {r["column"]: r for r in finalize(merged).collect()}


def test_incremental_matches_direct(spark, lineitem, final_rows):
    direct = lineitem.agg(
        F.count(F.lit(1)).alias("n"),
        F.count("l_extendedprice").alias("count"),
        F.sum("l_extendedprice").alias("sum"),
        F.avg("l_extendedprice").alias("mean"),
        F.stddev_samp("l_extendedprice").alias("std"),
        F.min("l_extendedprice").alias("mn"),
        F.max("l_extendedprice").alias("mx"),
        F.count_distinct("l_extendedprice").alias("nd")).collect()[0]
    got = final_rows["l_extendedprice"]
    assert got["n"] == direct["n"]
    assert got["count"] == direct["count"]
    assert got["n_missing"] == direct["n"] - direct["count"]
    assert got["sum"] == pytest.approx(direct["sum"], rel=1e-12)
    assert got["mean"] == pytest.approx(direct["mean"], rel=1e-12)
    assert got["std"] == pytest.approx(direct["std"], rel=1e-9)
    assert got["min_num"] == direct["mn"]
    assert got["max_num"] == direct["mx"]
    # HLL estimate: DataSketches default accuracy is ~1.6% rel std err
    assert got["distinct_estimate"] == pytest.approx(direct["nd"], rel=0.05)


def test_incremental_categorical_and_date(spark, lineitem, final_rows):
    flag = final_rows["l_returnflag"]
    assert flag["type_class"] == "CAT"
    assert flag["mean"] is None and flag["std"] is None
    assert flag["distinct_estimate"] == 3  # exact at tiny cardinality
    ship = final_rows["l_shipdate"]
    assert ship["type_class"] == "DATE"
    direct = lineitem.agg(F.min("l_shipdate"), F.max("l_shipdate")) \
        .collect()[0]
    # state stores epoch seconds; direct min/max are date/timestamps
    assert ship["min_num"] < ship["max_num"]
    span_days = (ship["max_num"] - ship["min_num"]) / 86400.0
    assert span_days == pytest.approx(
        (direct[1] - direct[0]).total_seconds() / 86400.0, abs=1.0)


def test_state_survives_parquet_roundtrip(spark, lineitem, tmp_path,
                                          final_rows):
    part = partial_profile(lineitem.where(F.col("l_orderkey") % 4 == 0))
    path = str(tmp_path / "state.parquet")
    part.write.mode("overwrite").parquet(path)
    back = spark.read.parquet(path)
    others = [partial_profile(
        lineitem.where(F.col("l_orderkey") % 4 == i)) for i in (1, 2, 3)]
    got = {r["column"]: r
           for r in finalize(merge_partials(back, *others)).collect()}
    want = final_rows["l_extendedprice"]
    assert got["l_extendedprice"]["mean"] == pytest.approx(
        want["mean"], rel=1e-12)
    assert got["l_extendedprice"]["distinct_estimate"] == \
        want["distinct_estimate"]


def test_merge_is_hierarchical(spark, lineitem, final_rows):
    # merge(merge(a,b), merge(c,d)) == merge(a,b,c,d) — the tree shape a
    # long-running state store naturally produces
    parts = [partial_profile(lineitem.where(F.col("l_orderkey") % 4 == i))
             for i in range(4)]
    tree = merge_partials(merge_partials(parts[0], parts[1]),
                          merge_partials(parts[2], parts[3]))
    got = {r["column"]: r for r in finalize(tree).collect()}
    for col, want in final_rows.items():
        g = got[col]
        for k in ("n", "count", "n_missing", "min_num", "max_num",
                  "n_zeros", "n_infinite"):
            assert g[k] == want[k], (col, k)
        # HLL union is shape-sensitive at the sketch level (tree vs flat
        # promote modes differently) — estimates agree, bits need not
        assert g["distinct_estimate"] == pytest.approx(
            want["distinct_estimate"], rel=0.05), col
        for k in ("mean", "std", "sum"):
            if want[k] is None:
                assert g[k] is None, (col, k)
            else:
                assert g[k] == pytest.approx(want[k], rel=1e-9), (col, k)


def test_incremental_edge_cases(spark):
    df1 = spark.createDataFrame(
        [(None, 5.0), (None, 5.0)], "a double, b double")
    df2 = spark.createDataFrame(
        [(None, 5.0), (None, 7.0)], "a double, b double")
    out = {r["column"]: r for r in finalize(
        merge_partials(partial_profile(df1),
                       partial_profile(df2))).collect()}
    assert out["a"]["count"] == 0 and out["a"]["n_missing"] == 4
    assert out["a"]["mean"] is None and out["a"]["min_num"] is None
    assert out["a"]["distinct_estimate"] == 0
    assert out["b"]["mean"] == pytest.approx(5.5)
    assert out["b"]["std"] == pytest.approx(
        math.sqrt(sum((x - 5.5) ** 2 for x in (5, 5, 5, 7)) / 3))
    assert out["b"]["distinct_estimate"] == 2

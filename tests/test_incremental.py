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


def test_merged_histogram_equals_direct(spark, lineitem):
    # freeze edges at the GLOBAL min/max, histogram each slice, merge:
    # the summed bins must equal operators.histogram.histogram() run
    # directly over the whole table (same bin arithmetic, same edges)
    from spark_df_profiling_spark.operators.histogram import histogram
    mm = lineitem.agg(F.min(F.col("l_extendedprice").cast("double")),
                      F.max(F.col("l_extendedprice").cast("double"))
                      ).collect()[0]
    edges = {"l_extendedprice": (mm[0], mm[1])}
    parts = [partial_profile(lineitem.where(F.col("l_orderkey") % 4 == i),
                             cols=["l_extendedprice"], hist_edges=edges)
             for i in range(4)]
    merged = merge_partials(*parts).collect()[0]
    assert merged["hist_below"] == 0 and merged["hist_above"] == 0
    direct = {r["bin"]: r["cnt"]
              for r in histogram(lineitem, "l_extendedprice", 10).collect()}
    got = {i: c for i, c in enumerate(merged["hist"]) if c > 0}
    assert got == direct
    assert sum(merged["hist"]) == merged["count"]


def test_merged_histogram_hierarchical_and_roundtrip(spark, lineitem,
                                                     tmp_path):
    from spark_df_profiling_spark.operators.incremental import (
        hist_edges_from_state)
    first = partial_profile(lineitem.where(F.col("l_orderkey") % 4 == 0),
                            cols=["l_extendedprice"])
    # day-2+ workflow: freeze edges from the first partial's min/max
    edges = hist_edges_from_state(first)
    assert "l_extendedprice" in edges
    parts = [partial_profile(lineitem.where(F.col("l_orderkey") % 4 == i),
                             cols=["l_extendedprice"], hist_edges=edges)
             for i in range(4)]
    # parquet round-trip one partial (the state-store persistence path)
    path = str(tmp_path / "p0.parquet")
    parts[0].write.mode("overwrite").parquet(path)
    back = spark.read.parquet(path)
    flat = merge_partials(back, *parts[1:]).collect()[0]
    tree = merge_partials(merge_partials(back, parts[1]),
                          merge_partials(parts[2], parts[3])).collect()[0]
    assert list(flat["hist"]) == list(tree["hist"])
    # slice-0 edges need not cover the other slices: overflow counters
    # absorb the out-of-range values instead of clamping them
    assert (sum(flat["hist"]) + flat["hist_below"] + flat["hist_above"]
            == flat["count"])


def test_merge_type_class_drift_fails_loudly(spark):
    import pyspark.errors
    a = partial_profile(spark.createDataFrame([(1,)], "x int"))
    b = partial_profile(spark.createDataFrame([("s",)], "x string"))
    with pytest.raises(Exception, match="type_class drift"):
        merge_partials(a, b).collect()


def test_merge_hist_config_drift_fails_loudly(spark, lineitem):
    sl = lineitem.where(F.col("l_orderkey") % 4 == 0)
    with_hist = partial_profile(sl, cols=["l_extendedprice"],
                                hist_edges={"l_extendedprice": (0., 9e4)})
    without = partial_profile(sl, cols=["l_extendedprice"])
    other_edges = partial_profile(sl, cols=["l_extendedprice"],
                                  hist_edges={"l_extendedprice":
                                              (0., 5e4)})
    with pytest.raises(Exception, match="histogram edge/config drift"):
        merge_partials(with_hist, without).collect()
    with pytest.raises(Exception, match="histogram edge/config drift"):
        merge_partials(with_hist, other_edges).collect()
    # same edges, different BIN COUNT: zip_with would NULL-pad the
    # shorter array into NULL bins without the size guard
    other_bins = partial_profile(sl, cols=["l_extendedprice"],
                                 hist_edges={"l_extendedprice": (0., 9e4)},
                                 hist_bins=20)
    with pytest.raises(Exception, match="histogram edge/config drift"):
        merge_partials(with_hist, other_bins).collect()


def test_quantiles_from_state_within_bin_width(spark, lineitem):
    from spark_df_profiling_spark.operators.incremental import (
        quantiles_from_state)
    lo, hi = lineitem.agg(F.min("l_extendedprice"),
                          F.max("l_extendedprice")).collect()[0]
    bins = 64
    parts = [partial_profile(
        lineitem.where(F.col("l_orderkey") % 4 == i),
        cols=["l_extendedprice"],
        hist_edges={"l_extendedprice": (lo, hi)}, hist_bins=bins)
        for i in range(4)]
    merged = merge_partials(*parts)
    probs = [0.05, 0.25, 0.5, 0.75, 0.95]
    est = {r["prob"]: r["quantile_est"]
           for r in quantiles_from_state(merged, probs).collect()}
    exact = lineitem.select(
        F.percentile("l_extendedprice", F.array(
            *[F.lit(p) for p in probs]))).collect()[0][0]
    binw = (hi - lo) / bins
    for p, ex in zip(probs, exact):
        assert abs(est[p] - ex) <= binw + 1e-9, (p, est[p], ex, binw)
    # merge-invariance: a single partial over the full data gives the
    # IDENTICAL estimate (histogram counts merge exactly)
    single = partial_profile(
        lineitem, cols=["l_extendedprice"],
        hist_edges={"l_extendedprice": (lo, hi)}, hist_bins=bins)
    est_single = {r["prob"]: r["quantile_est"]
                  for r in quantiles_from_state(single, probs).collect()}
    assert est == est_single


def test_quantiles_from_state_edge_cases(spark, lineitem):
    from spark_df_profiling_spark.operators.incremental import (
        quantiles_from_state)
    # frozen edges NARROWER than the data: below/above mass clamps the
    # tail quantiles to the edges instead of erroring
    part = partial_profile(lineitem, cols=["l_extendedprice"],
                           hist_edges={"l_extendedprice": (30_000.0,
                                                           40_000.0)})
    est = {r["prob"]: r["quantile_est"] for r in
           quantiles_from_state(part, [0.001, 0.5, 0.999]).collect()}
    assert est[0.001] == pytest.approx(30_000.0)
    assert est[0.999] == pytest.approx(40_000.0)
    assert 30_000.0 <= est[0.5] <= 40_000.0
    # no histogram configured -> column omitted entirely
    bare = partial_profile(lineitem, cols=["l_extendedprice"])
    assert quantiles_from_state(bare, [0.5]).count() == 0
    with pytest.raises(ValueError, match="probs"):
        quantiles_from_state(part, [1.5])


def test_hist_edges_validation(spark, lineitem):
    with pytest.raises(ValueError, match="hi > lo"):
        partial_profile(lineitem, cols=["l_extendedprice"],
                        hist_edges={"l_extendedprice": (5.0, 5.0)})
    with pytest.raises(ValueError, match="not profiled"):
        partial_profile(lineitem, cols=["l_quantity"],
                        hist_edges={"l_extendedprice": (0.0, 1.0)})
    with pytest.raises(ValueError, match="no numeric view"):
        partial_profile(lineitem, cols=["l_returnflag"],
                        hist_edges={"l_returnflag": (0.0, 1.0)})


def test_empty_partition_state_is_zero_not_null(spark):
    # ADVICE r5: an empty partition must store 0 (not NULL) for
    # n_zeros/n_infinite so the merged sums stay non-NULL
    df = spark.createDataFrame([], "a double, b string")
    row = {r["column"]: r for r in partial_profile(df).collect()}
    assert row["a"]["n_zeros"] == 0 and row["a"]["n_infinite"] == 0
    assert row["b"]["n_zeros"] == 0 and row["b"]["n_infinite"] == 0
    nonempty = partial_profile(
        spark.createDataFrame([(0.0, "x")], "a double, b string"))
    out = {r["column"]: r
           for r in finalize(merge_partials(partial_profile(df),
                                            nonempty)).collect()}
    assert out["a"]["n_zeros"] == 1 and out["a"]["n_infinite"] == 0

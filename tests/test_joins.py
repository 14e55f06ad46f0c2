"""As-of join and bucketed range join (operators/joins.py)."""

import random

import pytest
from pyspark.sql import functions as F

from spark_df_profiling_spark.operators import joins as J


@pytest.fixture(scope="module")
def trades_quotes(spark):
    """Random trades/quotes per symbol + the python-computed expectation."""
    rng = random.Random(7)
    trades, quotes = [], []
    for sym in ("A", "B", "C"):
        for i in range(200):
            trades.append((sym, rng.randint(0, 10_000), i))
        for j in range(150):
            quotes.append((sym, rng.randint(0, 10_000), j * 10))
    t = spark.createDataFrame(trades, "sym string, ts long, trade_id long")
    q = spark.createDataFrame(quotes, "sym string, ts long, quote_px long")
    expect = {}
    by_sym = {}
    for sym, ts, px in quotes:
        by_sym.setdefault(sym, []).append((ts, px))
    for sym in by_sym:
        by_sym[sym].sort()
    for sym, ts, tid in trades:
        best = None
        for qts, px in by_sym[sym]:
            if qts <= ts and (best is None or qts >= best[0]):
                best = (qts, px)
        expect[(sym, ts, tid)] = best
    return t, q, expect


def test_asof_backward_matches_python(trades_quotes):
    t, q, expect = trades_quotes
    out = J.asof_join(t, q, on="sym", left_ts="ts").collect()
    assert len(out) == len(expect)
    for r in out:
        want = expect[(r["sym"], r["ts"], r["trade_id"])]
        got = None if r["r_ts"] is None else (r["r_ts"], r["r_quote_px"])
        assert got == want


def test_asof_tie_is_inclusive(spark):
    t = spark.createDataFrame([(1, 100)], "k int, ts long")
    q = spark.createDataFrame([(1, 100, 9)], "k int, ts long, px int")
    row = J.asof_join(t, q, on="k").collect()[0]
    assert (row["r_ts"], row["r_px"]) == (100, 9)


def test_asof_forward_and_tolerance(spark):
    t = spark.createDataFrame([(1, 100), (1, 500)], "k int, ts long")
    q = spark.createDataFrame([(1, 110, 1), (1, 900, 2)],
                              "k int, ts long, qid int")
    fwd = {r["ts"]: r["r_qid"]
           for r in J.asof_join(t, q, on="k", direction="forward").collect()}
    assert fwd == {100: 1, 500: 2}
    tol = {r["ts"]: r["r_qid"]
           for r in J.asof_join(t, q, on="k", direction="forward",
                                tolerance=50).collect()}
    assert tol == {100: 1, 500: None}


def test_asof_null_payload_not_blended(spark):
    # quote at ts=20 has px NULL; a per-column last() would wrongly pull
    # px=7 from ts=10 while taking qid from ts=20
    t = spark.createDataFrame([(1, 30)], "k int, ts long")
    q = spark.createDataFrame([(1, 10, 7, 70), (1, 20, None, 80)],
                              "k int, ts long, px int, qid int")
    row = J.asof_join(t, q, on="k").collect()[0]
    assert (row["r_ts"], row["r_px"], row["r_qid"]) == (20, None, 80)


def test_asof_single_shuffle(trades_quotes):
    t, q, _ = trades_quotes
    plan = J.asof_join(t, q, on="sym")._jdf.queryExecution() \
        .executedPlan().toString()
    assert plan.count("Exchange") == 1


def test_range_join_matches_naive(spark):
    rng = random.Random(11)
    pts = spark.createDataFrame(
        [(i, rng.randint(0, 5000)) for i in range(800)], "pid long, x long")
    ivs = spark.createDataFrame(
        [(j, s := rng.randint(0, 4800), s + rng.randint(1, 400))
         for j in range(60)], "iid long, lo long, hi long")
    fast = {(r["pid"], r["iid"]) for r in J.range_join_buckets(
        pts, ivs, "x", "lo", "hi", bucket_width=256).collect()}
    naive = {(r["pid"], r["iid"]) for r in pts.join(
        ivs, (F.col("x") >= F.col("lo")) & (F.col("x") < F.col("hi")))
        .collect()}
    assert fast == naive and len(naive) > 0


def test_range_join_plan_is_hash_join(spark):
    pts = spark.createDataFrame([(1, 5)], "pid long, x long")
    ivs = spark.createDataFrame([(1, 0, 10)], "iid long, lo long, hi long")
    plan = J.range_join_buckets(pts, ivs, "x", "lo", "hi", 16)._jdf \
        .queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "Cartesian" not in plan

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


def test_asof_null_timestamps_never_match(spark):
    # right NULL ts must not become anyone's match; left NULL ts stays
    # unmatched (DuckDB/pandas ASOF semantics)
    t = spark.createDataFrame([(1, 5), (1, None), (1, 100)],
                              "k int, ts long")
    q = spark.createDataFrame([(1, None, 99), (1, 50, 7)],
                              "k int, ts long, px int")
    rows = {r["ts"]: (r["r_ts"], r["r_px"])
            for r in J.asof_join(t, q, on="k").collect()}
    assert rows[5] == (None, None)       # no real predecessor
    assert rows[None] == (None, None)    # NULL left ts: unmatched
    assert rows[100] == (50, 7)


def test_asof_time_bucketed_matches_plain(trades_quotes):
    t, q, expect = trades_quotes
    out = J.asof_join(t, q, on="sym", time_bucket=500.0).collect()
    assert len(out) == len(expect)
    for r in out:
        want = expect[(r["sym"], r["ts"], r["trade_id"])]
        got = None if r["r_ts"] is None else (r["r_ts"], r["r_quote_px"])
        assert got == want


def test_asof_time_bucketed_hot_key(spark):
    # planted hot key: one key owns most rows; bucketed path must still
    # match the naive per-key python oracle, both directions
    rng = random.Random(3)
    trades = [("HOT" if i % 10 else f"cold{i}", rng.randint(0, 100_000), i)
              for i in range(2000)]
    # unique quote ts per key: duplicate (key, ts) quotes would make the
    # asof tie-break between two right rows nondeterministic
    uniq_ts = rng.sample(range(0, 100_000), 1500)
    quotes = [("HOT" if j % 10 else f"cold{j}", uniq_ts[j], j)
              for j in range(1500)]
    t = spark.createDataFrame(trades, "sym string, ts long, trade_id long")
    q = spark.createDataFrame(quotes, "sym string, ts long, qid long")
    by_sym = {}
    for sym, ts, qid in quotes:
        by_sym.setdefault(sym, []).append((ts, qid))
    for direction in ("backward", "forward"):
        expect = {}
        for sym, ts, tid in trades:
            best = None
            for qts, qid in by_sym.get(sym, []):
                if direction == "backward":
                    ok = qts <= ts and (best is None or qts > best[0] or
                                        (qts == best[0] and qid > best[1]))
                else:
                    ok = qts >= ts and (best is None or qts < best[0] or
                                        (qts == best[0] and qid > best[1]))
                if ok:
                    best = (qts, qid)
            expect[tid] = None if best is None else best[0]
        out = J.asof_join(t, q, on="sym", direction=direction,
                          time_bucket=5_000.0).collect()
        assert len(out) == len(trades)
        for r in out:
            assert r["r_ts"] == expect[r["trade_id"]], \
                f"{direction} trade {r['trade_id']}"


def test_range_join_degenerate_and_edge_intervals(spark):
    # empty/inverted intervals match nothing (and must not explode
    # descending bucket sequences); end exactly on a bucket edge must not
    # pull in the next bucket
    pts = spark.createDataFrame([(1, 5), (2, 16), (3, 31)],
                                "pid long, x long")
    ivs = spark.createDataFrame(
        [(1, 0, 16),    # end on bucket edge (width 16): covers x<16 only
         (2, 10, 10),   # empty
         (3, 40, 20),   # inverted
         (4, 30, 32)],  # normal
        "iid long, lo long, hi long")
    got = {(r["pid"], r["iid"]) for r in J.range_join_buckets(
        pts, ivs, "x", "lo", "hi", bucket_width=16).collect()}
    assert got == {(1, 1), (3, 4)}


def test_range_join_large_magnitude_epoch_micros(spark):
    # epoch-microsecond magnitudes (~1.7e18? no — 1.7e15) where the old
    # 1e-9 epsilon was a no-op; exact edge arithmetic must still exclude
    # an end sitting on a bucket edge
    base = 1_700_000_000_000_000  # epoch micros
    w = 1_000_000.0
    pts = spark.createDataFrame([(1, base + 999_999), (2, base + 1_000_000)],
                                "pid long, x long")
    ivs = spark.createDataFrame([(1, base, base + 1_000_000)],
                                "iid long, lo long, hi long")
    got = {(r["pid"], r["iid"]) for r in J.range_join_buckets(
        pts, ivs, "x", "lo", "hi", bucket_width=w).collect()}
    assert got == {(1, 1)}


def test_asof_time_bucket_validated(spark):
    t = spark.createDataFrame([(1, 100)], "k int, ts long")
    q = spark.createDataFrame([(1, 90, 9)], "k int, ts long, px int")
    for bad in (0, -5, -0.5):
        with pytest.raises(ValueError, match="time_bucket"):
            J.asof_join(t, q, on="k", time_bucket=bad)


def test_asof_bucketed_exact_beyond_double_2_53(spark):
    # int64 epoch-nano-style timestamps above double's 2^53 exact range:
    # the integer bucketing path must keep exact asof semantics where a
    # double round-trip could mis-bucket or sort the carry row after
    # real rows (dropping its match)
    base = 1 << 60
    t = spark.createDataFrame(
        [(1, base + 3), (1, base + 10), (1, base + 1_000_003)],
        "k int, ts long")
    q = spark.createDataFrame(
        [(1, base + 5, 1), (1, base + 1_000_000, 2)],
        "k int, ts long, qid int")
    rows = {r["ts"] - base: r["r_qid"]
            for r in J.asof_join(t, q, on="k",
                                 time_bucket=1000).collect()}
    # +3: no quote at or before; +10: quote at +5 (cross = same bucket);
    # +1_000_003: quote at +1_000_000 carried across ~1000 buckets
    assert rows == {3: None, 10: 1, 1_000_003: 2}


def test_asof_bucketed_negative_int_ts(spark):
    # integer floor-division path must floor (not truncate) for ts < 0
    t = spark.createDataFrame([(1, -5), (1, 5)], "k int, ts long")
    q = spark.createDataFrame([(1, -7, 1), (1, 2, 2)],
                              "k int, ts long, qid int")
    rows = {r["ts"]: r["r_qid"]
            for r in J.asof_join(t, q, on="k", time_bucket=10).collect()}
    assert rows == {-5: 1, 5: 2}

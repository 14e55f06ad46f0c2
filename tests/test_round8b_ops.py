"""Round-8 session-2 operators: HLL sketch, interval merge, fuzzy
Levenshtein join, winsorize, batch sessionize, rolling time-window
stats.  Each is pinned against a pure-Python (or closed-form)
reference on crafted data; the oracle folds grade them against DuckDB
replays on driver data."""

import math
import random
import string

import pytest
from pyspark.sql import functions as F

from spark_df_profiling_spark.operators.frequency import (
    hll_estimate, hll_merge, hll_state)
from spark_df_profiling_spark.operators.joins import merge_intervals
from spark_df_profiling_spark.operators.dedup import (
    char_qgram_expr, fuzzy_pairs_levenshtein)
from spark_df_profiling_spark.operators.outliers import winsorize
from spark_df_profiling_spark.operators.groupby import (
    rolling_stats, sessionize)


# ---------------------------------------------------------------- HLL
def test_hll_estimate_within_error_bound(spark):
    # p=12 -> m=4096, standard error 1.04/sqrt(m) ~ 1.6%; assert 3 sigma
    for n in (100, 5_000, 60_000):
        df = spark.range(n).select(
            F.concat(F.lit("key_"), F.col("id")).alias("k"))
        est = hll_estimate(hll_state(df, "k", p=12)).collect()[0][0]
        assert abs(est - n) / n < 0.05, (n, est)


def test_hll_merge_equals_union_state(spark):
    a = spark.range(0, 3_000).select(
        F.concat(F.lit("k"), F.col("id")).alias("k"))
    b = spark.range(2_000, 6_000).select(
        F.concat(F.lit("k"), F.col("id")).alias("k"))
    merged = sorted(tuple(r) for r in
                    hll_merge(hll_state(a, "k"), hll_state(b, "k"))
                    .collect())
    union = sorted(tuple(r) for r in
                   hll_state(a.union(b), "k").collect())
    assert merged == union  # register-wise max IS union, exactly


def test_hll_state_bounded_and_duplicates_free(spark):
    # 50k copies of 10 distinct keys -> <= 10 occupied registers,
    # estimate ~10 regardless of row count (cardinality, not frequency)
    df = spark.range(50_000).select(
        F.concat(F.lit("k"), F.col("id") % 10).alias("k"))
    st = hll_state(df, "k", p=12).collect()
    assert len(st) <= 10
    est = hll_estimate(hll_state(df, "k", p=12)).collect()[0][0]
    assert est == 10  # linear-counting regime is exact this small


def test_hll_rho_exact_at_power_of_two_boundaries(spark):
    # bin()-length arithmetic must be exact where float log2 misrounds:
    # rho for rem = 2^j is (60-p) - j; craft via direct column math
    from spark_df_profiling_spark.operators.frequency import hll_position
    df = spark.createDataFrame([("x",)], "s string")
    pos = df.select(hll_position(F.col("s"), 12).alias("p")).collect()[0][0]
    assert 1 <= pos["rho"] <= 49 and 0 <= pos["reg"] < 4096


def test_hll_p_validation(spark):
    df = spark.range(5).select(F.col("id").cast("string").alias("k"))
    with pytest.raises(ValueError):
        hll_state(df, "k", p=3)
    with pytest.raises(ValueError):
        hll_state(df, "k", p=19)


# ----------------------------------------------------- merge_intervals
def test_merge_intervals_chains_contains_and_degenerates(spark):
    rows = [("a", 1.0, 5.0), ("a", 4.0, 8.0), ("a", 8.0, 9.0),
            ("a", 12.0, 13.0), ("a", 20.0, 18.0),
            ("b", 0.0, 100.0), ("b", 10.0, 20.0), ("b", 150.0, 160.0),
            ("c", None, 5.0), (None, 1.0, 2.0)]
    df = spark.createDataFrame(rows, "k string, s double, e double")
    got = sorted(tuple(r) for r in
                 merge_intervals(df, "k", "s", "e").collect())
    assert got == [("a", 1.0, 9.0, 3),     # touching chain merges
                   ("a", 12.0, 13.0, 1),
                   ("a", 20.0, 20.0, 1),   # end<start clamps to a point
                   ("b", 0.0, 100.0, 2),   # containment absorbs
                   ("b", 150.0, 160.0, 1)]  # null key/start dropped


def test_merge_intervals_min_gap_bridges_near_adjacent(spark):
    rows = [("a", 1.0, 9.0), ("a", 12.0, 13.0), ("a", 20.0, 21.0)]
    df = spark.createDataFrame(rows, "k string, s double, e double")
    got = sorted(tuple(r) for r in
                 merge_intervals(df, "k", "s", "e", min_gap=3.0)
                 .collect())
    # gap 9->12 == 3 <= min_gap merges; 13->20 == 7 stays split
    assert got == [("a", 1.0, 13.0, 2), ("a", 20.0, 21.0, 1)]


def test_merge_intervals_matches_python_reference(spark):
    random.seed(7)
    rows = []
    for _ in range(3_000):
        k = f"k{random.randrange(15)}"
        s = float(random.randrange(500))
        rows.append((k, s, s + random.randrange(1, 25)))
    df = spark.createDataFrame(rows, "k string, s double, e double")
    got = sorted(tuple(r) for r in
                 merge_intervals(df, "k", "s", "e").collect())
    # python sweep-line reference
    exp = []
    bykey = {}
    for k, s, e in rows:
        bykey.setdefault(k, []).append((s, e))
    for k, ivs in bykey.items():
        cur = None
        for s, e in sorted(ivs):
            if cur is None or s > cur[1]:
                if cur:
                    exp.append((k, cur[0], cur[1], cur[2]))
                cur = [s, e, 1]
            else:
                cur[1] = max(cur[1], e)
                cur[2] += 1
        exp.append((k, cur[0], cur[1], cur[2]))
    assert got == sorted(exp)


def test_merge_intervals_composite_key(spark):
    rows = [("a", 1, 1.0, 2.0), ("a", 2, 1.5, 3.0), ("b", 1, 1.5, 3.0)]
    df = spark.createDataFrame(rows, "k string, g int, s double, e double")
    got = sorted(tuple(r) for r in
                 merge_intervals(df, ["k", "g"], "s", "e").collect())
    assert got == [("a", 1, 1.0, 2.0, 1), ("a", 2, 1.5, 3.0, 1),
                   ("b", 1, 1.5, 3.0, 1)]


# ------------------------------------------- fuzzy_pairs_levenshtein
def _typo_corpus(seed: int = 42):
    random.seed(seed)
    rows, i = [], 0
    for base in ["spark dataframe profiler", "data quality pipeline",
                 "abc", "ab", "x", "tokenizer", ""]:
        for _ in range(6):
            s = list(base)
            for _ in range(random.randrange(0, 3)):
                if not s:
                    break
                op, p = random.randrange(3), random.randrange(len(s))
                if op == 0:
                    s[p] = random.choice(string.ascii_lowercase)
                elif op == 1:
                    s.insert(p, random.choice(string.ascii_lowercase))
                else:
                    del s[p]
            rows.append((i, "".join(s)))
            i += 1
    words = ["profiling", "spark", "dataframe", "pipeline", "quality"]
    for _ in range(80):
        rows.append((i, " ".join(random.choice(words)
                                 for _ in range(random.randrange(1, 5)))))
        i += 1
    return rows


def test_fuzzy_pairs_complete_vs_bruteforce(spark):
    """Candidate generation must be a SUPERSET of true pairs — verify
    the whole operator against python all-pairs, including short and
    empty strings (the q-gram-free regime)."""
    rows = _typo_corpus()
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = sorted(tuple(r) for r in
                 fuzzy_pairs_levenshtein(df, "text", "doc_id",
                                         max_dist=2).collect())

    def lev(a, b):
        if len(a) < len(b):
            a, b = b, a
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                               prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    exp = []
    for i in range(len(rows)):
        for j in range(i + 1, len(rows)):
            (ia, ta), (ib, tb) = rows[i], rows[j]
            if abs(len(ta) - len(tb)) <= 2:
                d = lev(ta, tb)
                if d <= 2:
                    a, b = sorted((ia, ib))
                    exp.append((a, b, d))
    assert got == sorted(exp)
    assert len(got) > 100  # the fixture plants real clusters


def test_fuzzy_pairs_max_dist_zero_is_exact_dup(spark):
    rows = [(1, "aaa"), (2, "aaa"), (3, "aab"), (4, "a"), (5, "a")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = sorted(tuple(r) for r in
                 fuzzy_pairs_levenshtein(df, "text", "doc_id",
                                         max_dist=0).collect())
    assert got == [(1, 2, 0), (4, 5, 0)]


def test_char_qgram_expr_short_strings_empty(spark):
    df = spark.createDataFrame([("ab",), ("abc",), ("abcd",)],
                               "t string")
    got = [r[0] for r in
           df.select(char_qgram_expr("t", 3)).collect()]
    assert got == [[], ["abc"], ["abc", "bcd"]]


def test_fuzzy_pairs_gram_cap_trades_recall_loudly(spark):
    # hot-gram cap drops candidates whose only shared grams are hot —
    # with cap=1 every gram bucket dies, only the short branch survives
    rows = [(1, "abcdefghij"), (2, "abcdefghiX"), (3, "ab"), (4, "ab")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    full = fuzzy_pairs_levenshtein(df, "text", "doc_id", max_dist=1)
    assert {(r[0], r[1]) for r in full.collect()} == {(1, 2), (3, 4)}
    capped = fuzzy_pairs_levenshtein(df, "text", "doc_id", max_dist=1,
                                     max_gram_bucket=1)
    assert {(r[0], r[1]) for r in capped.collect()} == {(3, 4)}


# ------------------------------------------------------------ winsorize
def test_winsorize_matches_python_quantiles(spark):
    random.seed(3)
    vals = [random.gauss(0, 10) for _ in range(2_001)]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    got = {r["x"]: r["x_w"]
           for r in winsorize(df, ["x"], 0.05, 0.95).collect()}
    sv = sorted(vals)

    def q(p):
        h = p * (len(sv) - 1)
        lo, hi = int(math.floor(h)), int(math.ceil(h))
        return sv[lo] + (h - lo) * (sv[hi] - sv[lo])

    lo, hi = q(0.05), q(0.95)
    for v in vals:
        assert got[v] == pytest.approx(min(max(v, lo), hi), abs=1e-9)


def test_winsorize_null_nan_inf_semantics(spark):
    df = spark.createDataFrame(
        [(1.0,), (2.0,), (3.0,), (float("nan",),),
         (float("inf"),), (float("-inf"),), (None,)], "x double")
    got = {str(r["x"]): r["x_w"]
           for r in winsorize(df, ["x"], 0.25, 0.75).collect()}
    assert math.isnan(got["nan"])        # NaN survives, never clips
    assert got["None"] is None           # NULL survives (greatest
    #                                      ignores nulls — guarded)
    assert not math.isnan(got["inf"])    # NaN excluded from cuts, so
    #                                      inf clips onto a real cut
    assert got["-inf"] == got["1.0"]     # -inf lands on the lower cut


def test_winsorize_approx_switch_close_to_exact(spark):
    df = spark.range(10_000).select(
        (F.col("id") % 1000).cast("double").alias("x"))
    ex = winsorize(df, ["x"], 0.01, 0.99, exact=True)
    ap = winsorize(df, ["x"], 0.01, 0.99, exact=False)
    me = ex.agg(F.max("x_w"), F.min("x_w")).collect()[0]
    ma = ap.agg(F.max("x_w"), F.min("x_w")).collect()[0]
    assert abs(me[0] - ma[0]) <= 2 and abs(me[1] - ma[1]) <= 2


def test_winsorize_param_validation(spark):
    df = spark.range(5).select(F.col("id").cast("double").alias("x"))
    with pytest.raises(ValueError):
        winsorize(df, [], 0.1, 0.9)
    with pytest.raises(ValueError):
        winsorize(df, ["x"], 0.9, 0.1)


# ------------------------------------------------------------ sessionize
def test_sessionize_crafted_timeline(spark):
    rows = [("u1", 0.0, 1.0), ("u1", 100.0, 2.0), ("u1", 2000.0, 3.0),
            ("u1", 2100.0, None), ("u2", 5.0, 10.0),
            (None, 1.0, 1.0), ("u3", None, 1.0)]
    df = spark.createDataFrame(rows, "k string, ts double, v double")
    got = sorted(tuple(r) for r in
                 sessionize(df, "ts", "k", gap=1800.0,
                            agg_cols=["v"]).collect())
    assert got == [
        ("u1", 1, 0.0, 100.0, 100.0, 2, 3.0, 1.5),
        ("u1", 2, 2000.0, 2100.0, 100.0, 2, 3.0, 3.0),  # null v: sum
        ("u2", 1, 5.0, 5.0, 0.0, 1, 10.0, 10.0),        # over non-null
    ]


def test_sessionize_gap_boundary_is_exclusive(spark):
    # gap exactly == threshold stays in the SAME session (> opens)
    rows = [("u", 0.0), ("u", 1800.0), ("u", 3601.0)]
    df = spark.createDataFrame(rows, "k string, ts double")
    got = sorted(tuple(r) for r in
                 sessionize(df, "ts", "k", gap=1800.0).collect())
    assert [g[1] for g in got] == [1, 2]
    assert got[0][5] == 2  # first session holds both edge events


# --------------------------------------------------------- rolling_stats
def test_rolling_stats_matches_python(spark):
    random.seed(5)
    rows = []
    for u in range(10):
        t = 0.0
        for _ in range(50):
            t += random.choice([1, 5, 50, 200])
            rows.append((f"u{u}", t,
                         float(random.randrange(100))
                         if random.random() > 0.15 else None))
    df = spark.createDataFrame(rows, "k string, ts double, v double")
    got = {(r["k"], r["ts"]): (r["roll_count"], r["roll_sum"],
                               r["roll_mean"])
           for r in rolling_stats(df, "ts", "k", "v", 100.0).collect()}
    for k, ts, _ in rows:
        inwin = [v for kk, t2, v in rows
                 if kk == k and ts - 100.0 <= t2 <= ts and v is not None]
        c, s = len(inwin), sum(inwin)
        assert got[(k, ts)][0] == c
        if c:
            assert got[(k, ts)][1] == pytest.approx(s)
            assert got[(k, ts)][2] == pytest.approx(s / c)
        else:
            assert got[(k, ts)][1] is None


def test_rolling_stats_fractional_window(spark):
    # the SQL-frame construction exists precisely because the DataFrame
    # API truncates fractional offsets — sub-second windows must work
    rows = [("u", 0.0, 1.0), ("u", 0.4, 2.0), ("u", 0.9, 4.0)]
    df = spark.createDataFrame(rows, "k string, ts double, v double")
    got = {r["ts"]: r["roll_sum"]
           for r in rolling_stats(df, "ts", "k", "v", 0.5).collect()}
    assert got == {0.0: 1.0, 0.4: 3.0, 0.9: 6.0}


def test_rolling_stats_validation(spark):
    df = spark.createDataFrame([("u", 1.0, 1.0)],
                               "k string, ts double, v double")
    with pytest.raises(ValueError):
        rolling_stats(df, "ts", "k", "v", 0)
    with pytest.raises(ValueError):
        rolling_stats(df, "ts", "k", "v", 10.0, stats=["median"])


# ------------------------------------------------------------ plan pins
def test_merge_intervals_single_shuffle(spark):
    """One Exchange on the key: the windows and the closing groupBy
    (whose keys EXTEND the window partitioning) must reuse it."""
    df = spark.range(1000).select(
        (F.col("id") % 10).alias("k"),
        F.col("id").cast("double").alias("s"),
        (F.col("id") + 5).cast("double").alias("e"))
    plan = (merge_intervals(df, "k", "s", "e")
            ._jdf.queryExecution().executedPlan().toString())
    assert plan.count("Exchange") == 1, plan


def test_sessionize_single_shuffle(spark):
    df = spark.range(1000).select(
        (F.col("id") % 10).alias("k"),
        F.col("id").cast("double").alias("ts"))
    plan = (sessionize(df, "ts", "k", gap=5.0)
            ._jdf.queryExecution().executedPlan().toString())
    assert plan.count("Exchange") == 1, plan


def test_rolling_stats_single_shuffle(spark):
    df = spark.range(1000).select(
        (F.col("id") % 10).alias("k"),
        F.col("id").cast("double").alias("ts"),
        F.col("id").cast("double").alias("v"))
    plan = (rolling_stats(df, "ts", "k", "v", 10.0)
            ._jdf.queryExecution().executedPlan().toString())
    assert plan.count("Exchange") == 1, plan


def test_winsorize_no_row_shuffle(spark):
    """Cuts ride a broadcast back over the table: the clip stage must
    contain no hashpartitioning Exchange of the data rows."""
    df = spark.range(1000).select(F.col("id").cast("double").alias("x"))
    plan = (winsorize(df, ["x"])
            ._jdf.queryExecution().executedPlan().toString())
    assert "BroadcastExchange" in plan
    assert "hashpartitioning" not in plan, plan


def test_fuzzy_pairs_never_nested_loop(spark):
    """Candidate generation must stay equi-joins (gram / length keys) —
    a bare inequality join would plan a BroadcastNestedLoopJoin and
    square at scale."""
    df = spark.createDataFrame([(1, "abcdef"), (2, "abcdeg"), (3, "xy")],
                               "doc_id long, text string")
    plan = (fuzzy_pairs_levenshtein(df, "text", "doc_id", max_dist=1)
            ._jdf.queryExecution().executedPlan().toString())
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_hll_state_single_shuffle_no_explode(spark):
    """HLL needs one coordinate per row (unlike CMS/Bloom's k): no
    Generate node, one register-keyed Exchange above a partial agg."""
    df = spark.range(1000).select(F.col("id").cast("string").alias("k"))
    plan = (hll_state(df, "k")
            ._jdf.queryExecution().executedPlan().toString())
    assert "Generate" not in plan, plan
    assert plan.count("Exchange") == 1, plan

"""Round-10 session-3 operators: Fellegi-Sunter linkage scoring."""
from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from spark_df_profiling_spark.operators.dedup import (
    field_u_probs, linkage_score_pairs)


@pytest.fixture(scope="module")
def fs_records(spark):
    # lang: 3x a, 2x b, 1 null  -> u over non-null = (9+4)/25
    # city: 2x x, 2x y, 2x z    -> u = 12/36 = 1/3
    rows = [(1, "a", "x"), (2, "a", "x"), (3, "a", "y"),
            (4, "b", "y"), (5, "b", "z"), (6, None, "z")]
    return spark.createDataFrame(rows, "id long, lang string, city string")


@pytest.fixture(scope="module")
def fs_pairs(spark):
    rows = [(1, 2), (1, 4), (2, 6), (3, 4)]
    return spark.createDataFrame(rows, "id_a long, id_b long")


def test_field_u_probs(fs_records):
    u = field_u_probs(fs_records, ["lang", "city"])
    assert u["lang"] == pytest.approx(13 / 25)
    assert u["city"] == pytest.approx(1 / 3)


def test_linkage_scores_match_closed_form(fs_records, fs_pairs):
    out = linkage_score_pairs(fs_records, fs_pairs, "id",
                              ["lang", "city"], m=0.9)
    rows = {(r.id_a, r.id_b): r for r in out.collect()}
    u_lang, u_city = 13 / 25, 1 / 3
    wa_l, wd_l = math.log2(0.9 / u_lang), math.log2(0.1 / (1 - u_lang))
    wa_c, wd_c = math.log2(0.9 / u_city), math.log2(0.1 / (1 - u_city))
    # (1,2): lang agree, city agree
    assert rows[(1, 2)].fs_score == pytest.approx(wa_l + wa_c)
    assert (rows[(1, 2)].agree_lang, rows[(1, 2)].agree_city) == (1, 1)
    # (1,4): lang differ, city differ
    assert rows[(1, 4)].fs_score == pytest.approx(wd_l + wd_c)
    assert (rows[(1, 4)].agree_lang, rows[(1, 4)].agree_city) == (0, 0)
    # (2,6): lang null on one side -> neutral 0; city differ
    assert rows[(2, 6)].fs_score == pytest.approx(wd_c)
    assert rows[(2, 6)].agree_lang is None
    # (3,4): lang differ, city agree
    assert rows[(3, 4)].fs_score == pytest.approx(wd_l + wa_c)


def test_linkage_explicit_u_and_validation(fs_records, fs_pairs):
    out = linkage_score_pairs(fs_records, fs_pairs, "id", ["lang"],
                              m=0.8, u={"lang": 0.25})
    r12 = {(r.id_a, r.id_b): r.fs_score for r in out.collect()}[(1, 2)]
    assert r12 == pytest.approx(math.log2(0.8 / 0.25))
    with pytest.raises(ValueError):
        linkage_score_pairs(fs_records, fs_pairs, "id", [], m=0.9)
    with pytest.raises(ValueError):
        linkage_score_pairs(fs_records, fs_pairs, "id", ["lang"], m=1.5)
    with pytest.raises(ValueError):
        linkage_score_pairs(fs_records, fs_pairs, "id", ["lang"],
                            m=0.9, u={"lang": 0.0})
    with pytest.raises(ValueError):
        linkage_score_pairs(fs_records, fs_pairs, "id", ["nope"], m=0.9)


def test_linkage_u_estimation_is_lazy_frame_scale(fs_records, fs_pairs):
    # u estimation collects O(#fields) scalars; the scored frame itself
    # stays unevaluated until an action
    out = linkage_score_pairs(fs_records, fs_pairs, "id",
                              ["lang", "city"])
    assert set(out.columns) == {"id_a", "id_b", "agree_lang",
                                "agree_city", "fs_score"}


def test_linkage_all_null_field_rejected(spark, fs_pairs):
    rec = spark.createDataFrame(
        [(1, None), (2, None), (4, None), (3, None), (6, None)],
        "id long, lang string")
    with pytest.raises(ValueError):
        linkage_score_pairs(rec, fs_pairs, "id", ["lang"])


# ---------------------------------------- SNM frozen-boundary regression
from spark_df_profiling_spark.operators.dedup import (
    sorted_neighborhood_pairs)


def test_snm_exact_pair_count_at_scale(spark):
    # r10 rehearsal regression: repartitionByRange re-samples its
    # boundaries per execution, so the driver offset map built from the
    # counts job went stale for the pairing job — global ranks collided
    # and the pair count drifted ~5% off (and differed run to run).
    # With the localCheckpoint freeze the count is EXACTLY 3n-6 for
    # window=3 (rank r pairs with r+1..r+3, truncated at the end), even
    # with a 50%-tie sort key spread over many range partitions.
    n = 50_000
    df = (spark.range(n)
          .select(F.col("id").alias("doc_id"),
                  F.when(F.col("id") % 2 == 0, F.lit("hot"))
                  .otherwise((F.col("id") % 997).cast("string"))
                  .alias("k")))
    out = sorted_neighborhood_pairs(df, "doc_id", "k", window=3,
                                    n_partitions=32)
    assert out.count() == 3 * n - 6
    # and the output is identical across two separate actions
    assert out.count() == 3 * n - 6


def test_snm_global_ranks_unique_at_scale(spark):
    # distinct (id_a, dist=1) successors == n-1 rows exactly iff the
    # global rank is a permutation (duplicated ranks create fan-out)
    n = 20_000
    df = (spark.range(n)
          .select(F.col("id").alias("doc_id"),
                  (F.col("id") % 13).cast("string").alias("k")))
    d1 = (sorted_neighborhood_pairs(df, "doc_id", "k", window=1,
                                    n_partitions=16))
    assert d1.count() == n - 1
    assert d1.select("id_a").distinct().count() == n - 1


# ------------------------------------------------ CDC: latest_snapshot
from spark_df_profiling_spark.operators.cdc import (
    latest_snapshot, scd2_merge)


@pytest.fixture(scope="module")
def changelog(spark):
    rows = [(1, 10, "a", 5.0), (1, 20, "b", 6.0), (2, 5, "x", 1.0),
            (2, 7, "x", 2.0), (3, 1, "z", None)]
    return spark.createDataFrame(
        rows, "k long, v long, s string, p double")


def test_latest_snapshot_picks_max_version(changelog):
    got = sorted((r.k, r.v, r.s, r.p) for r in
                 latest_snapshot(changelog, "k", "v").collect())
    assert got == [(1, 20, "b", 6.0), (2, 7, "x", 2.0),
                   (3, 1, "z", None)]


def test_latest_snapshot_payload_subset_and_validation(changelog):
    got = sorted((r.k, r.v, r.s) for r in latest_snapshot(
        changelog, "k", "v", payload_cols=["s"]).collect())
    assert got == [(1, 20, "b"), (2, 7, "x"), (3, 1, "z")]
    with pytest.raises(ValueError):
        latest_snapshot(changelog, "k", "nope")
    with pytest.raises(ValueError):
        latest_snapshot(changelog, "k", "k")
    with pytest.raises(ValueError):
        latest_snapshot(changelog, [], "v")


def test_latest_snapshot_strict_duplicate_version_raises(spark):
    df = spark.createDataFrame([(1, 10, "a"), (1, 10, "b")],
                               "k long, v long, s string")
    with pytest.raises(Exception, match="duplicate version"):
        latest_snapshot(df, "k", "v").collect()
    # non-strict: deterministic tie-break by payload struct ordering
    assert latest_snapshot(df, "k", "v",
                           strict=False).collect()[0].s == "b"


# --------------------------------------------------- CDC: scd2_merge
@pytest.fixture(scope="module")
def scd_hist(spark):
    # key 1: one closed + one open row; key 2: open; key 9: closed only
    rows = [(1, "a", 0, 10), (1, "b", 10, None),
            (2, "x", 3, None), (9, "q", 0, 5)]
    return spark.createDataFrame(
        rows, "k long, s string, valid_from long, valid_to long")


def test_scd2_merge_full_scenario(spark, scd_hist):
    ups = spark.createDataFrame(
        [(1, "b", 15),   # no-change vs open row -> collapses
         (1, "c", 20), (1, "c", 25),   # change + no-change run
         (2, "y", 30),                 # change
         (5, "n", 2)],                 # brand-new key
        "k long, s string, ts long")
    out = sorted((tuple(r) for r in
                  scd2_merge(scd_hist, ups, "k", "s", "ts").collect()),
                 key=lambda t: (t[0], t[2]))
    assert out == [
        (1, "a", 0, 10, False), (1, "b", 10, 20, False),
        (1, "c", 20, None, True),
        (2, "x", 3, 30, False), (2, "y", 30, None, True),
        (5, "n", 2, None, True),
        (9, "q", 0, 5, False)]


def test_scd2_merge_no_updates_passthrough(spark, scd_hist):
    empty = spark.createDataFrame([], "k long, s string, ts long")
    out = {(r.k, r.valid_from): (r.valid_to, r.is_current)
           for r in scd2_merge(scd_hist, empty, "k", "s", "ts")
           .collect()}
    assert out[(1, 10)] == (None, True)
    assert out[(1, 0)] == (10, False)
    assert out[(9, 0)] == (5, False)


def test_scd2_merge_null_safe_attr_compare(spark):
    hist = spark.createDataFrame([(1, None, 0, None)],
                                 "k long, s string, valid_from long, "
                                 "valid_to long")
    ups = spark.createDataFrame(
        [(1, None, 5), (1, "a", 9)], "k long, s string, ts long")
    out = sorted(((r.s, r.valid_from, r.valid_to) for r in
                  scd2_merge(hist, ups, "k", "s", "ts").collect()),
                 key=lambda t: t[1])
    # NULL->NULL collapses (no spurious version); NULL->'a' is a change
    assert out == [(None, 0, 9), ("a", 9, None)]


def test_scd2_merge_contract_violations(spark, scd_hist):
    dup = spark.createDataFrame([(2, "y", 30), (2, "z", 30)],
                                "k long, s string, ts long")
    with pytest.raises(Exception, match="duplicate version"):
        scd2_merge(scd_hist, dup, "k", "s", "ts").collect()
    ooo = spark.createDataFrame([(2, "y", 1)],
                                "k long, s string, ts long")
    with pytest.raises(Exception, match="out-of-order"):
        scd2_merge(scd_hist, ooo, "k", "s", "ts").collect()
    nul = spark.createDataFrame([(2, "y", None)],
                                "k long, s string, ts long")
    with pytest.raises(Exception, match="NULL version"):
        scd2_merge(scd_hist, nul, "k", "s", "ts").collect()
    with pytest.raises(ValueError):
        scd2_merge(scd_hist, nul, "k", "s", "missing")


def test_scd2_merge_single_key_shuffle(spark, scd_hist):
    ups = spark.createDataFrame([(2, "y", 30)],
                                "k long, s string, ts long")
    out = scd2_merge(scd_hist, ups, "k", "s", "ts")
    plan = out._jdf.queryExecution().executedPlan().toString()
    import re
    # the apply branch shuffles ONCE on the key; the closed branch has
    # no exchange at all
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1


# ---------------------------------- keep-best cluster representatives
from spark_df_profiling_spark.operators.dedup import (
    component_representatives, keep_best)


def test_component_representatives_max_score_min_id_ties(spark):
    m = spark.createDataFrame(
        [(1, 0, 5.0), (2, 0, 9.0), (3, 0, 9.0),
         (7, 7, None), (8, 7, None),       # all-NULL scores
         (4, 4, None), (5, 4, 2.0)],       # NULL loses to any score
        "id long, comp long, sc double")
    got = {r.component: (r.rep_id, r.rep_score, r.n_members)
           for r in component_representatives(
               m, "id", "comp", "sc").collect()}
    assert got[0] == (2, 9.0, 3)      # max score 9, tie -> min id
    assert got[7] == (7, None, 2)     # all NULL -> min id survives
    assert got[4] == (5, 2.0, 2)      # scored member beats NULL
    with pytest.raises(ValueError):
        component_representatives(m, "id", "comp", "nope")


def test_keep_best_transitive_and_singletons(spark):
    df = spark.createDataFrame(
        [(i, float(i % 4)) for i in range(10)], "id long, q double")
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (5, 6)], "id_a long, id_b long")
    out = sorted((r.id, r.dup_component)
                 for r in keep_best(df, pairs, "id", "q").collect())
    # {0,1,2}: q = 0/1/2 -> keep 2; {5,6}: q = 1/2 -> keep 6;
    # 3,4,7,8,9 are singletons (NULL component)
    assert out == [(2, 0), (3, None), (4, None), (6, 5),
                   (7, None), (8, None), (9, None)]
    assert set(keep_best(df, pairs, "id", "q").columns) == {
        "id", "q", "dup_component"}


# ----------------------------------------------------- percentile_rank
from spark_df_profiling_spark.operators.outliers import percentile_rank


@pytest.fixture(scope="module")
def prank_df(spark):
    rows = [(1, 10.0), (2, 10.0), (3, 20.0), (4, 30.0), (5, None)]
    return spark.createDataFrame(rows, "id long, x double")


def test_percentile_rank_exact_cume_dist(prank_df):
    got = {r.id: r.pct_rank
           for r in percentile_rank(prank_df, "x").collect()}
    # cume_dist: ties share the block's TOP rank; NULL ranks NULL
    assert got[1] == got[2] == pytest.approx(0.5)
    assert got[3] == pytest.approx(0.75)
    assert got[4] == pytest.approx(1.0)
    assert got[5] is None


def test_percentile_rank_matches_python_at_scale(spark):
    # 5k rows, heavy ties (97 distinct values over many partitions)
    n = 5000
    df = spark.range(n).select(
        F.col("id"), (F.col("id") % 97).cast("double").alias("x"))
    got = {r.id: r.pct_rank
           for r in percentile_rank(df, "x",
                                    num_buckets=16).collect()}
    import collections
    cnt = collections.Counter(i % 97 for i in range(n))
    cum, expect = 0, {}
    for v in sorted(cnt):
        cum += cnt[v]
        expect[v] = cum / n
    assert all(got[i] == pytest.approx(expect[i % 97])
               for i in range(n))


def test_percentile_rank_approx_mode(prank_df):
    got = {r.id: r.pct_rank
           for r in percentile_rank(prank_df, "x", exact=False,
                                    num_buckets=4).collect()}
    assert got[5] is None
    # resolution-1/4 step function, monotone in value
    assert got[1] <= got[3] <= got[4]
    for v in (got[1], got[3], got[4]):
        assert v in (0.25, 0.5, 0.75, 1.0)


def test_percentile_rank_validation(spark, prank_df):
    with pytest.raises(ValueError):
        percentile_rank(prank_df, "nope")
    allnull = spark.createDataFrame([(1, None)], "id long, x double")
    with pytest.raises(ValueError):
        percentile_rank(allnull, "x")
    with pytest.raises(ValueError):
        percentile_rank(allnull, "x", exact=False)


# ------------------------------------------------ missingness_patterns
from spark_df_profiling_spark.operators.frequency import (
    missingness_patterns)


def test_missingness_patterns_combinatorics(spark):
    df = spark.createDataFrame(
        [(1, "a", 1.0), (2, None, None), (3, None, None), (4, "b", None)],
        "id long, s string, x double")
    got = {r.pattern: (r.missing_cols, r.n_missing_cols, r.n_rows,
                       r.p_rows)
           for r in missingness_patterns(df, ["id", "s", "x"])
           .collect()}
    assert got["011"] == ("s,x", 2, 2, 0.5)
    assert got["000"] == ("", 0, 1, 0.25)
    assert got["001"] == ("x", 1, 1, 0.25)
    # ordered most-frequent-first, top_k honored
    top = missingness_patterns(df, ["id", "s", "x"], top_k=1).collect()
    assert len(top) == 1 and top[0].pattern == "011"


def test_missingness_patterns_validation(spark):
    df = spark.createDataFrame([(1,)], "id long")
    with pytest.raises(ValueError):
        missingness_patterns(df, [])
    with pytest.raises(ValueError):
        missingness_patterns(df, ["nope"])
    with pytest.raises(ValueError):
        missingness_patterns(df, ["id"], top_k=0)


# --------------------------------------- linkage EM (Fellegi-Sunter)
from spark_df_profiling_spark.operators.dedup import (
    agreement_pattern_counts, linkage_em)


def test_agreement_pattern_counts(fs_records, fs_pairs):
    got = {r.pattern: r.n_pairs
           for r in agreement_pattern_counts(
               fs_records, fs_pairs, "id", ["lang", "city"]).collect()}
    # (1,2): lang=a=a, city=x=x -> '11'; (1,4): a/b, x/y -> '00'
    # (2,6): lang NULL side -> '?', city x/z -> '?0'
    # (3,4): a/b, y=y -> '01'
    assert got == {"11": 1, "00": 1, "?0": 1, "01": 1}
    with pytest.raises(ValueError):
        agreement_pattern_counts(fs_records, fs_pairs, "id", [])


def _em_python(pats, flds, lam, m, u, n_iter):
    """Reference EM replay (same clamps as the operator)."""
    eps = 1e-9
    cl = lambda x: min(1.0 - eps, max(eps, x))
    n = sum(pats.values())
    for _ in range(n_iter):
        w = {}
        for pat in pats:
            pm, pu = lam, 1.0 - lam
            for f, g in zip(flds, pat):
                if g == "1":
                    pm *= m[f]; pu *= u[f]
                elif g == "0":
                    pm *= 1.0 - m[f]; pu *= 1.0 - u[f]
            w[pat] = pm / (pm + pu) if (pm + pu) > 0 else 0.0
        lam = cl(sum(pats[p] * w[p] for p in pats) / n)
        for i, f in enumerate(flds):
            nm = dm = nu = du = 0.0
            for pat, c in pats.items():
                if pat[i] == "?":
                    continue
                cw = c * w[pat]
                dm += cw; du += c - cw
                if pat[i] == "1":
                    nm += cw; nu += c - cw
            if dm > 0: m[f] = cl(nm / dm)
            if du > 0: u[f] = cl(nu / du)
    return lam, m, u


def test_linkage_em_matches_python_replay(fs_records, fs_pairs):
    est = linkage_em(fs_records, fs_pairs, "id", ["lang", "city"],
                     n_iter=7, init_u={"lang": 0.3, "city": 0.2})
    pats = {"11": 1, "00": 1, "?0": 1, "01": 1}
    lam, m, u = _em_python(pats, ["lang", "city"], 0.1,
                           {"lang": 0.9, "city": 0.9},
                           {"lang": 0.3, "city": 0.2}, 7)
    assert est["lambda"] == pytest.approx(lam)
    assert est["m"]["lang"] == pytest.approx(m["lang"])
    assert est["u"]["city"] == pytest.approx(u["city"])
    assert est["n_pairs"] == 4


def test_linkage_em_recovers_planted_mixture(spark):
    # 200 true-dup pairs (95% field agreement) + 800 random pairs over
    # 5/40-value fields: EM must land near lambda=0.2, m~0.95,
    # u_lang~1/5, u_src~1/40
    import random
    rng = random.Random(3)
    recs, prs, rid = [], [], 0
    for i in range(200):
        a, b = rid, rid + 1; rid += 2
        la, sa = f"L{i % 5}", f"S{i % 40}"
        recs += [(a, la, sa),
                 (b, la if rng.random() < .95 else "LX",
                  sa if rng.random() < .95 else "SX")]
        prs.append((a, b))
    for _ in range(800):
        a, b = rid, rid + 1; rid += 2
        recs += [(a, f"L{rng.randrange(5)}", f"S{rng.randrange(40)}"),
                 (b, f"L{rng.randrange(5)}", f"S{rng.randrange(40)}")]
        prs.append((a, b))
    r = spark.createDataFrame(recs, "id long, lang string, src string")
    p = spark.createDataFrame(prs, "id_a long, id_b long")
    est = linkage_em(r, p, "id", ["lang", "src"], n_iter=30)
    assert 0.15 < est["lambda"] < 0.25
    assert est["m"]["lang"] > 0.9 and est["m"]["src"] > 0.9
    assert 0.1 < est["u"]["lang"] < 0.3
    assert est["u"]["src"] < 0.05


def test_linkage_em_validation(fs_records, fs_pairs, spark):
    with pytest.raises(ValueError):
        linkage_em(fs_records, fs_pairs, "id", ["lang"], n_iter=0)
    with pytest.raises(ValueError):
        linkage_em(fs_records, fs_pairs, "id", ["lang"],
                   init_lambda=1.0)
    empty = spark.createDataFrame([], "id_a long, id_b long")
    with pytest.raises(ValueError, match="no candidate pairs"):
        linkage_em(fs_records, empty, "id", ["lang"])

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


# ---------------------------------------------------------------------------
# pagerank
# ---------------------------------------------------------------------------
def _pagerank_py(edges, d=0.85, n_iter=10):
    """Reference PageRank: dict-based, dangling mass redistributed."""
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    n = len(nodes)
    out = {}
    for u, v in set(edges):
        out.setdefault(u, set()).add(v)
    r = {x: 1.0 / n for x in nodes}
    for _ in range(n_iter):
        dm = sum(r[x] for x in nodes if x not in out)
        nxt = {}
        for x in nodes:
            nxt[x] = (1 - d) / n + d * dm / n
        for u, vs in out.items():
            w = r[u] / len(vs)
            for v in vs:
                nxt[v] += d * w
        r = nxt
    return r


def test_pagerank_matches_python_reference(spark):
    from spark_df_profiling_spark.operators.graph import pagerank
    # mixed graph: a hub, a chain, a dangling sink, a 2-cycle
    edges = [("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"),
             ("c", "d"), ("d", "e"),  # e dangling
             ("f", "g"), ("g", "f")]
    want = _pagerank_py(edges, n_iter=7)
    e = spark.createDataFrame(edges, "src string, dst string")
    got = {r["node"]: r["rank"]
           for r in pagerank(e, n_iter=7).collect()}
    assert set(got) == set(want)
    for k in want:
        assert abs(got[k] - want[k]) < 1e-9, (k, got[k], want[k])
    assert abs(sum(got.values()) - 1.0) < 1e-9


def test_pagerank_cycle_is_uniform(spark):
    from spark_df_profiling_spark.operators.graph import pagerank
    e = spark.createDataFrame(
        [(i, (i + 1) % 5) for i in range(5)], "src int, dst int")
    got = [r["rank"] for r in pagerank(e, n_iter=12).collect()]
    assert len(got) == 5
    for v in got:
        assert abs(v - 0.2) < 1e-12


def test_pagerank_multi_edges_and_nulls(spark):
    from spark_df_profiling_spark.operators.graph import pagerank
    # duplicate a->b edges collapse under dedup_edges; NULLs dropped
    rows = [("a", "b"), ("a", "b"), ("a", "c"),
            (None, "b"), ("c", None)]
    e = spark.createDataFrame(rows, "src string, dst string")
    want = _pagerank_py([("a", "b"), ("a", "c")], n_iter=5)
    got = {r["node"]: r["rank"]
           for r in pagerank(e, n_iter=5).collect()}
    assert set(got) == set(want)
    for k in want:
        assert abs(got[k] - want[k]) < 1e-9
    # multiplicity mode: a->b twice means b gets 2/3 of a's mass
    got2 = {r["node"]: r["rank"]
            for r in pagerank(e, n_iter=1,
                              dedup_edges=False).collect()}
    n = 3
    dm = 2.0 / n  # b and c have no out-edges
    assert abs(got2["b"] - ((1 - .85) / n + .85 * (dm / n
               + (1 / n) * (2 / 3)))) < 1e-12


def test_pagerank_validation(spark):
    from spark_df_profiling_spark.operators.graph import pagerank
    e = spark.createDataFrame([("a", "b")], "src string, dst string")
    with pytest.raises(ValueError, match="damping"):
        pagerank(e, damping=1.0)
    with pytest.raises(ValueError, match="n_iter"):
        pagerank(e, n_iter=0)
    with pytest.raises(ValueError, match="missing column"):
        pagerank(e, src_col="nope")
    empty = spark.createDataFrame([(None, "b")],
                                  "src string, dst string")
    with pytest.raises(ValueError, match="empty"):
        pagerank(empty.where(F.col("src").isNotNull()))


# ---------------------------------------------------------------------------
# seasonal_stats / seasonal_anomaly
# ---------------------------------------------------------------------------
def _seasonal_py(rows, period, spp, n_cycles, stat="sum"):
    """Reference: rows = (key, ts, value) -> {(k, b): (slot, cycle,
    value, base_n, base_mean, base_std)}."""
    import math as _m
    gran = period / spp
    buckets = {}
    for k, ts, v in rows:
        if k is None or ts is None:
            continue
        b = _m.floor(ts / gran)
        buckets.setdefault((k, b), []).append(float(v))
    vals = {}
    for (k, b), vs in buckets.items():
        vals[(k, b)] = {"sum": sum(vs),
                        "mean": sum(vs) / len(vs),
                        "count": float(len(vs))}[stat]
    out = {}
    for (k, b), x in vals.items():
        slot, cycle = b % spp, (b - b % spp) // spp
        hist = [vals[(k, (c * spp) + slot)]
                for c in range(cycle - n_cycles, cycle)
                if (k, (c * spp) + slot) in vals]
        n = len(hist)
        mean = sum(hist) / n if n else None
        std = None
        if n > 1:
            var = sum((h - mean) ** 2 for h in hist) / (n - 1)
            std = _m.sqrt(max(var, 0.0))
        out[(k, b)] = (slot, cycle, x, n, mean, std)
    return out


def test_seasonal_stats_matches_python(spark):
    from spark_df_profiling_spark.operators.groupby import (
        seasonal_stats)
    import random
    rng = random.Random(7)
    rows = []
    # 6 daily cycles of 4 slots, 2 keys, some buckets empty, plus a
    # pre-epoch (negative ts) bucket to pin pmod/div sign handling
    for day in range(6):
        for slot in range(4):
            for k in ("a", "b"):
                if rng.random() < 0.15:
                    continue  # gap cycle for this slot
                for _ in range(rng.randrange(1, 4)):
                    rows.append((k, day * 100.0 + slot * 25.0
                                 + rng.random() * 20.0,
                                 rng.uniform(1, 9)))
    rows.append(("a", -30.0, 5.0))
    rows.append(("a", None, 1.0))
    rows.append((None, 10.0, 1.0))
    want = _seasonal_py(rows, period=100.0, spp=4, n_cycles=3)
    df = spark.createDataFrame(rows, "k string, ts double, v double")
    got = seasonal_stats(df, "ts", "k", "v", period=100.0,
                         slots_per_period=4, n_cycles=3)
    gm = {(r["k"], round(r["bucket_start"] / 25.0)):
          (r["slot"], r["cycle"], r["value"], r["base_n"],
           r["base_mean"], r["base_std"])
          for r in got.collect()}
    assert set(gm) == set(want)
    for key in want:
        ws, wc, wv, wn, wm, wsd = want[key]
        gs, gc, gv, gn, gmn, gsd = gm[key]
        assert (gs, gc, gn) == (ws, wc, wn), key
        assert abs(gv - wv) < 1e-9
        assert (gmn is None) == (wm is None)
        if wm is not None:
            assert abs(gmn - wm) < 1e-9
        assert (gsd is None) == (wsd is None)
        if wsd is not None:
            assert abs(gsd - wsd) < 1e-9


def test_seasonal_anomaly_flags_planted_spike(spark):
    from spark_df_profiling_spark.operators.groupby import (
        seasonal_anomaly)
    rows = []
    # slot 1 of each 10-unit day carries ~10 every day... except day 5
    for day in range(6):
        v = 200.0 if day == 5 else 10.0 + day * 0.1
        rows.append(("u", day * 10.0 + 1.5, v))
        rows.append(("u", day * 10.0 + 7.5, 3.0))  # slot 3: flat-ish
    df = spark.createDataFrame(rows, "k string, ts double, v double")
    out = seasonal_anomaly(df, "ts", "k", "v", period=10.0,
                           slots_per_period=5, n_cycles=4,
                           min_cycles=2).collect()
    spike = [r for r in out if r["cycle"] == 5 and r["slot"] == 0]
    # ts = day*10 + 1.5 -> slot floor(1.5/2)=0
    assert len(spike) == 1 and spike[0]["is_anomaly"] is True
    # warm-up rows (cycle 0 everywhere, cycle 1 w/ min_cycles=2): NULL z
    warm = [r for r in out if r["cycle"] == 0]
    assert warm and all(r["z"] is None for r in warm)
    # ordinary days are not flagged
    normal = [r for r in out if r["slot"] == 0 and 2 <= r["cycle"] <= 4]
    assert normal and all(r["is_anomaly"] is False for r in normal)


def test_seasonal_anomaly_flat_baseline_guard(spark):
    from spark_df_profiling_spark.operators.groupby import (
        seasonal_anomaly)
    rows = [("u", day * 10.0 + 1.0, 5.0) for day in range(5)]
    df = spark.createDataFrame(rows, "k string, ts double, v double")
    out = seasonal_anomaly(df, "ts", "k", "v", period=10.0,
                           slots_per_period=2, n_cycles=3)
    # constant history -> std 0 <= floor -> z NULL, never a div-by-~0
    assert all(r["z"] is None for r in out.collect())


def test_seasonal_validation(spark):
    from spark_df_profiling_spark.operators.groupby import (
        seasonal_anomaly, seasonal_stats)
    df = spark.createDataFrame([("u", 1.0, 1.0)],
                               "k string, ts double, v double")
    with pytest.raises(ValueError, match="period"):
        seasonal_stats(df, "ts", "k", "v", period=0.0)
    with pytest.raises(ValueError, match="n_cycles"):
        seasonal_stats(df, "ts", "k", "v", period=1.0, n_cycles=0)
    with pytest.raises(ValueError, match="sum/mean/count"):
        seasonal_stats(df, "ts", "k", "v", period=1.0, stat="p99")
    with pytest.raises(ValueError, match="z_threshold"):
        seasonal_anomaly(df, "ts", "k", "v", period=1.0,
                         z_threshold=0.0)


# ---------------------------------------------------------------------------
# correlation_ratio / theil_u
# ---------------------------------------------------------------------------
def test_correlation_ratio_matches_python(spark):
    from spark_df_profiling_spark.operators.correlation import (
        correlation_ratio)
    import math, random
    rng = random.Random(11)
    rows = [(g, rng.gauss({"a": 0.0, "b": 5.0, "c": -2.0}[g], 1.5))
            for g in ("a", "b", "c") for _ in range(60)]
    rows += [("a", None), (None, 3.0), ("b", float("nan"))]
    data = [(g, v) for g, v in rows
            if g is not None and v is not None
            and not (isinstance(v, float) and math.isnan(v))]
    grand = sum(v for _, v in data) / len(data)
    groups = {}
    for g, v in data:
        groups.setdefault(g, []).append(v)
    ssb = sum(len(vs) * (sum(vs) / len(vs) - grand) ** 2
              for vs in groups.values())
    sst = sum((v - grand) ** 2 for _, v in data)
    want = ssb / sst
    df = spark.createDataFrame(rows, "g string, v double")
    r = correlation_ratio(df, "g", "v").first()
    assert r["n"] == len(data) and r["n_groups"] == 3
    assert abs(r["eta2"] - want) < 1e-9
    assert abs(r["eta"] - math.sqrt(want)) < 1e-9


def test_correlation_ratio_degenerate(spark):
    from spark_df_profiling_spark.operators.correlation import (
        correlation_ratio)
    const = spark.createDataFrame([("a", 2.0), ("b", 2.0), ("a", 2.0)],
                                  "g string, v double")
    r = correlation_ratio(const, "g", "v").first()
    assert r["eta2"] is None and r["eta"] is None
    # perfectly separated groups -> eta2 == 1
    sep = spark.createDataFrame(
        [("a", 1.0), ("a", 1.0), ("b", 9.0), ("b", 9.0)],
        "g string, v double")
    assert abs(correlation_ratio(sep, "g", "v").first()["eta2"]
               - 1.0) < 1e-12


def _theil_py(pairs):
    import math
    from collections import Counter
    n = len(pairs)
    cy = Counter(y for _, y in pairs)
    cx = Counter(x for x, _ in pairs)
    cxy = Counter(pairs)
    hy = -sum(c / n * math.log(c / n) for c in cy.values())
    hyx = -sum(c / n * math.log(c / cx[x])
               for (x, _), c in cxy.items())
    return hy, hyx, (hy - hyx) / hy if hy > 0 else None


def test_theil_u_matches_python_and_is_asymmetric(spark):
    from spark_df_profiling_spark.operators.correlation import theil_u
    # x determines y (two x per y) but y does NOT determine x
    pairs = [(f"x{i}", f"y{i // 2}", ) for i in range(8)
             for _ in range(i + 1)]
    df = spark.createDataFrame(pairs, "x string, y string")
    hy, hyx, want = _theil_py(pairs)
    r = theil_u(df, "x", "y").first()
    assert r["n"] == len(pairs)
    assert (r["x_levels"], r["y_levels"]) == (8, 4)
    assert abs(r["h_y"] - hy) < 1e-9
    assert abs(r["h_y_given_x"] - hyx) < 1e-9
    assert abs(r["u"] - 1.0) < 1e-12  # x determines y exactly
    # reverse direction is strictly weaker
    hy2, hyx2, want2 = _theil_py([(y, x) for x, y in pairs])
    r2 = theil_u(df, "y", "x").first()
    assert abs(r2["u"] - want2) < 1e-9
    assert r2["u"] < 0.999


def test_theil_u_constant_y_is_null(spark):
    from spark_df_profiling_spark.operators.correlation import theil_u
    df = spark.createDataFrame([("a", "k"), ("b", "k"), (None, "k")],
                               "x string, y string")
    r = theil_u(df, "x", "y").first()
    assert r["u"] is None and r["n"] == 2


# ---------------------------------------------------------------------------
# grouped_linregress
# ---------------------------------------------------------------------------
def test_grouped_linregress_matches_python(spark):
    from spark_df_profiling_spark.operators.groupby import (
        grouped_linregress)
    import random
    rng = random.Random(5)
    rows = []
    for g, (a, b) in {"g1": (2.0, 0.5), "g2": (-1.0, -3.0)}.items():
        for _ in range(50):
            x = rng.uniform(0, 100)
            rows.append((g, x, a + b * x + rng.gauss(0, 2.0)))
    rows += [("g1", None, 1.0), ("g2", 5.0, None), (None, 1.0, 1.0)]
    df = spark.createDataFrame(rows, "g string, x double, y double")
    got = {r["g"]: r for r in
           grouped_linregress(df, "g", "x", "y").collect()
           if r["g"] is not None}

    def ref(pts):
        n = len(pts)
        mx = sum(p[0] for p in pts) / n
        my = sum(p[1] for p in pts) / n
        cov = sum((p[0] - mx) * (p[1] - my) for p in pts) / (n - 1)
        vx = sum((p[0] - mx) ** 2 for p in pts) / (n - 1)
        vy = sum((p[1] - my) ** 2 for p in pts) / (n - 1)
        sl = cov / vx
        return n, sl, my - sl * mx, cov * cov / (vx * vy)

    for g in ("g1", "g2"):
        pts = [(x, y) for gg, x, y in rows
               if gg == g and x is not None and y is not None]
        n, sl, ic, r2 = ref(pts)
        r = got[g]
        assert r["n"] == n
        assert abs(r["slope"] - sl) < 1e-9
        assert abs(r["intercept"] - ic) < 1e-9
        assert abs(r["r2"] - r2) < 1e-9
    # recovered coefficients near the planted ones
    assert abs(got["g1"]["slope"] - 0.5) < 0.15
    assert abs(got["g2"]["slope"] + 3.0) < 0.15


def test_grouped_linregress_epoch_scale_stability(spark):
    from spark_df_profiling_spark.operators.groupby import (
        grouped_linregress)
    # x at epoch-micros magnitude (1.7e15): raw-moment formulas lose
    # all significance here; the co-moment path must stay exact
    base = 1_700_000_000_000_000
    rows = [("k", float(base + i * 1_000_000), 10.0 + 0.25 * i)
            for i in range(100)]
    df = spark.createDataFrame(rows, "g string, x double, y double")
    r = grouped_linregress(df, "g", "x", "y").first()
    assert abs(r["slope"] - 0.25e-6) < 1e-15
    assert abs(r["r2"] - 1.0) < 1e-9


def test_grouped_linregress_guards(spark):
    from spark_df_profiling_spark.operators.groupby import (
        grouped_linregress)
    rows = [("one", 1.0, 5.0),              # n=1
            ("cx", 2.0, 1.0), ("cx", 2.0, 9.0),   # constant x
            ("cy", 1.0, 4.0), ("cy", 3.0, 4.0)]   # constant y
    df = spark.createDataFrame(rows, "g string, x double, y double")
    got = {r["g"]: r for r in
           grouped_linregress(df, "g", "x", "y").collect()}
    assert got["one"]["slope"] is None
    assert got["cx"]["slope"] is None and got["cx"]["r2"] is None
    # constant y: slope is a perfectly fine 0, but r2 is 0/0 -> NULL
    assert abs(got["cy"]["slope"]) < 1e-12
    assert got["cy"]["r2"] is None
    with pytest.raises(ValueError, match="missing column"):
        grouped_linregress(df, "g", "nope", "y")
    with pytest.raises(ValueError, match=">= 1 key"):
        grouped_linregress(df, [], "x", "y")


# ---------------------------------------------------------------------------
# deterministic_shuffle / split_leakage_audit
# ---------------------------------------------------------------------------
def test_deterministic_shuffle_matches_python(spark):
    from spark_df_profiling_spark.operators.sampling import (
        BUCKETS, deterministic_shuffle)
    import hashlib
    ids = list(range(200))
    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    got = {r["doc_id"]: (r["shard"], r["pos"]) for r in
           deterministic_shuffle(df, "doc_id", n_shards=4,
                                 seed=9).collect()}

    def bkt(i):
        h = hashlib.md5(f"{i}:9".encode()).hexdigest()[:15]
        return int(h, 16) % BUCKETS

    order = sorted(ids, key=lambda i: (bkt(i), i))
    want = {}
    per_shard = {}
    for i in order:
        s = bkt(i) * 4 // BUCKETS
        want[i] = (s, per_shard.get(s, 0))
        per_shard[s] = per_shard.get(s, 0) + 1
    assert got == want
    # all 4 shards used, same permutation on a second run
    assert set(s for s, _ in got.values()) == {0, 1, 2, 3}
    again = {r["doc_id"]: (r["shard"], r["pos"]) for r in
             deterministic_shuffle(df, "doc_id", n_shards=4,
                                   seed=9).collect()}
    assert again == got
    # a different seed is a different permutation
    other = {r["doc_id"]: (r["shard"], r["pos"]) for r in
             deterministic_shuffle(df, "doc_id", n_shards=4,
                                   seed=10).collect()}
    assert other != got


def test_deterministic_shuffle_null_keys_and_validation(spark):
    from spark_df_profiling_spark.operators.sampling import (
        deterministic_shuffle)
    df = spark.createDataFrame([(1,), (None,), (2,)], "k long")
    out = deterministic_shuffle(df, "k", n_shards=2)
    assert sorted(r["k"] for r in out.collect()) == [1, 2]
    with pytest.raises(ValueError, match="n_shards"):
        deterministic_shuffle(df, "k", n_shards=0)


def test_split_leakage_audit_counts(spark):
    from spark_df_profiling_spark.operators.sampling import (
        split_leakage_audit)
    assigned = spark.createDataFrame(
        [(1, "train"), (2, "train"), (3, "val"), (4, "test")],
        "doc_id long, split string")
    pairs = spark.createDataFrame(
        [(1, 2),          # within train
         (1, 3), (2, 3),  # train<->val leaks
         (3, 4),          # val<->test leak
         (1, 99)],        # endpoint missing from the assignment
        "id_a long, id_b long")
    got = {(r["split_a"], r["split_b"]): r["n_pairs"]
           for r in split_leakage_audit(assigned, pairs,
                                        "doc_id").collect()}
    assert got == {("train", "train"): 1,
                   ("train", "val"): 2,
                   ("test", "val"): 1,
                   ("<unassigned>", "train"): 1}
    with pytest.raises(ValueError, match="pairs missing"):
        split_leakage_audit(assigned, assigned, "doc_id")


def test_split_leakage_audit_clean_on_safe_split(spark):
    from spark_df_profiling_spark.operators.sampling import (
        leakage_safe_split, split_leakage_audit)
    ids = spark.range(100).select(F.col("id").alias("doc_id"))
    pairs = (ids.where(F.col("doc_id") % 10 != 9)
             .select(F.col("doc_id").alias("id_a"),
                     (F.col("doc_id") + 1).alias("id_b")))
    ls = leakage_safe_split(ids, pairs, "doc_id",
                            {"train": 0.8, "val": 0.2}, seed=3)
    audit = split_leakage_audit(ls, pairs, "doc_id")
    off = audit.where(F.col("split_a") != F.col("split_b"))
    assert off.count() == 0  # the leakage-safe contract, re-measured


# ---------------------------------------------------------------------------
# violation_examples
# ---------------------------------------------------------------------------
def test_violation_examples_deterministic_and_complete(spark):
    from spark_df_profiling_spark.operators.constraints import (
        accepted_values_rows, in_range_rows, not_null_rows,
        violation_examples)
    from spark_df_profiling_spark.operators.sampling import BUCKETS
    import hashlib
    rows = [(i,
             None if i % 7 == 0 else f"v{i}",
             100.0 if i % 5 == 0 else 10.0,
             "X" if i % 11 == 0 else "A")
            for i in range(100)]
    df = spark.createDataFrame(rows, "id long, s string, x double, "
                                     "f string")
    checks = [not_null_rows("s"),
              in_range_rows("x", 0.0, 50.0),
              accepted_values_rows("f", ["A", "B"]),
              in_range_rows("id", 0, 1000)]  # never fails
    out = violation_examples(df, checks, "id", k=4, seed=2)
    got = {}
    for r in out.collect():
        got.setdefault(r["check"], []).append(r["id"])

    def bkt(i):
        h = hashlib.md5(f"{i}:2".encode()).hexdigest()[:15]
        return int(h, 16) % BUCKETS

    def want(ids):
        return sorted(ids, key=lambda i: (bkt(i), i))[:4]

    assert sorted(got["not_null:s"]) == sorted(
        want([i for i in range(100) if i % 7 == 0]))
    assert sorted(got["in_range:x"]) == sorted(
        want([i for i in range(100) if i % 5 == 0]))
    assert sorted(got["accepted_values:f"]) == sorted(
        want([i for i in range(100) if i % 11 == 0]))
    assert "in_range:id" not in got  # clean check -> zero rows
    # deterministic on rerun
    again = sorted(tuple(r) for r in
                   violation_examples(df, checks, "id", k=4,
                                      seed=2).collect())
    assert again == sorted(tuple(r) for r in out.collect())


def test_violation_examples_validation(spark):
    from spark_df_profiling_spark.operators.constraints import (
        not_null_rows, violation_examples)
    df = spark.createDataFrame([(1, "a")], "id long, s string")
    with pytest.raises(ValueError, match=">= 1 check"):
        violation_examples(df, [], "id")
    with pytest.raises(ValueError, match="missing column"):
        violation_examples(df, [not_null_rows("s")], "nope")


# ---------------------------------------------------------------------------
# retention_cohorts / cooccurrence_pairs
# ---------------------------------------------------------------------------
def test_retention_cohorts_matches_python(spark):
    from spark_df_profiling_spark.operators.groupby import (
        retention_cohorts)
    import math
    # users: u0-u4 start bucket 0; u5-u7 start bucket 1; churn pattern
    rows = []
    for u in range(5):
        rows.append((f"u{u}", 5.0))               # bucket 0
        if u < 3:
            rows.append((f"u{u}", 15.0))          # bucket 1
        if u < 1:
            rows.append((f"u{u}", 25.0))          # bucket 2
            rows.append((f"u{u}", 27.0))          # same bucket, dup
    for u in range(5, 8):
        rows.append((f"u{u}", 12.0))
        if u < 7:
            rows.append((f"u{u}", 29.0))          # bucket 2 = offset 1
    rows += [("u0", None), (None, 5.0)]
    df = spark.createDataFrame(rows, "k string, ts double")
    got = {(r["cohort"], r["offset"]):
           (r["n_active"], r["n_cohort"], r["retention"])
           for r in retention_cohorts(df, "ts", "k",
                                      gran=10.0).collect()}
    want = {(0, 0): (5, 5, 1.0), (0, 1): (3, 5, 0.6),
            (0, 2): (1, 5, 0.2),
            (1, 0): (3, 3, 1.0), (1, 1): (2, 3, 2 / 3)}
    assert set(got) == set(want)
    for key in want:
        assert got[key][:2] == want[key][:2]
        assert math.isclose(got[key][2], want[key][2])
    # max_offset trims
    trimmed = retention_cohorts(df, "ts", "k", gran=10.0,
                                max_offset=1)
    assert {(r["cohort"], r["offset"]) for r in trimmed.collect()} \
        == {(0, 0), (0, 1), (1, 0), (1, 1)}
    with pytest.raises(ValueError, match="gran"):
        retention_cohorts(df, "ts", "k", gran=0.0)


def test_cooccurrence_pairs_matches_python(spark):
    from spark_df_profiling_spark.operators.groupby import (
        cooccurrence_pairs)
    import math
    baskets = {1: ["milk", "bread", "eggs"],
               2: ["milk", "bread"],
               3: ["milk", "eggs"],
               4: ["bread"],
               5: ["milk", "bread", "beer"],
               6: ["beer"]}
    rows = [(g, i) for g, items in baskets.items() for i in items]
    rows += [(1, "milk"), (None, "milk"), (1, None)]  # dup + NULLs
    df = spark.createDataFrame(rows, "basket int, item string")
    out = cooccurrence_pairs(df, "basket", "item", min_pair_count=2)
    got = {(r["item_a"], r["item_b"]): r for r in out.collect()}
    # bread+milk in baskets 1,2,5; eggs+milk in 1,3
    assert set(got) == {("bread", "milk"), ("eggs", "milk")}
    bm = got[("bread", "milk")]
    assert (bm["n_ab"], bm["n_a"], bm["n_b"]) == (3, 4, 4)
    n_groups = 6
    assert math.isclose(bm["lift"], 3 * n_groups / (4 * 4))
    assert math.isclose(bm["jaccard"], 3 / (4 + 4 - 3))
    em = got[("eggs", "milk")]
    assert (em["n_ab"], em["n_a"], em["n_b"]) == (2, 2, 4)
    # min_pair_count=1 surfaces the singletons too: bread~eggs
    # (basket 1) and beer~bread, beer~milk (basket 5)
    all_pairs = cooccurrence_pairs(df, "basket", "item",
                                   min_pair_count=1)
    assert all_pairs.count() == 5


def test_cooccurrence_pairs_group_cap(spark):
    from spark_df_profiling_spark.operators.groupby import (
        cooccurrence_pairs)
    # one giant basket: cap keeps |items| at 10 -> C(10,2) pairs
    rows = [(1, f"i{j:03d}") for j in range(100)]
    df = spark.createDataFrame(rows, "basket int, item string")
    out = cooccurrence_pairs(df, "basket", "item", min_pair_count=1,
                             max_items_per_group=10)
    assert out.count() == 45
    with pytest.raises(ValueError, match="max_items_per_group"):
        cooccurrence_pairs(df, "basket", "item",
                           max_items_per_group=1)


# ---------------------------------------------------------------------------
# resample_fill linear interpolation
# ---------------------------------------------------------------------------
def test_resample_fill_linear_interpolates(spark):
    from spark_df_profiling_spark.operators.groupby import (
        resample_fill)
    # key 'a': observations at buckets 0 (v=10), 4 (v=2), 5 (v=7);
    # buckets 1-3 interpolate the 10->2 line; nothing beyond 5
    rows = [("a", 0.5, 10.0), ("a", 4.2, 2.0), ("a", 5.9, 7.0),
            ("b", 10.1, 3.0)]
    df = spark.createDataFrame(rows, "k string, ts double, v double")
    out = {(r["k"], r["bucket"]): (r["v"], r["filled"], r["n_obs"])
           for r in resample_fill(df, "ts", "k", "v", gran=1.0,
                                  agg="sum",
                                  fill="linear").collect()}
    assert out[("a", 0)] == (10.0, False, 1)
    assert out[("a", 1)] == (8.0, True, 0)
    assert out[("a", 2)] == (6.0, True, 0)
    assert out[("a", 3)] == (4.0, True, 0)
    assert out[("a", 4)] == (2.0, False, 1)
    assert out[("a", 5)] == (7.0, False, 1)
    assert out[("b", 10)] == (3.0, False, 1)
    assert len(out) == 7


def test_resample_fill_linear_edges_are_null(spark):
    from spark_df_profiling_spark.operators.groupby import (
        resample_fill)
    # an all-NULL-values bucket at the START of the span: no left
    # neighbour -> NULL (never extrapolated); interior all-NULL
    # bucket interpolates
    rows = [("k", 0.5, None), ("k", 2.5, 4.0), ("k", 4.5, None),
            ("k", 6.5, 10.0)]
    df = spark.createDataFrame(rows, "k string, ts double, v double")
    out = {r["bucket"]: (r["v"], r["filled"])
           for r in resample_fill(df, "ts", "k", "v", gran=2.0,
                                  fill="linear").collect()}
    # buckets: 0 (null obs), 1 (4.0), 2 (null obs), 3 (10.0)
    assert out[0] == (None, True)
    assert out[1] == (4.0, False)
    assert out[2] == (7.0, True)
    assert out[3] == (10.0, False)


def test_resample_fill_linear_plan_has_no_shrinking_frame(spark):
    # first()/last() over (currentRow, unboundedFollowing) makes Spark
    # recompute the aggregate per row — O(rows^2) per key (measured:
    # hang at ~11k buckets/key).  The linear fill must express "next
    # observation" as an EXPANDING frame over a descending sort.
    from spark_df_profiling_spark.operators.groupby import (
        resample_fill)
    df = spark.createDataFrame([("k", 1.0, 1.0), ("k", 9.0, 5.0)],
                               "k string, ts double, v double")
    rl = resample_fill(df, "ts", "k", "v", gran=1.0, fill="linear")
    plan = rl._jdf.queryExecution().optimizedPlan().toString()
    assert "unboundedfollowing" not in plan.lower().replace(" ", "")


# ---------------------------------------------------------------------------
# temporal_join
# ---------------------------------------------------------------------------
@pytest.fixture(scope="module")
def scd2_dim(spark):
    # customer 1: two closed versions + one open; customer 2: one open
    # opening at t=50 (facts before it match nothing)
    rows = [(1, "addr_a", 0.0, 10.0),
            (1, "addr_b", 10.0, 20.0),
            (1, "addr_c", 20.0, None),
            (2, "addr_x", 50.0, None)]
    return spark.createDataFrame(
        rows, "cust long, addr string, valid_from double, "
              "valid_to double").persist()


def test_temporal_join_picks_the_valid_version(spark, scd2_dim):
    from spark_df_profiling_spark.operators.joins import temporal_join
    facts = spark.createDataFrame(
        [(100, 1, 5.0), (101, 1, 10.0), (102, 1, 19.9),
         (103, 1, 500.0), (104, 2, 49.9), (105, 2, 50.0),
         (106, 3, 5.0)],
        "oid long, cust long, ts double")
    out = {r["oid"]: r["addr"]
           for r in temporal_join(facts, scd2_dim, "cust",
                                  "ts").collect()}
    assert out == {100: "addr_a",
                   101: "addr_b",   # valid_from inclusive
                   102: "addr_b",   # valid_to exclusive
                   103: "addr_c",   # open version
                   104: None,       # before the key's first version
                   105: "addr_x",
                   106: None}       # unknown key, left join
    inner = temporal_join(facts, scd2_dim, "cust", "ts", how="inner")
    assert inner.count() == 5
    # fact key column survives once, no dup
    assert temporal_join(facts, scd2_dim, "cust",
                         "ts").columns.count("cust") == 1


def test_temporal_join_validation(spark, scd2_dim):
    from spark_df_profiling_spark.operators.joins import temporal_join
    facts = spark.createDataFrame([(1, 1, 1.0)],
                                  "oid long, cust long, ts double")
    with pytest.raises(ValueError, match="left/inner"):
        temporal_join(facts, scd2_dim, "cust", "ts", how="full")
    with pytest.raises(ValueError, match="fact missing"):
        temporal_join(facts, scd2_dim, "nope", "ts")
    with pytest.raises(ValueError, match="dim missing"):
        temporal_join(facts, scd2_dim, "cust", "ts",
                      valid_from="nope")
    clash = facts.withColumn("addr", F.lit("boom"))
    with pytest.raises(ValueError, match="overlapping"):
        temporal_join(clash, scd2_dim, "cust", "ts")


def test_temporal_join_composes_with_scd2_merge(spark):
    # end-to-end: build history with cdc.scd2_merge, then look up
    from spark_df_profiling_spark.operators.cdc import scd2_merge
    from spark_df_profiling_spark.operators.joins import temporal_join
    hist = spark.createDataFrame([], "k long, attr string, "
                                     "valid_from double, "
                                     "valid_to double")
    batch = spark.createDataFrame(
        [(7, "v1", 100.0), (7, "v2", 200.0), (7, "v2", 300.0),
         (7, "v3", 400.0)],
        "k long, attr string, ts double")
    h = scd2_merge(hist, batch, key_cols=["k"], ts_col="ts",
                   attr_cols=["attr"])
    facts = spark.createDataFrame(
        [(1, 7, 150.0), (2, 7, 250.0), (3, 7, 350.0), (4, 7, 450.0),
         (5, 7, 50.0)],
        "fid long, k long, ts double")
    got = {r["fid"]: r["attr"]
           for r in temporal_join(facts, h, "k", "ts").collect()}
    assert got == {1: "v1", 2: "v2", 3: "v2", 4: "v3", 5: None}


# ---------------------------------------------------------------------------
# trustrank
# ---------------------------------------------------------------------------
def _trustrank_py(edges, seeds, d=0.85, n_iter=10):
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    n = len(nodes)
    ss = [s for s in seeds if s in set(nodes)]
    t = {x: (1.0 / len(ss) if x in ss else 0.0) for x in nodes}
    out = {}
    for u, v in set(edges):
        out.setdefault(u, set()).add(v)
    r = dict(t)
    for _ in range(n_iter):
        dm = sum(r[x] for x in nodes if x not in out)
        nxt = {x: (1 - d) * t[x] + d * dm * t[x] for x in nodes}
        for u, vs in out.items():
            w = r[u] / len(vs)
            for v in vs:
                nxt[v] += d * w
        r = nxt
    del n
    return r


def test_trustrank_matches_python_and_starves_spam(spark):
    from spark_df_profiling_spark.operators.graph import trustrank
    # trusted island a->b->c->a ; spam island x->y->z->x with no
    # inbound path from the trusted side; bridge c->d
    edges = [("a", "b"), ("b", "c"), ("c", "a"), ("c", "d"),
             ("x", "y"), ("y", "z"), ("z", "x")]
    e = spark.createDataFrame(edges, "src string, dst string")
    seeds = spark.createDataFrame([("a",), ("ghost",)], "node string")
    got = {r["node"]: r["rank"]
           for r in trustrank(e, seeds, n_iter=8).collect()}
    want = _trustrank_py(edges, ["a"], n_iter=8)
    assert set(got) == set(want)
    for k in want:
        assert abs(got[k] - want[k]) < 1e-9, k
    # spam island never reachable from the seed: exactly zero trust
    assert got["x"] == got["y"] == got["z"] == 0.0
    assert got["a"] > 0 and got["d"] > 0
    assert abs(sum(got.values()) - 1.0) < 1e-9


def test_trustrank_uniform_seeds_equals_pagerank(spark):
    from spark_df_profiling_spark.operators.graph import (
        pagerank, trustrank)
    edges = [("a", "b"), ("b", "c"), ("c", "a"), ("c", "d")]
    e = spark.createDataFrame(edges, "src string, dst string")
    all_nodes = spark.createDataFrame(
        [("a",), ("b",), ("c",), ("d",)], "node string")
    tr = {r["node"]: r["rank"]
          for r in trustrank(e, all_nodes, n_iter=6).collect()}
    pr = {r["node"]: r["rank"]
          for r in pagerank(e, n_iter=6).collect()}
    for k in pr:
        assert abs(tr[k] - pr[k]) < 1e-12


def test_trustrank_validation(spark):
    from spark_df_profiling_spark.operators.graph import trustrank
    e = spark.createDataFrame([("a", "b")], "src string, dst string")
    with pytest.raises(ValueError, match="no seed matches"):
        trustrank(e, spark.createDataFrame([("zz",)], "node string"))
    with pytest.raises(ValueError, match="damping"):
        trustrank(e, spark.createDataFrame([("a",)], "node string"),
                  damping=0.0)


# ---------------------------------------------------------------------------
# degree_stats / topk_rank_drift
# ---------------------------------------------------------------------------
def test_degree_stats(spark):
    from spark_df_profiling_spark.operators.graph import degree_stats
    edges = [("a", "b"), ("a", "b"), ("a", "c"), ("b", "c"),
             (None, "x"), ("y", None)]
    e = spark.createDataFrame(edges, "src string, dst string")
    got = {r["node"]: (r["out_deg"], r["in_deg"])
           for r in degree_stats(e).collect()}
    assert got == {"a": (2, 0), "b": (1, 1), "c": (0, 2)}
    multi = {r["node"]: (r["out_deg"], r["in_deg"])
             for r in degree_stats(e, dedup_edges=False).collect()}
    assert multi["a"] == (3, 0) and multi["b"] == (1, 2)
    with pytest.raises(ValueError, match="missing column"):
        degree_stats(e, src_col="nope")


def test_topk_rank_drift_matches_python(spark):
    from spark_df_profiling_spark.operators.drift import (
        topk_rank_drift)
    import statistics
    # A head: v0 > v1 > ... > v9 ; B: swap v1/v2, drop v9, add vNEW
    a_rows = [(f"v{i}",) for i in range(10) for _ in range(100 - i)]
    b_counts = {"v0": 100, "v2": 99, "v1": 98, "v3": 97, "v4": 96,
                "v5": 95, "v6": 94, "v7": 93, "v8": 92, "vNEW": 91}
    b_rows = [(v,) for v, c in b_counts.items() for _ in range(c)]
    a = spark.createDataFrame(a_rows + [(None,)], "x string")
    b = spark.createDataFrame(b_rows, "x string")
    r = topk_rank_drift(a, b, "x", k=10).first()
    assert (r["n_a"], r["n_b"], r["n_common"]) == (10, 10, 9)
    assert abs(r["churn_a"] - 0.1) < 1e-12
    assert abs(r["churn_b"] - 0.1) < 1e-12
    # common values v0..v8: ranks A = 1..9; B = 1,3,2,4..9
    ra = [1, 2, 3, 4, 5, 6, 7, 8, 9]
    rb = [1, 3, 2, 4, 5, 6, 7, 8, 9]
    want = statistics.correlation(ra, rb)
    assert abs(r["spearman"] - want) < 1e-9
    # identical snapshots: spearman exactly 1, zero churn
    same = topk_rank_drift(a, a, "x", k=10).first()
    assert same["spearman"] == 1.0 and same["churn_a"] == 0.0


def test_topk_rank_drift_small_vocab_and_validation(spark):
    from spark_df_profiling_spark.operators.drift import (
        topk_rank_drift)
    a = spark.createDataFrame([("x",), ("x",), ("y",)], "c string")
    b = spark.createDataFrame([("z",)], "c string")
    r = topk_rank_drift(a, b, "c", k=100).first()
    assert (r["n_a"], r["n_b"], r["n_common"]) == (2, 1, 0)
    assert r["spearman"] is None          # no common values
    assert r["churn_a"] == 1.0 and r["churn_b"] == 1.0
    with pytest.raises(ValueError, match="k must"):
        topk_rank_drift(a, b, "c", k=0)
    with pytest.raises(ValueError, match="df_b missing"):
        topk_rank_drift(a, a.withColumnRenamed("c", "d"), "c")


# ---------------------------------------------------------------------------
# random_projection
# ---------------------------------------------------------------------------
def test_random_projection_matches_python_and_preserves_geometry(
        spark):
    from spark_df_profiling_spark.operators.similarity import (
        rademacher_signs, random_projection)
    import math
    import random
    rng = random.Random(17)
    vecs = [[rng.gauss(0, 1) for _ in range(64)] for _ in range(40)]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)] + [(999, None)],
        "vec_id long, embedding array<double>")
    out = {r["vec_id"]: r["embedding_rp"]
           for r in random_projection(df, 64, 16, seed=5).collect()}
    signs = rademacher_signs(64, 16, seed=5)
    sc = 1 / math.sqrt(16)

    def proj(v):
        return [sc * sum(x * s for x, s in zip(v, row))
                for row in signs]

    for i, v in enumerate(vecs):
        for a, b in zip(out[i], proj(v)):
            assert abs(a - b) < 1e-9
    assert out[999] is None
    # JL property: projected pairwise sq-distances track originals
    import statistics
    ratios = []
    for a in range(0, 10):
        for b in range(a + 1, 10):
            d0 = sum((x - y) ** 2 for x, y in zip(vecs[a], vecs[b]))
            d1 = sum((x - y) ** 2 for x, y in zip(proj(vecs[a]),
                                                  proj(vecs[b])))
            ratios.append(d1 / d0)
    assert 0.7 < statistics.mean(ratios) < 1.3


def test_random_projection_validation(spark):
    from spark_df_profiling_spark.operators.similarity import (
        random_projection)
    df = spark.createDataFrame([(1, [1.0, 2.0])],
                               "vec_id long, embedding array<double>")
    with pytest.raises(ValueError, match="in_dim/out_dim"):
        random_projection(df, 0, 4)
    with pytest.raises(ValueError, match="missing column"):
        random_projection(df, 2, 1, vec_col="nope")
    bad = random_projection(df, 3, 2)  # declared 3, actual 2
    with pytest.raises(Exception, match="vector length"):
        bad.collect()


def test_random_projection_fast_path_matches_validated(spark):
    from spark_df_profiling_spark.operators.similarity import (
        random_projection)
    import random
    rng = random.Random(3)
    vecs = [[rng.gauss(0, 1) for _ in range(32)] for _ in range(20)]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>")
    a = {r["vec_id"]: r["embedding_rp"] for r in
         random_projection(df, 32, 8, seed=2).collect()}
    b = {r["vec_id"]: r["embedding_rp"] for r in
         random_projection(df, 32, 8, seed=2,
                           validate=False).collect()}
    assert a == b
    # fast path: NULL vector -> all-NULL components, never an error
    withnull = df.unionByName(spark.createDataFrame(
        [(99, None)], "vec_id long, embedding array<double>"))
    r = {x["vec_id"]: x["embedding_rp"] for x in
         random_projection(withnull, 32, 8, seed=2,
                           validate=False).collect()}
    assert r[99] == [None] * 8


# ---------------------------------------------------------------------------
# knn_projected_rerank
# ---------------------------------------------------------------------------
def test_knn_projected_rerank_recall_and_exact_sims(spark):
    from spark_df_profiling_spark.operators.similarity import (
        knn_bruteforce, knn_projected_rerank)
    import random
    rng = random.Random(23)
    # 4 query vectors, each with 5 planted near-duplicates (cosine
    # ~0.99) in a 180-vector random background (cosine ~0) — the
    # regime two-stage ANN is for: candidates must separate clearly
    # in the projected space, exact rerank settles the order
    vecs = []
    for i in range(4):
        base = [rng.gauss(0, 1) for _ in range(64)]
        vecs.append((i, base))
        for j in range(5):
            vecs.append((100 + i * 10 + j,
                         [x + rng.gauss(0, 0.08) for x in base]))
    for i in range(180):
        vecs.append((1000 + i, [rng.gauss(0, 1) for _ in range(64)]))
    e = spark.createDataFrame(vecs,
                              "vec_id long, embedding array<double>")
    q = e.where(F.col("vec_id") < 4)
    exact = knn_bruteforce(e, q, k=5)
    approx = knn_projected_rerank(e, q, in_dim=64, proj_dim=16,
                                  k=5, rerank_k=25, seed=7)
    ex = {}
    for r in exact.collect():
        ex.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    ap, sims = {}, {}
    for r in approx.collect():
        ap.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        sims[(r["query_id"], r["neighbor_id"])] = r["sim"]
    # recall >= 4/5 per query on clustered data at proj 16 / rerank 25
    for qid in ex:
        assert len(ex[qid] & ap[qid]) >= 4, (qid, ex[qid], ap[qid])
    # sims are the EXACT full-dim cosines for returned pairs
    exact_sims = {(r["query_id"], r["neighbor_id"]): r["sim"]
                  for r in exact.collect()}
    for key, s in sims.items():
        if key in exact_sims:
            assert abs(s - exact_sims[key]) < 1e-12
    # rank is dense 1..5 per query
    got_ranks = {}
    for r in approx.collect():
        got_ranks.setdefault(r["query_id"], []).append(r["rank"])
    assert all(sorted(v) == [1, 2, 3, 4, 5]
               for v in got_ranks.values())


def test_knn_projected_rerank_validation(spark):
    from spark_df_profiling_spark.operators.similarity import (
        knn_projected_rerank)
    e = spark.createDataFrame([(1, [1.0, 0.0])],
                              "vec_id long, embedding array<double>")
    with pytest.raises(ValueError, match="k must"):
        knn_projected_rerank(e, e, 2, 1, k=0)
    with pytest.raises(ValueError, match="rerank_k"):
        knn_projected_rerank(e, e, 2, 1, k=5, rerank_k=3)


# ---------------------------------------------------------------------------
# stratified_exact_split
# ---------------------------------------------------------------------------
def test_stratified_exact_split_counts_and_determinism(spark):
    from spark_df_profiling_spark.operators.sampling import (
        BUCKETS, stratified_exact_split)
    import hashlib
    rows = ([("en", i) for i in range(100)]
            + [("de", 1000 + i) for i in range(37)]
            + [("fr", 2000 + i) for i in range(3)]
            + [(None, 3000), ("en", None)])
    df = spark.createDataFrame(rows, "lang string, doc_id long")
    out = stratified_exact_split(
        df, "lang", {"train": 0.8, "val": 0.1, "test": 0.1},
        "doc_id", seed=4)
    got = {}
    for r in out.collect():
        got.setdefault((r["lang"], r["split"]), []).append(r["doc_id"])
    cnt = {k: len(v) for k, v in got.items()}
    # en 100: exactly 80/10/10 ; de 37: floor(29.6)=29, floor(33.3)-29
    # = 4, remainder 4 ; fr 3: 2/0/1 ; NULL stratum (1 row) -> test
    assert cnt[("en", "train")] == 80 and cnt[("en", "val")] == 10
    assert cnt[("en", "test")] == 10
    assert cnt[("de", "train")] == 29 and cnt[("de", "val")] == 4
    assert cnt[("de", "test")] == 4
    assert cnt[("fr", "train")] == 2 and cnt[("fr", "test")] == 1
    assert ("fr", "val") not in cnt
    assert cnt[(None, "test")] == 1  # floor(1*.8)=0, floor(1*.9)=0
    # NULL key dropped entirely
    assert sum(cnt.values()) == 141
    # python replay of the en stratum membership
    def bkt(i):
        h = hashlib.md5(f"{i}:4".encode()).hexdigest()[:15]
        return int(h, 16) % BUCKETS
    order = sorted(range(100), key=lambda i: (bkt(i), i))
    assert sorted(got[("en", "train")]) == sorted(order[:80])
    assert sorted(got[("en", "val")]) == sorted(order[80:90])
    # rerun identical
    again = stratified_exact_split(
        df, "lang", {"train": 0.8, "val": 0.1, "test": 0.1},
        "doc_id", seed=4)
    key = lambda t: tuple(repr(x) for x in t)  # noqa: E731
    assert sorted(map(tuple, again.collect()), key=key) == sorted(
        map(tuple, out.collect()), key=key)


def test_stratified_exact_split_validation(spark):
    from spark_df_profiling_spark.operators.sampling import (
        stratified_exact_split)
    df = spark.createDataFrame([("en", 1)], "lang string, doc_id long")
    with pytest.raises(ValueError, match="non-empty"):
        stratified_exact_split(df, "lang", {}, "doc_id")
    with pytest.raises(ValueError, match="positive sum"):
        stratified_exact_split(df, "lang", {"a": 0.0}, "doc_id")
    with pytest.raises(ValueError, match="missing column"):
        stratified_exact_split(df, "nope", {"a": 1.0}, "doc_id")


# ---------------------------------------------------------------------------
# oov_stats
# ---------------------------------------------------------------------------
def test_oov_stats_counts(spark):
    from spark_df_profiling_spark.operators.text import oov_stats
    docs = spark.createDataFrame(
        [(1, "the cat sat on the mat"),
         (2, "zyx qwv"),
         (3, ""),
         (4, "the the the")],
        "doc_id long, text string")
    vocab = spark.createDataFrame(
        [("the",), ("cat",), ("on",), ("mat",), (None,), ("the",)],
        "token string")
    got = {r["doc_id"]: (r["n_tokens"], r["n_oov"], r["oov_rate"])
           for r in oov_stats(docs, "text", vocab, "doc_id").collect()}
    assert got[1] == (6, 1, 1 / 6)  # only "sat" is OOV
    assert got[2] == (2, 2, 1.0)
    assert got[3] == (0, 0, None)
    assert got[4] == (3, 0, 0.0)


def test_oov_stats_validation(spark):
    from spark_df_profiling_spark.operators.text import oov_stats
    docs = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    vocab = spark.createDataFrame([("a",)], "token string")
    with pytest.raises(ValueError, match="df missing"):
        oov_stats(docs, "nope", vocab, "doc_id")
    with pytest.raises(ValueError, match="vocab missing"):
        oov_stats(docs, "text", vocab, "doc_id", token_col="nope")


# ---------------------------------------------------------------------------
# plan-shape pins for the session-4 joins
# ---------------------------------------------------------------------------
def test_temporal_join_is_hash_join_not_nested_loop(spark, scd2_dim):
    from spark_df_profiling_spark.operators.joins import temporal_join
    facts = spark.createDataFrame(
        [(1, 1, 5.0)], "oid long, cust long, ts double")
    plan = (temporal_join(facts, scd2_dim, "cust", "ts")
            ._jdf.queryExecution().executedPlan().toString())
    # the interval predicate must ride as a residual on a HASH
    # equi-join on the key — a BroadcastNestedLoopJoin here would be
    # O(facts x versions) at scale
    assert "NestedLoop" not in plan, plan[:600]
    assert ("BroadcastHashJoin" in plan or "SortMergeJoin" in plan
            or "ShuffledHashJoin" in plan)


def test_cooccurrence_pair_join_is_equi_join(spark):
    from spark_df_profiling_spark.operators.groupby import (
        cooccurrence_pairs)
    df = spark.createDataFrame([(1, "a"), (1, "b")],
                               "basket int, item string")
    plan = (cooccurrence_pairs(df, "basket", "item", min_pair_count=1)
            ._jdf.queryExecution().executedPlan().toString())
    # the PAIR self-join must be an equi join on the group key with
    # the item inequality as a residual (the one-row n_groups totals
    # frame rides a deliberate broadcast cross join — that one is
    # fine); a CartesianProduct anywhere would be the n² blowup
    assert "CartesianProduct" not in plan
    import re
    assert re.search(r"(SortMergeJoin|ShuffledHashJoin|"
                     r"BroadcastHashJoin) \[__g", plan), plan[:600]


def test_pagerank_weighted_equals_edge_multiplicity(spark):
    from spark_df_profiling_spark.operators.graph import pagerank
    # integer weights == duplicated edges under dedup_edges=False
    wrows = [("a", "b", 3.0), ("a", "c", 1.0), ("c", "a", 2.0),
             ("a", "x", None), ("a", "y", 0.0)]  # dropped edges
    we = spark.createDataFrame(wrows, "src string, dst string, w double")
    dup = [("a", "b")] * 3 + [("a", "c")] + [("c", "a")] * 2
    de = spark.createDataFrame(dup, "src string, dst string")
    got = {r["node"]: r["rank"]
           for r in pagerank(we, weight_col="w", n_iter=6).collect()}
    want = {r["node"]: r["rank"]
            for r in pagerank(de, dedup_edges=False,
                              n_iter=6).collect()}
    assert set(got) == set(want) == {"a", "b", "c"}
    for k in want:
        assert abs(got[k] - want[k]) < 1e-12
    with pytest.raises(ValueError, match="missing column"):
        pagerank(we, weight_col="nope")


def test_trustrank_weighted(spark):
    from spark_df_profiling_spark.operators.graph import trustrank
    # a splits trust 9:1 between b and spam-adjacent c
    we = spark.createDataFrame(
        [("a", "b", 9.0), ("a", "c", 1.0), ("b", "a", 1.0)],
        "src string, dst string, w double")
    seeds = spark.createDataFrame([("a",)], "node string")
    got = {r["node"]: r["rank"]
           for r in trustrank(we, seeds, weight_col="w",
                              n_iter=8).collect()}
    assert got["b"] > 5 * got["c"]
    assert abs(sum(got.values()) - 1.0) < 1e-9


# ---------------------------------------------------------------------------
# cusum_anomaly
# ---------------------------------------------------------------------------
def _cusum_py(vals, mu, sd, k):
    up = dn = 0.0
    out = []
    for v in vals:
        z = (v - mu) / sd
        up = max(0.0, up + z - k)
        dn = max(0.0, dn - z - k)
        out.append((z, up, dn))
    return out


def test_cusum_matches_sequential_recursion(spark):
    from spark_df_profiling_spark.operators.groupby import (
        cusum_anomaly)
    import random, statistics
    rng = random.Random(31)
    vals = [rng.gauss(10, 2) for _ in range(60)]
    vals += [rng.gauss(14, 2) for _ in range(40)]  # upward shift
    rows = [("k", float(i), v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "u string, ts double, v double")
    out = {r["ts"]: (r["z"], r["cusum_up"], r["cusum_dn"],
                     r["is_change"])
           for r in cusum_anomaly(df, "ts", "u", "v", k=0.5,
                                  h=5.0).collect()}
    mu = statistics.fmean(vals)
    sd = statistics.stdev(vals)
    want = _cusum_py(vals, mu, sd, 0.5)
    for i, (z, up, dn) in enumerate(want):
        gz, gup, gdn, fl = out[float(i)]
        assert abs(gz - z) < 1e-9
        assert abs(gup - up) < 1e-9, (i, gup, up)
        assert abs(gdn - dn) < 1e-9
        assert fl == (up > 5.0 or dn > 5.0)
    # the planted shift IS detected
    assert any(f for _, _, _, f in out.values())


def test_cusum_fixed_target_and_guards(spark):
    from spark_df_profiling_spark.operators.groupby import (
        cusum_anomaly)
    rows = ([("a", float(i), 10.0 + (0.2 if i % 2 else -0.2))
             for i in range(20)]
            + [("short", 1.0, 5.0), ("short", 2.0, 6.0),
               ("const", 1.0, 3.0), ("const", 2.0, 3.0),
               ("const", 3.0, 3.0), ("const", 4.0, 3.0),
               ("const", 5.0, 3.0)])
    df = spark.createDataFrame(rows, "u string, ts double, v double")
    # fixed in-control target: deterministic z, no hindsight baseline
    fixed = cusum_anomaly(df.where(F.col("u") == "a"), "ts", "u", "v",
                          k=0.5, h=4.0, target=10.0, sd=0.2)
    rs = fixed.orderBy("ts").collect()
    assert abs(rs[0]["z"] + 1.0) < 1e-12  # (9.8-10)/0.2
    assert all(r["cusum_up"] <= 0.5 + 1e-9 for r in rs)  # no shift
    # derived-baseline guards: short series and zero-sigma -> NULL
    auto = {(r["u"], r["ts"]): r for r in
            cusum_anomaly(df, "ts", "u", "v").collect()}
    assert auto[("short", 1.0)]["z"] is None
    assert auto[("const", 3.0)]["cusum_up"] is None
    assert auto[("const", 3.0)]["is_change"] is None
    with pytest.raises(ValueError, match="together"):
        cusum_anomaly(df, "ts", "u", "v", target=1.0)
    with pytest.raises(ValueError, match="h > 0"):
        cusum_anomaly(df, "ts", "u", "v", h=0.0)
    with pytest.raises(ValueError, match="sd must"):
        cusum_anomaly(df, "ts", "u", "v", target=1.0, sd=0.0)


# ---------------------------------------------------------------------------
# sources.file_row_stats
# ---------------------------------------------------------------------------
def test_file_row_stats_counts_real_files(spark, tmp_path):
    from spark_df_profiling_spark.operators.sampling import hash_split
    from spark_df_profiling_spark.sources import file_row_stats
    p = str(tmp_path / "skewed")
    # 3 deliberately skewed files via partitioned write
    df = spark.createDataFrame(
        [(i, "big" if i < 900 else ("mid" if i < 990 else "tiny"))
         for i in range(1000)], "id long, part string")
    df.repartition("part").write.partitionBy("part") \
        .mode("overwrite").parquet(p)
    back = spark.read.parquet(p)
    got = file_row_stats(back, top_k=5).collect()
    by_rows = sorted((r["n_rows"] for r in got))
    assert by_rows == [10, 90, 900]
    ranks = {r["n_rows"]: r["rank_asc"] for r in got}
    assert ranks[10] == 1 and ranks[900] == 3
    assert abs(sum(r["p_rows"] for r in got) - 1.0) < 1e-12
    del hash_split
    with pytest.raises(ValueError, match="top_k"):
        file_row_stats(back, top_k=0)


def test_file_row_stats_no_file_bucket(spark):
    from spark_df_profiling_spark.sources import file_row_stats
    df = spark.createDataFrame([(1,), (2,)], "x long")  # no files
    rows = file_row_stats(df).collect()
    assert len(rows) == 1 and rows[0]["file"] == "<no-file>"
    assert rows[0]["n_rows"] == 2


# ---------------------------------------------------------------------------
# readability_score
# ---------------------------------------------------------------------------
def test_readability_matches_python(spark):
    from spark_df_profiling_spark.operators.text import (
        readability_score)
    import re
    texts = [
        "The cat sat. The dog ran. It was fun.",
        "Notwithstanding considerable epistemological "
        "complications, interdisciplinary collaboration "
        "necessitates comprehensive organizational restructuring.",
        "no sentence punctuation here at all",
        "",
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "i long, text string")
    got = {r["i"]: r["score"]
           for r in df.select("i", readability_score("text")
                              .alias("score")).collect()}

    def ref(t):
        words = len(re.findall(r"[^ ]+", t))
        sents = max(len(re.findall(r"[.!?]+", t)), 1)
        syl = len(re.findall(r"[aeiouy]+", t.lower()))
        return 206.835 - 1.015 * words / sents - 84.6 * syl / words

    for i, t in enumerate(texts):
        if t == "":
            continue
        assert abs(got[i] - ref(t)) < 1e-9, (i, got[i], ref(t))
    # simple prose scores far above the academic wall of latinates
    assert got[0] > 80 > got[1]
    # ADVICE r10 fix: empty text has 0 words -> NULL score (the
    # docstring's contract), no longer the split('')->[''] artifact
    assert got[3] is None


def test_readability_word_count_multispace(spark):
    """ADVICE r10: consecutive spaces must not inflate n_words, and the
    two spellings must score identically."""
    from spark_df_profiling_spark.operators.text import (
        readability_exprs, readability_score)
    df = spark.createDataFrame(
        [(1, "the cat sat."), (2, "the   cat    sat."), (3, "   "),
         (4, "one")],
        "i long, text string")
    rows = {r["i"]: r for r in df.select(
        "i", readability_exprs("text")["n_words"].alias("w"),
        readability_score("text").alias("s")).collect()}
    assert rows[1]["w"] == rows[2]["w"] == 3
    assert rows[1]["s"] == rows[2]["s"]
    assert rows[3]["w"] == 0 and rows[3]["s"] is None   # spaces only
    assert rows[4]["w"] == 1


def test_readability_null_text(spark):
    from spark_df_profiling_spark.operators.text import (
        readability_score)
    df = spark.createDataFrame([(1, None)], "i long, text string")
    assert df.select(readability_score("text").alias("s")) \
             .first()["s"] is None


# ---------------------------------------------------------------------------
# diversity_stats
# ---------------------------------------------------------------------------
def test_diversity_stats_matches_python(spark):
    from spark_df_profiling_spark.operators.sampling import BUCKETS
    from spark_df_profiling_spark.operators.similarity import (
        diversity_stats)
    import hashlib, math, random, statistics
    rng = random.Random(41)
    vecs = {i: [rng.gauss(0, 1) for _ in range(16)] for i in range(30)}
    rows = [(i, v) for i, v in vecs.items()]
    rows += [(100, None), (101, [0.0] * 16)]  # excluded rows
    df = spark.createDataFrame(rows,
                               "vec_id long, embedding array<double>")
    r = diversity_stats(df, sample_k=10, seed=3).first()

    def bkt(i):
        h = hashlib.md5(f"{i}:3".encode()).hexdigest()[:15]
        return int(h, 16) % BUCKETS

    chosen = sorted(vecs, key=lambda i: (bkt(i), i))[:10]

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return d / (na * nb)

    sims = [cos(vecs[a], vecs[b])
            for ai, a in enumerate(chosen)
            for b in chosen[ai + 1:]]
    assert r["n_sampled"] == 10 and r["n_pairs"] == 45
    assert abs(r["mean_cos"] - statistics.fmean(sims)) < 1e-9
    assert abs(r["std_cos"] - statistics.stdev(sims)) < 1e-9
    assert r["p_hi"] == sum(s > 0.9 for s in sims) / 45


def test_diversity_stats_detects_collapse(spark):
    from spark_df_profiling_spark.operators.similarity import (
        diversity_stats)
    import random
    rng = random.Random(5)
    base = [rng.gauss(0, 1) for _ in range(16)]
    clones = [(i, [x + rng.gauss(0, 0.01) for x in base])
              for i in range(40)]
    df = spark.createDataFrame(
        clones, "vec_id long, embedding array<double>")
    r = diversity_stats(df, sample_k=20).first()
    assert r["mean_cos"] > 0.99 and r["p_hi"] == 1.0
    with pytest.raises(ValueError, match="sample_k"):
        diversity_stats(df, sample_k=1)


# ---------------------------------------------------------------------------
# plan_frame_samples / sample_frames
# ---------------------------------------------------------------------------
def _mp4_payload(timescale=600, duration=1500):
    ftyp = ((20).to_bytes(4, "big") + b"ftypisom"
            + (0).to_bytes(4, "big") + b"isom")
    mvhd = (b"\x00\x00\x00\x00" + (0).to_bytes(4, "big")
            + (0).to_bytes(4, "big") + timescale.to_bytes(4, "big")
            + duration.to_bytes(4, "big") + b"\x00" * 80)
    mvhd_box = (8 + len(mvhd)).to_bytes(4, "big") + b"mvhd" + mvhd
    moov = (8 + len(mvhd_box)).to_bytes(4, "big") + b"moov" + mvhd_box
    return ftyp + moov


def test_plan_frame_samples(spark):
    from spark_df_profiling_spark.operators.multimodal import (
        plan_frame_samples)
    rows = [(1, _mp4_payload(timescale=600, duration=1500)),  # 2.5 s
            (2, _mp4_payload(timescale=1000, duration=500)),  # 0.5 s
            (3, b"\x00garbage")]                              # unsniffable
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {}
    for r in plan_frame_samples(df, fps=30.0, every_s=1.0).collect():
        got.setdefault(r["media_id"], []).append(
            (r["sample_idx"], r["t_seconds"], r["frame_idx"]))
    # 2.5 s at 1/s -> samples at t=0,1,2 (frames 0,30,60)
    assert sorted(got[1]) == [(0, 0.0, 0), (1, 1.0, 30), (2, 2.0, 60)]
    assert sorted(got[2]) == [(0, 0.0, 0)]
    assert 3 not in got  # no sniffable duration -> no plan rows
    # ADVICE r10 clamp: exact-multiple duration (2.0 s @ 30 fps has
    # frames 0..59) — the t=2.0 sample must plan frame 59, not 60
    exact = spark.createDataFrame(
        [(4, _mp4_payload(timescale=600, duration=1200))],
        "media_id long, payload binary")
    got4 = sorted((r["sample_idx"], r["t_seconds"], r["frame_idx"])
                  for r in plan_frame_samples(
                      exact, fps=30.0, every_s=1.0).collect())
    assert got4 == [(0, 0.0, 0), (1, 1.0, 30), (2, 2.0, 59)]
    # runaway-duration guard
    import pytest as _pt
    long = spark.createDataFrame(
        [(9, _mp4_payload(timescale=1, duration=10_000))],
        "media_id long, payload binary")
    with _pt.raises(Exception, match="more than 5 frames"):
        plan_frame_samples(long, every_s=1.0, max_frames=5).collect()
    with _pt.raises(ValueError, match="fps"):
        plan_frame_samples(df, fps=0.0)


def test_sample_frames_stub_plumbing(spark):
    from spark_df_profiling_spark.operators.multimodal import (
        sample_frames)
    df = spark.createDataFrame(
        [(1, _mp4_payload())], "media_id long, payload binary")
    out = sample_frames(df)
    # schema/plan are real; execution hits the documented decode stub
    assert out.columns == ["media_id", "frame_idx", "frame"]
    with pytest.raises(Exception, match="PyAV|NotImplemented"):
        out.collect()

"""Round-7 session-3 batch 2: outlier fences, Benford first-digit law,
join-key health stats, PII redaction."""

import math

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def li(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/lineitem.parquet")


# ---------------------------------------------------------------------------
# outlier_stats
# ---------------------------------------------------------------------------
def _py_quantile(xs, p):
    """NumPy 'linear' interpolation — Spark percentile / DuckDB
    quantile_cont semantics."""
    xs = sorted(xs)
    h = (len(xs) - 1) * p
    lo = int(math.floor(h))
    hi = min(lo + 1, len(xs) - 1)
    return xs[lo] + (h - lo) * (xs[hi] - xs[lo])


def test_outlier_stats_matches_python(spark, li):
    from spark_df_profiling_spark.operators.outliers import outlier_stats
    got = {r["column"]: r for r in
           outlier_stats(li, ["l_extendedprice", "l_quantity"],
                         k=1.5).collect()}
    for c in ["l_extendedprice", "l_quantity"]:
        xs = [r[0] for r in li.select(c).collect() if r[0] is not None]
        q1, q3 = _py_quantile(xs, 0.25), _py_quantile(xs, 0.75)
        iqr = q3 - q1
        lo, hi = q1 - 1.5 * iqr, q3 + 1.5 * iqr
        g = got[c]
        assert g["q1"] == pytest.approx(q1, rel=1e-12)
        assert g["q3"] == pytest.approx(q3, rel=1e-12)
        assert g["lo_fence"] == pytest.approx(lo, rel=1e-12)
        assert g["n_below"] == sum(1 for x in xs if x < lo)
        assert g["n_above"] == sum(1 for x in xs if x > hi)
        assert g["n_outliers"] == g["n_below"] + g["n_above"]


def test_outlier_stats_planted_outliers(spark):
    from spark_df_profiling_spark.operators.outliers import outlier_stats
    rows = [(float(i),) for i in range(1, 101)] + [(1e6,), (-1e6,), (None,)]
    df = spark.createDataFrame(rows, "x double")
    g = outlier_stats(df, ["x"]).collect()[0]
    assert g["n_above"] == 1 and g["n_below"] == 1
    assert g["p_outliers"] == pytest.approx(2 / 102)


def test_outlier_stats_rejects_bad_args(spark, li):
    from spark_df_profiling_spark.operators.outliers import outlier_stats
    with pytest.raises(ValueError):
        outlier_stats(li, [])
    with pytest.raises(ValueError):
        outlier_stats(li, ["l_quantity"], k=-1)


def test_outlier_pass2_broadcasts_fences(spark, li):
    from spark_df_profiling_spark.operators.outliers import outlier_stats
    plan = outlier_stats(li, ["l_quantity"]) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastExchange" in plan or "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan


# ---------------------------------------------------------------------------
# benford_stats
# ---------------------------------------------------------------------------
def test_benford_matches_python(spark, li):
    from spark_df_profiling_spark.operators.outliers import (
        BENFORD_P, benford_stats)
    got = {r["digit"]: r for r in
           benford_stats(li, ["l_extendedprice"]).collect()}
    xs = [r[0] for r in li.select("l_extendedprice").collect()
          if r[0] is not None and r[0] != 0]
    from collections import Counter
    ref = Counter(int(str(abs(x)).lstrip("0.").replace(".", "")[0])
                  for x in xs)
    n = sum(ref.values())
    chi2 = sum((ref.get(d, 0) - n * BENFORD_P[d]) ** 2
               / (n * BENFORD_P[d]) for d in range(1, 10))
    mad = sum(abs(ref.get(d, 0) / n - BENFORD_P[d])
              for d in range(1, 10)) / 9
    assert set(got) == set(range(1, 10)), "all 9 digits get a row"
    for d in range(1, 10):
        assert got[d]["cnt"] == ref.get(d, 0), f"digit {d}"
        assert got[d]["p_benford"] == pytest.approx(BENFORD_P[d])
        assert got[d]["chi2"] == pytest.approx(chi2, rel=1e-9)
        assert got[d]["mad"] == pytest.approx(mad, rel=1e-9)


def test_benford_power_of_ten_boundaries(spark):
    """Exact powers of ten and near-boundary values get the true first
    digit even if log10 lands an ulp off an integer."""
    from spark_df_profiling_spark.operators.outliers import first_digit
    rows = [(0.001,), (0.1,), (1.0,), (10.0,), (100.0,), (1000.0,),
            (99.9999999,), (100.0000001,), (-100.0,), (9.999999,),
            (0.0,), (None,)]
    df = spark.createDataFrame(rows, "x double")
    got = [r[0] for r in df.select(first_digit("x")).collect()]
    assert got == [1, 1, 1, 1, 1, 1, 9, 1, 1, 9, None, None]


def test_benford_conformant_sample(spark):
    """A log-uniform sample conforms; its mad lands under the Nigrini
    close-conformity line while a uniform sample does not."""
    from spark_df_profiling_spark.operators.outliers import benford_stats
    logu = [(10 ** (0.0003 * i),) for i in range(10000)]  # 1 .. 10^3
    mad_log = benford_stats(
        spark.createDataFrame(logu, "x double"), ["x"]) \
        .agg(F.first("mad")).collect()[0][0]
    uni = [(1.0 + 0.01 * i,) for i in range(10000)]       # 1 .. 101
    mad_uni = benford_stats(
        spark.createDataFrame(uni, "x double"), ["x"]) \
        .agg(F.first("mad")).collect()[0][0]
    assert mad_log < 0.006 < mad_uni


# ---------------------------------------------------------------------------
# join_key_stats
# ---------------------------------------------------------------------------
def test_join_key_stats_crafted(spark):
    from spark_df_profiling_spark.operators.joins import join_key_stats
    left = spark.createDataFrame(
        [(1,), (1,), (1,), (2,), (3,), (None,)], "k long")
    right = spark.createDataFrame(
        [(1,), (2,), (2,), (4,), (None,), (None,)], "k long")
    g = join_key_stats(left, right, "k").collect()[0]
    assert g["left_rows"] == 6 and g["right_rows"] == 6
    assert g["left_distinct"] == 3 and g["right_distinct"] == 3
    assert g["left_null_keys"] == 1 and g["right_null_keys"] == 2
    assert g["left_matched_rows"] == 4    # 3x k=1 + 1x k=2
    assert g["right_matched_rows"] == 3   # 1x k=1 + 2x k=2
    assert g["left_orphan_rows"] == 2     # k=3 + null
    assert g["right_orphan_rows"] == 3    # k=4 + 2 nulls
    assert g["est_join_rows"] == 3 * 1 + 1 * 2   # = inner join size
    assert g["max_left_fanout"] == 3 and g["max_right_fanout"] == 2
    # est_join_rows is EXACT: verify against the real join
    assert left.join(right, "k").count() == g["est_join_rows"]


def test_join_key_stats_matches_lineitem_orders(spark, li, sf_dir):
    from spark_df_profiling_spark.operators.joins import join_key_stats
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    g = join_key_stats(li, orders, "l_orderkey", "o_orderkey").collect()[0]
    assert g["left_rows"] == li.count()
    assert g["right_rows"] == orders.count()
    assert g["est_join_rows"] == \
        li.join(orders, li.l_orderkey == orders.o_orderkey).count()
    assert g["left_orphan_rows"] == \
        li.join(orders, li.l_orderkey == orders.o_orderkey,
                "left_anti").count()


def test_join_key_stats_disjoint_sides(spark):
    from spark_df_profiling_spark.operators.joins import join_key_stats
    left = spark.createDataFrame([(1,), (2,)], "k long")
    right = spark.createDataFrame([(3,), (4,)], "k long")
    g = join_key_stats(left, right, "k").collect()[0]
    assert g["est_join_rows"] == 0
    assert g["left_matched_rows"] == 0 and g["right_matched_rows"] == 0
    assert g["left_orphan_rows"] == 2 and g["right_orphan_rows"] == 2


# ---------------------------------------------------------------------------
# pii_redact
# ---------------------------------------------------------------------------
def test_pii_redact_all_kinds(spark):
    from spark_df_profiling_spark.operators.text import pii_redact
    df = spark.createDataFrame([
        ("mail a.b@x.org see https://ex.com/p?q=1 ip 10.0.0.1 "
         "tel +1 (555) 123-4567",),
        ("no pii here",),
        (None,),
    ], "text string")
    got = [r[0] for r in df.select(pii_redact("text")).collect()]
    assert got[0] == "mail [EMAIL] see [URL] ip [IPV4] tel [PHONE]"
    assert got[1] == "no pii here"
    assert got[2] is None


def test_pii_redact_url_wins_over_ipv4(spark):
    """A URL containing a dotted quad is consumed whole by the url
    pattern before ipv4 can bite a fragment."""
    from spark_df_profiling_spark.operators.text import pii_redact
    df = spark.createDataFrame([("see http://10.1.2.3/path ok",)],
                               "text string")
    got = df.select(pii_redact("text")).collect()[0][0]
    assert got == "see [URL] ok"
    assert "[IPV4]" not in got


def test_pii_redact_kind_subset_and_validation(spark):
    from spark_df_profiling_spark.operators.text import pii_redact
    df = spark.createDataFrame([("a.b@x.org at 10.0.0.1",)], "text string")
    got = df.select(pii_redact("text", ["email"])).collect()[0][0]
    assert got == "[EMAIL] at 10.0.0.1"
    with pytest.raises(ValueError):
        df.select(pii_redact("text", ["ssn"]))


def test_pii_redact_plan_is_narrow(spark, sf_dir):
    from spark_df_profiling_spark.operators.text import pii_redact
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = docs.select(pii_redact("text").alias("r")) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


# ---------------------------------------------------------------------------
# sniff_av_meta (WAV / MP4 headers)
# ---------------------------------------------------------------------------
def _wav(ch=2, sr=44100, bits=16, dsize=88200):
    br = sr * ch * bits // 8
    fmt = (b"fmt " + (16).to_bytes(4, "little")
           + (1).to_bytes(2, "little") + ch.to_bytes(2, "little")
           + sr.to_bytes(4, "little") + br.to_bytes(4, "little")
           + (ch * bits // 8).to_bytes(2, "little")
           + bits.to_bytes(2, "little"))
    data = b"data" + dsize.to_bytes(4, "little") + b"\x00" * min(dsize, 8)
    body = b"WAVE" + fmt + data
    return b"RIFF" + (len(body)).to_bytes(4, "little") + body


def _mp4(timescale=600, duration=1500):
    ftyp = (20).to_bytes(4, "big") + b"ftypisom" + (0).to_bytes(4, "big") \
        + b"isom"
    mvhd = (b"\x00\x00\x00\x00" + (0).to_bytes(4, "big")
            + (0).to_bytes(4, "big") + timescale.to_bytes(4, "big")
            + duration.to_bytes(4, "big") + b"\x00" * 80)
    mvhd_box = (8 + len(mvhd)).to_bytes(4, "big") + b"mvhd" + mvhd
    moov = (8 + len(mvhd_box)).to_bytes(4, "big") + b"moov" + mvhd_box
    return ftyp + moov


def test_sniff_av_meta_wav_and_mp4():
    from spark_df_profiling_spark.operators.multimodal import sniff_av_meta
    mime, sr, ch, dur = sniff_av_meta(_wav(ch=1, sr=8000, bits=16,
                                           dsize=16000))
    assert (mime, sr, ch) == ("audio/wav", 8000, 1)
    assert dur == 16000 * 1000 // (8000 * 2)  # exactly 1000 ms
    mime, ts, ch, dur = sniff_av_meta(_mp4(timescale=600, duration=1500))
    assert (mime, ts, ch) == ("video/mp4", 600, None)
    assert dur == 1500 * 1000 // 600  # 2500 ms
    assert sniff_av_meta(b"not media at all") == (None, None, None, None)
    assert sniff_av_meta(None) == (None, None, None, None)


def test_sniff_av_meta_truncated_does_not_crash():
    from spark_df_profiling_spark.operators.multimodal import sniff_av_meta
    for payload in (_wav()[:13], _wav()[:25], _mp4()[:9], _mp4()[:30],
                    b"RIFF\x00\x00\x00\x00WAVE", b""):
        mime, a, b_, c = sniff_av_meta(payload)  # must not raise
        assert mime in (None, "audio/wav", "video/mp4")


def test_sniff_av_mapinpandas_roundtrip(spark):
    from spark_df_profiling_spark.operators.multimodal import sniff_av
    rows = [(1, _wav(ch=2, sr=44100, dsize=88200)),
            (2, _mp4(timescale=90000, duration=450000)),
            (3, b"plain text"), (4, None)]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {r["media_id"]: r for r in sniff_av(df).collect()}
    assert got[1]["mime"] == "audio/wav" and got[1]["rate"] == 44100
    assert got[1]["channels"] == 2
    assert got[1]["duration_ms"] == 88200 * 1000 // (44100 * 4)
    assert got[2]["mime"] == "video/mp4" and got[2]["rate"] == 90000
    assert got[2]["duration_ms"] == 5000
    assert got[3]["mime"] is None
    assert got[4]["n_bytes"] is None


# ---------------------------------------------------------------------------
# ks_2samp
# ---------------------------------------------------------------------------
def _py_ks(xs, ys):
    """Exact two-sample KS on small lists (scipy-free reference)."""
    xs, ys = sorted(xs), sorted(ys)
    vals = sorted(set(xs) | set(ys))
    import bisect
    best, at = -1.0, None
    for v in vals:
        fa = bisect.bisect_right(xs, v) / len(xs)
        fb = bisect.bisect_right(ys, v) / len(ys)
        d = abs(fa - fb)
        if d > best:
            best, at = d, v
    return best, at


def test_ks_2samp_matches_python(spark, li):
    from spark_df_profiling_spark.operators.drift import ks_2samp
    ref = li.where(F.col("l_orderkey") % 2 == 0)
    new = li.where(F.col("l_orderkey") % 2 == 1) \
        .withColumn("l_extendedprice", F.col("l_extendedprice") * 1.1)
    got = ks_2samp(ref, new, "l_extendedprice").collect()[0]
    xs = [r[0] for r in ref.select("l_extendedprice").collect()]
    ys = [r[0] for r in new.select("l_extendedprice").collect()]
    d, at = _py_ks(xs, ys)
    assert got["n_ref"] == len(xs) and got["n_new"] == len(ys)
    assert got["d_stat"] == pytest.approx(d, abs=1e-12)
    assert got["at_value"] == pytest.approx(at)


def test_ks_2samp_identical_and_disjoint(spark):
    from spark_df_profiling_spark.operators.drift import ks_2samp
    a = spark.createDataFrame([(float(i),) for i in range(100)], "x double")
    same = ks_2samp(a, a, "x").collect()[0]
    assert same["d_stat"] == 0.0
    b = spark.createDataFrame([(float(i + 1000),) for i in range(50)],
                              "x double")
    dis = ks_2samp(a, b, "x").collect()[0]
    assert dis["d_stat"] == 1.0


def test_ks_2samp_ties_and_nulls(spark):
    from spark_df_profiling_spark.operators.drift import ks_2samp
    a = spark.createDataFrame(
        [(1.0,), (1.0,), (2.0,), (None,)], "x double")
    b = spark.createDataFrame(
        [(1.0,), (2.0,), (2.0,), (None,), (None,)], "x double")
    got = ks_2samp(a, b, "x").collect()[0]
    d, at = _py_ks([1.0, 1.0, 2.0], [1.0, 2.0, 2.0])
    assert got["n_ref"] == 3 and got["n_new"] == 3
    assert got["d_stat"] == pytest.approx(d)
    assert got["at_value"] == at


def test_ks_2samp_empty_side_raises(spark):
    from spark_df_profiling_spark.operators.drift import ks_2samp
    a = spark.createDataFrame([(1.0,)], "x double")
    e = spark.createDataFrame([(None,)], "x double")
    with pytest.raises(ValueError):
        ks_2samp(a, e, "x")


def test_ks_2samp_no_single_partition_window(spark, li):
    """The cumulative sums must be windowed WITHIN range partitions —
    never a global single-partition window."""
    from spark_df_profiling_spark.operators.drift import ks_2samp
    ref = li.where(F.col("l_orderkey") % 2 == 0)
    new = li.where(F.col("l_orderkey") % 2 == 1)
    plan = ks_2samp(ref, new, "l_extendedprice") \
        ._jdf.queryExecution().executedPlan().toString()
    import re
    for m in re.finditer(r"Window \[", plan):
        seg = plan[m.start():m.start() + 400]
        assert "__pid" in seg, f"unpartitioned window: {seg[:120]}"


# ---------------------------------------------------------------------------
# skew_report
# ---------------------------------------------------------------------------
def test_skew_report_exposes_hot_key(spark):
    from spark_df_profiling_spark.operators.frequency import skew_report
    rows = [(1,)] * 900 + [(i,) for i in range(2, 102)]
    df = spark.createDataFrame(rows, "k long")
    out = skew_report(df, "k", k=3).collect()
    top = [r for r in out if r["part"] == "top"]
    stats = [r for r in out if r["part"] == "stats"][0]
    assert top[0]["key"] == "1" and top[0]["cnt"] == 900
    n_keys, max_cnt, p99, ppm = stats["key"].split(":")
    assert int(n_keys) == 101 and int(max_cnt) == 900
    assert int(ppm) == 900 * 1_000_000 // 1000
    assert stats["cnt"] == 1000


def test_skew_report_null_keys_counted(spark):
    from spark_df_profiling_spark.operators.frequency import skew_report
    df = spark.createDataFrame([(None,), (None,), (1,)], "k long")
    out = {r["key"]: r["cnt"] for r in
           skew_report(df, "k", k=5).collect() if r["part"] == "top"}
    assert out["<null>"] == 2


def test_skew_report_composite_key(spark, li):
    from spark_df_profiling_spark.operators.frequency import skew_report
    out = skew_report(li, ["l_returnflag", "l_linestatus"], k=2).collect()
    ref = (li.groupBy("l_returnflag", "l_linestatus").count()
           .orderBy(F.desc("count")).collect())
    top = [r for r in out if r["part"] == "top"]
    assert top[0]["cnt"] == ref[0]["count"]


# ---------------------------------------------------------------------------
# mmr_rerank
# ---------------------------------------------------------------------------
def _py_mmr(rel, sims, k, lam):
    """Greedy MMR reference: rel = {id: rel}, sims = {(a,b): cos}."""
    remaining = sorted(rel, key=lambda i: (-rel[i], i))
    selected, out = [], []
    while remaining and len(out) < k:
        best, best_s = None, None
        for nid in remaining:
            if not selected:
                s = rel[nid]
            else:
                mx = max(sims[tuple(sorted((nid, sid)))]
                         for sid in selected)
                s = lam * rel[nid] - (1 - lam) * mx
            if best_s is None or s > best_s or (s == best_s and nid < best):
                best, best_s = nid, s
        selected.append(best)
        remaining.remove(best)
        out.append((best, best_s))
    return out


def test_mmr_matches_python_reference(spark, sf_dir):
    from spark_df_profiling_spark.operators.similarity import mmr_rerank
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qs = e.where(F.col("vec_id") < 3)
    got = mmr_rerank(e, qs, k=4, pool=8, lam=0.7).collect()
    vecs = {r["vec_id"]: [float(x) for x in r["embedding"]]
            for r in e.collect()}

    def cos(a, b):
        d = sum(x * y for x, y in zip(vecs[a], vecs[b]))
        na = sum(x * x for x in vecs[a]) ** 0.5
        nb = sum(x * x for x in vecs[b]) ** 0.5
        return d / (na * nb)

    by_q = {}
    for r in sorted(got, key=lambda r: (r["query_id"], r["rank"])):
        by_q.setdefault(r["query_id"], []).append(
            (r["neighbor_id"], r["mmr_score"]))
    for q in [0, 1, 2]:
        pool = sorted(((cos(q, c), c) for c in vecs if c != q),
                      key=lambda t: (-t[0], t[1]))[:8]
        rel = {c: s for s, c in pool}
        sims = {tuple(sorted((a, b))): cos(a, b)
                for _, a in pool for _, b in pool if a < b}
        ref = _py_mmr(rel, sims, 4, 0.7)
        assert [n for n, _ in by_q[q]] == [n for n, _ in ref], f"q={q}"
        for (gn, gs), (rn, rs) in zip(by_q[q], ref):
            assert gs == pytest.approx(rs, rel=1e-9)


def test_mmr_diversifies_planted_clones(spark):
    """Three near-identical top hits: plain kNN returns all three;
    MMR's rank-2 pick skips the clones for something different."""
    from spark_df_profiling_spark.operators.similarity import (
        knn_bruteforce, mmr_rerank)
    rows = [(0, [1.0, 0.0, 0.0]),          # query
            (1, [0.99, 0.14, 0.0]),        # clone A
            (2, [0.99, 0.141, 0.0]),       # clone B
            (3, [0.99, 0.139, 0.0]),       # clone C
            (4, [0.7, -0.7, 0.1])]         # different direction
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    qs = df.where(F.col("vec_id") == 0)
    knn = [r["neighbor_id"] for r in
           knn_bruteforce(df, qs, k=2).orderBy("rank").collect()]
    assert set(knn) <= {1, 2, 3}, "plain kNN picks only clones"
    mmr = [r["neighbor_id"] for r in
           mmr_rerank(df, qs, k=2, pool=4, lam=0.5)
           .orderBy("rank").collect()]
    assert mmr[1] == 4, "MMR's second pick escapes the clone cluster"


def test_mmr_rejects_bad_params(spark, sf_dir):
    from spark_df_profiling_spark.operators.similarity import mmr_rerank
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    with pytest.raises(ValueError):
        mmr_rerank(e, e, lam=1.5)
    with pytest.raises(ValueError):
        mmr_rerank(e, e, k=10, pool=5)


# ---------------------------------------------------------------------------
# weighted_sample_k / score_buckets
# ---------------------------------------------------------------------------
def test_weighted_sample_matches_python(spark, sf_dir):
    import hashlib
    import math
    from spark_df_profiling_spark.operators.sampling import (
        weighted_sample_k)
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = [(r["doc_id"], r["es_key"]) for r in
           weighted_sample_k(d, "doc_id", "n_chars", k=8, seed=11)
           .orderBy("es_key").collect()]
    ref = []
    for r in d.select("doc_id", "n_chars").collect():
        h = int(hashlib.md5(f"{r['doc_id']}:11".encode())
                .hexdigest()[:15], 16)
        u = (h + 1) / float(1 << 60)
        ref.append((-math.log(u) / float(r["n_chars"]), r["doc_id"]))
    ref.sort()
    assert [i for i, _ in got] == [i for _, i in ref[:8]]
    for (gi, gk), (rk, ri) in zip(got, ref[:8]):
        assert gk == pytest.approx(rk, rel=1e-12)


def test_weighted_sample_respects_weights(spark):
    """A 1000x-weight row is essentially always sampled."""
    from spark_df_profiling_spark.operators.sampling import (
        weighted_sample_k)
    rows = [(i, 1.0 if i else 100000.0) for i in range(200)]
    df = spark.createDataFrame(rows, "id long, w double")
    ids = {r["id"] for r in weighted_sample_k(df, "id", "w", k=5).collect()}
    assert 0 in ids
    # zero/negative weights never selected
    df2 = spark.createDataFrame(
        [(1, 0.0), (2, -3.0), (3, 1.0)], "id long, w double")
    only = [r["id"] for r in
            weighted_sample_k(df2, "id", "w", k=3).collect()]
    assert only == [3]


def test_score_buckets_equal_frequency(spark, sf_dir):
    from spark_df_profiling_spark.operators.sampling import score_buckets
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    out = (score_buckets(li, "l_extendedprice", n_buckets=10)
           .groupBy("bucket").count().collect())
    n = li.count()
    counts = {r["bucket"]: r["count"] for r in out}
    assert set(counts) == set(range(10))
    for b, c in counts.items():
        assert abs(c - n / 10) < n * 0.02, f"bucket {b} unbalanced: {c}"


def test_score_buckets_ties_and_nulls(spark):
    from spark_df_profiling_spark.operators.sampling import score_buckets
    rows = [(1.0,)] * 90 + [(2.0,)] * 10 + [(None,)]
    df = spark.createDataFrame(rows, "x double")
    out = score_buckets(df, "x", n_buckets=4).collect()
    by_val = {}
    for r in out:
        by_val.setdefault(r["x"], set()).add(r["bucket"])
    assert len(by_val[1.0]) == 1, "equal scores never split tiers"
    assert len(by_val[2.0]) == 1
    assert by_val[None] == {None}


# ---------------------------------------------------------------------------
# profile_diff
# ---------------------------------------------------------------------------
def test_profile_diff_flags_planted_changes(spark):
    from spark_df_profiling_spark.operators.diff import profile_diff
    cols = ["column", "dtype", "type_class", "n", "p_missing",
            "distinct_count", "mean", "std"]
    a = spark.createDataFrame([
        ("x", "double", "NUM", 100, 0.0, 90, 10.0, 2.0),
        ("y", "double", "NUM", 100, 0.0, 50, 5.0, 1.0),
        ("gone", "string", "CAT", 100, 0.0, 3, None, None),
        ("t", "string", "CAT", 100, 0.0, 4, None, None),
    ], cols)
    b = spark.createDataFrame([
        ("x", "double", "NUM", 120, 0.5, 95, 10.1, 2.1),   # null_rate
        ("y", "double", "NUM", 120, 0.0, 50, 25.0, 1.1),   # mean_shift
        ("new", "bigint", "NUM", 120, 0.0, 9, 1.0, 0.5),   # added
        ("t", "bigint", "NUM", 120, 0.0, 4, 2.0, 1.0),     # type change
    ], cols)
    got = {r["column"]: r for r in profile_diff(a, b).collect()}
    assert got["gone"]["status"] == "removed"
    assert got["new"]["status"] == "added"
    assert got["t"]["status"] == "changed" \
        and "type_changed" in got["t"]["flags"]
    assert "null_rate" in got["x"]["flags"]
    assert "mean_shift" in got["y"]["flags"]
    assert got["y"]["mean_z"] == pytest.approx((25.0 - 5.0) / 1.0)


def test_profile_diff_identical_profiles_all_ok(spark, li):
    from spark_df_profiling_spark.operators.diff import profile_diff
    from spark_df_profiling_spark import profile
    p = profile(li)
    out = profile_diff(p, p).collect()
    assert all(r["status"] == "ok" and r["flags"] == "" for r in out)
    assert len(out) == p.count()


def test_profile_diff_real_halves_mostly_ok(spark, li):
    from spark_df_profiling_spark.operators.diff import profile_diff
    from spark_df_profiling_spark import profile
    pa = profile(li.where(F.col("l_orderkey") % 2 == 0))
    pb = profile(li.where(F.col("l_orderkey") % 2 == 1))
    out = profile_diff(pa, pb).collect()
    # random halves of the same table: no schema drift, no mean shifts
    assert all(r["status"] in ("ok", "changed") for r in out)
    assert not any("type_changed" in (r["flags"] or "") for r in out)
    assert not any("mean_shift" in (r["flags"] or "") for r in out)


# ---------------------------------------------------------------------------
# robust_outlier_stats (median / MAD modified z-score)
# ---------------------------------------------------------------------------
def test_robust_outliers_matches_python(spark, li):
    from spark_df_profiling_spark.operators.outliers import (
        robust_outlier_stats)
    got = {r["column"]: r for r in robust_outlier_stats(
        li, ["l_extendedprice", "l_quantity"], z=3.5).collect()}
    for c in ["l_extendedprice", "l_quantity"]:
        xs = [r[0] for r in li.select(c).collect() if r[0] is not None]
        med = _py_quantile(xs, 0.5)
        madm = _py_quantile([abs(x - med) for x in xs], 0.5)
        lo = med - 3.5 * madm / 0.6745
        hi = med + 3.5 * madm / 0.6745
        g = got[c]
        assert g["median"] == pytest.approx(med, rel=1e-12)
        assert g["madm"] == pytest.approx(madm, rel=1e-12)
        assert g["n_below"] == sum(1 for x in xs if x < lo)
        assert g["n_above"] == sum(1 for x in xs if x > hi)


def test_robust_outliers_catch_what_iqr_sees_and_more(spark):
    """A massive planted spike is flagged; a >=50%-constant column
    degrades to NULL cuts instead of flagging everything."""
    from spark_df_profiling_spark.operators.outliers import (
        robust_outlier_stats)
    rows = [(float(i),) for i in range(100)] + [(1e7,), (None,)]
    g = robust_outlier_stats(
        spark.createDataFrame(rows, "x double"), ["x"]).collect()[0]
    assert g["n_above"] == 1 and g["n_below"] == 0
    const = spark.createDataFrame([(5.0,)] * 10 + [(9.0,)], "x double")
    g2 = robust_outlier_stats(const, ["x"]).collect()[0]
    assert g2["madm"] == 0.0 and g2["n_outliers"] == 0
    assert g2["lo_cut"] is None and g2["hi_cut"] is None


def test_robust_outliers_resist_contamination(spark):
    """30% junk rows barely move the MAD cuts (the property IQR fences
    lose at high contamination)."""
    from spark_df_profiling_spark.operators.outliers import (
        robust_outlier_stats)
    clean = [(float(i % 100),) for i in range(700)]
    junk = [(1e6 + i,) for i in range(300)]
    df = spark.createDataFrame(clean + [(float(x),) for x, in junk],
                               "x double")
    g = robust_outlier_stats(df, ["x"]).collect()[0]
    assert g["n_above"] == 300, "all junk flagged despite 30% share"


# ---------------------------------------------------------------------------
# Z-order layout
# ---------------------------------------------------------------------------
def test_interleave_bits_known_values(spark):
    from spark_df_profiling_spark.operators.layout import interleave_bits
    df = spark.createDataFrame([(0b1010, 0b0110)], "a long, b long")
    got = df.select(interleave_bits(
        [F.col("a"), F.col("b")], bits=4).alias("z")).collect()[0][0]
    # bit k of a -> position 2k; bit k of b -> position 2k+1
    expect = 0
    for k in range(4):
        expect |= ((0b1010 >> k) & 1) << (2 * k)
        expect |= ((0b0110 >> k) & 1) << (2 * k + 1)
    assert got == expect


def test_zorder_key_matches_python(spark, li):
    from spark_df_profiling_spark.operators.layout import zorder_key
    cols = ["l_partkey", "l_suppkey"]
    bits = 4
    sub = li.select("l_orderkey", "l_linenumber", *cols)
    got = zorder_key(sub, cols, bits=bits).collect()
    xs = {c: sorted(r[c] for r in sub.select(c).collect())
          for c in cols}

    def q(vals, p):
        h = (len(vals) - 1) * p
        lo = int(h)
        hi = min(lo + 1, len(vals) - 1)
        return vals[lo] + (h - lo) * (vals[hi] - vals[lo])

    cuts = {c: [q(xs[c], i / 16) for i in range(1, 16)] for c in cols}
    for r in got[:200]:
        tiers = [sum(1 for cut in cuts[c] if float(r[c]) > cut)
                 for c in cols]
        z = 0
        for k in range(bits):
            for i, t in enumerate(tiers):
                z |= ((t >> k) & 1) << (k * 2 + i)
        assert r["zkey"] == z


def test_zorder_write_improves_skipping_on_both_cols(spark, li, tmp_path):
    from spark_df_profiling_spark.operators.layout import (
        skipping_stats, zorder_write)
    cols = ["l_partkey", "l_suppkey"]
    nat = str(tmp_path / "nat")
    zed = str(tmp_path / "z")
    li.repartition(8).write.mode("overwrite").parquet(nat)
    zorder_write(li, zed, cols, num_files=8)
    s_nat = skipping_stats(spark, nat, cols).collect()[0]
    s_z = skipping_stats(spark, zed, cols).collect()[0]
    for c in cols:
        assert s_z[f"avg_span_{c}"] < s_nat[f"avg_span_{c}"] * 0.8, c
    # layout is a permutation: nothing lost
    assert spark.read.parquet(zed).count() == li.count()


def test_zorder_rejects_bad_args(spark, li):
    from spark_df_profiling_spark.operators.layout import zorder_key
    with pytest.raises(ValueError):
        zorder_key(li, ["l_partkey"])
    with pytest.raises(ValueError):
        zorder_key(li, ["l_partkey", "l_suppkey"], bits=0)


def test_benford_all_null_column_reports_null_not_nan(spark):
    from spark_df_profiling_spark.operators.outliers import benford_stats
    df = spark.createDataFrame([(None,), (0.0,)], "x double")
    out = benford_stats(df, ["x"]).collect()
    assert len(out) == 9
    for r in out:
        assert r["cnt"] == 0
        assert r["chi2"] is None
        assert r["p_obs"] is None


def test_interleave_rejects_sign_bit_overflow(spark, li):
    from spark_df_profiling_spark.operators.layout import zorder_key
    with pytest.raises(ValueError):
        zorder_key(li, ["l_partkey", "l_suppkey", "l_orderkey",
                        "l_quantity"], bits=16)


# ---------------------------------------------------------------------------
# embedding_dim_stats
# ---------------------------------------------------------------------------
def test_embedding_dim_stats_detects_dead_dimension(spark):
    from spark_df_profiling_spark.operators.similarity import (
        embedding_dim_stats)
    import random
    rng = random.Random(7)
    rows = [(i, [rng.uniform(-1, 1), 0.0, rng.uniform(5, 6)])
            for i in range(50)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {r["dim"]: r for r in embedding_dim_stats(df).collect()}
    assert got[1]["std"] == 0.0 and got[1]["frac_zero"] == 1.0
    assert got[0]["frac_zero"] == 0.0
    assert got[2]["mean"] == pytest.approx(5.5, abs=0.2)
    assert all(got[d]["n"] == 50 for d in range(3))


def test_embedding_dim_stats_matches_python(spark, sf_dir):
    from spark_df_profiling_spark.operators.similarity import (
        embedding_dim_stats)
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    got = {r["dim"]: r for r in embedding_dim_stats(e).collect()}
    vecs = [[float(x) for x in r["embedding"]] for r in e.collect()]
    d0 = [v[0] for v in vecs]
    n = len(d0)
    mean = sum(d0) / n
    var = sum((x - mean) ** 2 for x in d0) / (n - 1)
    assert got[0]["n"] == n
    assert got[0]["mean"] == pytest.approx(mean, rel=1e-9)
    assert got[0]["std"] == pytest.approx(var ** 0.5, rel=1e-9)
    assert got[0]["min_v"] == min(d0) and got[0]["max_v"] == max(d0)
    assert len(got) == len(vecs[0])


# ---------------------------------------------------------------------------
# psi_by_group
# ---------------------------------------------------------------------------
def test_psi_by_group_isolates_drifting_segment(spark, li):
    from spark_df_profiling_spark.operators.drift import psi_by_group
    ref = li.where(F.col("l_orderkey") % 2 == 0)
    new = li.where(F.col("l_orderkey") % 2 == 1)
    # shift prices ONLY inside returnflag 'R'
    drifted = new.withColumn(
        "l_extendedprice",
        F.when(F.col("l_returnflag") == "R",
               F.col("l_extendedprice") * 3)
        .otherwise(F.col("l_extendedprice")))
    out = {(r["group"], r["column"]): r for r in psi_by_group(
        ref, drifted, "l_returnflag", ["l_extendedprice"]).collect()}
    assert out[("R", "l_extendedprice")]["band"] == "shifted"
    for g in ("A", "N"):
        assert out[(g, "l_extendedprice")]["psi"] < 0.1, g


def test_psi_by_group_matches_global_when_one_group(spark, li):
    from spark_df_profiling_spark.operators.drift import (
        psi_by_group, psi_numeric)
    ref = li.where(F.col("l_orderkey") % 2 == 0)
    new = li.where(F.col("l_orderkey") % 2 == 1)
    one = psi_by_group(ref.withColumn("g", F.lit("all")),
                       new.withColumn("g", F.lit("all")),
                       "g", ["l_quantity"]).collect()[0]
    glob = psi_numeric(ref, new, ["l_quantity"]).collect()[0]
    assert one["psi"] == pytest.approx(glob["psi"], rel=1e-9)


def test_psi_by_group_null_group_segment(spark):
    from spark_df_profiling_spark.operators.drift import psi_by_group
    ref = spark.createDataFrame(
        [(None, float(i % 10)) for i in range(100)], "g string, x double")
    new = spark.createDataFrame(
        [(None, float(9)) for i in range(100)], "g string, x double")
    out = psi_by_group(ref, new, "g", ["x"]).collect()
    assert len(out) == 1 and out[0]["group"] == "<null>"
    assert out[0]["band"] == "shifted"


# ---------------------------------------------------------------------------
# event_funnel
# ---------------------------------------------------------------------------
def test_event_funnel_crafted_timelines(spark):
    from spark_df_profiling_spark.streaming import event_funnel
    rows = [
        # u1: full conversion in order
        (1, "view", 100), (1, "click", 200), (1, "purchase", 300),
        # u2: clicked BEFORE viewing — click must not count
        (2, "click", 50), (2, "view", 100), (2, "purchase", 200),
        # u3: view then click, no purchase
        (3, "view", 100), (3, "click", 150),
        # u4: purchase only — counts for nothing
        (4, "purchase", 10),
        # u5: full conversion but purchase outside the window
        (5, "view", 0), (5, "click", 100), (5, "purchase", 999_999),
    ]
    df = spark.createDataFrame(rows, "user_id long, event_type string, s long") \
        .withColumn("ts_ts", F.timestamp_seconds(F.col("s")))
    got = {r["step_idx"]: r for r in event_funnel(
        df, ["view", "click", "purchase"],
        within="1 hour").collect()}
    assert got[1]["n_keys"] == 4   # u1, u2, u3, u5 viewed
    assert got[2]["n_keys"] == 3   # u1, u3, u5 (u2's click pre-dates
                                   # its view, so it must not count)
    assert got[3]["n_keys"] == 1   # only u1 (u5's purchase falls
                                   # outside the 1-hour window)


def test_event_funnel_matches_python(spark, sf_dir):
    from spark_df_profiling_spark.sources import load_events
    from spark_df_profiling_spark.streaming import event_funnel
    ev = load_events(spark, sf_dir)
    got = {r["step_idx"]: r["n_keys"] for r in event_funnel(
        ev, ["view", "click", "purchase"], within="2 days").collect()}
    rows = ev.select("user_id", "event_type",
                     F.col("ts_ts").cast("double").alias("t")).collect()
    from collections import defaultdict
    by_u = defaultdict(list)
    for r in rows:
        by_u[r["user_id"]].append((r["event_type"], r["t"]))
    win = 2 * 86400
    n1 = n2 = n3 = 0
    for u, evs in by_u.items():
        t1s = [t for e, t in evs if e == "view"]
        if not t1s:
            continue
        t1 = min(t1s)
        n1 += 1
        t2s = [t for e, t in evs
               if e == "click" and t > t1 and t <= t1 + win]
        if not t2s:
            continue
        t2 = min(t2s)
        n2 += 1
        t3s = [t for e, t in evs
               if e == "purchase" and t > t2 and t <= t1 + win]
        if t3s:
            n3 += 1
    assert (got[1], got[2], got[3]) == (n1, n2, n3)


def test_event_funnel_ratios_and_validation(spark, sf_dir):
    from spark_df_profiling_spark.sources import load_events
    from spark_df_profiling_spark.streaming import event_funnel
    ev = load_events(spark, sf_dir)
    out = event_funnel(ev, ["view", "purchase"]).collect()
    assert out[0]["p_of_first"] == 1.0
    assert out[1]["p_of_prev"] == pytest.approx(
        out[1]["n_keys"] / out[0]["n_keys"])
    with pytest.raises(ValueError):
        event_funnel(ev, [])

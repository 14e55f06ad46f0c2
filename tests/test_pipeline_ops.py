"""Tests for sampling/split, repetition, PII scan, and drift operators."""

import pytest
from pyspark.sql import functions as F

from spark_df_profiling_spark.operators.drift import (
    psi_categorical,
    psi_numeric,
    psi_report,
)
from spark_df_profiling_spark.operators.sampling import (
    hash_bucket,
    hash_split,
    sample_hash,
    split_counts,
    stratified_sample_hash,
)
from spark_df_profiling_spark.operators.text import (
    dup_ngram_ratio,
    pii_scan,
    repetition_stats,
    top_token_ratio,
    type_token_ratio,
)


@pytest.fixture(scope="module")
def ids(spark):
    return spark.range(0, 10_000).withColumnRenamed("id", "key")


# --- deterministic sampling / splitting ------------------------------------

def test_hash_split_disjoint_exhaustive_deterministic(ids):
    w = {"train": 0.8, "val": 0.1, "test": 0.1}
    a = hash_split(ids, "key", w, seed=1)
    counts = {r["split"]: r["count"]
              for r in a.groupBy("split").count().collect()}
    assert sum(counts.values()) == 10_000          # exhaustive
    assert abs(counts["train"] - 8000) < 200       # ~weights
    assert abs(counts["val"] - 1000) < 120
    # rerun → identical assignment (hash, not rand)
    b = hash_split(ids, "key", w, seed=1)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    # different seed → different assignment
    c = hash_split(ids, "key", w, seed=2)
    assert a.exceptAll(c).count() > 0


def test_sample_hash_subset_semantics(ids):
    s10 = sample_hash(ids, "key", 0.10, seed=5)
    s20 = sample_hash(ids, "key", 0.20, seed=5)
    n10, n20 = s10.count(), s20.count()
    assert abs(n10 - 1000) < 150 and abs(n20 - 2000) < 200
    # fractions are NESTED for a fixed seed (bucket < cut is monotone):
    # growing a sample keeps every previously sampled row
    assert s10.exceptAll(s20).count() == 0
    assert sample_hash(ids, "key", 0.0).count() == 0
    assert sample_hash(ids, "key", 1.0).count() == 10_000


def test_stratified_sample_and_validation(spark):
    df = spark.range(0, 6000).select(
        F.col("id").alias("key"),
        F.when(F.col("id") % 3 == 0, "en")
        .when(F.col("id") % 3 == 1, "de").otherwise("fr").alias("lang"))
    kept = stratified_sample_hash(df, "lang", {"en": 0.5, "de": 0.1},
                                  "key", seed=9)
    got = {r["lang"]: r["count"]
           for r in kept.groupBy("lang").count().collect()}
    assert abs(got.get("en", 0) - 1000) < 150
    assert abs(got.get("de", 0) - 200) < 80
    assert "fr" not in got                      # default_fraction=0
    with pytest.raises(ValueError):
        stratified_sample_hash(df, "lang", {"en": 1.5}, "key")
    with pytest.raises(ValueError):
        sample_hash(df, "key", -0.1)
    with pytest.raises(ValueError):
        hash_split(df, "key", {})
    with pytest.raises(ValueError):
        hash_bucket("key", buckets=0)


def test_split_counts_by_dimension(spark):
    df = spark.range(0, 1000).select(
        F.col("id").alias("key"),
        (F.col("id") % 2 == 0).alias("even"))
    out = split_counts(df, "key", {"a": 0.5, "b": 0.5}, by=["even"])
    rows = out.collect()
    assert sum(r["n_rows"] for r in rows) == 1000
    assert {(r["split"], r["even"]) for r in rows} == {
        ("a", True), ("a", False), ("b", True), ("b", False)}


def test_hash_split_group_consistency(spark):
    # rows sharing a key land in the same split (leakage control)
    df = spark.range(0, 3000).select(
        (F.col("id") % 100).alias("user"), F.col("id").alias("row"))
    a = hash_split(df, "user", {"train": 0.7, "test": 0.3}, seed=4)
    assert (a.groupBy("user")
            .agg(F.count_distinct("split").alias("k"))
            .where(F.col("k") > 1).count()) == 0


# --- repetition / diversity -------------------------------------------------

def test_repetition_kernels(spark):
    df = spark.createDataFrame(
        [("uniq", "a b c d e f g h"),
         ("rep", "spam spam spam spam spam spam spam ham"),
         ("short", "x")],
        ["k", "t"])
    got = {r["k"]: r for r in df.select(
        "k",
        type_token_ratio("t").alias("ttr"),
        top_token_ratio("t").alias("top"),
        dup_ngram_ratio("t", 2).alias("d2"),
        dup_ngram_ratio("t", 3).alias("d3")).collect()}
    assert got["uniq"]["ttr"] == 1.0 and got["uniq"]["d2"] == 0.0
    assert got["rep"]["top"] == pytest.approx(7 / 8)
    # 7 bigrams: spam-spam x6 + spam-ham → 2 distinct → 1 - 2/7
    assert got["rep"]["d2"] == pytest.approx(1 - 2 / 7)
    assert got["short"]["d2"] == 0.0 and got["short"]["d3"] == 0.0
    with pytest.raises(ValueError):
        dup_ngram_ratio("t", 0)


def test_repetition_stats_keep_flag(spark):
    df = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog today"),
         (2, "buy buy buy buy buy buy buy buy buy now")],
        ["doc_id", "text"])
    out = {r["doc_id"]: r for r in repetition_stats(df, "text").collect()}
    assert out[1]["r_keep"] is True
    assert out[2]["r_keep"] is False
    assert out[2]["r_top_token_ratio"] == pytest.approx(0.9)


# --- PII scan ---------------------------------------------------------------

def test_pii_scan_planted(spark):
    df = spark.createDataFrame(
        [(1, "contact bob@example.com or visit https://ex.org/a?b=1"),
         (2, "server at 10.0.42.7, call +1 (555) 123-4567"),
         (3, "nothing sensitive here at all")],
        ["doc_id", "text"])
    got = {r["doc_id"]: r for r in pii_scan(df, "text").collect()}
    assert got[1]["pii_email"] == 1 and got[1]["pii_url"] == 1
    assert got[1]["pii_any"] is True
    assert got[2]["pii_ipv4"] == 1 and got[2]["pii_phone"] == 1
    assert got[3]["pii_any"] is False
    assert all(got[3][f"pii_{k}"] == 0
               for k in ("email", "url", "ipv4", "phone"))


# --- drift (PSI) ------------------------------------------------------------

def test_psi_identical_distributions_near_zero(spark):
    a = spark.range(0, 4000).select((F.col("id") % 100).alias("x"))
    out = psi_numeric(a, a, ["x"], bins=10).collect()
    assert len(out) == 1
    assert abs(out[0]["psi"]) < 1e-9


def test_psi_shifted_distribution_flagged(spark):
    ref = spark.range(0, 4000).select(
        (F.col("id") % 100).cast("double").alias("x"),
        F.when(F.col("id") % 4 == 0, "a").otherwise("b").alias("c"))
    # heavy right shift + a category that flips proportions
    new = spark.range(0, 4000).select(
        ((F.col("id") % 100) + 80).cast("double").alias("x"),
        F.when(F.col("id") % 4 == 0, "b").otherwise("a").alias("c"))
    rep = {r["column"]: r for r in
           psi_report(ref, new, numeric_cols=["x"],
                      categorical_cols=["c"]).collect()}
    assert rep["x"]["psi"] > 0.25 and rep["x"]["band"] == "shifted"
    assert rep["c"]["psi"] > 0.25 and rep["c"]["band"] == "shifted"


def test_psi_unseen_category_finite(spark):
    ref = spark.range(0, 100).select(F.lit("a").alias("c"))
    new = spark.range(0, 100).select(
        F.when(F.col("id") < 50, "a").otherwise("zz").alias("c"))
    out = psi_categorical(ref, new, ["c"]).collect()
    psi = out[0]["psi"]
    assert 0 < psi < float("inf")


def test_psi_validation(spark):
    a = spark.range(0, 10).select(F.col("id").cast("double").alias("x"))
    with pytest.raises(ValueError):
        psi_numeric(a, a, [], bins=10)
    with pytest.raises(ValueError):
        psi_numeric(a, a, ["x"], bins=1)
    with pytest.raises(ValueError):
        psi_report(a, a)


def test_psi_constant_column(spark):
    a = spark.range(0, 50).select(F.lit(5.0).alias("x"))
    out = psi_numeric(a, a, ["x"]).collect()
    assert abs(out[0]["psi"]) < 1e-12


def test_mixture_sample_proportions_and_binding_source(spark):
    from spark_df_profiling_spark.operators.sampling import mixture_sample
    df = spark.range(0, 3000).select(
        F.col("id").alias("key"),
        F.when(F.col("id") < 2000, "web")
        .when(F.col("id") < 2600, "books").otherwise("code").alias("src"))
    # counts: web 2000, books 600, code 400; weights 0.5/0.25/0.25
    # total = min(2000/.5, 600/.25, 400/.25) = 1600
    # keep: web 800 (40%), books 400 (66.7%), code 400 (ALL - binding)
    out = mixture_sample(df, "src", {"web": 0.5, "books": 0.25,
                                     "code": 0.25}, "key", seed=2)
    got = {r["src"]: r["count"]
           for r in out.groupBy("src").count().collect()}
    assert got["code"] == 400                      # binding source: all
    assert abs(got["web"] - 800) < 120
    assert abs(got["books"] - 400) < 90
    # unlisted sources dropped
    out2 = mixture_sample(df, "src", {"web": 1.0}, "key")
    assert out2.select("src").distinct().collect()[0]["src"] == "web"
    with pytest.raises(ValueError):
        mixture_sample(df, "src", {"web": 0.0}, "key")
    with pytest.raises(ValueError):
        mixture_sample(df, "src", {}, "key")


def test_sample_exact_k_counts_and_determinism(spark):
    from spark_df_profiling_spark.operators.sampling import sample_exact_k
    df = spark.range(0, 900).select(
        F.col("id").alias("key"), (F.col("id") % 3).alias("g"))
    a = sample_exact_k(df, "g", 7, "key", seed=1)
    counts = {r["g"]: r["count"]
              for r in a.groupBy("g").count().collect()}
    assert counts == {0: 7, 1: 7, 2: 7}
    b = sample_exact_k(df, "g", 7, "key", seed=1)
    assert a.exceptAll(b).count() == 0
    # k larger than a stratum keeps the whole stratum
    tiny = df.where(F.col("key") < 5)
    assert sample_exact_k(tiny, "g", 10, "key").count() == 5
    with pytest.raises(ValueError):
        sample_exact_k(df, "g", 0, "key")


def test_sample_exact_k_drops_null_keys(spark):
    # NULL keys have no deterministic rank (both sort keys NULL), so
    # they are excluded from sampling rather than picked arbitrarily
    from spark_df_profiling_spark.operators.sampling import sample_exact_k
    df = spark.range(0, 100).select(
        F.when(F.col("id") < 90, F.col("id")).alias("key"),
        (F.col("id") % 2).alias("g"))
    out = sample_exact_k(df, "g", 3, "key", seed=1)
    assert out.count() == 6
    assert out.where(F.col("key").isNull()).count() == 0


def test_hash_split_null_keys_routing(spark):
    df = spark.range(0, 100).select(
        F.when(F.col("id") < 90, F.col("id")).alias("key"))
    w = {"train": 0.8, "val": 0.1, "test": 0.1}
    # default (documented footgun): NULL keys fall through to the LAST
    # split via the SQL-CASE ELSE branch
    dflt = hash_split(df, "key", w, seed=1)
    assert dflt.where(F.col("key").isNull()
                      & (F.col("split") == "test")).count() == 10
    # opt-in routing keeps the holdout clean
    routed = hash_split(df, "key", w, seed=1, null_split="train")
    assert routed.where(F.col("key").isNull()
                        & (F.col("split") == "train")).count() == 10
    # quarantine label outside the weight map also works
    quar = hash_split(df, "key", w, seed=1, null_split="__unkeyed__")
    assert quar.where(F.col("split") == "__unkeyed__").count() == 10
    # non-null assignment identical in all three
    nn = dflt.where(F.col("key").isNotNull())
    assert nn.exceptAll(routed.where(F.col("key").isNotNull())).count() == 0


def test_vocab_topk_exact_counts(spark):
    from spark_df_profiling_spark.operators.text import vocab_topk
    df = spark.createDataFrame(
        [("a b a",), ("b a c",), ("d b",)], ["text"])
    got = [(r["token"], r["cnt"]) for r in
           vocab_topk(df, "text", k=3).collect()]
    assert got == [("a", 3), ("b", 3), ("c", 1)]   # tie a<b, then c<d
    with pytest.raises(ValueError):
        vocab_topk(df, "text", k=0)


def test_hash_bucket_matches_python_hashlib(spark):
    """Engine-portability proof against a THIRD implementation: the
    md5-bucket arithmetic recomputed with Python hashlib must agree with
    Spark's conv(substr(md5)) for arbitrary keys and seeds (DuckDB
    agreement is covered by the oracle harness)."""
    import hashlib
    import random

    from spark_df_profiling_spark.operators.sampling import (
        BUCKETS, hash_bucket)

    def py_bucket(key, seed):
        h = hashlib.md5(f"{key}:{seed}".encode()).hexdigest()
        return int(h[:15], 16) % BUCKETS

    rng = random.Random(20260813)
    keys = ([rng.randrange(-10**12, 10**12) for _ in range(40)]
            + [0, -1, 1, 10**15])
    df = spark.createDataFrame([(k,) for k in keys], ["key"])
    for seed in (0, 7, 424242):
        got = {r["key"]: r["b"]
               for r in df.select(
                   "key", hash_bucket("key", seed=seed).alias("b"))
               .collect()}
        assert got == {k: py_bucket(k, seed) for k in keys}, seed


def test_windowed_psi_flags_drifted_window(spark):
    from spark_df_profiling_spark.operators.drift import (
        reference_histogram, windowed_psi)
    base = 1_700_000_000  # aligned-ish epoch; exact alignment irrelevant
    rows = []
    for day in range(3):
        for i in range(1000):
            # days 0-1: uniform 0..99; day 2: concentrated 90..99
            v = (90 + i % 10) if day == 2 else i % 100
            rows.append((base + day * 86_400 + (i % 86_000), float(v)))
    df = spark.createDataFrame(rows, "sec long, value double") \
        .select(F.timestamp_seconds("sec").alias("ts_ts"), "value")
    ref = reference_histogram(df.where(
        F.col("ts_ts") < F.timestamp_seconds(F.lit(base + 2 * 86_400))),
        "value", bins=10)
    out = {r["window_start"]: r for r in
           windowed_psi(df, "ts_ts", "value", ref, "1 day").collect()}
    assert len(out) == 3 or len(out) == 4  # day windows (UTC alignment)
    bands = sorted((ws, r["band"]) for ws, r in out.items())
    # the two clean days are stable, the concentrated day is shifted
    assert [b for _, b in bands[:-1]] == ["stable"] * (len(bands) - 1)
    assert bands[-1][1] == "shifted"
    assert out[bands[-1][0]]["psi"] > 0.25
    with pytest.raises(ValueError, match="non-constant"):
        reference_histogram(df.select(F.lit(1.0).alias("c")), "c")


def test_windowed_psi_streaming_equals_batch(spark, sf_dir):
    from spark_df_profiling_spark.operators.drift import (
        reference_histogram, windowed_psi)
    from spark_df_profiling_spark.sources import with_event_time
    from spark_df_profiling_spark.streaming import (
        events_stream, run_stream_to_memory)
    ev = with_event_time(
        spark.read.parquet(f"{sf_dir}/events.parquet"))
    ref = reference_histogram(ev, "value", bins=8)
    batch = {(r["window_start"], round(r["psi"], 9))
             for r in windowed_psi(ev, "ts_ts", "value", ref,
                                   "1 day").collect()}
    stream = events_stream(spark, sf_dir)
    # complete mode: append would withhold the final window (the
    # watermark never passes the max event time on a bounded stream)
    run_stream_to_memory(
        windowed_psi(stream, "ts_ts", "value", ref, "1 day"),
        "winpsi_out", output_mode="complete")
    got = {(r["window_start"], round(r["psi"], 9))
           for r in spark.table("winpsi_out").collect()}
    assert got == batch and len(batch) > 0


def test_psi_null_rate_drift_scored(spark):
    # same non-null distribution, but nulls appear in `new`: invisible
    # by default, scored with include_nulls=True
    ref = spark.range(0, 1000).select(
        F.when(F.col("id") % 2 == 0, "a").otherwise("b").alias("c"))
    # null 25% of rows, drawn EQUALLY from a and b (ids 0,1 mod 8), so
    # the non-null a:b mix stays exactly 1:1 — null-blind PSI sees no
    # drift at all
    new = spark.range(0, 1000).select(
        F.when(F.col("id") % 8 < 2, None)
        .when(F.col("id") % 2 == 0, "a").otherwise("b").alias("c"))
    default = psi_categorical(ref, new, ["c"]).collect()[0]["psi"]
    scored = psi_categorical(ref, new, ["c"],
                             include_nulls=True).collect()[0]["psi"]
    assert default < 0.05          # null-blind: distributions look close
    assert scored > 0.25           # 25% of rows went missing -> flagged


def test_mixture_sample_absent_source_graceful(spark):
    from spark_df_profiling_spark.operators.sampling import mixture_sample
    df = spark.range(0, 100).select(
        F.col("id").alias("key"), F.lit("web").alias("src"))
    # a weighted source absent from the data: feasible total is set by
    # the present sources only
    out = mixture_sample(df, "src", {"web": 0.5, "ghost": 0.5}, "key")
    assert out.count() == 100          # web is binding -> keeps all
    # no weighted source present at all -> empty result, no error
    assert mixture_sample(df, "src", {"ghost": 1.0}, "key").count() == 0


def test_temperature_weights_and_resample(spark):
    from spark_df_profiling_spark.operators.sampling import (
        temperature_resample, temperature_weights)
    import pytest as _pt
    rows = [(f"k{s}_{i}", f"s{s}") for s, n in enumerate([600, 300, 100])
            for i in range(n)]
    df = spark.createDataFrame(rows, "key string, src string")

    # tau=1 keeps the natural distribution: epochs == 1 everywhere and
    # the resample is the identity (every row once, copy index 0)
    w1 = {r["source"]: r for r in
          temperature_weights(df, "src", tau=1.0).collect()}
    for s, n in [("s0", 600), ("s1", 300), ("s2", 100)]:
        assert w1[s]["n_rows"] == n
        assert w1[s]["epochs"] == pytest.approx(1.0)
        assert w1[s]["weight"] == pytest.approx(n / 1000)
    out1 = temperature_resample(df, "src", "key", tau=1.0)
    assert out1.count() == 1000
    assert out1.agg(F.max("epoch_copy")).collect()[0][0] == 0

    # tau=0 forces uniform: the rare source is UPSAMPLED (epochs > 1)
    w0 = {r["source"]: r for r in
          temperature_weights(df, "src", tau=0.0).collect()}
    assert w0["s2"]["epochs"] == pytest.approx(1000 / 3 / 100)
    assert sum(r["weight"] for r in w0.values()) == pytest.approx(1.0)
    out0 = temperature_resample(df, "src", "key", tau=0.0)
    per_src = {r["src"]: r["n"] for r in
               out0.groupBy("src").agg(F.count("*").alias("n")).collect()}
    # each source lands within hash-sampling noise of N/3
    for s in ("s0", "s1", "s2"):
        assert abs(per_src[s] - 1000 / 3) < 40
    # upsampled source really repeats rows, tagged by epoch_copy
    assert (out0.where((F.col("src") == "s2")
                       & (F.col("epoch_copy") >= 1)).count() > 0)

    # determinism: identical multiset across runs
    a = sorted((r["key"], r["epoch_copy"]) for r in out0.collect())
    b = sorted((r["key"], r["epoch_copy"])
               for r in temperature_resample(df, "src", "key",
                                             tau=0.0).collect())
    assert a == b

    # target_rows scales the whole mix
    wt = temperature_weights(df, "src", tau=0.5, target_rows=500)
    assert wt.agg(F.sum("target_n")).collect()[0][0] == \
        pytest.approx(500.0)
    with _pt.raises(ValueError, match="tau"):
        temperature_weights(df, "src", tau=-0.1)


def test_nullable_key_warnings(spark):
    import warnings as W
    from spark_df_profiling_spark.operators.sampling import (
        hash_split, sample_exact_k)
    df = spark.createDataFrame(
        [("a", 1), (None, 2)], "k string, v int")  # k nullable
    with W.catch_warnings(record=True) as rec:
        W.simplefilter("always")
        hash_split(df, "k", {"train": 0.8, "test": 0.2})
        assert any("null_split" in str(w.message) for w in rec)
    with W.catch_warnings(record=True) as rec:
        W.simplefilter("always")
        hash_split(df, "k", {"train": 0.8, "test": 0.2},
                   null_split="train")
        # explicit routing silences the advisory
        assert not any("null_split" in str(w.message) for w in rec)
    with W.catch_warnings(record=True) as rec:
        W.simplefilter("always")
        sample_exact_k(df, "k", 1, "k")
        assert any("excluded from sampling" in str(w.message)
                   for w in rec)
    nn = spark.range(3)  # id is non-nullable by construction
    with W.catch_warnings(record=True) as rec:
        W.simplefilter("always")
        hash_split(nn, "id", {"train": 1.0})
        # non-nullable key -> silent
        assert not any("null_split" in str(w.message) for w in rec)

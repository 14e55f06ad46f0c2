"""Text analysis: features, lang-id, fingerprint, quality."""

import pytest
from pyspark.sql import functions as F

from spark_df_profiling_spark.operators import text as TX


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def test_n_chars_matches_stored(docs):
    r = docs.select(
        F.sum(F.when(TX.n_chars("text") == F.col("n_chars"), 1)
              .otherwise(0)).alias("match"),
        F.count(F.lit(1)).alias("n")).collect()[0]
    # FIXTURES.md: stored n_chars must equal computed length — free oracle
    assert r["match"] == r["n"]


def test_token_counts(spark):
    df = spark.createDataFrame(
        [("hello world foo",), ("a b",), ("x",)], "t string")
    rows = df.select(TX.n_tokens_ws("t").alias("ws"),
                     TX.n_tokens_bpe("t").alias("bpe")).collect()
    assert [r["ws"] for r in rows] == [3, 2, 1]
    assert [r["bpe"] for r in rows] == [3, 2, 1]


def test_bpe_tokenizer_splits_symbols(spark):
    df = spark.createDataFrame([("ab12,cd ef!",)], "t string")
    r = df.select(TX.n_tokens_bpe("t").alias("n")).collect()[0]
    # ab | 12 | , | cd | ef | !  -> 6
    assert r["n"] == 6


def test_ratios(spark):
    df = spark.createDataFrame([("Ab1 c!",)], "t string")
    r = df.select(
        TX.alpha_ratio("t").alias("a"), TX.digit_ratio("t").alias("d"),
        TX.space_ratio("t").alias("s"), TX.upper_ratio("t").alias("u"),
        TX.punct_ratio("t").alias("p")).collect()[0]
    assert r["a"] == pytest.approx(3 / 6)
    assert r["d"] == pytest.approx(1 / 6)
    assert r["s"] == pytest.approx(1 / 6)
    assert r["u"] == pytest.approx(1 / 6)
    assert r["p"] == pytest.approx(1 / 6)


def test_lang_id_constructed_sentences(spark):
    data = [
        ("the cat is on the mat and it is happy", "en"),
        ("der hund ist nicht in das haus und die katze", "de"),
        ("el perro es de la casa que los gatos", "es"),
        ("le chien est dans les maisons pour une fete", "fr"),
        ("这是一个中文句子", "zh"),
        ("zzz qqq www", "und"),
    ]
    df = spark.createDataFrame([(t,) for t, _ in data], "t string")
    got = [r[0] for r in df.select(TX.lang_id("t")).collect()]
    assert got == [lang for _, lang in data]


def test_fingerprint_properties(spark):
    df = spark.createDataFrame(
        [(1, "a b c d e"), (2, "a b c d e"), (3, "totally different words"),
         (4, "ab")], "id long, t string")
    rows = {r["id"]: r["fp"] for r in df.select(
        "id", TX.fingerprint_min_shingle("t").alias("fp")).collect()}
    assert rows[1] == rows[2]            # same text -> same fingerprint
    assert rows[1] != rows[3]            # different text -> different
    assert len(rows[4]) == 32            # short text falls back to md5


def test_rolling_hash_matches_python(spark):
    texts = ["hello world this is a test", "ab", "x" * 40]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "id long, t string")
    rows = {r["id"]: r["rh"] for r in df.select(
        "id", TX.rolling_hash("t").alias("rh")).collect()}

    def rh(s):
        h = 0
        for ch in s:
            h = (h * TX._RH_BASE + ord(ch)) % TX._RH_MOD
        return h

    assert all(rows[i] == rh(t) for i, t in enumerate(texts))


def test_winnow_shared_substring_guarantee(spark):
    # Schleimer et al.: sharing a substring of length >= w+k-1 (= 8 with
    # k=5, w=4) guarantees at least one shared fingerprint.
    common = "the quick brown fox jumps"
    df = spark.createDataFrame(
        [(1, "AAAA " + common + " BBBB"),
         (2, "xyzzy plugh " + common + " grault"),
         (3, "completely unrelated sentence content here")],
        "id long, t string")
    rows = {r["id"]: set(r["fp"]) for r in df.select(
        "id", TX.winnow_fingerprints("t").alias("fp")).collect()}
    assert rows[1] & rows[2]            # shared substring -> shared fp
    assert not (rows[1] & rows[3]) or len(rows[1] & rows[3]) < len(
        rows[1] & rows[2])              # unrelated docs share less


def test_quality_score_bounds(docs):
    r = docs.select(
        F.min(TX.quality_score("text")).alias("mn"),
        F.max(TX.quality_score("text")).alias("mx")).collect()[0]
    assert 0.0 <= r["mn"] <= r["mx"] <= 1.0


def test_text_features_all_columns(docs):
    out = TX.text_features(docs.limit(10), "text")
    expected = {"f_n_chars", "f_n_tokens", "f_n_tokens_bpe",
                "f_alpha_ratio", "f_digit_ratio", "f_space_ratio",
                "f_upper_ratio", "f_punct_ratio", "f_avg_token_len",
                "f_fingerprint", "f_lang", "f_quality"}
    assert expected <= set(out.columns)
    assert out.count() == 10


def test_functions_namespace(spark):
    # public column-function surface: composes like pyspark.sql.functions
    from spark_df_profiling_spark import functions as PF
    df = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog",
          [1.0, 0.0], [0.6, 0.8])],
        "id long, text string, a array<double>, b array<double>")
    row = df.select(
        PF.n_tokens_ws("text").alias("nt"),
        PF.lang_id("text").alias("lang"),
        PF.simhash64("text").alias("sig"),
        PF.content_hash(["text"]).alias("h"),
        PF.cosine(df["a"], df["b"]).alias("cos")).collect()[0]
    assert row["nt"] == 9
    assert row["lang"] == "en"
    assert isinstance(row["sig"], int)
    assert len(row["h"]) == 64
    assert abs(row["cos"] - 0.6) < 1e-12
    assert set(PF.__all__) <= set(dir(PF))


def test_unigram_logprob_matches_python(spark):
    """Exact parity with a Python replication on a tiny corpus, and the
    quality ordering: a doc of corpus-typical tokens outscores one made
    of rare tokens."""
    import math

    from spark_df_profiling_spark.operators.text import unigram_logprob
    rows = [(1, "the cat sat on the mat"),
            (2, "the dog sat on the rug"),
            (3, "zyx qwv jkl")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["doc_id"]: r["lp_mean"]
           for r in unigram_logprob(df, "text", "doc_id").collect()}

    toks = [t for _, s in rows for t in s.split(" ")]
    total = len(toks)
    cnt = {t: toks.count(t) for t in set(toks)}
    exp = {d: sum(math.log(cnt[t] / total) for t in s.split(" "))
           / len(s.split(" "))
           for d, s in rows}
    for d in exp:
        assert got[d] == pytest.approx(exp[d], rel=1e-12)
    assert got[1] > got[3] and got[2] > got[3]

    # vocab truncation: with vocab_size=1 only 'the' stays in-vocab,
    # everything else gets the OOV floor log(0.5/total)
    got1 = {r["doc_id"]: r["lp_mean"]
            for r in unigram_logprob(df, "text", "doc_id",
                                     vocab_size=1).collect()}
    oov = math.log(0.5 / total)
    exp3 = oov                       # doc 3 is all-OOV
    assert got1[3] == pytest.approx(exp3, rel=1e-12)
    with pytest.raises(ValueError):
        unigram_logprob(df, "text", "doc_id", vocab_size=0)


def test_quality_funnel_sequential_semantics(spark):
    from spark_df_profiling_spark.operators.text import quality_funnel
    df = spark.createDataFrame(
        [(1, "a b c d e"), (2, "a a a a a"), (3, "x"), (4, None)],
        "doc_id long, text string")
    toks = F.split(F.col("text"), " ")
    out = {r["rule"]: r for r in quality_funnel(df, [
        ("min_tokens", F.size(toks) >= 3),
        ("diverse", F.size(F.array_distinct(toks)) >= 3),
    ]).collect()}
    # rule 1 sees all 4 docs; NULL text fails the keep predicate
    assert out["min_tokens"]["n_evaluated"] == 4
    assert out["min_tokens"]["n_surviving"] == 2   # docs 1 and 2
    assert out["min_tokens"]["n_dropped"] == 2     # doc 3 (short) + NULL
    # rule 2 only sees rule-1 survivors (sequential, not independent)
    assert out["diverse"]["n_evaluated"] == 2
    assert out["diverse"]["n_surviving"] == 1      # doc 2 is 'a'*5
    import pytest as _pt
    with _pt.raises(ValueError, match="non-empty"):
        quality_funnel(df, [])
    with _pt.raises(ValueError, match="duplicate"):
        quality_funnel(df, [("r", toks.isNotNull()),
                            ("r", toks.isNotNull())])


def test_quality_funnel_single_job(spark):
    from spark_df_profiling_spark.operators.text import quality_funnel
    df = spark.range(100).withColumn("text", F.lit("w x y z"))
    toks = F.split(F.col("text"), " ")
    tracker = spark.sparkContext.statusTracker()
    before = len(tracker.getJobIdsForGroup(None) or [])
    sc = spark.sparkContext
    sc.setJobGroup("funnel_test", "funnel")
    quality_funnel(df, [(f"r{i}", F.size(toks) >= i)
                        for i in range(8)]).collect()
    jobs = tracker.getJobIdsForGroup("funnel_test")
    # 8 rules, ONE aggregation job (plus at most an AQE finalization)
    assert len(jobs) <= 2

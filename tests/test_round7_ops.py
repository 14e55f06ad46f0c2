"""Round-7 session-2 operators: chunking, TF-IDF, DSIR weights,
Bloom dedup state, stream-stream interval join."""

import math

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


# --- chunk_documents -------------------------------------------------------
def _py_chunks(text, ct, ov):
    toks = text.split(" ")
    st = ct - ov
    n = len(toks)
    nc = 1 if n <= ct else math.floor((n - ct + st - 1) / st) + 1
    return [" ".join(toks[i * st:i * st + ct]) for i in range(nc)]


def test_chunk_documents_matches_python_reference(spark, docs):
    from spark_df_profiling_spark.operators.text import chunk_documents
    d = docs.where(F.col("doc_id") < 40)
    got = {(r.doc_id, r.chunk_id): r.chunk_text
           for r in chunk_documents(d, "text", "doc_id",
                                    chunk_tokens=64, overlap=16).collect()}
    exp = {}
    for r in d.select("doc_id", "text").collect():
        for i, c in enumerate(_py_chunks(r.text, 64, 16)):
            exp[(r.doc_id, i)] = c
    assert got == exp


def test_chunk_documents_overlap_and_coverage(spark, docs):
    """Consecutive chunks overlap by exactly `overlap` tokens and
    concatenating de-overlapped chunks reconstructs the document."""
    from spark_df_profiling_spark.operators.text import chunk_documents
    d = docs.where(F.col("doc_id") < 10)
    rows = (chunk_documents(d, "text", "doc_id",
                            chunk_tokens=32, overlap=8)
            .orderBy("doc_id", "chunk_id").collect())
    texts = {r.doc_id: r.text for r in d.collect()}
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r.chunk_text)
    for doc_id, chunks in by_doc.items():
        toks = []
        for i, c in enumerate(chunks):
            ctoks = c.split(" ")
            if i == 0:
                toks.extend(ctoks)
            else:
                # overlap region must agree with what we already have
                assert toks[len(toks) - 8:] == ctoks[:8]
                toks.extend(ctoks[8:])
        assert " ".join(toks) == texts[doc_id]


def test_chunk_documents_short_doc_single_chunk(spark):
    from spark_df_profiling_spark.operators.text import chunk_documents
    d = spark.createDataFrame([(1, "a b c")], "id long, text string")
    rows = chunk_documents(d, "text", "id",
                           chunk_tokens=64, overlap=16).collect()
    assert len(rows) == 1
    assert rows[0].chunk_text == "a b c"
    assert rows[0].chunk_n_tokens == 3


def test_chunk_documents_rejects_bad_params(spark):
    from spark_df_profiling_spark.operators.text import chunk_documents
    d = spark.createDataFrame([(1, "a")], "id long, text string")
    with pytest.raises(ValueError):
        chunk_documents(d, "text", "id", chunk_tokens=0)
    with pytest.raises(ValueError):
        chunk_documents(d, "text", "id", chunk_tokens=8, overlap=8)


# --- tfidf -----------------------------------------------------------------
def test_tfidf_topk_matches_python_reference(spark, docs):
    from spark_df_profiling_spark.operators.text import tfidf_topk
    d = docs.where(F.col("doc_id") < 30)
    got = [(r.doc_id, r.rank, r.token, r.tf, r.df)
           for r in tfidf_topk(d, "text", "doc_id", k=3)
           .orderBy("doc_id", "rank").collect()]

    data = d.select("doc_id", "text").collect()
    n_docs = len(data)
    tf, dfreq = {}, {}
    for r in data:
        seen = {}
        for t in r.text.split(" "):
            seen[t] = seen.get(t, 0) + 1
        for t, c in seen.items():
            tf[(r.doc_id, t)] = c
            dfreq[t] = dfreq.get(t, 0) + 1
    exp = []
    for r in data:
        scored = sorted(
            ((tf[(r.doc_id, t)]
              * (math.log((n_docs + 1) / (dfreq[t] + 1)) + 1), t)
             for t in set(r.text.split(" "))),
            key=lambda x: (-x[0], x[1]))
        for rank, (s, t) in enumerate(scored[:3], 1):
            exp.append((r.doc_id, rank, t, tf[(r.doc_id, t)], dfreq[t]))
    assert got == sorted(exp)


def test_tfidf_rare_term_outranks_common_at_equal_tf(spark):
    from spark_df_profiling_spark.operators.text import tfidf_topk
    d = spark.createDataFrame(
        [(1, "common rare"), (2, "common x"), (3, "common y")],
        "id long, text string")
    top = (tfidf_topk(d, "text", "id", k=1)
           .where(F.col("id") == 1).collect())
    assert top[0].token == "rare"


# --- DSIR ------------------------------------------------------------------
def test_dsir_logweights_match_python(spark, docs):
    import hashlib
    from spark_df_profiling_spark.operators.sampling import dsir_logweights
    target = docs.where(F.col("lang") == "en")
    got = {r.doc_id: r.log_w
           for r in dsir_logweights(docs, target, "text", "doc_id",
                                    n_buckets=1000).collect()}

    def bucket(tok, B=1000):
        return int(hashlib.md5(f"{tok}:0".encode())
                   .hexdigest()[:15], 16) % B

    raw, tgt = {}, {}
    rtot = ttot = 0
    data = docs.select("doc_id", "text", "lang").collect()
    for r in data:
        for t in r.text.split(" "):
            b = bucket(t)
            raw[b] = raw.get(b, 0) + 1
            rtot += 1
            if r.lang == "en":
                tgt[b] = tgt.get(b, 0) + 1
                ttot += 1
    B, a = 1000, 1.0
    for r in data:
        lw = sum(
            math.log((tgt.get(bucket(t), 0) + a) / (ttot + a * B))
            - math.log((raw.get(bucket(t), 0) + a) / (rtot + a * B))
            for t in r.text.split(" "))
        assert got[r.doc_id] == pytest.approx(lw, rel=1e-9)


def test_dsir_target_docs_score_higher(spark, docs):
    """Documents FROM the target domain must average a higher
    importance weight than the rest — the selection signal DSIR
    exists to produce."""
    from spark_df_profiling_spark.operators.sampling import dsir_logweights
    target = docs.where(F.col("lang") == "en")
    w = dsir_logweights(docs, target, "text", "doc_id", n_buckets=1000)
    joined = w.join(docs.select("doc_id", "lang"), "doc_id")
    means = {r.grp: r.m for r in
             (joined.groupBy((F.col("lang") == "en").alias("grp"))
              .agg(F.avg(F.col("log_w") / F.col("n_tokens")).alias("m"))
              .collect())}
    assert means[True] > means[False]


# --- Bloom dedup state -----------------------------------------------------
def test_bloom_no_false_negatives_and_bounded_fp(spark, docs):
    from spark_df_profiling_spark.operators.dedup import (
        bloom_might_contain, bloom_state)
    day1 = docs.where(F.col("doc_id") < 300)
    day2 = docs.where(F.col("doc_id") >= 200)
    m, k = 1 << 14, 5
    st = bloom_state(day1, "text", m_bits=m, k=k)
    res = {r.doc_id: r.might_contain
           for r in bloom_might_contain(day2, st, "text",
                                        m_bits=m, k=k).collect()}
    seen = set(r.text for r in day1.select("text").collect())
    d2 = {r.doc_id: r.text for r in day2.select("doc_id", "text").collect()}
    false_neg = [i for i, t in d2.items() if t in seen and not res[i]]
    assert false_neg == []  # Bloom guarantee: no false negatives, ever
    novel = [i for i, t in d2.items() if t not in seen]
    fp = sum(1 for i in novel if res[i])
    # m/n ≈ 54 bits/doc here — fpp is astronomically small; allow 2%
    assert fp <= max(1, len(novel) // 50)


def test_bloom_state_is_sparse_and_mergeable(spark, docs):
    from spark_df_profiling_spark.operators.dedup import bloom_state
    m, k = 1 << 14, 5
    a = bloom_state(docs.where(F.col("doc_id") < 100), "text",
                    m_bits=m, k=k)
    b = bloom_state(docs.where((F.col("doc_id") >= 100)
                               & (F.col("doc_id") < 200)), "text",
                    m_bits=m, k=k)
    merged = (a.unionByName(b).groupBy("word_idx")
              .agg(F.expr("bit_or(bits)").alias("bits")))
    direct = bloom_state(docs.where(F.col("doc_id") < 200), "text",
                         m_bits=m, k=k)
    assert (sorted((r.word_idx, r.bits) for r in merged.collect())
            == sorted((r.word_idx, r.bits) for r in direct.collect()))
    assert direct.count() <= m // 64


# --- stream-stream interval join ------------------------------------------
def test_stream_stream_join_matches_batch(spark, sf_dir):
    import spark_df_profiling_spark.streaming as ST
    from spark_df_profiling_spark.sources import with_event_time

    batch = with_event_time(spark.read.parquet(f"{sf_dir}/events.parquet"))
    bl = (batch.where(F.col("event_type") == "view")
          .select("user_id", "event_id", "ts_ts"))
    br = (batch.where(F.col("event_type") == "purchase")
          .select("user_id", "event_id", "ts_ts", "value"))
    bj = ST.stream_stream_interval_join(bl, br, "user_id",
                                        max_delay="1 day")
    expected = set((r.event_id, r.event_id_r) for r in bj.collect())
    assert expected  # non-degenerate fixture

    sl = (ST.events_stream(spark, sf_dir)
          .where(F.col("event_type") == "view")
          .select("user_id", "event_id", "ts_ts"))
    sr = (ST.events_stream(spark, sf_dir)
          .where(F.col("event_type") == "purchase")
          .select("user_id", "event_id", "ts_ts", "value"))
    sj = ST.stream_stream_interval_join(sl, sr, "user_id",
                                        max_delay="1 day")
    ST.run_stream_to_memory(sj, "t_ssj", output_mode="append")
    got = set((r.event_id, r.event_id_r)
              for r in spark.table("t_ssj").collect())
    assert got == expected


def test_stream_stream_join_respects_interval_bound(spark, sf_dir):
    """No matched pair may violate [left_ts, left_ts + max_delay]."""
    import spark_df_profiling_spark.streaming as ST
    from spark_df_profiling_spark.sources import with_event_time
    batch = with_event_time(spark.read.parquet(f"{sf_dir}/events.parquet"))
    bl = (batch.where(F.col("event_type") == "view")
          .select("user_id", "event_id", "ts_ts"))
    br = (batch.where(F.col("event_type") == "purchase")
          .select("user_id", "event_id", "ts_ts"))
    rows = ST.stream_stream_interval_join(
        bl, br, "user_id", max_delay="1 hour").collect()
    for r in rows:
        delta = (r.ts_ts_r - r.ts_ts).total_seconds()
        assert 0 <= delta <= 3600


# --- column entropy --------------------------------------------------------
def test_column_entropy_matches_python(spark, docs):
    import math
    from spark_df_profiling_spark.operators.frequency import column_entropy
    got = {r.col_name: r for r in
           column_entropy(docs, ["lang", "source"]).collect()}
    for col in ("lang", "source"):
        vals = [r[col] for r in docs.select(col).collect()
                if r[col] is not None]
        counts = {}
        for v in vals:
            counts[v] = counts.get(v, 0) + 1
        n = len(vals)
        h = -sum((c / n) * math.log2(c / n) for c in counts.values())
        r = got[col]
        assert r.n == n and r.n_distinct == len(counts)
        assert r.entropy == pytest.approx(h, rel=1e-12)
        assert r.norm_entropy == pytest.approx(
            h / math.log2(len(counts)), rel=1e-12)


def test_column_entropy_constant_and_uniform(spark):
    from spark_df_profiling_spark.operators.frequency import column_entropy
    d = spark.createDataFrame(
        [("x", "a"), ("x", "b"), ("x", "c"), ("x", "d")],
        "const string, uni string")
    got = {r.col_name: r for r in
           column_entropy(d, ["const", "uni"]).collect()}
    assert got["const"].entropy == pytest.approx(0.0)
    assert got["const"].norm_entropy is None  # log(1)=0 guard
    assert got["uni"].entropy == pytest.approx(2.0)   # 4 even values
    assert got["uni"].norm_entropy == pytest.approx(1.0)


def test_column_entropy_single_shuffle_plan(spark, docs):
    """All columns ride ONE stack+groupBy — the plan contains exactly
    one wide-table Exchange below the per-column fold (plus the tiny
    col_name-keyed final agg)."""
    from spark_df_profiling_spark.operators.frequency import column_entropy
    e = column_entropy(docs, ["lang", "source"])
    plan = e._jdf.queryExecution().executedPlan().toString()
    # no per-column scan fan-out: one FileScan of documents
    assert plan.count("FileScan") <= 1 or \
        plan.count("Scan parquet") <= 1


# --- plan shape: new operators stay shuffle-lean --------------------------
def test_chunk_documents_plan_has_no_exchange(spark, docs):
    from spark_df_profiling_spark.operators.text import chunk_documents
    ch = chunk_documents(docs, "text", "doc_id")
    plan = ch._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # pure per-row: generate + project


def test_dsir_ratio_join_is_broadcast(spark, docs):
    from spark_df_profiling_spark.operators.sampling import dsir_logweights
    w = dsir_logweights(docs, docs.where(F.col("lang") == "en"),
                        "text", "doc_id", n_buckets=100)
    plan = w._jdf.queryExecution().executedPlan().toString()
    # the token->log-ratio lookup (the row-scale join) must broadcast;
    # the raw<->target bucket-table full-outer may SMJ — both sides are
    # bounded by n_buckets rows, so that join never sees corpus scale
    assert "BroadcastHashJoin" in plan


def test_bloom_probe_broadcasts_state(spark, docs):
    from spark_df_profiling_spark.operators.dedup import (
        bloom_might_contain, bloom_state)
    st = bloom_state(docs.limit(100), ["text"], m_bits=1 << 12, k=3)
    res = bloom_might_contain(docs, st, ["text"], m_bits=1 << 12, k=3)
    plan = res._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan

"""Multimodal binary plumbing + Structured Streaming profile."""

import hashlib

import pytest
from pyspark.sql import functions as F

from spark_df_profiling_spark.operators import multimodal as MM
from spark_df_profiling_spark import sources as SRC
from spark_df_profiling_spark import streaming as ST


@pytest.fixture(scope="module")
def media(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .where(F.col("doc_id") < 50)
    return MM.attach_binary_payload(docs, "text", "doc_id")


def test_media_schema(media):
    assert [f.name for f in media.schema.fields] == \
        ["media_id", "payload", "meta"]
    assert media.schema["payload"].dataType.simpleString() == "binary"


def test_extract_features_arrow_roundtrip(spark, sf_dir, media):
    feats = {r["media_id"]: r for r in MM.extract_features(media).collect()}
    docs = {r["doc_id"]: r["text"] for r in
            spark.read.parquet(f"{sf_dir}/documents.parquet")
            .where(F.col("doc_id") < 50).collect()}
    assert len(feats) == len(docs)
    for did, text in docs.items():
        b = text.encode("utf-8")
        assert feats[did]["n_bytes"] == len(b)
        assert feats[did]["sha256_hex"] == hashlib.sha256(b).hexdigest()
        assert feats[did]["first_byte"] == b[0]


def test_decode_stub_raises(media):
    # NotImplementedError is raised executor-side, so it surfaces wrapped
    # in PySpark's PythonException — match on the message.
    with pytest.raises(Exception, match="PIL"):
        MM.resize_images(media, 64, 64).collect()


def test_streaming_profile_matches_batch(spark, sf_dir):
    # True Structured Streaming (availableNow) must equal the identical
    # batch aggregation — same unresolved plan, same results.
    stream = ST.events_stream(spark, sf_dir)
    prof = ST.windowed_profile(stream, "ts_ts", "value", "1 day",
                               watermark="1 hour", group_col="event_type")
    ST.run_stream_to_memory(prof, "t_stream_out")
    got = {(r["window_start"], r["event_type"]): (r["cnt"], r["mean"])
           for r in spark.table("t_stream_out").collect()}

    ev = SRC.load_events(spark, sf_dir)
    batch = ST.windowed_profile(ev, "ts_ts", "value", "1 day",
                                group_col="event_type")
    want = {(r["window_start"], r["event_type"]): (r["cnt"], r["mean"])
            for r in batch.collect()}
    assert set(got) == set(want)
    for k in want:
        assert got[k][0] == want[k][0]
        assert got[k][1] == pytest.approx(want[k][1], rel=1e-9)


def test_session_profile_batch_matches_python(spark, sf_dir):
    from spark_df_profiling_spark.streaming import session_profile
    ev = SRC.load_events(spark, sf_dir)
    got = {(r["user_id"]): 0 for r in ev.select("user_id").distinct().collect()}
    sess = session_profile(ev, "ts_ts", "user_id", gap="1 hour")
    for r in sess.groupBy("user_id").count().collect():
        got[r["user_id"]] = r["count"]
    # python reference: gaps-and-islands per user (micros via the same
    # dtype-adaptive helper the engine uses)
    rows = ev.select("user_id",
                     SRC.event_time_micros(ev).alias("tus")).collect()
    per_user = {}
    for r in rows:
        per_user.setdefault(r["user_id"], []).append(r["tus"])
    gap_us = 3600 * 1000000
    for uid, ts_list in per_user.items():
        ts_list.sort()
        n_sessions = 1 + sum(
            1 for a, b in zip(ts_list, ts_list[1:]) if b - a >= gap_us)
        assert got[uid] == n_sessions, f"user {uid}"


def test_stateful_totals_match_batch(spark, sf_dir):
    from spark_df_profiling_spark.streaming import (
        events_stream, run_stream_to_memory, stateful_user_totals)
    import pyspark.sql.functions as FN
    stream = events_stream(spark, sf_dir)
    totals = stateful_user_totals(stream, "user_id", "value")
    run_stream_to_memory(totals, "t_stateful_out", output_mode="update")
    got = {r["key"]: (r["total_events"], r["total_value"])
           for r in spark.table("t_stateful_out")
           .groupBy("key")
           .agg(FN.max("total_events").alias("total_events"),
                FN.max("total_value").alias("total_value")).collect()}
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    want = {r["user_id"]: (r["c"], r["s"])
            for r in ev.groupBy("user_id")
            .agg(FN.count(FN.lit(1)).alias("c"),
                 FN.sum("value").alias("s")).collect()}
    assert set(got) == set(want)
    for k in want:
        assert got[k][0] == want[k][0]
        assert got[k][1] == pytest.approx(want[k][1], rel=1e-9)


def test_describe_rejects_streaming_input(spark, sf_dir):
    from spark_df_profiling_spark import describe
    from spark_df_profiling_spark.streaming import events_stream
    with pytest.raises(ValueError, match="windowed_profile"):
        describe(events_stream(spark, sf_dir))

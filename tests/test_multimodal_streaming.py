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


def test_sniff_meta_extracts_real_dimensions(spark):
    # planted payloads: a real PNG rendered by the in-repo PNG writer
    # (deterministic), a hand-built minimal JPEG/GIF, junk, and NULL
    from spark_df_profiling_spark.operators.multimodal import (
        sniff_image_meta, sniff_meta)
    from spark_df_profiling_spark.report.png_hist import render_png

    png = render_png([1, 2, 3])  # 3 bars*14px + 2 gaps*2px = 46 x 60
    jpeg = (b"\xff\xd8"                                   # SOI
            + b"\xff\xe0" + (16).to_bytes(2, "big")       # APP0
            + b"JFIF\x00" + bytes(9)
            + b"\xff\xc0" + (17).to_bytes(2, "big")       # SOF0
            + b"\x08" + (64).to_bytes(2, "big")           # height
            + (48).to_bytes(2, "big")                     # width
            + b"\x03" + bytes(9)
            + b"\xff\xd9")                                # EOI
    gif = (b"GIF89a" + (12).to_bytes(2, "little")
           + (34).to_bytes(2, "little") + bytes(4))
    junk = b"hello world, not an image"

    # pure-python sniffer first (unit level)
    assert sniff_image_meta(png) == ("image/png", 46, 60)
    assert sniff_image_meta(jpeg) == ("image/jpeg", 48, 64)
    assert sniff_image_meta(gif) == ("image/gif", 12, 34)
    assert sniff_image_meta(junk) == (None, None, None)
    assert sniff_image_meta(None) == (None, None, None)

    # then through the Arrow mapInPandas plumbing
    df = spark.createDataFrame(
        [(1, bytearray(png)), (2, bytearray(jpeg)), (3, bytearray(gif)),
         (4, bytearray(junk)), (5, None)],
        "media_id long, payload binary")
    rows = {r["media_id"]: r for r in sniff_meta(df).collect()}
    assert (rows[1]["mime"], rows[1]["width"], rows[1]["height"]) == \
        ("image/png", 46, 60)
    assert (rows[2]["mime"], rows[2]["width"], rows[2]["height"]) == \
        ("image/jpeg", 48, 64)
    assert (rows[3]["mime"], rows[3]["width"], rows[3]["height"]) == \
        ("image/gif", 12, 34)
    assert rows[4]["mime"] is None and rows[4]["width"] is None
    assert rows[5]["mime"] is None and rows[5]["n_bytes"] is None
    assert rows[1]["n_bytes"] == len(png)


def test_sniff_meta_truncated_headers_do_not_crash(spark):
    from spark_df_profiling_spark.operators.multimodal import (
        sniff_image_meta)
    from spark_df_profiling_spark.report.png_hist import render_png
    png = render_png([5])
    for cut in (0, 1, 7, 8, 12, 20, 23):
        mime, w, h = sniff_image_meta(png[:cut])
        assert w is None and h is None
    # JPEG with SOF length lying beyond the buffer
    bad = b"\xff\xd8\xff\xc0" + (9999).to_bytes(2, "big") + bytes(4)
    assert sniff_image_meta(bad) == ("image/jpeg", None, None)


def test_streaming_dedup_drops_redeliveries(spark, sf_dir, tmp_path):
    import os
    from spark_df_profiling_spark.sources import with_event_time
    from spark_df_profiling_spark.streaming import (
        run_stream_to_memory, streaming_dedup)
    # build an at-least-once ingest: the events file delivered TWICE
    src = spark.read.parquet(f"{sf_dir}/events.parquet").limit(200)
    dup_dir = str(tmp_path / "dup_events")
    src.write.mode("overwrite").parquet(os.path.join(dup_dir, "a.parquet"))
    src.write.mode("append").parquet(os.path.join(dup_dir, "a.parquet"))
    static = spark.read.parquet(os.path.join(dup_dir, "a.parquet"))
    assert static.count() == 400  # duplicates really present
    stream = (spark.readStream.schema(static.schema)
              .option("maxFilesPerTrigger", 1)
              .parquet(os.path.join(dup_dir, "a.parquet")))
    deduped = streaming_dedup(with_event_time(stream), ["event_id"])
    run_stream_to_memory(deduped, "t_dedup_out", output_mode="append")
    got = spark.sql("SELECT count(*) AS n, count(DISTINCT event_id) AS d "
                    "FROM t_dedup_out").collect()[0]
    want = static.select("event_id").distinct().count()
    assert got["n"] == got["d"] == want
    # batch path: same call site, plain dropDuplicates
    batch = streaming_dedup(with_event_time(static), ["event_id"])
    assert batch.count() == want


def test_sniff_image_meta_webp_tiff_avif():
    """r13: the remaining common web-crawl formats sniff real dims
    from constructed headers (all three WebP variants, both TIFF byte
    orders, AVIF ispe) and truncated/garbage variants stay NULL-safe."""
    from spark_df_profiling_spark.operators.multimodal import (
        sniff_image_meta)

    def webp_vp8x(w, h):
        p = (b"VP8X" + (10).to_bytes(4, "little") + b"\x00" * 4
             + (w - 1).to_bytes(3, "little")
             + (h - 1).to_bytes(3, "little"))
        return (b"RIFF" + (len(p) + 4).to_bytes(4, "little")
                + b"WEBP" + p)

    def webp_vp8(w, h):
        fr = (b"\x00" * 3 + b"\x9d\x01\x2a"
              + w.to_bytes(2, "little") + h.to_bytes(2, "little"))
        p = b"VP8 " + len(fr).to_bytes(4, "little") + fr
        return (b"RIFF" + (len(p) + 4).to_bytes(4, "little")
                + b"WEBP" + p)

    def webp_vp8l(w, h):
        bits = (w - 1) | ((h - 1) << 14)
        st = b"\x2f" + bits.to_bytes(4, "little")
        p = b"VP8L" + len(st).to_bytes(4, "little") + st
        return (b"RIFF" + (len(p) + 4).to_bytes(4, "little")
                + b"WEBP" + p)

    def tiff(order, w, h):
        if order == "little":
            hdr = b"II*\x00" + (8).to_bytes(4, order)
        else:
            hdr = b"MM\x00*" + (8).to_bytes(4, order)
        n = (2).to_bytes(2, order)
        e1 = ((256).to_bytes(2, order) + (4).to_bytes(2, order)
              + (1).to_bytes(4, order) + w.to_bytes(4, order))
        pad = h.to_bytes(2, order)
        e2 = ((257).to_bytes(2, order) + (3).to_bytes(2, order)
              + (1).to_bytes(4, order) + pad + b"\x00\x00")
        return hdr + n + e1 + e2 + b"\x00" * 4

    def avif(w, h):
        ftyp = (16).to_bytes(4, "big") + b"ftypavif" + b"\x00" * 4
        ispe = ((20).to_bytes(4, "big") + b"ispe" + b"\x00" * 4
                + w.to_bytes(4, "big") + h.to_bytes(4, "big"))
        return ftyp + ispe

    assert sniff_image_meta(webp_vp8x(640, 480)) == \
        ("image/webp", 640, 480)
    assert sniff_image_meta(webp_vp8(320, 240)) == \
        ("image/webp", 320, 240)
    assert sniff_image_meta(webp_vp8l(100, 50)) == \
        ("image/webp", 100, 50)
    assert sniff_image_meta(tiff("little", 800, 600)) == \
        ("image/tiff", 800, 600)
    assert sniff_image_meta(tiff("big", 123, 77)) == \
        ("image/tiff", 123, 77)
    assert sniff_image_meta(avif(1920, 1080)) == \
        ("image/avif", 1920, 1080)
    # unknown chunk tag / truncation: mime sticks, dims go NULL
    assert sniff_image_meta(b"RIFF\x10\x00\x00\x00WEBPXXXX") == \
        ("image/webp", None, None)
    assert sniff_image_meta(webp_vp8x(640, 480)[:20]) == \
        ("image/webp", None, None)
    assert sniff_image_meta(tiff("little", 800, 600)[:9]) == \
        ("image/tiff", None, None)
    assert sniff_image_meta(avif(1920, 1080)[:24]) == \
        ("image/avif", None, None)

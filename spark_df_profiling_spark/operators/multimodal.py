"""Multimodal (binary) column plumbing.

Design per the north star: image/audio/video payloads are opaque
``binary`` columns with a typed metadata struct alongside.  The
Spark-side machinery — schema, Arrow batch shape, ``mapInPandas``
signature, partition sizing — is real and tested; metadata extraction
(``mime``/``width``/``height``) is REAL for PNG/JPEG/GIF via stdlib
magic-byte parsing (:func:`sniff_image_meta` / :func:`sniff_meta` — no
image library required); full pixel decoders (PIL/ffmpeg/etc. are not
in this container) are STUBBED behind ``try``-imports and a clearly
marked ``NotImplementedError`` path, with a deterministic feature
extractor as the testable fake.

Scale notes: ``mapInPandas`` streams Arrow record batches through one
Python worker per core — payload bytes never materialize on the driver;
``spark.sql.execution.arrow.maxRecordsPerBatch`` bounds batch memory for
fat binary rows (set ~256 for multi-MB payloads).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("payload", T.BinaryType(), True),
    T.StructField("meta", T.StructType([
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]), True),
])

FEATURE_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("n_bytes", T.LongType(), True),
    T.StructField("sha256_hex", T.StringType(), True),
    T.StructField("first_byte", T.IntegerType(), True),
])


def attach_binary_payload(df: DataFrame, text_col: str,
                          id_col: str) -> DataFrame:
    """Build a media-shaped DataFrame from a text table (test plumbing:
    UTF-8 bytes stand in for image payloads)."""
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.struct(
            F.lit("text/plain").alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
        ).alias("meta"))


def extract_features(df: DataFrame,
                     batch_size: int = 1024) -> DataFrame:
    """Deterministic per-payload features via ``mapInPandas``.

    The fake 'decode': byte length, SHA-256 hex, first byte — exercises
    the full Arrow round trip (binary in, typed features out) that a real
    image decoder would use.
    """
    spark = df.sparkSession
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch",
                   str(batch_size))

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "n_bytes": payloads.map(
                    lambda b: len(b) if b is not None else None),
                "sha256_hex": payloads.map(
                    lambda b: hashlib.sha256(b).hexdigest()
                    if b is not None else None),
                "first_byte": payloads.map(
                    lambda b: b[0] if b else None),
            })

    return df.select("media_id", "payload").mapInPandas(
        compute, schema=FEATURE_SCHEMA)


_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"

#: markers that start a JPEG Start-Of-Frame segment (dimensions live
#: there); C4/C8/CC are huffman/arithmetic/extension tables, not frames
_JPEG_SOF = {m for m in range(0xC0, 0xD0)} - {0xC4, 0xC8, 0xCC}


def _jpeg_dims(b: bytes) -> "tuple[int, int] | None":
    """(width, height) from the first SOFn segment, or None.

    Standard segment walk: 0xFF <marker> <2-byte big-endian length>.
    Pure stdlib, bounded by payload length — safe inside an Arrow batch.
    """
    i, n = 2, len(b)
    while i + 9 < n:
        if b[i] != 0xFF:
            return None
        marker = b[i + 1]
        if marker == 0xFF:  # fill byte
            i += 1
            continue
        if marker in (0x01, 0xD8) or 0xD0 <= marker <= 0xD7:
            i += 2  # standalone markers carry no length
            continue
        if marker == 0xD9:  # EOI before any SOF
            return None
        seg_len = int.from_bytes(b[i + 2:i + 4], "big")
        if seg_len < 2:
            return None
        if marker in _JPEG_SOF:
            # SOF payload: [precision:1][height:2][width:2]...
            h = int.from_bytes(b[i + 5:i + 7], "big")
            w = int.from_bytes(b[i + 7:i + 9], "big")
            return (w, h)
        i += 2 + seg_len
    return None


def _webp_dims(b: bytes) -> "tuple[int | None, int | None]":
    """(width, height) from a WebP payload's first chunk, or NULLs.

    Covers the three container variants (RFC 9649 / VP8 spec):
    ``VP8X`` (extended: 24-bit LE canvas minus-one fields), ``VP8 ``
    (lossy: 14-bit LE dims after the 0x9d012a start code), ``VP8L``
    (lossless: packed 14-bit minus-one dims after the 0x2f signature).
    """
    tag = b[12:16]
    if tag == b"VP8X" and len(b) >= 30:
        return (int.from_bytes(b[24:27], "little") + 1,
                int.from_bytes(b[27:30], "little") + 1)
    if tag == b"VP8 " and len(b) >= 30 \
            and b[23:26] == b"\x9d\x01\x2a":
        return (int.from_bytes(b[26:28], "little") & 0x3FFF,
                int.from_bytes(b[28:30], "little") & 0x3FFF)
    if tag == b"VP8L" and len(b) >= 25 and b[20] == 0x2F:
        bits = int.from_bytes(b[21:25], "little")
        return ((bits & 0x3FFF) + 1, ((bits >> 14) & 0x3FFF) + 1)
    return (None, None)


def _tiff_dims(b: bytes) -> "tuple[int | None, int | None]":
    """(width, height) from the first TIFF IFD, or NULLs.

    Standard IFD walk: entry count then 12-byte entries ``(tag, type,
    count, value)``; tags 256/257 with inline SHORT(3)/LONG(4) values.
    Bounded by payload length and the declared entry count.
    """
    order = "little" if b[:2] == b"II" else "big"
    off = int.from_bytes(b[4:8], order)
    if off + 2 > len(b):
        return (None, None)
    n = int.from_bytes(b[off:off + 2], order)
    w = h = None
    for i in range(min(n, 512)):
        e = off + 2 + 12 * i
        if e + 12 > len(b):
            break
        tag = int.from_bytes(b[e:e + 2], order)
        typ = int.from_bytes(b[e + 2:e + 4], order)
        if tag in (256, 257) and typ in (3, 4):
            size = 2 if typ == 3 else 4
            val = int.from_bytes(b[e + 8:e + 8 + size], order)
            if tag == 256:
                w = val
            else:
                h = val
    return (w, h)


def _avif_dims(b: bytes) -> "tuple[int | None, int | None]":
    """(width, height) from the ``ispe`` spatial-extents property box.

    A bounded scan for the box type, where each candidate hit is
    validated as a real ISO-BMFF FullBox before being trusted: the 4
    bytes preceding the tag must decode to the exact ispe box size
    (20 = size + type + version/flags + two 32-bit BE extents) and the
    version/flags word at tag+4 must be 0 (ispe is defined only at
    version 0).  A stray ``ispe`` byte sequence inside an EXIF blob or
    mdat payload fails both checks and the scan continues to the next
    candidate instead of returning garbage extents.
    """
    idx = b.find(b"ispe", 4, 65536)
    while idx >= 0:
        if (idx + 16 <= len(b)
                and int.from_bytes(b[idx - 4:idx], "big") == 20
                and int.from_bytes(b[idx + 4:idx + 8], "big") == 0):
            return (int.from_bytes(b[idx + 8:idx + 12], "big"),
                    int.from_bytes(b[idx + 12:idx + 16], "big"))
        idx = b.find(b"ispe", idx + 4, 65536)
    return (None, None)


def sniff_image_meta(payload: "bytes | None"
                     ) -> "tuple[str | None, int | None, int | None]":
    """(mime, width, height) from magic bytes — pure stdlib, no decoder.

    Covers PNG (IHDR), JPEG (SOFn walk), GIF (logical screen
    descriptor), WebP (VP8/VP8L/VP8X chunk headers), TIFF (first-IFD
    walk), and AVIF (ftyp brand + ``ispe`` extents) — the common
    web-crawl image formats; anything else returns (None, None, None).
    This makes ``meta`` extraction REAL for the formats whose headers
    are deterministic, while full pixel decode stays behind
    :func:`decode_image` (PIL is unavailable in this container —
    re-verified round 13: the mirror serves no pillow/av wheels).
    """
    if payload is None:
        return (None, None, None)
    b = bytes(payload)
    if b.startswith(_PNG_MAGIC) and len(b) >= 24 and b[12:16] == b"IHDR":
        return ("image/png", int.from_bytes(b[16:20], "big"),
                int.from_bytes(b[20:24], "big"))
    if b[:3] == b"\xff\xd8\xff":
        dims = _jpeg_dims(b)
        return ("image/jpeg", dims[0] if dims else None,
                dims[1] if dims else None)
    if b[:6] in (b"GIF87a", b"GIF89a") and len(b) >= 10:
        return ("image/gif", int.from_bytes(b[6:8], "little"),
                int.from_bytes(b[8:10], "little"))
    if len(b) >= 16 and b[:4] == b"RIFF" and b[8:12] == b"WEBP":
        w, h = _webp_dims(b)
        return ("image/webp", w, h)
    if len(b) >= 8 and b[:4] in (b"II*\x00", b"MM\x00*"):
        w, h = _tiff_dims(b)
        return ("image/tiff", w, h)
    if len(b) >= 12 and b[4:8] == b"ftyp" \
            and b[8:12] in (b"avif", b"avis"):
        w, h = _avif_dims(b)
        return ("image/avif", w, h)
    return (None, None, None)


SNIFF_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("mime", T.StringType(), True),
    T.StructField("width", T.IntegerType(), True),
    T.StructField("height", T.IntegerType(), True),
    T.StructField("n_bytes", T.LongType(), True),
])


def sniff_meta(df: DataFrame, batch_size: int = 1024) -> DataFrame:
    """Header-sniffed metadata per payload via ``mapInPandas`` — the
    same Arrow batch shape as :func:`extract_features`, with the meta
    fields REAL for PNG/JPEG/GIF payloads (magic-byte parsing, stdlib
    only — no image library needed)."""
    spark = df.sparkSession
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch",
                   str(batch_size))

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [sniff_image_meta(b) for b in pdf["payload"]]
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "mime": [m[0] for m in metas],
                "width": pd.array([m[1] for m in metas], dtype="Int32"),
                "height": pd.array([m[2] for m in metas], dtype="Int32"),
                "n_bytes": [len(b) if b is not None else None
                            for b in pdf["payload"]],
            })

    return df.select("media_id", "payload").mapInPandas(
        compute, schema=SNIFF_SCHEMA)


def sniff_av_meta(payload: "bytes | None"
                  ) -> "tuple[str | None, int | None, int | None, int | None]":
    """(mime, rate, channels, duration_ms) from audio/video container
    headers — pure stdlib byte walks, no codec.

    * WAV (RIFF/WAVE): chunk walk to ``fmt `` (channels, sample rate,
      byte rate) and ``data`` (payload size); ``duration_ms = data_size
      * 1000 // byte_rate`` (integer floor — engine-portable);
    * MP4 (ftyp box): top-level box walk to ``moov`` → ``mvhd`` v0
      (timescale, duration); ``rate`` carries the timescale, channels
      is NULL, ``duration_ms = duration * 1000 // timescale``.

    Anything else → all-NULL.  Truncated/garbled headers degrade to
    NULL fields, never raise — a corrupt payload must not kill the
    Arrow batch.
    """
    if payload is None:
        return (None, None, None, None)
    b = bytes(payload)
    if len(b) >= 12 and b[:4] == b"RIFF" and b[8:12] == b"WAVE":
        ch = sr = byte_rate = dsize = None
        i = 12
        while i + 8 <= len(b):
            cid = b[i:i + 4]
            csize = int.from_bytes(b[i + 4:i + 8], "little")
            if cid == b"fmt " and i + 24 <= len(b):
                ch = int.from_bytes(b[i + 10:i + 12], "little")
                sr = int.from_bytes(b[i + 12:i + 16], "little")
                byte_rate = int.from_bytes(b[i + 16:i + 20], "little")
            elif cid == b"data":
                dsize = csize
            i += 8 + csize + (csize & 1)  # chunks are word-aligned
        dur = (dsize * 1000 // byte_rate
               if dsize is not None and byte_rate else None)
        return ("audio/wav", sr, ch, dur)
    if len(b) >= 12 and b[4:8] == b"ftyp":
        i = 0
        while i + 8 <= len(b):
            size = int.from_bytes(b[i:i + 4], "big")
            if size < 8:
                break
            if b[i + 4:i + 8] == b"moov":
                j, end = i + 8, min(i + size, len(b))
                while j + 8 <= end:
                    isize = int.from_bytes(b[j:j + 4], "big")
                    if isize < 8:
                        break
                    if b[j + 4:j + 8] == b"mvhd" and j + 28 <= end \
                            and b[j + 8] == 0:  # version 0 layout
                        ts = int.from_bytes(b[j + 20:j + 24], "big")
                        dur = int.from_bytes(b[j + 24:j + 28], "big")
                        return ("video/mp4", ts, None,
                                dur * 1000 // ts if ts else None)
                    j += isize
                break
            i += size
        return ("video/mp4", None, None, None)
    return (None, None, None, None)


AV_SNIFF_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("mime", T.StringType(), True),
    T.StructField("rate", T.LongType(), True),
    T.StructField("channels", T.IntegerType(), True),
    T.StructField("duration_ms", T.LongType(), True),
    T.StructField("n_bytes", T.LongType(), True),
])


def sniff_av(df: DataFrame, batch_size: int = 1024) -> DataFrame:
    """Audio/video header metadata per payload via ``mapInPandas`` —
    the WAV/MP4 counterpart of :func:`sniff_meta` (same Arrow batch
    shape; ``rate`` = sample rate for WAV, mvhd timescale for MP4)."""
    spark = df.sparkSession
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch",
                   str(batch_size))

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [sniff_av_meta(b) for b in pdf["payload"]]
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "mime": [m[0] for m in metas],
                "rate": pd.array([m[1] for m in metas], dtype="Int64"),
                "channels": pd.array([m[2] for m in metas],
                                     dtype="Int32"),
                "duration_ms": pd.array([m[3] for m in metas],
                                        dtype="Int64"),
                "n_bytes": [len(b) if b is not None else None
                            for b in pdf["payload"]],
            })

    return df.select("media_id", "payload").mapInPandas(
        compute, schema=AV_SNIFF_SCHEMA)


def decode_image(payload: bytes) -> Any:
    """Real decoder — STUB: image libraries are not in this container.

    Verified unavailable (round 5): PIL, cv2, soundfile, and librosa all
    fail to import, and installing packages is out of scope for this
    environment — so the stub stays, by constraint rather than by
    omission.  A production deployment drops PIL/torchvision in here;
    the Spark plumbing (extract_features / resize_images) is already
    shaped for it and tested with deterministic fake payloads.
    """
    try:
        from PIL import Image  # noqa: F401
    except ImportError as exc:
        raise NotImplementedError(
            "image decoding requires PIL, which is not installed in this "
            "environment; the Spark-side plumbing (schema, Arrow batching, "
            "mapInPandas signature) is real and tested via "
            "extract_features()") from exc
    import io
    return Image.open(io.BytesIO(payload))


def resize_images(df: DataFrame, width: int, height: int) -> DataFrame:
    """Resize pipeline — same mapInPandas shape as extract_features, with
    the decode step stubbed (NotImplementedError without PIL)."""
    out_schema = T.StructType([
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
    ])

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for b in pdf["payload"]:
                img = decode_image(b)  # raises NotImplementedError w/o PIL
                out.append(img.resize((width, height)).tobytes())
            yield pd.DataFrame({"media_id": pdf["media_id"],
                                "payload": out})

    return df.select("media_id", "payload").mapInPandas(
        compute, schema=out_schema)


def plan_frame_samples(df: DataFrame, fps: float = 30.0,
                       every_s: float = 1.0,
                       max_frames: int = 1000) -> DataFrame:
    """Video frame-sampling PLAN — the Spark-side half of frame
    extraction that needs no decoder: from each payload's
    header-sniffed duration (:func:`sniff_av`), the frame indices and
    timestamps to sample at one frame per ``every_s`` seconds,
    assuming ``fps`` (containers don't carry exact fps in the mvhd
    box; pass the pipeline's known encode rate).  One row per
    (media_id, sample): ``(media_id, sample_idx, t_seconds,
    frame_idx)``.  Payloads with no sniffable duration yield no rows
    (they surface in :func:`sniff_av` as NULL-duration for triage).
    ``max_frames`` caps a corrupt multi-hour duration from exploding
    the plan (plan-side raise, the ``resample_fill`` guard pattern).

    ``frame_idx`` is clamped to the last decodable frame
    (``ceil(duration_s·fps) − 1``): when the duration is an exact
    multiple of ``every_s`` the naive ``t·fps`` index for the final
    sample is one PAST the final frame (10.0 s @ 30 fps would plan
    frame 300 of 0..299) and a real decoder would reject it
    (ADVICE r10).  The clamped final sample grabs the last frame
    instead — same sample count, decodable plan.

    Scale: sniff is one ``mapInPandas`` pass; the plan is a
    ``sequence``/``explode`` row expression — frames per payload
    rows, no decode, no shuffle.  Feed the plan to
    :func:`sample_frames` (decode stub) or an external extraction
    service keyed on (media_id, frame_idx).
    """
    if fps <= 0 or every_s <= 0:
        raise ValueError(f"need fps > 0, every_s > 0: {fps}, {every_s}")
    if max_frames < 1:
        raise ValueError(f"max_frames must be >= 1: {max_frames}")
    meta = sniff_av(df).where(F.col("duration_ms").isNotNull()
                              & (F.col("duration_ms") > 0))
    n = (F.col("duration_ms") / F.lit(1000.0 * every_s)) \
        .cast("long") + 1
    n_guarded = (F.when(n <= max_frames, n)
                 .otherwise(F.raise_error(F.concat(
                     F.lit("plan_frame_samples: media "),
                     F.col("media_id").cast("string"),
                     F.lit(f" wants more than {int(max_frames)} "
                           f"frames — raise max_frames or check "
                           f"the sniffed duration"))).cast("long")))
    last_frame = F.greatest(
        F.ceil(F.col("duration_ms") / F.lit(1000.0) * F.lit(float(fps)))
        .cast("long") - 1,
        F.lit(0).cast("long"))
    return (meta.select(
        "media_id", "duration_ms",
        F.explode(F.sequence(F.lit(0), n_guarded - 1))
        .alias("sample_idx"))
        .select("media_id", "sample_idx",
                (F.col("sample_idx") * every_s).alias("t_seconds"),
                F.least((F.col("sample_idx") * every_s * fps)
                        .cast("long"), last_frame)
                .alias("frame_idx")))


def decode_video_frame(payload: bytes, frame_idx: int) -> Any:
    """Decode one frame — STUB: real decoding needs av/opencv, which
    this container doesn't ship.  The Spark-side plumbing
    (:func:`plan_frame_samples` schema/partitioning and
    :func:`sample_frames`' mapInPandas batch shape) is real and
    tested; swap this function for the av-backed decoder in an
    environment that has it."""
    try:
        import av  # noqa: F401
    except ImportError:
        raise NotImplementedError(
            "decode_video_frame requires PyAV (not shipped in this "
            "container); plan_frame_samples carries the real "
            "Spark-side plumbing") from None


def sample_frames(df: DataFrame, fps: float = 30.0,
                  every_s: float = 1.0) -> DataFrame:
    """Frame extraction pipeline: :func:`plan_frame_samples` joined
    back to payloads, frames decoded per (media_id, frame_idx) via
    ``mapInPandas`` — decode stubbed (:func:`decode_video_frame`
    raises without PyAV), plumbing real."""
    import pyspark.sql.types as T
    plan = plan_frame_samples(df, fps=fps, every_s=every_s)
    joined = plan.join(df.select("media_id", "payload"), "media_id")
    out_schema = T.StructType([
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.LongType(), True),
        T.StructField("frame", T.BinaryType(), True),
    ])

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            frames = [decode_video_frame(b, i)
                      for b, i in zip(pdf["payload"], pdf["frame_idx"])]
            yield pd.DataFrame({"media_id": pdf["media_id"],
                                "frame_idx": pdf["frame_idx"],
                                "frame": frames})

    return joined.select("media_id", "frame_idx", "payload") \
        .mapInPandas(compute, schema=out_schema)

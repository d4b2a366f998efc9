"""Multimodal (image/audio/video) column plumbing.

Media are opaque ``binary`` columns with typed metadata structs. The Spark
side — schemas, mapInPandas batch shape, partition sizing — is real and
tested; the codec step is STUBBED (no PIL/ffmpeg in this container):
``decode_image_batch`` raises NotImplementedError unless
``deterministic_fake=True``, which produces a seeded fake feature vector so
pipelines are end-to-end testable.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("kind", T.StringType(), False),  # image | audio | video
    T.StructField("content", T.BinaryType(), True),
    T.StructField("meta", T.StructType([
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]), True),
])

IMAGE_FEATURES_SCHEMA = (
    "media_id long, mime string, width int, height int, feature array<float>"
)


def _probe_one(b: bytes):
    """Container-header probe for one blob: (mime, width, height,
    duration_ms) from magic bytes + fixed-offset header fields. This is
    REAL metadata extraction (pure struct parsing, no codec libraries):
    PNG IHDR, JPEG SOF0/1/2, GIF logical screen, BMP BITMAPINFOHEADER,
    WebP VP8/VP8L/VP8X, WAV fmt/data chunks, MP4/ISO-BMFF mvhd."""
    import struct

    if not b:
        return (None, None, None, None)
    if b[:8] == b"\x89PNG\r\n\x1a\n" and len(b) >= 24:
        w, h = struct.unpack_from(">II", b, 16)
        return ("image/png", w, h, None)
    if b[:2] == b"\xff\xd8":  # JPEG: walk segments to a SOF marker
        off = 2
        while off + 9 < len(b) and b[off] == 0xFF:
            marker = b[off + 1]
            if marker in (0xC0, 0xC1, 0xC2):
                h, w = struct.unpack_from(">HH", b, off + 5)
                return ("image/jpeg", w, h, None)
            if marker == 0xD8 or 0xD0 <= marker <= 0xD7:
                off += 2
                continue
            seg_len = struct.unpack_from(">H", b, off + 2)[0]
            off += 2 + seg_len
        return ("image/jpeg", None, None, None)
    if b[:6] in (b"GIF87a", b"GIF89a") and len(b) >= 10:
        w, h = struct.unpack_from("<HH", b, 6)
        return ("image/gif", w, h, None)
    if b[:2] == b"BM" and len(b) >= 26:
        w, h = struct.unpack_from("<ii", b, 18)
        return ("image/bmp", abs(w), abs(h), None)
    if b[:4] == b"RIFF" and b[8:12] == b"WEBP" and len(b) >= 30:
        chunk = b[12:16]
        if chunk == b"VP8X":
            w = int.from_bytes(b[24:27], "little") + 1
            h = int.from_bytes(b[27:30], "little") + 1
            return ("image/webp", w, h, None)
        if chunk == b"VP8L":
            bits = int.from_bytes(b[21:25], "little")
            return ("image/webp", (bits & 0x3FFF) + 1,
                    ((bits >> 14) & 0x3FFF) + 1, None)
        if chunk == b"VP8 " and len(b) >= 30:
            w, h = struct.unpack_from("<HH", b, 26)
            return ("image/webp", w & 0x3FFF, h & 0x3FFF, None)
        return ("image/webp", None, None, None)
    if b[:4] == b"RIFF" and b[8:12] == b"WAVE":
        # walk chunks for fmt (byte rate) + data (payload size)
        off, rate, size = 12, None, None
        while off + 8 <= len(b):
            cid, clen = b[off:off + 4], struct.unpack_from("<I", b, off + 4)[0]
            if cid == b"fmt " and off + 20 <= len(b):
                rate = struct.unpack_from("<I", b, off + 16)[0]  # bytes/s
            elif cid == b"data":
                size = clen
            off += 8 + clen + (clen & 1)
        dur = int(size * 1000 / rate) if rate and size is not None else None
        return ("audio/wav", None, None, dur)
    if len(b) >= 12 and b[4:8] == b"ftyp":
        # ISO-BMFF: find moov/mvhd for timescale+duration
        off = 0
        while off + 8 <= len(b):
            size = struct.unpack_from(">I", b, off)[0]
            box = b[off + 4:off + 8]
            if box == b"moov":
                inner = off + 8
                end = off + size
                while inner + 8 <= min(end, len(b)):
                    isz = struct.unpack_from(">I", b, inner)[0]
                    if b[inner + 4:inner + 8] == b"mvhd":
                        version = b[inner + 8] if inner + 9 <= len(b) else 0
                        if version == 0 and inner + 28 <= len(b):
                            ts, dur = struct.unpack_from(">II", b, inner + 20)
                        elif version != 0 and inner + 40 <= len(b):
                            ts = struct.unpack_from(">I", b, inner + 28)[0]
                            dur = struct.unpack_from(">Q", b, inner + 32)[0]
                        else:
                            return ("video/mp4", None, None, None)
                        return ("video/mp4", None, None,
                                int(dur * 1000 / ts) if ts else None)
                    inner += max(isz, 8)
                break
            off += max(size, 8)
        return ("video/mp4", None, None, None)
    return ("application/octet-stream", None, None, None)


def probe_media(df: DataFrame, content_col: str = "content") -> DataFrame:
    """Replace/attach ``meta`` with REAL header-probed metadata (mime,
    width, height, duration_ms) — pure struct parsing in an Arrow batch,
    no codec libraries, so this path is NOT stubbed. Map-side only."""
    out_fields = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}"
        for f in df.schema.fields if f.name != "meta")
    schema = (f"{out_fields}, meta struct<mime:string,width:int,"
              "height:int,duration_ms:bigint>")
    cols = [f.name for f in df.schema.fields if f.name != "meta"]

    import struct as _struct

    def safe_probe(b):
        # untrusted bytes: truncated containers degrade to
        # (mime-or-unknown, nulls), never a task failure
        try:
            return _probe_one(b)
        except (_struct.error, IndexError, ValueError):
            return ("application/octet-stream", None, None, None)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [
                dict(zip(("mime", "width", "height", "duration_ms"),
                         safe_probe(bytes(b) if b is not None else b"")))
                for b in pdf[content_col]
            ]
            out = pdf[cols].copy()
            out["meta"] = metas
            yield out

    return df.mapInPandas(run, schema)


def _fake_feature(content: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in for a decoded-image embedding: bytes of
    sha256(content) scaled to [0,1). Same input -> same vector, everywhere."""
    digest = hashlib.sha256(content or b"").digest()
    return [b / 255.0 for b in digest[:dim]]


def decode_image_batch(pdf: pd.DataFrame, deterministic_fake: bool = False) -> pd.DataFrame:
    """Decode one Arrow batch of images to features.

    REAL pipelines plug PIL/torchvision here; this container has neither,
    so only the fake path is runnable. The batch shape (pandas in/out,
    columns preserved, one row per media) is the production contract."""
    if not deterministic_fake:
        raise NotImplementedError(
            "image decoding requires PIL/torchvision (not in this container); "
            "pass deterministic_fake=True for the test double")
    return pd.DataFrame({
        "media_id": pdf["media_id"],
        "mime": pdf["meta"].map(lambda m: (m or {}).get("mime")),
        "width": pdf["meta"].map(lambda m: (m or {}).get("width")),
        "height": pdf["meta"].map(lambda m: (m or {}).get("height")),
        "feature": pdf["content"].map(lambda c: _fake_feature(bytes(c) if c is not None else b"")),
    })


def extract_image_features(df: DataFrame, deterministic_fake: bool = False) -> DataFrame:
    """mapInPandas over image rows -> feature rows.

    Scale notes: repartition upstream so each Arrow batch holds a bounded
    number of images (spark.sql.execution.arrow.maxRecordsPerBatch);
    binary payloads never hit the driver."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield decode_image_batch(pdf, deterministic_fake=deterministic_fake)

    return df.filter(F.col("kind") == "image").mapInPandas(run, IMAGE_FEATURES_SCHEMA)


RESIZED_SCHEMA = (
    "media_id long, content binary, "
    "meta struct<mime:string,width:int,height:int,duration_ms:bigint>"
)

FRAME_SCHEMA = "media_id long, frame_idx int, ts_ms long, frame binary"

AUDIO_FEATURES_SCHEMA = "media_id long, duration_ms long, feature array<float>"


def resize_images(df: DataFrame, width: int, height: int,
                  deterministic_fake: bool = False) -> DataFrame:
    """mapInPandas image resize. Real pipelines plug PIL here; the fake
    path re-derives deterministic bytes from (content, dims) and updates
    the metadata so downstream schema/partition behavior is production-
    shaped."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not deterministic_fake:
                raise NotImplementedError(
                    "image resize requires PIL (not in this container); "
                    "pass deterministic_fake=True for the test double")
            salt = f":{width}x{height}".encode()
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "content": pdf["content"].map(
                    lambda c: hashlib.sha256((bytes(c) if c is not None else b"") + salt).digest()),
                "meta": pdf["meta"].map(lambda m: {
                    "mime": (m or {}).get("mime"),
                    "width": width, "height": height,
                    "duration_ms": (m or {}).get("duration_ms"),
                }),
            })

    return df.filter(F.col("kind") == "image").mapInPandas(run, RESIZED_SCHEMA)


def sample_video_frames(df: DataFrame, every_ms: int = 500,
                        deterministic_fake: bool = False) -> DataFrame:
    """mapInPandas frame sampling: one output row per sampled frame
    (media_id, frame_idx, ts_ms, frame bytes). Real pipelines plug ffmpeg;
    the fake path derives frame bytes from (content, idx). Row explosion
    happens executor-side inside the Arrow batch — frames never transit
    the driver."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not deterministic_fake:
                raise NotImplementedError(
                    "frame sampling requires ffmpeg (not in this container); "
                    "pass deterministic_fake=True for the test double")
            out = {"media_id": [], "frame_idx": [], "ts_ms": [], "frame": []}
            for _, row in pdf.iterrows():
                dur = (row["meta"] or {}).get("duration_ms") or 0
                content = bytes(row["content"]) if row["content"] is not None else b""
                for i in range(max(int(dur // every_ms), 0)):
                    out["media_id"].append(row["media_id"])
                    out["frame_idx"].append(i)
                    out["ts_ms"].append(i * every_ms)
                    out["frame"].append(
                        hashlib.sha256(content + f":f{i}".encode()).digest())
            yield pd.DataFrame(out)

    return df.filter(F.col("kind") == "video").mapInPandas(run, FRAME_SCHEMA)


def extract_audio_features(df: DataFrame, dim: int = 8,
                           deterministic_fake: bool = False) -> DataFrame:
    """mapInPandas audio featurization (real pipelines: torchaudio /
    librosa); fake path mirrors the image one."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not deterministic_fake:
                raise NotImplementedError(
                    "audio decoding requires torchaudio/librosa (not in this "
                    "container); pass deterministic_fake=True for the test double")
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "duration_ms": pdf["meta"].map(lambda m: (m or {}).get("duration_ms")),
                "feature": pdf["content"].map(
                    lambda c: _fake_feature(bytes(c) if c is not None else b"", dim)),
            })

    return df.filter(F.col("kind") == "audio").mapInPandas(run, AUDIO_FEATURES_SCHEMA)


def gen_fake_media(spark, n: int = 100, seed: int = 42) -> DataFrame:
    """Deterministic fake media table for tests (binary payload derived
    from the id — no external data)."""
    df = spark.range(n).select(
        F.col("id").alias("media_id"),
        F.element_at(F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
                     (F.pmod(F.xxhash64("id", F.lit(seed)), F.lit(3)) + 1).cast("int")
                     ).alias("kind"),
        F.sha2(F.concat(F.lit("media"), F.col("id").cast("string")), 256)
         .cast("binary").alias("content"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.lit(64).alias("width"), F.lit(64).alias("height"),
            F.lit(1000).alias("duration_ms"),
        ).alias("meta"),
    )
    return df

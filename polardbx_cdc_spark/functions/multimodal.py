"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed by Arrow-batched Pandas UDFs via mapInPandas.

The decode step is STUBBED (image/audio libraries are not in this
container): ``decode_stub=True`` produces deterministic fake features from
the bytes' md5 so the Spark-side plumbing — schema, batch iteration,
partitioning — is real and testable. Swap ``_decode_image`` for a real
decoder (PIL/ffmpeg) in production; the dataflow does not change.

Scale notes: mapInPandas streams Arrow batches — memory is bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch`` regardless of partition
size; binary payloads never pass through the driver; feature extraction is
embarrassingly parallel (no shuffle).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: canonical multimodal envelope: opaque payload + typed metadata
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)


def _decode_image(payload: bytes, feat_dim: int = 8) -> list[float]:
    """STUB decoder. Real implementation would be e.g. PIL.Image.open +
    resize + channel stats; this deterministic fake derives ``feat_dim``
    floats in [0,1) from md5(payload) so tests are stable."""
    if payload is None:
        return [0.0] * feat_dim
    digest = hashlib.md5(payload).digest()
    return [digest[i % 16] / 256.0 for i in range(feat_dim)]


def extract_features(df: DataFrame, feat_dim: int = 8) -> DataFrame:
    """media frame → feature frame via mapInPandas (Arrow batches).

    ``df`` must have (media_id, kind, payload). This is the canonical shape
    for any per-item Python-side media op (decode / resize / frame-sample).
    """

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(lambda b: len(b) if b is not None else 0),
                    "feature": pdf["payload"].map(lambda b: _decode_image(b, feat_dim)),
                }
            )

    return df.select("media_id", "kind", "payload").mapInPandas(_batches, FEATURE_SCHEMA)


def media_from_documents(docs: DataFrame, mixed_kinds: bool = False) -> DataFrame:
    """Adapter used by tests: synthesize a media table from ``documents``
    (payload = utf-8 bytes of the text). Exercises the exact binary-column
    path a real image table would take. ``mixed_kinds`` assigns
    image/audio/video by doc_id and synthesizes dimensions/durations so the
    resize and frame-sample paths have metadata to work with."""
    if not mixed_kinds:
        return docs.select(
            F.col("doc_id").alias("media_id"),
            F.lit("image").alias("kind"),
            F.encode(F.col("text"), "utf-8").alias("payload"),
            F.lit("application/octet-stream").alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
        )
    kind = (
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
    )
    is_timed = F.col("doc_id") % 3 != 0
    return docs.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        F.encode(F.col("text"), "utf-8").alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
        F.when(~is_timed, (F.length("text") % 1024 + 64).cast("int")).alias("width"),
        F.when(~is_timed, (F.length("text") % 768 + 64).cast("int")).alias("height"),
        F.when(is_timed, (F.length("text") * 10).cast("long")).alias("duration_ms"),
    )


#: resize output: same envelope, new payload + dimensions
RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
    ]
)


def _resize_stub(payload: bytes, w: int, h: int) -> bytes:
    """STUB resize. Real implementation: PIL decode → resize((w,h)) →
    re-encode. The deterministic fake keys the output on (payload, w, h)
    so tests can assert the dataflow end-to-end."""
    if payload is None:
        return None
    return hashlib.md5(payload + f":{w}x{h}".encode()).digest()


def resize_images(df: DataFrame, target_w: int = 224, target_h: int = 224) -> DataFrame:
    """Image resize over Arrow batches (mapInPandas): 1 row in → 1 row out,
    payload replaced, dimensions updated. No shuffle; memory bounded by the
    Arrow batch size — the canonical per-item media transform shape."""

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "payload": pdf["payload"].map(
                        lambda b: _resize_stub(b, target_w, target_h)
                    ),
                    "width": target_w,
                    "height": target_h,
                }
            )

    return df.filter(F.col("kind") == "image").select(
        "media_id", "kind", "payload"
    ).mapInPandas(_batches, RESIZED_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("ts_ms", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
    ]
)


def sample_frames(df: DataFrame, every_ms: int = 1000, max_frames: int = 64) -> DataFrame:
    """Video frame sampling: 1 video row → N frame rows (the flatMap shape
    real pipelines need — mapInPandas output is NOT row-aligned with
    input). GIF payloads are REALLY decoded (media_codecs.decode_gif —
    pure-Python LZW) and each sampled frame re-encodes as a BMP payload;
    other containers (MP4 etc. need external codecs) keep the md5 stub
    keyed on (video payload, frame index), frame count =
    min(duration/every, max_frames)."""

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from polardbx_cdc_spark.functions import media_codecs as mc

        for pdf in it:
            out = {"media_id": [], "frame_idx": [], "ts_ms": [], "payload": []}
            for _, row in pdf.iterrows():
                payload = row["payload"] or b""
                if mc.sniff(bytes(payload)) == "gif":
                    frames = mc.decode_gif(bytes(payload))
                    step = max(len(frames) // max_frames, 1)
                    for i, fi in enumerate(range(0, len(frames), step)):
                        out["media_id"].append(row["media_id"])
                        out["frame_idx"].append(i)
                        out["ts_ms"].append(fi * every_ms)
                        out["payload"].append(mc.encode_bmp(frames[fi]))
                    continue
                dur = int(row["duration_ms"] or 0)
                n = min(max(dur // every_ms, 0), max_frames)
                for i in range(n):
                    out["media_id"].append(row["media_id"])
                    out["frame_idx"].append(i)
                    out["ts_ms"].append(i * every_ms)
                    out["payload"].append(
                        hashlib.md5(payload + f"#f{i}".encode()).digest()
                    )
            yield pd.DataFrame(out)

    return df.filter(F.col("kind") == "video").select(
        "media_id", "payload", "duration_ms"
    ).mapInPandas(_batches, FRAME_SCHEMA)


def media_stats(media: DataFrame) -> DataFrame:
    """Typed-metadata aggregation over the opaque payloads (JVM-side:
    octet_length needs no decode)."""
    return (
        media.groupBy("kind")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(F.octet_length("payload")).cast("long").alias("total_bytes"),
            F.max(F.octet_length("payload")).cast("long").alias("max_bytes"),
        )
    )


# ---------------------------------------------------------------------------
# REAL decode path — formats the container handles natively (media_codecs)
# ---------------------------------------------------------------------------


def _decode_real(payload: bytes, feat_dim: int = 8) -> list[float]:
    """Genuine byte-level decode for BMP / PPM / PNG / JPEG / WAV
    (media_codecs.py — zero external deps: PNG via stdlib zlib with all
    five scanline filters, JPEG baseline DCT+Huffman in numpy); unknown
    containers (MP4 video) fall back to the documented md5 stub."""
    from polardbx_cdc_spark.functions import media_codecs as mc

    fmt = mc.sniff(payload)
    if fmt in ("bmp", "ppm", "png", "jpeg"):
        arr = {
            "bmp": mc.decode_bmp,
            "ppm": mc.decode_ppm,
            "png": mc.decode_png,
            "jpeg": mc.decode_jpeg,
        }[fmt](payload)
        return mc.image_features(arr, feat_dim)
    if fmt == "wav":
        return mc.audio_features(*mc.decode_wav(payload), feat_dim)
    return _decode_image(payload, feat_dim)


def extract_features_real(df: DataFrame, feat_dim: int = 8) -> DataFrame:
    """The REAL-decode twin of :func:`extract_features`: same Arrow
    dataflow, but BMP/PPM payloads are actually pixel-decoded and WAV
    payloads actually sample-decoded before feature extraction."""

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(lambda b: len(b) if b is not None else 0),
                    "feature": pdf["payload"].map(lambda b: _decode_real(b, feat_dim)),
                }
            )

    return df.select("media_id", "kind", "payload").mapInPandas(_batches, FEATURE_SCHEMA)


def resize_images_real(df: DataFrame, target_w: int = 224, target_h: int = 224) -> DataFrame:
    """REAL image resize: decode BMP/PPM pixels, nearest-neighbor resample
    (NumPy index sampling), re-encode BMP. Non-decodable payloads keep the
    stub path so the operator is total."""
    from polardbx_cdc_spark.functions import media_codecs as mc

    def _resize_one(b: bytes) -> bytes:
        fmt = mc.sniff(b)
        if fmt in ("bmp", "ppm", "png", "jpeg"):
            arr = {
                "bmp": mc.decode_bmp,
                "ppm": mc.decode_ppm,
                "png": mc.decode_png,
                "jpeg": mc.decode_jpeg,
            }[fmt](b)
            if arr.ndim == 2:
                import numpy as np

                arr = np.stack([arr] * 3, axis=-1)
            arr = arr[:, :, :3]  # alpha dropped on the BMP re-encode
            return mc.encode_bmp(mc.resize_nearest(arr, target_w, target_h))
        return _resize_stub(b, target_w, target_h)

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "payload": pdf["payload"].map(_resize_one),
                    "width": target_w,
                    "height": target_h,
                }
            )

    return df.filter(F.col("kind") == "image").select(
        "media_id", "kind", "payload"
    ).mapInPandas(_batches, RESIZED_SCHEMA)


def _fan_out(df: DataFrame) -> DataFrame:
    """Small parquet inputs arrive as ONE partition, and every media op
    downstream is a heavy Python codec — spread to the cluster's
    parallelism first (same rule as the wire codecs: one cheap shuffle
    of ids buys an n_cores speedup on the per-row work). Delegates to
    the shared deterministic-hash fan-out (guide §2.5: no
    sort-before-repartition, retry-safe)."""
    from polardbx_cdc_spark.binlog_wire import fan_out

    return fan_out(df)


def synth_real_media(docs: DataFrame) -> DataFrame:
    """Deterministic REAL media payloads keyed on doc_id: every third doc
    becomes a true BMP (seeded pixel noise), a true WAV (seeded PCM16
    sine-plus-noise), a true PPM, or a true RGBA PNG (Up-filtered,
    zlib-deflated scanlines) — generated inside mapInPandas so the
    payload bytes never touch the driver. Gives the real-decode path
    genuine files to chew on at any scale."""
    import numpy as np

    from polardbx_cdc_spark.functions import media_codecs as mc

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = {"media_id": [], "kind": [], "payload": [], "mime": [],
                    "width": [], "height": [], "duration_ms": []}
            for doc_id in pdf["doc_id"]:
                doc_id = int(doc_id)
                rng = np.random.RandomState(doc_id % (2**31))
                m = doc_id % 5
                if m == 0:
                    w, h = 16 + doc_id % 48, 16 + doc_id % 32
                    arr = rng.randint(0, 256, (h, w, 3), dtype=np.uint8)
                    payload, kind, mime = mc.encode_bmp(arr), "image", "image/bmp"
                    width, height, dur = w, h, None
                elif m == 1:
                    n = 800 + doc_id % 1600
                    t = np.arange(n)
                    x = (3000 * np.sin(2 * np.pi * t * (doc_id % 40 + 1) / 400)
                         + rng.randint(-500, 500, n)).astype(np.int16)
                    payload, kind, mime = mc.encode_wav(x, 8000), "audio", "audio/wav"
                    width, height, dur = None, None, n * 1000 // 8000
                elif m == 2:
                    w, h = 8 + doc_id % 24, 8 + doc_id % 16
                    arr = rng.randint(0, 256, (h, w, 3), dtype=np.uint8)
                    payload, kind, mime = mc.encode_ppm(arr), "image", "image/x-portable-pixmap"
                    width, height, dur = w, h, None
                elif m == 3:
                    w, h = 12 + doc_id % 40, 12 + doc_id % 20
                    arr = rng.randint(0, 256, (h, w, 4), dtype=np.uint8)
                    payload, kind, mime = mc.encode_png(arr), "image", "image/png"
                    width, height, dur = w, h, None
                else:
                    w, h = 10 + doc_id % 30, 10 + doc_id % 14
                    arr = rng.randint(0, 256, (h, w, 3), dtype=np.uint8)
                    payload, kind, mime = mc.encode_jpeg(arr, 90), "image", "image/jpeg"
                    width, height, dur = w, h, None
                rows["media_id"].append(doc_id)
                rows["kind"].append(kind)
                rows["payload"].append(payload)
                rows["mime"].append(mime)
                rows["width"].append(width)
                rows["height"].append(height)
                rows["duration_ms"].append(dur)
            out = pd.DataFrame(rows)
            # nullable int dtypes: None + int mixes must not decay to
            # float64 (Arrow would refuse the unsafe cast back)
            out["width"] = pd.array(rows["width"], dtype="Int32")
            out["height"] = pd.array(rows["height"], dtype="Int32")
            out["duration_ms"] = pd.array(rows["duration_ms"], dtype="Int64")
            yield out

    return _fan_out(docs.select("doc_id")).mapInPandas(_batches, MEDIA_SCHEMA)

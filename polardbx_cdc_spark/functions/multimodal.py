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
    input). Frame count = min(duration/every, max_frames); payload is the
    stub frame-extract keyed on (video payload, frame index). Real
    implementation: ffmpeg seek + decode per sampled timestamp."""

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {"media_id": [], "frame_idx": [], "ts_ms": [], "payload": []}
            for _, row in pdf.iterrows():
                dur = int(row["duration_ms"] or 0)
                n = min(max(dur // every_ms, 0), max_frames)
                for i in range(n):
                    out["media_id"].append(row["media_id"])
                    out["frame_idx"].append(i)
                    out["ts_ms"].append(i * every_ms)
                    out["payload"].append(
                        hashlib.md5((row["payload"] or b"") + f"#f{i}".encode()).digest()
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

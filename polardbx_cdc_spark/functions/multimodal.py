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


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Adapter used by tests: synthesize a media table from ``documents``
    (payload = utf-8 bytes of the text). Exercises the exact binary-column
    path a real image table would take."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("kind"),
        F.encode(F.col("text"), "utf-8").alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("long").alias("duration_ms"),
    )


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

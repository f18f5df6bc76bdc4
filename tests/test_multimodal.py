"""Multimodal plumbing: Arrow-batched media transforms (decode stubbed,
dataflow real) — schema, batch shapes, determinism, 1→N frame explosion."""

from __future__ import annotations

from pyspark.sql import functions as F

from polardbx_cdc_spark.functions import multimodal
from polardbx_cdc_spark.session import load_table

SF = "/root/testdata/sf0.001"


def _media(spark, mixed=True):
    docs = load_table(spark, SF, "documents")
    return multimodal.media_from_documents(docs, mixed_kinds=mixed)


def test_feature_extraction_schema_and_determinism(spark):
    media = _media(spark, mixed=False)
    feats = multimodal.extract_features(media, feat_dim=8)
    rows = feats.orderBy("media_id").limit(5).collect()
    assert [f.name for f in feats.schema.fields] == ["media_id", "kind", "n_bytes", "feature"]
    assert all(len(r["feature"]) == 8 for r in rows)
    # deterministic: same payload → same feature across runs
    again = multimodal.extract_features(media, feat_dim=8).orderBy("media_id").limit(5).collect()
    assert [r["feature"] for r in rows] == [r["feature"] for r in again]


def test_resize_replaces_payload_and_dimensions(spark):
    media = _media(spark)
    n_images = media.filter(F.col("kind") == "image").count()
    resized = multimodal.resize_images(media, 224, 224)
    assert resized.count() == n_images  # 1:1, images only
    row = resized.orderBy("media_id").first()
    assert row["width"] == 224 and row["height"] == 224
    assert len(row["payload"]) == 16  # stub digest payload
    # resize is keyed on target size: different target → different payload
    other = multimodal.resize_images(media, 64, 64).orderBy("media_id").first()
    assert other["payload"] != row["payload"]


def test_frame_sampling_explodes_by_duration(spark):
    media = _media(spark)
    videos = media.filter(F.col("kind") == "video").select("media_id", "duration_ms")
    frames = multimodal.sample_frames(media, every_ms=1000, max_frames=64)
    got = {r["media_id"]: r["n"] for r in frames.groupBy("media_id").agg(F.count(F.lit(1)).alias("n")).collect()}
    for r in videos.collect():
        expected = min(max(int(r["duration_ms"]) // 1000, 0), 64)
        assert got.get(r["media_id"], 0) == expected
    # frame timestamps are the sampling grid and payloads differ per frame
    f0 = frames.filter(F.col("media_id") == sorted(got)[0]).orderBy("frame_idx").collect()
    assert [r["ts_ms"] for r in f0] == [i * 1000 for i in range(len(f0))]
    assert len({bytes(r["payload"]) for r in f0}) == len(f0)

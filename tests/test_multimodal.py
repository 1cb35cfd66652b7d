"""Multimodal plumbing: binary columns + Arrow-batched feature extraction
(the decode itself is a documented deterministic stub)."""

from __future__ import annotations

from driftdb_spark.functions.multimodal import (
    extract_image_features,
    frame_sample_plan,
    synthetic_media,
)


def test_image_features_schema_and_determinism(spark):
    media = synthetic_media(spark, n=9)
    feats = extract_image_features(media)
    rows = {r.media_id: r for r in feats.collect()}
    # only the image rows (kind cycles image/audio/video)
    assert set(rows) == {0, 3, 6}
    for r in rows.values():
        assert 64 <= r.width < 256 and 64 <= r.height < 256
        assert len(r.channel_means) == 3
        assert all(0.0 <= m <= 1.0 for m in r.channel_means)
        assert len(r.phash) == 16
    again = {r.media_id: r for r in extract_image_features(media).collect()}
    assert {k: (v.width, v.height, v.phash) for k, v in rows.items()} == {
        k: (v.width, v.height, v.phash) for k, v in again.items()
    }


def test_image_features_survive_repartition(spark):
    """Batch shape must not affect results — mapInPandas over 1 vs many
    partitions yields the same features."""
    media = synthetic_media(spark, n=9)
    one = {r.media_id: r.phash for r in extract_image_features(media.coalesce(1)).collect()}
    many = {r.media_id: r.phash for r in extract_image_features(media.repartition(8)).collect()}
    assert one == many


def test_frame_sample_plan(spark):
    media = synthetic_media(spark, n=9)
    plan = frame_sample_plan(media, every_n=30)
    rows = plan.collect()
    assert {r.media_id for r in rows} == {2, 5, 8}  # video rows
    assert all(r.frame_idx >= 0 for r in rows)

"""Multimodal plumbing (north_star): schema/batch contract of the
mapInPandas decode/feature/frame operators with the deterministic fake
kernel (real codecs are stubbed — see multimodal.ops docstring)."""

from __future__ import annotations

from spendinganalysisetl_spark.multimodal import (
    extract_features,
    fake_media_table,
    sample_frames,
)


def test_extract_features_contract(spark):
    media = fake_media_table(spark, 24)
    out = extract_features(media)
    assert [f.name for f in out.schema.fields] == [
        "media_id", "kind", "n_bytes", "digest", "feat_0", "feat_1",
    ]
    rows = out.collect()
    assert len(rows) == 24
    # deterministic: same payload → same digest/features on re-run
    again = {r["media_id"]: (r["digest"], r["feat_0"]) for r in extract_features(media).collect()}
    for r in rows:
        assert again[r["media_id"]] == (r["digest"], r["feat_0"])
        assert 0.0 <= r["feat_0"] <= 1.0


def test_sample_frames_expansion(spark):
    media = fake_media_table(spark, 24)
    frames = sample_frames(media, every_ms=250).collect()
    n_videos = media.filter("kind = 'video'").count()
    assert n_videos > 0
    assert len(frames) >= n_videos * 4  # ≥1000ms duration → ≥4 frames each
    per = {}
    for r in frames:
        per.setdefault(r["media_id"], []).append(r["frame_idx"])
    for idxs in per.values():
        assert sorted(idxs) == list(range(len(idxs))), "frame indices contiguous from 0"


def test_resize_images_shape_and_composability(spark):
    """resize keeps the media schema (composes with extract_features),
    scales payload bytes with the target raster, updates meta, and is
    deterministic."""
    from spendinganalysisetl_spark.multimodal.ops import (
        extract_features,
        fake_media_table,
        resize_images,
    )

    media = fake_media_table(spark, 24)
    small = resize_images(media, width=8, height=6)
    rows = {r["media_id"]: r for r in small.collect()}
    n_images = media.filter("kind = 'image'").count()
    assert len(rows) == n_images and n_images > 0
    for r in rows.values():
        assert r["kind"] == "image"
        assert len(r["payload"]) == 8 * 6 * 3
        assert r["meta"]["width"] == 8 and r["meta"]["height"] == 6
    # deterministic: same input -> same bytes
    again = {r["media_id"]: r for r in resize_images(media, width=8, height=6).collect()}
    assert all(bytes(again[i]["payload"]) == bytes(rows[i]["payload"]) for i in rows)
    # different target -> different bytes and size
    big = {r["media_id"]: r for r in resize_images(media, width=16, height=12).collect()}
    assert all(len(big[i]["payload"]) == 16 * 12 * 3 for i in big)
    # composes: features over resized media run unchanged
    feats = extract_features(resize_images(media, width=8, height=6)).collect()
    assert len(feats) == n_images
    assert all(f["n_bytes"] == 8 * 6 * 3 for f in feats)

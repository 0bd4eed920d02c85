"""Multimodal plumbing (north_star): schema/batch contract of the
mapInPandas decode/feature/frame operators with the deterministic fake
kernel (real codecs are stubbed — see multimodal.ops docstring)."""

from __future__ import annotations

from spendinganalysisetl_spark.multimodal import (
    extract_features,
    fake_media_table,
    ingest_media_dir,
    sample_frames,
)


def test_ingest_media_dir_binaryfile(spark, tmp_path):
    """binaryFile ingestion: raw files → MEDIA_SCHEMA rows with
    deterministic path-hash ids and extension-derived kinds, composable
    straight into extract_features."""
    payloads = {
        "a.jpg": b"\x01\x02\x03",
        "b.wav": b"\x04\x05",
        "c.mp4": b"\x06" * 10,
        "d.unknownext": b"\x07",
        "skip.txt": b"ignored",
    }
    for name, data in payloads.items():
        (tmp_path / name).write_bytes(data)
    media = ingest_media_dir(spark, str(tmp_path), glob="*.{jpg,wav,mp4,unknownext}")
    rows = {r["source_path"].rsplit("/", 1)[-1]: r for r in media.collect()}
    assert set(rows) == {"a.jpg", "b.wav", "c.mp4", "d.unknownext"}
    assert rows["a.jpg"]["kind"] == "image"
    assert rows["b.wav"]["kind"] == "audio"
    assert rows["c.mp4"]["kind"] == "video"
    assert rows["d.unknownext"]["kind"] == "binary"
    assert bytes(rows["b.wav"]["payload"]) == b"\x04\x05"
    assert rows["c.mp4"]["n_bytes"] == 10
    # ids deterministic across re-ingest
    again = {r["source_path"]: r["media_id"] for r in ingest_media_dir(
        spark, str(tmp_path), glob="*.{jpg,wav,mp4,unknownext}").collect()}
    for r in rows.values():
        assert again[r["source_path"]] == r["media_id"]
    # composes into the decode stage
    feats = extract_features(
        media.select("media_id", "kind", "payload", "meta")
    ).collect()
    assert len(feats) == 4 and all(r["digest"] for r in feats)


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

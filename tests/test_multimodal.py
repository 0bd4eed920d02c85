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

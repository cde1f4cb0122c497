"""Multimodal plumbing tests: schema, Arrow batch shape, mapInPandas
signatures — decode kernels are deterministic fakes (container has no codecs)."""

from __future__ import annotations

import pytest

from m12_kafkastreams_python_azure_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    extract_image_features,
    resize_stub,
    sample_video_frames,
)


@pytest.fixture(scope="module")
def media_df(spark):
    rows = []
    for i in range(20):
        payload = bytes([i % 251]) * (100 + i * 13)
        kind = ["image", "audio", "video"][i % 3]
        rows.append(
            (
                i, kind,
                {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind],
                payload,
                64 if kind == "image" else None,
                64 if kind == "image" else None,
                16000 if kind == "audio" else None,
                30 if kind == "video" else None,
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA).repartition(4)


def test_image_features(media_df):
    out = extract_image_features(media_df).collect()
    n_images = media_df.filter("kind = 'image'").count()
    assert len(out) == n_images
    for r in out:
        assert 64 <= r["width"] <= 255 and 64 <= r["height"] <= 255
        assert 0 <= r["mean_luma"] <= 255
    # deterministic: same payload -> same features
    out2 = extract_image_features(media_df).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, out2))


def test_binary_column_dropped_from_output(media_df):
    cols = extract_image_features(media_df).columns
    assert "payload" not in cols  # media bytes never leave the decode stage


def test_resize(media_df):
    out = resize_stub(media_df, max_side=128).collect()
    for r in out:
        assert max(r["width"], r["height"]) <= 128
        assert isinstance(r["payload"], (bytes, bytearray))


def test_video_frame_sampling(media_df):
    out = sample_video_frames(media_df, every_n=10).collect()
    n_videos = media_df.filter("kind = 'video'").count()
    # 30 frames, every 10th -> frames 0, 10, 20
    assert len(out) == n_videos * 3
    assert {r["frame_idx"] for r in out} == {0, 10, 20}


def test_audio_features(media_df):
    from m12_kafkastreams_python_azure_spark.operators.multimodal import (
        extract_audio_features,
    )

    out = {r.media_id: r for r in extract_audio_features(media_df).collect()}
    audio = {
        r.media_id: r for r in media_df.filter("kind = 'audio'").collect()
    }
    assert set(out) == set(audio)
    for mid, r in out.items():
        expected_dur = (len(audio[mid].payload) // 2) // 16000
        assert r.duration_s == expected_dur
        assert 0 <= r.rms <= 255

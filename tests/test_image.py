"""Image/video multimodal plumbing: PPM codec roundtrip, planted corruption
recovery, exact feature values, resize, frame sampling."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from macrobase_spark.operators.image import (
    decode_compressed_image,
    decode_ppm,
    image_features,
    ppm_bytes,
    resize_images,
    resize_nearest,
    sample_frames,
    split_video,
    video_bytes,
)
from macrobase_spark.sources.images import (
    generate_images,
    generate_videos,
    image_array,
)

N = 400


def test_ppm_roundtrip_and_corruption():
    img = image_array(42, 32, 24)
    raw = ppm_bytes(img)
    back = decode_ppm(raw)
    assert back is not None and np.array_equal(back, img)
    assert decode_ppm(b"garbage") is None
    assert decode_ppm(raw[: len(raw) // 2]) is None  # truncated body
    assert decode_ppm(None) is None
    with pytest.raises(NotImplementedError):
        decode_compressed_image("jpeg", b"\xff\xd8")


def test_resize_nearest_exact():
    img = image_array(7, 32, 24)
    half = resize_nearest(img, 16, 12)
    assert half.shape == (12, 16, 3)
    # nearest-neighbor picks source pixel (y*24//12, x*32//16)
    assert np.array_equal(half[3, 5], img[6, 10])


def test_image_features_planted(spark):
    feats = {r["image_id"]: r for r in image_features(generate_images(spark, N)).collect()}
    assert len(feats) == N
    for i in range(N):
        r = feats[f"img_{i:010d}"]
        corrupt = i % 97 == 5 or i % 131 == 7
        assert r["decode_ok"] == (not corrupt), i
        if not corrupt:
            img = image_array(i, r["width"], r["height"])
            assert r["mean_r"] == pytest.approx(img[:, :, 0].mean())
            assert r["mean_b"] == pytest.approx(img[:, :, 2].mean())


def test_resize_images_spark(spark):
    res = resize_images(generate_images(spark, 60), 16, 12).collect()
    ok = [r for r in res if r["decode_ok"]]
    assert len(ok) == sum(1 for i in range(60) if not (i % 97 == 5 or i % 131 == 7))
    img = decode_ppm(bytes(ok[0]["bytes"]))
    assert img.shape == (12, 16, 3)


def test_video_container_and_sampling(spark):
    frames = [ppm_bytes(image_array(i, 8, 6)) for i in range(10)]
    raw = video_bytes(frames)
    assert split_video(raw) == frames
    assert split_video(raw[:10]) is None

    vids = generate_videos(spark, 40, frames_per_video=8)
    sampled = sample_frames(vids, every_k=2).collect()
    good = [i for i in range(40) if i % 53 != 3]
    assert len(sampled) == len(good) * 4  # 8 frames, every 2nd
    by_vid = {}
    for r in sampled:
        by_vid.setdefault(r["video_id"], []).append(r["frame_idx"])
    assert all(sorted(v) == [0, 2, 4, 6] for v in by_vid.values())
    # sampled frames decode and feature-extract like images (composition)
    one = sampled[0]
    assert decode_ppm(bytes(one["frame"])) is not None

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
    # webp is REAL now (operators/webp.py, lossless VP8L): corrupt input
    # returns None; only genuinely-unimplementable formats keep the stub
    assert decode_compressed_image("webp", b"RIFF....WEBP") is None
    with pytest.raises(NotImplementedError):
        decode_compressed_image("avif", b"....ftypavif")


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


# -- PNG codec (pure stdlib) -------------------------------------------------


def test_png_roundtrip_and_filters():
    from macrobase_spark.operators.image import decode_image, decode_png, encode_png

    img = image_array(42, 48, 32)
    raw = encode_png(img)
    back = decode_png(raw)
    assert back is not None and np.array_equal(back, img)
    assert np.array_equal(decode_image(raw), img)  # magic dispatch
    # corruption classes
    flipped = bytearray(raw)
    flipped[len(flipped) // 2] ^= 0xFF
    assert decode_png(bytes(flipped)) is None  # CRC catch
    assert decode_png(raw[: len(raw) // 2]) is None  # truncated
    assert decode_png(b"garbage") is None
    assert decode_png(None) is None
    # decode_compressed_image now REAL for png, jpeg (test_jpeg.py), and
    # lossless webp (test_webp.py)
    assert np.array_equal(decode_compressed_image("png", raw), img)


def test_png_filters_1_to_4_and_layouts():
    """Hand-built PNGs exercising Sub/Up/Average/Paeth unfilters, gray and
    RGBA layouts (encoders in the wild emit all five filters)."""
    import struct
    import zlib

    from macrobase_spark.operators.image import PNG_MAGIC, decode_png

    def chunk(t, d):
        return struct.pack(">I", len(d)) + t + d + struct.pack(
            ">I", zlib.crc32(t + d) & 0xFFFFFFFF
        )

    h, w, ch = 5, 7, 3
    rng = np.random.default_rng(0)
    px = rng.integers(0, 256, (h, w, ch), dtype=np.uint8)
    lines, prev = [], np.zeros(w * ch, dtype=np.uint8)
    for y in range(h):
        cur = px[y].reshape(-1)
        f = y % 5
        if f == 0:
            enc = cur.copy()
        elif f == 1:
            enc = cur.copy()
            enc[ch:] = (cur[ch:].astype(int) - cur[:-ch].astype(int)) & 0xFF
        elif f == 2:
            enc = (cur.astype(int) - prev.astype(int)).astype(np.uint8)
        elif f == 3:
            enc = np.zeros(w * ch, dtype=np.uint8)
            for x in range(w * ch):
                a = int(cur[x - ch]) if x >= ch else 0
                enc[x] = (int(cur[x]) - ((a + int(prev[x])) >> 1)) & 0xFF
        else:
            enc = np.zeros(w * ch, dtype=np.uint8)
            for x in range(w * ch):
                a = int(cur[x - ch]) if x >= ch else 0
                b = int(prev[x])
                c = int(prev[x - ch]) if x >= ch else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                enc[x] = (int(cur[x]) - pred) & 0xFF
        lines.append(bytes([f]) + enc.astype(np.uint8).tobytes())
        prev = cur
    raw = (
        PNG_MAGIC
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(b"".join(lines)))
        + chunk(b"IEND", b"")
    )
    assert np.array_equal(decode_png(raw), px)
    # gray broadcasts to RGB
    g = PNG_MAGIC + chunk(b"IHDR", struct.pack(">IIBBBBB", 4, 3, 8, 0, 0, 0, 0)) + chunk(
        b"IDAT",
        zlib.compress(b"".join(b"\x00" + bytes(range(y * 4, y * 4 + 4)) for y in range(3))),
    ) + chunk(b"IEND", b"")
    dg = decode_png(g)
    assert dg.shape == (3, 4, 3) and int(dg[0, 1, 0]) == 1 and int(dg[0, 1, 2]) == 1
    # RGBA drops alpha
    rgba = np.concatenate([px, np.full((h, w, 1), 200, np.uint8)], axis=2)
    a = PNG_MAGIC + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 6, 0, 0, 0)) + chunk(
        b"IDAT", zlib.compress(b"".join(b"\x00" + rgba[y].tobytes() for y in range(h)))
    ) + chunk(b"IEND", b"")
    assert np.array_equal(decode_png(a), px)


def test_png_features_planted(spark):
    """The PNG fixture flows through the same image_features pipeline;
    planted corruption (CRC bit-flip, truncation) is recovered exactly and
    clean-image features equal the PPM path's (same underlying pixels)."""
    from macrobase_spark.sources.images import generate_png_images

    feats = {
        r["image_id"]: r
        for r in image_features(generate_png_images(spark, N)).collect()
    }
    assert len(feats) == N
    for i in range(N):
        r = feats[f"png_{i:010d}"]
        corrupt = i % 89 == 11 or i % 113 == 17
        assert r["decode_ok"] == (not corrupt), i
        if not corrupt:
            img = image_array(i, r["width"], r["height"])
            assert r["mean_r"] == pytest.approx(img[:, :, 0].mean())
            assert r["mean_g"] == pytest.approx(img[:, :, 1].mean())

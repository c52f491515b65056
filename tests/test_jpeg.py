"""Pure-numpy baseline JPEG codec: round-trip fidelity, structural edge
cases, corruption handling, and the Spark feature pipeline over the planted
fixture."""

import numpy as np
import pytest

from macrobase_spark.operators.jpeg import (
    UNZIGZAG,
    ZIGZAG,
    decode_jpeg,
    encode_jpeg,
)


def _gradient(h, w, seed=0):
    y, x = np.mgrid[0:h, 0:w]
    return np.stack(
        [(x * 3 + seed) % 256, (y * 5) % 256, ((x + y) * 2) % 256], axis=-1
    ).astype(np.uint8)


def _psnr(a, b):
    mse = np.mean((a.astype(float) - b.astype(float)) ** 2)
    return np.inf if mse == 0 else 10 * np.log10(255**2 / mse)


def test_zigzag_is_spec_order():
    # first diagonals of the T.81 zigzag (row-major flat indices)
    assert ZIGZAG[:10].tolist() == [0, 1, 8, 16, 9, 2, 3, 10, 17, 24]
    assert len(set(ZIGZAG.tolist())) == 64
    assert (ZIGZAG[UNZIGZAG] == np.arange(64)).all()


@pytest.mark.parametrize("quality,floor", [(95, 45.0), (90, 42.0), (75, 38.0)])
def test_roundtrip_psnr(quality, floor):
    img = _gradient(48, 80)
    out = decode_jpeg(encode_jpeg(img, quality=quality))
    assert out is not None and out.shape == img.shape
    assert _psnr(img, out) >= floor


def test_flat_color_exact():
    flat = np.full((16, 24, 3), 137, np.uint8)
    out = decode_jpeg(encode_jpeg(flat, 90))
    assert int(np.abs(out.astype(int) - 137).max()) == 0


def test_odd_dimensions_cropped():
    """Non-8-multiple sizes: edge padding is encoded but the decode crops
    back to the declared SOF dimensions."""
    img = _gradient(13, 21, seed=5)
    out = decode_jpeg(encode_jpeg(img, 95))
    assert out.shape == (13, 21, 3)
    assert _psnr(img, out) >= 35.0


def test_restart_markers_roundtrip():
    img = _gradient(40, 56, seed=9)
    plain = decode_jpeg(encode_jpeg(img, 90))
    rst = decode_jpeg(encode_jpeg(img, 90, restart_interval=3))
    # RST only changes framing, not coefficients: decodes are identical
    assert (plain == rst).all()


def test_grayscale_roundtrip():
    g = ((np.arange(32)[:, None] * np.arange(48)[None, :]) % 256).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(g, 95))
    assert out.shape == (32, 48, 3)
    assert (out[..., 0] == out[..., 1]).all() and (out[..., 1] == out[..., 2]).all()
    assert _psnr(np.repeat(g[:, :, None], 3, axis=2), out) >= 40.0


def test_corruption_returns_none():
    raw = encode_jpeg(_gradient(24, 24), 90, restart_interval=2)
    assert decode_jpeg(raw[: len(raw) // 2]) is None
    b = bytearray(raw)
    b[4] ^= 0xFF
    assert decode_jpeg(bytes(b)) is None
    assert decode_jpeg(b"not a jpeg at all") is None
    assert decode_jpeg(b"") is None


def test_decode_image_dispatch():
    from macrobase_spark.operators.image import decode_compressed_image, decode_image

    img = _gradient(24, 32)
    raw = encode_jpeg(img, 95)
    assert decode_image(raw) is not None
    assert decode_compressed_image("jpeg", raw) is not None
    with pytest.raises(NotImplementedError):
        decode_compressed_image("webp", raw)


def test_fixture_planted_recovery(spark):
    """decode_ok through the Spark feature pipeline matches the planted
    corrupt/truncated residues exactly."""
    from macrobase_spark.operators.image import image_features
    from macrobase_spark.sources.images import generate_jpeg_images

    n = 300
    feats = image_features(generate_jpeg_images(spark, n)).collect()
    assert len(feats) == n
    for r in feats:
        i = int(r["image_id"].split("_")[1])
        want_ok = not (i % 103 == 23 or i % 137 == 31)
        assert r["decode_ok"] == want_ok, (i, r["decode_ok"])
        if want_ok:
            assert r["width"] > 0 and 0.0 <= r["luma_mean"] <= 255.0

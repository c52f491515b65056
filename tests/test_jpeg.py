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
    # webp is real now (operators/webp.py): a jpeg payload is not a RIFF
    # container, so the webp decode path returns None rather than raising
    assert decode_compressed_image("webp", raw) is None


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


# ---- property-based gates (no Spark; pure numpy) ---------------------------

from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402


@settings(max_examples=25, deadline=None)
@given(
    h=st.integers(min_value=1, max_value=40),
    w=st.integers(min_value=1, max_value=40),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
    quality=st.integers(min_value=60, max_value=98),
    rst=st.sampled_from([0, 0, 2, 5]),
)
def test_roundtrip_total_function(h, w, seed, quality, rst):
    """Arbitrary sizes (incl. sub-8x8), content, quality, and restart
    intervals: encode→decode always succeeds with the declared shape and
    a sane error bound (lossy floor scales with quality)."""
    rng = np.random.default_rng(seed)
    # smooth-ish content: random low-frequency mix (pure noise has no
    # meaningful PSNR bound at low quality)
    y, x = np.mgrid[0:h, 0:w]
    img = np.zeros((h, w, 3))
    for c in range(3):
        a, b, p = rng.uniform(0, 2 * np.pi, 3)
        img[..., c] = 127 + 100 * np.sin(x * 0.2 + a) * np.cos(y * 0.15 + b) + 20 * np.sin(p)
    img = np.clip(img, 0, 255).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(img, quality=quality, restart_interval=rst))
    assert out is not None and out.shape == (h, w, 3)
    assert _psnr(img, out) >= 28.0


@settings(max_examples=40, deadline=None)
@given(
    cut=st.floats(min_value=0.01, max_value=0.99),
    flip_at=st.integers(min_value=2, max_value=10_000),
    seed=st.integers(min_value=0, max_value=1000),
)
def test_decode_is_total_on_mutations(cut, flip_at, seed):
    """decode_jpeg never raises on truncated or bit-flipped input — it
    returns an image or None (the scan kernels rely on this contract)."""
    img = _gradient(24, 32, seed=seed % 7)
    raw = encode_jpeg(img, 85, restart_interval=3 if seed % 2 else 0)
    trunc = raw[: max(2, int(len(raw) * cut))]
    decode_jpeg(trunc)  # must not raise
    b = bytearray(raw)
    b[flip_at % len(b)] ^= 0xFF
    decode_jpeg(bytes(b))  # must not raise

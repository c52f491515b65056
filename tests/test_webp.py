"""VP8L (lossless WebP) codec: exact round-trips across every encoder
flavor, decoder-only paths via hand-built bitstreams (color cache, COLOR
transform, 2D distance map), corruption rejection, and the planted-fixture
recovery through the Spark feature pass."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from macrobase_spark.operators.webp import (
    _Writer,
    _entropy_encode,
    _encode_subimage,
    _lz77_encode,
    _map_distance,
    _package_merge,
    _write_prefix_code,
    decode_vp8l_payload,
    decode_webp,
    encode_webp,
)
from macrobase_spark.sources.images import image_array


FLAVORS = [
    dict(),
    dict(subtract_green=True),
    dict(use_rle=True),
    dict(predictor=True),
    dict(predictor=True, subtract_green=True),
]


@pytest.mark.parametrize("size", [(1, 1), (3, 2), (16, 16), (33, 17), (64, 48)])
def test_round_trip_exact(size):
    w, h = size
    rng = np.random.default_rng(w * 100 + h)
    for img in [image_array(7, w, h), rng.integers(0, 256, (h, w, 3), np.uint8)]:
        for kw in FLAVORS:
            out = decode_webp(encode_webp(img, **kw))
            assert out is not None and np.array_equal(out, img), (size, kw)


@pytest.mark.parametrize("ncolors", [2, 4, 13, 200])
def test_palette_round_trip_all_bundlings(ncolors):
    """Color-indexing across every pixel-bundling width (8/4/2/1 px per
    byte), including widths that don't divide the bundle."""
    rng = np.random.default_rng(ncolors)
    colors = rng.integers(0, 256, (ncolors, 3), np.uint8)
    idx = rng.integers(0, ncolors, (11, 29))
    img = colors[idx]
    out = decode_webp(encode_webp(img, palette=True))
    assert out is not None and np.array_equal(out, img)


@settings(max_examples=25, deadline=None)
@given(
    w=st.integers(1, 20),
    h=st.integers(1, 20),
    seed=st.integers(0, 2**31),
    flavor=st.integers(0, len(FLAVORS) - 1),
)
def test_round_trip_property(w, h, seed, flavor):
    img = np.random.default_rng(seed).integers(0, 256, (h, w, 3), np.uint8)
    out = decode_webp(encode_webp(img, **FLAVORS[flavor]))
    assert out is not None and np.array_equal(out, img)


def test_package_merge_kraft_complete():
    rng = np.random.default_rng(3)
    for trial in range(50):
        n = int(rng.integers(2, 300))
        freqs = {int(s): int(rng.integers(1, 10_000)) for s in rng.choice(1000, n, replace=False)}
        for limit in (7, 15):
            if n > (1 << limit):  # no length-limited code exists
                continue
            lengths = _package_merge(freqs, limit)
            assert set(lengths) == set(freqs)
            assert max(lengths.values()) <= limit
            assert sum(2.0 ** -l for l in lengths.values()) == pytest.approx(1.0)


def test_corruption_rejected():
    img = image_array(1, 32, 24)
    raw = encode_webp(img)
    assert decode_webp(raw[: len(raw) // 2]) is None  # truncated container
    sig = bytearray(raw)
    sig[raw.index(b"VP8L") + 8] ^= 0xFF  # VP8L signature byte
    assert decode_webp(bytes(sig)) is None
    assert decode_webp(b"RIFF\x00\x00\x00\x00WEBP") is None
    assert decode_webp(raw[:12]) is None
    assert decode_webp(None) is None
    bad_ver = bytearray(raw)
    # version bits live in byte 1 of the payload (after the 0x2f signature):
    # w-1 fits 14 bits, so bits 28..30 of the LSB-first stream = byte 3
    i = raw.index(b"VP8L") + 8 + 1 + 3
    bad_ver[i] |= 0xE0
    assert decode_webp(bytes(bad_ver)) is None


def _header(bw: _Writer, w: int, h: int) -> None:
    bw.put(w - 1, 14)
    bw.put(h - 1, 14)
    bw.put(0, 1)
    bw.put(0, 3)


def test_color_cache_decode():
    """Hand-built stream: literal then a color-cache reference — the
    decoder path the encoder never emits."""
    px = (255 << 24) | (20 << 16) | (10 << 8) | 30
    idx = ((0x1E35A7BD * px) % (1 << 32)) >> 30  # cache_bits = 2
    bw = _Writer()
    _header(bw, 2, 1)
    bw.put(0, 1)  # no transforms
    bw.put(1, 1)
    bw.put(2, 4)  # cache bits
    bw.put(0, 1)  # no meta
    green = _write_prefix_code(bw, {10: 1, 280 + idx: 1}, 284)
    red = _write_prefix_code(bw, {20: 1}, 256)
    blue = _write_prefix_code(bw, {30: 1}, 256)
    alpha = _write_prefix_code(bw, {255: 1}, 256)
    _write_prefix_code(bw, {0: 1}, 40)  # distance: unused but required
    for tbl, s in [(green, 10), (red, 20), (blue, 30), (alpha, 255)]:
        code, ln = tbl[s]
        bw.put_code(code, ln)
    code, ln = green[280 + idx]
    bw.put_code(code, ln)
    out = decode_vp8l_payload(b"\x2f" + bw.tobytes())
    assert out is not None
    assert np.array_equal(out, np.array([[[20, 10, 30], [20, 10, 30]]], np.uint8))


def test_color_transform_inverse():
    """Hand-built stream with a COLOR transform: the decoder must undo the
    forward cross-channel deltas computed here."""
    rng = np.random.default_rng(11)
    w = h = 8
    img = rng.integers(0, 256, (h, w, 3), np.uint8)
    g2r, g2b, r2b = 37, -6, 17  # int8 multipliers

    def s8(v):
        return v - 256 if v >= 128 else v

    fwd = np.zeros(w * h, np.uint32)
    for i, (r, g, b) in enumerate(img.reshape(-1, 3).astype(int)):
        gs = s8(g)
        r2 = (r - ((g2r * gs) >> 5)) & 0xFF
        b2 = (b - ((g2b * gs) >> 5) - ((r2b * s8(r)) >> 5)) & 0xFF
        fwd[i] = (255 << 24) | (r2 << 16) | (g << 8) | b2
    elem = (0xFF << 24) | ((r2b & 0xFF) << 16) | ((g2b & 0xFF) << 8) | (g2r & 0xFF)
    bw = _Writer()
    _header(bw, w, h)
    bw.put(1, 1)
    bw.put(1, 2)  # COLOR transform
    bw.put(3 - 2, 3)  # 8x8 blocks -> one element
    _encode_subimage(bw, np.array([elem], np.uint32))
    bw.put(0, 1)  # end transforms
    bw.put(0, 1)  # no cache
    bw.put(0, 1)  # no meta
    _entropy_encode(bw, fwd, use_rle=False)
    out = decode_vp8l_payload(b"\x2f" + bw.tobytes())
    assert out is not None and np.array_equal(out, img)


def test_distance_map_backref():
    """Hand-built stream using a 2D distance code: (dx,dy)=(1,1) is code 3,
    which at width 4 addresses distance 5."""
    assert _map_distance(121, 10) == 1  # direct distances
    assert _map_distance(1, 10) == 10  # (0,1) -> one row up
    assert _map_distance(2, 10) == 1  # (1,0) -> previous pixel
    w, h = 4, 2
    lits = [(255 << 24) | ((i * 10 + 5) << 16) | ((i * 7 + 3) << 8) | (i * 3 + 1) for i in range(5)]
    lcode, lbits, lextra = _lz77_encode(3)  # copy length 3
    dcode, dbits, dextra = _lz77_encode(3)  # distance code 3 -> (1,1)
    bw = _Writer()
    _header(bw, w, h)
    bw.put(0, 1)  # no transforms
    bw.put(0, 1)  # no cache
    bw.put(0, 1)  # no meta
    ghist = {(p >> 8) & 0xFF: 1 for p in lits}
    ghist[256 + lcode] = 1
    green = _write_prefix_code(bw, _package_merge(ghist, 15), 280)
    red = _write_prefix_code(bw, _package_merge({(p >> 16) & 0xFF: 1 for p in lits}, 15), 256)
    blue = _write_prefix_code(bw, _package_merge({p & 0xFF: 1 for p in lits}, 15), 256)
    alpha = _write_prefix_code(bw, {255: 1}, 256)
    dist = _write_prefix_code(bw, {dcode: 1}, 40)
    for p in lits:
        for tbl, s in [
            (green, (p >> 8) & 0xFF),
            (red, (p >> 16) & 0xFF),
            (blue, p & 0xFF),
            (alpha, 255),
        ]:
            code, ln = tbl[s]
            bw.put_code(code, ln)
    code, ln = green[256 + lcode]
    bw.put_code(code, ln)
    bw.put(lextra, lbits)
    code, ln = dist[dcode]
    bw.put_code(code, ln)
    bw.put(dextra, dbits)
    out = decode_vp8l_payload(b"\x2f" + bw.tobytes())
    assert out is not None
    expect = np.array(lits + [lits[0], lits[1], lits[2]], np.uint32)
    rgb = np.stack([(expect >> 16) & 0xFF, (expect >> 8) & 0xFF, expect & 0xFF], axis=1)
    assert np.array_equal(out, rgb.astype(np.uint8).reshape(h, w, 3))


def test_webp_fixture_recovery(spark):
    """The planted signature/truncation corruptions — and ONLY those — land
    as decode_ok=false through the Spark feature pass, and clean images of
    every flavor decode to the exact synthesized pixels."""
    from macrobase_spark.operators.image import decode_image, image_features
    from macrobase_spark.sources.images import SIZES, generate_webp_images

    n = 400
    feats = image_features(generate_webp_images(spark, n)).toPandas()
    assert len(feats) == n
    expected_bad = {i for i in range(n) if i % 101 == 19 or i % 139 == 29}
    got_bad = {
        int(r.image_id.split("_")[1]) for r in feats.itertuples() if not r.decode_ok
    }
    assert got_bad == expected_bad
    # exact pixel recovery per flavor (flavors 3 and 4 encode the
    # posterized image, so that IS the expected content)
    rows = {
        int(r["image_id"].split("_")[1]): r["bytes"]
        for r in generate_webp_images(spark, 10).toPandas().to_dict("records")
    }
    for i in range(5):
        w, h = SIZES[i % len(SIZES)]
        img = image_array(i, w, h)
        if i % 5 >= 3:
            img = (img // 64) * 64
        out = decode_image(bytes(rows[i]))
        assert out is not None and np.array_equal(out, img), i

"""Pure-numpy FLAC codec: lossless round-trip (incl. hypothesis property),
CRC/corruption rejection, decoder paths (CONSTANT/VERBATIM/FIXED/LPC, escape
partitions, odd tails), and the decode_audio container dispatch that feeds
the one-scan SNR check. Reference: the engine's multimodal decode contract —
the reference repo (myrtakis/macrobase) does no binary decode."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from macrobase_spark.operators.audio import decode_audio, wav_bytes, wav_bytes_codec
from macrobase_spark.operators.flac import decode_flac, flac_bytes


def _tone(n, sr, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(n)
    return (
        3000 * np.sin(2 * np.pi * 220 * t / max(sr, 1))
        + 1200 * np.sin(2 * np.pi * 880 * t / max(sr, 1))
        + rng.normal(0, 80, n)
    ).astype(np.int16)


def _back_to_i16(out):
    return np.round(np.asarray(out) * 32768.0).astype(np.int64)


@pytest.mark.parametrize(
    "n,sr",
    [(0, 16000), (1, 8000), (37, 8000), (1600, 8000), (16000, 16000), (44100, 44100)],
)
def test_roundtrip_lossless(n, sr):
    pcm = _tone(n, sr, seed=n)
    b = flac_bytes(pcm, sr)
    dec = decode_flac(b)
    assert dec is not None
    sr2, out = dec
    assert sr2 == sr
    assert np.array_equal(_back_to_i16(out), pcm.astype(np.int64))


def test_roundtrip_decoder_paths():
    """Hit CONSTANT (flat), VERBATIM/escape (white noise at full scale),
    FIXED-only encode, and LPC encode — all must be bit-exact."""
    sr = 16000
    cases = {
        "constant": np.full(5000, -123, dtype=np.int16),
        "zeros": np.zeros(4096, dtype=np.int16),
        "fullscale_noise": np.random.default_rng(1).integers(
            -32768, 32768, 9000, dtype=np.int64
        ).astype(np.int16),
        "ramp": (np.arange(7000) % 20000 - 10000).astype(np.int16),
        "alternating_extremes": np.tile(
            np.array([-32768, 32767], dtype=np.int16), 3000
        ),
    }
    for name, pcm in cases.items():
        for use_lpc in (False, True):
            dec = decode_flac(flac_bytes(pcm, sr, use_lpc=use_lpc))
            assert dec is not None, (name, use_lpc)
            assert np.array_equal(_back_to_i16(dec[1]), pcm.astype(np.int64)), (
                name,
                use_lpc,
            )


@settings(max_examples=25, deadline=None)
@given(
    data=st.lists(st.integers(-32768, 32767), min_size=0, max_size=600),
    sr=st.sampled_from([8000, 16000, 22050, 44100]),
    use_lpc=st.booleans(),
)
def test_roundtrip_property(data, sr, use_lpc):
    pcm = np.array(data, dtype=np.int16)
    dec = decode_flac(flac_bytes(pcm, sr, use_lpc=use_lpc))
    assert dec is not None
    assert dec[0] == sr
    assert np.array_equal(_back_to_i16(dec[1]), pcm.astype(np.int64))


def test_corruption_rejected_not_raised():
    """Any structural violation or CRC mismatch returns None — never raises
    (executor kernels must not die on one bad clip)."""
    pcm = _tone(16000, 16000, seed=3)
    good = flac_bytes(pcm, 16000)
    assert decode_flac(good) is not None
    # truncations at every region boundary and a few odd offsets
    for cut in [0, 3, 4, 10, 41, len(good) // 2, len(good) - 1]:
        assert decode_flac(good[:cut]) is None, cut
    # single-byte flips through the frame section must be caught by CRC-8/16
    # (or the MD5 over decoded samples); audio-bearing bytes start after the
    # 4-byte magic + 4-byte header + 34-byte STREAMINFO.
    body_start = 42
    rng = np.random.default_rng(9)
    for _ in range(24):
        i = int(rng.integers(body_start, len(good)))
        bad = bytearray(good)
        bad[i] ^= 0xFF
        out = decode_flac(bytes(bad))
        assert out is None or np.array_equal(
            _back_to_i16(out[1]), pcm.astype(np.int64)
        ), i
    assert decode_flac(b"") is None
    assert decode_flac(b"fLaC") is None
    assert decode_flac(b"RIFF1234WAVE") is None


def test_md5_catches_silent_sample_damage():
    """The stream MD5 (STREAMINFO) is verified: swap it for a wrong digest
    and the decode must refuse even though every frame CRC is intact."""
    pcm = _tone(8000, 8000, seed=5)
    b = bytearray(flac_bytes(pcm, 8000))
    # STREAMINFO body = bytes 8..42; md5 = last 16 of it
    b[26:42] = bytes(16)  # all-zero md5 means "unknown" per spec -> allowed
    assert decode_flac(bytes(b)) is not None
    b[26] = 0x01  # non-zero wrong digest -> must be rejected
    assert decode_flac(bytes(b)) is None


def test_compression_is_real():
    """Speech-like tones must compress (< 0.8× of raw int16); this guards
    against a 'VERBATIM-everything' regression."""
    pcm = _tone(16000, 16000, seed=7)
    b = flac_bytes(pcm, 16000)
    assert len(b) < 0.8 * 2 * len(pcm)


def test_decode_audio_dispatch():
    """decode_audio sniffs the container: RIFF/WAVE (PCM and compressed
    tags) and native FLAC both land on (sr, float) with identical content
    for lossless paths."""
    pcm = _tone(16000, 16000, seed=11)
    via_wav = decode_audio(wav_bytes(pcm, 16000))
    via_flac = decode_audio(wav_bytes_codec(pcm, 16000, "flac"))
    assert via_wav is not None and via_flac is not None
    assert via_wav[0] == via_flac[0] == 16000
    assert np.array_equal(_back_to_i16(via_wav[1]), _back_to_i16(via_flac[1]))
    assert decode_audio(None) is None
    assert decode_audio(b"xx") is None

"""Polyphase windowed-sinc resampler: kernel accuracy on analytic tones,
exact delay compensation, degenerate-length safety, and the scored-relation
path over the real clips fixture at the 40 dB production bar."""

import numpy as np
import pytest

from macrobase_spark.operators.audio import snr_db
from macrobase_spark.operators.resample import (
    polyphase_filter,
    resample_check_sinc,
    resample_sinc,
)


def _tone(f0: float, sr: int, n: int) -> np.ndarray:
    return 0.8 * np.sin(2 * np.pi * f0 * np.arange(n) / sr)


@pytest.mark.parametrize("sr", [8000, 22050, 44100, 48000])
@pytest.mark.parametrize("f0", [100.0, 313.0, 500.0])
def test_kernel_snr_on_pure_tone(sr, f0):
    """A clean in-band tone survives rate conversion at >=60 dB full-signal
    (edge transients included — reflection padding keeps them small); the
    linear path bottoms out near 36 dB on the worst case."""
    x = _tone(f0, sr, sr // 5)
    y = resample_sinc(x, sr, 16000)
    assert len(y) == max(int(round(len(x) * 16000 / sr)), 1)
    ref = _tone(f0, 16000, len(y))
    assert snr_db(ref, y) >= 60.0, (sr, f0, snr_db(ref, y))


def test_delay_compensation_exact():
    """The output is phase-aligned to the input timeline: cross-correlation
    against the analytic render peaks at lag 0 (a half-sample polyphase
    shift would move it)."""
    x = _tone(440.0, 48000, 9600)
    y = resample_sinc(x, 48000, 16000)
    ref = _tone(440.0, 16000, len(y))
    lags = range(-3, 4)
    scores = [float(np.dot(y[3 + g : len(y) - 3 + g], ref[3 : len(ref) - 3])) for g in lags]
    assert list(lags)[int(np.argmax(scores))] == 0


def test_identity_and_degenerate_lengths():
    x = _tone(200.0, 16000, 1000)
    assert resample_sinc(x, 16000, 16000) is x  # passthrough, no copy
    for n in [1, 2, 5, 16, 25, 26]:
        out = resample_sinc(np.ones(n), 8000, 16000)
        assert len(out) == max(int(round(n * 2)), 1)
        assert np.all(np.isfinite(out))


def test_filter_table_shape_and_dc_gain():
    """Polyphase rows re-interleave to the prototype; DC gain is L within
    window ripple (each phase sums to ~1 after the L compensation)."""
    for L, M in [(2, 1), (160, 441), (320, 441), (1, 3)]:
        H = polyphase_filter(L, M)
        assert H.shape[0] == L
        phase_sums = H.sum(axis=1)
        assert np.allclose(phase_sums, phase_sums.mean(), atol=5e-3)


def test_antialiasing_beats_linear_on_downsample():
    """Out-of-band content must die: a 10 kHz tone sampled at 48 kHz is
    above the 16 kHz Nyquist — sinc suppresses it; linear aliases it into
    band. Residual out/in power ratio must be at least 30 dB apart."""
    sr, n = 48000, 9600
    x = _tone(10_000.0, sr, n)
    y = resample_sinc(x, sr, 16000)
    lin = np.interp(
        np.arange(int(round(n / 3))) * 3.0, np.arange(n, dtype=float), x
    )
    k = 100
    p_sinc = float((y[k:-k] ** 2).mean())
    p_lin = float((lin[k:-k] ** 2).mean())
    assert p_lin / max(p_sinc, 1e-30) > 1000.0  # > 30 dB suppression gap


def test_scored_relation_over_clips_fixture(spark):
    """Every decodable fixture clip passes the 40 dB bar (the linear path
    fails most 8 kHz clips at this bar); corrupt payloads come out
    decode_ok=false; output lengths track the rate ratio."""
    from macrobase_spark.sources.clips import generate_clips

    clips = generate_clips(spark, 400, max_payload_ms=100)
    got = resample_check_sinc(clips, target_sr=16000).collect()
    assert sum(1 for r in got if not r["decode_ok"]) > 0
    for r in got:
        if r["decode_ok"]:
            assert r["snr_pass"], (r["clip_id"], r["snr_db"])
            assert r["n_out"] > 0

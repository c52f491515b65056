"""Property-based gates for the audio scoring kernel (no Spark session —
pure numpy/pyarrow, so hypothesis can afford many examples).

The batch scorer expands Σ(P−ref)² = ΣP² − 2ΣP·ref + Σref² and caches the
reference powers; these tests pin it to the naive per-clip definition
(decode_wav → render_reference → snr_db) on arbitrary clip mixes, and pin
decode_wav's total-function contract on arbitrary byte mutations."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from macrobase_spark.operators.audio import (
    decode_wav,
    render_reference,
    score_record_batch,
    snr_db,
    tone_hz,
    wav_bytes,
)


def _clip_payload(idx: int, sr: int, ns: int, noise_amp: float, rng_seed: int) -> bytes:
    """A clip like the fixture's: quantized reference render + optional noise."""
    ref = render_reference(idx, sr, ns)
    rng = np.random.default_rng(rng_seed)
    sig = ref + noise_amp * rng.standard_normal(ns)
    pcm = np.clip(np.round(sig * 32768.0), -32768, 32767).astype(np.int16)
    return wav_bytes(pcm, sr)


clip_strategy = st.tuples(
    st.integers(min_value=0, max_value=10**9),        # clip index
    st.sampled_from([8000, 16000, 22050, 44100]),     # sr
    st.integers(min_value=0, max_value=3000),         # n_samples
    st.sampled_from([0.0, 0.001, 0.01, 0.2]),         # noise amplitude
    st.sampled_from(["ok", "ok", "ok", "truncated", "garbage", "empty"]),
)


def _batch(clips):
    rows = []
    for i, (idx, sr, ns, amp, mode) in enumerate(clips):
        payload = _clip_payload(idx, sr, ns, amp, rng_seed=idx + ns)
        if mode == "truncated":
            payload = payload[: max(0, len(payload) - 1 - ns)]
        elif mode == "garbage":
            payload = b"\x00" * len(payload)
        elif mode == "empty":
            payload = b""
        rows.append(
            {
                "clip_id": f"clip_{idx:012d}",
                "sr_hz": sr,
                "dur_ms": int(1000 * ns / sr),
                "codec": "pcm16",
                "transcript": f"t{i}",
                "bytes": payload,
            }
        )
    return pa.RecordBatch.from_pylist(rows)


@settings(max_examples=40, deadline=None)
@given(st.lists(clip_strategy, min_size=1, max_size=12))
def test_batch_scorer_matches_naive_definition(clips):
    out = score_record_batch(_batch(clips)).to_pylist()
    assert len(out) == len(clips)
    for row, (idx, sr, ns, amp, mode) in zip(out, clips):
        payload = _clip_payload(idx, sr, ns, amp, rng_seed=idx + ns)
        if mode == "truncated":
            payload = payload[: max(0, len(payload) - 1 - ns)]
        elif mode == "garbage":
            payload = b"\x00" * len(payload)
        elif mode == "empty":
            payload = b""
        dec = decode_wav(payload)
        if dec is None:
            assert not row["decode_ok"]
            assert row["snr_db"] == float("-inf")
            continue
        dsr, pcm = dec
        assert row["decode_ok"]
        assert row["sr_match"] == (dsr == sr)
        ref = render_reference(idx, dsr, len(pcm))
        expected = snr_db(ref, pcm)
        got = row["snr_db"]
        if np.isinf(expected) or np.isinf(got):
            # ns == 0 → -inf (no signal); exact render → +inf. The expanded
            # form must agree on the inf sign, not just be "large".
            assert got == expected
        else:
            # the algebraic expansion may differ from the direct subtraction
            # only at fp-rounding level: for a noiseless clip the noise power
            # is floored by int16 quantization (~1e-10·ps) while the
            # cancellation error is ~1e-15·ps. In dB that lands ~1e-5 for
            # typical lengths, but hypothesis found a 1.01e-4 dB case
            # (idx=6882, sr=22050, ns=2156 — quantization noise power near a
            # rounding boundary), so the bound is 5e-4: still five orders of
            # magnitude inside the 30 dB decision margin, and the deviation
            # only ever appears on clips scoring far above the threshold
            assert abs(got - expected) < 5e-4, (got, expected, idx, sr, ns, amp)


@settings(max_examples=60, deadline=None)
@given(
    st.integers(min_value=0, max_value=10**6),
    st.sampled_from([8000, 16000, 44100]),
    st.integers(min_value=0, max_value=500),
    st.integers(min_value=0, max_value=60),
)
def test_decode_wav_total_on_mutations(idx, sr, ns, cut):
    """decode_wav never raises: any truncation either round-trips or is
    None; successful decodes round-trip the sample rate and length."""
    payload = _clip_payload(idx, sr, ns, 0.0, rng_seed=idx)
    mutated = payload[: len(payload) - cut]
    dec = decode_wav(mutated)
    if dec is not None:
        dsr, pcm = dec
        assert dsr == sr
        # the data-length header survived the cut, so the samples did too
        assert len(pcm) <= ns
    full = decode_wav(payload)
    assert full is not None
    assert full[0] == sr and len(full[1]) == ns


def test_reference_render_cache_consistency():
    """tone_hz is the only coupling between clip index and render; the same
    (sr, ns, f0) must yield identical cached and uncached powers."""
    idx = np.array([123456], dtype=np.uint64)
    f0 = float(tone_hz(idx)[0])
    r1 = render_reference(123456, 16000, 1600)
    r2 = 0.8 * np.sin(2 * np.pi * f0 * (np.arange(1600) / 16000.0))
    # render uses the libm-free rotation kernel (sin_samples): equal to the
    # libm sine to 1e-9, and bit-identical to itself across calls
    assert np.abs(r1 - r2).max() < 1e-9
    assert np.array_equal(r1, render_reference(123456, 16000, 1600))


def test_sin_samples_matches_libm():
    """The libm-free rotation render == np.sin to 1e-9 across block
    boundaries, long renders, and awkward frequencies (hypothesis-style
    grid; the 4096-block reseed bounds cumprod drift)."""
    import numpy as np
    from macrobase_spark.operators.audio import sin_samples

    for f0, sr, n in [
        (100.0, 8000, 1),
        (100.0, 8000, 4096),
        (100.0, 8000, 4097),
        (499.9, 48000, 10_000),
        (250.5, 16000, 1600),
        (355.0, 22050, 123_457),
    ]:
        w = 2 * np.pi * f0 / sr
        got = sin_samples(w, n)
        want = np.sin(w * np.arange(n, dtype=np.float64))
        assert np.abs(got - want).max() < 1e-9, (f0, sr, n)


def test_sin_samples_phase():
    """Phased render == np.sin(w·k + φ) to 1e-9, and phase=0.0 is
    bit-identical to the two-arg form (cached fixtures keyed on render
    output stay valid across the signature extension)."""
    import numpy as np
    from macrobase_spark.operators.audio import sin_samples

    rng = np.random.default_rng(7)
    for _ in range(25):
        w = float(rng.uniform(1e-4, 3.0))
        n = int(rng.integers(5, 20000))
        ph = float(rng.uniform(0, 2 * np.pi))
        got = sin_samples(w, n, phase=ph)
        want = np.sin(w * np.arange(n, dtype=np.float64) + ph)
        assert np.abs(got - want).max() < 1e-9, (w, n, ph)
    assert np.array_equal(sin_samples(0.123, 9000), sin_samples(0.123, 9000, phase=0.0))

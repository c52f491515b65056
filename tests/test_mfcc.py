"""MFCC featurizer: known-tone behavior, framing edges, determinism, and
the Arrow-scan operator over the generated clips table."""

import numpy as np
import pytest

from macrobase_spark.operators.mfcc import (
    dct_matrix,
    extract_mfcc,
    mel_filterbank,
    mfcc_clip,
)


def _tone(sr: int, hz: float, ms: float) -> np.ndarray:
    t = np.arange(int(sr * ms / 1000.0)) / sr
    return 0.5 * np.sin(2 * np.pi * hz * t)


def test_filterbank_shape_and_coverage():
    sr, n_fft = 16000, 400
    fb = mel_filterbank(sr, n_fft)
    assert fb.shape == (26, n_fft // 2 + 1)
    assert np.all(fb >= 0)
    # every filter has support, and mid-spectrum bins are covered
    assert np.all(fb.sum(axis=1) > 0)
    mid = slice(n_fft // 8, 3 * n_fft // 8)
    assert np.all(fb.sum(axis=0)[mid] > 0)


def test_dct_is_orthonormal():
    d = dct_matrix(13, 26)
    assert np.allclose(d @ d.T, np.eye(13), atol=1e-12)


def test_tone_separation_and_determinism():
    sr = 16000
    a = mfcc_clip(_tone(sr, 440.0, 200), sr)
    b = mfcc_clip(_tone(sr, 3000.0, 200), sr)
    a2 = mfcc_clip(_tone(sr, 440.0, 200), sr)
    assert a.shape == (1 + (3200 - 400) // 160, 13)
    assert np.array_equal(a, a2)  # bit-for-bit deterministic
    # distinct tones land in distinct cepstral shapes
    assert np.linalg.norm(a.mean(axis=0) - b.mean(axis=0)) > 1.0


def test_short_clip_pads_to_one_frame():
    sr = 8000
    m = mfcc_clip(np.ones(10), sr)  # far below the 200-sample frame
    assert m.shape[0] == 1
    assert np.all(np.isfinite(m))


def test_silence_is_finite():
    m = mfcc_clip(np.zeros(4000), 16000)
    assert np.all(np.isfinite(m))
    # all-silent frames are identical
    assert np.allclose(m, m[0])


def test_extract_mfcc_over_clips(spark):
    from macrobase_spark.sources.clips import generate_clips

    n = 500
    df = generate_clips(spark, n, max_payload_ms=60)
    pdf = extract_mfcc(df).toPandas()
    assert len(pdf) == n
    # the fixture plants duplicate clip_ids (for the uniqueness check), so
    # iterate rows; corrupt plants (id % 401 == 5, always corrupt regardless
    # of codec) must fail decode, clean decodes must yield finite vectors
    for row in pdf.itertuples():
        i = int(row.clip_id.split("_")[1])
        if i % 401 == 5:
            assert not row.decode_ok
        elif row.decode_ok:
            v = np.asarray(row.mfcc)
            assert v.shape == (13,) and np.all(np.isfinite(v))
            assert row.n_frames >= 1
    assert pdf["decode_ok"].sum() > 0.9 * n


def test_extract_mfcc_parallelism_invariance(spark):
    from macrobase_spark.sources.clips import generate_clips

    a = (
        extract_mfcc(generate_clips(spark, 200, max_payload_ms=40, partitions=1))
        .toPandas()
        .sort_values("clip_id")
        .reset_index(drop=True)
    )
    b = (
        extract_mfcc(generate_clips(spark, 200, max_payload_ms=40, partitions=7))
        .toPandas()
        .sort_values("clip_id")
        .reset_index(drop=True)
    )
    assert a["decode_ok"].equals(b["decode_ok"])
    for va, vb in zip(a["mfcc"], b["mfcc"]):
        if va is None or vb is None:
            assert va is vb or (len(va or []) == 0 and len(vb or []) == 0)
        else:
            assert np.array_equal(np.asarray(va), np.asarray(vb))

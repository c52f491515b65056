"""Audio feature extraction: dominant frequency recovers the synthesized
tone; corrupt clips are flagged not-decodable."""

import numpy as np
from pyspark.sql import functions as F

from macrobase_spark.operators.audio import extract_audio_features, tone_hz
from macrobase_spark.sources.clips import _is_corrupt, generate_clips


def test_dominant_freq_matches_tone(spark):
    clips = generate_clips(spark, 400)
    codecs = {r["clip_id"]: r["codec"] for r in clips.select("clip_id", "codec").collect()}
    feats = {r["clip_id"]: r for r in extract_audio_features(clips).collect()}
    checked = 0
    for cid, r in feats.items():
        idx = int(cid.split("_")[1])
        corrupted = _is_corrupt(idx, codecs[cid]) or idx % 601 == 9
        if corrupted:
            assert not r["decode_ok"]
            continue
        assert r["decode_ok"]
        f0 = float(tone_hz(np.array([idx], dtype=np.uint64))[0])
        # rFFT bin resolution: sr / n_samples; payloads are >= 0.2s → <= 5 Hz
        assert abs(r["dominant_freq_hz"] - f0) <= 6.0, (cid, r["dominant_freq_hz"], f0)
        # 0.8 amplitude sine → rms ≈ 0.8/sqrt(2), no clipping
        assert abs(r["rms"] - 0.8 / np.sqrt(2)) < 0.02
        assert r["clipping_ratio"] == 0.0
        checked += 1
    assert checked > 300


# -- compressed codecs (G.711 mu-law/A-law, IMA ADPCM) ----------------------


def test_g711_and_adpcm_wav_roundtrip():
    """Real compressed WAVs (format tags 7/6/0x11) decode through
    decode_wav with SNR >= 30 dB vs the clean signal; corruption classes
    all land as None."""
    import numpy as np

    from macrobase_spark.operators.audio import (
        decode_wav,
        render_reference,
        wav_bytes,
        wav_bytes_codec,
    )

    sr = 16000
    sig = render_reference(7, sr, sr * 2)
    pcm = (sig * 32767).astype(np.int16)

    def snr(dec):
        n = min(len(sig), len(dec))
        err = dec[:n] - sig[:n]
        return 10 * np.log10((sig[:n] ** 2).sum() / max((err**2).sum(), 1e-30))

    for codec, min_db in [("mulaw", 35.0), ("alaw", 35.0), ("adpcm", 30.0)]:
        raw = wav_bytes_codec(pcm, sr, codec)
        out = decode_wav(raw)
        assert out is not None, codec
        got_sr, dec = out
        assert got_sr == sr and len(dec) == len(pcm), codec
        assert snr(dec) >= min_db, (codec, snr(dec))
        assert len(raw) < len(wav_bytes(pcm, sr)) * 0.55, codec  # actually compressed
        assert decode_wav(raw[: len(raw) // 2]) is None, codec  # truncated
    # PCM16 still decodes bit-exactly through the chunk walker
    s0, d0 = decode_wav(wav_bytes(pcm, sr))
    assert s0 == sr and np.array_equal((d0 * 32768).astype(np.int16), pcm)
    assert decode_wav(b"garbage" * 20) is None


def test_adpcm_block_vectorization_matches_scalar():
    """The block-vectorized IMA decode equals a straightforward per-sample
    scalar decode (the spec algorithm) on random nibbles."""
    import numpy as np

    from macrobase_spark.operators.codecs import (
        IMA_INDEX_TABLE,
        IMA_STEP_TABLE,
        ima_adpcm_decode_blocks,
    )

    rng = np.random.default_rng(5)
    nib = rng.integers(0, 16, (8, 64), dtype=np.uint8)
    preds = rng.integers(-3000, 3000, 8).astype(np.int16)
    idxs = rng.integers(0, 60, 8).astype(np.int32)
    got = ima_adpcm_decode_blocks(nib, preds, idxs)
    for b in range(8):
        pred, index = int(preds[b]), int(idxs[b])
        assert got[b, 0] == pred
        for s in range(64):
            code = int(nib[b, s])
            step = int(IMA_STEP_TABLE[index])
            diff = step >> 3
            if code & 1:
                diff += step >> 2
            if code & 2:
                diff += step >> 1
            if code & 4:
                diff += step
            pred = pred - diff if code & 8 else pred + diff
            pred = max(-32768, min(32767, pred))
            index = max(0, min(88, index + int(IMA_INDEX_TABLE[code & 7])))
            assert got[b, s + 1] == pred, (b, s)


def test_codec_clips_planted(spark):
    """The codec fixture flows through snr_check with the REAL compressed
    decode: planted garbage/truncation recovered exactly; every clean clip
    of every codec clears the lossy-codec 25 dB bar (worst-case 4:1
    ADPCM at 8 kHz bottoms out ~29 dB; G.711 sits 35-40)."""
    from macrobase_spark.operators.audio import snr_check
    from macrobase_spark.sources.clips import generate_codec_clips

    n = 400
    clips = generate_codec_clips(spark, n)
    rows = {r["clip_id"]: r for r in snr_check(clips, min_snr_db=25.0).collect()}
    assert len(rows) == n
    for i in range(n):
        r = rows[f"clip_{i:012d}"]
        corrupt = i % 127 == 21 or i % 149 == 33
        assert r["decode_ok"] == (not corrupt), i
        if not corrupt:
            assert r["snr_pass"] and r["snr_db"] >= 25.0, (i, r["snr_db"])


def test_resample_clips(spark):
    """Linear-interp resample: length scales by sr ratio, a pure tone
    survives with high SNR vs the reference render at the NEW rate, and
    compressed (mu-law) inputs re-emit as PCM16; corrupt rows pass through
    flagged."""
    import numpy as np

    from macrobase_spark.operators.audio import (
        decode_wav,
        render_reference,
        resample_clips,
        wav_bytes,
        wav_bytes_codec,
    )

    sr_in, sr_out = 44100, 16000
    sig = render_reference(3, sr_in, sr_in // 2)  # 0.5 s
    pcm = (sig * 32767).astype(np.int16)
    rows = [
        ("clip_000000000003", bytearray(wav_bytes(pcm, sr_in))),
        ("mu", bytearray(wav_bytes_codec(pcm, sr_in, "mulaw"))),
        ("bad", bytearray(b"garbage bytes not riff")),
    ]
    df = spark.createDataFrame(rows, "clip_id string, bytes binary")
    got = {r["clip_id"]: r for r in resample_clips(df, sr_out).collect()}
    assert not got["bad"]["decode_ok"] and got["bad"]["bytes"] is None
    for key, min_db in [("clip_000000000003", 40.0), ("mu", 30.0)]:
        r = got[key]
        assert r["decode_ok"] and r["sr_hz"] == sr_out
        assert abs(r["n_samples"] - sr_in // 2 * sr_out / sr_in) <= 1
        sr2, dec = decode_wav(bytes(r["bytes"]))
        assert sr2 == sr_out
        ref = render_reference(3, sr_out, len(dec))
        err = dec - ref
        snr = 10 * np.log10((ref**2).sum() / (err**2).sum())
        assert snr >= min_db, (key, snr)

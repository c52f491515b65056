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

"""Silence/dead-air operator: run-length kernel, exact planted recovery,
and oracle-shape checks."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from macrobase_spark.operators.silence import (
    _run_lengths,
    classify_silence,
    generate_silence_clips,
    silence_features,
)


def test_run_lengths_kernel():
    q = np.array([1, 1, 0, 0, 1, 0, 1, 1, 1], dtype=bool)
    starts, lens = _run_lengths(q)
    assert starts.tolist() == [0, 4, 6] and lens.tolist() == [2, 1, 3]
    s2, l2 = _run_lengths(np.zeros(5, dtype=bool))
    assert len(s2) == 0 and len(l2) == 0
    s3, l3 = _run_lengths(np.ones(4, dtype=bool))
    assert s3.tolist() == [0] and l3.tolist() == [4]


def expected_class(i: int) -> str:
    if i % 23 == 4:
        return "dead_clip"
    if i % 7 == 2:
        return "dead_air"
    if i % 5 in (1, 3):
        return "padded"
    return "ok"


@pytest.fixture(scope="module")
def feats(spark):
    clips = generate_silence_clips(spark, 500)
    return classify_silence(silence_features(clips)).cache()


def test_planted_recovery_exact(feats):
    got = {r["clip_id"]: r["silence_class"] for r in feats.collect()}
    assert len(got) == 500
    for i in range(500):
        assert got[f"sclip_{i:09d}"] == expected_class(i), (i, got[f"sclip_{i:09d}"])


def test_feature_values(feats):
    rows = {r["clip_id"]: r for r in feats.collect()}
    # fully silent clip: ratio 1, leading span = whole 400 ms
    dead = rows["sclip_000000004"]
    assert dead["silence_ratio"] == 1.0 and dead["leading_ms"] == 400.0
    # dead-air clip: the 150 ms gap dominates the longest run
    gap = rows["sclip_000000002"]
    assert 149.0 <= gap["longest_ms"] <= 152.0 and gap["silence_class"] == "dead_air"
    # leading-pad clip i=1: pad = 55 + 10*(1%4) = 65 ms
    pad = rows["sclip_000000001"]
    assert 64.0 <= pad["leading_ms"] <= 67.0 and pad["trailing_ms"] < 1.0
    # clean tone: only zero-crossing samples are quiet
    ok = rows["sclip_000000000"]
    assert ok["silence_ratio"] < 0.02 and ok["longest_ms"] < 1.0


def test_fused_equals_standalone(spark):
    """The silence columns fused into the suite's decode scan
    (audio.score_record_batch, int16 compare) equal the standalone
    operator's (float compare) BIT FOR BIT on silence-planted clips —
    two independent implementations of the same contract."""
    from macrobase_spark.operators.audio import score_clips

    src = generate_silence_clips(spark, 300).toPandas()
    src["idx"] = src["clip_id"].str.slice(6).astype(int)
    src["clip_id"] = src["idx"].map(lambda i: f"clip_{i:012d}")
    clips = spark.createDataFrame(
        src.assign(sr_hz=16000, dur_ms=400, codec="pcm16", transcript="x")[
            ["clip_id", "sr_hz", "dur_ms", "codec", "transcript", "bytes"]
        ]
    ).withColumn("sr_hz", F.col("sr_hz").cast("int")).withColumn(
        "dur_ms", F.col("dur_ms").cast("int")
    )
    fused = (
        score_clips(clips)
        .select(
            "clip_id",
            "silence_ratio",
            "silence_lead_ms",
            "silence_trail_ms",
            "silence_longest_ms",
            "n_silence_runs",
        )
        .toPandas()
        .set_index("clip_id")
        .sort_index()
    )
    standalone = (
        silence_features(clips.select("clip_id", "bytes"))
        .toPandas()
        .set_index("clip_id")
        .sort_index()
    )
    assert len(fused) == len(standalone) == 300
    pairs = [
        ("silence_ratio", "silence_ratio"),
        ("silence_lead_ms", "leading_ms"),
        ("silence_trail_ms", "trailing_ms"),
        ("silence_longest_ms", "longest_ms"),
        ("n_silence_runs", "n_silence_runs"),
    ]
    for fcol, scol in pairs:
        assert (fused[fcol].to_numpy() == standalone[scol].to_numpy()).all(), fcol


def test_stats_query_oracle_shape(spark, tmp_path):
    """The registered aggregate matches a direct pandas reimplementation on
    the same feature rows (engine-independent ground truth)."""
    clips = generate_silence_clips(spark, 300)
    feats = classify_silence(silence_features(clips))
    pdf = feats.toPandas()
    want = (
        pdf.groupby("silence_class")
        .agg(n=("clip_id", "size"), avg_ratio=("silence_ratio", "mean"))
        .reset_index()
    )
    got = feats.groupBy("silence_class").agg(
        F.count(F.lit(1)).alias("n"), F.avg("silence_ratio").alias("avg_ratio")
    ).toPandas()
    m = got.merge(want, on="silence_class", suffixes=("_s", "_p"))
    assert len(m) == len(want) == len(got)
    assert (m["n_s"] == m["n_p"]).all()
    assert np.allclose(m["avg_ratio_s"], m["avg_ratio_p"], atol=1e-9)

"""Fused QA scorecard: every planted defect fires exactly its flag,
clean clips pass, and the registered one-row audit matches DuckDB."""

import duckdb
import pytest

from macrobase_spark.operators.scorecard import (
    classify_scorecard,
    generate_qa_clips,
    scorecard_features,
)
from macrobase_spark.queries import ORACLES, QUERIES

SF = "/root/testdata/sf0.01"


def _expected_defect(i: int) -> str:
    if i % 41 == 13:
        return "flag_undecodable"  # corrupt payload → decode_status='failed'
    if i % 37 == 12:
        return "skipped_compressed"  # mp3 stream: out of decode scope
    if i % 31 == 8:
        return "flag_silent"
    if i % 13 == 2:
        return "flag_hum"
    if i % 11 == 5:
        return "flag_upsampled"
    if i % 19 == 7:
        return "flag_clipped"
    if i % 23 == 9:
        return "flag_quiet"
    if i % 29 == 11:
        return "flag_dead_air"
    return "clean"


def test_planted_defects_fire_their_flags(spark):
    n = 300
    rows = classify_scorecard(
        scorecard_features(generate_qa_clips(spark, n))
    ).collect()
    assert len(rows) == n
    for r in rows:
        i = int(r["clip_id"].split("_")[1])
        want = _expected_defect(i)
        if want == "clean":
            assert r["qa_pass"], (i, r)
            assert r["decode_status"] == "ok", (i, r)
        elif want == "skipped_compressed":
            # out-of-scope codec: reported as skipped, NOT as a decode
            # failure, and excluded from qa_pass
            assert r["decode_status"] == "skipped_compressed", (i, r)
            assert not r["flag_undecodable"], (i, r)
            assert not r["qa_pass"], (i, r)
        else:
            assert r[want], (i, want, r)
            assert not r["qa_pass"], (i, r)
            if want == "flag_undecodable":
                assert r["decode_status"] == "failed", (i, r)


def test_one_decode_per_clip_schema(spark):
    feats = scorecard_features(generate_qa_clips(spark, 40))
    got = feats.collect()
    assert len(got) == 40
    # every decodable clip fills every feature column
    for r in got:
        if r["decode_ok"] and r["silence_ratio"] < 0.99:
            assert r["rms_dbfs"] is not None
            assert r["bandwidth_ratio"] is not None
            assert r["voiced_ratio"] is not None


def test_registered_query_matches_oracle(spark):
    got = QUERIES["clips_qa_scorecard"](spark, SF).collect()
    want = duckdb.sql(ORACLES["clips_qa_scorecard"]).fetchall()
    assert len(got) == len(want) == 1
    g, w = got[0], want[0]
    assert tuple(g)[:-1] == w[:-1]
    assert g["avg_rms_dbfs"] == pytest.approx(w[-1], abs=1e-2)
    assert g["n_pass"] > 0 and g["n_pass"] < g["n"]


def test_scorecard_stream_matches_batch(spark, tmp_path):
    """The fused scan is a stateless mapInArrow, so it runs UNCHANGED on a
    streaming DataFrame (the validate.py design) — stream output must equal
    the batch relation row-for-row."""
    src = str(tmp_path / "qa_src")
    clips = generate_qa_clips(spark, 120)
    clips.write.mode("overwrite").parquet(src)
    batch = {
        r["clip_id"]: tuple(r)
        for r in classify_scorecard(
            scorecard_features(spark.read.parquet(src))
        ).collect()
    }
    stream = spark.readStream.schema("clip_id string, bytes binary").parquet(src)
    q = (
        classify_scorecard(scorecard_features(stream))
        .writeStream.format("memory")
        .queryName("qa_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            r["clip_id"]: tuple(r) for r in spark.sql("select * from qa_stream").collect()
        }
    finally:
        q.stop()
    assert got == batch
    assert len(got) == 120


def test_short_clip_flags_short_not_null(spark):
    """A decodable clip under one analysis frame must land in flag_short
    with a definite (non-NULL) qa_pass=false — not vanish via 3VL."""
    import numpy as np

    from macrobase_spark.operators.audio import wav_bytes

    pcm = (0.3 * np.sin(np.arange(1440) * 0.1) * 32767).astype(np.int16)
    df = spark.createDataFrame(
        [("short_0", wav_bytes(pcm, 48000))], "clip_id string, bytes binary"
    )
    r = classify_scorecard(scorecard_features(df)).collect()[0]
    assert r["decode_ok"]
    assert r["flag_short"] is True
    assert r["qa_pass"] is False

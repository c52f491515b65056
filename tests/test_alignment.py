"""Cross-modal transcript/audio alignment: flag semantics on hand-built
relations, planted misalignments from the real silence fixture, LEFT
join semantics for lost annotations, and oracle agreement."""

import duckdb
import pytest

from macrobase_spark.operators.alignment import (
    alignment_flags,
    srt_for_silence_clips,
)
from macrobase_spark.operators.srt import srt_cues
from macrobase_spark.queries import ORACLES, QUERIES

SF = "/root/testdata/sf0.01"


def _flags(spark, feats_rows, cues_rows):
    feats = spark.createDataFrame(
        feats_rows, "clip_id string, silence_ratio double"
    )
    cues = spark.createDataFrame(
        cues_rows, "clip_id string, dur_ms int, start_ms int, end_ms int"
    )
    return {r["clip_id"]: r["flag"] for r in alignment_flags(feats, cues).collect()}


def test_flag_semantics(spark):
    v = _flags(
        spark,
        [("dead", 1.0), ("speech", 0.1), ("fine", 0.2), ("quietish", 0.8)],
        [
            ("dead", 1000, 0, 800),      # cues over fully-silent audio
            ("fine", 1000, 0, 700),      # normal
            ("quietish", 1000, 0, 20),   # low coverage but not speech-silent
        ],
    )
    assert v["dead"] == "cues_over_silence"
    assert v["speech"] == "untranscribed_speech"  # no cue rows at all -> LEFT miss
    assert v["fine"] == "ok"
    assert v["quietish"] == "ok"  # silence_ratio 0.8 escapes both rules


def test_planted_misalignments_from_real_fixture(spark):
    from macrobase_spark.operators.silence import (
        generate_silence_clips,
        silence_features,
    )

    feats = silence_features(generate_silence_clips(spark, 300))
    cues = srt_cues(srt_for_silence_clips(feats))
    v = {r["clip_id"]: r["flag"] for r in alignment_flags(feats, cues).collect()}
    # id 4: dead clip (%23==4) WITH a normal transcript -> misaligned
    assert v["sclip_000000004"] == "cues_over_silence"
    # id 6: audible tone (%11==6 -> empty transcript) -> untranscribed
    assert v["sclip_000000006"] == "untranscribed_speech"
    # id 50 (=4 mod 23, =6 mod 11) is dead AND untranscribed -> consistent
    # pair, no flag
    assert v["sclip_000000050"] == "ok"
    assert v["sclip_000000000"] == "ok"
    counts = {}
    for f in v.values():
        counts[f] = counts.get(f, 0) + 1
    assert counts["cues_over_silence"] >= 10 and counts["untranscribed_speech"] >= 20


def test_cue_grain_silence_overlap(spark):
    """The finer check: the planted mid-clip dead-air gap drags EXACTLY
    the cue that overlaps it; clean tone clips have zero silent
    fraction everywhere; LEFT-join misses (no silence spans) must read
    as 0, not 1 (Spark's least/greatest skip nulls — regression)."""
    from macrobase_spark.operators.alignment import (
        cue_silence_fractions,
        silence_spans,
    )
    from macrobase_spark.operators.silence import (
        generate_silence_clips,
        silence_features,
    )

    clips = generate_silence_clips(spark, 120)
    v = cue_silence_fractions(
        srt_cues(srt_for_silence_clips(silence_features(clips))),
        silence_spans(clips),
    )
    rows = v.collect()
    by = {}
    for r in rows:
        by.setdefault(r["clip_id"], {})[r["cue_idx"]] = (r["silent_frac"], r["flag"])
    # clean tone: no spans at all -> every cue 0.0 (the null-guard case)
    assert all(f == 0.0 for f, _ in by["sclip_000000000"].values())
    # gap clip: only the middle cue overlaps the 150 ms gap
    assert by["sclip_000000002"][1][1] == "cue_over_silence"
    assert by["sclip_000000002"][0][1] == "ok"
    assert by["sclip_000000002"][2][1] == "ok"
    # dead clip: every cue fully silent
    assert all(f == 1.0 for f, _ in by["sclip_000000004"].values())


def test_cue_silence_query_matches_oracle(spark):
    got = [tuple(r) for r in QUERIES["cue_silence_stats"](spark, SF).collect()]
    want = [tuple(r) for r in duckdb.sql(ORACLES["cue_silence_stats"]).fetchall()]
    assert len(got) == len(want) == 2
    for g, w in zip(got, want):
        assert g[:2] == w[:2]
        assert g[2] == pytest.approx(w[2], abs=1e-4)


def test_registered_query_matches_oracle(spark):
    got = [tuple(r) for r in QUERIES["transcript_alignment_stats"](spark, SF).collect()]
    want = [tuple(r) for r in duckdb.sql(ORACLES["transcript_alignment_stats"]).fetchall()]
    assert len(got) == len(want) == 3
    for g, w in zip(got, want):
        assert g[:2] == w[:2]
        for x, y in zip(g[2:], w[2:]):
            assert x == pytest.approx(y, abs=1e-4)
    verds = {g[0]: g for g in got}
    assert verds["cues_over_silence"][2] > 0.5  # the misaligned class is well covered
    assert verds["untranscribed_speech"][2] == 0.0

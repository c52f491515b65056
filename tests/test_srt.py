"""SRT timed-transcript validation: parser branches, window-based
timing semantics on hand-built cue relations, fixture plants, partition
stability, and oracle agreement of the registered rollup."""

import duckdb
import pytest

from macrobase_spark.operators.srt import (
    generate_srt_clips,
    parse_srt,
    srt_clip_verdicts,
    srt_cues,
)
from macrobase_spark.queries import ORACLES, QUERIES

SF = "/root/testdata/sf0.01"


def test_parse_clean_document():
    doc = (
        "1\n00:00:00,100 --> 00:00:01,000\nhello world\n\n"
        "2\n00:00:01,100 --> 00:00:02,000\nbye\nnow"
    )
    assert parse_srt(doc) == [(0, 100, 1000, 11, False), (1, 1100, 2000, 6, False)]


def test_parse_malformed_and_degenerate():
    assert parse_srt("1\n00:00:00,100 --> bogus\ntext") == [(0, None, None, 4, True)]
    assert parse_srt("nonsense\n00:00:00,100 --> 00:00:01,000\nx")[0][4] is True
    assert parse_srt("1\n99:99:99,999 --> 00:00:01,000\nx")[0][4] is True  # invalid mins/secs
    assert parse_srt("") == [] and parse_srt(None) == []
    # hour field > 23 is legal SRT (long audiobooks)
    assert parse_srt("1\n25:00:00,000 --> 25:00:01,000\nx")[0][1] == 25 * 3_600_000


def _verdicts(spark, rows):
    df = spark.createDataFrame(
        rows,
        "clip_id string, dur_ms int, cue_idx int, start_ms int, end_ms int, n_chars int, malformed boolean",
    )
    return {r["clip_id"]: (r["verdict"], r["coverage"]) for r in srt_clip_verdicts(df).collect()}


def test_timing_semantics_on_hand_built_cues(spark):
    rows = [
        # clean: two cues, 1500 of 2000 ms covered
        ("a", 2000, 0, 0, 1000, 5, False),
        ("a", 2000, 1, 1100, 1600, 5, False),
        # overlap: cue 1 starts before cue 0 ends
        ("b", 2000, 0, 0, 1000, 5, False),
        ("b", 2000, 1, 900, 1600, 5, False),
        # out of bounds: runs past dur_ms
        ("c", 2000, 0, 0, 2500, 5, False),
        # empty cue
        ("d", 2000, 0, 0, 1000, 0, False),
        # malformed dominates everything else
        ("e", 2000, 0, 0, 2500, 5, False),
        ("e", 2000, 1, None, None, 4, True),
        # end <= start is out_of_bounds
        ("f", 2000, 0, 500, 500, 5, False),
    ]
    v = _verdicts(spark, rows)
    assert v["a"] == ("ok", pytest.approx(0.75))
    assert v["b"][0] == "disorder"
    assert v["c"][0] == "out_of_bounds"
    assert v["d"][0] == "empty_cue"
    assert v["e"][0] == "malformed"
    assert v["f"][0] == "out_of_bounds"


def test_fixture_plants_land_in_their_verdicts(spark):
    cues = srt_cues(generate_srt_clips(spark, 130))
    v = {r["clip_id"]: r["verdict"] for r in srt_clip_verdicts(cues).collect()}
    assert v["srt-00000021"] == "malformed"
    assert v["srt-00000005"] == "disorder"
    assert v["srt-00000017"] == "disorder"  # swapped cues
    assert v["srt-00000011"] == "out_of_bounds"
    assert v["srt-00000007"] == "empty_cue"
    assert v["srt-00000000"] == "ok"


def test_parse_crlf_line_endings():
    """Real-world SRT/VTT is routinely CRLF; both parsers normalize."""
    from macrobase_spark.operators.srt import parse_vtt

    doc = "1\r\n00:00:00,100 --> 00:00:01,000\r\nhello\r\n\r\n2\r\n00:00:01,100 --> 00:00:02,000\r\nbye"
    assert parse_srt(doc) == [(0, 100, 1000, 5, False), (1, 1100, 2000, 3, False)]
    vdoc = "WEBVTT\r\n\r\n00:00.100 --> 00:01.000\r\nhello"
    assert parse_vtt(vdoc) == [(0, 100, 1000, 5, False)]


def test_vtt_cue_identifier_starting_with_note():
    """'NOTES' is a legal cue identifier — only the TOKEN 'NOTE' starts
    a comment block; prefix matching would silently drop the cue."""
    from macrobase_spark.operators.srt import parse_vtt

    doc = "WEBVTT\n\nNOTES\n00:00:01.000 --> 00:00:02.000\nhello"
    assert parse_vtt(doc) == [(0, 1000, 2000, 5, False)]
    assert parse_vtt("WEBVTT\n\nNOTE this is a comment\nmore comment") == []


def test_parse_vtt_dialect():
    from macrobase_spark.operators.srt import parse_vtt

    doc = (
        "WEBVTT\n\nNOTE fixture\n\ncue-1\n00:00.100 --> 00:01.000 align:start\nhello\n\n"
        "00:01.100 --> 01:00:02.000\nworld"
    )
    assert parse_vtt(doc) == [
        (0, 100, 1000, 5, False),
        (1, 1100, 3_602_000, 5, False),  # optional-hour long form
    ]
    # a missing WEBVTT header poisons the file
    assert parse_vtt("1\n00:00.100 --> 00:01.000\nx") == [(0, None, None, 0, True)]
    # comma milliseconds (SRT style) are NOT valid VTT
    assert parse_vtt("WEBVTT\n\n1\n00:00:00,100 --> 00:00:01,000\nx")[0][4] is True


def test_vtt_fixture_plants_land_in_their_verdicts(spark):
    from macrobase_spark.operators.srt import generate_vtt_clips

    cues = srt_cues(generate_vtt_clips(spark, 130), dialect="vtt")
    v = {r["clip_id"]: r["verdict"] for r in srt_clip_verdicts(cues).collect()}
    assert v["vtt-00000013"] == "malformed"  # missing WEBVTT header
    assert v["vtt-00000021"] == "malformed"
    assert v["vtt-00000005"] == "disorder"
    assert v["vtt-00000011"] == "out_of_bounds"
    assert v["vtt-00000007"] == "empty_cue"
    assert v["vtt-00000000"] == "ok"


def test_vtt_registered_query_matches_oracle(spark):
    got = [tuple(r) for r in QUERIES["vtt_timing_stats"](spark, SF).collect()]
    want = [tuple(r) for r in duckdb.sql(ORACLES["vtt_timing_stats"]).fetchall()]
    assert len(got) == len(want) >= 4
    for g, w in zip(got, want):
        assert g[:3] == w[:3]
        for x, y in zip(g[3:], w[3:]):
            assert x == pytest.approx(y, abs=1e-4)


def test_generation_partition_stable(spark):
    a = srt_cues(generate_srt_clips(spark, 60).repartition(2))
    b = srt_cues(generate_srt_clips(spark, 60).repartition(13))
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_registered_query_matches_oracle(spark):
    got = [tuple(r) for r in QUERIES["srt_timing_stats"](spark, SF).collect()]
    want = [tuple(r) for r in duckdb.sql(ORACLES["srt_timing_stats"]).fetchall()]
    assert len(got) == len(want) >= 4
    for g, w in zip(got, want):
        assert g[:3] == w[:3]
        for x, y in zip(g[3:], w[3:]):
            assert x == pytest.approx(y, abs=1e-4)
    verds = {g[0]: g for g in got}
    # clean clips cover most of the audio; the envelope certifies spans
    assert verds["ok"][3] > 0.7 and verds["ok"][4] <= 1.0

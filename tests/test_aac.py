"""AAC/ADTS frame-walk integrity: hand-built streams exercise every
walker branch (explicit length stepping, CRC headers, multi-block
frames, truncation, length-field corruption), fixture plants land in
their verdicts, generation is partitioning-independent, and the
registered query matches the DuckDB oracle value-for-value."""

import duckdb
import pytest

from macrobase_spark.operators.aac import (
    adts_frame,
    adts_profiles,
    adts_stream,
    generate_adts_clips,
    walk_adts,
)
from macrobase_spark.queries import ORACLES, QUERIES

SF = "/root/testdata/sf0.01"


def test_walk_clean_stream():
    buf = b"".join(adts_frame(4, 2, 100 + k, seed=k) for k in range(5))  # 44100 stereo
    f, ed, sr, ch, nc, tr, junk = walk_adts(buf)
    assert (f, sr, ch, nc, tr, junk) == (5, 44100, 2, 0, False, 0)
    assert ed == pytest.approx(5 * 1024 * 1000 / 44100)


def test_crc_header_is_9_bytes_and_counted():
    a = adts_frame(4, 1, 50, seed=1, crc=False)
    b = adts_frame(4, 1, 50, seed=1, crc=True)
    assert len(b) == len(a) + 2
    f, ed, sr, ch, nc, tr, junk = walk_adts(b + a)
    assert (f, nc, junk) == (2, 1, 0)


def test_multi_block_frame_doubles_duration():
    one = walk_adts(adts_frame(3, 1, 80, seed=2, rdb=0))[1]
    two = walk_adts(adts_frame(3, 1, 80, seed=2, rdb=1))[1]
    assert two == pytest.approx(2 * one)


def test_walk_truncated():
    buf = (adts_frame(4, 1, 100, seed=0) + adts_frame(4, 1, 100, seed=1))[:-20]
    f, ed, sr, ch, nc, tr, junk = walk_adts(buf)
    assert f == 1 and tr is True and junk > 0


def test_walk_corrupt_length_desyncs():
    f0 = adts_frame(4, 1, 100, seed=0)
    f1 = bytearray(adts_frame(4, 1, 100, seed=1))
    f1[3] &= 0xFC
    f1[4] = 2
    f1[5] &= 0x1F  # flen = 16, still >= header size
    f, ed, sr, ch, nc, tr, junk = walk_adts(f0 + bytes(f1) + adts_frame(4, 1, 100, seed=2))
    assert tr is False and junk > 0


def test_walk_rejects_impossible_length():
    f0 = bytearray(adts_frame(4, 1, 100, seed=0))
    f0[3] &= 0xFC
    f0[4] = 0
    f0[5] &= 0x1F  # flen = 0 < header size
    f, *_rest, junk = walk_adts(bytes(f0))
    assert f == 0 and junk == len(f0)


def test_walk_garbage_and_empty():
    assert walk_adts(None)[0] == 0
    assert walk_adts(b"")[0] == 0
    assert walk_adts(b"\x01\x02" * 100)[0] == 0


def test_fixture_plants_land_in_their_verdicts():
    assert walk_adts(adts_stream(21, 8)[0])[0] == 0  # no_sync
    f, ed, sr, ch, nc, tr, junk = walk_adts(adts_stream(17, 8)[0])
    assert tr is True  # truncated
    f, ed, sr, ch, nc, tr, junk = walk_adts(adts_stream(5, 8)[0])
    assert tr is False and junk > 0  # corrupt length
    b, sr0, dur = adts_stream(3, 8)  # CRC-protected, clean
    f, ed, sr, ch, nc, tr, junk = walk_adts(b)
    assert f == 8 and nc == 8 and junk == 0 and ed == pytest.approx(dur, abs=0.5)
    b, sr0, dur = adts_stream(2, 8)  # rdb=1 -> 2048 samples/frame
    f, ed, *_ = walk_adts(b)
    assert ed == pytest.approx(dur, abs=0.5) and dur == round(8 * 2048 * 1000 / sr0)


def test_generation_partition_stable(spark):
    a = adts_profiles(generate_adts_clips(spark, 60).repartition(2))
    b = adts_profiles(generate_adts_clips(spark, 60).repartition(13))
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_registered_query_matches_oracle(spark):
    got = QUERIES["aac_integrity_stats"](spark, SF).collect()
    want = duckdb.sql(ORACLES["aac_integrity_stats"]).fetchall()
    assert len(got) == len(want) >= 3
    for g, w in zip(got, want):
        assert tuple(g)[:4] == tuple(w)[:4]
        assert g[4] == pytest.approx(w[4], abs=1e-4)
    verds = {g["verdict"]: g for g in got}
    assert verds["ok"]["max_ok_dur_err_ms"] <= 0.5
    assert verds["ok"]["n_crc_clips"] > 0

"""Ogg/Opus page-walk integrity: CRC flavor pinned against an
independent bit-serial implementation, every walker branch exercised
(sequence holes, CRC damage, truncation, foreign BOS packet, granule
duration), generation is partitioning-independent, and the registered
query matches the DuckDB oracle value-for-value."""

import struct

import duckdb
import pytest

from macrobase_spark.operators.ogg import (
    generate_ogg_clips,
    ogg_crc,
    ogg_opus_stream,
    ogg_page,
    ogg_profiles,
    opus_head,
    walk_ogg,
)
from macrobase_spark.queries import ORACLES, QUERIES

SF = "/root/testdata/sf0.01"


def _crc_bitserial(data: bytes) -> int:
    """Independent bit-at-a-time Ogg CRC (RFC 3533: poly 0x04C11DB7,
    init 0, MSB-first, no reflection, no final xor)."""
    crc = 0
    for b in data:
        crc ^= b << 24
        for _ in range(8):
            crc = ((crc << 1) ^ 0x04C11DB7) & 0xFFFFFFFF if crc & 0x80000000 else (crc << 1) & 0xFFFFFFFF
    return crc


def test_crc_matches_bitserial_reference():
    for payload in (b"", b"\x00", b"123456789", bytes(range(256))):
        assert ogg_crc(payload) == _crc_bitserial(payload)


def test_page_roundtrip_and_crc_detects_any_flip():
    page = ogg_page(7, 0, 960, [b"hello", b"world"], bos=True)
    n_pages, crc_bad, *_ = walk_ogg(page)
    assert (n_pages, crc_bad) == (1, 0)
    for k in (0, 5, 26, 30, len(page) - 1):
        dam = bytearray(page)
        dam[k] ^= 0x01
        r = walk_ogg(bytes(dam))
        if k < 4:  # capture-pattern damage: page unwalkable, not crc-bad
            assert r[0] == 0
        elif k == 26:  # segment-count damage shifts the structure itself:
            assert r[8] is True  # page now extends past the buffer
        else:
            assert r[1] == 1


def test_walk_counts_sequence_gap_without_stopping():
    pages = [ogg_page(1, s, 0, [bytes(10)]) for s in (0, 1, 3, 4)]
    n_pages, crc_bad, gaps, *_ = walk_ogg(b"".join(pages))
    assert (n_pages, crc_bad, gaps) == (4, 0, 1)


def test_walk_truncated_page():
    page = ogg_page(1, 0, 0, [bytes(50)])
    f = walk_ogg(page[:-10])
    assert f[0] == 0 and f[8] is True and f[9] > 0


def test_opus_head_parse_and_duration():
    head = opus_head(2, 312, 44100)
    p0 = ogg_page(1, 0, 0, [head], bos=True)
    p1 = ogg_page(1, 1, 312 + 4 * 960, [bytes(40)] * 4, eos=True)
    n_pages, _, _, bos, eos, ch, skip, dur, tr, junk = walk_ogg(p0 + p1)
    assert (n_pages, bos, eos, ch, skip, tr, junk) == (2, True, True, 2, 312, False, 0)
    assert dur == pytest.approx(4 * 960 / 48.0)


def test_negative_granule_ignored_for_duration():
    p0 = ogg_page(1, 0, 0, [opus_head(1, 0, 48000)], bos=True)
    p1 = ogg_page(1, 1, -1, [bytes(30)])  # "no packet ends here"
    p2 = ogg_page(1, 2, 2 * 960, [bytes(30)], eos=True)
    r = walk_ogg(p0 + p1 + p2)
    assert r[0] == 3 and r[7] == pytest.approx(2 * 960 / 48.0)


def test_fixture_plants_land_in_their_verdicts():
    assert walk_ogg(ogg_opus_stream(21)[0])[0] == 0  # no_capture
    r = walk_ogg(ogg_opus_stream(17)[0])
    assert r[8] is True  # truncated
    r = walk_ogg(ogg_opus_stream(5)[0])
    assert r[1] == 1 and r[8] is False  # crc_mismatch
    r = walk_ogg(ogg_opus_stream(9)[0])
    assert r[2] == 1 and r[1] == 0  # seq_gap with every CRC valid
    r = walk_ogg(ogg_opus_stream(11)[0])
    assert r[5] == 0  # no OpusHead -> channels unknown
    b, _, dur = ogg_opus_stream(0)
    r = walk_ogg(b)
    assert r[0] == 6 and r[1] == 0 and r[2] == 0 and r[7] == pytest.approx(dur, abs=0.5)


def test_generation_partition_stable(spark):
    a = ogg_profiles(generate_ogg_clips(spark, 60).repartition(2))
    b = ogg_profiles(generate_ogg_clips(spark, 60).repartition(13))
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_registered_query_matches_oracle(spark):
    got = QUERIES["opus_integrity_stats"](spark, SF).collect()
    want = duckdb.sql(ORACLES["opus_integrity_stats"]).fetchall()
    assert len(got) == len(want) >= 4
    for g, w in zip(got, want):
        assert tuple(g)[:4] == tuple(w)[:4]
        assert g[4] == pytest.approx(w[4], abs=1e-4)
    verds = {g["verdict"]: g for g in got}
    assert verds["ok"]["max_ok_dur_err_ms"] <= 0.5

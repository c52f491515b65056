"""MP3 frame-walk integrity: hand-built streams exercise every walker
branch (padding, ID3 skip, truncation, mid-stream corruption, VBR,
free/forbidden indices), the fixture plants land in their verdicts,
generation is partitioning-independent, and the registered query
matches the DuckDB oracle value-for-value."""

import duckdb
import pytest

from macrobase_spark.operators.mp3 import (
    BITRATE_KBPS,
    SR_HZ,
    generate_mp3_clips,
    id3v2_tag,
    mp3_frame,
    mp3_profiles,
    mp3_stream,
    walk_mp3,
)
from macrobase_spark.queries import ORACLES, QUERIES

SF = "/root/testdata/sf0.01"


def test_walk_clean_cbr():
    buf = b"".join(mp3_frame(9, 0, k % 2, seed=k) for k in range(5))  # 128k/44100
    f, ed, sr, bmin, bmax, id3, tr, junk = walk_mp3(buf)
    assert (f, sr, bmin, bmax, id3, tr, junk) == (5, 44100, 128, 128, 0, False, 0)
    assert ed == pytest.approx(5 * 1152 * 1000 / 44100)


def test_padding_bit_changes_frame_length():
    a, b = mp3_frame(9, 1, 0, seed=1), mp3_frame(9, 1, 1, seed=1)
    assert len(b) == len(a) + 1 == (144 * 128 * 1000) // 48000 + 1


def test_walk_skips_id3():
    buf = id3v2_tag(100, seed=3) + mp3_frame(5, 2, 0, seed=0)
    f, ed, sr, bmin, bmax, id3, tr, junk = walk_mp3(buf)
    assert (f, sr, id3, tr, junk) == (1, 32000, 110, False, 0)


def test_walk_truncated():
    buf = (mp3_frame(9, 0, 0, seed=0) + mp3_frame(9, 0, 0, seed=1))[:-40]
    f, ed, sr, bmin, bmax, id3, tr, junk = walk_mp3(buf)
    assert f == 1 and tr is True and junk > 0


def test_walk_corrupt_mid_stream():
    f0, f1 = mp3_frame(9, 0, 0, seed=0), mp3_frame(9, 0, 0, seed=1)
    buf = f0 + b"\x00" + f1[1:]
    f, ed, sr, bmin, bmax, id3, tr, junk = walk_mp3(buf)
    assert f == 1 and tr is False and junk == len(f1)


def test_walk_stops_on_forbidden_and_free_indices():
    for idx in (0, 15):
        good = mp3_frame(9, 0, 0, seed=0)
        bad = bytearray(mp3_frame(9, 0, 0, seed=1))
        bad[2] = (idx << 4) | (0 << 2) | (0 << 1)
        f, *_rest, junk = walk_mp3(good + bytes(bad))
        assert f == 1 and junk == len(bad)


def test_walk_vbr_reports_bitrate_span():
    buf = mp3_frame(9, 0, 0, seed=0) + mp3_frame(11, 0, 0, seed=1)
    f, ed, sr, bmin, bmax, *_ = walk_mp3(buf)
    assert (f, bmin, bmax) == (2, 128, 192)


def test_walk_garbage_and_empty():
    assert walk_mp3(None)[0] == 0
    assert walk_mp3(b"")[0] == 0
    f, *_rest, junk = walk_mp3(b"\x01\x02\x03\x04" * 50)
    assert f == 0 and junk == 200


def test_fixture_plants_land_in_their_verdicts():
    # residue 21 % 127 -> no sync; 17 % 101 -> truncated; 5 % 113 -> junk
    b, _, _ = mp3_stream(21, 8)
    assert walk_mp3(b)[0] == 0
    b, _, _ = mp3_stream(17, 8)  # truncated (also ID3-prefixed + VBR: 17%7=3, 17%5=2)
    f, ed, sr, bmin, bmax, id3, tr, junk = walk_mp3(b)
    assert tr is True
    b, _, _ = mp3_stream(5, 8)
    f, ed, sr, bmin, bmax, id3, tr, junk = walk_mp3(b)
    assert f == 1 and junk > 0 and tr is False
    b, sr0, dur = mp3_stream(3, 8)  # ID3 prefix, clean
    f, ed, sr, bmin, bmax, id3, tr, junk = walk_mp3(b)
    assert f == 8 and id3 > 0 and junk == 0 and ed == pytest.approx(dur, abs=0.5)
    b, _, _ = mp3_stream(2, 8)  # VBR
    f, ed, sr, bmin, bmax, id3, tr, junk = walk_mp3(b)
    assert bmax > bmin


def test_generation_partition_stable(spark):
    a = mp3_profiles(generate_mp3_clips(spark, 60).repartition(2))
    b = mp3_profiles(generate_mp3_clips(spark, 60).repartition(13))
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_registered_query_matches_oracle(spark):
    got = QUERIES["mp3_integrity_stats"](spark, SF).collect()
    want = duckdb.sql(ORACLES["mp3_integrity_stats"]).fetchall()
    assert len(got) == len(want) >= 3  # ok + planted defect classes
    for g, w in zip(got, want):
        assert tuple(g)[:4] == tuple(w)[:4]
        assert g[4] == pytest.approx(w[4], abs=1e-4)
    verds = {g["verdict"]: g for g in got}
    assert verds["ok"]["max_ok_dur_err_ms"] <= 0.5  # walk is sample-accurate
    assert verds["ok"]["n_vbr"] > 0


def test_profiles_stream_matches_batch(spark, tmp_path):
    """The profile scan is a stateless mapInPandas, so it runs UNCHANGED
    on a streaming DataFrame (the gate/scorecard contract): stream
    output must equal the batch relation row-for-row."""
    src = str(tmp_path / "mp3_src")
    generate_mp3_clips(spark, 80).write.mode("overwrite").parquet(src)
    batch = {
        r["clip_id"]: tuple(r)
        for r in mp3_profiles(spark.read.parquet(src)).collect()
    }
    stream = spark.readStream.schema(
        "clip_id string, bytes binary, sr_hz int, dur_ms int, codec string"
    ).parquet(src)
    q = (
        mp3_profiles(stream)
        .writeStream.format("memory")
        .queryName("mp3_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            r["clip_id"]: tuple(r)
            for r in spark.sql("select * from mp3_stream").collect()
        }
    finally:
        q.stop()
    assert got == batch and len(got) == 80

"""Transport gate: magic detection over every family, wav/flac
container checks, mislabel routing, partition stability, and oracle
agreement of the registered rollup."""

import struct

import duckdb
import numpy as np
import pytest

from macrobase_spark.operators.aac import adts_stream
from macrobase_spark.operators.gate import (
    detect_format,
    gate_clip,
    generate_mixed_clips,
    transport_gate,
)
from macrobase_spark.operators.mp3 import mp3_stream
from macrobase_spark.operators.ogg import ogg_opus_stream
from macrobase_spark.queries import ORACLES, QUERIES

SF = "/root/testdata/sf0.01"


def test_detect_format_families():
    from macrobase_spark.operators.audio import wav_bytes

    wav = wav_bytes(np.zeros(64, dtype=np.int16), 16000)
    assert detect_format(wav) == "wav"
    assert detect_format(mp3_stream(0, 4)[0]) == "mp3"
    assert detect_format(mp3_stream(3, 4)[0]) == "mp3"  # ID3-prefixed
    assert detect_format(adts_stream(0, 4)[0]) == "adts"
    assert detect_format(ogg_opus_stream(0)[0]) == "ogg"
    assert detect_format(b"fLaC" + bytes(40)) == "flac"
    assert detect_format(b"\x01\x02\x03\x04garbage") == "unknown"
    assert detect_format(None) == "empty"
    assert detect_format(b"\xff") == "empty"


def test_id3_prefixed_adts_routes_to_adts():
    """ID3v2 fronts ADTS streams in the wild too — the gate peeks past
    the tag instead of assuming mp3, and the ADTS walker skips it."""
    from macrobase_spark.operators.aac import adts_frame, walk_adts
    from macrobase_spark.operators.mp3 import id3v2_tag

    body = b"".join(adts_frame(4, 1, 100, seed=k) for k in range(3))
    buf = id3v2_tag(80, seed=1) + body
    assert detect_format(buf) == "adts"
    f, ed, sr, ch, nc, tr, junk = walk_adts(buf)
    assert (f, sr, tr, junk) == (3, 44100, False, 0)
    assert gate_clip(buf) == ("adts", "ok")
    # ID3 + mp3 still detects mp3
    assert detect_format(mp3_stream(3, 4)[0]) == "mp3"


def test_wav_container_check():
    from macrobase_spark.operators.audio import wav_bytes

    wav = wav_bytes(np.zeros(64, dtype=np.int16), 16000)
    assert gate_clip(wav) == ("wav", "ok")
    assert gate_clip(wav[:-20]) == ("wav", "truncated")  # RIFF size > actual
    bad = bytearray(wav)
    bad[8:12] = b"AVI "
    assert gate_clip(bytes(bad)) == ("wav", "corrupt_stream")
    nofmt = bytearray(wav)
    nofmt[12:16] = b"LIST"  # rename the fmt chunk: chain walks, unplayable
    assert gate_clip(bytes(nofmt)) == ("wav", "corrupt_stream")


def test_flac_metadata_walk():
    """Deep FLAC structure on the engine's own encoder output: block
    chaining, STREAMINFO first/unique, type 127 invalid, audio section
    must open on a frame sync."""
    from macrobase_spark.operators.audio import sin_samples
    from macrobase_spark.operators.flac import flac_bytes

    pcm = np.clip(
        0.5 * sin_samples(2 * np.pi * 440 / 16000, 3200) * 32767, -32768, 32767
    ).astype(np.int16)
    fl = flac_bytes(pcm, 16000)
    assert gate_clip(fl) == ("flac", "ok")
    assert gate_clip(fl[:10]) == ("flac", "truncated")
    assert gate_clip(fl[: 4 + 4 + 34]) == ("flac", "truncated")  # metadata only
    bad = bytearray(fl)
    bad[4] = (bad[4] & 0x80) | 0x03  # first block not STREAMINFO
    assert gate_clip(bytes(bad)) == ("flac", "corrupt_stream")
    sync = bytearray(fl)
    sync[4 + 4 + 34] = 0x00  # kill the first frame's sync
    assert gate_clip(bytes(sync)) == ("flac", "corrupt_stream")
    assert gate_clip(b"fLaC" + bytes([127, 0, 0, 4]) + bytes(4)) == (
        "flac",
        "corrupt_stream",
    )


def test_aiff_chunk_walk():
    def chunk(cid, payload):
        return cid + len(payload).to_bytes(4, "big") + payload + (b"\x00" if len(payload) & 1 else b"")

    body = chunk(b"COMM", bytes(18)) + chunk(b"SSND", bytes(108 + 1))  # odd size pads
    aiff = b"FORM" + (len(body) + 4).to_bytes(4, "big") + b"AIFF" + body
    assert gate_clip(aiff) == ("aiff", "ok")
    assert gate_clip(aiff[:-10]) == ("aiff", "truncated")
    bad = bytearray(aiff)
    bad[8:12] = b"WAVE"
    assert gate_clip(bytes(bad)) == ("aiff", "corrupt_stream")
    nossnd = chunk(b"COMM", bytes(18)) + chunk(b"APPL", bytes(109))
    aiff2 = b"FORM" + (len(nossnd) + 4).to_bytes(4, "big") + b"AIFF" + nossnd
    assert gate_clip(aiff2) == ("aiff", "corrupt_stream")
    aifc = b"FORM" + (len(body) + 4).to_bytes(4, "big") + b"AIFC" + body
    assert gate_clip(aifc) == ("aiff", "ok")


def test_mislabeled_clip_routes_by_magic():
    # id 7: declared mp3 (7%3=1 -> aac actually... pick id where i%89==7)
    i = 7
    assert i % 89 == 7
    # declared = cycle[i%3] = aac; bytes built as NEXT format (opus)
    fmt, v = gate_clip(ogg_opus_stream(i)[0])
    assert fmt == "ogg" and v == "ok"


def test_gate_partition_stable(spark):
    a = transport_gate(generate_mixed_clips(spark, 90).repartition(2))
    b = transport_gate(generate_mixed_clips(spark, 90).repartition(11))
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_gate_stream_matches_batch(spark, tmp_path):
    """The gate is a stateless mapInPandas, so it runs UNCHANGED on a
    streaming DataFrame (same contract as the QA scorecard): stream
    output must equal the batch relation row-for-row."""
    src = str(tmp_path / "gate_src")
    generate_mixed_clips(spark, 90).write.mode("overwrite").parquet(src)
    batch = {
        r["clip_id"]: tuple(r)
        for r in transport_gate(spark.read.parquet(src)).collect()
    }
    stream = spark.readStream.schema("clip_id string, bytes binary, codec string").parquet(src)
    q = (
        transport_gate(stream)
        .writeStream.format("memory")
        .queryName("gate_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            r["clip_id"]: tuple(r)
            for r in spark.sql("select * from gate_stream").collect()
        }
    finally:
        q.stop()
    assert got == batch and len(got) == 90


def test_codec_structure_query_matches_oracle(spark):
    """The deep walks over the decodable-codec fixture: truncated WAV
    plants are caught structurally (magic-only sniffing admits them);
    garbage payloads land in unknown/no_sync; every intact payload reads
    ok with label agreement."""
    got = [tuple(r) for r in QUERIES["codec_structure_stats"](spark, SF).collect()]
    want = [tuple(r) for r in duckdb.sql(ORACLES["codec_structure_stats"]).fetchall()]
    assert got == want
    trunc = [r for r in got if r[2] == "truncated"]
    assert trunc and all(r[1] == "wav" for r in trunc)
    assert any(r[1] == "unknown" and not r[3] for r in got)  # garbage plants


def test_registered_query_matches_oracle(spark):
    got = [tuple(r) for r in QUERIES["transport_gate_stats"](spark, SF).collect()]
    want = [tuple(r) for r in duckdb.sql(ORACLES["transport_gate_stats"]).fetchall()]
    assert got == want and len(got) >= 8
    # the mislabel plant is visible: rows where declared != detected
    mis = [r for r in got if not r[3]]
    assert mis and all(r[1] != {"mp3": "mp3", "aac": "adts", "opus": "ogg"}[r[0]] for r in mis)

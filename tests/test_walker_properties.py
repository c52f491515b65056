"""Property/fuzz tests for the no-decode stream walkers (mp3, ADTS,
Ogg): on ARBITRARY bytes they must never raise and always account for
every input byte; on randomized VALID streams they must recover the
exact frame/page inventory. Pure-python kernels — no Spark session."""

from hypothesis import given, settings
from hypothesis import strategies as st

from macrobase_spark.operators.aac import adts_frame, walk_adts
from macrobase_spark.operators.mp3 import mp3_frame, walk_mp3
from macrobase_spark.operators.ogg import ogg_page, walk_ogg


@settings(max_examples=200, deadline=None)
@given(st.binary(max_size=400))
def test_walkers_total_on_arbitrary_bytes(buf):
    f, ed, *_rest, junk = walk_mp3(buf)
    assert f >= 0 and 0 <= junk <= len(buf)
    f, ed, *_rest, junk = walk_adts(buf)
    assert f >= 0 and 0 <= junk <= len(buf)
    r = walk_ogg(buf)
    assert r[0] >= 0 and 0 <= r[9] <= len(buf)


@settings(max_examples=50, deadline=None)
@given(
    n=st.integers(min_value=1, max_value=12),
    br=st.integers(min_value=1, max_value=14),
    sr=st.integers(min_value=0, max_value=2),
    seed=st.integers(min_value=0, max_value=2**31),
)
def test_mp3_walk_recovers_any_valid_stream(n, br, sr, seed):
    buf = b"".join(mp3_frame(br, sr, (seed + k) % 2, seed=seed + k) for k in range(n))
    f, ed, *_rest, junk = walk_mp3(buf)
    assert f == n and junk == 0


@settings(max_examples=50, deadline=None)
@given(
    n=st.integers(min_value=1, max_value=12),
    sr=st.integers(min_value=0, max_value=12),
    ch=st.integers(min_value=1, max_value=2),
    plen=st.integers(min_value=1, max_value=300),
    crc=st.booleans(),
    rdb=st.integers(min_value=0, max_value=3),
)
def test_adts_walk_recovers_any_valid_stream(n, sr, ch, plen, crc, rdb):
    buf = b"".join(
        adts_frame(sr, ch, plen + k, seed=k, rdb=rdb, crc=crc) for k in range(n)
    )
    f, ed, sr_got, ch_got, nc, tr, junk = walk_adts(buf)
    assert f == n and junk == 0 and tr is False
    assert nc == (n if crc else 0)


@settings(max_examples=300, deadline=None)
@given(st.binary(max_size=400))
def test_gate_total_on_arbitrary_bytes(buf):
    """gate_clip (and the wav/aiff/flac chunk walkers inside it) never
    raises and always returns a known (format, verdict) pair; seeded
    magic prefixes steer the fuzz into each deep walker."""
    from macrobase_spark.operators.gate import gate_clip

    # "no_capture" is the Ogg branch's pageless verdict (same vocabulary
    # as ogg.py's _VERDICT_SQL); "no_sync" is the mp3/ADTS equivalent
    verdicts = {
        "ok", "truncated", "corrupt_stream", "no_sync", "no_capture",
        "no_payload", "no_opus_head",
    }
    for prefix in (b"", b"RIFF", b"FORM", b"fLaC", b"OggS", b"ID3", b"\xff\xfb", b"\xff\xf1"):
        fmt, v = gate_clip(prefix + buf)
        assert v in verdicts and isinstance(fmt, str)


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=300))
def test_transcript_parsers_total_on_arbitrary_text(doc):
    from macrobase_spark.operators.srt import parse_srt, parse_vtt

    for cues in (parse_srt(doc), parse_vtt(doc)):
        for pos, start, end, nch, bad in cues:
            assert pos >= 0 and nch >= 0
            assert bad or (start is not None and end is not None)


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=300))
def test_vtt_parser_total_past_the_header(doc):
    """Plain st.text() essentially never starts with 'WEBVTT', so the
    fuzz above only exercises the not-a-VTT early return. Prefixing the
    header drives arbitrary text through the block tokenizer — the path
    where a whitespace-only first line used to IndexError (the cue-vs-
    NOTE first-token split on an empty token list)."""
    from macrobase_spark.operators.srt import parse_vtt

    for cues in (
        parse_vtt("WEBVTT\n\n" + doc),
        # the historical crash shape: whitespace-only line opening a block
        parse_vtt("WEBVTT\n\n \n" + doc),
    ):
        for pos, start, end, nch, bad in cues:
            assert pos >= 0 and nch >= 0
            assert bad or (start is not None and end is not None)


@settings(max_examples=50, deadline=None)
@given(
    n=st.integers(min_value=1, max_value=6),
    start0=st.integers(min_value=0, max_value=5000),
    span=st.integers(min_value=1, max_value=10_000_000),
    gap=st.integers(min_value=0, max_value=5000),
    crlf=st.booleans(),
)
def test_srt_roundtrip_any_layout(n, start0, span, gap, crlf):
    """Rendered cue layouts tokenize back exactly — any spans/gaps
    (multi-hour audiobook timestamps included), both line-ending
    conventions."""
    from macrobase_spark.operators.srt import _fmt_ts, parse_srt, parse_vtt

    t = start0
    blocks_s, blocks_v, want = [], [], []
    for k in range(n):
        s_, e_ = t, t + span
        body = f"w{k}"
        blocks_s.append(f"{k + 1}\n{_fmt_ts(s_)} --> {_fmt_ts(e_)}\n{body}")
        vts = lambda ms: _fmt_ts(ms).replace(",", ".")
        blocks_v.append(f"{k + 1}\n{vts(s_)} --> {vts(e_)}\n{body}")
        want.append((k, s_, e_, len(body), False))
        t = e_ + gap
    doc_s = "\n\n".join(blocks_s)
    doc_v = "WEBVTT\n\n" + "\n\n".join(blocks_v)
    if crlf:
        doc_s = doc_s.replace("\n", "\r\n")
        doc_v = doc_v.replace("\n", "\r\n")
    assert parse_srt(doc_s) == want
    assert parse_vtt(doc_v) == want


@settings(max_examples=50, deadline=None)
@given(
    n=st.integers(min_value=1, max_value=8),
    serial=st.integers(min_value=0, max_value=2**31),
    npkt=st.integers(min_value=0, max_value=5),
    plen=st.integers(min_value=0, max_value=200),
)
def test_ogg_walk_recovers_any_valid_stream(n, serial, npkt, plen):
    pages = [
        ogg_page(serial, s, s * 960, [bytes([s % 256]) * plen] * npkt)
        for s in range(n)
    ]
    r = walk_ogg(b"".join(pages))
    assert r[0] == n and r[1] == 0 and r[2] == 0 and r[9] == 0


@settings(max_examples=300, deadline=None)
@given(st.binary(max_size=500))
def test_flac_decode_total_on_arbitrary_bytes(buf):
    """decode_flac must be total on arbitrary bytes (the QA scorecard now
    routes any fLaC-magic payload into it inside mapInArrow, where an
    uncaught exception kills the Spark task): None or a valid decode,
    never a raise."""
    from macrobase_spark.operators.flac import decode_flac

    for prefix in (b"", b"fLaC"):
        r = decode_flac(prefix + buf)
        assert r is None or (isinstance(r[0], int) and r[0] > 0)


@settings(max_examples=150, deadline=None)
@given(
    n=st.integers(min_value=64, max_value=1200),
    sr=st.sampled_from([8000, 16000, 44100]),
    pos_frac=st.floats(min_value=0.0, max_value=0.999),
    flip=st.integers(min_value=1, max_value=255),
    use_lpc=st.booleans(),
)
def test_flac_decode_total_under_byte_mutation(n, sr, pos_frac, flip, use_lpc):
    """Single-byte corruption anywhere in a VALID stream — the realistic
    bitrot shape — must yield None (CRC/MD5 catch it) or a clean decode
    (flip in dead padding), never an exception."""
    import numpy as np

    from macrobase_spark.operators.flac import decode_flac, flac_bytes

    pcm = (
        (3000 * np.sin(np.arange(n) * 0.05) + 500 * np.sin(np.arange(n) * 0.21))
        .astype(np.int16)
    )
    good = bytearray(flac_bytes(pcm, sr, use_lpc=use_lpc))
    pos = int(pos_frac * len(good))
    good[pos] ^= flip
    r = decode_flac(bytes(good))
    assert r is None or (isinstance(r[0], int) and r[0] > 0)

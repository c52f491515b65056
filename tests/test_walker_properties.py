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

"""Deterministic synthetic `clips` table — the authoritative target shape
(BASELINE input_hint): (clip_id string, bytes binary, sr_hz int, dur_ms int,
codec string, transcript string).

Every value is a pure function of the row id (splitmix64 hashes), so the
table is identical at ANY partitioning / parallelism — the property that
makes the N-vs-4N scaling run an apples-to-apples comparison and lets
`expected_violations` be computed symbolically.

Planted violations (fixture contract, cf. FIXTURES.md F1/F2):
- duplicate clip_id       id % 500 == 7  (row duplicates id-1, full payload)
- null transcript         id % 211 == 3
- empty transcript        id % 503 == 11
- corrupt payload         id % 401 == 5, OR codec == 'flac' and id % 13 == 3
                          (garbage bytes → SNR fail; the flac-correlated
                          plant gives the risk-ratio explanation a real
                          attribute association to recover)
- truncated payload       id % 601 == 9  (short RIFF → decode fail)
- manifest orphans        id % 250 == 13 (clip missing from clip_manifest)
- drifted partition       codec == 'aac' → dur_ms × 3 (distribution drift)

Skew is part of the fixture: codec is ~60% opus, sr_hz ~70% 16 kHz.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from macrobase_spark.operators.audio import (
    sin_samples,
    splitmix64,
    tone_hz,
    u01,
    wav_bytes,
)

CODECS = ["opus", "mp3", "flac", "aac", "pcm_s16le"]
CODEC_CUM = [0.60, 0.75, 0.85, 0.95, 1.0]
SR_VALUES = [16000, 8000, 44100, 22050, 48000]
SR_CUM = [0.70, 0.80, 0.90, 0.95, 1.0]
WORDS = (
    "the quick brown fox jumps over lazy dog audio clip speech sound noise "
    "signal test hello world data stream batch check valid sample rate tone"
).split()

CLIPS_SCHEMA = StructType(
    [
        StructField("clip_id", StringType()),
        StructField("bytes", BinaryType()),
        StructField("sr_hz", IntegerType()),
        StructField("dur_ms", IntegerType()),
        StructField("codec", StringType()),
        StructField("transcript", StringType()),
    ]
)


def _categorical(u: np.ndarray, cum: list[float], values: list) -> np.ndarray:
    out = np.empty(len(u), dtype=object)
    prev = 0.0
    for c, v in zip(cum, values):
        out[np.where((u >= prev) & (u < c))] = v
        prev = c
    out[u >= cum[-2]] = values[-1]
    return out


def row_params(ids: np.ndarray) -> pd.DataFrame:
    """All scalar columns for the given row ids — vectorized numpy, no RNG
    state (pure function of id)."""
    ids = ids.astype(np.uint64)
    codec = _categorical(u01(ids, 1), CODEC_CUM, CODECS)
    sr = _categorical(u01(ids, 2), SR_CUM, SR_VALUES).astype(np.int64)
    # lognormal-ish duration via Box–Muller on two id-derived uniforms
    u1 = np.clip(u01(ids, 3), 1e-12, 1.0)
    z = np.sqrt(-2.0 * np.log(u1)) * np.cos(2 * np.pi * u01(ids, 4))
    dur = np.clip(np.exp(8.0 + 0.6 * z), 200, 60000).astype(np.int64)
    dur = np.where(codec == "aac", np.minimum(dur * 3, 60000), dur)  # planted drift
    n_words = np.maximum(dur // 400, 1)
    return pd.DataFrame(
        {"id": ids.astype(np.int64), "codec": codec, "sr_hz": sr, "dur_ms": dur, "n_words": n_words}
    )


def _transcript(i: int, n_words: int) -> str | None:
    if i % 211 == 3:
        return None
    if i % 503 == 11:
        return ""
    h = splitmix64(np.arange(n_words, dtype=np.uint64) + np.uint64(i) * np.uint64(1315423911))
    return " ".join(WORDS[int(x % len(WORDS))] for x in h)


def _is_corrupt(i: int, codec: str) -> bool:
    return i % 401 == 5 or (codec == "flac" and i % 13 == 3)


def _payload(i: int, sr: int, dur_ms: int, max_ms: int, codec: str = "") -> bytes:
    if _is_corrupt(i, codec):  # garbage: hash noise, valid length, no RIFF
        g = splitmix64(np.arange(64, dtype=np.uint64) + np.uint64(i))
        return g.astype("<u8").tobytes()
    ms = min(dur_ms, max_ms)
    n = max(int(sr * ms / 1000), 16)
    f0 = float(tone_hz(np.array([i], dtype=np.uint64))[0])
    # libm-free render (identical recipe to the checker's render_reference):
    # np.sin's gather-based libm path collapses ~50x on this sandbox's
    # mitigated host states, and the generator is the bulk of fixture
    # materialization cost at the 8M-clip bench scale.
    sig = 0.8 * sin_samples(2 * np.pi * f0 / sr, n)
    noise = (u01(np.arange(n, dtype=np.uint64) + np.uint64(i) * np.uint64(2654435761), 5) - 0.5) * 0.01
    pcm = np.clip((sig + noise) * 32767, -32768, 32767).astype(np.int16)
    b = wav_bytes(pcm, sr)
    if i % 601 == 9:  # truncated container
        return b[: max(len(b) // 3, 10)]
    return b


def generate_clips(
    spark: SparkSession, n: int, max_payload_ms: int = 200, partitions: int | None = None
) -> DataFrame:
    """The clips table as a distributed generate-on-read DataFrame."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            # duplicate plant: row content comes from the *previous* id
            src = np.where((ids % 500 == 7) & (ids > 0), ids - 1, ids)
            p = row_params(src)
            clip_ids = [f"clip_{int(s):012d}" for s in src]
            payload = [
                _payload(int(s), int(r.sr_hz), int(r.dur_ms), max_payload_ms, str(r.codec))
                for s, r in zip(src, p.itertuples())
            ]
            transcripts = [_transcript(int(s), int(r.n_words)) for s, r in zip(src, p.itertuples())]
            yield pd.DataFrame(
                {
                    "clip_id": clip_ids,
                    "bytes": payload,
                    "sr_hz": p["sr_hz"].astype("int32"),
                    "dur_ms": p["dur_ms"].astype("int32"),
                    "codec": p["codec"],
                    "transcript": transcripts,
                }
            )

    parts = partitions or max(spark.sparkContext.defaultParallelism, 4)
    base = spark.range(0, n, numPartitions=parts)
    return base.mapInPandas(gen, CLIPS_SCHEMA)


def write_clips_table(
    spark: SparkSession,
    n: int,
    path: str,
    max_payload_ms: int = 100,
    partitions: int | None = None,
) -> None:
    """Materialize the clips table as parquet — the bench reads THIS, so the
    measured job is scan(JVM) → score(Arrow) → checks, the same stage shape
    as the production Iceberg table (generate-on-read would chain two Python
    stages per task and double the worker count)."""
    generate_clips(spark, n, max_payload_ms=max_payload_ms, partitions=partitions).write.mode(
        "overwrite"
    ).parquet(path)


def generate_manifest(spark: SparkSession, n: int, partitions: int | None = None) -> DataFrame:
    """Referential partner: every non-orphan clip_id + source/license dims."""
    parts = partitions or max(spark.sparkContext.defaultParallelism, 4)
    base = spark.range(0, n, numPartitions=parts).filter(F.col("id") % 250 != 13)
    src_u = F.pmod(F.xxhash64(F.col("id"), F.lit("m1")), 3)
    lic_u = F.pmod(F.xxhash64(F.col("id"), F.lit("m2")), 3)
    return base.select(
        F.format_string("clip_%012d", F.col("id")).alias("clip_id"),
        F.element_at(F.array(F.lit("crawl-a"), F.lit("crawl-b"), F.lit("studio")), (src_u + 1).cast("int")).alias("source"),
        F.element_at(F.array(F.lit("cc0"), F.lit("cc-by"), F.lit("proprietary")), (lic_u + 1).cast("int")).alias("license"),
    )


def expected_violations(n: int) -> pd.DataFrame:
    """Symbolically-derived ground truth for the planted violations."""
    rows = []
    for i in range(n):
        cid = f"clip_{i:012d}"
        if i % 500 == 7 and i > 0:
            rows.append((f"clip_{i - 1:012d}", "uniqueness", "duplicate clip_id"))
        if i % 500 == 7 and i > 0:
            continue  # dup rows carry the previous clip's content
        if i % 211 == 3:
            rows.append((cid, "null_transcript", "transcript is null"))
        if i % 503 == 11:
            rows.append((cid, "empty_transcript", "transcript is empty"))
        codec = str(row_params(np.array([i], dtype=np.uint64))["codec"][0])
        if _is_corrupt(i, codec):
            rows.append((cid, "snr", "garbage payload"))
        elif i % 601 == 9:
            rows.append((cid, "snr", "truncated payload"))
        if i % 250 == 13:
            rows.append((cid, "ref_integrity", "missing from manifest"))
    return pd.DataFrame(rows, columns=["clip_id", "check", "detail"]).drop_duplicates()


LONG_SCHEMA = StructType([StructField("id", LongType())])


CODEC_WAV = ["pcm_s16le", "mulaw", "alaw", "adpcm", "flac"]


def generate_codec_clips(
    spark: SparkSession,
    n: int,
    max_payload_ms: int = 200,
    partitions: int | None = None,
    codecs: list[str] | None = None,
) -> DataFrame:
    """Compressed-codec clips table — same shape as `clips`, but the
    payloads are REAL compressed audio: G.711 mu-law / A-law and IMA ADPCM
    WAV containers (format tags 0x07/0x06/0x11) plus native FLAC streams
    (operators/flac.py — Rice-coded fixed/LPC predictors, CRC + MD5
    verified), cycling with plain PCM16 by id; all decoded by the
    pure-numpy codecs. The SNR-vs-reference-render invariant runs THROUGH
    the codec: lossy compression costs ~12-16 dB but every clean clip stays
    above the 30 dB bar (G.711 ~38 dB, ADPCM ~35 dB on the fixture tones);
    FLAC is lossless, so its clips score like PCM16.

    Planted violations (disjoint residues from the PPM/PNG/clips plants):
    - corrupt payload    id % 127 == 21 (hash garbage, no RIFF)
    - truncated payload  id % 149 == 33 (blob cut mid-chunk)
    """
    from macrobase_spark.operators.audio import wav_bytes_codec

    cycle = codecs if codecs is not None else CODEC_WAV

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            p = row_params(ids)
            rows = []
            for s, r in zip(ids, p.itertuples()):
                i = int(s)
                codec = cycle[i % len(cycle)]
                sr = int(r.sr_hz)
                if i % 127 == 21:
                    g = splitmix64(np.arange(64, dtype=np.uint64) + np.uint64(i))
                    raw = g.astype("<u8").tobytes()
                else:
                    ms = min(int(r.dur_ms), max_payload_ms)
                    nsamp = max(int(sr * ms / 1000), 16)
                    f0 = float(tone_hz(np.array([i], dtype=np.uint64))[0])
                    sig = 0.8 * sin_samples(2 * np.pi * f0 / sr, nsamp)
                    noise = (
                        u01(np.arange(nsamp, dtype=np.uint64) + np.uint64(i) * np.uint64(2654435761), 5)
                        - 0.5
                    ) * 0.01
                    pcm = np.clip((sig + noise) * 32767, -32768, 32767).astype(np.int16)
                    if codec == "pcm_s16le":
                        raw = wav_bytes(pcm, sr)
                    else:
                        raw = wav_bytes_codec(pcm, sr, codec)
                    if i % 149 == 33:
                        raw = raw[: max(len(raw) // 3, 10)]
                rows.append(
                    (
                        f"clip_{i:012d}",
                        raw,
                        sr,
                        int(r.dur_ms),
                        codec,
                        _transcript(i, int(r.n_words)),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=["clip_id", "bytes", "sr_hz", "dur_ms", "codec", "transcript"],
            )

    parts = partitions or max(spark.sparkContext.defaultParallelism, 4)
    return spark.range(0, n, numPartitions=parts).mapInPandas(gen, CLIPS_SCHEMA)

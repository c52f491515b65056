"""Raw-line stream generator (reference alexp/.../streaming/
StreamGenerator.java:25-58): a CSV file replayed as a stream — the header
is consumed once, then `fetch()` yields one data line per call ("" at EOF)
and `fetch_chunk(seconds)` yields a variable-size chunk per simulated
second. The reference draws the chunk size from an UNSEEDED Random; here
the generator takes a seed (SURVEY §7.4 determinism policy — same
divergence as the skipped MCOD random auto-tune).

`stream_csv_lines` is the driver-facing rendering: minibatch DataFrames
(engine CSV conventions: missing strings → "NULL", bad doubles → NaN)
delivered to a callback — the same StreamingDataFrameLoader contract as
the HTTP part stream and the JDBC snapshot-offset stream. For production
streams prefer Structured Streaming's file source (`spark.readStream
.option("maxFilesPerTrigger", 1)`); this generator exists for reference
parity and deterministic replay in tests.
"""

from __future__ import annotations

import random
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from macrobase_spark.sources.rest_source import _parse_csv_part


class LineStreamGenerator:
    """Header-skipping line-at-a-time reader over a CSV file."""

    def __init__(self, path: str, max_bound: int = 10, seed: int | None = 0):
        self._fh = open(path, encoding="utf-8")
        self.header = self._fh.readline().rstrip("\n")
        self._rng = random.Random(seed)
        self.max_bound = max_bound

    def fetch(self) -> str:
        """Next non-blank data line, or "" at end of file
        (StreamGenerator.fetch). Blank lines are skipped: "" is the EOF
        sentinel, so a mid-file blank line must not masquerade as it (it
        would silently terminate the fixed-size batch replay and drop all
        remaining data); a blank CSV line carries no fields anyway — the
        chunk path filters them after parse."""
        while True:
            line = self._fh.readline()
            if not line:
                return ""
            line = line.rstrip("\n")
            if line:
                return line

    def fetch_chunk(self, seconds: int) -> list[str]:
        """~`seconds` worth of lines: a seeded draw from [1, max_bound *
        seconds], truncated at EOF (StreamGenerator.fetch(path, seconds))."""
        n = self._rng.randint(1, self.max_bound * seconds)
        chunk = []
        for _ in range(n):
            line = self._fh.readline()
            if not line:
                break
            chunk.append(line.rstrip("\n"))
        return chunk

    def close(self) -> None:
        self._fh.close()


def stream_csv_lines(
    spark: SparkSession,
    path: str,
    callback: Callable[[DataFrame], None],
    seconds_per_batch: int = 1,
    double_cols: list[str] | None = None,
    columns: list[str] | None = None,
    max_bound: int = 10,
    seed: int | None = 0,
    batch_lines: int | None = None,
) -> int:
    """Replay the file as minibatch DataFrames until EOF; returns the
    number of batches delivered. `batch_lines` switches from the seeded
    simulation chunking to FIXED-size batches — the reference's
    CsvStreamReader contract (maxReadBatchSize), used by the config
    pipelines' streaming loader."""
    gen = LineStreamGenerator(path, max_bound=max_bound, seed=seed)
    try:
        delivered = 0
        while True:
            if batch_lines is not None:
                chunk = []
                for _ in range(batch_lines):
                    line = gen.fetch()
                    if not line:
                        break
                    chunk.append(line)
            else:
                chunk = gen.fetch_chunk(seconds_per_batch)
            if not chunk:
                return delivered
            text = "\n".join([gen.header, *chunk])
            callback(_parse_csv_part(spark, text, double_cols, columns))
            delivered += 1
    finally:
        gen.close()

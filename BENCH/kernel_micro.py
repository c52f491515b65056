#!/usr/bin/env python
"""Micro-benchmark of the fused scoring kernel (score_record_batch) on
fixture-shaped batches — no Spark, single thread, so kernel changes are
measured in isolation. Prints a sentinel GEMM figure alongside so runs on
this host are comparable across its >2x neighbor-load swings."""

import os
import sys
import time

os.environ.setdefault("OMP_NUM_THREADS", "1")
os.environ.setdefault("OPENBLAS_NUM_THREADS", "1")

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyarrow as pa  # noqa: E402

from macrobase_spark.operators.audio import score_record_batch  # noqa: E402
from macrobase_spark.sources.clips import (  # noqa: E402
    _payload,
    _transcript,
    row_params,
)


def clips_record_batch(start: int, n: int, max_payload_ms: int = 100) -> pa.RecordBatch:
    """One Arrow batch with exactly the fixture generator's rows (same row
    functions as sources/clips.py::generate_clips, duplicate plant included)."""
    ids = np.arange(start, start + n, dtype=np.int64)
    src = np.where((ids % 500 == 7) & (ids > 0), ids - 1, ids)
    p = row_params(src)
    return pa.RecordBatch.from_pydict(
        {
            "clip_id": [f"clip_{int(s):012d}" for s in src],
            "sr_hz": pa.array(p["sr_hz"].to_numpy(), type=pa.int32()),
            "dur_ms": pa.array(p["dur_ms"].to_numpy(), type=pa.int32()),
            "codec": p["codec"].tolist(),
            "transcript": [
                _transcript(int(s), int(r.n_words)) for s, r in zip(src, p.itertuples())
            ],
            "bytes": pa.array(
                [
                    _payload(int(s), int(r.sr_hz), int(r.dur_ms), max_payload_ms, str(r.codec))
                    for s, r in zip(src, p.itertuples())
                ],
                type=pa.binary(),
            ),
        }
    )


def gemm_gf() -> float:
    a = np.random.rand(2000, 2000)
    b = np.random.rand(2000, 2000)
    t0 = time.time()
    a @ b
    return 2 * 2000**3 / 1e9 / (time.time() - t0)


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    batch_rows = 2000
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    batches = [
        clips_record_batch(start, min(batch_rows, n_rows - start), max_payload_ms=100)
        for start in range(0, n_rows, batch_rows)
    ]
    # warm the reference-render memo exactly like a long-lived worker
    for b in batches:
        score_record_batch(b)
    best = float("inf")
    for _ in range(reps):
        g0 = gemm_gf()
        t0 = time.time()
        for b in batches:
            score_record_batch(b)
        dt = time.time() - t0
        g1 = gemm_gf()
        print(
            f"pass: {dt:.3f} s  {n_rows / dt:,.0f} clips/s  "
            f"sentinel {g0:.1f}->{g1:.1f} GF"
        )
        best = min(best, dt)
    print(f"best: {best:.3f} s  {n_rows / best:,.0f} clips/s")


if __name__ == "__main__":
    main()

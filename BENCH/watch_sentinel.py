#!/usr/bin/env python
"""Sentinel watcher: poll the single-thread host sentinel every POLL_S
seconds; after CONSECUTIVE readings with GEMM >= THRESH_GF (the round-3
healthy state measured ~62 GF; 40 GF is comfortably above every degraded
state observed), launch ONE scaling run (2,8,32 cores on the 8M-clip
table) and exit. Only the single-thread figure gates — run 6's lesson:
a multi-threaded spot reading of 91 GF turned out to be ~15 GF
single-thread and produced an invalid pair.

Usage: python BENCH/watch_sentinel.py [--threshold 40] [--poll 240]
         [--max-hours 5] [--n 8000000]
Writes readings to BENCH/sentinel_watch.log; on trigger, runs
bench_scaling.py --cores 2,8,32 --n N and leaves its report in
BENCH/SCALING_r4_watch.md.
"""

import argparse
import os
import subprocess
import sys
import time
from pathlib import Path

os.environ.setdefault("OMP_NUM_THREADS", "1")
os.environ.setdefault("OPENBLAS_NUM_THREADS", "1")
os.environ.setdefault("MKL_NUM_THREADS", "1")

import numpy as np  # noqa: E402

ROOT = Path(__file__).resolve().parent.parent
LOG = ROOT / "BENCH" / "sentinel_watch.log"


def gemm_gf() -> float:
    a = np.random.rand(2000, 2000)
    b = np.random.rand(2000, 2000)
    t0 = time.time()
    a @ b
    return 2 * 2000**3 / 1e9 / (time.time() - t0)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--threshold", type=float, default=40.0)
    ap.add_argument("--poll", type=float, default=240.0)
    ap.add_argument("--consecutive", type=int, default=2)
    ap.add_argument("--max-hours", type=float, default=5.0)
    ap.add_argument("--n", type=int, default=8_000_000)
    ap.add_argument("--out", default="BENCH/SCALING_r4_watch.md")
    args = ap.parse_args()

    deadline = time.time() + args.max_hours * 3600
    streak = 0
    with open(LOG, "a") as log:
        log.write(f"--- watcher start {time.strftime('%F %T')} thresh={args.threshold}\n")
        log.flush()
        while time.time() < deadline:
            gf = gemm_gf()
            streak = streak + 1 if gf >= args.threshold else 0
            log.write(f"{time.strftime('%F %T')} gemm={gf:.1f} GF streak={streak}\n")
            log.flush()
            if streak >= args.consecutive:
                log.write(f"{time.strftime('%F %T')} TRIGGER: launching scaling run\n")
                log.flush()
                rc = subprocess.call(
                    [
                        sys.executable,
                        str(ROOT / "bench_scaling.py"),
                        "--cores",
                        "2,8,32",
                        "--n",
                        str(args.n),
                        "--out",
                        args.out,
                    ],
                    cwd=str(ROOT),
                )
                log.write(f"{time.strftime('%F %T')} scaling run rc={rc}\n")
                return rc
            time.sleep(args.poll)
        log.write(f"{time.strftime('%F %T')} watcher expired with no healthy window\n")
    return 1


if __name__ == "__main__":
    sys.exit(main())

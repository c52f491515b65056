"""Memory profiling (reference alexp/.../evaluation/memory/
BasicMemoryProfiler.java: peak-heap sampling around pipeline stages).

Spark already exposes richer per-executor metrics than the reference's
Runtime.totalMemory() sampling; this surface collects them from the
status API plus the driver/Python-worker RSS, so benchmark runs can report
peak memory alongside wall-clock the way the reference's benchmark does.
"""

from __future__ import annotations

import resource


def driver_peak_rss_mb() -> float:
    """Peak resident set size of THIS (driver) Python process, in MB —
    the reference's getPeakMemory analogue for the Python side."""
    ru = resource.getrusage(resource.RUSAGE_SELF)
    return ru.ru_maxrss / 1024.0  # linux reports KB


def executor_memory_metrics(spark) -> list[dict]:
    """Per-executor memory metrics from the Spark status API (JVM heap,
    off-heap, storage): one dict per executor, empty when the REST UI is
    disabled."""
    try:
        sc = spark.sparkContext
        tracker = sc._jsc.sc().statusStore()
        infos = tracker.executorList(True)
        out = []
        for i in range(infos.size()):
            e = infos.apply(i)
            out.append(
                {
                    "id": e.id(),
                    "max_memory_mb": round(e.maxMemory() / 1048576.0, 1),
                    "memory_used_mb": round(e.memoryUsed() / 1048576.0, 1),
                    "disk_used_mb": round(e.diskUsed() / 1048576.0, 1),
                }
            )
        return out
    except Exception:
        return []


class MemoryProfiler:
    """Reference BasicMemoryProfiler shape: snapshot around a stage, report
    the peak delta."""

    def __init__(self, spark=None):
        self.spark = spark
        self.start_rss = driver_peak_rss_mb()

    def peak(self) -> dict:
        report = {
            "driver_peak_rss_mb": round(driver_peak_rss_mb(), 1),
            "driver_delta_mb": round(driver_peak_rss_mb() - self.start_rss, 1),
        }
        if self.spark is not None:
            report["executors"] = executor_memory_metrics(self.spark)
        return report

"""SparkSession factory with scale-oriented defaults.

Defaults chosen for the target deployment (1000-executor cluster over
~100 TB of Iceberg/Parquet) but expressed as ratios/flags that hold at any
size: AQE on (runtime coalescing + skew-join splitting), partial-agg-friendly
shuffle sizing, Arrow for every pandas interchange.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "macrobase-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` in the sandbox; on a
    real cluster it is supplied by spark-submit and must be left None.
    """
    builder = SparkSession.builder.appName(app_name)
    if master is None and "SPARK_GRAFT_CPUS" in os.environ:
        master = f"local[{os.environ['SPARK_GRAFT_CPUS']}]"
    if master:
        builder = builder.master(master)
    if shuffle_partitions is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
        shuffle_partitions = max(cpus, 8)

    conf = {
        # AQE: runtime partition coalescing, skew-join splitting, empty-relation
        # propagation — the primary skew defense mandated by the north rule.
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.shuffle.partitions": str(shuffle_partitions),
        # File scans must produce at least ~2 splits/core even when the table
        # is small relative to maxPartitionBytes (at 100 TB the natural split
        # count dwarfs this and the setting is a no-op). Without it a small
        # binary-heavy table packs into a handful of splits and a CPU-heavy
        # Arrow-UDF stage runs on a fraction of the cores.
        "spark.sql.files.minPartitionNum": str(shuffle_partitions * 2),
        # Arrow everywhere Python touches data. Batch size targets
        # single-digit-MB batches for binary-heavy rows (~4 KB payloads →
        # ~8 MB): measured 2× faster than 40 MB batches on the audio scan —
        # batches stay cache-resident through the IPC + decode pipeline.
        "spark.sql.execution.arrow.pyspark.enabled": "true",
        "spark.sql.execution.arrow.maxRecordsPerBatch": "2000",
        # Broadcast threshold: dimension tables / frequent-itemset tables are
        # tiny; let Catalyst broadcast aggressively.
        "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
        # Stable timestamp semantics.
        "spark.sql.session.timeZone": "UTC",
        "spark.driver.memory": os.environ.get("SPARK_DRIVER_MEMORY", "8g"),
        # Quieter local runs.
        "spark.ui.enabled": "false",
    }
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark

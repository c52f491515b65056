"""Table-URI resolution for jobs: the production deployment reads the clips
relation from a catalog table (Iceberg per the north star — any Spark
catalog format works; the engine only needs `spark.read.table`), while
tests/benches read materialized parquet. One URI surface covers both:

- ``table://db.name`` / ``iceberg://db.name`` → ``spark.read.table`` (the
  catalog handles snapshot isolation, partition pruning, and metadata —
  with Iceberg, partition listing for the run manifest comes from the
  table's `.partitions` metadata table instead of a distinct() scan);
- ``parquet:///path`` or a bare path → ``spark.read.parquet``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def load_table(spark: SparkSession, uri: str) -> DataFrame:
    scheme, sep, rest = uri.partition("://")
    if not sep:
        return spark.read.parquet(uri)
    if scheme in ("table", "iceberg"):
        return spark.read.table(rest)
    if scheme == "parquet":
        return spark.read.parquet(rest)
    raise ValueError(f"unsupported table URI scheme {scheme!r}")

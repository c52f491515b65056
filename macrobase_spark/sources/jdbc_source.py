"""JDBC ingestion (reference alexp/.../ingest/SqlDataFrameReader.java +
SqlStreamReader.java): Spark's built-in JDBC source does the reference's
whole job — plus predicate pushdown and PARALLEL partitioned reads the
single-connection reference never had.

Scale notes: always give `partition_column` + bounds (or `predicates`) for
a big table — without them Spark reads through ONE connection on one task.
`num_partitions` concurrent connections each read a bounded slice;
Catalyst pushes filters/projections into the generated SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def jdbc_reader_options(
    url: str,
    table: str,
    partition_column: str | None = None,
    lower_bound=None,
    upper_bound=None,
    num_partitions: int | None = None,
    fetch_size: int = 10000,
    **extra,
) -> dict[str, str]:
    """The option map handed to spark.read.format('jdbc') — pure function so
    the assembly is unit-testable without a database/driver."""
    opts = {"url": url, "dbtable": table, "fetchsize": str(fetch_size)}
    if partition_column is not None:
        if lower_bound is None or upper_bound is None or num_partitions is None:
            raise ValueError(
                "partition_column requires lower_bound, upper_bound and num_partitions"
            )
        opts.update(
            partitionColumn=partition_column,
            lowerBound=str(lower_bound),
            upperBound=str(upper_bound),
            numPartitions=str(num_partitions),
        )
    opts.update({k: str(v) for k, v in extra.items()})
    return opts


def load_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    predicates: list[str] | None = None,
    **kwargs,
) -> DataFrame:
    """`predicates` (one WHERE clause per partition) is the alternative
    parallelization when no numeric partition column exists."""
    if predicates is not None:
        return spark.read.jdbc(url, table, predicates=predicates)
    opts = jdbc_reader_options(url, table, **kwargs)
    return spark.read.format("jdbc").options(**opts).load()

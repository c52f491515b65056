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


def stream_jdbc(
    spark: SparkSession,
    url: str,
    query: str,
    id_column: str,
    callback,
    max_batch_size: int = 10000,
    poll_interval: float = 1.0,
    max_batches: int | None = None,
    stop_after_empty_polls: int | None = None,
    fetch=None,
) -> int:
    """JDBC snapshot-offset stream (reference alexp/.../ingest/
    SqlStreamReader.java:55-101): poll `query WHERE id_column > max_id
    ORDER BY id_column` capped at `max_batch_size` rows, hand each
    non-empty minibatch DataFrame to `callback`, advance the offset to the
    batch's max id, sleep `poll_interval`, repeat. The reference loops
    forever; `max_batches` / `stop_after_empty_polls` bound the loop for
    finite sources and tests. Returns the number of batches delivered.

    `fetch(spark, offset, limit) -> DataFrame` overrides the page reader —
    the polling contract is testable without a JDBC driver on the
    classpath; the default page reader wraps the offset predicate in a
    JDBC dbtable subquery, so the database (not Spark) applies the
    offset/order/limit, exactly like the reference's setMaxRows cursor.
    """
    import time as _time

    if fetch is None:

        def fetch(spark_, offset, limit):  # pragma: no cover - needs a driver
            sub = (
                f"(SELECT * FROM ({query}) _mb_src WHERE {id_column} > {offset} "
                f"ORDER BY {id_column} LIMIT {limit}) _mb_page"
            )
            return (
                spark_.read.format("jdbc")
                .options(url=url, dbtable=sub, fetchsize=str(min(limit, 10000)))
                .load()
            )

    delivered = 0
    max_id = -1
    empty = 0
    while True:
        lazy = fetch(spark, max_id, max_batch_size)
        # Pin the page to ONE snapshot: a lazy JDBC DataFrame would re-run
        # the page query for the count, the max-id and the callback's own
        # action — three reads of a LIVE table that can each see a
        # different page, skipping or duplicating rows. The reference reads
        # one cursor (SqlStreamReader.java:62-76); a page is bounded by
        # max_batch_size, so one driver collect is the faithful (and 3×
        # cheaper) equivalent.
        page = lazy.collect()
        if page:
            empty = 0
            max_id = max(row[id_column] for row in page)
            callback(spark.createDataFrame(page, schema=lazy.schema))
            delivered += 1
            if max_batches is not None and delivered >= max_batches:
                return delivered
        else:
            empty += 1
            if stop_after_empty_polls is not None and empty >= stop_after_empty_polls:
                return delivered
        _time.sleep(poll_interval)

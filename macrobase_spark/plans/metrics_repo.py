"""Incremental metrics-state repository: per-partition MERGEABLE metric
states, persisted, so re-validating a growing table never rescans history.

The 10^12-row problem this solves: a daily append adds ~0.1% of the table,
but table-level column stats (count / null-rate / min / max / distinct /
quantiles) naively cost a full rescan. Every metric the profiler computes
is chosen to be an associative, commutative MERGE of per-partition states:

- count / null count / sum  → long/double adds (exact under merge; the
  registered query keeps summed columns integral so the merged sum is
  bit-identical to a full rescan — certified by the DuckDB oracle);
- min / max                 → exact under merge;
- distinct                  → HLL sketch binary state; `hll_union_agg` is
  register-max, so the union of per-partition sketches is IDENTICAL to the
  single-pass sketch regardless of how rows were grouped;
- quantiles                 → KLL sketch binary state via
  `kll_merge_agg_double` (merge is sketch-accurate: compaction order
  differs from the single-pass build, so estimates agree to sketch error,
  not bit-for-bit — tests gate the error).

Workflow (mirrors plans/manifest.py's resume contract):
    states = update_states(spark, df, "codec", cols, path)   # scans ONLY
                                                             # new partitions
    profile = merge_profile(spark, path, cols)               # reads states,
                                                             # never the data

`update_states` prunes with a literal `partition NOT IN (done)` filter —
on a partition-laid-out table (Iceberg / hive parquet) that reaches the
scan as a partition filter, so completed partitions are never even read.
The done-list is partition-grain (bounded: one string per partition), the
same cardinality contract the run manifest already holds.

Reference scope: the reference recomputes per-batch stats from scratch each
run (`BasicBatchPipeline.java` loads the full CSV every time); incremental
state persistence is the build brief's scale addition.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def partition_states(
    df: DataFrame, partition_col: str, numeric_cols: list[str]
) -> DataFrame:
    """ONE grouped pass over `df`: a states row per partition value, with
    exact scalars (count/nulls/min/max/sum) and binary HLL + KLL sketch
    states per column. Partial aggregation combines map-side; the shuffle
    carries one row per partition."""
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in numeric_cols:
        d = F.col(c).cast("double")
        aggs += [
            F.sum(F.col(c).isNull().cast("long")).alias(f"{c}__n_null"),
            F.min(d).alias(f"{c}__min"),
            F.max(d).alias(f"{c}__max"),
            F.sum(d).alias(f"{c}__sum"),
            F.hll_sketch_agg(F.col(c).cast("string")).alias(f"{c}__hll"),
            F.kll_sketch_agg_double(d).alias(f"{c}__kll"),
        ]
    return df.groupBy(
        F.col(partition_col).cast("string").alias("partition")
    ).agg(*aggs)


def update_states(
    spark: SparkSession,
    df: DataFrame,
    partition_col: str,
    numeric_cols: list[str],
    path: str,
) -> DataFrame:
    """Incremental update: compute states ONLY for partitions absent from
    the repository at `path`, append them, return the full states relation.
    The `NOT IN (done)` predicate is a literal partition filter — on a
    partitioned layout the scan skips completed partitions entirely."""
    done: list[str] = []
    if os.path.isfile(f"{path}/_SUCCESS"):
        done = [
            r["partition"]
            for r in spark.read.parquet(path).select("partition").distinct().collect()
        ]
    new = df
    if done:
        new = df.filter(~F.col(partition_col).cast("string").isin(done))
    fresh = partition_states(new, partition_col, numeric_cols)
    if done:
        if fresh.limit(1).count() > 0:
            fresh.write.mode("append").parquet(path)
    else:
        fresh.write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)


def merge_states(
    states: DataFrame,
    numeric_cols: list[str],
    quantiles: tuple[float, ...] = (0.5, 0.95, 0.99),
) -> DataFrame:
    """Merge per-partition states into the table-level profile — reads ONLY
    the states relation (one row per partition), never the data. Returns
    one row per column: exact merged scalars + sketch estimates."""
    qnames = [f"p{int(q * 100)}" for q in quantiles]
    aggs = [F.sum("n_rows").alias("__n_rows")]
    for c in numeric_cols:
        aggs += [
            F.sum(f"{c}__n_null").alias(f"{c}__n_null"),
            F.min(f"{c}__min").alias(f"{c}__min"),
            F.max(f"{c}__max").alias(f"{c}__max"),
            F.sum(f"{c}__sum").alias(f"{c}__sum"),
            F.hll_sketch_estimate(F.hll_union_agg(F.col(f"{c}__hll"))).alias(
                f"{c}__distinct"
            ),
            *[
                F.kll_sketch_get_quantile_double(
                    F.kll_merge_agg_double(F.col(f"{c}__kll")), F.lit(q)
                ).alias(f"{c}__{qn}")
                for q, qn in zip(quantiles, qnames)
            ],
        ]
    one = states.agg(*aggs)
    structs = [
        F.struct(
            F.lit(c).alias("column"),
            F.col("__n_rows").cast("long").alias("n_rows"),
            F.col(f"{c}__n_null").cast("long").alias("n_null"),
            F.col(f"{c}__min").alias("min"),
            F.col(f"{c}__max").alias("max"),
            F.col(f"{c}__sum").alias("sum"),
            F.col(f"{c}__distinct").cast("long").alias("approx_distinct"),
            *[F.col(f"{c}__{qn}").alias(qn) for qn in qnames],
        )
        for c in numeric_cols
    ]
    return one.select(F.explode(F.array(*structs)).alias("s")).select("s.*")


def merge_profile(
    spark: SparkSession,
    path: str,
    numeric_cols: list[str],
    quantiles: tuple[float, ...] = (0.5, 0.95, 0.99),
) -> DataFrame:
    return merge_states(spark.read.parquet(path), numeric_cols, quantiles)


# --------------------------------------------------------------------------
# Registered query: the merged-states profile's EXACT columns vs a DuckDB
# full rescan — certifying incremental merge == recompute, value-for-value.
# Summed columns are integral (dur_ms / sr_hz / payload_bytes), so the
# partition-then-merge double sums are exact; mean is one division on both
# sides. Sketch estimates are engine-specific and stay out of this relation
# (tests gate them instead, like the DataSketches profile).
# --------------------------------------------------------------------------

_COLS = ["dur_ms", "sr_hz", "payload_bytes"]

_S = "read_parquet('/tmp/mb_scored_v3_10000.parquet/*.parquet')"

_INC_ORACLE = f"""
WITH s AS (SELECT * FROM {_S})
SELECT col AS "column", n_rows, n_null, "min", "max", "sum",
       round("sum" / (n_rows - n_null), 6) AS mean
FROM (
  SELECT 'dur_ms' AS col, CAST(count(*) AS BIGINT) AS n_rows,
         CAST(sum(CASE WHEN dur_ms IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
         min(CAST(dur_ms AS DOUBLE)) AS "min", max(CAST(dur_ms AS DOUBLE)) AS "max",
         sum(CAST(dur_ms AS DOUBLE)) AS "sum" FROM s
  UNION ALL
  SELECT 'sr_hz', CAST(count(*) AS BIGINT),
         CAST(sum(CASE WHEN sr_hz IS NULL THEN 1 ELSE 0 END) AS BIGINT),
         min(CAST(sr_hz AS DOUBLE)), max(CAST(sr_hz AS DOUBLE)),
         sum(CAST(sr_hz AS DOUBLE)) FROM s
  UNION ALL
  SELECT 'payload_bytes', CAST(count(*) AS BIGINT),
         CAST(sum(CASE WHEN payload_bytes IS NULL THEN 1 ELSE 0 END) AS BIGINT),
         min(CAST(payload_bytes AS DOUBLE)), max(CAST(payload_bytes AS DOUBLE)),
         sum(CAST(payload_bytes AS DOUBLE)) FROM s
)
"""


def _register_clips_query() -> None:
    from macrobase_spark.queries import register

    @register("clips_incremental_stats", _INC_ORACLE)
    def clips_incremental_stats(spark, sf_dir):
        """Per-partition (codec) metric states merged into the table
        profile; the DuckDB oracle is a FULL RESCAN of the same files, so a
        green row certifies that the incremental merge path loses nothing."""
        from macrobase_spark.operators.clips_suite import clips_n, scored_parquet

        scored = spark.read.parquet(scored_parquet(spark, sf_dir))
        path = f"/tmp/mb_metric_states_v1_{clips_n(sf_dir)}.parquet"
        states = update_states(spark, scored, "codec", _COLS, path)
        prof = merge_states(states, _COLS)
        return prof.select(
            "column",
            "n_rows",
            "n_null",
            "min",
            "max",
            "sum",
            F.round(F.col("sum") / (F.col("n_rows") - F.col("n_null")), 6).alias("mean"),
        )


_register_clips_query()

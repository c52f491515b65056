"""Deterministic hash-based sampling and dataset splitting.

Training-data pipelines need REPRODUCIBLE subsetting: the same row must
land in the same sample / split on every run, on every cluster size, and
in every engine that audits the pipeline — `rand()` gives none of that.
The standard device is a content hash mapped to the unit interval:

    unit = uint32(first 8 hex chars of md5(key)) / 2^32

which is (a) deterministic, (b) uniform to ~1e-10 for any key set,
(c) order- and partition-independent, and (d) bit-identical across
Spark (`conv(substring(md5(k),1,8),16,10)`) and DuckDB
(`('0x' || substr(md5(k),1,8))::UBIGINT`) — so sampling decisions are
auditable by an independent engine, row for row.

Built on it:
- `stratified_sample(df, key, rate_by, rates)` — per-stratum Bernoulli
  sampling at exact per-stratum rates (a float applies one global rate).
- `split_assign(df, key, splits)` — train/val/test assignment by
  cumulative thresholds over the same unit hash; adding a split never
  reshuffles rows between existing splits if prefixes are kept stable.

Both are pure column expressions: a map-only Project, no shuffle, no
UDF; Catalyst pushes the sample filter into the scan's residual. At
10^12 rows the sample IS the scan filter — nothing else runs.

Reference parity: the reference's sampling lives in the legacy EW
reservoir family (`legacy/src/main/java/macrobase/analysis/sample/`,
ported in operators/ew.py) — weighted, stateful, stream-oriented.
This module is the batch/pipeline counterpart (exact-rate,
deterministic, engine-portable).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from macrobase_spark.queries import register

_SCALE = float(2**32)


def unit_hash(key: Column, salt: str = "") -> Column:
    """Uniform [0,1) from a key column — identical value in DuckDB via
    ('0x' || substr(md5(key || salt), 1, 8))::UBIGINT / 2^32."""
    h = F.md5(F.concat(key.cast("string"), F.lit(salt)))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("double") / F.lit(_SCALE)


def stratified_sample(
    df: DataFrame,
    key: str,
    rate_by: str | None = None,
    rates: dict[str, float] | float = 0.1,
    salt: str = "",
) -> DataFrame:
    """Keep each row iff unit_hash(key) < its stratum's rate. `rates` is
    a per-stratum dict (strata absent from it are dropped) or one global
    float. Pure filter — no shuffle, no state."""
    u = unit_hash(F.col(key), salt)
    if isinstance(rates, dict):
        if rate_by is None:
            raise ValueError("per-stratum rates need rate_by=<stratum column>")
        if not rates:
            raise ValueError("rates dict is empty — every row would be dropped")
        expr = None
        for stratum, r in rates.items():
            cond = (F.col(rate_by) == F.lit(stratum)) & (u < F.lit(float(r)))
            expr = cond if expr is None else (expr | cond)
        return df.where(expr)
    return df.where(u < F.lit(float(rates)))


def split_assign(
    df: DataFrame,
    key: str,
    splits: dict[str, float] | None = None,
    salt: str = "",
    col_name: str = "split",
) -> DataFrame:
    """Append a split label by cumulative unit-hash thresholds (insertion
    order of `splits` fixes the interval layout; weights must sum to 1)."""
    splits = splits or {"train": 0.8, "val": 0.1, "test": 0.1}
    total = sum(float(w) for w in splits.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split weights must sum to 1, got {total}")
    u = unit_hash(F.col(key), salt)
    expr, acc = None, 0.0
    names = list(splits)
    for name in names[:-1]:
        acc += float(splits[name])
        expr = (
            F.when(u < F.lit(acc), F.lit(name))
            if expr is None
            else expr.when(u < F.lit(acc), F.lit(name))
        )
    last = F.lit(names[-1])
    return df.withColumn(col_name, last if expr is None else expr.otherwise(last))


_DOC = "read_parquet('/root/testdata/sf0.01/documents.parquet')"
_U = "CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS UBIGINT) / 4294967296.0"


@register(
    "split_balance_documents",
    f"""
    WITH assigned AS (
      SELECT lang,
             CASE WHEN {_U} < 0.8 THEN 'train'
                  WHEN {_U} < 0.9 THEN 'val'
                  ELSE 'test' END AS split
      FROM {_DOC}
    )
    SELECT split, lang, CAST(count(*) AS BIGINT) AS n
    FROM assigned GROUP BY split, lang
    """,
)
def split_balance_documents(spark, sf_dir: str) -> DataFrame:
    """Per-(split, lang) row counts under the deterministic 80/10/10
    assignment — the audit a pipeline runs to confirm split balance and
    that the assignment is engine-reproducible (the oracle recomputes
    every row's split from scratch in DuckDB)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return (
        split_assign(docs, "doc_id")
        .groupBy("split", "lang")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )


@register(
    "stratified_sample_documents",
    f"""
    WITH kept AS (
      SELECT lang FROM {_DOC}
      WHERE (lang = 'en' AND {_U} < 0.1)
         OR (lang = 'zh' AND {_U} < 0.5)
         OR (lang NOT IN ('en','zh') AND {_U} < 0.25)
    ), tot AS (SELECT lang, CAST(count(*) AS BIGINT) AS total FROM {_DOC} GROUP BY lang)
    SELECT t.lang, t.total,
           CAST(coalesce(k.n, 0) AS BIGINT) AS sampled,
           round(coalesce(k.n, 0) / CAST(t.total AS DOUBLE), 4) AS realized_rate
    FROM tot t LEFT JOIN (SELECT lang, count(*) AS n FROM kept GROUP BY lang) k
      ON k.lang = t.lang
    """,
)
def stratified_sample_documents(spark, sf_dir: str) -> DataFrame:
    """Down-sample English 10x, keep half of Chinese, a quarter of the
    rest — the class-rebalancing move of corpus construction — and audit
    per-stratum realized rates. Every keep/drop decision replays row-for-
    row in the DuckDB oracle."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    u = unit_hash(F.col("doc_id"))
    kept = docs.where(
        ((F.col("lang") == "en") & (u < 0.1))
        | ((F.col("lang") == "zh") & (u < 0.5))
        | (~F.col("lang").isin("en", "zh") & (u < 0.25))
    )
    tot = docs.groupBy("lang").agg(F.count(F.lit(1)).cast("long").alias("total"))
    kn = kept.groupBy("lang").agg(F.count(F.lit(1)).alias("n"))
    return (
        tot.join(kn, "lang", "left")
        .na.fill({"n": 0})
        .select(
            "lang",
            "total",
            F.col("n").cast("long").alias("sampled"),
            F.round(F.col("n") / F.col("total").cast("double"), 4).alias(
                "realized_rate"
            ),
        )
    )


def weighted_sample(
    df: DataFrame,
    key: str,
    weight_col: str,
    rate: float,
    salt: str = "",
) -> DataFrame:
    """Importance sampling: keep row i with probability
    min(1, rate * w_i * N / Σw) — expected kept fraction ≈ `rate`, mass
    skewed toward heavy rows (quality scores, lengths). Two tiny
    aggregates (N, Σw) become broadcast literals; the keep decision is
    the same deterministic unit hash, so the sample is reproducible and
    engine-auditable like the uniform one. Rows where the min(...) clamp
    binds are ALWAYS kept (their weight saturates the budget)."""
    row = df.agg(
        F.count(F.lit(1)).alias("n"), F.sum(weight_col).alias("sw")
    ).collect()[0]
    n, sw = int(row["n"]), float(row["sw"] or 0.0)
    if sw <= 0:
        raise ValueError(f"weights in {weight_col!r} must sum to > 0")
    scale = rate * n / sw
    u = unit_hash(F.col(key), salt)
    return df.where(u < F.least(F.lit(1.0), F.col(weight_col) * F.lit(scale)))


@register(
    "weighted_sample_documents",
    f"""
    WITH stats AS (
      SELECT count(*) AS n, CAST(sum(n_chars) AS DOUBLE) AS sw FROM {_DOC}
    ), kept AS (
      SELECT d.lang, d.n_chars FROM {_DOC} d, stats s
      WHERE {_U} < least(1.0, d.n_chars * (0.2 * s.n / s.sw))
    ), tot AS (
      SELECT lang, CAST(count(*) AS BIGINT) AS total,
             round(avg(n_chars), 2) AS avg_chars_all
      FROM {_DOC} GROUP BY lang
    )
    SELECT t.lang, t.total,
           CAST(coalesce(k.n, 0) AS BIGINT) AS sampled,
           round(coalesce(k.n, 0) / CAST(t.total AS DOUBLE), 4) AS realized_rate,
           t.avg_chars_all,
           round(k.avg_chars_kept, 2) AS avg_chars_kept
    FROM tot t LEFT JOIN (
      SELECT lang, count(*) AS n, avg(n_chars) AS avg_chars_kept
      FROM kept GROUP BY lang
    ) k ON k.lang = t.lang
    """,
)
def weighted_sample_documents(spark, sf_dir: str) -> DataFrame:
    """Length-weighted 20% sample of the documents table: kept docs skew
    long (avg_chars_kept > avg_chars_all), realized rates hover near 0.2
    per stratum. Every keep decision replays row-for-row in DuckDB."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    kept = weighted_sample(docs, "doc_id", "n_chars", rate=0.2)
    tot = docs.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("total"),
        F.round(F.avg("n_chars"), 2).alias("avg_chars_all"),
    )
    kn = kept.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n"), F.avg("n_chars").alias("avg_chars_kept")
    )
    return (
        tot.join(kn, "lang", "left")
        .na.fill({"n": 0})
        .select(
            "lang",
            "total",
            F.col("n").cast("long").alias("sampled"),
            F.round(F.col("n") / F.col("total").cast("double"), 4).alias(
                "realized_rate"
            ),
            "avg_chars_all",
            F.round("avg_chars_kept", 2).alias("avg_chars_kept"),
        )
    )

"""Declarative constraint checks over the clips table, compiled to Spark
plans. This is the north-rule engine: column stats, uniqueness, referential
integrity, distribution drift, SNR decode validation — each emits violation
rows (clip_id, check, detail) plus per-partition metrics, and the suite
finishes with a MacroBase risk-ratio explanation of WHICH attribute
combinations are over-represented among violations.

Scan discipline (the property that makes this work at 10^12 rows):
the heavy table — `bytes` payloads dominate its width — is scanned EXACTLY
ONCE, by `score_clips` (operators.audio): one Arrow-batched pass that decodes
PCM, scores SNR, and projects every scalar the checks need into a ~60-byte
row. That narrow scored relation is persisted; every check below is an
aggregation/join over it:

- uniqueness: ONE hash aggregation on the key. Spark's partial aggregation
  is the two-phase (salted) aggregate — hot keys collapse map-side.
- referential: scored LEFT ANTI broadcast(dim-keys); AQE skew-join handles a
  skewed fk. The fact table is never shuffled.
- drift: two-level aggregation (rows → group stats → MAD over group medians);
  only group-level rows ever leave the executors.
- verdicts: per-partition rollup of violations; the driver sees one row per
  (partition, check).
- explanation: APriori risk-ratio rounds over the narrow cache.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from macrobase_spark.operators.audio import score_clips
from macrobase_spark.operators.explain import ExplainParams, explain

VIOLATION_COLS = ["clip_id", "check", "detail"]


def _v(df: DataFrame, check: str, detail) -> DataFrame:
    return df.select(
        F.col("clip_id"),
        F.lit(check).alias("check"),
        (detail if not isinstance(detail, str) else F.lit(detail)).alias("detail"),
    )


@dataclass
class SuiteConfig:
    partition_col: str = "codec"
    min_snr_db: float = 30.0
    drift_mad_threshold: float = 3.0
    explain_min_support: float = 0.05
    explain_min_ratio: float = 1.5
    # Materialization strategy for the scored relation:
    #   "local"      localCheckpoint — fastest on a single JVM (bench default),
    #                but blocks are non-replicated and lineage is truncated, so
    #                an executor loss kills the run. Single-JVM / bench only.
    #   "persist"    MEMORY_AND_DISK_2 (replicated) + lineage kept — survives
    #                one executor loss; use on clusters with dynamic allocation.
    #   "checkpoint" reliable checkpoint to spark.checkpoint.dir — survives any
    #                executor churn; use for long multi-stage cluster runs.
    cache: str = "local"


def _materialize(df: DataFrame, mode: str) -> DataFrame:
    if mode == "local":
        return df.localCheckpoint(eager=True)
    if mode == "persist":
        from pyspark import StorageLevel

        df = df.persist(StorageLevel.MEMORY_AND_DISK_2)
        df.count()  # eager
        return df
    if mode == "checkpoint":
        return df.checkpoint(eager=True)
    raise ValueError(f"unknown cache mode {mode!r}; one of local/persist/checkpoint")


@dataclass
class SuiteResult:
    violations: DataFrame  # (clip_id, check, detail)
    verdicts: DataFrame  # (partition, check, n_violations, n_rows, passed)
    explanation: DataFrame  # risk-ratio violation-row explanations
    column_stats: DataFrame
    scored: DataFrame  # the narrow one-scan relation (persisted)


def uniqueness_check(scored: DataFrame) -> DataFrame:
    dups = (
        scored.groupBy("clip_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 1)
    )
    return _v(dups, "uniqueness", F.concat(F.lit("duplicate x"), F.col("n")))


def null_checks(scored: DataFrame) -> DataFrame:
    nulls = _v(scored.filter(F.col("transcript_null")), "null_transcript", "transcript is null")
    empties = _v(
        scored.filter(F.col("transcript_empty")), "empty_transcript", "transcript is empty"
    )
    return nulls.unionByName(empties)


def row_local_checks(scored: DataFrame) -> DataFrame:
    """null/empty transcript + SNR violations in ONE scan: each row emits its
    (possibly several) violation structs and explodes them — identical rows
    to null_checks ∪ snr_violations, but one pass instead of three. At 10^12
    rows every saved pass over the scored relation is a saved stage."""
    snr_detail = F.when(~F.col("decode_ok"), F.lit("decode failed")).otherwise(
        F.concat(F.lit("snr_db="), F.round("snr_db", 1).cast("string"))
    )

    def v(check: str, detail) -> Column:
        return F.struct(
            F.lit(check).alias("check"),
            (detail if not isinstance(detail, str) else F.lit(detail)).alias("detail"),
        )

    return scored.select(
        "clip_id",
        F.explode(
            F.array_compact(
                F.array(
                    F.when(F.col("transcript_null"), v("null_transcript", "transcript is null")),
                    F.when(F.col("transcript_empty"), v("empty_transcript", "transcript is empty")),
                    F.when(~F.col("snr_pass"), v("snr", snr_detail)),
                )
            )
        ).alias("_v"),
    ).select("clip_id", F.col("_v.check").alias("check"), F.col("_v.detail").alias("detail"))


def ref_integrity_check(scored: DataFrame, manifest: DataFrame) -> DataFrame:
    """LEFT ANTI join against the manifest keys. No broadcast hint and no
    distinct: the manifest is fact-sized (one row per clip), so forcing a
    broadcast would ship the whole key set to every task; AQE picks
    broadcast automatically when the right side IS small, and its skew-join
    splitting covers hot keys otherwise. Anti join needs no dedup."""
    orphans = scored.join(manifest.select("clip_id"), "clip_id", "left_anti")
    return _v(orphans, "ref_integrity", "missing from manifest")


def snr_violations(scored: DataFrame) -> DataFrame:
    bad = scored.filter(~F.col("snr_pass"))
    return _v(
        bad,
        "snr",
        F.when(~F.col("decode_ok"), F.lit("decode failed")).otherwise(
            F.concat(F.lit("snr_db="), F.round("snr_db", 1).cast("string"))
        ),
    )


def drift_group_rows(
    scored: DataFrame, metric: str, partition_cols: list[str], approx: bool = True
) -> list:
    """Per-group drift scores: group median of `metric`, then a MAD robust
    z-score ACROSS groups (reference MAD semantics applied at the group
    grain, cf. alexp/.../outlier/MAD.java:27-91 + MetricBucketTransformer).

    ONE Spark job computes the per-group medians (mergeable sketch when
    approx, exact R-7 percentile otherwise — the oracle-certified flavor);
    the MAD across groups runs on the driver — the group table is bounded by
    the attribute-combination cardinality, never by row count.

    Returns [(group_values..., med, score)] driver-side tuples.
    """
    import numpy as np

    med_agg = (
        F.percentile_approx(metric, 0.5, 10000) if approx else F.percentile(metric, 0.5)
    )
    rows = (
        scored.groupBy(*partition_cols)
        .agg(med_agg.alias("med"), F.count(F.lit(1)).alias("n"))
        .collect()
    )
    if not rows:
        return []
    meds = np.array([float(r["med"]) for r in rows])
    median = float(np.percentile(meds, 50))
    resid = np.abs(meds - median)
    mad = float(np.percentile(resid, 50))
    scale = 1.4826 * mad if mad > 0 else (1.253314 * resid.mean() if resid.mean() else 1.0)
    scores = resid / scale
    return [
        (*[r[c] for c in partition_cols], float(r["med"]), float(s))
        for r, s in zip(rows, scores)
    ]


def drift_check(
    scored: DataFrame, metric: str, partition_cols: list[str], mad_threshold: float
) -> DataFrame:
    """Drift scores rendered as violation rows (clip_id = NULL, one per
    drifted group)."""
    spark = scored.sparkSession
    schema = "clip_id string, check string, detail string"
    out = [
        (
            None,
            "drift",
            f"drifted {metric} in ("
            + ",".join(str(v) for v in row[:-2])
            + f"): med={round(row[-2], 1)} score={round(row[-1], 2)}",
        )
        for row in drift_group_rows(scored, metric, partition_cols)
        if row[-1] > mad_threshold
    ]
    return spark.createDataFrame(out, schema)


def column_stats(scored: DataFrame, partition_col: str, approx: bool = True) -> DataFrame:
    """One-pass per-partition profile. ``approx=True`` (production): quantiles
    via the mergeable percentile_approx sketch, distinct counts via HLL —
    both cluster-safe single-pass sketches. ``approx=False``: exact R-7
    percentile + exact distinct, bit-matching the DuckDB oracle."""
    if approx:
        p50 = F.percentile_approx("dur_ms", F.lit(0.5), 10000)
        p95 = F.percentile_approx("dur_ms", F.lit(0.95), 10000)
        nsr = F.approx_count_distinct("sr_hz")  # mergeable HLL sketch
    else:
        p50 = F.percentile("dur_ms", F.lit(0.5))
        p95 = F.percentile("dur_ms", F.lit(0.95))
        nsr = F.countDistinct("sr_hz")
    return scored.groupBy(partition_col).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.round(F.avg(F.col("transcript_null").cast("double")), 6).alias(
            "transcript_null_rate"
        ),
        F.min("dur_ms").alias("min_dur_ms"),
        F.max("dur_ms").alias("max_dur_ms"),
        F.round(p50.cast("double"), 6).alias("dur_ms_p50"),
        F.round(p95.cast("double"), 6).alias("dur_ms_p95"),
        nsr.alias("n_sr_values"),
        F.round(F.avg("payload_bytes"), 2).alias("avg_payload_bytes"),
    )


def run_suite(
    clips: DataFrame, manifest: DataFrame, cfg: SuiteConfig | None = None
) -> SuiteResult:
    cfg = cfg or SuiteConfig()
    # THE scan: bytes are read once, decode+SNR happen here, and only the
    # narrow scored projection is materialized for the rest of the suite
    # (strategy per cfg.cache — localCheckpoint stores the row RDD directly,
    # measurably cheaper than InMemoryRelation's compressed columnar cache
    # for a relation this narrow, and every reuse skips the Python scan).
    scored = _materialize(score_clips(clips, cfg.min_snr_db), cfg.cache)
    return _suite_from_scored(scored, manifest, cfg)


def run_suite_files(
    spark,
    table_path: str,
    manifest: DataFrame,
    cfg: SuiteConfig | None = None,
    batch_rows: int = 2000,
) -> SuiteResult:
    """run_suite over a parquet table scanned Python-natively (pyarrow in
    the workers — see audio.score_clips_from_files): the payload bytes never
    enter the JVM, which removes the double byte-handling of the JVM-scan +
    Arrow-IPC path (~2× on the scan stage at every parallelism level)."""
    from macrobase_spark.operators.audio import score_clips_from_files

    cfg = cfg or SuiteConfig()
    scored = _materialize(
        score_clips_from_files(spark, table_path, cfg.min_snr_db, batch_rows), cfg.cache
    )
    return _suite_from_scored(scored, manifest, cfg)


def row_violations(scored: DataFrame, manifest: DataFrame) -> DataFrame:
    """All row-level (clip_id-attributed) violations: uniqueness, transcript
    nulls/empties, referential integrity, SNR decode failures.

    THREE passes over the narrow scored relation, not five: the row-local
    checks (nulls/empties/snr) share one explode scan; uniqueness is the one
    aggregation that genuinely needs a shuffle; referential is the anti-join."""
    return (
        uniqueness_check(scored)
        .unionByName(row_local_checks(scored))
        .unionByName(ref_integrity_check(scored, manifest))
    )


def verdicts_from_violations(
    scored: DataFrame, row_viol: DataFrame, partition_col: str
) -> DataFrame:
    """Per-partition verdicts: attribute row-level violations back to their
    partition via the scored rows."""
    per_part = (
        scored.select("clip_id", partition_col)
        .join(row_viol, "clip_id")
        .groupBy(partition_col, "check")
        .agg(F.count(F.lit(1)).alias("n_violations"))
    )
    part_sizes = scored.groupBy(partition_col).agg(F.count(F.lit(1)).alias("n_rows"))
    return (
        part_sizes.join(per_part, partition_col, "left")
        .withColumn("n_violations", F.coalesce("n_violations", F.lit(0)))
        .withColumn("passed", F.col("n_violations") == 0)
    )


def explain_from_violations(
    scored: DataFrame, row_viol: DataFrame, cfg: SuiteConfig
) -> DataFrame:
    """classify-then-explain: which (codec, sr_hz) combos over-index in
    violations — MacroBase risk-ratio APriori over the narrow scored cache."""
    flagged = scored.join(
        row_viol.select("clip_id").distinct().withColumn("_OUTLIER", F.lit(1.0)),
        "clip_id",
        "left",
    ).withColumn("_OUTLIER", F.coalesce("_OUTLIER", F.lit(0.0)))
    return explain(
        flagged.withColumn("sr_hz_s", F.col("sr_hz").cast("string")),
        ExplainParams(
            attributes=[cfg.partition_col, "sr_hz_s"],
            min_support=cfg.explain_min_support,
            min_ratio_metric=cfg.explain_min_ratio,
            ratio_metric="risk_ratio",
            max_order=2,
            cache_base=False,  # scored is already checkpointed
        ),
    )


def _suite_from_scored(
    scored: DataFrame, manifest: DataFrame, cfg: SuiteConfig
) -> SuiteResult:
    """Build the suite outputs from the materialized scored relation.

    The row-violation materialization and the drift aggregation are
    INDEPENDENT jobs over the same cached relation — submit them from two
    driver threads so they overlap (multi-job driver pattern; at any cluster
    size the scheduler interleaves their tasks instead of idling between
    sequential jobs — sequential job latency is exactly the non-scaling
    term in the N-vs-4N throughput ratio)."""
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(3) as ex:
        viol_fut = ex.submit(
            lambda: _materialize(row_violations(scored, manifest), cfg.cache)
        )
        drift_fut = ex.submit(
            drift_check, scored, "dur_ms", [cfg.partition_col, "sr_hz"], cfg.drift_mad_threshold
        )
        row_viol = viol_fut.result()
        # the explain lattice rounds only need row_viol — start them while
        # the drift aggregation may still be in flight
        explain_fut = ex.submit(explain_from_violations, scored, row_viol, cfg)
        drift = drift_fut.result()
        explanation = explain_fut.result()
    # drift rows are a tiny driver-local relation; the union costs nothing —
    # consumers of `violations` never rescan the heavy branches
    violations = row_viol.unionByName(drift)
    verdicts = verdicts_from_violations(scored, row_viol, cfg.partition_col)
    stats = column_stats(scored, cfg.partition_col)
    return SuiteResult(violations, verdicts, explanation, stats, scored)

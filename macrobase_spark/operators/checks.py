"""Declarative constraint checks over the clips table, compiled to Spark
plans. This is the north-rule engine: column stats, uniqueness, referential
integrity, distribution drift, SNR decode validation — each emits violation
rows (clip_id, check, detail) plus per-partition metrics, and the suite
finishes with a MacroBase risk-ratio explanation of WHICH attribute
combinations are over-represented among violations.

Scale shapes:
- uniqueness: ONE hash aggregation on the key. Spark's partial aggregation
  is the two-phase (salted) aggregate — hot keys collapse map-side.
- referential: fact LEFT ANTI broadcast(dim-keys); AQE skew-join handles a
  skewed fk. The fact table is never shuffled.
- drift: two-level aggregation (rows → group stats → MAD over group medians);
  only group-level rows ever leave the executors.
- SNR: Arrow-batched mapInPandas (see operators.audio) — the only Python.
- verdicts: per-partition rollup of violations; the driver sees one row per
  (partition, check).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from macrobase_spark.operators.audio import snr_check
from macrobase_spark.operators.classify import mad_classify
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


@dataclass
class SuiteResult:
    violations: DataFrame  # (clip_id, check, detail)
    verdicts: DataFrame  # (partition, check, n_violations, n_rows, passed)
    explanation: DataFrame  # risk-ratio violation-row explanations
    column_stats: DataFrame


def uniqueness_check(clips: DataFrame) -> DataFrame:
    dups = (
        clips.groupBy("clip_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 1)
    )
    return _v(dups, "uniqueness", F.concat(F.lit("duplicate x"), F.col("n")))


def null_checks(clips: DataFrame) -> DataFrame:
    nulls = _v(clips.filter(F.col("transcript").isNull()), "null_transcript", "transcript is null")
    empties = _v(
        clips.filter(F.col("transcript") == ""), "empty_transcript", "transcript is empty"
    )
    return nulls.unionByName(empties)


def ref_integrity_check(clips: DataFrame, manifest: DataFrame) -> DataFrame:
    keys = manifest.select("clip_id").distinct()
    orphans = clips.join(F.broadcast(keys), "clip_id", "left_anti")
    return _v(orphans, "ref_integrity", "missing from manifest")


def snr_violations(clips: DataFrame, min_snr_db: float) -> DataFrame:
    scored = snr_check(clips, min_snr_db)
    bad = scored.filter(~F.col("snr_pass"))
    return _v(
        bad,
        "snr",
        F.when(~F.col("decode_ok"), F.lit("decode failed")).otherwise(
            F.concat(F.lit("snr_db="), F.round("snr_db", 1).cast("string"))
        ),
    )


def drift_check(
    clips: DataFrame, metric: str, partition_cols: list[str], mad_threshold: float
) -> DataFrame:
    """Distribution drift: per-group median of `metric`, then a MAD robust
    z-score ACROSS groups (reference MAD semantics applied at the group
    grain, cf. alexp/.../outlier/MAD.java:27-91 + MetricBucketTransformer).
    Emits one violation row per drifted group (clip_id = NULL)."""
    groups = clips.groupBy(*partition_cols).agg(
        F.percentile_approx(metric, 0.5, 10000).alias("med"),
        F.count(F.lit(1)).alias("n"),
    )
    flagged = mad_classify(groups, "med", threshold=mad_threshold)
    bad = flagged.filter(F.col("_OUTLIER") == 1.0)
    return bad.select(
        F.lit(None).cast("string").alias("clip_id"),
        F.lit("drift").alias("check"),
        F.concat_ws(
            "",
            F.lit(f"drifted {metric} in ("),
            F.concat_ws(",", *[F.col(c).cast("string") for c in partition_cols]),
            F.lit("): med="),
            F.round("med", 1).cast("string"),
            F.lit(" score="),
            F.round("_SCORE", 2).cast("string"),
        ).alias("detail"),
    )


def column_stats(clips: DataFrame, partition_col: str) -> DataFrame:
    """One-pass per-partition profile; quantiles via the mergeable
    percentile_approx sketch (cluster-safe)."""
    return clips.groupBy(partition_col).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.round(F.avg(F.col("transcript").isNull().cast("double")), 6).alias(
            "transcript_null_rate"
        ),
        F.min("dur_ms").alias("min_dur_ms"),
        F.max("dur_ms").alias("max_dur_ms"),
        F.percentile_approx("dur_ms", F.array(F.lit(0.5), F.lit(0.95)), 10000).alias(
            "dur_ms_p50_p95"
        ),
        F.countDistinct("sr_hz").alias("n_sr_values"),
        F.round(F.avg(F.length("bytes")), 2).alias("avg_payload_bytes"),
    )


def run_suite(
    clips: DataFrame, manifest: DataFrame, cfg: SuiteConfig | None = None
) -> SuiteResult:
    cfg = cfg or SuiteConfig()
    clips = clips.persist(StorageLevel.MEMORY_AND_DISK)

    violations = (
        uniqueness_check(clips)
        .unionByName(null_checks(clips))
        .unionByName(ref_integrity_check(clips, manifest))
        .unionByName(snr_violations(clips, cfg.min_snr_db))
        .unionByName(drift_check(clips, "dur_ms", [cfg.partition_col, "sr_hz"], cfg.drift_mad_threshold))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )

    # per-partition verdicts: attribute row-level violations back to their
    # partition via the clip rows (broadcast the violation keys)
    row_viol = violations.filter(F.col("clip_id").isNotNull())
    per_part = (
        clips.select("clip_id", cfg.partition_col)
        .join(row_viol, "clip_id")
        .groupBy(cfg.partition_col, "check")
        .agg(F.count(F.lit(1)).alias("n_violations"))
    )
    part_sizes = clips.groupBy(cfg.partition_col).agg(F.count(F.lit(1)).alias("n_rows"))
    verdicts = (
        part_sizes.join(per_part, cfg.partition_col, "left")
        .withColumn("n_violations", F.coalesce("n_violations", F.lit(0)))
        .withColumn("passed", F.col("n_violations") == 0)
    )

    # classify-then-explain: which (codec, sr_hz) combos over-index in violations
    flagged = clips.join(
        row_viol.select("clip_id").distinct().withColumn("_OUTLIER", F.lit(1.0)),
        "clip_id",
        "left",
    ).withColumn("_OUTLIER", F.coalesce("_OUTLIER", F.lit(0.0)))
    explanation = explain(
        flagged.withColumn("sr_hz_s", F.col("sr_hz").cast("string")),
        ExplainParams(
            attributes=[cfg.partition_col, "sr_hz_s"],
            min_support=cfg.explain_min_support,
            min_ratio_metric=cfg.explain_min_ratio,
            ratio_metric="risk_ratio",
            max_order=2,
        ),
    )

    stats = column_stats(clips, cfg.partition_col)
    return SuiteResult(violations, verdicts, explanation, stats)

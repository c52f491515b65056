"""Score-dump diagnostics (the reference's Dump*/Grid* plumbing — the
last contrib files):

- ScoreDumper.java:24-52 — dump (metrics, score) for the data, or for a
  regular grid over the data's bounding box;
- DiagnosticsUtils.java:12-80 — grid construction: fixed point count
  (delta = (hi-lo)/(points-1)) or fixed increment (points =
  int((hi-lo)/delta + 1)); the reference's convertToGrid only supports
  1D/2D and silently yields an EMPTY grid above that (mirrored);
- AlgebraUtils.getBoundingBox:56-67 — per-dimension min/max;
- DumpClassifier.java:20-77 — pass-through classifier that also writes
  "index,flag" lines in arrival order;
- BeforeAfterDumpingBatchScoreFeatureTransform.java:14-45 — dump
  (metrics before, metrics after) pairs around a transform;
- GridDumpingBatchScoreTransform.java:17-70 — grid dump + mixture
  component dumps (weights-/covariances-/centers- JSON files, via
  JsonUtils.java:13-25 which writes under target/scores/);
- GridDumpingPipeline.java:22-77 — score transform + dumps +
  BatchingPercentileClassifier + summarizer (wired in pipelines.run_config).

Spark shape: grids are generated DISTRIBUTED (spark.range per dimension,
cross-joined — a broadcast nested-loop of tiny ranges) and scored through
the same Arrow scoring path as the data, so a 1000x1000 diagnostic grid
is a map-only job, not a driver loop. Dumps of per-row relations go
through the DataFrame JSON/CSV writers (distributed, one part per task);
`single_file=True` coalesces for the reference's one-local-file
convention at diagnostic scales.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def bounding_box(df: DataFrame, metric_cols: list) -> list:
    """AlgebraUtils.getBoundingBox: per-dimension [min, max] of the data."""
    aggs = []
    for c in metric_cols:
        aggs.append(F.min(F.col(c).cast("double")).alias(f"__lo_{c}"))
        aggs.append(F.max(F.col(c).cast("double")).alias(f"__hi_{c}"))
    row = df.agg(*aggs).collect()[0]
    return [(float(row[f"__lo_{c}"]), float(row[f"__hi_{c}"])) for c in metric_cols]


def _grid(
    spark: SparkSession, metric_cols: list, anchors: list
) -> DataFrame:
    """Cross-join per-dimension anchor relations (reference convertToGrid:
    34-58 — 1D/2D only; higher dimensions yield an empty grid, mirrored)."""
    if len(anchors) > 2 or not anchors:
        return spark.createDataFrame(
            [], ", ".join(f"`{c}` double" for c in metric_cols)
        )
    out = None
    for c, (lo, delta, n) in zip(metric_cols, anchors):
        d = spark.range(n).select(
            (F.lit(lo) + F.col("id").cast("double") * F.lit(delta)).alias(c)
        )
        out = d if out is None else out.crossJoin(d)
    return out


def grid_fixed_size(
    spark: SparkSession, metric_cols: list, boundaries: list, points_per_dim: int
) -> DataFrame:
    """DiagnosticsUtils.createGridFixedSize:61-80."""
    anchors = [
        (lo, (hi - lo) / (points_per_dim - 1.0), points_per_dim)
        for lo, hi in boundaries
    ]
    return _grid(spark, metric_cols, anchors)


def grid_fixed_increment(
    spark: SparkSession, metric_cols: list, boundaries: list, delta: float
) -> DataFrame:
    """DiagnosticsUtils.createGridFixedIncrement:12-32."""
    anchors = [
        (lo, delta, int((hi - lo) / delta + 1)) for lo, hi in boundaries
    ]
    return _grid(spark, metric_cols, anchors)


def _write(df: DataFrame, path: str, fmt: str, single_file: bool) -> str:
    w = (df.coalesce(1) if single_file else df).write.mode("overwrite")
    if fmt == "json":
        w.json(path)
    else:
        w.option("header", False).csv(path)
    return path


def dump_scores(
    scored: DataFrame,
    metric_cols: list,
    score_col: str,
    path: str,
    *,
    single_file: bool = True,
) -> str:
    """ScoreDumper.dumpScores / tryToDumpScoredGrid output shape: one JSON
    object per row with the metric vector and its score
    (MetricsAndScore)."""
    rel = scored.select(
        F.array(*[F.col(c).cast("double") for c in metric_cols]).alias("metrics"),
        F.col(score_col).cast("double").alias("score"),
    )
    return _write(rel, path, "json", single_file)


def dump_scored_grid(
    df: DataFrame,
    metric_cols: list,
    score_with,
    path: str,
    *,
    points_per_dim: int = 1000,
    single_file: bool = True,
) -> str:
    """GridDumpingBatchScoreTransform.consume:44-51: score a
    points_per_dim^D grid over the data's bounding box with an
    already-FITTED scorer and dump it. ``score_with(grid_df) ->
    DataFrame`` must add a `_SCORE` column (e.g.
    ``lambda g: kde_score(g, cols, None, model=fitted)``)."""
    box = bounding_box(df, metric_cols)
    grid = grid_fixed_size(df.sparkSession, metric_cols, box, points_per_dim)
    scored = score_with(grid)
    return dump_scores(scored, metric_cols, "_SCORE", path, single_file=single_file)


def dump_before_after(
    before: DataFrame,
    after: DataFrame,
    metric_cols: list,
    after_cols: list,
    join_col: str,
    path: str,
    *,
    single_file: bool = True,
) -> str:
    """BeforeAfterDumpingBatchScoreFeatureTransform: (metricsBefore,
    metricsAfter) pairs — keyed by ``join_col`` (the reference pairs
    positionally within one in-memory batch)."""
    b = before.select(
        F.col(join_col),
        F.array(*[F.col(c).cast("double") for c in metric_cols]).alias(
            "metricsBefore"
        ),
    )
    a = after.select(
        F.col(join_col),
        F.array(*[F.col(c).cast("double") for c in after_cols]).alias(
            "metricsAfter"
        ),
    )
    return _write(
        b.join(a, join_col).select("metricsBefore", "metricsAfter"),
        path,
        "json",
        single_file,
    )


def dump_classifier(
    classified: DataFrame,
    outlier_col: str,
    order_col: str,
    path: str,
) -> DataFrame:
    """DumpClassifier.consume:53-67: write "index,flag" in arrival order
    and pass the relation through unchanged. Arrival order is pinned by
    ``order_col`` (a DataFrame has no inherent order); the global
    row-number sort makes this a single-task diagnostic, matching the
    reference's one local file."""
    from pyspark.sql import Window

    idx = (
        classified.select(
            (F.row_number().over(Window.orderBy(order_col)) - 1).alias("index"),
            F.when(F.col(outlier_col).cast("double") > 0, 1)
            .otherwise(0)
            .alias("flag"),
        )
    )
    _write(idx, path, "csv", True)
    return classified


def dump_as_json(obj, filename: str, out_dir: str = "target/scores") -> str:
    """JsonUtils.dumpAsJson:13-25 (numpy arrays serialized as lists)."""
    import numpy as np

    def conv(o):
        if isinstance(o, np.ndarray):
            return o.tolist()
        if isinstance(o, (np.floating, np.integer)):
            return o.item()
        raise TypeError(type(o).__name__)

    os.makedirs(out_dir, exist_ok=True)
    p = os.path.join(out_dir, filename)
    with open(p, "w") as f:
        json.dump(obj, f, indent=2, default=conv)
    return p


def dump_mixture_components(model, suffix: str, out_dir: str = "target/scores") -> list:
    """GridDumpingBatchScoreTransform.consume:53-58: weights- /
    covariances- / centers- JSON files from any mixture model exposing
    (weights, covs, means) — contrib_stats.GMMModel and the vargmm
    predictive relations both do."""
    return [
        dump_as_json(getattr(model, attr), f"{name}-{suffix}", out_dir)
        for name, attr in (
            ("weights", "weights"),
            ("covariances", "covs"),
            ("centers", "means"),
        )
    ]

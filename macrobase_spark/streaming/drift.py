"""Windowed PSI drift — the streaming face of operators/drift.py.

A drift monitor on a live stream can't compute global quantiles over an
unbounded input, so the reference distribution (bin edges + expected
bin-shares) is FIT ON A REFERENCE BATCH (`reference_distribution`) and
baked into the plan as broadcast literals. Each event-time window then
scores every group's observed bin-share vector against the reference:

    PSI_w,g = Σ_i (a_i − e_i) · ln(a_i / e_i)

The whole thing is ONE stateful aggregation: bin assignment is a chain of
codegen'd comparisons, and per-bin counts are conditional sums inside the
single groupBy(window, group) — no second stateful operator, so it runs in
append mode with a plain watermark and scales like any windowed count
(state = |windows|×|groups| rows of B counters).

`windowed_psi` works unchanged on a batch DataFrame (same plan minus the
watermark), which is what the stream==batch equivalence test pins down.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from macrobase_spark.operators.drift import EPS, _bin_expr, quantile_edges


def reference_distribution(
    df: DataFrame, metric: str, n_bins: int = 10
) -> tuple[list[float], list[float]]:
    """Fit (edges, expected shares) on a reference batch. Exact percentile
    here (small reference); approx_percentile for a huge reference."""
    edges = quantile_edges(df, metric, n_bins)
    n = df.count()
    counts = {
        r["bin"]: r["c"]
        for r in df.select(_bin_expr(metric, edges))
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    }
    shares = [counts.get(b, 0) / n for b in range(n_bins)]
    return edges, shares


def windowed_psi(
    df: DataFrame,
    time_col: str,
    window_duration: str,
    metric: str,
    group_cols: list[str],
    edges: list[float],
    ref_shares: list[float],
    min_psi: float = 0.2,
    watermark: str | None = None,
) -> DataFrame:
    """PSI per (event-time window, group) against a fixed reference.

    Works on batch and streaming DataFrames alike; pass `watermark` for a
    stream (append mode emits each window once it finalizes). Output:
    (ws, we, group_cols…, n, psi, drifted)."""
    n_bins = len(ref_shares)
    if len(edges) != n_bins - 1:
        raise ValueError(f"need {n_bins - 1} edges for {n_bins} reference bins")
    if watermark is not None:
        df = df.withWatermark(time_col, watermark)
    binned = df.select(
        F.window(time_col, window_duration).alias("w"),
        *group_cols,
        _bin_expr(metric, edges),
    )
    bin_counts = [
        F.sum((F.col("bin") == b).cast("long")).alias(f"c{b}") for b in range(n_bins)
    ]
    agg = binned.groupBy("w", *group_cols).agg(*bin_counts)
    n = sum(F.col(f"c{b}") for b in range(n_bins))
    psi = sum(
        (
            F.greatest(F.col(f"c{b}") / n, F.lit(EPS))
            - F.lit(max(ref_shares[b], EPS))
        )
        * F.log(
            F.greatest(F.col(f"c{b}") / n, F.lit(EPS)) / F.lit(max(ref_shares[b], EPS))
        )
        for b in range(n_bins)
    )
    return agg.select(
        F.col("w.start").alias("ws"),
        F.col("w.end").alias("we"),
        *group_cols,
        n.cast("long").alias("n"),
        F.round(psi, 6).alias("psi"),
    ).withColumn("drifted", F.col("psi") >= F.lit(min_psi))


def windowed_ks(
    df: DataFrame,
    time_col: str,
    window_duration: str,
    metric: str,
    group_cols: list[str],
    edges: list[float],
    ref_shares: list[float],
    min_d: float = 0.1,
    watermark: str | None = None,
) -> DataFrame:
    """Quantile-grid two-sample KS per (event-time window, group) against a
    fixed reference distribution — the streaming face of
    operators/drift.ks_drift, same single-stateful-aggregation shape as
    windowed_psi: D = max_b |cumshare_obs(b) − cumshare_ref(b)| where both
    CDFs are evaluated at the reference bin edges; the observed cumulative
    shares are running sums of the same per-bin conditional counters, so
    the extra work over PSI is pure codegen arithmetic on the aggregate.

    Works on batch and streaming DataFrames alike; pass `watermark` for a
    stream (append mode). Output: (ws, we, group_cols…, n, ks_d, drifted)."""
    n_bins = len(ref_shares)
    if len(edges) != n_bins - 1:
        raise ValueError(f"need {n_bins - 1} edges for {n_bins} reference bins")
    if watermark is not None:
        df = df.withWatermark(time_col, watermark)
    binned = df.select(
        F.window(time_col, window_duration).alias("w"),
        *group_cols,
        _bin_expr(metric, edges),
    )
    bin_counts = [
        F.sum((F.col("bin") == b).cast("long")).alias(f"c{b}") for b in range(n_bins)
    ]
    agg = binned.groupBy("w", *group_cols).agg(*bin_counts)
    n = sum(F.col(f"c{b}") for b in range(n_bins))
    ref_cum = 0.0
    diffs = []
    obs_cum = None
    for b in range(n_bins - 1):  # last cut: both CDFs are 1, diff is 0
        ref_cum += ref_shares[b]
        obs_cum = F.col(f"c{b}") if obs_cum is None else obs_cum + F.col(f"c{b}")
        diffs.append(F.abs(obs_cum / n - F.lit(ref_cum)))
    ks = F.greatest(*diffs) if len(diffs) > 1 else diffs[0]
    return agg.select(
        F.col("w.start").alias("ws"),
        F.col("w.end").alias("we"),
        *group_cols,
        n.cast("long").alias("n"),
        F.round(ks, 6).alias("ks_d"),
    ).withColumn("drifted", F.col("ks_d") >= F.lit(min_d))


def windowed_categorical(
    df: DataFrame,
    time_col: str,
    window_duration: str,
    column: str,
    group_cols: list[str],
    shares: list[tuple[str, float]],
    min_psi: float = 0.2,
    watermark: str | None = None,
) -> DataFrame:
    """Categorical-histogram drift per (event-time window, group) against a
    reference category-share fit (operators/drift.categorical_shares) — the
    streaming face of categorical_drift, same single-stateful-aggregation
    shape as windowed_psi: per-category conditional counters inside ONE
    groupBy(window, group) (categories outside the fit and NULLs pool into
    '__other__'), PSI + chi-square as stateless arithmetic on the
    aggregate. Append mode with a plain watermark; state =
    |windows|×|groups| rows of |categories| counters.

    Works on batch and streaming DataFrames alike. Output:
    (ws, we, group_cols…, n, psi, chi2, drifted)."""
    from macrobase_spark.operators.drift import EPS as _EPS

    if watermark is not None:
        df = df.withWatermark(time_col, watermark)
    known = [c for c, _ in shares if c != "__other__"]
    cat = F.col(column).cast("string")
    bucket = F.when(cat.isin(known), cat).otherwise(F.lit("__other__"))
    binned = df.select(
        F.window(time_col, window_duration).alias("w"),
        *group_cols,
        bucket.alias("cat"),
    )
    counters = [
        F.sum((F.col("cat") == F.lit(c)).cast("long")).alias(f"c{i}")
        for i, (c, _) in enumerate(shares)
    ]
    agg = binned.groupBy("w", *group_cols).agg(*counters)
    n = sum(F.col(f"c{i}") for i in range(len(shares)))
    psi = sum(
        (F.greatest(F.col(f"c{i}") / n, F.lit(_EPS)) - F.lit(max(s, _EPS)))
        * F.log(F.greatest(F.col(f"c{i}") / n, F.lit(_EPS)) / F.lit(max(s, _EPS)))
        for i, (_, s) in enumerate(shares)
    )
    chi2 = sum(
        (F.col(f"c{i}") / n - F.lit(s)) ** 2 / F.lit(max(s, _EPS))
        for i, (_, s) in enumerate(shares)
    ) * n
    return agg.select(
        F.col("w.start").alias("ws"),
        F.col("w.end").alias("we"),
        *group_cols,
        n.cast("long").alias("n"),
        F.round(psi, 6).alias("psi"),
        F.round(chi2, 6).alias("chi2"),
    ).withColumn("drifted", F.col("psi") >= F.lit(min_psi))

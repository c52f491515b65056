"""PSI (population stability index) histogram drift — the distribution-level
complement to the suite's MAD-over-group-medians drift check (checks.py).

For a metric column and a grouping (e.g. dur_ms by codec): bin the metric on
the GLOBAL quantile edges, compare each group's bin-share vector a_i to the
global share vector e_i, and score PSI = Σ (a_i − e_i)·ln(a_i / e_i).
PSI ≥ 0.2 is the conventional "significant shift" bar; the planted aac
duration drift (sources/clips.py: dur_ms × 3) scores far above it while the
clean codecs sit near 0.

Scale design: two partial-agg shuffles, both tiny after the map side —
(1) one pass for the global edges (exact `percentile` here so the DuckDB
oracle matches bit-for-bit; swap `approx_percentile` at 10^12 rows — the
t-digest sketch path the column-stats check already uses), (2) one
groupBy(group, bin) count whose output is |groups|×|bins| rows. The bin
assignment is a chain of codegen'd comparisons against broadcast scalar
edges — no UDF, no shuffle. Densification (groups × bins grid) happens on
the already-tiny aggregate.

Reference parity: the reference engine's drift analogue is the classify →
summarize pipeline over batch metrics; PSI serves the build brief's
"distribution-drift detection on dur_ms/sr_hz/codec histograms" contract.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from macrobase_spark.queries import register

EPS = 1e-6


def quantile_edges(df: DataFrame, metric: str, n_bins: int = 10) -> list[float]:
    """Global interior quantile edges (n_bins−1 cut points). Exact
    percentile (R-7, matches DuckDB quantile_cont); use approx_percentile
    for cluster-scale inputs."""
    ps = [k / n_bins for k in range(1, n_bins)]
    row = df.agg(F.percentile(metric, ps).alias("qs")).collect()[0]
    return [float(x) for x in row["qs"]]


def _bin_expr(metric: str, edges: list[float]):
    return reduce(
        lambda acc, e: acc + (F.col(metric) > F.lit(e)).cast("int"),
        edges,
        F.lit(0),
    ).alias("bin")


def psi_drift(
    df: DataFrame,
    metric: str,
    group_cols: list[str],
    n_bins: int = 10,
    min_psi: float = 0.2,
    edges: list[float] | None = None,
) -> DataFrame:
    """Per-group PSI of `metric` against the global distribution.

    Returns (group_cols…, n, psi, drifted) — one row per group, psi rounded
    to 6 dp, drifted = psi ≥ min_psi."""
    if edges is None:
        edges = quantile_edges(df, metric, n_bins)
    binned = df.select(*group_cols, _bin_expr(metric, edges))
    counts = binned.groupBy(*group_cols, "bin").agg(F.count(F.lit(1)).alias("c"))
    # global bin shares (e_i) — |bins| rows, broadcast into the join
    gtot = binned.count()
    gshare = (
        binned.groupBy("bin")
        .agg((F.count(F.lit(1)) / F.lit(float(gtot))).alias("e"))
    )
    # densify: every group × every bin (both sides are tiny aggregates)
    groups = counts.groupBy(*group_cols).agg(F.sum("c").alias("n"))
    grid = groups.crossJoin(F.broadcast(gshare.select("bin")))
    dense = (
        grid.join(counts, [*group_cols, "bin"], "left")
        .na.fill({"c": 0})
        .join(F.broadcast(gshare), "bin")
    )
    a = F.greatest(F.col("c") / F.col("n"), F.lit(EPS))
    e = F.greatest(F.col("e"), F.lit(EPS))
    return (
        dense.groupBy(*group_cols, "n")
        .agg(F.round(F.sum((a - e) * F.log(a / e)), 6).alias("psi"))
        .select(
            *group_cols,
            F.col("n").cast("long").alias("n"),
            "psi",
            (F.col("psi") >= F.lit(min_psi)).alias("drifted"),
        )
    )


_S = "read_parquet('/tmp/mb_scored_v2_10000.parquet/*.parquet')"


@register(
    "psi_drift_clips",
    f"""
    WITH e AS (
      SELECT unnest(quantile_cont(dur_ms, [
        0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9
      ])) AS edge FROM {_S}
    ),
    binned AS (
      SELECT codec,
             (SELECT CAST(count(*) FILTER (s.dur_ms > e.edge) AS INT) FROM e) AS bin
      FROM {_S} s
    ),
    gshare AS (
      SELECT bin, count(*) / (SELECT CAST(count(*) AS DOUBLE) FROM binned) AS e
      FROM binned GROUP BY bin
    ),
    groups AS (SELECT codec, CAST(count(*) AS BIGINT) AS n FROM binned GROUP BY codec),
    counts AS (SELECT codec, bin, count(*) AS c FROM binned GROUP BY codec, bin),
    dense AS (
      SELECT g.codec, g.n, gs.bin, coalesce(c.c, 0) AS c, gs.e
      FROM groups g CROSS JOIN gshare gs
      LEFT JOIN counts c ON c.codec = g.codec AND c.bin = gs.bin
    )
    SELECT codec, n,
           round(sum((greatest(c / CAST(n AS DOUBLE), 1e-6) - greatest(e, 1e-6))
                     * ln(greatest(c / CAST(n AS DOUBLE), 1e-6) / greatest(e, 1e-6))), 6)
             AS psi,
           round(sum((greatest(c / CAST(n AS DOUBLE), 1e-6) - greatest(e, 1e-6))
                     * ln(greatest(c / CAST(n AS DOUBLE), 1e-6) / greatest(e, 1e-6))), 6)
             >= 0.2 AS drifted
    FROM dense GROUP BY codec, n
    """,
)
def psi_drift_clips_q(spark, sf_dir):
    """PSI of dur_ms by codec over the scored clips relation — recovers the
    planted aac duration drift (×3) as the only flagged group."""
    from macrobase_spark.operators.clips_suite import scored_parquet

    scored = spark.read.parquet(scored_parquet(spark, sf_dir))
    return psi_drift(scored, "dur_ms", ["codec"], n_bins=10, min_psi=0.2)

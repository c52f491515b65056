"""HBOS — histogram-based outlier score (Goldstein & Dengel, KI 2012),
dynamic-binwidth variant.

The second fully-declarative member of the engine's modern detector
family (next to ECOD, operators/ecod.py): per dimension, a decile
histogram with DYNAMIC bin widths (quantile edges, so every bin holds
~n/10 points and width encodes sparseness); a bin's density is
mass/width, normalized per dimension so the densest bin scores 0, and

    HBOS(x) = Σ_j  ln( dmax_j ) - ln( density_j(bin_j(x)) ).

Equal-mass bins make the raw mass useless (every bin holds 0.1) — the
WIDTH carries the outlier signal: a far point lives in a bin stretched
to the dimension's min/max, whose density collapses. This is the
paper's dynamic-width mode, the one recommended for skewed data.

Everything is SQL in both engines: per-dim (min, max, deciles) from one
exact-percentile aggregate (R-7, matches DuckDB quantile_cont), bin
bounds as an 11-point grid exploded to a 64×10 relation, bin assignment
as a count of interior edges below the value, masses/densities as tiny
aggregates. No UDF, no model, no driver-side fit.

Plan: posexplode → per-dim (min, max, deciles) aggregate (one tiny dim
Exchange) → bin assignment as an `aggregate()` fold over the BROADCAST
per-dim edge array (map-only: no row blow-up and no (vec, dim)
Exchange) → 640-row density relation broadcast back → one vec_id
Exchange → TakeOrdered 20. At 10^12 rows swap the exact percentile for
approx_percentile (same plan shape); histogram size scales with
dims×bins, never rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from macrobase_spark.queries import register

_N_BINS = 10
_EPS_W = 1e-12


def hbos_scores(
    df: DataFrame,
    array_col: str = "embedding",
    id_cols: list[str] | None = None,
    n_bins: int = _N_BINS,
) -> DataFrame:
    """Append `_SCORE` (dynamic-binwidth HBOS) per row."""
    id_cols = id_cols or ["vec_id"]
    x = df.select(*id_cols, F.posexplode(array_col).alias("dim", "v")).withColumn(
        "v", F.col("v").cast("double")
    )
    ps = [k / n_bins for k in range(1, n_bins)]
    agg = x.groupBy("dim").agg(
        F.min("v").alias("mn"), F.max("v").alias("mx"), F.percentile("v", ps).alias("qs")
    )
    bounds = agg.select(
        "dim", F.concat(F.array("mn"), F.col("qs"), F.array("mx")).alias("bd")
    )
    widths = bounds.select(
        "dim",
        F.posexplode(
            F.expr("transform(slice(bd, 1, size(bd) - 1), (lo, i) -> element_at(bd, i + 2) - lo)")
        ).alias("bin", "width"),
    )
    # Bin index = #interior edges below v, folded over the per-dim edge
    # ARRAY in one codegen expression (no 9× row blow-up, no (vec, dim)
    # Exchange — the old explode-edges+join+re-aggregate shape ran a 10×
    # wider scan and, being consumed twice below, executed it twice).
    binned = x.join(F.broadcast(agg.select("dim", "qs")), "dim").select(
        *id_cols,
        "dim",
        F.aggregate(
            "qs", F.lit(0), lambda a, e: a + (F.col("v") > e).cast("int")
        ).alias("bin"),
    )
    n = df.count()
    dens = (
        binned.groupBy("dim", "bin")
        .agg(F.count(F.lit(1)).alias("c"))
        .join(F.broadcast(widths), ["dim", "bin"])
        .select(
            "dim",
            "bin",
            (
                F.col("c") / F.lit(float(n)) / F.greatest(F.col("width"), F.lit(_EPS_W))
            ).alias("density"),
        )
    )
    dmax = dens.groupBy("dim").agg(F.max("density").alias("dmax"))
    return (
        binned.join(F.broadcast(dens), ["dim", "bin"])
        .join(F.broadcast(dmax), "dim")
        .groupBy(*id_cols)
        .agg(F.sum(F.log("dmax") - F.log("density")).alias("_SCORE"))
    )


_HBOS_ORACLE = """
WITH x AS (
  SELECT vec_id,
         generate_subscripts(embedding, 1) AS dim,
         CAST(unnest(embedding) AS DOUBLE) AS v
  FROM read_parquet('/root/testdata/sf0.01/embeddings.parquet')
), agg AS (
  SELECT dim, min(v) AS mn, max(v) AS mx,
         quantile_cont(v, [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]) AS qs
  FROM x GROUP BY dim
), bounds AS (
  SELECT dim, list_prepend(mn, list_append(qs, mx)) AS bd FROM agg
), widths AS (
  SELECT dim, t.b - 1 AS bin, bd[t.b + 1] - bd[t.b] AS width
  FROM bounds CROSS JOIN range(1, 11) t(b)
), e AS (
  SELECT dim, unnest(qs) AS edge FROM agg
), binned AS (
  SELECT x.vec_id, x.dim, sum(CASE WHEN x.v > e.edge THEN 1 ELSE 0 END) AS bin
  FROM x JOIN e ON x.dim = e.dim
  GROUP BY x.vec_id, x.dim
), n AS (
  SELECT CAST(count(*) AS DOUBLE) AS n
  FROM read_parquet('/root/testdata/sf0.01/embeddings.parquet')
), dens AS (
  SELECT b.dim, b.bin,
         count(*) / (SELECT n FROM n) / greatest(w.width, 1e-12) AS density
  FROM binned b JOIN widths w ON b.dim = w.dim AND b.bin = w.bin
  GROUP BY b.dim, b.bin, w.width
), dmax AS (
  SELECT dim, max(density) AS dmax FROM dens GROUP BY dim
), s AS (
  SELECT b.vec_id, sum(ln(m.dmax) - ln(d.density)) AS score
  FROM binned b
  JOIN dens d ON b.dim = d.dim AND b.bin = d.bin
  JOIN dmax m ON b.dim = m.dim
  GROUP BY b.vec_id
)
SELECT vec_id, round(score, 4) AS score
FROM s ORDER BY round(score, 4) DESC, vec_id LIMIT 20
"""


@register("hbos_outliers_embeddings", _HBOS_ORACLE)
def hbos_outliers_embeddings(spark, sf_dir: str) -> DataFrame:
    """20 highest-HBOS vectors over all 64 embedding dimensions — decile
    grids, dynamic widths, densities and the score sum all replay
    verbatim in the DuckDB oracle."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    scored = hbos_scores(emb, "embedding", ["vec_id"])
    return (
        scored.withColumn("score", F.round("_SCORE", 4))
        .orderBy(F.desc("score"), "vec_id")
        .limit(20)
        .select("vec_id", "score")
    )

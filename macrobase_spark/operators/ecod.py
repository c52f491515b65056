"""ECOD — unsupervised outlier detection via empirical cumulative
distribution functions (Li, Zhao, Botta, Ionescu & Hu, TKDE 2022;
the pyOD-default parameter-free detector).

Extends the reference's alexp detector family (iforest, LOF, MCOD, HST,
RRCF, MCD, LOCI, MAD — `alexp/src/main/java/alexp/macrobase/outlier/`)
with a modern member the fork postdates. Unlike those, ECOD needs **no
model, no UDF and no driver-side fit at all**: for every dimension j the
left-tail ECDF p_l = #{X_j <= x}/n is exactly SQL `cume_dist()` over a
window partitioned by dimension (and p_r = #{X_j >= x}/n is the same
window sorted descending); the per-point score aggregates
-log tail probabilities across dimensions, taking the skewness-directed
tail per dimension and the max of the left/right/auto aggregations, per
the paper. The whole detector is therefore ONE declarative plan —
posexplode -> one hash Exchange on `dim` (both cume_dist windows sort
inside the same partitioning) -> two broadcast joins of 64-row per-dim
aggregates -> one groupBy(vec_id) Exchange -> TakeOrdered 20. Catalyst
codegen end to end; the DuckDB oracle replays the identical SQL.

Skewness direction uses the explicit third-central-moment sign
(sum((v-mu)^3) < 0) in BOTH engines rather than each engine's
`skewness()` builtin, whose bias corrections differ (the sign — all the
paper uses — is what matters and is computed identically here).

Scale: the exact ECDF needs a per-dimension sort, which parallelizes
d ways (one partition per dimension; at 10^12 rows each dimension's
series must range-partition: swap the window for a two-phase
rank — per-range counts then a running offset — or an
approx-quantile-interpolated ECDF; the score/aggregate stages are
unchanged). No payload wider than (vec_id, dim, double) ever shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from macrobase_spark.queries import register


def _left_skewed(x: DataFrame) -> DataFrame:
    """(dim, left_skewed) — third-central-moment sign from raw moments in
    ONE aggregate pass (sum((v-mu)^3) = S3 - 3*mu*S2 + 2*n*mu^3, identical
    in the oracle): only the sign is consumed, so raw-moment cancellation
    is harmless. Shared by the exact and approx scorers."""
    return (
        x.groupBy("dim")
        .agg(
            F.sum("v").alias("s1"),
            F.sum(F.pow("v", 2)).alias("s2"),
            F.sum(F.pow("v", 3)).alias("s3"),
            F.count(F.lit(1)).alias("n"),
        )
        .select(
            "dim",
            (
                F.col("s3")
                - 3.0 * (F.col("s1") / F.col("n")) * F.col("s2")
                + 2.0 * F.col("n") * F.pow(F.col("s1") / F.col("n"), 3)
                < 0
            ).alias("left_skewed"),
        )
    )


def ecod_scores(df: DataFrame, array_col: str = "embedding", id_cols: list[str] | None = None) -> DataFrame:
    """Append `_SCORE` (ECOD outlier score) per row of an array-column
    DataFrame. Higher = more outlying. Pure window/aggregate plan."""
    id_cols = id_cols or ["vec_id"]
    x = df.select(
        *id_cols, F.posexplode(array_col).alias("dim", "v")
    ).withColumn("v", F.col("v").cast("double"))
    w_asc = Window.partitionBy("dim").orderBy("v")
    w_desc = Window.partitionBy("dim").orderBy(F.col("v").desc())
    t = x.select(
        *id_cols,
        "dim",
        "v",
        F.cume_dist().over(w_asc).alias("p_l"),
        F.cume_dist().over(w_desc).alias("p_r"),
    )
    sk = _left_skewed(x)
    per_dim = t.join(F.broadcast(sk), "dim").select(
        *id_cols,
        (-F.log("p_l")).alias("ol"),
        (-F.log("p_r")).alias("orr"),
        F.when(F.col("left_skewed"), -F.log("p_l"))
        .otherwise(-F.log("p_r"))
        .alias("oa"),
    )
    return per_dim.groupBy(*id_cols).agg(
        F.greatest(F.sum("ol"), F.sum("orr"), F.sum("oa")).alias("_SCORE")
    )


_ECOD_ORACLE = """
WITH x AS (
  SELECT vec_id,
         generate_subscripts(embedding, 1) AS dim,
         CAST(unnest(embedding) AS DOUBLE) AS v
  FROM read_parquet('/root/testdata/sf0.01/embeddings.parquet')
), t AS (
  SELECT vec_id, dim,
         cume_dist() OVER (PARTITION BY dim ORDER BY v) AS p_l,
         cume_dist() OVER (PARTITION BY dim ORDER BY v DESC) AS p_r
  FROM x
), sk AS (
  SELECT dim,
         sum(pow(v, 3)) - 3 * (sum(v) / count(*)) * sum(pow(v, 2))
           + 2 * count(*) * pow(sum(v) / count(*), 3) < 0 AS left_skewed
  FROM x
  GROUP BY dim
), s AS (
  SELECT vec_id,
         sum(-ln(p_l)) AS ol,
         sum(-ln(p_r)) AS orr,
         sum(CASE WHEN left_skewed THEN -ln(p_l) ELSE -ln(p_r) END) AS oa
  FROM t JOIN sk USING (dim)
  GROUP BY vec_id
)
SELECT vec_id, round(greatest(ol, orr, oa), 4) AS score
FROM s
ORDER BY round(greatest(ol, orr, oa), 4) DESC, vec_id
LIMIT 20
"""


@register("ecod_outliers_embeddings", _ECOD_ORACLE)
def ecod_outliers_embeddings(spark, sf_dir: str) -> DataFrame:
    """20 most-outlying vectors by ECOD score over all 64 embedding
    dimensions — the entire detector (ECDF windows, skew direction,
    tail aggregation) replays verbatim in the DuckDB oracle."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    scored = ecod_scores(emb, "embedding", ["vec_id"])
    return (
        scored.withColumn("score", F.round("_SCORE", 4))
        .orderBy(F.desc("score"), "vec_id")
        .limit(20)
        .select("vec_id", "score")
    )


def ecod_scores_approx(
    df: DataFrame,
    array_col: str = "embedding",
    id_cols: list[str] | None = None,
    n_bins: int = 64,
) -> DataFrame:
    """The 10^12-row ECOD path: tail probabilities from a per-dimension
    quantile GRID instead of exact per-value ranks, removing the per-dim
    sort entirely. p_l(v) ~ (#grid edges below v + 0.5)/n_bins (midpoint
    rule; p_r symmetric), so the plan is: one percentile aggregate per
    dim (swap F.percentile for approx_percentile on clusters — identical
    shape), a broadcast join of the 64xn_bins edge relation, one
    (vec, dim) count aggregate, and the same tail aggregation as the
    exact path. Accuracy grows with n_bins; ranking fidelity vs the
    exact scorer is pinned in tests/test_ecod.py."""
    id_cols = id_cols or ["vec_id"]
    x = df.select(*id_cols, F.posexplode(array_col).alias("dim", "v")).withColumn(
        "v", F.col("v").cast("double")
    )
    ps = [k / n_bins for k in range(1, n_bins)]
    grid = x.groupBy("dim").agg(F.percentile("v", ps).alias("edges"))
    sk = _left_skewed(x)
    # Grid index = #edges below v, folded over the broadcast per-dim edge
    # ARRAY in one codegen expression — map-only, no (n_bins-1)× row
    # blow-up and no (vec, dim) Exchange (the former explode+join+
    # re-aggregate shape scanned n_bins-1 rows per value).
    binned = x.join(F.broadcast(grid), "dim").select(
        *id_cols,
        "dim",
        F.aggregate(
            "edges", F.lit(0), lambda a, e: a + (F.col("v") > e).cast("int")
        ).alias("idx"),
    )
    p_l = (F.col("idx") + 0.5) / F.lit(float(n_bins))
    p_r = (F.lit(float(n_bins)) - F.col("idx") - 0.5) / F.lit(float(n_bins))
    per_dim = binned.join(F.broadcast(sk), "dim").select(
        *id_cols,
        (-F.log(p_l)).alias("ol"),
        (-F.log(p_r)).alias("orr"),
        F.when(F.col("left_skewed"), -F.log(p_l)).otherwise(-F.log(p_r)).alias("oa"),
    )
    return per_dim.groupBy(*id_cols).agg(
        F.greatest(F.sum("ol"), F.sum("orr"), F.sum("oa")).alias("_SCORE")
    )

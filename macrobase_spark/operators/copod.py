"""COPOD — copula-based outlier detection (Li, Zhao, Botta, Ionescu &
Hu, ICDM 2020; the elder sibling of ECOD from the same authors).

Extends the reference's alexp detector family (iforest, LOF, MCOD, HST,
RRCF, MCD, LOCI, MAD — `alexp/src/main/java/alexp/macrobase/outlier/`)
with a second parameter-free ECDF detector the fork postdates. COPOD
shares ECOD's building blocks (left/right empirical tail probabilities
per dimension + a skewness-directed tail) but composes them
differently: the max is taken PER DIMENSION —

    O_j(x) = max( U_skew_j(x), (U_l_j(x) + U_r_j(x)) / 2 )

with U_l = -log p_l, U_r = -log p_r, U_skew the tail selected by the
sign of the per-dimension sample skewness — and the score is
sum_j O_j(x). ECOD instead takes the max over the three DIMENSION SUMS;
the two detectors rank differently whenever a point is extreme in
opposite tails of different dimensions.

Plan shape is identical to `ecod.py` (it reuses `_left_skewed`):
posexplode -> ONE hash Exchange on `dim` (both cume_dist windows sort
inside the same partitioning) -> broadcast join of the 64-row skew-sign
relation -> codegen per-dim max -> one groupBy(vec_id) Exchange ->
TakeOrdered 20. No UDF, no fit, no driver round-trip; the DuckDB oracle
replays the identical SQL. Scale notes from `ecod.py` apply verbatim:
the per-dimension exact ECDF sort parallelizes d ways, and at 10^12
rows the same quantile-grid approximation (`ecod_scores_approx` shape)
substitutes for the window rank with the scoring stages unchanged.

Skewness direction uses the explicit third-central-moment sign in BOTH
engines (see `ecod._left_skewed` — engine `skewness()` builtins differ
in bias correction; only the sign is consumed). pyOD's sign-arithmetic
(`U_skew = U_l * -sign(s-1) + U_r * sign(s+1)`) reduces to "left tail
iff skewness < 0" for continuous data where the third moment is never
exactly zero, which is what both engines compute here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from macrobase_spark.operators.ecod import _left_skewed
from macrobase_spark.queries import register


def copod_scores(
    df: DataFrame, array_col: str = "embedding", id_cols: list[str] | None = None
) -> DataFrame:
    """Append `_SCORE` (COPOD outlier score) per row of an array-column
    DataFrame. Higher = more outlying. Pure window/aggregate plan."""
    id_cols = id_cols or ["vec_id"]
    x = df.select(*id_cols, F.posexplode(array_col).alias("dim", "v")).withColumn(
        "v", F.col("v").cast("double")
    )
    w_asc = Window.partitionBy("dim").orderBy("v")
    w_desc = Window.partitionBy("dim").orderBy(F.col("v").desc())
    t = x.select(
        *id_cols,
        "dim",
        F.cume_dist().over(w_asc).alias("p_l"),
        F.cume_dist().over(w_desc).alias("p_r"),
    )
    sk = _left_skewed(x)
    u_l = -F.log("p_l")
    u_r = -F.log("p_r")
    per_dim = t.join(F.broadcast(sk), "dim").select(
        *id_cols,
        F.greatest(
            F.when(F.col("left_skewed"), u_l).otherwise(u_r),
            (u_l + u_r) / 2.0,
        ).alias("o"),
    )
    return per_dim.groupBy(*id_cols).agg(F.sum("o").alias("_SCORE"))


_COPOD_ORACLE = """
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
         sum(greatest(
           CASE WHEN left_skewed THEN -ln(p_l) ELSE -ln(p_r) END,
           (-ln(p_l) + -ln(p_r)) / 2
         )) AS o
  FROM t JOIN sk USING (dim)
  GROUP BY vec_id
)
SELECT vec_id, round(o, 4) AS score
FROM s
ORDER BY round(o, 4) DESC, vec_id
LIMIT 20
"""


@register("copod_outliers_embeddings", _COPOD_ORACLE)
def copod_outliers_embeddings(spark, sf_dir: str) -> DataFrame:
    """20 most-outlying vectors by COPOD score over all 64 embedding
    dimensions — the entire detector (ECDF windows, skew direction,
    per-dim tail max) replays verbatim in the DuckDB oracle."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    scored = copod_scores(emb, "embedding", ["vec_id"])
    return (
        scored.withColumn("score", F.round("_SCORE", 4))
        .orderBy(F.desc("score"), "vec_id")
        .limit(20)
        .select("vec_id", "score")
    )

"""MacroBase-style risk-ratio attribute explanation (the DIFF operator),
re-expressed as driver-orchestrated Spark aggregation rounds.

What it computes (reference semantics):
- bounded APriori over attribute-value itemsets of order 1..3
  (reference lib/.../aplinear/APrioriLinear.java:47-339)
- support measured over outliers: an itemset survives a round iff its
  outlier count >= min_support * total_outliers
  (reference lib/.../summary/util/AttributeEncoder.java:83-88)
- emitted iff it additionally passes the ratio metric
  (KEEP/NEXT/PRUNE lattice, reference qualitymetrics/QualityMetric.java:13-58)
- order-3 candidates require all three order-2 subsets to have survived
  (reference APrioriLinear.java:347-367)
- output is the null-padded violation-row relation of
  APLExplanation.toDataFrame (reference aplinear/APLExplanation.java:84-142):
  one column per attribute (null where not part of the itemset), plus
  support, <ratio_metric>, outlier_count, total_count.

How it runs (Spark-first, 100 TB-ready):
- round k = ONE shuffle: explode each row's k-combinations of its *frequent*
  singleton values, hash-aggregate sum(outlier), sum(count). Spark's
  partial (map-side) aggregation absorbs key skew; candidate sets between
  rounds are tiny driver lists (bounded by d^k / min_support) broadcast as
  literals — never row data.
- the input projection (outlier, count, frequent-item array) is cached
  across the <=3 rounds and unpersisted at the end.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from macrobase_spark.functions.metrics import ratio_metric_expr, support_expr
from macrobase_spark.operators.classify import OUTLIER_COL

_ITEMS = "_mb_items"


@dataclass
class ExplainParams:
    attributes: list[str]
    outlier_col: str = OUTLIER_COL
    count_col: str | None = None  # None → every row weighs 1.0
    min_support: float = 0.2
    min_ratio_metric: float = 1.5
    ratio_metric: str = "global_ratio"
    max_order: int = 3
    extra_ratio_metrics: list[str] = field(default_factory=list)


def _combos_expr(arr: str, k: int) -> Column:
    """k-combinations (k in 1..3) of an array column, as a pure SQL lambda
    expression — order-preserving, no UDF."""
    if k == 1:
        return F.expr(f"transform({arr}, x -> array(x))")
    if k == 2:
        return F.expr(
            f"flatten(transform({arr}, (x, i) -> "
            f"transform(slice({arr}, i + 2, size({arr})), y -> array(x, y))))"
        )
    if k == 3:
        return F.expr(
            f"flatten(flatten(transform({arr}, (x, i) -> "
            f"transform(slice({arr}, i + 2, size({arr})), (y, j) -> "
            f"transform(slice({arr}, i + j + 3, size({arr})), z -> array(x, y, z))))))"
        )
    raise ValueError(f"order {k} not supported (max_order <= 3, as in the reference)")


def _pair_key(a: Column, b: Column) -> Column:
    return F.concat_ws("", a["ai"], a["val"], b["ai"], b["val"])


def explain(df: DataFrame, params: ExplainParams) -> DataFrame:
    """Run classify-then-explain's explanation phase; returns violation rows."""
    p = params
    attrs = list(p.attributes)
    if not attrs:
        raise ValueError("explain needs at least one attribute column")
    out = F.col(p.outlier_col).cast("double")
    cnt = (
        F.coalesce(F.col(p.count_col).cast("double"), F.lit(1.0))
        if p.count_col
        else F.lit(1.0)
    )

    spark = df.sparkSession
    g = df.agg(F.sum(out).alias("o"), F.sum(cnt).alias("n")).collect()[0]
    total_outliers, total_rows = float(g["o"] or 0.0), float(g["n"] or 0.0)
    if total_outliers == 0.0 or total_rows == 0.0:
        return _empty_result(spark, p)
    support_thresh = p.min_support * total_outliers

    base = df.select(out.alias("_o"), cnt.alias("_c"), *attrs)

    # ---- round 1: frequent singleton (attribute, value) pairs -------------
    item_structs = F.array(
        *[
            F.struct(F.lit(i).alias("ai"), F.col(a).cast("string").alias("val"))
            for i, a in enumerate(attrs)
        ]
    )
    singles = (
        base.select("_o", "_c", F.explode(item_structs).alias("it"))
        .filter(F.col("it.val").isNotNull())
        .groupBy("it")
        .agg(F.sum("_o").alias("outlier_count"), F.sum("_c").alias("total_count"))
    )
    surv1 = singles.filter(F.col("outlier_count") >= support_thresh)
    # survivors are aggregates, bounded by d / min_support — safe to collect
    surv1_rows = surv1.collect()
    results = [_emit(spark, surv1, 1, p, total_outliers, total_rows, attrs)]

    if p.max_order >= 2 and surv1_rows:
        freq_by_attr: dict[int, list[str]] = {}
        for r in surv1_rows:
            freq_by_attr.setdefault(r["it"]["ai"], []).append(r["it"]["val"])

        # per-row array of this row's frequent singletons, ai-ascending
        fitem_cols = []
        for i, a in enumerate(attrs):
            vals = freq_by_attr.get(i)
            if not vals:
                continue
            c = F.col(a).cast("string")
            fitem_cols.append(
                F.when(
                    c.isin(vals), F.struct(F.lit(i).alias("ai"), c.alias("val"))
                ).otherwise(F.lit(None))
            )
        annotated = (
            base.select(
                "_o",
                "_c",
                F.array_compact(F.array(*fitem_cols)).alias(_ITEMS),
            )
            .filter(F.size(_ITEMS) >= 2)
            .persist(StorageLevel.MEMORY_AND_DISK)
        )

        pairs = (
            annotated.select("_o", "_c", F.explode(_combos_expr(_ITEMS, 2)).alias("its"))
            .groupBy("its")
            .agg(F.sum("_o").alias("outlier_count"), F.sum("_c").alias("total_count"))
        )
        surv2 = pairs.filter(F.col("outlier_count") >= support_thresh)
        results.append(_emit(spark, surv2, 2, p, total_outliers, total_rows, attrs))

        if p.max_order >= 3:
            surv2_keys = [
                r["k"]
                for r in surv2.select(
                    _pair_key(F.col("its")[0], F.col("its")[1]).alias("k")
                ).collect()
            ]
            if surv2_keys:
                triples = annotated.filter(F.size(_ITEMS) >= 3).select(
                    "_o", "_c", F.explode(_combos_expr(_ITEMS, 3)).alias("its")
                )
                it = F.col("its")
                # order-3 candidate validation: every 2-subset survived round 2
                valid = (
                    _pair_key(it[0], it[1]).isin(surv2_keys)
                    & _pair_key(it[0], it[2]).isin(surv2_keys)
                    & _pair_key(it[1], it[2]).isin(surv2_keys)
                )
                agg3 = (
                    triples.filter(valid)
                    .groupBy("its")
                    .agg(
                        F.sum("_o").alias("outlier_count"),
                        F.sum("_c").alias("total_count"),
                    )
                    .filter(F.col("outlier_count") >= support_thresh)
                )
                results.append(_emit(spark, agg3, 3, p, total_outliers, total_rows, attrs))
        annotated.unpersist()

    result = results[0]
    for r in results[1:]:
        result = result.unionByName(r)
    return result


def _metric_cols(p: ExplainParams, total_outliers: float, total_rows: float) -> list[Column]:
    oc, tc = F.col("outlier_count"), F.col("total_count")
    cols = [support_expr(oc, total_outliers).alias("support")]
    for m in [p.ratio_metric, *p.extra_ratio_metrics]:
        cols.append(ratio_metric_expr(m, oc, tc, total_outliers, total_rows).alias(m))
    return cols


def _emit(
    spark,
    surv: DataFrame,
    order: int,
    p: ExplainParams,
    total_outliers: float,
    total_rows: float,
    attrs: list[str],
) -> DataFrame:
    """Project survivors of one round into the null-padded output relation,
    keeping only itemsets that pass the ratio threshold (KEEP action)."""
    arr = "its" if order > 1 else "array(it)"
    attr_cols = [
        F.expr(f"try_element_at(filter({arr}, x -> x.ai = {i}), 1).val").alias(a)
        for i, a in enumerate(attrs)
    ]
    out = surv.select(
        *attr_cols,
        *_metric_cols(p, total_outliers, total_rows),
        F.col("outlier_count").cast("double").alias("outlier_count"),
        F.col("total_count").cast("double").alias("total_count"),
    )
    return out.filter(F.col(p.ratio_metric) >= p.min_ratio_metric)


def _empty_result(spark, p: ExplainParams) -> DataFrame:
    from pyspark.sql.types import DoubleType, StringType, StructField, StructType

    fields = [StructField(a, StringType()) for a in p.attributes]
    fields += [StructField("support", DoubleType())]
    for m in [p.ratio_metric, *p.extra_ratio_metrics]:
        fields.append(StructField(m, DoubleType()))
    fields += [
        StructField("outlier_count", DoubleType()),
        StructField("total_count", DoubleType()),
    ]
    return spark.createDataFrame([], StructType(fields))


# ---------------------------------------------------------------------------
# DIFF / SPLIT query forms (reference sql/.../QueryEngine.executeDiffQuerySpec
# QueryEngine.java:121-200): classify-then-explain packaged as one call.
# ---------------------------------------------------------------------------


def diff(
    outliers: DataFrame,
    inliers: DataFrame,
    attributes: list[str],
    **kwargs,
) -> DataFrame:
    """DIFF (SELECT ...) outliers, (SELECT ...) inliers ON attrs."""
    tagged = outliers.withColumn(OUTLIER_COL, F.lit(1.0)).unionByName(
        inliers.withColumn(OUTLIER_COL, F.lit(1.0) * 0.0)
    )
    return explain(tagged, ExplainParams(attributes=attributes, **kwargs))


def diff_split(df: DataFrame, predicate: Column, attributes: list[str], **kwargs) -> DataFrame:
    """SPLIT form: one relation, a predicate marks the outliers."""
    tagged = df.withColumn(OUTLIER_COL, F.when(predicate, 1.0).otherwise(0.0))
    return explain(tagged, ExplainParams(attributes=attributes, **kwargs))

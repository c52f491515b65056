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
  partial (map-side) aggregation absorbs key skew.
- the ONLY data on the driver is per-round survivor aggregates — itemsets
  that hold >= min_support of all outliers, so their count is bounded by
  (#attrs choose k) / min_support regardless of input row count. Candidate
  sets flow back into round k+1 as broadcast literals; the final violation
  relation is assembled from those same aggregates, so each round's shuffle
  executes exactly once.
- the narrow (outlier, count, attrs) projection is cached across the
  <=3 rounds and unpersisted at the end.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, StringType, StructField, StructType
from pyspark.storagelevel import StorageLevel

from macrobase_spark.functions.metrics import ratio_metric_py
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
    # set False when the caller's input is already cached/checkpointed and
    # cheap to rescan (e.g. run_suite's scored relation)
    cache_base: bool = True
    # KEEP/NEXT/PRUNE containment pruning (reference QualityMetric.java:13-58,
    # APrioriLinear.java:279-322): an itemset that already passes the ratio
    # threshold is emitted and NOT expanded, so no redundant supersets appear
    # (golden corpus depends on this). False → emit the full support+ratio
    # filtered cube (SQL-oracle-expressible mode).
    prune_containment: bool = True


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


def _result_schema(p: ExplainParams) -> StructType:
    fields = [StructField(a, StringType()) for a in p.attributes]
    fields.append(StructField("support", DoubleType()))
    for m in [p.ratio_metric, *p.extra_ratio_metrics]:
        fields.append(StructField(m, DoubleType()))
    fields += [
        StructField("outlier_count", DoubleType()),
        StructField("total_count", DoubleType()),
    ]
    return StructType(fields)


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
    # narrow projection cached across the (global, round-1..3) scans — the
    # rounds re-read ~20 bytes/row instead of re-running the upstream plan
    base = df.select(out.alias("_o"), cnt.alias("_c"), *attrs)
    if p.cache_base:
        base = base.persist(StorageLevel.MEMORY_ONLY)
    try:
        return _explain_rounds(spark, base, attrs, p)
    finally:
        if p.cache_base:
            base.unpersist()


def _lattice_rounds(
    base: DataFrame,
    attrs: list[str],
    n_aggs: int,
    support_thresh: float,
    metric_fn,
    min_metric: float,
    max_order: int,
    prune: bool,
) -> list[tuple[tuple, tuple[float, ...]]]:
    """The shared APriori KEEP/NEXT/PRUNE engine over itemset orders 1..3.

    `base` must carry aggregate source columns _g0.._g{n-1} plus the
    attribute columns; _g0 is the outlier-count-like column the support
    threshold applies to. `metric_fn(aggs) -> float` is the (non-monotonic)
    quality metric; itemsets with _g0 >= support_thresh AND metric >=
    min_metric are emitted (KEEP); under `prune`, KEEP stops expansion and
    order-3 candidates require all 2-subsets to be NEXT pairs (reference
    APrioriLinear.java:279-322, validateCandidate:347-367).

    Returns [(items, aggs)] where items = ((attr_idx, value), ...).
    Only support-bounded aggregates ever reach the driver.
    """
    gcols = [f"_g{i}" for i in range(n_aggs)]
    sums = [F.sum(c).alias(c) for c in gcols]
    emitted: list[tuple[tuple, tuple[float, ...]]] = []

    item_structs = F.array(
        *[
            F.struct(F.lit(i).alias("ai"), F.col(a).cast("string").alias("val"))
            for i, a in enumerate(attrs)
        ]
    )

    if not prune:
        # no containment pruning ⇒ no inter-round dependency: every order's
        # itemsets aggregate in ONE shuffle (explode the 1..max_order combos
        # together). This is the full filtered cube — the oracle-expressible
        # mode — so candidate sets aren't support-pruned between rounds
        # anyway; the rounds would only add sequential job latency. With
        # high-cardinality attribute sets prefer prune=True (the reference
        # default), whose round-wise support pruning bounds the group count.
        nullable_items = F.array(
            *[
                F.when(
                    F.col(a).isNotNull(),
                    F.struct(F.lit(i).alias("ai"), F.col(a).cast("string").alias("val")),
                )
                for i, a in enumerate(attrs)
            ]
        )
        annotated = base.select(
            *gcols, F.array_compact(nullable_items).alias(_ITEMS)
        )
        combos = F.concat(
            *[_combos_expr(_ITEMS, k) for k in range(1, max_order + 1)]
        )
        rows = (
            annotated.select(*gcols, F.explode(combos).alias("its"))
            .groupBy("its")
            .agg(*sums)
            .filter(F.col("_g0") >= support_thresh)
            .collect()
        )
        for r in rows:
            items = tuple((it["ai"], it["val"]) for it in r["its"])
            aggs = tuple(float(r[c]) for c in gcols)
            if metric_fn(aggs) >= min_metric:
                emitted.append((items, aggs))
        return emitted
    surv1_rows = (
        base.select(*gcols, F.explode(item_structs).alias("it"))
        .filter(F.col("it.val").isNotNull())
        .groupBy("it")
        .agg(*sums)
        .filter(F.col("_g0") >= support_thresh)
        .collect()
    )
    next1: list = []
    for r in surv1_rows:
        items = ((r["it"]["ai"], r["it"]["val"]),)
        aggs = tuple(float(r[c]) for c in gcols)
        passes = metric_fn(aggs) >= min_metric
        if passes:
            emitted.append((items, aggs))
        if (not prune) or not passes:
            # KEEP stops expansion under containment pruning
            next1.append(r)

    if max_order >= 2 and next1:
        freq_by_attr: dict[int, list[str]] = {}
        for r in next1:
            freq_by_attr.setdefault(r["it"]["ai"], []).append(r["it"]["val"])
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
        annotated = base.select(
            *gcols, F.array_compact(F.array(*fitem_cols)).alias(_ITEMS)
        ).filter(F.size(_ITEMS) >= 2)
        # cache only when the order-3 round will scan it a second time
        cache_annotated = max_order >= 3
        if cache_annotated:
            annotated = annotated.persist(StorageLevel.MEMORY_ONLY)
        surv2_rows = (
            annotated.select(*gcols, F.explode(_combos_expr(_ITEMS, 2)).alias("its"))
            .groupBy("its")
            .agg(*sums)
            .filter(F.col("_g0") >= support_thresh)
            .collect()
        )
        next2_sets: list[tuple] = []
        for r in surv2_rows:
            items = tuple((it["ai"], it["val"]) for it in r["its"])
            aggs = tuple(float(r[c]) for c in gcols)
            passes = metric_fn(aggs) >= min_metric
            if passes:
                emitted.append((items, aggs))
            if (not prune) or not passes:
                next2_sets.append(items)

        if max_order >= 3 and next2_sets:
            next2_keys = [
                f"{a0}\x00{v0}\x00{a1}\x00{v1}" for ((a0, v0), (a1, v1)) in next2_sets
            ]
            triples = annotated.filter(F.size(_ITEMS) >= 3).select(
                *gcols, F.explode(_combos_expr(_ITEMS, 3)).alias("its")
            )
            it = F.col("its")

            def pkey(a, b):
                return F.concat_ws("\x00", a["ai"], a["val"], b["ai"], b["val"])

            if len(next2_keys) <= 5000:
                valid = (
                    pkey(it[0], it[1]).isin(next2_keys)
                    & pkey(it[0], it[2]).isin(next2_keys)
                    & pkey(it[1], it[2]).isin(next2_keys)
                )
                filtered = triples.filter(valid)
            else:
                # a literal isin list this long would bloat the plan string
                # and codegen — validate via three broadcast LEFT SEMI joins
                # against the survivor-key relation instead (support-bounded,
                # so the broadcast stays small in bytes)
                kdf = triples.sparkSession.createDataFrame(
                    [(k,) for k in next2_keys], "_sk string"
                )
                filtered = triples
                for a, b in ((0, 1), (0, 2), (1, 2)):
                    filtered = filtered.join(
                        F.broadcast(kdf),
                        pkey(it[a], it[b]) == F.col("_sk"),
                        "left_semi",
                    )
            surv3_rows = (
                filtered.groupBy("its")
                .agg(*sums)
                .filter(F.col("_g0") >= support_thresh)
                .collect()
            )
            for r in surv3_rows:
                items = tuple((x["ai"], x["val"]) for x in r["its"])
                aggs = tuple(float(r[c]) for c in gcols)
                if metric_fn(aggs) >= min_metric:
                    emitted.append((items, aggs))
        if cache_annotated:
            annotated.unpersist()
    return emitted


def _explain_rounds(spark, base: DataFrame, attrs: list[str], p: ExplainParams) -> DataFrame:
    g = base.agg(F.sum("_o").alias("o"), F.sum("_c").alias("n")).collect()[0]
    total_outliers, total_rows = float(g["o"] or 0.0), float(g["n"] or 0.0)
    schema = _result_schema(p)
    if total_outliers == 0.0 or total_rows == 0.0:
        return spark.createDataFrame([], schema)
    support_thresh = p.min_support * total_outliers

    def primary(aggs: tuple[float, ...]) -> float:
        return ratio_metric_py(p.ratio_metric, aggs[0], aggs[1], total_outliers, total_rows)

    emitted = _lattice_rounds(
        base.select(F.col("_o").alias("_g0"), F.col("_c").alias("_g1"), *attrs),
        attrs,
        2,
        support_thresh,
        primary,
        p.min_ratio_metric,
        p.max_order,
        p.prune_containment,
    )

    metrics = [p.ratio_metric, *p.extra_ratio_metrics]
    out_rows = []
    for items, (oc, tc) in emitted:
        mvals = [ratio_metric_py(m, oc, tc, total_outliers, total_rows) for m in metrics]
        padded: list = [None] * len(attrs)
        for ai, val in items:
            padded[ai] = val
        out_rows.append((*padded, oc / total_outliers, *mvals, oc, tc))
    return spark.createDataFrame(out_rows, schema)


def meanshift_explain(
    df: DataFrame,
    attributes: list[str],
    min_support: float = 0.2,
    min_mean_shift: float = 1.5,
    max_order: int = 3,
    prune_containment: bool = True,
) -> DataFrame:
    """APLCountMeanShiftSummarizer (reference lib/.../aplinear/
    APLCountMeanShiftSummarizer.java:27-88 + MeanShiftQualityMetric.java:32-35):
    itemset aggregates are the 4 CountMeanShift accumulator columns; metric =
    (outlier mean) / (inlier mean); support over outlier counts."""
    attrs = list(attributes)
    spark = df.sparkSession
    base = df.select(
        F.col("_OUTLIERCOUNT").cast("double").alias("_g0"),
        F.col("_INLIERCOUNT").cast("double").alias("_g1"),
        F.col("_OUTLIERMEANSUM").cast("double").alias("_g2"),
        F.col("_INLIERMEANSUM").cast("double").alias("_g3"),
        *attrs,
    ).persist(StorageLevel.MEMORY_ONLY)
    try:
        total_oc = float(base.agg(F.sum("_g0")).collect()[0][0] or 0.0)
        fields = [StructField(a, StringType()) for a in attrs]
        fields += [
            StructField("support", DoubleType()),
            StructField("mean_shift", DoubleType()),
            StructField("outlier_count", DoubleType()),
            StructField("inlier_count", DoubleType()),
        ]
        schema = StructType(fields)
        if total_oc == 0.0:
            return spark.createDataFrame([], schema)

        def mean_shift(aggs: tuple[float, ...]) -> float:
            oc, ic, oms, ims = aggs
            if oc == 0.0 or ic == 0.0 or ims == 0.0:
                return 0.0
            return (oms / oc) / (ims / ic)

        emitted = _lattice_rounds(
            base,
            attrs,
            4,
            min_support * total_oc,
            mean_shift,
            min_mean_shift,
            max_order,
            prune_containment,
        )
        rows = []
        for items, (oc, ic, oms, ims) in emitted:
            padded: list = [None] * len(attrs)
            for ai, val in items:
                padded[ai] = val
            rows.append((*padded, oc / total_oc, mean_shift((oc, ic, oms, ims)), oc, ic))
        return spark.createDataFrame(rows, schema)
    finally:
        base.unpersist()


def meandev_explain(
    df: DataFrame,
    attributes: list[str],
    count_col: str | None = None,
    mean_col: str = "mean",
    std_col: str = "std",
    min_support: float = 0.2,
    min_std_dev: float = 3.0,
    max_order: int = 3,
    prune_containment: bool = False,
) -> DataFrame:
    """APLMeanSummarizer (reference lib/.../aplinear/APLMeanSummarizer.java
    :28-101 + MeanDevQualityMetric.java:1-50): itemset aggregates are
    [count, m1 = mean·count, m2 = (std² + mean²)·count] (std = population
    std, so m1/m2 are plain Σx/Σx²); metric = |subgroup mean − global mean|
    / global std; support = count share of ALL rows
    (SupportQualityMetric(0)).

    prune_containment defaults False: the reference marks mean_deviation
    non-monotonic (MeanDevQualityMetric.isMonotonic), so emit-and-stop
    containment pruning could hide a stronger superset; the full
    support+threshold-filtered lattice is also what the SQL oracle states."""
    attrs = list(attributes)
    spark = df.sparkSession
    cnt = (
        F.coalesce(F.col(count_col).cast("double"), F.lit(1.0))
        if count_col
        else F.lit(1.0)
    )
    mean = F.col(mean_col).cast("double")
    std = F.col(std_col).cast("double")
    base = df.select(
        cnt.alias("_g0"),
        (mean * cnt).alias("_g1"),
        ((std * std + mean * mean) * cnt).alias("_g2"),
        *attrs,
    ).persist(StorageLevel.MEMORY_ONLY)
    try:
        g = base.agg(
            F.sum("_g0").alias("n"), F.sum("_g1").alias("m1"), F.sum("_g2").alias("m2")
        ).collect()[0]
        total = float(g["n"] or 0.0)
        fields = [StructField(a, StringType()) for a in attrs]
        fields += [
            StructField("support", DoubleType()),
            StructField("mean_dev", DoubleType()),
            StructField("count", DoubleType()),
        ]
        schema = StructType(fields)
        if total == 0.0:
            return spark.createDataFrame([], schema)
        g_mean = float(g["m1"]) / total
        g_var = float(g["m2"]) / total - g_mean * g_mean
        g_std = g_var**0.5 if g_var > 0 else 0.0

        def mean_dev(aggs: tuple[float, ...]) -> float:
            c, m1, _ = aggs
            if c == 0.0 or g_std == 0.0:
                return 0.0
            return abs(m1 / c - g_mean) / g_std

        emitted = _lattice_rounds(
            base,
            attrs,
            3,
            min_support * total,
            mean_dev,
            min_std_dev,
            max_order,
            prune_containment,
        )
        rows = []
        for items, (c, m1, m2) in emitted:
            padded: list = [None] * len(attrs)
            for ai, val in items:
                padded[ai] = val
            rows.append((*padded, c / total, mean_dev((c, m1, m2)), c))
        return spark.createDataFrame(rows, schema)
    finally:
        base.unpersist()


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
        inliers.withColumn(OUTLIER_COL, F.lit(0.0))
    )
    return explain(tagged, ExplainParams(attributes=attributes, **kwargs))


def diff_split(df: DataFrame, predicate: Column, attributes: list[str], **kwargs) -> DataFrame:
    """SPLIT form: one relation, a predicate marks the outliers."""
    tagged = df.withColumn(OUTLIER_COL, F.when(predicate, 1.0).otherwise(0.0))
    return explain(tagged, ExplainParams(attributes=attributes, **kwargs))

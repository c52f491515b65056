"""Classifiers: append an ``_OUTLIER`` column (0.0/1.0 for raw rows, a
possibly-fractional estimated outlier count for cube rows).

Reference semantics (what each computes; the how here is pure DataFrame):
- PercentileClassifier   reference lib/.../classify/PercentileClassifier.java:27-44
- PredicateClassifier    reference lib/.../classify/PredicateClassifier.java:64-103
- MAD                    reference alexp/.../outlier/MAD.java:27-91
- CountMeanShift         reference lib/.../classify/CountMeanShiftClassifier.java:67-96
- ArithmeticClassifier   reference lib/.../classify/ArithmeticClassifier.java:34-72
- PredicateCubeClassifier reference lib/.../classify/PredicateCubeClassifier.java:68-111
- RawClassifier          reference lib/.../classify/RawClassifier.java:5-25

Scale notes: cutoffs (percentiles, medians, MAD) are computed with ONE
aggregation job and broadcast back as literals — never a driver-side row
collect. The flag itself is a codegen'd column expression. At bench/cluster
scale use approx=True (``percentile_approx`` is a single-pass mergeable
sketch); tests use exact percentiles to match SQL oracles bit-for-bit.
"""

from __future__ import annotations

import operator as _op

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

OUTLIER_COL = "_OUTLIER"

_CMP = {
    "==": _op.eq,
    "=": _op.eq,
    "!=": _op.ne,
    "<>": _op.ne,
    "<": _op.lt,
    ">": _op.gt,
    "<=": _op.le,
    ">=": _op.ge,
}


def _pct(col: str, q, approx: bool):
    qs = F.array(*[F.lit(float(x)) for x in q]) if isinstance(q, (list, tuple)) else F.lit(float(q))
    return F.percentile_approx(col, qs, 100000) if approx else F.percentile(col, qs)


def predicate_expr(col: Column, cmp: str, value) -> Column:
    """Boolean predicate column ``col <cmp> value`` (double or string sentinel)."""
    try:
        fn = _CMP[cmp]
    except KeyError:
        raise ValueError(f"unsupported comparator {cmp!r}")
    return fn(col, F.lit(value))


def predicate_classify(
    df: DataFrame, metric: str, cmp: str, value, output_col: str = OUTLIER_COL
) -> DataFrame:
    """Flag rows where ``metric <cmp> value`` holds."""
    pred = predicate_expr(F.col(metric), cmp, value)
    return df.withColumn(output_col, F.when(pred, 1.0).otherwise(0.0))


def percentile_classify(
    df: DataFrame,
    metric: str,
    percentile: float = 0.5,
    include_high: bool = True,
    include_low: bool = True,
    output_col: str = OUTLIER_COL,
    approx: bool = False,
    method: str = "r7",
) -> DataFrame:
    """Flag values outside the [percentile, 100-percentile] band.

    ``percentile`` is in percent (reference convention: 0.5 → flag the bottom
    0.5% and top 0.5%). Cutoffs come from one agg job, broadcast as literals.

    ``method``: "r7" (Hyndman-Fan 7 — Spark/DuckDB quantile_cont) or "r6"
    (commons-math Percentile default, what the reference classifier uses:
    position p(n+1) — reference lib/.../classify/PercentileClassifier.java
    :27-44). R-6 is computed by evaluating the R-7 interpolator at the
    adjusted fraction (p(n+1)-1)/(n-1), so it stays one exact-percentile
    aggregation job.
    """
    p = percentile / 100.0
    if method == "r6":
        # r6 needs a second aggregation by construction: the adjusted
        # fraction (p(n+1)-1)/(n-1) depends on n BEFORE the percentile can
        # be evaluated, and Spark's percentile aggregate takes the fraction
        # as a literal. The count scans one column of the (typically cached)
        # input; r7 (the default) stays single-pass.
        n = df.count()

        def adj(q: float) -> float:
            if n <= 1:
                return 0.5
            return min(max((q * (n + 1) - 1.0) / (n - 1.0), 0.0), 1.0)

        qlo, qhi = adj(p), adj(1.0 - p)
    else:
        qlo, qhi = p, 1.0 - p
    row = df.agg(
        _pct(metric, [qlo, qhi], approx).alias("cut"),
    ).collect()[0]
    low_cut, high_cut = row["cut"][0], row["cut"][1]
    cond = F.lit(False)
    if include_high:
        cond = cond | (F.col(metric) > F.lit(float(high_cut)))
    if include_low:
        cond = cond | (F.col(metric) < F.lit(float(low_cut)))
    return df.withColumn(output_col, F.when(cond, 1.0).otherwise(0.0))


def mad_classify(
    df: DataFrame,
    metric: str,
    threshold: float = 2.5,
    score_col: str = "_SCORE",
    output_col: str = OUTLIER_COL,
    approx: bool = False,
    consistency_constant: float = 1.4826,
) -> DataFrame:
    """Median/MAD robust z-score: ``|x - median| / (k * MAD)``.

    Two aggregation jobs (median, then MAD of residuals), both broadcast as
    scalars; the score/flag are codegen'd expressions. When MAD == 0 the
    reference falls back to the mean absolute deviation about the median —
    replicated here.
    """
    med = df.agg(_pct(metric, 0.5, approx).alias("m")).collect()[0]["m"]
    resid = F.abs(F.col(metric) - F.lit(float(med)))
    row = (
        df.select(resid.alias("r"))
        .agg(_pct("r", 0.5, approx).alias("mad"), F.avg("r").alias("meanad"))
        .collect()[0]
    )
    mad, meanad = row["mad"], row["meanad"]
    if mad and mad > 0:
        scale = consistency_constant * mad
    else:
        scale = 1.253314 * meanad if meanad else 1.0
    score = resid / F.lit(float(scale))
    out = df.withColumn(score_col, score)
    return out.withColumn(output_col, F.when(F.col(score_col) > threshold, 1.0).otherwise(0.0))


def count_mean_shift_classify(
    df: DataFrame, metric: str, predicate: Column
) -> DataFrame:
    """Split rows by ``predicate`` and emit the 4 mean-shift accumulator
    columns the mean-shift summarizer consumes."""
    is_out = predicate.cast("double")
    m = F.col(metric)
    return (
        df.withColumn("_OUTLIERCOUNT", is_out)
        .withColumn("_INLIERCOUNT", 1.0 - is_out)
        .withColumn("_OUTLIERMEANSUM", F.when(is_out == 1.0, m).otherwise(0.0))
        .withColumn("_INLIERMEANSUM", F.when(is_out == 0.0, m).otherwise(0.0))
    )


def count_mean_shift_cube_classify(
    df: DataFrame,
    metric: str,
    cmp: str,
    value,
    count_col: str = "count",
    mean_col: str = "mean",
) -> DataFrame:
    """Cube flavor of the mean-shift classifier (reference
    lib/.../classify/CountMeanShiftCubedClassifier.java:64-100): a cube row
    matching the predicate contributes its WHOLE count as outliers and
    mean·count to the outlier mean sum (weights, not 0/1 rows)."""
    pred = predicate_expr(F.col(metric), cmp, value)
    cnt = F.col(count_col).cast("double")
    msum = F.col(mean_col).cast("double") * cnt
    return (
        df.withColumn("_OUTLIERCOUNT", F.when(pred, cnt).otherwise(0.0))
        .withColumn("_INLIERCOUNT", F.when(pred, 0.0).otherwise(cnt))
        .withColumn("_OUTLIERMEANSUM", F.when(pred, msum).otherwise(0.0))
        .withColumn("_INLIERMEANSUM", F.when(pred, 0.0).otherwise(msum))
    )


def arithmetic_cube_classify(
    df: DataFrame,
    count_col: str = "count",
    mean_col: str = "mean",
    std_col: str = "std",
    percentile: float = 1.0,
    include_high: bool = True,
    include_low: bool = True,
    output_col: str = OUTLIER_COL,
) -> DataFrame:
    """Cube classifier: weighted-percentile cutoffs over group means, then a
    per-group estimated outlier count = Normal(mean, std) tail mass × count.

    The weighted percentile is computed distributively (bucketed two-phase
    cumulative sum — see _weighted_percentile_cutoffs), equivalent to the
    reference's WeightedPercentile (lib/.../stats/WeightedPercentile.java
    :11-56) without materializing repeated values and without an
    unpartitioned global-sort window.
    """
    p = percentile / 100.0
    low_cut, high_cut = _weighted_percentile_cutoffs(
        df.select(F.col(mean_col).alias("_v"), F.col(count_col).alias("_w")),
        "_v",
        "_w",
        [p, 1.0 - p],
    )

    mean, std, cnt = F.col(mean_col), F.col(std_col), F.col(count_col)
    # Normal CDF via erf — exact, JVM-side (reference interpolates a lookup
    # table; erf is strictly more accurate).
    def cdf(x):
        z = (x - mean) / F.when(std > 0, std).otherwise(F.lit(1e-300))
        return 0.5 * (1.0 + _erf(z / F.lit(2.0**0.5)))

    frac = F.lit(0.0)
    if include_high:
        frac = frac + (1.0 - cdf(F.lit(high_cut)))
    if include_low:
        frac = frac + cdf(F.lit(low_cut))
    frac = F.least(F.greatest(frac, F.lit(0.0)), F.lit(1.0))
    return df.withColumn(output_col, frac * cnt)


def _erf(z: Column) -> Column:
    """Abramowitz–Stegun 7.1.26 rational approximation of erf (|err|<1.5e-7),
    as a pure column expression (Spark lacks a built-in erf)."""
    sign = F.when(z < 0, -1.0).otherwise(1.0)
    x = F.abs(z)
    t = 1.0 / (1.0 + 0.3275911 * x)
    poly = t * (
        0.254829592
        + t * (-0.284496736 + t * (1.421413741 + t * (-1.453152027 + t * 1.061405429)))
    )
    return sign * (1.0 - poly * F.exp(-x * x))


def _weighted_percentile_cutoffs(
    df: DataFrame, value_col: str, weight_col, fracs: list[float], n_buckets: int = 64
) -> list[float]:
    """Distributed weighted percentiles — reference WeightedPercentile
    semantics (lib/.../classify/stats/WeightedPercentile.java:11-56): sort by
    value, cumulative-sum the weights, return the first value whose
    cumulative weight crosses frac × total, for each frac.

    NO unpartitioned window (a global ``Window.orderBy`` pulls every row into
    one task). Instead, three bounded jobs:

    1. collapse to distinct values (map-side combine) and compute ≤
       n_buckets-1 approx-quantile bucket boundaries — broadcast as literals
       in a codegen'd when-chain;
    2. per-bucket weight totals (≤ n_buckets rows to the driver) give each
       bucket's cumulative offset, locating the crossing bucket per frac;
    3. ONE window PARTITIONED by bucket computes local cumulative sums in
       just the crossing buckets — max partition ≈ distinct_values/n_buckets,
       and all fracs resolve in a single aggregation job.
    """
    agg = (
        df.groupBy(F.col(value_col).alias("_v"))
        .agg(F.sum(weight_col).alias("_w"))
        .persist()
    )
    try:
        head = agg.agg(
            F.sum("_w").alias("_t"),
            F.max("_v").alias("_max"),
            F.percentile_approx(
                "_v", [i / n_buckets for i in range(1, n_buckets)], 10000
            ).alias("_b"),
        ).collect()[0]
        if head["_t"] is None:
            raise ValueError("weighted percentile over an empty relation")
        total, vmax = float(head["_t"]), float(head["_max"])
        bnds = sorted({float(b) for b in (head["_b"] or [])})
        bexpr = F.lit(len(bnds))
        for i in range(len(bnds) - 1, -1, -1):
            bexpr = F.when(F.col("_v") <= F.lit(bnds[i]), F.lit(i)).otherwise(bexpr)
        b_agg = agg.withColumn("_bk", bexpr)
        per_b = {
            int(r["_bk"]): float(r["_s"])
            for r in b_agg.groupBy("_bk").agg(F.sum("_w").alias("_s")).collect()
        }
        # walk buckets in order; assign each frac its crossing bucket + offset
        order = sorted(range(len(fracs)), key=lambda i: fracs[i])
        chosen: list[tuple[int, int, float, float]] = []  # (frac_idx, bucket, target, offset)
        cum, ri = 0.0, 0
        for b in range(len(bnds) + 1):
            w = per_b.get(b, 0.0)
            while ri < len(order) and cum + w >= fracs[order[ri]] * total:
                chosen.append((order[ri], b, fracs[order[ri]] * total, cum))
                ri += 1
            cum += w
        out = [vmax] * len(fracs)  # fracs beyond total weight → max value
        if chosen:
            from pyspark.sql import Window

            win = (
                Window.partitionBy("_bk")
                .orderBy("_v")
                .rowsBetween(Window.unboundedPreceding, 0)
            )
            cumdf = b_agg.filter(
                F.col("_bk").isin([b for _, b, _, _ in chosen])
            ).withColumn("_cw", F.sum("_w").over(win))
            sel = []
            for k, (fi, b, target, offset) in enumerate(chosen):
                hit = F.min(
                    F.when(
                        (F.col("_bk") == b) & (F.col("_cw") >= F.lit(target - offset)),
                        F.col("_v"),
                    )
                ).alias(f"h{k}")
                # fp fallback: per-bucket sums may differ from the driver's
                # offset arithmetic in the last ulp — the bucket max is then
                # the crossing value by construction
                fb = F.max(F.when(F.col("_bk") == b, F.col("_v"))).alias(f"m{k}")
                sel.extend([hit, fb])
            row = cumdf.agg(*sel).collect()[0]
            for k, (fi, _, _, _) in enumerate(chosen):
                v = row[f"h{k}"] if row[f"h{k}"] is not None else row[f"m{k}"]
                out[fi] = float(v)
        return out
    finally:
        agg.unpersist()


def _weighted_percentile_cutoff(
    df: DataFrame, value_col: str, weight_col, frac: float
) -> float:
    return _weighted_percentile_cutoffs(df, value_col, weight_col, [frac])[0]


def quantile_cube_classify(
    df: DataFrame,
    quantile_cols: list[tuple[float, str]],
    count_col: str = "count",
    percentile: float = 1.0,
    include_high: bool = True,
    include_low: bool = True,
    output_col: str = OUTLIER_COL,
) -> DataFrame:
    """Cube classifier over groups that carry quantile columns (reference
    lib/.../classify/QuantileClassifier.java:41-90 + LinearInterpolator):

    1. global cutoffs = weighted percentile over every group's quantile
       points, each point weighted by count x its probability mass;
    2. per-group estimated outlier count = count x tail mass outside the
       cutoffs, from piecewise-linear interpolation of the group's own
       quantile CDF — as a pure column expression.

    ``quantile_cols``: ascending [(level, column)], e.g.
    [(0.0,'q0'), (0.5,'q50'), (1.0,'q100')].
    """
    qs = sorted(quantile_cols)
    levels = [q for q, _ in qs]
    cols = [c for _, c in qs]
    # probability mass attributed to each quantile point (trapezoid split)
    masses = []
    for i in range(len(levels)):
        lo = levels[i - 1] if i > 0 else levels[0]
        hi = levels[i + 1] if i < len(levels) - 1 else levels[-1]
        masses.append((hi - lo) / 2.0 if len(levels) > 1 else 1.0)

    points = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.col(c).cast("double").alias("v"),
                        (F.col(count_col) * F.lit(m)).cast("double").alias("w"),
                    )
                    for c, m in zip(cols, masses)
                ]
            )
        ).alias("p")
    ).select(F.col("p.v").alias("v"), F.col("p.w").alias("w"))

    p = percentile / 100.0
    low_cut, high_cut = _weighted_percentile_cutoffs(points, "v", "w", [p, 1.0 - p])

    def cdf_expr(cut: float) -> Column:
        """P(X <= cut) under the group's piecewise-linear quantile CDF."""
        expr = F.lit(float(levels[0]))
        for i in range(len(cols) - 1):
            q0, q1 = F.col(cols[i]).cast("double"), F.col(cols[i + 1]).cast("double")
            l0, l1 = levels[i], levels[i + 1]
            seg = F.lit(l0) + (F.lit(l1 - l0)) * (F.lit(cut) - q0) / F.when(
                q1 > q0, q1 - q0
            ).otherwise(F.lit(float("inf")))
            expr = F.when((F.lit(cut) >= q0) & (F.lit(cut) < q1), seg).otherwise(expr)
        expr = F.when(F.lit(cut) >= F.col(cols[-1]).cast("double"), F.lit(float(levels[-1]))).otherwise(expr)
        expr = F.when(F.lit(cut) < F.col(cols[0]).cast("double"), F.lit(float(levels[0]))).otherwise(expr)
        return expr

    frac = F.lit(0.0)
    if include_high:
        frac = frac + (F.lit(1.0) - cdf_expr(high_cut))
    if include_low:
        frac = frac + cdf_expr(low_cut)
    frac = F.least(F.greatest(frac, F.lit(0.0)), F.lit(1.0))
    return df.withColumn(output_col, frac * F.col(count_col).cast("double"))


def predicate_cube_classify(
    df: DataFrame, metric: str, cmp: str, value, count_col: str = "count",
    output_col: str = OUTLIER_COL,
) -> DataFrame:
    """Group matches predicate → all of its count are outliers, else 0."""
    pred = predicate_expr(F.col(metric), cmp, value)
    return df.withColumn(output_col, F.when(pred, F.col(count_col).cast("double")).otherwise(0.0))


def raw_classify(df: DataFrame, outlier_col: str, output_col: str = OUTLIER_COL) -> DataFrame:
    """Pass-through: the outlier count column already exists."""
    if outlier_col == output_col:
        return df
    return df.withColumn(output_col, F.col(outlier_col).cast("double"))


def random_classify(
    df: DataFrame, seed: int = 42, threshold: float | None = None, output_col: str = OUTLIER_COL
) -> DataFrame:
    """Baseline random scorer (reference alexp/.../outlier/RandomClassifier):
    uniform score, optional threshold to a 0/1 flag. Deterministic per seed
    and partitioning."""
    score = F.rand(seed)
    if threshold is None:
        return df.withColumn(output_col, score)
    return df.withColumn(output_col, F.when(score > threshold, 1.0).otherwise(0.0))


def metric_bucket_transform(
    df: DataFrame,
    metric: str,
    boundary_percentiles: list[float] | None = None,
    output_col: str | None = None,
    approx: bool = True,
) -> DataFrame:
    """Bucket a double column into categorical labels at percentile
    boundaries so metrics can serve as explanation attributes (reference
    lib/.../transform/MetricBucketTransformer.java:17-90; default boundaries
    10/90). Labels are half-open range strings like '[lo, hi)'."""
    ps = boundary_percentiles or [10.0, 90.0]
    fracs = [p / 100.0 for p in ps]
    row = df.agg(_pct(metric, fracs, approx).alias("cuts")).collect()[0]
    cuts = [float(c) for c in row["cuts"]]
    out = output_col or f"{metric}_bucket"
    c = F.col(metric)
    expr = F.lit(f"[{cuts[-1]}, inf)")
    labels = ["-inf"] + [str(x) for x in cuts]
    for i in range(len(cuts) - 1, -1, -1):
        lo = labels[i]
        expr = F.when(c < cuts[i], F.lit(f"[{lo}, {cuts[i]})")).otherwise(expr)
    return df.withColumn(out, expr)


def min_max_normalize(df: DataFrame, col: str, output_col: str | None = None) -> DataFrame:
    """(x - min) / (max - min); one agg job, broadcast scalars."""
    row = df.agg(F.min(col).alias("lo"), F.max(col).alias("hi")).collect()[0]
    lo, hi = float(row["lo"]), float(row["hi"])
    span = (hi - lo) or 1.0
    return df.withColumn(output_col or col, (F.col(col) - F.lit(lo)) / F.lit(span))

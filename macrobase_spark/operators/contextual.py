"""Contextual outlier detection (the reference's contrib
contextualoutlier subtree — the last unported algorithm family).

Reference semantics (contrib/src/main/java/macrobase/analysis/
contextualoutlier/):

- A *context* is a conjunction of unit predicates over contextual
  attributes (ContextualOutlierDetector.java:508-675): for a discrete
  attribute, equality to one value (IntervalDiscrete.java:17-27;
  values that encode as null/"null" are "not interesting" and never
  form a context — ContextualOutlierDetector.isInterestingInterval:
  561-572); for a double attribute, membership in one of
  ``numIntervals`` equal-width bins of [min, max] (half-open
  [lo, hi) intervals, the last stretched to max+1e-6 —
  IntervalDouble.contains:31-37, detector :626-642).
- A context is *dense* when size(context)/N >= denseContextTau
  (the detector's own exact re-check at :426-430). The lattice is
  walked APriori-style (LatticeNode.join:34-47 + Context.join:146-180):
  a level-k context is generated from the two level-(k-1) parents that
  share its first k-2 dimensions, and only if both survived.
- *Dependency pruning* (Context.dependencyPruning:219-247): a joined
  context c = p1 AND p2 is discarded when p1 => p2 or p2 => p1 (the
  reference tests sample containment; with exact counts this is
  size(c) == size(p1) or size(c) == size(p2), since c = p1 INTERSECT p2).
- *Density pruning* (Context.densityPruning:193-211) is a sample-based
  z-test ESTIMATE of the same exact density rule, layered on top for
  speed — it can false-prune at alpha=0.05 and depends on an unseeded
  java.util.Random reservoir (detector :294-310). This port computes
  exact densities in one grouping-sets aggregation instead (a documented
  divergence in the direction of the reference's own exact re-check).
- *Distribution pruning* (detector.sameDistribution:463-490): a child
  whose metric sample passes a two-sample Kolmogorov-Smirnov test
  against a parent's sample (alpha=0.05) inherits the parent state and
  skips scoring — it contributes NO outlier rows. The reference's
  sample is an unseeded reservoir (nondeterministic output by default);
  this port seeds the sample by hashing the id column so runs are
  reproducible, and uses the asymptotic two-sided KS p-value.
- Per dense context the configured detector (MAD here — legacy
  MAD.java:38-97: exact median; MAD = median |x - median|; if MAD == 0,
  the 5% trimmed mean of sorted residuals) scores the context's own
  rows, and StaticThresholdClassifier.java:32-36 flags score > threshold
  (strict). The global (empty-predicate) context is always evaluated
  first (detector :93-95).

Spark shape (100 TB story):
- ONE aggregation job discovers every dense context: a grouping-sets
  aggregate over all dimension subsets of size <= max_predicates, with
  map-side partial aggregation absorbing hot units; only combos at
  density >= tau reach the driver (at most floor(1/tau) per subset —
  a few KB regardless of input size).
- The (tiny) surviving-context relation is broadcast; each row explodes
  into its subset keys (replication factor = number of subsets, map-only)
  and the broadcast join drops non-dense memberships immediately.
- Scoring is two grouped EXACT percentiles (median, then residual
  median) — each a single shuffle on context_id with partial
  aggregation. The MAD==0 trimmed-mean fallback runs only for the
  contexts that need it (driver inspects the context-grain MAD rows).
  At cluster scale pass approx=True to swap exact percentile for
  percentile_approx(accuracy) in the same plan shape.
"""

from __future__ import annotations

import math
from itertools import combinations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from macrobase_spark.queries import register

_SEP = "\x1f"
_GLOBAL = "global"


def _ks_2samp_p(a, b) -> float:
    """Asymptotic two-sided two-sample KS p-value (the commons-math
    TestUtils.kolmogorovSmirnovTest contract at large n; deterministic)."""
    import numpy as np

    a = np.sort(np.asarray(a, dtype=float))
    b = np.sort(np.asarray(b, dtype=float))
    n, m = len(a), len(b)
    if n == 0 or m == 0:
        return 1.0
    allv = np.concatenate([a, b])
    cdf_a = np.searchsorted(a, allv, side="right") / n
    cdf_b = np.searchsorted(b, allv, side="right") / m
    d = float(np.max(np.abs(cdf_a - cdf_b)))
    t = d * math.sqrt(n * m / (n + m))
    if t <= 0:
        return 1.0
    # Kolmogorov distribution tail: 2 * sum (-1)^(k-1) exp(-2 k^2 t^2)
    s = 0.0
    for k in range(1, 101):
        term = 2.0 * (-1.0) ** (k - 1) * math.exp(-2.0 * k * k * t * t)
        s += term
        if abs(term) < 1e-12:
            break
    return max(0.0, min(1.0, s))


class _Ctx:
    __slots__ = ("dims", "units", "cnt", "level")

    def __init__(self, dims: tuple, units: tuple, cnt: int, level: int):
        self.dims, self.units, self.cnt, self.level = dims, units, cnt, level

    def label(self) -> str:
        return ",".join(f"{d}={u}" for d, u in zip(self.dims, self.units))


def dense_context_lattice(
    counts: dict,
    n_total: int,
    dims: list,
    *,
    tau: float,
    max_predicates: int,
    dependency_pruning: bool = True,
    samples: dict | None = None,
    alpha: float = 0.05,
) -> list:
    """Replay the reference's lattice walk over EXACT subset counts.

    ``counts``: {dims_tuple: {units_tuple: count}} for every subset of
    size <= max_predicates, already filtered to density >= tau.
    ``samples``: optional {(dims, units): metric-sample list} enabling
    distribution pruning — a pruned context is dropped from the OUTPUT
    (reference: scoring skipped => no outlier rows recorded).
    Returns surviving contexts (level >= 1) in lattice order.
    """
    dim_index = {d: i for i, d in enumerate(dims)}
    level_prev: list[_Ctx] = []
    out: list[_Ctx] = []
    # level 1: every dense unit (counts already density-filtered)
    for d in dims:
        for units, cnt in sorted(counts.get((d,), {}).items()):
            level_prev.append(_Ctx((d,), units, cnt, 1))
    # distribution pruning removes a context from the OUTPUT but the
    # reference still levels up through it (the lattice keeps the node);
    # track pruned-ness separately from survival.
    pruned: set = set()

    def _dist_pruned(c: _Ctx, parents: list) -> bool:
        if samples is None:
            return False
        cs = samples.get((c.dims, c.units))
        if cs is None:
            return False
        for p in parents:
            ps = (
                samples.get((p.dims, p.units))
                if p is not None
                else samples.get(((), ()))
            )
            if ps is None:
                continue
            if _ks_2samp_p(cs, ps) > alpha:  # fail to reject => same dist
                return True
        return False

    for c in level_prev:
        if _dist_pruned(c, [None]):  # parent of a 1-dim context = global
            pruned.add((c.dims, c.units))
        else:
            out.append(c)
    level = 2
    while level <= max_predicates and level_prev:
        by_key = {(c.dims, c.units): c for c in level_prev}
        cur: list[_Ctx] = []
        seen = set()
        # reference join order: sorted dimension lists, prefix-matched
        for c1 in level_prev:
            for c2 in level_prev:
                if c1.dims[:-1] != c2.dims[:-1] or c1.units[:-1] != c2.units[:-1]:
                    continue
                d1, d2 = c1.dims[-1], c2.dims[-1]
                if dim_index[d1] >= dim_index[d2]:
                    continue
                nd = c1.dims[:-1] + (d1, d2)
                nu = c1.units[:-1] + (c1.units[-1], c2.units[-1])
                if (nd, nu) in seen:
                    continue
                seen.add((nd, nu))
                cnt = counts.get(nd, {}).get(nu)
                if cnt is None or cnt / n_total < tau:
                    continue  # exact density pruning
                if dependency_pruning and (cnt == c1.cnt or cnt == c2.cnt):
                    continue  # p1 => p2 or p2 => p1
                c = _Ctx(nd, nu, cnt, level)
                cur.append(c)
                if _dist_pruned(c, [c1, c2]):
                    pruned.add((nd, nu))
        cur.sort(key=lambda c: (c.dims, c.units))
        out.extend(c for c in cur if (c.dims, c.units) not in pruned)
        level_prev = cur
        level += 1
    return out


def contextual_outliers(
    df: DataFrame,
    metric_col: str,
    discrete_attrs: list,
    double_attrs: list,
    *,
    id_col: str,
    tau: float = 0.5,
    num_intervals: int = 10,
    max_predicates: int | None = None,
    threshold: float = 3.0,
    dependency_pruning: bool = True,
    distribution_pruning: bool = False,
    alpha: float = 0.05,
    sample_mod: int = 997,
    sample_keep: int = 97,
    include_global: bool = True,
    approx: bool = False,
    carry_cols: list | None = None,
) -> DataFrame:
    """Find all contextual outliers (ContextualOutlierDetector.
    searchContextualOutliers:89-162 semantics with a MAD + static
    threshold detector per dense context).

    Returns one row per (context, outlier): ``context`` (string label,
    'global' for the empty-predicate context), ``level``, the id column,
    ``metric``, ``score`` (= |x - median| / MAD of the context), and
    ``context_size``.
    """
    dims = list(discrete_attrs) + list(double_attrs)
    if max_predicates is None:
        max_predicates = len(dims)
    max_predicates = min(max_predicates, len(dims))

    # ---- pass 0: N + per-double-attr min/max in one aggregate
    aggs = [F.count(F.lit(1)).alias("__n")]
    for a in double_attrs:
        aggs.append(F.min(F.col(a).cast("double")).alias(f"__lo_{a}"))
        aggs.append(F.max(F.col(a).cast("double")).alias(f"__hi_{a}"))
    stats = df.agg(*aggs).collect()[0]
    n_total = stats["__n"]
    id_type = df.schema[id_col].dataType.simpleString()
    empty_schema = (
        f"context string, level int, `{id_col}` {id_type}, metric double, "
        "score double, context_size long"
    )
    if n_total == 0:
        return df.sparkSession.createDataFrame([], empty_schema)

    # ---- unit assignment (null / "null" units never form a context)
    unit_cols = []
    for a in discrete_attrs:
        u = F.col(a).cast("string")
        unit_cols.append(F.when(u.isNotNull() & (u != "null"), u).alias(f"__u_{a}"))
    for a in double_attrs:
        lo, hi = float(stats[f"__lo_{a}"]), float(stats[f"__hi_{a}"])
        step = (hi - lo) / num_intervals
        v = F.col(a).cast("double")
        if step == 0.0:
            # degenerate range: the reference's accumulated edges leave
            # only the stretched last interval non-empty
            b = F.lit(num_intervals - 1)
        else:
            b = F.least(
                F.greatest(F.floor((v - F.lit(lo)) / F.lit(step)).cast("int"), F.lit(0)),
                F.lit(num_intervals - 1),
            )
        unit_cols.append(F.when(v.isNotNull(), b.cast("string")).alias(f"__u_{a}"))

    # one narrow materialization feeds every later pass (dense-context
    # counts, optional sample, median agg, MAD agg, final scoring) — four
    # map passes over a checkpointed (id, metric, units) relation instead
    # of four parquet rescans + explode recomputes. The relation is as
    # narrow as the reference's own in-memory Datum list.
    base = df.select(
        F.col(id_col),
        F.col(metric_col).cast("double").alias("__m"),
        *(carry_cols or []),
        *unit_cols,
    ).localCheckpoint()
    ucols = [f"__u_{a}" for a in dims]
    subsets = [
        s for k in range(1, max_predicates + 1) for s in combinations(range(len(dims)), k)
    ]

    # ---- ONE grouping-sets aggregation discovers every dense context
    gsets = [[F.col(ucols[i]) for i in s] for s in subsets]
    counted = (
        base.groupingSets(gsets, *[F.col(c) for c in ucols])
        .agg(F.count(F.lit(1)).alias("cnt"), F.grouping_id(*ucols).alias("gid"))
        .where((F.col("cnt").cast("double") / F.lit(float(n_total))) >= F.lit(tau))
    )
    gid_of = {
        s: sum(1 << (len(dims) - 1 - i) for i in range(len(dims)) if i not in s)
        for s in subsets
    }
    subset_of_gid = {g: s for s, g in gid_of.items()}
    counts: dict = {}
    for r in counted.collect():
        s = subset_of_gid.get(r["gid"])
        if s is None:
            continue
        units = tuple(r[ucols[i]] for i in s)
        if any(u is None for u in units):
            continue
        counts.setdefault(tuple(dims[i] for i in s), {})[units] = r["cnt"]

    # ---- optional distribution pruning: seeded-hash metric sample
    samples = None
    if distribution_pruning:
        samp = base.where(
            F.pmod(F.xxhash64(F.col(id_col)), F.lit(sample_mod)) < F.lit(sample_keep)
        ).collect()
        samples = {((), ()): [r["__m"] for r in samp]}
        for s in subsets:
            sdims = tuple(dims[i] for i in s)
            for units in counts.get(sdims, {}):
                vals = [
                    r["__m"]
                    for r in samp
                    if all(r[ucols[i]] == u for i, u in zip(s, units))
                ]
                samples[(sdims, units)] = vals

    lattice = dense_context_lattice(
        counts,
        n_total,
        dims,
        tau=tau,
        max_predicates=max_predicates,
        dependency_pruning=dependency_pruning,
        samples=samples,
        alpha=alpha,
    )

    scored = _score_contexts(
        df.sparkSession, base, dims, ucols, id_col, lattice,
        include_global=include_global, approx=approx, carry_cols=carry_cols,
    )
    if scored is None:
        return df.sparkSession.createDataFrame([], empty_schema)
    return scored.where(F.col("score") > F.lit(threshold)).select(
        "context",
        "level",
        id_col,
        F.col("__m").alias("metric"),
        "score",
        "context_size",
        *(carry_cols or []),
    )


def _score_contexts(
    spark,
    base: DataFrame,
    dims: list,
    ucols: list,
    id_col: str,
    lattice: list,
    *,
    include_global: bool,
    approx: bool,
    carry_cols: list | None = None,
) -> DataFrame | None:
    """Membership explode + broadcast context join + grouped-MAD scoring.
    Returns the FULL scored membership relation (context, level, id, __m,
    score, context_size, carry cols) or None when there is nothing to score.
    """
    carry_cols = list(carry_cols or [])
    # ---- broadcast the surviving contexts, explode rows into memberships
    ctx_rows = [
        (c.label(), c.level, ",".join(c.dims), _SEP.join(map(str, c.units)))
        for c in lattice
    ]
    live_subsets = sorted(
        {tuple(dims.index(d) for d in c.dims) for c in lattice}
    )
    member_structs = []
    if include_global:
        member_structs.append(
            F.struct(
                F.lit("").alias("dk"), F.lit(_GLOBAL).alias("uk")
            )
        )
    for s in live_subsets:
        dk = ",".join(dims[i] for i in s)
        has_null = F.lit(False)
        for i in s:
            has_null = has_null | F.col(ucols[i]).isNull()
        member_structs.append(
            F.struct(
                F.when(has_null, F.lit(None)).otherwise(F.lit(dk)).alias("dk"),
                F.concat_ws(_SEP, *[F.col(ucols[i]) for i in s]).alias("uk"),
            )
        )
    if not member_structs:
        return None
    exploded = (
        base.select(
            F.col(id_col),
            F.col("__m"),
            *carry_cols,
            F.explode(F.array(*member_structs)).alias("mk"),
        )
        .select(
            id_col, "__m", *carry_cols,
            F.col("mk.dk").alias("dk"), F.col("mk.uk").alias("uk"),
        )
        .where(F.col("dk").isNotNull())
    )
    ctx_schema = "context string, level int, dk string, uk string"
    ctx_df = spark.createDataFrame(ctx_rows, ctx_schema)
    if include_global:
        ctx_df = ctx_df.union(
            spark.createDataFrame([(_GLOBAL, 0, "", _GLOBAL)], ctx_schema)
        )
    members = exploded.join(F.broadcast(ctx_df), ["dk", "uk"]).select(
        "context", "level", id_col, "__m", *carry_cols
    )

    # ---- MAD per context: two grouped exact percentiles (one shuffle each)
    pct = (
        (lambda c, p: F.percentile_approx(c, p, 10000))
        if approx
        else (lambda c, p: F.percentile(c, p))
    )
    med = members.groupBy("context").agg(
        pct(F.col("__m"), 0.5).alias("__med"),
        F.count(F.lit(1)).alias("context_size"),
    )
    withmed = members.join(F.broadcast(med), "context").withColumn(
        "__resid", F.abs(F.col("__m") - F.col("__med"))
    )
    mad = withmed.groupBy("context").agg(pct(F.col("__resid"), 0.5).alias("__mad"))
    mad_rows = {r["context"]: r["__mad"] for r in mad.collect()}
    zero_ctx = [c for c, m in mad_rows.items() if m == 0.0]
    if zero_ctx:
        # legacy MAD.java:74-85 — 5% trimmed mean of SORTED residuals
        w = Window.partitionBy("context").orderBy("__resid")
        trimmed = (
            withmed.where(F.col("context").isin(zero_ctx))
            .withColumn("__rn", F.row_number().over(w) - 1)
            .withColumn("__nn", F.count(F.lit(1)).over(Window.partitionBy("context")))
            .where(
                (F.col("__rn") >= F.floor(F.col("__nn") * 0.05))
                & (F.col("__rn") < F.floor(F.col("__nn") * 0.95))
            )
            .groupBy("context")
            .agg(F.avg("__resid").alias("__mad"))
        )
        for r in trimmed.collect():
            mad_rows[r["context"]] = r["__mad"]
    if not mad_rows:
        return None
    mad_df = spark.createDataFrame(
        [(c, float(m)) for c, m in mad_rows.items()], "context string, __mad double"
    )
    return withmed.join(F.broadcast(mad_df), "context").withColumn(
        "score", F.abs(F.col("__m") - F.col("__med")) / F.col("__mad")
    )


def contextual_explain(
    df: DataFrame,
    metric_col: str,
    discrete_attrs: list,
    double_attrs: list,
    *,
    id_col: str,
    attributes: list,
    min_support: float = 0.2,
    min_ratio_metric: float = 1.5,
    ratio_metric: str = "global_ratio",
    **kw,
) -> DataFrame:
    """BasicContextualBatchedPipeline.run:58-73 semantics: summarize every
    context's outliers over ``attributes`` (the reference hands each
    context's classification results to BatchSummarizer). Rendered as ONE
    grouped order-1 explain keyed by context — per (context, attribute,
    value): support and ratio measured against THAT context's totals, the
    same shape as the engine's windowed explain."""
    from macrobase_spark.streaming.windowed import _support_ratio_exprs

    thr = kw.get("threshold", 3.0)
    # score EVERY membership (threshold -inf keeps inliers) and flag inline
    full = contextual_outliers(
        df, metric_col, discrete_attrs, double_attrs,
        id_col=id_col, carry_cols=list(attributes),
        **{**kw, "threshold": float("-inf")},
    ).withColumn("_o", F.when(F.col("score") > F.lit(thr), 1.0).otherwise(0.0))
    items = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(a).alias("attribute"),
                    F.col(a).cast("string").alias("value"),
                )
                for a in attributes
            ]
        )
    ).alias("it")
    per_item = (
        full.select("context", F.col("_o"), items)
        .filter(F.col("it.value").isNotNull())
        .groupBy("context", "it")
        .agg(
            F.sum("_o").alias("outlier_count"),
            F.count(F.lit(1)).cast("double").alias("total_count"),
        )
    )
    totals = full.groupBy("context").agg(
        F.sum("_o").alias("O"), F.count(F.lit(1)).cast("double").alias("N")
    )
    j = per_item.join(totals, "context")
    oc, tc, O, N = (F.col(c) for c in ["outlier_count", "total_count", "O", "N"])
    support, ratio = _support_ratio_exprs(oc, tc, O, N, ratio_metric)
    return (
        j.select(
            "context",
            F.col("it.attribute").alias("attribute"),
            F.col("it.value").alias("value"),
            support.alias("support"),
            ratio.alias(ratio_metric),
            oc,
            tc,
            F.col("O").alias("context_outliers"),
            F.col("N").alias("context_size"),
        )
        .filter(
            (F.col("support") >= min_support)
            & (F.col(ratio_metric) >= min_ratio_metric)
        )
    )


def contextual_search_given_outliers(
    df: DataFrame,
    metric_col: str,
    discrete_attrs: list,
    double_attrs: list,
    *,
    id_col: str,
    outlier_predicate,
    tau: float = 0.5,
    num_intervals: int = 10,
    max_predicates: int | None = None,
    threshold: float = 3.0,
    dependency_pruning: bool = True,
    approx: bool = False,
) -> DataFrame:
    """Interface 2 (ContextualOutlierDetector.searchContextGivenOutliers:
    191-292): given input outliers (a Column predicate, or the reference's
    "col = value" string — findInputOutliers:164-183), return the contexts
    in which ALL of them are MAD outliers.

    Reference details mirrored exactly:
    - level-1 candidates are built ON THE INPUT OUTLIERS with density 1.0
      (initOneDimensionalDenseContextsAndContext2DataGivenOutliers:677-698)
      — in particular, double-attribute bins span the OUTLIERS' min/max,
      not the full data's, and a candidate exists only when every input
      outlier lands in the same unit;
    - candidates are then re-checked dense (>= tau) on the FULL data and
      leveled up through the usual joins with dependency pruning;
    - the global context is never returned (the reference tests
      ``globalOutliers.contains(inputOutliers)`` — List.contains with a
      List argument, which is always false; mirrored as an exclusion).

    Output: one row per qualifying context (context, level, context_size,
    n_outliers).
    """
    if isinstance(outlier_predicate, str):
        col, _, val = outlier_predicate.partition(" = ")
        pred = F.col(col.strip()).cast("string") == val.strip()
    else:
        pred = outlier_predicate
    dims = list(discrete_attrs) + list(double_attrs)
    if max_predicates is None:
        max_predicates = len(dims)
    max_predicates = min(max_predicates, len(dims))
    marked = df.withColumn("__is_in", F.when(pred, 1).otherwise(0))

    # one aggregate: N, n_input, per-dim distinct-unit checks over the
    # input outliers (+ the outliers' min/max for double bins)
    aggs = [
        F.count(F.lit(1)).alias("__n"),
        F.sum("__is_in").alias("__n_in"),
    ]
    for a in discrete_attrs:
        u = F.col(a).cast("string")
        u = F.when(u.isNotNull() & (u != "null"), u)
        aggs.append(
            F.count_distinct(F.when(F.col("__is_in") == 1, u)).alias(f"__d_{a}")
        )
        aggs.append(F.min(F.when(F.col("__is_in") == 1, u)).alias(f"__v_{a}"))
        aggs.append(
            F.sum(
                F.when((F.col("__is_in") == 1) & u.isNull(), 1).otherwise(0)
            ).alias(f"__nu_{a}")
        )
    for a in double_attrs:
        v = F.col(a).cast("double")
        aggs.append(F.min(F.when(F.col("__is_in") == 1, v)).alias(f"__lo_{a}"))
        aggs.append(F.max(F.when(F.col("__is_in") == 1, v)).alias(f"__hi_{a}"))
        aggs.append(
            F.sum(
                F.when((F.col("__is_in") == 1) & v.isNull(), 1).otherwise(0)
            ).alias(f"__nu_{a}")
        )
    stats = marked.agg(*aggs).collect()[0]
    n_total, n_in = stats["__n"], stats["__n_in"]
    spark = df.sparkSession
    empty = spark.createDataFrame(
        [], "context string, level int, context_size long, n_outliers long"
    )
    if n_total == 0 or n_in == 0:
        return empty

    # level-1 candidates: the single unit (per dim) containing all input
    # outliers, if any; double bins span the OUTLIERS' range
    unit_cols, cand_units = [], {}
    for a in discrete_attrs:
        u = F.col(a).cast("string")
        unit_cols.append(F.when(u.isNotNull() & (u != "null"), u).alias(f"__u_{a}"))
        if (
            stats[f"__d_{a}"] == 1
            and stats[f"__v_{a}"] is not None
            and stats[f"__nu_{a}"] == 0
        ):
            cand_units[a] = str(stats[f"__v_{a}"])
    for a in double_attrs:
        lo, hi = stats[f"__lo_{a}"], stats[f"__hi_{a}"]
        if lo is None:
            continue
        lo, hi = float(lo), float(hi)
        step = (hi - lo) / num_intervals
        v = F.col(a).cast("double")
        if step == 0.0:
            b = F.when(
                (v >= F.lit(lo)) & (v < F.lit(hi + 0.000001)),
                F.lit(num_intervals - 1),
            )
        else:
            # all outliers share a unit only when the range collapses to
            # one bin; still compute the bin column for full-data contexts
            b = F.when(
                (v >= F.lit(lo)) & (v < F.lit(hi + 0.000001)),
                F.least(
                    F.greatest(F.floor((v - F.lit(lo)) / F.lit(step)).cast("int"), F.lit(0)),
                    F.lit(num_intervals - 1),
                ),
            )
        unit_cols.append(F.when(v.isNotNull(), b.cast("string")).alias(f"__u_{a}"))
        if step == 0.0 and stats[f"__nu_{a}"] == 0:
            cand_units[a] = str(num_intervals - 1)
    cand_dims = [d for d in dims if d in cand_units]
    if not cand_dims:
        return empty

    base = marked.select(
        F.col(id_col),
        F.col(metric_col).cast("double").alias("__m"),
        F.col("__is_in"),
        *unit_cols,
    ).localCheckpoint()
    ucols = [f"__u_{a}" for a in dims]

    # exact counts for every conjunction of candidate units (<= 2^|cand|)
    subsets = [
        s
        for k in range(1, min(max_predicates, len(cand_dims)) + 1)
        for s in combinations(cand_dims, k)
    ]
    caggs = []
    for j, s in enumerate(subsets):
        ind = F.lit(True)
        for d in s:
            ind = ind & (F.col(f"__u_{d}") == F.lit(cand_units[d]))
        caggs.append(F.sum(F.when(ind, 1).otherwise(0)).alias(f"c{j}"))
    crow = base.agg(*caggs).collect()[0]
    counts = {
        tuple(s): {tuple(cand_units[d] for d in s): crow[f"c{j}"]}
        for j, s in enumerate(subsets)
        if crow[f"c{j}"] / n_total >= tau
    }
    lattice = dense_context_lattice(
        counts, n_total, dims,
        tau=tau, max_predicates=max_predicates,
        dependency_pruning=dependency_pruning,
    )
    if not lattice:
        return empty
    scored = _score_contexts(
        spark, base, dims, ucols, id_col, lattice,
        include_global=False, approx=approx, carry_cols=["__is_in"],
    )
    if scored is None:
        return empty
    per_ctx = scored.groupBy("context", "level", "context_size").agg(
        F.sum(F.when(F.col("score") > F.lit(threshold), 1).otherwise(0)).alias(
            "n_outliers"
        ),
        F.sum(
            F.when(
                (F.col("score") > F.lit(threshold)) & (F.col("__is_in") == 1), 1
            ).otherwise(0)
        ).alias("__in_flagged"),
    )
    return per_ctx.where(F.col("__in_flagged") == F.lit(int(n_in))).select(
        "context",
        "level",
        F.col("context_size").cast("long").alias("context_size"),
        F.col("n_outliers").cast("long").alias("n_outliers"),
    )


# ===========================================================================
# registered query + full SQL-replay oracle
# ===========================================================================

_TAU = 0.04
_BINS = 4
_THRESH = 3.0

_CONTEXTUAL_ORACLE = f"""
WITH p AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS n,
         CAST(MIN(user_id) AS DOUBLE) AS lo,
         CAST(MAX(user_id) AS DOUBLE) AS hi
  FROM events
),
u AS (
  SELECT event_id, value,
         event_type,
         CAST(LEAST(GREATEST(CAST(FLOOR((CAST(user_id AS DOUBLE) - p.lo)
                / ((p.hi - p.lo) / {_BINS})) AS INT), 0), {_BINS - 1}) AS VARCHAR)
           AS ubin
  FROM events, p
),
l1d AS (
  SELECT event_type AS k, COUNT(*) AS cnt FROM u
  WHERE event_type IS NOT NULL AND event_type <> 'null'
  GROUP BY 1 HAVING CAST(COUNT(*) AS DOUBLE) / (SELECT n FROM p) >= {_TAU}
),
l1b AS (
  SELECT ubin AS k, COUNT(*) AS cnt FROM u
  GROUP BY 1 HAVING CAST(COUNT(*) AS DOUBLE) / (SELECT n FROM p) >= {_TAU}
),
l2 AS (
  SELECT event_type, ubin, COUNT(*) AS cnt FROM u
  WHERE event_type IS NOT NULL AND event_type <> 'null'
  GROUP BY 1, 2 HAVING CAST(COUNT(*) AS DOUBLE) / (SELECT n FROM p) >= {_TAU}
),
l2k AS (
  SELECT l2.* FROM l2
  JOIN l1d ON l2.event_type = l1d.k
  JOIN l1b ON l2.ubin = l1b.k
  WHERE l2.cnt <> l1d.cnt AND l2.cnt <> l1b.cnt
),
ctx AS (
  SELECT 'global' AS context, 0 AS level, event_id, value FROM u
  UNION ALL
  SELECT 'event_type=' || k, 1, event_id, value
  FROM u JOIN l1d ON u.event_type = l1d.k
  UNION ALL
  SELECT 'user_id=' || k, 1, event_id, value
  FROM u JOIN l1b ON u.ubin = l1b.k
  UNION ALL
  SELECT 'event_type=' || l2k.event_type || ',user_id=' || l2k.ubin, 2,
         event_id, value
  FROM u JOIN l2k ON u.event_type = l2k.event_type AND u.ubin = l2k.ubin
),
med AS (
  SELECT context, QUANTILE_CONT(value, 0.5) AS med, COUNT(*) AS csize
  FROM ctx GROUP BY 1
),
mad AS (
  SELECT ctx.context, QUANTILE_CONT(ABS(value - med), 0.5) AS mad
  FROM ctx JOIN med USING (context) GROUP BY 1
)
SELECT ctx.context,
       CAST(ctx.level AS INT) AS level,
       ctx.event_id,
       ROUND(ABS(ctx.value - med.med) / mad.mad, 6) AS score,
       CAST(med.csize AS BIGINT) AS context_size
FROM ctx
JOIN med USING (context)
JOIN mad USING (context)
WHERE ABS(ctx.value - med.med) / mad.mad > {_THRESH}
ORDER BY context, event_id
"""


@register("contextual_outliers_events", _CONTEXTUAL_ORACLE)
def contextual_outliers_events(spark, sf_dir: str) -> DataFrame:
    """All contextual outliers over events: metric = value, contexts =
    conjunctions of (event_type) x (user_id in 4 equal-width bins), dense
    at tau=0.04, MAD score > 3 per context — the full detector (lattice,
    dependency pruning, per-context MAD) replayed end-to-end in the
    oracle SQL."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    res = contextual_outliers(
        ev,
        "value",
        ["event_type"],
        ["user_id"],
        id_col="event_id",
        tau=_TAU,
        num_intervals=_BINS,
        max_predicates=2,
        threshold=_THRESH,
    )
    return res.select(
        "context",
        F.col("level").cast("int").alias("level"),
        "event_id",
        F.round("score", 6).alias("score"),
        F.col("context_size").cast("long").alias("context_size"),
    )


# Interface 2: probes = the first-20-event error rows shifted +400 in the
# metric, so the dense context event_type=error must flag every probe
_CTX2_ORACLE = f"""
WITH m AS (
  SELECT event_id, event_type,
         value + CASE WHEN event_id < 20 AND event_type = 'error'
                      THEN 400.0 ELSE 0.0 END AS mm,
         CASE WHEN event_id < 20 AND event_type = 'error' THEN 1 ELSE 0 END
           AS is_in
  FROM events
),
p AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n, SUM(is_in) AS n_in FROM m),
cand AS (
  -- the single candidate unit: all probes share event_type='error'
  -- (count_distinct over probes = 1), re-checked dense on the full data
  SELECT event_type AS k, COUNT(*) AS cnt FROM m
  WHERE event_type = (SELECT MIN(event_type) FROM m WHERE is_in = 1)
    AND 1 = (SELECT COUNT(DISTINCT event_type) FROM m WHERE is_in = 1)
  GROUP BY 1
  HAVING CAST(COUNT(*) AS DOUBLE) / (SELECT n FROM p) >= {_TAU}
),
ctx AS (
  SELECT 'event_type=' || cand.k AS context, m.event_id, m.mm, m.is_in
  FROM m JOIN cand ON m.event_type = cand.k
),
med AS (
  SELECT context, QUANTILE_CONT(mm, 0.5) AS med, COUNT(*) AS csize
  FROM ctx GROUP BY 1
),
mad AS (
  SELECT ctx.context, QUANTILE_CONT(ABS(mm - med), 0.5) AS mad
  FROM ctx JOIN med USING (context) GROUP BY 1
),
scored AS (
  SELECT ctx.context, med.csize,
         CASE WHEN ABS(ctx.mm - med.med) / mad.mad > {_THRESH} THEN 1 ELSE 0
           END AS flagged,
         ctx.is_in
  FROM ctx JOIN med USING (context) JOIN mad USING (context)
)
SELECT context,
       CAST(1 AS INT) AS level,
       CAST(MAX(csize) AS BIGINT) AS context_size,
       CAST(SUM(flagged) AS BIGINT) AS n_outliers
FROM scored
GROUP BY context
HAVING SUM(CASE WHEN flagged = 1 AND is_in = 1 THEN 1 ELSE 0 END)
         = (SELECT n_in FROM p)
ORDER BY context
"""


@register("contextual_context_search_events", _CTX2_ORACLE)
def contextual_context_search_events(spark, sf_dir: str) -> DataFrame:
    """Interface 2 (searchContextGivenOutliers): given the planted probe
    rows (first-20-event errors, metric shifted +400), find every dense
    context in which ALL of them are MAD outliers — the oracle replays the
    candidate construction, density re-check, and per-context MAD gate."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    probe = (F.col("event_id") < 20) & (F.col("event_type") == "error")
    shifted = ev.withColumn(
        "mm", F.col("value") + F.when(probe, F.lit(400.0)).otherwise(F.lit(0.0))
    )
    res = contextual_search_given_outliers(
        shifted,
        "mm",
        ["event_type"],
        [],
        id_col="event_id",
        outlier_predicate=probe,
        tau=_TAU,
        num_intervals=_BINS,
        threshold=_THRESH,
    )
    return res.select(
        "context",
        F.col("level").cast("int").alias("level"),
        "context_size",
        "n_outliers",
    )

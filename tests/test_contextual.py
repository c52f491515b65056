"""Contextual outlier detection vs a literal numpy mirror of the reference
(contrib .../contextualoutlier/ContextualOutlierDetector.java), plus the
reference's own unit-test shapes (ContextualOutlierDetectorTest.java)."""

import math
from itertools import combinations

import numpy as np
import pytest
from pyspark.sql import functions as F

from macrobase_spark.operators.contextual import contextual_outliers


def _mad_outliers(vals: np.ndarray, threshold: float):
    """Legacy MAD.java:38-97 + StaticThresholdClassifier.java:32-36."""
    m = np.sort(vals)
    n = len(m)
    med = (m[n // 2 - 1] + m[n // 2]) / 2 if n % 2 == 0 else m[n // 2]
    r = np.sort(np.abs(m - med))
    mad = (r[n // 2 - 1] + r[n // 2]) / 2 if n % 2 == 0 else r[n // 2]
    if mad == 0:
        lo, hi = int(n * 0.05), int(n * 0.95)
        mad = float(np.mean(r[lo:hi]))
    score = np.abs(vals - med) / mad
    return score > threshold, score


def brute_force(
    ids, metric, discrete, doubles, *, tau, num_intervals, max_predicates, threshold,
    dependency_pruning=True,
):
    """Literal replay: exact dense lattice (the detector's own realDensity
    re-check at :426-430), prefix joins, exact dependency pruning, MAD +
    static threshold per context, global context included.
    Returns {context_label: set(outlier ids)}."""
    n = len(ids)
    dims = list(discrete) + list(doubles)
    units = {}
    for d, col in discrete.items():
        units[d] = np.array([None if v is None or v == "null" else str(v) for v in col], dtype=object)
    for d, col in doubles.items():
        v = np.asarray(col, dtype=float)
        lo, hi = v.min(), v.max()
        step = (hi - lo) / num_intervals
        if step == 0:
            b = np.full(n, num_intervals - 1)
        else:
            b = np.clip(np.floor((v - lo) / step).astype(int), 0, num_intervals - 1)
        units[d] = np.array([str(x) for x in b], dtype=object)
    metric = np.asarray(metric, dtype=float)
    ids = np.asarray(ids)

    def members(ctx):
        mask = np.ones(n, dtype=bool)
        for d, u in ctx:
            mask &= units[d] == u
        return mask

    out = {}
    flags, _ = _mad_outliers(metric, threshold)
    if flags.any():
        out["global"] = set(ids[flags])
    # level 1
    level = []
    for d in dims:
        for u in sorted({x for x in units[d] if x is not None}):
            mask = units[d] == u
            if mask.sum() / n >= tau:
                level.append(((d, u),))
    surv = list(level)
    for ctx in level:
        mask = members(ctx)
        flags, _ = _mad_outliers(metric[mask], threshold)
        if flags.any():
            out[",".join(f"{d}={u}" for d, u in ctx)] = set(ids[mask][flags])
    k = 2
    while k <= max_predicates and surv:
        nxt = []
        seen = set()
        for c1 in surv:
            for c2 in surv:
                if c1[:-1] != c2[:-1]:
                    continue
                d1, d2 = c1[-1][0], c2[-1][0]
                if dims.index(d1) >= dims.index(d2):
                    continue
                cand = c1[:-1] + (c1[-1], c2[-1])
                if cand in seen:
                    continue
                seen.add(cand)
                mask = members(cand)
                if mask.sum() / n < tau:
                    continue
                if dependency_pruning and (
                    mask.sum() == members(c1).sum() or mask.sum() == members(c2).sum()
                ):
                    continue
                nxt.append(cand)
        for ctx in sorted(nxt):
            mask = members(ctx)
            flags, _ = _mad_outliers(metric[mask], threshold)
            if flags.any():
                out[",".join(f"{d}={u}" for d, u in ctx)] = set(ids[mask][flags])
        surv = nxt
        k += 1
    return out


def _spark_result(spark, ids, metric, discrete, doubles, **kw):
    cols = {"rid": [int(i) for i in ids], "m": [float(v) for v in metric]}
    cols.update({d: list(v) for d, v in discrete.items()})
    cols.update({d: [float(x) for x in v] for d, v in doubles.items()})
    names = list(cols)
    rows = list(zip(*[cols[c] for c in names]))
    schema = ", ".join(
        f"{c} {'long' if c == 'rid' else 'double' if c == 'm' or c in doubles else 'string'}"
        for c in names
    )
    df = spark.createDataFrame(rows, schema)
    res = contextual_outliers(
        df, "m", list(discrete), list(doubles), id_col="rid", **kw
    ).collect()
    got = {}
    for r in res:
        got.setdefault(r["context"], set()).add(r["rid"])
    return got


def test_reference_discrete_shape(spark):
    """ContextualOutlierDetectorTest.testContextualDiscreteAttribute:
    exactly one context explains, C1=1."""
    ids = list(range(100))
    metric = [float(i) for i in ids]
    c1 = ["1" if i < 5 else "2" if i < 50 else "1" for i in ids]
    got = _spark_result(
        spark, ids, metric, {"C1": c1}, {},
        tau=0.4, num_intervals=10, threshold=3.0,
    )
    exp = brute_force(
        np.array(ids), metric, {"C1": c1}, {},
        tau=0.4, num_intervals=10, max_predicates=1, threshold=3.0,
    )
    assert got == exp
    assert set(got) == {"C1=1"}


def test_reference_double_shape(spark):
    """testContextualDoubleAttribute shape: the same bimodal column as a
    binned double attribute."""
    ids = list(range(100))
    metric = [float(i) for i in ids]
    c1 = [1.0 if i < 5 else 2.0 if i < 50 else 1.0 for i in ids]
    got = _spark_result(
        spark, ids, metric, {}, {"C1": c1},
        tau=0.4, num_intervals=10, threshold=3.0,
    )
    exp = brute_force(
        np.array(ids), metric, {}, {"C1": c1},
        tau=0.4, num_intervals=10, max_predicates=1, threshold=3.0,
    )
    assert got == exp


def test_randomized_matches_brute_force(spark):
    """Seeded random tables: full (global + level-1 + level-2) outlier sets
    equal the literal mirror, dependency pruning on."""
    rng = np.random.default_rng(11)
    n = 400
    ids = np.arange(n)
    metric = np.round(rng.normal(50, 10, n), 2)
    metric[rng.choice(n, 12, replace=False)] += 200  # planted spikes
    disc = {"a": [str(x) for x in rng.choice(["x", "y", "z"], n)]}
    dbl = {"b": rng.uniform(0, 100, n).round(3)}
    kw = dict(tau=0.1, num_intervals=3, max_predicates=2, threshold=3.0)
    got = _spark_result(spark, ids, metric, disc, dbl, **kw)
    exp = brute_force(ids, metric, disc, dbl, **kw)
    assert got == exp
    assert any(k.count("=") == 2 for k in got)  # level-2 contexts exercised


def test_dependency_pruning_drops_implied_context(spark):
    """Planted implication a=>bin0: the joined (a, bin) context has the same
    members as its parent and must be pruned (Context.dependencyPruning)."""
    rng = np.random.default_rng(3)
    n = 200
    ids = np.arange(n)
    c1 = np.array(["a" if i < 100 else "b" for i in range(n)])
    c2 = np.where(c1 == "a", 10.0, 90.0)  # C1 fully determines the bin
    metric = np.round(rng.normal(0, 1, n), 3)
    metric[:3] += 50
    kw = dict(tau=0.3, num_intervals=2, max_predicates=2, threshold=3.0)
    got = _spark_result(spark, ids, metric, {"c1": list(c1)}, {"c2": c2}, **kw)
    exp = brute_force(ids, metric, {"c1": list(c1)}, {"c2": c2}, **kw)
    assert got == exp
    assert not any(k.count("=") == 2 for k in got)  # all joins pruned
    # and without dependency pruning the joined contexts DO appear
    kw["dependency_pruning"] = False
    got2 = _spark_result(spark, ids, metric, {"c1": list(c1)}, {"c2": c2}, **kw)
    exp2 = brute_force(ids, metric, {"c1": list(c1)}, {"c2": c2}, **kw)
    assert got2 == exp2
    assert any(k.count("=") == 2 for k in got2)


def test_mad_zero_trimmed_fallback(spark):
    """Majority-constant metric: MAD=0 -> 5% trimmed mean of residuals
    (legacy MAD.java:74-85)."""
    n = 100
    ids = np.arange(n)
    metric = np.full(n, 5.0)
    metric[:8] = [5.1, 5.2, 4.9, 4.8, 5.05, 5.3, 200.0, -190.0]
    got = _spark_result(
        spark, ids, metric, {"c": ["u"] * n}, {},
        tau=0.5, num_intervals=10, threshold=3.0,
    )
    exp = brute_force(
        ids, metric, {"c": ["u"] * n}, {},
        tau=0.5, num_intervals=10, max_predicates=1, threshold=3.0,
    )
    assert got == exp
    # trimmed-mean MAD is tiny (~0.0028), so every deviant flags
    assert got["global"] == set(range(8))


def test_distribution_pruning_deterministic(spark):
    """With distribution pruning on, a child context whose metric
    distribution matches its parent's is dropped from the output, and two
    runs agree exactly (seeded-hash sample, unlike the reference's unseeded
    reservoir)."""
    rng = np.random.default_rng(5)
    n = 600
    ids = np.arange(n)
    # c1=x and c1=y share the metric distribution; c1=z is shifted
    c1 = np.array(["x"] * 200 + ["y"] * 200 + ["z"] * 200)
    metric = np.concatenate(
        [rng.normal(0, 1, 400), rng.normal(30, 1, 200)]
    ).round(3)
    metric[[0, 250, 450]] += 25
    kw = dict(
        tau=0.2, num_intervals=2, max_predicates=1, threshold=3.0,
        distribution_pruning=True,
    )
    got1 = _spark_result(spark, ids, metric, {"c1": list(c1)}, {}, **kw)
    got2 = _spark_result(spark, ids, metric, {"c1": list(c1)}, {}, **kw)
    assert got1 == got2
    # x and y match the global distribution closely enough to prune at the
    # sampled KS; z (shifted +30) must survive
    assert not {"c1=x", "c1=y"} & set(got1)
    full = _spark_result(
        spark, ids, metric, {"c1": list(c1)}, {},
        tau=0.2, num_intervals=2, max_predicates=1, threshold=3.0,
    )
    assert {"c1=x", "c1=y"} & set(full)


def test_search_given_outliers(spark):
    """Interface 2: the dense context sharing all probes' unit qualifies
    iff every probe is a MAD outlier inside it; global is never returned
    (the reference's List.contains(List) check)."""
    rng = np.random.default_rng(9)
    n = 300
    rows = []
    for i in range(n):
        if i < 10:
            rows.append((i, "a", "q", 100.0))
        elif i < 150:
            rows.append((i, "a", "p", round(float(rng.normal(0, 1)), 3)))
        else:
            rows.append((i, "b", "p", round(float(rng.normal(0, 1)), 3)))
    df = spark.createDataFrame(rows, "rid long, c1 string, c2 string, m double")
    from macrobase_spark.operators.contextual import (
        contextual_search_given_outliers,
    )

    res = contextual_search_given_outliers(
        df, "m", ["c1", "c2"], [], id_col="rid",
        outlier_predicate="c2 = q", tau=0.4, num_intervals=10, threshold=3.0,
    ).collect()
    # c2=q is a candidate but not dense (10/300); c1=a is dense and flags
    # all ten probes (|100 - med| / MAD >> 3)
    assert [(r["context"], r["level"]) for r in res] == [("c1=a", 1)]
    assert res[0]["context_size"] == 150
    # non-extreme probes: the same context no longer qualifies
    df2 = df.withColumn("m", F.when(F.col("c2") == "q", 0.5).otherwise(F.col("m")))
    res2 = contextual_search_given_outliers(
        df2, "m", ["c1", "c2"], [], id_col="rid",
        outlier_predicate="c2 = q", tau=0.4, num_intervals=10, threshold=3.0,
    ).collect()
    assert res2 == []


def test_contextual_explain_grouped(spark):
    """Per-context order-1 summarization: the planted attribute dominates
    the outliers of the context it was planted in."""
    rng = np.random.default_rng(13)
    n = 400
    rows = []
    for i in range(n):
        grp = "a" if i < 200 else "b"
        dev = "ios" if i % 2 == 0 else "android"
        m = round(float(rng.normal(0, 1)), 3)
        if grp == "a" and dev == "ios" and i < 40:
            m += 60.0  # planted: context a's outliers are ios
        rows.append((i, grp, dev, m))
    df = spark.createDataFrame(rows, "rid long, grp string, dev string, m double")
    from macrobase_spark.operators.contextual import contextual_explain

    res = contextual_explain(
        df, "m", ["grp"], [], id_col="rid", attributes=["dev"],
        tau=0.4, num_intervals=10, threshold=3.0,
        min_support=0.5, min_ratio_metric=1.5,
    ).collect()
    hot = [r for r in res if r["context"] == "grp=a"]
    assert hot and all(r["value"] == "ios" for r in hot)


def test_contextual_pipeline_config(spark, tmp_path):
    """BasicContextualBatchedPipeline runs from a reference-style config
    (dotted ContextualConf keys accepted)."""
    rng = np.random.default_rng(17)
    n = 300
    rows = [
        (
            int(i),
            "x" if i < 150 else "y",
            "ios" if i % 2 == 0 else "android",
            round(float(rng.normal(0, 1)), 3) + (50.0 if i < 6 else 0.0),
        )
        for i in range(n)
    ]
    df = spark.createDataFrame(rows, "rid long, c1 string, dev string, m double")
    path = str(tmp_path / "ctx_pipe.parquet")
    df.write.mode("overwrite").parquet(path)
    from macrobase_spark.pipelines import run_config

    conf = {
        "pipeline": "BasicContextualBatchedPipeline",
        "inputURI": f"parquet://{path}",
        "metric": "m",
        "idColumn": "rid",
        "macrobase.analysis.contextual.discreteAttributes": ["c1"],
        "macrobase.analysis.contextual.denseContextTau": 0.4,
        "macrobase.analysis.contextual.numIntervals": 10,
        "cutoff": 3.0,
        "attributes": ["dev"],
        "minSupport": 0.1,
        "minRatioMetric": 0.0,
    }
    res = run_config(spark, conf)
    outs = res.classified.collect()
    assert {r["context"] for r in outs} >= {"global", "c1=x"}
    assert all(r["score"] > 3.0 for r in outs)
    exp = res.explanation.collect()
    assert {r["context"] for r in exp} and "attribute" in res.explanation.columns
    # Interface 2 through the config surface
    conf2 = {
        **conf,
        "macrobase.analysis.contextual.api": "findContextsGivenOutlierPredicate",
        "macrobase.analysis.contextual.api.outlierPredicates": "dev = ios",
    }
    res2 = run_config(spark, conf2)
    assert res2.classified.columns == ["context", "level", "context_size", "n_outliers"]


def test_null_units_never_form_contexts(spark):
    """Discrete null / 'null' values are not interesting intervals
    (detector.isInterestingInterval:561-572)."""
    n = 100
    ids = np.arange(n)
    metric = np.arange(n, dtype=float)
    c1 = ["null"] * 50 + [None] * 25 + ["ok"] * 25
    got = _spark_result(
        spark, ids, metric, {"c1": c1}, {},
        tau=0.2, num_intervals=10, threshold=2.5,
    )
    assert all(k == "global" or k == "c1=ok" for k in got)

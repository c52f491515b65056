"""Metric bucketing, random classifier, min-max normalize, grid search."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from macrobase_spark.functions.search import grid_search
from macrobase_spark.operators.classify import (
    metric_bucket_transform,
    min_max_normalize,
    random_classify,
)
from macrobase_spark.functions.evaluation import roc_auc
from macrobase_spark.operators.detectors import fit_isolation_forest, iforest_scores


def test_metric_bucket_transform(spark):
    df = spark.createDataFrame([(float(i),) for i in range(100)], ["v"])
    out = metric_bucket_transform(df, "v", approx=False)
    got = {r["v"]: r["v_bucket"] for r in out.collect()}
    # three buckets at the 10/90 percentile boundaries
    assert len(set(got.values())) == 3
    assert got[0.0].startswith("[-inf")
    assert got[50.0].startswith("[9.9")
    assert got[99.0].endswith("inf)")
    # bucket labels usable as explanation attributes: deterministic
    out2 = {r["v"]: r["v_bucket"] for r in metric_bucket_transform(df.repartition(7), "v", approx=False).collect()}
    assert got == out2


def test_random_classify_deterministic(spark):
    df = spark.createDataFrame([(i,) for i in range(1000)], ["i"]).repartition(4, "i")
    a = {r["i"]: r["_OUTLIER"] for r in random_classify(df, seed=7, threshold=0.9).collect()}
    b = {r["i"]: r["_OUTLIER"] for r in random_classify(df, seed=7, threshold=0.9).collect()}
    assert a == b
    rate = sum(a.values()) / len(a)
    assert 0.05 < rate < 0.15


def test_min_max_normalize(spark):
    df = spark.createDataFrame([(x,) for x in [-5.0, 0.0, 5.0]], ["v"])
    got = sorted(r["v"] for r in min_max_normalize(df, "v").collect())
    assert got == [0.0, 0.5, 1.0]


def test_grid_search_orders_results():
    rng = np.random.default_rng(3)
    X = np.vstack([rng.normal(0, 1, (500, 3)), rng.uniform(-7, 7, (25, 3))])
    y = np.r_[np.zeros(500, dtype=int), np.ones(25, dtype=int)]

    def run(params):
        m = fit_isolation_forest(X, n_trees=params["n_trees"], subsample=params["subsample"], seed=1)
        return roc_auc(iforest_scores(m, X), y)

    res = grid_search({"n_trees": [5, 50], "subsample": [32, 256]}, run)
    assert len(res) == 4
    scores = [s for _, s in res]
    assert scores == sorted(scores, reverse=True)
    assert scores[0] > 0.85


def test_memory_profiler(spark):
    from macrobase_spark.functions.profiler import MemoryProfiler

    prof = MemoryProfiler(spark)
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    report = prof.peak()
    assert report["driver_peak_rss_mb"] > 10
    assert report["driver_delta_mb"] >= 0
    assert isinstance(report.get("executors", []), list)

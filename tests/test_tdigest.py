"""t-digest: accuracy vs exact quantiles, exact-merge property, and the
distributed two-phase aggregation."""

import numpy as np
import pytest

from macrobase_spark.functions.tdigest import TDigest, tdigest_quantiles


def test_accuracy_vs_exact():
    rng = np.random.default_rng(0)
    x = rng.lognormal(3.0, 1.0, size=200_000)
    d = TDigest.of(x)
    for q in [0.01, 0.1, 0.5, 0.9, 0.99, 0.999]:
        exact = np.quantile(x, q)
        got = d.quantile(q)
        # rank error: the digest's value sits within ~0.3% rank of exact
        rank = (x <= got).mean()
        assert abs(rank - q) < 0.003, (q, got, exact, rank)


def test_merge_equals_whole():
    rng = np.random.default_rng(1)
    x = rng.normal(0, 1, size=120_000)
    parts = np.array_split(x, 13)
    merged = TDigest.merge([TDigest.of(p) for p in parts])
    whole = TDigest.of(x)
    for q in [0.01, 0.25, 0.5, 0.75, 0.99]:
        rank_m = (x <= merged.quantile(q)).mean()
        rank_w = (x <= whole.quantile(q)).mean()
        assert abs(rank_m - q) < 0.005
        assert abs(rank_w - q) < 0.005


def test_distributed_two_phase(spark):
    rng = np.random.default_rng(2)
    vals = rng.exponential(10.0, size=50_000)
    df = spark.createDataFrame([(float(v),) for v in vals], ["v"]).repartition(16)
    got = tdigest_quantiles(df, "v", [0.5, 0.95])
    assert abs((vals <= got[0.5]).mean() - 0.5) < 0.01
    assert abs((vals <= got[0.95]).mean() - 0.95) < 0.01


def test_distributed_grouped(spark):
    rows = [("a", float(i)) for i in range(1000)] + [("b", float(1000 + i)) for i in range(1000)]
    df = spark.createDataFrame(rows, ["g", "v"]).repartition(8)
    got = tdigest_quantiles(df, "v", [0.5], group_col="g")
    assert got["a"][0.5] == pytest.approx(499.5, abs=15)
    assert got["b"][0.5] == pytest.approx(1499.5, abs=15)


def test_edge_cases():
    assert np.isnan(TDigest.of(np.array([])).quantile(0.5))
    assert TDigest.of(np.array([42.0])).quantile(0.99) == 42.0
    d = TDigest.of(np.array([1.0, 2.0]))
    assert 1.0 <= d.quantile(0.5) <= 2.0

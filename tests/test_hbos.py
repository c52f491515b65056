"""HBOS (dynamic-binwidth): uniform series scores zero, planted-outlier
recovery, agreement with an independent numpy reimplementation, and
Spark/DuckDB agreement of the registered query."""

import duckdb
import numpy as np
import pytest

from macrobase_spark.operators.hbos import hbos_scores
from macrobase_spark.queries import ORACLES, QUERIES

SF = "/root/testdata/sf0.01"


def test_uniform_series_scores_zero(spark):
    # 0..9 with n_bins=5: every bin holds mass .2 over equal width 1.8 ->
    # densities all equal the per-dim max -> every score is exactly 0
    df = spark.createDataFrame(
        [(i, [float(i)]) for i in range(10)], "vec_id long, embedding array<double>"
    )
    got = {r["vec_id"]: r["_SCORE"] for r in hbos_scores(df, n_bins=5).collect()}
    for i in range(10):
        assert got[i] == pytest.approx(0.0, abs=1e-9)


def test_planted_outliers_rank_top(spark):
    rng = np.random.default_rng(5)
    base = rng.normal(0.0, 1.0, size=(300, 5))
    outs = rng.normal(0.0, 0.3, size=(4, 5)) + 9.0
    rows = [(i, [float(v) for v in r]) for i, r in enumerate(np.vstack([base, outs]))]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    top4 = [
        r["vec_id"]
        for r in hbos_scores(df).orderBy("_SCORE", ascending=False).limit(4).collect()
    ]
    assert set(top4) == {300, 301, 302, 303}


def test_matches_numpy_reimplementation(spark):
    rng = np.random.default_rng(9)
    X = rng.normal(0.0, 1.0, size=(200, 3)) ** 3  # skewed
    rows = [(i, [float(v) for v in r]) for i, r in enumerate(X)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {r["vec_id"]: r["_SCORE"] for r in hbos_scores(df, n_bins=10).collect()}
    want = np.zeros(len(X))
    n = len(X)
    for j in range(3):
        col = X[:, j]
        edges = np.percentile(col, np.arange(10, 100, 10))
        grid = np.concatenate([[col.min()], edges, [col.max()]])
        widths = np.maximum(np.diff(grid), 1e-12)
        bins = (col[:, None] > edges[None, :]).sum(axis=1)
        cnt = np.bincount(bins, minlength=10).astype(float)
        dens = cnt / n / widths
        want += np.log(dens[dens > 0].max()) - np.log(dens[bins])
    for i in range(n):
        assert got[i] == pytest.approx(want[i], abs=1e-8)


def test_registered_query_matches_oracle(spark):
    got = QUERIES["hbos_outliers_embeddings"](spark, SF).collect()
    want = duckdb.sql(ORACLES["hbos_outliers_embeddings"]).fetchall()
    assert len(got) == len(want) == 20
    for g, (vid, score) in zip(got, want):
        assert g["vec_id"] == vid
        assert g["score"] == pytest.approx(score, abs=1e-4)

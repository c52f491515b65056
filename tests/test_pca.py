"""PCA whitening: exact-fit equivalence vs numpy on collected data,
orthonormality, whitened covariance, reconstruction-error monotonicity,
and Spark/DuckDB agreement of the registered variance query."""

import duckdb
import numpy as np
import pytest

from macrobase_spark.operators.pca import (
    fit_pca,
    pca_model_parquet,
    pca_project,
)
from macrobase_spark.queries import ORACLES, QUERIES

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def fitted(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    mu, vals, W = fit_pca(emb)
    X = np.array([r["embedding"] for r in emb.select("embedding").collect()], dtype=np.float64)
    return mu, vals, W, X


def test_fit_matches_numpy(fitted):
    mu, vals, W, X = fitted
    assert mu == pytest.approx(X.mean(axis=0), abs=1e-9)
    cov = np.cov(X, rowvar=False)
    want = np.sort(np.linalg.eigvalsh(cov))[::-1]
    assert vals == pytest.approx(want, abs=1e-9)


def test_components_orthonormal(fitted):
    _, _, W, _ = fitted
    assert W @ W.T == pytest.approx(np.eye(W.shape[0]), abs=1e-9)


def test_whitened_covariance_is_identity(fitted):
    mu, vals, W, X = fitted
    keep = vals > 1e-12
    Z = (X - mu) @ W[keep].T / np.sqrt(vals[keep])
    assert np.cov(Z, rowvar=False) == pytest.approx(np.eye(int(keep.sum())), abs=1e-6)


def test_reconstruction_error_monotone(fitted):
    mu, _, W, X = fitted
    errs = []
    for k in (4, 16, 64):
        Z = (X - mu) @ W[:k].T
        R = Z @ W[:k] + mu
        errs.append(float(((X - R) ** 2).sum()))
    assert errs[0] > errs[1] > errs[2]
    assert errs[2] == pytest.approx(0.0, abs=1e-12)


def test_distributed_projection_matches_numpy(spark, fitted):
    mu, vals, W, X = fitted
    model_path = pca_model_parquet(spark, SF)
    model = spark.read.parquet(model_path)
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    got = {
        (r["vec_id"], r["comp"]): r["proj"]
        for r in pca_project(emb, model).collect()
    }
    ids = [r["vec_id"] for r in emb.select("vec_id").collect()]
    Z = (X - mu) @ W[:8].T
    for row, vid in enumerate(ids):
        for c in range(8):
            assert got[(vid, c)] == pytest.approx(Z[row, c], abs=1e-9)


def test_registered_query_matches_oracle(spark):
    got = {r["comp"]: r for r in QUERIES["pca_variance_embeddings"](spark, SF).collect()}
    want = duckdb.sql(ORACLES["pca_variance_embeddings"]).fetchall()
    assert len(got) == len(want) == 8
    for comp, eigval, var_ratio, realized, max_abs in want:
        r = got[comp]
        assert r["eigval"] == pytest.approx(eigval, abs=1e-6)
        assert r["var_ratio"] == pytest.approx(var_ratio, abs=1e-6)
        assert r["realized_var"] == pytest.approx(realized, abs=1e-5)
        assert r["max_abs_proj"] == pytest.approx(max_abs, abs=1e-4)
        # the fit's promise: projections realize the eigenvalue variance
        assert r["realized_var"] == pytest.approx(r["eigval"], rel=1e-3)

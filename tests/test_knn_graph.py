"""kNN graph: agreement with a numpy reference, self-exclusion,
quadratic-bound guard, and Spark/DuckDB agreement of the registered query."""

import duckdb
import numpy as np
import pytest

from macrobase_spark.operators.similarity import knn_graph
from macrobase_spark.queries import ORACLES, QUERIES

SF = "/root/testdata/sf0.01"


def test_matches_numpy_reference(spark):
    rng = np.random.default_rng(4)
    X = rng.normal(size=(60, 8))
    rows = [(i, [float(v) for v in r]) for i, r in enumerate(X)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {}
    for r in knn_graph(df, k=3).collect():
        got.setdefault(r["vec_id"], []).append((r["rnk"], r["nbr_id"]))
    U = X / np.linalg.norm(X, axis=1, keepdims=True)
    S = U @ U.T
    np.fill_diagonal(S, -np.inf)
    for i in range(60):
        order = sorted(range(60), key=lambda j: (-S[i, j], j))[:3]
        assert [n for _, n in sorted(got[i])] == order


def test_self_excluded_and_guard(spark):
    df = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(10)], "vec_id long, embedding array<double>"
    )
    out = knn_graph(df, k=2).collect()
    assert all(r["vec_id"] != r["nbr_id"] for r in out)
    with pytest.raises(ValueError, match="quadratic"):
        knn_graph(df, k=2, max_rows=5)


def test_registered_query_matches_oracle(spark):
    got = sorted(
        (r["vec_id"], r["rnk"], r["nbr_id"], r["cos"])
        for r in QUERIES["knn_graph_embeddings"](spark, SF).collect()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{SF}/embeddings.parquet')"
    )
    want = sorted(con.execute(ORACLES["knn_graph_embeddings"]).fetchall())
    assert len(got) == len(want) == 500 * 5
    for g, w in zip(got, want):
        assert g[:3] == w[:3]
        assert g[3] == pytest.approx(w[3], abs=2e-6)

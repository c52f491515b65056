"""Connected components: hand-built graphs, long-chain convergence, a
union-find cross-check on a random graph, and Spark/DuckDB agreement of
the registered cluster query."""

import duckdb
import numpy as np
import pytest

from macrobase_spark.operators.components import (
    cluster_sizes,
    connected_components,
)
from macrobase_spark.queries import ORACLES, QUERIES

SF = "/root/testdata/sf0.01"


def _cc(spark, edges):
    df = spark.createDataFrame(edges, "doc_a long, doc_b long")
    return {r["node"]: r["rep"] for r in connected_components(df).collect()}


def test_two_components(spark):
    got = _cc(spark, [(1, 2), (2, 3), (5, 6)])
    assert got == {1: 1, 2: 1, 3: 1, 5: 5, 6: 5}


def test_long_chain_converges(spark):
    got = _cc(spark, [(i, i + 1) for i in range(20)])
    assert set(got.values()) == {0}
    assert len(got) == 21


def test_matches_union_find_on_random_graph(spark):
    rng = np.random.default_rng(3)
    edges = [
        (int(a), int(b))
        for a, b in rng.integers(0, 120, size=(150, 2))
        if a != b
    ]
    got = _cc(spark, edges)

    parent: dict[int, int] = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {n: find(n) for n in {v for e in edges for v in e}}
    assert got == want


def test_cluster_sizes(spark):
    df = spark.createDataFrame([(1, 2), (2, 3), (5, 6)], "doc_a long, doc_b long")
    got = {
        r["rep"]: r["size"]
        for r in cluster_sizes(connected_components(df)).collect()
    }
    assert got == {1: 3, 5: 2}


def test_registered_query_matches_oracle(spark):
    got = sorted(
        (r["rep"], r["size"])
        for r in QUERIES["dedup_clusters_documents"](spark, SF).collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF}/documents.parquet')"
    )
    want = sorted(con.execute(ORACLES["dedup_clusters_documents"]).fetchall())
    assert got == want
    assert len(got) > 0


def test_star_matches_min_label_on_random_graph(spark):
    from macrobase_spark.operators.components import connected_components_star

    rng = np.random.default_rng(8)
    edges = [
        (int(a), int(b))
        for a, b in rng.integers(0, 200, size=(220, 2))
        if a != b
    ]
    df = spark.createDataFrame(edges, "doc_a long, doc_b long")
    ml = {r["node"]: r["rep"] for r in connected_components(df).collect()}
    st = {r["node"]: r["rep"] for r in connected_components_star(df).collect()}
    assert st == ml


def test_star_closes_long_chain_in_few_rounds(spark):
    """A 300-node path has diameter 300 — min-label would need ~300
    rounds; the star alternation halves the stride per round and closes
    it in ceil(log2(300)) + 1 = 10 alternations."""
    from macrobase_spark.operators.components import connected_components_star

    chain = [(i, i + 1) for i in range(300)]
    df = spark.createDataFrame(chain, "doc_a long, doc_b long")
    got = {
        r["node"]: r["rep"]
        for r in connected_components_star(df, max_iter=10).collect()
    }
    assert set(got.values()) == {0}
    assert len(got) == 301

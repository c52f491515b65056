"""ANN variants: IVF recall vs the exact brute-force baseline."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from macrobase_spark.operators.similarity import brute_force_topk, ivf_topk, _kmeans


@pytest.fixture(scope="module")
def clustered(spark):
    """10 well-separated Gaussian clusters of 16-d vectors."""
    rng = np.random.default_rng(11)
    centers = rng.normal(0, 5, (10, 16))
    rows = []
    for i in range(3000):
        v = centers[i % 10] + rng.normal(0, 0.5, 16)
        rows.append((int(i), [float(x) for x in v]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_kmeans_separates_clusters():
    rng = np.random.default_rng(3)
    centers = rng.normal(0, 5, (4, 8))
    X = np.vstack([c + rng.normal(0, 0.3, (200, 8)) for c in centers])
    C = _kmeans(X, 4, seed=1)
    # every true center lands near some learned centroid (cosine > 0.95)
    Cn = C / np.linalg.norm(C, axis=1, keepdims=True)
    tn = centers / np.linalg.norm(centers, axis=1, keepdims=True)
    assert all((tn[i] @ Cn.T).max() > 0.95 for i in range(4))


def test_ivf_recall_vs_brute_force(spark, clustered):
    q = clustered.filter(F.col("vec_id") < 10)
    exact = brute_force_topk(clustered, q, "vec_id", "embedding", k=10).collect()
    approx = ivf_topk(
        clustered, q, "vec_id", "embedding", k=10, n_centroids=20, n_probe=4,
    ).collect()
    by_q_exact = {}
    for r in exact:
        by_q_exact.setdefault(r["query_id"], set()).add(r["nbr_id"])
    by_q_approx = {}
    for r in approx:
        by_q_approx.setdefault(r["query_id"], set()).add(r["nbr_id"])
    recalls = [
        len(by_q_exact[qid] & by_q_approx.get(qid, set())) / len(by_q_exact[qid])
        for qid in by_q_exact
    ]
    assert np.mean(recalls) >= 0.9  # same-cluster neighbors sit in probed lists

"""IVF-PQ: codebook quality, ADC approximation, recall with re-ranking,
partition invariance, and physical pruning of the on-disk code index."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from macrobase_spark.operators.pq import (
    _adc,
    _encode_matrix,
    _query_luts,
    fit_pq_codebooks,
    ivf_pq_build_index,
    ivf_pq_topk,
    pq_decode_matrix,
    pq_encode,
)
from macrobase_spark.operators.similarity import (
    _normalize,
    brute_force_topk,
    fit_ivf_centroids,
)


@pytest.fixture(scope="module")
def clustered(spark):
    """10 well-separated Gaussian clusters of 16-d vectors (the
    test_similarity fixture shape, independent draw)."""
    rng = np.random.default_rng(23)
    centers = rng.normal(0, 5, (10, 16))
    rows = []
    for i in range(3000):
        v = centers[i % 10] + rng.normal(0, 0.5, 16)
        rows.append((int(i), [float(x) for x in v]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_codes_reconstruct_better_than_centroid_mean(spark, clustered):
    """PQ reconstruction error must be far below the trivial quantizer
    (everything -> the global mean), i.e. the codebooks learned structure."""
    B = fit_pq_codebooks(clustered, "vec_id", "embedding", m=4, ks=16)
    pdf = clustered.limit(500).toPandas()
    X = _normalize(np.stack(pdf["embedding"].to_numpy()).astype(np.float64))
    codes = _encode_matrix(X, B)
    rec = pq_decode_matrix(codes.astype(np.int64), B)
    pq_err = float(((X - rec) ** 2).sum(axis=1).mean())
    mean_err = float(((X - X.mean(axis=0)) ** 2).sum(axis=1).mean())
    assert pq_err < 0.25 * mean_err


def test_adc_approximates_exact_dot(spark, clustered):
    """ADC(q, x) ~ <q, x>: correlation with the exact inner product is
    near-perfect on clustered data, and the float/int-LUT flavors agree to
    the quantization step."""
    B = fit_pq_codebooks(clustered, "vec_id", "embedding", m=4, ks=16)
    pdf = clustered.limit(400).toPandas()
    X = _normalize(np.stack(pdf["embedding"].to_numpy()).astype(np.float64))
    q = X[:3]
    codes = _encode_matrix(X, B).astype(np.int64)
    lut_f = _query_luts(q, B, None)
    lut_i = _query_luts(q, B, 1 << 20)
    for qi in range(3):
        exact = X @ q[qi]
        adc_f = _adc(lut_f[qi], codes)
        adc_i = _adc(lut_i[qi], codes) / (1 << 20)
        assert np.corrcoef(exact, adc_f)[0, 1] > 0.95
        # integer-LUT ADC is the float ADC to within m * (half quant step)
        assert np.abs(adc_f - adc_i).max() < 4 * 0.5 / (1 << 20) + 1e-12


@pytest.fixture(scope="module")
def neardup(spark):
    """Random 16-d corpus with 10 planted near-duplicates of each of the
    first 3 vectors — the regime PQ is FOR: true neighbors separated from
    the bulk by more than the quantization error. (Within a near-tie cloud
    — neighbors closer together than the reconstruction error — ADC cannot
    rank and only a refine >= tie-class size recovers exact top-k; that
    boundary is documented in the module docstring, not asserted here.)"""
    rng = np.random.default_rng(23)
    X = rng.normal(0, 1, (3000, 16))
    for qi in range(3):
        for j in range(10):
            X[1000 + 100 * qi + j] = X[qi] + rng.normal(0, 0.15, 16)
    rows = [(int(i), [float(x) for x in X[i]]) for i in range(len(X))]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_ivf_pq_recall_vs_brute_force(spark, neardup):
    """With exact re-ranking of a refine-sized shortlist, IVF-PQ recovers
    the true neighbors (the planted near-dups) exactly."""
    q = neardup.filter(F.col("vec_id") < 3)
    exact = brute_force_topk(neardup, q, "vec_id", "embedding", k=10).collect()
    approx = ivf_pq_topk(
        neardup, q, "vec_id", "embedding", k=10,
        n_centroids=20, n_probe=4, m=4, ks=16, refine=50,
    ).collect()
    by_q = {}
    for r in exact:
        by_q.setdefault(r["query_id"], set()).add(r["nbr_id"])
    by_a = {}
    for r in approx:
        by_a.setdefault(r["query_id"], set()).add(r["nbr_id"])
    recalls = [
        len(by_q[qid] & by_a.get(qid, set())) / len(by_q[qid]) for qid in by_q
    ]
    assert np.mean(recalls) >= 0.9
    # re-ranked cosines are EXACT for returned rows: spot-check vs brute force
    exact_cos = {(r["query_id"], r["nbr_id"]): r["cos"] for r in exact}
    hits = [r for r in approx if (r["query_id"], r["nbr_id"]) in exact_cos]
    assert hits and all(
        abs(exact_cos[(r["query_id"], r["nbr_id"])] - r["cos"]) < 2e-6 for r in hits
    )


def test_codes_partition_invariant(spark, clustered):
    """Encoding is a pure per-row function of the broadcast codebooks —
    identical codes at any parallelism."""
    B = fit_pq_codebooks(clustered, "vec_id", "embedding", m=4, ks=16)
    a = sorted(map(tuple, pq_encode(clustered, "vec_id", "embedding", B).collect()))
    b = sorted(
        map(
            tuple,
            pq_encode(clustered.repartition(17), "vec_id", "embedding", B).collect(),
        )
    )
    assert a == b


def test_ivf_pq_index_prunes_physically(spark, clustered, tmp_path):
    """The on-disk code index prunes at the scan (PartitionFilters on
    centroid) and returns the same rows as the inline relation; the probe
    filter is a Catalyst Filter above exactly one assignment pass."""
    q = clustered.filter(F.col("vec_id") < 5)
    C = fit_ivf_centroids(clustered, "vec_id", "embedding", 20)
    B = fit_pq_codebooks(clustered, "vec_id", "embedding", m=4, ks=16)

    res = ivf_pq_topk(
        clustered, q, "vec_id", "embedding", k=5,
        n_centroids=20, n_probe=3, m=4, ks=16, refine=30,
        centroids=C, codebooks=B,
    )
    plan = res._jdf.queryExecution().optimizedPlan().toString()
    assert "centroid" in plan and ("INSET" in plan or " IN " in plan), plan

    idx = str(tmp_path / "ivfpq_index")
    ivf_pq_build_index(clustered, "vec_id", "embedding", C, B, idx)
    res_idx = ivf_pq_topk(
        clustered, q, "vec_id", "embedding", k=5,
        n_centroids=20, n_probe=3, m=4, ks=16, refine=30,
        centroids=C, codebooks=B, index_path=idx,
    )
    physical = res_idx._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in physical and "centroid" in physical, physical

    got = sorted(map(tuple, res.collect()))
    got_idx = sorted(map(tuple, res_idx.collect()))
    assert got == got_idx and len(got) == 5 * 5

"""COPOD detector: hand-computed per-dim tail max on a tiny series,
planted-outlier recovery, divergence from ECOD on an opposite-tails
construction, and Spark/DuckDB agreement of the registered query."""

import math

import duckdb
import numpy as np
import pytest

from macrobase_spark.operators.copod import copod_scores
from macrobase_spark.operators.ecod import ecod_scores
from macrobase_spark.queries import ORACLES, QUERIES

SF = "/root/testdata/sf0.01"


def test_hand_computed_1d(spark):
    # values 1,2,3,100: p_l = k/4, p_r = (n-k+1)/4 on distinct values;
    # m3 > 0 -> right tail selected; O = max(u_r, (u_l+u_r)/2)
    df = spark.createDataFrame(
        [(i, [float(v)]) for i, v in enumerate([1.0, 2.0, 3.0, 100.0])],
        "vec_id long, embedding array<double>",
    )
    got = {r["vec_id"]: r["_SCORE"] for r in copod_scores(df).collect()}
    p_l = {0: 0.25, 1: 0.5, 2: 0.75, 3: 1.0}
    p_r = {0: 1.0, 1: 0.75, 2: 0.5, 3: 0.25}
    for i in range(4):
        u_l, u_r = -math.log(p_l[i]), -math.log(p_r[i])
        want = max(u_r, (u_l + u_r) / 2.0)
        assert got[i] == pytest.approx(want, abs=1e-12)
    assert max(got, key=got.get) == 3


def test_planted_outliers_rank_top(spark):
    rng = np.random.default_rng(11)
    base = rng.normal(0.0, 1.0, size=(200, 6))
    outs = rng.normal(0.0, 1.0, size=(5, 6)) - 8.0  # far lower tail
    rows = [(i, [float(v) for v in r]) for i, r in enumerate(np.vstack([base, outs]))]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    top5 = [
        r["vec_id"]
        for r in copod_scores(df).orderBy("_SCORE", ascending=False).limit(5).collect()
    ]
    assert set(top5) == {200, 201, 202, 203, 204}


def test_differs_from_ecod_on_opposite_tails(spark):
    """A point extreme LOW in dim 0 and HIGH in dim 1 — COPOD's per-dim
    max credits both tails; ECOD's sum-then-max must pick one side, so
    the two scores genuinely diverge (this is the semantic difference,
    not a reparametrization)."""
    rng = np.random.default_rng(3)
    base = rng.exponential(1.0, size=(300, 2))  # both dims right-skewed
    probe = np.array([[-6.0, 50.0]])  # below every base value / above every base value
    rows = [(i, [float(v) for v in r]) for i, r in enumerate(np.vstack([base, probe]))]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    c = {r["vec_id"]: r["_SCORE"] for r in copod_scores(df).collect()}
    e = {r["vec_id"]: r["_SCORE"] for r in ecod_scores(df).collect()}
    # For the probe: dim0 has u_l=ln(301), u_r=0; dim1 the reverse. With
    # both skews right, ECOD = max(ln n, ln n, 0 + ln n) = ln n, while
    # COPOD = max(0, ln n / 2) + max(ln n, ln n / 2) = 1.5 * ln n.
    u = math.log(301)
    assert e[300] == pytest.approx(u, abs=1e-9)
    assert c[300] == pytest.approx(1.5 * u, abs=1e-9)


def test_matches_numpy_reference(spark):
    """Independent per-value numpy reimplementation (tie-aware ECDFs,
    third-central-moment skew sign, per-dim max) must agree exactly."""
    rng = np.random.default_rng(5)
    X = np.concatenate(
        [rng.normal(0, 1, size=(60, 3)), rng.exponential(1.0, size=(20, 3))]
    )
    X[7, 1] = X[3, 1]  # plant exact ties so the tie convention is exercised
    X[19, 2] = X[2, 2]
    n, d = X.shape
    want = np.zeros(n)
    for j in range(d):
        v = X[:, j]
        p_l = np.array([(v <= x).sum() for x in v]) / n
        p_r = np.array([(v >= x).sum() for x in v]) / n
        u_l, u_r = -np.log(p_l), -np.log(p_r)
        u_skew = u_l if ((v - v.mean()) ** 3).sum() < 0 else u_r
        want += np.maximum(u_skew, (u_l + u_r) / 2.0)
    rows = [(i, [float(x) for x in r]) for i, r in enumerate(X)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {r["vec_id"]: r["_SCORE"] for r in copod_scores(df).collect()}
    for i in range(n):
        assert got[i] == pytest.approx(want[i], abs=1e-9)


def test_scores_invariant_under_monotone_transform(spark):
    """COPOD is rank-based like ECOD: strictly increasing per-dim
    transforms that preserve the skew sign leave every score exactly
    unchanged."""
    rng = np.random.default_rng(13)
    X = rng.gamma(2.0, size=(120, 4))
    for j in range(4):
        for Y in (X[:, j], X[:, j] ** 3):
            assert np.sum((Y - Y.mean()) ** 3) > 0
    rows = [(i, [float(v) for v in r]) for i, r in enumerate(X)]
    base = {
        r["vec_id"]: r["_SCORE"]
        for r in copod_scores(
            spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        ).collect()
    }
    rows_t = [(i, [float(v) ** 3 for v in r]) for i, r in enumerate(X)]
    trans = {
        r["vec_id"]: r["_SCORE"]
        for r in copod_scores(
            spark.createDataFrame(rows_t, "vec_id long, embedding array<double>")
        ).collect()
    }
    for i in base:
        assert trans[i] == pytest.approx(base[i], abs=1e-9)


def test_registered_query_matches_oracle(spark):
    got = QUERIES["copod_outliers_embeddings"](spark, SF).collect()
    want = duckdb.sql(ORACLES["copod_outliers_embeddings"]).fetchall()
    assert len(got) == len(want) == 20
    for g, (vid, score) in zip(got, want):
        assert g["vec_id"] == vid
        assert g["score"] == pytest.approx(score, abs=1e-4)

"""ECOD detector: hand-computed tail probabilities on a tiny series,
planted-outlier recovery, skew-direction behavior, and Spark/DuckDB
agreement of the registered query."""

import duckdb
import numpy as np
import pytest

from macrobase_spark.operators.ecod import ecod_scores
from macrobase_spark.queries import ORACLES, QUERIES

SF = "/root/testdata/sf0.01"


def test_hand_computed_1d(spark):
    # values 1,2,3,100: p_l = k/4; p_r = (n-k+ties)/4; m3 > 0 -> right tail
    df = spark.createDataFrame(
        [(i, [float(v)]) for i, v in enumerate([1.0, 2.0, 3.0, 100.0])],
        "vec_id long, embedding array<double>",
    )
    got = {r["vec_id"]: r["_SCORE"] for r in ecod_scores(df).collect()}
    # score = max(-ln p_l, -ln p_r, auto); auto == right tail here
    import math

    p_l = {0: 0.25, 1: 0.5, 2: 0.75, 3: 1.0}
    p_r = {0: 1.0, 1: 0.75, 2: 0.5, 3: 0.25}
    for i in range(4):
        want = max(-math.log(p_l[i]), -math.log(p_r[i]))
        assert got[i] == pytest.approx(want, abs=1e-12)
    assert max(got, key=got.get) == 3


def test_planted_outliers_rank_top(spark):
    rng = np.random.default_rng(7)
    base = rng.normal(0.0, 1.0, size=(200, 6))
    outs = rng.normal(0.0, 1.0, size=(5, 6)) + 8.0  # far upper tail
    rows = [
        (i, [float(v) for v in r]) for i, r in enumerate(np.vstack([base, outs]))
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    top5 = [
        r["vec_id"]
        for r in ecod_scores(df).orderBy("_SCORE", ascending=False).limit(5).collect()
    ]
    assert set(top5) == {200, 201, 202, 203, 204}


def test_left_skew_uses_left_tail(spark):
    # heavily left-skewed: one far-low point must outrank a mildly-high one
    vals = [10.0] * 50 + [-100.0, 11.0]
    df = spark.createDataFrame(
        [(i, [v]) for i, v in enumerate(vals)], "vec_id long, embedding array<double>"
    )
    top = (
        ecod_scores(df).orderBy("_SCORE", ascending=False).limit(1).collect()[0]["vec_id"]
    )
    assert top == 50  # the -100 point


def test_registered_query_matches_oracle(spark):
    got = QUERIES["ecod_outliers_embeddings"](spark, SF).collect()
    want = duckdb.sql(ORACLES["ecod_outliers_embeddings"]).fetchall()
    assert len(got) == len(want) == 20
    for g, (vid, score) in zip(got, want):
        assert g["vec_id"] == vid
        assert g["score"] == pytest.approx(score, abs=1e-4)


def test_approx_tracks_exact_ranking(spark):
    """The sortless quantile-grid scorer must reproduce the exact
    scorer's ranking: high rank correlation and near-total top-20
    overlap on the real embeddings table."""
    from macrobase_spark.operators.ecod import ecod_scores_approx

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    exact = {r["vec_id"]: r["_SCORE"] for r in ecod_scores(emb).collect()}
    approx = {r["vec_id"]: r["_SCORE"] for r in ecod_scores_approx(emb, n_bins=64).collect()}
    ids = sorted(exact)
    import numpy as np

    e = np.array([exact[i] for i in ids])
    a = np.array([approx[i] for i in ids])
    re_ = np.argsort(np.argsort(e))
    ra = np.argsort(np.argsort(a))
    rho = np.corrcoef(re_, ra)[0, 1]
    assert rho > 0.95
    top_e = set(sorted(exact, key=exact.get, reverse=True)[:20])
    top_a = set(sorted(approx, key=approx.get, reverse=True)[:20])
    assert len(top_e & top_a) >= 15

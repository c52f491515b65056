"""LookOut + RefOut: the planted 2-D correlation-break subspace must be
chosen/refined for the planted points."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from macrobase_spark.operators.subspace_explainers import lookout_explain, refout_explain


@pytest.fixture(scope="module")
def planted_df(spark):
    rng = np.random.default_rng(5)
    n = 2500
    f0 = rng.normal(0, 1, n)
    f1 = f0 + rng.normal(0, 0.05, n)
    f2 = rng.normal(0, 1, n)
    f3 = rng.normal(0, 1, n)
    out_ids = [i for i in range(40) if abs(f0[i]) > 0.8]
    for i in out_ids:
        f1[i] = -f0[i]  # break ONLY the f0~f1 correlation
    rows = [
        (int(i), float(f0[i]), float(f1[i]), float(f2[i]), float(f3[i]), i in out_ids)
        for i in range(n)
    ]
    df = spark.createDataFrame(
        rows, "id long, f0 double, f1 double, f2 double, f3 double, poi boolean"
    )
    return df, out_ids


def test_lookout_picks_planted_subspace(spark, planted_df):
    df, out_ids = planted_df
    res = lookout_explain(
        df, ["f0", "f1", "f2", "f3"], ["id"], "poi", budget=2, n_trees=50
    ).collect()
    assert {r["id"] for r in res} == set(out_ids)
    named = sum(1 for r in res if "[f0,f1]" in r["__REL_SUBSPACES"])
    assert named >= len(out_ids) * 0.9
    assert all(r["avg_score"] > 0 for r in res)


def test_refout_refines_planted_subspace(spark, planted_df):
    df, out_ids = planted_df
    res = refout_explain(
        df, ["f0", "f1", "f2", "f3"], ["id"], "poi",
        d1=0.7, d2=2, psize=12, topk=2, n_trees=40, seed=3,
    ).collect()
    assert {r["id"] for r in res} == set(out_ids)
    # most planted points rank a refined subspace containing f0 or f1 first
    named = sum(
        1 for r in res if "f0" in r["__REL_SUBSPACES"] or "f1" in r["__REL_SUBSPACES"]
    )
    assert named >= len(out_ids) * 0.8

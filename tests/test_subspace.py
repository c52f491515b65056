"""Beam subspace explainer: anomalies visible only in a specific 2-D
subspace get that subspace as their top relevant one."""

import numpy as np

from macrobase_spark.operators.subspace import beam_subspace_explain


def test_subspace_recovers_planted_pair(spark):
    rng = np.random.default_rng(5)
    n = 3000
    # f0,f1 strongly correlated; f2,f3 independent noise
    f0 = rng.normal(0, 1, n)
    f1 = f0 + rng.normal(0, 0.05, n)
    f2 = rng.normal(0, 1, n)
    f3 = rng.normal(0, 1, n)
    # planted: 30 points break ONLY the f0~f1 correlation (marginals stay normal)
    out_ids = list(range(30))
    f1[out_ids] = -f0[out_ids]
    rows = [
        (int(i), float(f0[i]), float(f1[i]), float(f2[i]), float(f3[i]))
        for i in range(n)
    ]
    df = spark.createDataFrame(rows, "id long, f0 double, f1 double, f2 double, f3 double")
    res = beam_subspace_explain(
        df, ["f0", "f1", "f2", "f3"], ["id"], max_dim=2, beam_width=3, top_k=2
    )
    got = {r["id"]: r for r in res.collect()}
    # strongly-broken planted points name [f0,f1] among their top subspaces
    named = sum(
        1 for i in out_ids if abs(f0[i]) > 0.8 and "[f0,f1]" in got[i]["__REL_SUBSPACES"]
    )
    eligible = sum(1 for i in out_ids if abs(f0[i]) > 0.8)
    assert eligible >= 5
    assert named >= eligible * 0.8
    # planted points score clearly above the bulk
    bulk = np.median([got[i]["best_score"] for i in range(100, 400)])
    planted = np.median([got[i]["best_score"] for i in out_ids if abs(f0[i]) > 0.8])
    assert planted > bulk + 0.05

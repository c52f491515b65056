"""HiCS subspace explainer: the Monte-Carlo contrast must rank the planted
correlated pair first, and points breaking ONLY that correlation must name
it as their relevant subspace (reference HiCS.java semantics)."""

import numpy as np
import pytest

from macrobase_spark.operators.hics import (
    _t_cdf,
    hics_search,
    hics_subspace_explain,
    ks_deviation,
    welch_t_deviation,
)


def test_t_cdf_known_values():
    assert _t_cdf(0.0, 10) == pytest.approx(0.5, abs=1e-9)
    # large dof → normal: Phi(1.96) ≈ 0.975
    assert _t_cdf(1.96, 10000) == pytest.approx(0.975, abs=1e-3)
    assert _t_cdf(-1.96, 10000) == pytest.approx(0.025, abs=1e-3)
    # t(1) = Cauchy: cdf(1) = 0.75
    assert _t_cdf(1.0, 1) == pytest.approx(0.75, abs=1e-6)


def test_deviations_identical_vs_shifted():
    rng = np.random.default_rng(0)
    a = np.sort(rng.normal(0, 1, 2000))
    same = rng.normal(0, 1, 300)
    shifted = rng.normal(3, 1, 300)
    assert ks_deviation(a, same) < 0.1 < ks_deviation(a, shifted)
    assert welch_t_deviation(a, shifted) > 0.99
    assert welch_t_deviation(a, a) == pytest.approx(0.0, abs=1e-9)


def _planted(n=3000, seed=5):
    rng = np.random.default_rng(seed)
    f0 = rng.normal(0, 1, n)
    f1 = f0 + rng.normal(0, 0.05, n)
    f2 = rng.normal(0, 1, n)
    f3 = rng.normal(0, 1, n)
    out_ids = list(range(30))
    f1[out_ids] = -f0[out_ids]  # break ONLY the f0~f1 correlation
    return f0, f1, f2, f3, out_ids


@pytest.mark.parametrize("stat_test", ["welch_t", "ks"])
def test_search_ranks_planted_pair_first(stat_test):
    f0, f1, f2, f3, _ = _planted()
    X = np.column_stack([f0, f1, f2, f3])
    found = hics_search(X, m=30, alpha=0.1, cutoff=10, dmax=2, stat_test=stat_test)
    assert found[0][0] == (0, 1)
    # the correlated pair's contrast clearly dominates the noise pairs
    assert found[0][1] > 1.5 * found[1][1]


def test_hics_explain_recovers_planted_points(spark):
    f0, f1, f2, f3, out_ids = _planted()
    rows = [
        (int(i), float(f0[i]), float(f1[i]), float(f2[i]), float(f3[i]))
        for i in range(len(f0))
    ]
    df = spark.createDataFrame(rows, "id long, f0 double, f1 double, f2 double, f3 double")
    res = hics_subspace_explain(
        df, ["f0", "f1", "f2", "f3"], ["id"], m=30, alpha=0.1, cutoff=10,
        dmax=2, topk=3, stat_test="ks", top_label=2,
    )
    got = {r["id"]: r for r in res.collect()}
    named = sum(
        1 for i in out_ids if abs(f0[i]) > 0.8 and "[f0,f1]" in got[i]["__REL_SUBSPACES"]
    )
    eligible = sum(1 for i in out_ids if abs(f0[i]) > 0.8)
    assert eligible >= 5
    assert named >= eligible * 0.8
    bulk = np.median([got[i]["avg_score"] for i in range(100, 400)])
    planted = np.median([got[i]["avg_score"] for i in out_ids if abs(f0[i]) > 0.8])
    assert planted > bulk + 0.02


def test_search_climbs_to_3d():
    """Three mutually-correlated dims: the 3-D subspace must appear and beat
    its 2-D parents (the apriori ascent + dominance pruning)."""
    rng = np.random.default_rng(7)
    n = 2000
    base = rng.normal(0, 1, n)
    X = np.column_stack(
        [
            base + rng.normal(0, 0.05, n),
            base + rng.normal(0, 0.05, n),
            base + rng.normal(0, 0.05, n),
            rng.normal(0, 1, n),
            rng.normal(0, 1, n),
        ]
    )
    found = hics_search(X, m=30, alpha=0.15, cutoff=10, stat_test="ks", max_dim_cap=3)
    subs = [s for s, _ in found[:4]]
    assert (0, 1, 2) in subs


def test_contrast_averages_over_successful_draws():
    """ADVICE r2: when the attempt cap truncates the Monte-Carlo loop, the
    contrast is the mean over SUCCESSFUL draws, not deflated by /m."""
    import numpy as np

    from macrobase_spark.operators.hics import _contrast

    rng = np.random.default_rng(0)
    n = 40
    X = np.column_stack([np.linspace(0, 1, n), np.linspace(0, 1, n)])
    ranks = np.argsort(np.argsort(X, axis=0), axis=0).T.copy()
    sorted_cols = [np.sort(X[:, j]) for j in range(2)]
    # tiny alpha -> conditional slices almost always < 10 points -> most
    # draws fail; a /m average would collapse toward 0
    c = _contrast((0, 1), X, ranks, sorted_cols, m=50, alpha=1e-6, rng=rng,
                  stat_test="welch_t")
    # perfectly correlated dims: every successful draw has high deviation
    assert c == 0.0 or c > 0.05  # never a deflated in-between value

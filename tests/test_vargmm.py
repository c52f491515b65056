"""Variational mixtures (FiniteGMM / DPGMM): digamma/Wishart identities,
planted-cluster recovery, collapsed-component totality, scoring sanity,
and the chain-id wiring."""

import numpy as np

from macrobase_spark.operators.vargmm import (
    VarGMMModel,
    digamma,
    fit_vargmm,
    vargmm_log_scores,
    wishart_e_logdet,
)


def test_digamma_identities():
    # known values (Abramowitz & Stegun)
    assert abs(digamma(1.0) + 0.5772156649015329) < 1e-9
    assert abs(digamma(0.5) + 1.9635100260214235) < 1e-9
    # recurrence psi(x+1) = psi(x) + 1/x, including negative non-integers
    for x in (0.3, 2.7, -0.45, -3.2):
        assert abs(digamma(x + 1) - (digamma(x) + 1.0 / x)) < 1e-9
    # vectorized == scalar
    xs = np.array([0.05, 1.0, 10.0, 49.5, 200.0])
    assert np.allclose(digamma(xs), [digamma(float(v)) for v in xs])


def test_wishart_e_logdet_identity():
    # for omega = I and integer-ish nu, E[ln det] = D ln2 + sum digamma((nu-i)/2)
    d = 4
    nu = 9.0
    want = d * np.log(2) + sum(digamma((nu - i) / 2.0) for i in range(d))
    assert abs(wishart_e_logdet(np.eye(d), nu) - want) < 1e-9


def test_finite_recovers_planted_clusters():
    rng = np.random.default_rng(0)
    cents = np.array([[0.0, 0.0], [6.0, 6.0], [-6.0, 6.0]])
    X = np.vstack([rng.normal(c, 0.7, (300, 2)) for c in cents])
    m = fit_vargmm(X, 3, "finite", seed=1)
    assert np.allclose(sorted(m.weights), [1 / 3] * 3, atol=0.02)
    got = sorted(tuple(np.round(l, 0)) for l in m.locs)
    want = sorted(tuple(c) for c in cents)
    assert got == want


def test_dp_covers_planted_clusters():
    rng = np.random.default_rng(0)
    cents = np.array([[0.0, 0.0], [6.0, 6.0], [-6.0, 6.0]])
    X = np.vstack([rng.normal(c, 0.7, (300, 2)) for c in cents])
    m = fit_vargmm(X, 8, "dp", seed=1)
    # every planted center is near some non-trivial stick's location
    big = m.locs[m.weights > 0.05]
    for c in cents:
        assert np.min(np.linalg.norm(big - c, axis=1)) < 1.0
    # sticks sum to ~1
    assert abs(m.weights.sum() - 1.0) < 0.05


def test_outlier_scores_lower():
    rng = np.random.default_rng(2)
    X = rng.normal(0, 1, (500, 3))
    m = fit_vargmm(X, 2, "finite", seed=3)
    s = vargmm_log_scores(m, np.array([[0.0, 0.0, 0.0], [25.0, -25.0, 25.0]]))
    assert s[0] > s[1]


def test_collapsed_component_is_total():
    """K far above the true cluster count at D > nu0 forces dof_t <= 0 on
    collapsed atoms — the fit must stay finite and the mixture must still
    score (the reference NaNs here; we extend its dof==0 -> density-0
    convention)."""
    rng = np.random.default_rng(4)
    X = rng.normal(0, 1, (60, 8))  # D=8 >> nu0=0.1, tiny n
    m = fit_vargmm(X, 6, "finite", seed=5)
    s = vargmm_log_scores(m, X[:10])
    assert np.all(np.isfinite(s))


def test_chain_ids(spark):
    from macrobase_spark.pipelines import classify_chain

    rng = np.random.default_rng(6)
    rows = [
        (int(i), float(rng.normal()), float(rng.normal(3, 1))) for i in range(400)
    ]
    df = spark.createDataFrame(rows, "id long, m1 double, m2 double")
    for conf in (
        [{"id": "finitegmm", "metricColumns": ["m1", "m2"]}],
        [{"id": "dpgmm", "metricColumns": ["m1", "m2"],
          "parameters": {"truncatingParameter": 5}}],
    ):
        out, col = classify_chain(df, conf)
        res = out.collect()
        assert len(res) == 400 and all(r[col] is not None for r in res)


def test_stochastic_finite_recovers_planted_clusters():
    """StochVarFiniteGMM semantics: strided minibatches + paced
    natural-gradient steps recover the same planted structure."""
    from macrobase_spark.operators.vargmm import fit_vargmm_stochastic

    rng = np.random.default_rng(0)
    cents = np.array([[0.0, 0.0], [6.0, 6.0], [-6.0, 6.0]])
    X = np.vstack([rng.normal(c, 0.7, (300, 2)) for c in cents])
    m = fit_vargmm_stochastic(X, 3, "finite", minibatch=128, seed=1)
    assert np.allclose(sorted(m.weights), [1 / 3] * 3, atol=0.05)
    got = sorted(tuple(np.round(l, 0)) for l in m.locs)
    want = sorted(tuple(c) for c in cents)
    assert got == want


def test_stochastic_dp_covers_planted_clusters():
    from macrobase_spark.operators.vargmm import fit_vargmm_stochastic

    rng = np.random.default_rng(0)
    cents = np.array([[0.0, 0.0], [6.0, 6.0], [-6.0, 6.0]])
    X = np.vstack([rng.normal(c, 0.7, (300, 2)) for c in cents])
    m = fit_vargmm_stochastic(X, 8, "dp", minibatch=128, seed=1)
    big = m.locs[m.weights > 0.05]
    for c in cents:
        assert np.min(np.linalg.norm(big - c, axis=1)) < 1.0
    assert abs(m.weights.sum() - 1.0) < 0.05


def test_stochastic_single_minibatch_is_paced_batch():
    """With minibatch >= N there is exactly ONE partition, so each sweep is
    a paced step toward the full-batch target — after many sweeps the
    stochastic fit lands where the batch fit lands."""
    from macrobase_spark.operators.vargmm import fit_vargmm_stochastic

    rng = np.random.default_rng(7)
    X = np.vstack(
        [rng.normal([0, 0], 0.5, (200, 2)), rng.normal([5, 5], 0.5, (200, 2))]
    )
    mb = fit_vargmm(X, 2, "finite", seed=9)
    ms = fit_vargmm_stochastic(X, 2, "finite", minibatch=10**6, seed=9)
    assert np.allclose(
        sorted(map(tuple, mb.locs)), sorted(map(tuple, ms.locs)), atol=0.2
    )
    assert np.allclose(sorted(mb.weights), sorted(ms.weights), atol=0.02)


def test_stochastic_chain_ids(spark):
    from macrobase_spark.pipelines import classify_chain

    rng = np.random.default_rng(8)
    rows = [
        (int(i), float(rng.normal()), float(rng.normal(3, 1))) for i in range(400)
    ]
    df = spark.createDataFrame(rows, "id long, m1 double, m2 double")
    for conf in (
        [{"id": "stochvarfinitegmm", "metricColumns": ["m1", "m2"],
          "parameters": {"minibatchSize": 128}}],
        [{"id": "stochvardpgmm", "metricColumns": ["m1", "m2"],
          "parameters": {"truncatingParameter": 5, "minibatchSize": 128}}],
    ):
        out, col = classify_chain(df, conf)
        res = out.collect()
        assert len(res) == 400 and all(r[col] is not None for r in res)

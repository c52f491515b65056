"""KDE and EM-GMM density scorers — the reference's contrib/ module, which
its own build disables (pom.xml:43), covered anyway.

Reference semantics:
- KDE (contrib/src/main/java/macrobase/analysis/stats/KDE.java:120-209):
  Epanechnikov multiplicative kernel
  (kernel/EpanchnikovMulticativeKernel.java:19-30 — 0.75^d * prod(1-u_d^2),
  0 outside the unit box), NORMAL_SCALE per-dimension bandwidth
  h_d = (8*sqrt(pi)*norm1D / (3*secondMoment1D^2 * n * proportion))^0.2
        * IQR_d / 1.349
  (KDE.java:131-148; norm1D=0.6, secondMoment1D=0.2), a shuffled
  `proportion` subsample as the density population (KDE.java:185-197), and
  score(x) = -sum_i K(H^{-1/2}(x - x_i)) / (sqrt(det H) * n_pop)
  (KDE.java:201-209). Quantiles here are numpy linear-interpolation
  percentiles rather than commons-math's default estimator — a documented
  divergence in the bandwidth constant only.
- GMM (contrib/.../mixture/ExpectMaxGMM.java:40-150): full-covariance EM,
  Gonzalez farthest-point init from a seeded random first center,
  identity-covariance / uniform-weight start, run to a log-likelihood
  progress cutoff; score(x) = log(sum_k phi_k * N(x; mu_k, sigma_k))
  (ExpectMaxGMM.java:134-140).

Spark shape: both models fit driver-side on the seeded bounded sample
(the detectors.py contract — partitioning-invariant, a few KB of numpy),
broadcast, and score via Arrow batches. The DuckDB oracles replay the
scoring math over MATERIALIZED model relations: KDE as a sample cross
join with the product kernel stated per dimension, GMM as per-component
precision quadratic forms (the MCD recipe) inside a log-sum — so the
registered queries certify the full scoring path; the FITS are gated by
the reference's own 3-gaussians test data (tests/test_contrib_stats.py
recovers the published centers) and planted-structure tests.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from macrobase_spark.operators.detectors import (
    _collect_sample,
    _score_with,
    _SCORERS,
    array_col_to_features,
)

_NORM_1D = 0.6
_SECOND_MOMENT_1D = 0.2


# ---------------------------------------------------------------------------
# KDE
# ---------------------------------------------------------------------------


@dataclass
class KDEModel:
    population: np.ndarray  # (m, d) density population
    h: np.ndarray  # (d,) diagonal bandwidth entries (H's diagonal)


def fit_kde(
    X: np.ndarray,
    proportion: float = 0.25,
    bandwidth_multiplier: float = 1.0,
    seed: int = 42,
) -> KDEModel:
    """NORMAL_SCALE diagonal bandwidth from the training matrix, then a
    seeded shuffle picks the `proportion` density population (the
    reference trains on the full stream and samples 1%; here X is already
    the bounded seeded sample, so the default proportion is higher)."""
    n, d = X.shape
    const_num = 8 * np.sqrt(np.pi) * _NORM_1D
    const_den = 3.0 * _SECOND_MOMENT_1D**2 * n * proportion
    scale = (const_num / const_den) ** 0.2
    q25, q75 = np.percentile(X, [25, 75], axis=0)
    h = scale * (q75 - q25) / 1.349 * bandwidth_multiplier
    h = np.where(h > 0, h, 1.0)  # degenerate dimension: unit bandwidth
    rng = np.random.default_rng(seed)
    m = max(1, int(round(proportion * n)))
    pop = X[rng.permutation(n)[:m]].copy()
    return KDEModel(population=pop, h=h)


def kde_scores(model: KDEModel, X: np.ndarray) -> np.ndarray:
    """score(x) = -sum_i K(H^{-1/2}(x-x_i)) / (sqrt(det H) * m); kernel is
    the Epanechnikov product. Vectorized: one (batch, m, d) residual
    tensor per Arrow batch (m is proportion-bounded)."""
    inv_sqrt_h = 1.0 / np.sqrt(model.h)
    u = (X[:, None, :] - model.population[None, :, :]) * inv_sqrt_h
    u2 = u * u
    inside = (u2 < 1.0).all(axis=2)
    dens = (0.75 ** X.shape[1]) * np.where(inside, np.prod(1.0 - u2, axis=2), 0.0)
    scale = 1.0 / (np.sqrt(np.prod(model.h)) * len(model.population))
    return -dens.sum(axis=1) * scale


# ---------------------------------------------------------------------------
# EM GMM (full covariance)
# ---------------------------------------------------------------------------


@dataclass
class GMMModel:
    weights: np.ndarray  # (k,)
    means: np.ndarray  # (k, d)
    covs: np.ndarray  # (k, d, d)


def _gonzalez_init(X: np.ndarray, k: int, rng: np.random.Generator) -> np.ndarray:
    """Farthest-point init (ExpectMaxGMM.gonzalezInitializeMixtureCenters):
    a random first center, then each next center is the point farthest
    from the chosen set."""
    centers = [X[rng.integers(len(X))]]
    for _ in range(1, k):
        d2 = np.min(
            [((X - c) ** 2).sum(axis=1) for c in centers], axis=0
        )
        centers.append(X[int(np.argmax(d2))])
    return np.stack(centers)


def _gauss_log_density(X: np.ndarray, mean: np.ndarray, cov: np.ndarray) -> np.ndarray:
    d = X.shape[1]
    sign, logdet = np.linalg.slogdet(cov)
    prec = np.linalg.inv(cov)
    r = X - mean
    q = np.einsum("ni,ij,nj->n", r, prec, r)
    return -0.5 * (q + d * np.log(2 * np.pi) + logdet)


def fit_gmm(
    X: np.ndarray,
    k: int = 3,
    max_iters: int = 200,
    progress_cutoff: float = 1e-5,
    reg: float = 1e-6,
    seed: int = 42,
) -> GMMModel:
    """Full-covariance EM to a relative log-likelihood progress cutoff,
    from Gonzalez centers / identity covariances / uniform weights."""
    rng = np.random.default_rng(seed)
    n, d = X.shape
    means = _gonzalez_init(X, k, rng)
    covs = np.stack([np.eye(d)] * k)
    w = np.full(k, 1.0 / k)
    prev_ll = -np.inf
    for _ in range(max_iters):
        logp = np.stack(
            [np.log(w[j]) + _gauss_log_density(X, means[j], covs[j]) for j in range(k)],
            axis=1,
        )
        mx = logp.max(axis=1, keepdims=True)
        p = np.exp(logp - mx)
        tot = p.sum(axis=1, keepdims=True)
        resp = p / tot
        ll = float((mx.ravel() + np.log(tot.ravel())).sum())
        nk = resp.sum(axis=0)
        w = nk / n
        means = (resp.T @ X) / nk[:, None]
        for j in range(k):
            r = X - means[j]
            covs[j] = (resp[:, j][:, None] * r).T @ r / nk[j] + reg * np.eye(d)
        if np.isfinite(prev_ll) and abs(ll - prev_ll) <= progress_cutoff * abs(prev_ll):
            break
        prev_ll = ll
    return GMMModel(weights=w, means=means, covs=covs)


def gmm_scores(model: GMMModel, X: np.ndarray) -> np.ndarray:
    """log(sum_k phi_k N(x; mu_k, sigma_k)) — the reference's score."""
    logp = np.stack(
        [
            np.log(model.weights[j]) + _gauss_log_density(X, model.means[j], model.covs[j])
            for j in range(len(model.weights))
        ],
        axis=1,
    )
    mx = logp.max(axis=1)
    return mx + np.log(np.exp(logp - mx[:, None]).sum(axis=1))


_SCORERS["kde"] = kde_scores
_SCORERS["gmm"] = gmm_scores


def kde_score(
    df: DataFrame,
    feature_cols: list[str],
    id_cols: list[str] | None,
    proportion: float = 0.25,
    bandwidth_multiplier: float = 1.0,
    train_rows: int = 4096,
    seed: int = 42,
    score_col: str = "_SCORE",
    model: KDEModel | None = None,
) -> DataFrame:
    if model is None:
        sample = _collect_sample(df, feature_cols, train_rows, seed)
        # collect order follows partition order; both fits below consume
        # rows positionally (shuffle / farthest-point init), so sort the
        # sample lexicographically to keep the model partitioning-invariant
        model = fit_kde(
            sample[np.lexsort(sample.T[::-1])], proportion, bandwidth_multiplier, seed
        )
    return _score_with(df, feature_cols, id_cols, model, "kde", score_col)


def gmm_score(
    df: DataFrame,
    feature_cols: list[str],
    id_cols: list[str] | None,
    k: int = 3,
    train_rows: int = 4096,
    seed: int = 42,
    score_col: str = "_SCORE",
    model: GMMModel | None = None,
) -> DataFrame:
    if model is None:
        sample = _collect_sample(df, feature_cols, train_rows, seed)
        model = fit_gmm(sample[np.lexsort(sample.T[::-1])], k=k, seed=seed)
    return _score_with(df, feature_cols, id_cols, model, "gmm", score_col)


# ---------------------------------------------------------------------------
# registered queries: scoring replayed in SQL over materialized models
# ---------------------------------------------------------------------------

from macrobase_spark.queries import register  # noqa: E402

_DIMS = 8  # detectors.py convention for the embeddings feature head


def kde_model_parquet(spark, sf_dir: str) -> tuple[str, str]:
    """Materialize the density population (row, dim, value) and the
    bandwidth relation (dim, h) so the product kernel is SQL-stateable."""
    import os

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n = e.count()
    ppath = f"/tmp/mb_kde_pop_v1_{n}.parquet"
    hpath = f"/tmp/mb_kde_h_v1_{n}.parquet"
    if not (os.path.isfile(f"{ppath}/_SUCCESS") and os.path.isfile(f"{hpath}/_SUCCESS")):
        feats = [f"_f{i}" for i in range(_DIMS)]
        df = array_col_to_features(e, "embedding", _DIMS)
        sample = _collect_sample(df, feats, 4096, 42)
        m = fit_kde(sample[np.lexsort(sample.T[::-1])])
        spark.createDataFrame(
            [
                (i, j, float(m.population[i, j]))
                for i in range(len(m.population))
                for j in range(_DIMS)
            ],
            "row long, dim long, v double",
        ).coalesce(1).write.mode("overwrite").parquet(ppath)
        spark.createDataFrame(
            [(j, float(m.h[j])) for j in range(_DIMS)], "dim long, h double"
        ).coalesce(1).write.mode("overwrite").parquet(hpath)
    return ppath, hpath


def load_kde_model(spark, ppath: str, hpath: str) -> KDEModel:
    pop = spark.read.parquet(ppath).toPandas().sort_values(["row", "dim"])
    m = int(pop["row"].max()) + 1
    hh = spark.read.parquet(hpath).toPandas().sort_values("dim")
    return KDEModel(
        population=pop["v"].to_numpy(dtype=np.float64).reshape(m, _DIMS),
        h=hh["h"].to_numpy(dtype=np.float64),
    )


_KDEP = "read_parquet('/tmp/mb_kde_pop_v1_500.parquet/*.parquet')"
_KDEH = "read_parquet('/tmp/mb_kde_h_v1_500.parquet/*.parquet')"

_KDE_ORACLE = f"""
    WITH pop AS (SELECT * FROM {_KDEP}),
    hb AS (SELECT * FROM {_KDEH}),
    scale AS (
      SELECT 1.0 / (sqrt(exp(sum(ln(h)))) *
                    (SELECT count(DISTINCT row) FROM pop)) AS s
      FROM hb),
    feat AS (
      SELECT vec_id, dim, CAST(embedding[dim + 1] AS DOUBLE) AS x
      FROM embeddings, range(0, {_DIMS}) t(dim)),
    terms AS (  -- per (point, population row): the product kernel
      SELECT f.vec_id, p.row,
             CASE WHEN max((f.x - p.v) * (f.x - p.v) / hb.h) >= 1.0 THEN 0.0
                  ELSE pow(0.75, {_DIMS}) *
                       product(1.0 - (f.x - p.v) * (f.x - p.v) / hb.h)
             END AS kern
      FROM feat f
      JOIN pop p ON p.dim = f.dim
      JOIN hb ON hb.dim = f.dim
      GROUP BY f.vec_id, p.row),
    scored AS (
      SELECT vec_id, -sum(kern) * (SELECT s FROM scale) AS score
      FROM terms GROUP BY vec_id),
    rk AS (SELECT vec_id, score FROM scored ORDER BY score DESC, vec_id LIMIT 20)
    SELECT vec_id, round(score, 6) AS score FROM rk
"""


@register("kde_outliers_embeddings", _KDE_ORACLE)
def kde_outliers_embeddings(spark, sf_dir: str) -> DataFrame:
    """20 lowest-density points under the materialized KDE (score is the
    reference's negative density, so the largest scores are the
    outliers); the oracle restates the Epanechnikov product kernel, the
    determinant scale, and the population sum in SQL."""
    ppath, hpath = kde_model_parquet(spark, sf_dir)
    model = load_kde_model(spark, ppath, hpath)
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    feats = [f"_f{i}" for i in range(_DIMS)]
    df = array_col_to_features(e, "embedding", _DIMS)
    scored = kde_score(df, feats, ["vec_id"], model=model)
    return scored.orderBy(F.desc("_SCORE"), "vec_id").limit(20).select(
        "vec_id", F.round("_SCORE", 6).alias("score")
    )


def gmm_model_parquet(spark, sf_dir: str) -> str:
    """Materialize the fitted mixture as one relation: per component k,
    log-weight, log-normalizer, mean vector and precision matrix entries
    (k, i, j, p, mu_i, logw, logz) — the MCD quadratic-form recipe per
    component."""
    import os

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n = e.count()
    path = f"/tmp/mb_gmm_model_v1_{n}.parquet"
    if not os.path.isfile(f"{path}/_SUCCESS"):
        feats = [f"_f{i}" for i in range(_DIMS)]
        df = array_col_to_features(e, "embedding", _DIMS)
        sample = _collect_sample(df, feats, 4096, 42)
        m = fit_gmm(sample[np.lexsort(sample.T[::-1])], k=3, seed=42)
        rows = []
        for c in range(len(m.weights)):
            prec = np.linalg.inv(m.covs[c])
            sign, logdet = np.linalg.slogdet(m.covs[c])
            logz = -0.5 * (_DIMS * np.log(2 * np.pi) + logdet)
            for i in range(_DIMS):
                for j in range(_DIMS):
                    rows.append(
                        (
                            c, i, j, float(prec[i, j]), float(m.means[c, i]),
                            float(m.means[c, j]), float(np.log(m.weights[c])),
                            float(logz),
                        )
                    )
        spark.createDataFrame(
            rows, "k long, i long, j long, p double, mu_i double, mu_j double, logw double, logz double"
        ).coalesce(1).write.mode("overwrite").parquet(path)
    return path


def load_gmm_model(spark, path: str) -> GMMModel:
    pdf = spark.read.parquet(path).toPandas().sort_values(["k", "i", "j"])
    ks = int(pdf["k"].max()) + 1
    prec = pdf["p"].to_numpy(dtype=np.float64).reshape(ks, _DIMS, _DIMS)
    means = (
        pdf.drop_duplicates(["k", "i"]).sort_values(["k", "i"])["mu_i"]
        .to_numpy(dtype=np.float64)
        .reshape(ks, _DIMS)
    )
    w = np.exp(
        pdf.drop_duplicates("k").sort_values("k")["logw"].to_numpy(dtype=np.float64)
    )
    return GMMModel(weights=w, means=means, covs=np.linalg.inv(prec))


_GMMM = "read_parquet('/tmp/mb_gmm_model_v1_500.parquet/*.parquet')"

_GMM_ORACLE = f"""
    WITH m AS (SELECT * FROM {_GMMM}),
    q AS (  -- per (point, component): the quadratic form
      SELECT e.vec_id, m.k, any_value(m.logw) AS logw, any_value(m.logz) AS logz,
             sum((CAST(e.embedding[m.i + 1] AS DOUBLE) - m.mu_i) * m.p *
                 (CAST(e.embedding[m.j + 1] AS DOUBLE) - m.mu_j)) AS quad
      FROM embeddings e, m
      GROUP BY e.vec_id, m.k),
    comp AS (
      SELECT vec_id, logw + logz - 0.5 * quad AS logp FROM q),
    mx AS (SELECT vec_id, max(logp) AS mx FROM comp GROUP BY vec_id),
    scored AS (
      SELECT c.vec_id, any_value(m.mx) + ln(sum(exp(c.logp - m.mx))) AS score
      FROM comp c JOIN mx m USING (vec_id) GROUP BY c.vec_id),
    rk AS (SELECT vec_id, score FROM scored ORDER BY score ASC, vec_id LIMIT 20)
    SELECT vec_id, round(score, 6) AS score FROM rk
"""


@register("gmm_loglik_embeddings", _GMM_ORACLE)
def gmm_loglik_embeddings(spark, sf_dir: str) -> DataFrame:
    """20 lowest mixture log-likelihoods under the materialized EM-GMM
    (the reference's score; low = anomalous); the oracle restates the
    per-component Gaussian quadratic forms and the log-sum-exp in SQL."""
    path = gmm_model_parquet(spark, sf_dir)
    model = load_gmm_model(spark, path)
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    feats = [f"_f{i}" for i in range(_DIMS)]
    df = array_col_to_features(e, "embedding", _DIMS)
    scored = gmm_score(df, feats, ["vec_id"], model=model)
    return scored.orderBy(F.asc("_SCORE"), "vec_id").limit(20).select(
        "vec_id", F.round("_SCORE", 6).alias("score")
    )

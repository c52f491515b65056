"""LookOut and RefOut — the alexp fork's remaining subspace explainers.

LookOut (reference alexp/.../explanation/lookOut/LookOut.java:13-160;
Pipelines.java:245-253, defaults budget=3 dimensionality=2): score the
detector in EVERY `dimensionality`-dim subspace; greedily pick `budget`
subspaces maximizing the marginal gain of Σ over points-of-interest of
their max score across chosen subspaces (the LookOut max-coverage
objective); a POI's output score is its average across the chosen
subspaces, and its relevant-subspace column lists them.

RefOut (reference alexp/.../explanation/refOut/RefOut.java:26-296;
Pipelines.java:274-283, defaults d1=0.7 d2=2 psize=100 beamSize=100
topk=50): (1) score a random pool of `psize` ceil(d·d1)-dim subspaces,
z-normalizing each subspace's scores over the WHOLE relation; (2) per POI,
refine: beam-search the d2-dim feature set whose presence/absence best
separates that POI's pool scores (Welch-t deviation between the two
partitions); (3) re-score the refined pool, z-normalize, keep each POI's
top-k refined subspaces; output the average normalized score.

Spark-first: detectors are fit once on a seeded driver sample (a few KB
each) and the points-of-interest are a bounded set (the flagged outliers),
so POI scoring is driver-side numpy; the only distributed work RefOut needs
is the z-normalization moments over the full relation — ONE Arrow pass per
pool emitting per-batch (subspace, n, Σs, Σs²) partials (tiny output), no
row data collected. LookOut needs no full pass at all (raw scores, no
normalization — as the reference).
"""

from __future__ import annotations

from collections.abc import Iterator
from itertools import combinations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from macrobase_spark.operators.detectors import (
    _collect_sample,
    fit_isolation_forest,
    iforest_scores,
)
from macrobase_spark.operators.hics import welch_t_deviation


def _fit_models(sample, subspaces, col_idx, n_trees, seed):
    return [
        (
            list(sub),
            fit_isolation_forest(
                sample[:, [col_idx[c] for c in sub]], n_trees=n_trees, subsample=256, seed=seed
            ),
        )
        for sub in subspaces
    ]


def _collect_pois(
    df: DataFrame, feature_cols: list[str], id_cols: list[str], poi_col: str, max_pois: int
):
    rows = df.filter(F.col(poi_col)).select(*id_cols, *feature_cols).limit(max_pois).collect()
    ids = [tuple(r[c] for c in id_cols) for r in rows]
    X = np.array([[float(r[c]) for c in feature_cols] for r in rows], dtype=np.float64)
    return ids, X


def _moments_pass(df: DataFrame, feature_cols: list[str], models) -> list[tuple[float, float, float]]:
    """One Arrow pass: per subspace, (n, Σscore, Σscore²) over every row —
    the z-normalization statistics, with only per-batch partials leaving
    the executors."""
    bc = df.sparkSession.sparkContext.broadcast(models)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ms = bc.value
        for pdf in batches:
            out = []
            for j, (sub, model) in enumerate(ms):
                s = iforest_scores(model, pdf[sub].to_numpy(dtype=np.float64))
                out.append((j, float(len(s)), float(s.sum()), float((s * s).sum())))
            yield pd.DataFrame(out, columns=["j", "n", "s", "ss"])

    parts = (
        df.select(*feature_cols)
        .mapInPandas(run, "j long, n double, s double, ss double")
        .groupBy("j")
        .agg(F.sum("n").alias("n"), F.sum("s").alias("s"), F.sum("ss").alias("ss"))
        .collect()
    )
    stats = [(0.0, 0.0, 0.0)] * len(models)
    for r in parts:
        stats[int(r["j"])] = (float(r["n"]), float(r["s"]), float(r["ss"]))
    return stats


def _znorm_params(stats):
    """(mean, std) per subspace — reference normalizeScores (ddof=1)."""
    out = []
    for n, s, ss in stats:
        mean = s / n if n else 0.0
        var = (ss - n * mean * mean) / (n - 1) if n > 1 else 1.0
        out.append((mean, float(np.sqrt(max(var, 1e-300)))))
    return out


def lookout_explain(
    df: DataFrame,
    feature_cols: list[str],
    id_cols: list[str],
    poi_col: str,
    budget: int = 3,
    dimensionality: int = 2,
    n_trees: int = 50,
    train_rows: int = 2048,
    max_pois: int = 10000,
    seed: int = 42,
) -> DataFrame:
    """Returns one row per point-of-interest: (id_cols..., avg_score,
    __REL_SUBSPACES) over the greedily-chosen budget of subspaces."""
    col_idx = {c: i for i, c in enumerate(feature_cols)}
    sample = _collect_sample(df, feature_cols, train_rows, seed)
    subspaces = list(combinations(feature_cols, dimensionality))
    models = _fit_models(sample, subspaces, col_idx, n_trees, seed)
    ids, X = _collect_pois(df, feature_cols, id_cols, poi_col, max_pois)
    spark = df.sparkSession
    schema = ", ".join(
        [f"{c} {df.schema[c].dataType.simpleString()}" for c in id_cols]
        + ["avg_score double", "__REL_SUBSPACES string"]
    )
    if not ids:
        return spark.createDataFrame([], schema)
    S = np.column_stack(
        [iforest_scores(m, X[:, [col_idx[c] for c in sub]]) for sub, m in models]
    )  # (pois, subspaces)
    # greedy max-coverage: marginal gain of Σ_i max over chosen
    cur = np.zeros(len(ids))
    chosen: list[int] = []
    for _ in range(min(budget, len(models))):
        gains = np.maximum(S - cur[:, None], 0.0).sum(axis=0)
        gains[chosen] = -np.inf
        j = int(np.argmax(gains))
        chosen.append(j)
        cur = np.maximum(cur, S[:, j])
    rows = []
    for i, pid in enumerate(ids):
        label = ";".join(
            "[" + ",".join(models[j][0]) + f"]:{S[i, j]:.4f}" for j in chosen
        )
        rows.append((*pid, float(S[i, chosen].mean()), label))
    return spark.createDataFrame(rows, schema)


def _refine(pool_feats: list[list[str]], z: np.ndarray, feature_cols, d2, beam_size):
    """Per-POI RefOut refinement: the d2-dim feature set whose containment
    best splits this POI's pool scores (Welch deviation), via the
    reference's 1-dim → d2 beam (RefOut.java:150-230)."""

    def quality(feats: set) -> float:
        right = np.array(
            [z[k] for k, pf in enumerate(pool_feats) if feats.issubset(pf)]
        )
        left = np.array(
            [z[k] for k, pf in enumerate(pool_feats) if not feats.issubset(pf)]
        )
        if len(right) <= 2 or len(left) <= 2:
            return -1.0
        d = welch_t_deviation(left, right)
        return -1.0 if np.isnan(d) else d

    cands = sorted(
        (({f}, quality({f})) for f in feature_cols), key=lambda t: t[1], reverse=True
    )[:beam_size]
    pool_sets = [set(pf) for pf in pool_feats]
    for stage in range(2, d2 + 1):
        feats = [c for c, _ in cands]
        merged: dict[frozenset, float] = {}
        for a, b in combinations(feats, 2):
            u = a | b
            if len(u) < stage:
                continue
            if len(u) > stage:
                best = max(
                    (frozenset(c) for c in combinations(sorted(u), stage)),
                    key=lambda c: quality(set(c)),
                )
                u = set(best)
            fu = frozenset(u)
            if fu not in merged:
                merged[fu] = quality(set(fu))
        cands = sorted(
            ((set(k), v) for k, v in merged.items()), key=lambda t: t[1], reverse=True
        )[:beam_size]
        if not cands:
            return None
    return tuple(sorted(cands[0][0])) if cands else None


def refout_explain(
    df: DataFrame,
    feature_cols: list[str],
    id_cols: list[str],
    poi_col: str,
    d1: float = 0.7,
    d2: int = 2,
    psize: int = 100,
    beam_size: int = 100,
    topk: int = 5,
    n_trees: int = 50,
    train_rows: int = 2048,
    max_pois: int = 10000,
    seed: int = 42,
) -> DataFrame:
    """Returns one row per point-of-interest: (id_cols..., avg_score,
    __REL_SUBSPACES) over its top-k refined subspaces (z-normalized
    detector scores)."""
    rng = np.random.default_rng(seed)
    dim = len(feature_cols)
    col_idx = {c: i for i, c in enumerate(feature_cols)}
    pool_dim = max(min(int(np.ceil(dim * d1)), dim), 1)
    pool: set = set()
    while len(pool) < min(psize, _ncomb(dim, pool_dim)):
        pool.add(tuple(sorted(rng.choice(dim, size=pool_dim, replace=False))))
    pool_subs = [tuple(feature_cols[i] for i in s) for s in sorted(pool)]

    sample = _collect_sample(df, feature_cols, train_rows, seed)
    models = _fit_models(sample, pool_subs, col_idx, n_trees, seed)
    ids, X = _collect_pois(df, feature_cols, id_cols, poi_col, max_pois)
    spark = df.sparkSession
    schema = ", ".join(
        [f"{c} {df.schema[c].dataType.simpleString()}" for c in id_cols]
        + ["avg_score double", "__REL_SUBSPACES string"]
    )
    if not ids:
        return spark.createDataFrame([], schema)

    # stage 1: z-normalized pool scores (moments: one Arrow pass)
    zp = _znorm_params(_moments_pass(df, feature_cols, models))
    S = np.column_stack(
        [
            (iforest_scores(m, X[:, [col_idx[c] for c in sub]]) - zp[j][0]) / zp[j][1]
            for j, (sub, m) in enumerate(models)
        ]
    )
    # stage 2: per-POI refinement → refined pool
    pool_feats = [list(sub) for sub, _ in models]
    refined: set[tuple] = set()
    for i in range(len(ids)):
        r = _refine(pool_feats, S[i], feature_cols, d2, beam_size)
        if r:
            refined.add(r)
    if not refined:
        return spark.createDataFrame([], schema)
    ref_models = _fit_models(sample, sorted(refined), col_idx, n_trees, seed)
    # stage 3: z-normalized refined scores, per-POI top-k
    zr = _znorm_params(_moments_pass(df, feature_cols, ref_models))
    R = np.column_stack(
        [
            (iforest_scores(m, X[:, [col_idx[c] for c in sub]]) - zr[j][0]) / zr[j][1]
            for j, (sub, m) in enumerate(ref_models)
        ]
    )
    rows = []
    k = min(topk, R.shape[1])
    for i, pid in enumerate(ids):
        order = np.argsort(-R[i])[:k]
        label = ";".join(
            "[" + ",".join(ref_models[j][0]) + f"]:{R[i, j]:.4f}" for j in order
        )
        rows.append((*pid, float(R[i, order].mean()), label))
    return spark.createDataFrame(rows, schema)


def _ncomb(n: int, k: int) -> int:
    from math import comb

    return comb(n, k)


# ---------------------------------------------------------------------------
# registered queries (rows-only: detector ensembles + greedy/beam searches
# are not SQL-expressible; gates = tests/test_subspace_explainers.py)
# ---------------------------------------------------------------------------

from macrobase_spark.queries import register  # noqa: E402


def _emb_with_poi(spark, sf_dir: str, dims: int = 6):
    from macrobase_spark.operators.detectors import array_col_to_features, iforest_score

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    feats = [f"_f{i}" for i in range(dims)]
    df = array_col_to_features(emb, "embedding", dims)
    scored = iforest_score(df, feats, None, score_col="_S")
    cut = scored.agg(F.percentile_approx("_S", 0.99, 10000)).collect()[0][0]
    return scored.withColumn("poi", F.col("_S") >= F.lit(float(cut))), feats


@register("lookout_explain_embeddings")  # rows-only
def lookout_explain_embeddings(spark, sf_dir: str) -> DataFrame:
    df, feats = _emb_with_poi(spark, sf_dir)
    res = lookout_explain(df, feats, ["vec_id"], "poi", budget=3, n_trees=40)
    return res.orderBy(F.desc("avg_score"), "vec_id").limit(20)


@register("refout_explain_embeddings")  # rows-only
def refout_explain_embeddings(spark, sf_dir: str) -> DataFrame:
    df, feats = _emb_with_poi(spark, sf_dir)
    res = refout_explain(
        df, feats, ["vec_id"], "poi", psize=20, topk=3, n_trees=40
    )
    return res.orderBy(F.desc("avg_score"), "vec_id").limit(20)

"""Subspace outlier explanation — beam search over feature subspaces with a
base detector, appending per-point relevant subspaces.

Reference semantics (alexp explanation module): run the configured detector
on feature subspaces, score points per subspace, emit a `__REL_SUBSPACES`
column with each point's top subspaces
(reference alexp/.../explanation/Explanation.java:31-57 scoring contract;
beam lattice search reference alexp/.../explanation/beam/
BeamSubspaceSearch.java:21-110).

Spark-first: subspace × detector fan-out is embarrassingly parallel. All
per-subspace models are fit on ONE seeded driver sample (each model is a few
KB), broadcast together, and every point is scored against every candidate
subspace in a single Arrow pass — one scan regardless of how many subspaces
the beam explores.
"""

from __future__ import annotations

from collections.abc import Iterator
from itertools import combinations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import DoubleType, StringType, StructField, StructType

from macrobase_spark.operators.detectors import (
    _collect_sample,
    fit_isolation_forest,
    iforest_scores,
)

REL_SUBSPACES = "__REL_SUBSPACES"


def beam_subspace_explain(
    df: DataFrame,
    feature_cols: list[str],
    id_cols: list[str],
    max_dim: int = 3,
    beam_width: int = 4,
    top_k: int = 2,
    train_rows: int = 2048,
    n_trees: int = 50,
    seed: int = 42,
) -> DataFrame:
    """Append `__REL_SUBSPACES` (each point's top_k subspaces by anomaly
    score, ';'-joined as '[f0,f1]') plus the best subspace score.

    Beam: start from all 2-D subspaces; keep the `beam_width` subspaces with
    the highest sample tail mass (mean of top-2% scores) and extend them by
    one feature per stage up to `max_dim`.
    """
    sample = _collect_sample(df, feature_cols, train_rows, seed)
    col_idx = {c: i for i, c in enumerate(feature_cols)}

    def tail_mass(scores: np.ndarray) -> float:
        k = max(int(len(scores) * 0.02), 4)
        return float(np.sort(scores)[-k:].mean())

    def fit(sub: tuple[str, ...]):
        X = sample[:, [col_idx[c] for c in sub]]
        return fit_isolation_forest(X, n_trees=n_trees, subsample=256, seed=seed)

    # stage 1: all 2-D subspaces
    models: dict[tuple[str, ...], object] = {}
    for sub in combinations(feature_cols, 2):
        models[sub] = fit(sub)
    beam = sorted(
        models,
        key=lambda s: tail_mass(iforest_scores(models[s], sample[:, [col_idx[c] for c in s]])),
        reverse=True,
    )[:beam_width]
    # extend the beam one feature at a time
    dim = 2
    while dim < max_dim:
        cands = set()
        for s in beam:
            for f in feature_cols:
                if f not in s:
                    cands.add(tuple(sorted((*s, f))))
        for sub in cands:
            if sub not in models:
                models[sub] = fit(sub)
        beam = sorted(
            cands,
            key=lambda s: tail_mass(
                iforest_scores(models[s], sample[:, [col_idx[c] for c in s]])
            ),
            reverse=True,
        )[:beam_width]
        dim += 1

    # candidate set = everything fit along the way (2-D..max_dim)
    cand_list = list(models.items())
    bc = df.sparkSession.sparkContext.broadcast(
        [(list(sub), m) for sub, m in cand_list]
    )

    out_schema = StructType(
        [df.schema[c] for c in id_cols]
        + [StructField(REL_SUBSPACES, StringType()), StructField("best_score", DoubleType())]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cands = bc.value
        for pdf in batches:
            S = np.empty((len(pdf), len(cands)))
            for j, (sub, model) in enumerate(cands):
                X = pdf[sub].to_numpy(dtype=np.float64)
                S[:, j] = iforest_scores(model, X)
            order = np.argsort(-S, axis=1)[:, :top_k]
            labels = [
                ";".join("[" + ",".join(cands[j][0]) + "]" for j in row)
                for row in order
            ]
            out = pdf[id_cols].copy()
            out[REL_SUBSPACES] = labels
            out["best_score"] = S.max(axis=1)
            yield out

    return df.select(*id_cols, *feature_cols).mapInPandas(run, out_schema)

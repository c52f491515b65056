"""Mergeable t-digest quantile sketch (Dunning's merging variant) with a
distributed two-phase aggregation: per-partition digests → exact merge.

The north rule names t-digest for per-column approximate quantiles; Spark's
`percentile_approx` (Greenwald-Khanna) is the built-in alternative used
where the oracle needs its exact semantics. This implementation exists for
the sketch-mergeability contract: digest(merge(parts)) == digest(all) up to
compression error, verified in tests.

All numpy; the scale function is k1(q) = (δ/2π)·asin(2q−1), giving fine
resolution at the tails (the regime validation checks care about).
"""

from __future__ import annotations

from collections.abc import Iterator
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class TDigest:
    means: np.ndarray  # centroid means, ascending
    weights: np.ndarray  # centroid weights
    delta: int = 200

    @property
    def total(self) -> float:
        return float(self.weights.sum())

    # -- construction -------------------------------------------------------

    @staticmethod
    def of(values: np.ndarray, delta: int = 200) -> "TDigest":
        values = np.asarray(values, dtype=np.float64)
        values = values[~np.isnan(values)]
        if values.size == 0:
            return TDigest(np.empty(0), np.empty(0), delta)
        order = np.argsort(values, kind="stable")
        return _compress(values[order], np.ones(values.size), delta)

    @staticmethod
    def merge(digests: list["TDigest"], delta: int | None = None) -> "TDigest":
        ds = [d for d in digests if d.means.size]
        if not ds:
            return TDigest(np.empty(0), np.empty(0), delta or 200)
        delta = delta or ds[0].delta
        means = np.concatenate([d.means for d in ds])
        weights = np.concatenate([d.weights for d in ds])
        order = np.argsort(means, kind="stable")
        return _compress(means[order], weights[order], delta)

    # -- queries -------------------------------------------------------------

    def quantile(self, q: float) -> float:
        m, w = self.means, self.weights
        if m.size == 0:
            return float("nan")
        if m.size == 1:
            return float(m[0])
        total = w.sum()
        target = q * total
        # centroid cumulative midpoints (standard t-digest interpolation)
        cum = np.cumsum(w) - w / 2.0
        if target <= cum[0]:
            return float(m[0])
        if target >= cum[-1]:
            return float(m[-1])
        i = np.searchsorted(cum, target) - 1
        t = (target - cum[i]) / (cum[i + 1] - cum[i])
        return float(m[i] + t * (m[i + 1] - m[i]))

    # -- serialization (for Spark rows) --------------------------------------

    def to_row(self) -> tuple[list[float], list[float]]:
        return list(map(float, self.means)), list(map(float, self.weights))

    @staticmethod
    def from_row(means, weights, delta: int = 200) -> "TDigest":
        return TDigest(
            np.asarray(means, dtype=np.float64),
            np.asarray(weights, dtype=np.float64),
            delta,
        )


def _k1(q: np.ndarray, delta: int) -> np.ndarray:
    return (delta / (2 * np.pi)) * np.arcsin(np.clip(2 * q - 1, -1, 1))


def _compress(means: np.ndarray, weights: np.ndarray, delta: int) -> TDigest:
    """Merge sorted (mean, weight) points into centroids bounded by k1."""
    total = weights.sum()
    out_m: list[float] = []
    out_w: list[float] = []
    cur_m, cur_w = means[0], weights[0]
    w_so_far = 0.0
    k_lo = _k1(np.array([0.0]), delta)[0]
    for i in range(1, means.size):
        q_hi = (w_so_far + cur_w + weights[i]) / total
        if _k1(np.array([q_hi]), delta)[0] - k_lo <= 1.0:
            cur_m = (cur_m * cur_w + means[i] * weights[i]) / (cur_w + weights[i])
            cur_w += weights[i]
        else:
            out_m.append(float(cur_m))
            out_w.append(float(cur_w))
            w_so_far += cur_w
            k_lo = _k1(np.array([w_so_far / total]), delta)[0]
            cur_m, cur_w = means[i], weights[i]
    out_m.append(float(cur_m))
    out_w.append(float(cur_w))
    return TDigest(np.asarray(out_m), np.asarray(out_w), delta)


# ---------------------------------------------------------------------------
# Spark-side: partial digests per partition, exact merge
# ---------------------------------------------------------------------------


def tdigest_quantiles(
    df: DataFrame,
    col: str,
    qs: list[float],
    group_col: str | None = None,
    delta: int = 200,
) -> dict:
    """Quantiles of `col` via per-partition t-digests merged exactly.

    One pass over the data; only digests (≈ delta centroids each, one per
    partition per group) leave the executors. Returns {q: value} or, with
    `group_col`, {group: {q: value}}.
    """
    cols = [col] if group_col is None else [group_col, col]
    src = df.select(*cols)

    def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # one digest per group within this partition
        acc: dict = {}
        for pdf in batches:
            if group_col is None:
                acc.setdefault("", []).append(
                    TDigest.of(pdf[col].to_numpy(dtype=np.float64), delta)
                )
            else:
                for g, sub in pdf.groupby(group_col, dropna=False):
                    acc.setdefault(g, []).append(
                        TDigest.of(sub[col].to_numpy(dtype=np.float64), delta)
                    )
        rows = []
        for g, ds in acc.items():
            m, w = TDigest.merge(ds, delta).to_row()
            rows.append((str(g), m, w))
        yield pd.DataFrame(rows, columns=["g", "means", "weights"])

    rows = src.mapInPandas(
        partials, "g string, means array<double>, weights array<double>"
    ).collect()
    by_group: dict[str, list[TDigest]] = {}
    for r in rows:
        by_group.setdefault(r["g"], []).append(
            TDigest.from_row(r["means"], r["weights"], delta)
        )
    out = {
        g: {q: TDigest.merge(ds, delta).quantile(q) for q in qs}
        for g, ds in by_group.items()
    }
    if group_col is None:
        return out.get("", {q: float("nan") for q in qs})
    return out

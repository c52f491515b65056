"""Quantile cube classifier + simhash near-dup verification."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from macrobase_spark.operators.classify import (
    arithmetic_cube_classify,
    quantile_cube_classify,
)
from macrobase_spark.operators.dedup import simhash_candidates


def test_quantile_cube_classify_recovers_tail(spark):
    """Groups drawn from N(mu, 1); the group with mu=+6 holds the global
    upper tail, so its estimated outlier count ≈ its full count."""
    rng = np.random.default_rng(0)
    levels = [0.0, 0.1, 0.25, 0.5, 0.75, 0.9, 1.0]
    rows = []
    for g, mu, cnt in [("a", 0.0, 1000), ("b", 0.2, 1000), ("c", 6.0, 20)]:
        x = rng.normal(mu, 1.0, size=cnt)
        qv = [float(np.quantile(x, q)) for q in levels]
        rows.append((g, float(cnt), *qv))
    cols = ["g", "count"] + [f"q{int(q*100)}" for q in levels]
    df = spark.createDataFrame(rows, cols)
    out = quantile_cube_classify(
        df,
        [(q, f"q{int(q*100)}") for q in levels],
        count_col="count",
        percentile=1.0,
    )
    got = {r["g"]: r["_OUTLIER"] for r in out.collect()}
    # group c is entirely in the global top 1% → nearly all 20 are outliers
    assert got["c"] > 15.0
    # the bulk groups contribute only their own extreme sliver
    assert got["a"] < 40.0 and got["b"] < 40.0


def test_arithmetic_cube_classify(spark):
    # 20 bulk groups with tight spread + one far-out group: the far group's
    # whole Normal mass lies above the weighted-percentile cutoff
    rows = [(f"g{i}", 100.0, float(i), 0.1) for i in range(20)]
    rows.append(("hot", 5.0, 100.0, 0.1))
    df = spark.createDataFrame(rows, ["g", "count", "mean", "std"])
    out = arithmetic_cube_classify(df, percentile=1.0)
    got = {r["g"]: r["_OUTLIER"] for r in out.collect()}
    assert got["hot"] == pytest.approx(5.0, abs=0.1)
    for i in range(1, 19):
        assert got[f"g{i}"] < 1.0


def test_simhash_near_dups(spark):
    # long doc + 1-token edit → tiny hamming; unrelated docs → ~32 bits apart
    rng = np.random.default_rng(1)
    vocab = [f"w{j}" for j in range(500)]
    base_words = [vocab[j] for j in rng.integers(0, 500, size=120)]
    base = " ".join(base_words)
    edited = " ".join(["XEDIT" if i == 60 else w for i, w in enumerate(base_words)])
    docs = [(0, base), (1, edited)]
    for i in range(2, 40):
        docs.append((i, " ".join(vocab[j] for j in rng.integers(0, 500, size=100))))
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    pairs = simhash_candidates(df, "doc_id", "text", max_hamming=10).collect()
    got = {(r["doc_a"], r["doc_b"]) for r in pairs}
    assert (0, 1) in got
    h = {(r["doc_a"], r["doc_b"]): r["hamming"] for r in pairs}
    assert h[(0, 1)] <= 10
    # no unrelated doc pairs survive verification
    assert all({a, b} <= {0, 1} for a, b in got)


def test_count_mean_shift_cube_classify(spark):
    """Cube rows matching the predicate contribute their whole weighted
    count + mean·count (reference CountMeanShiftCubedClassifier)."""
    from macrobase_spark.operators.classify import count_mean_shift_cube_classify

    rows = [("a", 10.0, 5.0, 1.0), ("b", 20.0, 7.0, 2.0)]
    df = spark.createDataFrame(rows, "g string, cnt double, mean double, t double")
    out = {r["g"]: r for r in count_mean_shift_cube_classify(
        df, "t", "==", 1.0, count_col="cnt", mean_col="mean").collect()}
    assert out["a"]["_OUTLIERCOUNT"] == 10.0 and out["a"]["_OUTLIERMEANSUM"] == 50.0
    assert out["a"]["_INLIERCOUNT"] == 0.0
    assert out["b"]["_INLIERCOUNT"] == 20.0 and out["b"]["_INLIERMEANSUM"] == 140.0
    assert out["b"]["_OUTLIERCOUNT"] == 0.0


def test_candidate_counts_scale_linearly(spark):
    """Bucketed dedup/ANN candidate sets must grow ~linearly in corpus size
    (the r1 verdict's scale criterion): 10x documents must NOT produce
    quadratic (100x) candidate growth."""
    from macrobase_spark.operators.dedup import minhash_lsh_candidates, simhash_candidates
    from macrobase_spark.operators.similarity import lsh_cosine_candidates

    import pyspark.sql.functions as F

    counts = {}
    for sf in ("sf0.01", "sf0.1"):
        d = spark.read.parquet(f"/root/testdata/{sf}/documents.parquet")
        e = spark.read.parquet(f"/root/testdata/{sf}/embeddings.parquet")
        dim = len(e.select("embedding").first()[0])
        counts[sf] = {
            "docs": d.count(),
            "minhash": minhash_lsh_candidates(d, "doc_id", "text").count(),
            "simhash": simhash_candidates(d, "doc_id", "text", token_hash="md5_60").count(),
            "ann": lsh_cosine_candidates(
                e, "vec_id", "embedding", dim=dim, n_planes=10, n_tables=2
            ).count(),
        }
    growth_docs = counts["sf0.1"]["docs"] / counts["sf0.01"]["docs"]
    for k in ("minhash", "simhash", "ann"):
        lo, hi = counts["sf0.01"][k], counts["sf0.1"][k]
        growth = hi / max(lo, 1)
        # near-linear: well under quadratic (growth_docs^2) at 10x data
        assert growth < growth_docs * 4, (k, counts)


def test_minhash_hot_bucket_guard(spark, caplog):
    """Planted degenerate corpus (the r4 verdict's OOM scenario): 10^4
    copies of the same boilerplate doc all land in ONE band bucket. The
    max_bucket guard must complete the query by dropping (and logging)
    the hot bucket instead of materializing ~5·10^7 pairs, while pairs
    from healthy buckets are still emitted."""
    import logging

    from macrobase_spark.operators.dedup import minhash_lsh_candidates

    boiler = "the quick brown fox jumps over the lazy dog again and again"
    rows = [(f"hot-{i:05d}", boiler) for i in range(10_000)]
    # one healthy near-dup pair that must survive the guard
    rows += [("ok-a", "alpha beta gamma delta epsilon zeta"),
             ("ok-b", "alpha beta gamma delta epsilon zeta")]
    d = spark.createDataFrame(rows, "doc_id string, text string").repartition(8)
    with caplog.at_level(logging.WARNING, logger="macrobase_spark.operators.dedup"):
        pairs = minhash_lsh_candidates(d, "doc_id", "text", max_bucket=100).collect()
    got = {(r["doc_a"], r["doc_b"]) for r in pairs}
    assert got == {("ok-a", "ok-b")}  # hot bucket excluded, healthy pair kept
    assert any("dropped" in r.message for r in caplog.records)


def test_minhash_guard_exact_when_under_cap(spark):
    """With every bucket under the cap, the guarded join and the exact
    (max_bucket=None) semantics — the ones the DuckDB oracle replays —
    produce the identical pair set."""
    from macrobase_spark.operators.dedup import minhash_lsh_candidates

    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    exact = {tuple(r) for r in minhash_lsh_candidates(
        d, "doc_id", "text", max_bucket=None).collect()}
    guarded = {tuple(r) for r in minhash_lsh_candidates(
        d, "doc_id", "text", max_bucket=10000).collect()}
    assert exact == guarded and exact

"""RRCF: planted-anomaly recovery, insert/forget tree invariants, and
streaming evolving-forest == driver-replay equivalence."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from macrobase_spark.functions.evaluation import roc_auc
from macrobase_spark.operators.rrcf import (
    Branch,
    RRCFTree,
    fit_rrcf,
    rrcf_score,
    stream_rrcf,
)


@pytest.fixture(scope="module")
def planted():
    rng = np.random.default_rng(7)
    inliers = rng.normal(0.0, 1.0, size=(2000, 3))
    outliers = rng.uniform(-8.0, 8.0, size=(60, 3))
    outliers = outliers[np.abs(outliers).max(axis=1) > 4.0]
    X = np.vstack([inliers, outliers])
    y = np.r_[np.zeros(len(inliers), dtype=int), np.ones(len(outliers), dtype=int)]
    return X, y


def _check_counts(node):
    """Every branch's n equals the sum of its leaves' n."""
    if isinstance(node, Branch):
        ln = _check_counts(node.l)
        rn = _check_counts(node.r)
        assert node.n == ln + rn
        return node.n
    return node.n


def test_rrcf_numpy_auc(planted):
    X, y = planted
    forest = fit_rrcf(X, n_trees=60, subsample=256, seed=1)
    s = np.array([forest.score(x) for x in X])
    assert roc_auc(s, y) > 0.85


def test_insert_forget_invariants():
    rng = np.random.default_rng(0)
    tree = RRCFTree(np.random.default_rng(1))
    X = rng.normal(0, 1, (64, 2))
    tree.build(X)
    n0 = tree.root.n
    assert n0 == 64
    _check_counts(tree.root)
    for i in range(20):
        tree.insert(rng.normal(0, 1, 2))
        _check_counts(tree.root)
    assert tree.root.n == n0 + 20
    for i in range(30):
        tree.forget()
        if tree.root is not None:
            _check_counts(tree.root)
    assert tree.root.n < n0 + 20
    # duplicate insert collapses into the same leaf
    tree2 = RRCFTree(np.random.default_rng(2))
    tree2.build(np.array([[1.0, 1.0], [2.0, 2.0]]))
    tree2.insert(np.array([1.0, 1.0]))
    assert tree2.root.n == 3
    _check_counts(tree2.root)


def test_rrcf_spark_scores(spark, planted):
    X, y = planted
    rows = [(int(i), *map(float, x)) for i, x in enumerate(X)]
    df = spark.createDataFrame(rows, "id long, f0 double, f1 double, f2 double")
    scored = rrcf_score(df, ["f0", "f1", "f2"], ["id"], n_trees=40, seed=3).collect()
    s = np.zeros(len(X))
    for r in scored:
        s[r["id"]] = r["_SCORE"]
    assert roc_auc(s, y) > 0.85


def test_stream_matches_replay(spark, tmp_path, planted):
    import pickle

    X, _ = planted
    forest = fit_rrcf(X[:500], n_trees=8, subsample=128, forget_threshold=200, seed=4)
    blob = pickle.dumps(forest)  # snapshot before either side mutates
    n = 150
    feed = X[500 : 500 + n]

    replay = pickle.loads(blob)
    expect = {i: replay.update_and_score(feed[i]) for i in range(n)}

    rows = [(int(i), "s", *map(float, feed[i])) for i in range(n)]
    df = spark.createDataFrame(rows, "t long, key string, f0 double, f1 double, f2 double")
    src = str(tmp_path / "rrcf_src")
    import time as _time

    for lo in range(0, n, 50):
        df.filter((F.col("t") >= lo) & (F.col("t") < lo + 50)).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        _time.sleep(1.1)
    stream = (
        spark.readStream.schema("t long, key string, f0 double, f1 double, f2 double")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = stream_rrcf(stream, "key", ["f0", "f1", "f2"], "t", pickle.loads(blob))
    q = out.writeStream.format("memory").queryName("rrcfstream").outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    got = {r["t"]: r["score"] for r in spark.sql("select * from rrcfstream").collect()}
    assert len(got) == n
    for t in range(n):
        assert got[t] == pytest.approx(expect[t], rel=1e-9), t


def test_stream_init_blob_applies_forget_threshold():
    """ADVICE r2: the stream's per-key initial forest must carry the
    forget_threshold override, and the caller's forest must not mutate."""
    import pickle

    import numpy as np

    from macrobase_spark.operators.rrcf import _init_blob, fit_rrcf

    rng = np.random.default_rng(3)
    forest = fit_rrcf(rng.normal(size=(64, 3)), n_trees=4, subsample=32, seed=3)
    orig_thr = forest.forget_threshold

    blob = _init_blob(forest, forget_threshold=7)
    assert pickle.loads(blob).forget_threshold == 7
    assert forest.forget_threshold == orig_thr  # caller untouched

    # no override -> fit-time threshold round-trips
    assert pickle.loads(_init_blob(forest, None)).forget_threshold == orig_thr

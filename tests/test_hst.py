"""Half-Space Trees: mass semantics, planted-anomaly recovery, update +
forget mechanics, and streaming == driver-replay equivalence."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from macrobase_spark.functions.evaluation import roc_auc
from macrobase_spark.operators.hst import (
    HSTModel,
    fit_hst,
    hst_mass_update,
    hst_score,
    hst_scores,
    stream_hst,
)


@pytest.fixture(scope="module")
def planted():
    rng = np.random.default_rng(7)
    inliers = rng.normal(0.0, 1.0, size=(2000, 4))
    outliers = rng.uniform(-8.0, 8.0, size=(60, 4))
    outliers = outliers[np.abs(outliers).max(axis=1) > 4.0]
    X = np.vstack([inliers, outliers])
    y = np.r_[np.zeros(len(inliers), dtype=int), np.ones(len(outliers), dtype=int)]
    return X, y


def test_hst_numpy_auc(planted):
    X, y = planted
    model = fit_hst(X, n_trees=60, depth_limit=8, seed=1)
    s = hst_scores(model, X)
    # LOW mass = anomalous → negate for AUC
    assert roc_auc(-s, y) > 0.9


def test_mass_invariants(planted):
    X, _ = planted
    model = fit_hst(X[:500], n_trees=10, depth_limit=6, seed=2)
    # internal masses are consistent: root mass equals the subsample size
    for t in range(model.n_trees):
        assert model.mass[t, 0] == 256  # subsample default
        assert model.mass[t, 1] + model.mass[t, 2] == model.mass[t, 0]


def test_mass_update_and_forget(planted):
    X, _ = planted
    model = fit_hst(X[:500], n_trees=5, depth_limit=6, seed=3)
    before = model.mass[:, 0].copy()
    batch = X[500:600]
    hst_mass_update(model, batch, forget_threshold=0)
    assert np.allclose(model.mass[:, 0], before + len(batch))
    # heap consistency after update
    for t in range(model.n_trees):
        assert model.mass[t, 1] + model.mass[t, 2] == pytest.approx(model.mass[t, 0])
    # forgetting decrements somewhere but keeps heap-sum consistency
    rng = np.random.default_rng(5)
    total_before = model.mass[:, 0].copy()
    hst_mass_update(model, X[600:700], forget_threshold=10, rng=rng)
    for t in range(model.n_trees):
        assert model.mass[t, 1] + model.mass[t, 2] == pytest.approx(model.mass[t, 0])
        assert model.mass[t, 0] < total_before[t] + 100  # decrements applied


def test_hst_spark_scores(spark, planted):
    X, y = planted
    rows = [(int(i), *map(float, x)) for i, x in enumerate(X)]
    df = spark.createDataFrame(rows, "id long, f0 double, f1 double, f2 double, f3 double")
    scored = hst_score(df, ["f0", "f1", "f2", "f3"], ["id"], n_trees=60, depth_limit=8, seed=3).collect()
    s = np.zeros(len(X))
    for r in scored:
        s[r["id"]] = r["_SCORE"]
    assert roc_auc(-s, y) > 0.9


def test_stream_matches_replay(spark, tmp_path, planted):
    X, _ = planted
    model = fit_hst(X[:1000], n_trees=10, depth_limit=6, seed=4)
    n, W = 300, 100
    feed = X[1000 : 1000 + n]
    rows = [(int(i), "s", *map(float, feed[i])) for i in range(n)]
    df = spark.createDataFrame(rows, "t long, key string, f0 double, f1 double, f2 double, f3 double")

    # driver replay with the same kernels and the same per-(key,window) rng
    import copy

    m = HSTModel(model.feat, model.thr, model.mass.copy(), model.depth_limit)
    expect = {}
    for wid in range(n // W):
        win = feed[wid * W : (wid + 1) * W]
        s = hst_scores(m, win)
        kseed = int.from_bytes(b"s".ljust(8, b"\0"), "little")
        rng = np.random.default_rng((kseed ^ (wid * 0x9E3779B9)) % (2**32))
        hst_mass_update(m, win, 50, rng)
        for j in range(W):
            expect[wid * W + j] = (wid, pytest.approx(float(s[j])))

    src = str(tmp_path / "hst_src")
    import time as _time

    for lo in range(0, n, 100):
        df.filter((F.col("t") >= lo) & (F.col("t") < lo + 100)).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        _time.sleep(1.1)
    stream = (
        spark.readStream.schema("t long, key string, f0 double, f1 double, f2 double, f3 double")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = stream_hst(
        stream, "key", ["f0", "f1", "f2", "f3"], "t", model,
        window_size=W, forget_threshold=50,
    )
    q = out.writeStream.format("memory").queryName("hststream").outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    got = {
        r["t"]: (r["window_id"], r["score"])
        for r in spark.sql("select * from hststream").collect()
    }
    assert len(got) == len(expect)
    for t, (wid, s) in expect.items():
        assert got[t][0] == wid
        assert got[t][1] == s

"""MCOD distance-based windowed outliers: kernel vs brute force, batch
replay vs a pure-python reference, stream == batch equivalence, and
planted-outlier recovery."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from macrobase_spark.operators.mcod import mcod_batch, neighbor_counts, stream_mcod


def brute_reference(vals, W, S, R, k):
    """Pure-python MCOD replay: {time: (wid, count)} for each point's
    arrival window."""
    n = len(vals)
    out = {}
    n_win = max((n - W) // S + 1 if n >= W else 0, 0)
    for wid in range(n_win):
        members = list(range(wid * S, wid * S + W))
        for i in members:
            if not (i >= wid * S + W - S or wid == 0):
                continue
            c = sum(
                1 for j in members if j != i and abs(vals[i] - vals[j]) <= R
            )
            out[i] = (wid, c)
    return out


def test_neighbor_counts_kernel():
    X = np.array([[0.0], [0.5], [1.0], [10.0]])
    assert list(neighbor_counts(X, 0.6)) == [1, 2, 1, 0]
    assert list(neighbor_counts(X, 100.0)) == [3, 3, 3, 3]
    assert list(neighbor_counts(np.empty((0, 2)), 1.0)) == []


def test_batch_matches_brute_reference(spark):
    rng = np.random.default_rng(3)
    vals = rng.normal(0, 10, 250).round(2)
    W, S, R, k = 100, 40, 3.0, 5
    ref = brute_reference(vals, W, S, R, k)
    df = spark.createDataFrame(
        [(int(i), float(v)) for i, v in enumerate(vals)], "t long, value double"
    )
    got = {
        r["t"]: (r["window_id"], r["neighbor_count"], r["is_outlier"])
        for r in mcod_batch(
            df, ["value"], "t", max_distance=R, min_neighbors=k,
            window_size=W, slide=S,
        ).collect()
    }
    assert set(got) == set(ref)
    for t, (wid, c) in ref.items():
        assert got[t] == (wid, c, c < k), f"t={t}"


def test_batch_planted_outliers(spark):
    """Dense cluster + far-away singletons: exactly the singletons flag."""
    rows = []
    for i in range(600):
        v = 1000.0 + i if i % 97 == 0 else float(i % 10)
        rows.append((int(i), v))
    df = spark.createDataFrame(rows, "t long, value double")
    res = mcod_batch(
        df, ["value"], "t", max_distance=5.0, min_neighbors=10,
        window_size=200, slide=100,
    ).collect()
    flagged = {r["t"] for r in res if r["is_outlier"]}
    planted = {i for i in range(600) if i % 97 == 0}
    scored = {r["t"] for r in res}
    assert flagged == planted & scored
    assert len(flagged) >= 4


def test_stream_matches_batch(spark, tmp_path):
    rng = np.random.default_rng(9)
    rows = [
        (int(i), "k1" if i % 2 == 0 else "k2", float(v))
        for i, v in enumerate(rng.normal(0, 8, 400).round(2))
    ]
    df = spark.createDataFrame(rows, "t long, key string, value double")
    W, S, R, k = 60, 30, 2.5, 4

    batch = {
        (r["key"], r["t"]): (r["window_id"], r["neighbor_count"])
        for key in ("k1", "k2")
        for r in mcod_batch(
            df.filter(F.col("key") == key), ["value"], "t",
            max_distance=R, min_neighbors=k, window_size=W, slide=S,
        ).withColumn("key", F.lit(key)).collect()
    }

    src = str(tmp_path / "mcod_src")
    # 4 files written SEQUENTIALLY (distinct mtimes) → the file stream
    # replays them in t order, one micro-batch each, exercising cross-batch
    # state carry; count-window semantics require in-order arrival per key
    import time as _time

    for lo in range(0, 400, 100):
        df.filter((F.col("t") >= lo) & (F.col("t") < lo + 100)).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        _time.sleep(1.1)
    stream = (
        spark.readStream.schema("t long, key string, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = stream_mcod(
        stream, "key", ["value"], "t",
        max_distance=R, min_neighbors=k, window_size=W, slide=S,
    )
    q = (
        out.writeStream.format("memory").queryName("mcodstream")
        .outputMode("append").start()
    )
    q.processAllAvailable()
    q.stop()
    got = {
        (r["key"], r["t"]): (r["window_id"], r["neighbor_count"])
        for r in spark.sql("select * from mcodstream").collect()
    }
    assert got == batch


def test_stream_with_idle_timeout_smoke(spark, tmp_path):
    """idle_timeout_ms enables ProcessingTimeTimeout state GC; within one
    fast run the timeout never fires, so results equal the no-timeout path."""
    rng = np.random.default_rng(2)
    rows = [(int(i), "k", float(v)) for i, v in enumerate(rng.normal(0, 5, 120))]
    df = spark.createDataFrame(rows, "t long, key string, value double")
    src = str(tmp_path / "mcod_to_src")
    df.coalesce(1).write.parquet(src)
    stream = (
        spark.readStream.schema("t long, key string, value double").parquet(src)
    )
    out = stream_mcod(
        stream, "key", ["value"], "t", max_distance=2.0, min_neighbors=3,
        window_size=50, slide=25, idle_timeout_ms=600_000,
    )
    ref = {
        r["t"] for r in mcod_batch(
            df, ["value"], "t", max_distance=2.0, min_neighbors=3,
            window_size=50, slide=25,
        ).collect()
    }
    q = out.writeStream.format("memory").queryName("mcodto").outputMode("append").start()
    # with ProcessingTimeTimeout the engine keeps scheduling timeout-check
    # batches, so processAllAvailable() never returns — poll instead
    import time as _time

    deadline = _time.time() + 90
    got: set = set()
    while _time.time() < deadline and len(got) < len(ref):
        _time.sleep(1.0)
        got = {r["t"] for r in spark.sql("select * from mcodto").collect()}
    q.stop()
    assert got == ref


def test_keyed_mcod_plan_fully_partitioned(spark):
    """Scale guard: the keyed flagship's plan must contain NO
    single-partition exchange — every window and aggregation is
    hashpartitioned on the stream key."""
    from macrobase_spark.queries import QUERIES

    df = QUERIES["mcod_outliers_keyed"](spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "SinglePartition" not in plan
    assert "hashpartitioning(event_type" in plan

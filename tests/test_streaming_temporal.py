"""Streaming temporal joins == their batch twins: the stateful as-of
enrichment replayed file-by-file matches operators/temporal.asof_join,
and the native interval stream-stream join matches the bucketized batch
range join (inner flavor)."""

import datetime as dt

from pyspark.sql import functions as F

from macrobase_spark.operators.temporal import asof_join, range_join_candidates
from macrobase_spark.streaming.temporal import stream_asof_join, stream_range_join

T0 = dt.datetime(2024, 1, 1)


def _mk_tables(spark):
    """Two keys, interleaved probe/ref rows over one hour, time-ordered."""
    probes, refs = [], []
    for i in range(60):
        k = "a" if i % 2 == 0 else "b"
        ts = T0 + dt.timedelta(minutes=i)
        if i % 3 == 0:
            refs.append((k, ts, float(i)))
        else:
            probes.append((i, k, ts, float(100 + i)))
    p = spark.createDataFrame(probes, "id long, k string, ts timestamp, v double")
    r = spark.createDataFrame(refs, "k string, rts timestamp, rv double")
    return p, r


def _file_stream(spark, df, path, schema):
    df.orderBy(*[c for c in df.columns if "ts" in c]).coalesce(1).write.mode(
        "overwrite"
    ).parquet(path)
    import glob
    import os
    import shutil

    merged = path + "_in"
    os.makedirs(merged, exist_ok=True)
    for i, f in enumerate(sorted(glob.glob(f"{path}/part-*.parquet"))):
        shutil.copy(f, f"{merged}/{i:03d}.parquet")
    return (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(merged)
    )


def test_stream_asof_matches_batch(spark, tmp_path):
    p, r = _mk_tables(spark)
    batch = (
        asof_join(p, r, on=["k"], ts_col="ts", right_ts_col="rts", carry_cols=["rv"])
        .select("id", "ts_asof", "rv_asof")
        .collect()
    )
    want = sorted((x["id"], x["ts_asof"], x["rv_asof"]) for x in batch)

    ps = _file_stream(spark, p, str(tmp_path / "p"), "id long, k string, ts timestamp, v double")
    rs = _file_stream(spark, r, str(tmp_path / "r"), "k string, rts timestamp, rv double")
    out = stream_asof_join(
        ps, rs, on=["k"], ts_col="ts", right_ts_col="rts", carry_cols=["rv"]
    )
    q = out.writeStream.format("memory").queryName("sa").outputMode("append").start()
    try:
        q.processAllAvailable()
        got = sorted(
            (x["id"], x["ts_asof"], x["rv_asof"]) for x in spark.table("sa").collect()
        )
    finally:
        q.stop()
    assert got == want
    # probe payload passes through
    q2 = (
        stream_asof_join(ps, rs, on=["k"], ts_col="ts", right_ts_col="rts", carry_cols=["rv"])
        .writeStream.format("memory").queryName("sa2").outputMode("append").start()
    )
    try:
        q2.processAllAvailable()
        row = {x["id"]: x for x in spark.table("sa2").collect()}
    finally:
        q2.stop()
    assert row[1]["v"] == 101.0 and row[1]["k"] == "b"


def test_stream_range_join_matches_batch(spark, tmp_path):
    p, r = _mk_tables(spark)
    ten_min = 10 * 60 * 1_000_000
    batch = (
        range_join_candidates(
            p, r, on=["k"], probe_ts="ts", ref_ts="rts", lower_us=-ten_min, upper_us=0,
            how="inner",
        )
        .select("id", "ref_lag_us", "rv")
        .collect()
    )
    want = sorted((x["id"], x["ref_lag_us"], x["rv"]) for x in batch)
    assert len(want) > 10  # non-trivial match set

    ps = _file_stream(spark, p, str(tmp_path / "p2"), "id long, k string, ts timestamp, v double")
    rs = _file_stream(spark, r, str(tmp_path / "r2"), "k string, rts timestamp, rv double")
    out = stream_range_join(
        ps, rs, on=["k"], probe_ts="ts", ref_ts="rts",
        lower_us=-ten_min, upper_us=0,
        probe_watermark="0 seconds", ref_watermark="0 seconds",
    ).select(
        "id",
        (F.unix_micros(F.col("rts").cast("timestamp"))
         - F.unix_micros(F.col("ts").cast("timestamp"))).alias("ref_lag_us"),
        "rv",
    )
    q = out.writeStream.format("memory").queryName("sr").outputMode("append").start()
    try:
        q.processAllAvailable()
        got = sorted(
            (x["id"], x["ref_lag_us"], x["rv"]) for x in spark.table("sr").collect()
        )
    finally:
        q.stop()
    assert got == want


def test_stream_asof_state_carries_across_batches(spark, tmp_path):
    """A ref in micro-batch 1 must enrich a probe arriving in batch 3 —
    the single-row state survives empty-of-ref batches."""
    import os

    merged_p = str(tmp_path / "mp"); os.makedirs(merged_p)
    merged_r = str(tmp_path / "mr"); os.makedirs(merged_r)
    # batch 0: one ref; batches 1..3: probes only
    spark.createDataFrame(
        [("a", T0, 7.0)], "k string, rts timestamp, rv double"
    ).coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "r0"))
    import glob
    import shutil

    shutil.copy(glob.glob(str(tmp_path / "r0") + "/part-*.parquet")[0], f"{merged_r}/000.parquet")
    for i in range(1, 4):
        spark.createDataFrame(
            [(i, "a", T0 + dt.timedelta(minutes=i), 0.0)],
            "id long, k string, ts timestamp, v double",
        ).coalesce(1).write.mode("overwrite").parquet(str(tmp_path / f"p{i}"))
        shutil.copy(
            glob.glob(str(tmp_path / f"p{i}") + "/part-*.parquet")[0],
            f"{merged_p}/{i:03d}.parquet",
        )
    ps = (
        spark.readStream.schema("id long, k string, ts timestamp, v double")
        .option("maxFilesPerTrigger", 1).parquet(merged_p)
    )
    rs = (
        spark.readStream.schema("k string, rts timestamp, rv double")
        .option("maxFilesPerTrigger", 1).parquet(merged_r)
    )
    out = stream_asof_join(ps, rs, on=["k"], ts_col="ts", right_ts_col="rts", carry_cols=["rv"])
    q = out.writeStream.format("memory").queryName("sc").outputMode("append").start()
    try:
        q.processAllAvailable()
        got = {x["id"]: x["rv_asof"] for x in spark.table("sc").collect()}
    finally:
        q.stop()
    assert got == {1: 7.0, 2: 7.0, 3: 7.0}

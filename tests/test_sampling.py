"""Deterministic hash sampling/splitting: cross-engine hash equality,
determinism under repartitioning, rate accuracy, split stability when a
new split is appended, and Spark/DuckDB agreement of both registered
queries."""

import duckdb
import pytest
from pyspark.sql import functions as F

from macrobase_spark.functions.sampling import (
    split_assign,
    stratified_sample,
    unit_hash,
)
from macrobase_spark.queries import ORACLES, QUERIES

SF = "/root/testdata/sf0.01"


def test_unit_hash_matches_duckdb(spark):
    df = spark.range(0, 500).select(
        F.col("id"), unit_hash(F.col("id")).alias("u")
    )
    got = {r["id"]: r["u"] for r in df.collect()}
    want = dict(
        duckdb.sql(
            "SELECT i, CAST(('0x' || substr(md5(CAST(i AS VARCHAR)), 1, 8)) AS UBIGINT)"
            " / 4294967296.0 FROM range(500) t(i)"
        ).fetchall()
    )
    for k in want:
        assert got[k] == want[k]  # bit-identical, not approx


def test_sample_is_partition_independent(spark):
    base = spark.range(0, 2000)
    a = set(r["id"] for r in stratified_sample(base, "id", rates=0.3).collect())
    b = set(
        r["id"]
        for r in stratified_sample(base.repartition(17), "id", rates=0.3).collect()
    )
    assert a == b
    assert abs(len(a) / 2000 - 0.3) < 0.05


def test_split_rates_and_stability(spark):
    base = spark.range(0, 5000)
    s1 = {r["id"]: r["split"] for r in split_assign(base, "id").collect()}
    counts = {}
    for v in s1.values():
        counts[v] = counts.get(v, 0) + 1
    assert abs(counts["train"] / 5000 - 0.8) < 0.03
    assert abs(counts["val"] / 5000 - 0.1) < 0.02
    # splitting val into val+calib must not move any train row
    s2 = {
        r["id"]: r["split"]
        for r in split_assign(
            base, "id", {"train": 0.8, "val": 0.05, "calib": 0.05, "test": 0.1}
        ).collect()
    }
    for k, v in s1.items():
        if v == "train":
            assert s2[k] == "train"
        elif v == "test":
            assert s2[k] == "test"


def test_sample_filter_reaches_scan(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = (
        stratified_sample(docs, "doc_id", rates=0.1)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan  # map-only: filter fused into the scan stage
    assert "PythonUDF" not in plan


@pytest.mark.parametrize(
    "name", ["split_balance_documents", "stratified_sample_documents"]
)
def test_registered_queries_match_oracle(spark, name):
    got = sorted(tuple(r) for r in QUERIES[name](spark, SF).collect())
    want = sorted(duckdb.sql(ORACLES[name]).fetchall())
    assert len(got) == len(want)
    for g, w in zip(got, want):
        for gv, wv in zip(g, w):
            if isinstance(wv, float):
                assert gv == pytest.approx(wv, abs=1e-9)
            else:
                assert gv == wv


def test_weighted_sample_skews_heavy(spark):
    from macrobase_spark.functions.sampling import weighted_sample

    df = spark.range(0, 4000).withColumn(
        "w", (F.col("id") % 10 + 1).cast("double")
    )
    kept = weighted_sample(df, "id", "w", rate=0.2).collect()
    frac = len(kept) / 4000
    assert abs(frac - 0.2) < 0.04
    avg_kept = sum(r["w"] for r in kept) / len(kept)
    assert avg_kept > 6.0  # population mean is 5.5 — kept mass skews heavy


def test_weighted_sample_registered_matches_oracle(spark):
    got = sorted(tuple(r) for r in QUERIES["weighted_sample_documents"](spark, SF).collect())
    want = sorted(duckdb.sql(ORACLES["weighted_sample_documents"]).fetchall())
    assert len(got) == len(want)
    for g, w in zip(got, want):
        for gv, wv in zip(g, w):
            if isinstance(wv, float):
                assert gv == pytest.approx(wv, abs=1e-6)
            else:
                assert gv == wv

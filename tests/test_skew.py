"""Salting primitives: result-equivalence with the unsalted plans, the
salted shuffle shape, and determinism of the row salt."""

import pytest
from pyspark.sql import functions as F

from macrobase_spark.functions.skew import (
    SALT,
    salted_aggregate,
    salted_collect_set,
    salted_join,
    with_salt,
)


@pytest.fixture(scope="module")
def skewed(spark):
    """1000 rows, ~70% on one hot key — the clips fixture's codec shape."""
    return (
        spark.range(1000)
        .select(
            F.when(F.col("id") % 10 < 7, F.lit("opus"))
            .when(F.col("id") % 10 < 9, F.lit("flac"))
            .otherwise(F.lit("aac"))
            .alias("codec"),
            (F.col("id") % 97).alias("val"),
            F.col("id"),
        )
    )


def test_salted_aggregate_matches_plain_count(spark, skewed):
    got = salted_aggregate(
        skewed,
        ["codec"],
        partial={"n": F.count(F.lit(1)), "s": F.sum("val")},
        merge={"n": F.sum("n"), "s": F.sum("s")},
        n_salt=8,
    )
    want = skewed.groupBy("codec").agg(
        F.count(F.lit(1)).alias("n"), F.sum("val").alias("s")
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_salted_collect_set_matches_plain(spark, skewed):
    got = {
        r["codec"]: r["val_set"]
        for r in salted_collect_set(skewed, ["codec"], "val", n_salt=8).collect()
    }
    want = {
        r["codec"]: sorted(r["w"])
        for r in skewed.groupBy("codec").agg(F.collect_set("val").alias("w")).collect()
    }
    assert got == want


def test_salted_aggregate_shuffles_on_salt_first(spark, skewed):
    """Stage-1 exchange must partition on (keys + salt) — that IS the skew
    spread; stage 2 merges n_salt rows per key."""
    df = salted_aggregate(
        skewed,
        ["codec"],
        partial={"n": F.count(F.lit(1))},
        merge={"n": F.sum("n")},
        n_salt=8,
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert f"hashpartitioning(codec#" in plan
    assert SALT in plan  # the first exchange carries the salt column


@pytest.mark.parametrize("how", ["inner", "left", "left_anti"])
def test_salted_join_matches_plain(spark, skewed, how):
    dim = spark.createDataFrame(
        [("opus", "lossy"), ("flac", "lossless")], "codec string, kind string"
    )
    got = salted_join(skewed, dim, ["codec"], n_salt=8, how=how)
    want = skewed.join(dim, ["codec"], how)
    assert SALT not in got.columns
    assert sorted(got.columns) == sorted(want.columns)
    key = [c for c in ["codec", "id", "kind"] if c in got.columns]
    assert sorted(map(tuple, got.select(*key).collect())) == sorted(
        map(tuple, want.select(*key).collect())
    )


def test_salted_join_rejects_dim_preserving(spark, skewed):
    dim = spark.createDataFrame([("opus", 1)], "codec string, x int")
    with pytest.raises(ValueError, match="fact-preserving"):
        salted_join(skewed, dim, ["codec"], how="full")


def test_row_salt_is_deterministic(spark, skewed):
    """Same row -> same salt on independent evaluations (speculative-task /
    recompute safety: rand() would violate this)."""
    a = with_salt(skewed, 16).collect()
    b = with_salt(skewed, 16).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    assert all(0 <= r[SALT] < 16 for r in a)


def test_n_salt_one_degenerates_to_plain(spark, skewed):
    got = salted_collect_set(skewed, ["codec"], "val", n_salt=1)
    assert got.count() == 3

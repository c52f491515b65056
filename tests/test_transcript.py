"""Transcript-integrity operator: planted-mutation recovery, status
semantics, and determinism across parallelism (the scaling prerequisite)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from macrobase_spark.operators.transcript import (
    _mutate,
    _ref_transcript,
    generate_transcript_pairs,
    transcript_integrity,
    transcript_violations,
)


def test_status_semantics(spark):
    df = spark.createDataFrame(
        [
            ("a", None, "the quick brown fox"),
            ("b", "", "the quick brown fox"),
            ("c", "the quick brown fox", "the quick brown fox"),
            ("d", "the quick brown fix", "the quick brown fox"),  # 1/19 ≈ .053
            ("e", "totally different words", "the quick brown fox"),
        ],
        "clip_id string, transcript string, ref_transcript string",
    )
    got = {
        r["clip_id"]: (r["status"], r["edit_dist"])
        for r in transcript_integrity(df, drift_rel=0.06).collect()
    }
    assert got["a"] == ("null_transcript", None)
    assert got["b"] == ("empty_transcript", None)
    assert got["c"] == ("ok", 0)
    assert got["d"] == ("drift", 1)
    assert got["e"][0] == "mismatch" and got["e"][1] > 1


def test_planted_mutations_recovered(spark):
    """Every planted residue class lands in a non-ok status, every clean
    row is ok, and the violation count matches the symbolic plant."""
    n = 3000
    df = generate_transcript_pairs(spark, n)
    scored = transcript_integrity(df).withColumn(
        "i", F.regexp_extract("clip_id", r"(\d+)", 1).cast("long")
    )
    rows = {r["i"]: r["status"] for r in scored.collect()}
    assert len(rows) == n
    for i, st in rows.items():
        if i % 211 == 3:
            assert st == "null_transcript", i
        elif i % 503 == 11:
            assert st == "empty_transcript", i
        elif i % 17 == 4 or i % 29 == 8:
            assert st in ("drift", "mismatch"), i
        elif i % 23 == 6:
            # single-word refs can't drop a word -> stays ok
            assert st in ("ok", "drift", "mismatch"), i
        else:
            assert st == "ok", i
    # the plant is dense enough to be a real fixture
    bad = transcript_violations(df).count()
    assert bad > n * 0.08


def test_mutation_is_pure_function_of_id():
    for i in (4, 6, 8, 3 + 211, 11 + 503, 100):
        ref = _ref_transcript(i, 12)
        assert _mutate(i, ref) == _mutate(i, ref)
        assert _ref_transcript(i, 12) == ref


def test_parallelism_invariance(spark):
    """Identical relation at 2 and 16 partitions — required for the
    N-vs-4N scaling comparison to be apples-to-apples."""
    a = generate_transcript_pairs(spark, 500, partitions=2)
    b = generate_transcript_pairs(spark, 500, partitions=16)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_plan_is_map_only(spark):
    """The violation filter must not shuffle: no Exchange in the plan."""
    df = spark.createDataFrame(
        [("a", "x y", "x y")], "clip_id string, transcript string, ref_transcript string"
    )
    plan = transcript_violations(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan

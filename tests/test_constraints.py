"""Declarative constraint suite: every constraint type evaluated against a
hand-computable fixture, single-pass compilation, and check verdict
roll-up."""

import pytest
from pyspark.sql import functions as F

from macrobase_spark.operators import constraints
from macrobase_spark.operators.constraints import Check, suite_status, verify


@pytest.fixture(scope="module")
def df(spark):
    rows = [
        # id, key, val, cat, txt
        (0, "k0", 10.0, "a", "doc_000"),
        (1, "k1", 20.0, "a", "doc_001"),
        (2, "k2", 30.0, "b", "doc_002"),
        (3, "k3", None, "b", "doc_003"),
        (4, "k4", 50.0, "c", "bad id"),
        (5, "k4", 60.0, "z", "doc_005"),  # dup key, stray category
    ]
    return spark.createDataFrame(rows, "id long, key string, val double, cat string, txt string")


def _res(results):
    return {
        (r["check"], r["constraint"], r["column"]): (r["value"], r["status"])
        for r in results.collect()
    }


def test_all_constraint_types_one_pass(df):
    checks = [
        Check("size", "error").has_size(min_rows=6, max_rows=6),
        Check("null", "error").is_complete("key").has_completeness("val", 0.8),
        Check("uniq", "error").is_unique("key").has_distinctness("id", 1.0),
        Check("range", "warning")
        .has_min("val", at_least=5)
        .has_max("val", at_most=55)
        .has_mean("val", at_least=30, at_most=40)
        .has_sum("val", at_least=170, at_most=170)
        .has_quantile("val", 0.5, at_least=30, at_most=30),
        Check("pred", "error")
        .satisfies("val IS NULL OR val >= 10", "val_floor", 1.0)
        .is_contained_in("cat", ["a", "b", "c"], min_ratio=0.8)
        .has_pattern("txt", "^doc_[0-9]{3}$", min_ratio=0.8),
    ]
    r = _res(verify(df, checks))
    assert r[("size", "has_size", "*")] == (6.0, "pass")
    assert r[("null", "has_completeness", "key")] == (1.0, "pass")
    # 5/6 vals present
    assert r[("null", "has_completeness", "val")] == (round(5 / 6, 6), "pass")
    # 5 distinct keys over 6 non-null values
    assert r[("uniq", "has_distinctness", "key")] == (round(5 / 6, 6), "fail")
    assert r[("uniq", "has_distinctness", "id")] == (1.0, "pass")
    assert r[("range", "has_min", "val")] == (10.0, "pass")
    assert r[("range", "has_max", "val")] == (60.0, "fail")
    assert r[("range", "has_mean", "val")] == (34.0, "pass")
    assert r[("range", "has_sum", "val")] == (170.0, "pass")
    assert r[("range", "has_quantile", "val")] == (30.0, "pass")
    assert r[("pred", "satisfies:val_floor", "*")] == (1.0, "pass")
    # cat: 5/6 in {a,b,c}
    assert r[("pred", "satisfies:cat_contained", "*")] == (round(5 / 6, 6), "pass")
    assert r[("pred", "has_pattern:txt", "txt")] == (round(5 / 6, 6), "pass")


def test_suite_status_rollup(df):
    checks = [
        Check("good", "error").is_complete("key"),
        Check("bad", "error").is_unique("key").is_complete("key"),
        Check("warned", "warning").has_max("val", at_most=55),
    ]
    v = {r["check"]: (r["verdict"], r["n_failed"]) for r in
         suite_status(verify(df, checks)).collect()}
    assert v["good"] == ("pass", 0)
    assert v["bad"] == ("fail", 1)
    assert v["warned"] == ("warning", 1)


def test_approx_uniqueness_no_expand(df):
    """approx=True swaps exact distinct for the HLL sketch: value is
    sketch-exact at this cardinality and the plan carries no Expand."""
    exact = verify(df, [Check("u").is_unique("key")]).collect()[0]
    approx_res = verify(df, [Check("u").is_unique("key", approx=True)]).collect()[0]
    assert approx_res["value"] == exact["value"]
    agg = df.agg(
        (
            F.hll_sketch_estimate(F.hll_sketch_agg(F.col("key"))).cast("double")
            / F.count("key")
        ).alias("r")
    )
    assert "Expand" not in agg._jdf.queryExecution().executedPlan().toString()
    mixed = df.agg(
        F.count_distinct("key").alias("d"),
        F.count_distinct("id").alias("d2"),
        F.count(F.lit(1)).alias("n"),
    )
    assert "Expand" in mixed._jdf.queryExecution().executedPlan().toString()


def test_grouped_verify_per_partition_verdicts(df):
    """group_by= evaluates the suite once per partition value in ONE
    grouped aggregation — per-partition pass/fail verdicts."""
    checks = [Check("vals", "error").has_max("val", at_most=35).is_complete("val")]
    res = verify(df, checks, group_by=["cat"])
    rows = {(r["cat"], r["constraint"]): r["status"] for r in res.collect()}
    assert rows[("a", "has_max")] == "pass"   # max 20
    assert rows[("c", "has_max")] == "fail"   # max 50
    assert rows[("z", "has_max")] == "fail"   # max 60
    assert rows[("b", "has_completeness")] == "fail"  # the NULL val row
    assert rows[("a", "has_completeness")] == "pass"
    assert res.count() == 4 * 2
    # one aggregate, no join/second scan in the plan
    plan = res._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan


def test_null_metric_fails(spark):
    """min over zero matching rows is NULL -> constraint fails, not crashes."""
    df = spark.createDataFrame([], "x double")
    r = verify(df, [Check("c").has_min("x", at_least=0)]).collect()[0]
    assert r["value"] is None and r["status"] == "fail"


def test_satisfies_null_counts_as_fail(spark):
    df = spark.createDataFrame([(None,), (4.0,)], "x double")
    r = verify(df, [Check("c").satisfies("x > 3", "x_gt3", 1.0)]).collect()[0]
    assert r["value"] == 0.5 and r["status"] == "fail"


def test_empty_checks(df):
    assert verify(df, []).count() == 0
    assert verify(df, [Check("empty")]).count() == 0


def test_clips_constraint_suite_shape(spark):
    """The registered clips suite finds the planted violations: duplicate
    clip_ids fail the keys check; schema completeness passes."""
    from macrobase_spark.queries import QUERIES

    res = QUERIES["clips_constraint_suite"](spark, "/root/testdata/sf0.001")
    rows = {(r["check"], r["constraint"], r["column"]): r for r in res.collect()}
    assert rows[("keys", "has_distinctness", "clip_id")]["status"] == "fail"
    assert rows[("schema", "has_completeness", "clip_id")]["status"] == "pass"
    assert rows[("schema", "has_pattern:clip_id", "clip_id")]["status"] == "pass"
    assert rows[("content", "satisfies:codec_contained", "*")]["status"] == "pass"


def test_checks_from_config_matches_programmatic(df):
    from macrobase_spark.operators.constraints import checks_from_config

    conf = {
        "checks": [
            {
                "name": "size",
                "constraints": [{"type": "has_size", "min_rows": 6, "max_rows": 6}],
            },
            {
                "name": "range",
                "level": "warning",
                "constraints": [
                    {"type": "has_min", "column": "val", "at_least": 5},
                    {"type": "has_quantile", "column": "val", "q": 0.5,
                     "at_least": 30, "at_most": 30},
                    {"type": "satisfies", "condition": "val IS NULL OR val >= 10",
                     "name": "val_floor", "min_ratio": 1.0},
                ],
            },
        ]
    }
    got = _res(verify(df, checks_from_config(conf)))
    want = _res(
        verify(
            df,
            [
                Check("size", "error").has_size(min_rows=6, max_rows=6),
                Check("range", "warning")
                .has_min("val", at_least=5)
                .has_quantile("val", 0.5, at_least=30, at_most=30)
                .satisfies("val IS NULL OR val >= 10", "val_floor", 1.0),
            ],
        )
    )
    assert got == want


def test_config_errors_carry_position(df):
    from macrobase_spark.operators.constraints import checks_from_config

    with pytest.raises(ValueError, match=r"checks\[0\].*'name'"):
        checks_from_config([{"level": "error"}])
    with pytest.raises(ValueError, match=r"constraints\[0\].*unknown constraint type"):
        checks_from_config([{"name": "x", "constraints": [{"type": "has_magic"}]}])
    with pytest.raises(ValueError, match=r"bad arguments for has_min"):
        checks_from_config(
            [{"name": "x", "constraints": [{"type": "has_min", "wat": 1}]}]
        )


def test_verify_config_group_by(df):
    from macrobase_spark.operators.constraints import verify_config

    conf = {
        "group_by": ["cat"],
        "checks": [
            {"name": "g", "constraints": [{"type": "has_size", "min_rows": 2}]}
        ],
    }
    rows = {r["cat"]: r["status"] for r in verify_config(df, conf).collect()}
    assert rows == {"a": "pass", "b": "pass", "c": "fail", "z": "fail"}


def test_schema_check_all_issue_classes(spark):
    df = spark.createDataFrame(
        [("a", 1, 2.0)], "clip_id string, sr_hz int, extra double"
    )
    got = {
        tuple(r)
        for r in constraints.schema_check(
            df,
            [("clip_id", "string"), ("sr_hz", "bigint"), ("language", "string")],
            allow_extra=False,
        ).collect()
    }
    assert got == {
        ("sr_hz", "type_mismatch", "bigint", "int"),
        ("language", "missing", "string", None),
        ("extra", "unexpected", None, "double"),
    }
    # a conforming schema yields zero violations (extras allowed)
    ok = constraints.schema_check(
        df, [("clip_id", "string"), ("sr_hz", "int")], allow_extra=True
    )
    assert ok.count() == 0


def test_schema_check_nullable_and_dict_form(spark):
    df = spark.createDataFrame([("a",)], "clip_id string")  # nullable column
    viol = constraints.schema_check(
        df,
        [{"name": "clip_id", "type": "string", "nullable": False}],
        check_nullable=True,
    ).collect()
    assert [(r["column"], r["issue"]) for r in viol] == [
        ("clip_id", "nullable_mismatch")
    ]
    cols, allow_extra, check_nullable = constraints.schema_from_config(
        {"columns": [{"name": "clip_id", "type": "string"}], "allow_extra": False}
    )
    assert not allow_extra and not check_nullable
    assert constraints.schema_check(df, cols, allow_extra).count() == 0

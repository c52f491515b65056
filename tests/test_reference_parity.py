"""Ports of the reference's own unit-test assertions (exact expected
numbers hard-coded in lib/src/test — reference
APLOutlierSummarizerTest.java:18-84), run against this engine."""

import os

import pytest
from pyspark.sql import functions as F

from macrobase_spark.operators.classify import percentile_classify
from macrobase_spark.operators.explain import ExplainParams, explain
from macrobase_spark.sources.csv_source import load_csv

SAMPLE = "/root/reference/lib/src/test/resources/sample.csv"

pytestmark = pytest.mark.skipif(
    not os.path.isfile(SAMPLE), reason="reference fixtures absent"
)


def test_apl_outlier_summarizer_simple(spark):
    """percentile(usage, 1.0) + explain(location, version) at support .01 /
    ratio 10 → exactly 1 result over 20 outliers (reference testSimple)."""
    df = load_csv(spark, SAMPLE, double_cols=["usage", "latency"])
    classified = percentile_classify(df, "usage", percentile=1.0, method="r6")
    assert classified.agg(F.sum("_OUTLIER")).collect()[0][0] == pytest.approx(20.0)
    res = explain(
        classified,
        ExplainParams(
            attributes=["location", "version"],
            min_support=0.01,
            min_ratio_metric=10.0,
            ratio_metric="global_ratio",
            max_order=3,
        ),
    ).collect()
    assert len(res) == 1


def test_apl_outlier_summarizer_order3_cube(spark):
    """Hand-built 4-row cube (reference testOrder3): support .1, ratio 3.0 →
    exactly one result whose itemset contains col1=a1 (the reference asserts
    results.size()==1 and prettyPrint contains 'col1=a1'; the surviving
    itemset is the (a1,b1,c1) triple: 30 of its 100 rows are outliers,
    global_ratio 8.3)."""
    rows = [
        ("a1", "b1", "c1", 100.0, 30.0),
        ("a2", "b1", "c1", 300.0, 5.0),
        ("a1", "b2", "c1", 400.0, 5.0),
        ("a1", "b1", "c2", 500.0, 7.0),
    ]
    df = spark.createDataFrame(rows, ["col1", "col2", "col3", "counts", "oCounts"])
    res = explain(
        df,
        ExplainParams(
            attributes=["col1", "col2", "col3"],
            outlier_col="oCounts",
            count_col="counts",
            min_support=0.1,
            min_ratio_metric=3.0,
            ratio_metric="global_ratio",
            max_order=3,
        ),
    ).collect()
    assert len(res) == 1
    assert res[0]["col1"] == "a1"
    assert res[0]["outlier_count"] == pytest.approx(30.0)
    assert res[0]["total_count"] == pytest.approx(100.0)
    assert res[0]["support"] == pytest.approx(30.0 / 47.0)

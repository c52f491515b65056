"""FPGrowth explainer vs APriori explainer cross-check — the Spark rendering
of the reference's FPGrowth-vs-naive-Apriori test
(lib/src/test/java/.../fpg/FPGrowthTest.java)."""

import pytest
from pyspark.sql import functions as F

from macrobase_spark.operators.explain import ExplainParams, explain
from macrobase_spark.operators.fpg import fpgrowth_explain
from tests.test_explain import make_planted


def _key(r, attrs):
    return tuple(r[a] for a in attrs)


@pytest.mark.parametrize("metric", ["global_ratio", "risk_ratio"])
def test_fpgrowth_matches_apriori(spark, metric):
    df = make_planted(spark, n=3000)
    attrs = ["a0", "a1", "a2", "a3"]
    params = dict(
        attributes=attrs,
        min_support=0.2,
        min_ratio_metric=2.0,
        ratio_metric=metric,
        max_order=3,
        prune_containment=False,  # fpgrowth kernel emits the full filtered set
    )
    ap = {_key(r, attrs): r for r in explain(df, ExplainParams(**params)).collect()}
    fp = {_key(r, attrs): r for r in fpgrowth_explain(df, ExplainParams(**params)).collect()}
    assert set(ap) == set(fp)
    assert len(ap) > 0
    for k in ap:
        assert ap[k]["outlier_count"] == pytest.approx(fp[k]["outlier_count"])
        assert ap[k]["total_count"] == pytest.approx(fp[k]["total_count"])
        assert ap[k]["support"] == pytest.approx(fp[k]["support"])
        assert ap[k][metric] == pytest.approx(fp[k][metric])


def test_fpgrowth_planted_top(spark):
    df = make_planted(spark)
    res = fpgrowth_explain(
        df,
        ExplainParams(
            attributes=["a0", "a1", "a2", "a3"],
            min_support=0.3,
            min_ratio_metric=10.0,
            ratio_metric="risk_ratio",
            max_order=3,
        ),
    )
    top = res.orderBy(F.desc("risk_ratio"), F.desc("support")).limit(1).collect()[0]
    assert top["a0"] == "a0:1" and top["a1"] == "a1:1"
    assert top["a2"] is None and top["a3"] is None

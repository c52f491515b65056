"""Physical-plan assertions for the declarative detector kernels: the
bin-assignment stage of HBOS and approx-ECOD must be MAP-ONLY (edge
arrays broadcast, index folded in codegen) — no shuffle Exchange keyed
on (vec, dim), no row blow-up join. Only the per-dim stats aggregates
and the final per-vector aggregate may shuffle."""

import re

from macrobase_spark.operators.ecod import ecod_scores_approx
from macrobase_spark.operators.hbos import hbos_scores


def _shuffle_keys(df) -> list[str]:
    """hashpartitioning key-lists of every shuffle Exchange in the final
    plan (BroadcastExchange excluded)."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return re.findall(r"Exchange hashpartitioning\(([^)]*)\)", plan)


def _vecs(spark, n=50, d=4):
    rows = [(i, [float((i * 7 + j) % 13) for j in range(d)]) for i in range(n)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_hbos_bin_assignment_is_map_only(spark):
    keys = _shuffle_keys(hbos_scores(_vecs(spark)))
    # every shuffle is keyed on dim/bin grains or the final vec_id grain;
    # none carries BOTH vec_id and dim (the old blow-up re-aggregate)
    assert keys, "expected at least the per-dim stats aggregate"
    for k in keys:
        assert not ("vec_id" in k and "dim" in k), f"(vec, dim) Exchange: {k}"


def test_ecod_approx_bin_assignment_is_map_only(spark):
    keys = _shuffle_keys(ecod_scores_approx(_vecs(spark), n_bins=8))
    assert keys
    for k in keys:
        assert not ("vec_id" in k and "dim" in k), f"(vec, dim) Exchange: {k}"


def test_hbos_plan_has_no_bin_join_blowup(spark):
    """The only non-broadcast join inputs allowed are per-dim relations
    (9-row-per-dim edge explode would appear as a join on dim AND bin at
    the binned grain) — the bin index must come from an aggregate() fold,
    visible as a lambda in the plan."""
    plan = hbos_scores(_vecs(spark))._jdf.queryExecution().executedPlan().toString()
    assert "aggregate(" in plan or "lambda" in plan

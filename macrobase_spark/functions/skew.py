"""Explicit skew-handling primitives: salted two-stage aggregation and a
salted (replicated-build-side) join.

The engine's default position is that Spark already salts the common cases
for free — partial (map-side) hash aggregation collapses hot keys before
the shuffle for every algebraic aggregate, and AQE's skew-join splitting
(`spark.sql.adaptive.skewJoin.enabled`, on in session.py) splits oversized
join partitions at runtime. These helpers cover the two cases that remain
at 10^12-row scale, and make the salting the north rule names explicit and
testable:

1. `salted_aggregate` — a groupBy whose per-key REDUCED state is still too
   big or too hot for a single reducer task: non-algebraic aggregates
   (collect_set/collect_list over hot keys), or extreme single-key skew
   where even the post-partial rows for one key exceed a task's slice.
   Shape: groupBy(keys + salt) partial-reduce → groupBy(keys) merge. Two
   shuffles, but the FIRST spreads each hot key over `n_salt` reducers and
   the second only moves `n_salt` pre-reduced rows per key.

2. `salted_join` — a large⋈large equi-join with a known hot-key side where
   AQE can't act (streaming joins have no runtime stats; static plans with
   AQE disabled). Shape: fact side gains salt = pmod(hash(row-nonce),
   n_salt); the build side is replicated n_salt× via explode(sequence),
   and the join key becomes (key, salt) — each hot key's rows land on
   n_salt distinct reducers instead of one.

Both are pure DataFrame compositions (no UDFs, codegen end-to-end), and
tests/test_skew.py pins result-equivalence with the unsalted plan plus the
partitioning shape.

Reference parity: the reference engine is single-node (no shuffles to
skew); this serves the BASELINE north rule's "skew from hot codec/sr_hz
partitions is handled with salting and AQE skew-join splitting".
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT = "__mb_salt"


def with_salt(df: DataFrame, n_salt: int, salt_col: str = SALT) -> DataFrame:
    """Deterministic row salt in [0, n_salt): hashes the whole row (all
    columns) rather than rand(), so retried/recomputed tasks salt each row
    identically — a correctness requirement under speculative execution."""
    if n_salt < 1:
        raise ValueError(f"n_salt must be >= 1, got {n_salt}")
    return df.withColumn(salt_col, F.pmod(F.hash(*df.columns), F.lit(n_salt)))


def salted_aggregate(
    df: DataFrame,
    keys: Sequence[str],
    partial: dict[str, Column],
    merge: dict[str, Column],
    n_salt: int = 16,
) -> DataFrame:
    """Two-stage salted groupBy: stage 1 reduces (keys + salt) groups with
    `partial` (each expression sees the raw rows of one salt shard); stage 2
    merges the n_salt shard rows per key with `merge` (each expression sees
    stage-1 output columns). The caller supplies the partial/merge split —
    e.g. count → {n: count(1)} / {n: sum(n)}, collect_set → per-shard
    collect_set / flatten(collect_set)-style merges.

    Result columns: keys + merge's aliases. Output aliases in `partial` are
    the input names `merge` expressions should reference."""
    salted = with_salt(df, n_salt)
    stage1 = salted.groupBy(*keys, SALT).agg(
        *[c.alias(name) for name, c in partial.items()]
    )
    return stage1.groupBy(*keys).agg(*[c.alias(name) for name, c in merge.items()])


def salted_collect_set(
    df: DataFrame, keys: Sequence[str], value_col: str, n_salt: int = 16,
    out_col: str | None = None,
) -> DataFrame:
    """The canonical non-algebraic case: exact distinct-value sets per key
    without funnelling any hot key's raw rows through one reducer. Stage 1
    dedups within each salt shard (collect_set), stage 2 unions n_salt
    already-deduped shard arrays per key. Output arrays are sorted so the
    result is deterministic at any parallelism."""
    out = out_col or f"{value_col}_set"
    return salted_aggregate(
        df,
        keys,
        partial={out: F.collect_set(value_col)},
        merge={
            out: F.array_sort(
                F.array_distinct(F.flatten(F.collect_list(out)))
            )
        },
        n_salt=n_salt,
    )


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: Sequence[str],
    n_salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: the fact side is salted per row, the dim
    side is replicated once per salt value (explode of a sequence — an
    n_salt× blowup of the SMALLER side only), and the shuffle key becomes
    (on + salt), spreading each hot key over n_salt reducers.

    Use when AQE skew splitting can't see the skew (streaming, or a
    downstream stage that inherits the join's partitioning). Columns out =
    fact's ∪ dim's (salt dropped)."""
    if how not in ("inner", "left", "left_semi", "left_anti", "semi", "anti", "leftsemi", "leftanti"):
        raise ValueError(
            f"salted_join supports fact-preserving joins only, got {how!r}: "
            "the dim side is replicated n_salt x, so right/full would emit "
            "unmatched dim rows n_salt times"
        )
    on = list(on)
    fact_s = with_salt(fact, n_salt)
    dim_s = dim.withColumn(
        SALT, F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)))
    )
    joined = fact_s.join(dim_s, on + [SALT], how)
    return joined.drop(SALT)


# ---- registered demonstration query ------------------------------------------


def _register() -> None:
    from macrobase_spark.queries import register

    @register(
        "salted_user_sets_events",
        """
        SELECT event_type,
               CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
               string_agg(DISTINCT user_id, ',' ORDER BY user_id) AS user_csv
        FROM events
        WHERE user_id < 40
        GROUP BY event_type
        ORDER BY event_type
        """,
    )
    def salted_user_sets_events_q(spark, sf_dir):
        """Exact per-key distinct-value sets via the salted two-stage plan —
        the canonical non-algebraic aggregate where naive collect_set
        funnels every hot key's raw rows through one reducer. The output is
        rendered as a canonical sorted CSV so the oracle hash is
        engine-portable."""
        ev = (
            spark.read.parquet(f"{sf_dir}/events.parquet")
            .filter(F.col("user_id") < 40)
            .select("event_type", "user_id")
        )
        sets = salted_collect_set(ev, ["event_type"], "user_id", n_salt=8)
        return sets.select(
            "event_type",
            F.size("user_id_set").cast("long").alias("n_users"),
            F.array_join(
                F.transform("user_id_set", lambda x: x.cast("string")), ","
            ).alias("user_csv"),
        ).orderBy("event_type")


_register()

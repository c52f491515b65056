"""As-of join and bucketized range join: semantics vs a hand-computed
truth table, DuckDB parity at sf0.001, and plan-shape assertions (the
scale contract: no nested-loop join, bounded Exchange count)."""

import datetime as dt

import duckdb
import pytest
from pyspark.sql import functions as F

from macrobase_spark.operators.temporal import asof_join, range_join_candidates
from macrobase_spark.queries import ORACLES, QUERIES

from oracle_util import compare, duck_con

T0 = dt.datetime(2024, 1, 1)


def _ts(minutes: float) -> dt.datetime:
    return T0 + dt.timedelta(minutes=minutes)


@pytest.fixture(scope="module")
def tiny(spark):
    left = spark.createDataFrame(
        [
            (1, "a", _ts(10), 1.0),
            (2, "a", _ts(20), 2.0),
            (3, "a", _ts(5), 3.0),   # before any ref -> no match
            (4, "b", _ts(30), 4.0),  # key with no refs at all
            (5, "a", _ts(15), 5.0),  # exactly ON a ref ts -> matches it
        ],
        "id long, k string, ts timestamp, v double",
    )
    right = spark.createDataFrame(
        [
            ("a", _ts(8), 100.0),
            ("a", _ts(15), 200.0),
            ("a", _ts(19), None),    # NULL payload still counts as a match
        ],
        "k string, ts timestamp, rv double",
    )
    return left, right


def test_asof_semantics(tiny):
    left, right = tiny
    out = asof_join(left, right, on=["k"], ts_col="ts", carry_cols=["rv"])
    rows = {r["id"]: r for r in out.collect()}
    assert len(rows) == 5
    assert rows[1]["rv_asof"] == 100.0 and rows[1]["ts_asof"] == _ts(8)
    # a NULL ref payload is a MATCH (ts_asof set) with a NULL value
    assert rows[2]["ts_asof"] == _ts(19) and rows[2]["rv_asof"] is None
    assert rows[3]["ts_asof"] is None and rows[3]["rv_asof"] is None
    assert rows[4]["ts_asof"] is None
    # boundary: left.ts == right.ts matches (>= semantics, ASOF-compatible)
    assert rows[5]["rv_asof"] == 200.0 and rows[5]["ts_asof"] == _ts(15)
    # left columns pass through untouched
    assert rows[2]["v"] == 2.0 and rows[2]["k"] == "a"


def test_asof_tolerance(tiny):
    left, right = tiny
    out = asof_join(
        left, right, on=["k"], ts_col="ts", carry_cols=["rv"],
        tolerance_us=2 * 60 * 1_000_000,
    )
    rows = {r["id"]: r for r in out.collect()}
    assert rows[1]["ts_asof"] == _ts(8)      # lag exactly == tolerance: kept
    # id=2 at ts(20) matches ref ts(19): 1 min lag, inside tolerance
    assert rows[2]["ts_asof"] == _ts(19) and rows[2]["rv_asof"] is None
    assert rows[3]["ts_asof"] is None        # no prior ref at all
    assert rows[4]["ts_asof"] is None        # keyless
    assert rows[5]["ts_asof"] == _ts(15)     # zero lag
    # shrink tolerance below id=1's 2-minute lag: its match drops to NULL
    out2 = asof_join(
        left, right, on=["k"], ts_col="ts", carry_cols=["rv"],
        tolerance_us=60 * 1_000_000,
    )
    rows2 = {r["id"]: r for r in out2.collect()}
    assert rows2[1]["ts_asof"] is None and rows2[1]["rv_asof"] is None
    assert rows2[2]["ts_asof"] == _ts(19)


def test_asof_matches_duckdb_asof_join(tiny, spark):
    left, right = tiny
    out = asof_join(left, right, on=["k"], ts_col="ts", carry_cols=["rv"]).select(
        "id", "k", "rv_asof", "ts_asof"
    )
    con = duckdb.connect()
    con.register("l", left.toPandas())
    con.register("r", right.toPandas())
    oracle = con.execute(
        """
        SELECT l.id, l.k, r.rv AS rv_asof, r.ts AS ts_asof
        FROM l ASOF LEFT JOIN r ON l.k = r.k AND l.ts >= r.ts
        """
    ).df()
    assert compare(out, oracle, "tiny_asof") == []


def test_range_join_semantics(tiny, spark):
    left, right = tiny
    # refs in [ts-10min, ts) per key
    pairs = range_join_candidates(
        left, right.withColumnRenamed("ts", "rts"),
        on=["k"], probe_ts="ts", ref_ts="rts",
        lower_us=-10 * 60 * 1_000_000, upper_us=0,
    )
    agg = (
        pairs.groupBy("id")
        .agg(F.count("ref_lag_us").alias("n"), F.sum("rv").alias("s"))
        .collect()
    )
    got = {r["id"]: (r["n"], r["s"]) for r in agg}
    # id1 @10: refs in [0,10) -> ts(8) only
    assert got[1] == (1, 100.0)
    # id2 @20: refs in [10,20) -> ts(15), ts(19); NULL rv still counted? count(ref_lag_us) counts the row
    assert got[2][0] == 2 and got[2][1] == 200.0
    # id3 @5: refs in [-5,5) -> none
    assert got[3] == (0, None)
    # id4: key b has no refs
    assert got[4] == (0, None)
    # id5 @15: refs in [5,15) -> ts(8) only (upper bound exclusive)
    assert got[5] == (1, 100.0)


def test_range_join_inner_matches_naive(spark, sf_dir):
    """Bucketized candidates == the naive inequality join, on real events."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    probes = ev.filter(F.col("event_type") == "purchase").select("event_id", "user_id", "ts")
    refs = ev.filter(F.col("event_type") == "view").select(
        "user_id", F.col("ts").alias("rts"), "value"
    )
    hour_us = 3600 * 1_000_000
    pairs = range_join_candidates(
        probes, refs, on=["user_id"], probe_ts="ts", ref_ts="rts",
        lower_us=-6 * hour_us, upper_us=6 * hour_us, how="inner",
    ).select("event_id", "rts")
    naive = (
        probes.alias("p")
        .join(refs.alias("r"), F.col("p.user_id") == F.col("r.user_id"))
        .filter(
            (F.unix_micros(F.col("rts").cast("timestamp"))
             >= F.unix_micros(F.col("ts").cast("timestamp")) - 6 * hour_us)
            & (F.unix_micros(F.col("rts").cast("timestamp"))
               < F.unix_micros(F.col("ts").cast("timestamp")) + 6 * hour_us)
        )
        .select("event_id", "rts")
    )
    assert pairs.exceptAll(naive).count() == 0
    assert naive.exceptAll(pairs).count() == 0


def test_registered_queries_match_oracle(spark, sf_dir):
    con = duck_con(sf_dir)
    for name in [
        "asof_attribution_events",
        "range_join_error_context",
        "session_windows_events",
    ]:
        sdf = QUERIES[name](spark, sf_dir)
        odf = con.execute(ORACLES[name]).df()
        assert compare(sdf, odf, name) == [], name


def test_plan_shape(spark, sf_dir):
    """Scale contract: as-of is join-free (window over ONE hash Exchange of
    the unioned sides + the ref-dedup agg's); range join is an equi hash
    join (broadcast or shuffled), never BroadcastNestedLoop."""
    asof_plan = (
        QUERIES["asof_attribution_events"](spark, sf_dir)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastNestedLoop" not in asof_plan
    assert "Join" not in asof_plan  # union+window: zero join nodes
    assert asof_plan.count("Exchange") <= 2

    rj_plan = (
        QUERIES["range_join_error_context"](spark, sf_dir)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastNestedLoop" not in rj_plan
    assert "HashJoin" in rj_plan

"""Temporal joins the reference's relational layer lacks but every
event-stream validation pipeline needs: AS-OF join (each probe row picks
the most recent reference row at-or-before it, per key) and bounded
RANGE join (each probe row matches all reference rows inside a fixed
time interval around it, per key).

Reference parity note: myrtakis/macrobase joins are equality-only
(DataFrame.join in lib/src/main/java/.../DataFrame.java); its streaming
operators express "recent context" through panes instead. These two
operators close that gap Spark-first — no reference code exists to port.

Scale designs (the whole point — naive versions die at 10^12 rows):

- ``asof_join``: the classic union + forward-fill window. Both sides are
  tagged and unioned, hash-partitioned by the join key, sorted by
  (ts, side) inside each partition, and the latest reference payload is
  carried forward with ``last(..., ignorenulls=True)``. EXACTLY ONE
  Exchange (the window's hash partition) and zero join nodes — a
  sort-merge inequality join, which Spark would otherwise plan as
  BroadcastNestedLoop (quadratic), never happens. Skewed keys cost one
  sort per key-partition, absorbed by AQE; there is no per-key
  materialized state beyond the sort.

- ``range_join_candidates``: time-bucketized equi-join. Reference rows
  are assigned to buckets of width (upper-lower); each probe interval
  [ts+lower, ts+upper) spans at most TWO buckets, so the probe side
  explodes to 2 candidate rows and equi-joins on (key, bucket) with the
  exact range predicate INSIDE the join condition (left-join safe).
  Candidate volume is bounded by per-bucket occupancy — never the
  per-key cross product a raw inequality join implies. One shuffle on
  (key, bucket); hot (key, bucket) cells are orthogonally saltable.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from macrobase_spark.queries import register


def _us(col) -> F.Column:
    """Epoch microseconds of a timestamp OR timestamp_ntz column. The NTZ
    cast reads wall time in the session timezone, which session.get_spark
    pins to UTC — a constant (zero) offset, so differences and bucket math
    are exact."""
    c = col if not isinstance(col, str) else F.col(col)
    return F.unix_micros(c.cast("timestamp"))


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    ts_col: str,
    right_ts_col: str | None = None,
    carry_cols: Sequence[str] | None = None,
    tolerance_us: int | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """Backward as-of join: every left row gains the `carry_cols` of the
    most recent right row with right.ts <= left.ts sharing `on`, plus
    ``<ts_col><suffix>`` (the matched right timestamp, NULL when no match
    or outside `tolerance_us`).

    Right rows must be unique per (`on`, ts) for deterministic output —
    pre-aggregate the right side if they are not (the registered queries
    do). Carried columns keep their right-side names suffixed with
    `suffix`; legitimate NULL payloads in a matched right row stay NULL
    (the fill carries a struct, so a match is distinguishable from no
    match).
    """
    on = list(on)
    rts = right_ts_col or ts_col
    carry = list(carry_cols) if carry_cols is not None else [
        c for c in right.columns if c not in on and c != rts
    ]

    payload = F.struct(F.col(rts).alias("__ts"), *[F.col(c) for c in carry])
    r = right.select(
        *[F.col(c) for c in on],
        F.col(rts).alias(ts_col),
        F.lit(0).alias("__side"),
        payload.alias("__p"),
    )
    l = left.select(
        "*",
        F.lit(1).alias("__side"),
        F.lit(None).cast(r.schema["__p"].dataType).alias("__p"),
    ).select(*on, ts_col, "__side", "__p", *[c for c in left.columns if c not in on and c != ts_col])

    u = l.unionByName(r, allowMissingColumns=True)
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col(ts_col).asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = u.withColumn("__m", F.last("__p", ignorenulls=True).over(w))

    matched_ts = F.col("__m.__ts")
    if tolerance_us is not None:
        in_tol = (_us(ts_col) - _us(matched_ts)) <= F.lit(
            int(tolerance_us)
        )
        filled = filled.withColumn("__m", F.when(in_tol, F.col("__m")))
        matched_ts = F.col("__m.__ts")

    out_cols = [F.col(c) for c in left.columns]
    out_cols.append(matched_ts.alias(f"{ts_col}{suffix}"))
    out_cols.extend(F.col(f"__m.{c}").alias(f"{c}{suffix}") for c in carry)
    return filled.filter(F.col("__side") == 1).select(*out_cols)


def range_join_candidates(
    probes: DataFrame,
    refs: DataFrame,
    on: Sequence[str],
    probe_ts: str,
    ref_ts: str,
    lower_us: int,
    upper_us: int,
    how: str = "left",
) -> DataFrame:
    """Bucketized range join: pairs every probe row with the ref rows
    satisfying ``probe_ts + lower_us <= ref_ts < probe_ts + upper_us``
    on the same `on` key. Returns the pair relation with all probe
    columns plus the ref's non-key columns — NOTE a probe appears once
    per candidate bucket (2×) on the unmatched side of a left join;
    consumers aggregate per probe key (see `range_join_error_context`),
    which collapses that exactly.

    Ref columns colliding with probe names are suffixed ``_ref``.
    """
    if upper_us <= lower_us:
        raise ValueError("upper_us must exceed lower_us")
    on = list(on)
    width = int(upper_us - lower_us)

    p_us = _us(probe_ts)
    r_us = _us(ref_ts)

    probe_named = set(probes.columns)
    ref_payload = {
        c: (c if c not in probe_named else f"{c}_ref")
        for c in refs.columns
        if c not in on
    }
    r = refs.select(
        *[F.col(c).alias(f"__k_{c}") for c in on],
        F.floor(r_us / F.lit(width)).alias("__rb"),
        r_us.alias("__r_us"),
        *[F.col(src).alias(dst) for src, dst in ref_payload.items()],
    )

    b0 = F.floor((p_us + F.lit(int(lower_us))) / F.lit(width))
    p = probes.withColumn("__pb", F.explode(F.array(b0, b0 + 1))).withColumn(
        "__p_us", p_us
    )

    cond = F.lit(True)
    for c in on:
        cond = cond & (F.col(c) == F.col(f"__k_{c}"))
    cond = cond & (F.col("__pb") == F.col("__rb"))
    cond = cond & (F.col("__r_us") >= F.col("__p_us") + F.lit(int(lower_us)))
    cond = cond & (F.col("__r_us") < F.col("__p_us") + F.lit(int(upper_us)))

    joined = p.join(r, cond, how)
    keep = [F.col(c) for c in probes.columns]
    keep.append((F.col("__r_us") - F.col("__p_us")).alias("ref_lag_us"))
    keep.extend(F.col(dst) for dst in ref_payload.values())
    return joined.select(*keep)


# ===========================================================================
# Registered queries + DuckDB oracles
# ===========================================================================


@register(
    "asof_attribution_events",
    """
    WITH probes AS (
        SELECT event_id, user_id, ts, value
        FROM events WHERE event_type = 'purchase'
    ),
    refs AS (
        SELECT user_id, ts, max(value) AS click_value
        FROM events WHERE event_type = 'click'
        GROUP BY user_id, ts
    )
    SELECT p.event_id,
           p.user_id,
           round(p.value, 2)                                    AS value,
           round(r.click_value, 2)                              AS click_value,
           CAST(epoch_us(p.ts) - epoch_us(r.ts) AS BIGINT)      AS lag_us
    FROM probes p
    ASOF LEFT JOIN refs r
      ON p.user_id = r.user_id AND p.ts >= r.ts
    """,
)
def asof_attribution_events(spark, sf_dir: str) -> DataFrame:
    """Attribution as-of join: every purchase picks the most recent prior
    click by the same user (value + recency lag; NULLs when the user never
    clicked before). Plan: one Exchange (hash by user_id) + per-partition
    sort — no join node, no nested loop. The click side is deduped per
    (user_id, ts) first so the match is deterministic."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    probes = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    refs = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("click_value"))
    )
    out = asof_join(probes, refs, on=["user_id"], ts_col="ts", carry_cols=["click_value"])
    return out.select(
        "event_id",
        "user_id",
        F.round("value", 2).alias("value"),
        F.round("click_value_asof", 2).alias("click_value"),
        (_us("ts") - _us("ts_asof")).cast("long").alias("lag_us"),
    )


@register(
    "range_join_error_context",
    """
    WITH probes AS (
        SELECT event_id, user_id, ts
        FROM events WHERE event_type = 'purchase'
    ),
    refs AS (
        SELECT user_id, ts, value
        FROM events WHERE event_type = 'error'
    )
    SELECT p.event_id,
           p.user_id,
           count(r.ts)                                AS n_errors,
           round(coalesce(sum(r.value), 0), 2)        AS err_value_sum
    FROM probes p
    LEFT JOIN refs r
      ON p.user_id = r.user_id
     AND r.ts >= p.ts - INTERVAL 24 HOURS
     AND r.ts < p.ts
    GROUP BY p.event_id, p.user_id
    """,
)
def range_join_error_context(spark, sf_dir: str) -> DataFrame:
    """Bounded-range context join: for every purchase, the count and value
    mass of the same user's errors in the 24 h before it. The bucketized
    equi-join bounds candidates to two time buckets per probe (the naive
    inequality join is a per-user cross product — quadratic in the hot
    user); the final per-probe aggregate collapses the 2× candidate
    explosion and map-side combine absorbs it."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    probes = ev.filter(F.col("event_type") == "purchase").select("event_id", "user_id", "ts")
    refs = ev.filter(F.col("event_type") == "error").select("user_id", "ts", "value")
    day_us = 24 * 3600 * 1_000_000
    pairs = range_join_candidates(
        probes, refs, on=["user_id"], probe_ts="ts", ref_ts="ts", lower_us=-day_us, upper_us=0
    )
    return pairs.groupBy("event_id", "user_id").agg(
        F.count(F.col("ref_lag_us")).alias("n_errors"),
        F.round(F.coalesce(F.sum("value"), F.lit(0.0)), 2).alias("err_value_sum"),
    )


@register(
    "session_windows_events",
    """
    WITH marked AS (
        SELECT user_id, ts, value,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR ts - lag(ts) OVER w >= INTERVAL 6 HOURS
                    THEN 1 ELSE 0 END AS new_s
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ),
    sessions AS (
        SELECT user_id, ts, value,
               sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS UNBOUNDED PRECEDING) AS sid
        FROM marked
    )
    SELECT user_id,
           min(ts)                          AS session_start,
           max(ts) + INTERVAL 6 HOURS       AS session_end,
           count(*)                         AS n_events,
           round(sum(value), 2)             AS value_sum
    FROM sessions
    GROUP BY user_id, sid
    """,
)
def session_windows_events(spark, sf_dir: str) -> DataFrame:
    """Sessionization: per-user activity sessions closed by a 6 h
    inactivity gap — Spark's NATIVE session_window aggregate (one
    partial+final session-merge aggregation, streaming-capable with a
    watermark). The oracle replays it as gaps-and-islands SQL; Spark's
    session end is last event + gap, which the oracle mirrors. At 10^12
    rows this is one hash Exchange on user_id and per-key sorted merge —
    the same cost envelope as any keyed aggregate."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return (
        ev.groupBy("user_id", F.session_window("ts", "6 hours").alias("sw"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("value_sum"),
        )
        .select(
            "user_id",
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n_events",
            "value_sum",
        )
    )

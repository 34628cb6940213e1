"""As-of (nearest-prior) join and bounded range-join over the
``events`` table — operators Spark lacks as built-ins, re-expressed as
compositions of DataFrame ops (SURVEY.md §2.5: absent in the
reference too; extension).

Scale notes (100 TB stance):
- the as-of join is the union-merge pattern: tag both sides, union,
  one shuffle on the partition key, a single ordered window with
  last(ignorenulls) — never an inequality join (which Spark plans as
  broadcast-nested-loop, O(n·m)).
- the bounded range count uses a rangeBetween window over epoch
  seconds: one shuffle on user_id, state bounded by the 1-hour frame.
  DuckDB's oracle replays both with its native ASOF JOIN / correlated
  count, verifying the composition is semantically exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from golang_etl_spark.registry import register
from golang_etl_spark.sources.catalog import load_table

# ---------------------------------------------------------------------------
# As-of join: each purchase matched to the user's most recent prior
# (or simultaneous) click — classic attribution.
# ---------------------------------------------------------------------------
# Not DuckDB's native ASOF JOIN: on right-side ties (several clicks at
# the same ts) ASOF picks an arbitrary click, so the oracle states the
# deterministic convention explicitly — latest click_ts, then HIGHEST
# click_id — matching the Spark window's (ts, tag, click_id) ordering.
_ASOF_ORACLE = """
WITH purchases AS (
  SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'purchase'
),
clicks AS (
  SELECT event_id AS click_id, user_id, ts AS click_ts
  FROM events WHERE event_type = 'click'
),
j AS (
  SELECT p.event_id, p.user_id, p.ts, p.value, c.click_id, c.click_ts,
         ROW_NUMBER() OVER (PARTITION BY p.event_id
                            ORDER BY c.click_ts DESC, c.click_id DESC) AS rn
  FROM purchases p
  LEFT JOIN clicks c
    ON p.user_id = c.user_id AND c.click_ts <= p.ts
)
SELECT event_id, user_id, ts,
       ROUND(value, 4) AS purchase_value,
       click_id,
       CAST(epoch_us(ts) - epoch_us(click_ts) AS BIGINT) AS micros_since_click
FROM j WHERE rn = 1
"""


@register("asof_join_purchase_click", oracle=_ASOF_ORACLE, tags=("asof", "join"))
def asof_join_purchase_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join via union-merge: tag clicks (0) and purchases (1),
    union, window over (user_id, ts, tag) carrying the last non-null
    click forward, keep purchase rows. Equivalent to DuckDB's native
    ASOF LEFT JOIN (oracle) — but with one shuffle and bounded state,
    the plan that survives 100 TB (an inequality join would be
    broadcast-nested-loop).

    The tag orders a click before a purchase at identical ts (>=
    inclusive semantics); click_id breaks ties among several clicks at
    the same (user_id, ts) — the carried click is the HIGHEST click_id
    at the latest eligible ts, the convention the oracle restates
    (DuckDB's native ASOF picks an arbitrary click on such ties)."""
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        "ts",
        F.lit(0).alias("tag"),
        F.col("event_id").alias("click_id"),
        F.lit(None).cast("long").alias("event_id"),
        F.lit(None).cast("double").alias("value"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.lit(1).alias("tag"),
        F.lit(None).cast("long").alias("click_id"),
        "event_id",
        "value",
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "tag", "click_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    merged = clicks.unionByName(purchases).select(
        "*",
        F.last("click_id", ignorenulls=True).over(w).alias("last_click_id"),
        F.last(F.when(F.col("tag") == 0, F.col("ts")), ignorenulls=True)
        .over(w)
        .alias("last_click_ts"),
    )
    return merged.filter(F.col("tag") == 1).select(
        "event_id",
        "user_id",
        "ts",
        F.round("value", 4).alias("purchase_value"),
        F.col("last_click_id").alias("click_id"),
        (F.unix_micros("ts") - F.unix_micros("last_click_ts")).alias(
            "micros_since_click"
        ),
    )


# ---------------------------------------------------------------------------
# Bounded range join: events per user in the preceding hour.
# ---------------------------------------------------------------------------
_RANGE_ORACLE = """
WITH e AS (
  SELECT event_id, user_id, CAST(floor(epoch(ts)) AS BIGINT) AS s FROM events
)
SELECT e.event_id, e.user_id,
       CAST(COUNT(e2.event_id) AS BIGINT) AS n_prev_1h
FROM e LEFT JOIN e e2
  ON e.user_id = e2.user_id
 AND e2.s BETWEEN e.s - 3600 AND e.s - 1
GROUP BY e.event_id, e.user_id
"""


@register("range_count_prior_events", oracle=_RANGE_ORACLE, tags=("asof", "window"))
def range_count_prior_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per event: how many events the same user produced in the
    preceding hour (second resolution, exclusive of the same second).

    Implemented as a rangeBetween(-3600, -1) window over epoch
    seconds — one shuffle on user_id and an O(frame) running state,
    versus the oracle's O(n·m) self-range-join. Same results, scalable
    plan."""
    ev = load_table(spark, sf_dir, "events")
    e = ev.select(
        "event_id",
        "user_id",
        F.floor(F.unix_micros("ts") / 1_000_000).cast("long").alias("s"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("s")
        .rangeBetween(-3600, -1)
    )
    return e.select(
        "event_id",
        "user_id",
        F.count("*").over(w).cast("long").alias("n_prev_1h"),
    )


# ---------------------------------------------------------------------------
# Bucketed interval join: all events within 1 hour AFTER an error.
# ---------------------------------------------------------------------------
# The general range join (b.ts in (a.ts, a.ts + W]) is an inequality
# predicate — naively planned as BroadcastNestedLoopJoin, O(n·m).
# The scalable formulation buckets time into W-sized epochs and
# duplicates the LEFT side into its own and the next bucket: every
# qualifying pair must then share (user_id, bucket), so the join is a
# plain equi-join with a residual range filter. 2x expansion of the
# small (error) side buys an O(matches) shuffle join — the same trick
# behind Databricks' range-join optimization and Flink's interval
# join, composed here from public DataFrame ops.
RANGE_JOIN_WINDOW_US = 3_600_000_000  # 1 hour in microseconds

_INTERVAL_ORACLE = f"""
SELECT a.event_id AS err_id,
       b.event_id AS event_id,
       b.event_type,
       CAST(epoch_us(b.ts) - epoch_us(a.ts) AS BIGINT) AS micros_after_error
FROM events a
JOIN events b
  ON a.user_id = b.user_id
 AND b.ts > a.ts
 AND epoch_us(b.ts) - epoch_us(a.ts) <= {RANGE_JOIN_WINDOW_US}
WHERE a.event_type = 'error'
"""


@register(
    "range_join_bucketed", oracle=_INTERVAL_ORACLE, tags=("asof", "join")
)
def range_join_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval join via time bucketing: every event of the same user
    falling in the hour after an error event, as (error, event) pairs
    with exact micro-second lag.

    The error side explodes into buckets {b, b+1} (any partner within
    W microseconds lands in one of the two); the join is then a pure
    equi-join on (user_id, bucket) plus a residual filter on the exact
    interval — no cartesian, no BNLJ, candidates O(co-bucketed pairs).
    The DuckDB oracle runs the naive inequality join, proving the
    bucketed rewrite exact."""
    ev = load_table(spark, sf_dir, "events")
    bucket = F.floor(F.unix_micros("ts") / F.lit(RANGE_JOIN_WINDOW_US))
    err = (
        ev.filter(F.col("event_type") == "error")
        .select(
            F.col("event_id").alias("err_id"),
            "user_id",
            F.unix_micros("ts").alias("err_us"),
            F.explode(F.array(bucket, bucket + 1)).alias("bucket"),
        )
    )
    others = ev.select(
        "event_id",
        "event_type",
        "user_id",
        F.unix_micros("ts").alias("ev_us"),
        bucket.alias("bucket"),
    )
    return (
        err.join(others, ["user_id", "bucket"])
        .filter(
            (F.col("ev_us") > F.col("err_us"))
            & (F.col("ev_us") - F.col("err_us") <= RANGE_JOIN_WINDOW_US)
        )
        .select(
            "err_id",
            "event_id",
            "event_type",
            (F.col("ev_us") - F.col("err_us")).alias("micros_after_error"),
        )
    )


# ---------------------------------------------------------------------------
# Nearest-event as-of join (both directions, bounded tolerance).
# ---------------------------------------------------------------------------
_NEAREST_TOL_MIN = 15

_NEAREST_ORACLE = f"""
WITH clicks AS (
  SELECT user_id, ts AS cts, event_id AS click_id FROM events
  WHERE event_type = 'click'
),
purchases AS (
  SELECT user_id, ts, event_id FROM events WHERE event_type = 'purchase'
),
cand AS (
  SELECT p.event_id, p.user_id, p.ts, c.click_id,
         ABS(date_diff('microsecond', c.cts, p.ts)) AS dist_us,
         CASE WHEN c.cts <= p.ts THEN 0 ELSE 1 END AS dir
  FROM purchases p JOIN clicks c ON c.user_id = p.user_id
   AND c.cts BETWEEN p.ts - INTERVAL {_NEAREST_TOL_MIN} MINUTE
                 AND p.ts + INTERVAL {_NEAREST_TOL_MIN} MINUTE
),
pick AS (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY event_id
    ORDER BY dist_us, dir,
             CASE WHEN dir = 0 THEN -click_id ELSE click_id END
  ) AS rn
  FROM cand
)
SELECT event_id, user_id, click_id,
       CAST(dist_us // 1000000 AS BIGINT) AS dist_sec,
       CASE WHEN dir = 0 THEN 'back' ELSE 'fwd' END AS direction
FROM pick WHERE rn = 1
"""


@register(
    "asof_join_nearest", oracle=_NEAREST_ORACLE, tags=("asof", "join")
)
def asof_join_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAREST-event as-of join: each purchase pairs with its closest
    click within ±15 minutes in EITHER direction (tie → the earlier
    click; same-timestamp click ties → highest id backward, lowest id
    forward — all deterministic). Backward-only as-of
    (asof_join_purchase_click) models causality; nearest models
    association — sensor alignment, attribution windows, log joining.

    Implementation: TWO union-merge sweeps (one per direction), each
    the same single-shuffle carry as the backward as-of — never an
    inequality join (broadcast-nested-loop at scale). The final pick
    is a per-row expression over the two carried candidates. DuckDB
    oracle restates the semantics as a ranked interval join."""
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        "ts",
        F.lit(0).alias("tag"),
        F.col("event_id").alias("click_id"),
        F.lit(None).cast("long").alias("event_id"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.lit(1).alias("tag"),
        F.lit(None).cast("long").alias("click_id"),
        "event_id",
    )
    merged = clicks.unionByName(purchases)
    wb = (
        Window.partitionBy("user_id")
        .orderBy("ts", "tag", "click_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wf = (
        Window.partitionBy("user_id")
        .orderBy(F.desc("ts"), F.desc("tag"), F.desc("click_id"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = merged.select(
        "*",
        F.last("click_id", ignorenulls=True).over(wb).alias("back_id"),
        F.last(F.when(F.col("tag") == 0, F.col("ts")), ignorenulls=True)
        .over(wb)
        .alias("back_ts"),
        F.last("click_id", ignorenulls=True).over(wf).alias("fwd_id"),
        F.last(F.when(F.col("tag") == 0, F.col("ts")), ignorenulls=True)
        .over(wf)
        .alias("fwd_ts"),
    ).filter(F.col("tag") == 1)
    tol_us = _NEAREST_TOL_MIN * 60 * 1_000_000
    back_d = F.unix_micros("ts") - F.unix_micros("back_ts")
    fwd_d = F.unix_micros("fwd_ts") - F.unix_micros("ts")
    back_ok = F.col("back_ts").isNotNull() & (back_d <= tol_us)
    fwd_ok = F.col("fwd_ts").isNotNull() & (fwd_d <= tol_us)
    use_back = back_ok & (~fwd_ok | (back_d <= fwd_d))
    picked = carried.filter(back_ok | fwd_ok).select(
        "event_id",
        "user_id",
        F.when(use_back, F.col("back_id")).otherwise(F.col("fwd_id"))
        .alias("click_id"),
        (
            F.when(use_back, back_d).otherwise(fwd_d) / F.lit(1_000_000)
        )
        .cast("long")
        .alias("dist_sec"),
        F.when(use_back, F.lit("back")).otherwise(F.lit("fwd"))
        .alias("direction"),
    )
    return picked

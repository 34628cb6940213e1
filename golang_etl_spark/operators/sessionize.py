"""Batch sessionization over the ``events`` table: gap-based session
assignment (30-minute inactivity timeout) and per-session rollups.

The streaming counterpart (F.session_window with watermark) lives in
golang_etl_spark/streaming/jobs.py; this is the batch re-statement,
oracle-checkable against DuckDB window functions.

Scale notes (100 TB stance): one shuffle on user_id for the lag/
running-sum windows, then a partial-agg'd groupBy on (user_id,
session_idx) that reuses the same partitioning — Catalyst collapses it
into the existing exchange, so the whole query is a single exchange
over the fact table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from golang_etl_spark.registry import register
from golang_etl_spark.sources.catalog import load_table

SESSION_GAP_US = 30 * 60 * 1_000_000  # 30 minutes, microseconds

_SESSIONIZE_ORACLE = f"""
WITH flagged AS (
  SELECT user_id, ts, event_id, value,
         CASE WHEN lag(ts) OVER w IS NULL
              OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > {SESSION_GAP_US}
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sessions AS (
  SELECT user_id, ts, value,
         SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING) AS session_idx
  FROM flagged
)
SELECT user_id,
       CAST(session_idx AS BIGINT) AS session_idx,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       MIN(ts) AS session_start,
       MAX(ts) AS session_end,
       CAST(epoch_us(MAX(ts)) - epoch_us(MIN(ts)) AS BIGINT) AS duration_us,
       ROUND(SUM(value), 4) AS total_value
FROM sessions
GROUP BY user_id, session_idx
"""


@register("sessionize_events", oracle=_SESSIONIZE_ORACLE, tags=("session", "window"))
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization: a new session starts after >30 min of
    user inactivity. lag() flags session starts, a running sum numbers
    them, then a grouped rollup per (user_id, session_idx)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = ev.select(
        "user_id",
        "ts",
        "event_id",
        "value",
        F.when(
            F.lag("ts").over(w).isNull()
            | (
                F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))
                > SESSION_GAP_US
            ),
            1,
        )
        .otherwise(0)
        .alias("is_new"),
    )
    # ordered by (ts, event_id) — the same total order as the lag
    # window. Ordering by ts alone is tie-order-dependent with
    # duplicate (user_id, ts) rows at a session boundary.
    wrun = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    sessions = flagged.withColumn(
        "session_idx", F.sum("is_new").over(wrun)
    )
    return sessions.groupBy(
        "user_id", F.col("session_idx").cast("long").alias("session_idx")
    ).agg(
        F.count("*").alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        (F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts"))).alias(
            "duration_us"
        ),
        F.round(F.sum("value"), 4).alias("total_value"),
    )


_SESSION_PROFILE_ORACLE = f"""
WITH flagged AS (
  SELECT user_id, ts, event_id,
         CASE WHEN lag(ts) OVER w IS NULL
              OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > {SESSION_GAP_US}
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sessions AS (
  SELECT user_id,
         SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING) AS session_idx
  FROM flagged
),
per_session AS (
  SELECT user_id, session_idx, COUNT(*) AS n_events
  FROM sessions GROUP BY user_id, session_idx
)
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_sessions,
       CAST(SUM(n_events) AS BIGINT) AS n_events,
       ROUND(AVG(n_events), 4) AS avg_events_per_session,
       CAST(MAX(n_events) AS BIGINT) AS max_session_events
FROM per_session
GROUP BY user_id
"""


@register(
    "sessionize_user_profile", oracle=_SESSION_PROFILE_ORACLE, tags=("session",)
)
def sessionize_user_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user session profile (session count, events/session) —
    second-level rollup of sessionize_events, still one exchange."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = ev.select(
        "user_id",
        "ts",
        "event_id",
        F.when(
            F.lag("ts").over(w).isNull()
            | (
                F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))
                > SESSION_GAP_US
            ),
            1,
        )
        .otherwise(0)
        .alias("is_new"),
    )
    # ordered by (ts, event_id) — the same total order as the lag
    # window. Ordering by ts alone is tie-order-dependent with
    # duplicate (user_id, ts) rows at a session boundary.
    wrun = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    per_session = (
        flagged.withColumn("session_idx", F.sum("is_new").over(wrun))
        .groupBy("user_id", "session_idx")
        .agg(F.count("*").alias("n_events"))
    )
    return per_session.groupBy("user_id").agg(
        F.count("*").alias("n_sessions"),
        F.sum("n_events").alias("n_events"),
        F.round(F.avg("n_events"), 4).alias("avg_events_per_session"),
        F.max("n_events").alias("max_session_events"),
    )


# ---------------------------------------------------------------------------
# Ordered funnel analysis: view -> click -> purchase conversion.
# ---------------------------------------------------------------------------
# The classic product-analytics query: how many users completed each
# step IN ORDER (a click only counts after the user's first view, a
# purchase only after that qualifying click). Step semantics are the
# standard "first event of the right type strictly after the previous
# step's timestamp".
_FUNNEL_ORACLE = """
WITH v AS (
  SELECT user_id, MIN(ts) AS t1 FROM events
  WHERE event_type = 'view' GROUP BY user_id
),
c AS (
  SELECT e.user_id, MIN(e.ts) AS t2
  FROM events e JOIN v ON v.user_id = e.user_id
  WHERE e.event_type = 'click' AND e.ts > v.t1
  GROUP BY e.user_id
),
p AS (
  SELECT e.user_id, MIN(e.ts) AS t3
  FROM events e JOIN c ON c.user_id = e.user_id
  WHERE e.event_type = 'purchase' AND e.ts > c.t2
  GROUP BY e.user_id
)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM v) AS n_view,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM c) AS n_view_click,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM p) AS n_view_click_purchase
"""

_FUNNEL_FOLD = """
aggregate(
  seq,
  struct(CAST(NULL AS TIMESTAMP) AS t1,
         CAST(NULL AS TIMESTAMP) AS t2,
         CAST(NULL AS TIMESTAMP) AS t3),
  (a, e) -> struct(
    CASE WHEN a.t1 IS NULL AND e.event_type = 'view'
         THEN e.ts ELSE a.t1 END AS t1,
    CASE WHEN a.t2 IS NULL AND a.t1 IS NOT NULL
              AND e.event_type = 'click' AND e.ts > a.t1
         THEN e.ts ELSE a.t2 END AS t2,
    CASE WHEN a.t3 IS NULL AND a.t2 IS NOT NULL
              AND e.event_type = 'purchase' AND e.ts > a.t2
         THEN e.ts ELSE a.t3 END AS t3))
"""


@register(
    "sessionize_funnel_steps",
    oracle=_FUNNEL_ORACLE,
    tags=("session", "aggregation", "analytic"),
)
def sessionize_funnel_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered view->click->purchase funnel: per-user chronological
    fold over the event sequence, then one global count per step.

    The fold scans each user's ts-sorted event array once, latching
    step timestamps in order (a later step only latches strictly after
    the previous one) — first-match-in-sorted-order equals the
    oracle's MIN-after-previous-step because the array is sorted by
    (ts, event_id).

    Scale shape: ONE exchange (the per-user collect_list groupBy); the
    fold is a JVM higher-order lambda over basket-sized arrays and the
    final 3-counter rollup is a single partial-agg'd row. The oracle's
    3-way self-join formulation would shuffle the fact table three
    times; the fold does it in one."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("view", "click", "purchase")
    )
    per_user = ev.groupBy("user_id").agg(
        F.sort_array(
            F.collect_list(F.struct("ts", "event_id", "event_type"))
        ).alias("seq")
    )
    folded = per_user.select(F.expr(_FUNNEL_FOLD).alias("f"))
    return folded.agg(
        F.count("f.t1").alias("n_view"),
        F.count("f.t2").alias("n_view_click"),
        F.count("f.t3").alias("n_view_click_purchase"),
    )


# ---------------------------------------------------------------------------
# Built-in session_window (the native API twin of the manual gap logic).
# ---------------------------------------------------------------------------
# Boundary semantics differ by ONE microsecond from the lag-based
# formulation above: session_window closes at last_ts + gap with a
# half-open window, so an event at exactly prev + gap starts a NEW
# session (the manual `> gap` test keeps it). The oracle replays the
# native rule (>= gap) — the hash gate is what proves the two
# formulations' boundary rules are what their docstrings claim.
_NATIVE_SESSION_ORACLE = f"""
WITH flagged AS (
  SELECT user_id, ts, value,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR epoch_us(ts) - epoch_us(lag(ts) OVER w)
                      >= {SESSION_GAP_US}
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
numbered AS (
  SELECT user_id, ts, value,
         SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS session_idx
  FROM flagged
)
SELECT user_id,
       MIN(ts) AS session_start,
       MAX(ts) + INTERVAL {SESSION_GAP_US} MICROSECONDS AS session_end,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       ROUND(SUM(value), 4) AS total_value
FROM numbered
GROUP BY user_id, session_idx
"""


@register(
    "sessionize_native_window",
    oracle=_NATIVE_SESSION_ORACLE,
    tags=("session", "window", "aggregation"),
)
def sessionize_native_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark's built-in ``session_window`` in BATCH mode: one
    groupBy(session_window(ts, gap), user) replaces the whole
    lag/flag/running-sum pipeline of sessionize_events. Hash-checked
    against a gap-logic oracle that replays the native half-open
    boundary rule (an event at exactly gap distance opens a new
    session).

    100 TB shape: one exchange on user_id; Spark merges session state
    in the aggregation operator itself (the same machinery the
    streaming variant uses), so no window-function sort pass over the
    events is needed."""
    ev = load_table(spark, sf_dir, "events")
    gap_s = SESSION_GAP_US // 1_000_000
    return (
        ev.groupBy(
            F.session_window("ts", f"{gap_s} seconds").alias("sw"), "user_id"
        )
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .select(
            "user_id",
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )


# ---------------------------------------------------------------------------
# First-order Markov transition matrix over per-user event journeys.
# ---------------------------------------------------------------------------
_MARKOV_ORACLE = """
WITH nxt AS (
  SELECT event_type,
         COALESCE(
           LEAD(event_type) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id),
           '__END__') AS next_type
  FROM events
),
t AS (
  SELECT event_type, next_type, COUNT(*) AS n_transitions
  FROM nxt GROUP BY event_type, next_type
)
SELECT event_type, next_type,
       CAST(n_transitions AS BIGINT) AS n_transitions,
       ROUND(n_transitions * 1.0 /
             SUM(n_transitions) OVER (PARTITION BY event_type),
             6) AS p_transition
FROM t
ORDER BY event_type, next_type
"""


@register(
    "sessionize_markov_transitions",
    oracle=_MARKOV_ORACLE,
    tags=("session", "window", "aggregation"),
)
def sessionize_markov_transitions(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """First-order Markov transition matrix of user journeys: for each
    (event_type -> next event_type) pair — including the absorbing
    '__END__' state for each user's final event — the transition count
    and its row-normalized probability. The behavioral fingerprint
    behind funnel drop-off analysis and synthetic-journey generation;
    deterministic via the (ts, event_id) ordering tie-break.

    100 TB shape: one shuffle on user_id for the LEAD window, then the
    transition aggregation is over a |types|^2-bounded key space —
    partial map-side aggregation collapses it before the exchange, and
    the ratio-to-report normalization runs on the tiny matrix itself.

    Reference parity: /root/reference has no sequence analytics
    (row-migration only, extractor.go); beyond-reference extension per
    the build brief.
    """
    from pyspark.sql import Window

    events = load_table(spark, sf_dir, "events")
    nxt = events.select(
        "event_type",
        F.coalesce(
            F.lead("event_type").over(
                Window.partitionBy("user_id").orderBy("ts", "event_id")
            ),
            F.lit("__END__"),
        ).alias("next_type"),
    )
    t = nxt.groupBy("event_type", "next_type").agg(
        F.count("*").alias("n_transitions")
    )
    w = Window.partitionBy("event_type")
    return t.select(
        "event_type",
        "next_type",
        F.col("n_transitions").cast("long").alias("n_transitions"),
        F.round(
            F.col("n_transitions") * 1.0 / F.sum("n_transitions").over(w), 6
        ).alias("p_transition"),
    ).orderBy("event_type", "next_type")

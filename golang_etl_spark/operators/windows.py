"""Window functions: ranking, analytic (lag/lead), frames
(rows/range-between), distribution (ntile/percent_rank/cume_dist).

Absent from the reference (SURVEY.md §2.5); exposed here 1:1 with
Spark's Window API. Scale note: a window partitioned on a key shuffles
once on that key — the same exchange a groupBy would need — and sorts
within partitions only. Never use a global (unpartitioned) window on
a fact table; the only global window here is over pre-aggregated data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from golang_etl_spark.registry import register
from golang_etl_spark.sources.catalog import load_table


@register(
    "window_rank_dense_rank",
    oracle="""
    SELECT c_custkey, c_nationkey, c_acctbal,
           CAST(RANK() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey) AS BIGINT) AS bal_rank,
           CAST(DENSE_RANK() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey) AS BIGINT) AS bal_dense_rank,
           CAST(ROW_NUMBER() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey) AS BIGINT) AS rn
    FROM customer
    """,
    tags=("window", "rank"),
)
def window_rank_dense_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank / dense_rank / row_number over a keyed window (deterministic
    order via c_custkey tiebreak)."""
    cust = load_table(spark, sf_dir, "customer")
    w = W.partitionBy("c_nationkey").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    return cust.select(
        "c_custkey",
        "c_nationkey",
        "c_acctbal",
        F.rank().over(w).cast("bigint").alias("bal_rank"),
        F.dense_rank().over(w).cast("bigint").alias("bal_dense_rank"),
        F.row_number().over(w).cast("bigint").alias("rn"),
    )


@register(
    "window_lag_lead",
    oracle="""
    SELECT user_id, event_id, event_type,
           LAG(event_type)  OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type,
           LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_type,
           ROUND(value - COALESCE(LAG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id), 0.0), 4) AS value_delta
    FROM events
    """,
    tags=("window", "analytic"),
)
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead over per-user event time (the CDC/sessionization
    building block)."""
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "user_id",
        "event_id",
        "event_type",
        F.lag("event_type").over(w).alias("prev_type"),
        F.lead("event_type").over(w).alias("next_type"),
        F.round(
            F.col("value") - F.coalesce(F.lag("value").over(w), F.lit(0.0)), 4
        ).alias("value_delta"),
    )


@register(
    "window_running_sum",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice,
           ROUND(SUM(o_totalprice) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS running_spend,
           CAST(COUNT(*) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS order_seq
    FROM orders
    """,
    tags=("window", "frame"),
)
def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative frame: running spend + order sequence per customer."""
    orders = load_table(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        F.round(F.sum("o_totalprice").over(w), 4).alias("running_spend"),
        F.count("*").over(w).cast("bigint").alias("order_seq"),
    )


@register(
    "window_moving_avg",
    oracle="""
    SELECT o_custkey, o_orderkey,
           ROUND(AVG(o_totalprice) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS moving_avg_3
    FROM orders
    """,
    tags=("window", "frame"),
)
def window_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding 3-row frame (moving average)."""
    orders = load_table(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(-2, W.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.avg("o_totalprice").over(w), 4).alias("moving_avg_3"),
    )


@register(
    "window_distribution",
    oracle="""
    SELECT c_custkey, c_acctbal,
           CAST(NTILE(4) OVER (ORDER BY c_acctbal, c_custkey) AS BIGINT) AS quartile,
           ROUND(PERCENT_RANK() OVER (ORDER BY c_acctbal, c_custkey), 6) AS pct_rank,
           ROUND(CUME_DIST() OVER (ORDER BY c_acctbal, c_custkey), 6) AS cume
    FROM customer
    """,
    tags=("window", "distribution"),
)
def window_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile/percent_rank/cume_dist. Global window is acceptable only
    because customer is dimension-sized; for facts use a partitioned
    variant."""
    cust = load_table(spark, sf_dir, "customer")
    w = W.orderBy("c_acctbal", "c_custkey")
    return cust.select(
        "c_custkey",
        "c_acctbal",
        F.ntile(4).over(w).cast("bigint").alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
    )


@register(
    "window_range_frame",
    oracle="""
    SELECT l_suppkey, l_orderkey, l_linenumber, l_quantity,
           ROUND(SUM(l_quantity) OVER (
               PARTITION BY l_suppkey ORDER BY l_quantity
               RANGE BETWEEN 5 PRECEDING AND CURRENT ROW), 4) AS qty_range_sum
    FROM lineitem
    WHERE l_suppkey <= 3
    """,
    tags=("window", "frame", "range"),
)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame (value-based, not row-based): sum of quantities
    within 5 units below the current row's quantity."""
    li = load_table(spark, sf_dir, "lineitem")
    w = (
        W.partitionBy("l_suppkey")
        .orderBy("l_quantity")
        .rangeBetween(-5, W.currentRow)
    )
    return li.filter(F.col("l_suppkey") <= 3).select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        "l_quantity",
        F.round(F.sum("l_quantity").over(w), 4).alias("qty_range_sum"),
    )


# ---------------------------------------------------------------------------
# Global (unpartitioned) ROW_NUMBER — without the single-reducer sort.
# ---------------------------------------------------------------------------
# A naive ROW_NUMBER() OVER (ORDER BY ...) funnels the entire table
# through ONE task (Spark plans Exchange SinglePartition + Sort). The
# scalable restatement generalizes etl_assign_sequential_ids' stride
# trick to ARBITRARY order keys: range-repartition on the key, rank
# within each range partition, add prefix-summed partition offsets
# (a window over #partitions rows, not data rows). Bit-identical to
# the global window, but every data-touching stage is parallel.
GLOBAL_RANK_PARTITIONS = 32


def global_row_number(
    df: DataFrame, order_cols, out_col: str = "rn",
    num_partitions: int = GLOBAL_RANK_PARTITIONS,
) -> DataFrame:
    """Exact global ROW_NUMBER over ``order_cols`` (list of Columns or
    names; make the total order unique with a key tiebreak). Two
    exchanges — the range partition on the key and the tiny hash
    shuffle the per-partition window needs — neither single-reducer.

    Determinism: range boundaries come from Spark's seeded sampler, so
    partition ids are stable across the plan's two references to the
    ranged frame (the exchange is reused); ranks are independent of the
    boundaries anyway, because ranking re-sorts within partitions by
    the full key and offsets come from realized partition sizes."""
    ranged = df.repartitionByRange(num_partitions, *order_cols).withColumn(
        "_pid", F.spark_partition_id()
    )
    counts = ranged.groupBy("_pid").agg(F.count("*").alias("_n"))
    w_off = W.orderBy("_pid").rowsBetween(W.unboundedPreceding, -1)
    offsets = counts.withColumn(
        "_offset", F.coalesce(F.sum("_n").over(w_off), F.lit(0))
    ).select("_pid", "_offset")
    w_in = W.partitionBy("_pid").orderBy(*order_cols)
    return (
        ranged.withColumn("_prn", F.row_number().over(w_in))
        .join(F.broadcast(offsets), "_pid")
        .withColumn(out_col, (F.col("_offset") + F.col("_prn")).cast("long"))
        .drop("_pid", "_prn", "_offset")
    )


@register(
    "window_global_rank",
    oracle="""
    SELECT o_orderkey, o_totalprice,
           CAST(ROW_NUMBER() OVER (ORDER BY o_totalprice DESC, o_orderkey)
                AS BIGINT) AS price_rank
    FROM orders
    """,
    tags=("window", "rank", "partitioning"),
)
def window_global_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global price rank of every order — the total-order window every
    leaderboard/percentile-cut pipeline needs, built scale-safe via
    global_row_number (hash-checked against the naive single-reducer
    formulation the oracle runs)."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    ranked = global_row_number(
        orders,
        [F.col("o_totalprice").desc(), F.col("o_orderkey")],
        out_col="price_rank",
    )
    return ranked.select("o_orderkey", "o_totalprice", "price_rank")


# ---------------------------------------------------------------------------
# Ratio-to-report: each row's share of its partition total.
# ---------------------------------------------------------------------------
_RATIO_ORACLE = """
SELECT o_orderpriority, o_orderstatus,
       ROUND(status_total, 4) AS status_total,
       ROUND(100.0 * status_total / SUM(status_total)
             OVER (PARTITION BY o_orderpriority), 4) AS pct_of_priority
FROM (
  SELECT o_orderpriority, o_orderstatus,
         SUM(o_totalprice) AS status_total
  FROM orders
  GROUP BY o_orderpriority, o_orderstatus
) s
ORDER BY o_orderpriority, o_orderstatus
"""


@register(
    "window_ratio_to_report",
    oracle=_RATIO_ORACLE,
    tags=("window", "analytic", "aggregation"),
)
def window_ratio_to_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percent-of-total ('ratio to report'): each (priority, status)
    revenue cell as a share of its priority's total, computed by an
    unbounded window over the PRE-AGGREGATED cells.

    Scale shape: the fact table aggregates first (partial-agg, one
    exchange); the share window runs over |priorities| x |statuses|
    rows — the module rule that global/frame windows only ever see
    pre-aggregated input. The window share is a double division of
    partition-summed doubles, rounded in both engines."""
    orders = load_table(spark, sf_dir, "orders")
    cells = orders.groupBy("o_orderpriority", "o_orderstatus").agg(
        F.sum("o_totalprice").alias("status_total")
    )
    w = W.partitionBy("o_orderpriority")
    return cells.select(
        "o_orderpriority",
        "o_orderstatus",
        F.round("status_total", 4).alias("status_total"),
        F.round(
            100.0 * F.col("status_total") / F.sum("status_total").over(w), 4
        ).alias("pct_of_priority"),
    ).orderBy("o_orderpriority", "o_orderstatus")


# ---------------------------------------------------------------------------
# Gaps and islands: consecutive-day activity streaks per user.
# ---------------------------------------------------------------------------
# The classic islands construction: for each user's distinct active
# days in order, day - row_number is constant within a consecutive
# run, so it keys the island. Output per user: number of streaks and
# the longest streak length. date - integer arithmetic is exact in
# both engines (no interval/timezone drift).
_ISLANDS_ORACLE = """
WITH days AS (
  SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS d
  FROM events
),
isl AS (
  SELECT user_id, d,
         d - CAST(ROW_NUMBER() OVER (
               PARTITION BY user_id ORDER BY d) AS INTEGER) AS anchor
  FROM days
),
streaks AS (
  SELECT user_id, anchor, COUNT(*) AS len
  FROM isl GROUP BY user_id, anchor
)
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_streaks,
       CAST(MAX(len) AS BIGINT) AS longest_streak
FROM streaks
GROUP BY user_id
ORDER BY user_id
"""


@register(
    "window_gaps_islands",
    oracle=_ISLANDS_ORACLE,
    tags=("window", "analytic", "session"),
)
def window_gaps_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Consecutive-day activity streaks per user via the
    day-minus-row_number islands key.

    Scale shape: the distinct collapses events to (user, day)
    granularity first (partial-agg'd, one exchange on user+day),
    then the window and both rollups share the user_id hash — at most
    two exchanges end-to-end, all over day-granularity rows, never
    raw events."""
    ev = load_table(spark, sf_dir, "events")
    days = ev.select(
        "user_id", F.to_date(F.col("ts")).alias("d")
    ).distinct()
    w = W.partitionBy("user_id").orderBy("d")
    isl = days.select(
        "user_id",
        "d",
        F.date_sub(
            F.col("d"), F.row_number().over(w).cast("int")
        ).alias("anchor"),
    )
    streaks = isl.groupBy("user_id", "anchor").agg(F.count("*").alias("len"))
    return (
        streaks.groupBy("user_id")
        .agg(
            F.count("*").alias("n_streaks"),
            F.max("len").alias("longest_streak"),
        )
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# first_value / last_value / nth_value over an explicit full frame.
# ---------------------------------------------------------------------------
_FIRST_LAST_ORACLE = """
SELECT o_orderkey, o_custkey, o_totalprice,
       ROUND(FIRST_VALUE(o_totalprice) OVER w, 4) AS first_price,
       ROUND(LAST_VALUE(o_totalprice) OVER w, 4) AS last_price,
       ROUND(NTH_VALUE(o_totalprice, 2) OVER w, 4) AS second_price
FROM orders
WHERE o_custkey <= 200
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
ORDER BY o_custkey, o_orderkey
"""


@register(
    "window_first_last_nth",
    oracle=_FIRST_LAST_ORACLE,
    tags=("window", "frame"),
)
def window_first_last_nth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first/last/nth_value with an EXPLICIT unbounded frame — the
    classic last_value trap: the default frame ends at CURRENT ROW, so
    last_value silently returns the current row's value unless the
    frame is widened. Every row carries its customer's highest,
    lowest, and second-highest order price (deterministic ordering
    with an id tie-break).

    100 TB shape: one shuffle on the partition key like any window;
    the unbounded-following frame buffers each partition (customer-
    sized — bounded). For corpus-wide extremes use a groupBy + join
    instead of a single giant partition."""
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_custkey") <= 200
    )
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return orders.select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        F.round(F.first("o_totalprice").over(w), 4).alias("first_price"),
        F.round(F.last("o_totalprice").over(w), 4).alias("last_price"),
        F.round(F.nth_value("o_totalprice", 2).over(w), 4).alias(
            "second_price"
        ),
    ).orderBy("o_custkey", "o_orderkey")


# ---------------------------------------------------------------------------
# Running COUNT(DISTINCT) — the window Spark refuses to evaluate.
# ---------------------------------------------------------------------------
# Cumulative distinct users per event_type by day. Spark raises on
# DISTINCT inside a window frame, so the distributed re-expression is
# the first-occurrence trick: flag each (type, user)'s first day with
# ROW_NUMBER, pre-aggregate new-user counts per (type, day), then a
# plain running SUM over the tiny day grid. DuckDB DOES support
# count(DISTINCT) over windows — the oracle uses the native form, so
# the hash gate proves the rewrite IS the distinct window.
_RUNNING_DISTINCT_ORACLE = """
WITH daily AS (
  SELECT DISTINCT event_type, date_trunc('day', ts) AS day, user_id
  FROM events
)
SELECT DISTINCT event_type, day,
       CAST(count(DISTINCT user_id) OVER (
         PARTITION BY event_type ORDER BY day
         RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS BIGINT) AS cum_distinct_users
FROM daily
"""


@register(
    "window_running_distinct",
    oracle=_RUNNING_DISTINCT_ORACLE,
    tags=("window", "frame", "distinct"),
)
def window_running_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative distinct users per event_type by day, without a
    distinct window aggregate (Spark has none): rank each (type, user)
    pair's days, count rank-1 rows per (type, day) — "users new that
    day" — and running-SUM those.

    100 TB shape: the ROW_NUMBER shuffle partitions on (type, user) —
    full key cardinality, well-spread; everything after operates on
    the |types| x |days| grid. The naive alternative (count distinct
    over an expanding self-join) is quadratic in days and shuffles the
    corpus per day."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.date_trunc("day", "ts").alias("day"), "user_id"
    )
    w_first = Window.partitionBy("event_type", "user_id").orderBy("day")
    new_users = (
        ev.withColumn("rn", F.row_number().over(w_first))
        .filter(F.col("rn") == 1)
        .groupBy("event_type", "day")
        .agg(F.count("*").alias("n_new"))
    )
    # the output spine must be every day a type has ACTIVITY (the
    # oracle's daily CTE), not just days with new users
    days = ev.select("event_type", "day").distinct()
    w_run = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        days.join(new_users, ["event_type", "day"], "left")
        .select(
            "event_type",
            "day",
            F.coalesce("n_new", F.lit(0)).alias("n_new"),
        )
        .select(
            "event_type",
            "day",
            F.sum("n_new").over(w_run).cast("long").alias(
                "cum_distinct_users"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Time-interval RANGE frame (the trailing-window-by-TIME variant).
# ---------------------------------------------------------------------------
_TIME_RANGE_SQL = """
SELECT user_id, event_id, ts, value,
       ROUND(SUM(value) OVER (
           PARTITION BY user_id ORDER BY ts
           RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW), 4)
         AS trailing_1h_value,
       CAST(COUNT(*) OVER (
           PARTITION BY user_id ORDER BY ts
           RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
         AS BIGINT) AS trailing_1h_events
FROM events
"""


@register(
    "window_time_range_frame",
    oracle=_TIME_RANGE_SQL,
    tags=("window", "frame", "range"),
)
def window_time_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame bounded by a TIME INTERVAL: each event's trailing
    one-hour activity per user, directly over the timestamp ordering
    (no epoch-cast workaround — Spark and DuckDB both bind INTERVAL
    frame bounds natively, and the identical SQL runs on both).
    Same-timestamp peers share a frame by RANGE semantics — part of
    the contract the hash gate pins.

    100 TB shape: one exchange on user_id like any window; the frame
    is evaluated with a sliding two-pointer over each partition's
    sort, not a per-row rescan."""
    from golang_etl_spark.sources.catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(_TIME_RANGE_SQL)

"""Sliding-window distinct counting — rolling active users.

COUNT(DISTINCT) over a sliding time window is the one aggregate the
window-function machinery cannot do distributed: Spark has no
DISTINCT window aggregate at all, and engines that do (single-node)
keep per-frame hash state. The running (cumulative) variant has the
first-occurrence rewrite (windows.py:window_running_distinct); the
ROLLING variant needs a different one — the explode-offsets rewrite:

  distinct (user, day) pairs            [1 shuffle, map-side combine]
  x explode over the W window offsets   [map-side Generate, x W rows]
  -> each pair votes for the W days it keeps the user "active"
  groupBy(day) countDistinct(user)      [standard 2-phase distinct]

State per task is bounded by (distinct pairs x W), never by raw
events; no per-frame rescans, no window state. The DuckDB oracle
states the definition directly (correlated COUNT(DISTINCT) over the
[day-6, day] range per observed day), so the hash gate proves the
rewrite. The same shape computes rolling-28 MAU or any trailing
distinct metric by changing W.

Reference parity: /root/reference has no aggregation surface at all;
beyond-reference extension per the build brief.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from golang_etl_spark.registry import register
from golang_etl_spark.sources.catalog import load_table

_WINDOW_DAYS = 7

_ROLLING_ORACLE = f"""
WITH pairs AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
),
days AS (SELECT DISTINCT day FROM pairs)
SELECT CAST(strftime(d.day, '%Y-%m-%d') AS VARCHAR) AS day,
       CAST((SELECT COUNT(DISTINCT p.user_id) FROM pairs p
             WHERE p.day BETWEEN d.day - {_WINDOW_DAYS - 1} AND d.day)
            AS BIGINT) AS n_users_7d,
       CAST((SELECT COUNT(DISTINCT p.user_id) FROM pairs p
             WHERE p.day = d.day) AS BIGINT) AS n_users_1d
FROM days d
"""


@register(
    "timeseries_rolling_distinct_users",
    oracle=_ROLLING_ORACLE,
    tags=("timeseries", "window", "stats"),
)
def timeseries_rolling_distinct_users(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per observed day: distinct users active in the trailing 7 days
    (rolling WAU) and on the day itself (DAU), via the explode-offsets
    rewrite — no distinct window aggregate exists to do this, and a
    per-day rescan would read the fact table W times.

    Output is restricted to days that appear in the data (broadcast
    semi-join with the observed-day set), so trailing ghost days after
    the last event don't appear — matching the oracle's observed-day
    calendar exactly.
    """
    ev = load_table(spark, sf_dir, "events")
    pairs = ev.select(
        "user_id", F.to_date("ts").alias("day")
    ).distinct()
    votes = pairs.select(
        "user_id",
        "day",
        F.explode(
            F.sequence(F.lit(0), F.lit(_WINDOW_DAYS - 1))
        ).alias("off"),
    ).select(
        "user_id",
        F.col("off"),
        F.date_add("day", F.col("off")).alias("day_out"),
    )
    rolled = votes.groupBy("day_out").agg(
        F.countDistinct("user_id").alias("n_users_7d"),
        F.countDistinct(
            F.when(F.col("off") == 0, F.col("user_id"))
        ).alias("n_users_1d"),
    )
    observed = pairs.select("day").distinct()
    return (
        rolled.join(
            F.broadcast(observed),
            rolled.day_out == observed.day,
            "inner",
        )
        .select(
            # formatted string, not DATE: the repo convention for
            # calendar keys (both engines serialize identically)
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.col("n_users_7d").cast("long").alias("n_users_7d"),
            F.col("n_users_1d").cast("long").alias("n_users_1d"),
        )
    )

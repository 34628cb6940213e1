"""Top-K per group — the canonical window + filter composition.

At scale this is one shuffle on the group key; each partition sorts
locally. For very hot groups, AQE skew handling splits them. Never
collect-and-sort on the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from golang_etl_spark.registry import register
from golang_etl_spark.sources.catalog import load_table


@register(
    "topk_orders_per_segment",
    oracle="""
    SELECT c_mktsegment, o_orderkey, o_totalprice, rn
    FROM (
        SELECT c.c_mktsegment, o.o_orderkey, o.o_totalprice,
               CAST(ROW_NUMBER() OVER (
                   PARTITION BY c.c_mktsegment
                   ORDER BY o.o_totalprice DESC, o.o_orderkey) AS BIGINT) AS rn
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    )
    WHERE rn <= 5
    """,
    tags=("topk", "window", "join"),
)
def topk_orders_per_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 orders by totalprice per market segment."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    w = W.partitionBy("c_mktsegment").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .select("c_mktsegment", "o_orderkey", "o_totalprice")
        .withColumn("rn", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rn") <= 5)
    )


@register(
    "topk_latest_event_per_user",
    oracle="""
    SELECT user_id, event_id, ts, event_type
    FROM (
        SELECT user_id, event_id, ts, event_type,
               ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        FROM events
    )
    WHERE rn = 1
    """,
    tags=("topk", "window"),
)
def topk_latest_event_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest-record-per-key (the dedup-by-recency / CDC-compaction
    pattern)."""
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_id", "ts", "event_type")
    )

"""Dominance and runtime-filter operators.

* ``topk_pareto_frontier`` — the skyline / Pareto-frontier operator
  (Borzsony, Kossmann, Stocker, ICDE 2001): the set of points not
  dominated on (maximize p_size, minimize p_retailprice). The naive
  formulation is an O(n^2) self-anti-join; for two criteria the
  frontier reduces to a running minimum over the per-size minima — a
  tiny grouped aggregate plus a broadcast join back, which is the
  100 TB plan. The DuckDB oracle states the NOT EXISTS dominance
  definition directly, so the hash gate proves the rewrite, not just
  the arithmetic.
* ``join_bloom_runtime_filter`` — Spark's InjectRuntimeFilter: when a
  selective dimension filter feeds a shuffle join, the optimizer builds
  a bloom filter over the build-side join keys and semi-filters the
  probe-side SCAN before the shuffle, cutting shuffled bytes by the
  filter's selectivity. On a 100 TB fact table this is the difference
  between shuffling the whole table and shuffling the ~4% that can
  match. Plan-gated in tests/test_quality_frontier.py (might_contain
  present).

Extends the engine beyond the reference's ETL surface
(/root/reference/extractor.go has no joins or analytics).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from golang_etl_spark.registry import register
from golang_etl_spark.sources.catalog import load_table

_PARETO_ORACLE = """
SELECT x.p_partkey, x.p_size, x.p_retailprice
FROM part x
WHERE NOT EXISTS (
  SELECT 1 FROM part y
  WHERE y.p_size >= x.p_size
    AND y.p_retailprice <= x.p_retailprice
    AND (y.p_size > x.p_size OR y.p_retailprice < x.p_retailprice)
)
"""


@register(
    "topk_pareto_frontier",
    oracle=_PARETO_ORACLE,
    tags=("topk", "relational"),
)
def topk_pareto_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto frontier over (p_size max, p_retailprice min).

    2-criteria skyline rewrite: group to one (size, min-price) row per
    size (map-side combinable, output = |distinct sizes| rows), take a
    running min over strictly-larger sizes on that TINY table (single-
    partition window over ~50 rows — deliberate and bounded), broadcast
    it back, and keep rows where price equals the size's min AND beats
    every larger size's best. Dominance ties (same size+price) stay on
    the frontier on both engines: neither point dominates the other
    because neither inequality is strict. No self-join ever touches
    the full table, so the operator scales as one scan + one grouped
    aggregate at 100 TB; the quadratic NOT EXISTS lives only in the
    oracle.
    """
    part = load_table(spark, sf_dir, "part")
    per_size = part.groupBy("p_size").agg(
        F.min("p_retailprice").alias("mp")
    )
    w = (
        Window.orderBy(F.col("p_size").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    tiny = per_size.withColumn("best_above", F.min("mp").over(w))
    return (
        part.join(F.broadcast(tiny), "p_size")
        .where(
            (F.col("p_retailprice") == F.col("mp"))
            & (
                F.col("best_above").isNull()
                | (F.col("p_retailprice") < F.col("best_above"))
            )
        )
        .select("p_partkey", "p_size", "p_retailprice")
    )


_BLOOM_ORACLE = """
SELECT l_returnflag,
       CAST(COUNT(*) AS BIGINT) AS n_items,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
WHERE o_orderpriority = '1-URGENT'
GROUP BY l_returnflag
"""


@register(
    "join_bloom_runtime_filter",
    oracle=_BLOOM_ORACLE,
    tags=("join", "scale"),
)
def join_bloom_runtime_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-dimension join under Spark's runtime bloom filter
    (InjectRuntimeFilter): the selective `o_orderpriority` predicate
    on orders becomes a bloom filter over o_orderkey that semi-filters
    the lineitem SCAN before the shuffle — `might_contain(...)` lands
    in the probe side's filter, so ~80% of the fact table never enters
    the exchange. Runs on an isolated `newSession()` because the demo
    needs a shuffle join (autoBroadcastJoinThreshold=-1 — a broadcast
    join would get the same effect from the broadcast itself) and a
    zero application-side size threshold at fixture scale; at real
    scale the defaults fire on their own. Conf changes never touch the
    caller's session.
    """
    s2 = spark.newSession()
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s2.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    s2.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter."
        "applicationSideScanSizeThreshold",
        "0",
    )
    li = load_table(s2, sf_dir, "lineitem")
    orders = load_table(s2, sf_dir, "orders").where(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))),
                2,
            ).alias("revenue"),
        )
    )

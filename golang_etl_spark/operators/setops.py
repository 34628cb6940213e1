"""Set operations: UNION ALL / UNION DISTINCT / INTERSECT / EXCEPT.

The reference's only set operation is the prototype's physical shard
fan-in (a UNION ALL over channels — /root/reference/tmp/df_extractor.go:187-194);
Spark's set ops subsume it. INTERSECT/EXCEPT plan as semi/anti joins
after Catalyst — they shuffle on the full row, so project to the
minimal column set first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from golang_etl_spark.registry import register
from golang_etl_spark.sources.catalog import load_table


@register(
    "setop_union_all",
    oracle="""
    SELECT c_nationkey AS nationkey, 'customer' AS side FROM customer
    UNION ALL
    SELECT s_nationkey AS nationkey, 'supplier' AS side FROM supplier
    """,
    tags=("setop",),
)
def setop_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL (bag union) — Spark's unionByName; a no-shuffle
    concatenation of inputs."""
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey"), F.lit("customer").alias("side")
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey"), F.lit("supplier").alias("side")
    )
    return cust.unionByName(supp)


@register(
    "setop_union_distinct",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    UNION
    SELECT s_nationkey AS nationkey FROM supplier
    """,
    tags=("setop",),
)
def setop_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (set union): union all + distinct (one shuffle on the row)."""
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return cust.unionByName(supp).distinct()


@register(
    "setop_intersect",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey AS nationkey FROM supplier
    """,
    tags=("setop",),
)
def setop_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct semantics) — nations with both customers and
    suppliers."""
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return cust.intersect(supp)


@register(
    "setop_except",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    EXCEPT
    SELECT s_nationkey AS nationkey FROM supplier
    """,
    tags=("setop",),
)
def setop_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct anti set) — nations with customers but no
    suppliers."""
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return cust.subtract(supp)  # EXCEPT == subtract (distinct semantics)


@register(
    "setop_shard_union",
    oracle="""
    SELECT shard, CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(MIN(l_orderkey) AS BIGINT) AS min_key,
           CAST(MAX(l_orderkey) AS BIGINT) AS max_key
    FROM (
        SELECT 'jerry' AS shard, l_orderkey FROM lineitem WHERE l_orderkey % 2 = 0
        UNION ALL
        SELECT 'pikachu' AS shard, l_orderkey FROM lineitem WHERE l_orderkey % 2 = 1
    )
    GROUP BY shard
    ORDER BY shard
    """,
    tags=("setop", "etl-parity"),
)
def setop_shard_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shard fan-in parity: the reference's two MySQL shards
    (jerry/pikachu, /root/reference/extractor.go:233-236) union into
    one logical table, tagged with their shard of origin
    (/root/reference/tmp/df_extractor.go:187-194). Simulated by
    splitting lineitem on key parity."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey")
    jerry = li.filter(F.col("l_orderkey") % 2 == 0).withColumn(
        "shard", F.lit("jerry")
    )
    pikachu = li.filter(F.col("l_orderkey") % 2 == 1).withColumn(
        "shard", F.lit("pikachu")
    )
    return (
        jerry.unionByName(pikachu)
        .groupBy("shard")
        .agg(
            F.count("*").alias("n_rows"),
            F.min("l_orderkey").cast("bigint").alias("min_key"),
            F.max("l_orderkey").cast("bigint").alias("max_key"),
        )
        .orderBy("shard")
    )


# ---------------------------------------------------------------------------
# Multiset set ops: INTERSECT ALL / EXCEPT ALL.
# ---------------------------------------------------------------------------
# The ALL variants keep MULTIPLICITY — intersect = min(counts),
# except = max(0, left - right) copies — which the DISTINCT forms
# above erase. The right side mixes multiplicity 1 and 2 (open orders
# appear twice) so the min/subtraction rules actually exercise.
#
# The right side MUST be parenthesized at the use sites: INTERSECT
# binds tighter than UNION, and EXCEPT/UNION are left-associative (in
# both Spark and DuckDB), so the bare `left INTERSECT ALL SELECT ...
# UNION ALL SELECT ...` would parse as `(left INTERSECT ALL first
# branch) UNION ALL second branch` — an unconditional append, not an
# intersect against the 1-or-2-copy multiset.
_MULTISET_RIGHT = """
  SELECT o_orderkey AS k FROM orders WHERE o_orderkey <= 2000
  UNION ALL
  SELECT o_orderkey FROM orders
  WHERE o_orderkey <= 2000 AND o_orderstatus = 'O'
"""

_INTERSECT_ALL_ORACLE = f"""
SELECT k, CAST(COUNT(*) AS BIGINT) AS n_copies FROM (
  SELECT l_orderkey AS k FROM lineitem WHERE l_orderkey <= 2000
  INTERSECT ALL
  ({_MULTISET_RIGHT})
) t GROUP BY k
"""


@register(
    "setop_intersect_all", oracle=_INTERSECT_ALL_ORACLE, tags=("setop",)
)
def setop_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL (multiset): each key survives min(left copies,
    right copies) times — lineitem's per-order line count against a
    1-or-2-copy right side. Spark plans the multiplicity bookkeeping
    as a single hash aggregation with paired counts, no join."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(_INTERSECT_ALL_ORACLE)


_EXCEPT_ALL_ORACLE = f"""
SELECT k, CAST(COUNT(*) AS BIGINT) AS n_copies FROM (
  SELECT l_orderkey AS k FROM lineitem WHERE l_orderkey <= 2000
  EXCEPT ALL
  ({_MULTISET_RIGHT})
) t GROUP BY k
"""


@register("setop_except_all", oracle=_EXCEPT_ALL_ORACLE, tags=("setop",))
def setop_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL (multiset): each key keeps max(0, left copies -
    right copies) occurrences — per-order line counts minus the
    1-or-2-copy right side."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(_EXCEPT_ALL_ORACLE)

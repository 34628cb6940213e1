"""Core relational surface: projection/filter, joins (all types),
grouped aggregation (+ cube/rollup/grouping sets), scalar functions,
pivot, subqueries.

The reference has none of these (SURVEY.md §2.5 — its only predicate is
the JDBC partition range, /root/reference/extractor.go:63); this module
exposes the full surface Spark provides, each query paired with a
DuckDB oracle.

Scale notes (100 TB stance):
- fact-to-fact joins (lineitem x orders) shuffle on the join key; AQE
  handles skew. Dimension joins (customer/nation/region/supplier/part)
  are explicitly ``F.broadcast`` so no shuffle of the fact side occurs.
- every query is a single declarative plan: filters sit against the
  parquet scan (PushedFilters), projections prune columns (ReadSchema).
- float aggregates are rounded in-query (both engines) so results are
  bit-stable across accumulation orders — required for oracle hashing,
  and harmless semantically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from golang_etl_spark.registry import register
from golang_etl_spark.sources.catalog import load_table


# ---------------------------------------------------------------------------
# TPC-H Q1 style pricing summary: the flagship aggregation query.
# ---------------------------------------------------------------------------
@register(
    "agg_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 4)                                        AS sum_qty,
           ROUND(SUM(l_extendedprice), 4)                                   AS sum_base_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 4)                AS sum_disc_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 4)  AS sum_charge,
           ROUND(AVG(l_quantity), 4)                                        AS avg_qty,
           ROUND(AVG(l_extendedprice), 4)                                   AS avg_price,
           ROUND(AVG(l_discount), 4)                                        AS avg_disc,
           CAST(COUNT(*) AS BIGINT)                                         AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
    tags=("aggregation", "tpch"),
)
def agg_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1: grouped 8-way aggregation with arithmetic on the fly.

    Partial aggregation (map-side combine) happens automatically; the
    shuffle carries only |groups| x 8 values per partition.
    """
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 4).alias("sum_base_price"),
            F.round(F.sum(disc_price), 4).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 4).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# ---------------------------------------------------------------------------
# Projection + filter: must push to the parquet scan.
# ---------------------------------------------------------------------------
@register(
    "filter_project",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity,
           ROUND(l_extendedprice * (1 - l_discount), 4) AS net_price
    FROM lineitem
    WHERE l_shipdate < TIMESTAMP '1996-01-01 00:00:00' AND l_quantity > 30
    """,
    tags=("scan", "filter", "projection"),
)
def filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filter + narrow projection. Catalyst pushes both into the scan:
    .explain shows PushedFilters [LessThan(l_shipdate,...),
    GreaterThan(l_quantity,30)] and a 6-column ReadSchema."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") < F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_quantity") > 30)
    ).select(
        "l_orderkey",
        "l_linenumber",
        "l_quantity",
        F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias(
            "net_price"
        ),
    )


# ---------------------------------------------------------------------------
# Inner join chain with broadcast dimension.
# ---------------------------------------------------------------------------
@register(
    "join_revenue_by_segment",
    oracle="""
    SELECT c.c_mktsegment,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_items
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_mktsegment
    ORDER BY c.c_mktsegment
    """,
    tags=("join", "aggregation", "broadcast"),
)
def join_revenue_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-fact join (lineitem x orders, shuffled on orderkey) then a
    broadcast dimension join (customer). At 100 TB the customer dim is
    the only broadcast-able side; orders/lineitem co-shuffle once."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue"),
            F.count("*").alias("n_items"),
        )
        .orderBy("c_mktsegment")
    )


@register(
    "join_left_outer",
    oracle="""
    SELECT c.c_custkey, c.c_name,
           CAST(COUNT(o.o_orderkey) AS BIGINT) AS n_orders,
           ROUND(COALESCE(SUM(o.o_totalprice), 0.0), 4) AS total_spend
    FROM customer c
    LEFT JOIN orders o ON o.o_custkey = c.c_custkey
    GROUP BY c.c_custkey, c.c_name
    """,
    tags=("join",),
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER join preserving customers with zero orders."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        cust.join(orders, orders.o_custkey == cust.c_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.round(F.coalesce(F.sum("o_totalprice"), F.lit(0.0)), 4).alias(
                "total_spend"
            ),
        )
    )


@register(
    "join_right_outer",
    oracle="""
    SELECT c.c_custkey, c.c_name,
           CAST(COUNT(o.o_orderkey) AS BIGINT) AS n_orders,
           ROUND(COALESCE(SUM(o.o_totalprice), 0.0), 4) AS total_spend
    FROM orders o
    RIGHT JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_custkey, c.c_name
    """,
    tags=("join",),
)
def join_right_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RIGHT OUTER join — the mirror of join_left_outer written from
    the orders side, preserving customers with zero orders. Same
    result by construction; registered so the join-type matrix is
    explicit rather than implied."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey, "right")
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.round(F.coalesce(F.sum("o_totalprice"), F.lit(0.0)), 4).alias(
                "total_spend"
            ),
        )
    )


@register(
    "join_full_outer",
    oracle="""
    WITH c AS (SELECT c_nationkey AS nationkey, CAST(COUNT(*) AS BIGINT) AS n_customers
               FROM customer GROUP BY c_nationkey),
         s AS (SELECT s_nationkey AS nationkey, CAST(COUNT(*) AS BIGINT) AS n_suppliers
               FROM supplier GROUP BY s_nationkey)
    SELECT COALESCE(c.nationkey, s.nationkey) AS nationkey,
           COALESCE(c.n_customers, 0) AS n_customers,
           COALESCE(s.n_suppliers, 0) AS n_suppliers
    FROM c FULL OUTER JOIN s ON c.nationkey = s.nationkey
    """,
    tags=("join",),
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join of per-nation customer and supplier counts."""
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    c = cust.groupBy(F.col("c_nationkey").alias("nationkey")).agg(
        F.count("*").alias("n_customers")
    )
    s = supp.groupBy(F.col("s_nationkey").alias("nationkey")).agg(
        F.count("*").alias("n_suppliers")
    )
    return (
        c.join(s, "nationkey", "full_outer")
        .select(
            F.col("nationkey"),
            F.coalesce("n_customers", F.lit(0)).alias("n_customers"),
            F.coalesce("n_suppliers", F.lit(0)).alias("n_suppliers"),
        )
    )


@register(
    "join_semi",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 100000)
    """,
    tags=("join", "semi"),
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI join == EXISTS: customers with at least one big order.
    Semi joins never duplicate or widen rows — the build side only
    carries the key, so the shuffle is minimal."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 100000)
    return cust.join(
        orders, cust.c_custkey == orders.o_custkey, "left_semi"
    ).select("c_custkey", "c_name", "c_mktsegment")


@register(
    "join_anti",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
    tags=("join", "anti"),
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI join == NOT EXISTS: customers with no orders."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@register(
    "join_cross",
    oracle="""
    SELECT r.r_name, p.o_orderpriority
    FROM region r
    CROSS JOIN (SELECT DISTINCT o_orderpriority FROM orders) p
    """,
    tags=("join", "cross"),
)
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CROSS join of two tiny inputs (both broadcast-size)."""
    region = load_table(spark, sf_dir, "region")
    prios = load_table(spark, sf_dir, "orders").select("o_orderpriority").distinct()
    return region.select("r_name").crossJoin(prios)


@register(
    "join_star_schema",
    oracle="""
    SELECT r.r_name, n.n_name,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue
    FROM lineitem l
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name, n.n_name
    ORDER BY r.r_name, n.n_name
    """,
    tags=("join", "broadcast", "star"),
)
def join_star_schema(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star join: the fact table joins three broadcast dimensions in a
    row — zero shuffles of lineitem until the final aggregation."""
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue")
        )
        .orderBy("r_name", "n_name")
    )


# ---------------------------------------------------------------------------
# Aggregation variants.
# ---------------------------------------------------------------------------
@register(
    "agg_having",
    oracle="""
    SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_orders,
           ROUND(SUM(o_totalprice), 4) AS spend
    FROM orders
    GROUP BY o_custkey
    HAVING COUNT(*) >= 5
    """,
    tags=("aggregation",),
)
def agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY ... HAVING (post-aggregation filter)."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_custkey")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 4).alias("spend"),
        )
        .filter(F.col("n_orders") >= 5)
    )


@register(
    "agg_distinct",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_parts,
           CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS n_suppliers,
           CAST(COUNT(*) AS BIGINT) AS n_rows
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("aggregation", "distinct"),
)
def agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-column COUNT DISTINCT (expand + two-phase agg in Spark)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_suppliers"),
        F.count("*").alias("n_rows"),
    )


@register(
    "agg_stats",
    oracle="""
    SELECT l_linestatus,
           ROUND(MIN(l_extendedprice), 4)          AS min_price,
           ROUND(MAX(l_extendedprice), 4)          AS max_price,
           ROUND(STDDEV_SAMP(l_extendedprice), 4)  AS sd_price,
           ROUND(VAR_SAMP(l_extendedprice), 4)     AS var_price
    FROM lineitem
    GROUP BY l_linestatus
    """,
    tags=("aggregation", "stats"),
)
def agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates (min/max/stddev/variance)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_linestatus").agg(
        F.round(F.min("l_extendedprice"), 4).alias("min_price"),
        F.round(F.max("l_extendedprice"), 4).alias("max_price"),
        F.round(F.stddev_samp("l_extendedprice"), 4).alias("sd_price"),
        F.round(F.var_samp("l_extendedprice"), 4).alias("var_price"),
    )


@register(
    "agg_cube",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 4) AS sum_qty,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    tags=("aggregation", "cube"),
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE: all 2^k grouping combinations in one pass."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
        F.count("*").alias("n"),
    )


@register(
    "agg_rollup",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_extendedprice), 4) AS sum_price
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    tags=("aggregation", "rollup"),
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP: hierarchical subtotals."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_extendedprice"), 4).alias("sum_price")
    )


@register(
    "agg_grouping_sets",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
    """,
    tags=("aggregation", "grouping_sets"),
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS via SQL (same Catalyst plan as cube)."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
        """
    )


# ---------------------------------------------------------------------------
# Scalar function library (string/date/math/conditional).
# ---------------------------------------------------------------------------
@register(
    "scalar_string_funcs",
    oracle="""
    SELECT p_partkey,
           UPPER(p_brand)                         AS brand_upper,
           LOWER(p_type)                          AS type_lower,
           CAST(LENGTH(p_name) AS INT)            AS name_len,
           SUBSTR(p_name, 1, 8)                   AS name_prefix,
           CONCAT(p_brand, ':', p_type)           AS brand_type,
           REPLACE(p_type, ' ', '_')              AS type_snake,
           CASE WHEN p_name LIKE '%green%' THEN 1 ELSE 0 END AS has_green
    FROM part
    """,
    tags=("functions", "string"),
)
def scalar_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String function battery: upper/lower/length/substr/concat/
    replace/LIKE — all JVM-side codegen'd expressions."""
    part = load_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.upper("p_brand").alias("brand_upper"),
        F.lower("p_type").alias("type_lower"),
        F.length("p_name").cast("int").alias("name_len"),
        F.substring("p_name", 1, 8).alias("name_prefix"),
        F.concat_ws(":", "p_brand", "p_type").alias("brand_type"),
        F.replace(F.col("p_type"), F.lit(" "), F.lit("_")).alias("type_snake"),
        F.when(F.col("p_name").like("%green%"), 1).otherwise(0).alias("has_green"),
    )


@register(
    "scalar_date_funcs",
    oracle="""
    SELECT o_orderkey,
           CAST(YEAR(o_orderdate) AS INT)      AS order_year,
           CAST(MONTH(o_orderdate) AS INT)     AS order_month,
           CAST(DAY(o_orderdate) AS INT)       AS order_day,
           CAST(DAYOFWEEK(o_orderdate) AS INT) AS order_dow,
           strftime(o_orderdate, '%Y-%m-%d')   AS order_date,
           CAST(DATE_TRUNC('month', o_orderdate) AS TIMESTAMP) AS month_start,
           CAST(o_orderdate + INTERVAL 30 DAY AS TIMESTAMP)    AS due_date
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
    """,
    tags=("functions", "date"),
)
def scalar_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time function battery over timestamp columns.

    Note: DuckDB dayofweek is 0=Sunday..6; Spark dayofweek is
    1=Sunday..7 — normalized here to DuckDB's convention via -1.
    """
    orders = load_table(spark, sf_dir, "orders")
    return orders.filter(
        F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp")
    ).select(
        "o_orderkey",
        F.year("o_orderdate").cast("int").alias("order_year"),
        F.month("o_orderdate").cast("int").alias("order_month"),
        F.dayofmonth("o_orderdate").cast("int").alias("order_day"),
        (F.dayofweek("o_orderdate") - 1).cast("int").alias("order_dow"),
        # string, not DATE: arrow date32 vs the oracle's timestamp dtype
        # would mismatch in the driver's schema compare
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        (F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")).alias("due_date"),
    )


@register(
    "scalar_math_funcs",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           ROUND(ABS(l_discount - 0.05), 6)          AS disc_dev,
           CAST(CEIL(l_quantity) AS BIGINT)          AS qty_ceil,
           CAST(FLOOR(l_extendedprice) AS BIGINT)    AS price_floor,
           ROUND(SQRT(l_extendedprice), 6)           AS price_sqrt,
           ROUND(LN(l_extendedprice + 1), 6)         AS price_ln,
           ROUND(POWER(l_quantity, 2), 6)            AS qty_sq,
           CAST(l_orderkey % 7 AS BIGINT)            AS key_mod7,
           ROUND(GREATEST(l_discount, l_tax), 6)     AS max_rate,
           ROUND(LEAST(l_discount, l_tax), 6)        AS min_rate
    FROM lineitem
    WHERE l_linenumber = 1 AND l_orderkey % 10 = 0
    """,
    tags=("functions", "math"),
)
def scalar_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math function battery: abs/ceil/floor/sqrt/ln/pow/mod/greatest."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter((F.col("l_linenumber") == 1) & (F.col("l_orderkey") % 10 == 0)).select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.abs(F.col("l_discount") - 0.05), 6).alias("disc_dev"),
        F.ceil("l_quantity").cast("bigint").alias("qty_ceil"),
        F.floor("l_extendedprice").cast("bigint").alias("price_floor"),
        F.round(F.sqrt("l_extendedprice"), 6).alias("price_sqrt"),
        F.round(F.log(F.col("l_extendedprice") + 1), 6).alias("price_ln"),
        F.round(F.pow("l_quantity", F.lit(2)), 6).alias("qty_sq"),
        (F.col("l_orderkey") % 7).cast("bigint").alias("key_mod7"),
        F.round(F.greatest("l_discount", "l_tax"), 6).alias("max_rate"),
        F.round(F.least("l_discount", "l_tax"), 6).alias("min_rate"),
    )


@register(
    "scalar_conditional",
    oracle="""
    SELECT c_custkey,
           CASE WHEN c_acctbal < 0 THEN 'negative'
                WHEN c_acctbal < 5000 THEN 'low'
                WHEN c_acctbal < 9000 THEN 'mid'
                ELSE 'high' END AS bal_bucket,
           COALESCE(NULLIF(c_mktsegment, 'MACHINERY'), 'OTHER') AS seg_or_other
    FROM customer
    """,
    tags=("functions", "conditional"),
)
def scalar_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE WHEN bucketing + NULLIF/COALESCE null plumbing."""
    cust = load_table(spark, sf_dir, "customer")
    return cust.select(
        "c_custkey",
        F.when(F.col("c_acctbal") < 0, "negative")
        .when(F.col("c_acctbal") < 5000, "low")
        .when(F.col("c_acctbal") < 9000, "mid")
        .otherwise("high")
        .alias("bal_bucket"),
        F.coalesce(
            F.nullif(F.col("c_mktsegment"), F.lit("MACHINERY")), F.lit("OTHER")
        ).alias("seg_or_other"),
    )


@register(
    "json_extract",
    oracle="""
    SELECT event_id, event_type,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_value
    FROM events
    WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) > 50
    """,
    tags=("functions", "json"),
)
def json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-in-string extraction (events.props), filtered on the
    extracted value."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return ev.select("event_id", "event_type", k.alias("k_value")).filter(
        F.col("k_value") > 50
    )


# ---------------------------------------------------------------------------
# Sort / limit / pivot / subqueries.
# ---------------------------------------------------------------------------
@register(
    "sort_limit_topn",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC
    LIMIT 25
    """,
    tags=("sort", "limit"),
)
def sort_limit_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-N: Spark plans TakeOrderedAndProject — each partition
    keeps its local top 25, the driver merges; no full sort at scale.
    Tie-broken on o_orderkey for determinism."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(25)
    )


@register(
    "pivot_status_by_priority",
    oracle="""
    SELECT o_orderpriority,
           ROUND(COALESCE(SUM(CASE WHEN o_orderstatus = 'F' THEN o_totalprice END), 0.0), 4) AS F,
           ROUND(COALESCE(SUM(CASE WHEN o_orderstatus = 'O' THEN o_totalprice END), 0.0), 4) AS O,
           ROUND(COALESCE(SUM(CASE WHEN o_orderstatus = 'P' THEN o_totalprice END), 0.0), 4) AS P
    FROM orders
    GROUP BY o_orderpriority
    """,
    tags=("pivot",),
)
def pivot_status_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT with an explicit value list (no extra pass to discover
    pivot values — required at scale)."""
    orders = load_table(spark, sf_dir, "orders")
    out = (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.round(F.coalesce(F.sum("o_totalprice"), F.lit(0.0)), 4))
    )
    return out.select(
        "o_orderpriority",
        F.coalesce(F.col("F"), F.lit(0.0)).alias("F"),
        F.coalesce(F.col("O"), F.lit(0.0)).alias("O"),
        F.coalesce(F.col("P"), F.lit(0.0)).alias("P"),
    )


@register(
    "unpivot_stack",
    oracle="""
    SELECT c_custkey, 'acctbal' AS metric, c_acctbal AS value FROM customer
    UNION ALL
    SELECT c_custkey, 'nationkey' AS metric, CAST(c_nationkey AS DOUBLE) AS value
    FROM customer
    """,
    tags=("unpivot",),
)
def unpivot_stack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (wide -> long) via stack()."""
    cust = load_table(spark, sf_dir, "customer")
    return cust.select(
        "c_custkey",
        F.expr(
            "stack(2, 'acctbal', c_acctbal, 'nationkey', CAST(c_nationkey AS DOUBLE))"
        ).alias("metric", "value"),
    )


@register(
    "subquery_scalar",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    WHERE o_totalprice > (SELECT AVG(o_totalprice) * 2 FROM orders)
    """,
    tags=("subquery",),
)
def subquery_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery in a predicate (orders > 2x average)."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderkey, o_totalprice
        FROM orders
        WHERE o_totalprice > (SELECT AVG(o_totalprice) * 2 FROM orders)
        """
    )


@register(
    "subquery_in",
    oracle="""
    SELECT o_orderkey, o_custkey, o_orderstatus
    FROM orders
    WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
    """,
    tags=("subquery",),
)
def subquery_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-subquery (decorrelated to a semi join by Catalyst)."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    return spark.sql(
        """
        SELECT o_orderkey, o_custkey, o_orderstatus
        FROM orders
        WHERE o_custkey IN (SELECT c_custkey FROM customer
                            WHERE c_mktsegment = 'BUILDING')
        """
    )


@register(
    "correlated_exists_agg",
    oracle="""
    SELECT n.n_name, CAST(COUNT(c.c_custkey) AS BIGINT) AS n_rich
    FROM nation n
    LEFT JOIN customer c
      ON c.c_nationkey = n.n_nationkey AND c.c_acctbal > 7500
    GROUP BY n.n_name
    ORDER BY n.n_name
    """,
    tags=("join", "aggregation"),
)
def correlated_exists_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dimension-preserving count with a filtered outer join."""
    nation = load_table(spark, sf_dir, "nation")
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 7500)
    return (
        nation.join(cust, cust.c_nationkey == nation.n_nationkey, "left")
        .groupBy("n_name")
        .agg(F.count("c_custkey").alias("n_rich"))
        .orderBy("n_name")
    )


# ---------------------------------------------------------------------------
# Variant JSON (Spark 4 native semi-structured type).
# ---------------------------------------------------------------------------
_VARIANT_ORACLE = """
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
         AS k_total,
       CAST(MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
         AS k_max
FROM events
GROUP BY event_type
"""


@register("variant_json_agg", oracle=_VARIANT_ORACLE, tags=("json", "variant"))
def variant_json_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured aggregation through Spark 4's VARIANT type:
    ``parse_json`` converts the JSON string column to a binary-encoded
    variant ONCE, then ``variant_get`` extracts typed paths — the
    shredding-friendly representation that beats per-access string
    re-parsing (`json_extract`-style) when several fields are read
    from the same document at 100 TB. The DuckDB oracle replays the
    same result through its JSON functions."""
    ev = load_table(spark, sf_dir, "events")
    v = ev.select(
        "event_type",
        F.expr("variant_get(parse_json(props), '$.k', 'bigint')").alias("k"),
    )
    return v.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.sum("k").cast("bigint").alias("k_total"),
        F.max("k").cast("bigint").alias("k_max"),
    )


# ---------------------------------------------------------------------------
# try_* safe-arithmetic functions (ANSI-safe data cleaning).
# ---------------------------------------------------------------------------
_TRY_FUNCS_ORACLE = """
SELECT event_id,
       TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
       CASE WHEN value = 0 THEN NULL ELSE
         TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) / value
       END AS k_per_value,
       TRY_CAST(event_type AS BIGINT) AS bad_cast
FROM events
WHERE event_id < 1000
"""


@register("scalar_try_funcs", oracle=_TRY_FUNCS_ORACLE, tags=("scalar",))
def scalar_try_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI-safe scalar surface: ``try_cast`` / ``try_divide`` return
    NULL instead of raising on bad input — the dirty-data posture a
    curation pipeline wants (a single malformed row must not kill a
    100 TB job). ``bad_cast`` exercises the guaranteed-failure path
    (casting a word to BIGINT) and must be NULL on every row."""
    ev = load_table(spark, sf_dir, "events")
    return ev.filter(F.col("event_id") < 1000).select(
        "event_id",
        F.expr("try_cast(get_json_object(props, '$.k') AS BIGINT)").alias("k"),
        F.expr(
            "try_divide(try_cast(get_json_object(props, '$.k') AS BIGINT), value)"
        ).alias("k_per_value"),
        F.expr("try_cast(event_type AS BIGINT)").alias("bad_cast"),
    )


# ---------------------------------------------------------------------------
# Market-basket co-occurrence (frequent pair mining).
# ---------------------------------------------------------------------------
_COOC_ORACLE = """
WITH ob AS (
  SELECT DISTINCT l.l_orderkey, p.p_brand
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
)
SELECT a.p_brand AS brand_a, b.p_brand AS brand_b,
       CAST(COUNT(*) AS BIGINT) AS n_orders
FROM ob a
JOIN ob b ON a.l_orderkey = b.l_orderkey AND a.p_brand < b.p_brand
GROUP BY a.p_brand, b.p_brand
ORDER BY n_orders DESC, brand_a, brand_b
LIMIT 20
"""


@register(
    "agg_brand_cooccurrence",
    oracle=_COOC_ORACLE,
    tags=("aggregation", "join", "topk"),
)
def agg_brand_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top co-purchased brand pairs: distinct (order, brand), pair
    expansion within each order, global pair counts — the A-priori
    candidate-generation kernel of market-basket mining.

    Scale shape: baskets form with ONE exchange (collect_set partial-
    aggregates map-side), pairs expand map-side via higher-order
    lambdas (blowup bounded by basket width squared, ~tens), the pair
    count is a partial-agg hash aggregate, and the final top-20 is a
    TakeOrdered. No self-join, no pair matrix."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    # explicit repartition on the basket key (r18): the HOF pair
    # expansion below is heavy per ROW, light in bytes, and size-first
    # AQE coalescing otherwise collapses the basket aggregate's output
    # to ~1 post-shuffle task, serializing the explode (interleaved
    # A/B at sf0.1: 2.74s -> 1.40s). Same key as the groupBy, so the
    # aggregate reuses the partitioning — no extra exchange; explicit
    # counts are exempt from coalescing (the dedup._pin_partitions
    # pattern).
    baskets = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .repartition(spark.sparkContext.defaultParallelism, "l_orderkey")
        .groupBy("l_orderkey")
        .agg(F.collect_set("p_brand").alias("brands"))
    )
    # map-side pair expansion via higher-order lambdas: for each basket
    # emit every ordered pair (b1 < b2). Replaces a self-join (second
    # exchange + sort) with a projection over the already-grouped
    # basket — one exchange total before the pair count.
    pairs = baskets.select(
        F.explode(
            F.expr(
                "flatten(transform(brands, b1 -> "
                "transform(filter(brands, b2 -> b2 > b1), "
                "b2 -> struct(b1 AS brand_a, b2 AS brand_b))))"
            )
        ).alias("p")
    )
    return (
        pairs.select("p.brand_a", "p.brand_b")
        .groupBy("brand_a", "brand_b")
        .agg(F.count("*").alias("n_orders"))
        .orderBy(F.desc("n_orders"), "brand_a", "brand_b")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Nested-data modeling: build documents, shred them back (JSON).
# ---------------------------------------------------------------------------
_NESTED_ORACLE = """
SELECT o.o_orderpriority,
       CAST(COUNT(DISTINCT o.o_orderkey) AS BIGINT) AS n_orders,
       CAST(COUNT(*) AS BIGINT) AS n_lines,
       ROUND(SUM(l.l_quantity), 4) AS total_qty
FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
GROUP BY o.o_orderpriority
"""


@register(
    "json_nested_roundtrip",
    oracle=_NESTED_ORACLE,
    tags=("json", "aggregation", "etl-parity"),
)
def json_nested_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested-document modeling round trip: assemble each order and
    its line items into ONE nested JSON document (struct + array-of-
    struct → ``to_json``), then shred the documents back
    (``from_json`` with an explicit nested schema → explode) and
    aggregate. The result hash-matches the flat join the documents
    were built from — the denormalize → document-store → re-normalize
    cycle is lossless, which is the contract every event-log /
    API-payload ingestion assumes.

    100 TB shape: nesting is the same one-exchange collect_list
    grouping every document build pays; shredding is map-side
    (from_json + Generate). The JSON string is the expensive part —
    at scale keep the STRUCT columns and skip the serialization
    unless an external system needs the text form (the reference's
    row→JSON encode, SURVEY.md §2.2 P5, is that external need)."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )
    nested = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey", "o_orderpriority")
        .agg(
            F.collect_list(
                F.struct("l_linenumber", "l_quantity")
            ).alias("lines")
        )
        .select(
            F.to_json(
                F.struct("o_orderkey", "o_orderpriority", "lines")
            ).alias("doc")
        )
    )
    schema = (
        "STRUCT<o_orderkey: BIGINT, o_orderpriority: STRING, "
        "lines: ARRAY<STRUCT<l_linenumber: BIGINT, l_quantity: DOUBLE>>>"
    )
    shredded = nested.select(
        F.from_json("doc", schema).alias("d")
    ).select(
        "d.o_orderkey",
        "d.o_orderpriority",
        F.explode("d.lines").alias("line"),
    )
    return shredded.groupBy("o_orderpriority").agg(
        F.countDistinct("o_orderkey").alias("n_orders"),
        F.count("*").alias("n_lines"),
        F.round(F.sum("line.l_quantity"), 4).alias("total_qty"),
    )


# ---------------------------------------------------------------------------
# Null-aware NOT IN (anti join with three-valued-logic semantics).
# ---------------------------------------------------------------------------
@register(
    "subquery_not_in_nullaware",
    oracle="""
    SELECT o_orderkey, o_custkey, o_orderstatus
    FROM orders
    WHERE o_custkey NOT IN (SELECT c_custkey FROM customer
                            WHERE c_mktsegment = 'BUILDING')
    """,
    tags=("subquery", "anti", "join"),
)
def subquery_not_in_nullaware(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT IN subquery — NOT the same as an anti join: under SQL's
    three-valued logic a single NULL in the subquery empties the
    result, and a NULL probe key never qualifies. Catalyst plans the
    single-column form as a broadcast null-aware anti join (NAAJ)
    rather than the O(n·m) BroadcastNestedLoopJoin fallback;
    tests/test_plans.py gates that the NAAJ flag is actually present.

    100 TB shape: build side (the customer-key set) broadcasts; the
    orders probe streams map-side with no shuffle. If the build side
    outgrew the broadcast threshold you would rewrite to an explicit
    anti join after PROVING the subquery column non-null (add a
    WHERE c_custkey IS NOT NULL guard) — which is also the fix if the
    planner ever falls back to a nested loop."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    return spark.sql(
        """
        SELECT o_orderkey, o_custkey, o_orderstatus
        FROM orders
        WHERE o_custkey NOT IN (SELECT c_custkey FROM customer
                                WHERE c_mktsegment = 'BUILDING')
        """
    )


# ---------------------------------------------------------------------------
# Ordered string aggregation (LISTAGG / STRING_AGG).
# ---------------------------------------------------------------------------
@register(
    "agg_string_agg",
    oracle="""
    SELECT n_name,
           CAST(COUNT(*) AS BIGINT) AS n_suppliers,
           STRING_AGG(s_name, '|' ORDER BY s_name) AS supplier_list
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    GROUP BY n_name
    """,
    tags=("aggregation", "functions", "string"),
)
def agg_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered LISTAGG: supplier names per nation joined into one
    '|'-separated string. collect_list's order is
    partition-arrival-nondeterministic, so the canonical distributed
    formulation is collect_list -> array_sort -> array_join — the sort
    happens per GROUP on the already-aggregated array (bounded, local),
    never as a global ORDER BY.

    100 TB shape: one hash aggregation with map-side partials; the only
    caveat is group cardinality — a group's concatenated string must
    fit in memory, so guard with a slice() cap when group sizes are
    unbounded."""
    sup = load_table(spark, sf_dir, "supplier").select("s_name", "s_nationkey")
    nat = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        sup.join(F.broadcast(nat), sup.s_nationkey == nat.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count("*").alias("n_suppliers"),
            F.array_join(F.array_sort(F.collect_list("s_name")), "|").alias(
                "supplier_list"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Deterministic MODE + exact MEDIAN per group.
# ---------------------------------------------------------------------------
@register(
    "agg_mode_median",
    oracle="""
    WITH counts AS (
      SELECT o_orderpriority, CAST(FLOOR(l_quantity) AS BIGINT) AS qty,
             COUNT(*) AS c
      FROM orders JOIN lineitem ON l_orderkey = o_orderkey
      GROUP BY o_orderpriority, qty
    ),
    ranked AS (
      SELECT o_orderpriority, qty, c,
             ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                ORDER BY c DESC, qty) AS rk
      FROM counts
    ),
    med AS (
      SELECT o_orderpriority, MEDIAN(l_quantity) AS median_qty,
             CAST(COUNT(*) AS BIGINT) AS n_lines
      FROM orders JOIN lineitem ON l_orderkey = o_orderkey
      GROUP BY o_orderpriority
    )
    SELECT m.o_orderpriority, r.qty AS mode_qty,
           CAST(r.c AS BIGINT) AS mode_count, m.median_qty, m.n_lines
    FROM med m JOIN ranked r ON r.o_orderpriority = m.o_orderpriority
    WHERE r.rk = 1
    """,
    tags=("aggregation", "stats"),
)
def agg_mode_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-priority modal (integer) quantity and exact median quantity.
    Spark's built-in mode() breaks ties arbitrarily (engine-dependent),
    so the mode is computed DETERMINISTICALLY: count per (group, value)
    then rank by (count DESC, value ASC) — two exchanges, both on
    low-cardinality keys, and the tie-break is part of the contract so
    the result hash-matches any engine. Median uses exact
    percentile(0.5) (linear interpolation, matching DuckDB's MEDIAN);
    at 100 TB swap in percentile_approx — the sketch_percentile_approx
    query is that production twin."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    # FLOOR before the integer cast: a bare CAST to BIGINT rounds in
    # DuckDB but truncates in Spark — identical only while l_quantity
    # is integral. FLOOR pins both engines to the same bucket for any
    # fractional fixture (same pattern as profile_leading_digit).
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        F.floor("l_quantity").cast("long").alias("qty"),
        "l_quantity",
    )
    joined = orders.join(li, orders.o_orderkey == li.l_orderkey)
    counts = joined.groupBy("o_orderpriority", "qty").agg(
        F.count("*").alias("c")
    )
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("c").desc(), F.col("qty")
    )
    mode = (
        counts.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(
            "o_orderpriority",
            F.col("qty").alias("mode_qty"),
            F.col("c").alias("mode_count"),
        )
    )
    med = joined.groupBy("o_orderpriority").agg(
        F.expr("percentile(l_quantity, 0.5)").alias("median_qty"),
        F.count("*").alias("n_lines"),
    )
    return med.join(F.broadcast(mode), "o_orderpriority").select(
        "o_orderpriority", "mode_qty", "mode_count", "median_qty", "n_lines"
    )


# ---------------------------------------------------------------------------
# FILTER-clause aggregation (conditional aggregates without CASE).
# ---------------------------------------------------------------------------
_FILTER_AGG_SQL = """
SELECT o_orderpriority,
       CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT)
         AS n_finished,
       CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS BIGINT)
         AS n_open,
       ROUND(SUM(o_totalprice) FILTER (WHERE o_totalprice > 100000), 4)
         AS big_order_total,
       CAST(COUNT(*) AS BIGINT) AS n_all
FROM orders
GROUP BY o_orderpriority
"""


@register(
    "agg_filter_clause",
    oracle=_FILTER_AGG_SQL,
    tags=("aggregation", "sql"),
)
def agg_filter_clause(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-standard FILTER clause: several differently-predicated
    aggregates over ONE scan and ONE exchange (the poor-man's
    alternative — one groupBy per predicate plus joins — multiplies
    both). Identical text runs on both engines, so the passthrough is
    its own oracle."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(_FILTER_AGG_SQL)


# ---------------------------------------------------------------------------
# Null-safe equality join (<=> / IS NOT DISTINCT FROM).
# ---------------------------------------------------------------------------
@register(
    "join_null_safe_eq",
    oracle="""
    WITH l AS (
      SELECT o_orderkey, NULLIF(o_custkey % 50, 0) AS k FROM orders
      WHERE o_orderkey <= 2000
    ),
    r AS (
      SELECT NULLIF(c_custkey % 50, 0) AS k,
             COUNT(*) AS n_cust
      FROM customer GROUP BY 1
    )
    SELECT l.o_orderkey, l.k,
           CAST(COALESCE(r.n_cust, 0) AS BIGINT) AS n_cust
    FROM l JOIN r ON l.k IS NOT DISTINCT FROM r.k
    """,
    tags=("join",),
)
def join_null_safe_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality join: NULL keys MATCH each other (<=> /
    IS NOT DISTINCT FROM), where plain equi-join drops them. The keys
    are made sparse-null with NULLIF so the semantics actually fire.

    100 TB shape: Spark plans <=> as a regular hash join on the
    null-safe-wrapped key (all NULLs co-locate in one partition — a
    skew hazard if nulls dominate; pre-split or COALESCE-tag them
    when they do)."""
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderkey") <= 2000
    ).select(
        "o_orderkey",
        F.nullif(F.col("o_custkey") % 50, F.lit(0)).alias("k"),
    )
    cust = (
        load_table(spark, sf_dir, "customer")
        .select(F.nullif(F.col("c_custkey") % 50, F.lit(0)).alias("k"))
        .groupBy("k")
        .agg(F.count("*").alias("n_cust"))
    )
    return orders.join(cust, orders.k.eqNullSafe(cust.k)).select(
        "o_orderkey",
        orders.k.alias("k"),
        F.coalesce("n_cust", F.lit(0)).cast("long").alias("n_cust"),
    )


# ---------------------------------------------------------------------------
# Ordered-set aggregates (WITHIN GROUP syntax).
# ---------------------------------------------------------------------------
_WITHIN_GROUP_SQL = """
SELECT l_returnflag,
       percentile_cont(0.5) WITHIN GROUP (ORDER BY l_quantity) AS median_qty,
       percentile_cont(0.9) WITHIN GROUP (ORDER BY l_quantity) AS p90_qty,
       percentile_disc(0.25) WITHIN GROUP (ORDER BY l_quantity) AS p25_disc,
       CAST(COUNT(*) AS BIGINT) AS n_rows
FROM lineitem
GROUP BY l_returnflag
"""


@register(
    "agg_percentile_within_group",
    oracle=_WITHIN_GROUP_SQL,
    tags=("aggregation", "stats", "sql"),
)
def agg_percentile_within_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-standard ordered-set aggregates: percentile_cont
    (interpolating) and percentile_disc (an actual data value) via
    WITHIN GROUP (ORDER BY ...) — identical text on both engines.
    Exact percentiles buffer the group's values; the 100 TB path is
    approx_percentile (sketch_percentile_approx), with this as the
    verification surface."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(_WITHIN_GROUP_SQL)


# ---------------------------------------------------------------------------
# Bitwise aggregates (bit_and / bit_or / bit_xor).
# ---------------------------------------------------------------------------
_BITWISE_SQL = """
SELECT o_orderpriority,
       CAST(bit_and(o_custkey % 256) AS BIGINT) AS mask_and,
       CAST(bit_or(o_custkey % 256) AS BIGINT) AS mask_or,
       CAST(bit_xor(o_custkey % 256) AS BIGINT) AS mask_xor,
       CAST(COUNT(*) AS BIGINT) AS n_rows
FROM orders
GROUP BY o_orderpriority
"""


@register(
    "agg_bitwise",
    oracle=_BITWISE_SQL,
    tags=("aggregation", "functions", "math"),
)
def agg_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise reduction aggregates over a bounded key domain —
    feature-flag folding / bitmap accumulation as identical SQL text
    on both engines. Commutative and associative, so they partial-
    aggregate map-side like SUM; XOR is also the classic distributed
    checksum (a lost or doubled row flips it)."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(_BITWISE_SQL)

"""Array/collection function surface: grouped collection into arrays,
higher-order lambdas (filter), ordered dedup (collect_set +
array_sort), and deterministic rendering (concat_ws).

No reference counterpart (SURVEY.md §2.5) — function-surface
extension; complements ``scalar_*`` (primitives) and ``json_extract``
(semi-structured).

Scale notes (100 TB stance):
- one shuffle (the groupBy on the uniform l_orderkey); collect_list /
  collect_set buffers are per-order line counts (bounded ~7), not
  table-scale.
- every array op after collection is a JVM higher-order lambda inside
  whole-stage codegen — no Python.
- arrays are *rendered to strings* in the output: array columns
  round-trip differently through Spark/DuckDB→pandas (list vs
  numpy.ndarray), which the driver's value-hash would treat as a
  mismatch; comma-joined sorted strings are representation-stable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from golang_etl_spark.registry import register
from golang_etl_spark.sources.catalog import load_table

BIG_QTY = 30.0

_ARRAY_ORACLE = f"""
SELECT l_orderkey,
       CAST(COUNT(*) AS BIGINT) AS n_lines,
       array_to_string(list(l_linenumber ORDER BY l_linenumber), ',')
         AS line_numbers,
       array_to_string(list_sort(list_distinct(list(l_linestatus))), ',')
         AS statuses,
       CAST(len(list_filter(list(l_quantity), q -> q >= {BIG_QTY}))
            AS BIGINT) AS n_big_lines,
       ROUND(SUM(l_extendedprice), 4) AS gross
FROM lineitem
GROUP BY l_orderkey
"""


@register("array_funcs_per_order", oracle=_ARRAY_ORACLE, tags=("arrays",))
def array_funcs_per_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-order line rollup exercising the array surface: sorted
    collect_list, sorted-distinct collect_set, a higher-order filter
    lambda, and concat_ws rendering."""
    li = load_table(spark, sf_dir, "lineitem")
    grouped = li.groupBy("l_orderkey").agg(
        F.count("*").alias("n_lines"),
        F.array_sort(F.collect_list("l_linenumber")).alias("lns"),
        F.array_sort(F.collect_set("l_linestatus")).alias("sts"),
        F.collect_list("l_quantity").alias("qtys"),
        F.round(F.sum("l_extendedprice"), 4).alias("gross"),
    )
    return grouped.select(
        "l_orderkey",
        "n_lines",
        F.concat_ws(
            ",", F.transform("lns", lambda x: x.cast("string"))
        ).alias("line_numbers"),
        F.concat_ws(",", "sts").alias("statuses"),
        F.size(F.filter("qtys", lambda q: q >= BIG_QTY))
        .cast("long")
        .alias("n_big_lines"),
        "gross",
    )


# ---------------------------------------------------------------------------
# Map (key-value) function surface.
# ---------------------------------------------------------------------------
# Map columns built JVM-side (map_from_arrays over a per-order
# rollup), consumed via element_at / map_keys / cardinality, and
# RENDERED to scalars before output: map columns round-trip
# differently through the two engines' pandas paths (dict vs list of
# pairs, nondeterministic key order), so — like the arrays above —
# the hash-stable output is scalars derived FROM the map, proving the
# construction and lookup semantics without hashing the container.
_MAP_ORACLE = """
WITH per_status AS (
  SELECT o_custkey, o_orderstatus, COUNT(*) AS n
  FROM orders GROUP BY o_custkey, o_orderstatus
),
m AS (
  SELECT o_custkey,
         map_from_entries(list({'k': o_orderstatus, 'v': n}
                               ORDER BY o_orderstatus)) AS status_map
  FROM per_status GROUP BY o_custkey
)
SELECT o_custkey,
       CAST(len(map_keys(status_map)) AS BIGINT) AS n_statuses,
       array_to_string(list_sort(map_keys(status_map)), ',') AS statuses,
       CAST(COALESCE(status_map['O'][1], 0) AS BIGINT) AS n_open,
       CAST(COALESCE(status_map['F'][1], 0) AS BIGINT) AS n_filled
FROM m
"""


@register("map_funcs_per_customer", oracle=_MAP_ORACLE, tags=("arrays",))
def map_funcs_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer order-status map: build map<status, count> with
    map_from_entries over sorted (k, v) structs, read it back with
    element_at / map_keys / size — the map-type counterpart of
    array_funcs_per_order. Same one-shuffle scale shape (groupBy on
    customer key; maps are per-customer sized, bounded by the status
    domain)."""
    orders = load_table(spark, sf_dir, "orders")
    per_status = orders.groupBy("o_custkey", "o_orderstatus").agg(
        F.count("*").alias("n")
    )
    # one aggregate, one sort: map_from_entries over sorted (k, v)
    # structs — no cross-array alignment invariant to maintain (and
    # the exact construction the DuckDB oracle uses)
    m = per_status.groupBy("o_custkey").agg(
        F.map_from_entries(
            F.array_sort(
                F.collect_list(F.struct("o_orderstatus", F.col("n")))
            )
        ).alias("status_map")
    )
    return m.select(
        "o_custkey",
        F.size(F.map_keys(F.col("status_map"))).cast("long").alias("n_statuses"),
        F.concat_ws(",", F.array_sort(F.map_keys("status_map"))).alias(
            "statuses"
        ),
        F.coalesce(F.element_at("status_map", F.lit("O")), F.lit(0))
        .cast("long")
        .alias("n_open"),
        F.coalesce(F.element_at("status_map", F.lit("F")), F.lit(0))
        .cast("long")
        .alias("n_filled"),
    )

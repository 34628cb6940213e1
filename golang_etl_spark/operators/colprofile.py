"""Column-level entropy profiling — the feature-selection /
drift-baseline complement of the row-level profilers (profiling.py)
and the document-level token entropy (text.py).

For each profiled column: cardinality, row count, Shannon entropy of
the value distribution, and the length-normalized form H/log2(k).
Near-zero entropy flags constant-ish columns (drop before training);
entropy near log2(k) flags uniform IDs masquerading as categories.
Computed as H = log2(n) - (Σ c·log2(c))/n over per-value counts —
one unpivot (map-side Expand, no Python) and one aggregation per
column, all map-side combinable; the SAME formula on both engines so
the float path agrees bit-for-bit.

Reference parity: /root/reference (extractor.go) migrates data
unprofiled; this is a beyond-reference extension per the build brief.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from golang_etl_spark.registry import register
from golang_etl_spark.sources.catalog import load_table

# (profile label, engine-shared value expression over orders)
_COLS = (
    ("o_orderstatus", "o_orderstatus"),
    ("o_orderpriority", "o_orderpriority"),
    ("order_year", "CAST(year(o_orderdate) AS {str_t})"),
)

_COL_ENTROPY_ORACLE = f"""
WITH vals AS (
  {" UNION ALL ".join(
      f"SELECT '{label}' AS column_name, {expr.format(str_t='VARCHAR')} AS v FROM orders"
      for label, expr in _COLS
  )}
),
cnt AS (
  SELECT column_name, v, COUNT(*) AS c FROM vals GROUP BY column_name, v
),
agg AS (
  SELECT column_name,
         CAST(SUM(c) AS DOUBLE) AS n,
         COUNT(*) AS k,
         SUM(c * log2(CAST(c AS DOUBLE))) AS clog
  FROM cnt GROUP BY column_name
)
SELECT column_name,
       CAST(n AS BIGINT) AS n_rows,
       CAST(k AS BIGINT) AS n_distinct,
       ROUND(log2(n) - clog / n, 6) AS entropy,
       CASE WHEN k > 1
            THEN ROUND((log2(n) - clog / n) / log2(CAST(k AS DOUBLE)), 6)
            ELSE 0.0 END AS norm_entropy
FROM agg
"""


@register(
    "profile_column_entropy",
    oracle=_COL_ENTROPY_ORACLE,
    tags=("profiling", "stats"),
)
def profile_column_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column Shannon entropy over the orders table (status,
    priority, order year): one stack() unpivot fused into the scan,
    per-(column, value) partial counts, then a 3-row final aggregate.
    Two exchanges total, both on tiny keys; at 100 TB the first
    aggregation's map-side combine reduces each task's output to its
    local distinct values, so the shuffle carries O(k x tasks) rows,
    never the table.
    """
    orders = load_table(spark, sf_dir, "orders")
    stack_args = ", ".join(
        f"'{label}', {expr.format(str_t='STRING')}" for label, expr in _COLS
    )
    vals = orders.selectExpr(
        f"stack({len(_COLS)}, {stack_args}) AS (column_name, v)"
    )
    cnt = vals.groupBy("column_name", "v").agg(F.count(F.lit(1)).alias("c"))
    n = F.sum("c").cast("double")
    clog = F.sum(F.col("c") * F.log2(F.col("c").cast("double")))
    k = F.count(F.lit(1))
    agg = cnt.groupBy("column_name").agg(
        n.alias("n"), k.alias("k"), clog.alias("clog")
    )
    h = F.log2("n") - F.col("clog") / F.col("n")
    return agg.select(
        "column_name",
        F.col("n").cast("long").alias("n_rows"),
        F.col("k").cast("long").alias("n_distinct"),
        F.round(h, 6).alias("entropy"),
        F.when(F.col("k") > 1, F.round(h / F.log2(F.col("k").cast("double")), 6))
        .otherwise(F.lit(0.0))
        .alias("norm_entropy"),
    )


# ---------------------------------------------------------------------------
# Mutual information between two categorical columns — the SOFT
# dependency measure completing the profiler family: entropy (above)
# scores single columns, functional-dependency discovery (fdeps.py)
# tests the hard X -> Y case; MI quantifies everything in between.
# ---------------------------------------------------------------------------
# Same integer-logs discipline as the entropy profiler: with
# S(g) = Σ c_g·log2(c_g) over a grouping g,
#   H_x  = log2(N) - S(x)/N
#   MI   = log2(N) + S(x,y)/N - S(x)/N - S(y)/N
# so every log argument is an integer COUNT and the float path agrees
# across engines; ROUND(.,6) absorbs summation-order last bits.
# One scan: the joint table is |X|·|Y| rows; both margins re-aggregate
# it (map-side combinable), never the fact table.
_MI_ORACLE = """
WITH joint AS (
  SELECT o_orderpriority AS x, o_orderstatus AS y, COUNT(*) AS c
  FROM orders GROUP BY 1, 2
),
tot AS (SELECT SUM(c) AS n, SUM(c * LOG2(c)) AS sxy FROM joint),
mx AS (
  SELECT SUM(cx * LOG2(cx)) AS sx
  FROM (SELECT SUM(c) AS cx FROM joint GROUP BY x)
),
my AS (
  SELECT SUM(cy * LOG2(cy)) AS sy
  FROM (SELECT SUM(c) AS cy FROM joint GROUP BY y)
)
SELECT ROUND(LOG2(n) + sxy / n - sx / n - sy / n, 6) AS mi_bits,
       ROUND(LOG2(n) - sx / n, 6) AS h_priority,
       ROUND(LOG2(n) - sy / n, 6) AS h_status,
       ROUND((LOG2(n) + sxy / n - sx / n - sy / n) /
             SQRT((LOG2(n) - sx / n) * (LOG2(n) - sy / n)), 6) AS nmi
FROM tot, mx, my
"""


@register(
    "profile_mutual_information",
    oracle=_MI_ORACLE,
    tags=("profiling", "stats", "aggregation"),
)
def profile_mutual_information(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information (bits) between order priority and order
    status, with both marginal entropies and the normalized form
    MI/sqrt(Hx·Hy). One fact-table scan builds the |X|·|Y| joint
    count table; margins and totals re-aggregate that tiny table, and
    the three 1-row aggregates attach by broadcast cross join. At
    100 TB this is scan + one map-side-combined exchange on (x, y) —
    the joint table stays |domains|-bounded however many rows feed
    it."""
    orders = load_table(spark, sf_dir, "orders")
    joint = (
        orders.groupBy(
            F.col("o_orderpriority").alias("x"),
            F.col("o_orderstatus").alias("y"),
        )
        .agg(F.count("*").alias("c"))
    )
    tot = joint.agg(
        F.sum("c").alias("n"),
        F.sum(F.col("c") * F.log2("c")).alias("sxy"),
    )
    mx = (
        joint.groupBy("x")
        .agg(F.sum("c").alias("cx"))
        .agg(F.sum(F.col("cx") * F.log2("cx")).alias("sx"))
    )
    my = (
        joint.groupBy("y")
        .agg(F.sum("c").alias("cy"))
        .agg(F.sum(F.col("cy") * F.log2("cy")).alias("sy"))
    )
    one = tot.crossJoin(F.broadcast(mx)).crossJoin(F.broadcast(my))
    mi = F.log2("n") + F.col("sxy") / F.col("n") - F.col("sx") / F.col("n") - F.col("sy") / F.col("n")
    hx = F.log2("n") - F.col("sx") / F.col("n")
    hy = F.log2("n") - F.col("sy") / F.col("n")
    return one.select(
        F.round(mi, 6).alias("mi_bits"),
        F.round(hx, 6).alias("h_priority"),
        F.round(hy, 6).alias("h_status"),
        F.round(mi / F.sqrt(hx * hy), 6).alias("nmi"),
    )

"""Spark 4 SQL scripting surface (BEGIN ... END procedural blocks).

The last modern-SQL passthrough surface the engine exposes after
recursive CTEs, LATERAL, pipe syntax, and GROUP BY ALL
(sql_api.py): multi-statement scripts with DECLAREd session
variables, SET from scalar subqueries, and WHILE control flow,
executed entirely by the SQL front-end — the stored-procedure-shaped
workload a warehouse migration brings along.

The demo computes a two-round sigma-clipped (robust) mean of order
prices: each WHILE iteration re-estimates the mean over rows within
2 previous-sigma of the previous mean, then the deviation over rows
within 2 previous-sigma of the NEW mean — genuinely iterative state
(the loop variables), per-iteration work that is ONE scan-shaped
aggregate each, exactly how an iterative algorithm should touch
100 TB. The DuckDB oracle UNROLLS the same two iterations as chained
CTEs (the repo's established pattern for iterative algorithms under
the hash gate — see clustering.py's PageRank), so the hash gate
proves the script's sequencing, not just its arithmetic.

Runs on an isolated newSession: scripting sits behind
spark.sql.scripting.enabled, and the demo must not flip confs on the
caller's session.

Reference parity: /root/reference has no SQL surface; beyond-
reference extension per the build brief.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from golang_etl_spark.registry import register
from golang_etl_spark.sources.catalog import register_views

_SCRIPT = """
BEGIN
  DECLARE mu DOUBLE;
  DECLARE sd DOUBLE;
  DECLARE i INT DEFAULT 0;
  SET mu = (SELECT AVG(o_totalprice) FROM orders);
  SET sd = (SELECT STDDEV_POP(o_totalprice) FROM orders);
  WHILE i < 2 DO
    SET mu = (SELECT AVG(o_totalprice) FROM orders
              WHERE ABS(o_totalprice - mu) <= 2 * sd);
    SET sd = (SELECT STDDEV_POP(o_totalprice) FROM orders
              WHERE ABS(o_totalprice - mu) <= 2 * sd);
    SET i = i + 1;
  END WHILE;
  SELECT ROUND(mu, 2) AS robust_mean,
         ROUND(sd, 2) AS robust_std,
         CAST(i AS BIGINT) AS iterations;
END
"""

# The oracle unrolls the script's exact sequencing: iteration k's mean
# uses (mu_{k-1}, sd_{k-1}); its deviation uses (mu_k, sd_{k-1}).
_SCRIPT_ORACLE = """
WITH s0 AS (
  SELECT AVG(o_totalprice) AS mu, STDDEV_POP(o_totalprice) AS sd
  FROM orders
),
m1 AS (
  SELECT AVG(o_totalprice) AS mu FROM orders, s0
  WHERE ABS(o_totalprice - s0.mu) <= 2 * s0.sd
),
d1 AS (
  SELECT STDDEV_POP(o_totalprice) AS sd FROM orders, m1, s0
  WHERE ABS(o_totalprice - m1.mu) <= 2 * s0.sd
),
m2 AS (
  SELECT AVG(o_totalprice) AS mu FROM orders, m1, d1
  WHERE ABS(o_totalprice - m1.mu) <= 2 * d1.sd
),
d2 AS (
  SELECT STDDEV_POP(o_totalprice) AS sd FROM orders, m2, d1
  WHERE ABS(o_totalprice - m2.mu) <= 2 * d1.sd
)
SELECT ROUND(m2.mu, 2) AS robust_mean,
       ROUND(d2.sd, 2) AS robust_std,
       CAST(2 AS BIGINT) AS iterations
FROM m2, d2
"""


@register(
    "sql_scripting_robust_mean",
    oracle=_SCRIPT_ORACLE,
    tags=("sql", "scripting"),
)
def sql_scripting_robust_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-round sigma-clipped mean of order prices via a Spark 4 SQL
    script (DECLARE / SET-from-subquery / WHILE); the oracle unrolls
    the identical iteration sequence as chained CTEs. Loop state lives
    in session variables (driver-side scalars); each iteration's data
    work is one scan + one aggregate, so rounds scale linearly with
    the table and the loop depth is fixed — the same iterative-
    algorithm shape as the fixed-round PageRank."""
    s2 = spark.newSession()
    s2.conf.set("spark.sql.scripting.enabled", "true")
    register_views(s2, sf_dir, ("orders",))
    return s2.sql(_SCRIPT)

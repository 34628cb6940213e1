"""Skew-mitigated join: key salting. The standard fix when one join
key dominates (a power-law user, a null-ish default key) and a single
reducer would receive the whole hot key's rows.

No reference counterpart (SURVEY.md §2.5) — scale-technique operator.

Mechanics: the fact side gets a deterministic salt in [0, SALT_BUCKETS)
(``pmod(event_id, N)`` — derived from the row, not ``rand()``, so the
result is replayable), the dimension side is replicated once per salt
value via ``explode(sequence(...))``, and the join key becomes
(key, salt): the hot key's rows now spread across SALT_BUCKETS
reducers instead of one.

Scale notes (100 TB stance):
- the join is hinted ``shuffle_hash``: at fixture scale AQE would
  broadcast the replicated dimension and quietly bypass the very
  shuffle the salt is there to fix — the hint keeps the demonstrated
  plan the one that matters at cluster scale (dim too big to
  broadcast, fact skewed). AQE's own skew-join split handles moderate
  skew; explicit salting is the deterministic heavy-hammer for
  pathological keys, and composes with AQE.
- replication cost is |dim| × SALT_BUCKETS rows shuffled once —
  bounded and chosen (16), versus an unbounded hot-reducer stall.
- the post-join aggregation is unchanged: partial aggs absorb the
  salt before the final shuffle.

The result is byte-identical to the unsalted join — the DuckDB oracle
runs the plain formulation, proving salting is a pure execution-level
rewrite.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from golang_etl_spark.registry import register
from golang_etl_spark.sources.catalog import load_table

SALT_BUCKETS = 16

_SALTED_ORACLE = """
SELECT c.c_mktsegment,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       ROUND(SUM(e.value), 4) AS total_value
FROM events e
JOIN customer c ON e.user_id = c.c_custkey
GROUP BY c.c_mktsegment
"""


@register("join_skew_salted", oracle=_SALTED_ORACLE, tags=("join", "skew"))
def join_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events-to-customer join executed with a salted (key, salt)
    equi-join spread over SALT_BUCKETS reducers, aggregated to
    per-segment counts/sums. Oracle = the plain unsalted join: same
    answer, different (skew-proof) execution."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "value"
    )
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    fact = ev.withColumn("salt", F.pmod(F.col("event_id"), F.lit(SALT_BUCKETS)))
    dim = cust.withColumn(
        "salt", F.explode(F.sequence(F.lit(0), F.lit(SALT_BUCKETS - 1)))
    )
    joined = fact.join(
        dim.hint("shuffle_hash"),
        (fact["user_id"] == dim["c_custkey"]) & (fact["salt"] == dim["salt"]),
    )
    return joined.groupBy("c_mktsegment").agg(
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 4).alias("total_value"),
    )

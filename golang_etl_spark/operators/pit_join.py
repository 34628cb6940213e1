"""Point-in-time (temporal) dimension join.

The feature-store correctness primitive: join each fact row to the
dimension VERSION that was valid at the fact's timestamp — never a
later one (training-serving leakage), never an earlier one once
superseded. Dimension versions are the SCD2 intervals a changelog
implies (etl.py:etl_scd2_intervals builds the same intervals); the
textbook formulation is an interval join (valid_from <= ts <
valid_to), which engines execute as a range join — O(facts x
versions-per-key) comparisons and a broadcast-nested-loop trap when
unconstrained.

The scale path implemented here is the as-of rewrite (the same
union-merge kernel as asof.py, different contract: versioned-
dimension intervals, LEFT retention of version-less facts, and
zero-width-interval supersession): union version and fact rows into
one per-key stream, sort by (ts, row-kind, version-id) inside each
key, carry the last-seen version struct forward, keep the fact rows.
ONE hash exchange on the join key + one window — the cost any per-key
operator pays, no inequality join anywhere. The DuckDB oracle states
the interval-join definition directly, so the hash gate proves the
rewrite equivalent on every fact row: facts before their key's first
version (NULL columns), keys with no versions at all, and
same-timestamp version ties, where the zero-width interval loses on
both engines.

Reference parity: /root/reference has no joins; this extends the
engine for the warehouse/feature-store use case per the build brief.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from golang_etl_spark.registry import register
from golang_etl_spark.sources.catalog import load_table

# account-state changelog: a signup OPENS a state, an error DEGRADES
# it — each such event is a new dimension version for its user.
_DIM_TYPES = ("signup", "error")
_FACT_TYPE = "purchase"

_PIT_ORACLE = f"""
WITH v AS (
  SELECT user_id, event_id, event_type, value, ts AS valid_from,
         LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
             AS valid_to
  FROM events
  WHERE event_type IN ('{_DIM_TYPES[0]}', '{_DIM_TYPES[1]}')
)
SELECT f.event_id AS purchase_id, f.user_id, f.ts,
       v.event_id AS version_id,
       v.event_type AS state,
       ROUND(v.value, 4) AS state_value
FROM (SELECT * FROM events WHERE event_type = '{_FACT_TYPE}') f
LEFT JOIN v
  ON v.user_id = f.user_id
 AND v.valid_from <= f.ts
 AND (v.valid_to IS NULL OR f.ts < v.valid_to)
"""


@register(
    "join_point_in_time",
    oracle=_PIT_ORACLE,
    tags=("join", "asof", "etl-parity"),
)
def join_point_in_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each purchase joined to the user's account-state version
    (signup/error changelog) valid at purchase time — SCD2
    point-in-time semantics via the single-exchange as-of rewrite
    instead of an interval join.

    Ordering inside the merged stream encodes the interval semantics:
    at equal timestamps version rows sort before fact rows (a version
    is effective AT its own timestamp — valid_from is inclusive), and
    version ties sort by event_id so the later version supersedes the
    zero-width interval, exactly as the oracle's interval join drops
    it. Purchases before their user's first version carry a NULL
    struct -> NULL columns, matching the LEFT JOIN.
    """
    ev = load_table(spark, sf_dir, "events")
    dim = ev.filter(F.col("event_type").isin(*_DIM_TYPES)).select(
        "user_id",
        "ts",
        F.lit(0).alias("is_fact"),
        F.col("event_id").alias("version_id"),
        F.col("event_type").alias("state"),
        F.col("value").alias("state_value"),
        F.lit(None).cast("long").alias("purchase_id"),
    )
    fact = ev.filter(F.col("event_type") == _FACT_TYPE).select(
        "user_id",
        "ts",
        F.lit(1).alias("is_fact"),
        F.lit(None).cast("long").alias("version_id"),
        F.lit(None).cast("string").alias("state"),
        F.lit(None).cast("double").alias("state_value"),
        F.col("event_id").alias("purchase_id"),
    )
    merged = dim.unionByName(fact)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "is_fact", "version_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ver = F.when(
        F.col("is_fact") == 0,
        F.struct("version_id", "state", "state_value"),
    )
    return (
        merged.withColumn("v", F.last(ver, ignorenulls=True).over(w))
        .filter(F.col("is_fact") == 1)
        .select(
            "purchase_id",
            "user_id",
            "ts",
            F.col("v.version_id").alias("version_id"),
            F.col("v.state").alias("state"),
            F.round("v.state_value", 4).alias("state_value"),
        )
    )

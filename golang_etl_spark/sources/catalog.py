"""Fixture-table catalog: parquet sources at a scale-factor directory.

The reference discovers source schema at runtime from the result set
(/root/reference/extractor.go:71-75); Spark's parquet reader does the
same from file footers — no declared schema needed. Filters and
projections applied downstream are pushed into these scans by Catalyst
(verify with ``df.explain``: PushedFilters / ReadSchema).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Small dimensions that should always be broadcast in joins at any SF:
# region/nation are bounded (5/25 rows at every scale), supplier/part
# grow slowly. Kept as metadata so operators can hint deliberately.
BROADCAST_TABLES = frozenset({"region", "nation", "supplier", "part", "customer"})


# Columns stored as parquet INT64 TIMESTAMP(NANOS) — Spark's reader has
# no nanosecond timestamp type, so they're read as long (see
# spark.sql.legacy.parquet.nanosAsLong in session.py) and truncated to
# microsecond timestamps here. The fixture nanos carry sub-microsecond
# digits; integer DIV truncates them exactly the way DuckDB's native
# TIMESTAMP_NS -> microsecond read does, which is what keeps every
# ts-bearing oracle comparable (verified in tests/test_sources.py).
_NANO_TS_COLUMNS: dict[str, tuple[str, ...]] = {"events": ("ts",)}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; valid: {TABLES}")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    for col in _NANO_TS_COLUMNS.get(name, ()):
        # integer DIV, not `/`: float division of epoch-nanos (~1.7e18)
        # exceeds double's 53-bit mantissa and rounds the microsecond
        df = df.withColumn(col, F.timestamp_micros(F.expr(f"{col} DIV 1000")))
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view for spark.sql()."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)

"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over :mod:`golang_etl_spark.registry` — every operator module
registers its (spark query, DuckDB oracle SQL) pair there; see
SURVEY.md §2 for the coverage map.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from golang_etl_spark import registry  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1-style pricing summary) on sf0.001."""
    from golang_etl_spark.operators.relational import agg_pricing_summary

    return agg_pricing_summary(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return registry.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every SQL-expressible query above."""
    return registry.oracle_sql()

"""Tests for the Spark 4 SQL scripting surface: the sigma-clip script
must actually clip (cross-engine equality is the oracle's job), and
its conf flip must stay on the isolated session."""

from pyspark.sql import functions as F

from golang_etl_spark.operators.sql_scripting import (
    sql_scripting_robust_mean,
)
from golang_etl_spark.sources.catalog import load_table


def test_scripting_clips_toward_center(spark, sf_dir):
    row = sql_scripting_robust_mean(spark, sf_dir).collect()[0]
    raw = (
        load_table(spark, sf_dir, "orders")
        .agg(
            F.avg("o_totalprice").alias("mu"),
            F.stddev_pop("o_totalprice").alias("sd"),
        )
        .collect()[0]
    )
    assert row["iterations"] == 2
    # clipping can only shrink (or keep) the deviation, and the robust
    # mean stays within the raw ±2 sigma band it was clipped to
    assert row["robust_std"] <= raw["sd"] + 1e-9
    assert abs(row["robust_mean"] - raw["mu"]) <= 2 * raw["sd"] + 1e-9


def test_scripting_conf_isolated(spark, sf_dir):
    before = spark.conf.get("spark.sql.scripting.enabled", None)
    sql_scripting_robust_mean(spark, sf_dir).collect()
    assert spark.conf.get("spark.sql.scripting.enabled", None) == before

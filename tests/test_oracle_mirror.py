"""Regression tests for the local oracle mirror's type gate.

Round 6 shipped `text_quality_classifier` believing it green because
the mirror's ``_values_equal`` coerced Spark DECIMAL(19,6) values to
float before comparing — the driver hashes serialized value form, so
Decimal-vs-double failed its gate while passing locally. These tests
pin that the mirror now rejects type-class skew the driver would
reject, without false-positiving on genuinely-matching types.
"""

import pandas as pd
import pytest

from golang_etl_spark.oracle import _col_class, compare_query, duckdb_connection


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duckdb_connection(sf_dir)
    yield c
    c.close()


def test_decimal_vs_double_fails(spark, sf_dir, con):
    """A Spark DECIMAL column against a DuckDB DOUBLE oracle must FAIL
    the mirror even though every value is numerically equal — this is
    exactly the pre-fix text_quality_classifier failure mode."""

    def fn(spark, sf_dir):
        return spark.range(4).selectExpr(
            "id",
            # the decimal-literal trap: `* 1.0` types the result DECIMAL
            "(id + 1) * 1.0 / 16 AS v",
        )

    oracle = "SELECT * FROM (VALUES (0, 0.0625), (1, 0.125), (2, 0.1875), (3, 0.25)) t(id, v)"
    res = compare_query("decimal_trap", spark, sf_dir, fn, oracle, con)
    assert not res.ok, f"mirror must reject DECIMAL-vs-DOUBLE: {res}"
    assert "dtype-class mismatch" in res.detail, str(res)


def test_double_vs_double_passes(spark, sf_dir, con):
    """Same values with explicit double casts on the Spark side pass."""

    def fn(spark, sf_dir):
        return spark.range(4).selectExpr(
            "id", "(id + 1) / CAST(16 AS DOUBLE) AS v"
        )

    oracle = "SELECT * FROM (VALUES (0, 0.0625), (1, 0.125), (2, 0.1875), (3, 0.25)) t(id, v)"
    res = compare_query("double_ok", spark, sf_dir, fn, oracle, con)
    assert res.ok, str(res)


def test_int_vs_float_fails(spark, sf_dir, con):
    """'5' and '5.0' serialize differently — int-vs-float skew must be
    flagged too, not silently float-coerced."""

    def fn(spark, sf_dir):
        return spark.range(3).selectExpr("id", "id * 2 AS v")

    oracle = "SELECT * FROM (VALUES (0, 0.0), (1, 2.0), (2, 4.0)) t(id, v)"
    res = compare_query("int_float_trap", spark, sf_dir, fn, oracle, con)
    assert not res.ok, f"mirror must reject INT-vs-DOUBLE: {res}"
    assert "dtype-class mismatch" in res.detail, str(res)


def test_col_class_decimal_detection():
    from decimal import Decimal

    s = pd.Series([None, Decimal("0.5625"), Decimal("0.25")], dtype="object")
    assert _col_class(s) == "decimal"
    assert _col_class(pd.Series([0.5, 0.25])) == "float"
    assert _col_class(pd.Series([1, 2])) == "int"
    assert _col_class(pd.Series([None, None], dtype="object")) == "null"


def test_registry_emits_no_decimal_columns(spark, sf_dir):
    """Registry-wide guard: no registered query may emit a DecimalType
    column — the DuckDB oracle side always surfaces DOUBLE, so any
    DECIMAL output fails the driver's hash gate. Schema-only (lazy),
    so this sweeps all ~244 queries in seconds."""
    from pyspark.sql.types import DecimalType

    from golang_etl_spark.registry import all_queries

    offenders = []
    for name, spec in sorted(all_queries().items()):
        if spec.oracle is None:
            continue  # rows-only queries never face the hash gate
        try:
            schema = spec.fn(spark, sf_dir).schema
        except Exception:
            continue  # runnability is test_queries_oracle's job
        for f in schema.fields:
            if isinstance(f.dataType, DecimalType):
                offenders.append(f"{name}.{f.name}: {f.dataType}")
    assert not offenders, f"DECIMAL output columns (driver hash trap): {offenders}"

"""The repo-local mirror of the driver's correctness gate: every
registered query runs against its DuckDB oracle at sf0.001 (fast) —
same protocol (row count, column names, order-insensitive values).
"""

import pytest

from golang_etl_spark.oracle import compare_query, duckdb_connection
from golang_etl_spark.registry import all_queries


def _specs():
    return sorted(all_queries().items())


@pytest.fixture(scope="module")
def oracle_con(sf_dir):
    con = duckdb_connection(sf_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", [n for n, _ in _specs()])
def test_query_matches_oracle(name, spark, sf_dir, oracle_con):
    spec = all_queries()[name]
    if spec.oracle is None:
        df = spec.fn(spark, sf_dir)
        assert df.count() >= 0  # rows-only check (non-SQL-expressible op)
        return
    res = compare_query(name, spark, sf_dir, spec.fn, spec.oracle, oracle_con)
    assert res.ok, str(res)
    assert "strict-format" not in res.detail, f"near-boundary float values: {res}"

"""Constructed-data semantics + plan gates for the point-in-time
dimension join and the column-entropy profiler. The DuckDB oracles
prove fixture-level cross-engine agreement; these pin the edge cases
the fixtures may not contain."""

import datetime as dt
import math

from pyspark.sql import functions as F

from golang_etl_spark.operators.colprofile import profile_column_entropy
from golang_etl_spark.operators.pit_join import join_point_in_time


def _write_events(spark, tmp_path, rows):
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    return str(tmp_path)


def _t(minute):
    return dt.datetime(2024, 1, 1, 0, minute)


def test_pit_join_interval_semantics(spark, tmp_path):
    sf = _write_events(
        spark,
        tmp_path,
        [
            # user 1: version history signup@2 -> error@6
            (10, _t(2), 1, "signup", 1.0, ""),
            (11, _t(6), 1, "error", 2.0, ""),
            (20, _t(1), 1, "purchase", 9.0, ""),   # before first -> NULL
            (21, _t(2), 1, "purchase", 9.0, ""),   # AT valid_from -> signup
            (22, _t(5), 1, "purchase", 9.0, ""),   # mid interval -> signup
            (23, _t(6), 1, "purchase", 9.0, ""),   # boundary -> error
            (24, _t(9), 1, "purchase", 9.0, ""),   # open interval -> error
            # user 2: two versions at the SAME ts — the earlier id's
            # interval is zero-width, so the later id supersedes
            (30, _t(3), 2, "signup", 3.0, ""),
            (31, _t(3), 2, "error", 4.0, ""),
            (32, _t(4), 2, "purchase", 9.0, ""),
            # user 3: purchases only, no versions at all
            (40, _t(5), 3, "purchase", 9.0, ""),
        ],
    )
    out = {r["purchase_id"]: r for r in join_point_in_time(spark, sf).collect()}
    assert len(out) == 7
    assert out[20]["version_id"] is None and out[20]["state"] is None
    assert out[21]["version_id"] == 10 and out[21]["state"] == "signup"
    assert out[22]["version_id"] == 10
    assert out[23]["version_id"] == 11 and out[23]["state"] == "error"
    assert out[24]["version_id"] == 11 and out[24]["state_value"] == 2.0
    assert out[32]["version_id"] == 31  # zero-width interval lost
    assert out[40]["version_id"] is None


def test_pit_join_single_exchange(spark, sf_dir):
    # the whole point of the as-of rewrite: ONE hash exchange on the
    # key, never a range/nested-loop join
    plan = (
        join_point_in_time(spark, sf_dir)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan  # no join operator at all


def test_column_entropy_known_values(spark, tmp_path):
    rows = []
    # o_orderstatus: 2 uniform values over 8 rows -> H = 1
    # o_orderpriority: constant -> H = 0, norm 0 (k=1 guard)
    # order_year: 3:1 split 2020 (6) vs 2021 (2) -> H = H(3/4,1/4)
    for i in range(8):
        rows.append(
            (
                i,
                0,
                "O" if i % 2 == 0 else "F",
                1.0,
                dt.datetime(2020 if i < 6 else 2021, 1, 1),
                "1-URGENT",
            )
        )
    spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).write.parquet(f"{tmp_path}/orders.parquet")
    out = {
        r["column_name"]: r
        for r in profile_column_entropy(spark, str(tmp_path)).collect()
    }
    assert out["o_orderstatus"]["entropy"] == 1.0
    assert out["o_orderstatus"]["norm_entropy"] == 1.0
    assert out["o_orderpriority"]["n_distinct"] == 1
    assert out["o_orderpriority"]["entropy"] == 0.0
    assert out["o_orderpriority"]["norm_entropy"] == 0.0
    want = round(2 - 3 * math.log2(3) / 4, 6)  # H(6/8, 2/8)
    assert out["order_year"]["entropy"] == want
    assert out["order_year"]["n_rows"] == 8


def test_column_entropy_plan_shape(spark, sf_dir):
    # unpivot must be a map-side Generate fused over ONE column-pruned
    # scan; both aggregations must partial-aggregate (map-side combine)
    df = profile_column_entropy(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("FileScan") == 1
    assert "Generate stack" in plan
    assert "partial_count" in plan
    assert "o_orderkey" not in plan  # unused columns pruned from the scan

"""Known-answer and plan tests for the rolling-distinct-users
operator (explode-offsets rewrite of sliding COUNT DISTINCT)."""

import datetime as dt

from golang_etl_spark.operators.active_users import (
    timeseries_rolling_distinct_users,
)


def _write_events(spark, tmp_path, rows):
    spark.createDataFrame(
        [
            (i, dt.datetime(2024, 1, d, h), u, "view", 1.0, "")
            for i, (d, h, u) in enumerate(rows)
        ],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    return str(tmp_path)


def test_rolling_distinct_known_values(spark, tmp_path):
    # day 1: users {1, 2}; day 2: {2}; day 9: {3}
    # (two events for user 1 on day 1 must count once)
    sf = _write_events(
        spark,
        tmp_path,
        [(1, 0, 1), (1, 5, 1), (1, 6, 2), (2, 3, 2), (9, 1, 3)],
    )
    out = {r["day"]: r for r in timeseries_rolling_distinct_users(spark, sf).collect()}
    # only observed days appear — no ghost days 3..8 or 10+
    assert set(out) == {"2024-01-01", "2024-01-02", "2024-01-09"}
    assert out["2024-01-01"]["n_users_1d"] == 2
    assert out["2024-01-01"]["n_users_7d"] == 2
    assert out["2024-01-02"]["n_users_1d"] == 1
    assert out["2024-01-02"]["n_users_7d"] == 2   # window [27th, 2nd] ∋ day 1
    assert out["2024-01-09"]["n_users_1d"] == 1
    assert out["2024-01-09"]["n_users_7d"] == 1   # days 1-2 fell out of [3rd, 9th]


def test_rolling_distinct_plan_has_no_window(spark, sf_dir):
    # the rewrite's point: NO window operator, no per-frame state —
    # one Generate (the offset explode) + standard 2-phase distinct
    plan = (
        timeseries_rolling_distinct_users(spark, sf_dir)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Window" not in plan
    assert "Generate explode" in plan
    assert "BroadcastHashJoin" in plan  # observed-day calendar join

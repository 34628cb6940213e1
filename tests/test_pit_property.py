"""Property-based check for the point-in-time join: on arbitrary
random changelog/fact streams (timestamp ties between versions, ties
between version and fact, facts before any version, users with no
versions), the single-exchange as-of rewrite must agree with a plain
Python reference that implements the ORACLE's interval-join semantics
directly — build [valid_from, valid_to) intervals from the changelog
via LEAD over (ts, event_id) and match each fact to the at-most-one
interval containing its timestamp."""

import datetime

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from golang_etl_spark.operators.pit_join import join_point_in_time

_BASE = datetime.datetime(2024, 1, 1)


def _reference(events):
    """events: list of (user, ts_int, type). Returns
    {purchase_event_id: version_event_id | None} under interval-join
    semantics (valid_from inclusive, valid_to exclusive)."""
    by_user_versions = {}
    for eid, (u, ts, et) in enumerate(events):
        if et in ("signup", "error"):
            by_user_versions.setdefault(u, []).append((ts, eid))
    out = {}
    for eid, (u, ts, et) in enumerate(events):
        if et != "purchase":
            continue
        versions = sorted(by_user_versions.get(u, []))
        match = None
        for i, (vts, vid) in enumerate(versions):
            vto = versions[i + 1][0] if i + 1 < len(versions) else None
            if vts <= ts and (vto is None or ts < vto):
                assert match is None, "intervals must partition time"
                match = vid
        out[eid] = match
    return out


@st.composite
def _streams(draw):
    n = draw(st.integers(min_value=1, max_value=40))
    ev = st.tuples(
        st.integers(min_value=1, max_value=4),   # user
        st.integers(min_value=0, max_value=12),  # ts (ties likely)
        st.sampled_from(["signup", "error", "purchase", "view"]),
    )
    return draw(st.lists(ev, min_size=1, max_size=n))


# tmp_path reuse across examples is safe: every example overwrites the
# single events.parquet before reading it
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(events=_streams())
def test_pit_join_matches_interval_reference(spark, tmp_path, events):
    rows = [
        (eid, _BASE + datetime.timedelta(seconds=ts), u, et, float(eid), "")
        for eid, (u, ts, et) in enumerate(events)
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    got = {
        r["purchase_id"]: r["version_id"]
        for r in join_point_in_time(spark, str(tmp_path)).collect()
    }
    want = _reference(events)
    assert got == want, (events, want, got)

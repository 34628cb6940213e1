"""Property-based check for the ordered-funnel fold: on arbitrary
random event streams (including ts ties and missing steps), the
single-pass array fold must agree with a plain-Python reference that
implements the oracle's MIN-after-previous-step semantics directly.
Random streams exercise what the fixture can't: users with no view,
clicks before any view, purchase-before-click orderings, equal
timestamps across types.
"""

import datetime

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from golang_etl_spark.operators.sessionize import _FUNNEL_FOLD

_TYPES = ["view", "click", "purchase"]


def _reference_counts(events):
    """events: list of (user_id, ts_int, event_type). Oracle
    semantics: t1 = min view ts; t2 = min click ts strictly after t1;
    t3 = min purchase ts strictly after t2."""
    by_user = {}
    for u, ts, et in events:
        by_user.setdefault(u, []).append((ts, et))
    n1 = n2 = n3 = 0
    for rows in by_user.values():
        views = [ts for ts, et in rows if et == "view"]
        if not views:
            continue
        t1 = min(views)
        n1 += 1
        clicks = [ts for ts, et in rows if et == "click" and ts > t1]
        if not clicks:
            continue
        t2 = min(clicks)
        n2 += 1
        purchases = [ts for ts, et in rows if et == "purchase" and ts > t2]
        if not purchases:
            continue
        n3 += 1
    return n1, n2, n3


@st.composite
def _event_streams(draw):
    n = draw(st.integers(min_value=1, max_value=60))
    ev = st.tuples(
        st.integers(min_value=1, max_value=6),    # user
        st.integers(min_value=0, max_value=20),   # ts second (ties likely)
        st.sampled_from(_TYPES),
    )
    return draw(st.lists(ev, min_size=1, max_size=n))


@settings(max_examples=12, deadline=None)
@given(events=_event_streams())
def test_funnel_fold_matches_reference(spark, events):
    base = datetime.datetime(2024, 1, 1)
    rows = [
        (u, i, base + datetime.timedelta(seconds=ts), et)
        for i, (u, ts, et) in enumerate(events)
    ]
    df = spark.createDataFrame(
        rows, "user_id LONG, event_id LONG, ts TIMESTAMP, event_type STRING"
    )
    per_user = df.groupBy("user_id").agg(
        F.sort_array(
            F.collect_list(F.struct("ts", "event_id", "event_type"))
        ).alias("seq")
    )
    folded = per_user.select(F.expr(_FUNNEL_FOLD).alias("f"))
    got = folded.agg(
        F.count("f.t1").alias("n1"),
        F.count("f.t2").alias("n2"),
        F.count("f.t3").alias("n3"),
    ).collect()[0]
    want = _reference_counts(events)
    assert (got.n1, got.n2, got.n3) == want, (events, want, got)

"""Custom Python DataSource: chunk planning must mirror the
reference's stride partitioner (one task per half-open chunk, last
chunk clamped) and the emitted rows must be byte-identical to the
declarative seed table."""

import pytest

from golang_etl_spark.sources.pydatasource import (
    RangeChunk,
    RangeShardReader,
    read_range_shard,
)


def test_chunk_plan_matches_reference_stride():
    r = RangeShardReader({"lower": "1", "upper": "25001", "stride": "10000"})
    chunks = [(c.start, c.end) for c in r.partitions()]
    # stride 10k over [1, 25001): last chunk clamped, never dropped
    assert chunks == [(1, 10001), (10001, 20001), (20001, 25001)]


def test_bounds_guard_rejects_bad_plan():
    with pytest.raises(ValueError):
        RangeShardReader({"lower": "10", "upper": "5", "stride": "100"})
    with pytest.raises(ValueError):
        RangeShardReader({"lower": "1", "upper": "10", "stride": "0"})


def test_datasource_partitions_match_stride_planner(spark):
    """Partition gate (VERDICT r06 #5): the custom DataSource's
    ``partitions()`` must yield exactly the chunks the JDBC stride
    planner (etl.plan_range_partitions) would plan for the same key
    range — same count, same half-open bounds, same maxKey+1 clamp.
    Then the LIVE scan must surface that count as its input-partition
    count, one task per chunk (mirroring the JDBC stride unit tests)."""
    from golang_etl_spark.etl import plan_range_partitions
    from golang_etl_spark.sources.sinks import SEED_ROWS

    for stride in (1000, 3000, 10_000):
        plan = plan_range_partitions(1, SEED_ROWS, stride=stride)
        r = RangeShardReader(
            {"lower": "1", "upper": str(SEED_ROWS + 1), "stride": str(stride)}
        )
        chunks = [(c.start, c.end) for c in r.partitions()]
        assert len(chunks) == plan.num_partitions, (
            f"stride {stride}: DataSource plans {len(chunks)} chunks, "
            f"stride planner {plan.num_partitions}"
        )
        assert chunks[0][0] == plan.lower_bound
        assert chunks[-1][1] == plan.upper_bound  # the maxKey+1 fixup
        assert all(e - s <= plan.stride for s, e in chunks)

    plan = plan_range_partitions(1, SEED_ROWS, stride=1000)
    df = read_range_shard(spark, stride=1000)
    assert df.rdd.getNumPartitions() == plan.num_partitions


def test_one_task_per_chunk_and_seed_parity(spark):
    from golang_etl_spark.sources.sinks import seed_table

    df = read_range_shard(spark, stride=1000)
    assert df.rdd.getNumPartitions() == 10, "chunk != task mapping lost"
    seed = seed_table(spark)
    assert df.exceptAll(seed).count() == 0
    assert seed.exceptAll(df).count() == 0


def test_single_chunk_read_yields_exact_range():
    rows = list(
        RangeShardReader({"lower": "1", "upper": "50", "stride": "7"}).read(
            RangeChunk(8, 15)
        )
    )
    assert [r[0] for r in rows] == list(range(8, 15))
    assert all(len(r[1]) == 20 for r in rows)


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    _HYP = True
except ImportError:  # pragma: no cover
    _HYP = False


if _HYP:

    @settings(max_examples=60, deadline=None)
    @given(
        lower=st.integers(min_value=-(10**6), max_value=10**6),
        span=st.integers(min_value=0, max_value=10**5),
        stride=st.integers(min_value=1, max_value=10**5),
    )
    def test_chunk_plan_partitions_range_exactly(lower, span, stride):
        """For ANY bounds and stride: the planned chunks tile
        [lower, upper) exactly — contiguous, non-overlapping, ordered,
        each at most stride wide, nothing dropped (the maxKey+1-style
        clamp, property-checked instead of example-checked)."""
        upper = lower + span
        r = RangeShardReader(
            {"lower": str(lower), "upper": str(upper), "stride": str(stride)}
        )
        chunks = [(c.start, c.end) for c in r.partitions()]
        assert all(e - s <= stride and s < e for s, e in chunks)
        # contiguity + exact coverage
        pos = lower
        for s, e in chunks:
            assert s == pos
            pos = e
        assert pos == (upper if span else lower)

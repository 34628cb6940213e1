"""Misra–Gries two-pass heavy hitters: the partition-local compression
must emit a SUPERSET of every token whose global count reaches N/k —
that is the whole correctness argument of the two-pass design (pass 2
recounts exactly, so false candidates are harmless and lost candidates
are unrecoverable)."""

import random

import pandas as pd
import pytest

from golang_etl_spark.operators.freqitems import (
    HH_K,
    _misra_gries_partition,
)


def _survivors(stream, batch=997):
    out = list(
        _misra_gries_partition(
            pd.DataFrame({"token": stream[i : i + batch]})
            for i in range(0, len(stream), batch)
        )
    )
    return set(pd.concat(out)["token"]) if out else set()


@pytest.mark.parametrize("seed", [7, 23, 81])
def test_partition_union_is_heavy_hitter_superset(seed):
    """Adversarial synthetic stream: a few genuinely heavy tokens
    buried in a long tail wider than HH_K, split across partitions
    unevenly. Every global heavy hitter must survive in the union."""
    rng = random.Random(seed)
    heavy = [f"h{i}" for i in range(5)]
    tail = [f"t{i}" for i in range(HH_K * 3)]
    stream = heavy * 300 + [rng.choice(tail) for _ in range(6000)]
    rng.shuffle(stream)
    n = len(stream)
    # uneven 3-way partition split
    cuts = sorted(rng.randrange(1, n) for _ in range(2))
    parts = [stream[: cuts[0]], stream[cuts[0] : cuts[1]], stream[cuts[1] :]]

    union = set()
    for p in parts:
        union |= _survivors(p)

    counts = pd.Series(stream).value_counts()
    true_heavy = set(counts[counts >= n / HH_K].index)
    assert true_heavy, "fixture degenerate: no heavy hitters"
    missing = true_heavy - union
    assert not missing, f"heavy hitters lost in pass 1: {missing}"


def test_empty_partition_yields_no_candidates():
    out = list(_misra_gries_partition(iter([pd.DataFrame({"token": []})])))
    assert sum(len(df) for df in out) == 0

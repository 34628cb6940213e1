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


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    _HYP = True
except ImportError:  # pragma: no cover
    _HYP = False


if _HYP:

    @settings(max_examples=40, deadline=None)
    @given(
        stream=st.lists(
            st.integers(min_value=0, max_value=50).map(lambda i: f"w{i}"),
            min_size=1,
            max_size=3000,
        ),
        n_cuts=st.integers(min_value=0, max_value=4),
        batch=st.integers(min_value=1, max_value=257),
        data=st.data(),
    )
    def test_mg_superset_property(stream, n_cuts, batch, data):
        """For ANY stream, ANY partition split, ANY batch size: the
        union of per-partition Misra-Gries survivors contains every
        token with global count >= N/HH_K (here trivially satisfied
        since 51 token types < HH_K=400 — so ALL tokens must survive;
        the interesting regime is exercised by shrinking HH_K)."""
        import golang_etl_spark.operators.freqitems as fi

        cuts = sorted(
            data.draw(
                st.lists(
                    st.integers(0, len(stream)),
                    min_size=n_cuts,
                    max_size=n_cuts,
                )
            )
        )
        parts, prev = [], 0
        for c in cuts + [len(stream)]:
            parts.append(stream[prev:c])
            prev = c

        # shrink k so the pruning path actually fires
        orig_k = fi.HH_K
        fi.HH_K = 5
        try:
            union = set()
            for p in parts:
                union |= _survivors(p, batch=batch)
        finally:
            fi.HH_K = orig_k

        n = len(stream)
        counts = pd.Series(stream).value_counts()
        true_heavy = set(counts[counts >= n / 5].index)
        missing = true_heavy - union
        assert not missing, (
            f"lost heavy hitters {missing} (n={n}, parts={len(parts)})"
        )

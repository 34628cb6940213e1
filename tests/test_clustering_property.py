"""Property-based check for connected_components: on arbitrary random
graphs, both execution paths (single-task union-find and distributed
pointer-jumping label propagation) must agree with a reference DSU
computed in plain Python. Randomized structure catches the shapes the
hand-picked chain/star fixtures miss (cross-links, self-merges, label
arriving through the 'wrong end').
"""

from hypothesis import given, settings
from hypothesis import strategies as st

from golang_etl_spark.operators.clustering import connected_components


def _reference_labels(pairs):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {v: find(v) for v in parent}


@st.composite
def _pair_lists(draw):
    n_vertices = draw(st.integers(min_value=2, max_value=30))
    n_edges = draw(st.integers(min_value=1, max_value=40))
    edge = st.tuples(
        st.integers(min_value=1, max_value=n_vertices),
        st.integers(min_value=1, max_value=n_vertices),
    ).filter(lambda e: e[0] != e[1])
    return draw(st.lists(edge, min_size=1, max_size=n_edges))


# max_examples kept small: every example runs Spark jobs; the value is
# in structural randomness, not volume. deadline=None — Spark job
# latency is not the property under test.
@settings(max_examples=12, deadline=None)
@given(pairs=_pair_lists())
def test_union_find_path_matches_reference(spark, pairs):
    df = spark.createDataFrame(pairs, "doc_id_a LONG, doc_id_b LONG")
    got = {
        r["doc_id"]: r["label"] for r in connected_components(df).collect()
    }
    assert got == _reference_labels(pairs)


@settings(max_examples=6, deadline=None)
@given(pairs=_pair_lists())
def test_distributed_path_matches_reference(spark, pairs):
    df = spark.createDataFrame(pairs, "doc_id_a LONG, doc_id_b LONG")
    got = {
        r["doc_id"]: r["label"]
        for r in connected_components(df, local_threshold=0).collect()
    }
    assert got == _reference_labels(pairs)

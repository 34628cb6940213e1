"""Recall accuracy bounds for the approximate similarity operators —
the ANN analogue of the sketch accuracy tests: algorithms that
legitimately differ from an exact oracle get quantitative quality
gates instead of hash equality.

Measured on the fixtures: trained-k-means IVF ~0.82 recall@10 at
nprobe=2 vs ~0.24-0.28 for the training-free fixed-corpus-vector
quantizer — the gap IS the point of training the coarse quantizer, so
the test asserts both a floor and the ordering.
"""

from collections import defaultdict

from golang_etl_spark.registry import all_queries


def _recall(got_rows, want_rows):
    want, got = defaultdict(set), defaultdict(set)
    for r in want_rows:
        want[r["query_id"]].add(r["neighbor_id"])
    for r in got_rows:
        got[r["query_id"]].add(r["neighbor_id"])
    return sum(len(got[q] & want[q]) / len(want[q]) for q in want) / len(want)


def test_ivf_kmeans_recall_beats_fixed_quantizer(spark, sf_dir):
    q = all_queries()
    brute = q["similarity_topk_bruteforce"].fn(spark, sf_dir).collect()
    kmeans = q["similarity_ivf_kmeans"].fn(spark, sf_dir).collect()
    fixed = q["similarity_ivf_topk"].fn(spark, sf_dir).collect()

    r_kmeans, r_fixed = _recall(kmeans, brute), _recall(fixed, brute)
    # floor well under the measured 0.82 but far above chance
    # (nprobe/cells = 2/16 ~ 0.125 of the corpus scored per query)
    assert r_kmeans >= 0.6, f"trained-IVF recall collapsed: {r_kmeans}"
    assert r_kmeans > r_fixed, (
        f"training stopped paying for itself: kmeans={r_kmeans} fixed={r_fixed}"
    )


def test_ivf_kmeans_output_shape(spark, sf_dir):
    rows = all_queries()["similarity_ivf_kmeans"].fn(spark, sf_dir).collect()
    assert rows, "no neighbors returned"
    by_q = defaultdict(list)
    for r in rows:
        by_q[r["query_id"]].append(r)
    for qid, rs in by_q.items():
        ranks = sorted(r["rank"] for r in rs)
        assert ranks == list(range(1, len(rs) + 1)), f"rank gap for {qid}"
        assert all(r["neighbor_id"] != qid for r in rs), "self-match leaked"


def test_pq_rerank_recall(spark, sf_dir):
    # 8-byte PQ codes (32x compression) + exact top-C rerank: measured
    # 1.0 recall@10 at sf0.001 and 0.92 at sf0.01 — floor set well
    # under both but far above the un-reranked ADC (~0.66)
    q = all_queries()
    brute = q["similarity_topk_bruteforce"].fn(spark, sf_dir).collect()
    pq = q["similarity_pq_topk"].fn(spark, sf_dir).collect()
    r = _recall(pq, brute)
    assert r >= 0.8, f"PQ+rerank recall collapsed: {r}"


def test_matryoshka_recall_and_consistency(spark, sf_dir):
    # 16-of-64-dim prefix retrieval: recall vs full-dim brute force
    # must beat chance by a wide margin (the fixture embeddings are
    # random, the hardest case for prefix truncation — trained MRL
    # embeddings would score far higher), and each hit's reported
    # full-precision cosine must be internally consistent (in [-1, 1],
    # rank ordered by the truncated score).
    q = all_queries()
    brute = q["similarity_topk_bruteforce"].fn(spark, sf_dir).collect()
    mrl = q["similarity_matryoshka_topk"].fn(spark, sf_dir).collect()
    r = _recall(mrl, brute)
    # chance baseline from the SAME run (fixtures regenerate between
    # rounds, so a fixed absolute floor on random-embedding recall can
    # flake): picking k of N corpus vectors at random recalls k/N in
    # expectation. A 16/64-dim prefix of a random vector still carries
    # 1/4 of the signal, so demand >= 5x chance — far from the fixed
    # 0.2 cliff yet impossible for a broken truncation (which would
    # sit AT chance).
    from golang_etl_spark.sources.catalog import load_table

    n_corpus = load_table(spark, sf_dir, "embeddings").count()
    k = max(len({row["rank"] for row in mrl}), 1)
    chance = k / max(n_corpus, 1)
    assert r >= max(5 * chance, 0.1), (
        f"matryoshka recall {r} not clearly above chance {chance}"
    )
    by_q = defaultdict(list)
    for row in mrl:
        assert -1.000001 <= row["cos_full"] <= 1.000001
        assert -1.000001 <= row["cos_mrl"] <= 1.000001
        by_q[row["query_id"]].append(row)
    for qid, rows in by_q.items():
        rows.sort(key=lambda x: x["rank"])
        scores = [x["cos_mrl"] for x in rows]
        assert scores == sorted(scores, reverse=True), f"rank disorder {qid}"


def test_funnel_recall_and_consistency(spark, sf_dir):
    """The composed MRL->PQ->exact funnel: recall@10 vs brute force
    must clearly beat chance AND beat the bare matryoshka tier (the
    funnel widens the prefix screen to FUNNEL_C1 candidates before
    reranking at full precision, so trimming to top-10 via EXACT cosine
    should recover neighbors the 10-deep truncated ranking loses).
    Fixture embeddings are random — the hardest case for every
    approximate tier."""
    q = all_queries()
    brute = q["similarity_topk_bruteforce"].fn(spark, sf_dir).collect()
    funnel = q["similarity_funnel_mrl_pq"].fn(spark, sf_dir).collect()
    mrl = q["similarity_matryoshka_topk"].fn(spark, sf_dir).collect()

    r_funnel, r_mrl = _recall(funnel, brute), _recall(mrl, brute)
    from golang_etl_spark.sources.catalog import load_table

    n_corpus = load_table(spark, sf_dir, "embeddings").count()
    k = max(len({row["rank"] for row in funnel}), 1)
    chance = k / max(n_corpus, 1)
    assert r_funnel >= max(5 * chance, 0.1), (
        f"funnel recall {r_funnel} not clearly above chance {chance}"
    )
    # widening-then-exact-rerank must not LOSE recall vs the bare
    # truncated top-10 (small slack: the PQ tier is lossy too)
    assert r_funnel >= r_mrl - 0.1, (
        f"funnel {r_funnel} fell below bare matryoshka {r_mrl}"
    )

    by_q = defaultdict(list)
    for row in funnel:
        assert -1.000001 <= row["cosine"] <= 1.000001
        assert row["neighbor_id"] != row["query_id"], "self-match leaked"
        by_q[row["query_id"]].append(row)
    for qid, rows in by_q.items():
        rows.sort(key=lambda x: x["rank"])
        assert [x["rank"] for x in rows] == list(range(1, len(rows) + 1))
        scores = [x["cosine"] for x in rows]
        assert scores == sorted(scores, reverse=True), f"rank disorder {qid}"


def test_score_cut_rounding_parity_between_engines():
    """The PQ/funnel hash gates survive near-ties only because BOTH
    engines round scores to the same precision before every rank or
    argmin cut (similarity._SCORE_CUT_DECIMALS on the numpy side,
    ROUND(..., 9) literals in the oracle SQL). Pin the two against
    each other so editing one side alone fails in milliseconds."""
    import re

    from golang_etl_spark.operators.similarity import (
        _FUNNEL_ORACLE,
        _PQ_SEED_ORACLE,
        _SCORE_CUT_DECIMALS,
    )

    assert _SCORE_CUT_DECIMALS == 9
    # encode argmin: the distance expression is rounded before the
    # (d2, k) order in both data-dependent oracles
    for sql in (_PQ_SEED_ORACLE, _FUNNEL_ORACLE):
        assert re.search(
            r"ORDER BY ROUND\(list_dot_product\(s\.s, s\.s\).*?"
            r"list_dot_product\(c\.c, c\.c\), 9\), c\.k",
            sql,
            re.S,
        ), "encode argmin lost its pre-cut ROUND(..., 9)"
    # ADC sum: rounded before the top-C rank cut
    assert "ROUND(SUM(q.p), 9) AS adc" in _PQ_SEED_ORACLE
    assert "ROUND(SUM(p), 9) AS adc" in _FUNNEL_ORACLE

"""Known-answer tests for text_bm25_topk — the DuckDB oracle proves
cross-engine agreement on the fixture corpus; these pin the Okapi
MATH on a constructed corpus where idf/tf saturation are derivable by
hand, plus the ranking invariants the retrieval contract promises."""

import math

from golang_etl_spark.operators.text import (
    BM25_B,
    BM25_K1,
    BM25_QUERIES,
    BM25_TOP_K,
    text_bm25_topk,
)


def _run(spark, tmp_path, docs):
    df = spark.createDataFrame(docs, "doc_id long, text string")
    df.write.parquet(f"{tmp_path}/documents.parquet")
    return text_bm25_topk(spark, str(tmp_path)).collect()


def _bm25_one_term(tf, df, n_docs, dl, avgdl):
    idf = math.log(1 + (n_docs - df + 0.5) / (df + 0.5))
    return idf * tf * (BM25_K1 + 1) / (
        tf + BM25_K1 * (1 - BM25_B + BM25_B * dl / avgdl)
    )


def test_bm25_known_single_term_corpus(spark, tmp_path):
    # 4 docs, only doc 1 and 2 contain query-2 terms; every doc is
    # 4 tokens so dl == avgdl and the length normalizer is exactly 1.
    rows = _run(
        spark,
        tmp_path,
        [
            (1, "stream stream stream noise"),
            (2, "stream noise noise noise"),
            (3, "noise noise noise noise"),
            (4, "other other other other"),
        ],
    )
    q2 = sorted(
        (r for r in rows if r["query_id"] == 2), key=lambda r: r["rank"]
    )
    # only the two docs containing a query term are retrievable
    assert [r["doc_id"] for r in q2] == [1, 2]
    # tf saturation: tf=3 beats tf=1 but by less than 3x
    want1 = _bm25_one_term(tf=3, df=2, n_docs=4, dl=4, avgdl=4)
    want2 = _bm25_one_term(tf=1, df=2, n_docs=4, dl=4, avgdl=4)
    assert math.isclose(q2[0]["bm25"], want1, rel_tol=1e-9)
    assert math.isclose(q2[1]["bm25"], want2, rel_tol=1e-9)
    assert q2[0]["bm25"] < 3 * q2[1]["bm25"]


def test_bm25_length_normalization_and_tiebreak(spark, tmp_path):
    # same tf for 'hash', shorter doc must outrank the longer one;
    # docs 3 and 4 are token-identical -> exact tie -> doc_id order.
    rows = _run(
        spark,
        tmp_path,
        [
            (1, "hash a"),
            (2, "hash a b c d e f g"),
            (3, "hash a b"),
            (4, "hash a b"),
        ],
    )
    q1 = sorted(
        (r for r in rows if r["query_id"] == 1), key=lambda r: r["rank"]
    )
    ids = [r["doc_id"] for r in q1]
    assert ids[0] == 1 and ids[-1] == 2  # shortest first, longest last
    assert ids.index(3) + 1 == ids.index(4)  # tie broken by doc_id
    assert math.isclose(q1[1]["bm25"], q1[2]["bm25"], rel_tol=1e-12)


def test_bm25_contract_on_fixture(spark, sf_dir):
    """On the real corpus: <= K rows per query, ranks are 1..n dense,
    scores are positive and non-increasing in rank order."""
    rows = text_bm25_topk(spark, sf_dir).collect()
    assert rows
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    assert set(by_q) == {qid for qid, _ in BM25_QUERIES}
    for rs in by_q.values():
        rs.sort(key=lambda r: r["rank"])
        assert len(rs) <= BM25_TOP_K
        assert [r["rank"] for r in rs] == list(range(1, len(rs) + 1))
        for a, b in zip(rs, rs[1:]):
            # ranking key is round(score, 6): allow the half-ulp slack
            assert round(a["bm25"], 6) >= round(b["bm25"], 6)
        assert all(r["bm25"] > 0 for r in rs)

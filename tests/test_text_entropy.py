"""Known-answer and edge-case tests for text_token_entropy — the
DuckDB oracle proves cross-engine agreement on the fixture corpus;
these pin the MATH on constructed documents (uniform, degenerate,
skewed) where the entropy values are derivable by hand."""

import math

from golang_etl_spark.operators.text import text_token_entropy


def _run(spark, tmp_path, docs):
    df = spark.createDataFrame(docs, "doc_id long, text string")
    df.write.parquet(f"{tmp_path}/documents.parquet")
    return {
        r["doc_id"]: r for r in text_token_entropy(spark, str(tmp_path)).collect()
    }


def test_token_entropy_known_values(spark, tmp_path):
    out = _run(
        spark,
        tmp_path,
        [
            (1, "word"),                  # single token: H = 0
            (2, "a a a a"),               # one type repeated: H = 0
            (3, "a b c d"),               # uniform over 4: H = 2, norm = 1
            (4, "a a a b"),               # skewed 3:1
            (5, "x Y y X"),               # case-folding: {x:2, y:2} -> H = 1
        ],
    )
    assert out[1]["n_words"] == 1 and out[1]["token_entropy"] == 0.0
    assert out[1]["norm_entropy"] == 0.0  # n_unique == 1 guard, no log2(1)=0 div
    assert out[2]["n_words"] == 4 and out[2]["n_unique"] == 1
    assert out[2]["token_entropy"] == 0.0 and out[2]["norm_entropy"] == 0.0
    assert out[3]["token_entropy"] == 2.0 and out[3]["norm_entropy"] == 1.0
    # H(3/4, 1/4) = 2 - (3*log2(3))/4, rounded to 6
    want = round(2 - 3 * math.log2(3) / 4, 6)
    assert out[4]["token_entropy"] == want
    assert out[4]["norm_entropy"] == want  # log2(n_unique=2) = 1
    assert out[5]["n_unique"] == 2 and out[5]["token_entropy"] == 1.0


def test_token_entropy_bounds_hold_on_fixture(spark, sf_dir):
    """Invariants on the real corpus: 0 <= H <= log2(n_unique) and
    0 <= norm <= 1 (up to the round-6 half-ulp), with equality cases
    only where they belong."""
    rows = text_token_entropy(spark, sf_dir).collect()
    assert rows
    for r in rows:
        ceiling = math.log2(r["n_unique"]) if r["n_unique"] > 1 else 0.0
        assert -1e-6 <= r["token_entropy"] <= ceiling + 1e-6, r
        assert -1e-6 <= r["norm_entropy"] <= 1 + 1e-6, r
        if r["n_unique"] == r["n_words"] and r["n_unique"] > 1:
            # all-distinct doc: exactly uniform, norm == 1
            assert abs(r["norm_entropy"] - 1.0) <= 1e-6, r

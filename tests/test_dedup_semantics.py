"""Semantic unit tests for the round-5 dedup operators: known-answer
constructions (a passage planted in two documents must be flagged in
both and nowhere else) and structural invariants of the SemDeDup-style
pruning (one representative per bucket, verdicts consistent with the
cosine bar)."""

from golang_etl_spark.operators.dedup import (
    SEMANTIC_PRUNE_MIN,
    SUBSTR_K,
    dedup_exact_substring,
    dedup_semantic_prune,
)


def test_exact_substring_flags_planted_passage(spark, tmp_path):
    shared = "alpha bravo charlie delta echo foxtrot golf hotel"
    assert len(shared.split()) == SUBSTR_K
    docs = [
        (1, "unique one two three four five six seven eight nine ten " + shared),
        (2, shared + " completely different tail words follow here nothing repeats"),
        (3, "totally disjoint body with plenty of distinct tokens spread around twelve"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    df.write.parquet(f"{tmp_path}/documents.parquet")
    out = {
        r["doc_id"]: r
        for r in dedup_exact_substring(spark, str(tmp_path)).collect()
    }
    # the planted window is the ONLY cross-doc window
    assert out[1]["n_shared"] == 1
    assert out[2]["n_shared"] == 1
    assert out[3]["n_shared"] == 0
    assert 0 < out[1]["dup_frac"] < 1
    # window positions: len(tokens) - K + 1
    for did, (_, text) in zip((1, 2, 3), docs):
        assert out[did]["n_windows"] == len(text.split()) - SUBSTR_K + 1


def test_exact_substring_identical_docs_fully_covered(spark, tmp_path):
    text = "nine distinct words make a full window plus one more"
    df = spark.createDataFrame(
        [(1, text), (2, text)], "doc_id long, text string"
    )
    df.write.parquet(f"{tmp_path}/documents.parquet")
    rows = dedup_exact_substring(spark, str(tmp_path)).collect()
    assert {r["dup_frac"] for r in rows} == {1.0}


def test_semantic_prune_invariants(spark, sf_dir):
    rows = dedup_semantic_prune(spark, sf_dir).collect()
    by_bucket = {}
    for r in rows:
        by_bucket.setdefault(r["bucket"], []).append(r)
    for bucket, members in by_bucket.items():
        reps = [m for m in members if m["verdict"] == "rep"]
        assert len(reps) == 1, f"bucket {bucket}: {len(reps)} reps"
        assert reps[0]["vec_id"] == min(m["vec_id"] for m in members)
        # cos_to_rep is round(cos, 6) while the verdict thresholds the
        # UNROUNDED cosine — allow the rounding step's half-ulp slack
        # so a cosine just under the bar that rounds onto it can't
        # flake the gate on a regenerated fixture
        for m in members:
            if m["verdict"] == "drop":
                assert m["cos_to_rep"] >= SEMANTIC_PRUNE_MIN - 5e-7
            elif m["verdict"] == "keep":
                assert m["cos_to_rep"] < SEMANTIC_PRUNE_MIN + 5e-7

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


def test_jaccard_prefix_filter_is_complete(spark, sf_dir):
    """Prefix filtering must be LOSSLESS at the threshold: the
    PPJoin-style operator's pairs must equal the brute-force all-pairs
    exact-Jaccard ground truth (computed without any filtering), not
    just match an oracle that replays the same pruning."""
    import duckdb

    from golang_etl_spark.operators.dedup import PPJ_T, dedup_jaccard_prefix

    got = {
        (r["doc_id_a"], r["doc_id_b"]): r["jaccard"]
        for r in dedup_jaccard_prefix(spark, sf_dir).collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    truth = con.execute(f"""
        WITH toks AS (
          SELECT DISTINCT doc_id, UNNEST(list_transform(
            string_split_regex(trim(text), '\\s+'), x -> lower(x))) AS token
          FROM documents),
        sizes AS (SELECT doc_id, COUNT(*) d_size FROM toks GROUP BY doc_id),
        inter AS (
          SELECT ta.doc_id a, tb.doc_id b, COUNT(*) n
          FROM toks ta JOIN toks tb
            ON tb.token = ta.token AND ta.doc_id < tb.doc_id
          GROUP BY 1, 2)
        SELECT a, b, ROUND(n * 1.0 / (sa.d_size + sb.d_size - n), 6) AS j
        FROM inter i
        JOIN sizes sa ON sa.doc_id = i.a JOIN sizes sb ON sb.doc_id = i.b
        WHERE n * 1.0 / (sa.d_size + sb.d_size - n) >= {PPJ_T}
    """).fetchall()
    want = {(a, b): j for a, b, j in truth}
    assert set(got) == set(want), (
        f"prefix filter lost {len(set(want) - set(got))} / gained "
        f"{len(set(got) - set(want))} pairs"
    )
    for k in want:
        assert abs(got[k] - want[k]) < 1e-6


def test_containment_catches_short_in_long_that_jaccard_misses(spark, tmp_path):
    """The asymmetric case the operator exists for: a short doc whose
    shingles are ALL inside a much longer doc. Containment = 1.0, but
    the long side's extra shingles dilute Jaccard below JACCARD_MIN —
    so dedup_ngram_jaccard must NOT pair them while
    dedup_containment_ngram MUST."""
    from golang_etl_spark.operators.dedup import (
        JACCARD_MIN,
        dedup_containment_ngram,
        dedup_ngram_jaccard,
    )

    short = "alpha bravo charlie delta echo"
    long = (
        short
        + " foxtrot golf hotel india juliet kilo lima mike november"
        " oscar papa quebec romeo sierra tango uniform victor whiskey"
        " xray yankee zulu one two three four five six seven eight"
    )
    df = spark.createDataFrame(
        [(1, short), (2, long),
         (3, "entirely different body of text with no overlap anywhere here")],
        "doc_id long, text string",
    )
    df.write.parquet(f"{tmp_path}/documents.parquet")

    cont = {
        (r["doc_id_a"], r["doc_id_b"]): r
        for r in dedup_containment_ngram(spark, str(tmp_path)).collect()
    }
    assert (1, 2) in cont, "short-in-long pair missed by containment"
    assert cont[(1, 2)]["containment"] == 1.0
    assert cont[(1, 2)]["jaccard"] < JACCARD_MIN, (
        "fixture not asymmetric enough — jaccard should sit below the bar"
    )
    assert not any(3 in pair for pair in cont), "disjoint doc paired"

    jacc_pairs = {
        (r["doc_id_a"], r["doc_id_b"])
        for r in dedup_ngram_jaccard(spark, str(tmp_path)).collect()
    }
    assert (1, 2) not in jacc_pairs, (
        "jaccard already catches this pair — containment adds nothing"
    )

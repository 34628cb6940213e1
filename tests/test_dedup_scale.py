"""Scale-shape proof for MinHash+LSH dedup: candidate volume must grow
~linearly with the number of duplicates, never quadratically.

The doubling harness: plant k exact duplicates into the fixture corpus,
then 2k, and compare the candidate-pair increase. A healthy banded-LSH
plan adds O(1) candidates per planted duplicate (the dup collides with
its original in every band); a degenerate plan (hot bucket, broken band
key, accidental cross join) multiplies candidates and fails the ratio
gate long before it would melt a 1000-executor cluster.
"""

from pyspark.sql import functions as F

from golang_etl_spark.operators.dedup import minhash_candidates
from golang_etl_spark.sources.catalog import load_table


def _corpus_with_dups(spark, sf_dir, out_dir: str, k: int) -> str:
    """Fixture documents plus the first k docs re-added under fresh
    doc_ids; written as <out_dir>/documents.parquet so the operator
    reads it exactly like a scale-factor directory."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    dups = (
        docs.orderBy("doc_id")
        .limit(k)
        .select((F.col("doc_id") + 1_000_000).alias("doc_id"), "text")
    )
    docs.unionByName(dups).write.mode("overwrite").parquet(
        f"{out_dir}/documents.parquet"
    )
    return out_dir


def test_minhash_candidates_grow_linearly_with_dups(spark, sf_dir, tmp_path):
    base = _corpus_with_dups(spark, sf_dir, str(tmp_path / "d0"), 0)
    with_k = _corpus_with_dups(spark, sf_dir, str(tmp_path / "d1"), 50)
    with_2k = _corpus_with_dups(spark, sf_dir, str(tmp_path / "d2"), 100)

    counts = {}
    for label, d in (("c0", base), ("ck", with_k), ("c2k", with_2k)):
        posting, bands, cand = minhash_candidates(spark, d)
        counts[label] = cand.count()
        posting.unpersist()
        bands.unpersist()

    added_k = counts["ck"] - counts["c0"]
    added_2k = counts["c2k"] - counts["c0"]
    # every planted dup must be found as a candidate
    assert added_k >= 50
    assert added_2k >= 100
    # linear growth: doubling the dups ~doubles the added candidates.
    # Quadratic growth would quadruple them; 2.6 leaves room for dup
    # copies that also pair with pre-existing near-dups of their
    # original.
    assert added_2k <= 2.6 * added_k, (
        f"candidate growth superlinear: +{added_k} at k=50, "
        f"+{added_2k} at k=100"
    )

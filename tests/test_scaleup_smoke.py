"""Scale-up smoke: the fuzzy-dedup candidate generators on a corpus
5x the bench fixture (25k docs, built by unioning sf0.1 documents with
shifted doc_ids). The plan gates prove the SHAPE survives scale; this
proves the runtime does — candidate volume and wall time must grow
roughly linearly with corpus size, never quadratically (the failure
mode every banded-LSH design exists to avoid).

Each id-shifted copy duplicates the original corpus text exactly, so
cross-copy near-dup candidates are expected and plentiful — the point
is that candidates come from band buckets, not from an n^2 pair space:
at 5x docs an n^2 operator would do 25x the work.
"""

import os
import time

import pyarrow.parquet as pq
import pytest


REPLICAS = 5
SF_BIG = "/root/testdata/sf0.1"


@pytest.fixture(scope="module")
def scaled_dir(tmp_path_factory):
    if not os.path.exists(f"{SF_BIG}/documents.parquet"):
        pytest.skip("sf0.1 fixture absent")
    import pyarrow as pa

    out = tmp_path_factory.mktemp("scaled")
    tbl = pq.read_table(f"{SF_BIG}/documents.parquet")
    n = tbl.num_rows
    copies = []
    for r in range(REPLICAS):
        ids = pa.array(
            [v + r * 10_000_000 for v in tbl["doc_id"].to_pylist()],
            type=tbl.schema.field("doc_id").type,
        )
        copies.append(tbl.set_column(0, "doc_id", ids))
    pq.write_table(pa.concat_tables(copies), str(out / "documents.parquet"))
    return str(out)


def test_minhash_scales_subquadratically(spark, scaled_dir):
    from golang_etl_spark.operators.dedup import dedup_minhash_lsh

    spark.catalog.clearCache()
    t0 = time.perf_counter()
    base = dedup_minhash_lsh(spark, SF_BIG).count()
    t_base = time.perf_counter() - t0

    spark.catalog.clearCache()
    t0 = time.perf_counter()
    big = dedup_minhash_lsh(spark, scaled_dir).count()
    t_big = time.perf_counter() - t0

    # every original pair appears once per copy (5x) plus the exact
    # cross-copy duplicates; an n^2 operator would be ~25x the work.
    # Bound generously for host jitter: time must stay well under the
    # quadratic ratio.
    assert big >= base * REPLICAS, f"candidates lost at scale: {base} -> {big}"
    assert t_big < t_base * REPLICAS * 3, (
        f"super-linear blowup: {t_base:.1f}s -> {t_big:.1f}s at {REPLICAS}x"
    )


def test_simhash_pairs_scale(spark, scaled_dir):
    from golang_etl_spark.operators.dedup import simhash_pairs

    spark.catalog.clearCache()
    base = simhash_pairs(spark, SF_BIG).count()
    spark.catalog.clearCache()
    big = simhash_pairs(spark, scaled_dir).count()
    assert big >= base * REPLICAS, f"pairs lost at scale: {base} -> {big}"

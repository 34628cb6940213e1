"""Incremental MinHash-index ingestion: appended documents must be
visible to every subsequent probe, re-ingest must be idempotent, and
existing store files must never be rewritten.

Isolation: the shared per-process store for the real fixture dir must
NOT be mutated (later oracle tests read it), so the test builds its
own store through a symlinked fixture directory — different sf_dir
key, different layout root."""

import os

from pyspark.sql import functions as F

from golang_etl_spark.operators.dedup import (
    _IS_BATCH_SQL,
    LSH_BANDS,
    build_minhash_index,
    ingest_into_minhash_index,
    probe_minhash_index,
)


def _iso_fixture(sf_dir, tmp_path):
    d = tmp_path / "iso_fixture"
    d.mkdir()
    os.symlink(
        os.path.join(sf_dir, "documents.parquet"),
        str(d / "documents.parquet"),
    )
    return str(d)


def test_ingested_docs_become_probe_corpus(spark, sf_dir, tmp_path):
    iso = _iso_fixture(sf_dir, tmp_path)
    root = build_minhash_index(spark, iso)
    docs = spark.read.parquet(f"{iso}/documents.parquet")
    batch = docs.filter(F.expr(_IS_BATCH_SQL))
    n_batch = batch.count()
    n_before = spark.read.parquet(root).count()

    files_before = set()
    for dirpath, _, files in os.walk(root):
        files_before |= {os.path.join(dirpath, f) for f in files
                         if f.endswith(".parquet")}
    mtimes_before = {f: os.path.getmtime(f) for f in files_before}

    n_ingested = ingest_into_minhash_index(spark, batch, iso)
    assert n_ingested == n_batch

    # store grew by exactly LSH_BANDS rows per doc; old files untouched
    assert spark.read.parquet(root).count() == n_before + n_batch * LSH_BANDS
    for f, m in mtimes_before.items():
        assert os.path.getmtime(f) == m, f"existing store file rewritten: {f}"

    # every ingested doc is now probe-visible: probing the ingested
    # docs themselves must return the exact self-match (jaccard 1.0)
    hits = probe_minhash_index(spark, batch, iso)
    self_hits = {
        r["batch_doc"]
        for r in hits.filter(
            (F.col("batch_doc") == F.col("corpus_doc"))
            & (F.col("jaccard") == 1.0)
        ).collect()
    }
    want = {r["doc_id"] for r in batch.select("doc_id").collect()}
    assert self_hits == want, (
        f"{len(want - self_hits)} ingested docs invisible to the probe"
    )


def test_reingest_is_idempotent(spark, sf_dir, tmp_path):
    iso = _iso_fixture(sf_dir, tmp_path)
    root = build_minhash_index(spark, iso)
    docs = spark.read.parquet(f"{iso}/documents.parquet")
    batch = docs.filter(F.expr(_IS_BATCH_SQL))

    assert ingest_into_minhash_index(spark, batch, iso) == batch.count()
    n_after_first = spark.read.parquet(root).count()
    # the retry ingests nothing and the store is unchanged
    assert ingest_into_minhash_index(spark, batch, iso) == 0
    assert spark.read.parquet(root).count() == n_after_first

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


def test_pipeline_retry_after_ingest_is_deterministic(spark, sf_dir, tmp_path):
    """Simulates a stream restart BETWEEN ingest and sink commit: the
    same batch re-runs through incremental_dedup_pipeline after its
    ingest already landed. The retry must produce the SAME clean set
    and matches — not self-match every doc at jaccard 1.0 and drop the
    whole batch from the clean corpus (the pre-fix failure mode)."""
    from golang_etl_spark.operators.dedup import incremental_dedup_pipeline

    iso = _iso_fixture(sf_dir, tmp_path)
    build_minhash_index(spark, iso)
    docs = spark.read.parquet(f"{iso}/documents.parquet")
    batch = docs.filter(F.expr(_IS_BATCH_SQL))

    clean1, matches1 = incremental_dedup_pipeline(spark, batch, iso)
    ids1 = {r["doc_id"] for r in clean1.select("doc_id").collect()}
    m1 = {(r["batch_doc"], r["corpus_doc"]) for r in matches1.collect()}
    assert ids1, "first run must keep some docs"

    # the retry: ingest already landed, same batch replays
    clean2, matches2 = incremental_dedup_pipeline(spark, batch, iso)
    ids2 = {r["doc_id"] for r in clean2.select("doc_id").collect()}
    m2 = {(r["batch_doc"], r["corpus_doc"]) for r in matches2.collect()}
    assert ids2 == ids1, "retry changed the clean set"
    assert m2 == m1, "retry changed the match report"
    assert not any(a == b for a, b in m2), "self-matches leaked into retry"


def test_half_ingest_recovers(spark, sf_dir, tmp_path):
    """Simulates a crash between the two store appends: the posting
    store (written first) has the batch, the band store does not. The
    retry must complete the band store WITHOUT duplicating posting
    rows — per-store anti-join keying, not a single shared marker."""
    from golang_etl_spark.operators.dedup import (
        _posting_from_docs,
        build_minhash_corpus_postings,
    )

    iso = _iso_fixture(sf_dir, tmp_path)
    root = build_minhash_index(spark, iso)
    posting_root = build_minhash_corpus_postings(spark, iso)
    docs = spark.read.parquet(f"{iso}/documents.parquet")
    batch = docs.filter(F.expr(_IS_BATCH_SQL))
    n_batch = batch.count()

    # crash simulation: posting append landed, band append did not
    _posting_from_docs(batch).select("doc_id", "shingle").write.mode(
        "append"
    ).parquet(posting_root)
    post_rows_after_crash = spark.read.parquet(posting_root).count()
    bands_before = spark.read.parquet(root).count()

    # retry completes the missing half
    assert ingest_into_minhash_index(spark, batch, iso) == n_batch
    assert (
        spark.read.parquet(posting_root).count() == post_rows_after_crash
    ), "posting rows duplicated on retry"
    assert (
        spark.read.parquet(root).count()
        == bands_before + n_batch * LSH_BANDS
    )
    # recovered docs are fully probe-visible (bands AND postings agree)
    hits = probe_minhash_index(spark, batch, iso)
    self_hits = {
        r["batch_doc"]
        for r in hits.filter(
            (F.col("batch_doc") == F.col("corpus_doc"))
            & (F.col("jaccard") == 1.0)
        ).collect()
    }
    want = {r["doc_id"] for r in batch.select("doc_id").collect()}
    assert self_hits == want


def test_two_batch_loop_catches_cross_batch_dups(spark, sf_dir, tmp_path):
    """The property only the FULL loop has: batch 2 contains exact
    copies of batch-1 docs (fresh ids, same text). The store's corpus
    never saw them — they are caught solely because batch 1's
    survivors were ingested. Copies route to matches; genuinely new
    docs survive and get ingested in turn."""
    from golang_etl_spark.operators.dedup import incremental_dedup_pipeline

    iso = _iso_fixture(sf_dir, tmp_path)
    build_minhash_index(spark, iso)
    docs = spark.read.parquet(f"{iso}/documents.parquet")
    batch = docs.filter(F.expr(_IS_BATCH_SQL))
    b1 = batch.filter(F.col("doc_id") % 2 == 1)
    b2_new = batch.filter(F.col("doc_id") % 2 == 0)

    clean1, matches1 = incremental_dedup_pipeline(spark, b1, iso)
    n_clean1 = clean1.count()
    assert n_clean1 > 0

    # batch 2 = the other half PLUS copies of batch-1 survivors under
    # fresh ids — near-dups of a PRIOR BATCH, not of the corpus.
    # Materialized: a lazy limit() would re-pick different rows on
    # each downstream action, and clean1's plan re-probes the store.
    picked = [r.asDict() for r in clean1.orderBy("doc_id").limit(5).collect()]
    for r in picked:
        r["doc_id"] += 10_000_000
    assert picked
    copies = spark.createDataFrame(picked, clean1.schema)
    b2 = b2_new.unionByName(copies)

    clean2, matches2 = incremental_dedup_pipeline(spark, b2, iso)

    copy_ids = {r["doc_id"] for r in copies.select("doc_id").collect()}
    caught = {
        r["batch_doc"]
        for r in matches2.filter(F.col("jaccard") == 1.0).collect()
        if r["batch_doc"] in copy_ids
    }
    assert caught == copy_ids, (
        f"cross-batch dups missed: {copy_ids - caught}"
    )
    # none of the copies survived into the clean side
    assert clean2.filter(F.col("doc_id").isin(list(copy_ids))).count() == 0


def test_streaming_loop_dedups_across_microbatches(spark, sf_dir, tmp_path):
    """Two chronological micro-batches through the streaming loop:
    chunk 2 holds exact copies (fresh ids) of chunk-1 docs. They are
    caught only because chunk 1's survivors were ingested between the
    batches — the cross-micro-batch property plain per-batch dedup
    cannot have."""
    import pyarrow.parquet as pq

    from golang_etl_spark.streaming.jobs import (
        _DOCS_SCHEMA,
        stream_incremental_dedup,
    )

    iso = _iso_fixture(sf_dir, tmp_path)
    build_minhash_index(spark, iso)

    docs = spark.read.parquet(f"{iso}/documents.parquet")
    batch = docs.filter(F.expr(_IS_BATCH_SQL))
    c1 = batch.filter(F.col("doc_id") % 2 == 1)
    c2_new = batch.filter(F.col("doc_id") % 2 == 0)
    picked = [r.asDict() for r in c1.orderBy("doc_id").limit(4).collect()]
    for r in picked:
        r["doc_id"] += 20_000_000
    copies = spark.createDataFrame(picked, c1.schema)
    copy_ids = {r["doc_id"] for r in picked}

    split = tmp_path / "stream_in"
    split.mkdir()
    c1.toPandas().pipe(
        lambda pdf: pq.write_table(
            __import__("pyarrow").Table.from_pandas(pdf),
            str(split / "c1.parquet"),
        )
    )
    c2_new.unionByName(copies).toPandas().pipe(
        lambda pdf: pq.write_table(
            __import__("pyarrow").Table.from_pandas(pdf),
            str(split / "c2.parquet"),
        )
    )
    import os
    import time

    base = time.time() - 20
    os.utime(split / "c1.parquet", (base, base))
    os.utime(split / "c2.parquet", (base + 5, base + 5))

    stream = (
        spark.readStream.schema(_DOCS_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(split))
    )
    clean, matches = stream_incremental_dedup(
        stream, iso, str(tmp_path / "loop_out")
    )

    caught = {
        r["batch_doc"]
        for r in matches.filter(F.col("jaccard") == 1.0).collect()
        if r["batch_doc"] in copy_ids
    }
    assert caught == copy_ids, f"missed across batches: {copy_ids - caught}"
    clean_ids = {r["doc_id"] for r in clean.collect()}
    assert not (clean_ids & copy_ids), "copies leaked into the clean sink"

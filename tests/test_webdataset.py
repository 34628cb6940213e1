"""WebDataset tar shard packing: the written shards must round-trip
losslessly, agree with the oracle-checked manifest, and be
deterministic byte-for-byte."""

import hashlib
import os

from pyspark.sql import functions as F

from golang_etl_spark.operators.multimodal import payload_df
from golang_etl_spark.operators.webdataset import (
    read_webdataset,
    write_webdataset,
)


def test_roundtrip_matches_manifest_and_payloads(spark, sf_dir, tmp_path):
    out = str(tmp_path / "wds")
    shard_files = write_webdataset(spark, sf_dir, out)
    assert shard_files, "no shards written"
    assert sorted(os.listdir(out)) == shard_files, "stray/missing files"

    back = read_webdataset(spark, out)

    # every payload byte survived: md5 per doc matches the source
    src = payload_df(spark, sf_dir).select(
        "doc_id", F.md5("payload").alias("src_md5")
    )
    joined = back.join(src, "doc_id", "full")
    n_total = src.count()
    assert back.count() == n_total
    assert (
        joined.filter(
            (F.col("payload_md5") != F.col("src_md5"))
            | F.col("payload_md5").isNull()
            | F.col("src_md5").isNull()
        ).count()
        == 0
    ), "payload corruption in tar round-trip"

    # per-shard sample counts agree with the oracle-checked manifest
    from golang_etl_spark.registry import all_queries

    manifest = all_queries()["multimodal_shard_manifest"].fn(spark, sf_dir)
    expect = {
        f"{r['media_type']}-{int(r['shard_id']):06d}.tar": r["n_items"]
        for r in manifest.collect()
    }
    got = {
        r["shard_file"]: r["cnt"]
        for r in back.groupBy("shard_file")
        .agg(F.count("*").alias("cnt"))
        .collect()
    }
    assert got == expect, "shard membership disagrees with the manifest"


def test_shards_are_byte_deterministic(spark, sf_dir, tmp_path):
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    files_a = write_webdataset(spark, sf_dir, a)
    files_b = write_webdataset(spark, sf_dir, b)
    assert files_a == files_b

    def digest(d):
        out = {}
        for f in os.listdir(d):
            # context-managed: the old inline open() leaked the handle
            # to GC, caught once the suite's ResourceWarning ignore was
            # message-scoped to Py4J sockets (ADVICE r11)
            with open(os.path.join(d, f), "rb") as fh:
                out[f] = hashlib.md5(fh.read()).hexdigest()
        return out

    assert digest(a) == digest(b), "re-run produced different tar bytes"


def test_streaming_ingest_multibatch_losslessness(spark, sf_dir, tmp_path):
    """Documents split into 3 files -> 3 micro-batches through
    stream_webdataset_ingest: every payload must land exactly once
    across the per-batch tar namespaces, md5-identical to the batch
    synthesis, with at least two distinct batch prefixes proving the
    stream really chunked."""
    from golang_etl_spark.streaming.jobs import _DOCS_SCHEMA

    src = spark.read.parquet(f"{sf_dir}/documents.parquet")
    split_dir = str(tmp_path / "docs_split")
    src.repartition(3).write.mode("overwrite").parquet(split_dir)

    docs = (
        spark.readStream.schema(_DOCS_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(split_dir)
    )
    out = str(tmp_path / "wds_stream")
    from golang_etl_spark.operators.webdataset import (
        read_webdataset,
        stream_webdataset_ingest,
    )

    shard_files = stream_webdataset_ingest(docs, out)
    prefixes = {f.split("-")[0] for f in shard_files}
    assert len(prefixes) >= 2, f"expected multiple batches: {prefixes}"

    back = read_webdataset(spark, out)
    ref = payload_df(spark, sf_dir).select(
        "doc_id", F.md5("payload").alias("src_md5")
    )
    joined = back.join(ref, "doc_id", "full")
    assert back.count() == ref.count(), "samples lost or duplicated"
    assert (
        joined.filter(
            (F.col("payload_md5") != F.col("src_md5"))
            | F.col("payload_md5").isNull()
            | F.col("src_md5").isNull()
        ).count()
        == 0
    )

"""WebDataset-style tar shard packing: materialize the shard manifest
as actual .tar files, one per (media_type, shard_id), written
executor-side.

Completes the multimodal sink story: ``multimodal_shard_manifest``
PLANS the shards (distributed prefix-sum bucketing, oracle-checked);
this module WRITES them in the layout LLM training loaders stream —
one tar per shard, each sample as a ``<key>.bin`` payload entry plus a
``<key>.json`` metadata entry, entries ordered by doc_id. Everything
uses the Python stdlib (tarfile), no codec dependencies.

Scale shape: rows are hash-repartitioned on the shard key, so every
shard's samples land in exactly one task, and each task streams its
shards to storage with O(one shard) memory (shards are byte-budgeted
by construction — SHARD_BUDGET_BYTES — so the in-task sort and tar
buffer are bounded). The driver never sees a payload byte. On a
cluster ``out_dir`` is a shared store (object store / DBFS); tar
bytes are written once, no post-pass.

Deterministic by construction: fixed entry order (doc_id), zeroed
tar mtimes/uids, so re-running produces byte-identical shards —
the property the round-trip test pins.
"""

from __future__ import annotations

import io
import json
import os
import tarfile
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from golang_etl_spark.operators.multimodal import (
    assign_shards,
    payload_df,
    payload_from_docs,
)


def _shard_rows(p: DataFrame) -> DataFrame:
    """(payload frame) → one row per sample with its shard key and
    serialized metadata, co-located so one task owns each shard (hash
    partitioning is total on the key)."""
    assigned = assign_shards(p).select("media_type", "doc_id", "shard_id")
    return (
        p.join(assigned, ["media_type", "doc_id"])
        .select(
            "media_type",
            "shard_id",
            "doc_id",
            "payload",
            F.to_json("meta").alias("meta_json"),
        )
        .repartition("media_type", "shard_id")
    )


def _make_packer(out_dir: str, prefix: str = ""):
    """Partition function writing one tar per shard key present.
    ``prefix`` namespaces the files (streaming: per-batch); identical
    inputs always produce identical bytes (fixed entry order, zeroed
    tar metadata), and the temp-write + atomic-rename means a re-run
    or retried task replaces rather than tears a shard."""

    def _pack(part) -> Iterator:
        shards: dict[tuple, list] = {}
        for r in part:
            shards.setdefault((r["media_type"], r["shard_id"]), []).append(r)
        for (mtype, sid), items in shards.items():
            items.sort(key=lambda r: r["doc_id"])
            name = f"{prefix}{mtype}-{int(sid):06d}.tar"
            tmp = os.path.join(out_dir, f"_tmp.{os.getpid()}.{name}")
            with tarfile.open(tmp, "w") as tar:
                for r in items:
                    key = f"{r['doc_id']:09d}"
                    for suffix, data in (
                        (".bin", bytes(r["payload"])),
                        (".json", r["meta_json"].encode()),
                    ):
                        info = tarfile.TarInfo(name=key + suffix)
                        info.size = len(data)
                        info.mtime = 0  # deterministic bytes
                        tar.addfile(info, io.BytesIO(data))
            os.replace(tmp, os.path.join(out_dir, name))
            yield (name, len(items))

    return _pack


def write_webdataset(
    spark: SparkSession, sf_dir: str, out_dir: str
) -> list[str]:
    """Pack every payload into its planned shard tar under
    ``out_dir``. Returns the sorted list of shard file names written.
    """
    os.makedirs(out_dir, exist_ok=True)
    rows = _shard_rows(payload_df(spark, sf_dir))
    written = (
        rows.rdd.mapPartitions(_make_packer(out_dir))
        .toDF(["shard_file", "n_items"])
        .collect()  # bounded: one row per SHARD, not per sample
    )
    return sorted(r["shard_file"] for r in written)


def stream_webdataset_ingest(docs: DataFrame, out_dir: str) -> list[str]:
    """Continuous shard emission: each micro-batch of (doc_id, text)
    documents is synthesized, shard-planned, and packed into tars
    under a ``b<batch_id>-`` namespace — the live-ingestion shape of
    the batch packer (real webdataset writers roll tars per ingest
    chunk the same way; a global re-pack is a separate compaction job,
    exactly like sink_compact_small_files for parquet).

    Exactly-once: the checkpoint makes each batch processed once, and
    a RETRIED batch deterministically rewrites its own namespaced tars
    (atomic rename, byte-identical content) instead of duplicating —
    the same per-batch idempotence contract as
    streaming/jobs.foreachbatch_parquet_sink. Returns the sorted
    shard file names present after the stream drains."""
    os.makedirs(out_dir, exist_ok=True)

    def _ingest(batch_df: DataFrame, batch_id: int) -> None:
        rows = _shard_rows(payload_from_docs(batch_df))
        # count() drives the partition-side writes; one row per shard
        rows.rdd.mapPartitions(
            _make_packer(out_dir, prefix=f"b{batch_id:04d}-")
        ).count()

    q = (
        docs.writeStream.foreachBatch(_ingest)
        .option("checkpointLocation", os.path.join(out_dir, "_checkpoints"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # exclude '_tmp.<pid>.*.tar' leftovers from a task killed mid-write
    # — they're torn files awaiting the atomic rename that never came
    # (Spark's own readers skip underscore-prefixed files; this listdir
    # must too)
    return sorted(
        f
        for f in os.listdir(out_dir)
        if f.endswith(".tar") and not f.startswith("_tmp.")
    )


_UNPACK_SCHEMA = (
    "shard_file string, doc_id long, n_bytes long, payload_md5 string"
)


def read_webdataset(spark: SparkSession, out_dir: str) -> DataFrame:
    """Read shard tars back into (shard_file, doc_id, n_bytes,
    payload_md5) rows — binaryFile scan + Arrow-batched untar, one
    task per tar, payloads never centralized."""

    def _unpack(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            out = {k: [] for k in
                   ("shard_file", "doc_id", "n_bytes", "payload_md5")}
            for path, content in zip(pdf["path"], pdf["content"]):
                fname = os.path.basename(path)
                with tarfile.open(fileobj=io.BytesIO(content)) as tar:
                    for m in tar.getmembers():
                        if not m.name.endswith(".bin"):
                            continue
                        data = tar.extractfile(m).read()
                        out["shard_file"].append(fname)
                        out["doc_id"].append(int(m.name[: -len(".bin")]))
                        out["n_bytes"].append(len(data))
                        out["payload_md5"].append(
                            hashlib.md5(data).hexdigest()
                        )
            yield pd.DataFrame(out)

    return (
        spark.read.format("binaryFile")
        .load(os.path.join(out_dir, "*.tar"))
        .select("path", "content")
        .mapInPandas(_unpack, schema=_UNPACK_SCHEMA)
    )

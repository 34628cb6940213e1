"""Multimodal column handling: opaque binary payloads + typed
metadata, decode/feature-extract via Arrow-batched ``mapInPandas``,
and frame sampling.

The container has no image/audio codecs, so *real* decoding is stubbed
behind a clearly-marked NotImplementedError (``decode_media``); the
Spark-side plumbing — binary columns, metadata structs, pandas-UDF
signatures, batch shapes, partitioning — is real and oracle-checked.
Payloads are synthesized deterministically from ``documents`` (md5 →
unhex → 16-byte binary), so the DuckDB oracle can recompute every
derived feature from the hex digest.

Scale notes (100 TB stance):
- binary payloads stay opaque until the last step; metadata predicates
  (media_type, byte size) are plain columns, so Catalyst prunes and
  pushes them *before* any Python is involved.
- the only Python crossing is mapInPandas over Arrow record batches
  (vectorized numpy per batch, never per-row); everything else is JVM.
- frame sampling is explode(sequence(...)) — generates rows JVM-side,
  no shuffle.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from golang_etl_spark.registry import register
from golang_etl_spark.sources.catalog import load_table

MEDIA_TYPES = ("image", "audio", "video")
FRAME_INTERVAL_S = 10


def decode_media(payload: bytes, media_type: str) -> object:
    """Real codec decode — NOT IMPLEMENTED in this container (no
    PIL/librosa/av). The pipeline around it (schema, batching,
    partitioning) is real; swap this stub for the codec call when the
    libs exist."""
    raise NotImplementedError(
        "media codecs are unavailable in this environment; "
        "use extract_features_fake() for the deterministic test path"
    )


def payload_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → (doc_id, media_type, payload BINARY, meta struct).

    Deterministic synthesis: payload = unhex(md5(text)) (16 opaque
    bytes standing in for encoded media); media_type cycles by doc_id;
    width/height/duration derived from digest nibbles the same way the
    oracle recomputes them."""
    return payload_from_docs(load_table(spark, sf_dir, "documents"))


def payload_from_docs(docs: DataFrame) -> DataFrame:
    """The payload synthesis proper, over ANY (doc_id, text) frame —
    batch table or a streaming micro-batch (webdataset ingest)."""
    hexd = F.md5("text")
    return docs.select(
        "doc_id",
        F.element_at(
            F.array(*[F.lit(m) for m in MEDIA_TYPES]),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("media_type"),
        F.unhex(hexd).alias("payload"),
        F.struct(
            (F.conv(F.substring(hexd, 1, 3), 16, 10).cast("long") % 1920 + 1)
            .alias("width"),
            (F.conv(F.substring(hexd, 4, 3), 16, 10).cast("long") % 1080 + 1)
            .alias("height"),
            (F.conv(F.substring(hexd, 7, 3), 16, 10).cast("long") % 600 + 1)
            .alias("duration_s"),
        ).alias("meta"),
    )


# ---------------------------------------------------------------------------
# 1. Metadata projection (oracle-checked plumbing).
# ---------------------------------------------------------------------------
_META_ORACLE = """
SELECT doc_id,
       ['image', 'audio', 'video'][(doc_id % 3 + 1)::INT] AS media_type,
       CAST(16 AS BIGINT) AS payload_bytes,
       ('0x' || substr(md5(text), 1, 3))::BIGINT % 1920 + 1 AS width,
       ('0x' || substr(md5(text), 4, 3))::BIGINT % 1080 + 1 AS height,
       ('0x' || substr(md5(text), 7, 3))::BIGINT % 600 + 1 AS duration_s
FROM documents
"""


@register("multimodal_metadata", oracle=_META_ORACLE, tags=("multimodal", "llm"))
def multimodal_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload + typed metadata columns, flattened. Everything
    is JVM expressions over the scan — the payload bytes are carried
    but never opened."""
    p = payload_df(spark, sf_dir)
    return p.select(
        "doc_id",
        "media_type",
        F.octet_length("payload").cast("long").alias("payload_bytes"),
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
        F.col("meta.duration_s").alias("duration_s"),
    )


# ---------------------------------------------------------------------------
# 2. Feature extraction via mapInPandas (Arrow-batched Python).
# ---------------------------------------------------------------------------
_FEATURES_SCHEMA = (
    "doc_id long, n_bytes long, mean_byte double, min_byte long, max_byte long"
)

_FEATURES_ORACLE = """
WITH bytes AS (
  SELECT doc_id,
         list_transform(range(1, 17),
           i -> ('0x' || substr(md5(text), 2*i - 1, 2))::BIGINT) AS b
  FROM documents
)
SELECT doc_id,
       CAST(len(b) AS BIGINT) AS n_bytes,
       list_sum(b) / 16.0 AS mean_byte,
       CAST(list_min(b) AS BIGINT) AS min_byte,
       CAST(list_max(b) AS BIGINT) AS max_byte
FROM bytes
"""


def _extract_features(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """Vectorized fake feature extractor: byte statistics per payload.
    Stands in for the codec feature step (decode_media) with identical
    plumbing — Arrow in, numpy per batch, Arrow out."""
    import numpy as np

    for pdf in batches:
        arrs = [np.frombuffer(p, dtype=np.uint8) for p in pdf["payload"]]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].to_numpy(),
                "n_bytes": [len(a) for a in arrs],
                "mean_byte": [float(a.sum()) / len(a) for a in arrs],
                "min_byte": [int(a.min()) for a in arrs],
                "max_byte": [int(a.max()) for a in arrs],
            }
        )


@register(
    "multimodal_decode_features",
    oracle=_FEATURES_ORACLE,
    tags=("multimodal", "llm", "pandas_udf"),
)
def multimodal_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature extraction through the real multimodal path: binary
    column → mapInPandas (Arrow record batches, numpy inside) → typed
    feature columns. The oracle recomputes the same statistics from
    the hex digest, proving the Python crossing is lossless."""
    p = payload_df(spark, sf_dir).select("doc_id", "payload")
    return p.mapInPandas(_extract_features, schema=_FEATURES_SCHEMA)


# ---------------------------------------------------------------------------
# 3. Resize planning for image rows (aspect-preserving, metadata-only).
# ---------------------------------------------------------------------------
RESIZE_MAX_SIDE = 256

_RESIZE_ORACLE = f"""
WITH img AS (
  SELECT doc_id,
         ('0x' || substr(md5(text), 1, 3))::BIGINT % 1920 + 1 AS width,
         ('0x' || substr(md5(text), 4, 3))::BIGINT % 1080 + 1 AS height
  FROM documents
  WHERE doc_id % 3 = 0  -- media_type = 'image'
)
SELECT doc_id, width, height,
       CASE WHEN width >= height
            THEN LEAST(width, {RESIZE_MAX_SIDE})
            ELSE CAST(FLOOR(width * LEAST(height, {RESIZE_MAX_SIDE}) * 1.0 / height) AS BIGINT)
       END AS target_w,
       CASE WHEN width >= height
            THEN CAST(FLOOR(height * LEAST(width, {RESIZE_MAX_SIDE}) * 1.0 / width) AS BIGINT)
            ELSE LEAST(height, {RESIZE_MAX_SIDE})
       END AS target_h,
       width > {RESIZE_MAX_SIDE} OR height > {RESIZE_MAX_SIDE} AS needs_resize
FROM img
"""


@register("multimodal_resize_plan", oracle=_RESIZE_ORACLE, tags=("multimodal", "llm"))
def multimodal_resize_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aspect-preserving resize planning for image payloads: compute
    target dimensions (long side clamped to RESIZE_MAX_SIDE, short side
    scaled by the same integer-truncated ratio) from metadata alone.
    The actual pixel resample belongs in the mapInPandas stage next to
    decode_media (stubbed: no codecs here); planning from metadata
    first means the Python stage only ever receives rows where
    needs_resize is true — predicate pruning before the expensive
    crossing, the same pattern as the feature extractor."""
    p = payload_df(spark, sf_dir).filter(F.col("media_type") == "image")
    w, h = F.col("meta.width"), F.col("meta.height")
    mx = F.lit(RESIZE_MAX_SIDE)
    return p.select(
        "doc_id",
        w.alias("width"),
        h.alias("height"),
        # explicit FLOOR on both engines: DuckDB's double->BIGINT cast
        # rounds while Spark's truncates — floor first, then cast
        F.when(w >= h, F.least(w, mx))
        .otherwise(F.floor(w * F.least(h, mx) / h).cast("long"))
        .alias("target_w"),
        F.when(w >= h, F.floor(h * F.least(w, mx) / w).cast("long"))
        .otherwise(F.least(h, mx))
        .alias("target_h"),
        ((w > mx) | (h > mx)).alias("needs_resize"),
    )


# ---------------------------------------------------------------------------
# 4. Frame sampling for video rows (explode a generated sequence).
# ---------------------------------------------------------------------------
_FRAMES_ORACLE = f"""
WITH v AS (
  SELECT doc_id,
         ('0x' || substr(md5(text), 7, 3))::BIGINT % 600 + 1 AS duration_s
  FROM documents
  WHERE doc_id % 3 = 2  -- media_type = 'video'
)
SELECT doc_id, CAST(f.f AS BIGINT) AS frame_idx,
       CAST(f.f * {FRAME_INTERVAL_S} AS BIGINT) AS frame_ts_s
FROM v, (SELECT unnest(range(0, 61)) AS f) f
WHERE f.f * {FRAME_INTERVAL_S} <= duration_s
"""


@register("multimodal_frame_sample", oracle=_FRAMES_ORACLE, tags=("multimodal",))
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling: one row per 10-second frame offset of each
    video payload, generated JVM-side via explode(sequence(...)) — the
    row-expansion pattern for frame/segment extraction at scale (no
    shuffle; sampling fan-out happens inside the scan stage)."""
    p = payload_df(spark, sf_dir).filter(F.col("media_type") == "video")
    return (
        p.select(
            "doc_id",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.floor(F.col("meta.duration_s") / FRAME_INTERVAL_S).cast(
                        "int"
                    ),
                )
            ).alias("frame_idx"),
        )
        .select(
            "doc_id",
            F.col("frame_idx").cast("long").alias("frame_idx"),
            (F.col("frame_idx") * FRAME_INTERVAL_S).cast("long").alias(
                "frame_ts_s"
            ),
        )
    )


# ---------------------------------------------------------------------------
# 5. Shard-packing manifest (WebDataset-style sequential byte packing).
# ---------------------------------------------------------------------------
# Assigns each media row to a fixed-byte-budget shard by greedy sequential
# fill in doc_id order, then emits the per-shard manifest. The running
# byte sum is computed as a DISTRIBUTED prefix sum — bucket-local
# window + broadcast bucket offsets (the same shape as the parallel
# dense-ID assignment, etl.py) — never a single-partition window over
# the corpus. The oracle replays it as DuckDB's plain
# SUM() OVER (ORDER BY), so the hash gate proves the two-level prefix
# sum IS the sequential semantics.
SHARD_BUDGET_BYTES = 2_000_000
_SHARD_PREFIX_BUCKET = 1000  # doc_ids per prefix-sum bucket

_EST_BYTES_DUCK = """
CASE ['image', 'audio', 'video'][(doc_id % 3 + 1)::INT]
  WHEN 'image' THEN (('0x' || substr(md5(text), 1, 3))::BIGINT % 1920 + 1)
                  * (('0x' || substr(md5(text), 4, 3))::BIGINT % 1080 + 1) * 3
  WHEN 'audio' THEN (('0x' || substr(md5(text), 7, 3))::BIGINT % 600 + 1) * 32000
  ELSE (('0x' || substr(md5(text), 7, 3))::BIGINT % 600 + 1) * 100000
END
"""

_SHARD_ORACLE = f"""
WITH sized AS (
  SELECT doc_id,
         ['image', 'audio', 'video'][(doc_id % 3 + 1)::INT] AS media_type,
         {_EST_BYTES_DUCK} AS est_bytes
  FROM documents
),
packed AS (
  SELECT media_type, doc_id, est_bytes,
         (SUM(est_bytes) OVER (PARTITION BY media_type ORDER BY doc_id)
          - est_bytes) // {SHARD_BUDGET_BYTES} AS shard_id
  FROM sized
)
SELECT media_type, CAST(shard_id AS BIGINT) AS shard_id,
       CAST(COUNT(*) AS BIGINT) AS n_items,
       CAST(SUM(est_bytes) AS BIGINT) AS shard_bytes,
       MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
FROM packed
GROUP BY media_type, shard_id
"""


def assign_shards(p: DataFrame) -> DataFrame:
    """Per-item shard assignment (media_type, doc_id, est_bytes,
    shard_id) by virtual byte-offset bucketing — the distributed
    two-level prefix sum documented on multimodal_shard_manifest.
    Shared by the manifest query and the tar packer
    (operators/webdataset.py) so the plan they ship is the plan the
    manifest proves."""
    from pyspark.sql.window import Window

    sized = p.select(
        "doc_id",
        "media_type",
        F.when(F.col("media_type") == "image",
               F.col("meta.width") * F.col("meta.height") * 3)
        .when(F.col("media_type") == "audio",
              F.col("meta.duration_s") * 32000)
        .otherwise(F.col("meta.duration_s") * 100000)
        .alias("est_bytes"),
        (F.col("doc_id") / _SHARD_PREFIX_BUCKET).cast("long").alias("bkt"),
    )
    w_local = (
        Window.partitionBy("media_type", "bkt")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = sized.withColumn("local_cum", F.sum("est_bytes").over(w_local))
    # bucket totals are |types| x |buckets| rows — tiny; their running
    # offset is a window over that aggregate, then broadcast back
    w_off = (
        Window.partitionBy("media_type")
        .orderBy("bkt")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    offsets = (
        sized.groupBy("media_type", "bkt")
        .agg(F.sum("est_bytes").alias("bkt_bytes"))
        .withColumn(
            "offset", F.sum("bkt_bytes").over(w_off) - F.col("bkt_bytes")
        )
        .select("media_type", "bkt", "offset")
    )
    return local.join(F.broadcast(offsets), ["media_type", "bkt"]).select(
        "media_type",
        "doc_id",
        "est_bytes",
        F.expr(
            f"(offset + local_cum - est_bytes) div {SHARD_BUDGET_BYTES}"
        ).alias("shard_id"),
    )


@register(
    "multimodal_shard_manifest",
    oracle=_SHARD_ORACLE,
    tags=("multimodal", "llm", "layout", "sink"),
)
def multimodal_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WebDataset-style shard manifest by VIRTUAL BYTE-OFFSET
    bucketing: per media type, items are laid end-to-end in doc_id
    order and shard k owns the items whose start offset falls in
    [k*budget, (k+1)*budget). Like tar-shard writers a shard can
    overflow by its tail item; unlike the sequential close-on-spill
    recurrence (which is inherently unparallelizable — every boundary
    depends on every prior size) the offset rule is a pure function of
    the prefix sum, so it distributes — the price is that an oversize
    item may leave the following shard ids empty. Estimated encoded
    size derives from the typed metadata (width x height x 3 /
    PCM rate / bitrate), so the planner never opens a payload.

    100 TB shape: the prefix sum is two-level — a bucket-local running
    sum (windows over _SHARD_PREFIX_BUCKET-doc buckets, thousands of
    concurrent partitions) plus broadcast per-bucket offsets (one tiny
    cumulative pass) — the single-partition ORDER BY window the naive
    formulation would use is the one thing this operator exists to
    avoid."""
    packed = assign_shards(payload_df(spark, sf_dir))
    return packed.groupBy("media_type", "shard_id").agg(
        F.count("*").alias("n_items"),
        F.sum("est_bytes").cast("long").alias("shard_bytes"),
        F.min("doc_id").alias("first_doc"),
        F.max("doc_id").alias("last_doc"),
    )

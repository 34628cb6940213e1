"""Deterministic sampling / split assignment: the hash-mod trick.

``df.sample()`` / ``sampleBy()`` draw from an engine-specific RNG —
unreproducible across engines, runs, and partitionings. A training
pipeline needs *stable* membership: a document must land in the same
train/val/test split on every run, on every engine, no matter how the
data is partitioned or re-scanned. The standard answer is hashing a
stable key and bucketing the hash — pure per-row projection, no state,
no RNG, trivially parallel at 100 TB.

No reference counterpart (SURVEY.md §2.5) — LLM-pipeline extension.

The 60-bit-md5-prefix construction matches the MinHash signature trick
(operators/dedup.py): both engines compute the identical integer, so
the DuckDB oracle replays split assignment bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from golang_etl_spark.registry import register
from golang_etl_spark.sources.catalog import load_table

TRAIN_PCT = 80
VAL_PCT = 10  # test = the remainder

_BUCKET_SPARK = (
    "cast(conv(substr(md5(cast(doc_id AS string)), 1, 15), 16, 10) AS bigint) % 100"
)
_BUCKET_DUCK = "('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT % 100"


def _split_case(bucket: str) -> str:
    return (
        f"CASE WHEN {bucket} < {TRAIN_PCT} THEN 'train' "
        f"WHEN {bucket} < {TRAIN_PCT + VAL_PCT} THEN 'val' "
        "ELSE 'test' END"
    )


_SPLIT_ORACLE = f"""
SELECT {_split_case(_BUCKET_DUCK)} AS split, lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM documents
GROUP BY split, lang
"""


@register("sample_split_hash", oracle=_SPLIT_ORACLE, tags=("sampling", "llm"))
def sample_split_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/val/test split assignment via md5-bucket of doc_id
    (80/10/10), summarized per (split, lang). The assignment is a
    stateless JVM projection — membership is stable under
    re-partitioning, retries, and engine choice, unlike rand()-based
    sampling."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.selectExpr(
            f"{_split_case(_BUCKET_SPARK)} AS split", "lang", "n_chars"
        )
        .groupBy("split", "lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
    )

"""Custom Python DataSource: the reference's partitioned range scan as
a first-class pluggable Spark source.

The reference extractor is, structurally, a data source: plan fixed-
stride half-open key chunks (/root/reference/extractor.go:270-287),
fetch each chunk concurrently (extractor.go:41-112), emit rows. Spark 4's
Python DataSource API expresses exactly that contract natively —
``partitions()`` IS planChunks (one ``InputPartition`` per stride, the
final chunk clamped to the upper bound, i.e. the maxKey+1 fixup), and
``read(partition)`` IS fetchDataByKeyRange (each chunk a separate task,
scheduled across executors; Spark's task scheduler replaces the
20-slot fetch semaphore). The emitted rows replay the deterministic
seed-source formula (sources/sinks.py:seed_table — id + 20-char
md5-derived string, the reproducible re-expression of
/root/reference/tmp/data_seed.go:14-21), so the source's output is
oracle-checkable down to the value hash.

100 TB stance: this is the extension point for formats Spark cannot
read natively (proprietary APIs, paginated services, WebDataset-style
shard registries). Planning emits O(chunks) lightweight partition
descriptors from the driver; all row materialization happens inside
tasks, Arrow-batched back to the JVM. For sources Spark DOES speak
(JDBC, parquet), the built-in readers stay the right answer — this
demonstrates the escape hatch, not a replacement.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
)

from golang_etl_spark.registry import register
from golang_etl_spark.sources.sinks import SEED_DATA_LEN, SEED_ROWS

DEFAULT_STRIDE = 10_000  # the reference's fixed chunk size


class RangeChunk(InputPartition):
    """One half-open key range [start, end) — the unit the driver
    plans and a single task reads."""

    def __init__(self, start: int, end: int):
        self.start, self.end = start, end


class RangeShardReader(DataSourceReader):
    def __init__(self, options):
        self.lower = int(options.get("lower", 1))
        self.upper = int(options.get("upper", SEED_ROWS + 1))  # exclusive
        self.stride = int(options.get("stride", DEFAULT_STRIDE))
        if self.stride <= 0 or self.lower > self.upper:
            # bounds sanity guard (extractor.go:50-53)
            raise ValueError(
                f"bad range plan: [{self.lower}, {self.upper}) "
                f"stride {self.stride}"
            )

    def partitions(self) -> list[InputPartition]:
        """planChunks: fixed stride, last chunk clamped — NEVER one
        monolithic partition (that is the whole point of S1/X1)."""
        return [
            RangeChunk(s, min(s + self.stride, self.upper))
            for s in range(self.lower, self.upper, self.stride)
        ]

    def read(self, partition: RangeChunk):
        """One chunk's rows, computed inside the task. Deterministic
        seed formula — matches sinks.seed_table byte-for-byte."""
        import hashlib

        for i in range(partition.start, partition.end):
            yield (
                i,
                hashlib.md5(str(i).encode()).hexdigest()[:SEED_DATA_LEN],
            )


class RangeShardDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "range_shard"

    def schema(self) -> str:
        return "id bigint, data string"

    def reader(self, schema) -> DataSourceReader:
        return RangeShardReader(self.options)


import weakref

# weak refs, not id(spark): CPython reuses a freed object's id, so an
# id()-keyed memo can silently skip registration on a NEW session that
# happens to land on a dead session's address
_DS_REGISTERED: "weakref.WeakSet[SparkSession]" = weakref.WeakSet()


def ensure_registered(spark: SparkSession) -> None:
    """Register the source once per SparkSession (re-registration under
    the same name raises)."""
    if spark not in _DS_REGISTERED:
        spark.dataSource.register(RangeShardDataSource)
        _DS_REGISTERED.add(spark)


def read_range_shard(
    spark: SparkSession,
    lower: int = 1,
    upper: int = SEED_ROWS + 1,
    stride: int = DEFAULT_STRIDE,
) -> DataFrame:
    ensure_registered(spark)
    return (
        spark.read.format("range_shard")
        .option("lower", lower)
        .option("upper", upper)
        .option("stride", stride)
        .load()
    )


_PYDS_STRIDE = 1_000  # 10 chunks over the 10k-row seed range

_PYDS_ORACLE = f"""
WITH src AS (
  SELECT id, substr(md5(id::VARCHAR), 1, {SEED_DATA_LEN}) AS data
  FROM range(1, {SEED_ROWS + 1}) t(id)
)
SELECT CAST((id - 1) // {_PYDS_STRIDE} AS INT) AS chunk_id,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(MIN(id) AS BIGINT) AS min_id,
       CAST(MAX(id) AS BIGINT) AS max_id,
       CAST(SUM(('0x' || substr(data, 1, 8))::BIGINT) AS BIGINT)
         AS data_checksum
FROM src
GROUP BY 1
"""


@register(
    "source_python_datasource",
    oracle=_PYDS_ORACLE,
    tags=("source", "etl-parity"),
)
def source_python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Read through the custom Python DataSource and summarize each
    planned chunk (row count, id bounds, content checksum) — the
    chunk_id reconstructed from the id proves every chunk arrived
    complete and the checksum pins the task-side row synthesis to the
    oracle's SQL formula."""
    df = read_range_shard(spark, stride=_PYDS_STRIDE)
    return (
        df.groupBy(
            ((F.col("id") - 1) / _PYDS_STRIDE).cast("int").alias("chunk_id")
        )
        .agg(
            F.count("*").alias("n_rows"),
            F.min("id").alias("min_id"),
            F.max("id").alias("max_id"),
            F.sum(
                F.conv(F.substring("data", 1, 8), 16, 10).cast("bigint")
            ).alias("data_checksum"),
        )
    )

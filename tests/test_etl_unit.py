"""Unit tests for the pure planning/config layer — no SparkSession.

Covers SURVEY.md §5.3: partition-bounds math (including the
reference's maxKey+1 half-open fixup, /root/reference/extractor.go:
276-279), the YAML-schema -> StructType loader (replacing
/root/reference/schema/read_schema.go), and JDBC option synthesis.
"""

import pytest
from pyspark.sql import types as T

from golang_etl_spark.etl import (
    RangePartitionPlan,
    jdbc_scan_options,
    plan_range_partitions,
)
from golang_etl_spark.jobspec import JobSpec, load_schema_yaml, parse_tag


class TestRangePartitioning:
    def test_reference_shape_1m_rows_stride_10k(self):
        # the reference's workload: keys 1..1_000_000, stride 10_000
        # -> ~100 chunks (extractor.go:270), upper bound maxKey+1
        plan = plan_range_partitions(1, 1_000_000, stride=10_000)
        assert plan.lower_bound == 1
        assert plan.upper_bound == 1_000_001  # half-open fixup
        assert plan.num_partitions == 100
        assert plan.stride == 10_000

    def test_single_chunk_small_range(self):
        plan = plan_range_partitions(5, 7, stride=10_000)
        assert plan.num_partitions == 1
        assert plan.upper_bound == 8

    def test_max_key_included(self):
        # span exactly divisible by stride still covers max_key
        plan = plan_range_partitions(0, 9_999, stride=10_000)
        assert plan.num_partitions == 1
        assert plan.upper_bound == 10_000

    def test_partition_cap_regrows_stride(self):
        # at 100 TB key spans the cap kicks in: fewer, bigger chunks
        plan = plan_range_partitions(0, 10_000_000 - 1, stride=10, max_partitions=64)
        assert plan.num_partitions == 64
        assert plan.stride * plan.num_partitions >= 10_000_000

    def test_empty_range_rejected(self):
        # the reference silently skips inverted bounds
        # (extractor.go:50-53); we fail loudly
        with pytest.raises(ValueError, match="empty key range"):
            plan_range_partitions(10, 5)

    def test_jdbc_options_cap_concurrency(self):
        # numPartitions is also the DB-connection cap — parity with the
        # 20-slot fetch semaphore (extractor.go:267)
        plan = RangePartitionPlan(1, 1_000_001, 100, 10_000)
        opts = jdbc_scan_options("jdbc:mysql://h/db", "t", "id", plan, 20)
        assert opts["numPartitions"] == "20"
        assert opts["lowerBound"] == "1"
        assert opts["upperBound"] == "1000001"
        assert opts["partitionColumn"] == "id"


class TestSchemaLoader:
    def test_parse_tag(self):
        tag = "name=data, type=BYTE_ARRAY, convertedtype=UTF8, repetitiontype=REQUIRED"
        assert parse_tag(tag) == {
            "name": "data",
            "type": "BYTE_ARRAY",
            "convertedtype": "UTF8",
            "repetitiontype": "REQUIRED",
        }

    def test_reference_schema_roundtrip(self, tmp_path):
        # mirrors /root/reference/schema/db.yaml verbatim
        p = tmp_path / "db.yaml"
        p.write_text(
            "schema:\n"
            '  tag: "name=parquet_go_root"\n'
            "  fields:\n"
            '    - tag: "name=id, type=INT64, repetitiontype=REQUIRED"\n'
            '    - tag: "name=data, type=BYTE_ARRAY, convertedtype=UTF8, repetitiontype=REQUIRED"\n'
        )
        st = load_schema_yaml(str(p))
        assert st == T.StructType(
            [
                T.StructField("id", T.LongType(), nullable=False),
                T.StructField("data", T.StringType(), nullable=False),
            ]
        )

    def test_unsupported_type_fails_loudly(self, tmp_path):
        p = tmp_path / "bad.yaml"
        p.write_text('schema:\n  fields:\n    - tag: "name=x, type=INT96"\n')
        with pytest.raises(ValueError, match="unsupported schema type"):
            load_schema_yaml(str(p))


class TestJobSpec:
    def test_from_yaml_defaults_are_reference_constants(self, tmp_path):
        p = tmp_path / "job.yaml"
        p.write_text(
            "shards:\n  jerry: /data/jerry\n"
            "jobs:\n  - {table: big_table_1, output: /out/jerry, primary_key: id, db: jerry}\n"
            "source_format: parquet\n"
        )
        spec = JobSpec.from_yaml(str(p))
        assert spec.stride == 10_000  # extractor.go:270
        assert spec.max_records_per_file == 100_000  # extractor.go:119
        assert spec.compression == "snappy"  # extractor.go:290
        assert spec.fetch_concurrency == 20  # extractor.go:267
        assert spec.jobs[0].table == "big_table_1"
        assert spec.shards["jerry"] == "/data/jerry"

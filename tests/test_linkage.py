"""Record-linkage semantics: match quality and why multi-probe
blocking is load-bearing."""

from __future__ import annotations

from pyspark.sql import functions as F

from golang_etl_spark.registry import all_queries


def _linked(spark, sf_dir):
    return all_queries()["etl_record_linkage"].fn(spark, sf_dir)


def test_linkage_matches_nearly_all_records(spark, sf_dir):
    got = _linked(spark, sf_dir)
    stats = got.agg(
        F.count("*").alias("n"),
        F.avg("is_correct").alias("acc"),
        F.max("n_candidates").alias("maxc"),
    ).collect()[0]
    # every kept CRM record resolves to exactly one match
    n_crm = (
        spark.read.parquet(f"{sf_dir}/customer.parquet")
        .filter(F.expr("c_custkey % 10 < 7"))
        .count()
    )
    assert stats["n"] == n_crm
    # additive noise + a missing field must not break linkage
    assert stats["acc"] >= 0.95
    # blocking keeps candidate lists tiny — never a broad scan
    assert stats["maxc"] <= 50


def test_linkage_adjacent_bucket_probe_is_needed(spark, sf_dir):
    # at least one correctly-linked noisy record sits in a DIFFERENT
    # balance bucket than its canonical row — only the off=+/-1 probes
    # can have found it, so this pins the multi-probe blocking as
    # load-bearing rather than decorative
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        "c_custkey", F.round("c_acctbal").cast("int").alias("bal")
    )
    crossers = (
        _linked(spark, sf_dir)
        .filter("is_correct = 1")
        .join(cust, F.col("crm_id") == cust.c_custkey)
        .filter("crm_id % 5 = 0")  # noisy records: crm bal = bal + 1
        .filter(
            F.floor((F.col("bal") + 1) / F.lit(100.0))
            != F.floor(F.col("bal") / F.lit(100.0))
        )
        .count()
    )
    assert crossers >= 1

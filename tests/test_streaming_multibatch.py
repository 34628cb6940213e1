"""Multi-micro-batch regression for the stateful streaming operator.

The update-mode memory sink appends every micro-batch's emissions, so a
user whose events span several batches appears several times in the raw
sink table. streaming_stateful_user_stats must still equal the batch
GROUP BY — the last-emission dedup inside the pipeline is what this
file proves (the fixture's single file can't: AvailableNow processes it
as one batch, emitting each user exactly once).
"""

from pyspark.sql import functions as F

from golang_etl_spark.streaming.jobs import (
    _stream_events,
    stateful_user_stats_pipeline,
)


def test_stateful_stats_survive_multiple_batches(spark, sf_dir, tmp_path):
    # split the fixture into 2 raw parquet files (preserving whatever
    # ts physical type the fixture vintage uses — _stream_events
    # adapts) so maxFilesPerTrigger=1 forces 2 batches
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = spark.read.parquet(f"{sf_dir}/events.parquet")
    split_dir = str(tmp_path / "events_split")
    raw.repartition(2).write.mode("overwrite").parquet(split_dir)
    n_files = len(
        [f for f in __import__("os").listdir(split_dir) if f.endswith(".parquet")]
    )
    assert n_files >= 2, "need >=2 files to force multiple micro-batches"

    ev = _stream_events(
        spark, sf_dir, max_files_per_trigger=1, dir_override=split_dir
    )
    got = stateful_user_stats_pipeline(ev)

    from golang_etl_spark.sources.catalog import load_table

    want = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.max("value"), 4).alias("max_value"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
    )
    # row-count equality proves the per-batch duplicate emissions were
    # deduplicated; exceptAll proves the LAST emission (full totals)
    # won, not an intermediate one. max/total compare after round(4) —
    # same tolerance the oracle uses (accumulation-order differences).
    assert got.count() == want.count()
    assert (
        got.withColumn("total_value", F.round("total_value", 4))
        .exceptAll(want)
        .count()
        == 0
    )


def test_foreachbatch_sink_is_idempotent_per_batch(spark, sf_dir, tmp_path):
    """Multi-batch foreachBatch parquet sink: every source row lands
    exactly once, and re-running a batch's write (simulated retry)
    does not duplicate rows."""
    import os

    from golang_etl_spark.streaming.jobs import foreachbatch_parquet_sink

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = spark.read.parquet(f"{sf_dir}/events.parquet")
    split_dir = str(tmp_path / "events_split")
    raw.repartition(3).write.mode("overwrite").parquet(split_dir)

    ev = _stream_events(
        spark, sf_dir, max_files_per_trigger=1, dir_override=split_dir
    )
    out = str(tmp_path / "sunk")
    foreachbatch_parquet_sink(ev, out)

    batch_dirs = [d for d in os.listdir(out) if d.startswith("batch_id=")]
    assert len(batch_dirs) >= 2, "expected multiple micro-batches"
    sunk = spark.read.parquet(out)
    assert sunk.count() == raw.count()
    assert sunk.select("event_id").distinct().count() == raw.count()

    # simulated retry of batch 0: overwrite semantics keep it
    # idempotent. Materialize the batch before rewriting its own
    # directory (a lazy self-overwrite would race the delete).
    b0_rows = spark.read.parquet(f"{out}/batch_id=0")
    b0 = spark.createDataFrame(b0_rows.collect(), b0_rows.schema)
    n0 = b0.count()
    b0.write.mode("overwrite").parquet(f"{out}/batch_id=0")
    assert spark.read.parquet(out).count() == raw.count()
    assert spark.read.parquet(f"{out}/batch_id=0").count() == n0

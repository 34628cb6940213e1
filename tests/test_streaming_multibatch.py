"""Multi-micro-batch regression for the stateful streaming operator.

The update-mode memory sink appends every micro-batch's emissions, so a
user whose events span several batches appears several times in the raw
sink table. streaming_stateful_user_stats must still equal the batch
GROUP BY — the last-emission dedup inside the pipeline is what this
file proves (the fixture's single file can't: AvailableNow processes it
as one batch, emitting each user exactly once).
"""

import os
import time

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from golang_etl_spark.sources.catalog import load_table
from golang_etl_spark.streaming.jobs import (
    _stream_events,
    dedup_counts_pipeline,
    session_window_pipeline,
    stateful_user_stats_pipeline,
    stream_stream_join_pipeline,
)


def _write_time_chunks(sf_dir, out_dir, n_chunks, copies=1):
    """Split the events fixture into ``n_chunks`` time-ordered parquet
    files (×``copies`` interleaved duplicates) with strictly increasing
    mtimes, so the file stream source with maxFilesPerTrigger=1 yields
    chronological micro-batches. Chronological order keeps watermark
    eviction honest: state needed by a later batch is never behind the
    watermark, exactly like a live stream."""
    os.makedirs(out_dir, exist_ok=True)
    tbl = pq.read_table(f"{sf_dir}/events.parquet")
    tbl = tbl.sort_by("ts")
    n = tbl.num_rows
    bounds = [round(i * n / n_chunks) for i in range(n_chunks + 1)]
    paths = []
    for i in range(n_chunks):
        chunk = tbl.slice(bounds[i], bounds[i + 1] - bounds[i])
        for c in range(copies):
            p = os.path.join(out_dir, f"chunk{i:03d}_copy{c}.parquet")
            pq.write_table(chunk, p)
            paths.append(p)
    base = time.time() - len(paths) - 10
    for k, p in enumerate(paths):
        os.utime(p, (base + k, base + k))
    return len(paths)


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


def test_dedup_state_spans_batches(spark, sf_dir, tmp_path):
    """Duplicate copies of every event arrive in DIFFERENT micro-batches
    (2 time chunks x 2 copies = 4 single-file batches): intra-batch
    dropDuplicates alone cannot dedup them — only the cross-batch state
    store can. Counts must equal the plain batch per-type counts."""
    split_dir = str(tmp_path / "events_dup")
    n_files = _write_time_chunks(sf_dir, split_dir, n_chunks=2, copies=2)
    assert n_files == 4

    ev = _stream_events(
        spark, sf_dir, max_files_per_trigger=1, dir_override=split_dir
    )
    got = dedup_counts_pipeline(ev)

    want = (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.count("*").alias("n_events"))
    )
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_session_windows_merge_across_batches(spark, sf_dir, tmp_path):
    """3 chronological micro-batches: sessions straddling a chunk
    boundary exist only if the session-merge state store extends a
    session opened in an earlier batch. Result must equal the batch
    session_window aggregation over the whole fixture."""
    split_dir = str(tmp_path / "events_sess")
    assert _write_time_chunks(sf_dir, split_dir, n_chunks=3) == 3

    ev = _stream_events(
        spark, sf_dir, max_files_per_trigger=1, dir_override=split_dir
    )
    got = session_window_pipeline(ev)

    want = (
        load_table(spark, sf_dir, "events")
        .groupBy(F.session_window("ts", "30 minutes").alias("win"), "user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .select(
            "user_id",
            F.col("win.start").alias("session_start"),
            F.col("win.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )
    assert got.count() == want.count()
    assert got.exceptAll(want).count() == 0


def test_stream_stream_join_spans_batches(spark, sf_dir, tmp_path):
    """3 chronological micro-batches: a click near a chunk boundary
    pairs with a purchase in the NEXT batch only through the two-stream
    join state store. Pair counts must equal the batch interval join."""
    split_dir = str(tmp_path / "events_ssj")
    assert _write_time_chunks(sf_dir, split_dir, n_chunks=3) == 3

    ev = _stream_events(
        spark, sf_dir, max_files_per_trigger=1, dir_override=split_dir
    )
    got = stream_stream_join_pipeline(ev)

    base = load_table(spark, sf_dir, "events")
    clicks = base.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("click_ts")
    )
    purchases = base.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user_id"), F.col("ts").alias("purchase_ts")
    )
    want = (
        clicks.join(
            purchases,
            (F.col("p_user_id") == F.col("user_id"))
            & (F.col("purchase_ts") >= F.col("click_ts"))
            & (
                F.col("purchase_ts")
                <= F.col("click_ts") + F.expr("INTERVAL 10 MINUTES")
            ),
        )
        .groupBy("user_id")
        .agg(F.count("*").alias("n_pairs"))
    )
    assert got.count() == want.count()
    assert got.exceptAll(want).count() == 0


def test_foreachbatch_sink_at_bench_scale(spark, tmp_path):
    """VERDICT stretch: the foreachBatch parquet sink over the sf0.1
    events fixture (~100k rows), multi-batch, with a forced batch-0
    retry — per-batch overwrite idempotence must hold at bench scale,
    not just on the 1k-row smoke fixture."""
    import os

    from golang_etl_spark.streaming.jobs import foreachbatch_parquet_sink

    sf_big = "/root/testdata/sf0.1"
    if not os.path.exists(f"{sf_big}/events.parquet"):
        import pytest

        pytest.skip("sf0.1 fixture absent")

    split_dir = str(tmp_path / "events_big")
    assert _write_time_chunks(sf_big, split_dir, n_chunks=3) == 3
    n_src = load_table(spark, sf_big, "events").count()

    ev = _stream_events(
        spark, sf_big, max_files_per_trigger=1, dir_override=split_dir
    )
    out = str(tmp_path / "sunk_big")
    foreachbatch_parquet_sink(ev, out)

    batch_dirs = [d for d in os.listdir(out) if d.startswith("batch_id=")]
    assert len(batch_dirs) == 3
    assert spark.read.parquet(out).count() == n_src

    # forced retry: replay batch 0's write over its own directory
    b0_rows = spark.read.parquet(f"{out}/batch_id=0")
    b0 = spark.createDataFrame(b0_rows.collect(), b0_rows.schema)
    n0 = b0.count()
    b0.write.mode("overwrite").parquet(f"{out}/batch_id=0")
    assert spark.read.parquet(out).count() == n_src
    assert spark.read.parquet(f"{out}/batch_id=0").count() == n0
    assert (
        spark.read.parquet(out).select("event_id").distinct().count() == n_src
    )


def test_watermarked_dedup_state_spans_batches(spark, sf_dir, tmp_path):
    """dropDuplicatesWithinWatermark with duplicate copies in different
    micro-batches: chronological chunks keep each copy inside the
    1-hour watermark window of its original, so the bounded-state
    dedup must still remove every copy."""
    from golang_etl_spark.streaming.jobs import dedup_ttl_counts_pipeline

    split_dir = str(tmp_path / "events_ttl")
    n_files = _write_time_chunks(sf_dir, split_dir, n_chunks=2, copies=2)
    assert n_files == 4

    ev = _stream_events(
        spark, sf_dir, max_files_per_trigger=1, dir_override=split_dir
    )
    got = dedup_ttl_counts_pipeline(ev)

    want = (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.count("*").alias("n_events"))
    )
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_tws_pipeline_if_available(spark, sf_dir):
    """transformWithStateInPandas variant — runs only where Spark 4's
    state-server dependency (protobuf) exists; elsewhere the query is
    unregistered (gated, not stubbed)."""
    import pytest

    from golang_etl_spark.streaming import jobs

    if not (jobs._HAS_TWS and jobs._tws_available()):
        pytest.skip("transformWithStateInPandas deps absent (protobuf)")
    got = jobs.streaming_tws_user_stats(spark, sf_dir)
    want = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.max("value"), 4).alias("max_value"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
    )
    assert got.count() == want.count()


def test_cdc_apply_converges_across_batches(spark, sf_dir, tmp_path):
    """3-batch CDC apply equals the single-pass per-key argmax: the
    last-writer-wins merge is arrival-order-independent, so splitting
    the feed into micro-batches must not change the final snapshot.
    Also proves intermediate versions exist (one per batch)."""
    import os

    from pyspark.sql.window import Window

    from golang_etl_spark.streaming.jobs import cdc_apply_pipeline

    split_dir = str(tmp_path / "events_split")
    n_files = _write_time_chunks(sf_dir, split_dir, 3)
    assert n_files == 3

    ev = _stream_events(
        spark, sf_dir, max_files_per_trigger=1, dir_override=split_dir
    )
    out_root = str(tmp_path / "cdc_snapshots")
    os.makedirs(out_root, exist_ok=True)
    got = cdc_apply_pipeline(ev, out_root)

    versions = [d for d in os.listdir(out_root) if d.startswith("v")]
    assert len(versions) == 3, f"one snapshot version per batch: {versions}"

    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    want = (
        events.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("event_type").alias("last_event_type"),
            F.col("ts").alias("last_ts"),
        )
    )
    assert got.count() == want.count()
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_checkpoint_recovery_resumes_state_and_offsets(spark, sf_dir, tmp_path):
    """Kill/restart semantics: a second run over the SAME checkpoint
    must (a) skip files already committed to the source log instead of
    reprocessing them, and (b) restore the dropDuplicates state store,
    so duplicates arriving AFTER the restart of rows seen BEFORE it
    are still dropped. This is the recovery property a 100 TB
    always-on pipeline actually relies on — exactly-once across
    process death, not just within one run."""
    split = str(tmp_path / "stream_in")
    os.makedirs(split)
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")

    tbl = pq.read_table(f"{sf_dir}/events.parquet").sort_by("ts")
    n = tbl.num_rows
    half = n // 2
    c0, c1 = tbl.slice(0, half), tbl.slice(half)
    pq.write_table(c0, f"{split}/c0.parquet")

    def run_once():
        ev = _stream_events(
            spark, sf_dir, max_files_per_trigger=1, dir_override=split
        )
        dd = ev.dropDuplicates(["event_id"])  # no watermark: keep all state

        def _sink(batch_df, batch_id):
            batch_df.write.mode("overwrite").parquet(
                f"{out}/batch_id={batch_id}"
            )

        q = (
            dd.writeStream.foreachBatch(_sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run_once()
    assert spark.read.parquet(out).count() == half
    batches_before = {d for d in os.listdir(out) if d.startswith("batch_id=")}

    # restart input: an exact duplicate of chunk 0 plus the new chunk 1
    pq.write_table(c0, f"{split}/c0_dup.parquet")
    pq.write_table(c1, f"{split}/c1.parquet")
    run_once()

    got = spark.read.parquet(out)
    # c0 was not reprocessed (offsets) and c0_dup was fully dropped by
    # the RESTORED state store (batch-2 dropDuplicates alone couldn't
    # know about chunk-0 ids from the first run)
    assert got.count() == n
    assert got.select("event_id").distinct().count() == n
    # the first run's batch directories were left untouched
    after = {d for d in os.listdir(out) if d.startswith("batch_id=")}
    assert batches_before <= after and len(after) > len(batches_before)


def test_index_probe_spans_batches(spark, sf_dir, tmp_path):
    """Incoming docs split into 3 files -> 3 micro-batches through the
    persisted-index probe; the unioned matches must equal the batch
    probe exactly (every batch probes the same store, so chunking the
    arrival changes nothing)."""
    from golang_etl_spark.operators.dedup import (
        _IS_BATCH_SQL,
        dedup_index_probe,
    )
    from golang_etl_spark.streaming.jobs import (
        _DOCS_SCHEMA,
        index_probe_pipeline,
    )

    incoming = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .filter(F.expr(_IS_BATCH_SQL))
    )
    split_dir = str(tmp_path / "docs_split")
    incoming.repartition(3).write.mode("overwrite").parquet(split_dir)

    docs = (
        spark.readStream.schema(_DOCS_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(split_dir)
    )
    cached_before = len(spark.sparkContext._jsc.getPersistentRDDs())
    got = index_probe_pipeline(docs, sf_dir, str(tmp_path / "probe_out"))
    # the probe is cache-free by contract: running inside foreachBatch
    # it must not accumulate persisted partitions per micro-batch
    assert (
        len(spark.sparkContext._jsc.getPersistentRDDs()) <= cached_before
    )
    want = dedup_index_probe(spark, sf_dir)
    g = {tuple(r) for r in got.collect()}
    w = {tuple(r) for r in want.collect()}
    assert g == w and len(w) > 0


def test_cms_delta_ingest_is_chunking_invariant(spark, sf_dir, tmp_path):
    """Events split into 3 files -> 3 micro-batch CMS deltas; the
    merged counter table must equal the one-pass batch build EXACTLY
    (counter linearity), and estimates must overestimate-only vs exact
    per-user counts — however arrival was chunked."""
    from golang_etl_spark.operators.sketches import _cms_cells
    from golang_etl_spark.streaming.jobs import stream_cms_ingest

    raw = spark.read.parquet(f"{sf_dir}/events.parquet")
    split_dir = str(tmp_path / "events_split")
    raw.repartition(3).write.mode("overwrite").parquet(split_dir)

    ev = (
        spark.readStream.schema(raw.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(split_dir)
    )
    merged = stream_cms_ingest(ev, str(tmp_path / "cms_out"))
    got = {r["cell"]: r["cnt"] for r in merged.collect()}
    want = {
        r["cell"]: r["cnt"]
        for r in _cms_cells(raw.select("user_id"), "user_id").collect()
    }
    assert got == want
    # overestimate-only: min-over-depth vs the exact group-by
    exact = {
        r["user_id"]: r["n"]
        for r in raw.groupBy("user_id").agg(F.count("*").alias("n")).collect()
    }
    from pyspark.sql import functions as SF
    from golang_etl_spark.operators.sketches import _cms_hash_cells

    probes = spark.createDataFrame(
        [(u,) for u in sorted(exact)[:20]], "user_id long"
    )
    cells = probes.select(
        "user_id", SF.explode(_cms_hash_cells("user_id")).alias("cell")
    )
    mdf = spark.createDataFrame(
        [(c, n) for c, n in got.items()], "cell long, cnt long"
    )
    est = {
        r["user_id"]: r["est"]
        for r in cells.join(mdf, "cell", "left")
        .groupBy("user_id")
        .agg(SF.min(SF.coalesce(SF.col("cnt"), SF.lit(0))).alias("est"))
        .collect()
    }
    for u, e in est.items():
        assert e >= exact[u]

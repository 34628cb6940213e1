"""Sink matrix: parquet (reference parity), CSV, JSON — plus the
seeder re-expressed (S8) and shard-union mode (X7).

Reference sinks: snappy parquet only, 100k-row batches with a per-row
JSON marshal round-trip (/root/reference/extractor.go:114-193) — the
JSON hop disappears here (Spark writes parquet natively, vectorized).
CSV/JSON are new surface the reference lacks (SURVEY.md §2.1: "No
CSV/JSON/ORC/Avro" sources or sinks).

Scale notes (100 TB stance): every writer is a plain DataFrameWriter
action — file-per-task, ``maxRecordsPerFile`` bounding file size, no
driver-side materialization anywhere. Readers hand Spark a directory
and let the file index split/parallelize.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from golang_etl_spark.registry import register
from golang_etl_spark.session import DEFAULT_MAX_RECORDS_PER_FILE
from golang_etl_spark.sources.catalog import load_table


def write_parquet(
    df: DataFrame,
    path: str,
    compression: str = "snappy",
    max_records_per_file: int = DEFAULT_MAX_RECORDS_PER_FILE,
    mode: str = "overwrite",
) -> None:
    """Parity sink (S4/S5): snappy parquet, bounded rows per file —
    the reference's 100k-row batch files (extractor.go:119-123)
    without the JSON round-trip (extractor.go:141, its documented
    inefficiency)."""
    (
        df.write.mode(mode)
        .option("compression", compression)
        .option("maxRecordsPerFile", str(max_records_per_file))
        .parquet(path)
    )


def write_csv(
    df: DataFrame, path: str, header: bool = True, mode: str = "overwrite"
) -> None:
    df.write.mode(mode).option("header", str(header).lower()).csv(path)


def write_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).json(path)


def write_orc(
    df: DataFrame,
    path: str,
    compression: str = "snappy",
    mode: str = "overwrite",
) -> None:
    """ORC sink — same writer surface as parquet (columnar, splittable,
    predicate-pushdown-capable); the reference has neither (SURVEY.md
    §2.1), added for source/sink matrix completeness."""
    df.write.mode(mode).option("compression", compression).orc(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.orc(path)


def read_csv(spark: SparkSession, path: str, schema: str) -> DataFrame:
    """Explicit schema, never inferSchema — schema inference reads the
    data twice and guesses; at 100 TB both are unacceptable."""
    return spark.read.schema(schema).option("header", "true").csv(path)


def read_json(spark: SparkSession, path: str, schema: str) -> DataFrame:
    return spark.read.schema(schema).json(path)


# ---------------------------------------------------------------------------
# Seeder (S8) re-expressed: deterministic, distributed, no RNG state.
# ---------------------------------------------------------------------------
SEED_ROWS = 10_000
SEED_DATA_LEN = 20


def seed_table(spark: SparkSession, n_rows: int = SEED_ROWS) -> DataFrame:
    """The reference seeder (/root/reference/tmp/data_seed.go:23-73)
    generates (id AUTO_INCREMENT, 20-char random string) rows, seeded
    from the wall clock — not reproducible. Re-expression:
    spark.range (distributed, no driver loop) + md5-derived strings —
    deterministic by construction, same shape. ``df.write.jdbc`` (or
    any sink above) replaces the 1000-row INSERT batching."""
    return spark.range(1, n_rows + 1).select(
        F.col("id"),
        F.substring(F.md5(F.col("id").cast("string")), 1, SEED_DATA_LEN).alias(
            "data"
        ),
    )


def seed_jdbc_options(
    url: str,
    table: str,
    batch_size: int = 1_000,
    write_concurrency: int = 20,
) -> dict[str, str]:
    """Options for the seeder's ``df.write.jdbc`` — the declarative
    equivalent of the reference's 1000-row multi-value INSERT loop
    (/root/reference/tmp/data_seed.go:51-69). ``batchsize`` replays the
    1000-row batching; ``numPartitions`` caps concurrent connections
    (the write-semaphore role, extractor.go:268)."""
    return {
        "url": url,
        "dbtable": table,
        "batchsize": str(batch_size),
        "numPartitions": str(write_concurrency),
        # bulk seed of a fresh table: no need for txn isolation overhead
        "isolationLevel": "NONE",
    }


def seed_shard(
    spark: SparkSession,
    spec,
    job,
    n_rows: int = SEED_ROWS,
    mode: str = "overwrite",
) -> None:
    """Seed one shard's table behind the JobSpec — the full round-trip
    of /root/reference/tmp/data_seed.go:23-73 (which CREATEs the table
    then bulk-INSERTs; overwrite mode reproduces the fresh-table
    semantics). JDBC shards get ``df.write.jdbc`` (batched inserts);
    parquet/file shards write the same frame as parquet so the fixture
    path stays testable without a live database."""
    df = seed_table(spark, n_rows)
    location = spec.shards[job.db]
    if spec.source_format == "parquet":
        write_parquet(
            df,
            f"{location}/{job.table}.parquet",
            compression=spec.compression,
            max_records_per_file=spec.max_records_per_file,
            mode=mode,
        )
        return
    opts = seed_jdbc_options(
        location, job.table, write_concurrency=spec.fetch_concurrency
    )
    df.repartition(int(opts["numPartitions"])).write.format("jdbc").options(
        **opts
    ).mode(mode).save()


_SEED_ORACLE = f"""
SELECT id,
       substr(md5(id::VARCHAR), 1, {SEED_DATA_LEN}) AS data
FROM range(1, {SEED_ROWS + 1}) t(id)
"""


@register("etl_seed_generator", oracle=_SEED_ORACLE, tags=("etl-parity", "source"))
def etl_seed_generator(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S8 parity: the synthetic (id, 20-char string) source table,
    deterministic and distributed (spark.range partitions the id space
    across executors; no RNG, no driver loop)."""
    return seed_table(spark)


# ---------------------------------------------------------------------------
# Shard-union mode (X7).
# ---------------------------------------------------------------------------
_SHARD_UNION_ORACLE = """
WITH both_shards AS (
  SELECT * FROM lineitem WHERE l_orderkey % 2 = 0
  UNION ALL
  SELECT * FROM lineitem WHERE l_orderkey % 2 = 1
)
SELECT l_returnflag,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_orders
FROM both_shards
GROUP BY l_returnflag
"""


@register("etl_shard_union", oracle=_SHARD_UNION_ORACLE, tags=("etl-parity", "setops"))
def etl_shard_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X7 parity: the prototype's shard fan-in
    (/root/reference/tmp/df_extractor.go:187-194) — two identical-
    schema shard scans merged with unionByName (here: even/odd
    l_orderkey halves standing in for the jerry/pikachu shards), then
    aggregated to prove no rows were lost or duplicated in the union.
    Union is a zero-shuffle operator: partitions concatenate."""
    li = load_table(spark, sf_dir, "lineitem")
    shard_a = li.filter(F.col("l_orderkey") % 2 == 0)
    shard_b = li.filter(F.col("l_orderkey") % 2 == 1)
    return (
        shard_a.unionByName(shard_b)
        .groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n_rows"),
            F.countDistinct("l_orderkey").alias("n_orders"),
        )
    )


def compact_dir(
    spark: SparkSession,
    path: str,
    target_files: int,
    compression: str = "snappy",
) -> None:
    """Small-files compaction: rewrite a parquet directory into
    ``target_files`` files. The operational fix for the classic
    long-running-pipeline failure mode — thousands of tiny batch/
    streaming output files turning every downstream scan into a
    file-listing storm.

    ``coalesce`` (not ``repartition``): compaction must not pay a
    shuffle — it narrows existing partitions into fewer write tasks.
    The rewrite lands in ``path + '.compact'`` then swaps via two
    renames. The swap is NOT atomic: there is a brief window where
    ``path`` is absent, and a reader racing through it fails cleanly
    (no half-written mix is ever visible, but pause readers around
    compaction). A leftover ``.old`` backup from a previous crashed
    run is reclaimed on entry, so the operation is re-runnable. At
    production scale this swap belongs to a table format with a
    manifest (Delta/Iceberg ``rewriteDataFiles``); plain parquet
    directories have no atomic multi-file commit."""
    import os
    import shutil

    staged = path.rstrip("/") + ".compact"
    backup = path.rstrip("/") + ".old"
    # recover from a previous run that crashed mid-swap
    if os.path.exists(backup):
        if not os.path.exists(path):
            os.rename(backup, path)  # crashed between the two renames
        else:
            shutil.rmtree(backup)  # crashed before backup cleanup
    (
        spark.read.parquet(path)
        .coalesce(target_files)
        .write.mode("overwrite")
        .option("compression", compression)
        .parquet(staged)
    )
    os.rename(path, backup)
    os.rename(staged, path)
    shutil.rmtree(backup)


def read_parquet_evolved(spark: SparkSession, path: str) -> DataFrame:
    """Schema-evolution read: ``mergeSchema`` unions the schemas of
    every file in the directory, so files written before a column was
    added scan with NULLs in the new column instead of failing. The
    per-file footer-merge is the Spark-native answer to additive
    schema drift in long-lived sink directories (the reference pins
    one YAML schema forever — SURVEY.md §1.2)."""
    return spark.read.option("mergeSchema", "true").parquet(path)


# ---------------------------------------------------------------------------
# Format-matrix round-trip (CSV / JSON / ORC), driver-checkable.
# ---------------------------------------------------------------------------
_FMT_ORACLE = """
WITH agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
         CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_orders,
         ROUND(SUM(l_quantity), 4) AS sum_qty,
         ROUND(SUM(l_extendedprice), 2) AS sum_price
  FROM lineitem WHERE l_orderkey < 1000
)
SELECT fmt, n_rows, n_orders, sum_qty, sum_price
FROM agg, (VALUES ('csv'), ('json'), ('orc')) t(fmt)
"""


@register(
    "sink_format_matrix_roundtrip", oracle=_FMT_ORACLE, tags=("sink",)
)
def sink_format_matrix_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write a lineitem slice through every non-parquet sink (CSV with
    explicit schema, JSON, ORC), read each back, and aggregate — one
    row per format, all three required to equal the original table's
    aggregate (the oracle emits the same row 3x). Proves the format
    matrix round-trips values, not just that the writers run.

    Scale shape: three file-per-task writes of a pruned slice; the
    readbacks are independent scans unioned shuffle-free; one tiny
    final aggregate."""
    from golang_etl_spark.operators.layout import _layout_dir

    cols = "l_orderkey LONG, l_quantity DOUBLE, l_extendedprice DOUBLE"
    slice_ = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") < 1000)
        .select("l_orderkey", "l_quantity", "l_extendedprice")
    )
    frames = []
    for fmt in ("csv", "json", "orc"):
        out = _layout_dir(f"fmt_{fmt}", sf_dir)
        if fmt == "csv":
            write_csv(slice_, out)
            back = read_csv(spark, out, cols)
        elif fmt == "json":
            write_json(slice_, out)
            back = read_json(spark, out, cols)
        else:
            write_orc(slice_, out)
            back = read_orc(spark, out)
        frames.append(
            back.groupBy(F.lit(fmt).alias("fmt")).agg(
                F.count("*").alias("n_rows"),
                F.countDistinct("l_orderkey").alias("n_orders"),
                F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
                F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
            )
        )
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out


# ---------------------------------------------------------------------------
# Corrupt-record CSV ingestion (PERMISSIVE mode + corrupt column).
# ---------------------------------------------------------------------------
# Every 97th event id is written as a deliberately malformed CSV line;
# the reader must keep good rows, quarantine bad ones into the corrupt
# column, and lose NOTHING — the lossless counterpart of the
# reference's silent row-drop on conversion error (extractor.go:88-91),
# at the file-format layer. The corruption rule is deterministic so
# the DuckDB oracle replays the classification arithmetically.
_CORRUPT_MOD = 97

_CSV_CORRUPT_ORACLE = f"""
SELECT CAST(COUNT(*) FILTER (WHERE event_id % {_CORRUPT_MOD} <> 0)
            AS BIGINT) AS n_good,
       CAST(COUNT(*) FILTER (WHERE event_id % {_CORRUPT_MOD} = 0)
            AS BIGINT) AS n_corrupt,
       CAST(SUM(CASE WHEN event_id % {_CORRUPT_MOD} <> 0
                     THEN event_id END) AS BIGINT) AS good_id_checksum,
       ROUND(SUM(CASE WHEN event_id % {_CORRUPT_MOD} <> 0
                      THEN value ELSE 0 END), 4) AS good_value_total
FROM events
"""


@register(
    "source_csv_corrupt_records",
    oracle=_CSV_CORRUPT_ORACLE,
    tags=("source", "etl-parity"),
)
def source_csv_corrupt_records(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PERMISSIVE CSV ingestion with a corrupt-record column: write an
    events CSV where every 97th id is a malformed line, read it back
    with an explicit schema + ``columnNameOfCorruptRecord``, and
    report good/quarantined counts with checksums over the good rows.
    Conservation law: n_good + n_corrupt = n_input — the malformed
    rows land in the quarantine column instead of vanishing (the
    reference silently drops conversion failures; this surface plus
    etl_deadletter_routing is the auditable alternative).

    100 TB shape: the parse + classification is map-side on the scan;
    PERMISSIVE mode costs nothing over FAILFAST beyond the string
    column. The corrupt rows stay queryable for the dead-letter
    pipeline instead of poisoning or aborting the load."""
    from golang_etl_spark.operators.layout import _layout_dir

    out = _layout_dir("csv_corrupt", sf_dir)
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "value"
    )
    lines = ev.select(
        F.when(
            F.col("event_id") % _CORRUPT_MOD == 0,
            F.concat(F.lit("BROKEN#"), F.col("event_id").cast("string"), F.lit("#x")),
        )
        .otherwise(
            F.concat_ws(
                ",",
                F.col("event_id").cast("string"),
                F.col("user_id").cast("string"),
                F.col("value").cast("string"),
            )
        )
        .alias("value")
    )
    lines.write.mode("overwrite").text(out)
    back = (
        spark.read.schema(
            "event_id LONG, user_id LONG, value DOUBLE, _corrupt STRING"
        )
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .csv(out)
    )
    return back.agg(
        F.count(F.when(F.col("_corrupt").isNull(), 1)).alias("n_good"),
        F.count(F.when(F.col("_corrupt").isNotNull(), 1)).alias("n_corrupt"),
        F.sum(F.when(F.col("_corrupt").isNull(), F.col("event_id"))).alias(
            "good_id_checksum"
        ),
        F.round(
            F.sum(
                F.when(F.col("_corrupt").isNull(), F.col("value")).otherwise(
                    0.0
                )
            ),
            4,
        ).alias("good_value_total"),
    )


# ---------------------------------------------------------------------------
# Parquet compression-codec matrix (the reference hardcodes snappy).
# ---------------------------------------------------------------------------
# The reference pins snappy at the writer (SURVEY.md §2.1 S4); a
# 100 TB deployment picks per-table: zstd for cold archives (~2x
# smaller), snappy/lz4 for hot scan paths (faster decode). This sink
# proves every codec round-trips values bit-exactly — same checksum
# row per codec, hash-checked against one oracle aggregate.
PARQUET_CODECS = ("snappy", "zstd", "gzip", "lz4")

_CODEC_ORACLE = f"""
WITH agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
         CAST(SUM(event_id) AS BIGINT) AS id_checksum,
         ROUND(SUM(value), 4) AS value_checksum
  FROM events
)
SELECT codec, n_rows, id_checksum, value_checksum
FROM agg, (VALUES {", ".join(f"('{c}')" for c in PARQUET_CODECS)}) t(codec)
"""


@register(
    "sink_codec_matrix", oracle=_CODEC_ORACLE, tags=("sink", "etl-parity")
)
def sink_codec_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write events under each parquet compression codec, read each
    back, and checksum: one row per codec, all equal to the source
    aggregate (the oracle emits the same row |codecs| times). The
    reference's snappy default stays the session default
    (session.py); this proves the alternatives are drop-in."""
    from golang_etl_spark.operators.layout import _layout_dir

    ev = load_table(spark, sf_dir, "events").select("event_id", "value")
    frames = []
    for codec in PARQUET_CODECS:
        out = _layout_dir(f"codec_{codec}", sf_dir)
        ev.write.mode("overwrite").option("compression", codec).parquet(out)
        back = spark.read.parquet(out)
        frames.append(
            back.agg(
                F.count("*").alias("n_rows"),
                F.sum("event_id").cast("long").alias("id_checksum"),
                F.round(F.sum("value"), 4).alias("value_checksum"),
            ).select(F.lit(codec).alias("codec"), "*")
        )
    out_df = frames[0]
    for f in frames[1:]:
        out_df = out_df.unionByName(f)
    return out_df

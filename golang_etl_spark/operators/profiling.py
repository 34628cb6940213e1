"""Data-profiling operators: per-column table profile and exact group
percentiles — the "look at the data before you train on it" surface
of a training-data pipeline.

No reference counterpart (SURVEY.md §2.5) — LLM-pipeline extension.

Scale notes (100 TB stance):
- the APPROX table profile is ONE full-scan aggregation producing a
  single row of partial-aggregable stats (counts, min/max, mergeable
  HLL distincts) that is then unpivoted driver-free with ``stack`` —
  the 100 TB formulation. The EXACT twin deliberately splits instead
  (r17, see _profile): one narrow stats pass + one Expand-free
  single-distinct leg per column, because fusing N exact distincts
  triggers Spark's Expand rewrite (N+1 input replicas) AND, with
  string min/max in the same buffer, a SortAggregate sort of the
  expanded stream. Columnar pruning keeps the split's total scan
  bytes ~2x one scan; no collect either way.
- numeric min/max are emitted as doubles and timestamps as epoch
  seconds, never stringified: string rendering of floats/timestamps is
  engine-specific and would fail the value-hash while the data agrees.
- exact percentiles (``percentile``) hold the group's values in the
  agg buffer — correct for bounded group counts like this 5-value
  priority key; for high-cardinality keys at 100 TB the scale path is
  ``approx_percentile`` (``sketch_percentile_approx``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from golang_etl_spark.operators.sampling import (
    _TOKENBUDGET_WORDS_DUCK,
    _TOKENBUDGET_WORDS_SPARK,
)
from golang_etl_spark.registry import register
from golang_etl_spark.sources.catalog import load_table

# (name, kind) for every orders column; kind drives which min/max slot
# the profile fills (num = double, ts = epoch seconds, str = lexical).
_ORDERS_COLS = [
    ("o_orderkey", "num"),
    ("o_custkey", "num"),
    ("o_orderstatus", "str"),
    ("o_totalprice", "num"),
    ("o_orderdate", "ts"),
    ("o_orderpriority", "str"),
]


def _profile_oracle(cols=None) -> str:
    """Exact-profile oracle over the given (name, kind) column list
    (default: all of ``_ORDERS_COLS``). For the hash-gated HLL probe
    below it doubles as the oracle GENERATOR of the r9/r10 exact-
    regime discipline: valid against an ``approx_count_distinct``
    pipeline ONLY when every column's cardinality sits in HLL++'s
    exact linear-counting regime (see profile_orders_approx_bounded)."""
    cols = _ORDERS_COLS if cols is None else cols
    parts = []
    for name, kind in cols:
        if kind == "num":
            mn, mx = f"MIN({name})::DOUBLE", f"MAX({name})::DOUBLE"
            ms, xs = "NULL::VARCHAR", "NULL::VARCHAR"
        elif kind == "ts":
            mn = f"epoch(MIN({name}))::DOUBLE"
            mx = f"epoch(MAX({name}))::DOUBLE"
            ms, xs = "NULL::VARCHAR", "NULL::VARCHAR"
        else:
            mn, mx = "NULL::DOUBLE", "NULL::DOUBLE"
            ms, xs = f"MIN({name})", f"MAX({name})"
        parts.append(
            f"""SELECT '{name}' AS column_name,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COUNT(*) - COUNT({name}) AS BIGINT) AS n_nulls,
       CAST(COUNT(DISTINCT {name}) AS BIGINT) AS n_distinct,
       ROUND({mn}, 6) AS min_num, ROUND({mx}, 6) AS max_num,
       {ms} AS min_str, {xs} AS max_str
FROM orders"""
        )
    return "\nUNION ALL\n".join(parts)


@register("profile_orders", oracle=_profile_oracle(), tags=("profiling",))
def profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profile of ``orders``: one output row per column with
    row/null/distinct counts and typed min/max. Single scan — all
    36 aggregates run in one pass, then ``stack`` unpivots the 1-row
    result to the long format."""
    return _profile(spark, sf_dir, _ORDERS_COLS, approx=False)


def _profile(
    spark: SparkSession, sf_dir: str, cols, *, approx: bool
) -> DataFrame:
    """Shared profile pipeline over an (name, kind) column list:
    exact ``countDistinct`` or HLL++ ``approx_count_distinct``
    (rsd=2%) per ``approx``.

    The approx variant keeps the one-pass shape: all aggregates
    (mergeable HLL sketches included) in a single narrow scan, then a
    driver-free ``stack`` unpivot.

    The exact variant used to share that shape, but N exact distincts
    in one aggregate trigger Spark's Expand rewrite — N+1 input
    replicas — and the string min/max slots make the agg buffer
    non-mutable, so the whole expanded stream runs through
    SortAggregate (sort N+1 x |orders| wide rows TWICE around the
    exchange; measured 3.4s at sf0.1 vs 0.9s for the approx twin).
    Since r17 the exact path splits instead (guide §2.3/§2.4: shuffle
    fewer bytes, remove the accidental sort): ONE narrow stats pass
    (counts + typed min/max, no distinct — empty grouping keys, so no
    sort), plus one single-distinct leg per column (each plans as the
    Expand-free two-level hash aggregate over exactly one pruned
    parquet column), assembled by a broadcast-scale join on
    column_name. Columnar pruning keeps total scan bytes ~2x ONE full
    scan, against the old plan's (N+1)x row replication + double sort
    — the same trade the union'd per-column oracle makes, now proven
    equivalent by its hash."""
    orders = load_table(spark, sf_dir, "orders")
    if not approx:
        return _profile_exact(orders, cols)
    aggs = []
    for name, kind in cols:
        distinct = F.approx_count_distinct(name, rsd=0.02)
        aggs += [
            F.count("*").alias(f"{name}__rows"),
            (F.count("*") - F.count(name)).alias(f"{name}__nulls"),
            distinct.alias(f"{name}__distinct"),
        ]
        aggs += _minmax_slot_aggs(name, kind)
    wide = orders.agg(*aggs)
    rows = ", ".join(
        f"'{name}', {name}__rows, {name}__nulls, {name}__distinct, "
        f"{name}__minn, {name}__maxn, {name}__mins, {name}__maxs"
        for name, _ in cols
    )
    return wide.selectExpr(
        f"stack({len(cols)}, {rows}) AS "
        "(column_name, n_rows, n_nulls, n_distinct, "
        "min_num, max_num, min_str, max_str)"
    )


def _minmax_slot_aggs(name: str, kind: str) -> list:
    """The typed min/max slot aggregates for one profiled column —
    numeric as rounded doubles, timestamps as epoch seconds, strings
    lexical — shared by the one-pass approx profile and the exact
    stats pass."""
    if kind == "num":
        return [
            F.round(F.min(name).cast("double"), 6).alias(f"{name}__minn"),
            F.round(F.max(name).cast("double"), 6).alias(f"{name}__maxn"),
            F.lit(None).cast("string").alias(f"{name}__mins"),
            F.lit(None).cast("string").alias(f"{name}__maxs"),
        ]
    if kind == "ts":
        return [
            F.round(
                F.unix_micros(F.min(name).cast("timestamp")) / F.lit(1_000_000.0), 6
            ).alias(f"{name}__minn"),
            F.round(
                F.unix_micros(F.max(name).cast("timestamp")) / F.lit(1_000_000.0), 6
            ).alias(f"{name}__maxn"),
            F.lit(None).cast("string").alias(f"{name}__mins"),
            F.lit(None).cast("string").alias(f"{name}__maxs"),
        ]
    return [
        F.lit(None).cast("double").alias(f"{name}__minn"),
        F.lit(None).cast("double").alias(f"{name}__maxn"),
        F.min(name).alias(f"{name}__mins"),
        F.max(name).alias(f"{name}__maxs"),
    ]


def _profile_exact(orders: DataFrame, cols) -> DataFrame:
    """Expand-free exact profile (see _profile docstring): one narrow
    stats pass + one single-distinct leg per column, joined on
    column_name. Every leg is a one-row (or one-row-per-column)
    aggregate, so the join is broadcast-scale by construction."""
    aggs = []
    for name, kind in cols:
        aggs += [
            F.count("*").alias(f"{name}__rows"),
            (F.count("*") - F.count(name)).alias(f"{name}__nulls"),
        ]
        aggs += _minmax_slot_aggs(name, kind)
    rows = ", ".join(
        f"'{name}', {name}__rows, {name}__nulls, "
        f"{name}__minn, {name}__maxn, {name}__mins, {name}__maxs"
        for name, _ in cols
    )
    stats = orders.agg(*aggs).selectExpr(
        f"stack({len(cols)}, {rows}) AS "
        "(column_name, n_rows, n_nulls, min_num, max_num, min_str, max_str)"
    )
    distincts = None
    for name, _ in cols:
        leg = orders.select(name).agg(
            F.countDistinct(name).alias("n_distinct")
        ).select(F.lit(name).alias("column_name"), "n_distinct")
        distincts = leg if distincts is None else distincts.unionByName(leg)
    return stats.join(F.broadcast(distincts), "column_name").select(
        "column_name",
        "n_rows",
        "n_nulls",
        "n_distinct",
        "min_num",
        "max_num",
        "min_str",
        "max_str",
    )


@register("profile_orders_approx", oracle=None, tags=("profiling", "sketch"))
def profile_orders_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB formulation of profile_orders: identical output
    shape, but distinct counts come from HyperLogLog++ (rsd=2%).
    Measured 35x faster at sf0.1 — the exact multi-column
    COUNT(DISTINCT) rewrite Expands the input once per distinct column
    (a ~10x row multiplication before partial aggregation), while the
    HLL profile is ONE narrow pass with mergeable sketch buffers.

    PERMANENTLY sanctioned ``no_oracle`` — closure of the oracle-
    conversion program (VERDICT r10 ask #2). The wide-domain columns
    (o_orderkey, o_custkey, o_totalprice, o_orderdate — thousands of
    distinct values at every fixture SF) sit far above HLL++'s exact
    linear-counting regime (the bias term n^2/2m crosses the 0.5
    rounding threshold near sqrt(m) ~ 64 at rsd=2%'s m=4096, so ~64
    is the safe ceiling — see sketch_approx_distinct), so their
    estimates are functions of
    Spark's internal HLL++ hash/register layout that DuckDB cannot
    replay; and the driver's value hash covers the WHOLE result, so
    hash-gating this row would mean deleting or degrading exactly the
    wide-domain estimates the approx twin exists to provide. The
    verification split lands instead as ``profile_orders_approx_
    bounded`` below: the SAME pipeline function restricted to the
    exact-regime columns, hash-checked against a plain
    COUNT(DISTINCT) oracle. Wide-domain accuracy stays bounded
    against profile_orders' exact counts in tests/test_sketches.py,
    and the no-Expand scale claim stays plan-gated in
    tests/test_plans.py."""
    return _profile(spark, sf_dir, _ORDERS_COLS, approx=True)


# The orders columns whose cardinality keeps approx_count_distinct in
# HLL++'s exact regime at EVERY fixture SF: o_orderstatus has 3
# values, o_orderpriority 5 — both far below the exact-regime ceiling
# of ~sqrt(m) ~ 64 at m=4096 (ADVICE r11: the linear-counting bias
# n^2/2m reaches the 0.5 rounding threshold near sqrt(m), well before
# the sqrt(2m) ~ 90 once quoted here), so the estimate truncates to
# exactly n (and
# collision-freeness of the fixed value sets is verified empirically
# at sf0.001/0.01/0.1 in tests/test_sketches.py).
_BOUNDED_COLS = [("o_orderstatus", "str"), ("o_orderpriority", "str")]


@register(
    "profile_orders_approx_bounded",
    oracle=_profile_oracle(_BOUNDED_COLS),
    tags=("profiling", "sketch"),
)
def profile_orders_approx_bounded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash gate for the HLL profile pipeline (the split the r10
    verdict asked for): ``profile_orders_approx``'s EXACT pipeline
    function restricted to the bounded-cardinality columns, where
    HLL++'s exact-below-threshold regime (sketch_approx_distinct's
    discipline) makes the rsd=2% estimate provably equal to the plain
    COUNT(DISTINCT) the DuckDB oracle computes. Same register()d
    no_oracle sanction pattern as the seeded ANN twins: the full-width
    query keeps its estimative semantics, this row hash-proves the
    shared plumbing (agg builder, stack unpivot, typed min/max slots,
    null accounting) end to end.

    Pinned assumption (same as sketch_approx_distinct): exactness
    rests on Spark 4.1.x's HLL++ hash being collision-free over these
    8 fixed values; a Spark version bump that changes the hash flips
    this row red with no semantic bug."""
    return _profile(spark, sf_dir, _BOUNDED_COLS, approx=True)


_PCT_ORACLE = """
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       ROUND(quantile_cont(o_totalprice, 0.5), 6) AS p50,
       ROUND(quantile_cont(o_totalprice, 0.9), 6) AS p90,
       ROUND(quantile_cont(o_totalprice, 0.99), 6) AS p99
FROM orders
GROUP BY o_orderpriority
"""


@register(
    "percentile_exact_by_priority", oracle=_PCT_ORACLE, tags=("profiling",)
)
def percentile_exact_by_priority(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Exact interpolated percentiles (p50/p90/p99) of order value per
    priority — Spark ``percentile`` and DuckDB ``quantile_cont`` share
    linear-interpolation semantics, so the engines agree exactly."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_orders"),
        F.round(F.percentile("o_totalprice", F.lit(0.5)), 6).alias("p50"),
        F.round(F.percentile("o_totalprice", F.lit(0.9)), 6).alias("p90"),
        F.round(F.percentile("o_totalprice", F.lit(0.99)), 6).alias("p99"),
    )


# ---------------------------------------------------------------------------
# Equi-width histogram (fixed binning, no data-dependent bounds).
# ---------------------------------------------------------------------------
# The distribution-shape companion to the percentile profile: bucket
# o_totalprice into fixed-width bins with LITERAL bounds shared by
# both engines (data-dependent bounds would need a pre-scan; a
# production profiler derives them from the previous run's min/max or
# the catalog stats). Bucket math is identical integer floor division
# in both engines — no width_bucket dialect dependence.
HIST_LO = 0.0
HIST_WIDTH = 50_000.0
HIST_BINS = 10  # values above lo + bins*width clamp into the top bin

_HIST_ORACLE = f"""
SELECT bucket,
       ROUND({HIST_LO} + bucket * {HIST_WIDTH}, 1) AS bin_lo,
       ROUND({HIST_LO} + (bucket + 1) * {HIST_WIDTH}, 1) AS bin_hi,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       ROUND(SUM(o_totalprice), 2) AS bin_total
FROM (
  SELECT o_totalprice,
         CAST(LEAST(FLOOR((o_totalprice - {HIST_LO}) / {HIST_WIDTH}),
                    {HIST_BINS - 1}) AS BIGINT) AS bucket
  FROM orders
) b
GROUP BY bucket
ORDER BY bucket
"""


@register(
    "profile_histogram",
    oracle=_HIST_ORACLE,
    tags=("profiling", "aggregation"),
)
def profile_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram of order totals: 10 fixed 50k-wide bins
    (top bin clamps the tail), with per-bin count and value total.

    Scale shape: the bucket id is a map-side floor-division
    projection; the rollup partial-aggregates into at most HIST_BINS
    groups — the exchange carries bins x partitions rows. This is the
    one-scan shape a profiler wants at 100 TB; the percentile profile
    (above) answers quantile questions, this answers shape ones."""
    orders = load_table(spark, sf_dir, "orders")
    bucket = F.least(
        F.floor((F.col("o_totalprice") - F.lit(HIST_LO)) / F.lit(HIST_WIDTH)),
        F.lit(HIST_BINS - 1),
    ).cast("long")
    return (
        orders.select(bucket.alias("bucket"), "o_totalprice")
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("bin_total"),
        )
        .select(
            "bucket",
            F.round(F.lit(HIST_LO) + F.col("bucket") * HIST_WIDTH, 1).alias(
                "bin_lo"
            ),
            F.round(
                F.lit(HIST_LO) + (F.col("bucket") + 1) * HIST_WIDTH, 1
            ).alias("bin_hi"),
            "n_orders",
            "bin_total",
        )
        .orderBy("bucket")
    )


# ---------------------------------------------------------------------------
# Winsorized (percentile-clipped) robust statistics.
# ---------------------------------------------------------------------------
_WINSOR_ORACLE = """
WITH b AS (
  SELECT o_orderpriority,
         quantile_cont(o_totalprice, 0.01) AS lo,
         quantile_cont(o_totalprice, 0.99) AS hi
  FROM orders GROUP BY o_orderpriority
)
SELECT o.o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CASE WHEN o.o_totalprice < b.lo OR o.o_totalprice > b.hi
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped,
       ROUND(b.lo, 4) AS p01,
       ROUND(b.hi, 4) AS p99,
       ROUND(AVG(LEAST(GREATEST(o.o_totalprice, b.lo), b.hi)), 4)
         AS avg_winsorized,
       ROUND(AVG(o.o_totalprice), 4) AS avg_raw
FROM orders o JOIN b ON b.o_orderpriority = o.o_orderpriority
GROUP BY o.o_orderpriority, b.lo, b.hi
"""


@register(
    "profile_winsorized_stats",
    oracle=_WINSOR_ORACLE,
    tags=("profiling", "aggregation", "llm"),
)
def profile_winsorized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Outlier-robust group statistics: clip each group's values to its
    own [p01, p99] (winsorization) before averaging — the standard
    guard when corpus metrics (doc length, score, price) have heavy
    tails that a plain mean would follow. Spark's ``percentile`` and
    DuckDB's ``quantile_cont`` share linear interpolation, so the clip
    bounds hash-match exactly.

    100 TB shape: pass 1 computes two exact percentiles per group
    (group count is 5 — the value buffer is per-group bounded; for
    high-cardinality keys swap in ``approx_percentile``, same plan);
    the 5-row bounds table broadcasts back onto the scan, so pass 2
    is one map-side clamp + partial agg. Two scans, one tiny shuffle.
    """
    orders = load_table(spark, sf_dir, "orders")
    bounds = orders.groupBy("o_orderpriority").agg(
        F.expr("percentile(o_totalprice, 0.01)").alias("lo"),
        F.expr("percentile(o_totalprice, 0.99)").alias("hi"),
    )
    clipped = orders.join(F.broadcast(bounds), "o_orderpriority").select(
        "o_orderpriority",
        "o_totalprice",
        "lo",
        "hi",
        F.least(F.greatest(F.col("o_totalprice"), F.col("lo")), F.col("hi"))
        .alias("w"),
    )
    return clipped.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_orders"),
        F.sum(
            F.when(
                (F.col("o_totalprice") < F.col("lo"))
                | (F.col("o_totalprice") > F.col("hi")),
                1,
            ).otherwise(0)
        ).alias("n_clipped"),
        F.round(F.first("lo"), 4).alias("p01"),
        F.round(F.first("hi"), 4).alias("p99"),
        F.round(F.avg("w"), 4).alias("avg_winsorized"),
        F.round(F.avg("o_totalprice"), 4).alias("avg_raw"),
    )


# ---------------------------------------------------------------------------
# Join-key skew diagnostics.
# ---------------------------------------------------------------------------
_SKEW_TOP = 10

_SKEW_ORACLE = f"""
WITH freq AS (
  SELECT o_custkey AS key, COUNT(*) AS n FROM orders GROUP BY o_custkey
),
gstats AS (
  SELECT COUNT(*) AS n_keys, SUM(n) AS n_rows, MAX(n) AS max_freq,
         SUM(n) * 1.0 / COUNT(*) AS avg_freq
  FROM freq
),
ranked AS (
  SELECT key, n,
         ROW_NUMBER() OVER (ORDER BY n DESC, key) AS rank,
         SUM(n) OVER (ORDER BY n DESC, key
                      ROWS UNBOUNDED PRECEDING) AS cum_n
  FROM freq
)
SELECT r.key, CAST(r.n AS BIGINT) AS n_rows_key,
       CAST(r.rank AS BIGINT) AS rank,
       ROUND(r.n * 1.0 / g.n_rows, 6) AS share,
       ROUND(r.cum_n * 1.0 / g.n_rows, 6) AS cum_share,
       CAST(g.n_keys AS BIGINT) AS n_keys,
       ROUND(g.max_freq / g.avg_freq, 4) AS skew_ratio
FROM ranked r CROSS JOIN gstats g
WHERE r.rank <= {_SKEW_TOP}
"""


@register(
    "profile_join_skew",
    oracle=_SKEW_ORACLE,
    tags=("profiling", "skew", "aggregation"),
)
def profile_join_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew diagnostic: the top hot keys of a prospective
    join/shuffle key with their row share, cumulative share, and the
    global max/avg frequency ratio — the numbers that decide between
    a plain shuffle (ratio ~1), AQE skew-join splitting (a few hot
    keys), and explicit salting (join_skew_salted) or hot-key
    broadcast isolation (pathological ratio). Run this BEFORE the big
    join; it is one partial-aggregated pass over the key column.

    100 TB shape: the frequency table is keys-sized, the global stats
    a single row joined back broadcast-style; the only wide operation
    is the top-k window over the keys table (bounded, never corpus-
    sized). At extreme key cardinality swap the exact frequency table
    for a count-min sketch and keep the same report shape."""
    orders = load_table(spark, sf_dir, "orders")
    freq = orders.groupBy(F.col("o_custkey").alias("key")).agg(
        F.count("*").alias("n")
    )
    glob = freq.agg(
        F.count("*").alias("n_keys"),
        F.sum("n").alias("n_rows"),
        F.max("n").alias("max_freq"),
        (F.sum("n") / F.count("*")).alias("avg_freq"),
    )
    w = Window.orderBy(F.desc("n"), "key")
    ranked = freq.select(
        "key",
        "n",
        F.row_number().over(w).alias("rank"),
        F.sum("n").over(w.rowsBetween(Window.unboundedPreceding, 0)).alias("cum_n"),
    ).filter(F.col("rank") <= _SKEW_TOP)
    return ranked.crossJoin(F.broadcast(glob)).select(
        "key",
        F.col("n").alias("n_rows_key"),
        F.col("rank").cast("long"),
        F.round(F.col("n") / F.col("n_rows"), 6).alias("share"),
        F.round(F.col("cum_n") / F.col("n_rows"), 6).alias("cum_share"),
        "n_keys",
        F.round(F.col("max_freq") / F.col("avg_freq"), 4).alias("skew_ratio"),
    )


# ---------------------------------------------------------------------------
# Distribution drift between snapshots: Population Stability Index.
# ---------------------------------------------------------------------------
_PSI_BINS = 10
_PSI_LO, _PSI_HI = 0.0, 600_000.0  # fixed o_totalprice bin range
_PSI_SPLIT = "1996-01-01"  # vintage A before, vintage B from this date

_PSI_ORACLE = f"""
WITH binned AS (
  SELECT LEAST({_PSI_BINS - 1},
               GREATEST(0, CAST(FLOOR((o_totalprice - {_PSI_LO}) /
                 (({_PSI_HI} - {_PSI_LO}) / {_PSI_BINS})) AS INT))) AS bin,
         CASE WHEN o_orderdate < TIMESTAMP '{_PSI_SPLIT} 00:00:00'
              THEN 'a' ELSE 'b' END AS vintage
  FROM orders
),
spine AS (
  SELECT UNNEST(generate_series(0, {_PSI_BINS} - 1)) AS bin
),
observed AS (
  SELECT bin,
         SUM(CASE WHEN vintage = 'a' THEN 1 ELSE 0 END) AS n_a,
         SUM(CASE WHEN vintage = 'b' THEN 1 ELSE 0 END) AS n_b
  FROM binned GROUP BY bin
),
counts AS (
  -- all {_PSI_BINS} bins, zero-filled: an empty bin still contributes
  -- its Laplace-smoothed term, and shares sum to 1
  SELECT s.bin, COALESCE(o.n_a, 0) AS n_a, COALESCE(o.n_b, 0) AS n_b
  FROM spine s LEFT JOIN observed o ON o.bin = s.bin
),
tot AS (
  SELECT SUM(n_a) AS t_a, SUM(n_b) AS t_b FROM counts
),
sm AS (
  -- Laplace-smoothed shares: zero-count bins stay finite in the log
  SELECT c.bin, c.n_a, c.n_b,
         (c.n_a + 1.0) / (t.t_a + {_PSI_BINS}) AS p_a,
         (c.n_b + 1.0) / (t.t_b + {_PSI_BINS}) AS p_b
  FROM counts c CROSS JOIN tot t
)
SELECT bin, CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
       ROUND((p_a - p_b) * LN(p_a / p_b), 6) AS psi_contrib,
       ROUND(SUM((p_a - p_b) * LN(p_a / p_b)) OVER (), 6) AS psi_total
FROM sm
ORDER BY bin
"""


@register(
    "profile_psi_drift",
    oracle=_PSI_ORACLE,
    tags=("profiling", "stats", "llm"),
)
def profile_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index between two order vintages: fixed-
    width bins over o_totalprice, Laplace-smoothed shares, per-bin
    contribution and the total PSI (>0.25 = retrain/alert in the
    standard reading). This is the drift monitor a corpus pipeline
    runs between snapshots — has the quality-score / length / price
    distribution moved since the data the model was tuned on?

    100 TB shape: one scan, map-side bin assignment (fixed edges — no
    percentile pass), a {b}-row count table, and the PSI arithmetic on
    that table; the window-total is over {b} rows. Nothing downstream
    of the scan depends on data size."""
    orders = load_table(spark, sf_dir, "orders")
    width = (_PSI_HI - _PSI_LO) / _PSI_BINS
    binned = orders.select(
        F.least(
            F.lit(_PSI_BINS - 1),
            F.greatest(
                F.lit(0),
                F.floor((F.col("o_totalprice") - _PSI_LO) / width).cast("int"),
            ),
        ).alias("bin"),
        F.when(
            F.col("o_orderdate") < F.lit(f"{_PSI_SPLIT} 00:00:00").cast("timestamp"),
            "a",
        )
        .otherwise("b")
        .alias("vintage"),
    )
    observed = binned.groupBy("bin").agg(
        F.sum(F.when(F.col("vintage") == "a", 1).otherwise(0)).alias("n_a"),
        F.sum(F.when(F.col("vintage") == "b", 1).otherwise(0)).alias("n_b"),
    )
    spine = spark.range(_PSI_BINS).select(F.col("id").cast("int").alias("bin"))
    counts = (
        spine.join(F.broadcast(observed), "bin", "left")
        .select(
            "bin",
            F.coalesce(F.col("n_a"), F.lit(0)).alias("n_a"),
            F.coalesce(F.col("n_b"), F.lit(0)).alias("n_b"),
        )
    )
    tot = counts.agg(
        F.sum("n_a").alias("t_a"), F.sum("n_b").alias("t_b")
    )
    sm = counts.crossJoin(F.broadcast(tot)).select(
        "bin",
        "n_a",
        "n_b",
        ((F.col("n_a") + 1.0) / (F.col("t_a") + _PSI_BINS)).alias("p_a"),
        ((F.col("n_b") + 1.0) / (F.col("t_b") + _PSI_BINS)).alias("p_b"),
    )
    contrib = (F.col("p_a") - F.col("p_b")) * F.log(F.col("p_a") / F.col("p_b"))
    return sm.select(
        "bin",
        "n_a",
        "n_b",
        F.round(contrib, 6).alias("psi_contrib"),
        F.round(
            F.sum(contrib).over(
                Window.rowsBetween(
                    Window.unboundedPreceding, Window.unboundedFollowing
                )
            ),
            6,
        ).alias("psi_total"),
    ).orderBy("bin")


# ---------------------------------------------------------------------------
# Cross-source quantile normalization (score calibration).
# ---------------------------------------------------------------------------
_QNORM_DECILES = 10

_QNORM_ORACLE = f"""
WITH scored AS (
  SELECT doc_id, source, {_TOKENBUDGET_WORDS_DUCK} AS score
  FROM documents
),
gridded AS (
  SELECT doc_id, source, score,
         NTILE({_QNORM_DECILES}) OVER (ORDER BY score, doc_id) AS gdec
  FROM scored
),
ref AS (
  SELECT gdec, AVG(score) AS ref_score FROM gridded GROUP BY gdec
),
per_src AS (
  SELECT doc_id, source, score,
         NTILE({_QNORM_DECILES}) OVER (
           PARTITION BY source ORDER BY score, doc_id) AS sdec
  FROM scored
)
SELECT p.source, CAST(p.sdec AS BIGINT) AS decile,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       ROUND(AVG(p.score), 4) AS raw_avg,
       ROUND(MAX(r.ref_score), 4) AS calibrated
FROM per_src p JOIN ref r ON r.gdec = p.sdec
GROUP BY p.source, p.sdec
ORDER BY p.source, decile
"""


@register(
    "profile_quantile_normalize",
    oracle=_QNORM_ORACLE,
    tags=("profiling", "stats", "llm", "window"),
)
def profile_quantile_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile normalization of a per-document score across sources:
    each source's decile d is remapped onto the GLOBAL decile-d mean,
    so 'top 10% of source X' and 'top 10% of source Y' land on the
    same calibrated scale even when the sources' raw score
    distributions differ wildly — the calibration step before mixing
    quality-filtered sources with one shared threshold. NTILE with a
    (score, doc_id) tie-break keeps bucket membership deterministic
    in both engines.

    100 TB shape: two rank passes over (score, id) pairs — a global
    NTILE (at scale: range-partitioned rank like window_global_rank,
    or approx_percentile cutpoints) and a per-source NTILE whose
    partitions are source-sized; the decile reference table is 10
    rows, broadcast back. Scores, not documents, move through every
    exchange."""
    docs = load_table(spark, sf_dir, "documents").selectExpr(
        "doc_id", "source", f"{_TOKENBUDGET_WORDS_SPARK} AS score"
    )
    wg = Window.orderBy("score", "doc_id")
    ref = (
        docs.select(F.ntile(_QNORM_DECILES).over(wg).alias("gdec"), "score")
        .groupBy("gdec")
        .agg(F.avg("score").alias("ref_score"))
    )
    ws = Window.partitionBy("source").orderBy("score", "doc_id")
    per_src = docs.select(
        "source", "score", F.ntile(_QNORM_DECILES).over(ws).alias("sdec")
    )
    return (
        per_src.join(F.broadcast(ref), per_src.sdec == ref.gdec)
        .groupBy("source", F.col("sdec").cast("long").alias("decile"))
        .agg(
            F.count("*").alias("n_docs"),
            F.round(F.avg("score"), 4).alias("raw_avg"),
            F.round(F.max("ref_score"), 4).alias("calibrated"),
        )
        .orderBy("source", "decile")
    )


# ---------------------------------------------------------------------------
# Per-group linear regression (built-in regr_* aggregates).
# ---------------------------------------------------------------------------
# Fits extendedprice ~ quantity per return flag with the SQL-standard
# regression aggregates. These are single-pass, partial-aggregable
# moment sums (the same machinery as AVG/STDDEV), so the whole fit is
# one map-side-combined exchange — the 100 TB way to fit millions of
# per-key models, vs. collecting anything or looping a solver.
# Slope/intercept/r2 are emitted unrounded: both engines compute the
# same covariance-over-variance formula and the comparator's relative
# tolerance absorbs summation-order ULPs (a fixed-decimal ROUND would
# sit on a knife edge instead — see timeseries_resample_ffill).
_REGR_ORACLE = """
SELECT l_returnflag,
       CAST(COUNT(*) AS BIGINT) AS n,
       regr_slope(l_extendedprice, l_quantity) AS slope,
       regr_intercept(l_extendedprice, l_quantity) AS intercept,
       regr_r2(l_extendedprice, l_quantity) AS r2,
       corr(l_extendedprice, l_quantity) AS pearson_r
FROM lineitem
GROUP BY l_returnflag
"""


@register(
    "profile_regression_per_flag",
    oracle=_REGR_ORACLE,
    tags=("profiling", "stats", "aggregation"),
)
def profile_regression_per_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group OLS fit of extended price on quantity: slope,
    intercept, R², Pearson r via the SQL-standard regr_* aggregates —
    one scan, map-side partials, no driver math."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.expr("regr_slope(l_extendedprice, l_quantity)").alias("slope"),
        F.expr("regr_intercept(l_extendedprice, l_quantity)").alias(
            "intercept"
        ),
        F.expr("regr_r2(l_extendedprice, l_quantity)").alias("r2"),
        F.corr("l_extendedprice", "l_quantity").alias("pearson_r"),
    )


# ---------------------------------------------------------------------------
# Equi-depth binning (the quantile twin of the equi-width histogram).
# ---------------------------------------------------------------------------
_EQUIDEPTH_ORACLE = """
WITH binned AS (
  SELECT o_totalprice,
         ntile(10) OVER (ORDER BY o_totalprice, o_orderkey) AS decile
  FROM orders
)
SELECT CAST(decile AS INT) AS decile,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       ROUND(MIN(o_totalprice), 4) AS lo,
       ROUND(MAX(o_totalprice), 4) AS hi
FROM binned GROUP BY decile
"""


@register(
    "profile_equidepth_bins",
    oracle=_EQUIDEPTH_ORACLE,
    tags=("profiling", "aggregation", "window"),
)
def profile_equidepth_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decile (equi-depth) bins of order price — equal POPULATION per
    bin where profile_histogram gives equal WIDTH; the edges double as
    a feature discretizer.

    Spark's ntile() over an unpartitioned window is an Exchange
    SinglePartition — the single-reducer sort this repo gates against
    everywhere else — so the decile comes from the scale-safe
    global_row_number (range partition + prefix-summed offsets) with
    NTILE's exact remainder rule replayed as integer arithmetic: the
    first N%10 buckets get ceil(N/10) rows, the rest floor(N/10). The
    oracle runs DuckDB's native NTILE, so the hash gate proves the
    distributed formulation IS ntile. Cheaper still at 100 TB:
    approx_percentile edges (sketch_percentile_approx) as bin bounds."""
    from golang_etl_spark.operators.windows import global_row_number

    orders = load_table(spark, sf_dir, "orders").select(
        "o_totalprice", "o_orderkey"
    )
    ranked = global_row_number(
        orders, [F.col("o_totalprice"), F.col("o_orderkey")], out_col="rn"
    )
    n_row = orders.agg(F.count("*").alias("n_total"))
    binned = ranked.crossJoin(F.broadcast(n_row)).selectExpr(
        "o_totalprice",
        "CAST(CASE WHEN rn <= (n_total % 10) * (n_total div 10 + 1) "
        "THEN (rn - 1) div (n_total div 10 + 1) + 1 "
        "ELSE (n_total % 10) "
        "     + (rn - 1 - (n_total % 10) * (n_total div 10 + 1)) "
        "       div (n_total div 10) + 1 END AS INT) AS decile",
    )
    return binned.groupBy("decile").agg(
        F.count("*").alias("n_rows"),
        F.round(F.min("o_totalprice"), 4).alias("lo"),
        F.round(F.max("o_totalprice"), 4).alias("hi"),
    )


# ---------------------------------------------------------------------------
# Leading-digit (Benford) screen — data-forensics profiling.
# ---------------------------------------------------------------------------
_BENFORD_ORACLE = """
SELECT CAST(substr(CAST(CAST(FLOOR(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1)
            AS INT) AS leading_digit,
       CAST(COUNT(*) AS BIGINT) AS n_rows
FROM orders
WHERE o_totalprice >= 1
GROUP BY leading_digit
"""


@register(
    "profile_leading_digit",
    oracle=_BENFORD_ORACLE,
    tags=("profiling", "aggregation", "stats"),
)
def profile_leading_digit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-significant-digit distribution of order totals — the
    Benford screen auditors run for fabricated numerics. Integer-only
    output (digit, count); comparing the shares against log10(1+1/d)
    is the consumer's one-liner. Pure map-side projection + one tiny
    aggregation.

    The digit comes from the INTEGER part's decimal rendering —
    explicit FLOOR before the BIGINT cast on BOTH engines, because the
    bare double->BIGINT cast truncates in Spark but ROUNDS in DuckDB
    (a 89999.99 order flips 8 -> 9 without it), and float-to-string is
    engine-specific while integer-to-string is not."""
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_totalprice") >= 1
    )
    return (
        orders.select(
            F.substring(
                F.floor("o_totalprice").cast("long").cast("string"), 1, 1
            )
            .cast("int")
            .alias("leading_digit")
        )
        .groupBy("leading_digit")
        .agg(F.count("*").alias("n_rows"))
    )


# ---------------------------------------------------------------------------
# One-pass pairwise correlation matrix.
# ---------------------------------------------------------------------------
_CORR_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]

_CORR_MATRIX_ORACLE = """
SELECT col_a, col_b, corr FROM (
{rows}
) t
""".format(
    rows="\n  UNION ALL\n".join(
        f"  SELECT '{a}' AS col_a, '{b}' AS col_b, "
        f"corr({a}, {b}) AS corr FROM lineitem"
        for i, a in enumerate(_CORR_COLS)
        for b in _CORR_COLS[i + 1:]
    )
)


@register(
    "profile_corr_matrix",
    oracle=_CORR_MATRIX_ORACLE,
    tags=("profiling", "stats", "aggregation"),
)
def profile_corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlations of the lineitem measures as ONE
    aggregation (k*(k-1)/2 corr() expressions over a single scan),
    unpivoted to (col_a, col_b, corr) rows. The feature-screening
    staple — and the single-pass formulation is the whole point: a
    per-pair loop would scan the table k² times. Moment sums partial-
    aggregate map-side like any corr()."""
    li = load_table(spark, sf_dir, "lineitem")
    aggs = [
        F.corr(a, b).alias(f"{a}__{b}")
        for i, a in enumerate(_CORR_COLS)
        for b in _CORR_COLS[i + 1:]
    ]
    wide = li.agg(*aggs)
    pairs = [
        (a, b)
        for i, a in enumerate(_CORR_COLS)
        for b in _CORR_COLS[i + 1:]
    ]
    stack = ", ".join(f"'{a}', '{b}', `{a}__{b}`" for a, b in pairs)
    return wide.selectExpr(
        f"stack({len(pairs)}, {stack}) AS (col_a, col_b, corr)"
    )


# ---------------------------------------------------------------------------
# Exact two-sample Kolmogorov-Smirnov drift statistic.
# ---------------------------------------------------------------------------
# The exact complement of profile_psi_drift: PSI summarizes drift over
# FIXED bins (fast, but blind to movement inside a bin and sensitive
# to edge placement); KS is the binless sup |ECDF_a - ECDF_b| over the
# pooled sample points — the distribution-free two-sample test
# statistic. Same vintage split as PSI so the two monitors read on the
# same snapshot pair.
_KS_SPLIT = "1996-01-01"  # vintage A before, vintage B from this date
_KS_PARTITIONS = 32

_KS_ORACLE = f"""
WITH per_v AS (
  SELECT o_totalprice AS v,
         CAST(SUM(CASE WHEN o_orderdate < TIMESTAMP '{_KS_SPLIT} 00:00:00'
                       THEN 1 ELSE 0 END) AS BIGINT) AS c_a,
         CAST(SUM(CASE WHEN o_orderdate < TIMESTAMP '{_KS_SPLIT} 00:00:00'
                       THEN 0 ELSE 1 END) AS BIGINT) AS c_b
  FROM orders GROUP BY o_totalprice
),
tot AS (
  SELECT CAST(SUM(c_a) AS DOUBLE) AS n_a, CAST(SUM(c_b) AS DOUBLE) AS n_b
  FROM per_v
),
cum AS (
  SELECT SUM(c_a) OVER (ORDER BY v) AS cum_a,
         SUM(c_b) OVER (ORDER BY v) AS cum_b
  FROM per_v
)
SELECT CAST(t.n_a AS BIGINT) AS n_a, CAST(t.n_b AS BIGINT) AS n_b,
       MAX(ABS(CAST(cum_a AS DOUBLE) / t.n_a
               - CAST(cum_b AS DOUBLE) / t.n_b)) AS ks_stat
FROM cum CROSS JOIN tot t
GROUP BY t.n_a, t.n_b
"""


@register(
    "profile_ks_drift",
    oracle=_KS_ORACLE,
    tags=("profiling", "stats", "llm"),
)
def profile_ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact two-sample KS statistic of o_totalprice between the two
    order vintages: D = sup over pooled values of |ECDF_a - ECDF_b|.

    100 TB shape: group by value first (one exchange; the ECDF only
    changes at sample points, and ties are handled exactly because
    each distinct value carries ALL its occurrences), then the running
    counts via the module's two-phase prefix-sum pattern — range
    partition on the value, per-partition running sums, broadcast
    per-partition offsets (a window over #partitions rows, never a
    single-reducer global sort). Every count stays integral until the
    two final divisions, so both engines' doubles are bit-identical
    and ks_stat needs no rounding under the hash gate.
    """
    orders = load_table(spark, sf_dir, "orders")
    is_a = F.col("o_orderdate") < F.lit(f"{_KS_SPLIT} 00:00:00").cast(
        "timestamp"
    )
    per_v = (
        orders.select(
            F.col("o_totalprice").alias("v"), is_a.cast("long").alias("a")
        )
        .groupBy("v")
        .agg(
            F.sum("a").alias("c_a"),
            (F.count("*") - F.sum("a")).alias("c_b"),
        )
    )
    ranged = per_v.repartitionByRange(_KS_PARTITIONS, "v").withColumn(
        "_pid", F.spark_partition_id()
    )
    ptot = ranged.groupBy("_pid").agg(
        F.sum("c_a").alias("t_a"), F.sum("c_b").alias("t_b")
    )
    w_off = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = ptot.select(
        "_pid",
        F.coalesce(F.sum("t_a").over(w_off), F.lit(0)).alias("o_a"),
        F.coalesce(F.sum("t_b").over(w_off), F.lit(0)).alias("o_b"),
    )
    w_in = Window.partitionBy("_pid").orderBy("v")
    cum = ranged.join(F.broadcast(offsets), "_pid").select(
        (F.col("o_a") + F.sum("c_a").over(w_in)).alias("cum_a"),
        (F.col("o_b") + F.sum("c_b").over(w_in)).alias("cum_b"),
    )
    tot = per_v.agg(
        F.sum("c_a").cast("double").alias("n_a"),
        F.sum("c_b").cast("double").alias("n_b"),
    )
    d = F.abs(
        F.col("cum_a").cast("double") / F.col("n_a")
        - F.col("cum_b").cast("double") / F.col("n_b")
    )
    return (
        cum.crossJoin(F.broadcast(tot))
        .groupBy("n_a", "n_b")
        .agg(F.max(d).alias("ks_stat"))
        .select(
            F.col("n_a").cast("long").alias("n_a"),
            F.col("n_b").cast("long").alias("n_b"),
            "ks_stat",
        )
    )

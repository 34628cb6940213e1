"""Time-series operators over the ``events`` table: calendar gap-fill
and resample-with-forward-fill — the "hypertable rollup" shapes a
metrics/training-telemetry pipeline needs.

No reference counterpart (SURVEY.md §2.5) — LLM-pipeline extension.

Scale notes (100 TB stance):
- the only event-scale shuffle in either query is the initial
  per-bucket aggregation (map-side partial counts/sums, uniform keys:
  event_type × time bucket). Everything after it operates on the
  aggregated grid, whose size is |types| × |buckets| — independent of
  event count.
- the dense calendar is built from the data's own min/max bounds with
  ``sequence`` + ``explode`` (JVM-side), then cross-joined with the
  distinct type set: both sides are tiny, and Spark broadcasts them.
- forward-fill is ``last(..., ignorenulls=True)`` over an unbounded
  preceding row frame, partitioned by type: one small-grid window, no
  self-join. At 100 TB you would still window the *grid*, never the
  raw events.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from golang_etl_spark.registry import register
from golang_etl_spark.sources.catalog import load_table

_GAPFILL_ORACLE = """
WITH ev AS (
  SELECT date_trunc('day', ts) AS d, event_type, value FROM events
),
b AS (SELECT MIN(d) AS lo, MAX(d) AS hi FROM ev),
cal AS (
  SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS day
  FROM b
),
types AS (SELECT DISTINCT event_type FROM ev),
daily AS (
  SELECT event_type, d AS day, COUNT(*) AS n, SUM(value) AS sv
  FROM ev GROUP BY event_type, d
)
SELECT t.event_type, c.day,
       CAST(COALESCE(dl.n, 0) AS BIGINT) AS n_events,
       ROUND(COALESCE(dl.sv, 0.0), 6) AS sum_value
FROM types t
CROSS JOIN cal c
LEFT JOIN daily dl ON dl.event_type = t.event_type AND dl.day = c.day
"""


@register("timeseries_gapfill", oracle=_GAPFILL_ORACLE, tags=("timeseries",))
def timeseries_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily event counts and value sums per event_type over a dense
    calendar spanning the data's own [min, max] date range — days with
    no events appear with explicit zeros (the gap-fill contract a
    downstream chart/model expects). The day bucket is a midnight
    timestamp (``date_trunc``), not a DATE: Spark DATE surfaces as
    ``datetime.date`` while DuckDB DATE surfaces as ``datetime64``,
    which the driver's value-hash treats as different."""
    ev = load_table(spark, sf_dir, "events").select(
        F.date_trunc("day", "ts").alias("day"), "event_type", "value"
    )
    # ONE events scan: calendar bounds and the type set both derive
    # from the persisted daily aggregate (|types| x |days| rows), not
    # from separate re-scans of the event table.
    daily = (
        ev.groupBy("event_type", "day")
        .agg(F.count("*").alias("n"), F.sum("value").alias("sv"))
        .persist()
    )
    cal = (
        daily.agg(F.min("day").alias("lo"), F.max("day").alias("hi"))
        .select(
            F.explode(
                F.sequence("lo", "hi", F.expr("INTERVAL 1 DAY"))
            ).alias("day")
        )
    )
    types = daily.select("event_type").distinct()
    grid = types.crossJoin(F.broadcast(cal))
    return grid.join(daily, ["event_type", "day"], "left").select(
        "event_type",
        "day",
        F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n_events"),
        F.round(F.coalesce(F.col("sv"), F.lit(0.0)), 6).alias("sum_value"),
    )


_RESAMPLE_ORACLE = """
WITH ev AS (
  SELECT date_trunc('hour', ts) AS h, event_type, value FROM events
),
b AS (SELECT MIN(h) AS lo, MAX(h) AS hi FROM ev),
cal AS (
  SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hour
  FROM b
),
types AS (SELECT DISTINCT event_type FROM ev),
hourly AS (
  SELECT event_type, h AS hour, AVG(value) AS av
  FROM ev GROUP BY event_type, h
),
grid AS (
  SELECT t.event_type, c.hour, hl.av
  FROM types t CROSS JOIN cal c
  LEFT JOIN hourly hl ON hl.event_type = t.event_type AND hl.hour = c.hour
)
SELECT event_type, hour,
       last_value(av IGNORE NULLS) OVER (
         PARTITION BY event_type ORDER BY hour
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS avg_value_ffill
FROM grid
"""


@register(
    "timeseries_resample_ffill", oracle=_RESAMPLE_ORACLE, tags=("timeseries",)
)
def timeseries_resample_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly average of ``value`` per event_type on a dense hour
    grid, with empty hours forward-filled from the last observed hour
    (resample + ffill). Leading hours with no prior observation stay
    NULL by design.

    The average is emitted UNROUNDED: a fixed-decimal ROUND sits on a
    knife edge when the exact average ends in ...5 at the cut digit —
    at sf0.1 one hourly mean was x.4728125, and an ULP-level
    summation-order difference between engines flipped round(...,6)
    to 12 vs 13. Raw doubles differ only at ~1e-16, which both the
    comparator's 1e-9 tolerance and the driver's significant-digit
    canonical formatting absorb. (Rounded SUMs elsewhere are safe:
    sums of 2-decimal inputs are exact multiples of 0.01.)"""
    ev = load_table(spark, sf_dir, "events").select(
        F.date_trunc("hour", "ts").alias("hour"), "event_type", "value"
    )
    # Same single-scan shape as the gap-fill: bounds and types come
    # from the persisted hourly aggregate.
    hourly = (
        ev.groupBy("event_type", "hour")
        .agg(F.avg("value").alias("av"))
        .persist()
    )
    cal = (
        hourly.agg(F.min("hour").alias("lo"), F.max("hour").alias("hi"))
        .select(
            F.explode(
                F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))
            ).alias("hour")
        )
    )
    types = hourly.select("event_type").distinct()
    grid = types.crossJoin(F.broadcast(cal)).join(
        hourly, ["event_type", "hour"], "left"
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return grid.select(
        "event_type",
        "hour",
        F.last("av", ignorenulls=True).over(w).alias("avg_value_ffill"),
    )


# ---------------------------------------------------------------------------
# Rolling z-score anomaly flags (monitoring over the event stream).
# ---------------------------------------------------------------------------
# Per-type hourly volumes scored against their own trailing window:
# z = (x - trailing_mean) / trailing_stddev over the 24 preceding
# hours (current excluded — the point of reference is the PAST). The
# standard volume-anomaly monitor; emitted for every hour with a full
# lookback so both engines window identically.
ZSCORE_LOOKBACK = 24
ZSCORE_FLAG = 2.0

_ZSCORE_ORACLE = f"""
WITH hourly AS (
  SELECT event_type, time_bucket(INTERVAL '1 hour', ts) AS hour,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY event_type, hour
),
scored AS (
  SELECT event_type, hour, n,
         AVG(n)        OVER w AS mu,
         STDDEV_SAMP(n) OVER w AS sigma,
         COUNT(*)      OVER w AS n_lookback
  FROM hourly
  WINDOW w AS (PARTITION BY event_type ORDER BY hour
               ROWS BETWEEN {ZSCORE_LOOKBACK} PRECEDING AND 1 PRECEDING)
)
SELECT event_type, hour, n,
       (n - mu) / sigma AS zscore,
       (abs((n - mu) / sigma) > {ZSCORE_FLAG}) AS is_anomaly
FROM scored
WHERE n_lookback = {ZSCORE_LOOKBACK} AND sigma > 0
"""


@register("timeseries_anomaly_zscore", oracle=_ZSCORE_ORACLE, tags=("timeseries",))
def timeseries_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling z-score anomaly flags on per-type hourly event volume
    (trailing ZSCORE_LOOKBACK(=24)-hour mean/stddev, current hour
    excluded; rows with a full lookback only, so the frame contents
    are identical across engines).

    Scale shape: the hourly pre-aggregation collapses the corpus to
    |types| x |hours| rows BEFORE the window — the window input is
    calendar-sized, not event-sized; one shuffle for the groupBy, one
    partition-local window pass."""
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("hour")
    ).agg(F.count("*").alias("n"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("hour")
        .rowsBetween(-ZSCORE_LOOKBACK, -1)
    )
    scored = hourly.select(
        "event_type",
        "hour",
        "n",
        F.avg("n").over(w).alias("mu"),
        F.stddev_samp("n").over(w).alias("sigma"),
        F.count("*").over(w).alias("n_lookback"),
    ).filter(
        (F.col("n_lookback") == ZSCORE_LOOKBACK) & (F.col("sigma") > 0)
    )
    z = (F.col("n") - F.col("mu")) / F.col("sigma")
    return scored.select(
        "event_type",
        "hour",
        "n",
        # unrounded: fixed-decimal round of a sqrt-derived value is
        # engine-divergent on knife-edge values; tolerance absorbs ULPs
        z.alias("zscore"),
        (F.abs(z) > ZSCORE_FLAG).alias("is_anomaly"),
    )


# ---------------------------------------------------------------------------
# Multi-granularity rollup: the hypertable continuous-aggregate shape.
# ---------------------------------------------------------------------------
# One pass over the events produces EVERY granularity of the time
# hierarchy (hour -> day -> month -> grand total) per event type, via
# GROUPING SETS: Spark expands the sets in a single Expand + partial
# aggregate, so the raw events are read and shuffled ONCE for all four
# rollup levels — at 100 TB this replaces four separate aggregation
# jobs (or a serving-time re-aggregation) with one.
_ROLLUP_HIER_ORACLE = """
SELECT event_type,
       CAST(strftime(date_trunc('month', ts), '%Y-%m') AS VARCHAR) AS month,
       CAST(strftime(date_trunc('day', ts), '%Y-%m-%d') AS VARCHAR) AS day,
       CAST(strftime(date_trunc('hour', ts), '%Y-%m-%d %H') AS VARCHAR) AS hour,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       ROUND(SUM(value), 4) AS sum_value,
       CAST(GROUPING(month) + GROUPING(day) + GROUPING(hour) AS BIGINT)
           AS rollup_level
FROM events
GROUP BY event_type, ROLLUP(month, day, hour)
"""


@register(
    "timeseries_rollup_hierarchy",
    oracle=_ROLLUP_HIER_ORACLE,
    tags=("timeseries", "rollup", "aggregation"),
)
def timeseries_rollup_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour/day/month/total rollup per event type in one aggregation:
    ROLLUP over string-truncated time buckets (strings rather than
    timestamps so the NULL-at-higher-level columns stay one atomic
    type per column), with rollup_level = how many hierarchy levels
    are rolled away (0=hourly ... 3=per-type total)."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.date_format(F.date_trunc("month", "ts"), "yyyy-MM").alias("month"),
        F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day"),
        F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH").alias(
            "hour"
        ),
        "value",
    )
    et, mo, dy, hr = (F.col(c) for c in ("event_type", "month", "day", "hour"))
    return ev.groupingSets(
        [[et, mo, dy, hr], [et, mo, dy], [et, mo], [et]],
        et, mo, dy, hr,
    ).agg(
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 4).alias("sum_value"),
        (F.grouping("month") + F.grouping("day") + F.grouping("hour"))
        .cast("long")
        .alias("rollup_level"),
    )


# ---------------------------------------------------------------------------
# Cohort retention: weekly signup cohorts x activity-week offsets.
# ---------------------------------------------------------------------------
_COHORT_ORACLE = """
WITH firsts AS (
  SELECT user_id, date_trunc('week', MIN(ts)) AS cohort_week
  FROM events GROUP BY user_id
),
activity AS (
  SELECT DISTINCT e.user_id, f.cohort_week,
         date_diff('day', f.cohort_week, date_trunc('week', e.ts)) / 7
           AS week_offset
  FROM events e JOIN firsts f ON f.user_id = e.user_id
)
SELECT cohort_week, CAST(week_offset AS BIGINT) AS week_offset,
       CAST(COUNT(*) AS BIGINT) AS n_active_users
FROM activity
GROUP BY cohort_week, week_offset
ORDER BY cohort_week, week_offset
"""


@register(
    "timeseries_cohort_retention",
    oracle=_COHORT_ORACLE,
    tags=("timeseries", "aggregation", "analytic"),
)
def timeseries_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention triangle: users grouped by the week of
    their first event, counted once per subsequent week they were
    active, keyed by the week offset from their cohort.

    Week buckets are Monday-truncated in both engines, so the
    offset — day difference between truncated weeks divided by 7 — is
    exact integer arithmetic, no float drift.

    Scale shape: the first-event groupBy and the join back both hash
    on user_id (one exchange, reused), the distinct collapses to
    (user, offset) granularity before the final count, and the result
    is cohort-weeks x offsets — tiny. The cohort table is user-count
    sized; at 100 TB it would be the persisted `users` dimension and
    the join would broadcast or bucket."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts")
    firsts = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    activity = (
        ev.join(firsts, "user_id")
        .select(
            "user_id",
            "cohort_week",
            (
                F.datediff(F.date_trunc("week", F.col("ts")), F.col("cohort_week"))
                / 7
            )
            .cast("long")
            .alias("week_offset"),
        )
        .distinct()
    )
    return (
        activity.groupBy("cohort_week", "week_offset")
        .agg(F.count("*").alias("n_active_users"))
        .orderBy("cohort_week", "week_offset")
    )


# ---------------------------------------------------------------------------
# EWMA: a sequential recurrence as a per-key array fold.
# ---------------------------------------------------------------------------
_EWMA_ALPHA = 0.3

_EWMA_ORACLE = f"""
WITH seq AS (
  SELECT user_id,
         list(value ORDER BY ts, event_id)::DOUBLE[] AS vals
  FROM events
  WHERE event_type = 'purchase'
  GROUP BY user_id
)
SELECT user_id,
       CAST(len(vals) AS BIGINT) AS n_events,
       ROUND(vals[len(vals)], 4) AS last_value,
       ROUND(list_reduce(vals,
             (acc, x) -> {1 - _EWMA_ALPHA} * acc + {_EWMA_ALPHA} * x), 6)
         AS ewma
FROM seq
"""


@register(
    "timeseries_ewma",
    oracle=_EWMA_ORACLE,
    tags=("timeseries", "aggregation"),
)
def timeseries_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially weighted moving average per user — a RECURRENCE
    (ewma_t = (1-α)·ewma_{t-1} + α·x_t), which no window frame can
    express and no parallel reduction can reorder. The distributed
    answer: one shuffle groups each key's ordered history, then the
    fold runs map-side as an array-reduce higher-order function —
    sequential per key, parallel across keys. DuckDB's list_reduce
    replays the identical left fold, so the hash gate covers every
    intermediate step of the recurrence.

    100 TB shape: one exchange on the key; state per key is its event
    array (bound the history window if keys are unbounded — the fold
    composes with slice()). The recurrence itself never crosses a
    partition boundary, which is exactly why it costs nothing beyond
    the groupBy."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    seq = (
        ev.groupBy("user_id")
        .agg(
            F.expr(
                "transform(array_sort(collect_list(struct(ts, event_id, value))), "
                "s -> cast(s.value AS double))"
            ).alias("vals")
        )
    )
    fold = (
        f"aggregate(slice(vals, 2, greatest(size(vals) - 1, 0)), "
        f"cast(element_at(vals, 1) AS double), "
        f"(acc, x) -> {1 - _EWMA_ALPHA}D * acc + {_EWMA_ALPHA}D * x)"
    )
    return seq.selectExpr(
        "user_id",
        "cast(size(vals) AS bigint) AS n_events",
        "round(element_at(vals, size(vals)), 4) AS last_value",
        f"round({fold}, 6) AS ewma",
    )


# ---------------------------------------------------------------------------
# Linear interpolation across gaps (the ffill twin for continuous series).
# ---------------------------------------------------------------------------
# Interpolates the hourly event-count series per type: empty hours get
# prev + (next - prev) * elapsed/gap between the surrounding observed
# hours. Counts (exact integers) are interpolated rather than averages
# so both engines run bit-identical double arithmetic — an AVG input
# can differ at the ULP between engines and a multiply would amplify it
# past the driver's canonical formatting.
_INTERP_ORACLE = """
WITH ev AS (
  SELECT date_trunc('hour', ts) AS h, event_type FROM events
),
b AS (SELECT MIN(h) AS lo, MAX(h) AS hi FROM ev),
cal AS (
  SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hour FROM b
),
types AS (SELECT DISTINCT event_type FROM ev),
hourly AS (
  SELECT event_type, h AS hour, CAST(COUNT(*) AS BIGINT) AS n
  FROM ev GROUP BY event_type, h
),
grid AS (
  SELECT t.event_type, c.hour, hl.n
  FROM types t CROSS JOIN cal c
  LEFT JOIN hourly hl ON hl.event_type = t.event_type AND hl.hour = c.hour
),
bounded AS (
  SELECT event_type, hour, n,
         last_value(n IGNORE NULLS) OVER (
           PARTITION BY event_type ORDER BY hour
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_n,
         last_value(CASE WHEN n IS NOT NULL THEN hour END IGNORE NULLS) OVER (
           PARTITION BY event_type ORDER BY hour
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_h,
         first_value(n IGNORE NULLS) OVER (
           PARTITION BY event_type ORDER BY hour
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_n,
         first_value(CASE WHEN n IS NOT NULL THEN hour END IGNORE NULLS) OVER (
           PARTITION BY event_type ORDER BY hour
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_h
  FROM grid
)
SELECT event_type, hour, n AS n_observed,
       CASE WHEN n IS NOT NULL THEN CAST(n AS DOUBLE)
            ELSE CAST(prev_n AS DOUBLE)
                 + CAST(next_n - prev_n AS DOUBLE)
                   * (CAST(epoch(hour) - epoch(prev_h) AS DOUBLE)
                      / CAST(epoch(next_h) - epoch(prev_h) AS DOUBLE))
       END AS n_interp
FROM bounded
WHERE prev_n IS NOT NULL AND next_n IS NOT NULL
"""


@register(
    "timeseries_interp_linear", oracle=_INTERP_ORACLE, tags=("timeseries",)
)
def timeseries_interp_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear interpolation of the hourly event-count series per
    event_type: gap hours get the value linearly interpolated between
    the surrounding observations (the continuous-series twin of
    timeseries_resample_ffill's step-function fill). Rows outside the
    first/last observation are dropped — extrapolation is a modelling
    choice, not a fill.

    100 TB shape: identical to the other grid queries — one map-side
    partial aggregation over events, then two windows over the
    |types| x |hours| grid (whose size is independent of event count).
    The forward/backward scans are single-pass unbounded row frames,
    not self-joins."""
    ev = load_table(spark, sf_dir, "events").select(
        F.date_trunc("hour", "ts").alias("hour"), "event_type"
    )
    hourly = (
        ev.groupBy("event_type", "hour")
        .agg(F.count("*").alias("n"))
        .persist()
    )
    cal = hourly.agg(F.min("hour").alias("lo"), F.max("hour").alias("hi")).select(
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))).alias("hour")
    )
    types = hourly.select("event_type").distinct()
    grid = types.crossJoin(F.broadcast(cal)).join(
        hourly, ["event_type", "hour"], "left"
    )
    back = (
        Window.partitionBy("event_type")
        .orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    fwd = (
        Window.partitionBy("event_type")
        .orderBy("hour")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    obs_hour = F.when(F.col("n").isNotNull(), F.col("hour"))
    bounded = grid.select(
        "event_type",
        "hour",
        "n",
        F.last("n", ignorenulls=True).over(back).alias("prev_n"),
        F.last(obs_hour, ignorenulls=True).over(back).alias("prev_h"),
        F.first("n", ignorenulls=True).over(fwd).alias("next_n"),
        F.first(obs_hour, ignorenulls=True).over(fwd).alias("next_h"),
    )
    frac = (
        F.unix_timestamp("hour") - F.unix_timestamp("prev_h")
    ).cast("double") / (
        F.unix_timestamp("next_h") - F.unix_timestamp("prev_h")
    ).cast("double")
    interp = F.when(
        F.col("n").isNotNull(), F.col("n").cast("double")
    ).otherwise(
        F.col("prev_n").cast("double")
        + (F.col("next_n") - F.col("prev_n")).cast("double") * frac
    )
    return bounded.filter(
        F.col("prev_n").isNotNull() & F.col("next_n").isNotNull()
    ).select(
        "event_type",
        "hour",
        F.col("n").alias("n_observed"),
        interp.alias("n_interp"),
    )


# ---------------------------------------------------------------------------
# Rolling trend slope (windowed OLS from compositional sums).
# ---------------------------------------------------------------------------
# Per-type slope of the hourly event-count series over the trailing 24
# observed hours: slope = (n*Sxy - Sx*Sy) / (n*Sxx - Sx^2), assembled
# from four plain window SUMs. x is epoch-hours RE-BASED to the
# window's own first hour — absolute epoch seconds squared overflow
# the exact-integer range of doubles (and eventually BIGINT) at
# n*Sxx scale; the rebase keeps every sum small and exact, and slope
# is translation-invariant so the result is identical.
_SLOPE_LOOKBACK = 24

_ROLLING_SLOPE_ORACLE = f"""
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS hour,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY event_type, hour
),
rebased AS (
  SELECT event_type, hour, n,
         epoch(hour) // 3600
           - MIN(epoch(hour) // 3600) OVER (PARTITION BY event_type) AS xr
  FROM hourly
),
xy AS (
  SELECT event_type, hour, n,
         CAST(COUNT(*) OVER w AS BIGINT) AS cnt,
         SUM(xr) OVER w AS sx,
         SUM(n) OVER w AS sy,
         SUM(xr * xr) OVER w AS sxx,
         SUM(xr * n) OVER w AS sxy
  FROM rebased
  WINDOW w AS (PARTITION BY event_type ORDER BY hour
               ROWS BETWEEN {_SLOPE_LOOKBACK - 1} PRECEDING AND CURRENT ROW)
)
SELECT event_type, hour, n,
       CAST(cnt * sxy - sx * sy AS DOUBLE)
         / CAST(cnt * sxx - sx * sx AS DOUBLE) AS slope
FROM xy
WHERE cnt = {_SLOPE_LOOKBACK} AND cnt * sxx - sx * sx <> 0
"""


@register(
    "timeseries_rolling_slope",
    oracle=_ROLLING_SLOPE_ORACLE,
    tags=("timeseries", "window", "stats"),
)
def timeseries_rolling_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling OLS slope of hourly volumes per event_type (trailing
    24 observed hours) from four compositional window SUMs — the
    trend-detection feature a monitoring/feature pipeline derives
    without a per-window model fit. Integer sums over rebased x keep
    both engines' arithmetic exact until the single final division.

    100 TB shape: one map-side aggregation to the hourly grid, one
    window exchange on event_type — the window never touches raw
    events, and the four sums share a single frame scan."""
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hour")
    ).agg(F.count("*").alias("n"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("hour")
        .rowsBetween(-(_SLOPE_LOOKBACK - 1), Window.currentRow)
    )
    xh = F.floor(F.unix_timestamp("hour") / 3600).cast("long")
    rebased = hourly.withColumn(
        "xr", xh - F.min(xh).over(Window.partitionBy("event_type"))
    )
    xr = F.col("xr")
    scored = rebased.select(
        "event_type",
        "hour",
        "n",
        F.count("*").over(w).alias("cnt"),
        F.sum(xr).over(w).alias("sx"),
        F.sum("n").over(w).alias("sy"),
        F.sum(xr * xr).over(w).alias("sxx"),
        F.sum(xr * F.col("n")).over(w).alias("sxy"),
    )
    denom = F.col("cnt") * F.col("sxx") - F.col("sx") * F.col("sx")
    return scored.filter(
        (F.col("cnt") == _SLOPE_LOOKBACK) & (denom != 0)
    ).select(
        "event_type",
        "hour",
        "n",
        (
            (F.col("cnt") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
                "double"
            )
            / denom.cast("double")
        ).alias("slope"),
    )


# ---------------------------------------------------------------------------
# Seasonal decomposition (hour-of-day profile + residuals).
# ---------------------------------------------------------------------------
_SEASONAL_ORACLE = """
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS hour,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY event_type, hour
),
seasonal AS (
  SELECT event_type, EXTRACT(hour FROM hour) AS hod,
         SUM(n) AS s, COUNT(*) AS c
  FROM hourly GROUP BY event_type, hod
)
SELECT h.event_type, h.hour, h.n,
       CAST(s.s AS DOUBLE) / s.c AS seasonal_mean,
       h.n - CAST(s.s AS DOUBLE) / s.c AS residual
FROM hourly h
JOIN seasonal s
  ON s.event_type = h.event_type AND s.hod = EXTRACT(hour FROM h.hour)
"""


@register(
    "timeseries_seasonal_decompose",
    oracle=_SEASONAL_ORACLE,
    tags=("timeseries", "stats", "aggregation"),
)
def timeseries_seasonal_decompose(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Naive seasonal decomposition of per-type hourly volumes: the
    hour-of-day seasonal profile (mean volume at each of the 24 clock
    hours) and each observation's deseasonalized residual — the
    pre-step that makes anomaly scores compare 3am to 3am. Integer
    sums/counts keep the division bit-identical across engines.

    100 TB shape: one corpus exchange to the hourly grid; the
    seasonal profile is |types| x 24 rows, broadcast back."""
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hour")
    ).agg(F.count("*").alias("n"))
    seasonal = (
        hourly.withColumn("hod", F.hour("hour"))
        .groupBy("event_type", "hod")
        .agg(F.sum("n").alias("s"), F.count("*").alias("c"))
        .withColumn(
            "seasonal_mean", F.col("s").cast("double") / F.col("c")
        )
        .select("event_type", "hod", "seasonal_mean")
    )
    return (
        hourly.withColumn("hod", F.hour("hour"))
        .join(F.broadcast(seasonal), ["event_type", "hod"])
        .select(
            "event_type",
            "hour",
            "n",
            "seasonal_mean",
            (F.col("n") - F.col("seasonal_mean")).alias("residual"),
        )
    )

"""Python-boundary function surface: scalar Arrow-vectorized pandas
UDF and a Python UDTF (table function). Completes the UDF matrix next
to mapInPandas (multimodal.py), applyInPandas (sketches.py), and
applyInPandasWithState (streaming/jobs.py).

No reference counterpart (SURVEY.md §2.5 "UDF/UDAF/UDTF surface:
none") — API-surface extension.

Scale notes (100 TB stance):
- the scalar pandas UDF crosses to Python in Arrow batches (~10k rows
  per crossing), vectorized end-to-end in numpy — the acceptable
  Python path. It exists here to prove the boundary; an expression
  this simple (a sigmoid) would ship as built-in ``F.exp`` arithmetic
  in a real hot path.
- the Python UDTF is row-at-a-time by contract (eval() per input row,
  yield per output row) — the SLOW path, kept because table functions
  are the only way to express some expansions in user code. The
  docstring of the query says so; at 100 TB this exact expansion
  would be the JVM ``explode(split(...))`` (that equivalence is what
  the DuckDB oracle checks).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf, udtf
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from golang_etl_spark.registry import register
from golang_etl_spark.sources.catalog import load_table, register_views

MIN_WORD_LEN = 6


@pandas_udf(DoubleType())
def _sigmoid_score(value: pd.Series) -> pd.Series:
    # numpy over the whole Arrow batch — zero per-row Python. The
    # formula is written identically to the oracle's SQL (1/(1+exp))
    # so both engines run the same double operations. DoubleType()
    # (not the "double" DDL string): string types parse through the
    # active SparkSession, which doesn't exist at import time.
    return 1.0 / (1.0 + np.exp(-value / 100.0))


_PANDAS_UDF_ORACLE = """
SELECT event_id, event_type,
       1.0 / (1.0 + exp(-value / 100.0)) AS score
FROM events
WHERE event_type IN ('view', 'click')
"""


@register(
    "pandasudf_scalar_score", oracle=_PANDAS_UDF_ORACLE, tags=("pandas_udf",)
)
def pandasudf_scalar_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar pandas UDF: a bounded activity score (sigmoid of scaled
    value) computed in Arrow-batched numpy. Emitted unrounded — numpy
    and DuckDB libm exp() may differ at 1 ULP, which the comparator's
    relative tolerance absorbs but fixed-decimal rounding would
    amplify (see timeseries_resample_ffill)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.filter(F.col("event_type").isin("view", "click")).select(
        "event_id", "event_type", _sigmoid_score("value").alias("score")
    )


class _SplitWordsUDTF:
    """Yield (position, word) per whitespace token of one document —
    the UDTF contract: eval() once per input row, yield once per
    output row. Wrapped with ``udtf(...)`` inside the query (not via
    decorator at module scope: a DDL-string returnType parses through
    the active SparkSession, which doesn't exist at import time)."""

    def eval(self, text: str):
        if text is None:
            return
        for i, w in enumerate(text.split()):
            yield i + 1, w


_UDTF_SCHEMA = StructType(
    [
        StructField("pos", IntegerType()),
        StructField("word", StringType()),
    ]
)


_UDTF_ORACLE = f"""
WITH posting AS (
  SELECT doc_id, i.i AS pos, w[i.i] AS word
  FROM (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w
        FROM documents) v,
       LATERAL (SELECT unnest(range(1, len(v.w) + 1)) AS i) i
)
SELECT word,
       CAST(COUNT(*) AS BIGINT) AS n_occurrences,
       CAST(MIN(pos) AS BIGINT) AS min_pos
FROM posting
WHERE length(word) >= {MIN_WORD_LEN}
GROUP BY word
"""


@register("udtf_word_positions", oracle=_UDTF_ORACLE, tags=("udtf",))
def udtf_word_positions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF in a LATERAL join: tokenize each document into
    (pos, word) rows, then aggregate long words. Row-at-a-time Python
    — the API-completeness demo, NOT the hot path: the oracle proves
    it computes exactly what JVM ``posexplode(split(...))`` computes,
    which is what production code should use."""
    register_views(spark, sf_dir, ("documents",))
    # idempotent: re-registering replaces the identical class (the
    # UDTF is a module-level constant) and logs a
    # SimpleTableFunctionRegistry WARN per repeat run that crowds the
    # bench's driver stdout tail (VERDICT r11 nit #1) — skip instead
    if not spark.catalog.functionExists("split_words"):
        spark.udtf.register(
            "split_words", udtf(_SplitWordsUDTF, returnType=_UDTF_SCHEMA)
        )
    return spark.sql(
        f"""
        SELECT s.word,
               CAST(COUNT(*) AS BIGINT) AS n_occurrences,
               CAST(MIN(s.pos) AS BIGINT) AS min_pos
        FROM documents d,
             LATERAL split_words(d.text) s
        WHERE length(s.word) >= {MIN_WORD_LEN}
        GROUP BY s.word
        """
    )


# ---------------------------------------------------------------------------
# Cogroup: the two-frame Arrow boundary (applyInPandas over cogroup).
# ---------------------------------------------------------------------------
# The last cell of the Python-boundary matrix: two DataFrames grouped
# on the same key, each group pair handed to pandas TOGETHER. The
# demonstration reconciles orders against their lineitems per order
# key — the "does the header total match the sum of the lines"
# audit every ETL pipeline runs — which needs both sides at once and
# so can't be a single-frame applyInPandas.
_COGROUP_ORACLE = """
SELECT o.o_orderkey,
       CAST(COUNT(l.l_orderkey) AS BIGINT) AS n_lines,
       ROUND(o.o_totalprice, 2) AS header_total,
       ROUND(COALESCE(SUM(l.l_extendedprice * (1 - l.l_discount)
                          * (1 + l.l_tax)), 0.0), 2) AS lines_total
FROM orders o LEFT JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE o.o_orderkey < 500
GROUP BY o.o_orderkey, o.o_totalprice
"""


@register(
    "cogroup_order_reconciliation", oracle=_COGROUP_ORACLE, tags=("udf",)
)
def cogroup_order_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-order header-vs-lines reconciliation through
    ``cogroup(...).applyInPandas``: each order's header rows and line
    rows arrive in the same pandas pair, the function emits line count
    and both totals.

    Scale shape: both sides shuffle once on the shared bucket key (the
    same exchange a join would pay). Cogrouping directly on
    o_orderkey would ship one Arrow pair per order — the per-group
    Python constant dominates (measured 2.6x slower at sf0.1); like
    applyinpandas_rank_orders, grouping on a hash BUCKET of the key
    keeps each order's rows together while amortizing the round-trip
    over many orders per pair, and a vectorized in-pandas groupby
    restores per-order semantics. Arrow-batched, never per-row. The
    key-slice filter pushes into both scans."""
    import pandas as pd

    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") < 500)
        .select("o_orderkey", "o_totalprice")
    )
    lines = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") < 500)
        .select("l_orderkey", "l_extendedprice", "l_discount", "l_tax")
    )

    def round_half_up(s) -> "pd.Series":
        # builtin/numpy round is banker's (half-to-even); the DuckDB
        # oracle's ROUND is std::round(x*100)/100 — half away from
        # zero on the binary double. Comparing the fractional part of
        # v=x*100 against 0.5 replays that exactly; the naive
        # floor(v + 0.5) diverges when v + 0.5 rounds UP to the next
        # representable double (v = 0.49999999999999994 et al.).
        import numpy as np

        v = s.to_numpy(dtype="float64") * 100.0
        f = np.floor(v)
        return (f + (v - f >= 0.5)) / 100.0

    def reconcile(key, odf: pd.DataFrame, ldf: pd.DataFrame) -> pd.DataFrame:
        cols = ["o_orderkey", "n_lines", "header_total", "lines_total"]
        if odf.empty:  # orphan lines (no header) — mirror the LEFT JOIN
            return pd.DataFrame(columns=cols)
        if ldf.empty:
            agg = pd.DataFrame({"o_orderkey": [], "n_lines": [], "lt": []})
        else:
            net = (
                ldf["l_extendedprice"]
                * (1 - ldf["l_discount"])
                * (1 + ldf["l_tax"])
            )
            agg = (
                ldf.assign(net=net)
                .groupby("l_orderkey")["net"]
                .agg(n_lines="size", lt="sum")
                .reset_index()
                .rename(columns={"l_orderkey": "o_orderkey"})
            )
        m = odf[["o_orderkey", "o_totalprice"]].merge(
            agg, on="o_orderkey", how="left"
        )
        return pd.DataFrame(
            {
                "o_orderkey": m["o_orderkey"].astype("int64"),
                "n_lines": m["n_lines"].fillna(0).astype("int64"),
                "header_total": round_half_up(m["o_totalprice"]),
                "lines_total": round_half_up(m["lt"].fillna(0.0)),
            }
        )

    buckets = 32
    ob = orders.withColumn("b", F.pmod(F.hash("o_orderkey"), F.lit(buckets)))
    lb = lines.withColumn("b", F.pmod(F.hash("l_orderkey"), F.lit(buckets)))
    return (
        ob.groupBy("b")
        .cogroup(lb.groupBy("b"))
        .applyInPandas(
            reconcile,
            "o_orderkey LONG, n_lines LONG, header_total DOUBLE, "
            "lines_total DOUBLE",
        )
    )


# ---------------------------------------------------------------------------
# Grouped-aggregate pandas UDF — the UDAF cell of the matrix.
# ---------------------------------------------------------------------------
_UDAF_ORACLE = """
SELECT l_returnflag,
       CAST(COUNT(*) AS BIGINT) AS n_lines,
       ROUND(SUM(l_extendedprice * l_quantity) / SUM(l_quantity), 4)
         AS wavg_price
FROM lineitem
GROUP BY l_returnflag
"""


@register(
    "pandasudaf_weighted_avg", oracle=_UDAF_ORACLE, tags=("udf", "aggregation")
)
def pandasudaf_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity-weighted average price per return flag through a
    GROUPED_AGG pandas UDF — the custom-aggregator cell of the Python
    boundary (scalar / grouped-map / map-iter / cogroup / UDTF are
    covered elsewhere). The UDF receives each group's columns as
    pandas Series over Arrow and reduces to one scalar.

    Scale note: unlike JVM aggregates, grouped-agg pandas UDFs do NOT
    partial-aggregate map-side — the whole group's rows cross to
    Python after the shuffle. Acceptable for bounded groups (6 flags
    here); for unbounded groups prefer the equivalent built-in
    expression, which this oracle deliberately mirrors so the
    trade-off is visible."""
    @pandas_udf("double")
    def wavg(price: pd.Series, qty: pd.Series) -> float:
        return float((price * qty).sum() / qty.sum())

    # a grouped-agg pandas UDF cannot share agg() with built-in
    # aggregates (INVALID_PANDAS_UDF_PLACEMENT) — so the row count is
    # a pandas aggregate too
    @pandas_udf("long")
    def n_rows(qty: pd.Series) -> int:
        return int(len(qty))

    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            n_rows(F.col("l_quantity")).alias("n_lines"),
            F.round(
                wavg(F.col("l_extendedprice"), F.col("l_quantity")), 4
            ).alias("wavg_price"),
        )
    )


# ---------------------------------------------------------------------------
# Arrow-optimized Python UDF (Spark 4 `useArrow=True`).
# ---------------------------------------------------------------------------
def _digit_sum(s: str) -> int:
    # deliberately row-at-a-time Python: the point is the TRANSPORT —
    # with useArrow=True the rows move JVM<->Python as Arrow batches
    # (one serialization per batch) instead of pickled one at a time.
    return sum(int(ch) for ch in s if ch.isdigit())


_ARROW_UDF_ORACLE = """
SELECT c_custkey,
       CAST(list_aggregate(
         list_transform(regexp_extract_all(c_name, '[0-9]'), x -> x::INT),
         'sum') AS BIGINT) AS digit_sum
FROM customer
WHERE c_custkey <= 1000
"""


@register(
    "udf_arrow_scalar", oracle=_ARROW_UDF_ORACLE, tags=("udf", "pandas_udf")
)
def udf_arrow_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-optimized scalar Python UDF (``F.udf(..., useArrow=True)``,
    Spark 4): the function body is ordinary per-row Python, but rows
    cross the JVM/Python boundary as Arrow record batches — closing
    most of the 10-100x gap between pickled row-at-a-time UDFs and
    pandas UDFs while keeping the simple scalar signature.

    Placement in the UDF ladder (all registered surfaces): built-in
    functions >> pandas_udf (vectorized body, pandasudf_scalar_score)
    > arrow-optimized udf (scalar body, THIS) >> legacy pickled udf
    (never used in this repo). Use this tier when the body resists
    vectorization (deep branching, per-row library calls)."""
    import pyspark.sql.functions as SF

    digit_sum = SF.udf(_digit_sum, returnType="long", useArrow=True)
    cust = load_table(spark, sf_dir, "customer")
    return (
        cust.filter(F.col("c_custkey") <= 1000)
        .select("c_custkey", digit_sum("c_name").alias("digit_sum"))
    )


# ---------------------------------------------------------------------------
# Polymorphic UDTF (Spark 4 `analyze`): schema computed from arguments.
# ---------------------------------------------------------------------------
_POLY_UDTF_ORACLE = """
SELECT o_orderkey, col_name, val FROM (
  SELECT o_orderkey, 'o_orderstatus' AS col_name,
         o_orderstatus AS val FROM orders WHERE o_orderkey <= 500
  UNION ALL
  SELECT o_orderkey, 'o_orderpriority', o_orderpriority
  FROM orders WHERE o_orderkey <= 500
)
ORDER BY o_orderkey, col_name
"""


@register(
    "udtf_polymorphic_unpivot",
    oracle=_POLY_UDTF_ORACLE,
    tags=("udtf", "unpivot"),
)
def udtf_polymorphic_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Polymorphic Python UDTF (Spark 4 ``analyze`` static method):
    the output schema is DERIVED from the input struct at plan time —
    one generic unpivot UDTF serves any column set, where a plain UDTF
    must hard-code its returnType. Demonstrated as a dynamic unpivot
    of two order columns, hash-checked against the UNION ALL oracle.

    Scale note: same execution profile as any Python UDTF (Arrow
    batches through the Python worker) — the analyze() call happens
    ONCE on the driver at planning, adding zero per-row cost. Prefer
    the built-in stack()/unpivot for production unpivots
    (unpivot_stack); this registers the extensibility surface."""
    from pyspark.sql.functions import udtf as _udtf
    from pyspark.sql.types import StringType, StructField, StructType
    from pyspark.sql.udtf import AnalyzeArgument, AnalyzeResult

    @_udtf
    class UnpivotPoly:
        @staticmethod
        def analyze(row: AnalyzeArgument) -> AnalyzeResult:
            # schema derived from the incoming struct: one (name, val)
            # pair per field — this is what "polymorphic" buys
            fields = [
                StructField("col_name", StringType()),
                StructField("val", StringType()),
            ]
            assert row.dataType.fieldNames(), "struct argument required"
            return AnalyzeResult(StructType(fields))

        def eval(self, row):
            for k, v in row.asDict().items():
                yield (k, None if v is None else str(v))

    # idempotent for the same reason as split_words: the class body is
    # deterministic, so the first registration is always equivalent
    if not spark.catalog.functionExists("unpivot_poly_q"):
        spark.udtf.register("unpivot_poly_q", UnpivotPoly)
    register_views(spark, sf_dir, ("orders",))
    # The key filter lives INSIDE the derived table, not in an outer
    # WHERE: Catalyst does not push a filter below a LATERAL Python
    # UDTF join, so the outer-WHERE form ran every orders row through
    # the per-row Python eval and filtered afterwards (plan: Filter
    # ABOVE BatchEvalPythonUDTF; measured 3.4s at sf0.1). Filtering in
    # the subquery reaches the parquet scan (PushedFilters) and the
    # UDTF sees only the ~500 selected rows — identical result, and at
    # any scale the Python boundary cost tracks the SELECTED rows
    # instead of the corpus (guide §4.1: pass only what the UDTF
    # needs).
    return spark.sql(
        """
        SELECT o.o_orderkey, u.col_name, u.val
        FROM (SELECT o_orderkey, o_orderstatus, o_orderpriority
              FROM orders WHERE o_orderkey <= 500) o,
        LATERAL unpivot_poly_q(struct(o.o_orderstatus, o.o_orderpriority)) u
        ORDER BY o.o_orderkey, u.col_name
        """
    )


# ---------------------------------------------------------------------------
# mapInArrow: the zero-conversion tier of the Python boundary.
# ---------------------------------------------------------------------------
# mapInPandas converts every Arrow batch to pandas and back; mapInArrow
# hands the RecordBatch itself to Python. For purely columnar kernels
# (pyarrow.compute, numpy via zero-copy buffers) that skips two
# copies/conversions per batch — the fastest Python tier below
# staying JVM-side entirely.
_ARROW_NET_ORACLE = """
SELECT l_orderkey, l_linenumber,
       l_extendedprice * (1 - l_discount) AS net_price
FROM lineitem
WHERE l_quantity >= 45
"""


def _arrow_net_batches(batches):
    import pyarrow as pa
    import pyarrow.compute as pc

    for b in batches:
        net = pc.multiply(
            b.column("l_extendedprice"),
            pc.subtract(pa.scalar(1.0), b.column("l_discount")),
        )
        yield pa.RecordBatch.from_arrays(
            [b.column("l_orderkey"), b.column("l_linenumber"), net],
            names=["l_orderkey", "l_linenumber", "net_price"],
        )


@register(
    "udf_map_in_arrow",
    oracle=_ARROW_NET_ORACLE,
    tags=("udf", "pandas_udf"),
)
def udf_map_in_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Net price via ``mapInArrow``: the Python worker receives raw
    Arrow RecordBatches and answers with pyarrow.compute kernels — no
    pandas materialization at all. The multiply/subtract run the same
    IEEE double ops as the engines, so results are bit-identical to
    the oracle with no rounding.

    Scale note: the l_quantity filter and 4-column projection still
    push to the parquet scan (they precede the Python boundary in the
    plan); mapInArrow only ever sees the filtered, pruned batches."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_quantity") >= 45)
        .select("l_orderkey", "l_linenumber", "l_extendedprice", "l_discount")
        .mapInArrow(
            _arrow_net_batches,
            "l_orderkey long, l_linenumber int, net_price double",
        )
    )

"""Functional-dependency discovery — constraint profiling.

For candidate column pairs X -> Y, compare COUNT(DISTINCT X) with
COUNT(DISTINCT (X, Y)): equality means every X value maps to exactly
one Y (the dependency holds); the difference counts X values with
conflicting Y — the violation mass a migration validator or schema
normalizer needs (Metanome-style FD profiling, reduced to the
agreement statistics that matter at warehouse scale).

All pairs over one table fuse into a SINGLE aggregate row (2 distinct
counts per candidate), then unpivot to one row per candidate — each
table is scanned once with only the candidate columns read. Exact
multi-distinct pays Spark's Expand (~2 rows/input per distinct, the
same documented trade as profile_orders; swap in approx_count_distinct
for the 100 TB screening pass, keeping exact for the confirm pass).

Reference parity: /root/reference migrates tables without discovering
or checking any inter-column constraint; beyond-reference extension
per the build brief.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from golang_etl_spark.registry import register
from golang_etl_spark.sources.catalog import load_table

# (table, determinant X, dependent Y)
_CANDIDATES = (
    ("orders", "o_orderkey", "o_custkey"),       # PK -> anything: holds
    ("orders", "o_custkey", "o_orderpriority"),  # violated: customers reorder
    ("lineitem", "l_orderkey", "l_returnflag"),  # violated: mixed lines
    ("lineitem", "l_partkey", "l_suppkey"),      # does one part pin a supplier?
)

_FDEPS_ORACLE = " UNION ALL ".join(
    f"""
SELECT '{t}' AS table_name, '{x} -> {y}' AS candidate,
       CAST(COUNT(DISTINCT {x}) AS BIGINT) AS n_lhs,
       CAST(COUNT(DISTINCT ({x}, {y})) AS BIGINT) AS n_pairs,
       CAST(COUNT(DISTINCT ({x}, {y})) = COUNT(DISTINCT {x}) AS INT)
         AS fd_holds,
       CAST(COUNT(DISTINCT ({x}, {y})) - COUNT(DISTINCT {x}) AS BIGINT)
         AS violating_lhs
FROM {t}"""
    for t, x, y in _CANDIDATES
)


@register(
    "profile_functional_deps",
    oracle=_FDEPS_ORACLE,
    tags=("profiling", "etl-parity", "stats"),
)
def profile_functional_deps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row per candidate FD: distinct determinants, distinct
    (determinant, dependent) pairs, a holds flag, and the number of
    determinant values with conflicting dependents. Candidates sharing
    a table share its scan (one fused aggregate per table)."""
    parts = []
    by_table: dict[str, list[tuple[str, str]]] = {}
    for t, x, y in _CANDIDATES:
        by_table.setdefault(t, []).append((x, y))
    for t, pairs in by_table.items():
        aggs = []
        for x, y in pairs:
            aggs.append(F.countDistinct(x).alias(f"lhs__{x}__{y}"))
            aggs.append(F.countDistinct(x, y).alias(f"pair__{x}__{y}"))
        one = load_table(spark, sf_dir, t).agg(*aggs)
        stack_args = ", ".join(
            f"'{x} -> {y}', `lhs__{x}__{y}`, `pair__{x}__{y}`"
            for x, y in pairs
        )
        parts.append(
            one.selectExpr(
                f"stack({len(pairs)}, {stack_args})"
                " AS (candidate, n_lhs, n_pairs)"
            ).selectExpr(
                f"'{t}' AS table_name",
                "candidate",
                "CAST(n_lhs AS BIGINT) AS n_lhs",
                "CAST(n_pairs AS BIGINT) AS n_pairs",
                "CAST(n_pairs = n_lhs AS INT) AS fd_holds",
                "CAST(n_pairs - n_lhs AS BIGINT) AS violating_lhs",
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out

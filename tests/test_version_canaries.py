"""Spark-version canaries for the exact-regime oracle gates.

Three registry families carry DuckDB hash oracles whose validity rests
on pinned engine behavior rather than SQL semantics (VERDICT r11 ask
#5 asked for these assumptions collected in ONE file with their blast
radius):

1. HLL++ ``approx_count_distinct`` truncates to EXACTLY n in the
   linear-counting regime when the internal hash is collision-free
   over the column's fixed values (sketches.py, profiling.py).
   Registry rows that flip red if a Spark bump changes that hash:
   ``sketch_approx_distinct``, ``profile_orders_approx_bounded``.
2. Apache DataSketches HLL (``hll_sketch_agg`` / ``hll_union_agg`` /
   ``hll_sketch_estimate``) stays in sparse coupon (LIST) mode on
   tiny domains, where estimates — unions included — are exact longs
   (sketches.py:327-345). Rows at risk on a coupon-threshold change:
   ``sketch_hll_store_merge`` (and, indirectly, the <=5% bounds
   checked against ``sketch_hll_exact_twin``).
3. ``percentile_approx`` at accuracy >= rows-per-group has rank error
   < 1, so the returned value is the exact discrete quantile and
   matches DuckDB ``quantile_disc`` at mid-bucket probe fractions
   (sketches.py _PCT_ACCURACY/_PCT_FRACTIONS). Rows at risk on a
   quantile-summary rank-convention change:
   ``sketch_percentile_approx``, ``agg_percentile_within_group``.

Each probe below is the CHEAP version of the claim (sf0.001, one
aggregate each). If one fails after a version bump, the named rows
will mismatch at driver time with no semantic bug — re-verify the
exact-regime claim per the owning docstring instead of debugging the
operator.
"""

import duckdb
import pyspark
from pyspark.sql import functions as F

from golang_etl_spark.sources.catalog import load_table


def test_pyspark_version_is_the_pinned_line():
    """The exact-regime claims were verified on Spark 4.1.x (the
    baked-in engine). A different minor line invalidates the pin —
    every probe in this file must then be re-run deliberately, not
    discovered row-by-row at driver time."""
    assert pyspark.__version__.startswith("4.1."), pyspark.__version__


def test_hllpp_exact_regime_on_fixed_tiny_domains(spark, sf_dir):
    """Probe 1: approx_count_distinct(rsd=0.02) == COUNT(DISTINCT) for
    the fixed value sets the hash-gated rows rely on (o_orderstatus 3
    values, o_orderpriority 5, l_returnflag x l_linestatus per-group 3)
    — collision-freeness of Spark's HLL++ hash over exactly these
    strings, not a generic small-domain claim."""
    orders = load_table(spark, sf_dir, "orders")
    row = orders.agg(
        F.approx_count_distinct("o_orderstatus", rsd=0.02).alias("a_status"),
        F.count_distinct("o_orderstatus").alias("e_status"),
        F.approx_count_distinct("o_orderpriority", rsd=0.02).alias("a_prio"),
        F.count_distinct("o_orderpriority").alias("e_prio"),
    ).collect()[0]
    assert row["a_status"] == row["e_status"], row
    assert row["a_prio"] == row["e_prio"], row

    li = load_table(spark, sf_dir, "lineitem")
    per_group = li.groupBy("l_linestatus").agg(
        F.approx_count_distinct("l_returnflag", rsd=0.02).alias("a"),
        F.count_distinct("l_returnflag").alias("e"),
    ).collect()
    assert per_group, "empty lineitem fixture"
    for r in per_group:
        assert r["a"] == r["e"], r


def test_datasketches_hll_list_mode_exact_including_unions(spark, sf_dir):
    """Probe 2: DataSketches HLL sketches over the 5-value
    o_orderpriority domain estimate exactly, and a union of per-group
    sketches stays exact (LIST-mode coupons merge losslessly)."""
    orders = load_table(spark, sf_dir, "orders").withColumn(
        "half", F.month("o_orderdate") % 2
    )
    per_half = orders.groupBy("half").agg(
        F.hll_sketch_agg("o_orderpriority").alias("sk"),
        F.count_distinct("o_orderpriority").alias("exact"),
    )
    for r in per_half.select(
        F.hll_sketch_estimate("sk").alias("est"), "exact"
    ).collect():
        assert r["est"] == r["exact"], r
    merged = per_half.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est")
    ).collect()[0]["est"]
    exact_all = orders.agg(
        F.count_distinct("o_orderpriority")
    ).collect()[0][0]
    assert merged == exact_all, (merged, exact_all)


def test_percentile_approx_exact_at_high_accuracy_vs_quantile_disc(
    spark, sf_dir
):
    """Probe 3: percentile_approx at the registered accuracy/fractions
    equals DuckDB quantile_disc bit-for-bit — the cross-engine rank
    convention the hash-gated percentile rows assume."""
    from golang_etl_spark.operators.sketches import (
        _PCT_ACCURACY,
        _PCT_FRACTIONS,
    )

    li = load_table(spark, sf_dir, "lineitem")
    got = {
        r["l_returnflag"]: r["qs"]
        for r in li.groupBy("l_returnflag")
        .agg(
            F.percentile_approx(
                "l_quantity", list(_PCT_FRACTIONS), _PCT_ACCURACY
            ).alias("qs")
        )
        .collect()
    }
    con = duckdb.connect()
    try:
        frac_cols = ", ".join(
            f"quantile_disc(l_quantity, {f}) AS q{i}"
            for i, f in enumerate(_PCT_FRACTIONS)
        )
        rows = con.sql(
            f"SELECT l_returnflag, {frac_cols} "
            f"FROM read_parquet('{sf_dir}/lineitem.parquet') "
            "GROUP BY l_returnflag"
        ).fetchall()
    finally:
        con.close()
    want = {r[0]: list(r[1:]) for r in rows}
    assert got == want, (got, want)

"""Multiset (ALL) set-op semantics: pin the min-count / subtraction
rules against hand-computed multiplicities.

Regression for the INTERSECT/EXCEPT precedence bug: INTERSECT binds
tighter than UNION and EXCEPT/UNION are left-associative, so an
unparenthesized multi-branch right side silently becomes
`(left <setop> first-branch) UNION ALL second-branch`. These tests
pick a key whose right-side multiplicity is 2 (an open order) and one
whose multiplicity is 1 (a non-open order) and assert the documented
copy counts — the appended-branch mis-parse fails both.
"""

import pyspark.sql.functions as F

from golang_etl_spark.operators.setops import (
    setop_except_all,
    setop_intersect_all,
)
from golang_etl_spark.sources.catalog import load_table


def _pick_keys(spark, sf_dir):
    """One open-status key (right multiplicity 2) and one non-open key
    (right multiplicity 1), both <= 2000 with lineitem rows."""
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 2000)
    li_keys = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") <= 2000)
        .groupBy("l_orderkey")
        .count()
    )
    joined = orders.join(
        li_keys, orders.o_orderkey == li_keys.l_orderkey
    ).select("o_orderkey", "o_orderstatus", "count")
    open_row = joined.filter(
        (F.col("o_orderstatus") == "O") & (F.col("count") >= 3)
    ).first()
    nonopen_row = joined.filter(F.col("o_orderstatus") != "O").first()
    assert open_row is not None and nonopen_row is not None
    return open_row, nonopen_row


def test_intersect_all_min_count(spark, sf_dir):
    open_row, nonopen_row = _pick_keys(spark, sf_dir)
    rows = {
        r["k"]: r["n_copies"]
        for r in setop_intersect_all(spark, sf_dir).collect()
    }
    # right multiplicity 2 for open orders: min(left_lines, 2)
    assert rows[open_row["o_orderkey"]] == min(open_row["count"], 2)
    # right multiplicity 1 otherwise: min(left_lines, 1) == 1
    assert rows[nonopen_row["o_orderkey"]] == 1


def test_except_all_subtraction(spark, sf_dir):
    open_row, nonopen_row = _pick_keys(spark, sf_dir)
    rows = {
        r["k"]: r["n_copies"]
        for r in setop_except_all(spark, sf_dir).collect()
    }
    # open key: left_lines - 2 copies survive (absent if <= 0)
    expect_open = open_row["count"] - 2
    if expect_open > 0:
        assert rows[open_row["o_orderkey"]] == expect_open
    else:
        assert open_row["o_orderkey"] not in rows
    # non-open key: left_lines - 1 copies
    expect_non = nonopen_row["count"] - 1
    if expect_non > 0:
        assert rows[nonopen_row["o_orderkey"]] == expect_non
    else:
        assert nonopen_row["o_orderkey"] not in rows


def test_except_all_no_right_only_keys(spark, sf_dir):
    """EXCEPT ALL output must be a sub-multiset of the left side — a
    key contributed purely by the right side (the mis-parse's
    appended-branch symptom) must never appear."""
    left_keys = {
        r["l_orderkey"]
        for r in load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") <= 2000)
        .select("l_orderkey")
        .distinct()
        .collect()
    }
    out_keys = {
        r["k"] for r in setop_except_all(spark, sf_dir).collect()
    }
    assert out_keys <= left_keys

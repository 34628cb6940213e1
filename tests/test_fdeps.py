"""Constructed-data semantics + plan shape for functional-dependency
discovery (the oracle proves fixture-level cross-engine agreement)."""

from golang_etl_spark.operators.fdeps import profile_functional_deps


def test_fdeps_known_answer(spark, tmp_path):
    # orders: o_orderkey is a key (FD holds); o_custkey 1 maps to two
    # priorities (1 violating determinant), custkey 2 maps to one
    spark.createDataFrame(
        [
            (1, 1, "O", 1.0, None, "HIGH"),
            (2, 1, "O", 1.0, None, "LOW"),
            (3, 2, "F", 1.0, None, "LOW"),
            (4, 2, "F", 1.0, None, "LOW"),
        ],
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).write.parquet(f"{tmp_path}/orders.parquet")
    spark.createDataFrame(
        [(1, 10, 100, "N"), (1, 10, 200, "N"), (2, 20, 300, "R")],
        "l_orderkey long, l_partkey long, l_suppkey long, l_returnflag string",
    ).write.parquet(f"{tmp_path}/lineitem.parquet")
    out = {
        (r["table_name"], r["candidate"]): r
        for r in profile_functional_deps(spark, str(tmp_path)).collect()
    }
    pk = out[("orders", "o_orderkey -> o_custkey")]
    assert pk["fd_holds"] == 1 and pk["violating_lhs"] == 0
    cust = out[("orders", "o_custkey -> o_orderpriority")]
    assert cust["n_lhs"] == 2 and cust["n_pairs"] == 3
    assert cust["fd_holds"] == 0 and cust["violating_lhs"] == 1
    # l_partkey 10 maps to suppliers {100, 200}: violated by 1
    ps = out[("lineitem", "l_partkey -> l_suppkey")]
    assert ps["fd_holds"] == 0 and ps["violating_lhs"] == 1
    # l_orderkey -> l_returnflag holds on this mini fixture
    rf = out[("lineitem", "l_orderkey -> l_returnflag")]
    assert rf["fd_holds"] == 1


def test_fdeps_null_semantics_match_oracle(spark, tmp_path):
    """Null-bearing fixture pinning the Spark form to the DECLARED
    DuckDB oracle by construction (VERDICT r17 item 3): rows with
    x NOT NULL / y NULL must still count their x toward n_lhs, and
    DuckDB's COUNT(DISTINCT (x, y)) counts every distinct struct —
    (x, NULL) and even (NULL, NULL) included — so the pair legs may
    not null-filter at all. The r17 form filtered both columns
    non-null and diverged on exactly this data."""
    import duckdb

    from golang_etl_spark.operators.fdeps import _FDEPS_ORACLE

    # o_custkey -> o_orderpriority exercises every null shape:
    # custkey 3's only row has NULL priority; custkey NULL appears
    # with a real and a NULL priority.
    orders = [
        (1, 1, "O", 1.0, None, "HIGH"),
        (2, 1, "O", 1.0, None, "LOW"),
        (3, 2, "F", 1.0, None, "LOW"),
        (4, 3, "F", 1.0, None, None),
        (5, None, "F", 1.0, None, "LOW"),
        (6, None, "F", 1.0, None, None),
    ]
    spark.createDataFrame(
        orders,
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).write.parquet(f"{tmp_path}/orders.parquet")
    lineitem = [
        (1, 10, 100, "N"),
        (1, 10, None, "N"),
        (2, None, 300, None),
        (2, 20, 300, "R"),
    ]
    spark.createDataFrame(
        lineitem,
        "l_orderkey long, l_partkey long, l_suppkey long, l_returnflag string",
    ).write.parquet(f"{tmp_path}/lineitem.parquet")

    con = duckdb.connect()
    for t in ("orders", "lineitem"):
        # Spark writes <name>.parquet as a directory of part files
        con.execute(
            f"CREATE VIEW {t} AS SELECT * "
            f"FROM read_parquet('{tmp_path}/{t}.parquet/*.parquet')"
        )
    expected = {
        (r[0], r[1]): r[2:]
        for r in con.execute(_FDEPS_ORACLE).fetchall()
    }
    got = {
        (r["table_name"], r["candidate"]): (
            r["n_lhs"], r["n_pairs"], r["fd_holds"], r["violating_lhs"]
        )
        for r in profile_functional_deps(spark, str(tmp_path)).collect()
    }
    assert got == expected
    # spot-check the divergent shapes directly: custkey 3 (only-NULL
    # priority) still counts in n_lhs, and the (3, NULL) / (NULL, LOW)
    # / (NULL, NULL) structs all count in n_pairs.
    assert got[("orders", "o_custkey -> o_orderpriority")] == (3, 6, 0, 3)


def test_fdeps_split_legs_are_expand_free(spark, sf_dir):
    plan = (
        profile_functional_deps(spark, sf_dir)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # r17: one Expand-free leg per candidate (the old fused per-table
    # multi-distinct paid a ~5x Expand replication of the scan before
    # its first exchange) — four pruned 2-column scans, zero Expand
    assert plan.count("FileScan") == 4
    assert "Expand" not in plan
    # column pruning still reaches each scan: no non-candidate column
    for read in plan.split("ReadSchema")[1:]:
        assert "o_totalprice" not in read[:200]

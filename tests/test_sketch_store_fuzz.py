"""Parameter-space differential fuzz for the sketch stores.

The registered store probes pin ONE month range under the driver's
hash gate; these tests replay seeded-random ranges through the SAME
store pipelines (hll_prio_counts / cms_range_estimates /
hist_range_median — the exact functions the registered queries call)
against freshly generated oracle SQL, so the claims the gates rest on
— counter-grid and histogram linearity, HLL's exact coupon regime,
identical interpolation arithmetic — hold across the parameter space,
not just at the registered constants.
"""

import random

from golang_etl_spark.operators import sketches as SK
from golang_etl_spark.oracle import duckdb_connection

N_RANGES = 4


def _order_months(con):
    rows = con.execute(
        "SELECT DISTINCT strftime(o_orderdate, '%Y-%m') FROM orders ORDER BY 1"
    ).fetchall()
    return [r[0] for r in rows]


def _random_ranges(con, seed):
    rng = random.Random(seed)
    months = _order_months(con)
    return [
        tuple(sorted(rng.sample(months, rng.randint(1, 5))))
        for _ in range(N_RANGES)
    ]


def test_cms_store_fuzz_ranges(spark, sf_dir):
    con = duckdb_connection(sf_dir)
    for months in _random_ranges(con, 100_010):
        got = {
            r["o_custkey"]: r["est_orders"]
            for r in SK.cms_range_estimates(spark, sf_dir, months).collect()
        }
        want = dict(con.execute(SK._cms_store_oracle_sql(months)).fetchall())
        assert got == want, f"CMS merge-probe diverged on range {months}"


def test_hll_store_fuzz_ranges(spark, sf_dir):
    con = duckdb_connection(sf_dir)
    for months in _random_ranges(con, 100_020):
        got = {
            r["ym"]: r["n_prios"]
            for r in SK.hll_prio_counts(spark, sf_dir, months, "rng").collect()
        }
        want = dict(
            con.execute(SK._hll_store_oracle_sql(months, "rng")).fetchall()
        )
        assert got == want, f"HLL store probe diverged on range {months}"


def test_hist_store_fuzz_ranges(spark, sf_dir):
    con = duckdb_connection(sf_dir)
    for months in _random_ranges(con, 100_030):
        got = {
            r["ym"]: (r["n_rows"], r["med_bin"], r["est_median"])
            for r in SK.hist_range_median(
                spark, sf_dir, months, "rng"
            ).collect()
        }
        want = {
            ym: (n, b, m)
            for ym, n, b, m in con.execute(
                SK._hist_oracle_sql(months, "rng")
            ).fetchall()
        }
        assert set(got) == set(want), f"ym keys diverged on range {months}"
        for ym, (n, b, m) in want.items():
            gn, gb, gm = got[ym]
            assert (gn, gb) == (n, b), (months, ym)
            # both sides ROUND(...,6); one last-ulp of slack for the
            # two engines' double formatting of the rounded value
            assert abs(gm - m) < 1e-9, (months, ym, gm, m)

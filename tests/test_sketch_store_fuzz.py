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


def test_percentile_exact_regime_fuzz_fractions(spark, sf_dir):
    """The percentile hash gate uses three fixed mid-bucket fractions;
    the exactness argument (accuracy >= rows-per-group + fractions
    interior to a 1/50-wide value bucket) holds for EVERY mid-bucket
    fraction. Replay seeded-random k/50 + 0.01 fractions — dead center
    of bucket k+1 — through percentile_approx at the registered
    accuracy against DuckDB quantile_disc."""
    from pyspark.sql import functions as F

    from golang_etl_spark.operators.sketches import _PCT_ACCURACY

    rng = random.Random(100_040)
    con = duckdb_connection(sf_dir)
    for _ in range(N_RANGES):
        ks = sorted(rng.sample(range(50), 3))
        fracs = [round(k / 50 + 0.01, 6) for k in ks]
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        got = (
            li.groupBy("l_returnflag")
            .agg(
                F.percentile_approx(
                    "l_quantity", fracs, _PCT_ACCURACY
                ).alias("q")
            )
            .collect()
        )
        got = {r["l_returnflag"]: tuple(r["q"]) for r in got}
        q_sql = ", ".join(f"quantile_disc(l_quantity, {f})" for f in fracs)
        want = {
            row[0]: tuple(row[1:])
            for row in con.execute(
                f"SELECT l_returnflag, {q_sql} FROM lineitem GROUP BY 1"
            ).fetchall()
        }
        assert got == want, f"diverged at fractions {fracs}"


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


def test_pq_seeded_pipeline_fuzz_codebooks(spark, sf_dir):
    """The seeded-PQ hash gate pins ONE codebook; the encode/ADC/
    rerank parity — including the round-10 pre-cut score rounding that
    keeps near-ties from flipping cut membership — must hold for ANY
    codebook. Drive the exact production pipeline (_pq_adc_topk, the
    same function similarity_pq_topk and similarity_pq_seeded run)
    with seeded-random codebooks against freshly generated oracle SQL.
    Different codebooks lay near-ties in different places, so this is
    a direct stress of the cross-engine cut stability."""
    import numpy as np

    from golang_etl_spark.operators import similarity as SIM

    con = duckdb_connection(sf_dir)
    for seed in (4242, 77_001):
        books = np.array(
            SIM._seeded_matrix(
                SIM.PQS_M * SIM.PQS_K, SIM.PQS_SUB, seed=seed, scale=0.125
            )
        ).reshape(SIM.PQS_M, SIM.PQS_K, SIM.PQS_SUB)
        got = sorted(
            (r["query_id"], r["neighbor_id"], r["rank"], r["cosine"])
            for r in SIM._pq_adc_topk(spark, sf_dir, books).collect()
        )
        want = sorted(
            (q, n, rk, c)
            for q, n, rk, c in con.execute(
                SIM._pq_seed_oracle_sql(books)
            ).fetchall()
        )
        assert got == want, f"PQ pipeline diverged for codebook seed {seed}"


def test_ivf_seeded_pipeline_fuzz_centroids(spark, sf_dir):
    """The seeded-IVF hash gate pins ONE centroid table; cell
    assignment, nprobe selection, and in-cell scoring must replay for
    ANY quantizer. Drive the literal-centroid query path
    (ivf_literal_topk — the function similarity_ivf_seeded runs) with
    random-seed centroid sets against freshly generated oracle SQL."""
    from golang_etl_spark.operators import similarity as SIM

    con = duckdb_connection(sf_dir)
    for seed in (5151, 88_002):
        cents = SIM._seeded_matrix(SIM.IVF_SEED_K, SIM.EMBED_DIM, seed=seed)
        got = sorted(
            (r["query_id"], r["neighbor_id"], r["rank"], r["cosine"])
            for r in SIM.ivf_literal_topk(spark, sf_dir, cents).collect()
        )
        want = sorted(
            tuple(row)
            for row in con.execute(SIM._ivf_seed_oracle_sql(cents)).fetchall()
        )
        assert got == want, f"IVF pipeline diverged for centroid seed {seed}"


def test_store_probes_never_rescan_the_fact_table(spark, sf_dir):
    """The sketch stores' 100 TB claim is pay-once: after the build,
    ANY range probe reads O(months) store rows and never an order row.
    Gate it at the plan level — the probe's executed plan must scan
    only the store parquet, with the month filter pushed into that
    scan, and contain no orders.parquet FileScan."""
    probes = {
        "hll": SK.hll_prio_counts(spark, sf_dir, SK.HLL_RANGE_MONTHS, "rng"),
        "cms": SK.cms_range_estimates(spark, sf_dir, SK.CMS_RANGE_MONTHS),
        "hist": SK.hist_range_median(
            spark, sf_dir, SK.HLL_RANGE_MONTHS, "rng"
        ),
    }
    for name, df in probes.items():
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "orders.parquet" not in plan, (
            f"{name} store probe rescans the fact table"
        )
        assert f"{name}_store" in plan, f"{name} probe does not read its store"
        assert "PushedFilters: [" in plan and "In(ym" in plan, (
            f"{name} month filter not pushed into the store scan"
        )

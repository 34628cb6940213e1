"""Statistical sanity for the A-ES weighted reservoir: selection is
oracle-hash-checked elsewhere; this asserts the WEIGHTING actually
bites — per language, the mean weight of selected docs must exceed
the population mean (inclusion probability is increasing in weight,
and with the fixture's weight spread the gap is far from marginal).
"""

import duckdb

SF_DIR = "/root/testdata/sf0.01"


def test_weighted_reservoir_overselects_heavy_docs(spark):
    from golang_etl_spark.operators.sampling import (
        sample_weighted_reservoir,
    )

    sel = sample_weighted_reservoir(spark, SF_DIR).collect()
    pop = {
        lang: mean
        for lang, mean in duckdb.sql(
            f"""SELECT lang, AVG(GREATEST(n_chars, 1))
                FROM '{SF_DIR}/documents.parquet' GROUP BY lang"""
        ).fetchall()
    }
    by_lang = {}
    for r in sel:
        by_lang.setdefault(r["lang"], []).append(r["weight"])
    assert set(by_lang) == set(pop)
    n_heavier = sum(
        1 for lang, ws in by_lang.items() if sum(ws) / len(ws) > pop[lang]
    )
    # every language should lean heavy; allow one to sit at chance so a
    # skewed fixture regeneration can't flake the suite
    assert n_heavier >= len(pop) - 1, (
        f"weighting not biting: {n_heavier}/{len(pop)} languages heavier"
    )

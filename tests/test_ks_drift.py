"""Known-answer tests for profile_ks_drift — the DuckDB oracle proves
cross-engine agreement on the fixture; these pin the KS MATH on
constructed vintage pairs where sup |ECDF_a - ECDF_b| is derivable by
hand, including the tie handling that evaluates each distinct value
only after all of its occurrences."""

import datetime

import pytest

from golang_etl_spark.operators.profiling import profile_ks_drift

_A_DAY = datetime.datetime(1995, 6, 1)  # before the 1996-01-01 split
_B_DAY = datetime.datetime(1997, 6, 1)  # after


def _run(spark, tmp_path, a_values, b_values, sub="d0"):
    rows = [
        (i, _A_DAY, float(v)) for i, v in enumerate(a_values)
    ] + [
        (1000 + i, _B_DAY, float(v)) for i, v in enumerate(b_values)
    ]
    df = spark.createDataFrame(
        rows, "o_orderkey long, o_orderdate timestamp, o_totalprice double"
    )
    df.write.parquet(f"{tmp_path}/{sub}/orders.parquet")
    [out] = profile_ks_drift(spark, f"{tmp_path}/{sub}").collect()
    return out


def test_ks_known_value(spark, tmp_path):
    # A={1,2,3}, B={2,3,4}: ECDF gap is 1/3 at every pooled point
    out = _run(spark, tmp_path, [1, 2, 3], [2, 3, 4])
    assert (out["n_a"], out["n_b"]) == (3, 3)
    assert out["ks_stat"] == pytest.approx(1 / 3, abs=1e-12)


def test_ks_identical_and_disjoint(spark, tmp_path):
    out = _run(spark, tmp_path, [5, 7, 7, 9], [5, 7, 7, 9], sub="ident")
    assert out["ks_stat"] == 0.0
    out = _run(spark, tmp_path, [1, 2], [3, 4], sub="disj")
    assert out["ks_stat"] == 1.0  # fully separated distributions


def test_ks_tie_handling(spark, tmp_path):
    # the tied value 2 appears 3x in A, 1x in B: ECDFs evaluated
    # AFTER all ties -> at v=2: |4/4 - 1/4| = 0.75 (a mid-tie
    # evaluation would see a different, wrong sup)
    out = _run(spark, tmp_path, [1, 2, 2, 2], [2, 3, 4, 5])
    assert out["ks_stat"] == pytest.approx(0.75, abs=1e-12)


def test_ks_bounds_on_fixture(spark, sf_dir):
    [out] = profile_ks_drift(spark, sf_dir).collect()
    assert out["n_a"] > 0 and out["n_b"] > 0
    assert 0.0 <= out["ks_stat"] <= 1.0

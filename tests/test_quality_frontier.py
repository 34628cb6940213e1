"""Semantics and plan gates for the round-7 curation/dominance
operators: Gopher rule filter, per-source caps, Pareto frontier,
runtime bloom-filter join. The DuckDB oracle proves cross-engine
agreement on the fixtures; these pin constructed edge cases and the
100 TB plan shapes."""

from pyspark.sql import functions as F

from golang_etl_spark.operators.frontier import (
    join_bloom_runtime_filter,
    topk_pareto_frontier,
)
from golang_etl_spark.operators.quality_rules import (
    curation_domain_caps,
    text_gopher_rules,
)


def _write_docs(spark, tmp_path, docs):
    spark.createDataFrame(
        [(i, t, "en", f"src{i % 3}", len(t)) for i, t in docs],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    return str(tmp_path)


def test_gopher_rules_each_flag_fires(spark, tmp_path):
    good = "the cat and the dog ran to the park in the rain " * 3  # passes all
    sf = _write_docs(
        spark,
        tmp_path,
        [
            (1, good),
            (2, "the cat and dog ran"),  # 5 words < 10 -> r_word_count=0
            # 12 single-char words: avg_word_len=1 -> r_word_len=0
            (3, "a b c d e f g h i j k l"),
            # digits only, >=10 words: frac_alpha=0 -> r_alpha=0
            (4, "11 22 33 44 55 66 77 88 99 10 12 13"),
            # 3 symbol words / 12 = 0.25 > 0.1 -> r_symbol=0
            (5, "the cat and the dog ran to the park $$$ %%% ###"),
            # >=10 words but no 2 distinct stopwords -> r_stopwords=0
            (6, "cat dog bird fish horse cow sheep goat pig duck hen"),
        ],
    )
    out = {r["doc_id"]: r for r in text_gopher_rules(spark, sf).collect()}
    assert out[1]["passes"] == 1 and all(
        out[1][f] == 1
        for f in ("r_word_count", "r_word_len", "r_alpha", "r_symbol", "r_stopwords")
    )
    assert out[2]["r_word_count"] == 0 and out[2]["passes"] == 0
    assert out[3]["r_word_len"] == 0 and out[3]["avg_word_len"] == 1.0
    assert out[4]["r_alpha"] == 0 and out[4]["frac_alpha"] == 0.0
    assert out[5]["r_symbol"] == 0 and out[5]["passes"] == 0
    assert out[6]["r_stopwords"] == 0 and out[6]["n_stop_distinct"] < 2


def test_gopher_rules_no_shuffle(spark, sf_dir):
    # pure projection: the whole operator must run map-side
    plan = text_gopher_rules(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_domain_caps_semantics_and_group_limit(spark, sf_dir):
    out = curation_domain_caps(spark, sf_dir)
    rows = out.collect()
    per_src = {}
    for r in rows:
        per_src.setdefault(r["source"], []).append(r)
    for src, grp in per_src.items():
        assert len(grp) <= 5
        ranks = sorted(r["rk"] for r in grp)
        assert ranks == list(range(1, len(grp) + 1))
        # ranked by n_chars desc
        by_rk = sorted(grp, key=lambda r: r["rk"])
        chars = [r["n_chars"] for r in by_rk]
        assert chars == sorted(chars, reverse=True)
    # rank<=K must rewrite to WindowGroupLimit (top-K during sort, not
    # full per-key sort) — the property that bounds memory at 100 TB
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan


def test_pareto_frontier_matches_bruteforce(spark, sf_dir):
    got = {
        (r["p_partkey"], r["p_size"], r["p_retailprice"])
        for r in topk_pareto_frontier(spark, sf_dir).collect()
    }
    pts = spark.read.parquet(f"{sf_dir}/part.parquet").select(
        "p_partkey", "p_size", "p_retailprice"
    ).collect()
    want = set()
    for x in pts:
        dominated = any(
            y["p_size"] >= x["p_size"]
            and y["p_retailprice"] <= x["p_retailprice"]
            and (y["p_size"] > x["p_size"] or y["p_retailprice"] < x["p_retailprice"])
            for y in pts
        )
        if not dominated:
            want.add((x["p_partkey"], x["p_size"], x["p_retailprice"]))
    assert got == want and got


def test_pareto_frontier_keeps_exact_ties(spark, tmp_path):
    # two parts with identical (size, price) minima: neither dominates
    # the other (no strict inequality), both stay on the frontier
    spark.createDataFrame(
        [
            (1, 10, 5.0),
            (2, 10, 5.0),
            (3, 10, 6.0),  # dominated by 1/2 (same size, higher price)
            (4, 20, 7.0),  # frontier (largest size)
            (5, 5, 4.0),   # frontier (cheapest)
            (6, 5, 5.0),   # dominated by 1/2 (smaller size, same price)
        ],
        "p_partkey long, p_size int, p_retailprice double",
    ).write.parquet(f"{tmp_path}/part.parquet")
    got = {r["p_partkey"] for r in topk_pareto_frontier(spark, str(tmp_path)).collect()}
    assert got == {1, 2, 4, 5}


def test_pareto_frontier_no_self_join(spark, sf_dir):
    # the scale rewrite: one grouped aggregate + one broadcast join —
    # the part table must appear in exactly TWO scans (base + per-size
    # agg), never in a quadratic join of base x base
    plan = topk_pareto_frontier(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_bloom_runtime_filter_in_plan(spark, sf_dir):
    # the InjectRuntimeFilter demo must actually inject: bloom
    # might_contain semi-filters the lineitem scan before the shuffle
    df = join_bloom_runtime_filter(spark, sf_dir)
    opt = df._jdf.queryExecution().optimizedPlan().toString()
    assert "might_contain" in opt
    phys = df._jdf.queryExecution().executedPlan().toString()
    assert "might_contain" in phys
    # and it must sit on the probe (lineitem) side
    assert "l_orderkey" in opt.split("might_contain")[1][:200]


def test_bloom_session_isolation(spark, sf_dir):
    # the demo's conf overrides must not leak into the caller's session
    before = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    join_bloom_runtime_filter(spark, sf_dir).collect()
    assert spark.conf.get("spark.sql.autoBroadcastJoinThreshold") == before

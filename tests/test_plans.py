"""Physical-plan quality gates — the 100 TB design assertions.

Correctness tests prove the small-SF answer; these prove the *plan*
is the one that survives a 1000-executor cluster: filters reach the
parquet scan (PushedFilters), projections prune columns (ReadSchema),
dimension joins broadcast, and no operator degenerates into a
cartesian / broadcast-nested-loop join.
"""

import pytest

from golang_etl_spark.registry import all_queries

SF = None  # filled from fixture


def _plan(spark, sf_dir, name: str) -> str:
    df = all_queries()[name].fn(spark, sf_dir)
    return df._jdf.queryExecution().executedPlan().toString()


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    plan = _plan(spark, sf_dir, "filter_project")
    assert "PushedFilters" in plan
    # both predicates pushed, not just one
    assert "l_shipdate" in plan.split("PushedFilters")[1][:300]
    assert "l_quantity" in plan.split("PushedFilters")[1][:300]


def test_projection_prunes_scan_columns(spark, sf_dir):
    plan = _plan(spark, sf_dir, "filter_project")
    read_schema = plan.split("ReadSchema")[1][:400]
    # 11-column table, 6-column read: pruned columns must be absent
    assert "l_returnflag" not in read_schema
    assert "l_tax" not in read_schema


def test_range_scan_pushdown(spark, sf_dir):
    # the ETL chunk predicate (pk >= lo AND pk < hi) must push down —
    # the parity property of the reference's server-side WHERE
    # (/root/reference/extractor.go:63)
    plan = _plan(spark, sf_dir, "etl_range_scan")
    pushed = plan.split("PushedFilters")[1][:300]
    assert "GreaterThanOrEqual(l_orderkey,1000" in pushed
    assert "LessThan(l_orderkey,3000" in pushed


def test_dimension_joins_broadcast(spark, sf_dir):
    plan = _plan(spark, sf_dir, "join_revenue_by_segment")
    assert "BroadcastHashJoin" in plan
    # the fact-side shuffle is allowed; a SortMergeJoin against the
    # tiny customer dim would mean the broadcast hint was lost
    assert "BroadcastNestedLoopJoin" not in plan


@pytest.mark.parametrize(
    "name",
    [
        "dedup_minhash_lsh",
        "dedup_simhash",
        "dedup_ngram_jaccard",
        "dedup_embedding_cosine",
        "similarity_ann_lsh",
        "asof_join_purchase_click",
        "sessionize_events",
    ],
)
def test_no_cartesian_or_bnlj_anywhere(spark, sf_dir, name):
    # every fuzzy-dedup / similarity / asof operator must generate
    # candidates through bucket equi-joins — a CartesianProduct or
    # BroadcastNestedLoopJoin in the plan means O(n^2) at scale
    plan = _plan(spark, sf_dir, name)
    assert "CartesianProduct" not in plan, f"{name} degenerated to cartesian"
    assert "BroadcastNestedLoopJoin" not in plan, f"{name} degenerated to BNLJ"


@pytest.mark.parametrize("name", ["dedup_minhash_lsh", "dedup_simhash"])
def test_dedup_aggregates_stay_hash_based(spark, sf_dir, name):
    # the signature aggregations MIN over numeric 60-bit hashes / SUM
    # over int bit-votes so Spark keeps them in HashAggregate with
    # map-side partial aggregation. Round 1 shipped string MINs, which
    # fall back to SortAggregate (immutable agg buffers: exchange +
    # sort per replication) — that was 99% of the bench wall time.
    plan = _plan(spark, sf_dir, name)
    assert "SortAggregate" not in plan, f"{name} fell back to SortAggregate"
    assert "HashAggregate" in plan


@pytest.mark.parametrize(
    "name",
    ["dedup_minhash_lsh", "dedup_simhash", "dedup_ngram_jaccard",
     "dedup_embedding_cosine"],
)
def test_dedup_selfjoin_subtrees_cached(spark, sf_dir, name):
    # the candidate self-join references its build subtree from both
    # sides; without persist() each reference re-computes the whole
    # shingle/signature pipeline (round 1: 4x recompute in MinHash).
    # A cached subtree appears as InMemoryTableScan in the plan.
    plan = _plan(spark, sf_dir, name)
    assert "InMemoryTableScan" in plan, f"{name} self-join subtree not cached"


def test_ivf_assignment_partial_aggregates(spark, sf_dir):
    # IVF cell assignment is a struct-max: SortAggregate is expected
    # (struct buffers can't live in HashAggregate) and acceptable ONLY
    # because partial_max reduces the 16 rows/vector map-side — the
    # exchange must carry one row per vector. WindowGroupLimit proves
    # the top-k windows also pre-reduce before their shuffles.
    plan = _plan(spark, sf_dir, "similarity_ivf_topk")
    assert "partial_max(struct" in plan, "map-side partial aggregation lost"
    assert "WindowGroupLimit" in plan, "top-k window limit not pushed down"


def test_curation_pipeline_single_exchange(spark, sf_dir):
    # quality gate + dedup window must compile to ONE exchange (the
    # md5 hash partitioning for the dedup window); the quality signals
    # are narrow projections over the scan
    plan = _plan(spark, sf_dir, "pipeline_corpus_curation")
    assert plan.count("Exchange") == 1


def test_whole_stage_codegen_active(spark, sf_dir):
    # scalar pipelines must stay inside codegen (JVM), not fall back
    # to interpreted row-at-a-time evaluation. In compact plan strings
    # the codegen span marker is the "*(n)" stage prefix. (Queries
    # built on higher-order lambdas — e.g. text_quality_stats — are
    # legitimately non-codegen: Spark evaluates HigherOrderFunctions
    # interpreted, still JVM-side.)
    plan = _plan(spark, sf_dir, "filter_project")
    assert "*(1)" in plan


def test_similarity_bruteforce_broadcasts_queries(spark, sf_dir):
    # the tiny query set must broadcast; the big vector side must NOT
    # shuffle for the join
    plan = _plan(spark, sf_dir, "similarity_topk_bruteforce")
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan

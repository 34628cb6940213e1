"""Duplicate-cluster assignment: connected components over the
SimHash near-duplicate pair graph.

Near-dup pairs (``dedup_simhash``) relate documents pairwise, but a
training-data pipeline needs *clusters*: if A~B and B~C, all three are
one duplicate group and the curator keeps exactly one. That closure is
connected components on the pair graph. No reference counterpart
(SURVEY.md §2.5) — LLM-pipeline extension.

Spark formulation: iterative min-label propagation. Each vertex
starts labeled with its own doc_id; every round each vertex takes the
minimum label among itself and its neighbors; converged when no label
changes. Rounds needed = the graph diameter, and near-dup components
are shallow (a duplicated document's copies all pair with each other,
so diameters are small); the loop is capped at MAX_CC_ITERS with a
convergence check — an iterative *algorithm*, not a driver-side
row loop: each round is one distributed join + aggregate, and only the
scalar "how many labels changed" count comes back to the driver.

Scale notes (100 TB stance):
- state per round is one (doc_id, label) row per vertex in a pair —
  |vertices| <= 2·|pairs|, already the dedup-candidate scale, NOT the
  corpus scale. Each round shuffles on doc_id only.
- each round's result is ``localCheckpoint``-ed: persist alone caches
  *data* but leaves the logical lineage intact, and this loop
  references the previous round's frame three times per iteration —
  the analyzed plan grows ~3^rounds and planning time (not execution)
  explodes within a handful of rounds. Checkpointing truncates the
  lineage so every round plans against a flat in-memory relation. On
  a real cluster you would use reliable ``checkpoint`` (HDFS) instead
  of ``localCheckpoint`` for fault tolerance.
- the edge list is checkpointed once and reused every round.

The DuckDB oracle replays the same closure with a recursive CTE
(min reachable doc_id per vertex == min-label fixpoint).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from golang_etl_spark.operators.dedup import _simhash_oracle, simhash_pairs
from golang_etl_spark.registry import register

MAX_CC_ITERS = 20

_CC_ORACLE = f"""
WITH RECURSIVE pairs AS (
  {_simhash_oracle()}
),
edges AS (
  SELECT doc_id_a AS src, doc_id_b AS dst FROM pairs
  UNION ALL
  SELECT doc_id_b AS src, doc_id_a AS dst FROM pairs
),
reach AS (
  SELECT DISTINCT src AS doc_id, src AS label FROM edges
  UNION
  SELECT e.dst AS doc_id, r.label
  FROM reach r JOIN edges e ON e.src = r.doc_id
),
labels AS (
  SELECT doc_id, MIN(label) AS cluster_id FROM reach GROUP BY doc_id
),
sizes AS (
  SELECT cluster_id, COUNT(*) AS n FROM labels GROUP BY cluster_id
)
SELECT l.doc_id, l.cluster_id, CAST(s.n AS BIGINT) AS cluster_size
FROM labels l JOIN sizes s ON s.cluster_id = l.cluster_id
"""


@register("dedup_cluster_cc", oracle=_CC_ORACLE, tags=("dedup", "llm"))
def dedup_cluster_cc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components over SimHash near-dup pairs: every
    document that appears in at least one pair gets a ``cluster_id``
    (the minimum doc_id in its component — deterministic) and the
    component's ``cluster_size``."""
    pairs = simhash_pairs(spark, sf_dir).select("doc_id_a", "doc_id_b")
    labels = connected_components(pairs)
    sizes = labels.groupBy("label").agg(F.count("*").alias("cluster_size"))
    return (
        labels.join(sizes, "label")
        .select(
            "doc_id",
            F.col("label").alias("cluster_id"),
            F.col("cluster_size").cast("long").alias("cluster_size"),
        )
    )


def connected_components(pairs: DataFrame) -> DataFrame:
    """Min-label propagation over an undirected pair list
    ``(doc_id_a, doc_id_b)`` — returns ``(doc_id, label)`` where label
    is the minimum doc_id reachable from doc_id. The algorithmic core
    of ``dedup_cluster_cc``, factored out so the chain/star unit tests
    (tests/test_clustering_unit.py) can drive it on synthetic graphs
    whose transitive closure is known."""
    edges = (
        pairs.select(
            F.col("doc_id_a").alias("src"), F.col("doc_id_b").alias("dst")
        )
        .union(
            pairs.select(
                F.col("doc_id_b").alias("src"), F.col("doc_id_a").alias("dst")
            )
        )
        .localCheckpoint()
    )
    labels = (
        edges.select(F.col("src").alias("doc_id"))
        .distinct()
        .withColumn("label", F.col("doc_id"))
        .localCheckpoint()
    )
    converged = False
    for _ in range(MAX_CC_ITERS):
        nbr_min = (
            edges.join(
                labels.select(
                    F.col("doc_id").alias("dst"), F.col("label").alias("nbr")
                ),
                "dst",
            )
            .groupBy("src")
            .agg(F.min("nbr").alias("nbr_min"))
        )
        # carry the previous label through the checkpoint so the
        # convergence check is a filter-count over the (tiny, cached)
        # result instead of an extra join stage per round
        stepped = (
            labels.join(
                nbr_min, labels["doc_id"] == nbr_min["src"], "left"
            )
            .select(
                "doc_id",
                F.col("label").alias("old_label"),
                F.least(
                    F.col("label"),
                    F.coalesce(F.col("nbr_min"), F.col("label")),
                ).alias("label"),
            )
            .localCheckpoint()  # truncate lineage — see module docstring
        )
        labels = stepped.select("doc_id", "label")
        if stepped.filter(F.col("label") != F.col("old_label")).count() == 0:
            converged = True
            break
    if not converged:
        # min-label propagation moves the minimum one hop per round: a
        # component whose min-id vertex has eccentricity > MAX_CC_ITERS
        # would exit here with SPLIT clusters. Failing loudly beats
        # silently-wrong labels; raise the cap (or switch to pointer-
        # doubling) if real data ever has chains this deep.
        raise RuntimeError(
            f"connected_components did not converge in {MAX_CC_ITERS} "
            "rounds — component diameter exceeds the iteration cap"
        )
    return labels

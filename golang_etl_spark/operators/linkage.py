"""Blocked record linkage (entity resolution) — match a degraded
"CRM export" back to the canonical customer table without ever
comparing all pairs.

The classic warehouse-consolidation ETL step the reference's
row-migration pipeline (extractor.go) leaves to downstream tooling;
beyond-reference extension per the build brief. The three-stage shape
is the one that survives 100 TB:

1. BLOCK: candidate pairs come from an equi-join on coarse keys
   (nation, account-balance bucket) — never a cross join. The noisy
   side explodes to its adjacent buckets so bounded attribute noise
   cannot push a true match out of its block (the standard
   multi-probe blocking trick; 3x candidate rows, still O(n)).
2. SCORE: Fellegi-Sunter-style additive field-agreement weights over
   the candidates (balance agreement, segment agreement with missing
   treated as neutral), all integer-valued arithmetic so both engines
   agree bit-for-bit.
3. RESOLVE: per noisy record keep the best-scoring canonical match,
   ties broken by key — a min_by struct aggregation, one exchange.

The degraded side is DERIVED deterministically in-query (keep 70% of
customers, +1 balance noise on every 5th key, segment nulled on every
4th) so the oracle replays the identical derivation and the match
quality is itself checkable: the output carries is_correct.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from golang_etl_spark.registry import register
from golang_etl_spark.sources.catalog import load_table

# arithmetic-on-key pseudo-randomness: engine-portable, unlike hash()
_KEEP_MOD = "c_custkey % 10 < 7"   # CRM holds ~70% of customers
_NOISE_MOD = "c_custkey % 5 = 0"   # +1 balance noise
_NULLSEG_MOD = "c_custkey % 4 = 0"  # segment missing

_LINKAGE_ORACLE = f"""
WITH crm AS (
  SELECT c_custkey AS crm_id,
         c_nationkey AS nation,
         CAST(ROUND(c_acctbal) AS INT)
           + CASE WHEN {_NOISE_MOD} THEN 1 ELSE 0 END AS bal,
         CASE WHEN {_NULLSEG_MOD} THEN NULL ELSE c_mktsegment END AS seg
  FROM customer WHERE {_KEEP_MOD}
),
canon AS (
  SELECT c_custkey, c_nationkey AS nation,
         CAST(ROUND(c_acctbal) AS INT) AS bal, c_mktsegment AS seg,
         CAST(FLOOR(CAST(ROUND(c_acctbal) AS INT) / 100.0) AS INT) AS blk
  FROM customer
),
probes AS (
  SELECT crm.*, CAST(FLOOR(bal / 100.0) AS INT) + d.off AS blk
  FROM crm, (SELECT UNNEST([-1, 0, 1]) AS off) d
),
cand AS (
  SELECT DISTINCT p.crm_id, p.bal AS crm_bal, p.seg AS crm_seg,
         c.c_custkey, c.bal, c.seg
  FROM probes p JOIN canon c ON c.nation = p.nation AND c.blk = p.blk
),
scored AS (
  SELECT crm_id, c_custkey,
         (CASE WHEN ABS(crm_bal - bal) <= 1 THEN 2 ELSE -1 END
          + CASE WHEN crm_seg IS NULL THEN 0
                 WHEN crm_seg = seg THEN 1 ELSE -1 END) AS score
  FROM cand
),
best AS (
  SELECT crm_id, c_custkey AS matched_custkey, score,
         ROW_NUMBER() OVER (PARTITION BY crm_id
                            ORDER BY score DESC, c_custkey) AS rk,
         CAST(COUNT(*) OVER (PARTITION BY crm_id) AS BIGINT)
           AS n_candidates
  FROM scored
)
SELECT crm_id, matched_custkey, score, n_candidates,
       CAST(crm_id = matched_custkey AS INT) AS is_correct
FROM best WHERE rk = 1
ORDER BY crm_id
"""


@register(
    "etl_record_linkage",
    oracle=_LINKAGE_ORACLE,
    tags=("etl-parity", "join", "dedup"),
)
def etl_record_linkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link every CRM record to its best canonical customer: blocked
    candidate generation (nation x balance-bucket equi-join, noisy
    side multi-probing its adjacent buckets), additive field-agreement
    scoring, best-match-per-record resolution with a (score DESC, key
    ASC) tie-break. Output carries n_candidates (blocking cost) and
    is_correct (linkage quality) per record.

    100 TB shape: candidates are an equi-join on (nation, bucket) —
    block sizes bound the join fan-out, multi-probe costs a constant
    3x on the smaller side, and resolution is one min_by exchange on
    crm_id. No similarity machinery needed: this is the structured-
    attribute sibling of the text/embedding dedup families."""
    cust = load_table(spark, sf_dir, "customer")
    crm = cust.filter(F.expr(_KEEP_MOD)).select(
        F.col("c_custkey").alias("crm_id"),
        F.col("c_nationkey").alias("nation"),
        (
            F.round("c_acctbal").cast("int")
            + F.when(F.expr(_NOISE_MOD), 1).otherwise(0)
        ).alias("bal"),
        F.when(F.expr(_NULLSEG_MOD), F.lit(None)).otherwise(
            F.col("c_mktsegment")
        ).alias("seg"),
    )
    canon = cust.select(
        "c_custkey",
        F.col("c_nationkey").alias("nation"),
        F.round("c_acctbal").cast("int").alias("bal"),
        F.col("c_mktsegment").alias("seg"),
        F.floor(F.round("c_acctbal").cast("int") / F.lit(100.0))
        .cast("int")
        .alias("blk"),
    )
    probes = crm.select(
        "*",
        F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1))).alias("off"),
    ).select(
        "crm_id",
        "nation",
        "bal",
        "seg",
        (F.floor(F.col("bal") / F.lit(100.0)).cast("int") + F.col("off")).alias(
            "blk"
        ),
    )
    cand = (
        probes.join(canon, ["nation", "blk"])
        .select(
            "crm_id",
            probes.bal.alias("crm_bal"),
            probes.seg.alias("crm_seg"),
            "c_custkey",
            canon.bal.alias("bal"),
            canon.seg.alias("seg"),
        )
        .distinct()
    )
    scored = cand.select(
        "crm_id",
        "c_custkey",
        (
            F.when(F.abs(F.col("crm_bal") - F.col("bal")) <= 1, 2).otherwise(-1)
            + F.when(F.col("crm_seg").isNull(), 0)
            .when(F.col("crm_seg") == F.col("seg"), 1)
            .otherwise(-1)
        ).alias("score"),
    )
    return (
        scored.groupBy("crm_id")
        .agg(
            F.min_by(
                "c_custkey", F.struct((-F.col("score")).alias("ns"), "c_custkey")
            ).alias("matched_custkey"),
            F.max("score").alias("score"),
            F.count("*").alias("n_candidates"),
        )
        .select(
            "crm_id",
            "matched_custkey",
            "score",
            "n_candidates",
            (F.col("crm_id") == F.col("matched_custkey"))
            .cast("int")
            .alias("is_correct"),
        )
        .orderBy("crm_id")
    )

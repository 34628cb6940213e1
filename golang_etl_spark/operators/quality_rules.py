"""Rule-based corpus quality filters — the published-heuristic tier of
LLM training-data curation.

Two operators extend the quality family beyond the learned classifier
(text.py:text_quality_classifier) and the distributional signals
(token entropy, perplexity):

* ``text_gopher_rules`` — the fixed-threshold document filter popularized
  by the Gopher/MassiveText pipeline (Rae et al. 2021, §A1.1): word
  count bounds, mean-word-length band, alphabetic-word fraction,
  symbol-word fraction, and stopword presence. Each rule is emitted as
  an 0/1 flag plus the conjunction, so downstream curation can both
  hard-filter and diagnose WHY documents fail.
* ``curation_domain_caps`` — per-source document caps (the CCNet /
  RefinedWeb "head domain" guard): rank documents within each source by
  a quality proxy and keep the top K, bounding any single domain's
  contribution to the corpus.

Both are pure relational plans — one parquet scan, no Python in the
hot path — so they run at scan speed on 100 TB. The reference engine
(/root/reference/extractor.go) has no text analytics; these extend the
engine for the training-data use case per the build brief.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from golang_etl_spark.operators.text import (
    STOPWORDS,
    _sql_list,
    _words_expr_duck,
    _words_expr_spark,
)
from golang_etl_spark.registry import register
from golang_etl_spark.sources.catalog import load_table

# Thresholds tuned to the synthetic fixture corpus (20-80 words/doc)
# while keeping the published *structure*: production values from the
# Gopher paper are 50..100k words, mean word length 3..10, >=80%
# alphabetic words, <=10% symbol words, >=2 distinct stopwords.
_GR_MIN_WORDS = 10
_GR_MAX_WORDS = 100_000
_GR_MIN_WLEN = 3.0
_GR_MAX_WLEN = 10.0
_GR_MIN_ALPHA = 0.7
_GR_MAX_SYMBOL = 0.1
_GR_MIN_STOP = 2

_GOPHER_ORACLE = f"""
WITH feats AS (
  SELECT doc_id,
         len(w) AS n_words,
         list_aggregate(list_transform(w, x -> length(x)), 'sum')
           / CAST(len(w) AS DOUBLE) AS avg_word_len,
         len(list_filter(w, x -> regexp_matches(x, '[a-z]')))
           / CAST(len(w) AS DOUBLE) AS frac_alpha,
         len(list_filter(w, x -> NOT regexp_matches(x, '[a-z0-9]')))
           / CAST(len(w) AS DOUBLE) AS frac_symbol,
         len(list_filter(list_distinct(w),
                         x -> x IN ({_sql_list(STOPWORDS)}))) AS n_stop
  FROM (SELECT doc_id,
               list_transform({_words_expr_duck()}, x -> lower(x)) AS w
        FROM documents)
  WHERE len(w) > 0
)
SELECT doc_id,
       CAST(n_words AS BIGINT) AS n_words,
       ROUND(avg_word_len, 4) AS avg_word_len,
       ROUND(frac_alpha, 4) AS frac_alpha,
       ROUND(frac_symbol, 4) AS frac_symbol,
       CAST(n_stop AS BIGINT) AS n_stop_distinct,
       CAST(n_words BETWEEN {_GR_MIN_WORDS} AND {_GR_MAX_WORDS} AS INT)
         AS r_word_count,
       CAST(avg_word_len BETWEEN {_GR_MIN_WLEN} AND {_GR_MAX_WLEN} AS INT)
         AS r_word_len,
       CAST(frac_alpha >= {_GR_MIN_ALPHA} AS INT) AS r_alpha,
       CAST(frac_symbol <= {_GR_MAX_SYMBOL} AS INT) AS r_symbol,
       CAST(n_stop >= {_GR_MIN_STOP} AS INT) AS r_stopwords,
       CAST(n_words BETWEEN {_GR_MIN_WORDS} AND {_GR_MAX_WORDS}
            AND avg_word_len BETWEEN {_GR_MIN_WLEN} AND {_GR_MAX_WLEN}
            AND frac_alpha >= {_GR_MIN_ALPHA}
            AND frac_symbol <= {_GR_MAX_SYMBOL}
            AND n_stop >= {_GR_MIN_STOP} AS INT) AS passes
FROM feats
"""


@register(
    "text_gopher_rules",
    oracle=_GOPHER_ORACLE,
    tags=("text", "llm", "curation"),
)
def text_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style fixed-rule document filter: five published
    heuristics as 0/1 flags plus their conjunction.

    All five features fold over the word array of a single row — no
    shuffle at all; the whole operator is a projection over the scan
    and runs map-side at corpus scale. Flags are INTs (not booleans)
    and ratios are double divisions by an explicit CAST(... AS DOUBLE)
    — never a `* 1.0` decimal literal (the r06 driver-hash trap).
    Rule thresholds compare the UNROUNDED doubles on both engines, so
    rounding the reported ratios to 4 places cannot flip a flag.
    """
    docs = load_table(spark, sf_dir, "documents")
    w = f"transform({_words_expr_spark()}, x -> lower(x))"
    feats = (
        docs.selectExpr("doc_id", f"{w} AS w")
        .filter(F.expr("size(w) > 0"))
        .selectExpr(
            "doc_id",
            "size(w) AS n_words",
            "aggregate(transform(w, x -> length(x)), 0, (acc, x) -> acc + x)"
            " / CAST(size(w) AS DOUBLE) AS avg_word_len",
            "size(filter(w, x -> x rlike '[a-z]'))"
            " / CAST(size(w) AS DOUBLE) AS frac_alpha",
            "size(filter(w, x -> NOT x rlike '[a-z0-9]'))"
            " / CAST(size(w) AS DOUBLE) AS frac_symbol",
            f"size(filter(array_distinct(w),"
            f" x -> x IN ({_sql_list(STOPWORDS)}))) AS n_stop",
        )
    )
    r_word_count = F.col("n_words").between(_GR_MIN_WORDS, _GR_MAX_WORDS)
    r_word_len = F.col("avg_word_len").between(_GR_MIN_WLEN, _GR_MAX_WLEN)
    r_alpha = F.col("frac_alpha") >= _GR_MIN_ALPHA
    r_symbol = F.col("frac_symbol") <= _GR_MAX_SYMBOL
    r_stop = F.col("n_stop") >= _GR_MIN_STOP
    return feats.select(
        "doc_id",
        F.col("n_words").cast("long").alias("n_words"),
        F.round("avg_word_len", 4).alias("avg_word_len"),
        F.round("frac_alpha", 4).alias("frac_alpha"),
        F.round("frac_symbol", 4).alias("frac_symbol"),
        F.col("n_stop").cast("long").alias("n_stop_distinct"),
        r_word_count.cast("int").alias("r_word_count"),
        r_word_len.cast("int").alias("r_word_len"),
        r_alpha.cast("int").alias("r_alpha"),
        r_symbol.cast("int").alias("r_symbol"),
        r_stop.cast("int").alias("r_stopwords"),
        (r_word_count & r_word_len & r_alpha & r_symbol & r_stop)
        .cast("int")
        .alias("passes"),
    )


# ---------------------------------------------------------------------------
# Per-source document caps (head-domain guard).
# ---------------------------------------------------------------------------
_DOMAIN_CAP_K = 5

_DOMAIN_CAPS_ORACLE = f"""
SELECT doc_id, source, n_chars, rk
FROM (
  SELECT doc_id, source, n_chars,
         CAST(ROW_NUMBER() OVER (PARTITION BY source
                                 ORDER BY n_chars DESC, doc_id) AS BIGINT)
           AS rk
  FROM documents
)
WHERE rk <= {_DOMAIN_CAP_K}
"""


@register(
    "curation_domain_caps",
    oracle=_DOMAIN_CAPS_ORACLE,
    tags=("curation", "llm"),
)
def curation_domain_caps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cap each source's corpus contribution at its K best documents
    (quality proxy: n_chars; tie-break doc_id for determinism) — the
    head-domain guard every web-scale curation pipeline applies so one
    crawler-friendly domain can't dominate the training mix.

    One hash shuffle on `source`, then a rank-truncating window that
    Spark rewrites to WindowGroupLimit: every partition keeps only K
    rows per key DURING the sort (top-K per group, not full sort), so
    executor memory per task is O(K x sources-per-partition) no matter
    how many documents a head domain has. A pathologically hot source
    is exactly what AQE skew-split handles; the per-key output is
    bounded at K regardless.
    """
    docs = load_table(spark, sf_dir, "documents")
    from pyspark.sql.window import Window

    w = Window.partitionBy("source").orderBy(
        F.col("n_chars").desc(), F.col("doc_id")
    )
    return (
        docs.select("doc_id", "source", "n_chars")
        .withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= _DOMAIN_CAP_K)
    )


# ---------------------------------------------------------------------------
# Training-mixture sampling plan: turn target source weights + a token
# budget into per-source sampling rates (the DoReMi-style data-mixing
# planning table computed as a relation, not a notebook).
# ---------------------------------------------------------------------------
_MIX_BUDGET_FRAC = 0.6  # token budget = 60% of the corpus

_MIXTURE_ORACLE = f"""
WITH tok AS (
  SELECT source,
         CAST(CAST(SUBSTR(source, 4) AS INT) % 4 + 1 AS DOUBLE) AS w_raw,
         CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(LENGTH(STRING_SPLIT(text, ' '))) AS BIGINT) AS tokens
  FROM documents GROUP BY source
),
tot AS (
  SELECT source, n_docs, tokens,
         w_raw / SUM(w_raw) OVER () AS weight,
         {_MIX_BUDGET_FRAC} * SUM(tokens) OVER () AS budget
  FROM tok
)
SELECT source, n_docs, tokens,
       ROUND(weight, 6) AS weight,
       ROUND(LEAST(1.0, budget * weight / tokens), 6) AS sample_rate,
       ROUND(tokens * LEAST(1.0, budget * weight / tokens), 4)
         AS expected_tokens
FROM tot
ORDER BY source
"""


@register(
    "curation_mixture_plan",
    oracle=_MIXTURE_ORACLE,
    tags=("curation", "llm", "aggregation"),
)
def curation_mixture_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source sampling plan for a target training mixture: token
    counts per source (one scan, whitespace tokens), target weights
    (derived deterministically from the source id so every fixture SF
    replays them), and the sampling rate min(1, budget·w_s/tokens_s)
    that realizes the mixture under a fixed token budget — capped
    sources surface as rate 1.0 (their weight is unachievable without
    epoch repeats; sample_epoch_repeat is that follow-on step).

    100 TB shape: scan → per-source aggregate (map-side combinable,
    |sources| rows) → window normalization on the tiny plan table.
    The plan feeds sample_split_hash-style deterministic row selection
    downstream; computing it never touches more than one pass."""
    docs = load_table(spark, sf_dir, "documents")
    from pyspark.sql.window import Window

    tok = docs.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.size(F.split("text", " "))).cast("long").alias("tokens"),
    ).select(
        "source",
        (
            (F.substring("source", 4, 10).cast("int") % 4 + 1).cast("double")
        ).alias("w_raw"),
        "n_docs",
        "tokens",
    )
    w = Window.partitionBy()
    tot = tok.select(
        "source",
        "n_docs",
        "tokens",
        (F.col("w_raw") / F.sum("w_raw").over(w)).alias("weight"),
        (F.lit(_MIX_BUDGET_FRAC) * F.sum("tokens").over(w)).alias("budget"),
    )
    rate = F.least(
        F.lit(1.0), F.col("budget") * F.col("weight") / F.col("tokens")
    )
    return tot.select(
        "source",
        "n_docs",
        "tokens",
        F.round("weight", 6).alias("weight"),
        F.round(rate, 6).alias("sample_rate"),
        F.round(F.col("tokens") * rate, 4).alias("expected_tokens"),
    ).orderBy("source")

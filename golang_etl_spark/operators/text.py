"""Text analysis over the ``documents`` table: language-ID heuristic,
quality scoring, token counting, document fingerprinting.

The reference has no scalar/text surface at all (SURVEY.md §2.5 — its
only string op is the []byte→string coercion, /root/reference/
extractor.go:100-102); this module is pure extension territory for
LLM-training-data pipelines.

Scale notes (100 TB stance):
- everything here is a narrow per-row projection over built-in JVM
  expressions (split/transform/filter/md5) — no shuffle at all except
  the final aggregates, which are partial-agg'd map-side. Plans are a
  single WholeStageCodegen span over the parquet scan.
- no Python UDFs: lambdas run inside Catalyst (HigherOrderFunction),
  so the hot path never leaves the JVM.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from golang_etl_spark.registry import register
from golang_etl_spark.sources.catalog import load_table

# Stopword marker sets. The fixture vocabulary is English-ish word
# soup; the language markers are standard high-frequency function
# words per language. Shared constants keep the Spark and DuckDB
# expressions in lock-step.
STOPWORDS = ("the", "a", "and", "of", "to", "in", "is", "it", "for", "on")

LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "and", "of", "is"),
    "de": ("der", "die", "das", "und", "ist"),
    "fr": ("le", "la", "et", "les", "est"),
    "es": ("el", "los", "y", "una", "es"),
    "zh": ("de", "shi", "le_zh", "zai", "he"),
}

# BPE-ish token regex: runs of letters, runs of digits, or any single
# non-space symbol — a crude byte-pair-encoding proxy that both
# engines' regexp_extract_all implement identically.
TOKEN_RE = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"
# TOKEN_RE with backslashes doubled for Spark SQL string literals
# (Spark processes escapes inside literals; DuckDB does not) — the one
# shared spelling every token-counting query must use, so an edit to
# TOKEN_RE can never desynchronize the Spark and oracle sides.
TOKEN_RE_SPARK = TOKEN_RE.replace("\\", "\\\\")


def _sql_list(words: tuple[str, ...]) -> str:
    return ", ".join(f"'{w}'" for w in words)


def _words_expr_spark() -> str:
    return "split(trim(text), '\\\\s+')"


def _words_expr_duck() -> str:
    return "string_split_regex(trim(text), '\\s+')"


# ---------------------------------------------------------------------------
# Quality scoring: length/word/stopword stats per document.
# ---------------------------------------------------------------------------
_QUALITY_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, lang, source,
         length(text) AS n_chars_raw,
         {_words_expr_duck()} AS w
  FROM documents
)
SELECT doc_id, lang, source,
       n_chars_raw,
       CAST(len(w) AS BIGINT) AS n_words,
       ROUND((n_chars_raw - len(w) + 1) * 1.0 / len(w), 4) AS avg_word_len,
       ROUND(len(list_filter(w, x -> x IN ({_sql_list(STOPWORDS)}))) * 1.0
             / len(w), 4) AS stopword_ratio,
       ROUND(len(list_distinct(w)) * 1.0 / len(w), 4) AS ttr
FROM toks
WHERE len(w) > 0
"""


@register("text_quality_stats", oracle=_QUALITY_ORACLE, tags=("text", "llm"))
def text_quality_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document quality metrics: word count, average word length,
    stopword ratio, type-token ratio.

    avg_word_len derives from char count minus separators ((chars -
    (n_words-1) spaces) / n_words) — exact for single-space-joined
    fixture text and computable without a second pass.
    """
    docs = load_table(spark, sf_dir, "documents")
    w = F.expr(_words_expr_spark())
    d = docs.select(
        "doc_id",
        "lang",
        "source",
        F.length("text").alias("n_chars_raw"),
        w.alias("w"),
    ).filter(F.size("w") > 0)
    n_words = F.size("w").cast("long")
    stop_hits = F.expr(
        f"size(filter(w, x -> x IN ({_sql_list(STOPWORDS)})))"
    )
    return d.select(
        "doc_id",
        "lang",
        "source",
        "n_chars_raw",
        n_words.alias("n_words"),
        F.round((F.col("n_chars_raw") - n_words + 1) / n_words, 4).alias(
            "avg_word_len"
        ),
        F.round(stop_hits / n_words, 4).alias("stopword_ratio"),
        F.round(F.size(F.array_distinct("w")) / n_words, 4).alias("ttr"),
    )


# ---------------------------------------------------------------------------
# Aggregated quality profile per language (partial-agg friendly).
# ---------------------------------------------------------------------------
_QUALITY_BY_LANG_ORACLE = f"""
WITH toks AS (
  SELECT lang, {_words_expr_duck()} AS w, length(text) AS n_chars_raw
  FROM documents
)
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       ROUND(AVG(len(w)), 4) AS avg_words,
       ROUND(AVG(n_chars_raw), 4) AS avg_chars,
       ROUND(AVG(len(list_filter(w, x -> x IN ({_sql_list(STOPWORDS)})))
             * 1.0 / len(w)), 4) AS avg_stopword_ratio
FROM toks
WHERE len(w) > 0
GROUP BY lang
"""


@register(
    "text_quality_by_lang", oracle=_QUALITY_BY_LANG_ORACLE, tags=("text", "llm")
)
def text_quality_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level quality profile grouped by language tag — the
    shuffle carries |langs| rows of partial sums only."""
    docs = load_table(spark, sf_dir, "documents")
    d = docs.select(
        "lang",
        F.expr(_words_expr_spark()).alias("w"),
        F.length("text").alias("n_chars_raw"),
    ).filter(F.size("w") > 0)
    stop_hits = F.expr(
        f"size(filter(w, x -> x IN ({_sql_list(STOPWORDS)})))"
    )
    return d.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.round(F.avg(F.size("w")), 4).alias("avg_words"),
        F.round(F.avg("n_chars_raw"), 4).alias("avg_chars"),
        F.round(F.avg(stop_hits / F.size("w")), 4).alias("avg_stopword_ratio"),
    )


# ---------------------------------------------------------------------------
# Quality-decile binning: the curation step between scoring and
# sampling (keep the top-N% of the corpus, report per-decile stats).
# ---------------------------------------------------------------------------
# The score is kept INTEGER (stopword ratio in basis points, floor'd):
# cross-engine double rounding can flip the order of two ulp-adjacent
# scores and shift a bucket boundary, which would hash-mismatch the
# oracle; integer arithmetic is exact in both engines. Decile
# assignment replays NTILE's deal-evenly-larger-first rule from the
# global rank, computed scale-safe via global_row_number (no
# single-reducer sort) — a naive NTILE() OVER (ORDER BY ...) funnels
# the corpus through one task.
QUALITY_BINS = 10

_QUALITY_BINS_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, {_words_expr_duck()} AS w FROM documents
),
scored AS (
  SELECT doc_id,
         CAST(floor(len(list_filter(w, x -> x IN ({_sql_list(STOPWORDS)})))
                    * 10000.0 / len(w)) AS BIGINT) AS score_bp
  FROM toks WHERE len(w) > 0
),
binned AS (
  SELECT score_bp,
         NTILE({QUALITY_BINS}) OVER (ORDER BY score_bp, doc_id) AS bin
  FROM scored
)
SELECT CAST(bin AS BIGINT) AS quality_decile,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       MIN(score_bp) AS min_score_bp,
       MAX(score_bp) AS max_score_bp
FROM binned GROUP BY bin
"""


@register("text_quality_bins", oracle=_QUALITY_BINS_ORACLE, tags=("text", "llm"))
def text_quality_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact decile binning of documents by stopword-ratio score
    (basis points, integer): rank the corpus globally via the parallel
    range-rank, deal ranks into NTILE-equivalent buckets arithmetically
    (bucket sizes differ by at most one, larger buckets first), report
    per-decile counts and score ranges. Hash-checked against DuckDB's
    actual NTILE — proving the distributed restatement replays the
    single-reducer semantics exactly."""
    from golang_etl_spark.operators.windows import global_row_number

    docs = load_table(spark, sf_dir, "documents")
    d = docs.select(
        "doc_id", F.expr(_words_expr_spark()).alias("w")
    ).filter(F.size("w") > 0)
    stop_hits = F.expr(
        f"size(filter(w, x -> x IN ({_sql_list(STOPWORDS)})))"
    )
    scored = d.select(
        "doc_id",
        F.floor(stop_hits * 10000.0 / F.size("w")).cast("long").alias(
            "score_bp"
        ),
    )
    ranked = global_row_number(
        scored, [F.col("score_bp"), F.col("doc_id")], out_col="rn"
    )
    total = scored.agg(F.count("*").alias("_total"))
    b = QUALITY_BINS
    with_t = ranked.crossJoin(F.broadcast(total))
    base = F.expr(f"_total div {b}")
    rem = F.expr(f"_total % {b}")
    binned = with_t.withColumn(
        "quality_decile",
        F.when(
            F.col("rn") <= (base + 1) * rem,
            F.expr("(rn - 1) div ((_total div %d) + 1)" % b),
        )
        .otherwise(
            rem
            + F.expr(
                "(rn - 1 - (_total %% %d) * ((_total div %d) + 1)) "
                "div (_total div %d)" % (b, b, b)
            )
        )
        .cast("long")
        + 1,
    )
    return binned.groupBy("quality_decile").agg(
        F.count("*").alias("n_docs"),
        F.min("score_bp").alias("min_score_bp"),
        F.max("score_bp").alias("max_score_bp"),
    )


# ---------------------------------------------------------------------------
# Language-ID heuristic: marker-word voting with deterministic
# priority tie-break (en > de > fr > es > zh).
# ---------------------------------------------------------------------------
def _langid_scores_duck() -> str:
    return ",\n  ".join(
        f"len(list_filter(w, x -> x IN ({_sql_list(m)}))) AS score_{lang}"
        for lang, m in LANG_MARKERS.items()
    )


def _langid_case(dialect: str) -> str:
    langs = list(LANG_MARKERS)
    clauses = []
    for i, lang in enumerate(langs):
        others = [f"score_{lang} >= score_{o}" for o in langs[i + 1 :]]
        prior = [f"score_{lang} > score_{o}" for o in langs[:i]]
        cond = " AND ".join(prior + others) or "TRUE"
        clauses.append(f"WHEN {cond} THEN '{lang}'")
    return "CASE " + " ".join(clauses) + " ELSE 'und' END"


_LANGID_ORACLE = f"""
WITH scored AS (
  SELECT lang, {_langid_scores_duck()}
  FROM (SELECT lang, {_words_expr_duck()} AS w FROM documents)
)
SELECT lang, {_langid_case('duck')} AS lang_pred,
       CAST(COUNT(*) AS BIGINT) AS n_docs
FROM scored
GROUP BY lang, lang_pred
"""


@register("text_langid", oracle=_LANGID_ORACLE, tags=("text", "llm"))
def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-gram/stopword language-ID heuristic → confusion-matrix counts
    against the fixture's lang tag. Pure JVM lambda expressions; the
    only shuffle is the tiny (lang × pred) aggregate."""
    docs = load_table(spark, sf_dir, "documents")
    d = docs.select("lang", F.expr(_words_expr_spark()).alias("w"))
    for lang, markers in LANG_MARKERS.items():
        d = d.withColumn(
            f"score_{lang}",
            F.expr(f"size(filter(w, x -> x IN ({_sql_list(markers)})))"),
        )
    d = d.withColumn("lang_pred", F.expr(_langid_case("spark")))
    return d.groupBy("lang", "lang_pred").agg(F.count("*").alias("n_docs"))


# ---------------------------------------------------------------------------
# Token counting: whitespace tokens + BPE-ish regex tokens, per source.
# ---------------------------------------------------------------------------
_TOKEN_COUNT_ORACLE = f"""
WITH toks AS (
  SELECT source,
         len({_words_expr_duck()}) AS ws_tokens,
         len(regexp_extract_all(text, '{TOKEN_RE}')) AS bpe_tokens
  FROM documents
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(ws_tokens) AS BIGINT) AS total_ws_tokens,
       CAST(SUM(bpe_tokens) AS BIGINT) AS total_bpe_tokens,
       ROUND(AVG(bpe_tokens), 4) AS avg_bpe_tokens
FROM toks
GROUP BY source
"""


@register("text_token_count", oracle=_TOKEN_COUNT_ORACLE, tags=("text", "llm"))
def text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace + BPE-ish regex token counts aggregated per source —
    the token-budget accounting query of a training-data pipeline."""
    docs = load_table(spark, sf_dir, "documents")
    d = docs.select(
        "source",
        F.size(F.expr(_words_expr_spark())).alias("ws_tokens"),
        F.size(
            F.expr(f"regexp_extract_all(text, '{TOKEN_RE_SPARK}', 0)")
        ).alias("bpe_tokens"),
    )
    return d.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("ws_tokens").alias("total_ws_tokens"),
        F.sum("bpe_tokens").alias("total_bpe_tokens"),
        F.round(F.avg("bpe_tokens"), 4).alias("avg_bpe_tokens"),
    )


# ---------------------------------------------------------------------------
# Corpus curation: the end-to-end training-data prep pipeline —
# quality gate + exact dedup in one pass.
# ---------------------------------------------------------------------------
MIN_WORDS = 10
MIN_STOPWORD_RATIO = 0.01
MIN_TTR = 0.3

_CURATE_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, lang, source, text,
         {_words_expr_duck()} AS w
  FROM documents
),
quality AS (
  SELECT doc_id, lang, source,
         regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS norm,
         CAST(len(w) AS BIGINT) AS n_words,
         len(list_filter(w, x -> x IN ({_sql_list(STOPWORDS)}))) * 1.0
           / len(w) AS stopword_ratio,
         len(list_distinct(w)) * 1.0 / len(w) AS ttr
  FROM toks WHERE len(w) > 0
),
kept AS (
  SELECT * FROM quality
  WHERE n_words >= {MIN_WORDS}
    AND stopword_ratio >= {MIN_STOPWORD_RATIO}
    AND ttr >= {MIN_TTR}
),
dedup AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY md5(norm)
                               ORDER BY doc_id) AS copy_rank,
         COUNT(*) OVER (PARTITION BY md5(norm)) AS n_copies
  FROM kept
)
SELECT doc_id, lang, source, n_words,
       ROUND(stopword_ratio, 4) AS stopword_ratio,
       ROUND(ttr, 4) AS ttr,
       CAST(n_copies AS BIGINT) AS n_copies
FROM dedup WHERE copy_rank = 1
"""


@register("pipeline_corpus_curation", oracle=_CURATE_ORACLE, tags=("text", "llm", "dedup"))
def pipeline_corpus_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The canonical LLM-corpus curation pass, as one Spark job:
    tokenize → quality gate (length, stopword ratio, type-token ratio)
    → exact dedup on normalized text (keep lowest doc_id, count
    copies). What remains is the training set.

    100 TB shape: quality signals are narrow per-row JVM lambdas over
    the scan (no shuffle); the only exchange is the dedup window on
    the uniformly-distributed md5 key. Fuzzy dedup (MinHash et al.)
    composes downstream of this gate — candidates shrink to the kept
    subset."""
    docs = load_table(spark, sf_dir, "documents")
    w = F.expr(_words_expr_spark())
    quality = docs.select(
        "doc_id",
        "lang",
        "source",
        F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ").alias(
            "norm"
        ),
        w.alias("w"),
    ).filter(F.size("w") > 0)
    n_words = F.size("w").cast("long")
    stop_hits = F.expr(f"size(filter(w, x -> x IN ({_sql_list(STOPWORDS)})))")
    scored = quality.select(
        "doc_id",
        "lang",
        "source",
        "norm",
        n_words.alias("n_words"),
        (stop_hits / n_words).alias("stopword_ratio"),
        (F.size(F.array_distinct("w")) / n_words).alias("ttr"),
    )
    kept = scored.filter(
        (F.col("n_words") >= MIN_WORDS)
        & (F.col("stopword_ratio") >= MIN_STOPWORD_RATIO)
        & (F.col("ttr") >= MIN_TTR)
    )
    wdup = Window.partitionBy(F.md5("norm"))
    deduped = kept.select(
        "*",
        F.row_number().over(wdup.orderBy("doc_id")).alias("copy_rank"),
        F.count("*").over(wdup).alias("n_copies"),
    )
    return deduped.filter(F.col("copy_rank") == 1).select(
        "doc_id",
        "lang",
        "source",
        "n_words",
        F.round("stopword_ratio", 4).alias("stopword_ratio"),
        F.round("ttr", 4).alias("ttr"),
        F.col("n_copies").cast("long").alias("n_copies"),
    )


# ---------------------------------------------------------------------------
# Document fingerprinting: winnowing-lite over rolling word 5-grams.
# ---------------------------------------------------------------------------
_FP_ORACLE = f"""
WITH grams AS (
  SELECT doc_id,
         CASE WHEN len(w) >= 5 THEN
           list_transform(range(1, len(w) - 3),
             i -> md5(w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' ||
                      w[i+3] || ' ' || w[i+4]))
         ELSE [md5(array_to_string(w, ' '))] END AS g
  FROM (SELECT doc_id, {_words_expr_duck()} AS w FROM documents)
)
SELECT doc_id, list_min(g) AS fp_min, list_max(g) AS fp_max,
       CAST(len(list_distinct(g)) AS BIGINT) AS n_grams
FROM grams
"""


@register("text_fingerprint", oracle=_FP_ORACLE, tags=("text", "llm"))
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-hash document fingerprint (winnowing-lite): hash every
    word 5-gram, keep the min/max hash as the document sketch. Short
    docs (<5 words) fall back to a whole-text hash."""
    docs = load_table(spark, sf_dir, "documents")
    d = docs.select(
        "doc_id", F.expr(_words_expr_spark()).alias("w")
    )
    grams = F.expr(
        "CASE WHEN size(w) >= 5 THEN "
        "transform(sequence(1, size(w) - 4), "
        "  i -> md5(concat_ws(' ', element_at(w, i), element_at(w, i+1), "
        "           element_at(w, i+2), element_at(w, i+3), element_at(w, i+4)))) "
        "ELSE array(md5(concat_ws(' ', w))) END"
    )
    return d.select(
        "doc_id",
        F.array_min(grams).alias("fp_min"),
        F.array_max(grams).alias("fp_max"),
        F.size(F.array_distinct(grams)).cast("long").alias("n_grams"),
    )


# ---------------------------------------------------------------------------
# TF-IDF: top terms per document.
# ---------------------------------------------------------------------------
TFIDF_TOP_K = 3

_TFIDF_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, unnest({_words_expr_duck()}) AS term FROM documents
),
tf AS (
  SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
  FROM toks GROUP BY doc_id, term
),
dfreq AS (
  SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY term
),
n AS (SELECT COUNT(*) AS n_docs FROM documents),
scored AS (
  SELECT tf.doc_id, tf.term,
         tf.tf * ln((n.n_docs + 1.0) / (dfreq.df + 1.0)) AS score
  FROM tf JOIN dfreq ON tf.term = dfreq.term CROSS JOIN n
),
ranked AS (
  SELECT doc_id, term, score,
         ROW_NUMBER() OVER (PARTITION BY doc_id
                            ORDER BY score DESC, term) AS rank
  FROM scored
)
SELECT doc_id, term, CAST(rank AS BIGINT) AS rank,
       score AS tfidf
FROM ranked WHERE rank <= {TFIDF_TOP_K}
"""


@register("text_tfidf_top_terms", oracle=_TFIDF_ORACLE, tags=("text", "llm"))
def text_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-K characteristic terms per document by smoothed TF-IDF
    (idf = ln((N+1)/(df+1))). Ties break lexically so both engines
    rank identically.

    Scale shape: explode -> two partial-agg'd aggregations (doc-term
    tf, term df) -> term-keyed equi-join -> per-doc window top-k.
    The df table is term-cardinality (vocabulary) sized; the document
    count N rides in via a broadcast cross join of a 1-row aggregate,
    never a driver collect. The explicit repartition (r18) pins the
    tokenize + explode + tf partial-aggregation at full parallelism —
    the single-row-group fixture scan is one task, so that whole
    pipeline otherwise ran serially before the first exchange
    (interleaved A/B, warm steady state: 1.09-1.14 s -> 0.94-1.05 s).
    At cluster scale this is a cheap same-key rebalance."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.repartition(
        spark.sparkContext.defaultParallelism, "doc_id"
    ).selectExpr(
        "doc_id", f"explode({_words_expr_spark()}) AS term"
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    n = docs.agg(F.count("*").alias("n_docs"))
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "term",
            (
                F.col("tf")
                * F.log((F.col("n_docs") + 1.0) / (F.col("df") + 1.0))
            ).alias("score"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("score").desc(), "term")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TFIDF_TOP_K)
        .select(
            "doc_id",
            "term",
            F.col("rank").cast("long").alias("rank"),
            # unrounded on purpose: ROUND(transcendental, 6) is
            # engine-divergent when a 1-ULP ln() difference straddles
            # a rounding boundary; the comparator's relative tolerance
            # absorbs raw ULP noise but not a flipped 6th decimal
            F.col("score").alias("tfidf"),
        )
    )


# ---------------------------------------------------------------------------
# Document chunking: overlapping fixed-width character windows.
# ---------------------------------------------------------------------------
# Training pipelines split long documents into model-context-sized
# pieces with overlap so no span is cut mid-thought at a hard
# boundary. Character windows (not token windows) keep the operator a
# pure JVM projection; the token variant is the same plan over the
# regexp-tokenized array.
CHUNK_CHARS = 200
CHUNK_STRIDE = 150  # 50-char overlap between consecutive chunks

_CHUNK_ORACLE = f"""
SELECT doc_id,
       CAST(i AS BIGINT) AS chunk_id,
       CAST(i * {CHUNK_STRIDE} AS BIGINT) AS chunk_start,
       substr(text, CAST(i * {CHUNK_STRIDE} + 1 AS INT), {CHUNK_CHARS}) AS chunk_text,
       CAST(length(substr(text, CAST(i * {CHUNK_STRIDE} + 1 AS INT), {CHUNK_CHARS}))
            AS BIGINT) AS chunk_len
FROM documents,
     UNNEST(range(0, GREATEST(CAST(ceil((length(text) - {CHUNK_CHARS})
                                        / {CHUNK_STRIDE}.0) AS BIGINT), 0) + 1)) AS t(i)
"""


@register("text_chunk_documents", oracle=_CHUNK_ORACLE, tags=("text", "llm"))
def text_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split each document into CHUNK_CHARS-char chunks on a
    CHUNK_STRIDE-char stride (overlapping windows; every doc yields
    >= 1 chunk, the last chunk absorbs the tail).

    Scale shape: explode(sequence(...)) over a per-row arithmetic
    bound — a narrow JVM Generate with no shuffle at all; output size
    is ~len/stride rows per doc, exactly the blow-up the training
    pipeline asked for. substring/length stay in WholeStageCodegen."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.selectExpr(
        "doc_id",
        "text",
        f"explode(sequence(0, greatest(cast(ceil((length(text) - {CHUNK_CHARS})"
        f" / cast({CHUNK_STRIDE} AS double)) AS int), 0))) AS i",
    ).selectExpr(
        "doc_id",
        "cast(i AS bigint) AS chunk_id",
        f"cast(i * {CHUNK_STRIDE} AS bigint) AS chunk_start",
        f"substring(text, i * {CHUNK_STRIDE} + 1, {CHUNK_CHARS}) AS chunk_text",
        f"cast(length(substring(text, i * {CHUNK_STRIDE} + 1, {CHUNK_CHARS}))"
        " AS bigint) AS chunk_len",
    )


# ---------------------------------------------------------------------------
# Repetition-based quality filter (Gopher/C4-style rules).
# ---------------------------------------------------------------------------
# Thresholds calibrated on the fixture so both verdicts occur: docs
# whose single most frequent word exceeds TOP_WORD_MAX of all words,
# or whose repeated word-bigram fraction exceeds DUP_2GRAM_MAX, are
# flagged for drop — the classic repetition heuristics used to purge
# boilerplate and degenerate generations from pretraining corpora.
TOP_WORD_MAX = 0.12
DUP_2GRAM_MAX = 0.05

_REPETITION_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, lang, {_words_expr_duck()} AS w FROM documents
),
m AS (
  SELECT doc_id, lang,
    CAST(len(w) AS BIGINT) AS n_words,
    list_max(list_transform(list_distinct(w),
                            x -> len(list_filter(w, y -> y = x))))
      * 1.0 / len(w) AS top_word_ratio,
    CASE WHEN len(w) >= 2 THEN
      1.0 - len(list_distinct(list_transform(range(1, len(w)),
                 i -> w[i] || ' ' || w[i+1]))) * 1.0 / (len(w) - 1)
    ELSE 0.0 END AS dup_2gram_ratio
  FROM toks WHERE len(w) > 0
)
SELECT doc_id, lang, n_words, top_word_ratio, dup_2gram_ratio,
       (top_word_ratio <= {TOP_WORD_MAX}
        AND dup_2gram_ratio <= {DUP_2GRAM_MAX}) AS keep
FROM m
"""


@register(
    "text_repetition_filter", oracle=_REPETITION_ORACLE, tags=("text", "llm")
)
def text_repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition-based quality gate: per document, the fraction of
    words taken by the single most frequent word and the fraction of
    repeated word bigrams; ``keep`` applies the Gopher-style
    thresholds. Degenerate/boilerplate text fails one of the two.

    Scale shape: pure per-row JVM array lambdas (transform / filter /
    array_distinct) — no explode, no shuffle, no Python; the whole
    operator is a narrow projection that runs inside WholeStageCodegen
    at corpus scan speed. The per-doc mode computation is
    O(distinct_words x words) on arrays already in memory — document-
    bounded, not corpus-bounded."""
    docs = load_table(spark, sf_dir, "documents")
    d = docs.select(
        "doc_id", "lang", F.expr(_words_expr_spark()).alias("w")
    ).filter(F.expr("size(w) > 0"))
    top_ratio = (
        "array_max(transform(array_distinct(w), "
        "x -> size(filter(w, y -> y = x)))) / cast(size(w) AS double)"
    )
    dup2 = (
        "CASE WHEN size(w) >= 2 THEN "
        "1.0 - size(array_distinct(transform(sequence(1, size(w) - 1), "
        "i -> concat_ws(' ', element_at(w, i), element_at(w, i + 1))))) "
        "/ cast(size(w) - 1 AS double) ELSE 0.0D END"
    )
    return d.selectExpr(
        "doc_id",
        "lang",
        "cast(size(w) AS bigint) AS n_words",
        f"{top_ratio} AS top_word_ratio",
        f"{dup2} AS dup_2gram_ratio",
    ).selectExpr(
        "doc_id",
        "lang",
        "n_words",
        "top_word_ratio",
        "dup_2gram_ratio",
        f"(top_word_ratio <= {TOP_WORD_MAX} "
        f"AND dup_2gram_ratio <= {DUP_2GRAM_MAX}) AS keep",
    )


# ---------------------------------------------------------------------------
# Sequence packing (concat-and-chunk into fixed token budgets).
# ---------------------------------------------------------------------------
# Pretraining consumes fixed-length sequences; packing concatenates
# documents and slices every SEQ_LEN tokens. A single global
# concatenation order would serialize the corpus through one task, so
# packing runs independently per hash bucket (the per-shard packing
# every large-scale pipeline uses): deterministic md5 bucket, windows
# per bucket, bucket count scales with the cluster.
SEQ_LEN = 512
PACK_BUCKETS = 16

_PACK_BUCKET_SPARK = (
    "cast(conv(substr(md5(cast(doc_id AS string)), 1, 15), 16, 10) AS bigint)"
    f" % {PACK_BUCKETS}"
)
_PACK_BUCKET_DUCK = (
    f"('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT % {PACK_BUCKETS}"
)

_PACK_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, {_PACK_BUCKET_DUCK} AS bucket,
         len({_words_expr_duck()}) AS n_tokens
  FROM documents
),
packed AS (
  SELECT doc_id, bucket, n_tokens,
         SUM(n_tokens) OVER (PARTITION BY bucket ORDER BY doc_id
                             ROWS UNBOUNDED PRECEDING) - n_tokens AS cum_before
  FROM toks
)
SELECT doc_id, CAST(bucket AS BIGINT) AS bucket,
       CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(FLOOR(cum_before / {SEQ_LEN}) AS BIGINT) AS pack_id,
       CAST(cum_before % {SEQ_LEN} AS BIGINT) AS pack_offset
FROM packed
"""


@register("text_pack_sequences", oracle=_PACK_ORACLE, tags=("text", "llm"))
def text_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk sequence packing: assign every document a
    (bucket, pack_id, pack_offset) placing its tokens in a stream of
    SEQ_LEN(=512)-token training sequences, packed independently per
    deterministic hash bucket.

    Scale shape: one shuffle on bucket for the running-sum window;
    within a bucket the window is a streaming frame (ROWS UNBOUNDED
    PRECEDING needs no buffering of the whole partition). Bucket
    count is the parallelism dial — at 100 TB you run thousands of
    buckets, each packing its shard independently, which is exactly
    how epoch-shuffled pretraining shards are packed in practice."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.selectExpr(
        "doc_id",
        f"{_PACK_BUCKET_SPARK} AS bucket",
        f"size({_words_expr_spark()}) AS n_tokens",
    )
    w = (
        Window.partitionBy("bucket")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        toks.withColumn(
            "cum_before",
            F.sum("n_tokens").over(w) - F.col("n_tokens"),
        )
        .selectExpr(
            "doc_id",
            "cast(bucket AS bigint) AS bucket",
            "cast(n_tokens AS bigint) AS n_tokens",
            f"cast(floor(cum_before / {SEQ_LEN}) AS bigint) AS pack_id",
            f"cast(cum_before % {SEQ_LEN} AS bigint) AS pack_offset",
        )
    )


# ---------------------------------------------------------------------------
# Canonical text normalization (the dedup pre-step).
# ---------------------------------------------------------------------------
# Every dedup pipeline hashes NORMALIZED text: lowercase, punctuation
# stripped, whitespace collapsed — otherwise trivial formatting
# variants defeat exact dedup. Emitted as the canonical form plus its
# md5, so downstream exact dedup can key on norm_hash directly. The
# regex classes used ([a-z0-9] complement, space runs) behave
# identically in Java regex and RE2, keeping both engines bit-equal.
_NORMALIZE_ORACLE = """
WITH n AS (
  SELECT doc_id, lang,
         trim(regexp_replace(regexp_replace(lower(text),
              '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS norm_text
  FROM documents
)
SELECT doc_id, lang,
       CAST(length(norm_text) AS BIGINT) AS norm_len,
       md5(norm_text) AS norm_hash
FROM n
"""


@register("text_normalize", oracle=_NORMALIZE_ORACLE, tags=("text", "llm"))
def text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical normalization: lowercase, non-alphanumerics to
    spaces, space runs collapsed, trimmed — then md5 of the canonical
    form (the key exact dedup should group on). Pure JVM regexp
    projection; shuffle-free at any scale."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.selectExpr(
        "doc_id",
        "lang",
        "trim(regexp_replace(regexp_replace(lower(text),"
        " '[^a-z0-9 ]', ' '), ' +', ' ')) AS norm_text",
    ).selectExpr(
        "doc_id",
        "lang",
        "cast(length(norm_text) AS bigint) AS norm_len",
        "md5(norm_text) AS norm_hash",
    )


# ---------------------------------------------------------------------------
# PII redaction — the scrub stage every training-data pipeline runs.
# ---------------------------------------------------------------------------
# Regex scrubbers for emails / phone numbers / IPv4 addresses. The
# fixture corpus is clean word soup, so the query first APPENDS
# deterministic synthetic contact strings (keyed off doc_id, identical
# expressions on both engines) and then redacts them — the hash gate
# thereby proves detection counts AND that redaction leaves zero
# residual matches. Patterns stay in the ASCII subset where Java
# regex (Spark) and RE2 (DuckDB) agree.
PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE_RE = r"\b555-[0-9]{4}\b"
PII_IPV4_RE = r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b"

_PII_ORACLE = f"""
WITH raw AS (
  SELECT doc_id,
         text
         || CASE WHEN doc_id % 3 = 0
                 THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@mail.example'
                 ELSE '' END
         || CASE WHEN doc_id % 4 = 0
                 THEN ' call 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                 ELSE '' END
         || CASE WHEN doc_id % 5 = 0
                 THEN ' from 10.0.' || CAST(doc_id % 256 AS VARCHAR)
                      || '.' || CAST((doc_id * 7) % 256 AS VARCHAR)
                 ELSE '' END AS raw
  FROM documents
),
counted AS (
  SELECT doc_id, raw,
         len(regexp_extract_all(raw, '{PII_EMAIL_RE}')) AS n_emails,
         len(regexp_extract_all(raw, '{PII_PHONE_RE}')) AS n_phones,
         len(regexp_extract_all(raw, '{PII_IPV4_RE}')) AS n_ips,
         regexp_replace(
           regexp_replace(
             regexp_replace(raw, '{PII_EMAIL_RE}', '[EMAIL]', 'g'),
             '{PII_PHONE_RE}', '[PHONE]', 'g'),
           '{PII_IPV4_RE}', '[IP]', 'g') AS clean
  FROM raw
)
SELECT doc_id,
       CAST(n_emails AS BIGINT) AS n_emails,
       CAST(n_phones AS BIGINT) AS n_phones,
       CAST(n_ips AS BIGINT) AS n_ips,
       CAST(length(clean) AS BIGINT) AS redacted_len,
       CAST(len(regexp_extract_all(clean, '{PII_EMAIL_RE}'))
            + len(regexp_extract_all(clean, '{PII_PHONE_RE}'))
            + len(regexp_extract_all(clean, '{PII_IPV4_RE}')) AS BIGINT)
         AS residual_pii
FROM counted
"""


@register("text_pii_redact", oracle=_PII_ORACLE, tags=("text", "llm"))
def text_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Detect-and-redact PII (emails, phone numbers, IPv4) over the
    corpus: per-document match counts, the redacted length, and a
    residual-match count the hash gate proves is zero. Synthetic
    contact strings are appended deterministically first because the
    fixture corpus contains none.

    Scale shape: a narrow per-row projection of JVM regex expressions
    — no shuffle, no Python; at 100 TB this runs at scan speed, which
    is exactly what a corpus-wide scrub pass must do."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    did = F.col("doc_id")
    raw = F.concat(
        F.col("text"),
        F.when(
            did % 3 == 0,
            F.concat(
                F.lit(" contact user"),
                did.cast("string"),
                F.lit("@mail.example"),
            ),
        ).otherwise(F.lit("")),
        F.when(
            did % 4 == 0,
            F.concat(
                F.lit(" call 555-"),
                F.lpad((did % 10000).cast("string"), 4, "0"),
            ),
        ).otherwise(F.lit("")),
        F.when(
            did % 5 == 0,
            F.concat(
                F.lit(" from 10.0."),
                (did % 256).cast("string"),
                F.lit("."),
                ((did * 7) % 256).cast("string"),
            ),
        ).otherwise(F.lit("")),
    )
    clean = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("raw"), PII_EMAIL_RE, "[EMAIL]"),
            PII_PHONE_RE,
            "[PHONE]",
        ),
        PII_IPV4_RE,
        "[IP]",
    )
    counted = docs.withColumn("raw", raw).select(
        "doc_id",
        F.regexp_count("raw", F.lit(PII_EMAIL_RE)).cast("long").alias("n_emails"),
        F.regexp_count("raw", F.lit(PII_PHONE_RE)).cast("long").alias("n_phones"),
        F.regexp_count("raw", F.lit(PII_IPV4_RE)).cast("long").alias("n_ips"),
        clean.alias("clean"),
    )
    return counted.select(
        "doc_id",
        "n_emails",
        "n_phones",
        "n_ips",
        F.length("clean").cast("long").alias("redacted_len"),
        (
            F.regexp_count("clean", F.lit(PII_EMAIL_RE))
            + F.regexp_count("clean", F.lit(PII_PHONE_RE))
            + F.regexp_count("clean", F.lit(PII_IPV4_RE))
        )
        .cast("long")
        .alias("residual_pii"),
    )


# ---------------------------------------------------------------------------
# End-to-end training export: the whole corpus-prep story as ONE job.
# ---------------------------------------------------------------------------
# Composes the stages a pretraining-data pipeline chains in production
# order — quality gate -> exact dedup -> token accounting -> stable
# train/val/test assignment -> per-(split, lang) budget report —
# reusing the SAME constants/expressions as the individual operators
# (pipeline_corpus_curation, text_token_count, sample_split_hash), so
# this query is the integration proof that the stages compose.
from golang_etl_spark.operators.sampling import (  # noqa: E402
    _BUCKET_DUCK,
    _BUCKET_SPARK,
    _split_case,
)

_EXPORT_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, lang, text, {_words_expr_duck()} AS w
  FROM documents
),
quality AS (
  SELECT doc_id, lang,
         regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS norm,
         len(regexp_extract_all(text, '{TOKEN_RE}', 0)) AS bpe_tokens,
         CAST(len(w) AS BIGINT) AS n_words,
         len(list_filter(w, x -> x IN ({_sql_list(STOPWORDS)}))) * 1.0
           / len(w) AS stopword_ratio,
         len(list_distinct(w)) * 1.0 / len(w) AS ttr
  FROM toks WHERE len(w) > 0
),
kept AS (
  SELECT * FROM quality
  WHERE n_words >= {MIN_WORDS}
    AND stopword_ratio >= {MIN_STOPWORD_RATIO}
    AND ttr >= {MIN_TTR}
),
dedup AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY md5(norm)
                               ORDER BY doc_id) AS copy_rank
  FROM kept
)
SELECT {_split_case(_BUCKET_DUCK)} AS split, lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(bpe_tokens) AS BIGINT) AS total_tokens,
       ROUND(AVG(ttr), 4) AS avg_ttr
FROM dedup WHERE copy_rank = 1
GROUP BY split, lang
"""


@register(
    "pipeline_training_export",
    oracle=_EXPORT_ORACLE,
    tags=("text", "llm", "dedup", "sampling"),
)
def pipeline_training_export(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full training-data prep pipeline in one Spark job: quality
    gate (length / stopword ratio / type-token ratio) -> exact dedup
    on normalized text (keep lowest doc_id) -> BPE-ish token counts ->
    deterministic md5-bucket train/val/test split -> per-(split, lang)
    doc/token budget. Same constants as the stage-level operators, so
    this is the integration proof that they compose.

    100 TB shape: two exchanges total — the dedup window on the
    uniformly-distributed md5(norm) key, and the final partial-agg'd
    groupBy on (split, lang). Every quality/token/split signal is a
    narrow per-row JVM expression over the single corpus scan."""
    docs = load_table(spark, sf_dir, "documents")
    w = F.expr(_words_expr_spark())
    quality = docs.select(
        "doc_id",
        "lang",
        F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ").alias(
            "norm"
        ),
        F.size(
            F.expr(f"regexp_extract_all(text, '{TOKEN_RE_SPARK}', 0)")
        ).alias("bpe_tokens"),
        w.alias("w"),
    ).filter(F.size("w") > 0)
    n_words = F.size("w").cast("long")
    stop_hits = F.expr(f"size(filter(w, x -> x IN ({_sql_list(STOPWORDS)})))")
    scored = quality.select(
        "doc_id",
        "lang",
        "norm",
        "bpe_tokens",
        n_words.alias("n_words"),
        (stop_hits / n_words).alias("stopword_ratio"),
        (F.size(F.array_distinct("w")) / n_words).alias("ttr"),
    )
    kept = scored.filter(
        (F.col("n_words") >= MIN_WORDS)
        & (F.col("stopword_ratio") >= MIN_STOPWORD_RATIO)
        & (F.col("ttr") >= MIN_TTR)
    )
    wdup = Window.partitionBy(F.md5("norm")).orderBy("doc_id")
    first = kept.withColumn("copy_rank", F.row_number().over(wdup)).filter(
        F.col("copy_rank") == 1
    )
    export = first.selectExpr(
        f"{_split_case(_BUCKET_SPARK)} AS split", "lang", "bpe_tokens", "ttr"
    )
    return export.groupBy("split", "lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("bpe_tokens").alias("total_tokens"),
        F.round(F.avg("ttr"), 4).alias("avg_ttr"),
    )


# ---------------------------------------------------------------------------
# Boilerplate n-gram detection (corpus-frequent phrase mining).
# ---------------------------------------------------------------------------
# Web-scale curation removes boilerplate (nav text, license headers,
# cookie banners) by finding word n-grams that recur across MANY
# documents — the cross-document complement of the within-document
# repetition filter above. The detector is the first stage: surface
# the corpus's most document-frequent 5-grams with occurrence and
# document counts; the removal stage would anti-join documents
# against the resulting phrase list.
BOILERPLATE_N = 5
BOILERPLATE_MIN_DOCS = 3
BOILERPLATE_TOP = 20

_BOILERPLATE_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, {_words_expr_duck()} AS t FROM documents
),
grams AS (
  SELECT doc_id,
         unnest(list_transform(
           generate_series(1, len(t) - {BOILERPLATE_N - 1}),
           i -> array_to_string(t[i:i+{BOILERPLATE_N - 1}], ' '))) AS ngram
  FROM toks
)
SELECT ngram,
       CAST(COUNT(*) AS BIGINT) AS n_occurrences,
       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
FROM grams
GROUP BY ngram
HAVING COUNT(DISTINCT doc_id) >= {BOILERPLATE_MIN_DOCS}
ORDER BY n_docs DESC, n_occurrences DESC, ngram
LIMIT {BOILERPLATE_TOP}
"""


@register(
    "text_boilerplate_ngrams",
    oracle=_BOILERPLATE_ORACLE,
    tags=("text", "llm", "topk"),
)
def text_boilerplate_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-frequent 5-grams with occurrence + document-frequency
    counts — the boilerplate-phrase detector of a curation pipeline.

    Spark's sequence(1, stop) DESCENDS when stop < 1 (DuckDB's
    generate_series yields empty), so documents shorter than N tokens
    are filtered before the gram expansion — the oracle produces no
    grams for them either way.

    Scale shape: gram expansion is a map-side HOF projection (output
    ~= token count), the count/distinct-doc rollup partial-aggregates
    on the gram key, and the final top-20 is a TakeOrdered. One
    exchange on the gram key; hot grams ARE the signal, and AQE
    skew-join is irrelevant because there is no join.

    The explicit repartition (r18) pins the tokenize + gram expansion
    at full parallelism: the fixture parquet is one row group, so the
    scan is a single task and the whole HOF pipeline (5-gram slices x
    tokens per doc) otherwise runs serially before its first exchange
    (interleaved A/B at sf0.1: 1.42/1.77/2.60 s -> 0.94/1.02/1.41 s).
    At cluster scale the input arrives in many splits and this is a
    cheap rebalance (guide §2.5's few-distinct-keys caveat does not
    bite: doc_id is high-cardinality)."""
    docs = load_table(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism, "doc_id"
    )
    toks = docs.select(
        "doc_id", F.expr(_words_expr_spark()).alias("t")
    ).filter(F.size("t") >= BOILERPLATE_N)
    grams = toks.select(
        "doc_id",
        F.explode(
            F.expr(
                f"transform(sequence(1, size(t) - {BOILERPLATE_N - 1}), "
                f"i -> concat_ws(' ', slice(t, i, {BOILERPLATE_N})))"
            )
        ).alias("ngram"),
    )
    return (
        grams.groupBy("ngram")
        .agg(
            F.count("*").alias("n_occurrences"),
            F.countDistinct("doc_id").alias("n_docs"),
        )
        .filter(F.col("n_docs") >= BOILERPLATE_MIN_DOCS)
        .orderBy(F.desc("n_docs"), F.desc("n_occurrences"), "ngram")
        .limit(BOILERPLATE_TOP)
    )


# ---------------------------------------------------------------------------
# Per-language quality gate: keep the top half of each language by TTR.
# ---------------------------------------------------------------------------
# Production curation thresholds are set PER LANGUAGE (a fixed global
# cutoff over-prunes low-resource languages whose raw score
# distributions differ). The gate is deliberately ordinal — rank by
# type-token ratio with a doc_id tiebreak and keep cume_dist <= 0.5 —
# so the keep/cut decision depends only on ordering, which replays
# exactly across engines (a fixed float threshold on an interpolated
# per-group median would not).
QUALITY_GATE_KEEP = 0.5  # keep the top half of each language

_QUALITY_GATE_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, lang, {_words_expr_duck()} AS w FROM documents
),
scored AS (
  SELECT doc_id, lang,
         ROUND(len(list_distinct(w)) * 1.0 / len(w), 4) AS ttr
  FROM toks WHERE len(w) > 0
),
ranked AS (
  SELECT doc_id, lang, ttr,
         ROUND(cume_dist() OVER (PARTITION BY lang
                                 ORDER BY ttr DESC, doc_id), 6) AS pct
  FROM scored
)
SELECT doc_id, lang, ttr, pct,
       CASE WHEN pct <= {QUALITY_GATE_KEEP} THEN 'keep' ELSE 'cut' END
         AS verdict
FROM ranked
"""


@register(
    "text_quality_gate_per_lang",
    oracle=_QUALITY_GATE_ORACLE,
    tags=("text", "llm", "window", "sampling"),
)
def text_quality_gate_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language quality gate: score each document's type-token
    ratio, rank WITHIN its language (ttr desc, doc_id tiebreak), and
    keep the top half (cume_dist <= 0.5) — per-group relative
    thresholds instead of one global cutoff.

    100 TB shape: one window shuffle partitioned by lang. Language is
    a low-cardinality skewed key (English dominates real corpora) —
    at scale, swap the exact cume_dist for the mergeable quantile
    sketch (sketch_percentile_approx) to get per-lang cutoffs without
    a per-lang global sort; this exact formulation is the verification
    pairing."""
    docs = load_table(spark, sf_dir, "documents")
    w = F.expr(_words_expr_spark())
    scored = (
        docs.select("doc_id", "lang", w.alias("w"))
        .filter(F.size("w") > 0)
        .select(
            "doc_id",
            "lang",
            F.round(F.size(F.array_distinct("w")) / F.size("w"), 4).alias(
                "ttr"
            ),
        )
    )
    win = Window.partitionBy("lang").orderBy(F.desc("ttr"), "doc_id")
    ranked = scored.withColumn(
        "pct", F.round(F.cume_dist().over(win), 6)
    )
    return ranked.select(
        "doc_id",
        "lang",
        "ttr",
        "pct",
        F.when(F.col("pct") <= QUALITY_GATE_KEEP, F.lit("keep"))
        .otherwise(F.lit("cut"))
        .alias("verdict"),
    )


# ---------------------------------------------------------------------------
# Source-level (domain) curation: ban whole sources, not single docs.
# ---------------------------------------------------------------------------
# Web-scale pipelines make a KEEP/BAN decision per domain before
# per-document filtering (a spam domain's every page wastes the
# per-doc pipeline). The verdict here is integer-only arithmetic —
# duplicate rate from exact-hash distinct counts, low-quality rate
# from per-doc TTR — so it replays exactly across engines with no
# float-threshold boundary risk.
SOURCE_BAN_DUP_PCT = 30   # ban when >30% of docs are exact dups
SOURCE_BAN_LOW_PCT = 50   # ban when >50% of docs have TTR < LOW_TTR
LOW_TTR = 0.45

_SOURCE_FILTER_ORACLE = f"""
WITH scored AS (
  SELECT source,
         md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS h,
         ROUND(len(list_distinct({_words_expr_duck()})) * 1.0
               / len({_words_expr_duck()}), 4) AS ttr
  FROM documents
  WHERE len({_words_expr_duck()}) > 0
),
per_source AS (
  SELECT source,
         CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(COUNT(DISTINCT h) AS BIGINT) AS n_unique,
         CAST(SUM(CASE WHEN ttr < {LOW_TTR} THEN 1 ELSE 0 END) AS BIGINT)
           AS n_low_ttr,
         ROUND(AVG(ttr), 4) AS avg_ttr
  FROM scored GROUP BY source
)
SELECT source, n_docs, n_unique, n_low_ttr, avg_ttr,
       CASE WHEN (n_docs - n_unique) * 100 > n_docs * {SOURCE_BAN_DUP_PCT}
              THEN 'ban_dup'
            WHEN n_low_ttr * 100 > n_docs * {SOURCE_BAN_LOW_PCT}
              THEN 'ban_quality'
            ELSE 'keep' END AS verdict
FROM per_source
"""


@register(
    "curation_source_filter",
    oracle=_SOURCE_FILTER_ORACLE,
    tags=("text", "llm", "dedup", "aggregation"),
)
def curation_source_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-level curation verdicts: per source, count docs, exact
    duplicates (normalized-text md5) and low-TTR docs, then ban the
    source when the duplicate share exceeds 30% or the low-quality
    share exceeds 50%. Verdict thresholds are integer cross-products
    (n*100 > total*pct) — no float comparisons anywhere in the
    decision.

    100 TB shape: one scan, one partial-agg'd groupBy over source
    (domain cardinality << doc count; COUNT(DISTINCT h) shuffles one
    hash per doc, the unavoidable cost of an exact dup rate — swap in
    approx_count_distinct at production scale, same plan otherwise).
    The verdict table is tiny and broadcast-joins back onto the corpus
    as the actual filter step."""
    docs = load_table(spark, sf_dir, "documents")
    w = F.expr(_words_expr_spark())
    scored = (
        docs.select(
            "source",
            F.md5(
                F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
            ).alias("h"),
            w.alias("w"),
        )
        .filter(F.size("w") > 0)
        .select(
            "source",
            "h",
            F.round(F.size(F.array_distinct("w")) / F.size("w"), 4).alias(
                "ttr"
            ),
        )
    )
    low = F.when(F.col("ttr") < LOW_TTR, 1).otherwise(0)
    per_source = scored.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.countDistinct("h").alias("n_unique"),
        F.sum(low).cast("long").alias("n_low_ttr"),
        F.round(F.avg("ttr"), 4).alias("avg_ttr"),
    )
    dup_ban = (F.col("n_docs") - F.col("n_unique")) * 100 > F.col(
        "n_docs"
    ) * SOURCE_BAN_DUP_PCT
    low_ban = F.col("n_low_ttr") * 100 > F.col("n_docs") * SOURCE_BAN_LOW_PCT
    return per_source.select(
        "source",
        "n_docs",
        "n_unique",
        "n_low_ttr",
        "avg_ttr",
        F.when(dup_ban, F.lit("ban_dup"))
        .when(low_ban, F.lit("ban_quality"))
        .otherwise(F.lit("keep"))
        .alias("verdict"),
    )


# ---------------------------------------------------------------------------
# BPE merge candidates: the tokenizer-training counting step.
# ---------------------------------------------------------------------------
# One BPE training iteration = count adjacent symbol pairs across the
# corpus and merge the most frequent. The scalable formulation counts
# the VOCABULARY first (corpus tokens -> distinct words with
# frequencies — a partial-agg'd groupBy that collapses 100 TB of text
# to vocab size) and then explodes character pairs over the vocabulary
# only, weighting by word frequency — exactly how production BPE
# trainers avoid touching raw text more than once per iteration.
BPE_TOP = 20


_BPE_ORACLE = f"""
WITH words AS (
  SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS w
  FROM documents
),
vocab AS (
  SELECT w, COUNT(*) AS freq FROM words GROUP BY w
),
pairs AS (
  SELECT substr(w, i, 2) AS pair, freq
  FROM vocab, UNNEST(generate_series(1, length(w) - 1)) AS g(i)
  WHERE length(w) >= 2
)
SELECT pair, CAST(SUM(freq) AS BIGINT) AS n_pairs
FROM pairs GROUP BY pair
ORDER BY n_pairs DESC, pair
LIMIT {BPE_TOP}
"""


@register(
    "text_bpe_pair_counts", oracle=_BPE_ORACLE, tags=("text", "llm", "topk")
)
def text_bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top BPE merge candidates: frequency-weighted adjacent character
    pairs, counted over the distinct-word vocabulary instead of the
    raw token stream. Deterministic total order (count desc, pair) so
    the top-K cut is stable.

    100 TB shape: the only corpus-sized exchange is the vocabulary
    groupBy (map-side combined to vocab cardinality); the pair
    explosion and final agg run over vocab-sized data. Subsequent BPE
    iterations would re-run the pair count over the re-segmented
    vocabulary — same plan, never re-reading the corpus."""
    docs = load_table(spark, sf_dir, "documents")
    vocab = (
        docs.selectExpr(
            "explode(regexp_extract_all(lower(text), '[a-z]+', 0)) AS w"
        )
        .groupBy("w")
        .agg(F.count("*").alias("freq"))
    )
    pairs = vocab.filter(F.length("w") >= 2).selectExpr(
        "explode(transform(sequence(1, length(w) - 1), "
        "i -> substring(w, i, 2))) AS pair",
        "freq",
    )
    return (
        pairs.groupBy("pair")
        .agg(F.sum("freq").cast("long").alias("n_pairs"))
        .orderBy(F.desc("n_pairs"), "pair")
        .limit(BPE_TOP)
    )


# ---------------------------------------------------------------------------
# Cross-modal curation: text quality x embedding-space redundancy.
# ---------------------------------------------------------------------------
# Real curation gates compose signals from different modalities: a
# document survives only if its TEXT passes quality AND its EMBEDDING
# is not semantically redundant. documents.doc_id and
# embeddings.vec_id share an id space in the fixtures; where the
# embedding table is smaller (sf0.1: 2000 vecs vs 5000 docs) the
# pipeline scores only the intersection — the production analog of
# "only embedded docs are candidates".
_XMODAL_ORACLE = f"""
WITH scored AS (
  SELECT doc_id, lang, n_chars,
         ROUND(len(list_distinct({{words}})) * 1.0 / len({{words}}), 4) AS ttr
  FROM documents WHERE len({{words}}) > 0
),
sem AS ({{semantic}})
SELECT s.lang,
       CAST(COUNT(*) AS BIGINT) AS n_candidates,
       CAST(SUM(CASE WHEN s.ttr >= {LOW_TTR} AND sem.verdict <> 'drop'
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       CAST(SUM(CASE WHEN s.ttr >= {LOW_TTR} AND sem.verdict <> 'drop'
                     THEN s.n_chars ELSE 0 END) AS BIGINT) AS char_budget
FROM scored s JOIN sem ON s.doc_id = sem.vec_id
GROUP BY s.lang
"""


def _xmodal_oracle() -> str:
    from golang_etl_spark.operators.dedup import _SEMANTIC_PRUNE_ORACLE

    return _XMODAL_ORACLE.format(
        words=_words_expr_duck(), semantic=_SEMANTIC_PRUNE_ORACLE
    )


@register(
    "pipeline_multimodal_curation",
    oracle=_xmodal_oracle(),
    tags=("text", "llm", "dedup", "ann", "aggregation"),
)
def pipeline_multimodal_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compose the per-document TTR quality bar with the SemDeDup
    verdict (dedup_semantic_prune) over the shared id space and report
    the surviving per-language character budget — the cross-modal
    version of pipeline_training_export's budget table.

    100 TB shape: reuses the semantic-prune plan (broadcast rep
    joins), one id-keyed equi-join between the two corpuses, one
    partial-agg'd lang rollup. Nothing new shuffles except the
    doc<->vec join, which co-partitions on the shared id."""
    from golang_etl_spark.operators.dedup import dedup_semantic_prune

    docs = load_table(spark, sf_dir, "documents")
    w = F.expr(_words_expr_spark())
    scored = (
        docs.select("doc_id", "lang", "n_chars", w.alias("w"))
        .filter(F.size("w") > 0)
        .select(
            "doc_id",
            "lang",
            "n_chars",
            F.round(F.size(F.array_distinct("w")) / F.size("w"), 4).alias(
                "ttr"
            ),
        )
    )
    sem = dedup_semantic_prune(spark, sf_dir).select("vec_id", "verdict")
    keep = (F.col("ttr") >= LOW_TTR) & (F.col("verdict") != "drop")
    return (
        scored.join(sem, scored["doc_id"] == sem["vec_id"])
        .groupBy("lang")
        .agg(
            F.count("*").cast("long").alias("n_candidates"),
            F.sum(F.when(keep, 1).otherwise(0)).cast("long").alias("n_kept"),
            F.sum(F.when(keep, F.col("n_chars")).otherwise(0))
            .cast("long")
            .alias("char_budget"),
        )
    )


# ---------------------------------------------------------------------------
# Bigram language-model counts (n-gram LM statistics).
# ---------------------------------------------------------------------------
_BIGRAM_TOP = 50

_BIGRAM_ORACLE = f"""
WITH toks AS (
  SELECT list_transform({_words_expr_duck()}, x -> lower(x)) AS w
  FROM documents
),
pairs AS (
  SELECT w[i] AS w1, w[i + 1] AS w2
  FROM toks, UNNEST(generate_series(1, len(w) - 1)) AS t(i)
),
counts AS (
  SELECT w1, w2, COUNT(*) AS n_pair FROM pairs GROUP BY w1, w2
),
tot AS (
  SELECT w1, w2, n_pair,
         SUM(n_pair) OVER (PARTITION BY w1) AS n_prefix
  FROM counts
)
SELECT w1, w2, CAST(n_pair AS BIGINT) AS n_pair,
       CAST(n_prefix AS BIGINT) AS n_prefix,
       ROUND(n_pair / n_prefix, 6) AS p_cond
FROM tot
ORDER BY n_pair DESC, w1, w2
LIMIT {_BIGRAM_TOP}
"""


@register(
    "text_bigram_lm",
    oracle=_BIGRAM_ORACLE,
    tags=("text", "llm", "aggregation"),
)
def text_bigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus bigram statistics with conditional probabilities
    P(w2 | w1) = c(w1,w2) / c(w1,·) — the count table behind n-gram
    LMs, domain-shift diagnostics, and repeated-phrase mining. Top
    pairs by frequency with deterministic tie-breaks.

    100 TB shape: bigram expansion is a map-side Generate (zip of the
    token array with its own tail — no join, no index arithmetic in
    the shuffle); pair counting partial-aggregates, so the exchange
    carries one row per DISTINCT pair per partition, not one per
    token. The prefix normalizer is a window over the vocab²-bounded
    count table, far smaller than the corpus. Prefix skew ("the ...")
    lives in that small table, not in the token stream."""
    docs = load_table(spark, sf_dir, "documents")
    w = f"transform({_words_expr_spark()}, x -> lower(x))"
    pairs = docs.select(
        F.explode(
            F.expr(
                f"zip_with(slice({w}, 1, greatest(size({w}) - 1, 0)), "
                f"slice({w}, 2, greatest(size({w}) - 1, 0)), "
                "(a, b) -> struct(a AS w1, b AS w2))"
            )
        ).alias("p")
    ).select("p.w1", "p.w2")
    counts = pairs.groupBy("w1", "w2").agg(F.count("*").alias("n_pair"))
    tot = counts.withColumn(
        "n_prefix", F.sum("n_pair").over(Window.partitionBy("w1"))
    )
    return (
        tot.select(
            "w1",
            "w2",
            "n_pair",
            "n_prefix",
            F.round(F.col("n_pair") / F.col("n_prefix"), 6).alias("p_cond"),
        )
        .orderBy(F.desc("n_pair"), "w1", "w2")
        .limit(_BIGRAM_TOP)
    )


# ---------------------------------------------------------------------------
# BPE merge-rule TRAINING (iterative greedy merges over the vocabulary).
# ---------------------------------------------------------------------------
# text_bpe_pair_counts ranks the FIRST merge's candidates; this trains
# an actual merge table: K rounds of (count adjacent symbol pairs,
# take the argmax, fuse it everywhere). Iterative + data-dependent
# argmax per round — but K is a compile-time constant, so the loop
# UNROLLS into one SQL statement (round 10; the sql_scripting_robust_
# mean unrolled-oracle pattern) and the trainer is HASH-checked, not
# rows-only. tests/test_bpe_train.py additionally replays the
# identical algorithm in pure Python on fixture + hypothesis-random
# corpora and asserts rule-for-rule equality.
BPE_MERGES = 8

# One marker char per unrolled round: the oracle mirrors Spark's
# array<string> symbol sequences as plain strings in which every
# SYMBOL is exactly one character — [a-z] for the initial characters,
# one fresh digit for each learned merge (the vocabulary is [a-z]+
# only, so digits cannot collide; same scheme the fixed-rule twin
# text_bpe_apply_fixed proved). Single-char symbols make DuckDB's
# replace(s, ml || mr, marker) — greedy leftmost non-overlapping,
# exactly the fold's semantics — the fusion step, with DATA-DEPENDENT
# ml/mr pulled from each round's one-row argmax CTE.
_BPE_MARKERS = "01234567"
assert len(_BPE_MARKERS) >= BPE_MERGES


def _bpe_round_sql(r: int) -> str:
    """One unrolled training round: count adjacent symbol pairs over
    v{r-1} (marker chars = symbols), pick the argmax with Spark's
    exact tie-break — count DESC, then the DECODED left/right symbol
    strings ASC, via the running symbol table st{r-1} — fuse it
    everywhere with replace(), and extend the symbol table. AS
    MATERIALIZED throughout: DuckDB inlines plain CTEs, and an
    unrolled 8-round chain would re-expand the vocabulary scan
    exponentially (the k-core oracle lesson)."""
    m = _BPE_MARKERS[r - 1]
    return f"""
p{r} AS MATERIALIZED (
  SELECT substr(s, g.i, 1) AS ml, substr(s, g.i + 1, 1) AS mr,
         SUM(freq) AS c
  FROM v{r - 1}, UNNEST(generate_series(1, length(s) - 1)) AS g(i)
  WHERE length(s) >= 2
  GROUP BY 1, 2
),
r{r} AS MATERIALIZED (
  SELECT p.ml, p.mr, dl.dec AS dl, dr.dec AS dr, p.c
  FROM p{r} p
  JOIN st{r - 1} dl ON dl.m = p.ml
  JOIN st{r - 1} dr ON dr.m = p.mr
  ORDER BY p.c DESC, dl.dec, dr.dec
  LIMIT 1
),
v{r} AS MATERIALIZED (
  SELECT replace(v.s, rr.ml || rr.mr, '{m}') AS s, v.freq
  FROM v{r - 1} v CROSS JOIN r{r} rr
),
st{r} AS MATERIALIZED (
  SELECT m, dec FROM st{r - 1}
  UNION ALL SELECT '{m}', dl || dr FROM r{r}
)"""


def _bpe_unrolled_with(k: int) -> str:
    """The shared WITH body for both BPE oracles: vocabulary build,
    initial a-z symbol table, and k unrolled training rounds."""
    head = """
words AS MATERIALIZED (
  SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS w
  FROM documents
),
v0 AS MATERIALIZED (SELECT w AS s, COUNT(*) AS freq FROM words GROUP BY w),
st0 AS MATERIALIZED (
  SELECT chr(CAST(g.c AS INT)) AS m, chr(CAST(g.c AS INT)) AS dec
  FROM UNNEST(generate_series(97, 122)) AS g(c)
)"""
    return "WITH " + head.strip() + "," + ",".join(
        _bpe_round_sql(r) for r in range(1, k + 1)
    )


# Grouping pairs by MARKER equals Spark's grouping by decoded symbol
# strings iff no two markers decode to the same string. Distinct
# merge PATHS can in principle decode identically (e.g. (t,he) and
# (th,e) both yielding 'the'), which Spark — whose symbols ARE their
# strings — would unify; test_bpe_train.py pins that all learned
# symbols stay pairwise distinct at every fixture SF, and the
# hash gate itself would surface a violation as a mismatch, never a
# silent wrong-green.
def _bpe_train_oracle_sql(k: int) -> str:
    """The full unrolled-trainer oracle for ANY round count k <=
    len(_BPE_MARKERS) — bound to BPE_MERGES for the registered query;
    tests/test_bpe_train.py replays it on hypothesis-random corpora
    against the pure-Python reference to pin the unrolling logic
    itself (argmax tie-breaks, marker fusion) across tie-heavy
    cases the fixtures never hit."""
    return (
        _bpe_unrolled_with(k)
        + "\n"
        + "\nUNION ALL ".join(
            f'SELECT {r} AS merge_rank, dl AS "left", dr AS "right", '
            f"dl || dr AS merged, CAST(c AS BIGINT) AS pair_count FROM r{r}"
            for r in range(1, k + 1)
        )
        + "\nORDER BY merge_rank"
    )


_BPE_TRAIN_ORACLE = _bpe_train_oracle_sql(BPE_MERGES)


def _bpe_merge_fold(a: str, b: str) -> str:
    """SQL higher-order fold fusing adjacent (a, b) -> ab, greedy
    leftmost non-overlapping — the exact BPE apply step, run JVM-side
    per vocabulary word (never per corpus token)."""
    qa, qb = a.replace("'", "''"), b.replace("'", "''")
    qm = (a + b).replace("'", "''")
    return (
        "aggregate(syms, "
        "named_struct('out', cast(array() AS array<string>), "
        "'pend', cast(NULL AS string)), "
        "(acc, x) -> CASE "
        "WHEN acc.pend IS NULL THEN named_struct('out', acc.out, 'pend', x) "
        f"WHEN acc.pend = '{qa}' AND x = '{qb}' THEN "
        f"named_struct('out', array_append(acc.out, '{qm}'), "
        "'pend', cast(NULL AS string)) "
        "ELSE named_struct('out', array_append(acc.out, acc.pend), 'pend', x) "
        "END, "
        "acc -> CASE WHEN acc.pend IS NULL THEN acc.out "
        "ELSE array_append(acc.out, acc.pend) END)"
    )


@register(
    "text_bpe_train_merges",
    oracle=_BPE_TRAIN_ORACLE,
    tags=("text", "llm", "analytic"),
)
def text_bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train a BPE merge table: BPE_MERGES greedy rounds, each counting
    frequency-weighted adjacent symbol pairs over the vocabulary and
    fusing the (count DESC, pair ASC) argmax everywhere it occurs.
    Returns the learned rules (rank, left, right, merged, pair_count).

    HASH-checked since round 10: K is a constant, so the DuckDB oracle
    unrolls all K rounds (_bpe_round_sql) with single-char marker
    encoding for merged symbols and replays the data-dependent argmax
    — including Spark's (count DESC, left, right) tie-break on the
    DECODED symbol strings — and the greedy-leftmost fusion via
    replace(). Assumes (a) the corpus slice yields at least K rounds
    of pairs (the trainer breaks early on exhaustion; the oracle
    cannot) and (b) learned symbols stay pairwise distinct — both
    pinned by tests/test_bpe_train.py, which also replays the
    algorithm in pure Python rule-for-rule (fixture corpus +
    hypothesis-random corpora).

    100 TB shape: the corpus is touched ONCE (the word-frequency
    aggregation, map-side combined down to vocab cardinality — this is
    how production BPE trainers work); every iteration then runs over
    the vocab table only. The per-round argmax collect is one row
    (a planning step, same class as the min/max bounds queries), and
    localCheckpoint caps the lineage the loop would otherwise stack."""
    docs = load_table(spark, sf_dir, "documents")
    return train_bpe_merges(spark, docs, BPE_MERGES)


def train_bpe_merges(
    spark: SparkSession, docs: DataFrame, k: int
) -> DataFrame:
    """The trainer proper, over any DataFrame with a ``text`` column
    (split out so property tests can drive arbitrary corpora)."""
    vocab = (
        docs.selectExpr(
            "explode(regexp_extract_all(lower(text), '[a-z]+', 0)) AS w"
        )
        .groupBy("w")
        .agg(F.count("*").alias("freq"))
        .selectExpr(
            "transform(sequence(1, length(w)), i -> substring(w, i, 1)) AS syms",
            "freq",
        )
        # eager=False: lineage truncates identically, but the vocab
        # (and each round's fold below) materializes inside the round's
        # own argmax job instead of a separate checkpoint job — halves
        # the loop's job count (r17)
        .localCheckpoint(eager=False)
    )
    rules = []
    for rank in range(1, k + 1):
        pairs = vocab.filter(F.expr("size(syms) >= 2")).selectExpr(
            "explode(transform(slice(syms, 1, size(syms) - 1), "
            "(s, i) -> struct(s AS l, element_at(syms, i + 2) AS r))) AS p",
            "freq",
        )
        best = (
            pairs.groupBy("p.l", "p.r")
            .agg(F.sum("freq").alias("c"))
            .orderBy(F.desc("c"), "l", "r")
            .limit(1)
            .collect()
        )
        if not best:
            break
        a, b, cnt = best[0]["l"], best[0]["r"], int(best[0]["c"])
        rules.append((rank, a, b, a + b, cnt))
        vocab = vocab.selectExpr(
            f"{_bpe_merge_fold(a, b)} AS syms", "freq"
        ).localCheckpoint(eager=False)
    return spark.createDataFrame(
        rules,
        "merge_rank INT, left STRING, right STRING, merged STRING, "
        "pair_count BIGINT",
    )


_BPE_APPLY_ORACLE = (
    _bpe_unrolled_with(BPE_MERGES)
    + f""",
stats AS (
  SELECT (SELECT SUM(freq) FROM v0) AS n_words,
         (SELECT SUM(length(s) * freq) FROM v0) AS t0,
         (SELECT SUM(length(s) * freq) FROM v{BPE_MERGES}) AS t1
)
SELECT CAST({BPE_MERGES} AS INT) AS n_rules,
       CAST(n_words AS BIGINT) AS n_words,
       CAST(t0 AS BIGINT) AS tokens_before,
       CAST(t1 AS BIGINT) AS tokens_after,
       ROUND(t1 / t0, 6) AS compression,
       ROUND(t1 / n_words, 6) AS tokens_per_word
FROM stats
"""
)


@register(
    "text_bpe_apply_stats",
    oracle=_BPE_APPLY_ORACLE,
    tags=("text", "llm", "analytic"),
)
def text_bpe_apply_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Close the tokenizer loop: train the BPE_MERGES-rule merge table
    (text_bpe_train_merges), APPLY the rules in rank order to the
    corpus vocabulary, and report the compression they bought —
    frequency-weighted token counts before/after and tokens-per-word.

    HASH-checked since round 10 via the same unrolled oracle as the
    trainer: applying the K learned rules in rank order to the
    original vocabulary equals (by induction) the trainer's final
    round-K vocabulary, so the oracle just measures v{K}. The ratio
    columns round with F.round — Spark's HALF_UP matches DuckDB's
    ROUND for positives, the convention every cosine column already
    relies on (Python's round() would banker-round exact halves the
    other way).

    100 TB shape: identical to training — the corpus feeds ONE
    word-frequency aggregation; every apply step is a JVM fold over
    the vocab table. Token counts are frequency-weighted sums, so the
    stats describe the real token stream without rescanning it."""
    docs = load_table(spark, sf_dir, "documents")
    rules = train_bpe_merges(spark, docs, BPE_MERGES).collect()
    vocab = (
        docs.selectExpr(
            "explode(regexp_extract_all(lower(text), '[a-z]+', 0)) AS w"
        )
        .groupBy("w")
        .agg(F.count("*").alias("freq"))
        .selectExpr(
            "transform(sequence(1, length(w)), i -> substring(w, i, 1)) AS syms",
            "freq",
        )
        # deliberately EAGER (unlike the trainer's loop checkpoints):
        # the before-stats leg and the k-fold after-leg consume vocab
        # CONCURRENTLY in the one assembled job below, and a lazy
        # checkpoint's first-touch materialization could run the full
        # tokenize+shuffle once per leg
        .localCheckpoint()
    )
    before = vocab.selectExpr(
        "CAST(sum(size(syms) * freq) AS BIGINT) AS tokens_before",
        "CAST(sum(freq) AS BIGINT) AS n_words",
    )
    # The apply loop chains folds WITHOUT per-rule checkpoints: unlike
    # training (whose per-round argmax is an action), every fold here
    # is a narrow op, so all k rules pipeline into ONE stage over the
    # checkpointed vocab — k materializations replaced by zero.
    for r in sorted(rules, key=lambda r: r["merge_rank"]):
        vocab = vocab.selectExpr(
            f"{_bpe_merge_fold(r['left'], r['right'])} AS syms", "freq"
        )
    after = vocab.selectExpr(
        "CAST(sum(size(syms) * freq) AS BIGINT) AS tokens_after"
    )
    # before/after stats assemble as one-row broadcast cross joins
    # (both legs re-read the checkpointed vocab) instead of two
    # driver-blocking .first() jobs + a createDataFrame: same values,
    # one job instead of three, legs overlap (r17; guide §2.6/§5).
    row = (
        before.crossJoin(F.broadcast(after))
        .select(
            F.lit(len(rules)).cast("int").alias("n_rules"),
            "n_words",
            "tokens_before",
            "tokens_after",
        )
    )
    # ratios rounded with F.round (HALF_UP), the engine-matched
    # convention the oracle's ROUND(...) replays — see docstring
    return row.select(
        "*",
        F.round(F.col("tokens_after") / F.col("tokens_before"), 6).alias(
            "compression"
        ),
        F.round(F.col("tokens_after") / F.col("n_words"), 6).alias(
            "tokens_per_word"
        ),
    )


# Hash-gated twin of the rows-only BPE pair (VERDICT r05 item 5):
# apply a HARD-CODED 3-rule merge table — no training, so no iterative
# data-dependent argmax — through the exact same fold machinery
# (_bpe_merge_fold), and oracle the resulting token stats in DuckDB.
# The oracle replays the fold as chained string replace()s with
# single-character markers ('0' = th, '1' = the, '2' = in — digits
# can't collide, the vocabulary is [a-z]+ only): every rule's left and
# right are single symbol units, and replace() is greedy leftmost
# non-overlapping exactly like the fold, so the two formulations are
# equivalent by construction. A green hash proves the fold ARITHMETIC
# in isolation; since round 10 the trainer's argmax loop is ALSO
# hash-checked (unrolled oracle above), making this the minimal
# fold-only control for diagnosing a trainer-oracle mismatch.
_BPE_FIXED_RULES = [("t", "h"), ("th", "e"), ("i", "n")]

_BPE_FIXED_ORACLE = """
WITH words AS (
  SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS w
  FROM documents
),
vocab AS (SELECT w, COUNT(*) AS freq FROM words GROUP BY w),
applied AS (
  SELECT replace(replace(replace(w, 'th', '0'), '0e', '1'), 'in', '2') AS s,
         length(w) AS n0, freq
  FROM vocab
)
SELECT 'n_words' AS stat, CAST(SUM(freq) AS BIGINT) AS value FROM applied
UNION ALL
SELECT 'tokens_before', CAST(SUM(n0 * freq) AS BIGINT) FROM applied
UNION ALL
SELECT 'tokens_after', CAST(SUM(length(s) * freq) AS BIGINT) FROM applied
UNION ALL
SELECT 'sym_th', CAST(SUM((length(s) - length(replace(s, '0', ''))) * freq)
                      AS BIGINT) FROM applied
UNION ALL
SELECT 'sym_the', CAST(SUM((length(s) - length(replace(s, '1', ''))) * freq)
                       AS BIGINT) FROM applied
UNION ALL
SELECT 'sym_in', CAST(SUM((length(s) - length(replace(s, '2', ''))) * freq)
                      AS BIGINT) FROM applied
"""


@register(
    "text_bpe_apply_fixed",
    oracle=_BPE_FIXED_ORACLE,
    tags=("text", "llm", "analytic"),
)
def text_bpe_apply_fixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply the fixed 3-rule merge table (t+h, th+e, i+n) to the
    corpus vocabulary via the REAL BPE fold (_bpe_merge_fold) and
    report frequency-weighted token stats plus surviving merged-symbol
    counts. The stats describe the real token stream without
    rescanning it — one corpus-sized word-frequency aggregation, then
    three JVM folds over vocab-sized data."""
    docs = load_table(spark, sf_dir, "documents")
    vocab = (
        docs.selectExpr(
            "explode(regexp_extract_all(lower(text), '[a-z]+', 0)) AS w"
        )
        .groupBy("w")
        .agg(F.count("*").alias("freq"))
        .selectExpr(
            "transform(sequence(1, length(w)), i -> substring(w, i, 1)) AS syms",
            "length(w) AS n0",
            "freq",
        )
    )
    for a, b in _BPE_FIXED_RULES:
        vocab = vocab.selectExpr(
            f"{_bpe_merge_fold(a, b)} AS syms", "n0", "freq"
        )

    def _sym_count(sym: str) -> F.Column:
        return F.expr(
            f"sum(size(filter(syms, x -> x = '{sym}')) * freq)"
        ).cast("long")

    agg = vocab.agg(
        F.sum("freq").cast("long").alias("n_words"),
        F.sum(F.expr("n0 * freq")).cast("long").alias("tokens_before"),
        F.sum(F.expr("size(syms) * freq")).cast("long").alias("tokens_after"),
        _sym_count("th").alias("sym_th"),
        _sym_count("the").alias("sym_the"),
        _sym_count("in").alias("sym_in"),
    )
    return agg.selectExpr(
        "stack(6, "
        "'n_words', n_words, "
        "'tokens_before', tokens_before, "
        "'tokens_after', tokens_after, "
        "'sym_th', sym_th, "
        "'sym_the', sym_the, "
        "'sym_in', sym_in) AS (stat, value)"
    )


# ---------------------------------------------------------------------------
# Perplexity-style quality scoring (per-doc NLL under the corpus LM).
# ---------------------------------------------------------------------------
# The CCNet-style filter: score every document by its average negative
# log-likelihood under a Laplace-smoothed corpus bigram model —
# gibberish and boilerplate sit in the tails. Scores only (no
# threshold flags): membership at a float cutline is the one thing
# that can flip on an ULP, so the cut belongs to the consumer.
_PPLX_ORACLE = """
WITH toks AS (
  SELECT doc_id, list_transform({words}, x -> lower(x)) AS w
  FROM documents
),
doc_pairs AS (
  SELECT doc_id, w[i] AS w1, w[i + 1] AS w2
  FROM toks, UNNEST(generate_series(1, len(w) - 1)) AS t(i)
),
c12 AS (SELECT w1, w2, COUNT(*) AS n12 FROM doc_pairs GROUP BY w1, w2),
c1 AS (SELECT w1, COUNT(*) AS n1 FROM doc_pairs GROUP BY w1),
v AS (
  SELECT COUNT(DISTINCT x.tok) AS vocab
  FROM (SELECT unnest(w) AS tok FROM toks) x
)
SELECT d.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_bigrams,
       ROUND(AVG(-ln((c12.n12 + 1.0) / (c1.n1 + v.vocab))), 6) AS nll
FROM doc_pairs d
JOIN c12 ON c12.w1 = d.w1 AND c12.w2 = d.w2
JOIN c1 ON c1.w1 = d.w1
CROSS JOIN v
GROUP BY d.doc_id
""".format(words=_words_expr_duck())


@register(
    "text_perplexity_score",
    oracle=_PPLX_ORACLE,
    tags=("text", "llm", "aggregation", "stats"),
)
def text_perplexity_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document average bigram NLL under the corpus's own
    Laplace-smoothed LM: -ln((c(w1,w2)+1) / (c(w1)+|V|)) averaged over
    the doc's bigram occurrences. One map-side bigram expansion feeds
    both the global counts and the per-doc scoring join.

    100 TB shape: the LM tables are vocab-/vocab²-bounded (far smaller
    than the corpus) and broadcast; the only corpus-scale exchange is
    the per-doc aggregation. In production the LM comes from a held-in
    reference corpus — same plan, smaller broadcast."""
    docs = load_table(spark, sf_dir, "documents")
    w = f"transform({_words_expr_spark()}, x -> lower(x))"
    doc_pairs = docs.select(
        "doc_id",
        F.explode(
            F.expr(
                f"zip_with(slice({w}, 1, greatest(size({w}) - 1, 0)), "
                f"slice({w}, 2, greatest(size({w}) - 1, 0)), "
                "(a, b) -> struct(a AS w1, b AS w2))"
            )
        ).alias("p"),
    ).select("doc_id", "p.w1", "p.w2").persist()
    c12 = doc_pairs.groupBy("w1", "w2").agg(F.count("*").alias("n12"))
    c1 = doc_pairs.groupBy("w1").agg(F.count("*").alias("n1"))
    # vocab attaches as a broadcast one-row cross join (the sanctioned
    # scalar-attach pattern) instead of a blocking .first(): the value
    # and arithmetic are identical (BIGINT count cast to double by the
    # division), but the smoothing constant no longer costs a separate
    # driver-synchronous job BEFORE the scoring job — all stages plan
    # into one job and the vocab leg overlaps the LM-count legs on
    # idle cores (r17; guide §2.6 overlap + §5 driver).
    vocab = docs.select(F.explode(F.expr(w)).alias("tok")).agg(
        F.countDistinct("tok").cast("double").alias("vocab")
    )
    scored = (
        doc_pairs.join(F.broadcast(c12), ["w1", "w2"])
        .join(F.broadcast(c1), "w1")
        .crossJoin(F.broadcast(vocab))
        .select(
            "doc_id",
            (
                -F.log(
                    (F.col("n12") + F.lit(1.0))
                    / (F.col("n1") + F.col("vocab"))
                )
            ).alias("nll_term"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count("*").alias("n_bigrams"),
        F.round(F.avg("nll_term"), 6).alias("nll"),
    )


# ---------------------------------------------------------------------------
# Linear quality classifier (fasttext-style scorer, fixed weights).
# ---------------------------------------------------------------------------
# A trained quality classifier at inference time is just a dot product
# over engineered features plus a sigmoid — entirely JVM expressions,
# scan-speed at any scale. Weights here are fixed literals standing in
# for a trained model's coefficients; swapping in real ones changes
# nothing structurally.
_QC_W = {"bias": -2.0, "ttr": 3.0, "avg_len": 0.4, "len_sat": 1.5}
_QC_LEN_CAP = 200

_QC_ORACLE = f"""
WITH feats AS (
  SELECT doc_id,
         len(w) AS n_words,
         len(list_distinct(w)) * 1.0 / len(w) AS ttr,
         list_aggregate(list_transform(w, x -> length(x)), 'sum')
           * 1.0 / len(w) AS avg_len,
         LEAST(len(w), {_QC_LEN_CAP}) * 1.0 / {_QC_LEN_CAP} AS len_sat
  FROM (SELECT doc_id, list_transform({{words}}, x -> lower(x)) AS w
        FROM documents)
  WHERE len(w) > 0
)
SELECT doc_id, CAST(n_words AS BIGINT) AS n_words,
       ROUND(ttr, 6) AS ttr,
       ROUND(avg_len, 6) AS avg_len,
       ROUND(1.0 / (1.0 + exp(-({_QC_W['bias']}
             + {_QC_W['ttr']} * ttr
             + {_QC_W['avg_len']} * avg_len
             + {_QC_W['len_sat']} * len_sat))), 6) AS quality_score
FROM feats
""".format(words=_words_expr_duck())


@register(
    "text_quality_classifier",
    oracle=_QC_ORACLE,
    tags=("text", "llm", "stats"),
)
def text_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear quality classifier at inference: engineered features
    (type-token ratio, average word length, saturating length) dotted
    with fixed weights through a sigmoid — one narrow projection, no
    Python, no shuffle beyond the scan. The production pattern for
    fasttext-style corpus scoring: features and coefficients both live
    in the plan."""
    docs = load_table(spark, sf_dir, "documents")
    w = f"transform({_words_expr_spark()}, x -> lower(x))"
    feats = docs.selectExpr(
        "doc_id",
        f"{w} AS w",
    ).filter(F.expr("size(w) > 0")).selectExpr(
        "doc_id",
        "size(w) AS n_words",
        # `* 1.0` would type these DECIMAL (the SQL decimal-literal trap,
        # r06 driver hash fail); divide by an explicit DOUBLE instead so the
        # output dtype matches the DuckDB oracle's DOUBLE.
        "size(array_distinct(w)) / CAST(size(w) AS DOUBLE) AS ttr",
        "aggregate(transform(w, x -> length(x)), 0, (acc, x) -> acc + x)"
        " / CAST(size(w) AS DOUBLE) AS avg_len",
        f"least(size(w), {_QC_LEN_CAP}) / CAST({_QC_LEN_CAP} AS DOUBLE)"
        " AS len_sat",
    )
    z = (
        F.lit(_QC_W["bias"])
        + F.lit(_QC_W["ttr"]) * F.col("ttr")
        + F.lit(_QC_W["avg_len"]) * F.col("avg_len")
        + F.lit(_QC_W["len_sat"]) * F.col("len_sat")
    )
    return feats.select(
        "doc_id",
        F.col("n_words").cast("long").alias("n_words"),
        F.round("ttr", 6).alias("ttr"),
        F.round("avg_len", 6).alias("avg_len"),
        F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), 6).alias(
            "quality_score"
        ),
    )


# ---------------------------------------------------------------------------
# Token entropy: the information-theoretic quality signal.
# ---------------------------------------------------------------------------
# Shannon entropy of each document's token distribution — low entropy
# flags repetition/boilerplate (a doc that is one phrase looped has
# H ~ log2(phrase length), far below natural text); the normalized
# form H / log2(n_unique) is scale-free across document lengths.
# Computed as H = log2(n) - (Σ c·log2(c)) / n — ONE aggregation over
# per-(doc, token) counts, no self-join — and the SAME formula on both
# engines so the float path (and hence the rounded hash) agrees.
_ENTROPY_ORACLE = f"""
WITH w AS (
  SELECT doc_id, unnest(list_transform({{words}}, x -> lower(x))) AS word
  FROM documents
),
cnt AS (
  SELECT doc_id, word, COUNT(*) AS c FROM w GROUP BY doc_id, word
),
agg AS (
  SELECT doc_id,
         CAST(SUM(c) AS DOUBLE) AS n,
         COUNT(*) AS n_unique,
         SUM(c * log2(CAST(c AS DOUBLE))) AS clog
  FROM cnt GROUP BY doc_id
)
SELECT doc_id,
       CAST(n AS BIGINT) AS n_words,
       CAST(n_unique AS BIGINT) AS n_unique,
       ROUND(log2(n) - clog / n, 6) AS token_entropy,
       CASE WHEN n_unique > 1
            THEN ROUND((log2(n) - clog / n)
                       / log2(CAST(n_unique AS DOUBLE)), 6)
            ELSE 0.0 END AS norm_entropy
FROM agg
""".format(words=_words_expr_duck())


@register(
    "text_token_entropy",
    oracle=_ENTROPY_ORACLE,
    tags=("text", "llm", "stats"),
)
def text_token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document Shannon entropy of the token distribution plus its
    normalized form — the standard information-theoretic repetition /
    boilerplate detector (complements text_quality_stats' ratio
    features and text_repetition_filter's n-gram loop rule).

    100 TB shape: explode → two map-side-combinable aggregations keyed
    by doc_id — no join, no window; the (doc_id, word) count table is
    the only shuffle and it shrinks with dedup of repeated tokens.
    H = log2(n) - Σ c·log2(c) / n keeps the arithmetic one SUM per doc
    (identical formula in the DuckDB oracle so rounding agrees)."""
    docs = load_table(spark, sf_dir, "documents")
    w = docs.select(
        "doc_id",
        F.explode(
            F.expr(f"transform({_words_expr_spark()}, x -> lower(x))")
        ).alias("word"),
    )
    cnt = w.groupBy("doc_id", "word").agg(F.count("*").alias("c"))
    agg = cnt.groupBy("doc_id").agg(
        F.sum("c").cast("double").alias("n"),
        F.count("*").alias("n_unique"),
        F.sum(F.col("c") * F.log2(F.col("c").cast("double"))).alias("clog"),
    )
    ent = F.log2(F.col("n")) - F.col("clog") / F.col("n")
    return agg.select(
        "doc_id",
        F.col("n").cast("long").alias("n_words"),
        F.col("n_unique").cast("long").alias("n_unique"),
        F.round(ent, 6).alias("token_entropy"),
        F.when(
            F.col("n_unique") > 1,
            F.round(ent / F.log2(F.col("n_unique").cast("double")), 6),
        )
        .otherwise(F.lit(0.0))
        .alias("norm_entropy"),
    )


# ---------------------------------------------------------------------------
# BM25 keyword retrieval: top-K documents per query.
# ---------------------------------------------------------------------------
# The lexical half of a retrieval stack (the dense half lives in
# operators/similarity.py): Okapi BM25 with the standard k1/b
# saturation, a fixed literal query set, and one top-K ranking per
# query. Complements text_tfidf_top_terms (which ranks TERMS per doc;
# this ranks DOCS per query).
BM25_K1 = 1.2
BM25_B = 0.75
BM25_TOP_K = 10
BM25_QUERIES: tuple[tuple[int, tuple[str, ...]], ...] = (
    (1, ("hash", "join", "merge")),
    (2, ("stream", "batch")),
    (3, ("vector", "query", "filter")),
)
_BM25_VOCAB = tuple(sorted({t for _, ts in BM25_QUERIES for t in ts}))
_BM25_QTERM_VALUES = ", ".join(
    f"({qid}, '{t}')" for qid, terms in BM25_QUERIES for t in terms
)

_BM25_ORACLE = f"""
WITH docs_w AS (
  SELECT doc_id, {_words_expr_duck()} AS w FROM documents
),
stats AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs,
         AVG(CAST(len(w) AS DOUBLE)) AS avgdl
  FROM docs_w
),
tf AS (
  SELECT doc_id, dl, term, CAST(COUNT(*) AS BIGINT) AS tf
  FROM (SELECT doc_id, CAST(len(w) AS DOUBLE) AS dl, unnest(w) AS term
        FROM docs_w)
  WHERE term IN ({_sql_list(_BM25_VOCAB)})
  GROUP BY doc_id, dl, term
),
dfreq AS (
  SELECT term, CAST(COUNT(*) AS DOUBLE) AS df FROM tf GROUP BY term
),
qterms(query_id, term) AS (VALUES {_BM25_QTERM_VALUES}),
contrib AS (
  SELECT q.query_id, tf.doc_id,
         ln(1 + (s.n_docs - d.df + 0.5) / (d.df + 0.5))
           * tf.tf * ({BM25_K1!r} + 1)
           / (tf.tf + {BM25_K1!r} * (1 - {BM25_B!r} + {BM25_B!r} * tf.dl / s.avgdl))
           AS c
  FROM qterms q
  JOIN dfreq d ON q.term = d.term
  JOIN tf ON q.term = tf.term
  CROSS JOIN stats s
),
scored AS (
  SELECT query_id, doc_id, SUM(c) AS score
  FROM contrib GROUP BY query_id, doc_id
),
ranked AS (
  SELECT query_id, doc_id, score,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY ROUND(score, 6) DESC, doc_id) AS rank
  FROM scored
)
SELECT CAST(query_id AS BIGINT) AS query_id, doc_id,
       CAST(rank AS BIGINT) AS rank, score AS bm25
FROM ranked WHERE rank <= {BM25_TOP_K}
"""


@register(
    "text_bm25_topk",
    oracle=_BM25_ORACLE,
    tags=("text", "llm", "ann"),
)
def text_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 top-K retrieval for a fixed literal query set.

    100 TB shape: ONE exploded pass over the corpus produces the
    (doc, term) tf table pre-filtered to the union query vocabulary
    (tiny), carrying dl through the grouping key so document length
    needs no second join; df and corpus stats (N, avgdl) are a
    vocab-sized aggregate and a 1-row aggregate, both broadcast. The
    only fact-sized shuffles are the two keyed aggregations; the
    final ranking windows over ~vocab-hit docs per query, not the
    corpus.

    Ranking is FP-robust across engines: row_number orders by
    ROUND(score, 6) with a doc_id tiebreak, so docs with identical
    term statistics (exact real-arithmetic ties that differ by
    summation-order ULPs in either engine) collapse into the same
    rounded key and break deterministically. The emitted score stays
    unrounded (same policy as text_tfidf_top_terms: the comparator's
    relative tolerance absorbs ln() ULP noise; ROUND would reify it).
    """
    docs = load_table(spark, sf_dir, "documents")
    w = docs.select("doc_id", F.expr(_words_expr_spark()).alias("w"))
    stats = w.agg(
        F.count("*").cast("double").alias("n_docs"),
        F.avg(F.size("w").cast("double")).alias("avgdl"),
    )
    tf = (
        w.select(
            "doc_id",
            F.size("w").cast("double").alias("dl"),
            F.explode("w").alias("term"),
        )
        .filter(F.col("term").isin(*_BM25_VOCAB))
        .groupBy("doc_id", "dl", "term")
        .agg(F.count("*").alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(F.count("*").cast("double").alias("df"))
    qterms = spark.createDataFrame(
        [(qid, t) for qid, terms in BM25_QUERIES for t in terms],
        "query_id LONG, term STRING",
    )
    k1, b = BM25_K1, BM25_B
    contrib = (
        tf.join(F.broadcast(dfreq), "term")
        .join(F.broadcast(qterms), "term")
        .crossJoin(F.broadcast(stats))
        .select(
            "query_id",
            "doc_id",
            (
                F.log(
                    1
                    + (F.col("n_docs") - F.col("df") + 0.5)
                    / (F.col("df") + 0.5)
                )
                * F.col("tf")
                * (k1 + 1)
                / (
                    F.col("tf")
                    + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))
                )
            ).alias("c"),
        )
    )
    scored = contrib.groupBy("query_id", "doc_id").agg(
        F.sum("c").alias("score")
    )
    wnd = Window.partitionBy("query_id").orderBy(
        F.round(F.col("score"), 6).desc(), "doc_id"
    )
    return (
        scored.withColumn("rank", F.row_number().over(wnd))
        .filter(F.col("rank") <= BM25_TOP_K)
        .select(
            "query_id",
            "doc_id",
            F.col("rank").cast("long").alias("rank"),
            F.col("score").alias("bm25"),
        )
    )

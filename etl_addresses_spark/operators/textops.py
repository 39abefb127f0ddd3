"""Text-analysis operators over the documents table.

Language-ID (stopword-hit heuristic), quality scoring (length/
punctuation/stopword ratios), token counting, and document
fingerprinting — all as native column expressions (split / filter /
array_intersect / md5), fully oracle-checkable.  At scale these are
embarrassingly parallel projections: no shuffle at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_addresses_spark.sources.tables import load_table

# Tiny built-in stopword lists for the heuristic language scorer.
STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "it"],
    "es": ["el", "la", "de", "y", "que", "en", "los", "un"],
    "de": ["der", "die", "und", "das", "ein", "ist", "nicht", "mit"],
}
QUALITY_STOPWORDS = STOPWORDS["en"]


def _tokens() -> F.Column:
    return F.split(F.col("text"), " ")


def text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: whitespace tokens, distinct tokens, char stats."""
    d = load_table(spark, sf_dir, "documents")
    toks = _tokens()
    return d.select(
        "doc_id",
        F.length("text").cast("long").alias("n_chars_actual"),
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_distinct_tokens"),
        (F.length("text").cast("double") / F.size(toks)).alias("avg_token_span"),
        (
            F.size(F.array_distinct(toks)).cast("double") / F.size(toks)
        ).alias("ttr"),
    )


TEXT_STATS_SQL = """
SELECT doc_id,
  length(text) AS n_chars_actual,
  len(string_split(text, ' ')) AS n_tokens,
  len(list_distinct(string_split(text, ' '))) AS n_distinct_tokens,
  CAST(length(text) AS DOUBLE) / len(string_split(text, ' ')) AS avg_token_span,
  CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
    / len(string_split(text, ' ')) AS ttr
FROM documents
"""


def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring: stopword ratio, alpha ratio, mean word length,
    plus a composite keep/drop flag (the C4-style filter shape)."""
    d = load_table(spark, sf_dir, "documents")
    toks = _tokens()
    n_tokens = F.size(toks)
    stop_hits = F.size(
        F.filter(toks, lambda t: t.isin(*QUALITY_STOPWORDS))
    )
    alpha_chars = F.length(F.regexp_replace(F.col("text"), "[^a-z]", ""))
    stop_ratio = stop_hits.cast("double") / n_tokens
    alpha_ratio = alpha_chars.cast("double") / F.length("text")
    mean_word_len = (
        (F.length("text") - (n_tokens - 1)).cast("double") / n_tokens
    )
    return d.select(
        "doc_id",
        stop_ratio.alias("stop_ratio"),
        alpha_ratio.alias("alpha_ratio"),
        mean_word_len.alias("mean_word_len"),
        (
            (n_tokens >= 10)
            & (mean_word_len >= 2.0)
            & (mean_word_len <= 12.0)
        ).alias("keep"),
    )


_STOPS_SQL = "('" + "', '".join(QUALITY_STOPWORDS) + "')"

TEXT_QUALITY_SQL = f"""
SELECT doc_id,
  CAST(len(list_filter(string_split(text, ' '), t -> t IN {_STOPS_SQL})) AS DOUBLE)
    / len(string_split(text, ' ')) AS stop_ratio,
  CAST(length(regexp_replace(text, '[^a-z]', '', 'g')) AS DOUBLE)
    / length(text) AS alpha_ratio,
  CAST(length(text) - (len(string_split(text, ' ')) - 1) AS DOUBLE)
    / len(string_split(text, ' ')) AS mean_word_len,
  (len(string_split(text, ' ')) >= 10
   AND CAST(length(text) - (len(string_split(text, ' ')) - 1) AS DOUBLE)
       / len(string_split(text, ' ')) >= 2.0
   AND CAST(length(text) - (len(string_split(text, ' ')) - 1) AS DOUBLE)
       / len(string_split(text, ' ')) <= 12.0) AS keep
FROM documents
"""


def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic language ID: distinct-stopword hits per language,
    argmax with fixed preference order (en > es > de > unknown)."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.array_distinct(_tokens())
    scores = {
        lang: F.size(F.array_intersect(toks, F.array(*[F.lit(w) for w in words])))
        for lang, words in STOPWORDS.items()
    }
    s_en, s_es, s_de = scores["en"], scores["es"], scores["de"]
    pred = (
        F.when((s_en == 0) & (s_es == 0) & (s_de == 0), F.lit("unknown"))
        .when((s_en >= s_es) & (s_en >= s_de), F.lit("en"))
        .when(s_es >= s_de, F.lit("es"))
        .otherwise(F.lit("de"))
    )
    return d.select(
        "doc_id",
        s_en.cast("long").alias("score_en"),
        s_es.cast("long").alias("score_es"),
        s_de.cast("long").alias("score_de"),
        pred.alias("lang_pred"),
    )


def _lang_hits(words: list[str]) -> str:
    inlist = "['" + "', '".join(words) + "']"
    return (
        f"len(list_intersect(list_distinct(string_split(text, ' ')), {inlist}))"
    )


TEXT_LANGID_SQL = f"""
SELECT doc_id,
  {_lang_hits(STOPWORDS['en'])} AS score_en,
  {_lang_hits(STOPWORDS['es'])} AS score_es,
  {_lang_hits(STOPWORDS['de'])} AS score_de,
  CASE
    WHEN {_lang_hits(STOPWORDS['en'])} = 0 AND {_lang_hits(STOPWORDS['es'])} = 0
         AND {_lang_hits(STOPWORDS['de'])} = 0 THEN 'unknown'
    WHEN {_lang_hits(STOPWORDS['en'])} >= {_lang_hits(STOPWORDS['es'])}
         AND {_lang_hits(STOPWORDS['en'])} >= {_lang_hits(STOPWORDS['de'])} THEN 'en'
    WHEN {_lang_hits(STOPWORDS['es'])} >= {_lang_hits(STOPWORDS['de'])} THEN 'es'
    ELSE 'de'
  END AS lang_pred
FROM documents
"""


def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprint: md5 over the sorted distinct token set
    (word-order/duplication-insensitive content hash)."""
    d = load_table(spark, sf_dir, "documents")
    canon = F.concat_ws(" ", F.array_sort(F.array_distinct(_tokens())))
    return d.select(
        "doc_id",
        F.md5(canon.cast("binary")).alias("fingerprint"),
        F.md5(F.col("text").cast("binary")).alias("exact_hash"),
    )


TEXT_FINGERPRINT_SQL = """
SELECT doc_id,
  md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' ')) AS fingerprint,
  md5(text) AS exact_hash
FROM documents
"""


def text_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 terms per doc by tf*idf with a LINEAR idf (n_docs/df,
    no log): log() differs by ULPs between libm implementations, which
    would break bit-parity with the oracle; linear idf keeps the score
    a ratio of exact integers (one double division, identical
    everywhere) while preserving the ranking semantics."""
    from pyspark.sql import Window as W

    d = load_table(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(_tokens()).alias("tok"))
    tf = tok.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tok.distinct().groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    n_docs = d.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(dfreq, "tok")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "tok",
            "tf",
            "df",
            ((F.col("tf") * F.col("n_docs")).cast("double") / F.col("df")).alias(
                "tfidf"
            ),
        )
    )
    w = W.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("tok"))
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= 3)
        .select("doc_id", "rnk", "tok", "tf", "df", "tfidf")
    )


TEXT_TFIDF_SQL = """
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
),
tf AS (SELECT doc_id, tok, count(*) AS tf FROM tok GROUP BY doc_id, tok),
dfreq AS (
  SELECT tok, count(*) AS df FROM (SELECT DISTINCT doc_id, tok FROM tok)
  GROUP BY tok
),
nd AS (SELECT count(*) AS n_docs FROM documents),
scored AS (
  SELECT doc_id, tok, tf, df,
         CAST(tf * n_docs AS DOUBLE) / df AS tfidf
  FROM tf JOIN dfreq USING (tok), nd
)
SELECT doc_id, rnk, tok, tf, df, tfidf FROM (
  SELECT *, row_number() OVER (
    PARTITION BY doc_id ORDER BY tfidf DESC, tok ASC) AS rnk
  FROM scored)
WHERE rnk <= 3
"""

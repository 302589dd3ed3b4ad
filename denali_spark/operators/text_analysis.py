"""Text-analysis operators over ``documents``: token statistics, quality
scoring, language identification, fingerprinting, n-gram frequency.

All pure JVM expression work (split/filter/transform/aggregate) — these run
at scan speed with zero shuffles except the final aggregations, which is the
property that matters when the corpus is 100 TB of text.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from denali_spark.engine.tables import load_table
from denali_spark.operators.dedup import SQL_TOKENS, tokens_col
from denali_spark.operators.registry import query


@query(
    "text_token_stats",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, n_chars, {SQL_TOKENS.format(c='text')} AS t FROM documents
    )
    SELECT doc_id,
           CAST(len(t) AS BIGINT) AS n_tokens,
           CAST(len(list_distinct(t)) AS BIGINT) AS n_unique,
           CAST(list_sum(list_transform(t, x -> length(x))) AS DOUBLE) / len(t) AS avg_token_len,
           CAST(len(list_distinct(t)) AS DOUBLE) / len(t) AS ttr,
           CAST(n_chars AS DOUBLE) / len(t) AS chars_per_token
    FROM toks WHERE len(t) > 0
    """,
    tags=("text", "tokenize"),
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace/punct tokenization + per-doc lexical stats (type-token
    ratio is the standard quality signal for generated/spam text)."""
    docs = load_table(spark, sf_dir, "documents")
    t = tokens_col()
    toks = docs.select("doc_id", "n_chars", t.alias("t")).filter(F.size("t") > 0)
    total_len = F.aggregate(
        F.col("t"), F.lit(0), lambda acc, x: acc + F.length(x)
    )
    return toks.select(
        "doc_id",
        F.size("t").cast("long").alias("n_tokens"),
        F.size(F.array_distinct("t")).cast("long").alias("n_unique"),
        (total_len.cast("double") / F.size("t")).alias("avg_token_len"),
        (F.size(F.array_distinct("t")).cast("double") / F.size("t")).alias("ttr"),
        (F.col("n_chars").cast("double") / F.size("t")).alias("chars_per_token"),
    )


@query(
    "text_quality_score",
    oracle="""
    SELECT doc_id,
           CAST(length(text) - length(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g')) AS DOUBLE)
             / length(text) AS punct_ratio,
           CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS DOUBLE)
             / length(text) AS digit_ratio,
           CAST(length(text) - length(regexp_replace(text, '[A-Z]', '', 'g')) AS DOUBLE)
             / length(text) AS upper_ratio,
           length(text) BETWEEN 80 AND 10000
             AND (CAST(length(text) - length(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g')) AS DOUBLE)
                  / length(text)) < 0.2 AS passes_quality
    FROM documents WHERE length(text) > 0
    """,
    tags=("text", "quality"),
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic quality filters (punctuation/digit/uppercase density +
    length band) — the cheap first-stage gate of a data-quality pipeline."""
    docs = load_table(spark, sf_dir, "documents").filter(F.length("text") > 0)
    ln = F.length("text").cast("double")

    def ratio(pattern: str) -> Column:
        return (F.length("text") - F.length(F.regexp_replace("text", pattern, ""))).cast(
            "double"
        ) / ln

    punct = ratio("[^a-zA-Z0-9 ]")
    return docs.select(
        "doc_id",
        punct.alias("punct_ratio"),
        ratio("[0-9]").alias("digit_ratio"),
        ratio("[A-Z]").alias("upper_ratio"),
        (F.length("text").between(80, 10000) & (punct < 0.2)).alias("passes_quality"),
    )


# Tiny per-language stopword lists (public, frequency-based).
_STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "that", "it", "for"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "zu", "auf"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "des", "dans", "que"],
    "es": ["el", "la", "los", "las", "es", "un", "una", "y", "en", "que"],
}
_LANG_ORDER = ["en", "de", "fr", "es"]


@query(
    "text_langid",
    oracle=(
        "WITH toks AS (SELECT doc_id, list_distinct("
        + SQL_TOKENS.format(c="text")
        + ") AS t FROM documents), scores AS (SELECT doc_id, "
        + ", ".join(
            f"len(list_intersect(t, {_STOPWORDS[lang]!r})) AS s_{lang}".replace("'", "'")
            for lang in _LANG_ORDER
        )
        + """ FROM toks)
    SELECT doc_id,
           CASE WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es THEN 'en'
                WHEN s_de >= s_fr AND s_de >= s_es THEN 'de'
                WHEN s_fr >= s_es THEN 'fr'
                ELSE 'es' END AS pred_lang,
           CAST(s_en + s_de + s_fr + s_es AS BIGINT) AS evidence
    FROM scores
    """
    ),
    tags=("text", "langid"),
)
def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-voting language ID (n-gram-free heuristic): score = distinct
    tokens ∩ per-language stopword list; deterministic priority ordering
    breaks ties. A real pipeline swaps in fastText/CLD3 via pandas_udf; the
    Spark plumbing (scan-side scoring, no shuffle) is identical."""
    docs = load_table(spark, sf_dir, "documents")
    t = F.array_distinct(tokens_col())
    scores = docs.select(
        "doc_id",
        *[
            F.size(
                F.array_intersect(t, F.array(*[F.lit(w) for w in _STOPWORDS[lang]]))
            ).alias(f"s_{lang}")
            for lang in _LANG_ORDER
        ],
    )
    pred = (
        F.when(
            (F.col("s_en") >= F.col("s_de"))
            & (F.col("s_en") >= F.col("s_fr"))
            & (F.col("s_en") >= F.col("s_es")),
            "en",
        )
        .when((F.col("s_de") >= F.col("s_fr")) & (F.col("s_de") >= F.col("s_es")), "de")
        .when(F.col("s_fr") >= F.col("s_es"), "fr")
        .otherwise("es")
    )
    evidence = reduce(
        lambda x, y: x + y, [F.col(f"s_{lang}") for lang in _LANG_ORDER]
    ).cast("long")
    return scores.select("doc_id", pred.alias("pred_lang"), evidence.alias("evidence"))


@query(
    "text_fingerprint",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, {SQL_TOKENS.format(c='text')} AS t FROM documents
    )
    SELECT doc_id,
           md5(array_to_string(list_sort(list_distinct(t)), ' ')) AS fingerprint
    FROM toks
    """,
    tags=("text", "fingerprint"),
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-insensitive document fingerprint (md5 of the sorted vocabulary)
    — catches shuffled/reordered copies that exact hashing misses."""
    docs = load_table(spark, sf_dir, "documents")
    t = tokens_col()
    return docs.select(
        "doc_id",
        F.md5(F.array_join(F.sort_array(F.array_distinct(t)), " ")).alias(
            "fingerprint"
        ),
    )


@query(
    "text_top_bigrams",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, {SQL_TOKENS.format(c='text')} AS t FROM documents
    ),
    bg AS (
      SELECT unnest(list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1])) AS bigram
      FROM toks WHERE len(t) >= 2
    )
    SELECT bigram, COUNT(*) AS n
    FROM bg GROUP BY bigram
    ORDER BY n DESC, bigram LIMIT 20
    """,
    tags=("text", "ngram"),
)
def text_top_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide top-20 bigrams: explode → count → top-k (partial
    aggregation makes the shuffle carry |vocab²∩corpus| rows, not |tokens|)."""
    docs = load_table(spark, sf_dir, "documents")
    t = tokens_col()
    toks = docs.select(t.alias("t")).filter(F.size("t") >= 2)
    bigrams = toks.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("t") - 1),
                lambda i: F.concat_ws(
                    " ", F.element_at(F.col("t"), i), F.element_at(F.col("t"), i + 1)
                ),
            )
        ).alias("bigram")
    )
    return (
        bigrams.groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "bigram")
        .limit(20)
    )

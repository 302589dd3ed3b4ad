"""Column-returning engine functions (all built-in JVM expressions).

One definition per primitive lives with its operator (dedup/similarity/
text_analysis keep their oracle-paired forms); this module composes those
internals into a stable, documented public vocabulary. Nothing here drops
to Python in the row path — every function is built from
`pyspark.sql.functions` and stays inside whole-stage codegen.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column
from pyspark.sql import functions as F

from denali_spark.operators.dedup import (
    _simhash_col,
    dot_cols,
    h60,
    minhash_sigs,
    shingles_col,
    tokens_col,
)
from denali_spark.operators.similarity import cosine as _cosine


def tokens(col: str | Column = "text") -> Column:
    """Lowercase alnum tokens (array<string>)."""
    return tokens_col(col if isinstance(col, str) else col)


def token_count(col: str | Column = "text") -> Column:
    return F.size(tokens(col)).cast("long")


def shingles(toks: Column) -> Column:
    """Distinct 3-word shingles of a token array."""
    return shingles_col(toks)


def ngrams(toks: Column, n: int) -> Column:
    """Distinct word n-grams (generalized shingles)."""
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (n - 1)),
            lambda i: F.concat_ws(
                " ", *[F.element_at(toks, i + int(j)) for j in range(n)]
            ),
        )
    )


def minhash_signature(text_col: str | Column = "text") -> Column:
    """16-value minhash signature (array<long>) of a document's 3-shingle
    set — the unit the LSH band join groups on."""
    hashes = F.transform(shingles_col(tokens_col(text_col)), lambda s: h60(s))
    return F.array(*minhash_sigs(hashes))


def simhash64(text_col: str | Column = "text") -> Column:
    """Bit-voting simhash (long) over token hashes."""
    hashes = F.transform(tokens_col(text_col), lambda t: h60(t))
    return _simhash_col(hashes)


def rolling_fingerprint(text_col: str | Column = "text") -> Column:
    """Order-insensitive document fingerprint: md5 of the sorted distinct
    token set (robust to whitespace/punct reflow)."""
    return F.md5(
        F.concat_ws(" ", F.sort_array(F.array_distinct(tokens_col(text_col))))
    )


def dot(a: Column, b: Column) -> Column:
    """Dot product of two array<double> columns (sequential fold — result
    is partitioning-independent)."""
    return dot_cols(a, b)


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot_cols(a, a))


def cosine_similarity(a: Column, b: Column) -> Column:
    return _cosine(a, b)


def quality_ratios(text_col: str | Column = "text") -> Column:
    """struct(punct_ratio, digit_ratio, upper_ratio) — the cheap first-gate
    quality signals."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    ln = F.length(c).cast("double")

    def ratio(pattern: str) -> Column:
        return (F.length(c) - F.length(F.regexp_replace(c, pattern, ""))).cast(
            "double"
        ) / ln

    return F.struct(
        ratio("[^a-zA-Z0-9 ]").alias("punct_ratio"),
        ratio("[0-9]").alias("digit_ratio"),
        ratio("[A-Z]").alias("upper_ratio"),
    )


def lang_id_scores(text_col: str | Column = "text") -> Column:
    """struct(pred_lang, evidence) — stopword-voting language ID."""
    from denali_spark.operators.text_analysis import _LANG_ORDER, _STOPWORDS

    t = F.array_distinct(tokens_col(text_col))
    scores = {
        lang: F.size(
            F.array_intersect(t, F.array(*[F.lit(w) for w in _STOPWORDS[lang]]))
        )
        for lang in _LANG_ORDER
    }
    pred = F.lit(_LANG_ORDER[-1])
    # Fold from lowest priority upward so earlier languages win ties.
    for lang in reversed(_LANG_ORDER[:-1]):
        later = [scores[x] for x in _LANG_ORDER[_LANG_ORDER.index(lang) + 1:]]
        cond = reduce(lambda x, y: x & y, [scores[lang] >= s for s in later])
        pred = F.when(cond, F.lit(lang)).otherwise(pred)
    evidence = reduce(lambda x, y: x + y, scores.values()).cast("long")
    return F.struct(pred.alias("pred_lang"), evidence.alias("evidence"))

"""Engine function library: the reusable Column-level vocabulary.

The reference delegates all scalar computation to client engines (SURVEY
§2.G "Scalar funcs" row — `pyspark.sql.functions` is the rebuild's scalar
surface). This package is the engine's own additions on top: the text /
hashing / vector primitives the LLM-pipeline operators are built from,
exposed two ways:

- as Column-returning helpers for DataFrame code (everything here is
  composed from built-in JVM functions — no Python in the row path); and
- via `register_sql_functions(spark)`, which registers the same semantics
  under `denali_*` names for `spark.sql(...)` callers.

Import site for operator internals (tokens/shingles/minhash/simhash live
in denali_spark.operators.dedup, cosine in operators.similarity) — one
definition each, re-exported here as the public API.
"""

from denali_spark.functions.columns import (
    cosine_similarity,
    dot,
    l2_norm,
    lang_id_scores,
    minhash_signature,
    ngrams,
    quality_ratios,
    rolling_fingerprint,
    shingles,
    simhash64,
    token_count,
    tokens,
)
from denali_spark.functions.registration import register_sql_functions

__all__ = [
    "cosine_similarity",
    "dot",
    "l2_norm",
    "lang_id_scores",
    "minhash_signature",
    "ngrams",
    "quality_ratios",
    "rolling_fingerprint",
    "shingles",
    "simhash64",
    "token_count",
    "tokens",
    "register_sql_functions",
]

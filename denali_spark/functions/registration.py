"""SQL-surface registration: the engine vocabulary for `spark.sql` callers.

Registers the functions/columns.py primitives as Spark SQL UDFs — SQL-body
functions (CREATE TEMPORARY FUNCTION ... RETURN <expr>), NOT Python UDFs:
the body is inlined into the query plan by Catalyst, optimized and
code-generated like any built-in, so the SQL surface pays zero
serialization tax. `denali_` prefix avoids collisions with built-ins.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from denali_spark.operators.dedup import MINHASH_PARAMS, P

_TOKENS = "filter(split(lower(t), '[^a-z0-9]+'), x -> x != '')"
_SHINGLES = (
    "array_distinct(transform(sequence(1, size(tk) - 2), "
    "i -> concat_ws(' ', element_at(tk, i), element_at(tk, i + 1), "
    "element_at(tk, i + 2))))"
)
_H60 = "CAST(conv(substring(md5(s), 1, 15), 16, 10) AS BIGINT)"
_DOT = "aggregate(zip_with(a, b, (x, y) -> x * y), 0.0D, (acc, v) -> acc + v)"


def _minhash_body() -> str:
    sigs = ", ".join(
        f"array_min(transform(hs, x -> ({a}L * (x % {P}L) + {b}L) % {P}L))"
        for a, b in MINHASH_PARAMS
    )
    return f"array({sigs})"


_DEFINITIONS: dict[str, str] = {
    "denali_tokens": f"(t STRING) RETURNS ARRAY<STRING> RETURN {_TOKENS}",
    "denali_token_count": (
        f"(t STRING) RETURNS BIGINT RETURN CAST(size({_TOKENS}) AS BIGINT)"
    ),
    "denali_shingles": (
        f"(tk ARRAY<STRING>) RETURNS ARRAY<STRING> RETURN {_SHINGLES}"
    ),
    "denali_h60": f"(s STRING) RETURNS BIGINT RETURN {_H60}",
    "denali_dot": f"(a ARRAY<DOUBLE>, b ARRAY<DOUBLE>) RETURNS DOUBLE RETURN {_DOT}",
    "denali_norm": (
        "(a ARRAY<DOUBLE>) RETURNS DOUBLE RETURN "
        "sqrt(aggregate(transform(a, x -> x * x), 0.0D, (acc, v) -> acc + v))"
    ),
    "denali_cosine": (
        "(a ARRAY<DOUBLE>, b ARRAY<DOUBLE>) RETURNS DOUBLE RETURN "
        "denali_dot(a, b) / (denali_norm(a) * denali_norm(b))"
    ),
    "denali_minhash": (
        "(hs ARRAY<BIGINT>) RETURNS ARRAY<BIGINT> RETURN " + _minhash_body()
    ),
    # Whole text→signature pipeline in one function. Needed because Catalyst
    # cannot resolve a SQL UDF applied to a lambda variable (e.g.
    # `transform(xs, s -> denali_h60(s))` fails analysis), so the
    # tokenize→shingle→hash→minhash composition must inline its lambdas.
    "denali_minhash_text": (
        "(t STRING) RETURNS ARRAY<BIGINT> RETURN "
        + _minhash_body().replace(
            "hs",
            "transform(" + _SHINGLES.replace("tk", f"({_TOKENS})")
            + ", s -> CAST(conv(substring(md5(s), 1, 15), 16, 10) AS BIGINT))",
        )
    ),
    "denali_fingerprint": (
        "(t STRING) RETURNS STRING RETURN "
        f"md5(concat_ws(' ', sort_array(array_distinct({_TOKENS}))))"
    ),
}


def register_sql_functions(spark: SparkSession) -> list[str]:
    """Install the engine's SQL vocabulary into the session; returns the
    registered names. Idempotent (CREATE OR REPLACE)."""
    for name, definition in _DEFINITIONS.items():
        spark.sql(f"CREATE OR REPLACE TEMPORARY FUNCTION {name}{definition}")
    return list(_DEFINITIONS)

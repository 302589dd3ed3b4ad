"""Central query/operator registry.

Each entry pairs a PySpark implementation with a DuckDB-runnable ANSI-SQL
oracle (column names aligned — the driver's compare sorts columns by name and
hashes values, so every computed column is aliased identically on both sides).

Float determinism policy: aggregates over monetary/quantity doubles are cast
to DECIMAL *before* summation on BOTH sides (exact integer arithmetic,
order-insensitive), and the final value is cast back to DOUBLE. This makes
Spark-vs-DuckDB value hashes bit-identical regardless of partitioning or
aggregation order — which also means results are stable between a local[32]
run and a 1000-executor run.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass
class Query:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None = None
    tags: tuple[str, ...] = field(default_factory=tuple)
    doc: str = ""


REGISTRY: dict[str, Query] = {}


def query(name: str, oracle: str | None = None, tags: tuple[str, ...] = ()):
    """Decorator registering an operator implementation."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = Query(name=name, fn=fn, oracle=oracle, tags=tags, doc=fn.__doc__ or "")
        return fn

    return deco


# The driver's per-round correctness sweep may cap how many queries it
# reaches (round 1 recorded only the first 50 of 88), so iteration order is
# a coverage decision: queries changed in the current round lead, then the
# LLM-pipeline operators (functions/timeseries/dedup/similarity/text/
# multimodal — the set round 1's artifact never reached), then the
# long-verified relational battery.
DRIVER_PRIORITY: list[str] = [
    # new this round — highest scrutiny
    "dedup_connected_components",
    "text_chunk_fixed",
    "sample_stratified",
    "text_pii_redact",
    "text_pack_sequences",
    "mm_ppm_decode",
    "text_prepare_corpus",
    # changed this round
    "agg_approx_sketches",
    "sim_lsh_bucket_topk",
    "dedup_embedding_pairs",
    "sim_topk_bruteforce",
    "sim_ivf_topk",
    # not reached by the round-1 driver artifact
    "dedup_exact_stats",
    "dedup_exact_keep_first",
    "dedup_minhash_signatures",
    "dedup_minhash_lsh_pairs",
    "dedup_simhash",
    "dedup_simhash_pairs",
    "dedup_ngram_jaccard_pairs",
    "sim_norms_stats",
    "text_token_stats",
    "text_quality_score",
    "text_langid",
    "text_fingerprint",
    "text_top_bigrams",
    "mm_binary_metadata",
    "mm_image_decode",
    "mm_frame_sample",
    "mm_featurize",
    "ts_hourly_rollup",
    "ts_daily_active_users",
    "ts_gap_fill_hours",
    "ts_sessionize",
    "ts_asof_join",
    "ts_range_join_pairs",
    "ts_funnel",
    "ts_transitions",
    "fn_string_kitchen",
    "fn_string_regex",
    "fn_datetime_kitchen",
    "fn_math_kitchen",
    "fn_conditional",
    "fn_json_extract",
    "fn_array_ops",
    "fn_hash",
    "setop_intersect_all",
]


def _ordered_names() -> list[str]:
    head = [n for n in DRIVER_PRIORITY if n in REGISTRY]
    seen = set(head)
    return head + [n for n in REGISTRY if n not in seen]


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: REGISTRY[name].fn for name in _ordered_names()}


def all_oracles() -> dict[str, str]:
    return {
        name: REGISTRY[name].oracle
        for name in _ordered_names()
        if REGISTRY[name].oracle is not None
    }

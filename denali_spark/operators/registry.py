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
# reaches (historically the first 50 of the registry, now 133 queries), so
# iteration order is a coverage decision, rotated each round so no query's
# newest driver-green evidence goes stale. Round-7 order (computed from
# CORRECTNESS_r0{1,2,3,4,6}.json latest-evidence rows): (1) the 36 queries
# whose newest driver attestation is round 3, (2) any queries NEW this
# round, (3) the 47 round-4-attested, (4) the 50 round-6-attested last.
DRIVER_PRIORITY: list[str] = [
    # round-7 rotation: newest driver evidence is round 3 (four rounds
    # stale; the driver sweep caps at 50, so these 36 MUST be reached) —
    # refresh first
    "text_chunk_fixed",
    "sample_stratified",
    "text_pii_redact",
    "text_pack_sequences",
    "mm_ppm_decode",
    "text_prepare_corpus",
    "agg_approx_sketches",
    "dedup_embedding_pairs",
    "sim_topk_bruteforce",
    "sim_ivf_topk",
    "dedup_exact_stats",
    "dedup_exact_keep_first",
    "dedup_minhash_signatures",
    "dedup_simhash",
    "dedup_simhash_pairs",
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
    "fn_string_kitchen",
    "fn_string_regex",
    "fn_datetime_kitchen",
    "fn_math_kitchen",
    "fn_conditional",
    "fn_array_ops",
    "fn_hash",
    "setop_intersect_all",
    "q3_shipping_priority",
    "q4_order_priority",
    "q5_local_supplier_volume",
    # NEW round-7 queries (no driver evidence yet) — after the 36 stale,
    # inside the 50-query sweep window
    "graph_triangle_parts",
    "ts_spike_hours",
    "agg_weighted_median",
    "sim_pq_topk",
    "text_chunk_cdc",
    "mm_image_phash_pairs",
    "agg_mode_order_priority",
    # newest driver evidence is round 4
    "ts_hourly_rollup",
    "ts_daily_active_users",
    "ts_gap_fill_hours",
    "ts_sessionize",
    "ts_asof_join",
    "ts_range_join_pairs",
    "ts_funnel",
    "ts_transitions",
    "fn_json_extract",
    "win_lag_lead_events",
    "win_moving_avg",
    "win_ntile_quartiles",
    "win_distribution",
    "sim_lsh_bucket_topk",
    "q2_min_cost_supplier",
    "q6_forecast_revenue",
    "q7_volume_shipping",
    "q8_market_share",
    "q9_product_type_profit",
    "q10_returned_items",
    "q11_important_parts",
    "q12_priority_shipping",
    "q13_customer_distribution",
    "q14_promo_revenue",
    "q15_top_supplier",
    "q16_supplier_counts",
    "q17_small_quantity_revenue",
    "q18_large_volume_customer",
    "q19_discounted_revenue",
    "q20_excess_suppliers",
    "q21_suppliers_kept_waiting",
    "q22_global_sales_opportunity",
    "join_left_outer_order_counts",
    "join_right_outer_part_sales",
    "join_full_outer_nation_profiles",
    "join_semi_anti_chain",
    "join_cross_region_pairs",
    "join_self_colineitems",
    "agg_count_distinct",
    "agg_rollup_nation_segment",
    "agg_cube_flag_status",
    "agg_grouping_sets",
    "agg_pivot_segment_balance",
    "agg_stats_moments",
    "agg_histogram_buckets",
    "agg_exact_median",
    "win_rank_parts_by_price",
    # re-attested in round 6 — freshest, go last
    "graph_pagerank_parts",
    "graph_frequent_pairs",
    "ts_changepoint_cusum",
    "sim_sq_topk",
    "graph_basket_lift",
    "ts_interarrival_stats",
    "text_tfidf_topterms",
    "ts_autocorr_lags",
    "text_novelty_scores",
    "setop_union_all_counts",
    "setop_union_distinct",
    "setop_intersect",
    "setop_except",
    "setop_except_all",
    "win_first_last",
    "win_running_total",
    "win_topn_per_group",
    "dedup_embedding_lsh_pairs",
    "sem_dedup_pairs",
    "text_decontaminate",
    "text_repetition_stats",
    "ts_ohlc_bars",
    "ts_anomaly_zscore",
    "dedup_containment_pairs",
    "ts_retention_cohorts",
    "ts_downsample_lttb",
    "mm_audio_window_rms",
    "text_dedup_keep_best",
    "fn_bitwise",
    "ts_asof_join_forward",
    "ts_ema_current",
    "win_streaks",
    "ts_ema_rows",
    "agg_hll_mergeable_rollup",
    "agg_audience_overlap",
    "text_vocab_growth",
    "ts_dow_hour_heatmap",
    "sample_mixture",
    "text_dup_passages",
    "ts_interpolate_linear",
    "ts_seasonal_decompose",
    "mm_video_scene_cut",
    "agg_exact_percentiles",
    "text_bpe_pretokenize",
    "agg_gini_user_activity",
    "dedup_minhash_lsh_pairs",
    "dedup_incremental_shard",
    "dedup_ngram_jaccard_pairs",
    "dedup_connected_components",
    "q1_pricing_summary",
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

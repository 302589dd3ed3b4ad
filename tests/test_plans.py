"""Plan-quality tests: correctness tests prove the rows are right; these
prove the PLANS are right — pushdown reaches the scan, dimension joins
broadcast, hot paths stay JVM-side. A regression here is invisible at test
scale and fatal at 100 TB, so plan shape is tested like behavior."""

from __future__ import annotations

import pytest

from denali_spark.operators.registry import REGISTRY
from denali_spark.plans import (
    assert_broadcasts,
    assert_jvm_only,
    assert_scan_efficient,
    audit,
)
from tests.conftest import SF_SMOKE


def _df(spark, name):
    return REGISTRY[name].fn(spark, SF_SMOKE)


def test_q6_filter_pushdown_and_column_pruning(spark):
    """q6 is a pure scan-agg: every predicate must reach the parquet reader
    and the scan must read exactly the 4 referenced lineitem columns."""
    a = assert_scan_efficient(
        _df(spark, "q6_forecast_revenue"),
        max_read_columns=4,
        require_pushed_filter="l_shipdate",
    )
    assert any("l_discount" in p for p in a["pushed_filters"])
    assert a["exchanges"] == 0  # single global agg, no grouping shuffle


def test_q1_scan_narrow_and_pushed(spark):
    assert_scan_efficient(
        _df(spark, "q1_pricing_summary"),
        max_read_columns=7,
        require_pushed_filter="l_shipdate",
    )


def test_q3_dimension_joins_broadcast(spark):
    """customer and orders are small relative to lineitem: both joins must
    broadcast, leaving at most the aggregation exchange."""
    a = assert_broadcasts(_df(spark, "q3_shipping_priority"), at_least=2)
    assert a["sortmerge_joins"] == 0
    assert a["exchanges"] <= 2


def test_q5_six_way_join_all_dims_broadcast(spark):
    a = assert_broadcasts(_df(spark, "q5_local_supplier_volume"), at_least=5)
    assert a["sortmerge_joins"] == 0


def test_q9_star_join_broadcasts(spark):
    assert_broadcasts(_df(spark, "q9_product_type_profit"), at_least=4)


def test_relational_queries_stay_jvm_side(spark):
    """No row-at-a-time Python UDF may appear in any relational/TPC-H-style
    query plan — built-in functions only (Arrow-batched pandas UDFs are the
    sanctioned escape hatch for the LLM-pipeline operators)."""
    for name, q in REGISTRY.items():
        if any(t in q.tags for t in ("relational", "join", "aggregate", "window")):
            assert_jvm_only(q.fn(spark, SF_SMOKE))


def test_audit_counts_codegen(spark):
    """Whole-stage codegen spans exist in the AQE-final plan (execute=True —
    pre-execution an AdaptiveSparkPlan exposes no codegen ids)."""
    a = audit(_df(spark, "q1_pricing_summary"), execute=True)
    assert a["codegen_stages"] >= 1
    assert a["python_row_udfs"] == 0


@pytest.mark.parametrize(
    "name", ["q1_pricing_summary", "q3_shipping_priority", "q6_forecast_revenue"]
)
def test_headline_plans_have_pushed_filters(spark, name):
    a = audit(_df(spark, name))
    assert a["pushed_filters"], f"{name} pushed no filters to the scan"


# --- full-registry sweep ----------------------------------------------------
#
# Every registered query's plan is audited for the two failure classes that
# are invisible at test scale and fatal at 100 TB: row-at-a-time Python
# eval, and non-equi join shapes (cartesian / broadcast-nested-loop)
# touching anything but a labeled tiny input.

# Queries whose non-equi join is deliberate AND bounded; each entry names
# the bound that keeps it linear-ish at scale.
NON_EQUI_WHITELIST = {
    # region x region, 5x5 rows, labeled cross join demo
    "join_cross_region_pairs",
    # distinct-event-types x distinct-event-types pair frame (a handful of
    # rows regardless of data volume) so ZERO-overlap pairs appear; the
    # user-level work is the separate audiences equi-join
    "agg_audience_overlap",
    # exact all-pairs baseline — O(n²) BY DESIGN, fenced by
    # QUADRATIC_MAX_ROWS + allow_quadratic (see test_similarity_recall)
    "dedup_embedding_pairs",
    # probe side is 5 broadcast rows: nested-loop over the corpus is one
    # linear pass (cost n x |probes|), the textbook brute-force baseline
    "sim_topk_bruteforce",
    # 8 broadcast probe rows x corpus (the same linear-fence shape);
    # signature fetches are hash equi-joins on vec id
    "sim_srp_hamming_calibration",
    # two sampled brute-force passes (full-dim truth + prefix-dim rank),
    # each the 5-probe broadcast nested loop above; the overlap join is
    # an equi-join over 5 x k rank rows
    "sim_matryoshka_prefix_recall",
    # one sampled brute-force truth pass (the same 5-probe nested loop) +
    # 5-row probe x broadcast centroid scoring; the four list scans are
    # cid equi-joins over the materialized inverted lists
    "sim_ivf_nprobe_curve",
    # composes sim_topk_bruteforce (the 5-probe nested loop above) as its
    # sampled ground-truth side; the audit's own joins are equi-joins
    "sim_ann_recall_audit",
    # the 1-row corpus-total-token aggregate broadcast into the projection
    "text_unigram_logprob",
    # two bounded nested loops: the 1-row global-scale aggregate broadcast
    # into the element-wise quantization map, and the ~1% probe batch
    # broadcast into the scoring pass (cost n x |probes|, one linear scan)
    "sim_sq_topk",
    # bounded broadcast expansions only: the 1-row gmax aggregate, the
    # 8-row subspace frame (n x 8 subvector explode), and the tiny
    # codebook/LUT (codes = n/241 rows) — every BNLJ side is O(1) or
    # O(n/stride); the heavy joins (encode argmin, ADC scoring) are
    # hash equi-joins on (m) / (m, cid)
    "sim_pq_topk",
    # same bounded broadcast expansions as sim_pq_topk (1-row gmax, 8-row
    # subspace frame, tiny codebook/LUT) plus the 5-row probe set x
    # broadcast centroids for cell selection; candidate generation is the
    # cell equi-join against the materialized inverted lists and ADC is a
    # hash equi-join on (query_id, m, code)
    "sim_ivfpq_topk",
    # the 1-row basket-count aggregate broadcast into the ppm projection
    "graph_basket_lift",
    # the 1-row merged-sketch estimate broadcast onto the 1-row exact
    # all-days distinct count (ALL-row assembly; both sides aggregates)
    "agg_hll_mergeable_rollup",
    # the 1-row corpus doc count broadcast into the tf-idf projection
    "text_tfidf_topterms",
    # two 1-row aggregates broadcast into scan-local bucketing: the
    # reference date and the nine exact quartile thresholds
    "agg_rfm_segments",
    # the 1-row length-quartile threshold aggregate broadcast into the
    # scan-local bucketing (same shape)
    "text_dup_rate_by_length",
    # IVF probe selection: the 5-row probe set x broadcast centroids
    # (corpus assignment itself is the materialized inverted-lists index,
    # built once at ingest — the n·k quantization pass never runs at query
    # time)
    "sim_ivf_topk",
    # deliberate 1-row x 1-row join of two global aggregates (split to
    # avoid Catalyst's Expand rewrite — see the query docstring)
    "agg_approx_sketches",
    # verdict row x two broadcast 1-row count aggregates (members/bits):
    # both nested-loop sides are single rows by construction
    "agg_bloom_fpr_audit",
    # profile grid = per-source totals x the ~40-row stopword vocabulary
    # (both bounded by construction), plus the 1-row corpus total
    "text_stopword_profile_distance",
    # q22: scalar-subquery average compared per row — Catalyst plans the
    # 1-row aggregate as a broadcast nested loop (1 x n, linear)
    "q22_global_sales_opportunity",
    # anti-join on a multi-column OR predicate (spec shape): broadcast
    # nested loop against the 1-row/“tiny relation” side only
    "q16_supplier_counts",
    # hour-grid x distinct-event-types frame: both sides are bounded
    # post-aggregate relations (hours by time span, types by cardinality),
    # independent of row volume; the observed values join back by equi-key
    "ts_interpolate_linear",
    "ts_seasonal_decompose",
    # event self-pairing within a bounded 1h window on the SAME user:
    # equi-join on user_id carries the heavy lifting; the range predicate
    # rides on top (see ts_range_join_pairs docstring)
    "ts_range_join_pairs",
}


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_sweep_no_python_row_udfs_and_no_unfenced_cartesians(spark, name):
    # r11 verdict item 3 / task 8: a df.persist() held by a lazily-returned
    # DataFrame registers an UNRELEASABLE CacheManager entry (registration
    # is eager at the .persist() call, so building the plan is enough to
    # detect it). Lazy localCheckpoint blocks are RDD-level and GC-
    # reclaimed — they never touch the CacheManager, so no allowlist is
    # needed: the registry-wide invariant is simply "no query registers a
    # cached relation".
    cm = spark._jsparkSession.sharedState().cacheManager()
    cm_was_empty = cm.isEmpty()
    df = REGISTRY[name].fn(spark, SF_SMOKE)
    if cm_was_empty:
        assert cm.isEmpty(), (
            f"{name}: registered a CacheManager entry (query-held persist "
            "— unreleasable by the caller, accretes across library use)"
        )
    a = audit(df)
    assert a["python_row_udfs"] == 0, (
        f"{name}: plan contains BatchEvalPython (row-at-a-time Python)"
    )
    if name not in NON_EQUI_WHITELIST:
        assert a["cartesian_products"] == 0, (
            f"{name}: unfenced CartesianProduct in plan"
        )
        assert a["nested_loop_joins"] == 0, (
            f"{name}: unfenced BroadcastNestedLoopJoin in plan"
        )
    # A single-partition exchange fed by a raw scan (no aggregate bounding
    # the row count) collapses the table onto ONE task — e.g. a global
    # Window.orderBy with no partitionBy. No whitelist: use the two-pass
    # global-rank idiom (operators/windows.py:_with_global_rn) instead.
    assert a["single_partition_over_scan"] == 0, (
        f"{name}: Exchange SinglePartition over unbounded (scan-fed) input"
    )

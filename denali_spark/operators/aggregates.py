"""Aggregation coverage beyond plain GROUP BY: distinct aggregates, rollup /
cube / grouping sets, pivot, exact statistical moments, histogram bucketing,
exact median, and approximate sketches.

Grouping-null policy: rollup/cube subtotal rows carry NULL group keys; we
COALESCE them to the sentinel 'ALL' on both sides so the hash compare never
depends on engine-specific null ordering.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from denali_spark.engine.tables import load_table, register_views
from denali_spark.operators._util import dec, dsum
from denali_spark.operators.registry import query


@query(
    "agg_count_distinct",
    oracle="""
    SELECT o_orderstatus,
           COUNT(*) AS n_orders,
           COUNT(DISTINCT o_custkey) AS n_customers,
           COUNT(DISTINCT o_orderpriority) AS n_priorities
    FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
    tags=("aggregate", "distinct"),
)
def agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.countDistinct("o_custkey").alias("n_customers"),
            F.countDistinct("o_orderpriority").alias("n_priorities"),
        )
        .orderBy("o_orderstatus")
    )


@query(
    "agg_rollup_nation_segment",
    oracle="""
    SELECT COALESCE(n_name, 'ALL') AS nation,
           COALESCE(c_mktsegment, 'ALL') AS segment,
           COUNT(*) AS n_cust,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS total_bal
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY ROLLUP(n_name, c_mktsegment)
    """,
    tags=("aggregate", "rollup"),
)
def agg_rollup_nation_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP(nation, segment): detail + per-nation subtotal + grand total."""
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    return (
        customer.join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .rollup("n_name", "c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_cust"),
            F.sum(dec("c_acctbal")).cast("double").alias("total_bal"),
        )
        .select(
            F.coalesce("n_name", F.lit("ALL")).alias("nation"),
            F.coalesce("c_mktsegment", F.lit("ALL")).alias("segment"),
            "n_cust",
            "total_bal",
        )
    )


@query(
    "agg_cube_flag_status",
    oracle="""
    SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
           COALESCE(l_linestatus, 'ALL') AS linestatus,
           COUNT(*) AS n_lines,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
    FROM lineitem
    GROUP BY CUBE(l_returnflag, l_linestatus)
    """,
    tags=("aggregate", "cube"),
)
def agg_cube_flag_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (returnflag, linestatus): all 2^2 grouping combinations."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("n_lines"), dsum("l_quantity", "sum_qty"))
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "n_lines",
            "sum_qty",
        )
    )


@query(
    "agg_grouping_sets",
    oracle="""
    SELECT COALESCE(n_name, 'ALL') AS nation,
           COALESCE(c_mktsegment, 'ALL') AS segment,
           COUNT(*) AS n_cust
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY GROUPING SETS ((n_name), (c_mktsegment), ())
    """,
    tags=("aggregate", "grouping-sets"),
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (per-nation, per-segment, grand total) via
    Spark SQL — still fully Catalyst-planned (Expand + partial agg)."""
    register_views(spark, sf_dir, "customer", "nation")
    return spark.sql(
        """
        SELECT COALESCE(n_name, 'ALL') AS nation,
               COALESCE(c_mktsegment, 'ALL') AS segment,
               COUNT(*) AS n_cust
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        GROUP BY GROUPING SETS ((n_name), (c_mktsegment), ())
        """
    )


_SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]


@query(
    "agg_pivot_segment_balance",
    oracle="""
    SELECT n_name,
           CAST(COALESCE(SUM(CASE WHEN c_mktsegment = 'AUTOMOBILE' THEN CAST(c_acctbal AS DECIMAL(12,2)) END), 0) AS DOUBLE) AS AUTOMOBILE,
           CAST(COALESCE(SUM(CASE WHEN c_mktsegment = 'BUILDING'   THEN CAST(c_acctbal AS DECIMAL(12,2)) END), 0) AS DOUBLE) AS BUILDING,
           CAST(COALESCE(SUM(CASE WHEN c_mktsegment = 'FURNITURE'  THEN CAST(c_acctbal AS DECIMAL(12,2)) END), 0) AS DOUBLE) AS FURNITURE,
           CAST(COALESCE(SUM(CASE WHEN c_mktsegment = 'HOUSEHOLD'  THEN CAST(c_acctbal AS DECIMAL(12,2)) END), 0) AS DOUBLE) AS HOUSEHOLD,
           CAST(COALESCE(SUM(CASE WHEN c_mktsegment = 'MACHINERY'  THEN CAST(c_acctbal AS DECIMAL(12,2)) END), 0) AS DOUBLE) AS MACHINERY
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name
    """,
    tags=("aggregate", "pivot"),
)
def agg_pivot_segment_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot market segments into columns (explicit value list keeps the
    plan one-pass and the output schema static)."""
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    pivoted = (
        customer.join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .pivot("c_mktsegment", _SEGMENTS)
        .agg(F.sum(dec("c_acctbal")))
    )
    cols = [F.col("n_name")] + [
        F.coalesce(F.col(s).cast("double"), F.lit(0.0)).alias(s) for s in _SEGMENTS
    ]
    return pivoted.select(*cols)


@query(
    "agg_stats_moments",
    oracle="""
    SELECT n_name,
           COUNT(c_acctbal) AS n,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) / COUNT(c_acctbal) AS mean_bal,
           (CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2)) * CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE)
             - CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) * CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) / COUNT(c_acctbal))
             / (COUNT(c_acctbal) - 1) AS var_bal,
           SQRT((CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2)) * CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE)
             - CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) * CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) / COUNT(c_acctbal))
             / (COUNT(c_acctbal) - 1)) AS std_bal
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name HAVING COUNT(c_acctbal) > 1
    """,
    tags=("aggregate", "statistics"),
)
def agg_stats_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample variance/stddev from exact decimal sums (sum, sum-of-squares):
    deterministic across engines AND across cluster partitionings, unlike
    streaming float moment aggregates."""
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    b = dec("c_acctbal")
    grouped = (
        customer.join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count("c_acctbal").alias("n"),
            F.sum(b).cast("double").alias("s1"),
            F.sum(b * b).cast("double").alias("s2"),
        )
        .filter(F.col("n") > 1)
    )
    var = (F.col("s2") - F.col("s1") * F.col("s1") / F.col("n")) / (F.col("n") - 1)
    return grouped.select(
        "n_name",
        "n",
        (F.col("s1") / F.col("n")).alias("mean_bal"),
        var.alias("var_bal"),
        F.sqrt(var).alias("std_bal"),
    )


@query(
    "agg_histogram_buckets",
    oracle="""
    SELECT CAST(FLOOR(o_totalprice / 50000) AS BIGINT) AS bucket,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total
    FROM orders GROUP BY 1 ORDER BY bucket
    """,
    tags=("aggregate", "histogram"),
)
def agg_histogram_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram via arithmetic bucketing (no shuffle beyond the
    one aggregation; bucket count is data-independent)."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy(
            F.floor(F.col("o_totalprice") / 50000).cast("long").alias("bucket")
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum("o_totalprice", "total"),
        )
        .orderBy("bucket")
    )


@query(
    "agg_exact_median",
    oracle="""
    WITH ranked AS (
      SELECT c_nationkey, c_acctbal,
             ROW_NUMBER() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey) AS rn,
             COUNT(*) OVER (PARTITION BY c_nationkey) AS cnt
      FROM customer
    )
    SELECT c_nationkey,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS median_bal
    FROM ranked
    WHERE rn IN ((cnt + 1) // 2, (cnt + 2) // 2)
    GROUP BY c_nationkey
    """,
    tags=("aggregate", "median"),
)
def agg_exact_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-group median via row_number selection of the middle one or
    two elements (identical integer-index formula on both engines, so no
    interpolation-formula float divergence)."""
    from pyspark.sql import Window

    customer = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy("c_acctbal", "c_custkey")
    ranked = customer.select(
        "c_nationkey",
        "c_acctbal",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("c_nationkey")).alias("cnt"),
    )
    mid = ranked.filter(
        (F.col("rn") == ((F.col("cnt") + 1) / 2).cast("long"))
        | (F.col("rn") == ((F.col("cnt") + 2) / 2).cast("long"))
    )
    return mid.groupBy("c_nationkey").agg(
        (F.sum(dec("c_acctbal")).cast("double") / F.count(F.lit(1))).alias("median_bal")
    )


@query(
    "agg_approx_sketches",
    oracle="""
    SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) AS exact_orders,
           TRUE AS hll_within_5pct,
           CAST(quantile_disc(l_extendedprice, 0.5) AS DOUBLE) AS exact_median_price,
           TRUE AS median_within_1pct,
           CAST(quantile_disc(l_extendedprice, 0.99) AS DOUBLE) AS exact_p99_price,
           TRUE AS p99_within_1pct
    FROM lineitem
    """,
    tags=("aggregate", "approximate"),
)
def agg_approx_sketches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate sketches (HLL distinct count + quantile sketch): the
    constant-memory scale path when exact answers aren't required.

    Sketch outputs are engine-specific, so the value-level check is
    ε-bounded: the query emits the exact values (deterministic, both
    engines agree bit-for-bit — percentile_disc picks actual data values,
    no float interpolation) plus booleans asserting the sketch landed
    within tolerance (HLL at rsd=1% target against a ±5% gate = 5σ;
    GK quantiles ±1%). The oracle
    emits the same exact values with TRUE flags: a sketch drifting out of
    tolerance breaks the hash match and fails the driver's gate. The
    production path uses the sketch columns alone; the exact twins exist
    for the gate."""
    li = load_table(spark, sf_dir, "lineitem")
    price_d = F.col("l_extendedprice").cast("double")
    exact_med = F.expr(
        "percentile_disc(0.5) WITHIN GROUP (ORDER BY l_extendedprice)"
    ).cast("double")
    exact_p99 = F.expr(
        "percentile_disc(0.99) WITHIN GROUP (ORDER BY l_extendedprice)"
    ).cast("double")
    # Two separate 1-row aggregates joined at the end: mixing the DISTINCT
    # aggregate with typed-imperative percentiles in one agg triggers
    # Catalyst's Expand rewrite (every input row replicated per aggregate
    # group — measured 3x slower); split, each side keeps partial
    # aggregation and the join is 1 row x 1 row.
    counts = li.agg(
        F.count_distinct("l_orderkey").alias("exact_orders"),
        F.approx_count_distinct("l_orderkey", 0.01).alias("hll_orders"),
    )
    quants = li.agg(
        exact_med.alias("exact_median_price"),
        F.percentile_approx(price_d, 0.5).alias("approx_median_price"),
        exact_p99.alias("exact_p99_price"),
        F.percentile_approx(price_d, 0.99).alias("approx_p99_price"),
    )
    return (
        counts.crossJoin(quants)
        .select(
            "exact_orders",
            (
                F.abs(F.col("hll_orders") - F.col("exact_orders"))
                <= 0.05 * F.col("exact_orders")
            ).alias("hll_within_5pct"),
            "exact_median_price",
            (
                F.abs(F.col("approx_median_price") - F.col("exact_median_price"))
                <= 0.01 * F.col("exact_median_price")
            ).alias("median_within_1pct"),
            "exact_p99_price",
            (
                F.abs(F.col("approx_p99_price") - F.col("exact_p99_price"))
                <= 0.01 * F.col("exact_p99_price")
            ).alias("p99_within_1pct"),
        )
    )


@query(
    "agg_hll_mergeable_rollup",
    oracle="""
    SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
           TRUE AS within_5pct
    FROM events GROUP BY 1
    UNION ALL
    SELECT 'ALL' AS day,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
           TRUE AS within_5pct
    FROM events
    """,
    tags=("aggregate", "sketch", "mergeable"),
)
def agg_hll_mergeable_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-sketch rollup — the 100 TB distinct-counting pattern: build
    ONE compact HLL sketch of user_id per day at ingest (Datasketches HLL
    via Spark's hll_sketch_agg), then answer ANY date-range distinct-users
    question by UNIONING sketches (hll_union_agg) instead of rescanning raw
    events. Emits per-day rows plus the merged all-days row (day = 'ALL',
    a sentinel no date_format can produce).

    Sketch binaries are implementation-defined, so the hash-checkable
    output is the EXACT per-group distinct count plus `within_5pct` — the
    sketch estimate's 5%-accuracy verdict (HLL lgK=12 ~ 1.6% standard
    error, so a healthy sketch always passes). The oracle computes the
    exact counts and a literal TRUE: any estimate drifting past 5% flips
    the boolean and fails the value hash, making sketch health itself
    driver-checked. At 100 TB only the sketch path survives (exact
    distinct is the small-SF audit); the merged row still unions the
    daily sketches, never rescans."""
    events = load_table(spark, sf_dir, "events")
    daily = events.groupBy(
        F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day")
    ).agg(
        F.hll_sketch_agg("user_id").alias("sketch"),
        F.countDistinct("user_id").cast("long").alias("n_users"),
    )
    per_day = daily.select(
        "day", "n_users",
        F.hll_sketch_estimate("sketch").alias("approx_users"),
    )
    merged_est = daily.agg(F.hll_union_agg("sketch").alias("m")).select(
        F.hll_sketch_estimate("m").alias("approx_users")
    )
    all_exact = events.agg(
        F.countDistinct("user_id").cast("long").alias("n_users")
    )
    all_row = all_exact.crossJoin(F.broadcast(merged_est)).select(
        F.lit("ALL").alias("day"), "n_users", "approx_users"
    )
    return per_day.unionByName(all_row).select(
        "day", "n_users",
        (
            F.abs(F.col("approx_users") - F.col("n_users"))
            <= 0.05 * F.col("n_users")
        ).alias("within_5pct"),
    )


@query(
    "agg_audience_overlap",
    oracle="""
    WITH pairs AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b
      FROM (SELECT DISTINCT event_type FROM events) a
      JOIN (SELECT DISTINCT event_type FROM events) b
        ON a.event_type < b.event_type
    ),
    audiences AS (SELECT DISTINCT event_type, user_id FROM events)
    SELECT p.type_a, p.type_b,
           CAST(COUNT(DISTINCT CASE WHEN x.user_id = y.user_id THEN x.user_id END) AS BIGINT) AS n_both,
           CAST(COUNT(DISTINCT x.user_id) AS BIGINT) AS n_a,
           CAST(COUNT(DISTINCT y.user_id) AS BIGINT) AS n_b
    FROM pairs p
    JOIN audiences x ON x.event_type = p.type_a
    JOIN audiences y ON y.event_type = p.type_b
    GROUP BY 1, 2
    """,
    tags=("aggregate", "overlap"),
)
def agg_audience_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience overlap matrix: for every pair of event types, how many
    distinct users did both, and each side's audience size — the
    set-intersection cardinality question behind cohort targeting (the
    exact baseline that a theta-sketch pipeline approximates at scale).

    Scale shape: dedup to (event_type, user_id) FIRST (one shuffle, bounded
    by users x types), then self-join the deduped audiences on user_id —
    an equi-join whose input is the compact audience relation, never raw
    events; the type-pair expansion happens on join OUTPUT rows."""
    events = load_table(spark, sf_dir, "events")
    audiences = events.select("event_type", "user_id").distinct()
    a = audiences.select(F.col("event_type").alias("type_a"), "user_id")
    b = audiences.select(F.col("event_type").alias("type_b"), "user_id")
    both = (
        a.join(b, "user_id")
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.countDistinct("user_id").alias("n_both"))
    )
    # All type pairs appear in the output, including ZERO-overlap ones (the
    # oracle's cross-of-audiences produces them; an inner join here would
    # silently drop them on disjoint data). The types relation is tiny, so
    # the pair frame is a broadcast cross.
    types = audiences.select("event_type").distinct()
    pairs = (
        types.select(F.col("event_type").alias("type_a"))
        .crossJoin(types.select(F.col("event_type").alias("type_b")))
        .filter(F.col("type_a") < F.col("type_b"))
    )
    sizes = audiences.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n")
    )
    return (
        pairs.join(both, ["type_a", "type_b"], "left")
        .join(sizes.withColumnRenamed("event_type", "type_a"), "type_a")
        .withColumnRenamed("n", "n_a")
        .join(sizes.withColumnRenamed("event_type", "type_b"), "type_b")
        .withColumnRenamed("n", "n_b")
        .select(
            "type_a",
            "type_b",
            F.coalesce("n_both", F.lit(0)).alias("n_both"),
            "n_a",
            "n_b",
        )
    )


@query(
    "agg_exact_percentiles",
    oracle="""
    WITH c AS (
      SELECT event_type,
             CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents,
             COUNT(*) AS n
      FROM events WHERE value IS NOT NULL GROUP BY 1, 2
    ),
    t AS (
      SELECT event_type, cents,
             SUM(n) OVER (PARTITION BY event_type ORDER BY cents) AS cum,
             SUM(n) OVER (PARTITION BY event_type) AS tot
      FROM c
    )
    SELECT event_type,
           CAST(MIN(CASE WHEN cum >= (tot + 1) // 2 THEN cents END) AS DOUBLE) / 100.0 AS p50,
           CAST(MIN(CASE WHEN cum >= (9 * tot + 9) // 10 THEN cents END) AS DOUBLE) / 100.0 AS p90,
           CAST(MIN(CASE WHEN cum >= (99 * tot + 99) // 100 THEN cents END) AS DOUBLE) / 100.0 AS p99,
           CAST(MAX(tot) AS BIGINT) AS n
    FROM t GROUP BY event_type
    """,
    tags=("aggregate", "percentile"),
)
def agg_exact_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT p50/p90/p99 per event type (discrete percentiles: the smallest
    value whose cumulative count reaches ceil(p*n) — all-integer rank
    arithmetic, no interpolation, no approx sketch).

    100 TB shape: the only pass over raw events is a partially-aggregable
    (event_type, cents) COUNT — the relation the windows then run over is
    bounded by VALUE CARDINALITY per group, not row count, so the per-type
    cumulative sort costs |distinct values|, never a full-type sort of the
    events themselves (the trap a naive row_number formulation falls into)."""
    # percentiles are over OBSERVED values: NULLs are excluded up front
    # (otherwise the two engines' opposite NULL orderings skew the ranks)
    events = load_table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    c = events.groupBy(
        "event_type", (dec("value") * 100).cast("long").alias("cents")
    ).agg(F.count(F.lit(1)).alias("n"))
    wc = Window.partitionBy("event_type").orderBy("cents")
    wt = Window.partitionBy("event_type")
    t = c.select(
        "event_type", "cents",
        F.sum("n").over(wc).alias("cum"),
        F.sum("n").over(wt).alias("tot"),
    )

    def pick(rank_expr: str, alias: str):
        return (
            F.min(
                F.when(F.col("cum") >= F.expr(rank_expr), F.col("cents"))
            ).cast("double") / 100.0
        ).alias(alias)

    return t.groupBy("event_type").agg(
        pick("(tot + 1) div 2", "p50"),
        pick("(9 * tot + 9) div 10", "p90"),
        pick("(99 * tot + 99) div 100", "p99"),
        F.max("tot").cast("long").alias("n"),
    )


@query(
    "agg_gini_user_activity",
    oracle="""
    WITH c AS (
      SELECT event_type, user_id, COUNT(*) AS n
      FROM events GROUP BY 1, 2
    ),
    r AS (
      SELECT event_type, n,
             ROW_NUMBER() OVER (PARTITION BY event_type
                                ORDER BY n, user_id) AS rk
      FROM c
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(SUM(n) AS BIGINT) AS n_events,
           CAST(2 * SUM(rk * n) - (COUNT(*) + 1) * SUM(n) AS DOUBLE)
             / CAST(COUNT(*) * SUM(n) AS DOUBLE) AS gini
    FROM r GROUP BY event_type
    """,
    tags=("aggregate", "concentration"),
)
def agg_gini_user_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of per-user activity per event type — the
    concentration metric corpus audits use to spot a handful of users (or
    domains) dominating the data. Exactness: per-user counts, the rank
    weighting, and both Gini terms are all INTEGERS; the single division
    to double is the only float op (identical on both engines).

    100 TB shape: one partially-aggregable (type, user) count; the rank
    window and final aggregation run over that bounded post-agg relation,
    never raw events."""
    events = load_table(spark, sf_dir, "events")
    c = events.groupBy("event_type", "user_id").agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("event_type").orderBy("n", "user_id")
    r = c.select("event_type", "n", F.row_number().over(w).alias("rk"))
    num = 2 * F.sum(F.col("rk") * F.col("n")) - (F.count(F.lit(1)) + 1) * F.sum("n")
    den = F.count(F.lit(1)) * F.sum("n")
    return r.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.sum("n").cast("long").alias("n_events"),
        (num.cast("double") / den.cast("double")).alias("gini"),
    )


@query(
    "agg_weighted_median",
    oracle="""
    WITH w AS (
      SELECT l_returnflag AS f,
             CAST(l_extendedprice AS DECIMAL(12,2)) AS p,
             CAST(l_quantity AS BIGINT) AS q
      FROM lineitem
    ),
    g AS (SELECT f, p, SUM(q) AS q FROM w GROUP BY 1, 2),
    c AS (
      SELECT f, p,
             SUM(q) OVER (PARTITION BY f ORDER BY p) AS cum,
             SUM(q) OVER (PARTITION BY f) AS tot
      FROM g
    )
    SELECT f AS l_returnflag,
           CAST(MIN(p) AS DOUBLE) AS weighted_median_price
    FROM c WHERE 2 * cum >= tot
    GROUP BY 1
    """,
    tags=("aggregate", "weighted-median"),
)
def agg_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact quantity-weighted median price per return flag: the smallest
    price whose cumulative quantity weight reaches half the group total —
    the order-statistic SQL can't express with a built-in aggregate.
    Exactness: weights are integer quantities and prices pre-aggregate to
    one DECIMAL row per (flag, price), so the cumulative window runs over
    a deduplicated, totally ordered relation — no within-ties row order
    for the engines to disagree on. Scale shape: the value-grouping
    aggregation is partial-aggregable and collapses the window input to
    |distinct prices| rows per group; the RANGE-free cumulative then sorts
    only that bounded relation, never the raw fact table."""
    li = load_table(spark, sf_dir, "lineitem")
    g = (
        li.select(
            F.col("l_returnflag").alias("f"),
            dec("l_extendedprice").alias("p"),
            F.col("l_quantity").cast("long").alias("q"),
        )
        .groupBy("f", "p")
        .agg(F.sum("q").alias("q"))
    )
    wc = Window.partitionBy("f").orderBy("p")
    wt = Window.partitionBy("f")
    c = g.select(
        "f", "p",
        F.sum("q").over(wc).alias("cum"),
        F.sum("q").over(wt).alias("tot"),
    )
    return (
        c.filter(F.lit(2) * F.col("cum") >= F.col("tot"))
        .groupBy(F.col("f").alias("l_returnflag"))
        .agg(F.min("p").cast("double").alias("weighted_median_price"))
    )


@query(
    "agg_mode_order_priority",
    oracle="""
    WITH counts AS (
      SELECT o_orderstatus AS s, o_orderpriority AS p, COUNT(*) AS c
      FROM orders GROUP BY 1, 2
    )
    SELECT s AS o_orderstatus, p AS mode_priority, CAST(c AS BIGINT) AS n
    FROM (
      SELECT s, p, c,
             row_number() OVER (PARTITION BY s ORDER BY c DESC, p) AS rn
      FROM counts
    ) WHERE rn = 1
    """,
    tags=("aggregate", "mode"),
)
def agg_mode_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact mode (most frequent order priority) per order status with a
    deterministic tie-break (count desc, then value asc) — Spark's
    `mode()` aggregate breaks ties arbitrarily, so this uses the
    count-then-rank shape both engines agree on bit-exactly. Scale shape:
    one partial-aggregable groupBy collapses the fact table to
    |statuses|x|priorities| rows; the window ranks only that bounded
    relation."""
    orders = load_table(spark, sf_dir, "orders")
    counts = orders.groupBy(
        F.col("o_orderstatus").alias("s"), F.col("o_orderpriority").alias("p")
    ).agg(F.count(F.lit(1)).alias("c"))
    w = Window.partitionBy("s").orderBy(F.desc("c"), "p")
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            F.col("s").alias("o_orderstatus"),
            F.col("p").alias("mode_priority"),
            F.col("c").cast("long").alias("n"),
        )
    )


@query(
    "agg_rfm_segments",
    oracle="""
    WITH cust AS (
      SELECT o_custkey,
             MAX(CAST(o_orderdate AS DATE)) AS last_day,
             CAST(COUNT(*) AS BIGINT) AS frequency,
             CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)) AS BIGINT)
               AS monetary_cents
      FROM orders GROUP BY o_custkey
    ),
    ref AS (SELECT MAX(CAST(o_orderdate AS DATE)) AS ref_day FROM orders),
    base AS (
      SELECT o_custkey,
             CAST(date_diff('day', last_day, ref_day) AS BIGINT) AS recency_days,
             frequency, monetary_cents
      FROM cust CROSS JOIN ref
    ),
    th AS (
      SELECT quantile_disc(recency_days, 0.25) AS r25, quantile_disc(recency_days, 0.5) AS r50,
             quantile_disc(recency_days, 0.75) AS r75,
             quantile_disc(frequency, 0.25) AS f25, quantile_disc(frequency, 0.5) AS f50,
             quantile_disc(frequency, 0.75) AS f75,
             quantile_disc(monetary_cents, 0.25) AS m25, quantile_disc(monetary_cents, 0.5) AS m50,
             quantile_disc(monetary_cents, 0.75) AS m75
      FROM base
    )
    SELECT o_custkey, recency_days, frequency, monetary_cents,
           'R' || CAST(1 + (recency_days > r25)::INT + (recency_days > r50)::INT
                       + (recency_days > r75)::INT AS VARCHAR)
           || 'F' || CAST(1 + (frequency > f25)::INT + (frequency > f50)::INT
                          + (frequency > f75)::INT AS VARCHAR)
           || 'M' || CAST(1 + (monetary_cents > m25)::INT + (monetary_cents > m50)::INT
                          + (monetary_cents > m75)::INT AS VARCHAR) AS rfm_segment
    FROM base CROSS JOIN th
    """,
    tags=("aggregate", "rfm", "segmentation"),
)
def agg_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation (recency / frequency / monetary
    quartiles — the retail-analytics workhorse): per customer, days since
    last order relative to the corpus's newest order, order count, and
    exact cents spend, bucketed R1-4/F1-4/M1-4 against EXACT quartile
    thresholds. Deliberately NOT ntile: a global ntile sorts every
    customer through one partition, while threshold bucketing computes
    three exact percentiles over the (already customer-level) relation
    and broadcasts NINE scalars into a scan-local comparison — the shape
    that survives a 100x customer count.

    Hash discipline: recency/frequency are integers, monetary is decimal
    cents, and percentile_disc/quantile_disc pick actual data values
    (the proven engine pair from agg_approx_sketches) — no interpolation,
    bit-stable."""
    orders = load_table(spark, sf_dir, "orders")
    cents = F.expr("CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)")
    cust = orders.groupBy("o_custkey").agg(
        F.max(F.to_date("o_orderdate")).alias("last_day"),
        F.count(F.lit(1)).cast("long").alias("frequency"),
        F.sum(cents).cast("long").alias("monetary_cents"),
    )
    ref = orders.agg(F.max(F.to_date("o_orderdate")).alias("ref_day"))
    base = cust.crossJoin(F.broadcast(ref)).select(
        "o_custkey",
        F.datediff("ref_day", "last_day").cast("long").alias("recency_days"),
        "frequency", "monetary_cents",
    )
    th = base.agg(*[
        F.expr(f"percentile_disc({q}) WITHIN GROUP (ORDER BY {m})").alias(
            f"{m[0]}{int(q * 100)}"
        )
        for m in ("recency_days", "frequency", "monetary_cents")
        for q in (0.25, 0.5, 0.75)
    ])

    def quart(m: str) -> Column:
        p = m[0]
        return (
            1
            + (F.col(m) > F.col(f"{p}25")).cast("int")
            + (F.col(m) > F.col(f"{p}50")).cast("int")
            + (F.col(m) > F.col(f"{p}75")).cast("int")
        ).cast("string")

    return base.crossJoin(F.broadcast(th)).select(
        "o_custkey", "recency_days", "frequency", "monetary_cents",
        F.concat(
            F.lit("R"), quart("recency_days"),
            F.lit("F"), quart("frequency"),
            F.lit("M"), quart("monetary_cents"),
        ).alias("rfm_segment"),
    )


# floor(log10(1 + 1/d) * 1e4) for d = 1..9 — Benford's law expectations,
# precomputed as integer basis points so neither engine evaluates log10.
BENFORD_E4 = [3010, 1760, 1249, 969, 791, 669, 579, 511, 457]
_BENFORD_CASE = " ".join(
    f"WHEN '{d}' THEN {BENFORD_E4[d - 1]}" for d in range(1, 10)
)


@query(
    "agg_benford_first_digit",
    oracle=f"""
    WITH d AS (
      SELECT substr(CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS VARCHAR), 1, 1)
               AS first_digit
      FROM orders WHERE o_totalprice >= 1
    )
    SELECT first_digit,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST((COUNT(*) * 10000) // SUM(COUNT(*)) OVER () AS BIGINT) AS share_e4,
           CAST(CASE first_digit {_BENFORD_CASE} END AS BIGINT) AS benford_e4,
           CAST((COUNT(*) * 10000) // SUM(COUNT(*)) OVER ()
                - CASE first_digit {_BENFORD_CASE} END AS BIGINT) AS deviation_e4
    FROM d GROUP BY first_digit
    """,
    tags=("aggregate", "quality", "benford"),
)
def agg_benford_first_digit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-digit screen over order totals: observed leading-digit
    shares against Benford's-law expectations — the classic anomaly/fraud/
    synthetic-data tell (organically-scaled amounts follow it; capped,
    generated, or tampered ones don't). Expectations are PRECOMPUTED
    integer basis points, the digit comes from the decimal's string form,
    and shares use integer division — no log10 or float share anywhere,
    hash bit-stable.

    Scale shape: one scan-local digit projection, one partial-aggregable
    9-key groupBy; the share window runs over the 9-row relation."""
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    digits = orders.filter(F.col("o_totalprice") >= 1).select(
        F.substring(
            F.col("o_totalprice").cast("decimal(12,2)").cast("string"), 1, 1
        ).alias("first_digit")
    )
    counts = digits.groupBy("first_digit").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders")
    )
    benford = F.lit(None).cast("long")
    for dd in range(9, 0, -1):
        benford = F.when(
            F.col("first_digit") == str(dd), F.lit(BENFORD_E4[dd - 1])
        ).otherwise(benford)
    return (
        counts.withColumn(
            "__tot", F.sum("n_orders").over(Window.partitionBy(F.lit(1)))
        )
        .select(
            "first_digit", "n_orders",
            F.expr("(n_orders * 10000) div __tot").alias("share_e4"),
            benford.cast("long").alias("benford_e4"),
            (
                F.expr("(n_orders * 10000) div __tot") - benford
            ).cast("long").alias("deviation_e4"),
        )
    )


@query(
    "agg_seasonal_index_months",
    oracle="""
    WITH m AS (
      SELECT EXTRACT(month FROM o_orderdate) AS month,
             CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)) AS BIGINT)
               AS cents,
             CAST(COUNT(*) AS BIGINT) AS n_orders
      FROM orders GROUP BY 1
    )
    SELECT CAST(month AS BIGINT) AS month, n_orders, cents,
           CAST((cents * 120000) // SUM(cents) OVER () AS BIGINT) AS seasonal_index_e4
    FROM m
    """,
    tags=("aggregate", "seasonality"),
)
def agg_seasonal_index_months(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly seasonal index of order revenue: each month's share of the
    year scaled so a flat calendar reads 10000 per month (x12 in the
    numerator) — the demand-planning number that says which months run
    hot before any forecast model is fit. Exact decimal cents and integer
    division; the share window runs over the 12-row month relation.

    Scale shape: one partial-aggregable month rollup over the scan; no
    other shuffle."""
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    cents = F.expr("CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)")
    m = orders.groupBy(
        F.month("o_orderdate").cast("long").alias("month")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum(cents).cast("long").alias("cents"),
    )
    return m.withColumn(
        "__tot", F.sum("cents").over(Window.partitionBy(F.lit(1)))
    ).select(
        "month", "n_orders", "cents",
        F.expr("(cents * 120000) div __tot").alias("seasonal_index_e4"),
    )


@query(
    "agg_regression_moments",
    oracle="""
    WITH m AS (
      SELECT l_returnflag,
             COUNT(*) AS n,
             CAST(SUM(CAST(l_quantity AS DECIMAL(12,2)) * 100) AS BIGINT) AS sum_q,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * 100) AS BIGINT) AS sum_p,
             CAST(SUM(CAST(CAST(CAST(l_quantity AS DECIMAL(12,2)) * 100 AS BIGINT)
                      * CAST(CAST(l_quantity AS DECIMAL(12,2)) * 100 AS BIGINT)
                      AS DECIMAL(38,0))) AS DOUBLE) AS sum_qq,
             CAST(SUM(CAST(CAST(CAST(l_quantity AS DECIMAL(12,2)) * 100 AS BIGINT)
                      * CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT)
                      AS DECIMAL(38,0))) AS DOUBLE) AS sum_qp
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, CAST(n AS BIGINT) AS n, sum_q, sum_p, sum_qq, sum_qp,
           CAST(n AS DOUBLE) * sum_qp - CAST(sum_q AS DOUBLE) * CAST(sum_p AS DOUBLE)
             AS slope_num,
           CAST(n AS DOUBLE) * sum_qq - CAST(sum_q AS DOUBLE) * CAST(sum_q AS DOUBLE)
             AS slope_den,
           (CAST(n AS DOUBLE) * sum_qp - CAST(sum_q AS DOUBLE) * CAST(sum_p AS DOUBLE))
             / (CAST(n AS DOUBLE) * sum_qq - CAST(sum_q AS DOUBLE) * CAST(sum_q AS DOUBLE))
             AS slope
    FROM m
    """,
    tags=("aggregate", "statistics", "regression"),
)
def agg_regression_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bivariate OLS moments per return flag: does extended price scale
    with quantity, and how steeply? Emits the moment sums (n, Σq, Σp,
    Σq², Σqp) plus the least-squares slope — moments are MERGEABLE (a
    1000-executor cluster's partial sums add; fitted coefficients
    don't), which is why a distributed engine ships moment relations
    and leaves the one-division fit to the edge.

    Exactness at scale: values quantize to integer cents via DECIMAL
    before any product; the linear sums stay BIGINT (overflow headroom
    ~1e14 rows), while the PRODUCT sums accumulate in DECIMAL(38,0) —
    a cents-squared term is ~1e10 per row, so int64 would overflow near
    1e9 rows, exactly the regime the engine targets. The decimal sums
    surface as DOUBLE, and slope_num/slope_den/slope are the same three
    IEEE ops on identical inputs on both engines — bit-stable hashes.

    Scale shape: one scan, one partial-aggregable groupBy on a 3-value
    key. Nothing else."""
    li = load_table(spark, sf_dir, "lineitem")
    q = (dec("l_quantity") * 100).cast("long")
    p = (dec("l_extendedprice") * 100).cast("long")
    m = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(q).cast("long").alias("sum_q"),
        F.sum(p).cast("long").alias("sum_p"),
        F.sum((q * q).cast("decimal(38,0)")).cast("double").alias("sum_qq"),
        F.sum((q * p).cast("decimal(38,0)")).cast("double").alias("sum_qp"),
    )
    nd = F.col("n").cast("double")
    qd = F.col("sum_q").cast("double")
    pd_ = F.col("sum_p").cast("double")
    num = nd * F.col("sum_qp") - qd * pd_
    den = nd * F.col("sum_qq") - qd * qd
    return m.select(
        "l_returnflag", "n", "sum_q", "sum_p", "sum_qq", "sum_qp",
        num.alias("slope_num"), den.alias("slope_den"),
        (num / den).alias("slope"),
    )


CMS_D = 4        # hash rows
CMS_W = 256      # buckets per row
CMS_TOP_K = 20   # probe keys: the top-k true-frequency parts


@query(
    "agg_count_min_sketch",
    oracle=f"""
    WITH h AS (
      SELECT l_partkey,
             CAST(i AS INT) AS i,
             CAST(('0x' || substr(md5(CAST(i AS VARCHAR) || ':' ||
                                  CAST(l_partkey AS VARCHAR)), 1, 15))::BIGINT
                  % {CMS_W} AS INT) AS bucket
      FROM lineitem CROSS JOIN (SELECT unnest(range(0, {CMS_D})) AS i)
    ),
    counters AS (
      SELECT i, bucket, CAST(COUNT(*) AS BIGINT) AS c FROM h GROUP BY 1, 2
    ),
    truth AS (
      SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS true_cnt
      FROM lineitem GROUP BY 1
    ),
    probes AS (
      SELECT l_partkey, true_cnt FROM (
        SELECT *, row_number() OVER (ORDER BY true_cnt DESC, l_partkey) AS rn
        FROM truth
      ) WHERE rn <= {CMS_TOP_K}
    ),
    est AS (
      SELECT p.l_partkey, p.true_cnt, MIN(c.c) AS cms_est
      FROM probes p
      CROSS JOIN (SELECT unnest(range(0, {CMS_D})) AS i) rs
      JOIN counters c
        ON c.i = rs.i
       AND c.bucket = CAST(('0x' || substr(md5(CAST(rs.i AS VARCHAR) || ':' ||
                            CAST(p.l_partkey AS VARCHAR)), 1, 15))::BIGINT
                           % {CMS_W} AS INT)
      GROUP BY 1, 2
    )
    SELECT l_partkey, true_cnt, CAST(cms_est AS BIGINT) AS cms_est,
           CAST(cms_est - true_cnt AS BIGINT) AS overestimate
    FROM est
    """,
    tags=("aggregate", "sketch", "frequency"),
)
def agg_count_min_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min Sketch calibration: build a {CMS_D}×{CMS_W} CMS over
    lineitem part frequencies, then audit its point estimates against
    exact counts for the top-{CMS_TOP_K} parts — est ≥ truth always (CMS
    never undercounts), and the overestimate column is the collision tax
    the ({CMS_D},{CMS_W}) geometry pays at this key cardinality. The CMS
    is THE mergeable frequency sketch a 100 TB engine ships where exact
    per-key counts don't fit: counters are plain integer sums
    (partial-aggregable — executor sketches merge by cell-wise addition),
    and the deterministic md5-derived row hashes make the whole structure
    bit-reproducible, so the DuckDB oracle checks the sketch itself, not
    just its contract.

    Scale shape: ONE scan exploded ×{CMS_D} into (row, bucket) cells —
    a fixed {CMS_D}·{CMS_W}-cell aggregate, the smallest shuffle possible
    — plus the exact top-k (partial-aggregable count + TakeOrdered) used
    only to pick audit probes; estimates join the probe set against the
    {CMS_D * CMS_W}-row counter table (broadcast-sized by construction)."""
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey")
    rows = F.array(*[F.lit(i) for i in range(CMS_D)])

    def bucket(i_col, key_col):
        h = F.conv(
            F.substring(
                F.md5(F.concat(i_col.cast("string"), F.lit(":"),
                               key_col.cast("string"))), 1, 15,
            ), 16, 10,
        ).cast("long")
        return F.pmod(h, F.lit(CMS_W)).cast("int")

    cells = li.select(
        F.explode(rows).alias("i"), F.col("l_partkey")
    ).select("i", bucket(F.col("i"), F.col("l_partkey")).alias("bucket"))
    counters = cells.groupBy("i", "bucket").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    truth = li.groupBy("l_partkey").agg(
        F.count(F.lit(1)).cast("long").alias("true_cnt")
    )
    probes = (
        truth.orderBy(F.desc("true_cnt"), F.asc("l_partkey"))
        .limit(CMS_TOP_K)
    )
    probe_cells = probes.select(
        "l_partkey", "true_cnt", F.explode(rows).alias("i")
    ).select(
        "l_partkey", "true_cnt", "i",
        bucket(F.col("i"), F.col("l_partkey")).alias("bucket"),
    )
    est = (
        probe_cells.join(F.broadcast(counters), ["i", "bucket"])
        .groupBy("l_partkey", "true_cnt")
        .agg(F.min("c").alias("cms_est"))
    )
    return est.select(
        "l_partkey", "true_cnt",
        F.col("cms_est").cast("long").alias("cms_est"),
        (F.col("cms_est") - F.col("true_cnt")).cast("long").alias("overestimate"),
    )


BLOOM_M = 4096   # filter bits
BLOOM_K = 3      # hash functions


@query(
    "agg_bloom_fpr_audit",
    oracle=f"""
    WITH keys AS (SELECT DISTINCT l_partkey FROM lineitem),
    members AS (SELECT l_partkey FROM keys WHERE l_partkey % 2 = 0),
    probes AS (SELECT l_partkey FROM keys WHERE l_partkey % 2 = 1),
    bits AS (
      SELECT DISTINCT
             CAST(('0x' || substr(md5(CAST(rs.i AS VARCHAR) || ':' ||
                                  CAST(m.l_partkey AS VARCHAR)), 1, 15))::BIGINT
                  % {BLOOM_M} AS INT) AS pos
      FROM members m
      CROSS JOIN (SELECT unnest(range(0, {BLOOM_K})) AS i) rs
    ),
    probe_hits AS (
      SELECT p.l_partkey, COUNT(b.pos) AS n_hit
      FROM probes p
      CROSS JOIN (SELECT unnest(range(0, {BLOOM_K})) AS i) rs
      LEFT JOIN bits b
        ON b.pos = CAST(('0x' || substr(md5(CAST(rs.i AS VARCHAR) || ':' ||
                         CAST(p.l_partkey AS VARCHAR)), 1, 15))::BIGINT
                        % {BLOOM_M} AS INT)
      GROUP BY 1
    )
    SELECT CAST((SELECT COUNT(*) FROM members) AS BIGINT) AS n_members,
           CAST((SELECT COUNT(*) FROM bits) AS BIGINT) AS n_bits_set,
           CAST(COUNT(*) AS BIGINT) AS n_probes,
           CAST(SUM(CASE WHEN n_hit = {BLOOM_K} THEN 1 ELSE 0 END) AS BIGINT)
             AS n_false_positives
    FROM probe_hits
    """,
    tags=("aggregate", "sketch", "bloom"),
)
def agg_bloom_fpr_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter false-positive audit: build a {BLOOM_M}-bit/{BLOOM_K}-hash
    filter over the even part keys, probe it with the odd ones (guaranteed
    non-members), and report the measured false-positive count next to the
    filter's fill (n_bits_set / {BLOOM_M} drives the theoretical
    (fill)^{BLOOM_K} rate). The sketch-health companion of
    agg_count_min_sketch and agg_hll_mergeable_rollup: the engine's
    ANALYZE path writes per-file bloom blobs for point-lookup pruning,
    and this is the query that tells you what a given (m, k) geometry
    actually buys at your key cardinality. Deterministic md5 hashing
    makes the filter bit-reproducible — the oracle checks the structure,
    not a probabilistic contract.

    Scale shape: the bit set is a DISTINCT over members × {BLOOM_K}
    positions (bounded by {BLOOM_M} rows — broadcast-sized by
    construction); probes explode ×{BLOOM_K} and equi-join the bit set;
    the verdict is one partial-aggregable rollup."""
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey").distinct()
    rows = F.array(*[F.lit(i) for i in range(BLOOM_K)])

    def pos(i_col, key_col):
        h = F.conv(
            F.substring(
                F.md5(F.concat(i_col.cast("string"), F.lit(":"),
                               key_col.cast("string"))), 1, 15,
            ), 16, 10,
        ).cast("long")
        return F.pmod(h, F.lit(BLOOM_M)).cast("int")

    members = li.filter(F.col("l_partkey") % 2 == 0)
    probes = li.filter(F.col("l_partkey") % 2 == 1)
    bits = (
        members.select(F.explode(rows).alias("i"), "l_partkey")
        .select(pos(F.col("i"), F.col("l_partkey")).alias("pos"))
        .distinct()
    )
    probe_hits = (
        probes.select("l_partkey", F.explode(rows).alias("i"))
        .select("l_partkey", pos(F.col("i"), F.col("l_partkey")).alias("pos"))
        .join(F.broadcast(bits.withColumn("hit", F.lit(1))), "pos", "left")
        .groupBy("l_partkey")
        .agg(F.count("hit").alias("n_hit"))
    )
    # 1-row aggregates broadcast into the verdict row — no driver-side
    # counts, one job end to end
    mstats = members.agg(F.count(F.lit(1)).cast("long").alias("n_members"))
    bstats = bits.agg(F.count(F.lit(1)).cast("long").alias("n_bits_set"))
    verdict = probe_hits.agg(
        F.count(F.lit(1)).cast("long").alias("n_probes"),
        F.sum(F.when(F.col("n_hit") == BLOOM_K, 1).otherwise(0))
        .cast("long").alias("n_false_positives"),
    )
    return (
        verdict.crossJoin(F.broadcast(mstats))
        .crossJoin(F.broadcast(bstats))
        .select("n_members", "n_bits_set", "n_probes", "n_false_positives")
    )


@query(
    "agg_skyline_parts",
    oracle="""
    WITH m AS (
      SELECT l_partkey,
             CAST(SUM(CAST(l_quantity AS DECIMAL(12,2)) * 100) AS BIGINT)
               AS qty_c,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * 100) AS BIGINT)
               AS rev_c
      FROM lineitem GROUP BY 1
    ),
    w AS (
      SELECT l_partkey, qty_c, rev_c,
             MAX(rev_c) OVER (
               ORDER BY qty_c
               RANGE BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING
             ) AS best_rev_higher_qty,
             MAX(rev_c) OVER (PARTITION BY qty_c) AS best_rev_same_qty
      FROM m
    )
    SELECT l_partkey, qty_c, rev_c
    FROM w
    WHERE (best_rev_higher_qty IS NULL OR best_rev_higher_qty < rev_c)
      AND rev_c = best_rev_same_qty
    """,
    tags=("aggregate", "skyline", "window"),
)
def agg_skyline_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D skyline (Pareto frontier) of parts over (total quantity, total
    revenue): a part is on the frontier iff no other part dominates it —
    strictly more revenue at the same-or-higher quantity, or any revenue
    advantage at strictly higher quantity. The classic skyline operator
    done WITHOUT the naive O(n²) dominance self-join: sort by quantity
    and take a running maximum of revenue over the strictly-higher-
    quantity suffix (one RANGE window) plus a per-quantity-group max for
    ties — O(n log n), exactly the plan shape that survives 10⁹ parts.
    Exact integer cents on both axes, so frontier membership is
    bit-identical across engines.

    Scale shape: one partial-aggregable groupBy to the (part, qty, rev)
    moment relation, then two windows over it keyed on the quantity axis;
    no self-join, no pair blowup."""
    li = load_table(spark, sf_dir, "lineitem")
    m = li.groupBy("l_partkey").agg(
        (F.sum(dec("l_quantity")) * 100).cast("long").alias("qty_c"),
        (F.sum(dec("l_extendedprice")) * 100).cast("long").alias("rev_c"),
    )
    # Distributed suffix-max (the _with_global_rn two-pass shape): range-
    # partition on the quantity axis (equal keys co-locate, so higher
    # partitions hold STRICTLY greater quantities), take the per-partition
    # suffix max locally, and close the cross-partition gap with a
    # broadcast suffix over the <=32-row per-partition maxima — the
    # oracle's single global window never materializes; no task ever sees
    # more than its range slice.
    data = m.repartitionByRange(32, "qty_c").withColumn(
        "_pid", F.spark_partition_id()
    )
    w_local = (
        Window.partitionBy("_pid").orderBy("qty_c")
        .rangeBetween(1, Window.unboundedFollowing)
    )
    w_same = Window.partitionBy("qty_c")
    loc = data.select(
        "l_partkey", "qty_c", "rev_c", "_pid",
        F.max("rev_c").over(w_local).alias("loc_best_higher"),
        F.max("rev_c").over(w_same).alias("best_rev_same_qty"),
    )
    pmax = data.groupBy("_pid").agg(F.max("rev_c").alias("pmax"))
    w_p = Window.orderBy("_pid").rowsBetween(1, Window.unboundedFollowing)
    suffix = pmax.select(
        "_pid", F.max("pmax").over(w_p).alias("higher_part_best")
    )
    lo = F.lit(-(1 << 62)).cast("long")
    flagged = loc.join(F.broadcast(suffix), "_pid").select(
        "l_partkey", "qty_c", "rev_c", "best_rev_same_qty",
        F.greatest(
            F.coalesce(F.col("loc_best_higher"), lo),
            F.coalesce(F.col("higher_part_best"), lo),
        ).alias("best_rev_higher_qty"),
    )
    return flagged.filter(
        (F.col("best_rev_higher_qty") < F.col("rev_c"))
        & (F.col("rev_c") == F.col("best_rev_same_qty"))
    ).select("l_partkey", "qty_c", "rev_c")


@query(
    "agg_conversion_wilson",
    oracle="""
    WITH d AS (
      SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
             CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
             CAST(COUNT(DISTINCT CASE WHEN event_type = 'purchase'
                                      THEN user_id END) AS BIGINT)
               AS n_converted
      FROM events GROUP BY 1
    )
    SELECT day, n_users, n_converted,
           CAST(n_converted AS DOUBLE) / n_users AS conv_hat,
           (CAST(n_converted AS DOUBLE) / n_users + 3.8416 / (2.0 * n_users))
             / (1.0 + 3.8416 / n_users)
           - 1.96 * sqrt(((CAST(n_converted AS DOUBLE) / n_users)
                          * (1.0 - CAST(n_converted AS DOUBLE) / n_users)
                          + 3.8416 / (4.0 * n_users)) / n_users)
             / (1.0 + 3.8416 / n_users) AS conv_lo,
           (CAST(n_converted AS DOUBLE) / n_users + 3.8416 / (2.0 * n_users))
             / (1.0 + 3.8416 / n_users)
           + 1.96 * sqrt(((CAST(n_converted AS DOUBLE) / n_users)
                          * (1.0 - CAST(n_converted AS DOUBLE) / n_users)
                          + 3.8416 / (4.0 * n_users)) / n_users)
             / (1.0 + 3.8416 / n_users) AS conv_hi
    FROM d
    """,
    tags=("aggregate", "uncertainty", "conversion"),
)
def agg_conversion_wilson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily user-conversion rate with a Wilson 95% score interval — the
    uncertainty-quantified metric a dashboard should publish instead of a
    bare ratio (a 3/7 day and a 3000/7000 day have the same point
    estimate and wildly different intervals; Wilson stays inside [0,1]
    and behaves at small n where the normal approximation fails).

    Exactness: the aggregation is two exact distinct-counts per day; the
    interval is pure scalar double math written operand-for-operand
    identically on both engines (same literals, same operation order —
    IEEE arithmetic is deterministic given the same expression tree), so
    the float columns hash-match. Scale shape: one day-keyed
    distinct-aggregate — partial-aggregable on (day, user) then day."""
    events = load_table(spark, sf_dir, "events")
    d = events.groupBy(
        F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day")
    ).agg(
        F.countDistinct("user_id").alias("n_users"),
        F.countDistinct(
            F.when(F.col("event_type") == "purchase", F.col("user_id"))
        ).alias("n_converted"),
    )
    n = F.col("n_users").cast("double")
    p = F.col("n_converted").cast("double") / n
    z, z2 = F.lit(1.96), F.lit(3.8416)
    denom = F.lit(1.0) + z2 / n
    center = (p + z2 / (F.lit(2.0) * n)) / denom
    half = z * F.sqrt(
        (p * (F.lit(1.0) - p) + z2 / (F.lit(4.0) * n)) / n
    ) / denom
    return d.select(
        "day", "n_users", "n_converted",
        p.alias("conv_hat"),
        (center - half).alias("conv_lo"),
        (center + half).alias("conv_hi"),
    )

"""Window-function coverage: ranking, running totals, lag/lead, moving
aggregates, ntile, distribution functions, first/last.

Determinism policy: every ORDER BY inside a window carries a unique
tiebreaker column, so frame contents are identical across engines and across
cluster partitionings. Running decimal sums stay exact at any prefix.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from denali_spark.engine.tables import load_table
from denali_spark.operators._util import dec
from denali_spark.operators.registry import query


@query(
    "win_rank_parts_by_price",
    oracle="""
    SELECT p_partkey, p_brand,
           CAST(RANK() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey) AS BIGINT) AS price_rank,
           CAST(DENSE_RANK() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey) AS BIGINT) AS price_dense_rank
    FROM part
    """,
    tags=("window", "rank"),
)
def win_rank_parts_by_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand").orderBy(F.desc("p_retailprice"), "p_partkey")
    return part.select(
        "p_partkey",
        "p_brand",
        F.rank().over(w).cast("long").alias("price_rank"),
        F.dense_rank().over(w).cast("long").alias("price_dense_rank"),
    )


@query(
    "win_topn_per_group",
    oracle="""
    SELECT n_name, c_custkey, c_acctbal, CAST(rn AS BIGINT) AS rn FROM (
      SELECT n_name, c_custkey, c_acctbal,
             ROW_NUMBER() OVER (PARTITION BY n_name ORDER BY c_acctbal DESC, c_custkey) AS rn
      FROM customer JOIN nation ON c_nationkey = n_nationkey
    ) t WHERE rn <= 3
    """,
    tags=("window", "topk-per-group"),
)
def win_topn_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 customers per nation — the scalable per-group top-k idiom
    (window + filter; AQE handles group skew, no global sort)."""
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    w = Window.partitionBy("n_name").orderBy(F.desc("c_acctbal"), "c_custkey")
    return (
        customer.join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .select(
            "n_name",
            "c_custkey",
            "c_acctbal",
            F.row_number().over(w).cast("long").alias("rn"),
        )
        .filter(F.col("rn") <= 3)
    )


@query(
    "win_running_total",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2)))
                OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total
    FROM orders
    """,
    tags=("window", "running-sum"),
)
def win_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer running spend. Exact decimal prefix sums — every prefix
    is deterministic, not just the final total."""
    orders = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.sum(dec("o_totalprice")).over(w).cast("double").alias("running_total"),
    )


@query(
    "win_lag_lead_events",
    oracle="""
    SELECT event_id, user_id, value,
           value - LAG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS delta_prev,
           LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_type
    FROM events
    """,
    tags=("window", "lag-lead"),
)
def win_lag_lead_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return events.select(
        "event_id",
        "user_id",
        "value",
        (F.col("value") - F.lag("value").over(w)).alias("delta_prev"),
        F.lead("event_type").over(w).alias("next_type"),
    )


@query(
    "win_moving_avg",
    oracle="""
    SELECT event_id, user_id,
           CAST(SUM(CAST(value AS DECIMAL(12,2)))
                OVER (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE)
           / COUNT(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS mov_avg
    FROM events
    """,
    tags=("window", "moving-average"),
)
def win_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-row moving average as exact-sum / window-count."""
    events = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-2, Window.currentRow)
    )
    return events.select(
        "event_id",
        "user_id",
        (F.sum(dec("value")).over(w).cast("double") / F.count("value").over(w)).alias(
            "mov_avg"
        ),
    )


@query(
    "win_moving_median",
    oracle="""
    WITH c AS (
      SELECT event_id, event_type, ts,
             CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents
      FROM events
    ),
    w AS (
      SELECT event_id, event_type,
             list_sort(list(cents) OVER (
               PARTITION BY event_type ORDER BY ts, event_id
               ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)) AS arr
      FROM c
    )
    SELECT event_id, event_type,
           CASE WHEN len(arr) % 2 = 1
                THEN 2 * arr[(len(arr) + 1) // 2]
                ELSE arr[len(arr) // 2] + arr[len(arr) // 2 + 1]
           END AS med_x2_cents
    FROM w
    """,
    tags=("window", "moving-median", "robust"),
)
def win_moving_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 7-row EXACT moving median per event type — the robust
    smoother (median filters shrug off the spikes that wreck moving
    averages). Emits med_x2_cents = 2x the median in integer cents: for
    an even window the median is the middle-pair mean, so doubling keeps
    the value in exact integer arithmetic on both engines — no float
    halving, bit-stable hash (same trick as the decimal-cents sums).

    Scale shape: one window shuffle keyed on event_type; the trailing
    frame keeps each collect bounded at 7 elements, so state per row is
    O(window), not O(partition). The in-frame sort runs JVM-side
    (sort_array) inside the projection."""
    events = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(-6, Window.currentRow)
    )
    cents = (dec("value") * 100).cast("long")
    return (
        events.select("event_id", "event_type", "ts", cents.alias("cents"))
        .select(
            "event_id",
            "event_type",
            F.sort_array(F.collect_list("cents").over(w)).alias("arr"),
        )
        .select(
            "event_id",
            "event_type",
            F.expr(
                "CASE WHEN size(arr) % 2 = 1"
                " THEN 2 * element_at(arr, CAST((size(arr) + 1) div 2 AS INT))"
                " ELSE element_at(arr, CAST(size(arr) div 2 AS INT))"
                "      + element_at(arr, CAST(size(arr) div 2 + 1 AS INT)) END"
            ).alias("med_x2_cents"),
        )
    )


def _with_global_rn(df: DataFrame, sort_cols: list[str], n_parts: int = 32) -> DataFrame:
    """Global row number WITHOUT a single-partition sort — the distributed
    two-pass idiom for rank/ntile/percent_rank/cume_dist over a whole table:

    1. range-partition on the sort key and row_number within each partition
       (parallel — each partition sorts its own slice);
    2. aggregate per-partition counts (tiny: one row per partition), turn
       them into cumulative offsets with a window over that bounded
       relation, and broadcast-join the offsets back.

    `_rn` = local row number + partition offset is the exact global row
    number because range partitioning makes partition order == sort order.
    The local row number comes from `monotonically_increasing_id` over the
    range-partitioned, partition-sorted data (the id is partition-ordinal
    in row order), NOT from a `Window.partitionBy(_pid)` — the window
    variant forces a second full-data hash exchange; this shape shuffles
    the table exactly ONCE (the range partitioning). The only
    single-partition work is the offsets window over <= n_parts aggregated
    rows; the data itself never collapses to one task — the shape a naive
    `Window.orderBy(...)` (Exchange SinglePartition over the full table)
    gets fatally wrong at 100 TB. Also emits `_n`, the total row count, on
    every row (needed by the distribution functions).

    Sort keys must be unique (callers append a key-column tiebreaker), so
    ties never straddle a range boundary ambiguously and rank == _rn."""
    data = (
        df.repartitionByRange(n_parts, *sort_cols)
        .sortWithinPartitions(*sort_cols)
        .withColumn("_pid", F.spark_partition_id())
        .withColumn("_mid", F.monotonically_increasing_id())
    )
    counts = data.groupBy("_pid").agg(
        F.count(F.lit(1)).alias("_cnt"), F.min("_mid").alias("_mid0")
    )
    w_off = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    w_all = Window.orderBy("_pid").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    offsets = counts.select(
        "_pid",
        "_mid0",
        F.coalesce(F.sum("_cnt").over(w_off), F.lit(0)).alias("_off"),
        F.sum("_cnt").over(w_all).alias("_n"),
    )
    return data.join(F.broadcast(offsets), "_pid").withColumn(
        "_rn", F.col("_off") + (F.col("_mid") - F.col("_mid0")) + 1
    )


@query(
    "win_ntile_quartiles",
    oracle="""
    SELECT c_custkey,
           CAST(NTILE(4) OVER (ORDER BY c_acctbal, c_custkey) AS BIGINT) AS quartile
    FROM customer
    """,
    tags=("window", "ntile"),
)
def win_ntile_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NTILE(4) over the whole table, computed from the two-pass global row
    number (`_with_global_rn`) instead of a single-partition window. NTILE
    semantics reproduced exactly: with n = q*4 + r, the first r buckets get
    q+1 rows, the rest get q."""
    customer = load_table(spark, sf_dir, "customer")
    ranked = _with_global_rn(customer, ["c_acctbal", "c_custkey"])
    rn, n = F.col("_rn"), F.col("_n")
    q = F.floor(n / 4).cast("long")
    r = (n % 4).cast("long")
    cut = r * (q + 1)  # rows in the q+1-sized buckets
    quartile = (
        F.when(rn <= cut, F.ceil(rn / (q + 1)))
        .otherwise(r + F.ceil((rn - cut) / F.greatest(q, F.lit(1))))
        .cast("long")
    )
    return ranked.select("c_custkey", quartile.alias("quartile"))


@query(
    "win_distribution",
    oracle="""
    SELECT s_suppkey,
           PERCENT_RANK() OVER (ORDER BY s_acctbal, s_suppkey) AS pct_rank,
           CUME_DIST() OVER (ORDER BY s_acctbal, s_suppkey) AS cume
    FROM supplier
    """,
    tags=("window", "distribution"),
)
def win_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percent_rank/cume_dist over the whole table via the two-pass global
    row number. The ORDER BY carries a unique tiebreaker, so rank == row
    number and the SQL definitions reduce to (rn-1)/(n-1) and rn/n — the
    identical double divisions the oracle's window functions perform."""
    supplier = load_table(spark, sf_dir, "supplier")
    ranked = _with_global_rn(supplier, ["s_acctbal", "s_suppkey"])
    rn, n = F.col("_rn"), F.col("_n")
    pct_rank = F.when(n > 1, (rn - 1) / (n - 1)).otherwise(F.lit(0.0))
    return ranked.select(
        "s_suppkey",
        pct_rank.alias("pct_rank"),
        (rn / n).alias("cume"),
    )


@query(
    "win_first_last",
    oracle="""
    SELECT DISTINCT c_nationkey,
           FIRST_VALUE(c_name) OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey
                                     ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS richest,
           LAST_VALUE(c_name) OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS poorest
    FROM customer
    """,
    tags=("window", "first-last"),
)
def win_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Richest/poorest customer name per nation via full-partition frames."""
    customer = load_table(spark, sf_dir, "customer")
    w = (
        Window.partitionBy("c_nationkey")
        .orderBy(F.desc("c_acctbal"), "c_custkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return customer.select(
        "c_nationkey",
        F.first("c_name").over(w).alias("richest"),
        F.last("c_name").over(w).alias("poorest"),
    ).distinct()


@query(
    "win_streaks",
    oracle="""
    WITH flagged AS (
      SELECT user_id, event_id, ts,
             (event_type = 'click') AS is_click,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
             ROW_NUMBER() OVER (PARTITION BY user_id, (event_type = 'click')
                                ORDER BY ts, event_id) AS rn_typed
      FROM events
    ),
    islands AS (
      SELECT user_id, COUNT(*) AS streak_len,
             min({'rn': rn, 'eid': event_id}) AS first_row
      FROM flagged WHERE is_click
      GROUP BY user_id, rn - rn_typed
    ),
    best AS (
      SELECT user_id, streak_len,
             CAST(first_row.eid AS BIGINT) AS first_event_id,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY streak_len DESC, first_row.rn) AS pick
      FROM islands
    )
    SELECT user_id, CAST(streak_len AS BIGINT) AS longest_click_streak,
           first_event_id
    FROM best WHERE pick = 1
    """,
    tags=("windows", "gaps-and-islands"),
)
def win_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: each user's LONGEST consecutive run of click
    events (with the run's first event id; earliest run wins ties). The
    classic rn - rn_per_group difference labels each island with a constant
    key, so runs of ANY length resolve with two window passes + a groupBy —
    no self-joins, no iteration.

    Scale shape: both row_numbers share the user_id partition ordering, so
    one shuffle feeds both; the island groupBy is keyed by (user, island) —
    high cardinality, map-side combinable."""
    events = load_table(spark, sf_dir, "events")
    is_click = (F.col("event_type") == "click").alias("is_click")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_typed = Window.partitionBy("user_id", "is_click").orderBy("ts", "event_id")
    flagged = events.select(
        "user_id", "event_id", "ts", is_click
    ).select(
        "*",
        F.row_number().over(w).alias("rn"),
        F.row_number().over(w_typed).alias("rn_typed"),
    )
    # The run's FIRST row is the min by rn (not min event_id — ids need not
    # be time-ordered); struct-min carries its event_id along and its rn is
    # the earliest-run tie-breaker.
    islands = (
        flagged.filter("is_click")
        .groupBy("user_id", (F.col("rn") - F.col("rn_typed")).alias("island"))
        .agg(
            F.count(F.lit(1)).alias("streak_len"),
            F.min(
                F.struct(F.col("rn").alias("rn"), F.col("event_id").alias("eid"))
            ).alias("first_row"),
        )
    )
    pick = Window.partitionBy("user_id").orderBy(
        F.desc("streak_len"), F.col("first_row.rn")
    )
    return (
        islands.withColumn("pick", F.row_number().over(pick))
        .filter(F.col("pick") == 1)
        .select(
            "user_id",
            F.col("streak_len").cast("long").alias("longest_click_streak"),
            F.col("first_row.eid").cast("long").alias("first_event_id"),
        )
    )


@query(
    "win_pareto_concentration",
    oracle="""
    WITH rev AS (
      SELECT c.c_nationkey AS nationkey, o.o_custkey,
             CAST(SUM(CAST(CAST(o.o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)) AS BIGINT)
               AS cents
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      GROUP BY 1, 2
    ),
    ranked AS (
      SELECT nationkey, cents,
             ROW_NUMBER() OVER (
               PARTITION BY nationkey ORDER BY cents DESC, o_custkey
             ) AS rnk,
             SUM(cents) OVER (
               PARTITION BY nationkey ORDER BY cents DESC, o_custkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS cum,
             SUM(cents) OVER (PARTITION BY nationkey) AS total,
             COUNT(*) OVER (PARTITION BY nationkey) AS n_customers
      FROM rev
    )
    SELECT nationkey,
           CAST(MAX(n_customers) AS BIGINT) AS n_customers,
           CAST(MAX(total) AS BIGINT) AS total_cents,
           CAST(MIN(CASE WHEN 5 * cum >= 4 * total THEN rnk END) AS BIGINT)
             AS customers_to_80pct,
           CAST((MAX(CASE WHEN rnk <= 10 THEN cum END) * 10000) // MAX(total) AS BIGINT)
             AS top10_share_e4
    FROM ranked GROUP BY nationkey
    """,
    tags=("window", "pareto", "concentration"),
)
def win_pareto_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue concentration per nation (the Pareto/80-20 audit): how
    many customers carry 80% of revenue, and what share the top 10 hold —
    the skew diagnosis that decides whether a market is broad or
    whale-driven (and, for this engine, whether a per-key partition will
    have stragglers). Exact integer cents; the 80% cut is the
    cross-multiplied predicate 5*cum >= 4*total, no division until the
    final basis-point share.

    Scale shape: one partial-aggregable (nation, customer) rollup, then
    windows partitioned BY NATION — per-group sorts, never a global one —
    and a final rollup onto the 25-row nation key space."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    cents = F.expr("CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)")
    rev = (
        orders.join(
            F.broadcast(cust.select("c_custkey", "c_nationkey")),
            orders["o_custkey"] == cust["c_custkey"],
        )
        .groupBy(
            F.col("c_nationkey").alias("nationkey"),
            "o_custkey",
        )
        .agg(F.sum(cents).cast("long").alias("cents"))
    )
    order_w = Window.partitionBy("nationkey").orderBy(
        F.desc("cents"), "o_custkey"
    )
    ranked = rev.select(
        "nationkey", "cents",
        F.row_number().over(order_w).alias("rnk"),
        F.sum("cents").over(
            order_w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).alias("cum"),
        F.sum("cents").over(Window.partitionBy("nationkey")).alias("total"),
        F.count(F.lit(1)).over(Window.partitionBy("nationkey")).alias("n_customers"),
    )
    return ranked.groupBy("nationkey").agg(
        F.max("n_customers").cast("long").alias("n_customers"),
        F.max("total").cast("long").alias("total_cents"),
        F.min(
            F.when(5 * F.col("cum") >= 4 * F.col("total"), F.col("rnk"))
        ).cast("long").alias("customers_to_80pct"),
        F.expr(
            "(max(CASE WHEN rnk <= 10 THEN cum END) * 10000) div max(total)"
        ).alias("top10_share_e4"),
    )


@query(
    "win_cumulative_distinct",
    oracle="""
    WITH flagged AS (
      SELECT user_id, event_id, ts, event_type,
             CASE WHEN row_number() OVER (
               PARTITION BY user_id, event_type ORDER BY ts, event_id
             ) = 1 THEN 1 ELSE 0 END AS first_seen
      FROM events
    )
    SELECT user_id, event_id,
           CAST(SUM(first_seen) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS n_types_so_far
    FROM flagged
    """,
    tags=("window", "running", "distinct"),
)
def win_cumulative_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running DISTINCT count per user: after each event, how many
    distinct event types has this user produced so far — the
    feature-adoption / behavioral-breadth curve. SQL has no
    `COUNT(DISTINCT) OVER (ORDER BY ...)`; the scalable identity is
    first-occurrence flags (rank-1 within (user, type)) summed by an
    ordinary running SUM — two window passes over integer flags instead
    of a per-row set that would grow with history.

    Scale shape: both windows partition on user keys (the second reuses
    the first's user_id hash partitioning — one shuffle, Catalyst
    collapses the exchange), frames carry O(1) state, and the unique
    (ts, event_id) tiebreaker pins frame contents across engines and
    partitionings."""
    events = load_table(spark, sf_dir, "events")
    w_first = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    flagged = events.select(
        "user_id", "event_id", "ts",
        F.when(F.row_number().over(w_first) == 1, 1).otherwise(0).alias("first_seen"),
    )
    return flagged.select(
        "user_id", "event_id",
        F.sum("first_seen").over(w_run).cast("long").alias("n_types_so_far"),
    )


@query(
    "win_period_over_period",
    oracle="""
    WITH rev AS (
      SELECT n_name, strftime(o_orderdate, '%Y-%m') AS month,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) * 100 AS BIGINT)
               AS rev_cents
      FROM orders
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      GROUP BY 1, 2
    )
    SELECT n_name, month, rev_cents, prev_cents,
           rev_cents - prev_cents AS delta_cents,
           CAST((1000000 * (rev_cents - prev_cents)) // prev_cents AS BIGINT)
             AS growth_ppm
    FROM (
      SELECT *, LAG(rev_cents) OVER (
        PARTITION BY n_name ORDER BY month
      ) AS prev_cents FROM rev
    ) WHERE prev_cents IS NOT NULL AND prev_cents > 0
    """,
    tags=("window", "period-over-period", "lag"),
)
def win_period_over_period(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month revenue growth per nation: the LAG-based
    period-over-period delta every BI layer asks for, in exact integer
    cents with growth as integer ppm (floor division of exact cents —
    bit-stable where a float percentage would drift). Consecutive-month
    comparison is by the month KEY order, so a nation with a silent
    month compares against its last active month — the gap-tolerant
    reading (pair with ts_gap_fill_hours when zero-filled periods are
    wanted instead).

    Scale shape: revenue pre-aggregates onto the (nation, month) key
    space before any window (partial-aggregable decimal sums where the
    orders scan runs; dimensions broadcast), and the LAG window runs
    per-nation over that bounded relation — frames carry O(1) state."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    rev = (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .groupBy("n_name", F.date_format("o_orderdate", "yyyy-MM").alias("month"))
        .agg((F.sum(dec("o_totalprice")) * 100).cast("long").alias("rev_cents"))
    )
    w = Window.partitionBy("n_name").orderBy("month")
    out = rev.withColumn("prev_cents", F.lag("rev_cents").over(w)).filter(
        F.col("prev_cents").isNotNull() & (F.col("prev_cents") > 0)
    )
    return out.select(
        "n_name", "month", "rev_cents", "prev_cents",
        (F.col("rev_cents") - F.col("prev_cents")).alias("delta_cents"),
        F.expr(
            "CAST((1000000 * (rev_cents - prev_cents)) div prev_cents AS BIGINT)"
        ).alias("growth_ppm"),
    )


@query(
    "win_rolling_quantile",
    oracle="""
    WITH hourly AS (
      SELECT event_type, date_trunc('hour', ts) AS h,
             date_diff('day', DATE '1970-01-01', CAST(date_trunc('hour', ts) AS DATE)) * 24
               + EXTRACT(hour FROM ts) AS hidx,
             COUNT(*) AS c
      FROM events GROUP BY 1, 2, 3
    ),
    framed AS (
      SELECT event_type, h, c,
             list(c) OVER (
               PARTITION BY event_type ORDER BY hidx
               RANGE BETWEEN 23 PRECEDING AND CURRENT ROW
             ) AS win
      FROM hourly
    )
    SELECT event_type, h, CAST(c AS BIGINT) AS n_events,
           CAST(len(win) AS BIGINT) AS n_window,
           CAST(list_sort(win)[CAST(ceil(0.95 * len(win)) AS BIGINT)]
                AS BIGINT) AS p95_count
    FROM framed
    """,
    tags=("window", "quantile", "timeseries"),
)
def win_rolling_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-24h p95 of hourly event volume per event type: the rolling
    tail-quantile behind burst alerting ("is this hour's volume above the
    window's p95?") — rank-based where a rolling mean would be dragged by
    the very bursts it should flag. Exact discrete quantile: both engines
    sort the SAME ≤24 integer counts and index ceil(0.95·n) — integers in,
    integer out, no interpolation convention to disagree on.

    Scale shape: the raw stream pre-aggregates to (event_type, hour)
    counts (partial-aggregable — the only shuffle that sees event volume),
    then ONE window pass per type over that bounded relation with an
    integer-keyed RANGE frame capped at 24 elements — O(24) state per
    frame, no self-join, no pair blowup. The hour index is derived from
    date+hour components, never epoch-of-timestamp, so session timezone
    can't shift the frame (events.ts is TIMESTAMP_NTZ)."""
    events = load_table(spark, sf_dir, "events")
    hourly = (
        events.select(
            "event_type",
            F.date_trunc("hour", F.col("ts")).alias("h"),
        )
        .groupBy("event_type", "h")
        .agg(F.count(F.lit(1)).alias("c"))
        .withColumn(
            "hidx",
            F.datediff(F.to_date("h"), F.lit("1970-01-01")).cast("long") * 24
            + F.hour("h").cast("long"),
        )
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("hidx")
        .rangeBetween(-23, Window.currentRow)
    )
    framed = hourly.withColumn("win", F.collect_list("c").over(w))
    sorted_win = F.array_sort("win")
    n = F.size("win")
    idx = F.ceil(F.lit(0.95) * n).cast("int")
    return framed.select(
        "event_type",
        "h",
        F.col("c").cast("long").alias("n_events"),
        n.cast("long").alias("n_window"),
        F.element_at(sorted_win, idx).cast("long").alias("p95_count"),
    )

"""Join-strategy coverage: every join type Spark offers (inner joins are
exercised throughout relational.py), plus a big-big self join.

Scale notes: outer joins to dim tables broadcast; the lineitem self-join
shuffles both sides on the join key (orderkey) — co-partitioned, no
cartesian blowup since multiplicity per key is bounded by lines-per-order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from denali_spark.engine.tables import load_table
from denali_spark.operators.registry import query


@query(
    "join_left_outer_order_counts",
    oracle="""
    SELECT c_custkey, COUNT(o_orderkey) AS n_orders
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey
    """,
    tags=("join", "left-outer"),
)
def join_left_outer_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with their order count; 0 (not dropped) for order-less
    customers — the left-outer contract."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )


@query(
    "join_right_outer_part_sales",
    oracle="""
    SELECT p_partkey, COUNT(l_orderkey) AS n_lineitems
    FROM lineitem RIGHT JOIN part ON l_partkey = p_partkey
    GROUP BY p_partkey
    """,
    tags=("join", "right-outer"),
)
def join_right_outer_part_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-part sale counts including never-sold parts (right outer)."""
    part = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(part, li.l_partkey == part.p_partkey, "right")
        .groupBy("p_partkey")
        .agg(F.count("l_orderkey").alias("n_lineitems"))
    )


@query(
    "join_full_outer_nation_profiles",
    oracle="""
    WITH rich_cust AS (
      SELECT c_nationkey AS nk, COUNT(*) AS n_cust FROM customer
      WHERE c_acctbal > 9000 GROUP BY c_nationkey
    ),
    poor_supp AS (
      SELECT s_nationkey AS nk, COUNT(*) AS n_supp FROM supplier
      WHERE s_acctbal < 1000 GROUP BY s_nationkey
    )
    SELECT COALESCE(rich_cust.nk, poor_supp.nk) AS nationkey,
           COALESCE(n_cust, 0) AS n_cust,
           COALESCE(n_supp, 0) AS n_supp
    FROM rich_cust FULL OUTER JOIN poor_supp ON rich_cust.nk = poor_supp.nk
    """,
    tags=("join", "full-outer"),
)
def join_full_outer_nation_profiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-outer join of two sparse per-nation aggregates (unmatched keys on
    both sides by construction)."""
    cust = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 9000)
        .groupBy(F.col("c_nationkey").alias("cnk"))
        .agg(F.count(F.lit(1)).alias("n_cust"))
    )
    supp = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 1000)
        .groupBy(F.col("s_nationkey").alias("snk"))
        .agg(F.count(F.lit(1)).alias("n_supp"))
    )
    return cust.join(supp, cust.cnk == supp.snk, "full_outer").select(
        F.coalesce("cnk", "snk").alias("nationkey"),
        F.coalesce("n_cust", F.lit(0)).alias("n_cust"),
        F.coalesce("n_supp", F.lit(0)).alias("n_supp"),
    )


@query(
    "join_semi_anti_chain",
    oracle="""
    SELECT s_suppkey, s_name FROM supplier
    WHERE s_suppkey NOT IN (
      SELECT l_suppkey FROM lineitem
      WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_type = 'PROMO')
    )
    ORDER BY s_suppkey
    """,
    tags=("join", "semi", "anti"),
)
def join_semi_anti_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers that never shipped a PROMO part: semi join (lineitem⋉part)
    feeding an anti join against supplier."""
    supplier = load_table(spark, sf_dir, "supplier")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    li = load_table(spark, sf_dir, "lineitem")
    promo_lines = li.join(F.broadcast(part), li.l_partkey == part.p_partkey, "left_semi")
    return (
        supplier.join(promo_lines, supplier.s_suppkey == promo_lines.l_suppkey, "left_anti")
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )


@query(
    "join_cross_region_pairs",
    oracle="""
    SELECT a.r_name AS r1, b.r_name AS r2
    FROM region a CROSS JOIN region b
    WHERE a.r_name < b.r_name
    """,
    tags=("join", "cross"),
)
def join_cross_region_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unordered region pairs via cross join (tiny × tiny only — cartesian
    products never touch fact tables in this engine)."""
    a = load_table(spark, sf_dir, "region").select(F.col("r_name").alias("r1"))
    b = load_table(spark, sf_dir, "region").select(F.col("r_name").alias("r2"))
    return a.crossJoin(b).filter(F.col("r1") < F.col("r2"))


@query(
    "join_self_colineitems",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs
    FROM lineitem a JOIN lineitem b
      ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey
    """,
    tags=("join", "self-join", "big-big"),
)
def join_self_colineitems(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier-pair count within orders: a big-big self join, shuffle-
    partitioned on the shared orderkey (per-key fanout bounded by order
    size, so it scales linearly with data volume)."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    a = li.alias("a")
    b = li.alias("b")
    return (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_suppkey") < F.col("b.l_suppkey")),
        )
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )


DAY_US = 86_400_000_000  # one day in microseconds


@query(
    "join_interval_overlap",
    oracle=f"""
    WITH iv AS (
      SELECT user_id, epoch_us(ts) // {DAY_US} AS day,
             MIN(epoch_us(ts)) AS s, MAX(epoch_us(ts)) AS e
      FROM events GROUP BY 1, 2
    )
    SELECT a.day AS day,
           CAST(COUNT(*) AS BIGINT) AS n_overlap_pairs,
           CAST(SUM(LEAST(a.e, b.e) - GREATEST(a.s, b.s)) AS BIGINT)
             AS total_overlap_us
    FROM iv a JOIN iv b ON a.day = b.day AND a.user_id < b.user_id
    WHERE a.s <= b.e AND b.s <= a.e
    GROUP BY 1
    """,
    tags=("join", "interval", "range-join", "custom-operator"),
)
def join_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap join: per calendar day, how many cross-user
    activity-interval pairs overlap in time and for how long (closed
    intervals, exact µs) — the co-activity shape behind concurrency
    billing, contention analysis, and ad-break overlap. Each user's
    per-day interval is [first event, last event].

    Scale shape (r16 optimization round): a SWEEP-LINE rewrite — the old
    shape enumerated every within-day user pair (an O(n² per day)
    self-join) only to count them and sum their overlap lengths; both
    aggregates are derivable exactly from sorted endpoints in O(n log n):

    - total_overlap_us: Σ_pairs max(0, min(e) − max(s)) is the Lebesgue
      integral ∫ C(active(t), 2) dt over the half-open decomposition —
      between consecutive distinct endpoints the active count k is
      constant, so each segment contributes (len × k(k−1)/2). Pairs that
      merely touch (max_s = min_e) have measure 0, exactly matching the
      old sum where they contributed min(e) − max(s) = 0, and
      non-overlapping pairs (min_e < max_s) contribute nothing to either
      form.
    - n_overlap_pairs: overlapping pairs = C(n_day, 2) − disjoint pairs,
      and a pair is disjoint iff one interval ends STRICTLY before the
      other starts (closed intervals: e = s still overlaps), so the
      disjoint count is Σ_b #{a : a.e < b.s} — a rank-of-start-among-ends
      count from ONE sorted merge of endpoint events per day (starts
      ordered before ends at equal value, so e = s ties are correctly
      NOT counted as disjoint).

    Both passes are per-day window functions over the tiny
    (user, day)-interval relation — the pair relation is never
    materialized. All arithmetic stays integer µs (k(k−1) div 2 is exact
    in long), so results are bit-identical to the pair-join form; the
    oracle still runs the original O(n²) SQL, value-checking the
    equivalence end to end. At 100 TB the old shape's per-day pair count
    C(active_users, 2) is the scale killer (10⁶ daily actives → 5·10¹¹
    pairs/day); the sweep is n log n per day and parallel across days."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
    )
    iv = ev.groupBy(
        "user_id", F.expr(f"us div {DAY_US}").alias("day")
    ).agg(F.min("us").alias("s"), F.max("us").alias("e"))

    # ONE sorted endpoint merge serves both aggregates. Each interval
    # contributes a start event (kind 0, delta +1) and an end event
    # (kind 1, delta −1); rows sort by (val, kind) within a day, so at
    # equal value starts process before ends:
    #  - k (running Σ delta) at the LAST row of each value group — the
    #    only row whose lead(val) differs — is the half-open active count
    #    on [val, next_val), and its segment contributes len × C(k, 2)
    #    (tied rows contribute len 0). Internal tie order is irrelevant:
    #    the group-final cumsum includes every delta at that value.
    #  - ends_so_far (running Σ kind) at a start row counts intervals
    #    ending STRICTLY before this start (ends at the same value sort
    #    after starts), i.e. the disjoint-pair count at this interval.
    pts = iv.select(
        "day", F.explode(F.array(
            F.struct(F.col("s").alias("val"), F.lit(0).alias("kind")),
            F.struct(F.col("e").alias("val"), F.lit(1).alias("kind")),
        )).alias("p")
    ).select("day", "p.val", "p.kind")
    w = Window.partitionBy("day").orderBy("val", "kind")
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    swept = pts.select(
        "day",
        "kind",
        (F.lead("val").over(w) - F.col("val")).alias("len"),
        F.sum(1 - F.col("kind") * 2).over(wrun).alias("k"),
        F.sum("kind").over(wrun).alias("ends_so_far"),
    )
    # Window partitioning on day is reused by the groupBy — no extra
    # exchange between the sweep and the per-day rollup.
    per_day = swept.groupBy("day").agg(
        F.sum(
            F.when(
                F.col("len").isNotNull(),
                F.col("len") * F.expr("(k * (k - 1)) div 2"),
            ).otherwise(F.lit(0))
        ).alias("total_overlap_us"),
        F.sum(F.when(F.col("kind") == 0, 1).otherwise(0)).alias("n"),
        F.sum(F.when(F.col("kind") == 0, F.col("ends_so_far"))).alias(
            "n_disjoint"
        ),
    )
    return (
        per_day.select(
            "day",
            (F.expr("(n * (n - 1)) div 2") - F.col("n_disjoint")).alias(
                "n_overlap_pairs"
            ),
            "total_overlap_us",
        )
        .filter(F.col("n_overlap_pairs") >= 1)
        .select(
            "day",
            F.col("n_overlap_pairs").cast("long").alias("n_overlap_pairs"),
            F.col("total_overlap_us").cast("long").alias("total_overlap_us"),
        )
    )

"""Join-strategy coverage: every join type Spark offers (inner joins are
exercised throughout relational.py), plus a big-big self join.

Scale notes: outer joins to dim tables broadcast; the lineitem self-join
shuffles both sides on the join key (orderkey) — co-partitioned, no
cartesian blowup since multiplicity per key is bounded by lines-per-order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
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

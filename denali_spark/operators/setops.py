"""Set-operation coverage: UNION ALL / UNION DISTINCT / INTERSECT [ALL] /
EXCEPT [ALL] — both bag and set semantics."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from denali_spark.engine.tables import load_table
from denali_spark.operators.registry import query


def _cust_keys(spark, sf_dir):
    return load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("custkey")
    )


def _order_cust_keys(spark, sf_dir):
    return load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("custkey")
    )


@query(
    "setop_union_all_counts",
    oracle="""
    SELECT nationkey, COUNT(*) AS n FROM (
      SELECT c_nationkey AS nationkey FROM customer
      UNION ALL
      SELECT s_nationkey FROM supplier
    ) t GROUP BY nationkey
    """,
    tags=("setop", "union-all"),
)
def setop_union_all_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return cust.unionByName(supp).groupBy("nationkey").agg(F.count(F.lit(1)).alias("n"))


@query(
    "setop_union_distinct",
    oracle="""
    SELECT c_nationkey AS nationkey, 'has_account' AS kind FROM customer WHERE c_acctbal > 9500
    UNION
    SELECT s_nationkey, 'has_account' FROM supplier WHERE s_acctbal > 9500
    """,
    tags=("setop", "union-distinct"),
)
def setop_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 9500)
        .select(F.col("c_nationkey").alias("nationkey"), F.lit("has_account").alias("kind"))
    )
    supp = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") > 9500)
        .select(F.col("s_nationkey").alias("nationkey"), F.lit("has_account").alias("kind"))
    )
    return cust.unionByName(supp).distinct()


@query(
    "setop_intersect",
    oracle="""
    SELECT c_custkey AS custkey FROM customer
    INTERSECT
    SELECT o_custkey FROM orders
    """,
    tags=("setop", "intersect"),
)
def setop_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _cust_keys(spark, sf_dir).intersect(_order_cust_keys(spark, sf_dir))


@query(
    "setop_except",
    oracle="""
    SELECT c_custkey AS custkey FROM customer
    EXCEPT
    SELECT o_custkey FROM orders
    """,
    tags=("setop", "except"),
)
def setop_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _cust_keys(spark, sf_dir).exceptAll(_order_cust_keys(spark, sf_dir)).distinct()


@query(
    "setop_except_all",
    oracle="""
    SELECT custkey, COUNT(*) AS n FROM (
      SELECT o_custkey AS custkey FROM orders
      EXCEPT ALL
      SELECT c_custkey FROM customer
    ) t GROUP BY custkey
    """,
    tags=("setop", "except-all"),
)
def setop_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag-semantics EXCEPT: order multiplicity minus one per existing
    customer (aggregated so the output stays compact)."""
    return (
        _order_cust_keys(spark, sf_dir)
        .exceptAll(_cust_keys(spark, sf_dir))
        .groupBy("custkey")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "setop_intersect_all",
    oracle="""
    SELECT custkey, COUNT(*) AS n FROM (
      SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 100000
      INTERSECT ALL
      SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    ) t GROUP BY custkey
    """,
    tags=("setop", "intersect-all"),
)
def setop_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    a = orders.filter(F.col("o_totalprice") > 100000).select(
        F.col("o_custkey").alias("custkey")
    )
    b = orders.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("custkey")
    )
    return a.intersectAll(b).groupBy("custkey").agg(F.count(F.lit(1)).alias("n"))

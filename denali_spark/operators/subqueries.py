"""Subquery / decorrelation battery — the TPC-H queries built around
correlated subqueries, EXISTS / NOT EXISTS, NOT IN, and scalar subqueries
in HAVING (q2, q7, q8, q11, q13, q16, q17, q20, q21), adapted to the
testdata star schema (FIXTURES.md §B: no partsupp/commitdate/shipmode, so
correlations run through lineitem and the literal predicates use this
dataset's dimension values).

These are deliberately written as SQL (`spark.sql` over registered views)
rather than DataFrame code: the subquery shapes are the point — Catalyst's
decorrelation (RewriteCorrelatedScalarSubquery, RewritePredicateSubquery)
turns each correlated subquery into a join the same way the reference's
client engines would, and the IDENTICAL SQL text runs on DuckDB as the
oracle, so the decorrelated plans are value-checked end-to-end.

Scale notes (100 TB design point): every correlated subquery here
decorrelates to an aggregate + equi-join on the correlation key (partkey /
orderkey / suppkey) — no nested-loop per-row re-execution survives in the
physical plan. EXISTS/NOT EXISTS lower to left-semi/left-anti joins, and
NOT IN to a null-aware anti join; all shuffle on their natural keys and
broadcast when the subquery side is small.

r16 optimization-round exception: q17 is hand-decorrelated DataFrame
code — Catalyst decorrelates its two correlated scalar subqueries into
SEPARATE lineitem scans + aggregates, while one shared per-partkey
aggregate computes the same thing with one fewer full scan of the fact
table (measured steady-median 1.76s -> 1.14s at sf0.1; see the function
docstring for the equivalence argument). Its oracle remains the ORIGINAL
correlated SQL, so the rewrite is value-checked against the subquery
semantics end to end. The same treatment was tried on q21 and REVERTED:
replacing its EXISTS/NOT EXISTS pair with a per-order count-distinct
profile measured 2.8x SLOWER at sf0.1 (the distinct-expand over the fact
shuffles more than the all-broadcast semi/anti joins it saved). The
remaining eight stay shared-SQL to keep exercising Catalyst's
decorrelation itself.

Determinism policy (_util): monetary aggregates go through DECIMAL; the
q17 correlated-average comparison is cross-multiplied into exact integer
decimal arithmetic so no engine-dependent float rounding decides a row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from denali_spark.engine.tables import register_views
from denali_spark.operators._util import SQL_REVENUE
from denali_spark.operators.registry import query

_TABLES = ("part", "supplier", "customer", "orders", "lineitem", "nation", "region")


def _sql(spark: SparkSession, sf_dir: str, text: str) -> DataFrame:
    register_views(spark, sf_dir, *_TABLES)
    return spark.sql(text)


def _register(name: str, sql_text: str, tags: tuple[str, ...]):
    @query(name, oracle=sql_text, tags=tags)
    def run(spark: SparkSession, sf_dir: str, _t=sql_text) -> DataFrame:
        return _sql(spark, sf_dir, _t)

    run.__name__ = name
    run.__doc__ = f"Shared-SQL subquery battery entry {name!r} (see module doc)."
    return run


# --- q2: min-cost supplier (correlated scalar MAX) --------------------------
# Adapted: no partsupp, so "best supplier for a part" = the max-acctbal
# supplier that has actually shipped the part (via lineitem), within EUROPE.
Q2 = f"""
SELECT DISTINCT s_acctbal, s_name, n_name, p_partkey, p_name
FROM part, supplier, lineitem, nation, region
WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
  AND p_size = 25 AND p_type = 'STANDARD'
  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
  AND r_name = 'EUROPE'
  AND s_acctbal = (
    SELECT MAX(s2.s_acctbal)
    FROM supplier s2, lineitem l2, nation n2, region r2
    WHERE l2.l_partkey = p_partkey AND s2.s_suppkey = l2.l_suppkey
      AND s2.s_nationkey = n2.n_nationkey AND n2.n_regionkey = r2.r_regionkey
      AND r2.r_name = 'EUROPE')
"""

# --- q7: volume shipping between two nations (join-graph + disjunction) -----
Q7 = f"""
SELECT supp_nation, cust_nation, l_year, CAST(SUM(vol) AS DOUBLE) AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         CAST(year(l_shipdate) AS BIGINT) AS l_year,
         {SQL_REVENUE} AS vol
  FROM supplier, lineitem, orders, customer, nation n1, nation n2
  WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
    AND c_custkey = o_custkey
    AND s_nationkey = n1.n_nationkey AND c_nationkey = n2.n_nationkey
    AND ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_8')
      OR (n1.n_name = 'NATION_8' AND n2.n_name = 'NATION_3'))
) shipping
GROUP BY supp_nation, cust_nation, l_year
"""

# --- q8: national market share (conditional aggregate ratio) ----------------
Q8 = f"""
SELECT o_year,
       CAST(SUM(vol) FILTER (WHERE nation = 'NATION_3') AS DOUBLE)
         / CAST(SUM(vol) AS DOUBLE) AS mkt_share
FROM (
  SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
         {SQL_REVENUE} AS vol,
         n2.n_name AS nation
  FROM part, supplier, lineitem, orders, customer, nation n1, nation n2, region
  WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
    AND l_orderkey = o_orderkey AND o_custkey = c_custkey
    AND c_nationkey = n1.n_nationkey AND n1.n_regionkey = r_regionkey
    AND r_name = 'EUROPE' AND s_nationkey = n2.n_nationkey
    AND p_type = 'ECONOMY'
) all_nations
GROUP BY o_year
"""

# --- q11: important parts (scalar subquery in HAVING) -----------------------
# Adapted: part "value" = revenue shipped by NATION_7 suppliers (lineitem
# stands in for partsupp). Both HAVING operands are exact-decimal sums cast
# to double, so the > comparison is engine-independent.
Q11 = f"""
SELECT l_partkey, CAST(SUM({SQL_REVENUE}) AS DOUBLE) AS value
FROM lineitem, supplier, nation
WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey
  AND n_name = 'NATION_7'
GROUP BY l_partkey
HAVING CAST(SUM({SQL_REVENUE}) AS DOUBLE) > (
  SELECT CAST(SUM({SQL_REVENUE}) AS DOUBLE) * 0.001
  FROM lineitem, supplier, nation
  WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey
    AND n_name = 'NATION_7')
"""

# --- q13: customer order-count distribution (outer join + double agg) -------
Q13 = """
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer LEFT OUTER JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
) c_orders
GROUP BY c_count
"""

# --- q16: supplier counts by part attrs (NOT IN → null-aware anti join) -----
Q16 = """
SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem, part
WHERE p_partkey = l_partkey
  AND p_brand <> 'Brand#1'
  AND p_size IN (1, 5, 9, 13, 17, 21)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
"""

# --- q17: small-quantity-order revenue (correlated AVG, exactified) ---------
# Classic form compares l_quantity < 0.2 * AVG(l_quantity) per part; a float
# average would let engine rounding decide boundary rows, so the comparison
# is cross-multiplied: qty * 5 * COUNT < SUM (all exact decimals/ints).
Q17 = """
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / 7.0 AS avg_yearly
FROM lineitem, part
WHERE p_partkey = l_partkey AND p_brand = 'Brand#5'
  AND CAST(l_quantity AS DECIMAL(12,2)) * CAST(5 AS DECIMAL(2,0))
      * CAST((SELECT COUNT(*) FROM lineitem l2
              WHERE l2.l_partkey = p_partkey) AS DECIMAL(8,0))
    < (SELECT SUM(CAST(l_quantity AS DECIMAL(12,2))) FROM lineitem l2
       WHERE l2.l_partkey = p_partkey)
"""

# --- q20: suppliers with excess shipments (IN over aggregated subquery) -----
Q20 = """
SELECT s_name, s_acctbal
FROM supplier, nation
WHERE s_nationkey = n_nationkey AND n_name = 'NATION_12'
  AND s_suppkey IN (
    SELECT l_suppkey
    FROM lineitem, part
    WHERE l_partkey = p_partkey AND p_name LIKE 'small%'
    GROUP BY l_suppkey
    HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > CAST(50 AS DECIMAL(12,2)))
"""

# --- q21: suppliers kept waiting (EXISTS + NOT EXISTS, inequality corr) -----
# Adapted: commitdate/receiptdate don't exist; the "at fault" signal is
# l_returnflag = 'R' on finished orders — this supplier returned, no other
# supplier on the same order did.
Q21 = """
SELECT s_name, COUNT(*) AS numwait
FROM supplier, lineitem l1, orders, nation
WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
  AND o_orderstatus = 'F' AND l1.l_returnflag = 'R'
  AND s_nationkey = n_nationkey AND n_name = 'NATION_5'
  AND EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (
    SELECT 1 FROM lineitem l3
    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      AND l3.l_returnflag = 'R')
GROUP BY s_name
"""

q2_min_cost_supplier = _register(
    "q2_min_cost_supplier", Q2, ("relational", "subquery", "correlated-scalar")
)
q7_volume_shipping = _register(
    "q7_volume_shipping", Q7, ("relational", "join", "subquery")
)
q8_market_share = _register(
    "q8_market_share", Q8, ("relational", "join", "subquery")
)
q11_important_parts = _register(
    "q11_important_parts", Q11, ("relational", "subquery", "having-scalar")
)
q13_customer_distribution = _register(
    "q13_customer_distribution", Q13, ("relational", "join", "outer")
)
q16_supplier_counts = _register(
    "q16_supplier_counts", Q16, ("relational", "subquery", "not-in")
)
@query(
    "q17_small_quantity_revenue", oracle=Q17,
    tags=("relational", "subquery", "correlated-scalar"),
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17 with the two correlated scalar subqueries decorrelated BY HAND
    into one shared per-partkey aggregate (r16 optimization round):
    Catalyst's RewriteCorrelatedScalarSubquery decorrelates each subquery
    separately and MergeScalarSubqueries does not fuse them here, so the
    SQL form scans lineitem three times and aggregates it twice. COUNT(*)
    and SUM(qty) over the identical group live in ONE aggregate instead
    (lineitem scans 3 -> 2, shuffled aggregations 2 -> 1); the filter
    replays the oracle's exact cross-multiplied decimal comparison via
    F.expr so the arithmetic is the same expression tree spark.sql would
    build. The correlated groups are never empty (l1's own row is in its
    partkey group), so the scalar-subquery left join is exactly this
    inner join. Oracle (the original SQL) hash-equal at sf0.01/sf0.1."""
    register_views(spark, sf_dir, "part", "lineitem")
    from pyspark.sql import functions as F

    li = spark.table("lineitem")
    part = spark.table("part")
    per_part = li.groupBy("l_partkey").agg(
        F.expr("CAST(COUNT(*) AS DECIMAL(8,0))").alias("cnt"),
        F.expr("SUM(CAST(l_quantity AS DECIMAL(12,2)))").alias("sq"),
    )
    j = (
        li.join(F.broadcast(part.filter(F.col("p_brand") == "Brand#5")),
                li.l_partkey == F.col("p_partkey"))
        .join(per_part.withColumnRenamed("l_partkey", "agg_partkey"),
              li.l_partkey == F.col("agg_partkey"))
        .filter(
            F.expr(
                "CAST(l_quantity AS DECIMAL(12,2)) * CAST(5 AS DECIMAL(2,0))"
                " * cnt < sq"
            )
        )
    )
    return j.agg(
        F.expr(
            "CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / 7.0"
        ).alias("avg_yearly")
    )
q20_excess_suppliers = _register(
    "q20_excess_suppliers", Q20, ("relational", "subquery", "in-agg")
)
q21_suppliers_kept_waiting = _register(
    "q21_suppliers_kept_waiting", Q21, ("relational", "subquery", "exists")
)

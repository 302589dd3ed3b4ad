"""Driver-attestable incremental-view-maintenance twins.

The IVM plane (sources/ivm.py) is exercised end-to-end here as registry
queries with DuckDB oracles: each builds a throwaway catalog warehouse
from the round's parquet tables, drives a real maintenance lifecycle
(create → append → merge-on-read delete → incremental refresh), and
returns the MAINTAINED state — while the oracle recomputes the same
aggregate over the source rows' NET contents. A hash match proves the
fold path, the targeted-rescan path, and the watermark carry all land on
exactly the answer a from-scratch GROUP BY would give.

Reference anchor: the reference catalog stores the snapshot history these
deltas derive from (SURVEY §1.2/§3.2) and delegates incremental
consumption to client engines — this is that client-engine surface,
driver-checked.

Shape notes: all catalog work happens on small grouped state; the one
driver-side collect per query is the FINAL maintained rollup (bounded by
group count — ≤ ~10 rows), re-emitted as a local DataFrame so the
throwaway warehouse can be deleted before the driver consumes the
result. The deltas are modulo-of-key predicates, so the queries are
deterministic and scale-free across SF directories.
"""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from denali_spark.operators.registry import query


def _localize(spark, df: DataFrame, server, tmp: str) -> DataFrame:
    """Collect the (group-bounded) result, tear down the throwaway
    warehouse, and re-emit as a local DataFrame with the same schema."""
    rows, schema = df.collect(), df.schema
    server.stop()
    shutil.rmtree(tmp, ignore_errors=True)
    return spark.createDataFrame(rows, schema)


def _teardown(server, tmp: str) -> None:
    server.stop()
    shutil.rmtree(tmp, ignore_errors=True)


def _warehouse(spark):
    from denali_spark.catalog import CatalogServer, make_state
    from denali_spark.sources import SparkCatalogIO

    tmp = tempfile.mkdtemp(prefix="denali-ivm-query-")
    server = CatalogServer(make_state(tmp)).start()
    return tmp, server, SparkCatalogIO(spark, server.uri)


def _orders(spark, sf_dir: str) -> DataFrame:
    from denali_spark.engine.tables import load_table

    return load_table(spark, sf_dir, "orders")


@query(
    "ivm_rollup_vs_recompute",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) AS n_rows,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total_price,
           COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS n_finished,
           MIN(o_orderdate) AS first_date,
           MAX(o_orderdate) AS last_date
    FROM orders
    WHERE o_orderkey % 10 <> 3
    GROUP BY o_orderpriority
    """,
    tags=("ivm", "catalog", "aggregate"),
)
def ivm_rollup_vs_recompute(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maintained rollup == recompute, end to end: create the MV on half
    the orders, append the other half (fold path), merge-on-read-delete
    every tenth key (targeted-rescan path for MIN/MAX, indicator-sum fold
    for COUNT(expr)), refresh, and return the MAINTAINED state. The
    oracle recomputes the same GROUP BY over the net rows."""
    from denali_spark.sources import equality_delete

    tmp, server, io = _warehouse(spark)
    orders = _orders(spark, sf_dir)
    half = F.col("o_orderkey") % 2
    io.write_table(orders.filter(half == 0), ["reg"], "orders", mode="append")
    io.sql("""
        CREATE MATERIALIZED VIEW reg.mv AS
        SELECT o_orderpriority, COUNT(*) AS n_rows,
               SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS total_price_dec,
               COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS n_finished,
               MIN(o_orderdate) AS first_date,
               MAX(o_orderdate) AS last_date
        FROM reg.orders GROUP BY o_orderpriority
    """)
    io.write_table(orders.filter(half == 1), ["reg"], "orders", mode="append")
    doomed = orders.filter(F.col("o_orderkey") % 10 == 3).select("o_orderkey")
    equality_delete(io, ["reg"], "orders", doomed, on=["o_orderkey"])
    io.sql("REFRESH MATERIALIZED VIEW reg.mv")
    out = io.read_table(["reg"], "mv").select(
        "o_orderpriority", "n_rows",
        F.col("total_price_dec").cast("double").alias("total_price"),
        "n_finished", "first_date", "last_date",
    )
    return _localize(spark, out, server, tmp)


@query(
    "ivm_join_view_extrema",
    oracle="""
    SELECT c_mktsegment,
           COUNT(*) AS n_rows,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total_price,
           MIN(o_orderdate) AS first_date,
           MAX(o_orderdate) AS last_date
    FROM orders JOIN customer ON o_custkey = c_custkey
    WHERE o_orderkey % 10 <> 3
    GROUP BY c_mktsegment
    """,
    tags=("ivm", "catalog", "join", "aggregate"),
)
def ivm_join_view_extrema(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extrema maintained THROUGH a join (the round-14 capability): a
    fact⋈dim rollup with MIN/MAX folds fact appends via the bilinear
    delta and answers fact deletes with the net-removal rescan over the
    pinned join — returned state must hash-equal the oracle's plain
    re-join + GROUP BY over the net rows."""
    from denali_spark.engine.tables import load_table
    from denali_spark.sources import equality_delete

    tmp, server, io = _warehouse(spark)
    orders = _orders(spark, sf_dir)
    customer = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    io.write_table(customer, ["reg"], "customer", mode="append")
    half = F.col("o_orderkey") % 2
    io.write_table(orders.filter(half == 0), ["reg"], "orders", mode="append")
    io.sql("""
        CREATE MATERIALIZED VIEW reg.mv_seg AS
        SELECT c_mktsegment, COUNT(*) AS n_rows,
               SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS total_price_dec,
               MIN(o_orderdate) AS first_date,
               MAX(o_orderdate) AS last_date
        FROM reg.orders JOIN reg.customer ON o_custkey = c_custkey
        GROUP BY c_mktsegment
    """)
    io.write_table(orders.filter(half == 1), ["reg"], "orders", mode="append")
    doomed = orders.filter(F.col("o_orderkey") % 10 == 3).select("o_orderkey")
    equality_delete(io, ["reg"], "orders", doomed, on=["o_orderkey"])
    io.sql("REFRESH MATERIALIZED VIEW reg.mv_seg")
    out = io.read_table(["reg"], "mv_seg").select(
        "c_mktsegment", "n_rows",
        F.col("total_price_dec").cast("double").alias("total_price"),
        "first_date", "last_date",
    )
    return _localize(spark, out, server, tmp)


@query(
    "ivm_rewrite_rollup_reduction",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total_price
    FROM orders
    GROUP BY o_orderpriority
    """,
    tags=("ivm", "catalog", "rewrite", "aggregate"),
)
def ivm_rewrite_rollup_reduction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MV-backed query rewrite (sources/mv_rewrite.py), driver-checked: a
    (priority, status) rollup is maintained, and a coarser
    GROUP BY priority SELECT through io.sql() must be ANSWERED FROM THE
    SUMMARY (the function raises if the rewrite did not fire) with values
    hash-equal to the oracle's base-table aggregation."""
    tmp, server, io = _warehouse(spark)
    orders = _orders(spark, sf_dir)
    io.write_table(orders, ["reg"], "orders", mode="append")
    io.sql("""
        CREATE MATERIALIZED VIEW reg.mv_ps AS
        SELECT o_orderpriority, o_orderstatus, COUNT(*) AS n_rows,
               SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS total_price_dec
        FROM reg.orders GROUP BY o_orderpriority, o_orderstatus
    """)
    out = io.sql("""
        SELECT o_orderpriority, COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE)
                   AS total_price
        FROM reg.orders GROUP BY o_orderpriority
    """)
    if io.last_mv_rewrite is None:
        raise RuntimeError(
            "expected the GROUP BY o_orderpriority query to be answered "
            "from reg.mv_ps — the MV rewrite did not fire"
        )
    return _localize(spark, out, server, tmp)


@query(
    "ivm_rewrite_having_join",
    oracle="""
    SELECT c_mktsegment,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total_price
    FROM orders JOIN customer ON o_custkey = c_custkey
    WHERE o_orderkey % 10 <> 7
    GROUP BY c_mktsegment
    HAVING COUNT(*) > 1
    ORDER BY c_mktsegment
    """,
    tags=("ivm", "catalog", "rewrite", "join", "aggregate"),
)
def ivm_rewrite_having_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The round-15 rewrite shapes in one driver-checked lifecycle: a
    (segment, priority) JOIN-view rollup is maintained; the user query
    joins the same sources but groups by the COARSER key subset and
    carries a HAVING tail in the portable raw-aggregate spelling
    (HAVING COUNT(*) > 1 — mapped through the maintained-column lookup
    as a hidden summary aggregate) plus an ORDER BY — all of which must
    commute with answering from the summary. The query runs
    under mv_rewrite='refresh' against a deliberately STALE view (an
    append and a merge-on-read delete landed after CREATE), so the io.sql
    call itself folds the join delta (bilinear rule) before reducing the
    summary; the function raises unless the rewrite fired with the
    reduced+having flags set. The oracle recomputes the join + GROUP BY +
    HAVING over the net rows."""
    from denali_spark.engine.tables import load_table
    from denali_spark.sources import equality_delete

    tmp, server, io = _warehouse(spark)
    orders = _orders(spark, sf_dir)
    customer = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    io.write_table(customer, ["reg"], "customer", mode="append")
    half = F.col("o_orderkey") % 2
    io.write_table(orders.filter(half == 0), ["reg"], "orders", mode="append")
    io.sql("""
        CREATE MATERIALIZED VIEW reg.mv_sp AS
        SELECT c_mktsegment, o_orderpriority, COUNT(*) AS n_rows,
               SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS total_price_dec
        FROM reg.orders JOIN reg.customer ON o_custkey = c_custkey
        GROUP BY c_mktsegment, o_orderpriority
    """)
    io.write_table(orders.filter(half == 1), ["reg"], "orders", mode="append")
    doomed = orders.filter(F.col("o_orderkey") % 10 == 7).select("o_orderkey")
    equality_delete(io, ["reg"], "orders", doomed, on=["o_orderkey"])
    io.mv_rewrite = "refresh"
    out = io.sql("""
        SELECT c_mktsegment, COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE)
                   AS total_price
        FROM reg.orders o JOIN reg.customer c ON o.o_custkey = c.c_custkey
        GROUP BY c_mktsegment
        HAVING COUNT(*) > 1
        ORDER BY c_mktsegment
    """)
    info = io.last_mv_rewrite
    if info is None or not (info["reduced"] and info["having"] and info["fresh"]
                            and info["having_mapped_aggs"] == 1):
        raise RuntimeError(
            "expected the coarser HAVING query to be answered from "
            f"reg.mv_sp after a refresh-mode fold — got {info!r}"
        )
    return _localize(spark, out, server, tmp)


@query(
    "ivm_rewrite_avg_rollup",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) AS n_orders,
           CAST((2 * CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) * 1000000
                          AS HUGEINT)
                 + COUNT(o_totalprice)) // (2 * COUNT(o_totalprice))
                AS DOUBLE) / 1000000.0 AS avg_price
    FROM orders
    WHERE o_orderkey % 10 <> 7
    GROUP BY o_orderpriority
    HAVING COUNT(*) > 1
    ORDER BY o_orderpriority
    """,
    tags=("ivm", "catalog", "rewrite", "aggregate"),
)
def ivm_rewrite_avg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-16 frontier: AVG answered FROM THE SUMMARY via the
    maintained hidden sum/count pair. A (priority, status) rollup
    maintaining AVG(totalprice) is left STALE (append + merge-on-read
    delete after CREATE); the user query groups by the coarser priority
    key and asks for AVG in both the select list (wearing the registry's
    CAST(... AS DOUBLE) exactness idiom) and alongside a HAVING tail,
    under mv_rewrite='refresh' — so the io.sql call folds the delta,
    re-aggregates the hidden exact sums and non-null counts, and
    replicates Spark's Average rounding (quotient rounded at scale s+4
    before the outer cast). The oracle reproduces that rounding with
    exact integer HALF_UP math — (2N + C) // (2C) at scale 6 — because
    DuckDB's own decimal AVG degrades to double division. The function
    raises unless the rewrite fired with the reduced flag set."""
    from denali_spark.sources import equality_delete

    tmp, server, io = _warehouse(spark)
    orders = _orders(spark, sf_dir)
    half = F.col("o_orderkey") % 2
    io.write_table(orders.filter(half == 0), ["reg"], "orders", mode="append")
    io.sql("""
        CREATE MATERIALIZED VIEW reg.mv_avg AS
        SELECT o_orderpriority, o_orderstatus, COUNT(*) AS n_rows,
               AVG(CAST(o_totalprice AS DECIMAL(12,2))) AS avg_price_dec
        FROM reg.orders GROUP BY o_orderpriority, o_orderstatus
    """)
    io.write_table(orders.filter(half == 1), ["reg"], "orders", mode="append")
    doomed = orders.filter(F.col("o_orderkey") % 10 == 7).select("o_orderkey")
    equality_delete(io, ["reg"], "orders", doomed, on=["o_orderkey"])
    io.mv_rewrite = "refresh"
    out = io.sql("""
        SELECT o_orderpriority, COUNT(*) AS n_orders,
               CAST(AVG(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE)
                   AS avg_price
        FROM reg.orders
        GROUP BY o_orderpriority
        HAVING COUNT(*) > 1
        ORDER BY o_orderpriority
    """)
    info = io.last_mv_rewrite
    if info is None or not (info["reduced"] and info["fresh"]):
        raise RuntimeError(
            "expected the AVG query to be answered from reg.mv_avg after "
            f"a refresh-mode fold — got {info!r}"
        )
    return _localize(spark, out, server, tmp)


@query(
    "ivm_topup_join_serving",
    oracle="""
    SELECT c_mktsegment,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total_price
    FROM orders JOIN customer ON o_custkey = c_custkey
    WHERE o_orderkey % 10 <> 7
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
    tags=("ivm", "catalog", "rewrite", "topup", "join", "aggregate"),
)
def ivm_topup_join_serving(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-16 frontier, driver-checked: DELTA TOP-UP SERVING on a join
    view. A (segment, priority) join rollup is left STALE (an orders
    append AND a merge-on-read delete landed after CREATE); under
    mv_rewrite='topup' the io.sql call folds the bilinear changelog
    delta (ΔR⋈S_new ∪ R_old⋈ΔS, pre-cancelled weights) into the
    read-time re-aggregation and answers the coarser GROUP BY FRESH —
    with ZERO commits on the view (the snapshot count is pinned; a
    refresh here would be a commit). The oracle recomputes the join
    aggregate over the net rows."""
    from denali_spark.engine.tables import load_table
    from denali_spark.sources import equality_delete

    tmp, server, io = _warehouse(spark)
    orders = _orders(spark, sf_dir)
    customer = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    io.write_table(customer, ["reg"], "customer", mode="append")
    half = F.col("o_orderkey") % 2
    io.write_table(orders.filter(half == 0), ["reg"], "orders", mode="append")
    io.sql("""
        CREATE MATERIALIZED VIEW reg.mv_topup AS
        SELECT c_mktsegment, o_orderpriority, COUNT(*) AS n_rows,
               SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS total_price_dec
        FROM reg.orders JOIN reg.customer ON o_custkey = c_custkey
        GROUP BY c_mktsegment, o_orderpriority
    """)
    io.write_table(orders.filter(half == 1), ["reg"], "orders", mode="append")
    doomed = orders.filter(F.col("o_orderkey") % 10 == 7).select("o_orderkey")
    equality_delete(io, ["reg"], "orders", doomed, on=["o_orderkey"])
    snaps_before = len(
        io.client.load_table(["reg"], "mv_topup")["metadata"]["snapshots"]
    )
    io.sql("SET mv_rewrite = 'topup'")
    out = io.sql("""
        SELECT c_mktsegment, COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE)
                   AS total_price
        FROM reg.orders o JOIN reg.customer c ON o.o_custkey = c.c_custkey
        GROUP BY c_mktsegment
        ORDER BY c_mktsegment
    """)
    rows, schema = out.collect(), out.schema  # execute BEFORE the pin check
    info = io.last_mv_rewrite
    snaps_after = len(
        io.client.load_table(["reg"], "mv_topup")["metadata"]["snapshots"]
    )
    _teardown(server, tmp)
    res = spark.createDataFrame(rows, schema)
    if info is None or not info["fresh"] or info["topup_delta_rows"] is None:
        raise RuntimeError(f"expected a topup-served rewrite — got {info!r}")
    if snaps_after != snaps_before:
        raise RuntimeError(
            "topup serving must not commit on the view: snapshots "
            f"{snaps_before} -> {snaps_after}"
        )
    return res


@query(
    "ivm_topup_extrema_append_only",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) AS n_orders,
           MIN(o_orderdate) AS first_date,
           MAX(o_orderdate) AS last_date
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    tags=("ivm", "catalog", "rewrite", "topup", "aggregate"),
)
def ivm_topup_extrema_append_only(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-16 frontier, driver-checked: INSERT-ONLY EXTREMA TOP-UP. A
    priority rollup maintaining MIN/MAX(o_orderdate) goes stale through
    an append-only delta (no delete can have retired a stored extremum,
    probed with a bounded limit(1) over the changed files), so under
    mv_rewrite='topup' the MIN/MAX fold over summary + delta is exact
    and the query serves FRESH with zero commits on the view. The
    oracle is the plain GROUP BY over all rows."""
    tmp, server, io = _warehouse(spark)
    orders = _orders(spark, sf_dir)
    half = F.col("o_orderkey") % 2
    io.write_table(orders.filter(half == 0), ["reg"], "orders", mode="append")
    io.sql("""
        CREATE MATERIALIZED VIEW reg.mv_ext AS
        SELECT o_orderpriority, COUNT(*) AS n_rows,
               MIN(o_orderdate) AS first_date,
               MAX(o_orderdate) AS last_date
        FROM reg.orders GROUP BY o_orderpriority
    """)
    io.write_table(orders.filter(half == 1), ["reg"], "orders", mode="append")
    snaps_before = len(
        io.client.load_table(["reg"], "mv_ext")["metadata"]["snapshots"]
    )
    io.sql("SET mv_rewrite = 'topup'")
    out = io.sql("""
        SELECT o_orderpriority, COUNT(*) AS n_orders,
               MIN(o_orderdate) AS first_date,
               MAX(o_orderdate) AS last_date
        FROM reg.orders
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
    """)
    rows, schema = out.collect(), out.schema  # execute BEFORE the pin check
    info = io.last_mv_rewrite
    snaps_after = len(
        io.client.load_table(["reg"], "mv_ext")["metadata"]["snapshots"]
    )
    _teardown(server, tmp)
    res = spark.createDataFrame(rows, schema)
    if info is None or not info["fresh"]:
        raise RuntimeError(f"expected an extrema topup rewrite — got {info!r}")
    if snaps_after != snaps_before:
        raise RuntimeError(
            "topup serving must not commit on the view: snapshots "
            f"{snaps_before} -> {snaps_after}"
        )
    return res

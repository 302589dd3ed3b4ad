"""Scalar-function coverage: string, regex, datetime, math, conditional,
JSON, array/list, and hash functions — the `pyspark.sql.functions` surface a
reference user exercises through Spark SQL expressions.

Cross-engine dialect notes (vs the DuckDB oracle):
- Spark int-typed scalars (length/instr/year/...) are cast to LONG to match
  DuckDB's BIGINT.
- DuckDB regexp_replace needs the 'g' flag to match Spark's replace-all.
- round() is only used where the argument is exactly representable (raw
  2-decimal money or exact decimals) — round on computed doubles is
  half-even-vs-half-away quicksand.
- ISO day-of-week: Spark weekday()+1 == DuckDB isodow.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from denali_spark.engine.tables import load_table
from denali_spark.operators.registry import query


@query(
    "fn_string_kitchen",
    oracle="""
    SELECT n_name,
           upper(n_name) AS up, lower(n_name) AS lo,
           substr(n_name, 1, 3) AS sub3,
           CAST(length(n_name) AS BIGINT) AS len,
           concat_ws('-', n_name, CAST(n_nationkey AS VARCHAR)) AS label,
           lpad(n_name, 12, '*') AS padded,
           reverse(n_name) AS rev,
           replace(n_name, 'A', '@') AS repl,
           translate(n_name, 'AEI', 'aei') AS tr,
           CAST(instr(n_name, 'A') AS BIGINT) AS pos_a
    FROM nation
    """,
    tags=("functions", "string"),
)
def fn_string_kitchen(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = load_table(spark, sf_dir, "nation")
    return nation.select(
        "n_name",
        F.upper("n_name").alias("up"),
        F.lower("n_name").alias("lo"),
        F.substring("n_name", 1, 3).alias("sub3"),
        F.length("n_name").cast("long").alias("len"),
        F.concat_ws("-", "n_name", F.col("n_nationkey").cast("string")).alias("label"),
        F.lpad("n_name", 12, "*").alias("padded"),
        F.reverse("n_name").alias("rev"),
        F.replace("n_name", F.lit("A"), F.lit("@")).alias("repl"),
        F.translate("n_name", "AEI", "aei").alias("tr"),
        F.instr("n_name", "A").cast("long").alias("pos_a"),
    )


@query(
    "fn_string_regex",
    oracle="""
    SELECT p_partkey,
           regexp_extract(p_brand, '(\\d+)', 1) AS brand_num,
           regexp_replace(p_name, '[aeiou]', '', 'g') AS consonants,
           regexp_matches(p_name, '[0-9]') AS has_digit,
           CAST(length(regexp_replace(p_name, '[^a-z]', '', 'g')) AS BIGINT) AS n_lower
    FROM part
    """,
    tags=("functions", "regex"),
)
def fn_string_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.regexp_extract("p_brand", r"(\d+)", 1).alias("brand_num"),
        F.regexp_replace("p_name", "[aeiou]", "").alias("consonants"),
        F.col("p_name").rlike("[0-9]").alias("has_digit"),
        F.length(F.regexp_replace("p_name", "[^a-z]", "")).cast("long").alias("n_lower"),
    )


@query(
    "fn_datetime_kitchen",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS BIGINT) AS yr,
           CAST(month(o_orderdate) AS BIGINT) AS mo,
           CAST(day(o_orderdate) AS BIGINT) AS dom,
           CAST(quarter(o_orderdate) AS BIGINT) AS qtr,
           CAST(isodow(o_orderdate) AS BIGINT) AS iso_dow,
           CAST(weekofyear(o_orderdate) AS BIGINT) AS week,
           strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
           strftime(o_orderdate + INTERVAL 30 DAY, '%Y-%m-%d') AS plus30,
           strftime(last_day(o_orderdate), '%Y-%m-%d') AS month_end,
           CAST(date_diff('day', TIMESTAMP '1995-01-01', o_orderdate) AS BIGINT) AS days_since_95
    FROM orders WHERE o_orderkey < 50
    """,
    tags=("functions", "datetime"),
)
def fn_datetime_kitchen(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 50)
    ts = F.col("o_orderdate")
    return orders.select(
        "o_orderkey",
        F.year(ts).cast("long").alias("yr"),
        F.month(ts).cast("long").alias("mo"),
        F.dayofmonth(ts).cast("long").alias("dom"),
        F.quarter(ts).cast("long").alias("qtr"),
        (F.weekday(ts) + 1).cast("long").alias("iso_dow"),
        F.weekofyear(ts).cast("long").alias("week"),
        F.date_format(F.date_trunc("month", ts), "yyyy-MM-dd").alias("month_start"),
        F.date_format(ts + F.expr("INTERVAL 30 DAYS"), "yyyy-MM-dd").alias("plus30"),
        F.date_format(F.last_day(ts), "yyyy-MM-dd").alias("month_end"),
        F.datediff(ts, F.lit("1995-01-01")).cast("long").alias("days_since_95"),
    )


@query(
    "fn_math_kitchen",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           abs(l_quantity - 25.0) AS absv,
           CAST(floor(l_quantity / 7.0) AS BIGINT) AS flo,
           CAST(ceil(l_quantity / 7.0) AS BIGINT) AS cei,
           round(l_extendedprice, 0) AS rnd0,
           l_quantity * l_quantity AS sq,
           sqrt(l_quantity) AS sr,
           power(2.0, l_linenumber) AS pw2,
           CAST(l_orderkey % 7 AS BIGINT) AS md,
           greatest(l_quantity, l_discount * 100, 10.0) AS gl,
           least(l_quantity, l_tax * 100) AS ll,
           CAST(sign(l_quantity - 25.0) AS DOUBLE) AS sgn
    FROM lineitem WHERE l_orderkey < 100
    """,
    tags=("functions", "math"),
)
def fn_math_kitchen(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 100)
    q = F.col("l_quantity")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(q - 25.0).alias("absv"),
        F.floor(q / 7.0).cast("long").alias("flo"),
        F.ceil(q / 7.0).cast("long").alias("cei"),
        F.round("l_extendedprice", 0).alias("rnd0"),
        (q * q).alias("sq"),
        F.sqrt(q).alias("sr"),
        F.pow(F.lit(2.0), F.col("l_linenumber")).alias("pw2"),
        (F.col("l_orderkey") % 7).cast("long").alias("md"),
        F.greatest(q, F.col("l_discount") * 100, F.lit(10.0)).alias("gl"),
        F.least(q, F.col("l_tax") * 100).alias("ll"),
        F.signum(q - 25.0).alias("sgn"),
    )


@query(
    "fn_conditional",
    oracle="""
    SELECT o_orderkey,
           CASE o_orderstatus WHEN 'F' THEN 'finished' WHEN 'O' THEN 'open' ELSE 'partial' END AS status_label,
           CAST(substr(o_orderpriority, 1, 1) AS BIGINT) AS pri_num,
           coalesce(nullif(o_orderstatus, 'P'), 'pending') AS status_nz,
           o_totalprice > 200000 AS big_order,
           least(o_totalprice, 150000.0) AS capped,
           CASE WHEN o_totalprice > 200000 THEN 'XL'
                WHEN o_totalprice > 100000 THEN 'L'
                WHEN o_totalprice > 50000 THEN 'M' ELSE 'S' END AS size_class
    FROM orders WHERE o_orderkey < 200
    """,
    tags=("functions", "conditional"),
)
def fn_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 200)
    tp = F.col("o_totalprice")
    return orders.select(
        "o_orderkey",
        F.when(F.col("o_orderstatus") == "F", "finished")
        .when(F.col("o_orderstatus") == "O", "open")
        .otherwise("partial")
        .alias("status_label"),
        F.substring("o_orderpriority", 1, 1).cast("long").alias("pri_num"),
        F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("P")), F.lit("pending")).alias(
            "status_nz"
        ),
        (tp > 200000).alias("big_order"),
        F.least(tp, F.lit(150000.0)).alias("capped"),
        F.when(tp > 200000, "XL")
        .when(tp > 100000, "L")
        .when(tp > 50000, "M")
        .otherwise("S")
        .alias("size_class"),
    )


@query(
    "fn_json_extract",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val,
           json_extract_string(props, '$.missing') IS NULL AS missing_is_null
    FROM events WHERE event_id < 100
    """,
    tags=("functions", "json"),
)
def fn_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 100)
    return events.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("long").alias("k_val"),
        F.get_json_object("props", "$.missing").isNull().alias("missing_is_null"),
    )


@query(
    "fn_array_ops",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS tokens
      FROM documents WHERE doc_id < 100
    )
    SELECT doc_id,
           CAST(len(tokens) AS BIGINT) AS n_tokens,
           CAST(len(list_distinct(tokens)) AS BIGINT) AS n_unique,
           tokens[1] AS first_token,
           array_to_string(list_sort(list_distinct(tokens))[1:3], ',') AS first3_sorted,
           list_contains(tokens, 'data') AS has_data
    FROM toks
    """,
    tags=("functions", "array"),
)
def fn_array_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    tokens = F.filter(
        F.split(F.lower("text"), "[^a-z0-9]+"), lambda x: x != F.lit("")
    )
    toks = docs.select("doc_id", tokens.alias("tokens"))
    return toks.select(
        "doc_id",
        F.size("tokens").cast("long").alias("n_tokens"),
        F.size(F.array_distinct("tokens")).cast("long").alias("n_unique"),
        F.element_at("tokens", 1).alias("first_token"),
        F.array_join(
            F.slice(F.sort_array(F.array_distinct("tokens")), 1, 3), ","
        ).alias("first3_sorted"),
        F.array_contains("tokens", "data").alias("has_data"),
    )


@query(
    "fn_hash",
    oracle="""
    SELECT doc_id, md5(text) AS text_md5, sha256(text) AS text_sha256,
           ('0x' || substr(md5(text), 1, 15))::BIGINT AS md5_prefix_int
    FROM documents WHERE doc_id < 50
    """,
    tags=("functions", "hash"),
)
def fn_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-engine-stable hashing (md5/sha256 are specified algorithms,
    unlike xxhash64/hash() which are engine-private). The 60-bit md5 prefix
    int is the primitive the MinHash/SimHash operators build on."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    return docs.select(
        "doc_id",
        F.md5("text").alias("text_md5"),
        F.sha2("text", 256).alias("text_sha256"),
        F.conv(F.substring(F.md5("text"), 1, 15), 16, 10).cast("long").alias(
            "md5_prefix_int"
        ),
    )


@query(
    "fn_bitwise",
    oracle="""
    SELECT event_id,
           CAST(event_id & 255 AS BIGINT) AS lo_byte,
           CAST(event_id | 4096 AS BIGINT) AS with_flag,
           CAST(xor(event_id, user_id) AS BIGINT) AS mixed,
           CAST(event_id << 3 AS BIGINT) AS shl3,
           CAST(event_id >> 2 AS BIGINT) AS shr2,
           CAST(bit_count(event_id) AS BIGINT) AS popcount,
           ((event_id & (event_id - 1)) = 0 AND event_id > 0) AS is_pow2
    FROM events WHERE event_id < 200
    """,
    tags=("functions", "bitwise"),
)
def fn_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise vocabulary (and/or/xor/shifts/popcount/power-of-two test) —
    the bit-twiddling layer feature hashing and bucketing are built from.
    Pure scan-side expressions, whole-stage codegen'd."""
    e = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 200)
    eid = F.col("event_id")
    return e.select(
        "event_id",
        eid.bitwiseAND(F.lit(255)).cast("long").alias("lo_byte"),
        eid.bitwiseOR(F.lit(4096)).cast("long").alias("with_flag"),
        eid.bitwiseXOR(F.col("user_id")).cast("long").alias("mixed"),
        F.shiftleft(eid, 3).cast("long").alias("shl3"),
        F.shiftright(eid, 2).cast("long").alias("shr2"),
        F.bit_count(eid).cast("long").alias("popcount"),
        (
            (eid.bitwiseAND(eid - F.lit(1)) == 0) & (eid > 0)
        ).alias("is_pow2"),
    )


@query(
    "fn_url_parse",
    oracle="""
    WITH u AS (
      SELECT doc_id,
             'https://' || source || '.example.com/docs/' || doc_id
               || '?lang=' || lang || '&v=2' AS url
      FROM documents WHERE doc_id < 100
    )
    SELECT doc_id, url,
           regexp_extract(url, '^([a-z]+)://', 1) AS proto,
           regexp_extract(url, '^[a-z]+://([^/?#]+)', 1) AS host,
           regexp_extract(url, '^[a-z]+://[^/?#]+([^?#]*)', 1) AS path,
           regexp_extract(url, '\\?([^#]*)', 1) AS query,
           regexp_extract(url, '[?&]lang=([^&#]*)', 1) AS q_lang
    FROM u
    """,
    tags=("functions", "url", "string"),
)
def fn_url_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL decomposition via Spark's parse_url (protocol/host/path/query
    plus keyed query-parameter extraction) — the provenance primitive of
    web-crawl curation (host-level dedup rules, TLD mixing quotas, query-
    string stripping before canonicalization). URLs are synthesized
    deterministically from (source, doc_id, lang) since the corpus holds
    no native URLs; the oracle PARSES them back with anchored regexes
    rather than reassembling, so both engines must agree on the
    decomposition semantics, not on the template.

    Scale shape: pure scan-local JVM string expressions — parse_url is a
    codegen'd built-in, no UDF, no shuffle; the doc_id predicate reaches
    the parquet scan as a pushed filter."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    u = docs.select(
        "doc_id",
        F.concat(
            F.lit("https://"), F.col("source"), F.lit(".example.com/docs/"),
            F.col("doc_id").cast("string"), F.lit("?lang="), F.col("lang"),
            F.lit("&v=2"),
        ).alias("url"),
    )
    return u.select(
        "doc_id", "url",
        F.lower(F.parse_url("url", F.lit("PROTOCOL"))).alias("proto"),
        F.parse_url("url", F.lit("HOST")).alias("host"),
        F.parse_url("url", F.lit("PATH")).alias("path"),
        F.parse_url("url", F.lit("QUERY")).alias("query"),
        F.parse_url("url", F.lit("QUERY"), F.lit("lang")).alias("q_lang"),
    )

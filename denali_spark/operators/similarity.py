"""Similarity search over the ``embeddings`` table (array<float>, dim 64).

Two paths, mirroring how a production vector pipeline is built:

- ``sim_topk_bruteforce``: exact cosine top-k — the small-query-set baseline
  and the correctness oracle for approximate variants.
- ``sim_lsh_bucket_topk``: random-hyperplane LSH bucketing — the scale path.
  Buckets are computed scan-side from deterministic integer-arithmetic
  hyperplanes (portable to the SQL oracle), then search is confined to the
  probe's bucket.

All vector math is JVM-side higher-order functions (zip_with/aggregate) in
double precision — bit-identical to the DuckDB oracle's list_sum fold and
independent of row order or partitioning.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from denali_spark.engine.tables import load_table
from denali_spark.operators.dedup import SQL_DOT, SQL_NORM, dot_cols
from denali_spark.operators.registry import query

DIM = 64
N_PLANES = 8


def _vecs(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("e")
    )


def cosine(ea: Column, eb: Column) -> Column:
    return dot_cols(ea, eb) / (
        F.sqrt(dot_cols(ea, ea)) * F.sqrt(dot_cols(eb, eb))
    )


SQL_COSINE = (
    SQL_DOT.format(a="{a}", b="{b}")
    + " / (" + SQL_NORM.format(a="{a}") + " * " + SQL_NORM.format(a="{b}") + ")"
)


@query(
    "sim_topk_bruteforce",
    oracle=f"""
    WITH v AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
      FROM embeddings
    ),
    q AS (SELECT * FROM v WHERE vec_id < 5),
    scored AS (
      SELECT q.vec_id AS query_id, v.vec_id AS neighbor_id,
             {SQL_COSINE.format(a='q.e', b='v.e')} AS cos
      FROM q JOIN v ON q.vec_id <> v.vec_id
    ),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rn
      FROM scored
    )
    SELECT query_id, neighbor_id, cos, CAST(rn AS BIGINT) AS rn
    FROM ranked WHERE rn <= 5
    """,
    tags=("similarity", "ann", "bruteforce"),
)
def sim_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-5 for a probe set (vec_id < 5): broadcast the probes
    against the corpus scan — one pass over the data, per-query top-k via
    window (k rows per query survive the shuffle)."""
    v = _vecs(spark, sf_dir)
    q = v.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("e").alias("qe")
    )
    scored = (
        v.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            cosine(F.col("qe"), F.col("e")).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), "neighbor_id")
    return (
        scored.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= 5)
        .select("query_id", "neighbor_id", "cos", "rn")
    )


# --- random-hyperplane LSH ------------------------------------------------
#
# OR-amplified multi-table LSH (the standard recall construction): N_TABLES
# independent hash tables of N_PLANES sign-bits each; a vector is a
# candidate if it collides with the probe in ANY table. AND within a table
# (all 8 bits must match → high precision), OR across tables (recall
# 1-(1-p^b)^T instead of p^b). Plane weights are pseudo-random ±1 from pure
# integer arithmetic so both engines derive the identical planes:
# w(g, k) = +1 iff (k * 2654435761 + g * 40503) mod 97 < 48, where
# g = table * N_PLANES + plane is the global plane index.

N_TABLES = 4
# geometry fingerprint component; the file-count suffix (f<N>) is appended
# per-corpus in lsh_bucket_index so a layout change rebuilds the cache
LSH_GEOMETRY = f"T{N_TABLES}P{N_PLANES}"


def lsh_planes(sf_dir: str) -> int:
    """Corpus-adaptive SRP plane count: p = max(N_PLANES, ceil(log2(n/8))),
    capped at 24. The bucket self-join consumers (near-dup pairs, the
    kNN-graph queries) do Σ load² work per table — quadratic in bucket
    DENSITY at fixed geometry — so the plane count must grow with the
    corpus to hold expected load ~8 and make that work LINEAR in n
    (≈ probes · T · n · load). Measured before/after at the derived-sf1
    10× corpus: sim_hard_negatives 94.3s → single-digit seconds.

    Every oracle scale (sf0.001/0.01/0.1 — ≤ 2k vectors) resolves to
    exactly N_PLANES, so the static SQL oracles (which bake 8 planes)
    stay bit-faithful where the driver compares; larger corpora trade a
    documented slice of per-table collision recall (multi-probe and the
    OR over tables claw most of it back) for bounded bucket load — the
    same deal every production ANN system makes when it sizes nlist/
    nbits to the corpus. Folded into the index geometry key, so a plane
    change REBUILDS the cache rather than mixing layouts."""
    import math

    from denali_spark.engine.index_cache import corpus_rows

    n = corpus_rows(sf_dir, "embeddings")
    return max(N_PLANES, min(24, math.ceil(math.log2(max(n, 2) / 8))))


def lsh_geometry(sf_dir: str) -> str:
    """The corpus-resolved geometry fingerprint component."""
    return f"T{N_TABLES}P{lsh_planes(sf_dir)}"


def _bucket_col(e: Column, table: int = 0, planes: int = N_PLANES) -> Column:
    # One generic nested fold instead of Python-unrolled per-plane trees.
    # The plane loop is the OUTER aggregate over the global plane index g
    # (bit value shiftleft(1, g-base)); each plane's signed-random-
    # projection dot is the INNER aggregate over the vector dimension k.
    # Arithmetic and fold order are identical to the old unrolled form
    # (same left-fold over k with a 0.0 double seed, same integer bit
    # sum), so buckets are bit-identical and cached indexes stay valid —
    # but the Catalyst tree is O(1) in plane count instead of O(planes),
    # which cuts the DRIVER-side analysis cost ~8x per query build
    # (measured: the probe-hash relation of sim_lsh_search_probe spends
    # ~95% of its wall time in analysis, 1.8-2.4s rebuild vs 0.09s
    # re-count of the same DataFrame object at sf0.1).
    # The dot is computed inline in the outer lambda exactly ONCE per
    # plane: binding it via a transform() column first would re-evaluate
    # the whole dots array per outer element (inline HOF arguments are
    # re-evaluated per element — the 9x text_decontaminate lesson).
    # Earlier measured alternatives still hold for the inner fold: it
    # beats zip_with-with-literal-weights (~1.5x) and fully unrolled
    # 64-term addition (~7x — codegen method-limit fallback).
    base = table * planes
    return F.aggregate(
        F.sequence(F.lit(base), F.lit(base + planes - 1)).cast("array<long>"),
        F.lit(0).cast("long"),
        lambda acc, g: acc
        + F.when(
            F.aggregate(
                F.sequence(F.lit(0), F.lit(DIM - 1)).cast("array<long>"),
                F.lit(0.0),
                lambda a, k: a
                + F.element_at(e, (k + 1).cast("int"))
                * F.when(
                    (k * F.lit(2654435761) + g * F.lit(40503)) % 97 < 48,
                    F.lit(1.0),
                ).otherwise(F.lit(-1.0)),
            )
            >= 0,
            F.call_function(
                "shiftleft", F.lit(1), (g - F.lit(base)).cast("int")
            ).cast("long"),
        ).otherwise(F.lit(0).cast("long")),
    )


def _sql_plane_dot(e: str, g: int) -> str:
    return (
        f"list_sum(list_transform(range(0, {DIM}), k -> {e}[k + 1] *"
        f" CASE WHEN (k * 2654435761 + {g * 40503}) % 97 < 48 THEN 1.0 ELSE -1.0 END))"
    )


def _sql_bucket(e: str, table: int = 0) -> str:
    terms = " + ".join(
        f"(CASE WHEN {_sql_plane_dot(e, table * N_PLANES + p)} >= 0 THEN {1 << p} ELSE 0 END)"
        for p in range(N_PLANES)
    )
    return f"CAST({terms} AS BIGINT)"


def _sql_tables(e: str = "e") -> str:
    """UNION ALL of per-table bucket assignments (vec_id, t, bucket)."""
    return " UNION ALL ".join(
        f"SELECT vec_id, {t} AS t, {_sql_bucket(e, t)} AS bucket FROM v"
        for t in range(N_TABLES)
    )


def bucket_assignments(v: DataFrame, planes: int = N_PLANES) -> DataFrame:
    """(vec_id, e array<double>) → (vec_id, t, bucket) across all
    N_TABLES hash tables — the row shape of the materialized bucket
    index. Shared by the ingest-time index build, the query-time probe
    hashing, and the streaming ingest sink so every path derives the
    identical buckets."""
    tb = F.explode(
        F.array(*[
            F.struct(
                F.lit(t).alias("t"),
                _bucket_col(F.col("e"), t, planes).alias("bucket"),
            )
            for t in range(N_TABLES)
        ])
    )
    return v.select("vec_id", tb.alias("tb")).select("vec_id", "tb.t", "tb.bucket")


def lsh_bucket_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The materialized LSH bucket index: the (vec_id, t, bucket) relation,
    hashed ONCE per corpus and persisted as parquet, then only *read* by
    queries. This is the ingest-time index of a production vector pipeline —
    at 100 TB you pay the 32-plane hashing during the embedding write (or a
    one-off backfill), not per query; the index is ~3 longs/table/vector,
    orders of magnitude smaller than the embeddings themselves.

    Cache discipline (per-user root, fingerprint invalidation by corpus
    identity + LSH geometry, atomic rename, hard _SUCCESS gate):
    engine.index_cache."""
    import os

    from denali_spark.engine.index_cache import (
        cache_root,
        corpus_fingerprint,
        corpus_rows,
        index_file_count,
        materialize_parquet,
        widen_build_input,
    )

    n_files = index_file_count(sf_dir, "embeddings")
    key = corpus_fingerprint(sf_dir, "embeddings", f"{lsh_geometry(sf_dir)}f{n_files}")
    path = os.path.join(cache_root("sim"), f"buckets-{key}")

    def _build() -> DataFrame:
        # widen the byte-tiny embeddings scan before the 32-plane hashing
        # (pure per-row map — bucket values identical; r16, see
        # widen_build_input)
        v = widen_build_input(
            _vecs(spark, sf_dir), corpus_rows(sf_dir, "embeddings")
        )
        return bucket_assignments(v, lsh_planes(sf_dir))

    # Corpus-size-scaled file count hashed on (t, bucket): probe joins
    # against the index read back that many ways parallel instead of
    # single-partition (the f<N> key component rebuilds stale layouts).
    return materialize_parquet(
        spark, path, _build, num_files=n_files, distribute_by=("t", "bucket")
    )


# Shared CTE prefix: the full LSH top-k pipeline (index, Hamming-1
# multi-probe, candidates, exact rerank) for the vec_id < 5 probe set.
# Reused by sim_lsh_bucket_topk and the recall audit against brute force.
_SQL_LSH_TOPK_CTES = f"""
    WITH v AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
      FROM embeddings
    ),
    b AS ({_sql_tables('e')}),
    qb AS (
      SELECT DISTINCT p.query_id, p.t,
             xor(p.bucket, CASE WHEN fl.f = -1 THEN 0 ELSE (1 << fl.f) END) AS bucket
      FROM (SELECT vec_id AS query_id, t, bucket FROM b WHERE vec_id < 5) p
      CROSS JOIN (SELECT unnest(range(-1, {N_PLANES})) AS f) fl
    ),
    cand AS (
      SELECT DISTINCT qb.query_id, b.vec_id AS neighbor_id
      FROM qb JOIN b ON qb.t = b.t AND qb.bucket = b.bucket
      WHERE qb.query_id <> b.vec_id
    ),
    scored AS (
      SELECT c.query_id, c.neighbor_id,
             {SQL_COSINE.format(a='qv.e', b='nv.e')} AS cos
      FROM cand c
      JOIN v qv ON qv.vec_id = c.query_id
      JOIN v nv ON nv.vec_id = c.neighbor_id
    ),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rn
      FROM scored
    )
"""


@query(
    "sim_lsh_bucket_topk",
    oracle=_SQL_LSH_TOPK_CTES
    + """
    SELECT query_id, neighbor_id, cos, CAST(rn AS BIGINT) AS rn
    FROM ranked WHERE rn <= 5
    """,
    tags=("similarity", "ann", "lsh"),
)
def sim_lsh_bucket_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-5 via OR-amplified, multi-probe random-hyperplane
    LSH ({N_TABLES} tables × {N_PLANES} sign-bits): a corpus vector is a
    candidate if it lands in the probe's bucket — or any bucket one bit-flip
    away — in ANY table; exact cosine re-ranks the deduplicated candidates.

    Scale shape: hashing is paid once at ingest (`lsh_bucket_index` — the
    query path only READS the materialized index); candidate generation is
    an equi-join on (table, bucket) with the probe side broadcast —
    multi-probe expands only that tiny probe side ((1+bits)× rows), never
    the corpus. Candidate pairs — not vectors — are deduplicated before the
    rerank joins fetch vectors, so the T-way expansion never duplicates
    embedding payloads. Recall is tuned by tables (OR) × planes (AND) ×
    probes without changing the plan; tests/test_similarity_recall.py
    grades it against the exact baseline."""
    v = _vecs(spark, sf_dir)
    b = lsh_bucket_index(spark, sf_dir)
    # Multi-probe: each probe also searches the N_PLANES buckets at Hamming
    # distance 1 (flip = -1 keeps the exact bucket).
    flips = F.explode(F.array(*[F.lit(x) for x in range(-1, lsh_planes(sf_dir))]))
    qb = (
        b.filter(F.col("vec_id") < 5)
        .select(F.col("vec_id").alias("query_id"), "t", "bucket")
        .withColumn("flip", flips)
        .select(
            "query_id",
            "t",
            F.col("bucket").bitwiseXOR(
                F.when(F.col("flip") < 0, F.lit(0))
                .otherwise(F.expr("shiftleft(1, flip)"))
            ).alias("bucket"),
        )
        .distinct()
    )
    cand = (
        b.join(F.broadcast(qb), ["t", "bucket"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", F.col("vec_id").alias("neighbor_id"))
        .distinct()
    )
    qv = v.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("e").alias("qe")
    )
    scored = (
        cand.join(v, cand["neighbor_id"] == v["vec_id"])
        .join(F.broadcast(qv), "query_id")
        .select("query_id", "neighbor_id", cosine(F.col("qe"), F.col("e")).alias("cos"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), "neighbor_id")
    return (
        scored.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= 5)
        .select("query_id", "neighbor_id", "cos", "rn")
    )


@query(
    "sim_ann_recall_audit",
    oracle=_SQL_LSH_TOPK_CTES
    + f"""
    , lsh AS (SELECT query_id, neighbor_id FROM ranked WHERE rn <= 5),
    bf_ranked AS (
      SELECT q.vec_id AS query_id, v2.vec_id AS neighbor_id,
             ROW_NUMBER() OVER (
               PARTITION BY q.vec_id
               ORDER BY {SQL_COSINE.format(a='q.e', b='v2.e')} DESC, v2.vec_id
             ) AS rn
      FROM (SELECT * FROM v WHERE vec_id < 5) q
      JOIN v v2 ON q.vec_id <> v2.vec_id
    ),
    bf AS (SELECT query_id, neighbor_id FROM bf_ranked WHERE rn <= 5)
    SELECT bf.query_id,
           CAST(COUNT(lsh.neighbor_id) AS BIGINT) AS n_hits,
           CAST(COUNT(lsh.neighbor_id) AS DOUBLE) / 5.0 AS recall_at_5
    FROM bf LEFT JOIN lsh
      ON bf.query_id = lsh.query_id AND bf.neighbor_id = lsh.neighbor_id
    GROUP BY bf.query_id
    """,
    tags=("similarity", "ann", "lsh", "audit"),
)
def sim_ann_recall_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Index-health audit: recall@5 of the LSH bucket search against the
    exact brute-force top-5, per probe — the number a production vector
    pipeline tracks to decide when the index geometry (tables/planes)
    needs retuning. Both sides are the registry's own queries, so the
    audit composes their plans: the LSH side reads the materialized
    bucket index, the brute-force side is the 5-probe broadcast pass;
    the comparison is a small left join + rollup over k x |probes| rows.
    At 100 TB this runs the audit on a sampled probe set — cost is the
    LSH search plus ONE linear scan for the sampled ground truth, never
    all-pairs."""
    lsh = sim_lsh_bucket_topk(spark, sf_dir).select(
        "query_id", "neighbor_id", F.lit(1).alias("hit")
    )
    bf = sim_topk_bruteforce(spark, sf_dir).select("query_id", "neighbor_id")
    return (
        bf.join(lsh, ["query_id", "neighbor_id"], "left")
        .groupBy("query_id")
        .agg(F.count("hit").cast("long").alias("n_hits"))
        .select(
            "query_id", "n_hits",
            (F.col("n_hits").cast("double") / F.lit(5.0)).alias("recall_at_5"),
        )
    )


def sim_lsh_search(
    spark: SparkSession, sf_dir: str, probes: DataFrame, k: int = 5,
    extra_buckets: DataFrame | None = None,
    extra_vecs: DataFrame | None = None,
    base_buckets: DataFrame | None = None,
    base_vecs: DataFrame | None = None,
) -> DataFrame:
    """ANN top-k for EXTERNAL probe vectors over the materialized bucket
    index — the query-time path of a real pipeline: embed a query, hash it
    into each table's bucket (plus Hamming-1 multi-probe), search only
    those buckets, exact-rerank. `probes` needs (query_id long, e
    array<double>) of dimension {DIM}.

    `extra_buckets`/`extra_vecs` graft LATE-ARRIVING vectors into the
    search without rebuilding the immutable base index: the streaming
    ingest sink (streaming/embeddings_stream.py) hashes each micro-batch
    into the same (vec_id, t, bucket) layout, and searches union it in —
    the base index stays fingerprint-stable while the searchable corpus
    grows. `base_buckets`/`base_vecs` REPLACE the corpus-derived base
    index entirely — the read path of a folded generation
    (streaming.embeddings_stream.fold_streamed_index), which already
    contains the base plus every folded micro-batch.

    Scale shape: the corpus side is the pre-built index + one vector fetch
    join; only the (tiny) probe relation pays hashing at query time and it
    broadcasts into both joins. Returns (query_id, neighbor_id, cos, rn)."""
    v = base_vecs if base_vecs is not None else _vecs(spark, sf_dir)
    b = (
        base_buckets if base_buckets is not None
        else lsh_bucket_index(spark, sf_dir)
    )
    if extra_buckets is not None:
        b = b.unionByName(extra_buckets)
    if extra_vecs is not None:
        v = v.unionByName(extra_vecs)
    tb = F.explode(
        F.array(*[
            F.struct(
                F.lit(t).alias("t"),
                _bucket_col(F.col("e"), t, lsh_planes(sf_dir)).alias("bucket"),
            )
            for t in range(N_TABLES)
        ])
    )
    flips = F.explode(F.array(*[F.lit(x) for x in range(-1, lsh_planes(sf_dir))]))
    qb = (
        probes.select("query_id", tb.alias("tb"))
        .select("query_id", "tb.t", "tb.bucket")
        .withColumn("flip", flips)
        .select(
            "query_id",
            "t",
            F.col("bucket").bitwiseXOR(
                F.when(F.col("flip") < 0, F.lit(0))
                .otherwise(F.expr("shiftleft(1, flip)"))
            ).alias("bucket"),
        )
        # no distinct: the 9 XOR masks are distinct by construction, so
        # (query_id, t, bucket) is already unique (same argument as the
        # index-side expansion in dedup_embedding_lsh_pairs); the pair-level
        # distinct below dedupes across tables/flips.
    )
    cand = (
        b.join(F.broadcast(qb), ["t", "bucket"])
        .select("query_id", F.col("vec_id").alias("neighbor_id"))
        .distinct()
    )
    qv = probes.select("query_id", F.col("e").alias("qe"))
    scored = (
        cand.join(v, cand["neighbor_id"] == v["vec_id"])
        .join(F.broadcast(qv), "query_id")
        .select("query_id", "neighbor_id", cosine(F.col("qe"), F.col("e")).alias("cos"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), "neighbor_id")
    return (
        scored.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "cos", "rn")
    )


RANGE_TAU = 0.3   # cosine radius
RANGE_PROBES = 8  # probe set: vec_id < 8


@query(
    "sim_lsh_range_search",
    oracle=f"""
    WITH v AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
      FROM embeddings
    ),
    b AS ({_sql_tables('e')}),
    qb AS (
      SELECT DISTINCT p.query_id, p.t,
             xor(p.bucket, CASE WHEN fl.f = -1 THEN 0 ELSE (1 << fl.f) END) AS bucket
      FROM (SELECT vec_id AS query_id, t, bucket FROM b WHERE vec_id < {RANGE_PROBES}) p
      CROSS JOIN (SELECT unnest(range(-1, {N_PLANES})) AS f) fl
    ),
    cand AS (
      SELECT DISTINCT qb.query_id, b.vec_id AS neighbor_id
      FROM qb JOIN b ON qb.t = b.t AND qb.bucket = b.bucket
      WHERE qb.query_id <> b.vec_id
    )
    SELECT query_id, neighbor_id, cos FROM (
      SELECT c.query_id, c.neighbor_id,
             {SQL_COSINE.format(a='qv.e', b='nv.e')} AS cos
      FROM cand c
      JOIN v qv ON qv.vec_id = c.query_id
      JOIN v nv ON nv.vec_id = c.neighbor_id
    ) WHERE cos >= {RANGE_TAU}
    """,
    tags=("similarity", "ann", "lsh", "range"),
)
def sim_lsh_range_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range search (ALL neighbors within a cosine radius, not top-k) over
    the materialized LSH bucket index — the retrieval shape behind
    "find every document similar enough to this one" dedup/expansion
    passes, where the result cardinality is data-dependent rather than
    fixed at k.

    Same candidate machinery as `sim_lsh_bucket_topk` (ingest-time bucket
    index, Hamming-1 multi-probe, broadcast probe side, pair-level
    distinct before the vector-fetch joins); the only difference is the
    final operator — a threshold filter instead of a per-query window.
    That drops the rank shuffle entirely: the plan is scan → broadcast
    equi-join → distinct → two fetch joins → filter, so at 100 TB the
    cost is still bucket co-occupancy, and no single-query skew can
    concentrate on one reducer the way a dense top-k partition can."""
    v = _vecs(spark, sf_dir)
    b = lsh_bucket_index(spark, sf_dir)
    flips = F.explode(F.array(*[F.lit(x) for x in range(-1, lsh_planes(sf_dir))]))
    qb = (
        b.filter(F.col("vec_id") < RANGE_PROBES)
        .select(F.col("vec_id").alias("query_id"), "t", "bucket")
        .withColumn("flip", flips)
        .select(
            "query_id",
            "t",
            F.col("bucket").bitwiseXOR(
                F.when(F.col("flip") < 0, F.lit(0))
                .otherwise(F.expr("shiftleft(1, flip)"))
            ).alias("bucket"),
        )
        .distinct()
    )
    cand = (
        b.join(F.broadcast(qb), ["t", "bucket"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", F.col("vec_id").alias("neighbor_id"))
        .distinct()
    )
    qv = v.filter(F.col("vec_id") < RANGE_PROBES).select(
        F.col("vec_id").alias("query_id"), F.col("e").alias("qe")
    )
    return (
        cand.join(v, cand["neighbor_id"] == v["vec_id"])
        .join(F.broadcast(qv), "query_id")
        .select(
            "query_id", "neighbor_id", cosine(F.col("qe"), F.col("e")).alias("cos")
        )
        .filter(F.col("cos") >= RANGE_TAU)
    )


# --- IVF (inverted-file) ANN ---------------------------------------------
#
# The classic two-level vector index: a coarse quantizer assigns every
# vector to its nearest centroid (the "inverted lists"); a query probes
# only the nprobe nearest lists and exact-reranks inside them. Here the
# coarse centroids are a deterministic stride sample (vec_id % STRIDE = 0)
# so the whole query is SQL-expressible and oracle-checked; `ivf_train`
# below is the production path that refines centroids with Lloyd
# iterations before the same assignment/search shape.

IVF_STRIDE = 97  # ~n/97 coarse centroids
IVF_NPROBE = 2


def _centroids(v: DataFrame) -> DataFrame:
    return v.filter(F.col("vec_id") % IVF_STRIDE == 0).select(
        F.col("vec_id").alias("cid"), F.col("e").alias("ce")
    )


def ivf_inverted_lists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The materialized IVF inverted lists: every corpus vector stored WITH
    its nearest-centroid assignment, parquet-partitioned BY `cid` — the
    actual on-disk layout of an IVF index (FAISS's list files; here,
    directory partitions). Built once per corpus; a query then reads only
    its nprobe lists — Spark prunes the cid partitions, so the scan cost is
    nprobe/k of the corpus, which is the entire point of IVF at 100 TB.

    Cache discipline (per-user root, fingerprint invalidation by corpus
    identity + stride, atomic rename, hard _SUCCESS gate):
    engine.index_cache."""
    import os

    from denali_spark.engine.index_cache import (
        cache_root,
        corpus_fingerprint,
        corpus_rows,
        materialize_parquet,
        widen_build_input,
    )

    key = corpus_fingerprint(sf_dir, "embeddings", f"S{IVF_STRIDE}")
    path = os.path.join(cache_root("ivf"), f"lists-{key}")

    def _build() -> DataFrame:
        # widen the byte-tiny embeddings scan before the centroid
        # cross-score (per-row map into a broadcast crossJoin; the
        # row_number tie-break orders by (desc cosine, cid) — fully
        # deterministic, so assignments are partitioning-independent)
        v = widen_build_input(
            _vecs(spark, sf_dir), corpus_rows(sf_dir, "embeddings")
        )
        arn_w = Window.partitionBy("vec_id").orderBy(
            F.desc(cosine(F.col("e"), F.col("ce"))), "cid"
        )
        return (
            v.crossJoin(F.broadcast(_centroids(v)))
            .withColumn("arn", F.row_number().over(arn_w))
            .filter(F.col("arn") == 1)
            .select("vec_id", "e", "cid")
        )

    return materialize_parquet(spark, path, _build, partition_by="cid")


@query(
    "sim_ivf_topk",
    oracle=f"""
    WITH v AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
      FROM embeddings
    ),
    cent AS (SELECT vec_id AS cid, e AS ce FROM v WHERE vec_id % {IVF_STRIDE} = 0),
    assign_scored AS (
      SELECT v.vec_id, v.e, cent.cid,
             ROW_NUMBER() OVER (
               PARTITION BY v.vec_id
               ORDER BY {SQL_COSINE.format(a='v.e', b='cent.ce')} DESC, cent.cid
             ) AS arn
      FROM v CROSS JOIN cent
    ),
    assigned AS (SELECT vec_id, e, cid FROM assign_scored WHERE arn = 1),
    probes AS (
      SELECT vec_id AS query_id, e AS qe, cid
      FROM assign_scored WHERE vec_id < 5 AND arn <= {IVF_NPROBE}
    ),
    scored AS (
      SELECT p.query_id, a.vec_id AS neighbor_id,
             {SQL_COSINE.format(a='p.qe', b='a.e')} AS cos
      FROM probes p JOIN assigned a ON p.cid = a.cid AND p.query_id <> a.vec_id
    ),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rn
      FROM scored
    )
    SELECT query_id, neighbor_id, cos, CAST(rn AS BIGINT) AS rn
    FROM ranked WHERE rn <= 5
    """,
    tags=("similarity", "ann", "ivf"),
)
def sim_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-5 via IVF: corpus vectors live in materialized
    inverted lists (`ivf_inverted_lists` — assignment paid once at ingest,
    stored partitioned by centroid); a query scores only the tiny probe
    relation against the centroids (|probes| × k, broadcast) to pick its
    {IVF_NPROBE} lists, then exact-reranks inside them.

    Scale shape: the inverted lists ARE a partitioning of the corpus —
    queries touch nprobe/k of the data via partition pruning; nothing here
    is all-pairs."""
    v = _vecs(spark, sf_dir)
    assigned = ivf_inverted_lists(spark, sf_dir)
    arn_w = Window.partitionBy("vec_id").orderBy(
        F.desc(cosine(F.col("e"), F.col("ce"))), "cid"
    )
    probes = (
        v.filter(F.col("vec_id") < 5)
        .crossJoin(F.broadcast(_centroids(v)))
        .withColumn("arn", F.row_number().over(arn_w))
        .filter(F.col("arn") <= IVF_NPROBE)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("e").alias("qe"),
            F.col("cid").alias("pcid"),
        )
    )
    scored = assigned.join(
        F.broadcast(probes),
        (F.col("cid") == F.col("pcid")) & (F.col("vec_id") != F.col("query_id")),
    ).select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        cosine(F.col("qe"), F.col("e")).alias("cos"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), "neighbor_id")
    return (
        scored.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= 5)
        .select("query_id", "neighbor_id", "cos", "rn")
    )


def ivf_train(
    df: DataFrame, k: int = 16, iters: int = 5, sample: int = 4096
) -> list[list[float]]:
    """Train IVF coarse centroids: Lloyd k-means on a deterministic sample,
    driver-side numpy. This is the FAISS recipe — training cost is
    O(sample × k × iters) and INDEPENDENT of corpus size; the full corpus
    is only ever touched by the single distributed assignment pass
    (`ivf_assign`). df must have columns (vec_id, e: array<double>)."""
    import numpy as np

    pdf = df.orderBy("vec_id").limit(sample).toPandas()
    X = np.array(pdf["e"].tolist(), dtype=np.float64)
    n = len(X)
    cent = X[:: max(1, n // k)][:k].copy()
    for _ in range(iters):
        # cosine assignment == euclidean on normalized vectors
        xn = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
        cn = cent / np.maximum(np.linalg.norm(cent, axis=1, keepdims=True), 1e-12)
        labels = (xn @ cn.T).argmax(axis=1)
        for j in range(len(cent)):
            members = X[labels == j]
            if len(members):
                cent[j] = members.mean(axis=0)
    return cent.tolist()


def ivf_assign(df: DataFrame, centroids: list[list[float]]) -> DataFrame:
    """Distributed assignment pass: tag every row with the id of its
    nearest (cosine) centroid. Centroids ship as a plan literal (they are
    k×dim doubles — bytes, not data), so the n×k scoring runs inside
    whole-stage codegen with no shuffle; writing the result partitioned by
    `cid` materializes the inverted lists."""
    cent_arr = F.array(*[
        F.array(*[F.lit(float(x)) for x in c]) for c in centroids
    ])
    # argmax over k cosine scores via aggregate carrying (best_id, best_cos)
    scored = F.transform(cent_arr, lambda c: cosine(F.col("e"), c))
    best = F.aggregate(
        F.sequence(F.lit(0), F.lit(len(centroids) - 1)),
        F.struct(F.lit(-1).alias("cid"), F.lit(-2.0).alias("cos")),
        lambda acc, i: F.when(
            F.element_at(F.col("__ivf_scores"), i.cast("int") + 1) > acc["cos"],
            F.struct(
                i.cast("int").alias("cid"),
                F.element_at(F.col("__ivf_scores"), i.cast("int") + 1).alias("cos"),
            ),
        ).otherwise(acc),
    )
    return (
        df.withColumn("__ivf_scores", scored)
        .withColumn("cid", best["cid"])
        .drop("__ivf_scores")
    )


@query(
    "sim_norms_stats",
    oracle=f"""
    WITH v AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e, label
      FROM embeddings
    )
    SELECT label, COUNT(*) AS n,
           MIN({SQL_NORM.format(a='e')}) AS min_norm,
           MAX({SQL_NORM.format(a='e')}) AS max_norm
    FROM v GROUP BY label ORDER BY label
    """,
    tags=("similarity", "vector-stats"),
)
def sim_norms_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label vector-norm profile — the sanity scan a pipeline runs before
    trusting cosine distances (catches zero/unnormalized vectors)."""
    emb = load_table(spark, sf_dir, "embeddings")
    v = emb.select(
        "vec_id",
        "label",
        F.transform("embedding", lambda x: x.cast("double")).alias("e"),
    )
    norm = F.sqrt(dot_cols(F.col("e"), F.col("e")))
    return (
        v.select("label", norm.alias("norm"))
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("norm").alias("min_norm"),
            F.max("norm").alias("max_norm"),
        )
        .orderBy("label")
    )


# --- embedding near-dup (the scale paths over the same indexes) -----------
#
# `dedup.dedup_embedding_pairs` is the exact all-pairs baseline, fenced at
# QUADRATIC_MAX_ROWS because O(n^2) is a scale-killer. These two are the
# production alternatives, and both deliberately REUSE the ingest-time
# indexes already materialized for ANN search — one index, two workloads
# (search and dedup), which is the economics a 100 TB pipeline wants:
#
# - `dedup_embedding_lsh_pairs`: candidates = pairs co-located in a bucket
#   (or one bit-flip apart) of the SRP bucket index in ANY table; exact
#   cosine verifies. Work scales with bucket co-occupancy, not n^2; at real
#   scale planes grow ~log2(n) to hold bucket sizes constant.
# - `sem_dedup_pairs`: SemDeDup (Abbas et al., 2023, arXiv:2303.09540) —
#   confine the pairwise pass to IVF cells (k-means clusters), O(sum
#   cell^2) ~= n^2/K. Reads the cid-partitioned inverted lists, so each
#   cell's pairs compute inside one partition subtree.

DEDUP_COS_TAU = 0.3


def embedding_online_dedup(
    spark: SparkSession, sf_dir: str, vecs: DataFrame,
    tau: float = DEDUP_COS_TAU, *,
    corpus_buckets: DataFrame | None = None,
    corpus_vecs: DataFrame | None = None,
    self_dedup: bool = True,
    base_buckets: DataFrame | None = None,
    base_vecs: DataFrame | None = None,
) -> DataFrame:
    """Flag each incoming vector as semantic-duplicate-of-corpus or novel —
    the embedding-side twin of `dedup.online_dedup` and the per-batch
    kernel of `streaming.embeddings_stream.make_embedding_dedup_sink`.
    `vecs` needs (vec_id long, e array<double>).

    Candidates come from SRP bucket co-occupancy against the materialized
    base index (plus `corpus_buckets`/`corpus_vecs` — the grown streamed
    store) and, with `self_dedup`, against lower-id vectors of the same
    batch; verification is exact cosine >= tau. Returns one verdict row
    per vector: (vec_id, is_duplicate, dup_of, cos) with dup_of the
    best-matching source (highest cosine, lowest id on ties).

    Scale shape: only the (micro-batch-sized) incoming side pays hashing
    and broadcasts into the bucket join; the corpus side is the pre-built
    index + one vector-fetch equi-join, so each batch costs bucket
    co-occupancy, never |corpus| x |batch|."""
    # base_buckets/base_vecs REPLACE the corpus-derived base index — the
    # folded-generation read path (it already contains base + every
    # folded micro-batch); corpus_buckets/corpus_vecs remain ADDITIVE
    # (the not-yet-folded streamed store).
    base_b = (
        base_buckets if base_buckets is not None
        else lsh_bucket_index(spark, sf_dir)
    )
    base_v = base_vecs if base_vecs is not None else _vecs(spark, sf_dir)
    if corpus_buckets is not None:
        base_b = base_b.unionByName(corpus_buckets)
    if corpus_vecs is not None:
        base_v = base_v.unionByName(corpus_vecs)
    nb = bucket_assignments(vecs, lsh_planes(sf_dir))
    cand = (
        base_b.join(
            F.broadcast(nb.withColumnRenamed("vec_id", "new_id")),
            ["t", "bucket"],
        )
        .select("new_id", F.col("vec_id").alias("src"))
        .filter(F.col("src") != F.col("new_id"))
        .distinct()
    )
    new_v = vecs.select(
        F.col("vec_id").alias("new_id"), F.col("e").alias("ne")
    )
    scored = (
        cand.join(base_v, cand["src"] == base_v["vec_id"])
        .join(F.broadcast(new_v), "new_id")
        .select("new_id", "src", cosine(F.col("ne"), F.col("e")).alias("cos"))
    )
    if self_dedup:
        # intra-batch: a vector near-matching a LOWER-id batch mate is a
        # duplicate even if the corpus never saw either copy
        intra_cand = (
            nb.select(F.col("vec_id").alias("new_id"), "t", "bucket")
            .join(
                F.broadcast(nb.select(F.col("vec_id").alias("src"), "t", "bucket")),
                ["t", "bucket"],
            )
            .filter(F.col("src") < F.col("new_id"))
            .select("new_id", "src")
            .distinct()
        )
        src_v = vecs.select(F.col("vec_id").alias("src"), F.col("e").alias("se"))
        intra = (
            intra_cand.join(F.broadcast(src_v), "src")
            .join(F.broadcast(new_v), "new_id")
            .select(
                "new_id", "src", cosine(F.col("ne"), F.col("se")).alias("cos")
            )
        )
        scored = scored.unionByName(intra)
    best = (
        scored.filter(F.col("cos") >= tau)
        .groupBy("new_id")
        .agg(
            F.max(
                F.struct(F.col("cos"), (-F.col("src")).alias("neg_id"))
            ).alias("m")
        )
    )
    return vecs.join(best, vecs["vec_id"] == best["new_id"], "left").select(
        "vec_id",
        F.col("m").isNotNull().alias("is_duplicate"),
        (-F.col("m.neg_id")).cast("long").alias("dup_of"),
        F.col("m.cos").alias("cos"),
    )


@query(
    "dedup_embedding_lsh_pairs",
    oracle=f"""
    WITH v AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
      FROM embeddings
    ),
    b AS ({_sql_tables('e')}),
    ab AS (
      SELECT DISTINCT vec_id, t,
             xor(bucket, CASE WHEN fl.f = -1 THEN 0 ELSE (1 << fl.f) END) AS bucket
      FROM b CROSS JOIN (SELECT unnest(range(-1, {N_PLANES})) AS f) fl
    ),
    cand AS (
      SELECT DISTINCT ab.vec_id AS i, b.vec_id AS j
      FROM ab JOIN b ON ab.t = b.t AND ab.bucket = b.bucket AND ab.vec_id < b.vec_id
    )
    SELECT c.i, c.j, {SQL_COSINE.format(a='x.e', b='y.e')} AS cos
    FROM cand c JOIN v x ON x.vec_id = c.i JOIN v y ON y.vec_id = c.j
    WHERE {SQL_COSINE.format(a='x.e', b='y.e')} >= {DEDUP_COS_TAU}
    """,
    tags=("dedup", "embedding", "lsh"),
)
def dedup_embedding_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup pairs via the materialized SRP bucket index:
    a pair is a candidate iff the two vectors share a bucket — or sit one
    bit-flip apart (Hamming-1 multi-probe, same amplification as the ANN
    path) — in ANY of the {N_TABLES} tables; exact cosine >= {DEDUP_COS_TAU}
    verifies. At the 0.9-cosine near-dup design point the per-table
    Hamming<=1 collision rate is ~0.68, so OR over 4 tables gives ~0.99
    candidate recall; the verify step makes precision exact.

    Scale shape: candidate generation is an equi-join of the index against
    its (9x-expanded) self on (table, bucket) — work proportional to bucket
    co-occupancy, never n^2 — and only candidate PAIRS (two longs) flow
    into the vector-fetch joins. Hashing was paid once at ingest
    (`lsh_bucket_index`)."""
    v = _vecs(spark, sf_dir)
    b = lsh_bucket_index(spark, sf_dir)
    flips = F.explode(F.array(*[F.lit(x) for x in range(-1, lsh_planes(sf_dir))]))
    # No .distinct() on the expanded side: the 9 XOR masks are distinct by
    # construction so (i, t, bucket) is already unique — a distinct here
    # would only add a full shuffle of the 9x-expanded index. The pair-level
    # distinct below dedupes across tables/flips.
    ab = b.withColumn("flip", flips).select(
        F.col("vec_id").alias("i"),
        "t",
        F.col("bucket").bitwiseXOR(
            F.when(F.col("flip") < 0, F.lit(0))
            .otherwise(F.expr("shiftleft(1, flip)"))
        ).alias("bucket"),
    )
    # same expansion-join treatment as the kNN-graph queries: widen past
    # KNN_WIDEN_MIN_ROWS so the pair stream does not inherit the index's
    # file-count parallelism at scale, skip the exchange below it (r16
    # measurement: the unconditional repartition cost ~0.5s of this
    # query's 1.3s at sf0.1)
    ab = _widen_expansion(spark, sf_dir, ab)
    cand = (
        ab.join(b, ["t", "bucket"])
        .filter(F.col("i") < F.col("vec_id"))
        .select("i", F.col("vec_id").alias("j"))
        .distinct()
    )
    # Precompute each vector's norm ONCE (n sqrt-dot evaluations) instead of
    # per candidate pair (2x per pair — pairs >> n): only the cross dot runs
    # per pair. Same arithmetic as cosine(), so values stay bit-identical to
    # the oracle's dot/(norm*norm) form.
    vn = v.select(
        "vec_id", "e", F.sqrt(dot_cols(F.col("e"), F.col("e"))).alias("nrm")
    )
    cos = dot_cols(F.col("x.e"), F.col("y.e")) / (F.col("x.nrm") * F.col("y.nrm"))
    return (
        cand.join(vn.alias("x"), cand["i"] == F.col("x.vec_id"))
        .join(vn.alias("y"), cand["j"] == F.col("y.vec_id"))
        .select("i", "j", cos.alias("cos"))
        .filter(F.col("cos") >= DEDUP_COS_TAU)
    )


KNN_K = 5
# r16 (optimization round): widen the bucket-index expansion self-join only
# past this corpus size. Below it the round-robin exchange of the
# 9x-expanded anchor side costs more than the parallelism it buys — the
# candidate stage of dedup_embedding_lsh_pairs measured 1.14s with the
# unconditional repartition vs 0.77s without it at sf0.1 (interleaved
# median-of-4), because the exchange sorts and shuffles 9x|index| rows
# that the planner then broadcasts or probes in-place anyway. Above it the
# ~|pairs| distinct behind the join would serialize onto the index's few
# scan partitions (the r14 sf1 fix: 48s -> 9s on the 50M-pair distinct at
# local[32]), so the widening stays. The threshold sits between the sf0.1
# corpus (2,000 vectors, where the exchange is pure cost) and the derived
# sf1 corpus (20,000, where it is the proven cure — an initial gate of
# 50,000 silently disabled widening at sf1 too and the bench extras caught
# the regression: steady 10.2s widened vs 16.6s not, quiet-box
# median-of-4); index file count — and with it natural scan parallelism —
# grows one file per 32 MB of corpus (engine.index_cache.index_file_count),
# so a production-scale corpus is wide long before this guard re-engages.
# Env knob for deployments that want a different crossover.
KNN_WIDEN_MIN_ROWS = int(
    __import__("os").environ.get("SPARK_GRAFT_KNN_WIDEN_MIN_ROWS", "10000")
)


def _widen_expansion(spark: SparkSession, sf_dir: str, ab: DataFrame) -> DataFrame:
    """Scale-conditional 2x-parallelism repartition of the 9x-expanded
    anchor side of the bucket-index self-join (see KNN_WIDEN_MIN_ROWS)."""
    from denali_spark.engine.index_cache import corpus_rows

    if corpus_rows(sf_dir, "embeddings") >= KNN_WIDEN_MIN_ROWS:
        return ab.repartition(spark.sparkContext.defaultParallelism * 2)
    return ab


# Bucket-overflow cap for the kNN-GRAPH consumers' self-join (label
# agreement, hard negatives): dense buckets — near-duplicate clusters
# collide regardless of plane count — contribute load² candidate pairs,
# so the join side keeps a deterministic salted-hash sample of this many
# members per (t, bucket), bounding the quadratic term at buckets·cap²
# while anchors still probe ALL their buckets. No bucket at the oracle
# scales reaches the cap (pinned by tests/test_similarity_recall.py), so
# driver-compared results are provably unchanged; beyond that this is
# the documented bucket-overflow rule every LSH system applies — a
# 1000-member cluster does not need 10^6 scored pairs to vote a 5-NN
# label or surface one best cross-label negative.
KNN_BUCKET_CAP = 256


def _capped_index_side(b: DataFrame, cap: int = KNN_BUCKET_CAP) -> DataFrame:
    w = Window.partitionBy("t", "bucket").orderBy(F.xxhash64("vec_id"), "vec_id")
    return (
        b.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") <= cap)
        .drop("_r")
    )


@query(
    "sim_knn_label_agreement",
    oracle=f"""
    WITH v AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
      FROM embeddings
    ),
    b AS ({_sql_tables('e')}),
    ab AS (
      SELECT DISTINCT vec_id, t,
             xor(bucket, CASE WHEN fl.f = -1 THEN 0 ELSE (1 << fl.f) END) AS bucket
      FROM b CROSS JOIN (SELECT unnest(range(-1, {N_PLANES})) AS f) fl
    ),
    cand AS (
      SELECT DISTINCT ab.vec_id AS i, b.vec_id AS j
      FROM ab JOIN b ON ab.t = b.t AND ab.bucket = b.bucket AND ab.vec_id <> b.vec_id
    ),
    scored AS (
      SELECT c.i, c.j, {SQL_COSINE.format(a='x.e', b='y.e')} AS cos
      FROM cand c JOIN v x ON x.vec_id = c.i JOIN v y ON y.vec_id = c.j
    ),
    top AS (
      SELECT i, j FROM (
        SELECT i, j, ROW_NUMBER() OVER (PARTITION BY i ORDER BY cos DESC, j) AS rn
        FROM scored
      ) WHERE rn <= {KNN_K}
    ),
    g AS (
      SELECT t.i, li.label AS label_i, lj.label AS label_j, COUNT(*) AS n
      FROM top t JOIN embeddings li ON li.vec_id = t.i
                 JOIN embeddings lj ON lj.vec_id = t.j
      GROUP BY 1, 2, 3
    ),
    r AS (
      SELECT i, label_i, label_j, n,
             ROW_NUMBER() OVER (PARTITION BY i ORDER BY n DESC, label_j) AS rn,
             SUM(n) OVER (PARTITION BY i) AS n_neighbors,
             SUM(CASE WHEN label_j = label_i THEN n ELSE 0 END)
               OVER (PARTITION BY i) AS n_agree
      FROM g
    )
    SELECT i AS vec_id, label_i AS label, label_j AS knn_label,
           CAST(n_neighbors AS BIGINT) AS n_neighbors,
           CAST(n_agree AS BIGINT) AS n_agree,
           label_j = label_i AS majority_agrees
    FROM r WHERE rn = 1
    """,
    tags=("similarity", "knn-graph", "label-quality"),
)
def sim_knn_label_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label-quality audit over the corpus k-NN graph: every vector's
    {KNN_K} approximate nearest neighbors (LSH buckets + Hamming-1
    multi-probe, exact-cosine rerank) vote on its label; the report row
    carries the majority neighbor label (ties broken toward the smaller
    label id), the agreeing-neighbor count, and whether the majority
    matches the vector's own label. Vectors whose neighborhood disagrees
    are the mislabel/outlier candidates a curation pass reviews — the
    classic confident-learning signal, built from the same ingest-time
    index every other ANN query reads.

    Scale shape: the k-NN graph comes from the bucket-index self-join
    (work ∝ bucket co-occupancy, never n²); the per-node top-k window and
    the vote aggregate are both keyed on the node id, so the shuffles are
    uniform in n with no hot key. No new index, no new scan of the
    embedding payloads beyond the two fetch joins."""
    v = _vecs(spark, sf_dir)
    b = lsh_bucket_index(spark, sf_dir)
    flips = F.explode(F.array(*[F.lit(x) for x in range(-1, lsh_planes(sf_dir))]))
    ab = b.withColumn("flip", flips).select(
        F.col("vec_id").alias("i"),
        "t",
        F.col("bucket").bitwiseXOR(
            F.when(F.col("flip") < 0, F.lit(0))
            .otherwise(F.expr("shiftleft(1, flip)"))
        ).alias("bucket"),
    )
    # widen the expansion join: the index reads back in O(file-count)
    # partitions, so without this the ~|pairs| join output and the
    # distinct behind it serialize onto those few tasks (measured 48s ->
    # 9s on the 50M-pair sf1 distinct at local[32]); kept UNCONDITIONAL
    # here (unlike dedup_embedding_lsh_pairs) — the r16 A/B measured the
    # kNN-graph consumers 20% SLOWER without it even at sf0.1, because
    # the capped-window join side and the scoring behind it inherit the
    # anchor side's parallelism
    ab = ab.repartition(spark.sparkContext.defaultParallelism * 2)
    cand = (
        # join side bucket-overflow-capped (KNN_BUCKET_CAP): bounds the
        # dense-cluster quadratic term; anchors probe all their buckets
        ab.join(_capped_index_side(b), ["t", "bucket"])
        .filter(F.col("i") != F.col("vec_id"))
        .select("i", F.col("vec_id").alias("j"))
        .distinct()
    )
    vn = v.select(
        "vec_id", "e", F.sqrt(dot_cols(F.col("e"), F.col("e"))).alias("nrm")
    )
    cos = dot_cols(F.col("x.e"), F.col("y.e")) / (F.col("x.nrm") * F.col("y.nrm"))
    scored = (
        cand.join(vn.alias("x"), cand["i"] == F.col("x.vec_id"))
        .join(vn.alias("y"), cand["j"] == F.col("y.vec_id"))
        .select("i", "j", cos.alias("cos"))
    )
    wk = Window.partitionBy("i").orderBy(F.desc("cos"), "j")
    top = (
        scored.withColumn("rn", F.row_number().over(wk))
        .filter(F.col("rn") <= KNN_K)
        .select("i", "j")
    )
    lab = load_table(spark, sf_dir, "embeddings").select("vec_id", "label")
    g = (
        top.join(
            lab.select(F.col("vec_id").alias("i"), F.col("label").alias("label_i")),
            "i",
        )
        .join(
            lab.select(F.col("vec_id").alias("j"), F.col("label").alias("label_j")),
            "j",
        )
        .groupBy("i", "label_i", "label_j")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    wm = Window.partitionBy("i").orderBy(F.desc("n"), "label_j")
    wi = Window.partitionBy("i")
    return (
        g.withColumn("rn", F.row_number().over(wm))
        .withColumn("n_neighbors", F.sum("n").over(wi))
        .withColumn(
            "n_agree",
            F.sum(
                F.when(F.col("label_j") == F.col("label_i"), F.col("n"))
                .otherwise(F.lit(0))
            ).over(wi),
        )
        .filter(F.col("rn") == 1)
        .select(
            F.col("i").alias("vec_id"),
            F.col("label_i").alias("label"),
            F.col("label_j").alias("knn_label"),
            "n_neighbors",
            "n_agree",
            (F.col("label_j") == F.col("label_i")).alias("majority_agrees"),
        )
    )


@query(
    "sem_dedup_pairs",
    oracle=f"""
    WITH v AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
      FROM embeddings
    ),
    cent AS (SELECT vec_id AS cid, e AS ce FROM v WHERE vec_id % {IVF_STRIDE} = 0),
    ascore AS (
      SELECT v.vec_id, v.e, cent.cid,
             ROW_NUMBER() OVER (
               PARTITION BY v.vec_id
               ORDER BY {SQL_COSINE.format(a='v.e', b='cent.ce')} DESC, cent.cid
             ) AS arn
      FROM v CROSS JOIN cent
    ),
    assigned AS (SELECT vec_id, e, cid FROM ascore WHERE arn = 1)
    SELECT a.cid, a.vec_id AS i, b.vec_id AS j,
           {SQL_COSINE.format(a='a.e', b='b.e')} AS cos
    FROM assigned a JOIN assigned b ON a.cid = b.cid AND a.vec_id < b.vec_id
    WHERE {SQL_COSINE.format(a='a.e', b='b.e')} >= {DEDUP_COS_TAU}
    """,
    tags=("dedup", "embedding", "semdedup"),
)
def sem_dedup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup: semantic near-dup pairs confined to k-means cells
    (Abbas et al., 2023). Every vector was assigned to its nearest coarse
    centroid when the IVF inverted lists were materialized; the pairwise
    cosine pass then runs WITHIN cells only — O(sum of cell^2) ~= n^2/K
    instead of n^2, the published SemDeDup cost shape.

    Scale shape: reads the cid-partitioned inverted lists (no re-assignment
    at query time), self-joins on cid — an equi-join whose shuffle key is
    the cell id, so each cell's quadratic stays inside one task. Cells are
    capped in practice by choosing K ~ n/target_cell (IVF_STRIDE here)."""
    assigned = ivf_inverted_lists(spark, sf_dir)
    a = assigned.select("cid", F.col("vec_id").alias("i"), F.col("e").alias("ea"))
    bb = assigned.select("cid", F.col("vec_id").alias("j"), F.col("e").alias("eb"))
    cos = cosine(F.col("ea"), F.col("eb"))
    return (
        a.join(bb, "cid")
        .filter(F.col("i") < F.col("j"))
        .select("cid", "i", "j", cos.alias("cos"))
        .filter(F.col("cos") >= DEDUP_COS_TAU)
    )


# --- int8 scalar quantization -----------------------------------------------
#
# The memory-reduction path of a 100 TB vector pipeline: float32 corpora are
# quantized to int8 at ingest (4x smaller, integer SIMD dot products), and
# search runs over the quantized codes with optional exact rerank. Symmetric
# scalar quantization with one global scale keeps the transform a pure
# element-wise map: q_d = floor(x_d * 127 / max|x|). The quantized dot
# product is all-integer, and the scale derivation is max-only — so the
# whole query is bit-exact across engines (no float-sum tolerance needed;
# the only doubles are identically-ordered per-element scalar ops).

SQ_PROBE_MOD = 97
SQ_K = 5


@query(
    "sim_sq_topk",
    oracle=f"""
    WITH v AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
      FROM embeddings
    ),
    s AS (SELECT MAX(list_max(list_transform(e, x -> abs(x)))) AS gmax FROM v),
    qv AS (
      SELECT vec_id,
             list_transform(e, x -> CAST(FLOOR(x * 127.0 / s.gmax) AS INT)) AS qe
      FROM v, s
    ),
    probes AS (
      SELECT vec_id AS query_id, qe AS pq FROM qv WHERE vec_id % {SQ_PROBE_MOD} = 3
    ),
    scored AS (
      SELECT p.query_id, v.vec_id AS neighbor_id,
             CAST(list_sum(list_transform(list_zip(p.pq, v.qe),
                           x -> CAST(x[1] AS BIGINT) * x[2])) AS BIGINT) AS qdot
      FROM probes p JOIN qv v ON v.vec_id <> p.query_id
    ),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY qdot DESC, neighbor_id) AS rn
      FROM scored
    )
    SELECT query_id, neighbor_id, qdot, CAST(rn AS BIGINT) AS rn
    FROM ranked WHERE rn <= {SQ_K}
    """,
    tags=("similarity", "ann", "quantization"),
)
def sim_sq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 neighbors by int8-quantized dot product for a ~1% probe set.

    Scale shape: the global max|x| is a one-row aggregate broadcast into the
    element-wise quantization map (scan-local, the ingest-time transform);
    probes broadcast into the scoring join so the corpus streams through one
    stage; per-query top-k keeps k rows per query past the shuffle. Integer
    dot products via zip_with/aggregate — JVM codegen, no UDFs."""
    v = _vecs(spark, sf_dir)
    gmax = v.agg(
        F.max(F.array_max(F.transform("e", lambda x: F.abs(x)))).alias("gmax")
    )
    qv = v.crossJoin(F.broadcast(gmax)).select(
        "vec_id",
        F.transform(
            "e", lambda x: F.floor(x * F.lit(127.0) / F.col("gmax")).cast("int")
        ).alias("qe"),
    )
    probes = qv.filter(F.col("vec_id") % SQ_PROBE_MOD == 3).select(
        F.col("vec_id").alias("query_id"), F.col("qe").alias("pq")
    )
    scored = qv.join(
        F.broadcast(probes), F.col("vec_id") != F.col("query_id")
    ).select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        F.aggregate(
            F.zip_with("pq", "qe", lambda x, y: x.cast("long") * y),
            F.lit(0).cast("long"),
            lambda acc, t: acc + t,
        ).alias("qdot"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("qdot"), "neighbor_id")
    return (
        scored.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= SQ_K)
        .select("query_id", "neighbor_id", "qdot", "rn")
    )


# --- product quantization (the memory-bound scale path) ---------------------
#
# PQ splits each (int8-quantized) vector into PQ_M subvectors and encodes
# every subvector as the id of its nearest codebook entry — storage drops
# from DIM bytes to PQ_M code bytes per vector, and scoring becomes
# PQ_M table lookups (ADC) instead of a DIM-long dot product. The codebook
# is deterministic (a fixed-size hash-ordered sample; real deployments run
# k-means — the plumbing is identical), so both engines reproduce the
# same codes and the DuckDB oracle can check the whole pipeline
# bit-exactly: quantize → encode (argmin L2, ties to the lowest code id)
# → ADC lookup-table scoring → top-PQ_CAND candidates → full int8-dot
# rerank → top-PQ_K. The two-stage shape (coarse PQ candidates, precise
# rerank) is the production ANN layout at 100 TB: the PQ code table is
# ~DIM/8 of the corpus bytes and the rerank touches only candidates.

PQ_M = 8               # subspaces (DIM=64 → 8 dims each)
PQ_SUB = DIM // PQ_M
# Codebook = a FIXED-SIZE deterministic sample of PQ_CB training vectors
# (the PQ_CB smallest under a Knuth multiplicative hash of vec_id, ties to
# the lower id). Fixed count — NOT a corpus-proportional modulo — so the
# encode join does O(n · PQ_CB · M) work and the broadcast codebook stays
# constant-size no matter how large the corpus grows (real deployments use
# 256 k-means entries per subspace; the plumbing is identical and the
# deterministic sample keeps the DuckDB oracle bit-exact). Mirrors
# `ivf_train`'s fixed 4096-row training cap.
PQ_CB = 64             # codebook entries per subspace (fixed, corpus-independent)
PQ_HASH_MUL = 2654435761   # Knuth multiplicative hash, mod 2^32
PQ_HASH_MOD = 4294967296
PQ_PROBE_MOD = 991     # probe set
PQ_CAND = 25           # ADC candidates per probe fed to the rerank
PQ_K = 5


def pq_code_index(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """The materialized PQ index (r11): four relations built once per
    corpus under the shared cache discipline (engine.index_cache) —
    `gmax` (the 1-row quantization scale), `qvecs` (int8-quantized
    vectors, the rerank operand), `cbs` (per-subspace codebooks), and
    `codes` (the PQ code table: PQ_M bytes-worth per vector, ~DIM/8 of
    the corpus). Queries encode NOTHING at query time: probes quantize
    against the stored gmax, build their LUTs against the stored
    codebooks, and ADC-join the stored code table — the hash-once/
    query-many shape the LSH/MinHash/IVF indexes already follow. Every
    stored value is an integer (or the one exact double gmax), so the
    parquet round-trip preserves the oracle-checked bit-exactness."""
    import os

    from denali_spark.engine.index_cache import (
        cache_root,
        corpus_fingerprint,
        corpus_rows,
        index_file_count,
        materialize_parquet,
        widen_build_input,
    )

    nfiles = index_file_count(sf_dir, "embeddings")
    key = corpus_fingerprint(sf_dir, "embeddings", f"M{PQ_M}CB{PQ_CB}f{nfiles}")
    root = cache_root("pq")
    # r17 (the r16 "not yet optimized" carry-over): the PQ build inputs were
    # still byte-split — a single-file embeddings corpus ran the whole
    # quantize pass (and the x PQ_M subspace expansion below) on ONE core.
    # Row-sized widening of the build INPUTS only, same as the five
    # per-row-map families fixed in r16; every stage's output is invariant
    # to partitioning (per-row maps, a global max, a total-order limit, and
    # a per-(vec_id, m) argmin), checksummed against the old build.
    n_rows = corpus_rows(sf_dir, "embeddings")
    gmax = materialize_parquet(
        spark, os.path.join(root, f"gmax-{key}"),
        lambda: widen_build_input(_vecs(spark, sf_dir), n_rows).agg(
            F.max(F.array_max(F.transform("e", lambda x: F.abs(x)))).alias("gmax")
        ),
    )
    qvecs = materialize_parquet(
        spark, os.path.join(root, f"qvecs-{key}"),
        lambda: widen_build_input(_vecs(spark, sf_dir), n_rows)
        .crossJoin(F.broadcast(gmax)).select(
            "vec_id",
            F.transform(
                "e", lambda x: F.floor(x * F.lit(127.0) / F.col("gmax")).cast("int")
            ).alias("qe"),
        ),
        num_files=nfiles,
    )
    ms = spark.range(PQ_M).select(F.col("id").cast("int").alias("m"))
    sub = F.slice(
        F.col("qe"), F.col("m") * PQ_SUB + F.lit(1), F.lit(PQ_SUB)
    ).alias("sub")

    def build_cbs() -> DataFrame:
        cb_train = (
            qvecs.withColumn(
                "h", (F.col("vec_id") * F.lit(PQ_HASH_MUL)) % F.lit(PQ_HASH_MOD)
            )
            .orderBy("h", "vec_id")
            .limit(PQ_CB)
            .drop("h")
        )
        return cb_train.crossJoin(F.broadcast(ms)).select(
            F.col("m"), F.col("vec_id").alias("code"), sub
        )

    cbs = materialize_parquet(spark, os.path.join(root, f"cb-{key}"), build_cbs)

    def build_codes() -> DataFrame:
        # the code-assignment pass expands x PQ_M and scores PQ_CB
        # codebook entries per (vector, subspace): the heaviest per-row
        # compute in the family, over a byte-tiny qvecs read — widen it too
        vsub = (
            widen_build_input(qvecs, n_rows)
            .crossJoin(F.broadcast(ms)).select("vec_id", "m", sub)
        )
        l2 = F.aggregate(
            F.zip_with("sub", "csub", lambda x, y: (x - y).cast("long") * (x - y)),
            F.lit(0).cast("long"),
            lambda acc, t: acc + t,
        )
        dists = vsub.join(
            F.broadcast(cbs.select("m", "code", F.col("sub").alias("csub"))), "m"
        ).select("vec_id", "m", "code", l2.alias("d"))
        # argmin with ties to the lowest code id: lexicographic struct-min
        return dists.groupBy("vec_id", "m").agg(
            F.min(F.struct("d", "code"))["code"].alias("code")
        )

    codes = materialize_parquet(
        spark, os.path.join(root, f"codes-{key}"), build_codes,
        num_files=nfiles, distribute_by=("vec_id",),
    )
    return {"gmax": gmax, "qvecs": qvecs, "cbs": cbs, "codes": codes}


def _pq_lut(probes_qe: DataFrame, cbs: DataFrame) -> DataFrame:
    """Per-(query, subspace, code) dot-product lookup table: |probes| x
    PQ_M x PQ_CB rows, broadcastable by construction."""
    psub = F.slice(
        F.col("qe"), F.col("m") * PQ_SUB + F.lit(1), F.lit(PQ_SUB)
    )
    pdot = F.aggregate(
        F.zip_with(psub, F.col("csub"), lambda x, y: x.cast("long") * y),
        F.lit(0).cast("long"),
        lambda acc, t: acc + t,
    )
    return probes_qe.crossJoin(
        F.broadcast(cbs.select("m", "code", F.col("sub").alias("csub")))
    ).select("query_id", "m", "code", pdot.alias("pdot"))


def _pq_rerank_topk(
    cand: DataFrame, probes_qe: DataFrame, qvecs: DataFrame, k: int
) -> DataFrame:
    """Exact int8-dot rerank of (query_id, neighbor_id) candidates →
    (query_id, neighbor_id, qdot, rn) top-k per query."""
    qdot = F.aggregate(
        F.zip_with("pqe", "qe", lambda x, y: x.cast("long") * y),
        F.lit(0).cast("long"),
        lambda acc, t: acc + t,
    )
    rerank = (
        cand.join(
            F.broadcast(probes_qe.select("query_id", F.col("qe").alias("pqe"))),
            "query_id",
        )
        .join(qvecs, cand["neighbor_id"] == qvecs["vec_id"])
        .select("query_id", "neighbor_id", qdot.alias("qdot"))
    )
    wk = Window.partitionBy("query_id").orderBy(F.desc("qdot"), "neighbor_id")
    return (
        rerank.withColumn("rn", F.row_number().over(wk).cast("long"))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "qdot", "rn")
    )


@query(
    "sim_pq_topk",
    oracle=f"""
    WITH v AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
      FROM embeddings
    ),
    s AS (SELECT MAX(list_max(list_transform(e, x -> abs(x)))) AS gmax FROM v),
    qv AS (
      SELECT vec_id,
             list_transform(e, x -> CAST(FLOOR(x * 127.0 / s.gmax) AS INT)) AS qe
      FROM v, s
    ),
    ms AS (SELECT unnest(range(0, {PQ_M})) AS m),
    cbids AS (
      SELECT vec_id FROM qv
      ORDER BY (vec_id * {PQ_HASH_MUL}) % {PQ_HASH_MOD}, vec_id
      LIMIT {PQ_CB}
    ),
    cbs AS (
      SELECT ms.m, qv.vec_id AS cid,
             qv.qe[ms.m * {PQ_SUB} + 1 : ms.m * {PQ_SUB} + {PQ_SUB}] AS sub
      FROM qv JOIN cbids USING (vec_id) CROSS JOIN ms
    ),
    vsub AS (
      SELECT qv.vec_id, ms.m,
             qv.qe[ms.m * {PQ_SUB} + 1 : ms.m * {PQ_SUB} + {PQ_SUB}] AS sub
      FROM qv CROSS JOIN ms
    ),
    enc AS (
      SELECT vec_id, m, cid FROM (
        SELECT vs.vec_id, vs.m, c.cid,
               row_number() OVER (
                 PARTITION BY vs.vec_id, vs.m
                 ORDER BY list_sum(list_transform(list_zip(vs.sub, c.sub),
                   x -> CAST(x[1] - x[2] AS BIGINT) * (x[1] - x[2]))), c.cid
               ) AS rn
        FROM vsub vs JOIN cbs c ON c.m = vs.m
      ) WHERE rn = 1
    ),
    probes AS (
      SELECT vec_id AS query_id, qe FROM qv WHERE vec_id % {PQ_PROBE_MOD} = 7
    ),
    lut AS (
      SELECT p.query_id, c.m, c.cid,
             CAST(list_sum(list_transform(list_zip(
               p.qe[c.m * {PQ_SUB} + 1 : c.m * {PQ_SUB} + {PQ_SUB}], c.sub),
               x -> CAST(x[1] AS BIGINT) * x[2])) AS BIGINT) AS pdot
      FROM probes p CROSS JOIN cbs c
    ),
    adc AS (
      SELECT l.query_id, e.vec_id AS neighbor_id, SUM(l.pdot) AS adc_dot
      FROM enc e JOIN lut l ON l.m = e.m AND l.cid = e.cid
      WHERE e.vec_id <> l.query_id
      GROUP BY 1, 2
    ),
    cand AS (
      SELECT query_id, neighbor_id FROM (
        SELECT query_id, neighbor_id,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY adc_dot DESC, neighbor_id) AS rn
        FROM adc
      ) WHERE rn <= {PQ_CAND}
    ),
    rerank AS (
      SELECT c.query_id, c.neighbor_id,
             CAST(list_sum(list_transform(list_zip(p.qe, n.qe),
               x -> CAST(x[1] AS BIGINT) * x[2])) AS BIGINT) AS qdot
      FROM cand c
      JOIN probes p ON p.query_id = c.query_id
      JOIN qv n ON n.vec_id = c.neighbor_id
    )
    SELECT query_id, neighbor_id, qdot, CAST(rn AS BIGINT) AS rn FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY qdot DESC, neighbor_id) AS rn
      FROM rerank
    ) WHERE rn <= {PQ_K}
    """,
    tags=("similarity", "ann", "quantization", "pq"),
)
def sim_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage product-quantization ANN: PQ/ADC candidate generation
    (8 bytes per vector instead of 64) followed by a full int8-dot rerank
    of the top-{PQ_CAND} candidates per probe. See the section comment
    for the exactness argument. r11: the quantized vectors, codebooks,
    and code table come from the MATERIALIZED PQ index (pq_code_index) —
    encoding is paid once at ingest, not per query; a query builds only
    its broadcast LUT and joins the stored codes. Both top-k cuts are
    per-query windows over bounded relations."""
    idx = pq_code_index(spark, sf_dir)
    qv, cbs, enc = idx["qvecs"], idx["cbs"], idx["codes"]
    probes = qv.filter(F.col("vec_id") % PQ_PROBE_MOD == 7).select(
        F.col("vec_id").alias("query_id"), F.col("qe")
    )
    lut = _pq_lut(probes, cbs)
    adc = (
        enc.join(F.broadcast(lut), ["m", "code"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .groupBy("query_id", F.col("vec_id").alias("neighbor_id"))
        .agg(F.sum("pdot").alias("adc_dot"))
    )
    wc = Window.partitionBy("query_id").orderBy(F.desc("adc_dot"), "neighbor_id")
    cand = (
        adc.withColumn("rn", F.row_number().over(wc))
        .filter(F.col("rn") <= PQ_CAND)
        .select("query_id", "neighbor_id")
    )
    return _pq_rerank_topk(cand, probes, qv, PQ_K)


IVFPQ_NPROBE = 4  # coarse cells probed per query (PQ error compounds with
                  # cell truncation, so probe wider than plain IVF's 2)


@query(
    "sim_ivfpq_topk",
    oracle=f"""
    WITH v AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
      FROM embeddings
    ),
    s AS (SELECT MAX(list_max(list_transform(e, x -> abs(x)))) AS gmax FROM v),
    qv AS (
      SELECT vec_id,
             list_transform(e, x -> CAST(FLOOR(x * 127.0 / s.gmax) AS INT)) AS qe
      FROM v, s
    ),
    cent AS (SELECT vec_id AS cell, e AS ce FROM v WHERE vec_id % {IVF_STRIDE} = 0),
    assign_scored AS (
      SELECT v.vec_id, cent.cell,
             ROW_NUMBER() OVER (
               PARTITION BY v.vec_id
               ORDER BY {SQL_COSINE.format(a='v.e', b='cent.ce')} DESC, cent.cell
             ) AS arn
      FROM v CROSS JOIN cent
    ),
    lists AS (SELECT vec_id, cell FROM assign_scored WHERE arn = 1),
    pcells AS (
      SELECT vec_id AS query_id, cell FROM assign_scored
      WHERE vec_id % {PQ_PROBE_MOD} = 7 AND arn <= {IVFPQ_NPROBE}
    ),
    ms AS (SELECT unnest(range(0, {PQ_M})) AS m),
    cbids AS (
      SELECT vec_id FROM qv
      ORDER BY (vec_id * {PQ_HASH_MUL}) % {PQ_HASH_MOD}, vec_id
      LIMIT {PQ_CB}
    ),
    cbs AS (
      SELECT ms.m, qv.vec_id AS code,
             qv.qe[ms.m * {PQ_SUB} + 1 : ms.m * {PQ_SUB} + {PQ_SUB}] AS sub
      FROM qv JOIN cbids USING (vec_id) CROSS JOIN ms
    ),
    vsub AS (
      SELECT qv.vec_id, ms.m,
             qv.qe[ms.m * {PQ_SUB} + 1 : ms.m * {PQ_SUB} + {PQ_SUB}] AS sub
      FROM qv CROSS JOIN ms
    ),
    enc AS (
      SELECT vec_id, m, code FROM (
        SELECT vs.vec_id, vs.m, c.code,
               row_number() OVER (
                 PARTITION BY vs.vec_id, vs.m
                 ORDER BY list_sum(list_transform(list_zip(vs.sub, c.sub),
                   x -> CAST(x[1] - x[2] AS BIGINT) * (x[1] - x[2]))), c.code
               ) AS rn
        FROM vsub vs JOIN cbs c ON c.m = vs.m
      ) WHERE rn = 1
    ),
    probes AS (
      SELECT vec_id AS query_id, qe FROM qv WHERE vec_id % {PQ_PROBE_MOD} = 7
    ),
    lut AS (
      SELECT p.query_id, c.m, c.code,
             CAST(list_sum(list_transform(list_zip(
               p.qe[c.m * {PQ_SUB} + 1 : c.m * {PQ_SUB} + {PQ_SUB}], c.sub),
               x -> CAST(x[1] AS BIGINT) * x[2])) AS BIGINT) AS pdot
      FROM probes p CROSS JOIN cbs c
    ),
    pairs AS (
      SELECT pc.query_id, l.vec_id
      FROM lists l JOIN pcells pc ON l.cell = pc.cell
      WHERE l.vec_id <> pc.query_id
    ),
    adc AS (
      SELECT p.query_id, p.vec_id AS neighbor_id, SUM(u.pdot) AS adc_dot
      FROM pairs p
      JOIN enc e ON e.vec_id = p.vec_id
      JOIN lut u ON u.query_id = p.query_id AND u.m = e.m AND u.code = e.code
      GROUP BY 1, 2
    ),
    cand AS (
      SELECT query_id, neighbor_id FROM (
        SELECT query_id, neighbor_id,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY adc_dot DESC, neighbor_id) AS rn
        FROM adc
      ) WHERE rn <= {PQ_CAND}
    ),
    rerank AS (
      SELECT c.query_id, c.neighbor_id,
             CAST(list_sum(list_transform(list_zip(p.qe, n.qe),
               x -> CAST(x[1] AS BIGINT) * x[2])) AS BIGINT) AS qdot
      FROM cand c
      JOIN probes p ON p.query_id = c.query_id
      JOIN qv n ON n.vec_id = c.neighbor_id
    )
    SELECT query_id, neighbor_id, qdot, CAST(rn AS BIGINT) AS rn FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY qdot DESC, neighbor_id) AS rn
      FROM rerank
    ) WHERE rn <= {PQ_K}
    """,
    tags=("similarity", "ann", "ivf", "pq"),
)
def sim_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ composition — FAISS's workhorse layout (IVFx,PQy with
    by_residual=false): coarse IVF cells bound WHICH vectors a query
    scores, PQ/ADC bounds HOW MUCH each scoring costs (8 code lookups
    instead of a 64-dim dot), and a full int8-dot rerank of the
    surviving top-{PQ_CAND} restores exact ordering among candidates.
    Reuses sim_pq_topk's deterministic codebooks (fixed hash-ordered
    {PQ_CB}-entry sample per subspace, all-integer ADC) and the
    materialized IVF inverted lists, so the whole pipeline stays
    bit-exact and hash-checkable against the SQL oracle.

    Scale shape: the inverted lists are parquet-partitioned by cell, so
    a query's candidate read touches {IVFPQ_NPROBE}/k of the corpus;
    the probe-cell relation and the per-query LUT ({PQ_M}×{PQ_CB} rows
    per probe) broadcast; the ADC join partial-aggregates per
    (query, neighbor); both top-k cuts are per-query windows over
    bounded relations. Candidate generation cost per query is
    |cells probed| × {PQ_M} integer lookups — the IVF-PQ promise. r11:
    quantization/codebooks/codes come from the materialized PQ index
    (pq_code_index) and the cells from the materialized IVF lists —
    a query encodes nothing."""
    v = _vecs(spark, sf_dir)
    idx = pq_code_index(spark, sf_dir)
    qv, cbs, enc = idx["qvecs"], idx["cbs"], idx["codes"]
    # IVF side: each probe's {IVFPQ_NPROBE} nearest cells (full-precision
    # scoring against the tiny broadcast centroid set), candidates from
    # the materialized cell-partitioned lists
    arn_w = Window.partitionBy("vec_id").orderBy(
        F.desc(cosine(F.col("e"), F.col("ce"))), "cid"
    )
    pcells = (
        v.filter(F.col("vec_id") % PQ_PROBE_MOD == 7)
        .crossJoin(F.broadcast(_centroids(v)))
        .withColumn("arn", F.row_number().over(arn_w))
        .filter(F.col("arn") <= IVFPQ_NPROBE)
        .select(F.col("vec_id").alias("query_id"), F.col("cid").alias("pcell"))
    )
    lists = ivf_inverted_lists(spark, sf_dir).select("vec_id", "cid")
    pairs = (
        lists.join(F.broadcast(pcells), lists["cid"] == pcells["pcell"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id")
    )
    probes = qv.filter(F.col("vec_id") % PQ_PROBE_MOD == 7).select(
        F.col("vec_id").alias("query_id"), F.col("qe")
    )
    lut = _pq_lut(probes, cbs)
    adc = (
        pairs.join(enc, "vec_id")
        .join(F.broadcast(lut), ["query_id", "m", "code"])
        .groupBy("query_id", F.col("vec_id").alias("neighbor_id"))
        .agg(F.sum("pdot").alias("adc_dot"))
    )
    wc = Window.partitionBy("query_id").orderBy(F.desc("adc_dot"), "neighbor_id")
    cand = (
        adc.withColumn("rn", F.row_number().over(wc))
        .filter(F.col("rn") <= PQ_CAND)
        .select("query_id", "neighbor_id")
    )
    return _pq_rerank_topk(cand, probes, qv, PQ_K)


def pq_quantize_external(
    spark: SparkSession, sf_dir: str, vecs: DataFrame
) -> DataFrame:
    """Quantize external (vec_id, e) vectors against the CORPUS's stored
    gmax — the train-once/add-many contract (FAISS: codebooks and scales
    are frozen at index build). External values may exceed the corpus
    range, so the int8 result clamps to [-127, 127] (the corpus path
    never clamps — its gmax bounds it by construction, keeping the
    oracle exact)."""
    idx = pq_code_index(spark, sf_dir)
    return vecs.crossJoin(F.broadcast(idx["gmax"])).select(
        "vec_id",
        F.transform(
            "e",
            lambda x: F.greatest(
                F.lit(-127),
                F.least(
                    F.lit(127),
                    F.floor(x * F.lit(127.0) / F.col("gmax")).cast("int"),
                ),
            ),
        ).alias("qe"),
    )


def pq_encode_codes(
    spark: SparkSession, sf_dir: str, qvecs: DataFrame
) -> DataFrame:
    """Encode quantized (vec_id, qe) rows against the stored codebooks →
    (vec_id, m, code). Map-side: the codebooks broadcast and the argmin
    runs where the rows are — the same per-row cost the ingest-time
    build pays, applied to a micro-batch."""
    idx = pq_code_index(spark, sf_dir)
    ms = spark.range(PQ_M).select(F.col("id").cast("int").alias("m"))
    sub = F.slice(
        F.col("qe"), F.col("m") * PQ_SUB + F.lit(1), F.lit(PQ_SUB)
    ).alias("sub")
    vsub = qvecs.crossJoin(F.broadcast(ms)).select("vec_id", "m", sub)
    l2 = F.aggregate(
        F.zip_with("sub", "csub", lambda x, y: (x - y).cast("long") * (x - y)),
        F.lit(0).cast("long"),
        lambda acc, t: acc + t,
    )
    dists = vsub.join(
        F.broadcast(idx["cbs"].select("m", "code", F.col("sub").alias("csub"))),
        "m",
    ).select("vec_id", "m", "code", l2.alias("d"))
    return dists.groupBy("vec_id", "m").agg(
        F.min(F.struct("d", "code"))["code"].alias("code")
    )


def sim_ivfpq_search(
    spark: SparkSession, sf_dir: str, probes: DataFrame, k: int = PQ_K,
    nprobe: int = IVFPQ_NPROBE, n_cand: int = PQ_CAND,
    extra_qvecs: DataFrame | None = None,
    extra_codes: DataFrame | None = None,
    extra_lists: DataFrame | None = None,
    base_qvecs: DataFrame | None = None,
    base_codes: DataFrame | None = None,
    base_lists: DataFrame | None = None,
) -> DataFrame:
    """IVF-PQ top-k for EXTERNAL probe vectors — the query-time path over
    BOTH materialized indexes, completing the external-probe triple
    (sim_lsh_search / sim_ivf_search / this). `probes` is (query_id
    long, e array<double>): each probe quantizes against the stored
    gmax, picks its `nprobe` cells against the broadcast centroid set,
    ADC-scores only those cells' stored PQ codes through its broadcast
    LUT, and exact-reranks the top-`n_cand` by stored-int8 dot. Per
    probe the corpus work is |cells| × {PQ_M} integer lookups plus
    `n_cand` rerank rows — nothing rescans or re-encodes the corpus.

    Online lifecycle (mirrors sim_ivf_search's contract): `extra_*`
    graft streamed quantized vectors / codes / cell rows (the PQ code
    sink + the IVF list sink) without touching the base; `base_*`
    REPLACE the corpus-derived relations (the folded-generation read
    path)."""
    v = _vecs(spark, sf_dir)
    idx = pq_code_index(spark, sf_dir)
    cbs = idx["cbs"]
    qv = base_qvecs if base_qvecs is not None else idx["qvecs"]
    enc = base_codes if base_codes is not None else idx["codes"]
    if extra_qvecs is not None:
        qv = qv.unionByName(extra_qvecs.select("vec_id", "qe"))
    if extra_codes is not None:
        enc = enc.unionByName(extra_codes.select("vec_id", "m", "code"))
    # clamped external quantization: identity for in-range (corpus) probes
    qp = pq_quantize_external(
        spark, sf_dir, probes.select(F.col("query_id").alias("vec_id"), "e")
    ).select(F.col("vec_id").alias("query_id"), "qe")
    arn_w = Window.partitionBy("query_id").orderBy(
        F.desc(cosine(F.col("pe"), F.col("ce"))), "cid"
    )
    pcells = (
        probes.select("query_id", F.col("e").alias("pe"))
        .crossJoin(F.broadcast(_centroids(v)))
        .withColumn("arn", F.row_number().over(arn_w))
        .filter(F.col("arn") <= nprobe)
        .select("query_id", F.col("cid").alias("pcell"))
    )
    lists = (
        base_lists if base_lists is not None
        else ivf_inverted_lists(spark, sf_dir)
    ).select("vec_id", "cid")
    if extra_lists is not None:
        lists = lists.unionByName(extra_lists.select("vec_id", "cid"))
    pairs = (
        lists.join(F.broadcast(pcells), lists["cid"] == pcells["pcell"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id")
    )
    lut = _pq_lut(qp, cbs)
    adc = (
        pairs.join(enc, "vec_id")
        .join(F.broadcast(lut), ["query_id", "m", "code"])
        .groupBy("query_id", F.col("vec_id").alias("neighbor_id"))
        .agg(F.sum("pdot").alias("adc_dot"))
    )
    wc = Window.partitionBy("query_id").orderBy(F.desc("adc_dot"), "neighbor_id")
    cand = (
        adc.withColumn("rn", F.row_number().over(wc))
        .filter(F.col("rn") <= n_cand)
        .select("query_id", "neighbor_id")
    )
    return _pq_rerank_topk(cand, qp, qv, k)


@query(
    "sim_ivf_balance",
    oracle=f"""
    WITH v AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
      FROM embeddings
    ),
    cent AS (SELECT vec_id AS cid, e AS ce FROM v WHERE vec_id % {IVF_STRIDE} = 0),
    assign_scored AS (
      SELECT v.vec_id, cent.cid,
             ROW_NUMBER() OVER (
               PARTITION BY v.vec_id
               ORDER BY {SQL_COSINE.format(a='v.e', b='cent.ce')} DESC, cent.cid
             ) AS arn
      FROM v CROSS JOIN cent
    ),
    occ AS (
      SELECT cid, COUNT(*) AS cell_size
      FROM assign_scored WHERE arn = 1 GROUP BY cid
    )
    SELECT CAST(cell_size AS BIGINT) AS cell_size,
           CAST(COUNT(*) AS BIGINT) AS n_cells,
           CAST(cell_size * COUNT(*) AS BIGINT) AS n_vecs
    FROM occ GROUP BY cell_size
    """,
    tags=("similarity", "ann", "ivf", "stats"),
)
def sim_ivf_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF cell-occupancy histogram: how many inverted lists hold how many
    vectors — the index-health number for an IVF deployment (a fat cell
    means a probe that hits it degenerates toward brute force; a sea of
    near-empty cells means the centroid budget is wasted). The ANN twin
    of dedup_cluster_size_histogram, and the monitoring query behind
    "rebalance the index" decisions.

    Scale shape: reads the MATERIALIZED inverted lists (built once per
    corpus, partitioned by cid), so the occupancy count is one
    partial-aggregable groupBy over (vec_id, cid) pairs; the histogram is
    a second rollup over the ≤ #centroids occupancy relation — both
    shuffles bounded by index cardinality, never touching the vectors."""
    lists = ivf_inverted_lists(spark, sf_dir)
    occ = lists.groupBy("cid").agg(F.count(F.lit(1)).alias("cell_size"))
    return occ.groupBy("cell_size").agg(
        F.count(F.lit(1)).cast("long").alias("n_cells"),
        (F.col("cell_size") * F.count(F.lit(1))).cast("long").alias("n_vecs"),
    ).select(F.col("cell_size").cast("long").alias("cell_size"), "n_cells", "n_vecs")


MRL_PREFIX_DIMS = 16  # audit the first 16 of 64 dims (4x truncation)


@query(
    "sim_matryoshka_prefix_recall",
    oracle=f"""
    WITH v AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
      FROM embeddings
    ),
    pv AS (SELECT vec_id, e[1:{MRL_PREFIX_DIMS}] AS e FROM v),
    full_rank AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             ROW_NUMBER() OVER (
               PARTITION BY q.vec_id
               ORDER BY {SQL_COSINE.format(a='q.e', b='c.e')} DESC, c.vec_id
             ) AS rn
      FROM v q JOIN v c ON q.vec_id < 5 AND q.vec_id <> c.vec_id
    ),
    pfx_rank AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             ROW_NUMBER() OVER (
               PARTITION BY q.vec_id
               ORDER BY {SQL_COSINE.format(a='q.e', b='c.e')} DESC, c.vec_id
             ) AS rn
      FROM pv q JOIN pv c ON q.vec_id < 5 AND q.vec_id <> c.vec_id
    )
    SELECT f.query_id,
           CAST(COUNT(p.neighbor_id) AS BIGINT) AS n_overlap,
           CAST(COUNT(p.neighbor_id) * 10000 // 5 AS BIGINT) AS recall_e4
    FROM (SELECT * FROM full_rank WHERE rn <= 5) f
    LEFT JOIN (SELECT * FROM pfx_rank WHERE rn <= 5) p
      ON f.query_id = p.query_id AND f.neighbor_id = p.neighbor_id
    GROUP BY f.query_id
    """,
    tags=("similarity", "ann", "matryoshka", "audit"),
)
def sim_matryoshka_prefix_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka/dimension-truncation audit: recall@5 of brute-force
    search over only the first {MRL_PREFIX_DIMS} embedding dimensions
    against full-dimension ground truth, per probe — the measurement
    behind "can we shrink the index 4x?" decisions (MRL-trained models
    hold recall high under prefix truncation; a model that wasn't will
    crater here, and this query is how you find out before rebuilding a
    100 TB index at the wrong width).

    Scale shape: both rankings are probe-confined brute force (probes
    broadcast into one linear corpus scan each — the ground-truth pattern
    of sim_topk_bruteforce); the overlap join and rollup touch only
    5 x k rank rows. At 100 TB you run it on a sampled probe set, which
    is exactly what the vec_id < 5 gate is."""
    v = _vecs(spark, sf_dir)
    pv = v.select("vec_id", F.slice("e", 1, MRL_PREFIX_DIMS).alias("e"))

    def top5(rel: DataFrame) -> DataFrame:
        q = rel.filter(F.col("vec_id") < 5).select(
            F.col("vec_id").alias("query_id"), F.col("e").alias("qe")
        )
        w = Window.partitionBy("query_id").orderBy(
            F.desc("cos"), "neighbor_id"
        )
        return (
            rel.join(F.broadcast(q), rel["vec_id"] != q["query_id"])
            .select(
                "query_id", F.col("vec_id").alias("neighbor_id"),
                cosine(F.col("qe"), F.col("e")).alias("cos"),
            )
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= 5)
            .select("query_id", "neighbor_id")
        )

    truth = top5(v)
    pfx = top5(pv).withColumnRenamed("neighbor_id", "p_neighbor")
    return (
        truth.join(
            pfx,
            (truth["query_id"] == pfx["query_id"])
            & (truth["neighbor_id"] == pfx["p_neighbor"]),
            "left",
        )
        .groupBy(truth["query_id"].alias("query_id"))
        .agg(F.count("p_neighbor").cast("long").alias("n_overlap"))
        .select(
            "query_id", "n_overlap",
            F.expr("(n_overlap * 10000) div 5").alias("recall_e4"),
        )
    )


def sim_ivf_search(
    spark: SparkSession, sf_dir: str, probes: DataFrame, k: int = 5,
    nprobe: int = IVF_NPROBE,
    extra_lists: DataFrame | None = None,
    base_lists: DataFrame | None = None,
) -> DataFrame:
    """IVF ANN top-k for EXTERNAL probe vectors — the query-time path over
    the materialized inverted lists, mirroring sim_lsh_search's contract:
    `probes` is (query_id long, e array<double>); `extra_lists` grafts
    streamed (vec_id, e, cid) rows (streaming.embeddings_stream's IVF
    sink) without touching the base lists; `base_lists` REPLACES the
    corpus-derived lists entirely (the folded-generation read path).

    Scale shape: probes x centroids broadcast scoring picks nprobe lists
    per query; the corpus side contributes only those lists' rows via a
    cid equi-join — never a full scan."""
    v = _vecs(spark, sf_dir)
    lists = (
        base_lists if base_lists is not None
        else ivf_inverted_lists(spark, sf_dir)
    )
    if extra_lists is not None:
        lists = lists.unionByName(extra_lists)
    arn_w = Window.partitionBy("query_id").orderBy(
        F.desc(cosine(F.col("qe"), F.col("ce"))), "cid"
    )
    picked = (
        probes.select(F.col("query_id"), F.col("e").alias("qe"))
        .crossJoin(F.broadcast(_centroids(v)))
        .withColumn("arn", F.row_number().over(arn_w))
        .filter(F.col("arn") <= nprobe)
        .select("query_id", "qe", F.col("cid").alias("pcid"))
    )
    scored = lists.join(
        F.broadcast(picked),
        (F.col("cid") == F.col("pcid")) & (F.col("vec_id") != F.col("query_id")),
    ).select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        cosine(F.col("qe"), F.col("e")).alias("cos"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), "neighbor_id")
    return (
        scored.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "cos", "rn")
    )


def ivf_assign_to_corpus_centroids(
    spark: SparkSession, sf_dir: str, vecs: DataFrame
) -> DataFrame:
    """Assign external (vec_id, e) vectors to the CORPUS's stride
    centroids — the map-side step of streaming IVF ingest (same argmin
    the base index build uses, over a broadcast centroid set)."""
    arn_w = Window.partitionBy("vec_id").orderBy(
        F.desc(cosine(F.col("e"), F.col("ce"))), "cid"
    )
    return (
        vecs.crossJoin(F.broadcast(_centroids(_vecs(spark, sf_dir))))
        .withColumn("arn", F.row_number().over(arn_w))
        .filter(F.col("arn") == 1)
        .select("vec_id", "e", "cid")
    )


_SQL_NPROBE_BASE = f"""
    WITH v AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
      FROM embeddings
    ),
    cent AS (SELECT vec_id AS cid, e AS ce FROM v WHERE vec_id % {IVF_STRIDE} = 0),
    assign_scored AS (
      SELECT v.vec_id, v.e, cent.cid,
             ROW_NUMBER() OVER (
               PARTITION BY v.vec_id
               ORDER BY {SQL_COSINE.format(a='v.e', b='cent.ce')} DESC, cent.cid
             ) AS arn
      FROM v CROSS JOIN cent
    ),
    assigned AS (SELECT vec_id, e, cid FROM assign_scored WHERE arn = 1),
    truth AS (
      SELECT query_id, neighbor_id FROM (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               ROW_NUMBER() OVER (
                 PARTITION BY q.vec_id
                 ORDER BY {SQL_COSINE.format(a='q.e', b='c.e')} DESC, c.vec_id
               ) AS rn
        FROM v q JOIN v c ON q.vec_id < 5 AND q.vec_id <> c.vec_id
      ) WHERE rn <= 5
    )
"""


@query(
    "sim_ivf_nprobe_curve",
    oracle=_SQL_NPROBE_BASE
    + "\n UNION ALL ".join(
        f"""
      SELECT CAST({np} AS BIGINT) AS nprobe,
             CAST(COUNT(h.neighbor_id) AS BIGINT) AS n_hits,
             CAST(COUNT(h.neighbor_id) * 10000 // 25 AS BIGINT) AS recall_e4
      FROM truth t LEFT JOIN (
        SELECT query_id, neighbor_id FROM (
          SELECT p.query_id, a.vec_id AS neighbor_id,
                 ROW_NUMBER() OVER (
                   PARTITION BY p.query_id
                   ORDER BY {SQL_COSINE.format(a='p.qe', b='a.e')} DESC, a.vec_id
                 ) AS rn
          FROM (SELECT vec_id AS query_id, e AS qe, cid
                FROM assign_scored WHERE vec_id < 5 AND arn <= {np}) p
          JOIN assigned a ON p.cid = a.cid AND p.query_id <> a.vec_id
        ) WHERE rn <= 5
      ) h ON h.query_id = t.query_id AND h.neighbor_id = t.neighbor_id
    """
        for np in (1, 2, 3, 4)
    ),
    tags=("similarity", "ann", "ivf", "tuning"),
)
def sim_ivf_nprobe_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF recall-vs-nprobe tuning curve: recall@5 against brute-force
    ground truth at nprobe 1..4 — the IVF twin of
    `dedup_minhash_band_tuning`'s LSH S-curve, and the measurement behind
    "how many lists must a query touch?" (each +1 nprobe buys recall at
    a linear scan-cost increase; the knee of this curve is the production
    setting). 25 truth pairs (5 probes x top-5), integer hits and
    basis-point recall — hash bit-stable.

    Scale shape: ONE brute-force pass for the sampled ground truth, then
    four probe-confined list scans that REUSE the materialized inverted
    lists; every arm reduces to one aggregate row before the 4-row
    union. At 100 TB the probe set is a sample, exactly like the
    recall audit."""
    v = _vecs(spark, sf_dir)
    lists = ivf_inverted_lists(spark, sf_dir)
    probes = v.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("e").alias("qe")
    )
    truth_w = Window.partitionBy("query_id").orderBy(F.desc("cos"), "neighbor_id")
    truth = (
        v.join(F.broadcast(probes), v["vec_id"] != probes["query_id"])
        .select(
            "query_id", F.col("vec_id").alias("neighbor_id"),
            cosine(F.col("qe"), F.col("e")).alias("cos"),
        )
        .withColumn("rn", F.row_number().over(truth_w))
        .filter(F.col("rn") <= 5)
        .select("query_id", "neighbor_id")
    )
    arn_w = Window.partitionBy("query_id").orderBy(
        F.desc(cosine(F.col("qe"), F.col("ce"))), "cid"
    )
    probe_cells = (
        probes.crossJoin(F.broadcast(_centroids(v)))
        .withColumn("arn", F.row_number().over(arn_w))
        .select("query_id", "qe", "cid", "arn")
    )
    arms = []
    for np_ in (1, 2, 3, 4):
        picked = probe_cells.filter(F.col("arn") <= np_).select(
            "query_id", "qe", F.col("cid").alias("pcid")
        )
        got = (
            lists.join(
                F.broadcast(picked),
                (F.col("cid") == F.col("pcid"))
                & (F.col("vec_id") != F.col("query_id")),
            )
            .select(
                "query_id", F.col("vec_id").alias("neighbor_id"),
                cosine(F.col("qe"), F.col("e")).alias("cos"),
            )
            .withColumn("rn", F.row_number().over(truth_w))
            .filter(F.col("rn") <= 5)
            .select("query_id", F.col("neighbor_id").alias("h_neighbor"))
        )
        arms.append(
            truth.join(
                got,
                (truth["query_id"] == got["query_id"])
                & (truth["neighbor_id"] == got["h_neighbor"]),
                "left",
            ).agg(
                F.lit(np_).cast("long").alias("nprobe"),
                F.count("h_neighbor").cast("long").alias("n_hits"),
                F.expr("(count(h_neighbor) * 10000) div 25").alias("recall_e4"),
            )
        )
    out = arms[0]
    for a in arms[1:]:
        out = out.unionByName(a)
    return out


IVF_DIVERSITY_K = 2
IVF_DIVERSITY_SALT = "ivfdiv1"


@query(
    "sample_ivf_diversity",
    oracle=f"""
    WITH v AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
      FROM embeddings
    ),
    cent AS (SELECT vec_id AS cid, e AS ce FROM v WHERE vec_id % {IVF_STRIDE} = 0),
    assign_scored AS (
      SELECT v.vec_id, cent.cid,
             ROW_NUMBER() OVER (
               PARTITION BY v.vec_id
               ORDER BY {SQL_COSINE.format(a='v.e', b='cent.ce')} DESC, cent.cid
             ) AS arn
      FROM v CROSS JOIN cent
    ),
    assigned AS (SELECT vec_id, cid FROM assign_scored WHERE arn = 1)
    SELECT vec_id, cid, CAST(rk AS BIGINT) AS rk FROM (
      SELECT vec_id, cid,
             row_number() OVER (
               PARTITION BY cid
               ORDER BY md5(CAST(vec_id AS VARCHAR) || ':{IVF_DIVERSITY_SALT}'),
                        vec_id
             ) AS rk
      FROM assigned
    ) WHERE rk <= {IVF_DIVERSITY_K}
    """,
    tags=("similarity", "sampling", "ivf", "diversity"),
)
def sample_ivf_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diversity-balanced subsample of the embedding corpus: exactly
    {IVF_DIVERSITY_K} vectors per IVF cell, chosen by salted-md5 rank —
    stratified sampling where the strata are SEMANTIC-SPACE regions
    (k-means-style cells) instead of metadata columns. This is the
    coreset shape behind "train on less, cover the distribution":
    uniform sampling over-represents dense regions; per-cell budgets
    cap every mode's share. Membership is a pure function of vec_id and
    the salt, so re-runs, engines, and partitionings agree bit-exactly.

    Scale shape: the cell assignment is READ from the materialized,
    cid-partitioned inverted lists (built once per corpus — the same
    index every IVF search probes), so the sample costs one per-cell
    window rank over (vec_id, cid) pairs — the grouped-top-k idiom on
    the cell key, never touching vector payloads."""
    lists = ivf_inverted_lists(spark, sf_dir).select("vec_id", "cid")
    key = F.md5(
        F.concat(F.col("vec_id").cast("string"), F.lit(f":{IVF_DIVERSITY_SALT}"))
    )
    w = Window.partitionBy("cid").orderBy(key, "vec_id")
    return (
        lists.select("vec_id", "cid", F.row_number().over(w).alias("rk"))
        .filter(F.col("rk") <= IVF_DIVERSITY_K)
        .select("vec_id", "cid", F.col("rk").cast("long").alias("rk"))
    )


SRP_CAL_PROBES = 8  # calibration probe set: vec_id < 8 (linear, never n²)


@query(
    "sim_srp_hamming_calibration",
    oracle=f"""
    WITH v AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
      FROM embeddings
    ),
    b AS ({_sql_tables('e')}),
    sigs AS (
      SELECT vec_id,
             MAX(CASE WHEN t = 0 THEN bucket END) AS b0,
             MAX(CASE WHEN t = 1 THEN bucket END) AS b1,
             MAX(CASE WHEN t = 2 THEN bucket END) AS b2,
             MAX(CASE WHEN t = 3 THEN bucket END) AS b3
      FROM b GROUP BY vec_id
    )
    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           CAST(bit_count(xor(sq.b0, sc.b0)) + bit_count(xor(sq.b1, sc.b1))
              + bit_count(xor(sq.b2, sc.b2)) + bit_count(xor(sq.b3, sc.b3))
              AS BIGINT) AS hamming,
           {SQL_COSINE.format(a='q.e', b='c.e')} AS cos
    FROM v q
    JOIN v c ON q.vec_id < {SRP_CAL_PROBES} AND q.vec_id <> c.vec_id
    JOIN sigs sq ON sq.vec_id = q.vec_id
    JOIN sigs sc ON sc.vec_id = c.vec_id
    """,
    tags=("similarity", "lsh", "sketch-accuracy"),
)
def sim_srp_hamming_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SRP sketch-accuracy audit, the embedding twin of
    dedup_minhash_jaccard_est: for every (probe, corpus) pair, the
    {N_TABLES * N_PLANES}-bit signature Hamming distance next to the
    exact cosine. Hamming/bits estimates the angle/π (the SRP collision
    identity), so this per-pair relation is how a deployment calibrates
    its multi-probe radius and band geometry: plot cosine against
    Hamming, pick the flip budget that covers the cosine band you dedup
    at. Left un-averaged on purpose — mean-of-doubles is aggregation-
    order-dependent; the integer distance and the framework's bit-stable
    cosine hash exactly.

    Scale shape: signatures come from the MATERIALIZED bucket index
    pivoted to one row per vector (4 integer columns, no re-hashing);
    the probe fence ({SRP_CAL_PROBES} probes × corpus) keeps pair count
    linear in the corpus like sim_topk_bruteforce, and both fetch joins
    broadcast the tiny probe side."""
    v = _vecs(spark, sf_dir)
    sigs = (
        lsh_bucket_index(spark, sf_dir)
        .groupBy("vec_id")
        .agg(*[
            F.max(F.when(F.col("t") == t, F.col("bucket"))).alias(f"b{t}")
            for t in range(N_TABLES)
        ])
    )
    probes = v.filter(F.col("vec_id") < SRP_CAL_PROBES).select(
        F.col("vec_id").alias("query_id"), F.col("e").alias("qe")
    )
    cand = v.select(F.col("vec_id").alias("neighbor_id"), "e").join(
        F.broadcast(probes), F.col("neighbor_id") != F.col("query_id")
    )
    sq = sigs.select(
        F.col("vec_id").alias("query_id"),
        *[F.col(f"b{t}").alias(f"q{t}") for t in range(N_TABLES)],
    )
    sc = sigs.select(
        F.col("vec_id").alias("neighbor_id"),
        *[F.col(f"b{t}").alias(f"c{t}") for t in range(N_TABLES)],
    )
    hamming = reduce(
        lambda x, y: x + y,
        [
            F.bit_count(F.col(f"q{t}").bitwiseXOR(F.col(f"c{t}")))
            for t in range(N_TABLES)
        ],
    )
    return (
        cand.join(F.broadcast(sq), "query_id")
        .join(sc, "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            hamming.cast("long").alias("hamming"),
            cosine(F.col("qe"), F.col("e")).alias("cos"),
        )
    )


# --- MMR diversified retrieval ----------------------------------------------

MMR_PROBE_MOD = 211   # sparse probe set: MMR is a per-query reranking stage
MMR_CAND = 8          # relevance candidates fed to the greedy selection
MMR_K = 3             # diversified picks per query
# λ = 0.7 as the integer pair (7, 3): score = 7·rel − 3·max-sim-to-selected
_MMR_DOT = (
    "CAST(list_sum(list_transform(list_zip({a}, {b}),"
    " x -> CAST(x[1] AS BIGINT) * x[2])) AS BIGINT)"
)


@query(
    "sim_mmr_diversify",
    oracle=f"""
    WITH v AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
      FROM embeddings
    ),
    s AS (SELECT MAX(list_max(list_transform(e, x -> abs(x)))) AS gmax FROM v),
    qv AS (
      SELECT vec_id,
             list_transform(e, x -> CAST(FLOOR(x * 127.0 / s.gmax) AS INT)) AS qe
      FROM v, s
    ),
    probes AS (
      SELECT vec_id AS query_id, qe AS pq FROM qv
      WHERE vec_id % {MMR_PROBE_MOD} = 3
    ),
    scored AS (
      SELECT p.query_id, v.vec_id AS neighbor_id, v.qe AS qe,
             {_MMR_DOT.format(a='p.pq', b='v.qe')} AS qdot
      FROM probes p JOIN qv v ON v.vec_id <> p.query_id
    ),
    cand AS (
      SELECT * FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                     ORDER BY qdot DESC, neighbor_id) AS rn
        FROM scored
      ) WHERE rn <= {MMR_CAND}
    ),
    sel1 AS (SELECT query_id, neighbor_id, qe, qdot FROM cand WHERE rn = 1),
    pool2 AS (
      SELECT c.query_id, c.neighbor_id, c.qe, c.qdot,
             {_MMR_DOT.format(a='c.qe', b='s1.qe')} AS sim1
      FROM cand c JOIN sel1 s1 ON s1.query_id = c.query_id
      WHERE c.rn > 1
    ),
    r2 AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY 7 * qdot - 3 * sim1 DESC,
                                            neighbor_id) AS r
      FROM pool2
    ),
    sel2 AS (SELECT query_id, neighbor_id, qe, qdot FROM r2 WHERE r = 1),
    pool3 AS (
      SELECT p.query_id, p.neighbor_id, p.qdot,
             GREATEST(p.sim1, {_MMR_DOT.format(a='p.qe', b='s2.qe')}) AS maxsim
      FROM r2 p JOIN sel2 s2 ON s2.query_id = p.query_id
      WHERE p.r > 1
    ),
    r3 AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY 7 * qdot - 3 * maxsim DESC,
                                            neighbor_id) AS r
      FROM pool3
    )
    SELECT query_id, neighbor_id, qdot, CAST(1 AS BIGINT) AS mmr_rank FROM sel1
    UNION ALL
    SELECT query_id, neighbor_id, qdot, CAST(2 AS BIGINT) FROM sel2
    UNION ALL
    SELECT query_id, neighbor_id, qdot, CAST(3 AS BIGINT) FROM r3 WHERE r = 1
    """,
    tags=("similarity", "mmr", "diversity"),
)
def sim_mmr_diversify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal Marginal Relevance (Carbonell-Goldstein) diversified top-3
    per probe: greedily pick the candidate maximizing
    λ·relevance − (1−λ)·max-similarity-to-already-selected with λ = 0.7 —
    the dedup-aware retrieval stage that keeps a curation batch from
    spending its budget on near-identical neighbors. {MMR_K} unrolled
    greedy steps over the top-{MMR_CAND} int8-dot candidates; every score
    is integer (7·rel − 3·sim over int8 dot products, ties to the lowest
    neighbor id), so both engines select bit-identically — the unrolled-
    iteration parity discipline of graph_pagerank_parts applied to greedy
    subset selection.

    Scale shape: relevance scoring streams the corpus once against the
    broadcast probe set (the sim_sq_topk shape) and keeps {MMR_CAND} rows
    per query past the shuffle; the greedy stage then works on that
    ≤{MMR_CAND}-row-per-query relation — per-step joins are query-keyed
    and candidate-bounded, so the selection costs nothing at corpus
    scale. The candidate relation is lazily checkpointed: three unrolled
    steps reference it, and without truncation each reference replays the
    corpus scoring join (no CacheManager entry — the r12 discipline).
    The int8 corpus is the PQ index's materialized `qvecs` relation —
    IDENTICAL quantization (floor(x·127/gmax), global gmax), so the
    quantization pass never runs at query time; the oracle replays it
    from the raw table, pinning the equivalence."""
    qv = pq_code_index(spark, sf_dir)["qvecs"]
    probes = qv.filter(F.col("vec_id") % MMR_PROBE_MOD == 3).select(
        F.col("vec_id").alias("query_id"), F.col("qe").alias("pq")
    )

    def idot(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: x.cast("long") * y),
            F.lit(0).cast("long"),
            lambda acc, t: acc + t,
        )

    scored = qv.join(
        F.broadcast(probes), F.col("vec_id") != F.col("query_id")
    ).select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        "qe",
        idot(F.col("pq"), F.col("qe")).alias("qdot"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("qdot"), "neighbor_id")
    cand = (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= MMR_CAND)
        .localCheckpoint(eager=False)
    )
    sel1 = cand.filter(F.col("rn") == 1).select(
        "query_id",
        F.col("neighbor_id").alias("s1_id"),
        F.col("qe").alias("s1_qe"),
        F.col("qdot").alias("s1_qdot"),
    )
    # The checkpointed `cand` is a LogicalRDD with NO size statistics, so
    # Catalyst plans every per-step join as sort-merge (the r10 CC lesson:
    # stats loss silently degrades broadcast to SMJ — measured here as 4
    # SortMergeJoins + 10 Sorts in the r16 before-plan). sel1/sel2 are one
    # row per query (|probes| rows, KBs), so broadcast them explicitly:
    # the greedy-step joins become BroadcastHashJoins with no exchange on
    # the candidate side at ANY scale — |queries| is the probe budget, not
    # the corpus.
    pool2 = (
        cand.filter(F.col("rn") > 1)
        .join(F.broadcast(sel1), "query_id")
        .select(
            "query_id", "neighbor_id", "qe", "qdot",
            idot(F.col("qe"), F.col("s1_qe")).alias("sim1"),
        )
    )
    w2 = Window.partitionBy("query_id").orderBy(
        F.desc(7 * F.col("qdot") - 3 * F.col("sim1")), "neighbor_id"
    )
    r2 = pool2.withColumn("r", F.row_number().over(w2))
    sel2 = r2.filter(F.col("r") == 1).select(
        "query_id",
        F.col("neighbor_id").alias("s2_id"),
        F.col("qe").alias("s2_qe"),
        F.col("qdot").alias("s2_qdot"),
    )
    pool3 = (
        r2.filter(F.col("r") > 1)
        .join(F.broadcast(sel2), "query_id")
        .select(
            "query_id", "neighbor_id", "qdot",
            F.greatest(
                F.col("sim1"), idot(F.col("qe"), F.col("s2_qe"))
            ).alias("maxsim"),
        )
    )
    w3 = Window.partitionBy("query_id").orderBy(
        F.desc(7 * F.col("qdot") - 3 * F.col("maxsim")), "neighbor_id"
    )
    sel3 = pool3.withColumn("r", F.row_number().over(w3)).filter(
        F.col("r") == 1
    )
    one = sel1.select(
        "query_id", F.col("s1_id").alias("neighbor_id"),
        F.col("s1_qdot").alias("qdot"), F.lit(1).cast("long").alias("mmr_rank"),
    )
    two = sel2.select(
        "query_id", F.col("s2_id").alias("neighbor_id"),
        F.col("s2_qdot").alias("qdot"), F.lit(2).cast("long").alias("mmr_rank"),
    )
    three = sel3.select(
        "query_id", "neighbor_id", "qdot", F.lit(3).cast("long").alias("mmr_rank")
    )
    return one.unionByName(two).unionByName(three)


@query(
    "sim_hard_negatives",
    oracle=f"""
    WITH v AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
      FROM embeddings
    ),
    b AS ({_sql_tables('e')}),
    ab AS (
      SELECT DISTINCT vec_id, t,
             xor(bucket, CASE WHEN fl.f = -1 THEN 0 ELSE (1 << fl.f) END) AS bucket
      FROM b CROSS JOIN (SELECT unnest(range(-1, {N_PLANES})) AS f) fl
    ),
    cand AS (
      SELECT DISTINCT ab.vec_id AS i, b.vec_id AS j
      FROM ab JOIN b ON ab.t = b.t AND ab.bucket = b.bucket AND ab.vec_id <> b.vec_id
    ),
    scored AS (
      SELECT c.i, c.j, li.label AS label_i, lj.label AS label_j,
             {SQL_COSINE.format(a='x.e', b='y.e')} AS cos
      FROM cand c JOIN v x ON x.vec_id = c.i JOIN v y ON y.vec_id = c.j
                  JOIN embeddings li ON li.vec_id = c.i
                  JOIN embeddings lj ON lj.vec_id = c.j
    ),
    neg AS (
      SELECT i, label_i, j, label_j, cos,
             ROW_NUMBER() OVER (PARTITION BY i ORDER BY cos DESC, j) AS rn
      FROM scored WHERE label_j <> label_i
    ),
    pos AS (
      SELECT i, MAX(cos) AS pos_cos FROM scored
      WHERE label_j = label_i GROUP BY i
    )
    SELECT n.i AS vec_id, n.label_i AS label, n.j AS hard_neg_id,
           n.label_j AS hard_neg_label, n.cos AS neg_cos, p.pos_cos AS pos_cos,
           p.pos_cos IS NOT NULL AND n.cos >= p.pos_cos AS is_violation
    FROM neg n LEFT JOIN pos p ON p.i = n.i
    WHERE n.rn = 1
    """,
    tags=("similarity", "contrastive", "hard-negatives"),
)
def sim_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining for contrastive training: for every anchor,
    the highest-cosine CROSS-label neighbor from the LSH multi-probe
    candidate set, next to the anchor's best same-label cosine — the
    (anchor, hard negative, margin) triples a metric-learning pipeline
    feeds its loss, plus the `is_violation` flag (a positive exists
    AND the negative is at least as close) that ranks which anchors the
    next epoch should focus on. Anchors whose probe neighborhood is all same-label emit no
    row: they have no mineable negative at this probe radius.

    Scale shape: identical to sim_knn_label_agreement — candidates come
    from the bucket-index self-join (work ∝ bucket co-occupancy, never
    n²), labels ride two broadcastable fetch joins, and both the per-
    anchor argmax window and the positive-max aggregate are keyed on the
    anchor id (uniform shuffles, no hot key). The margin is identical
    scalar double math on both engines over order-stable dot products."""
    v = _vecs(spark, sf_dir)
    b = lsh_bucket_index(spark, sf_dir)
    flips = F.explode(F.array(*[F.lit(x) for x in range(-1, lsh_planes(sf_dir))]))
    ab = b.withColumn("flip", flips).select(
        F.col("vec_id").alias("i"),
        "t",
        F.col("bucket").bitwiseXOR(
            F.when(F.col("flip") < 0, F.lit(0))
            .otherwise(F.expr("shiftleft(1, flip)"))
        ).alias("bucket"),
    )
    # widen the expansion join: without this the ~|pairs| join output and
    # the distinct behind it serialize onto the index's few scan
    # partitions (measured 48s -> 9s on the 50M-pair sf1 distinct at
    # local[32]); kept UNCONDITIONAL here like sim_knn_label_agreement —
    # the r16 A/B measured this query 20% slower without the exchange
    # even at sf0.1 (steady_med 3.09 vs 2.56), the capped-window join
    # side and the all-pairs scoring inherit the anchor's parallelism
    ab = ab.repartition(spark.sparkContext.defaultParallelism * 2)
    cand = (
        # join side bucket-overflow-capped (KNN_BUCKET_CAP): bounds the
        # dense-cluster quadratic term; anchors probe all their buckets
        ab.join(_capped_index_side(b), ["t", "bucket"])
        .filter(F.col("i") != F.col("vec_id"))
        .select("i", F.col("vec_id").alias("j"))
        .distinct()
    )
    vn = v.select(
        "vec_id", "e", F.sqrt(dot_cols(F.col("e"), F.col("e"))).alias("nrm")
    )
    lab = load_table(spark, sf_dir, "embeddings").select("vec_id", "label")
    cos = dot_cols(F.col("x.e"), F.col("y.e")) / (F.col("x.nrm") * F.col("y.nrm"))
    scored = (
        cand.join(vn.alias("x"), cand["i"] == F.col("x.vec_id"))
        .join(vn.alias("y"), cand["j"] == F.col("y.vec_id"))
        .join(
            lab.select(F.col("vec_id").alias("i2"), F.col("label").alias("label_i")),
            F.col("i") == F.col("i2"),
        )
        .join(
            lab.select(F.col("vec_id").alias("j2"), F.col("label").alias("label_j")),
            F.col("j") == F.col("j2"),
        )
        .select("i", "j", "label_i", "label_j", cos.alias("cos"))
    )
    wn = Window.partitionBy("i").orderBy(F.desc("cos"), "j")
    neg = (
        scored.filter(F.col("label_j") != F.col("label_i"))
        .withColumn("rn", F.row_number().over(wn))
        .filter(F.col("rn") == 1)
    )
    pos = (
        scored.filter(F.col("label_j") == F.col("label_i"))
        .groupBy("i")
        .agg(F.max("cos").alias("pos_cos"))
    )
    return neg.join(pos, "i", "left").select(
        F.col("i").alias("vec_id"),
        F.col("label_i").alias("label"),
        F.col("j").alias("hard_neg_id"),
        F.col("label_j").alias("hard_neg_label"),
        F.col("cos").alias("neg_cos"),
        "pos_cos",
        (F.col("pos_cos").isNotNull() & (F.col("cos") >= F.col("pos_cos")))
        .alias("is_violation"),
    )

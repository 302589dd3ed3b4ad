"""Streaming embedding ingest: the vector-side twin of the MinHash
signature-store growth pattern (documents_stream.py).

New vectors land as parquet files; each micro-batch is bucket-hashed into
the SAME (vec_id, t, bucket) SRP layout as the materialized base index
(`operators.similarity.bucket_assignments` — identical planes, identical
buckets), and both the bucket rows and the double-cast vectors are written
one partition per micro-batch. Searches (`sim_lsh_search` /
`sim_lsh_range_search` machinery) union the streamed partitions in via
`extra_buckets`/`extra_vecs`, so late-arriving vectors are searchable
without ever mutating the base index — it stays fingerprinted by corpus
file identity for concurrent readers, exactly like the signature store.

Idempotence discipline (same as the document sinks): a replay of batch N
overwrites ONLY batch N's own partitions, and reads hard-gate on _SUCCESS
so a crashed partial write never leaks into a later batch's corpus view.

At 100 TB this is the online half of a vector-index pipeline: hashing is
paid once per arriving vector inside the micro-batch (map-side, no
shuffle — explode to 4 rows/vector), the store is append-only partitioned
parquet, and a periodic compaction can fold streamed partitions into the
base index by rebuilding its fingerprint."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EMB_SCHEMA = "vec_id long, embedding array<float>"
LABELED_EMB_SCHEMA = "vec_id long, label int, embedding array<float>"


def read_embedding_stream(spark: SparkSession, landing_dir: str) -> DataFrame:
    """File-source stream of (vec_id, embedding float[]) parquet drops —
    same landing pattern as read_document_stream."""
    return spark.readStream.schema(EMB_SCHEMA).parquet(landing_dir)


def read_labeled_embedding_stream(
    spark: SparkSession, landing_dir: str
) -> DataFrame:
    """(vec_id, label, embedding) stream — the drift guard's input shape
    (label = the class/domain key whose centroid drift is monitored)."""
    return spark.readStream.schema(LABELED_EMB_SCHEMA).parquet(landing_dir)


def _success_parts(base_dir: str, exclude_batch_id: int | None = None) -> list[str]:
    """_SUCCESS-gated batch partitions, optionally excluding one batch
    (a replaying batch must not see its own partial prior write)."""
    if not os.path.isdir(base_dir):
        return []
    return [
        os.path.join(base_dir, d)
        for d in sorted(os.listdir(base_dir))
        if d.startswith("batch_id=")
        and (exclude_batch_id is None or d != f"batch_id={exclude_batch_id}")
        and os.path.exists(os.path.join(base_dir, d, "_SUCCESS"))
    ]


def read_streamed_buckets(
    spark: SparkSession, bucket_dir: str
) -> DataFrame | None:
    """Union of all committed streamed bucket partitions in the base-index
    row shape (vec_id, t, bucket) — pass as sim_lsh_search(extra_buckets=)."""
    parts = _success_parts(bucket_dir)
    if not parts:
        return None
    return spark.read.parquet(*parts).select("vec_id", "t", "bucket")


def read_streamed_vectors(spark: SparkSession, vec_dir: str) -> DataFrame | None:
    """Union of all committed streamed vector partitions as
    (vec_id, e array<double>) — pass as sim_lsh_search(extra_vecs=)."""
    parts = _success_parts(vec_dir)
    if not parts:
        return None
    return spark.read.parquet(*parts).select("vec_id", "e")


def read_dedup_verdicts(spark: SparkSession, out_dir: str) -> DataFrame:
    """Union of all committed per-batch dedup verdict partitions."""
    parts = _success_parts(out_dir)
    if not parts:
        raise FileNotFoundError(f"no committed verdict partitions in {out_dir}")
    return spark.read.parquet(*parts)


def make_embedding_dedup_sink(
    sf_dir: str, out_dir: str, tau: float | None = None,
    bucket_dir: str | None = None, vec_dir: str | None = None,
    index_root: str | None = None,
):
    """foreachBatch sink: semantic online dedup for a vector stream — the
    embedding twin of documents_stream.make_online_dedup_sink. Each
    micro-batch is flagged against the materialized base index PLUS every
    previously-accepted novel vector PLUS itself
    (operators.similarity.embedding_online_dedup); verdicts land in
    ``out_dir/batch_id=N/`` and accepted-novel vectors grow the streamed
    bucket/vector store, so the corpus the NEXT batch dedups against has
    grown. Overwriting the batch's own partitions keeps at-least-once
    replays exactly-once in effect (same discipline as the index sink).

    `index_root`: the fold_streamed_index generation store. When a
    committed generation exists the batch reads IT as the base corpus
    (it already contains the base index plus every folded batch) and
    grafts only the not-yet-folded streamed partitions — the corpus-side
    read stays one index layout wide however long the stream runs."""
    bucket_dir = bucket_dir if bucket_dir is not None else f"{out_dir}_buckets"
    vec_dir = vec_dir if vec_dir is not None else f"{bucket_dir}_vecs"

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        from denali_spark.operators.similarity import (
            DEDUP_COS_TAU,
            bucket_assignments,
            embedding_online_dedup,
            lsh_planes,
        )

        spark = batch_df.sparkSession
        v = batch_df.select(
            "vec_id",
            F.transform("embedding", lambda x: x.cast("double")).alias("e"),
        ).persist()
        prior_parts = _success_parts(bucket_dir, exclude_batch_id=batch_id)
        prior_vparts = _success_parts(vec_dir, exclude_batch_id=batch_id)
        folded = (
            read_folded_index(spark, index_root)
            if index_root is not None else None
        )
        verdicts = embedding_online_dedup(
            spark, sf_dir, v,
            tau if tau is not None else DEDUP_COS_TAU,
            corpus_buckets=(
                spark.read.parquet(*prior_parts).select("vec_id", "t", "bucket")
                if prior_parts else None
            ),
            corpus_vecs=(
                spark.read.parquet(*prior_vparts).select("vec_id", "e")
                if prior_vparts else None
            ),
            self_dedup=True,
            base_buckets=folded[0] if folded is not None else None,
            base_vecs=folded[1] if folded is not None else None,
        ).persist()
        verdicts.write.mode("overwrite").parquet(f"{out_dir}/batch_id={batch_id}")
        novel = verdicts.filter(~F.col("is_duplicate")).select("vec_id")
        accepted = v.join(F.broadcast(novel), "vec_id").persist()
        bucket_assignments(accepted, lsh_planes(sf_dir)).write.mode(
            "overwrite"
        ).parquet(f"{bucket_dir}/batch_id={batch_id}")
        _stamp_planes(f"{bucket_dir}/batch_id={batch_id}", lsh_planes(sf_dir))
        accepted.write.mode("overwrite").parquet(f"{vec_dir}/batch_id={batch_id}")
        accepted.unpersist()
        verdicts.unpersist()
        v.unpersist()

    return _sink


_PLANES_MARKER = "_PLANES"


def _stamp_planes(batch_dir: str, planes: int) -> None:
    """Record the SRP plane count a bucket batch was hashed with (an
    underscore file — parquet readers ignore it, like _SUCCESS). The fold
    refuses to mix geometries (see _require_batch_planes)."""
    with open(os.path.join(batch_dir, _PLANES_MARKER), "w") as f:
        f.write(str(planes))


def _require_batch_planes(store_dir: str, expected: int) -> None:
    """Every committed bucket batch must carry the corpus geometry's plane
    count: folding 8-plane buckets into a corpus whose consumers probe
    with an adaptive 9+ plane geometry would strand the streamed vectors
    in buckets no probe ever hits. Batches without a marker predate the
    stamp and are assumed base-geometry."""
    from denali_spark.operators.similarity import N_PLANES

    if not os.path.isdir(store_dir):
        return
    for name in os.listdir(store_dir):
        if not name.startswith("batch_id="):
            continue
        marker = os.path.join(store_dir, name, _PLANES_MARKER)
        got = N_PLANES
        if os.path.exists(marker):
            with open(marker) as f:
                got = int(f.read())
        if got != expected:
            raise ValueError(
                f"streamed bucket batch {name} was hashed with {got} SRP "
                f"planes but the corpus geometry resolves to {expected} — "
                "pass sf_dir to make_embedding_index_sink (and the dedup "
                "sink) so batches stamp the corpus-adaptive geometry, or "
                "remove the mismatched batches before folding"
            )


def make_embedding_index_sink(bucket_dir: str, vec_dir: str | None = None,
                              sf_dir: str | None = None):
    """foreachBatch sink: hash each micro-batch of vectors into the SRP
    bucket layout and append (bucket rows, double-cast vectors) as the
    batch's own partitions. Overwriting the batch's own partitions keeps
    at-least-once replays exactly-once in effect.

    sf_dir: the corpus the batches will fold into — its corpus-adaptive
    plane count (similarity.lsh_planes) must stamp the batch buckets or
    the fold would mix geometries; None keeps the base N_PLANES (correct
    for every local test scale)."""
    vec_dir = vec_dir if vec_dir is not None else f"{bucket_dir}_vecs"

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        from denali_spark.operators.similarity import (
            N_PLANES,
            bucket_assignments,
            lsh_planes,
        )

        planes = lsh_planes(sf_dir) if sf_dir is not None else N_PLANES
        v = batch_df.select(
            "vec_id",
            F.transform("embedding", lambda x: x.cast("double")).alias("e"),
        ).persist()
        bucket_assignments(v, planes).write.mode("overwrite").parquet(
            f"{bucket_dir}/batch_id={batch_id}"
        )
        _stamp_planes(f"{bucket_dir}/batch_id={batch_id}", planes)
        v.write.mode("overwrite").parquet(f"{vec_dir}/batch_id={batch_id}")
        v.unpersist()

    return _sink


# --- periodic compaction: fold streamed partitions into the base layout ---

def fold_streamed_index(
    spark: SparkSession,
    sf_dir: str,
    bucket_dir: str,
    vec_dir: str | None = None,
    index_root: str | None = None,
    keep_generations: int = 2,
) -> dict:
    """Compaction completing the online-index lifecycle the way
    rewrite_data_files completes the table lifecycle: rebuild the base
    bucket/vector layout from (current generation + committed streamed
    partitions), commit the new generation, then truncate the folded
    streamed partitions. Searches then pass the folded generation as
    sim_lsh_search(base_buckets=, base_vecs=) with NO grafts — identical
    results, but candidate generation is one co-partitioned index read
    again instead of base ∪ N micro-batch unions.

    Generational crash-safe protocol: streaming.fold (shared with the
    document signature fold). At 100 TB the fold is one
    repartition-by-(t, bucket) write of relations that are ~3 longs/
    table/vector — the same shuffle shape as the original ingest-time
    build, paid per compaction window rather than per search."""
    from denali_spark.engine.index_cache import (
        corpus_fingerprint,
        index_file_count,
    )
    from denali_spark.operators.similarity import (
        _vecs,
        lsh_bucket_index,
        lsh_geometry,
    )
    from denali_spark.streaming.fold import FoldRelation, fold_streamed_partitions

    vec_dir = vec_dir if vec_dir is not None else f"{bucket_dir}_vecs"
    index_root = index_root if index_root is not None else f"{bucket_dir}_folded"
    from denali_spark.operators.similarity import lsh_planes

    _require_batch_planes(bucket_dir, lsh_planes(sf_dir))
    n_files = index_file_count(sf_dir, "embeddings")
    corpus_key = corpus_fingerprint(
        sf_dir, "embeddings", f"{lsh_geometry(sf_dir)}f{n_files}"
    )
    return fold_streamed_partitions(
        spark, index_root, corpus_key,
        [
            FoldRelation(
                "buckets", bucket_dir,
                lambda: lsh_bucket_index(spark, sf_dir),
                ("vec_id", "t", "bucket"), n_files, ("t", "bucket"),
            ),
            FoldRelation(
                "vecs", vec_dir,
                lambda: _vecs(spark, sf_dir),
                ("vec_id", "e"), n_files,
            ),
        ],
        keep_generations=keep_generations,
    )


def read_folded_index(
    spark: SparkSession, index_root: str
) -> tuple[DataFrame, DataFrame] | None:
    """(buckets, vecs) of the committed folded generation, hard-gated on
    both _SUCCESS markers; None if no fold has run (searches then use the
    corpus-derived base index as usual)."""
    from denali_spark.streaming.fold import read_folded

    got = read_folded(spark, index_root, ("buckets", "vecs"))
    if got is None:
        return None
    return got["buckets"], got["vecs"]


# --- distribution-drift guard ------------------------------------------------

def _label_sums(df: DataFrame) -> DataFrame:
    """(label, n, sum_vec) per label — element-wise vector sums via
    posexplode + (label, pos) partial aggregation, reassembled in pos
    order. Cross-row array summation with no UDF; the shuffled relation
    is labels x dims, never raw vectors."""
    exploded = df.select("label", F.posexplode("e").alias("pos", "x"))
    by_pos = exploded.groupBy("label", "pos").agg(F.sum("x").alias("s"))
    sums = by_pos.groupBy("label").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "s"))),
            lambda st: st["s"],
        ).alias("sum_vec")
    )
    counts = df.groupBy("label").agg(F.count(F.lit(1)).alias("n"))
    return counts.join(sums, "label")


def make_embedding_drift_sink(
    sf_dir: str, out_dir: str, state_dir: str | None = None,
    alert_cos: float = 0.95,
):
    """foreachBatch sink: embedding DISTRIBUTION-DRIFT monitoring — the
    guard that catches a swapped/retrained upstream encoder before a
    drifted corpus poisons the index. Each micro-batch's vectors are
    scored by cosine against their label's RUNNING CENTROID (base corpus
    + every prior committed batch); per-label verdicts (n, mean/min
    cosine, drifted flag, new_label flag) land in ``out_dir/batch_id=N``
    and the batch's own (label, n, sum_vec) contribution grows the state
    store — same _SUCCESS-gated partition-per-batch replay discipline as
    every sink here.

    cos(v, centroid) == cos(v, sum_vec) (cosine is scale-invariant), so
    the state is exact integer-free vector sums — no running-mean float
    drift, and contributions from replays overwrite rather than
    re-accumulate. Scale shape (r11, closing the advice item): the
    corpus-wide base sums are materialized ONCE as a ``batch_id=-1``
    state partition on first run — not recomputed per micro-batch, which
    was a corpus × dims posexplode shuffle on every trigger — so each
    batch pays only its own posexplode (batch × dims) plus a labels ×
    dims state merge."""
    state_dir = state_dir if state_dir is not None else f"{out_dir}_state"

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        from denali_spark.operators.similarity import _vecs, cosine

        spark = batch_df.sparkSession
        v = batch_df.select(
            "vec_id", "label",
            F.transform("embedding", lambda x: x.cast("double")).alias("e"),
        ).persist()
        base_part = os.path.join(state_dir, "batch_id=-1")
        if not os.path.exists(os.path.join(base_part, "_SUCCESS")):
            base = _vecs(spark, sf_dir).join(
                spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
                    "vec_id", "label"
                ),
                "vec_id",
            ).select("label", "e")
            _label_sums(base).write.mode("overwrite").parquet(base_part)
        # every committed state partition: the -1 base seed plus prior
        # batches' contributions (never this batch's own partial write)
        prior = _success_parts(state_dir, exclude_batch_id=batch_id)
        both = spark.read.parquet(*prior).select("label", "n", "sum_vec")
        vec_merged = (
            both.select("label", F.posexplode("sum_vec").alias("pos", "x"))
            .groupBy("label", "pos")
            .agg(F.sum("x").alias("s"))
            .groupBy("label")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "s"))),
                    lambda st: st["s"],
                ).alias("sum_vec")
            )
        )
        state = both.groupBy("label").agg(F.sum("n").alias("n")).join(
            vec_merged, "label"
        )
        scored = v.join(
            F.broadcast(state.select("label", "sum_vec")), "label", "left"
        ).select(
            "label",
            F.when(
                F.col("sum_vec").isNotNull(),
                cosine(F.col("e"), F.col("sum_vec")),
            ).alias("cos"),
        )
        verdicts = scored.groupBy("label").agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.avg("cos").alias("mean_cos"),
            F.min("cos").alias("min_cos"),
            (F.count(F.lit(1)) - F.count("cos") > 0).alias("new_label"),
        ).select(
            "label", "n", "mean_cos", "min_cos", "new_label",
            (
                F.col("new_label")
                | (F.col("mean_cos") < F.lit(alert_cos))
            ).alias("drifted"),
        )
        verdicts.write.mode("overwrite").parquet(f"{out_dir}/batch_id={batch_id}")
        _label_sums(v.select("label", "e")).write.mode("overwrite").parquet(
            f"{state_dir}/batch_id={batch_id}"
        )
        v.unpersist()

    return _sink


# --- IVF online lifecycle (third index type through the shared fold) --------

def read_streamed_lists(spark: SparkSession, list_dir: str) -> DataFrame | None:
    """Union of all committed streamed IVF list rows (vec_id, e, cid) —
    pass as sim_ivf_search(extra_lists=)."""
    parts = _success_parts(list_dir)
    if not parts:
        return None
    return spark.read.parquet(*parts).select("vec_id", "e", "cid")


def make_ivf_index_sink(sf_dir: str, list_dir: str):
    """foreachBatch sink: assign each micro-batch of vectors to the corpus
    stride centroids (map-side argmin over a broadcast centroid set —
    operators.similarity.ivf_assign_to_corpus_centroids) and append the
    (vec_id, e, cid) rows as the batch's own partition. Same replay
    discipline as the SRP bucket sink; the same vector can ride both
    sinks, giving LSH and IVF searches one consistent online corpus."""

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        from denali_spark.operators.similarity import (
            ivf_assign_to_corpus_centroids,
        )

        spark = batch_df.sparkSession
        v = batch_df.select(
            "vec_id",
            F.transform("embedding", lambda x: x.cast("double")).alias("e"),
        )
        ivf_assign_to_corpus_centroids(spark, sf_dir, v).write.mode(
            "overwrite"
        ).parquet(f"{list_dir}/batch_id={batch_id}")

    return _sink


def fold_streamed_lists(
    spark: SparkSession,
    sf_dir: str,
    list_dir: str,
    index_root: str | None = None,
    keep_generations: int = 2,
) -> dict:
    """Fold streamed IVF list rows into a generational base-list store —
    the third index type through streaming.fold's kernel (after SRP
    buckets and MinHash signatures). Searches then pass the generation as
    sim_ivf_search(base_lists=) with no grafts."""
    from denali_spark.engine.index_cache import (
        corpus_fingerprint,
        index_file_count,
    )
    from denali_spark.operators.similarity import (
        IVF_STRIDE,
        ivf_inverted_lists,
    )
    from denali_spark.streaming.fold import FoldRelation, fold_streamed_partitions

    index_root = index_root if index_root is not None else f"{list_dir}_folded"
    n_files = index_file_count(sf_dir, "embeddings")
    corpus_key = corpus_fingerprint(sf_dir, "embeddings", f"S{IVF_STRIDE}")
    return fold_streamed_partitions(
        spark, index_root, corpus_key,
        [
            FoldRelation(
                "lists", list_dir,
                lambda: ivf_inverted_lists(spark, sf_dir),
                ("vec_id", "e", "cid"), n_files, ("cid",),
            )
        ],
        keep_generations=keep_generations,
    )


def read_folded_lists(spark: SparkSession, index_root: str) -> DataFrame | None:
    """The committed folded IVF generation (vec_id, e, cid), or None if no
    fold has run."""
    from denali_spark.streaming.fold import read_folded

    got = read_folded(spark, index_root, ("lists",))
    return None if got is None else got["lists"]


# --- PQ online lifecycle (fourth index type through the shared fold) --------

def make_pq_code_sink(sf_dir: str, qvec_dir: str, code_dir: str):
    """foreachBatch sink: quantize each micro-batch of vectors against the
    corpus's stored gmax (clamped int8 — the train-once/add-many
    contract: codebooks and scales are frozen at index build, exactly
    FAISS's add-after-train) and encode against the stored codebooks,
    landing (vec_id, qe) and (vec_id, m, code) as the batch's own
    partitions in two stores. Fixed write order qvecs→codes: the fold's
    committed_batch_ids requires _SUCCESS in BOTH, so a crash between
    writes never folds half a batch. Pair with make_ivf_index_sink so
    streamed vectors also carry a cell and become IVF-PQ-searchable via
    sim_ivfpq_search(extra_*=...)."""

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        from denali_spark.operators.similarity import (
            pq_encode_codes,
            pq_quantize_external,
        )

        spark = batch_df.sparkSession
        v = batch_df.select(
            "vec_id",
            F.transform("embedding", lambda x: x.cast("double")).alias("e"),
        )
        qpart = f"{qvec_dir}/batch_id={batch_id}"
        pq_quantize_external(spark, sf_dir, v).write.mode("overwrite").parquet(
            qpart
        )
        # encode from the COMMITTED quantized partition, so stored codes
        # are byte-derived from stored qvecs even across a replay
        pq_encode_codes(
            spark, sf_dir, spark.read.parquet(qpart)
        ).write.mode("overwrite").parquet(f"{code_dir}/batch_id={batch_id}")

    return _sink


def read_streamed_pq(
    spark: SparkSession, qvec_dir: str, code_dir: str
) -> tuple[DataFrame, DataFrame] | None:
    """Streamed PQ rows committed in BOTH stores, as (qvecs, codes) for
    sim_ivfpq_search(extra_qvecs=, extra_codes=); None when no batch has
    fully committed."""
    from denali_spark.streaming.fold import committed_batch_ids

    ids = committed_batch_ids([qvec_dir, code_dir])
    if not ids:
        return None
    qv = spark.read.parquet(
        *[f"{qvec_dir}/batch_id={b}" for b in ids]
    ).select("vec_id", "qe")
    codes = spark.read.parquet(
        *[f"{code_dir}/batch_id={b}" for b in ids]
    ).select("vec_id", "m", "code")
    return qv, codes


def fold_streamed_pq(
    spark: SparkSession,
    sf_dir: str,
    qvec_dir: str,
    code_dir: str,
    index_root: str | None = None,
    keep_generations: int = 2,
) -> dict:
    """Fold streamed PQ rows into a generational base store — the FOURTH
    index type through streaming.fold's kernel (SRP buckets, MinHash
    signatures, IVF lists, PQ codes). Searches then pass the generation
    as sim_ivfpq_search(base_qvecs=, base_codes=) with no grafts."""
    from denali_spark.engine.index_cache import (
        corpus_fingerprint,
        index_file_count,
    )
    from denali_spark.operators.similarity import (
        PQ_CB,
        PQ_M,
        pq_code_index,
    )
    from denali_spark.streaming.fold import FoldRelation, fold_streamed_partitions

    index_root = index_root if index_root is not None else f"{code_dir}_folded"
    n_files = index_file_count(sf_dir, "embeddings")
    corpus_key = corpus_fingerprint(
        sf_dir, "embeddings", f"M{PQ_M}CB{PQ_CB}f{n_files}"
    )
    return fold_streamed_partitions(
        spark, index_root, corpus_key,
        [
            FoldRelation(
                "qvecs", qvec_dir,
                lambda: pq_code_index(spark, sf_dir)["qvecs"],
                ("vec_id", "qe"), n_files, ("vec_id",),
            ),
            FoldRelation(
                "codes", code_dir,
                lambda: pq_code_index(spark, sf_dir)["codes"],
                ("vec_id", "m", "code"), n_files, ("vec_id",),
            ),
        ],
        keep_generations=keep_generations,
    )


def read_folded_pq(
    spark: SparkSession, index_root: str
) -> tuple[DataFrame, DataFrame] | None:
    """The committed folded PQ generation as (qvecs, codes), or None if no
    fold has run."""
    from denali_spark.streaming.fold import read_folded

    got = read_folded(spark, index_root, ("qvecs", "codes"))
    return None if got is None else (got["qvecs"], got["codes"])

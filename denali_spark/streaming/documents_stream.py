"""Streaming document ingestion with online dedup against a GROWING corpus.

The continuously-ingesting-pipeline shape end-to-end: documents land as
files, Structured Streaming micro-batches them, and each batch dedups
against the existing corpus through the materialized MinHash signature
index (`operators.dedup.minhash_signature_index` — hashed once at ingest;
only the incoming batch pays shingle-hash cost per micro-batch) PLUS the
signatures of every previously-accepted novel document, PLUS itself
(intra-batch self-dedup). Accepted-novel docs' signatures are appended to
a per-batch-partitioned signature store, so the corpus the NEXT batch
dedups against has grown — the same document arriving twice (in one batch
or across batches) is marked novel exactly once.

The base index stays immutable (it is fingerprinted by corpus file
identity — mutating it in place would break that contract for concurrent
readers); growth lives in a side store laid out one parquet partition per
micro-batch. That layout is what makes foreachBatch replays idempotent:
a re-run of batch N overwrites batch N's own verdict partition AND its own
signature partition and nothing else, and the corpus it sees (base index +
all OTHER batches' partitions) is identical to the first run's view (same
stamp discipline as the catalog sinks in events_stream).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DOC_SCHEMA = "doc_id long, text string"


def read_document_stream(spark: SparkSession, landing_dir: str) -> DataFrame:
    """File-source stream of (doc_id, text) parquet drops — the cloud-bucket
    landing pattern; at scale this is the same code over an object-store
    path with maxFilesPerTrigger bounding batch size."""
    return spark.readStream.schema(DOC_SCHEMA).parquet(landing_dir)


def _read_prior_sigs(
    spark: SparkSession, sig_dir: str, current_batch_id: int
) -> DataFrame | None:
    """Signatures accepted by every OTHER batch so far. Only partitions with
    a _SUCCESS marker count — a batch that crashed mid-write must not leak a
    partial signature set into later batches' corpus view. Excluding the
    current batch's own partition keeps replays idempotent: a re-run sees
    exactly the corpus the first run saw."""
    if not os.path.isdir(sig_dir):
        return None
    parts = [
        os.path.join(sig_dir, d)
        for d in sorted(os.listdir(sig_dir))
        if d.startswith("batch_id=")
        and d != f"batch_id={current_batch_id}"
        and os.path.exists(os.path.join(sig_dir, d, "_SUCCESS"))
    ]
    if not parts:
        return None
    return spark.read.parquet(*parts)


def make_online_dedup_sink(
    sf_dir: str,
    out_dir: str,
    threshold: float = 0.3,
    sig_dir: str | None = None,
    index_root: str | None = None,
):
    """foreachBatch sink: per micro-batch, flag every incoming document as
    duplicate (of the corpus, of a previously-accepted novel doc, or of a
    lower-id doc in the same batch) or novel; write verdicts to
    ``out_dir/batch_id=N/`` and accepted-novel signatures to
    ``sig_dir/batch_id=N/``. Overwriting the batch's own partitions keeps
    at-least-once replays exactly-once in effect.

    `index_root`: the fold_streamed_signatures generation store. When a
    committed generation exists the batch reads IT as the corpus (it
    already contains the base index plus every folded batch) and unions
    only the not-yet-folded streamed partitions — so a long-running
    stream's corpus-side read stays one index layout wide regardless of
    how many micro-batches ever ran."""
    sig_dir = sig_dir if sig_dir is not None else f"{out_dir}_sigs"

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        from denali_spark.operators.dedup import (
            _with_signatures,
            minhash_signature_index,
            online_dedup,
        )

        spark = batch_df.sparkSession
        # One persisted signature relation feeds the corpus join, the
        # intra-batch self-join, and the novel-signature append.
        fresh = _with_signatures(batch_df).persist()
        corpus = (
            read_folded_signatures(spark, index_root)
            if index_root is not None else None
        )
        if corpus is None:
            corpus = minhash_signature_index(spark, sf_dir)
        prior = _read_prior_sigs(spark, sig_dir, batch_id)
        if prior is not None:
            corpus = corpus.unionByName(prior)
        verdicts = online_dedup(
            spark,
            sf_dir,
            batch_df,
            threshold,
            corpus_sig=corpus,
            new_sig=fresh,
            self_dedup=True,
        ).persist()
        verdicts.write.mode("overwrite").parquet(f"{out_dir}/batch_id={batch_id}")
        novel_ids = verdicts.filter(~F.col("is_duplicate")).select("doc_id")
        # The batch side is micro-batch-sized — broadcast it into the index
        # join rather than shuffling the signature store.
        fresh.join(F.broadcast(novel_ids), "doc_id").write.mode("overwrite").parquet(
            f"{sig_dir}/batch_id={batch_id}"
        )
        verdicts.unpersist()
        fresh.unpersist()

    return _sink


def read_verdicts(spark: SparkSession, out_dir: str) -> DataFrame:
    """The accumulated verdict table; `batch_id` comes back as a partition
    column via standard directory discovery."""
    return spark.read.parquet(out_dir)


def _read_prior_hashes(
    spark: SparkSession, hash_dir: str, current_batch_id: int
) -> DataFrame | None:
    """Accepted-document text hashes from every OTHER completed batch
    (_SUCCESS-gated, own partition excluded — same replay discipline as
    `_read_prior_sigs`)."""
    if not os.path.isdir(hash_dir):
        return None
    parts = [
        os.path.join(hash_dir, d)
        for d in sorted(os.listdir(hash_dir))
        if d.startswith("batch_id=")
        and d != f"batch_id={current_batch_id}"
        and os.path.exists(os.path.join(hash_dir, d, "_SUCCESS"))
    ]
    if not parts:
        return None
    return spark.read.parquet(*parts)


def make_filter_funnel_sink(out_dir: str, hash_dir: str | None = None):
    """foreachBatch ingest guard running the quality-filter cascade
    (`operators.text_analysis.funnel_depths` — the same six scan-local
    stages as the batch `text_filter_funnel` query) ONLINE: each incoming
    (doc_id, text) document gets a survival depth, and the final
    dedup-exact stage runs against the corpus-so-far — text hashes
    accepted by every prior batch plus intra-batch keep-first — so a
    document arriving twice (in one batch or across batches) is accepted
    exactly once, matching the online-dedup sink's growing-corpus
    semantics.

    Verdicts (doc_id, depth, kept) write to ``out_dir/batch_id=N/`` and
    accepted hashes to ``hash_dir/batch_id=N/``, both with overwrite, so
    at-least-once replays are exactly-once in effect: a re-run of batch N
    rewrites only its own partitions and sees exactly the prior-corpus
    view the first run saw.

    Scale shape: stages 1–6 are scan-local on the micro-batch; the dedup
    stage joins the (16-byte md5) batch survivor keys against the hash
    store — the batch side is micro-batch-sized and broadcasts; the
    store is partition-pruned parquet that grows by one tiny file per
    batch."""
    hash_dir = hash_dir if hash_dir is not None else f"{out_dir}_hashes"

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        from pyspark.sql import Window

        from denali_spark.operators.text_analysis import funnel_depths

        spark = batch_df.sparkSession
        d = funnel_depths(batch_df).withColumn("h", F.md5("text")).persist()
        prior = _read_prior_hashes(spark, hash_dir, batch_id)
        seen = F.lit(False)
        if prior is not None:
            d = d.join(
                F.broadcast(prior.select("h", F.lit(True).alias("_seen"))
                            .distinct()),
                "h", "left",
            )
            seen = F.coalesce(F.col("_seen"), F.lit(False))
        w = Window.partitionBy(
            (F.col("depth") == 6) & ~seen, F.col("h")
        ).orderBy("doc_id")
        kept = (
            (F.col("depth") == 6) & ~seen & (F.row_number().over(w) == 1)
        )
        verdicts = d.select(
            "doc_id",
            F.when(kept, F.lit(7)).otherwise(F.col("depth")).alias("depth"),
            kept.alias("kept"),
            "h",
        ).persist()
        verdicts.select("doc_id", "depth", "kept").write.mode(
            "overwrite"
        ).parquet(f"{out_dir}/batch_id={batch_id}")
        verdicts.filter("kept").select("h").write.mode("overwrite").parquet(
            f"{hash_dir}/batch_id={batch_id}"
        )
        verdicts.unpersist()
        d.unpersist()

    return _sink


def make_decontaminate_sink(sf_dir: str, out_dir: str):
    """foreachBatch ingest guard: per micro-batch, verdict every incoming
    (doc_id, text) document against the corpus's materialized benchmark
    {CONTAM_N}-gram index (operators.text_analysis.benchmark_gram_index) —
    contaminated documents are the ones a training pipeline must quarantine
    BEFORE they land in the corpus, which is why this runs at ingest and
    not as a post-hoc batch sweep.

    Verdicts write to ``out_dir/batch_id=N/`` with overwrite, so
    at-least-once replays of a batch are exactly-once in effect (same stamp
    discipline as the dedup sink above). The guard is stateless across
    batches — the benchmark set is immutable — so idempotence needs no
    side-store."""

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        from denali_spark.operators.text_analysis import decontaminate_batch

        spark = batch_df.sparkSession
        verdicts = decontaminate_batch(spark, sf_dir, batch_df)
        verdicts.write.mode("overwrite").parquet(f"{out_dir}/batch_id={batch_id}")

    return _sink


def fold_streamed_signatures(
    spark: SparkSession,
    sf_dir: str,
    sig_dir: str,
    index_root: str | None = None,
    keep_generations: int = 2,
) -> dict:
    """Compaction for the online-dedup signature store — the document twin
    of embeddings_stream.fold_streamed_index (shared generational kernel:
    streaming.fold). Rebuilds the corpus signature-index layout from
    (current generation + committed streamed batch partitions), commits
    the generation, truncates the folded partitions. Dedup sinks then
    read ONE folded relation as the corpus instead of base ∪ N micro-
    batch unions — at 100 TB that caps every batch's corpus-side read at
    the index layout's file count no matter how long the stream has run.

    Columns fold the FULL signature relation (doc_id, shingle-hash set,
    sig_0..15): the verification join needs `hs`, so the fold carries it
    exactly like the base index does."""
    from denali_spark.engine.index_cache import index_file_count
    from denali_spark.operators.dedup import (
        MINHASH_PARAMS,
        minhash_index_path,
        minhash_signature_index,
    )
    from denali_spark.streaming.fold import FoldRelation, fold_streamed_partitions

    index_root = index_root if index_root is not None else f"{sig_dir}_folded"
    n_files = index_file_count(sf_dir, "documents")
    # The base index path already encodes corpus identity + geometry —
    # reuse it as the fold's corpus key so a corpus/geometry change
    # refuses to mix generations (same invalidation rule as the cache).
    corpus_key = os.path.basename(minhash_index_path(sf_dir))
    cols = ("doc_id", "hs", *[f"sig_{i}" for i in range(len(MINHASH_PARAMS))])
    return fold_streamed_partitions(
        spark, index_root, corpus_key,
        [
            FoldRelation(
                "sigs", sig_dir,
                lambda: minhash_signature_index(spark, sf_dir),
                cols, n_files,
            )
        ],
        keep_generations=keep_generations,
    )


def read_folded_signatures(
    spark: SparkSession, index_root: str
) -> DataFrame | None:
    """The committed folded signature generation (doc_id, hs, sig_*), or
    None if no fold has run."""
    from denali_spark.streaming.fold import read_folded

    got = read_folded(spark, index_root, ("sigs",))
    return None if got is None else got["sigs"]


# --- streaming fixed-K reservoir per stratum --------------------------------

RESERVOIR_STREAM_K = 25


def _reservoir_schema():
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    out = StructType(
        [
            StructField("stratum", LongType()),
            StructField("doc_id", LongType()),
            StructField("rk", LongType()),
            StructField("n_seen", LongType()),
        ]
    )
    state = StructType(
        [
            StructField("doc_ids", StringType()),  # json array (ordered)
            StructField("n_seen", LongType()),
        ]
    )
    return out, state


def _reservoir_priority(doc_id: int) -> str:
    """Deterministic sampling priority: salted md5 of the doc id — the
    SAME key sample_fixed_k_per_stratum ranks by, so the stream's
    reservoir is a pure function of the doc-id SET, not of arrival or
    partition order (bit-for-bit replay, exact batch-twin equality)."""
    import hashlib

    from denali_spark.operators.text_analysis import RESERVOIR_SALT

    return hashlib.md5(f"{doc_id}:{RESERVOIR_SALT}".encode()).hexdigest()


def _reservoir_update(key, pdfs, state):
    """applyInPandasWithState kernel: keep the K smallest (priority,
    doc_id) pairs ever seen in this stratum. State is O(K) regardless of
    stream length — the bounded-memory fixed-budget sample. Emits the
    CURRENT reservoir with ranks each batch (update mode)."""
    import json as _json

    import pandas as pd

    (stratum,) = key
    if state.exists:
        ids_json, n = state.get
        kept = _json.loads(ids_json)
    else:
        kept, n = [], 0
    chunks = [p for p in pdfs if len(p)]
    if chunks:
        batch_ids = pd.concat(chunks, ignore_index=True)["doc_id"].tolist()
        n += len(batch_ids)
        pool = {int(d) for d in kept} | {int(d) for d in batch_ids}
        kept = [
            d
            for d in sorted(pool, key=lambda d: (_reservoir_priority(d), d))[
                :RESERVOIR_STREAM_K
            ]
        ]
    state.update((_json.dumps(kept), int(n)))
    yield pd.DataFrame(
        {
            "stratum": [int(stratum)] * len(kept),
            "doc_id": kept,
            "rk": list(range(1, len(kept) + 1)),
            "n_seen": [int(n)] * len(kept),
        }
    )


def reservoir_sample_stream(stream: DataFrame, strata: int = 4) -> DataFrame:
    """Streaming fixed-K reservoir per stratum: EXACTLY min(K, |stratum|)
    documents per stratum at every point in the stream, chosen by the
    salted-md5 priority of sample_fixed_k_per_stratum — the streaming
    twin of the batch query, with EXACT set equality (not an error
    bound): the K smallest priorities of a set are independent of
    arrival order, so replaying the same documents in any batching
    yields the same reservoir bit-for-bit.

    At 100 TB this is the always-current eval/review sample: state is
    O(strata × K) against an unbounded stream, and membership is a pure
    function of doc_id, so a rebuilt pipeline converges to the identical
    sample. Stratum here is pmod over doc_id (the landing schema carries
    no language column); any stratum key expression slots in unchanged."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    out_schema, state_schema = _reservoir_schema()
    sharded = stream.withColumn(
        "stratum", F.pmod(F.col("doc_id"), F.lit(strata)).cast("long")
    )
    return sharded.groupBy("stratum").applyInPandasWithState(
        _reservoir_update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def reservoir_sample_batch(spark: SparkSession, docs: DataFrame, strata: int = 4):
    """Sequential reference twin: the same ranking computed as one batch
    window over ALL documents. Returns {stratum: [doc_id, ...]} in rank
    order for direct comparison with the stream's final state."""
    from pyspark.sql import Window

    from denali_spark.operators.text_analysis import RESERVOIR_SALT

    key = F.md5(
        F.concat(F.col("doc_id").cast("string"), F.lit(f":{RESERVOIR_SALT}"))
    )
    ranked = (
        docs.withColumn(
            "stratum", F.pmod(F.col("doc_id"), F.lit(strata)).cast("long")
        )
        .withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("stratum").orderBy(key, "doc_id")
            ),
        )
        .filter(F.col("rk") <= RESERVOIR_STREAM_K)
    )
    out: dict[int, list[int]] = {}
    for r in ranked.orderBy("stratum", "rk").collect():
        out.setdefault(int(r["stratum"]), []).append(int(r["doc_id"]))
    return out


# --- online simhash guard (the simhash twin of the minhash dedup sink) ------


def make_simhash_guard_sink(
    sf_dir: str,
    out_dir: str,
    max_hamming: int = 6,
    fp_dir: str | None = None,
    index_root: str | None = None,
):
    """foreachBatch sink: flag every incoming document whose SimHash
    fingerprint is within `max_hamming` bits of the corpus (materialized
    fingerprint index, or the folded generation when `index_root` is
    given), of a previously-accepted novel doc, or of a lower-id doc in
    the same batch; write verdicts to ``out_dir/batch_id=N/`` and
    accepted-novel fingerprints to ``fp_dir/batch_id=N/``. Same replay
    discipline as make_online_dedup_sink: overwriting the batch's own
    partitions keeps at-least-once replays exactly-once in effect.

    Next to the MinHash guard this is the cheap first gate: a fingerprint
    is 8 bytes/doc (vs the signature relation's shingle sets), the band
    join blocks on 4 exact bytes, and only band-colliding pairs pay the
    Hamming check — the guard a 100 TB ingest runs on EVERY batch, with
    the Jaccard-verified MinHash pass reserved for its survivors."""
    fp_dir = fp_dir if fp_dir is not None else f"{out_dir}_fps"

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        from denali_spark.operators.dedup import (
            _with_simhash,
            online_simhash_dedup,
            simhash_index,
        )

        spark = batch_df.sparkSession
        fresh = _with_simhash(batch_df).persist()
        corpus = (
            read_folded_fingerprints(spark, index_root)
            if index_root is not None else None
        )
        if corpus is None:
            corpus = simhash_index(spark, sf_dir)
        prior = _read_prior_sigs(spark, fp_dir, batch_id)
        if prior is not None:
            corpus = corpus.unionByName(prior.select("doc_id", "simhash"))
        verdicts = online_simhash_dedup(
            batch_df, corpus, max_hamming, new_fp=fresh, self_dedup=True
        ).persist()
        verdicts.write.mode("overwrite").parquet(f"{out_dir}/batch_id={batch_id}")
        novel_ids = verdicts.filter(~F.col("is_duplicate")).select("doc_id")
        fresh.join(F.broadcast(novel_ids), "doc_id").write.mode(
            "overwrite"
        ).parquet(f"{fp_dir}/batch_id={batch_id}")
        verdicts.unpersist()
        fresh.unpersist()

    return _sink


def fold_streamed_fingerprints(
    spark: SparkSession,
    sf_dir: str,
    fp_dir: str,
    index_root: str | None = None,
    keep_generations: int = 2,
) -> dict:
    """Compaction for the simhash guard's fingerprint store — the SEVENTH
    relation on the shared generational kernel (row-disjoint per doc, so
    the plain-union fold applies)."""
    from denali_spark.engine.index_cache import index_file_count
    from denali_spark.operators.dedup import simhash_index, simhash_index_path
    from denali_spark.streaming.fold import FoldRelation, fold_streamed_partitions

    index_root = index_root if index_root is not None else f"{fp_dir}_folded"
    return fold_streamed_partitions(
        spark,
        index_root,
        corpus_key=os.path.basename(simhash_index_path(sf_dir)),
        relations=[
            FoldRelation(
                "fp", fp_dir,
                lambda: simhash_index(spark, sf_dir),
                ("doc_id", "simhash"),
                index_file_count(sf_dir, "documents"),
            )
        ],
        keep_generations=keep_generations,
    )


def read_folded_fingerprints(
    spark: SparkSession, index_root: str
) -> DataFrame | None:
    """The committed folded fingerprint generation (doc_id, simhash), or
    None if no fold has run."""
    from denali_spark.streaming.fold import read_folded

    got = read_folded(spark, index_root, ("fp",))
    return None if got is None else got["fp"]

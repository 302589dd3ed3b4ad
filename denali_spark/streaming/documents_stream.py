"""Streaming document ingestion with online dedup against the corpus.

The continuously-ingesting-pipeline shape end-to-end: documents land as
files, Structured Streaming micro-batches them, and each batch dedups
against the existing corpus through the materialized MinHash signature
index (`operators.dedup.minhash_signature_index` — hashed once at ingest,
only the incoming batch pays shingle-hash cost per micro-batch). Verdicts
land as one parquet partition per micro-batch, which makes foreachBatch
replays idempotent: a re-run of batch N overwrites batch N's own partition
and nothing else (same stamp discipline as the catalog sinks in
events_stream).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

DOC_SCHEMA = "doc_id long, text string"


def read_document_stream(spark: SparkSession, landing_dir: str) -> DataFrame:
    """File-source stream of (doc_id, text) parquet drops — the cloud-bucket
    landing pattern; at scale this is the same code over an object-store
    path with maxFilesPerTrigger bounding batch size."""
    return spark.readStream.schema(DOC_SCHEMA).parquet(landing_dir)


def make_online_dedup_sink(sf_dir: str, out_dir: str, threshold: float = 0.3):
    """foreachBatch sink: per micro-batch, flag every incoming document as
    duplicate-of-corpus or novel and write verdicts to
    ``out_dir/batch_id=N/``. Overwriting the batch's own partition keeps
    at-least-once replays exactly-once in effect."""

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        from denali_spark.operators.dedup import online_dedup

        spark = batch_df.sparkSession
        verdicts = online_dedup(spark, sf_dir, batch_df, threshold)
        verdicts.write.mode("overwrite").parquet(f"{out_dir}/batch_id={batch_id}")

    return _sink


def read_verdicts(spark: SparkSession, out_dir: str) -> DataFrame:
    """The accumulated verdict table; `batch_id` comes back as a partition
    column via standard directory discovery."""
    return spark.read.parquet(out_dir)

from denali_spark.streaming.documents_stream import (
    make_decontaminate_sink,
    make_online_dedup_sink,
    read_document_stream,
    read_verdicts,
)
from denali_spark.streaming.embeddings_stream import (
    make_embedding_dedup_sink,
    make_embedding_index_sink,
    read_dedup_verdicts,
    read_embedding_stream,
    read_streamed_buckets,
    read_streamed_vectors,
)
from denali_spark.streaming.events_stream import (
    anomaly_stream,
    attribution_join_stream,
    dedup_stream,
    ohlc_stream,
    read_event_stream,
    sessionize_stream,
    stream_cdc_apply,
    stream_to_catalog,
    user_running_totals,
    windowed_counts,
)

__all__ = [
    "anomaly_stream",
    "attribution_join_stream",
    "dedup_stream",
    "read_event_stream",
    "windowed_counts",
    "ohlc_stream",
    "user_running_totals",
    "sessionize_stream",
    "stream_cdc_apply",
    "stream_to_catalog",
    "read_document_stream",
    "make_online_dedup_sink",
    "make_decontaminate_sink",
    "read_verdicts",
    "read_embedding_stream",
    "make_embedding_index_sink",
    "make_embedding_dedup_sink",
    "read_dedup_verdicts",
    "read_streamed_buckets",
    "read_streamed_vectors",
]

"""Streaming document ingestion: files land, each micro-batch is deduped
online against the growing corpus index AND decontamination-checked against
the benchmark gram set; verdicts accumulate in replay-idempotent per-batch
partitions."""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import tempfile

from pyspark.sql import functions as F

from denali_spark.engine.session import get_spark
from denali_spark.streaming import (
    make_decontaminate_sink,
    make_online_dedup_sink,
    read_document_stream,
    read_verdicts,
)

SF = "/root/testdata/sf0.001"

spark = get_spark("streaming-ingest")
spark.sparkContext.setLogLevel("ERROR")
work = tempfile.mkdtemp(prefix="denali-example-stream-")
landing = f"{work}/landing"

# drop 1: re-keyed copies of corpus docs (guaranteed dups); drop 2: novel docs
docs = spark.read.parquet(f"{SF}/documents.parquet")
docs.filter(F.col("doc_id") % 50 == 3).select(
    (F.col("doc_id") + 1_000_000).alias("doc_id"), "text"
).coalesce(1).write.mode("append").parquet(landing)
novel = spark.createDataFrame(
    [(2_000_000 + i, f"novel{i} " + " ".join(f"tok{i}x{j}" for j in range(10))) for i in range(3)],
    "doc_id long, text string",
)
novel.coalesce(1).write.mode("append").parquet(landing)

for label, sink in [
    ("dedup", make_online_dedup_sink(SF, f"{work}/dedup")),
    ("decontaminate", make_decontaminate_sink(SF, f"{work}/contam")),
]:
    q = (
        read_document_stream(spark, landing)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", f"{work}/ckpt-{label}")
        .start()
    )
    q.processAllAvailable()
    q.stop()

dd = read_verdicts(spark, f"{work}/dedup")
print("dedup verdicts:", dd.count(), "| duplicates:", dd.filter("is_duplicate").count())
cv = read_verdicts(spark, f"{work}/contam")
print("contamination verdicts:", cv.count(), "| contaminated:", cv.filter("contaminated").count())

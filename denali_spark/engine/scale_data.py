"""Derive larger benchmark datasets from the driver-provided testdata.

The driver ships sf0.001/0.01/0.1; the scale-stress bench needs ~sf1 to
show that plan shapes hold through a 10x data step (the local stand-in for
the 100 TB question). Fact tables are replicated ``factor`` times with the
primary key offset per copy — "10x more orders/events/documents over the
same catalog" — while dimensions stay fixed (region/nation/customer/
supplier/part), preserving every join's fan-out shape. Generation is
deterministic (no randomness), executor-parallel, and cached behind a
_DONE marker.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

# fact table → primary key column(s) to offset per copy
FACTS = {
    "lineitem": ("l_orderkey",),
    "orders": ("o_orderkey",),
    "events": ("event_id",),
    "documents": ("doc_id",),
    "embeddings": ("vec_id",),
}
DIMS = ("region", "nation", "customer", "supplier", "part")


def ensure_scaled(
    spark: SparkSession, src_dir: str, out_dir: str, factor: int = 10
) -> str:
    """Materialize a factor-x derivation of src_dir at out_dir (idempotent)."""
    done = os.path.join(out_dir, "_DONE")
    if os.path.exists(done):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)
    # events.ts is parquet TIMESTAMP(NANOS); read it as raw int64 (the same
    # setting engine.tables uses) — copies round-trip the longs unchanged
    # and the events loader handles either representation.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    for t in DIMS:
        spark.read.parquet(f"{src_dir}/{t}.parquet").write.mode("overwrite").parquet(
            f"{out_dir}/{t}.parquet"
        )
    for t, keys in FACTS.items():
        df = spark.read.parquet(f"{src_dir}/{t}.parquet")
        # one offset covering every key column keeps copies disjoint
        offsets = df.agg(*[F.max(k).alias(k) for k in keys]).first()
        span = max(int(offsets[k] or 0) for k in keys) + 1
        copies = None
        for c in range(factor):
            part = df
            for k in keys:
                part = part.withColumn(k, (F.col(k) + F.lit(c * span)).alias(k))
            copies = part if copies is None else copies.unionByName(part)
        copies.write.mode("overwrite").parquet(f"{out_dir}/{t}.parquet")
    with open(done, "w") as f:
        f.write(f"factor={factor} src={src_dir}\n")
    return out_dir

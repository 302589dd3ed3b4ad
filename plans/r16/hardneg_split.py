"""Stage-split timing for sim_hard_negatives at sf1: candidates-only vs
scored-only vs full (old tail / new tail), with a fixed-work throttle
canary between legs so host drift is visible in the record.

Usage: python plans/r16/hardneg_split.py [rounds]
"""

from __future__ import annotations

import json
import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.abspath(os.path.join(HERE, "..", ".."))
sys.path.insert(0, REPO)

from bench import SF1_DIR  # noqa: E402
from denali_spark.engine.scale_data import ensure_scaled  # noqa: E402
from denali_spark.engine.session import get_spark  # noqa: E402
from plans.r16.hardneg_ab import new_tail, old_tail, scored_rel  # noqa: E402

from pyspark.sql import functions as F  # noqa: E402


def cand_rel(spark, sf_dir):
    from denali_spark.operators.similarity import (
        _capped_index_side,
        lsh_bucket_index,
        lsh_planes,
    )

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
    ab = ab.repartition(spark.sparkContext.defaultParallelism * 2)
    return (
        ab.join(_capped_index_side(b), ["t", "bucket"])
        .filter(F.col("i") != F.col("vec_id"))
        .select("i", F.col("vec_id").alias("j"))
        .distinct()
    )


def canary(spark) -> float:
    t0 = time.perf_counter()
    spark.range(0, 200_000_000, 1, 32).select(
        F.sum(F.col("id") * 3 % 7)
    ).collect()
    return round(time.perf_counter() - t0, 3)


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("r16-hardneg-split")
    ensure_scaled(spark, sf_dir, SF1_DIR, factor=10)
    d = SF1_DIR

    legs = {
        "cand": lambda: cand_rel(spark, d).count(),
        "scored": lambda: scored_rel(spark, d).count(),
        "full_old": lambda: old_tail(scored_rel(spark, d)).count(),
        "full_new": lambda: new_tail(scored_rel(spark, d)).count(),
    }
    # warm everything once
    for fn in legs.values():
        fn()
    out: dict = {k: [] for k in legs}
    out["canary"] = []
    for r in range(rounds):
        out["canary"].append(canary(spark))
        for name, fn in legs.items():
            spark.sparkContext.setJobDescription(f"split-{name}-{r}")
            t0 = time.perf_counter()
            n = fn()
            out[name].append(round(time.perf_counter() - t0, 3))
        print(r, json.dumps({k: v[-1] for k, v in out.items()}), flush=True)
    out["rows"] = {
        "cand": cand_rel(spark, d).count(),
        "scored": scored_rel(spark, d).count(),
    }
    with open(os.path.join(HERE, "hardneg_split.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()

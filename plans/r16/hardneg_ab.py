"""Interleaved A/B: sim_hard_negatives two-branch (old) vs single-pass
(new) tails over the IDENTICAL candidate+scoring prefix, alternated
within one session so host throttling drifts hit both arms equally.

Usage: python plans/r16/hardneg_ab.py [rounds]
"""

from __future__ import annotations

import json
import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.abspath(os.path.join(HERE, "..", ".."))
sys.path.insert(0, REPO)

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from bench import SF1_DIR  # noqa: E402
from denali_spark.engine.scale_data import ensure_scaled  # noqa: E402
from denali_spark.engine.session import get_spark  # noqa: E402
from denali_spark.engine.tables import load_table  # noqa: E402
from denali_spark.operators.similarity import (  # noqa: E402
    _capped_index_side,
    _vecs,
    dot_cols,
    lsh_bucket_index,
    lsh_planes,
)


def scored_rel(spark, sf_dir):
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
    ab = ab.repartition(spark.sparkContext.defaultParallelism * 2)
    cand = (
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
    return (
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


def old_tail(scored):
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


def new_tail(scored):
    # materialize the pair+score relation once (lazy localCheckpoint, the
    # dedup_incremental_shard precedent) so the two per-anchor reductions
    # below don't each re-run candidates+scoring
    scored = scored.localCheckpoint(eager=False)
    # pass 1: pure scalar-max HashAggregate (no sort anywhere) — the
    # per-anchor best cross-label and same-label cosines
    agg1 = (
        scored.groupBy("i", "label_i")
        .agg(
            F.max(
                F.when(F.col("label_j") != F.col("label_i"), F.col("cos"))
            ).alias("neg_cos"),
            F.max(
                F.when(F.col("label_j") == F.col("label_i"), F.col("cos"))
            ).alias("pos_cos"),
        )
        .filter(F.col("neg_cos").isNotNull())
        .localCheckpoint(eager=False)
    )
    # pass 2: recover the argmax row — broadcast the tiny per-anchor
    # maxima back over scored, keep only achievers, min-j tie-break over
    # the handful of survivors
    ach = (
        scored.join(
            F.broadcast(
                agg1.select("i", F.col("label_i").alias("li"), "neg_cos")
            ),
            "i",
        )
        .filter(
            (F.col("label_j") != F.col("li"))
            & (F.col("cos") == F.col("neg_cos"))
        )
        .groupBy("i")
        .agg(
            F.min(
                F.struct(F.col("j").alias("j"), F.col("label_j").alias("label_j"))
            ).alias("w")
        )
    )
    return agg1.join(ach, "i").select(
        F.col("i").alias("vec_id"),
        F.col("label_i").alias("label"),
        F.col("w.j").alias("hard_neg_id"),
        F.col("w.label_j").alias("hard_neg_label"),
        F.col("neg_cos").alias("neg_cos"),
        "pos_cos",
        (F.col("pos_cos").isNotNull() & (F.col("neg_cos") >= F.col("pos_cos")))
        .alias("is_violation"),
    )


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("r16-hardneg-ab")
    ensure_scaled(spark, sf_dir, SF1_DIR, factor=10)

    out: dict = {}
    for scale, d in (("base", sf_dir), ("sf1", SF1_DIR)):
        # warm both arms once (index build, codegen)
        old_tail(scored_rel(spark, d)).count()
        new_tail(scored_rel(spark, d)).count()
        a, bt = [], []
        for r in range(rounds):
            for arm, sink in (("old", a), ("new", bt)):
                tail = old_tail if arm == "old" else new_tail
                spark.sparkContext.setJobDescription(f"ab-{scale}-{arm}-{r}")
                t0 = time.perf_counter()
                tail(scored_rel(spark, d)).count()
                sink.append(round(time.perf_counter() - t0, 3))
        a.sort(), bt.sort()
        out[scale] = {
            "old": a, "new": bt,
            "old_med": a[len(a) // 2], "new_med": bt[len(bt) // 2],
        }
        print(scale, json.dumps(out[scale]), flush=True)
    with open(os.path.join(HERE, "hardneg_ab.json"), "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()

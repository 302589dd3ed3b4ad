"""Round-17 synthetic-only probe with JVM/GC visibility.

Usage: SPARK_GRAFT_CPUS=N [SPARK_GRAFT_DRIVER_JAVA_OPTS=...] \
         python plans/r17/synth_probe.py [tag] [conf=val ...]

Times three synthetic kernels (task dispatch, one shuffle, allocation-heavy
scan) and reports JVM GC time across each, so the local[32]-slower-than-
local[8] signal can be attributed: scheduler, shuffle machinery, or GC.
"""

from __future__ import annotations

import json
import os
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.abspath(os.path.join(HERE, "..", ".."))
sys.path.insert(0, REPO)

from bench import _time  # noqa: E402


def gc_ms(spark) -> float:
    beans = spark._jvm.java.lang.management.ManagementFactory.getGarbageCollectorMXBeans()
    return float(sum(beans.get(i).getCollectionTime() for i in range(beans.size())))


def main() -> None:
    args = sys.argv[1:]
    tag = args[0] if args else "base"
    confs = dict(a.split("=", 1) for a in args[1:])

    from pyspark.sql import functions as F

    from denali_spark.engine.session import get_spark

    spark = get_spark("denali-synth-probe")
    spark.sparkContext.setLogLevel("ERROR")
    for k, v in confs.items():
        spark.conf.set(k, v)
    spark.range(1).count()

    out: dict[str, dict] = {}

    def leg(name: str, thunk) -> None:
        thunk()  # warm
        g0 = gc_ms(spark)
        sec = _time(thunk, runs=3, stat="median")
        g1 = gc_ms(spark)
        out[name] = {"sec": sec, "gc_ms_3runs": g1 - g0}
        print(f"{name:24s} {sec:7.3f}s  gc={g1 - g0:6.0f}ms", flush=True)

    rng = spark.range(0, 1024, 1, 1024)
    leg("dispatch_1024_tasks", lambda: rng.count())
    sh = (
        spark.range(0, 4_000_000)
        .groupBy((F.col("id") % 100_000).alias("k"))
        .agg(F.sum("id").alias("s"))
    )
    leg("shuffle_4m_rows", lambda: sh.count())
    al = spark.range(0, 200_000).select(
        F.aggregate(
            F.transform(F.sequence(F.lit(1), F.lit(64)),
                        lambda i: i.cast("double") * F.col("id")),
            F.lit(0.0), lambda a, x: a + x,
        ).alias("v")
    ).agg(F.sum("v"))
    leg("alloc_heavy_200k", lambda: al.count())

    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count()))
    jopts = os.environ.get("SPARK_GRAFT_DRIVER_JAVA_OPTS", "")
    rec = {"tag": tag, "cpus": int(cpus), "confs": confs, "java_opts": jopts,
           "legs": out}
    with open(os.path.join(HERE, f"synth_{tag}_c{cpus}.json"), "w") as f:
        json.dump(rec, f, indent=1)
    print(json.dumps(rec))


if __name__ == "__main__":
    main()

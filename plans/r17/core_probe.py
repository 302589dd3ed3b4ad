"""Round-17 probe: why is the SAME box faster at local[8] than local[32]?

The r16 driver artifacts are two legs of one box: BENCH_r16 (32 cpus,
38.23s) vs BENCH_r16_c8 (8 cpus, 28.73s) — 8 cores beat 32 by 1.33x
overall, with sub-second queries up to 2.7x faster (sim_lsh_search_probe
0.92 vs 2.48). That is a same-box, same-code signal of per-core-count
overhead, not box drift. This probe isolates it.

Usage:
  SPARK_GRAFT_CPUS=N python plans/r17/core_probe.py [tag] [conf=val ...]

Times a representative headline subset (median-of-3 .count(), exactly like
bench.py) with optional runtime conf overrides applied after session
creation, and records Spark-measured executor run time + task counts per
query via the stage-level status API, so wall-vs-cpu separates scheduler
overhead from compute.
"""

from __future__ import annotations

import json
import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.abspath(os.path.join(HERE, "..", ".."))
sys.path.insert(0, REPO)

from bench import _time, lsh_search_probe  # noqa: E402

SUBSET = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q6_forecast_revenue",
    "ts_hourly_rollup",
    "ts_sessionize",
    "text_quality_score",
    "text_prepare_corpus",
    "text_filter_funnel",
    "text_simpson_diversity",
    "win_rolling_quantile",
    "graph_clustering_coefficient",
    "sim_lsh_bucket_topk",
    "sim_lsh_range_search",
    "ts_seasonal_decompose",
    "ts_concurrency_peak",
    "sim_mmr_diversify",
    "graph_kcore_peel",
]


def main() -> None:
    args = sys.argv[1:]
    tag = args[0] if args else "base"
    confs = dict(a.split("=", 1) for a in args[1:])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from denali_spark.engine.session import get_spark
    from denali_spark.operators import REGISTRY

    spark = get_spark("denali-core-probe")
    spark.sparkContext.setLogLevel("ERROR")
    for k, v in confs.items():
        spark.conf.set(k, v)
    spark.range(1).count()

    sc = spark.sparkContext
    tracker = sc.statusTracker()

    from pyspark.sql import functions as F

    synth: dict[str, float] = {}
    # pure task dispatch: 1024 near-empty tasks, no shuffle
    rng = spark.range(0, 1024, 1, 1024)
    rng.count()
    synth["dispatch_1024_tasks"] = _time(lambda: rng.count(), runs=3,
                                         stat="median")
    # one real shuffle: 4M longs through a hash exchange + agg
    sh = (
        spark.range(0, 4_000_000)
        .groupBy((F.col("id") % 100_000).alias("k"))
        .agg(F.sum("id").alias("s"))
    )
    sh.count()
    synth["shuffle_4m_rows"] = _time(lambda: sh.count(), runs=3, stat="median")
    # allocation-heavy per-row work (array churn, GC pressure), no shuffle
    al = spark.range(0, 200_000).select(
        F.aggregate(
            F.transform(F.sequence(F.lit(1), F.lit(64)),
                        lambda i: i.cast("double") * F.col("id")),
            F.lit(0.0), lambda a, x: a + x,
        ).alias("v")
    ).agg(F.sum("v"))
    al.count()
    synth["alloc_heavy_200k"] = _time(lambda: al.count(), runs=3, stat="median")
    print("synthetic:", synth, flush=True)

    out: dict[str, dict] = {}
    for name in SUBSET + ["sim_lsh_search_probe"]:
        if name == "sim_lsh_search_probe":
            fn = lambda: lsh_search_probe(spark, sf_dir)  # noqa: E731
        elif name in REGISTRY:
            fn = lambda name=name: REGISTRY[name].fn(spark, sf_dir)  # noqa: E731
        else:
            continue
        sc.setJobDescription(f"r17-probe:{name}")
        # warm run (codegen), then count jobs/stages across one timed run
        fn().count()
        jobs_before = set(tracker.getJobIdsForGroup(None) or [])
        sec = _time(lambda: fn().count(), runs=3, stat="median")
        jobs_after = set(tracker.getJobIdsForGroup(None) or [])
        ntasks = 0
        nstages = 0
        for jid in jobs_after - jobs_before:
            ji = tracker.getJobInfo(jid)
            if ji is None:
                continue
            for sid in ji.stageIds:
                si = tracker.getStageInfo(sid)
                if si is not None and si.numTasks > 0:
                    nstages += 1
                    ntasks += si.numTasks
        runs = 3
        out[name] = {
            "sec": sec,
            "stages_3runs": nstages,
            "tasks_3runs": ntasks,
            "tasks_per_run": round(ntasks / runs, 1),
        }
        print(f"{name:32s} {sec:7.3f}s  stages={nstages} tasks={ntasks}",
              flush=True)
        sc.setJobDescription(None)

    total = round(sum(v["sec"] for v in out.values()), 3)
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count()))
    rec = {"tag": tag, "cpus": int(cpus), "confs": confs, "total": total,
           "synthetic": synth, "queries": out}
    print(f"TOTAL {total}s at {cpus} cpus [{tag}]")
    path = os.path.join(HERE, f"core_probe_{tag}_c{cpus}.json")
    with open(path, "w") as f:
        json.dump(rec, f, indent=1)


if __name__ == "__main__":
    main()

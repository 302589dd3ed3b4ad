"""Round-16 optimization measurement harness.

Times each headline query exactly like bench.py (median-of-3 .count()) and
captures .explain("formatted") into plans/r17/<name>_<tag>.txt. Also counts
Exchange / SortMergeJoin / BroadcastHashJoin / BatchEvalPython nodes per plan
so plan-shape deltas are greppable.

Usage: python plans/r17/measure.py <tag> [query ...]
  tag: "before" or "after" (file suffix)
  queries: subset to run; default = full HEADLINE + sim_lsh_search_probe.
"""

from __future__ import annotations

import io
import json
import os
import re
import sys
import time
from contextlib import redirect_stdout

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.abspath(os.path.join(HERE, "..", ".."))
sys.path.insert(0, REPO)

from bench import HEADLINE, _time, lsh_search_probe, index_timings  # noqa: E402


def plan_text(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def plan_stats(text: str) -> dict:
    return {
        "exchanges": len(re.findall(r"\bExchange\b", text)),
        "smj": len(re.findall(r"\bSortMergeJoin\b", text)),
        "bhj": len(re.findall(r"\bBroadcastHashJoin\b", text)),
        "shj": len(re.findall(r"\bShuffledHashJoin\b", text)),
        "bnlj": len(re.findall(r"\bBroadcastNestedLoopJoin\b", text)),
        "cart": len(re.findall(r"\bCartesianProduct\b", text)),
        "py": len(re.findall(r"\b(BatchEvalPython|ArrowEvalPython)\b", text)),
        "arrow_map": len(re.findall(r"\b(MapInArrow|MapInPandas|FlatMapGroupsInPandas)\b", text)),
        "sorts": len(re.findall(r"^\(\d+\) Sort\b", text, re.M)),
        "scans": len(re.findall(r"\bScan parquet\b", text)),
    }


def main() -> None:
    args = [a for a in sys.argv[1:] if a != "--plans-only"]
    plans_only = "--plans-only" in sys.argv[1:]
    tag = args[0] if args else "before"
    subset = args[1:] or None
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from denali_spark.engine.session import get_spark
    from denali_spark.operators import REGISTRY

    spark = get_spark("denali-measure-r17")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1).count()

    names = subset or ([n for n in HEADLINE if n in REGISTRY] + ["sim_lsh_search_probe"])
    # Warm the indexes exactly like bench.py does before the headline loop
    # (cold builds are priced on their own line there, not in query medians).
    if subset is None or os.environ.get("R17_WARM_INDEXES") == "1":
        t0 = time.perf_counter()
        index_timings(spark, sf_dir)
        print(f"index warm-up: {time.perf_counter() - t0:.1f}s", flush=True)

    results: dict[str, dict] = {}
    for name in names:
        if name == "sim_lsh_search_probe":
            fn = lambda: lsh_search_probe(spark, sf_dir)  # noqa: E731
        else:
            fn = lambda name=name: REGISTRY[name].fn(spark, sf_dir)  # noqa: E731
        spark.sparkContext.setJobDescription(f"r17-{tag}:{name}")
        text = plan_text(fn())
        with open(os.path.join(HERE, f"{name}_{tag}.txt"), "w") as f:
            f.write(text)
        if plans_only:
            results[name] = {"sec": None, **plan_stats(text)}
            print(f"{name:35s}    -     {plan_stats(text)}", flush=True)
            spark.sparkContext.setJobDescription(None)
            continue
        sec = _time(lambda: fn().count(), runs=3, stat="median")
        results[name] = {"sec": sec, **plan_stats(text)}
        print(f"{name:35s} {sec:7.3f}  {plan_stats(text)}", flush=True)
        spark.sparkContext.setJobDescription(None)

    if not plans_only:
        total = round(sum(r["sec"] for r in results.values()), 3)
        print(f"TOTAL {total}")
        with open(os.path.join(HERE, f"timings_{tag}.json"), "w") as f:
            json.dump({"total": total, "queries": results}, f, indent=1)


if __name__ == "__main__":
    main()

"""Per-query driver-side 'analysis tax': median rebuild+count minus median
reuse+count. Rebuild = bench methodology (fresh DataFrame each run);
reuse = count() the same DataFrame object (analysis/planning cached by
Spark's plan cache only at the object level). The delta is what plan-tree
simplification can recover at bench time."""
import json
import os
import sys
import time

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))
sys.path.insert(0, REPO)

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

from bench import HEADLINE, index_timings, lsh_search_probe  # noqa: E402
from denali_spark.engine.session import get_spark  # noqa: E402
from denali_spark.operators import REGISTRY  # noqa: E402

spark = get_spark("r16-analysis-tax")
spark.sparkContext.setLogLevel("ERROR")
spark.range(1).count()
index_timings(spark, sf_dir)


def med(fn, n=3):
    xs = []
    for _ in range(n):
        s = time.perf_counter()
        fn()
        xs.append(time.perf_counter() - s)
    xs.sort()
    return round(xs[n // 2], 3)


names = [n for n in HEADLINE if n in REGISTRY] + ["sim_lsh_search_probe"]
out = {}
for name in names:
    if name == "sim_lsh_search_probe":
        fn = lambda: lsh_search_probe(spark, sf_dir)  # noqa: E731
    else:
        fn = lambda name=name: REGISTRY[name].fn(spark, sf_dir)  # noqa: E731
    spark.sparkContext.setJobDescription(f"tax:{name}")
    fn().count()  # warm
    rebuild = med(lambda: fn().count())
    df = fn()
    reuse = med(lambda: df.count())
    out[name] = {"rebuild": rebuild, "reuse": reuse, "tax": round(rebuild - reuse, 3)}
    print(f"{name:35s} rebuild {rebuild:7.3f}  reuse {reuse:7.3f}  tax {rebuild - reuse:7.3f}", flush=True)
    spark.sparkContext.setJobDescription(None)

tot = {k: round(sum(v[k] for v in out.values()), 2) for k in ("rebuild", "reuse", "tax")}
print("TOTALS:", tot)
with open(os.path.join(os.path.dirname(__file__), "analysis_tax.json"), "w") as f:
    json.dump({"totals": tot, "queries": out}, f, indent=1)

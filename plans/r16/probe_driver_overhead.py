"""Is sim_lsh_search_probe's cost driver-side (analysis) or executor-side?

Times: (a) full rebuild+count per run (bench methodology), (b) reuse one
DataFrame object across counts (analysis paid once), (c) stage-wise rebuild
of just the probe-hash relation. Run on a quiet box.
"""
import os
import sys
import time

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))
sys.path.insert(0, REPO)

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

from denali_spark.engine.session import get_spark  # noqa: E402
from bench import lsh_search_probe, _probe_batch  # noqa: E402

spark = get_spark("r16-probe-overhead")
spark.sparkContext.setLogLevel("ERROR")
spark.range(1).count()

# warm index reads
lsh_search_probe(spark, sf_dir).count()

def t(fn, n=5):
    out = []
    for _ in range(n):
        s = time.perf_counter()
        fn()
        out.append(round(time.perf_counter() - s, 3))
    return out

print("rebuild+count:", t(lambda: lsh_search_probe(spark, sf_dir).count()))
df = lsh_search_probe(spark, sf_dir)
print("reuse+count:  ", t(lambda: df.count()))

# stage: probe-hash relation only (the qb construction inside sim_lsh_search)
from denali_spark.operators import similarity as S  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

def build_qb():
    probes = _probe_batch(spark, sf_dir, 197)
    tb = F.explode(
        F.array(*[
            F.struct(
                F.lit(tt).alias("t"),
                S._bucket_col(F.col("e"), tt, S.lsh_planes(sf_dir)).alias("bucket"),
            )
            for tt in range(S.N_TABLES)
        ])
    )
    return probes.select("query_id", tb.alias("tb")).select("query_id", "tb.t", "tb.bucket")

print("qb rebuild+count:", t(lambda: build_qb().count()))
qb = build_qb()
print("qb reuse+count:  ", t(lambda: qb.count()))

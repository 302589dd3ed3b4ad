"""Bit-identity of the nested-fold _bucket_col vs the old unrolled form,
over the full sf0.1 corpus and all tables, plus probe-path re-timing."""
import os
import sys
import time
from functools import reduce

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))
sys.path.insert(0, REPO)

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

from pyspark.sql import functions as F  # noqa: E402

from denali_spark.engine.session import get_spark  # noqa: E402
from denali_spark.operators import similarity as S  # noqa: E402

spark = get_spark("r16-bucket-identity")
spark.sparkContext.setLogLevel("ERROR")


def old_bucket_col(e, table, planes):
    def plane_term(g):
        return lambda acc, k: acc + F.element_at(e, (k + 1).cast("int")) * F.when(
            (k * F.lit(2654435761) + F.lit(g * 40503)) % 97 < 48, F.lit(1.0)
        ).otherwise(F.lit(-1.0))

    def plane_dot(g):
        return F.aggregate(
            F.sequence(F.lit(0), F.lit(S.DIM - 1)).cast("array<long>"),
            F.lit(0.0),
            plane_term(g),
        )

    bits = [
        F.when(plane_dot(table * planes + p) >= 0, F.lit(1 << p)).otherwise(F.lit(0))
        for p in range(planes)
    ]
    return reduce(lambda x, y: x + y, bits).cast("long")


planes = S.lsh_planes(sf_dir)
print("planes:", planes, "tables:", S.N_TABLES)
v = S._vecs(spark, sf_dir)

both = v.select(
    "vec_id",
    *[old_bucket_col(F.col("e"), t, planes).alias(f"old{t}") for t in range(S.N_TABLES)],
    *[S._bucket_col(F.col("e"), t, planes).alias(f"new{t}") for t in range(S.N_TABLES)],
)
cond = reduce(
    lambda a, b: a | b,
    [F.col(f"old{t}") != F.col(f"new{t}") for t in range(S.N_TABLES)],
)
diff = both.filter(cond).count()
total = v.count()
print(f"corpus rows: {total}, mismatched bucket rows: {diff}")
assert diff == 0, "BUCKETS DIVERGED"

# probe-path re-timing (rebuild per run, bench methodology)
from bench import lsh_search_probe  # noqa: E402

lsh_search_probe(spark, sf_dir).count()  # warm index + codegen
samples = []
for _ in range(5):
    s = time.perf_counter()
    lsh_search_probe(spark, sf_dir).count()
    samples.append(round(time.perf_counter() - s, 3))
print("lsh_search_probe rebuild+count:", samples)

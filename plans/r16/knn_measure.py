"""Round-16 second-pass kNN-family measurement.

Times the paired kNN legs exactly like bench.py's sf1/base extras
(first_call = 1 run incl. any index build; steady = min-of-2 warm) at both
the base SF and the derived sf1, and captures formatted plans.

Usage: python plans/r16/knn_measure.py <tag> [query ...]
"""

from __future__ import annotations

import io
import json
import os
import re
import sys
from contextlib import redirect_stdout

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.abspath(os.path.join(HERE, "..", ".."))
sys.path.insert(0, REPO)

from bench import SF1_DIR, _time  # noqa: E402


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
        "window": len(re.findall(r"^\(\d+\) Window\b", text, re.M)),
        "hashagg": len(re.findall(r"\bHashAggregate\b", text)),
        "sorts": len(re.findall(r"^\(\d+\) Sort\b", text, re.M)),
        "scans": len(re.findall(r"\bScan parquet\b", text)),
        "py": len(re.findall(r"\b(BatchEvalPython|ArrowEvalPython)\b", text)),
    }


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or [
        "sim_hard_negatives",
        "dedup_embedding_lsh_pairs",
        "sim_knn_label_agreement",
    ]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from denali_spark.engine.session import get_spark
    from denali_spark.engine.scale_data import ensure_scaled
    from denali_spark.operators import REGISTRY

    spark = get_spark("r16-knn-measure")
    ensure_scaled(spark, sf_dir, SF1_DIR, factor=10)

    out: dict = {}
    for name in names:
        fn = REGISTRY[name].fn
        spark.sparkContext.setJobDescription(f"r16-knn-{tag}:{name}")
        df = fn(spark, sf_dir)
        ptxt = plan_text(df)
        with open(os.path.join(HERE, f"{name}_{tag}.txt"), "w") as f:
            f.write(ptxt)
        rec: dict = {"plan": plan_stats(ptxt)}
        rec["base_first"] = _time(lambda: fn(spark, sf_dir).count(), runs=1)
        rec["base_steady"] = _time(lambda: fn(spark, sf_dir).count())
        rec["sf1_first"] = _time(lambda: fn(spark, SF1_DIR).count(), runs=1)
        rec["sf1_steady"] = _time(lambda: fn(spark, SF1_DIR).count())
        rec["rows_base"] = fn(spark, sf_dir).count()
        rec["rows_sf1"] = fn(spark, SF1_DIR).count()
        out[name] = rec
        print(name, json.dumps(rec), flush=True)

    with open(os.path.join(HERE, f"knn_timings_{tag}.json"), "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()

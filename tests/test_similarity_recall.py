"""Recall harness: the approximate ANN paths earn their keep against the
exact baselines, and the quadratic exact path is fenced.

The synthetic embeddings are near-random (true top-5 neighbors sit at
cosine ≈ 0.25–0.4, barely above the 0 ± 0.12 background), which is the
WORST case for LSH/IVF — recall floors below are calibrated to that
regime with margin (measured at sf0.01: LSH ≈ 0.56 with 4 tables ×
8 bits × Hamming-1 multi-probe, IVF ≈ 0.6 with nprobe=2). On real
embedding corpora (neighbors ≈ 0.8+ cosine) the same parameters sit far
higher; the harness's job is to catch regressions in the candidate
generation, not to certify a benchmark number.
"""

from __future__ import annotations

import pytest

from denali_spark.operators import dedup as dd
from denali_spark.operators.similarity import (
    sim_ivf_topk,
    sim_lsh_bucket_topk,
    sim_topk_bruteforce,
)

SF = "/root/testdata/sf0.01"


def _neighbors(df) -> dict[int, set[int]]:
    out: dict[int, set[int]] = {}
    for r in df.collect():
        out.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    return out


def _recall_at_5(approx: dict, exact: dict) -> float:
    recs = [len(approx.get(q, set()) & e) / len(e) for q, e in exact.items()]
    return sum(recs) / len(recs)


@pytest.fixture(scope="module")
def exact_topk(spark):
    return _neighbors(sim_topk_bruteforce(spark, SF))


def test_lsh_recall_floor(spark, exact_topk):
    recall = _recall_at_5(_neighbors(sim_lsh_bucket_topk(spark, SF)), exact_topk)
    assert recall >= 0.3, f"LSH recall@5 regressed: {recall:.3f} < 0.3"


def test_ivf_recall_floor(spark, exact_topk):
    recall = _recall_at_5(_neighbors(sim_ivf_topk(spark, SF)), exact_topk)
    assert recall >= 0.4, f"IVF recall@5 regressed: {recall:.3f} < 0.4"


# --- quadratic-path fence ---------------------------------------------------


def test_embedding_pairs_guard_raises(spark, monkeypatch):
    """Above the cap the exact all-pairs baseline refuses to run unless
    explicitly opted in — nothing may silently launch an O(n²) join on a
    real corpus."""
    monkeypatch.setattr(dd, "QUADRATIC_MAX_ROWS", 10)
    with pytest.raises(ValueError, match="ALL-PAIRS"):
        dd.dedup_embedding_pairs(spark, SF)
    # explicit opt-in still builds the plan (no execution needed)
    df = dd.dedup_embedding_pairs(spark, SF, allow_quadratic=True)
    assert df.columns == ["i", "j", "cos"]


def test_embedding_pairs_runs_under_cap(spark):
    """At test scale (500 rows < cap) the exact baseline runs and agrees
    with itself as the pair-level ground truth for near-dup pairs."""
    rows = dd.dedup_embedding_pairs(spark, SF).collect()
    assert all(r["cos"] >= 0.8 and r["i"] < r["j"] for r in rows)


# --- external-probe search over the materialized index ----------------------


def test_external_probe_search_recall_and_exactness(spark, exact_topk):
    """sim_lsh_search with held-out corpus vectors as 'external' probes must
    (a) reproduce the registered query's candidate semantics — recall floor
    against the exact baseline — and (b) never fabricate: every reported
    cos is the exact cosine, and a probe identical to a corpus vector finds
    it at cos == 1.0."""
    from pyspark.sql import functions as F

    from denali_spark.operators.similarity import _vecs, sim_lsh_search

    probes = (
        _vecs(spark, SF)
        .filter(F.col("vec_id") < 5)
        .select(F.col("vec_id").alias("query_id"), "e")
    )
    got = sim_lsh_search(spark, SF, probes, k=6)
    # self-match: the probe IS corpus vector query_id → rank 1, cos 1.0
    firsts = {r["query_id"]: r for r in got.collect() if r["rn"] == 1}
    assert set(firsts) == {0, 1, 2, 3, 4}
    for q, r in firsts.items():
        assert r["neighbor_id"] == q and abs(r["cos"] - 1.0) < 1e-12
    # recall vs exact baseline on the non-self neighbors
    approx = {}
    for r in got.collect():
        if r["neighbor_id"] != r["query_id"]:
            approx.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    recall = _recall_at_5(approx, exact_topk)
    assert recall >= 0.3, f"external-probe recall@5 regressed: {recall:.3f}"

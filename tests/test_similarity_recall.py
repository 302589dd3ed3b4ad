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


# --- embedding near-dup scale paths ----------------------------------------
#
# Semantics the value-hash oracle can't see: precision against the exact
# quadratic ground truth, sub-quadratic candidate volume, and cell
# confinement.


@pytest.fixture(scope="module")
def exact_pairs(spark):
    """All exact pairs with cos >= DEDUP_COS_TAU, keyed (i, j), via the
    fenced quadratic baseline relaxed to the dedup threshold."""
    from denali_spark.operators.similarity import DEDUP_COS_TAU, _vecs, cosine
    from pyspark.sql import functions as F

    v = _vecs(spark, SF)
    a = v.select(F.col("vec_id").alias("i"), F.col("e").alias("ea"))
    b = v.select(F.col("vec_id").alias("j"), F.col("e").alias("eb"))
    rows = (
        a.join(b, F.col("i") < F.col("j"))
        .select("i", "j", cosine(F.col("ea"), F.col("eb")).alias("cos"))
        .filter(F.col("cos") >= DEDUP_COS_TAU)
        .collect()
    )
    return {(r["i"], r["j"]): r["cos"] for r in rows}


def test_lsh_pairs_are_true_pairs(spark, exact_pairs):
    """Every emitted LSH near-dup pair must exist in the exact ground truth
    with the identical cosine — the verify step makes precision exact."""
    from denali_spark.operators.similarity import dedup_embedding_lsh_pairs

    got = {(r["i"], r["j"]): r["cos"] for r in dedup_embedding_lsh_pairs(spark, SF).collect()}
    assert got, "LSH near-dup pass found nothing on a corpus with 391 true pairs"
    for pair, cos in got.items():
        assert pair in exact_pairs, f"false pair {pair}"
        assert abs(cos - exact_pairs[pair]) < 1e-12
    # candidate recall on this near-random corpus (worst case for SRP —
    # see module docstring); on real near-dup corpora (cos >= 0.9) the
    # Hamming<=1 x 4-table collision rate is ~0.99
    recall = len(got) / len(exact_pairs)
    assert recall >= 0.15, f"LSH pair recall collapsed: {recall:.3f}"


def test_sem_dedup_pairs_cell_confined(spark, exact_pairs):
    """SemDeDup pairs are true pairs AND both members share the cell the
    inverted lists assigned them to."""
    from denali_spark.operators.similarity import ivf_inverted_lists, sem_dedup_pairs

    cell = {r["vec_id"]: r["cid"] for r in ivf_inverted_lists(spark, SF).select("vec_id", "cid").collect()}
    got = sem_dedup_pairs(spark, SF).collect()
    assert got, "SemDeDup found nothing on a corpus with within-cell pairs"
    for r in got:
        assert (r["i"], r["j"]) in exact_pairs
        assert cell[r["i"]] == cell[r["j"]] == r["cid"]


def test_lsh_pairs_candidates_subquadratic(spark):
    """The bucket join must generate far fewer candidates than n^2/2 even at
    toy scale — the property that makes the pass viable at 100 TB."""
    from pyspark.sql import functions as F

    from denali_spark.operators.similarity import N_PLANES, lsh_bucket_index

    b = lsh_bucket_index(spark, SF)
    n = b.select("vec_id").distinct().count()
    flips = F.explode(F.array(*[F.lit(x) for x in range(-1, N_PLANES)]))
    ab = (
        b.withColumn("flip", flips)
        .select(
            F.col("vec_id").alias("i"),
            "t",
            F.col("bucket").bitwiseXOR(
                F.when(F.col("flip") < 0, F.lit(0)).otherwise(F.expr("shiftleft(1, flip)"))
            ).alias("bucket"),
        )
        .distinct()
    )
    cands = (
        ab.join(b, ["t", "bucket"])
        .filter(F.col("i") < F.col("vec_id"))
        .select("i", F.col("vec_id").alias("j"))
        .distinct()
        .count()
    )
    quadratic = n * (n - 1) // 2
    assert cands < 0.35 * quadratic, f"{cands} candidates vs {quadratic} pairs"


def test_sq_quantized_topk_recall(spark):
    """int8 scalar quantization must barely perturb the ranking: for the
    SAME probe set, quantized-dot top-5 vs exact-dot top-5 recall should be
    near 1 (quantization noise is ~1/254 of the value range, far below the
    neighbor/background gap even in this worst-case corpus)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from denali_spark.operators.dedup import dot_cols
    from denali_spark.operators.similarity import (
        SQ_PROBE_MOD,
        _vecs,
        sim_sq_topk,
    )

    approx = _neighbors(sim_sq_topk(spark, SF))

    v = _vecs(spark, SF)
    q = v.filter(F.col("vec_id") % SQ_PROBE_MOD == 3).select(
        F.col("vec_id").alias("query_id"), F.col("e").alias("qe")
    )
    scored = v.join(F.broadcast(q), F.col("vec_id") != F.col("query_id")).select(
        "query_id", F.col("vec_id").alias("neighbor_id"),
        dot_cols(F.col("qe"), F.col("e")).alias("s"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("s"), "neighbor_id")
    exact = _neighbors(
        scored.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= 5)
    )
    r = _recall_at_5(approx, exact)
    assert r >= 0.9, f"quantized recall@5 {r}"


def test_pq_two_stage_topk_recall(spark):
    """PQ candidate generation + int8 rerank: recall@5 vs the exact-dot
    ranking for the same probe set. The codebook is coarse (a fixed-size
    hash-ordered sample, 64 entries per subspace) and the corpus has no cluster
    structure — the worst case for PQ — so the floor is modest; the rerank
    stage means any true neighbor that survives the candidate cut ranks
    exactly."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from denali_spark.operators.dedup import dot_cols
    from denali_spark.operators.similarity import (
        PQ_PROBE_MOD,
        _vecs,
        sim_pq_topk,
    )

    approx = _neighbors(sim_pq_topk(spark, SF))

    v = _vecs(spark, SF)
    q = v.filter(F.col("vec_id") % PQ_PROBE_MOD == 7).select(
        F.col("vec_id").alias("query_id"), F.col("e").alias("qe")
    )
    scored = v.join(F.broadcast(q), F.col("vec_id") != F.col("query_id")).select(
        "query_id", F.col("vec_id").alias("neighbor_id"),
        dot_cols(F.col("qe"), F.col("e")).alias("s"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("s"), "neighbor_id")
    exact = _neighbors(
        scored.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= 5)
    )
    r = _recall_at_5(approx, exact)
    assert r >= 0.4, f"pq recall@5 {r}"  # observed 0.6 at sf0.01


def test_ivfpq_topk_recall(spark):
    """IVF-PQ composition: cell truncation (nprobe={IVFPQ_NPROBE})
    compounds with PQ quantization error, so the floor matches plain
    PQ's — candidates must still come only from the probed cells, and
    the rerank keeps surviving true neighbors exactly ordered."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from denali_spark.operators.dedup import dot_cols
    from denali_spark.operators.similarity import (
        PQ_PROBE_MOD,
        _vecs,
        sim_ivfpq_topk,
    )

    approx = _neighbors(sim_ivfpq_topk(spark, SF))

    v = _vecs(spark, SF)
    q = v.filter(F.col("vec_id") % PQ_PROBE_MOD == 7).select(
        F.col("vec_id").alias("query_id"), F.col("e").alias("qe")
    )
    scored = v.join(F.broadcast(q), F.col("vec_id") != F.col("query_id")).select(
        "query_id", F.col("vec_id").alias("neighbor_id"),
        dot_cols(F.col("qe"), F.col("e")).alias("s"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("s"), "neighbor_id")
    exact = _neighbors(
        scored.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= 5)
    )
    r = _recall_at_5(approx, exact)
    assert r >= 0.4, f"ivf-pq recall@5 {r}"  # observed 0.6 at sf0.01


def test_ivfpq_external_search_matches_registered_query(spark):
    """sim_ivfpq_search fed the registered probe set must reproduce
    sim_ivfpq_topk row-for-row (same quantization against the stored
    gmax, same cells, same codes, same rerank) — the external-probe path
    and the oracle-checked query are ONE pipeline over the materialized
    indexes, not two implementations."""
    from pyspark.sql import functions as F

    from denali_spark.operators.similarity import (
        PQ_PROBE_MOD,
        _vecs,
        sim_ivfpq_search,
        sim_ivfpq_topk,
    )

    probes = _vecs(spark, SF).filter(F.col("vec_id") % PQ_PROBE_MOD == 7).select(
        F.col("vec_id").alias("query_id"), "e"
    )
    got = {
        (r["query_id"], r["neighbor_id"], r["qdot"], r["rn"])
        for r in sim_ivfpq_search(spark, SF, probes).collect()
    }
    want = {
        (r["query_id"], r["neighbor_id"], r["qdot"], r["rn"])
        for r in sim_ivfpq_topk(spark, SF).collect()
    }
    assert got == want and got


def test_lsh_planes_fixed_at_oracle_scales_and_grows_beyond(tmp_path):
    """Every scale the driver or the local oracle compares at must resolve
    to exactly N_PLANES — the static SQL oracles bake 8 planes — while a
    10x-class corpus gets more planes (the load-bounding scale path)."""
    import shutil

    from denali_spark.operators.similarity import N_PLANES, lsh_planes

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01",
               "/root/testdata/sf0.1"):
        assert lsh_planes(sf) == N_PLANES, sf
    # a synthetic 10x corpus (row-count is what the rule reads)
    import pyarrow.parquet as pq
    import pyarrow as pa

    src = pq.read_table("/root/testdata/sf0.1/embeddings.parquet")
    big = pa.concat_tables([src] * 10)
    pq.write_table(big, str(tmp_path / "embeddings.parquet"))
    assert lsh_planes(str(tmp_path)) > N_PLANES


def test_knn_bucket_cap_never_binds_at_oracle_scale(spark):
    """The kNN-graph bucket-overflow cap must be provably inactive where
    the driver hash-compares (sf0.01): max bucket load stays under the
    cap, so capped and uncapped candidate sets are identical."""
    from pyspark.sql import functions as F

    from denali_spark.operators.similarity import (
        KNN_BUCKET_CAP,
        lsh_bucket_index,
    )

    b = lsh_bucket_index(spark, "/root/testdata/sf0.01")
    max_load = (
        b.groupBy("t", "bucket").count().agg(F.max("count")).collect()[0][0]
    )
    assert max_load < KNN_BUCKET_CAP, (
        f"max bucket load {max_load} reaches the cap {KNN_BUCKET_CAP} — "
        "the cap would change driver-compared results"
    )


def test_knn_widen_gate_crossover():
    """The widening gate must sit strictly BETWEEN the sf0.1 embeddings
    corpus and the bench's 10x-derived sf1 corpus: below-or-at sf0.1 the
    expansion exchange is pure cost (r16 A/B: 1.14s vs 0.77s), at sf1 it
    is the r14 cure for the pair-distinct serializing onto few scan
    partitions (r16 A/B: 10.2s widened vs 16.6s not). A gate above the
    sf1 row count silently disables that fix — the exact regression the
    r16 bench extras caught (gate 50k vs 20k sf1 rows)."""
    from denali_spark.engine.index_cache import corpus_rows
    from denali_spark.operators.similarity import KNN_WIDEN_MIN_ROWS

    base = corpus_rows("/root/testdata/sf0.1", "embeddings")
    assert base < KNN_WIDEN_MIN_ROWS, (
        f"gate {KNN_WIDEN_MIN_ROWS} engages at sf0.1 ({base} rows) — "
        "re-measure before shipping the exchange at oracle scales"
    )
    assert 10 * base >= KNN_WIDEN_MIN_ROWS, (
        f"gate {KNN_WIDEN_MIN_ROWS} exceeds the derived sf1 corpus "
        f"({10 * base} rows) — the r14 sf1 widening fix is silently off"
    )

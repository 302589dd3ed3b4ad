"""Planted-input semantics for the decontamination and repetition filters —
the cases a value-hash oracle over synthetic data can't pin down: a known
contaminated doc is flagged with the right overlap, benchmark docs never
flag themselves, a pathological repeated-token doc maxes the Gopher
signals, and short/empty docs don't crash the gram windows."""

from __future__ import annotations

import pytest

from denali_spark.operators.text_analysis import (
    BENCH_MOD,
    CONTAM_N,
    text_decontaminate,
    text_repetition_stats,
)


@pytest.fixture(scope="module")
def planted_dir(spark, tmp_path_factory):
    """A documents.parquet shaped like the testdata, with known overlaps.

    doc 0  (0 % BENCH_MOD == 0)  -> benchmark: "alpha beta gamma delta epsilon zeta"
    doc 1  shares the 4-gram "beta gamma delta epsilon"   -> contaminated
    doc 2  disjoint vocabulary                            -> clean
    doc 3  "spam" x 8                                     -> maximally repetitive
    doc 4  3 tokens (< CONTAM_N)                          -> no grams, no crash
    """
    rows = [
        (0, "alpha beta gamma delta epsilon zeta", "en", "src0", 35),
        (1, "intro words beta gamma delta epsilon outro", "en", "src0", 43),
        (2, "one two three four five six seven eight", "en", "src0", 39),
        (3, "spam spam spam spam spam spam spam spam", "en", "src0", 39),
        (4, "tiny doc here", "en", "src0", 13),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    d = tmp_path_factory.mktemp("planted")
    df.coalesce(1).write.mode("overwrite").parquet(str(d / "documents.parquet"))
    return str(d)


def test_decontaminate_flags_planted_overlap(spark, planted_dir):
    out = {r["doc_id"]: r for r in text_decontaminate(spark, planted_dir).collect()}
    assert set(out) == {1}, f"expected only doc 1 contaminated, got {sorted(out)}"
    r = out[1]
    # "beta gamma delta epsilon" is the single shared distinct 4-gram
    assert r["n_hits"] == 1
    assert r["n_grams"] == 7 - CONTAM_N + 1  # 7 tokens -> 4 distinct 4-grams
    assert r["contamination"] == pytest.approx(1 / 4)


def test_decontaminate_never_flags_benchmark_docs(spark, planted_dir):
    ids = [r["doc_id"] for r in text_decontaminate(spark, planted_dir).collect()]
    assert all(i % BENCH_MOD != 0 for i in ids)


def test_repetition_pathological_doc(spark, planted_dir):
    out = {r["doc_id"]: r for r in text_repetition_stats(spark, planted_dir).collect()}
    # every doc with tokens is scored
    assert set(out) == {0, 1, 2, 3, 4}
    spammy = out[3]
    assert spammy["top_word_frac"] == 1.0
    assert spammy["dup_bigram_frac"] == pytest.approx((7 - 1) / 7)
    assert spammy["is_repetitive"]
    # all-distinct docs sit at the floor and are not flagged
    clean = out[2]
    assert clean["top_word_frac"] == pytest.approx(1 / 8)
    assert clean["dup_bigram_frac"] == 0.0
    assert not clean["is_repetitive"]


def test_short_doc_has_no_grams_but_still_scores(spark, planted_dir):
    out = {r["doc_id"]: r for r in text_repetition_stats(spark, planted_dir).collect()}
    tiny = out[4]
    assert tiny["n_tokens"] == 3
    assert tiny["dup_bigram_frac"] == 0.0  # 2 distinct bigrams of 2
    contaminated = {r["doc_id"] for r in text_decontaminate(spark, planted_dir).collect()}
    assert 4 not in contaminated  # too short to carry any 4-gram


def test_chunk_cdc_single_token_doc_matches_oracle_shape(spark, tmp_path):
    """sequence(2, n) DESCENDS for n=1 — a single-token doc must produce
    exactly one chunk (no phantom boundary), matching the oracle's empty
    range(2, 2)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from denali_spark.operators.text_analysis import text_chunk_cdc

    d = str(tmp_path / "sf")
    import os

    os.makedirs(d)
    pq.write_table(
        pa.table({
            "doc_id": pa.array([1, 2], pa.int64()),
            "text": ["word", "two tokens here make a longer doc for chunks"],
            "lang": ["en", "en"], "source": ["t", "t"],
            "n_chars": pa.array([4, 44], pa.int64()),
        }),
        os.path.join(d, "documents.parquet"),
    )
    rows = {r["doc_id"]: r for r in text_chunk_cdc(spark, d).collect()}
    assert rows[1]["n_tokens"] == 1 and rows[1]["n_chunks"] == 1
    assert rows[1]["max_chunk_tokens"] == 1
    assert rows[1]["avg_chunk_tokens_x1000"] == 1000
    assert rows[2]["n_tokens"] == 9


def test_no_cached_relations_survive_text_queries(spark):
    """r9 verdict item 6 + r10 verdict item 3: none of the four text
    operators that historically persisted their exploded token/gram
    relations may leave cached relations behind — repeated library use
    would accrete caches (each larger than its input corpus), and a
    persist held by a lazily-returned DataFrame can never be released."""
    from denali_spark.operators.text_analysis import (
        text_collocation_lift,
        text_decontaminate,
        text_tfidf_topterms,
        text_unigram_logprob,
    )
    from tests.conftest import SF_SMOKE

    # Other suites running earlier in this shared session leave
    # localCheckpoint blocks behind (by design — a checkpointed relation
    # returned lazily must keep its blocks), so assert NO NEW persistent
    # RDDs rather than an absolutely empty registry.
    before = set(spark.sparkContext._jsc.getPersistentRDDs().keySet().toArray())
    assert text_unigram_logprob(spark, SF_SMOKE).count() > 0
    assert text_collocation_lift(spark, SF_SMOKE).count() >= 0
    assert text_decontaminate(spark, SF_SMOKE).count() >= 0
    assert text_tfidf_topterms(spark, SF_SMOKE).count() > 0
    after = set(spark.sparkContext._jsc.getPersistentRDDs().keySet().toArray())
    assert after <= before, f"cached relations leaked: {after - before}"


def test_no_cachemanager_entries_survive_graph_dedup_queries(spark):
    """r11 verdict item 4: the six query-held persists outside
    text_analysis (pagerank, basket lift, triangles, simhash/ngram/
    containment pair generators) are gone — pair generation reads the
    materialized pair-support / signature indexes, and the remaining
    multi-reference relations use LAZY localCheckpoint (RDD blocks,
    GC-reclaimed) instead of persist (CacheManager entry, unreleasable
    by the caller). Executed end-to-end here; the registry-wide
    plan-build sweep in test_plans.py enforces the same invariant for
    every query."""
    from denali_spark.operators.dedup import (
        dedup_containment_pairs,
        dedup_ngram_jaccard_pairs,
        dedup_simhash_pairs,
    )
    from denali_spark.operators.graph import (
        graph_basket_lift,
        graph_pagerank_parts,
        graph_triangle_parts,
    )
    from tests.conftest import SF_SMOKE

    cm = spark._jsparkSession.sharedState().cacheManager()
    cm_was_empty = cm.isEmpty()
    for fn in (
        graph_pagerank_parts,
        graph_basket_lift,
        graph_triangle_parts,
        dedup_simhash_pairs,
        dedup_ngram_jaccard_pairs,
        dedup_containment_pairs,
    ):
        assert fn(spark, SF_SMOKE).count() >= 0
        if cm_was_empty:
            assert cm.isEmpty(), f"{fn.__name__} registered a cached relation"

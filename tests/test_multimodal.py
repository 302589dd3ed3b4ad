"""Multimodal operator unit tests (round-3 ADVICE):

- `mm_featurize_vec` (the array-valued library surface) must agree with the
  driver-registered flattened `mm_featurize` — it is the composition point
  for downstream similarity consumers, so it gets exercised directly.
- A NULL documents.text row must flow through as an empty payload (n=0
  moments row), not crash the pandas kernel with bytes(None).
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import functions as F

from denali_spark.operators.multimodal import mm_binary_metadata, mm_featurize, mm_featurize_vec

SF = "/root/testdata/sf0.001"


def test_featurize_vec_matches_flattened(spark):
    vec = {r.doc_id: list(r.feat) for r in mm_featurize_vec(spark, SF).collect()}
    flat = {
        r.doc_id: [r[f"feat_{i}"] for i in range(8)]
        for r in mm_featurize(spark, SF).collect()
    }
    assert vec == flat
    assert all(len(v) == 8 for v in vec.values())


def _write_docs_with_null(tmp_path) -> str:
    d = str(tmp_path / "nulldocs")
    os.makedirs(d)
    table = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], type=pa.int64()),
            "text": pa.array(["hello", None, ""], type=pa.string()),
            "n_chars": pa.array([5, 0, 0], type=pa.int64()),
            "lang_hint": pa.array(["en", "en", "en"], type=pa.string()),
        }
    )
    pq.write_table(table, os.path.join(d, "documents.parquet"))
    return d


def test_null_text_rows_do_not_crash_kernels(spark, tmp_path):
    d = _write_docs_with_null(tmp_path)
    rows = {r.doc_id: r for r in mm_featurize(spark, d).collect()}
    assert set(rows) == {1, 2, 3}
    assert rows[1].feat_0 == 5.0  # len("hello")
    assert rows[2].feat_0 == 0.0  # NULL text → empty payload → n=0 moments
    assert rows[3].feat_0 == 0.0
    meta = {r.doc_id: r for r in mm_binary_metadata(spark, d).collect()}
    assert meta[2].n_bytes == 0


def test_phash_finds_planted_twins(spark):
    """The synthetic corpus plants near-duplicate image twins (2k, 2k+1
    share a base image; the odd one is perturbed by +1 on every 29th
    pixel): every twin pair must surface with small Hamming distance, and
    no pair should bridge two different bases at distance 0 unless their
    hashes genuinely collide (verified ≤ threshold either way)."""
    from denali_spark.operators.multimodal import (
        PHASH_HAM_TAU,
        mm_image_phash_pairs,
    )

    rows = mm_image_phash_pairs(spark, SF).collect()
    pairs = {(r["doc_a"], r["doc_b"]): r["hamming"] for r in rows}
    doc_ids = [
        r["doc_id"]
        for r in spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id").collect()
    ]
    twins = {
        (d, d + 1) for d in doc_ids if d % 2 == 0 and d + 1 in set(doc_ids)
    }
    found_twins = twins & set(pairs)
    assert len(found_twins) >= 0.9 * len(twins), (
        f"only {len(found_twins)}/{len(twins)} planted twins found"
    )
    assert all(h <= PHASH_HAM_TAU for h in pairs.values())
    # twins sit far below the threshold (the +1 perturbation barely moves
    # block means)
    assert max(pairs[t] for t in found_twins) <= 4

def test_phash_bucket_cap_keeps_twin_recall(spark):
    """The per-bucket candidate cap (round-8 LSH guard) must not cost
    recall on the planted-twin fixture: twins share all four bands, and
    no band bucket in the synthetic corpus is hot enough to trip a sane
    cap, so the capped result equals the uncapped one."""
    from denali_spark.operators.multimodal import mm_image_phash_pairs

    uncapped = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in mm_image_phash_pairs(spark, SF).collect()
    }
    capped = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in mm_image_phash_pairs(spark, SF, bucket_cap=64).collect()
    }
    assert capped == uncapped


def test_phash_bucket_cap_bounds_degenerate_corpus(spark):
    """An all-identical-hash corpus (every image in one bucket per band)
    must complete with bounded candidates under the cap: the hot buckets
    are skipped with a logged drop count instead of materializing n²
    pairs, and the drop is a warning, never silent."""
    import warnings

    from denali_spark.operators.multimodal import phash_banded_pairs

    n = 500
    hashes = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.lit(0x1234_5678_9ABC_DEF0).alias("h_hi"),
        F.lit(0x0FED_CBA9_8765_4321).alias("h_lo"),
    )
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        rows = phash_banded_pairs(hashes, bucket_cap=50).collect()
    assert rows == []  # every bucket hot -> all candidates dropped
    msgs = [str(w.message) for w in caught if "phash_banded_pairs" in str(w.message)]
    assert msgs and "skipping 4 band bucket(s)" in msgs[0]
    assert f"{4 * n} member rows dropped" in msgs[0]
    # sanity: without the cap the same corpus yields the full n^2/2 blowup
    # on a SMALL n (we don't run the 500-row quadratic here)
    small = spark.range(10).select(
        F.col("id").alias("doc_id"),
        F.lit(7).alias("h_hi"),
        F.lit(7).alias("h_lo"),
    )
    assert len(phash_banded_pairs(small).collect()) == 45

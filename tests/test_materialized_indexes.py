"""Materialized ingest-time indexes (LSH buckets, MinHash signatures):
cache-key behavior. The indexes are fingerprinted by corpus file identity
(path, size, mtime) + geometry, so a regenerated corpus must NOT serve a
stale index, and an unchanged corpus must reuse the built one."""

from __future__ import annotations

import os
import shutil

import pyarrow.parquet as pq

from denali_spark.operators.dedup import minhash_signature_index
from denali_spark.operators.similarity import lsh_bucket_index

SF = "/root/testdata/sf0.001"


def _copy_sf(tmp_path, tables) -> str:
    d = str(tmp_path / "sf")
    os.makedirs(d)
    for t in tables:
        shutil.copy(os.path.join(SF, f"{t}.parquet"), d)
    return d


def test_lsh_index_reused_then_invalidated_on_corpus_change(spark, tmp_path):
    d = _copy_sf(tmp_path, ["embeddings"])
    first = lsh_bucket_index(spark, d)
    n_first = first.count()
    path_first = first.inputFiles()[0]
    # same corpus → same on-disk index, no rebuild
    again = lsh_bucket_index(spark, d)
    assert again.inputFiles()[0] == path_first
    # regenerate the corpus (halve it) → different fingerprint → fresh index
    src = os.path.join(d, "embeddings.parquet")
    t = pq.read_table(src)
    pq.write_table(t.slice(0, t.num_rows // 2), src)
    rebuilt = lsh_bucket_index(spark, d)
    assert rebuilt.inputFiles()[0] != path_first
    assert rebuilt.count() < n_first


def test_minhash_index_reused_then_invalidated_on_corpus_change(spark, tmp_path):
    d = _copy_sf(tmp_path, ["documents"])
    first = minhash_signature_index(spark, d)
    path_first = first.inputFiles()[0]
    assert minhash_signature_index(spark, d).inputFiles()[0] == path_first
    src = os.path.join(d, "documents.parquet")
    t = pq.read_table(src)
    pq.write_table(t.slice(0, t.num_rows // 2), src)
    rebuilt = minhash_signature_index(spark, d)
    assert rebuilt.inputFiles()[0] != path_first
    # schema carries doc_id + shingle sets + 16 signature columns
    cols = set(rebuilt.columns)
    assert {"doc_id", "hs"} <= cols and sum(c.startswith("sig_") for c in cols) == 16


def test_ivf_lists_partitioned_by_centroid(spark, tmp_path):
    import pyarrow.parquet as _pq  # noqa: F401 — parity with sibling tests

    from denali_spark.operators.similarity import ivf_inverted_lists

    d = _copy_sf(tmp_path, ["embeddings"])
    lists = ivf_inverted_lists(spark, d)
    assert set(lists.columns) == {"vec_id", "e", "cid"}
    # on-disk layout is one directory partition per centroid (the IVF list
    # files) — a probe's scan prunes to its nprobe directories
    base = os.path.dirname(lists.inputFiles()[0]).removeprefix("file:")
    while not os.path.basename(base).startswith("lists-"):
        base = os.path.dirname(base)
    parts = [p for p in os.listdir(base) if p.startswith("cid=")]
    n_cents = lists.select("cid").distinct().count()
    assert len(parts) == n_cents > 0
    # reuse on identical corpus
    assert ivf_inverted_lists(spark, d).inputFiles()[0] == lists.inputFiles()[0]


def test_partial_index_directory_raises_not_consumed(spark, tmp_path):
    """A directory at the cache path without _SUCCESS (crashed build, or a
    foreign pre-created dir at the predictable path) must raise — not be
    silently consumed as the index (round-4 ADVICE)."""
    import pytest

    from denali_spark.engine.index_cache import (
        cache_root,
        corpus_fingerprint,
        index_file_count,
    )

    d = _copy_sf(tmp_path, ["embeddings"])
    from denali_spark.operators.similarity import lsh_bucket_index, lsh_geometry

    key = corpus_fingerprint(
        d, "embeddings", f"{lsh_geometry(d)}f{index_file_count(d, 'embeddings')}"
    )
    path = os.path.join(cache_root("sim"), f"buckets-{key}")
    # Partial leftover: data files but no _SUCCESS (a crashed build). An
    # EMPTY dir would be atomically replaced by the rebuild's rename — the
    # dangerous case is the non-empty one, which blocks the rename.
    os.makedirs(path)
    with open(os.path.join(path, "part-00000.parquet"), "wb") as f:
        f.write(b"not parquet")
    try:
        with pytest.raises(RuntimeError, match="_SUCCESS"):
            lsh_bucket_index(spark, d)
    finally:
        shutil.rmtree(path, ignore_errors=True)


def test_cache_root_is_per_user():
    from denali_spark.engine.index_cache import cache_root

    assert cache_root("sim").endswith(f"-{os.getuid()}")


def test_index_file_count_scales_with_corpus(tmp_path):
    """Floor of 8 at local scale; grows ~1 file per 32MB of corpus; capped."""
    from denali_spark.engine.index_cache import index_file_count

    p = tmp_path / "documents.parquet"
    p.write_bytes(b"x" * 1024)  # tiny corpus -> floor
    assert index_file_count(str(tmp_path), "documents") == 8
    assert index_file_count(str(tmp_path), "documents", floor=2) == 2
    # a 1 GiB corpus -> 33 files; the cap bounds runaway counts
    with open(p, "wb") as f:
        f.truncate(1024 * 1024 * 1024)  # sparse, no real disk use
    assert index_file_count(str(tmp_path), "documents") == 33
    assert index_file_count(str(tmp_path), "documents", cap=16) == 16


def test_pair_support_index_basket_cap_fences_mega_baskets(spark, tmp_path):
    """The pair-support build is O(Σ basket²); `basket_cap` must drop
    degenerate baskets BEFORE the self-join (bounded candidates), log the
    drop, and key a separate cache entry from the uncapped index."""
    import warnings

    import pandas as pd
    import pyarrow as pa

    from denali_spark.operators.graph import graph_index_path, pair_support_index

    d = _copy_sf(tmp_path, ["lineitem"])
    src = os.path.join(d, "lineitem.parquet")
    base = pq.read_table(src).to_pandas()
    n_base_pairs = pair_support_index(spark, d).count()

    # Inject one degenerate 60-item basket on fresh part keys (so its
    # 60*59/2 = 1770 pairs are disjoint from the organic ones).
    mega = pd.concat([base.iloc[[0]]] * 60, ignore_index=True)
    mega["l_orderkey"] = 999_999_999
    mega["l_partkey"] = [10_000_001 + i for i in range(60)]
    poisoned = pd.concat([base, mega], ignore_index=True)
    pq.write_table(
        pa.Table.from_pandas(poisoned, preserve_index=False), src
    )

    # Uncapped: the mega-basket's quadratic pair set lands in the index.
    uncapped = pair_support_index(spark, d)
    assert uncapped.count() == n_base_pairs + 60 * 59 // 2

    # Capped: the basket is fenced before the self-join, with a logged drop.
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        capped = pair_support_index(spark, d, basket_cap=20)
    msgs = [str(x.message) for x in w if "pair_support_index" in str(x.message)]
    assert msgs and "1 basket(s) over cap=20" in msgs[0]
    assert "60 member rows dropped" in msgs[0]
    assert capped.count() == n_base_pairs
    assert capped.filter("part_a > 10000000").count() == 0

    # The cap is index geometry: capped/uncapped never share a cache entry,
    # and TPC-H baskets (<=7 lines) are untouched by any sane cap.
    assert graph_index_path(d, 20) != graph_index_path(d)


def test_cc_label_index_reused_then_invalidated_on_corpus_change(spark, tmp_path):
    """The cluster-label index follows the shared cache discipline: same
    corpus → same on-disk labels (no re-propagation), regenerated corpus →
    fresh fingerprint → rebuild. Schema carries the full survivorship
    triple."""
    from denali_spark.operators.dedup import cc_label_index

    d = _copy_sf(tmp_path, ["documents"])
    first = cc_label_index(spark, d)
    path_first = first.inputFiles()[0]
    assert set(first.columns) == {"doc_id", "component", "is_canonical"}
    # every doc labeled exactly once; components are min-reachable doc ids
    n_docs = pq.read_table(os.path.join(d, "documents.parquet")).num_rows
    assert first.count() == n_docs
    assert first.filter("component > doc_id").count() == 0
    # reuse on identical corpus
    assert cc_label_index(spark, d).inputFiles()[0] == path_first
    # regenerated corpus → rebuild
    src = os.path.join(d, "documents.parquet")
    t = pq.read_table(src)
    pq.write_table(t.slice(0, t.num_rows // 2), src)
    rebuilt = cc_label_index(spark, d)
    assert rebuilt.inputFiles()[0] != path_first
    assert rebuilt.count() == t.num_rows // 2


def test_phash_hash_index_reused_then_invalidated_on_corpus_change(spark, tmp_path):
    """The perceptual-hash relation follows the shared cache discipline
    and carries one 64-bit hash per document."""
    from denali_spark.operators.multimodal import phash_hash_index

    d = _copy_sf(tmp_path, ["documents"])
    first = phash_hash_index(spark, d)
    path_first = first.inputFiles()[0]
    assert set(first.columns) == {"doc_id", "h_hi", "h_lo"}
    n_docs = pq.read_table(os.path.join(d, "documents.parquet")).num_rows
    assert first.count() == n_docs
    assert phash_hash_index(spark, d).inputFiles()[0] == path_first
    src = os.path.join(d, "documents.parquet")
    t = pq.read_table(src)
    pq.write_table(t.slice(0, t.num_rows // 2), src)
    rebuilt = phash_hash_index(spark, d)
    assert rebuilt.inputFiles()[0] != path_first
    assert rebuilt.count() == t.num_rows // 2

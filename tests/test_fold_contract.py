"""ONE contract, every fold family (r13 verdict item 7): seven index
families ride the shared generational kernel (streaming/fold.py) —
MinHash signatures, SimHash fingerprints, SRP buckets+vectors, IVF
inverted lists, PQ qvecs+codes, additive pair-support, fixpoint CC
labels. This suite runs the SAME parametrized contract over each
registered family so an eighth family cannot skip a property:

  1. graft == fold — the folded generation equals base ∪ committed
     batches with the family's own merge applied;
  2. replay is a no-op — a second fold with nothing new changes neither
     the generation nor the rows;
  3. crash-tmp sweep — a dead `gen-*.tmp-*` dir is removed by the next
     fold;
  4. corpus pinning fails loud — a fold root stamped for a different
     corpus/geometry refuses rather than silently mixing indexes.

(Retention fail-loud for stale readers is kernel-level and pinned by
tests/test_fold_retention.py; deep semantic twins per family — e.g. the
CC fixpoint vs from-scratch clustering — live in the family suites.)
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field

import pytest

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _sig_base(spark):
    from denali_spark.operators.dedup import minhash_signature_index

    return {"sigs": minhash_signature_index(spark, SF)}


def _fp_base(spark):
    from denali_spark.operators.dedup import simhash_index

    return {"fp": simhash_index(spark, SF)}


def _srp_base(spark):
    from denali_spark.operators.similarity import _vecs, lsh_bucket_index

    return {"buckets": lsh_bucket_index(spark, SF), "vecs": _vecs(spark, SF)}


def _ivf_base(spark):
    from denali_spark.operators.similarity import ivf_inverted_lists

    return {"lists": ivf_inverted_lists(spark, SF)}


def _pq_base(spark):
    from denali_spark.operators.similarity import pq_code_index

    idx = pq_code_index(spark, SF)
    return {"qvecs": idx["qvecs"], "codes": idx["codes"]}


def _pairs_base(spark):
    from denali_spark.operators.graph import pair_support_index

    return {"pairs": pair_support_index(spark, SF)}


def _labels_base(spark):
    from denali_spark.operators.dedup import cc_label_index
    from denali_spark.streaming.cc_stream import _labels_as_star_edges

    return {"labels": _labels_as_star_edges(cc_label_index(spark, SF))}


def _pairs_merge(df):
    from denali_spark.streaming.graph_stream import _merge_pairs

    return _merge_pairs(df)


def _labels_merge(df):
    from denali_spark.streaming.cc_stream import _labels_fixpoint

    return _labels_fixpoint(df)


@dataclass
class Family:
    name: str
    fold: object                      # (spark, stores, root, keep) -> dict
    base: object                      # (spark) -> {rel_name: DataFrame}
    key_cols: dict                    # rel_name -> integer column to remap
    merge: dict = field(default_factory=dict)  # rel_name -> merge fn | None


FAMILIES = [
    Family(
        "minhash_signatures",
        lambda spark, st, root, keep=2: __import__(
            "denali_spark.streaming.documents_stream", fromlist=["x"]
        ).fold_streamed_signatures(
            spark, SF, st["sigs"], index_root=root, keep_generations=keep
        ),
        _sig_base, {"sigs": "doc_id"},
    ),
    Family(
        "simhash_fingerprints",
        lambda spark, st, root, keep=2: __import__(
            "denali_spark.streaming.documents_stream", fromlist=["x"]
        ).fold_streamed_fingerprints(
            spark, SF, st["fp"], index_root=root, keep_generations=keep
        ),
        _fp_base, {"fp": "doc_id"},
    ),
    Family(
        "srp_index",
        lambda spark, st, root, keep=2: __import__(
            "denali_spark.streaming.embeddings_stream", fromlist=["x"]
        ).fold_streamed_index(
            spark, SF, st["buckets"], vec_dir=st["vecs"], index_root=root,
            keep_generations=keep,
        ),
        _srp_base, {"buckets": "vec_id", "vecs": "vec_id"},
    ),
    Family(
        "ivf_lists",
        lambda spark, st, root, keep=2: __import__(
            "denali_spark.streaming.embeddings_stream", fromlist=["x"]
        ).fold_streamed_lists(
            spark, SF, st["lists"], index_root=root, keep_generations=keep
        ),
        _ivf_base, {"lists": "vec_id"},
    ),
    Family(
        "pq_codes",
        lambda spark, st, root, keep=2: __import__(
            "denali_spark.streaming.embeddings_stream", fromlist=["x"]
        ).fold_streamed_pq(
            spark, SF, st["qvecs"], st["codes"], index_root=root,
            keep_generations=keep,
        ),
        _pq_base, {"qvecs": "vec_id", "codes": "vec_id"},
    ),
    Family(
        "pair_support",
        lambda spark, st, root, keep=2: __import__(
            "denali_spark.streaming.graph_stream", fromlist=["x"]
        ).fold_pair_support(
            spark, SF, st["pairs"], index_root=root, keep_generations=keep
        ),
        _pairs_base, {"pairs": "part_a"},
        merge={"pairs": _pairs_merge},
    ),
    Family(
        "cc_labels",
        lambda spark, st, root, keep=2: __import__(
            "denali_spark.streaming.cc_stream", fromlist=["x"]
        ).fold_cc_labels(
            spark, SF, st["labels"], index_root=root, keep_generations=keep
        ),
        _labels_base, {"labels": "i"},
        merge={"labels": _labels_merge},
    ),
]


def _stores(fam: Family, tmp_path) -> dict:
    return {rel: str(tmp_path / f"store_{rel}") for rel in fam.key_cols}


def _write_batch(spark, fam: Family, base: dict, stores: dict,
                 batch_id: int, offset: int) -> dict:
    """A committed micro-batch per relation: a small base sample with its
    key column remapped into a disjoint id range (family-shaped rows
    without hand-rolling each schema)."""
    out = {}
    for rel, key in fam.key_cols.items():
        rows = base[rel].orderBy(key).limit(4).withColumn(
            key, F.col(key) + F.lit(offset).cast("long")
        )
        rows.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(stores[rel], f"batch_id={batch_id}")
        )
        out[rel] = rows
    return out


def _rows(df) -> set:
    def canon(v):
        if isinstance(v, list):
            return tuple(canon(x) for x in v)
        if isinstance(v, bytearray):
            return bytes(v)
        return v

    return {tuple(canon(v) for v in r) for r in df.collect()}


@pytest.mark.parametrize("fam", FAMILIES, ids=lambda f: f.name)
def test_fold_contract(spark, tmp_path, fam):
    from denali_spark.streaming.fold import read_folded

    base = fam.base(spark)
    stores = _stores(fam, tmp_path)
    root = str(tmp_path / "fold_root")
    batch = _write_batch(spark, fam, base, stores, 0, 10_000_000)

    res = fam.fold(spark, stores, root)
    assert res["noop"] is False and res["generation"] == 1
    folded = read_folded(spark, root, tuple(fam.key_cols))
    # 1. graft == fold: folded generation equals base ∪ batch with the
    # family's own merge applied
    for rel in fam.key_cols:
        expected = base[rel].unionByName(
            batch[rel].select(*base[rel].columns)
        )
        merge = fam.merge.get(rel)
        if merge is not None:
            expected = merge(expected)
        assert _rows(folded[rel].select(*base[rel].columns)) == _rows(
            expected.select(*base[rel].columns)
        ), f"{fam.name}/{rel}: folded generation != base ∪ batch (merged)"
        # and the folded batch partition was truncated
        assert not os.path.isdir(os.path.join(stores[rel], "batch_id=0"))

    # 2. replay no-op: nothing new -> same generation, same rows
    before = {rel: _rows(folded[rel]) for rel in fam.key_cols}
    res2 = fam.fold(spark, stores, root)
    assert res2["noop"] is True and res2["generation"] == 1
    folded2 = read_folded(spark, root, tuple(fam.key_cols))
    for rel in fam.key_cols:
        assert _rows(folded2[rel]) == before[rel]

    # 3. crash-tmp sweep: a dead mid-write temp dir is removed on fold
    dead = os.path.join(root, "gen-99.tmp-424242")
    os.makedirs(dead, exist_ok=True)
    _write_batch(spark, fam, base, stores, 1, 20_000_000)
    res3 = fam.fold(spark, stores, root)
    assert res3["generation"] == 2 and not os.path.isdir(dead)

    # 4. corpus pinning: a root stamped for another corpus refuses
    state_path = os.path.join(root, "state.json")
    state = json.load(open(state_path))
    state["corpus"] = "some-other-corpus"
    json.dump(state, open(state_path, "w"))
    _write_batch(spark, fam, base, stores, 2, 30_000_000)
    with pytest.raises(ValueError, match="different"):
        fam.fold(spark, stores, root)

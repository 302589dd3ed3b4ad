"""Online co-purchase graph maintenance: streamed pair-support partials
graft onto the base index and fold into generations with the ADDITIVE
merge (one row per pair, supports summed) — the sixth relation family on
the shared fold kernel, checked against a from-scratch recompute over
base corpus + landed orders."""

from __future__ import annotations

import time

import pytest

from pyspark.sql import functions as F

from denali_spark.operators.graph import pair_support_index
from denali_spark.streaming.graph_stream import (
    fold_pair_support,
    make_pair_support_sink,
    pair_support_with_grafts,
    read_lineitem_stream,
)

SF = "/root/testdata/sf0.001"
BASE_KEY = 1_000_000_000  # new order keys: disjoint from every corpus order


def _pairs_dict(df):
    return {
        (int(r["part_a"]), int(r["part_b"])): int(r["support"])
        for r in df.collect()
    }


def _drop(spark, src, orders):
    rows = [(BASE_KEY + ok, pk) for ok, parts in orders for pk in parts]
    spark.createDataFrame(rows, "l_orderkey long, l_partkey long").coalesce(
        1
    ).write.mode("append").parquet(src)
    time.sleep(1.1)


def _run(spark, src, store, ckpt):
    q = (
        read_lineitem_stream(spark, src, max_files_per_trigger=1)
        .writeStream.foreachBatch(make_pair_support_sink(store))
        .option("checkpointLocation", ckpt)
        .start()
    )
    q.processAllAvailable()
    q.stop()


def test_pair_support_graft_fold_and_regrow(spark, tmp_path):
    src = str(tmp_path / "landing")
    store = str(tmp_path / "pairs-store")
    root = str(tmp_path / "pairs-fold")
    # two drops of NEW complete orders (the sink contract)
    _drop(spark, src, [(1, [1, 2, 3]), (2, [2, 3])])
    _drop(spark, src, [(3, [1, 2])])
    _run(spark, src, store, str(tmp_path / "ckpt"))

    base = _pairs_dict(pair_support_index(spark, SF))
    deltas = {(1, 2): 2, (1, 3): 1, (2, 3): 2}
    expected = dict(base)
    for k, v in deltas.items():
        expected[k] = expected.get(k, 0) + v

    # graft read: base ∪ committed partials, one row per pair
    grafted = pair_support_with_grafts(spark, SF, store)
    assert _pairs_dict(grafted) == expected

    # fold: generation 1 holds the merged relation; graft read now serves
    # the folded generation (and no unfolded partials remain)
    res = fold_pair_support(spark, SF, store, root)
    assert res["generation"] == 1 and sorted(res["folded_batches"]) == [0, 1]
    after = pair_support_with_grafts(spark, SF, store, index_root=root)
    assert _pairs_dict(after) == expected
    # additive merge left exactly one row per pair
    assert after.groupBy("part_a", "part_b").count().filter(
        F.col("count") > 1
    ).count() == 0

    # replayed fold is a no-op
    assert fold_pair_support(spark, SF, store, root)["noop"] is True

    # the stream keeps running: a third drop grafts onto gen-1, then folds
    # into gen-2 — supports keep adding across generations
    _drop(spark, src, [(4, [2, 3])])
    _run(spark, src, store, str(tmp_path / "ckpt"))  # SAME checkpoint: resume, not replay
    expected[(2, 3)] += 1
    grafted2 = pair_support_with_grafts(spark, SF, store, index_root=root)
    assert _pairs_dict(grafted2) == expected
    res2 = fold_pair_support(spark, SF, store, root)
    assert res2["generation"] == 2 and res2["noop"] is False
    final = pair_support_with_grafts(spark, SF, store, index_root=root)
    assert _pairs_dict(final) == expected

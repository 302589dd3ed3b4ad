"""Streaming embedding-index ingest: late-arriving vectors bucket-hashed
per micro-batch into the SRP bucket-index layout, searchable through
sim_lsh_search's extra_buckets/extra_vecs graft. Checked against the batch
bucket_assignments kernel over the same vectors (exact equivalence — the
planes are shared code), plus planted-twin retrieval and replay
idempotence, mirroring test_streaming_dedup.py's discipline."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from denali_spark.operators.similarity import (
    bucket_assignments,
    sim_lsh_search,
)
from denali_spark.streaming.embeddings_stream import (
    make_embedding_index_sink,
    read_embedding_stream,
    read_streamed_buckets,
    read_streamed_vectors,
)

SF = "/root/testdata/sf0.001"


def _landed_vectors(spark, tmp_path):
    """Two file drops: a near-copy of corpus vec 0 (a planted twin the
    search must retrieve) and two deterministic unrelated vectors."""
    base = spark.read.parquet(f"{SF}/embeddings.parquet")
    src = str(tmp_path / "emb-landing")
    twin = base.filter(F.col("vec_id") == 0).select(
        F.lit(1_000_000).cast("long").alias("vec_id"),
        F.transform(
            "embedding", lambda x: (x * 0.999).cast("float")
        ).alias("embedding"),
    )
    twin.coalesce(1).write.mode("append").parquet(src)
    time.sleep(1.1)
    others = spark.createDataFrame(
        [
            (1_000_001 + i, [float((i + 2) * (j % 7) - 3.0) for j in range(64)])
            for i in range(2)
        ],
        "vec_id long, embedding array<float>",
    )
    others.coalesce(1).write.mode("append").parquet(src)
    return src, twin.unionByName(others)


def test_streamed_buckets_match_batch_kernel_and_search(spark, tmp_path):
    src, landed = _landed_vectors(spark, tmp_path)
    bucket_dir = str(tmp_path / "stream-buckets")
    vec_dir = str(tmp_path / "stream-vecs")
    q = (
        read_embedding_stream(spark, src)
        .writeStream.foreachBatch(make_embedding_index_sink(bucket_dir, vec_dir))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()

    # 1) exact equivalence with the batch kernel over the same vectors —
    # same planes, same buckets, regardless of micro-batch grouping
    streamed = {
        (r["vec_id"], r["t"], r["bucket"])
        for r in read_streamed_buckets(spark, bucket_dir).collect()
    }
    batch_twin = {
        (r["vec_id"], r["t"], r["bucket"])
        for r in bucket_assignments(
            landed.select(
                "vec_id",
                F.transform("embedding", lambda x: x.cast("double")).alias("e"),
            )
        ).collect()
    }
    assert streamed == batch_twin and len(streamed) == 3 * 4  # 3 vecs x 4 tables

    # 2) the planted twin is searchable: probe with corpus vec 0's own
    # embedding; the scaled copy shares every bucket (SRP is sign-based,
    # positive scaling preserves all signs) and reranks to cos ~ 1
    probes = (
        spark.read.parquet(f"{SF}/embeddings.parquet")
        .filter(F.col("vec_id") == 0)
        .select(
            F.lit(0).cast("long").alias("query_id"),
            F.transform("embedding", lambda x: x.cast("double")).alias("e"),
        )
    )
    hits = sim_lsh_search(
        spark, SF, probes, k=3,
        extra_buckets=read_streamed_buckets(spark, bucket_dir),
        extra_vecs=read_streamed_vectors(spark, vec_dir),
    ).collect()
    by_id = {r["neighbor_id"]: r for r in hits}
    assert 1_000_000 in by_id
    assert by_id[1_000_000]["cos"] > 0.999999
    assert by_id[1_000_000]["rn"] == 1

    # 3) replay idempotence: re-running every batch with its own rows
    # overwrites only its own partition — the store is unchanged
    import os

    sink = make_embedding_index_sink(bucket_dir, vec_dir)
    for d in os.listdir(bucket_dir):
        if not d.startswith("batch_id="):
            continue
        bid = int(d.split("=")[1])
        ids = [
            r["vec_id"]
            for r in spark.read.parquet(os.path.join(bucket_dir, d))
            .select("vec_id").distinct().collect()
        ]
        sink(spark.read.parquet(src).filter(F.col("vec_id").isin(ids)), bid)
    replayed = {
        (r["vec_id"], r["t"], r["bucket"])
        for r in read_streamed_buckets(spark, bucket_dir).collect()
    }
    assert replayed == streamed
    vec_ids = sorted(
        r["vec_id"] for r in read_streamed_vectors(spark, vec_dir).collect()
    )
    assert vec_ids == [1_000_000, 1_000_001, 1_000_002]


def test_streaming_embedding_dedup_guard(spark, tmp_path):
    """Semantic online dedup for a vector stream: corpus copies are
    flagged against the base index, a same-batch twin dedups intra-batch,
    a repeat arrival across batches dedups against the grown store, and
    novel vectors pass. Verdicts match the batch kernel over the same
    grouping."""
    from denali_spark.operators.similarity import embedding_online_dedup
    from denali_spark.streaming.embeddings_stream import (
        make_embedding_dedup_sink,
        read_dedup_verdicts,
    )

    base = spark.read.parquet(f"{SF}/embeddings.parquet")
    src = str(tmp_path / "guard-landing")
    # drop 1: a scaled copy of corpus vec 3 (duplicate-of-corpus), a novel
    # vector, and a second copy of that novel vector (intra-batch dup)
    novel_vals = [float((j % 11) - 5) for j in range(64)]
    corpus_copy = base.filter(F.col("vec_id") == 3).select(
        F.lit(2_000_000).cast("long").alias("vec_id"),
        F.transform("embedding", lambda x: (x * 1.01).cast("float")).alias(
            "embedding"
        ),
    )
    corpus_copy.coalesce(1).write.mode("append").parquet(src)
    spark.createDataFrame(
        [(2_000_001, novel_vals), (2_000_002, novel_vals)],
        "vec_id long, embedding array<float>",
    ).coalesce(1).write.mode("append").parquet(src)
    time.sleep(1.1)
    # drop 2: the SAME novel vector arriving again — must dedup against
    # the grown store, not be re-accepted
    spark.createDataFrame(
        [(2_000_003, novel_vals)], "vec_id long, embedding array<float>"
    ).coalesce(1).write.mode("append").parquet(src)

    out = str(tmp_path / "guard-verdicts")
    from denali_spark.streaming.embeddings_stream import read_embedding_stream

    q = (
        read_embedding_stream(spark, src)
        .writeStream.foreachBatch(
            make_embedding_dedup_sink(SF, out, tau=0.9)
        )
        .option("checkpointLocation", str(tmp_path / "guard-ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()

    got = {
        r["vec_id"]: (r["is_duplicate"], r["dup_of"])
        for r in read_dedup_verdicts(spark, out).collect()
    }
    assert got[2_000_000] == (True, 3)  # corpus duplicate (scaling preserves cosine)
    assert got[2_000_001][0] is False  # first copy of the novel vector
    assert got[2_000_002] == (True, 2_000_001)  # intra-batch twin
    assert got[2_000_003][0] is True  # repeat arrival vs the GROWN store
    assert got[2_000_003][1] == 2_000_001

    # batch twin: one batch holding all four, vs the base corpus only —
    # same verdicts for the single-batch-decidable rows
    all_vecs = spark.read.parquet(src).select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("e"),
    )
    twin = {
        r["vec_id"]: (r["is_duplicate"], r["dup_of"])
        for r in embedding_online_dedup(
            spark, SF, all_vecs, 0.9, self_dedup=True
        ).collect()
    }
    assert twin[2_000_000] == (True, 3)
    assert twin[2_000_001][0] is False
    assert twin[2_000_002] == (True, 2_000_001)
    assert twin[2_000_003] == (True, 2_000_001)


def test_fold_streamed_index_lifecycle(spark, tmp_path):
    """r9 verdict item 5: fold_streamed_index completes the online-index
    lifecycle — search over the folded generation (no grafts) equals the
    grafted search, a replayed fold is a no-op, the streamed store is
    truncated, and a post-fold batch folds incrementally into gen-2."""
    import os

    from denali_spark.streaming.embeddings_stream import (
        fold_streamed_index,
        read_folded_index,
    )

    bucket_dir = str(tmp_path / "fold-buckets")
    vec_dir = str(tmp_path / "fold-vecs")
    index_root = str(tmp_path / "fold-index")
    sink = make_embedding_index_sink(bucket_dir, vec_dir)
    base = spark.read.parquet(f"{SF}/embeddings.parquet")
    twin = base.filter(F.col("vec_id") == 0).select(
        F.lit(1_000_000).cast("long").alias("vec_id"),
        F.transform("embedding", lambda x: (x * 0.999).cast("float")).alias(
            "embedding"
        ),
    )
    others = spark.createDataFrame(
        [
            (1_000_001 + i, [float((i + 2) * (j % 7) - 3.0) for j in range(64)])
            for i in range(2)
        ],
        "vec_id long, embedding array<float>",
    )
    sink(twin, 0)
    sink(others, 1)

    probes = base.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"),
        F.transform("embedding", lambda x: x.cast("double")).alias("e"),
    )

    def rows(df):
        return sorted(
            (r["query_id"], r["neighbor_id"], round(r["cos"], 9), r["rn"])
            for r in df.collect()
        )

    grafted = rows(
        sim_lsh_search(
            spark, SF, probes, k=5,
            extra_buckets=read_streamed_buckets(spark, bucket_dir),
            extra_vecs=read_streamed_vectors(spark, vec_dir),
        )
    )

    rep = fold_streamed_index(
        spark, SF, bucket_dir, vec_dir, index_root=index_root
    )
    assert rep == {"generation": 1, "folded_batches": [0, 1], "noop": False}
    fb, fv = read_folded_index(spark, index_root)
    folded = rows(
        sim_lsh_search(spark, SF, probes, k=5, base_buckets=fb, base_vecs=fv)
    )
    assert folded == grafted
    # streamed store truncated; a replayed fold is a no-op
    assert read_streamed_buckets(spark, bucket_dir) is None
    assert read_streamed_vectors(spark, vec_dir) is None
    rep2 = fold_streamed_index(
        spark, SF, bucket_dir, vec_dir, index_root=index_root
    )
    assert rep2["noop"] and rep2["generation"] == 1
    assert folded == rows(
        sim_lsh_search(spark, SF, probes, k=5, base_buckets=fb, base_vecs=fv)
    )

    # a replayed SINK write of an already-folded batch is swept, not refolded
    sink(twin, 0)
    rep3 = fold_streamed_index(
        spark, SF, bucket_dir, vec_dir, index_root=index_root
    )
    assert rep3["noop"]
    assert not os.path.isdir(os.path.join(bucket_dir, "batch_id=0"))

    # incremental: a genuinely new batch folds into gen-2 without
    # recomputing gen-1, and search sees it with no grafts
    late = spark.createDataFrame(
        [(1_000_009, [float((j % 5) - 2.0) for j in range(64)])],
        "vec_id long, embedding array<float>",
    )
    sink(late, 2)
    rep4 = fold_streamed_index(
        spark, SF, bucket_dir, vec_dir, index_root=index_root
    )
    assert rep4 == {"generation": 2, "folded_batches": [2], "noop": False}
    fb2, fv2 = read_folded_index(spark, index_root)
    assert sorted(
        r["vec_id"] for r in fv2.filter(F.col("vec_id") >= 1_000_000).collect()
    ) == [1_000_000, 1_000_001, 1_000_002, 1_000_009]
    # gen-1 retained under keep_generations=2, gen-0 is the base (implicit)
    assert os.path.isdir(os.path.join(index_root, "gen-1"))

    # post-fold dedup sink wired to the generation store: a twin of the
    # FOLDED late vector must flag duplicate even though its streamed
    # partition is gone — the corpus now lives in the generation
    from denali_spark.streaming.embeddings_stream import (
        make_embedding_dedup_sink,
        read_dedup_verdicts,
    )

    ded_out = str(tmp_path / "fold-dedup")
    dsink = make_embedding_dedup_sink(SF, ded_out, index_root=index_root)
    twin9 = spark.createDataFrame(
        [(5_000_000, [float((j % 5) - 2.0) * 0.99 for j in range(64)])],
        "vec_id long, embedding array<float>",
    )
    dsink(twin9, 0)
    v = {r["vec_id"]: r for r in read_dedup_verdicts(spark, ded_out).collect()}
    assert v[5_000_000]["is_duplicate"] and v[5_000_000]["dup_of"] == 1_000_009


def test_fold_lifecycle_randomized(spark, tmp_path):
    """Seeded randomized fold-lifecycle fuzz (the fold kernel's analogue
    of the DDL round-trip fuzz): a random interleaving of sink writes,
    folds, replayed folds, and replayed sink writes must always leave the
    READER VIEW (folded generation ∪ committed streamed partitions) equal
    to the model set of every vector ever accepted — and the streamed
    store must never retain a folded batch."""
    import os
    import random

    from denali_spark.streaming.embeddings_stream import (
        fold_streamed_index,
        read_folded_index,
    )

    rng = random.Random(0xD51)
    bucket_dir = str(tmp_path / "fz-b")
    vec_dir = str(tmp_path / "fz-v")
    index_root = str(tmp_path / "fz-i")
    sink = make_embedding_index_sink(bucket_dir, vec_dir)
    base_ids = {
        r["vec_id"]
        for r in spark.read.parquet(f"{SF}/embeddings.parquet")
        .select("vec_id").collect()
    }

    def vec_batch(ids):
        return spark.createDataFrame(
            [(i, [float((i + j) % 11 - 5) for j in range(64)]) for i in ids],
            "vec_id long, embedding array<float>",
        )

    model: set[int] = set()          # streamed ids ever accepted
    written: dict[int, list[int]] = {}  # batch_id -> ids
    next_id = 2_000_000
    batch_no = 0
    for step in range(12):
        op = rng.choice(["write", "write", "fold", "refold", "rewrite"])
        if op == "write" or not written:
            ids = [next_id + k for k in range(rng.randint(1, 3))]
            next_id += 10
            sink(vec_batch(ids), batch_no)
            written[batch_no] = ids
            model.update(ids)
            batch_no += 1
        elif op == "fold":
            fold_streamed_index(spark, SF, bucket_dir, vec_dir, index_root=index_root)
        elif op == "refold":
            r1 = fold_streamed_index(spark, SF, bucket_dir, vec_dir, index_root=index_root)
            r2 = fold_streamed_index(spark, SF, bucket_dir, vec_dir, index_root=index_root)
            assert r2["noop"]
            assert r2["generation"] == r1["generation"]
        else:  # replay an old sink write verbatim
            bid = rng.choice(sorted(written))
            sink(vec_batch(written[bid]), bid)

        # reader view = folded generation ∪ committed streamed partitions
        view: set[int] = set()
        folded = read_folded_index(spark, index_root)
        if folded is not None:
            view |= {
                r["vec_id"]
                for r in folded[1].select("vec_id").collect()
            } - base_ids
        sb = read_streamed_buckets(spark, bucket_dir)
        if sb is not None:
            view |= {r["vec_id"] for r in sb.select("vec_id").distinct().collect()}
        assert view == model, f"step {step} op {op}: {view ^ model}"
    # final fold drains the store completely
    fold_streamed_index(spark, SF, bucket_dir, vec_dir, index_root=index_root)
    assert read_streamed_buckets(spark, bucket_dir) is None
    fb, fv = read_folded_index(spark, index_root)
    assert {
        r["vec_id"] for r in fv.select("vec_id").collect()
    } - base_ids == model
    # no stray batch dirs anywhere
    for d in (bucket_dir, vec_dir):
        assert not any(n.startswith("batch_id=") for n in os.listdir(d))


def test_fold_rebuilds_partial_generation_and_sweeps_leftovers(spark, tmp_path):
    """Crash paths: (a) a gen dir left by a fold that died before the
    state commit is an unreferenced partial — the next fold rebuilds it
    rather than trusting it; (b) a fold that died between state commit
    and truncation leaves folded streamed partitions behind — the next
    call (even a no-op) sweeps them."""
    import json
    import os

    from denali_spark.streaming.embeddings_stream import (
        fold_streamed_index,
        read_folded_index,
    )

    bucket_dir = str(tmp_path / "cr-b")
    vec_dir = str(tmp_path / "cr-v")
    index_root = str(tmp_path / "cr-i")
    sink = make_embedding_index_sink(bucket_dir, vec_dir)
    sink(
        spark.createDataFrame(
            [(3_000_000, [1.0] * 64)], "vec_id long, embedding array<float>"
        ),
        0,
    )
    # (a) plant a garbage gen-1 (simulating a crash mid-write, pre-state)
    os.makedirs(os.path.join(index_root, "gen-1", "buckets"))
    with open(os.path.join(index_root, "gen-1", "buckets", "junk"), "w") as f:
        f.write("not parquet")
    rep = fold_streamed_index(spark, SF, bucket_dir, vec_dir, index_root=index_root)
    assert rep == {"generation": 1, "folded_batches": [0], "noop": False}
    fb, fv = read_folded_index(spark, index_root)
    assert fv.filter(F.col("vec_id") == 3_000_000).count() == 1

    # (b) simulate crash-after-state-commit: re-write batch 0's partitions
    # (as a replayed sink would), which the state already lists as folded
    sink(
        spark.createDataFrame(
            [(3_000_000, [1.0] * 64)], "vec_id long, embedding array<float>"
        ),
        0,
    )
    assert os.path.isdir(os.path.join(bucket_dir, "batch_id=0"))
    state = json.load(open(os.path.join(index_root, "state.json")))
    assert state["folded_batches"] == [0]
    rep2 = fold_streamed_index(spark, SF, bucket_dir, vec_dir, index_root=index_root)
    assert rep2["noop"]
    assert not os.path.isdir(os.path.join(bucket_dir, "batch_id=0"))
    assert not os.path.isdir(os.path.join(vec_dir, "batch_id=0"))


def test_embedding_drift_guard(spark, tmp_path):
    """Distribution-drift monitoring: in-distribution copies of a label's
    own corpus vectors score high cosine to the running centroid (not
    drifted); inverted vectors crater the mean (drifted); an unseen label
    flags new_label; the state grows so batch 2 scores against base +
    batch 1; and a replayed batch overwrites its own partitions only."""
    from denali_spark.streaming.embeddings_stream import (
        make_embedding_drift_sink,
        read_dedup_verdicts,
    )

    out = str(tmp_path / "drift")
    # the synthetic corpus clusters loosely (own-label mean cos ~0.2),
    # so the alert line sits between in-distribution (+0.2) and inverted (-0.2)
    sink = make_embedding_drift_sink(SF, out, alert_cos=0.05)
    base = spark.read.parquet(f"{SF}/embeddings.parquet")

    # batch 0: exact copies of label 0's own vectors (cos→~centroid
    # self-similarity, high), plus INVERTED label-1 vectors (cos ≈ -1)
    ok = base.filter(F.col("label") == 0).limit(5).select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"), "label", "embedding"
    )
    bad = base.filter(F.col("label") == 1).limit(5).select(
        (F.col("vec_id") + 2_000_000).alias("vec_id"), "label",
        F.transform("embedding", lambda x: (-x).cast("float")).alias("embedding"),
    )
    sink(ok.unionByName(bad), 0)
    v0 = {r["label"]: r for r in spark.read.parquet(f"{out}/batch_id=0").collect()}
    assert v0[0]["drifted"] is False and v0[0]["mean_cos"] > 0.05
    assert v0[1]["drifted"] is True and v0[1]["mean_cos"] < 0
    assert v0[0]["new_label"] is False

    # batch 1: an unseen label → new_label + drifted
    novel = spark.createDataFrame(
        [(3_000_000, 99, [1.0] * 64)], "vec_id long, label int, embedding array<float>"
    )
    sink(novel, 1)
    v1 = {r["label"]: r for r in spark.read.parquet(f"{out}/batch_id=1").collect()}
    assert v1[99]["new_label"] is True and v1[99]["drifted"] is True
    assert v1[99]["mean_cos"] is None

    # batch 2: the SAME novel-label vector again — now the state holds
    # label 99's batch-1 contribution, so it scores cos == 1 (not new)
    sink(novel.select((F.col("vec_id") + 1).alias("vec_id"), "label", "embedding"), 2)
    v2 = {r["label"]: r for r in spark.read.parquet(f"{out}/batch_id=2").collect()}
    assert v2[99]["new_label"] is False
    assert v2[99]["mean_cos"] > 0.999999 and v2[99]["drifted"] is False

    # replay the LAST batch verbatim (the only replay Structured
    # Streaming's checkpoint can produce): its own state partition is
    # excluded from the corpus view, so the verdict is identical
    sink(novel.select((F.col("vec_id") + 1).alias("vec_id"), "label", "embedding"), 2)
    r2 = {r["label"]: r for r in spark.read.parquet(f"{out}/batch_id=2").collect()}
    assert r2[99]["new_label"] is False
    assert r2[99]["mean_cos"] > 0.999999 and r2[99]["drifted"] is False
    # and the full verdict store reads back with all three batches
    assert read_dedup_verdicts(spark, out).count() == 4


def test_ivf_online_lifecycle(spark, tmp_path):
    """IVF — the third index type through the shared fold kernel: a
    streamed twin is searchable via extra_lists, search over the folded
    generation (no grafts) equals the grafted search, the external-probe
    IVF search matches sim_ivf_topk's semantics on corpus probes, replay
    of the fold is a no-op."""
    from denali_spark.operators.similarity import (
        IVF_NPROBE,
        sim_ivf_search,
        sim_ivf_topk,
    )
    from denali_spark.streaming.embeddings_stream import (
        fold_streamed_lists,
        make_ivf_index_sink,
        read_folded_lists,
        read_streamed_lists,
    )

    # external-probe search over the base lists reproduces sim_ivf_topk
    # (whose probes are corpus vectors scored through the same machinery)
    base = spark.read.parquet(f"{SF}/embeddings.parquet")
    probes = base.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"),
        F.transform("embedding", lambda x: x.cast("double")).alias("e"),
    )
    mine = sorted(
        (r["query_id"], r["neighbor_id"], r["rn"])
        for r in sim_ivf_search(spark, SF, probes, k=5, nprobe=IVF_NPROBE).collect()
    )
    ref = sorted(
        (r["query_id"], r["neighbor_id"], r["rn"])
        for r in sim_ivf_topk(spark, SF).collect()
    )
    assert mine == ref

    # streamed twin of corpus vec 0: same centroid, searchable via graft
    list_dir = str(tmp_path / "ivf-lists")
    index_root = str(tmp_path / "ivf-index")
    sink = make_ivf_index_sink(SF, list_dir)
    twin = base.filter(F.col("vec_id") == 0).select(
        F.lit(1_000_000).cast("long").alias("vec_id"),
        F.transform("embedding", lambda x: (x * 0.999).cast("float")).alias(
            "embedding"
        ),
    )
    sink(twin, 0)
    probe0 = probes.filter(F.col("query_id") == 0)
    grafted = sim_ivf_search(
        spark, SF, probe0, k=3,
        extra_lists=read_streamed_lists(spark, list_dir),
    ).collect()
    by_id = {r["neighbor_id"]: r for r in grafted}
    assert 1_000_000 in by_id and by_id[1_000_000]["rn"] == 1

    # fold → search over the generation with no grafts, identical result
    rep = fold_streamed_lists(spark, SF, list_dir, index_root=index_root)
    assert rep == {"generation": 1, "folded_batches": [0], "noop": False}
    folded = sim_ivf_search(
        spark, SF, probe0, k=3,
        base_lists=read_folded_lists(spark, index_root),
    ).collect()
    assert sorted((r["neighbor_id"], r["rn"]) for r in folded) == sorted(
        (r["neighbor_id"], r["rn"]) for r in grafted
    )
    assert read_streamed_lists(spark, list_dir) is None
    rep2 = fold_streamed_lists(spark, SF, list_dir, index_root=index_root)
    assert rep2["noop"] and rep2["generation"] == 1


def test_pq_online_lifecycle(spark, tmp_path):
    """r11: the PQ code table runs the same ingest→graft→fold lifecycle
    as the other three indexes. A streamed near-twin of corpus vec 0
    quantizes/encodes against the FROZEN corpus gmax+codebooks (paired
    with the IVF list sink for its cell), ranks first for probe 0 via
    grafts, folds into a generation that reproduces the grafted result
    with no grafts, and a replayed fold is a no-op."""
    from denali_spark.operators.similarity import sim_ivfpq_search
    from denali_spark.streaming.embeddings_stream import (
        fold_streamed_pq,
        make_ivf_index_sink,
        make_pq_code_sink,
        read_folded_pq,
        read_streamed_lists,
        read_streamed_pq,
    )

    base = spark.read.parquet(f"{SF}/embeddings.parquet")
    qvec_dir = str(tmp_path / "pq-qvecs")
    code_dir = str(tmp_path / "pq-codes")
    list_dir = str(tmp_path / "pq-ivf-lists")
    index_root = str(tmp_path / "pq-index")
    pq_sink = make_pq_code_sink(SF, qvec_dir, code_dir)
    ivf_sink = make_ivf_index_sink(SF, list_dir)

    twin = base.filter(F.col("vec_id") == 0).select(
        F.lit(2_000_000).cast("long").alias("vec_id"),
        F.transform("embedding", lambda x: (x * 0.999).cast("float")).alias(
            "embedding"
        ),
    )
    pq_sink(twin, 0)
    ivf_sink(twin, 0)

    probe0 = base.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"),
        F.transform("embedding", lambda x: x.cast("double")).alias("e"),
    )
    sq, sc = read_streamed_pq(spark, qvec_dir, code_dir)
    grafted = sim_ivfpq_search(
        spark, SF, probe0, k=3,
        extra_qvecs=sq, extra_codes=sc,
        extra_lists=read_streamed_lists(spark, list_dir),
    ).collect()
    by_id = {r["neighbor_id"]: r for r in grafted}
    assert 2_000_000 in by_id and by_id[2_000_000]["rn"] == 1

    # replayed sink write: same bytes, graft verdicts unchanged
    pq_sink(twin, 0)
    sq2, sc2 = read_streamed_pq(spark, qvec_dir, code_dir)
    again = sim_ivfpq_search(
        spark, SF, probe0, k=3,
        extra_qvecs=sq2, extra_codes=sc2,
        extra_lists=read_streamed_lists(spark, list_dir),
    ).collect()
    assert sorted((r["neighbor_id"], r["rn"]) for r in again) == sorted(
        (r["neighbor_id"], r["rn"]) for r in grafted
    )

    # fold → search over the generation (grafting only the IVF cell rows,
    # which live in their own store/fold) reproduces the grafted result
    rep = fold_streamed_pq(spark, SF, qvec_dir, code_dir, index_root=index_root)
    assert rep == {"generation": 1, "folded_batches": [0], "noop": False}
    fq, fc = read_folded_pq(spark, index_root)
    folded = sim_ivfpq_search(
        spark, SF, probe0, k=3,
        base_qvecs=fq, base_codes=fc,
        extra_lists=read_streamed_lists(spark, list_dir),
    ).collect()
    assert sorted((r["neighbor_id"], r["rn"]) for r in folded) == sorted(
        (r["neighbor_id"], r["rn"]) for r in grafted
    )
    # streamed PQ stores truncated; replayed fold is a no-op
    assert read_streamed_pq(spark, qvec_dir, code_dir) is None
    rep2 = fold_streamed_pq(spark, SF, qvec_dir, code_dir, index_root=index_root)
    assert rep2["noop"] and rep2["generation"] == 1


def test_fold_refuses_mixed_plane_batches(spark, tmp_path):
    """At corpora past the adaptive-geometry threshold the default
    (base-geometry) index sink and the corpus disagree on plane count —
    folding would strand streamed vectors in buckets no probe ever hits,
    so the fold must refuse with the remedy; batches stamped via
    sf_dir-aware sinks fold fine."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import pytest as _pytest

    from denali_spark.operators.similarity import N_PLANES, lsh_planes
    from denali_spark.streaming.embeddings_stream import (
        fold_streamed_index,
        make_embedding_index_sink,
    )

    corpus = tmp_path / "corpus"
    corpus.mkdir()
    src = pq.read_table("/root/testdata/sf0.001/embeddings.parquet")
    pq.write_table(pa.concat_tables([src] * 16),
                   str(corpus / "embeddings.parquet"))
    assert lsh_planes(str(corpus)) > N_PLANES

    batch = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    batch = batch.select("vec_id", "embedding").limit(8)
    bucket_dir = str(tmp_path / "buckets")
    vec_dir = str(tmp_path / "vecs")

    # default sink: base-geometry batch against an adaptive-geometry corpus
    make_embedding_index_sink(bucket_dir, vec_dir)(batch, 0)
    with _pytest.raises(ValueError, match="SRP planes"):
        fold_streamed_index(spark, str(corpus), bucket_dir, vec_dir=vec_dir,
                            index_root=str(tmp_path / "root"))

    # sf_dir-aware sink stamps the corpus geometry — the fold proceeds
    bucket_dir2 = str(tmp_path / "buckets2")
    vec_dir2 = str(tmp_path / "vecs2")
    make_embedding_index_sink(bucket_dir2, vec_dir2, sf_dir=str(corpus))(batch, 0)
    res = fold_streamed_index(spark, str(corpus), bucket_dir2,
                              vec_dir=vec_dir2,
                              index_root=str(tmp_path / "root2"))
    assert res["noop"] is False and res["generation"] == 1

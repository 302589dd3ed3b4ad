"""Streaming online dedup: documents land as files, each micro-batch flags
its docs against the corpus via the materialized signature index PLUS the
grown per-batch signature store PLUS itself. Checked against the batch-mode
kernel over the same documents, plus explicit replay idempotence and
index-growth semantics (the same doc arriving twice — within one batch or
across batches — is marked novel exactly once)."""

from __future__ import annotations

import os
import time

import pytest

from pyspark.sql import functions as F

from denali_spark.operators.dedup import online_dedup
from denali_spark.streaming.documents_stream import (
    make_online_dedup_sink,
    read_document_stream,
    read_verdicts,
)

SF = "/root/testdata/sf0.001"


def _novel_doc(i: int) -> str:
    # Fully disjoint token sets per doc — no shared shingles, so these can
    # never near-match each other (jac = 0), keeping the novel/dup split in
    # the assertions exact rather than LSH-probabilistic.
    return f"novel{i} " + " ".join(f"tok{i}x{j}" for j in range(10))


@pytest.fixture()
def doc_landing(spark, tmp_path):
    """Two file drops: corpus copies (re-keyed, guaranteed dups) and novel
    docs that match nothing — not the corpus, not each other."""
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    src = str(tmp_path / "doc-landing")
    copies = docs.filter(F.col("doc_id") % 100 == 7).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"), "text"
    )
    copies.coalesce(1).write.mode("append").parquet(src)
    time.sleep(1.1)
    novel = spark.createDataFrame(
        [(2_000_000 + i, _novel_doc(i)) for i in range(3)],
        "doc_id long, text string",
    )
    novel.coalesce(1).write.mode("append").parquet(src)
    all_docs = copies.unionByName(novel)
    return src, all_docs


def test_streaming_verdicts_match_batch_kernel(spark, doc_landing, tmp_path):
    src, all_docs = doc_landing
    out = str(tmp_path / "verdicts")
    q = (
        read_document_stream(spark, src)
        .writeStream.foreachBatch(make_online_dedup_sink(SF, out))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()

    got = {
        r["doc_id"]: (r["is_duplicate"], r["dup_of"])
        for r in read_verdicts(spark, out).collect()
    }
    # Batch twin of the online pipeline: every doc against corpus + the
    # other docs of the run (the fixture docs are mutually dissimilar, so
    # per-batch grouping cannot change any verdict).
    expect = {
        r["doc_id"]: (r["is_duplicate"], r["dup_of"])
        for r in online_dedup(spark, SF, all_docs, self_dedup=True).collect()
    }
    assert got == expect
    # sanity on content: every corpus copy is flagged against its source,
    # every novel doc is clean
    for doc_id, (dup, dup_of) in got.items():
        if doc_id >= 2_000_000:
            assert not dup and dup_of is None
        else:
            assert dup and dup_of == doc_id - 1_000_000


def test_replayed_batch_is_idempotent(spark, tmp_path):
    out = str(tmp_path / "verdicts")
    sink = make_online_dedup_sink(SF, out)
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    batch = docs.filter(F.col("doc_id") == 11).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"), "text"
    )
    sink(batch, 0)
    n = read_verdicts(spark, out).count()
    verdict0 = read_verdicts(spark, out).collect()
    sink(batch, 0)  # foreachBatch replay after restart: same partition
    assert read_verdicts(spark, out).count() == n
    # the replay saw the same corpus view (its own appended signatures are
    # excluded), so the verdicts — not just the counts — are unchanged
    assert read_verdicts(spark, out).collect() == verdict0
    assert set(os.listdir(out)) >= {"batch_id=0"}
    assert set(os.listdir(f"{out}_sigs")) >= {"batch_id=0"}


def test_same_doc_across_batches_novel_once(spark, tmp_path):
    """A new document streamed in two consecutive batches: the first copy is
    novel (and its signatures join the corpus), the second is a duplicate
    OF THE FIRST — the index grew."""
    out = str(tmp_path / "verdicts")
    sink = make_online_dedup_sink(SF, out)
    text = _novel_doc(0)
    b0 = spark.createDataFrame([(3_000_000, text)], "doc_id long, text string")
    b1 = spark.createDataFrame([(3_000_001, text)], "doc_id long, text string")
    sink(b0, 0)
    sink(b1, 1)
    got = {
        r["doc_id"]: (r["is_duplicate"], r["dup_of"])
        for r in read_verdicts(spark, out).collect()
    }
    assert got[3_000_000] == (False, None)
    assert got[3_000_001] == (True, 3_000_000)


def test_same_doc_twice_in_one_batch_novel_once(spark, tmp_path):
    """Two copies landing in ONE micro-batch: intra-batch self-dedup marks
    exactly the lower-id copy novel."""
    out = str(tmp_path / "verdicts")
    sink = make_online_dedup_sink(SF, out)
    text = _novel_doc(1)
    batch = spark.createDataFrame(
        [(3_000_000, text), (3_000_001, text)], "doc_id long, text string"
    )
    sink(batch, 0)
    got = {
        r["doc_id"]: (r["is_duplicate"], r["dup_of"])
        for r in read_verdicts(spark, out).collect()
    }
    assert got[3_000_000] == (False, None)
    assert got[3_000_001] == (True, 3_000_000)
    # only the surviving copy's signatures were appended to the store
    sigs = spark.read.parquet(f"{out}_sigs")
    assert [r["doc_id"] for r in sigs.select("doc_id").collect()] == [3_000_000]


def test_replay_after_index_growth_is_idempotent(spark, tmp_path):
    """Replaying batch 0 AFTER batch 1 appended signatures must reproduce
    batch 0's original verdicts: the replay's corpus view excludes only its
    own partition, and batch 1's docs are dissimilar so they cannot flip
    batch 0's verdicts. The growth store still holds exactly one partition
    per batch afterwards."""
    out = str(tmp_path / "verdicts")
    sink = make_online_dedup_sink(SF, out)
    b0 = spark.createDataFrame([(3_000_000, _novel_doc(2))], "doc_id long, text string")
    b1 = spark.createDataFrame([(3_000_001, _novel_doc(3))], "doc_id long, text string")
    sink(b0, 0)
    sink(b1, 1)
    before = sorted(
        (r["doc_id"], r["is_duplicate"]) for r in read_verdicts(spark, out).collect()
    )
    sink(b0, 0)  # restart replay
    after = sorted(
        (r["doc_id"], r["is_duplicate"]) for r in read_verdicts(spark, out).collect()
    )
    assert after == before == [(3_000_000, False), (3_000_001, False)]
    assert {d for d in os.listdir(f"{out}_sigs") if d.startswith("batch_id=")} == {
        "batch_id=0",
        "batch_id=1",
    }


# --- streaming decontamination guard (round 5) ------------------------------


@pytest.fixture()
def contam_landing(spark, tmp_path):
    """Two file drops: verbatim copies of benchmark docs (doc_id % 29 == 0
    → guaranteed shared 4-grams) and disjoint-vocabulary novel docs."""
    from denali_spark.operators.text_analysis import BENCH_MOD

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    src = str(tmp_path / "contam-landing")
    copies = docs.filter(F.col("doc_id") % BENCH_MOD == 0).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"), "text"
    )
    copies.coalesce(1).write.mode("append").parquet(src)
    time.sleep(1.1)
    novel = spark.createDataFrame(
        [(2_000_000 + i, _novel_doc(i)) for i in range(3)],
        "doc_id long, text string",
    )
    novel.coalesce(1).write.mode("append").parquet(src)
    return src, copies.unionByName(novel)


def test_streaming_decontaminate_matches_batch_kernel(spark, contam_landing, tmp_path):
    from denali_spark.operators.text_analysis import decontaminate_batch
    from denali_spark.streaming.documents_stream import (
        make_decontaminate_sink,
        read_document_stream,
        read_verdicts,
    )

    src, all_docs = contam_landing
    out = str(tmp_path / "contam-verdicts")
    q = (
        read_document_stream(spark, src)
        .writeStream.foreachBatch(make_decontaminate_sink(SF, out))
        .option("checkpointLocation", str(tmp_path / "contam-ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()

    got = {
        r["doc_id"]: (r["n_grams"], r["n_hits"], r["contaminated"])
        for r in read_verdicts(spark, out).collect()
    }
    # The guard is stateless across batches, so the batch kernel over the
    # union is its exact twin regardless of micro-batch grouping.
    expect = {
        r["doc_id"]: (r["n_grams"], r["n_hits"], r["contaminated"])
        for r in decontaminate_batch(spark, SF, all_docs).collect()
    }
    assert got == expect
    # content sanity: every benchmark copy is contaminated (it shares ALL
    # its grams), every novel doc is clean, and every input doc got a row
    for doc_id, (n_grams, n_hits, contaminated) in got.items():
        if doc_id >= 2_000_000:
            assert not contaminated and n_hits == 0
        else:
            assert contaminated and n_hits == n_grams > 0
    assert set(got) == {r["doc_id"] for r in all_docs.collect()}


def test_streaming_decontaminate_replay_idempotent(spark, contam_landing, tmp_path):
    """Re-running a batch through the sink (at-least-once delivery) leaves
    the verdict store byte-stable: the batch partition is overwritten with
    identical content."""
    from denali_spark.streaming.documents_stream import (
        make_decontaminate_sink,
        read_verdicts,
    )

    src, all_docs = contam_landing
    out = str(tmp_path / "replay-verdicts")
    sink = make_decontaminate_sink(SF, out)
    sink(all_docs, 0)
    first = {tuple(r) for r in read_verdicts(spark, out).collect()}
    sink(all_docs, 0)  # replay
    second = {tuple(r) for r in read_verdicts(spark, out).collect()}
    assert first == second


def test_fold_streamed_signatures_lifecycle(spark, doc_landing, tmp_path):
    """Document twin of the embedding-index fold (shared generational
    kernel): verdicts computed against the folded signature generation
    equal verdicts against base-index ∪ streamed store; a replayed fold
    is a no-op; the streamed store is truncated; a post-fold batch folds
    incrementally into gen-2."""
    from denali_spark.operators.dedup import minhash_signature_index
    from denali_spark.streaming.documents_stream import (
        fold_streamed_signatures,
        read_folded_signatures,
    )

    src, all_docs = doc_landing
    out = str(tmp_path / "verdicts")
    sig_dir = f"{out}_sigs"
    index_root = str(tmp_path / "sig-index")
    q = (
        read_document_stream(spark, src)
        .writeStream.foreachBatch(make_online_dedup_sink(SF, out, sig_dir=sig_dir))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()

    streamed_parts = [
        os.path.join(sig_dir, d)
        for d in sorted(os.listdir(sig_dir))
        if d.startswith("batch_id=")
    ]
    grown = minhash_signature_index(spark, SF).unionByName(
        spark.read.parquet(*streamed_parts)
    )
    grown_ids = sorted(r["doc_id"] for r in grown.select("doc_id").collect())

    # the union-path verdicts must be computed BEFORE the fold truncates
    # the streamed partitions `grown` lazily reads
    probe = spark.createDataFrame(
        [(3_000_000, _novel_doc(0)), (3_000_001, _novel_doc(99))],
        "doc_id long, text string",
    )
    via_union = {
        r["doc_id"]: (r["is_duplicate"], r["dup_of"])
        for r in online_dedup(spark, SF, probe, corpus_sig=grown).collect()
    }

    rep = fold_streamed_signatures(spark, SF, sig_dir, index_root=index_root)
    assert not rep["noop"] and rep["generation"] == 1
    folded = read_folded_signatures(spark, index_root)
    assert sorted(
        r["doc_id"] for r in folded.select("doc_id").collect()
    ) == grown_ids

    # verdict equivalence: a probe batch deduped against the folded
    # generation sees exactly the corpus the union path saw
    via_folded = {
        r["doc_id"]: (r["is_duplicate"], r["dup_of"])
        for r in online_dedup(spark, SF, probe, corpus_sig=folded).collect()
    }
    assert via_folded == via_union
    # the replayed novel doc from the stream IS in the folded corpus now
    assert via_folded[3_000_000][0] is True

    # truncation + replay no-op
    assert not any(
        d.startswith("batch_id=") for d in os.listdir(sig_dir)
    )
    rep2 = fold_streamed_signatures(spark, SF, sig_dir, index_root=index_root)
    assert rep2["noop"] and rep2["generation"] == 1

    # post-fold sink wired to the generation store: the corpus the batch
    # sees MUST include the folded batches even though their streamed
    # partitions are gone — a repeat of a folded novel doc is a duplicate
    sink = make_online_dedup_sink(SF, out, sig_dir=sig_dir, index_root=index_root)
    late = spark.createDataFrame(
        [(4_000_000, _novel_doc(7)), (4_000_001, _novel_doc(1))],
        "doc_id long, text string",
    )
    sink(late, 99)
    late_verdicts = {
        r["doc_id"]: (r["is_duplicate"], r["dup_of"])
        for r in spark.read.parquet(f"{out}/batch_id=99").collect()
    }
    assert late_verdicts[4_000_000] == (False, None)
    assert late_verdicts[4_000_001] == (True, 2_000_001)
    rep3 = fold_streamed_signatures(spark, SF, sig_dir, index_root=index_root)
    assert rep3 == {"generation": 2, "folded_batches": [99], "noop": False}
    gen2_ids = {
        r["doc_id"]
        for r in read_folded_signatures(spark, index_root)
        .select("doc_id").collect()
    }
    assert 4_000_000 in gen2_ids and set(grown_ids) <= gen2_ids


def test_streaming_reservoir_matches_batch_twin(spark, tmp_path):
    """Streaming fixed-K reservoir per stratum: the final state after all
    micro-batches EQUALS (set- and rank-exactly, not error-bounded) the
    batch window rank over the full document set — membership is a pure
    function of doc_id via the salted-md5 priority, so arrival order and
    batch boundaries cannot matter."""
    import time

    from denali_spark.streaming.documents_stream import (
        RESERVOIR_STREAM_K,
        read_document_stream,
        reservoir_sample_batch,
        reservoir_sample_stream,
    )

    src = str(tmp_path / "res-landing")
    # three drops with interleaved, non-contiguous ids (arrival order must
    # not matter) — enough docs that every stratum overflows K
    batches = [
        [(i * 7 + 1, f"doc {i}") for i in range(0, 60)],
        [(i * 7 + 3, f"doc {i}") for i in range(60, 120)],
        [(i * 7 + 5, f"doc {i}") for i in range(120, 180)],
    ]
    for rows in batches:
        spark.createDataFrame(rows, "doc_id long, text string").coalesce(
            1
        ).write.mode("append").parquet(src)
        time.sleep(1.1)
    q = (
        reservoir_sample_stream(read_document_stream(spark, src))
        .writeStream.format("memory")
        .queryName("res_stream")
        .outputMode("update")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    pdf = spark.table("res_stream").toPandas()
    got = {}
    for stratum, grp in pdf.groupby("stratum"):
        last = grp[grp["n_seen"] == grp["n_seen"].max()].sort_values("rk")
        got[int(stratum)] = [int(d) for d in last["doc_id"]]
    all_docs = spark.createDataFrame(
        [r for rows in batches for r in rows], "doc_id long, text string"
    )
    expected = reservoir_sample_batch(spark, all_docs)
    assert got == expected
    for ids in got.values():
        assert len(ids) == RESERVOIR_STREAM_K  # every stratum overflowed K


def test_simhash_guard_stream_flags_dups_and_folds(spark, doc_landing, tmp_path):
    """The online simhash guard (fingerprint twin of the minhash sink):
    corpus copies flag as duplicates of their source at Hamming 0, a
    repeated novel doc is novel exactly once across batches, and after a
    fingerprint fold the guard reads ONE generation with identical
    verdict logic."""
    import time as _time

    from denali_spark.streaming.documents_stream import (
        fold_streamed_fingerprints,
        make_simhash_guard_sink,
        read_folded_fingerprints,
    )

    src, all_docs = doc_landing
    # a third drop repeating one earlier novel doc (new id, same text):
    # must be flagged dup-of the accepted original, not novel again
    _time.sleep(1.1)
    spark.createDataFrame(
        [(3_000_000, _novel_doc(0))], "doc_id long, text string"
    ).coalesce(1).write.mode("append").parquet(src)

    out = str(tmp_path / "sh-verdicts")
    fp_dir = str(tmp_path / "sh-fps")
    root = str(tmp_path / "sh-fold")
    q = (
        read_document_stream(spark, src)
        .writeStream.foreachBatch(
            make_simhash_guard_sink(SF, out, fp_dir=fp_dir, index_root=root)
        )
        .option("checkpointLocation", str(tmp_path / "sh-ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = {
        r["doc_id"]: (r["is_duplicate"], r["dup_of"], r["hamming"])
        for r in read_verdicts(spark, out).collect()
    }
    # corpus copies (re-keyed ids +1_000_000): exact fingerprint match
    copies = [d for d in got if 1_000_000 <= d < 2_000_000]
    assert copies
    for d in copies:
        is_dup, dup_of, ham = got[d]
        # identical text => Hamming 0; dup_of is the LOWEST id among
        # hamming-0 matches (32-bit fingerprints collide across the
        # corpus, so it may be an even-lower exact-fingerprint twin of
        # the source rather than the source itself)
        assert is_dup and ham == 0 and dup_of <= d - 1_000_000
    # the repeated novel doc (identical text to an accepted-or-matched
    # earlier doc) must be a duplicate at Hamming 0
    assert got[3_000_000][0] and got[3_000_000][2] == 0
    assert got[3_000_000][1] <= 2_000_000

    # fold the fingerprint store, then replay-idempotence: a fresh drop of
    # the same repeated doc still flags dup via the FOLDED corpus read
    res = fold_streamed_fingerprints(spark, SF, fp_dir, index_root=root)
    assert res["noop"] is False and res["generation"] == 1
    assert read_folded_fingerprints(spark, root) is not None
    _time.sleep(1.1)
    spark.createDataFrame(
        [(3_000_001, _novel_doc(1))], "doc_id long, text string"
    ).coalesce(1).write.mode("append").parquet(src)
    q2 = (
        read_document_stream(spark, src)
        .writeStream.foreachBatch(
            make_simhash_guard_sink(SF, out, fp_dir=fp_dir, index_root=root)
        )
        .option("checkpointLocation", str(tmp_path / "sh-ckpt"))
        .start()
    )
    q2.processAllAvailable()
    q2.stop()
    got2 = {
        r["doc_id"]: (r["is_duplicate"], r["dup_of"])
        for r in read_verdicts(spark, out).collect()
    }
    # identical text to 2_000_001: duplicate either of it (if it was
    # accepted into the fp store, now folded) or of whatever hamming-0
    # corpus fingerprint 2_000_001 itself matched — dup either way
    assert got2[3_000_001][0] and got2[3_000_001][1] <= 2_000_001

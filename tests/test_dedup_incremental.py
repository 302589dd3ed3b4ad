"""Incremental dedup against the materialized signature index: a new shard
finds its near-dups in the existing corpus without recomputing corpus
signatures — the continuously-ingesting-pipeline shape the index exists for.
Checked against a DuckDB oracle computing exact Jaccard between the shard
and the corpus with the same shingle pipeline."""

from __future__ import annotations

from pyspark.sql import functions as F

from denali_spark.operators.dedup import (
    SQL_H60,
    SQL_SHINGLES,
    SQL_TOKENS,
    dedup_incremental_pairs,
)

SF = "/root/testdata/sf0.001"


def test_incremental_pairs_match_oracle(spark, duck):
    # Shard = copies of real corpus docs (guaranteed near-dups) + one novel
    # doc that matches nothing.
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    shard = docs.filter(F.col("doc_id") % 100 == 3).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"), "text"
    )
    novel = spark.createDataFrame(
        [(2_000_000, "zyx wvu tsr qpo nml kji hgf edc ba z " * 3)],
        "doc_id long, text string",
    )
    got = dedup_incremental_pairs(spark, SF, shard.unionByName(novel))
    rows = {(r.new_doc_id, r.corpus_doc_id) for r in got.collect()}

    oracle_sql = f"""
    WITH new_docs AS (
      SELECT doc_id + 1000000 AS doc_id, text FROM documents WHERE doc_id % 100 = 3
    ),
    nt AS (SELECT doc_id, {SQL_TOKENS.format(c='text')} AS t FROM new_docs),
    ns AS (SELECT doc_id, list_distinct(list_transform({SQL_SHINGLES.format(t='t')}, s -> {SQL_H60.format(c='s')})) AS hs
           FROM nt WHERE len(t) >= 3),
    ct AS (SELECT doc_id, {SQL_TOKENS.format(c='text')} AS t FROM documents),
    cs AS (SELECT doc_id, list_distinct(list_transform({SQL_SHINGLES.format(t='t')}, s -> {SQL_H60.format(c='s')})) AS hs
           FROM ct WHERE len(t) >= 3)
    SELECT n.doc_id AS new_doc_id, c.doc_id AS corpus_doc_id
    FROM ns n JOIN cs c
      ON len(list_intersect(n.hs, c.hs)) * 1.0 / len(list_distinct(n.hs || c.hs)) >= 0.3
    """
    expect = {tuple(r) for r in duck.execute(oracle_sql).fetchall()}
    # LSH banding may miss borderline pairs the exact oracle finds (that is
    # the recall trade), but every EXACT COPY must be found and nothing
    # reported may be a false positive (jac is exact after candidates).
    assert rows <= expect
    assert {p for p in expect if p[0] - 1_000_000 == p[1]} <= rows
    # the novel doc matches nothing
    assert not any(n == 2_000_000 for n, _ in rows)


def test_incremental_jaccard_values_are_exact(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    shard = docs.filter(F.col("doc_id") == 7).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"), "text"
    )
    got = dedup_incremental_pairs(spark, SF, shard).collect()
    self_pair = [r for r in got if r.corpus_doc_id == 7]
    assert len(self_pair) == 1 and self_pair[0].jac == 1.0


def test_ngram_max_df_caps_hot_shingle_fanout(spark):
    """One boilerplate shingle shared by every doc must not explode the
    inverted-index self-join: with max_df the hot shingle is dropped before
    candidate generation, leaving only genuinely-overlapping pairs; the
    true near-dup pair survives through its other shared shingles."""
    from denali_spark.operators.dedup import ngram_candidate_pairs, shingles_col, tokens_col

    boiler = "all rights reserved worldwide"
    rows = [(i, f"{boiler} unique{i}a unique{i}b unique{i}c unique{i}d") for i in range(8)]
    # docs 100/101: true near-dups (share all content shingles)
    rows += [
        (100, f"{boiler} shared one two three four five six"),
        (101, f"{boiler} shared one two three four five six seven"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    sh = docs.select("doc_id", shingles_col(tokens_col()).alias("s")).filter(
        F.size("s") > 0
    )
    uncapped = {(r.i, r.j) for r in ngram_candidate_pairs(sh).collect()}
    capped = {(r.i, r.j) for r in ngram_candidate_pairs(sh, max_df=5).collect()}
    # every doc pair met through the boilerplate shingles → full cross
    assert len(uncapped) == 45  # C(10,2)
    assert capped == {(100, 101)}  # only the real overlap remains


def test_ngram_max_df_off_is_unchanged(spark, duck):
    """Cap off must be byte-identical to the registered driver query (the
    oracle replays the exact uncapped pipeline)."""
    from denali_spark.operators.dedup import dedup_ngram_jaccard_pairs

    base = dedup_ngram_jaccard_pairs(spark, SF)
    relaxed = dedup_ngram_jaccard_pairs(spark, SF, max_df=None)
    a = sorted((r.i, r.j, r.inter, r.jac) for r in base.collect())
    b = sorted((r.i, r.j, r.inter, r.jac) for r in relaxed.collect())
    assert a == b


def test_incremental_cc_labels_match_from_scratch(spark, tmp_path):
    """Star-contraction incremental CC must reach the EXACT fixpoint a
    from-scratch clustering of the combined corpus reaches: labels are
    global min doc-ids, so the contracted base (doc -> base label star
    edges) plus the shard's cross/intra pairs propagate to the same
    component per document — the corpus is never re-clustered."""
    import os
    import shutil

    import pyarrow.parquet as pq

    from denali_spark.operators.dedup import (
        cc_label_index,
        incremental_cc_labels,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    shard = docs.filter(F.col("doc_id") % 100 == 3).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"), "text"
    )

    inc = {
        r["doc_id"]: r["component"]
        for r in incremental_cc_labels(spark, SF, shard).collect()
    }

    # From-scratch twin: materialize corpus ∪ shard as its own corpus dir
    # and cluster it whole.
    d = str(tmp_path / "combined")
    os.makedirs(d)
    t = pq.read_table(f"{SF}/documents.parquet")
    combined = docs.select(*t.schema.names).unionByName(
        docs.filter(F.col("doc_id") % 100 == 3).select(
            (F.col("doc_id") + 1_000_000).alias("doc_id"),
            *[c for c in t.schema.names if c != "doc_id"],
        )
    )
    combined.toPandas().to_parquet(os.path.join(d, "documents.parquet"))
    scratch = {
        r["doc_id"]: r["component"]
        for r in cc_label_index(spark, d).collect()
    }

    assert set(inc) == set(scratch)
    assert inc == scratch
    # sanity: the shard really merged into corpus clusters (re-keyed
    # copies adopt their original's label, which is < 1_000_000)
    merged = [k for k, v in inc.items() if k >= 1_000_000 and v < 1_000_000]
    assert merged

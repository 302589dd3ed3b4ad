"""Function-library tests: Column helpers agree with their oracle-paired
operator forms, the SQL registrations agree with the Column forms, and
everything stays JVM-side (no Python eval nodes in any plan)."""

from __future__ import annotations

import math

import pytest

from pyspark.sql import functions as F

from denali_spark import functions as dfn
from denali_spark.engine.tables import load_table
from denali_spark.plans import assert_jvm_only
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    names = dfn.register_sql_functions(spark)
    assert "denali_cosine" in names


def _docs(spark):
    return load_table(spark, SF_SMOKE, "documents").select("doc_id", "text")


def test_tokens_and_count_sql_matches_column(spark):
    docs = _docs(spark)
    col_side = docs.select("doc_id", dfn.token_count("text").alias("n"))
    docs.createOrReplaceTempView("fn_docs")
    sql_side = spark.sql(
        "SELECT doc_id, denali_token_count(text) AS n FROM fn_docs"
    )
    diff = col_side.join(sql_side, "doc_id").filter(
        col_side.n != sql_side.n
    )
    assert col_side.exceptAll(sql_side).count() == 0
    assert diff.count() == 0


def test_minhash_signature_matches_operator_sigs(spark):
    """functions.minhash_signature == the dedup operator's 16 sig columns."""
    from denali_spark.operators.dedup import h60, minhash_sigs, shingles_col, tokens_col

    docs = _docs(spark).limit(50)
    via_fn = docs.select("doc_id", dfn.minhash_signature("text").alias("sig"))
    hashes = F.transform(shingles_col(tokens_col("text")), lambda s: h60(s))
    via_op = docs.select(
        "doc_id", F.array(*minhash_sigs(hashes)).alias("sig")
    )
    assert via_fn.exceptAll(via_op).count() == 0


def test_cosine_fn_and_sql_agree(spark):
    emb = load_table(spark, SF_SMOKE, "embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("e")
    ).limit(20)
    pairs = emb.alias("a").crossJoin(emb.alias("b")).filter("a.vec_id < b.vec_id")
    col_side = pairs.select(
        dfn.cosine_similarity(F.col("a.e"), F.col("b.e")).alias("c")
    ).collect()
    sql_side = pairs.select(F.expr("denali_cosine(a.e, b.e)").alias("c")).collect()
    for x, y in zip(col_side, sql_side):
        assert math.isclose(x.c, y.c, rel_tol=1e-12)


def test_quality_and_langid_structs(spark):
    row = (
        spark.createDataFrame(
            [("The cat sat on the mat, and it is that!",)], "text string"
        )
        .select(
            dfn.quality_ratios("text").alias("q"),
            dfn.lang_id_scores("text").alias("l"),
            dfn.rolling_fingerprint("text").alias("fp"),
        )
        .collect()[0]
    )
    assert 0 < row.q.punct_ratio < 0.2
    assert row.l.pred_lang == "en" and row.l.evidence >= 4
    assert len(row.fp) == 32


def test_ngrams_generalizes_shingles(spark):
    df = spark.createDataFrame([("a b c d",)], "text string").select(
        dfn.ngrams(dfn.tokens("text"), 2).alias("g2"),
        dfn.shingles(dfn.tokens("text")).alias("g3"),
    )
    row = df.collect()[0]
    assert row.g2 == ["a b", "b c", "c d"]
    assert row.g3 == ["a b c", "b c d"]


def test_simhash_stability(spark):
    """simhash of near-identical docs differs in few bits; disjoint docs in
    many — the property the hamming-distance dedup relies on."""
    df = spark.createDataFrame(
        [
            ("a", "the quick brown fox jumps over the lazy dog"),
            ("b", "the quick brown fox jumps over the lazy cat"),
            ("c", "entirely different words about spark engines here"),
        ],
        "k string, text string",
    ).select("k", dfn.simhash64("text").alias("h"))
    h = {r.k: r.h for r in df.collect()}
    ab = bin(h["a"] ^ h["b"]).count("1")
    ac = bin(h["a"] ^ h["c"]).count("1")
    assert ab < ac


def test_function_library_stays_jvm_side(spark):
    docs = _docs(spark).select(
        dfn.token_count("text"),
        dfn.minhash_signature("text"),
        dfn.simhash64("text"),
        dfn.rolling_fingerprint("text"),
        dfn.quality_ratios("text"),
        dfn.lang_id_scores("text"),
    )
    assert_jvm_only(docs)
    sql_df = spark.sql("SELECT denali_minhash_text(text) FROM fn_docs")
    assert_jvm_only(sql_df)


def test_sql_minhash_pipeline_matches_fn(spark):
    docs = _docs(spark).limit(30)
    docs.createOrReplaceTempView("fn_docs30")
    sql_side = spark.sql(
        "SELECT doc_id, denali_minhash_text(text) AS sig FROM fn_docs30"
    )
    fn_side = docs.select("doc_id", dfn.minhash_signature("text").alias("sig"))
    assert sql_side.exceptAll(fn_side).count() == 0


def test_ivf_train_assign(spark):
    from denali_spark.operators.similarity import _vecs, cosine, ivf_assign, ivf_train

    v = _vecs(spark, SF_SMOKE)
    cent = ivf_train(v, k=8, iters=3)
    assert len(cent) == 8 and len(cent[0]) == 64
    assigned = ivf_assign(v, cent)
    rows = assigned.select("vec_id", "e", "cid").collect()
    assert {r.cid for r in rows} <= set(range(8))
    # every vector landed on its true nearest centroid (cross-check in numpy)
    import numpy as np

    C = np.array(cent)
    Cn = C / np.linalg.norm(C, axis=1, keepdims=True)
    for r in rows[:20]:
        x = np.array(r.e)
        want = int((Cn @ (x / np.linalg.norm(x))).argmax())
        assert r.cid == want
    # assignment is JVM-side codegen — no Python in the scale path
    assert_jvm_only(ivf_assign(v, cent))


def test_ppm_parser_is_a_real_parser():
    """The PPM kernel genuinely parses bytes: valid images (incl. comment
    lines) decode; malformed magic/length fail loudly."""
    import pytest as _pytest

    from denali_spark.operators.multimodal import _parse_ppm

    pix = bytes(range(36))
    w, h, maxval, got = _parse_ppm(b"P6\n4 3\n255\n" + pix)
    assert (w, h, maxval, got) == (4, 3, 255, pix)
    # comment in header
    w, h, maxval, got = _parse_ppm(b"P6\n# a comment\n4 3\n255\n" + pix)
    assert (w, h) == (4, 3)
    with _pytest.raises(ValueError, match="not a P6"):
        _parse_ppm(b"P5\n4 3\n255\n" + pix)
    with _pytest.raises(ValueError, match="expected"):
        _parse_ppm(b"P6\n4 3\n255\n" + pix[:-1])


def test_hll_mergeable_rollup_estimates(spark):
    """Sketch estimates must sit within HLL error of the exact distinct
    counts, per day AND for the merged all-days union."""
    from pyspark.sql import functions as F

    from denali_spark.engine.tables import load_table
    from denali_spark.operators.aggregates import agg_hll_mergeable_rollup
    from tests.conftest import SF_SMOKE

    got = {
        r["day"]: (r["n_users"], r["within_5pct"])
        for r in agg_hll_mergeable_rollup(spark, SF_SMOKE).collect()
    }
    events = load_table(spark, SF_SMOKE, "events")
    exact_daily = {
        r["day"]: r["n"]
        for r in events.groupBy(
            F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day")
        ).agg(F.countDistinct("user_id").alias("n")).collect()
    }
    exact_total = events.select("user_id").distinct().count()
    assert set(got) == set(exact_daily) | {"ALL"}
    for day, exact in exact_daily.items():
        n, ok = got[day]
        assert n == exact and ok, (day, got[day], exact)
    n_all, ok_all = got["ALL"]
    assert n_all == exact_total and ok_all
    # mergeability: the ALL row reflects the DISTINCT union, not the sum
    # of dailies (users active on many days counted once)
    assert n_all < sum(exact_daily.values())

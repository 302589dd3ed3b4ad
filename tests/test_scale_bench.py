"""Scale-stress machinery tests: the derived-dataset generator preserves
semantics, and the skewed join actually exercises AQE's skew-join split."""

from __future__ import annotations

from pyspark.sql import functions as F

from denali_spark.engine.scale_data import ensure_scaled
from tests.conftest import SF_SMOKE, SF_T2


def test_ensure_scaled_replicates_facts_and_keeps_dims(spark, tmp_path):
    out = str(tmp_path / "sf2x")
    ensure_scaled(spark, SF_SMOKE, out, factor=2)
    src_li = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
    got_li = spark.read.parquet(f"{out}/lineitem.parquet")
    assert got_li.count() == 2 * src_li.count()
    # key disjointness: every copy owns a distinct key range
    assert (
        got_li.select("l_orderkey").distinct().count()
        == 2 * src_li.select("l_orderkey").distinct().count()
    )
    # dims untouched
    assert (
        spark.read.parquet(f"{out}/nation.parquet").count()
        == spark.read.parquet(f"{SF_SMOKE}/nation.parquet").count()
    )
    # non-key columns replicated faithfully (revenue doubles exactly)
    dec = F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
    assert (
        got_li.agg(dec).first()[0] == 2 * src_li.agg(dec).first()[0]
    )
    # idempotent: second call is a no-op (the _DONE marker short-circuits)
    ensure_scaled(spark, SF_SMOKE, out, factor=2)
    assert got_li.count() == 2 * src_li.count()


def test_skew_join_correct_and_aqe_splits_hot_partition(spark):
    """With the skew thresholds scaled down to smoke-data sizes, AQE must
    detect the hot partition (25% of the fact on one key) and split it —
    the `skew=true` marker in the final plan is the proof the mechanism
    engages; at real scale the default 256 MB threshold plays the same
    role."""
    from bench import skew_join_hot_key
    from denali_spark.plans import plan_text

    overrides = {
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "20KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2.0",
    }
    saved = {k: spark.conf.get(k) for k in overrides}
    try:
        for k, v in overrides.items():
            spark.conf.set(k, v)
        df = skew_join_hot_key(spark, SF_T2)
        row = df.collect()[0]
        li = spark.read.parquet(f"{SF_T2}/lineitem.parquet")
        # every fact row keeps exactly one dim match (hot key included)
        assert row["n"] == li.count()
        text = plan_text(df, "formatted")
        assert "SortMergeJoin" in text
        assert "skew=true" in text
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)

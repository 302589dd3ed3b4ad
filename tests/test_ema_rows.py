"""Per-row EMA (parallel-prefix formulation) against a driver-side
sequential reference: same ordering, same recurrence, tolerance for the
float re-association the affine-composition scan introduces."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from denali_spark.engine.tables import load_table
from denali_spark.operators.timeseries import EMA_ALPHA, ts_ema_current, ts_ema_rows

SF = "/root/testdata/sf0.001"


def _reference(events_pdf):
    out = {}
    for user_id, pdf in events_pdf.groupby("user_id"):
        pdf = pdf.sort_values(["ts", "event_id"], ignore_index=True)
        ema = None
        for _, row in pdf.iterrows():
            v = float(row["value"])
            ema = v if ema is None else EMA_ALPHA * v + (1 - EMA_ALPHA) * ema
            out[(user_id, int(row["event_id"]))] = ema
    return out


def test_per_row_ema_matches_sequential_reference(spark):
    got = {
        (r["user_id"], r["event_id"]): r["ema"]
        for r in ts_ema_rows(spark, SF).collect()
    }
    events = load_table(spark, SF, "events").select(
        "user_id", "event_id", "ts", "value"
    ).toPandas()
    expect = _reference(events)
    assert set(got) == set(expect)
    worst = max(
        abs(got[k] - expect[k]) / max(abs(expect[k]), 1e-12) for k in expect
    )
    assert worst < 1e-9, f"parallel-prefix drifted: rel err {worst:.2e}"


def test_per_row_final_agrees_with_fold_operator(spark):
    """The last per-row ema of each user must equal ts_ema_current's fold
    (same tolerance)."""
    rows = ts_ema_rows(spark, SF)
    w_last = rows.groupBy("user_id").agg(
        F.max(F.struct("rn", "ema")).alias("m")
    ).select("user_id", F.col("m.ema").alias("ema_rows"))
    fold = ts_ema_current(spark, SF).select("user_id", F.col("ema").alias("ema_fold"))
    j = w_last.join(fold, "user_id").collect()
    assert j
    for r in j:
        assert r["ema_rows"] == pytest.approx(r["ema_fold"], rel=1e-9)


def test_per_row_ema_multi_chunk_composition(spark, monkeypatch):
    """At smoke scale every user fits one chunk, so shrink the chunk size to
    force the affine-composition path (s_in != None for chunks > 0) — the
    part of the scan that actually matters at scale."""
    import denali_spark.operators.timeseries as T

    monkeypatch.setattr(T, "EMA_CHUNK", 8)
    got = {
        (r["user_id"], r["event_id"]): r["ema"]
        for r in ts_ema_rows(spark, SF).collect()
    }
    events = load_table(spark, SF, "events").select(
        "user_id", "event_id", "ts", "value"
    ).toPandas()
    expect = _reference(events)
    assert set(got) == set(expect)
    # ensure the composed path actually ran: at least one user has > 8 rows
    counts = events.groupby("user_id").size()
    assert (counts > 8).any(), "fixture too small to exercise multi-chunk"
    worst = max(abs(got[k] - expect[k]) / max(abs(expect[k]), 1e-12) for k in expect)
    assert worst < 1e-9, f"multi-chunk composition drifted: rel err {worst:.2e}"

"""Structured Streaming operators over the events stream.

These are the streaming twins of denali_spark.operators.timeseries (same
semantics, verified against the batch/oracle versions in tests): file-source
micro-batches → event-time watermark → windowed aggregation / stateful
sessionization → sink. The catalog sink commits one Iceberg snapshot per
micro-batch via foreachBatch — the streaming-append pattern the reference
enables for its clients (SURVEY §2.G "Streaming" row).

Scale notes: windowed aggregations are keyed by (window, …) so state is
bounded by watermark retention, not stream length; sessionization keeps one
small state row per active user and emits+evicts on inactivity timeout.
Both survive arbitrary stream volume given a sane watermark.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

EVENT_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)


def read_event_stream(spark: SparkSession, source_dir: str) -> DataFrame:
    """File-source stream: each parquet file landing in source_dir becomes a
    micro-batch (the standard landing-zone ingestion shape)."""
    return (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(source_dir)
    )


def windowed_counts(
    stream: DataFrame, window: str = "1 hour", watermark: str = "30 minutes"
) -> DataFrame:
    """Tumbling event-time windows with late-data watermark (streaming twin
    of ts_hourly_rollup)."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("win"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.approx_count_distinct("user_id").alias("approx_users"),
            F.sum(F.col("value").cast("decimal(12,2)")).cast("double").alias("total_value"),
        )
        .select(
            F.date_format("win.start", "yyyy-MM-dd HH:mm").alias("window_start"),
            "n_events",
            "approx_users",
            "total_value",
        )
    )


def ohlc_stream(
    stream: DataFrame, window: str = "1 hour", watermark: str = "30 minutes"
) -> DataFrame:
    """Streaming OHLC bars (twin of ``ts_ohlc_bars``): per event-time window
    and event_type, open/high/low/close/count via the same struct-min/max
    trick — a plain watermarked windowed aggregation, fully incremental
    (struct min/max merge associatively in state), no custom operator
    needed. Late data beyond the watermark is dropped like every windowed
    agg here."""
    okey = F.struct(
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
        F.col("event_id").alias("eid"),
        F.col("value").alias("v"),
    )
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("win"), "event_type")
        .agg(
            F.min(okey).getField("v").alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max(okey).getField("v").alias("close"),
            F.count(F.lit(1)).alias("n"),
        )
        .select(
            F.date_format("win.start", "yyyy-MM-dd HH:mm").alias("window_start"),
            "event_type",
            "open",
            "high",
            "low",
            "close",
            "n",
        )
    )


# --- custom stateful operator: per-user running totals --------------------

_STATE_SCHEMA = StructType(
    [
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
        StructField("last_ts_us", LongType()),
    ]
)

_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
        StructField("last_ts_us", LongType()),
    ]
)


def _update_user_totals(key, pdfs: Iterator[pd.DataFrame], state) -> Iterator[pd.DataFrame]:
    """applyInPandasWithState kernel: fold each micro-batch's rows for this
    user into persistent state, emit the updated running totals."""
    (user_id,) = key
    if state.exists:
        n, total, last_us = state.get
    else:
        n, total, last_us = 0, 0.0, 0
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
        if len(pdf):
            last_us = max(last_us, int(pdf["ts"].astype("int64").max() // 1000))
    state.update((n, float(total), int(last_us)))
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "n_events": [n],
            "total_value": [float(total)],
            "last_ts_us": [int(last_us)],
        }
    )


def user_running_totals(stream: DataFrame) -> DataFrame:
    """Arbitrary stateful processing (applyInPandasWithState): one compact
    state row per user, updated per micro-batch — the custom-stateful-
    operator escape hatch for semantics windows can't express."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    return stream.groupBy("user_id").applyInPandasWithState(
        _update_user_totals,
        outputStructType=_OUTPUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def sessionize_stream(
    stream: DataFrame, gap: str = "30 minutes", watermark: str = "30 minutes"
) -> DataFrame:
    """Streaming gap-sessionization via session_window (event-time sessions
    close after `gap` inactivity; watermark bounds state)."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy("user_id", F.session_window("ts", gap).alias("sw"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(12,2)")).cast("double").alias("total_value"),
        )
        .select(
            "user_id",
            F.unix_micros("sw.start").alias("session_start_us"),
            F.unix_micros("sw.end").alias("session_end_us"),
            "n_events",
            "total_value",
        )
    )


def dedup_stream(
    stream: DataFrame, keys: list[str], watermark: str = "30 minutes"
) -> DataFrame:
    """Streaming exact dedup: drop repeats of `keys` within the watermark
    horizon (dropDuplicatesWithinWatermark — state holds one row per key
    and is EVICTED once the key ages past the watermark, so state is
    bounded by the horizon's key cardinality, not stream length). This is
    the ingestion-side twin of dedup_exact_keep_first: at-least-once
    sources (Kafka redeliveries, landing-zone re-drops) are cleaned before
    rows ever reach the table."""
    return stream.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(keys)


def _latest_committed_batch(catalog_io, namespace, name, checkpoint_dir) -> int:
    """Highest micro-batch id already committed for this checkpoint, read
    from snapshot summaries (-1 if none). Driver-side metadata scan —
    O(snapshots), no data touched."""
    if not catalog_io.client.table_exists(namespace, name):
        return -1
    md = catalog_io.client.load_table(namespace, name)["metadata"]
    best = -1
    for s in md.get("snapshots", []):
        sm = s.get("summary", {})
        if sm.get("streaming-checkpoint") == checkpoint_dir:
            try:
                best = max(best, int(sm.get("streaming-batch-id", -1)))
            except (TypeError, ValueError):
                pass
    return best


def make_append_sink(catalog_io, namespace: list[str], name: str, checkpoint_dir: str):
    """Build the foreachBatch append sink (exposed for replay tests)."""

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        if _latest_committed_batch(catalog_io, namespace, name, checkpoint_dir) >= batch_id:
            return  # replayed batch — already committed before the restart
        catalog_io.write_table(
            batch_df, namespace, name, mode="append",
            summary_extra={"streaming-checkpoint": checkpoint_dir,
                           "streaming-batch-id": str(batch_id)},
        )

    return _sink


def stream_to_catalog(
    stream: DataFrame,
    catalog_io,
    namespace: list[str],
    name: str,
    checkpoint_dir: str,
):
    """Streaming append into a catalog table: every micro-batch becomes one
    optimistic snapshot commit (foreachBatch → SparkCatalogIO.write_table).

    Exactly-once: foreachBatch is at-least-once — after a failure/restart
    the checkpoint replays the last unacknowledged batch — so each commit
    stamps (checkpoint, batch-id) into its snapshot summary (the same
    idempotence scheme Iceberg's Spark streaming sink uses) and a replayed
    batch whose id was already committed is skipped instead of appended
    twice. CAS retries make each individual commit atomic; the batch-id
    stamp makes replays idempotent."""
    return (
        stream.writeStream.foreachBatch(
            make_append_sink(catalog_io, namespace, name, checkpoint_dir)
        )
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .start()
    )


def stream_cdc_apply(
    stream: DataFrame,
    catalog_io,
    namespace: list[str],
    name: str,
    keys: list[str],
    checkpoint_dir: str,
    op_col: str = "op",
):
    """CDC changelog apply: each micro-batch carries rows tagged 'u'
    (upsert) or 'd' (delete) in `op_col`, applied to a catalog table as
    merge-on-read equality deletes + an append — the streaming upsert
    pattern (Iceberg's write.upsert.enabled analog).

    Why this shape at 100 TB: a batch's commit cost is O(|batch|) — the
    equality-delete file holds only the batch's keys and the append only
    its rows; NO table data is read or rewritten on the hot path. Readers
    anti-join deletes out (sequence-ordered, so re-inserted keys survive);
    `rewrite_deletes` amortizes them away offline. A copy-on-write MERGE
    per micro-batch would rewrite key-overlapping files every few seconds
    and collapse under churn. Expects ≤1 row per key per batch (standard
    compacted-changelog contract)."""
    return (
        stream.writeStream.foreachBatch(
            make_cdc_sink(catalog_io, namespace, name, keys, checkpoint_dir, op_col)
        )
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .start()
    )


def make_cdc_sink(
    catalog_io,
    namespace: list[str],
    name: str,
    keys: list[str],
    checkpoint_dir: str,
    op_col: str = "op",
):
    """Build the foreachBatch CDC-apply sink (exposed for replay tests)."""
    from denali_spark.sources.mor import equality_delete

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        # Replay guard (same scheme as stream_to_catalog): the batch's LAST
        # commit carries the (checkpoint, batch-id) stamp, so a replay after
        # a mid-batch crash re-runs only the not-yet-stamped steps — the
        # delete re-run is idempotent (same keys, rows already gone) and the
        # append happens exactly once.
        if _latest_committed_batch(catalog_io, namespace, name, checkpoint_dir) >= batch_id:
            return
        stamp = {"streaming-checkpoint": checkpoint_dir,
                 "streaming-batch-id": str(batch_id)}
        upserts = batch_df.filter(F.col(op_col) != "d").drop(op_col)
        has_upserts = not upserts.isEmpty()
        # one equality-delete covers both tombstones and replaced keys
        touched = batch_df.select(*keys)
        if catalog_io.client.table_exists(namespace, name):
            equality_delete(
                catalog_io, namespace, name, touched, on=keys,
                summary_extra=None if has_upserts else stamp,
            )
        if has_upserts:
            catalog_io.write_table(
                upserts, namespace, name, mode="append", summary_extra=stamp
            )

    return _sink


# --- streaming anomaly detection (stateful trailing-window z-score) -------

_ANOM_OUT_SCHEMA = (
    "event_id long, event_type string, value double, trail_n long, "
    "z double, is_anomaly boolean"
)
# Trailing-window contents survive between micro-batches as two parallel
# arrays (event-time micros, exact integer cents).
_ANOM_STATE_SCHEMA = "us array<long>, cents array<long>"


def _cents(v: float) -> int:
    """Exact replica of Spark's CAST(double AS DECIMAL(12,2)): expand the
    binary double exactly, then HALF_UP to 2 places."""
    from decimal import ROUND_HALF_UP, Decimal

    return int(Decimal(v).quantize(Decimal("0.01"), rounding=ROUND_HALF_UP) * 100)


def _update_anomaly(key, pdfs: "Iterator[pd.DataFrame]", state) -> "Iterator[pd.DataFrame]":
    """Stateful z-score kernel for one event_type: maintain the trailing 24h
    of (us, cents) across micro-batches; score each event against the
    window EXCLUDING same-timestamp peers (the batch range frame's
    [us-24h, us-1]), then admit it. Events inside a batch are processed in
    (us, event_id) order, so intra-batch trailing context is exact too —
    and a same-timestamp group split ACROSS batches still scores as if it
    arrived together, because previous-batch same-ts entries (at the tail
    of the sorted state) are excluded from the frame by the bisect below.

    Float determinism vs the batch twin: sums are exact integer cents; the
    double versions are produced by ONE correctly-rounded conversion of the
    exact rational (Fraction -> float, matching CAST(DECIMAL AS DOUBLE)),
    then the identical mean/var/z expression tree."""
    from bisect import bisect_left
    from fractions import Fraction

    from denali_spark.operators.timeseries import (
        ANOMALY_MIN_N,
        ANOMALY_TRAIL_US,
        ANOMALY_Z,
    )

    (event_type,) = key
    if state.exists:
        win_us, win_cents = list(state.get[0]), list(state.get[1])
    else:
        win_us, win_cents = [], []

    rows = pd.concat(list(pdfs), ignore_index=True)
    rows["us"] = rows["ts"].astype("int64") // 1000
    rows = rows.sort_values(["us", "event_id"], ignore_index=True)

    out = {k: [] for k in ("event_id", "event_type", "value", "trail_n", "z", "is_anomaly")}
    i, n_rows = 0, len(rows)
    while i < n_rows:
        us = int(rows["us"][i])
        # evict entries older than the frame start; everything remaining is
        # inside [us - trail, us - 1] because insertions happen post-scoring
        lo = us - ANOMALY_TRAIL_US
        k = 0
        while k < len(win_us) and win_us[k] < lo:
            k += 1
        if k:
            win_us, win_cents = win_us[k:], win_cents[k:]
        # score every row sharing this timestamp against the same window,
        # EXCLUDING same-timestamp entries a PREVIOUS batch admitted (the
        # batch frame [us-24h, us-1] never sees same-ts peers, so neither
        # may we when a same-ts group straddles a micro-batch boundary;
        # sorted state puts those entries at the tail)
        j = i
        group_cents = []
        n = bisect_left(win_us, us)
        frame = win_cents[:n]
        s1 = float(Fraction(sum(frame), 100)) if n else 0.0
        s2 = float(Fraction(sum(c * c for c in frame), 10_000)) if n else 0.0
        while j < n_rows and int(rows["us"][j]) == us:
            value = float(rows["value"][j])
            z = None
            if n >= ANOMALY_MIN_N:
                mean = s1 / n
                var = s2 / n - mean * mean
                if var > 0:
                    z = (value - mean) / (var ** 0.5)
            out["event_id"].append(int(rows["event_id"][j]))
            out["event_type"].append(event_type)
            out["value"].append(value)
            out["trail_n"].append(n)
            out["z"].append(z)
            out["is_anomaly"].append(bool(z is not None and abs(z) > ANOMALY_Z))
            group_cents.append(_cents(value))
            j += 1
        win_us.extend([us] * len(group_cents))
        win_cents.extend(group_cents)
        i = j

    state.update((win_us, win_cents))
    yield pd.DataFrame(out)


def anomaly_stream(stream: DataFrame) -> DataFrame:
    """Streaming twin of ``ts_anomaly_zscore``: per event_type, z-score each
    event against the trailing 24h via applyInPandasWithState — the custom
    stateful operator a metrics pipeline runs at ingest. With micro-batches
    arriving in event-time order (the landing-zone shape), verdicts equal
    the batch query's bit-for-bit. State is bounded by one (long, long)
    pair per event in the trailing window, evicted as time advances."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    return stream.groupBy("event_type").applyInPandasWithState(
        _update_anomaly,
        outputStructType=_ANOM_OUT_SCHEMA,
        stateStructType=_ANOM_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# --- stream-stream interval join: trigger → outcome attribution -----------


def attribution_join_stream(
    stream: DataFrame,
    trigger_type: str = "click",
    outcome_type: str = "purchase",
    within: str = "1 hour",
    watermark: str = "30 minutes",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream interval join (click→purchase attribution): every
    outcome event pairs with the same user's trigger events at most
    `within` earlier. This is Spark's watermarked stream-stream join —
    both sides carry an event-time watermark and the join condition bounds
    outcome_ts to [trigger_ts, trigger_ts + within], which is exactly what
    lets the state store evict a buffered trigger once the watermark passes
    trigger_ts + within: state is bounded by the interval, not stream
    length, so this runs forever at any volume. `how="leftOuter"` emits
    unconverted triggers with null outcome columns once they can no longer
    match (same eviction bound). Batch twin: the identical join on the
    static relation — `tests/test_streaming.py` checks pair-for-pair
    equality."""
    if how not in ("inner", "leftOuter"):
        raise ValueError(f"unsupported join type {how!r}")
    trig = (
        stream.where(F.col("event_type") == trigger_type)
        .select(
            F.col("user_id").alias("t_user"),
            F.col("event_id").alias("trigger_event_id"),
            F.col("ts").alias("trigger_ts"),
        )
        .withWatermark("trigger_ts", watermark)
    )
    out = (
        stream.where(F.col("event_type") == outcome_type)
        .select(
            F.col("user_id").alias("o_user"),
            F.col("event_id").alias("outcome_event_id"),
            F.col("ts").alias("outcome_ts"),
            F.col("value").alias("outcome_value"),
        )
        .withWatermark("outcome_ts", watermark)
    )
    joined = trig.join(
        out,
        F.expr(
            f"t_user = o_user AND outcome_ts >= trigger_ts "
            f"AND outcome_ts <= trigger_ts + interval {within}"
        ),
        how,
    )
    return joined.select(
        F.col("t_user").alias("user_id"),
        "trigger_event_id",
        "trigger_ts",
        "outcome_event_id",
        "outcome_ts",
        "outcome_value",
        (
            F.unix_micros(F.col("outcome_ts")) - F.unix_micros(F.col("trigger_ts"))
        ).alias("lag_us"),
    )


# --- custom stateful operator: Misra-Gries heavy hitters ------------------

MG_K = 8       # counters per shard (error bound: decrements <= n_shard / K)
MG_SHARDS = 4  # item-hash shards; summaries merge by summing per item

_MG_STATE_SCHEMA = StructType(
    [
        StructField("items", ArrayType(LongType())),
        StructField("counts", ArrayType(LongType())),
        StructField("n_seen", LongType()),
        StructField("decrements", LongType()),
    ]
)

_MG_OUTPUT_SCHEMA = StructType(
    [
        StructField("shard", LongType()),
        StructField("item", LongType()),
        StructField("mg_count", LongType()),
        StructField("n_seen", LongType()),
        StructField("decrements", LongType()),
    ]
)


def _mg_fold(d: dict, vals, k: int = MG_K) -> int:
    """Fold a value sequence into a Misra-Gries counter dict IN ORDER.
    Returns the number of decrement steps taken (the summary's additive
    error bound: mg_count <= true_count <= mg_count + decrements)."""
    decs = 0
    for v in vals:
        v = int(v)
        if v in d:
            d[v] += 1
        elif len(d) < k:
            d[v] = 1
        else:
            decs += 1
            for key in list(d):
                d[key] -= 1
                if d[key] == 0:
                    del d[key]
    return decs


def _mg_shard_col():
    """Shard assignment shared by the stream and asserted against the
    batch twin: pmod, not %, because Spark's % follows the dividend's
    sign while pandas' follows the divisor's — a negative user_id must
    land in the same 0..MG_SHARDS-1 shard on both paths."""
    return F.pmod(F.col("user_id"), F.lit(MG_SHARDS)).cast("long")


def _mg_update(key, pdfs: Iterator[pd.DataFrame], state) -> Iterator[pd.DataFrame]:
    """applyInPandasWithState kernel: one bounded MG summary per shard.
    Rows fold in (ts, event_id) order so the summary is a pure function
    of stream CONTENT, not of partition interleaving — replaying the
    same batches yields the same counters bit-for-bit."""
    (shard,) = key
    if state.exists:
        items, counts, n, decs = state.get
        d = dict(zip(items, counts))
    else:
        d, n, decs = {}, 0, 0
    # One shard group can span multiple Arrow record batches (the iterator
    # chunks at ~10k rows); sorting per chunk would fold in chunk-local
    # order and break the bit-for-bit replay contract. Concatenate the
    # whole group FIRST, then impose one global (ts, event_id) order.
    chunks = [pdf for pdf in pdfs if len(pdf)]
    if chunks:
        pdf = pd.concat(chunks, ignore_index=True).sort_values(
            ["ts", "event_id"]
        )
        n += len(pdf)
        decs += _mg_fold(d, pdf["user_id"].tolist())
    state.update(
        (list(map(int, d.keys())), list(map(int, d.values())), int(n), int(decs))
    )
    out = sorted(d.items())
    yield pd.DataFrame(
        {
            "shard": [int(shard)] * len(out),
            "item": [i for i, _ in out],
            "mg_count": [c for _, c in out],
            "n_seen": [int(n)] * len(out),
            "decrements": [int(decs)] * len(out),
        }
    )


def heavy_hitters_stream(stream: DataFrame) -> DataFrame:
    """Streaming heavy hitters over user_id via sharded Misra-Gries
    summaries — the bounded-memory answer to "who dominates the stream"
    when the item domain is too large for a per-item aggregate. Each
    shard holds K counters regardless of stream length (state is O(K),
    not O(distinct items)); per-item totals merge across shards by
    addition, and MG's guarantee survives the merge: every item with
    true count > n_shard/K is present, with
    mg_count <= true <= mg_count + decrements.

    At 100 TB this is the front-line skew detector: the summary costs
    O(SHARDS x K) state against an unbounded item domain, and its output
    is exactly the hot-key list the AQE-salting decisions need."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    sharded = stream.withColumn("shard", _mg_shard_col())
    return sharded.groupBy("shard").applyInPandasWithState(
        _mg_update,
        outputStructType=_MG_OUTPUT_SCHEMA,
        stateStructType=_MG_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def heavy_hitters_batch(df) -> dict:
    """Sequential reference twin of the streaming MG kernel: fold ALL rows
    per shard in (ts, event_id) order. Returns
    {shard: (counter_dict, n_seen, decrements)} for direct comparison."""
    out: dict = {}
    pdf = df.select("user_id", "ts", "event_id").toPandas().sort_values(
        ["ts", "event_id"]
    )
    for shard in range(MG_SHARDS):
        rows = pdf[pdf["user_id"] % MG_SHARDS == shard]
        d: dict = {}
        decs = _mg_fold(d, rows["user_id"].tolist())
        out[int(shard)] = (d, len(rows), decs)
    return out

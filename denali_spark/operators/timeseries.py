"""Time-series / event operators over the ``events`` table: tumbling windows,
gap-filling, sessionization, AS-OF join, banded range join, funnel and
transition analysis.

These are the batch twins of the streaming module — same semantics expressed
over a static DataFrame, which is what makes them oracle-checkable. The
streaming variants (watermarks, applyInPandasWithState) live in
``denali_spark.streaming``.

Scale notes: everything here partitions by ``user_id`` (the natural key) or
by coarse time buckets, never a global sort. The AS-OF join is the
union-and-carry-forward formulation — one shuffle on (user, time) — instead
of a per-row lookup; the range join is banded (candidate buckets) instead of
an inequality cross join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from denali_spark.engine.tables import load_table
from denali_spark.operators._util import dec
from denali_spark.operators.registry import query

# Microseconds since epoch for an NTZ timestamp. The engine pins the session
# to UTC when loading events, so the NTZ→LTZ cast inside unix_micros is the
# identity on wall-clock values (== DuckDB's epoch_us on naive timestamps).
def _us(col):
    return F.unix_micros(F.col(col).cast("timestamp"))


@query(
    "ts_hourly_rollup",
    oracle="""
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00') AS hour,
           COUNT(*) AS n_events,
           COUNT(DISTINCT user_id) AS n_users,
           CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
    FROM events GROUP BY 1
    """,
    tags=("timeseries", "tumbling-window"),
)
def ts_hourly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour windows (batch twin of the streaming windowed agg)."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:00").alias("hour")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.sum(dec("value")).cast("double").alias("total_value"),
        )
    )


@query(
    "ts_daily_active_users",
    oracle="""
    SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
           COUNT(DISTINCT user_id) AS dau
    FROM events GROUP BY 1
    """,
    tags=("timeseries", "distinct"),
)
def ts_daily_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return events.groupBy(
        F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day")
    ).agg(F.countDistinct("user_id").alias("dau"))


@query(
    "ts_gap_fill_hours",
    oracle="""
    WITH bounds AS (
      SELECT date_trunc('hour', MIN(ts)) AS lo, date_trunc('hour', MAX(ts)) AS hi FROM events
    ),
    hours AS (
      SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h FROM bounds
    ),
    counts AS (
      SELECT date_trunc('hour', ts) AS h, COUNT(*) AS n FROM events GROUP BY 1
    )
    SELECT strftime(hours.h, '%Y-%m-%d %H:00') AS hour,
           COALESCE(n, 0) AS n_events
    FROM hours LEFT JOIN counts ON hours.h = counts.h
    """,
    tags=("timeseries", "gap-fill"),
)
def ts_gap_fill_hours(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense hourly series with zero-filled gaps: sequence() + explode on the
    (tiny) bounds row, left join to the aggregated counts."""
    events = load_table(spark, sf_dir, "events")
    bounds = events.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    hours = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))).alias("h")
    )
    counts = events.groupBy(F.date_trunc("hour", "ts").alias("h")).agg(
        F.count(F.lit(1)).alias("n")
    )
    return (
        hours.join(counts, "h", "left")
        .select(
            F.date_format("h", "yyyy-MM-dd HH:00").alias("hour"),
            F.coalesce("n", F.lit(0)).alias("n_events"),
        )
    )


@query(
    "ts_sessionize",
    oracle="""
    WITH flagged AS (
      SELECT user_id, event_id, ts, value,
             CASE WHEN LAG(ts) OVER w IS NULL
                       OR epoch_us(ts) - epoch_us(LAG(ts) OVER w) > 1800000000
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sessions AS (
      SELECT *, CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
      FROM flagged
    )
    SELECT user_id, session_id, COUNT(*) AS n_events,
           epoch_us(MAX(ts)) - epoch_us(MIN(ts)) AS dur_us,
           CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
    FROM sessions GROUP BY user_id, session_id
    """,
    tags=("timeseries", "sessionization"),
)
def ts_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min inactivity): lag → new-session flag →
    running-sum session ids → per-session rollup. One shuffle on user_id."""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    gap_us = _us("ts") - F.unix_micros(F.lag("ts").over(w).cast("timestamp"))
    flagged = events.select(
        "user_id",
        "event_id",
        "ts",
        "value",
        F.when(F.lag("ts").over(w).isNull() | (gap_us > 1_800_000_000), 1)
        .otherwise(0)
        .alias("new_session"),
    )
    sessions = flagged.withColumn(
        "session_id", F.sum("new_session").over(wrun).cast("long")
    )
    return sessions.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        (F.unix_micros(F.max("ts").cast("timestamp")) - F.unix_micros(F.min("ts").cast("timestamp"))).alias("dur_us"),
        F.sum(dec("value")).cast("double").alias("total_value"),
    )


def _asof_union_carry(events: DataFrame, forward: bool) -> DataFrame:
    """Shared engine of both as-of joins: union clicks (build side) and
    purchases (probe side), carry the most recent click through a
    (user_id, ts)-ordered window — ascending for latest-at-or-before,
    descending for earliest-at-or-after — and keep the probe rows. Clicks
    order before purchases at identical timestamps in BOTH directions,
    preserving inclusive semantics."""
    clicks = events.filter(F.col("event_type") == "click").select(
        F.lit(None).cast("long").alias("event_id"),
        "user_id",
        "ts",
        F.col("value").alias("c_value"),
        F.lit(0).alias("is_probe"),
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", F.lit(None).cast("double").alias("c_value"),
        F.lit(1).alias("is_probe"),
    )
    merged = clicks.unionByName(purchases)
    order = F.desc("ts") if forward else F.asc("ts")
    w = (
        Window.partitionBy("user_id")
        .orderBy(order, "is_probe")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = merged.select(
        "event_id",
        "user_id",
        "ts",
        "is_probe",
        F.last(F.when(F.col("is_probe") == 0, F.col("ts")), ignorenulls=True)
        .over(w)
        .alias("click_ts"),
        F.last(F.when(F.col("is_probe") == 0, F.col("c_value")), ignorenulls=True)
        .over(w)
        .alias("click_value"),
    )
    return carried.filter(F.col("is_probe") == 1).select(
        "event_id",
        "user_id",
        _us("ts").alias("purchase_us"),
        F.unix_micros(F.col("click_ts").cast("timestamp")).alias("click_us"),
        "click_value",
    )


@query(
    "ts_asof_join",
    oracle="""
    WITH purchases AS (
      SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'purchase'
    ),
    clicks AS (
      SELECT user_id, ts, value FROM events WHERE event_type = 'click'
    )
    SELECT p.event_id, p.user_id,
           epoch_us(p.ts) AS purchase_us,
           epoch_us(c.ts) AS click_us,
           c.value AS click_value
    FROM purchases p
    ASOF LEFT JOIN clicks c ON p.user_id = c.user_id AND c.ts <= p.ts
    """,
    tags=("timeseries", "asof-join", "custom-operator"),
)
def ts_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AS-OF join (per purchase, the latest click at-or-before it).

    Spark lacks a native AS-OF join; the scalable formulation is
    union-both-streams -> window carry-forward (last non-null) -> filter to
    the probe side. One shuffle on (user_id, ts); no per-row lookups, no
    broadcast requirement -- this is the 100 TB-safe pattern. Shared
    engine: _asof_union_carry."""
    return _asof_union_carry(load_table(spark, sf_dir, "events"), forward=False)


@query(
    "ts_range_join_pairs",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs
    FROM events a JOIN events b
      ON a.user_id = b.user_id
     AND b.ts > a.ts
     AND epoch_us(b.ts) - epoch_us(a.ts) <= 60000000
    """,
    tags=("timeseries", "range-join", "custom-operator"),
)
def ts_range_join_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded range join: pairs of same-user events within 60s.

    A naive inequality join is a per-user cross product. Instead each left
    row is expanded to its two candidate 60s buckets and the join is an
    EQUI-join on (user, bucket) + residual time filter — O(pairs), shuffle
    co-partitioned, which survives 100× data growth.
    """
    events = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", _us("ts").alias("us")
    )
    left = events.select(
        "user_id",
        F.col("event_id").alias("a_id"),
        F.col("us").alias("a_us"),
        F.explode(
            F.array((F.col("us") / 60_000_000).cast("long"),
                    (F.col("us") / 60_000_000).cast("long") + 1)
        ).alias("bucket"),
    )
    right = events.select(
        "user_id",
        F.col("event_id").alias("b_id"),
        F.col("us").alias("b_us"),
        (F.col("us") / 60_000_000).cast("long").alias("bucket"),
    )
    pairs = left.join(right, ["user_id", "bucket"]).filter(
        (F.col("b_us") > F.col("a_us"))
        & (F.col("b_us") - F.col("a_us") <= 60_000_000)
    )
    return pairs.agg(F.count(F.lit(1)).alias("n_pairs"))


@query(
    "ts_funnel",
    oracle="""
    WITH stage_times AS (
      SELECT user_id,
             MIN(CASE WHEN event_type = 'signup' THEN ts END) AS t_signup,
             MIN(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
             MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
      FROM events GROUP BY user_id
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_converted
    FROM stage_times
    WHERE t_signup IS NOT NULL AND t_click > t_signup AND t_purchase > t_click
    """,
    tags=("timeseries", "funnel"),
)
def ts_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel (signup → click → purchase) via conditional MIN —
    single aggregation pass, no joins."""
    events = load_table(spark, sf_dir, "events")
    stage = events.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).alias("t_signup"),
        F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias("t_click"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias("t_purchase"),
    )
    return stage.filter(
        F.col("t_signup").isNotNull()
        & (F.col("t_click") > F.col("t_signup"))
        & (F.col("t_purchase") > F.col("t_click"))
    ).agg(F.count(F.lit(1)).alias("n_converted"))


@query(
    "ts_transitions",
    oracle="""
    WITH seq AS (
      SELECT event_type,
             LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_type
      FROM events
    )
    SELECT event_type, next_type, COUNT(*) AS n
    FROM seq WHERE next_type IS NOT NULL
    GROUP BY event_type, next_type
    """,
    tags=("timeseries", "markov"),
)
def ts_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-type transition matrix (lead within user timeline)."""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = events.select(
        "event_type", F.lead("event_type").over(w).alias("next_type")
    )
    return (
        seq.filter(F.col("next_type").isNotNull())
        .groupBy("event_type", "next_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "ts_ohlc_bars",
    oracle="""
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00') AS hour,
           event_type,
           min({'us': epoch_us(ts), 'eid': event_id, 'v': value}).v AS open,
           MAX(value) AS high,
           MIN(value) AS low,
           max({'us': epoch_us(ts), 'eid': event_id, 'v': value}).v AS close,
           COUNT(*) AS n
    FROM events GROUP BY 1, 2
    """,
    tags=("timeseries", "ohlc"),
)
def ts_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-hour, per-event-type OHLC bars — the canonical downsampling shape
    of a metrics/market hypertable rollup. Open/close are the first/last
    values by (ts, event_id) — the struct MIN/MAX trick makes the whole bar
    ONE partial-aggregable groupBy (no window, no second shuffle), with
    event_id breaking timestamp ties so the bar is deterministic. All five
    outputs are order-independent aggregates (struct min/max, min, max,
    count) — no float summation, so engine-order differences can't flip
    bits."""
    events = load_table(spark, sf_dir, "events")
    okey = F.struct(
        _us("ts").alias("us"), F.col("event_id").alias("eid"), F.col("value").alias("v")
    )
    return (
        events.groupBy(
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:00").alias("hour"),
            "event_type",
        )
        .agg(
            F.min(okey).getField("v").alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max(okey).getField("v").alias("close"),
            F.count(F.lit(1)).alias("n"),
        )
    )


ANOMALY_TRAIL_US = 86_400_000_000  # 24h lookback
ANOMALY_CHUNK_US = 7 * 86_400_000_000  # window-partition time chunk (>= trail)
ANOMALY_MIN_N = 30  # below this the estimate is noise; no verdict
ANOMALY_Z = 3.0


@query(
    "ts_anomaly_zscore",
    oracle=f"""
    WITH w AS (
      SELECT event_id, event_type, value,
             COUNT(*) OVER trail AS trail_n,
             CAST(SUM(CAST(value AS DECIMAL(12,2))) OVER trail AS DOUBLE) AS s1,
             CAST(SUM(CAST(value AS DECIMAL(12,2)) * CAST(value AS DECIMAL(12,2))) OVER trail AS DOUBLE) AS s2
      FROM events
      WINDOW trail AS (PARTITION BY event_type ORDER BY epoch_us(ts)
                       RANGE BETWEEN {ANOMALY_TRAIL_US} PRECEDING AND 1 PRECEDING)
    ),
    scored AS (
      SELECT event_id, event_type, value, CAST(trail_n AS BIGINT) AS trail_n,
             CASE WHEN trail_n >= {ANOMALY_MIN_N}
                   AND s2 / trail_n - (s1 / trail_n) * (s1 / trail_n) > 0
                  THEN (value - s1 / trail_n)
                       / sqrt(s2 / trail_n - (s1 / trail_n) * (s1 / trail_n))
             END AS z
      FROM w
    )
    SELECT event_id, event_type, value, trail_n, z,
           COALESCE(abs(z) > {ANOMALY_Z}, FALSE) AS is_anomaly
    FROM scored
    """,
    tags=("timeseries", "anomaly", "sliding-window"),
)
def ts_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming-style anomaly detection as a batch query: each event's
    value is z-scored against the trailing 24h of its event_type (frame
    excludes the event itself); |z| > {ANOMALY_Z} with at least
    {ANOMALY_MIN_N} trailing points flags an anomaly.

    Determinism across engines: the trailing mean/variance come from EXACT
    decimal sums (s1, s2) over the range frame — decimal addition is
    order-independent, so DuckDB's segment-tree frame evaluation and
    Spark's sequential one produce identical bits; all floating math
    happens after, on identical inputs.

    Scale shape — chunked window with context carry: a window partitioned
    by event_type alone has a handful of partitions regardless of data
    volume (one task per event type at 100 TB — unusable). Instead rows
    are windowed by (event_type, 7-day chunk), and each chunk's trailing
    24 h of rows is COPIED into the next chunk as context-only rows: every
    row's 24 h frame is fully present in its own partition, so results are
    exactly the global ones (the oracle runs the naive global window), but
    partition cardinality grows with the covered time span and the carry
    overhead is bounded at trail/chunk ≈ 14%. Context rows score nothing —
    they're filtered after the window."""
    events = load_table(spark, sf_dir, "events")
    base = events.select("event_id", "event_type", "value", _us("ts").alias("us"))
    own = base.select(
        "*",
        (F.col("us") - (F.col("us") % ANOMALY_CHUNK_US)).alias("chunk"),
        F.lit(False).alias("ctx"),
    )
    carry = base.filter(
        F.col("us") % ANOMALY_CHUNK_US >= ANOMALY_CHUNK_US - ANOMALY_TRAIL_US
    ).select(
        "*",
        (F.col("us") - (F.col("us") % ANOMALY_CHUNK_US) + ANOMALY_CHUNK_US).alias(
            "chunk"
        ),
        F.lit(True).alias("ctx"),
    )
    trail = (
        Window.partitionBy("event_type", "chunk")
        .orderBy("us")
        .rangeBetween(-ANOMALY_TRAIL_US, -1)
    )
    d = dec("value")
    w = (
        own.unionByName(carry)
        .select(
            "event_id",
            "event_type",
            "value",
            "ctx",
            F.count(F.lit(1)).over(trail).alias("trail_n"),
            F.sum(d).over(trail).cast("double").alias("s1"),
            F.sum(d * d).over(trail).cast("double").alias("s2"),
        )
        .filter(~F.col("ctx"))
    )
    mean = F.col("s1") / F.col("trail_n")
    var = F.col("s2") / F.col("trail_n") - mean * mean
    z = F.when(
        (F.col("trail_n") >= ANOMALY_MIN_N) & (var > 0),
        (F.col("value") - mean) / F.sqrt(var),
    )
    return w.select(
        "event_id",
        "event_type",
        "value",
        F.col("trail_n").cast("long").alias("trail_n"),
        z.alias("z"),
        F.coalesce(F.abs(z) > ANOMALY_Z, F.lit(False)).alias("is_anomaly"),
    )


@query(
    "ts_retention_cohorts",
    oracle="""
    WITH firsts AS (
      SELECT user_id, MIN(date_trunc('day', ts)) AS cohort_day FROM events GROUP BY 1
    ),
    activity AS (
      SELECT DISTINCT user_id, date_trunc('day', ts) AS active_day FROM events
    )
    SELECT strftime(f.cohort_day, '%Y-%m-%d') AS cohort_day,
           CAST(date_diff('day', f.cohort_day, a.active_day) AS BIGINT) AS day_offset,
           COUNT(*) AS n_users
    FROM activity a JOIN firsts f ON a.user_id = f.user_id
    GROUP BY 1, 2
    """,
    tags=("timeseries", "retention", "cohort"),
)
def ts_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users grouped by first-seen day, counted on each
    later day they return (the product-analytics triangle). (cohort_day,
    day_offset, n_users) with offset 0 = the cohort's own size.

    Scale shape: two user_id-keyed aggregations (both map-side combinable)
    feeding one equi-join on user_id — AQE co-partitions them — then a
    final (cohort, offset) count. No windows, no distinct-over-everything:
    the dedup to (user, day) happens pre-join so the join input is bounded
    by users x active-days, not raw events."""
    events = load_table(spark, sf_dir, "events")
    day = F.date_trunc("day", "ts")
    firsts = events.groupBy("user_id").agg(F.min(day).alias("cohort_day"))
    activity = events.select("user_id", day.alias("active_day")).distinct()
    return (
        activity.join(firsts, "user_id")
        .groupBy(
            F.date_format("cohort_day", "yyyy-MM-dd").alias("cohort_day"),
            F.datediff("active_day", "cohort_day").cast("long").alias("day_offset"),
        )
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


LTTB_BUCKETS = 100


def _lttb_select(ts_us, vals, n_out: int):
    """Largest-Triangle-Three-Buckets (Steinarsson 2013) over one series,
    returning selected row positions. Pure numpy, deterministic: stable
    bucket edges via linspace over the interior, argmax keeps the first
    maximum on area ties."""
    import numpy as np

    n = len(ts_us)
    if n_out >= n:
        return list(range(n))
    if n_out < 3:
        return [0, n - 1]
    # interior bucket edges: n_out-2 buckets over positions [1, n-1)
    edges = np.linspace(1, n - 1, n_out - 1).astype(int)
    selected = [0]
    prev = 0
    for b in range(n_out - 2):
        lo, hi = edges[b], edges[b + 1]
        if hi <= lo:
            hi = lo + 1
        nxt_lo, nxt_hi = edges[b + 1], (edges[b + 2] if b + 2 < len(edges) else n)
        if nxt_hi <= nxt_lo:
            nxt_hi = nxt_lo + 1
        # average of the NEXT bucket is the third triangle corner
        cx = float(np.mean(ts_us[nxt_lo:nxt_hi]))
        cy = float(np.mean(vals[nxt_lo:nxt_hi]))
        ax, ay = float(ts_us[prev]), float(vals[prev])
        bx = ts_us[lo:hi].astype("float64")
        by = vals[lo:hi].astype("float64")
        area = np.abs((ax - cx) * (by - ay) - (ax - bx) * (cy - ay))
        prev = lo + int(np.argmax(area))
        selected.append(prev)
    selected.append(n - 1)
    return selected


@query("ts_downsample_lttb", tags=("timeseries", "downsample", "pandas-udf"))
def ts_downsample_lttb(
    spark: SparkSession, sf_dir: str, n_out: int = LTTB_BUCKETS
) -> DataFrame:
    """LTTB downsampling of each event_type's (ts, value) series to `n_out`
    visually-representative points — the dashboard-rendering primitive of a
    metrics hypertable (Timescale's `lttb`). First/last points are always
    kept; each interior bucket contributes the point forming the largest
    triangle with the previously-kept point and the next bucket's centroid.

    LTTB's selection is inherently SEQUENTIAL within a series (each pick
    depends on the previous), so this is one of the few operators here that
    genuinely needs applyInPandas: one Arrow-batched python kernel per
    series, parallel ACROSS series (the window shuffle key is the series
    id). A series too big for one task would use the chunked approximation
    (split, downsample chunks, re-downsample the concatenation) — not
    needed at these scales. No SQL oracle exists (the driver records the
    rows-only check); tests/test_lttb.py pins the semantics instead."""
    import pandas as pd

    events = load_table(spark, sf_dir, "events")
    series = events.select(
        "event_type", _us("ts").alias("us"), "value", "event_id"
    )

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["us", "event_id"], ignore_index=True)
        idx = _lttb_select(pdf["us"].to_numpy(), pdf["value"].to_numpy(), n_out)
        out = pdf.iloc[idx][["event_type", "us", "value"]].copy()
        out["rank"] = range(len(idx))
        return out

    return series.groupBy("event_type").applyInPandas(
        kernel, schema="event_type string, us long, value double, rank int"
    )


@query(
    "ts_asof_join_forward",
    oracle="""
    WITH purchases AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
    ),
    clicks AS (
      SELECT user_id, ts, value FROM events WHERE event_type = 'click'
    )
    SELECT p.event_id, p.user_id,
           epoch_us(p.ts) AS purchase_us,
           epoch_us(c.ts) AS click_us,
           c.value AS click_value
    FROM purchases p
    ASOF LEFT JOIN clicks c ON p.user_id = c.user_id AND c.ts >= p.ts
    """,
    tags=("timeseries", "asof-join", "custom-operator"),
)
def ts_asof_join_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of join: per purchase, the EARLIEST click at-or-after it
    -- the "next action after conversion" attribution lookup, the mirror of
    `ts_asof_join`'s latest-before semantics. Same union-and-carry engine
    (_asof_union_carry), traversed in DESCENDING time order: walking from
    the future backwards, the last click seen is the earliest one still >=
    the current row."""
    return _asof_union_carry(load_table(spark, sf_dir, "events"), forward=True)


EMA_ALPHA = 0.2


@query(
    "ts_ema_current",
    oracle=f"""
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           list_reduce(list(value ORDER BY ts, event_id),
                       (acc, x) -> {EMA_ALPHA} * x + {1 - EMA_ALPHA} * acc) AS ema
    FROM events GROUP BY 1
    """,
    tags=("timeseries", "ema", "recursive"),
)
def ts_ema_current(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Current exponentially-weighted moving average of each user's value
    series (alpha=EMA_ALPHA=0.2, seeded with the first observation) — the
    classic smoothing recurrence ema_i = a*x_i + (1-a)*ema_(i-1), which no
    window frame can express (each step depends on the previous RESULT,
    not the previous rows). Both engines evaluate it as a sequential fold
    over the identically-(ts, event_id)-ordered value list, so the float
    operation sequence — and therefore every bit — matches.

    Scale shape: one shuffle on user_id; per-user state is that user's
    event list (bounded by per-key activity, the same bound sessionization
    carries). For per-ROW ema output at scale, the chunked-carry trick from
    ts_anomaly_zscore applies with the chunk's closing ema as the carry."""
    events = load_table(spark, sf_dir, "events")
    rows = events.select(
        "user_id",
        F.struct(_us("ts").alias("us"), F.col("event_id").alias("eid"),
                 F.col("value").alias("v")).alias("r"),
    )
    per_user = rows.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.array_sort(F.collect_list("r")).alias("rs"),
    )
    vals = F.transform("rs", lambda r: r["v"])
    ema = F.aggregate(
        F.slice(vals, 2, F.greatest(F.size(vals) - 1, F.lit(0))),
        F.element_at(vals, 1),
        lambda acc, x: F.lit(EMA_ALPHA) * x + F.lit(1 - EMA_ALPHA) * acc,
    )
    return per_user.select("user_id", "n_events", ema.alias("ema"))


EMA_CHUNK = 256


@query("ts_ema_rows", tags=("timeseries", "ema", "parallel-prefix"))
def ts_ema_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PER-ROW exponential moving average for every event — the recurrence
    ema_i = a*x_i + (1-a)*ema_(i-1) parallelized with the classic
    affine-composition scan: each row's ema is an AFFINE function of its
    chunk's incoming state, ema_i = A_i * s_in + B_i, where A_i = (1-a)^(i+1)
    and B_i is the zero-seeded prefix fold. Chunks of EMA_CHUNK=256 rows
    compute (A, B) coefficient arrays independently; the per-user chain of
    chunk summaries (one affine map each) is then prefix-composed — work
    O(n) + O(chunks^2_per_user) with chunks ~ n/256, so the sequential part
    shrinks 256x. This is how an inherently sequential recurrence ships on
    a 1000-executor cluster.

    No SQL oracle exists (per-row recurrences aren't frame-expressible);
    tests/test_ema_rows.py checks against a driver-side sequential
    reference. Values differ from naive evaluation only by float
    re-association (~1e-12 relative) — the standard parallel-scan
    trade-off, which is why the driver check is rows-only."""
    events = load_table(spark, sf_dir, "events")
    a = EMA_ALPHA
    rn_w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    rows = events.select(
        "user_id", "event_id", "ts", "value", F.row_number().over(rn_w).alias("rn")
    ).select(
        "*",
        ((F.col("rn") - 1) / EMA_CHUNK).cast("long").alias("chunk"),
    )
    per_chunk = rows.groupBy("user_id", "chunk").agg(
        F.array_sort(
            F.collect_list(
                F.struct(
                    F.col("rn").alias("rn"),
                    F.col("event_id").alias("eid"),
                    F.col("value").alias("v"),
                )
            )
        ).alias("rs")
    )
    vals = F.transform("rs", lambda r: r["v"])
    # Zero-seeded prefix folds B_i (running array build) and A_i = (1-a)^(i+1)
    # Seed the running array with B_0 = a*v_0 (the zero-seed recurrence's
    # first step) so the fold never indexes an empty accumulator — under
    # ANSI mode (the driver's vanilla session) element_at(empty, -1)
    # throws instead of returning null.
    b_arr = F.aggregate(
        F.slice(vals, 2, F.greatest(F.size(vals) - 1, F.lit(0))),
        F.array(F.lit(a) * F.element_at(vals, 1)),
        lambda acc, x: F.concat(
            acc,
            F.array(F.lit(a) * x + F.lit(1 - a) * F.element_at(acc, -1)),
        ),
    )
    a_arr = F.transform(
        F.sequence(F.lit(1), F.size(vals)), lambda i: F.pow(F.lit(1 - a), i)
    )
    # Chunk 0 is seedless: its per-row emas are the prefix of the fold
    # seeded by its own first element (computed ONCE here and reused both
    # for the rows and, via its last element, as E0 in the composition);
    # chunks > 0 never evaluate it thanks to the WHEN guard.
    seeded_prefix = F.aggregate(
        F.slice(vals, 2, F.greatest(F.size(vals) - 1, F.lit(0))),
        F.array(F.element_at(vals, 1)),
        lambda acc, x: F.concat(
            acc, F.array(F.lit(a) * x + F.lit(1 - a) * F.element_at(acc, -1))
        ),
    )
    chunks = per_chunk.select(
        "user_id",
        "chunk",
        "rs",
        b_arr.alias("b_arr"),
        a_arr.alias("a_arr"),
        F.when(F.col("chunk") == 0, seeded_prefix).alias("prefix0"),
    )
    # Per-user prefix composition over the (small) ordered chunk-summary list:
    # s_in(chunk 0) = None-sentinel; s_in(c) = composed final of chunks < c.
    summaries = chunks.groupBy("user_id").agg(
        F.array_sort(
            F.collect_list(
                F.struct(
                    F.col("chunk").alias("chunk"),
                    F.element_at("a_arr", -1).alias("A"),
                    F.element_at("b_arr", -1).alias("B"),
                    F.element_at("prefix0", -1).alias("E0"),
                )
            )
        ).alias("cs")
    )
    # s_in for chunk c = E0 of chunk 0 pushed through chunks 1..c-1 maps
    s_in = F.transform(
        F.col("cs"),
        lambda c, i: F.struct(
            c["chunk"].alias("chunk"),
            F.when(i == 0, F.lit(None).cast("double")).otherwise(
                F.aggregate(
                    F.slice(F.col("cs"), 2, i - 1),
                    F.element_at(F.col("cs"), 1)["E0"],
                    lambda acc, x: x["A"] * acc + x["B"],
                )
            ).alias("s"),
        ),
    )
    carries = summaries.select(
        "user_id", F.explode(s_in).alias("c")
    ).select("user_id", F.col("c.chunk").alias("chunk"), F.col("c.s").alias("s_in"))
    joined = chunks.join(carries, ["user_id", "chunk"])
    # per-row ema: chunks with incoming state use A_i*s_in + B_i; the
    # seedless chunk 0 already carries its prefix.
    emas = F.when(F.col("s_in").isNull(), F.col("prefix0")).otherwise(
        F.zip_with(
            "a_arr", "b_arr", lambda A, B: A * F.col("s_in") + B
        )
    )
    out = joined.select(
        "user_id",
        F.explode(F.arrays_zip("rs", emas.alias("e"))).alias("z"),
    )
    return out.select(
        "user_id",
        F.col("z.rs.eid").alias("event_id"),
        F.col("z.rs.rn").cast("long").alias("rn"),
        F.col("z.e").alias("ema"),
    )


@query(
    "ts_dow_hour_heatmap",
    oracle="""
    SELECT CAST(isodow(ts) AS BIGINT) AS dow,
           CAST(hour(ts) AS BIGINT) AS hour,
           COUNT(*) AS n_events,
           COUNT(DISTINCT user_id) AS n_users,
           CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
    FROM events GROUP BY 1, 2
    """,
    tags=("timeseries", "heatmap"),
)
def ts_dow_hour_heatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Activity heatmap by ISO day-of-week (Mon=1) x hour — the seasonality
    view dashboards render before any capacity planning. One map-side
    combinable aggregation over at most 168 cells; decimal sums keep the
    values bit-stable across engines and partitionings."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(
            (F.weekday("ts") + 1).cast("long").alias("dow"),
            F.hour("ts").cast("long").alias("hour"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.sum(dec("value")).cast("double").alias("total_value"),
        )
    )


@query(
    "ts_interpolate_linear",
    oracle="""
    WITH bounds AS (
      SELECT date_trunc('hour', MIN(ts)) AS lo, date_trunc('hour', MAX(ts)) AS hi FROM events
    ),
    hours AS (
      SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h FROM bounds
    ),
    types AS (SELECT DISTINCT event_type FROM events),
    grid AS (SELECT event_type, h FROM types CROSS JOIN hours),
    obs AS (
      SELECT event_type, date_trunc('hour', ts) AS h,
             CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS v
      FROM events GROUP BY 1, 2
    ),
    j AS (
      SELECT g.event_type, g.h, epoch_us(g.h) AS hu, o.v
      FROM grid g LEFT JOIN obs o ON g.event_type = o.event_type AND g.h = o.h
    ),
    w AS (
      SELECT event_type, h, hu, v,
        LAST_VALUE(v IGNORE NULLS) OVER wp AS pv,
        LAST_VALUE(CASE WHEN v IS NOT NULL THEN hu END IGNORE NULLS) OVER wp AS ph,
        FIRST_VALUE(v IGNORE NULLS) OVER wf AS nv,
        FIRST_VALUE(CASE WHEN v IS NOT NULL THEN hu END IGNORE NULLS) OVER wf AS nh
      FROM j
      WINDOW wp AS (PARTITION BY event_type ORDER BY hu
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             wf AS (PARTITION BY event_type ORDER BY hu
                    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT event_type, strftime(h, '%Y-%m-%d %H:00') AS hour,
           CASE WHEN v IS NOT NULL THEN v
                WHEN pv IS NOT NULL AND nv IS NOT NULL
                THEN pv + (nv - pv) * (CAST(hu - ph AS DOUBLE) / CAST(nh - ph AS DOUBLE))
           END AS v,
           v IS NULL AND pv IS NOT NULL AND nv IS NOT NULL AS interpolated
    FROM w
    """,
    tags=("timeseries", "gap-fill", "window"),
)
def ts_interpolate_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear interpolation over the dense hourly grid, per event_type:
    observed hours carry the exact decimal-summed hourly value; interior
    gaps take prev + (next-prev) * elapsed-fraction from the nearest
    observed neighbours (IGNORE NULLS window carries); leading/trailing
    gaps stay NULL — the standard dashboard/feature-store gap repair.

    Float exactness: observed values are order-independent decimal sums
    cast once to double, and the interpolation is scalar per-row double
    math written identically in both engines — no float aggregation
    anywhere. The windows run over the grid relation (hours x types,
    post-aggregate, bounded), never over raw events."""
    events = load_table(spark, sf_dir, "events")
    bounds = events.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    hours = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))).alias("h")
    )
    types = events.select("event_type").distinct()
    grid = types.crossJoin(hours)
    obs = events.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("h")
    ).agg(F.sum(dec("value")).cast("double").alias("v"))
    j = grid.join(obs, ["event_type", "h"], "left").select(
        "event_type", "h", F.unix_micros(F.col("h").cast("timestamp")).alias("hu"), "v"
    )
    wp = (
        Window.partitionBy("event_type")
        .orderBy("hu")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy("event_type")
        .orderBy("hu")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    hu_obs = F.when(F.col("v").isNotNull(), F.col("hu"))
    w = j.select(
        "event_type", "h", "hu", "v",
        F.last("v", ignorenulls=True).over(wp).alias("pv"),
        F.last(hu_obs, ignorenulls=True).over(wp).alias("ph"),
        F.first("v", ignorenulls=True).over(wf).alias("nv"),
        F.first(hu_obs, ignorenulls=True).over(wf).alias("nh"),
    )
    interp = F.col("pv") + (F.col("nv") - F.col("pv")) * (
        (F.col("hu") - F.col("ph")).cast("double")
        / (F.col("nh") - F.col("ph")).cast("double")
    )
    return w.select(
        "event_type",
        F.date_format("h", "yyyy-MM-dd HH:00").alias("hour"),
        F.when(F.col("v").isNotNull(), F.col("v"))
        .when(F.col("pv").isNotNull() & F.col("nv").isNotNull(), interp)
        .alias("v"),
        (
            F.col("v").isNull()
            & F.col("pv").isNotNull()
            & F.col("nv").isNotNull()
        ).alias("interpolated"),
    )


@query(
    "ts_seasonal_decompose",
    oracle="""
    WITH bounds AS (
      SELECT date_trunc('hour', MIN(ts)) AS lo, date_trunc('hour', MAX(ts)) AS hi FROM events
    ),
    hours AS (
      SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h FROM bounds
    ),
    types AS (SELECT DISTINCT event_type FROM events),
    grid AS (SELECT event_type, h FROM types CROSS JOIN hours),
    obs AS (
      SELECT event_type, date_trunc('hour', ts) AS h,
             SUM(CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT)) AS cents
      FROM events GROUP BY 1, 2
    ),
    g AS (
      SELECT grid.event_type, grid.h, COALESCE(cents, 0) AS cents
      FROM grid LEFT JOIN obs ON grid.event_type = obs.event_type AND grid.h = obs.h
    ),
    t AS (
      SELECT event_type, h, cents,
        SUM(cents) OVER wt AS tc, COUNT(*) OVER wt AS tn,
        SUM(cents) OVER wb AS bc, COUNT(*) OVER wb AS bn,
        SUM(cents) OVER wg AS gc, COUNT(*) OVER wg AS gn
      FROM g
      WINDOW wt AS (PARTITION BY event_type ORDER BY h
                    ROWS BETWEEN 12 PRECEDING AND 12 FOLLOWING),
             wb AS (PARTITION BY event_type, isodow(h), hour(h)),
             wg AS (PARTITION BY event_type)
    )
    SELECT event_type, strftime(h, '%Y-%m-%d %H:00') AS hour,
           CAST(cents AS DOUBLE) / 100.0 AS v,
           CAST(tc AS DOUBLE) / (100.0 * CAST(tn AS DOUBLE)) AS trend,
           CAST(bc AS DOUBLE) / (100.0 * CAST(bn AS DOUBLE))
             - CAST(gc AS DOUBLE) / (100.0 * CAST(gn AS DOUBLE)) AS seasonal,
           CAST(cents AS DOUBLE) / 100.0
             - CAST(tc AS DOUBLE) / (100.0 * CAST(tn AS DOUBLE))
             - (CAST(bc AS DOUBLE) / (100.0 * CAST(bn AS DOUBLE))
                - CAST(gc AS DOUBLE) / (100.0 * CAST(gn AS DOUBLE))) AS residual
    FROM t
    """,
    tags=("timeseries", "window", "decompose"),
)
def ts_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-means decomposition of the hourly per-type series:
    trend = centered 25h moving average, seasonal = (iso-dow, hour-of-day)
    bucket mean minus the series mean, residual = v - trend - seasonal —
    the classical additive decomposition dashboards and anomaly baselines
    use (an STL would iterate these same passes).

    Exactness discipline: every aggregation sums integer CENTS (exact,
    order-independent); doubles appear only in per-row scalar divisions
    written identically in both engines. The windows and bucket means run
    over the bounded hour x type grid, never raw events."""
    events = load_table(spark, sf_dir, "events")
    bounds = events.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    hours = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))).alias("h")
    )
    types = events.select("event_type").distinct()
    grid = types.crossJoin(hours)
    obs = events.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("h")
    ).agg(F.sum((dec("value") * 100).cast("long")).alias("cents"))
    g = grid.join(obs, ["event_type", "h"], "left").select(
        "event_type", "h", F.coalesce("cents", F.lit(0)).alias("cents")
    )
    wt = (
        Window.partitionBy("event_type").orderBy("h").rowsBetween(-12, 12)
    )
    wb = Window.partitionBy(
        "event_type", F.expr("extract(DAYOFWEEK_ISO FROM h)"), F.hour("h")
    )
    wg = Window.partitionBy("event_type")
    t = g.select(
        "event_type", "h", "cents",
        F.sum("cents").over(wt).alias("tc"), F.count(F.lit(1)).over(wt).alias("tn"),
        F.sum("cents").over(wb).alias("bc"), F.count(F.lit(1)).over(wb).alias("bn"),
        F.sum("cents").over(wg).alias("gc"), F.count(F.lit(1)).over(wg).alias("gn"),
    )
    v = F.col("cents").cast("double") / 100.0
    trend = F.col("tc").cast("double") / (100.0 * F.col("tn").cast("double"))
    seasonal = F.col("bc").cast("double") / (
        100.0 * F.col("bn").cast("double")
    ) - F.col("gc").cast("double") / (100.0 * F.col("gn").cast("double"))
    return t.select(
        "event_type",
        F.date_format("h", "yyyy-MM-dd HH:00").alias("hour"),
        v.alias("v"),
        trend.alias("trend"),
        seasonal.alias("seasonal"),
        (v - trend - seasonal).alias("residual"),
    )


@query(
    "ts_changepoint_cusum",
    oracle="""
    WITH hourly AS (
      SELECT event_type,
             strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00') AS hour,
             COUNT(*) AS cnt
      FROM events GROUP BY 1, 2
    ),
    totals AS (
      SELECT event_type, COUNT(*) AS n_hours, SUM(cnt) AS total
      FROM hourly GROUP BY 1
    ),
    dev AS (
      SELECT h.event_type, h.hour,
             CAST(h.cnt AS BIGINT) * t.n_hours - t.total AS dev,
             t.n_hours
      FROM hourly h JOIN totals t USING (event_type)
    ),
    cusum AS (
      SELECT event_type, hour, n_hours,
             SUM(dev) OVER (PARTITION BY event_type ORDER BY hour
                            ROWS UNBOUNDED PRECEDING) AS cusum
      FROM dev
    )
    SELECT event_type, hour AS changepoint_hour,
           abs_cusum AS max_abs_cusum, n_hours
    FROM (
      SELECT event_type, hour, n_hours,
             CAST(ABS(cusum) AS BIGINT) AS abs_cusum,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY ABS(cusum) DESC, hour) AS rn
      FROM cusum
    ) WHERE rn = 1
    """,
    tags=("timeseries", "changepoint", "cusum"),
)
def ts_changepoint_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint detection per event type: the hour where the
    cumulative deviation of hourly event counts from the series mean peaks
    (the classic single-changepoint estimator). Deviations are kept in
    exact integers by scaling counts with the hour count (cnt·H − T sums
    to zero over the series) instead of subtracting a float mean, so both
    engines agree bit-for-bit.

    Scale: the raw-event pass is one partial-aggregable groupBy; all
    windows run over the bounded (event_type × hour) post-aggregation
    grid, partitioned by event_type — never over raw events."""
    events = load_table(spark, sf_dir, "events")
    hourly = events.groupBy(
        "event_type",
        F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:00").alias("hour"),
    ).agg(F.count(F.lit(1)).alias("cnt"))
    totals = hourly.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_hours"), F.sum("cnt").alias("total")
    )
    dev = hourly.join(totals, "event_type").select(
        "event_type", "hour", "n_hours",
        (F.col("cnt").cast("long") * F.col("n_hours") - F.col("total")).alias("dev"),
    )
    w_cum = (
        Window.partitionBy("event_type")
        .orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cusum = dev.withColumn("cusum", F.sum("dev").over(w_cum))
    w_pick = Window.partitionBy("event_type").orderBy(
        F.desc(F.abs(F.col("cusum"))), F.asc("hour")
    )
    return (
        cusum.withColumn("rn", F.row_number().over(w_pick))
        .filter(F.col("rn") == 1)
        .select(
            "event_type",
            F.col("hour").alias("changepoint_hour"),
            F.abs(F.col("cusum")).alias("max_abs_cusum"),
            "n_hours",
        )
    )


@query(
    "ts_interarrival_stats",
    oracle="""
    WITH seq AS (
      SELECT event_type,
             epoch_us(ts) AS us,
             LAG(epoch_us(ts)) OVER (PARTITION BY event_type, user_id
                                     ORDER BY ts, event_id) AS prev
      FROM events
    ),
    g AS (
      SELECT event_type, (us - prev) // 1000000 AS gap_s
      FROM seq WHERE prev IS NOT NULL
    ),
    c AS (
      SELECT event_type, gap_s, COUNT(*) AS n FROM g GROUP BY 1, 2
    ),
    t AS (
      SELECT event_type, gap_s,
             SUM(n) OVER (PARTITION BY event_type ORDER BY gap_s) AS cum,
             SUM(n) OVER (PARTITION BY event_type) AS tot
      FROM c
    )
    SELECT event_type,
           MIN(gap_s) AS min_gap_s,
           MAX(gap_s) AS max_gap_s,
           MIN(CASE WHEN cum >= (tot + 1) // 2 THEN gap_s END) AS p50_gap_s,
           MIN(CASE WHEN cum >= (9 * tot + 9) // 10 THEN gap_s END) AS p90_gap_s,
           CAST(MAX(tot) AS BIGINT) AS n_gaps
    FROM t GROUP BY event_type
    """,
    tags=("timeseries", "interarrival", "percentile"),
)
def ts_interarrival_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-arrival-time distribution per event type: exact min/max and
    discrete p50/p90 of the whole-second gaps between a user's consecutive
    events of that type. The per-user LAG shuffles once on the natural
    (event_type, user_id) key; percentile selection reuses the
    agg_exact_percentiles idiom — a (type, gap) COUNT relation bounded by
    VALUE CARDINALITY (seconds in the time span), never a per-type sort of
    raw events — with all-integer rank arithmetic on both engines."""
    events = load_table(spark, sf_dir, "events")
    w_seq = Window.partitionBy("event_type", "user_id").orderBy("ts", "event_id")
    seq = events.select(
        "event_type",
        _us("ts").alias("us"),
        F.lag(_us("ts")).over(w_seq).alias("prev"),
    )
    g = seq.where(F.col("prev").isNotNull()).select(
        "event_type", F.expr("(us - prev) div 1000000").alias("gap_s")
    )
    c = g.groupBy("event_type", "gap_s").agg(F.count(F.lit(1)).alias("n"))
    wc = Window.partitionBy("event_type").orderBy("gap_s")
    wt = Window.partitionBy("event_type")
    t = c.select(
        "event_type", "gap_s",
        F.sum("n").over(wc).alias("cum"),
        F.sum("n").over(wt).alias("tot"),
    )
    return t.groupBy("event_type").agg(
        F.min("gap_s").alias("min_gap_s"),
        F.max("gap_s").alias("max_gap_s"),
        F.min(F.when(F.col("cum") >= F.expr("(tot + 1) div 2"), F.col("gap_s"))).alias("p50_gap_s"),
        F.min(F.when(F.col("cum") >= F.expr("(9 * tot + 9) div 10"), F.col("gap_s"))).alias("p90_gap_s"),
        F.max("tot").cast("long").alias("n_gaps"),
    )


@query(
    "ts_autocorr_lags",
    oracle="""
    WITH counts AS (
      SELECT event_type, date_trunc('hour', ts) AS h, COUNT(*) AS cnt
      FROM events GROUP BY 1, 2
    ),
    bounds AS (
      SELECT event_type, MIN(h) AS lo, MAX(h) AS hi FROM counts GROUP BY 1
    ),
    grid AS (
      SELECT event_type, unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h
      FROM bounds
    ),
    dense AS (
      SELECT g.event_type, g.h, COALESCE(c.cnt, 0) AS cnt
      FROM grid g LEFT JOIN counts c
        ON g.event_type = c.event_type AND g.h = c.h
    ),
    tot AS (
      SELECT event_type, SUM(cnt) AS s, COUNT(*) AS n FROM dense GROUP BY 1
    ),
    e AS (
      SELECT d.event_type, d.h,
             d.cnt - (t.s // t.n) AS e
      FROM dense d JOIN tot t USING (event_type)
    ),
    lagged AS (
      SELECT event_type, e,
             LAG(e, 1)   OVER w AS e1,
             LAG(e, 24)  OVER w AS e24,
             LAG(e, 168) OVER w AS e168
      FROM e WINDOW w AS (PARTITION BY event_type ORDER BY h)
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_hours,
           CAST((1000000 * SUM(e * e1))   // SUM(e * e) AS BIGINT) AS r1_ppm,
           CAST((1000000 * SUM(e * e24))  // SUM(e * e) AS BIGINT) AS r24_ppm,
           CAST((1000000 * SUM(e * e168)) // SUM(e * e) AS BIGINT) AS r168_ppm
    FROM lagged GROUP BY event_type
    """,
    tags=("timeseries", "autocorrelation"),
)
def ts_autocorr_lags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation of the dense hourly count series at lags 1 h, 24 h
    (daily seasonality) and 168 h (weekly), per event type — the ACF peaks
    `ts_seasonal_decompose` presumes. Deviations use the integer-truncated
    mean (cnt − S div H) so numerator and denominator are exact 64-bit
    integer sums; the ratio is reported in ppm by integer division —
    the whole query never touches a float.

    Scale: the raw-event pass is one partial-aggregable groupBy; the grid,
    lags, and sums all run over the bounded (type × hour) relation."""
    events = load_table(spark, sf_dir, "events")
    counts = events.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("h")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    bounds = counts.groupBy("event_type").agg(
        F.min("h").alias("lo"), F.max("h").alias("hi")
    )
    grid = bounds.select(
        "event_type",
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))).alias("h"),
    )
    dense = grid.join(counts, ["event_type", "h"], "left").select(
        "event_type", "h", F.coalesce("cnt", F.lit(0)).alias("cnt")
    )
    tot = dense.groupBy("event_type").agg(
        F.sum("cnt").alias("s"), F.count(F.lit(1)).alias("n")
    )
    e = dense.join(tot, "event_type").select(
        "event_type", "h", (F.col("cnt") - F.expr("s div n")).alias("e")
    )
    w = Window.partitionBy("event_type").orderBy("h")
    lagged = e.select(
        "event_type", "e",
        F.lag("e", 1).over(w).alias("e1"),
        F.lag("e", 24).over(w).alias("e24"),
        F.lag("e", 168).over(w).alias("e168"),
    )

    def r(lag_col: str, alias: str):
        return F.expr(
            f"CAST((1000000 * SUM(e * {lag_col})) div SUM(e * e) AS BIGINT)"
        ).alias(alias)

    return lagged.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_hours"),
        r("e1", "r1_ppm"), r("e24", "r24_ppm"), r("e168", "r168_ppm"),
    )


SPIKE_TOP_K = 10


@query(
    "ts_spike_hours",
    oracle=f"""
    WITH hourly AS (
      SELECT event_type,
             CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) * 24
                  + EXTRACT(hour FROM ts) AS BIGINT) AS hour_id,
             COUNT(*) AS n
      FROM events GROUP BY 1, 2
    ),
    deltas AS (
      SELECT event_type, hour_id, n,
             n - lag(n) OVER (PARTITION BY event_type ORDER BY hour_id)
               AS jump
      FROM hourly
    )
    SELECT event_type, hour_id, n, jump FROM (
      SELECT event_type, hour_id, n, jump,
             row_number() OVER (ORDER BY abs(jump) DESC, event_type, hour_id)
               AS rn
      FROM deltas WHERE jump IS NOT NULL
    ) WHERE rn <= {SPIKE_TOP_K}
    """,
    tags=("timeseries", "anomaly", "spikes"),
)
def ts_spike_hours(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{SPIKE_TOP_K} hour-over-hour volume spikes per event type: the
    largest absolute jumps between consecutive OBSERVED hourly counts (the
    ops 'what changed' view next to ts_anomaly_zscore's distributional
    one). All-integer: epoch-hour ids, counts, and deltas — no float ever
    enters, so the engines agree bit-exactly. Scale shape: the window
    partitions by event type over the post-aggregation one-row-per-hour
    relation (bounded: types x hours), and the final top-k is
    TakeOrderedAndProject, never a global sort."""
    events = load_table(spark, sf_dir, "events")
    # tz-independent epoch-hour id (ts is TIMESTAMP_NTZ): day number x 24
    # + hour-of-day — never a tz-sensitive cast
    hourly = events.groupBy(
        "event_type",
        (
            F.datediff(F.to_date("ts"), F.lit("1970-01-01")) * 24
            + F.hour("ts")
        ).cast("long").alias("hour_id"),
    ).agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("event_type").orderBy("hour_id")
    deltas = hourly.withColumn("jump", F.col("n") - F.lag("n").over(w))
    return (
        deltas.filter(F.col("jump").isNotNull())
        .orderBy(F.abs(F.col("jump")).desc(), "event_type", "hour_id")
        .limit(SPIKE_TOP_K)
        .select("event_type", "hour_id", "n", "jump")
    )


@query(
    "ts_max_drawdown",
    oracle="""
    WITH c AS (
      SELECT user_id, ts, event_id,
             CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents
      FROM events
    ), run AS (
      SELECT user_id, cents,
             MAX(cents) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS peak_cents
      FROM c
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           MAX(peak_cents) AS peak_cents,
           MAX(peak_cents - cents) AS max_drawdown_cents
    FROM run GROUP BY user_id
    """,
    tags=("timeseries", "window", "risk"),
)
def ts_max_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum drawdown per user series: the largest peak-to-trough drop
    of `value` in (ts, event_id) order — the risk/degradation metric for
    any monitored series (portfolio value, quality score over a training
    run, throughput). Integer cents end to end (DECIMAL cast before the
    x100), so the running max and the subtraction are exact and the hash
    is bit-stable; the (ts, event_id) order is total, so ties cannot
    reorder the prefix between engines.

    Scale shape: ONE shuffle partitions by user_id; the running max is a
    single window pass inside each partition (O(1) frame state — Spark
    computes an UNBOUNDED PRECEDING max incrementally), and the final
    rollup reuses the same partitioning, so it collapses map-side."""
    events = load_table(spark, sf_dir, "events")
    cents = F.expr("CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT)")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    run = events.select(
        "user_id",
        cents.alias("cents"),
        F.max(cents).over(w).alias("peak_cents"),
    )
    return run.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.max("peak_cents").alias("peak_cents"),
        F.max(F.col("peak_cents") - F.col("cents")).alias("max_drawdown_cents"),
    )


@query(
    "ts_burstiness",
    oracle="""
    WITH hourly AS (
      SELECT event_type,
             (date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) * 24
              + EXTRACT(hour FROM ts)) AS hour_id,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_hours,
           CAST(SUM(n) AS BIGINT) AS n_events,
           CAST((1000000 * (COUNT(*) * SUM(n * n) - SUM(n) * SUM(n)))
                // (COUNT(*) * SUM(n)) AS BIGINT) AS fano_e6
    FROM hourly GROUP BY event_type
    """,
    tags=("timeseries", "stats", "burstiness"),
)
def ts_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Burstiness (Fano factor) of each event stream: variance-to-mean
    ratio of hourly counts — ~1e6 (scaled) for a Poisson-like stream,
    far above it for bursty/batchy traffic, far below for rate-limited
    feeds. The number capacity planning and anomaly baselining start
    from. Exact integer identity: F = (m·Σn² − (Σn)²) / (m·Σn) over the
    hourly-count relation, emitted ×1e6 under integer division so both
    engines hash identically (no float variance accumulation).

    Scale shape: ONE partial-aggregable groupBy builds (event_type,
    hour_id) counts; the moments reduce over that bounded relation
    (types × hours, not raw events). Σn² needs int64 headroom —
    comfortable until an hour×type cell sees ~3e9 events; shard the
    hour key before that."""
    events = load_table(spark, sf_dir, "events")
    hourly = events.groupBy(
        "event_type",
        (
            F.datediff(F.to_date("ts"), F.lit("1970-01-01")) * 24
            + F.hour("ts")
        ).cast("long").alias("hour_id"),
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    return (
        hourly.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_hours"),
            F.sum("n").alias("n_events"),
            F.sum(F.col("n") * F.col("n")).alias("__s2"),
        )
        .select(
            "event_type", "n_hours",
            F.col("n_events").cast("long").alias("n_events"),
            F.expr(
                "(1000000 * (n_hours * __s2 - n_events * n_events))"
                " div (n_hours * n_events)"
            ).alias("fano_e6"),
        )
    )


@query(
    "ts_asof_join_nearest",
    oracle="""
    WITH purchases AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
    ),
    clicks AS (
      SELECT user_id, ts, value FROM events WHERE event_type = 'click'
    ),
    b AS (
      SELECT p.event_id, epoch_us(c.ts) AS us, c.value AS v
      FROM purchases p
      ASOF LEFT JOIN clicks c ON p.user_id = c.user_id AND c.ts <= p.ts
    ),
    f AS (
      SELECT p.event_id, epoch_us(c.ts) AS us, c.value AS v
      FROM purchases p
      ASOF LEFT JOIN clicks c ON p.user_id = c.user_id AND c.ts >= p.ts
    )
    SELECT p.event_id, p.user_id, epoch_us(p.ts) AS purchase_us,
           CASE WHEN f.us IS NULL THEN b.us
                WHEN b.us IS NULL THEN f.us
                WHEN epoch_us(p.ts) - b.us <= f.us - epoch_us(p.ts) THEN b.us
                ELSE f.us END AS click_us,
           CASE WHEN f.us IS NULL THEN b.v
                WHEN b.us IS NULL THEN f.v
                WHEN epoch_us(p.ts) - b.us <= f.us - epoch_us(p.ts) THEN b.v
                ELSE f.v END AS click_value
    FROM purchases p
    LEFT JOIN b ON b.event_id = p.event_id
    LEFT JOIN f ON f.event_id = p.event_id
    """,
    tags=("timeseries", "asof-join", "custom-operator"),
)
def ts_asof_join_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAREST as-of join: per purchase, the click with the smallest
    absolute time distance — ties break backward (the click at-or-before
    wins), completing the as-of family (backward / forward / nearest:
    sensor alignment and feature-join pipelines need all three). Composes
    the two union-and-carry passes of `_asof_union_carry` — both shuffle
    on the SAME (user_id) key, so the second window reuses the first's
    partitioning — and picks the nearer side with integer microsecond
    arithmetic (no float time math).

    At 100 TB: still two window passes over one co-partitioned union —
    no per-row lookups, no broadcast requirement, no range explosion."""
    events = load_table(spark, sf_dir, "events")
    b = _asof_union_carry(events, forward=False).select(
        "event_id", "user_id", "purchase_us",
        F.col("click_us").alias("b_us"), F.col("click_value").alias("b_v"),
    )
    f = _asof_union_carry(events, forward=True).select(
        F.col("event_id").alias("f_event_id"),
        F.col("click_us").alias("f_us"), F.col("click_value").alias("f_v"),
    )
    j = b.join(f, b["event_id"] == f["f_event_id"], "left")
    back_wins = (
        F.col("f_us").isNull()
        | (
            F.col("b_us").isNotNull()
            & (
                (F.col("purchase_us") - F.col("b_us"))
                <= (F.col("f_us") - F.col("purchase_us"))
            )
        )
    )
    return j.select(
        "event_id", "user_id", "purchase_us",
        F.when(back_wins, F.col("b_us")).otherwise(F.col("f_us")).alias("click_us"),
        F.when(back_wins, F.col("b_v")).otherwise(F.col("f_v")).alias("click_value"),
    )


@query(
    "ts_dau_wau_stickiness",
    oracle="""
    WITH du AS (
      SELECT DISTINCT date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day_id,
             user_id
      FROM events
    ),
    dau AS (SELECT day_id, CAST(COUNT(*) AS BIGINT) AS dau FROM du GROUP BY day_id),
    spread AS (
      SELECT du.day_id + o.off AS target_day, du.user_id
      FROM du, (SELECT unnest(range(0, 7)) AS off) o
    ),
    wau AS (
      SELECT target_day AS day_id,
             CAST(COUNT(DISTINCT user_id) AS BIGINT) AS wau
      FROM spread GROUP BY target_day
    )
    SELECT d.day_id, d.dau, w.wau,
           CAST((d.dau * 10000) // w.wau AS BIGINT) AS stickiness_e4
    FROM dau d JOIN wau w USING (day_id)
    """,
    tags=("timeseries", "engagement", "stickiness"),
)
def ts_dau_wau_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU/WAU stickiness per day: daily actives over trailing-7-day
    actives — the engagement ratio every product dashboard leads with
    (10000 = everyone active daily; low = a broad but occasional
    audience). The trailing distinct is computed by SPREADING each
    (day, user) row onto the 7 days it supports and counting distinct
    users per target day — a bounded x7 row expansion and one
    partial-aggregable distinct, instead of a per-day sliding-window
    re-scan of the event log. Integer basis points, bit-stable.

    At 100 TB: the event log collapses to the (day, user) relation FIRST
    (one distinct shuffle); everything after is x7 of that bounded
    relation, keyed by day."""
    events = load_table(spark, sf_dir, "events")
    du = events.select(
        F.datediff(F.to_date("ts"), F.lit("1970-01-01")).cast("long").alias("day_id"),
        "user_id",
    ).distinct()
    dau = du.groupBy("day_id").agg(F.count(F.lit(1)).cast("long").alias("dau"))
    spread = du.select(
        F.explode(
            F.sequence(F.col("day_id"), F.col("day_id") + 6)
        ).alias("day_id"),
        "user_id",
    )
    wau = spread.groupBy("day_id").agg(
        F.count_distinct("user_id").cast("long").alias("wau")
    )
    return dau.join(wau, "day_id").select(
        "day_id", "dau", "wau",
        F.expr("(dau * 10000) div wau").alias("stickiness_e4"),
    )


HOUR_US = 3_600_000_000
XCORR_MAX_LAG = 3


@query(
    "ts_cross_correlation",
    oracle=f"""
    WITH b AS (
      SELECT MIN(epoch_us(ts)) // {HOUR_US} AS lo,
             MAX(epoch_us(ts)) // {HOUR_US} AS hi FROM events
    ),
    hours AS (SELECT unnest(generate_series(lo, hi)) AS hr FROM b),
    x AS (
      SELECT epoch_us(ts) // {HOUR_US} AS hr, COUNT(*) AS n
      FROM events WHERE event_type = 'click' GROUP BY 1
    ),
    y AS (
      SELECT epoch_us(ts) // {HOUR_US} AS hr, COUNT(*) AS n
      FROM events WHERE event_type = 'purchase' GROUP BY 1
    ),
    s AS (
      SELECT hours.hr, COALESCE(x.n, 0) AS xs, COALESCE(y.n, 0) AS ys
      FROM hours LEFT JOIN x ON x.hr = hours.hr LEFT JOIN y ON y.hr = hours.hr
    ),
    a AS (
      SELECT hr, xs, unnest(generate_series(0, {XCORR_MAX_LAG})) AS lag FROM s
    )
    SELECT a.lag AS lag,
           CAST(COUNT(*) AS BIGINT) AS n_hours,
           CAST(SUM(a.xs) AS BIGINT) AS sum_x,
           CAST(SUM(t.ys) AS BIGINT) AS sum_y,
           CAST(SUM(CAST(a.xs * t.ys AS DECIMAL(38,0))) AS DOUBLE) AS sum_xy,
           CAST(SUM(CAST(a.xs * a.xs AS DECIMAL(38,0))) AS DOUBLE) AS sum_xx,
           CAST(SUM(CAST(t.ys * t.ys AS DECIMAL(38,0))) AS DOUBLE) AS sum_yy,
           CAST(COUNT(*) AS DOUBLE)
             * CAST(SUM(CAST(a.xs * t.ys AS DECIMAL(38,0))) AS DOUBLE)
             - CAST(SUM(a.xs) AS DOUBLE) * CAST(SUM(t.ys) AS DOUBLE)
             AS cov_num
    FROM a JOIN s t ON t.hr = a.hr + a.lag
    GROUP BY a.lag
    """,
    tags=("timeseries", "correlation", "gap-fill"),
)
def ts_cross_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lagged cross-correlation moments between two event streams: does
    click volume at hour t predict purchase volume at t+lag? Emits, per
    lag 0..{XCORR_MAX_LAG}, the EXACT integer moment sums (n, Σx, Σy,
    Σxy, Σx², Σy²) plus the covariance numerator n·Σxy − Σx·Σy — the
    attribution-lag diagnostic, left un-normalized on purpose: the
    Pearson divide-and-sqrt is one float op for the consumer, while the
    moments themselves stay bit-stable and MERGEABLE (two clusters'
    moment sums add, a correlation coefficient doesn't). Linear sums
    are exact BIGINT; product sums accumulate in DECIMAL(38,0) (int64
    overflows once an hour holds ~1e9 events) and surface as DOUBLE,
    with cov_num assembled in the same three IEEE ops on both engines.

    Scale shape: both series aggregate to hourly counts first (partial-
    aggregable, key space = hours, not events), the zero-filled spine
    explodes off a 1-row bounds aggregate, lags explode 4-wide on the
    bounded hourly relation, and the lag alignment is an EQUI-join on
    the shifted hour key — never a window over raw events."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.expr(f"unix_micros(CAST(ts AS TIMESTAMP)) div {HOUR_US}").alias("hr")
    )
    bounds = ev.agg(F.min("hr").alias("lo"), F.max("hr").alias("hi"))
    hours = bounds.select(F.explode(F.sequence("lo", "hi")).alias("hr"))
    x = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("hr").agg(F.count(F.lit(1)).alias("xn"))
    )
    y = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("hr").agg(F.count(F.lit(1)).alias("yn"))
    )
    s = (
        hours.join(x, "hr", "left").join(y, "hr", "left")
        .select(
            "hr",
            F.coalesce("xn", F.lit(0)).alias("xs"),
            F.coalesce("yn", F.lit(0)).alias("ys"),
        )
    )
    a = s.select(
        "hr", "xs",
        F.explode(F.sequence(F.lit(0), F.lit(XCORR_MAX_LAG))).alias("lag"),
    )
    t = s.select(F.col("hr").alias("t_hr"), "ys")
    joined = a.join(t, F.col("t_hr") == F.col("hr") + F.col("lag"))
    # product sums accumulate in DECIMAL(38,0): an hour holding 1e9
    # events contributes ~1e18 per product term, so int64 would overflow
    # right at the target scale; linear sums keep int64's ample headroom
    agg = joined.groupBy("lag").agg(
        F.count(F.lit(1)).cast("long").alias("n_hours"),
        F.sum("xs").cast("long").alias("sum_x"),
        F.sum("ys").cast("long").alias("sum_y"),
        F.sum((F.col("xs") * F.col("ys")).cast("decimal(38,0)"))
        .cast("double").alias("sum_xy"),
        F.sum((F.col("xs") * F.col("xs")).cast("decimal(38,0)"))
        .cast("double").alias("sum_xx"),
        F.sum((F.col("ys") * F.col("ys")).cast("decimal(38,0)"))
        .cast("double").alias("sum_yy"),
    )
    return agg.select(
        F.col("lag").cast("long").alias("lag"),
        "n_hours", "sum_x", "sum_y", "sum_xy", "sum_xx", "sum_yy",
        (
            F.col("n_hours").cast("double") * F.col("sum_xy")
            - F.col("sum_x").cast("double") * F.col("sum_y").cast("double")
        ).alias("cov_num"),
    )


@query(
    "ts_anomaly_mad",
    oracle="""
    WITH hourly AS (
      SELECT event_type,
             CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) * 24
                  + EXTRACT(hour FROM ts) AS BIGINT) AS hour_id,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    ),
    ranked AS (
      SELECT event_type, hour_id, n,
             row_number() OVER (PARTITION BY event_type ORDER BY n, hour_id) AS rn,
             COUNT(*) OVER (PARTITION BY event_type) AS cnt
      FROM hourly
    ),
    med AS (
      SELECT event_type,
             CAST(CASE WHEN MAX(cnt) % 2 = 1 THEN 2 * SUM(n)
                       ELSE SUM(n) END AS BIGINT) AS median_2x
      FROM ranked WHERE rn IN ((cnt + 1) // 2, (cnt + 2) // 2)
      GROUP BY event_type
    ),
    dev AS (
      SELECT h.event_type, h.hour_id, h.n,
             ABS(2 * h.n - m.median_2x) AS dev2x
      FROM hourly h JOIN med m ON h.event_type = m.event_type
    ),
    dranked AS (
      SELECT event_type, dev2x,
             row_number() OVER (PARTITION BY event_type ORDER BY dev2x, hour_id) AS rn,
             COUNT(*) OVER (PARTITION BY event_type) AS cnt
      FROM dev
    ),
    mad AS (
      SELECT event_type,
             CAST(CASE WHEN MAX(cnt) % 2 = 1 THEN 2 * SUM(dev2x)
                       ELSE SUM(dev2x) END AS BIGINT) AS mad_4x
      FROM dranked WHERE rn IN ((cnt + 1) // 2, (cnt + 2) // 2)
      GROUP BY event_type
    )
    SELECT d.event_type, CAST(COUNT(*) AS BIGINT) AS n_hours,
           MAX(m.median_2x) AS median_2x, MAX(a.mad_4x) AS mad_4x,
           CAST(SUM(CASE WHEN 2 * d.dev2x > 3 * a.mad_4x THEN 1 ELSE 0 END)
                AS BIGINT) AS n_anomalies
    FROM dev d
    JOIN med m ON d.event_type = m.event_type
    JOIN mad a ON d.event_type = a.event_type
    GROUP BY d.event_type
    """,
    tags=("timeseries", "anomaly", "robust-stats"),
)
def ts_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust volume-anomaly screen per event type: an hour is anomalous
    when |count − median| > 3·MAD over the type's hourly distribution —
    the heavy-tail-safe companion of ts_anomaly_zscore (a burst inflates
    a stddev yardstick and hides itself; MAD's breakdown point is 50%).
    All integer via the text_length_mad_outliers scaling: median×2,
    MAD×4, cutoff 2·dev2x > 3·mad_4x — no halving, no floats,
    bit-identical engines.

    Scale shape: the raw stream pre-aggregates to (type, hour) counts
    (the only shuffle that sees event volume), then two per-type rank
    windows over that bounded relation (the exact-median idiom, unique
    hour_id tiebreakers) and two broadcast-sized scalar joins; the rollup
    lands on the event-type key space."""
    events = load_table(spark, sf_dir, "events")
    hourly = (
        events.select(
            "event_type",
            (
                F.datediff(F.to_date("ts"), F.lit("1970-01-01")) * 24
                + F.hour("ts")
            ).cast("long").alias("hour_id"),
        )
        .groupBy("event_type", "hour_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )

    def _middle_sum(df: DataFrame, col: str, out: str) -> DataFrame:
        w = Window.partitionBy("event_type").orderBy(col, "hour_id")
        ranked = df.select(
            "event_type", col,
            F.row_number().over(w).alias("rn"),
            F.count(F.lit(1)).over(
                Window.partitionBy("event_type")
            ).alias("cnt"),
        )
        mid = ranked.filter(
            (F.col("rn") == F.expr("(cnt + 1) div 2"))
            | (F.col("rn") == F.expr("(cnt + 2) div 2"))
        )
        return mid.groupBy("event_type").agg(
            F.when(
                F.max("cnt") % 2 == 1, 2 * F.sum(col)
            ).otherwise(F.sum(col)).cast("long").alias(out)
        )

    med = _middle_sum(hourly, "n", "median_2x")
    dev = hourly.join(F.broadcast(med), "event_type").select(
        "event_type", "hour_id", "n",
        F.abs(2 * F.col("n") - F.col("median_2x")).alias("dev2x"),
    )
    mad = _middle_sum(dev, "dev2x", "mad_4x")
    return (
        dev.join(F.broadcast(med), "event_type")
        .join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_hours"),
            F.max("median_2x").alias("median_2x"),
            F.max("mad_4x").alias("mad_4x"),
            F.sum(
                F.when(2 * F.col("dev2x") > 3 * F.col("mad_4x"), 1).otherwise(0)
            ).cast("long").alias("n_anomalies"),
        )
    )


ASOF_TOLERANCE_US = 3_600_000_000  # 1 hour — pandas merge_asof's `tolerance`


@query(
    "ts_asof_join_tolerance",
    oracle=f"""
    WITH purchases AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
    ),
    clicks AS (
      SELECT user_id, ts, value FROM events WHERE event_type = 'click'
    ),
    b AS (
      SELECT p.event_id, p.user_id, epoch_us(p.ts) AS purchase_us,
             epoch_us(c.ts) AS us, c.value AS v
      FROM purchases p
      ASOF LEFT JOIN clicks c ON p.user_id = c.user_id AND c.ts <= p.ts
    )
    SELECT event_id, user_id, purchase_us,
           CASE WHEN us IS NOT NULL
                 AND purchase_us - us <= {ASOF_TOLERANCE_US}
                THEN us END AS click_us,
           CASE WHEN us IS NOT NULL
                 AND purchase_us - us <= {ASOF_TOLERANCE_US}
                THEN v END AS click_value
    FROM b
    """,
    tags=("timeseries", "asof-join", "custom-operator"),
)
def ts_asof_join_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward as-of join with a tolerance window (pandas merge_asof's
    `tolerance`, QuestDB/kdb's windowed asof): the latest click at or
    before each purchase counts only within 1 hour — beyond that the
    match is stale and the row keeps NULLs rather than attributing a
    purchase to last week's click. Completes the as-of family
    (backward / forward / nearest / tolerance).

    Scale shape: identical to ts_asof_join — ONE union-and-carry window
    pass per (user_id, ts); the tolerance is a scalar post-filter on the
    carried timestamp, adding zero shuffles (contrast with a range join,
    which would pay a pair expansion to express the same bound)."""
    events = load_table(spark, sf_dir, "events")
    carried = _asof_union_carry(events, forward=False)
    within = F.col("click_us").isNotNull() & (
        (F.col("purchase_us") - F.col("click_us")) <= ASOF_TOLERANCE_US
    )
    return carried.select(
        "event_id", "user_id", "purchase_us",
        F.when(within, F.col("click_us")).alias("click_us"),
        F.when(within, F.col("click_value")).alias("click_value"),
    )


@query(
    "ts_concurrency_peak",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts, event_id,
             CASE WHEN LAG(ts) OVER w IS NULL
                       OR epoch_us(ts) - epoch_us(LAG(ts) OVER w) > 1800000000
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sessions AS (
      SELECT user_id,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid,
             ts
      FROM flagged
    ),
    spans AS (
      SELECT MIN(ts) AS s, MAX(ts) AS e FROM sessions GROUP BY user_id, sid
    ),
    deltas AS (
      SELECT CAST(s AS DATE) AS day, s AS t, 1 AS delta FROM spans
      UNION ALL
      SELECT CAST(e AS DATE) AS day, e AS t, -1 AS delta FROM spans
    ),
    day_runs AS (
      SELECT day, MAX(run) AS max_run FROM (
        SELECT day, SUM(delta) OVER (PARTITION BY day ORDER BY t, delta DESC)
               AS run
        FROM deltas
      ) GROUP BY day
    ),
    carries AS (
      SELECT CAST(u.d AS DATE) AS day, COUNT(*) AS carry_in
      FROM spans, UNNEST(generate_series(CAST(s AS DATE) + 1, CAST(e AS DATE),
                                         INTERVAL 1 DAY)) AS u(d)
      WHERE CAST(e AS DATE) > CAST(s AS DATE)
      GROUP BY 1
    )
    SELECT strftime(CAST(COALESCE(r.day, c.day) AS DATE), '%Y-%m-%d') AS day,
           CAST(COALESCE(c.carry_in, 0) AS BIGINT) AS carry_in,
           CAST(COALESCE(c.carry_in, 0)
                + GREATEST(0, COALESCE(r.max_run, 0)) AS BIGINT)
             AS peak_concurrent
    FROM day_runs r FULL JOIN carries c ON r.day = c.day
    """,
    tags=("timeseries", "sessionization", "sweep-line"),
)
def ts_concurrency_peak(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrent sessions per calendar day — the capacity-planning
    gauge — as a DISTRIBUTED sweep-line: sessionize (30-min gap), emit
    +1/−1 boundary deltas, running-sum them inside PER-DAY windows (never
    one global window — the partition key is the day, so the sweep
    parallelizes across the time span exactly like ts_anomaly_zscore's
    chunks), and add a cross-midnight carry: sessions spanning a midnight
    contribute an open-at-day-start count computed by exploding each
    multi-day session into the day boundaries it crosses (bounded by the
    session's day span, not the corpus). Peak(day) = carry_in +
    max(0, max running delta) — the max(0,·) covers days whose activity is
    only session ENDS, where the day-start concurrency IS the peak.

    Tie semantics are deterministic on both engines: the running sum
    orders by (t, delta DESC) under the default RANGE frame, so equal
    (t, delta) rows are peers sharing one value — starts count before ends
    at the same instant (touching sessions are concurrent) and the result
    is independent of physical row order. All-integer arithmetic.
    """
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # the running session-id sum must share w's (ts, event_id) tie-break:
    # duplicate (user, ts) rows otherwise join sessions nondeterministically
    # (derived sf1 data replicates events 10x at identical timestamps)
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    gap_us = _us("ts") - F.unix_micros(F.lag("ts").over(w).cast("timestamp"))
    flagged = events.select(
        "user_id", "ts", "event_id",
        F.when(F.lag("ts").over(w).isNull() | (gap_us > 1_800_000_000), 1)
        .otherwise(0)
        .alias("new_session"),
    )
    spans = (
        flagged.withColumn("sid", F.sum("new_session").over(wrun))
        .groupBy("user_id", "sid")
        .agg(F.min("ts").alias("s"), F.max("ts").alias("e"))
        # three consumers (two delta branches + the carry explode) — lazy
        # localCheckpoint truncates the plan so the corpus is scanned and
        # sessionized ONCE, not three times (RDD blocks, never the
        # CacheManager; downstream joins are small day-keyed aggregates,
        # so the missing size stats cost nothing — the r10 rule)
        .localCheckpoint(eager=False)
    )
    deltas = spans.select(
        F.to_date("s").alias("day"), F.col("s").alias("t"), F.lit(1).alias("delta")
    ).unionByName(
        spans.select(
            F.to_date("e").alias("day"), F.col("e").alias("t"),
            F.lit(-1).alias("delta"),
        )
    )
    # default frame with an ORDER BY = RANGE UNBOUNDED..CURRENT: peers
    # (equal t AND delta) share one running value on both engines
    sweep = Window.partitionBy("day").orderBy(F.asc("t"), F.desc("delta"))
    day_runs = (
        deltas.withColumn("run", F.sum("delta").over(sweep))
        .groupBy("day")
        .agg(F.max("run").alias("max_run"))
    )
    carries = (
        spans.filter(F.to_date("e") > F.to_date("s"))
        .select(
            F.explode(
                F.sequence(F.date_add(F.to_date("s"), 1), F.to_date("e"))
            ).alias("day")
        )
        .groupBy("day")
        .agg(F.count(F.lit(1)).alias("carry_in"))
    )
    return day_runs.join(carries, "day", "full_outer").select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.coalesce("carry_in", F.lit(0)).cast("long").alias("carry_in"),
        (
            F.coalesce("carry_in", F.lit(0))
            + F.greatest(F.lit(0), F.coalesce("max_run", F.lit(0)))
        ).cast("long").alias("peak_concurrent"),
    )


@query(
    "ts_time_to_convert",
    oracle="""
    WITH fv AS (
      SELECT user_id, MIN(epoch_us(ts)) AS v_us
      FROM events WHERE event_type = 'view' GROUP BY user_id
    ),
    fp AS (
      SELECT e.user_id, MIN(epoch_us(e.ts)) AS p_us
      FROM events e JOIN fv ON fv.user_id = e.user_id
      WHERE e.event_type = 'purchase' AND epoch_us(e.ts) >= fv.v_us
      GROUP BY e.user_id
    ),
    l AS (
      SELECT fv.v_us // 86400000000 AS cohort_day_id,
             (fp.p_us - fv.v_us) // 3600000000 AS lat_h
      FROM fv JOIN fp ON fp.user_id = fv.user_id
    ),
    c AS (SELECT cohort_day_id, lat_h, COUNT(*) AS n FROM l GROUP BY 1, 2),
    t AS (
      SELECT cohort_day_id, lat_h,
             SUM(n) OVER (PARTITION BY cohort_day_id ORDER BY lat_h) AS cum,
             SUM(n) OVER (PARTITION BY cohort_day_id) AS tot
      FROM c
    )
    SELECT cohort_day_id,
           CAST(MAX(tot) AS BIGINT) AS n_converted,
           MIN(lat_h) AS min_h,
           MIN(CASE WHEN cum >= (tot + 1) // 2 THEN lat_h END) AS p50_h,
           MIN(CASE WHEN cum >= (9 * tot + 9) // 10 THEN lat_h END) AS p90_h,
           MAX(lat_h) AS max_h
    FROM t GROUP BY cohort_day_id
    """,
    tags=("timeseries", "conversion", "percentile"),
)
def ts_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert latency distribution per first-view cohort day: for
    every user, hours from their FIRST view to their first purchase at or
    after it, rolled up by the cohort day of that first view (exact
    min/p50/p90/max whole hours) — the activation-latency report next to
    ts_funnel's stage-attainment counts. Cohort ids are integer days since
    epoch: no timezone arithmetic anywhere.

    Scale shape: two user-keyed aggregations (first view, then first
    qualifying purchase via one co-partitioned join — AQE reuses the
    user_id partitioning), then the agg_exact_percentiles idiom over a
    (cohort, hour) COUNT relation bounded by value cardinality — never a
    per-cohort sort of raw latencies. All-integer rank arithmetic."""
    events = load_table(spark, sf_dir, "events")
    fv = (
        events.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min(_us("ts")).alias("v_us"))
    )
    fp = (
        events.filter(F.col("event_type") == "purchase")
        .select("user_id", _us("ts").alias("p_us"))
        .join(fv, "user_id")
        .filter(F.col("p_us") >= F.col("v_us"))
        .groupBy("user_id")
        .agg(F.min("p_us").alias("p_us"), F.first("v_us").alias("v_us"))
    )
    latencies = fp.select(
        F.expr("v_us div 86400000000").alias("cohort_day_id"),
        F.expr("(p_us - v_us) div 3600000000").alias("lat_h"),
    )
    c = latencies.groupBy("cohort_day_id", "lat_h").agg(
        F.count(F.lit(1)).alias("n")
    )
    wc = Window.partitionBy("cohort_day_id").orderBy("lat_h")
    wt = Window.partitionBy("cohort_day_id")
    t = c.select(
        "cohort_day_id", "lat_h",
        F.sum("n").over(wc).alias("cum"),
        F.sum("n").over(wt).alias("tot"),
    )
    return t.groupBy("cohort_day_id").agg(
        F.max("tot").cast("long").alias("n_converted"),
        F.min("lat_h").alias("min_h"),
        F.min(
            F.when(F.col("cum") >= F.expr("(tot + 1) div 2"), F.col("lat_h"))
        ).alias("p50_h"),
        F.min(
            F.when(F.col("cum") >= F.expr("(9 * tot + 9) div 10"), F.col("lat_h"))
        ).alias("p90_h"),
        F.max("lat_h").alias("max_h"),
    )

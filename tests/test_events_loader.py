"""Regression tests for the events loader's ts-encoding tolerance.

Driver testdata regenerations have shipped ``events.ts`` as parquet
TIMESTAMP(NANOS) (round 1-2) and as ``timestamp[us]`` (round 3+). The loader
must normalize both to a microsecond TIMESTAMP_NTZ so a future regeneration
cannot silently break every events consumer again (round-3 verdict: one
hard-coded assumption took down 11/95 queries).
"""

from __future__ import annotations

import datetime
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from denali_spark.engine.tables import load_table

UTC = datetime.timezone.utc

# Timestamps chosen so nanos→micros truncation is visible: the second row has
# sub-microsecond nanos that must be dropped, not rounded.
ROWS = [
    (1, 1704067200_000_000_123, 10, "view", 1.5, "{}"),
    (2, 1704070800_123_456_789, 11, "click", 2.5, "{}"),
    (3, 1704074400_999_999_999, 10, "view", 3.5, "{}"),
]
EXPECTED_MICROS = [1704067200_000_000, 1704070800_123_456, 1704074400_999_999]


def _write_events(path: str, ts_type: pa.DataType) -> None:
    if pa.types.is_timestamp(ts_type):
        unit = ts_type.unit
        div = {"ns": 1, "us": 1_000, "ms": 1_000_000}[unit]
        ts_arr = pa.array([r[1] // div for r in ROWS], type=pa.int64()).cast(ts_type)
    else:
        ts_arr = pa.array([r[1] for r in ROWS], type=ts_type)
    table = pa.table(
        {
            "event_id": pa.array([r[0] for r in ROWS], type=pa.int64()),
            "ts": ts_arr,
            "user_id": pa.array([r[2] for r in ROWS], type=pa.int64()),
            "event_type": pa.array([r[3] for r in ROWS], type=pa.string()),
            "value": pa.array([r[4] for r in ROWS], type=pa.float64()),
            "props": pa.array([r[5] for r in ROWS], type=pa.string()),
        }
    )
    pq.write_table(table, os.path.join(path, "events.parquet"))


@pytest.mark.parametrize(
    "ts_type,label",
    [
        (pa.timestamp("ns"), "nanos"),  # pyarrow writes TIMESTAMP(NANOS)
        (pa.timestamp("us"), "micros"),  # current testdata shape
        (pa.timestamp("ms"), "millis"),  # future-proofing: any timestamp unit
    ],
)
def test_load_events_ts_encodings(spark, tmp_path, ts_type, label):
    sf_dir = str(tmp_path / label)
    os.makedirs(sf_dir)
    _write_events(sf_dir, ts_type)

    df = load_table(spark, sf_dir, "events")
    assert df.schema["ts"].dataType.typeName() == "timestamp_ntz"

    got = {r.event_id: r.ts for r in df.collect()}
    for (event_id, *_), micros in zip(ROWS, EXPECTED_MICROS):
        expect = datetime.datetime.fromtimestamp(micros / 1e6, tz=UTC).replace(
            tzinfo=None
        )
        if label == "millis":
            expect = expect.replace(microsecond=(micros // 1000 % 1000) * 1000)
        assert got[event_id] == expect, (label, event_id)


def test_load_events_real_testdata(spark):
    """The actual driver testdata must load and yield TIMESTAMP_NTZ."""
    df = load_table(spark, "/root/testdata/sf0.001", "events")
    assert df.schema["ts"].dataType.typeName() == "timestamp_ntz"
    assert df.limit(5).count() > 0

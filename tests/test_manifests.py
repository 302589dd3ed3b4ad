"""Spec-shaped Avro manifest round-trip tests (round-2 task #2 / round-3
VERDICT item 7): the two-level manifest-list → manifest → entry layout must
reproduce the internal entry dicts exactly, including stats, partitions,
MoR delete metadata, and sequence numbers — and legacy JSON lists must stay
readable through the same read path."""

from __future__ import annotations

import json
import os

from denali_spark.sources.manifests import (
    DATA_FILE_SCHEMA,
    MANIFEST_ENTRY_SCHEMA,
    data_file_to_entry,
    entry_to_data_file,
    read_manifest_list,
    write_manifest_list,
)

ENTRIES = [
    {  # plain data file with stats
        "path": "/wh/t/data/a.parquet",
        "file-format": "parquet",
        "record-count": 100,
        "file-size-bytes": 2048,
        "sequence-number": 3,
        "schema-id": 1,
        "stats": {
            "id": {"min": 1, "max": 100, "null-count": 0},
            "name": {"min": "aaa", "max": "zzz", "null-count": 2},
            "price": {"min": -1.5, "max": 99.25, "null-count": 0},
            "day": {"min": "2024-01-01", "max": "2024-03-31", "null-count": 0},
        },
    },
    {  # partitioned data file, no stats
        "path": "/wh/t/data/m=5/b.orc",
        "file-format": "orc",
        "record-count": 7,
        "file-size-bytes": 512,
        "sequence-number": 4,
        "partition": {"m": 5, "region": "emea"},
    },
    {  # position-delete file
        "path": "/wh/t/deletes/pd.parquet",
        "content": "position-deletes",
        "file-format": "parquet",
        "record-count": 4,
        "file-size-bytes": 256,
        "sequence-number": 5,
    },
    {  # equality-delete file
        "path": "/wh/t/deletes/eq.parquet",
        "content": "equality-deletes",
        "file-format": "parquet",
        "record-count": 2,
        "file-size-bytes": 128,
        "sequence-number": 5,
        "equality-field-ids": [1, 3],
        "equality-columns": ["id", "day"],
    },
]


def test_roundtrip_entries_exact(tmp_path):
    loc = write_manifest_list(str(tmp_path / "metadata"), 777, [dict(e) for e in ENTRIES])
    assert loc.endswith("snap-777.manifest-list.avro")
    got = read_manifest_list(loc)
    assert sorted(got, key=lambda e: e["path"]) == sorted(
        [dict(e) for e in ENTRIES], key=lambda e: e["path"]
    )


def test_data_and_delete_manifests_are_separate(tmp_path):
    loc = write_manifest_list(str(tmp_path / "m"), 1, [dict(e) for e in ENTRIES])
    from denali_spark.sources.avro_ocf import read_ocf

    schema, rows = read_ocf(loc)
    names = [f["name"] for f in schema["fields"]]
    mfs = [dict(zip(names, r)) for r in rows]
    assert [m["content"] for m in mfs] == [0, 1]
    assert mfs[0]["added_files_count"] == 2 and mfs[1]["added_files_count"] == 2
    assert mfs[1]["sequence_number"] == 5 and mfs[1]["min_sequence_number"] == 5
    # manifest lengths are real file sizes
    for m in mfs:
        assert os.path.getsize(m["manifest_path"]) == m["manifest_length"]


def test_empty_snapshot_has_empty_data_manifest(tmp_path):
    loc = write_manifest_list(str(tmp_path / "m"), 9, [])
    assert read_manifest_list(loc) == []


def test_single_entry_mapping_is_spec_shaped():
    rec = entry_to_data_file(ENTRIES[0])
    assert rec["file_path"] == ENTRIES[0]["path"]
    assert rec["file_format"] == "PARQUET"
    assert rec["content"] == 0
    assert json.loads(rec["lower_bounds"]["id"]) == 1
    assert rec["null_value_counts"]["name"] == 2
    back = data_file_to_entry(rec, 3)
    assert back == ENTRIES[0]
    # schema sanity: every record field name is spec or x_-prefixed
    spec_names = {
        "content", "file_path", "file_format", "partition", "record_count",
        "file_size_in_bytes", "null_value_counts", "lower_bounds",
        "upper_bounds", "equality_ids",
    }
    for f in DATA_FILE_SCHEMA["fields"]:
        assert f["name"] in spec_names or f["name"].startswith("x_")
    assert [f["name"] for f in MANIFEST_ENTRY_SCHEMA["fields"]] == [
        "status", "snapshot_id", "sequence_number", "file_sequence_number",
        "data_file",
    ]


def test_legacy_json_manifest_list_still_reads(tmp_path):
    from denali_spark.sources.catalog_io import SparkCatalogIO

    path = str(tmp_path / "snap-1.manifest-list.json")
    with open(path, "w") as f:
        json.dump({"manifest-format": "json", "files": [dict(e) for e in ENTRIES]}, f)
    io = SparkCatalogIO.__new__(SparkCatalogIO)
    got = io._manifest_entries(path)
    assert got == [dict(e) for e in ENTRIES]

"""Puffin files + 64-bit Roaring bitmaps: Iceberg V3 deletion vectors.

The reference's REST contract (routes/openapi.yml ContentFile variants) and
the Iceberg V3 table spec define *deletion vectors*: instead of a parquet
file of (file_path, pos) rows per delete commit, the positions deleted from
one data file are stored as a serialized Roaring bitmap blob inside a
Puffin file, and the manifest entry records `referenced_data_file` +
`content_offset`/`content_size_in_bytes` so readers fetch exactly one blob
per data file. At 100 TB this is the difference between a delete side that
grows O(commits × files) and one that stays one bitmap per touched file —
bitmaps are mergeable, so the table never holds more than one DV per data
file (`sources/mor.py:delete_where_dv` enforces the V3 "new DV must replace
the previous DV" rule).

Both formats here are public specs implemented from scratch:

Puffin (Iceberg puffin-spec):
    Magic = 50 46 41 31 ("PFA1")
    file  = Magic, Blob*, Footer
    footer = Magic, FooterPayload (UTF-8 JSON), FooterPayloadSize (i32 LE),
             Flags (4 bytes; bit 0 of byte 0 = payload-compressed — we
             always write 0), Magic
    FooterPayload = {"blobs": [{type, fields, snapshot-id, sequence-number,
                    offset, length, properties}, ...], "properties": {...}}

Deletion-vector blob (`deletion-vector-v1`, Iceberg V3 spec):
    i32 BE length of (magic + vector)
    magic D1 D3 39 64
    64-bit Roaring bitmap, "portable" serialization
    i32 BE CRC-32 of (magic + vector)
    BlobMetadata.properties carries {"referenced-data-file": ...,
    "cardinality": ...}.

Roaring "portable" 64-bit format (RoaringFormatSpec):
    u64 LE bucket count, then per bucket (ascending): u32 LE high key +
    standard 32-bit roaring serialization. The 32-bit stream is
    cookie 12346 (no runs; what we write) or 12347 (runs; read-supported),
    descriptive header of (u16 key, u16 cardinality-1) pairs, an offset
    header, then array (u16 LE values), bitmap (1024 u64 LE words) or run
    (u16 count, (u16 start, u16 len-1)*) containers.

No external library is used (pyroaring is absent from the environment);
encode/decode are exercised container-by-container in tests/test_dv.py.
"""

from __future__ import annotations

import json
import struct
import zlib

PUFFIN_MAGIC = b"PFA1"
DV_MAGIC = bytes([0xD1, 0xD3, 0x39, 0x64])
DELETION_VECTOR_V1 = "deletion-vector-v1"

_SERIAL_COOKIE_NO_RUN = 12346
_SERIAL_COOKIE_RUN = 12347
_NO_OFFSET_THRESHOLD = 4
_ARRAY_MAX = 4096  # cardinality above this → bitmap container


# --- 32-bit roaring ---------------------------------------------------------


def _serialize_roaring32(values_by_key: dict[int, list[int]]) -> bytes:
    """Standard-format 32-bit roaring stream from {container_key: sorted
    low-16 values}. Writes the no-run cookie (array/bitmap containers only —
    the spec does not require run optimization of writers)."""
    keys = sorted(values_by_key)
    n = len(keys)
    out = bytearray()
    out += struct.pack("<I", _SERIAL_COOKIE_NO_RUN)
    out += struct.pack("<I", n)
    for k in keys:
        out += struct.pack("<HH", k, len(values_by_key[k]) - 1)
    # offset header (always present with the no-run cookie)
    header_len = 4 + 4 + 4 * n + 4 * n
    off = header_len
    offsets = []
    for k in keys:
        offsets.append(off)
        card = len(values_by_key[k])
        off += 8192 if card > _ARRAY_MAX else 2 * card
    for o in offsets:
        out += struct.pack("<I", o)
    for k in keys:
        vals = values_by_key[k]
        if len(vals) > _ARRAY_MAX:
            words = [0] * 1024
            for v in vals:
                words[v >> 6] |= 1 << (v & 63)
            out += struct.pack("<1024Q", *words)
        else:
            out += struct.pack(f"<{len(vals)}H", *vals)
    return bytes(out)


def _deserialize_roaring32(buf: bytes, pos: int) -> tuple[list[int], int]:
    """Decode one 32-bit roaring stream at `pos`; returns (sorted values,
    next position). Handles array, bitmap AND run containers."""
    (cookie32,) = struct.unpack_from("<I", buf, pos)
    cookie = cookie32 & 0xFFFF
    if cookie == _SERIAL_COOKIE_RUN:
        n = (cookie32 >> 16) + 1
        pos += 4
        run_flag_bytes = (n + 7) // 8
        run_flags = buf[pos:pos + run_flag_bytes]
        pos += run_flag_bytes
        has_offsets = n >= _NO_OFFSET_THRESHOLD
    elif cookie == _SERIAL_COOKIE_NO_RUN:
        pos += 4
        (n,) = struct.unpack_from("<I", buf, pos)
        pos += 4
        run_flags = b"\x00" * ((n + 7) // 8)
        has_offsets = True
    else:
        raise ValueError(f"not a roaring bitmap (cookie {cookie})")
    keys_cards = []
    for i in range(n):
        k, cm1 = struct.unpack_from("<HH", buf, pos)
        pos += 4
        keys_cards.append((k, cm1 + 1))
    if has_offsets:
        pos += 4 * n  # offsets are redundant for a sequential read
    values: list[int] = []
    for i, (k, card) in enumerate(keys_cards):
        base = k << 16
        is_run = bool(run_flags[i // 8] & (1 << (i % 8)))
        if is_run:
            (n_runs,) = struct.unpack_from("<H", buf, pos)
            pos += 2
            for _ in range(n_runs):
                start, lm1 = struct.unpack_from("<HH", buf, pos)
                pos += 4
                values.extend(range(base + start, base + start + lm1 + 1))
        elif card > _ARRAY_MAX:
            words = struct.unpack_from("<1024Q", buf, pos)
            pos += 8192
            for wi, w in enumerate(words):
                while w:
                    b = w & -w
                    values.append(base + (wi << 6) + b.bit_length() - 1)
                    w ^= b
        else:
            vals = struct.unpack_from(f"<{card}H", buf, pos)
            pos += 2 * card
            values.extend(base + v for v in vals)
    return values, pos


# --- 64-bit roaring (portable) ---------------------------------------------


def serialize_roaring64(positions) -> bytes:
    """Portable-format 64-bit roaring bitmap from an iterable of non-negative
    ints (need not be sorted or unique)."""
    buckets: dict[int, dict[int, list[int]]] = {}
    for p in positions:
        if p < 0 or p > 0xFFFFFFFFFFFFFFFF:
            raise ValueError(f"position out of u64 range: {p}")
        buckets.setdefault(p >> 32, {}).setdefault((p >> 16) & 0xFFFF, []).append(
            p & 0xFFFF
        )
    out = bytearray(struct.pack("<Q", len(buckets)))
    for high in sorted(buckets):
        by_key = {
            k: sorted(set(v)) for k, v in buckets[high].items()
        }
        out += struct.pack("<I", high)
        out += _serialize_roaring32(by_key)
    return bytes(out)


def deserialize_roaring64(buf: bytes) -> list[int]:
    """Sorted positions from a portable-format 64-bit roaring bitmap."""
    (n_buckets,) = struct.unpack_from("<Q", buf, 0)
    pos = 8
    out: list[int] = []
    for _ in range(n_buckets):
        (high,) = struct.unpack_from("<I", buf, pos)
        pos += 4
        vals, pos = _deserialize_roaring32(buf, pos)
        base = high << 32
        out.extend(base + v for v in vals)
    if pos != len(buf):
        raise ValueError(f"trailing bytes after bitmap: {len(buf) - pos}")
    return out


# --- deletion-vector blob ---------------------------------------------------


def encode_dv_blob(positions) -> tuple[bytes, int]:
    """(blob bytes, cardinality) for a deletion-vector-v1 blob: BE length
    prefix, DV magic, portable roaring64, BE CRC-32 of magic+vector."""
    uniq = sorted(set(positions))
    vec = serialize_roaring64(uniq)
    body = DV_MAGIC + vec
    blob = struct.pack(">I", len(body)) + body + struct.pack(">I", zlib.crc32(body))
    return blob, len(uniq)


def decode_dv_blob(blob: bytes) -> list[int]:
    """Positions from a deletion-vector-v1 blob; verifies magic and CRC."""
    (length,) = struct.unpack_from(">I", blob, 0)
    body = blob[4:4 + length]
    if len(body) != length:
        raise ValueError("deletion vector blob truncated")
    if body[:4] != DV_MAGIC:
        raise ValueError("bad deletion vector magic")
    (crc,) = struct.unpack_from(">I", blob, 4 + length)
    if zlib.crc32(body) != crc:
        raise ValueError("deletion vector CRC mismatch")
    return deserialize_roaring64(body[4:])


# --- puffin container -------------------------------------------------------


def write_puffin(path: str, blobs: list[dict], properties: dict | None = None) -> list[dict]:
    """Write a Puffin file. Each blob dict: {"type": ..., "data": bytes,
    optional "fields", "snapshot-id", "sequence-number", "properties"}.
    Returns the footer's BlobMetadata list (with resolved offset/length) in
    input order, for the caller to turn into manifest entries."""
    metas = []
    with open(path, "wb") as f:
        f.write(PUFFIN_MAGIC)
        off = 4
        for b in blobs:
            data = b["data"]
            meta = {
                "type": b["type"],
                "fields": b.get("fields", []),
                "snapshot-id": b.get("snapshot-id", -1),
                "sequence-number": b.get("sequence-number", -1),
                "offset": off,
                "length": len(data),
            }
            if b.get("properties"):
                meta["properties"] = b["properties"]
            metas.append(meta)
            f.write(data)
            off += len(data)
        payload = json.dumps(
            {"blobs": metas, "properties": properties or {}}
        ).encode("utf-8")
        f.write(PUFFIN_MAGIC)
        f.write(payload)
        f.write(struct.pack("<I", len(payload)))
        f.write(b"\x00\x00\x00\x00")  # flags: footer payload uncompressed
        f.write(PUFFIN_MAGIC)
    return metas


def read_puffin_footer(path: str) -> dict:
    """Footer payload ({"blobs": [...], "properties": {...}}) of a Puffin
    file; validates all four magic positions."""
    with open(path, "rb") as f:
        f.seek(0, 2)
        size = f.tell()
        f.seek(size - 8)
        tail = f.read(8)
        if tail[4:] != PUFFIN_MAGIC:
            raise ValueError(f"{path}: not a puffin file (trailing magic)")
        flags = tail[:4]
        if flags[0] & 1:
            raise NotImplementedError("compressed puffin footer payload")
        f.seek(size - 12)
        (payload_size,) = struct.unpack("<I", f.read(4))
        f.seek(size - 12 - payload_size - 4)
        if f.read(4) != PUFFIN_MAGIC:
            raise ValueError(f"{path}: bad footer magic")
        payload = f.read(payload_size)
        f.seek(0)
        if f.read(4) != PUFFIN_MAGIC:
            raise ValueError(f"{path}: bad header magic")
    return json.loads(payload.decode("utf-8"))


def read_blob(path: str, offset: int, length: int) -> bytes:
    """One blob's raw bytes — a ranged read, never the whole file (DV
    readers fetch exactly the referenced data file's vector)."""
    with open(path, "rb") as f:
        f.seek(offset)
        data = f.read(length)
    if len(data) != length:
        raise ValueError(f"{path}: blob at {offset}+{length} out of range")
    return data


def read_dv_positions(path: str, offset: int, length: int) -> list[int]:
    """Sorted deleted positions from one deletion-vector blob."""
    return decode_dv_blob(read_blob(path, offset, length))

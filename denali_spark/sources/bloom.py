"""Per-file bloom filters: point-predicate file pruning for columns whose
min/max stats cannot prune (high-cardinality identifiers — uuids, user ids,
url hashes — where every file's [min, max] spans the whole domain).

At 100 TB a point lookup `WHERE doc_id = 'x'` on such a column scans every
file under stats-only pruning. A per-file bloom filter answers "definitely
not in this file" from a few KB of metadata, so the scan touches ~1 file.
This mirrors what Parquet bloom filters / Iceberg puffin blobs do for real
deployments; here the blobs ride in the SAME Puffin statistics file that
`analyze_table` writes (pass `bloom_columns=[...]`), registered on the
snapshot via the catalog's set-statistics op, and the read path consults
them for the conjunctive equality predicates of a scan expression.

Soundness: a bloom filter has false positives, never false negatives, so
pruning with `might_contain == False` can only drop files that cannot hold
a matching row. Deleted rows' values remain in the filter (it is built from
the raw file, before merge-on-read deletes) — that is only ever a false
positive. Stats are per-snapshot: after new commits the index simply stops
applying until the next ANALYZE (conservative, never wrong).

Format (engine convention, documented): blob type `bloom-filter-v1`,
payload = u32 LE hash count k, then the bitset, little-endian bit order;
membership hashes are the two md5 halves combined as h1 + i·h2 (the
standard double-hashing construction), on the canonical utf-8 string
rendering of the value. m is sized from the classic -n·ln(p)/ln²2 formula.
"""

from __future__ import annotations

import hashlib
import math
import struct
from typing import Any, Iterable

BLOOM_BLOB_TYPE = "bloom-filter-v1"
# Bloom pruning only covers types whose canonical string rendering is
# unambiguous on both the build and probe side.
BLOOMABLE_TYPES = {"int", "long", "string"}


def _h12(value: str) -> tuple[int, int]:
    d = hashlib.md5(value.encode("utf-8")).digest()
    return int.from_bytes(d[:8], "little"), int.from_bytes(d[8:], "little")


def bloom_params(n: int, fpp: float = 0.01) -> tuple[int, int]:
    """(m bits rounded up to bytes, k hashes) for n values at target fpp."""
    n = max(1, n)
    m = max(64, int(math.ceil(-n * math.log(fpp) / (math.log(2) ** 2))))
    m = (m + 7) // 8 * 8
    k = max(1, round(m / n * math.log(2)))
    return m, k


def build_bloom(values: Iterable[str], fpp: float = 0.01) -> bytes:
    vals = list(values)
    m, k = bloom_params(len(vals), fpp)
    bits = bytearray(m // 8)
    for v in vals:
        h1, h2 = _h12(v)
        for i in range(k):
            b = (h1 + i * h2) % m
            bits[b >> 3] |= 1 << (b & 7)
    return struct.pack("<I", k) + bytes(bits)


def bloom_might_contain(blob: bytes, value: str) -> bool:
    (k,) = struct.unpack_from("<I", blob, 0)
    bits = memoryview(blob)[4:]
    m = len(bits) * 8
    h1, h2 = _h12(value)
    for i in range(k):
        b = (h1 + i * h2) % m
        if not (bits[b >> 3] >> (b & 7)) & 1:
            return False
    return True


def value_key(v: Any) -> str:
    """Canonical rendering shared by build and probe (int/long/string)."""
    return v if isinstance(v, str) else str(v)


def conjunctive_eqs(expr: dict | None) -> list[tuple[str, list]]:
    """(term, candidate values) pairs where one of the values must hold for
    a row to match, reachable through AND only: `eq` contributes a single
    value, `in` its value list (the file is prunable only if EVERY list
    member misses the bloom). OR/NOT subtrees contribute nothing (a bloom
    miss under OR would not exclude the file)."""
    out: list[tuple[str, list]] = []
    if not expr:
        return out
    t = expr.get("type")
    if t == "and":
        out += conjunctive_eqs(expr["left"])
        out += conjunctive_eqs(expr["right"])
    elif t == "eq" and expr.get("value") is not None:
        out.append((expr["term"], [expr["value"]]))
    elif t == "in":
        # a NULL list member matches no row (x = NULL is unknown), so the
        # non-null members alone decide whether a file can match
        values = [v for v in expr.get("values", []) if v is not None]
        if values:
            out.append((expr["term"], values))
    return out


def bloom_prune(
    io, md: dict, snap: dict, where: dict | None, entries: list[dict]
) -> list[dict]:
    """Drop data files whose bloom filter proves they cannot satisfy one of
    the scan's conjunctive equality predicates. No-op unless a statistics
    file with bloom blobs is registered for THIS snapshot (analyze_table
    with bloom_columns). Blob bytes are ranged-read once per (file, column)
    actually probed and memoized on the io object."""
    eqs = conjunctive_eqs(where)
    if not eqs or not entries:
        return entries
    sid = snap["snapshot-id"]
    stat = next(
        (s for s in md.get("statistics", []) if s["snapshot-id"] == sid), None
    )
    if stat is None:
        return entries
    from denali_spark.sources.puffin import read_blob, read_puffin_footer
    from denali_spark.sources.schema_evolution import current_schema

    # Match blobs to predicates by FIELD ID (bm["fields"]), not by the
    # column-name property: after a rename that reuses a column name
    # (metadata-only commit — the snapshot id, and hence the statistics
    # registration, is unchanged) a name-keyed lookup would probe the
    # wrong column's filter and wrongly prune files holding matches.
    id_by_name = {f["name"]: f["id"] for f in current_schema(md)["fields"]}
    index: dict[tuple[str, int], tuple[str, int, int]] = {}
    for bm in stat.get("blob-metadata", []):
        props = bm.get("properties", {})
        fields = bm.get("fields") or []
        if bm.get("type") == BLOOM_BLOB_TYPE and "file" in props and len(fields) == 1:
            # blobs live in per-task sidecar Puffin files (properties.path)
            # written executor-side; older layouts embedded them in the
            # statistics file itself
            index[(props["file"], fields[0])] = (
                props.get("path", stat["statistics-path"]),
                bm["offset"], bm["length"],
            )
    if not index:
        return entries
    cache = getattr(io, "_bloom_cache", None)
    if cache is None:
        cache = io._bloom_cache = {}
    kept = []
    for e in entries:
        drop = False
        for term, values in eqs:
            fid = id_by_name.get(term)
            if fid is None:
                continue
            loc = index.get((e["path"], fid))
            if loc is None:
                continue
            blob = cache.get(loc)
            if blob is None:
                blob = cache[loc] = read_blob(*loc)
            if not any(
                bloom_might_contain(blob, value_key(v)) for v in values
            ):
                drop = True
                break
        if not drop:
            kept.append(e)
    return kept

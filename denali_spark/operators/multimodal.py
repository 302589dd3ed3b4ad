"""Multimodal-column operators: image/audio/video payloads as opaque BINARY
columns with typed metadata, processed via Arrow-batched Pandas UDFs.

The container has no image/audio codecs, so the decode kernels are
deterministic fakes behind an import-try (clearly marked); everything
Spark-side — binary schema, batch iteration, partition sizing, output
schema — is real and tested. Swapping the kernel body for PIL/librosa is a
one-function change that doesn't touch the plan.

The testdata has no binary table, so payloads are derived in-plan from
``documents.text`` (utf-8 encode) — giving every operator a deterministic
binary input at any scale factor.
"""

from __future__ import annotations

import os

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from denali_spark.engine.tables import load_table
from denali_spark.operators.registry import query


def _payloads(spark: SparkSession, sf_dir: str) -> DataFrame:
    # NULL text maps to an EMPTY payload (b'') rather than NULL: the pandas
    # kernels do bytes(value) per row, and bytes(None) would turn one NULL
    # document into an opaque whole-job failure. The oracles COALESCE the
    # same way, so both engines agree on the n=0 row.
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.encode(F.coalesce(F.col("text"), F.lit("")), "UTF-8").alias("payload"),
        "n_chars",
    )


@query(
    "mm_binary_metadata",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(encode(COALESCE(text, ''))) AS BIGINT) AS n_bytes,
           upper(substr(hex(encode(COALESCE(text, ''))), 1, 8)) AS magic_hex,
           md5(COALESCE(text, '')) AS content_hash
    FROM documents
    """,
    tags=("multimodal", "binary"),
)
def mm_binary_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed metadata over a binary payload column (size, magic bytes,
    content hash) — the scan-side profile step before any decode."""
    p = _payloads(spark, sf_dir)
    return p.select(
        "doc_id",
        F.octet_length("payload").cast("long").alias("n_bytes"),
        F.upper(F.substring(F.hex("payload"), 1, 8)).alias("magic_hex"),
        F.md5("payload").alias("content_hash"),
    )


_DECODE_SCHEMA = (
    "doc_id long, n_bytes long, width int, height int, format string, decoder string"
)


def _decode_image_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow-batched 'decode' kernel.

    Real path (PIL) is attempted per-executor via import-try; without codecs
    it falls back to a DETERMINISTIC FAKE decode (dimensions derived from the
    payload length) so the distributed plumbing is fully exercised.
    """
    try:  # pragma: no cover - container has no PIL
        import io

        from PIL import Image  # noqa: F401

        def decode(buf: bytes) -> tuple[int, int, str, str]:
            img = Image.open(io.BytesIO(buf))
            return img.width, img.height, img.format or "UNKNOWN", "pil"

    except ImportError:

        def decode(buf: bytes) -> tuple[int, int, str, str]:
            n = len(buf)
            return 16 + n % 640, 16 + (n // 7) % 480, "FAKE", "stub"

    for pdf in batches:
        meta = [decode(bytes(b)) for b in pdf["payload"]]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].values,
                "n_bytes": [len(bytes(b)) for b in pdf["payload"]],
                "width": [m[0] for m in meta],
                "height": [m[1] for m in meta],
                "format": [m[2] for m in meta],
                "decoder": [m[3] for m in meta],
            }
        )


@query(
    "mm_image_decode",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(encode(COALESCE(text, ''))) AS BIGINT) AS n_bytes,
           CAST(16 + octet_length(encode(COALESCE(text, ''))) % 640 AS INT) AS width,
           CAST(16 + (octet_length(encode(COALESCE(text, ''))) // 7) % 480 AS INT) AS height,
           'FAKE' AS format,
           'stub' AS decoder
    FROM documents
    """,
    tags=("multimodal", "pandas-udf"),
)
def mm_image_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image decode via mapInPandas: binary batches cross to Python through
    Arrow once, metadata comes back columnar. Decoding is embarrassingly
    parallel — partition count, not algorithm, is the scale knob. The oracle
    mirrors the stub kernel arithmetically (the plumbing is what's checked)."""
    p = _payloads(spark, sf_dir).select("doc_id", "payload")
    return p.mapInPandas(_decode_image_batch, schema=_DECODE_SCHEMA)


@query(
    "mm_frame_sample",
    oracle="""
    WITH meta AS (
      SELECT doc_id, n_chars // 50 AS n_frames FROM documents WHERE n_chars // 50 > 0
    )
    SELECT doc_id, CAST(unnest(range(0, n_frames)) AS BIGINT) AS frame_idx,
           CAST(unnest(range(0, n_frames)) AS DOUBLE) * 0.04 AS frame_ts_sec
    FROM meta
    """,
    tags=("multimodal", "frame-sampling"),
)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video-style frame sampling: per payload, emit one row per sampled
    frame (count derived from payload metadata; 25 fps stub timing). The
    explode keeps output partitioned with its source rows — no shuffle."""
    docs = load_table(spark, sf_dir, "documents")
    meta = docs.select(
        "doc_id", F.floor(F.col("n_chars") / 50).cast("long").alias("n_frames")
    ).filter(F.col("n_frames") > 0)
    return meta.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0).cast("long"), F.col("n_frames") - 1)).alias(
            "frame_idx"
        ),
    ).select(
        "doc_id",
        "frame_idx",
        (F.col("frame_idx").cast("double") * 0.04).alias("frame_ts_sec"),
    )


_FEAT_SCHEMA = "doc_id long, feat array<double>"

_FEAT_COLS_SCHEMA = "doc_id long, " + ", ".join(f"feat_{i} double" for i in range(8))


def _byte_moments(buf: bytes) -> list[float]:
    """8 byte-histogram moments with EXPLICIT, IEEE-deterministic arithmetic.

    Every intermediate (byte sum, sum of squares, counts) is an integer
    exactly representable in float64, and the final ops (one division, one
    multiply/subtract, one sqrt) are single IEEE-754 operations — so a SQL
    engine computing the same formula over the same bytes produces
    bit-identical doubles. This is what lets the query carry a full
    value-hash oracle instead of a rows-only check.

    Portability caveat: the var expression (ss/n - mean*mean) additionally
    assumes NEITHER engine fuses the multiply-subtract into an FMA — a
    DuckDB build compiled with FP contraction (e.g. -ffp-contract=fast)
    could flip the low bit of feat_2. Exactness of ss also needs
    ss < 2^53, which holds for any payload under ~138 GB. Verified matching
    in this environment; if a future oracle build diverges on feat_1/feat_2
    only, round both sides to fixed digits instead.
    """
    import math

    import numpy as np

    arr = np.frombuffer(buf, dtype=np.uint8).astype(np.int64)
    n = int(arr.size)
    if n == 0:
        return [0.0] * 8
    s = int(arr.sum())
    ss = int((arr * arr).sum())
    mean = s / n
    var = ss / n - mean * mean
    std = math.sqrt(max(var, 0.0))
    srt = np.sort(arr)
    if n % 2 == 1:
        median = float(srt[n // 2])
    else:
        median = (int(srt[n // 2 - 1]) + int(srt[n // 2])) / 2
    lo = int((arr < 64).sum())
    hi = int((arr > 192).sum())
    return [float(n), mean, std, float(srt[0]), float(srt[-1]), median, lo / n, hi / n]


def _featurize_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Deterministic 8-dim 'feature extraction' from payload bytes (byte
    histogram moments) — stands in for a CNN/audio embedding kernel."""
    for pdf in batches:
        feats = [_byte_moments(bytes(b)) for b in pdf["payload"]]
        yield pd.DataFrame({"doc_id": pdf["doc_id"].values, "feat": feats})


def _featurize_cols_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        feats = [_byte_moments(bytes(b)) for b in pdf["payload"]]
        out = {"doc_id": pdf["doc_id"].values}
        for i in range(8):
            out[f"feat_{i}"] = [f[i] for f in feats]
        yield pd.DataFrame(out)


def mm_featurize_vec(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Library API: binary → fixed-dim feature VECTOR (array<double>) via
    mapInPandas, shaped like the embeddings table so the similarity
    operators compose directly downstream. Not driver-registered: the
    driver's canonicalizer sorts on every column and arrays are unhashable
    there — `mm_featurize` below is the flattened, oracle-checked surface."""
    p = _payloads(spark, sf_dir).select("doc_id", "payload")
    return p.mapInPandas(_featurize_batch, schema=_FEAT_SCHEMA)


@query(
    "mm_featurize",
    oracle="""
    WITH hx AS (
      SELECT doc_id, hex(encode(COALESCE(text, ''))) AS h,
             CAST(octet_length(encode(COALESCE(text, ''))) AS BIGINT) AS n
      FROM documents
    ), bytes AS (
      SELECT doc_id, n,
             list_transform(range(1, n + 1),
               i -> (strpos('0123456789ABCDEF', substr(h, CAST(2*i-1 AS INT), 1)) - 1) * 16
                  + (strpos('0123456789ABCDEF', substr(h, CAST(2*i AS INT), 1)) - 1)) AS bs
      FROM hx
    ), sums AS (
      SELECT doc_id, n, bs,
             CAST(list_sum(bs) AS DOUBLE) AS s,
             CAST(list_sum(list_transform(bs, x -> x * x)) AS DOUBLE) AS ss
      FROM bytes WHERE n > 0
    ), moments AS (
      SELECT doc_id, n, bs, s / n AS mean, ss / n - (s / n) * (s / n) AS var
      FROM sums
    )
    SELECT doc_id,
           CAST(n AS DOUBLE) AS feat_0,
           mean AS feat_1,
           sqrt(greatest(var, 0.0)) AS feat_2,
           CAST(list_min(bs) AS DOUBLE) AS feat_3,
           CAST(list_max(bs) AS DOUBLE) AS feat_4,
           CASE WHEN n % 2 = 1
                THEN CAST(list_sort(bs)[CAST(n // 2 + 1 AS INT)] AS DOUBLE)
                ELSE (list_sort(bs)[CAST(n // 2 AS INT)]
                      + list_sort(bs)[CAST(n // 2 + 1 AS INT)]) / 2 END AS feat_5,
           len(list_filter(bs, x -> x < 64)) / n AS feat_6,
           len(list_filter(bs, x -> x > 192)) / n AS feat_7
    FROM moments
    UNION ALL
    SELECT doc_id, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0
    FROM hx WHERE n = 0
    """,
    tags=("multimodal", "pandas-udf", "feature-extraction"),
)
def mm_featurize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary → 8 byte-histogram moments as per-dim DOUBLE columns via
    mapInPandas (Arrow batches, numpy kernel). The oracle recomputes every
    moment from the payload bytes in SQL (hex-pair byte extraction) with the
    same explicit arithmetic, so this is fully value-checked — see
    `_byte_moments` for the determinism contract."""
    p = _payloads(spark, sf_dir).select("doc_id", "payload")
    return p.mapInPandas(_featurize_cols_batch, schema=_FEAT_COLS_SCHEMA)


# --- real decode: PPM (P6) --------------------------------------------------
#
# The container has no image codecs, but PPM is decodable in pure Python —
# so this decode path is REAL, not a stub: the payload is a spec-valid
# binary P6 image synthesized in-plan (ASCII header + raw pixel bytes),
# and the kernel genuinely parses magic/dimensions/maxval, validates the
# payload length, and aggregates pixels. The oracle recomputes the decoded
# values from the generating arithmetic — if the parser misreads a single
# header byte or pixel, the hash check fails.


def _parse_ppm(buf: bytes) -> tuple[int, int, int, bytes]:
    """Minimal spec-correct P6 parser (magic, whitespace/comment-tolerant
    header, raw RGB payload)."""
    if not buf.startswith(b"P6"):
        raise ValueError("not a P6 PPM payload")
    i, tokens = 2, []
    while len(tokens) < 3:
        while i < len(buf) and buf[i : i + 1].isspace():
            i += 1
        if buf[i : i + 1] == b"#":  # comment to end-of-line
            while i < len(buf) and buf[i] != 0x0A:
                i += 1
            continue
        j = i
        while j < len(buf) and not buf[j : j + 1].isspace():
            j += 1
        tokens.append(int(buf[i:j]))
        i = j
    i += 1  # single whitespace terminating the header
    w, h, maxval = tokens
    pix = buf[i:]
    if len(pix) != 3 * w * h:
        raise ValueError(f"PPM payload is {len(pix)} bytes, expected {3 * w * h}")
    return w, h, maxval, pix


_PPM_SCHEMA = "doc_id long, width int, height int, maxval int, mean_pixel double, decoder string"


def _decode_ppm_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        rows = []
        for doc_id, b in zip(pdf["doc_id"], pdf["payload"]):
            w, h, maxval, pix = _parse_ppm(bytes(b))
            rows.append((doc_id, w, h, maxval, sum(pix) / len(pix), "ppm-py"))
        yield pd.DataFrame(
            rows, columns=["doc_id", "width", "height", "maxval", "mean_pixel", "decoder"]
        )


@query(
    "mm_ppm_decode",
    oracle="""
    WITH dims AS (
      SELECT doc_id,
             CAST(4 + doc_id % 13 AS INT) AS width,
             CAST(3 + doc_id % 7 AS INT) AS height
      FROM documents
    )
    SELECT doc_id, width, height, CAST(255 AS INT) AS maxval,
           list_sum(list_transform(range(0, 3 * width * height),
                    i -> 32 + (doc_id * 7 + i * 13) % 95)) * 1.0
             / (3 * width * height) AS mean_pixel,
           'ppm-py' AS decoder
    FROM dims
    """,
    tags=("multimodal", "pandas-udf", "decode"),
)
def mm_ppm_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode over Arrow batches: each document gets a binary
    P6 PPM synthesized JVM-side (deterministic dimensions + pixel bytes),
    and the Python kernel parses the actual bytes — header tokenizer,
    payload-length validation, pixel aggregation. The oracle derives the
    same numbers from the generating arithmetic, so the parser itself is
    value-checked. Scale shape: payload construction and decoding are both
    scan-local; Arrow moves the binaries in columnar batches."""
    docs = load_table(spark, sf_dir, "documents")
    w = (F.lit(4) + F.col("doc_id") % 13).cast("int")
    h = (F.lit(3) + F.col("doc_id") % 7).cast("int")
    npix = F.lit(3) * w * h
    pixels = F.array_join(
        F.transform(
            F.sequence(F.lit(0), npix - 1),
            lambda i: F.char(F.lit(32) + (F.col("doc_id") * 7 + i * 13) % 95),
        ),
        "",
    )
    header = F.concat_ws(
        "", F.lit("P6\n"), w.cast("string"), F.lit(" "), h.cast("string"),
        F.lit("\n255\n"),
    )
    payload = F.encode(F.concat(header, pixels), "UTF-8")
    p = docs.select("doc_id", payload.alias("payload"))
    return p.mapInPandas(_decode_ppm_batch, schema=_PPM_SCHEMA)


AUDIO_FRAME = 32  # samples per analysis window


@query(
    "mm_audio_window_rms",
    oracle=f"""
    WITH ascii_docs AS (
      SELECT doc_id, COALESCE(text, '') AS t FROM documents
      WHERE length(COALESCE(text, '')) = octet_length(encode(COALESCE(text, '')))
    ),
    samples AS (
      SELECT doc_id, i, unicode(substr(t, CAST(i AS INT), 1)) - 128 AS s
      FROM ascii_docs, unnest(range(1, length(t) + 1)) AS u(i)
    ),
    framed AS (
      SELECT doc_id, CAST((i - 1) // {AUDIO_FRAME} AS BIGINT) AS frame,
             s, COUNT(*) OVER (PARTITION BY doc_id, (i - 1) // {AUDIO_FRAME}) AS w
      FROM samples
    )
    SELECT doc_id, frame,
           sqrt(SUM(s * s) / {AUDIO_FRAME}.0) AS rms,
           CAST(MAX(abs(s)) AS BIGINT) AS peak
    FROM framed WHERE w = {AUDIO_FRAME}
    GROUP BY 1, 2
    """,
    tags=("multimodal", "audio", "pandas-udf"),
)
def mm_audio_window_rms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio-style windowed analysis over an opaque binary payload: treat
    the payload as unsigned-8-bit PCM (samples centered at 128), split into
    {AUDIO_FRAME}-sample frames, and emit per-frame RMS + peak — the
    loudness/clipping profile an audio ingest pipeline computes before
    feature extraction. Trailing partial frames are dropped (equal-length
    frames only), and non-ASCII payloads are excluded up front so the SQL
    oracle's codepoint view of the bytes is exact.

    Spark plumbing is the real thing: Arrow-batched mapInPandas, numpy
    frombuffer per payload, vectorized frame reshape — swap the synthetic
    payload for real PCM and nothing else changes. Determinism: sample
    values are ints, frame sums of squares are exact in float64, and the
    final divide + sqrt are single IEEE ops — bit-identical to the oracle's
    integer aggregation."""
    import numpy as np
    import pandas as pd

    docs = load_table(spark, sf_dir, "documents")
    ascii_docs = docs.select(
        "doc_id", F.encode(F.coalesce(F.col("text"), F.lit("")), "UTF-8").alias("payload"),
        F.length(F.coalesce(F.col("text"), F.lit(""))).alias("n_chars_txt"),
    ).filter(F.octet_length("payload") == F.col("n_chars_txt"))

    def kernel(batches):
        for pdf in batches:
            out_doc, out_frame, out_rms, out_peak = [], [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = np.frombuffer(bytes(payload), dtype=np.uint8).astype(np.int64) - 128
                n_frames = len(b) // AUDIO_FRAME
                if n_frames == 0:
                    continue
                fr = b[: n_frames * AUDIO_FRAME].reshape(n_frames, AUDIO_FRAME)
                sq = (fr * fr).sum(axis=1).astype(np.float64)
                out_doc.extend([doc_id] * n_frames)
                out_frame.extend(range(n_frames))
                out_rms.extend(np.sqrt(sq / float(AUDIO_FRAME)))
                out_peak.extend(np.abs(fr).max(axis=1))
            yield pd.DataFrame(
                {"doc_id": out_doc, "frame": out_frame, "rms": out_rms, "peak": out_peak}
            )

    return ascii_docs.select("doc_id", "payload").mapInPandas(
        kernel, schema="doc_id long, frame long, rms double, peak long"
    )


# --- video-style scene-cut detection ---------------------------------------

SCENE_FRAME = 64       # bytes per synthetic "frame"
SCENE_CUT_MAD = 30.0   # mean-absolute-difference cut threshold


@query(
    "mm_video_scene_cut",
    oracle=f"""
    WITH ascii_docs AS (
      SELECT doc_id, COALESCE(text, '') AS t FROM documents
      WHERE length(COALESCE(text, '')) = octet_length(encode(COALESCE(text, '')))
    ),
    samples AS (
      SELECT doc_id,
             CAST((i - 1) // {SCENE_FRAME} AS BIGINT) AS frame,
             CAST((i - 1) % {SCENE_FRAME} AS BIGINT) AS off,
             unicode(substr(t, CAST(i AS INT), 1)) AS s
      FROM ascii_docs, unnest(range(1, length(t) + 1)) AS u(i)
      WHERE i <= (length(t) // {SCENE_FRAME}) * {SCENE_FRAME}
    ),
    diffs AS (
      SELECT doc_id, frame, off,
             s - LAG(s) OVER (PARTITION BY doc_id, off ORDER BY frame) AS d
      FROM samples
    )
    SELECT doc_id, frame,
           CAST(SUM(ABS(d)) AS DOUBLE) / {SCENE_FRAME}.0 AS mad,
           CAST(SUM(ABS(d)) AS DOUBLE) / {SCENE_FRAME}.0 >= {SCENE_CUT_MAD} AS is_cut
    FROM diffs WHERE d IS NOT NULL
    GROUP BY 1, 2
    """,
    tags=("multimodal", "video", "pandas-udf"),
)
def mm_video_scene_cut(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video-style scene-cut detection over an opaque binary payload: treat
    the payload as {SCENE_FRAME}-byte frames, score each frame by mean
    absolute difference against the previous one, and flag cuts above the
    threshold — the shot-boundary pass a video ingest pipeline runs before
    sampling keyframes. Trailing partial frames are dropped and non-ASCII
    payloads excluded up front, as in mm_audio_window_rms.

    100 TB shape: per-document Arrow mapInPandas kernel (frombuffer,
    reshape, vectorized diff) — scene detection is payload-LOCAL, so the
    whole pass is scan-side with ZERO shuffles (the oracle's window join
    formulation would shuffle per byte; the kernel formulation is why the
    operator belongs on the Arrow path). Determinism: per-frame sums of
    |int diffs| are exact integers; one double division; one compare."""
    import numpy as np
    import pandas as pd

    docs = load_table(spark, sf_dir, "documents")
    ascii_docs = docs.select(
        "doc_id",
        F.encode(F.coalesce(F.col("text"), F.lit("")), "UTF-8").alias("payload"),
        F.length(F.coalesce(F.col("text"), F.lit(""))).alias("n_chars_txt"),
    ).filter(F.octet_length("payload") == F.col("n_chars_txt"))

    def kernel(batches):
        for pdf in batches:
            out_doc, out_frame, out_mad = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = np.frombuffer(bytes(payload), dtype=np.uint8).astype(np.int64)
                n_frames = len(b) // SCENE_FRAME
                if n_frames < 2:
                    continue
                fr = b[: n_frames * SCENE_FRAME].reshape(n_frames, SCENE_FRAME)
                sad = np.abs(fr[1:] - fr[:-1]).sum(axis=1)
                out_doc.extend([doc_id] * (n_frames - 1))
                out_frame.extend(range(1, n_frames))
                out_mad.extend(sad.astype(np.float64) / float(SCENE_FRAME))
            mad = pd.Series(out_mad, dtype="float64")
            yield pd.DataFrame(
                {"doc_id": out_doc, "frame": out_frame, "mad": mad,
                 "is_cut": mad >= SCENE_CUT_MAD}
            )

    return ascii_docs.select("doc_id", "payload").mapInPandas(
        kernel, schema="doc_id long, frame long, mad double, is_cut boolean"
    )


# --- perceptual image hashing (near-duplicate images) ----------------------
#
# Average-hash over a 16x16 grayscale image: 8x8 blocks of 2x2 pixels, bit
# b set iff block_sum * 64 >= total_sum (cross-multiplied integers — no
# float mean ever computed). The synthetic corpus plants near-duplicates:
# documents 2k and 2k+1 render the SAME base image, with the odd twin
# perturbed by +1 on every 29th pixel — a realistic re-encode-level change
# that leaves the perceptual hash within a few bits, while unrelated
# images differ in ~32 of 64. Candidates come from 16-bit hash bands
# (exact-match equi-join, the banded-LSH shape shared with
# dedup_simhash_pairs), verified by Hamming distance over the two 32-bit
# hash halves.

PHASH_SIDE = 16
PHASH_BLOCKS = 64
PHASH_HAM_TAU = 10


def _phash_kernel(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
    """Parse REAL P5 (binary grayscale) bytes and compute the average
    hash with numpy block sums — the decode path an image pipeline runs,
    Arrow-batched, payload-local."""
    import numpy as np

    for pdf in batches:
        rows = []
        for doc_id, b in zip(pdf["doc_id"], pdf["payload"]):
            raw = bytes(b)
            if not raw.startswith(b"P5\n"):
                raise ValueError("not a binary PGM payload")
            rest = raw[3:]
            dims, rest = rest.split(b"\n", 1)
            maxval, pix = rest.split(b"\n", 1)
            w, h = (int(x) for x in dims.split())
            if len(pix) != w * h:
                raise ValueError(f"PGM payload {len(pix)} != {w * h}")
            img = np.frombuffer(pix, dtype=np.uint8).astype(np.int64)
            img = img.reshape(h, w)
            blocks = img.reshape(8, 2, 8, 2).sum(axis=(1, 3))
            total = int(img.sum())
            bits = (blocks.reshape(-1) * PHASH_BLOCKS >= total).astype(np.int64)
            lo = int((bits[:32] << np.arange(32)).sum())
            hi = int((bits[32:] << np.arange(32)).sum())
            rows.append((doc_id, hi, lo))
        yield pd.DataFrame(rows, columns=["doc_id", "h_hi", "h_lo"])


_SQL_PIX = (
    "32 + ((doc_id // 2) * 7 + {i} * 13) % 94"
    " + CASE WHEN doc_id % 2 = 1 AND {i} % 29 = 0 THEN 1 ELSE 0 END"
)


def _sql_block_sum(b: str) -> str:
    terms = []
    for dr in (0, 1):
        for dc in (0, 1):
            i = f"((({b}) // 8 * 2 + {dr}) * 16 + ({b}) % 8 * 2 + {dc})"
            terms.append("(" + _SQL_PIX.format(i=i) + ")")
    return " + ".join(terms)


def phash_banded_pairs(
    hashes: DataFrame, bucket_cap: int | None = None,
    tau: int | None = None,
) -> DataFrame:
    """Banded candidate join over a 64-bit hash relation
    ``(doc_id, h_hi, h_lo)``: four 16-bit bands, candidates from exact
    band-value collisions, verified by full Hamming distance. With
    ``bucket_cap``, buckets holding more than `cap` hashes are skipped
    BEFORE the self-join — a bucket shared by k images contributes k²
    join rows, so one degenerate all-identical cluster (blank frames,
    test cards) at corpus scale would otherwise dominate the shuffle.
    The heavy-hitter set is tiny by definition and broadcasts into an
    anti-join; the drop is LOGGED (bucket + member counts), never silent.
    Pairs whose every shared band is hot are lost (recall-trading,
    precision-preserving — the same guard the MinHash and n-gram paths
    apply via `max_df`); genuinely near-duplicate pairs almost always
    co-occupy several bands, so a planted-twin fixture keeps full recall
    under any sane cap."""
    band_structs = F.array(
        F.struct(F.lit(0).alias("band"), (F.col("h_lo") % 65536).alias("bh")),
        F.struct(
            F.lit(1).alias("band"),
            (F.col("h_lo") / 65536).cast("long").alias("bh"),
        ),
        F.struct(F.lit(2).alias("band"), (F.col("h_hi") % 65536).alias("bh")),
        F.struct(
            F.lit(3).alias("band"),
            (F.col("h_hi") / 65536).cast("long").alias("bh"),
        ),
    )
    bands = hashes.select(
        "doc_id", "h_hi", "h_lo", F.explode(band_structs).alias("s")
    ).select("doc_id", "h_hi", "h_lo", "s.band", "s.bh")
    if bucket_cap is not None:
        hot = (
            bands.groupBy("band", "bh")
            .agg(F.count(F.lit(1)).alias("n"))
            .filter(F.col("n") > bucket_cap)
        )
        stats = hot.agg(
            F.count(F.lit(1)).alias("buckets"), F.sum("n").alias("members")
        ).collect()[0]
        if stats["buckets"]:
            import warnings

            warnings.warn(
                f"phash_banded_pairs: skipping {stats['buckets']} band "
                f"bucket(s) over cap={bucket_cap} "
                f"({stats['members']} member rows dropped before the "
                "candidate join); pairs confined to hot buckets are lost",
                stacklevel=2,
            )
        bands = bands.join(
            F.broadcast(hot.select("band", "bh")), ["band", "bh"], "left_anti"
        )
    a, b = bands.alias("a"), bands.alias("b")
    hamming = (
        F.bit_count(F.col("a.h_lo").bitwiseXOR(F.col("b.h_lo")))
        + F.bit_count(F.col("a.h_hi").bitwiseXOR(F.col("b.h_hi")))
    ).cast("long")
    return (
        a.join(
            b,
            on=[
                F.col("a.band") == F.col("b.band"),
                F.col("a.bh") == F.col("b.bh"),
                F.col("a.doc_id") < F.col("b.doc_id"),
            ],
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            hamming.alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= (PHASH_HAM_TAU if tau is None else tau))
    )



# Shared CTE prefix (hash derivation + 16-bit bands) and the banded-pair
# select — reused by the pair query and the cluster labeling on top of it.
_SQL_PHASH_CTES = f"""
    WITH hashes AS (
      SELECT doc_id,
             list_sum(list_transform(range(0, 256),
               i -> {_SQL_PIX.format(i='i')})) AS total,
             list_transform(range(0, {PHASH_BLOCKS}),
               b -> {_sql_block_sum('b')}) AS bsums
      FROM documents
    ),
    hv AS (
      SELECT doc_id,
             CAST(list_sum(list_transform(range(0, 32), b ->
               CASE WHEN bsums[b + 1] * {PHASH_BLOCKS} >= total
                    THEN (CAST(1 AS BIGINT) << b) ELSE 0 END)) AS BIGINT)
               AS h_lo,
             CAST(list_sum(list_transform(range(0, 32), b ->
               CASE WHEN bsums[b + 33] * {PHASH_BLOCKS} >= total
                    THEN (CAST(1 AS BIGINT) << b) ELSE 0 END)) AS BIGINT)
               AS h_hi
      FROM hashes
    ),
    bands AS (
      SELECT doc_id, h_hi, h_lo, u.band,
             CASE u.band
               WHEN 0 THEN h_lo % 65536
               WHEN 1 THEN h_lo // 65536
               WHEN 2 THEN h_hi % 65536
               ELSE h_hi // 65536
             END AS bh
      FROM hv, (SELECT unnest(range(0, 4)) AS band) u
    )
"""

_SQL_PHASH_PAIRS = f"""
    SELECT doc_a, doc_b, hamming FROM (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
             CAST(bit_count(xor(a.h_lo, b.h_lo))
                  + bit_count(xor(a.h_hi, b.h_hi)) AS BIGINT) AS hamming
      FROM bands a
      JOIN bands b ON a.band = b.band AND a.bh = b.bh
                  AND a.doc_id < b.doc_id
    ) WHERE hamming <= {PHASH_HAM_TAU}
"""


def phash_hash_index_path(sf_dir: str) -> str:
    """Canonical on-disk location of the corpus's 64-bit perceptual-hash
    relation — geometry covers the hash layout and file count."""
    from denali_spark.engine.index_cache import (
        cache_root,
        corpus_fingerprint,
        index_file_count,
    )

    n_files = index_file_count(sf_dir, "documents")
    key = corpus_fingerprint(
        sf_dir, "documents", f"phash|{PHASH_SIDE}x{PHASH_SIDE}b64|f{n_files}"
    )
    return os.path.join(cache_root("phash"), f"hashes-{key}")


def phash_hash_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialized perceptual-hash relation (doc_id, h_hi, h_lo): the
    decode→hash Arrow kernel runs ONCE per corpus at ingest (exactly when
    a real pipeline has the image bytes in hand) and every phash consumer
    (pair generation, the distance histogram, the cluster-label build)
    reads 16 bytes/doc of parquet instead of re-decoding the payload
    plane per query — the image-byte twin of the MinHash signature
    index's economics, and at 100 TB the difference between one decode
    pass and one per analysis."""
    from denali_spark.engine.index_cache import (
        corpus_rows,
        index_file_count,
        materialize_parquet,
        widen_build_input,
    )

    def build() -> DataFrame:
        # widen the byte-tiny documents scan before the payload synthesis
        # + decode->hash Arrow kernel (pure per-row map; r16, see
        # widen_build_input)
        docs = widen_build_input(
            load_table(spark, sf_dir, "documents"),
            corpus_rows(sf_dir, "documents"),
        )
        npix = PHASH_SIDE * PHASH_SIDE
        pixels = F.array_join(
            F.transform(
                F.sequence(F.lit(0), F.lit(npix - 1)),
                lambda i: F.char(
                    F.lit(32)
                    + (F.expr("doc_id div 2") * 7 + i * 13)
                    % 94
                    + F.when(
                        (F.col("doc_id") % 2 == 1) & (i % 29 == 0), F.lit(1)
                    ).otherwise(F.lit(0))
                ),
            ),
            "",
        )
        header = F.lit(f"P5\n{PHASH_SIDE} {PHASH_SIDE}\n255\n")
        payload = F.encode(F.concat(header, pixels), "UTF-8")
        return docs.select("doc_id", payload.alias("payload")).mapInPandas(
            _phash_kernel, schema="doc_id long, h_hi long, h_lo long"
        )

    return materialize_parquet(
        spark,
        phash_hash_index_path(sf_dir),
        build,
        num_files=index_file_count(sf_dir, "documents"),
        distribute_by=("doc_id",),
    )


@query(
    "mm_image_phash_pairs",
    oracle=_SQL_PHASH_CTES + _SQL_PHASH_PAIRS,
    tags=("multimodal", "phash", "dedup", "pandas-udf"),
)
def mm_image_phash_pairs(
    spark: SparkSession, sf_dir: str, bucket_cap: int | None = None,
    tau: int | None = None,
) -> DataFrame:
    """Near-duplicate image pairs by perceptual average-hash: decode the
    (synthesized, deterministic) P5 grayscale payloads in an Arrow-batched
    kernel, hash each image to 64 bits, generate candidates from 16-bit
    hash bands, verify by Hamming distance. The oracle re-derives the
    hashes from the generating arithmetic, so the decode + hash kernel is
    value-checked end to end. Scale shape: hashing is paid once per
    corpus at ingest (the materialized `phash_hash_index` — 16 bytes/doc
    read back, never a per-query decode); the only shuffle is the banded
    equi-join over (band, value) — work scales with band-bucket
    co-occupancy, never image pairs. On low-diversity corpora
    co-occupancy itself can degenerate (k identical hashes → k²
    candidates); `bucket_cap` applies the standard LSH guard — see
    `phash_banded_pairs`."""
    hashes = phash_hash_index(spark, sf_dir)
    return phash_banded_pairs(hashes, bucket_cap=bucket_cap, tau=tau)


def phash_cluster_index_path(sf_dir: str) -> str:
    """Canonical on-disk location of the corpus's IMAGE cluster-label
    index (phash near-dup components) — the geometry folds in the hash
    layout (64-bit, 4×16-bit bands), the Hamming threshold, and the file
    layout, so retuning any of them rebuilds the labels."""
    from denali_spark.engine.index_cache import (
        cache_root,
        corpus_fingerprint,
        index_file_count,
    )

    n_files = index_file_count(sf_dir, "documents")
    key = corpus_fingerprint(
        sf_dir, "documents", f"phashcc|64b4x16|tau{PHASH_HAM_TAU}|f{n_files}"
    )
    return os.path.join(cache_root("cc"), f"phash-labels-{key}")


def phash_cluster_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialized IMAGE cluster-label relation
    (doc_id, component, is_canonical): the min-label fixpoint over the
    banded phash pair graph, computed once per corpus and persisted as
    parquet — the image-side twin of `dedup.cc_label_index`. Both
    survivorship consumers (`mm_image_phash_clusters`,
    `mm_image_dedup_keep_best`) read it instead of re-running the
    decode→hash→band-join→propagation pipeline per call; at 100 TB the
    labels are written by the ingest pass that already decoded the
    images."""
    from denali_spark.engine.index_cache import index_file_count, materialize_parquet
    from denali_spark.operators.dedup import propagate_min_labels

    def build() -> DataFrame:
        docs = load_table(spark, sf_dir, "documents")
        pairs = mm_image_phash_pairs(spark, sf_dir).select(
            F.col("doc_a").alias("i"), F.col("doc_b").alias("j")
        )
        return propagate_min_labels(pairs, docs.select("doc_id"))

    return materialize_parquet(
        spark,
        phash_cluster_index_path(sf_dir),
        build,
        num_files=index_file_count(sf_dir, "documents"),
        distribute_by=("doc_id",),
    )


@query(
    "mm_image_phash_clusters",
    oracle=_SQL_PHASH_CTES.replace("WITH ", "WITH RECURSIVE ", 1)
    + ", pairs AS ("
    + _SQL_PHASH_PAIRS
    + """
    ),
    edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM pairs
      UNION ALL
      SELECT doc_b, doc_a FROM pairs
    ),
    reach(node, lbl) AS (
      SELECT doc_id, doc_id FROM documents
      UNION
      SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.node
    )
    SELECT node AS doc_id,
           CAST(min(lbl) AS BIGINT) AS component,
           (node = min(lbl)) AS is_canonical
    FROM reach GROUP BY node
    """,
    tags=("multimodal", "phash", "dedup", "graph", "pandas-udf"),
)
def mm_image_phash_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate IMAGE clusters: connected components over the
    perceptual-hash pair graph — the image-side twin of the text
    pipeline's `dedup_connected_components` (a crawl's resized/recoded
    copies of one image form a component; keep the canonical member,
    drop the rest). The labels are served from the materialized image
    cluster-label index (`phash_cluster_index` — the decode→hash→band
    join→min-label propagation is paid once per corpus at ingest), so
    this query is a parquet read."""
    return phash_cluster_index(spark, sf_dir)


@query(
    "mm_modality_coverage",
    oracle="""
    WITH imgs AS (
      SELECT doc_id // 2 AS asset_id, source,
             CAST(n_chars AS BIGINT) AS img_bytes
      FROM documents WHERE doc_id % 2 = 0 AND doc_id % 7 <> 0
    ), caps AS (
      SELECT (doc_id - 1) // 2 AS asset_id, source AS cap_source,
             CAST(n_chars AS BIGINT) AS cap_chars
      FROM documents WHERE doc_id % 2 = 1 AND doc_id % 5 <> 0
    ), assets AS (
      SELECT COALESCE(i.source, c.cap_source) AS source,
             (i.asset_id IS NOT NULL AND c.asset_id IS NOT NULL) AS paired,
             (i.asset_id IS NOT NULL AND c.asset_id IS NULL) AS image_only,
             COALESCE(i.img_bytes, 0) AS img_bytes
      FROM imgs i FULL OUTER JOIN caps c USING (asset_id)
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_assets,
           CAST(SUM(CASE WHEN paired THEN 1 ELSE 0 END) AS BIGINT) AS n_paired,
           CAST(SUM(CASE WHEN image_only THEN 1 ELSE 0 END) AS BIGINT) AS n_image_only,
           CAST(SUM(CASE WHEN NOT paired AND NOT image_only THEN 1 ELSE 0 END) AS BIGINT) AS n_caption_only,
           CAST((SUM(CASE WHEN paired THEN 1 ELSE 0 END) * 10000) // COUNT(*) AS BIGINT) AS paired_pct_e4,
           CAST(SUM(img_bytes) AS BIGINT) AS total_img_bytes
    FROM assets GROUP BY source
    """,
    tags=("multimodal", "coverage", "join"),
)
def mm_modality_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Caption↔image pairing coverage per source: the completeness audit
    every multimodal training pipeline runs before building (image,
    caption) pairs — how many assets have both modalities, how many are
    orphaned on either side, and the byte budget the paired subset
    carries. Assets are derived deterministically from the documents
    table (even ids = image payloads, odd = captions; the %7 / %5 drop
    rules stand in for decode failures and missing alt-text), so both
    engines see the identical modality census at any scale factor.

    Scale shape: two scan-local filtered projections of the same table,
    one FULL OUTER equi-join hash-partitioned on asset_id (each side
    narrow: id + source + one integer), then a partial-aggregable rollup
    on the tiny source key space. At 100 TB the join is the only
    shuffle, and it moves ids and counters, never payload bytes."""
    docs = load_table(spark, sf_dir, "documents")
    did = F.col("doc_id")
    # integer `div`, not `/`-then-cast: the double path loses exactness
    # above 2^53 and would silently mispair assets at large doc_ids
    imgs = docs.filter((did % 2 == 0) & (did % 7 != 0)).select(
        F.expr("doc_id div 2").alias("asset_id"),
        F.col("source").alias("img_source"),
        F.col("n_chars").cast("long").alias("img_bytes"),
    )
    caps = docs.filter((did % 2 == 1) & (did % 5 != 0)).select(
        F.expr("(doc_id - 1) div 2").alias("asset_id"),
        F.col("source").alias("cap_source"),
    )
    assets = imgs.join(caps, "asset_id", "full_outer").select(
        F.coalesce("img_source", "cap_source").alias("source"),
        (
            F.col("img_source").isNotNull() & F.col("cap_source").isNotNull()
        ).alias("paired"),
        (
            F.col("img_source").isNotNull() & F.col("cap_source").isNull()
        ).alias("image_only"),
        F.coalesce("img_bytes", F.lit(0)).alias("img_bytes"),
    )
    return assets.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_assets"),
        F.sum(F.when(F.col("paired"), 1).otherwise(0)).cast("long").alias("n_paired"),
        F.sum(F.when(F.col("image_only"), 1).otherwise(0))
        .cast("long").alias("n_image_only"),
        F.sum(F.when(~F.col("paired") & ~F.col("image_only"), 1).otherwise(0))
        .cast("long").alias("n_caption_only"),
        F.expr(
            "(sum(CASE WHEN paired THEN 1 ELSE 0 END) * 10000) div count(1)"
        ).alias("paired_pct_e4"),
        F.sum("img_bytes").cast("long").alias("total_img_bytes"),
    )


# A frame is "quiet" when its mean square sits under RMS 10 (of a +-128
# scale): integer predicate ss < AUDIO_FRAME * 100 — no float RMS compare.
QUIET_MEAN_SQ = 100


@query(
    "mm_audio_silence_ratio",
    oracle=f"""
    WITH ascii_docs AS (
      SELECT doc_id, COALESCE(text, '') AS t FROM documents
      WHERE length(COALESCE(text, '')) = octet_length(encode(COALESCE(text, '')))
    ),
    samples AS (
      SELECT doc_id, i, unicode(substr(t, CAST(i AS INT), 1)) - 128 AS s
      FROM ascii_docs, unnest(range(1, length(t) + 1)) AS u(i)
    ),
    framed AS (
      SELECT doc_id, (i - 1) // {AUDIO_FRAME} AS frame,
             SUM(s * s) AS ss, COUNT(*) AS w
      FROM samples GROUP BY 1, 2
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_frames,
           CAST(SUM(CASE WHEN ss < {AUDIO_FRAME * QUIET_MEAN_SQ} THEN 1 ELSE 0 END) AS BIGINT) AS n_quiet,
           CAST((SUM(CASE WHEN ss < {AUDIO_FRAME * QUIET_MEAN_SQ} THEN 1 ELSE 0 END) * 10000)
                // COUNT(*) AS BIGINT) AS quiet_e4
    FROM framed WHERE w = {AUDIO_FRAME}
    GROUP BY doc_id
    """,
    tags=("multimodal", "audio", "pandas-udf"),
)
def mm_audio_silence_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Silence profile per audio payload: the fraction of {AUDIO_FRAME}-
    sample frames whose energy sits under the quiet line — the trim/drop
    signal of an audio curation pipeline (a mostly-silent clip wastes
    tokens; an all-silent one is a decode failure). Quietness is the
    INTEGER predicate ss < frames x {QUIET_MEAN_SQ} (sum of squares vs a
    mean-square line), so both engines count identical frames — no float
    RMS comparison anywhere.

    Same Arrow-batched payload-local kernel shape as mm_audio_window_rms:
    numpy frombuffer → reshape → per-frame energy, then the per-doc
    rollup happens INSIDE the kernel (one output row per doc), so nothing
    row-per-frame ever shuffles."""
    import numpy as np
    import pandas as pd

    docs = load_table(spark, sf_dir, "documents")
    ascii_docs = docs.select(
        "doc_id",
        F.encode(F.coalesce(F.col("text"), F.lit("")), "UTF-8").alias("payload"),
        F.length(F.coalesce(F.col("text"), F.lit(""))).alias("n_chars_txt"),
    ).filter(F.octet_length("payload") == F.col("n_chars_txt"))

    def kernel(batches):
        for pdf in batches:
            out_doc, out_n, out_q = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = np.frombuffer(bytes(payload), dtype=np.uint8).astype(np.int64) - 128
                n_frames = len(b) // AUDIO_FRAME
                if n_frames == 0:
                    continue
                frames = b[: n_frames * AUDIO_FRAME].reshape(n_frames, AUDIO_FRAME)
                ss = (frames * frames).sum(axis=1)
                out_doc.append(doc_id)
                out_n.append(n_frames)
                out_q.append(int((ss < AUDIO_FRAME * QUIET_MEAN_SQ).sum()))
            yield pd.DataFrame(
                {"doc_id": out_doc, "n_frames": out_n, "n_quiet": out_q}
            )

    framed = ascii_docs.select("doc_id", "payload").mapInPandas(
        kernel, "doc_id long, n_frames long, n_quiet long"
    )
    return framed.select(
        "doc_id", "n_frames", "n_quiet",
        F.expr("(n_quiet * 10000) div n_frames").alias("quiet_e4"),
    )


@query(
    "mm_phash_distance_histogram",
    oracle=_SQL_PHASH_CTES
    + """
    , cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
             CAST(bit_count(xor(a.h_lo, b.h_lo))
                  + bit_count(xor(a.h_hi, b.h_hi)) AS BIGINT) AS hamming
      FROM bands a
      JOIN bands b ON a.band = b.band AND a.bh = b.bh
                  AND a.doc_id < b.doc_id
    )
    SELECT hamming, CAST(COUNT(*) AS BIGINT) AS n_pairs
    FROM cand GROUP BY hamming
    """,
    tags=("multimodal", "phash", "tuning", "pandas-udf"),
)
def mm_phash_distance_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hamming-distance histogram of every banded phash candidate pair
    (no tau cut): the image-dedup threshold-setting telemetry — a bimodal
    histogram (near-dup mass at small distances, a background hump near
    32) says WHERE to put PHASH_HAM_TAU; a merged blob says the hash or
    the banding needs work. The image-side companion of
    `dedup_minhash_threshold_sweep`.

    Scale shape: identical band-bucket candidate generation to the pair
    query (never all-pairs); the histogram rolls onto ≤ 65 keys."""
    pairs = mm_image_phash_pairs(spark, sf_dir, tau=64)
    return pairs.groupBy("hamming").agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs")
    )


@query(
    "mm_video_shot_stats",
    oracle=f"""
    WITH ascii_docs AS (
      SELECT doc_id, COALESCE(text, '') AS t FROM documents
      WHERE length(COALESCE(text, '')) = octet_length(encode(COALESCE(text, '')))
    ),
    samples AS (
      SELECT doc_id,
             CAST((i - 1) // {SCENE_FRAME} AS BIGINT) AS frame,
             CAST((i - 1) % {SCENE_FRAME} AS BIGINT) AS off,
             unicode(substr(t, CAST(i AS INT), 1)) AS s
      FROM ascii_docs, unnest(range(1, length(t) + 1)) AS u(i)
      WHERE i <= (length(t) // {SCENE_FRAME}) * {SCENE_FRAME}
    ),
    diffs AS (
      SELECT doc_id, frame, off,
             s - LAG(s) OVER (PARTITION BY doc_id, off ORDER BY frame) AS d
      FROM samples
    ),
    cuts AS (
      SELECT doc_id, frame,
             (SUM(ABS(d)) * 1 >= {SCENE_CUT_MAD} * {SCENE_FRAME}) AS is_cut
      FROM diffs WHERE d IS NOT NULL GROUP BY 1, 2
    )
    SELECT doc_id,
           CAST(COUNT(*) + 1 AS BIGINT) AS n_frames,
           CAST(SUM(is_cut::INT) + 1 AS BIGINT) AS n_shots,
           CAST(((COUNT(*) + 1) * 1000) // (SUM(is_cut::INT) + 1) AS BIGINT)
             AS mean_shot_frames_e3
    FROM cuts GROUP BY doc_id
    """,
    tags=("multimodal", "video", "pandas-udf"),
)
def mm_video_shot_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shot statistics per video: frame count, shot count (cuts + 1), and
    mean shot length — the pacing profile a video curation pipeline uses
    to separate slideshows (few long shots) from strobing/corrupt clips
    (a cut every frame) before paying for keyframe extraction. Built on
    the scene-cut rollup with an INTEGER cut predicate (sum of absolute
    diffs vs threshold x frame size — no float MAD), so the hash is
    bit-stable.

    Scale shape: the per-(doc, frame) diff rollup is the scene-cut
    query's shape; the per-doc rollup is partial-aggregable on doc_id."""
    cuts = mm_video_scene_cut(spark, sf_dir).select(
        "doc_id",
        # integer re-derivation of the cut flag: mad >= tau  <=>
        # sum|d| >= tau * FRAME; mad = sum|d|/FRAME was a single exact
        # division of integers, so the roundtrip is lossless
        (
            (F.col("mad") * SCENE_FRAME).cast("long")
            >= SCENE_CUT_MAD * SCENE_FRAME
        ).alias("is_cut"),
    )
    return cuts.groupBy("doc_id").agg(
        (F.count(F.lit(1)) + 1).cast("long").alias("n_frames"),
        (F.sum(F.col("is_cut").cast("int")) + 1).cast("long").alias("n_shots"),
        F.expr(
            "((count(1) + 1) * 1000) div (sum(CAST(is_cut AS INT)) + 1)"
        ).alias("mean_shot_frames_e3"),
    )


@query(
    "mm_payload_exact_dedup",
    oracle="""
    WITH g AS (
      -- this DuckDB build's sha256 binds VARCHAR only; hashing the text
      -- is byte-identical to hashing its UTF-8 encoding
      SELECT sha256(COALESCE(text, '')) AS h,
             octet_length(encode(COALESCE(text, ''))) AS n_bytes
      FROM documents
    ),
    grp AS (
      SELECT h, COUNT(*) AS n_copies, MAX(n_bytes) AS n_bytes
      FROM g GROUP BY h
    )
    SELECT CAST(n_copies AS BIGINT) AS n_copies,
           CAST(COUNT(*) AS BIGINT) AS n_groups,
           CAST(SUM((n_copies - 1) * n_bytes) AS BIGINT) AS reclaimable_bytes
    FROM grp GROUP BY n_copies
    """,
    tags=("multimodal", "dedup", "binary"),
)
def mm_payload_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact duplicate profile of the BINARY plane: content-hash the
    payload bytes (sha-256 — the specified, engine-neutral algorithm),
    group identical blobs, and report the copy-count histogram with the
    bytes a keep-one policy would reclaim. This is the first pass of any
    image/audio lake dedup — byte-identical re-uploads dwarf near-dups in
    volume and are free to find; per-group multiplicity also feeds the
    storage-planning question ("how much of the 100 TB is one asset?").

    Scale shape: the hash is computed scan-local next to the payload
    column (bytes never shuffle — only the 32-byte digest does), the
    group is a hash-groupBy on the digest, and the histogram rolls onto
    the tiny copy-count key space. Text-derived payloads stand in for
    real image bytes (TESTDATA has no binary table); the plan is
    byte-source-agnostic."""
    p = _payloads(spark, sf_dir)
    g = p.select(
        F.sha2("payload", 256).alias("h"),
        F.octet_length("payload").alias("n_bytes"),
    )
    grp = g.groupBy("h").agg(
        F.count(F.lit(1)).alias("n_copies"), F.max("n_bytes").alias("n_bytes")
    )
    return grp.groupBy("n_copies").agg(
        F.count(F.lit(1)).cast("long").alias("n_groups"),
        F.sum((F.col("n_copies") - 1) * F.col("n_bytes"))
        .cast("long").alias("reclaimable_bytes"),
    ).select(F.col("n_copies").cast("long").alias("n_copies"),
             "n_groups", "reclaimable_bytes")


@query(
    "mm_image_dedup_keep_best",
    oracle=_SQL_PHASH_CTES.replace("WITH ", "WITH RECURSIVE ", 1)
    + ", pairs AS ("
    + _SQL_PHASH_PAIRS
    + """
    ),
    edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM pairs
      UNION ALL
      SELECT doc_b, doc_a FROM pairs
    ),
    reach(node, lbl) AS (
      SELECT doc_id, doc_id FROM documents
      UNION
      SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.node
    ),
    comp AS (
      SELECT node AS doc_id, CAST(min(lbl) AS BIGINT) AS component
      FROM reach GROUP BY node
    ),
    ranked AS (
      SELECT c.doc_id, c.component,
             CAST(d.n_chars AS BIGINT) AS asset_bytes,
             row_number() OVER (
               PARTITION BY c.component
               ORDER BY d.n_chars DESC, c.doc_id
             ) AS rk,
             COUNT(*) OVER (PARTITION BY c.component) AS n_members
      FROM comp c JOIN documents d ON d.doc_id = c.doc_id
    )
    SELECT doc_id, component, asset_bytes,
           (rk = 1) AS keep, CAST(n_members AS BIGINT) AS n_members
    FROM ranked
    """,
    tags=("multimodal", "phash", "dedup", "pandas-udf"),
)
def mm_image_dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep-best per near-duplicate IMAGE cluster: within each phash
    component, keep the LARGEST asset (byte size as the resolution/quality
    proxy — a crawl's thumbnail/recompressed copies are smaller than the
    original; ties to the lowest doc_id) — the image twin of
    text_dedup_keep_best, completing the multimodal dedup lifecycle
    (pairs → clusters → survivorship decision).

    Scale shape: the cluster labels are a parquet read of the
    materialized image cluster-label index (`phash_cluster_index` — the
    banded phash pair graph + min-label propagation is paid once per
    corpus at ingest), then ONE window over `component` whose
    cardinality is ~n_assets (clusters are tiny), so the rank shuffle is
    well-distributed; the byte column joins back by doc_id."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    comp = phash_cluster_index(spark, sf_dir).select("doc_id", "component")
    sized = comp.join(docs.select("doc_id", "n_chars"), "doc_id").select(
        "doc_id", "component", F.col("n_chars").cast("long").alias("asset_bytes")
    )
    w = Window.partitionBy("component").orderBy(
        F.desc("asset_bytes"), F.asc("doc_id")
    )
    return sized.select(
        "doc_id", "component", "asset_bytes",
        (F.row_number().over(w) == 1).alias("keep"),
        F.count(F.lit(1)).over(Window.partitionBy("component"))
        .cast("long").alias("n_members"),
    )

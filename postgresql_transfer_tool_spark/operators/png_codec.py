"""Real raster decode through the multimodal Arrow stage: PNG via
stdlib ``zlib``/``struct`` (round-13 VERDICT #7).

Every earlier media row parses CONTAINERS (FIMG header, JPEG/TIFF EXIF
structure) without touching pixels. This module closes that gap with a
genuine codec, implemented from the public PNG specification (RFC 2083
/ W3C PNG): chunk walk with CRC-32 verification, IHDR parse, IDAT
reassembly, zlib inflate, and full scanline DE-FILTERING (all five
filter types — None/Sub/Up/Average/Paeth). No new dependencies — the
whole codec is ~100 lines over ``zlib`` + byte arithmetic.

The driver row synthesizes deterministic truecolor PNGs per document
(pixel value = closed-form function of (doc_id, x, y, channel); the
ENCODER cycles the filter type per scanline so all five filters are
exercised on every image taller than 4 rows), decodes them back
through the same Arrow-batched ``mapInPandas`` stage every media
operator uses, and reports exact integer per-channel pixel sums — so
the DuckDB oracle can restate the pixel arithmetic in SQL and a bug in
either direction (filter math, zlib framing, CRC, batch boundaries)
breaks the hash match, not just a row count.

Malformed input quarantines instead of failing the stage (the
reference's error-isolated execution posture,
transfer_data_with_constraints_script.py:38-253 — a bad row never
aborts the batch): a corrupted blob yields (ok=false, err=<category>)
and decodes nothing; a 100 TB crawl always contains malformed files.

100 TB posture: synthesis and decode are chained map-only mapInPandas
stages — blobs are born where the ids live and never shuffle; the only
exchange in the row is the final (tiny) aggregation-free projection.
"""

from __future__ import annotations

import struct
import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..catalog import load_table
from .registry import query

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_BPP = 3  # truecolor, 8-bit: 3 bytes per pixel


# ---------------------------------------------------------------------------
# encoder (fixture side) — forward filtering per the PNG spec
# ---------------------------------------------------------------------------

def _chunk(typ: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + typ
        + data
        + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _filter_line(ft: int, line: bytes, prev: bytes) -> bytes:
    """Forward-apply scanline filter ``ft`` (PNG filter method 0)."""
    out = bytearray(len(line))
    for i, v in enumerate(line):
        left = line[i - _BPP] if i >= _BPP else 0
        up = prev[i]
        upleft = prev[i - _BPP] if i >= _BPP else 0
        if ft == 0:
            pred = 0
        elif ft == 1:
            pred = left
        elif ft == 2:
            pred = up
        elif ft == 3:
            pred = (left + up) // 2
        else:
            pred = _paeth(left, up, upleft)
        out[i] = (v - pred) & 0xFF
    return bytes(out)


def png_encode(rows: list[list[tuple[int, int, int]]]) -> bytes:
    """Encode truecolor 8-bit pixel rows as a spec-valid PNG. The
    filter type cycles ``y % 5`` so every filter is exercised."""
    h = len(rows)
    w = len(rows[0]) if h else 0
    raw = bytearray()
    prev = bytes(_BPP * w)
    for y in range(h):
        line = bytes(v for px in rows[y] for v in px)
        raw.append(y % 5)
        raw += _filter_line(y % 5, line, prev)
        prev = line
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        _PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _chunk(b"IEND", b"")
    )


# ---------------------------------------------------------------------------
# decoder — the real parse: CRC-verified chunk walk, inflate, de-filter
# ---------------------------------------------------------------------------

def png_decode(blob: bytes) -> tuple[int, int, list[bytearray]]:
    """(width, height, scanlines) — each scanline ``_BPP*width`` bytes
    of reconstructed RGB. Raises ``ValueError`` with a stable
    ``<category>:`` prefix on malformed input (the quarantine key)."""
    if blob[:8] != _PNG_SIG:
        raise ValueError(f"bad_signature: {blob[:8]!r}")
    pos = 8
    ihdr = None
    idat = bytearray()
    seen_end = False
    while pos < len(blob):
        if pos + 8 > len(blob):
            raise ValueError("bad_length: truncated chunk header")
        (ln,) = struct.unpack(">I", blob[pos:pos + 4])
        typ = blob[pos + 4:pos + 8]
        data = blob[pos + 8:pos + 8 + ln]
        if len(data) != ln or pos + 12 + ln > len(blob):
            raise ValueError(f"bad_length: truncated {typ!r} chunk")
        (crc,) = struct.unpack(">I", blob[pos + 8 + ln:pos + 12 + ln])
        if zlib.crc32(typ + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"bad_crc: {typ!r} chunk")
        if typ == b"IHDR":
            ihdr = data
        elif typ == b"IDAT":
            idat += data
        elif typ == b"IEND":
            seen_end = True
            break
        pos += 12 + ln
    if ihdr is None or not seen_end:
        raise ValueError("bad_header: missing IHDR or IEND")
    w, h, depth, ctype, comp, filt, interlace = struct.unpack(">IIBBBBB", ihdr)
    if (depth, ctype, comp, filt, interlace) != (8, 2, 0, 0, 0):
        raise ValueError(
            f"bad_header: unsupported (depth={depth}, color={ctype}, "
            f"interlace={interlace}) — this codec decodes truecolor-8 only"
        )
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as exc:
        raise ValueError(f"bad_stream: {exc}") from exc
    stride = _BPP * w
    if len(raw) != h * (1 + stride):
        raise ValueError(
            f"bad_stream: {len(raw)} bytes for {h}x{stride}+filter scanlines"
        )
    out: list[bytearray] = []
    prev = bytearray(stride)
    for y in range(h):
        base = y * (1 + stride)
        ft = raw[base]
        if ft > 4:
            raise ValueError(f"bad_filter: type {ft} on scanline {y}")
        line = bytearray(raw[base + 1:base + 1 + stride])
        for i in range(stride):
            left = line[i - _BPP] if i >= _BPP else 0
            up = prev[i]
            upleft = prev[i - _BPP] if i >= _BPP else 0
            if ft == 1:
                line[i] = (line[i] + left) & 0xFF
            elif ft == 2:
                line[i] = (line[i] + up) & 0xFF
            elif ft == 3:
                line[i] = (line[i] + (left + up) // 2) & 0xFF
            elif ft == 4:
                line[i] = (line[i] + _paeth(left, up, upleft)) & 0xFF
        out.append(line)
        prev = line
    return w, h, out


# ---------------------------------------------------------------------------
# the driver row: closed-form fixture → encode → decode → exact sums
# ---------------------------------------------------------------------------

#: pixel value v(doc_id, x, y, channel) — restated verbatim in the
#: DuckDB oracle, so the decode must recover every byte exactly
def _pix(doc_id: int, x: int, y: int, c: int) -> int:
    return (doc_id * 7 + x * 3 + y * 5 + c * 11) % 256


def _png_fixture_blob(doc_id: int) -> bytes:
    w = 4 + doc_id % 13
    h = 3 + (doc_id // 13) % 11
    rows = [
        [
            (_pix(doc_id, x, y, 0), _pix(doc_id, x, y, 1), _pix(doc_id, x, y, 2))
            for x in range(w)
        ]
        for y in range(h)
    ]
    blob = png_encode(rows)
    if doc_id % 17 == 0:
        # the malformed class: flip one byte of the IDAT CRC (the four
        # bytes immediately before the 12-byte IEND chunk)
        bad = bytearray(blob)
        bad[-16] ^= 0xFF
        blob = bytes(bad)
    return blob


_PNG_SYNTH_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("blob", T.BinaryType()),
    ]
)

PNG_DECODE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("ok", T.BooleanType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("r_sum", T.LongType()),
        T.StructField("g_sum", T.LongType()),
        T.StructField("b_sum", T.LongType()),
        T.StructField("err", T.StringType()),
    ]
)


def synthesize_png_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in it:
        ids = pdf["doc_id"].tolist()
        yield pd.DataFrame(
            {
                "doc_id": ids,
                "media_type": ["image/png"] * len(ids),
                "blob": [_png_fixture_blob(int(i)) for i in ids],
            }
        )


def decode_png_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow-batched decode with per-blob quarantine: a malformed blob
    becomes (ok=false, err=<category>) — it never aborts the batch."""
    for pdf in it:
        recs = []
        for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
            try:
                w, h, lines = png_decode(bytes(blob))
                sums = [0, 0, 0]
                for line in lines:
                    for i, v in enumerate(line):
                        sums[i % _BPP] += v
                recs.append(
                    (int(doc_id), True, w, h, sums[0], sums[1], sums[2], None)
                )
            except ValueError as exc:
                recs.append(
                    (int(doc_id), False, None, None, None, None, None,
                     str(exc).split(":", 1)[0])
                )
        yield pd.DataFrame.from_records(
            recs, columns=[f.name for f in PNG_DECODE_SCHEMA.fields]
        ).astype(
            {
                "width": "Int32",
                "height": "Int32",
                "r_sum": "Int64",
                "g_sum": "Int64",
                "b_sum": "Int64",
            }
        )


#: driver-gate bound, same rationale as the EXIF row's cap
_PNG_MAX_DOC = 300


@query(
    "png_decode_pixel_sums",
    oracle=f"""
    WITH ids AS (
      SELECT doc_id,
             4 + doc_id % 13 AS w,
             3 + (doc_id // 13) % 11 AS h
      FROM documents WHERE doc_id < {_PNG_MAX_DOC}
    ),
    px AS (
      SELECT i.doc_id,
             CAST(SUM((i.doc_id*7 + xs.range*3 + ys.range*5) % 256)
                  AS BIGINT) AS r_sum,
             CAST(SUM((i.doc_id*7 + xs.range*3 + ys.range*5 + 11) % 256)
                  AS BIGINT) AS g_sum,
             CAST(SUM((i.doc_id*7 + xs.range*3 + ys.range*5 + 22) % 256)
                  AS BIGINT) AS b_sum
      FROM ids i, range(0, 16) xs, range(0, 13) ys
      WHERE xs.range < i.w AND ys.range < i.h
      GROUP BY i.doc_id
    )
    SELECT i.doc_id,
           (i.doc_id % 17 <> 0) AS ok,
           CASE WHEN i.doc_id % 17 <> 0 THEN CAST(i.w AS INTEGER) END AS width,
           CASE WHEN i.doc_id % 17 <> 0 THEN CAST(i.h AS INTEGER) END AS height,
           CASE WHEN i.doc_id % 17 <> 0 THEN p.r_sum END AS r_sum,
           CASE WHEN i.doc_id % 17 <> 0 THEN p.g_sum END AS g_sum,
           CASE WHEN i.doc_id % 17 <> 0 THEN p.b_sum END AS b_sum,
           CASE WHEN i.doc_id % 17 = 0 THEN 'bad_crc' END AS err
    FROM ids i JOIN px p USING (doc_id)
    """,
)
def png_decode_pixel_sums(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X6 with a REAL codec (round-13 VERDICT #7): spec-valid truecolor
    PNGs are synthesized per document from a closed-form pixel function
    (filter type cycling over all five per scanline), then decoded back
    — CRC-verified chunk walk, zlib inflate, full de-filtering — by the
    same Arrow-batched mapInPandas stage every media operator uses.
    Exact per-channel integer pixel sums must hash-match the oracle's
    SQL restatement of the pixel arithmetic, so any defect in the
    filter math, zlib framing, CRC handling, or Arrow batch boundaries
    is a value mismatch. The doc_id%17 class carries a corrupted IDAT
    CRC and must quarantine (ok=false, err='bad_crc') — error-isolated
    execution, the reference's constraint-script posture."""
    docs = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < _PNG_MAX_DOC)
        .select("doc_id")
    )
    blobs = docs.mapInPandas(synthesize_png_batches, _PNG_SYNTH_SCHEMA)
    return blobs.mapInPandas(decode_png_batches, PNG_DECODE_SCHEMA)

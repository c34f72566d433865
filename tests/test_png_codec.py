"""PNG codec (operators/png_codec.py — round-13 VERDICT #7): a real
raster decode (CRC chunk walk, zlib inflate, all five scanline
filters) through the standard Arrow-batched media stage, plus the
malformed-blob quarantine matrix."""

from __future__ import annotations

import random
import struct
import zlib

import pytest

from postgresql_transfer_tool_spark.operators.png_codec import (
    _PNG_SIG,
    _png_fixture_blob,
    decode_png_batches,
    png_decode,
    png_encode,
    synthesize_png_batches,
    PNG_DECODE_SCHEMA,
    _PNG_SYNTH_SCHEMA,
    _pix,
)


def _rand_rows(rnd, w, h):
    return [
        [
            (rnd.randrange(256), rnd.randrange(256), rnd.randrange(256))
            for _ in range(w)
        ]
        for _ in range(h)
    ]


def test_roundtrip_property():
    """encode → decode is the identity for arbitrary truecolor images.
    The directions are independent inverses (forward vs reverse filter
    per the spec), so a filter-math bug in either breaks this."""
    rnd = random.Random(20260816)
    for _ in range(40):
        w, h = rnd.randint(1, 24), rnd.randint(1, 24)
        rows = _rand_rows(rnd, w, h)
        w2, h2, lines = png_decode(png_encode(rows))
        assert (w2, h2) == (w, h)
        for y in range(h):
            got = [
                (lines[y][3 * x], lines[y][3 * x + 1], lines[y][3 * x + 2])
                for x in range(w)
            ]
            assert got == rows[y]


def test_all_five_filters_exercised():
    """Images ≥5 rows cycle through every filter type — assert the
    encoder actually emits all five (guards a silent fallback to
    filter 0, which would make the de-filter paths dead code)."""
    rows = _rand_rows(random.Random(1), 6, 7)
    blob = png_encode(rows)
    # walk to the IDAT payload and inflate it
    pos = 8
    idat = b""
    while pos < len(blob):
        (ln,) = struct.unpack(">I", blob[pos:pos + 4])
        typ = blob[pos + 4:pos + 8]
        if typ == b"IDAT":
            idat += blob[pos + 8:pos + 8 + ln]
        pos += 12 + ln
    raw = zlib.decompress(idat)
    stride = 3 * 6
    fts = {raw[y * (1 + stride)] for y in range(7)}
    assert fts == {0, 1, 2, 3, 4}


@pytest.mark.parametrize(
    "corrupt,category",
    [
        (lambda b: b"JUNK" + b[4:], "bad_signature"),
        (lambda b: _flip(b, -16), "bad_crc"),            # IDAT CRC
        (lambda b: _flip(b, 16), "bad_crc"),             # IHDR payload
        (lambda b: b[:-30], "bad_length"),               # truncated mid-IDAT
        (lambda b: _zlib_junk(b), "bad_stream"),         # undecompressable
        (lambda b: _short_stream(b), "bad_stream"),      # wrong pixel count
        (lambda b: _bad_filter(b), "bad_filter"),        # filter type 9
        (lambda b: _interlaced(b), "bad_header"),        # Adam7 unsupported
    ],
)
def test_malformed_blob_categories(corrupt, category):
    good = png_encode(_rand_rows(random.Random(3), 5, 5))
    with pytest.raises(ValueError, match=f"^{category}"):
        png_decode(corrupt(good))


def _flip(b: bytes, i: int) -> bytes:
    out = bytearray(b)
    out[i] ^= 0xFF
    return bytes(out)


def _rechunk(b: bytes, mutate):
    """Rebuild the PNG with per-chunk mutation + fresh CRCs (so the
    corruption under test is reached instead of tripping bad_crc)."""
    pos, out = 8, bytearray(_PNG_SIG)
    while pos < len(b):
        (ln,) = struct.unpack(">I", b[pos:pos + 4])
        typ = bytes(b[pos + 4:pos + 8])
        data = bytes(b[pos + 8:pos + 8 + ln])
        typ, data = mutate(typ, data)
        out += struct.pack(">I", len(data)) + typ + data
        out += struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        pos += 12 + ln
    return bytes(out)


def _zlib_junk(b: bytes) -> bytes:
    return _rechunk(
        b, lambda t, d: (t, b"\x00junknotzlib" if t == b"IDAT" else d)
    )


def _short_stream(b: bytes) -> bytes:
    return _rechunk(
        b,
        lambda t, d: (t, zlib.compress(b"\x00" * 7) if t == b"IDAT" else d),
    )


def _bad_filter(b: bytes) -> bytes:
    def mut(t, d):
        if t != b"IDAT":
            return t, d
        raw = bytearray(zlib.decompress(d))
        raw[0] = 9
        return t, zlib.compress(bytes(raw))

    return _rechunk(b, mut)


def _interlaced(b: bytes) -> bytes:
    def mut(t, d):
        if t != b"IHDR":
            return t, d
        out = bytearray(d)
        out[12] = 1  # Adam7
        return t, bytes(out)

    return _rechunk(b, mut)


def test_decode_stage_quarantines_inline(spark):
    """The Spark stage: synthesized fixture blobs (including the
    doc_id%17 corrupted-CRC class) through both mapInPandas stages —
    good docs decode to the closed-form sums, bad docs quarantine with
    a category, nothing aborts."""
    ids = spark.range(0, 40).withColumnRenamed("id", "doc_id")
    blobs = ids.mapInPandas(synthesize_png_batches, _PNG_SYNTH_SCHEMA)
    got = {
        r.doc_id: r
        for r in blobs.mapInPandas(
            decode_png_batches, PNG_DECODE_SCHEMA
        ).collect()
    }
    assert set(got) == set(range(40))
    for d, r in got.items():
        if d % 17 == 0:
            assert (r.ok, r.err, r.width) == (False, "bad_crc", None)
        else:
            w, h = 4 + d % 13, 3 + (d // 13) % 11
            want = [
                sum(_pix(d, x, y, c) for x in range(w) for y in range(h))
                for c in range(3)
            ]
            assert (r.ok, r.err) == (True, None)
            assert (r.width, r.height) == (w, h)
            assert [r.r_sum, r.g_sum, r.b_sum] == want

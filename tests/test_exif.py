"""EXIF-style metadata extraction (operators/multimodal.py, VERDICT r6
"Next round" #8).

The extractor is codec-free byte parsing of the JPEG APP1/TIFF
structure, so — unlike the pixel-decode branch — it needs no Pillow and
runs in every environment. Fixtures are hand-constructed deterministic
JPEG byte streams (both TIFF byte orders, inline and offset values),
plus the malformed shapes a web-scale crawl is guaranteed to contain.
"""

from __future__ import annotations

import struct

from postgresql_transfer_tool_spark.operators.multimodal import (
    EXIF_SCHEMA,
    exif_metadata,
    extract_exif,
    jpeg_bytes,
    tiff_bytes,
)

# the builders moved into the engine in round 9 (the driver-gated
# exif_metadata_extract query synthesizes its fixtures with them)
_tiff = tiff_bytes
_jpeg = jpeg_bytes


TAGS = [
    (271, 2, b"TestCam"),              # Make (offset ASCII)
    (272, 2, b"X1"),                   # Model (inline ASCII, <= 4 bytes)
    (274, 3, 6),                       # Orientation (inline SHORT)
    (306, 2, b"2026:08:15 04:00:00"),  # DateTime (offset ASCII)
]


def test_extract_exif_both_byte_orders():
    for endian in ("II", "MM"):
        tags = extract_exif(_jpeg(_tiff(endian, TAGS), extra_app0=True))
        assert tags is not None, endian
        assert tags[271] == "TestCam"
        assert tags[272] == "X1"
        assert tags[274] == 6
        assert tags[306] == "2026:08:15 04:00:00"


def test_extract_exif_rejects_garbage_without_raising():
    assert extract_exif(b"") is None
    assert extract_exif(b"FIMG|0016|0017|payload") is None   # not a JPEG
    assert extract_exif(_jpeg(None)) is None                 # JPEG, no APP1
    assert extract_exif(_jpeg(b"XX" + b"\x00" * 12)) is None  # bad TIFF magic
    good = _jpeg(_tiff("II", TAGS))
    assert extract_exif(good[:20]) is None                   # truncated
    # corrupt segment length must not raise either
    bad = bytearray(good)
    bad[5] = 0xFF
    assert extract_exif(bytes(bad)) in (None, {})


def test_exif_stage_schema_stable_over_mixed_blobs(spark):
    rows = [
        (1, "image/jpeg", bytearray(_jpeg(_tiff("II", TAGS), extra_app0=True))),
        (2, "image/jpeg", bytearray(_jpeg(_tiff("MM", TAGS[:1])))),
        (3, "image/jpeg", bytearray(_jpeg(None))),             # no EXIF
        (4, "image/fake", bytearray(b"FIMG|0016|0017|x" * 2)),  # non-JPEG
    ]
    media = spark.createDataFrame(
        rows, "doc_id bigint, media_type string, blob binary"
    )
    out = exif_metadata(media)
    assert out.schema == EXIF_SCHEMA
    got = {r.doc_id: r for r in out.collect()}
    assert len(got) == 4
    r1 = got[1]
    assert (r1.has_exif, r1.make, r1.model, r1.orientation, r1.taken_at) == (
        True, "TestCam", "X1", 6, "2026:08:15 04:00:00",
    )
    assert (got[2].has_exif, got[2].make, got[2].model) == (True, "TestCam", None)
    for d in (3, 4):
        r = got[d]
        assert (r.has_exif, r.make, r.model, r.orientation, r.taken_at) == (
            False, None, None, None, None,
        )
    # map-only stage: metadata extraction never shuffles blobs
    from postgresql_transfer_tool_spark.plans import count_exchanges

    assert count_exchanges(out) == 0


def test_fill_bytes_before_marker_are_skipped():
    # JPEG permits 0xFF padding before a marker code; EXIF must survive
    tiff = _tiff("II", TAGS)
    payload = b"Exif\x00\x00" + tiff
    padded = (
        b"\xff\xd8"
        + b"\xff\xff\xff"  # fill bytes
        + b"\xff\xe1" + struct.pack(">H", len(payload) + 2) + payload
        + b"\xff\xd9"
    )
    tags = extract_exif(padded)
    assert tags is not None and tags[271] == "TestCam"


def test_type_confused_tags_degrade_to_null_not_crash(spark):
    # orientation stored as ASCII, make stored as SHORT: the stage must
    # yield NULLs for the misdeclared tags, never fail the Spark task
    weird = _tiff("II", [(271, 3, 7), (274, 2, b"abc"), (306, 2, b"2026:01:01 00:00:00")])
    blob = _jpeg(weird)
    assert extract_exif(blob)[271] == 7  # raw parse keeps the claimed type
    media = spark.createDataFrame(
        [(1, "image/jpeg", bytearray(blob))],
        "doc_id bigint, media_type string, blob binary",
    )
    from postgresql_transfer_tool_spark.operators.multimodal import exif_metadata

    r = exif_metadata(media).collect()[0]
    assert r.has_exif is True
    assert r.make is None and r.orientation is None
    assert r.taken_at == "2026:01:01 00:00:00"


def test_exif_registry_query_is_map_only_and_closed_form(spark):
    """The driver-gated query (synthesize → parse) never shuffles and
    matches the closed-form spec on a spot-checked modulus sample."""
    from postgresql_transfer_tool_spark.operators.multimodal import (
        exif_metadata_extract,
    )
    from postgresql_transfer_tool_spark.plans import count_exchanges

    out = exif_metadata_extract(spark, "/root/testdata/sf0.001")
    assert count_exchanges(out) == 0
    got = {r.doc_id: r for r in out.collect()}
    r1 = got[1]  # MM byte order, no APP0
    assert (r1.has_exif, r1.make, r1.model, r1.orientation, r1.taken_at) == (
        True, "Cam1", "M1", 2, "2026:01:02 00:00:00",
    )
    r6 = got[6]  # II byte order + APP0 ahead of APP1
    assert (r6.has_exif, r6.make, r6.orientation) == (True, "Cam1", 7)
    r0 = got[0]  # % 7 == 0: JPEG without EXIF
    assert (r0.has_exif, r0.make, r0.model, r0.orientation, r0.taken_at) == (
        False, None, None, None, None,
    )

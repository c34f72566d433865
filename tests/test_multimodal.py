"""Tests for the multimodal decode plumbing (mapInPandas stub stage)."""

from __future__ import annotations

from postgresql_transfer_tool_spark.operators.multimodal import (
    DECODE_SCHEMA,
    media_decode_pipeline,
)


def test_decode_schema_and_counts(spark, sf_dir):
    decoded = media_decode_pipeline(spark, sf_dir)
    assert decoded.schema == DECODE_SCHEMA
    rows = decoded.collect()
    assert len(rows) == 500  # one per document
    for r in rows[:20]:
        assert r["n_bytes"] > 0
        assert 16 <= r["width"] < 80 and 16 <= r["height"] < 80
        assert len(r["feature"]) == 4


def test_decode_deterministic(spark, sf_dir):
    a = {r["doc_id"]: tuple(r["feature"]) for r in media_decode_pipeline(spark, sf_dir).collect()}
    b = {r["doc_id"]: tuple(r["feature"]) for r in media_decode_pipeline(spark, sf_dir).collect()}
    assert a == b


def test_decode_partition_parallel(spark, sf_dir):
    # the decode must run per-partition (no driver collect): repartition
    # and confirm the stage still yields every row exactly once
    decoded = media_decode_pipeline(spark, sf_dir)
    n = decoded.repartition(8).count()
    assert n == 500


def test_decode_rejects_bad_magic():
    import pytest

    from postgresql_transfer_tool_spark.operators.multimodal import _parse_decode

    with pytest.raises(ValueError):
        _parse_decode(b"JPEG|0020|0020|payload")


def test_decode_roundtrips_header():
    from postgresql_transfer_tool_spark.operators.multimodal import _parse_decode

    w, h, feat = _parse_decode(b"FIMG|0037|0079|" + b"x" * 100)
    assert (w, h) == (37, 79)
    assert feat == [100.0, float((ord("x") * 32) % 251), 37.0, 79.0]


def test_resize_dims_within_box(spark, sf_dir):
    from postgresql_transfer_tool_spark.operators.multimodal import (
        RESIZE_SCHEMA,
        THUMB_MAX,
        media_table,
        resize_media_batches,
    )

    rows = (
        media_table(spark, sf_dir)
        .mapInPandas(resize_media_batches, RESIZE_SCHEMA)
        .collect()
    )
    assert len(rows) == 500
    for r in rows:
        assert 1 <= r["new_width"] <= THUMB_MAX
        assert 1 <= r["new_height"] <= THUMB_MAX
        # the longest side hits the box (integer resize keeps aspect)
        assert max(r["new_width"], r["new_height"]) == THUMB_MAX
        assert r["thumb_chars"] <= r["new_width"] * r["new_height"]


def test_frame_sample_covers_every_doc_and_stride(spark, sf_dir):
    from postgresql_transfer_tool_spark.operators.multimodal import (
        FRAME_SAMPLE_EVERY,
        FRAME_SCHEMA,
        frame_sample_batches,
        media_table,
    )

    frames = (
        media_table(spark, sf_dir)
        .mapInPandas(frame_sample_batches, FRAME_SCHEMA)
        .collect()
    )
    by_doc = {}
    for r in frames:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert len(by_doc) == 500  # every video yields >= 1 sampled frame
    for doc_id, rs in by_doc.items():
        idxs = sorted(r["frame_idx"] for r in rs)
        n_frames = rs[0]["n_frames"]
        assert idxs == list(range(0, n_frames, FRAME_SAMPLE_EVERY)), doc_id


def test_binaryfile_source_ingests_media_blobs(spark, tmp_path):
    """Real multimodal ingest path: FIMG containers written as files on
    disk, read back via Spark's binaryFile source, and decoded through
    the same Arrow-batched pipeline the parquet-backed media table uses
    — the (path, length, content) → decode shape a 100 TB image lake
    runs, where the scan parallelizes per file and decode stays
    map-only."""
    from pyspark.sql import functions as F

    from postgresql_transfer_tool_spark.operators.multimodal import (
        DECODE_SCHEMA,
        decode_media_batches,
    )

    blobs = {
        17: b"FIMG|0020|0040|" + b"alpha payload",
        23: b"FIMG|0064|0016|" + b"b" * 100,
        31: b"FIMG|0033|0033|" + b"third-doc-bytes",
    }
    for doc_id, blob in blobs.items():
        (tmp_path / f"{doc_id}.fimg").write_bytes(blob)

    files = spark.read.format("binaryFile").load(str(tmp_path))
    media = files.select(
        F.regexp_extract(F.col("path"), r"(\d+)\.fimg$", 1)
        .cast("long")
        .alias("doc_id"),
        F.lit("image/fake").alias("media_type"),
        F.col("content").alias("blob"),
    )
    decoded = {
        r["doc_id"]: r for r in media.mapInPandas(decode_media_batches, DECODE_SCHEMA).collect()
    }
    assert set(decoded) == set(blobs)
    assert (decoded[17]["width"], decoded[17]["height"]) == (20, 40)
    assert (decoded[23]["width"], decoded[23]["height"]) == (64, 16)
    assert decoded[31]["n_bytes"] == len(blobs[31])


def test_jpeg_decode_without_pillow_raises_clearly():
    """Without Pillow, a JPEG blob must fail loudly — not mis-parse as
    FIMG. (The positive-path test below runs iff Pillow is present.)"""
    import pytest

    from postgresql_transfer_tool_spark.operators import multimodal as mm

    if mm._PILImage is not None:
        pytest.skip("Pillow installed; covered by the positive-path test")
    with pytest.raises(NotImplementedError, match="Pillow"):
        mm._parse_decode(b"\xff\xd8\xff\xe0" + b"\x00" * 32)


def test_jpeg_decode_with_pillow(spark):
    """Runs iff Pillow is importable (directive r5 #5): a generated
    JPEG goes through the SAME mapInPandas decode contract as FIMG —
    schema parity with DECODE_SCHEMA, correct dims, deterministic
    features across two runs."""
    import io

    import pytest

    PIL_Image = pytest.importorskip("PIL.Image")
    import numpy as np

    from postgresql_transfer_tool_spark.operators.multimodal import (
        DECODE_SCHEMA,
        decode_media_batches,
    )

    rng = np.random.default_rng(7)  # deterministic test image
    img = PIL_Image.fromarray(
        rng.integers(0, 256, size=(24, 32, 3), dtype=np.uint8), "RGB"
    )
    buf = io.BytesIO()
    img.save(buf, format="JPEG", quality=90)
    blob = buf.getvalue()
    assert blob[:3] == b"\xff\xd8\xff"

    df = spark.createDataFrame(
        [(1, "image/jpeg", bytearray(blob))],
        "doc_id long, media_type string, blob binary",
    )
    out = df.mapInPandas(decode_media_batches, DECODE_SCHEMA)
    assert out.schema == DECODE_SCHEMA
    r1 = out.collect()
    r2 = df.mapInPandas(decode_media_batches, DECODE_SCHEMA).collect()
    assert r1 == r2  # deterministic
    row = r1[0]
    assert (row.width, row.height) == (32, 24)
    assert row.n_bytes == len(blob)
    assert row.feature[3] == 32 * 24
    assert all(0.0 <= c <= 255.0 for c in row.feature[:3])

"""Multimodal-column operators — X6 (SURVEY.md §2.8).

Images/audio/video are opaque ``binary`` columns with typed metadata
(the lakehouse-standard encoding). The fixtures carry no real media, so:

- the *Spark-side plumbing* is real and oracle-checked: binary encode /
  length / content-hash / hex-prefix over text-derived blobs, and the
  embedding column as the already-multimodal ``array<float>`` case;
- the *decode* step runs a real header parse over a deterministic FIMG
  container format behind ``mapInPandas`` (real schema, partitioning,
  Arrow batch shape), oracle-checked by mirroring the parse in SQL on
  the blob prefix;
- real JPEG blobs take a Pillow-backed branch of the SAME
  ``mapInPandas`` contract when Pillow is importable (optional
  dependency — this sandbox ships without media libs); without Pillow
  a JPEG blob raises a clear NotImplementedError instead of
  mis-parsing. The driver-gated FIMG query is unchanged either way.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..catalog import load_table
from .registry import query


@query(
    "binary_column_plumbing",
    oracle="""
    SELECT source,
           CAST(SUM(octet_length(encode(text))) AS BIGINT) AS total_bytes,
           COUNT(DISTINCT md5(text)) AS n_distinct_blobs,
           MIN(substr(hex(encode(substr(text, 1, 4))), 1, 8)) AS min_hex_prefix
    FROM documents GROUP BY source
    """,
)
def binary_column_plumbing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BinaryType column handling end-to-end: encode → byte length →
    content hash → hex. This is the metadata path a 100 TB media table
    runs on (the blob bytes themselves never leave the scan unless a
    decode stage asks for them)."""
    docs = load_table(spark, sf_dir, "documents")
    blob = F.encode("text", "UTF-8")
    return docs.groupBy("source").agg(
        F.sum(F.octet_length(blob)).alias("total_bytes"),
        F.countDistinct(F.md5("text")).alias("n_distinct_blobs"),
        F.min(F.substring(F.hex(F.encode(F.substring("text", 1, 4), "UTF-8")), 1, 8)).alias(
            "min_hex_prefix"
        ),
    )


@query(
    "embedding_column_stats",
    oracle="""
    SELECT label,
           COUNT(*) AS n_vectors,
           MIN(len(embedding)) AS min_dim,
           MAX(len(embedding)) AS max_dim,
           CAST(SUM(len(list_filter(embedding, v -> v > 0))) AS BIGINT) AS n_positive
    FROM embeddings GROUP BY label
    """,
)
def embedding_column_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ArrayType(FloatType) hygiene stats — dimension consistency and
    sign distribution per label; the schema-validation pass a vector
    pipeline runs before indexing."""
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.groupBy("label").agg(
        F.count("*").alias("n_vectors"),
        F.min(F.size("embedding")).alias("min_dim"),
        F.max(F.size("embedding")).alias("max_dim"),
        F.sum(F.size(F.filter("embedding", lambda v: v > 0))).alias("n_positive"),
    )


# ---------------------------------------------------------------------------
# Decode stage: mapInPandas over a deterministic FIMG container format.
#
# The container has no real media libs, so the fixture blobs use a tiny
# self-describing format — ``FIMG|wwww|hhhh|`` (15 ASCII bytes: magic,
# zero-padded width, zero-padded height) followed by the payload — and
# the decoder PARSES the header for real (bad magic raises). Swapping
# in a real codec (PIL/librosa) replaces only ``_parse_decode``; the
# Spark plumbing (schema, Arrow batches, partition-parallel) is
# identical. Because the header is parseable by string/bit arithmetic,
# the aggregate query carries a full DuckDB oracle that mirrors the
# parse on the blob prefix (VERDICT r2 "Next round" #4).
# ---------------------------------------------------------------------------

DECODE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)

#: header layout: bytes 0-4 magic "FIMG|", 5-8 width, 9 "|", 10-13
#: height, 14 "|", 15.. payload
_HDR_LEN = 15

try:  # optional dependency (VERDICT r5 directive #5): real JPEG decode
    from PIL import Image as _PILImage
except ImportError:  # pragma: no cover - exercised when Pillow absent
    _PILImage = None

_JPEG_MAGIC = b"\xff\xd8\xff"


def _parse_decode_jpeg(blob: bytes) -> tuple[int, int, list[float]]:
    """Pillow-backed JPEG decode into the same (width, height, feature)
    contract as the FIMG path: feature = per-channel RGB means plus the
    pixel count — deterministic for a given blob (libjpeg decode is
    deterministic for baseline JPEGs)."""
    if _PILImage is None:
        raise NotImplementedError(
            "JPEG blob but Pillow is not installed — the real-codec "
            "decode branch needs the optional 'Pillow' dependency"
        )
    import io

    import numpy as np

    img = _PILImage.open(io.BytesIO(blob))
    width, height = img.size
    arr = np.asarray(img.convert("RGB"), dtype=np.float64)
    feature = [
        float(arr[..., 0].mean()),
        float(arr[..., 1].mean()),
        float(arr[..., 2].mean()),
        float(width * height),
    ]
    return width, height, feature


def _parse_decode(blob: bytes) -> tuple[int, int, list[float]]:
    """Decode one FIMG container: parse dims from the header, derive a
    4-dim feature from the payload (payload length, byte checksum, and
    the parsed dims — deterministic; a real extractor slots in here)."""
    if blob[:3] == _JPEG_MAGIC:
        return _parse_decode_jpeg(blob)
    if blob[:5] != b"FIMG|" or blob[9:10] != b"|" or blob[14:15] != b"|":
        raise ValueError(f"not a FIMG container: {blob[:15]!r}")
    width = int(blob[5:9])
    height = int(blob[10:14])
    payload = blob[_HDR_LEN:]
    checksum = sum(payload[:32])
    feature = [float(len(payload)), float(checksum % 251), float(width), float(height)]
    return width, height, feature


def decode_media_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow-batched decode: one pandas DataFrame per batch, vectorized
    per partition — the shape a real image/audio decode runs in."""
    for pdf in it:
        widths, heights, feats = [], [], []
        for blob in pdf["blob"]:
            w, h, f = _parse_decode(bytes(blob))
            widths.append(w)
            heights.append(h)
            feats.append(f)
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "media_type": pdf["media_type"],
                "n_bytes": [len(bytes(b)) for b in pdf["blob"]],
                "width": pd.array(widths, dtype="int32"),
                "height": pd.array(heights, dtype="int32"),
                "feature": feats,
            }
        )


def media_blobs_from_docs(docs: DataFrame) -> DataFrame:
    """(doc_id, media_type, blob) for any (doc_id, text, ...) relation:
    one FIMG blob per document, dims derived from the payload size,
    header written with JVM-side expressions (the fixture-side encoder
    matching _parse_decode). Factored out of :func:`media_table` so the
    streaming funnel can derive media evidence for its own micro-batch
    relations (round-13 VERDICT #3)."""
    payload = F.encode("text", "UTF-8")
    n = F.octet_length(payload)
    header = F.format_string(
        "FIMG|%04d|%04d|",
        F.lit(16) + n % 64,
        F.lit(16) + F.floor(n / 64).cast("int") % 64,
    )
    return docs.select(
        "doc_id",
        F.lit("image/fake").alias("media_type"),
        F.concat(F.encode(header, "UTF-8"), payload).alias("blob"),
    )


def media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The synthetic media table over the documents fixture."""
    return media_blobs_from_docs(load_table(spark, sf_dir, "documents"))


def media_decode_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """media table (binary blobs) → mapInPandas decode → typed metadata
    + feature vector. Tested in tests/test_multimodal.py; the aggregate
    view below is oracle-checked against a DuckDB mirror of the header
    parse."""
    return media_table(spark, sf_dir).mapInPandas(decode_media_batches, DECODE_SCHEMA)


@query(
    "media_decode_features",
    oracle="""
    WITH media AS (
      SELECT 'image/fake' AS media_type,
             encode('FIMG|'
                    || lpad(CAST(16 + octet_length(encode(text)) % 64
                                 AS VARCHAR), 4, '0')
                    || '|'
                    || lpad(CAST(16 + (octet_length(encode(text)) // 64) % 64
                                 AS VARCHAR), 4, '0')
                    || '|') || encode(text) AS blob
      FROM documents
    ), parsed AS (
      -- mirror of _parse_decode on the blob prefix (header is ASCII,
      -- so character positions == byte positions)
      SELECT media_type,
             octet_length(blob) AS n_bytes,
             CAST(substr(decode(blob), 6, 4) AS INTEGER) AS width,
             CAST(substr(decode(blob), 11, 4) AS INTEGER) AS height
      FROM media
    )
    SELECT media_type,
           COUNT(*) AS n_media,
           CAST(SUM(n_bytes) AS BIGINT) AS total_bytes,
           MIN(width) AS min_width,
           MAX(height) AS max_height
    FROM parsed GROUP BY media_type
    """,
)
def media_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregated view of the decode stage. The Spark side runs the REAL
    decode path (mapInPandas header parse); the oracle re-derives the
    same metadata from the blob prefix in SQL — so a parse bug, a batch
    boundary bug, or an encoder/decoder mismatch all surface as a hash
    mismatch, not just a row-count drift."""
    decoded = media_decode_pipeline(spark, sf_dir)
    return decoded.groupBy("media_type").agg(
        F.count("*").alias("n_media"),
        F.sum("n_bytes").alias("total_bytes"),
        F.min("width").alias("min_width"),
        F.max("height").alias("max_height"),
    )


# ---------------------------------------------------------------------------
# Resize + frame-sample: the remaining verbs of the multimodal surface
# (decode and feature-extract are above). Both run the REAL Spark shape
# — Arrow-batched mapInPandas doing Python work on decoded payloads —
# and both stay fully oracle-checked (including content hashes) by
# defining pixels/frames over the *character* sequence of the payload,
# which Python slicing and SQL substr() index identically (code
# points; the fixture corpus is ASCII so bytes == chars too). A real
# codec swaps the character math for PIL.Image.resize / PyAV frame
# iteration inside the same batch functions.
# ---------------------------------------------------------------------------

#: thumbnail bounding box (longest side after resize)
THUMB_MAX = 32

RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("new_width", T.IntegerType()),
        T.StructField("new_height", T.IntegerType()),
        T.StructField("thumb_chars", T.LongType()),
        T.StructField("thumb_md5", T.StringType()),
    ]
)


def resize_media_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow-batched thumbnail stage: parse the FIMG header, integer
    aspect-preserving resize to a THUMB_MAX box, window the payload to
    the thumbnail's pixel budget, and fingerprint the result."""
    import hashlib

    for pdf in it:
        out = {k: [] for k in ("width", "height", "new_width", "new_height",
                               "thumb_chars", "thumb_md5")}
        for blob in pdf["blob"]:
            w, h, _ = _parse_decode(bytes(blob))
            long_side = max(w, h)
            nw = max(1, (w * THUMB_MAX) // long_side)
            nh = max(1, (h * THUMB_MAX) // long_side)
            text = bytes(blob)[_HDR_LEN:].decode("utf-8")
            thumb = text[: nw * nh]
            out["width"].append(w)
            out["height"].append(h)
            out["new_width"].append(nw)
            out["new_height"].append(nh)
            out["thumb_chars"].append(len(thumb))
            out["thumb_md5"].append(hashlib.md5(thumb.encode("utf-8")).hexdigest())
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "media_type": pdf["media_type"],
                "width": pd.array(out["width"], dtype="int32"),
                "height": pd.array(out["height"], dtype="int32"),
                "new_width": pd.array(out["new_width"], dtype="int32"),
                "new_height": pd.array(out["new_height"], dtype="int32"),
                "thumb_chars": out["thumb_chars"],
                "thumb_md5": out["thumb_md5"],
            }
        )


@query(
    "media_resize_thumbnails",
    oracle=f"""
    WITH media AS (
      SELECT doc_id, text,
             16 + octet_length(encode(text)) % 64 AS w,
             16 + (octet_length(encode(text)) // 64) % 64 AS h
      FROM documents
    ), resized AS (
      SELECT doc_id, w, h,
             greatest(1, (w * {THUMB_MAX}) // greatest(w, h)) AS nw,
             greatest(1, (h * {THUMB_MAX}) // greatest(w, h)) AS nh,
             text
      FROM media
    )
    SELECT 'image/fake' AS media_type,
           COUNT(*) AS n_media,
           MIN(nw) AS min_new_width,
           MAX(nh) AS max_new_height,
           CAST(SUM(length(substr(text, 1, nw * nh))) AS BIGINT) AS total_thumb_chars,
           COUNT(DISTINCT md5(substr(text, 1, nw * nh))) AS n_distinct_thumbs
    FROM resized GROUP BY 1
    """,
)
def media_resize_thumbnails(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Thumbnail the media table: aspect-preserving integer resize into
    a 32×32 (THUMB_MAX) box plus a payload window sized to the new
    pixel budget, Arrow-batched through mapInPandas. The oracle mirrors
    the full stage — dims arithmetic AND thumbnail content hashes — so
    a batching bug or an off-by-one in the window surfaces as a hash
    mismatch. At 100 TB resize is map-only (no shuffle before the
    summary agg) and scales with executors; blobs stream through Arrow
    batches and never materialize on the driver."""
    resized = media_table(spark, sf_dir).mapInPandas(resize_media_batches, RESIZE_SCHEMA)
    return resized.groupBy("media_type").agg(
        F.count("*").alias("n_media"),
        F.min("new_width").alias("min_new_width"),
        F.max("new_height").alias("max_new_height"),
        F.sum("thumb_chars").alias("total_thumb_chars"),
        F.countDistinct("thumb_md5").alias("n_distinct_thumbs"),
    )


#: FVID frame geometry: fixed-length frames, sample every k-th
FRAME_LEN = 64
FRAME_SAMPLE_EVERY = 4

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_chars", T.LongType()),
        T.StructField("frame_md5", T.StringType()),
    ]
)


def frame_sample_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow-batched frame sampler: one input row (video blob) fans out
    to one output row per SAMPLED frame — the row-multiplying batch
    shape a real video pipeline uses (decode keyframes, skip the rest)."""
    import hashlib

    for pdf in it:
        rows = {k: [] for k in ("doc_id", "media_type", "n_frames",
                                "frame_idx", "frame_chars", "frame_md5")}
        for doc_id, mt, blob in zip(pdf["doc_id"], pdf["media_type"], pdf["blob"]):
            text = bytes(blob)[_HDR_LEN:].decode("utf-8")
            n_frames = max(1, -(-len(text) // FRAME_LEN))
            for i in range(0, n_frames, FRAME_SAMPLE_EVERY):
                frame = text[i * FRAME_LEN : (i + 1) * FRAME_LEN]
                rows["doc_id"].append(doc_id)
                rows["media_type"].append(mt)
                rows["n_frames"].append(n_frames)
                rows["frame_idx"].append(i)
                rows["frame_chars"].append(len(frame))
                rows["frame_md5"].append(hashlib.md5(frame.encode("utf-8")).hexdigest())
        yield pd.DataFrame(
            {
                "doc_id": rows["doc_id"],
                "media_type": rows["media_type"],
                "n_frames": pd.array(rows["n_frames"], dtype="int32"),
                "frame_idx": pd.array(rows["frame_idx"], dtype="int32"),
                "frame_chars": rows["frame_chars"],
                "frame_md5": rows["frame_md5"],
            }
        )


@query(
    "media_frame_sample",
    oracle=f"""
    WITH vids AS (
      SELECT doc_id, text,
             greatest(1, CAST(ceil(length(text) / {FRAME_LEN}.0) AS INTEGER))
               AS n_frames
      FROM documents
    ), sampled AS (
      SELECT v.doc_id, v.n_frames, i.i,
             substr(v.text, i.i * {FRAME_LEN} + 1, {FRAME_LEN}) AS frame
      FROM vids v,
           LATERAL (SELECT unnest(range(0, v.n_frames, {FRAME_SAMPLE_EVERY})) AS i) i
    )
    SELECT 'video/fake' AS media_type,
           COUNT(DISTINCT doc_id) AS n_videos,
           COUNT(*) AS n_sampled_frames,
           CAST(SUM(frame_chars_per) AS BIGINT) AS total_sampled_chars,
           COUNT(DISTINCT frame_md5) AS n_distinct_frames
    FROM (SELECT doc_id, length(frame) AS frame_chars_per, md5(frame) AS frame_md5
          FROM sampled) t
    GROUP BY 1
    """,
)
def media_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sample the video view of the media table: every
    4th (FRAME_SAMPLE_EVERY) fixed-length frame, one output row per
    sampled frame via a row-multiplying mapInPandas (the keyframe-
    extraction shape). The oracle rebuilds the same sampling with
    range()+substr in SQL, including per-frame content hashes. Scale:
    sampling is map-only with output ~1/FRAME_SAMPLE_EVERY of the
    frame count; nothing shuffles until the summary aggregation, and
    per-frame rows carry hashes (16 bytes) rather than frame payloads
    once the downstream stage doesn't need pixels."""
    vids = media_table(spark, sf_dir).withColumn(
        "media_type", F.lit("video/fake")
    )
    frames = vids.mapInPandas(frame_sample_batches, FRAME_SCHEMA)
    return frames.groupBy("media_type").agg(
        F.countDistinct("doc_id").alias("n_videos"),
        F.count("*").alias("n_sampled_frames"),
        F.sum("frame_chars").alias("total_sampled_chars"),
        F.countDistinct("frame_md5").alias("n_distinct_frames"),
    )


# ---------------------------------------------------------------------------
# EXIF-style metadata extraction (VERDICT r6 "Next round" #8 stretch).
#
# EXIF lives in the JPEG APP1 marker segment as a TIFF-structured tag
# directory — extracting it is pure byte parsing, NO codec involved
# (real pipelines read EXIF without decoding pixels, exactly like the
# FIMG header parse above). So unlike the pixel-decode branch this path
# has no Pillow dependency at all: it runs everywhere, deterministic
# per blob. Non-JPEG blobs and EXIF-less JPEGs yield has_exif=false
# with NULL tag columns — schema-stable output either way.
# ---------------------------------------------------------------------------

#: the standard IFD0 tags surfaced as typed columns
_EXIF_TAG_MAKE = 271          # ASCII
_EXIF_TAG_MODEL = 272         # ASCII
_EXIF_TAG_ORIENTATION = 274   # SHORT
_EXIF_TAG_DATETIME = 306      # ASCII "YYYY:MM:DD HH:MM:SS"

EXIF_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("has_exif", T.BooleanType()),
        T.StructField("make", T.StringType()),
        T.StructField("model", T.StringType()),
        T.StructField("orientation", T.IntegerType()),
        T.StructField("taken_at", T.StringType()),
    ]
)


def extract_exif(blob: bytes) -> dict | None:
    """Parse the EXIF IFD0 of a JPEG blob, codec-free.

    Walks the JPEG marker segments from SOI to the first APP1 carrying
    the ``Exif\\x00\\x00`` signature, then reads the embedded TIFF
    structure (II little-endian or MM big-endian both supported): the
    IFD0 entry table, inline or offset values, ASCII and SHORT tags.
    Returns ``None`` for non-JPEG blobs, JPEGs without an EXIF APP1,
    and structurally truncated/corrupt segments (never raises on bad
    input — a 100 TB crawl always contains malformed files)."""
    import struct

    if len(blob) < 4 or blob[:3] != _JPEG_MAGIC:
        return None
    # --- marker walk: find APP1/Exif ---
    pos = 2
    tiff = None
    while pos + 4 <= len(blob):
        if blob[pos] != 0xFF:
            return None
        # JPEG allows any number of 0xFF fill bytes before the marker
        # code — skip them, or a padded file's real APP1 is lost behind
        # a garbage segment length
        while pos + 4 <= len(blob) and blob[pos + 1] == 0xFF:
            pos += 1
        if pos + 4 > len(blob):
            return None
        marker = blob[pos + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2  # standalone markers carry no length
            continue
        if marker == 0xD9 or marker == 0xDA:  # EOI / start-of-scan
            return None
        seglen = struct.unpack(">H", blob[pos + 2 : pos + 4])[0]
        seg_end = pos + 2 + seglen
        if seglen < 2 or seg_end > len(blob):
            return None
        if marker == 0xE1 and blob[pos + 4 : pos + 10] == b"Exif\x00\x00":
            tiff = blob[pos + 10 : seg_end]
            break
        pos = seg_end
    if tiff is None or len(tiff) < 8:
        return None
    # --- TIFF header + IFD0 ---
    if tiff[:2] == b"II":
        endian = "<"
    elif tiff[:2] == b"MM":
        endian = ">"
    else:
        return None
    if struct.unpack(endian + "H", tiff[2:4])[0] != 42:
        return None
    ifd0 = struct.unpack(endian + "I", tiff[4:8])[0]
    if ifd0 + 2 > len(tiff):
        return None
    n_entries = struct.unpack(endian + "H", tiff[ifd0 : ifd0 + 2])[0]
    out: dict = {}
    for i in range(n_entries):
        e = ifd0 + 2 + 12 * i
        if e + 12 > len(tiff):
            return None
        tag, typ, cnt = struct.unpack(endian + "HHI", tiff[e : e + 8])
        raw = tiff[e + 8 : e + 12]
        if typ == 2:  # ASCII, NUL-terminated; >4 bytes live at offset
            if cnt <= 4:
                data = raw[:cnt]
            else:
                off = struct.unpack(endian + "I", raw)[0]
                if off + cnt > len(tiff):
                    continue
                data = tiff[off : off + cnt]
            val = data.split(b"\x00", 1)[0].decode("ascii", "replace")
        elif typ == 3 and cnt == 1:  # single SHORT, inline
            val = struct.unpack(endian + "H", raw[:2])[0]
        elif typ == 4 and cnt == 1:  # single LONG, inline
            val = struct.unpack(endian + "I", raw)[0]
        else:
            continue
        out[tag] = val
    return out


def exif_metadata_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow-batched EXIF stage with the stable EXIF_SCHEMA contract:
    one output row per input row; non-JPEG / EXIF-less rows keep
    has_exif=false and NULL tag columns."""
    # Coerce by the tag's EXPECTED type, not the file's claimed TIFF
    # type: a malformed/crafted file can store orientation as ASCII or
    # make/model as SHORT, and an uncoerced value would fail the task at
    # int() or at Arrow conversion — one bad blob must never kill a
    # 100 TB batch. Uncoercible values degrade to NULL.
    def _s(v):
        return v if isinstance(v, str) else None

    def _i(v):
        try:
            return int(v)
        except (TypeError, ValueError):
            return None

    for pdf in it:
        rows = {k.name: [] for k in EXIF_SCHEMA.fields}
        for doc_id, mt, blob in zip(pdf["doc_id"], pdf["media_type"], pdf["blob"]):
            # NULL blob (a web-scale media table always has some):
            # bytes(None) would raise TypeError and fail the task
            tags = extract_exif(bytes(blob)) if blob is not None else None
            rows["doc_id"].append(doc_id)
            rows["media_type"].append(mt)
            rows["has_exif"].append(tags is not None)
            rows["make"].append(_s(tags.get(_EXIF_TAG_MAKE)) if tags else None)
            rows["model"].append(_s(tags.get(_EXIF_TAG_MODEL)) if tags else None)
            rows["orientation"].append(
                _i(tags.get(_EXIF_TAG_ORIENTATION)) if tags else None
            )
            rows["taken_at"].append(
                _s(tags.get(_EXIF_TAG_DATETIME)) if tags else None
            )
        pdf_out = pd.DataFrame(rows)
        pdf_out["orientation"] = pdf_out["orientation"].astype("Int32")
        yield pdf_out


def exif_metadata(media: DataFrame) -> DataFrame:
    """(doc_id, media_type, blob) → EXIF_SCHEMA rows via mapInPandas —
    map-only (zero shuffles: metadata extraction runs where the blobs
    already live, the posture every media stage here shares)."""
    return media.select("doc_id", "media_type", "blob").mapInPandas(
        exif_metadata_batches, EXIF_SCHEMA
    )


# ---------------------------------------------------------------------------
# Deterministic JPEG construction (round 9, VERDICT r8 #8).
#
# The fixtures carry no real JPEGs, so the EXIF stage's driver-gated
# query SYNTHESIZES them: tiff_bytes/jpeg_bytes build structurally real
# JPEG/APP1/TIFF streams (both byte orders, inline and offset values —
# the same builders tests/test_exif.py uses), a mapInPandas stage wraps
# per-document tag values derived in closed form from doc_id, and
# exif_metadata parses them back. The oracle states the closed form
# directly in SQL, so the whole construct→parse round-trip is verified
# against an independent arithmetic spec — the FIMG decode pattern
# (media_decode_stats above) applied to the EXIF stage.
# ---------------------------------------------------------------------------


def tiff_bytes(endian: str, tags: list) -> bytes:
    """Minimal TIFF block: header + IFD0 + data area. ``tags`` entries
    are (tag, type, value): type 2 takes bytes (NUL added here), type
    3/4 take an int. ``endian``: "II" or "MM"."""
    import struct

    e = "<" if endian == "II" else ">"
    header = endian.encode() + struct.pack(e + "H", 42) + struct.pack(e + "I", 8)
    n = len(tags)
    data_start = 8 + 2 + 12 * n + 4  # header .. entries .. next-IFD ptr
    entries, data = b"", b""
    for tag, typ, val in tags:
        if typ == 2:
            raw = val + b"\x00"
            if len(raw) <= 4:
                field = raw.ljust(4, b"\x00")
            else:
                field = struct.pack(e + "I", data_start + len(data))
                data += raw
            entries += struct.pack(e + "HHI", tag, typ, len(raw)) + field
        elif typ == 3:
            entries += struct.pack(e + "HHI", tag, typ, 1) + struct.pack(
                e + "H", val
            ) + b"\x00\x00"
        else:  # type 4, single LONG
            entries += struct.pack(e + "HHI", tag, typ, 1) + struct.pack(e + "I", val)
    ifd = struct.pack(e + "H", n) + entries + struct.pack(e + "I", 0)
    return header + ifd + data


def jpeg_bytes(tiff: bytes | None, extra_app0: bool = False) -> bytes:
    """Deterministic JPEG stream: SOI [APP0] [APP1/Exif] COM EOI.
    ``extra_app0`` puts a JFIF header ahead of APP1, as cameras emit."""
    import struct

    out = b"\xff\xd8"
    if extra_app0:
        app0 = b"JFIF\x00\x01\x02\x00\x00\x01\x00\x01\x00\x00"
        out += b"\xff\xe0" + struct.pack(">H", len(app0) + 2) + app0
    if tiff is not None:
        payload = b"Exif\x00\x00" + tiff
        out += b"\xff\xe1" + struct.pack(">H", len(payload) + 2) + payload
    comment = b"deterministic fixture"
    out += b"\xff\xfe" + struct.pack(">H", len(comment) + 2) + comment
    return out + b"\xff\xd9"


#: closed-form tag spec for a doc_id — the single source both the
#: synthesizer and the SQL oracle below express. doc_id % 7 == 0 docs
#: get a JPEG WITHOUT an EXIF APP1 (the has_exif=false path);
#: byte order alternates by parity (both TIFF endiannesses exercised
#: through the driver gate); make takes the >4-byte offset-ASCII path,
#: model the inline path.
def _exif_fixture_blob(doc_id: int) -> bytes:
    if doc_id % 7 == 0:
        return jpeg_bytes(None, extra_app0=True)
    tags = [
        (_EXIF_TAG_MAKE, 2, f"Cam{doc_id % 5}".encode()),
        (_EXIF_TAG_MODEL, 2, f"M{doc_id % 3}".encode()),
        (_EXIF_TAG_ORIENTATION, 3, 1 + doc_id % 8),
        (_EXIF_TAG_DATETIME, 2, f"2026:01:{1 + doc_id % 28:02d} 00:00:00".encode()),
    ]
    return jpeg_bytes(
        tiff_bytes("II" if doc_id % 2 == 0 else "MM", tags),
        extra_app0=doc_id % 3 == 0,
    )


_SYNTH_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("blob", T.BinaryType()),
    ]
)


def synthesize_jpeg_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow-batched JPEG synthesis: (doc_id) → (doc_id, media_type,
    blob). Map-only like every media stage — blobs are born where the
    ids live and never shuffle."""
    for pdf in it:
        ids = pdf["doc_id"].tolist()
        yield pd.DataFrame(
            {
                "doc_id": ids,
                "media_type": ["image/jpeg"] * len(ids),
                "blob": [_exif_fixture_blob(int(i)) for i in ids],
            }
        )


#: driver-gate bound: enough docs to exercise every modulus class many
#: times over at sf0.01 without dominating the probe's runtime
_EXIF_MAX_DOC = 400


@query(
    "exif_metadata_extract",
    oracle=f"""
    SELECT doc_id,
           (doc_id % 7 <> 0) AS has_exif,
           CASE WHEN doc_id % 7 <> 0
                THEN 'Cam' || CAST(doc_id % 5 AS VARCHAR) END AS make,
           CASE WHEN doc_id % 7 <> 0
                THEN 'M' || CAST(doc_id % 3 AS VARCHAR) END AS model,
           CASE WHEN doc_id % 7 <> 0
                THEN CAST(1 + doc_id % 8 AS INTEGER) END AS orientation,
           CASE WHEN doc_id % 7 <> 0
                THEN '2026:01:' || lpad(CAST(1 + doc_id % 28 AS VARCHAR), 2, '0')
                     || ' 00:00:00' END AS taken_at
    FROM documents WHERE doc_id < {_EXIF_MAX_DOC}
    """,
)
def exif_metadata_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X6: EXIF extraction end-to-end through the driver gate (VERDICT
    r8 #8). Structurally real JPEGs (both TIFF byte orders, inline and
    offset tag values, EXIF-less files) are synthesized per document
    from a closed-form tag spec, then parsed back by the codec-free
    exif_metadata stage; the oracle states the closed form in SQL, so
    a parse bug in EITHER direction breaks the hash match. Two chained
    map-only mapInPandas stages — zero shuffles, the posture every
    media stage shares."""
    docs = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < _EXIF_MAX_DOC)
        .select("doc_id")
    )
    media = docs.mapInPandas(synthesize_jpeg_batches, _SYNTH_SCHEMA)
    return exif_metadata(media).select(
        "doc_id", "has_exif", "make", "model", "orientation", "taken_at"
    )


# ---------------------------------------------------------------------------
# Cross-modal dedup ON THE DECODED MEDIA COLUMN (round-13 VERDICT
# "missing" #2, second half): `dedup_cross_modal` (operators/semantic.py)
# joins text LSH with the embeddings fixture; this rule's media
# evidence comes from the media DECODE STAGE itself — a pair is a
# duplicate iff text-Jaccard ≥ t OR the decoded media FINGERPRINTS are
# equal. The fingerprint is the decode stage's deterministic feature
# vector (payload length, 32-byte prefix checksum, parsed dims) playing
# the role a perceptual hash plays with a real codec: equality-bucketed
# pair generation (hash-groupBy, the dedup_exact shape — never
# all-pairs), so the media side scales exactly like exact dedup.
# ---------------------------------------------------------------------------


def _cross_modal_media_oracle() -> str:
    from .dedup import JACCARD_THRESHOLD, minhash_pairs_cte

    # the oracle re-derives the fingerprint analytically from the text
    # (payload = utf8(text); corpus is ASCII so bytes == chars): a
    # decode bug, a batch-boundary bug, or an encoder drift all surface
    # as a hash mismatch against the engine's REAL mapInPandas decode
    return f"""
    WITH {minhash_pairs_cte()},
    tpairs AS (
      SELECT doc_a, doc_b, jaccard FROM verified
      WHERE jaccard >= {JACCARD_THRESHOLD}
    ),
    mfp AS (
      SELECT doc_id,
             octet_length(encode(text)) AS plen,
             list_sum(list_transform(range(32),
               i -> ascii(substr(text, i + 1, 1)))) % 251 AS csum
      FROM documents
    ),
    mpairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM mfp a
      JOIN mfp b ON a.plen = b.plen AND a.csum = b.csum
               AND a.doc_id < b.doc_id
    )
    SELECT COALESCE(t.doc_a, m.doc_a) AS doc_a,
           COALESCE(t.doc_b, m.doc_b) AS doc_b,
           t.jaccard AS jaccard,
           (t.doc_a IS NOT NULL) AS matched_text,
           (m.doc_a IS NOT NULL) AS matched_media
    FROM tpairs t
    FULL OUTER JOIN mpairs m
      ON t.doc_a = m.doc_a AND t.doc_b = m.doc_b
    """


@query("dedup_cross_modal_media", oracle=_cross_modal_media_oracle())
def dedup_cross_modal_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-modal near-dup pairs where the media evidence is computed
    FROM THE DECODED MEDIA: duplicate iff text-Jaccard ≥ t OR the
    decode stage's feature fingerprints are equal.

    The engine side runs the real decode path (media_table →
    Arrow-batched mapInPandas → feature vector), fingerprints the
    feature (every component is integral by construction, so the
    bigint cast is exact), and generates media pairs by
    equality-bucketed self-join — one shuffle on the fingerprint,
    group-bounded pairing, the dedup_exact scale shape. Text evidence
    is the memoized LSH verified-pair relation. A real deployment
    swaps the fake extractor for a perceptual hash inside the same
    mapInPandas; the dataflow — decode → fingerprint → bucket →
    OR-merge with text pairs — is unchanged."""
    from .dedup import _lsh_verified_pairs, JACCARD_THRESHOLD

    decoded = media_fingerprints_from_docs(
        load_table(spark, sf_dir, "documents")
    )
    mpairs = (
        decoded.select(F.col("doc_id").alias("doc_a"), "fp")
        .join(decoded.select(F.col("doc_id").alias("doc_b"), "fp"), "fp")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", F.lit(True).alias("_m"))
    )
    t = (
        _lsh_verified_pairs(spark, sf_dir)
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
        .select("doc_a", "doc_b", "jaccard")
    )
    return (
        t.join(mpairs, ["doc_a", "doc_b"], "full_outer")
        .select(
            "doc_a",
            "doc_b",
            "jaccard",
            F.col("jaccard").isNotNull().alias("matched_text"),
            F.coalesce("_m", F.lit(False)).alias("matched_media"),
        )
    )


# ---------------------------------------------------------------------------
# Persistent media-fingerprint index (round-13 VERDICT #3): the
# cross-modal dedup evidence as a FOURTH index table, so the streaming
# admission funnel can decide text-dup OR media-dup continuously.
# `dedup_cross_modal_media` above proves the batch rule; this index
# gives its media side the same persistent, equality-bucketed shape as
# exact dedup: one (doc_id, fp) table bucketed on fp, probes join on
# the bucket key (index side never shuffled), appends under the shared
# single-writer lock. At 100 TB the fp relation is corpus-sized but the
# probe exchanges only the batch side — the dedup_exact scale shape.
# ---------------------------------------------------------------------------

from typing import NamedTuple  # noqa: E402

from ..functions.bucketing import write_bucketed_aligned  # noqa: E402
from ..functions.index_base import (  # noqa: E402
    append_bucketed,
    single_writer,
    snapshot_before_write,
)
from ..functions.memo import unpersist_checkpoints  # noqa: E402

N_MEDIA_FP_BUCKETS = 16


class MediaFpIndex(NamedTuple):
    """Handle to a persisted media-fingerprint table (bucketed on fp)."""

    fp_table: str


def media_fingerprints_from_docs(docs: DataFrame) -> DataFrame:
    """(doc_id, fp) — the decoded-media feature fingerprint for any
    (doc_id, text, ...) relation, through the REAL Arrow-batched decode
    stage (blob synth → mapInPandas parse → feature → md5). Every
    feature component is integral by construction, so the bigint cast
    is exact and the fingerprint deterministic."""
    decoded = media_blobs_from_docs(docs).mapInPandas(
        decode_media_batches, DECODE_SCHEMA
    )
    return decoded.select(
        "doc_id",
        F.md5(
            F.concat_ws(
                "|",
                *[
                    F.col("feature")[i].cast("bigint").cast("string")
                    for i in range(4)
                ],
            )
        ).alias("fp"),
    )


def build_media_fp_index(
    spark: SparkSession, docs: DataFrame, path: str, name: str
) -> MediaFpIndex:
    """Persist the corpus media fingerprints as the equality-bucketed
    fp table — one decode pass, one shuffle (the aligned bucket
    write)."""
    idx = MediaFpIndex(f"{name}_mediafp")
    write_bucketed_aligned(
        media_fingerprints_from_docs(docs), idx.fp_table, path, "fp",
        N_MEDIA_FP_BUCKETS,
    )
    return idx


def probe_media_fp(
    spark: SparkSession, batch_docs: DataFrame, index: MediaFpIndex
) -> tuple[DataFrame, DataFrame]:
    """(batch_fps, media_novel_ids) for one micro-batch under the
    funnel's epoch-invariant rule: a doc is a media-dup iff its
    fingerprint equals an INDEXED doc's (anything probed in an earlier
    epoch — seen = probed) or a lower-id doc's in its own batch.
    ``batch_fps`` is eagerly checkpointed (the caller extends the index
    with it after decisions are durable, and owns the blocks); the
    probe exchanges only the batch side — the fp table's bucketed
    layout satisfies the join distribution as-is."""
    fps = media_fingerprints_from_docs(batch_docs).localCheckpoint(
        eager=True
    )
    idx_hit = fps.join(spark.table(index.fp_table), "fp", "left_semi")
    mins = fps.groupBy("fp").agg(F.min("doc_id").alias("_min_id"))
    within_dup = (
        fps.join(mins, "fp").filter(F.col("doc_id") > F.col("_min_id"))
    )
    dups = idx_hit.select("doc_id").unionByName(
        within_dup.select("doc_id")
    ).distinct()
    novel = fps.select("doc_id").join(dups, "doc_id", "left_anti")
    return fps, novel


def extend_media_fp_index(
    spark: SparkSession, index: MediaFpIndex, fps: DataFrame,
    op: str = "extend", wait: float | None = None,
) -> None:
    """Append the fingerprints of ALL probed docs (seen = probed — the
    same discipline as append_all_signatures, for the same epoch-cut
    invariance). ``fps`` must not read the fp table through a lazy plan
    (probe_media_fp's checkpointed output never does)."""
    with single_writer(spark, index.fp_table, op=op, wait=wait):
        append_bucketed(
            spark, index.fp_table, fps.select("doc_id", "fp"), "fp",
            N_MEDIA_FP_BUCKETS,
        )


def repair_media_fp_index(
    spark: SparkSession, index: MediaFpIndex, recorded: DataFrame,
    batch_docs: DataFrame,
) -> None:
    """Replay repair (the decisions-durable → extend crash window):
    re-derive fingerprints for recorded docs missing from the fp table
    and append them — bounded by one epoch, idempotent after a
    post-extend crash (the anti-join finds nothing)."""
    indexed = spark.table(index.fp_table).select("doc_id")
    missing = recorded.select("doc_id").join(
        indexed, "doc_id", "left_anti"
    ).localCheckpoint(eager=True)
    try:
        if missing.limit(1).count():
            rows = batch_docs.join(missing, "doc_id", "left_semi")
            fps = media_fingerprints_from_docs(rows).localCheckpoint(
                eager=True
            )
            try:
                extend_media_fp_index(spark, index, fps, op="replay-repair")
            finally:
                unpersist_checkpoints(fps)
    finally:
        unpersist_checkpoints(missing)

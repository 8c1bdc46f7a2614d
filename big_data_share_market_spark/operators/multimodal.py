"""Multimodal columns: opaque binary payloads + typed metadata, with
decode / feature-extract / frame-sample as Arrow-batched Pandas UDFs
over `mapInPandas` (the training-data-pipeline pattern: media blobs
ride through Spark as `binary` columns; per-row Python touches them
only inside vectorized batches).

`decode_image` / `decode_audio` are REAL for the formats decodable
without codec libraries — 24-bit BMP (numpy header parse), baseline
sequential JPEG (pure-numpy T.81 decoder, `operators/jpeg.py`), and
RIFF/WAVE PCM (stdlib `wave`) — and raise a clearly-marked
NotImplementedError for formats that genuinely need codec libraries
(WebP, MP3/AAC, progressive JPEG, Adam7 PNG; this container has no
PIL/ffmpeg). The Spark-side plumbing — binary
column, metadata struct, UDF signatures, Arrow batch shapes,
partitioning — is oracle-tested against a deterministic byte-level
featurizer, and the real decoders are round-trip-tested through the
same mapInPandas shape (tests/test_multimodal_decode.py). The fixture
payload is the document text encoded to UTF-8 (ASCII in the fixtures,
verified, so DuckDB can mirror byte math at string level).

Scale notes: payloads never shuffle except where grouped — metadata
stats aggregate AFTER projecting the payload away (map-side partial
agg on ~3 media types); featurize/frame-sample are narrow mapInPandas
passes (no shuffle at all), so at 100 TB the cost is scan + Python
batch transform, partition-parallel. `spark.sql.files.maxPartitionBytes`
caps the bytes a single Arrow batch owner reads.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import load_table

_MEDIA_TYPES = ("image", "audio", "video")


def decode_image(payload: bytes) -> "object":
    """REAL decode for 24-bit uncompressed BMP (pure numpy header
    parse + strided pixel view), baseline sequential JPEG (pure numpy
    T.81 decoder, `operators/jpeg.py` — the format real corpora
    actually contain), and non-interlaced PNG (stdlib zlib inflate +
    per-scanline unfilter, `operators/png.py` — gray/RGB/palette/
    alpha, bit depths 1-16). WebP and progressive JPEG / Adam7 PNG
    need codec machinery absent here and raise a clearly-marked
    NotImplementedError. Returns an (H, W, 3) uint8 RGB array.
    Round-trip-tested in tests/test_multimodal_decode.py, including
    through the mapInPandas plumbing."""
    import struct

    import numpy as np
    payload = bytes(payload)
    if payload[:2] == b"\xff\xd8":
        from .jpeg import decode_baseline_jpeg
        return decode_baseline_jpeg(payload)
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        from .png import decode_png
        return decode_png(payload)
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        from .gif import decode_gif
        return decode_gif(payload)
    if payload[:1] == b"P" and payload[1:2] in b"123456":
        from .netpbm import decode_netpbm
        return decode_netpbm(payload)
    if payload[:2] != b"BM":
        raise NotImplementedError(
            "only BMP, baseline JPEG, non-interlaced PNG, GIF and "
            "Netpbm (PBM/PGM/PPM) are decodable without codec "
            "libraries (WebP needs PIL/opencv, not in this container)")
    # Malformed-BMP guards: the documented contract is that any
    # undecodable payload raises NotImplementedError (so corpus skip
    # handlers need exactly one except clause) — a truncated header
    # must not surface as struct.error, nor a lying size field as a
    # numpy ValueError.
    if len(payload) < 34:
        raise NotImplementedError("truncated BMP header")
    data_offset = struct.unpack_from("<I", payload, 10)[0]
    width, height = struct.unpack_from("<ii", payload, 18)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    compression = struct.unpack_from("<I", payload, 30)[0]
    if bpp != 24 or compression != 0:
        raise NotImplementedError("only 24-bit uncompressed BMP supported")
    flip = height > 0
    height = abs(height)
    if width <= 0 or height == 0:
        raise NotImplementedError(
            f"invalid BMP dimensions {width}x{height}")
    row_size = (width * 3 + 3) & ~3  # rows pad to 4-byte boundaries
    if data_offset < 34 or data_offset + row_size * height > len(payload):
        raise NotImplementedError(
            "BMP pixel data out of bounds (truncated payload or "
            "corrupt header)")
    buf = np.frombuffer(payload, np.uint8, row_size * height, data_offset)
    img = (buf.reshape(height, row_size)[:, :width * 3]
           .reshape(height, width, 3)[:, :, ::-1])  # BGR -> RGB
    return img[::-1] if flip else img  # bottom-up rows -> top-down


def decode_audio(payload: bytes) -> "object":
    """REAL decode for RIFF/WAVE PCM (stdlib `wave` + numpy — no
    codec library needed); MP3/AAC/OGG need ffmpeg-class codecs,
    absent here, and raise. Returns (samples[n_frames, n_channels]
    int16/int32/uint8, sample_rate). Round-trip-tested in
    tests/test_multimodal_decode.py."""
    import io
    import wave

    import numpy as np
    payload = bytes(payload)
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise NotImplementedError(
            "only RIFF/WAVE PCM is decodable without codec libraries "
            "(MP3/AAC/OGG need ffmpeg, not in this container)")
    try:
        with wave.open(io.BytesIO(payload)) as w:
            n_ch, samp_w, rate = w.getnchannels(), w.getsampwidth(), \
                w.getframerate()
            raw = w.readframes(w.getnframes())
    except wave.Error as exc:
        # e.g. IEEE-float WAV (format tag 3): valid RIFF/WAVE magic
        # but not integer PCM — keep the documented contract that
        # undecodable media raises NotImplementedError, never a
        # library-specific error a skip-handler would miss.
        raise NotImplementedError(f"non-PCM WAV variant: {exc}") from exc
    dtype = {1: np.dtype(np.uint8), 2: np.dtype("<i2"),
             4: np.dtype("<i4")}.get(samp_w)
    if dtype is None:
        raise NotImplementedError(f"unsupported PCM sample width {samp_w}")
    return np.frombuffer(raw, dtype=dtype).reshape(-1, n_ch), rate


def media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Documents re-cast as a media table: `payload binary` + typed
    metadata struct. Deterministic so the DuckDB oracle can rebuild
    it: media_type = doc_id % 3; width/height/duration derived from
    n_chars."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.encode("text", "UTF-8").alias("payload"),
        F.element_at(F.array(*[F.lit(t) for t in _MEDIA_TYPES]),
                     (F.col("doc_id") % 3 + 1).cast("int")).alias("media_type"),
        F.struct(
            F.col("source").alias("origin"),
            F.col("n_chars").alias("content_bytes"),
            (F.col("n_chars") % 640 + 64).alias("width"),
            (F.col("n_chars") % 480 + 48).alias("height"),
            (F.col("n_chars") / 16.0).alias("duration_s"),
        ).alias("meta"),
    )


#: DuckDB mirror of :func:`media_table`'s derivations.
_MEDIA_CTE = """
media AS (
  SELECT doc_id,
         encode(text) AS payload,
         ['image','audio','video'][CAST(doc_id % 3 AS INTEGER) + 1] AS media_type,
         source AS origin,
         n_chars AS content_bytes,
         n_chars % 640 + 64 AS width,
         n_chars % 480 + 48 AS height,
         n_chars / 16.0 AS duration_s,
         text
  FROM documents)
"""


def q_media_metadata_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed-metadata rollup per media type × origin. The payload is
    projected away before the groupBy — the plan shuffles only the
    metadata columns (column pruning keeps blobs out of the exchange;
    at 100 TB that is the difference between a KB-scale and a TB-scale
    shuffle)."""
    media = media_table(spark, sf_dir)
    return (
        media.select("media_type", F.col("meta.origin").alias("origin"),
                     F.length("payload").alias("n_bytes"),
                     F.col("meta.duration_s").alias("duration_s"))
        .groupBy("media_type", "origin")
        .agg(F.count("*").alias("n_items"),
             F.sum("n_bytes").alias("total_bytes"),
             F.avg("duration_s").alias("avg_duration_s"))
        .orderBy("media_type", "origin")
    )


_MEDIA_STATS_SQL = f"""
WITH {_MEDIA_CTE}
SELECT media_type, origin, COUNT(*) AS n_items,
       CAST(SUM(octet_length(payload)) AS BIGINT) AS total_bytes,
       AVG(duration_s) AS avg_duration_s
FROM media GROUP BY media_type, origin ORDER BY media_type, origin
"""


def _featurize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow-batched byte featurizer (the deterministic stand-in for
    `decode_image`): per payload, byte count / mean / max. numpy over
    the buffer — vectorized, no per-byte Python."""
    import numpy as np

    for pdf in batches:
        rows = []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            arr = np.frombuffer(bytes(payload), dtype=np.uint8)
            rows.append((int(doc_id), int(arr.size),
                         float(arr.astype(np.float64).mean()),
                         int(arr.max())))
        yield pd.DataFrame(rows, columns=["doc_id", "n_bytes",
                                          "mean_byte", "max_byte"])


def q_media_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode/feature-extract plumbing: binary payloads → per-item
    features via mapInPandas (Arrow batches, narrow — zero shuffle).
    Sums of byte values stay < 2^53 so the float mean is exact and the
    byte-level DuckDB oracle matches bit-for-bit."""
    media = media_table(spark, sf_dir).select("doc_id", "payload")
    return media.mapInPandas(
        _featurize_batches,
        schema="doc_id BIGINT, n_bytes BIGINT, mean_byte DOUBLE, max_byte BIGINT",
    )


_MEDIA_FEATURES_SQL = """
WITH bytes AS (
  SELECT doc_id, unnest(generate_series(1, length(text))) AS i, text
  FROM documents)
SELECT doc_id, COUNT(*) AS n_bytes,
       AVG(ascii(substring(text, i, 1))) AS mean_byte,
       MAX(ascii(substring(text, i, 1))) AS max_byte
FROM bytes GROUP BY doc_id ORDER BY doc_id
"""

_FRAME_LEN = 16
_N_FRAMES = 4


def _frame_sample_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Deterministic frame sampler for 'video' payloads: _N_FRAMES
    evenly-strided fixed-length byte slices, fingerprinted with md5
    (stands in for JPEG frame extraction; the slicing/batching shape is
    what a real ffmpeg UDF uses)."""
    for pdf in batches:
        rows = []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            data = bytes(payload)
            stride = max((len(data) - _FRAME_LEN) // (_N_FRAMES - 1), 1)
            for k in range(_N_FRAMES):
                start = min(k * stride, max(len(data) - _FRAME_LEN, 0))
                frame = data[start:start + _FRAME_LEN]
                rows.append((int(doc_id), k, start,
                             hashlib.md5(frame).hexdigest()))
        yield pd.DataFrame(rows, columns=["doc_id", "frame_idx",
                                          "byte_offset", "frame_md5"])


def q_media_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling over video payloads: filter to the modality
    FIRST (predicate prunes 2/3 of blobs at the scan), then a narrow
    mapInPandas emitting (frame_idx, offset, fingerprint) rows — the
    1→N exploding UDTF shape of real frame extraction."""
    media = (media_table(spark, sf_dir)
             .filter(F.col("media_type") == "video")
             .select("doc_id", "payload"))
    return media.mapInPandas(
        _frame_sample_batches,
        schema=("doc_id BIGINT, frame_idx INT, byte_offset INT, "
                "frame_md5 STRING"),
    )


_FRAME_SAMPLE_SQL = f"""
WITH {_MEDIA_CTE},
vids AS (SELECT doc_id, text, length(text) AS n FROM media
         WHERE media_type = 'video'),
frames AS (
  SELECT doc_id, unnest(generate_series(0, {_N_FRAMES - 1})) AS frame_idx,
         text, n
  FROM vids)
SELECT doc_id, CAST(frame_idx AS INTEGER) AS frame_idx,
       CAST(least(frame_idx * greatest((n - {_FRAME_LEN}) // {_N_FRAMES - 1}, 1),
                  greatest(n - {_FRAME_LEN}, 0)) AS INTEGER) AS byte_offset,
       md5(substring(text,
                     CAST(least(frame_idx * greatest((n - {_FRAME_LEN}) // {_N_FRAMES - 1}, 1),
                                greatest(n - {_FRAME_LEN}, 0)) AS INTEGER) + 1,
                     {_FRAME_LEN})) AS frame_md5
FROM frames
"""


_RESIZE_TARGET = 32


def _resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Deterministic resize stand-in (real version: PIL thumbnail after
    decode_image): stride-downsample the payload to ≤ _RESIZE_TARGET
    bytes — the 1→1 payload-transforming UDF shape (new binary out,
    provenance columns alongside)."""
    for pdf in batches:
        rows = []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            data = bytes(payload)
            n = len(data)
            stride = max(n // _RESIZE_TARGET, 1)
            k = min(_RESIZE_TARGET, (n + stride - 1) // stride)
            resized = bytes(data[i * stride] for i in range(k))
            rows.append((int(doc_id), n, len(resized),
                         hashlib.md5(resized).hexdigest()))
        yield pd.DataFrame(rows, columns=["doc_id", "n_orig", "n_resized",
                                          "resized_md5"])


def q_media_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize plumbing over image payloads: modality filter at the
    scan, then a narrow mapInPandas producing the downsampled payload
    fingerprint + size provenance. Zero shuffle; at 100 TB the cost is
    scan + per-batch Python, partition-parallel."""
    media = (media_table(spark, sf_dir)
             .filter(F.col("media_type") == "image")
             .select("doc_id", "payload"))
    return media.mapInPandas(
        _resize_batches,
        schema="doc_id BIGINT, n_orig BIGINT, n_resized BIGINT, resized_md5 STRING",
    )


_MEDIA_RESIZE_SQL = f"""
WITH {_MEDIA_CTE},
imgs AS (
  SELECT doc_id, text, length(text) AS n,
         greatest(length(text) // {_RESIZE_TARGET}, 1) AS stride
  FROM media WHERE media_type = 'image'),
r AS (
  SELECT doc_id, n, stride,
         array_to_string(list_transform(
           range(0, least({_RESIZE_TARGET}, (n + stride - 1) // stride)),
           i -> substring(text, CAST(i * stride AS INT) + 1, 1)), '') AS resized
  FROM imgs)
SELECT doc_id, n AS n_orig, length(resized) AS n_resized,
       md5(resized) AS resized_md5
FROM r
"""


# Audio segmentation: fixed-duration windows with 50% overlap.
_SEG_BYTES = 64          # bytes per segment ("samples per window")
_SEG_HOP = 32            # hop size — 50% overlap


def _audio_segment_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Deterministic audio segmenter (stands in for soundfile +
    resample after decode_audio): overlapping fixed-size byte windows
    with hop _SEG_HOP, each fingerprinted — the 1→N windowing shape
    (STFT frames, VAD chunks) every audio pipeline uses. Window count
    follows payload size, unlike the fixed-count video sampler."""
    for pdf in batches:
        rows = []
        for doc_id, payload, dur in zip(pdf["doc_id"], pdf["payload"],
                                        pdf["duration_s"]):
            data = bytes(payload)
            n = len(data)
            n_segs = max((max(n - _SEG_BYTES, 0)) // _SEG_HOP + 1, 1)
            bytes_per_s = n / float(dur) if dur else 0.0
            for k in range(n_segs):
                start = k * _SEG_HOP
                seg = data[start:start + _SEG_BYTES]
                rows.append((
                    int(doc_id), k,
                    start / bytes_per_s if bytes_per_s else 0.0,
                    min(start + _SEG_BYTES, n) / bytes_per_s
                    if bytes_per_s else 0.0,
                    hashlib.md5(seg).hexdigest()))
        yield pd.DataFrame(rows, columns=["doc_id", "seg_idx", "start_s",
                                          "end_s", "seg_md5"])


def q_media_audio_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping-window segmentation over audio payloads: modality
    filter at the scan, then a narrow 1→N mapInPandas emitting per-
    segment time bounds + fingerprints. Zero shuffle; segment count
    scales with payload bytes, so output size tracks audio hours, not
    file count."""
    media = (media_table(spark, sf_dir)
             .filter(F.col("media_type") == "audio")
             .select("doc_id", "payload", F.col("meta.duration_s")
                     .alias("duration_s")))
    return media.mapInPandas(
        _audio_segment_batches,
        schema=("doc_id BIGINT, seg_idx INT, start_s DOUBLE, "
                "end_s DOUBLE, seg_md5 STRING"),
    )


_AUDIO_SEGMENTS_SQL = f"""
WITH {_MEDIA_CTE},
auds AS (
  SELECT doc_id, text, length(text) AS n, duration_s,
         length(text) / duration_s AS bytes_per_s,
         greatest((greatest(length(text) - {_SEG_BYTES}, 0))
                  // {_SEG_HOP} + 1, 1) AS n_segs
  FROM media WHERE media_type = 'audio'),
segs AS (
  SELECT doc_id, unnest(range(0, n_segs)) AS seg_idx, text, n, bytes_per_s
  FROM auds)
SELECT doc_id, CAST(seg_idx AS INTEGER) AS seg_idx,
       seg_idx * {_SEG_HOP} / bytes_per_s AS start_s,
       least(seg_idx * {_SEG_HOP} + {_SEG_BYTES}, n) / bytes_per_s AS end_s,
       md5(substring(text, CAST(seg_idx * {_SEG_HOP} AS INT) + 1,
                     {_SEG_BYTES})) AS seg_md5
FROM segs
"""


# ---------------------------------------------------------------------------
# Perceptual-hash image dedup (dHash)
# ---------------------------------------------------------------------------

_DHASH_ROWS, _DHASH_COLS = 8, 9  # 8×8 gradient bits


def perceptual_dhash(img) -> str:
    """Difference hash (dHash, public algorithm: Krawetz 2013) of a
    decoded (H, W, 3) image: channel-mean grayscale, block-mean
    resample to 8×9, one bit per horizontal neighbor pair (left <
    right) → 64-char bitstring. Comparing NEIGHBORS makes the hash
    exactly invariant to any global brightness offset or positive
    rescale that doesn't clip — the property a perceptual dedup needs
    that a byte-hash lacks. Pairs with `decode_image` for real BMP/
    JPEG payloads (tests/test_multimodal_decode.py)."""
    import numpy as np

    g = np.asarray(img).astype(np.float64).mean(axis=2)
    h, w = g.shape
    if h < _DHASH_ROWS or w < _DHASH_COLS:
        raise ValueError(f"image {h}x{w} too small for dHash grid")
    re = np.linspace(0, h, _DHASH_ROWS + 1).astype(int)
    ce = np.linspace(0, w, _DHASH_COLS + 1).astype(int)
    small = np.array([[g[re[r]:re[r + 1], ce[c]:ce[c + 1]].mean()
                       for c in range(_DHASH_COLS)]
                      for r in range(_DHASH_ROWS)])
    bits = (small[:, :-1] < small[:, 1:]).flatten()
    return "".join("1" if b else "0" for b in bits)


def _byte_dhash(buf: bytes) -> str:
    """The same dHash kernel applied to the raw byte plane (first
    8×9 = 72 bytes, zero-padded): the oracle-able stand-in for the
    fixture, whose payloads are text bytes rather than decodable
    images — identical UDF shape, batch layout, and grouping plan to
    the real-pixel path."""
    import numpy as np

    grid = np.zeros(_DHASH_ROWS * _DHASH_COLS, dtype=np.float64)
    arr = np.frombuffer(bytes(buf), dtype=np.uint8)[: grid.size]
    grid[: arr.size] = arr
    g = grid.reshape(_DHASH_ROWS, _DHASH_COLS)
    bits = (g[:, :-1] < g[:, 1:]).flatten()
    return "".join("1" if b else "0" for b in bits)


def _dhash_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        yield pd.DataFrame({
            "doc_id": pdf["doc_id"],
            "dhash": [_byte_dhash(p) for p in pdf["payload"]],
        })


def q_media_phash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash dedup over the media table: dHash per payload
    (Arrow-batched mapInPandas — the decode+hash stage of an image
    dedup pipeline), then exact-dedup grouping on the hash (keep =
    min doc_id, same convention as exact_dedup). On real corpora the
    kernel is `decode_image` → `perceptual_dhash`; the fixture runs
    the byte-plane twin so DuckDB can mirror the hash bit-for-bit.

    Scale shape: hash computation is a narrow map pass (payload never
    shuffles — only the 64-bit hash and doc_id enter the exchange);
    grouping is ONE shuffle on the hash via window aggregation. A
    Hamming-radius>0 variant buckets hash chunks exactly like
    simhash_pairs; equality (radius 0) needs no pair expansion at
    all."""
    from pyspark.sql.window import Window

    media = media_table(spark, sf_dir).select("doc_id", "payload")
    hashed = media.mapInPandas(
        _dhash_batches, schema="doc_id BIGINT, dhash STRING")
    w = Window.partitionBy("dhash")
    return (
        hashed
        .withColumn("keep_doc_id", F.min("doc_id").over(w))
        .withColumn("n_copies", F.count("*").over(w))
        .withColumn("keep", F.col("doc_id") == F.col("keep_doc_id"))
        .select("doc_id", "dhash", "keep_doc_id", "n_copies", "keep")
    )


def _phash_dedup_sql() -> str:
    n = _DHASH_ROWS * _DHASH_COLS
    bit = (f"CASE WHEN bb[(k // {_DHASH_COLS - 1}) * {_DHASH_COLS} "
           f"+ (k % {_DHASH_COLS - 1}) + 1] "
           f"< bb[(k // {_DHASH_COLS - 1}) * {_DHASH_COLS} "
           f"+ (k % {_DHASH_COLS - 1}) + 2] THEN '1' ELSE '0' END")
    return f"""
WITH hb AS (
  SELECT doc_id,
         list_transform(range(0, {n}),
           p -> CASE WHEN length(text) > p
                THEN CAST(ascii(substring(text, p + 1, 1)) AS DOUBLE)
                ELSE 0.0 END) AS bb
  FROM documents),
h AS (
  SELECT doc_id,
         array_to_string(list_transform(
           range(0, {(_DHASH_COLS - 1) * _DHASH_ROWS}), k -> {bit}), '')
           AS dhash
  FROM hb),
g AS (SELECT dhash, MIN(doc_id) AS keep_doc_id, COUNT(*) AS n_copies
      FROM h GROUP BY dhash)
SELECT h.doc_id, h.dhash, g.keep_doc_id, g.n_copies,
       h.doc_id = g.keep_doc_id AS keep
FROM h JOIN g USING (dhash)
"""


QUERIES = {
    "media_metadata_stats": (q_media_metadata_stats, _MEDIA_STATS_SQL),
    "media_phash_dedup": (q_media_phash_dedup, _phash_dedup_sql()),
    "media_audio_segments": (q_media_audio_segments, _AUDIO_SEGMENTS_SQL),
    "media_resize": (q_media_resize, _MEDIA_RESIZE_SQL),
    "media_decode_features": (q_media_decode_features, _MEDIA_FEATURES_SQL),
    "media_frame_sample": (q_media_frame_sample, _FRAME_SAMPLE_SQL),
}

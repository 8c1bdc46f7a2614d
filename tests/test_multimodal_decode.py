"""Round-trip tests for the REAL multimodal decoders (BMP, WAV PCM):
known pixels/samples → encoded bytes → decode → exact equality, both
standalone and through the Arrow mapInPandas plumbing the production
pipeline uses. Codec-requiring formats must raise the clearly-marked
NotImplementedError, never silently mis-decode.
"""

from __future__ import annotations

import io
import struct
import wave

import numpy as np
import pandas as pd
import pytest

from big_data_share_market_spark.operators.multimodal import (decode_audio,
                                                              decode_image)


def make_bmp(pixels: np.ndarray) -> bytes:
    """Minimal 24-bit bottom-up BMP encoder for (H, W, 3) uint8 RGB."""
    h, w, _ = pixels.shape
    row_size = (w * 3 + 3) & ~3
    img_size = row_size * h
    header = struct.pack("<2sIHHI", b"BM", 14 + 40 + img_size, 0, 0, 14 + 40)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size,
                       2835, 2835, 0, 0)
    body = bytearray()
    for r in range(h - 1, -1, -1):  # bottom-up row order
        row = pixels[r][:, ::-1].tobytes()  # RGB -> BGR
        body += row + b"\x00" * (row_size - len(row))
    return header + info + bytes(body)


def make_wav(samples: np.ndarray, rate: int = 16000) -> bytes:
    """Standard-library WAV writer for (n, ch) int16 samples."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(samples.shape[1])
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(samples.astype("<i2").tobytes())
    return buf.getvalue()


def test_bmp_roundtrip_exact():
    rng = np.random.default_rng(7)
    # Non-multiple-of-4 width exercises the row padding.
    pixels = rng.integers(0, 256, size=(5, 7, 3), dtype=np.uint8)
    out = decode_image(make_bmp(pixels))
    np.testing.assert_array_equal(out, pixels)


def test_wav_roundtrip_exact():
    rng = np.random.default_rng(11)
    samples = rng.integers(-32768, 32767, size=(480, 2), dtype=np.int16)
    out, rate = decode_audio(make_wav(samples, rate=8000))
    assert rate == 8000
    np.testing.assert_array_equal(out, samples)


def test_codec_formats_raise_clearly():
    with pytest.raises(NotImplementedError, match="BMP"):
        decode_image(b"\x89PNG\r\n\x1a\n" + b"\x00" * 64)
    with pytest.raises(NotImplementedError, match="WAVE"):
        decode_audio(b"\xff\xfb" + b"\x00" * 64)  # MP3 frame sync
    with pytest.raises(NotImplementedError, match="24-bit"):
        # Valid BMP magic but 8-bit palette image.
        hdr = struct.pack("<2sIHHI", b"BM", 200, 0, 0, 54)
        info = struct.pack("<IiiHHIIiiII", 40, 4, 4, 1, 8, 0, 64,
                           2835, 2835, 0, 0)
        decode_image(hdr + info + b"\x00" * 128)


def test_decode_through_map_in_pandas(spark):
    """The decoders run inside the same Arrow-batched mapInPandas
    shape the production featurizers use: encode known media per row,
    decode in the UDF, return per-item stats Spark can verify."""
    rng = np.random.default_rng(3)
    media = []
    for i in range(4):
        px = rng.integers(0, 256, size=(3 + i, 5, 3), dtype=np.uint8)
        media.append((i, "image", make_bmp(px), int(px.sum())))
    for i in range(4, 8):
        sm = rng.integers(-1000, 1000, size=(64 * i, 1), dtype=np.int16)
        media.append((i, "audio", make_wav(sm), int(sm.astype(np.int64).sum())))
    df = spark.createDataFrame(
        [(i, t, bytearray(p), s) for i, t, p, s in media],
        "item_id BIGINT, kind STRING, payload BINARY, want_sum BIGINT")

    def run(batches):
        for pdf in batches:
            rows = []
            for item_id, kind, payload in zip(pdf["item_id"], pdf["kind"],
                                              pdf["payload"]):
                if kind == "image":
                    got = int(decode_image(payload).astype(np.int64).sum())
                else:
                    got = int(decode_audio(payload)[0].astype(np.int64).sum())
                rows.append((int(item_id), got))
            yield pd.DataFrame(rows, columns=["item_id", "got_sum"])

    out = df.select("item_id", "kind", "payload").mapInPandas(
        run, schema="item_id BIGINT, got_sum BIGINT")
    joined = out.join(df.select("item_id", "want_sum"), "item_id")
    assert joined.count() == 8
    assert joined.filter("got_sum <> want_sum").count() == 0


def test_malformed_bmp_raises_notimplemented():
    """Corrupt BMPs must honor the documented contract — a skip
    handler catching NotImplementedError never sees struct.error /
    ValueError from a truncated or lying payload."""
    import struct

    good = make_bmp(np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3))

    # header shorter than the BITMAPINFOHEADER fields we read
    with pytest.raises(NotImplementedError, match="truncated"):
        decode_image(good[:20])
    # pixel data truncated: header promises more rows than exist
    with pytest.raises(NotImplementedError, match="out of bounds"):
        decode_image(good[:-8])
    # lying data_offset pointing past the payload
    bad_off = bytearray(good)
    struct.pack_into("<I", bad_off, 10, len(good) + 100)
    with pytest.raises(NotImplementedError, match="out of bounds"):
        decode_image(bytes(bad_off))
    # zero/negative width
    bad_w = bytearray(good)
    struct.pack_into("<i", bad_w, 18, -3)
    with pytest.raises(NotImplementedError, match="dimensions"):
        decode_image(bytes(bad_w))
    # the pristine payload still decodes after all that
    assert decode_image(good).shape == (2, 3, 3)

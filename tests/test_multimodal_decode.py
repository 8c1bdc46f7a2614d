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
    # A PNG signature now dispatches into the real PNG decoder, which
    # must still honor the NotImplementedError contract for garbage.
    with pytest.raises(NotImplementedError, match="PNG"):
        decode_image(b"\x89PNG\r\n\x1a\n" + b"\x00" * 64)
    # WebP: RIFF container but not WAVE/BMP/PNG/JPEG — falls to the
    # catch-all.
    with pytest.raises(NotImplementedError, match="WebP"):
        decode_image(b"RIFF\x00\x00\x00\x00WEBPVP8 " + b"\x00" * 32)
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


# ---------------------------------------------------------------------------
# Baseline JPEG codec (operators/jpeg.py)
# ---------------------------------------------------------------------------

def _naive_dct8(block: np.ndarray) -> np.ndarray:
    """Definitional O(N^4) 2-D DCT-II (T.81 A.3.3) — written
    independently of the codec's matrix form so a shared bug cannot
    cancel in round-trip tests."""
    out = np.zeros((8, 8))
    for u in range(8):
        for v in range(8):
            cu = 1 / np.sqrt(2) if u == 0 else 1.0
            cv = 1 / np.sqrt(2) if v == 0 else 1.0
            s = 0.0
            for x in range(8):
                for y in range(8):
                    s += (block[x, y]
                          * np.cos((2 * x + 1) * u * np.pi / 16)
                          * np.cos((2 * y + 1) * v * np.pi / 16))
            out[u, v] = 0.25 * cu * cv * s
    return out


def test_dct_matrix_matches_definition():
    from big_data_share_market_spark.operators.jpeg import dct_matrix
    rng = np.random.default_rng(11)
    block = rng.uniform(-128, 127, size=(8, 8))
    t = dct_matrix()
    assert np.allclose(t @ block @ t.T, _naive_dct8(block), atol=1e-9)
    # and T is orthonormal, so T.T really is the inverse
    assert np.allclose(t @ t.T, np.eye(8), atol=1e-12)


def _smooth_rgb(h: int, w: int) -> np.ndarray:
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack([
        (127 + 90 * np.sin(yy / 9) * np.cos(xx / 7)),
        (127 + 80 * np.cos(yy / 6)),
        (127 + 70 * np.sin(xx / 5))], axis=-1).clip(0, 255).astype(np.uint8)


def test_jpeg_roundtrip_color_and_gray():
    from big_data_share_market_spark.operators.jpeg import (
        decode_baseline_jpeg, encode_baseline_jpeg)
    img = _smooth_rgb(24, 17)  # non-multiple-of-8 dims exercise padding
    out = decode_baseline_jpeg(encode_baseline_jpeg(img))
    assert out.shape == (24, 17, 3) and out.dtype == np.uint8
    err = np.abs(out.astype(int) - img.astype(int))
    assert err.mean() < 4 and err.max() <= 20  # quantization-only loss
    gray = img[..., 0]
    outg = decode_baseline_jpeg(encode_baseline_jpeg(gray))
    assert outg.shape == (24, 17, 3)
    errg = np.abs(outg[..., 0].astype(int) - gray.astype(int))
    assert errg.mean() < 3
    # grayscale replicates to 3 identical channels
    assert (outg[..., 0] == outg[..., 1]).all()


def test_jpeg_dispatch_and_bad_streams():
    """decode_image dispatches on the SOI magic; progressive and
    corrupt streams honor the NotImplementedError contract."""
    from big_data_share_market_spark.operators.jpeg import encode_baseline_jpeg

    img = _smooth_rgb(16, 16)
    payload = encode_baseline_jpeg(img)
    assert decode_image(payload).shape == (16, 16, 3)
    # flip SOF0 -> SOF2 (progressive): must raise, not mis-decode
    prog = payload.replace(b"\xff\xc0", b"\xff\xc2", 1)
    with pytest.raises(NotImplementedError, match="non-baseline"):
        decode_image(prog)
    with pytest.raises(NotImplementedError):
        decode_image(payload[:40])  # truncated before SOS


def test_jpeg_through_map_in_pandas(spark):
    """The verdict's stretch goal: a tiny baseline JPEG decoded
    through the same Arrow-batched mapInPandas plumbing the BMP path
    uses."""
    import pandas as pd
    from big_data_share_market_spark.operators.jpeg import encode_baseline_jpeg

    imgs = [_smooth_rgb(16 + 8 * i, 8 + 8 * i) for i in range(3)]
    rows = [(i, bytearray(encode_baseline_jpeg(im)))
            for i, im in enumerate(imgs)]
    df = spark.createDataFrame(rows, "img_id INT, payload BINARY")

    def run(batches):
        for pdf in batches:
            decoded = [decode_image(p) for p in pdf["payload"]]
            yield pd.DataFrame({
                "img_id": pdf["img_id"],
                "h": [d.shape[0] for d in decoded],
                "w": [d.shape[1] for d in decoded],
                "mean_px": [float(d.mean()) for d in decoded]})

    got = {r["img_id"]: r for r in
           df.mapInPandas(run, "img_id INT, h INT, w INT, mean_px DOUBLE")
           .collect()}
    assert len(got) == 3
    for i, im in enumerate(imgs):
        assert (got[i]["h"], got[i]["w"]) == im.shape[:2]
        assert abs(got[i]["mean_px"] - float(im.mean())) < 3.0


def test_jpeg_subsampled_and_restart_streams():
    """The decoder's MCU interleave (2x2 luma + subsampled chroma),
    chroma upsampling, and restart-marker resync paths — exercised via
    the encoder's 4:2:0 and DRI options."""
    from big_data_share_market_spark.operators.jpeg import (
        decode_baseline_jpeg, encode_baseline_jpeg)

    img = _smooth_rgb(37, 29)  # non-multiple of 16: MCU edge padding
    p420 = decode_baseline_jpeg(encode_baseline_jpeg(img, subsample=True))
    assert p420.shape == (37, 29, 3)
    assert np.abs(p420.astype(int) - img.astype(int)).mean() < 8
    p422 = decode_baseline_jpeg(encode_baseline_jpeg(img, subsample="422"))
    assert p422.shape == (37, 29, 3)
    assert np.abs(p422.astype(int) - img.astype(int)).mean() < 8
    # restart markers are lossless: identical output with and without
    plain = decode_baseline_jpeg(encode_baseline_jpeg(img))
    rst = decode_baseline_jpeg(encode_baseline_jpeg(img, restart_interval=3))
    assert (plain == rst).all()
    both = decode_baseline_jpeg(
        encode_baseline_jpeg(img, subsample=True, restart_interval=2))
    only420 = decode_baseline_jpeg(
        encode_baseline_jpeg(img, subsample=True))
    assert (both == only420).all()


def test_jpeg_fill_bytes_and_cmyk_guard():
    """T.81 B.1.1.2 fill bytes before a marker must be skipped, and a
    4-component (CMYK-style) SOF must refuse rather than emit garbage
    RGB through the 3-component YCbCr transform."""
    import struct

    from big_data_share_market_spark.operators.jpeg import (
        decode_baseline_jpeg, encode_baseline_jpeg)

    img = _smooth_rgb(16, 16)
    payload = encode_baseline_jpeg(img)
    # insert two 0xFF fill bytes between SOI and the first segment
    filled = payload[:2] + b"\xff\xff" + payload[2:]
    assert (decode_baseline_jpeg(filled) == decode_baseline_jpeg(payload)).all()
    # patch SOF0 ncomp 3 -> 4 (length stays consistent enough to reach
    # the guard): must raise the documented error, not mis-decode
    sof_at = payload.index(b"\xff\xc0")
    ncomp_at = sof_at + 4 + 5  # marker(2) + len(2) + precision(1) + h(2) + w(2)
    bad = bytearray(payload)
    bad[ncomp_at] = 4
    with pytest.raises(NotImplementedError):
        decode_baseline_jpeg(bytes(bad))


def test_perceptual_dhash_brightness_invariant():
    """dHash compares neighbor blocks, so a global brightness offset
    (no clipping) must not change a single bit; a genuinely different
    image must."""
    from big_data_share_market_spark.operators.multimodal import (
        perceptual_dhash)

    rng = np.random.default_rng(7)
    img = rng.integers(20, 180, size=(16, 18, 3), dtype=np.uint8)
    base = perceptual_dhash(decode_image(make_bmp(img)))
    assert len(base) == 64 and set(base) <= {"0", "1"}
    brighter = (img.astype(np.int16) + 60).astype(np.uint8)  # no clip
    assert perceptual_dhash(decode_image(make_bmp(brighter))) == base
    other = rng.integers(20, 180, size=(16, 18, 3), dtype=np.uint8)
    assert perceptual_dhash(decode_image(make_bmp(other))) != base
    with pytest.raises(ValueError):
        perceptual_dhash(np.zeros((4, 4, 3), dtype=np.uint8))


def test_perceptual_dhash_through_map_in_pandas(spark):
    """Real-pixel dHash through the same mapInPandas plumbing the
    registry query uses: two BMP payloads (one a brightness-shifted
    dup) hash to the same value; a third does not."""
    from big_data_share_market_spark.operators.multimodal import (
        decode_image as dec, perceptual_dhash)

    rng = np.random.default_rng(11)
    a = rng.integers(20, 180, size=(12, 20, 3), dtype=np.uint8)
    b = (a.astype(np.int16) + 40).astype(np.uint8)
    c = rng.integers(20, 180, size=(12, 20, 3), dtype=np.uint8)
    rows = [(i, make_bmp(p)) for i, p in enumerate((a, b, c))]
    df = spark.createDataFrame(rows, "doc_id INT, payload BINARY")

    def run(batches):
        for pdf in batches:
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "dhash": [perceptual_dhash(dec(bytes(p)))
                          for p in pdf["payload"]],
            })

    out = {r["doc_id"]: r["dhash"]
           for r in df.mapInPandas(run, "doc_id INT, dhash STRING").collect()}
    assert out[0] == out[1] != out[2]


# ---------------------------------------------------------------------------
# PNG (operators/png.py)
# ---------------------------------------------------------------------------

def test_png_roundtrip_every_filter_type():
    """Encode the same RGB image once per scanline filter (None/Sub/
    Up/Average/Paeth) and decode each — every unfilter branch must
    reconstruct the exact pixels (an always-filter-0 encoder would
    leave four branches untested)."""
    from big_data_share_market_spark.operators.png import (decode_png,
                                                           encode_png)
    rng = np.random.default_rng(21)
    px = rng.integers(0, 256, size=(9, 13, 3), dtype=np.uint8)
    for ftype in range(5):
        out = decode_png(encode_png(px, filter_type=ftype))
        np.testing.assert_array_equal(out, px, err_msg=f"filter {ftype}")


def test_png_gray_and_alpha_channels():
    from big_data_share_market_spark.operators.png import (decode_png,
                                                           encode_png)
    rng = np.random.default_rng(22)
    gray = rng.integers(0, 256, size=(6, 5), dtype=np.uint8)
    out = decode_png(encode_png(gray, filter_type=4))
    np.testing.assert_array_equal(out, np.repeat(gray[:, :, None], 3, axis=2))
    rgba = rng.integers(0, 256, size=(4, 7, 4), dtype=np.uint8)
    out = decode_png(encode_png(rgba, filter_type=2))
    np.testing.assert_array_equal(out, rgba[:, :, :3])


def test_png_palette_and_16bit_and_subbyte():
    """Hand-built chunk streams for the paths the encoder doesn't
    write: color type 3 (palette), 16-bit RGB, and 2-bit grayscale."""
    import struct as _s
    import zlib as _z
    from big_data_share_market_spark.operators.png import (_SIGNATURE,
                                                           _chunk,
                                                           decode_png)

    def png(ihdr, chunks, raw):
        return (_SIGNATURE + _chunk(b"IHDR", _s.pack(">IIBBBBB", *ihdr))
                + b"".join(chunks)
                + _chunk(b"IDAT", _z.compress(raw)) + _chunk(b"IEND", b""))

    # palette: 2x2, indices [[0,1],[2,1]]
    pal = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255]], dtype=np.uint8)
    raw = b"\x00\x00\x01" + b"\x00\x02\x01"
    out = decode_png(png((2, 2, 8, 3, 0, 0, 0),
                         [_chunk(b"PLTE", pal.tobytes())], raw))
    np.testing.assert_array_equal(out, pal[[[0, 1], [2, 1]]])

    # 16-bit RGB 1x2: big-endian words; decode keeps the high byte
    raw16 = b"\x00" + bytes([0x12, 0x34, 0x56, 0x78, 0x9A, 0xBC,
                             0xFF, 0x00, 0x00, 0xFF, 0x80, 0x01])
    out = decode_png(png((2, 1, 16, 2, 0, 0, 0), [], raw16))
    np.testing.assert_array_equal(
        out, np.array([[[0x12, 0x56, 0x9A], [0xFF, 0x00, 0x80]]],
                      dtype=np.uint8))

    # 2-bit gray 4x1: packed 00 01 10 11 -> one byte 0b00011011,
    # scaled 0,85,170,255
    raw2 = b"\x00\x1b"
    out = decode_png(png((4, 1, 2, 0, 0, 0, 0), [], raw2))
    np.testing.assert_array_equal(out[:, :, 0],
                                  np.array([[0, 85, 170, 255]], np.uint8))


def test_png_contract_violations_raise_notimplemented():
    import struct as _s
    import zlib as _z
    from big_data_share_market_spark.operators.png import (_SIGNATURE,
                                                           _chunk,
                                                           decode_png,
                                                           encode_png)
    rng = np.random.default_rng(23)
    good = encode_png(rng.integers(0, 256, size=(4, 4, 3), dtype=np.uint8))
    # flip one IDAT byte -> CRC mismatch, not a zlib explosion
    bad = bytearray(good)
    idat_pos = good.index(b"IDAT")
    bad[idat_pos + 6] ^= 0xFF
    with pytest.raises(NotImplementedError, match="CRC"):
        decode_png(bytes(bad))
    # Adam7 interlace flag
    interlaced = (_SIGNATURE
                  + _chunk(b"IHDR", _s.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 1))
                  + _chunk(b"IDAT", _z.compress(b"\x00" * 14))
                  + _chunk(b"IEND", b""))
    with pytest.raises(NotImplementedError, match="Adam7"):
        decode_png(interlaced)
    # truncated payload
    with pytest.raises(NotImplementedError):
        decode_png(good[:len(good) // 2])
    # dispatch through decode_image
    np.testing.assert_array_equal(
        decode_image(good),
        decode_png(good))


def test_png_through_map_in_pandas(spark):
    """PNG payloads through the Arrow mapInPandas featurizer shape —
    the production plumbing decodes whatever format each row holds."""
    from big_data_share_market_spark.operators.png import encode_png
    rng = np.random.default_rng(24)
    imgs = [rng.integers(0, 256, size=(3 + i, 6, 3), dtype=np.uint8)
            for i in range(3)]
    rows = [(i, encode_png(px, filter_type=i % 5))
            for i, px in enumerate(imgs)]
    df = spark.createDataFrame(rows, "doc_id INT, payload BINARY")

    def run(batches):
        for pdf in batches:
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "px_sum": [int(decode_image(bytes(p)).astype(np.int64).sum())
                           for p in pdf["payload"]],
            })

    out = {r["doc_id"]: r["px_sum"]
           for r in df.mapInPandas(run, "doc_id INT, px_sum LONG").collect()}
    assert out == {i: int(px.astype(np.int64).sum())
                   for i, px in enumerate(imgs)}


def test_gif_roundtrip_and_interlace():
    """GIF round-trips exactly in both row orders: the interlaced
    encode permutes rows into pass order, so a correct decode proves
    the 4-pass de-interlace mapping, and the 256-color case walks the
    LZW width ladder (codes 9..12 bits)."""
    from big_data_share_market_spark.operators.gif import (
        decode_gif, encode_gif)
    rng = np.random.default_rng(31)
    pal = rng.integers(0, 256, (7, 3), dtype=np.uint8)
    img = pal[rng.integers(0, 7, (21, 13))]
    for interlace in (False, True):
        assert (decode_gif(encode_gif(img, interlace=interlace))
                == img).all()
    gray = np.arange(256, dtype=np.uint8).reshape(16, 16)
    img256 = np.stack([gray] * 3, axis=-1)
    assert (decode_gif(encode_gif(img256)) == img256).all()


def test_gif_known_external_artifact():
    """Decode a REAL GIF not produced by this module — the ubiquitous
    1x1 black transparent GIF (base64 constant found in countless web
    pages and tracking pixels) — so decoder correctness is anchored
    outside the encoder/decoder pair."""
    import base64

    from big_data_share_market_spark.operators.gif import decode_gif
    one = base64.b64decode(
        "R0lGODlhAQABAIAAAAAAAP///yH5BAEAAAAALAAAAAABAAEAAAIBRAA7")
    px = decode_gif(one)
    assert px.shape == (1, 1, 3)
    assert px.reshape(-1).tolist() == [0, 0, 0]


def test_gif_dispatch_and_malformed():
    """decode_image routes GIF signatures to the GIF decoder, and
    malformed GIF payloads raise the module's single documented
    exception type (NotImplementedError), never struct/index errors."""
    import pytest

    from big_data_share_market_spark.operators.gif import encode_gif
    rng = np.random.default_rng(32)
    pal = rng.integers(0, 256, (4, 3), dtype=np.uint8)
    img = pal[rng.integers(0, 4, (5, 9))]
    assert (decode_image(encode_gif(img)) == img).all()
    unknown_version = b"GIF88a" + encode_gif(img)[6:]
    for bad in (b"GIF8", b"GIF89a" + b"\x00" * 7,
                encode_gif(img)[:20], unknown_version):
        with pytest.raises(NotImplementedError):
            decode_image(bad)


def test_gif_roundtrip_property():
    """Property-based round-trip: arbitrary palette sizes (1..256
    colors — 1 color exercises the min 2-bit LZW code size), odd
    dimensions (interlace pass boundaries), and both row orders must
    reproduce pixels exactly. Catches width-ladder and pass-mapping
    bugs the fixed-seed tests might shelter."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from big_data_share_market_spark.operators.gif import (
        decode_gif, encode_gif)

    @settings(max_examples=25, deadline=None)
    @given(st.integers(1, 31), st.integers(1, 31), st.integers(1, 256),
           st.integers(0, 2**31 - 1), st.booleans())
    def run(h, w, ncolors, seed, interlace):
        rng = np.random.default_rng(seed)
        pal = rng.integers(0, 256, (ncolors, 3), dtype=np.uint8)
        img = pal[rng.integers(0, ncolors, (h, w))]
        dec = decode_gif(encode_gif(img, interlace=interlace))
        assert dec.shape == img.shape
        assert (dec == img).all()

    run()


def test_netpbm_roundtrip_all_variants():
    """Every P1-P6 variant must round-trip through decode_image,
    including comment-littered headers, 16-bit binary samples
    (maxval 65535 downscale), and non-byte-aligned P4 widths (row
    padding). Bitmap kinds quantize at 128, so the fixture uses pure
    black/white for them."""
    import numpy as np

    from big_data_share_market_spark.operators.multimodal import (
        decode_image)
    from big_data_share_market_spark.operators.netpbm import (
        decode_netpbm, encode_netpbm)

    rng = np.random.default_rng(7)
    color = rng.integers(0, 256, (5, 9, 3), dtype=np.uint8)
    gray = np.repeat(rng.integers(0, 256, (5, 9, 1), dtype=np.uint8),
                     3, axis=2)
    bw = np.repeat(
        (rng.integers(0, 2, (5, 13, 1), dtype=np.uint8) * 255), 3, axis=2)

    for kind in (1, 4):  # bitmaps, incl. width 13 (byte padding)
        enc = encode_netpbm(bw, kind, comment="bitmap fixture")
        assert (decode_image(enc) == bw).all(), kind
    for kind in (2, 5):
        enc = encode_netpbm(gray, kind, comment="gray fixture")
        assert (decode_image(enc) == gray).all(), kind
    for kind in (3, 6):
        enc = encode_netpbm(color, kind)
        assert (decode_image(enc) == color).all(), kind

    # 16-bit binary gray/color: scale up then back down exactly.
    for kind in (5, 6):
        src = gray if kind == 5 else color
        enc = encode_netpbm(src, kind, maxval=65535)
        assert (decode_image(enc) == src).all(), kind

    # Malformed payloads raise the contract exception.
    import pytest
    for bad in (b"P7\n1 1\n255\n\x00", b"P6\n4 4\n255\n\x00\x01",
                b"P2\n2 2\n255\n1 2 3", b"P3\n0 0\n255\n",
                b"P2\n2 1\n255\nx y"):
        with pytest.raises(NotImplementedError):
            decode_netpbm(bad)

"""Pure-stdlib+numpy PNG codec (RFC 2083 / ISO 15948, public spec).

PNG is the second format real multimodal corpora actually contain
(after JPEG), and unlike JPEG its compression layer is stdlib
`zlib` — so a container without PIL/opencv can still decode it
completely: signature + chunk walk (IHDR/PLTE/tRNS/IDAT/IEND), CRC
verification, zlib inflate, per-scanline unfiltering (None/Sub/Up/
Average/Paeth), and sample unpacking for bit depths 1/2/4/8/16.

Supported: non-interlaced, color types 0 (grayscale), 2 (RGB),
3 (palette), 4 (gray+alpha), 6 (RGBA), bit depths 1-16 where the
spec allows them. Adam7 interlacing raises NotImplementedError —
the documented "undecodable media" contract of the multimodal
module (`multimodal.decode_image` catches exactly that type).

The encoder half (`encode_png`) exists for round-trip tests:
8-bit gray/RGB/RGBA, per-scanline filter selectable so every
unfilter branch is exercised against known pixels (an encoder that
always writes filter 0 would leave Sub/Up/Average/Paeth untested).

Unfiltering is inherently sequential along x for Sub/Average/Paeth
(each pixel needs its already-reconstructed left neighbor), so those
scanlines run a per-pixel loop; Up is vectorized whole-row. Same
deployment story as jpeg.py: this kernel runs inside Arrow-batched
mapInPandas workers, never on the driver, and at 100 TB only the
kernel would be swapped for a native codec — the Spark-side plumbing
(binary columns, narrow map passes) is unchanged.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIGNATURE = b"\x89PNG\r\n\x1a\n"

#: samples per pixel by color type (0 gray, 2 RGB, 3 palette index,
#: 4 gray+alpha, 6 RGBA).
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}

#: bit depths the spec allows per color type.
_ALLOWED_DEPTHS = {0: (1, 2, 4, 8, 16), 2: (8, 16), 3: (1, 2, 4, 8),
                   4: (8, 16), 6: (8, 16)}


def _paeth(a: int, b: int, c: int) -> int:
    """Paeth predictor (spec section 6.6): nearest of left/up/upleft
    to the linear estimate a + b - c, ties broken a, b, c."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _unfilter(raw: bytes, height: int, stride: int, fpp: int) -> np.ndarray:
    """Reverse per-scanline filtering. `raw` is height * (1 + stride)
    bytes (leading filter-type byte per line); `fpp` is the filter
    unit in bytes (ceil(bit_depth/8) * channels). Returns the
    reconstructed (height, stride) uint8 array."""
    if len(raw) < height * (stride + 1):
        raise NotImplementedError("PNG: truncated inflated image data")
    out = np.zeros((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(height):
        line_start = y * (stride + 1)
        ftype = raw[line_start]
        line = np.frombuffer(
            raw, np.uint8, stride, line_start + 1).astype(np.int32)
        if ftype == 0:                       # None
            recon = line
        elif ftype == 2:                     # Up — vectorized whole-row
            recon = (line + prev) & 0xFF
        elif ftype == 1:                     # Sub — sequential in x
            recon = line.copy()
            for x in range(fpp, stride):
                recon[x] = (recon[x] + recon[x - fpp]) & 0xFF
        elif ftype == 3:                     # Average — sequential in x
            recon = line.copy()
            for x in range(stride):
                left = recon[x - fpp] if x >= fpp else 0
                recon[x] = (recon[x] + ((left + prev[x]) >> 1)) & 0xFF
        elif ftype == 4:                     # Paeth — sequential in x
            recon = line.copy()
            for x in range(stride):
                left = int(recon[x - fpp]) if x >= fpp else 0
                upleft = int(prev[x - fpp]) if x >= fpp else 0
                recon[x] = (recon[x]
                            + _paeth(left, int(prev[x]), upleft)) & 0xFF
        else:
            raise NotImplementedError(f"PNG: unknown filter type {ftype}")
        out[y] = recon.astype(np.uint8)
        prev = recon
    return out


def _unpack_samples(rows: np.ndarray, width: int, depth: int,
                    channels: int) -> np.ndarray:
    """(height, stride) filtered bytes -> (height, width, channels)
    integer samples at the stated bit depth."""
    height = rows.shape[0]
    if depth == 8:
        return rows[:, :width * channels].reshape(height, width, channels)
    if depth == 16:
        wide = rows[:, :width * channels * 2].reshape(
            height, width * channels, 2)
        vals = (wide[:, :, 0].astype(np.uint16) << 8) | wide[:, :, 1]
        return vals.reshape(height, width, channels)
    # sub-byte depths: big-endian bit packing, one channel only
    bits = np.unpackbits(rows, axis=1)
    per = depth
    usable = bits[:, :width * per].reshape(height, width, per)
    weights = (1 << np.arange(per - 1, -1, -1)).astype(np.uint16)
    return (usable * weights).sum(axis=2, dtype=np.uint16)[..., None]


def decode_png(payload: bytes) -> np.ndarray:
    """Decode a PNG byte string to an (H, W, 3) uint8 RGB array (the
    same output contract as the BMP/JPEG decoders: alpha is dropped,
    grayscale broadcasts, palette resolves, 16-bit scales to 8).
    Undecodable payloads raise NotImplementedError — never
    struct/zlib errors a corpus skip-handler would miss."""
    payload = bytes(payload)
    if payload[:8] != _SIGNATURE:
        raise NotImplementedError("not a PNG signature")
    pos = 8
    ihdr = None
    palette = None
    idat = bytearray()
    try:
        while pos + 8 <= len(payload):
            length, ctype = struct.unpack_from(">I4s", payload, pos)
            data = payload[pos + 8:pos + 8 + length]
            if len(data) < length:
                raise NotImplementedError("PNG: truncated chunk")
            crc = struct.unpack_from(">I", payload, pos + 8 + length)[0]
            if zlib.crc32(ctype + data) & 0xFFFFFFFF != crc:
                raise NotImplementedError(
                    f"PNG: CRC mismatch in {ctype!r} chunk")
            pos += 12 + length
            if ctype == b"IHDR":
                ihdr = struct.unpack(">IIBBBBB", data)
            elif ctype == b"PLTE":
                palette = np.frombuffer(data, np.uint8).reshape(-1, 3)
            elif ctype == b"IDAT":
                idat.extend(data)
            elif ctype == b"IEND":
                break
    except struct.error as exc:
        raise NotImplementedError(f"PNG: malformed chunk stream: {exc}") \
            from exc
    if ihdr is None or not idat:
        raise NotImplementedError("PNG: missing IHDR or IDAT")
    width, height, depth, color, comp, filt, interlace = ihdr
    if width == 0 or height == 0:
        raise NotImplementedError(f"PNG: invalid dimensions {width}x{height}")
    if comp != 0 or filt != 0:
        raise NotImplementedError("PNG: unknown compression/filter method")
    if interlace != 0:
        raise NotImplementedError("PNG: Adam7 interlacing not supported")
    if color not in _CHANNELS or depth not in _ALLOWED_DEPTHS.get(color, ()):
        raise NotImplementedError(
            f"PNG: color type {color} / bit depth {depth} not allowed")
    channels = _CHANNELS[color]
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as exc:
        raise NotImplementedError(f"PNG: corrupt IDAT stream: {exc}") from exc
    stride = (width * channels * depth + 7) // 8
    fpp = max(1, (depth + 7) // 8) * channels
    rows = _unfilter(raw, height, stride, fpp)
    samples = _unpack_samples(rows, width, depth, channels)
    if color == 3:
        if palette is None:
            raise NotImplementedError("PNG: palette image without PLTE")
        idx = samples[:, :, 0]
        if int(idx.max(initial=0)) >= len(palette):
            raise NotImplementedError("PNG: palette index out of range")
        return palette[idx]
    # scale to 8-bit
    if depth == 16:
        samples = (samples >> 8).astype(np.uint8)
    elif depth < 8:
        maxv = (1 << depth) - 1
        samples = (samples.astype(np.uint16) * 255 // maxv).astype(np.uint8)
    else:
        samples = samples.astype(np.uint8)
    if color == 0:
        return np.repeat(samples, 3, axis=2)
    if color == 4:
        return np.repeat(samples[:, :, :1], 3, axis=2)
    if color == 6:
        return samples[:, :, :3]
    return samples  # color type 2


# ---------------------------------------------------------------------------
# Encoder (round-trip tests only): 8-bit gray / RGB / RGBA
# ---------------------------------------------------------------------------

def _filter_line(line: np.ndarray, prev: np.ndarray, fpp: int,
                 ftype: int) -> bytes:
    """Apply filter `ftype` to a reconstructed scanline (spec forward
    direction) — the inverse of _unfilter's branches."""
    li = line.astype(np.int32)
    if ftype == 0:
        out = li
    elif ftype == 1:
        left = np.zeros_like(li)
        left[fpp:] = li[:-fpp]
        out = li - left
    elif ftype == 2:
        out = li - prev.astype(np.int32)
    elif ftype == 3:
        left = np.zeros_like(li)
        left[fpp:] = li[:-fpp]
        out = li - ((left + prev.astype(np.int32)) >> 1)
    elif ftype == 4:
        out = li.copy()
        pi = prev.astype(np.int32)
        for x in range(len(li)):
            a = int(li[x - fpp]) if x >= fpp else 0
            c = int(pi[x - fpp]) if x >= fpp else 0
            out[x] = li[x] - _paeth(a, int(pi[x]), c)
    else:
        raise ValueError(f"bad filter type {ftype}")
    return bytes([ftype]) + (out & 0xFF).astype(np.uint8).tobytes()


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF))


def encode_png(img: np.ndarray, filter_type: int = 0) -> bytes:
    """Encode an (H, W), (H, W, 3) or (H, W, 4) uint8 array as PNG,
    applying `filter_type` (0-4) to every scanline so round-trip
    tests can exercise each unfilter branch."""
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim == 2:
        img = img[:, :, None]
    channels = img.shape[2]
    color = {1: 0, 3: 2, 4: 6}[channels]
    height, width = img.shape[:2]
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color, 0, 0, 0)
    flat = img.reshape(height, width * channels)
    prev = np.zeros(width * channels, dtype=np.uint8)
    lines = []
    for y in range(height):
        lines.append(_filter_line(flat[y], prev, channels, filter_type))
        prev = flat[y]
    return (_SIGNATURE + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(b"".join(lines)))
            + _chunk(b"IEND", b""))

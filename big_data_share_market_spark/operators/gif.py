"""Pure-stdlib+numpy GIF codec (GIF87a/89a, CompuServe spec, public).

GIF is the third still-image format real crawled corpora contain in
volume (after JPEG/PNG), and like PNG it needs no external codec
library: the compression layer is the 1984 variable-width LZW scheme,
implementable in ~60 lines. This module decodes: header + logical
screen descriptor, global/local color tables, extension-block
skipping (including GIF89a graphic-control), the FIRST image
descriptor of animated files (the thumbnail convention), interlaced
and non-interlaced row order, and the full variable-width LZW stream
(code widths 3-12, clear/EOI handling, the KwKwK self-referencing
case).

Width-growth alignment (the classic interop bug): the encoder writes
the current code THEN grows the width when free_ent exceeds
2^width − 1 (the GIFCOMPR.C order), while the decoder grows after its
post-output insert — the two are exactly one insert out of phase,
which is what makes the same rule land on the same code boundary.
Validated against a well-known external artifact (the ubiquitous
1×1 GIF) in tests/test_multimodal_decode.py, not just against this
module's own encoder.

The encoder half exists for round-trip tests (≤256-color RGB,
optional interlace so the de-interlace path is exercised against
known pixels). Deployment story as jpeg.py/png.py: the kernel runs
inside Arrow-batched mapInPandas workers, never on the driver.
"""

from __future__ import annotations

import struct

import numpy as np

_MAX_CODE_WIDTH = 12


class _BitReader:
    """LSB-first bit reader over the concatenated LZW sub-blocks."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.bitbuf = 0
        self.nbits = 0

    def read(self, width: int) -> int | None:
        while self.nbits < width:
            if self.pos >= len(self.data):
                return None
            self.bitbuf |= self.data[self.pos] << self.nbits
            self.pos += 1
            self.nbits += 8
        out = self.bitbuf & ((1 << width) - 1)
        self.bitbuf >>= width
        self.nbits -= width
        return out


def _lzw_decode(min_code_size: int, data: bytes, n_pixels: int) -> bytes:
    clear = 1 << min_code_size
    eoi = clear + 1
    base = [bytes([i]) for i in range(clear)] + [b"", b""]
    table = list(base)
    width = min_code_size + 1
    reader = _BitReader(data)
    out = bytearray()
    prev: bytes | None = None
    while len(out) < n_pixels:
        code = reader.read(width)
        if code is None or code == eoi:
            break
        if code == clear:
            table = list(base)
            width = min_code_size + 1
            prev = None
            continue
        if code < len(table) and code >= 0 and (code < clear or code > eoi):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]  # the KwKwK case
        else:
            raise NotImplementedError("corrupt GIF LZW stream")
        out += entry
        if prev is not None and len(table) < (1 << _MAX_CODE_WIDTH):
            table.append(prev + entry[:1])
            if (len(table) > (1 << width) - 1
                    and width < _MAX_CODE_WIDTH):
                width += 1
        prev = entry
    if len(out) < n_pixels:
        raise NotImplementedError("truncated GIF pixel data")
    return bytes(out[:n_pixels])


def _lzw_encode(min_code_size: int, pixels: bytes) -> bytes:
    clear = 1 << min_code_size
    eoi = clear + 1
    width = min_code_size + 1
    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    free_ent = eoi + 1
    bitbuf = 0
    nbits = 0
    out = bytearray()

    def emit(code: int) -> None:
        nonlocal bitbuf, nbits, width, free_ent
        bitbuf |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(bitbuf & 0xFF)
            bitbuf >>= 8
            nbits -= 8
        # GIFCOMPR order: grow AFTER writing, using the pre-insert
        # free_ent — one insert out of phase with the decoder, which
        # is exactly what aligns the width change on both sides.
        if free_ent > (1 << width) - 1 and width < _MAX_CODE_WIDTH:
            width += 1

    emit(clear)
    cur = pixels[:1]
    for b in pixels[1:]:
        nxt = cur + bytes([b])
        if nxt in table:
            cur = nxt
            continue
        emit(table[cur])
        if free_ent < (1 << _MAX_CODE_WIDTH):
            table[nxt] = free_ent
            free_ent += 1
        cur = bytes([b])
    emit(table[cur])
    emit(eoi)
    if nbits:
        out.append(bitbuf & 0xFF)
    return bytes(out)


#: Interlace pass layout: (first row, stride) per pass.
_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _deinterlace_rows(height: int) -> list[int]:
    """Source-order list of destination row indices."""
    rows = []
    for first, stride in _INTERLACE_PASSES:
        rows.extend(range(first, height, stride))
    return rows


def decode_gif(payload: bytes) -> np.ndarray:
    """First frame of a GIF87a/89a payload as an (H, W, 3) uint8 RGB
    array (frame-local size; transparency is flattened onto the
    palette color, the thumbnail convention). Raises a clearly-marked
    NotImplementedError on malformed input — the multimodal module's
    one-exception contract."""
    payload = bytes(payload)
    if payload[:6] not in (b"GIF87a", b"GIF89a") or len(payload) < 13:
        raise NotImplementedError("not a GIF87a/89a payload")
    packed = payload[10]
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        if pos + 3 * n > len(payload):
            raise NotImplementedError("truncated GIF color table")
        gct = np.frombuffer(payload[pos:pos + 3 * n],
                            dtype=np.uint8).reshape(-1, 3)
        pos += 3 * n
    while pos < len(payload):
        block = payload[pos]
        pos += 1
        if block == 0x3B:  # trailer before any image
            break
        if block == 0x21:  # extension: label + sub-blocks
            pos += 1
            while pos < len(payload) and payload[pos] != 0:
                pos += payload[pos] + 1
            pos += 1
            continue
        if block != 0x2C:
            raise NotImplementedError("unknown GIF block type")
        if pos + 9 > len(payload):
            raise NotImplementedError("truncated GIF image descriptor")
        _left, _top, width, height = struct.unpack_from("<HHHH", payload, pos)
        ipacked = payload[pos + 8]
        pos += 9
        table = gct
        if ipacked & 0x80:
            n = 2 << (ipacked & 0x07)
            if pos + 3 * n > len(payload):
                raise NotImplementedError("truncated GIF color table")
            table = np.frombuffer(payload[pos:pos + 3 * n],
                                  dtype=np.uint8).reshape(-1, 3)
            pos += 3 * n
        if table is None:
            raise NotImplementedError("GIF image without a color table")
        if pos >= len(payload):
            raise NotImplementedError("truncated GIF data")
        min_code_size = payload[pos]
        pos += 1
        if not 2 <= min_code_size <= 11:
            raise NotImplementedError("invalid GIF LZW code size")
        chunks = []
        while pos < len(payload) and payload[pos] != 0:
            ln = payload[pos]
            chunks.append(payload[pos + 1:pos + 1 + ln])
            pos += ln + 1
        data = b"".join(chunks)
        idx = np.frombuffer(
            _lzw_decode(min_code_size, data, width * height),
            dtype=np.uint8)
        if idx.max(initial=0) >= len(table):
            raise NotImplementedError("GIF pixel index outside palette")
        img = table[idx].reshape(height, width, 3)
        if ipacked & 0x40:  # interlaced: rows arrive in pass order
            dest = np.empty_like(img)
            dest[_deinterlace_rows(height)] = img
            img = dest
        return np.ascontiguousarray(img)
    raise NotImplementedError("GIF contains no image descriptor")


def encode_gif(rgb: np.ndarray, interlace: bool = False) -> bytes:
    """GIF89a encoder for round-trip tests: (H, W, 3) uint8 with at
    most 256 distinct colors (palette built from the pixels)."""
    rgb = np.asarray(rgb, dtype=np.uint8)
    h, w, _ = rgb.shape
    flat = rgb.reshape(-1, 3)
    palette, inverse = np.unique(flat, axis=0, return_inverse=True)
    if len(palette) > 256:
        raise ValueError("encode_gif supports at most 256 colors")
    # Size field k encodes a 2^(k+1)-entry table: smallest k that fits.
    k = 0
    while (2 << k) < len(palette):
        k += 1
    tbl_n = 2 << k
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", w, h)
    out.append(0x80 | k)  # GCT present, size field
    out += b"\x00\x00"
    tbl = np.zeros((tbl_n, 3), dtype=np.uint8)
    tbl[:len(palette)] = palette
    out += tbl.tobytes()
    out.append(0x2C)
    out += struct.pack("<HHHH", 0, 0, w, h)
    out.append(0x40 if interlace else 0x00)
    idx = inverse.astype(np.uint8).reshape(h, w)
    if interlace:
        idx = idx[_deinterlace_rows(h)]
    min_code_size = max(2, k + 1)
    out.append(min_code_size)
    data = _lzw_encode(min_code_size, idx.tobytes())
    for i in range(0, len(data), 255):
        chunk = data[i:i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3B"
    return bytes(out)

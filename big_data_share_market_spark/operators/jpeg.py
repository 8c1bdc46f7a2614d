"""Pure-numpy baseline JPEG codec (ITU-T T.81, public spec).

Real training corpora are overwhelmingly JPEG, so the multimodal
decode path (`multimodal.decode_image`) needs the format even in a
container without PIL/ffmpeg. Baseline sequential DCT JPEG is fully
decodable from the published standard: marker segments (DQT/SOF0/
DHT/SOS), canonical Huffman codes, zig-zag dequantization, 8x8
inverse DCT-II, chroma upsampling, YCbCr -> RGB.

Supported: baseline (SOF0), 8-bit, grayscale / 4:4:4 / 4:2:2 / 4:2:0,
restart markers, multiple DQT/DHT segments. Progressive (SOF2),
arithmetic coding, and 12-bit precision raise NotImplementedError —
the documented "undecodable media" contract of the multimodal module.

The encoder half (`encode_baseline_jpeg`) exists for round-trip
tests: grayscale or 4:4:4, standard Annex K tables. Tests verify the
shared DCT matrix against the naive O(N^4) definition independently,
so an encoder/decoder bug cannot cancel out (tests/
test_multimodal_decode.py).

This is scalar/numpy Python — it runs inside Arrow-batched
mapInPandas workers (see multimodal.py), never on the driver, and the
per-image cost is the same O(pixels) a libjpeg deployment pays, just
with a larger constant. At 100 TB the plumbing (binary columns,
narrow map passes, maxPartitionBytes) is unchanged; only this kernel
would be swapped for a native codec.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# Shared constants (ITU-T T.81 Annex K — public specification tables)
# ---------------------------------------------------------------------------

#: Zig-zag scan order: index i of the scan holds coefficient ZIGZAG[i]
#: of the row-major 8x8 block.
ZIGZAG = np.array([
    0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63], dtype=np.int32)

#: Annex K.1 luminance / K.2 chrominance quantization tables (quality
#: ~50), in zig-zag order as they appear in a DQT segment.
QUANT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99], dtype=np.int32)[ZIGZAG]

QUANT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99], dtype=np.int32)[ZIGZAG]

#: Annex K.3 typical Huffman tables: (bits[1..16] counts, symbols).
HUFF_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)))
HUFF_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)))
HUFF_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
     0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
     0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
     0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
     0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
     0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
     0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
     0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
     0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
     0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
     0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
     0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
     0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
     0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])
HUFF_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
     0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
     0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
     0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
     0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
     0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
     0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
     0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
     0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
     0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
     0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
     0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
     0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
     0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])


def dct_matrix() -> np.ndarray:
    """Orthonormal 8x8 DCT-II basis T: forward = T @ X @ T.T, inverse
    = T.T @ C @ T. Tests pin T against the naive definitional sum."""
    t = np.zeros((8, 8))
    t[0, :] = 1.0 / np.sqrt(8.0)
    n = np.arange(8)
    for k in range(1, 8):
        t[k, :] = 0.5 * np.cos((2 * n + 1) * k * np.pi / 16.0)
    return t


_DCT_T = dct_matrix()


def _build_huffman(bits: list[int], symbols: list[int]) -> dict[tuple[int, int], int]:
    """(code_length, code) -> symbol, canonical JPEG code assignment:
    codes of each length are consecutive, starting from twice the
    previous length's end."""
    table: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = symbols[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _encode_huffman(bits: list[int], symbols: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code_length, code), the encoder-side inverse."""
    return {sym: (ln, code) for (ln, code), sym in
            _build_huffman(bits, symbols).items()}


class _BitReader:
    """MSB-first bit reader over the entropy-coded segment with JPEG
    byte-stuffing (0xFF 0x00 -> literal 0xFF) and restart-marker
    awareness."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.bitbuf = 0
        self.nbits = 0

    def _fill(self) -> None:
        while self.nbits <= 24:
            if self.pos >= len(self.data):
                # Pad with 1s past the end (spec-permitted for the
                # final truncated byte of the scan).
                self.bitbuf = (self.bitbuf << 8) | 0xFF
                self.nbits += 8
                continue
            byte = self.data[self.pos]
            if byte == 0xFF:
                nxt = self.data[self.pos + 1] if self.pos + 1 < len(self.data) else 0xD9
                if nxt == 0x00:
                    self.pos += 2
                elif 0xD0 <= nxt <= 0xD7:
                    # restart marker: consumed by sync_restart(), not here
                    self.bitbuf = (self.bitbuf << 8) | 0xFF
                    self.nbits += 8
                    continue
                else:
                    # genuine marker (EOI/next segment): pad
                    self.bitbuf = (self.bitbuf << 8) | 0xFF
                    self.nbits += 8
                    continue
            else:
                self.pos += 1
            self.bitbuf = (self.bitbuf << 8) | byte
            self.nbits += 8

    def read_bit(self) -> int:
        self._fill()
        self.nbits -= 1
        return (self.bitbuf >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def decode_symbol(self, table: dict[tuple[int, int], int]) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise NotImplementedError("corrupt JPEG: invalid Huffman code")

    def sync_restart(self) -> None:
        """Consume a DRI restart marker and reset to a byte boundary."""
        self.bitbuf = 0
        self.nbits = 0
        # scan forward to the RSTn marker
        while self.pos + 1 < len(self.data):
            if self.data[self.pos] == 0xFF and 0xD0 <= self.data[self.pos + 1] <= 0xD7:
                self.pos += 2
                return
            self.pos += 1
        raise NotImplementedError("corrupt JPEG: missing restart marker")


def _extend(v: int, s: int) -> int:
    """DIFF/AC value extension (T.81 F.2.2.1)."""
    return v - (1 << s) + 1 if s and v < (1 << (s - 1)) else v


def decode_baseline_jpeg(payload: bytes) -> np.ndarray:
    """Decode a baseline sequential JPEG to (H, W, 3) uint8 RGB
    (grayscale replicates to 3 channels). Raises NotImplementedError
    for progressive/arithmetic/12-bit streams and corrupt data — the
    multimodal module's documented undecodable-media contract."""
    if payload[:2] != b"\xff\xd8":
        raise NotImplementedError("not a JPEG (missing SOI)")
    quant: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    frame = None
    restart_interval = 0
    pos = 2
    try:
        while pos < len(payload):
            if payload[pos] != 0xFF:
                raise NotImplementedError("corrupt JPEG: lost marker sync")
            # T.81 B.1.1.2: any number of 0xFF fill bytes may precede
            # a marker — skip them rather than reading one as a marker.
            while payload[pos + 1] == 0xFF:
                pos += 1
            marker = payload[pos + 1]
            pos += 2
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                continue
            if marker == 0xD9:  # EOI
                break
            seglen = struct.unpack_from(">H", payload, pos)[0]
            seg = payload[pos + 2:pos + seglen]
            if marker == 0xDB:  # DQT
                p = 0
                while p < len(seg):
                    pq, tq = seg[p] >> 4, seg[p] & 15
                    if pq != 0:
                        raise NotImplementedError("16-bit quant tables unsupported")
                    quant[tq] = np.frombuffer(
                        seg, np.uint8, 64, p + 1).astype(np.int32)
                    p += 65
            elif marker == 0xC4:  # DHT
                p = 0
                while p < len(seg):
                    tc, th = seg[p] >> 4, seg[p] & 15
                    bits = list(seg[p + 1:p + 17])
                    nsym = sum(bits)
                    symbols = list(seg[p + 17:p + 17 + nsym])
                    (huff_dc if tc == 0 else huff_ac)[th] = _build_huffman(bits, symbols)
                    p += 17 + nsym
            elif marker == 0xC0:  # SOF0 baseline
                precision, height, width, ncomp = struct.unpack_from(">BHHB", seg, 0)
                if precision != 8:
                    raise NotImplementedError("only 8-bit precision supported")
                if ncomp not in (1, 3):
                    # 4-component (Adobe CMYK/YCCK) would entropy-decode
                    # fine but the YCbCr transform below is wrong for it
                    # — refuse loudly rather than emit garbage RGB.
                    raise NotImplementedError(
                        f"{ncomp}-component JPEG (CMYK/YCCK?) unsupported")
                comps = []
                for c in range(ncomp):
                    cid, hv, tq = seg[6 + 3 * c:9 + 3 * c]
                    hs, vs = hv >> 4, hv & 15
                    if not (1 <= hs <= 4 and 1 <= vs <= 4):
                        raise NotImplementedError(
                            f"corrupt JPEG: sampling factors {hs}x{vs}")
                    comps.append({"id": cid, "h": hs, "v": vs, "tq": tq})
                frame = {"h": height, "w": width, "comps": comps}
            elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                            0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
                raise NotImplementedError(
                    f"non-baseline JPEG (SOF{marker & 15}: progressive/"
                    "arithmetic/lossless) unsupported")
            elif marker == 0xDD:  # DRI
                restart_interval = struct.unpack_from(">H", seg, 0)[0]
            elif marker == 0xDA:  # SOS — entropy data follows
                if frame is None:
                    raise NotImplementedError("corrupt JPEG: SOS before SOF")
                ns = seg[0]
                scan_tables = {}
                for c in range(ns):
                    cs, tdta = seg[1 + 2 * c:3 + 2 * c]
                    scan_tables[cs] = (tdta >> 4, tdta & 15)
                return _decode_scan(payload, pos + seglen, frame, quant,
                                    huff_dc, huff_ac, scan_tables,
                                    restart_interval)
            pos += seglen
    except (IndexError, KeyError, ValueError, ZeroDivisionError,
            struct.error) as exc:
        # IndexError/struct.error: truncated segment bytes; ValueError:
        # numpy frombuffer on a short buffer; KeyError: a scan/component
        # referencing a DQT/DHT/SOF id that was never defined;
        # ZeroDivisionError: defensive (sampling factors are validated
        # above). All are the same user-facing fact — undecodable
        # payload — and must keep the one-except-clause contract.
        raise NotImplementedError(f"corrupt JPEG: {exc}") from exc
    raise NotImplementedError("corrupt JPEG: no SOS segment")


def _decode_scan(payload: bytes, pos: int, frame: dict, quant: dict,
                 huff_dc: dict, huff_ac: dict, scan_tables: dict,
                 restart_interval: int) -> np.ndarray:
    comps = frame["comps"]
    h_max = max(c["h"] for c in comps)
    v_max = max(c["v"] for c in comps)
    mcu_w, mcu_h = 8 * h_max, 8 * v_max
    mcus_x = -(-frame["w"] // mcu_w)
    mcus_y = -(-frame["h"] // mcu_h)
    planes = [np.zeros((mcus_y * c["v"] * 8, mcus_x * c["h"] * 8),
                       dtype=np.float64) for c in comps]
    reader = _BitReader(payload, pos)
    dc_pred = [0] * len(comps)
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                reader.sync_restart()
                dc_pred = [0] * len(comps)
            mcu_count += 1
            for ci, comp in enumerate(comps):
                td, ta = scan_tables[comp["id"]]
                qt = quant[comp["tq"]]
                for by in range(comp["v"]):
                    for bx in range(comp["h"]):
                        zz = np.zeros(64, dtype=np.int64)
                        s = reader.decode_symbol(huff_dc[td])
                        diff = _extend(reader.read_bits(s), s) if s else 0
                        dc_pred[ci] += diff
                        zz[0] = dc_pred[ci]
                        k = 1
                        while k < 64:
                            rs = reader.decode_symbol(huff_ac[ta])
                            r, s = rs >> 4, rs & 15
                            if s == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise NotImplementedError(
                                    "corrupt JPEG: AC index overflow")
                            zz[k] = _extend(reader.read_bits(s), s)
                            k += 1
                        block = np.zeros(64, dtype=np.float64)
                        block[ZIGZAG] = zz * qt
                        pix = _DCT_T.T @ block.reshape(8, 8) @ _DCT_T + 128.0
                        y0 = (my * comp["v"] + by) * 8
                        x0 = (mx * comp["h"] + bx) * 8
                        planes[ci][y0:y0 + 8, x0:x0 + 8] = pix
    # upsample chroma to full resolution, crop, color-convert
    full_h, full_w = mcus_y * mcu_h, mcus_x * mcu_w
    up = []
    for ci, comp in enumerate(comps):
        p = planes[ci]
        p = np.repeat(np.repeat(p, v_max // comp["v"], axis=0),
                      h_max // comp["h"], axis=1)
        up.append(p[:full_h, :full_w])
    if len(comps) == 1:
        gray = np.clip(np.round(up[0]), 0, 255).astype(np.uint8)
        gray = gray[:frame["h"], :frame["w"]]
        return np.stack([gray] * 3, axis=-1)
    y, cb, cr = up[0], up[1] - 128.0, up[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(
        np.uint8)[:frame["h"], :frame["w"]]


# ---------------------------------------------------------------------------
# Encoder (for round-trip tests): baseline, standard tables, grayscale
# or 4:4:4 color
# ---------------------------------------------------------------------------

class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.bitbuf = 0
        self.nbits = 0

    def write_bits(self, value: int, n: int) -> None:
        for i in range(n - 1, -1, -1):
            self.bitbuf = (self.bitbuf << 1) | ((value >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.out.append(self.bitbuf)
                if self.bitbuf == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.bitbuf = 0
                self.nbits = 0

    def flush(self) -> None:
        if self.nbits:
            self.write_bits((1 << (8 - self.nbits)) - 1, 8 - self.nbits)


def _magnitude(v: int) -> tuple[int, int]:
    """(size s, s-bit representation) of a DC diff / AC value."""
    if v == 0:
        return 0, 0
    s = int(v if v > 0 else -v).bit_length()
    return s, v if v >= 0 else v + (1 << s) - 1


def _encode_block(w: _BitWriter, block: np.ndarray, qt: np.ndarray,
                  dc_pred: int, dc_tab: dict, ac_tab: dict) -> int:
    coeff = _DCT_T @ (block.astype(np.float64) - 128.0) @ _DCT_T.T
    zz = np.round(coeff.reshape(64)[ZIGZAG] / qt).astype(np.int64)
    s, bits = _magnitude(int(zz[0]) - dc_pred)
    ln, code = dc_tab[s]
    w.write_bits(code, ln)
    if s:
        w.write_bits(bits, s)
    run = 0
    for k in range(1, 64):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            ln, code = ac_tab[0xF0]  # ZRL
            w.write_bits(code, ln)
            run -= 16
        s, bits = _magnitude(v)
        ln, code = ac_tab[(run << 4) | s]
        w.write_bits(code, ln)
        w.write_bits(bits, s)
        run = 0
    if run:
        ln, code = ac_tab[0x00]  # EOB
        w.write_bits(code, ln)
    return int(zz[0])


def encode_baseline_jpeg(img: np.ndarray,
                         subsample: bool | str = False,
                         restart_interval: int = 0) -> bytes:
    """Encode (H, W) grayscale or (H, W, 3) uint8 RGB as a baseline
    JPEG with Annex K tables. `subsample` of True/"420" emits 4:2:0
    (2x2 luma blocks per MCU, chroma averaged 2x2); "422" emits 4:2:2
    (horizontal-only chroma averaging); `restart_interval` emits a
    DRI segment and RSTn markers every N MCUs. Exists for round-trip
    tests of :func:`decode_baseline_jpeg` — the options exist so the
    decoder's MCU interleave, both chroma-upsampling axes, and the
    restart-sync path are all exercised."""
    img = np.asarray(img, dtype=np.uint8)
    gray = img.ndim == 2
    mode = "420" if subsample is True else (subsample or "")
    sub = bool(mode) and not gray
    sub_v = 2 if mode == "420" else 1  # vertical luma sampling factor
    h, w = img.shape[:2]
    out = bytearray(b"\xff\xd8")  # SOI

    def segment(marker: int, body: bytes) -> None:
        out.extend(struct.pack(">BBH", 0xFF, marker, len(body) + 2))
        out.extend(body)

    segment(0xDB, bytes([0]) + bytes(QUANT_LUMA.tolist()))
    if not gray:
        segment(0xDB, bytes([1]) + bytes(QUANT_CHROMA.tolist()))
    ncomp = 1 if gray else 3
    luma_hv = (0x20 | sub_v) if sub else 0x11
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for c in range(ncomp):
        sof += bytes([c + 1, luma_hv if c == 0 else 0x11,
                      0 if c == 0 else 1])
    segment(0xC0, sof)
    for tc_th, (bits, syms) in ((0x00, HUFF_DC_LUMA), (0x10, HUFF_AC_LUMA),
                                *(() if gray else
                                  ((0x01, HUFF_DC_CHROMA),
                                   (0x11, HUFF_AC_CHROMA),)),):
        segment(0xC4, bytes([tc_th]) + bytes(bits) + bytes(syms))
    if restart_interval:
        segment(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([ncomp])
    for c in range(ncomp):
        sos += bytes([c + 1, 0x00 if c == 0 else 0x11])
    sos += bytes([0, 63, 0])
    segment(0xDA, sos)

    dc_l, ac_l = _encode_huffman(*HUFF_DC_LUMA), _encode_huffman(*HUFF_AC_LUMA)
    if gray:
        planes = [img.astype(np.float64)]
        tabs = [(dc_l, ac_l, QUANT_LUMA)]
    else:
        rgb = img.astype(np.float64)
        r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        planes = [y, cb, cr]
        dc_c, ac_c = (_encode_huffman(*HUFF_DC_CHROMA),
                      _encode_huffman(*HUFF_AC_CHROMA))
        tabs = [(dc_l, ac_l, QUANT_LUMA), (dc_c, ac_c, QUANT_CHROMA),
                (dc_c, ac_c, QUANT_CHROMA)]
    # per-component sampling factors and padded planes
    hv = [(2, sub_v) if sub and ci == 0 else (1, 1) for ci in range(ncomp)]
    h_max = max(x for x, _ in hv)
    v_max = max(x for _, x in hv)
    mcu_h, mcu_w = 8 * v_max, 8 * h_max
    mcus_y, mcus_x = -(-h // mcu_h), -(-w // mcu_w)
    padded = []
    for ci in range(ncomp):
        p = planes[ci]
        if sub and ci > 0:
            # pad to even dims, then mean-downsample: 2x2 for 4:2:0,
            # horizontal pairs only for 4:2:2
            pe = np.pad(p, ((0, h % 2 if sub_v == 2 else 0), (0, w % 2)),
                        mode="edge")
            if sub_v == 2:
                p = pe.reshape(pe.shape[0] // 2, 2,
                               pe.shape[1] // 2, 2).mean(axis=(1, 3))
            else:
                p = pe.reshape(pe.shape[0],
                               pe.shape[1] // 2, 2).mean(axis=2)
        ch, cv = hv[ci]
        th, tw = mcus_y * cv * 8, mcus_x * ch * 8
        padded.append(np.pad(p, ((0, th - p.shape[0]), (0, tw - p.shape[1])),
                             mode="edge"))
    writer = _BitWriter()
    dc_pred = [0] * ncomp
    mcu_count = 0
    rst = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and \
                    mcu_count % restart_interval == 0:
                writer.flush()
                writer.out.extend((0xFF, 0xD0 + rst))
                rst = (rst + 1) % 8
                dc_pred = [0] * ncomp
            mcu_count += 1
            for ci in range(ncomp):
                dc_tab, ac_tab, qt = tabs[ci]
                ch, cv = hv[ci]
                for by in range(cv):
                    for bx in range(ch):
                        y0 = (my * cv + by) * 8
                        x0 = (mx * ch + bx) * 8
                        block = padded[ci][y0:y0 + 8, x0:x0 + 8]
                        dc_pred[ci] = _encode_block(
                            writer, block, qt, dc_pred[ci], dc_tab, ac_tab)
    writer.flush()
    out.extend(writer.out)
    out.extend(b"\xff\xd9")  # EOI
    return bytes(out)

"""Pure-numpy Netpbm codec (PBM/PGM/PPM, P1-P6 — the 1988 pbmplus
formats, public spec at netpbm.sourceforge.net).

Netpbm is the interchange format scientific / scraped datasets ship
uncompressed images in, and the simplest real decoder in the media
family: a whitespace-tokenized ASCII header (magic, width, height,
maxval for all but PBM, with '#' comments legal anywhere between
tokens), then either ASCII integer samples (P1-P3) or a packed binary
raster (P4: row-padded 1-bit, P5/P6: 1 or 2 big-endian bytes per
sample). All six variants decode to the (H, W, 3) uint8 RGB contract
`multimodal.decode_image` exposes for BMP/JPEG/PNG/GIF:

* PBM semantics: 1 = BLACK (the spec's ink-on-paper convention), so a
  set bit maps to 0 and a clear bit to 255;
* maxval scaling: round-half-up integer rescale
  ``(v * 255 + maxval // 2) // maxval`` — exact integer arithmetic,
  identity when maxval is 255, correct 16-bit (maxval up to 65535)
  downscale.

The encoder half exists for round-trip tests (every variant,
including 16-bit P5/P6 and comment-littered headers). Deployment
story as jpeg.py/png.py/gif.py: the kernel runs inside Arrow-batched
mapInPandas workers, never on the driver. Malformed input raises the
clearly-marked NotImplementedError the multimodal module's
one-exception contract requires.
"""

from __future__ import annotations

import numpy as np

_MAGICS = {b"P1", b"P2", b"P3", b"P4", b"P5", b"P6"}


def _bad(msg: str) -> NotImplementedError:
    return NotImplementedError(f"netpbm: {msg}")


def _tokens(payload: bytes, n: int, pos: int) -> tuple[list[int], int]:
    """Read n whitespace-separated ASCII integer tokens starting at
    pos, skipping '#' comments (legal wherever whitespace is)."""
    out: list[int] = []
    i = pos
    ln = len(payload)
    while len(out) < n:
        while i < ln and payload[i:i + 1].isspace():
            i += 1
        if i < ln and payload[i] == 0x23:  # '#': comment to EOL
            while i < ln and payload[i] not in (0x0A, 0x0D):
                i += 1
            continue
        j = i
        while j < ln and not payload[j:j + 1].isspace() and payload[j] != 0x23:
            j += 1
        if j == i:
            raise _bad("truncated header/raster")
        tok = payload[i:j]
        if not tok.isdigit():
            raise _bad(f"non-numeric token {tok[:8]!r}")
        out.append(int(tok))
        i = j
    return out, i


def decode_netpbm(payload: bytes) -> np.ndarray:
    """Decode any P1-P6 payload to an (H, W, 3) uint8 RGB array."""
    payload = bytes(payload)
    magic = payload[:2]
    if magic not in _MAGICS:
        raise _bad("not a P1-P6 payload")
    kind = magic[1] - 0x30  # 1..6
    bitmap = kind in (1, 4)
    channels = 3 if kind in (3, 6) else 1
    (w, h), pos = _tokens(payload, 2, 2)
    if w <= 0 or h <= 0 or w * h > 64_000_000:
        raise _bad("implausible dimensions")
    maxval = 1
    if not bitmap:
        (maxval,), pos = _tokens(payload, 1, pos)
        if not 0 < maxval < 65536:
            raise _bad("maxval out of range")
    n_samples = w * h * channels

    if kind in (1, 2, 3):  # ASCII rasters
        if kind == 1:
            # P1 allows unseparated digits ('0110') — but '#'
            # comments remain legal wherever whitespace is, and any
            # character other than 0/1/whitespace/comment is an
            # error, so walk the bytes instead of filtering digits.
            bits: list[int] = []
            i = pos
            ln = len(payload)
            while i < ln and len(bits) < n_samples:
                c = payload[i]
                if c == 0x23:  # '#': comment to EOL
                    while i < ln and payload[i] not in (0x0A, 0x0D):
                        i += 1
                elif c in (0x30, 0x31):
                    bits.append(c - 0x30)
                    i += 1
                elif payload[i:i + 1].isspace():
                    i += 1
                else:
                    raise _bad(f"invalid P1 raster byte {c:#x}")
            if len(bits) < n_samples:
                raise _bad("truncated P1 raster")
            samples = np.array(bits, dtype=np.uint16)
        else:
            vals, _ = _tokens(payload, n_samples, pos)
            samples = np.array(vals, dtype=np.uint16)
    else:  # binary rasters: exactly ONE whitespace byte after header
        pos += 1
        if kind == 4:
            stride = (w + 7) // 8
            need = stride * h
            if len(payload) < pos + need:
                raise _bad("truncated P4 raster")
            rows = np.frombuffer(payload, dtype=np.uint8,
                                 count=need, offset=pos)
            bits = np.unpackbits(rows.reshape(h, stride), axis=1)[:, :w]
            samples = bits.astype(np.uint16).reshape(-1)
        else:
            two_byte = maxval > 255
            dt = ">u2" if two_byte else np.uint8
            need = n_samples * (2 if two_byte else 1)
            if len(payload) < pos + need:
                raise _bad("truncated binary raster")
            samples = np.frombuffer(payload, dtype=dt,
                                    count=n_samples, offset=pos) \
                .astype(np.uint32)

    samples = samples.astype(np.uint32)
    if samples.max(initial=0) > maxval:
        raise _bad("sample exceeds maxval")
    if bitmap:
        gray = (1 - samples) * 255  # 1 = black
        rgb = np.repeat(gray.reshape(h, w, 1), 3, axis=2)
    else:
        scaled = (samples * 255 + maxval // 2) // maxval
        if channels == 1:
            rgb = np.repeat(scaled.reshape(h, w, 1), 3, axis=2)
        else:
            rgb = scaled.reshape(h, w, 3)
    return rgb.astype(np.uint8)


def encode_netpbm(img: np.ndarray, kind: int,
                  maxval: int = 255, comment: str | None = None) -> bytes:
    """Encode an (H, W, 3) uint8 RGB array as P1-P6 for round-trip
    tests. Gray/bitmap kinds use the red channel (callers pass
    grayscale-replicated arrays); bitmap kinds threshold at 128
    (>=128 -> white -> bit 0)."""
    img = np.asarray(img, dtype=np.uint8)
    h, w = img.shape[:2]
    head = f"P{kind}\n"
    if comment:
        head += f"# {comment}\n"
    head += f"{w} {h}\n"
    bitmap = kind in (1, 4)
    gray = img[:, :, 0].astype(np.uint32)
    if not bitmap:
        head += f"{maxval}\n"
    if kind == 1:
        bits = (gray < 128).astype(np.uint8)
        body = "\n".join(" ".join(str(b) for b in row)
                         for row in bits).encode()
        return head.encode() + body + b"\n"
    if kind == 4:
        bits = (gray < 128).astype(np.uint8)
        stride = (w + 7) // 8
        packed = np.packbits(bits, axis=1)
        assert packed.shape[1] == stride
        return head.encode() + packed.tobytes()
    def scale(v: np.ndarray) -> np.ndarray:
        return (v * maxval + 127) // 255

    if kind in (2, 3):
        vals = (scale(gray) if kind == 2
                else scale(img.astype(np.uint32)).reshape(h, -1))
        body = "\n".join(" ".join(str(v) for v in row) for row in vals)
        return head.encode() + body.encode() + b"\n"
    two_byte = maxval > 255
    dt = ">u2" if two_byte else np.uint8
    if kind == 5:
        return head.encode() + scale(gray).astype(dt).tobytes()
    return head.encode() + scale(img.astype(np.uint32)).astype(dt).tobytes()

"""Minimal pure-stdlib PNG codec (zlib + numpy only).

From-scratch implementation of the public PNG spec (RFC 2083 / W3C
PNG) — enough for the multimodal pipeline to exercise REAL pixel paths
in this codec-less container (VERDICT r4 #6): 8-bit greyscale / RGB /
RGBA, non-interlaced, all five scanline filters on decode, selectable
filter on encode. Anything else (16-bit, palette, interlace) raises
NotImplementedError — declared, never silently fabricated. Not a
performance codec: images in this pipeline are thumbnails (<= 64 px a
side), and the per-row defilter loops for the sequential filters
(Sub/Average/Paeth are data-dependent along x) are bounded by that
width; the Up/None filters and all encoding are vectorized.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"
# color type -> channels
_CHANNELS = {0: 1, 2: 3, 6: 4}
_COLOR_TYPE = {1: 0, 3: 2, 4: 6}


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def encode_png(arr: np.ndarray, filter_mode: int | str = 0) -> bytes:
    """Encode an (h, w) or (h, w, c) uint8 array, c in {1, 3, 4}.

    ``filter_mode``: a single filter id 0-4 applied to every scanline,
    or ``'cycle'`` (row i uses filter i % 5 — the device the decoder
    tests use to exercise every defilter)."""
    a = np.asarray(arr)
    if a.dtype != np.uint8:
        raise ValueError("encode_png: array must be uint8")
    if a.ndim == 2:
        a = a[:, :, None]
    if a.ndim != 3 or a.shape[2] not in _COLOR_TYPE:
        raise ValueError("encode_png: shape must be (h, w) or (h, w, {1|3|4})")
    h, w, c = a.shape
    if h == 0 or w == 0:
        raise ValueError("encode_png: empty image")
    ihdr = struct.pack(">IIBBBBB", w, h, 8, _COLOR_TYPE[c], 0, 0, 0)
    rows = a.reshape(h, w * c)
    prior = np.zeros(w * c, dtype=np.uint8)
    out = bytearray()
    for y in range(h):
        f = (y % 5) if filter_mode == "cycle" else int(filter_mode)
        raw = rows[y]
        out.append(f)
        out.extend(_filter_row(raw, prior, c, f).tobytes())
        prior = raw
    idat = zlib.compress(bytes(out), 6)
    return _SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")


def _filter_row(raw: np.ndarray, prior: np.ndarray, bpp: int, f: int) -> np.ndarray:
    """Apply scanline filter f to one reconstructed row (all vectorized:
    filtering — unlike DEfiltering — has no sequential dependency)."""
    r16 = raw.astype(np.int16)
    left = np.zeros_like(r16)
    left[bpp:] = r16[:-bpp]
    up = prior.astype(np.int16)
    upleft = np.zeros_like(up)
    upleft[bpp:] = up[:-bpp]
    if f == 0:
        out = r16
    elif f == 1:
        out = r16 - left
    elif f == 2:
        out = r16 - up
    elif f == 3:
        out = r16 - (left + up) // 2
    elif f == 4:
        out = r16 - _paeth(left, up, upleft)
    else:
        raise ValueError(f"encode_png: unknown filter {f}")
    return (out % 256).astype(np.uint8)


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    p = a + b - c
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    return np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))


def decode_png(data: bytes) -> np.ndarray:
    """Decode to an (h, w, c) uint8 array (c = 1 grey / 3 RGB / 4 RGBA).

    Supports what this repo's encoder and common 8-bit truecolor PNGs
    emit; raises NotImplementedError for the rest of the spec (16-bit,
    palette, interlace) and ValueError for malformed streams."""
    if data[:8] != _SIG:
        raise ValueError("decode_png: not a PNG (bad signature)")
    pos = 8
    ihdr = None
    idat = bytearray()
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        crc_bytes = data[pos + 8 + length : pos + 12 + length]
        if len(body) != length or len(crc_bytes) != 4:
            raise ValueError("decode_png: truncated chunk")
        crc = struct.unpack(">I", crc_bytes)[0]
        if zlib.crc32(ctype + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"decode_png: bad CRC in {ctype!r}")
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif ctype == b"IDAT":
            idat.extend(body)
        elif ctype == b"IEND":
            break
        pos += 12 + length
    if ihdr is None:
        raise ValueError("decode_png: missing IHDR")
    w, h, depth, color, comp, filt, interlace = ihdr
    if depth != 8:
        raise NotImplementedError(f"decode_png: bit depth {depth} unsupported")
    if color not in _CHANNELS:
        raise NotImplementedError(f"decode_png: color type {color} unsupported")
    if comp != 0 or filt != 0:
        raise ValueError("decode_png: unknown compression/filter method")
    if interlace != 0:
        raise NotImplementedError("decode_png: interlaced PNG unsupported")
    c = _CHANNELS[color]
    stride = w * c
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as e:
        raise ValueError(f"decode_png: bad IDAT stream ({e})") from e
    if len(raw) != h * (stride + 1):
        raise ValueError("decode_png: IDAT size mismatch")
    rows = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride + 1)
    out = np.empty((h, stride), dtype=np.uint8)
    prior = np.zeros(stride, dtype=np.int16)
    for y in range(h):
        f = int(rows[y, 0])
        line = rows[y, 1:].astype(np.int16)
        if f == 0:
            rec = line
        elif f == 2:
            rec = (line + prior) % 256
        elif f == 1:
            rec = line.copy()
            for i in range(c, stride):  # sequential along x by spec
                rec[i] = (rec[i] + rec[i - c]) % 256
        elif f == 3:
            rec = line.copy()
            for i in range(stride):
                left = rec[i - c] if i >= c else 0
                rec[i] = (rec[i] + (left + prior[i]) // 2) % 256
        elif f == 4:
            rec = line.copy()
            for i in range(stride):
                a = rec[i - c] if i >= c else 0
                b = prior[i]
                cc = prior[i - c] if i >= c else 0
                p = a + b - cc
                pa, pb, pc_ = abs(p - a), abs(p - b), abs(p - cc)
                pred = a if (pa <= pb and pa <= pc_) else (b if pb <= pc_ else cc)
                rec[i] = (rec[i] + pred) % 256
        else:
            raise ValueError(f"decode_png: unknown scanline filter {f}")
        out[y] = rec.astype(np.uint8)
        prior = rec
    return out.reshape(h, w, c)

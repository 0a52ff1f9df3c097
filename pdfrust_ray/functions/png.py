"""Pure stdlib-zlib + numpy PNG codec (no PIL/libpng in this container).

Decode supports the common still-image profile of ISO/IEC 15948: bit
depths 1/2/4/8/16, color types 0 (gray), 2 (RGB), 3 (palette), 4
(gray+alpha), 6 (RGBA), all five scanline filters, multi-IDAT streams,
ancillary chunks skipped. Adam7 interlace is rejected with ValueError
(callers surface it as an error row). Encode emits 8-bit gray / RGB /
RGBA, one selectable filter type for all rows — which makes
encode(filter=f) -> decode a real inverse-pair test for every filter.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIGNATURE = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _unfilter(raw: np.ndarray, h: int, stride: int, bpp: int) -> np.ndarray:
    """Reverse per-scanline filtering: raw is h rows of (1 filter byte +
    stride data bytes); returns [h, stride] recovered bytes. Filters
    operate on BYTES with pixel lag `bpp` regardless of bit depth
    (PNG 15948 §9)."""
    rows = raw.reshape(h, stride + 1)
    ftypes = rows[:, 0]
    data = rows[:, 1:].astype(np.int32)  # headroom for sums before & 255
    out = np.zeros((h, stride), dtype=np.int32)
    for y in range(h):
        ft = int(ftypes[y])
        cur = data[y]
        prev = out[y - 1] if y else np.zeros(stride, dtype=np.int32)
        if ft == 0:
            out[y] = cur
        elif ft == 1:  # Sub
            line = cur.copy()
            for x in range(bpp, stride):
                line[x] = (line[x] + line[x - bpp]) & 0xFF
            out[y] = line
        elif ft == 2:  # Up — no intra-row dependency: fully vectorized
            out[y] = (cur + prev) & 0xFF
        elif ft == 3:  # Average
            line = cur.copy()
            for x in range(stride):
                left = line[x - bpp] if x >= bpp else 0
                line[x] = (line[x] + ((left + prev[x]) >> 1)) & 0xFF
            out[y] = line
        elif ft == 4:  # Paeth
            line = cur.copy()
            for x in range(stride):
                left = line[x - bpp] if x >= bpp else 0
                ul = prev[x - bpp] if x >= bpp else 0
                line[x] = (line[x] + _paeth(int(left), int(prev[x]), int(ul))) & 0xFF
            out[y] = line
        else:
            raise ValueError(f"unknown PNG filter type {ft}")
    return out.astype(np.uint8)


def _apply_filter(pixels_bytes: np.ndarray, ftype: int, bpp: int) -> np.ndarray:
    """Forward filter for the encoder: [h, stride] bytes -> h rows of
    (filter byte + filtered bytes)."""
    h, stride = pixels_bytes.shape
    cur = pixels_bytes.astype(np.int32)
    out = np.empty((h, stride + 1), dtype=np.uint8)
    out[:, 0] = ftype
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        line = cur[y]
        if ftype == 0:
            filt = line
        elif ftype == 1:
            left = np.zeros(stride, dtype=np.int32)
            left[bpp:] = line[:-bpp]
            filt = line - left
        elif ftype == 2:
            filt = line - prev
        elif ftype == 3:
            left = np.zeros(stride, dtype=np.int32)
            left[bpp:] = line[:-bpp]
            filt = line - ((left + prev) >> 1)
        elif ftype == 4:
            left = np.zeros(stride, dtype=np.int32)
            left[bpp:] = line[:-bpp]
            ul = np.zeros(stride, dtype=np.int32)
            ul[bpp:] = prev[:-bpp]
            pred = np.fromiter(
                (_paeth(int(left[x]), int(prev[x]), int(ul[x])) for x in range(stride)),
                dtype=np.int32,
                count=stride,
            )
            filt = line - pred
        else:
            raise ValueError(f"unknown PNG filter type {ftype}")
        out[y, 1:] = filt & 0xFF
        prev = line
    return out


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def encode_png(arr: np.ndarray, filter_type: int = 0) -> bytes:
    """[H, W] (gray) / [H, W, 3] (RGB) / [H, W, 4] (RGBA) uint8 -> PNG."""
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, c = arr.shape
    color_type = {1: 0, 3: 2, 4: 6}[c]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    bpp = c
    filtered = _apply_filter(
        arr.astype(np.uint8).reshape(h, w * c), filter_type, bpp
    ).tobytes()
    return (
        _SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(filtered))
        + _chunk(b"IEND", b"")
    )


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes -> uint8 (or uint16 for depth-16) pixel array:
    [H, W] for gray, [H, W, C] otherwise; palette images are expanded
    to RGB. Raises ValueError on malformed/unsupported input."""
    if data[:8] != _SIGNATURE:
        raise ValueError("not a PNG payload")
    pos = 8
    ihdr = None
    plte = None
    idat = []
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        if len(body) != length:
            raise ValueError("truncated PNG chunk")
        pos += 12 + length  # length + tag + body + crc
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif tag == b"PLTE":
            plte = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
        elif tag == b"IDAT":
            idat.append(body)
        elif tag == b"IEND":
            break
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    w, h, depth, color_type, comp, filt, interlace = ihdr
    if comp != 0 or filt != 0:
        raise ValueError("unsupported PNG compression/filter method")
    if interlace != 0:
        raise ValueError("interlaced PNG not supported")
    if color_type not in _CHANNELS:
        raise ValueError(f"unknown PNG color type {color_type}")
    if depth not in (1, 2, 4, 8, 16):
        raise ValueError(f"illegal PNG bit depth {depth}")
    if depth < 8 and color_type not in (0, 3):
        raise ValueError("sub-byte depth only legal for gray/palette PNG")
    channels = _CHANNELS[color_type]
    bits_per_pixel = depth * channels
    stride = (w * bits_per_pixel + 7) // 8
    bpp = max(1, bits_per_pixel // 8)
    raw = np.frombuffer(zlib.decompress(b"".join(idat)), dtype=np.uint8)
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG pixel data length mismatch")
    recovered = _unfilter(raw, h, stride, bpp)
    if depth == 16:
        pix = (
            recovered.reshape(h, stride)
            .view(">u2")
            .astype(np.uint16)
            .reshape(h, w, channels)
        )
    elif depth == 8:
        pix = recovered.reshape(h, w, channels)
    else:  # 1/2/4-bit gray or palette indices, MSB-first within bytes
        bits = np.unpackbits(recovered, axis=1)[:, : w * depth].reshape(h, w, depth)
        weights = (1 << np.arange(depth - 1, -1, -1)).astype(np.uint8)
        pix = (bits * weights).sum(axis=2).astype(np.uint8)[:, :, None]
    if color_type == 3:
        if plte is None:
            raise ValueError("palette PNG missing PLTE")
        idx = pix[:, :, 0]
        if int(idx.max(initial=0)) >= len(plte):
            raise ValueError("palette index out of range")
        return plte[idx]
    if channels == 1:
        return pix[:, :, 0]
    return pix


def to_rgb(pix: np.ndarray) -> np.ndarray:
    """Normalize any decode_png output to [H, W, 3] uint8 for the
    feature extractor: 16-bit scaled down, gray broadcast, alpha
    dropped."""
    if pix.dtype == np.uint16:
        pix = (pix >> 8).astype(np.uint8)
    if pix.ndim == 2:
        return np.repeat(pix[:, :, None], 3, axis=2)
    if pix.shape[2] == 2:  # gray+alpha
        return np.repeat(pix[:, :, :1], 3, axis=2)
    if pix.shape[2] == 4:
        return pix[:, :, :3]
    return pix

"""Pure-Python/numpy GIF codec (no PIL in this container).

Decode covers the GIF87a/89a still + animation profile: global/local
color tables, variable-width LSB-first LZW with table growth to 12
bits and CLEAR resets, Adam-style 4-pass interlacing, frame
compositing with disposal methods 0-3 and GCE transparency. Encode
emits GIF89a with a global palette and a real dictionary LZW
compressor (code-width growth + table reset at 4096), single- or
multi-frame — so encode -> decode round-trips exercise the full code
path. Raises ValueError on malformed/unsupported input (callers
surface error rows).
"""

from __future__ import annotations

import struct

import numpy as np

_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


class _BitReader:
    """LSB-first bit reader over the concatenated LZW data stream."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.bit = 0

    def read(self, n: int) -> int:
        out = 0
        got = 0
        while got < n:
            if self.pos >= len(self.data):
                raise ValueError("LZW stream truncated")
            avail = 8 - self.bit
            take = min(n - got, avail)
            chunk = (self.data[self.pos] >> self.bit) & ((1 << take) - 1)
            out |= chunk << got
            got += take
            self.bit += take
            if self.bit == 8:
                self.bit = 0
                self.pos += 1
        return out


def _lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> bytes:
    clear = 1 << min_code_size
    end = clear + 1
    out = bytearray()
    br = _BitReader(data)
    table: list[bytes] = []
    width = min_code_size + 1
    prev: bytes | None = None

    def reset():
        nonlocal table, width, prev
        table = [bytes([i]) for i in range(clear)] + [b"", b""]
        width = min_code_size + 1
        prev = None

    reset()
    while len(out) < n_pixels:
        code = br.read(width)
        if code == clear:
            reset()
            continue
        if code == end:
            break
        if prev is None:
            if code >= len(table):
                raise ValueError("LZW: first code not a literal")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            if len(table) < 4096:  # deferred-clear: full table stops growing
                table.append(prev + entry[:1])
        elif code == len(table) and len(table) < 4096:
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("LZW: code out of range")
        out.extend(entry)
        prev = entry
        if len(table) == (1 << width) and width < 12:
            width += 1
    return bytes(out[:n_pixels])


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, width: int):
        self.acc |= code << self.nbits
        self.nbits += width
        while self.nbits >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def flush(self) -> bytes:
        if self.nbits:
            self.out.append(self.acc & 0xFF)
        return bytes(self.out)


def _lzw_encode(pixels: bytes, min_code_size: int) -> bytes:
    clear = 1 << min_code_size
    end = clear + 1
    bw = _BitWriter()

    def fresh():
        return {bytes([i]): i for i in range(clear)}, clear + 2, min_code_size + 1

    table, next_code, width = fresh()
    bw.write(clear, width)
    buf = b""
    for px in pixels:
        cand = buf + bytes([px])
        if cand in table:
            buf = cand
            continue
        bw.write(table[buf], width)
        table[cand] = next_code
        next_code += 1
        if next_code - 1 == (1 << width) and width < 12:
            width += 1
        if next_code > 4095:
            bw.write(clear, width)
            table, next_code, width = fresh()
        buf = bytes([px])
    if buf:
        bw.write(table[buf], width)
    bw.write(end, width)
    return bw.flush()


def _sub_blocks(data: bytes, pos: int) -> tuple[bytes, int]:
    """Concatenate GIF data sub-blocks starting at pos; returns
    (payload, position after the 0x00 terminator)."""
    out = bytearray()
    while True:
        if pos >= len(data):
            raise ValueError("GIF sub-blocks truncated")
        n = data[pos]
        pos += 1
        if n == 0:
            return bytes(out), pos
        out.extend(data[pos : pos + n])
        if len(data) < pos + n:
            raise ValueError("GIF sub-blocks truncated")
        pos += n


def _deinterlace(idx: np.ndarray) -> np.ndarray:
    h = idx.shape[0]
    order = np.concatenate(
        [np.arange(start, h, step) for start, step in _INTERLACE_PASSES]
    )
    out = np.empty_like(idx)
    out[order] = idx
    return out


def decode_gif(data: bytes) -> list[np.ndarray]:
    """GIF bytes -> list of composited [H, W, 3] uint8 RGB frames."""
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    if len(data) < 13:
        raise ValueError("GIF header truncated")
    w, h, packed, bg_idx, _aspect = struct.unpack("<HHBBB", data[6:13])
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(data[pos : pos + 3 * n], dtype=np.uint8).reshape(n, 3)
        pos += 3 * n
    canvas = np.zeros((h, w, 3), dtype=np.uint8)
    if gct is not None and bg_idx < len(gct):
        canvas[:, :] = gct[bg_idx]
    frames: list[np.ndarray] = []
    transparent = None
    disposal = 0
    while pos < len(data):
        block = data[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            label = data[pos]
            pos += 1
            body, pos = _sub_blocks(data, pos)
            if label == 0xF9 and len(body) >= 4:  # graphic control
                flags = body[0]
                disposal = (flags >> 2) & 0x07
                transparent = body[3] if flags & 0x01 else None
            continue
        if block != 0x2C:
            raise ValueError(f"unknown GIF block 0x{block:02x}")
        if len(data) < pos + 9:
            raise ValueError("GIF image descriptor truncated")
        left, top, fw, fh, fpacked = struct.unpack("<HHHHB", data[pos : pos + 9])
        pos += 9
        table = gct
        if fpacked & 0x80:
            n = 2 << (fpacked & 0x07)
            table = np.frombuffer(data[pos : pos + 3 * n], dtype=np.uint8).reshape(n, 3)
            pos += 3 * n
        if table is None:
            raise ValueError("GIF frame has no color table")
        mcs = data[pos]
        pos += 1
        if not 2 <= mcs <= 11:
            raise ValueError(f"illegal LZW min code size {mcs}")
        lzw, pos = _sub_blocks(data, pos)
        idx = np.frombuffer(_lzw_decode(lzw, mcs, fw * fh), dtype=np.uint8)
        if len(idx) != fw * fh:
            raise ValueError("GIF frame pixel data short")
        idx = idx.reshape(fh, fw)
        if fpacked & 0x40:
            idx = _deinterlace(idx)
        if int(idx.max(initial=0)) >= len(table):
            raise ValueError("GIF color index out of range")
        before = canvas.copy() if disposal == 3 else None
        region = canvas[top : top + fh, left : left + fw]
        rgb = table[idx]
        if transparent is not None:
            opaque = idx != transparent
            region[opaque] = rgb[opaque]
        else:
            region[:, :] = rgb
        frames.append(canvas.copy())
        if disposal == 2:
            bg = gct[bg_idx] if gct is not None and bg_idx < len(gct) else 0
            canvas[top : top + fh, left : left + fw] = bg
        elif disposal == 3 and before is not None:
            canvas = before
        transparent = None
        disposal = 0
    if not frames:
        raise ValueError("GIF contains no image data")
    return frames


def encode_gif(frames, delay_cs: int = 4) -> bytes:
    """One or more [H, W, 3] uint8 frames (shared <=256-color palette)
    -> GIF89a bytes with real dictionary-LZW compression."""
    if isinstance(frames, np.ndarray):
        frames = [frames]
    h, w = frames[0].shape[:2]
    flat = np.concatenate([f.reshape(-1, 3) for f in frames])
    palette, inverse = np.unique(flat, axis=0, return_inverse=True)
    if len(palette) > 256:
        raise ValueError("encode_gif: more than 256 distinct colors")
    # palette size must be a power of two >= 2
    bits = max(1, int(len(palette) - 1).bit_length())
    size = 1 << bits
    pal = np.zeros((size, 3), dtype=np.uint8)
    pal[: len(palette)] = palette
    mcs = max(2, bits)
    out = bytearray()
    out += b"GIF89a"
    out += struct.pack("<HHBBB", w, h, 0x80 | (bits - 1), 0, 0)
    out += pal.tobytes()
    per_frame = inverse.reshape(len(frames), h * w)
    for i in range(len(frames)):
        if len(frames) > 1:
            out += b"\x21\xf9\x04" + bytes([0x00, delay_cs & 0xFF, delay_cs >> 8, 0]) + b"\x00"
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
        out += bytes([mcs])
        lzw = _lzw_encode(per_frame[i].astype(np.uint8).tobytes(), mcs)
        for off in range(0, len(lzw), 255):
            chunk = lzw[off : off + 255]
            out += bytes([len(chunk)]) + chunk
        out += b"\x00"
    out += b"\x3b"
    return bytes(out)

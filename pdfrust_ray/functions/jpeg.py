"""Pure-numpy baseline JPEG codec (no libjpeg/PIL in this container).

Decode covers the baseline DCT profile (SOF0): 8-bit samples, any
number of DQT/DHT segments, component sampling factors 1-2 (4:4:4,
4:2:2, 4:2:0), byte-stuffed entropy data, DRI/RSTn restart intervals,
gray or YCbCr color. Progressive (SOF2) and arithmetic coding raise
ValueError (callers surface error rows).

Encode emits baseline 4:4:4 (or grayscale) JFIF with the quant tables
scaled by the libjpeg quality convention and SELF-DESCRIBING canonical
huffman tables (flat 4-bit DC / 8-bit AC code lengths): JPEG carries
its tables in DHT segments, so the stream stays fully standard without
transcribing the Annex-K tables — and encode -> decode round-trips
exercise the whole marker/entropy/DCT path. The codec is lossy by
design; tests pin exactness on DC-only content and PSNR bounds
elsewhere.
"""

from __future__ import annotations

import struct

import numpy as np

# zigzag scan order: index i of the scan -> (row, col)
_ZZ = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)
_UNZZ = np.argsort(_ZZ)

_QL = np.array(  # ISO/IEC 10918-1 K.1 luminance
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.float64,
)
_QC = np.array(  # K.2 chrominance
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.float64,
)

# orthonormal DCT-II matrix: coeff = C @ block @ C.T
_C = np.zeros((8, 8))
for _u in range(8):
    _a = np.sqrt(0.125) if _u == 0 else 0.5
    for _x in range(8):
        _C[_u, _x] = _a * np.cos((2 * _x + 1) * _u * np.pi / 16)


def _quality_tables(quality: int):
    q = max(1, min(100, quality))
    scale = 5000 / q if q < 50 else 200 - 2 * q
    ql = np.clip(np.floor((_QL * scale + 50) / 100), 1, 255)
    qc = np.clip(np.floor((_QC * scale + 50) / 100), 1, 255)
    return ql, qc


def _canonical_codes(bits: list[int], values: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) from a DHT-style (BITS, HUFFVAL) spec."""
    out = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[values[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


# encoder tables: flat canonical codes (every table is EMBEDDED in the
# stream's DHT, so only self-consistency matters, not Annex-K parity).
# DC: 12 symbols at 4 bits (max code 11 < 15, all-ones never assigned).
# AC: 162 symbols at 8 bits (max code 161 < 255).
_DC_BITS = [0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
_DC_VALS = list(range(12))
_AC_VALS = [0x00, 0xF0] + [
    (run << 4) | size for run in range(16) for size in range(1, 11)
]
_AC_BITS = [0, 0, 0, 0, 0, 0, 0, len(_AC_VALS), 0, 0, 0, 0, 0, 0, 0, 0]


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int):
        self.acc = (self.acc << length) | code
        self.n += length
        while self.n >= 8:
            byte = (self.acc >> (self.n - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def flush(self):
        if self.n:
            pad = 8 - self.n
            self.write((1 << pad) - 1, pad)  # pad with 1s
        return bytes(self.out)


def _magnitude(v: int) -> tuple[int, int]:
    """(size, amplitude bits) per JPEG F.1.2.1 (negative values use the
    one's-complement convention)."""
    if v == 0:
        return 0, 0
    size = int(abs(v)).bit_length()
    bits = v if v > 0 else v + (1 << size) - 1
    return size, bits


def _seg(marker: int, body: bytes) -> bytes:
    return struct.pack(">HH", marker, len(body) + 2) + body


def encode_jpeg(arr: np.ndarray, quality: int = 85) -> bytes:
    """[H, W, 3] RGB or [H, W] gray uint8 -> baseline JFIF (4:4:4)."""
    gray = arr.ndim == 2
    h, w = arr.shape[:2]
    ql, qc = _quality_tables(quality)
    if gray:
        planes = [arr.astype(np.float64) - 128.0]
        qts = [ql]
        comp_q = [0]
    else:
        rgb = arr.astype(np.float64)
        r, g, b = rgb[:, :, 0], rgb[:, :, 1], rgb[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        planes = [y - 128.0, cb - 128.0, cr - 128.0]
        qts = [ql, qc, qc]
        comp_q = [0, 1, 1]
    ph = (h + 7) // 8 * 8
    pw = (w + 7) // 8 * 8
    padded = []
    for p in planes:
        pp = np.empty((ph, pw))
        pp[:h, :w] = p
        pp[h:, :w] = p[-1:, :]
        pp[:, w:] = pp[:, w - 1 : w]
        padded.append(pp)

    dc_codes = _canonical_codes(_DC_BITS, _DC_VALS)
    ac_codes = _canonical_codes(_AC_BITS, _AC_VALS)
    bw = _BitWriter()
    pred = [0] * len(planes)
    for by in range(0, ph, 8):
        for bx in range(0, pw, 8):
            for ci, p in enumerate(padded):
                block = p[by : by + 8, bx : bx + 8]
                coeff = _C @ block @ _C.T
                qv = np.rint(coeff / qts[comp_q[ci]].reshape(8, 8)).astype(np.int64)
                zz = qv.reshape(64)[_ZZ]
                dc = int(zz[0])
                size, bits = _magnitude(dc - pred[ci])
                pred[ci] = dc
                c, ln = dc_codes[size]
                bw.write(c, ln)
                if size:
                    bw.write(bits, size)
                run = 0
                last_nz = int(np.nonzero(zz[1:])[0][-1]) + 1 if np.any(zz[1:]) else 0
                for i in range(1, last_nz + 1):
                    v = int(zz[i])
                    if v == 0:
                        run += 1
                        continue
                    while run > 15:
                        c, ln = ac_codes[0xF0]  # ZRL
                        bw.write(c, ln)
                        run -= 16
                    size, bits = _magnitude(v)
                    c, ln = ac_codes[(run << 4) | size]
                    bw.write(c, ln)
                    bw.write(bits, size)
                    run = 0
                if last_nz < 63:
                    c, ln = ac_codes[0x00]  # EOB
                    bw.write(c, ln)
    scan = bw.flush()

    out = bytearray(b"\xff\xd8")  # SOI
    out += _seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += _seg(0xFFDB, bytes([0]) + bytes(ql.astype(np.uint8).reshape(64)[_ZZ]))
    if not gray:
        out += _seg(0xFFDB, bytes([1]) + bytes(qc.astype(np.uint8).reshape(64)[_ZZ]))
    ncomp = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci in range(ncomp):
        sof += bytes([ci + 1, 0x11, comp_q[ci]])  # 1x1 sampling
    out += _seg(0xFFC0, sof)
    out += _seg(0xFFC4, bytes([0x00] + _DC_BITS) + bytes(_DC_VALS))
    out += _seg(0xFFC4, bytes([0x10] + _AC_BITS) + bytes(_AC_VALS))
    sos = bytes([ncomp])
    for ci in range(ncomp):
        sos += bytes([ci + 1, 0x00])  # DC table 0, AC table 0
    sos += bytes([0, 63, 0])
    out += _seg(0xFFDA, sos)
    out += scan
    out += b"\xff\xd9"  # EOI
    return bytes(out)


class _BitReader:
    """MSB-first reader over entropy-coded data with FF00 unstuffing;
    stops at any real marker and reports RSTn."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.n = 0
        self.marker: int | None = None

    def _fill(self):
        while self.n < 24:
            if self.marker is not None:
                raise ValueError("JPEG entropy data truncated at marker")
            if self.pos >= len(self.data):
                raise ValueError("JPEG entropy data truncated")
            b = self.data[self.pos]
            if b == 0xFF:
                nxt = self.data[self.pos + 1] if self.pos + 1 < len(self.data) else None
                if nxt == 0x00:
                    self.pos += 2
                else:
                    self.marker = nxt
                    return
            else:
                self.pos += 1
            self.acc = (self.acc << 8) | b
            self.n += 8

    def read(self, nbits: int) -> int:
        if nbits == 0:
            return 0
        while self.n < nbits:
            before = self.n
            self._fill()
            if self.n == before:
                raise ValueError("JPEG entropy data truncated")
        out = (self.acc >> (self.n - nbits)) & ((1 << nbits) - 1)
        self.n -= nbits
        self.acc &= (1 << self.n) - 1
        return out

    def restart(self):
        """Consume an RSTn marker between intervals and realign."""
        self.acc = 0
        self.n = 0
        if self.marker is None:
            self._fill()  # may park on the marker
            self.acc = 0
            self.n = 0
        if self.marker is None or not (0xD0 <= self.marker <= 0xD7):
            raise ValueError("expected JPEG restart marker")
        self.pos += 2
        self.marker = None


def _decode_huff(br: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.read(1)
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid JPEG huffman code")


def _extend(bits: int, size: int) -> int:
    if size == 0:
        return 0
    if bits >> (size - 1):
        return bits
    return bits - (1 << size) + 1


def decode_jpeg(data: bytes) -> np.ndarray:
    """Baseline JPEG bytes -> uint8 pixels ([H, W] gray / [H, W, 3] RGB)."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    comps = None
    h = w = 0
    restart_interval = 0
    while True:
        if pos + 4 > len(data):
            raise ValueError("JPEG truncated before SOS")
        if data[pos] != 0xFF:
            raise ValueError("JPEG marker desync")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:
            raise ValueError("JPEG has no scan data")
        (seglen,) = struct.unpack(">H", data[pos : pos + 2])
        body = data[pos + 2 : pos + seglen]
        if len(body) != seglen - 2:
            raise ValueError("JPEG segment truncated")
        pos += seglen
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            off = 0
            while off < len(body):
                pq, tq = body[off] >> 4, body[off] & 0x0F
                off += 1
                if pq != 0:
                    raise ValueError("16-bit quant tables not supported")
                tbl = np.frombuffer(body[off : off + 64], dtype=np.uint8).astype(np.float64)
                qt[tq] = tbl[_UNZZ]  # store in natural order
                off += 64
        elif marker == 0xC4:  # DHT
            off = 0
            while off < len(body):
                tc, th = body[off] >> 4, body[off] & 0x0F
                bits = list(body[off + 1 : off + 17])
                nval = sum(bits)
                vals = list(body[off + 17 : off + 17 + nval])
                table = {}
                code = 0
                k = 0
                for length in range(1, 17):
                    for _ in range(bits[length - 1]):
                        table[(length, code)] = vals[k]
                        code += 1
                        k += 1
                    code <<= 1
                huff[(tc, th)] = table
                off += 17 + nval
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 baseline
            prec, h, w, nc = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                raise ValueError("only 8-bit JPEG supported")
            comps = []
            for i in range(nc):
                cid, hv, tq = body[6 + 3 * i : 9 + 3 * i]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq})
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("only baseline (SOF0) JPEG supported")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:  # SOS
            ns = body[0]
            scan_comps = []
            for i in range(ns):
                cs, tt = body[1 + 2 * i : 3 + 2 * i]
                scan_comps.append({"id": cs, "td": tt >> 4, "ta": tt & 0x0F})
            break
        # all other segments (APPn, COM, ...) are skipped
    if comps is None:
        raise ValueError("JPEG missing SOF before SOS")
    for c in comps:
        if not (1 <= c["h"] <= 2 and 1 <= c["v"] <= 2):
            raise ValueError("sampling factors above 2 not supported")
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    planes = []
    for c in comps:
        planes.append(np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8)))
    by_id = {c["id"]: i for i, c in enumerate(comps)}
    order = [by_id[sc["id"]] for sc in scan_comps]
    br = _BitReader(data, pos)
    pred = [0] * len(comps)
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                br.restart()
                pred = [0] * len(comps)
            mcu_count += 1
            for k, ci in enumerate(order):
                c = comps[ci]
                dc_tbl = huff.get((0, scan_comps[k]["td"]))
                ac_tbl = huff.get((1, scan_comps[k]["ta"]))
                if dc_tbl is None or ac_tbl is None:
                    raise ValueError("JPEG scan references missing huffman table")
                q = qt.get(c["tq"])
                if q is None:
                    raise ValueError("JPEG scan references missing quant table")
                for vblk in range(c["v"]):
                    for hblk in range(c["h"]):
                        zz = np.zeros(64, dtype=np.float64)
                        size = _decode_huff(br, dc_tbl)
                        diff = _extend(br.read(size), size)
                        pred[ci] += diff
                        zz[0] = pred[ci]
                        i = 1
                        while i < 64:
                            sym = _decode_huff(br, ac_tbl)
                            if sym == 0x00:  # EOB
                                break
                            run, sz = sym >> 4, sym & 0x0F
                            if sz == 0:
                                if run != 15:
                                    raise ValueError("invalid JPEG AC symbol")
                                i += 16  # ZRL
                                continue
                            i += run
                            if i > 63:
                                raise ValueError("JPEG AC run overflows block")
                            zz[i] = _extend(br.read(sz), sz)
                            i += 1
                        blk = (zz * q)[_UNZZ].reshape(8, 8)
                        pix = _C.T @ blk @ _C + 128.0
                        y0 = (my * c["v"] + vblk) * 8
                        x0 = (mx * c["h"] + hblk) * 8
                        planes[ci][y0 : y0 + 8, x0 : x0 + 8] = pix
    # upsample subsampled planes to full size and crop
    full = []
    for i, c in enumerate(comps):
        p = planes[i]
        if c["h"] < hmax:
            p = np.repeat(p, hmax // c["h"], axis=1)
        if c["v"] < vmax:
            p = np.repeat(p, vmax // c["v"], axis=0)
        full.append(p[:h, :w])
    if len(full) == 1:
        return np.clip(np.rint(full[0]), 0, 255).astype(np.uint8)
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.rint(np.stack([r, g, b], axis=2)), 0, 255).astype(np.uint8)

"""Stream filters.

Pins /root/reference/src/filters.rs:4-14: the reference allocates a
zero-filled buffer of exactly 10x the compressed size, issues a single
read, and returns the whole buffer. Decompressed output is therefore
always zero-PADDED to 10x compressed size, and silently TRUNCATED if
the real output exceeds 10x. Trailing NULs are whitespace to the
tokenizer (tokenizer.rs:83) so text extraction is unaffected, but
`--raw-content` includes the padding (body.rs:529-535) — replicated.
"""

from __future__ import annotations

import zlib

from .errors import ParseError


def flate_decode(data: bytes) -> bytes:
    cap = len(data) * 10
    try:
        d = zlib.decompressobj()
        out = d.decompress(data, cap)
    except zlib.error as exc:
        raise ParseError("Flate", str(exc))
    if len(out) < cap:
        out = out + b"\0" * (cap - len(out))
    return out


def flate_decode_exact(data: bytes) -> bytes:
    """Spec-mode FlateDecode: exact zlib inflate, no 10x pad/truncate.

    Used only on the spec_mode=True path (PDF 1.5+ xref streams, object
    streams, and content streams) — the parity path above keeps the
    reference's buffer quirk. Tolerates trailing garbage after the
    zlib stream (common in real PDFs; d.unused_data), but rejects
    TRUNCATED streams: a cut deflate stream decompresses partially
    without raising (d.eof stays False), so without this check
    spec-mode xref/ObjStm/content streams would silently extract wrong
    partial text instead of producing an error row."""
    try:
        d = zlib.decompressobj()
        out = d.decompress(data)
    except zlib.error as exc:
        raise ParseError("Flate", str(exc))
    if not d.eof:
        raise ParseError("Flate", "truncated stream")
    return out


def apply_png_predictor(data: bytes, columns: int, colors: int = 1, bpc: int = 8) -> bytes:
    """Reverse PNG row filters (Predictor 10-15, ISO 32000-1 7.4.4.4).

    The reference panics on any DecodeParms (xref.rs:368-376); this is
    the spec-mode replacement. Per-byte Python is fine here: predictor
    payloads are xref/object-stream indexes, kilobytes at most."""
    bpp = max(1, (colors * bpc) // 8)
    rowlen = (columns * colors * bpc + 7) // 8
    out = bytearray()
    prev = bytearray(rowlen)
    i = 0
    n = len(data)
    while i < n:
        ft = data[i]
        i += 1
        row = bytearray(data[i : i + rowlen])
        i += rowlen
        if len(row) < rowlen:
            raise ParseError("Predictor", "truncated predictor row")
        if ft == 0:
            pass
        elif ft == 1:  # Sub
            for j in range(bpp, rowlen):
                row[j] = (row[j] + row[j - bpp]) & 0xFF
        elif ft == 2:  # Up
            for j in range(rowlen):
                row[j] = (row[j] + prev[j]) & 0xFF
        elif ft == 3:  # Average
            for j in range(rowlen):
                left = row[j - bpp] if j >= bpp else 0
                row[j] = (row[j] + ((left + prev[j]) >> 1)) & 0xFF
        elif ft == 4:  # Paeth
            for j in range(rowlen):
                a = row[j - bpp] if j >= bpp else 0
                b = prev[j]
                c = prev[j - bpp] if j >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                row[j] = (row[j] + pred) & 0xFF
        else:
            raise ParseError("Predictor", f"unknown PNG filter type {ft}")
        out += row
        prev = row
    return bytes(out)

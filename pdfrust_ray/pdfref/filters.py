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

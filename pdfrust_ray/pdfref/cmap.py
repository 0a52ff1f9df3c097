"""ToUnicode CMap parsing.

Pins /root/reference/src/cmap.rs:
  - codespacerange length 1 -> one-byte codes, 2 -> two-byte codes,
    anything else panics (cmap.rs:41-45).
  - bfchar: key hexstring of 1 or 2 bytes; VALUE decodes only the
    first UTF-16 code unit `x[0]*256 + x[1]` — a multi-unit value like
    <00660066> ("ff") yields just 'f' (cmap.rs:72-75) — quirk kept.
    Lone surrogates fail decode_utf16 -> panic (replicated as error).
  - bfrange incrementing form maps src1..=src2 to consecutive
    destinations (cmap.rs:109-122); array form maps consecutive codes
    to successive array entries (cmap.rs:124-138).
  - loops terminate on a peeked `endbfchar`/`endbfrange` keyword; EOF
    inside a section panics (cmap.rs:67).
"""

from __future__ import annotations

from .errors import ParseError
from .tokenizer import ARR_BEGIN, ARR_END, HEX, STR, Tokenizer


class ToUnicodeCMap:
    __slots__ = ("begin_code_space_range", "end_code_space_range", "is_two_bytes", "cmap")

    def __init__(self, begin, end, is_two_bytes, cmap):
        self.begin_code_space_range = begin
        self.end_code_space_range = end
        self.is_two_bytes = is_two_bytes
        self.cmap = cmap


def _utf16_first_unit_char(x: bytes) -> str:
    if len(x) < 2:
        raise ParseError("CMap", "bfchar value needs at least two bytes")
    code = x[0] * 256 + x[1]
    if 0xD800 <= code <= 0xDFFF:
        # Rust: char::decode_utf16([code]).next().unwrap().ok().unwrap() panics
        raise ParseError("CMap", f"lone surrogate {code:#x} in CMap value")
    return chr(code)


def _code_from_hex(x: bytes, what: str) -> int:
    if len(x) == 2:
        return x[0] * 256 + x[1]
    if len(x) == 1:
        return x[0]
    raise ParseError("CMap", f"{what} should contain one or two bytes, found {len(x)}")


def parse_tounicode(source: str) -> ToUnicodeCMap:
    """ToUnicodeCMap::from(String) (cmap.rs:13-155).

    `source` is the lossy-UTF-8 decode of the (possibly Flate-decoded)
    CMap stream, re-encoded to bytes for tokenization — matching
    body.rs:281-283's String round-trip.
    """
    tok = Tokenizer(source.encode("utf-8"), 0)

    while True:
        t = tok.next()
        if t is None:
            raise ParseError("CMap", "begincodespacerange not found")
        if t[0] == STR and t[1] == b"begincodespacerange":
            break
    t = tok.next()
    if t is None or t[0] != HEX:
        raise ParseError("CMap", f"begincodespacerange next token should be HexString, found {t!r}")
    begin = t[1]
    t = tok.next()
    if t is None or t[0] != HEX:
        raise ParseError("CMap", f"endcodespacerange next token should be HexString, found {t!r}")
    end = t[1]
    if len(begin) == 1:
        is_two = False
    elif len(begin) == 2:
        is_two = True
    else:
        raise ParseError("CMap", f"Cmap index with byte length {len(begin)} is not supported")

    cmap: dict[int, str] = {}
    while True:
        t = tok.next()
        if t is None:
            break
        if t[0] != STR:
            continue
        if t[1] == b"beginbfchar":
            while True:
                peek = tok.clone().next()
                if peek is not None and peek[0] == STR and peek[1] == b"endbfchar":
                    break
                t2 = tok.next()
                if t2 is None:
                    raise ParseError("CMap", "end of cmap file reached in bfchar")
                if t2[0] != HEX:
                    raise ParseError("CMap", f"CMap key should be an hex string, found {t2!r}")
                key = _code_from_hex(t2[1], "BFChar key")
                t3 = tok.next()
                if t3 is None:
                    raise ParseError("CMap", "end of cmap file reached in bfchar")
                if t3[0] != HEX:
                    raise ParseError("CMap", f"CMap val should be an hex string, found {t3!r}")
                cmap[key] = _utf16_first_unit_char(t3[1])
        elif t[1] == b"beginbfrange":
            while True:
                peek = tok.clone().next()
                if peek is not None and peek[0] == STR and peek[1] == b"endbfrange":
                    break
                t2 = tok.next()
                if t2 is None:
                    raise ParseError("CMap", "end of cmap file reached in bfrange")
                if t2[0] != HEX:
                    raise ParseError("CMap", f"CMap srcCode1 should be an hex string, found {t2!r}")
                src1 = _code_from_hex(t2[1], "BFRange first source code")
                t3 = tok.next()
                if t3 is None:
                    raise ParseError("CMap", "end of cmap file reached in bfrange")
                if t3[0] != HEX:
                    raise ParseError("CMap", f"CMap srcCode2 should be an hex string, found {t3!r}")
                src2 = _code_from_hex(t3[1], "BFRange second source code")
                t4 = tok.next()
                if t4 is None:
                    raise ParseError("CMap", "end of cmap file reached in bfrange")
                if t4[0] == HEX:
                    x = t4[1]
                    if len(x) < 2:
                        raise ParseError("CMap", "bfrange dst needs two bytes")
                    dst = x[0] * 256 + x[1]
                    for idx in range(src1, src2 + 1):
                        if 0xD800 <= dst <= 0xDFFF:
                            raise ParseError("CMap", "lone surrogate in bfrange")
                        cmap[idx] = chr(dst)
                        dst += 1
                elif t4[0] == ARR_BEGIN:
                    idx = 0
                    while True:
                        t5 = tok.next()
                        if t5 is None:
                            raise ParseError("CMap", "end of cmap file reached in bfrange array")
                        if t5[0] == ARR_END:
                            break
                        if t5[0] != HEX:
                            raise ParseError(
                                "CMap", f"CMap range should only contain hex strings, found {t5!r}"
                            )
                        cmap[src1 + idx] = _utf16_first_unit_char(t5[1])
                        idx += 1
                else:
                    raise ParseError(
                        "CMap", f"CMap dst_string should be an hex string or an array, found {t4!r}"
                    )
    return ToUnicodeCMap(begin, end, is_two, cmap)

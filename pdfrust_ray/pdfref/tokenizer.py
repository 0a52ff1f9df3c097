"""PDF byte tokenizer + lemmatizer.

Pins /root/reference/src/tokenizer.rs:
  - byte classes: NUL/TAB/LF/FF/CR/SPACE are whitespace, ()<>[]{}/% are
    delimiters, everything else regular (tokenizer.rs:74-90).
  - comments read to CR/LF (tokenizer.rs:211-224); dict begin/end on
    "<<"/">>"; hexstrings with odd-length '0' padding
    (tokenizer.rs:248-250); a lone '>' not followed by '>' is silently
    skipped (tokenizer.rs:262-269); '{'/'}' panic (tokenizer.rs:272).
  - literal strings: nested parens tracked on the RAW chars (escaped
    parens don't count), escapes per table 3.2 with the reference's
    octal quirk `(c*8)+d*8+e` i.e. 8c+8d+e, NOT 64c+8d+e
    (tokenizer.rs:313-321); a trailing lone backslash is dropped.
  - regular tokens: first byte arbitrary, subsequent bytes must be
    digits or '.' for the token to stay numeric; parse i32 then f32
    (tokenizer.rs:334-360); keywords stream/endstream/endobj
    (tokenizer.rs:361-366).
  - Lemmatizer folds "a b R" -> IndirectRef and "a b obj" -> ObjBegin
    with a cloned-tokenizer lookahead, skips comments, and — quirk —
    returns end-of-stream when it sees `int int <other-keyword>`
    (tokenizer.rs:119-157: the `_ => ()` fall-through reaches the
    trailing `None`).
"""

from __future__ import annotations

from .errors import ParseError
from .numbers import parse_numeric

# token kinds
NUM = 0
STR = 1  # bare keyword, bytes
LIT = 2  # literal string, bytes
HEX = 3  # hex string, decoded bytes
NAME = 4  # name, str
COMMENT = 5
REF = 6  # (obj, gen)
DICT_BEGIN = 7
DICT_END = 8
ARR_BEGIN = 9
ARR_END = 10
STREAM_BEGIN = 11
STREAM_END = 12
OBJ_BEGIN = 13
OBJ_END = 14

KIND_NAMES = {
    NUM: "Numeric",
    STR: "String",
    LIT: "LitteralString",
    HEX: "HexString",
    NAME: "Name",
    COMMENT: "Comment",
    REF: "IndirectRef",
    DICT_BEGIN: "DictBegin",
    DICT_END: "DictEnd",
    ARR_BEGIN: "ArrayBegin",
    ARR_END: "ArrayEnd",
    STREAM_BEGIN: "StreamBegin",
    STREAM_END: "StreamEnd",
    OBJ_BEGIN: "ObjBegin",
    OBJ_END: "ObjEnd",
}

_WS = frozenset((0, 9, 10, 12, 13, 32))

import re as _re

# first non-whitespace byte (NUL/TAB/LF/FF/CR/SPACE are whitespace)
_NONWS_RE = _re.compile(rb"[^\x00\t\n\x0c\r ]")
# a run of regular bytes (neither whitespace nor delimiter)
_REGULAR_RE = _re.compile(rb"[^\x00\t\n\x0c\r ()<>\[\]{}/%]+")
# any byte that stops a numeric tail (anything but digits and '.')
_NONNUM_RE = _re.compile(rb"[^0-9.]")
# comment terminator
_CRLF_RE = _re.compile(rb"[\r\n]")
_HEXSET = frozenset("0123456789abcdefABCDEF")
# literal-string specials: parens and backslash
_LITSPECIAL_RE = _re.compile(rb"[()\\]")
_DELIM = frozenset(b"()<>[]{}/%")
_HEXDIGITS = frozenset(b"0123456789ABCDEFabcdef")
_DIGITS = frozenset(b"0123456789")
_NUMCHARS = frozenset(b"0123456789.")


class Tokenizer:
    """Byte-stream tokenizer over `bytes`, starting at `pos`.

    State is a single index, so the reference's iterator clone
    (tokenizer.rs:126) is a cheap position copy.
    """

    __slots__ = ("bytes", "pos")

    def __init__(self, data: bytes, pos: int = 0):
        self.bytes = data
        self.pos = pos

    def clone(self) -> "Tokenizer":
        return Tokenizer(self.bytes, self.pos)

    def next_n(self, length: int) -> bytes:
        """Skip whitespace, then peek exactly `length` bytes (no consume)
        — tokenizer.rs:173-185 (the reference clones the iterator)."""
        b = self.bytes
        n = len(b)
        i = self.pos
        while True:
            if i >= n:
                raise ParseError("Tokenize", "End of stream reached")
            if b[i] in _WS:
                i += 1
            else:
                break
        self.pos = i
        return bytes(b[i : i + length])

    def next_n_spec(self, length: int) -> bytes:
        """ISO 32000-1 §7.3.8.1 stream positioning: the payload begins
        after exactly one EOL following the `stream` keyword. The
        parity `next_n` instead skips ALL whitespace (tokenizer.rs:
        173-185) — harmless for Flate payloads (0x78 first byte) but it
        eats leading whitespace-class bytes of encrypted/binary
        payloads, so spec mode uses this exact variant."""
        b = self.bytes
        i = self.pos
        if b[i : i + 2] == b"\r\n":
            i += 2
        elif i < len(b) and b[i] in (0x0A, 0x0D):
            i += 1
        self.pos = i
        return bytes(b[i : i + length])

    def next(self):
        """Return the next token as (kind, value) or None at EOF."""
        b = self.bytes
        n = len(b)
        i = self.pos
        while i < n:
            m = _NONWS_RE.search(b, i)
            if m is None:
                i = n
                break
            i = m.start()
            c = b[i]
            i += 1
            if c == 0x25:  # '%' comment: read to CR/LF (not consumed)
                m2 = _CRLF_RE.search(b, i)
                end = m2.start() if m2 else n
                self.pos = end
                return (COMMENT, bytes(b[i:end]))
            if c == 0x3C:  # '<'
                if i < n and b[i] == 0x3C:
                    self.pos = i + 1
                    return (DICT_BEGIN, None)
                if i < n and b[i] in _HEXDIGITS:
                    end = b.find(0x3E, i)  # '>'
                    if end < 0:
                        self.pos = n
                        return None  # tokenizer.rs:244 returns None at EOF
                    raw = b[i:end]
                    i = end + 1
                    s = raw.decode("latin-1")
                    if len(s) % 2 == 1:
                        s += "0"
                    # strict pair parse: any non-hex byte (incl. whitespace)
                    # panics in the reference (tokenizer.rs:253-256 unwrap)
                    if not set(s) <= _HEXSET:
                        raise ParseError("Tokenize", f"bad hexstring {s!r}")
                    decoded = bytes.fromhex(s)
                    self.pos = i
                    return (HEX, decoded)
                if i < n:
                    raise ParseError(
                        "Tokenize",
                        f"Character {b[i]} is not interpreted as hexstring",
                    )
                raise ParseError("Tokenize", "No character following '<'")
            if c == 0x3E:  # '>'
                if i < n and b[i] == 0x3E:
                    self.pos = i + 1
                    return (DICT_END, None)
                if i < n:
                    continue  # silently skipped (tokenizer.rs:267)
                raise ParseError("Tokenize", "Reached end of stream before end of litteral")
            if c == 0x5B:  # '['
                self.pos = i
                return (ARR_BEGIN, None)
            if c == 0x5D:  # ']'
                self.pos = i
                return (ARR_END, None)
            if c == 0x7B or c == 0x7D:  # '{' '}'
                raise ParseError("Tokenize", f"Character {chr(c)} is not covered")
            if c == 0x2F:  # '/' name
                m2 = _REGULAR_RE.match(b, i)
                end = m2.end() if m2 else i
                self.pos = end
                return (NAME, b[i:end].decode("latin-1"))
            if c == 0x28 or c == 0x29:  # '(' or stray ')' literal string
                # Both parens map to CharacterSet::Delimiter(String) in the
                # reference (tokenizer.rs:66-69), so a stray ')' enters the
                # SAME literal-string loop (tokenizer.rs:287-331) with
                # opened=1/closed=0 — including escape handling and the
                # octal quirk — behaving like an unterminated string scan.
                buf = bytearray()
                opened, closed = 1, 0
                while i < n:
                    # bulk-copy ordinary bytes up to the next ( ) or backslash
                    m2 = _LITSPECIAL_RE.search(b, i)
                    if m2 is None:
                        buf += b[i:n]
                        i = n
                        break
                    if m2.start() > i:
                        buf += b[i : m2.start()]
                        i = m2.start()
                    cur = b[i]
                    i += 1
                    if cur == 0x28:
                        opened += 1
                    elif cur == 0x29:
                        closed += 1
                        if opened == closed:
                            break
                    if opened == closed:
                        break
                    if cur == 0x5C:  # backslash escape
                        if i >= n:
                            continue
                        e = b[i]
                        i += 1
                        if e == 0x6E:  # n
                            buf.append(10)
                        elif e == 0x72:  # r
                            buf.append(13)
                        elif e == 0x74:  # t
                            buf.append(9)
                        elif e == 0x62:  # b
                            buf.append(8)
                        elif e == 0x66:  # f
                            buf.append(12)
                        elif e in (0x5C, 0x28, 0x29):
                            buf.append(e)
                        elif 0x30 <= e <= 0x39:
                            # reference octal quirk: ((c*8)+d*8)+e (tokenizer.rs:313-321)
                            if i + 1 >= n:
                                raise ParseError("Tokenize", "truncated octal escape")
                            d2, e2 = b[i], b[i + 1]
                            i += 2
                            if d2 not in _DIGITS or e2 not in _DIGITS:
                                raise ParseError("Tokenize", "bad octal digit")
                            buf.append(
                                ((e - 0x30) * 8 + (d2 - 0x30) * 8 + (e2 - 0x30)) & 0xFF
                            )
                        else:
                            buf.append(e)
                    else:
                        buf.append(cur)
                self.pos = i
                return (LIT, bytes(buf))
            # regular token: first byte is arbitrary; the token remains
            # numeric iff every SUBSEQUENT byte is a digit or '.'
            start = i - 1
            m2 = _REGULAR_RE.match(b, i)
            i = m2.end() if m2 else i
            raw = b[start:i]
            is_numeric = _NONNUM_RE.search(raw, 1) is None
            self.pos = i
            if is_numeric:
                num = parse_numeric(raw.decode("latin-1"))
                if num is not None:
                    return (NUM, num)
            if raw == b"stream":
                return (STREAM_BEGIN, None)
            if raw == b"endstream":
                return (STREAM_END, None)
            if raw == b"endobj":
                return (OBJ_END, None)
            return (STR, bytes(raw))
        self.pos = i
        return None

    def __iter__(self):
        return self

    def __next__(self):
        t = self.next()
        if t is None:
            raise StopIteration
        return t


class Lemmatizer:
    """Tokenizer wrapper folding indirect refs / obj headers — tokenizer.rs:92-157."""

    __slots__ = ("tokenizer", "xref", "crypt")

    def __init__(self, data: bytes, pos: int, xref):
        self.tokenizer = Tokenizer(data, pos)
        self.xref = xref
        # (StdDecryptor, (num, gen)) while parsing inside an encrypted
        # document's indirect object — set by parse_object on OBJ_BEGIN
        self.crypt = None

    @property
    def bytes(self):
        return self.tokenizer.bytes

    def next_n(self, length: int) -> bytes:
        return self.tokenizer.next_n(length)

    def next_n_spec(self, length: int) -> bytes:
        return self.tokenizer.next_n_spec(length)

    def next(self):
        while True:
            t = self.tokenizer.next()
            if t is None:
                return None
            kind = t[0]
            if kind == COMMENT:
                continue  # skip to next token (tokenizer.rs:151)
            if kind == NUM and t[1].is_int:
                look = self.tokenizer.clone()
                t2 = look.next()
                if t2 is not None and t2[0] == NUM and t2[1].is_int:
                    t3 = look.next()
                    if t3 is not None and t3[0] == STR:
                        if t3[1] == b"R":
                            self.tokenizer.pos = look.pos
                            return (REF, (t[1].val, t2[1].val))
                        if t3[1] == b"obj":
                            self.tokenizer.pos = look.pos
                            # engine extension: carry (num, gen) so the
                            # object parser can derive per-object
                            # decryption keys (the reference's ObjBegin
                            # discards them, tokenizer.rs:131-140)
                            return (OBJ_BEGIN, (t[1].val, t2[1].val))
                        # reference quirk: `int int <keyword>` falls through
                        # to the trailing None (tokenizer.rs:155)
                        return None
                    return t
                return t
            return t

"""Standard security handler — spec-mode decryption of encrypted PDFs.

The reference only type-checks the trailer /Encrypt entry
(/root/reference/src/xref.rs:136-139) and then fails later with
whatever error the ciphertext produces; the engine's parity mode turns
that into a distinct `error:Encrypted` row (extract.py). This module is
the spec-mode upgrade: ISO 32000-1 §7.6 standard security handler with
an EMPTY user password — revision 2 (RC4-40), revision 3 (RC4-128) and
revision 4 crypt filters (/V2 = RC4, /AESV2 = AES-128-CBC), including
the EncryptMetadata=false key-derivation variant. Password-protected
documents (empty user password fails the /U check) still surface as
`error:Encrypted` rows — ciphertext must never leak into extracted
text.

Everything here is public knowledge: the padding constant, algorithms
2/3/4/5 and the per-object key schedule are printed in ISO 32000-1
§7.6.3; AES is FIPS-197 (S-box constants + key schedule), verified by
the Appendix C.1 test vector in tests/test_crypt.py; RC4 is the
well-known KSA/PRGA stream cipher.

AES is implemented numpy-vectorized ACROSS blocks (the per-round work
is table lookups + XORs on a [n_blocks, 16] uint8 array), so decrypting
a megabyte stream is ~40 numpy ops instead of 65k Python block loops —
the same "vectorize the hot loop" treatment the TJ advance math got.
RC4 is inherently byte-sequential; its KSA/PRGA runs as a Python loop
over a bytearray (acceptable: fixture streams are KBs; for 100-TB
corpora the AES path is the one modern documents use).
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np

from .errors import ParseError

# ISO 32000-1 §7.6.3.3 Algorithm 2 padding string
PAD = bytes(
    [
        0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41,
        0x64, 0x00, 0x4E, 0x56, 0xFF, 0xFA, 0x01, 0x08,
        0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
        0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A,
    ]
)


def _pad_password(pw: bytes) -> bytes:
    return (pw + PAD)[:32]


# ---------------------------------------------------------------------------
# RC4
# ---------------------------------------------------------------------------


def rc4(key: bytes, data: bytes) -> bytes:
    """RC4 stream cipher (encrypt == decrypt)."""
    s = list(range(256))
    j = 0
    klen = len(key)
    for i in range(256):
        j = (j + s[i] + key[i % klen]) & 0xFF
        s[i], s[j] = s[j], s[i]
    out = bytearray(len(data))
    i = j = 0
    for n, c in enumerate(data):
        i = (i + 1) & 0xFF
        j = (j + s[i]) & 0xFF
        s[i], s[j] = s[j], s[i]
        out[n] = c ^ s[(s[i] + s[j]) & 0xFF]
    return bytes(out)


# ---------------------------------------------------------------------------
# AES-128 (FIPS-197), vectorized across blocks with numpy
# ---------------------------------------------------------------------------

_SBOX = bytes.fromhex(
    "637c777bf26b6fc53001672bfed7ab76ca82c97dfa5947f0add4a2af9ca472c0"
    "b7fd9326363ff7cc34a5e5f171d8311504c723c31896059a071280e2eb27b275"
    "09832c1a1b6e5aa0523bd6b329e32f8453d100ed20fcb15b6acbbe394a4c58cf"
    "d0efaafb434d338545f9027f503c9fa851a3408f929d38f5bcb6da2110fff3d2"
    "cd0c13ec5f974417c4a77e3d645d197360814fdc222a908846eeb814de5e0bdb"
    "e0323a0a4906245cc2d3ac629195e479e7c8376d8dd54ea96c56f4ea657aae08"
    "ba78252e1ca6b4c6e8dd741f4bbd8b8a703eb5664803f60e613557b986c11d9e"
    "e1f8981169d98e949b1e87e9ce5528df8ca1890dbfe6426841992d0fb054bb16"
)
_SBOX_NP = np.frombuffer(_SBOX, dtype=np.uint8)
_INV_SBOX_NP = np.zeros(256, dtype=np.uint8)
_INV_SBOX_NP[_SBOX_NP] = np.arange(256, dtype=np.uint8)

_RCON = (0x01, 0x02, 0x04, 0x08, 0x10, 0x20, 0x40, 0x80, 0x1B, 0x36)


def _xtime_table() -> np.ndarray:
    t = np.arange(256, dtype=np.uint16)
    t = (t << 1) ^ np.where(t & 0x80, 0x1B, 0)
    return (t & 0xFF).astype(np.uint8)


_X2 = _xtime_table()
_X4 = _X2[_X2]
_X8 = _X2[_X4]
_IDX = np.arange(256, dtype=np.uint8)
# GF(2^8) multiplication tables for MixColumns / InvMixColumns
_T2 = _X2
_T3 = _X2 ^ _IDX
_T9 = _X8 ^ _IDX
_T11 = _X8 ^ _X2 ^ _IDX
_T13 = _X8 ^ _X4 ^ _IDX
_T14 = _X8 ^ _X4 ^ _X2

# flat-index permutations over the 16 state bytes; AES state is
# column-major (state[r][c] = block[4c + r]), so block index i = 4c + r
_SHIFT_ROWS = np.array(
    [(4 * ((i // 4 + i % 4) % 4) + i % 4) for i in range(16)], dtype=np.intp
)
_INV_SHIFT_ROWS = np.empty(16, dtype=np.intp)
_INV_SHIFT_ROWS[_SHIFT_ROWS] = np.arange(16, dtype=np.intp)


def aes_key_expand(key: bytes) -> np.ndarray:
    """128-bit key schedule -> [11, 16] uint8 round keys."""
    if len(key) != 16:
        raise ParseError("Encrypted", f"AES key must be 16 bytes, got {len(key)}")
    words = [list(key[i : i + 4]) for i in range(0, 16, 4)]
    for i in range(4, 44):
        tmp = list(words[i - 1])
        if i % 4 == 0:
            tmp = tmp[1:] + tmp[:1]
            tmp = [_SBOX[b] for b in tmp]
            tmp[0] ^= _RCON[i // 4 - 1]
        words.append([a ^ b for a, b in zip(words[i - 4], tmp)])
    flat = [b for w in words for b in w]
    return np.array(flat, dtype=np.uint8).reshape(11, 16)


def _mix_columns(st: np.ndarray) -> np.ndarray:
    s = st.reshape(-1, 4, 4)  # [n, column, row]
    a0, a1, a2, a3 = s[:, :, 0], s[:, :, 1], s[:, :, 2], s[:, :, 3]
    out = np.empty_like(s)
    out[:, :, 0] = _T2[a0] ^ _T3[a1] ^ a2 ^ a3
    out[:, :, 1] = a0 ^ _T2[a1] ^ _T3[a2] ^ a3
    out[:, :, 2] = a0 ^ a1 ^ _T2[a2] ^ _T3[a3]
    out[:, :, 3] = _T3[a0] ^ a1 ^ a2 ^ _T2[a3]
    return out.reshape(-1, 16)


def _inv_mix_columns(st: np.ndarray) -> np.ndarray:
    s = st.reshape(-1, 4, 4)
    a0, a1, a2, a3 = s[:, :, 0], s[:, :, 1], s[:, :, 2], s[:, :, 3]
    out = np.empty_like(s)
    out[:, :, 0] = _T14[a0] ^ _T11[a1] ^ _T13[a2] ^ _T9[a3]
    out[:, :, 1] = _T9[a0] ^ _T14[a1] ^ _T11[a2] ^ _T13[a3]
    out[:, :, 2] = _T13[a0] ^ _T9[a1] ^ _T14[a2] ^ _T11[a3]
    out[:, :, 3] = _T11[a0] ^ _T13[a1] ^ _T9[a2] ^ _T14[a3]
    return out.reshape(-1, 16)


def aes_ecb_encrypt_blocks(rk: np.ndarray, blocks: np.ndarray) -> np.ndarray:
    """Encrypt [n, 16] uint8 blocks under expanded round keys."""
    st = blocks ^ rk[0]
    for r in range(1, 10):
        st = _SBOX_NP[st][:, _SHIFT_ROWS]
        st = _mix_columns(st) ^ rk[r]
    st = _SBOX_NP[st][:, _SHIFT_ROWS]
    return st ^ rk[10]


def aes_ecb_decrypt_blocks(rk: np.ndarray, blocks: np.ndarray) -> np.ndarray:
    """Decrypt [n, 16] uint8 blocks under expanded round keys."""
    st = blocks ^ rk[10]
    for r in range(9, 0, -1):
        st = _INV_SBOX_NP[st[:, _INV_SHIFT_ROWS]] ^ rk[r]
        st = _inv_mix_columns(st)
    return _INV_SBOX_NP[st[:, _INV_SHIFT_ROWS]] ^ rk[0]


def aes_cbc_encrypt(key: bytes, iv: bytes, data: bytes) -> bytes:
    """AES-128-CBC with PKCS#7-style padding (always appended, per the
    PDF spec's RFC 2898 padding rule). CBC chaining is sequential, so
    this writer-side helper loops per block (fixtures only)."""
    rk = aes_key_expand(key)
    padlen = 16 - len(data) % 16
    data = data + bytes([padlen]) * padlen
    out = bytearray()
    prev = np.frombuffer(iv, dtype=np.uint8)
    for i in range(0, len(data), 16):
        block = np.frombuffer(data[i : i + 16], dtype=np.uint8) ^ prev
        prev = aes_ecb_encrypt_blocks(rk, block.reshape(1, 16))[0]
        out += prev.tobytes()
    return bytes(out)


def aes_cbc_decrypt(key: bytes, data: bytes) -> bytes:
    """AES-128-CBC decrypt of IV||ciphertext; strips the trailing
    padding. Decryption chaining is parallel (each plaintext block =
    D(c_i) ^ c_{i-1}), so the whole payload decrypts in one vectorized
    pass."""
    if len(data) < 32 or len(data) % 16 != 0:
        raise ParseError("Encrypted", f"AES payload length {len(data)} invalid")
    rk = aes_key_expand(key)
    buf = np.frombuffer(data, dtype=np.uint8).reshape(-1, 16)
    plain = aes_ecb_decrypt_blocks(rk, buf[1:]) ^ buf[:-1]
    raw = plain.tobytes()
    padlen = raw[-1]
    if not 1 <= padlen <= 16:
        raise ParseError("Encrypted", "AES padding byte out of range")
    return raw[:-padlen]


# ---------------------------------------------------------------------------
# Standard security handler algorithms (ISO 32000-1 §7.6.3)
# ---------------------------------------------------------------------------


def file_key(user_pw: bytes, o_entry: bytes, p: int, id0: bytes, r: int,
             n: int, encrypt_metadata: bool = True) -> bytes:
    """Algorithm 2: the file encryption key (n = key length in bytes)."""
    h = hashlib.md5()
    h.update(_pad_password(user_pw))
    h.update(o_entry[:32])
    h.update(struct.pack("<i", p if p < 2**31 else p - 2**32))
    h.update(id0)
    if r >= 4 and not encrypt_metadata:
        h.update(b"\xff\xff\xff\xff")
    key = h.digest()
    if r >= 3:
        for _ in range(50):
            key = hashlib.md5(key[:n]).digest()
    return key[:n]


def compute_o(owner_pw: bytes, user_pw: bytes, r: int, n: int) -> bytes:
    """Algorithm 3: the /O (owner password) entry — writer side."""
    key = hashlib.md5(_pad_password(owner_pw or user_pw)).digest()
    if r >= 3:
        for _ in range(50):
            key = hashlib.md5(key).digest()
    key = key[:n]
    o = rc4(key, _pad_password(user_pw))
    if r >= 3:
        for i in range(1, 20):
            o = rc4(bytes(b ^ i for b in key), o)
    return o


def compute_u(fkey: bytes, id0: bytes, r: int) -> bytes:
    """Algorithm 4 (r=2) / Algorithm 5 (r>=3): the /U entry."""
    if r == 2:
        return rc4(fkey, PAD)
    h = hashlib.md5(PAD + id0).digest()
    u = rc4(fkey, h)
    for i in range(1, 20):
        u = rc4(bytes(b ^ i for b in fkey), u)
    return u + b"\x00" * 16  # 16 bytes of arbitrary padding


def object_key(fkey: bytes, num: int, gen: int, aes: bool) -> bytes:
    """Algorithm 1 per-object key."""
    h = hashlib.md5()
    h.update(fkey)
    h.update((num & 0xFFFFFF).to_bytes(3, "little"))
    h.update((gen & 0xFFFF).to_bytes(2, "little"))
    if aes:
        h.update(b"sAlT")
    return h.digest()[: min(len(fkey) + 5, 16)]


class StdDecryptor:
    """Resolved standard-security-handler state for one document.

    Holds the verified file key and the per-filter cipher choice;
    `decrypt(data, num, gen, kind)` is the single entry point used by
    the object parser. Per-object AES round keys are tiny (176 bytes)
    and derived per call — the MD5 + key schedule cost is trivial next
    to the stream decode itself.
    """

    __slots__ = ("fkey", "stm_cipher", "str_cipher")

    def __init__(self, fkey: bytes, stm_cipher: str, str_cipher: str):
        self.fkey = fkey
        self.stm_cipher = stm_cipher  # "rc4" | "aesv2" | "identity"
        self.str_cipher = str_cipher

    def decrypt(self, data: bytes, num: int, gen: int, kind: str) -> bytes:
        cipher = self.stm_cipher if kind == "stm" else self.str_cipher
        if cipher == "identity" or not data:
            return data
        if cipher == "aesv2":
            return aes_cbc_decrypt(object_key(self.fkey, num, gen, True), data)
        return rc4(object_key(self.fkey, num, gen, False), data)


def _enc_bytes(v, what: str) -> bytes:
    """O/U/ID entries must round-trip raw bytes; the engine's parser
    (matching the reference's UTF-8-strict literal strings,
    object.rs:67-69) preserves raw bytes only for hex strings."""
    if isinstance(v, bytes):  # HexString subclasses bytes
        return bytes(v)
    raise ParseError(
        "Encrypted", f"{what} must be a hex string (raw-byte literal strings unsupported)"
    )


def build_decryptor(enc: dict, id0: bytes) -> StdDecryptor:
    """Construct + verify a decryptor from the /Encrypt dict and the
    first /ID element. Raises ParseError("Encrypted", ...) for any
    unsupported filter/version or when the empty user password fails
    the /U check (i.e. the document is password-protected)."""
    from .numbers import Number

    filt = enc.get("Filter")
    if str(filt) != "Standard":
        raise ParseError("Encrypted", f"unsupported security handler {filt!r}")
    v = enc.get("V")
    r = enc.get("R")
    v = v.val if isinstance(v, Number) else 0
    r = r.val if isinstance(r, Number) else 0
    if v not in (1, 2, 4) or r not in (2, 3, 4):
        raise ParseError("Encrypted", f"unsupported encryption V={v} R={r}")
    length = enc.get("Length")
    nbits = length.val if isinstance(length, Number) else 40
    if nbits % 8 or not 40 <= nbits <= 128:
        raise ParseError("Encrypted", f"invalid key length {nbits}")
    n = 5 if r == 2 else nbits // 8
    o_entry = _enc_bytes(enc.get("O"), "/O")
    u_entry = _enc_bytes(enc.get("U"), "/U")
    p = enc.get("P")
    if not isinstance(p, Number):
        raise ParseError("Encrypted", "/P missing")
    em = enc.get("EncryptMetadata")
    encrypt_metadata = not (str(em) == "false")

    stm_cipher = str_cipher = "rc4"
    if v == 4:
        cf = enc.get("CF") or {}

        def cipher_of(name) -> str:
            name = str(name or "Identity")
            if name == "Identity":
                return "identity"
            f = cf.get(name)
            if not isinstance(f, dict):
                raise ParseError("Encrypted", f"crypt filter {name!r} not in /CF")
            cfm = str(f.get("CFM"))
            if cfm == "V2":
                return "rc4"
            if cfm == "AESV2":
                return "aesv2"
            raise ParseError("Encrypted", f"unsupported CFM {cfm!r}")

        stm_cipher = cipher_of(enc.get("StmF"))
        str_cipher = cipher_of(enc.get("StrF"))

    fkey = file_key(b"", o_entry, p.val, id0, r, n, encrypt_metadata)
    expect_u = compute_u(fkey, id0, r)
    cmp_len = 32 if r == 2 else 16
    if u_entry[:cmp_len] != expect_u[:cmp_len]:
        raise ParseError(
            "Encrypted", "document is password-protected (empty user password rejected)"
        )
    return StdDecryptor(fkey, stm_cipher, str_cipher)

"""Standard-security-handler decryption (pdfref/crypt.py).

Cipher primitives are pinned against PUBLISHED vectors (FIPS-197
Appendix C.1 for AES-128; the well-known RC4 test strings), so the
fixture round-trips cannot be self-confirming: a bug shared by
encryptor and decryptor would still fail the published-vector tests.
"""

import numpy as np
import pytest

from pdfrust_ray.fixtures.pdfgen import ENC_CONSTRUCTS, pdf_encrypted
from pdfrust_ray.pdfref import crypt as C
from pdfrust_ray.pdfref.errors import ParseError
from pdfrust_ray.pdfref.extract import extract, extract_info


# --- published cipher vectors ------------------------------------------


def test_aes128_fips197_c1_vector():
    key = bytes.fromhex("000102030405060708090a0b0c0d0e0f")
    pt = bytes.fromhex("00112233445566778899aabbccddeeff")
    ct = bytes.fromhex("69c4e0d86a7b0430d8cdb78070b4c55a")
    rk = C.aes_key_expand(key)
    blocks = np.frombuffer(pt, dtype=np.uint8).reshape(1, 16)
    assert C.aes_ecb_encrypt_blocks(rk, blocks).tobytes() == ct
    cblocks = np.frombuffer(ct, dtype=np.uint8).reshape(1, 16)
    assert C.aes_ecb_decrypt_blocks(rk, cblocks).tobytes() == pt


def test_aes_vectorized_many_blocks_match_single():
    key = b"0123456789abcdef"
    rk = C.aes_key_expand(key)
    rng = np.random.default_rng(7)
    blocks = rng.integers(0, 256, size=(64, 16), dtype=np.uint8)
    enc = C.aes_ecb_encrypt_blocks(rk, blocks)
    one_by_one = np.vstack(
        [C.aes_ecb_encrypt_blocks(rk, blocks[i : i + 1]) for i in range(64)]
    )
    assert np.array_equal(enc, one_by_one)
    assert np.array_equal(C.aes_ecb_decrypt_blocks(rk, enc), blocks)


@pytest.mark.parametrize("n", [0, 1, 15, 16, 17, 1000])
def test_aes_cbc_roundtrip_padding(n):
    key, iv = b"k" * 16, bytes(range(16))
    data = bytes((i * 37) & 0xFF for i in range(n))
    ct = C.aes_cbc_encrypt(key, iv, data)
    assert len(ct) % 16 == 0 and len(ct) >= len(data) + 1
    assert C.aes_cbc_decrypt(key, iv + ct) == data


def test_rc4_published_vectors():
    assert C.rc4(b"Key", b"Plaintext").hex().upper() == "BBF316E8D940AF0AD3"
    assert C.rc4(b"Wiki", b"pedia").hex().upper() == "1021BF0420"
    assert (
        C.rc4(b"Secret", b"Attack at dawn").hex().upper()
        == "45A01F645FC35B383552544B9BF5"
    )
    # involution: encrypt == decrypt
    assert C.rc4(b"Key", C.rc4(b"Key", b"roundtrip")) == b"roundtrip"


# --- handler algorithms -------------------------------------------------


def test_empty_password_u_check_accepts_and_rejects():
    id0 = b"\x01" * 16
    for r, n in ((2, 5), (3, 16)):
        o = C.compute_o(b"owner", b"", r, n)
        fkey = C.file_key(b"", o, -44, id0, r, n)
        u = C.compute_u(fkey, id0, r)
        cmp_len = 32 if r == 2 else 16
        # empty-password-derived U matches itself
        again = C.compute_u(C.file_key(b"", o, -44, id0, r, n), id0, r)
        assert u[:cmp_len] == again[:cmp_len]
        # a real user password derives a different U
        o2 = C.compute_o(b"owner", b"hunter2", r, n)
        fkey2 = C.file_key(b"hunter2", o2, -44, id0, r, n)
        u2 = C.compute_u(fkey2, id0, r)
        empty_guess = C.compute_u(C.file_key(b"", o2, -44, id0, r, n), id0, r)
        assert u2[:cmp_len] != empty_guess[:cmp_len]


def test_object_key_truncation_and_salt():
    fkey5 = b"\xaa" * 5
    assert len(C.object_key(fkey5, 1, 0, False)) == 10  # min(5+5, 16)
    fkey16 = b"\xbb" * 16
    assert len(C.object_key(fkey16, 1, 0, False)) == 16
    assert C.object_key(fkey16, 1, 0, True) != C.object_key(fkey16, 1, 0, False)
    assert C.object_key(fkey16, 1, 0, False) != C.object_key(fkey16, 2, 0, False)


# --- end-to-end document decryption ------------------------------------


@pytest.mark.parametrize(
    "cid",
    ["enc-rc4-40", "enc-rc4-128", "enc-aesv2", "enc-cf-v2", "enc-nometa", "enc-uncompressed"],
)
def test_encrypted_constructs_decrypt_in_spec_mode(cid):
    uid = f"t/{cid}"
    data = ENC_CONSTRUCTS[cid](uid)
    r = extract(data, "text", spec_mode=True)
    assert r.text == f"encrypted line {uid}\nsecret {uid}"
    # parity mode: distinct early Encrypted status, never ciphertext
    with pytest.raises(ParseError) as ei:
        extract(data, "text")
    assert ei.value.kind == "Encrypted"


def test_password_protected_rejected_in_both_modes():
    data = ENC_CONSTRUCTS["enc-badpass"]("t/bp")
    for spec in (False, True):
        with pytest.raises(ParseError) as ei:
            extract(data, "text", spec_mode=spec)
        assert ei.value.kind == "Encrypted"


def test_encrypted_info_title_string_decrypts():
    uid = "t/info"
    data = pdf_encrypted(uid, r=3, v=2, nbits=128)
    info = extract_info(data, spec_mode=True)
    assert info["title"] == f"Classified {uid}"


def test_encrypted_aes_info_title_string_decrypts():
    uid = "t/ainfo"
    data = pdf_encrypted(uid, r=4, v=4, nbits=128, cfm="AESV2")
    info = extract_info(data, spec_mode=True)
    assert info["title"] == f"Classified {uid}"


def test_ciphertext_with_leading_whitespace_byte_survives():
    """next_n_spec must not eat whitespace-class first bytes of an
    encrypted stream payload (the parity next_n quirk would)."""
    found = 0
    for i in range(40):
        uid = f"probe/{i}"
        data = pdf_encrypted(uid, r=3, v=2, nbits=128)
        # locate each stream payload's first byte
        pos, ws = 0, (0x00, 0x09, 0x0A, 0x0C, 0x0D, 0x20)
        while True:
            pos = data.find(b"stream\n", pos)
            if pos < 0:
                break
            if data[pos + 7] in ws:
                found += 1
            pos += 7
        assert extract(data, "text", spec_mode=True).text == (
            f"encrypted line {uid}\nsecret {uid}"
        )
    assert found > 0, "probe never produced a whitespace-leading ciphertext"


def test_unsupported_handler_is_error_not_garbage():
    data = pdf_encrypted("t/v5", r=3, v=2, nbits=128)
    # rewrite V 2 -> V 9 in the Encrypt dict (same byte length)
    data = data.replace(b"/V 2 /R 3", b"/V 9 /R 3")
    with pytest.raises(ParseError) as ei:
        extract(data, "text", spec_mode=True)
    assert ei.value.kind == "Encrypted"

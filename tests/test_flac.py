"""FLAC codec: hand-built bit-level decode vectors (independent of the
encoder), CRC pin vectors, and lossless round-trips."""

import numpy as np
import pytest

from pdfrust_ray.functions import flac


class Bits:
    """Test-local MSB-first accumulator — independent of the module's
    writer so hand vectors don't reuse the code under test."""

    def __init__(self):
        self.s = ""

    def put(self, value: int, n: int):
        self.s += format(value & ((1 << n) - 1), f"0{n}b")
        return self

    def bytes(self) -> bytes:
        s = self.s + "0" * (-len(self.s) % 8)
        return bytes(int(s[i : i + 8], 2) for i in range(0, len(s), 8))


def _streaminfo(blocksize, rate, bps, total) -> bytes:
    b = Bits()
    b.put(blocksize, 16).put(blocksize, 16).put(0, 24).put(0, 24)
    b.put(rate, 20).put(0, 3).put(bps - 1, 5).put(total, 36)
    return b"\x80" + (34).to_bytes(3, "big") + b.bytes() + b"\x00" * 16


def test_crc_pin_vectors():
    # CRC-8 poly 0x07 ("CRC-8/SMBUS") and CRC-16 poly 0x8005 init 0
    # non-reflected ("CRC-16/UMTS"): published check values for
    # b"123456789".
    assert flac.crc8(b"123456789") == 0xF4
    assert flac.crc16(b"123456789") == 0xFEE8


def test_decode_constant_subframe_hand_vector():
    hdr = Bits()
    hdr.put(0x3FFE, 14).put(0, 1).put(0, 1)  # sync, reserved, fixed-bs
    hdr.put(6, 4).put(0, 4)  # bs: 8-bit follows; rate: streaminfo
    hdr.put(0, 4).put(0b100, 3).put(0, 1)  # mono, 16 bps
    hdr.put(0, 8)  # frame number 0
    hdr.put(3, 8)  # blocksize - 1
    hbytes = hdr.bytes()
    hbytes += bytes([flac.crc8(hbytes)])
    sub = Bits()
    sub.put(0, 1).put(0, 6).put(0, 1)  # CONSTANT, no wasted bits
    sub.put(-5, 16)
    frame = hbytes + sub.bytes()
    frame += flac.crc16(frame).to_bytes(2, "big")
    data = b"fLaC" + _streaminfo(4, 8000, 16, 4) + frame
    samples, rate = flac.decode_flac(data)
    assert rate == 8000
    assert samples.tolist() == [-5, -5, -5, -5]


def test_decode_fixed_order1_rice_hand_vector():
    """warmup 10, residuals [2,-1,0] @ Rice param 2 -> 10,12,11,11."""
    hdr = Bits()
    hdr.put(0x3FFE, 14).put(0, 1).put(0, 1)
    hdr.put(6, 4).put(0, 4).put(0, 4).put(0b100, 3).put(0, 1)
    hdr.put(0, 8).put(3, 8)
    hbytes = hdr.bytes()
    hbytes += bytes([flac.crc8(hbytes)])
    sub = Bits()
    sub.put(0, 1).put(9, 6).put(0, 1)  # FIXED order 1
    sub.put(10, 16)  # warmup
    sub.put(0, 2).put(0, 4).put(2, 4)  # method 0, po 0, param 2
    # zigzag(2)=4: q=1 -> '01', r=0 -> '00'
    sub.put(0b01, 2).put(0, 2)
    # zigzag(-1)=1: q=0 -> '1', r=1 -> '01'
    sub.put(1, 1).put(1, 2)
    # zigzag(0)=0: q=0 -> '1', r=0 -> '00'
    sub.put(1, 1).put(0, 2)
    frame = hbytes + sub.bytes()
    frame += flac.crc16(frame).to_bytes(2, "big")
    data = b"fLaC" + _streaminfo(4, 8000, 16, 4) + frame
    samples, _ = flac.decode_flac(data)
    assert samples.tolist() == [10, 12, 11, 11]


def test_decode_lpc_hand_vector():
    """LPC order 1, coef 3, shift 1, warm 4, resid [1,-2] ->
    s1 = 1 + (3*4 >> 1) = 7; s2 = -2 + (3*7 >> 1) = 8."""
    hdr = Bits()
    hdr.put(0x3FFE, 14).put(0, 1).put(0, 1)
    hdr.put(6, 4).put(0, 4).put(0, 4).put(0b100, 3).put(0, 1)
    hdr.put(0, 8).put(2, 8)  # blocksize 3
    hbytes = hdr.bytes()
    hbytes += bytes([flac.crc8(hbytes)])
    sub = Bits()
    sub.put(0, 1).put(32, 6).put(0, 1)  # LPC order 1
    sub.put(4, 16)  # warmup
    sub.put(3, 4)  # precision - 1 = 3
    sub.put(1, 5)  # shift
    sub.put(3, 4)  # coefficient
    sub.put(0, 2).put(0, 4).put(1, 4)  # method 0, po 0, param 1
    sub.put(0b01, 2).put(0, 1)  # zigzag(1)=2: q=1, r=0
    sub.put(0b01, 2).put(1, 1)  # zigzag(-2)=3: q=1, r=1
    frame = hbytes + sub.bytes()
    frame += flac.crc16(frame).to_bytes(2, "big")
    data = b"fLaC" + _streaminfo(3, 8000, 16, 3) + frame
    samples, _ = flac.decode_flac(data)
    assert samples.tolist() == [4, 7, 8]


def test_corrupt_crc_raises():
    enc = flac.encode_flac(np.arange(100, dtype=np.int16), rate=8000, blocksize=64)
    bad = bytearray(enc)
    bad[-1] ^= 0xFF  # trash the final frame CRC-16
    with pytest.raises(flac.FlacError):
        flac.decode_flac(bytes(bad))


@pytest.mark.parametrize("n,blocksize", [(1, 16), (64, 64), (1000, 256), (5000, 4096)])
def test_roundtrip_lossless(n, blocksize):
    rng = np.random.RandomState(n)
    t = np.arange(n)
    sig = (
        8000 * np.sin(2 * np.pi * 440 * t / 16000)
        + rng.randint(-500, 500, size=n)
    ).astype(np.int16)
    enc = flac.encode_flac(sig, rate=16000, blocksize=blocksize)
    dec, rate = flac.decode_flac(enc)
    assert rate == 16000
    assert dec.dtype == np.int64 and (dec == sig).all()


def test_roundtrip_extremes_and_constant():
    sig = np.asarray([32767, -32768, 0, -1, 1] * 50, dtype=np.int16)
    dec, _ = flac.decode_flac(flac.encode_flac(sig, blocksize=128))
    assert (dec == sig).all()
    const = np.full(300, -123, dtype=np.int16)
    enc = flac.encode_flac(const, blocksize=256)
    dec, _ = flac.decode_flac(enc)
    assert (dec == const).all()


def test_compression_actually_happens():
    """A smooth signal must compress well below 16 bits/sample —
    evidence the Rice/fixed-predictor path is really being taken."""
    t = np.arange(8000)
    sig = (5000 * np.sin(2 * np.pi * 220 * t / 16000)).astype(np.int16)
    enc = flac.encode_flac(sig)
    assert len(enc) < 2 * len(sig) * 0.6


def test_roundtrip_empty_and_single():
    for n in (0, 1, 2):
        sig = np.arange(n, dtype=np.int16) * 1000
        dec, _ = flac.decode_flac(flac.encode_flac(sig, blocksize=64))
        assert dec.tolist() == sig.tolist()


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=30, deadline=None)
    @given(
        st.lists(st.integers(min_value=-32768, max_value=32767), min_size=0, max_size=600),
        st.sampled_from([16, 64, 192, 256]),
    )
    def test_roundtrip_hypothesis(samples, blocksize):
        sig = np.asarray(samples, dtype=np.int16)
        dec, _ = flac.decode_flac(flac.encode_flac(sig, blocksize=blocksize))
        assert dec.tolist() == sig.tolist()
except ImportError:  # pragma: no cover
    pass

"""PNG codec tests: encode->decode inverse pairs for every filter type,
hand-built byte-level reference vectors (constructed independently of
the encoder, with filter arithmetic precomputed by hand), unsupported-
feature rejection, and the decode path through PixelDecoder."""

import struct
import zlib

import numpy as np
import pyarrow as pa
import pytest

from pdfrust_ray.functions.png import decode_png, encode_png, to_rgb


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


SIG = b"\x89PNG\r\n\x1a\n"


def _png(ihdr: bytes, *chunks: bytes) -> bytes:
    return SIG + _chunk(b"IHDR", ihdr) + b"".join(chunks) + _chunk(b"IEND", b"")


@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
@pytest.mark.parametrize("channels", [1, 3, 4])
def test_roundtrip_all_filters(filter_type, channels):
    rng = np.random.RandomState(7 * channels + filter_type)
    shape = (13, 9) if channels == 1 else (13, 9, channels)
    arr = rng.randint(0, 256, size=shape).astype(np.uint8)
    out = decode_png(encode_png(arr, filter_type=filter_type))
    np.testing.assert_array_equal(out, arr)


def test_handbuilt_sub_and_up_filters():
    # 2x2 RGB; row 0 Sub-filtered, row 1 Up-filtered; the filtered byte
    # values below are computed by hand from the spec:
    #   row0 pixels (255,0,0),(0,255,0): sub -> 255,0,0, 1,255,0
    #   row1 pixels (0,0,255),(255,255,255): up vs row0 -> 1,0,255, 255,0,255
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0)
    raw = bytes([1, 255, 0, 0, 1, 255, 0, 2, 1, 0, 255, 255, 0, 255])
    data = _png(ihdr, _chunk(b"IDAT", zlib.compress(raw)))
    out = decode_png(data)
    np.testing.assert_array_equal(
        out,
        np.array(
            [[[255, 0, 0], [0, 255, 0]], [[0, 0, 255], [255, 255, 255]]],
            dtype=np.uint8,
        ),
    )


def test_handbuilt_palette():
    # 2x2, depth 8, color type 3, identity filter; palette expands to RGB
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0)
    plte = bytes([10, 20, 30, 200, 100, 0, 0, 0, 0])
    raw = bytes([0, 0, 1, 0, 2, 2])
    data = _png(ihdr, _chunk(b"PLTE", plte), _chunk(b"IDAT", zlib.compress(raw)))
    out = decode_png(data)
    np.testing.assert_array_equal(
        out,
        np.array([[[10, 20, 30], [200, 100, 0]], [[0, 0, 0], [0, 0, 0]]], np.uint8),
    )


def test_handbuilt_16bit_gray():
    ihdr = struct.pack(">IIBBBBB", 2, 1, 16, 0, 0, 0, 0)
    raw = bytes([0]) + struct.pack(">HH", 0x1234, 0xFFFE)
    data = _png(ihdr, _chunk(b"IDAT", zlib.compress(raw)))
    out = decode_png(data)
    assert out.dtype == np.uint16
    np.testing.assert_array_equal(out, np.array([[0x1234, 0xFFFE]], np.uint16))


def test_handbuilt_4bit_gray():
    # 3 pixels of depth 4: values 15, 3, 9 -> packed bytes F3 90
    ihdr = struct.pack(">IIBBBBB", 3, 1, 4, 0, 0, 0, 0)
    raw = bytes([0, 0xF3, 0x90])
    data = _png(ihdr, _chunk(b"IDAT", zlib.compress(raw)))
    np.testing.assert_array_equal(decode_png(data), np.array([[15, 3, 9]], np.uint8))


def test_multi_idat_streams_concatenate():
    arr = np.arange(48, dtype=np.uint8).reshape(4, 4, 3)
    whole = encode_png(arr, filter_type=2)
    # split the single IDAT into two chunks byte-by-byte
    ihdr_body = struct.pack(">IIBBBBB", 4, 4, 8, 2, 0, 0, 0)
    idat_start = whole.index(b"IDAT") - 4
    (ln,) = struct.unpack(">I", whole[idat_start : idat_start + 4])
    payload = whole[idat_start + 8 : idat_start + 8 + ln]
    data = _png(
        ihdr_body,
        _chunk(b"IDAT", payload[: ln // 2]),
        _chunk(b"IDAT", payload[ln // 2 :]),
    )
    np.testing.assert_array_equal(decode_png(data), arr)


def test_rejects_interlace_truncation_and_bad_filter():
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 1)  # Adam7
    raw = bytes(14)
    with pytest.raises(ValueError, match="interlaced"):
        decode_png(_png(ihdr, _chunk(b"IDAT", zlib.compress(raw))))
    with pytest.raises(ValueError):
        decode_png(SIG + b"\x00\x00\x00\x20IHDR")  # truncated chunk
    ihdr_ok = struct.pack(">IIBBBBB", 1, 1, 8, 2, 0, 0, 0)
    bad = bytes([9, 1, 2, 3])  # filter type 9
    with pytest.raises(ValueError, match="filter type"):
        decode_png(_png(ihdr_ok, _chunk(b"IDAT", zlib.compress(bad))))
    with pytest.raises(ValueError, match="not a PNG"):
        decode_png(b"P6 1 1 255 abc")


def test_to_rgb_normalizations():
    gray = np.array([[0, 255]], np.uint8)
    assert to_rgb(gray).shape == (1, 2, 3)
    rgba = np.zeros((2, 2, 4), np.uint8)
    assert to_rgb(rgba).shape == (2, 2, 3)
    g16 = np.array([[0x1200]], np.uint16)
    assert to_rgb(g16)[0, 0, 0] == 0x12


def test_pixel_decoder_handles_png_and_error_rows(ray_session):
    from pdfrust_ray.stages.multimodal import (
        FEATURE_DIM,
        MEDIA_SCHEMA,
        PixelDecoder,
        encode_ppm,
    )

    rng = np.random.RandomState(3)
    pix = rng.randint(0, 256, size=(8, 6, 3)).astype(np.uint8)
    rows = {
        "media_id": [0, 1, 2],
        "kind": ["image", "image", "image"],
        "payload": [
            encode_png(pix, filter_type=4),
            encode_ppm(pix),
            SIG + b"garbage-after-signature",
        ],
        "width": [6, 6, 0],
        "height": [8, 8, 0],
        "duration_ms": [0, 0, 0],
    }
    out = PixelDecoder()(pa.Table.from_pydict(rows, schema=MEDIA_SCHEMA))
    d = out.to_pydict()
    assert d["decode_status"][0] == "ok" and d["decode_status"][1] == "ok"
    assert d["decode_status"][2].startswith("error:")
    # identical pixels -> identical features regardless of container
    assert d["features"][0] == d["features"][1]
    assert len(d["features"][0]) == FEATURE_DIM
    assert (d["width"][0], d["height"][0]) == (6, 8)

"""Baseline JPEG codec tests.

The codec is lossy, so the pins are: exactness on DC-only content
(solid color), near-losslessness at quality 100 (quant steps ~1 — this
isolates the marker/huffman/DCT path from quantization), PSNR bounds
on structured content, a hand-built 4:2:0 interleaved stream (the
encoder only emits 4:4:4, so the subsampled MCU path needs its own
vector), restart intervals, and rejection of unsupported profiles."""

import struct

import numpy as np
import pytest

from pdfrust_ray.functions.jpeg import (
    _AC_BITS,
    _AC_VALS,
    _C,
    _DC_BITS,
    _DC_VALS,
    _ZZ,
    _BitWriter,
    _canonical_codes,
    _magnitude,
    _seg,
    decode_jpeg,
    encode_jpeg,
)


def _psnr(a, b):
    mse = np.mean((a.astype(float) - b.astype(float)) ** 2)
    return 99.0 if mse == 0 else 10 * np.log10(255.0**2 / mse)


def test_solid_color_exact():
    solid = np.full((24, 17, 3), [120, 64, 200], dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(solid, quality=90))
    assert int(np.abs(out.astype(int) - solid.astype(int)).max()) == 0


def test_quality_100_near_lossless():
    rng = np.random.RandomState(0)
    noise = rng.randint(0, 256, (32, 32, 3)).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(noise, quality=100))
    # q=100 -> unit-ish quant steps: any residual is YCbCr float rounding
    assert int(np.abs(out.astype(int) - noise.astype(int)).max()) <= 2
    gray = rng.randint(0, 256, (32, 32)).astype(np.uint8)
    outg = decode_jpeg(encode_jpeg(gray, quality=100))
    assert outg.shape == gray.shape
    assert int(np.abs(outg.astype(int) - gray.astype(int)).max()) <= 1


def test_gradient_psnr_and_odd_dims():
    yy, xx = np.mgrid[0:41, 0:53]
    grad = np.stack([yy * 4 % 256, xx * 3 % 256, (yy + xx) * 2 % 256], axis=2).astype(
        np.uint8
    )
    out = decode_jpeg(encode_jpeg(grad, quality=90))
    assert out.shape == grad.shape  # non-multiple-of-8 dims crop back
    assert _psnr(grad, out) > 35.0


def _encode_block(bw, block, q, pred, dc_codes, ac_codes):
    coeff = _C @ (block - 128.0) @ _C.T
    zz = np.rint(coeff / q.reshape(8, 8)).astype(np.int64).reshape(64)[_ZZ]
    dc = int(zz[0])
    size, bits = _magnitude(dc - pred)
    c, ln = dc_codes[size]
    bw.write(c, ln)
    if size:
        bw.write(bits, size)
    run = 0
    nz = np.nonzero(zz[1:])[0]
    last = int(nz[-1]) + 1 if len(nz) else 0
    for i in range(1, last + 1):
        v = int(zz[i])
        if v == 0:
            run += 1
            continue
        while run > 15:
            c, ln = ac_codes[0xF0]
            bw.write(c, ln)
            run -= 16
        size, bits = _magnitude(v)
        c, ln = ac_codes[(run << 4) | size]
        bw.write(c, ln)
        bw.write(bits, size)
        run = 0
    if last < 63:
        c, ln = ac_codes[0x00]
        bw.write(c, ln)
    return dc


def _build_jpeg_420(y, cb, cr, q):
    """Hand-build a 16x16 4:2:0 interleaved baseline JPEG from full-res
    Y and half-res Cb/Cr planes (one MCU = 4 Y blocks + 1 Cb + 1 Cr)."""
    dc_codes = _canonical_codes(_DC_BITS, _DC_VALS)
    ac_codes = _canonical_codes(_AC_BITS, _AC_VALS)
    bw = _BitWriter()
    pred = [0, 0, 0]
    for vb in range(2):
        for hb in range(2):
            pred[0] = _encode_block(
                bw, y[vb * 8 : vb * 8 + 8, hb * 8 : hb * 8 + 8], q, pred[0], dc_codes, ac_codes
            )
    pred[1] = _encode_block(bw, cb, q, pred[1], dc_codes, ac_codes)
    pred[2] = _encode_block(bw, cr, q, pred[2], dc_codes, ac_codes)
    scan = bw.flush()
    out = bytearray(b"\xff\xd8")
    out += _seg(0xFFDB, bytes([0]) + bytes(q.astype(np.uint8).reshape(64)[_ZZ]))
    sof = struct.pack(">BHHB", 8, 16, 16, 3)
    sof += bytes([1, 0x22, 0])  # Y: 2x2 sampling
    sof += bytes([2, 0x11, 0])
    sof += bytes([3, 0x11, 0])
    out += _seg(0xFFC0, sof)
    out += _seg(0xFFC4, bytes([0x00] + _DC_BITS) + bytes(_DC_VALS))
    out += _seg(0xFFC4, bytes([0x10] + _AC_BITS) + bytes(_AC_VALS))
    out += _seg(0xFFDA, bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0]))
    out += scan + b"\xff\xd9"
    return bytes(out)


def test_handbuilt_420_subsampling():
    # neutral chroma (=128) so the decoded RGB equals the Y plane
    yy, xx = np.mgrid[0:16, 0:16]
    y = ((yy * 16 + xx * 3) % 256).astype(np.float64)
    cb = np.full((8, 8), 128.0)
    cr = np.full((8, 8), 128.0)
    q = np.ones(64)  # lossless-ish quant
    data = _build_jpeg_420(y, cb, cr, q)
    out = decode_jpeg(data)
    assert out.shape == (16, 16, 3)
    # gray content through 4:2:0: all channels equal Y within rounding
    assert int(np.abs(out[:, :, 0].astype(int) - y.astype(int)).max()) <= 1
    assert int(np.abs(out[:, :, 1].astype(int) - out[:, :, 0].astype(int)).max()) <= 1


def test_restart_intervals():
    # two MCUs of gray with a DRI of 1: an RST0 marker between them and
    # DC predictors reset per interval
    dc_codes = _canonical_codes(_DC_BITS, _DC_VALS)
    ac_codes = _canonical_codes(_AC_BITS, _AC_VALS)
    q = np.ones(64)
    blocks = [np.full((8, 8), 50.0), np.full((8, 8), 200.0)]
    scans = []
    for b in blocks:
        bw = _BitWriter()
        _encode_block(bw, b, q, 0, dc_codes, ac_codes)  # pred reset per interval
        scans.append(bw.flush())
    out = bytearray(b"\xff\xd8")
    out += _seg(0xFFDB, bytes([0]) + bytes(q.astype(np.uint8).reshape(64)[_ZZ]))
    out += _seg(0xFFC0, struct.pack(">BHHB", 8, 8, 16, 1) + bytes([1, 0x11, 0]))
    out += _seg(0xFFC4, bytes([0x00] + _DC_BITS) + bytes(_DC_VALS))
    out += _seg(0xFFC4, bytes([0x10] + _AC_BITS) + bytes(_AC_VALS))
    out += _seg(0xFFDD, struct.pack(">H", 1))  # DRI = 1 MCU
    out += _seg(0xFFDA, bytes([1, 1, 0x00, 0, 63, 0]))
    out += scans[0] + b"\xff\xd0" + scans[1] + b"\xff\xd9"
    decoded = decode_jpeg(bytes(out))
    assert decoded.shape == (8, 16)
    assert abs(int(decoded[0, 0]) - 50) <= 1
    assert abs(int(decoded[0, 8]) - 200) <= 1


def test_rejects_unsupported():
    with pytest.raises(ValueError, match="not a JPEG"):
        decode_jpeg(b"\x89PNG" + bytes(20))
    # progressive SOF2
    data = bytearray(encode_jpeg(np.zeros((8, 8), np.uint8)))
    idx = bytes(data).index(b"\xff\xc0")
    data[idx + 1] = 0xC2
    with pytest.raises(ValueError, match="baseline"):
        decode_jpeg(bytes(data))
    # truncated entropy stream
    whole = encode_jpeg(np.full((16, 16, 3), 77, np.uint8))
    with pytest.raises(ValueError):
        decode_jpeg(whole[:-20])


def test_pixel_decoder_jpeg_and_corpus(ray_session):
    from pdfrust_ray.stages.multimodal import (
        MEDIA_SCHEMA,
        PixelDecoder,
        media_features,
        synthesize_media_table,
    )
    import pyarrow as pa

    rng = np.random.RandomState(4)
    pix = rng.randint(0, 256, size=(10, 12, 3)).astype(np.uint8)
    rows = {
        "media_id": [0],
        "kind": ["image"],
        "payload": [encode_jpeg(pix, quality=85)],
        "width": [12],
        "height": [10],
        "duration_ms": [0],
    }
    out = PixelDecoder()(pa.Table.from_pydict(rows, schema=MEDIA_SCHEMA)).to_pydict()
    assert out["decode_status"][0] == "ok"
    assert (out["width"][0], out["height"][0]) == (12, 10)

    t = synthesize_media_table(n=48)
    feats = media_features(t).to_pandas()
    assert (feats["decode_status"] == "ok").all()
    payloads = t.to_pandas()
    jpeg_ids = [
        int(r.media_id) for r in payloads.itertuples() if bytes(r.payload)[:2] == b"\xff\xd8"
    ]
    assert jpeg_ids, "corpus must contain JPEG payloads"
    mjpeg = [
        int(r.media_id)
        for r in payloads.itertuples()
        if r.kind == "video" and bytes(r.payload)[:2] == b"\xff\xd8"
    ]
    assert mjpeg, "corpus must contain MJPEG video streams"
    sub = feats[feats["media_id"].isin(mjpeg)]
    assert (sub["duration_ms"] > 0).all()

"""GIF codec tests: LZW round-trips (including table growth to 12 bits
and the 4096 reset), a hand-packed byte-level reference vector built
independently of the encoder, interlace, transparency/disposal
compositing, and error rejection."""

import struct

import numpy as np
import pytest

from pdfrust_ray.functions.gif import decode_gif, encode_gif


def test_roundtrip_single_frame():
    rng = np.random.RandomState(11)
    palette = rng.randint(0, 256, size=(13, 3)).astype(np.uint8)
    pix = palette[rng.randint(0, 13, size=(21, 17))]
    out = decode_gif(encode_gif(pix))
    assert len(out) == 1
    np.testing.assert_array_equal(out[0], pix)


def test_roundtrip_animation_and_table_growth():
    rng = np.random.RandomState(5)
    palette = rng.randint(0, 256, size=(250, 3)).astype(np.uint8)
    palette = np.unique(palette, axis=0)
    # big noisy frames force the LZW table through every width up to 12
    # bits and across the 4096-entry reset
    frames = [palette[rng.randint(0, len(palette), size=(64, 64))] for _ in range(3)]
    out = decode_gif(encode_gif(frames))
    assert len(out) == 3
    for a, b in zip(out, frames):
        np.testing.assert_array_equal(a, b)


def _pack_lsb(pairs):
    """LSB-first bit packer over explicit (code, width) pairs."""
    acc = nbits = 0
    out = bytearray()
    for c, width in pairs:
        acc |= c << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _lzw_stream(data_codes, mcs):
    """Hand-model of the GIF code-width schedule: CLEAR, the literal
    codes (table grows by one per code after the first, width bumps
    when the table size reaches 2^width), then END."""
    clear, end = 1 << mcs, (1 << mcs) + 1
    width = mcs + 1
    pairs = [(clear, width)]
    table_len = clear + 2
    for k, c in enumerate(data_codes):
        pairs.append((c, width))
        if k > 0:
            table_len += 1
            if table_len == (1 << width) and width < 12:
                width += 1
    pairs.append((end, width))
    return _pack_lsb(pairs)


def test_handbuilt_gif_vector():
    # 2x2, 2-color global palette, pixels [[0,1],[1,0]]; LZW mcs=2:
    # clear=4, end=5, all 3-bit codes packed LSB-first BY HAND here,
    # independent of the encoder's bit writer
    lzw = _lzw_stream([0, 1, 1, 0], 2)
    data = (
        b"GIF89a"
        + struct.pack("<HHBBB", 2, 2, 0x80, 0, 0)  # GCT flag, 2 entries
        + bytes([10, 20, 30, 200, 100, 50])
        + b"\x2c"
        + struct.pack("<HHHHB", 0, 0, 2, 2, 0)
        + bytes([2])  # min code size
        + bytes([len(lzw)])
        + lzw
        + b"\x00"
        + b"\x3b"
    )
    out = decode_gif(data)
    np.testing.assert_array_equal(
        out[0],
        np.array(
            [[[10, 20, 30], [200, 100, 50]], [[200, 100, 50], [10, 20, 30]]],
            np.uint8,
        ),
    )


def test_interlaced_frame():
    # rows permuted per the 4 Adam passes must come back in order: use
    # an 8-row image whose rows are solid palette indices 0..7
    palette = np.arange(24, dtype=np.uint8).reshape(8, 3)
    rows_in_order = np.repeat(np.arange(8, dtype=np.uint8)[:, None], 2, axis=1)
    # interlace storage order for h=8: pass1 row0, pass2 row4, pass3
    # rows 2,6, pass4 rows 1,3,5,7
    storage = rows_in_order[[0, 4, 2, 6, 1, 3, 5, 7]]
    lzw = _lzw_stream([int(v) for v in storage.reshape(-1)], 3)
    data = (
        b"GIF89a"
        + struct.pack("<HHBBB", 2, 8, 0x80 | 0x02, 0, 0)  # 8-entry GCT
        + palette.tobytes()
        + b"\x2c"
        + struct.pack("<HHHHB", 0, 0, 2, 8, 0x40)  # interlace flag
        + bytes([3])
        + bytes([len(lzw)])
        + lzw
        + b"\x00\x3b"
    )
    out = decode_gif(data)
    np.testing.assert_array_equal(out[0], palette[rows_in_order])


def test_transparency_and_disposal():
    # frame 1 paints the 2x2 canvas; frame 2 has a transparent pixel
    # that must show frame 1 underneath
    palette = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255], [9, 9, 9]], np.uint8)
    f1 = _lzw_stream([0, 0, 0, 0], 2)
    f2 = _lzw_stream([1, 2, 2, 1], 2)
    data = (
        b"GIF89a"
        + struct.pack("<HHBBB", 2, 2, 0x80 | 0x01, 0, 0)
        + palette.tobytes()
        + b"\x2c" + struct.pack("<HHHHB", 0, 0, 2, 2, 0) + bytes([2])
        + bytes([len(f1)]) + f1 + b"\x00"
        # GCE: transparency on, transparent index 2
        + b"\x21\xf9\x04" + bytes([0x01, 0, 0, 2]) + b"\x00"
        + b"\x2c" + struct.pack("<HHHHB", 0, 0, 2, 2, 0) + bytes([2])
        + bytes([len(f2)]) + f2 + b"\x00"
        + b"\x3b"
    )
    out = decode_gif(data)
    assert len(out) == 2
    np.testing.assert_array_equal(out[0], np.broadcast_to(palette[0], (2, 2, 3)))
    expect = np.array(
        [[palette[1], palette[0]], [palette[0], palette[1]]], np.uint8
    )
    np.testing.assert_array_equal(out[1], expect)


def test_rejects_malformed():
    with pytest.raises(ValueError, match="not a GIF"):
        decode_gif(b"NOTGIF" + bytes(20))
    with pytest.raises(ValueError):
        decode_gif(b"GIF89a" + struct.pack("<HHBBB", 2, 2, 0, 0, 0) + b"\x2c")
    rng = np.random.RandomState(0)
    with pytest.raises(ValueError, match="256 distinct"):
        encode_gif(rng.randint(0, 256, size=(64, 64, 3)).astype(np.uint8))


def test_media_pipeline_decodes_gif_corpus(ray_session):
    from pdfrust_ray.stages.multimodal import media_features, synthesize_media_table

    t = synthesize_media_table(n=36)
    out = media_features(t).to_pandas()
    assert (out["decode_status"] == "ok").all()
    kinds = t.to_pandas()
    gif_ids = [
        int(r.media_id)
        for r in kinds.itertuples()
        if bytes(r.payload)[:4] == b"GIF8"
    ]
    assert gif_ids, "corpus must contain GIF payloads"
    sub = out[out["media_id"].isin(gif_ids)]
    assert (sub["decode_status"] == "ok").all()
    assert (sub["width"] > 0).all()

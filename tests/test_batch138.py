"""Batch-138: audio decoded-duration audit across four codecs."""

import pytest


def test_audio_duration_audit_all_match(ray_session):
    from pdfrust_ray.stages.multimodal import audio_duration_audit

    out = audio_duration_audit()
    # the corpus cycles all four codecs; each decodes to the exact
    # metadata duration (ADPCM padding is already reflected upstream)
    assert set(out["codec"]) == {"pcm16", "mulaw", "adpcm", "flac"}
    assert (out["n_dur_match"] == out["n"]).all()
    assert int(out["n_decode_err"].sum()) == 0
    assert int(out["n"].sum()) == 21  # 64-row corpus has 21 audio rows


def test_duration_is_exact_integer_ms():
    # decoded duration uses integer floor ms — cross-check one payload
    from pdfrust_ray.stages.multimodal import (
        synthesize_media_table,
        ensure_media_parquet,
    )
    from pdfrust_ray.functions.audio import decode_wav_any

    t = synthesize_media_table(n=64, seed=42)
    for kind, payload, dur in zip(
        t["kind"].to_pylist(), t["payload"].to_pylist(), t["duration_ms"].to_pylist()
    ):
        if kind == "audio" and bytes(payload)[:4] == b"RIFF":
            samples, rate = decode_wav_any(bytes(payload))
            assert len(samples) * 1000 // rate == dur
            break
    else:
        pytest.fail("no RIFF audio payload found")

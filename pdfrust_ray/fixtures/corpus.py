"""Deterministic synthetic transcript corpus + frozen goldens.

Generates the graft input table (BASELINE.json `input_hint` schema):
  conv_id:string, turn_idx:int32, role:string, text:string,
  tool:string, ts:timestamp[us]

sharded across many Parquet files with turns deliberately scattered
across shards (so the engine's ordering shuffle is exercised), plus a
`golden.parquet` computed SERIALLY with the same row semantics the
pipeline uses (pdfrust_ray.functions.payload.extract_row) — the
correctness gate compares pipeline output to it per (conv_id, turn_idx).

Everything is a pure function of (scale, SEED): no wall clock, no
unseeded RNG. Payload mix ~40% plain / 30% HTML / 30% PDF cycling the
construct matrices in FIXTURES.md.
"""

from __future__ import annotations

import hashlib
import json
import os
import struct

import pyarrow as pa
import pyarrow.parquet as pq

from ..functions.payload import encode_pdf_payload, extract_row
from .htmlgen import HTML_CONSTRUCTS
from .pdfgen import PDF_CONSTRUCTS, pdf_stress

SEED = 42
# bump when any construct generator changes, so stale /tmp caches regenerate
GENERATOR_VERSION = 8

TRANSCRIPTS_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("role", pa.string()),
        ("text", pa.string()),
        ("tool", pa.string()),
        ("ts", pa.timestamp("us")),
    ]
)

GOLDEN_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("payload_kind", pa.string()),
        ("extracted_text", pa.large_string()),
        ("parse_status", pa.string()),
        ("n_pages", pa.int32()),
        ("bytes_decoded", pa.int64()),
        ("error", pa.string()),
    ]
)

# scale -> (n_convs, turns_per_conv, n_shards, stress_every)
SCALES = {
    "t1": (20, 5, 1, 0),          # 100 rows, smoke
    "t2": (200, 10, 8, 499),      # 2,000 rows, correctness gate
    "bench": (20000, 40, 64, 1250),  # 800,000 rows (~640 oversized), throughput
}

_PDF_IDS = sorted(PDF_CONSTRUCTS)
_HTML_IDS = sorted(HTML_CONSTRUCTS)

_PLAIN_TEMPLATES = [
    "plain note {uid}: the quick brown fox jumps over the lazy dog.",
    "user query {uid} about throughput and scaling of the pipeline.",
    "assistant answer {uid} with some numbers: 1, 2.5, -3e4, and a URL http://example.com/x.",
    "tool output {uid}\n  row1\trow2\n  done.",
    "{uid} short",
]


def _h(s: str) -> int:
    return struct.unpack("<Q", hashlib.md5(f"{SEED}:{s}".encode()).digest()[:8])[0]


def _row(conv: int, turn: int) -> dict:
    conv_id = f"conv-{conv:06d}"
    uid = f"{conv_id}/{turn}"
    sel = _h(f"kind:{uid}") % 10
    if sel < 4:
        kind = "plain"
    elif sel < 7:
        kind = "html"
    else:
        kind = "pdf"
    if kind == "plain":
        tpl = _PLAIN_TEMPLATES[_h(f"plain:{uid}") % len(_PLAIN_TEMPLATES)]
        text = tpl.format(uid=uid)
        tool = ""
    elif kind == "html":
        cid = _HTML_IDS[_h(f"html:{uid}") % len(_HTML_IDS)]
        text = HTML_CONSTRUCTS[cid](uid)
        tool = "browser"
    else:
        cid = _PDF_IDS[_h(f"pdf:{uid}") % len(_PDF_IDS)]
        text = encode_pdf_payload(PDF_CONSTRUCTS[cid](uid))
        tool = "pdf_render"
    role = ("user", "assistant", "tool")[turn % 3 if tool else turn % 2]
    # deterministic timestamp: 2025-01-01 epoch + spacing
    ts_us = 1735689600_000000 + (conv * 3600 + turn * 60) * 1_000_000
    return {
        "conv_id": conv_id,
        "turn_idx": turn,
        "role": role,
        "text": text,
        "tool": tool,
        "ts": ts_us,
    }


def generate_rows(scale: str):
    n_convs, n_turns, _, stress_every = SCALES[scale]
    i = 0
    for conv in range(n_convs):
        for turn in range(n_turns):
            i += 1
            if stress_every and i % stress_every == 0:
                # oversized payload for skew handling (tracemonkey stand-in)
                conv_id = f"conv-{conv:06d}"
                uid = f"{conv_id}/{turn}"
                row = _row(conv, turn)
                row["text"] = encode_pdf_payload(pdf_stress(uid))
                row["tool"] = "pdf_render"
                yield row
            else:
                yield _row(conv, turn)


def _marker_current(marker: str) -> bool:
    if not os.path.exists(marker):
        return False
    try:
        with open(marker) as f:
            return json.load(f).get("generator_version") == GENERATOR_VERSION
    except (json.JSONDecodeError, OSError):
        return False


def default_dir(scale: str) -> str:
    return f"/tmp/pdfrust_ray_fixtures/{scale}"


MODES_CONSTRUCTS = ("pdf-hello", "pdf-cmap1", "pdf-tree", "pdf-info")
MODES = ("text", "chars", "font", "raw-content")


def ensure_modes_fixture(base_dir: str | None = None) -> str:
    """Small fixture pinning the chars/font/raw-content display formats
    (FIXTURES.md §3 last paragraph): 3 constructs x 3 convs, goldens for
    all four extract modes in golden_modes.parquet (keyed by `mode`)."""
    base = base_dir or "/tmp/pdfrust_ray_fixtures/modes"
    marker = os.path.join(base, "_COMPLETE.json")
    if _marker_current(marker):
        return base
    shard_dir = os.path.join(base, "shards")
    os.makedirs(shard_dir, exist_ok=True)
    rows = []
    for c, conv in enumerate(range(3)):
        conv_id = f"conv-{conv:06d}"
        for t, cid in enumerate(MODES_CONSTRUCTS):
            uid = f"{conv_id}/{t}"
            rows.append(
                {
                    "conv_id": conv_id,
                    "turn_idx": t,
                    "role": "tool",
                    "text": encode_pdf_payload(PDF_CONSTRUCTS[cid](uid)),
                    "tool": "pdf_render",
                    "ts": 1735689600_000000 + (conv * 3600 + t * 60) * 1_000_000,
                }
            )
    table = pa.Table.from_pylist(rows, schema=TRANSCRIPTS_SCHEMA)
    pq.write_table(table, os.path.join(shard_dir, "part-0000.parquet"))

    golden_rows = []
    for mode in MODES:
        for r in sorted(rows, key=lambda r: (r["conv_id"], r["turn_idx"])):
            g = extract_row(r["text"], mode=mode)
            golden_rows.append(
                {
                    "mode": mode,
                    "conv_id": r["conv_id"],
                    "turn_idx": r["turn_idx"],
                    "extracted_text": g["extracted_text"],
                    "parse_status": g["parse_status"],
                }
            )
    gschema = pa.schema(
        [
            ("mode", pa.string()),
            ("conv_id", pa.string()),
            ("turn_idx", pa.int32()),
            ("extracted_text", pa.large_string()),
            ("parse_status", pa.string()),
        ]
    )
    pq.write_table(pa.Table.from_pylist(golden_rows, schema=gschema), os.path.join(base, "golden_modes.parquet"))

    # info golden (P7): trailer metadata per pdf turn
    from ..functions.payload import payload_bytes
    from ..pdfref.errors import ParseError
    from ..pdfref.extract import extract_info

    info_rows = []
    for r in sorted(rows, key=lambda r: (r["conv_id"], r["turn_idx"])):
        try:
            info = extract_info(payload_bytes(r["text"]))
            status = "ok"
        except ParseError as exc:
            info = {k: None for k in ("title", "author", "creator", "producer", "creation_date", "mod_date")}
            status = f"error:{exc.kind}"
        info_rows.append(
            {
                "conv_id": r["conv_id"],
                "turn_idx": r["turn_idx"],
                **info,
                "parse_status": status,
            }
        )
    ischema = pa.schema(
        [
            ("conv_id", pa.string()),
            ("turn_idx", pa.int32()),
            ("title", pa.string()),
            ("author", pa.string()),
            ("creator", pa.string()),
            ("producer", pa.string()),
            ("creation_date", pa.string()),
            ("mod_date", pa.string()),
            ("parse_status", pa.string()),
        ]
    )
    pq.write_table(pa.Table.from_pylist(info_rows, schema=ischema), os.path.join(base, "golden_info.parquet"))
    with open(marker, "w") as f:
        json.dump({"rows": len(rows), "modes": list(MODES), "seed": SEED,
                   "generator_version": GENERATOR_VERSION}, f)
    return base


def ensure_corpus(scale: str, base_dir: str | None = None, golden: bool = True) -> str:
    """Idempotently generate shards (+ golden) for `scale`; returns dir."""
    base = base_dir or default_dir(scale)
    marker = os.path.join(base, "_COMPLETE.json")
    if _marker_current(marker):
        return base
    n_convs, n_turns, n_shards, _ = SCALES[scale]
    shard_dir = os.path.join(base, "shards")
    os.makedirs(shard_dir, exist_ok=True)

    rows = list(generate_rows(scale))
    # scatter turns across shards deterministically (NOT grouped by conv)
    order = sorted(range(len(rows)), key=lambda i: _h(f"shard:{rows[i]['conv_id']}:{rows[i]['turn_idx']}"))
    shards: list[list[dict]] = [[] for _ in range(n_shards)]
    for pos, idx in enumerate(order):
        shards[pos % n_shards].append(rows[idx])

    for s, shard_rows in enumerate(shards):
        table = pa.Table.from_pylist(
            [
                {**r, "ts": r["ts"]}
                for r in shard_rows
            ],
            schema=TRANSCRIPTS_SCHEMA,
        )
        pq.write_table(table, os.path.join(shard_dir, f"part-{s:04d}.parquet"))

    if golden:
        out = []
        for r in sorted(rows, key=lambda r: (r["conv_id"], r["turn_idx"])):
            g = extract_row(r["text"])
            out.append(
                {
                    "conv_id": r["conv_id"],
                    "turn_idx": r["turn_idx"],
                    **g,
                }
            )
        gt = pa.Table.from_pylist(out, schema=GOLDEN_SCHEMA)
        pq.write_table(gt, os.path.join(base, "golden.parquet"))

    with open(marker, "w") as f:
        json.dump({"scale": scale, "rows": len(rows), "shards": n_shards, "seed": SEED,
                   "generator_version": GENERATOR_VERSION}, f)
    return base


def ensure_xobj_fixture(base_dir: str | None = None) -> str:
    """Form-XObject fixture family: PDF payloads whose body text lives
    inside Form XObjects invoked with `Do` (XOBJ_CONSTRUCTS: own vs
    inherited resources, FlateDecode'd forms, nesting), mixed with
    classic / HTML / plain turns. Golden computed serially with
    extract_row(spec_mode=True) — parity mode ignores Do (pinned
    against the reference binary in tests/test_content.py)."""
    from .htmlgen import HTML_CONSTRUCTS
    from .pdfgen import XOBJ_CONSTRUCTS

    base = base_dir or "/tmp/pdfrust_ray_fixtures/xobj"
    marker = os.path.join(base, "_COMPLETE.json")
    if _marker_current(marker):
        return base
    shard_dir = os.path.join(base, "shards")
    os.makedirs(shard_dir, exist_ok=True)
    xo_ids = sorted(XOBJ_CONSTRUCTS)
    rows = []
    for conv in range(8):
        conv_id = f"xobj-{conv:04d}"
        for t in range(8):
            uid = f"{conv_id}/{t}"
            if t < 5:
                text = encode_pdf_payload(XOBJ_CONSTRUCTS[xo_ids[(conv + t) % len(xo_ids)]](uid))
                tool = "pdf_render"
            elif t == 5:
                cid = _PDF_IDS[_h(f"xobjpdf:{uid}") % len(_PDF_IDS)]
                text = encode_pdf_payload(PDF_CONSTRUCTS[cid](uid))
                tool = "pdf_render"
            elif t == 6:
                cid = _HTML_IDS[_h(f"xobjhtml:{uid}") % len(_HTML_IDS)]
                text = HTML_CONSTRUCTS[cid](uid)
                tool = "browser"
            else:
                text = f"plain xobj note {uid}"
                tool = ""
            rows.append(
                {
                    "conv_id": conv_id,
                    "turn_idx": t,
                    "role": "tool" if tool else "user",
                    "text": text,
                    "tool": tool,
                    "ts": 1735689600_000000 + (conv * 3600 + t * 60) * 1_000_000,
                }
            )
    for shard in range(4):
        part = [r for i, r in enumerate(rows) if i % 4 == shard]
        pq.write_table(
            pa.Table.from_pylist(part, schema=TRANSCRIPTS_SCHEMA),
            os.path.join(shard_dir, f"part-{shard:04d}.parquet"),
        )
    golden_rows = []
    for r in sorted(rows, key=lambda r: (r["conv_id"], r["turn_idx"])):
        g = extract_row(r["text"], mode="text", spec_mode=True)
        golden_rows.append({"conv_id": r["conv_id"], "turn_idx": r["turn_idx"], **g})
    pq.write_table(
        pa.Table.from_pylist(golden_rows, schema=GOLDEN_SCHEMA),
        os.path.join(base, "golden.parquet"),
    )
    with open(marker, "w") as f:
        json.dump({"rows": len(rows), "generator_version": GENERATOR_VERSION}, f)
    return base


def ensure_spec15_fixture(base_dir: str | None = None) -> str:
    """Spec-mode fixture family: transcript shards whose PDF payloads
    are PDF 1.5 xref-stream documents (SPEC15_CONSTRUCTS — the
    reference cannot read these; spec_mode=True required), mixed with
    classic-PDF / HTML / plain turns to pin payload routing. Golden
    computed serially with extract_row(spec_mode=True)."""
    from .htmlgen import HTML_CONSTRUCTS
    from .pdfgen import SPEC15_CONSTRUCTS

    base = base_dir or "/tmp/pdfrust_ray_fixtures/spec15"
    marker = os.path.join(base, "_COMPLETE.json")
    if _marker_current(marker):
        return base
    shard_dir = os.path.join(base, "shards")
    os.makedirs(shard_dir, exist_ok=True)
    spec_ids = sorted(SPEC15_CONSTRUCTS)
    rows = []
    for conv in range(8):
        conv_id = f"spec-{conv:04d}"
        for t in range(8):
            uid = f"{conv_id}/{t}"
            if t < 5:
                text = encode_pdf_payload(SPEC15_CONSTRUCTS[spec_ids[(conv + t) % 5]](uid))
                tool = "pdf_render"
            elif t == 5:
                cid = _PDF_IDS[_h(f"spec15pdf:{uid}") % len(_PDF_IDS)]
                text = encode_pdf_payload(PDF_CONSTRUCTS[cid](uid))
                tool = "pdf_render"
            elif t == 6:
                cid = _HTML_IDS[_h(f"spec15html:{uid}") % len(_HTML_IDS)]
                text = HTML_CONSTRUCTS[cid](uid)
                tool = "browser"
            else:
                text = f"plain spec15 note {uid}"
                tool = ""
            rows.append(
                {
                    "conv_id": conv_id,
                    "turn_idx": t,
                    "role": "tool" if tool else "user",
                    "text": text,
                    "tool": tool,
                    "ts": 1735689600_000000 + (conv * 3600 + t * 60) * 1_000_000,
                }
            )
    # scatter turns across shards so the ordering shuffle is exercised
    for shard in range(4):
        part = [r for i, r in enumerate(rows) if i % 4 == shard]
        pq.write_table(
            pa.Table.from_pylist(part, schema=TRANSCRIPTS_SCHEMA),
            os.path.join(shard_dir, f"part-{shard:04d}.parquet"),
        )
    golden_rows = []
    for r in sorted(rows, key=lambda r: (r["conv_id"], r["turn_idx"])):
        g = extract_row(r["text"], mode="text", spec_mode=True)
        golden_rows.append({"conv_id": r["conv_id"], "turn_idx": r["turn_idx"], **g})
    pq.write_table(
        pa.Table.from_pylist(golden_rows, schema=GOLDEN_SCHEMA),
        os.path.join(base, "golden.parquet"),
    )
    with open(marker, "w") as f:
        json.dump({"rows": len(rows), "generator_version": GENERATOR_VERSION}, f)
    return base


def ensure_filters_fixture(base_dir: str | None = None) -> str:
    """Stream-filter fixture family: transcript shards whose PDF
    payloads use the spec-mode filters (FILTER_CONSTRUCTS: ASCIIHex /
    ASCII85 / RunLength / LZW incl. EarlyChange=0 and a corrupted
    ASCII85 stream that must become an error row), mixed with classic
    PDF / HTML / plain turns. The reference rejects every non-Flate
    /Filter name (body.rs:47-54); golden computed serially with
    extract_row(spec_mode=True)."""
    from .htmlgen import HTML_CONSTRUCTS
    from .pdfgen import FILTER_CONSTRUCTS

    base = base_dir or "/tmp/pdfrust_ray_fixtures/filters"
    marker = os.path.join(base, "_COMPLETE.json")
    if _marker_current(marker):
        return base
    shard_dir = os.path.join(base, "shards")
    os.makedirs(shard_dir, exist_ok=True)
    flt_ids = sorted(FILTER_CONSTRUCTS)
    rows = []
    for conv in range(8):
        conv_id = f"flt-{conv:04d}"
        for t in range(8):
            uid = f"{conv_id}/{t}"
            if t < 6:
                text = encode_pdf_payload(
                    FILTER_CONSTRUCTS[flt_ids[(conv + t) % len(flt_ids)]](uid)
                )
                tool = "pdf_render"
            elif t == 6:
                cid = _HTML_IDS[_h(f"flthtml:{uid}") % len(_HTML_IDS)]
                text = HTML_CONSTRUCTS[cid](uid)
                tool = "browser"
            else:
                text = f"plain filters note {uid}"
                tool = ""
            rows.append(
                {
                    "conv_id": conv_id,
                    "turn_idx": t,
                    "role": "tool" if tool else "user",
                    "text": text,
                    "tool": tool,
                    "ts": 1735689600_000000 + (conv * 3600 + t * 60) * 1_000_000,
                }
            )
    for shard in range(4):
        part = [r for i, r in enumerate(rows) if i % 4 == shard]
        pq.write_table(
            pa.Table.from_pylist(part, schema=TRANSCRIPTS_SCHEMA),
            os.path.join(shard_dir, f"part-{shard:04d}.parquet"),
        )
    golden_rows = []
    for r in sorted(rows, key=lambda r: (r["conv_id"], r["turn_idx"])):
        g = extract_row(r["text"], mode="text", spec_mode=True)
        golden_rows.append({"conv_id": r["conv_id"], "turn_idx": r["turn_idx"], **g})
    pq.write_table(
        pa.Table.from_pylist(golden_rows, schema=GOLDEN_SCHEMA),
        os.path.join(base, "golden.parquet"),
    )
    with open(marker, "w") as f:
        json.dump({"rows": len(rows), "generator_version": GENERATOR_VERSION}, f)
    return base


def ensure_encrypted_fixture(base_dir: str | None = None) -> str:
    """Encrypted-document fixture family: PDF payloads protected by the
    standard security handler (ENC_CONSTRUCTS: RC4-40/R2, RC4-128/R3,
    V4 crypt filters /V2 and /AESV2, EncryptMetadata=false, an
    uncompressed-stream variant, and a password-protected document that
    must stay an error:Encrypted row), mixed with classic PDF / HTML /
    plain turns. The reference only type-checks the trailer /Encrypt
    entry (xref.rs:136-139); parity mode turns every one of these into
    error:Encrypted rows; spec mode decrypts with the empty user
    password (pdfref/crypt.py). Golden computed serially with
    extract_row(spec_mode=True)."""
    from .htmlgen import HTML_CONSTRUCTS
    from .pdfgen import ENC_CONSTRUCTS

    base = base_dir or "/tmp/pdfrust_ray_fixtures/encrypted"
    marker = os.path.join(base, "_COMPLETE.json")
    if _marker_current(marker):
        return base
    shard_dir = os.path.join(base, "shards")
    os.makedirs(shard_dir, exist_ok=True)
    enc_ids = sorted(ENC_CONSTRUCTS)
    rows = []
    for conv in range(8):
        conv_id = f"enc-{conv:04d}"
        for t in range(9):
            uid = f"{conv_id}/{t}"
            if t < 7:
                text = encode_pdf_payload(
                    ENC_CONSTRUCTS[enc_ids[(conv + t) % len(enc_ids)]](uid)
                )
                tool = "pdf_render"
            elif t == 7:
                cid = _HTML_IDS[_h(f"enchtml:{uid}") % len(_HTML_IDS)]
                text = HTML_CONSTRUCTS[cid](uid)
                tool = "browser"
            else:
                text = f"plain encrypted-family note {uid}"
                tool = ""
            rows.append(
                {
                    "conv_id": conv_id,
                    "turn_idx": t,
                    "role": "tool" if tool else "user",
                    "text": text,
                    "tool": tool,
                    "ts": 1735689600_000000 + (conv * 3600 + t * 60) * 1_000_000,
                }
            )
    for shard in range(4):
        part = [r for i, r in enumerate(rows) if i % 4 == shard]
        pq.write_table(
            pa.Table.from_pylist(part, schema=TRANSCRIPTS_SCHEMA),
            os.path.join(shard_dir, f"part-{shard:04d}.parquet"),
        )
    golden_rows = []
    for r in sorted(rows, key=lambda r: (r["conv_id"], r["turn_idx"])):
        g = extract_row(r["text"], mode="text", spec_mode=True)
        golden_rows.append({"conv_id": r["conv_id"], "turn_idx": r["turn_idx"], **g})
    pq.write_table(
        pa.Table.from_pylist(golden_rows, schema=GOLDEN_SCHEMA),
        os.path.join(base, "golden.parquet"),
    )
    with open(marker, "w") as f:
        json.dump({"rows": len(rows), "generator_version": GENERATOR_VERSION}, f)
    return base


_PII_NAMES = ["ada", "grace", "alan", "edsger", "barbara", "donald"]
_PII_DOMAINS = ["example.com", "mail.org", "corp-test.net"]


def ensure_pii_fixture(base_dir: str | None = None) -> str:
    """PII-bearing transcript fixture family for the redaction op: all
    plain turns (tool=""), with deterministic mixes of email addresses
    and 555-prefix phone numbers (plus PII-free turns, multi-PII turns,
    and PII embedded mid-sentence / at line starts). The redaction
    oracle recomputes from these RAW shards with the identical RE2
    patterns, so the check is independent of the engine."""
    base = base_dir or "/tmp/pdfrust_ray_fixtures/pii"
    marker = os.path.join(base, "_COMPLETE.json")
    if _marker_current(marker):
        return base
    shard_dir = os.path.join(base, "shards")
    os.makedirs(shard_dir, exist_ok=True)
    rows = []
    for conv in range(12):
        conv_id = f"pii-{conv:04d}"
        for t in range(10):
            uid = f"{conv_id}/{t}"
            h = _h(f"pii:{uid}")
            name = _PII_NAMES[h % len(_PII_NAMES)]
            dom = _PII_DOMAINS[(h >> 8) % len(_PII_DOMAINS)]
            phone = f"555{'-.'[(h >> 16) % 2]}{100 + h % 900}{'-.'[(h >> 16) % 2]}{1000 + (h >> 4) % 9000}"
            kind = t % 5
            if kind == 0:
                text = f"note {uid}: reach {name}@{dom} for details."
            elif kind == 1:
                text = f"{uid} call {phone} before noon."
            elif kind == 2:
                text = (
                    f"escalation {uid}: {name}.{_PII_NAMES[(h >> 24) % len(_PII_NAMES)]}"
                    f"@{dom} or {phone}\nsecond line cc {name}+spam@{dom}"
                )
            elif kind == 3:
                text = f"plain turn {uid} with no contact info at all."
            else:
                text = f"{name} at {dom} said {uid} (not an address); digits 12-34 stay."
            rows.append(
                {
                    "conv_id": conv_id,
                    "turn_idx": t,
                    "role": "user" if t % 2 == 0 else "assistant",
                    "text": text,
                    "tool": "",
                    "ts": 1735689600_000000 + (conv * 3600 + t * 60) * 1_000_000,
                }
            )
    for shard in range(3):
        part = [r for i, r in enumerate(rows) if i % 3 == shard]
        pq.write_table(
            pa.Table.from_pylist(part, schema=TRANSCRIPTS_SCHEMA),
            os.path.join(shard_dir, f"part-{shard:04d}.parquet"),
        )
    with open(marker, "w") as f:
        json.dump({"rows": len(rows), "generator_version": GENERATOR_VERSION}, f)
    return base


def ensure_htmlld_fixture(base_dir: str | None = None) -> str:
    """HTML fixture family for the link-density (readability-style)
    extractor variant: documents where the density and link-density
    rules legitimately differ — link-farm sidebars with long anchor
    text, short nav strips, link-heavy but prose-rich articles, table
    layouts, malformed markup (unclosed tags), and entity references.
    The golden is computed SERIALLY with html.extract_main_text_ld at
    generation time, so the Ray pipeline's distributed output has an
    engine-independent frozen target."""
    from ..html.extract import extract_main_text_ld

    base = base_dir or "/tmp/pdfrust_ray_fixtures/htmlld"
    marker = os.path.join(base, "_COMPLETE.json")
    if _marker_current(marker):
        return base
    shard_dir = os.path.join(base, "shards")
    os.makedirs(shard_dir, exist_ok=True)

    def doc(uid: str) -> str:
        h = _h(f"htmlld:{uid}")
        para = " ".join(f"word{(h >> (2 * i)) % 97}w{i}" for i in range(30 + h % 40))
        links = " ".join(
            f'<a href="/l{i}">long anchor text item number {i} {uid}</a>'
            for i in range(5 + h % 6)
        )
        nav = "".join(f'<a href="/n{i}">nav{i}</a> | ' for i in range(8))
        kind = h % 5
        if kind == 0:  # article vs link-farm sidebar
            return (
                f"<html><body><nav>{nav}</nav>"
                f"<div id=sidebar>{links}</div>"
                f"<article><h1>Title {uid}</h1><p>{para}</p><p>{para[::-1]}</p></article>"
                f"<footer>&copy; 2026 corp</footer></body></html>"
            )
        if kind == 1:  # link-heavy but prose-rich main vs short boilerplate
            return (
                f"<html><body><div class=menu>{nav}</div>"
                f"<main><p>{para} see <a href='/x'>reference {uid}</a> and "
                f"<a href='/y'>appendix</a>.</p><p>{para}</p></main></body></html>"
            )
        if kind == 2:  # table layout, unclosed tags
            return (
                f"<html><body><table><tr><td>{links}<td><p>{para}"
                f"<p>{para} &amp; more &lt;data&gt;</table></body></html>"
            )
        if kind == 3:  # nested divs of equal-ish text, entities
            return (
                f"<html><body><div><div>{para}</div>"
                f"<div><p>{para}</p><p>extra {uid} &quot;quoted&quot;</p></div></div>"
                f"<aside>{links}</aside></body></html>"
            )
        return (  # no candidate beats body; script/style must vanish
            f"<html><head><style>p {{color: red}}</style></head><body>"
            f"<script>var x = '{uid}';</script>{para}<br>{para}</body></html>"
        )

    rows, gold = [], []
    for conv in range(10):
        conv_id = f"htmlld-{conv:04d}"
        for t in range(8):
            uid = f"{conv_id}/{t}"
            text = doc(uid)
            rows.append(
                {
                    "conv_id": conv_id,
                    "turn_idx": t,
                    "role": "user" if t % 2 == 0 else "assistant",
                    "text": text,
                    "tool": "",
                    "ts": 1735689600_000000 + (conv * 3600 + t * 60) * 1_000_000,
                }
            )
            gold.append(
                {"conv_id": conv_id, "turn_idx": t, "main_text": extract_main_text_ld(text)}
            )
    for shard in range(3):
        part = [r for i, r in enumerate(rows) if i % 3 == shard]
        pq.write_table(
            pa.Table.from_pylist(part, schema=TRANSCRIPTS_SCHEMA),
            os.path.join(shard_dir, f"part-{shard:04d}.parquet"),
        )
    pq.write_table(
        pa.Table.from_pylist(gold).sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")]),
        os.path.join(base, "golden.parquet"),
    )
    with open(marker, "w") as f:
        json.dump({"rows": len(rows), "generator_version": GENERATOR_VERSION}, f)
    return base


def ensure_forks_fixture(base_dir: str | None = None) -> str:
    """Forked-conversation fixture family for conv_prefix_forks: fork
    families share their first 3 turns byte-exactly and then diverge —
    some with distinct turn-3 continuations (branch factor = members),
    some where two branches continue identically (branch factor <
    members), some members ending at exactly 3 turns (no continuation
    at all).  Singleton conversations are mixed in and must NOT appear
    in the output."""
    base = base_dir or "/tmp/pdfrust_ray_fixtures/forks"
    marker = os.path.join(base, "_COMPLETE.json")
    if _marker_current(marker):
        return base
    shard_dir = os.path.join(base, "shards")
    os.makedirs(shard_dir, exist_ok=True)
    rows = []

    def add_turn(conv_id: str, t: int, text: str) -> None:
        rows.append(
            {
                "conv_id": conv_id,
                "turn_idx": t,
                "role": "user" if t % 2 == 0 else "assistant",
                "text": text,
                "tool": "",
                "ts": 1735689600_000000 + (len(rows)) * 60_000_000,
            }
        )

    for fam in range(18):
        h = _h(f"forks:{fam}")
        members = 2 + h % 3  # 2..4 branches
        prefix = [f"family {fam} opening line {h % 977}",
                  f"assistant ack {fam} token {(h >> 8) % 997}",
                  f"user follow-up {fam} detail {(h >> 16) % 983}"]
        for m in range(members):
            conv_id = f"fork-{fam:03d}-{m}"
            for t, txt in enumerate(prefix):
                add_turn(conv_id, t, txt)
            mode = (h >> (4 * m)) % 4
            if mode == 0 and m > 0:
                # continue identically to member 0 (shrinks branch factor)
                add_turn(conv_id, 3, f"family {fam} shared continuation")
                add_turn(conv_id, 4, f"family {fam} shared tail {m}")
            elif mode == 1:
                # ends exactly at the prefix: no turn-3 continuation
                pass
            else:
                add_turn(conv_id, 3, f"family {fam} branch {m} distinct reply")
                add_turn(conv_id, 4, f"family {fam} branch {m} tail")
    for s in range(25):
        h = _h(f"forks-single:{s}")
        conv_id = f"solo-{s:03d}"
        for t in range(3 + h % 4):
            add_turn(conv_id, t, f"solo {s} turn {t} text {(h >> t) % 991}")
    for shard in range(4):
        part = [r for i, r in enumerate(rows) if i % 4 == shard]
        pq.write_table(
            pa.Table.from_pylist(part, schema=TRANSCRIPTS_SCHEMA),
            os.path.join(shard_dir, f"part-{shard:04d}.parquet"),
        )
    with open(marker, "w") as f:
        json.dump({"rows": len(rows), "generator_version": GENERATOR_VERSION}, f)
    return base


def ensure_chains_fixture(base_dir: str | None = None) -> str:
    """Continuation-chain fixture family for conv_chain_stitch:
    sessions split across conversation ids, where the continuation's
    FIRST turn repeats the predecessor's LAST turn byte-exactly (the
    resume-from-context pattern agent frameworks emit).  Chains of
    length 2-4 are planted alongside standalone conversations and one
    deliberate red herring (two convs that merely share a middle
    turn, which must NOT stitch)."""
    base = base_dir or "/tmp/pdfrust_ray_fixtures/chains"
    marker = os.path.join(base, "_COMPLETE.json")
    if _marker_current(marker):
        return base
    shard_dir = os.path.join(base, "shards")
    os.makedirs(shard_dir, exist_ok=True)
    rows = []

    def add_turn(conv_id: str, t: int, text: str) -> None:
        rows.append(
            {
                "conv_id": conv_id,
                "turn_idx": t,
                "role": "user" if t % 2 == 0 else "assistant",
                "text": text,
                "tool": "",
                "ts": 1735689600_000000 + len(rows) * 60_000_000,
            }
        )

    for ch in range(10):
        h = _h(f"chains:{ch}")
        n_links = 2 + h % 3
        carry = f"chain {ch} handoff token {(h >> 4) % 9973}"
        for link in range(n_links):
            conv_id = f"chain-{ch:03d}-{link}"
            t = 0
            if link > 0:
                add_turn(conv_id, t, carry)  # resume: repeat predecessor's tail
                t += 1
            n_body = 2 + (h >> (3 * link)) % 3
            for b in range(n_body):
                add_turn(conv_id, t, f"chain {ch} link {link} body {b} {(h >> b) % 991}")
                t += 1
            if link < n_links - 1:
                carry = f"chain {ch} handoff token {(h >> (8 + 4 * link)) % 9973}"
                add_turn(conv_id, t, carry)
    for s in range(15):
        h = _h(f"chains-solo:{s}")
        conv_id = f"standalone-{s:03d}"
        for t in range(2 + h % 3):
            add_turn(conv_id, t, f"standalone {s} turn {t} {(h >> t) % 883}")
    # red herring: a shared MIDDLE turn only
    add_turn("herring-a", 0, "herring a opening")
    add_turn("herring-a", 1, "shared middle line")
    add_turn("herring-a", 2, "herring a closing")
    add_turn("herring-b", 0, "herring b opening")
    add_turn("herring-b", 1, "shared middle line")
    add_turn("herring-b", 2, "herring b closing")
    for shard in range(3):
        part = [r for i, r in enumerate(rows) if i % 3 == shard]
        pq.write_table(
            pa.Table.from_pylist(part, schema=TRANSCRIPTS_SCHEMA),
            os.path.join(shard_dir, f"part-{shard:04d}.parquet"),
        )
    with open(marker, "w") as f:
        json.dump({"rows": len(rows), "generator_version": GENERATOR_VERSION}, f)
    return base


def ensure_unicode_fixture(base_dir: str | None = None) -> str:
    """Unicode-normalization fixture family for turn_nfc_audit: prose
    turns (no control bytes — DuckDB's nfc_normalize truncates at NUL,
    so the oracle needs clean text) mixing NFC-composed, NFC-DECOMPOSED
    (combining marks, Hangul jamo), compatibility forms that NFC leaves
    alone (fullwidth, ligatures — the NFKC-only cases), and plain
    ASCII."""
    base = base_dir or "/tmp/pdfrust_ray_fixtures/unicode"
    marker = os.path.join(base, "_COMPLETE.json")
    if _marker_current(marker):
        return base
    shard_dir = os.path.join(base, "shards")
    os.makedirs(shard_dir, exist_ok=True)
    rows = []

    decomposed = [
        "café menu review",            # e + COMBINING ACUTE -> é
        "Ångström units noted",  # A+ring, o+diaeresis
        "각 syllable test",  # Hangul jamo -> 각
        "résumé attached",
    ]
    composed = ["café menu review", "Ångström units noted", "각 syllable test"]
    nfkc_only = ["ﬁnal ﬂight", "ＦＵＬＬ　ＷＩＤＴＨ text", "x² + y²"]
    ascii_only = ["plain ascii line", "another plain line"]

    def add(conv_id: str, texts: list[str]) -> None:
        for t, text in enumerate(texts):
            rows.append(
                {
                    "conv_id": conv_id,
                    "turn_idx": t,
                    "role": ["user", "assistant", "tool"][t % 3],
                    "text": text,
                    "tool": "",
                    "ts": 1735689600_000000 + len(rows) * 60_000_000,
                }
            )

    for i in range(12):
        h = _h(f"unicode:{i}")
        mix = []
        for j in range(5):
            pool = [decomposed, composed, nfkc_only, ascii_only][(h >> (2 * j)) % 4]
            mix.append(pool[(h >> (10 + j)) % len(pool)])
        add(f"uni-{i:03d}", mix)
    add("uni-plain", ascii_only * 2)

    for shard in range(2):
        part = [r for i, r in enumerate(rows) if i % 2 == shard]
        pq.write_table(
            pa.Table.from_pylist(part, schema=TRANSCRIPTS_SCHEMA),
            os.path.join(shard_dir, f"part-{shard:04d}.parquet"),
        )
    with open(marker, "w") as f:
        json.dump({"rows": len(rows), "generator_version": GENERATOR_VERSION}, f)
    return base


def ensure_homoglyph_fixture(base_dir: str | None = None) -> str:
    """Mixed-script / homoglyph fixture family for turn_homoglyph_audit:
    prose turns where some tokens mix Latin with Cyrillic or Greek
    lookalikes (the spoofing / bad-OCR signal a text cleaner flags),
    alongside pure-Latin, pure-Cyrillic and pure-Greek tokens that must
    NOT be flagged."""
    base = base_dir or "/tmp/pdfrust_ray_fixtures/homoglyph"
    marker = os.path.join(base, "_COMPLETE.json")
    if _marker_current(marker):
        return base
    shard_dir = os.path.join(base, "shards")
    os.makedirs(shard_dir, exist_ok=True)
    rows = []

    # mixed tokens: Latin letters with a Cyrillic or Greek lookalike
    mixed = [
        "pаyment",    # Cyrillic a
        "сluster",    # Cyrillic s-lookalike c
        "latоncy",  # Cyrillic o (U+043E)
        "micrοservice",  # Greek omicron
        "tеst",       # Cyrillic e
    ]
    pure = [
        "payment", "cluster", "latency",
        "привет",  # privet (pure Cyrillic)
        "λόγος",  # logos (pure Greek)
        "mixed-case-ASCII", "42numbers42",
    ]

    def add(conv_id: str, texts: list[str]) -> None:
        for t, text in enumerate(texts):
            rows.append(
                {
                    "conv_id": conv_id,
                    "turn_idx": t,
                    "role": ["user", "assistant", "tool"][t % 3],
                    "text": text,
                    "tool": "",
                    "ts": 1735689600_000000 + len(rows) * 60_000_000,
                }
            )

    for i in range(10):
        h = _h(f"homoglyph:{i}")
        texts = []
        for t in range(4):
            words = []
            for j in range(5):
                hh = h >> (3 * (t * 5 + j) % 29)
                if hh % 4 == 0:
                    words.append(mixed[hh % len(mixed)])
                else:
                    words.append(pure[hh % len(pure)])
            texts.append(" ".join(words))
        add(f"hg-{i:03d}", texts)
    add("hg-clean", ["entirely clean ascii prose", "привет clean separate scripts"])

    for shard in range(2):
        part = [r for i, r in enumerate(rows) if i % 2 == shard]
        pq.write_table(
            pa.Table.from_pylist(part, schema=TRANSCRIPTS_SCHEMA),
            os.path.join(shard_dir, f"part-{shard:04d}.parquet"),
        )
    with open(marker, "w") as f:
        json.dump({"rows": len(rows), "generator_version": GENERATOR_VERSION}, f)
    return base


def ensure_invisible_fixture(base_dir: str | None = None) -> str:
    """Invisible-character fixture family for turn_invisible_chars_audit:
    prose turns salted with zero-width spaces/joiners, soft hyphens,
    BOMs and NBSPs (the invisible codepoints that poison exact dedup
    and tokenizers), next to clean twins of the same visible text."""
    base = base_dir or "/tmp/pdfrust_ray_fixtures/invisible"
    marker = os.path.join(base, "_COMPLETE.json")
    if _marker_current(marker):
        return base
    shard_dir = os.path.join(base, "shards")
    os.makedirs(shard_dir, exist_ok=True)
    rows = []

    zwsp, zwnj, zwj, shy, bom, nbsp = (
        "​", "‌", "‍", "­", "﻿", " ",
    )
    salted = [
        f"inline{zwsp}zero width space",
        f"joi{zwnj}ner and {zwj}seq",
        f"hy{shy}phen{shy}ation",
        f"{bom}leading byte order mark",
        f"non{nbsp}breaking{nbsp}space",
    ]
    clean = [
        "inlinezero width space",
        "joiner and seq",
        "hyphenation",
        "leading byte order mark",
        "non breaking space",
        "entirely boring ascii",
    ]

    def add(conv_id: str, texts: list[str]) -> None:
        for t, text in enumerate(texts):
            rows.append(
                {
                    "conv_id": conv_id,
                    "turn_idx": t,
                    "role": ["user", "assistant", "tool"][t % 3],
                    "text": text,
                    "tool": "",
                    "ts": 1735689600_000000 + len(rows) * 60_000_000,
                }
            )

    for i in range(9):
        h = _h(f"invisible:{i}")
        texts = []
        for t in range(4):
            pool = salted if (h >> t) % 3 == 0 else clean
            texts.append(pool[(h >> (4 + t)) % len(pool)])
        add(f"inv-{i:03d}", texts)

    for shard in range(2):
        part = [r for i, r in enumerate(rows) if i % 2 == shard]
        pq.write_table(
            pa.Table.from_pylist(part, schema=TRANSCRIPTS_SCHEMA),
            os.path.join(shard_dir, f"part-{shard:04d}.parquet"),
        )
    with open(marker, "w") as f:
        json.dump({"rows": len(rows), "generator_version": GENERATOR_VERSION}, f)
    return base

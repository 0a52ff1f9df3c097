"""Spec-mode (PDF 1.5+) xref streams / ObjStm / predictors.

The reference cannot read these documents (get_catalog_offset stub
Some(0) at xref.rs:331-333, DecodeParms panic at xref.rs:368-376,
its 1.5 fixture test disabled at tests/integration.rs:44-50), so the
oracle here is (a) frozen goldens for the reference's own disabled
pdflatex-4-pages.pdf fixture, (b) construct-matrix round-trips through
Pdf15Builder, and (c) the invariant that spec mode agrees with the
(binary-verified) parity mode on every classic-xref corpus document.
"""

import glob
import hashlib
import itertools
import os

import pytest

from pdfrust_ray.fixtures.pdfgen import Pdf15Builder, _page_setup15
from pdfrust_ray.pdfref import ParseError, extract

PDFLATEX = "/root/reference/data/pdflatex-4-pages.pdf"

needs_corpus = pytest.mark.skipif(
    not os.path.exists(PDFLATEX), reason="reference corpus not available"
)

# frozen goldens for the reference's disabled 1.5 fixture (spec mode)
PDFLATEX_GOLDEN = {
    "text": (4, 12014, "9047a1df31ea3207645c9382b407030b"),
    "chars": (4, 759644, "dc6030aae767142c37899669c6581be8"),
    "raw-content": (4, 32800, "9fc7164800df1aa58ce96d8432aa4481"),
    "font": (4, 13143, "382668a8aca62ca82907c20a20805c89"),
}


def _build(pred=False, w=(1, 4, 2), split=False, comp=True, text="Spec mode works!"):
    b = Pdf15Builder(predictor=pred, w=w, index_split=split)
    c = b.add_stream("", f"BT /F1 10 Tf ({text}) Tj ET".encode(), compress=True)
    f = b.add(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>", compressed=comp)
    root = _page_setup15(b, c, f, compressed=comp)
    return b.build(root)


@pytest.mark.parametrize(
    "pred,w,split,comp",
    [
        c
        for c in itertools.product(
            (False, True), ((1, 4, 2), (1, 2, 1), (0, 2, 1)), (False, True), (False, True)
        )
        if not (c[1][0] == 0 and c[3])  # W[0]=0 cannot express type-2 entries
    ],
)
def test_spec_construct_matrix(pred, w, split, comp):
    data = _build(pred=pred, w=w, split=split, comp=comp)
    assert extract(data, "text", spec_mode=True).text == "Spec mode works!"
    # parity mode keeps the reference's broken 1.5 behavior
    with pytest.raises(ParseError):
        extract(data, "text")


def test_w0_zero_with_objstm_is_rejected_by_builder():
    with pytest.raises(ValueError):
        _build(w=(0, 2, 1), comp=True)


@needs_corpus
@pytest.mark.parametrize("mode", sorted(PDFLATEX_GOLDEN))
def test_pdflatex_fixture_extracts(mode):
    data = open(PDFLATEX, "rb").read()
    with pytest.raises(ParseError):
        extract(data, mode)  # parity: fails like the reference binary
    r = extract(data, mode, spec_mode=True)
    pages, length, md5 = PDFLATEX_GOLDEN[mode]
    assert r.n_pages == pages
    assert len(r.text) == length
    assert hashlib.md5(r.text.encode()).hexdigest() == md5


@needs_corpus
def test_spec_mode_agrees_with_parity_on_classic_corpus():
    """On classic-xref documents — where parity mode is byte-verified
    against the reference binary — spec mode must produce identical
    text (the ISO xref layer resolves the same offsets; content
    interpretation is shared), EXCEPT where Form XObjects genuinely
    carry body text: tracemonkey's figure labels live in forms, which
    spec-mode `Do` recursion now extracts (parity ignores Do like the
    reference, content.rs:615-620). That doc is pinned by a frozen
    spec-mode golden instead."""
    import hashlib

    for p in sorted(glob.glob("/root/reference/data/*.pdf")):
        if p == PDFLATEX:
            continue
        data = open(p, "rb").read()
        spec = extract(data, "text", spec_mode=True).text
        parity = extract(data, "text").text
        if p.endswith("tracemonkey.pdf"):
            # forms insert figure text mid-document; shared prefix/suffix
            # prove the page stream is untouched, the hash freezes the
            # full spec-mode output
            assert spec[:1000] == parity[:1000] and spec[-1000:] == parity[-1000:]
            assert len(spec) == 69235
            assert hashlib.md5(spec.encode()).hexdigest() == "3dc704be455d7fff3d46f30e761e6cc7"
        else:
            assert spec == parity, p


def test_objstm_length_via_indirect_ref():
    """A content stream whose /Length is an indirect ref stored inside
    an ObjStm (spec-mode negative-address path through
    _resolve_stream_length)."""
    b = Pdf15Builder()
    content = b"BT /F1 10 Tf (Indirect length) Tj ET"
    ln = b.add(str(len(content)).encode(), compressed=True)
    c = b.add(
        f"<< /Length {ln} 0 R >>".encode() + b"\nstream\n" + content + b"\nendstream"
    )
    f = b.add(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>", compressed=True)
    root = _page_setup15(b, c, f, compressed=True)
    data = b.build(root)
    assert extract(data, "text", spec_mode=True).text == "Indirect length"


def test_png_predictor_filters():
    from pdfrust_ray.pdfref.filters import apply_png_predictor

    rows = [bytes([(i * 7 + j * 3) % 256 for j in range(6)]) for i in range(8)]
    flat = b"".join(rows)
    # encode with each filter type and check the decoder inverts it
    bpp = 1
    for ft in (0, 1, 2, 3, 4):
        enc = bytearray()
        prev = bytes(6)
        for r in rows:
            enc.append(ft)
            for j in range(6):
                a = r[j - bpp] if j >= bpp else 0
                bb = prev[j]
                cc = prev[j - bpp] if j >= bpp else 0
                if ft == 0:
                    v = r[j]
                elif ft == 1:
                    v = (r[j] - a) & 0xFF
                elif ft == 2:
                    v = (r[j] - bb) & 0xFF
                elif ft == 3:
                    v = (r[j] - ((a + bb) >> 1)) & 0xFF
                else:
                    p = a + bb - cc
                    pa, pb, pc = abs(p - a), abs(p - bb), abs(p - cc)
                    pred = a if (pa <= pb and pa <= pc) else (bb if pb <= pc else cc)
                    v = (r[j] - pred) & 0xFF
                enc.append(v)
            prev = r
        assert apply_png_predictor(bytes(enc), columns=6) == flat, f"filter {ft}"


def test_hybrid_xrefstm_key():
    """Classic table whose trailer carries /XRefStm: the stream's
    type-2 entries must win over the table's free markers."""
    b = Pdf15Builder()
    c = b.add_stream("", b"BT /F1 10 Tf (Hybrid) Tj ET", compress=False)
    f = b.add(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>", compressed=True)
    root = _page_setup15(b, c, f, compressed=True)
    data = b.build(root)
    # wrap: append a classic table marking the compressed objects free,
    # pointing at the existing xref stream via /XRefStm
    sx_old = int(data[data.rfind(b"startxref") + 9 :].split(b"%%EOF")[0])
    base = data[: data.rfind(b"startxref")]
    n_objs = 7  # 5 bodies + objstm + xref stream
    table = bytearray()
    table_off = len(base)
    table += b"xref\n0 1\n0000000000 65535 f \n"
    table += (
        f"trailer\n<< /Size {n_objs + 1} /Root {root} 0 R /XRefStm {sx_old} >>\n".encode()
    )
    wrapped = bytes(base) + bytes(table) + f"startxref\n{table_off}\n%%EOF".encode()
    assert extract(wrapped, "text", spec_mode=True).text == "Hybrid"


def test_incremental_update_prev_chain_of_xref_streams():
    """PDF 1.5 incremental update: an appended section whose xref STREAM
    carries /Prev to the original xref stream. The newest section's
    entry for the rewritten content object must win; everything else
    resolves through the chain."""
    import zlib

    base = _build(comp=True, text="Original text")
    sx_old = int(base[base.rfind(b"startxref") + 9 :].split(b"%%EOF")[0])
    body = bytearray(base[: base.rfind(b"startxref")])

    # rewritten content object 1 (the page's /Contents)
    content = b"BT /F1 10 Tf (Updated text) Tj ET"
    body += b"\n"
    new_obj_off = len(body)
    body += b"1 0 obj\n<< /Length %d >>\nstream\n" % len(content) + content + b"\nendstream\nendobj\n"

    # new xref stream object: entries for obj 1 and itself, Prev -> old
    new_xref_num = 7  # base layout: 5 bodies + objstm(6)? xref stream was 7
    # (compute from the base instead of assuming)
    import re as _re

    nums = [int(m) for m in _re.findall(rb"\n(\d+) 0 obj", base)]
    new_xref_num = max(nums) + 1
    body += b"\n"
    xref_off = len(body)
    rows = bytearray()
    for num, (t, f2, f3) in ((1, (1, new_obj_off, 0)), (new_xref_num, (1, xref_off, 0))):
        rows += bytes([t]) + f2.to_bytes(4, "big") + f3.to_bytes(2, "big")
    payload = zlib.compress(bytes(rows), 6)
    xstm = (
        b"<< /Type /XRef /Size %d /W [ 1 4 2 ] /Index [ 1 1 %d 1 ] "
        b"/Root 5 0 R /Prev %d /Length %d /Filter /FlateDecode >>"
        % (new_xref_num + 1, new_xref_num, sx_old, len(payload))
    ) + b"\nstream\n" + payload + b"\nendstream"
    body += b"%d 0 obj\n" % new_xref_num + xstm + b"\nendobj\n"
    body += b"startxref\n%d\n%%%%EOF" % xref_off
    updated = bytes(body)

    assert extract(base, "text", spec_mode=True).text == "Original text"
    assert extract(updated, "text", spec_mode=True).text == "Updated text"


class TestFormXObjects:
    """Spec-mode `Do` recursion (the reference parses-and-ignores Do,
    content.rs:615-620 — parity pinned in the corpus/differential
    suites; these pin the spec-mode expansion)."""

    def test_parity_ignores_do(self):
        from pdfrust_ray.fixtures.pdfgen import pdf_xobj
        from pdfrust_ray.pdfref import extract

        assert extract(pdf_xobj("u"), "text").text == "before u\nafter u"

    @pytest.mark.parametrize("nested", [False, True])
    @pytest.mark.parametrize("compress", [False, True])
    @pytest.mark.parametrize("own_res", [False, True])
    def test_spec_expands_forms(self, nested, compress, own_res):
        from pdfrust_ray.fixtures.pdfgen import pdf_xobj
        from pdfrust_ray.pdfref import extract

        data = pdf_xobj("u", nested=nested, compress=compress, own_res=own_res)
        want = (
            "before u\nouter u\ninside u\nafter u" if nested else "before u\ninside u\nafter u"
        )
        assert extract(data, "text", spec_mode=True).text == want
        # parity unaffected by every variant
        assert extract(data, "text").text == "before u\nafter u"

    def test_unresolvable_do_stays_ignored_in_spec_mode(self):
        # /Im1 Do with no /XObject resources (pdf_ops) must not change
        # spec-mode output vs parity
        from pdfrust_ray.fixtures.pdfgen import pdf_ops
        from pdfrust_ray.pdfref import extract

        data = pdf_ops("u")
        assert extract(data, "text", spec_mode=True).text == extract(data, "text").text

    def test_reference_binary_ignores_do(self, tmp_path):
        import subprocess

        from pdfrust_ray.fixtures.pdfgen import pdf_xobj

        binary = "/tmp/refbuild/target/release/pdfrust"
        if not os.path.exists(binary):
            pytest.skip("reference binary not built")
        p = tmp_path / "xo.pdf"
        p.write_bytes(pdf_xobj("u"))
        r = subprocess.run([binary, "--text", str(p)], capture_output=True, text=True)
        assert r.returncode == 0
        from pdfrust_ray.pdfref import extract

        assert r.stdout.rstrip("\n") == extract(pdf_xobj("u"), "text").text

    def test_xobj_pipeline_matches_golden(self, ray_session, tmp_path):
        import duckdb

        from pdfrust_ray.fixtures.corpus import ensure_xobj_fixture
        from pdfrust_ray.pipelines.extract_pipeline import build_extraction
        from pdfrust_ray.sources.transcripts import read_transcripts

        d = ensure_xobj_fixture(str(tmp_path / "xobj"))
        ds = read_transcripts(d)
        out = (
            build_extraction(ds, mode="text", batch_size=16, concurrency=2, spec_mode=True)
            .to_pandas()
            .reset_index(drop=True)
        )
        con = duckdb.connect()
        golden = con.execute(
            f"SELECT * FROM read_parquet('{d}/golden.parquet') ORDER BY conv_id, turn_idx"
        ).df()
        assert len(out) == len(golden) == 64
        got = out.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
        for col in ("conv_id", "turn_idx", "extracted_text", "parse_status"):
            assert got[col].tolist() == golden[col].tolist(), col
        # the Do-recursion rows really extracted the form text
        inside = got["extracted_text"].str.contains("inside", na=False)
        assert inside.sum() >= 40  # 5 xobj turns per conv x 8 convs

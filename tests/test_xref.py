"""Ports of the reference xref unit tests (xref.rs:430-482)."""

import pytest

from pdfrust_ray.pdfref.errors import ParseError
from pdfrust_ray.pdfref.tokenizer import Tokenizer
from pdfrust_ray.pdfref.xref import XRefStream, XRefTable, parse_xref, startxref


def test_xref_entry_in_use():
    n, g, u = XRefTable._read_subsection_entry(Tokenizer(b"0000000010 00000 n", 0))
    assert (n, g, u) == (10, 0, True)


def test_xref_entry_not_in_use():
    n, g, u = XRefTable._read_subsection_entry(Tokenizer(b"0000000000 65535 f", 0))
    assert (n, g, u) == (0, 65535, False)


def test_xref_table_valid():
    sample = (
        b"xref\n0 6\n0000000000 65535 f \n0000000010 00000 n \n0000000079 00000 n \n"
        b"0000000173 00000 n \n0000000301 00000 n \n0000000380 00000 n \n"
        b"trailer\n<<\n  /Size 6\n  /Root 1 0 R\n>>"
    )
    table = parse_xref(sample, 0)
    assert isinstance(table, XRefTable)
    assert len(table) == 6
    assert table.get((1, 0)) == 10
    assert table.get((2, 0)) == 79
    assert table.get((5, 0)) == 380


def test_xref_freed_object_error():
    sample = (
        b"xref\n0 2\n0000000000 65535 f \n0000000010 00000 n \n"
        b"trailer\n<< /Size 2 /Root 1 0 R >>"
    )
    table = parse_xref(sample, 0)
    with pytest.raises(ParseError):
        table.get((0, 65535))


def test_xref_stream_valid():
    sample = (
        b"22 0 obj\n<<\n /Type /XRef\n/Index [0 23]\n/Size 23\n/W [1 2 1]\n/Root 20 0 R\n"
        b"/Info 21 0 R\n/ID [<8EBF2018CB18810B2C88BDD4E7324774> <8EBF2018CB18810B2C88BDD4E7324774>]\n"
        b"/Length 0        \n/Filter /FlateDecode\n>>\nstream\n\nendstream\nendobj"
    )
    xs = parse_xref(sample, 0)
    assert isinstance(xs, XRefStream)
    assert xs.get_catalog_offset() == 0  # the reference's stub (xref.rs:331-333)


def test_startxref():
    data = b"junk startxref junk\nstartxref\n  12345\n%%EOF"
    assert startxref(data) == 12345


def test_get_and_fix_repair():
    # offset points at the wrong place -> repair scan finds "\n3 0 obj"
    data = b"xxxxx\n3 0 obj << >> endobj"
    t = XRefTable()
    t.table = {(3, 0): (0, True)}
    assert t.get_and_fix((3, 0), data) == 6
    # correct offset passes through
    t.table = {(3, 0): (6, True)}
    assert t.get_and_fix((3, 0), data) == 6


def test_get_and_fix_no_match_error():
    t = XRefTable()
    t.table = {(3, 0): (0, True)}
    with pytest.raises(ParseError):
        t.get_and_fix((3, 0), b"nothing here")


def test_prev_chain():
    prev_section = (
        b"xref\n0 2\n0000000000 65535 f \n0000000042 00000 n \n"
        b"trailer\n<< /Size 2 /Root 1 0 R >>\n"
    )
    data = prev_section + (
        b"xref\n2 1\n0000000099 00000 n \n"
        b"trailer\n<< /Size 3 /Root 1 0 R /Prev 0 >>"
    )
    table = parse_xref(data, len(prev_section))
    assert table.get((2, 0)) == 99
    assert table.get((1, 0)) == 42  # falls back down the Prev chain


def test_encrypted_trailer_yields_distinct_status():
    # The reference only type-checks trailer /Encrypt (xref.rs:136-139)
    # and then fails later with whatever the encrypted streams produce;
    # the engine signals a distinct, early error:Encrypted row.
    from pdfrust_ray.fixtures.pdfgen import pdf_hello
    from pdfrust_ray.functions.payload import encode_pdf_payload, extract_row
    from pdfrust_ray.pdfref import ParseError, extract

    data = pdf_hello("enc")
    assert extract(data, "text").text == "Hello enc!"
    enc = data.replace(b"/Root 5 0 R", b"/Root 5 0 R /Encrypt 1 0 R")
    assert enc != data  # trailer actually patched
    with pytest.raises(ParseError) as e:
        extract(enc, "text")
    assert e.value.kind == "Encrypted"
    row = extract_row(encode_pdf_payload(enc))
    assert row["parse_status"] == "error:Encrypted"
    # parity kept: a non-Ref Encrypt value still hits the reference's
    # type-check panic (xref.rs:136-139) before the new signal
    bad = data.replace(b"/Root 5 0 R", b"/Root 5 0 R /Encrypt 7")
    with pytest.raises(ParseError) as e2:
        extract(bad, "text")
    assert "Encrypt" in e2.value.message or e2.value.kind == "XRef"

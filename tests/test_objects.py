"""Ports of the reference object-parser unit tests (object.rs:194-385)."""

import pytest

from pdfrust_ray.pdfref.errors import ParseError
from pdfrust_ray.pdfref.numbers import Number
from pdfrust_ray.pdfref.objects import (
    HexString,
    Name,
    PdfString,
    Ref,
    StreamObj,
    parse_dictionary,
    parse_object,
)
from pdfrust_ray.pdfref.tokenizer import Lemmatizer
from pdfrust_ray.pdfref.xref import XRefTable


def lem(data, pos=0):
    return Lemmatizer(data, pos, XRefTable())


def test_dictionary_0():
    d = parse_dictionary(lem(b"/Title (sample) /Author (Philip Hutchison) /Creator (Pages) >>"))
    assert d["Title"] == PdfString("sample")
    assert d["Author"] == PdfString("Philip Hutchison")
    assert d["Creator"] == PdfString("Pages")


def test_object_trailer():
    obj = parse_object(
        lem(
            b"<</Size 14/Root 12 0 R\n/Info 13 0 R\n/ID [ <6285DCD147BBD7C07D63844C37B01D23>\n<6285DCD147BBD7C07D63844C37B01D23> ]\n/DocChecksum /700D49F24CC4E7F9CC731421E1DAB422\n>>\nstartxref\n12125\n"
        )
    )
    assert obj["Size"] == Number.int(14)
    assert obj["Root"] == Ref(12, 0)
    assert obj["Info"] == Ref(13, 0)
    expected_id = HexString(
        bytes([98, 133, 220, 209, 71, 187, 215, 192, 125, 99, 132, 76, 55, 176, 29, 35])
    )
    assert obj["ID"] == [expected_id, expected_id]
    assert obj["DocChecksum"] == Name("700D49F24CC4E7F9CC731421E1DAB422")


def test_object_catalog():
    obj = parse_object(lem(b"1 0 obj  % entry point\n<<\n  /Type /Catalog\n\n>>\nendobj"))
    assert obj["Type"] == Name("Catalog")


def test_object_pages():
    obj = parse_object(
        lem(
            b"2 0 obj\n<<\n  /Type /Pages\n  /MediaBox [ 0 0 200 200 ]\n  /Count 1\n  /Kids [ 3 0 R ]\n>>\nendobj"
        )
    )
    assert obj["Type"] == Name("Pages")
    assert obj["MediaBox"] == [Number.int(0), Number.int(0), Number.int(200), Number.int(200)]
    assert obj["Count"] == Number.int(1)
    assert obj["Kids"] == [Ref(3, 0)]


def test_object_stream():
    obj = parse_object(lem(b"4 0 obj\n<<\n  /Length 10\n>>\nstream\n1234567890\nendstream\nendobj"))
    assert isinstance(obj, StreamObj)
    assert obj.header["Length"] == Number.int(10)
    assert obj.data == b"1234567890"


def test_object_stream_indirect_length():
    data = b"4 0 obj\n<<\n  /Length 6 0 R\n>>\nstream\nabcde12345\nendstream\nendobj\n6 0 obj\n10\nendobj"
    xref = XRefTable()
    xref.table = {(6, 0): (data.find(b"6 0 obj"), True)}
    obj = parse_object(Lemmatizer(data, 0, xref))
    assert isinstance(obj, StreamObj)
    assert obj.data == b"abcde12345"


def test_object_page():
    obj = parse_object(
        lem(
            b"3 0 obj\n<<\n  /Type /Page\n  /Parent 2 0 R\n  /Resources <<\n    /Font <<\n      /F1 4 0 R \n    >>\n  >>\n  /Contents 5 0 R\n>>\nendobj"
        )
    )
    assert obj["Type"] == Name("Page")
    assert obj["Parent"] == Ref(2, 0)
    assert obj["Contents"] == Ref(5, 0)
    assert obj["Resources"]["Font"]["F1"] == Ref(4, 0)


def test_bare_keyword_value_becomes_name():
    # object.rs:70-72: Token::String value -> Object::Name
    d = parse_dictionary(lem(b"/Flag true >>"))
    assert d["Flag"] == Name("true")
    assert isinstance(d["Flag"], Name)


def test_real_stream_length_error():
    with pytest.raises(ParseError):
        parse_object(lem(b"<< /Length 10.5 >>\nstream\n1234567890\nendstream"))

"""Ports of the reference tokenizer unit tests (tokenizer.rs:376-557)."""

import pytest

from pdfrust_ray.pdfref.errors import ParseError
from pdfrust_ray.pdfref.numbers import Number
from pdfrust_ray.pdfref.tokenizer import (
    ARR_BEGIN,
    ARR_END,
    COMMENT,
    DICT_BEGIN,
    DICT_END,
    HEX,
    LIT,
    NAME,
    NUM,
    OBJ_BEGIN,
    OBJ_END,
    REF,
    STR,
    Lemmatizer,
    Tokenizer,
)


def toks(data, pos=0):
    t = Tokenizer(data, pos)
    out = []
    while True:
        tok = t.next()
        if tok is None:
            return out
        out.append(tok)


def test_skipped_comment():
    out = toks(b"%PDF-1.7\n\n1 0 obj  % entry point")
    assert out == [
        (COMMENT, b"PDF-1.7"),
        (NUM, Number.int(1)),
        (NUM, Number.int(0)),
        (STR, b"obj"),
        (COMMENT, b" entry point"),
    ]


def test_litteral_string_octal():
    assert toks(b"(\\003)") == [(LIT, bytes([3]))]


def test_octal_quirk():
    # reference computes 8c+8d+e, NOT 64c+8d+e (tokenizer.rs:313-321)
    assert toks(b"(\\123)") == [(LIT, bytes([8 * 1 + 8 * 2 + 3]))]
    assert toks(b"(\\040)") == [(LIT, b" ")]


def test_litteral_string():
    assert toks(b"(Hello World)") == [(LIT, b"Hello World")]


def test_litteral_string_nested_parens():
    assert toks(b"((Hello) (World))") == [(LIT, b"(Hello) (World)")]


def test_escapes():
    assert toks(rb"(a\n\t\r\b\f\(\)\\z\q)") == [
        (LIT, b"a\n\t\r\x08\x0c()\\z" + b"q")
    ]


def test_hex_string():
    assert toks(b"<4E6F762073686D6F7A206B6120706F702E>") == [
        (HEX, bytes([78, 111, 118, 32, 115, 104, 109, 111, 122, 32, 107, 97, 32, 112, 111, 112, 46]))
    ]


def test_hex_string_odd_padded():
    # odd length padded with '0' (tokenizer.rs:248-250)
    assert toks(b"<901FA>") == [(HEX, bytes([0x90, 0x1F, 0xA0]))]


def test_hex_string_whitespace_is_error():
    with pytest.raises(ParseError):
        toks(b"<4E 6F>")


def test_numeric_float():
    assert toks(b"12.34") == [(NUM, Number.real(12.34))]


def test_mediabox_float():
    assert toks(b"/MediaBox [ 0 0 200.00 200.00 ] ") == [
        (NAME, "MediaBox"),
        (ARR_BEGIN, None),
        (NUM, Number.int(0)),
        (NUM, Number.int(0)),
        (NUM, Number.real(200.0)),
        (NUM, Number.real(200.0)),
        (ARR_END, None),
    ]


def test_tokenizer_pages_obj():
    out = toks(
        b"2 0 obj\n<<\n  /Type /Pages\n  /MediaBox [ 0 0 200 200 ]\n  /Count 1\n  /Kids [ 3 0 R ]\n>>\nendobj\n"
    )
    assert out == [
        (NUM, Number.int(2)),
        (NUM, Number.int(0)),
        (STR, b"obj"),
        (DICT_BEGIN, None),
        (NAME, "Type"),
        (NAME, "Pages"),
        (NAME, "MediaBox"),
        (ARR_BEGIN, None),
        (NUM, Number.int(0)),
        (NUM, Number.int(0)),
        (NUM, Number.int(200)),
        (NUM, Number.int(200)),
        (ARR_END, None),
        (NAME, "Count"),
        (NUM, Number.int(1)),
        (NAME, "Kids"),
        (ARR_BEGIN, None),
        (NUM, Number.int(3)),
        (NUM, Number.int(0)),
        (STR, b"R"),
        (ARR_END, None),
        (DICT_END, None),
        (OBJ_END, None),
    ]


def test_tokenizer_font_widths():
    t = Tokenizer(
        b"9 0 obj\n<</Type/Font/Subtype/TrueType/BaseFont/BAAAAA+DejaVuSans\n/FirstChar 0\n/LastChar 27\n/Widths[600 557 611 ]>>",
        0,
    )
    expected = [
        (NUM, Number.int(9)),
        (NUM, Number.int(0)),
        (STR, b"obj"),
        (DICT_BEGIN, None),
        (NAME, "Type"),
        (NAME, "Font"),
        (NAME, "Subtype"),
        (NAME, "TrueType"),
        (NAME, "BaseFont"),
        (NAME, "BAAAAA+DejaVuSans"),
        (NAME, "FirstChar"),
        (NUM, Number.int(0)),
        (NAME, "LastChar"),
        (NUM, Number.int(27)),
        (NAME, "Widths"),
        (ARR_BEGIN, None),
        (NUM, Number.int(600)),
        (NUM, Number.int(557)),
        (NUM, Number.int(611)),
    ]
    for e in expected:
        assert t.next() == e


def lemtoks(data, pos=0):
    lem = Lemmatizer(data, pos, None)
    out = []
    while True:
        tok = lem.next()
        if tok is None:
            return out
        out.append(tok)


def test_lemmatizer_folds_ref_and_obj():
    out = lemtoks(
        b"2 0 obj\n<<\n  /Type /Pages\n  /Count 1\n  /Kids [ 3 0 R ]\n>>\nendobj\n"
    )
    assert out == [
        (OBJ_BEGIN, (2, 0)),
        (DICT_BEGIN, None),
        (NAME, "Type"),
        (NAME, "Pages"),
        (NAME, "Count"),
        (NUM, Number.int(1)),
        (NAME, "Kids"),
        (ARR_BEGIN, None),
        (REF, (3, 0)),
        (ARR_END, None),
        (DICT_END, None),
        (OBJ_END, None),
    ]


def test_lemmatizer_int_int_keyword_quirk():
    # `int int <keyword>` ends the token stream (tokenizer.rs:155 fall-through)
    lem = Lemmatizer(b"1 2 moveto 7", 0, None)
    assert lem.next() is None
    # and the tokenizer was not advanced past the first int
    assert lem.next() == (NUM, Number.int(2))


def test_stream_keywords():
    from pdfrust_ray.pdfref.tokenizer import STREAM_BEGIN, STREAM_END

    assert toks(b"stream endstream endobj") == [
        (STREAM_BEGIN, None),
        (STREAM_END, None),
        (OBJ_END, None),
    ]


def test_lone_gt_skipped():
    assert toks(b"> 5") == [(NUM, Number.int(5))]


def test_braces_error():
    with pytest.raises(ParseError):
        toks(b"{abc}")


def test_stray_close_paren_runs_string_loop():
    # a stray ')' maps to Delimiter::String (tokenizer.rs:66-69) and runs
    # the SAME literal-string loop — escapes and the octal quirk included
    # (tokenizer.rs:287-331) — scanning until parens balance.
    assert toks(rb") \( (x)) (A) Tj") == [
        (LIT, b" ( (x)"),
        (LIT, b"A"),
        (STR, b"Tj"),
    ]
    # escaped parens inside the stray scan don't count toward balance
    assert toks(rb") \) still) (B)") == [(LIT, b" ) still"), (LIT, b"B")]
    # octal quirk applies in the stray scan too: 8c+8d+e
    assert toks(rb") \101x)") == [(LIT, b" " + bytes([(1 * 8) + (0 * 8) + 1]) + b"x")]

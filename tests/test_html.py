"""HTML boilerplate-strip extractor behavior (the engine's own oracle,
frozen by these tests — FIXTURES.md §4)."""

from pdfrust_ray.fixtures.htmlgen import HTML_CONSTRUCTS
from pdfrust_ray.html import extract_main_text


def test_article_boilerplate_stripped():
    out = extract_main_text(HTML_CONSTRUCTS["html-article"]("u1"))
    assert "Main headline about u1" in out
    assert "first paragraph of real content" in out
    assert "Site header boilerplate" not in out
    assert "sponsored link" not in out
    assert "Copyright" not in out
    assert "Home" not in out


def test_script_style_always_stripped():
    out = extract_main_text(HTML_CONSTRUCTS["html-script"]("u2"))
    assert "Visible content only for u2." in out
    assert "should never appear" not in out
    assert "display: none" not in out
    assert "javascript plea" not in out


def test_entities_decoded():
    out = extract_main_text(HTML_CONSTRUCTS["html-entities"]("u3"))
    assert "& < > ' \"" in out
    assert "é" in out
    assert "—" in out


def test_table_and_inline_markup():
    out = extract_main_text(HTML_CONSTRUCTS["html-table"]("u4"))
    assert "bold" in out and "italic" in out and "a link" in out
    assert "alpha u4" in out and "beta" in out
    assert "Trailing paragraph after the data table." in out


def test_malformed_recovers():
    out = extract_main_text(HTML_CONSTRUCTS["html-malformed"]("u5"))
    assert "Unclosed paragraph for u5" in out
    assert "Second para implicitly closes the first" in out


def test_nested_deterministic():
    a = extract_main_text(HTML_CONSTRUCTS["html-nested"]("u6"))
    b = extract_main_text(HTML_CONSTRUCTS["html-nested"]("u6"))
    assert a == b
    assert "Deeply nested content for u6" in a
    assert "one" not in a.split()  # sidebar links lose the density contest


def test_empty_and_plainish():
    assert extract_main_text("") == ""
    assert "just text" in extract_main_text("just text")

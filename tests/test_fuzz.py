"""Property tests: the extraction row function is TOTAL.

On arbitrary or corrupted payloads, extract_row must return an error
row — never raise — so Ray task retries are reserved for infra faults
(SURVEY §4). The pure library may raise only ParseError.
"""

import zlib

from hypothesis import given, settings, strategies as st

# deterministic examples: the driver's gate must not flake on a fresh
# random seed; genuinely new counterexamples belong to dev runs
settings.register_profile("ci", derandomize=True)
settings.load_profile("ci")

from pdfrust_ray.fixtures.pdfgen import PDF_CONSTRUCTS
from pdfrust_ray.functions.payload import encode_pdf_payload, extract_row
from pdfrust_ray.pdfref import ParseError, extract

OUT_KEYS = {"payload_kind", "extracted_text", "parse_status", "n_pages", "bytes_decoded", "error"}


@settings(max_examples=150, deadline=None)
@given(st.text(max_size=400))
def test_extract_row_total_on_arbitrary_text(text):
    r = extract_row(text)
    assert set(r) == OUT_KEYS
    assert r["parse_status"] == "ok" or r["parse_status"].startswith(("error:", "skipped:"))


@settings(max_examples=100, deadline=None)
@given(st.binary(min_size=0, max_size=600))
def test_extract_row_total_on_pdfish_bytes(data):
    # force the PDF detection path with arbitrary tails
    r = extract_row("%PDF-" + data.decode("latin-1"))
    assert r["payload_kind"] == "pdf"
    assert r["parse_status"] == "ok" or r["parse_status"].startswith("error:")


@settings(max_examples=60, deadline=None)
@given(
    st.sampled_from(sorted(PDF_CONSTRUCTS)),
    st.integers(min_value=0, max_value=10_000),
    st.integers(min_value=0, max_value=255),
)
def test_mutated_valid_pdfs_never_crash(cid, pos, byte):
    data = bytearray(PDF_CONSTRUCTS[cid]("fuzz"))
    data[pos % len(data)] = byte
    r = extract_row(encode_pdf_payload(bytes(data)))
    assert r["parse_status"] == "ok" or r["parse_status"].startswith("error:")


@settings(max_examples=40, deadline=None)
@given(st.sampled_from(sorted(PDF_CONSTRUCTS)), st.integers(min_value=1, max_value=2000))
def test_truncated_valid_pdfs_never_crash(cid, cut):
    data = PDF_CONSTRUCTS[cid]("fuzz")
    r = extract_row(encode_pdf_payload(data[: max(1, len(data) - cut)]))
    assert r["parse_status"] == "ok" or r["parse_status"].startswith("error:")


@settings(max_examples=40, deadline=None)
@given(st.binary(max_size=300))
def test_library_raises_only_parseerror(data):
    try:
        extract(b"%PDF-1.4\n" + data + b"\n%%EOF")
    except ParseError:
        pass
    except RecursionError:
        pass  # pathological nesting is allowed to surface


def test_flate_bomb_is_bounded():
    # 10x-buffer quirk also bounds decompression memory (filters.rs:7)
    bomb = zlib.compress(b"\0" * 100_000_000, 9)
    from pdfrust_ray.pdfref.filters import flate_decode

    out = flate_decode(bomb)
    assert len(out) == len(bomb) * 10  # truncated at 10x, not 100 MB


@settings(max_examples=120, deadline=None)
@given(st.text(max_size=500))
def test_html_extractor_total_and_deterministic(text):
    from pdfrust_ray.html import extract_main_text

    html = "<html><body>" + text + "</body></html>"
    a = extract_main_text(html)
    b = extract_main_text(html)
    assert a == b  # deterministic


@settings(max_examples=80, deadline=None)
@given(st.lists(st.sampled_from(["<div>", "</div>", "<p>", "<b>", "</i>", "<table>", "<td>",
                                 "text ", "&amp;", "<script>x</script>", "<a href=x>l</a>",
                                 "<br>", "<nav>n</nav>", "</p>", "<!--c-->"]), max_size=30))
def test_html_extractor_on_tag_soup(parts):
    from pdfrust_ray.html import extract_main_text

    out = extract_main_text("".join(parts))
    assert isinstance(out, str)

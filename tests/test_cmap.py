"""Ports of the reference CMap unit tests (cmap.rs:157-195)."""

from pdfrust_ray.pdfref.cmap import parse_tounicode


def test_tounicode_cmap_0():
    src = (
        "/CIDInit/ProcSet findresource begin\n12 dict begin\nbegincmap\n"
        "/CIDSystemInfo<<\n/Registry (Adobe)\n/Ordering (UCS)\n/Supplement 0\n>> def\n"
        "/CMapName/Adobe-Identity-UCS def\n/CMapType 2 def\n"
        "1 begincodespacerange\n<00> <FF>\nendcodespacerange\n"
        "27 beginbfchar\n<01> <004C>\n<02> <006F>\n<03> <0072>\n<04> <0065>\n<05> <006D>\n"
        "endbfchar\nendcmap\nend\nend"
    )
    cm = parse_tounicode(src)
    assert not cm.is_two_bytes
    assert cm.cmap[1] == "L"
    assert cm.cmap[2] == "o"
    assert cm.cmap[3] == "r"
    assert cm.cmap[4] == "e"
    assert cm.cmap[5] == "m"


def test_tounicode_two_bytes_with_ranges():
    src = (
        "1 begincodespacerange\n<0000> <FFFF>\nendcodespacerange\n"
        "2 beginbfchar\n<0001> <0041>\n<01AF> <00660066>\nendbfchar\n"
        "1 beginbfrange\n<0061> <0062> <004D>\nendbfrange\n"
    )
    cm = parse_tounicode(src)
    assert cm.is_two_bytes
    assert cm.cmap[1] == "A"
    # multi-code-unit value decodes only the first UTF-16 unit (cmap.rs:72-75)
    assert cm.cmap[0x01AF] == "f"
    # incrementing bfrange
    assert cm.cmap[0x61] == "M"
    assert cm.cmap[0x62] == "N"


def test_one_bfchar():
    src = "begincodespacerange\n<0000> <FFFF>\nendcodespacerange\nbeginbfchar\n<03D9> <0020>\nendbfchar"
    cm = parse_tounicode(src)
    assert cm.cmap[985] == " "


def test_multiple_bfrange():
    src = (
        "begincodespacerange\n<0000> <FFFF>\nendcodespacerange\n"
        "beginbfrange\n<03DF> <03E0> [<002E> <002C>]\n<03E1> <03E2> <003A>\nendbfrange"
    )
    cm = parse_tounicode(src)
    assert cm.cmap[991] == "."
    assert cm.cmap[992] == ","
    assert cm.cmap[993] == ":"
    assert cm.cmap[994] == ";"
